"""Local stand-in for the driver's correctness check: run each
queries() entry and its oracle_sql() twin on the same sf dir, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def _normalize(rows: list[dict], cols: list[str]):
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[c]) for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare_query(spark, name: str, fn, sql: str | None, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]
    res = {"name": name, "spark_rows": len(srows)}
    if sql is None:
        res["status"] = "rows_only"
        res["ok"] = len(srows) >= 0
        return res
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    odf = con.execute(sql).fetch_arrow_table()
    ocols = odf.column_names
    orows = odf.to_pylist()
    res["oracle_rows"] = len(orows)
    if sorted(scols) != sorted(ocols):
        res["status"] = "schema_mismatch"
        res["detail"] = f"spark={sorted(scols)} oracle={sorted(ocols)}"
        res["ok"] = False
        return res
    a = _normalize(srows, scols)
    b = _normalize(orows, ocols)
    if a == b:
        res["status"] = "match"
        res["ok"] = True
    else:
        diff_a = [x for x in a if x not in set(b)][:3]
        diff_b = [x for x in b if x not in set(a)][:3]
        res["status"] = "value_mismatch"
        res["detail"] = f"spark_only={diff_a} oracle_only={diff_b}"
        res["ok"] = False
    return res


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import __spark_entry__ as entry_mod
    from ontology_learning_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare_query(spark, name, fn, oracles.get(name), sf_dir)
        except Exception as e:
            r = {"name": name, "status": "error", "detail": str(e)[:300], "ok": False}
        flag = "OK " if r.get("ok") else "FAIL"
        print(f"{flag} {name}: {r['status']} {r.get('detail','')}"
              f" (spark={r.get('spark_rows')}, oracle={r.get('oracle_rows','-')})")
        if not r.get("ok"):
            failures += 1
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01", only) else 0)
