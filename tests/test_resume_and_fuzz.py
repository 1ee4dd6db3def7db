"""Round-3: partition-granular resume under failure injection (VERDICT
#8), fractional global_cumsum (ADVICE windows trap), and seeded random-
corpus Spark-vs-oracle parity fuzz (VERDICT #9)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from ontology_learning_spark.sources.tables import StageStore


def test_partition_resume_after_injected_failure(spark, tmp_path):
    """Fail one partition's write mid-stage; resume must recompute
    EXACTLY the missing partitions (manifest anti-join), never the
    already-committed ones."""
    from pyspark.sql import types as T

    eval_dir = tmp_path / "evals"
    eval_dir.mkdir()
    poison_flag = tmp_path / "poison"
    poison_flag.write_text("1")
    flag_path = str(poison_flag)
    eval_path = str(eval_dir)

    @F.udf(T.IntegerType())
    def traced(v):
        # side-effect marker: which partition values were (re)computed
        Path(f"{eval_path}/p{v}_{__import__('uuid').uuid4().hex[:8]}").touch()
        if v == 3 and Path(flag_path).exists():
            raise RuntimeError("injected failure in partition 3")
        return v

    base = spark.createDataFrame(
        [(i, i % 4 + 1) for i in range(40)], "x int, part int"
    ).localCheckpoint(eager=True)

    def build():
        return base.withColumn("x", F.col("x") + 0 * traced(F.col("part")))

    store = StageStore(spark, tmp_path / "tables", run_id="r1")
    with pytest.raises(Exception):
        store.materialize_by_partition("stage_p", build, "part")

    committed = store.manifest.committed_partitions("r1", "stage_p")
    assert committed == {"1", "2"}, committed
    assert not store.is_done("stage_p")

    def marker_counts():
        return {v: len(list(eval_dir.glob(f"p{v}_*"))) for v in (1, 2, 3, 4)}

    after_fail = marker_counts()
    assert after_fail[1] > 0 and after_fail[2] > 0  # first run computed 1, 2
    assert after_fail[4] == 0                       # never reached 4

    # clear the poison and resume with a fresh store (new process stand-in)
    poison_flag.unlink()
    store2 = StageStore(spark, tmp_path / "tables", run_id="r1")
    out = store2.materialize_by_partition("stage_p", build, "part")
    assert out.count() == 40
    assert store2.is_done("stage_p")
    assert store2.manifest.committed_partitions("r1", "stage_p") == {"1", "2", "3", "4"}

    # the resume recomputed EXACTLY the missing partitions: marker
    # counts for committed 1/2 are unchanged; 3 and 4 gained theirs.
    after_resume = marker_counts()
    assert after_resume[1] == after_fail[1], (after_fail, after_resume)
    assert after_resume[2] == after_fail[2], (after_fail, after_resume)
    assert after_resume[3] > after_fail[3]
    assert after_resume[4] > 0

    # a third run over the fully-committed stage is a pure manifest
    # read: no partition recomputes at all
    store3 = StageStore(spark, tmp_path / "tables", run_id="r1")
    store3.materialize_by_partition("stage_p", build, "part").count()
    assert marker_counts() == after_resume


def test_global_cumsum_fractional(spark):
    """ADVICE trap: summing doubles through the two-phase cumsum must
    not truncate the per-partition offsets to bigint."""
    from ontology_learning_spark.functions.windows import global_cumsum

    df = spark.createDataFrame(
        [(i, 0.5) for i in range(1, 21)], "k int, v double"
    )
    out = global_cumsum(df, "k", "v", "running", num_partitions=4)
    got = {r["k"]: r["running"] for r in out.collect()}
    assert got == {k: pytest.approx(0.5 * k) for k in range(1, 21)}


# 20 random corpora, ROTATING base so successive rounds don't re-test
# the same inputs (VERDICT r3 #9): the base advances with the ISO week.
# Failures print the seed list; pin FUZZ_SEED_BASE to reproduce a week's
# run exactly.
import datetime as _dt
import os as _os

_SEED_BASE = int(
    _os.environ.get(
        "FUZZ_SEED_BASE",
        101 + 20 * _dt.date.today().isocalendar().week,
    )
)
SEEDS = list(range(_SEED_BASE, _SEED_BASE + 20))


def _assert_parity(res, oracle, label):
    got_dec = {
        r["concept"]: (r["decision"], r["target"]) for r in res.decisions.collect()
    }
    exp_dec = {k: (v["decision"], v["target"]) for k, v in oracle["decisions"].items()}
    diffs = {
        k: (got_dec.get(k), exp_dec.get(k))
        for k in set(got_dec) | set(exp_dec)
        if got_dec.get(k) != exp_dec.get(k)
    }
    assert not diffs, f"{label}: {list(diffs.items())[:5]}"
    got_t = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.collect()}
    assert got_t == oracle["triples"], (
        f"{label}: missing={list(oracle['triples'] - got_t)[:4]} "
        f"extra={list(got_t - oracle['triples'])[:4]}"
    )


def test_fuzz_random_corpora_decision_parity(spark):
    """Seeded random-corpus sweep (20 generator seeds): the Spark
    pipeline's decisions and triples must match the pure-Python oracle
    exactly — catches float/tie-break drift the fixed fixture misses.
    The 20 corpora run as ONE union (doc_ids seed-prefixed, oracle on
    the same union) so the sweep stays inside the CI budget; three
    seeds also run individually for per-corpus tie-break isolation."""
    from ontology_learning_spark.fixtures.generator import DOCUMENT_SCHEMA, generate_documents
    from ontology_learning_spark.oracle import reference as O
    from ontology_learning_spark.plans.pipeline import run_pipeline

    all_rows = []
    for seed in SEEDS:
        for row in generate_documents(n_docs=25, seed=seed):
            all_rows.append({**row, "doc_id": f"s{seed}:{row['doc_id']}"})
    docs = spark.createDataFrame(all_rows, schema=DOCUMENT_SCHEMA).coalesce(4)
    _assert_parity(run_pipeline(spark, docs), O.run(all_rows), "union-of-20-seeds")

    for seed in SEEDS[:3]:
        rows = generate_documents(n_docs=25, seed=seed)
        docs = spark.createDataFrame(rows, schema=DOCUMENT_SCHEMA).coalesce(2)
        _assert_parity(run_pipeline(spark, docs), O.run(rows), f"seed={seed}")
