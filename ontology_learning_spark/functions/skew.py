"""Skew-aware join helpers (north_rule: "skew on head entities is
handled with key salting and AQE skew-join hints").

Where it matters in this engine: the candidate-generation joins key on
surface-form block keys whose frequency is Zipf-distributed ("resistor",
"antenna" are hot). When the dimension side fits in memory we broadcast
(no skew possible); when it doesn't, `salted_join` splits each hot key
into K salted sub-keys: the big side gets a random salt in [0, K), the
small side is exploded K ways, and the join key becomes (key, salt).
AQE's skew-join splitting (enabled in session.py) handles residual
imbalance at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on `key` with the small side exploded
    `salt_factor` ways. Deterministic salt on the big side (hash of
    monotonically varying columns would be nondeterministic on retry;
    we hash the full row's key + a per-row id surrogate via
    xxhash64 of all columns) so recomputation is stable.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor)).cast("int")
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = big_salted.join(small_exploded, [key, "_salt"], how)
    return out.drop("_salt")


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Identify skewed keys (frequency >= min_count) — used to salt
    only the hot partition of a join (hybrid broadcast/salt plan)."""
    return df.groupBy(key).count().where(F.col("count") >= min_count).select(key)


def skew_split_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    salt_factor: int = 16,
) -> DataFrame:
    """Hybrid plan: hot keys go through the salted path, the long tail
    through a plain shuffle join; union the results. This is the
    classic two-plan skew mitigation when neither side broadcasts."""
    hk = hot_keys(big, key, hot_threshold).cache()
    big_hot = big.join(F.broadcast(hk), key, "left_semi")
    big_cold = big.join(F.broadcast(hk), key, "left_anti")
    small_hot = small.join(F.broadcast(hk), key, "left_semi")
    small_cold = small.join(F.broadcast(hk), key, "left_anti")
    return salted_join(big_hot, small_hot, key, salt_factor).unionByName(
        big_cold.join(small_cold, key)
    )
