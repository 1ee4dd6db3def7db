"""Skew evidence (north_rule): salting must actually spread a hot key
across partitions, and AQE skew-join must be on in the session."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_learning_spark.functions import skew as SK


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([("hot", i) for i in range(4000)], "k string, v int")
    small = spark.createDataFrame([("hot", 1)], "k string, w int")

    # AQE's partition coalescing would merge the tiny test output back
    # into one partition and hide the spread we're asserting — and if
    # the 8-row exploded small side converts to a BROADCAST join (static
    # or AQE runtime), the output inherits the big side's incidental
    # input partitioning and the assertion measures createDataFrame
    # slicing, not salting. Salting only matters when the dimension
    # side can NOT broadcast, so pin that regime explicitly.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_abc = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_abc = None  # unset (falls back to the non-adaptive threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plain = big.join(small.hint("shuffle_hash"), "k")
        plain_parts = (
            plain.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().count()
        )

        salted = SK.salted_join(big, small, "k", salt_factor=8)
        salted_parts = (
            salted.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().count()
        )
        assert salted_parts > plain_parts, (
            f"salting must spread the hot key: plain={plain_parts} salted={salted_parts}"
        )
        assert salted.count() == plain.count() == 4000
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        if old_abc is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_abc)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_aqe_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_compare_threshold_configs(spark, docs_df):
    from ontology_learning_spark.fixtures import baseline
    from ontology_learning_spark.functions import semantics as S
    from ontology_learning_spark.operators.analytics import compare_threshold_configs

    gold = spark.createDataFrame(
        [(S.normalize_name(r["source"]), r["type"], S.normalize_name(r["target"]))
         for r in baseline.gold_relations()],
        "subj string, pred string, obj string",
    )
    configs = {
        "pipeline_default": S.DEFAULT_THRESHOLDS,
        "config_strict": {"exact_match": 0.96, "high_similarity": 0.90,
                          "medium_similarity": 0.75, "low_similarity": 0.60},
    }
    out = {r["config"]: r for r in
           compare_threshold_configs(spark, docs_df, gold, configs).collect()}
    assert set(out) == {"pipeline_default", "config_strict"}
    for r in out.values():
        assert r["tp"] > 0 and 0 <= r["precision"] <= 1 and 0 <= r["recall"] <= 1
    # both configs see the same corpus → same distinct concept count
    assert out["pipeline_default"]["n_concepts"] == out["config_strict"]["n_concepts"]
