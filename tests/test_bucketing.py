"""Bucketed co-located join (SCALE.md pattern): joining two tables
bucketed on the same key with equal bucket counts must produce a plan
with NO shuffle exchange on either side."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from aws_trusted_advisor_explorer_spark.sinks import writers


def test_bucketed_join_has_no_shuffle(spark):
    docs = spark.table("documents").select("doc_id", "n_chars")
    stats = spark.table("documents").select(
        "doc_id", F.length("text").alias("n_len"))

    with tempfile.TemporaryDirectory() as tmp:
        writers.write_bucketed_table(
            docs, "b_docs", ["doc_id"], n_buckets=8,
            sort_cols=["doc_id"], path=f"{tmp}/b_docs")
        writers.write_bucketed_table(
            stats, "b_stats", ["doc_id"], n_buckets=8,
            sort_cols=["doc_id"], path=f"{tmp}/b_stats")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # at test scale the planner rightly broadcasts the tiny side
            # (which skips bucketing); disable broadcast to exercise the
            # big-join path bucketing exists for
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table("b_docs").join(
                spark.table("b_stats"), "doc_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
                f"bucketed join still shuffles:\n{plan}")
            assert "SortMergeJoin" in plan
            n = joined.count()
            assert n == spark.table("documents").count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_docs")
            spark.sql("DROP TABLE IF EXISTS b_stats")


def test_partitioned_write_round_trip(spark, tmp_path):
    df = spark.table("documents").limit(50).select(
        "doc_id",
        F.lit("2025-06-01 09:00:00").alias("datetime"),
        F.col("text").alias("doc text"))  # space -> parquet_safe path
    writers.write_raw_table(df, str(tmp_path / "t"))
    back = writers.read_raw_table(spark, str(tmp_path / "t"))
    assert set(back.columns) == {"doc_id", "datetime", "doc text"}
    assert back.count() == 50
