"""End-to-end batch pipeline — the four Step Functions state machines
collapsed into sequential driver code (SURVEY.md §3).

Reference flow (monthly cron): accounts → per-account check list →
per-(account,check) extract → raw CSV partitions → crawler → views.
Spark flow: the Map-state fan-outs become DataFrame task parallelism;
the crawler disappears (the writer registers tables); views are
``createOrReplaceTempView`` right after write. The TA refresh polling
loop (refresh/verify lambdas + Wait states) is control-plane-only and
stays a driver-side loop in a live deployment; it has no data-plane
analog here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from aws_trusted_advisor_explorer_spark import registry
from aws_trusted_advisor_explorer_spark.operators import extract as X
from aws_trusted_advisor_explorer_spark.operators import tags as TG
from aws_trusted_advisor_explorer_spark.sinks import writers
from aws_trusted_advisor_explorer_spark.sources import ta_api


def run_ingest(spark: SparkSession, check_result_docs, out_dir: str,
               fmt: str = "parquet") -> dict[str, DataFrame]:
    """Entry point A (scheduled TA ingestion): API-shaped docs → raw layer.

    Returns the written raw tables re-read from disk and registered in
    the catalog under their reference names (check_<id>, summary).
    """
    results = ta_api.check_results_df(spark, check_result_docs)
    results.cache()  # reused once per check + once for summary
    out: dict[str, DataFrame] = {}

    # ONE batched probe for "which checks have any flagged resource"
    # (extract-ta-data:187-189 writes no file for empty checks) instead
    # of a limit(1).count() job per check id. The collect is per-check
    # METADATA (a few counter rows), not data.
    nonempty = {
        r["check_id"]
        for r in (results
                  .select(F.col("result.checkId").alias("check_id"),
                          F.explode("result.flaggedResources").alias("fr"))
                  .filter(F.col("fr.status").isin("warning", "error"))
                  .groupBy("check_id").count().collect())
    }

    for check_id in registry.SUPPORTED_CHECKS + registry.EXTRACT_ONLY_CHECKS:
        try:
            detail = X.flagged_resources_table(results, check_id)
        except KeyError:
            continue  # missing Header_/Schema_ config → skip check
        if check_id not in nonempty:
            continue  # no flagged resources → no file (extract-ta-data:187-189)
        path = os.path.join(out_dir, f"check_{check_id.lower()}")
        writers.write_raw_table(detail, path, fmt=fmt)
        df = writers.read_raw_table(spark, path, fmt=fmt)
        df.createOrReplaceTempView(f"check_{check_id.lower()}")
        out[f"check_{check_id.lower()}"] = df

    summary = X.summary_table(results)
    path = os.path.join(out_dir, "summary")
    writers.write_raw_table(summary, path, fmt=fmt)
    df = writers.read_raw_table(spark, path, fmt=fmt)
    df.createOrReplaceTempView("summary")
    out["summary"] = df
    results.unpersist()
    return out


def run_tag_ingest(spark: SparkSession, long_tags: DataFrame,
                   customer_keys: list[str], out_dir: str,
                   fmt: str = "parquet") -> DataFrame:
    """Entry point B (tag ingestion): long (resource, key, value) rows →
    pivoted tags dimension, written + registered. Ingest order is
    stamped before the shuffle so the pivot's last-write-wins matches
    the reference's dict accumulation deterministically."""
    ordered = long_tags.withColumn("_ingest_ord", F.monotonically_increasing_id())
    wide = TG.pivot_tags(ordered, customer_keys, order_col="_ingest_ord")
    # normalize BEFORE landing, like run_ingest's glue_normalize pass:
    # pre-fix the raw tags layer landed CamelCase and only the re-read
    # view was lowercased, so a fresh session reading the landed
    # dataset saw columns no view could resolve (review finding — the
    # two entry points modeled the crawler inconsistently)
    wide = wide.toDF(*[c.lower() for c in wide.columns])
    path = os.path.join(out_dir, "tags")
    writers.write_raw_table(wide, path, fmt=fmt)
    df = writers.read_raw_table(spark, path, fmt=fmt)
    df.createOrReplaceTempView("tags")
    return df


def publish_views(spark: SparkSession, with_tags: bool | None = None) -> None:
    """Entry point C: catalog + view refresh (no crawler needed)."""
    from aws_trusted_advisor_explorer_spark.plans import views

    views.register_views(spark, with_tags=with_tags)
