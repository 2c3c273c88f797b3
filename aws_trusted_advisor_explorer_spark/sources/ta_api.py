"""Ingestion adapters for TA-API-shaped inputs (SURVEY.md §2.1 S1-S5).

The reference pulls from live AWS APIs inside Lambdas; here each source
becomes a DataFrame with an explicit schema. Live-API fetching would be
a ``mapInPandas`` fetcher over a work-item DataFrame (one row per
(account, check)), with retry/backoff inside the adapter — out of scope
for the offline harness, so the JSON-document path is the tested one.

S1  check_results_df      describe_trusted_advisor_check_result-shaped JSON
S2  filter_supported_checks  check catalog → category ∩ allow-list filter
S3  active_accounts       Organizations list_accounts → ACTIVE + run stamp
S4  accounts_from_csv     CSV override with case/position-insensitive headers
S5  regions_df            small region dimension
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# describe_trusted_advisor_check_result shape
# (extract-ta-data-lambda.py:70-75,133-177; FIXTURES.md "Upstream API-shaped fixture")
CHECK_RESULT_SCHEMA = T.StructType([
    T.StructField("AccountId", T.StringType()),
    T.StructField("AccountName", T.StringType()),
    T.StructField("AccountEmail", T.StringType()),
    T.StructField("Date", T.StringType()),
    T.StructField("DateTime", T.StringType()),
    T.StructField("CheckName", T.StringType()),
    T.StructField("result", T.StructType([
        T.StructField("checkId", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("resourcesSummary", T.StructType([
            T.StructField("resourcesProcessed", T.LongType()),
            T.StructField("resourcesFlagged", T.LongType()),
            T.StructField("resourcesIgnored", T.LongType()),
            T.StructField("resourcesSuppressed", T.LongType()),
        ])),
        T.StructField("categorySpecificSummary", T.StructType([
            T.StructField("costOptimizing", T.StructType([
                T.StructField("estimatedMonthlySavings", T.DoubleType()),
                T.StructField("estimatedPercentMonthlySavings", T.DoubleType()),
            ])),
        ])),
        T.StructField("flaggedResources", T.ArrayType(T.StructType([
            T.StructField("status", T.StringType()),
            T.StructField("region", T.StringType()),
            T.StructField("resourceId", T.StringType()),
            T.StructField("metadata", T.ArrayType(T.StringType())),
        ]))),
    ])),
])

CHECK_CATALOG_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("category", T.StringType()),
])

ACCOUNT_SCHEMA = T.StructType([
    T.StructField("Id", T.StringType()),
    T.StructField("Name", T.StringType()),
    T.StructField("Email", T.StringType()),
    T.StructField("Status", T.StringType()),
])


def check_results_df(spark: SparkSession, docs_or_path) -> DataFrame:
    """S1: one row per (account, check) API response. Accepts a list of
    dicts (fixtures) or a JSON-lines path."""
    if isinstance(docs_or_path, str):
        return spark.read.schema(CHECK_RESULT_SCHEMA).json(docs_or_path)
    import json

    rows = spark.sparkContext.parallelize([json.dumps(d) for d in docs_or_path])
    return spark.read.schema(CHECK_RESULT_SCHEMA).json(rows)


def filter_supported_checks(catalog: DataFrame, category: str,
                            supported_ids: list[str]) -> DataFrame:
    """S2: keep ``category`` ∩ allow-list (get-ta-checks-lambda.py:56-76)."""
    return catalog.filter(
        (F.col("category") == category) & F.col("id").isin(supported_ids))


def active_accounts(accounts: DataFrame, run_date: str, run_datetime: str) -> DataFrame:
    """S3: ACTIVE accounts stamped with the run snapshot
    (get-accounts-info-lambda.py:104-125)."""
    return (accounts.filter(F.col("Status") == "ACTIVE")
            .select(F.col("Id").alias("AccountId"),
                    F.col("Name").alias("AccountName"),
                    F.col("Email").alias("AccountEmail"),
                    F.lit(run_date).alias("Date"),
                    F.lit(run_datetime).alias("DateTime")))


def accounts_from_csv(spark: SparkSession, path: str, run_date: str,
                      run_datetime: str) -> DataFrame:
    """S4: user CSV override — case-insensitive, position-independent header
    resolution; strict 3-field validation (get-accounts-info-lambda.py:127-170)."""
    df = spark.read.option("header", True).csv(path)
    by_lower = {c.lower().strip(): c for c in df.columns}
    missing = [k for k in ("accountid", "accountname", "accountemail") if k not in by_lower]
    if missing:
        raise ValueError(f"accounts CSV missing required columns: {missing}")
    if len(df.columns) != 3:
        raise ValueError(f"accounts CSV must have exactly 3 columns, got {len(df.columns)}")
    bad = df.filter(F.col(by_lower["accountid"]).isNull()
                    | F.col(by_lower["accountname"]).isNull()
                    | F.col(by_lower["accountemail"]).isNull()).count()
    if bad:
        raise ValueError(f"accounts CSV has {bad} rows with missing fields")
    return df.select(
        F.col(by_lower["accountid"]).alias("AccountId"),
        F.col(by_lower["accountname"]).alias("AccountName"),
        F.col(by_lower["accountemail"]).alias("AccountEmail"),
        F.lit(run_date).alias("Date"),
        F.lit(run_datetime).alias("DateTime"))


def regions_df(spark: SparkSession, regions: list[str] | None = None) -> DataFrame:
    """S5: region dimension (get-tags-lambda.py:56-64)."""
    if regions is None:
        regions = ["us-east-1", "us-east-2", "us-west-1", "us-west-2",
                   "eu-west-1", "eu-central-1", "ap-southeast-1", "ap-northeast-1"]
    return spark.createDataFrame([(r,) for r in regions], ["RegionName"])


def refresh_wait_seconds(millis_until_refreshable) -> F.Column:
    """P12 refresh wait clamp (verify-ta-check-status-lambda.py:78-84):
    ``wait = round(millis/1000)`` with Python's banker's rounding
    (Spark ``bround`` = HALF_EVEN, matching ``round()`` on the .5
    boundary), and any wait LONGER than 3600s means "skip this
    refresh" -> 0, exactly as the reference branches (it does not clamp
    to 3600). Control-plane in the reference; exposed here as a column
    expression so a polling scheduler built on this engine reproduces
    the semantics bit-for-bit."""
    col = (millis_until_refreshable
           if isinstance(millis_until_refreshable, F.Column)
           else F.col(millis_until_refreshable))
    wait = F.bround(col / F.lit(1000)).cast("bigint")
    return F.when(wait <= 3600, wait).otherwise(F.lit(0)).cast("bigint")
