"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes one
callable per implemented operator from SURVEY.md §2 (plus the
training-data extension operators); ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible one.

Reference-parity queries run over a deterministic fixture layer derived
from the driver parquet (aws_trusted_advisor_explorer_spark/plans/
fixtures.py), so both engines compute from identical inputs.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"

# view name -> short query key
_VIEW_KEYS = {
    "LowUtilizationAmazonEC2Instances_view": "view_low_util_ec2",
    "UnderutilizedAmazonEBSVolumes_view": "view_underutil_ebs",
    "IdleLoadBalancers_view": "view_idle_elb",
    "AmazonRDSIdleDBInstances_view": "view_rds_idle",
    "UnderutilizedAmazonRedshiftClusters_view": "view_underutil_redshift",
    "EC2ReservedInstanceLeaseExpiration_view": "view_ri_lease_expiration",
    "Route53LatencyResourceRecordSets_view": "view_route53_latency",
    "summary_view": "view_summary",
    "UnassociatedElasticIPAddresses_view": "view_unassoc_eip",
    "EC2ReservedInstancesOptimization_view": "view_ri_optimization",
}


def _prepare(spark: SparkSession, sf_dir: str) -> None:
    from aws_trusted_advisor_explorer_spark.plans import fixtures
    from aws_trusted_advisor_explorer_spark.session import tune_session

    tune_session(spark)
    fixtures.register_raw_tables(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LowUtilizationAmazonEC2Instances_view (typed casts + the
    as-of-run snapshot broadcast join to tags) at sf0.001."""
    from aws_trusted_advisor_explorer_spark.plans import views

    _prepare(spark, SF_SMOKE)
    return views.view_df(spark, "LowUtilizationAmazonEC2Instances_view")


def _view_query(name: str, with_tags: bool | None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from aws_trusted_advisor_explorer_spark.plans import views

        _prepare(spark, sf_dir)
        return views.view_df(spark, name, with_tags=with_tags)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from aws_trusted_advisor_explorer_spark.plans import views

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, key in _VIEW_KEYS.items():
        q[key] = _view_query(name, with_tags=None)
        if views.VIEWS[name].join_key is not None:
            q[f"{key}_no_tags"] = _view_query(name, with_tags=False)
    return q


def oracle_sql() -> dict[str, str]:
    from aws_trusted_advisor_explorer_spark.plans import views

    o: dict[str, str] = {}
    for name, key in _VIEW_KEYS.items():
        o[key] = views.view_oracle_sql(name)
        if views.VIEWS[name].join_key is not None:
            o[f"{key}_no_tags"] = views.view_oracle_sql(name, with_tags=False)
    return o
