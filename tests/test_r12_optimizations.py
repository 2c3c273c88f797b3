"""Round-12 optimization pins: every optimization that changed an
operator's internals carries a focused equality test against the form
it replaced (the oracle comparator and the standing suites gate the
end results; these tests pin the specific internal equivalence so a
regression names the optimization that broke)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cluster_kernel_views_match_sql_chains(spark):
    """The r12 kernel-twin cluster-index build (broadcast-codebook
    mapInPandas passes) must materialize row- and schema-identical
    relations to the unrolled SQL training chains it replaced."""
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import clusterops as C

    C._CLUSTER_STATE.clear()
    C.ensure_cluster_views(spark, key=SF_DIR)

    old_asg = spark.sql(C.kmeans_assign(SPARK))
    ctes, members, cents = C._pq_train_ctes(SPARK)
    old_cents = spark.sql(f"WITH {ctes}\nSELECT s, cid, pos, val FROM {cents}")
    old_members = spark.sql(
        f"WITH {ctes}\nSELECT vec_id, s, cid, dist FROM {members}")

    for old, view in ((old_asg, C.ASG_VIEW), (old_cents, C.PQ_CENTS_VIEW),
                      (old_members, C.PQ_MEMBERS_VIEW)):
        new = spark.table(view)
        assert new.schema.simpleString() == old.schema.simpleString(), view
        assert _rows(new) == _rows(old), view


def test_fixture_landing_v3_matches_lazy_derivation(spark):
    """The r12 fixture-landing layout (repartition the narrow base
    BEFORE the wide string derivation) must land tables content-equal
    to the lazy derivation of the same fixture SQL."""
    from pyspark.sql import functions as F

    from aws_trusted_advisor_explorer_spark.plans import fixtures

    fixtures.register_raw_tables(spark, SF_DIR)
    sqls = fixtures.raw_table_sql()
    for name in ("check_qch7dwoux1", "tags", "summary"):
        landed = spark.table(name).selectExpr(
            "sum(hash(*)) AS h", "count(*) AS c").collect()[0]
        lazy = spark.sql(fixtures.to_spark_sql(sqls[name])).selectExpr(
            "sum(hash(*)) AS h", "count(*) AS c").collect()[0]
        assert (landed.h, landed.c) == (lazy.h, lazy.c), name
