#!/usr/bin/env python
"""Measured justification for embeddings_covariance's registered form
(r9): the Arrow/numpy partial-accumulation twin vs the SQL explode
form, same exact integers (asserted), at sf0.1. The SQL form inflates
every row dim^2/2-fold through an interpreted lambda chain before the
partial aggregate; the twin computes the same floored terms with
vectorized einsum outer products and ships 2080-row partial frames.
Both shuffle O(partitions x dim^2) integers — the twin's win is pure
per-row compute, which is what decides the hot path at 100 TB.

Writes one JSON line to stdout (redirect to
bench_results/covariance_twin.json); scripts/gen_scaling.py folds it
into SCALING.md when present.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import similarity as S
    from aws_trusted_advisor_explorer_spark.session import (
        get_spark, load_tables,
    )

    spark = get_spark("cov_twin_bench")
    load_tables(spark, SF_DIR)
    n_vec = spark.table("embeddings").count()

    forms = {
        "sql_explode": lambda: spark.sql(S.embeddings_covariance(SPARK)),
        "arrow_twin": lambda: S.embeddings_covariance_df(spark),
    }
    result: dict = {"sf_dir": SF_DIR, "n_vectors": int(n_vec)}
    # warm both before timing either (the scd2_stretch rule)
    for mk in forms.values():
        mk().write.format("noop").mode("overwrite").save()
    for label, mk in forms.items():
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        result[label + "_sec"] = round(best, 4)
    # exact-integer equality between the forms (the pytest pin, re-
    # asserted at bench scale so the speed claim can't drift from a
    # broken twin)
    a = {(r.dim_i, r.dim_j): (r.n_vectors, r.sum_micro)
         for r in forms["arrow_twin"]().collect()}
    b = {(r.dim_i, r.dim_j): (r.n_vectors, r.sum_micro)
         for r in forms["sql_explode"]().collect()}
    assert a == b and len(a) == S.DIM * (S.DIM + 1) // 2
    result["speedup"] = round(
        result["sql_explode_sec"] / result["arrow_twin_sec"], 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
