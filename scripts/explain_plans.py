#!/usr/bin/env python
"""Print .explain("formatted") for selected queries so the physical
plan can be audited for scale hygiene: broadcast joins where a side is
small, pushed filters / pruned columns at the parquet scan, no
unexpected shuffles, wide WholeStageCodegen spans.

Usage: python scripts/explain_plans.py [sf_dir] [query_substring ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent
from aws_trusted_advisor_explorer_spark.session import get_spark

DEFAULT = ["view_low_util_ec2", "dedup_minhash_lsh", "knn_bruteforce",
           "events_hourly_by_type", "view_summary"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wanted = sys.argv[2:] or DEFAULT
    spark = get_spark("explain", cpus=8)
    qs = ent.queries()
    for name, fn in qs.items():
        if not any(w in name for w in wanted):
            continue
        print(f"\n{'=' * 70}\n== {name}\n{'=' * 70}")
        fn(spark, sf_dir).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
