#!/usr/bin/env python
"""Solo timing of the gram-plane family builds (shingle + span + token
+ contamination [+ fused fold]) at a given SF — the r13 fusion's
before/after instrument. Fresh session, one warm-up landing pass, then
the plane builds timed via the session plane-timing mechanism.

Usage: python scripts/bench_gram_planes.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from aws_trusted_advisor_explorer_spark.operators import corpusops, dedup
    from aws_trusted_advisor_explorer_spark.plans import fixtures
    from aws_trusted_advisor_explorer_spark.session import (
        drain_plane_timings, get_spark,
    )

    spark = get_spark("gram_planes_bench")
    fixtures.register_raw_tables(spark, sf_dir)
    # warm the scan + python workers so plane numbers measure the build
    spark.table("documents").selectExpr("count(*)").collect()
    drain_plane_timings()

    dedup.ensure_shingle_view(spark, key=sf_dir)
    dedup.ensure_span_views(spark, key=sf_dir)
    corpusops.ensure_contam_view(spark, key=sf_dir)
    rows = drain_plane_timings()
    total = sum(s for _, s in rows)
    for label, sec in rows:
        print(f"{label:24s} {sec:7.3f}")
    print(f"{'TOTAL':24s} {total:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
