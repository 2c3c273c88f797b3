#!/usr/bin/env python
"""Child process of bench_core_scaling.py: run the given keys at the
given core count over the given data dir with bench.py's methodology
(one warm pass, min of 2 timed passes, noop sink, plane drains) and
print one JSON line {timings, planes, total}. A separate process so
each core count gets a fresh JVM AND fresh module-level plane caches.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, cpus, keys = sys.argv[1], int(sys.argv[2]), sys.argv[3].split(",")

    import __spark_entry__ as ent
    from aws_trusted_advisor_explorer_spark.plans import fixtures
    from aws_trusted_advisor_explorer_spark.session import (
        drain_plane_timings, get_spark,
    )

    spark = get_spark("core_scaling", cpus=cpus)
    qs = ent.queries()
    fixtures.register_raw_tables(spark, sf_dir)
    drain_plane_timings()
    planes: dict[str, float] = {}

    def drain() -> float:
        tot = 0.0
        for label, sec in drain_plane_timings():
            planes[label] = round(planes.get(label, 0.0) + sec, 4)
            tot += sec
        return tot

    for k in keys:  # warm pass (plane builds land here)
        qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
        drain()
    timings: dict[str, float] = {}
    for _ in range(2):
        spark._jvm.System.gc()
        time.sleep(1.0)
        for k in keys:
            t0 = time.perf_counter()
            qs[k](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            el = round(max(time.perf_counter() - t0 - drain(), 0.0), 4)
            if k not in timings or el < timings[k]:
                timings[k] = el
    print(json.dumps({
        "cpus": cpus,
        "timings": timings,
        "planes": planes,
        "total": round(sum(timings.values()), 4)}))
    spark.stop()


if __name__ == "__main__":
    main()
