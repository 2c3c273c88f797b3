#!/usr/bin/env python
"""Composition experiment: run the r10 code with the SUITE RESTRICTED
to the r9 key set (the 184 shared keys). If the shared-key sum
returns to the r9 level, the r9->r10 per-key drift is the suite
composition (10 more plane-holding queries raising resident-JVM
GC/heap pressure for every key), not per-operator code.

Run from a PINNED worktree of the code version under test (the
drift protocol: `git worktree add .drift_r10_worktree <commit>`,
PYTHONPATH set to the worktree so executor workers unpickle the same
version):

    PYTHONPATH=$PWD SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python bench_drift_subset.py /tmp/r9_keys.json

Result (r11, bench_results/drift_r9_r10.json `subset_experiment`):
r10 code on the 184-key r9 set reproduces the r9 numbers (75.5 s
min-of-3 vs r9's 73.8 s) — the per-key inflation in the full 194-key
suite is the resident-JVM suite-composition regime, not the code."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = "/root/testdata/sf0.1"
KEYS_FILE = sys.argv[1]  # json list of keys to run


def main() -> None:
    real_stdout = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)

    with open(KEYS_FILE) as f:
        keep = set(json.load(f))

    import __spark_entry__ as entrymod
    from aws_trusted_advisor_explorer_spark.session import get_spark

    spark = get_spark("ta_explorer_bench_subset")
    queries = {k: v for k, v in entrymod.queries().items() if k in keep}
    assert len(queries) == len(keep), len(queries)

    from aws_trusted_advisor_explorer_spark.plans import fixtures

    fixtures.register_raw_tables(spark, SF_DIR)
    for _ in range(2):
        for name, fn in queries.items():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings = {}
    first_fn = next(iter(queries.values()))
    for _ in range(2):
        first_fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()
        spark._jvm.System.gc()
        for name, fn in queries.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 4)
            if name not in timings or el < timings[name]:
                timings[name] = el

    sys.stdout.flush()
    os.dup2(real_stdout, 1)
    os.close(real_stdout)
    print(json.dumps({"value": round(sum(timings.values()), 4),
                      "n": len(timings), "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
