#!/usr/bin/env python
"""Measured cost of session.set_plane_mode("table") vs the "local"
default (VERDICT r9 task 5): the number that justifies SCALE.md's
production swap policy. Two register_session_plane sites are measured
at sf0.1 —

* the MinHash pair plane (the heaviest mode-governed plane: the full
  band-join pipeline materializes at build), consumed by
  dedup_incremental (which references the pair relation twice);
* the phash plane (the cheapest: one Arrow pass over media bytes),
  consumed by media_phash_dedup's band self-join.

For each plane x mode: the plane BUILD wall (the one-time cost the
mode changes — localCheckpoint write vs bucketed-parquet write +
read-back) and the WARM consumer wall (3-rep min; should be
mode-invariant for the pair plane and slightly better for bucketed
consumers that join on the bucket key). The shingle plane feeding the
pair build is pre-built once OUTSIDE the timers (it is mode-insensitive
by design — its own swap is documented at its build site), so the
build delta isolates the pairs materialization itself. Consumer
results are asserted identical across modes (the
test_plane_mode_table_equality pin, re-asserted at bench scale).

Writes bench_results/plane_mode.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def canon(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(
        drop=True).to_string()


def main() -> None:
    from aws_trusted_advisor_explorer_spark import session as sess
    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import (
        dedup, multimodal,
    )
    from aws_trusted_advisor_explorer_spark.session import (
        get_spark, load_tables,
    )

    spark = get_spark("plane_mode_bench")
    load_tables(spark, SF_DIR)
    base = dedup.ensure_shingle_view(spark, key=SF_DIR)  # mode-insensitive

    def pairs_consumer():
        pv = dedup.ensure_minhash_pairs_view(spark, key=SF_DIR)
        return spark.sql(dedup.dedup_incremental(
            SPARK, base=base, pairs_view=pv))

    def phash_consumer():
        ph = multimodal.ensure_phash_view(spark, key=SF_DIR)
        return spark.sql(multimodal.media_phash_dedup(SPARK, base=ph))

    planes = {
        "minhash_pairs": (
            lambda: dedup.ensure_minhash_pairs_view(spark, key=SF_DIR),
            pairs_consumer, "dedup_incremental"),
        "phash": (
            lambda: multimodal.ensure_phash_view(spark, key=SF_DIR),
            phash_consumer, "media_phash_dedup"),
    }

    result: dict = {"sf_dir": SF_DIR, "planes": {}}
    outputs: dict = {}
    # two alternating rounds per mode, min taken — the first round of
    # everything pays JIT/upstream warm-up, which would otherwise be
    # billed entirely to whichever mode ran first
    for mode in ("local", "table", "local", "table"):
        sess.set_plane_mode(mode)
        for name, (ensure, consumer, ckey) in planes.items():
            row = result["planes"].setdefault(name, {"consumer": ckey})
            # mode is part of the plane cache key -> this is a rebuild
            t0 = time.perf_counter()
            ensure()
            build = time.perf_counter() - t0
            bk = f"{mode}_build_s"
            row[bk] = round(min(build, row.get(bk, build)), 3)
            consumer().write.format("noop").mode("overwrite").save()  # warm
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                consumer().write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            ck = f"{mode}_consumer_s"
            row[ck] = round(min(best, row.get(ck, best)), 3)
            outputs.setdefault(name, {})[mode] = canon(consumer())
    sess.set_plane_mode("local")
    for name, by_mode in outputs.items():
        assert by_mode["local"] == by_mode["table"], \
            f"{name}: consumer results differ across plane modes"
    for row in result["planes"].values():
        row["build_delta_s"] = round(
            row["table_build_s"] - row["local_build_s"], 3)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results", "plane_mode.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
