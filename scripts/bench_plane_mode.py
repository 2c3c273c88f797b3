#!/usr/bin/env python
"""Measured cost of session.set_plane_mode("table") vs the "local"
default: the number that justifies SCALE.md's production swap policy.

r11 verdict task 1 widened the mode's reach to the four most
expensive custom plane builds (shingle, prefix, span, cluster_index —
previously hard-wired to localCheckpoint), so this bench now measures
ALL mode-governed planes at sf0.1:

* shingle         -> dedup_minhash_lsh          (band-join consumer)
* prefix          -> dedup_prefix_join          (prefix self-join)
* span (+token)   -> dedup_span_exact           (dup-gram join)
* cluster_index   -> knn_ivfpq_adc              (ADC rerank)
* minhash_pairs   -> dedup_incremental          (pair graph, 2 refs)
* phash           -> media_phash_dedup          (band self-join)

For each plane x mode: the plane BUILD seconds from the session's own
plane-timing rows (drain_plane_timings — net of nested builds since
the r12 frame fix, so e.g. the prefix row never double-counts the
shingle build it triggers) and the WARM consumer wall (3-rep min;
should be mode-invariant or slightly better for bucketed consumers
joining on the bucket key). Dependencies are ensured in the SAME mode
before the timed ensure, so each build number isolates its own plane.
Consumer results are asserted identical across modes (the
test_plane_mode_table_heavy_planes_equality pin, re-asserted at bench
scale).

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
        clusterops as C, dedup, multimodal,
    )
    from aws_trusted_advisor_explorer_spark.session import (
        get_spark, load_tables,
    )

    spark = get_spark("plane_mode_bench")
    load_tables(spark, SF_DIR)

    def shingle_consumer():
        return spark.sql(dedup.dedup_minhash_lsh(SPARK, dedup.SHINGLE_VIEW))

    def prefix_consumer():
        return spark.sql(dedup.dedup_prefix_join(
            SPARK, base=dedup.SHINGLE_VIEW))

    def span_consumer():
        return spark.sql(dedup.dedup_span_exact(
            SPARK, base=dedup.SPAN_GRAM_VIEW))

    def cluster_consumer():
        return spark.sql(C.knn_ivfpq_adc(
            SPARK, asg=C.ASG_VIEW, members=C.PQ_MEMBERS_VIEW,
            cents=C.PQ_CENTS_VIEW))

    def pairs_consumer():
        return spark.sql(dedup.dedup_incremental(
            SPARK, base=dedup.SHINGLE_VIEW,
            pairs_view=dedup.MINHASH_PAIRS_VIEW))

    def phash_consumer():
        return spark.sql(multimodal.media_phash_dedup(
            SPARK, base=multimodal.PHASH_VIEW))

    # (name, plane-row label, deps ensured first IN THE SAME MODE,
    #  timed ensure, consumer, consumer key) — dependency order
    PLANES = [
        ("shingle", "shingle", [],
         lambda: dedup.ensure_shingle_view(spark, key=SF_DIR),
         shingle_consumer, "dedup_minhash_lsh"),
        ("prefix", "prefix",
         [lambda: dedup.ensure_shingle_view(spark, key=SF_DIR)],
         lambda: dedup.ensure_prefix_views(spark, key=SF_DIR),
         prefix_consumer, "dedup_prefix_join"),
        ("span", "span",
         [lambda: dedup.ensure_token_view(spark, key=SF_DIR)],
         lambda: dedup.ensure_span_views(spark, key=SF_DIR),
         span_consumer, "dedup_span_exact"),
        ("cluster_index", "cluster_index", [],
         lambda: C.ensure_cluster_views(spark, key=SF_DIR),
         cluster_consumer, "knn_ivfpq_adc"),
        ("minhash_pairs", "minhash_pairs",
         [lambda: dedup.ensure_shingle_view(spark, key=SF_DIR)],
         lambda: dedup.ensure_minhash_pairs_view(spark, key=SF_DIR),
         pairs_consumer, "dedup_incremental"),
        ("phash", "media_phash_sig", [],
         lambda: multimodal.ensure_phash_view(spark, key=SF_DIR),
         phash_consumer, "media_phash_dedup"),
    ]

    result: dict = {"sf_dir": SF_DIR, "planes": {}}
    outputs: dict = {}
    # two alternating rounds per mode, min taken — the first round of
    # everything pays JIT/upstream warm-up, which would otherwise be
    # billed entirely to whichever mode ran first; the mode being part
    # of the plane cache key makes every switch a real rebuild
    for mode in ("local", "table", "local", "table"):
        sess.set_plane_mode(mode)
        for name, label, deps, ensure, consumer, ckey in PLANES:
            row = result["planes"].setdefault(name, {"consumer": ckey})
            for dep in deps:
                dep()
            sess.drain_plane_timings()
            t0 = time.perf_counter()
            ensure()
            wall = time.perf_counter() - t0
            rows = dict(sess.drain_plane_timings())
            build = rows.get(label, wall)
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
        row["consumer_delta_s"] = round(
            row["table_consumer_s"] - row["local_consumer_s"], 3)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results", "plane_mode.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
