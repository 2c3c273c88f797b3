#!/usr/bin/env python
"""sf0.2 stretch point for the dedup_prefix_join growth claim
(round-4 verdict ask #3 / r5 #2).

There is no driver-generated sf0.2 dataset, so this builds one for the
DOCUMENTS table only (the sole input of the shared-shingle joins): the
sf0.1 corpus plus a deterministically perturbed copy (doc_id offset,
one sentinel token appended — copies stay near-duplicates of their
originals, so every doc gains a near-dup twin and duplication
clusters double in size — the output pair set grows far faster than
the 2x corpus (measured ~23x on this duplication-dense fixture), the
worst case the claim is about). Other tables are symlinked from sf0.1.

Writes one JSON line to stdout (redirect to
bench_results/prefix_stretch.json); scripts/gen_scaling.py folds it
into SCALING.md when present.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf0.2_stretch"
KEYS = ("dedup_prefix_join", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_span_exact", "dedup_winnow_overlap", "dedup_containment")


def build_stretch_dir() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        link = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    out = os.path.join(DST, "documents.parquet")
    if os.path.exists(out):
        return
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT * FROM '{SRC}/documents.parquet'
          UNION ALL
          SELECT doc_id + (SELECT max(doc_id) + 1
                           FROM '{SRC}/documents.parquet') AS doc_id,
                 text || ' stretchtok' || CAST(doc_id % 7 AS VARCHAR) AS text,
                 lang, source,
                 n_chars + length(' stretchtok' || CAST(doc_id % 7 AS VARCHAR))
                   AS n_chars
          FROM '{SRC}/documents.parquet'
        ) TO '{out}' (FORMAT PARQUET)""")


def main() -> None:
    import __spark_entry__ as ent
    from aws_trusted_advisor_explorer_spark.session import get_spark

    build_stretch_dir()
    spark = get_spark("prefix_stretch")
    qs = ent.queries()
    result: dict = {"keys": {}}
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf0.2x", DST)):
        for key in KEYS:
            qs[key](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()  # warm
        for key in KEYS:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            n_pairs = qs[key](spark, sf_dir).count()
            result["keys"].setdefault(key, {})[sf_label] = {
                "sec": round(best, 4), "rows": n_pairs}
    for key, d in result["keys"].items():
        d["growth"] = round(d["sf0.2x"]["sec"] / d["sf0.1"]["sec"], 2)
        d["pair_growth"] = round(
            d["sf0.2x"]["rows"] / max(d["sf0.1"]["rows"], 1), 2)
    print(json.dumps(result))
    spark.stop()
    shutil.rmtree(DST, ignore_errors=True)


if __name__ == "__main__":
    main()
