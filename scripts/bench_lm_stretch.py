#!/usr/bin/env python
"""sf0.2 stretch point for the r6 LM/CCNet plane and the bucketized
interval join (round-6 verdict ask #5): these are the heaviest new
operators and had only the 3-SF sweep anchors, so this pins their
linear-growth claims with a 2x input point each.

- documents 2x (same perturbed-near-dup builder as
  scripts/bench_prefix_stretch.py): `text_lm_score_ref` scores twice
  the docs against vocab-sized model relations, and
  `docs_ccnet_buckets` CDFs a distribution whose support barely grows
  — both should grow ~linearly in the corpus, never in pairs.
- events 2x (a second DISJOINT epoch: the copy's timestamps shift past
  the original horizon, event_ids offset): `events_interval_join`'s
  output pair set grows ~2x with the input, so wall growth near 2x is
  the linear claim; within-epoch duplication (which would quadruple
  bucket pairs) is deliberately avoided so output growth is the
  controlled variable.

Writes one JSON line to stdout (redirect to
bench_results/lm_stretch.json); scripts/gen_scaling.py folds it into
SCALING.md when present.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf0.2_lm_stretch"
DOC_KEYS = ("text_lm_score_ref", "docs_ccnet_buckets")
EVT_KEYS = ("events_interval_join",)
KEYS = DOC_KEYS + EVT_KEYS


def build_stretch_dir() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        link = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    con = duckdb.connect()
    docs = os.path.join(DST, "documents.parquet")
    if not os.path.exists(docs):
        con.sql(f"""
            COPY (
              SELECT * FROM '{SRC}/documents.parquet'
              UNION ALL
              SELECT doc_id + (SELECT max(doc_id) + 1
                               FROM '{SRC}/documents.parquet') AS doc_id,
                     text || ' stretchtok' || CAST(doc_id % 7 AS VARCHAR)
                       AS text,
                     lang, source,
                     n_chars + length(' stretchtok' ||
                                      CAST(doc_id % 7 AS VARCHAR))
                       AS n_chars
              FROM '{SRC}/documents.parquet'
            ) TO '{docs}' (FORMAT PARQUET)""")
    evts = os.path.join(DST, "events.parquet")
    if not os.path.exists(evts):
        con.sql(f"""
            COPY (
              SELECT * FROM '{SRC}/events.parquet'
              UNION ALL
              SELECT event_id + (SELECT max(event_id) + 1
                                 FROM '{SRC}/events.parquet') AS event_id,
                     ts + ((SELECT max(ts) - min(ts) FROM
                            '{SRC}/events.parquet') + INTERVAL 1 DAY) AS ts,
                     user_id, event_type, value, props
              FROM '{SRC}/events.parquet'
            ) TO '{evts}' (FORMAT PARQUET)""")


def main() -> None:
    import __spark_entry__ as ent
    from aws_trusted_advisor_explorer_spark.session import get_spark

    build_stretch_dir()
    spark = get_spark("lm_stretch")
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
            n_rows = qs[key](spark, sf_dir).count()
            result["keys"].setdefault(key, {})[sf_label] = {
                "sec": round(best, 4), "rows": n_rows}
    for key, d in result["keys"].items():
        d["growth"] = round(d["sf0.2x"]["sec"] / d["sf0.1"]["sec"], 2)
        d["row_growth"] = round(
            d["sf0.2x"]["rows"] / max(d["sf0.1"]["rows"], 1), 2)
    print(json.dumps(result))
    spark.stop()
    shutil.rmtree(DST, ignore_errors=True)


if __name__ == "__main__":
    main()
