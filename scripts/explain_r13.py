#!/usr/bin/env python
"""Capture .explain("formatted") before/after plans for every query /
plane the r13 optimization round touched, into plans/r13/. "Before"
forms are reconstructed from the still-present standalone builders
(kernels, full_recompute arms, literal BPE path) so the diff is
auditable without checking out the old commit.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r13")


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(name)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    from pyspark.sql import functions as F

    from aws_trusted_advisor_explorer_spark.functions.dual import SPARK
    from aws_trusted_advisor_explorer_spark.operators import (
        clusterops as C, corpusops, dedup, multimodal, similarity as S,
        textops as T,
    )
    from aws_trusted_advisor_explorer_spark.plans import fixtures
    from aws_trusted_advisor_explorer_spark.session import (
        get_spark, kernel_partitions,
    )

    spark = get_spark("explain_r13")
    fixtures.register_raw_tables(spark, SF)

    # --- gram-plane family -------------------------------------------
    docs = spark.table("documents").select("doc_id", "text")
    dump("plane_gram_family_before",
         docs.mapInPandas(dedup._shingle_hash_kernel,
                          schema="doc_id long, hv long")
         .unionByName(
             docs.mapInPandas(dedup.make_gram_hv_kernel(5, with_pos=False),
                              schema="doc_id long, hv long"))
         .unionByName(
             docs.mapInPandas(dedup._span_gram_kernel,
                              schema="doc_id long, pos int, hv long")
             .drop("pos")))  # r12: three separate corpus scans+folds
    dump("plane_gram_family_after",
         docs.repartition(kernel_partitions(docs))
         .mapInPandas(dedup._gram_fold_kernel,
                      schema="stream int, doc_id long, pos int, hv long"))

    base = dedup.ensure_shingle_view(spark, key=SF)
    cv = dedup.ensure_ngram_common_view(spark, key=SF)
    sv = dedup.ensure_minhash_sigs_view(spark, key=SF)
    pv = dedup.ensure_minhash_pairs_view(spark, key=SF)

    # --- exact-pair family -------------------------------------------
    dump("dedup_ngram_jaccard_before",
         spark.sql(dedup.dedup_ngram_jaccard(SPARK, base)))
    dump("dedup_ngram_jaccard_after",
         spark.sql(dedup.dedup_ngram_jaccard(SPARK, base, common_view=cv)))
    dump("dedup_containment_before",
         spark.sql(dedup.dedup_containment(SPARK, base)))
    dump("dedup_containment_after",
         spark.sql(dedup.dedup_containment(SPARK, base, common_view=cv)))
    dump("dedup_lsh_recall_before",
         spark.sql(dedup.dedup_lsh_recall(SPARK, base, pairs_view=pv)))
    dump("dedup_lsh_recall_after",
         spark.sql(dedup.dedup_lsh_recall(SPARK, base, pairs_view=pv,
                                          common_view=cv)))
    dump("dedup_band_tuning_before",
         dedup.dedup_band_tuning_df(spark, base))
    dump("dedup_band_tuning_after",
         dedup.dedup_band_tuning_df(spark, base, common_view=cv,
                                    mh_view=sv))
    dump("dedup_minhash_lsh_before",
         spark.sql(dedup.dedup_minhash_lsh(SPARK, base)))
    dump("dedup_minhash_lsh_after",
         spark.sql(dedup.dedup_minhash_lsh(SPARK, base, mh_view=sv)))
    dump("dedup_minhash_estimate_before",
         spark.sql(dedup.dedup_minhash_estimate(SPARK, base,
                                                pairs_view=pv)))
    dump("dedup_minhash_estimate_after",
         spark.sql(dedup.dedup_minhash_estimate(SPARK, base, pairs_view=pv,
                                                mh_view=sv)))

    # --- embedding Gram family ---------------------------------------
    gv = S.ensure_emb_gram_view(spark, key=SF)
    dump("embeddings_covariance_before", S.embeddings_covariance_df(spark))
    dump("embeddings_covariance_after",
         S.embeddings_covariance_df(spark, base=gv))
    dump("embeddings_power_iteration_before",
         S.embeddings_power_iteration_df(spark))
    dump("embeddings_power_iteration_after",
         S.embeddings_power_iteration_df(spark, base=gv))
    dump("plane_emb_pca_dirs_before", S.pca_dirs_df(spark))
    dump("plane_emb_pca_dirs_after", S.pca_dirs_df(spark, base=gv))

    # --- BPE apply path ----------------------------------------------
    dict_view = T.ensure_bpe_dict_view(spark, key=SF)
    merges = T.ensure_bpe_merges(spark, key=SF, base=dict_view)
    old_max = T.BPE_LITERAL_MAX
    try:
        T.BPE_LITERAL_MAX = 10_000
        dump("text_bpe_tokenize_count_before",
             T.text_bpe_tokenize_count_df(spark, merges=merges))
    finally:
        T.BPE_LITERAL_MAX = old_max
    dump("text_bpe_tokenize_count_after",
         T.text_bpe_tokenize_count_df(spark, merges=merges))

    # --- release refresh audit arms ----------------------------------
    dump("docs_release_refresh_before",
         corpusops.docs_release_refresh_df(spark, key=SF,
                                           full_recompute=True))
    dump("docs_release_refresh_after",
         corpusops.docs_release_refresh_df(spark, key=SF))
    dump("pairs_release_refresh_before",
         multimodal.pairs_release_refresh_df(spark, key=SF,
                                             full_recompute=True))
    dump("pairs_release_refresh_after",
         multimodal.pairs_release_refresh_df(spark, key=SF))

    spark.stop()


if __name__ == "__main__":
    main()
