"""Corpus health dashboard on the engine's public API.

The monitoring side the other examples leave out: after ingest
(crawl_ingest_pipeline) and curation (training_data_pipeline), a
standing report answers "is the corpus still what we shipped?" —
per-source vocabulary size WITHOUT an exact distinct (KMV sketch),
distribution drift per source (unigram JS divergence vs the pooled
corpus), script composition (mixed-script mojibake shows up here
before any model does), padding waste under length-bucketed batching
(the data-loader cost number), and quote/subset duplication that
symmetric near-dup passes cannot see (word-ngram containment). Run it
locally:

    python examples/corpus_health_report.py [sf_dir]

Every stage is a DataFrame transformation; only the final small
report tables collect.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import gpd_lite_toolbox_spark as G  # noqa: E402
from gpd_lite_toolbox_spark import fixtures as FX  # noqa: E402


def run(spark, sf_dir):
    FX.register_base_tables(spark, sf_dir)
    docs = spark.table("documents").select(
        F.col("doc_id").alias("id"), "text", "source"
    )

    # 1. vocabulary size per source, sketched: k hashes of state per
    # source instead of an exact distinct over the token table
    vocab = G.kmv_vocab_sketch(docs, k=16, strata_col="source")

    # 2. drift: which source's unigram distribution walked away from
    # the pooled corpus (0 = identical, ln2 = disjoint)
    drift = G.unigram_divergence(docs, strata_col="source")

    # 3. script composition: rolled up per source — a Latin corpus
    # suddenly growing Cyrillic mass is an encoding or spam incident
    scripts = (
        G.script_profile(docs.select("id", "text"))
        .join(docs.select("id", "source"), "id")
        .groupBy("source")
        .agg(
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_latin").alias("n_latin"),
            F.sum(
                F.col("n_cyrillic") + F.col("n_han") + F.col("n_arabic")
                + F.col("n_hangul") + F.col("n_kana")
            ).alias("n_non_latin"),
        )
    )

    # 4. padding waste if batches pad to power-of-two buckets: the
    # number the loader's bucket boundaries are tuned from
    buckets = G.length_buckets(docs, "text")

    # 5. quote/subset duplication: containment catches the embedded
    # copies Jaccard is blind to
    contained = G.ngram_containment_pairs(docs, threshold=0.8, max_df=64)

    summary = (
        buckets.agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_tokens").alias("n_tokens"),
            F.sum("padded_tokens").alias("n_padded"),
        )
        .crossJoin(
            F.broadcast(
                contained.agg(F.count("*").alias("n_contained_pairs"))
            )
        )
        .select(
            "n_docs",
            "n_tokens",
            F.round(
                F.lit(1.0) - F.col("n_tokens") / F.col("n_padded"), 4
            ).alias("padding_waste"),
            "n_contained_pairs",
        )
    )
    return vocab, drift, scripts, summary


if __name__ == "__main__":
    from gpd_lite_toolbox_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_health_report")
    vocab, drift, scripts, summary = run(spark, sf)
    vocab.show()
    drift.orderBy(F.col("jsd").desc()).show(5)
    scripts.show(5)
    summary.show()
