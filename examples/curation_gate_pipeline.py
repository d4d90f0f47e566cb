"""End-to-end curation gate on the engine's public API — the
session-9 operator family composed into the decide-what-trains flow:

1. Bloom-filter benchmark decontamination (constant-size sketch, the
   shape used when the eval suite must ship to every executor),
2. SimHash Hamming near-dup pairs feeding leakage-safe train/val/test
   splitting (whole duplicate clusters move together),
3. weak-supervision keep/drop votes with the labeling-function
   diagnostic,
4. composite quality blend (rule z-score x LM z-score),
5. curriculum ordering of the surviving training split,
6. repeated-ngram memorization audit of what made it through.

Run locally:

    python examples/curation_gate_pipeline.py [sf_dir]

Every stage is a DataFrame transformation; only small report tables
collect.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import gpd_lite_toolbox_spark as G  # noqa: E402
from gpd_lite_toolbox_spark import fixtures as FX  # noqa: E402


def run(spark, sf_dir):
    corpus = FX.fixture_df(spark, sf_dir, "corpus")

    # 0. the held-out benchmark: a small id%101 slice (stand-in for an
    # eval suite); the train side is everything else
    bench = corpus.filter(F.col("id") % 101 == 0)
    train = corpus.filter(F.col("id") % 101 != 0)

    # 1. decontaminate through the broadcast Bloom sketch. The
    # synthetic fixture's vocabulary overlaps heavily (almost every
    # doc shares SOME shingle with the benchmark), so the drop policy
    # is the near-verbatim bar — many distinct shared shingles — not
    # "any hit"; real corpora with natural vocabulary use min_hits=1.
    hits = G.bloom_decontaminate(train, bench)
    contaminated = hits.filter(F.col("n_hits") >= 40)
    clean = train.join(contaminated.select("id"), "id", "left_anti")

    # 2. leakage-safe splitting: near-dup clusters (MinHash graph) are
    # assigned to train/val/test as WHOLE units
    split = G.leakage_safe_split(clean)

    # 3. weak labels + the Snorkel-style diagnostic over the clean pool
    votes = G.weak_labels(clean)
    diag = G.lf_diagnostics(clean)

    # 4. composite quality: z-scored rule points blended with the
    # negated z-scored unigram NLL; keep the positive-blend docs
    blend = G.quality_blend(clean)
    kept = (
        split.filter(F.col("split") == "train")
        .join(votes.filter(F.col("label") != "drop").select("id"), "id")
        .join(blend.filter(F.col("keep")).select("id"), "id")
    )

    # 5. curriculum order over the surviving training docs
    curriculum = G.curriculum_order(clean.join(kept.select("id"), "id"))

    # 6. memorization audit of the final pool: the most repeated
    # 40-grams that survived every gate
    audit = G.repeated_ngrams(
        clean.join(kept.select("id"), "id"), length=40, top_k=10
    )

    summary = (
        corpus.agg(F.count("*").alias("n_input"))
        .crossJoin(F.broadcast(
            contaminated.agg(F.count("*").alias("n_contaminated"))))
        .crossJoin(F.broadcast(kept.agg(F.count("*").alias("n_kept"))))
        .crossJoin(F.broadcast(
            curriculum.agg(F.max("position").alias("max_position"))))
    )
    return split, diag, curriculum, audit, summary


if __name__ == "__main__":
    from gpd_lite_toolbox_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation_gate_pipeline")
    split, diag, curriculum, audit, summary = run(spark, sf)
    split.groupBy("split").count().show()
    diag.show()
    curriculum.orderBy("position").show(5)
    audit.show(10, truncate=60)
    summary.show()
