"""End-to-end training-data pipeline on the engine's public API.

The 100 TB shape in miniature: ingest -> audit -> PII redaction ->
dedup (exact + near) -> benchmark decontamination -> domain-mixture
sampling -> chunking -> sequence packing -> deterministic shuffle ->
shard files + accounting. Run it locally:

    python examples/training_data_pipeline.py [sf_dir]

Every stage is a DataFrame transformation; nothing collects more than
the final summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import gpd_lite_toolbox_spark as G  # noqa: E402


def run(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), "text", "lang"
    )

    # 1. audit the raw drop before spending compute on it
    audit = G.quality_report([
        G.predicate_violations(docs, {
            "empty_text": F.length("text") == 0,
            "null_lang": F.col("lang").isNull(),
        }),
        G.uniqueness_violations(docs, ["id"], rule="dup_id"),
    ])

    # 2. PII redaction: typed placeholders replace emails/phones/
    # SSNs/IPs before anything else sees the text (zero-shuffle scan)
    docs = (
        G.pii_scan(docs.select("id", "text"), redact=True)
        .select("id", "text")
        .join(docs.select("id", "lang"), "id")
    )

    # 2b. exact dedup: drop every copy after the canonical min-id one
    dup = G.exact_dedup(docs)  # (content_hash, n_copies, keep_id)
    survivors = docs.join(
        docs.select("id", F.md5("text").alias("content_hash"))
        .join(dup.select("content_hash", "keep_id"), "content_hash")
        .filter(F.col("id") != F.col("keep_id"))
        .select("id"),
        "id",
        "left_anti",
    )

    # 3. near-dup pairs (exact n-gram Jaccard); drop the larger id
    pairs = G.ngram_jaccard_pairs(survivors, threshold=0.5, max_df=40)
    survivors = survivors.join(
        pairs.select(F.col("id_b").alias("id")).distinct(), "id", "left_anti"
    )

    # 3b. exact-substring dedup (the suffix-array family): drop the
    # larger-id side of any pair sharing a verbatim run >= 60 chars —
    # catches templated/boilerplate overlap that whole-doc Jaccard
    # misses
    spans = G.exact_substring_spans(survivors, min_len=60)
    survivors = survivors.join(
        spans.select(F.col("id_b").alias("id")).distinct(), "id", "left_anti"
    )

    # 4. benchmark decontamination: drop any doc sharing n-grams with
    # the held-out eval slice (mocked here as an id-sliced subset)
    bench = docs.filter(F.col("id") % 101 == 0)
    train = survivors.filter(F.col("id") % 101 != 0)
    flagged = G.decontaminate(train, bench)
    train = train.join(flagged.select("id"), "id", "left_anti")

    # 4b. language-agreement gate: a bag-of-words classifier trained
    # on the corpus's own lang tags; documents whose predicted
    # language disagrees with their tag are suspect (mislabeled or
    # mixed-language). The synthetic fixture's vocab overlaps across
    # langs, so this gate is illustrative — real corpora separate far
    # more cleanly.
    model, classes = G.train_nb(
        train.select("id", "text", F.col("lang").alias("label"))
    )
    mislabeled = (
        G.score_nb(train.select("id", "text"), model, classes)
        .select("id", F.col("label").alias("predicted"))
        .join(train.select("id", "lang"), "id")
        .filter(F.col("predicted") != F.col("lang"))
    )
    train = train.join(mislabeled.select("id"), "id", "left_anti")

    # 5. language-stratified downsampling (deterministic, retry-stable)
    sampled = G.stratified_sample(
        train, "lang",
        rates={"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 0.75},
    )

    # 5b. quality-weighted budget cut: a FIXED token/doc budget filled
    # by the length-weighted exponential race (deterministic, top-k
    # heaps — a k near the corpus size would fall out of the TakeOrdered
    # regime into a full sort, so budgets are absolute, not fractions)
    # the budgeted sample is the bounded table every later stage
    # (chunking, tokenizer training, mixture, packing, pricing) reads;
    # materialize it ONCE — lazily chained, each downstream action
    # re-evaluated the full dedup+sampling DAG (measured ~5x on this
    # pipeline)
    sampled = G.weighted_sample(
        sampled.withColumn("w", F.length("text").cast("double")),
        "w",
        k=400,
    ).drop("w", "es_key").localCheckpoint()

    # 6. split long docs into model-window chunks (map-only). The
    # composite id is collision-free while docs stay under 1M chunks
    # (= 56M whitespace tokens at this stride) — far beyond any real
    # document; a corpus that can't promise it should hash (id,
    # chunk_id) instead.
    chunks = G.chunk_documents(
        sampled, max_tokens=64, overlap=8
    ).select(
        (F.col("id") * 1_000_000 + F.col("chunk_id")).alias("id"),
        F.col("chunk_text").alias("text"),
    )

    # 6b. tokenizer: learn a merge table FROM the curated corpus (the
    # artifact a tokenizer ships), and a temperature-scaled source
    # mixture for the sampler config
    merges = G.bpe_train(sampled, n_merges=6)
    # 6c. tokenizer PRICING: fertility (tokens per word) per source
    # under both shipped tokenizers — greedy BPE merges vs the
    # unigram inventory's optimal Viterbi segmentation; the number
    # that prices a source's training cost under each
    sourced = sampled.join(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").alias("id"), F.col("source").alias("source")
        ),
        "id",
    )
    pricing = (
        G.bpe_fertility(sourced)
        .select("source", F.col("fertility").alias("bpe_fertility"))
        .join(
            G.unigram_fertility(sourced).select(
                "source", F.col("fertility").alias("unigram_fertility")
            ),
            "source",
        )
    )
    mixture = G.temperature_mixture(
        sampled.join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                F.col("doc_id").alias("id"), "source"
            ),
            "id",
        ),
        token_budget=100_000,
        alpha=0.5,
    )

    # 7. pack into fixed token-budget shards (pretraining layout)
    packed = G.pack_sequences(chunks, budget=512)

    # 8. deterministic training shuffle + shard accounting (a real run
    # would write files with G.write_training_shards(chunks, path, n))
    shuffled = G.shard_corpus(chunks, n_shards=8, seed=0)

    shards = packed.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.max("shard_end") + 1).alias("n_shards"),
    ).join(
        shuffled.agg(
            F.countDistinct("shard").alias("n_shuffle_shards"),
            F.count("*").alias("n_shuffled_rows"),
        )
    )
    return audit, shards, merges, mixture, pricing


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = G.get_spark("training-data-pipeline")
    audit, shards, merges, mixture, pricing = run(spark, sf_dir)
    print("audit:")
    audit.show(truncate=False)
    print("shard accounting:")
    shards.show(truncate=False)
    print("learned BPE merges:")
    merges.orderBy("step").show(truncate=False)
    print("temperature mixture:")
    mixture.orderBy("source").show(truncate=False)
    print("tokenizer pricing (fertility per source, BPE vs unigram):")
    pricing.orderBy("source").show(truncate=False)


if __name__ == "__main__":
    main()
