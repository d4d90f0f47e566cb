"""Crawl-ingestion front end on the engine's public API.

The step the other examples assume already happened: raw crawl
segments (WARC) of HTML become the clean document table everything
else consumes — WARC read -> HTML text extraction -> token/quality
gate -> exact dedup survivors. The WARC input is synthesized from the
fixture documents so the example is self-contained; a real deployment
points read_warc at its crawl bucket. Run it locally:

    python examples/crawl_ingest_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import gpd_lite_toolbox_spark as G  # noqa: E402


def run(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 0. synthesize the crawl: wrap each document in HTML chrome and
    # archive it as WARC segments (one per partition)
    html = docs.select(
        F.col("doc_id").alias("id"),
        F.col("source"),
        F.concat(
            F.lit("<html><head><title>d</title></head><body><p>"),
            F.col("text"),
            F.lit('</p><a href="https://out'),
            ((F.col("doc_id") * 3) % 7).cast("string"),
            F.lit('.example.com/p">next</a>'),
            F.lit("<script>track();</script></body></html>"),
        ).alias("text"),
    )
    warc_path = os.path.join(
        tempfile.mkdtemp(prefix="crawl_example_"), "segments"
    )
    manifest = G.write_warc(html, warc_path)

    # 1. ingest: parallel per-segment read, record ids carry the doc id
    raw = G.read_warc(spark, warc_path).select(
        F.regexp_extract("record_id", r"urn:spark-graft:(\d+)", 1)
        .cast("bigint").alias("id"),
        F.col("text").alias("html"),
    )

    # 2. strip the HTML chrome back to text (zero-shuffle expression)
    extracted = G.extract_html_text(raw)

    # 3. quality gate with stage-by-stage accounting
    funnel = G.quality_funnel(extracted)

    # 4. exact dedup: keep the canonical copy per content hash
    dup = G.exact_dedup(extracted)

    # 5. crawl-frontier curation: outlink graph per source domain,
    # then fixed-iteration PageRank over the domain->domain edges —
    # the rank table that weights tomorrow's fetch priorities
    links = G.link_graph(html, html_col="text")
    ranks = G.pagerank(
        links.filter(F.col("target_domain") != "(relative)"),
        iters=5,
        src_col="source",
        dst_col="target_domain",
        weight_col="n_links",
    )

    summary = manifest.agg(
        F.count("*").alias("n_segments"),
        F.sum("n_records").alias("n_records"),
    ).crossJoin(
        extracted.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    ).crossJoin(
        dup.agg(F.coalesce(F.sum("n_copies") - F.count("*"), F.lit(0))
                .alias("n_dropped_dups"))
    )
    return funnel, summary, ranks


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = G.get_spark("crawl-ingest-pipeline")
    funnel, summary, ranks = run(spark, sf_dir)
    print("quality funnel:")
    funnel.show(truncate=False)
    print("ingest summary:")
    summary.show(truncate=False)
    print("top domains by PageRank:")
    ranks.orderBy(F.col("rank").desc()).show(5, truncate=False)


if __name__ == "__main__":
    main()
