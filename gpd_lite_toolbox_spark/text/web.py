"""Web-corpus audits: URL extraction and per-domain statistics.

Extension beyond gpd_lite_toolbox (LLM-pipeline family): web-scraped
training corpora are filtered and weighted by source domain, which
needs (a) URL extraction from raw text and (b) a domain frequency
table. Both are native expressions — extraction is a zero-shuffle
regexp projection, the domain rollup is one partial-aggregated
exchange — and the URL regex sticks to the Java/RE2 intersection so
the DuckDB oracle (oracles.URL_STATS) shares it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._/%-]*)?"
DOMAIN_PATTERN = r"https?://([^/]+)"


def extract_urls(
    corpus: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """One row per URL occurrence: ``(id, url, domain)``. Documents
    without URLs emit nothing (explode of an empty match array)."""
    urls = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(URL_PATTERN), F.lit(0)
            )
        ).alias("url"),
    )
    return urls.withColumn(
        "domain", F.regexp_extract("url", DOMAIN_PATTERN, 1)
    )


def url_stats(
    corpus: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Per-domain rollup ``(domain, n_urls, n_docs)`` — total URL
    occurrences and distinct documents linking the domain."""
    return (
        extract_urls(corpus, id_col=id_col, text_col=text_col)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("id").alias("n_docs"),
        )
    )
