"""Composed training-data cleaning pipeline.

The individual text operators (dedup, quality, language ID, token
stats) each hold their own oracle; this module composes them into the
END-TO-END shape a 100 TB corpus actually runs — dedup survivors ->
quality gate -> language routing -> per-language accounting — entirely
in native column expressions, so the whole pipeline is ONE Catalyst
plan: the dedup is the only wide shuffle (content-hash window), the
gates are filters fused into the same stage, and the final summary is
an ordinary partial-aggregated groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import lang_id, quality_score, token_stats

MIN_QUALITY = 0.666667  # >= 2 of 3 quality checks (rounded as emitted)


def clean_corpus_summary(
    corpus: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    min_quality: float = MIN_QUALITY,
) -> DataFrame:
    """Per-language accounting of the cleaned corpus:
    (pred_lang, n_docs, n_tokens, sum_quality).

    Stages: (1) exact dedup keeps the min-id copy per content hash —
    the canonical-survivor rule of exact_dedup as a filter rather than
    a report; (2) documents below ``min_quality`` drop; (3) survivors
    route by predicted language and aggregate document/token counts
    and total quality mass."""
    hashed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.md5(text_col).alias("_ch"),
    )
    w = Window.partitionBy("_ch").orderBy("id")
    survivors = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "text")
    )
    q = quality_score(survivors).filter(
        F.col("quality") >= F.lit(float(min_quality))
    )
    lang = lang_id(survivors).select("id", "pred_lang")
    toks = token_stats(survivors).select("id", "n_tokens")
    return (
        q.join(lang, "id")
        .join(toks, "id")
        .groupBy("pred_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum("quality"), 6).alias("sum_quality"),
        )
    )
