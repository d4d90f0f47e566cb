"""Fuzzy token matching: edit-distance <= 1 pairs over a corpus
vocabulary (typo-variant detection — the vocabulary-hygiene check a
tokenizer-training pipeline runs: OCR/typo variants inflate the vocab
and fragment token statistics).

Algorithm: FastSS deletion neighborhoods. Every token's candidate key
set is {token} UNION {token with one character deleted}; two distinct
tokens are within edit distance 1 IFF they share at least one key
(substitution: both delete the differing position; insertion/deletion:
the longer token's deletion equals the shorter token itself). Sharing
a key is therefore a COMPLETE candidate generator for distance 1, and
a native ``levenshtein`` comparison on the (tiny) candidate set makes
the output exact — no all-pairs comparison over the vocabulary ever
runs in the engine.

Scale: the key index is |vocab| x (avg token length + 1) rows keyed by
deletion form — vocabularies are millions of rows where corpora are
billions, so this is a small table by construction; candidate
expansion groups by key (short keys from 1-char tokens are the hot
groups — bounded by the alphabet, so the quadratic term is capped).

Cross-engine note: Spark's ``levenshtein`` counts CHARACTERS while
DuckDB's counts BYTES — identical for ASCII vocabularies (the
declared fixture), divergent on multibyte text; the deletion-
neighborhood arithmetic itself is character-based in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_token_pairs(
    corpus: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct vocabulary token pairs within edit distance 1:
    ``(tok_a, tok_b, dist, n_a, n_b)`` with ``tok_a < tok_b`` and the
    corpus occurrence counts attached (the rarer side is the likely
    typo — the retention decision is the caller's)."""
    vocab = (
        corpus.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("tok")
        )
        .filter(F.length("tok") >= 1)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    # carry the count THROUGH the key index: the postings structs hold
    # (tok, n), so the pair expansion emits counts directly and the
    # vocab aggregate's lineage (a corpus-scale tokenize + exchange)
    # is consumed exactly once — no count-attach joins at the end.
    keys = vocab.select(
        "tok",
        "n",
        F.explode(
            F.expr(
                "array_union(array(tok),"
                " transform(sequence(1, length(tok)),"
                "   i -> concat(substr(tok, 1, i - 1), substr(tok, i + 1))))"
            )
        ).alias("key"),
    )
    return (
        keys.groupBy("key")
        .agg(F.collect_list(F.struct("tok", "n")).alias("_ts"))
        .filter(F.size("_ts") > 1)
        .select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(_ts, a ->
                      transform(filter(_ts, b -> a.tok < b.tok),
                                b -> struct(a.tok AS tok_a, b.tok AS tok_b,
                                            a.n AS n_a, b.n AS n_b))))
                    """
                )
            ).alias("_p")
        )
        .select("_p.tok_a", "_p.tok_b", "_p.n_a", "_p.n_b")
        .distinct()
        .withColumn("dist", F.levenshtein("tok_a", "tok_b"))
        .filter(F.col("dist") <= 1)
        .select("tok_a", "tok_b", "dist", "n_a", "n_b")
    )
