"""Persisted corpus-substrate layer: pay each corpus-scale text fold
ONCE per corpus version, serve every later query from parquet.

The dedup/LM families each derive from a small set of per-doc tables
that are pure functions of the corpus text — char-shingle sets,
word-n-gram sets, minhash signatures, bigram counts, the token
vocabulary. One-shot operators rebuild them per session (behind
``cache.tracked_persist``), which is right for exploratory use; a
production curation pipeline instead materializes them next to the
corpus and runs every day-2 query off the materialized form — the
same pattern ``write_minhash_index`` / ``write_ivf_index`` already
ship for their families (reference scope: an extension beyond
mthh/gpd_lite_toolbox, per the LLM-pipeline mandate).

Contract:
- ``write_substrate(corpus, path)`` builds each substrate with the
  IDENTICAL expression its one-shot operator uses and writes it to
  ``<path>/<name>`` as parquet — so a query fed from the substrate is
  hash-identical to the one-shot form (pinned in
  tests/test_substrate.py).
- ``read_substrate(spark, path, name)`` returns the parquet scan; the
  consumers accept it via their ``sets= / sig= / verify_sets= /
  counts= / unigrams=`` parameters and then never touch the raw text.

Scale shape: every substrate is one partial-combined pass over the
corpus (or a pure projection) and writes doc-sized or vocab-sized
rows; reads are plain columnar scans that prune to the columns each
consumer needs. At 100 TB this converts the per-query corpus fold —
the measured floor of the ngram/minhash/bigram bench rows — into a
once-per-corpus-version batch cost, which is how curation pipelines
actually amortize (Dolma, RefinedWeb, CCNet all checkpoint shards of
exactly these tables between passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _build_ngram_sets(corpus, id_col, text_col):
    from .dedup import ngram_doc_sets

    return ngram_doc_sets(corpus, id_col, text_col)


def _build_word_ngram_sets(corpus, id_col, text_col):
    from .dedup import ngram_doc_sets, word_ngram_array_expr

    return ngram_doc_sets(
        corpus, id_col, text_col, set_expr=word_ngram_array_expr
    )


def _build_minhash_sigs(corpus, id_col, text_col):
    from .dedup import minhash_signatures

    return minhash_signatures(corpus, id_col=id_col, text_col=text_col)


def _build_minhash_verify_sets(corpus, id_col, text_col):
    from .dedup import _widen, shingle_str_array_expr

    return _widen(corpus).select(
        F.col(id_col).alias("id"),
        F.array_sort(shingle_str_array_expr(text_col)).alias("_ss"),
    )


def _build_bigram_counts(corpus, id_col, text_col):
    from .corpus import bigram_doc_counts

    return bigram_doc_counts(corpus, id_col, text_col)


def _build_unigram_counts(corpus, id_col, text_col):
    return (
        corpus.select(
            F.explode(F.split(F.col(text_col), " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )


# name -> builder; each builder's output schema is the exact input
# schema of the consumer parameter it feeds (see module docstring)
SUBSTRATES = {
    "ngram_sets": _build_ngram_sets,  # ngram_jaccard(_prefix)_pairs sets=
    "word_ngram_sets": _build_word_ngram_sets,  # ngram_containment_pairs sets=
    "minhash_sigs": _build_minhash_sigs,  # minhash_lsh_pairs sig=
    "minhash_verify_sets": _build_minhash_verify_sets,  # ... verify_sets=
    "bigram_counts": _build_bigram_counts,  # bigram/kn_bigram counts=
    "unigram_counts": _build_unigram_counts,  # bigram_logprob unigrams=
}


def write_substrate(
    corpus: DataFrame,
    path: str,
    which: list[str] | None = None,
    id_col: str = "id",
    text_col: str = "text",
) -> list[str]:
    """Materialize the named substrates (default: all) of ``corpus``
    under ``<path>/<name>``; returns the names written.  Overwrite
    semantics per substrate directory — rewriting one name never
    touches the others, so incremental corpus-version bumps can
    refresh only the folds whose definition changed."""
    names = list(SUBSTRATES) if which is None else list(which)
    unknown = [n for n in names if n not in SUBSTRATES]
    if unknown:
        raise ValueError(
            f"unknown substrates {unknown}; available: {sorted(SUBSTRATES)}"
        )
    for name in names:
        df = SUBSTRATES[name](corpus, id_col, text_col)
        df.write.mode("overwrite").parquet(f"{path}/{name}")
    return names


def append_to_substrate(
    batch: DataFrame,
    path: str,
    which: list[str] | None = None,
    id_col: str = "id",
    text_col: str = "text",
) -> list[str]:
    """Admit an ingest batch into the materialized substrates — the
    day-2 maintenance step after the batch survives dedup (mirrors
    ``append_to_minhash_index``). Per-doc substrates (sets,
    signatures, bigram counts) append cleanly because their rows are
    keyed by doc id; ids must not already exist (the writer's
    unique-id contract).

    ``unigram_counts`` is deliberately NOT appendable: it is a
    corpus-LEVEL aggregate (appending per-batch counts would leave
    duplicate ``tok`` rows and silently inflate the vocabulary
    consumers count). Rebuild it with
    ``write_substrate(corpus, path, which=['unigram_counts'])`` on
    the admitted corpus, or maintain it transactionally outside this
    layer."""
    names = (
        [n for n in SUBSTRATES if n != "unigram_counts"]
        if which is None
        else list(which)
    )
    unknown = [n for n in names if n not in SUBSTRATES]
    if unknown:
        raise ValueError(
            f"unknown substrates {unknown}; available: {sorted(SUBSTRATES)}"
        )
    if "unigram_counts" in names:
        raise ValueError(
            "unigram_counts is a corpus-level aggregate and cannot be "
            "appended per batch; rebuild it with write_substrate(..., "
            "which=['unigram_counts'])"
        )
    for name in names:
        df = SUBSTRATES[name](batch, id_col, text_col)
        df.write.mode("append").parquet(f"{path}/{name}")
    return names


def read_substrate(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Scan one materialized substrate. Raises (AnalysisException)
    when the directory is missing — a silent empty fallback here
    would let a day-2 dedup pass admit everything, the same hazard
    class ingest_near_dups guards against."""
    if name not in SUBSTRATES:
        raise ValueError(
            f"unknown substrate {name!r}; available: {sorted(SUBSTRATES)}"
        )
    return spark.read.parquet(f"{path}/{name}")
