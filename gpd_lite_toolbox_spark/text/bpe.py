"""Distributed BPE tokenizer training: iterative merge-pair learning.

Extension beyond gpd_lite_toolbox (LLM-pipeline family): the tokenizer
IS part of the training-data pipeline — merge tables are learned from
the corpus the model will train on, and at 100 TB that counting job is
a cluster job (HuggingFace tokenizers / SentencePiece train
single-node on a SAMPLE; the distributed formulation counts the full
corpus exactly).

Structure (why this scales):

- The corpus collapses to the WORD VOCABULARY first — ``(word, n)``
  via one combinable aggregate. Every subsequent iteration runs over
  the vocab table (|distinct words|, Zipf-bounded), never the corpus:
  the classic Sennrich et al. formulation, which is what makes BPE
  training tractable at all.
- Each merge step is: row-local adjacent-pair explode over the
  current symbol arrays -> combinable (a, b) count weighted by word
  frequency -> argmax via a 1-row TakeOrdered collect. The single-row
  collect per iteration is the algorithm's nature — the winning pair
  must become a LITERAL in the next step's rewrite plan (exactly how
  a driver program coordinates any iterative refinement on Spark).
- The merge applies as a row-local left-to-right fold over each
  symbol array (greedy non-overlapping, the reference BPE semantics),
  and the vocab table ``localCheckpoint``s per round — the dup_groups
  / pagerank lineage discipline.

Evidence: the full merge table is pinned EXACTLY against a pure-Python
reference implementation in pytest (two independent algorithms); the
iteration-1 pair-count table is additionally hash-gated against DuckDB
(``oracles.BPE_PAIR_COUNTS``) — the argmax input, checked
relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(w, n)`` — whitespace word frequencies, the BPE training
    state seed. One combinable exchange; empty tokens dropped."""
    return (
        corpus.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def char_seqs(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """``(syms, n)`` — the character-split word vocabulary, the shared
    iteration-0 state of ``bpe_train`` AND the hash-gated
    ``bpe_pair_counts`` query (one seeding definition, so the gate
    covers the trained path's substrate by construction)."""
    return word_vocab(corpus, text_col=text_col).select(
        F.split("w", "").alias("syms"), "n"
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over ``(syms, n)`` weighted by word
    frequency: row-local slice+zip pair derivation (the bigram_pmi
    shape — no positional self-join), then one combinable aggregate."""
    pairs = seqs.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
            )
        ).alias("_p"),
        "n",
    ).select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"), "n")
    return pairs.groupBy("a", "b").agg(F.sum("n").alias("cnt"))


def _apply_merge(syms_col: "F.Column", left: str, right: str) -> "F.Column":
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — a row-local fold; a freshly merged symbol is atomic (its
    tail cannot re-trigger the same pair), matching reference BPE."""
    merged = left + right
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def bpe_train(
    corpus: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    merge table ``(step, left, right, cnt)`` in learned order —
    the artifact a tokenizer ships. Stops early when no pair reaches
    ``min_count``. Ties break (cnt desc, left, right) so the learned
    table is deterministic across partitionings and engines."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    spark = corpus.sparkSession
    seqs = char_seqs(corpus, text_col=text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(int(n_merges)):
        best = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((step, a, b, cnt))
        # rebinding drops the only reference to the previous round's
        # checkpoint — ContextCleaner reclaims its blocks (the
        # dup_groups discipline); at most two vocab-sized checkpoint
        # generations are live at once
        seqs = seqs.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "n"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "step int, left string, right string, cnt bigint"
    )


def bpe_segment_expr(
    text_col: str, merges: list[tuple[str, str]]
) -> "F.Column":
    """Apply a learned merge list to whitespace words of ``text_col``,
    returning the symbol array per document — the tokenize side of the
    trainer, as a pure row-local expression chain (streaming-legal):
    chars -> each merge folded in learned order."""
    words = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    def seg(word):
        syms = F.split(word, "")
        for left, right in merges:
            syms = _apply_merge(syms, left, right)
        return syms
    return F.flatten(
        F.transform(F.filter(words, lambda w: w != ""), seg)
    )


# pinned merge list for the fertility report's hash gate (any learned
# table works; the gate needs a FIXED one so both engines replay the
# same tokenizer)
FERTILITY_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("a", "n"), ("e", "r"),
    ("o", "r"), ("s", "t"), ("a", "t"), ("i", "n"),
]


def bpe_fertility(
    docs: "DataFrame",
    merges: list[tuple[str, str]] | None = None,
    strata_col: str = "source",
    text_col: str = "text",
) -> "DataFrame":
    """Tokenizer fertility report per stratum: words, BPE tokens,
    tokens-per-word (fertility — THE number that prices a source's
    training cost under a given tokenizer; high-fertility languages
    cost more tokens per sentence) and mean token length in chars.

    Scale shape: segmentation runs once per DISTINCT word (the
    vocabulary table — bounded by |vocab|, not |corpus|), then joins
    back to the word instances; the greedy merge fold never touches
    corpus-sized data. The DuckDB oracle replays the SAME greedy fold
    with a recursive CTE over the same distinct-word table — two
    independent implementations of reference BPE semantics must agree
    (runs like 'aaaa' -> [aa, aa] are the divergence-prone case; the
    regex-replace replay was tried and REJECTED for exactly that).

    Columns: ``(source, n_words, n_tokens, fertility,
    avg_token_chars)``.
    """
    if merges is None:
        merges = FERTILITY_MERGES
    words = docs.select(
        F.col(strata_col).alias("source"),
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                lambda w: w != "",
            )
        ).alias("w"),
    )
    wc = words.groupBy("source", "w").agg(F.count("*").alias("n"))
    seg = F.split(F.col("w"), "")
    for left, right in merges:
        seg = _apply_merge(seg, left, right)
    vocab = (
        wc.select("w")
        .distinct()
        .select(
            "w",
            F.size(seg).cast("bigint").alias("n_sym"),
            F.length("w").cast("bigint").alias("n_chr"),
        )
    )
    per = (
        wc.join(F.broadcast(vocab), "w")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_sym")).alias("n_tokens"),
            F.sum(F.col("n") * F.col("n_chr")).alias("_chars"),
        )
    )
    return per.select(
        "source",
        "n_words",
        "n_tokens",
        F.when(F.col("n_words") > 0,
               F.round(F.col("n_tokens") / F.col("n_words").cast("double"), 6))
        .otherwise(F.lit(0.0)).alias("fertility"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("_chars") / F.col("n_tokens").cast("double"), 6))
        .otherwise(F.lit(0.0)).alias("avg_token_chars"),
    )


def bpe_encode(
    docs: "DataFrame",
    merges: list[tuple[str, str]] | None = None,
    id_col: str = "id",
    text_col: str = "text",
) -> "DataFrame":
    """Tokenize the corpus under a learned merge list — the encode
    step a training pipeline runs after ``bpe_train``: every document
    becomes its token stream with STABLE integer ids (token_id =
    rank of the symbol string in the sorted symbol vocabulary), ready
    for ``pack_sequences``.

    Output: one row per emitted token, ``(id, pos, token, token_id)``
    with ``pos`` the 0-based position in the document's stream. The
    per-doc array form is one ``collect_list`` away; the flat form is
    what downstream packing/statistics consume and what the DuckDB
    oracle hash-gates.

    Scale shape — same discipline as ``bpe_fertility``: the greedy
    merge fold runs once per DISTINCT word (|vocab|-sized, broadcast
    back to the word instances — corpus text never enters the fold),
    and positions come from ONE id-keyed groupBy that reassembles the
    per-word symbol arrays in word order and posexplodes the
    flattened stream — measured 3x faster than numbering the exploded
    token table with a per-doc window (the window sorted |tokens|
    rows; the groupBy moves per-word ARRAYS and explodes after).
    Token-id assignment is one |symbol-vocab|-sized rank table
    (single-partition window on a bounded input, broadcast to the
    stream). Per-doc streams materialize as one array row each — the
    same document-fits-in-memory assumption as the chunking/packing
    family. NULL/empty text yields no rows.
    """
    from pyspark.sql import Window

    if merges is None:
        merges = FERTILITY_MERGES
    words_pos = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("wpos", "w"),
    ).filter(F.col("w") != "")
    seg = F.split(F.col("w"), "")
    for left, right in merges:
        seg = _apply_merge(seg, left, right)
    vocab = words_pos.select("w").distinct().select("w", seg.alias("syms"))
    # array_sort on (wpos, syms) structs orders by wpos (unique per
    # doc), so the flattened stream is the document's token sequence
    per_doc = (
        words_pos.join(F.broadcast(vocab), "w")
        .groupBy("id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("wpos", "syms"))
                ).getField("syms")
            ).alias("stream")
        )
    )
    toks = per_doc.select(
        "id", F.posexplode("stream").alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("bigint"))
    # symbol vocabulary is bounded (chars + one entry per merge), so
    # the global-order window is a one-small-table step; ranked from
    # the token stream, whose per_doc exchange AQE REUSES between this
    # branch and the output branch (ranking from the word-vocab side
    # was tried and measured slower — it re-evaluates the segmentation
    # branch and adds two exchanges)
    symtab = (
        toks.select("token")
        .distinct()
        .select(
            "token",
            (
                F.row_number().over(Window.orderBy("token")) - 1
            ).cast("bigint").alias("token_id"),
        )
    )
    return toks.join(F.broadcast(symtab), "token").select(
        "id", "pos", "token", "token_id"
    )
