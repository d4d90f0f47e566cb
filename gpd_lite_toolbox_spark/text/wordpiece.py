"""WordPiece tokenizer (greedy longest-match-first) — the third leg of
the tokenizer family next to ``text/bpe.py`` (learned merges applied
greedily) and ``text/unigram.py`` (piece inventory applied OPTIMALLY):
WordPiece applies a piece inventory GREEDILY, always taking the longest
vocabulary piece at the current position, with the ``##`` continuation
convention for non-initial pieces and whole-word ``[UNK]`` fallback —
the BERT tokenizer's segmentation rule (public spec: Schuster &
Nakajima 2012; Devlin et al. 2018's WordPiece vocabulary format).

Semantics per word: scan left to right; at each position take the
LONGEST piece (length <= ``MAX_PIECE_LEN``) present in the vocabulary —
spelled bare at word start, ``##``-prefixed after — and advance by its
length; if NO piece matches at some position the WHOLE word becomes the
single ``[UNK]`` token (BERT's rule: unknown-ness is a word property,
not a character property).  Pure string membership — no costs, no
floats — so the segmentation is trivially bit-exact across engines.

Execution shape (the ``bpe_encode`` / ``unigram_encode`` discipline):
the greedy fold runs once per DISTINCT word — a row-local
``F.aggregate`` over character positions with pass-through once the
word is consumed — then broadcast-joins back to the corpus word stream.
The fold never touches corpus-sized data; at 100 TB the segmented table
is bounded by |vocabulary|, the corpus-sized side is one
partial-combined count aggregate.

Reference scope: the reference engine (mthh/gpd_lite_toolbox) has no
tokenizer surface; this module is part of the training-data-pipeline
extension (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .unigram import _spark_str_lit

UNK_TOKEN = "[UNK]"
MAX_PIECE_LEN = 4

# Pinned vocabulary (not learned) for the same reason as
# bpe.FERTILITY_MERGES / unigram.UNIGRAM_PIECES: the hash gate needs
# both engines to replay the SAME tokenizer.  Initial pieces are bare,
# continuation pieces carry the ## prefix; singles cover a-z so most
# alphabetic words segment, while digits/punctuation are deliberately
# absent — words containing them exercise the whole-word [UNK] rule.
_CHARS = "abcdefghijklmnopqrstuvwxyz"
_MULTI = [
    "st", "in", "er", "at", "or", "ta", "an", "ar", "ue", "me",
    "ow", "al", "le", "ry", "da", "qu", "gr", "ha", "ex", "ve",
    "ro", "co", "wi", "ke",
    "ort", "ter", "mer", "ine", "que", "ord", "art", "ext", "lin",
    "eam", "low", "ind", "ash", "val", "rea", "oin", "ust",
    "part", "sort", "line", "atch", "park", "rder", "ream", "uery",
    "erge", "wind", "alue", "lumn", "roup", "mall", "cust", "tome",
]
WORDPIECE_VOCAB: list[str] = (
    list(_CHARS)
    + ["##" + c for c in _CHARS]
    + _MULTI
    + ["##" + p for p in _MULTI]
)


def wordpiece_word_py(
    word: str,
    vocab: "list[str] | None" = None,
    max_len: int = MAX_PIECE_LEN,
) -> list[str]:
    """Pure-Python reference segmentation — the independent third
    implementation the unit tests pin both engines against."""
    vs = set(vocab if vocab is not None else WORDPIECE_VOCAB)
    n = len(word)
    j, out = 0, []
    while j < n:
        best = None
        for l in range(min(max_len, n - j), 0, -1):
            piece = ("##" if j > 0 else "") + word[j : j + l]
            if piece in vs:
                best = piece
                break
        if best is None:
            return [UNK_TOKEN]
        out.append(best)
        j += len(best) - (2 if best.startswith("##") else 0)
    return out


def _wp_segment_sql(
    word: str,
    vocab: "list[str] | None",
    max_len: int,
) -> str:
    """Greedy longest-match segmentation of the string column named
    ``word`` as ONE Catalyst expression: fold over character positions
    with state ``struct(j, ps, unk)`` — ``j`` the next unconsumed
    1-based position, pass-through once consumed; an unmatched
    position collapses the word to ``[UNK]`` (j jumps past the end).
    Vocabulary membership is a map literal probed with
    ``try_element_at``; piece strings escape through the shared
    ``_spark_str_lit`` (ADVICE r7)."""
    vs = vocab if vocab is not None else WORDPIECE_VOCAB
    mp = "map(" + ", ".join(
        f"{_spark_str_lit(p)}, 1" for p in vs
    ) + ")"
    piece = (
        f"CASE WHEN s.j = 1 THEN substr({word}, s.j, l)"
        f" ELSE '##' || substr({word}, s.j, l) END"
    )
    # best matching length at position s.j (NULL if none); inlined at
    # each reference — no let-binding exists in Spark SQL expressions,
    # and the fold is vocab-bounded so the re-evaluation is cheap
    best = f"""array_max(filter(
      transform(sequence(1, {int(max_len)}), l ->
        CASE WHEN l <= length({word}) - s.j + 1
               AND try_element_at({mp}, {piece}) IS NOT NULL
             THEN l END),
      x -> x IS NOT NULL))"""
    hit = (
        f"CASE WHEN s.j = 1 THEN substr({word}, s.j, {best})"
        f" ELSE '##' || substr({word}, s.j, {best}) END"
    )
    step = f"""CASE
      WHEN s.unk OR s.j > length({word}) THEN s
      WHEN {best} IS NULL THEN named_struct(
        'j', CAST(length({word}) + 1 AS INT),
        'ps', array('{UNK_TOKEN}'), 'unk', true)
      ELSE named_struct(
        'j', CAST(s.j + {best} AS INT),
        'ps', concat(s.ps, array({hit})), 'unk', false)
      END"""
    return f"""aggregate(
      sequence(1, length({word})),
      named_struct('j', 1, 'ps', CAST(array() AS array<string>),
                   'unk', false),
      (s, _u) -> {step}).ps"""


def wordpiece_encode(
    docs: DataFrame,
    vocab: "list[str] | None" = None,
    id_col: str = "id",
    text_col: str = "text",
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Tokenize the corpus under the WordPiece model — greedy
    longest-match segmentation per word with ``##`` continuations and
    whole-word ``[UNK]``.  Output: one row per emitted piece,
    ``(id, pos, token, token_id)`` — the exact ``bpe_encode`` /
    ``unigram_encode`` contract, so downstream packing / fertility
    consumers are interchangeable.

    Scale shape (the ``bpe_encode`` discipline): the greedy fold runs
    once per DISTINCT word (|vocab|-bounded, broadcast back),
    positions come from ONE id-keyed groupBy reassembling per-word
    piece arrays in word order, and token ids are a bounded
    single-partition rank window broadcast to the stream.
    """
    from pyspark.sql import Window

    words_pos = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("wpos", "w"),
    ).filter(F.col("w") != "")
    seg = F.expr(_wp_segment_sql("w", vocab, max_len))
    dw = words_pos.select("w").distinct().select("w", seg.alias("syms"))
    per_doc = (
        words_pos.join(F.broadcast(dw), "w")
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


def wordpiece_fertility(
    docs: DataFrame,
    vocab: "list[str] | None" = None,
    strata_col: str = "source",
    text_col: str = "text",
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """WordPiece fertility report per stratum: words, greedy piece
    count, fertility, and the UNK rate — the coverage metric a
    vocabulary review watches (a rising unk_rate means the vocabulary
    no longer covers the corpus script/domain).

    Columns: ``(source, n_words, n_pieces, fertility, unk_rate)``.
    Same two-exchange shape as ``bpe_fertility``: the fold runs on the
    DISTINCT word table, broadcast-joins to per-(stratum, word)
    counts, then ONE partial-combined aggregate per stratum.
    """
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
    seg = F.expr(_wp_segment_sql("w", vocab, max_len))
    # generator barrier (the unigram _vocab_dp lesson): extracting two
    # values from the raw fold column would duplicate the whole
    # expression via CollapseProject — explode the 1-element array so
    # both extractions reference the single Generate output
    dw = (
        wc.select("w")
        .distinct()
        .select("w", F.explode(F.array(seg)).alias("_ps"))
        .select(
            "w",
            F.size("_ps").cast("bigint").alias("_np"),
            (F.element_at("_ps", 1) == UNK_TOKEN).alias("_unk"),
        )
    )
    per = (
        wc.join(F.broadcast(dw), "w")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("_np")).alias("n_pieces"),
            F.sum(
                F.when(F.col("_unk"), F.col("n")).otherwise(F.lit(0))
            ).alias("_unks"),
        )
    )
    return per.select(
        "source",
        "n_words",
        "n_pieces",
        F.when(
            F.col("n_words") > 0,
            F.round(
                F.col("n_pieces") / F.col("n_words").cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("fertility"),
        F.when(
            F.col("n_words") > 0,
            F.round(
                F.col("_unks") / F.col("n_words").cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("unk_rate"),
    )


def wp_char_seqs(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """``(syms, n)`` — word vocabulary split into WordPiece seed
    symbols: the first character bare, every later character
    ##-prefixed (the BERT continuation convention), weighted by word
    frequency. One combinable exchange (``word_vocab``)."""
    from .bpe import word_vocab

    wv = word_vocab(corpus, text_col)
    syms = F.expr(
        "transform(sequence(1, length(w)), j -> CASE WHEN j = 1"
        " THEN substr(w, 1, 1)"
        " ELSE '##' || substr(w, CAST(j AS INT), 1) END)"
    )
    return wv.select(syms.alias("syms"), "n")


def _merge_spelling(left: str, right: str) -> str:
    """The merged symbol's spelling: the right side drops its ##
    (continuation-ness is carried by the left side's prefix)."""
    return left + (right[2:] if right.startswith("##") else right)


def _apply_wp_merge(
    syms_col: "F.Column", left: str, right: str
) -> "F.Column":
    """Greedy left-to-right merge of adjacent (left, right) — the
    ``bpe._apply_merge`` fold with the WordPiece spelling rule."""
    merged = _merge_spelling(left, right)
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


# the deterministic double expression BOTH engines evaluate for the
# merge score — IEEE * and / are correctly rounded, so identical
# integer inputs give bit-identical doubles on the JVM and in DuckDB
WP_SCORE_SQL = (
    "1000000.0 * CAST(cnt AS DOUBLE)"
    " / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))"
)


def wordpiece_train(
    corpus: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges from the corpus — the
    LIKELIHOOD-scored variant of BPE training (the published WordPiece
    rule: merge the pair maximizing ``count(ab) / (count(a) *
    count(b))``, the unigram-LM likelihood gain, where BPE maximizes
    raw ``count(ab)``).  Returns ``(step, left, right, cnt,
    score_e6)`` in learned order; stops early when no pair reaches
    ``min_count``.

    Determinism/gate: counts are exact integers; the score is ONE
    fixed double expression (``WP_SCORE_SQL``) whose * and / are
    IEEE-correctly-rounded, so Spark and DuckDB order candidates
    identically; ties break (left, right) on binary collation.  The
    emitted ``score_e6`` goes through ROUND(...,6) inside the engine
    (never Python's banker-rounding ``round``).

    Scale shape: the ``bpe_train`` discipline — the corpus collapses
    to the word vocabulary once; each step is two combinable aggregates
    (pair counts + symbol counts) joined on the bounded symbol table,
    a 1-row argmax collect (the winning pair must become a literal in
    the next rewrite plan), and a row-local merge fold with
    ``localCheckpoint`` lineage truncation.
    """
    from .bpe import _pair_counts

    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    spark = corpus.sparkSession
    seqs = wp_char_seqs(corpus, text_col=text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int, float]] = []
    for step in range(int(n_merges)):
        sc = (
            seqs.select(F.explode("syms").alias("s"), "n")
            .groupBy("s")
            .agg(F.sum("n").alias("scnt"))
        )
        scored = (
            _pair_counts(seqs)
            .filter(F.col("cnt") >= int(min_count))
            .join(
                sc.select(F.col("s").alias("a"), F.col("scnt").alias("ca")),
                "a",
            )
            .join(
                sc.select(F.col("s").alias("b"), F.col("scnt").alias("cb")),
                "b",
            )
        )
        best = (
            scored.orderBy(
                F.expr(WP_SCORE_SQL).desc(), F.col("a"), F.col("b")
            )
            .limit(1)
            .select(
                "a", "b", "cnt",
                F.expr(f"round({WP_SCORE_SQL}, 6)").alias("score_e6"),
            )
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append(
            (step, a, b, int(best[0]["cnt"]), float(best[0]["score_e6"]))
        )
        seqs = seqs.select(
            _apply_wp_merge(F.col("syms"), a, b).alias("syms"), "n"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, cnt bigint,"
        " score_e6 double",
    )


def wordpiece_vocab_learned(
    corpus: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_count: int = 2,
) -> list[str]:
    """Train-and-assemble a usable WordPiece vocabulary: the seed
    symbols (every word-initial character bare, every character as a
    ## continuation) plus each learned merge's exact spelling (the
    trainer's ``m`` column already carries prefix status — a bare left
    side yields a bare merged symbol, a ## left side a ## one).  The
    result feeds ``wordpiece_encode(vocab=..., max_len=...)`` /
    ``wordpiece_fertility`` directly after this bounded driver collect
    (the ``bpe_train`` artifact pattern); pass ``max_len`` >= the
    longest merged CONTENT so the greedy matcher can reach it."""
    from .bpe import word_vocab

    wv = word_vocab(corpus, text_col)
    chars = wv.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w)), j -> CASE WHEN j = 1"
                " THEN substr(w, 1, 1)"
                " ELSE '##' || substr(w, CAST(j AS INT), 1) END)"
            )
        ).alias("s")
    ).distinct()
    merges = wordpiece_train(
        corpus, n_merges=n_merges, text_col=text_col, min_count=min_count
    ).collect()
    learned = []
    for r in merges:
        learned.append(_merge_spelling(r.left, r.right))
    return sorted(
        {r.s for r in chars.collect()} | set(learned)
    )
