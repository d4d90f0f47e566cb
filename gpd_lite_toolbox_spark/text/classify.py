"""Multinomial Naive Bayes document classification — the linear
bag-of-words classifier family (the published pipeline practice:
fastText-style quality / language / domain classifiers gate what
enters a training corpus). Training is ONE counting pass and scoring
one token join — both plain relational algebra over native functions,
so the whole train+score cycle is cross-engine checkable and scales
as ordinary keyed shuffles. No MLlib dependency, no UDFs.

Numerics: log-probabilities are ln of exact integer ratios
((count + 1) / (class_total + V), Laplace smoothing), summed per
document; scores are rounded to 6 decimals before the argmax and
ties break on the class name, so both engines select the identical
class even when two classes score within double-precision drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist


def _tokens(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str | None = None,
) -> DataFrame:
    """Whitespace tokens, the engine's corpus convention (same split
    as unigram_logprob / token_stats). NULL text coalesces to the
    empty string so a null-text document still receives a prediction
    instead of silently vanishing from the output (the pipeline.py
    convention). ``label_col`` adds the training label column."""
    cols = [
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("tok"),
    ]
    if label_col is not None:
        cols.insert(0, F.col(label_col).alias("label"))
    return corpus.select(*cols)


def train_nb(
    labeled: DataFrame,
    label_col: str = "label",
    id_col: str = "id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Fit the classifier from a labeled corpus. Returns
    ``(model, classes)``:

    - ``model``: (label, tok, log_cond) — ln((n_tok_in_class + 1) /
      (class_total + V)) for every (class, token) SEEN in training;
    - ``classes``: (label, log_prior, log_default) — document-share
      prior and the unseen-token fallback ln(1 / (class_total + V)).

    Plan: one token explode feeding two partial-combined counting
    aggregates (per (class, token) and per class), a distinct-token
    vocabulary count, and broadcast-sized joins of the tiny per-class
    table. Everything downstream of the explode is counts — the
    model is exact integer arithmetic until the final ln.
    """
    toks = _tokens(labeled, id_col, text_col, label_col)
    # ONE corpus-scale pass: class totals and the vocabulary size both
    # derive from the (vocab-sized) per-(class, token) aggregate — the
    # module discipline unigram_logprob/build_vocab document, not a
    # re-tokenization per statistic.
    class_tok = tracked_persist(
        toks.groupBy("label", "tok").agg(F.count("*").alias("n_tok"))
    )
    class_tot = class_tok.groupBy("label").agg(
        F.sum("n_tok").alias("n_total")
    )
    vocab = class_tok.select(F.countDistinct("tok").alias("v"))
    docs_per_class = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    n_docs = labeled.select(F.count("*").alias("n_all"))
    classes = (
        class_tot.join(F.broadcast(vocab))
        .join(docs_per_class, "label")
        .join(F.broadcast(n_docs))
        .select(
            "label",
            F.log(F.col("n_docs") / F.col("n_all")).alias("log_prior"),
            F.log(
                F.lit(1.0) / (F.col("n_total") + F.col("v"))
            ).alias("log_default"),
            "n_total",
            "v",
        )
        # class-count-sized; consumed by the model join AND every
        # scoring pass — caching it stops each consumer replaying the
        # four corpus-scale aggregates behind it
    )
    classes = tracked_persist(classes)
    model = (
        class_tok.join(
            classes.select("label", "n_total", "v"), "label"
        )
        .select(
            "label",
            "tok",
            F.log(
                (F.col("n_tok") + 1) / (F.col("n_total") + F.col("v"))
            ).alias("log_cond"),
        )
    )
    return model, classes.select("label", "log_prior", "log_default")


def score_nb(
    corpus: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Classify documents: (id, label, score) with exactly one row per
    document — the argmax class, score rounded to 6 decimals, ties
    broken by class name.

    Plan: tokens cross-join the (tiny, broadcast) class table so every
    token scores under every class, left-join the model for the seen
    log-probs with the class's unseen fallback otherwise, then one
    partial-combined sum per (doc, class) and a per-doc top-1 window
    (WindowGroupLimit heaps). The per-token work is |tokens| x
    |classes| — the class count is a small constant, so the scoring
    pass stays linear in the corpus.
    """
    toks = _tokens(corpus, id_col, text_col)
    # ONE broadcast of the class table carrying BOTH per-class
    # constants: log_prior is constant within the (id, label) group,
    # so max() re-surfaces it through the aggregate — a second join
    # would replay the classes lineage (four corpus-scale aggregates)
    # per consumption.
    scored = (
        toks.join(F.broadcast(classes))
        .join(model, ["label", "tok"], "left")
        .select(
            "id",
            "label",
            F.coalesce("log_cond", "log_default").alias("lp"),
            "log_prior",
        )
        .groupBy("id", "label")
        .agg(
            F.round(
                F.sum("lp") + F.max("log_prior"), 6
            ).alias("score")
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "label", "score")
    )


def nb_confusion(
    labeled: DataFrame,
    label_col: str = "label",
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Train-on-self confusion matrix: fit on the labeled corpus,
    score the same corpus, and count (actual, predicted) cells — the
    standard sanity report a classifier gate ships with. Output:
    (actual, predicted, n_docs)."""
    model, classes = train_nb(labeled, label_col, id_col, text_col)
    pred = score_nb(labeled, model, classes, id_col, text_col)
    return (
        labeled.select(
            F.col(id_col).alias("id"), F.col(label_col).alias("actual")
        )
        .join(pred.select("id", F.col("label").alias("predicted")), "id")
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


def hash_features(
    corpus: DataFrame,
    n_features: int = 64,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick featurization (the HashingTF / Vowpal-Wabbit
    scheme): every token maps to ``md5-hash mod n_features`` and the
    per-(doc, bucket) counts are the feature values — the fixed-width,
    vocabulary-free representation that feeds linear quality
    classifiers at corpus scale (no fit pass, no vocab broadcast, new
    tokens never resize the space).

    Long-form output ``(id, bucket, n)`` — only occupied buckets
    emit a row, so the frame stays sparse regardless of
    ``n_features``; densify downstream with a row-local
    ``map_from_entries``/``transform`` when a fixed array is needed.

    Scale shape: one token explode + ONE combinable (id, bucket)
    aggregate; hash bucketing is a native md5 expression (the same
    cross-engine ``conv(substr(md5))`` identity the dedup family
    uses), so the whole operator is JVM-side."""
    if n_features <= 0:
        raise ValueError("n_features must be positive")
    toks = _tokens(corpus, id_col, text_col)
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(int(n_features))
    ).cast("int")
    return (
        toks.select("id", bucket.alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("n"))
    )
