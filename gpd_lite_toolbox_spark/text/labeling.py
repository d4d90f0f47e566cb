"""Weak-supervision labeling over a text corpus.

The reference (mthh/gpd_lite_toolbox) has no text surface; this module
comes from the builder's LLM-training-data brief: curation pipelines
rarely have gold keep/drop labels — they combine several noisy rule
votes (labeling functions) and track how those rules cover, overlap,
and conflict (the Snorkel-style diagnostic) before trusting a majority
label.

Engine design: every labeling function here is a native column
expression reusing the audited rule substrate (quality points, the
Gopher conjunction, the marker-based language id), so the vote table is
one zero-shuffle projection and the diagnostic one combinable
aggregate. No Python, no state, no exchange until the 3-row rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import (
    LANG_MARKERS,
    _occurrences,
    gopher_passes_cond,
    gopher_stat_exprs,
    quality_points_expr,
)

RULES = ("quality", "gopher", "lang")


def _vote_columns(text_col: str) -> dict[str, Column]:
    """The three labeling functions as +1 / -1 / 0 (abstain) columns.

    - ``quality``: +1 at full quality points, -1 at <= 1, abstains at 2
      (the ambiguous middle band).
    - ``gopher``: the published conjunction, never abstains.
    - ``lang``: +1 when the marker argmax is the pipeline language
      ('en', ties resolved by marker priority exactly as
      ``analysis.lang_id``), abstains when no marker fires.
    """
    pts = quality_points_expr(text_col)
    v_quality = (
        F.when(pts >= 3, 1).when(pts <= 1, -1).otherwise(0).cast("int")
    )
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    counts = [(lang, _occurrences(padded, m)) for lang, m in LANG_MARKERS]
    best = counts[0][1]
    for _lang, c in counts[1:]:
        best = F.greatest(best, c)
    c_en = counts[0][1]  # 'en' is the first (priority) marker
    v_lang = (
        F.when(best == 0, 0)
        .when(c_en == best, 1)
        .otherwise(-1)
        .cast("int")
    )
    return {"quality": v_quality, "lang": v_lang}


def weak_labels(
    corpus: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Per-document rule votes and majority label.

    Columns: ``(id, v_quality, v_gopher, v_lang, label)`` with votes in
    {-1, 0, +1} and ``label`` the sign of their sum ('keep' / 'drop' /
    'abstain').
    """
    votes = _vote_columns(text_col)
    stats = corpus.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias(text_col),
        *[c.alias(n) for n, c in gopher_stat_exprs(text_col)],
    )
    v_gopher = (
        F.when(gopher_passes_cond(), 1).otherwise(-1).cast("int")
    )
    out = stats.select(
        "id",
        votes["quality"].alias("v_quality"),
        v_gopher.alias("v_gopher"),
        votes["lang"].alias("v_lang"),
    )
    s = F.col("v_quality") + F.col("v_gopher") + F.col("v_lang")
    return out.withColumn(
        "label",
        F.when(s > 0, "keep").when(s < 0, "drop").otherwise("abstain"),
    )


def lf_diagnostics(
    corpus: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """Per-rule labeling-function diagnostic (the Snorkel report):
    ``coverage`` (fraction of docs the rule votes on), ``overlap``
    (fraction where it votes AND some other rule also votes),
    ``conflict`` (fraction where it votes and some other rule votes the
    OPPOSITE sign). 3 rows, values rounded to 6dp.

    One projection + one combinable aggregate — the fractions are exact
    integer sums over the corpus divided once at the end, so the rollup
    is order-independent and cross-engine exact.
    """
    v = weak_labels(corpus, id_col, text_col)
    aggs = [F.count("*").alias("_n")]
    for r in RULES:
        me = F.col(f"v_{r}")
        others = [F.col(f"v_{o}") for o in RULES if o != r]
        voted = me != 0
        any_other = (others[0] != 0) | (others[1] != 0)
        conf = (me * others[0] < 0) | (me * others[1] < 0)
        aggs += [
            F.sum(voted.cast("bigint")).alias(f"_c_{r}"),
            F.sum((voted & any_other).cast("bigint")).alias(f"_o_{r}"),
            F.sum((voted & conf).cast("bigint")).alias(f"_x_{r}"),
        ]
    # ONE combinable aggregate carries all nine counters; the 3-row
    # report is a row-local explode of that single row
    entries = F.array(
        *[
            F.struct(
                F.lit(r).alias("rule"),
                F.round(F.col(f"_c_{r}") / F.col("_n").cast("double"), 6)
                .alias("coverage"),
                F.round(F.col(f"_o_{r}") / F.col("_n").cast("double"), 6)
                .alias("overlap"),
                F.round(F.col(f"_x_{r}") / F.col("_n").cast("double"), 6)
                .alias("conflict"),
            )
            for r in RULES
        ]
    )
    return (
        v.agg(*aggs)
        .select(F.explode(entries).alias("_e"))
        .select("_e.rule", "_e.coverage", "_e.overlap", "_e.conflict")
    )
