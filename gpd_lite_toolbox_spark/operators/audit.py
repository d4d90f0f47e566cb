"""Data-quality audit operators: declarative constraint checking.

The pipeline-maintenance shape every 100 TB ingest needs (an
"expectations" pass): count violations of row-level predicates,
referential integrity, and key uniqueness — each as ONE
partial-aggregated pass, unioned into a tiny (rule, n_violations)
report. Extension beyond the reference (BASELINE.json north star:
pipeline operators around the core engine).

Scale notes: row predicates fuse into a single scan+aggregate (no
shuffle beyond the 1-row reduces); FK checks are a broadcast or
shuffled left-anti join keyed on the FK; uniqueness is one combinable
count-distinct-vs-count aggregate, never a self-join.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def predicate_violations(
    df: DataFrame, checks: Mapping[str, Column]
) -> DataFrame:
    """(rule, n_violations) for named row-level predicates. Predicate
    TRUE (null-safe: null counts as a violation unless the predicate
    says otherwise) means the row VIOLATES the rule. All rules ride
    one scan + one single-row aggregate."""
    aggs = [
        F.coalesce(  # sum over ZERO rows is null; an empty table has 0
            F.sum(F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)),
            F.lit(0),
        ).alias(name)
        for name, pred in checks.items()
    ]
    row = df.agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(name).cast("long").alias("n_violations"),
                )
                for name in checks
            ]
        )
    ).alias("_p")
    return row.select(pairs).select("_p.rule", "_p.n_violations")


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule: str,
) -> DataFrame:
    """(rule, n_violations): child rows whose non-null FK has no match
    in the parent — a left-anti join (broadcast when the parent key
    set is small, shuffled otherwise; AQE decides)."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count("*").alias("n_violations"))
    )
    return orphans.select(
        F.lit(rule).alias("rule"), F.col("n_violations").cast("long")
    )


def uniqueness_violations(
    df: DataFrame, cols: list[str], rule: str
) -> DataFrame:
    """(rule, n_violations): rows in excess of one per key — computed
    as count(*) - count(distinct key), one combinable aggregate (no
    self-join)."""
    dup = df.agg(
        (F.count("*") - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("long")
        .alias("n_violations")
    )
    return dup.select(F.lit(rule).alias("rule"), "n_violations")


def _union_all(parts: list[DataFrame], what: str) -> DataFrame:
    if not parts:
        raise ValueError(f"{what} must be non-empty")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union the audit parts into one (rule, n_violations) report."""
    return _union_all(parts, "parts")


def approx_distinct_report(
    df: DataFrame,
    cols: list[str],
    rsd: float = 0.02,
    rel_err: float = 0.05,
) -> DataFrame:
    """Sketch-vs-exact cardinality audit: for each column, the exact
    distinct count next to whether the HyperLogLog++ estimate
    (``approx_count_distinct`` at relative standard deviation ``rsd``)
    lands within ``rel_err`` of it. Returns
    ``(col_name, exact_distinct, within_bound)`` — one row per column.

    This is the calibration pass run once at onboarding to justify
    replacing exact count-distincts with the sketch everywhere else:
    at 100 TB the exact side is the expensive one, while the HLL side
    is a tiny mergeable sketch with full map-side partial aggregation.
    Production monitoring keeps only the sketch; the estimate itself
    is deliberately NOT in the output contract (it is engine-specific
    — only the exact value and the pass/fail verdict are portable).

    Plan shape: one single-column aggregate PER column, unioned —
    each branch is a column-pruned scan + the two-phase distinct
    rewrite + a partial-combined HLL. Fusing all columns into one agg
    instead plans an Expand that replicates every scan row per column
    AND blocks partial aggregation of the distinct side — measured
    3.5x slower at sf0.1 (6.1 s vs 1.7 s); N pruned scans beat one
    (N+1)x-expanded scan for any small audited-column set.

    Default ``rsd=0.02`` (4096 HLL registers) is calibrated ~6x inside
    the 5% verdict bound: measured worst-case error on the events
    table is 0.8% across sf0.001-0.1, while rsd=0.05 (the Spark
    default) measured up to 4.3% — too close to gate on.
    """
    parts = []
    for c in cols:
        row = df.select(F.col(c)).agg(
            F.count_distinct(F.col(c)).cast("long").alias("_e"),
            F.approx_count_distinct(c, rsd).alias("_a"),
        )
        parts.append(
            row.select(
                F.lit(c).alias("col_name"),
                F.col("_e").alias("exact_distinct"),
                (
                    F.abs(F.col("_a") - F.col("_e"))
                    <= F.lit(float(rel_err))
                    * F.greatest(F.col("_e"), F.lit(1)).cast("double")
                ).alias("within_bound"),
            )
        )
    return _union_all(parts, "cols")


def approx_percentile_report(
    df: DataFrame,
    col: str,
    quantiles: "list[float]" = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    rank_tol: float = 0.005,
) -> DataFrame:
    """Quantile-sketch calibration: the percentile sibling of
    ``approx_distinct_report``. For each requested quantile, the EXACT
    linear-interpolation percentile next to whether
    ``percentile_approx`` (Greenwald-Khanna at ``accuracy``) returned
    a value whose RANK interval contains a point within ``rank_tol``
    of the target — the sketch's actual guarantee (±1/accuracy in
    rank), gated with margin. Returns
    ``(quantile, exact_value, within_bound)``.

    Two passes, both single-row reduces: (1) exact + approx arrays in
    one aggregate; (2) the approx values' rank brackets
    (count < v, count <= v) via conditional sums against the
    broadcast-back result row. At 100 TB pass 1's exact percentile is
    the expensive full-sort term the calibration exists to retire —
    production keeps only the mergeable GK sketch.

    The gate: a returned value whose rank fractions span
    [n_less/n, n_lesseq/n] passes for target q when that interval
    intersects [q - rank_tol, q + rank_tol] — interval intersection,
    NOT the 1-based lower rank (which is off by 1/n and fails exact
    sketches on small inputs where ceil(q*n) - q*n > rank_tol*n).
    NULL values are ignored (both engines' percentile semantics); an
    all-NULL or empty input yields within_bound TRUE rows with NULL
    exact values (no evidence of sketch failure).
    """
    qs = [float(q) for q in quantiles]
    qarr = F.array(*[F.lit(q) for q in qs])
    # project the audited column to a reserved internal name: kills
    # both ambiguity with same-named user columns after the crossJoin
    # and any identifier-quoting concerns
    vals = df.select(F.col(col).alias("_apx_val"))
    first = vals.agg(
        F.percentile(F.col("_apx_val"), qarr).alias("_exact"),
        F.percentile_approx("_apx_val", qarr, F.lit(int(accuracy)))
        .alias("_approx"),
        F.count("_apx_val").alias("_n"),
    )
    second = vals.crossJoin(F.broadcast(first)).agg(
        F.first("_exact").alias("_exact"),
        F.first("_approx").alias("_approx"),
        F.first("_n").alias("_n"),
        *[
            x
            for i in range(len(qs))
            for x in (
                F.coalesce(
                    F.sum(
                        (F.col("_apx_val") < F.element_at("_approx", i + 1))
                        .cast("long")
                    ),
                    F.lit(0),
                ).alias(f"_lt{i}"),
                F.coalesce(
                    F.sum(
                        (F.col("_apx_val") <= F.element_at("_approx", i + 1))
                        .cast("long")
                    ),
                    F.lit(0),
                ).alias(f"_le{i}"),
            )
        ],
    )
    n = F.greatest(F.col("_n"), F.lit(1)).cast("double")
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(qs[i]).alias("quantile"),
                    F.round(F.element_at("_exact", i + 1), 6)
                    .alias("exact_value"),
                    (
                        (F.coalesce(F.col("_n"), F.lit(0)) == 0)
                        | (
                            (F.col(f"_lt{i}") / n
                             <= F.lit(qs[i] + rank_tol))
                            & (F.col(f"_le{i}") / n
                               >= F.lit(qs[i] - rank_tol))
                        )
                    ).alias("within_bound"),
                )
                for i in range(len(qs))
            ]
        )
    ).alias("_p")
    return second.select(rows).select(
        "_p.quantile", "_p.exact_value", "_p.within_bound"
    )


def json_field_stats(
    df: DataFrame,
    json_col: str,
    field: str,
    group_by: str,
    field_type: str = "bigint",
) -> DataFrame:
    """Semi-structured payload audit: parse a JSON string column with
    an explicit schema (``from_json`` — JVM-side Jackson, no Python)
    and report per-group coverage and value stats of one field:
    ``(group, n_rows, n_with_field, sum_value, min_value, max_value,
    avg_value)``.

    ``n_with_field`` counts rows where the field parsed to a non-NULL
    value — malformed JSON, a missing key, and a type-mismatched value
    (quoted "5", 5.0, true against a BIGINT schema) all count as
    absent under Spark's PERMISSIVE parse; SQL oracles mirror this
    with a ``json_valid`` + integer ``json_type`` guard before the
    cast.

    Scale shape: parse + extract happen in the scan projection; ONE
    partial-aggregated exchange keyed by the group column. The schema
    is explicit so Catalyst can prune the parse to the single field
    (JsonTuple-style) instead of materializing the full document.
    """
    parsed = F.from_json(F.col(json_col), f"{field} {field_type}")[field]
    x = df.select(F.col(group_by).alias("grp"), parsed.alias("_v"))
    return (
        x.groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("_v").alias("n_with_field"),
            F.sum("_v").alias("sum_value"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
            F.round(F.avg("_v"), 6).alias("avg_value"),
        )
        .withColumnRenamed("grp", group_by)
    )


_NUMERIC_KINDS = ("int", "bigint", "smallint", "tinyint", "double",
                  "float", "decimal")


def table_profile(df: DataFrame) -> DataFrame:
    """Generic one-pass column profile of ANY table: per column the
    null count, exact distinct count, and (for numeric columns) the
    min/max — the schema-drift / ingest-sanity report a pipeline logs
    for every new snapshot before trusting it.

    Columns: ``(column, n_rows, n_nulls, n_distinct, min_num,
    max_num)`` — ``min_num``/``max_num`` NULL for non-numeric columns
    (string/timestamp extrema are formatting-dependent across engines,
    so they are deliberately not part of the hashable contract).

    Scale shape: TWO aggregate passes crossJoined as one-row frames —
    the plain stats (count/nulls/extrema: one partial-combined pass)
    and the exact multi-column distincts (Spark's Expand rewrite:
    k columns -> k-fold map-side expansion). Mixing the two in ONE
    agg looks tidier but makes the Expand carry every plain-agg
    column through all k replicated row groups — measured 4.5 s
    combined vs 0.2 + 2.0 s split on an 11-column 600k-row snapshot
    (sf0.1 lineitem), so the split IS the single-pass discipline here.
    Swap in approx_count_distinct when profiling petabyte snapshots
    where 2% error is acceptable. The long form is a row-local explode
    of the joined one-row result.
    """
    cols = df.dtypes
    aggs = [F.count("*").cast("bigint").alias("_n")]
    for c, t in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_nn_{c}")
        )
        if any(t.startswith(k) for k in _NUMERIC_KINDS):
            aggs.append(
                F.round(F.min(F.col(c).cast("double")), 6).alias(f"_mn_{c}")
            )
            aggs.append(
                F.round(F.max(F.col(c).cast("double")), 6).alias(f"_mx_{c}")
            )
    dist = df.agg(
        *[
            F.countDistinct(c).cast("bigint").alias(f"_nd_{c}")
            for c, _ in cols
        ]
    )
    one = df.agg(*aggs).crossJoin(F.broadcast(dist))
    null_d = F.lit(None).cast("double")
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                (
                    F.col(f"_mn_{c}")
                    if any(t.startswith(k) for k in _NUMERIC_KINDS)
                    else null_d
                ).alias("min_num"),
                (
                    F.col(f"_mx_{c}")
                    if any(t.startswith(k) for k in _NUMERIC_KINDS)
                    else null_d
                ).alias("max_num"),
            )
            for c, t in cols
        ]
    )
    return one.select(F.explode(entries).alias("_e")).select("_e.*")


def profile_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot-to-snapshot statistical drift: ``table_profile`` of
    two versions of the same table joined per column — the ingest
    gate that catches "the new crawl dropped half the rows of one
    column" or "this column's cardinality exploded" BEFORE row-level
    diffing (``corpus_diff`` / CDC) is even worth running.

    Columns: ``(column, n_rows_old, n_rows_new, n_nulls_old,
    n_nulls_new, n_distinct_old, n_distinct_new, drifted)`` —
    ``drifted`` is true when null count or distinct count changed
    relative to the row-count change (exact-ratio test on integers:
    nulls/distincts that simply scale with rows are NOT drift).

    Scale shape: two ``table_profile`` passes (one aggregate each) and
    a |columns|-row join — nothing else.
    """
    po = table_profile(old).select(
        "column",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_nulls").alias("n_nulls_old"),
        F.col("n_distinct").alias("n_distinct_old"),
    )
    pn = table_profile(new).select(
        "column",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nulls").alias("n_nulls_new"),
        F.col("n_distinct").alias("n_distinct_new"),
    )
    j = po.join(pn, "column")
    # integer cross-multiplication, no float ratios: nulls_new *
    # rows_old == nulls_old * rows_new iff the null RATE is unchanged
    null_drift = (
        F.col("n_nulls_new") * F.col("n_rows_old")
        != F.col("n_nulls_old") * F.col("n_rows_new")
    )
    dist_drift = (
        F.col("n_distinct_new") * F.col("n_rows_old")
        != F.col("n_distinct_old") * F.col("n_rows_new")
    )
    return j.withColumn("drifted", null_drift | dist_drift)
