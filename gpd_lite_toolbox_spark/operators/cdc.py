"""Change-data-capture snapshot maintenance: latest-wins upsert/delete
merge, the incremental-refresh primitive a continuously-ingested
training corpus needs (nightly crawl deltas folded into the canonical
snapshot without rewriting it from scratch).

Spark-first shape: the merge is ONE hash aggregate keyed by the row
key — `max_by(struct(payload), version)` picks the winning change with
full map-side partial aggregation (each partition reduces its local
rows to one candidate per key before the exchange), so the shuffle
carries at most |distinct keys| rows per partition regardless of how
many changes pile onto a hot key. No join, no window sort, no second
exchange. At 100 TB the plan is scan -> partial agg -> exchange ->
final agg -> filter, the same shape a MERGE INTO compiles to on
engines that have one natively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_VERSION = -1  # base-snapshot rows lose to any change (version >= 0)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str = "id",
    version_col: str = "version",
    op_col: str = "op",
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Fold a change feed into a base snapshot, latest version wins.

    ``base`` holds the current snapshot: the key column plus payload
    columns (no version/op). ``changes`` holds the delta feed: the same
    key + payload columns plus ``version_col`` (BIGINT-castable,
    >= 0, and UNIQUE per key — ties between equal versions on one key
    are contractually undefined, as in any CDC log without a
    tiebreaker) and ``op_col`` ('U'-style upserts carrying a payload,
    or one of ``delete_ops`` marking the key as removed; a delete row's
    payload is ignored, and a NULL op reads as an upsert so a malformed
    feed never silently deletes). Returns the merged snapshot with the
    base schema: key + payload, deleted keys absent.

    Base rows participate as version ``BASE_VERSION`` (-1) upserts, so
    any change outranks the snapshot and keys never seen in the feed
    pass through untouched.
    """
    payload = [c for c in base.columns if c != key]
    missing = [c for c in payload + [key, version_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    tagged_base = base.select(
        F.col(key),
        F.lit(BASE_VERSION).cast("bigint").alias(version_col),
        F.lit("U").alias(op_col),
        *[F.col(c) for c in payload],
    )
    return latest_wins(
        tagged_base.unionByName(
            changes.select(key, version_col, op_col, *payload)
        ),
        key, version_col, op_col, payload, delete_ops,
    )


def latest_wins(
    feed: DataFrame,
    key: str,
    version_col: str,
    op_col: str,
    payload_cols: Sequence[str],
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """The latest-wins merge core shared by the batch operator above
    and the streaming twin (streaming/grid_stream.run_streaming_cdc):
    one ``max_by(struct(op, payload), version)`` hash aggregate over a
    unified feed, delete filter on the winner, payload re-projection.
    A single definition so the two entry points — and their shared
    CDC_SNAPSHOT oracle — can never diverge on merge semantics."""
    # struct() is never NULL, so max_by cannot skip a winning row whose
    # payload happens to be NULL (max_by(NULL-value, k) semantics)
    winner = feed.groupBy(key).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("_op"),
                     *[F.col(c) for c in payload_cols]),
            F.col(version_col).cast("bigint"),
        ).alias("_w")
    )
    # NULL-safe: a malformed feed row with op NULL must read as an
    # upsert, never as a silent delete (NULL.isin(...) is NULL, and a
    # bare ~NULL filter would drop the key)
    kept = winner.filter(
        ~F.coalesce(F.col("_w._op").isin(*delete_ops), F.lit(False))
    )
    return kept.select(
        F.col(key), *[F.col(f"_w.{c}").alias(c) for c in payload_cols]
    )
