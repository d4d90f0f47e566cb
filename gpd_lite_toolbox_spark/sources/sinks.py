"""Sinks: partitioned geoparquet writes.

The engine's canonical sink is parquet with the WKB + bbox convention
preserved. ``write_geoparquet`` spatially partitions output by grid
cell — the layout that makes downstream spatial predicates prune at
the FILE level (cell directories) on re-read, the closest vanilla-Spark
equivalent of a spatial index on storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_geoparquet(
    df: DataFrame,
    path: str,
    cell_size: float | None = None,
    x_col: str = "x",
    y_col: str = "y",
    mode: str = "overwrite",
) -> None:
    """Write with optional spatial partitioning: when ``cell_size`` is
    given, rows land in ``pcx=<i>/pcy=<j>`` directories keyed by the
    grid cell of (x_col, y_col); a reader filtering on a bbox can prune
    whole directories (Catalyst partition pruning on each axis
    independently), before parquet row-group min/max stats prune within
    files. Two partition columns rather than one packed id: a packed
    ``cx*K + cy`` encoding is not injective for negative cells (cell
    (1,-1) would collide with (0,K-1)), and the per-axis form lets a
    range predicate on one axis prune without decoding."""
    if cell_size:
        df = df.withColumn(
            "pcx", F.floor(F.col(x_col) / cell_size).cast("bigint")
        ).withColumn(
            "pcy", F.floor(F.col(y_col) / cell_size).cast("bigint")
        )
        df.write.mode(mode).partitionBy("pcx", "pcy").parquet(path)
    else:
        df.write.mode(mode).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent partition-level reprocessing: rewrite ONLY the
    partitions present in ``df`` (dynamic partition overwrite),
    leaving sibling partitions untouched — the re-run/backfill
    contract of a scheduled pipeline. The default STATIC overwrite
    mode would truncate the whole table on every backfill; the
    per-write option scopes the dynamic behavior to this sink without
    mutating session config."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_training_shards(
    corpus, path: str, n_shards: int, seed: int = 0, id_col: str = "id"
) -> None:
    """Materialize the deterministic training shuffle
    (``text.corpus.shard_corpus``) as a partitioned parquet layout:
    one ``shard=K/`` directory per shard, rows sorted by their shuffle
    position WITHIN each file, payload columns carried through. A data
    loader then streams ``shard=K`` sequentially and reads the corpus
    in the exact seeded shuffle order, with no runtime sort.

    Plan: the shard assignment join is keyed by id (doc-sized), the
    hash ``repartition`` on shard CO-LOCATES every row of a shard in
    one task (which is what keeps each shard=K/ directory a single
    pos-sorted file — hash collisions between shard values only reduce
    write parallelism, never correctness), and
    ``sortWithinPartitions(pos)`` sorts each shard independently —
    never a global sort. At 100 TB pick n_shards so one shard fits a
    task's spill budget (same guidance as shard_corpus).

    The corpus must not already carry ``shard``/``pos`` columns (the
    assignment's output names) — the sink raises rather than writing
    ambiguous columns."""
    from pyspark.sql import functions as F

    from ..text.corpus import shard_corpus

    clash = {"shard", "pos"} & {c for c in corpus.columns if c != id_col}
    if clash:
        raise ValueError(
            f"write_training_shards emits columns {sorted(clash)} which "
            "already exist in the corpus; rename them before writing"
        )
    if id_col != "id" and "id" in corpus.columns:
        raise ValueError(
            "write_training_shards renames the id column to 'id' for the "
            f"assignment join, but the corpus already has an 'id' column "
            f"alongside id_col={id_col!r}; rename one of them first"
        )
    assignment = shard_corpus(corpus, n_shards=n_shards, seed=seed, id_col=id_col)
    keyed = corpus.withColumnRenamed(id_col, "id") if id_col != "id" else corpus
    (
        assignment.join(keyed, "id")
        .repartition(int(n_shards), F.col("shard"))
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
