"""Steady-state corpus maintenance on the engine's public API.

The day-2 operations the training_data_pipeline example leaves out:
a nightly delta folds into the canonical snapshot (CDC latest-wins
merge), the change is audited (snapshot diff), the quality gate's
stage-by-stage survival is re-measured (funnel), duplicate clusters
resolve to their best member (retention policy), a candidate batch
dedups against the PERSISTED minhash index before admission (and the
survivors are appended to it — the corpus is never re-paired), and
every document gets a stable train/val/test assignment that never
moves under corpus growth. Run it locally:

    python examples/corpus_maintenance_pipeline.py [sf_dir]

Every stage is a DataFrame transformation; nothing collects more than
the final summaries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import gpd_lite_toolbox_spark as G  # noqa: E402


def run(spark, sf_dir: str):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), "text"
    )

    # 1. the nightly delta: edits, removals, and net-new documents
    # (mocked by id class; a real feed arrives with version/op set)
    changes = (
        base.filter(F.col("id") % 6 == 0)
        .select("id", F.concat("text", F.lit(" [edited]")).alias("text"),
                F.lit(1).alias("version"), F.lit("U").alias("op"))
        .unionByName(
            base.filter(F.col("id") % 17 == 0).select(
                "id", F.lit(None).cast("string").alias("text"),
                F.lit(2).alias("version"), F.lit("D").alias("op"))
        )
        .unionByName(
            base.filter(F.col("id") % 9 == 0).select(
                (F.col("id") + 10_000_000).alias("id"),
                F.concat("text", F.lit(" [new]")).alias("text"),
                F.lit(1).alias("version"), F.lit("U").alias("op"))
        )
    )

    # 2. latest-wins merge: ONE hash aggregate, no join, no rewrite
    snapshot = G.apply_changes(base, changes)

    # 3. audit what changed between the snapshots
    diff = G.corpus_diff(base, snapshot)

    # 4. re-measure the quality gate stage by stage
    funnel = G.quality_funnel(snapshot)

    # 5. resolve duplicate clusters to their best member and keep it
    kept = G.dedup_canonical(snapshot, threshold=0.5)
    snapshot = snapshot.join(
        kept.select(F.col("kept_id").alias("id")), "id", "left_semi"
    )

    # 6. index-backed incremental ingest: the canonical snapshot's
    # minhash state persists once; tonight's candidate batch dedups
    # against the INDEX (partition-pruned bucket lookup — never a
    # corpus re-pair), and only the survivors are admitted
    import tempfile

    idx = tempfile.mkdtemp(prefix="maint_mhidx_")
    G.write_minhash_index(snapshot, idx)
    batch = base.filter(F.col("id") % 11 == 3).select(
        (F.col("id") + 20_000_000).alias("id"),
        F.concat("text", F.lit(" zq extra")).alias("text"),
    )
    dup_hits = G.ingest_near_dups(spark, idx, batch, threshold=0.5)
    admitted = batch.join(
        dup_hits.select(F.greatest("id_a", "id_b").alias("id")),
        "id",
        "left_anti",
    ).localCheckpoint()
    # SEVER LINEAGE before the append (localCheckpoint, not persist:
    # losing a cached block would lazily re-evaluate `admitted`
    # against the index we are about to grow, deduping the batch
    # against its own appended rows)
    G.append_to_minhash_index(admitted, idx)
    snapshot = snapshot.unionByName(admitted)

    # 7. stable split: an id keeps its assignment as the corpus grows,
    # so the eval sets never leak freshly-trained-on documents
    splits = G.split_corpus(snapshot, seed=0)

    summary = (
        diff.groupBy("status").count()
        .agg(F.collect_list(F.struct("status", "count")).alias("_d"))
        .select(F.lit(1).alias("_k"), "_d")
        .join(
            splits.groupBy("split").count()
            .agg(F.collect_list(F.struct("split", "count")).alias("_s"))
            .select(F.lit(1).alias("_k"), "_s"),
            "_k",
        )
        .select(
            F.map_from_entries("_d").alias("diff_counts"),
            F.map_from_entries("_s").alias("split_counts"),
        )
    )
    return funnel, summary


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = G.get_spark("corpus-maintenance-pipeline")
    funnel, summary = run(spark, sf_dir)
    print("quality funnel:")
    funnel.show(truncate=False)
    print("maintenance summary:")
    summary.show(truncate=False)


if __name__ == "__main__":
    main()
