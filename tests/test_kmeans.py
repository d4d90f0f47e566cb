"""Deterministic relational k-means (vector/kmeans.py kmeans_assign).

The hash gate (oracles.EMBEDDING_CLUSTERS) pins exact cross-engine
agreement; these tests pin the SEMANTICS the gate alone can't express:
the rounds genuinely move assignments (else the oracle degenerates to
the seed argmin), clustering quality improves against the fixture's
planted labels, empty cells carry their centers, and the plan stays
driver-loop-free.
"""

import pytest

from pyspark.sql import functions as F

from gpd_lite_toolbox_spark import fixtures as FX
from gpd_lite_toolbox_spark.vector.kmeans import kmeans_assign
from gpd_lite_toolbox_spark.vector.pq import default_coarse_centroids


def _wcss(vecs: dict, assign: dict) -> float:
    """k-means objective with each cluster's OWN mean — the quantity
    Lloyd monotonically non-increases."""
    import numpy as np

    by_cell: dict = {}
    for vid, cell in assign.items():
        by_cell.setdefault(cell, []).append(vecs[vid])
    total = 0.0
    for members in by_cell.values():
        X = np.asarray(members, dtype=np.float64)
        total += float(((X - X.mean(axis=0)) ** 2).sum())
    return total


def test_kmeans_rounds_move_assignments_and_cut_objective(spark, sf_dir):
    FX.register_base_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }
    seed = default_coarse_centroids()
    a0 = {
        r.vec_id: r.cell
        for r in kmeans_assign(emb, seed, n_iter=0).collect()
    }
    a2 = {
        r.vec_id: r.cell
        for r in kmeans_assign(emb, seed, n_iter=2).collect()
    }
    assert set(a0) == set(vecs) and len(a0) > 0
    moved = sum(1 for k in a0 if a0[k] != a2[k])
    # the hash gate would pass even if the rounds were a no-op; this
    # is the fixture-expresses-failure check (r4's recurring lesson)
    assert moved > 0, "2 Lloyd rounds changed nothing: gate degenerate"
    # Lloyd monotonicity: the within-cluster sum of squares must not
    # increase (tiny slack for the 6dp center rounding)
    j0, j2 = _wcss(vecs, a0), _wcss(vecs, a2)
    assert j2 <= j0 * (1 + 1e-9), f"objective rose: {j0} -> {j2}"
    assert j2 < j0, "objective unchanged despite moved assignments"


def test_kmeans_empty_cells_keep_seed_centers(spark):
    # all points near seed centroid 0: every other cell goes empty and
    # must carry its seed center instead of dying or going NULL
    seed = default_coarse_centroids()
    pts = spark.createDataFrame(
        [(i, [float(x) + 0.001 * i for x in seed[0]]) for i in range(6)],
        "vec_id bigint, embedding array<float>",
    )
    out = kmeans_assign(pts, seed, n_iter=3).collect()
    assert len(out) == 6
    assert {r.cell for r in out} == {0}


def test_kmeans_empty_input_and_bad_n_iter(spark):
    seed = default_coarse_centroids()
    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>"
    )
    assert kmeans_assign(empty, seed, n_iter=2).count() == 0
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_assign(empty, seed, n_iter=-1)


def test_kmeans_plan_has_no_driver_loop_artifacts(spark, sf_dir):
    """n_iter rounds chain lazily: one plan, no pickled-row Python,
    and the aggregate count in the plan scales with n_iter (the
    unrolled-plan contract the module docstring states).  Since the
    round-10 optimization the argmin assignment is an Arrow-batched
    kernel (guide §4.2), so the plan carries exactly n_iter+1
    ArrowEvalPython nodes — one per assignment pass — and no k-row
    SortMergeJoin (the empty-cell carry is one-row array algebra)."""
    FX.register_base_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    df = kmeans_assign(emb, default_coarse_centroids(), n_iter=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # n_iter+1 assignment passes; the pre-execution tree additionally
    # prints round n-1's pass once more under the carry's broadcast —
    # a textually duplicated subtree that AQE's runtime stage cache
    # dedupes (both occurrences are canonically identical
    # BroadcastExchanges, which is why the carry broadcasts the
    # PREVIOUS centers rather than streaming them)
    assert 3 <= plan.count("ArrowEvalPython") <= 4
    assert "SortMergeJoin" not in plan  # carry is array algebra now
    assert plan.count("HashAggregate") >= 2  # one mean update per round


def test_kmeans_assignments_identical_under_aqe_toggle(spark, sf_dir):
    """r5 verdict ask #7: the one-row centers crossJoin is exactly the
    shape AQE likes to re-plan (broadcast conversion, coalesced
    exchanges), so pin that flipping spark.sql.adaptive.enabled does
    NOT move a single assignment — the md5-seeded, rounded-mean
    recipe must be plan-invariant, not just partition-stable."""
    FX.register_base_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    seed = default_coarse_centroids()
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    results = {}
    try:
        for mode in ("true", "false"):
            spark.conf.set(key, mode)
            results[mode] = {
                r.vec_id: r.cell
                for r in kmeans_assign(emb, seed, n_iter=2).collect()
            }
    finally:
        spark.conf.set(key, prev)
    assert results["true"] == results["false"]
    assert len(results["true"]) == emb.count()


def test_arrow_argmin_kernel_matches_retired_catalyst_fold(spark):
    """Round-10 optimization pin: the Arrow argmin kernel must be
    BIT-IDENTICAL to the Catalyst transform/zip_with/aggregate fold it
    replaced — same sequential accumulation order, same first-min tie
    rule, NULL vector / NULL element -> NULL cell.  The retired fold
    is reconstructed here verbatim and both run over adversarial
    vectors: exact ties (equidistant centers), near-ties in the last
    ulp, NULLs, and a wrong-length vector."""
    import math

    from pyspark.sql import functions as F

    from gpd_lite_toolbox_spark.vector.kmeans import kmeans_assign

    seed = [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0], [0.1, 0.9]]
    rows = [
        (0, [1.0, 0.0]),        # exactly equidistant to cells 0, 1, 2
        (1, [1.5, 0.5]),        # equidistant to cells 1 and 2
        (2, [0.0, 0.0]),        # exact center hit
        (3, [1e-16, -1e-16]),   # last-ulp near-tie
        (4, None),              # NULL vector -> NULL cell
        (5, [0.3, None]),       # NULL element -> NULL cell
        (6, [0.1]),             # wrong length -> NULL cell
        (7, [123456.789, -98765.4321]),
        (8, [0.55, 0.45]),
        (9, [2.0, 0.0]),
    ] + [
        (100 + i, [math.sin(i * 0.7) * 3, math.cos(i * 1.3) * 3])
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    got = {
        r.vec_id: r.cell
        for r in kmeans_assign(df, seed, n_iter=0).collect()
    }
    # the retired fold, verbatim (kmeans.py <= round 9 _assign)
    ctr = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(seed)],
        "cell int, cv array<double>",
    ).agg(
        F.sort_array(F.collect_list(F.struct("cell", "cv"))).alias("_ctr")
    )
    d2l = F.expr(
        "transform(_ctr, c -> aggregate("
        "zip_with(_vv, c.cv, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, x) -> acc + x))"
    )
    want = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "_vv"
            ),
        )
        .crossJoin(F.broadcast(ctr))
        .withColumn("_d2l", d2l)
        .withColumn(
            "cell",
            F.expr(
                "CAST(array_position(_d2l, array_min(_d2l)) - 1 AS INT)"
            ),
        )
        .collect()
    }
    assert got == want
    assert got[4] is None and got[5] is None and got[6] is None
    assert got[0] == 0 and got[1] == 1  # first-min tie rule
    assert got[2] == 0 and got[9] == 2  # exact center hits


def test_kmeans_null_vectors_survive_lloyd_rounds(spark):
    """r10 ADVICE (medium): with n_iter >= 1 a NULL / wrong-length /
    NULL-element vector used to crash the mean-pack with
    [NULL_MAP_KEY] — the kernel assigns those rows a NULL cell, the
    NULL-cell group survived the means groupBy, and map_from_entries
    rejects a NULL key.  The fix filters NULL cells before the pack,
    which is exactly the retired centers-LEFT-JOIN-means semantics
    (the NULL-cell row matched no center).  Pin: the job completes,
    clean rows cluster as if the dirty rows were absent from the
    center updates, dirty rows keep NULL cells."""
    from gpd_lite_toolbox_spark.vector.kmeans import kmeans_assign

    seed = [[0.0, 0.0], [10.0, 10.0]]
    clean = [
        (0, [0.5, 0.1]),
        (1, [-0.2, 0.3]),
        (2, [9.5, 10.2]),
        (3, [10.4, 9.8]),
    ]
    dirty = [
        (100, None),          # NULL vector
        (101, [0.3, None]),   # NULL element
        (102, [0.1]),         # wrong length
    ]
    df_all = spark.createDataFrame(
        clean + dirty, "vec_id bigint, embedding array<double>"
    )
    df_clean = spark.createDataFrame(
        clean, "vec_id bigint, embedding array<double>"
    )
    for n_iter in (1, 2):
        got = {
            r.vec_id: r.cell
            for r in kmeans_assign(df_all, seed, n_iter=n_iter).collect()
        }
        want_clean = {
            r.vec_id: r.cell
            for r in kmeans_assign(df_clean, seed, n_iter=n_iter).collect()
        }
        assert got[100] is None and got[101] is None and got[102] is None
        assert {k: got[k] for k in want_clean} == want_clean
