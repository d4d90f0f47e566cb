"""Tests for the geo source layer and multimodal plumbing."""

import pyspark.sql.functions as F
import pytest

from gpd_lite_toolbox_spark import fixtures as FX


def test_select_rewrite_matches_reference_semantics():
    from gpd_lite_toolbox_spark.sources.geotable import (
        rewrite_select_inject_geom,
    )

    out = rewrite_select_inject_geom("SELECT a, b FROM t", "geom")
    assert out == "SELECT HEX(ST_AsBinary(geom)) as geom, a, b FROM t"
    with pytest.raises(ValueError, match="specified"):
        rewrite_select_inject_geom("SELECT * FROM t")
    with pytest.raises(ValueError, match="understand"):
        rewrite_select_inject_geom("WITH x AS (SELECT 1) SELECT 1 FROM x")


def test_hex_wkb_roundtrip(spark, sf_dir):
    from gpd_lite_toolbox_spark.sources.geotable import with_geometry

    pts = FX.points(spark, sf_dir).limit(50)
    hexed = pts.withColumn("geometry", F.hex("geometry"))
    back = with_geometry(hexed, add_bbox=True)
    orig = {r.id: bytes(r.geometry) for r in pts.collect()}
    for r in back.collect():
        assert bytes(r.geometry) == orig[r.id]
        assert r.bbox.xmin == r.x and r.bbox.ymax == r.y


def test_media_frame_sampling(spark, sf_dir):
    from gpd_lite_toolbox_spark.media.multimodal import (
        attach_fake_media,
        decode_image_meta,
        sample_frames,
    )

    FX.register_base_tables(spark, sf_dir)
    docs = spark.table("documents").select("doc_id").limit(20)
    meta = decode_image_meta(attach_fake_media(docs))
    frames = sample_frames(meta, every_n=10)
    pdf = frames.groupBy("doc_id", "meta_n_frames").count().toPandas()
    for r in pdf.itertuples():
        expected = (r.meta_n_frames - 1) // 10 + 1
        assert r.count == expected


def test_media_pixel_decode_raises_at_plan_time(spark):
    from gpd_lite_toolbox_spark.media.multimodal import decode_image_pixels

    with pytest.raises(NotImplementedError, match="image library"):
        decode_image_pixels(None)


def test_media_feature_hash_deterministic(spark, sf_dir):
    from gpd_lite_toolbox_spark.media.multimodal import (
        attach_fake_media,
        media_feature_hash,
    )

    FX.register_base_tables(spark, sf_dir)
    docs = spark.table("documents").select("doc_id").limit(10)
    a = media_feature_hash(attach_fake_media(docs)).select("doc_id", "f0", "f7")
    one = {r.doc_id: (r.f0, r.f7) for r in a.collect()}
    two = {r.doc_id: (r.f0, r.f7) for r in a.collect()}
    assert one == two
