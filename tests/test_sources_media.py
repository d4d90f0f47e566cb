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
    with pytest.raises(ValueError, match="specified"):
        rewrite_select_inject_geom("SELECT a, t.* FROM t")
    with pytest.raises(ValueError, match="understand"):
        rewrite_select_inject_geom("WITH x AS (SELECT 1) SELECT 1 FROM x")
    # reference bug FIXED (core.py:444-445 rejects ANY '*'): a star
    # inside a function call is a legitimate projection
    out = rewrite_select_inject_geom(
        "SELECT a, COUNT(*) FROM t GROUP BY a", "geom"
    )
    assert out.startswith("SELECT HEX(ST_AsBinary(geom)) as geom, a, COUNT(*)")


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


def test_media_pixel_decode_raw_fallback_matches_features(spark, sf_dir):
    """Without Pillow the fake-codec fallback must reproduce exactly
    the extract_media_features stats (same header+body contract), with
    px_codec recording the raw path and header dims surfacing as
    px_w/px_h."""
    from gpd_lite_toolbox_spark.media.multimodal import (
        attach_fake_media,
        decode_image_pixels,
        extract_media_features,
        pil_available,
    )

    if pil_available():
        pytest.skip("Pillow present: fake payloads would hit the real codec")
    FX.register_base_tables(spark, sf_dir)
    docs = spark.table("documents").select("doc_id").limit(20)
    media = attach_fake_media(docs)
    px = {
        r.doc_id: (r.px_codec, r.px_n, r.px_mean, r.px_std, r.px_min, r.px_max)
        for r in decode_image_pixels(media).collect()
    }
    ft = {
        r.doc_id: (r.px_n, r.px_mean, r.px_std, r.px_min, r.px_max)
        for r in extract_media_features(media).collect()
    }
    assert set(px) == set(ft) and len(px) == 20
    for k, (codec, *stats) in px.items():
        assert codec == "raw"
        assert tuple(stats) == ft[k]


def test_media_pixel_decode_real_codec(spark):
    """Auto-skips when Pillow is absent (this container); on a real
    cluster it pins the PIL path: a synthetic PNG decodes with
    px_codec='pil' and the known raster stats."""
    from gpd_lite_toolbox_spark.media.multimodal import (
        decode_image_pixels,
        pil_available,
    )

    if not pil_available():
        pytest.skip("Pillow not installed")
    import io

    from PIL import Image

    img = Image.new("L", (4, 2))
    img.putdata([0, 64, 128, 255, 255, 128, 64, 0])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "id bigint, media binary")
    row = decode_image_pixels(df).collect()[0]
    assert row.px_codec == "pil"
    assert (row.px_w, row.px_h, row.px_n) == (4, 2, 8)
    assert (row.px_min, row.px_max) == (0, 255)
    assert abs(row.px_mean - (0 + 64 + 128 + 255) * 2 / 8) < 1e-9


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


def test_geojson_roundtrip_bit_exact(spark, sf_dir):
    """WKB -> GeoJSON Feature -> WKB is byte-identical for every
    geometry type the codec supports (driver-side kernel check plus
    the Spark UDF path on polygons with holes)."""
    import struct

    import numpy as np

    from gpd_lite_toolbox_spark.geometry import wkb as W
    from gpd_lite_toolbox_spark.sources.geojson import _geom_obj, _geom_wkb

    ring = np.array(
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
    )
    hole = np.array(
        [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]
    )
    line = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 5.0]])
    mp_body = W.point_wkb(1.0, 2.0) + W.point_wkb(3.0, 4.0)
    multipoint = (
        b"\x01" + struct.pack("<I", W.WKB_MULTIPOINT)
        + struct.pack("<I", 2) + mp_body
    )
    ml_body = W.linestring_wkb(line) + W.linestring_wkb(line + 10.0)
    multiline = (
        b"\x01" + struct.pack("<I", W.WKB_MULTILINESTRING)
        + struct.pack("<I", 2) + ml_body
    )
    cases = [
        W.point_wkb(1.5, -2.5),
        W.linestring_wkb(line),
        W.polygon_wkb([ring, hole]),
        multipoint,
        multiline,
        W.multipolygon_wkb([[ring], [ring + 100.0, hole + 100.0]]),
    ]
    for wkb in cases:
        assert _geom_wkb(_geom_obj(wkb)) == wkb

    # Spark path: feature assembly + native property schema recovery
    from gpd_lite_toolbox_spark.sources.geojson import (
        from_geojson_features,
        to_geojson_features,
    )

    src = FX.cpolys(spark, sf_dir).limit(20)
    orig = {r.id: bytes(r.geometry) for r in src.collect()}
    feats = to_geojson_features(src, "geometry", ["id", "has_hole"]).select(
        "feature"
    )
    back = from_geojson_features(feats, "feature", "id bigint, has_hole int")
    rows = back.collect()
    assert len(rows) == len(orig)
    for r in rows:
        assert bytes(r.geometry) == orig[r.id]


def test_wkt_roundtrip_all_geometry_types(spark):
    """Every supported geometry type survives WKB -> WKT -> WKB
    bit-exactly (repr floats are shortest-round-trip)."""
    import numpy as np

    from gpd_lite_toolbox_spark.geometry import wkb as W
    from gpd_lite_toolbox_spark.sources.wkt import _from_wkt, _to_wkt

    ring = np.array(
        [[0.0, 0.0], [4.5, 0.0], [4.5, 3.25], [0.0, 3.25], [0.0, 0.0]]
    )
    hole = np.array(
        [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]
    )
    line = np.array([[0.0, 0.0], [1.5, 2.25], [-3.0, 4.125]])
    cases = [
        W.point_wkb(1.25, -2.5),
        W.linestring_wkb(line),
        W.polygon_wkb([ring]),
        W.polygon_wkb([ring, hole]),
        W.multipolygon_wkb([[ring], [ring + 10.0, hole + 10.0]]),
    ]
    for wkb in cases:
        txt = _to_wkt(wkb)
        assert bytes(_from_wkt(txt)) == bytes(wkb), txt
    # multipoint + multilinestring via their own writers
    mp = _from_wkt("MULTIPOINT ((1.5 2.5), (3.0 -4.0))")
    assert _to_wkt(mp) == "MULTIPOINT ((1.5 2.5), (3.0 -4.0))"
    ml = _from_wkt("MULTILINESTRING ((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 4.0))")
    assert (
        _to_wkt(ml)
        == "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 4.0))"
    )


def test_wkt_udf_roundtrip_on_fixture(spark, sf_dir):
    import pyspark.sql.functions as F

    from gpd_lite_toolbox_spark.sources.wkt import st_aswkt, st_fromwkt

    src = FX.cpolys(spark, sf_dir).limit(20)
    back = src.select(
        "id",
        F.col("geometry").alias("orig"),
        st_fromwkt(st_aswkt(F.col("geometry"))).alias("rt"),
    ).collect()
    for r in back:
        assert bytes(r.rt) == bytes(r.orig)


def test_audio_chunking_covers_stream_exactly(spark, sf_dir):
    from gpd_lite_toolbox_spark.media.multimodal import (
        attach_fake_media,
        chunk_audio,
        decode_image_meta,
    )

    FX.register_base_tables(spark, sf_dir)
    docs = spark.table("documents").select("doc_id").limit(30)
    meta = decode_image_meta(attach_fake_media(docs)).filter(
        F.col("meta_sample_rate").isNotNull()
    )
    chunks = chunk_audio(meta, chunk_s=1.0)
    pdf = chunks.groupBy("doc_id", "meta_n_bytes", "meta_sample_rate").agg(
        F.sum("n_samples").alias("covered"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
    ).toPandas()
    assert len(pdf) > 0
    for r in pdf.itertuples():
        total = r.meta_n_bytes // 2
        # chunks tile the stream exactly, no overlap, no gap
        assert r.covered == total
        assert r.max_idx == r.n_chunks - 1


def test_audio_chunking_zero_byte_stream_emits_no_chunks(spark):
    from gpd_lite_toolbox_spark.media.multimodal import chunk_audio

    meta = spark.createDataFrame(
        [(1, 0, 16000), (2, 32000, 16000)],
        "doc_id long, meta_n_bytes long, meta_sample_rate long",
    )
    pdf = chunk_audio(meta, chunk_s=1.0).toPandas()
    # doc 1 (zero bytes) contributes nothing — no spurious empty chunk
    assert set(pdf["doc_id"]) == {2}
    assert (pdf["n_samples"] > 0).all()


def test_resize_meta_longest_side_contract(spark):
    """Every downscaled image's longest side must be EXACTLY max_side
    (561 was the classic FP casualty: 561 * (512/561) floors to 511)."""
    from pyspark.sql import functions as F

    from gpd_lite_toolbox_spark.media.multimodal import resize_meta

    rows = [(i, w, h) for i, (w, h) in enumerate(
        [(561, 100), (100, 561), (512, 512), (2047, 2047),
         (16, 16), (644, 643), (685, 100000)]
    )]
    df = spark.createDataFrame(
        rows, "id int, meta_width int, meta_height int"
    )
    out = resize_meta(df, max_side=512)
    bad = out.filter(
        (F.greatest("meta_width", "meta_height") > 512)
        & (F.greatest("target_width", "target_height") != 512)
    ).count()
    assert bad == 0
    small = {r["id"]: r for r in out.collect()}
    assert (small[4]["target_width"], small[4]["target_height"]) == (16, 16)
    assert small[0]["target_width"] == 512 and small[0]["target_height"] == 91


def test_sample_frames_zero_frame_guard(spark):
    import pytest
    from gpd_lite_toolbox_spark.media.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, 0), (2, 25), (3, None)], "id int, meta_n_frames int"
    )
    out = sample_frames(df, every_n=10).collect()
    ids = {r["id"] for r in out}
    assert ids == {2}  # zero-frame and NULL-meta rows emit nothing
    assert sorted(r["frame_idx"] for r in out) == [0, 10, 20]
    with pytest.raises(ValueError):
        sample_frames(df, every_n=0)


def test_decode_image_meta_validates_columns(spark):
    import pytest
    from gpd_lite_toolbox_spark.media.multimodal import decode_image_meta

    df = spark.createDataFrame([(1, bytearray(b"x" * 16))], "id int, media binary")
    with pytest.raises(ValueError, match="media_kind"):
        decode_image_meta(df)
