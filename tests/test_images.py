"""Image multimodal family: pure-spec PNG codec (W3C/RFC 2083), the
deterministic images table, and the Arrow-batched feature stage. PNG is
lossless, so the invariant is EXACT pixel equality — the image twin of
the audio package's SNR>=30dB contract."""

from __future__ import annotations

import numpy as np
import pytest

from bento_spark.images.codecs import png_decode, png_encode
from bento_spark.images.generate import image_params, images_df, synth_rgb
from bento_spark.images.udfs import image_feature_row, with_image_features
from bento_spark.plans.compiler import compile_yaml


def test_png_roundtrip_exact_all_filters():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    grey = rng.integers(0, 256, (13, 29), dtype=np.uint8)
    for arr in (rgb, grey):
        for ftype in range(5):  # None/Sub/Up/Average/Paeth
            back = png_decode(png_encode(arr, filter_type=ftype))
            assert back.dtype == np.uint8 and back.shape == arr.shape
            assert np.array_equal(back, arr), f"filter {ftype} not lossless"


def test_png_corruption_and_unsupported():
    blob = bytearray(png_encode(np.zeros((4, 4, 3), np.uint8)))
    blob[20] ^= 0xFF  # clobber IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch"):
        png_decode(bytes(blob))
    with pytest.raises(ValueError, match="bad signature"):
        png_decode(b"JFIF" + bytes(blob))
    with pytest.raises(ValueError, match="uint8"):
        png_encode(np.zeros((4, 4, 3), np.float32))


def test_generator_determinism_and_schema(spark):
    df = images_df(spark, 24, partitions=3)
    rows = {r.image_id: r for r in df.collect()}
    assert len(rows) == 24
    # same (i, seed) -> identical bytes, independent of partitioning
    again = {r.image_id: r for r in images_df(spark, 24, partitions=2).collect()}
    for iid in rows:
        assert bytes(rows[iid].bytes) == bytes(again[iid].bytes)
    # metadata agrees with the decoded payload
    r0 = rows["img-000000000003"]
    arr = png_decode(bytes(r0.bytes))
    assert arr.shape == (r0.height, r0.width, 3)
    assert np.array_equal(arr, synth_rgb(3))


def test_feature_stage_matches_driver_truth(spark):
    df = images_df(spark, 16, partitions=2)
    out = {r.image_id: r for r in with_image_features(df, keep_payload=False).collect()}
    assert len(out) == 16 and "bytes" not in next(iter(out.values())).asDict()
    for i in range(16):
        p = image_params(i)
        truth = image_feature_row(png_encode(synth_rgb(i)))
        got = out[p["image_id"]]
        assert got.error is None
        assert (got.width_px, got.height_px) == (p["width"], p["height"])
        assert got.n_pixels == p["width"] * p["height"]
        # float64 means computed with the same kernel -> bit-identical
        assert got.mean_luma == truth["mean_luma"]
        assert got.mean_r == truth["mean_r"]


def test_feature_stage_error_protocol(spark):
    df = spark.createDataFrame(
        [("ok", bytearray(png_encode(np.full((4, 4, 3), 7, np.uint8)))),
         ("bad", bytearray(b"not a png")),
         ("nil", None)],
        "image_id string, bytes binary",
    )
    rows = {r.image_id: r for r in with_image_features(df).collect()}
    assert rows["ok"].error is None and rows["ok"].mean_luma == pytest.approx(7.0)
    assert "decode failed" in rows["bad"].error and rows["bad"].n_pixels is None
    assert rows["nil"].error is not None


def test_resize_kernel_box_and_nearest():
    from bento_spark.images.udfs import resize_rgb

    arr = np.zeros((8, 8, 3), np.uint8)
    arr[:4, :4], arr[:4, 4:], arr[4:, :4], arr[4:, 4:] = 10, 20, 30, 40
    small = resize_rgb(arr, 2, 2)  # integer factor -> box average
    assert small.shape == (2, 2, 3)
    assert (small[0, 0, 0], small[0, 1, 0], small[1, 0, 0], small[1, 1, 0]) == (10, 20, 30, 40)
    arr2 = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    nn = resize_rgb(arr2, 3, 2)  # non-integer -> nearest
    xs, ys = (np.arange(3) * 7) // 3, (np.arange(2) * 5) // 2
    assert np.array_equal(nn, arr2[np.ix_(ys, xs)])
    # identity + determinism
    assert np.array_equal(resize_rgb(arr2, 7, 5), arr2)
    assert png_encode(resize_rgb(arr2, 3, 2)) == png_encode(resize_rgb(arr2, 3, 2))


def test_image_resize_stage(spark):
    from bento_spark.images.udfs import with_image_resize

    df = images_df(spark, 8, partitions=2)
    out = {r.image_id: r for r in with_image_resize(df, 8, 8).collect()}
    assert len(out) == 8
    for i in range(8):
        p = image_params(i)
        r = out[p["image_id"]]
        assert r.error is None
        arr = png_decode(bytes(r.bytes))
        assert arr.shape == (8, 8, 3)
        # in-place resize updates the metadata columns
        assert (r.width, r.height) == (8, 8)
        # truth: same kernel applied driver-side
        from bento_spark.images.udfs import resize_rgb

        assert np.array_equal(arr, resize_rgb(synth_rgb(i), 8, 8))
    # out_col mode keeps the original payload + metadata
    out2 = with_image_resize(df, 8, 8, out_col="thumb").collect()
    for r in out2:
        assert png_decode(bytes(r.thumb)).shape == (8, 8, 3)
        assert png_decode(bytes(r.bytes)).shape == (r.height, r.width, 3)


def test_yaml_image_resize_pipeline(spark):
    p = compile_yaml("""
input:
  generate_images: {count: 6}
pipeline:
  processors:
    - image_resize: {width: 12, height: 12}
    - image_features: {keep_payload: false}
""")
    rows = p.build_batch(spark).collect()
    assert len(rows) == 6
    assert all((r.width_px, r.height_px) == (12, 12) for r in rows)
    assert all(r.error is None for r in rows)


def test_yaml_image_pipeline(spark):
    p = compile_yaml("""
input:
  generate_images: {count: 12}
pipeline:
  processors:
    - image_features: {keep_payload: false}
""")
    out = p.build_batch(spark)
    assert "bytes" not in out.columns
    rows = out.collect()
    assert len(rows) == 12 and all(r.error is None for r in rows)
    assert all(r.n_pixels == r.width_px * r.height_px for r in rows)
