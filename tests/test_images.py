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
