"""Video multimodal family: the BVC fixture container (PNG-framed, see
video/container.py for why real codecs are stubbed), the deterministic
videos table, and the three Arrow-batched stages (header-only metadata,
decode-free frame sampling, full-decode features). PNG frames are
lossless, so the invariant is EXACT pixel equality — the video twin of
the image family's contract."""

from __future__ import annotations

import numpy as np
import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.video.container import (
    HEADER_SIZE,
    bvc_decode,
    bvc_encode,
    bvc_frame_blobs,
    bvc_probe,
)
from bento_spark.video.generate import synth_frame, synth_video, video_params, videos_df
from bento_spark.video.udfs import (
    video_feature_row,
    with_frame_sample,
    with_video_features,
    with_video_meta,
)


def _frames(n=5, h=6, w=8, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_bvc_roundtrip_exact():
    frames = _frames()
    blob = bvc_encode(frames, fps=10)
    back, fps = bvc_decode(blob)
    assert fps == 10 and len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    # deterministic: same frames -> identical container bytes
    assert bvc_encode(frames, fps=10) == blob


def test_bvc_probe_header_only():
    frames = _frames(n=4, h=12, w=16)
    blob = bvc_encode(frames, fps=25)
    meta = bvc_probe(blob)
    assert meta == {"codec": 1, "width": 16, "height": 12, "fps": 25,
                    "n_frames": 4, "duration_ms": 160}
    # probe never reads past the header: truncating the body doesn't break it
    assert bvc_probe(blob[:HEADER_SIZE]) == meta


def test_bvc_frame_slicing_decode_free():
    frames = _frames(n=6)
    blob = bvc_encode(frames, fps=10)
    sliced = bvc_frame_blobs(blob, [0, 2, 5])
    # each slice is a complete standalone PNG of the right frame
    from bento_spark.images.codecs import png_decode

    for want_idx, fb in zip([0, 2, 5], sliced):
        assert np.array_equal(png_decode(fb), frames[want_idx])
    assert len(bvc_frame_blobs(blob)) == 6
    with pytest.raises(ValueError, match="out of range"):
        bvc_frame_blobs(blob, [6])


def test_bvc_errors_name_external_decoders():
    with pytest.raises(ValueError, match="ffmpeg|pyav"):
        bvc_probe(b"\x00\x00\x00\x1cftypisom" + b"\x00" * 20)  # mp4-ish magic
    with pytest.raises(ValueError, match="too short"):
        bvc_probe(b"BVC1")
    frames = _frames(n=2)
    blob = bvc_encode(frames, fps=10)
    with pytest.raises(ValueError, match="truncated"):
        bvc_frame_blobs(blob[:-3], None)


def test_generator_determinism_and_schema(spark):
    df = videos_df(spark, 18, partitions=3)
    rows = {r.video_id: r for r in df.collect()}
    assert len(rows) == 18
    again = {r.video_id: r for r in videos_df(spark, 18, partitions=2).collect()}
    for vid in rows:
        assert bytes(rows[vid].bytes) == bytes(again[vid].bytes)
    # metadata columns agree with the container header
    r0 = rows["vid-000000000002"]
    meta = bvc_probe(bytes(r0.bytes))
    assert (meta["width"], meta["height"], meta["fps"], meta["n_frames"]) == (
        r0.width, r0.height, r0.fps, r0.n_frames)
    # payload is the pure (i, seed) function
    assert bytes(r0.bytes) == synth_video(2)


def test_meta_stage_header_only_and_errors(spark):
    df = videos_df(spark, 10, partitions=2)
    out = {r.video_id: r for r in with_video_meta(df).collect()}
    for i in range(10):
        p = video_params(i)
        r = out[p["video_id"]]
        assert r.error is None
        assert (r.meta_width, r.meta_height, r.meta_fps, r.meta_n_frames) == (
            p["width"], p["height"], p["fps"], p["n_frames"])
        assert r.meta_duration_ms == p["n_frames"] * 1000 // p["fps"]
    bad = spark.createDataFrame(
        [("bad", bytearray(b"RIFFxxxxAVI LIST")), ("nil", None)],
        "video_id string, bytes binary",
    )
    rows = {r.video_id: r for r in with_video_meta(bad).collect()}
    assert "ffmpeg" in rows["bad"].error and rows["bad"].meta_width is None
    assert rows["nil"].error is not None


def test_frame_sample_matches_truth(spark):
    from bento_spark.images.codecs import png_decode

    df = videos_df(spark, 8, partitions=2)
    out = with_frame_sample(df, every=2, keep_payload=False).collect()
    assert all("bytes" not in r.asDict() for r in out)
    by_vid: dict[str, list] = {}
    for r in out:
        by_vid.setdefault(r.video_id, []).append(r)
    for i in range(8):
        p = video_params(i)
        got = sorted(by_vid[p["video_id"]], key=lambda r: r.frame_idx)
        want_idx = list(range(0, p["n_frames"], 2))
        assert [r.frame_idx for r in got] == want_idx
        for r in got:
            assert r.error is None
            assert r.frame_ts_ms == r.frame_idx * 1000 // p["fps"]
            # sliced frame is the exact synthetic frame, pixel-identical
            assert np.array_equal(png_decode(bytes(r.frame)), synth_frame(i, r.frame_idx))
    # max_frames caps the explosion
    capped = with_frame_sample(df, every=1, max_frames=2).collect()
    assert all(r.frame_idx in (0, 1) for r in capped)


def test_frame_sample_composes_with_image_family(spark):
    """Sampled frames are standalone PNGs, so the image feature stage
    consumes them unchanged — the families compose in one pipeline."""
    from bento_spark.images.udfs import with_image_features

    df = videos_df(spark, 6, partitions=2)
    frames = with_frame_sample(df, every=2, keep_payload=False)
    feats = with_image_features(
        frames.withColumnRenamed("frame", "bytes"), keep_payload=False)
    rows = feats.collect()
    assert rows and all(r.error is None for r in rows)
    for r in rows:
        p = video_params(int(r.video_id.split("-")[1]))
        assert (r.width_px, r.height_px) == (p["width"], p["height"])


def test_feature_stage_matches_driver_truth(spark):
    df = videos_df(spark, 12, partitions=3)
    out = {r.video_id: r for r in with_video_features(df, keep_payload=False).collect()}
    assert len(out) == 12 and "bytes" not in next(iter(out.values())).asDict()
    statics = 0
    for i in range(12):
        p = video_params(i)
        truth = video_feature_row(synth_video(i))
        got = out[p["video_id"]]
        assert got.error is None
        assert (got.width_px, got.height_px) == (p["width"], p["height"])
        assert got.n_frames_dec == p["n_frames"] and got.fps_dec == p["fps"]
        # float64 kernels -> bit-identical to the driver-side spec
        assert got.mean_luma == truth["mean_luma"]
        assert got.motion == truth["motion"]
        if p["label"] == "static":
            statics += 1
            assert got.motion == 0.0  # zero-motion truth case
    assert statics > 0


def test_yaml_video_pipeline(spark):
    p = compile_yaml("""
input:
  generate_videos: {count: 6}
pipeline:
  processors:
    - video_meta: {}
    - video_features: {keep_payload: false}
""")
    rows = p.build_batch(spark).collect()
    assert len(rows) == 6 and all(r.error is None for r in rows)
    # header metadata agrees with decoded truth
    assert all(r.meta_n_frames == r.n_frames_dec for r in rows)
    assert all(r.meta_fps == r.fps_dec for r in rows)


def test_yaml_frame_sample_to_image_resize(spark):
    from bento_spark.images.codecs import png_decode

    p = compile_yaml("""
input:
  generate_videos: {count: 4}
pipeline:
  processors:
    - frame_sample: {every: 2}
    - mutation: root.bytes = this.frame
    - image_resize: {width: 8, height: 8}
""")
    rows = p.build_batch(spark).collect()
    assert rows and all(r.error is None for r in rows)
    assert all(png_decode(bytes(r.bytes)).shape == (8, 8, 3) for r in rows)


def test_lint_knows_video_surface():
    from bento_spark.plans.lint import known_inputs, known_processors, lint_yaml

    assert "generate_videos" in known_inputs()
    assert {"video_meta", "frame_sample", "video_features"} <= known_processors()
    issues = lint_yaml("""
input:
  generate_videos: {count: 4}
pipeline:
  processors:
    - frame_sample: {}
""")
    assert any("every" in i for i in issues)
