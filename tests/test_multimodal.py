"""Multimodal binary-column plumbing: schema, batch shape, per-row isolation."""

import pytest
from pyspark.sql import functions as F

from jamie_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_df(spark, 30, seed=42).cache()


def test_decode_all_kinds(spark, media):
    decoded = mm.decode_media(media)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 30
    assert all(r["ok"] for r in rows.values())
    img = next(r for r in rows.values() if r["kind"] == "image")
    assert img["width"] is not None and img["sample_rate"] is None
    aud = next(r for r in rows.values() if r["kind"] == "audio")
    assert aud["sample_rate"] in (8000, 12000, 16000)
    vid = next(r for r in rows.values() if r["kind"] == "video")
    assert vid["n_frames"] >= 2


def test_decode_bad_payload_isolated(spark):
    bad = spark.createDataFrame(
        [(99, "image", b"\x00\x01", (None, None, None, None))], mm.MEDIA_DDL
    )
    rows = mm.decode_media(bad).collect()
    assert len(rows) == 1 and rows[0]["ok"] is False


def test_decode_truncated_header_isolated(spark):
    """A payload with a VALID magic but a truncated header (real corpora
    truncate mid-object) must come back ok=False — struct.unpack on the
    short buffer used to raise struct.error out of the Spark task."""
    rows = spark.createDataFrame(
        [
            (1, "image", b"JMIM\x00", (None, None, None, None)),
            (2, "audio", b"JMAU\x00\x01", (None, None, None, None)),
            (3, "video", b"JMVI\x00", (None, None, None, None)),
        ],
        mm.MEDIA_DDL,
    )
    got = mm.decode_media(rows).collect()
    assert len(got) == 3 and all(r["ok"] is False for r in got)


def test_features_shape_and_determinism(spark, media):
    feats = mm.extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-6 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in mm.extract_features(media, 16).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_frame_sampling(spark, media):
    frames = mm.sample_frames(media, every=2)
    per_video = (
        frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert per_video  # only video rows produce frames
    decoded = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    for r in per_video:
        nf = decoded[r["media_id"]]["n_frames"]
        assert r["n"] == (nf + 1) // 2  # every 2nd frame kept
    # frame pixel payloads have the advertised size
    f0 = frames.first()
    assert len(f0["pixels"]) == f0["width"] * f0["height"]


def test_frame_sampling_corrupt_video_isolated(spark):
    """Null/truncated video payloads yield no frames instead of killing the
    task (same per-row contract as decode_media)."""
    good = mm.encode_video(7, 2, 4, 4)
    bad = spark.createDataFrame(
        [
            (1, "video", None, (None, None, None, None)),
            (2, "video", b"JMVI\x00\x02" + b"\x00" * 3, (None, None, None, None)),
            (3, "video", good[: len(good) - 5], (None, None, None, None)),
            (7, "video", good, (4, 4, None, 2)),
        ],
        mm.MEDIA_DDL,
    )
    rows = mm.sample_frames(bad, every=1).collect()
    ids = {r["media_id"] for r in rows}
    assert 7 in ids  # intact video still decoded
    assert 1 not in ids and 2 not in ids
    # media 3 may contribute its first (complete) frame only
    assert all(r["media_id"] in (3, 7) for r in rows)


def test_real_codec_slot_raises_cleanly():
    with pytest.raises(NotImplementedError):
        mm._decode_image_real(b"JMIM....")


def test_resize_images_nearest_neighbor(spark):
    """Resize: fixed output dims, deterministic nearest-neighbor sampling
    (spot-checked against the source pixels), non-images skipped."""
    from jamie_spark import multimodal as mm
    import struct

    media = mm.media_df(spark, 9, seed=1)
    out = {r["media_id"]: r for r in mm.resize_images(media, 4, 4).collect()}
    src = {r["media_id"]: r for r in media.collect() if r["kind"] == "image"}
    assert set(out) == set(src)  # every image, nothing else
    for mid, r in out.items():
        assert (r["width"], r["height"]) == (4, 4)
        assert len(r["pixels"]) == 16
        payload = bytes(src[mid]["payload"])
        w, h = struct.unpack(">HH", payload[4:8])
        body = payload[8:]
        for y in range(4):
            for x in range(4):
                sy, sx = y * h // 4, x * w // 4
                assert r["pixels"][y * 4 + x] == body[sy * w + sx], (mid, x, y)
