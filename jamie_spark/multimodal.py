"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as opaque ``binary`` columns
with typed metadata structs; decode / feature-extract / resize / frame-sample
run as Arrow-batched python stages (``mapInPandas``) because codecs are
python/C libraries. The image/audio libraries are NOT in this container, so
the codec layer is isolated behind ``_decode_image_real`` (import-try of PIL,
else a clearly-marked deterministic stub over the fixture container format) —
the Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and tested; a real codec drops in without touching any plan.

Fixture container format (deterministic, seedable):
  image: b"JMIM" + width:u16be + height:u16be + pixels (w*h bytes)
  audio: b"JMAU" + sample_rate:u16be + n_samples:u16be + samples
  video: b"JMVI" + n_frames:u16be + per-frame [image record]
"""

from __future__ import annotations

import hashlib
import struct
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

DECODED_DDL = (
    "media_id long, kind string, width int, height int, sample_rate int, "
    "n_frames int, n_bytes int, ok boolean"
)

FEATURES_DDL = "media_id long, kind string, feature array<float>"

FRAMES_DDL = "media_id long, frame_id int, width int, height int, pixels binary"


def _det_bytes(seed: str, n: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


def encode_image(media_id: int, width: int, height: int) -> bytes:
    return (
        b"JMIM"
        + struct.pack(">HH", width, height)
        + _det_bytes(f"img:{media_id}", width * height)
    )


def encode_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    return (
        b"JMAU"
        + struct.pack(">HH", sample_rate, n_samples)
        + _det_bytes(f"aud:{media_id}", n_samples)
    )


def encode_video(media_id: int, n_frames: int, width: int, height: int) -> bytes:
    body = b"".join(
        encode_image(media_id * 1000 + f, width, height) for f in range(n_frames)
    )
    return b"JMVI" + struct.pack(">H", n_frames) + body


def media_df(spark: "SparkSession", n: int, seed: int = 42) -> "DataFrame":
    """Deterministic fixture media table (images/audio/video round-robin)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 8 + (i % 8), 8 + (i % 5)
            rows.append((i, kind, encode_image(i, w, h), (w, h, None, None)))
        elif kind == "audio":
            sr, ns = 8000 + (i % 3) * 4000, 64 + (i % 32)
            rows.append((i, kind, encode_audio(i, sr, ns), (None, None, sr, None)))
        else:
            nf, w, h = 2 + (i % 3), 8, 8
            rows.append((i, kind, encode_video(i, nf, w, h), (w, h, None, nf)))
    return spark.createDataFrame(rows, MEDIA_DDL)


# --- codec layer (stubbed; real libs drop in here) ---------------------------

def _decode_image_real(payload: bytes):  # pragma: no cover - no PIL in sandbox
    """Real decoder slot. Raises NotImplementedError without PIL."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL (absent in this container); "
            "the deterministic stub container format is used instead"
        ) from exc
    return Image.open(io.BytesIO(payload))


def decode_payload(kind: str, payload: bytes) -> dict:
    """STUB decode of the fixture container format (deterministic).

    Length-checked per field: a payload with a valid magic but a TRUNCATED
    header (real corpora truncate mid-object all the time) must come back
    ok=False, not raise struct.error out of the Spark task — decode_media's
    per-row isolation contract depends on this function never raising."""
    if payload is None or len(payload) < 4:
        return {"ok": False}
    magic = payload[:4]
    if kind == "image" and magic == b"JMIM" and len(payload) >= 8:
        w, h = struct.unpack(">HH", payload[4:8])
        return {"width": w, "height": h, "n_bytes": len(payload), "ok": True}
    if kind == "audio" and magic == b"JMAU" and len(payload) >= 8:
        sr, ns = struct.unpack(">HH", payload[4:8])
        return {"sample_rate": sr, "n_bytes": len(payload), "ok": True}
    if kind == "video" and magic == b"JMVI" and len(payload) >= 6:
        (nf,) = struct.unpack(">H", payload[4:6])
        return {"n_frames": nf, "n_bytes": len(payload), "ok": True}
    return {"ok": False}


# --- Spark stages -------------------------------------------------------------

def decode_media(media: "DataFrame") -> "DataFrame":
    """Arrow-batched decode: (media_id, kind, dims..., ok). Bad payloads set
    ok=false instead of failing the job (per-row isolation)."""

    def run(batches):
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    d = decode_payload(kind, payload)
                except Exception:  # per-row isolation: never kill the task
                    d = {"ok": False}
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": d.get("width"),
                        "height": d.get("height"),
                        "sample_rate": d.get("sample_rate"),
                        "n_frames": d.get("n_frames"),
                        "n_bytes": d.get("n_bytes"),
                        "ok": d["ok"],
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=DECODED_DDL
    )


def extract_features(media: "DataFrame", dim: int = 16) -> "DataFrame":
    """Byte-histogram feature vector per payload (stub for a real encoder;
    same schema/batch shape as an embedding model would produce)."""

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "kind": [], "feature": []}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                hist = [0.0] * dim
                if payload:
                    for b in payload[8:]:
                        hist[b % dim] += 1.0
                    total = sum(hist) or 1.0
                    hist = [v / total for v in hist]
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["feature"].append(hist)
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_DDL
    )


def resize_images(
    media: "DataFrame", out_w: int = 8, out_h: int = 8
) -> "DataFrame":
    """Nearest-neighbor resize of image payloads -> fixed-dim pixel rows
    (the preprocessing shape a vision encoder consumes). Runs on the stub
    container format; a PIL-backed resize drops into the same loop (see
    ``_decode_image_real``) without touching schema or plan. Per-row
    isolation: non-images and corrupt payloads yield no row."""

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "pixels": []}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if (
                    kind != "image"
                    or payload is None
                    or len(payload) < 8
                    or payload[:4] != b"JMIM"
                ):
                    continue
                w, h = struct.unpack(">HH", payload[4:8])
                body = payload[8 : 8 + w * h]
                if len(body) < w * h or w == 0 or h == 0:
                    continue
                resized = bytearray(out_w * out_h)
                for y in range(out_h):
                    sy = y * h // out_h
                    row = sy * w
                    for x in range(out_w):
                        resized[y * out_w + x] = body[row + x * w // out_w]
                out["media_id"].append(mid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["pixels"].append(bytes(resized))
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, width int, height int, pixels binary"
    )


def sample_frames(media: "DataFrame", every: int = 1) -> "DataFrame":
    """Frame sampling for video payloads: one output row per kept frame."""

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_id": [], "width": [], "height": [],
                   "pixels": []}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                # per-row isolation: a null/corrupt/truncated video yields no
                # frames instead of failing the task (same contract as
                # decode_media's ok=False path)
                if (
                    kind != "video"
                    or payload is None
                    or len(payload) < 6
                    or payload[:4] != b"JMVI"
                ):
                    continue
                try:
                    (nf,) = struct.unpack(">H", payload[4:6])
                    pos = 6
                    for f in range(nf):
                        if pos + 8 > len(payload):
                            break  # truncated mid-frame
                        w, h = struct.unpack(">HH", payload[pos + 4 : pos + 8])
                        if pos + 8 + w * h > len(payload):
                            break
                        body = payload[pos + 8 : pos + 8 + w * h]
                        pos += 8 + w * h
                        if f % every == 0:
                            out["media_id"].append(mid)
                            out["frame_id"].append(f)
                            out["width"].append(w)
                            out["height"].append(h)
                            out["pixels"].append(bytes(body))
                except struct.error:
                    continue
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FRAMES_DDL
    )
