"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Real Spark plumbing — schemas, partition-aware batch iteration, Arrow batch
shapes — with the codec calls stubbed (image/audio libraries are not in this
container): ``decode_image_meta`` parses the few header bytes it can
deterministically (PNG/JPEG/GIF magic + PNG dimensions) and
``extract_features`` produces a deterministic hash-derived feature vector as
the stand-in for a model embedding. Swapping in a real decoder changes ONE
inner function; the distributed shape (mapInPandas over binary columns,
bounded batch memory) is what this module actually provides and tests.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string"
)

META_SCHEMA = (
    "media_id bigint, kind string, mime string, n_bytes bigint, "
    "format string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id bigint, feature array<float>, feature_dim int"


def _jpeg_dims(payload: bytes) -> tuple:
    """Walk JPEG segment markers to the first SOFn frame header (pure
    stdlib — the dimensions live at a variable offset, unlike PNG/GIF)."""
    i, n = 2, len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:  # start of scan: no frame header found
            break
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
            return int(width), int(height)
        i += 2 + seg_len
    return -1, -1


def _wav_duration_ms(payload: bytes) -> int:
    """RIFF/WAVE fmt-chunk walk: duration = data bytes / byte rate."""
    i, n = 12, len(payload)
    byte_rate, data_size = None, None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 20 <= n:
            byte_rate = struct.unpack("<I", payload[i + 16 : i + 20])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if byte_rate and data_size is not None:
        return int(data_size * 1000 / byte_rate)
    return -1


def _sniff_format(payload: bytes) -> tuple:
    """(format, width, height) from container headers; (-1,-1) when unknown.

    PNG (IHDR), GIF (logical screen descriptor) and JPEG (SOF marker walk)
    dimensions are parsed for real from the bytes; mp4/wav record the
    container format (a real demuxer would fill in dims/streams).
    """
    if payload is None or len(payload) < 12:
        return "unknown", -1, -1
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            width, height = struct.unpack(">II", payload[16:24])
            return "png", int(width), int(height)
        return "png", -1, -1
    if payload[:3] == b"\xff\xd8\xff":
        width, height = _jpeg_dims(payload)
        return "jpeg", width, height
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        width, height = struct.unpack("<HH", payload[6:10])
        return "gif", int(width), int(height)
    if payload[4:8] == b"ftyp":
        return "mp4", -1, -1
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav", -1, -1
    return "unknown", -1, -1


def decode_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas: binary payload → typed metadata rows (1:1)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights, sizes, durs = [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else None
                fmt, w, h = _sniff_format(raw)
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                sizes.append(len(raw) if raw is not None else 0)
                durs.append(_wav_duration_ms(raw) if fmt == "wav" else -1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "format": pd.Series(fmts, dtype=object),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "duration_ms": pd.Series(durs, dtype="int32"),
                }
            )

    return media.mapInPandas(decode, schema=META_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm vector derived from a payload digest — the
    STUB for a model embedding. Raise NotImplementedError here if you want
    hard failure instead of a fake when wiring a real encoder."""
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    vec = rng.standard_normal(dim).astype(np.float32)
    return vec / (np.linalg.norm(vec) + 1e-9)


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """mapInPandas: payload → feature vector (stubbed encoder, real shape)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(
                    bytes(p) if p is not None else b"", dim
                ).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": pd.Series(feats, dtype=object),
                    "feature_dim": pd.Series([dim] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """For video rows, emit a (media_id, frame_ts) sampling plan (1:N) —
    the decode of each frame is downstream of this plan and stubbed."""
    from pyspark.sql import functions as F

    # without a real container parser, duration is estimated from size at a
    # nominal bitrate (deterministic stand-in; replace with real probe)
    est_duration_s = (F.length("payload") / F.lit(250_000)).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(est_duration_s - 1, F.lit(0)),
                    F.lit(every_n_seconds),
                )
            ).alias("frame_ts"),
        )
    )
