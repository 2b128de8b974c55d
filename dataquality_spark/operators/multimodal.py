"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators. The Spark-side plumbing — schemas,
batch shapes, partition behavior, null handling — is real and tested; the
actual codec work is STUBBED behind import-tries (this container ships no
PIL/av/soundfile), with a deterministic fake decoder so tests can assert the
full path end-to-end. Swap ``_decode_image_real`` in when the libs exist.

Schema conventions:
    media(media_id long, kind string, payload binary, meta map<string,string>)
    decoded: + width int, height int, n_channels int, ok boolean, err string
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("media_id long, kind string, width int, height int, "
                  "n_channels int, n_bytes long, ok boolean, err string")

# deterministic fake format: b"FAKE" + u16 width + u16 height + u8 channels
FAKE_MAGIC = b"FAKE"


def encode_fake_image(width: int, height: int, channels: int = 3,
                      payload_len: int = 64) -> bytes:
    body = bytes((width * 7 + height * 13 + i) % 256 for i in range(payload_len))
    return FAKE_MAGIC + struct.pack("<HHB", width, height, channels) + body


def _decode_image_real(payload: bytes) -> tuple[int, int, int]:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs PIL — not in this container") from e
    import io
    from PIL import Image
    im = Image.open(io.BytesIO(payload))
    return im.width, im.height, len(im.getbands())


def _decode_one(payload) -> tuple[int, int, int]:
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    if bytes(payload[:4]) == FAKE_MAGIC:
        w, h, c = struct.unpack("<HHB", bytes(payload[4:9]))
        return w, h, c
    return _decode_image_real(bytes(payload))


def decode_media(df: DataFrame, id_col: str = "media_id",
                 payload_col: str = "payload",
                 kind_col: str = "kind") -> DataFrame:
    """binary payload → typed metadata; errors captured per row, never
    failing the job (the reference's error-capture contract,
    `dimensions/accuracy/dimension_reference.py:103-113`)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "media_id": pdf[id_col].to_numpy(),
                "kind": pdf[kind_col].to_numpy(),
                "width": np.zeros(n, dtype=np.int32),
                "height": np.zeros(n, dtype=np.int32),
                "n_channels": np.zeros(n, dtype=np.int32),
                "n_bytes": np.zeros(n, dtype=np.int64),
                "ok": np.zeros(n, dtype=bool),
                "err": np.array([None] * n, dtype=object),
            }
            for i, payload in enumerate(pdf[payload_col]):
                out["n_bytes"][i] = 0 if payload is None else len(payload)
                try:
                    w, h, c = _decode_one(payload)
                    out["width"][i], out["height"][i] = w, h
                    out["n_channels"][i] = c
                    out["ok"][i] = True
                except (ValueError, NotImplementedError, Exception) as e:
                    out["err"][i] = f"{type(e).__name__}: {e}"[:200]
            yield pd.DataFrame(out)

    return df.select(id_col, kind_col, payload_col).mapInPandas(
        decode, DECODED_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int,
                payload_col: str = "payload") -> DataFrame:
    """Resize plumbing: fake payloads are re-encoded at the target geometry;
    real codecs raise NotImplementedError into the err column."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errs = [], []
            for payload in pdf[payload_col]:
                try:
                    _w, _h, c = _decode_one(payload)
                    payloads.append(encode_fake_image(target_w, target_h, c))
                    errs.append(None)
                except Exception as e:
                    payloads.append(None)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "payload": pd.Series(payloads, dtype=object),
                "err": pd.Series(errs, dtype=object),
            })

    return df.mapInPandas(resize, "media_id long, payload binary, err string")


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    derived from payload length (deterministic fake: n_frames = n_bytes/64)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = 0 if payload is None else max(len(payload) // 64, 1)
                for f in range(0, n_frames, every_n):
                    ids.append(mid)
                    frames.append(f)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(frames, dtype="int64"),
            })

    return df.mapInPandas(sample, "media_id long, frame_idx long")
