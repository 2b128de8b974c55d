"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators. The Spark-side plumbing — schemas,
batch shapes, partition behavior, null handling — is real and tested, and
so is the codec work for the two formats decodable WITHOUT a codec library:

  * PPM (P6): text header + raw RGB — full pixel decode in numpy.
  * BMP (uncompressed 24-bit BITMAPINFOHEADER): struct header + padded
    bottom-up rows — full pixel decode in numpy.

Compressed formats (PNG/JPEG/...) dispatch to PIL behind an import-try
(this container ships no PIL/av/soundfile) and surface
``NotImplementedError`` in the ``err`` column; the deterministic FAKE
format remains for plumbing tests that want header-only payloads. Resize
is REAL (nearest-neighbor numpy resample re-encoded as PPM) for decodable
pixel formats.

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


# --- real pure-numpy codecs: PPM (P6) and uncompressed 24-bit BMP ----------

def test_pixels(width: int, height: int) -> np.ndarray:
    """Deterministic RGB test image (h, w, 3) uint8 — gradient + checker."""
    y, x = np.mgrid[0:height, 0:width]
    r = (x * 255 // max(width - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(height - 1, 1)).astype(np.uint8)
    b = (((x // 4 + y // 4) % 2) * 255).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 parser: three whitespace-separated header tokens (comments
    stripped), then maxval+1 raw RGB triples."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    i += 1  # single whitespace after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3).copy()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                      2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # BGR, bottom-up
    return header + dib + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flipped = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h,
                         offset=off).reshape(h, row_size)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return (px[::-1] if flipped else px).copy()


def decode_pixels(payload: bytes) -> np.ndarray:
    """Full pixel decode for the numpy-decodable formats; raises for
    others (FAKE has no pixels; compressed formats need PIL)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError("no pure-numpy pixel decode for this format")


# --- real pure-numpy audio codec: WAV (RIFF PCM16) -------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 WAV; ``samples`` is (n,) mono or (n, channels) int16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    assert samples.dtype == np.int16
    n, ch = samples.shape
    data = samples.tobytes()  # interleaved row-major
    byte_rate = sample_rate * ch * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                   byte_rate, ch * 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (samples (n, channels) int16, sample_rate). Walks RIFF chunks, so
    extra chunks (LIST, fact) before `data` parse fine."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, body)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
            fmt = (ch, rate)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            ch, rate = fmt
            count = (size // (2 * ch)) * ch
            samples = np.frombuffer(payload, dtype="<i2", count=count,
                                    offset=body)
            return samples.reshape(-1, ch).copy(), rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-clip features over REAL decoded PCM: duration, RMS (float scale),
    peak — the audio analogue of image_features; per-row error capture."""
    schema = ("media_id long, duration_s double, rms double, peak double, "
              "n_channels int, err string")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "media_id": pdf["media_id"].to_numpy(),
                "duration_s": np.full(n, np.nan),
                "rms": np.full(n, np.nan),
                "peak": np.full(n, np.nan),
                "n_channels": np.zeros(n, dtype=np.int32),
                "err": np.array([None] * n, dtype=object),
            }
            for i, payload in enumerate(pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("empty payload")
                    samples, rate = decode_wav(bytes(payload))
                    x = samples.astype(np.float64) / 32768.0
                    out["duration_s"][i] = samples.shape[0] / rate
                    out["rms"][i] = float(np.sqrt((x ** 2).mean()))
                    out["peak"][i] = float(np.abs(x).max())
                    out["n_channels"][i] = samples.shape[1]
                except Exception as e:
                    out["err"][i] = f"{type(e).__name__}: {e}"[:200]
            yield pd.DataFrame(out)

    return df.select("media_id", payload_col).mapInPandas(feats, schema)


def _decode_image_real(payload: bytes) -> tuple[int, int, int]:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "compressed-image decode needs PIL — not in this container") from e
    import io
    from PIL import Image
    im = Image.open(io.BytesIO(payload))
    return im.width, im.height, len(im.getbands())


def _decode_one(payload) -> tuple[int, int, int]:
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    head = bytes(payload[:4])
    if head == FAKE_MAGIC:
        w, h, c = struct.unpack("<HHB", bytes(payload[4:9]))
        return w, h, c
    if head[:2] in (b"P6", b"BM"):
        px = decode_pixels(bytes(payload))
        return px.shape[1], px.shape[0], px.shape[2]
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
                except Exception as e:
                    out["err"][i] = f"{type(e).__name__}: {e}"[:200]
            yield pd.DataFrame(out)

    return df.select(id_col, kind_col, payload_col).mapInPandas(
        decode, DECODED_SCHEMA)


def resize_pixels(px: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample (h,w,3) → (target_h,target_w,3), pure
    numpy fancy indexing — the batch-shaped kernel a real resize stage
    runs; swap for an interpolating kernel without touching the plumbing."""
    h, w, _ = px.shape
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    return px[yi][:, xi]


def resize_media(df: DataFrame, target_w: int, target_h: int,
                 payload_col: str = "payload") -> DataFrame:
    """REAL resize for the numpy-decodable pixel formats (PPM/BMP →
    nearest-neighbor → re-encoded PPM); FAKE payloads re-encode at the
    target geometry (header-only plumbing); anything else captures its
    error per row, never failing the job."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errs = [], []
            for payload in pdf[payload_col]:
                try:
                    raw = None if payload is None else bytes(payload)
                    if raw is not None and raw[:2] in (b"P6", b"BM"):
                        out_px = resize_pixels(decode_pixels(raw),
                                               target_w, target_h)
                        payloads.append(encode_ppm(out_px))
                    else:
                        _w, _h, c = _decode_one(payload)
                        payloads.append(
                            encode_fake_image(target_w, target_h, c))
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


resize_stub = resize_media  # historical name


def image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-image feature extraction over REAL decoded pixels: per-channel
    mean/std — the feature-extract stage of a multimodal training pipeline
    (batch-shaped like decode_media; errors per row)."""
    schema = ("media_id long, mean_r double, mean_g double, mean_b double, "
              "std_gray double, err string")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "media_id": pdf["media_id"].to_numpy(),
                "mean_r": np.full(n, np.nan),
                "mean_g": np.full(n, np.nan),
                "mean_b": np.full(n, np.nan),
                "std_gray": np.full(n, np.nan),
                "err": np.array([None] * n, dtype=object),
            }
            for i, payload in enumerate(pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("empty payload")
                    px = decode_pixels(bytes(payload)).astype(np.float64)
                    means = px.mean(axis=(0, 1))
                    out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = means
                    out["std_gray"][i] = float(px.mean(axis=2).std())
                except Exception as e:
                    out["err"][i] = f"{type(e).__name__}: {e}"[:200]
            yield pd.DataFrame(out)

    return df.select("media_id", payload_col).mapInPandas(feats, schema)


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
