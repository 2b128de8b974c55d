"""Multimodal binary plumbing: decode/resize/frame-sample over fake payloads
(real codecs stubbed — FIXTURES/multimodal contract in the task brief)."""

import pandas as pd
import pytest

from dataquality_spark.operators.multimodal import (
    decode_media, encode_fake_image, frame_sample_stub, resize_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", encode_fake_image(640, 480, 3)),
        (1, "image", encode_fake_image(64, 64, 1)),
        (2, "image", b"\x89PNG not really"),   # real codec → stubbed error
        (3, "image", None),                     # null payload
        (4, "image", b""),                      # empty payload
        (5, "video", encode_fake_image(320, 240, 3, payload_len=640)),
    ]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload"])
    return spark.createDataFrame(pdf)


def test_decode_metadata(spark, media):
    out = decode_media(media).toPandas().set_index("media_id").sort_index()
    assert (out.loc[0, "width"], out.loc[0, "height"], out.loc[0, "n_channels"]) == (640, 480, 3)
    assert out.loc[0, "ok"] and out.loc[0, "err"] is None
    assert (out.loc[1, "width"], out.loc[1, "n_channels"]) == (64, 1)
    assert not out.loc[2, "ok"] and "NotImplementedError" in out.loc[2, "err"]
    assert not out.loc[3, "ok"] and not out.loc[4, "ok"]
    assert out.loc[5, "ok"]
    assert out["n_bytes"].loc[0] == len(encode_fake_image(640, 480, 3))


def test_resize(spark, media):
    out = resize_stub(media, 100, 50).toPandas().set_index("media_id").sort_index()
    dec = decode_media(
        spark.createDataFrame(
            out.reset_index()[["media_id", "payload"]].assign(kind="image")
            .dropna(subset=["payload"]))
    ).toPandas().set_index("media_id")
    assert (dec["width"] == 100).all() and (dec["height"] == 50).all()
    assert out.loc[2, "payload"] is None and out.loc[2, "err"] is not None


def test_frame_sample(spark, media):
    out = frame_sample_stub(media, every_n=3).toPandas()
    v = out[out.media_id == 5]
    # 640+9 header bytes → 10 frames → samples at 0,3,6,9
    assert list(v["frame_idx"]) == [0, 3, 6, 9]


def test_ppm_bmp_roundtrip():
    """Pure-numpy codecs: encode→decode is pixel-exact for both formats,
    including BMP's bottom-up BGR padded rows (odd width forces padding)."""
    import numpy as np
    from dataquality_spark.operators.multimodal import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm, test_pixels)
    for w, h in [(7, 5), (16, 16), (33, 2)]:
        px = test_pixels(w, h)
        assert np.array_equal(decode_ppm(encode_ppm(px)), px)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    # PPM comments in the header parse
    px = test_pixels(3, 3)
    payload = encode_ppm(px)
    commented = b"P6\n# a comment\n3 3\n255\n" + payload.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(commented), px)


def test_decode_media_real_formats(spark):
    """decode_media reads real PPM/BMP dimensions; corrupt and
    PIL-needing payloads capture errors per row."""
    from dataquality_spark.operators.multimodal import (
        decode_media, encode_bmp, encode_ppm, test_pixels)
    rows = [
        (0, "image", encode_ppm(test_pixels(12, 8))),
        (1, "image", encode_bmp(test_pixels(9, 4))),
        (2, "image", b"\x89PNG\r\n\x1a\nxxxx"),   # needs PIL → err
        (3, "image", b"BM" + b"\x00" * 10),        # corrupt BMP → err
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = decode_media(df).toPandas().set_index("media_id").sort_index()
    assert (out.loc[0, "width"], out.loc[0, "height"]) == (12, 8)
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (9, 4)
    assert bool(out.loc[0, "ok"]) and bool(out.loc[1, "ok"])
    assert not bool(out.loc[2, "ok"]) and "NotImplementedError" in out.loc[2, "err"]
    assert not bool(out.loc[3, "ok"])


def test_resize_media_real_pixels(spark):
    """Resize really resamples: output decodes at the target geometry and
    equals the numpy nearest-neighbor reference."""
    import numpy as np
    from dataquality_spark.operators.multimodal import (
        decode_ppm, encode_bmp, encode_ppm, resize_media, resize_pixels,
        test_pixels)
    src_ppm, src_bmp = test_pixels(16, 12), test_pixels(10, 10)
    df = spark.createDataFrame(
        [(0, encode_ppm(src_ppm)), (1, encode_bmp(src_bmp))],
        "media_id long, payload binary")
    out = resize_media(df, 8, 6).toPandas().set_index("media_id").sort_index()
    assert out["err"].isna().all()
    got0 = decode_ppm(bytes(out.loc[0, "payload"]))
    assert got0.shape == (6, 8, 3)
    assert np.array_equal(got0, resize_pixels(src_ppm, 8, 6))
    got1 = decode_ppm(bytes(out.loc[1, "payload"]))
    assert np.array_equal(got1, resize_pixels(src_bmp, 8, 6))


def test_image_features_match_numpy(spark):
    import numpy as np
    from dataquality_spark.operators.multimodal import (
        encode_ppm, image_features, test_pixels)
    px = test_pixels(20, 10)
    df = spark.createDataFrame(
        [(0, encode_ppm(px)), (1, None)], "media_id long, payload binary")
    out = image_features(df).toPandas().set_index("media_id").sort_index()
    want = px.astype(np.float64).mean(axis=(0, 1))
    assert abs(out.loc[0, ["mean_r", "mean_g", "mean_b"]].to_numpy()
               - want).max() < 1e-9
    assert abs(out.loc[0, "std_gray"]
               - px.astype(np.float64).mean(axis=2).std()) < 1e-9
    assert out.loc[1, "err"] is not None


def test_wav_roundtrip_and_features(spark):
    """PCM16 WAV: sample-exact round-trip (mono + stereo, incl. an extra
    RIFF chunk before data); audio_features match numpy."""
    import numpy as np
    from dataquality_spark.operators.multimodal import (
        audio_features, decode_wav, encode_wav)
    t = np.arange(1600)
    mono = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    stereo = np.stack([mono, (mono // 2)], axis=1)
    got_m, rate_m = decode_wav(encode_wav(mono))
    assert rate_m == 16000 and np.array_equal(got_m[:, 0], mono)
    got_s, _ = decode_wav(encode_wav(stereo, sample_rate=8000))
    assert np.array_equal(got_s, stereo)
    # extra LIST chunk between fmt and data still parses
    raw = encode_wav(mono)
    extra = raw[:12] + raw[12:36] + b"LIST" + b"\x04\x00\x00\x00INFO" + raw[36:]
    got_e, _ = decode_wav(extra)
    assert np.array_equal(got_e[:, 0], mono)

    df = spark.createDataFrame(
        [(0, encode_wav(mono)), (1, encode_wav(stereo, sample_rate=8000)),
         (2, b"RIFFxxxx")],
        "media_id long, payload binary")
    out = audio_features(df).toPandas().set_index("media_id").sort_index()
    x = mono.astype(np.float64) / 32768.0
    assert abs(out.loc[0, "duration_s"] - 0.1) < 1e-9
    assert abs(out.loc[0, "rms"] - np.sqrt((x ** 2).mean())) < 1e-9
    assert out.loc[1, "n_channels"] == 2
    assert abs(out.loc[1, "duration_s"] - 0.2) < 1e-9
    assert out.loc[2, "err"] is not None
