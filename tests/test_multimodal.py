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
