"""Real library-free codecs (multimodal.codecs): WAV/PPM round-trips,
closed-form feature values, loud failures on malformed payloads, and
the Spark mapInPandas extraction over a mixed real-payload corpus."""

from __future__ import annotations

import math

import numpy as np
import pytest

from flink_template_spark.multimodal.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    ppm_features,
    resize_area,
    sniff,
    wav_features,
)


def _sine(freq=440.0, rate=16000, seconds=0.5, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return np.round(amp * 32767 * np.sin(2 * math.pi * freq * t)).astype(np.int16)


def test_wav_roundtrip_and_closed_form_features():
    s = _sine()
    payload = encode_wav(s, 16000)
    dec, rate = decode_wav(payload)
    assert rate == 16000 and dec.size == s.size
    np.testing.assert_allclose(dec, s / 32768.0, atol=0)  # bit-exact

    f = wav_features(payload)
    assert abs(f["duration_s"] - 0.5) < 1e-9
    # RMS of a sine = amp/sqrt(2); quantization keeps it within 1e-3
    assert abs(f["rms"] - 0.5 / math.sqrt(2)) < 1e-3
    # a 440 Hz sine crosses zero 2*440 times per second
    assert abs(f["zcr_per_s"] - 880) <= 4
    assert 0.49 < f["peak"] <= 0.5


def test_wav_stereo_averages_and_chunk_walk():
    """Stereo + an interleaved LIST chunk between fmt and data (real
    encoders emit these) must still decode; stereo collapses to the
    channel mean."""
    import struct

    left = np.array([1000, -1000, 2000], dtype="<i2")
    right = np.array([3000, 1000, 0], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    data = inter.tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = fmt + junk + b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    dec, rate = decode_wav(payload)
    np.testing.assert_allclose(dec * 32768.0, (left + right) / 2.0)


def test_wav_loud_failures():
    s = _sine(seconds=0.01)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"garbage")
    payload = bytearray(encode_wav(s, 16000))
    payload[20] = 3  # format tag -> IEEE float
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(payload))


def test_ppm_roundtrip_comments_and_exact_area_resize():
    h, w = 4, 6
    px = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    payload = encode_ppm(px)
    np.testing.assert_array_equal(decode_ppm(payload), px)

    # header comments are legal and must parse
    commented = b"P6\n# made by hand\n6 4\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_ppm(commented), px)

    small = resize_area(px, 2, 3)
    assert small.shape == (2, 2, 3)
    # hand value: mean of the top-left 2x3 block, channel 0
    block = px[0:2, 0:3, 0].astype(float).mean()
    assert small[0, 0, 0] == round(block)

    f = ppm_features(payload)
    assert (f["height"], f["width"]) == (h, w)
    assert abs(f["mean_r"] - px[..., 0].mean()) < 1e-12


def test_ppm_loud_failures():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n2 2\n255\n" + bytes(4))
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(px)[:-5])


def test_spark_media_stats_over_mixed_real_payloads(spark):
    """End-to-end over the Arrow-batched operator: real WAV + real PPM
    + an opaque payload + a corrupt (truncated) PPM in one DataFrame —
    each row lands in the right branch with values matching the local
    kernels; corruption quarantines as a row, never aborts the job."""
    from flink_template_spark.multimodal.features import extract_media_stats

    wav = encode_wav(_sine(), 16000)
    px = (np.indices((8, 12)).sum(axis=0) % 256).astype(np.uint8)
    ppm = encode_ppm(np.stack([px, px, px], axis=-1))
    rows = [
        (1, "audio", bytearray(wav)),
        (2, "image", bytearray(ppm)),
        (3, "video", bytearray(b"\x00\x01\x02 opaque container")),
        (4, "image", bytearray(ppm[:-7])),  # truncated raster
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r for r in extract_media_stats(assets).collect()}
    assert got[1]["kind"] == "wav"
    assert abs(got[1]["rms"] - wav_features(wav)["rms"]) < 1e-12
    assert got[1]["height"] is None
    assert got[2]["kind"] == "ppm"
    assert (got[2]["height"], got[2]["width"]) == (8, 12)
    assert abs(got[2]["luma_mean"] - ppm_features(ppm)["luma_mean"]) < 1e-12
    assert got[2]["rms"] is None
    assert got[3]["kind"] == "opaque" and got[3]["rms"] is None
    assert got[4]["kind"] == "corrupt" and got[4]["luma_mean"] is None


def test_sniff_rejects_webp_and_p6_text(spark):
    """r7 review: RIFF alone is not WAV (WebP/AVI are RIFF too) and
    'P6' needs following whitespace — both must sniff None and flow to
    the opaque branch, not crash or land in corrupt."""
    import struct

    from flink_template_spark.multimodal.features import extract_media_stats

    webp = b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 " + bytes(8)
    rows = [
        (1, "image", bytearray(webp)),
        (2, "text", bytearray(b"P6xxx not an image")),
        (3, "audio", bytearray()),  # empty payload
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r["kind"] for r in extract_media_stats(assets).collect()}
    assert got == {1: "opaque", 2: "opaque", 3: "opaque"}


def test_malformed_wav_bodies_quarantine_not_abort(spark):
    """r7 review: struct.error (short fmt), truncated data chunk, and
    zero sample rate must all land as kind='corrupt' rows — none may
    escape the batch and abort the job."""
    import struct

    from flink_template_spark.multimodal.features import extract_media_stats

    def riff(body):
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    short_fmt = riff(b"fmt " + struct.pack("<I", 4) + bytes(4))
    truncated = bytearray(encode_wav(_sine(seconds=0.01), 16000))[:-3]
    zero_rate = bytearray(encode_wav(_sine(seconds=0.01), 16000))
    zero_rate[24:28] = struct.pack("<I", 0)
    rows = [
        (1, "audio", bytearray(short_fmt)),
        (2, "audio", bytearray(truncated)),
        (3, "audio", zero_rate),
        (4, "audio", bytearray(encode_wav(_sine(seconds=0.01), 16000))),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    got = {r["asset_id"]: r["kind"] for r in extract_media_stats(assets).collect()}
    assert got == {1: "corrupt", 2: "corrupt", 3: "corrupt", 4: "wav"}
