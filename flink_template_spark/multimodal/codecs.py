"""Library-free REAL codecs for the multimodal decode seam.

Two production formats are fully decodable with nothing but the
standard library + numpy, so the engine ships REAL decoders for them —
the `decode_stub` seam (features.py) now only covers formats that
genuinely need codec libraries (JPEG/PNG/MP4/FLAC...):

- **WAV (RIFF PCM)**: chunked RIFF container, 16-bit little-endian PCM
  — `struct` header walk + `np.frombuffer`. This is the actual on-disk
  format, not a stand-in: payloads produced by any DAW/ffmpeg with
  `pcm_s16le` decode here.
- **PPM (netpbm P6, 8-bit)**: ASCII header + raw RGB bytes — the
  classic interchange format every image tool can emit
  (`ffmpeg -i x.png x.ppm`, ImageMagick `convert`).

Both directions are implemented (encode for test/fixture synthesis,
decode for the pipeline), plus the two feature kernels the queries
need: audio summary stats (duration/RMS/zero-crossing/peak — the
standard clip-level triage features) and exact area-average image
resize for integer factors (the antialias-correct downsample).

Scale posture: decoding runs inside `mapInPandas`/`mapInArrow` batches
(features.py) — one Python crossing, Arrow-batched, per-partition
parallel; nothing here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np


# --- WAV (RIFF PCM s16le) ---------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → canonical 44-byte-header RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float64 samples in [-1, 1], sample_rate).

    Walks the chunk list (real WAV files carry LIST/INFO/fact chunks
    between fmt and data), accepts only format tag 1 (integer PCM)
    with 16-bit mono/stereo; stereo is averaged to mono. Raises
    ValueError on anything else — a loud seam, like the range guards
    elsewhere, never silent garbage."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
        elif cid == b"data":
            if len(body) != clen:
                # a partially-uploaded file (header intact, tail missing)
                # must fail LOUDLY — a short even-length slice would
                # otherwise decode "successfully" with silently wrong
                # duration/RMS (r7 review)
                raise ValueError("WAV data chunk truncated")
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if rate <= 0:
        raise ValueError(f"invalid WAV sample rate {rate}")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits} (16-bit only)")
    s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if channels == 2:
        s = s.reshape(-1, 2).mean(axis=1)
    elif channels != 1:
        raise ValueError(f"unsupported WAV channel count {channels}")
    return s, rate


def wav_features(payload: bytes) -> dict:
    """Clip-level triage features: duration, RMS level, zero-crossing
    rate (per second — the cheap pitch/noisiness proxy), peak."""
    s, rate = decode_wav(payload)
    if s.size == 0:
        return {"duration_s": 0.0, "rms": 0.0, "zcr_per_s": 0.0, "peak": 0.0}
    dur = s.size / rate
    zc = int(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1])))
    return {
        "duration_s": dur,
        "rms": float(np.sqrt(np.mean(s * s))),
        "zcr_per_s": zc / dur,
        "peak": float(np.max(np.abs(s))),
    }


# --- PPM (netpbm P6, maxval 255) ---------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (H, W, 3) array → binary P6 bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("P6 is RGB: need (H, W, 3)")
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 bytes → uint8 (H, W, 3). Handles comment lines and
    arbitrary whitespace in the header (the spec allows both)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("PPM raster truncated")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_area(pixels: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Exact area-average downsample by integer factors (fy, fx) —
    each output pixel is the mean of its fy×fx source block (the
    antialias-correct reduction; ties round half-to-even via numpy's
    float mean → uint8 round trip)."""
    h, w, c = pixels.shape
    if h % fy or w % fx:
        raise ValueError("dimensions must divide the factors")
    blocks = pixels.astype(np.float64).reshape(h // fy, fy, w // fx, fx, c)
    return np.rint(blocks.mean(axis=(1, 3))).astype(np.uint8)


def ppm_features(payload: bytes) -> dict:
    """Per-channel means/stds + luma stats — the standard cheap image
    quality/exposure triage."""
    px = decode_ppm(payload).astype(np.float64)
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    return {
        "height": px.shape[0],
        "width": px.shape[1],
        "mean_r": float(px[..., 0].mean()),
        "mean_g": float(px[..., 1].mean()),
        "mean_b": float(px[..., 2].mean()),
        "luma_mean": float(luma.mean()),
        "luma_std": float(luma.std()),
    }


# --- dispatch -----------------------------------------------------------------

def sniff(payload: bytes) -> str | None:
    """Container sniffing by magic bytes: 'wav' | 'ppm' | None.

    RIFF alone is NOT wav — WebP/AVI are RIFF containers too (r7
    review: a WebP payload sniffed as wav, crashed decode_wav, and got
    quarantined as corrupt instead of passing through as opaque); the
    form type at bytes 8..12 must be WAVE. P6 must be followed by
    whitespace or a comment, or 'P6x...' text would misfire."""
    if payload is None:
        return None
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if (
        len(payload) > 2
        and payload[:2] == b"P6"
        and (payload[2:3].isspace() or payload[2:3] == b"#")
    ):
        return "ppm"
    return None


def real_decode(media_type: str, payload: bytes, meta: dict | None = None) -> np.ndarray:
    """The upgraded decode seam: REAL decode for WAV/PPM payloads
    (returns float64 samples / uint8 pixels); everything else still
    raises via features.decode_stub — the remaining codec-library
    formats are a documented seam, not a silent fake."""
    kind = sniff(payload)
    if kind == "wav":
        return decode_wav(payload)[0]
    if kind == "ppm":
        return decode_ppm(payload)
    from flink_template_spark.multimodal.features import decode_stub

    return decode_stub(media_type, payload, meta or {})
