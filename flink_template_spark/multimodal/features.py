"""Multimodal decode / feature-extraction over binary payloads.

The Spark-side contract is the real thing — schema, Arrow batching,
partition behavior — while the innermost decode call is a seam:

- ``decode_stub(media_type, payload, meta)``: raises NotImplementedError
  for real codecs (no image/audio libs in this container), marking
  exactly where PIL / torchaudio / pyav would plug in;
- ``fake_decode``: the deterministic stand-in used by tests and the
  feature queries — parses the payload bytes themselves (byte histogram,
  moments), so results are reproducible anywhere.

Everything crosses the Python boundary once, Arrow-batched, via
``mapInPandas``; feature vectors come back as fixed-width
``array<double>`` rows ready for the vector operators
(operators.similarity) downstream. No driver-side collection anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

N_FEATURES = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_stub(media_type: str, payload: bytes, meta: dict) -> np.ndarray:
    """The real-decoder seam. In production this dispatches to
    PIL.Image.open / soundfile.read / av.open and returns decoded
    samples; those libraries are not available in this container."""
    raise NotImplementedError(
        f"real {media_type} decoding requires codec libraries not present "
        "in this environment; use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: 16-bin byte histogram, density-
    normalized. Same output for the same bytes on any platform."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(N_FEATURES, dtype=np.float64)
    hist, _ = np.histogram(arr, bins=N_FEATURES, range=(0, 256))
    return hist.astype(np.float64) / arr.size


def extract_features(assets: DataFrame) -> DataFrame:
    """(asset_id, media_type, payload, meta) → fixed-width feature rows.

    One Arrow-batched pass; each input partition maps independently, so
    the operator scales linearly with partitions and never shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": [f.tolist() for f in feats],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def extract_features_arrow(assets: DataFrame) -> DataFrame:
    """``mapInArrow`` dual of :func:`extract_features`: batches stay in
    Arrow RecordBatch form end-to-end, so the binary payload column is
    processed from Arrow buffers without materializing Python ``bytes``
    objects per row (pandas conversion copies every payload into the
    Python heap — measurable overhead when payloads are MBs). Identical
    output; the parity test pins the two paths to each other."""
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            payload = batch.column(batch.schema.get_field_index("payload"))
            feats = pa.array(
                [fake_decode(buf.as_py()) for buf in payload],
                type=pa.list_(pa.float64()),
            )
            n_bytes = pa.array(
                [len(buf.as_py()) for buf in payload], type=pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("asset_id")).cast(
                        pa.int64()
                    ),
                    batch.column(batch.schema.get_field_index("media_type")),
                    n_bytes,
                    feats,
                ],
                names=["asset_id", "media_type", "n_bytes", "features"],
            )

    return assets.mapInArrow(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def fake_resize(payload: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int) -> bytes:
    """Deterministic stand-in resize kernel: treat the payload as a
    row-major src_h×src_w u8 raster (tiled/truncated to size) and
    nearest-neighbor sample it to dst_h×dst_w. Platform-independent:
    pure integer index math on the input bytes."""
    need = src_w * src_h
    arr = np.frombuffer(payload, dtype=np.uint8)
    raster = np.resize(arr if arr.size else np.zeros(1, np.uint8), need).reshape(
        src_h, src_w
    )
    ys = (np.arange(dst_h) * src_h) // dst_h
    xs = (np.arange(dst_w) * src_w) // dst_w
    return raster[np.ix_(ys, xs)].tobytes()


def resize_assets(assets: DataFrame, dst_w: int, dst_h: int) -> DataFrame:
    """Image-asset resize over ``mapInPandas`` — same seam contract as
    extract_features: the Spark plumbing (schema, Arrow batching, meta
    rewrite, pass-through of non-image rows) is real; the pixel kernel
    is ``fake_resize`` where PIL's ``Image.resize`` would slot in.

    Non-image rows pass through untouched (payload and meta intact) so
    the operator composes into a mixed-modality pipeline without a
    prior split+union."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for _, r in pdf.iterrows():
                meta = dict(r["meta"]) if r["meta"] is not None else {}
                if r["media_type"] == "image" and meta.get("width"):
                    out_payload.append(
                        fake_resize(
                            bytes(r["payload"]),
                            int(meta["width"]),
                            int(meta["height"]),
                            dst_w,
                            dst_h,
                        )
                    )
                    meta = {**meta, "width": dst_w, "height": dst_h}
                else:
                    out_payload.append(bytes(r["payload"]))
                out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return assets.mapInPandas(run, RESIZE_SCHEMA)


MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr_per_s", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("luma_mean", T.DoubleType()),
        T.StructField("luma_std", T.DoubleType()),
    ]
)


def extract_media_stats(assets: DataFrame) -> DataFrame:
    """REAL-decode feature extraction for the two library-free formats
    (multimodal.codecs): WAV payloads yield clip stats (duration, RMS,
    zero-crossing rate, peak), PPM payloads yield image stats
    (dimensions, channel/luma moments); unrecognized containers pass
    through with kind='opaque' and NULL stats — never a silent fake
    and never a job-killing raise on mixed corpora (a corrupt payload
    in 100 TB must surface as a NULL row to quarantine, not abort the
    cluster).

    Same execution contract as extract_features: one Arrow-batched
    Python crossing via mapInPandas, per-partition parallel, no
    shuffle, no driver collection."""
    from flink_template_spark.multimodal.codecs import (
        ppm_features,
        sniff,
        wav_features,
    )

    cols = [f.name for f in MEDIA_STATS_SCHEMA.fields]

    def one(asset_id: int, payload: bytes) -> dict:
        row = dict.fromkeys(cols)
        row["asset_id"] = asset_id
        kind = sniff(payload)
        # quarantine catches EVERYTHING a malformed body can raise —
        # struct.error on a short fmt chunk, TypeError on odd buffer
        # shapes, not just ValueError (r7 review: a narrower catch let
        # struct.error abort the whole job, violating this function's
        # own never-raise contract)
        try:
            if kind == "wav":
                row.update(wav_features(payload))
                row["kind"] = "wav"
            elif kind == "ppm":
                f = ppm_features(payload)
                row.update(
                    height=f["height"],
                    width=f["width"],
                    luma_mean=f["luma_mean"],
                    luma_std=f["luma_std"],
                )
                row["kind"] = "ppm"
            else:
                row["kind"] = "opaque"
        except Exception:
            row["kind"] = "corrupt"  # sniffed container, bad body
        return row

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                one(a, p) for a, p in zip(pdf["asset_id"], pdf["payload"])
            ]
            out = pd.DataFrame(rows, columns=cols)
            out["asset_id"] = out["asset_id"].astype("int64")
            yield out

    return assets.mapInPandas(run, MEDIA_STATS_SCHEMA)


PCM16_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("n_zero_cross", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
    ]
)


def pcm16_features(assets: DataFrame) -> DataFrame:
    """Raw-PCM (s16le) clip statistics over opaque binary payloads:
    per asset the sample count, the exact integer sum of squared
    samples (the RMS sufficient statistic), the zero-crossing count
    (sign flips between consecutive samples; 0 counts as non-negative)
    and the peak magnitude — the triage features an audio-curation
    pass computes BEFORE any codec is involved, since production
    pipelines hold decoded PCM exactly in this fixed-width-integer
    byte convention. Container parsing (RIFF headers etc.) lives in
    multimodal.codecs.decode_wav; this operator is the at-scale
    sample-math layer under it.

    One Arrow-batched ``mapInPandas`` pass, numpy ``<i2``
    reinterpretation per payload (a trailing odd byte is dropped —
    floor(n/2) samples); every returned statistic is an exact int64 in
    any batch/partition split, so the whole path is oracle-checkable
    against a pure-SQL hex-pair recomputation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"].astype("int64"),
                "n_samples": [],
                "sum_sq": [],
                "n_zero_cross": [],
                "peak_abs": [],
            }
            for p in pdf["payload"]:
                s = np.frombuffer(
                    p[: len(p) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                out["n_samples"].append(s.size)
                out["sum_sq"].append(int((s * s).sum()) if s.size else 0)
                neg = s < 0
                out["n_zero_cross"].append(
                    int(np.count_nonzero(neg[1:] != neg[:-1]))
                    if s.size > 1
                    else 0
                )
                out["peak_abs"].append(int(np.abs(s).max()) if s.size else 0)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, PCM16_SCHEMA)
