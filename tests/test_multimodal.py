"""Multimodal pipeline: asset synthesis, binary plumbing, and the
Arrow-batched decode/feature seam (SURVEY.md §2.7 north-star)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_template_spark.multimodal.assets import load_assets
from flink_template_spark.multimodal.features import (
    N_FEATURES,
    decode_stub,
    extract_features,
    fake_decode,
)


def test_decode_stub_is_marked_unimplemented():
    with pytest.raises(NotImplementedError):
        decode_stub("image", b"\x89PNG", {})


def test_fake_decode_golden():
    # 4 bytes: 0x00 0x10 0xFF 0xFF → bins 0 (2 incl. 0x10<16) … wait:
    # bin width = 256/16 = 16; 0x00→bin0, 0x10→bin1, 0xFF→bin15 (×2).
    f = fake_decode(bytes([0x00, 0x10, 0xFF, 0xFF]))
    assert f.shape == (N_FEATURES,)
    assert f[0] == 0.25 and f[1] == 0.25 and f[15] == 0.5
    assert np.isclose(f.sum(), 1.0)
    assert (fake_decode(b"") == np.zeros(N_FEATURES)).all()


def test_assets_schema_and_determinism(spark, sf_dir):
    assets = load_assets(spark, sf_dir)
    row = assets.filter("asset_id = 3").first()
    assert row.media_type == "image"  # 3 % 3 == 0 → index 1
    assert isinstance(row.payload, bytearray | bytes)
    assert row.meta.width == 3 % 192 + 64
    assert row.meta.sample_rate is None  # not audio
    audio = assets.filter("media_type = 'audio'").first()
    assert audio.meta.sample_rate == 16000 and audio.meta.width is None


def test_extract_features_end_to_end(spark, sf_dir):
    assets = load_assets(spark, sf_dir).limit(20)
    out = extract_features(assets).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.features) == N_FEATURES
        assert r.n_bytes > 0
        # density normalization survives the Arrow round-trip
        assert abs(sum(r.features) - 1.0) < 1e-9
    # cross-check one row against the local fake decoder
    a3 = assets.filter("asset_id = 3").first()
    r3 = [r for r in out if r.asset_id == 3][0]
    assert np.allclose(r3.features, fake_decode(bytes(a3.payload)))


def test_feature_extraction_arrow_parity(spark, sf_dir):
    """mapInArrow and mapInPandas feature extraction agree row-for-row."""
    from flink_template_spark.multimodal.assets import load_assets
    from flink_template_spark.multimodal.features import (
        extract_features,
        extract_features_arrow,
    )

    assets = load_assets(spark, sf_dir).limit(200)
    a = extract_features(assets)
    b = extract_features_arrow(assets)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_resize_assets(spark, sf_dir):
    """Image rows are resized (payload = dst_w*dst_h bytes, meta
    rewritten); audio/video rows pass through byte-identical; the kernel
    is deterministic."""
    import numpy as np

    from flink_template_spark.multimodal.assets import load_assets
    from flink_template_spark.multimodal.features import fake_resize, resize_assets

    assets = load_assets(spark, sf_dir).limit(120)
    out = resize_assets(assets, 32, 16)
    rows = {r.asset_id: r for r in out.collect()}
    orig = {r.asset_id: r for r in assets.collect()}
    assert set(rows) == set(orig)
    n_img = 0
    for aid, r in rows.items():
        o = orig[aid]
        if o.media_type == "image":
            n_img += 1
            assert len(bytes(r.payload)) == 32 * 16
            assert (r.meta.width, r.meta.height) == (32, 16)
            assert bytes(r.payload) == fake_resize(
                bytes(o.payload), o.meta.width, o.meta.height, 32, 16
            )
        else:
            assert bytes(r.payload) == bytes(o.payload)
            assert r.meta == o.meta
    assert n_img > 0
    # deterministic across runs
    again = {r.asset_id: bytes(r.payload) for r in resize_assets(assets, 32, 16).collect()}
    assert all(again[a] == bytes(r.payload) for a, r in rows.items())
