"""Multimodal plumbing: Arrow batch shapes, integrity columns,
deterministic stub features, strict-mode NotImplementedError."""

from __future__ import annotations

import hashlib

import pytest

from prosearch_spark.ops.multimodal import (
    FEATURE_DIM,
    extract_features,
    synth_assets,
)


def test_feature_extraction_roundtrip(spark):
    assets = synth_assets(spark, n=12)
    rows = {r["asset_id"]: r for r in extract_features(assets).collect()}
    payloads = {r["asset_id"]: bytes(r["media"]) for r in assets.collect()}
    assert len(rows) == 12
    for aid, r in rows.items():
        p = payloads[aid]
        assert r["n_bytes"] == len(p) > 0
        assert r["sha256"] == hashlib.sha256(p).hexdigest()
        exp = [b / 255.0 for b in hashlib.sha256(p).digest()[:FEATURE_DIM]]
        assert r["feature"] == pytest.approx(exp, abs=1e-6)


def test_kinds_round_robin(spark):
    kinds = {r["asset_id"]: r["kind"]
             for r in extract_features(synth_assets(spark, n=6)).collect()}
    assert kinds[0] == "image" and kinds[1] == "audio" and kinds[2] == "video"


def test_strict_mode_raises(spark):
    assets = synth_assets(spark, n=3)
    with pytest.raises(Exception) as ei:
        extract_features(assets, strict=True).collect()
    assert "no codec for kind" in str(ei.value)
