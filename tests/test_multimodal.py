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

def test_frame_sampling_fanout(spark):
    """One asset row fans out to every 3rd full 32-byte frame with
    exact slices and pts = idx/fps; short payloads emit nothing."""
    from prosearch_spark.ops.multimodal import sample_frames

    assets = synth_assets(spark, n=9)
    payloads = {r["asset_id"]: bytes(r["media"]) for r in assets.collect()}
    rows = sample_frames(assets, frame_bytes=32, every=3).collect()
    got = {(r["asset_id"], r["frame_idx"]): r for r in rows}
    for aid, p in payloads.items():
        n_frames = len(p) // 32
        exp_idx = list(range(0, n_frames, 3))
        have = sorted(i for a, i in got if a == aid)
        assert have == exp_idx, aid
        for i in exp_idx:
            r = got[(aid, i)]
            assert bytes(r["frame"]) == p[i * 32:(i + 1) * 32]
            assert r["pts"] == pytest.approx(round(i / 30.0, 6))


def test_resize_media_deterministic(spark):
    """Resize emits exactly width*height*3 deterministic bytes per
    asset (the target RGB buffer), keyed by payload AND target dims."""
    from prosearch_spark.ops.multimodal import resize_media

    assets = synth_assets(spark, n=6)
    payloads = {r["asset_id"]: bytes(r["media"]) for r in assets.collect()}
    rows = {r["asset_id"]: r
            for r in resize_media(assets, 8, 4).collect()}
    assert len(rows) == 6
    for aid, r in rows.items():
        assert (r["width"], r["height"]) == (8, 4)
        seed = hashlib.sha256(payloads[aid] + b"8x4").digest()
        exp = (seed * (96 // 32 + 1))[:96]
        assert bytes(r["media"]) == exp
    # different target dims -> different bytes
    r2 = {r["asset_id"]: bytes(r["media"])
          for r in resize_media(assets, 4, 8).collect()}
    assert all(r2[a] != bytes(rows[a]["media"]) for a in r2)


def test_frame_phash_matches_python_and_locality(spark):
    """The stub pHash is the documented window-sum: nibble_i =
    sum(window_i) % 16 packed little-nibble-first. Verify against a
    python twin, and verify the locality property the blocking relies
    on: one changed byte perturbs exactly one window => Hamming <= 4."""
    from prosearch_spark.ops.multimodal import frame_phash, sample_frames

    assets = synth_assets(spark, n=9)
    payloads = {r["asset_id"]: bytes(r["media"]) for r in assets.collect()}
    frames = sample_frames(assets, frame_bytes=32, every=3)
    got = {(r["asset_id"], r["frame_idx"]): r["phash"]
           for r in frame_phash(frames, frame_bytes=32).collect()}
    assert got

    def py_hash(fs: bytes) -> int:
        return sum((sum(fs[w * 4:(w + 1) * 4]) % 16) << (4 * w)
                   for w in range(8))

    for (aid, idx), h in got.items():
        fs = payloads[aid][idx * 32:(idx + 1) * 32]
        assert h == py_hash(fs), (aid, idx)

    # locality: flip one byte -> one window's nibble moves -> <= 4 bits
    fs = payloads[0][:32]
    mutated = bytes([fs[0] ^ 0xFF]) + fs[1:]
    d = py_hash(fs) ^ py_hash(mutated)
    assert bin(d).count("1") <= 4 and d != 0


def test_frame_near_dup_blocking_is_exact(spark):
    """Pigeonhole blocking (4 x 8-bit chunks over 32 bits) loses NO
    pair at max_hamming=3 < blocks=4: compare against brute-force
    all-pairs on the gate-scale frame set."""
    from itertools import combinations

    from prosearch_spark.ops.multimodal import (
        frame_near_dup,
        frame_phash,
        sample_frames,
    )

    assets = synth_assets(spark, n=24)
    hashed = frame_phash(sample_frames(assets, frame_bytes=32, every=3))
    sigs = {r["asset_id"] * (1 << 20) + r["frame_idx"]: r["phash"]
            for r in hashed.collect()}
    expected = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {(r["fid"], r["fid2"], r["hamming"])
           for r in frame_near_dup(hashed, max_hamming=3, blocks=4).collect()}
    assert got == expected and expected


def test_frame_phash_strict_raises(spark):
    from prosearch_spark.ops.multimodal import frame_phash, sample_frames

    assets = synth_assets(spark, n=2)
    with pytest.raises(Exception, match="no pixel decoder"):
        frame_phash(sample_frames(assets), strict=True).collect()


def test_frame_and_resize_strict_raise(spark):
    from prosearch_spark.ops.multimodal import resize_media, sample_frames

    assets = synth_assets(spark, n=2)
    with pytest.raises(Exception, match="no demuxer"):
        sample_frames(assets, strict=True).collect()
    with pytest.raises(Exception, match="no resampler"):
        resize_media(assets, 4, 4, strict=True).collect()
