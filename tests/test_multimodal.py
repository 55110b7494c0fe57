"""Multimodal plumbing: schema, batch shape, deterministic fake decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from stash_log_parser_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(spark, n=30, seed=42).cache()


def test_feature_extraction_schema_and_counts(media):
    feats = M.extract_features(media)
    assert feats.schema == M.FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.feature) == M.FEATURE_DIM
        assert r.n_bytes > 0
        assert r.thumb_w <= 32 and r.thumb_h <= 32


def test_fake_decoder_deterministic(media):
    a = {r.media_id: tuple(r.feature) for r in M.extract_features(media).collect()}
    b = {r.media_id: tuple(r.feature) for r in M.extract_features(media).collect()}
    assert a == b
    # and matches the local function on the same payload
    row = media.filter(F.col("media_id") == "m00000").collect()[0]
    expect = M.fake_decoder(bytes(row.payload))
    assert np.allclose(a["m00000"], expect, atol=1e-6)


def test_auto_probe_falls_back_to_fake_without_pil(media):
    """Default 'auto' mode: with no PIL in the container the probe
    returns None and output equals the pinned fake-decoder path, so the
    committed golden is decoder-environment-independent here."""
    assert M.probe_real_decoder() is None  # no media libs in this sandbox
    auto = {r.media_id: tuple(r.feature) for r in M.extract_features(media).collect()}
    fake = {
        r.media_id: tuple(r.feature)
        for r in M.extract_features(media, use_real_decoder=False).collect()
    }
    assert auto == fake


def test_probe_uses_pil_when_importable():
    """Driver-side unit check of the self-upgrade path: inject a minimal
    fake PIL and the probe returns a working image decoder (4×4 grayscale
    → 16-dim [0,1] feature) that still refuses non-image kinds."""
    import sys
    import types

    class _FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            assert wh == (4, 4)
            return np.arange(16, dtype=np.uint8).reshape(4, 4)

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda bio: _FakeImg()
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    sys.modules["PIL"] = pil_mod
    sys.modules["PIL.Image"] = image_mod
    try:
        d = M.probe_real_decoder()
        assert d is not None
        out = d(b"\x89PNG...", "image")
        assert out.shape == (16,)
        assert np.allclose(out, np.arange(16, dtype=np.float32) / 255.0)
        with pytest.raises(NotImplementedError):
            d(b"", "audio")
    finally:
        del sys.modules["PIL"]
        del sys.modules["PIL.Image"]
    assert M.probe_real_decoder() is None  # probe is stateless


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(Exception) as e:
        M.extract_features(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


def test_frame_sampling(media):
    frames = M.sample_frames(media, every_n=10)
    rows = frames.collect()
    assert all(r.frame_index % 10 == 0 for r in rows)
    vid = media.filter("kind = 'video' and n_frames >= 11").count()
    multi = frames.groupBy("media_id").count().filter("count > 1").count()
    assert multi == vid


def test_payload_not_carried_past_feature_stage(media):
    assert "payload" not in M.extract_features(media).columns


def test_resize_emits_new_binary_payload(media):
    """Binary-out plumbing: the resized payload is a REAL (smaller)
    binary column whose bytes follow the declared nearest-neighbor
    byte-resample rule."""
    import numpy as np

    out = {r.media_id: r for r in M.resize_media(media, target=(8, 8)).collect()}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        b = src[mid]
        n_out = min(64, len(b))
        idx = np.linspace(0, len(b) - 1, num=n_out).astype(np.int64)
        assert bytes(r.payload) == np.frombuffer(b, dtype=np.uint8)[idx].tobytes()
        assert r.n_bytes == n_out and (r.width, r.height) == (8, 8)


def test_resize_deterministic(media):
    a = sorted((r.media_id, bytes(r.payload)) for r in M.resize_media(media).collect())
    b = sorted((r.media_id, bytes(r.payload)) for r in M.resize_media(media).collect())
    assert a == b


def test_resize_real_decoder_is_explicit_stub(media):
    with pytest.raises(Exception) as e:
        M.resize_media(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )
