"""Extraction pipeline tests using a tiny registered backbone + frame dirs
(ffmpeg-free path, matching the reference's frames->feats flow)."""

import numpy as np
import pytest
from PIL import Image

from flax import linen as nn
import jax.numpy as jnp

import s2vt_tpu.extract.backbones as bk
from s2vt_tpu.extract.pipeline import FeatureExtractor, extract
from s2vt_tpu.extract.video import read_frame_dir


class _TinyBackbone(nn.Module):
    compute_dtype = None

    @nn.compact
    def __call__(self, x):
        x = bk.Conv(8, (3, 3), (2, 2), (1, 1), name="conv")(x)
        return nn.relu(jnp.mean(x, axis=(1, 2)))


@pytest.fixture(autouse=True)
def tiny_backbone(monkeypatch):
    monkeypatch.setitem(
        bk.BACKBONE_SPECS, "tiny",
        (lambda cdt: _TinyBackbone(), 32, 8, bk.pp.IMAGENET_MEAN,
         bk.pp.IMAGENET_STD))


def _make_frame_dirs(root, n_clips=2, n_frames=12):
    rng = np.random.default_rng(0)
    for c in range(n_clips):
        d = root / f"clip{c:02d}"
        d.mkdir(parents=True)
        for f in range(n_frames):
            arr = rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{f:06d}.jpg")
    return root


def test_read_frame_dir_sorted(tmp_path):
    _make_frame_dirs(tmp_path, n_clips=1, n_frames=5)
    frames = read_frame_dir(tmp_path / "clip00")
    assert frames.shape == (5, 30, 40, 3) and frames.dtype == np.uint8


def test_extract_fix_mode(tmp_path):
    src = _make_frame_dirs(tmp_path / "videos")
    out = tmp_path / "feats"
    n = extract(str(src), str(out), model="tiny", mode="fix", frames_num=6)
    assert n == 2
    feats = np.load(out / "clip00.npy")
    assert feats.shape == (6, 8)
    assert np.isfinite(feats).all()


def test_extract_free_mode_pads_to_bucket(tmp_path):
    src = _make_frame_dirs(tmp_path / "videos", n_frames=11)
    out = tmp_path / "feats"
    extract(str(src), str(out), model="tiny", mode="free", interval=3)
    feats = np.load(out / "clip00.npy")
    # 11 frames, every 3rd -> indices 0,3,6,9 -> 4 features (padding stripped)
    assert feats.shape == (4, 8)


def test_extractor_deterministic(tmp_path):
    src = _make_frame_dirs(tmp_path / "videos", n_clips=1)
    ex = FeatureExtractor("tiny")
    frames = read_frame_dir(src / "clip00")
    a = ex(frames)
    b = ex(frames)
    np.testing.assert_array_equal(a, b)


def test_clip_batching_matches_per_clip(tmp_path):
    """clip_batch groups clips into one forward; features must be
    identical to the per-clip path, including the partial last group."""
    src = _make_frame_dirs(tmp_path / "videos", n_clips=5)
    out_b = tmp_path / "feats_batched"
    out_1 = tmp_path / "feats_serial"
    extract(str(src), str(out_b), model="tiny", mode="fix", frames_num=6,
            clip_batch=2)
    extract(str(src), str(out_1), model="tiny", mode="fix", frames_num=6,
            clip_batch=1)
    for c in range(5):
        a = np.load(out_b / f"clip{c:02d}.npy")
        b = np.load(out_1 / f"clip{c:02d}.npy")
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_clip_batching_mixed_resolutions(tmp_path):
    """Clips with different raw frame sizes fall back to per-clip forwards
    inside the group instead of failing to stack."""
    src = tmp_path / "videos"
    _make_frame_dirs(src, n_clips=1, n_frames=8)
    rng = np.random.default_rng(1)
    d = src / "clipBIG"
    d.mkdir()
    for f in range(8):
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{f:06d}.jpg")
    out = tmp_path / "feats"
    n = extract(str(src), str(out), model="tiny", mode="fix", frames_num=4,
                clip_batch=4)
    assert n == 2
    assert np.load(out / "clip00.npy").shape == (4, 8)
    assert np.load(out / "clipBIG.npy").shape == (4, 8)


def test_extract_overwrites(tmp_path):
    src = _make_frame_dirs(tmp_path / "videos")
    out = tmp_path / "feats"
    out.mkdir()
    (out / "stale.npy").write_bytes(b"x")
    extract(str(src), str(out), model="tiny", mode="fix", frames_num=4)
    assert not (out / "stale.npy").exists()


def test_mesh_extraction_matches_single_device(tmp_path):
    """FeatureExtractor over an 8-device dp mesh: identical features to
    single-device extraction (frames shard over the data axis)."""
    from s2vt_tpu.parallel import make_mesh

    src = _make_frame_dirs(tmp_path / "videos", n_clips=1, n_frames=16)
    frames = read_frame_dir(src / "clip00")  # 16 frames / 8 devices
    single = FeatureExtractor("tiny")(frames)
    sharded = FeatureExtractor("tiny", mesh=make_mesh())(frames)
    np.testing.assert_allclose(sharded, single, atol=1e-6)
