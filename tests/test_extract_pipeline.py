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


def test_extract_overwrites(tmp_path):
    src = _make_frame_dirs(tmp_path / "videos")
    out = tmp_path / "feats"
    out.mkdir()
    (out / "stale.npy").write_bytes(b"x")
    extract(str(src), str(out), model="tiny", mode="fix", frames_num=4)
    assert not (out / "stale.npy").exists()
