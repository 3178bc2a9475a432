"""Native C++ prefetching loader: bit-exactness vs numpy, epoch reuse,
partial batches, and VideoDataset backend parity."""

import numpy as np
import pytest

from s2vt_tpu.data import make_synthetic_corpus
from s2vt_tpu.data.dataset import VideoDataset
from s2vt_tpu.data.native_loader import (NativeFeatureLoader, build_native,
                                         native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


@pytest.fixture(scope="module")
def feat_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("feats")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(7):
        a = rng.normal(size=(10, 16)).astype(np.float32)
        p = root / f"clip{i}.npy"
        np.save(p, a)
        paths.append(str(p))
        arrays.append(a)
    return paths, arrays


def test_build():
    assert build_native().exists()


def test_batches_bit_exact(feat_files):
    paths, arrays = feat_files
    loader = NativeFeatureLoader(paths, 10, 16, n_threads=3, queue_depth=2)
    order = [3, 0, 6, 2, 5, 1, 4]
    got = list(loader.iter_batches(order, batch=3))
    assert len(got) == 3
    flat = np.concatenate(got)[:len(order)]
    want = np.stack([arrays[i] for i in order])
    np.testing.assert_array_equal(flat, want)
    # padded tail rows are zero
    np.testing.assert_array_equal(got[-1][1:], 0.0)


def test_epoch_reuse_different_order(feat_files):
    paths, arrays = feat_files
    loader = NativeFeatureLoader(paths, 10, 16)
    for order in ([0, 1, 2, 3], [3, 2, 1, 0], [6, 5]):
        got = np.concatenate(list(loader.iter_batches(order, batch=2)))
        want = np.stack([arrays[i] for i in order])
        np.testing.assert_array_equal(got[:len(order)], want)


def test_truncates_longer_files(tmp_path):
    a = np.arange(12 * 4, dtype=np.float32).reshape(12, 4)
    np.save(tmp_path / "x.npy", a)
    loader = NativeFeatureLoader([str(tmp_path / "x.npy")], 8, 4)
    got = next(loader.iter_batches([0], 1))
    np.testing.assert_array_equal(got[0], a[:8])


def test_pads_shorter_files(tmp_path):
    a = np.ones((3, 4), np.float32)
    np.save(tmp_path / "x.npy", a)
    loader = NativeFeatureLoader([str(tmp_path / "x.npy")], 8, 4)
    got = next(loader.iter_batches([0], 1))
    np.testing.assert_array_equal(got[0, :3], 1.0)
    np.testing.assert_array_equal(got[0, 3:], 0.0)


def test_videodataset_backend_parity(tmp_path):
    corpus = make_synthetic_corpus(str(tmp_path), n_videos=8, feat_len=10,
                                   feat_dim=12, seed=5)
    kw = dict(captions_file=corpus["captions_file"],
              feat_path=corpus["feat_path"], max_len=10, mode="train", seed=0)
    ds_np = VideoDataset(backend="numpy", **kw)
    ds_nat = VideoDataset(backend="native", **kw)
    assert ds_np.backend == "numpy" and ds_nat.backend == "native"
    for epoch in range(2):
        for a, b in zip(ds_np.batches(3, epoch=epoch),
                        ds_nat.batches(3, epoch=epoch)):
            np.testing.assert_array_equal(a.feats, b.feats)
            np.testing.assert_array_equal(a.labels, b.labels)
            np.testing.assert_array_equal(a.valid, b.valid)
            assert a.ids == b.ids


def test_failure_raises(tmp_path):
    good = np.ones((4, 3), np.float32)
    np.save(tmp_path / "good.npy", good)
    (tmp_path / "bad.npy").write_bytes(b"not an npy file")
    loader = NativeFeatureLoader([str(tmp_path / "good.npy"),
                                  str(tmp_path / "bad.npy")], 4, 3)
    with pytest.raises(RuntimeError, match="failed to load"):
        list(loader.iter_batches([0, 1], batch=2))


def test_wrong_dtype_raises(tmp_path):
    np.save(tmp_path / "f64.npy", np.ones((4, 3), np.float64))
    loader = NativeFeatureLoader([str(tmp_path / "f64.npy")], 4, 3)
    with pytest.raises(RuntimeError, match="failed to load"):
        list(loader.iter_batches([0], batch=1))


def test_abandoned_epoch_then_new_epoch(feat_files):
    """Breaking out of an epoch mid-way must not corrupt the next one
    (begin() waits for the worker pool to quiesce)."""
    paths, arrays = feat_files
    loader = NativeFeatureLoader(paths, 10, 16, n_threads=3, queue_depth=2)
    for trial in range(5):
        it = loader.iter_batches([0, 1, 2, 3, 4, 5], batch=2)
        next(it)          # consume one batch
        it.close()        # abandon the epoch mid-flight
        order = [5, 4, 3]
        got = np.concatenate(list(loader.iter_batches(order, batch=2)))
        want = np.stack([arrays[i] for i in order])
        np.testing.assert_array_equal(got[:3], want)


def test_abandoned_generator_still_referenced(feat_files):
    """ADVICE r1: a suspended old-epoch generator the caller still holds
    must neither block the next epoch nor steal its batches — it just
    stops when resumed."""
    paths, arrays = feat_files
    loader = NativeFeatureLoader(paths, 10, 16, n_threads=3, queue_depth=2)
    stale = loader.iter_batches([0, 1, 2, 3, 4, 5], batch=2)
    next(stale)  # suspend at yield, never closed
    order = [5, 4, 3]
    fresh = loader.iter_batches(order, batch=2)  # no 'in flight' raise
    first = next(fresh)  # starting the new epoch supersedes the stale one
    assert list(stale) == []  # resumed stale generator ends immediately
    got = np.concatenate([first] + list(fresh))
    np.testing.assert_array_equal(
        got[:3], np.stack([arrays[i] for i in order]))


def test_dataset_break_mid_epoch_native(tmp_path):
    """VideoDataset.batches abandoned with `break` -> next epoch is clean."""
    corpus = make_synthetic_corpus(str(tmp_path), n_videos=8, feat_len=10,
                                   feat_dim=12, seed=5)
    ds = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                      max_len=10, mode="train", seed=0, backend="native")
    old_gen = ds.batches(3, epoch=0)
    next(old_gen)  # consume one batch, keep the generator referenced
    full = list(ds.batches(3, epoch=1))
    assert len(full) == ds.steps_per_epoch(3)


def test_auto_backend_falls_back_on_incompatible_dtype(tmp_path):
    """ADVICE r1: a float64 .npy routes 'auto' to the numpy backend (which
    converts) instead of a hard iteration-time failure; explicit 'native'
    raises at init with the offending file named."""
    corpus = make_synthetic_corpus(str(tmp_path), n_videos=6, feat_len=10,
                                   feat_dim=12, seed=1)
    # overwrite one train-split file as float64
    ds_probe = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                            max_len=10, mode="train", seed=0, backend="numpy")
    victim = ds_probe.feat_paths[0]
    np.save(victim, np.load(victim).astype(np.float64))

    ds = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                      max_len=10, mode="train", seed=0, backend="auto")
    assert ds.backend == "numpy"
    batches = list(ds.batches(3, epoch=0))  # loads fine via numpy
    assert all(np.isfinite(b.feats).all() for b in batches)

    with pytest.raises(ValueError, match="native"):
        VideoDataset(corpus["captions_file"], corpus["feat_path"],
                     max_len=10, mode="train", seed=0, backend="native")
