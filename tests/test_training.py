"""Training harness tests: loss decreases end-to-end on the 8-device CPU
mesh, checkpoint round-trip, and callback semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2vt_tpu.config import Opt
from s2vt_tpu.data import make_synthetic_corpus
from s2vt_tpu.training import Trainer, EarlyStopping, ReduceLROnPlateau
from s2vt_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(str(root), n_videos=8, feat_len=10,
                                 feat_dim=12, seed=3)


def small_opt(corpus, tmp_path, **kw):
    defaults = dict(
        caption_file=corpus["captions_file"], feats_path=corpus["feat_path"],
        gts_file=corpus["gts_file"], train_length=10, dim_hidden=16,
        dim_embed=16, feat_dim=corpus["feat_dim"], batch_size=8,
        save_path=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
        lr=1e-2, EPOCHS=5, save_freq=100, model="s2vt", seed=0)
    defaults.update(kw)
    return Opt(**defaults)


def test_loss_decreases_s2vt(corpus, tmp_path):
    opt = small_opt(corpus, tmp_path)
    tr = Trainer(opt, writer=None)
    assert tr.mesh.devices.size == len(jax.devices()), "DP over all CPU devices"
    hist = tr.fit(epochs=5)
    assert len(hist["train_loss"]) == 5
    assert hist["train_loss"][-1] < hist["train_loss"][0], \
        f"loss should go down: {hist['train_loss']}"
    assert np.isfinite(hist["valid_loss"]).all()


def test_loss_decreases_att_baseline(corpus, tmp_path):
    opt = small_opt(corpus, tmp_path, model="att_baseline")
    tr = Trainer(opt, writer=None)
    hist = tr.fit(epochs=4)
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_checkpoint_roundtrip(corpus, tmp_path):
    opt = small_opt(corpus, tmp_path)
    tr = Trainer(opt, writer=None)
    tr.fit(epochs=2)
    path = tr.save("roundtrip")

    tr2 = Trainer(small_opt(corpus, tmp_path), writer=None)
    before = tr2.valid_epoch(0)
    tr2.restore(path)
    after = tr2.valid_epoch(0)
    want = tr.valid_epoch(0)
    assert abs(after - want) < 1e-5
    assert abs(before - want) > 1e-6, "restore actually changed params"


def test_reference_compat_loss_mode(corpus, tmp_path):
    opt = small_opt(corpus, tmp_path, masked_loss=False)
    tr = Trainer(opt, writer=None)
    hist = tr.fit(epochs=2)
    assert np.isfinite(hist["train_loss"]).all()


def test_weight_decay_is_live(corpus, tmp_path):
    """Opt.weight_decay is consumed (adamw), not a dead knob."""
    ha = Trainer(small_opt(corpus, tmp_path), writer=None).fit(epochs=1)
    hb = Trainer(small_opt(corpus, tmp_path, weight_decay=10.0),
                 writer=None).fit(epochs=1)
    # decay shows up on the validation loss after one decayed epoch
    assert abs(ha["valid_loss"][0] - hb["valid_loss"][0]) > 1e-6


def test_plateau_scheduler_semantics():
    s = ReduceLROnPlateau(lr=1.0, patience=2, factor=0.1)
    assert s.step(1.0) == 1.0          # first metric sets best
    assert s.step(0.5) == 1.0          # improvement
    assert s.step(0.6) == 1.0          # bad 1
    assert s.step(0.6) == 1.0          # bad 2
    assert s.step(0.6) == pytest.approx(0.1)  # bad 3 > patience -> reduce
    assert s.step(0.4) == pytest.approx(0.1)  # improvement, no change


def test_early_stopping_semantics():
    saves = []
    es = EarlyStopping(patience=2, save_fn=lambda: saves.append(1))
    assert not es(1.0)     # improvement (first) -> save
    assert not es(0.9)     # improvement -> save
    assert not es(0.95)    # bad 1
    assert es(0.95)        # bad 2 -> stop
    assert len(saves) == 2


def test_tensor_parallel_mesh_trains(corpus, tmp_path):
    """dp=4 x tp=2 over the 8 CPU devices: vocab-sharded embedding/out_linear."""
    opt = small_opt(corpus, tmp_path, batch_size=8, mesh_shape=(4, 2),
                    vocab_pad_multiple=8)
    mesh = make_mesh((4, 2))
    tr = Trainer(opt, mesh=mesh, writer=None)
    hist = tr.fit(epochs=2)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 1.5


def test_opt_state_sharded_like_params(corpus, tmp_path):
    """Adam moments carry leaf-for-leaf the same sharding as their params
    under dp x tp (VERDICT r1 item 8: one opt-state placement answer)."""
    opt = small_opt(corpus, tmp_path, batch_size=8, mesh_shape=(4, 2),
                    vocab_pad_multiple=8)
    tr = Trainer(opt, mesh=make_mesh((4, 2)), writer=None)

    p_leaves = jax.tree_util.tree_leaves_with_path(tr.params)
    param_sh = {jax.tree_util.keystr(path): leaf.sharding
                for path, leaf in p_leaves}
    # Some param must actually be vocab-sharded for this test to bite.
    assert any(sh.spec != jax.sharding.PartitionSpec()
               for sh in param_sh.values())

    inner = tr.opt_state.inner_state  # inject_hyperparams wrapper
    moment_trees = [s for s in jax.tree_util.tree_leaves(
        inner, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(x := s, "mu")]
    assert moment_trees, "adam state not found"
    adam = moment_trees[0]
    for tree in (adam.mu, adam.nu):
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            assert leaf.sharding == param_sh[jax.tree_util.keystr(path)], \
                f"moment {jax.tree_util.keystr(path)} sharding mismatch"


def test_resume_from_checkpoint(corpus, tmp_path):
    """Opt.resume_path restores params/opt/callback state before fit."""
    opt = small_opt(corpus, tmp_path)
    tr = Trainer(opt, writer=None)
    tr.fit(epochs=2)
    path = tr.save("resume_src")

    opt2 = small_opt(corpus, tmp_path, resume_path=path)
    tr2 = Trainer(opt2, writer=None)
    want = tr.valid_epoch(0)
    tr2.fit(epochs=0)  # restore happens at fit() start
    got = tr2.valid_epoch(0)
    assert abs(got - want) < 1e-5


def test_throughput_meter_and_timer():
    from s2vt_tpu.utils.profiling import ThroughputMeter, Timer
    m = ThroughputMeter(n_chips=2)
    m.update(10)
    m.update(10)
    s = m.summary()
    assert s["clips"] == 20
    assert s["clips_per_sec_per_chip"] * 2 == pytest.approx(s["clips_per_sec"])
    with Timer() as t:
        pass
    assert t.seconds >= 0.0


def test_metric_eval_during_training(corpus, tmp_path):
    opt = small_opt(corpus, tmp_path, metric_eval_freq=2)
    tr = Trainer(opt, writer=None)
    hist = tr.fit(epochs=2)
    assert "metrics" in hist or "metrics" in tr.history
    entry = tr.history["metrics"][0]
    assert entry["epoch"] == 1
    assert {"Bleu_1", "METEOR", "ROUGE_L", "CIDEr"} <= set(entry)


def test_host_local_batch_to_global():
    from s2vt_tpu.parallel import make_mesh
    from s2vt_tpu.parallel.distributed import (host_local_batch_to_global,
                                               local_batch_size)
    mesh = make_mesh()
    a = np.arange(16, dtype=np.float32).reshape(8, 2)
    (g,) = host_local_batch_to_global(mesh, a)
    assert g.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(g), a)
    assert local_batch_size(16) == 16  # single process


def test_tensorboard_writer_auto(corpus, tmp_path):
    """writer='auto' writes event files with the reference's scalar tags."""
    pytest.importorskip("tensorboardX")
    opt = small_opt(corpus, tmp_path, log_dir=str(tmp_path / "tb"))
    tr = Trainer(opt)  # writer='auto'
    tr.fit(epochs=1)
    import pathlib
    events = list(pathlib.Path(opt.log_dir).rglob("events.*"))
    assert events, "tensorboard event file written"


def test_sigterm_preemption_checkpoints_and_resumes(corpus, tmp_path):
    """SIGTERM mid-training (TPU preemption notice) finishes the epoch,
    writes the 'final' checkpoint, and restores the previous handler."""
    import os
    import signal

    opt = small_opt(corpus, tmp_path, EPOCHS=50)
    tr = Trainer(opt, writer=None)

    def preempt(trainer, epoch):
        if epoch == 1:
            signal.raise_signal(signal.SIGTERM)

    prev = signal.getsignal(signal.SIGTERM)
    hist = tr.fit(on_epoch_end=preempt)
    assert len(hist["train_loss"]) == 2          # stopped after epoch 1
    assert signal.getsignal(signal.SIGTERM) is prev

    final = os.path.join(opt.save_path, opt.start_time + "final")
    assert os.path.isdir(final)
    opt2 = small_opt(corpus, tmp_path, EPOCHS=1, resume_path=final)
    tr2 = Trainer(opt2, writer=None)
    hist2 = tr2.fit()                            # resumes cleanly
    assert len(hist2["train_loss"]) == 1


def test_profile_flag_writes_trace(corpus, tmp_path):
    """Opt.profile traces epoch 0 via jax.profiler into log_dir/profile."""
    import os
    opt = small_opt(corpus, tmp_path, EPOCHS=1, profile=True)
    Trainer(opt, writer=None).fit()
    prof = os.path.join(opt.log_dir, "profile")
    assert os.path.isdir(prof)
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert found, "no trace artifacts written"


def test_msrvtt_scale_vocab_tp_step():
    """BASELINE config #5 scale evidence: one sharded train step at
    MSR-VTT vocab (~29k) with vocab-dim TP on the 8-device mesh."""
    import optax

    from s2vt_tpu.models import S2VT
    from s2vt_tpu.parallel import mesh as mesh_lib
    from s2vt_tpu.training.loop import batch_loss

    V, B, L, D = 29056, 16, 8, 12   # 29056 = MSR-VTT-ish vocab, %8 == 0
    mesh = make_mesh((4, 2))
    model = S2VT(vocab_size=V, feat_dim=D, length=L, dim_hid=16,
                 dim_embed=16, sos_ix=3, eos_ix=4)
    feats = jnp.zeros((B, L, D), jnp.float32)
    targets = jnp.zeros((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)
    valid = jnp.ones((B,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, targets[:, :-1],
                        mode="train", deterministic=True)["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    p_sh = mesh_lib.param_shardings(mesh, params)
    # the vocab-dim leaves actually shard at this scale
    assert any(sh.spec != jax.sharding.PartitionSpec()
               for sh in jax.tree_util.tree_leaves(p_sh))
    params = jax.device_put(params, p_sh)
    opt_state = jax.device_put(
        opt_state, mesh_lib.opt_state_shardings(mesh, params, opt_state))
    feats, targets, mask, valid = mesh_lib.shard_batch_arrays(
        mesh, feats, targets, mask, valid)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, feats, targets[:, :-1],
                                 mode="train", deterministic=True)
            return batch_loss(logits, targets, mask, valid)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))


def test_feature_bank_matches_streaming(corpus, tmp_path):
    """The device feature bank (one HBM-resident [N, L, D] array, on-device
    row gather per step) computes the SAME training trajectory as the
    streaming path — same batches, same rng, same losses."""
    opt_bank = small_opt(corpus, tmp_path, EPOCHS=2,
                         save_path=str(tmp_path / "b"),
                         device_feature_bank="on")
    opt_stream = small_opt(corpus, tmp_path, EPOCHS=2,
                           save_path=str(tmp_path / "s"),
                           device_feature_bank="off")
    tr_b = Trainer(opt_bank, writer=None)
    tr_s = Trainer(opt_stream, writer=None)
    assert tr_b.use_feature_bank and not tr_s.use_feature_bank
    hb = tr_b.fit(epochs=2)
    hs = tr_s.fit(epochs=2)
    np.testing.assert_allclose(hb["train_loss"], hs["train_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hb["valid_loss"], hs["valid_loss"],
                               rtol=1e-5, atol=1e-6)


def test_bank_dtype_bf16_storage_matches_f32_storage(corpus, tmp_path):
    """Opt.bank_dtype='auto' under bf16 compute stores the device bank in
    bf16 (half the upload + HBM). Identical trajectory to f32 storage:
    matmuls cast operands to compute_dtype at use anyway, so pre-casting
    applies the same rounding earlier (bit-identical at feat_dropout=0)."""
    kw = dict(EPOCHS=2, compute_dtype="bfloat16", device_feature_bank="on")
    tr_auto = Trainer(small_opt(corpus, tmp_path, save_path=str(tmp_path / "a"),
                                bank_dtype="auto", **kw), writer=None)
    tr_f32 = Trainer(small_opt(corpus, tmp_path, save_path=str(tmp_path / "f"),
                               bank_dtype="float32", **kw), writer=None)
    assert tr_auto._bank["train"].dtype == jnp.bfloat16
    assert tr_f32._bank["train"].dtype == jnp.float32
    assert (tr_auto._bank["train"].nbytes * 2
            == tr_f32._bank["train"].nbytes)
    ha = tr_auto.fit(epochs=2)
    hf = tr_f32.fit(epochs=2)
    np.testing.assert_array_equal(ha["train_loss"], hf["train_loss"])
    np.testing.assert_array_equal(ha["valid_loss"], hf["valid_loss"])


def test_bank_dtype_streaming_transfer_matches_bank(corpus, tmp_path):
    """Streaming mode transfers feature batches in the storage dtype too
    (halved H2D payload) and still matches the bank trajectory."""
    kw = dict(EPOCHS=2, compute_dtype="bfloat16")
    tr_b = Trainer(small_opt(corpus, tmp_path, save_path=str(tmp_path / "b"),
                             device_feature_bank="on", **kw), writer=None)
    tr_s = Trainer(small_opt(corpus, tmp_path, save_path=str(tmp_path / "s"),
                             device_feature_bank="off", **kw), writer=None)
    assert tr_b.use_feature_bank and not tr_s.use_feature_bank
    hb = tr_b.fit(epochs=2)
    hs = tr_s.fit(epochs=2)
    np.testing.assert_allclose(hb["train_loss"], hs["train_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hb["valid_loss"], hs["valid_loss"],
                               rtol=1e-5, atol=1e-6)


def test_bank_dtype_typo_rejected(corpus, tmp_path):
    """Unrecognized bank_dtype values raise instead of silently storing
    the bank in float32 (a 'bf16' typo would otherwise look like the
    documented halving while changing nothing)."""
    with pytest.raises(ValueError, match="bank_dtype"):
        Trainer(small_opt(corpus, tmp_path, EPOCHS=1, bank_dtype="bf16"),
                writer=None)


def test_bank_dtype_auto_threshold_uses_stored_bytes(corpus, tmp_path):
    """'auto' bank gating budgets the STORED bytes: a dataset over the
    f32 budget but under it at bf16 still gets the bank."""
    probe = Trainer(small_opt(corpus, tmp_path, EPOCHS=1), writer=None)
    nbytes_f32 = probe.train_ds.nbytes() + probe.valid_ds.nbytes()
    budget = int(nbytes_f32 * 0.75)   # between bf16 (0.5x) and f32 (1x)
    opt_f32 = small_opt(corpus, tmp_path, feature_bank_max_bytes=budget)
    assert not Trainer(opt_f32, writer=None).use_feature_bank
    opt_bf16 = small_opt(corpus, tmp_path, feature_bank_max_bytes=budget,
                         compute_dtype="bfloat16")
    assert Trainer(opt_bf16, writer=None).use_feature_bank


def test_feature_bank_cache_reuses_upload_and_matches(corpus, tmp_path):
    """feature_bank_cache=True: a second Trainer over the same dataset
    re-uses the device-resident bank (no re-upload) and computes the
    identical training trajectory."""
    from s2vt_tpu.training import loop as loop_mod

    loop_mod._BANK_CACHE.clear()
    opt1 = small_opt(corpus, tmp_path, EPOCHS=2,
                     save_path=str(tmp_path / "c1"),
                     device_feature_bank="on", feature_bank_cache=True)
    tr1 = Trainer(opt1, writer=None)
    assert len(loop_mod._BANK_CACHE) == 2          # train + valid
    cached_ids = {k: id(v) for k, v in loop_mod._BANK_CACHE.items()}
    h1 = tr1.fit(epochs=2)

    opt2 = small_opt(corpus, tmp_path, EPOCHS=2,
                     save_path=str(tmp_path / "c2"),
                     device_feature_bank="on", feature_bank_cache=True)
    tr2 = Trainer(opt2, writer=None)
    assert {k: id(v) for k, v in loop_mod._BANK_CACHE.items()} == cached_ids
    assert tr2._bank["train"] is loop_mod._BANK_CACHE[
        next(k for k in cached_ids if "train" in k)][0]
    h2 = tr2.fit(epochs=2)
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"],
                               rtol=1e-6, atol=1e-7)
    loop_mod._BANK_CACHE.clear()                   # don't leak into others


def test_feature_bank_cache_misses_on_regenerated_features(tmp_path):
    """A corpus regenerated in-place (same path, same shapes, NEW feature
    content) must MISS the process-level bank cache: the key hashes every
    feature file's (name, mtime_ns, size), because a stale hit would
    silently train the old features against the new labels/rows."""
    from s2vt_tpu.training import loop as loop_mod

    c = make_synthetic_corpus(str(tmp_path / "mc"), n_videos=8, feat_len=10,
                              feat_dim=12, seed=5)
    loop_mod._BANK_CACHE.clear()
    kw = dict(device_feature_bank="on", feature_bank_cache=True)
    tr1 = Trainer(small_opt(c, tmp_path, save_path=str(tmp_path / "m1"),
                            **kw), writer=None)
    assert len(loop_mod._BANK_CACHE) == 2
    bank1 = tr1._bank["train"]

    # regenerate the features in place: same names, same shapes
    import pathlib
    for feat in pathlib.Path(c["feat_path"]).glob("*.npy"):
        np.save(feat, np.load(feat) + 1.0)

    tr2 = Trainer(small_opt(c, tmp_path, save_path=str(tmp_path / "m2"),
                            **kw), writer=None)
    assert tr2._bank["train"] is not bank1         # cache MISSED
    # ...and the superseded banks were EVICTED, not pinned alongside the
    # new ones (a regenerated corpus must not leak multi-GB HBM entries)
    assert len(loop_mod._BANK_CACHE) == 2
    assert all(v[0] is not bank1
               for v in loop_mod._BANK_CACHE.values())
    # the old Trainer's own reference is untouched (no forced delete)
    assert not bank1.is_deleted()
    loop_mod._BANK_CACHE.clear()


def test_feature_bank_auto_threshold(corpus, tmp_path):
    """auto mode honours the byte budget: a budget below the split size
    routes to streaming."""
    opt = small_opt(corpus, tmp_path, feature_bank_max_bytes=16)
    assert not Trainer(opt, writer=None).use_feature_bank
    opt2 = small_opt(corpus, tmp_path)
    assert Trainer(opt2, writer=None).use_feature_bank


def test_device_put_chunked_roundtrip():
    """Chunked upload assembles exactly the source array, including the
    overlap-rewritten tail window."""
    from s2vt_tpu.parallel import mesh as mesh_lib
    mesh = make_mesh()
    rep = mesh_lib.replicate_sharding(mesh)
    x = np.arange(11 * 3 * 5, dtype=np.float32).reshape(11, 3, 5)
    got = mesh_lib.device_put_chunked(x, rep, chunk_bytes=4 * 3 * 5 * 4)
    np.testing.assert_array_equal(np.asarray(got), x)
    small = np.ones((2, 2), np.float32)
    np.testing.assert_array_equal(
        np.asarray(mesh_lib.device_put_chunked(small, rep)), small)


def test_async_checkpoint_roundtrip(corpus, tmp_path):
    """async_checkpoint=True (default): saves return without blocking, the
    state is snapshotted against donation, and the files restore exactly
    like blocking saves."""
    opt = small_opt(corpus, tmp_path, EPOCHS=2)
    assert opt.async_checkpoint
    tr = Trainer(opt, writer=None)
    tr.fit(epochs=2)
    path = tr.save("async_rt")          # async
    # keep training AFTER the save: donated steps must not corrupt it
    tr.train_epoch(7)
    from s2vt_tpu.training.checkpoint import wait_for_saves
    wait_for_saves()

    opt2 = small_opt(corpus, tmp_path, async_checkpoint=False,
                     save_path=str(tmp_path / "blk"))
    tr2 = Trainer(opt2, writer=None)
    before = tr2.valid_epoch(0)
    tr2.restore(path)
    after = tr2.valid_epoch(0)
    assert abs(after - before) > 1e-6   # restore changed params
