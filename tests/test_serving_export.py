"""AOT serving export: exported StableHLO artifact == live model decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2vt_tpu.models import S2VT
from s2vt_tpu.serving import ServingCaptioner, export_captioner

V, F, L, H, E, B = 32, 12, 8, 16, 16, 4
SPECIALS = {"pad_ix": 0, "unk_ix": 1, "sos_ix": 3, "eos_ix": 4}
IX2WORD = {i: f"w{i}" for i in range(V)}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    model = S2VT(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
                 sos_ix=3, eos_ix=4)
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, L, F))
    params = model.init(jax.random.PRNGKey(1), feats, mode="test")["params"]
    return model, params, feats, tmp_path_factory.mktemp("artifacts")


def test_greedy_export_roundtrip(setup):
    model, params, feats, root = setup
    out = export_captioner(model, params, IX2WORD, SPECIALS, B,
                           root / "greedy", mode="greedy")
    srv = ServingCaptioner(out)
    want = np.asarray(model.apply({"params": params}, feats, mode="test"))
    got = srv.decode_tokens(np.asarray(feats))
    np.testing.assert_array_equal(got, want)
    sents = srv.caption(np.asarray(feats))
    assert len(sents) == B and all(isinstance(s, str) for s in sents)


def test_timed_decode_matches_and_attributes(setup):
    """decode_tokens_timed returns the same tokens as decode_tokens plus a
    non-negative phase breakdown (the serving bench's per-request
    attribution, VERDICT r4 #5): h2d upload+probe, device turnaround
    (execute + token fetch), slope-measured pure exec, and the d2h/RPC
    remainder; exec + d2h must re-compose the device turnaround."""
    model, params, feats, root = setup
    srv = ServingCaptioner(root / "greedy")
    want = srv.decode_tokens(np.asarray(feats))
    got, timings = srv.decode_tokens_timed(np.asarray(feats),
                                           exec_chain=(2, 6))
    _, fast = srv.decode_tokens_timed(np.asarray(feats), exec_chain=None)
    assert set(fast) == {"h2d_ms", "device_ms"}   # slope skipped
    np.testing.assert_array_equal(got, want)
    assert set(timings) == {"h2d_ms", "exec_ms", "d2h_ms", "device_ms"}
    assert all(v >= 0.0 for v in timings.values()), timings
    assert timings["device_ms"] > 0.0
    assert timings["exec_ms"] >= 0.0   # slope clamps to 0 under extreme
    #   scheduler noise on tiny CI models; on-chip, a degenerate slope
    #   (<0.01 ms) surfaces as serving_device_resident_note in the bench
    #   artifact instead of a silent missing ceiling
    # locally (no link RPC) the slope-measured pure exec tracks the
    # single-request device turnaround; generous bound for CI noise
    assert timings["exec_ms"] <= timings["device_ms"] * 3.0, timings


def test_beam_export_roundtrip(setup):
    model, params, feats, root = setup
    out = export_captioner(model, params, IX2WORD, SPECIALS, B,
                           root / "beam", mode="beam", beam_width=3,
                           max_beam_depth=5)
    srv = ServingCaptioner(out)
    res = model.apply({"params": params}, feats, mode="beam_search",
                      beam_width=3, max_beam_depth=5)
    want = np.asarray(res.tokens)[:, 0, :]
    got = srv.decode_tokens(np.asarray(feats))
    np.testing.assert_array_equal(got, want)


def test_ragged_batch_zero_padded(setup):
    model, params, feats, root = setup
    srv = ServingCaptioner(root / "greedy")
    sents_full = srv.caption(np.asarray(feats))
    sents_part = srv.caption(np.asarray(feats[:2]))
    assert sents_part == sents_full[:2]
    with pytest.raises(ValueError):
        srv.caption(np.zeros((B + 1, L, F), np.float32))


def test_polymorphic_batch_export(setup):
    """batch_size=None exports a symbolic-batch artifact serving any
    batch without padding."""
    model, params, feats, root = setup
    out = export_captioner(model, params, IX2WORD, SPECIALS, None,
                           root / "poly", mode="greedy")
    srv = ServingCaptioner(out)
    assert srv.batch_size is None
    for n in (1, 3, B):
        want = np.asarray(model.apply({"params": params}, feats[:n],
                                      mode="test"))
        np.testing.assert_array_equal(
            srv.decode_tokens(np.asarray(feats[:n])), want)
        assert len(srv.caption(np.asarray(feats[:n]))) == n


def test_bf16_feats_export(setup):
    """feats_dtype=bfloat16 exports an artifact whose input is bf16 —
    halving the per-request H2D bytes (the measured serving bottleneck:
    863 of 893 request-ms at B=16 through the tunnel is feature upload).
    Exact oracle: the artifact fed bf16-cast feats must equal the live
    model fed the SAME bf16 array; caption() must transparently cast
    f32 callers' input via the manifest dtype."""
    model, params, feats, root = setup
    out = export_captioner(model, params, IX2WORD, SPECIALS, B,
                           root / "bf16feats", mode="greedy",
                           feats_dtype=jnp.bfloat16)
    srv = ServingCaptioner(out)
    assert srv.manifest["feats_dtype"] == "bfloat16"
    feats_bf16 = np.asarray(feats).astype(np.dtype("bfloat16"))
    assert feats_bf16.nbytes * 2 == np.asarray(feats).nbytes
    want = np.asarray(model.apply({"params": params},
                                  jnp.asarray(feats_bf16), mode="test"))
    np.testing.assert_array_equal(srv.decode_tokens(feats_bf16), want)
    # f32 callers go through caption()'s manifest-dtype cast
    sents = srv.caption(np.asarray(feats))
    srv_f32 = ServingCaptioner(root / "greedy")
    assert sents == srv_f32.caption(feats_bf16.astype(np.float32))
    assert len(sents) == B and all(isinstance(s, str) for s in sents)


def test_quantize_feats_bounds():
    """Per-clip absmax int8 quantization: dequant error bounded by
    scale/2 everywhere, all-zero clips get scale 1.0, payload is one
    byte per element."""
    from s2vt_tpu.serving import quantize_feats
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 5, 7)).astype(np.float32) * 10.0
    feats[1] = 0.0                       # degenerate clip
    q, scale = quantize_feats(feats)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    assert q.nbytes * 4 == feats.nbytes
    assert scale[1] == 1.0 and not q[1].any()
    deq = q.astype(np.float32) * scale[:, None, None]
    err = np.abs(deq - feats)
    assert (err <= scale[:, None, None] / 2 + 1e-7).all()
    # scale is the per-clip absmax over 127 — the max element hits ±127
    assert (np.abs(q).max(axis=(1, 2))[[0, 2]] == 127).all()


def test_int8_feats_export(setup):
    """feats_dtype=int8 exports an artifact taking (feats_i8, scale[B])
    — quartering the per-request upload bytes vs f32. Exact oracle: the
    artifact must equal the live model fed the DEQUANTIZED array (the
    quantization itself is lossy by design; bench.py records the
    cross-dtype token match as measurement, not assertion). caption()
    and the timed request path quantize float callers' input
    internally."""
    from s2vt_tpu.serving import quantize_feats
    model, params, feats, root = setup
    out = export_captioner(model, params, IX2WORD, SPECIALS, B,
                           root / "int8feats", mode="greedy",
                           feats_dtype=np.int8)
    srv = ServingCaptioner(out)
    assert srv.manifest["feats_dtype"] == "int8"
    assert srv.manifest["quant"] == {"strategy": "per_clip_absmax",
                                     "levels": 127}
    q, scale = quantize_feats(np.asarray(feats))
    deq = jnp.asarray(q.astype(np.float32) * scale[:, None, None])
    want = np.asarray(model.apply({"params": params}, deq, mode="test"))
    np.testing.assert_array_equal(srv.decode_tokens(np.asarray(feats)),
                                  want)
    # pre-quantized input without its scale is rejected, not misread
    with pytest.raises(TypeError):
        srv.decode_tokens(q)
    # ragged caption() pads then quantizes (padding rows are exact zeros
    # before AND after quantization, so short batches match)
    sents_full = srv.caption(np.asarray(feats))
    assert srv.caption(np.asarray(feats[:2])) == sents_full[:2]
    # the timed request path (int8 payload + scale-nonce exec slope)
    got, timings = srv.decode_tokens_timed(np.asarray(feats),
                                           exec_chain=(2, 6))
    np.testing.assert_array_equal(got, want)
    assert set(timings) == {"h2d_ms", "exec_ms", "d2h_ms", "device_ms"}
    assert all(v >= 0.0 for v in timings.values()), timings


def test_att_baseline_export(setup):
    """The attention baseline (dim_feat attribute) exports too."""
    from s2vt_tpu.models import AttBaseline
    _, _, feats, root = setup
    model = AttBaseline(vocab_size=V, dim_feat=F, length=L, dim_hid=H,
                        dim_embed=E, sos_ix=3, eos_ix=4)
    params = model.init(jax.random.PRNGKey(2), feats, mode="test")["params"]
    out = export_captioner(model, params, IX2WORD, SPECIALS, B,
                           root / "att", mode="greedy")
    srv = ServingCaptioner(out)
    want = np.asarray(model.apply({"params": params}, feats, mode="test"))
    np.testing.assert_array_equal(srv.decode_tokens(np.asarray(feats)), want)


def test_artifact_is_model_free(setup):
    """The loader must not need the model class: only files are read."""
    _, _, feats, root = setup
    srv = ServingCaptioner(root / "greedy")
    assert set(p.name for p in (root / "greedy").iterdir()) == {
        "decode.hlo", "params.npz", "manifest.json"}
    assert srv.manifest["mode"] == "greedy"


@pytest.mark.slow
def test_int8_artifact_trained_model_fidelity(tmp_path):
    """The int8 artifact's real-world claim: on a TRAINED model
    (confident logits), per-clip absmax quantization does not change
    the captions. The unit probe above asserts only the exact
    dequantized oracle because a random-weights model near-uniform in
    logit space flips argmax on any input perturbation; this trains the
    tiny learnable corpus to memorization (the overfit-quality harness)
    and requires int8 caption() output to MATCH the f32 artifact's,
    clip for clip. Deterministic: seeded corpus, seeded init, CPU."""
    from test_overfit_quality import _learnable_corpus

    from s2vt_tpu.config import Opt
    from s2vt_tpu.training import Trainer

    feat_dir = _learnable_corpus(tmp_path)
    opt = Opt(caption_file=str(tmp_path / "captions.json"),
              feats_path=str(feat_dir), gts_file=str(tmp_path / "gts.json"),
              train_length=10, dim_hidden=48, dim_embed=48, feat_dim=24,
              batch_size=8, lr=0.02, EPOCHS=150, use_pallas=False,
              save_path=str(tmp_path / "ckpt"),
              log_dir=str(tmp_path / "runs"), model="s2vt", seed=0,
              early_stopping_patience=1000, learning_rate_patience=10000)
    tr = Trainer(opt, writer=None)
    hist = tr.fit(epochs=200)
    assert hist["train_loss"][-1] < 0.1, "model failed to memorize"

    ix2word = {int(k): v for k, v in tr.train_ds.ix2word.items()}
    specials = {"pad_ix": 0, "unk_ix": 1,
                "sos_ix": tr.model.sos_ix, "eos_ix": tr.model.eos_ix}
    feats = np.stack([np.load(p) for p in sorted(feat_dir.iterdir())])
    params = jax.device_get(tr.params)
    n = feats.shape[0]
    f32_dir = export_captioner(tr.model, params, ix2word, specials, n,
                               tmp_path / "art_f32", mode="greedy")
    i8_dir = export_captioner(tr.model, params, ix2word, specials, n,
                              tmp_path / "art_int8", mode="greedy",
                              feats_dtype=np.int8)
    sents_f32 = ServingCaptioner(f32_dir).caption(feats)
    sents_i8 = ServingCaptioner(i8_dir).caption(feats)
    assert sents_i8 == sents_f32, list(zip(sents_f32, sents_i8))


def test_slope_nonce_ids_unique_across_measurements():
    """The exec-slope nonce identity (base, e0, e1) must be distinct for
    tens of thousands of measurements in one process: measurement k
    re-using measurement j's nonce set re-issues byte-identical chain
    executions that a caching tunnel elides, collapsing the slope (the
    old base formula's 7 multiplier shared gcd 7 with 224 — period 32)."""
    from s2vt_tpu.serving.export import _slope_nonce_ids
    for pid in (1, 4242, 99991):
        seen = {_slope_nonce_ids(e, pid)[:3] for e in range(1, 224 * 224)}
        assert len(seen) == 224 * 224 - 1
        # the int8 path's raw-epoch scale nonce is unique even longer
        assert len({_slope_nonce_ids(e, pid)[3]
                    for e in range(1, 5000)}) == 4999
    # every emitted value stays below 256 (bf16-exact small ints) except
    # e_q, which lands on an f32 scale row (exact to 2^24)
    base, e0, e1, _ = _slope_nonce_ids(123456, 7)
    assert 0 <= base < 224 and 0 <= e0 < 224 and 0 <= e1 < 224
