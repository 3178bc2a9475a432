"""End-to-end numerical parity of the S2VT model against a torch oracle.

The oracle is assembled here from torch.nn primitives following the
reference's documented semantics (SURVEY.md §3.2); weights are copied into
the flax model via the checkpoint-import path, so this test also covers
``params_from_torch_state_dict``.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from s2vt_tpu.models import S2VT
from s2vt_tpu.utils.torch_import import params_from_torch_state_dict

B, L, F, H, E, V = 2, 10, 12, 8, 8, 20


@pytest.fixture(scope="module")
def torch_modules():
    torch.manual_seed(42)
    mods = {
        "vid_rnn": tnn.LSTM(H, H, batch_first=True),
        "word_rnn": tnn.LSTM(H + E, H, batch_first=True),
        "feat_linear": tnn.Linear(F, H),
        "out_linear": tnn.Linear(H, V),
        "embedding": tnn.Embedding(V, E),
    }
    for m in mods.values():
        m.eval()
    return mods


def flax_params(mods):
    sd = {}
    for name, mod in mods.items():
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    return params_from_torch_state_dict(sd)


@torch.no_grad()
def oracle_train(mods, feats, targets):
    """Teacher-forced S2VT forward per SURVEY.md §3.2 call-stack."""
    h = mods["feat_linear"](feats)                                  # [B,L,H]
    pad_feats = torch.cat([h, torch.zeros(B, L - 1, H)], dim=1)
    out1, _ = mods["vid_rnn"](pad_feats)                            # [B,2L-1,H]
    emb = mods["embedding"](targets)                                # [B,L-1,E]
    pad_emb = torch.cat([torch.zeros(B, L, E), emb], dim=1)
    out2, _ = mods["word_rnn"](torch.cat([pad_emb, out1], dim=2))
    return mods["out_linear"](out2[:, L:, :])                       # [B,L-1,V]


@torch.no_grad()
def oracle_greedy(mods, feats, sos_ix):
    h = mods["feat_linear"](feats)
    pad_feats = torch.cat([h, torch.zeros(B, L - 1, H)], dim=1)
    out1, _ = mods["vid_rnn"](pad_feats)
    enc_in = torch.cat([torch.zeros(B, L, E), out1[:, :L, :]], dim=2)
    _, st2 = mods["word_rnn"](enc_in)
    word = torch.full((B,), sos_ix, dtype=torch.long)
    preds = []
    for t in range(L - 1):
        x = torch.cat([mods["embedding"](word).unsqueeze(1),
                       out1[:, L + t, :].unsqueeze(1)], dim=2)
        o, st2 = mods["word_rnn"](x, st2)
        word = mods["out_linear"](o.squeeze(1)).argmax(dim=1)
        preds.append(word)
    return torch.stack(preds, dim=1)                                # [B,L-1]


@pytest.fixture(scope="module")
def model():
    return S2VT(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
                sos_ix=3, eos_ix=4)


def test_train_logits_match_torch(torch_modules, model):
    torch.manual_seed(0)
    feats = torch.randn(B, L, F)
    targets = torch.randint(0, V, (B, L - 1))
    want = oracle_train(torch_modules, feats, targets).numpy()

    params = {"params": flax_params(torch_modules)}
    got = model.apply(params, jnp.asarray(feats.numpy()),
                      jnp.asarray(targets.numpy()), mode="train",
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_greedy_tokens_match_torch(torch_modules, model):
    torch.manual_seed(1)
    feats = torch.randn(B, L, F)
    want = oracle_greedy(torch_modules, feats, sos_ix=3).numpy()

    params = {"params": flax_params(torch_modules)}
    got = model.apply(params, jnp.asarray(feats.numpy()), mode="test")
    np.testing.assert_array_equal(np.asarray(got), want)


def test_beam_width1_equals_greedy(torch_modules, model):
    """Beam width 1 with depth L-1 must reproduce greedy decode: per step
    the single beam's best candidate is argmax of the step log-probs."""
    torch.manual_seed(2)
    feats = jnp.asarray(torch.randn(B, L, F).numpy())
    params = {"params": flax_params(torch_modules)}
    greedy = np.asarray(model.apply(params, feats, mode="test"))
    res = model.apply(params, feats, mode="beam_search", beam_width=1,
                      max_beam_depth=L - 1)
    beam_tokens = np.asarray(res.tokens)[:, 0, 1:]                  # strip <sos>
    lengths = np.asarray(res.lengths)[:, 0]
    for b in range(B):
        n = min(lengths[b] - 1, L - 1)  # tokens after <sos>
        np.testing.assert_array_equal(beam_tokens[b, :n], greedy[b, :n])


def test_beam_scores_sorted_and_finite(torch_modules, model):
    torch.manual_seed(3)
    feats = jnp.asarray(torch.randn(B, L, F).numpy())
    params = {"params": flax_params(torch_modules)}
    res = model.apply(params, feats, mode="beam_search", beam_width=3,
                      max_beam_depth=12)
    scores = np.asarray(res.scores)
    assert (np.diff(scores, axis=1) <= 1e-6).all(), "scores must be sorted desc"
    assert np.isfinite(scores).all()
    toks = np.asarray(res.tokens)
    assert toks.shape == (B, 3, 13)
    assert (toks[:, :, 0] == 3).all(), "history starts at <sos>"


def test_greedy_early_stop_sentences_match(torch_modules, model):
    """early_stop=True (serving extension): identical tokens up to and
    including each row's first <eos>, <eos> filler after, and rows that
    never emit <eos> decode identically to the full scan."""
    torch.manual_seed(7)
    feats = jnp.asarray(torch.randn(B, L, F).numpy())
    params = {"params": flax_params(torch_modules)}
    full = np.asarray(model.apply(params, feats, mode="test"))
    # pick an observed token as <eos> so the early exit actually fires
    eos = int(full[0, 2])
    m2 = S2VT(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
              sos_ix=3, eos_ix=eos)
    full2 = np.asarray(m2.apply(params, feats, mode="test"))
    early = np.asarray(m2.apply(params, feats, mode="test", early_stop=True))
    np.testing.assert_array_equal(full2, full)  # eos_ix doesn't alter greedy
    fired = False
    for r in range(B):
        hits = np.where(full2[r] == eos)[0]
        cut = hits[0] + 1 if len(hits) else full2.shape[1]
        np.testing.assert_array_equal(early[r, :cut], full2[r, :cut])
        assert (early[r, cut:] == eos).all()
        fired = fired or len(hits) > 0
    assert fired, "fixture never emitted eos; test is vacuous"
