"""Parity of AttBaseline against a torch oracle (both attention modes).

The reference's attention applies softmax over a singleton axis
(attention_baseline.py:55), yielding constant-1 weights (sum-pooling).
We test 'reference_sum' against an oracle reproducing that, and 'softmax'
against an oracle with the intended softmax over the time axis.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from s2vt_tpu.models import AttBaseline
from s2vt_tpu.utils.torch_import import params_from_torch_state_dict

B, L, F, H, E, V = 2, 8, 10, 6, 6, 18


@pytest.fixture(scope="module")
def torch_modules():
    torch.manual_seed(7)
    mods = {
        "encoder": tnn.LSTM(H, H, batch_first=True, bidirectional=True),
        "decoder": tnn.LSTM(2 * H + E, H, batch_first=True),
        "feat_linear": tnn.Linear(F, H),
        "embedding": tnn.Embedding(V, E, padding_idx=0),
        "out_linear": tnn.Linear(H, V),
        "att_enc": tnn.Linear(2 * H, H),
        "att_prev_hid": tnn.Linear(H, H),
        "att_apply": tnn.Linear(H, 1, bias=False),
    }
    for m in mods.values():
        m.eval()
    return mods


def flax_params(mods):
    sd = {}
    for name, mod in mods.items():
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    return {"params": params_from_torch_state_dict(sd)}


def oracle_attention(mods, enc_outputs, dec_h, intended_softmax):
    """enc_outputs [B,L,2H]; dec_h [B,H] -> context [B,2H]."""
    e = mods["att_enc"](enc_outputs) + mods["att_prev_hid"](dec_h).unsqueeze(1)
    et = mods["att_apply"](torch.tanh(e))                          # [B,L,1]
    if intended_softmax:
        at = torch.softmax(et, dim=1)
    else:
        at = torch.ones_like(et)  # the reference's dim=2 softmax on [B,L,1]
    return (at * enc_outputs).sum(dim=1)


@torch.no_grad()
def oracle_train(mods, feats, targets, intended_softmax):
    enc, _ = mods["encoder"](mods["feat_linear"](feats))
    ctx = oracle_attention(mods, enc, torch.zeros(B, H), intended_softmax)
    emb = mods["embedding"](targets)
    state = None
    outs = []
    for t in range(L - 1):
        x = torch.cat([emb[:, t].unsqueeze(1), ctx.unsqueeze(1)], dim=2)
        o, state = mods["decoder"](x, state)
        ctx = oracle_attention(mods, enc, state[0][0], intended_softmax)
        outs.append(mods["out_linear"](o))
    return torch.cat(outs, dim=1)


@torch.no_grad()
def oracle_greedy(mods, feats, sos_ix, intended_softmax):
    enc, _ = mods["encoder"](mods["feat_linear"](feats))
    ctx = oracle_attention(mods, enc, torch.zeros(B, H), intended_softmax)
    word = torch.full((B,), sos_ix, dtype=torch.long)
    state = None
    preds = []
    for _ in range(L):
        x = torch.cat([mods["embedding"](word).unsqueeze(1), ctx.unsqueeze(1)], dim=2)
        o, state = mods["decoder"](x, state)
        ctx = oracle_attention(mods, enc, state[0][0], intended_softmax)
        word = mods["out_linear"](o.squeeze(1)).argmax(dim=1)
        preds.append(word)
    return torch.stack(preds, dim=1)


@pytest.mark.parametrize("att_mode,intended", [("softmax", True),
                                               ("reference_sum", False)])
def test_train_logits_match_torch(torch_modules, att_mode, intended):
    torch.manual_seed(10)
    feats = torch.randn(B, L, F)
    targets = torch.randint(0, V, (B, L - 1))
    want = oracle_train(torch_modules, feats, targets, intended).numpy()

    model = AttBaseline(vocab_size=V, dim_feat=F, length=L, dim_hid=H,
                        dim_embed=E, att_mode=att_mode)
    got = model.apply(flax_params(torch_modules), jnp.asarray(feats.numpy()),
                      jnp.asarray(targets.numpy()), mode="train",
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


@pytest.mark.parametrize("att_mode,intended", [("softmax", True),
                                               ("reference_sum", False)])
def test_greedy_tokens_match_torch(torch_modules, att_mode, intended):
    torch.manual_seed(11)
    feats = torch.randn(B, L, F)
    want = oracle_greedy(torch_modules, feats, 3, intended).numpy()

    model = AttBaseline(vocab_size=V, dim_feat=F, length=L, dim_hid=H,
                        dim_embed=E, att_mode=att_mode)
    got = model.apply(flax_params(torch_modules), jnp.asarray(feats.numpy()),
                      mode="test")
    np.testing.assert_array_equal(np.asarray(got), want)


def test_att_beam_width1_matches_greedy():
    """Beam width 1 over the attention decoder reproduces greedy prefixes
    (new capability — the reference Att_Baseline has no beam mode)."""
    import jax
    import numpy as np
    from s2vt_tpu.models import AttBaseline

    m = AttBaseline(vocab_size=18, dim_feat=6, length=8, dim_hid=8,
                    dim_embed=8, sos_ix=3, eos_ix=4)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6))
    params = m.init(jax.random.PRNGKey(1), feats, mode="test")
    greedy = np.asarray(m.apply(params, feats, mode="test"))
    res = m.apply(params, feats, mode="beam_search", beam_width=1,
                  max_beam_depth=8)
    toks = np.asarray(res.tokens)[:, 0, 1:]
    lens = np.asarray(res.lengths)[:, 0]
    for b in range(2):
        n = min(lens[b] - 1, 8)
        np.testing.assert_array_equal(toks[b, :n], greedy[b, :n])
