"""Parity against the REFERENCE'S OWN model code, imported as an oracle.

Unlike test_s2vt_parity.py (torch oracle rebuilt from documented
semantics), these tests run /root/reference/S2VTModel.py and
attention_baseline.py directly with weights transferred through the
checkpoint-import path — the strongest possible behavioral check:
identical train logits, token-for-token greedy decode, and beam sentences
(via score_mode='reference').
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

try:
    import S2VTModel as ref_s2vt_mod
    import attention_baseline as ref_att_mod
    HAVE_REF = True
except Exception:
    HAVE_REF = False

from s2vt_tpu.models import S2VT, AttBaseline
from s2vt_tpu.utils.torch_import import params_from_torch_state_dict

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference checkout unavailable")

B, L, F, H, E, V = 2, 10, 12, 8, 8, 20


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(7)
    ref = ref_s2vt_mod.S2VT(vocab_size=V, feat_dim=F, length=L, dim_hid=H,
                            dim_embed=E, sos_ix=3, eos_ix=4)
    ref.eval()
    ours = S2VT(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
                sos_ix=3, eos_ix=4)
    params = {"params": params_from_torch_state_dict(ref.state_dict())}
    return ref, ours, params


def test_train_logits_match_reference_module(pair):
    ref, ours, params = pair
    torch.manual_seed(0)
    feats = torch.randn(B, L, F)
    tgts = torch.randint(0, V, (B, L - 1))
    with torch.no_grad():
        want = ref(feats, tgts, mode="train").numpy()
    got = ours.apply(params, jnp.asarray(feats.numpy()),
                     jnp.asarray(tgts.numpy()), mode="train",
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_greedy_tokens_match_reference_module(pair):
    ref, ours, params = pair
    torch.manual_seed(1)
    feats = torch.randn(B, L, F)
    with torch.no_grad():
        want = ref(feats, mode="test").numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(feats.numpy()),
                                mode="test"))
    np.testing.assert_array_equal(got, want)


def test_beam_sentences_match_reference_module(pair):
    ref, ours, params = pair
    torch.manual_seed(2)
    feats = torch.randn(B, L, F)
    with torch.no_grad():
        want = ref(feats, mode="beam_search", beam_width=3, max_beam_depth=6)
    res = ours.apply(params, jnp.asarray(feats.numpy()), mode="beam_search",
                     beam_width=3, max_beam_depth=6,
                     beam_score_mode="reference")
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)
    for b in range(B):
        want_ids = [int(t) for t in want[b]]
        got_ids = toks[b, 0, :lens[b, 0]].tolist()
        assert got_ids == want_ids, f"sentence {b}: {got_ids} != {want_ids}"


@pytest.mark.parametrize("rnn_type,num_layers", [("gru", 1), ("lstm", 2)])
def test_s2vt_variants_match_reference_module(rnn_type, num_layers):
    """The reference supports rnn_type='gru' and num_layers>1
    (S2VTModel.py:15-22); both variants must match end-to-end, not just at
    the cell level (test_rnn_parity.py)."""
    torch.manual_seed(11)
    ref = ref_s2vt_mod.S2VT(vocab_size=V, feat_dim=F, length=L, dim_hid=H,
                            dim_embed=E, sos_ix=3, eos_ix=4,
                            rnn_type=rnn_type, num_layers=num_layers)
    ref.eval()
    ours = S2VT(vocab_size=V, feat_dim=F, length=L, dim_hid=H, dim_embed=E,
                sos_ix=3, eos_ix=4, rnn_type=rnn_type, num_layers=num_layers)
    params = {"params": params_from_torch_state_dict(ref.state_dict())}

    torch.manual_seed(4)
    feats = torch.randn(B, L, F)
    tgts = torch.randint(0, V, (B, L - 1))
    with torch.no_grad():
        want = ref(feats, tgts, mode="train").numpy()
    got = ours.apply(params, jnp.asarray(feats.numpy()),
                     jnp.asarray(tgts.numpy()), mode="train",
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)

    with torch.no_grad():
        want_g = ref(feats, mode="test").numpy()
    got_g = np.asarray(ours.apply(params, jnp.asarray(feats.numpy()),
                                  mode="test"))
    np.testing.assert_array_equal(got_g, want_g)


def test_att_baseline_matches_reference_module():
    torch.manual_seed(9)
    ref = ref_att_mod.Att_Baseline(vocab_size=V, dim_feat=F, length=L,
                                   dim_hid=H, dim_embed=E, sos_ix=3, eos_ix=4)
    ref.eval()
    ours = AttBaseline(vocab_size=V, dim_feat=F, length=L, dim_hid=H,
                       dim_embed=E, sos_ix=3, eos_ix=4,
                       att_mode="reference_sum")
    params = {"params": params_from_torch_state_dict(ref.state_dict())}
    torch.manual_seed(3)
    feats = torch.randn(B, L, F)
    tgts = torch.randint(0, V, (B, L - 1))
    with torch.no_grad():
        want = ref(feats, tgts, mode="train").numpy()
    got = ours.apply(params, jnp.asarray(feats.numpy()),
                     jnp.asarray(tgts.numpy()), mode="train",
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)

    with torch.no_grad():
        want_g = ref(feats, mode="test").numpy()
    got_g = np.asarray(ours.apply(params, jnp.asarray(feats.numpy()),
                                  mode="test"))
    np.testing.assert_array_equal(got_g, want_g)
