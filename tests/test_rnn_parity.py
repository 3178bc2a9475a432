"""Numerical parity of the JAX RNN/linear/embedding cores against torch CPU.

These are the foundation of greedy token-for-token parity (SURVEY.md §7):
if the cell math matches torch bit-for-bit (up to f32 roundoff), the model
stack above inherits it.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from s2vt_tpu.ops import (
    LSTMState,
    rnn_sequence,
    multilayer_rnn,
    multilayer_step,
    apply_linear,
)

ATOL = 2e-5


def torch_lstm_params_to_jax(lstm: torch.nn.LSTM, layer: int = 0, reverse: bool = False):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "w_ih": jnp.asarray(getattr(lstm, f"weight_ih{sfx}").detach().numpy()),
        "w_hh": jnp.asarray(getattr(lstm, f"weight_hh{sfx}").detach().numpy()),
        "b_ih": jnp.asarray(getattr(lstm, f"bias_ih{sfx}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(lstm, f"bias_hh{sfx}").detach().numpy()),
    }


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_single_layer_sequence_matches_torch(rnn_type):
    torch.manual_seed(0)
    B, T, IN, H = 3, 11, 7, 5
    cls = torch.nn.LSTM if rnn_type == "lstm" else torch.nn.GRU
    t_rnn = cls(IN, H, batch_first=True)
    x = torch.randn(B, T, IN)
    with torch.no_grad():
        t_out, t_state = t_rnn(x)

    params = torch_lstm_params_to_jax(t_rnn)
    j_out, j_final = rnn_sequence(jnp.asarray(x.numpy()), params, rnn_type=rnn_type)

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)
    if rnn_type == "lstm":
        np.testing.assert_allclose(np.asarray(j_final.h), t_state[0][0].numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(j_final.c), t_state[1][0].numpy(), atol=ATOL)
    else:
        np.testing.assert_allclose(np.asarray(j_final.h), t_state[0].numpy(), atol=ATOL)


def test_lstm_with_initial_state_matches_torch():
    torch.manual_seed(1)
    B, T, IN, H = 2, 6, 4, 8
    t_rnn = torch.nn.LSTM(IN, H, batch_first=True)
    x = torch.randn(B, T, IN)
    h0 = torch.randn(1, B, H)
    c0 = torch.randn(1, B, H)
    with torch.no_grad():
        t_out, _ = t_rnn(x, (h0, c0))

    params = torch_lstm_params_to_jax(t_rnn)
    state0 = LSTMState(jnp.asarray(h0[0].numpy()), jnp.asarray(c0[0].numpy()))
    j_out, _ = rnn_sequence(jnp.asarray(x.numpy()), params, h0=state0)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)


def test_bidirectional_lstm_matches_torch():
    torch.manual_seed(2)
    B, T, IN, H = 2, 9, 5, 6
    t_rnn = torch.nn.LSTM(IN, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, IN)
    with torch.no_grad():
        t_out, _ = t_rnn(x)

    fwd = torch_lstm_params_to_jax(t_rnn, 0, False)
    bwd = torch_lstm_params_to_jax(t_rnn, 0, True)
    j_out, _ = multilayer_rnn(jnp.asarray(x.numpy()), [(fwd, bwd)],
                              bidirectional=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)


def test_two_layer_lstm_matches_torch():
    torch.manual_seed(3)
    B, T, IN, H = 2, 7, 4, 5
    t_rnn = torch.nn.LSTM(IN, H, batch_first=True, num_layers=2)
    x = torch.randn(B, T, IN)
    with torch.no_grad():
        t_out, _ = t_rnn(x)

    layers = [torch_lstm_params_to_jax(t_rnn, 0), torch_lstm_params_to_jax(t_rnn, 1)]
    j_out, _ = multilayer_rnn(jnp.asarray(x.numpy()), layers)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=ATOL)


def test_stepwise_equals_sequence():
    """multilayer_step iterated must equal the scan sequence exactly —
    this is what makes greedy decode consistent with teacher forcing."""
    key = jax.random.PRNGKey(0)
    from s2vt_tpu.ops import init_lstm_params, zero_state
    B, T, IN, H = 2, 5, 3, 4
    params = [init_lstm_params(key, IN, H)]
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, IN))
    seq_out, seq_final = rnn_sequence(xs, params[0])

    states = zero_state(B, H)
    outs = []
    for t in range(T):
        states, o = multilayer_step(states, xs[:, t], params)
        outs.append(o)
    step_out = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_out), np.asarray(seq_out), atol=1e-6)
    np.testing.assert_allclose(np.asarray(states[0].h), np.asarray(seq_final.h), atol=1e-6)


def test_linear_matches_torch():
    torch.manual_seed(4)
    lin = torch.nn.Linear(6, 9)
    x = torch.randn(3, 6)
    with torch.no_grad():
        t_y = lin(x)
    j_y = apply_linear(jnp.asarray(x.numpy()),
                       jnp.asarray(lin.weight.detach().numpy()),
                       jnp.asarray(lin.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(j_y), t_y.numpy(), atol=ATOL)


def test_load_reference_checkpoint_whole_module(tmp_path):
    """Round-trip a whole-module pickle the way the reference saves models
    (torch.save(model), train.py:165-175): the class lives in its own
    module file, exactly like unpickling a real reference checkpoint."""
    import sys
    import textwrap

    import torch

    repo = tmp_path / "refrepo"
    repo.mkdir()
    (repo / "S2VTModel.py").write_text(textwrap.dedent("""
        import torch.nn as nn

        class S2VT(nn.Module):
            def __init__(self):
                super().__init__()
                self.vid_rnn = nn.LSTM(8, 8, batch_first=True)
                self.feat_linear = nn.Linear(4, 8)
                self.embedding = nn.Embedding(10, 8)
    """))
    cached = sys.modules.pop("S2VTModel", None)  # other tests import the
    sys.path.insert(0, str(repo))                # real reference module
    try:
        import S2VTModel as ref_mod
        model = ref_mod.S2VT()
        torch.save(model, tmp_path / "ckpt.pth")
        del sys.modules["S2VTModel"]
    finally:
        sys.path.pop(0)
        if cached is not None:
            sys.modules["S2VTModel"] = cached

    from s2vt_tpu.utils.torch_import import load_reference_checkpoint
    params = load_reference_checkpoint(str(tmp_path / "ckpt.pth"),
                                       reference_repo=str(repo))
    assert params["vid_rnn"]["l0"]["w_ih"].shape == (32, 8)
    assert params["feat_linear"]["weight"].shape == (8, 4)
    assert params["embedding"]["weight"].shape == (10, 8)
