"""Import reference (PyTorch) checkpoints into s2vt_tpu param trees.

The reference saves whole pickled ``nn.Module`` objects via ``torch.save``
(/root/reference/train.py:165-175, utils.py:74-80); loading one yields a
state_dict whose tensor names map 1:1 onto our param trees:

  torch S2VT (S2VTModel.py:19-28)        s2vt_tpu S2VT
  ------------------------------------   --------------------------
  vid_rnn.weight_ih_l{i}[_reverse]    -> vid_rnn/l{i}[_reverse]/w_ih
  vid_rnn.weight_hh_l{i}              -> vid_rnn/l{i}/w_hh
  vid_rnn.bias_ih_l{i} / bias_hh_l{i} -> .../b_ih, b_hh
  word_rnn.*                          -> word_rnn/*
  feat_linear.weight/.bias            -> feat_linear/weight, bias
  out_linear.weight/.bias             -> out_linear/weight, bias
  embedding.weight                    -> embedding/weight

  torch Att_Baseline (attention_baseline.py:23-33): encoder, decoder,
  feat_linear, embedding, out_linear, att_enc, att_prev_hid, att_apply
  map the same way.

All weights keep torch layout ([out, in] linears, [gates*H, ·] RNNs), so the
import is a pure rename — no transposes.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def state_dict_to_numpy(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Accepts a torch state_dict (tensors) or already-numpy mapping."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


_RNN_KEY = re.compile(r"^(?P<mod>\w+)\.(?P<kind>weight|bias)_(?P<gate>ih|hh)_l(?P<layer>\d+)(?P<rev>_reverse)?$")
_LIN_KEY = re.compile(r"^(?P<mod>\w+)\.(?P<kind>weight|bias)$")


def params_from_torch_state_dict(state_dict: Mapping) -> dict:
    """Generic rename of a reference-model state_dict into a flax param tree.

    Works for both S2VT and Att_Baseline shapes since both are flat
    compositions of nn.LSTM / nn.Linear / nn.Embedding.
    """
    sd = state_dict_to_numpy(state_dict)
    params: dict = {}
    for key, val in sd.items():
        m = _RNN_KEY.match(key)
        if m:
            mod = m.group("mod")
            layer = f"l{m.group('layer')}" + ("_reverse" if m.group("rev") else "")
            leaf = ("w_" if m.group("kind") == "weight" else "b_") + m.group("gate")
            params.setdefault(mod, {}).setdefault(layer, {})[leaf] = jnp.asarray(val)
            continue
        m = _LIN_KEY.match(key)
        if m:
            params.setdefault(m.group("mod"), {})[m.group("kind")] = jnp.asarray(val)
            continue
        raise KeyError(f"unrecognized reference checkpoint key: {key!r}")
    return params


def load_reference_checkpoint(path: str, reference_repo: str = None) -> dict:
    """Load a reference ``.pth`` (a whole pickled nn.Module,
    /root/reference/train.py:165-175) and convert to a flax param tree.

    Unpickling a whole module requires the class definition importable
    under its original module name (the reference pickles reference
    ``S2VTModel.S2VT`` / ``attention_baseline.Att_Baseline`` classes);
    pass ``reference_repo`` to put that checkout on sys.path for the load.
    Plain state_dict checkpoints load without it.
    """
    import sys

    import torch

    inserted = reference_repo is not None and reference_repo not in sys.path
    if inserted:
        sys.path.insert(0, reference_repo)
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        if inserted:
            sys.path.remove(reference_repo)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return params_from_torch_state_dict(obj)
