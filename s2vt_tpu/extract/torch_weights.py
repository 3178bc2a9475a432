"""Import pretrained torch backbone checkpoints into s2vt_tpu param trees.

The reference loads imagenet weights from the ``pretrainedmodels`` zoo
(/root/reference/extract_features.py:50-57). Those checkpoints are torch
state_dicts; this module renames them into the Flax trees built by
extract/backbones.py:

 - path rule: numeric components merge into their parent with '_'
   ('layer1.0.conv1' -> layer1_0/conv1, 'features.4.branch0.0.conv' ->
   features_4/branch0_0/conv, '_features.0' -> _features_0),
 - 4-D conv weights transpose OIHW -> HWIO ('kernel'),
 - 2-D linear weights keep torch [out, in] layout ('weight'),
 - 1-D BN weight/bias/running_mean/running_var -> scale/bias/mean/var,
 - 'last_linear'/'fc' leaves are dropped (replaced by Identity,
   extract_features.py:57,90); 'num_batches_tracked' is dropped.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

_DROP_PREFIXES = ("last_linear", "fc", "classifier")


def _module_path(parts):
    path = []
    for p in parts:
        if p.isdigit() and path:
            path[-1] = f"{path[-1]}_{p}"
        else:
            path.append(p)
    return path


def params_from_torch_backbone(state_dict: Mapping) -> dict:
    params: dict = {}
    for key, val in state_dict.items():
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        val = np.asarray(val)
        parts = key.split(".")
        leaf_name = parts[-1]
        if leaf_name == "num_batches_tracked":
            continue
        path = _module_path(parts[:-1])
        if path and any(path[0] == d or path[0].startswith(d + "_")
                        for d in _DROP_PREFIXES):
            continue

        if leaf_name == "weight":
            if val.ndim == 4:
                leaf, val = "kernel", val.transpose(2, 3, 1, 0)
            elif val.ndim == 1:
                leaf = "scale"  # BatchNorm gamma
            else:
                leaf = "weight"  # torch-layout linear
        elif leaf_name == "bias":
            leaf = "bias"
        elif leaf_name == "running_mean":
            leaf = "mean"
        elif leaf_name == "running_var":
            leaf = "var"
        else:
            raise KeyError(f"unrecognized backbone checkpoint key: {key!r}")

        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(val)
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth state_dict (or pickled module) and convert."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return params_from_torch_backbone(obj)
