"""Checkpointing: orbax pytree checkpoints + config snapshot.

Replaces the reference's whole-module pickles (``torch.save(model, ...)``,
/root/reference/train.py:165-175, utils.py:74-80) with the TPU-era layout:
a directory per checkpoint holding the param/opt-state pytree (orbax) plus
an ``opt.json`` config snapshot (the analog of '{ts}opt.txt',
train.py:51-53). Three flavors are produced by the Trainer, mapping 1:1 to
the reference's: best-val ('stop'), periodic ('{epoch}'), final ('final').

Unlike ``torch.load`` unpickling (eval.py:41) — which needs the class
importable and attribute patch-ups (eval.py:84-86) — restore here is pure
data against an abstract tree, with the model rebuilt from the config.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, tree: Any, config_json: Optional[str] = None,
                    overwrite: bool = True) -> str:
    """Save a pytree checkpoint to ``path`` (directory). Returns the path."""
    path = os.path.abspath(path)
    if overwrite and os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr = _checkpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    if config_json is not None:
        with open(os.path.join(path, "opt.json"), "w", encoding="utf-8") as f:
            f.write(config_json)
    return path


def restore_checkpoint(path: str, abstract_tree: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint. ``abstract_tree`` (e.g. the result of
    ``jax.eval_shape`` on init) pins structure/dtypes/shardings."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if abstract_tree is not None:
        abstract_tree = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, abstract_tree)
        return ckptr.restore(path, abstract_tree)
    return ckptr.restore(path)


def load_config(path: str) -> Optional[dict]:
    p = os.path.join(os.path.abspath(path), "opt.json")
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return json.load(f)
