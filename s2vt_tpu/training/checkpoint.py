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


_async_ckptr = None
_config_threads: list = []   # watchers that land opt.json at commit time


def _async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import threading

        import orbax.checkpoint as ocp
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        # The opt.json watcher threads are daemons: a process that exits
        # right after a manual non-blocking save() (outside fit(), which
        # ends with a blocking save) would otherwise commit the orbax tree
        # but drop opt.json, and load_config would silently fall back to a
        # default Opt. Plain atexit is too late — threading._shutdown runs
        # first and concurrent.futures' _python_exit flips its shutdown
        # flag, killing the in-flight orbax write itself ("cannot schedule
        # new futures after shutdown"). threading._register_atexit
        # callbacks run BEFORE that flag flips (reverse registration
        # order), so the drain completes while executors still accept work.
        register = getattr(threading, "_register_atexit", None)
        if register is not None:
            register(wait_for_saves)
        else:   # future CPython without the private hook: best effort
            import atexit
            atexit.register(wait_for_saves)
    return _async_ckptr


def _commit_config(path: str, config_json: str) -> None:
    """Watcher-thread body: orbax materializes the checkpoint directory
    only at commit (an atomic tmp-dir rename), so opt.json is written the
    moment the async save lands — the window where a crash or a
    concurrent reader could see a checkpoint without its config is the
    save duration itself, same as a blocking save's."""
    _async_ckptr.wait_until_finished()
    with open(os.path.join(path, "opt.json"), "w", encoding="utf-8") as f:
        f.write(config_json)


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint write has committed
    and its opt.json has been placed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    while _config_threads:
        _config_threads.pop().join()


def save_checkpoint(path: str, tree: Any, config_json: Optional[str] = None,
                    overwrite: bool = True, blocking: bool = True) -> str:
    """Save a pytree checkpoint to ``path`` (directory). Returns the path.

    ``blocking=False`` launches the save on orbax's async checkpointer and
    returns immediately — the D2H fetch + disk write overlap subsequent
    training steps (the per-improvement best-model save is on the epoch
    critical path otherwise). The caller must pass a tree whose device
    buffers will not be DONATED while the save is in flight (Trainer
    snapshots them on device first), and call ``wait_for_saves()`` before
    relying on the files. At most one async save is in flight: a new save
    waits for the previous one (also protecting the rmtree below from
    racing an in-flight write).
    """
    path = os.path.abspath(path)
    wait_for_saves()
    if overwrite and os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    if blocking:
        ckptr = _checkpointer()
        ckptr.save(path, tree)
        ckptr.wait_until_finished()
        if config_json is not None:
            with open(os.path.join(path, "opt.json"), "w",
                      encoding="utf-8") as f:
                f.write(config_json)
    else:
        import threading

        import orbax.checkpoint as ocp
        _async_checkpointer().save(path, args=ocp.args.StandardSave(tree))
        if config_json is not None:
            t = threading.Thread(target=_commit_config,
                                 args=(path, config_json), daemon=True)
            t.start()
            _config_threads.append(t)
    return path


def restore_checkpoint(path: str, abstract_tree: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint. ``abstract_tree`` (e.g. the result of
    ``jax.eval_shape`` on init) pins structure/dtypes/shardings."""
    path = os.path.abspath(path)
    wait_for_saves()   # never read a checkpoint whose async write is in flight
    ckptr = _checkpointer()
    if abstract_tree is not None:
        abstract_tree = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, abstract_tree)
        return ckptr.restore(path, abstract_tree)
    return ckptr.restore(path)


def load_config(path: str) -> Optional[dict]:
    wait_for_saves()   # opt.json may still be deferred behind an async save
    p = os.path.join(os.path.abspath(path), "opt.json")
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return json.load(f)
