"""Inference harness: greedy / beam caption decoding over a dataset split.

Capability parity with /root/reference/eval.py:30-99 (``eval()`` and
``beam_eval()``), redesigned TPU-first:

 - The reference decodes with per-token ``.item()`` D2H syncs inside a
   Python loop (eval.py:54-58 via S2VTModel.py:98-107). Here the entire
   batch decode is ONE jitted call returning an int token matrix; the only
   host work is the final ids->words join.
 - The reference unpickles a whole nn.Module (``torch.load``, eval.py:41)
   and patches missing attributes (eval.py:84-86). Here the model is rebuilt
   from the checkpoint's config snapshot and the params restored as a pytree
   (training/checkpoint.py).
 - Batches are fixed-shape with a ``valid`` row mask, so one compile serves
   the whole split including the padded last batch.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from s2vt_tpu.data.dataset import VideoDataset


def ids_to_sentence(ids, ix2word: Dict[int, str], eos_ix: int,
                    sos_ix: Optional[int] = None, pad_ix: int = 0) -> str:
    """Token ids -> sentence, truncated at the first <eos> (eval.py:54-58).

    When ``sos_ix`` is given, leading <sos> tokens are stripped too (the
    beam path emits them, eval.py:91-95).
    """
    words: List[str] = []
    for ix in np.asarray(ids).tolist():
        if ix == eos_ix:
            break
        if sos_ix is not None and ix == sos_ix and not words:
            continue
        if ix == pad_ix:
            continue
        words.append(ix2word.get(int(ix), "<unk>"))
    return " ".join(words)


class CaptionDecoder:
    """Jitted batch decoding over a ``VideoDataset`` split.

    Pass a ``jax.sharding.Mesh`` to decode data-parallel: params get their
    mesh placement (vocab-dim TP included) and each batch's leading dim is
    sharded over the 'data' axis — serving throughput scales with chips.
    Batch size must divide by the data-axis size.
    """

    def __init__(self, model, params, dataset: VideoDataset,
                 beam_width: int = 3, max_beam_depth: int = 30,
                 beam_score_mode: str = "cumulative", mesh=None,
                 feature_bank=None):
        """``feature_bank``: optional device-resident [N, L, D] array
        aligned with ``dataset.feat_paths`` (Trainer's bank). When given,
        batches skip feature IO/H2D entirely and feats are gathered on
        device by row index — repeated decodes (in-training metric eval)
        stop re-streaming the split every call."""
        self.model = model
        self.dataset = dataset
        self.mesh = mesh
        self.bank = feature_bank
        if feature_bank is not None:
            self._gather = jax.jit(
                lambda bank, rows: jax.numpy.take(bank, rows, axis=0))
        if mesh is not None and params is not None:
            from s2vt_tpu.parallel import mesh as mesh_lib
            params = jax.device_put(params,
                                    mesh_lib.param_shardings(mesh, params))
        self.params = params
        sp = dataset.specials
        self.eos_ix, self.sos_ix = sp["eos_ix"], sp["sos_ix"]
        self.pad_ix = sp["pad_ix"]
        self.beam_width, self.max_beam_depth = beam_width, max_beam_depth

        self._greedy = jax.jit(lambda p, f: self.model.apply(
            {"params": p}, f, mode="test"))
        self._beam = jax.jit(lambda p, f: self.model.apply(
            {"params": p}, f, mode="beam_search", beam_width=beam_width,
            max_beam_depth=max_beam_depth, beam_score_mode=beam_score_mode))

    def _put(self, feats):
        if self.mesh is None:
            return feats
        from s2vt_tpu.parallel import mesh as mesh_lib
        return jax.device_put(feats, mesh_lib.batch_sharding(self.mesh))

    def _run(self, batch_size: int, decode_fn: Callable) -> Dict[str, str]:
        preds: Dict[str, str] = {}
        for batch in self.dataset.batches(batch_size, shuffle=False,
                                          include_feats=self.bank is None):
            if self.bank is not None:
                feats = self._gather(self.bank, self._put(batch.rows))
            else:
                feats = self._put(batch.feats)
            out = decode_fn(self.params, feats)
            for row, vid in enumerate(batch.ids):
                if batch.valid[row] == 0.0 or not vid:
                    continue
                preds[vid] = self._to_sentence(out, row)
        return preds

    def greedy(self, batch_size: int = 10) -> Dict[str, str]:
        """{video_id: caption} over the split (eval.py:30-60 semantics)."""
        self._mode = "greedy"
        return self._run(batch_size, self._greedy)

    def beam(self, batch_size: int = 10) -> Dict[str, str]:
        """Best-beam captions (eval.py:63-99 semantics: strip <sos>/<eos>)."""
        self._mode = "beam"
        return self._run(batch_size, self._beam)

    def _to_sentence(self, out, row: int) -> str:
        if self._mode == "greedy":
            ids = np.asarray(out)[row]
            return ids_to_sentence(ids, self.dataset.ix2word, self.eos_ix,
                                   pad_ix=self.pad_ix)
        # beam: tokens [B, W, D+1] sorted by score desc; take beam 0,
        # skip the <sos> history slot.
        ids = np.asarray(out.tokens)[row, 0, 1:]
        return ids_to_sentence(ids, self.dataset.ix2word, self.eos_ix,
                               sos_ix=self.sos_ix, pad_ix=self.pad_ix)


def model_from_checkpoint(checkpoint_path: str, real_vocab: int):
    """Rebuild (opt, model, params) from a checkpoint directory — the
    shared assembly used by eval decoding and the captioning CLI."""
    from s2vt_tpu.config import Opt
    from s2vt_tpu.parallel import mesh as mesh_lib
    from s2vt_tpu.training.checkpoint import load_config, restore_checkpoint
    from s2vt_tpu.training.loop import build_model

    cfg = load_config(checkpoint_path)
    opt = Opt(**cfg) if cfg else Opt()
    vocab = mesh_lib.pad_to_multiple(real_vocab, opt.vocab_pad_multiple)
    model = build_model(opt, vocab, valid_vocab=real_vocab)
    restored = restore_checkpoint(checkpoint_path)
    params = jax.tree_util.tree_map(np.asarray, restored["params"])
    return opt, model, params


def _decoder_from_checkpoint(checkpoint_path: str, captions_file: str,
                             feats_path: str, mode: str = "test",
                             **kw) -> CaptionDecoder:
    from s2vt_tpu.config import Opt
    from s2vt_tpu.training.checkpoint import load_config

    cfg = load_config(checkpoint_path)
    opt = Opt(**cfg) if cfg else Opt()
    ds = VideoDataset(captions_file or opt.caption_file,
                      feats_path or opt.feats_path,
                      max_len=opt.train_length, mode=mode, seed=opt.seed)
    opt, model, params = model_from_checkpoint(checkpoint_path, ds.vocab_size)
    mesh = None
    if tuple(opt.mesh_shape) != (1, 1):
        from s2vt_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(tuple(opt.mesh_shape))
    return CaptionDecoder(model, params, ds,
                          beam_width=kw.get("beam_width", opt.beam_width),
                          max_beam_depth=kw.get("max_beam_depth",
                                                opt.max_beam_depth),
                          beam_score_mode=kw.get("beam_score_mode",
                                                 opt.beam_score_mode),
                          mesh=mesh)


def greedy_eval(checkpoint_path: str, captions_file: str = None,
                feats_path: str = None, batch_size: int = 10,
                mode: str = "test") -> Dict[str, str]:
    """The ``eval()`` entry point (eval.py:30): checkpoint -> predictions."""
    dec = _decoder_from_checkpoint(checkpoint_path, captions_file, feats_path, mode)
    return dec.greedy(batch_size)


def beam_eval(checkpoint_path: str, captions_file: str = None,
              feats_path: str = None, batch_size: int = 10,
              beam_width: int = 3, max_beam_depth: int = 30,
              mode: str = "test",
              beam_score_mode: str = "cumulative") -> Dict[str, str]:
    """The ``beam_eval()`` entry point (eval.py:63)."""
    dec = _decoder_from_checkpoint(checkpoint_path, captions_file, feats_path,
                                   mode, beam_width=beam_width,
                                   max_beam_depth=max_beam_depth,
                                   beam_score_mode=beam_score_mode)
    return dec.beam(batch_size)
