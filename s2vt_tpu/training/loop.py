"""The training harness: jitted data-parallel train/eval steps + epoch loop.

Capability parity with /root/reference/train.py:56-179 (Adam, reduce-on-
plateau, early stopping, tensorboard scalars + weight histograms, periodic /
best / final checkpoints), redesigned TPU-first:

 - ONE jitted train step (value_and_grad -> optax update) with donated
   state; the reference's per-batch ``loss.item()`` D2H sync becomes an
   async device scalar accumulated on device and fetched once per epoch.
 - Data parallel by construction: batches are device_put with the batch dim
   sharded over the mesh's 'data' axis; gradient all-reduce is XLA-inserted.
   The vocab-dim weights may additionally be sharded over 'model'
   (parallel/mesh.py).
 - The learning rate is an optax ``inject_hyperparams`` leaf, so the host-
   side plateau scheduler updates it without recompilation.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s2vt_tpu.config import Opt
from s2vt_tpu.data.dataset import VideoDataset
from s2vt_tpu.models.attention import AttBaseline
from s2vt_tpu.models.s2vt import S2VT
from s2vt_tpu.ops.losses import _token_nll
from s2vt_tpu.parallel import mesh as mesh_lib
from s2vt_tpu.training.callbacks import EarlyStopping, ReduceLROnPlateau
from s2vt_tpu.training.checkpoint import save_checkpoint

# Process-level device-resident feature banks (see Trainer._bank_array):
# (feats_dir, content_ident, n_clips, feat_len, feat_dim, split,
#  store_dtype, device_ids) -> (jax.Array, per-file (path, mtime, size)
# stats used for stale-entry eviction)
_BANK_CACHE: Dict[tuple, tuple] = {}


def batch_loss(logits: jax.Array, labels: jax.Array, mask: jax.Array,
               valid: jax.Array, masked: bool = True) -> jax.Array:
    """Sequence CE with per-sample ``valid`` weights (for padded last batches).

    masked=True: the intended masked-mean CE of MaskCriterion (utils.py:13-26).
    masked=False: the reference's effective loss (plain mean CE over all
    positions, pads included — the reduction='mean' bug, utils.py:11).
    """
    tgt = labels[:, 1:]
    nll = _token_nll(logits, tgt)
    if masked:
        w = mask[:, 1:] * valid[:, None]
    else:
        w = jnp.broadcast_to(valid[:, None], nll.shape)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def build_model(opt: Opt, vocab_size: int, valid_vocab: Optional[int] = None):
    """Model factory dispatching on opt.model ('s2vt' | 'att_baseline').

    ``vocab_size`` may be padded up (Opt.vocab_pad_multiple); pass the real
    corpus vocab as ``valid_vocab`` so decode masks the padding rows."""
    cdt = jnp.bfloat16 if opt.compute_dtype == "bfloat16" else None
    if opt.model == "s2vt":
        return S2VT(vocab_size=vocab_size, feat_dim=opt.feat_dim,
                    length=opt.train_length, dim_hid=opt.dim_hidden,
                    dim_embed=opt.dim_embed, feat_dropout=opt.feat_dropout,
                    rnn_dropout=opt.rnn_dropout, out_dropout=opt.out_dropout,
                    num_layers=opt.num_layers, bidirectional=opt.bidirectional,
                    rnn_type=opt.rnn_type, sos_ix=opt.sos_ix, eos_ix=opt.eos_ix,
                    compute_dtype=cdt, use_pallas=opt.use_pallas,
                    valid_vocab=valid_vocab)
    if opt.model == "att_baseline":
        return AttBaseline(vocab_size=vocab_size, dim_feat=opt.feat_dim,
                           length=opt.train_length, dim_hid=opt.dim_hidden,
                           dim_embed=opt.dim_embed, feat_dropout=opt.feat_dropout,
                           out_dropout=opt.out_dropout, sos_ix=opt.sos_ix,
                           eos_ix=opt.eos_ix, compute_dtype=cdt,
                           use_pallas=opt.use_pallas,
                           valid_vocab=valid_vocab)
    raise ValueError(f"unknown model {opt.model!r}")


class Trainer:
    """End-to-end training driver (the train() analog, train.py:56-179)."""

    def __init__(self, opt: Opt, mesh=None, model=None,
                 train_ds: Optional[VideoDataset] = None,
                 valid_ds: Optional[VideoDataset] = None,
                 writer: Any = "auto"):
        self.opt = opt
        self.train_ds = train_ds or VideoDataset(
            opt.caption_file, opt.feats_path, max_len=opt.train_length,
            mode="train", seed=opt.seed)
        self.valid_ds = valid_ds or VideoDataset(
            opt.caption_file, opt.feats_path, max_len=opt.train_length,
            mode="valid", seed=opt.seed)
        # Resolve special tokens from the corpus instead of trusting the
        # hardcoded 3/4 (the reference's quirk, S2VTModel.py:12).
        sp = self.train_ds.specials
        self.opt = opt = opt.replace(**sp)

        if self.train_ds.feat_len != opt.train_length:
            raise ValueError(
                f"feature length {self.train_ds.feat_len} != train_length "
                f"{opt.train_length}; S2VT requires them equal (the reference "
                f"states this at train.py:26)")
        if self.train_ds.feat_dim != opt.feat_dim:
            raise ValueError(f"feature dim {self.train_ds.feat_dim} != "
                             f"opt.feat_dim {opt.feat_dim}")

        self.vocab_size = mesh_lib.pad_to_multiple(
            self.train_ds.vocab_size, opt.vocab_pad_multiple)
        self.model = model or build_model(opt, self.vocab_size,
                                          valid_vocab=self.train_ds.vocab_size)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()

        # adamw(weight_decay=0) is exactly adam (the reference's optimizer,
        # train.py:89-93); Opt.weight_decay>0 enables decoupled decay — the
        # knob the reference exposes commented-out at train.py:48,92.
        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=opt.lr, weight_decay=opt.weight_decay)

        rng = jax.random.PRNGKey(opt.seed)
        init_rng, self.dropout_base = jax.random.split(rng)
        L, D = self.train_ds.feat_len, self.train_ds.feat_dim
        feats0 = jnp.zeros((2, L, D), jnp.float32)
        tgt0 = jnp.zeros((2, opt.train_length - 1), jnp.int32)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, feats0, tgt0,
            mode="train", deterministic=True)
        self.params = variables["params"]
        if opt.glove_path:
            from s2vt_tpu.data.glove import warm_start_embedding
            self.params = warm_start_embedding(
                self.params, opt.glove_path, self.train_ds.word2ix,
                seed=opt.seed)
        # Place params per the mesh layout, then give opt_state the same
        # explicit treatment (moments sharded exactly like their params).
        p_sh = mesh_lib.param_shardings(self.mesh, self.params)
        self.params = jax.device_put(self.params, p_sh)
        self.opt_state = self.tx.init(self.params)
        self.opt_state = jax.device_put(
            self.opt_state,
            mesh_lib.opt_state_shardings(self.mesh, self.params, self.opt_state))
        self.batch_sharding = mesh_lib.batch_sharding(self.mesh)

        # Device-resident feature bank: for MSVD-scale data the whole
        # feature set fits HBM many times over, so stream it up ONCE and
        # gather batches on device by row index — the per-step H2D payload
        # drops from [B, L, feat_dim] floats to a few KB of labels+rows
        # (the tunnel/PCIe link stops being the training bottleneck).
        # Streaming mode remains for datasets over the budget.
        # Storage/transfer dtype for features (Opt.bank_dtype): bf16
        # halves the bank upload + HBM and the streaming H2D payload,
        # and is numerically equivalent because every matmul casts its
        # operands to compute_dtype at use anyway.
        if opt.bank_dtype not in ("auto", "bfloat16", "float32"):
            raise ValueError(
                f"Opt.bank_dtype={opt.bank_dtype!r}: expected 'auto', "
                "'bfloat16', or 'float32' (a typo here would otherwise "
                "silently store the bank in float32)")
        bd = opt.bank_dtype if opt.bank_dtype != "auto" else opt.compute_dtype
        if bd == "bfloat16":
            import ml_dtypes
            self._feat_store_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            self._feat_store_dtype = np.dtype(np.float32)

        fb = opt.device_feature_bank
        stored_nbytes = ((self.train_ds.nbytes() + self.valid_ds.nbytes())
                         * self._feat_store_dtype.itemsize // 4)
        self.use_feature_bank = fb == "on" or (
            fb == "auto" and stored_nbytes <= opt.feature_bank_max_bytes)
        if self.use_feature_bank:
            rep = mesh_lib.replicate_sharding(self.mesh)
            # chunked upload: one multi-GB device_put is a single RPC on
            # tunneled runtimes and can stall; 32MB slices (the
            # device_put_chunked default) stream fine.
            self._bank = {
                "train": self._bank_array(self.train_ds, "train", rep),
                "valid": self._bank_array(self.valid_ds, "valid", rep),
            }

        self._train_step = self._make_train_step()
        self._eval_step = self._make_eval_step()

        self.plateau = ReduceLROnPlateau(opt.lr, patience=opt.learning_rate_patience)
        self.early = EarlyStopping(patience=opt.early_stopping_patience,
                                   save_fn=lambda: self.save("stop"))
        self.history: Dict[str, list] = {"train_loss": [], "valid_loss": [],
                                         "lr": [], "clips_per_sec": []}
        self.writer = self._make_writer() if writer == "auto" else writer

    # ------------------------------------------------------------------

    def _bank_array(self, ds, split: str, sharding):
        """Upload (or re-use) one split's device-resident feature bank.

        With ``opt.feature_bank_cache`` on, the uploaded array is kept in a
        process-level cache keyed by the on-disk dataset identity and the
        device set, so consecutive Trainer instances over the same data
        (hyper-parameter sweeps, the bench's e2e stages) skip the multi-GB
        host read + H2D upload — on a tunneled chip that is ~100s per run.
        Off by default: the cache intentionally outlives the Trainer, which
        keeps the bank's HBM resident until process exit."""
        def load():
            feats = ds.load_all_features()
            if feats.dtype != self._feat_store_dtype:
                feats = feats.astype(self._feat_store_dtype)
            return feats

        if not self.opt.feature_bank_cache:
            return mesh_lib.device_put_chunked(load(), sharding)
        # The key must pin the bank's CONTENT and ROW ORDER, not just its
        # shape: row order comes from the captions file's clip list, and
        # a corpus regenerated in-place (same path, same counts, new
        # data) must miss. Hash the ordered file names + (mtime, size)
        # of every feature file — ~2k stats is microseconds vs a
        # multi-GB re-upload, and a stale hit silently trains features
        # against the wrong labels.
        import hashlib
        stats = []
        for p in ds.feat_paths:
            st = p.stat()
            stats.append((str(p), st.st_mtime_ns, st.st_size))
        stats = tuple(stats)
        ident = hashlib.sha1(repr(stats).encode()).hexdigest()
        key = (str(ds.feat_paths[0].parent), ident, len(ds),
               ds.feat_len, ds.feat_dim, split, self._feat_store_dtype.str,
               tuple(d.id for d in self.mesh.devices.flat))
        entry = _BANK_CACHE.get(key)
        if entry is None or entry[0].is_deleted():
            # Evict STALE entries: any cached bank whose recorded file
            # stats no longer match the filesystem (its corpus was
            # regenerated or removed) would otherwise pin multi-GB of
            # HBM for the process lifetime with an unmatchable key.
            # Entries that still stat-match are kept — two corpora may
            # legitimately share one features directory (different
            # caption subsets), and evicting by directory would make
            # them thrash the cache. Pop only (no .delete()): an
            # earlier Trainer may still hold an evicted bank; its HBM
            # frees when that reference dies.
            import os
            for k in list(_BANK_CACHE):
                _, k_stats = _BANK_CACHE[k]
                for path, mtime_ns, size in k_stats:
                    try:
                        st = os.stat(path)
                        fresh = (st.st_mtime_ns == mtime_ns
                                 and st.st_size == size)
                    except OSError:
                        fresh = False
                    if not fresh:
                        _BANK_CACHE.pop(k)
                        break
            cached = mesh_lib.device_put_chunked(load(), sharding)
            _BANK_CACHE[key] = (cached, stats)
            return cached
        return entry[0]

    def _make_writer(self):
        try:
            from tensorboardX import SummaryWriter
            return SummaryWriter(self.opt.log_dir)
        except Exception:
            return None

    def _loss_fn(self, params, rng, feats, labels, mask, valid, deterministic):
        logits = self.model.apply(
            {"params": params}, feats, labels[:, :-1], mode="train",
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng})
        return batch_loss(logits, labels, mask, valid,
                          masked=self.opt.masked_loss)

    def _make_train_step(self):
        def update(params, opt_state, rng, feats, labels, mask, valid):
            loss, grads = jax.value_and_grad(
                lambda p: self._loss_fn(p, rng, feats, labels, mask, valid,
                                        deterministic=False))(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.use_feature_bank:
            def step(params, opt_state, rng, bank, rows, labels, mask, valid):
                return update(params, opt_state, rng,
                              jnp.take(bank, rows, axis=0),  # on-device gather
                              labels, mask, valid)
        else:
            step = update
        donate = (0, 1) if self.opt.donate_state else ()
        return jax.jit(step, donate_argnums=donate)

    def _make_eval_step(self):
        def eval_loss(params, feats, labels, mask, valid):
            return self._loss_fn(params, None, feats, labels, mask, valid,
                                 deterministic=True)

        if self.use_feature_bank:
            def step(params, bank, rows, labels, mask, valid):
                return eval_loss(params, jnp.take(bank, rows, axis=0),
                                 labels, mask, valid)
        else:
            step = eval_loss
        return jax.jit(step)

    def _put(self, batch):
        if self.use_feature_bank:
            return mesh_lib.shard_batch_arrays(
                self.mesh, batch.rows, batch.labels.astype(np.int32),
                batch.mask, batch.valid)
        feats = batch.feats
        if feats.dtype != self._feat_store_dtype:
            feats = feats.astype(self._feat_store_dtype)  # halves the
            #   per-batch H2D payload when storing bf16
        return mesh_lib.shard_batch_arrays(
            self.mesh, feats, batch.labels.astype(np.int32),
            batch.mask, batch.valid)

    def _set_lr(self, lr: float) -> None:
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        self.opt_state = self.opt_state._replace(hyperparams=hp)

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> tuple:
        from s2vt_tpu.data.dataset import prefetch_to_device
        losses = []
        clips = 0
        t0 = time.time()
        rng_epoch = jax.random.fold_in(self.dropout_base, epoch)
        batches = self.train_ds.batches(
            self.opt.batch_size, epoch=epoch,
            include_feats=not self.use_feature_bank)
        for i, (batch, dev) in enumerate(prefetch_to_device(
                batches, self._put, depth=self.opt.prefetch_depth)):
            rng = jax.random.fold_in(rng_epoch, i)
            # bank mode: dev = (rows, labels, mask, valid), the bank is
            # prepended; streaming: dev = (feats, labels, mask, valid)
            extra = ((self._bank["train"],) if self.use_feature_bank else ())
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, rng, *extra, *dev)
            losses.append(loss)  # device scalar; no sync until epoch end
            clips += int(batch.valid.sum())
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        return mean_loss, clips / max(time.time() - t0, 1e-9)

    def valid_epoch(self, epoch: int) -> float:
        from s2vt_tpu.data.dataset import prefetch_to_device
        losses, weights = [], []
        batches = self.valid_ds.batches(self.opt.batch_size, shuffle=False,
                                        epoch=epoch,
                                        include_feats=not self.use_feature_bank)
        extra = ((self._bank["valid"],) if self.use_feature_bank else ())
        for batch, dev in prefetch_to_device(batches, self._put,
                                             depth=self.opt.prefetch_depth):
            losses.append(self._eval_step(self.params, *extra, *dev))
            weights.append(float(batch.valid.sum()))
        w = np.asarray(weights)
        # one stacked D2H fetch, not one per batch (each sync is a full
        # RPC round-trip on tunneled runtimes)
        return float(np.sum(np.asarray(jnp.stack(losses)) * w) / w.sum())

    def fit(self, epochs: Optional[int] = None,
            on_epoch_end: Optional[Callable] = None) -> Dict[str, list]:
        opt = self.opt
        os.makedirs(opt.save_path, exist_ok=True)
        from s2vt_tpu.config import save_opt
        save_opt(opt, os.path.join(opt.save_path, opt.start_time + "opt.json"))

        if opt.resume_path:
            self.restore(opt.resume_path)

        epochs = opt.EPOCHS if epochs is None else epochs

        # Preemption safety (beyond the reference's KeyboardInterrupt-only
        # handling, train.py:170-175): TPU reservations deliver SIGTERM
        # before eviction — finish the current epoch, fall through to the
        # 'final' checkpoint, and exit cleanly so --resume_path continues.
        import signal
        self._stop_requested = False

        def _on_sigterm(signum, frame):
            self._stop_requested = True

        # signal.signal returns None both when no Python handler was set
        # and when the prior handler was installed from C, so a separate
        # ``registered`` flag (not prev_handler's None-ness) decides whether
        # to restore — and restoration happens only AFTER the final
        # checkpoint below, so a late SIGTERM during that save still hits
        # our no-op handler instead of killing the process mid-write.
        registered, prev_handler = False, None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
            registered = True
        except ValueError:            # not in the main thread
            pass
        try:
            self._fit_epochs(epochs, on_epoch_end)
            self.save("final", blocking=True)
        finally:
            if registered:
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)
        if self.writer is not None:
            self.writer.flush()
        return self.history

    def _fit_epochs(self, epochs: int, on_epoch_end: Optional[Callable]) -> None:
        opt = self.opt
        try:
            for epoch in range(epochs):
                if opt.profile and epoch == 0:
                    from s2vt_tpu.utils.profiling import trace
                    with trace(os.path.join(opt.log_dir, "profile")):
                        train_loss, cps = self.train_epoch(epoch)
                else:
                    train_loss, cps = self.train_epoch(epoch)
                valid_loss = self.valid_epoch(epoch)

                lr = self.plateau.step(valid_loss)
                self._set_lr(lr)

                self.history["train_loss"].append(train_loss)
                self.history["valid_loss"].append(valid_loss)
                self.history["lr"].append(lr)
                self.history["clips_per_sec"].append(cps)
                self._log_epoch(epoch, train_loss, valid_loss, lr)
                if (opt.metric_eval_freq > 0
                        and (epoch + 1) % opt.metric_eval_freq == 0):
                    self._metric_eval(epoch)

                if on_epoch_end is not None:
                    on_epoch_end(self, epoch)
                if self.early(valid_loss):
                    break
                if epoch % opt.save_freq == 0:
                    self.save(str(epoch))
                if self._stop_requested:
                    break
        except KeyboardInterrupt:
            if self.writer is not None:
                self.writer.flush()

    def _log_epoch(self, epoch, train_loss, valid_loss, lr):
        if self.writer is None:
            return
        # Same scalar tags as the reference (train.py:131,149-150).
        self.writer.add_scalar("train_loss", train_loss, global_step=epoch)
        self.writer.add_scalar("valid_loss", valid_loss, global_step=epoch)
        self.writer.add_scalar("lr", lr, global_step=epoch)
        self.writer.add_scalar("clips_per_sec",
                               self.history["clips_per_sec"][-1], global_step=epoch)
        if epoch % self.opt.histogram_freq == 0:
            flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
            for path, leaf in flat:
                name = "/".join(getattr(k, "key", str(k)) for k in path)
                self.writer.add_histogram(name, np.asarray(leaf), epoch)

    def _metric_eval(self, epoch: int) -> Optional[dict]:
        """Greedy-decode the valid split and log BLEU/METEOR/ROUGE/CIDEr
        (new capability — the reference only tracks losses)."""
        import json

        from s2vt_tpu.evaluation.decode import CaptionDecoder
        from s2vt_tpu.evaluation.scorer import score_predictions

        try:
            with open(self.opt.gts_file, encoding="utf-8") as f:
                gts = json.load(f)["gts"]
        except FileNotFoundError:
            return None
        # Build the decoder (and its jitted decode fn) once; swap params in.
        # Bank mode: decode gathers from the HBM-resident valid features
        # instead of re-streaming the split on every metric eval.
        if not hasattr(self, "_metric_decoder"):
            self._metric_decoder = CaptionDecoder(
                self.model, None, self.valid_ds,
                feature_bank=(self._bank["valid"]
                              if self.use_feature_bank else None))
        dec = self._metric_decoder
        dec.params = self.params
        preds = dec.greedy(self.opt.eval_batch_size)
        scores = score_predictions(preds, gts, verbose=False)
        self.history.setdefault("metrics", []).append(
            {"epoch": epoch, **scores})
        if self.writer is not None:
            for name, value in scores.items():
                self.writer.add_scalar(f"valid/{name}", value,
                                       global_step=epoch)
        return scores

    def save(self, tag: str, blocking: Optional[bool] = None) -> str:
        """Write a checkpoint. With Opt.async_checkpoint (default) the
        D2H fetch + disk write run on orbax's background thread and the
        epoch loop continues immediately; the state is SNAPSHOTTED on
        device first (jnp.copy) so the train step's donated buffers
        cannot corrupt an in-flight save. 'final' is always blocking."""
        if blocking is None:
            blocking = not self.opt.async_checkpoint
        path = os.path.join(self.opt.save_path, self.opt.start_time + tag)
        if blocking:
            state = {"params": jax.device_get(self.params),
                     "opt_state": jax.device_get(self.opt_state)}
        else:
            state = jax.tree_util.tree_map(
                jnp.copy, {"params": self.params,
                           "opt_state": self.opt_state})
        tree = {**state,
                "plateau": self.plateau.state_dict(),
                "early": self.early.state_dict()}
        return save_checkpoint(path, tree, config_json=self.opt.to_json(),
                               blocking=blocking)

    def restore(self, path: str) -> None:
        from s2vt_tpu.training.checkpoint import restore_checkpoint
        tree = {"params": jax.device_get(self.params),
                "opt_state": jax.device_get(self.opt_state),
                "plateau": self.plateau.state_dict(),
                "early": self.early.state_dict()}
        restored = restore_checkpoint(path, tree)
        p_sh = mesh_lib.param_shardings(self.mesh, restored["params"])
        self.params = jax.device_put(restored["params"], p_sh)
        self.opt_state = jax.device_put(
            restored["opt_state"],
            mesh_lib.opt_state_shardings(self.mesh, self.params,
                                         restored["opt_state"]))
        self.plateau.load_state_dict(restored["plateau"])
        self.early.load_state_dict(restored["early"])
