"""Fixed-shape host-side batch pipeline.

Replaces the reference's ``VideoDataset`` (/root/reference/dataloader.py:11-53),
which creates CUDA tensors inside ``__getitem__`` (forcing num_workers=0 and
a per-item H2D copy). Here the host assembles contiguous numpy batches with
STATIC shapes — [B, L, feat_dim] feats, [B, L] labels/mask — and the training
layer moves them to device with a single ``jax.device_put`` per batch,
double-buffered via ``prefetch_to_device`` so the next batch's H2D transfer
overlaps the current step's compute. The final partial batch is zero-padded to the
static batch size and carries a per-sample ``valid`` weight so XLA never sees
a dynamic shape.

Semantics kept from the reference:
 - split filtering by feature-file stem (dataloader.py:20-24),
 - one caption sampled uniformly per video per epoch (dataloader.py:41),
   but from a SEEDED generator (the reference's np.random.choice is unseeded),
 - captions truncated / zero-padded to max_len with a 0/1 float mask
   (dataloader.py:43-48).
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Iterator, List, NamedTuple, Optional

import numpy as np

from s2vt_tpu.data.corpus import load_captions, special_token_indices


def _npy_native_compatible(path) -> bool:
    """Header-only probe: True iff the C++ loader can read this file
    (little-endian float32, C-order, 2-D — s2vt_loader.cpp parse_npy_header).
    Files that fail (e.g. float64 or big-endian saves) still load through
    the numpy path, which converts silently."""
    try:
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
            else:
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
    except Exception:
        return False
    return (not fortran and len(shape) == 2
            and dtype == np.dtype("<f4"))


class Batch(NamedTuple):
    feats: Optional[np.ndarray]  # [B, L, feat_dim] float32 (None when the
    #   consumer holds a device-resident feature bank and gathers by `rows`)
    labels: np.ndarray   # [B, max_len] int32
    mask: np.ndarray     # [B, max_len] float32 (1 over real tokens incl. <sos>/<eos>)
    valid: np.ndarray    # [B] float32 (0 for padding samples in the last batch)
    ids: tuple           # video ids (len B; '' for padding samples)
    rows: np.ndarray = None  # [B] int32 dataset row of each sample (0 for
    #   padding samples; row i corresponds to feat_paths[i])


class VideoDataset:
    """Iterable over fixed-shape batches of (features, caption, mask)."""

    def __init__(self, captions_file: str, feat_path: str, max_len: int = 80,
                 mode: str = "train", seed: int = 0,
                 preload: bool = False, backend: str = "auto"):
        """backend: 'numpy' (np.load per file), 'native' (C++ prefetching
        reader pool, native/s2vt_loader.cpp), or 'auto' (native when the
        toolchain can build it, else numpy)."""
        data = load_captions(captions_file)
        self.word2ix: Dict[str, int] = data["word2ix"]
        # JSON round-trip stringifies int keys (the reference indexes
        # ix2word[str(ix)] everywhere, eval.py:54) — normalize to int here.
        self.ix2word: Dict[int, str] = {int(k): v for k, v in data["ix2word"].items()}
        self.captions: Dict[str, list] = data["captions"]
        self.splits = data["splits"]
        self.specials = special_token_indices(self.word2ix)

        split_set = set(self.splits[mode])
        self.feat_paths: List[pathlib.Path] = sorted(
            p for p in pathlib.Path(feat_path).glob("*.npy") if p.stem in split_set)
        if not self.feat_paths:
            raise FileNotFoundError(
                f"no .npy features for split {mode!r} under {feat_path}")
        self.max_len = max_len
        self.mode = mode
        self.seed = seed
        self._cache: Optional[list] = None
        if preload:
            self._cache = [np.load(str(p)).astype(np.float32) for p in self.feat_paths]
        probe = np.load(str(self.feat_paths[0]), mmap_mode="r")
        self.feat_len, self.feat_dim = int(probe.shape[0]), int(probe.shape[1])

        self._native = None
        self._native_ok = False
        self._backend_pref = backend
        if backend in ("auto", "native") and not preload:
            # Probe headers up front: the C++ loader only reads <f4 C-order
            # 2-D files. With backend='auto' an incompatible file (float64,
            # big-endian, pickled) silently routes the whole dataset to the
            # numpy path — never a hard failure at iteration time.
            compatible = all(_npy_native_compatible(p) for p in self.feat_paths)
            if not compatible and backend == "native":
                bad = [str(p) for p in self.feat_paths
                       if not _npy_native_compatible(p)][:3]
                raise ValueError(
                    f"backend='native' requires little-endian float32 "
                    f"C-order 2-D .npy files; incompatible: {bad}")
            self._native_ok = compatible
        # Provisional until first streaming use: 'native' here means the
        # header probe passed; the C++ lib builds lazily and a build
        # failure (backend='auto') demotes to 'numpy' at that point. Use
        # effective_backend() for the post-build answer.
        self.backend = "native" if self._native_ok else "numpy"

    def effective_backend(self) -> str:
        """The backend batches will ACTUALLY stream through: forces the
        lazy C++ lib build (``_ensure_native``) so an 'auto' dataset whose
        build fails reports 'numpy' instead of the provisional 'native'."""
        self._ensure_native()
        return self.backend

    def _ensure_native(self):
        """Build the C++ reader pool on FIRST streaming use — a consumer
        gathering from a device feature bank (include_feats=False) never
        pays the lib build or holds the pool."""
        if self._native is None and self._native_ok:
            try:
                from s2vt_tpu.data.native_loader import NativeFeatureLoader
                self._native = NativeFeatureLoader(
                    [str(p) for p in self.feat_paths],
                    self.feat_len, self.feat_dim)
            except Exception:
                if self._backend_pref == "native":
                    raise
                self._native_ok = False
                self.backend = "numpy"
        return self._native

    def __len__(self) -> int:
        return len(self.feat_paths)

    @property
    def vocab_size(self) -> int:
        return len(self.word2ix)

    def _load_feat(self, i: int) -> np.ndarray:
        if self._cache is not None:
            feat = self._cache[i]
        else:
            feat = np.load(str(self.feat_paths[i])).astype(np.float32)
        # 'free'-mode extraction produces ragged lengths: truncate or
        # zero-pad rows to the probed feat_len (the native C++ loader does
        # the same, keeping both backends bit-identical).
        if feat.shape[0] != self.feat_len:
            out = np.zeros((self.feat_len, self.feat_dim), np.float32)
            rows = min(feat.shape[0], self.feat_len)
            out[:rows] = feat[:rows]
            return out
        return feat

    def _encode_caption(self, tokens: List[int]) -> tuple:
        L = self.max_len
        tokens = tokens[:L]
        label = np.zeros((L,), np.int32)
        label[:len(tokens)] = tokens
        mask = np.zeros((L,), np.float32)
        mask[:len(tokens)] = 1.0
        return label, mask

    def load_all_features(self) -> np.ndarray:
        """The whole split as one [N, feat_len, feat_dim] float32 array —
        the host copy of a device-resident feature bank (Trainer gathers
        batches from it on device by row index instead of streaming
        [B, L, D] floats over PCIe/tunnel every step)."""
        out = np.empty((len(self.feat_paths), self.feat_len, self.feat_dim),
                       np.float32)
        for i in range(len(self.feat_paths)):
            out[i] = self._load_feat(i)
        return out

    def nbytes(self) -> int:
        return len(self.feat_paths) * self.feat_len * self.feat_dim * 4

    def batches(self, batch_size: int, shuffle: Optional[bool] = None,
                epoch: int = 0, drop_last: bool = False,
                include_feats: bool = True) -> Iterator[Batch]:
        """Yield fixed-shape batches. Deterministic given (seed, epoch).
        ``include_feats=False`` skips feature IO entirely (Batch.feats is
        None) for consumers that gather from a device feature bank via
        ``Batch.rows``; label sampling is identical either way."""
        if shuffle is None:
            shuffle = self.mode == "train"
        n = len(self.feat_paths)
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(n) if shuffle else np.arange(n)

        if drop_last:
            order = order[:(n // batch_size) * batch_size]

        native_iter = None
        if include_feats and len(order) and self._ensure_native() is not None:
            native_iter = self._native.iter_batches(order, batch_size)

        try:
            for start in range(0, len(order), batch_size):
                idx = order[start:start + batch_size]
                B = batch_size
                labels = np.zeros((B, self.max_len), np.int32)
                mask = np.zeros((B, self.max_len), np.float32)
                valid = np.zeros((B,), np.float32)
                rows = np.zeros((B,), np.int32)
                ids = [""] * B
                if native_iter is not None:
                    feats = next(native_iter)  # prefetched off-thread in C++
                elif include_feats:
                    feats = np.zeros((B, self.feat_len, self.feat_dim),
                                     np.float32)
                else:
                    feats = None
                for row, i in enumerate(idx):
                    vid = self.feat_paths[i].stem
                    caps = self.captions[vid]
                    cap = caps[rng.integers(len(caps))]
                    labels[row], mask[row] = self._encode_caption(cap)
                    if include_feats and native_iter is None:
                        feats[row] = self._load_feat(i)
                    valid[row] = 1.0
                    rows[row] = i
                    ids[row] = vid
                yield Batch(feats, labels, mask, valid, tuple(ids), rows)
        finally:
            # Abandoned mid-epoch (consumer break/exception) or done either
            # way: close promptly. The native loader's epoch-generation
            # protocol makes a later epoch safe regardless.
            if native_iter is not None:
                native_iter.close()

    def steps_per_epoch(self, batch_size: int, drop_last: bool = False) -> int:
        n = len(self.feat_paths)
        return n // batch_size if drop_last else -(-n // batch_size)


def prefetch_to_device(batches: Iterator[Batch], put_fn, depth: int = 2):
    """Device-side input double-buffering.

    ``jax.device_put`` is asynchronous on TPU: it enqueues the H2D copy and
    returns immediately. Keeping ``depth`` puts in flight means batch t+1's
    transfer rides under batch t's compute instead of serializing with it
    (the reference serializes per-item H2D inside __getitem__,
    dataloader.py:37-48). Yields ``(host_batch, device_arrays)`` — the host
    batch keeps ids/valid for bookkeeping without a D2H readback.
    """
    from collections import deque
    q = deque()
    for batch in batches:
        q.append((batch, put_fn(batch)))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def make_synthetic_corpus(root: str, n_videos: int = 6, vocab_extra: int = 30,
                          feat_len: int = 8, feat_dim: int = 16,
                          max_caption_words: int = 6, seed: int = 0,
                          splits=(0.5, 0.25)) -> dict:
    """Build a tiny self-consistent corpus + .npy features for tests/demos.

    Produces the same artifact schema as ``parse_csv``, with vocab built
    through the real ``build_vocab`` path. Returns paths and metadata.
    """
    from collections import Counter

    from s2vt_tpu.data.corpus import build_vocab, tokenize_caption

    root_p = pathlib.Path(root)
    feat_dir = root_p / "feats"
    feat_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    words = [f"w{i}" for i in range(vocab_extra)]
    sentences: Dict[str, list] = {}
    counter: Counter = Counter()
    gts: Dict[str, list] = {}
    for v in range(n_videos):
        vid = f"vid{v:03d}"
        sentences[vid] = []
        gts[vid] = []
        for c in range(rng.integers(1, 4)):
            n_words = int(rng.integers(2, max_caption_words))
            sent = " ".join(rng.choice(words, n_words))
            toks = tokenize_caption(sent)
            counter.update(toks)
            sentences[vid].append(toks)
            gts[vid].append({"image_id": vid, "cap_id": c, "caption": sent,
                             "tokenized": sent.lower()})
        np.save(feat_dir / f"{vid}.npy",
                rng.normal(size=(feat_len, feat_dim)).astype(np.float32))

    word2ix, ix2word = build_vocab(counter)
    unk = word2ix["<unk>"]
    captions = {vid: [[word2ix.get(w, unk) for w in toks] for toks in caps]
                for vid, caps in sentences.items()}

    names = sorted(captions.keys())
    n_train = max(1, int(len(names) * splits[0]))
    n_valid = max(1, int(len(names) * splits[1]))
    split_dict = {"train": names[:n_train],
                  "valid": names[n_train:n_train + n_valid],
                  "test": names[n_train + n_valid:] or names[-1:]}

    captions_file = root_p / "captions.json"
    gts_file = root_p / "gts.json"
    with open(captions_file, "w", encoding="utf-8") as f:
        json.dump({"word2ix": word2ix, "ix2word": ix2word,
                   "captions": captions, "splits": split_dict}, f)
    with open(gts_file, "w", encoding="utf-8") as f:
        json.dump({"gts": gts}, f)

    return {"captions_file": str(captions_file), "gts_file": str(gts_file),
            "feat_path": str(feat_dir), "vocab_size": len(word2ix),
            "feat_len": feat_len, "feat_dim": feat_dim}
