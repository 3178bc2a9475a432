"""Feature-extraction pipeline: videos -> per-clip [T, feat_dim] .npy files.

Capability parity with /root/reference/extract_features.py:113-143
(``extract``), redesigned TPU-first:

 - the backbone is built and compiled ONCE and streamed over videos
   (the reference reloads the CNN from scratch per video,
   extract_features.py:82-93 inside the :135 loop),
 - frames go ffmpeg -> host RAM -> one jitted preprocess+forward per clip
   (no JPEG tempdir round-trip, no per-image transform loop),
 - sampling happens BEFORE decode-to-device, so only the sampled frames
   are transferred,
 - 'free' mode pads the sampled frame count to a bucket multiple so XLA
   compiles a handful of shapes, not one per video.
"""

from __future__ import annotations

import pathlib
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from s2vt_tpu.extract import video as video_lib
from s2vt_tpu.extract.backbones import build_backbone
from s2vt_tpu.extract.preprocess import (fix_sample_indices,
                                         free_sample_indices,
                                         preprocess_frames)


class FeatureExtractor:
    """One-time-built backbone + jitted frame->feature function.

    Pass a ``jax.sharding.Mesh`` to extract data-parallel: backbone params
    replicate and the frame batch's leading dim shards over the 'data'
    axis — conv forwards are embarrassingly parallel over frames, so
    throughput scales with chips (frame count must divide the axis).
    """

    def __init__(self, model_name: str = "vgg16", weights: Optional[str] = None,
                 compute_dtype=None, bucket: int = 16, mesh=None):
        self.model_name = model_name
        cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else compute_dtype
        self.model, self.params, self.spec = build_backbone(model_name, cdt)
        if weights is not None:
            from s2vt_tpu.extract.torch_weights import load_torch_checkpoint
            loaded = load_torch_checkpoint(weights)
            self.params = _merge_check(self.params, loaded, model_name)
        self.bucket = bucket
        self.mesh = mesh
        if mesh is not None:
            from s2vt_tpu.parallel import mesh as mesh_lib
            self.params = jax.device_put(
                self.params, mesh_lib.replicate_sharding(mesh))
        mean = jnp.asarray(self.spec["mean"])
        std = jnp.asarray(self.spec["std"])
        size = self.spec["input_size"]

        @jax.jit
        def forward(params, frames_u8):
            x = preprocess_frames(frames_u8, mean, std, input_size=size)
            return self.model.apply({"params": params}, x)

        self._forward = forward

    def _put(self, frames: np.ndarray):
        if self.mesh is None:
            return jnp.asarray(frames)
        from s2vt_tpu.parallel import mesh as mesh_lib
        return jax.device_put(frames, mesh_lib.batch_sharding(self.mesh))

    def __call__(self, frames: np.ndarray,
                 valid_count: Optional[int] = None) -> np.ndarray:
        """uint8 frames [T, H, W, 3] -> features [T, feat_dim] (or
        [valid_count, feat_dim] when the batch was padded)."""
        feats = np.asarray(self._forward(self.params, self._put(frames)))
        return feats if valid_count is None else feats[:valid_count]

    def extract_clip(self, clip_path: str, mode: str = "fix",
                     frames_num: int = 80, interval: int = 10) -> np.ndarray:
        frames = video_lib.load_clip(clip_path)
        if mode == "fix":
            idx = fix_sample_indices(len(frames), frames_num)
            return self(frames[idx])
        if mode == "free":
            idx = free_sample_indices(len(frames), interval)
            sampled = frames[idx]
            n = len(sampled)
            padded_n = -(-n // self.bucket) * self.bucket
            if padded_n != n:
                pad = np.zeros((padded_n - n,) + sampled.shape[1:], np.uint8)
                sampled = np.concatenate([sampled, pad])
            return self(sampled, valid_count=n)
        raise ValueError(f"unknown mode {mode!r} (expected 'fix' or 'free')")


def extract(video_path: str, feats_path: str, model: str = "vgg16",
            mode: str = "fix", frames_num: int = 80, interval: int = 10,
            weights: Optional[str] = None, compute_dtype=None,
            overwrite: bool = True,
            clips: Optional[Iterable[pathlib.Path]] = None,
            clip_batch: int = 4) -> int:
    """Extract features for every clip under ``video_path``; returns count.

    Matches the reference CLI semantics (extract_features.py:113-143):
    output file is ``{feats_path}/{clip_stem}.npy`` of shape [T, feat_dim].

    Two throughput layers on top of the reference's serial loop:
     - 'fix'-mode clips are forwarded ``clip_batch`` at a time when their
       raw frame shapes match (measured on one v5e: 4x80-frame batches
       lift vgg16_bn from 42 to 50 clips/s — bigger GEMMs per dispatch),
     - host video decode for the NEXT group runs on a worker thread while
       the device forwards the current one (decode/compute overlap).
    """
    feats_dir = pathlib.Path(feats_path)
    if overwrite and feats_dir.is_dir():
        import shutil
        shutil.rmtree(feats_dir)
    feats_dir.mkdir(parents=True, exist_ok=True)

    src = pathlib.Path(video_path)
    if clips is None:
        clips = sorted(p for p in src.iterdir()
                       if p.is_dir() or p.suffix.lower() in
                       video_lib.VIDEO_SUFFIXES)
    clips = list(clips)
    extractor = FeatureExtractor(model, weights, compute_dtype)

    if mode != "fix" or clip_batch <= 1:
        for clip in clips:
            feats = extractor.extract_clip(str(clip), mode, frames_num,
                                           interval)
            np.save(feats_dir / f"{clip.stem}.npy", feats)
        return len(clips)

    from concurrent.futures import ThreadPoolExecutor

    def load_group(group):
        out = []
        for clip in group:
            frames = video_lib.load_clip(str(clip))
            idx = fix_sample_indices(len(frames), frames_num)
            out.append(frames[idx])
        return out

    groups = [clips[i:i + clip_batch]
              for i in range(0, len(clips), clip_batch)]
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(load_group, groups[0]) if groups else None
        for gi, group in enumerate(groups):
            frames_list = fut.result()
            if gi + 1 < len(groups):
                fut = pool.submit(load_group, groups[gi + 1])
            same_shape = len({f.shape for f in frames_list}) == 1
            if same_shape and len(frames_list) > 1:
                feats = extractor(np.concatenate(frames_list))
                per_clip = np.split(feats, len(frames_list))
            else:  # mixed raw resolutions: forward per clip
                per_clip = [extractor(f) for f in frames_list]
            for clip, feats in zip(group, per_clip):
                np.save(feats_dir / f"{clip.stem}.npy", feats)
    return len(clips)


def _merge_check(init_params: dict, loaded: dict, name: str) -> dict:
    """Verify the loaded tree matches the model's structure/shapes."""
    init_flat = dict(jax.tree_util.tree_flatten_with_path(init_params)[0])
    loaded_flat = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    missing = set(init_flat) - set(loaded_flat)
    extra = set(loaded_flat) - set(init_flat)
    if missing or extra:
        fmt = lambda s: sorted(jax.tree_util.keystr(k) for k in s)[:8]
        raise ValueError(
            f"checkpoint does not match backbone {name!r}: "
            f"missing={fmt(missing)} extra={fmt(extra)}")
    for k, v in loaded_flat.items():
        if v.shape != init_flat[k].shape:
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(k)}: "
                f"checkpoint {v.shape} vs model {init_flat[k].shape}")
    return loaded
