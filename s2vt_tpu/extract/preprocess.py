"""Frame sampling + on-device image preprocessing.

Replaces the reference's PIL/torchvision per-image transform loop
(/root/reference/extract_features.py:60-71, pretrainedmodels
``LoadTransformImage``) with ONE jitted XLA pipeline over the whole frame
batch: resize (shorter side to input_size/0.875) -> center crop -> scale to
input_range -> normalize. Sampling index math matches the reference exactly:

 - 'fix'  mode: ``np.linspace(0, N-1, frames_num).astype(int)``
   (extract_features.py:98)
 - 'free' mode: ``np.arange(0, N, interval)`` (extract_features.py:65)
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np

# pretrainedmodels preprocessing constants per backbone (utils.TransformImage
# defaults: scale=0.875, imagenet mean/std; inception uses 0.5/0.5 at 299px).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)


def fix_sample_indices(num_frames: int, frames_num: int = 80) -> np.ndarray:
    """extract_features.py:98 — evenly spaced, endpoints included."""
    return np.linspace(0, num_frames - 1, frames_num).astype(int)


def free_sample_indices(num_frames: int, interval: int = 10) -> np.ndarray:
    """extract_features.py:65 — every ``interval``-th frame."""
    return np.arange(0, num_frames, interval).astype(int)


@partial(jax.jit, static_argnames=("input_size", "scale"))
def preprocess_frames(frames: jax.Array, mean: jax.Array, std: jax.Array,
                      input_size: int = 224, scale: float = 0.875) -> jax.Array:
    """uint8 RGB frames [N, H, W, 3] -> normalized float32 [N, S, S, 3].

    Matches TransformImage semantics: bilinear-resize the shorter side to
    int(floor(input_size / scale)), center-crop input_size, /255, normalize.
    Both the shorter-side target and the scaled long side use truncation —
    pretrainedmodels' TransformImage / torchvision Resize floor (299/0.875
    -> 341, not 342), so extracted features track the reference pipeline.
    """
    N, H, W, C = frames.shape
    target = int(input_size / scale)
    if H <= W:
        new_h, new_w = target, max(int(target * W / H), target)
    else:
        new_h, new_w = max(int(target * H / W), target), target
    x = frames.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (N, new_h, new_w, C), method="bilinear",
                         antialias=True)
    top = (new_h - input_size) // 2
    left = (new_w - input_size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (N, input_size, input_size, C))
    return (x - mean) / std
