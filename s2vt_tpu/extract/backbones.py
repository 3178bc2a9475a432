"""CNN backbones for frame feature extraction, TPU-native (Flax, NHWC).

Reimplements the three backbones the reference loads from the
``pretrainedmodels`` zoo (/root/reference/extract_features.py:50-57,82-89):
vgg16 (+ vgg16_bn), resnet152, inception_v4 — with ``last_linear`` replaced
by identity (extract_features.py:57,90), i.e. they emit penultimate
features: 4096-d (VGG), 2048-d (ResNet152), 1536-d (InceptionV4).

Design: NHWC layout (TPU conv-native), inference-mode BatchNorm folded as
four parameter vectors, all pooling via XLA reduce_window. Param trees
mirror the torch module paths ('features.0.weight' -> features_0/kernel) so
importing real pretrainedmodels checkpoints is a pure rename + layout
transpose (torch_weights.py). Submodule names follow pretrainedmodels:
vgg: _features.N/linear0/linear1; resnet: conv1/bn1/layerL.B.convK/
downsample; inceptionv4: features.N.branchX[.M].conv/bn.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from s2vt_tpu.extract import preprocess as pp


def _cast(x, dtype):
    return x if dtype is None else x.astype(dtype)


class Conv(nn.Module):
    """torch-Conv2d-compatible conv (OIHW weights stored as HWIO kernel)."""

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel
        kernel = self.param(
            "kernel",
            lambda k: nn.initializers.he_normal()(k, (kh, kw, in_ch, self.features)))
        y = jax.lax.conv_general_dilated(
            _cast(x, self.compute_dtype), _cast(kernel, self.compute_dtype),
            window_strides=self.stride,
            padding=((self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param("bias",
                               nn.initializers.zeros, (self.features,))
        return y


class BatchNormInference(nn.Module):
    """Eval-mode BN using stored running statistics (torch semantics)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


def max_pool(x, k: int, s: int, p: int = 0):
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=((p, p), (p, p)) if p else "VALID")


def avg_pool_nopad(x, k: int, s: int, p: int = 0):
    """AvgPool2d(count_include_pad=False): divide by the number of VALID
    elements in each window, not k*k."""
    pad = ((0, 0), (p, p), (p, p), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                                   (1, s, s, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1),
                                  (1, s, s, 1), pad)
    return summed / count


class Linear(nn.Module):
    """torch-layout linear: weight [out, in]."""

    features: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("weight", nn.initializers.he_normal(), (self.features, in_f))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.dot(_cast(x, self.compute_dtype),
                    _cast(w, self.compute_dtype).T,
                    preferred_element_type=jnp.float32)
        return y + b


class ConvBNReLU(nn.Module):
    """pretrainedmodels BasicConv2d: conv(no bias) + BN + ReLU, submodules
    named 'conv' and 'bn' like the torch original."""

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel, self.stride, self.padding,
                 use_bias=False, compute_dtype=self.compute_dtype,
                 name="conv")(x)
        x = BatchNormInference(self.features, eps=1e-3, name="bn")(x)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# VGG-16 (torchvision cfg D), pretrainedmodels layout: _features / linear0 /
# linear1 / last_linear->Identity. Output: 4096-d ReLU(fc7) features.
# ---------------------------------------------------------------------------

_VGG_CFG_D = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16(nn.Module):
    batch_norm: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        idx = 0
        for v in _VGG_CFG_D:
            if v == "M":
                x = max_pool(x, 2, 2)
                idx += 1
                continue
            x = Conv(v, (3, 3), padding=(1, 1),
                     compute_dtype=self.compute_dtype,
                     name=f"_features_{idx}")(x)
            idx += 1
            if self.batch_norm:
                x = BatchNormInference(v, name=f"_features_{idx}")(x)
                idx += 1
            x = nn.relu(x)
            idx += 1
        # torch flattens CHW: NHWC [N,7,7,512] -> NCHW -> [N, 25088]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(Linear(4096, self.compute_dtype, name="linear0")(x))
        x = nn.relu(Linear(4096, self.compute_dtype, name="linear1")(x))
        return x  # last_linear == Identity (extract_features.py:57)


# ---------------------------------------------------------------------------
# ResNet-152 (bottleneck [3, 8, 36, 3]). Output: 2048-d pooled features.
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        out = nn.relu(BatchNormInference(self.planes, name="bn1")(
            Conv(self.planes, (1, 1), use_bias=False, compute_dtype=cdt,
                 name="conv1")(x)))
        out = nn.relu(BatchNormInference(self.planes, name="bn2")(
            Conv(self.planes, (3, 3), (self.stride, self.stride), (1, 1),
                 use_bias=False, compute_dtype=cdt, name="conv2")(out)))
        out = BatchNormInference(self.planes * 4, name="bn3")(
            Conv(self.planes * 4, (1, 1), use_bias=False, compute_dtype=cdt,
                 name="conv3")(out))
        if self.downsample:
            x = BatchNormInference(self.planes * 4, name="downsample_1")(
                Conv(self.planes * 4, (1, 1), (self.stride, self.stride),
                     use_bias=False, compute_dtype=cdt, name="downsample_0")(x))
        return nn.relu(out + x)


class ResNet152(nn.Module):
    layers: Sequence[int] = (3, 8, 36, 3)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        x = nn.relu(BatchNormInference(64, name="bn1")(
            Conv(64, (7, 7), (2, 2), (3, 3), use_bias=False,
                 compute_dtype=cdt, name="conv1")(x)))
        x = max_pool(x, 3, 2, 1)
        for li, (blocks, planes) in enumerate(
                zip(self.layers, (64, 128, 256, 512)), start=1):
            for b in range(blocks):
                stride = 2 if (b == 0 and li > 1) else 1
                x = Bottleneck(planes, stride, downsample=(b == 0),
                               compute_dtype=cdt, name=f"layer{li}_{b}")(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        return x  # last_linear == Identity -> 2048-d


# ---------------------------------------------------------------------------
# Inception-V4 (pretrainedmodels layout: features.0..21 + avg_pool).
# Output: 1536-d pooled features. Input 299x299.
# ---------------------------------------------------------------------------


class Mixed3a(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return jnp.concatenate([
            max_pool(x, 3, 2),
            ConvBNReLU(96, (3, 3), (2, 2), compute_dtype=self.compute_dtype,
                       name="conv")(x),
        ], axis=-1)


class Mixed4a(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        b0 = ConvBNReLU(64, (1, 1), compute_dtype=cdt, name="branch0_0")(x)
        b0 = ConvBNReLU(96, (3, 3), compute_dtype=cdt, name="branch0_1")(b0)
        b1 = ConvBNReLU(64, (1, 1), compute_dtype=cdt, name="branch1_0")(x)
        b1 = ConvBNReLU(64, (1, 7), padding=(0, 3), compute_dtype=cdt,
                        name="branch1_1")(b1)
        b1 = ConvBNReLU(64, (7, 1), padding=(3, 0), compute_dtype=cdt,
                        name="branch1_2")(b1)
        b1 = ConvBNReLU(96, (3, 3), compute_dtype=cdt, name="branch1_3")(b1)
        return jnp.concatenate([b0, b1], axis=-1)


class Mixed5a(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = ConvBNReLU(192, (3, 3), (2, 2), compute_dtype=self.compute_dtype,
                          name="conv")(x)
        return jnp.concatenate([conv, max_pool(x, 3, 2)], axis=-1)


class InceptionA(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        b0 = ConvBNReLU(96, (1, 1), compute_dtype=cdt, name="branch0")(x)
        b1 = ConvBNReLU(64, (1, 1), compute_dtype=cdt, name="branch1_0")(x)
        b1 = ConvBNReLU(96, (3, 3), padding=(1, 1), compute_dtype=cdt,
                        name="branch1_1")(b1)
        b2 = ConvBNReLU(64, (1, 1), compute_dtype=cdt, name="branch2_0")(x)
        b2 = ConvBNReLU(96, (3, 3), padding=(1, 1), compute_dtype=cdt,
                        name="branch2_1")(b2)
        b2 = ConvBNReLU(96, (3, 3), padding=(1, 1), compute_dtype=cdt,
                        name="branch2_2")(b2)
        b3 = avg_pool_nopad(x, 3, 1, 1)
        b3 = ConvBNReLU(96, (1, 1), compute_dtype=cdt, name="branch3_1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        b0 = ConvBNReLU(384, (3, 3), (2, 2), compute_dtype=cdt, name="branch0")(x)
        b1 = ConvBNReLU(192, (1, 1), compute_dtype=cdt, name="branch1_0")(x)
        b1 = ConvBNReLU(224, (3, 3), padding=(1, 1), compute_dtype=cdt,
                        name="branch1_1")(b1)
        b1 = ConvBNReLU(256, (3, 3), (2, 2), compute_dtype=cdt,
                        name="branch1_2")(b1)
        return jnp.concatenate([b0, b1, max_pool(x, 3, 2)], axis=-1)


class InceptionB(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        b0 = ConvBNReLU(384, (1, 1), compute_dtype=cdt, name="branch0")(x)
        b1 = ConvBNReLU(192, (1, 1), compute_dtype=cdt, name="branch1_0")(x)
        b1 = ConvBNReLU(224, (1, 7), padding=(0, 3), compute_dtype=cdt,
                        name="branch1_1")(b1)
        b1 = ConvBNReLU(256, (7, 1), padding=(3, 0), compute_dtype=cdt,
                        name="branch1_2")(b1)
        b2 = ConvBNReLU(192, (1, 1), compute_dtype=cdt, name="branch2_0")(x)
        b2 = ConvBNReLU(192, (7, 1), padding=(3, 0), compute_dtype=cdt,
                        name="branch2_1")(b2)
        b2 = ConvBNReLU(224, (1, 7), padding=(0, 3), compute_dtype=cdt,
                        name="branch2_2")(b2)
        b2 = ConvBNReLU(224, (7, 1), padding=(3, 0), compute_dtype=cdt,
                        name="branch2_3")(b2)
        b2 = ConvBNReLU(256, (1, 7), padding=(0, 3), compute_dtype=cdt,
                        name="branch2_4")(b2)
        b3 = avg_pool_nopad(x, 3, 1, 1)
        b3 = ConvBNReLU(128, (1, 1), compute_dtype=cdt, name="branch3_1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionB(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        b0 = ConvBNReLU(192, (1, 1), compute_dtype=cdt, name="branch0_0")(x)
        b0 = ConvBNReLU(192, (3, 3), (2, 2), compute_dtype=cdt,
                        name="branch0_1")(b0)
        b1 = ConvBNReLU(256, (1, 1), compute_dtype=cdt, name="branch1_0")(x)
        b1 = ConvBNReLU(256, (1, 7), padding=(0, 3), compute_dtype=cdt,
                        name="branch1_1")(b1)
        b1 = ConvBNReLU(320, (7, 1), padding=(3, 0), compute_dtype=cdt,
                        name="branch1_2")(b1)
        b1 = ConvBNReLU(320, (3, 3), (2, 2), compute_dtype=cdt,
                        name="branch1_3")(b1)
        return jnp.concatenate([b0, b1, max_pool(x, 3, 2)], axis=-1)


class InceptionC(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        b0 = ConvBNReLU(256, (1, 1), compute_dtype=cdt, name="branch0")(x)

        b1 = ConvBNReLU(384, (1, 1), compute_dtype=cdt, name="branch1_0")(x)
        b1a = ConvBNReLU(256, (1, 3), padding=(0, 1), compute_dtype=cdt,
                         name="branch1_1a")(b1)
        b1b = ConvBNReLU(256, (3, 1), padding=(1, 0), compute_dtype=cdt,
                         name="branch1_1b")(b1)
        b1 = jnp.concatenate([b1a, b1b], axis=-1)

        b2 = ConvBNReLU(384, (1, 1), compute_dtype=cdt, name="branch2_0")(x)
        b2 = ConvBNReLU(448, (3, 1), padding=(1, 0), compute_dtype=cdt,
                        name="branch2_1")(b2)
        b2 = ConvBNReLU(512, (1, 3), padding=(0, 1), compute_dtype=cdt,
                        name="branch2_2")(b2)
        b2a = ConvBNReLU(256, (1, 3), padding=(0, 1), compute_dtype=cdt,
                         name="branch2_3a")(b2)
        b2b = ConvBNReLU(256, (3, 1), padding=(1, 0), compute_dtype=cdt,
                         name="branch2_3b")(b2)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)

        b3 = avg_pool_nopad(x, 3, 1, 1)
        b3 = ConvBNReLU(256, (1, 1), compute_dtype=cdt, name="branch3_1")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV4(nn.Module):
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cdt = self.compute_dtype
        x = ConvBNReLU(32, (3, 3), (2, 2), compute_dtype=cdt, name="features_0")(x)
        x = ConvBNReLU(32, (3, 3), compute_dtype=cdt, name="features_1")(x)
        x = ConvBNReLU(64, (3, 3), padding=(1, 1), compute_dtype=cdt,
                       name="features_2")(x)
        x = Mixed3a(cdt, name="features_3")(x)
        x = Mixed4a(cdt, name="features_4")(x)
        x = Mixed5a(cdt, name="features_5")(x)
        for i in range(6, 10):
            x = InceptionA(cdt, name=f"features_{i}")(x)
        x = ReductionA(cdt, name="features_10")(x)
        for i in range(11, 18):
            x = InceptionB(cdt, name=f"features_{i}")(x)
        x = ReductionB(cdt, name="features_18")(x)
        for i in range(19, 22):
            x = InceptionC(cdt, name=f"features_{i}")(x)
        x = jnp.mean(x, axis=(1, 2))  # avg_pool(8) on the 8x8 map
        return x  # last_linear == Identity -> 1536-d


class TinyConv(nn.Module):
    """Minimal conv backbone (16x16 input -> 8-d features). A real
    registry entry so the advertised ``--backbone tiny`` CLI choice works
    outside tests: smoke runs, CPU-only serving demos, CI."""
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv(8, (3, 3), (2, 2), (1, 1), name="conv")(x)
        return nn.relu(jnp.mean(x, axis=(1, 2)))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

BACKBONE_SPECS = {
    # name: (module factory, input_size, feat_dim, mean, std)
    "vgg16": (lambda cdt: VGG16(batch_norm=False, compute_dtype=cdt),
              224, 4096, pp.IMAGENET_MEAN, pp.IMAGENET_STD),
    "vgg16_bn": (lambda cdt: VGG16(batch_norm=True, compute_dtype=cdt),
                 224, 4096, pp.IMAGENET_MEAN, pp.IMAGENET_STD),
    "resnet152": (lambda cdt: ResNet152(compute_dtype=cdt),
                  224, 2048, pp.IMAGENET_MEAN, pp.IMAGENET_STD),
    "inception_v4": (lambda cdt: InceptionV4(compute_dtype=cdt),
                     299, 1536, pp.INCEPTION_MEAN, pp.INCEPTION_STD),
    "tiny": (lambda cdt: TinyConv(compute_dtype=cdt),
             16, 8, pp.IMAGENET_MEAN, pp.IMAGENET_STD),
}


def build_backbone(name: str, compute_dtype: Any = None,
                   rng: Optional[jax.Array] = None):
    """Build (model, params, spec_dict). Params are randomly initialized;
    load pretrained weights via torch_weights.load_torch_checkpoint."""
    if name not in BACKBONE_SPECS:
        raise ValueError(f"unknown backbone {name!r}; "
                         f"choose from {sorted(BACKBONE_SPECS)}")
    factory, size, feat_dim, mean, std = BACKBONE_SPECS[name]
    model = factory(compute_dtype)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, size, size, 3), jnp.float32))["params"]
    spec = {"input_size": size, "feat_dim": feat_dim,
            "mean": np.asarray(mean, np.float32),
            "std": np.asarray(std, np.float32)}
    return model, params, spec
