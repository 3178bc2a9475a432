"""Backbone parity vs torch oracles + preprocessing/sampling semantics."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from s2vt_tpu.extract.backbones import build_backbone
from s2vt_tpu.extract.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                         fix_sample_indices,
                                         free_sample_indices,
                                         preprocess_frames)
from s2vt_tpu.extract.torch_weights import params_from_torch_backbone

from torch_backbones import (TorchInceptionV4, TorchResNet, TorchVGG16,
                             randomize_bn_stats)


def _nhwc(x_torch):
    return jnp.asarray(x_torch.permute(0, 2, 3, 1).numpy())


def _parity(torch_model, name, size, atol):
    torch_model.eval()
    randomize_bn_stats(torch_model)
    torch.manual_seed(0)
    x = torch.randn(2, 3, size, size)
    with torch.no_grad():
        want = torch_model(x).numpy()

    model, _, spec = build_backbone(name)
    params = params_from_torch_backbone(torch_model.state_dict())
    got = np.asarray(model.apply({"params": params}, _nhwc(x)))
    assert got.shape == want.shape == (2, spec["feat_dim"])
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.slow
def test_vgg16_parity():
    _parity(TorchVGG16(batch_norm=False), "vgg16", 224, atol=2e-3)


@pytest.mark.slow
def test_vgg16_bn_parity():
    _parity(TorchVGG16(batch_norm=True), "vgg16_bn", 224, atol=2e-3)


@pytest.mark.slow
def test_resnet152_parity():
    _parity(TorchResNet(), "resnet152", 224, atol=2e-3)


@pytest.mark.slow
def test_inception_v4_parity():
    _parity(TorchInceptionV4(), "inception_v4", 299, atol=2e-3)


def test_fix_sampling_matches_reference():
    # extract_features.py:98 — np.linspace(0, N-1, frames_num).astype(int)
    want = np.linspace(0, 123 - 1, 80).astype(int)
    np.testing.assert_array_equal(fix_sample_indices(123, 80), want)
    # fewer frames than requested: indices repeat, never out of range
    idx = fix_sample_indices(5, 80)
    assert idx.min() == 0 and idx.max() == 4 and len(idx) == 80


def test_free_sampling_matches_reference():
    # extract_features.py:65 — np.arange(0, N, interval)
    np.testing.assert_array_equal(free_sample_indices(95, 10),
                                  np.arange(0, 95, 10))


def test_preprocess_constant_image_exact():
    """Resize/crop of a constant image is constant, so the normalize math
    can be checked exactly: (v/255 - mean) / std."""
    frames = np.full((2, 300, 400, 3), 128, np.uint8)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    out = np.asarray(preprocess_frames(jnp.asarray(frames), mean, std, 224))
    assert out.shape == (2, 224, 224, 3)
    want = (128 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0, 0], want, atol=1e-5)
    np.testing.assert_allclose(out, np.broadcast_to(want, out.shape), atol=1e-5)


def test_preprocess_center_crop_geometry():
    """A horizontally-striped image survives the center crop with its
    stripes intact: crop is spatial, not a resample of the whole frame."""
    frames = np.zeros((1, 300, 400, 3), np.uint8)
    frames[:, :150] = 200  # top half bright
    out = np.asarray(preprocess_frames(
        jnp.asarray(frames), jnp.zeros(3), jnp.ones(3), 224))
    # shorter side 300 -> 256; top half maps to rows < 112 after crop of 16
    assert out[0, 0, 0, 0] > out[0, -1, 0, 0]


def test_converter_path_merging():
    sd = {
        "layer1.0.conv1.weight": torch.zeros(4, 3, 1, 1),
        "layer1.0.downsample.0.weight": torch.zeros(4, 3, 1, 1),
        "features.4.branch0.0.conv.weight": torch.zeros(4, 3, 3, 3),
        "bn1.weight": torch.ones(4),
        "bn1.running_mean": torch.zeros(4),
        "last_linear.weight": torch.zeros(10, 4),
    }
    p = params_from_torch_backbone(sd)
    assert p["layer1_0"]["conv1"]["kernel"].shape == (1, 1, 3, 4)
    assert "downsample_0" in p["layer1_0"]
    assert p["features_4"]["branch0_0"]["conv"]["kernel"].shape == (3, 3, 3, 4)
    assert "scale" in p["bn1"] and "mean" in p["bn1"]
    assert "last_linear" not in p
