"""VGG16 feature extractor (NHWC Flax) for the perceptual loss.

Mirrors torchvision vgg16().features — 13 3x3 convs + 5 maxpools — sliced
into the reference's 5 feature taps (reference modules/losses/perceptual.py:
26-42): after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.

Pretrained torchvision weights cannot be downloaded in this environment
(zero egress); `load_torch_vgg16_features` ports a locally provided
``vgg16-*.pth`` state dict, and without one the extractor runs with fixed
random weights (a valid — if weaker — perceptual metric; see e.g. "On
Random Weights and Unsupervised Feature Learning").  The weights are
frozen either way: they live outside the trained param tree.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.ops.conv3x3 import (
    conv3x3_bias_act, pallas_vmem_ok, shape_ok)
from swapnet_tpu.ops.pooling import max_pool_2x2

# torchvision vgg16 conv output channels per block
_CFG = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class _Conv3x3Relu(nn.Module):
    """3x3/pad-1 conv + bias + ReLU with the same param tree, shapes and
    init as ``nn.Conv`` (kernel HWIO f32 lecun-normal, bias zeros), but
    dispatching to the Pallas im2col kernel (ops/conv3x3.py) where it wins.

    ``impl``:
      * "auto"      — pallas on a single-device TPU backend when the shape
                      fits the VMEM budget, XLA otherwise.  Multi-device
                      meshes use XLA: a pallas custom-call inside pjit
                      would block SPMD partitioning.
      * "xla"       — always the XLA emitter (reference path).
      * "pallas"    — force the kernel (shape must qualify).
      * "interpret" — the kernel under the Pallas interpreter (CPU tests).
    """

    features: int
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32)
        h = x.astype(self.dtype)
        impl = self.impl
        if impl == "auto":
            # gate on BOTH directions: the custom VJP reuses the kernel for
            # the input-gradient conv over g:[B,H,W,features], so when
            # features > C_in the backward block is the larger one
            bwd_shape = h.shape[:-1] + (self.features,)
            use_pallas = (
                jax.default_backend() == "tpu"
                and jax.device_count() == 1
                and pallas_vmem_ok(h.shape, h.dtype, self.features)
                and pallas_vmem_ok(bwd_shape, h.dtype, h.shape[-1])
            )
            impl = "pallas" if use_pallas else "xla"
        elif impl == "interpret" and not shape_ok(h.shape):
            impl = "xla"  # deep-block shapes below the 8-row chunk
        interpret = impl == "interpret"
        return conv3x3_bias_act(
            h, kernel.astype(self.dtype), bias.astype(self.dtype),
            True, "pallas" if interpret else impl, interpret)


class VGG16Features(nn.Module):
    """Returns the 5 tap activations (one per conv block, pre-pool)."""

    dtype: Any = jnp.float32
    conv_impl: str = "auto"  # see _Conv3x3Relu.impl
    pool_bwd: str = "stack"  # max-pool backward form, see ops/pooling.py

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        h = x.astype(self.dtype)
        for b, (n_convs, ch) in enumerate(_CFG):
            if b > 0:
                # layout-preserving pool (not nn.max_pool): reduce-window's
                # spatial-minor layout preference forced ~1.6 ms/step of
                # copies around these convs — see ops/pooling.py
                h = max_pool_2x2(h, bwd_impl=self.pool_bwd)
            for c in range(n_convs):
                h = _Conv3x3Relu(
                    ch, dtype=self.dtype, impl=self.conv_impl,
                    name=f"conv{b + 1}_{c + 1}",
                )(h)
            taps.append(h)
        return taps


def init_vgg16(rng: jax.Array, image_size: int = 128):
    mod = VGG16Features()
    variables = mod.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return mod, variables


def load_torch_vgg16_features(path: str):
    """Port a torchvision vgg16 state_dict (.pth) to Flax params.

    torchvision keys: features.{idx}.weight/.bias with conv idxs
    [0,2, 5,7, 10,12,14, 17,19,21, 24,26,28]; weights are OIHW.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    conv_idxs = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    i = 0
    for b, (n_convs, _) in enumerate(_CFG):
        for c in range(n_convs):
            w = sd[f"features.{conv_idxs[i]}.weight"].numpy()
            bias = sd[f"features.{conv_idxs[i]}.bias"].numpy()
            params[f"conv{b + 1}_{c + 1}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(bias),
            }
            i += 1
    return {"params": params}
