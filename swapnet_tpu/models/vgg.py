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
from swapnet_tpu.ops.pooling import max_pool_2x2, max_pool_2x2_s2d

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


def s2d_w(x: jax.Array) -> jax.Array:
    """Width space-to-depth: [B,H,W,C] -> [B,H,W/2,2C], phase-major
    packing (channel p*C+c holds true column 2w'+p) — a pure reshape."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def s2d_kernel_w(k: jax.Array) -> jax.Array:
    """Embed a 3x3/pad-1 HWIO kernel [3,3,C,O] into the width-packed
    space: [3,3,2C,2O].  Output column 2w'+q reads true columns
    2w'+q+dw-1 (dw in 0..2), i.e. packed position w'+dw'-1 with phase p:
      q=0: (dw'=0,p=1)<-dw0, (dw'=1,p=0)<-dw1, (dw'=1,p=1)<-dw2
      q=1: (dw'=1,p=0)<-dw0, (dw'=1,p=1)<-dw1, (dw'=2,p=0)<-dw2
    Pad 1 packed column is exact (the extra true column the pad covers is
    never referenced).  Linear in k — gradients flow; half the embedded
    kernel is zeros, so the conv does 2x the MACs of the unpacked form in
    exchange for full 2C/2O MXU tile occupancy at half the positions.
    """
    kh, kw, C, O = k.shape
    assert (kh, kw) == (3, 3), k.shape
    K = jnp.zeros((3, 3, 2 * C, 2 * O), k.dtype)
    K = K.at[:, 0, C:, :O].set(k[:, 0])
    K = K.at[:, 1, :C, :O].set(k[:, 1])
    K = K.at[:, 1, C:, :O].set(k[:, 2])
    K = K.at[:, 1, :C, O:].set(k[:, 0])
    K = K.at[:, 1, C:, O:].set(k[:, 1])
    K = K.at[:, 2, :C, O:].set(k[:, 2])
    return K


class _Conv3x3ReluS2d(nn.Module):
    """3x3 conv + bias + ReLU on a width-packed map.  Declares the SAME
    param tree as _Conv3x3Relu (kernel [3,3,C,O] HWIO + bias [O]) so VGG
    checkpoints/porters are untouched; the packed kernel is built by
    s2d_kernel_w at trace time."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # x: [B,H,W/2,2C]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1] // 2, self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32)
        K = s2d_kernel_w(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), K,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        return jax.nn.relu(y + jnp.tile(bias, 2).astype(self.dtype))


class VGG16Features(nn.Module):
    """Returns the 5 tap activations (one per conv block, pre-pool)."""

    dtype: Any = jnp.float32
    conv_impl: str = "auto"  # see _Conv3x3Relu.impl
    pool_bwd: str = "stack"  # max-pool backward form, see ops/pooling.py
    # Run block 1 (conv1_1/conv1_2/pool1) width-packed: the 64-channel
    # convs half-fill the 128-lane MXU tile; the packed form runs 128-in/
    # 128-out at half the positions (2x MACs through zeros, but full
    # occupancy).  The block-1 tap comes back phase-packed [B,H,W/2,128]
    # — the content loss handles it via PerceptualLossConfig.tap1_s2d.
    # Same param tree either way.
    block1_s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        h = x.astype(self.dtype)
        start = 0
        if self.block1_s2d:
            p = s2d_w(h)
            p = _Conv3x3ReluS2d(64, dtype=self.dtype, name="conv1_1")(p)
            p = _Conv3x3ReluS2d(64, dtype=self.dtype, name="conv1_2")(p)
            taps.append(p)  # phase-packed tap (see tap1_s2d)
            h = max_pool_2x2_s2d(p)  # re-enters standard layout
            start = 1
        for b, (n_convs, ch) in enumerate(_CFG):
            if b < start:
                continue
            # b == 1 under block1_s2d: the s2d pool above already ran
            if b > 0 and not (self.block1_s2d and b == 1):
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
