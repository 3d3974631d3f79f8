"""Core NHWC layer library (TPU-native counterparts of modules/layers.py).

Every op here is laid out channels-last so the channel dimension rides the
TPU lane dimension and XLA can tile convolutions straight onto the MXU.
Numerics match the reference's torch building blocks
(reference: modules/layers.py:12-144):

  * Conv2d(k=4, s=2, p=1, bias=False)          -> conv_down
  * ConvTranspose2d(k=4, s=2, p=1, bias=False) -> conv_up (dilated conv form)
  * InstanceNorm2d(affine=False)               -> instance_norm
  * LeakyReLU(0.2) / ReLU / Tanh / Dropout

Parameters are always stored float32; compute dtype is a module field so
training can run bfloat16 on the MXU while keeping fp32 master weights.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from swapnet_tpu.models.initializers import make_initializer

Dtype = Any


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False, track_running_stats=False) on NHWC.

    Statistics accumulate in float32 regardless of compute dtype.  For
    low-precision activations the elementwise math stays in the compute
    dtype (only the reductions run f32): upcasting the whole tensor would
    double the activation bytes through every norm on an HBM-bound step.
    float32 inputs keep the exact two-pass f32 path for parity tests.
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)
    # single-pass stats with f32 accumulation: E[x^2] - E[x]^2 lets XLA fuse
    # both reductions into ONE read of x (the profiler showed the two-pass
    # variant's extra stats pass costing ~0.7 ms/step on the texture step);
    # for O(1) activation magnitudes the f32 cancellation error is ~1e-7,
    # far under bf16 resolution.  The only materialized tensors stay in the
    # compute dtype.
    x32 = x.astype(jnp.float32)
    mean32 = jnp.mean(x32, axis=(1, 2), keepdims=True)
    sq32 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var32 = jnp.maximum(sq32 - jnp.square(mean32), 0.0)
    scale = jax.lax.rsqrt(var32 + eps).astype(x.dtype)
    return (x - mean32.astype(x.dtype)) * scale


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour integer upsample via repeat (exact, layout-friendly)."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbour resize with torch F.interpolate semantics:
    src_index = floor(dst_index * in/out).  Shapes are static, so the
    index maps are compile-time constants (a strided gather XLA folds)."""
    import numpy as np

    ih, iw = x.shape[1], x.shape[2]
    if (ih, iw) == (out_h, out_w):
        return x
    ridx = np.arange(out_h) * ih // out_h
    cidx = np.arange(out_w) * iw // out_w
    return x[:, ridx][:, :, cidx]


def reflect_pad(x: jax.Array, pad: int = 1) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class Conv(nn.Module):
    """2D convolution with torch padding semantics, NHWC/HWIO.

    Matches nn.Conv2d(in, out, kernel_size, stride, padding).
    """

    features: int
    kernel_size: int = 4
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    quantize: bool = False  # int8 MXU path + straight-through grads
    # "s2d_in": width-pack the input for k4/s2/p1 convs whose input
    # channels half-fill the 128-lane tile (conv4s2p1_in_kernel); falls
    # back to the normal path when the shape doesn't qualify
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            make_initializer(self.init_type, self.init_gain),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        if (self.impl == "s2d_in" and not self.quantize
                and (k, self.stride, self.padding) == (4, 2, 1)
                and x.shape[2] % 2 == 0 and x.shape[-1] * 2 <= 128):
            B, H, W, C = x.shape
            xp = x.reshape(B, H, W // 2, 2 * C).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                xp, conv4s2p1_in_kernel(kernel).astype(self.dtype),
                window_strides=(2, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    jnp.float32)
                y = y + bias.astype(self.dtype)
            return y
        if self.quantize:
            from swapnet_tpu.ops.quant import conv2d_int8_ste

            y = conv2d_int8_ste(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (self.stride, self.stride),
                ((self.padding, self.padding), (self.padding, self.padding)),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((self.padding, self.padding), (self.padding, self.padding)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _convt_4s2p1_subpixel(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose2d(k=4, s=2, p=1) in scatter (gather-GEMM) form.

    ``kernel`` is the stored HWOI (4, 4, O, I) spatially pre-flipped kernel
    of the dilated-conv formulation, whose subpixel identity is

        O[b, 2i+r, 2j+s, o] = sum_{t,u} x[b, i+r-1+t, j+s-1+u]
                                        * K[r+2t, s+2u, o].

    Substituting ih = i+r-1+t gives the scatter view: input pixel ih lands
    on output row y = 2*ih + (2 - kh) for each kernel row kh, so taps
    {0, 2} feed even output rows and {1, 3} odd ones (same for columns).
    The whole op is then ONE GEMM

        (B*H*W, I) @ (I, 16*O)    -- K.reshape(16*O, I), a free reshape --

    followed by four shift-adds and a phase interleave over tiny tensors.

    Why this form: same multiply-adds as the lhs_dilation form, but
    (a) no 3/4-zeros dilated input (XLA:CPU's generic dilated-conv path is
    4-38x slower at the decoder shapes, benchmarks/convt_forms.py), and
    (b) the kernel is consumed verbatim — measured on the 1-core host,
    ANY materialized reorder of the 67 MB deepest-decoder kernel costs
    ~60-240 ms/call at the ~2 GB/s effective transpose bandwidth, which is
    why the im2col form (2x2 conv to 4*O channels) lost to torch 3-5x.
    Scatter form at the warp decoder shapes: 5-17 ms vs torch
    ConvTranspose2d 10-68 ms.
    """
    ci, co = x.shape[-1], kernel.shape[2]
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    z = jax.lax.dot_general(
        x,
        kernel.reshape(16 * co, ci),
        dimension_numbers=(((3,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    ).reshape(b, h, w, 4, 4, co)  # [b, ih, jw, kh, kw, o]
    # rows: even y=2m gets Z[kh=2][m] + Z[kh=0][m-1]; odd y=2m+1 gets
    # Z[kh=1][m] + Z[kh=3][m+1]  (out-of-range rows fall off the crop)
    ev = z[:, :, :, 2] + jnp.pad(z[:, :, :, 0], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :h]
    od = z[:, :, :, 1] + jnp.pad(z[:, 1:, :, 3], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    rows = jnp.stack([ev, od], axis=2).reshape(b, 2 * h, w, 4, co)  # [b, y, jw, kw, o]
    evc = rows[:, :, :, 2] + jnp.pad(rows[:, :, :, 0], ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w]
    odc = rows[:, :, :, 1] + jnp.pad(rows[:, :, 1:, 3], ((0, 0), (0, 0), (0, 1), (0, 0)))
    return jnp.stack([evc, odc], axis=3).reshape(b, 2 * h, 2 * w, co)


class ConvTranspose(nn.Module):
    """Transposed 2D convolution with torch semantics, as a dilated conv.

    Matches nn.ConvTranspose2d(in, out, kernel_size, stride, padding):
    the input is dilated by ``stride`` and convolved with the spatially
    flipped kernel under padding ``k - 1 - padding``.  The kernel is stored
    pre-flipped in HWOI so the forward pass is a single
    conv_general_dilated; the checkpoint porter performs the flip/transpose
    once at load time.

    Why HWOI (perf, profiler-driven): XLA's layout assignment wants the
    input-feature axis innermost for these kernels; with HWIO storage every
    train step paid sync HBM relayout copies of the kernels AND their Adam
    moments at the jit boundary (~2.3 ms/step of copies on the texture
    step).  HWOI's default layout IS the preferred physical layout, and the
    experimental axon runtime cannot device_put custom layouts, so storage
    order — not Layout.AUTO — is the portable fix.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    # "auto" (backend default) | "s2d": one 3x3/pad-1 conv emitting the
    # four output-parity classes + depth-to-space (convt_s2d_kernel).
    # Only worth it for lane-sparse outputs (features << 128): 2.25x the
    # tap FLOPs but 4x the MXU lane occupancy at 1/4 the positions.
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            make_initializer(self.init_type, self.init_gain, transposed=True),
            (k, k, self.features, x.shape[-1]),
            jnp.float32,
        )
        if self.impl == "s2d":
            assert (k, self.stride, self.padding) == (4, 2, 1), (
                "s2d ConvTranspose requires k=4, stride=2, padding=1")
            k_eff = convt_s2d_kernel(kernel).astype(self.dtype)
            z = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k_eff,
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWOI", "NHWC"),
                preferred_element_type=self.dtype,
            )  # (B, H, W, 4*features), class order pr*2+pc
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,), jnp.float32)
                z = z + jnp.tile(bias, 4).astype(self.dtype)
            B, H, W, _ = z.shape
            z = z.reshape(B, H, W, 2, 2, self.features)
            return z.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, 2 * H, 2 * W, self.features)
        # Backend-dependent formulation, identical math (trace-time constant).
        # XLA:TPU convolves base-dilated inputs natively at full MXU rate and
        # the scatter form's interleave costs ~1.4 ms/step of copies at the
        # texture step (trace-measured), while XLA:CPU's generic dilated-conv
        # path is 4-38x slower than the scatter GEMM (benchmarks/convt_forms).
        use_scatter = jax.default_backend() == "cpu"
        if k == 4 and self.stride == 2 and self.padding == 1 and use_scatter:
            y = _convt_4s2p1_subpixel(x.astype(self.dtype), kernel.astype(self.dtype))
        else:
            pad = k - 1 - self.padding
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWOI", "NHWC"),
                preferred_element_type=self.dtype,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Norm(nn.Module):
    """batch | instance | none normalization (reference modules/__init__.py:53-74).

    BatchNorm uses learnable affine + running stats (torch defaults:
    momentum 0.1 -> flax momentum 0.9, eps 1e-5, scale ~ N(1, init_gain)).
    InstanceNorm is parameter-free.
    """

    norm_type: str = "instance"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.norm_type == "instance":
            return instance_norm(x)
        if self.norm_type == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                scale_init=lambda key, shape, dtype=jnp.float32: 1.0
                + self.init_gain * jax.random.normal(key, shape, dtype),
                bias_init=nn.initializers.zeros,
            )(x)
        if self.norm_type == "none":
            return x
        raise NotImplementedError(f"normalization layer [{self.norm_type}] is not found")


class UNetDown(nn.Module):
    """Conv4s2p1(no bias) -> [InstanceNorm] -> LeakyReLU(0.2) -> [Dropout].

    Reference: modules/layers.py:12-24.
    """

    out_ch: int
    normalize: bool = True
    dropout: float = 0.0
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = Conv(
            self.out_ch, 4, 2, 1, use_bias=False,
            init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype,
        )(x)
        if self.normalize:
            x = instance_norm(x)
        x = leaky_relu(x, 0.2)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class UNetUp(nn.Module):
    """ConvT4s2p1(no bias) -> InstanceNorm -> ReLU -> [Dropout]; cat skip.

    Reference: modules/layers.py:27-44.
    """

    out_ch: int
    dropout: float = 0.0
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, skip: Optional[jax.Array] = None, train: bool = True
    ) -> jax.Array:
        x = ConvTranspose(
            self.out_ch, 4, 2, 1, use_bias=False,
            init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype,
        )(x)
        x = instance_norm(x)
        x = jax.nn.relu(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        return x


class DualUNetUp(nn.Module):
    """UNetUp with two skip connections (reference modules/layers.py:47-63)."""

    out_ch: int
    dropout: float = 0.0
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, skip1: jax.Array, skip2: jax.Array, train: bool = True
    ) -> jax.Array:
        x = UNetUp(
            self.out_ch, self.dropout,
            init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype,
        )(x, None, train)
        return jnp.concatenate([x, skip1, skip2], axis=-1)


class ResidualBlock(nn.Module):
    """(ReflectPad1 -> Conv3 -> IN -> ReLU -> Dropout) x2 + identity.

    Reference: modules/layers.py:126-144.
    """

    dropout: float = 0.0
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        ch = x.shape[-1]
        conv_kwargs = dict(
            kernel_size=3, stride=1, padding=0, use_bias=True,
            init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype,
        )
        y = reflect_pad(x)
        y = Conv(ch, **conv_kwargs)(y)
        y = instance_norm(y)
        y = jax.nn.relu(y)
        # torch nn.Dropout(0.0) is a no-op but always present in the stack.
        if self.dropout:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = reflect_pad(y)
        y = Conv(ch, **conv_kwargs)(y)
        y = instance_norm(y)
        return x + y


def conv4s2p1_in_kernel(w: jax.Array) -> jax.Array:
    """Embed a k4/s2/p1 HWIO kernel [4,4,C,O] for a width-packed input
    [B,H,W/2,2C] (phase-major): output col j reads true cols 2j-1..2j+2 =
    packed (j-1,p1),(j,p0),(j,p1),(j+1,p0), so K[dh,0,C:]=w[:,0],
    K[dh,1,:C]=w[:,1], K[dh,1,C:]=w[:,2], K[dh,2,:C]=w[:,3] — a [4,3,2C,O]
    kernel run at strides (2,1) with pad 1 (exact: the extra true column
    each packed pad covers is never referenced).  1.5x the MACs for 2C
    input-lane occupancy; the output is standard layout directly (stride
    2 consumes the phase axis).  Linear in w."""
    kh, kw_, C, O = w.shape
    assert (kh, kw_) == (4, 4), w.shape
    K = jnp.zeros((4, 3, 2 * C, O), w.dtype)
    K = K.at[:, 0, C:].set(w[:, 0])
    K = K.at[:, 1, :C].set(w[:, 1])
    K = K.at[:, 1, C:].set(w[:, 2])
    K = K.at[:, 2, :C].set(w[:, 3])
    return K


def convt_s2d_kernel(w: jax.Array) -> jax.Array:
    """Rewrite a ConvTranspose(k=4, s=2, p=1) kernel (stored pre-flipped,
    HWOI [4,4,O,I]) as a [3,3,4O,I] space-to-depth kernel.

    Each output-parity class (pr, pc) of y[2i+pr, 2j+pc] is a 2x2-tap conv
    over x: y[2i+pr] sums x[i-1+a+pr] * w[2a+pr] for a in {0,1} (and the
    same along columns), so class (pr, pc) embeds into a 3x3/pad-1 kernel
    at k[a+pr, b+pc] = w[2a+pr, 2b+pc].  Linear in w — gradients flow
    through the rewrite; the param tree stays checkpoint-interchangeable
    with the dilated-conv form.  Class order pr*2+pc matches the
    depth-to-space reshape in ConvTranspose(impl="s2d").
    """
    kh, kw_, O, I = w.shape
    assert (kh, kw_) == (4, 4), w.shape
    classes = []
    for pr in (0, 1):
        for pc in (0, 1):
            k = jnp.zeros((3, 3, O, I), w.dtype)
            for a in (0, 1):
                for b in (0, 1):
                    k = k.at[a + pr, b + pc].set(w[2 * a + pr, 2 * b + pc])
            classes.append(k)
    return jnp.concatenate(classes, axis=2)  # [3,3,4O,I]


def head_s2d_kernel(w: jax.Array) -> jax.Array:
    """Rewrite the head's [4,4,C,O] kernel as a [3,3,C,4O] space-to-depth
    kernel (see _HeadS2D).  Linear in w, so gradients flow through the
    rewrite automatically — no custom VJP needed.

    Output parity (pr, pc) of y[2i+pr, 2j+pc] selects which input rows/
    columns of x each of the 16 upsampled taps lands on:
      pr=0: u-rows {2i-2..2i+1} -> x-rows (i-1, i-1, i, i): taps dy{0,1}
            collapse onto offset -1 and dy{2,3} onto 0 (2-tap kernel),
      pr=1: -> x-rows (i-1, i, i, i+1): (w0; w1+w2; w3) at (-1, 0, +1).
    Same decomposition along columns.  Class order pr*2+pc matches the
    depth-to-space reshape in _HeadS2D.
    """
    kh, kw_, C, O = w.shape
    assert (kh, kw_) == (4, 4), w.shape
    rows = {
        0: [w[0] + w[1], w[2] + w[3]],
        1: [w[0], w[1] + w[2], w[3]],
    }

    def colmix(r, pc):  # r: [4(dx), C, O]
        if pc == 0:
            return [r[0] + r[1], r[2] + r[3]]
        return [r[0], r[1] + r[2], r[3]]

    classes = []
    for pr in (0, 1):
        for pc in (0, 1):
            k = jnp.zeros((3, 3, C, O), w.dtype)
            for ri, rmix in enumerate(rows[pr]):
                for ci, tap in enumerate(colmix(rmix, pc)):
                    k = k.at[ri, ci].set(tap)
            classes.append(k)
    return jnp.concatenate(classes, axis=-1)  # [3,3,C,4O]


class _HeadS2D(nn.Module):
    """Space-to-depth form of Upsample2x+ZeroPad(1,0,1,0)+Conv4p1+Tanh.

    Math-identical to the upsampled conv (every 4-tap window over the
    2x-upsampled image touches at most 3 distinct input rows/columns, so
    the head is ONE 3x3/pad-1 conv on the un-upsampled input producing
    4*out_ch channels — one (pr, pc) output-parity class each — followed
    by a depth-to-space interleave).  On TPU this quadruples the MXU
    output-lane occupancy (76 vs 19 lanes of 128 at cloth_channels=19)
    and runs at a quarter of the spatial positions; tanh runs on the
    76-lane array.  Declares the SAME param tree as the Conv path
    (kernel [4,4,C,O] + bias [O]) so checkpoints are interchangeable.
    """

    out_ch: int
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    interleave: bool = True  # False returns z: [B, H, W, 2, 2, O]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            make_initializer(self.init_type, self.init_gain),
            (4, 4, x.shape[-1], self.out_ch),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        k_eff = head_s2d_kernel(kernel).astype(self.dtype)
        z = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k_eff,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        z = jnp.tanh(z + jnp.tile(bias, 4).astype(self.dtype))
        B, H, W, _ = z.shape
        z = z.reshape(B, H, W, 2, 2, self.out_ch)
        if not self.interleave:
            return z
        # y[b, 2i+pr, 2j+pc, o] = z[b, i, j, pr, pc, o]
        return z.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, 2 * H, 2 * W, self.out_ch)


class UpsamplePadConvTanh(nn.Module):
    """Upsample(2x nearest) -> ZeroPad(l=1,t=1) -> Conv4p1 -> Tanh.

    The reference's final projection head (modules/swapnet_modules.py:85-90).
    ``impl="s2d"`` computes the identical function as one space-to-depth
    conv (see _HeadS2D); both impls share one param tree ("Conv_0").
    """

    out_ch: int
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    impl: str = "xla"  # "xla" (literal upsample+conv) | "s2d"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.impl == "s2d":
            return _HeadS2D(
                self.out_ch, init_type=self.init_type,
                init_gain=self.init_gain, dtype=self.dtype, name="Conv_0",
            )(x)
        x = upsample_nearest(x, 2)
        x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        x = Conv(
            self.out_ch, 4, 1, 1, use_bias=True,
            init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype,
            name="Conv_0",
        )(x)
        return jnp.tanh(x)
