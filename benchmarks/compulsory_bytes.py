"""Compulsory-HBM-traffic floor for the fused texture-GAN train step.

VERDICT r2 item 1 allows two outcomes: push MFU past 45%, "or a per-op
trace proving the remaining bytes are compulsory".  The roofline bracket
(benchmarks/roofline.json) was too loose to decide: lower bound 1.0 GB
(params+opt only), upper 10.5 GB (cost_analysis double-counts fusion-
internal traffic; implies >peak bandwidth, so it overcounts).

This script computes a *model-level* floor from the program structure
itself, independent of XLA's choices:

  * activation residuals actually saved between forward and backward for
    each of the three differentiated closures in train_step
    (base_gan_system.py:160-218) — via jax.ad_checkpoint.saved_residuals,
    i.e. what JAX's partial-eval keeps, before XLA remat.  Each residual
    is written once (fwd) and read once (bwd): 2x its bytes.  (v5e VMEM
    is 128 MB; the per-step residual set is far larger, so these cannot
    stay on-chip.)
  * parameter traffic at minimal counts: G params read twice (forward
    apply + backward weight-grad/input-grad passes reread weights at
    least once) and written once; D params read once per forward pass
    (3 passes per step: D-fake, D-real, G's adversarial term) plus one
    backward reread, written once; frozen VGG read twice (fwd + bwd).
  * optimizer state read+written once (bf16 mu, f32 nu).
  * the input batch read once.

Gradients are NOT counted (XLA fuses them into the optimizer update),
and every count above is the minimum a correct implementation can do —
so floor_seconds = bytes / peak_bandwidth is a true lower bound on the
HBM-bound step time.  Compare with the measured step and the pure-MXU
flops floor to see how much headroom actually remains.

Writes benchmarks/compulsory_bytes.json.  Runs on CPU (tracing only).

Usage: JAX_PLATFORMS=cpu python benchmarks/compulsory_bytes.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
# jax 0.9 exports only print_saved_residuals; use the underlying helper
from jax._src import ad_checkpoint

jax.config.update("jax_platforms", "cpu")

from __graft_entry__ import _texture_batch
from swapnet_tpu.training import TextureSystem

HBM_PEAK_GBPS = 819.0  # v5e
BF16_PEAK_TFLOPS = 197.0


def nbytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def _check_saved_residuals_prose():
    """saved_residuals describes argument-sourced residuals with the prose
    'from the argument' on jax 0.9.0; guard against a silent wording change
    in a future jax (which would inflate the floor by counting inputs)."""
    probe = lambda a, b: jnp.sin(a) * b
    descs = [
        what
        for _, what in ad_checkpoint.saved_residuals(
            probe, jnp.ones(3), jnp.ones(3)
        )
    ]
    assert any("from the argument" in w for w in descs), (
        "jax.ad_checkpoint.saved_residuals no longer says 'from the "
        f"argument' for argument residuals (got {descs}); update "
        "residual_bytes' filter before trusting this floor"
    )


def residual_bytes(f, *args):
    """Bytes of intermediate residuals saved fwd->bwd, excluding the
    function's own inputs (params/batch traffic is counted separately)."""
    total = 0
    for aval, what in ad_checkpoint.saved_residuals(f, *args):
        if "from the argument" in what:
            continue
        total += aval.size * aval.dtype.itemsize
    return total


def main():
    _check_saved_residuals_prose()
    batch_n, size = 8, 128
    system = TextureSystem(img_size=size, dtype=jnp.bfloat16)
    batch = _texture_batch(batch_n, size)
    state = system.init_state(jax.random.key(0), batch)

    r = jax.random.split(state.rng, 7)

    # -- the three differentiated closures, inputs made explicit ----------
    def g_fwd(g_params, batch_):
        return system.generator_forward(g_params, state.g_extra, batch_, r[1], True)

    fakes, _ = jax.eval_shape(lambda p, b: g_fwd(p, b), state.g_params, batch)
    fakes = jnp.zeros(fakes.shape, fakes.dtype)
    targets = system.targets(batch)
    cond_fake = system.d_condition(batch, fakes)
    cond_real = system.d_condition(batch, targets)

    def d_loss(d_params, cf, cr):
        from swapnet_tpu.losses import gan_loss

        pf, e1 = system._apply_d(d_params, state.d_extra, cf, True)
        lf = gan_loss(pf, False, system.gan_cfg, r[2])
        pr, _ = system._apply_d(d_params, e1, cr, True)
        lr = gan_loss(pr, True, system.gan_cfg, r[3])
        return 0.5 * (lf + lr)

    def g_loss(fakes_, d_params, batch_, frozen):
        from swapnet_tpu.losses import gan_loss

        extra = system.extra_g_losses(fakes_, batch_, r[6], frozen)
        loss = sum(extra.values(), jnp.float32(0.0))
        pred, _ = system._apply_d(
            d_params, state.d_extra, system.d_condition(batch_, fakes_), True
        )
        return loss + gan_loss(pred, True, system.gan_cfg, r[5])

    res = {
        "g_forward_residuals": residual_bytes(g_fwd, state.g_params, batch),
        "d_loss_residuals": residual_bytes(d_loss, state.d_params, cond_fake, cond_real),
        "g_loss_residuals": residual_bytes(
            g_loss, fakes, state.d_params, batch, state.frozen
        ),
    }

    g_p, d_p = nbytes(state.g_params), nbytes(state.d_params)
    frozen_b = nbytes(state.frozen) if state.frozen is not None else 0
    g_opt, d_opt = nbytes(state.g_opt_state), nbytes(state.d_opt_state)
    batch_b = nbytes(batch)

    traffic = {
        # residuals: write in fwd + read in bwd
        "activation_residuals_2x": 2 * sum(res.values()),
        # G params: fwd read + bwd reread + update write
        "g_params_3x": 3 * g_p,
        # D params: 3 fwd reads + 1 bwd reread + update write
        "d_params_5x": 5 * d_p,
        "frozen_vgg_2x": 2 * frozen_b,
        "opt_state_rw": 2 * (g_opt + d_opt),
        "batch_read": batch_b,
    }
    total = sum(traffic.values())
    byte_floor_s = total / (HBM_PEAK_GBPS * 1e9)

    # flops floor from the roofline measurement (compiled cost analysis)
    roofline = {}
    rl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "roofline.json")
    if os.path.exists(rl_path):
        roofline = json.load(open(rl_path))
    flops = roofline.get("flops_per_step")
    flop_floor_s = flops / (BF16_PEAK_TFLOPS * 1e12) if flops else None
    measured_s = roofline.get("seconds_per_step")

    out = {
        "config": {"model": "texture", "batch": batch_n, "size": size},
        "residual_bytes": res,
        "traffic_floor_bytes": traffic,
        "total_floor_bytes": total,
        "byte_floor_ms": round(byte_floor_s * 1e3, 3),
        "flop_floor_ms": round(flop_floor_s * 1e3, 3) if flop_floor_s else None,
        "measured_step_ms": round(measured_s * 1e3, 3) if measured_s else None,
        "speed_of_light_pct": (
            round(100 * max(byte_floor_s, flop_floor_s or 0) / measured_s, 1)
            if measured_s else None
        ),
        "method": "saved_residuals per differentiated closure (JAX partial-"
                  "eval, pre-XLA-remat) x2 + minimal param/opt/batch traffic "
                  "counts; floor = bytes / 819 GB/s peak; flops floor from "
                  "roofline.json cost analysis / 197 bf16 TFLOPs",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "compulsory_bytes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
