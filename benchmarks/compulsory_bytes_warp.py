"""Compulsory-HBM-traffic floor for the fused WARP-GAN train step.

Same method as benchmarks/compulsory_bytes.py (texture config, see its
docstring), applied to the warp stage: 128^2 batch 8, WarpModule G
(137.6M params — param traffic, not activations, is the expected
dominator at batch 8) + conditional NLayer D + CE x100
(reference models/warp_model.py:106-167).

Writes benchmarks/compulsory_bytes_warp.json.  Runs on CPU (tracing
only): JAX_PLATFORMS=cpu python benchmarks/compulsory_bytes_warp.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from __graft_entry__ import _warp_batch
from benchmarks.compulsory_bytes import (
    BF16_PEAK_TFLOPS,
    HBM_PEAK_GBPS,
    _check_saved_residuals_prose,
    nbytes,
    residual_bytes,
)
from swapnet_tpu.training import WarpSystem


def main():
    _check_saved_residuals_prose()
    batch_n, size = 8, 128
    system = WarpSystem(dtype=jnp.bfloat16)
    batch = _warp_batch(batch_n, size)
    state = system.init_state(jax.random.key(0), batch)

    r = jax.random.split(state.rng, 7)

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

    def g_loss(fakes_, d_params, batch_):
        from swapnet_tpu.losses import gan_loss

        extra = system.extra_g_losses(fakes_, batch_, r[6], None)
        loss = sum(extra.values(), jnp.float32(0.0))
        pred, _ = system._apply_d(
            d_params, state.d_extra, system.d_condition(batch_, fakes_), True
        )
        return loss + gan_loss(pred, True, system.gan_cfg, r[5])

    res = {
        "g_forward_residuals": residual_bytes(g_fwd, state.g_params, batch),
        "d_loss_residuals": residual_bytes(d_loss, state.d_params, cond_fake, cond_real),
        "g_loss_residuals": residual_bytes(g_loss, fakes, state.d_params, batch),
    }

    g_p, d_p = nbytes(state.g_params), nbytes(state.d_params)
    g_opt, d_opt = nbytes(state.g_opt_state), nbytes(state.d_opt_state)
    batch_b = nbytes(batch)

    traffic = {
        "activation_residuals_2x": 2 * sum(res.values()),
        "g_params_3x": 3 * g_p,
        "d_params_5x": 5 * d_p,
        "opt_state_rw": 2 * (g_opt + d_opt),
        "batch_read": batch_b,
    }
    total = sum(traffic.values())
    byte_floor_s = total / (HBM_PEAK_GBPS * 1e9)

    roofline = {}
    rl_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "roofline_warp.json"
    )
    if os.path.exists(rl_path):
        roofline = json.load(open(rl_path))
    flops = roofline.get("flops_per_step")
    flop_floor_s = flops / (BF16_PEAK_TFLOPS * 1e12) if flops else None
    measured_s = roofline.get("seconds_per_step")

    out = {
        "config": {"model": "warp", "batch": batch_n, "size": size},
        "param_bytes": {"g": g_p, "d": d_p, "g_opt": g_opt, "d_opt": d_opt},
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
        "method": "same as compulsory_bytes.py (saved_residuals x2 + minimal "
                  "param/opt/batch traffic; 819 GB/s peak; flops from "
                  "roofline_warp.json)",
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "compulsory_bytes_warp.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
