"""Int8 discriminator pass (--quantize_D) A/B: step throughput per stage.

The D forward/backward is conv-dominated; symmetric int8 quantization
(ops/quant.py) routes those convs onto the MXU's int8 path with int32
accumulation and halves the activation bytes D touches.  The generator
(and therefore sample quality math) stays full precision; D's backward is
the straight-through estimator.  This measures the realized end-to-end
fused-train-step win on the actual device, same method as
benchmarks/warp_optimizers.py (device-side fori_loop slope, best of 2).

Writes benchmarks/quantized_d.json.  Run from the repo root with
exclusive device access (no concurrent pytest).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import scan_seconds_per_step
from swapnet_tpu.training import TextureSystem, WarpSystem


def build(model: str, quantize: bool, size: int):
    if model == "warp":
        return WarpSystem(warp_mode="gan", dtype=jnp.bfloat16, quantize_D=quantize)
    return TextureSystem(img_size=size, dtype=jnp.bfloat16, quantize_D=quantize)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="texture,warp")
    args = ap.parse_args()

    batch, size, k = 8, 128, 20
    r = np.random.RandomState(0)
    results = {"backend": jax.default_backend(), "batch": batch, "size": size}
    for model in args.models.split(","):
        if model == "warp":
            onehot = np.eye(19, dtype=np.float32)[
                r.randint(0, 19, (batch, size, size))
            ]
            batch_d = {
                "bodys": jnp.asarray(
                    r.randn(batch, size, size, 3).astype(np.float32)
                ),
                "input_cloths": jnp.asarray(onehot),
                "target_cloths": jnp.asarray(onehot),
            }
        else:
            from __graft_entry__ import _texture_batch

            batch_d = _texture_batch(batch, size)
        results[model] = {}
        for quantize in (False, True):
            sys_ = build(model, quantize, size)
            state = sys_.init_state(jax.random.key(0), batch_d)
            sec = min(
                scan_seconds_per_step(
                    lambda s: sys_.train_step(s, batch_d)[0], state, k=k
                )
                for _ in range(2)
            )
            key = "int8_D" if quantize else "bf16_D"
            results[model][key] = {
                "images_per_sec": round(batch / sec, 2),
                "seconds_per_step": round(sec, 5),
            }
            print(model, key, results[model][key], flush=True)
            del state

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "quantized_d.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
