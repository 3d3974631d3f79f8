"""Pix2Pix debug model (reference models/pix2pix_model.py) trains."""

import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.training.pix2pix_system import Pix2PixSystem


def test_pix2pix_trains_one_step():
    r = np.random.RandomState(0)
    size = 128  # unet_128 requires 128px inputs
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (1, size, size))]
    batch = {
        "cloths": jnp.asarray(onehot),
        "target_textures": jnp.asarray(r.randn(1, size, size, 3).astype(np.float32)),
    }
    sys_ = Pix2PixSystem()
    state = sys_.init_state(jax.random.key(0), batch)
    state, m = jax.jit(sys_.train_step, donate_argnums=0)(state, batch)
    for k in ("loss_D", "loss_G", "loss_G_gan", "loss_G_l1"):
        assert k in m and np.isfinite(float(m[k])), (k, m.get(k))
    fakes = sys_.eval_step(state, batch)
    assert fakes.shape == (1, size, size, 3)
