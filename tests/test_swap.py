"""Fused two-stage swap: equals the two-program pipeline with the npz
interchange semantics (argmax -> one-hot) in between."""

import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.models.texture import TextureModule
from swapnet_tpu.models.warp import WarpModule
from swapnet_tpu.swap import FusedSwap

SIZE = 64


def test_fused_swap_matches_staged():
    r = np.random.RandomState(0)
    warp = WarpModule()
    tex = TextureModule(img_size=SIZE)
    body = jnp.asarray(r.randn(1, SIZE, SIZE, 3).astype(np.float32))
    cloth = jnp.asarray(
        np.eye(19, dtype=np.float32)[r.randint(0, 19, (1, SIZE, SIZE))]
    )
    texture = jnp.asarray(r.randn(1, SIZE, SIZE, 3).astype(np.float32))
    rois = jnp.asarray(r.uniform(4, SIZE - 4, (1, 12, 4)).astype(np.float32))

    k = jax.random.key(0)
    wv = warp.init({"params": k, "dropout": k}, body, cloth, False)
    tv = tex.init({"params": k, "dropout": k}, texture, rois, cloth, False)

    fused = FusedSwap(warp, wv, tex, tv)
    out_fused = fused(body, cloth, texture, rois)

    # staged: run warp, round-trip through argmax/one-hot, run texture
    warped = warp.apply(wv, body, cloth, False)
    onehot = jax.nn.one_hot(jnp.argmax(warped, -1), 19)
    out_staged = tex.apply(tv, texture, rois, onehot, False)

    assert out_fused.shape == (1, SIZE, SIZE, 3)
    # jit fusion reassociates float ops; ~2e-5 drift through two U-Nets
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_staged), atol=1e-4
    )
