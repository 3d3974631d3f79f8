"""Driver-contract test: __graft_entry__.entry() must stay jittable."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (8, 128, 128, 3)
    assert jax.numpy.isfinite(out.astype(jax.numpy.float32)).all()
