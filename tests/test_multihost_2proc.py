"""REAL 2-process multihost test (VERDICT r2 item #6).

Spawns two ``jax.distributed``-initialized CPU processes (4 local devices
each -> 8 global), shards one deterministic warp batch with
``local_batch_slice`` + ``global_batch_from_local``, runs ONE data-parallel
warp-ce train step, and asserts each process's loss equals the
single-process oracle computed in this (parent) test process.  This
replaces monkeypatched process_count branch tests with the genuine
multi-process code path — no hardware needed.
"""

import os
import re
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    # one device per process: the cross-process collective is still real,
    # and the smaller program compiles fast enough on a contended 1-core
    # host that gloo context creation does not hit its 30 s timeout
    jax.config.update("jax_num_cpu_devices", 1)

    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, len(jax.devices())

    from swapnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(
        __import__("os").path.expanduser("~/.cache/swapnet_tpu_xla_tests")
    )

    import numpy as np

    from swapnet_tpu.parallel import create_mesh, replicated_sharding
    from swapnet_tpu.parallel.multihost import (
        global_batch_from_local,
        local_batch_slice,
    )
    from swapnet_tpu.training import WarpSystem
    from swapnet_tpu.training.optimizers import OptimizerConfig

    B, SIZE = 8, 64  # WarpModule minimum (6-level cloth encoder)
    r = np.random.RandomState(0)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (B, SIZE, SIZE))]
    global_batch = {
        "bodys": r.randn(B, SIZE, SIZE, 3).astype(np.float32),
        "input_cloths": onehot,
        "target_cloths": onehot,
    }
    # each process loads ONLY its local shard (the multihost contract)
    sl = local_batch_slice(B)
    local = {k: v[sl] for k, v in global_batch.items()}

    mesh = create_mesh()

    # warmup collective: creates the gloo context while both processes are
    # in lockstep, BEFORE the long train-step compile
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    probe = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec("data")), np.ones((1,), np.float32)
    )
    assert float(jax.jit(jnp.sum)(probe)) == 2.0
    batch = global_batch_from_local(local, mesh)
    system = WarpSystem(warp_mode="ce", g_opt=OptimizerConfig(lr=1e-3))
    # every process computes the same init deterministically; jit the init
    # with replicated out_shardings so the state is born as a GLOBAL array
    # (device_put cannot target non-addressable devices in multi-process)
    state = jax.jit(
        lambda key: system.init_state(key, batch),
        out_shardings=replicated_sharding(mesh),
    )(jax.random.key(0))
    state, metrics = jax.jit(system.train_step)(state, batch)
    print(f"LOSS_G={float(metrics['loss_G']):.6f}", flush=True)
    jax.distributed.shutdown()
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process_oracle(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pick device count via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    losses = []
    for out in outs:
        m = re.search(r"LOSS_G=([-0-9.]+)", out)
        assert m, f"no loss in worker output:\n{out}"
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses

    # single-process oracle: same batch, same init, one device
    import jax

    from swapnet_tpu.training import WarpSystem
    from swapnet_tpu.training.optimizers import OptimizerConfig

    B, SIZE = 8, 64  # WarpModule minimum (6-level cloth encoder)
    r = np.random.RandomState(0)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (B, SIZE, SIZE))]
    batch = {
        "bodys": r.randn(B, SIZE, SIZE, 3).astype(np.float32),
        "input_cloths": onehot,
        "target_cloths": onehot,
    }
    system = WarpSystem(warp_mode="ce", g_opt=OptimizerConfig(lr=1e-3))
    state = system.init_state(jax.random.key(0), batch)
    _, metrics = jax.jit(system.train_step)(state, batch)
    oracle = float(metrics["loss_G"])
    # f32 with a different reduction split (2-device psum vs one device):
    # expect agreement to ~1e-6 relative, plus the %.6f print resolution
    np.testing.assert_allclose(losses[0], oracle, rtol=1e-5, atol=2e-5)
