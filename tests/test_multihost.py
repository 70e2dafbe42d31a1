"""Real multi-process multi-host data feeding (VERDICT r1 item 8).

Two OS processes form a 2-host JAX cluster (``jax.distributed.initialize``
on CPU, 4 virtual devices each → one 8-device global mesh). Each host
contributes only ITS slice of the global batch via
``global_batch_from_local`` / ``make_array_from_process_local_data``; a
jitted global-mean over the full mesh must equal the full-batch numpy value,
proving the global array was assembled correctly without any host holding
all the data (SURVEY.md §5.8 plan).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from deepfake_video_detection_tpu.parallel.multihost import (
        global_batch_from_local, local_batch_size)

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

    GLOBAL_B = 8
    local_b = local_batch_size(GLOBAL_B)
    assert local_b == 4
    # deterministic global batch; this process materialises ONLY its slice
    full = (np.arange(GLOBAL_B * 3, dtype=np.float32).reshape(GLOBAL_B, 3)
            + 1.0)
    local = full[pid * local_b:(pid + 1) * local_b]
    batch = global_batch_from_local({"x": local}, mesh)
    assert batch["x"].shape == (GLOBAL_B, 3)

    @jax.jit
    def mean_all(x):
        return x.mean()

    got = float(jax.device_get(mean_all(batch["x"])))
    want = float(full.mean())
    assert abs(got - want) < 1e-6, (got, want)
    print(f"proc{pid} ok mean={got}")
""")


_WORKER_DP_TP = textwrap.dedent("""
    import os, sys
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from deepfake_video_detection_tpu.parallel.multihost import (
        global_batch_from_local, local_batch_size)

    # DCN-analogue x ICI-analogue composition (VERDICT r2 item 6): the
    # `data` axis SPANS the two processes (each host feeds its own slice —
    # gradient psum crosses the process boundary, the DCN path on real
    # pods); the `model` axis stays INTRA-process (TP collectives ride the
    # fast local links). Mesh rows == processes by construction.
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    mesh = Mesh(np.asarray(devs).reshape(2, 4), ("data", "model"))
    for row, drow in zip(range(2), mesh.devices):
        assert all(d.process_index == row for d in drow), mesh.devices

    GLOBAL_B = 8
    local_b = local_batch_size(GLOBAL_B)
    assert local_b == 4
    rng = np.random.RandomState(0)
    full_x = rng.randn(GLOBAL_B, 6).astype(np.float32)
    W = rng.randn(6, 8).astype(np.float32)
    local = full_x[pid * local_b:(pid + 1) * local_b]
    batch = global_batch_from_local({"x": local}, mesh)
    Wd = jax.device_put(W, NamedSharding(mesh, P(None, "model")))  # TP cols

    @jax.jit
    def loss_and_grad(w, x):
        def loss(w):
            return jnp.mean((x @ w) ** 2)
        return jax.value_and_grad(loss)(w)

    got_l, got_g = loss_and_grad(Wd, batch["x"])
    want_l = float(np.mean((full_x @ W) ** 2))
    # numpy reference gradient
    y = full_x @ W
    want_g = 2.0 * full_x.T @ y / y.size
    assert abs(float(got_l) - want_l) < 1e-4, (float(got_l), want_l)
    np.testing.assert_allclose(np.asarray(jax.device_get(got_g)), want_g,
                               rtol=2e-4, atol=2e-5)
    print(f"proc{pid} ok dpxtp loss={float(got_l):.5f}")
""")


def _run_two_process(worker: str, ok_marker: str = "ok"):
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(pid), port],
                         env=env, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} {ok_marker}" in out


def test_two_process_global_batch():
    _run_two_process(_WORKER, "ok")


def test_two_process_dp_across_hosts_tp_within():
    """2-process cluster, mesh (data=2 ACROSS processes, model=4 within):
    value+grad of a TP-sharded matmul over a process-spanning global batch
    matches numpy — DCN-axis DP x ICI-axis TP in one program."""
    _run_two_process(_WORKER_DP_TP, "ok dpxtp")
