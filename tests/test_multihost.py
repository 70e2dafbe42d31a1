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


def test_two_process_global_batch():
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(pid), port],
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
        assert f"proc{pid} ok" in out
