"""Driver-contract tests for ``__graft_entry__``.

Round-1 shipped a ``dryrun_multichip`` that crashed in the driver's
environment (one visible device, no env presets — ``MULTICHIP_r01.json``
ok=false).  These tests invoke the entry points EXACTLY as the driver does:
a bare subprocess with no ``xla_force_host_platform_device_count`` preset,
so the self-provisioning re-exec path is what gets exercised.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    # The driver does not preset a virtual device count; strip the one the
    # test conftest injected so the parent process sees ONE device and
    # dryrun_multichip must provision its own mesh.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    # Keep CI off the real chip; device count is 1 either way, which is the
    # exact condition that crashed round 1.
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_dryrun_multichip_self_provisions_like_driver():
    code = "import jax; import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_driver_env(),
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"driver-identical dryrun failed:\n{proc.stderr[-3000:]}"
    )
    # all three phases: dp+tp flagship, sp ring-attention, ep MoE
    assert "mesh=(4,2)" in proc.stdout and "ok" in proc.stdout, proc.stdout
    assert "sp mesh=(2,4) ring-attention" in proc.stdout, proc.stdout
    assert "ep mesh=(2,4) moe" in proc.stdout, proc.stdout


def test_entry_forward_smoke():
    sys.path.insert(0, REPO)
    try:
        import jax

        import __graft_entry__ as g

        fn, args = g.entry()
        probs, frame_scores = jax.jit(fn)(*args)
        probs = np.asarray(probs, np.float32)
        assert probs.shape == (1, 2)
        assert frame_scores.shape == (1, 8)
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=2e-2)
    finally:
        sys.path.remove(REPO)
