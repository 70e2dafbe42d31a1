"""FSDP / ZeRO-3 parameter + optimizer-state sharding over the data axis.

The reference has no distributed training at all (SURVEY.md §2.6); FSDP is
the remaining scaling-book strategy of the rebuild's §2.6 checklist: every
large param leaf is stored 1/N per data-parallel device, XLA/GSPMD inserts
the per-layer weight all-gathers and gradient reduce-scatters automatically,
and optax moments inherit the leaf shardings via ``zeros_like`` — nothing is
hand-written. These tests pin (a) the sharding rules, (b) numerics (FSDP is
a memory/perf choice, not a numerics choice), (c) that params AND optimizer
state are genuinely distributed, and (d) the user-facing ``--fsdp`` CLI.
"""

import csv
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepfake_video_detection_tpu.parallel import strategy


# ---------------------------------------------------------------- spec rules

def test_fsdp_spec_rules():
    spec = strategy.make_fsdp_spec_fn(4, min_size=1)
    # largest divisible dim shards; ties -> last such dim
    assert spec("w", (8, 3)) == P("data")
    assert spec("w", (2, 8)) == P(None, "data")
    assert spec("w", (8, 8)) == P(None, "data")
    # HWIO conv kernel: output channels (largest, last)
    assert spec("conv.weight", (3, 3, 64, 128)) == P(None, None, None, "data")
    # nothing divisible -> replicate
    assert spec("b", (3,)) == P()
    assert spec("b", (5, 7)) == P()
    # below min_size -> replicate even when divisible
    spec_big = strategy.make_fsdp_spec_fn(4, min_size=10_000)
    assert spec_big("w", (8, 8)) == P()
    assert spec_big("w", (128, 128)) == P(None, "data")


def test_fsdp_composes_with_tp():
    """2-D sharding on the wide head leaves: TP owns its dim, FSDP shards the
    largest remaining free dim over data."""
    spec = strategy.make_fsdp_spec_fn(4, base=strategy.tp_param_pspec,
                                      min_size=1)
    assert spec("fc1.weight", (256, 1280)) == P("data", "model")
    assert spec("backbone.conv_head.weight", (1, 1, 320, 1280)) == \
        P(None, None, "data", "model")
    # TP-replicated leaf falls back to plain FSDP
    assert spec("fc2.weight", (2, 256)) == P(None, "data")


def test_build_plan_fsdp_validation():
    ns = lambda **kw: type("A", (), {  # noqa: E731
        "mesh": None, "seq": "none", "seq_par": 1, "pp_stages": 1,
        "pp_microbatches": 2, "moe_experts": 0, "expert_par": 0,
        "fsdp": False, **kw})()

    plan, kw = strategy.build_plan(ns(fsdp=True), "pretrained", 8)
    assert plan is not None and not plan.pure_dp
    assert "fsdp" in plan.description
    assert dict(plan.mesh.shape) == {"data": len(jax.devices())}
    # composes with TP
    plan2, _ = strategy.build_plan(ns(fsdp=True, mesh="data=4,model=2"),
                                   "pretrained", 8)
    assert "tp=2" in plan2.description and "fsdp" in plan2.description
    # refuses SP/PP/EP composition (explicitly unsupported for now)
    with pytest.raises(ValueError, match="fsdp"):
        strategy.build_plan(ns(fsdp=True, seq="ring", seq_par=2),
                            "temporal", 8)
    # still "no plan" without any flag
    plan3, _ = strategy.build_plan(ns(), "pretrained", 8)
    assert plan3 is None


# ---------------------------------------------------------------- numerics

class _Tiny:
    """Mean-pool + 2-layer head (the trainer-test TinyDetector shape)."""

    def init(self, rng):
        from deepfake_video_detection_tpu.nn import init as I

        k1, k2 = jax.random.split(rng)
        return {"params": {
            "proj": {"weight": I.kaiming_uniform(k1, (8, 3)),
                     "bias": I.zeros(8)},
            "head": {"weight": I.kaiming_uniform(k2, (2, 8)),
                     "bias": I.zeros(2)},
        }, "state": {}}

    def apply(self, variables, x, train=False, rng=None):
        from deepfake_video_detection_tpu.nn import layers as L

        p = variables["params"]
        feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        h = jax.nn.relu(L.linear(p["proj"], feats))
        return L.linear(p["head"], h), {}


def test_fsdp_step_matches_single_device():
    """One FSDP train step == one single-device train step, AND the params +
    optimizer moments are physically distributed (1/8 per device)."""
    import functools

    from deepfake_video_detection_tpu.train import losses as losses_mod
    from deepfake_video_detection_tpu.train import optim as optim_mod
    from deepfake_video_detection_tpu.train.state import TrainState
    from deepfake_video_detection_tpu.train.steps import make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    model = _Tiny()
    host_vars = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0)))
    tx = optim_mod.build_optimizer("adamw", 1e-2, grad_clip=1.0)
    loss_fn = functools.partial(losses_mod.cross_entropy_loss)
    step = make_train_step(model, tx, loss_fn, mesh=None, donate=False)

    rng = np.random.default_rng(0)
    frames = rng.random((8, 2, 16, 16, 3)).astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int64)

    # ---- single device -------------------------------------------------
    state1 = TrainState.create(
        jax.tree_util.tree_map(jax.device_put, host_vars), tx)
    s1, m1 = step(state1, {"frames": jax.device_put(frames),
                           "labels": jax.device_put(labels)},
                  jax.random.PRNGKey(1))

    # ---- FSDP over 8 devices -------------------------------------------
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    spec_fn = strategy.make_fsdp_spec_fn(8, min_size=1)
    placed = strategy.place_variables(host_vars, mesh, spec_fn)

    # params genuinely sharded: proj.weight (8,3) splits dim0 8-ways
    pw = placed["params"]["proj"]["weight"]
    assert pw.sharding.spec == P("data")
    assert len(pw.addressable_shards) == 8
    assert pw.addressable_shards[0].data.shape == (1, 3)

    state8 = TrainState.create(placed, tx)
    # ZeRO: optimizer moments inherit the param sharding via zeros_like
    mu_pw = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x, state8.opt_state))
    found = [l for l in mu_pw
             if hasattr(l, "shape") and tuple(l.shape) == (8, 3)]
    assert found, "no (8,3) moment leaves in opt state"
    for l in found:
        assert l.sharding.spec == P("data"), l.sharding
        assert l.addressable_shards[0].data.shape == (1, 3)

    batch8 = {
        "frames": jax.device_put(frames, NamedSharding(mesh, P("data"))),
        "labels": jax.device_put(labels, NamedSharding(mesh, P("data"))),
    }
    with mesh:
        s8, m8 = step(state8, batch8, jax.random.PRNGKey(1))

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(s8.params["proj"]["weight"]),
                               np.asarray(s1.params["proj"]["weight"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8.params["head"]["weight"]),
                               np.asarray(s1.params["head"]["weight"]),
                               rtol=1e-5, atol=1e-6)
    # updated params KEEP the FSDP sharding (no silent re-replication)
    assert s8.params["proj"]["weight"].sharding.spec == P("data")

    # ---- FSDP x TP composed: 2-D weight sharding, same numerics ----------
    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                 ("data", "model"))

    def tiny_tp(path, shape=None):
        if path == "proj.weight":
            return P("model", None)   # (8,3): split output features
        if path == "head.weight":
            return P(None, "model")   # (2,8): split the contraction dim
        return P()

    spec2 = strategy.make_fsdp_spec_fn(2, base=tiny_tp, min_size=1)
    assert spec2("head.weight", (2, 8)) == P("data", "model")
    placed2 = strategy.place_variables(host_vars, mesh2, spec2)
    hw = placed2["params"]["head"]["weight"]
    assert hw.sharding.spec == P("data", "model")
    assert hw.addressable_shards[0].data.shape == (1, 2)  # 2-D split
    state2 = TrainState.create(placed2, tx)
    batch2 = {
        "frames": jax.device_put(frames, NamedSharding(mesh2, P("data"))),
        "labels": jax.device_put(labels, NamedSharding(mesh2, P("data"))),
    }
    with mesh2:
        s2, m2 = step(state2, batch2, jax.random.PRNGKey(1))
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(s2.params["head"]["weight"]),
                               np.asarray(s1.params["head"]["weight"]),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- CLI e2e

@pytest.mark.slow
def test_cli_fsdp_pretrained(tmp_path):
    """--fsdp end-to-end through the basic CLI on the flagship detector:
    2 epochs of finite losses and a loadable, servable checkpoint whose big
    leaves trained sharded."""
    from deepfake_video_detection_tpu.checkpoint.store import load_checkpoint
    from deepfake_video_detection_tpu.train import cli

    d = tmp_path / "faces"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        label = i % 2
        base = 180 if label == 1 else 60
        faces = rng.integers(base - 30, base + 30,
                             size=(8, 32, 32, 3)).astype(np.uint8)
        np.savez_compressed(d / f"video_{i}_{'fake' if label else 'real'}.npz",
                            faces=faces, label=np.int64(label))

    out = str(tmp_path / "fsdp")
    rc = cli.main(["--data_dir", str(d), "--model", "pretrained",
                   "--out_dir", out, "--fsdp",
                   "--epochs", "2", "--batch_size", "8", "--num_frames", "8",
                   "--no-augment", "--lr", "1e-3"])
    assert rc == 0
    hist = os.path.join(out, "training_history.csv")
    with open(hist) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= 2
    for r in rows:
        assert np.isfinite(float(r["train_loss"])), r
    variables, meta = load_checkpoint(os.path.join(out, "checkpoint_best.npz"))
    assert variables["params"], "empty params"
    # checkpoint is full (gathered) host arrays — servable anywhere
    leaf = variables["params"]["fc1"]["weight"]
    assert np.asarray(leaf).shape == (256, 1280)


def test_fsdp_scan_of_steps_matches_sequential():
    """k fused optimizer steps (scan-of-steps) under FSDP placements == k
    sequential single-device steps — the flagship production-training combo
    (amortized dispatch x ZeRO-3 memory), r3. Params keep their FSDP
    sharding through the scan."""
    import functools

    from deepfake_video_detection_tpu.train import losses as losses_mod
    from deepfake_video_detection_tpu.train import optim as optim_mod
    from deepfake_video_detection_tpu.train.state import TrainState
    from deepfake_video_detection_tpu.train.steps import (make_multi_step,
                                                          make_train_step)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    k = 3
    model = _Tiny()
    host_vars = jax.tree_util.tree_map(
        np.asarray, model.init(jax.random.PRNGKey(0)))
    tx = optim_mod.build_optimizer("adamw", 1e-2, grad_clip=1.0)
    loss_fn = functools.partial(losses_mod.cross_entropy_loss)
    step = make_train_step(model, tx, loss_fn, mesh=None, donate=False)
    multi = make_multi_step(model, tx, loss_fn, k, mesh=None, donate=False)

    rng = np.random.default_rng(0)
    frames = rng.random((k, 8, 2, 16, 16, 3)).astype(np.float32)
    labels = np.stack([(np.arange(8) + i) % 2 for i in range(k)]).astype(
        np.int64)

    # sequential, single device (model is rng-free: keys don't matter)
    st = TrainState.create(jax.tree_util.tree_map(jax.device_put, host_vars),
                           tx)
    for i in range(k):
        st, _ = step(st, {"frames": jax.device_put(frames[i]),
                          "labels": jax.device_put(labels[i])},
                     jax.random.PRNGKey(9))

    # one fused scan-of-steps dispatch over FSDP-placed state
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    placed = strategy.place_variables(host_vars,
                                      mesh, strategy.make_fsdp_spec_fn(
                                          8, min_size=1))
    state8 = TrainState.create(placed, tx)
    sh = NamedSharding(mesh, P(None, "data"))
    batches = {"frames": jax.device_put(frames, sh),
               "labels": jax.device_put(labels, sh)}
    with mesh:
        s8, m8 = multi(state8, batches, jax.random.PRNGKey(1))

    assert np.isfinite(float(m8["loss"]))
    np.testing.assert_allclose(np.asarray(s8.params["proj"]["weight"]),
                               np.asarray(st.params["proj"]["weight"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8.params["head"]["weight"]),
                               np.asarray(st.params["head"]["weight"]),
                               rtol=1e-5, atol=1e-6)
    assert s8.params["proj"]["weight"].sharding.spec == P("data")


@pytest.mark.slow
def test_cli_fsdp_scan_of_steps(tmp_path):
    """--fsdp --steps_per_call 2 end-to-end through the basic CLI."""
    from deepfake_video_detection_tpu.checkpoint.store import load_checkpoint
    from deepfake_video_detection_tpu.train import cli

    d = tmp_path / "faces"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        label = i % 2
        base = 180 if label == 1 else 60
        faces = rng.integers(base - 30, base + 30,
                             size=(8, 32, 32, 3)).astype(np.uint8)
        np.savez_compressed(d / f"video_{i}_{'fake' if label else 'real'}.npz",
                            faces=faces, label=np.int64(label))

    out = str(tmp_path / "fsdp_scan")
    rc = cli.main(["--data_dir", str(d), "--model", "pretrained",
                   "--out_dir", out, "--fsdp", "--steps_per_call", "2",
                   "--epochs", "2", "--batch_size", "8", "--num_frames", "8",
                   "--no-augment", "--lr", "1e-3"])
    assert rc == 0
    with open(os.path.join(out, "training_history.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= 2
    for r in rows:
        assert np.isfinite(float(r["train_loss"])), r
    variables, _ = load_checkpoint(os.path.join(out, "checkpoint_best.npz"))
    assert np.asarray(variables["params"]["fc1"]["weight"]).shape == \
        (256, 1280)
