"""CLI-reachable parallelism (VERDICT r2 item 2).

Each test drives a REAL training CLI ``main()`` end-to-end on the virtual
8-device CPU mesh with the new strategy flags (``--mesh data=N,model=M``,
``--seq ring|ulysses --seq_par K``, ``--pp_stages``, ``--moe_experts``),
asserting 2 epochs of finite losses in ``training_history.csv`` and a
loadable best checkpoint — proving the §2.6 machinery is reachable from the
user surface, not just from ``__graft_entry__.dryrun_multichip`` (which
shares the same ``parallel/strategy.py`` sharding rules)."""

import csv
import os

import numpy as np
import pytest

import jax

from deepfake_video_detection_tpu.checkpoint.store import load_checkpoint
from deepfake_video_detection_tpu.parallel import strategy
from deepfake_video_detection_tpu.train import cli


@pytest.fixture(scope="module")
def npz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("faces_par")
    rng = np.random.default_rng(0)
    for i in range(16):
        label = i % 2
        base = 180 if label == 1 else 60
        faces = rng.integers(base - 30, base + 30,
                             size=(8, 32, 32, 3)).astype(np.uint8)
        np.savez_compressed(d / f"video_{i}_{'fake' if label else 'real'}.npz",
                            faces=faces, label=np.int64(label))
    return str(d)


def _assert_trained(out_dir: str, epochs: int = 2):
    hist = os.path.join(out_dir, "training_history.csv")
    assert os.path.exists(hist), f"no history CSV in {out_dir}"
    with open(hist) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) >= epochs
    for r in rows:
        assert np.isfinite(float(r["train_loss"])), r
        assert np.isfinite(float(r["val_loss"])), r
    best = os.path.join(out_dir, "checkpoint_best.npz")
    if not os.path.exists(best):
        # a resumed run whose metric never beats the restored best writes
        # only per-epoch checkpoints — accept the newest of those
        import glob

        epochs_ckpts = sorted(glob.glob(
            os.path.join(out_dir, "checkpoint_epoch_*.npz")))
        assert epochs_ckpts, f"no checkpoint in {out_dir}"
        best = epochs_ckpts[-1]
    variables, meta = load_checkpoint(best)
    assert variables["params"], "empty params in checkpoint"
    return rows, variables


BASE = ["--epochs", "2", "--batch_size", "8", "--num_frames", "8",
        "--no-augment", "--lr", "1e-3"]


@pytest.mark.slow
def test_cli_dp_tp_pretrained(npz_dir, tmp_path):
    """--mesh data=4,model=2: DP x TP on the flagship BackboneDetector."""
    out = str(tmp_path / "tp")
    rc = cli.main(["--data_dir", npz_dir, "--model", "pretrained",
                   "--out_dir", out, "--mesh", "data=4,model=2"] + BASE)
    assert rc == 0
    _assert_trained(out)


@pytest.mark.slow
def test_cli_sp_ring_temporal(npz_dir, tmp_path):
    out = str(tmp_path / "ring")
    rc = cli.main(["--data_dir", npz_dir, "--model", "temporal",
                   "--out_dir", out, "--seq", "ring", "--seq_par", "4",
                   "--d_model", "32", "--depth", "2", "--heads", "4"] + BASE)
    assert rc == 0
    _assert_trained(out)


@pytest.mark.slow
def test_cli_sp_ulysses_temporal(npz_dir, tmp_path):
    out = str(tmp_path / "ulysses")
    rc = cli.main(["--data_dir", npz_dir, "--model", "temporal",
                   "--out_dir", out, "--seq", "ulysses", "--seq_par", "2",
                   "--d_model", "32", "--depth", "2", "--heads", "4"] + BASE)
    assert rc == 0
    _assert_trained(out)


@pytest.mark.slow
def test_cli_pp_temporal(npz_dir, tmp_path):
    out = str(tmp_path / "pp")
    rc = cli.main(["--data_dir", npz_dir, "--model", "temporal",
                   "--out_dir", out, "--pp_stages", "2",
                   "--pp_microbatches", "2",
                   "--d_model", "32", "--depth", "2", "--heads", "4"] + BASE)
    assert rc == 0
    _assert_trained(out)


@pytest.mark.slow
def test_cli_ep_moe_temporal(npz_dir, tmp_path):
    out = str(tmp_path / "ep")
    rc = cli.main(["--data_dir", npz_dir, "--model", "temporal",
                   "--out_dir", out, "--moe_experts", "2",
                   "--d_model", "32", "--depth", "2", "--heads", "4"] + BASE)
    assert rc == 0
    _assert_trained(out)
    # an MoE-trained checkpoint must be SERVABLE: the loader rebuilds the
    # expert-stacked MLP template from blocks.i.mlp.w1 (E, D, H)
    from deepfake_video_detection_tpu.serve.loader import load_model

    best = os.path.join(out, "checkpoint_best.npz")
    model, variables, report = load_model(best)
    assert report["model_type"] == "temporal"
    assert model.moe is not None and model.moe.num_experts == 2
    assert report["match_ratio"] >= 0.99, report
    x = np.zeros((1, 4, 32, 32, 3), np.float32)
    (logits, _), _ = model.apply(variables, x, train=False)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.slow
def test_cli_bf16_pretrained(npz_dir, tmp_path):
    """--bf16 (bfloat16 activations, f32 params) trains finitely through
    the default DP path and the checkpoint stays f32 + servable."""
    out = str(tmp_path / "bf16")
    rc = cli.main(["--data_dir", npz_dir, "--model", "pretrained",
                   "--out_dir", out, "--bf16"] + BASE)
    assert rc == 0
    _assert_trained(out)
    variables, meta = load_checkpoint(
        os.path.join(out, "checkpoint_best.npz"))[:2]
    leaf = next(iter(jax.tree_util.tree_leaves(variables["params"])))
    assert np.asarray(leaf).dtype == np.float32  # params stay f32


def test_cli_explicit_dp_mesh(npz_dir, tmp_path):
    out = str(tmp_path / "dp8")
    rc = cli.main(["--data_dir", npz_dir, "--model", "cnn_lstm",
                   "--out_dir", out, "--mesh", "data=8"] + BASE)
    assert rc == 0
    _assert_trained(out)


@pytest.mark.slow
def test_cli_parallel_checkpoint_resumes(npz_dir, tmp_path):
    """TP-trained checkpoint warm-starts a fresh TP run (placement rules
    re-applied on load, Trainer._place)."""
    out = str(tmp_path / "tp_resume")
    rc = cli.main(["--data_dir", npz_dir, "--model", "pretrained",
                   "--out_dir", out, "--mesh", "data=4,model=2"] + BASE)
    assert rc == 0
    best = os.path.join(out, "checkpoint_best.npz")
    out2 = str(tmp_path / "tp_resume2")
    rc = cli.main(["--data_dir", npz_dir, "--model", "pretrained",
                   "--out_dir", out2, "--mesh", "data=4,model=2",
                   "--resume", best] + BASE)
    assert rc == 0
    # resumed at start_epoch=1 with epochs=2 → exactly ONE more epoch
    _assert_trained(out2, epochs=1)


@pytest.mark.slow
def test_three_axis_composition():
    """Mirror of dryrun_multichip phase 5: dp x sp(ring) x ep(moe) composed
    on one 3-axis mesh in ONE train-step program (VERDICT r2 item 6)."""
    import functools

    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from deepfake_video_detection_tpu.models.temporal_transformer import (
        TemporalTransformerDetector)
    from deepfake_video_detection_tpu.train import losses, optim
    from deepfake_video_detection_tpu.train.state import TrainState
    from deepfake_video_detection_tpu.train.steps import make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    devices = jax.devices()[:8]
    mesh = Mesh(np.asarray(devices).reshape(2, 2, 2),
                axis_names=("data", "seq", "expert"))
    model = TemporalTransformerDetector(
        backbone_name="efficientnet_b0", d_model=64, depth=2, num_heads=4,
        dropout_rate=0.0, use_flash=False, use_cls=False,
        mesh=mesh, seq_axis="seq", expert_axis="expert", moe_experts=2)
    repl = NamedSharding(mesh, P())
    tvars = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), repl),
        model.init(jax.random.PRNGKey(0)))
    tx = optim.build_optimizer("adamw", 1e-3, grad_clip=1.0)
    step = make_train_step(model, tx,
                           functools.partial(losses.cross_entropy_loss),
                           mesh=None)
    state = TrainState.create(tvars, tx)
    B, T = 4, 4
    batch = {
        "frames": jax.device_put(
            np.random.default_rng(0).random((B, T, 32, 32, 3), np.float32),
            NamedSharding(mesh, P("data", "seq"))),
        "labels": jax.device_put(np.arange(B) % 2,
                                 NamedSharding(mesh, P("data"))),
    }
    with mesh:
        for _ in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


# -------------------------------------------------------------- validation

def test_build_plan_validation():
    ns = lambda **kw: type("A", (), {  # noqa: E731
        "mesh": None, "seq": "none", "seq_par": 1, "pp_stages": 1,
        "pp_microbatches": 2, "moe_experts": 0, "expert_par": 0, **kw})()

    with pytest.raises(ValueError, match="temporal"):
        strategy.build_plan(ns(seq="ring", seq_par=2), "pretrained", 8)
    with pytest.raises(ValueError, match="BackboneDetector"):
        strategy.build_plan(ns(mesh="data=4,model=2"), "temporal", 8)
    with pytest.raises(ValueError, match="divisible"):
        strategy.build_plan(ns(seq="ring", seq_par=4), "temporal", 6)
    with pytest.raises(ValueError, match="at most one"):
        strategy.build_plan(ns(seq="ring", seq_par=2, pp_stages=2),
                            "temporal", 8)
    # nothing requested -> no plan
    plan, kw = strategy.build_plan(ns(), "pretrained", 8)
    assert plan is None and kw == {}
    # dp+tp plan resolves data from remaining devices
    plan, kw = strategy.build_plan(ns(mesh="model=2"), "pretrained", 8)
    assert plan is not None and dict(plan.mesh.shape) == {
        "data": len(jax.devices()) // 2, "model": 2}
    assert not plan.pure_dp and kw == {}


def test_tp_rules_match_dryrun():
    """CLI and dryrun must share one set of sharding rules."""
    from jax.sharding import PartitionSpec as P

    assert strategy.tp_param_pspec("fc1.weight") == P(None, "model")
    assert strategy.tp_param_pspec("models.1.fc1.weight") == P(None, "model")
    assert strategy.tp_param_pspec(
        "backbone.conv_head.weight") == P(None, None, None, "model")
    assert strategy.tp_param_pspec("fc2.weight") == P()
    assert strategy.pp_param_pspec("blocks.mlp.w1") == P("stage")
    assert strategy.pp_param_pspec("head.weight") == P()


@pytest.mark.slow
def test_cli_progressive_finetune(npz_dir, tmp_path):
    """--progressive: the 3-stage schedule (head-only → last-2-blocks →
    full, ≙ ProgressiveFineTuner src/pretrained_detector.py:221-274) drives
    end-to-end through the CLI; every stage trains with finite losses and
    the final best checkpoint is mirrored to out_dir for the serving
    loader's glob. Head-only stage must leave backbone params untouched."""
    out = str(tmp_path / "prog")
    rc = cli.main(["--data_dir", npz_dir, "--model", "pretrained",
                   "--out_dir", out, "--progressive",
                   "--epochs_per_stage", "1", "--batch_size", "8",
                   "--num_frames", "8", "--no-augment"])
    assert rc == 0

    stage_dirs = sorted(d for d in os.listdir(out) if d.startswith("stage"))
    assert stage_dirs == ["stage0_head_only", "stage1_partial_unfreeze",
                          "stage2_full_finetune"]
    for d in stage_dirs:
        _assert_trained(os.path.join(out, d), epochs=1)
    assert os.path.exists(os.path.join(out, "checkpoint_best.npz"))

    # freezing is real: stage-0 best has the INIT backbone stem (seed 42),
    # head leaves moved
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)
    init = BackboneDetector("efficientnet_b0").init(jax.random.PRNGKey(42))
    v0, _ = load_checkpoint(os.path.join(out, "stage0_head_only",
                                         "checkpoint_best.npz"))
    stem0 = np.asarray(v0["params"]["backbone"]["conv_stem"]["weight"])
    stem_init = np.asarray(init["params"]["backbone"]["conv_stem"]["weight"])
    np.testing.assert_array_equal(stem0, stem_init)
    head0 = np.asarray(v0["params"]["fc1"]["weight"])
    head_init = np.asarray(init["params"]["fc1"]["weight"])
    assert np.abs(head0 - head_init).max() > 0
