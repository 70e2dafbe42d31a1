"""End-to-end trainer tests on synthetic .npz face stacks with a tiny model,
running data-parallel over the 8-device virtual CPU mesh (conftest)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset
from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L
from deepfake_video_detection_tpu.parallel.mesh import make_mesh
from deepfake_video_detection_tpu.train.trainer import Trainer, TrainerConfig


class TinyDetector:
    """Minimal model with the framework's model interface: mean-pool frames →
    linear head. Fast to compile; exercises the full trainer machinery."""

    feature_dim = 8

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        params = {
            "proj": {"weight": I.kaiming_uniform(k1, (self.feature_dim, 3)),
                     "bias": I.zeros(self.feature_dim)},
            "head": {"weight": I.kaiming_uniform(k2, (2, self.feature_dim)),
                     "bias": I.zeros(2)},
        }
        return {"params": params, "state": {}}

    def apply(self, variables, x, train=False, rng=None):
        p = variables["params"]
        # (B,T,H,W,C) → mean over T,H,W → (B,C)
        feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        h = jax.nn.relu(L.linear(p["proj"], feats))
        return L.linear(p["head"], h), {}


@pytest.fixture(scope="module")
def npz_dir(tmp_path_factory):
    """24 videos: 'fake' ones bright, 'real' ones dark — linearly separable."""
    d = tmp_path_factory.mktemp("faces")
    rng = np.random.default_rng(0)
    for i in range(24):
        label = i % 2
        base = 180 if label == 1 else 60
        faces = rng.integers(base - 30, base + 30,
                             size=(rng.integers(3, 9), 32, 32, 3)).astype(np.uint8)
        np.savez_compressed(d / f"video_{i}_{'fake' if label else 'real'}.npz",
                            faces=faces, label=np.int64(label))
    return str(d)


def test_dataset_loading(npz_dir):
    ds = VideoFacesDataset(npz_dir, num_frames=4)
    assert len(ds) == 24
    faces, label, path = ds[0]
    assert faces.shape == (4, 32, 32, 3)
    assert faces.dtype == np.uint8
    assert label in (0, 1)
    labels = ds.labels()
    assert labels.sum() == 12


def test_trainer_end_to_end(npz_dir, tmp_path):
    ds = VideoFacesDataset(npz_dir, num_frames=4)
    train_ds, val_ds = ds.split(0.25)
    mesh = make_mesh()
    cfg = TrainerConfig(
        out_dir=str(tmp_path / "ckpt"), epochs=3, batch_size=8, num_frames=4,
        lr=5e-2, optimizer="adamw", schedule="cosine", loss="focal",
        balance="weights", threshold_sweep=True, best_metric="f1",
        augment=False, plateau=True, model_config={"model_type": "tiny"},
    )
    trainer = Trainer(TinyDetector(), train_ds, val_ds, cfg, mesh=mesh)
    state = trainer.train(log=lambda *_: None)

    # learns the separable task
    final = trainer.validate(state, epoch=99, write_preds=False)
    assert final["accuracy"] >= 0.8

    # artifacts: history CSV, calibration json, checkpoints, preds CSVs
    out = cfg.out_dir
    assert os.path.exists(os.path.join(out, "training_history.csv"))
    assert os.path.exists(os.path.join(out, "checkpoint_best.npz"))
    assert os.path.exists(os.path.join(out, "preds_epoch_0.csv"))
    cal = json.load(open(os.path.join(out, "calibration_best.json")))
    assert {"best_thr_accuracy", "best_thr_f1", "best_f1"} <= set(cal)
    assert 0.05 <= cal["best_thr_f1"] <= 0.95

    # resume restores epoch counter and params
    t2 = Trainer(TinyDetector(), train_ds, val_ds, cfg, mesh=mesh)
    s2 = t2.resume(os.path.join(out, "checkpoint_best.npz"))
    assert t2.start_epoch >= 1
    p_old = np.asarray(state.params["head"]["weight"])
    # best checkpoint params match some epoch's params — shape check + finite
    assert np.all(np.isfinite(np.asarray(s2.params["head"]["weight"])))
    assert np.asarray(s2.params["head"]["weight"]).shape == p_old.shape


def test_train_step_sharding(npz_dir):
    """The jitted train step runs with batch sharded across 8 devices."""
    ds = VideoFacesDataset(npz_dir, num_frames=4)
    train_ds, val_ds = ds.split(0.25)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    cfg = TrainerConfig(out_dir="/tmp/_unused", epochs=1, batch_size=8,
                        num_frames=4, augment=False)
    trainer = Trainer(TinyDetector(), train_ds, val_ds, cfg, mesh=mesh)
    state = trainer.init_state()
    state, m = trainer.train_epoch(state, 0)
    assert np.isfinite(float(m["train_loss"]))


def test_dp_matches_single_device(npz_dir, tmp_path):
    """Data-parallel training over the 8-device mesh must produce the same
    losses as single-device training — SPMD is a performance choice, not a
    numerics choice."""
    ds = VideoFacesDataset(npz_dir, num_frames=4)
    train_ds, val_ds = ds.split(0.25)

    def run(mesh):
        cfg = TrainerConfig(out_dir=str(tmp_path / f"dp{mesh is not None}"),
                            epochs=1, batch_size=8, num_frames=4, lr=1e-2,
                            augment=False, save_every=0, seed=7)
        tr = Trainer(TinyDetector(), train_ds, val_ds, cfg, mesh=mesh)
        state = tr.init_state()
        state, m = tr.train_epoch(state, 0)
        return m["train_loss"], np.asarray(state.params["head"]["weight"])

    loss_mesh, w_mesh = run(make_mesh())
    loss_one, w_one = run(None)
    assert loss_mesh == pytest.approx(loss_one, rel=1e-5)
    np.testing.assert_allclose(w_mesh, w_one, rtol=1e-5, atol=1e-6)


def test_warm_start_from_torch_checkpoint(npz_dir, tmp_path):
    """--init-from accepts reference-layout .pt checkpoints via the bridge."""
    torch = pytest.importorskip("torch")
    from deepfake_video_detection_tpu.checkpoint.store import save_torch_checkpoint

    ds = VideoFacesDataset(npz_dir, num_frames=4)
    train_ds, val_ds = ds.split(0.25)
    cfg = TrainerConfig(out_dir=str(tmp_path / "w"), epochs=1, batch_size=8,
                        num_frames=4, augment=False)
    t1 = Trainer(TinyDetector(), train_ds, val_ds, cfg)
    s1 = t1.init_state()
    pt = str(tmp_path / "init.pt")
    save_torch_checkpoint(pt, s1.variables, layout="model_config")
    t2 = Trainer(TinyDetector(), train_ds, val_ds, cfg)
    s2 = t2.warm_start(pt)
    np.testing.assert_allclose(np.asarray(s2.params["head"]["weight"]),
                               np.asarray(s1.params["head"]["weight"]),
                               rtol=1e-6)


def test_remat_matches_no_remat(npz_dir, tmp_path):
    ds = VideoFacesDataset(npz_dir, num_frames=4)
    train_ds, val_ds = ds.split(0.25)

    def run(remat):
        cfg = TrainerConfig(out_dir=str(tmp_path / f"r{remat}"), epochs=1,
                            batch_size=8, num_frames=4, lr=1e-2,
                            augment=False, save_every=0, seed=3, remat=remat)
        tr = Trainer(TinyDetector(), train_ds, val_ds, cfg)
        state = tr.init_state()
        state, m = tr.train_epoch(state, 0)
        return m["train_loss"], np.asarray(state.params["proj"]["weight"])

    l1, w1 = run(False)
    l2, w2 = run(True)
    assert l1 == pytest.approx(l2, rel=1e-6)
    np.testing.assert_allclose(w1, w2, rtol=1e-6)
