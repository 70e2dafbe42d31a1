"""Loader (batching, weighted sampling, padding, prefetch) and mesh helper
tests."""

import numpy as np
import pytest

import jax

from deepfake_video_detection_tpu.data.loader import Loader, prefetch_to_device
from deepfake_video_detection_tpu.parallel.mesh import (
    MeshSpec, batch_sharding, make_mesh, replicate, shard_batch)


class ArrayDataset:
    def __init__(self, n, labels=None, t=4):
        self.n = n
        self._labels = labels if labels is not None else np.arange(n) % 2
        self.t = t

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        faces = np.full((self.t, 8, 8, 3), i, np.uint8)
        return faces, int(self._labels[i]), f"item{i}"

    def labels(self):
        return np.asarray(self._labels, np.int64)


def test_loader_batching_and_padding():
    ds = ArrayDataset(10)
    loader = Loader(ds, batch_size=4, pad_to_multiple=4)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["frames"].shape == (4, 4, 8, 8, 3)
    # last batch: 2 real + 2 pad
    assert batches[-1]["valid"].tolist() == [True, True, False, False]
    assert len(loader) == 3


def test_loader_weighted_oversamples_minority():
    labels = np.array([0] * 90 + [1] * 10)
    ds = ArrayDataset(100, labels)
    loader = Loader(ds, batch_size=10, weighted=True, seed=0)
    got = np.concatenate([b["labels"] for b in loader])
    frac_minority = (got == 1).mean()
    assert 0.3 < frac_minority < 0.7  # ~0.5 under inverse-frequency sampling


def test_loader_shuffle_changes_across_epochs():
    ds = ArrayDataset(16)
    loader = Loader(ds, batch_size=16, shuffle=True, seed=1)
    first = next(iter(loader))["frames"][:, 0, 0, 0, 0].tolist()
    second = next(iter(loader))["frames"][:, 0, 0, 0, 0].tolist()
    assert first != second  # epoch counter reseeds the permutation


def test_prefetch_to_device_preserves_order_and_paths():
    ds = ArrayDataset(8)
    loader = Loader(ds, batch_size=4)
    out = list(prefetch_to_device(iter(loader), size=2))
    assert len(out) == 2
    assert out[0]["paths"][0] == "item0"
    assert int(np.asarray(out[1]["labels"])[0]) == ds[4][1]


def test_mesh_spec_and_helpers():
    spec = MeshSpec(data=-1, model=2).resolve(8)
    assert (spec.data, spec.model) == (4, 2)
    mesh = make_mesh(MeshSpec(model=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    sh = batch_sharding(mesh)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    dev = shard_batch({"x": x}, mesh)
    assert dev["x"].sharding.is_equivalent_to(sh, 2)
    rep = replicate({"w": np.ones(3, np.float32)}, mesh)
    assert rep["w"].sharding.num_devices == 8


def test_global_batch_from_local_single_process():
    from deepfake_video_detection_tpu.parallel.multihost import (
        global_batch_from_local, local_batch_size)

    mesh = make_mesh()
    batch = {"frames": np.ones((8, 2, 4, 4, 3), np.uint8),
             "labels": np.arange(8, dtype=np.int64)}
    out = global_batch_from_local(batch, mesh)
    assert out["frames"].sharding.is_equivalent_to(batch_sharding(mesh), 5)
    np.testing.assert_array_equal(np.asarray(out["labels"]), batch["labels"])
    assert local_batch_size(64) == 64  # one process
