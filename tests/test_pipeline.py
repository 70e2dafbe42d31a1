"""Pipeline parallelism: the GPipe microbatch schedule must be a pure
schedule — forward outputs AND gradients identical to running the block
stack sequentially on one device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deepfake_video_detection_tpu.parallel.pipeline import pipeline_blocks


def _block(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _make(L=8, D=6, M=4, mb=2, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "w": jnp.asarray(rng.normal(0, 0.5, (L, D, D)), jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.1, (L, D)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(M, mb, D)), jnp.float32)
    return params, x


def _sequential(params, x):
    def body(h, i):
        return _block(jax.tree_util.tree_map(lambda a: a[i], params), h), None

    h, _ = jax.lax.scan(body, x, jnp.arange(params["w"].shape[0]))
    return h


@pytest.mark.parametrize("mesh_axes", [("stage",), ("data", "stage")])
def test_pipeline_matches_sequential(mesh_axes):
    params, x = _make()
    if mesh_axes == ("stage",):
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))
        batch_axis = None
    else:
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                    ("data", "stage"))
        batch_axis = "data"

    @jax.jit
    def piped(params, x):
        return pipeline_blocks(_block, params, x, mesh,
                               stage_axis="stage", batch_axis=batch_axis)

    want = jax.vmap(lambda mbx: _sequential(params, mbx))(x)
    got = piped(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_gradients_match_sequential():
    """Backprop runs the reverse pipeline (ppermute transpose) — grads must
    equal the sequential stack's."""
    params, x = _make()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stage",))

    def loss_piped(params):
        y = pipeline_blocks(_block, params, x, mesh, stage_axis="stage")
        return jnp.sum(y ** 2)

    def loss_seq(params):
        y = jax.vmap(lambda mbx: _sequential(params, mbx))(x)
        return jnp.sum(y ** 2)

    l1, g1 = jax.jit(jax.value_and_grad(loss_piped))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_seq))(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-4, atol=1e-6)


def test_pipeline_in_train_step():
    """A full train step (loss + backward + adamw update) through the
    pipeline compiles and runs with DP x PP sharding."""
    import functools

    from deepfake_video_detection_tpu.train import losses as losses_mod
    from deepfake_video_detection_tpu.train import optim as optim_mod
    from deepfake_video_detection_tpu.train.state import TrainState
    from deepfake_video_detection_tpu.train.steps import make_train_step

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "stage"))

    class PipedModel:
        """Frames → per-clip feature → L pipelined blocks → 2-way head."""

        L, D = 4, 8

        def init(self, rng):
            r = np.random.default_rng(0)
            return {"params": {
                "proj": {"w": jnp.asarray(r.normal(0, .3, (3, self.D)),
                                          jnp.float32)},
                "blocks": {"w": jnp.asarray(
                    r.normal(0, .3, (self.L, self.D, self.D)), jnp.float32),
                    "b": jnp.zeros((self.L, self.D), jnp.float32)},
                "head": {"w": jnp.asarray(r.normal(0, .3, (self.D, 2)),
                                          jnp.float32)},
            }, "state": {}}

        def apply(self, variables, x, train=False, rng=None):
            p = variables["params"]
            feats = x.astype(jnp.float32).mean(axis=(1, 2, 3)) @ p["proj"]["w"]
            # microbatch the batch axis: (B, D) -> (M, mb, D)
            B = feats.shape[0]
            M = 4
            h = pipeline_blocks(_block, p["blocks"],
                                feats.reshape(M, B // M, self.D), mesh,
                                stage_axis="stage", batch_axis=None)
            return h.reshape(B, self.D) @ p["head"]["w"], {}

    model = PipedModel()
    variables = model.init(jax.random.PRNGKey(0))
    tx = optim_mod.build_optimizer("adamw", 1e-2, grad_clip=1.0)
    step = make_train_step(model, tx,
                           functools.partial(losses_mod.cross_entropy_loss),
                           mesh=None, donate=False)
    state = TrainState.create(variables, tx)
    rng = np.random.default_rng(0)
    batch = {"frames": jnp.asarray(rng.random((8, 2, 4, 4, 3)), jnp.float32),
             "labels": jnp.asarray(np.arange(8) % 2)}
    with mesh:
        new_state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(new_state.step) == 1
