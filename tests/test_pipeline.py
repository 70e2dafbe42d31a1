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


def test_pp_temporal_transformer_matches_loop():
    """Real-model PP: the temporal transformer's stacked-block pipeline mode
    (stage_axis) must reproduce the sequential-loop model exactly with the
    same weights — forward AND loss/grads through a train step."""
    import functools

    from deepfake_video_detection_tpu.models.temporal_transformer import (
        TemporalTransformerDetector, stack_blocks)
    from deepfake_video_detection_tpu.train import losses as losses_mod
    from deepfake_video_detection_tpu.train import optim as optim_mod
    from deepfake_video_detection_tpu.train.state import TrainState
    from deepfake_video_detection_tpu.train.steps import make_train_step

    class TinyBackbone:
        feature_dim = 8

        def init(self, rng):
            from deepfake_video_detection_tpu.nn import init as I
            return {"params": {"proj": {
                "weight": I.kaiming_uniform(rng, (8, 3)),
                "bias": I.zeros(8)}}, "state": {}}

        def apply(self, variables, x, train=False, rng=None):
            from deepfake_video_detection_tpu.nn import layers as L
            feats = x.astype(jnp.float32).mean(axis=(1, 2))
            return L.linear(variables["params"]["proj"], feats), {}

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "stage"))

    def build(pp: bool):
        m = TemporalTransformerDetector(
            d_model=16, depth=4, num_heads=2, dropout_rate=0.0,
            use_flash=False, use_cls=False,
            mesh=mesh if pp else None, stage_axis="stage" if pp else None,
            pp_microbatches=2)
        m.backbone = TinyBackbone()
        m.feature_dim = 8
        return m

    loop_vars = jax.tree_util.tree_map(
        np.asarray, build(False).init(jax.random.PRNGKey(0)))
    pp_vars = {
        "params": dict(loop_vars["params"],
                       blocks=jax.tree_util.tree_map(
                           np.asarray,
                           stack_blocks(loop_vars["params"]["blocks"]))),
        "state": loop_vars["state"],
    }

    rng = np.random.default_rng(0)
    frames = rng.random((4, 8, 8, 8, 3)).astype(np.float32)
    labels = (np.arange(4) % 2).astype(np.int64)
    tx = optim_mod.build_optimizer("adamw", 1e-2, grad_clip=1.0)
    loss_fn = functools.partial(losses_mod.cross_entropy_loss)

    def run(pp: bool):
        model = build(pp)
        variables = pp_vars if pp else loop_vars
        step = make_train_step(model, tx, loss_fn, mesh=None, donate=False)
        state = TrainState.create(
            jax.tree_util.tree_map(jax.device_put, variables), tx)
        with mesh:
            new_state, m = step(state, {"frames": frames, "labels": labels},
                                jax.random.PRNGKey(1))
        return float(m["loss"]), np.asarray(new_state.params["head"]["weight"])

    loss_pp, head_pp = run(True)
    loss_loop, head_loop = run(False)
    assert loss_pp == pytest.approx(loss_loop, rel=1e-5)
    np.testing.assert_allclose(head_pp, head_loop, rtol=1e-4, atol=1e-6)


def test_stack_unstack_roundtrip():
    from deepfake_video_detection_tpu.models.temporal_transformer import (
        TemporalTransformerDetector, stack_blocks, unstack_blocks)

    m = TemporalTransformerDetector(d_model=16, depth=3, num_heads=2)
    m.backbone = type("B", (), {
        "feature_dim": 8,
        "init": lambda self, r: {"params": {}, "state": {}},
        "apply": lambda self, v, x, train=False, rng=None: (x, {})})()
    m.feature_dim = 8
    blocks = m.init(jax.random.PRNGKey(0))["params"]["blocks"]
    rt = unstack_blocks(stack_blocks(blocks))
    for i in ("0", "1", "2"):
        np.testing.assert_array_equal(
            np.asarray(rt[i]["attn"]["qkv"]["weight"]),
            np.asarray(blocks[i]["attn"]["qkv"]["weight"]))


def test_pp_checkpoint_serves_through_loader(tmp_path):
    """A pipeline-parallel-trained checkpoint (stacked `blocks.*` leaves)
    must load through the serving loader: the stacked layout is renumbered
    to the canonical loop layout (`blocks.0...`) on load and the served
    model reproduces the PP model's forward exactly."""
    from deepfake_video_detection_tpu.checkpoint.store import save_checkpoint
    from deepfake_video_detection_tpu.models.temporal_transformer import (
        TemporalTransformerDetector)
    from deepfake_video_detection_tpu.serve.loader import load_model

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "stage"))
    pp = TemporalTransformerDetector(
        "efficientnet_b0", d_model=32, depth=4, num_heads=2,
        dropout_rate=0.0, use_flash=False, use_cls=True,
        mesh=mesh, stage_axis="stage", pp_microbatches=2)
    variables = jax.tree_util.tree_map(np.asarray,
                                       pp.init(jax.random.PRNGKey(0)))
    path = str(tmp_path / "pp_temporal.npz")
    save_checkpoint(path, variables,
                    meta={"model_config": {"model_type": "temporal",
                                           "backbone": "efficientnet_b0",
                                           "num_heads": 2}})

    model, loaded_vars, stats = load_model(path, "temporal")
    assert stats["model_type"] == "temporal"
    assert stats["match_ratio"] == pytest.approx(1.0)
    # loaded layout is the loop layout
    assert "0" in loaded_vars["params"]["blocks"]

    # the evaluator's checkpoint builder must renumber too (shared
    # normalize_state_dict helper) — a PP checkpoint evaluates, not
    # silently random-inits its blocks
    from deepfake_video_detection_tpu.checkpoint.store import load_any
    from deepfake_video_detection_tpu.evals.evaluate import (
        build_model_from_checkpoint)
    sd, meta = load_any(path)
    _, _, report, mt = build_model_from_checkpoint(sd, meta, "temporal")
    assert mt == "temporal" and report["match_ratio"] == pytest.approx(1.0)

    x = jnp.asarray(np.random.default_rng(1).random((4, 4, 32, 32, 3)),
                    jnp.float32)
    (logits_loaded, _), _ = model.apply(loaded_vars, x, train=False)
    with mesh:
        (logits_pp, _), _ = pp.apply(
            jax.tree_util.tree_map(jax.device_put, variables), x,
            train=False)
    np.testing.assert_allclose(np.asarray(logits_loaded),
                               np.asarray(logits_pp), rtol=1e-4, atol=1e-5)
