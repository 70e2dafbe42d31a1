"""Expert parallelism: the sharded MoE dispatch must reproduce the dense
reference path exactly (up to capacity drops, disabled here), and train."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deepfake_video_detection_tpu.nn.moe import MoEMLP, load_balance_loss


@pytest.fixture(scope="module")
def moe_and_x():
    moe = MoEMLP(d_model=8, hidden=16, num_experts=4, capacity_factor=4.0)
    params = moe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)
    return moe, params, x


def test_expert_parallel_matches_dense(moe_and_x):
    moe, params, x = moe_and_x
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))
    dense = jax.jit(moe.apply_dense)(params, x)
    ep = jax.jit(lambda p, x: moe.apply_expert_parallel(p, x, mesh))(params, x)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_expert_parallel_gradients_match_dense(moe_and_x):
    moe, params, x = moe_and_x
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))

    def loss_d(p):
        return jnp.sum(moe.apply_dense(p, x) ** 2)

    def loss_e(p):
        return jnp.sum(moe.apply_expert_parallel(p, x, mesh) ** 2)

    ld, gd = jax.jit(jax.value_and_grad(loss_d))(params)
    le, ge = jax.jit(jax.value_and_grad(loss_e))(params)
    assert float(ld) == pytest.approx(float(le), rel=1e-5)
    for k in ("w1", "w2"):
        np.testing.assert_allclose(np.asarray(ge[k]), np.asarray(gd[k]),
                                   rtol=1e-4, atol=1e-6)


def test_capacity_drops_zero_out_overflow():
    """With capacity_factor < 1, overloaded experts drop tokens to zero —
    the dropped tokens are exactly the difference vs the dense path."""
    moe = MoEMLP(d_model=8, hidden=16, num_experts=2, capacity_factor=0.25)
    params = moe.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("expert",))
    dense = np.asarray(moe.apply_dense(params, x))
    ep = np.asarray(moe.apply_expert_parallel(params, x, mesh))
    per_tok_match = np.isclose(ep, dense, atol=1e-5).all(axis=-1)
    per_tok_zero = (ep == 0).all(axis=-1)
    assert np.all(per_tok_match | per_tok_zero)
    assert per_tok_zero.any(), "expected some capacity drops at factor 0.25"
    assert per_tok_match.any(), "everything dropped — capacity math broken"


def test_load_balance_loss_bounds(moe_and_x):
    moe, params, x = moe_and_x
    idx, gate, probs = moe._route(params, x)
    aux = float(load_balance_loss(probs, idx, moe.num_experts))
    # perfectly balanced → 1.0; collapsed → up to E
    assert 0.9 <= aux <= moe.num_experts + 1e-3


def test_temporal_transformer_moe_ep_matches_dense():
    """Model-level EP: the temporal transformer with MoE block MLPs produces
    the same logits with experts sharded over the mesh as with the dense
    single-device path."""
    from deepfake_video_detection_tpu.models.temporal_transformer import (
        TemporalTransformerDetector)

    class TinyBackbone:
        feature_dim = 6

        def init(self, rng):
            from deepfake_video_detection_tpu.nn import init as I
            return {"params": {"proj": {
                "weight": I.kaiming_uniform(rng, (6, 3)),
                "bias": I.zeros(6)}}, "state": {}}

        def apply(self, variables, x, train=False, rng=None):
            from deepfake_video_detection_tpu.nn import layers as L
            feats = x.astype(jnp.float32).mean(axis=(1, 2))
            return L.linear(variables["params"]["proj"], feats), {}

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))

    def build(ep: bool):
        m = TemporalTransformerDetector(
            d_model=8, depth=2, num_heads=2, dropout_rate=0.0,
            use_flash=False, moe_experts=4,
            mesh=mesh if ep else None, expert_axis="expert" if ep else None)
        m.backbone = TinyBackbone()
        m.feature_dim = 6
        return m

    variables = build(False).init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 4, 8, 8, 3)), jnp.float32)
    (lg_d, _), _ = jax.jit(
        lambda v, x: build(False).apply(v, x))(variables, x)
    (lg_e, _), _ = jax.jit(
        lambda v, x: build(True).apply(v, x))(variables, x)
    np.testing.assert_allclose(np.asarray(lg_e), np.asarray(lg_d),
                               rtol=1e-5, atol=1e-5)


def test_moe_aux_loss_wired_into_train_step():
    """The switch load-balance term flows model → train step: apply(train=True)
    reports it under state["aux_losses"], make_train_step folds it into the
    loss (scaled by aux_loss_weight) and strips it from the stored state."""
    import functools

    from deepfake_video_detection_tpu.models.temporal_transformer import (
        TemporalTransformerDetector)
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

    model = TemporalTransformerDetector(
        d_model=16, depth=2, num_heads=2, dropout_rate=0.0, use_flash=False,
        moe_experts=4)
    model.backbone = TinyBackbone()
    model.feature_dim = 8
    variables = model.init(jax.random.PRNGKey(0))

    # apply(train=True) reports the aux term; eval does not
    x = jnp.asarray(np.random.default_rng(0).random((2, 4, 8, 8, 3)),
                    jnp.float32)
    _, st_train = model.apply(variables, x, train=True,
                              rng=jax.random.PRNGKey(1))
    assert "aux_losses" in st_train
    aux = float(st_train["aux_losses"]["moe_load_balance"])
    assert 1.0 <= aux <= 4.0  # switch loss is in [1, E]
    _, st_eval = model.apply(variables, x, train=False)
    assert "aux_losses" not in st_eval

    batch = {"frames": np.asarray(x),
             "labels": np.array([0, 1], np.int64)}
    tx = optim_mod.build_optimizer("adamw", 1e-3, grad_clip=1.0)
    loss_fn = functools.partial(losses_mod.cross_entropy_loss)

    def run(weight):
        step = make_train_step(model, tx, loss_fn, donate=False,
                               aux_loss_weight=weight)
        state = TrainState.create(
            jax.tree_util.tree_map(jax.device_put, variables), tx)
        new_state, m = step(state, batch, jax.random.PRNGKey(2))
        return float(m["loss"]), new_state

    loss0, ns0 = run(0.0)
    loss1, ns1 = run(0.5)
    assert loss1 == pytest.approx(loss0 + 0.5 * aux, rel=1e-4)
    # the aux scalar never leaks into the persisted model state
    assert "aux_losses" not in ns0.model_state
    assert "aux_losses" not in ns1.model_state
