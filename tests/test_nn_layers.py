"""Op-level parity tests: our functional layers vs torch CPU reference.

These pin the numerics that checkpoint compatibility depends on (conv padding,
BN biased/unbiased variance, MaxPool -inf padding, LSTM gate order) — the
semantics the reference inherits from torch (SURVEY.md §7 "hard parts").
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import layers as L


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


@pytest.mark.parametrize("stride,padding,kernel", [(1, 1, 3), (2, 1, 3), (2, 3, 7), (1, 2, 5)])
def test_conv2d_matches_torch(rng, stride, padding, kernel):
    x = rng.standard_normal((2, 5, 16, 16)).astype(np.float32)
    w = rng.standard_normal((8, 5, kernel, kernel)).astype(np.float32) * 0.1
    b = rng.standard_normal((8,)).astype(np.float32)

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=padding).numpy()
    got = L.conv2d({"weight": jnp.asarray(oihw_to_hwio(w)), "bias": jnp.asarray(b)},
                   jnp.asarray(to_nhwc(x)), stride=stride, padding=padding)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)


def test_depthwise_conv_matches_torch(rng):
    x = rng.standard_normal((2, 8, 14, 14)).astype(np.float32)
    w = rng.standard_normal((8, 1, 3, 3)).astype(np.float32) * 0.2
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=1, padding=1, groups=8).numpy()
    got = L.conv2d({"weight": jnp.asarray(oihw_to_hwio(w))}, jnp.asarray(to_nhwc(x)),
                   stride=1, padding=1, groups=8)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)


def test_linear_matches_torch(rng):
    x = rng.standard_normal((4, 10)).astype(np.float32)
    w = rng.standard_normal((6, 10)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = L.linear({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_batch_norm_eval_matches_torch(rng):
    x = rng.standard_normal((3, 6, 8, 8)).astype(np.float32)
    gamma = rng.standard_normal((6,)).astype(np.float32)
    beta = rng.standard_normal((6,)).astype(np.float32)
    mean = rng.standard_normal((6,)).astype(np.float32)
    var = np.abs(rng.standard_normal((6,))).astype(np.float32) + 0.5

    ref = F.batch_norm(torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
                       torch.from_numpy(gamma), torch.from_numpy(beta),
                       training=False, eps=1e-5).numpy()
    got, _ = L.batch_norm(
        {"weight": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        {"running_mean": jnp.asarray(mean), "running_var": jnp.asarray(var)},
        jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-4)


def test_batch_norm_train_updates_running_stats_like_torch(rng):
    x = rng.standard_normal((4, 3, 5, 5)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(3, momentum=0.1)
    bn.train()
    ref_y = bn(torch.from_numpy(x)).detach().numpy()

    p = {"weight": jnp.asarray(bn.weight.detach().numpy() * 0 + 1.0),
         "bias": jnp.zeros(3)}
    s = {"running_mean": jnp.zeros(3), "running_var": jnp.ones(3)}
    y, new_s = L.batch_norm(p, s, jnp.asarray(to_nhwc(x)), train=True, momentum=0.1)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)), ref_y,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(new_s["running_mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_s["running_var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-4)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 4, 9, 9)).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), kernel_size=3, stride=2, padding=1).numpy()
    got = L.max_pool2d(jnp.asarray(to_nhwc(x)), kernel=3, stride=2, padding=1)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), ref,
                               rtol=1e-5, atol=1e-5)


def test_lstm_matches_torch(rng):
    B, T, F_in, H, layers = 2, 7, 12, 16, 2
    x = rng.standard_normal((B, T, F_in)).astype(np.float32)
    ref_lstm = torch.nn.LSTM(F_in, H, num_layers=layers, batch_first=True)
    with torch.no_grad():
        ref_y, (ref_h, ref_c) = ref_lstm(torch.from_numpy(x))

    params = []
    for k in range(layers):
        params.append({
            "weight_ih": jnp.asarray(getattr(ref_lstm, f"weight_ih_l{k}").detach().numpy()),
            "weight_hh": jnp.asarray(getattr(ref_lstm, f"weight_hh_l{k}").detach().numpy()),
            "bias_ih": jnp.asarray(getattr(ref_lstm, f"bias_ih_l{k}").detach().numpy()),
            "bias_hh": jnp.asarray(getattr(ref_lstm, f"bias_hh_l{k}").detach().numpy()),
        })
    y, (h, c) = L.lstm(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref_y.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), ref_h.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c), ref_c.numpy(), rtol=1e-4, atol=1e-4)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((3, 5, 16)).astype(np.float32)
    ln = torch.nn.LayerNorm(16, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
        ln.bias.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
        ref = ln(torch.from_numpy(x)).numpy()
    got = L.layer_norm({"weight": jnp.asarray(ln.weight.detach().numpy()),
                        "bias": jnp.asarray(ln.bias.detach().numpy())},
                       jnp.asarray(x), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_multi_head_attention_matches_torch(rng):
    B, N, C, nh = 2, 9, 32, 4
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    mha = torch.nn.MultiheadAttention(C, nh, batch_first=True)
    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    p = {
        "qkv": {"weight": jnp.asarray(mha.in_proj_weight.detach().numpy()),
                "bias": jnp.asarray(mha.in_proj_bias.detach().numpy())},
        "proj": {"weight": jnp.asarray(mha.out_proj.weight.detach().numpy()),
                 "bias": jnp.asarray(mha.out_proj.bias.detach().numpy())},
    }
    got = L.multi_head_attention(p, jnp.asarray(x), num_heads=nh)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_dropout_zero_rate_is_identity(rng):
    x = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    y = L.dropout(jax.random.key(0), x, 0.0, train=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_devices_are_virtual_8():
    assert len(jax.devices()) == 8


def test_conv2d_bf16_gradients():
    """bf16 conv must be differentiable (regression: preferred_element_type
    in conv2d broke the transpose rule — every bf16 train step failed with
    'requires arguments to have the same dtypes')."""
    import jax
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.nn import layers as L

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 8, 8, 6)), jnp.bfloat16)

    for groups, w_shape in ((1, (3, 3, 6, 4)), (6, (3, 3, 1, 6))):
        w0 = jnp.asarray(rng.random(w_shape), jnp.float32)

        def f(w):
            y = L.conv2d({"weight": w}, x, stride=1, padding=1, groups=groups)
            return jnp.sum(y.astype(jnp.float32))

        g = jax.grad(f)(w0)
        assert g.shape == w_shape and bool(jnp.all(jnp.isfinite(g)))
