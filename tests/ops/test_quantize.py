"""Post-training int8 quantization (layers/wrappers.QuantableConv +
export/quantize.calibrate_int8)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jtsm_tpu.export.quantize import calibrate_int8
from jtsm_tpu.layers.wrappers import Conv2d, QuantableConv


def test_quantable_conv_matches_flax_conv_exactly():
    """Param tree and f32 outputs are identical to flax nn.Conv (the
    checkpoint-name contract: conv/kernel, conv/bias)."""
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (2, 9, 11, 5), jnp.float32)
    kwargs = dict(
        features=7,
        kernel_size=(3, 3),
        strides=(2, 2),
        padding=((1, 1), (1, 1)),
        kernel_dilation=(1, 1),
        feature_group_count=1,
        use_bias=True,
        dtype=jnp.float32,
    )
    ours = QuantableConv(**kwargs)
    ref = nn.Conv(param_dtype=jnp.float32, **kwargs)
    v_ours = ours.init(rng, x)
    v_ref = ref.init(rng, x)
    assert jax.tree_util.tree_structure(v_ours) == jax.tree_util.tree_structure(v_ref)
    assert v_ours["params"]["kernel"].shape == v_ref["params"]["kernel"].shape
    y_ours = ours.apply(v_ref, x)  # same params both ways
    y_ref = ref.apply(v_ref, x)
    np.testing.assert_array_equal(np.asarray(y_ours), np.asarray(y_ref))


def test_int8_path_matches_numpy_quantization_oracle():
    """With act_scale provided, the conv runs symmetric s8 x s8 -> s32 and
    dequantizes exactly like a numpy transcription."""
    rng = jax.random.key(2)
    x = jax.random.normal(jax.random.key(3), (1, 8, 8, 4), jnp.float32) * 3.0
    conv = QuantableConv(
        features=6,
        kernel_size=(3, 3),
        strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dtype=jnp.float32,
    )
    variables = conv.init(rng, x)
    kernel = np.asarray(variables["params"]["kernel"], np.float64)
    bias = np.asarray(variables["params"]["bias"], np.float64)

    s_a = float(np.abs(np.asarray(x)).max() / 127.0)
    y = conv.apply(
        {**variables, "quant": {"act_scale": jnp.float32(s_a)}}, x
    )

    s_w = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    x_q = np.clip(np.round(np.asarray(x, np.float64) / s_a), -127, 127)
    w_q = np.clip(np.round(kernel / s_w), -127, 127)
    xp = np.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((1, 8, 8, 6))
    for i in range(8):
        for j in range(8):
            patch = xp[0, i : i + 3, j : j + 3, :]  # (3,3,4)
            out[0, i, j] = np.tensordot(patch, w_q, axes=([0, 1, 2], [0, 1, 2]))
    expected = out * (s_a * s_w) + bias
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-4)


def test_int8_path_approximates_f32():
    """End-to-end error of the quantized conv stays small on natural-range
    activations (the deployment-accuracy premise)."""
    rng = jax.random.key(4)
    x = jax.random.normal(jax.random.key(5), (2, 16, 16, 8), jnp.float32)
    conv = QuantableConv(
        features=8, kernel_size=(3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32
    )
    variables = conv.init(rng, x)
    y32 = conv.apply(variables, x)
    s_a = jnp.max(jnp.abs(x)) / 127.0
    y8 = conv.apply({**variables, "quant": {"act_scale": s_a}}, x)
    err = np.abs(np.asarray(y8 - y32))
    ref = np.abs(np.asarray(y32)).max()
    assert err.max() / ref < 0.05, err.max() / ref


class _TinyModel(nn.Module):
    @nn.compact
    def __call__(self, batch, train=False):
        x = Conv2d(8, kernel_size=3, padding=1, name="backbone")(batch["image"])
        x = jax.nn.relu(x)
        x = Conv2d(4, kernel_size=3, padding=1, name="head")(x)
        return {"out": x}


def test_calibrate_int8_scopes_and_running_max():
    model = _TinyModel()
    b1 = {"image": jnp.ones((1, 8, 8, 3), jnp.float32)}
    b2 = {"image": 5.0 * jnp.ones((1, 8, 8, 3), jnp.float32)}
    variables = model.init(jax.random.key(0), b1)

    quant = calibrate_int8(model, variables, [b1, b2], scopes=("backbone",))
    # scope filter: only the backbone conv is quantized
    assert set(quant.keys()) == {"backbone"}
    # running max across batches: abs-max is 5.0
    scale = np.asarray(quant["backbone"]["conv"]["act_scale"])
    np.testing.assert_allclose(scale, 5.0 / 127.0, rtol=1e-6)

    # the quantized apply runs and approximates the float path
    y32 = model.apply(variables, b2)["out"]
    y8 = model.apply({**variables, "quant": quant}, b2)["out"]
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y32), rtol=0.1, atol=0.05)

    with pytest.raises(ValueError):
        calibrate_int8(model, variables, [], scopes=("backbone",))


def test_init_does_not_create_calibration_variables():
    """model.init must not leak a quant_calib collection (all collections
    are mutable during init; the conv guards on is_initializing)."""
    model = _TinyModel()
    b = {"image": jnp.ones((1, 8, 8, 3), jnp.float32)}
    variables = model.init(jax.random.key(0), b)
    assert "quant_calib" not in variables
    assert "quant" not in variables


def test_quantable_dense_matches_flax_dense_and_int8_close():
    from jtsm_tpu.layers.wrappers import QuantableDense

    x = jax.random.normal(jax.random.key(8), (3, 10), jnp.float32)
    ours = QuantableDense(features=6, dtype=jnp.float32)
    ref = nn.Dense(features=6, param_dtype=jnp.float32)
    v = ref.init(jax.random.key(9), x)
    assert (
        jax.tree_util.tree_structure(ours.init(jax.random.key(9), x))
        == jax.tree_util.tree_structure(v)
    )
    np.testing.assert_array_equal(
        np.asarray(ours.apply(v, x)), np.asarray(ref.apply(v, x))
    )
    s_a = jnp.max(jnp.abs(x)) / 127.0
    y8 = ours.apply({**v, "quant": {"act_scale": s_a}}, x)
    y32 = ref.apply(v, x)
    assert np.abs(np.asarray(y8 - y32)).max() / np.abs(np.asarray(y32)).max() < 0.05
