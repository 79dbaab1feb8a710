"""Model zoo tests (analog of reference tests/unit_tests/test_neural_networks.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.models import PINNModel
from tests.test_utils import tiny_config

ARCHS = ["feedforward", "resnet", "siren", "fourier", "fno", "attention", "autoencoder"]


@pytest.mark.parametrize("arch", ARCHS)
def test_forward_shape_and_finite(arch):
    cfg = tiny_config(architecture=arch)
    model = PINNModel(cfg)
    x = jnp.ones((5, cfg.model.input_dim))
    y = model(x)
    assert y.shape == (5, cfg.model.output_dim)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("arch", ARCHS)
def test_pointwise_apply(arch):
    """Models must work on a single coordinate vector (needed by the
    point-wise derivative engine)."""
    cfg = tiny_config(architecture=arch)
    model = PINNModel(cfg)
    z = jnp.ones((cfg.model.input_dim,))
    y = model.apply(model.params, z)
    assert y.shape == (cfg.model.output_dim,)


def test_param_count_positive():
    cfg = tiny_config(architecture="feedforward")
    model = PINNModel(cfg)
    assert model.count_parameters() > 0


def test_save_load_roundtrip(tmp_path):
    cfg = tiny_config(architecture="fourier")
    model = PINNModel(cfg, seed=1)
    x = jnp.ones((3, 2))
    y0 = model(x)
    path = tmp_path / "model.msgpack"
    model.save_state(str(path))
    model2 = PINNModel(cfg, seed=2)
    assert not np.allclose(model2(x), y0)
    model2.load_state(str(path))
    np.testing.assert_allclose(model2(x), y0, rtol=1e-6)


def test_different_seeds_differ():
    cfg = tiny_config(architecture="feedforward")
    m1, m2 = PINNModel(cfg, seed=0), PINNModel(cfg, seed=1)
    x = jnp.ones((3, 2))
    assert not np.allclose(m1(x), m2(x))


def test_autoencoder_encode_decode():
    cfg = tiny_config(architecture="autoencoder")
    model = PINNModel(cfg)
    x = jnp.ones((4, 2))
    variables = {"params": model.params, **model.constants}
    z = model.module.apply(variables, x, method="encode")
    assert z.shape == (4, cfg.model.arch_params["latent_dim"])
    y = model.module.apply(variables, z, method="decode")
    assert y.shape == (4, cfg.model.output_dim)


def test_fourier_constants_not_trainable():
    cfg = tiny_config(architecture="fourier")
    model = PINNModel(cfg)
    assert "constants" in model.constants
    # B matrix must not be part of the optimized params pytree.
    leaves = jax.tree_util.tree_leaves(model.params)
    b = model.constants["constants"]["FourierFeatures_0"]["B"]
    assert all(leaf.shape != b.shape or leaf is not b for leaf in leaves)


def test_fourier_modified_mlp_forward_and_grads():
    """Modified-MLP trunk (Wang et al. 2021): forward shape, finiteness,
    nonzero gradient flow, and the uniform-width requirement."""
    import jax
    import jax.numpy as jnp
    import pytest

    from pinnrl_tpu.config import load_config

    cfg = load_config(pde_type="heat", architecture="fourier")
    cfg.model.hidden_dims = [32, 32, 32]
    cfg.model.arch_params.update(mapping_size=8, modified=True)
    model = PINNModel(cfg, seed=0)
    z = jnp.linspace(0, 1, 20).reshape(10, 2)
    out = model.apply(model.params, z)
    assert out.shape == (10, 1) and bool(jnp.isfinite(out).all())
    g = jax.grad(lambda p: jnp.sum(model.apply(p, z) ** 2))(model.params)
    norm = sum(float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(g))
    assert norm > 0

    cfg.model.hidden_dims = [32, 16]
    with pytest.raises(ValueError, match="uniform"):
        PINNModel(cfg, seed=0)


def test_fourier_feature_seed_pins_basis():
    """arch_params.feature_seed pins the random-feature basis across model
    seeds (the basis is an architecture hyperparameter, not a trainable)."""
    import jax.numpy as jnp
    import numpy as np

    from pinnrl_tpu.config import load_config

    def basis(model_seed, feature_seed):
        cfg = load_config(pde_type="heat", architecture="fourier")
        cfg.model.hidden_dims = [8, 8]
        cfg.model.arch_params.update(mapping_size=4, feature_seed=feature_seed)
        m = PINNModel(cfg, seed=model_seed)
        return np.asarray(m.constants["constants"]["FourierFeatures_0"]["B"])

    b0 = basis(0, 7)
    b1 = basis(1, 7)
    np.testing.assert_array_equal(b0, b1)  # same basis across model seeds
    b2 = basis(0, 8)
    assert not np.array_equal(b0, b2)  # different feature seed -> new basis


def test_moving_frame_is_input_shift():
    """arch_params.moving_frame_speed=c must equal the plain model evaluated
    at the shifted coordinate (x - c t, t): a pure, invertible input-space
    preconditioning, so parameters/init are unchanged."""
    from pinnrl_tpu.config import load_config

    def build(speed):
        cfg = load_config(pde_type="kdv", architecture="fourier")
        cfg.model.hidden_dims = [16, 16]
        cfg.model.arch_params.update(mapping_size=8, feature_seed=0)
        if speed is not None:
            cfg.model.arch_params["moving_frame_speed"] = speed
        return PINNModel(cfg, seed=0)

    plain, framed = build(None), build(1.5)
    chex_tree_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: jnp.array_equal(a, b), plain.params, framed.params
        )
    )
    assert chex_tree_equal  # preconditioning does not touch parameters

    xt = jnp.array([[0.3, 0.7], [-1.2, 2.0], [4.0, 0.0]], jnp.float32)
    shifted = xt.at[:, 0].add(-1.5 * xt[:, 1])
    np.testing.assert_allclose(
        np.asarray(framed.apply(framed.params, xt)),
        np.asarray(plain.apply(plain.params, shifted)),
        rtol=1e-6,
    )


def test_output_transform_hard_ic():
    """model.output_transform composes in physical coordinates after the
    network; the hard-IC form u0(x) + tanh(t)*net satisfies the IC exactly
    at t=0 regardless of parameters."""
    from pinnrl_tpu.config import load_config

    cfg = load_config(pde_type="kdv", architecture="fourier")
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params.update(mapping_size=8)
    m = PINNModel(cfg, seed=0)

    u0 = lambda xs: 0.5 / jnp.cosh(0.5 * xs) ** 2
    m.output_transform = lambda z, out: u0(z[..., 0:1]) + jnp.tanh(z[..., -1:]) * out

    x = jnp.linspace(-10.0, 10.0, 7).reshape(-1, 1)
    z0 = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
    np.testing.assert_allclose(
        np.asarray(m.apply(m.params, z0)), np.asarray(u0(x)), atol=1e-7
    )  # exact IC at t=0

    z1 = jnp.concatenate([x, jnp.full_like(x, 2.0)], axis=-1)
    m_plain = PINNModel(cfg, seed=0)
    raw = m_plain.apply(m_plain.params, z1)
    np.testing.assert_allclose(
        np.asarray(m.apply(m.params, z1)),
        np.asarray(u0(x) + jnp.tanh(2.0) * raw),
        rtol=1e-6,
    )  # transform composes after the (unchanged-params) network


def test_fourier_trainable_features():
    """arch_params.trainable_features=True moves B into the optimized params
    pytree: it receives gradients and varies with the model init seed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pinnrl_tpu.config import load_config

    def build(seed):
        cfg = load_config(pde_type="kdv", architecture="fourier")
        cfg.model.hidden_dims = [16, 16]
        cfg.model.arch_params.update(mapping_size=8, trainable_features=True)
        return PINNModel(cfg, seed=seed)

    m = build(0)
    assert "B" in m.params["FourierFeatures_0"]
    assert "constants" not in m.constants or "FourierFeatures_0" not in m.constants.get(
        "constants", {}
    )
    z = jnp.linspace(0.0, 1.0, 8).reshape(4, 2)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, z) ** 2))(m.params)
    assert float(jnp.linalg.norm(g["FourierFeatures_0"]["B"])) > 0
    # Per-seed basis diversity (the deep-ensemble decorrelation hook).
    assert not np.allclose(
        np.asarray(m.params["FourierFeatures_0"]["B"]),
        np.asarray(build(1).params["FourierFeatures_0"]["B"]),
    )


def test_fourier_anisotropic_scale():
    """arch_params.scale accepts a per-input-dim spec (list or "a:b" string);
    a zero entry makes the network exactly independent of that coordinate."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from pinnrl_tpu.config import load_config
    from pinnrl_tpu.models import _parse_scale
    from pinnrl_tpu.models.fourier import FourierNetwork

    assert _parse_scale("0:1.5") == (0.0, 1.5)
    assert _parse_scale("2.5") == 2.5
    assert _parse_scale([1, 2]) == (1.0, 2.0)

    cfg = load_config(pde_type="pendulum", architecture="fourier")
    cfg.model.hidden_dims = [16, 16]
    cfg.model.arch_params.update(mapping_size=8, scale="0:1.0")
    m = PINNModel(cfg, seed=0)
    t = jnp.full((3, 1), 0.4)
    x_a = jnp.array([[0.1], [1.7], [3.0]])
    out = m.apply(m.params, jnp.concatenate([x_a, t], axis=-1))
    np.testing.assert_allclose(
        np.asarray(out), np.full_like(np.asarray(out), float(out[0, 0])), atol=1e-6
    )  # identical output at every x: the basis has no x frequencies

    with pytest.raises(ValueError, match="anisotropic"):
        bad = FourierNetwork(
            input_dim=2, output_dim=1, hidden_dims=(8,), mapping_size=4,
            scale=(1.0, 1.0, 1.0),
        )
        bad.init(jax.random.PRNGKey(0), jnp.zeros((2, 2)))
