"""Sampler property tests (analog of reference tests/unit_tests/test_pde_sampling.py
and test_rar_sampling.py): bounds, shapes, coverage, RAR concentration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.sampling import (
    sample_adaptive,
    sample_residual_based,
    sample_stratified,
    sample_uniform,
)

DOMAIN = [(-1.0, 1.0)]
TIME = (0.0, 2.0)


def _check_bounds(x, t, domain=DOMAIN, time=TIME):
    for d, (lo, hi) in enumerate(domain):
        assert float(x[:, d].min()) >= lo and float(x[:, d].max()) <= hi
    assert float(t.min()) >= time[0] and float(t.max()) <= time[1]


@pytest.mark.parametrize("n", [16, 100])
def test_uniform_shape_bounds(n):
    x, t = sample_uniform(jax.random.PRNGKey(0), n, DOMAIN, TIME)
    assert x.shape == (n, 1) and t.shape == (n, 1)
    _check_bounds(x, t)


def test_stratified_coverage():
    n = 64
    x, t = sample_stratified(jax.random.PRNGKey(0), n, DOMAIN, TIME)
    _check_bounds(x, t)
    # Latin hypercube: exactly one point per bin per dimension.
    bins = np.floor((np.asarray(x).ravel() + 1.0) / 2.0 * n).astype(int)
    bins = np.clip(bins, 0, n - 1)
    assert len(set(bins.tolist())) == n


def test_rar_concentrates_on_high_residual():
    # Residual is large only for x > 0.5 (25% of space). The shipped RAD
    # floor (c=4, benchmark_results/rar_sweep*.csv) keeps the bias
    # moderate: expected high-region mass = 0.25*8/(0.25*8 + 0.75*4) = 0.4
    # vs 0.25 under uniform — stronger bias measurably loses on the
    # Burgers-front harness in BOTH tested regimes.
    def residual_fn(x, t):
        return jnp.where(x > 0.5, 100.0, 0.001)

    x, t = sample_residual_based(
        jax.random.PRNGKey(0), 256, DOMAIN, TIME, residual_fn=residual_fn
    )
    frac_high = float(jnp.mean(x > 0.5))
    assert 0.30 < frac_high < 0.55
    _check_bounds(x, t)

    # The nominal Wu et al. c=1 concentrates harder.
    x, t = sample_residual_based(
        jax.random.PRNGKey(0), 256, DOMAIN, TIME,
        residual_fn=residual_fn, uniform_floor=1.0,
    )
    assert 0.45 < float(jnp.mean(x > 0.5)) < 0.95

    # uniform_floor=0 restores (nearly) pure residual-proportional draws;
    # without replacement the 4x pool caps the high-region supply at ~n.
    x, t = sample_residual_based(
        jax.random.PRNGKey(0), 256, DOMAIN, TIME,
        residual_fn=residual_fn, uniform_floor=0.0,
    )
    assert float(jnp.mean(x > 0.5)) > 0.85


def test_rar_chunked_pool_matches_unchunked():
    # Chunking the pool evaluation is a pure memory optimization: with the
    # same key the pool draw, residual values, and categorical pick are
    # identical, so the selected points must match exactly.
    def residual_fn(x, t):
        return jnp.sin(3.0 * x) * jnp.cos(t)

    kwargs = dict(residual_fn=residual_fn, pool_factor=4)
    x_a, t_a = sample_residual_based(
        jax.random.PRNGKey(3), 64, DOMAIN, TIME, chunk_size=32, **kwargs
    )
    x_b, t_b = sample_residual_based(
        jax.random.PRNGKey(3), 64, DOMAIN, TIME, chunk_size=1 << 20, **kwargs
    )
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b))
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b))


def test_rar_pool_rounds_up_to_whole_chunks():
    # n*pool_factor = 300 with chunk_size 128 -> pool padded to 384; output
    # shape and bounds are unaffected.
    def residual_fn(x, t):
        return x + t

    x, t = sample_residual_based(
        jax.random.PRNGKey(1), 75, DOMAIN, TIME,
        residual_fn=residual_fn, pool_factor=4, chunk_size=128,
    )
    assert x.shape == (75, 1) and t.shape == (75, 1)
    _check_bounds(x, t)


def test_rar_uniform_fallback():
    x, t = sample_residual_based(jax.random.PRNGKey(0), 64, DOMAIN, TIME, residual_fn=None)
    assert x.shape == (64, 1)
    _check_bounds(x, t)


def test_adaptive_with_mock_agent():
    # Mock score: high in the t < 0.5 strip.
    def score_fn(grid):
        return jnp.where(grid[:, -1] < 0.5, 10.0, 0.01)

    x, t = sample_adaptive(jax.random.PRNGKey(0), 256, DOMAIN, TIME, score_fn=score_fn)
    # Floored (see sample_residual_based): above the uniform 0.6 mass of
    # the strip, below full concentration.
    assert 0.62 < float(jnp.mean(t < 0.6)) < 0.97
    _check_bounds(x, t)


def test_adaptive_uniform_fallback():
    x, t = sample_adaptive(jax.random.PRNGKey(0), 32, DOMAIN, TIME, score_fn=None)
    assert x.shape == (32, 1)


def test_samplers_jittable():
    f = jax.jit(lambda k: sample_stratified(k, 32, DOMAIN, TIME))
    x, t = f(jax.random.PRNGKey(1))
    assert x.shape == (32, 1)


def test_2d_domain():
    dom2 = [(0.0, 1.0), (2.0, 3.0)]
    x, t = sample_uniform(jax.random.PRNGKey(0), 50, dom2, TIME)
    assert x.shape == (50, 2)
    _check_bounds(x, t, dom2)


def test_residual_based_zero_field_no_floor_falls_back_to_uniform():
    # uniform_floor=0 + an all-zero residual pool must NOT collapse every
    # draw onto pool index 0 (log(0) logits); it falls back to uniform.
    from pinnrl_tpu.sampling.strategies import sample_residual_based

    key = jax.random.PRNGKey(0)
    x, t = sample_residual_based(
        key, 64, [(0.0, 1.0)], (0.0, 1.0),
        residual_fn=lambda xx, tt: jnp.zeros((xx.shape[0], 1)),
        uniform_floor=0.0,
    )
    assert len(jnp.unique(x[:, 0])) > 8
