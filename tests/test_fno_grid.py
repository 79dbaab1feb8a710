"""Gridded 2D FNO (models/fno_grid.py) and the true-operator benchmark."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnrl_tpu.models.fno_grid import GridFNO2D, SpectralConv2d


def test_spectral_conv_shape_and_finite():
    m = SpectralConv2d(out_channels=4, modes_x=6, modes_y=6)
    x = jnp.ones((2, 16, 16, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_spectral_conv_truncates_high_modes():
    """Only the retained low modes pass: a pure high-frequency input maps
    to (numerically) zero output."""
    m = SpectralConv2d(out_channels=1, modes_x=3, modes_y=3)
    h = w = 32
    xs = jnp.arange(h)
    hi = jnp.cos(2 * jnp.pi * 10 * xs / h)  # mode 10 >> 3
    x = jnp.broadcast_to(hi[None, :, None, None], (1, h, w, 1))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert float(jnp.abs(y).max()) < 1e-4


def test_grid_fno_shapes():
    fno = GridFNO2D(in_channels=2, out_channels=3, width=8, modes=4, num_blocks=2)
    a = jnp.ones((5, 24, 24, 2))
    p = fno.init(jax.random.PRNGKey(0), a)
    u = fno.apply(p, a)
    assert u.shape == (5, 24, 24, 3)


def test_grid_fno_resolution_transfer():
    """Operator property: the same weights apply at a different grid
    resolution (mode truncation is resolution-independent)."""
    fno = GridFNO2D(width=8, modes=4, num_blocks=2)
    a32 = jnp.ones((1, 32, 32, 1))
    p = fno.init(jax.random.PRNGKey(0), a32)
    u64 = fno.apply(p, jnp.ones((1, 64, 64, 1)))
    assert u64.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(u64)).all()


@pytest.mark.slow
def test_gridded_operator_benchmark_learns():
    from pinnrl_tpu.benchmarks.operator import run_gridded_operator_benchmark

    out = run_gridded_operator_benchmark(
        epochs=100, width=16, modes=8, num_blocks=2
    )
    assert isinstance(out, list) and len(out) == 1
    r = out[0]
    assert r.architecture == "grid_fno2d"
    # Held-out trajectories (unseen input functions): must beat the
    # trivial identity baseline by a wide margin at 100 epochs.
    assert r.test_rel_l2 < 0.2
    assert np.isfinite(r.final_train_loss)


@pytest.mark.slow
def test_gridded_operator_transfer_rows():
    """--transfer returns [primary, transfer@res] rows; the spectral conv
    evaluates trained params zero-shot on finer grids (round-4 FNO bar)."""
    from pinnrl_tpu.benchmarks.operator import run_gridded_operator_benchmark

    out = run_gridded_operator_benchmark(
        epochs=100, width=16, modes=8, num_blocks=2,
        transfer_resolutions=(64,),
    )
    assert isinstance(out, list) and len(out) == 2
    primary, transfer = out
    assert "transfer64" in transfer.dataset
    assert np.isfinite(transfer.test_rel_l2)
    # Transfer error should stay the same order of magnitude as native-res.
    assert transfer.test_rel_l2 < max(10 * primary.test_rel_l2, 0.5)


def test_spectral_conv_dft_matches_fft_path():
    """The truncated-DFT-as-matmul path (round 5, default — FFT gradients
    are unimplemented on the axon TPU backend) must match the rfft2/irfft2
    path exactly: same params, same output, same parameter gradients."""
    h, w, c, o, m = 24, 20, 3, 5, 6
    dft = SpectralConv2d(out_channels=o, modes_x=m, modes_y=m)
    fft = SpectralConv2d(out_channels=o, modes_x=m, modes_y=m, use_fft=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, c))
    p = dft.init(jax.random.PRNGKey(1), x)
    y_dft = dft.apply(p, x)
    y_fft = fft.apply(p, x)
    np.testing.assert_allclose(
        np.asarray(y_dft), np.asarray(y_fft), rtol=1e-4, atol=1e-5
    )
    g_dft = jax.grad(lambda p: jnp.sum(dft.apply(p, x) ** 2))(p)
    g_fft = jax.grad(lambda p: jnp.sum(fft.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_dft),
                    jax.tree_util.tree_leaves(g_fft)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_spectral_conv_dft_odd_and_nyquist():
    """Odd W and modes reaching the Nyquist column exercise the one-sided
    doubling edge cases of the inverse DFT."""
    for h, w, m in ((16, 17, 5), (16, 16, 9)):  # odd W; my hits W//2+1
        dft = SpectralConv2d(out_channels=2, modes_x=m, modes_y=m)
        fft = SpectralConv2d(out_channels=2, modes_x=m, modes_y=m, use_fft=True)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 2))
        p = dft.init(jax.random.PRNGKey(3), x)
        np.testing.assert_allclose(
            np.asarray(dft.apply(p, x)), np.asarray(fft.apply(p, x)),
            rtol=1e-4, atol=1e-5,
        )
