"""Sharded Welch/CSD/coherence vs the single-device estimators (and scipy)
on the simulated 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from nx_signal_tpu.parallel.estimation import (
    sharded_coherence,
    sharded_csd,
    sharded_welch,
)
from nx_signal_tpu.parallel.mesh import make_dsp_mesh
from nx_signal_tpu.spectral import coherence, csd, welch

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)


def rel_close(a, b, tol=1e-6):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, atol=tol * max(scale, 1e-30), rtol=tol)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture(params=[(1, 8), (2, 4), (8, 1)], ids=lambda p: f"mesh{p}")
def mesh(request):
    return make_dsp_mesh(*request.param)


class TestShardedWelch:
    def test_vs_single_device(self, mesh, rng):
        c = mesh.shape["channel"]
        x = rng.normal(size=(2 * c, 16384)).astype(np.float32)
        f_s, p_s = sharded_welch(x, mesh=mesh, sampling_rate=100.0,
                                 segment_length=256)
        f, p = welch(x, sampling_rate=100.0, segment_length=256)
        np.testing.assert_array_equal(np.asarray(f_s), np.asarray(f))
        rel_close(p_s, p)

    def test_vs_scipy(self, rng):
        import scipy.signal as sps

        mesh = make_dsp_mesh(1, 8)
        x = rng.normal(size=(1, 16384)).astype(np.float32)
        _, p = sharded_welch(x, mesh=mesh, sampling_rate=10.0,
                             segment_length=512)
        _, pe = sps.welch(x[0].astype(np.float64), fs=10.0, nperseg=512)
        rel_close(np.asarray(p)[0], pe, tol=1e-4)

    def test_no_detrend_and_spectrum_scaling(self, mesh, rng):
        c = mesh.shape["channel"]
        x = rng.normal(size=(c, 8192)).astype(np.float32)
        _, p_s = sharded_welch(x, mesh=mesh, segment_length=256,
                               detrend=False, scaling="spectrum")
        _, p = welch(x, segment_length=256, detrend=False,
                     scaling="spectrum")
        rel_close(p_s, p)

    def test_linear_detrend(self, mesh, rng):
        c = mesh.shape["channel"]
        x = (rng.normal(size=(c, 8192)) +
             0.01 * np.arange(8192)).astype(np.float32)
        _, p_s = sharded_welch(x, mesh=mesh, segment_length=256,
                               detrend="linear")
        _, p = welch(x, segment_length=256, detrend="linear")
        # the ~80x trend amplitude amplifies matmul reduction-order ulps
        # (CPU GEMM order varies with batch extent — CLAUDE.md); gate at
        # the scipy tolerance instead of the bitwise-adjacent 1e-6
        rel_close(p_s, p, tol=1e-4)

    def test_median_average(self, rng):
        mesh = make_dsp_mesh(1, 8)
        x = rng.normal(size=(1, 16384)).astype(np.float32)
        _, p_s = sharded_welch(x, mesh=mesh, segment_length=512,
                               average="median")
        _, p = welch(x, segment_length=512, average="median")
        rel_close(p_s, p)

    def test_1d_input(self, rng):
        mesh = make_dsp_mesh(1, 8)
        x = rng.normal(size=8192).astype(np.float32)
        _, p_s = sharded_welch(x, mesh=mesh, segment_length=256)
        _, p = welch(x, segment_length=256)
        assert np.asarray(p_s).ndim == 1
        rel_close(p_s, p)


class TestShardedCSD:
    def test_vs_single_device(self, mesh, rng):
        c = mesh.shape["channel"]
        x = rng.normal(size=(c, 16384)).astype(np.float32)
        y = (0.5 * x + 0.2 * rng.normal(size=(c, 16384))).astype(np.float32)
        _, p_s = sharded_csd(x, y, mesh=mesh, segment_length=256)
        _, p = csd(x, y, segment_length=256)
        rel_close(np.real(np.asarray(p_s)), np.real(np.asarray(p)))
        rel_close(np.imag(np.asarray(p_s)), np.imag(np.asarray(p)), tol=1e-5)

    def test_complex_twosided(self, rng):
        mesh = make_dsp_mesh(1, 8)
        x = (rng.normal(size=(1, 8192))
             + 1j * rng.normal(size=(1, 8192))).astype(np.complex64)
        _, p_s = sharded_csd(x, x, mesh=mesh, segment_length=256,
                             onesided=False)
        _, p = csd(x, x, segment_length=256, onesided=False)
        rel_close(np.real(np.asarray(p_s)), np.real(np.asarray(p)))

    def test_onesided_complex_raises(self, rng):
        mesh = make_dsp_mesh(1, 8)
        x = rng.normal(size=(1, 4096)).astype(np.complex64)
        with pytest.raises(ValueError, match="onesided"):
            sharded_csd(x, x, mesh=mesh, segment_length=256)


class TestShardedCoherence:
    def test_vs_single_device(self, rng):
        mesh = make_dsp_mesh(2, 4)
        x = rng.normal(size=(2, 16384)).astype(np.float32)
        y = (x + 0.5 * rng.normal(size=(2, 16384))).astype(np.float32)
        _, c_s = sharded_coherence(x, y, mesh=mesh, segment_length=256)
        _, c = coherence(x, y, segment_length=256)
        rel_close(c_s, c, tol=1e-4)
        c_s = np.asarray(c_s)
        assert np.all(c_s >= 0.0) and np.all(c_s <= 1.0 + 1e-5)
