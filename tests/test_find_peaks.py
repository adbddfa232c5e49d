"""find_peaks / peak_prominences / peak_widths — scipy.signal oracle.
New relative to the reference (which has only argrel*; SURVEY.md §2.7).
Base indices and detected positions must match scipy EXACTLY (integer
semantics); float properties at 1e-4."""

import numpy as np
import pytest
import scipy.signal as sps

import jax

from nx_signal_tpu.ops.find_peaks import find_peaks, peak_prominences, peak_widths


def unpack(res):
    k = int(res.valid_count)
    return (
        np.asarray(res.indices)[:k],
        {key: np.asarray(v)[:k] for key, v in res.properties.items()},
    )


def assert_matches_scipy(x, **kw):
    p_ref, props_ref = sps.find_peaks(x, **kw)
    p_got, props_got = unpack(find_peaks(x, **kw))
    np.testing.assert_array_equal(p_got, p_ref)
    for k_, v_ref in props_ref.items():
        np.testing.assert_allclose(props_got[k_], v_ref, atol=1e-4,
                                   err_msg=f"property {k_}")


class TestDetection:
    def test_simple(self):
        x = np.array([0, 1, 0, 2, 0, 3, 0], dtype=np.float32)
        p, _ = unpack(find_peaks(x))
        np.testing.assert_array_equal(p, [1, 3, 5])

    def test_plateaus_midpoint(self):
        # plateau peaks resolve to the midpoint, like scipy
        x = np.array([0, 1, 1, 1, 0, 2, 2, 0, 5, 0], dtype=np.float32)
        assert_matches_scipy(x)

    def test_edges_never_peaks(self):
        x = np.array([3, 1, 2, 1, 3], dtype=np.float32)
        p, _ = unpack(find_peaks(x))
        np.testing.assert_array_equal(p, [2])

    def test_monotone_no_peaks(self):
        res = find_peaks(np.arange(10.0, dtype=np.float32))
        assert int(res.valid_count) == 0
        assert np.all(np.asarray(res.indices) == -1)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_parity(self, seed):
        x = np.random.default_rng(seed).normal(size=257).astype(np.float32)
        assert_matches_scipy(x)

    def test_tied_plateau_parity(self):
        x = np.round(np.random.default_rng(5).normal(size=300) * 2).astype(np.float32)
        assert_matches_scipy(x)

    def test_fixed_shape_and_padding(self):
        x = np.array([0, 1, 0, 2, 0], dtype=np.float32)
        res = find_peaks(x, max_peaks=4)
        assert res.indices.shape == (4,)
        assert int(res.valid_count) == 2
        np.testing.assert_array_equal(np.asarray(res.indices), [1, 3, -1, -1])

    def test_jit(self):
        x = np.random.default_rng(0).normal(size=128).astype(np.float32)
        res = jax.jit(lambda s: find_peaks(s, height=0.5))(x)
        p_ref, _ = sps.find_peaks(x, height=0.5)
        np.testing.assert_array_equal(
            np.asarray(res.indices)[: int(res.valid_count)], p_ref
        )


class TestConditions:
    X = np.random.default_rng(11).normal(size=400).astype(np.float32)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(height=0.5),
            dict(height=(0.2, 1.5)),
            dict(height=(None, 1.0)),
            dict(threshold=0.1),
            dict(threshold=(0.05, 2.0)),
            dict(distance=5),
            dict(distance=12.5),
            dict(prominence=0.5),
            dict(prominence=(0.3, 2.0)),
            dict(width=2.0),
            dict(width=(1.0, 6.0), rel_height=0.7),
            dict(prominence=0.4, wlen=21),
            dict(plateau_size=1),
            dict(height=0.3, distance=4, prominence=0.4, width=1.5),
        ],
        ids=lambda kw: "+".join(kw),
    )
    def test_condition_parity(self, kw):
        assert_matches_scipy(self.X, **kw)

    def test_height_array(self):
        h = np.linspace(0.0, 1.0, self.X.size)
        assert_matches_scipy(self.X, height=h)

    def test_plateau_size_on_plateaus(self):
        x = np.array([0, 1, 1, 0, 2, 2, 2, 0, 3, 0], dtype=np.float32)
        assert_matches_scipy(x, plateau_size=(2, None))

    def test_validation(self):
        with pytest.raises(ValueError, match="distance"):
            find_peaks(self.X, distance=0.5)
        with pytest.raises(ValueError, match="1-D"):
            find_peaks(np.zeros((3, 3)))
        with pytest.raises(ValueError, match="same length"):
            find_peaks(self.X, height=np.zeros(3))


class TestProminences:
    @pytest.mark.parametrize("seed", [0, 4, 9])
    def test_parity_exact_bases(self, seed):
        x = np.random.default_rng(seed).normal(size=300).astype(np.float32)
        peaks, _ = sps.find_peaks(x)
        prom_ref, lb_ref, rb_ref = sps.peak_prominences(x, peaks)
        prom, lb, rb = peak_prominences(x, peaks)
        np.testing.assert_allclose(np.asarray(prom), prom_ref, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(lb), lb_ref)
        np.testing.assert_array_equal(np.asarray(rb), rb_ref)

    def test_ties_and_plateaus(self):
        x = np.round(np.random.default_rng(2).normal(size=300) * 2).astype(np.float32)
        peaks, _ = sps.find_peaks(x)
        prom_ref, lb_ref, rb_ref = sps.peak_prominences(x, peaks)
        prom, lb, rb = peak_prominences(x, peaks)
        np.testing.assert_allclose(np.asarray(prom), prom_ref, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(lb), lb_ref)
        np.testing.assert_array_equal(np.asarray(rb), rb_ref)

    def test_wlen(self):
        x = np.random.default_rng(3).normal(size=300).astype(np.float32)
        peaks, _ = sps.find_peaks(x)
        for wlen in (11, 20, 51):  # even wlen rounds up to odd, like scipy
            prom_ref, lb_ref, rb_ref = sps.peak_prominences(x, peaks, wlen=wlen)
            prom, lb, rb = peak_prominences(x, peaks, wlen=wlen)
            np.testing.assert_allclose(np.asarray(prom), prom_ref, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(lb), lb_ref)
            np.testing.assert_array_equal(np.asarray(rb), rb_ref)

    def test_padded_rows(self):
        x = np.array([0, 2, 0, 3, 0], dtype=np.float32)
        prom, lb, rb = peak_prominences(x, np.array([1, 3, -1]))
        assert np.asarray(prom)[2] == 0.0
        assert np.asarray(lb)[2] == -1 and np.asarray(rb)[2] == -1


class TestWidths:
    @pytest.mark.parametrize("rel_height", [0.5, 0.3, 0.9, 1.0])
    def test_parity(self, rel_height):
        x = np.random.default_rng(6).normal(size=300).astype(np.float32)
        peaks, _ = sps.find_peaks(x)
        ref = sps.peak_widths(x, peaks, rel_height=rel_height)
        got = peak_widths(x, peaks, rel_height=rel_height)
        for g, r, nm in zip(got, ref, ["widths", "heights", "lips", "rips"]):
            np.testing.assert_allclose(np.asarray(g), r, atol=1e-4,
                                       err_msg=nm)

    def test_gauss_fwhm(self):
        # full width at half prominence of a Gaussian ~ 2.355 sigma
        t = np.arange(-200, 201, dtype=np.float32)
        sigma = 20.0
        x = np.exp(-(t / sigma) ** 2 / 2).astype(np.float32)
        w, _, _, _ = peak_widths(x, np.array([200]), rel_height=0.5)
        assert abs(float(np.asarray(w)[0]) - 2.3548 * sigma) < 0.1

    def test_validation(self):
        with pytest.raises(ValueError, match="rel_height"):
            peak_widths(np.zeros(10, np.float32), np.array([5]), rel_height=-1.0)
