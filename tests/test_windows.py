"""Window tests: scipy.signal.windows is the oracle (reference pins f32
doctest values; we compare against scipy at the reference's tolerances)."""

import numpy as np
import pytest
import scipy.signal.windows as sw

from nx_signal_tpu.ops import windows
from tests.conftest import assert_all_close

SIZES = [1, 2, 3, 4, 5, 8, 16, 17, 64, 512]


@pytest.mark.parametrize("n", SIZES)
def test_rectangular(n):
    w = windows.rectangular(n)
    assert w.shape == (n,)
    np.testing.assert_array_equal(np.asarray(w), np.ones(n))


@pytest.mark.parametrize("n", SIZES)
def test_bartlett_periodic(n):
    # The reference bartlett is the periodic triangular window: equal to the
    # symmetric scipy bartlett of length n+1 with the last sample dropped.
    w = windows.bartlett(n)
    assert_all_close(w, sw.bartlett(n + 1)[:n], atol=1e-6)


@pytest.mark.parametrize("n", SIZES)
def test_triangular(n):
    assert_all_close(windows.triangular(n), sw.triang(n), atol=1e-6)


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("name,scipy_fn", [
    ("blackman", sw.blackman),
    ("hamming", sw.hamming),
    ("hann", sw.hann),
])
def test_cosine_windows(n, periodic, name, scipy_fn):
    w = getattr(windows, name)(n, periodic=periodic)
    expected = scipy_fn(n, sym=not periodic)
    assert w.dtype == np.float32
    assert_all_close(w, expected, atol=1e-6)


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("beta", [0.5, 6.0, 12.0, 14.0])
def test_kaiser(n, periodic, beta):
    w = windows.kaiser(n, beta=beta, periodic=periodic)
    expected = sw.kaiser(n, beta, sym=not periodic)
    assert_all_close(w, expected, atol=1e-5)


def test_kaiser_reference_eps_parity():
    # Reference doctest value with its eps floor (windows.ex:322-326).
    w = windows.kaiser(4, beta=12.0, periodic=True, eps=1e-7)
    assert_all_close(w, [5.277619e-5, 0.21566667, 1.0, 0.21566667], atol=1e-3)


EXTENDED = [
    ("blackmanharris", (), sw.blackmanharris, ()),
    ("nuttall", (), sw.nuttall, ()),
    ("flattop", (), sw.flattop, ()),
    ("bohman", (), sw.bohman, ()),
    ("cosine", (), sw.cosine, ()),
    ("barthann", (), sw.barthann, ()),
    ("parzen", (), sw.parzen, ()),
    ("lanczos", (), sw.lanczos, ()),
    ("gaussian", (2.5,), sw.gaussian, (2.5,)),
    ("general_gaussian", (1.5, 3.0), sw.general_gaussian, (1.5, 3.0)),
    ("general_hamming", (0.7,), sw.general_hamming, (0.7,)),
    ("general_cosine", ([0.4, 0.5, 0.1],), sw.general_cosine, ([0.4, 0.5, 0.1],)),
    ("tukey", (0.4,), sw.tukey, (0.4,)),
    ("exponential", (None, 3.0), sw.exponential, (None, 3.0)),
    ("taylor", (4, 30.0), sw.taylor, (4, 30.0)),
    ("chebwin", (80.0,), sw.chebwin, (80.0,)),
]


@pytest.mark.parametrize("n", [2, 3, 8, 16, 17, 64, 512])
@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("name,args,scipy_fn,scipy_args", EXTENDED,
                         ids=[e[0] for e in EXTENDED])
def test_extended_windows(n, periodic, name, args, scipy_fn, scipy_args):
    w = getattr(windows, name)(n, *args, periodic=periodic)
    expected = scipy_fn(n, *scipy_args, sym=not periodic)
    assert w.dtype == np.float32
    assert_all_close(w, expected, atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("n,nw,k", [(16, 2.5, 3), (65, 4.0, 5), (128, 3.0, 1)])
def test_dpss(n, nw, k):
    got = windows.dpss(n, nw, k)
    expected = sw.dpss(n, nw, k, norm=2)
    assert got.shape == (k, n)
    assert_all_close(got, expected, atol=1e-6)
    # n_windows=None returns the first sequence alone
    assert_all_close(windows.dpss(n, nw), expected[0], atol=1e-6)


def test_exponential_center_rules():
    with pytest.raises(ValueError, match="center must be None"):
        windows.exponential(8, center=2.0, periodic=False)
    assert_all_close(windows.exponential(8, center=2.0, tau=1.5),
                     sw.exponential(8, 2.0, 1.5, sym=False), atol=1e-6)


def test_get_window_extended_dispatch():
    assert_all_close(windows.get_window("flattop", 32),
                     sw.flattop(32, sym=True), atol=1e-6)
    assert_all_close(windows.get_window(("gaussian", 4.0), 32),
                     sw.gaussian(32, 4.0, sym=True), atol=1e-6)
    assert_all_close(windows.get_window(("tukey", 0.25), 32, periodic=True),
                     sw.tukey(32, 0.25, sym=False), atol=1e-6)
    assert_all_close(windows.get_window(("chebwin", 60.0), 33),
                     sw.chebwin(33, 60.0, sym=True), atol=1e-6)
    assert_all_close(windows.get_window(("dpss", 3.0), 33),
                     sw.dpss(33, 3.0, norm=2), atol=1e-6)


def test_get_window_dispatch():
    assert_all_close(windows.get_window("hann", 8), sw.hann(8, sym=True), atol=1e-6)
    assert_all_close(
        windows.get_window(("kaiser", 8.6), 9), sw.kaiser(9, 8.6, sym=True), atol=1e-5
    )
    w = windows.get_window("rectangular", 4, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(w), np.ones(4, np.float32))
    with pytest.raises(ValueError, match="unknown window"):
        windows.get_window("nope", 4)


class TestScipyNamedExtras:
    """boxcar / triang aliases and the Kaiser-Bessel derived window."""

    @pytest.mark.parametrize("n,beta", [(8, 8.0), (32, 5.0), (128, 12.0),
                                        (2, 1.0)])
    def test_kaiser_bessel_derived(self, n, beta):
        ref = sw.kaiser_bessel_derived(n, beta)
        got = np.asarray(windows.kaiser_bessel_derived(n, beta,
                                                       dtype=np.float64))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_kbd_validation(self):
        assert windows.kaiser_bessel_derived(0, 4.0).shape == (0,)
        with pytest.raises(ValueError):
            windows.kaiser_bessel_derived(7, 4.0)
        with pytest.raises(ValueError):
            windows.kaiser_bessel_derived(-2, 4.0)

    def test_aliases(self):
        np.testing.assert_allclose(np.asarray(windows.boxcar(5)),
                                   sw.boxcar(5))
        for n in (7, 8):
            np.testing.assert_allclose(
                np.asarray(windows.triang(n, dtype=np.float64)),
                sw.triang(n))
        g = np.asarray(windows.get_window(("kaiser_bessel_derived", 8.0), 16,
                                          dtype=np.float64))
        np.testing.assert_allclose(
            g, __import__("scipy.signal", fromlist=["get_window"]).get_window(("kaiser_bessel_derived", 8.0), 16,
                              fftbins=False), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(windows.get_window("boxcar", 6)), np.ones(6))
