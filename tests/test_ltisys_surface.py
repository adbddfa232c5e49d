"""scipy-oracle tests for the round-2 surface additions: LTI systems,
partial fractions, discretization, COLA/NOLA checks, order-statistic
filters, gammatone, MLS, envelope, hilbert2, deconvolve/correlation_lags."""

import numpy as np
import pytest
import scipy.linalg as sl
import scipy.signal as sps

import nx_signal_tpu.ops.ltisys as lti
from nx_signal_tpu.ops.convolution import (
    choose_conv_method,
    correlation_lags,
    deconvolve,
)
from nx_signal_tpu.ops.filters import (
    gammatone,
    max_len_seq,
    medfilt,
    medfilt2d,
    order_filter,
)
from nx_signal_tpu.ops.transforms import envelope, hilbert2
from nx_signal_tpu.spectral.stft import check_cola, check_nola

# tf<->ss conversion cycles legitimately produce near-zero leading
# numerator coefficients; both scipy's internals and ours warn
# BadCoefficients there — expected, keep the suite warning-free
pytestmark = pytest.mark.filterwarnings(
    "ignore:Badly conditioned filter coefficients")


class TestExpm:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_scipy(self, seed):
        m = np.random.default_rng(seed).normal(size=(6, 6))
        np.testing.assert_allclose(lti._expm(m), sl.expm(m),
                                   rtol=1e-10, atol=1e-12)

    def test_large_norm_scaling(self):
        m = np.random.default_rng(3).normal(size=(4, 4)) * 50.0
        np.testing.assert_allclose(lti._expm(m), sl.expm(m), rtol=1e-8)


class TestTfSs:
    def test_normalize(self):
        # both sides warn BadCoefficients on the dropped leading zero
        with pytest.warns(lti.BadCoefficients):
            b, a = lti.normalize([0.0, 3.0, 6.0], [2.0, 4.0])
        with pytest.warns(sps.BadCoefficients):
            b2, a2 = sps.normalize([0.0, 3.0, 6.0], [2.0, 4.0])
        np.testing.assert_allclose(b, b2)
        np.testing.assert_allclose(a, a2)
        with pytest.raises(ValueError):
            lti.normalize([1.0], [0.0, 0.0])

    @pytest.mark.parametrize("ba", [
        ([1.0, 3.0, 3.0], [1.0, 2.0, 1.0]),
        ([1.0], [1.0, 2.0, 1.0]),
        ([2.0, 1.0], [1.0, 0.5]),
    ])
    def test_tf2ss_ss2tf_roundtrip(self, ba):
        num, den = ba
        got = lti.tf2ss(num, den)
        want = sps.tf2ss(num, den)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-12)
        n1, d1 = lti.ss2tf(*got)
        n2, d2 = sps.ss2tf(*want)
        np.testing.assert_allclose(n1, n2, atol=1e-12)
        np.testing.assert_allclose(d1, d2, atol=1e-12)

    def test_zpk_ss(self):
        z, p, k = sps.butter(4, 0.3, output="zpk")
        for g, w in zip(lti.zpk2ss(z, p, k), sps.zpk2ss(z, p, k)):
            np.testing.assert_allclose(g, w, atol=1e-12)
        z1, p1, k1 = lti.ss2zpk(*lti.zpk2ss(z, p, k))
        np.testing.assert_allclose(sorted(np.round(p1, 8)),
                                   sorted(np.round(p, 8)), atol=1e-6)

    def test_bilinear(self):
        for ba, fs in [(([1.0], [1.0, 1.0]), 10.0),
                       (([2.0, 1.0], [1.0, 2.0, 3.0]), 5.0)]:
            b1, a1 = lti.bilinear(*ba, fs=fs)
            b2, a2 = sps.bilinear(*ba, fs=fs)
            np.testing.assert_allclose(b1, b2, atol=1e-12)
            np.testing.assert_allclose(a1, a2, atol=1e-12)

    def test_abcd_normalize_infers_zeros(self):
        a, b, c, d = lti.abcd_normalize(a=[[1.0, 0.0], [0.0, 1.0]],
                                        b=[[1.0], [0.0]], c=[[1.0, 0.0]])
        assert d.shape == (1, 1) and d[0, 0] == 0.0
        with pytest.raises(ValueError):
            lti.abcd_normalize(a=[[1.0, 0.0], [0.0, 1.0]])


class TestCont2Discrete:
    SYS = sps.tf2ss([1.0, 1.0], [1.0, 3.0, 2.0])

    @pytest.mark.parametrize("method,alpha", [
        ("zoh", None), ("bilinear", None), ("euler", None),
        ("backward_diff", None), ("foh", None), ("impulse", None),
        ("gbt", 0.3),
    ])
    def test_ss_vs_scipy(self, method, alpha):
        got = lti.cont2discrete(self.SYS, 0.05, method=method, alpha=alpha)
        want = sps.cont2discrete(self.SYS, 0.05, method=method, alpha=alpha)
        for g, w in zip(got[:-1], want[:-1]):
            np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12)
        assert got[-1] == want[-1]

    def test_tf_and_zpk_forms(self):
        got = lti.cont2discrete(([1.0], [1.0, 2.0]), 0.1)
        want = sps.cont2discrete(([1.0], [1.0, 2.0]), 0.1)
        np.testing.assert_allclose(got[0], want[0], atol=1e-12)
        np.testing.assert_allclose(got[1], want[1], atol=1e-12)
        z, p, k, dt = lti.cont2discrete(([-1.0], [-2.0, -3.0], 4.0), 0.1)
        z2, p2, k2, dt2 = sps.cont2discrete(([-1.0], [-2.0, -3.0], 4.0), 0.1)
        np.testing.assert_allclose(sorted(p), sorted(p2), atol=1e-10)
        np.testing.assert_allclose(k, k2, atol=1e-10)

    def test_gbt_requires_alpha(self):
        with pytest.raises(ValueError):
            lti.cont2discrete(self.SYS, 0.1, method="gbt")


class TestPartialFractions:
    CASES = [
        ([1.0, 2.0], [1.0, 5.0, 6.0]),          # simple poles
        ([1.0], [1.0, 2.0, 1.0]),               # repeated pole
        ([5.0, 3.0, 1.0], [1.0, 6.0, 11.0, 6.0]),
        ([2.0, 3.0, 4.0, 5.0], [1.0, 3.0, 2.0]),  # improper (direct term)
    ]

    @staticmethod
    def _match(p1, r1, p2, r2):
        o1 = np.lexsort((np.asarray(p1).imag, np.asarray(p1).real))
        o2 = np.lexsort((np.asarray(p2).imag, np.asarray(p2).real))
        np.testing.assert_allclose(np.asarray(p1)[o1], np.asarray(p2)[o2],
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(r1)[o1], np.asarray(r2)[o2],
                                   atol=1e-8)

    @pytest.mark.parametrize("b,a", CASES)
    def test_residue_vs_scipy(self, b, a):
        r1, p1, k1 = lti.residue(b, a)
        r2, p2, k2 = sps.residue(b, a)
        self._match(p1, r1, p2, r2)
        k1 = np.atleast_1d(k1) if np.size(k1) else np.zeros(1)
        k2 = np.atleast_1d(k2) if np.size(k2) else np.zeros(1)
        np.testing.assert_allclose(k1, k2, atol=1e-10)

    @pytest.mark.parametrize("b,a", [
        ([1.0, -1.0], [1.0, -1.5, 0.5]),
        ([1.0], [1.0, -1.0, 0.25]),
        ([1.0, 2.0, 3.0, 4.0], [1.0, -0.5]),
    ])
    def test_residuez_vs_scipy(self, b, a):
        r1, p1, k1 = lti.residuez(b, a)
        r2, p2, k2 = sps.residuez(b, a)
        self._match(p1, r1, p2, r2)
        k1 = np.atleast_1d(k1) if np.size(k1) else np.zeros(1)
        k2 = np.atleast_1d(k2) if np.size(k2) else np.zeros(1)
        np.testing.assert_allclose(k1, k2, atol=1e-10)

    def test_invres_roundtrip(self):
        b, a = [1.0, 2.0], [1.0, 5.0, 6.0]
        r, p, k = lti.residue(b, a)
        b1, a1 = lti.invres(r, p, k)
        s = 0.7
        np.testing.assert_allclose(
            np.polyval(b1, s) / np.polyval(a1, s),
            np.polyval(b, s) / np.polyval(a, s), atol=1e-10)

    def test_invresz_vs_scipy(self):
        r, p, k = sps.residuez([1.0, -1.0], [1.0, -1.5, 0.5])
        b1, a1 = lti.invresz(r, p, k)
        b2, a2 = sps.invresz(r, p, k)
        np.testing.assert_allclose(b1, b2, atol=1e-10)
        np.testing.assert_allclose(a1, a2, atol=1e-10)

    def test_unique_roots(self):
        p = [1.0, 1.0005, 2.0, 2.0, 3.0]
        u1, m1 = lti.unique_roots(p, tol=1e-2, rtype="avg")
        u2, m2 = sps.unique_roots(p, tol=1e-2, rtype="avg")
        np.testing.assert_allclose(np.sort(u1), np.sort(u2))
        np.testing.assert_array_equal(np.sort(m1), np.sort(m2))


class TestColaNola:
    @pytest.mark.parametrize("win,nperseg,noverlap,", [
        ("hann", 120, 60), ("hann", 120, 80), ("boxcar", 64, 32),
        ("blackman", 128, 32), ("hann", 121, 11),
    ])
    def test_vs_scipy(self, win, nperseg, noverlap):
        w = sps.get_window(win, nperseg)
        assert check_cola(w, nperseg, noverlap) == \
            sps.check_COLA(w, nperseg, noverlap)
        assert check_nola(w, nperseg, noverlap) == \
            sps.check_NOLA(w, nperseg, noverlap)

    def test_validation(self):
        with pytest.raises(ValueError):
            check_cola(np.ones(8), 8, 8)
        with pytest.raises(ValueError):
            check_nola(np.ones(8), 8, -1)


class TestOrderStatFilters:
    def test_medfilt_1d_2d_3d(self):
        rng = np.random.default_rng(0)
        x1 = rng.normal(size=41)
        np.testing.assert_allclose(np.asarray(medfilt(x1, 5)),
                                   sps.medfilt(x1, 5))
        x2 = rng.normal(size=(12, 17))
        np.testing.assert_allclose(np.asarray(medfilt(x2, (3, 5))),
                                   sps.medfilt(x2, (3, 5)))
        x3 = rng.normal(size=(6, 7, 8))
        np.testing.assert_allclose(np.asarray(medfilt(x3, (3, 1, 3))),
                                   sps.medfilt(x3, (3, 1, 3)))

    def test_medfilt2d(self):
        x = np.random.default_rng(1).normal(size=(9, 11)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(medfilt2d(x, 3)),
                                   sps.medfilt2d(x, 3))

    def test_order_filter_ranks(self):
        x = np.random.default_rng(2).normal(size=(10, 12))
        dom = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        for r in (0, 2, 4):
            np.testing.assert_allclose(
                np.asarray(order_filter(x, dom, r)),
                sps.order_filter(x, dom, r))

    def test_validation(self):
        with pytest.raises(ValueError, match="odd"):
            medfilt(np.zeros(10), 4)
        with pytest.raises(ValueError, match="rank"):
            order_filter(np.zeros((4, 4)), np.ones((3, 3)), 99)


class TestGammatone:
    @pytest.mark.parametrize("freq,fs", [(440.0, 16000.0), (1000.0, 44100.0)])
    def test_fir_iir_vs_scipy(self, freq, fs):
        b1, a1 = gammatone(freq, "fir", fs=fs)
        b2, a2 = sps.gammatone(freq, "fir", fs=fs)
        np.testing.assert_allclose(np.asarray(b1), b2, atol=1e-12)
        b1, a1 = gammatone(freq, "iir", fs=fs)
        b2, a2 = sps.gammatone(freq, "iir", fs=fs)
        np.testing.assert_allclose(np.asarray(b1), b2, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(a1), a2, rtol=1e-10)

    def test_validation(self):
        with pytest.raises(ValueError):
            gammatone(9000.0, "fir", fs=16000.0)
        with pytest.raises(ValueError):
            gammatone(100.0, "nope", fs=16000.0)


class TestMaxLenSeq:
    @pytest.mark.parametrize("nbits", [2, 4, 8, 15])
    def test_default_vs_scipy(self, nbits):
        q1, st1 = max_len_seq(nbits)
        q2, st2 = sps.max_len_seq(nbits)
        np.testing.assert_array_equal(np.asarray(q1), q2)
        np.testing.assert_array_equal(st1, st2)

    def test_state_length_taps(self):
        q1, st1 = max_len_seq(6, state=[1, 0, 1, 1, 0, 1], length=100)
        q2, st2 = sps.max_len_seq(6, state=np.array([1, 0, 1, 1, 0, 1]),
                                  length=100)
        np.testing.assert_array_equal(np.asarray(q1), q2)
        np.testing.assert_array_equal(st1, st2)
        q1, _ = max_len_seq(5, taps=[4, 3, 2, 1], length=50)
        q2, _ = sps.max_len_seq(5, taps=[4, 3, 2, 1], length=50)
        np.testing.assert_array_equal(np.asarray(q1), q2)

    def test_validation(self):
        with pytest.raises(ValueError):
            max_len_seq(64)
        with pytest.raises(ValueError):
            max_len_seq(4, state=[0, 0, 0, 0])


class TestEnvelopeHilbert2:
    def test_envelope_real_configs(self):
        x = np.random.default_rng(0).normal(size=300)
        for kwargs in [dict(), dict(bp_in=(5, 60)), dict(bp_in=(-40, 40)),
                       dict(squared=True), dict(residual="all"),
                       dict(residual=None), dict(n_out=150),
                       dict(bp_in=(5, 60), n_out=100)]:
            bp = kwargs.pop("bp_in", (1, None))
            got = np.asarray(envelope(x, bp, **kwargs))
            want = np.asarray(sps.envelope(x, bp, **kwargs))
            np.testing.assert_allclose(got, want, atol=1e-10)

    def test_envelope_complex_and_axis(self):
        rng = np.random.default_rng(1)
        zc = rng.normal(size=200) + 1j * rng.normal(size=200)
        for kwargs in [dict(), dict(bp_in=(-30, 40)), dict(n_out=100)]:
            bp = kwargs.pop("bp_in", (1, None))
            np.testing.assert_allclose(
                np.asarray(envelope(zc, bp, **kwargs)),
                np.asarray(sps.envelope(zc, bp, **kwargs)), atol=1e-10)
        x2 = rng.normal(size=(4, 128))
        np.testing.assert_allclose(np.asarray(envelope(x2.T, axis=0)),
                                   sps.envelope(x2.T, axis=0), atol=1e-10)

    def test_hilbert2(self):
        rng = np.random.default_rng(2)
        for shape in [(8, 12), (5, 7), (6, 8)]:
            x = rng.normal(size=shape)
            np.testing.assert_allclose(np.asarray(hilbert2(x)),
                                       sps.hilbert2(x), atol=1e-10)
        x = rng.normal(size=(6, 9))
        np.testing.assert_allclose(np.asarray(hilbert2(x, n=(8, 12))),
                                   sps.hilbert2(x, N=(8, 12)), atol=1e-10)


class TestDeconvolveLags:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("l1,l2", [(10, 4), (4, 10), (7, 7), (8, 3)])
    def test_correlation_lags(self, mode, l1, l2):
        np.testing.assert_array_equal(correlation_lags(l1, l2, mode),
                                      sps.correlation_lags(l1, l2, mode))

    def test_deconvolve(self):
        sig = np.convolve([1.0, 2.0, 3.0], [2.0, -1.0, 0.5, 4.0])
        sig = sig + np.r_[0.1, np.zeros(5)]
        q1, r1 = deconvolve(sig, [1.0, 2.0, 3.0])
        q2, r2 = sps.deconvolve(sig, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(q1), q2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r1), r2, atol=1e-5)

    def test_choose_conv_method_contract(self):
        assert choose_conv_method(np.ones(10, np.int64),
                                  np.ones(3, np.int64)) == "direct"
        assert choose_conv_method(np.ones(100, np.float32),
                                  np.ones(5, np.float32)) == "direct"
        assert choose_conv_method(np.ones(100000, np.float32),
                                  np.ones(8192, np.float32)) == "fft"


class TestSimulation:
    SYSD = ([1.0, 0.5], [1.0, -0.8], 0.1)
    SYSC = ([1.0], [1.0, 2.0, 5.0])
    A = np.array([[0.5, 0.1], [0.0, 0.3]])
    B = np.array([[1.0], [0.5]])
    C = np.array([[1.0, -1.0]])
    D = np.array([[0.2]])

    def test_dlsim_tf_and_ss(self):
        u = np.sin(np.arange(50) * 0.3)
        t1, y1 = lti.dlsim(self.SYSD, u)
        t2, y2 = sps.dlsim(self.SYSD, u)
        np.testing.assert_allclose(t1, np.squeeze(t2), atol=1e-12)
        np.testing.assert_allclose(np.squeeze(y1), np.squeeze(y2), atol=1e-10)
        ss = (self.A, self.B, self.C, self.D, 0.05)
        t1, y1, x1 = lti.dlsim(ss, u, x0=[0.3, -0.2])
        t2, y2, x2 = sps.dlsim(ss, u, x0=[0.3, -0.2])
        np.testing.assert_allclose(y1, np.reshape(y2, y1.shape), atol=1e-10)
        np.testing.assert_allclose(x1, x2, atol=1e-10)

    def test_dimpulse_dstep(self):
        ss = (self.A, self.B, self.C, self.D, 0.05)
        t1, ys1 = lti.dimpulse(ss, n=40)
        t2, ys2 = sps.dimpulse(ss, n=40)
        np.testing.assert_allclose(ys1[0], np.reshape(ys2[0], ys1[0].shape),
                                   atol=1e-10)
        t1, ys1 = lti.dstep(self.SYSD, n=40)
        t2, ys2 = sps.dstep(self.SYSD, n=40)
        np.testing.assert_allclose(np.squeeze(ys1[0]), np.squeeze(ys2[0]),
                                   atol=1e-10)

    @pytest.mark.parametrize("interp", [True, False])
    def test_lsim(self, interp):
        t = np.linspace(0, 5, 101)
        u = np.sin(2 * np.pi * 0.7 * t)
        t1, y1, x1 = lti.lsim(self.SYSC, u, t, interp=interp)
        t2, y2, x2 = sps.lsim(self.SYSC, u, t, interp=interp)
        np.testing.assert_allclose(y1, y2, atol=1e-10)
        np.testing.assert_allclose(x1, x2, atol=1e-10)

    def test_lsim_validation(self):
        with pytest.raises(ValueError, match="equally spaced"):
            lti.lsim(self.SYSC, np.ones(3), np.array([0.0, 0.1, 0.5]))
        with pytest.raises(ValueError, match="Initial time"):
            lti.lsim(self.SYSC, np.ones(3), np.array([1.0, 1.1, 1.2]))

    def test_impulse_step_default_times(self):
        t1, y1 = lti.impulse(self.SYSC)
        t2, y2 = sps.impulse(self.SYSC)
        np.testing.assert_allclose(t1, t2, atol=1e-12)
        np.testing.assert_allclose(y1, y2, atol=1e-8)
        t1, y1 = lti.step(self.SYSC, n=120)
        t2, y2 = sps.step(self.SYSC, N=120)
        np.testing.assert_allclose(y1, y2, atol=1e-8)

    def test_freqresp_bode_findfreqs(self):
        w1, h1 = lti.freqresp(self.SYSC, n=200)
        w2, h2 = sps.freqresp(self.SYSC, n=200)
        np.testing.assert_allclose(w1, w2, atol=1e-12)
        np.testing.assert_allclose(h1, h2, atol=1e-12)
        np.testing.assert_allclose(
            lti.findfreqs([1.0], [1.0, 2.0, 5.0], 15),
            sps.findfreqs([1.0], [1.0, 2.0, 5.0], 15))
        w1, m1, p1 = lti.bode(self.SYSC, n=50)
        w2, m2, p2 = sps.bode(self.SYSC, n=50)
        np.testing.assert_allclose(m1, m2, atol=1e-10)
        np.testing.assert_allclose(p1, p2, atol=1e-10)

    def test_dfreqresp_dbode(self):
        w1, h1 = lti.dfreqresp(self.SYSD, n=128)
        w2, h2 = sps.dfreqresp(self.SYSD, n=128)
        np.testing.assert_allclose(h1, h2, atol=1e-12)
        w1, m1, p1 = lti.dbode(self.SYSD, n=64)
        w2, m2, p2 = sps.dbode(self.SYSD, n=64)
        np.testing.assert_allclose(w1, w2, atol=1e-10)
        np.testing.assert_allclose(m1, m2, atol=1e-10)


class TestLtiClasses:
    def test_lti_responses_vs_scipy(self):
        ours = lti.lti([1.0], [1.0, 2.0, 5.0])
        ref = sps.lti([1.0], [1.0, 2.0, 5.0])
        np.testing.assert_allclose(ours.impulse()[1], ref.impulse()[1],
                                   atol=1e-8)
        np.testing.assert_allclose(ours.step()[1], ref.step()[1], atol=1e-8)
        np.testing.assert_allclose(ours.bode(n=30)[1], ref.bode(n=30)[1],
                                   atol=1e-9)
        np.testing.assert_allclose(
            np.sort_complex(np.asarray(ours.poles, complex)),
            np.sort_complex(np.asarray(ref.poles, complex)), atol=1e-10)

    def test_lti_output_ss_form(self):
        a = np.array([[0.0, 1.0], [-5.0, -2.0]])
        b = np.array([[0.0], [1.0]])
        c = np.array([[1.0, 0.0]])
        d = np.array([[0.0]])
        t = np.linspace(0, 5, 101)
        u = np.sin(t)
        ours = lti.lti(a, b, c, d)
        _, y1, _ = ours.output(u, t)
        _, y2, _ = sps.lsim((a, b, c, d), u, t)
        np.testing.assert_allclose(y1, y2, atol=1e-9)

    def test_to_discrete_roundtrip(self):
        sd = lti.lti([1.0], [1.0, 2.0, 5.0]).to_discrete(0.05)
        sd2 = sps.lti([1.0], [1.0, 2.0, 5.0]).to_discrete(0.05)
        np.testing.assert_allclose(sd.to_tf()[0],
                                   np.atleast_1d(np.squeeze(sd2.num)),
                                   atol=1e-10)
        assert sd.dt == 0.05

    def test_dlti_vs_scipy(self):
        ours = lti.dlti([1.0, 0.5], [1.0, -0.8], dt=0.1)
        ref = sps.dlti([1.0, 0.5], [1.0, -0.8], dt=0.1)
        np.testing.assert_allclose(np.squeeze(ours.step(n=30)[1][0]),
                                   np.squeeze(ref.step(n=30)[1][0]),
                                   atol=1e-10)
        np.testing.assert_allclose(ours.freqresp(n=64)[1],
                                   ref.freqresp(n=64)[1], atol=1e-10)
        u = np.sin(np.arange(40) * 0.2)
        np.testing.assert_allclose(np.squeeze(ours.output(u)[1]),
                                   np.squeeze(ref.output(u, t=None)[1]),
                                   atol=1e-10)

    def test_validation(self):
        with pytest.raises(ValueError):
            lti.lti([1.0])
        with pytest.raises(ValueError):
            lti.dlti([1.0], [1.0], [1.0], [1.0], [1.0])


class TestRepresentationClasses:
    """scipy.signal TransferFunction/ZerosPolesGain/StateSpace parity."""

    def test_transfer_function_attrs(self):
        ours = lti.TransferFunction([1.0, 3.0], [1.0, 2.0, 1.0])
        ref = sps.TransferFunction([1.0, 3.0], [1.0, 2.0, 1.0])
        np.testing.assert_allclose(ours.num, ref.num)
        np.testing.assert_allclose(ours.den, ref.den)
        np.testing.assert_allclose(np.sort(ours.poles), np.sort(ref.poles))
        assert ours.dt is None and ref.dt is None

    def test_conversion_cycle(self):
        tf = lti.TransferFunction([2.0, 3.0], [1.0, 2.0, 10.0])
        zpk = tf.to_zpk()
        ss = zpk.to_ss()
        back = ss.to_tf()
        assert isinstance(zpk, lti.ZerosPolesGain)
        assert isinstance(ss, lti.StateSpace)
        assert isinstance(back, lti.TransferFunction)
        np.testing.assert_allclose(back.num, [2.0, 3.0], atol=1e-10)
        np.testing.assert_allclose(back.den, [1.0, 2.0, 10.0], atol=1e-10)
        sp = sps.TransferFunction([2.0, 3.0], [1.0, 2.0, 10.0]).to_zpk()
        np.testing.assert_allclose(np.sort_complex(zpk.poles),
                                   np.sort_complex(sp.poles), atol=1e-10)
        np.testing.assert_allclose(zpk.gain, sp.gain, atol=1e-12)

    def test_copy_constructor_and_ss_attrs(self):
        ss = lti.StateSpace(lti.TransferFunction([1.0, 3.0], [1.0, 2.0, 1.0]))
        ref = sps.StateSpace(sps.TransferFunction([1.0, 3.0], [1.0, 2.0, 1.0]))
        np.testing.assert_allclose(ss.A, ref.A)
        np.testing.assert_allclose(ss.B, ref.B)
        np.testing.assert_allclose(ss.C, ref.C)
        np.testing.assert_allclose(ss.D, ref.D)

    def test_continuous_responses(self):
        t = np.linspace(0.0, 5.0, 200)
        ours = lti.TransferFunction([1.0], [1.0, 0.5, 2.0])
        ref = sps.TransferFunction([1.0], [1.0, 0.5, 2.0])
        np.testing.assert_allclose(ours.step(t=t)[1], ref.step(T=t)[1],
                                   atol=1e-8)
        np.testing.assert_allclose(ours.impulse(t=t)[1], ref.impulse(T=t)[1],
                                   atol=1e-8)
        w, mag, phase = ours.bode(n=50)
        w2, mag2, phase2 = ref.bode(n=50)
        np.testing.assert_allclose(mag, mag2, atol=1e-8)

    def test_discrete_classes(self):
        ours = lti.TransferFunction([1.0], [1.0, -0.5], dt=0.1)
        ref = sps.TransferFunction([1.0], [1.0, -0.5], dt=0.1)
        np.testing.assert_allclose(np.squeeze(ours.step(n=12)[1]),
                                   np.squeeze(ref.step(n=12)[1]), atol=1e-12)
        zd = ours.to_zpk()
        assert zd.dt == 0.1
        np.testing.assert_allclose(zd.poles, [0.5], atol=1e-12)

    def test_to_discrete_returns_same_class(self):
        zc = lti.ZerosPolesGain([-1.0], [-2.0, -3.0], 4.0)
        zd = zc.to_discrete(0.02)
        ref = sps.ZerosPolesGain([-1.0], [-2.0, -3.0], 4.0).to_discrete(0.02)
        assert isinstance(zd, lti.ZerosPolesGain)
        np.testing.assert_allclose(np.sort_complex(zd.poles),
                                   np.sort_complex(ref.poles), atol=1e-10)
        np.testing.assert_allclose(zd.gain, ref.gain, atol=1e-10)

    def test_validation(self):
        with pytest.raises(ValueError):
            lti.TransferFunction([1.0])
        with pytest.raises(ValueError):
            lti.StateSpace([1.0], [1.0])
        with pytest.raises(ValueError):
            lti.TransferFunction([1.0], [1.0, 1.0], dt=0.1).to_discrete(0.1)


class TestPlacePoles:
    """Pole placement: the closed loop A - B K must carry the requested
    spectrum (scipy.signal.place_poles oracle on the eigenvalues — gain
    matrices are non-unique for MIMO, so parity is on the placed poles)."""

    A_MIMO = np.array([[1.380, -0.2077, 6.715, -5.676],
                       [-0.5814, -4.290, 0.0, 0.6750],
                       [1.067, 4.273, -6.654, 5.893],
                       [0.0480, 4.273, 1.343, -2.104]])
    B_MIMO = np.array([[0.0, 5.679], [1.136, 1.136], [0.0, 0.0],
                       [-3.146, 0.0]])

    def _assert_placed(self, A, B, poles, atol=1e-6):
        res = lti.place_poles(A, B, poles)
        want = np.sort_complex(np.asarray(poles, complex))
        got = np.sort_complex(np.linalg.eigvals(
            np.asarray(A, float) - np.asarray(B, float) @ res.gain_matrix))
        np.testing.assert_allclose(got, want, atol=atol)
        np.testing.assert_allclose(np.sort_complex(res.computed_poles),
                                   want, atol=atol)
        assert res.gain_matrix.shape == (np.atleast_2d(B).shape[1],
                                         np.atleast_2d(A).shape[0])
        assert np.isrealobj(res.gain_matrix)

    def test_mimo_real(self):
        self._assert_placed(self.A_MIMO, self.B_MIMO,
                            [-0.2, -0.5, -5.0566, -8.6659])

    def test_mimo_complex_pairs(self):
        self._assert_placed(self.A_MIMO, self.B_MIMO,
                            [-0.2 + 0.3j, -0.2 - 0.3j, -5.0, -8.0])

    def test_siso(self):
        rng = np.random.default_rng(7)
        a = rng.standard_normal((3, 3))
        b = rng.standard_normal((3, 1))
        self._assert_placed(a, b, [-1.0, -2.0, -3.0], atol=1e-8)
        self._assert_placed(a, b, [-1.0 + 1.0j, -1.0 - 1.0j, -3.0],
                            atol=1e-8)

    def test_matches_scipy_poles(self):
        poles = [-2.0, -3.0, -4.5, -6.0]
        ref = sps.place_poles(self.A_MIMO, self.B_MIMO, np.array(poles))
        res = lti.place_poles(self.A_MIMO, self.B_MIMO, np.array(poles))
        np.testing.assert_allclose(np.sort_complex(res.computed_poles),
                                   np.sort_complex(ref.computed_poles),
                                   atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            lti.place_poles(self.A_MIMO, self.B_MIMO, [-1.0, -2.0])
        with pytest.raises(ValueError):
            lti.place_poles(self.A_MIMO, self.B_MIMO,
                            [-1.0 + 1j, -2.0, -3.0, -4.0])
        with pytest.raises(ValueError):
            lti.place_poles(np.eye(2), np.zeros((2, 1)), [-1.0, -1.0 + 0j])
        with pytest.raises(ValueError):
            lti.place_poles(self.A_MIMO, self.B_MIMO,
                            [-1.0, -2.0, -3.0, -4.0], method="nope")


class TestColaAliasesAndStringWindows:
    def test_scipy_casing_aliases(self):
        import nx_signal_tpu as nst
        assert nst.check_COLA is check_cola
        assert nst.check_NOLA is check_nola

    @pytest.mark.parametrize("win,nperseg,noverlap", [
        ("hann", 256, 128), ("hann", 256, 192), ("hamming", 128, 64),
        ("blackman", 100, 50), (("kaiser", 8.0), 64, 32),
        ("boxcar", 64, 0),
    ])
    def test_string_window_parity(self, win, nperseg, noverlap):
        assert check_cola(win, nperseg, noverlap) == \
            sps.check_COLA(win, nperseg, noverlap)
        assert check_nola(win, nperseg, noverlap) == \
            sps.check_NOLA(win, nperseg, noverlap)
