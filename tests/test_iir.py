"""IIR design + application tests: scipy.signal is the oracle (the same
contract the reference pins firwin to, test/nx_signal/filters_test.exs:246).
The reference has no IIR at all (SURVEY.md §2.5) — this surface is
greenfield; gates are tighter than the 1e-4 default because design math is
host-side f64."""

import numpy as np
import pytest
import scipy.signal as sps

import jax
import jax.numpy as jnp

from nx_signal_tpu.ops.iir import (
    filtfilt,
    lfilter,
    lfilter_zi,
    sosfilt,
    sosfilt_zi,
    sosfiltfilt,
)
from nx_signal_tpu.ops.iir_design import (
    bessel,
    besselap,
    bilinear_zpk,
    buttap,
    butter,
    cheb1ap,
    cheb2ap,
    cheby1,
    cheby2,
    ellip,
    ellipap,
    iirfilter,
    iirnotch,
    iirpeak,
    sos2tf,
    tf2sos,
    tf2zpk,
    zpk2sos,
    zpk2tf,
)
from tests.conftest import assert_all_close


def sorted_c(x):
    return np.sort_complex(np.asarray(x, dtype=complex))


class TestPrototypes:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
    def test_buttap(self, n):
        z1, p1, k1 = buttap(n)
        z2, p2, k2 = sps.buttap(n)
        assert_all_close(sorted_c(p1), sorted_c(p2), atol=1e-12, rtol=1e-12)
        assert k1 == pytest.approx(k2)

    @pytest.mark.parametrize("n,rp", [(1, 0.5), (4, 1.0), (5, 3.0), (8, 0.1)])
    def test_cheb1ap(self, n, rp):
        z1, p1, k1 = cheb1ap(n, rp)
        z2, p2, k2 = sps.cheb1ap(n, rp)
        assert_all_close(sorted_c(p1), sorted_c(p2), atol=1e-12, rtol=1e-12)
        assert k1 == pytest.approx(k2, rel=1e-12)

    @pytest.mark.parametrize("n,rs", [(2, 20.0), (5, 40.0), (6, 60.0), (9, 80.0)])
    def test_cheb2ap(self, n, rs):
        z1, p1, k1 = cheb2ap(n, rs)
        z2, p2, k2 = sps.cheb2ap(n, rs)
        assert_all_close(sorted_c(p1), sorted_c(p2), atol=1e-12, rtol=1e-12)
        assert_all_close(sorted_c(z1), sorted_c(z2), atol=1e-12, rtol=1e-12)
        assert k1 == pytest.approx(k2, rel=1e-12)

    @pytest.mark.parametrize("n", [1, 2, 4, 6, 10])
    def test_besselap(self, n):
        z1, p1, k1 = besselap(n)
        z2, p2, k2 = sps.besselap(n)
        assert_all_close(sorted_c(p1), sorted_c(p2), atol=1e-9, rtol=1e-9)
        assert k1 == pytest.approx(k2, rel=1e-9)

    @pytest.mark.parametrize(
        "n,rp,rs", [(2, 1.0, 30.0), (5, 1.0, 40.0), (6, 0.5, 60.0), (7, 3.0, 50.0)]
    )
    def test_ellipap(self, n, rp, rs):
        z1, p1, k1 = ellipap(n, rp, rs)
        z2, p2, k2 = sps.ellipap(n, rp, rs)
        assert_all_close(sorted_c(p1), sorted_c(p2), atol=1e-9, rtol=1e-9)
        assert_all_close(sorted_c(z1), sorted_c(z2), atol=1e-9, rtol=1e-9)
        assert k1 == pytest.approx(k2, rel=1e-8)

    def test_order_validation(self):
        with pytest.raises(ValueError, match="positive"):
            buttap(0)
        with pytest.raises(ValueError, match="rp < rs"):
            ellipap(4, 2.0, 1.0)


DESIGNS = [
    ("butter-lp", lambda: butter(4, 0.3), lambda: sps.butter(4, 0.3)),
    ("butter-hp", lambda: butter(5, 0.4, btype="highpass"),
     lambda: sps.butter(5, 0.4, btype="highpass")),
    ("butter-bp", lambda: butter(3, [0.2, 0.5], btype="bandpass"),
     lambda: sps.butter(3, [0.2, 0.5], btype="bandpass")),
    ("butter-bs", lambda: butter(3, [0.2, 0.5], btype="bandstop"),
     lambda: sps.butter(3, [0.2, 0.5], btype="bandstop")),
    ("butter-fs", lambda: butter(4, 1000.0, fs=8000.0),
     lambda: sps.butter(4, 1000.0, fs=8000.0)),
    ("butter-analog", lambda: butter(4, 100.0, analog=True),
     lambda: sps.butter(4, 100.0, analog=True)),
    ("cheby1", lambda: cheby1(4, 1.0, 0.3), lambda: sps.cheby1(4, 1.0, 0.3)),
    ("cheby2", lambda: cheby2(4, 40.0, 0.3), lambda: sps.cheby2(4, 40.0, 0.3)),
    ("ellip", lambda: ellip(4, 1.0, 40.0, 0.3),
     lambda: sps.ellip(4, 1.0, 40.0, 0.3)),
    ("ellip-bp", lambda: ellip(3, 0.5, 50.0, [0.25, 0.6], btype="bandpass"),
     lambda: sps.ellip(3, 0.5, 50.0, [0.25, 0.6], btype="bandpass")),
    ("bessel", lambda: bessel(4, 0.3), lambda: sps.bessel(4, 0.3)),
    ("iirnotch", lambda: iirnotch(0.3, 30.0), lambda: sps.iirnotch(0.3, 30.0)),
    ("iirpeak", lambda: iirpeak(1500.0, 25.0, fs=10000.0),
     lambda: sps.iirpeak(1500.0, 25.0, fs=10000.0)),
]


class TestDesigns:
    @pytest.mark.parametrize("name,mine,oracle", DESIGNS, ids=[d[0] for d in DESIGNS])
    def test_ba_parity(self, name, mine, oracle):
        b1, a1 = mine()
        b2, a2 = oracle()
        assert_all_close(b1, b2, atol=1e-10, rtol=1e-8)
        assert_all_close(a1, a2, atol=1e-10, rtol=1e-8)

    def test_zpk_output(self):
        z1, p1, k1 = butter(4, 0.3, output="zpk")
        z2, p2, k2 = sps.butter(4, 0.3, output="zpk")
        assert_all_close(sorted_c(p1), sorted_c(p2), atol=1e-12, rtol=1e-12)
        assert k1 == pytest.approx(k2, rel=1e-12)

    def test_sos_output_same_response(self):
        # pairing may differ from scipy's; the cascaded transfer function
        # must not (compare frequency responses)
        sos1 = butter(8, 0.3, output="sos")
        sos2 = sps.butter(8, 0.3, output="sos")
        w = np.linspace(0, np.pi, 512)
        _, h1 = sps.sosfreqz(np.asarray(sos1), worN=w)
        _, h2 = sps.sosfreqz(sos2, worN=w)
        assert_all_close(h1, h2, atol=1e-10, rtol=1e-8)

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="0 < Wn < 1"):
            butter(4, 1.5)
        with pytest.raises(ValueError, match="two critical"):
            butter(4, 0.3, btype="bandpass")
        with pytest.raises(ValueError, match="scalar critical"):
            butter(4, [0.2, 0.5])
        with pytest.raises(ValueError, match="rp"):
            iirfilter(4, 0.3, ftype="cheby1")
        with pytest.raises(ValueError, match="rs"):
            iirfilter(4, 0.3, ftype="cheby2")
        with pytest.raises(ValueError, match="less than"):
            butter(4, [0.5, 0.2], btype="bandpass")
        with pytest.raises(ValueError, match="ftype"):
            iirfilter(4, 0.3, ftype="nope")
        with pytest.raises(ValueError, match="fs cannot"):
            butter(4, 100.0, analog=True, fs=1000.0)


class TestConversions:
    def test_tf_zpk_roundtrip(self):
        b, a = sps.cheby1(5, 1.0, 0.4)
        z, p, k = tf2zpk(b, a)
        b2, a2 = zpk2tf(z, p, k)
        assert_all_close(b2, b, atol=1e-12, rtol=1e-10)
        assert_all_close(a2, a, atol=1e-12, rtol=1e-10)

    def test_sos_roundtrip(self):
        b, a = sps.butter(7, 0.25)
        sos = tf2sos(b, a)
        b2, a2 = sos2tf(np.asarray(sos))
        # normalize both to a[0]=1 and strip trailing float dust
        assert_all_close(np.asarray(b2)[: len(b)], b, atol=1e-10, rtol=1e-8)
        assert_all_close(np.asarray(a2)[: len(a)], a, atol=1e-10, rtol=1e-8)

    def test_zpk2sos_gain_and_shape(self):
        z, p, k = sps.butter(6, 0.3, output="zpk")
        sos = zpk2sos(z, p, k)
        assert sos.shape == (3, 6)
        # DC gain must match
        b, a = sps.butter(6, 0.3)
        dc_ref = np.sum(b) / np.sum(a)
        dc = np.prod([np.sum(sos[i, :3]) / np.sum(sos[i, 3:]) for i in range(3)])
        assert dc == pytest.approx(dc_ref, rel=1e-10)

    def test_bilinear_zpk(self):
        z, p, k = sps.cheb1ap(4, 1.0)
        got = bilinear_zpk(z, p, k, fs=2.0)
        want = sps.bilinear_zpk(z, p, k, fs=2.0)
        assert_all_close(sorted_c(got[1]), sorted_c(want[1]), atol=1e-12, rtol=1e-12)
        assert got[2] == pytest.approx(want[2], rel=1e-12)


class TestLfilter:
    @pytest.mark.parametrize(
        "design",
        [lambda: sps.butter(1, 0.4), lambda: sps.butter(2, 0.3),
         lambda: sps.cheby1(4, 1.0, 0.35), lambda: sps.butter(6, 0.2)],
        ids=["order1", "order2", "order4", "order6"],
    )
    def test_scipy_parity(self, design, rng):
        b, a = design()
        x = rng.normal(size=400)
        assert_all_close(lfilter(b, a, x), sps.lfilter(b, a, x),
                         atol=1e-9, rtol=1e-7)

    def test_batched(self, rng):
        b, a = sps.butter(3, 0.3)
        x = rng.normal(size=(4, 5, 128))
        assert_all_close(lfilter(b, a, x), sps.lfilter(b, a, x),
                         atol=1e-9, rtol=1e-7)

    def test_axis(self, rng):
        b, a = sps.butter(3, 0.3)
        x = rng.normal(size=(6, 64, 3))
        assert_all_close(lfilter(b, a, x, axis=1), sps.lfilter(b, a, x, axis=1),
                         atol=1e-9, rtol=1e-7)

    def test_fir_only(self, rng):
        b = sps.firwin(31, 0.4)
        x = rng.normal(size=200)
        assert_all_close(lfilter(b, [1.0], x), sps.lfilter(b, [1.0], x),
                         atol=1e-10, rtol=1e-8)

    def test_zi_and_zf(self, rng):
        b, a = sps.butter(4, 0.25)
        x = rng.normal(size=(3, 100))
        zi = np.broadcast_to(lfilter_zi(b, a), (3, 4))
        y1, zf1 = lfilter(b, a, x, zi=zi)
        y2, zf2 = sps.lfilter(b, a, x, zi=zi)
        assert_all_close(y1, y2, atol=1e-9, rtol=1e-7)
        assert_all_close(zf1, zf2, atol=1e-9, rtol=1e-7)

    def test_streaming_chunks_equal_whole(self, rng):
        """Carrying zf across chunks must reproduce the one-shot filter —
        the streaming/checkpoint-resume property (SURVEY.md §5)."""
        b, a = sps.butter(4, 0.25)
        x = rng.normal(size=256)
        whole = lfilter(b, a, x)
        z = np.zeros(4)
        parts = []
        for chunk in np.split(x, [50, 100, 180]):
            y, z = lfilter(b, a, chunk, zi=z)
            parts.append(np.asarray(y))
        assert_all_close(np.concatenate(parts), whole, atol=1e-10, rtol=1e-8)

    def test_short_signal_zi(self, rng):
        # signal shorter than the filter order: zi carryover into zf
        b, a = sps.butter(5, 0.3)
        x = rng.normal(size=3)
        zi = rng.normal(size=5)
        y1, zf1 = lfilter(b, a, x, zi=zi)
        y2, zf2 = sps.lfilter(b, a, x, zi=zi)
        assert_all_close(y1, y2, atol=1e-10, rtol=1e-8)
        assert_all_close(zf1, zf2, atol=1e-10, rtol=1e-8)

    def test_lfilter_zi_parity(self):
        for design in [sps.butter(2, 0.3), sps.butter(5, 0.2),
                       sps.cheby1(4, 1.0, 0.4)]:
            b, a = design
            assert_all_close(lfilter_zi(b, a), sps.lfilter_zi(b, a),
                             atol=1e-12, rtol=1e-10)

    def test_jit(self, rng):
        b, a = sps.butter(4, 0.3)
        x = rng.normal(size=(2, 128))
        got = jax.jit(lambda s: lfilter(b, a, s))(x)
        assert_all_close(got, sps.lfilter(b, a, x), atol=1e-9, rtol=1e-7)


class TestFiltfilt:
    def test_scipy_parity(self, rng):
        b, a = sps.butter(4, 0.25)
        x = rng.normal(size=300)
        assert_all_close(filtfilt(b, a, x), sps.filtfilt(b, a, x),
                         atol=1e-9, rtol=1e-7)

    @pytest.mark.parametrize("padtype", ["odd", "even", "constant", None])
    def test_padtypes(self, padtype, rng):
        b, a = sps.butter(3, 0.3)
        x = rng.normal(size=200)
        assert_all_close(
            filtfilt(b, a, x, padtype=padtype),
            sps.filtfilt(b, a, x, padtype=padtype, padlen=None if padtype else 0),
            atol=1e-9, rtol=1e-7,
        )

    def test_batched_axis(self, rng):
        b, a = sps.butter(4, 0.25)
        x = rng.normal(size=(3, 250, 2))
        assert_all_close(filtfilt(b, a, x, axis=1),
                         sps.filtfilt(b, a, x, axis=1), atol=1e-9, rtol=1e-7)

    def test_padlen_too_long(self):
        b, a = sps.butter(4, 0.25)
        with pytest.raises(ValueError, match="padlen"):
            filtfilt(b, a, np.zeros(10))


class TestSos:
    def test_sosfilt_parity(self, rng):
        sos = sps.butter(8, 0.3, output="sos")
        x = rng.normal(size=(4, 300))
        assert_all_close(sosfilt(sos, x), sps.sosfilt(sos, x),
                         atol=1e-9, rtol=1e-7)

    def test_sosfilt_zi(self, rng):
        sos = sps.cheby1(6, 1.0, 0.3, output="sos")
        assert_all_close(sosfilt_zi(sos), sps.sosfilt_zi(sos),
                         atol=1e-12, rtol=1e-10)
        x = rng.normal(size=200)
        zi = sps.sosfilt_zi(sos) * x[0]
        y1, zf1 = sosfilt(sos, x, zi=zi)
        y2, zf2 = sps.sosfilt(sos, x, zi=zi)
        assert_all_close(y1, y2, atol=1e-9, rtol=1e-7)
        assert_all_close(zf1, zf2, atol=1e-9, rtol=1e-7)

    def test_sosfiltfilt_parity(self, rng):
        sos = sps.butter(6, 0.2, output="sos")
        x = rng.normal(size=(2, 400))
        assert_all_close(sosfiltfilt(sos, x), sps.sosfiltfilt(sos, x),
                         atol=1e-9, rtol=1e-7)

    def test_own_design_end_to_end(self, rng):
        """Design with this framework, apply with this framework, compare
        against the full scipy pipeline."""
        sos_mine = butter(8, 0.3, output="sos")
        sos_ref = sps.butter(8, 0.3, output="sos")
        x = rng.normal(size=500)
        assert_all_close(sosfilt(jnp.asarray(np.asarray(sos_mine)), x),
                         sps.sosfilt(sos_ref, x), atol=1e-9, rtol=1e-7)

    def test_high_order_stability(self, rng):
        """Order-16 elliptic: cascaded biquads stay stable where the direct
        form would explode — the reason sosfilt is the recommended path."""
        sos = sps.ellip(16, 0.5, 80.0, 0.3, output="sos")
        x = rng.normal(size=1000)
        y = np.asarray(sosfilt(sos, x))
        assert np.all(np.isfinite(y))
        assert_all_close(y, sps.sosfilt(sos, x), atol=1e-7, rtol=1e-5)

    def test_bad_sos_shape(self):
        with pytest.raises(ValueError, match="n_sections"):
            sosfilt(np.zeros((2, 5)), np.zeros(10))
