"""Framing and overlap-add tests — golden vectors from the reference
doctests (lib/nx_signal.ex:182-245, :656-681) plus numpy cross-checks."""

import numpy as np
import pytest

from nx_signal_tpu.spectral.framing import as_windowed, overlap_and_add


def np_frames(x, wl, stride):
    m = (len(x) - wl) // stride + 1
    return np.stack([x[i * stride : i * stride + wl] for i in range(m)])


class TestAsWindowed:
    def test_valid_default(self):
        t = np.array([0, 1, 2, 3, 4, 10, 11, 12])
        got = as_windowed(t, window_length=4)
        np.testing.assert_array_equal(np.asarray(got), np_frames(t, 4, 1))

    def test_valid_window3(self):
        t = np.array([0, 1, 2, 3, 4, 10, 11, 12])
        got = as_windowed(t, window_length=3)
        np.testing.assert_array_equal(np.asarray(got), np_frames(t, 3, 1))

    def test_explicit_padding(self):
        # reference doctest (nx_signal.ex:207-217)
        t = np.array([0, 1, 2, 3, 4, 10, 11])
        got = as_windowed(t, window_length=2, stride=2, padding=[(0, 3)])
        expected = [[0, 1], [2, 3], [4, 10], [11, 0], [0, 0]]
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_reflect(self):
        # reference doctest (nx_signal.ex:219-233)
        t = np.arange(7)
        got = as_windowed(t, window_length=6, padding="reflect", stride=1)
        expected = [
            [3, 2, 1, 0, 1, 2],
            [2, 1, 0, 1, 2, 3],
            [1, 0, 1, 2, 3, 4],
            [0, 1, 2, 3, 4, 5],
            [1, 2, 3, 4, 5, 6],
            [2, 3, 4, 5, 6, 5],
            [3, 4, 5, 6, 5, 4],
            [4, 5, 6, 5, 4, 3],
        ]
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_reflect_stride2(self):
        # reference doctest (nx_signal.ex:235-245)
        got = as_windowed(np.arange(10), window_length=6, padding="reflect", stride=2)
        expected = [
            [3, 2, 1, 0, 1, 2],
            [1, 0, 1, 2, 3, 4],
            [1, 2, 3, 4, 5, 6],
            [3, 4, 5, 6, 7, 8],
            [5, 6, 7, 8, 9, 8],
            [7, 8, 9, 8, 7, 6],
        ]
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_same_padding(self):
        t = np.arange(8)
        got = as_windowed(t, window_length=4, padding="same")
        padded = np.pad(t, (1, 2))
        np.testing.assert_array_equal(np.asarray(got), np_frames(padded, 4, 1))

    def test_batched(self):
        x = np.arange(24).reshape(2, 12)
        got = as_windowed(x, window_length=5, stride=3)
        expected = np.stack([np_frames(row, 5, 3) for row in x])
        np.testing.assert_array_equal(np.asarray(got), expected)

    @pytest.mark.parametrize("wl,stride", [(4, 1), (5, 2), (4, 4), (3, 5), (7, 3)])
    def test_stride_window_grid(self, wl, stride, rng):
        x = rng.normal(size=40)
        got = as_windowed(x, window_length=wl, stride=stride)
        np.testing.assert_allclose(np.asarray(got), np_frames(x, wl, stride))

    def test_invalid_padding(self):
        with pytest.raises(ValueError, match="invalid padding mode"):
            as_windowed(np.arange(8), window_length=3, padding="bogus")


class TestOverlapAndAdd:
    def test_no_overlap(self):
        got = overlap_and_add(np.arange(12).reshape(3, 4), overlap_length=0)
        np.testing.assert_array_equal(np.asarray(got), np.arange(12))

    def test_overlap3(self):
        # reference doctest (nx_signal.ex:662-666)
        got = overlap_and_add(np.arange(12).reshape(3, 4), overlap_length=3)
        np.testing.assert_array_equal(np.asarray(got), [0, 5, 15, 18, 17, 11])

    def test_batched(self):
        # reference doctest (nx_signal.ex:668-681), vectorized dims
        t = np.array([[[[0, 1, 2, 3], [4, 5, 6, 7]]], [[[10, 11, 12, 13], [14, 15, 16, 17]]]])
        got = overlap_and_add(t, overlap_length=3)
        np.testing.assert_array_equal(
            np.asarray(got), [[[0, 5, 7, 9, 7]], [[10, 25, 27, 29, 17]]]
        )

    @pytest.mark.parametrize("m,n,overlap", [(3, 4, 0), (3, 4, 3), (5, 8, 4), (7, 5, 2), (4, 6, 5)])
    def test_against_numpy_scatter(self, m, n, overlap, rng):
        frames = rng.normal(size=(m, n))
        stride = n - overlap
        expected = np.zeros(m * stride + overlap)
        for i in range(m):
            expected[i * stride : i * stride + n] += frames[i]
        got = overlap_and_add(frames, overlap_length=overlap)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-12)

    def test_roundtrip_with_framing(self, rng):
        x = rng.normal(size=64)
        frames = as_windowed(x, window_length=8, stride=8)
        got = overlap_and_add(frames, overlap_length=0)
        np.testing.assert_allclose(np.asarray(got), x)

    def test_overlap_too_large(self):
        with pytest.raises(ValueError, match="overlap_length must be"):
            overlap_and_add(np.zeros((2, 4)), overlap_length=4)
