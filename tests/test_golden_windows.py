"""Numeric checks of every resampling window against the reference formulas
(dali/kernels/imgproc/resample/resampling_windows.h) — closed forms
re-derived here, evaluated at dense sample points. These are *independent*
goldens: a shared formula error in kernels/resample.py fails here.
"""

import numpy as np
import pytest

from dali_tpu.kernels.resample import _window
from dali_tpu.types import DALIInterpType


def w(interp, t):
    return np.asarray(_window(interp, np.asarray(t, np.float32)))


T = np.linspace(-1.0, 1.0, 201).astype(np.float32)  # normalized distance


def test_triangular_and_linear():
    expect = np.maximum(0.0, 1.0 - np.abs(T))
    for interp in (DALIInterpType.INTERP_LINEAR, DALIInterpType.INTERP_TRIANGULAR):
        np.testing.assert_allclose(w(interp, T), expect, atol=1e-6)


def test_nearest_rectangular():
    got = w(DALIInterpType.INTERP_NN, T)
    expect = (np.abs(T) <= 0.5).astype(np.float32)
    np.testing.assert_allclose(got, expect)


def test_cubic_catmull_rom_a_minus_half():
    # reference CubicWindow: |x|<=1: 1.5x^3-2.5x^2+1 ; 1<|x|<2: -.5x^3+2.5x^2-4x+2
    x = np.abs(T) * 2.0
    x2, x3 = x * x, x * x * x
    expect = np.where(
        x <= 1.0, 1.5 * x3 - 2.5 * x2 + 1.0,
        np.where(x < 2.0, -0.5 * x3 + 2.5 * x2 - 4.0 * x + 2.0, 0.0),
    )
    np.testing.assert_allclose(w(DALIInterpType.INTERP_CUBIC, T), expect, atol=1e-5)
    # interpolating-kernel property: 1 at 0, 0 at integer offsets
    assert abs(w(DALIInterpType.INTERP_CUBIC, 0.0) - 1.0) < 1e-6
    assert abs(w(DALIInterpType.INTERP_CUBIC, 0.5)) < 1e-6  # x=1


def test_gaussian_exp_minus_x2():
    # reference GaussianFilter(radius): scale=2/radius, ExpMinusX2 -> exp(-(2d/r)^2)
    expect = np.exp(-((2.0 * T) ** 2))
    np.testing.assert_allclose(w(DALIInterpType.INTERP_GAUSSIAN, T), expect, rtol=1e-5)


def test_lanczos3():
    def sinc(v):
        v = np.where(np.abs(v) < 1e-12, 1e-12, v)
        return np.sin(np.pi * v) / (np.pi * v)

    x = np.abs(T) * 3.0
    expect = np.where(x < 3.0, sinc(x) * sinc(x / 3.0), 0.0)
    np.testing.assert_allclose(w(DALIInterpType.INTERP_LANCZOS3, T), expect, atol=1e-5)
    assert abs(w(DALIInterpType.INTERP_LANCZOS3, 0.0) - 1.0) < 1e-4
    # zero crossings at integer lattice: x = 1, 2
    for t0 in (1 / 3, 2 / 3):
        assert abs(w(DALIInterpType.INTERP_LANCZOS3, t0)) < 1e-5
