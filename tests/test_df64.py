"""Double-float (two-f32) arithmetic + transforms vs f64 numpy oracle.

The point of df64 is accuracy beyond f32 on an f32-only device, so every
test here checks the df result is (a) correct vs float64 numpy and (b)
substantially MORE accurate than the plain f32 path.
"""

import numpy as np
import pytest

import jax

from bfir_tpu.ops import df64 as D
from bfir_tpu.ops import fft as F


def rel_err(a, ref):
    return float(np.max(np.abs(a - ref)) / np.max(np.abs(ref)))


def test_two_sum_two_prod_exact():
    rng = np.random.default_rng(0)
    a = (rng.standard_normal(1000) *
         10.0 ** rng.integers(-6, 6, 1000)).astype(np.float32)
    b = (rng.standard_normal(1000) *
         10.0 ** rng.integers(-6, 6, 1000)).astype(np.float32)
    s, e = D.two_sum(a, b)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) + b.astype(np.float64))
    p, e = D.two_prod(a, b)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64),
        a.astype(np.float64) * b.astype(np.float64))


def test_df_mul_add_accuracy():
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(512)
    y64 = rng.standard_normal(512)
    x = D.split_f64(x64)
    y = D.split_f64(y64)
    z = D.df_mul(x, y)
    assert rel_err(D.join_f64(*z), x64 * y64) < 1e-13
    z = D.df_add(x, y)
    assert rel_err(D.join_f64(*z), x64 + y64) < 1e-14  # ~2^-49 df epsilon


@pytest.mark.parametrize("m", [64, 256, 1024])
def test_cfft_df_vs_numpy(m):
    rng = np.random.default_rng(2)
    x64 = rng.standard_normal((3, m))
    y64 = rng.standard_normal((3, m))
    ref = np.fft.fft(x64 + 1j * y64, axis=-1)
    xr, xi = D.cfft_df(D.split_f64(x64), D.split_f64(y64), m, inverse=False)
    err = max(rel_err(D.join_f64(*xr), ref.real), rel_err(D.join_f64(*xi), ref.imag))
    assert err < 3e-12, err
    # inverse roundtrip
    br, bi = D.cfft_df(xr, xi, m, inverse=True)
    assert rel_err(D.join_f64(*br), x64) < 3e-12
    assert rel_err(D.join_f64(*bi), y64) < 3e-12


def test_rfft_hc_df_vs_numpy_and_beats_f32():
    rng = np.random.default_rng(3)
    m = 2048
    x64 = rng.standard_normal((4, m))
    ref = np.fft.rfft(x64, axis=-1)
    h = m // 2
    ref_hr = np.concatenate([ref.real[..., :1], ref.real[..., 1:h]], -1)
    ref_hi = np.concatenate([ref.real[..., h:h+1], ref.imag[..., 1:h]], -1)

    hr, hi = D.rfft_hc_df(D.split_f64(x64), m)
    err_df = max(rel_err(D.join_f64(*hr), ref_hr), rel_err(D.join_f64(*hi), ref_hi))
    assert err_df < 1e-11, err_df

    F.set_mode("matmul")
    try:
        hr32, hi32 = F.rfft_split_hc(x64.astype(np.float32))
        err_f32 = max(rel_err(np.asarray(hr32, np.float64), ref_hr),
                      rel_err(np.asarray(hi32, np.float64), ref_hi))
    finally:
        F.set_mode("auto")
    assert err_df < err_f32 / 1e3, (err_df, err_f32)  # >=3 decades better


def test_irfft_hc_df_roundtrip():
    rng = np.random.default_rng(4)
    m = 2048
    x64 = rng.standard_normal((3, m))
    hr, hi = D.rfft_hc_df(D.split_f64(x64), m)
    back = D.irfft_hc_df(hr, hi, m)
    assert rel_err(D.join_f64(*back), x64) < 1e-11
