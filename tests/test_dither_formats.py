import numpy as np
import pytest

from bfir_tpu.core.spec import SampleFormat
from bfir_tpu.ops import dither as dth
from bfir_tpu.ops import formats as fm


ALL_INT = [SampleFormat.S8, SampleFormat.S16_LE, SampleFormat.S16_BE,
           SampleFormat.S24_LE, SampleFormat.S24_BE, SampleFormat.S24_4LE,
           SampleFormat.S24_4BE, SampleFormat.S32_LE, SampleFormat.S32_BE]
ALL_FLOAT = [SampleFormat.FLOAT_LE, SampleFormat.FLOAT_BE,
             SampleFormat.FLOAT64_LE, SampleFormat.FLOAT64_BE]


@pytest.mark.parametrize("fmt", ALL_INT)
def test_int_pack_unpack_roundtrip(fmt):
    rng = np.random.default_rng(0)
    q = rng.integers(fmt.imin, fmt.imax + 1, size=(3, 64), dtype=np.int64).astype(np.int32)
    raw = fm.encode_int(q, fmt)
    assert len(raw) == 3 * 64 * fmt.bytes
    x = fm.decode(raw, fmt, 3)
    np.testing.assert_allclose(x * fmt.full_scale, q)


@pytest.mark.parametrize("fmt", ALL_FLOAT)
def test_float_pack_unpack_roundtrip(fmt):
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(2, 100))
    raw = fm.encode_float(x, fmt)
    back = fm.decode(raw, fmt, 2)
    atol = 1e-7 if fmt.bytes == 4 else 0.0
    np.testing.assert_allclose(back, x, atol=atol)


def test_mid_tread_rounding_and_quirk():
    of = dth.init_overflow_stats(1, dtype=np.float64)
    x = np.array([[0.4, 0.6, -0.4, -0.6, 3.2, -3.2, -2.5, 2.5]])
    q, of = dth.quantize_no_dither(x, -32768, 32767, of)
    # mid-tread floor(x+0.5); reference trunc-then-decrement makes exact
    # negative integers (post +0.5) land one lower: -2.5 + 0.5 = -2.0 -> -3
    np.testing.assert_array_equal(np.asarray(q)[0], [0, 1, 0, -1, 3, -3, -3, 3])
    assert int(of.n_overflows[0]) == 0
    assert int(of.intlargest[0]) == 3


def test_clipping_and_overflow_accounting():
    of = dth.init_overflow_stats(2, dtype=np.float64)
    x = np.array([[100.0, -200.0, 5.0], [0.0, 0.0, 0.0]])
    q, of = dth.quantize_no_dither(x, -128, 127, of)
    np.testing.assert_array_equal(np.asarray(q), [[100, -128, 5], [0, 0, 0]])
    assert np.asarray(of.n_overflows).tolist() == [1, 0]
    assert float(of.largest[0]) >= 199.5
    assert int(of.intlargest[0]) == 100


def test_hp_tpdf_statistics():
    # Quantize a constant mid-scale signal: dithered output must average to
    # the true value (mid-tread unbiased), stay within +-2 LSB, and the error
    # must be high-pass shaped (first-difference dither + {1,-1} feedback).
    c, n = 2, 8192
    val = 1000.3
    st = dth.init_dither_state(c, seed=7, dtype=np.float64)
    of = dth.init_overflow_stats(c, dtype=np.float64)
    x = np.full((c, n), val)
    q, st, of = dth.quantize_hp_tpdf(x, -32768, 32767, st, of)
    q = np.asarray(q, dtype=np.float64)
    assert int(np.asarray(of.n_overflows).sum()) == 0
    np.testing.assert_allclose(q.mean(axis=1), val, atol=0.02)
    err = q - val
    # instantaneous error can reach ~4 LSB: +-1 LSB TPDF plus the {1,-1}
    # error feedback's e0-e1 swing (same in the reference, dither.cpp:154-161)
    assert np.max(np.abs(err)) <= 5.0
    # HP shaping: low-frequency error energy well below high-frequency
    spec = np.abs(np.fft.rfft(err[0]))
    lo = np.mean(spec[1 : n // 64] ** 2)
    hi = np.mean(spec[n // 4 :] ** 2)
    assert hi > 10 * lo, f"not HP shaped: lo={lo:.3g} hi={hi:.3g}"


def test_hp_tpdf_streaming_continuity():
    # same state threading across two blocks gives independent noise but no
    # discontinuity artifacts (error feedback carries across the boundary)
    c, n = 1, 512
    st = dth.init_dither_state(c, seed=3, dtype=np.float64)
    of = dth.init_overflow_stats(c, dtype=np.float64)
    x = np.full((c, 2 * n), 7.4)
    q1, st, of = dth.quantize_hp_tpdf(x[:, :n], -128, 127, st, of)
    q2, st, of = dth.quantize_hp_tpdf(x[:, n:], -128, 127, st, of)
    q = np.concatenate([np.asarray(q1), np.asarray(q2)], axis=1).astype(np.float64)
    np.testing.assert_allclose(q.mean(), 7.4, atol=0.1)


def test_dither_determinism():
    c, n = 2, 256
    x = np.linspace(-100, 100, c * n).reshape(c, n)
    outs = []
    for _ in range(2):
        st = dth.init_dither_state(c, seed=11, dtype=np.float64)
        of = dth.init_overflow_stats(c, dtype=np.float64)
        q, _, _ = dth.quantize_hp_tpdf(x, -32768, 32767, st, of)
        outs.append(np.asarray(q))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_output_stage_float_counts_but_does_not_clip():
    of = dth.init_overflow_stats(1, dtype=np.float64)
    y = np.array([[0.5, 1.5, -2.0]])
    out, of, _ = fm.output_stage(y, SampleFormat.FLOAT_LE, of)
    np.testing.assert_allclose(np.asarray(out), y)  # no clip
    assert int(of.n_overflows[0]) == 2
    np.testing.assert_allclose(float(of.largest[0]), 2.0)


def test_output_stage_int16_dithered_roundtrip():
    rng = np.random.default_rng(5)
    y = rng.uniform(-0.5, 0.5, size=(2, 1024))
    st = dth.init_dither_state(2, seed=1, dtype=np.float64)
    of = dth.init_overflow_stats(2, dtype=np.float64)
    q, of, st = fm.output_stage(y, SampleFormat.S16_LE, of, st)
    raw = fm.encode_int(np.asarray(q), SampleFormat.S16_LE)
    back = fm.decode(raw, SampleFormat.S16_LE, 2)
    # within ~4 LSB of the ideal (TPDF + error-feedback swing)
    assert np.max(np.abs(back - y)) < 5.0 / 32768.0
    # and unbiased on average
    np.testing.assert_allclose(back.mean(), y.mean(), atol=1e-4)
