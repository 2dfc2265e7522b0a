"""Native C++ codec/reblocker vs the pure-numpy reference implementations."""

import numpy as np
import pytest

from bfir_tpu import native
from bfir_tpu.core.spec import SampleFormat
from bfir_tpu.ops import formats as fm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

ALL_INT = [SampleFormat.S8, SampleFormat.S16_LE, SampleFormat.S16_BE,
           SampleFormat.S24_LE, SampleFormat.S24_BE, SampleFormat.S24_4LE,
           SampleFormat.S24_4BE, SampleFormat.S32_LE, SampleFormat.S32_BE]


def _numpy_decode(raw, fmt, c):
    """Bypass the native fast path to get the numpy reference result."""
    return fm.decode(np.frombuffer(raw, dtype=np.uint8), fmt, c)


@pytest.mark.parametrize("fmt", ALL_INT)
def test_decode_matches_numpy(fmt):
    rng = np.random.default_rng(0)
    q = rng.integers(fmt.imin, fmt.imax + 1, size=(3, 257), dtype=np.int64).astype(np.int32)
    raw = fm.encode_int(q, fmt)
    got = native.decode_f64(raw, fmt, 3)
    ref = _numpy_decode(raw, fmt, 3)
    np.testing.assert_allclose(got, ref, atol=0)


@pytest.mark.parametrize("fmt", ALL_INT)
def test_encode_int_matches_numpy(fmt):
    rng = np.random.default_rng(1)
    q = rng.integers(fmt.imin, fmt.imax + 1, size=(2, 100), dtype=np.int64).astype(np.int32)
    got = native.encode_int(q, fmt)
    # numpy packing path (module-level, non-native branch)
    inter = q.astype(np.int64).T.reshape(-1)
    if fmt.bytes == 3:
        flat = inter.astype(np.int32)
        b = np.empty((flat.size, 3), dtype=np.uint8)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        if fmt.big_endian:
            b = b[:, ::-1]
        ref = b.tobytes()
    else:
        if fmt.sbytes != fmt.bytes:
            inter = inter << ((fmt.bytes - fmt.sbytes) * 8)
        e = ">" if fmt.big_endian else "<"
        dt = np.dtype(np.int8) if fmt.bytes == 1 else np.dtype(f"{e}i{fmt.bytes}")
        ref = inter.astype(dt).tobytes()
    assert got == ref


@pytest.mark.parametrize("fmt", [SampleFormat.FLOAT_LE, SampleFormat.FLOAT_BE,
                                 SampleFormat.FLOAT64_LE, SampleFormat.FLOAT64_BE])
def test_float_roundtrip(fmt):
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, 123))
    raw = native.encode_float(x, fmt)
    back = native.decode_f64(raw, fmt, 2)
    atol = 1e-7 if fmt.bytes == 4 else 0
    np.testing.assert_allclose(back, x, atol=atol)


def test_reblocker():
    r = native.Reblocker(block=64, n_channels=2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 300))
    blocks = []
    for chunk in (x[:, :50], x[:, 50:130], x[:, 130:300]):
        out = r.push(chunk)
        blocks.extend(out)
    got = np.concatenate([b for b in blocks], axis=1)
    assert got.shape == (2, 256)  # 4 complete blocks of 64
    np.testing.assert_allclose(got, x[:, :256])
    assert r.fill == 300 - 256
    r.reset()
    assert r.fill == 0


def test_decode_dispatch_uses_native():
    # fm.decode with bytes input must produce identical results either way
    rng = np.random.default_rng(4)
    q = rng.integers(-8388608, 8388608, size=(2, 64), dtype=np.int64).astype(np.int32)
    raw = fm.encode_int(q, SampleFormat.S24_LE)
    x = fm.decode(raw, SampleFormat.S24_LE, 2)
    np.testing.assert_allclose(x * 8388608.0, q)
