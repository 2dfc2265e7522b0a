"""FFT provider: XLA FFT where available, matmul-DFT on the MXU elsewhere.

The reference leans on FFTW's r2r halfcomplex transforms with wisdom tuning
(``fftw_convolver.cpp:51-137,653-695``). On TPU there are two substitutes:

1. ``jnp.fft`` (XLA's FFT op) — available on CPU, but **unimplemented on the
   axon TPU backend this image targets** (probed: ``jnp.fft.rfft`` raises
   UNIMPLEMENTED).
2. DFT-as-matmul on the MXU: X = x @ W with precomputed trig weight
   matrices. For the engine's moderate sizes (2N = 2048 at plugin defaults)
   the 128x128 systolic array executes these dense [B, M] @ [M, F] products
   at near-peak; batching over channels/blocks gives the MXU its favorite
   shape. Asymptotically more FLOPs than O(M log M), but on this hardware a
   single dense matmul at ~peak beats an FFT's gather/permute stages for
   M up to tens of thousands. A split-radix (Bailey four-step) matmul
   factorization is the follow-up for large M (kernels/).

Dispatch is at trace time via ``jax.default_backend()``; tests force the
matmul path explicitly to validate it against numpy on CPU.

All transforms follow numpy conventions: ``rfft``/``irfft`` over the last
axis with irfft carrying the 1/N normalization (the reference folds 1/n_fft
into its coefficient spectra instead, fftw_convolver.cpp:521-523 — same net
gain), and ``fft``/``ifft`` over an arbitrary axis for the block-axis
convolution in ``core.convolver.process_batch``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Force mode for tests/benchmarks: "auto" | "xla" | "matmul"
_FORCE = os.environ.get("BFIR_FFT_MODE", "auto")


def set_mode(mode: str) -> None:
    global _FORCE
    if mode not in ("auto", "xla", "matmul"):
        raise ValueError(mode)
    _FORCE = mode


def _use_matmul() -> bool:
    if _FORCE == "matmul":
        return True
    if _FORCE == "xla":
        return False
    return jax.default_backend() != "cpu"


# DFT matmul precision. HIGHEST = 6-pass bf16 emulation of f32 on the MXU
# (accurate, slower); HIGH = 3-pass (~f32 accuracy for audio dynamic range).
# Switchable for benchmarking; tests pin accuracy in both modes.
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(p: str) -> None:
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[p]


@functools.lru_cache(maxsize=32)
def _rdft_weights(m: int, dtype: str):
    """Real-input DFT weights: cos/sin matrices [M, M//2+1]."""
    n = np.arange(m)[:, None]
    k = np.arange(m // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / m
    return (np.cos(ang).astype(dtype), np.sin(ang).astype(dtype))


@functools.lru_cache(maxsize=32)
def _irdft_weights(m: int, dtype: str):
    """Inverse real DFT weights [M//2+1, M] for real output.

    x[n] = 1/M * sum_k w_k * (Re X_k cos(2pi k n/M) - Im X_k sin(2pi k n/M)),
    w_0 = w_{M/2} = 1, else 2.
    """
    f = m // 2 + 1
    k = np.arange(f)[:, None]
    n = np.arange(m)[None, :]
    ang = 2.0 * np.pi * k * n / m
    w = np.full((f, 1), 2.0)
    w[0, 0] = 1.0
    if m % 2 == 0:
        w[-1, 0] = 1.0
    wr = (w * np.cos(ang) / m).astype(dtype)
    wi = (-w * np.sin(ang) / m).astype(dtype)
    return wr, wi


@functools.lru_cache(maxsize=32)
def _cdft_weights(m: int, dtype: str, inverse: bool):
    n = np.arange(m)[:, None]
    k = np.arange(m)[None, :]
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * n * k / m
    scale = (1.0 / m) if inverse else 1.0
    return (np.cos(ang).astype(dtype) * scale, np.sin(ang).astype(dtype) * scale)


def _pad_last(x, n: int):
    if x.shape[-1] == n:
        return x
    if x.shape[-1] > n:
        return x[..., :n]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
    return jnp.pad(x, pad)


def rfft(x: jax.Array, n: Optional[int] = None, axis: int = -1) -> jax.Array:
    if not _use_matmul():
        return jnp.fft.rfft(x, n=n, axis=axis)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
        return jnp.moveaxis(rfft(x, n=n, axis=-1), -1, axis)
    m = n or x.shape[-1]
    xr, xi = rfft_split(x, n=m)
    return jax.lax.complex(xr, xi)


def irfft(y: jax.Array, n: Optional[int] = None, axis: int = -1) -> jax.Array:
    if not _use_matmul():
        return jnp.fft.irfft(y, n=n, axis=axis)
    if axis != -1 and axis != y.ndim - 1:
        y = jnp.moveaxis(y, axis, -1)
        return jnp.moveaxis(irfft(y, n=n, axis=-1), -1, axis)
    m = n or 2 * (y.shape[-1] - 1)
    return irfft_split(jnp.real(y), jnp.imag(y), n=m)


# Above this size, use the four-step (Bailey) factorization instead of one
# dense DFT matmul: M = n1*n2 -> DFT_n1 stages + twiddles + DFT_n2 stages,
# all as batched matmuls. FLOPs drop from O(M^2) to O(M*(n1+n2)) per vector
# while every stage stays a dense MXU matmul.
_FOUR_STEP_MIN = 512


def _split_factor(m: int) -> int:
    """Largest power-of-two n1 <= sqrt(m) (m is a power of two here)."""
    n1 = 1
    while n1 * n1 <= m // 2:
        n1 *= 2
    return n1


@functools.lru_cache(maxsize=32)
def _twiddle(m: int, n1: int, dtype: str, inverse: bool):
    n2 = m // n1
    k1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * k1 * k2 / m
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _cmatmul(ar, ai, br, bi):
    """Complex matmul on split real/imag operands (3 real matmuls via
    Karatsuba-style is possible; 4 is simpler and MXU-bound either way)."""
    rr = jnp.matmul(ar, br, precision=_MATMUL_PRECISION) - jnp.matmul(
        ai, bi, precision=_MATMUL_PRECISION)
    ri = jnp.matmul(ar, bi, precision=_MATMUL_PRECISION) + jnp.matmul(
        ai, br, precision=_MATMUL_PRECISION)
    return rr, ri


def _cfft_fourstep(yr, yi, m: int, inverse: bool):
    """Four-step FFT over the last axis on split re/im arrays [..., M]."""
    rdt = yr.dtype.name
    n1 = _split_factor(m)
    n2 = m // n1
    batch = yr.shape[:-1]
    # step 1: view as [.., n2, n1] (column-major split: index = k2*n1 + k1
    # -> x[k1 stride n2?]). Standard decimation: x[j], j = j1*n2 + j2;
    # X[k2*n1 + k1] = sum_{j1,j2} x[j1*n2+j2] W_m^{(j1*n2+j2)(k1... } —
    # implement as: A[j2, j1] = x[j1*n2 + j2]; B = DFT_n1 over j1;
    # B *= twiddle(j2, k1); C = DFT_n2 over j2; X[k1*n2 + k2] = C[k2, k1].
    yr = yr.reshape(*batch, n1, n2)
    yi = yi.reshape(*batch, n1, n2)
    # DFT over j1 (axis -2): move to last axis for matmul
    yr_t = jnp.swapaxes(yr, -1, -2)  # [.., n2, n1]
    yi_t = jnp.swapaxes(yi, -1, -2)
    cr1, ci1 = _cdft_weights(n1, rdt, inverse)
    # forward small DFTs carry no scale; inverse scale folded at the end
    s1 = n1 if inverse else 1
    br1 = jnp.asarray(cr1 * s1)
    bi1 = jnp.asarray(ci1 * s1)
    ar, ai = _cmatmul(yr_t, yi_t, br1, bi1)  # [.., n2, n1] indexed [j2, k1]
    # twiddle W_m^{±j2*k1}
    twr, twi = _twiddle(m, n1, rdt, inverse)
    twr_j = jnp.asarray(twr).T  # [n2, n1] indexed [j2, k1]
    twi_j = jnp.asarray(twi).T
    tr = ar * twr_j - ai * twi_j
    ti = ar * twi_j + ai * twr_j
    # DFT over j2 (axis -2 after swap): [.., n1, n2] indexed [k1, j2]
    tr = jnp.swapaxes(tr, -1, -2)
    ti = jnp.swapaxes(ti, -1, -2)
    cr2, ci2 = _cdft_weights(n2, rdt, inverse)
    s2 = n2 / m if inverse else 1  # total inverse scale = 1/m
    br2 = jnp.asarray(cr2 * s2)
    bi2 = jnp.asarray(ci2 * s2)
    orr, oi = _cmatmul(tr, ti, br2, bi2)  # [.., n1, n2] indexed [k1, k2]
    # output index is k2*n1 + k1 -> transpose before flattening
    orr = jnp.swapaxes(orr, -1, -2).reshape(*batch, m)
    oi = jnp.swapaxes(oi, -1, -2).reshape(*batch, m)
    return orr, oi


def _cfft(y: jax.Array, n: Optional[int], axis: int, inverse: bool) -> jax.Array:
    if not _use_matmul():
        fn = jnp.fft.ifft if inverse else jnp.fft.fft
        return fn(y, n=n, axis=axis)
    if axis != -1 and axis != y.ndim - 1:
        y = jnp.moveaxis(y, axis, -1)
        return jnp.moveaxis(_cfft(y, n, -1, inverse), -1, axis)
    m = n or y.shape[-1]
    y = _pad_last(y, m)
    cdt = y.dtype
    rdt = "float32" if cdt == jnp.complex64 else "float64"
    if m >= _FOUR_STEP_MIN and (m & (m - 1)) == 0:
        orr, oi = _cfft_fourstep(jnp.real(y), jnp.imag(y), m, inverse)
        return jax.lax.complex(orr, oi)
    cr, ci = _cdft_weights(m, rdt, inverse)
    cr = jnp.asarray(cr)
    ci = jnp.asarray(ci)
    yr, yi = jnp.real(y), jnp.imag(y)
    out_r = (
        jnp.matmul(yr, cr, precision=_MATMUL_PRECISION)
        - jnp.matmul(yi, ci, precision=_MATMUL_PRECISION)
    )
    out_i = (
        jnp.matmul(yr, ci, precision=_MATMUL_PRECISION)
        + jnp.matmul(yi, cr, precision=_MATMUL_PRECISION)
    )
    return jax.lax.complex(out_r, out_i)


def fft(y, n=None, axis=-1):
    return _cfft(jnp.asarray(y, dtype=jnp.result_type(y, 1j)), n, axis, inverse=False)


def ifft(y, n=None, axis=-1):
    return _cfft(jnp.asarray(y, dtype=jnp.result_type(y, 1j)), n, axis, inverse=True)


# ---------------------------------------------------------------------------
# Split re/im API — the TPU-native representation.
#
# Pallas TPU kernels have no complex dtype, and this backend cannot move
# complex arrays across the host boundary, so the performance path keeps
# spectra as separate real/imag planes end-to-end. These entry points skip
# the lax.complex pack/unpack entirely.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _half_twiddle(m: int, dtype: str):
    """e^{-2 pi i k / m} for k = 0..m//2-1 (the rfft-via-half-cfft unpack)."""
    k = np.arange(m // 2)
    ang = -2.0 * np.pi * k / m
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def rfft_split(x: jax.Array, n: Optional[int] = None):
    """rfft over the last axis -> (re, im), each [..., n//2 + 1] real.

    Large power-of-two sizes use the classic real-packing trick: pack
    even/odd samples as one complex vector, run a single M/2 complex
    four-step FFT, and untangle — half the transform work of a full-length
    complex FFT of the zero-extended input.
    """
    m = n or x.shape[-1]
    x = _pad_last(x, m)
    if _use_matmul():
        if m >= _FOUR_STEP_MIN and (m & (m - 1)) == 0:
            h = m // 2
            zr = x[..., 0::2]
            zi = x[..., 1::2]
            zr, zi = _cfft_fourstep(zr, zi, h, inverse=False)
            # Z*[h-k] terms: index 0 maps to itself, rest reversed
            zr_rev = jnp.concatenate([zr[..., :1], zr[..., :0:-1]], axis=-1)
            zi_rev = jnp.concatenate([zi[..., :1], zi[..., :0:-1]], axis=-1)
            ar = 0.5 * (zr + zr_rev)
            ai = 0.5 * (zi - zi_rev)
            br = 0.5 * (zi + zi_rev)
            bi = -0.5 * (zr - zr_rev)
            twr, twi = _half_twiddle(m, x.dtype.name)
            twr = jnp.asarray(twr)
            twi = jnp.asarray(twi)
            xr = ar + twr * br - twi * bi
            xi = ai + twr * bi + twi * br
            # k = h bin: X[h] = Re Z[0] - Im Z[0]
            last_r = (zr[..., :1] - zi[..., :1])
            last_i = jnp.zeros_like(last_r)
            return (
                jnp.concatenate([xr, last_r], axis=-1),
                jnp.concatenate([xi, last_i], axis=-1),
            )
        cr, ci = _rdft_weights(m, x.dtype.name)
        return (
            jnp.matmul(x, jnp.asarray(cr), precision=_MATMUL_PRECISION),
            jnp.matmul(x, jnp.asarray(ci), precision=_MATMUL_PRECISION),
        )
    y = jnp.fft.rfft(x, n=m, axis=-1)
    return jnp.real(y), jnp.imag(y)


def irfft_split(yr: jax.Array, yi: jax.Array, n: Optional[int] = None) -> jax.Array:
    """Inverse rfft from split re/im planes -> real [..., n].

    Large sizes invert the real-packing trick: re-tangle the half spectrum
    into an M/2 complex vector, one M/2 inverse four-step FFT, interleave.
    """
    m = n or 2 * (yr.shape[-1] - 1)
    f = m // 2 + 1
    yr = _pad_last(yr, f)
    yi = _pad_last(yi, f)
    if _use_matmul():
        if m >= _FOUR_STEP_MIN and (m & (m - 1)) == 0:
            h = m // 2
            # A[k] = 0.5 (X[k] + X*[h-k]); iB[k] = 0.5 (X[k] - X*[h-k]);
            # Z[k] = A[k] + i e^{+2 pi i k/m} (iB[k]) ... derive on planes:
            xr_k = yr[..., :h]
            xi_k = yi[..., :h]
            xr_rev = yr[..., h:0:-1]  # X[h-k], k=0..h-1
            xi_rev = yi[..., h:0:-1]
            # X*[h-k] = (xr_rev, -xi_rev)
            ar = 0.5 * (xr_k + xr_rev)
            ai = 0.5 * (xi_k - xi_rev)
            dr = 0.5 * (xr_k - xr_rev)  # D = 0.5 (X[k] - X*[h-k])
            di = 0.5 * (xi_k + xi_rev)
            # Z[k] = A[k] + i W*[k] D[k], W* = e^{+2 pi i k/m}
            twr, twi = _half_twiddle(m, yr.dtype.name)
            twr = jnp.asarray(twr)
            twi = -jnp.asarray(twi)  # conjugate twiddle
            er = twr * dr - twi * di
            ei = twr * di + twi * dr
            zr = ar - ei
            zi = ai + er
            zr, zi = _cfft_fourstep(zr, zi, h, inverse=True)
            out = jnp.stack([zr, zi], axis=-1).reshape(*zr.shape[:-1], m)
            return out
        wr, wi = _irdft_weights(m, yr.dtype.name)
        return (
            jnp.matmul(yr, jnp.asarray(wr), precision=_MATMUL_PRECISION)
            + jnp.matmul(yi, jnp.asarray(wi), precision=_MATMUL_PRECISION)
        )
    return jnp.fft.irfft(jax.lax.complex(yr, yi), n=m, axis=-1)


# ---------------------------------------------------------------------------
# Complex-dtype compatibility helpers.
#
# The axon TPU backend supports complex *compute* on device but not complex
# host<->device transfers, and eager ``jnp.zeros(..., complex)`` materializes
# a host constant and transfers it (probed: UNIMPLEMENTED). These helpers
# keep complex arrays device-born and split them for any host crossing.
# ---------------------------------------------------------------------------


def czeros(shape, dtype=jnp.complex64) -> jax.Array:
    """Device-born complex zeros (never crosses the host boundary)."""
    rdt = jnp.float32 if jnp.dtype(dtype) == jnp.complex64 else jnp.float64
    z = jnp.zeros(shape, dtype=rdt)
    return jax.lax.complex(z, z)


def to_numpy(x) -> np.ndarray:
    """Fetch any device array to host, splitting complex transfers."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


def from_numpy_complex(x: np.ndarray) -> jax.Array:
    """Put a host complex array on device via two real transfers."""
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.complexfloating):
        return jnp.asarray(x)
    return jax.lax.complex(jnp.asarray(np.real(x)), jnp.asarray(np.imag(x)))
