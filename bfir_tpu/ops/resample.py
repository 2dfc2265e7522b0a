"""Polyphase windowed-sinc sample-rate conversion.

Replaces the reference's binary libsamplerate dependency
(``src_simple(..., SRC_SINC_BEST_QUALITY, ...)`` at ``buffer.cpp:302``, used
to resample impulse-response files to the stream rate, ``buffer.cpp:224-330``)
with an own-design rational polyphase resampler:

- rate conversion L/M with L, M = rate_out/g, rate_in/g (g = gcd)
- prototype lowpass: Kaiser-windowed sinc at cutoff
  ``min(rate_in, rate_out)/2 * rolloff``, length ``taps_per_phase * L``,
  designed with ``ops.firwindow``; the default quality (145 dB stopband,
  64 taps/phase) brackets libsamplerate's "best quality" sinc
- compute: fully vectorized gather-and-reduce on device — for each output
  sample j, phase ``p_j = (j*M) % L`` and window start ``n_j = (j*M) // L``;
  windows are gathered as [J, K] and reduced against the per-phase
  coefficients. Design is host-side numpy (one-time), compute is jit-able.

The reference caches resampled impulses as ``ir-<hash>-<ch>-<rate>.wav``
(buffer.cpp:243-253) — that caching lives in ``engine.cache``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from bfir_tpu.ops.firwindow import design_lowpass, kaiser_beta_for_attenuation


@functools.lru_cache(maxsize=16)
def _polyphase_filter(l: int, m: int, taps_per_phase: int, atten_db: float,
                      rolloff: float) -> np.ndarray:
    """Design the prototype lowpass and return its polyphase bank [L, K]."""
    k = taps_per_phase
    total = l * k
    # cutoff in units of the upsampled rate (rate_in * L); pass band edge at
    # min(in, out)/2 * rolloff
    cutoff = rolloff * 0.5 * min(1.0 / l, 1.0 / m)
    beta = kaiser_beta_for_attenuation(atten_db)
    h = design_lowpass(total, cutoff, beta=beta) * l  # gain L to preserve level
    # polyphase decomposition: phase p takes h[p], h[p+L], ...
    bank = h.reshape(k, l).T.copy()  # [L, K]
    return bank


def taps_per_phase_for(atten_db: float, rolloff: float) -> int:
    """Kaiser length formula per polyphase branch: the transition band is
    (1 - rolloff) * pi at the narrower Nyquist, independent of L/M."""
    import math as _math

    n = (atten_db - 8.0) / (2.285 * (1.0 - rolloff) * _math.pi)
    return max(16, int(_math.ceil(n)))


def resample(
    x,
    rate_in: int,
    rate_out: int,
    taps_per_phase: int = None,
    atten_db: float = 145.0,
    rolloff: float = 0.945,
    dtype=None,
):
    """Resample ``x`` [..., T] from rate_in to rate_out.

    Returns [..., ceil(T * rate_out / rate_in)]. Zero-phase-compensated: the
    prototype filter's group delay is removed so the output is time-aligned
    with the input (matching src_simple's aligned output).
    """
    if rate_in < 1 or rate_out < 1:
        raise ValueError(f"sample rates must be >= 1, got {rate_in} -> {rate_out}")
    if dtype is not None and not jax.dtypes.canonicalize_dtype(dtype) == jnp.dtype(dtype):
        dtype = jax.dtypes.canonicalize_dtype(dtype)  # f64 -> f32 when x64 off
    x = jnp.asarray(x)
    if dtype is not None:
        x = x.astype(dtype)
    if rate_in == rate_out:
        return x
    g = math.gcd(rate_in, rate_out)
    l, m = rate_out // g, rate_in // g
    if taps_per_phase is None:
        taps_per_phase = taps_per_phase_for(atten_db, rolloff)
    bank = _polyphase_filter(l, m, taps_per_phase, atten_db, rolloff)
    bank_j = jnp.asarray(bank, dtype=x.dtype)  # [L, K], one transfer, reused below
    k = bank.shape[1]

    t = x.shape[-1]
    j_out = int(np.ceil(t * l / m))

    # upsampled-grid position of output j is j*M; the K-tap filter (flipped
    # into convolution form) spans input samples n_j-K+1 .. n_j after group
    # delay compensation by (L*K)//2 upsampled ticks.
    delay = (l * k) // 2
    jj = np.arange(j_out)
    pos = jj * m + delay
    n0 = pos // l  # input index of the filter's newest tap
    phase = pos % l

    # gather windows: w[j, i] = x[n0_j - i], i = 0..K-1 (flipped for conv)
    idx = n0[:, None] - np.arange(k)[None, :]  # [J, K]
    valid = (idx >= 0) & (idx < t)
    idx_c = np.clip(idx, 0, t - 1)

    idx_j = jnp.asarray(idx_c)
    valid_j = jnp.asarray(valid, dtype=x.dtype)
    win = x[..., idx_j] * valid_j  # [..., J, K]

    # coefficients per output sample: y[j] = sum_i h[i*L + phase_j] x[n0 - i],
    # and bank[p, i] = h[i*L + p], so bank[phase_j] pairs with the gathered
    # window as-is
    coefs = bank_j[jnp.asarray(phase)]  # [J, K]
    return jnp.sum(win * coefs, axis=-1)


def resample_to(x, rate_in: int, rate_out: int, **kw):
    """buffer::resample_snd_file semantics (buffer.cpp:224-330): resample a
    whole impulse/audio buffer [C, T] host-or-device to the target rate."""
    return resample(x, rate_in, rate_out, **kw)
