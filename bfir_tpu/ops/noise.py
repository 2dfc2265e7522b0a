"""White-noise generation and the headroom (attenuation) probe.

Reference equivalents:

- ``buffer::load_white_noise`` (buffer.cpp:454-493): full-scale uniform
  white noise from a seeded boost lagged-Fibonacci generator. Here:
  ``jax.random.uniform`` over [-1, 1) (PRNG divergence documented — the
  probe only needs the noise *statistics*).
- ``preprocessor::calculate_attenuation`` (preprocessor.cpp:249-412): load
  an impulse response, stream `filter_blocks` blocks of full-scale white
  noise through an offline engine instance, track the peak |output|, and
  return ``-20*log10(peak)`` dB if the peak exceeds 1.0 else 0 — the level
  auto-set that fires when an impulse file is selected
  (prefs_file.cpp:155-176, connection.cpp:318-346).

We keep the reference's block-streaming structure (it matters: only
``n_blocks`` blocks of noise are pushed, so the filter never sees its own
steady state fully warmed for the last partitions) and expose an analytic
worst-case bound (the L1 norm of the impulse) as an option the reference
does not have.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bfir_tpu.core import convolver as cv
from bfir_tpu.core.spec import FilterSpec


def white_noise(n_channels: int, n_samples: int, seed: int = 0, dtype=jnp.float32):
    """Full-scale uniform white noise [C, T] in [-1, 1)."""
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(
        key, (n_channels, n_samples), dtype=dtype, minval=-1.0, maxval=1.0
    )


def calculate_attenuation(
    impulse,
    block_length: int = 1024,
    dtype: str = "float64",
    seed: int = 0,
) -> float:
    """Noise-probe headroom measurement (preprocessor.cpp:249-412).

    impulse: [taps] or [C, taps]. Returns attenuation in dB (<= 0), i.e. the
    gain to apply so full-scale noise does not clip; 0 if no attenuation is
    needed.
    """
    h = np.asarray(impulse)
    if h.ndim == 1:
        h = h[None, :]
    c, taps = h.shape
    n_blocks = max(1, -(-taps // block_length))
    spec = FilterSpec(block_length=block_length, n_partitions=n_blocks, dtype=dtype)
    state = cv.init_state(spec, c)
    coeffs = cv.coeffs_to_spectra(h, spec)
    noise = white_noise(c, block_length * n_blocks, seed=seed, dtype=spec.dtype)
    blocks = noise.reshape(c, n_blocks, block_length).transpose(1, 0, 2)
    _, out = cv.process_blocks(state, coeffs, blocks)
    peak = float(jnp.max(jnp.abs(out)))
    if peak > 1.0:
        return -20.0 * float(np.log10(peak))
    return 0.0


def attenuation_bound(impulse) -> float:
    """Analytic worst-case headroom: L1 norm of the impulse bounds |y| for
    any |x| <= 1 input. Stricter than the noise probe (which can undershoot
    on pathological filters). New capability beyond the reference."""
    h = np.asarray(impulse)
    l1 = np.abs(h).sum(axis=-1).max()
    if l1 > 1.0:
        return -20.0 * float(np.log10(l1))
    return 0.0
