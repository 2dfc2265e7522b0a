"""Offline/bulk rendering engine: large-block batched partitioned convolution.

The streaming engines (core.convolver / core.nonuniform) are shaped by the
one-block latency constraint: a 1024-sample block must produce its output
before the next arrives, which forces small partitions (or the two-stage
schedule) and per-block dispatches. Offline rendering has NO latency
constraint — the whole input exists up front — so the optimal geometry is
different: re-partition the SAME filter at a large block size M (fewer,
fatter partitions: 131072 taps = 16 partitions at M=8192 instead of 128 at
N=1024) and run the batched block-axis-FFT formulation
(``core.convolver.process_batch``) over many M-blocks per dispatch. The
per-sample MAC/ring HBM traffic drops by the partition-count ratio, and the
transforms run at bulk shapes where the MXU is actually filled.

Outputs are the exact linear convolution either way (overlap-save is exact
at any block size), so a bulk render is interchangeable with the streaming
engine's output to fp rounding — verified against scipy in
tests/test_bulk.py and at bench scale on the TPU by bench.py.

Reference behavior being reimplemented: the reference reuses its streaming
engine for offline work (preprocessor.cpp:143-148 streams impulses through
a brutefir instance block by block); it has no bulk-optimized path — this
module is the TPU-first replacement for that reuse.

Backend caution (CLAUDE.md): the axon TPU backend has miscompiled batched
graphs at specific shapes before, and the failing-shape set moves between
plugin builds. Every TPU use of this path must keep an absolute scipy check
at bench scale (bench.py does; the engine self-check spot-checks sessions).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax

from bfir_tpu.core import convolver as cv
from bfir_tpu.core.spec import FilterSpec


@dataclass(frozen=True)
class BulkSpec:
    """Bulk render geometry: partition/block size M, partition count P at M,
    and the number of M-blocks per batched dispatch."""

    block_length: int
    n_partitions: int
    batch_blocks: int
    dtype: str = "float32"

    @property
    def filter_spec(self) -> FilterSpec:
        return FilterSpec(self.block_length, self.n_partitions, self.dtype)

    @property
    def samples_per_dispatch(self) -> int:
        return self.block_length * self.batch_blocks


def bulk_geometry(taps: int, dtype: str = "float32",
                  max_block: int = 8192,
                  samples_per_dispatch: int = 245760) -> BulkSpec:
    """Pick the offline geometry for a ``taps``-long filter.

    M is the largest power of two <= ``max_block`` that is not wastefully
    larger than the filter itself; P covers the taps at that M. The default
    ``max_block`` 8192 is the TPU-verified transform sweet spot (the
    balanced four-step formulations in ops.fft are measured and
    scipy-verified at h = M = 8192; see core.nonuniform). ``batch_blocks``
    targets ~240k samples per dispatch — the scale the batched graph is
    verified at on the axon backend (B=240 x N=1024 in bench.py history) —
    with a floor of 4 blocks so the block-axis FFT still amortizes.
    """
    taps = max(1, int(taps))
    m = 1024
    while m < max_block and m < taps:
        m *= 2
    m = min(m, max_block)
    p = max(1, -(-taps // m))
    b = max(4, samples_per_dispatch // m)
    return BulkSpec(m, p, b, dtype)


class BulkRenderer:
    """One-shot offline renderer: exact linear convolution of [C, T] audio
    with a [C, taps] (or [1, taps] shared) impulse at the bulk geometry.

    ``jit_wrap`` lets the caller supply the session's wisdom jit (serialized
    executables) instead of plain ``jax.jit``.
    """

    def __init__(self, impulse, n_channels: int, scale: float = 1.0,
                 dtype: str = "float32", spec: Optional[BulkSpec] = None,
                 jit_wrap=None):
        impulse = np.atleast_2d(np.asarray(impulse))
        self.spec = spec or bulk_geometry(impulse.shape[-1], dtype)
        self.n_channels = n_channels
        fspec = self.spec.filter_spec
        self._co = cv.coeffs_to_spectra(impulse, fspec, scale=scale)
        self._hs = cv.prepare_batch_coeffs(self._co, self.spec.batch_blocks)
        jj = jit_wrap or jax.jit
        self._call = jj(
            lambda st, co, hs, blocks: cv.process_batch(
                st, co, blocks, coeff_batch_fft=hs),
            donate_argnums=0,
        )

    def render(self, x) -> np.ndarray:
        """Filter [C, T] -> [C, T] (exact convolution, first T samples).

        The input is cut into batches of ``batch_blocks`` M-blocks; the last
        batch is zero-padded to the static batch shape (one compiled graph
        regardless of T) and the output trimmed. State threads through the
        batches, so the result is the same single linear convolution the
        streaming engines produce.
        """
        x = np.atleast_2d(np.asarray(x))
        c, t = x.shape
        if c != self.n_channels:
            raise ValueError(f"expected {self.n_channels} channels, got {c}")
        m = self.spec.block_length
        bm = self.spec.batch_blocks
        fspec = self.spec.filter_spec
        state = cv.init_state(fspec, c)
        dt = np.dtype(self.spec.dtype)
        step = m * bm
        n_batches = -(-max(t, 1) // step)
        pad = n_batches * step - t
        xp = np.pad(x.astype(dt, copy=False), ((0, 0), (0, pad)))
        outs = []
        for i in range(n_batches):
            chunk = xp[:, i * step:(i + 1) * step]
            blocks = jax.numpy.asarray(
                chunk.reshape(c, bm, m).transpose(1, 0, 2))
            state, out = self._call(state, self._co, self._hs, blocks)
            outs.append(np.asarray(out).transpose(1, 0, 2).reshape(c, -1))
        return np.concatenate(outs, axis=1)[:, :t]
