"""Partial-fusion Pallas transforms: the Mosaic-compilable middle ground.

kernels/fft_pallas.py fuses the ENTIRE rfft/irfft into one kernel but needs
the primitive family the axon Mosaic compile helper crashes on. The crash
set, isolated in benchmarks/mosaic_repro.py (2026-08-21, per-op):

    CRASH: minor-dim reshape ([r,h]->[r,h/8,8]), stack+reshape interleave,
           strided stores, concat of middle-axis slices (the tile-order
           reversal inside fft_pallas._flip_lanes)
    OK:    lane concat, roll, [n1,n1]- and [1024,1024]-class dots,
           128-lane reshape, 3-D lane dot_general, broadcasted_iota/where

This module restructures the transform so every in-kernel op is from the
OK set:

- the interleave/deinterleave passes are hoisted to XLA (cheap, fusable);
- the spectrum flip the real-packing untangle needs is NOT a data movement
  at all: ``flip(z @ B) = z @ flip_cols(B)``, so the forward kernel runs
  stage 1 twice — once with normal, once with column-flipped weights —
  trading h² extra MAC/row (MXU, cheap) for the crash-set permutation;
- the inverse runs as radix-4 DECIMATION-IN-FREQUENCY: its stage inputs
  are contiguous lane quarters, the interleaving lands on the *output*
  side (hoisted), and the re-tangle (which needs a flip of the MAC's
  output planes) runs as one fused XLA pre-pass.

What fusion buys vs the XLA-composed four-step (ops.fft._cfft_fourstep_r4f):
the ~8 HBM-materialized elementwise passes between the contractions
collapse into VMEM; the measured streaming-shape transform time is mostly
those passes (matmul-work roofline frac 0.2-0.5).

Subject to the absolute-verification protocol (CLAUDE.md): interpret-mode
parity vs ops.fft in tests; any production wiring needs an absolute scipy
check on the real TPU at the target shape first.

Reference role: FFTW's measured-plan selection among transform algorithms
(/root/reference/brutefir/fftw_convolver.cpp:81-137,187-212) — here the
candidates are (XLA four-step | these kernels), selected by measurement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bfir_tpu.ops import fft as F
from bfir_tpu.kernels.fft_pallas import (_round_up, _tangle_tables,
                                         _untangle_tables)


@functools.lru_cache(maxsize=8)
def _r4_weights_both(h: int, dtype: str):
    """Stage-1 folded weights [4, n1, n1] plus their column-flipped copies
    (flip over the output axis): ``flip(z @ B) = z @ Bf``."""
    wr, wi = F._r4_folded_weights(h, dtype, inverse=False)
    return wr, wi, np.ascontiguousarray(wr[:, :, ::-1]), \
        np.ascontiguousarray(wi[:, :, ::-1])


def rfft_hc_fused(x: jax.Array, n: int | None = None, *,
                  rows_per_tile: int = 256,
                  interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """rfft -> packed halfcomplex planes (hr, hi) [..., h = n//2]; lane 0 =
    (DC.re, Nyquist.re) — the layout of ops.fft.rfft_split_hc.

    The even/odd deinterleave runs in XLA (one fused gather pass); the
    kernel consumes pre-split (zr, zi) [4, r, n1] branch planes and fuses
    stage-1 matmuls (+ flipped-weight copies for the untangle's spectrum
    reversal), radix-4 butterflies, untangle and hc pack."""
    from jax.experimental import pallas as pl

    m = n or x.shape[-1]
    h = m // 2
    n1 = h // 4
    if m & (m - 1) or n1 < 128:
        raise ValueError(f"rfft_hc_fused needs pow2 n with n//8 >= 128, got {m}")
    batch = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if x2.shape[-1] != m:
        x2 = F._pad_last(x2, m)
    r = x2.shape[0]
    tr = min(rows_per_tile, _round_up(r, 8))
    rp = _round_up(r, tr)
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
    dt = x2.dtype.name
    wr, wi, wrf, wif = _r4_weights_both(h, dt)
    twr, twi = _untangle_tables(m, dt)
    prec = F._MATMUL_PRECISION

    # XLA pre-pass: j = j1*8 + 2*j2 + (re/im)  ->  branch planes [4, rp, n1]
    x4 = x2.reshape(rp, n1, 8)
    zr = jnp.moveaxis(x4[:, :, 0::2], -1, 0)
    zi = jnp.moveaxis(x4[:, :, 1::2], -1, 0)

    def kernel(zr_ref, zi_ref, br_ref, bi_ref, bfr_ref, bfi_ref,
               twr_ref, twi_ref, hr_ref, hi_ref):
        def stage1(br_w, bi_w):
            outs = []
            for j2 in range(4):
                zjr = zr_ref[j2]
                zji = zi_ref[j2]
                br = br_w[j2]
                bi = bi_w[j2]
                outs.append((jnp.dot(zjr, br, precision=prec)
                             - jnp.dot(zji, bi, precision=prec),
                             jnp.dot(zjr, bi, precision=prec)
                             + jnp.dot(zji, br, precision=prec)))
            return outs

        def butterfly(ts):
            (t0r, t0i), (t1r, t1i), (t2r, t2i), (t3r, t3i) = ts
            er, ei = t0r + t2r, t0i + t2i
            fr_, fi_ = t0r - t2r, t0i - t2i
            gr_, gi_ = t1r + t3r, t1i + t3i
            hr_, hi_ = t1r - t3r, t1i - t3i
            whr, whi = hi_, -hr_  # -i * (h)
            return ((er + gr_, ei + gi_), (fr_ + whr, fi_ + whi),
                    (er - gr_, ei - gi_), (fr_ - whr, fi_ - whi))

        segs = butterfly(stage1(br_ref, bi_ref))
        zr_ = jnp.concatenate([s[0] for s in segs], axis=-1)  # [tr, h]
        zi_ = jnp.concatenate([s[1] for s in segs], axis=-1)
        # flipped spectrum via flipped weights: segments in reverse order,
        # each internally lane-flipped by the column-flipped stage-1
        segs_f = butterfly(stage1(bfr_ref, bfi_ref))
        zr_f = jnp.concatenate([segs_f[3 - i][0] for i in range(4)], axis=-1)
        zi_f = jnp.concatenate([segs_f[3 - i][1] for i in range(4)], axis=-1)
        zr_rev = jnp.roll(zr_f, 1, axis=-1)  # Z[h-k] for k >= 1
        zi_rev = jnp.roll(zi_f, 1, axis=-1)
        ar = 0.5 * (zr_ + zr_rev)
        ai = 0.5 * (zi_ - zi_rev)
        br_ = 0.5 * (zi_ + zi_rev)
        bi_ = -0.5 * (zr_ - zr_rev)
        tw_r = twr_ref[...]
        tw_i = twi_ref[...]
        xr = ar + tw_r * br_ - tw_i * bi_
        xi = ai + tw_r * bi_ + tw_i * br_
        lane0 = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 1) == 0
        ny = jnp.broadcast_to(zr_[:, :1] - zi_[:, :1], xr.shape)
        hr_ref[...] = xr  # lane 0 already DC.re
        hi_ref[...] = jnp.where(lane0, ny, xi)

    grid = (rp // tr,)
    hr, hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tr, n1), lambda i: (0, i, 0)),
            pl.BlockSpec((4, tr, n1), lambda i: (0, i, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, h), x2.dtype),
            jax.ShapeDtypeStruct((rp, h), x2.dtype),
        ],
        interpret=interpret,
    )(zr, zi, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(wrf),
      jnp.asarray(wif), jnp.asarray(twr), jnp.asarray(twi))
    return hr[:r].reshape(*batch, h), hi[:r].reshape(*batch, h)


@functools.lru_cache(maxsize=8)
def _dif_inv_tail_weights(h: int, dtype: str):
    """Folded stage-2 weights of the radix-4 DIF inverse, tail outputs
    only: V_r[k1, i1'] = (1/h)·e^{+2πi(r·k1/h + k1·(i1'+n1/2)/n1)} for
    output index i = 4·i1 + r restricted to the tail half i1 >= n1/2.
    [4, n1, n1/2] real/imag pair."""
    n1 = h // 4
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    i1 = np.arange(n1 // 2, n1, dtype=np.float64)[None, :]
    vs = [np.exp(2j * np.pi * (r * k1 / h + (k1 * i1) / n1)) / h
          for r in range(4)]
    v = np.stack(vs)
    return v.real.astype(dtype), v.imag.astype(dtype)


def _tangle_xla(hr2: jax.Array, hi2: jax.Array, m: int):
    """XLA pre-pass of the inverse: hc planes -> spectrum (zr, zi) of the
    packed half-length complex sequence (one fused elementwise+flip pass;
    the flip is in the Mosaic crash set, XLA does it for free)."""
    h = m // 2
    dt = hr2.dtype.name
    twr, twi = _tangle_tables(m, dt)
    dc = hr2[:, :1]
    ny = hi2[:, :1]
    xr_rev = jnp.roll(jnp.flip(hr2, axis=-1), 1, axis=-1)
    xi_rev = jnp.roll(jnp.flip(hi2, axis=-1), 1, axis=-1)
    lane0 = jnp.arange(h)[None, :] == 0
    xr_rev = jnp.where(lane0, ny, xr_rev)
    xi_rev = jnp.where(lane0, 0.0, xi_rev)
    xi_true = jnp.where(lane0, 0.0, hi2)
    xr_true = jnp.where(lane0, dc, hr2)
    ar = 0.5 * (xr_true + xr_rev)
    ai = 0.5 * (xi_true - xi_rev)
    dr = 0.5 * (xr_true - xr_rev)
    di = 0.5 * (xi_true + xi_rev)
    er = twr * dr - twi * di
    ei = twr * di + twi * dr
    return ar - ei, ai + er


def irfft_hc_tail_fused(hr: jax.Array, hi: jax.Array, n: int, *,
                        rows_per_tile: int = 256,
                        interpret: bool = False) -> jax.Array:
    """ops.fft.irfft_hc_tail-equivalent (overlap-save tail, samples
    [n/2, n)) with the inverse fused as a radix-4 DECIMATION-IN-FREQUENCY
    stage: spectrum quarters are contiguous lane slices, the output
    interleave is hoisted to XLA, the tangle (which needs a spectrum flip)
    runs as one fused XLA pre-pass. Stage-2 folds the tail selection into
    [n1, n1/2] weights: ≈ h²/2 MAC/row vs the production half-DFT tail
    basis's 4·h²."""
    from jax.experimental import pallas as pl

    m = n
    h = m // 2
    n1 = h // 4
    if m & (m - 1) or n1 < 256:
        raise ValueError(
            f"irfft_hc_tail_fused needs pow2 n with n//8 >= 256, got {m}")
    batch = hr.shape[:-1]
    hr2 = hr.reshape(-1, hr.shape[-1])[..., :h]
    hi2 = hi.reshape(-1, hi.shape[-1])[..., :h]
    r = hr2.shape[0]
    tr = min(rows_per_tile, _round_up(r, 8))
    rp = _round_up(r, tr)
    if rp != r:
        hr2 = jnp.pad(hr2, ((0, rp - r), (0, 0)))
        hi2 = jnp.pad(hi2, ((0, rp - r), (0, 0)))
    dt = hr2.dtype.name
    vr, vi = _dif_inv_tail_weights(h, dt)  # [4, n1, n1/2]
    prec = F._MATMUL_PRECISION
    nh = n1 // 2

    zr, zi = _tangle_xla(hr2, hi2, m)

    def kernel(zr_ref, zi_ref, vr_ref, vi_ref, *o_refs):
        zr = zr_ref[...]
        zi = zi_ref[...]
        z0r, z1r, z2r, z3r = (zr[:, q * n1:(q + 1) * n1] for q in range(4))
        z0i, z1i, z2i, z3i = (zi[:, q * n1:(q + 1) * n1] for q in range(4))
        # DIF butterflies u_r = sum_q z_q · i^{rq} (elementwise)
        s02r, s02i = z0r + z2r, z0i + z2i
        d02r, d02i = z0r - z2r, z0i - z2i
        s13r, s13i = z1r + z3r, z1i + z3i
        d13r, d13i = z1r - z3r, z1i - z3i
        us = [
            (s02r + s13r, s02i + s13i),            # r=0
            (d02r - d13i, d02i + d13r),            # r=1: + i*d13
            (s02r - s13r, s02i - s13i),            # r=2
            (d02r + d13i, d02i - d13r),            # r=3: - i*d13
        ]
        for rr, (ur, ui) in enumerate(us):
            wr_ = vr_ref[rr]
            wi_ = vi_ref[rr]
            o_refs[2 * rr][...] = (jnp.dot(ur, wr_, precision=prec)
                                   - jnp.dot(ui, wi_, precision=prec))
            o_refs[2 * rr + 1][...] = (jnp.dot(ur, wi_, precision=prec)
                                       + jnp.dot(ui, wr_, precision=prec))

    grid = (rp // tr,)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
            pl.BlockSpec((4, n1, nh), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, n1, nh), lambda i: (0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((tr, nh), lambda i: (i, 0))] * 8,
        out_shape=[jax.ShapeDtypeStruct((rp, nh), hr2.dtype)] * 8,
        interpret=interpret,
    )(zr, zi, jnp.asarray(vr), jnp.asarray(vi))
    # XLA post-pass: complex c[4·i1 + r] -> real sample pairs. Tail sample
    # index t' = 2·i - h = 8·i1' + 2·r + p with i1' = i1 - n1/2, p = re/im.
    cre = jnp.stack([outs[0], outs[2], outs[4], outs[6]], axis=-1)  # [rp,nh,4]
    cim = jnp.stack([outs[1], outs[3], outs[5], outs[7]], axis=-1)
    out = jnp.stack([cre, cim], axis=-1).reshape(rp, h)
    return out[:r].reshape(*batch, h)
