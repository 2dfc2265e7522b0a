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


# ---------------------------------------------------------------------------
# Fused BALANCED four-step (r4, second wave): the non-uniform TAIL's
# transform shape (h = 8192: factors n1 = 64, n2 = 128). The crash-set
# re-probe (benchmarks/mosaic_repro.py dot3d_mid / transpose_minor2) showed
# Mosaic accepts CONTRACTION OVER THE MIDDLE AXIS of a 3-D operand but not
# an explicit minor-axis transpose — exactly the split this formulation
# needs: both DFT stages are middle-axis dot_generals (the data never
# transposes in-kernel; dot_general's result layout provides the swap), the
# lane reshape [r, h] -> [r, n1, n2] is 128-lane (probed OK), the twiddle
# is elementwise, and the final k1-major -> k2-major reorder is hoisted to
# XLA where it fuses with the untangle/interleave pass that follows anyway.
# Stage weights are [64, 64] / [128, 128] — VMEM-resident trivially, unlike
# the r4f form's [n1, n1] = [2048, 2048] monsters at this size.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _balanced_weights(h: int, dtype: str, inverse: bool, tail_only: bool):
    """(w1r, w1i, w1s_r, w1s_i?, ...) stage weights + twiddle for the
    balanced split of a length-h complex FFT. Karatsuba needs the weight
    SUM (wr + wi) too — precomputed so the kernel's third matmul has a
    resident operand. Inverse folds the 1/h scale into stage 2;
    ``tail_only`` restricts stage-2 outputs to k2 >= n2/2 (the overlap-save
    tail half)."""
    n1 = h // 128  # lane axis carries n2 = 128 (Mosaic lane width)
    n2 = 128
    sign = 2.0 if inverse else -2.0
    j1 = np.arange(n1, dtype=np.float64)
    k1 = np.arange(n1, dtype=np.float64)
    w1 = np.exp(sign * 1j * np.pi * np.outer(j1, k1) / n1)  # [j1, k1]
    j2 = np.arange(n2, dtype=np.float64)
    tw = np.exp(sign * 1j * np.pi * np.outer(j2, k1) / h)   # [j2, k1]
    k2 = np.arange(n2 // 2, n2, dtype=np.float64) if tail_only \
        else np.arange(n2, dtype=np.float64)
    w2 = np.exp(sign * 1j * np.pi * np.outer(j2, k2) / n2)  # [j2, k2]
    if inverse:
        w2 = w2 / h
    def trip(w, dt):
        wr = w.real.astype(dt)
        wi = w.imag.astype(dt)
        return wr, wi, (wr + wi).astype(dt)
    return trip(w1, dtype), (tw.real.astype(dtype), tw.imag.astype(dtype)), \
        trip(w2, dtype)


def cfft_balanced_fused(zr: jax.Array, zi: jax.Array, h: int, *,
                        inverse: bool, tail_only: bool = False,
                        rows_per_tile: int = 32,
                        interpret: bool = False):
    """Length-h complex FFT (split planes) as ONE Pallas kernel: two
    middle-axis MXU contractions + the twiddle, all VMEM-resident.
    Returns (re, im) [..., h_out] in NATURAL output order (the k1-major ->
    k2-major reorder runs in XLA); h_out = h/2 when ``tail_only``."""
    from jax.experimental import pallas as pl

    n1 = h // 128  # [r, h] -> [r, n1, 128]: the probed-OK lane reshape
    n2 = 128
    if h & (h - 1) or n1 % 8:
        raise ValueError(f"cfft_balanced_fused needs pow2 h with "
                         f"h/128 % 8 == 0 (got h={h}: {n1}x{n2})")
    batch = zr.shape[:-1]
    zr2 = zr.reshape(-1, zr.shape[-1])
    zi2 = zi.reshape(-1, zi.shape[-1])
    r = zr2.shape[0]
    tr = min(rows_per_tile, _round_up(r, 8))
    rp = _round_up(r, tr)
    if rp != r:
        zr2 = jnp.pad(zr2, ((0, rp - r), (0, 0)))
        zi2 = jnp.pad(zi2, ((0, rp - r), (0, 0)))
    dt = zr2.dtype.name
    (w1r, w1i, w1s), (twr, twi), (w2r, w2i, w2s) = _balanced_weights(
        h, dt, inverse, tail_only)
    n2k = w2r.shape[1]
    prec = F._MATMUL_PRECISION

    def cdot_mid(xr, xi, wr_ref, wi_ref, ws_ref):
        # Karatsuba complex contraction over axis 1 of [tr, a, b] with
        # [a, k]: t1 - t2, t3 - t1 - t2 (ws = wr + wi resident)
        dn = (((1,), (0,)), ((), ()))
        t1 = jax.lax.dot_general(xr, wr_ref[...], dn, precision=prec)
        t2 = jax.lax.dot_general(xi, wi_ref[...], dn, precision=prec)
        t3 = jax.lax.dot_general(xr + xi, ws_ref[...], dn, precision=prec)
        return t1 - t2, t3 - t1 - t2  # [tr, b, k]

    def kernel(zr_ref, zi_ref, w1r_, w1i_, w1s_, twr_, twi_, w2r_, w2i_,
               w2s_, or_ref, oi_ref):
        x3r = zr_ref[...].reshape(tr, n1, n2)  # j = j1*n2 + j2
        x3i = zi_ref[...].reshape(tr, n1, n2)
        ar, ai = cdot_mid(x3r, x3i, w1r_, w1i_, w1s_)      # [tr, j2, k1]
        t_r = ar * twr_[...] - ai * twi_[...]
        t_i = ar * twi_[...] + ai * twr_[...]
        o_r, o_i = cdot_mid(t_r, t_i, w2r_, w2i_, w2s_)    # [tr, k1, k2]
        or_ref[...] = o_r
        oi_ref[...] = o_i

    grid = (rp // tr,)
    c_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    o_r, o_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
            c_spec(n1, n1), c_spec(n1, n1), c_spec(n1, n1),
            c_spec(n2, n1), c_spec(n2, n1),
            c_spec(n2, n2k), c_spec(n2, n2k), c_spec(n2, n2k),
        ],
        out_specs=[
            pl.BlockSpec((tr, n1, n2k), lambda i: (i, 0, 0)),
            pl.BlockSpec((tr, n1, n2k), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, n1, n2k), zr2.dtype),
            jax.ShapeDtypeStruct((rp, n1, n2k), zr2.dtype),
        ],
        interpret=interpret,
    )(zr2, zi2, jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(w1s),
      jnp.asarray(twr), jnp.asarray(twi), jnp.asarray(w2r),
      jnp.asarray(w2i), jnp.asarray(w2s))
    # XLA reorder: [r, k1, k2] -> natural k = k2*n1 + k1 (fuses with the
    # caller's untangle/interleave pass)
    o_r = jnp.swapaxes(o_r, -1, -2).reshape(rp, n2k * n1)
    o_i = jnp.swapaxes(o_i, -1, -2).reshape(rp, n2k * n1)
    return (o_r[:r].reshape(*batch, n2k * n1),
            o_i[:r].reshape(*batch, n2k * n1))


def rfft_split_hc_balanced(x: jax.Array, n: int | None = None, *,
                           rows_per_tile: int = 32,
                           interpret: bool = False):
    """ops.fft.rfft_split_hc-equivalent built on the fused balanced core:
    XLA real-packing deinterleave -> fused complex FFT -> XLA untangle +
    hc pack (one fused elementwise pass). For the nu tail's M-frame."""
    m = n or x.shape[-1]
    h = m // 2
    batch = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if x2.shape[-1] != m:
        x2 = F._pad_last(x2, m)
    zr = x2[..., 0::2]
    zi = x2[..., 1::2]
    zr, zi = cfft_balanced_fused(zr, zi, h, inverse=False,
                                 rows_per_tile=rows_per_tile,
                                 interpret=interpret)
    # untangle + hc pack (mirrors ops.fft.rfft_split's post-pass)
    zr_rev = jnp.concatenate([zr[..., :1], zr[..., :0:-1]], axis=-1)
    zi_rev = jnp.concatenate([zi[..., :1], zi[..., :0:-1]], axis=-1)
    ar = 0.5 * (zr + zr_rev)
    ai = 0.5 * (zi - zi_rev)
    br = 0.5 * (zi + zi_rev)
    bi = -0.5 * (zr - zr_rev)
    twr, twi = F._half_twiddle(m, x2.dtype.name)
    twr = jnp.asarray(twr)
    twi = jnp.asarray(twi)
    xr = ar + twr * br - twi * bi
    xi = ai + twr * bi + twi * br
    lane0 = jnp.arange(h)[None, :] == 0
    ny = zr[..., :1] - zi[..., :1]
    hi = jnp.where(lane0, ny, xi)
    return xr.reshape(*batch, h), hi.reshape(*batch, h)


def irfft_split_hc_tail_balanced(hr: jax.Array, hi: jax.Array, n: int, *,
                                 rows_per_tile: int = 32,
                                 interpret: bool = False) -> jax.Array:
    """ops.fft.irfft_split_hc(...)[..., n/2:]-equivalent on the fused
    balanced core, with the tail selection folded into the stage-2 weights
    (half the stage-2 MXU work): XLA tangle -> fused inverse FFT (tail
    k2-range) -> XLA re/im interleave. The nu tail fire's inverse."""
    m = n
    h = m // 2
    batch = hr.shape[:-1]
    hr2 = hr.reshape(-1, hr.shape[-1])[..., :h]
    hi2 = hi.reshape(-1, hi.shape[-1])[..., :h]
    r = hr2.shape[0]
    zr, zi = _tangle_xla(hr2, hi2, m)
    cr, ci = cfft_balanced_fused(zr, zi, h, inverse=True, tail_only=True,
                                 rows_per_tile=rows_per_tile,
                                 interpret=interpret)
    # c[i], i in [h/2, h): real sample pairs (2i, 2i+1) = (re, im)
    out = jnp.stack([cr, ci], axis=-1).reshape(r, h)
    return out[:r].reshape(*batch, h)
