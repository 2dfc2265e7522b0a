"""Pallas TPU kernel for the engine's forward real FFT (halfcomplex out).

The roofline gap of the XLA-composed matmul-DFT (VERDICT r2 missing #1 /
next #1): at the bulk shape the four-step's matmul work runs at ~0.57 of
the chip's measured matmul peak because every stage between the two MXU
contractions — even/odd deinterleave, the [.., n1, 4] transpose, the
twiddle multiply, the radix-4 butterfly, the real-packing untangle, the
halfcomplex pack — is a separate HBM-materialized elementwise pass. This
kernel runs the ENTIRE transform per row-tile inside VMEM: the only HBM
traffic is one read of the input tile and one write of the two output
planes, and the only FLOPs are the stage-1 matmuls (twiddle folded into
per-branch weights, ops.fft._r4_folded_weights).

Structure per tile (m = 2*N, h = m/2, n1 = h/4; radix-4 four-step on the
real-packed half-length complex sequence — the same decomposition as
ops.fft._cfft_fourstep_r4f, which is the jnp reference for this kernel):

    x [Tr, m] --reshape--> z_j2 pairs --4x complex matmul [Tr,n1]@[n1,n1]-->
    radix-4 butterfly --> Z [Tr, h] --untangle + hc-pack--> (hr, hi) [Tr, h]

Miscompile protocol (CLAUDE.md): this backend has produced deterministic
wrong results for some large-shape graphs, and Pallas lowerings are their
own risk class. The kernel is validated in interpret mode against numpy in
tests, and every production wiring MUST go through an absolute scipy check
on the real TPU at the target shape before use (bench.py does this; the
session's known-answer self-check guards the engine path).

STATUS ON THE AXON BACKEND (probed 2026-08-21): **not compilable** — the
remote Mosaic compile helper (tpu_compile_helper) crashes (HTTP 500) on
several primitives these kernels need. Isolated per-op:

  crash:  minor-dim reshape ([r,h] -> [r,nt,k]), jnp.stack+reshape
          interleave, strided stores (o[:, 0::2] = ...), and some
          large-weight dots; strided *reads* (x[:, 0::8]) fail client-side
  ok:     contiguous 2D slices, lane concat, jnp.roll, jnp.dot
          ([256,256]-class), broadcasted_iota/where, per-tile
          exchange-matrix flips (_flip_lanes)

A crash-free reformulation exists (permuted-spectrum output + permutation-
matmul deinterleave) but its extra permutation matmuls cost ≈ the fusion
gain (analysis in the r3 work log), so the XLA-composed r4f+Karatsuba path
(ops.fft) remains the production transform on this backend. These kernels
stay interpret-validated and ready for a backend whose Mosaic supports the
ops (or a fixed compile helper); engine/wisdom.py removes the cold-compile
obstacle that blocked such kernels in r2.

Reference: FFTW's r2r halfcomplex transforms + measured-plan tuning
(/root/reference/brutefir/fftw_convolver.cpp:187-212,653-695) — the
"measured plan" role is played here by bench-driven selection between this
kernel and the XLA four-step (ops.fft), both verified on hardware.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bfir_tpu.ops import fft as F


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _untangle_tables(m: int, dtype: str):
    """Half twiddle for the real-packing untangle, as [1, h] rows."""
    twr, twi = F._half_twiddle(m, dtype)  # e^{-2 pi i k/m}, k = 0..h-1
    return twr[None, :], twi[None, :]


@functools.lru_cache(maxsize=4)
def _rev_matrix(t: int, dtype: str):
    """Exchange (anti-identity) matrix [t, t]: x @ J reverses the lane axis
    within a tile. Mosaic TPU has no `rev` primitive (probed 2026-08-21:
    "Unimplemented primitive ... rev"); a permutation-matrix matmul is
    EXACT in any float precision (one 1.0 per row) and rides the MXU."""
    j = np.zeros((t, t), dtype=dtype)
    j[np.arange(t), t - 1 - np.arange(t)] = 1.0
    return j


def _flip_lanes(x, jmat, tile: int = 128):
    """jnp.flip(x, -1) for [r, h] with h % tile == 0, Mosaic-lowerable:
    per-tile lane reversal via the exchange-matrix matmul + static
    tile-order reversal."""
    r, h = x.shape
    nt = h // tile
    xt = x.reshape(r, nt, tile)
    rev = jax.lax.dot_general(
        xt, jmat, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # [r, nt, tile] lanes reversed
    parts = [rev[:, nt - 1 - i, :] for i in range(nt)]
    return jnp.concatenate(parts, axis=-1)


@functools.lru_cache(maxsize=16)
def _tangle_tables(m: int, dtype: str):
    """Conjugate half twiddle e^{+2 pi i k/m} for the irfft re-tangle."""
    twr, twi = F._half_twiddle(m, dtype)
    return twr[None, :], (-twi)[None, :]


def irfft_hc_tail_pallas(hr: jax.Array, hi: jax.Array, n: int, *,
                         rows_per_tile: int = 256,
                         interpret: bool = False) -> jax.Array:
    """``ops.fft.irfft_hc_tail``-equivalent (the overlap-save engine's
    inverse: keep only samples [n/2, n)) as ONE Pallas kernel.

    vs the production half-DFT tail basis (one [.., h] @ [h, h] matmul
    pair = 4·h² real MACs/row) this runs the inverse four-step on the
    re-tangled half-length complex sequence — 4·2·h·(h/4) = 2·h² MACs/row,
    half the MXU work — with the tangle, butterflies, interleave and tail
    selection all VMEM-resident. Same numerics class as
    ops.fft.irfft_split_tail; subject to the absolute-verification protocol
    before any engine wiring (that sliced four-step family has a known
    miscompile history on this backend — CLAUDE.md).
    """
    from jax.experimental import pallas as pl

    m = n
    h = m // 2
    n1 = h // 4
    if m & (m - 1) or n1 < 128:
        raise ValueError(f"irfft_hc_tail_pallas needs pow2 n with n//8 >= 128, got {m}")
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
    wr, wi = F._r4_folded_weights(h, dt, inverse=True)  # [4, n1, n1] raw
    twr, twi = _tangle_tables(m, dt)

    prec = F._MATMUL_PRECISION

    def kernel(hr_ref, hi_ref, br_ref, bi_ref, twr_ref, twi_ref, j_ref, o_ref):
        xr_k = hr_ref[...]  # [tr, h]; lane 0 = DC.re
        xi_k = hi_ref[...]  # lane 0 = Nyquist.re
        # split planes -> full-spectrum A/D terms. X[h-k] for k=1..h-1 is
        # flip+roll; lane 0 needs (DC, Ny) special handling:
        #   A[0] = (DC + Ny)/2, D[0] = (DC - Ny)/2  (real)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, xr_k.shape, 1) == 0
        dc = xr_k[:, :1]
        ny = xi_k[:, :1]
        # X[k] true planes for k >= 1: (xr_k, xi_k); X[0] = DC, X[h] = Ny
        jmat = j_ref[...]
        xr_rev = jnp.roll(_flip_lanes(xr_k, jmat), 1, axis=-1)  # X[h-k].re, k>=1
        xi_rev = jnp.roll(_flip_lanes(xi_k, jmat), 1, axis=-1)
        # at k=0 the rev lanes hold X[h-0]=X[h]: real = Ny, imag = 0
        xr_rev = jnp.where(lane0, jnp.broadcast_to(ny, xr_k.shape), xr_rev)
        xi_rev = jnp.where(lane0, 0.0, xi_rev)
        xi_true = jnp.where(lane0, 0.0, xi_k)
        xr_true = jnp.where(lane0, jnp.broadcast_to(dc, xr_k.shape), xr_k)
        ar = 0.5 * (xr_true + xr_rev)
        ai = 0.5 * (xi_true - xi_rev)
        dr = 0.5 * (xr_true - xr_rev)
        di = 0.5 * (xi_true + xi_rev)
        tw_r = twr_ref[...]
        tw_i = twi_ref[...]
        er = tw_r * dr - tw_i * di
        ei = tw_r * di + tw_i * dr
        zr = ar - ei
        zi = ai + er
        # inverse four-step over z (length h): stage 1 batched over j2
        z4r = zr.reshape(tr, n1, 4)
        z4i = zi.reshape(tr, n1, 4)
        ts = []
        for j2 in range(4):
            zjr = z4r[:, :, j2]
            zji = z4i[:, :, j2]
            br = br_ref[j2]
            bi = bi_ref[j2]
            ts.append((jnp.dot(zjr, br, precision=prec)
                       - jnp.dot(zji, bi, precision=prec),
                       jnp.dot(zjr, bi, precision=prec)
                       + jnp.dot(zji, br, precision=prec)))
        (t0r, t0i), (t1r, t1i), (t2r, t2i), (t3r, t3i) = ts
        er_, ei_ = t0r + t2r, t0i + t2i
        fr_, fi_ = t0r - t2r, t0i - t2i
        gr_, gi_ = t1r + t3r, t1i + t3i
        hr_, hi_ = t1r - t3r, t1i - t3i
        whr, whi = -hi_, hr_  # +i * (h): inverse butterfly
        s = 1.0 / h
        # tail only: output sample index t = m/2 + .. corresponds to
        # z index i = t/2 >= h/2, i.e. i2 in {2, 3}
        x2r, x2i = (er_ - gr_) * s, (ei_ - gi_) * s
        x3r, x3i = (fr_ - whr) * s, (fi_ - whi) * s
        # interleave re/im and the two i2 branches:
        # out[2*(i2*n1 + i1) - m/2 ...]: for i2=2: samples [0, 2*n1) of the
        # tail; i2=3: samples [2*n1, 4*n1). Within a branch, sample pair
        # (2*i1, 2*i1+1) = (re, im)
        a2 = jnp.stack([x2r, x2i], axis=-1).reshape(tr, 2 * n1)
        a3 = jnp.stack([x3r, x3i], axis=-1).reshape(tr, 2 * n1)
        o_ref[...] = jnp.concatenate([a2, a3], axis=-1)

    grid = (rp // tr,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
            pl.BlockSpec((tr, h), lambda i: (i, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((tr, h), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((rp, h), hr2.dtype)],
        interpret=interpret,
    )(hr2, hi2, jnp.asarray(wr), jnp.asarray(wi),
      jnp.asarray(twr), jnp.asarray(twi), jnp.asarray(_rev_matrix(128, dt)))[0]
    return out[:r].reshape(*batch, h)


def rfft_hc_pallas(x: jax.Array, n: int | None = None, *,
                   rows_per_tile: int = 256,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """rfft over the last axis -> packed halfcomplex planes (hr, hi), each
    [..., h = n//2]; lane 0 = (DC.re, Nyquist.re) (ops.fft.rfft_split_hc
    convention, = FFTW's halfcomplex r2r layout, fftw_convolver.cpp:76-79).

    Requires n a power of two with n//8 >= 128 (full-width stage-1
    contraction). Rows are tiled over the grid; weights stay resident.
    """
    from jax.experimental import pallas as pl

    m = n or x.shape[-1]
    h = m // 2
    n1 = h // 4
    if m & (m - 1) or n1 < 128:
        raise ValueError(f"rfft_hc_pallas needs pow2 n with n//8 >= 128, got {m}")
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
    wr, wi = F._r4_folded_weights(h, dt, inverse=False)  # [4, n1, n1]
    twr, twi = _untangle_tables(m, dt)

    prec = F._MATMUL_PRECISION

    def kernel(x_ref, br_ref, bi_ref, twr_ref, twi_ref, j_ref, hr_ref, hi_ref):
        xt = x_ref[...]  # [tr, m]
        x4 = xt.reshape(tr, n1, 8)  # j = j1*8 + (2*j2 + re/im)
        outs = []
        for j2 in range(4):
            zr = x4[:, :, 2 * j2]
            zi = x4[:, :, 2 * j2 + 1]
            br = br_ref[j2]
            bi = bi_ref[j2]
            trr = (jnp.dot(zr, br, precision=prec)
                   - jnp.dot(zi, bi, precision=prec))
            tii = (jnp.dot(zr, bi, precision=prec)
                   + jnp.dot(zi, br, precision=prec))
            outs.append((trr, tii))
        (t0r, t0i), (t1r, t1i), (t2r, t2i), (t3r, t3i) = outs
        er, ei = t0r + t2r, t0i + t2i
        fr_, fi_ = t0r - t2r, t0i - t2i
        gr_, gi_ = t1r + t3r, t1i + t3i
        hr_, hi_ = t1r - t3r, t1i - t3i
        whr, whi = hi_, -hr_  # -i * (h)
        # Z in output order k = k2*n1 + k1: concat along lanes
        zr_ = jnp.concatenate([er + gr_, fr_ + whr, er - gr_, fr_ - whr],
                              axis=-1)  # [tr, h]
        zi_ = jnp.concatenate([ei + gi_, fi_ + whi, ei - gi_, fi_ - whi],
                              axis=-1)
        # untangle: X[k] = A[k] + W[k] B[k] with A/B from Z[k], Z*[h-k];
        # Z[h-k] = roll(flip(Z), 1) along lanes
        jmat = j_ref[...]
        zr_rev = jnp.roll(_flip_lanes(zr_, jmat), 1, axis=-1)
        zi_rev = jnp.roll(_flip_lanes(zi_, jmat), 1, axis=-1)
        ar = 0.5 * (zr_ + zr_rev)
        ai = 0.5 * (zi_ - zi_rev)
        br_ = 0.5 * (zi_ + zi_rev)
        bi_ = -0.5 * (zr_ - zr_rev)
        tw_r = twr_ref[...]
        tw_i = twi_ref[...]
        xr = ar + tw_r * br_ - tw_i * bi_
        xi = ai + tw_r * bi_ + tw_i * br_
        # hc pack: lane 0 of the im plane carries Nyquist.re = Re Z0 - Im Z0
        lane0 = jax.lax.broadcasted_iota(jnp.int32, (tr, h), 1) == 0
        ny = jnp.broadcast_to(zr_[:, :1] - zi_[:, :1], (tr, h))
        hr_ref[...] = xr  # xr[...,0] is already DC.re (A0 + B0 = Re Z0 + Im Z0)
        hi_ref[...] = jnp.where(lane0, ny, xi)

    grid = (rp // tr,)
    hr, hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((4, n1, n1), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
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
    )(x2, jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(twr), jnp.asarray(twi),
      jnp.asarray(_rev_matrix(128, dt)))
    hr = hr[:r].reshape(*batch, h)
    hi = hi[:r].reshape(*batch, h)
    return hr, hi
