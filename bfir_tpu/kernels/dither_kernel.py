"""Pallas TPU kernel for the hp-TPDF requantizer loop.

The {1,-1} error feedback (dither.cpp:154-161) is inherently sequential per
sample; the jnp path runs it as a 1024-step ``lax.scan`` whose per-iteration
XLA while-loop overhead dominates on TPU. This kernel runs the same loop as
a single on-chip ``fori_loop`` over VMEM-resident columns — identical
semantics (same dither values in, same trunc-and-clip law, same overflow
accounting) with no host/HLO loop overhead.

The dither values are precomputed outside (ops.dither's byte-difference
randmap closed form) so the kernel is a pure deterministic function and the
jnp and Pallas paths can be tested for exact agreement.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_hp_tpdf_pallas(
    x: jax.Array,  # [C, N] scaled to integer domain
    dither_vals: jax.Array,  # [C, N]
    e0: jax.Array,  # [C]
    e1: jax.Array,  # [C]
    imin: float,
    imax: float,
    n_overflows: jax.Array,  # [C] int32
    largest: jax.Array,  # [C]
    intlargest: jax.Array,  # [C] int32
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (q [C, N] int32, e0', e1', n_overflows', largest', intlargest')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, n = x.shape
    dt = x.dtype

    imin_a = jnp.full((c, 1), imin, dtype=dt)
    imax_a = jnp.full((c, 1), imax, dtype=dt)

    def kernel(x_ref, dv_ref, e0_ref, e1_ref, imin_ref, imax_ref,
               nof_ref, lg_ref, ilg_ref,
               q_ref, e0_out, e1_out, nof_out, lg_out, ilg_out):
        lo = imin_ref[:]
        hi = imax_ref[:]

        def body(t, carry):
            e0v, e1v, nof, lg, ilg = carry
            xs = x_ref[:, t][:, None]
            dv = dv_ref[:, t][:, None]
            xp = xs + e0v - e1v
            d = xp + dv
            q = jnp.where(d < 0, jnp.ceil(d) - 1.0, jnp.floor(d))
            clip_lo = d <= lo
            clip_hi = d > hi
            clipped = clip_lo | clip_hi
            q = jnp.where(clip_lo, lo, jnp.where(clip_hi, hi, q))
            nof = nof + clipped.astype(jnp.int32)
            lg = jnp.where(clipped, jnp.maximum(lg, jnp.abs(d)), lg)
            ilg = jnp.where(clipped, ilg,
                            jnp.maximum(ilg, jnp.abs(q).astype(jnp.int32)))
            q_ref[:, t] = q.astype(jnp.int32)[:, 0]
            return (xp - q, e0v, nof, lg, ilg)

        init = (e0_ref[:], e1_ref[:], nof_ref[:].astype(jnp.int32),
                lg_ref[:], ilg_ref[:].astype(jnp.int32))
        e0v, e1v, nof, lg, ilg = jax.lax.fori_loop(0, n, body, init)
        e0_out[:] = e0v
        e1_out[:] = e1v
        nof_out[:] = nof
        lg_out[:] = lg
        ilg_out[:] = ilg

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    q, e0o, e1o, nofo, lgo, ilgo = pl.pallas_call(
        kernel,
        in_specs=[vm() for _ in range(9)],
        out_specs=[vm() for _ in range(6)],
        out_shape=[
            jax.ShapeDtypeStruct((c, n), jnp.int32),
            jax.ShapeDtypeStruct((c, 1), dt),
            jax.ShapeDtypeStruct((c, 1), dt),
            jax.ShapeDtypeStruct((c, 1), jnp.int32),
            jax.ShapeDtypeStruct((c, 1), dt),
            jax.ShapeDtypeStruct((c, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        x, dither_vals, e0[:, None], e1[:, None], imin_a, imax_a,
        n_overflows[:, None], largest[:, None], intlargest[:, None],
    )
    return q, e0o[:, 0], e1o[:, 0], nofo[:, 0], lgo[:, 0], ilgo[:, 0]
