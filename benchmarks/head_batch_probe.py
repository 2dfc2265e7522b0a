"""Premise probe for the batched-head macro schedule (round 5).

In the throughput (macro-scan) paths the head stage still dispatches one
[C, 2N] transform chain per block, which fills the MXU poorly at C=64
rows (fft microbench: 0.23 matmul-work roofline at [64,2048] vs 0.51 at
bulk shapes).  Since every block of an M-cycle is available in bulk mode,
the head's R forward transforms / MACs / inverses can each run as ONE
batched dispatch per cycle ([R*C, 2N] = [512, 2048] at the flagship
geometry), and the head coefficient planes are then read once per cycle
instead of once per block.

This probe measures, with the differential scan protocol (CLAUDE.md):
  1. rfft_split_hc at [64, 2048] vs [512, 2048]
  2. irfft_hc_tail (the direct half-DFT tail matmul) at 64 vs 512 rows
  3. the per-block Pallas head MAC (8x) vs a batched shifted-sum MAC
     over a [15, 2C, Hp] spectrum history (one pass per cycle)

If (batched cost)/R is well under the per-block cost, the batched-head
macro scan is worth building.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bfir_tpu.ops import fft as F
    from bfir_tpu.kernels import spectrum_mac as K
    from bfir_tpu.core.spec import FilterSpec

    on_cpu = jax.default_backend() == "cpu"
    C, N, R, P = 64, 1024, 8, 8
    HP = N  # lane-rounded halfcomplex plane width at N=1024
    k1, k2 = (2, 4) if on_cpu else (64, 576)
    n_draws = 2 if on_cpu else 6

    def timed_scan(fn, init, label, k2_override=None):
        kk2 = k2_override or k2
        def mk(kk):
            return jax.jit(lambda x0: lax.scan(lambda x, _: (fn(x), None),
                                               x0, None, length=kk)[0])
        g1, g2 = mk(k1), mk(kk2)
        y = g2(g1(init))
        jax.block_until_ready(y)

        def best(g):
            nonlocal y
            ts = []
            for _ in range(n_draws):
                t0 = time.time()
                y = g(y)
                float(jnp.sum(jax.tree_util.tree_leaves(y)[0].ravel()[:1]))
                ts.append(time.time() - t0)
            return float(np.min(ts))

        t = max((best(g2) - best(g1)) / (kk2 - k1), 1e-9)
        print(f"{label}: {t*1e6:.1f} us/iter (differential {k1}/{kk2} scan)")
        return t

    rng = np.random.default_rng(3)

    # --- 1. forward transform, 64 vs 512 rows -----------------------------
    def fwd_body(rows):
        def body(x):
            hr, hi = F.rfft_split_hc(x)
            return jnp.concatenate([hr[:, :N], hi[:, :N]], axis=-1)
        return body, jnp.asarray(
            rng.standard_normal((rows, 2 * N)).astype(np.float32))

    b64, x64 = fwd_body(C)
    b512, x512 = fwd_body(R * C)
    t_f64 = timed_scan(b64, x64, "fwd rfft_split_hc [64,2048]")
    t_f512 = timed_scan(b512, x512, "fwd rfft_split_hc [512,2048]")
    print(f"  -> batched fwd per-block: {t_f512/R*1e6:.1f} us "
          f"(vs {t_f64*1e6:.1f} per-block)")

    # --- 2. direct-tail inverse, 64 vs 512 rows ---------------------------
    def inv_body(rows):
        def body(c):
            yr, yi = c[:, :HP], c[:, HP:]
            out = F.irfft_hc_tail(yr, yi, n=2 * N)
            return jnp.concatenate([out, yr[:, :N] * 1e-6 + out * 0.5],
                                   axis=-1)
        return body, jnp.asarray(
            rng.standard_normal((rows, 2 * HP)).astype(np.float32))

    i64, y64 = inv_body(C)
    i512, y512 = inv_body(R * C)
    t_i64 = timed_scan(i64, y64, "inv irfft_hc_tail [64 rows]")
    t_i512 = timed_scan(i512, y512, "inv irfft_hc_tail [512 rows]")
    print(f"  -> batched inv per-block: {t_i512/R*1e6:.1f} us "
          f"(vs {t_i64*1e6:.1f} per-block)")

    # also: the four-step inverse+slice form at 512 rows (matmul-lean)
    def inv4_body(rows):
        def body(c):
            yr, yi = c[:, :HP], c[:, HP:]
            out = F.irfft_split_hc(yr, yi, n=2 * N)[..., N:]
            return jnp.concatenate([out, yr[:, :N] * 1e-6 + out * 0.5],
                                   axis=-1)
        return body, jnp.asarray(
            rng.standard_normal((rows, 2 * HP)).astype(np.float32))

    i4_512, y4 = inv4_body(R * C)
    t_i4 = timed_scan(i4_512, y4, "inv four-step+slice [512 rows]")
    print(f"  -> batched four-step inv per-block: {t_i4/R*1e6:.1f} us")

    # --- 3. head MAC: per-block Pallas vs batched shifted-sum -------------
    spec = FilterSpec(block_length=N, n_partitions=P, dtype="float32")
    h = (rng.standard_normal((C, P * N)) *
         np.exp(-np.arange(P * N) / 20000.0)).astype(np.float32) * 0.05
    chc = K.hc_coeffs(h, spec, C)  # [P, 2C, HP]
    state = K.init_hc_state(spec, C)
    ring0 = jnp.asarray(
        rng.standard_normal(state.ring.shape).astype(np.float32))

    def mac_block(carry):
        ring, pos = carry
        yr, yi = K.mac_pallas_hc(ring, chc, pos, interpret=on_cpu)
        xpk = jnp.concatenate([yr, yi], axis=0)[None] * 1e-6
        ring = lax.dynamic_update_slice(
            ring, xpk.astype(ring.dtype) +
            lax.dynamic_slice(ring, (pos % P, 0, 0), (1,) + ring.shape[1:]),
            (pos % P, 0, 0))
        return ring, pos + 1

    t_mac1 = timed_scan(mac_block, (ring0, jnp.int32(0)),
                        "per-block Pallas head MAC [8,128,1024]")

    # batched: history [P-1+R, 2C, HP] -> R outputs in one fused pass
    hist0 = jnp.asarray(
        rng.standard_normal((P - 1 + R, 2 * C, HP)).astype(np.float32))
    cr, ci = chc[:, :C], chc[:, C:]

    def mac_cycle(hist):
        # out[b] = sum_p coeff[p] (*) hist[b + (P-1) - p], complex on
        # packed planes; shifted windows, XLA fuses into one pass
        outs_r, outs_i = [], []
        for b in range(R):
            ar = jnp.zeros((C, HP), jnp.float32)
            ai = jnp.zeros((C, HP), jnp.float32)
            for p in range(P):
                hr = hist[b + P - 1 - p, :C]
                hi = hist[b + P - 1 - p, C:]
                ar = ar + cr[p] * hr - ci[p] * hi
                ai = ai + cr[p] * hi + ci[p] * hr
            outs_r.append(ar)
            outs_i.append(ai)
        new = jnp.concatenate(
            [jnp.stack(outs_r + outs_i)[:P - 1 + R, 0:1, :] * 1e-6], axis=1)
        return hist * 0.999999 + jnp.pad(
            new, ((0, 0), (0, 2 * C - 1), (0, 0)))

    t_macb = timed_scan(mac_cycle, hist0,
                        "batched head MAC cycle [15,128,1024]",
                        k2_override=(4 if on_cpu else 192))
    print(f"  -> batched MAC per-block: {t_macb/R*1e6:.1f} us "
          f"(vs {t_mac1*1e6:.1f} per-block)")

    per_block_now = t_f64 + t_i64 + t_mac1
    per_block_batched = (t_f512 + min(t_i512, t_i4) + t_macb) / R
    print(f"head per-block, current path:  {per_block_now*1e6:.1f} us")
    print(f"head per-block, batched cycle: {per_block_batched*1e6:.1f} us")
    print(f"projected macro-floor saving:  "
          f"{(per_block_now - per_block_batched)*1e6:.1f} us/block")


if __name__ == "__main__":
    main()
