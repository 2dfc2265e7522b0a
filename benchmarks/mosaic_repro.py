"""Minimal repros for the axon remote Mosaic compile-helper crashes
(VERDICT r3 next #3: commit the repro so future rounds — or a fixed
backend — can re-probe in one command).

Each probe is a tiny standalone Pallas TPU kernel exercising ONE primitive
pattern that kernels/fft_pallas.py needs. Run:

    python benchmarks/mosaic_repro.py            # probe all on the TPU
    python benchmarks/mosaic_repro.py --cpu      # interpret-mode sanity

Each probe compiles in its own SUBPROCESS under a timeout: a crashing
compile (HTTP 500 from tpu_compile_helper, observed 2026-08-21) or a hang
cannot take down the matrix. Output: one JSON line per probe
{"probe": ..., "status": "ok" | "compile-error" | "timeout", "detail": ...}
plus a summary line. Status quo on the axon backend (re-probed
2026-08-21 r4, refining the r3 notes):

    ok:     lane_concat, roll, dot_256, dot_1024, iota_where,
            reshape_lane128 ([r,h]->[r,h/128,128]), dot3d_128
    CRASH:  reshape_minor ([r,h]->[r,h/8,8]), stack_reshape (interleave),
            strided_store (o[:, 0::2] = x), concat_mid (concat of
            middle-axis slices — this is what breaks flip_matmul, NOT the
            lane reshape or the 3-D dot, which both compile)
    client: strided_read (x[:, 0::8]) fails before the helper is reached

The crash set is the interleave/deinterleave + tile-permutation family —
see kernels/fft_pallas.py for the fully-fused kernels blocked on it and
kernels/fft_fused.py for the partial-fusion formulation that avoids every
crashing op (flip folded into column-flipped weights; interleaves hoisted
to XLA).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

PROBES = ["lane_concat", "roll", "flip_matmul", "dot_256", "iota_where",
          "reshape_minor", "stack_reshape", "strided_store", "strided_read",
          "reshape_lane128", "dot3d_128", "dot_1024", "concat_mid",
          "dot3d_mid", "transpose_minor2"]


def build(probe: str, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    r, h = 8, 512

    def call(kernel, out_shape=(r, h)):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((r, h), lambda: (0, 0))],
            out_specs=pl.BlockSpec(out_shape, lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            interpret=interpret,
        )

    if probe == "lane_concat":
        def k(x_ref, o_ref):
            x = x_ref[...]
            o_ref[...] = jnp.concatenate([x[:, : h // 2], x[:, h // 2 :]],
                                         axis=-1)
        return call(k)
    if probe == "roll":
        def k(x_ref, o_ref):
            o_ref[...] = jnp.roll(x_ref[...], 1, axis=-1)
        return call(k)
    if probe == "flip_matmul":
        j = np.zeros((128, 128), np.float32)
        j[np.arange(128), 127 - np.arange(128)] = 1.0

        def k(x_ref, j_ref, o_ref):
            x = x_ref[...].reshape(r, h // 128, 128)
            rev = jax.lax.dot_general(x, j_ref[...], (((2,), (0,)), ((), ())))
            o_ref[...] = jnp.concatenate(
                [rev[:, h // 128 - 1 - i, :] for i in range(h // 128)],
                axis=-1)
        f = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec((r, h), lambda: (0, 0)),
                      pl.BlockSpec((128, 128), lambda: (0, 0))],
            out_specs=pl.BlockSpec((r, h), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((r, h), jnp.float32),
            interpret=interpret,
        )
        return lambda x: f(x, jnp.asarray(j))
    if probe == "dot_256":
        def k(x_ref, w_ref, o_ref):
            o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                                 precision=jax.lax.Precision.HIGHEST)
        f = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec((r, h), lambda: (0, 0)),
                      pl.BlockSpec((h, h), lambda: (0, 0))],
            out_specs=pl.BlockSpec((r, h), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((r, h), jnp.float32),
            interpret=interpret,
        )
        return lambda x: f(x, jnp.ones((h, h), jnp.float32) / h)
    if probe == "iota_where":
        def k(x_ref, o_ref):
            x = x_ref[...]
            lane0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == 0
            o_ref[...] = jnp.where(lane0, 0.0, x)
        return call(k)
    if probe == "reshape_minor":
        def k(x_ref, o_ref):
            x3 = x_ref[...].reshape(r, h // 8, 8)  # minor-dim split
            o_ref[...] = (x3 * 2.0).reshape(r, h)
        return call(k)
    if probe == "stack_reshape":
        def k(x_ref, o_ref):
            x = x_ref[...]
            a, b = x[:, : h // 2], x[:, h // 2 :]
            o_ref[...] = jnp.stack([a, b], axis=-1).reshape(r, h)  # interleave
        return call(k)
    if probe == "strided_store":
        def k(x_ref, o_ref):
            x = x_ref[...]
            o_ref[:, 0::2] = x[:, : h // 2]
            o_ref[:, 1::2] = x[:, h // 2 :]
        return call(k)
    if probe == "strided_read":
        def k(x_ref, o_ref):
            x = x_ref[...]
            part = x[:, 0::8]  # [r, h//8]
            o_ref[...] = jnp.concatenate([part] * 8, axis=-1)
        return call(k)
    if probe == "reshape_lane128":
        # isolates flip_matmul's first half: lane-width split only
        def k(x_ref, o_ref):
            x3 = x_ref[...].reshape(r, h // 128, 128)
            o_ref[...] = (x3 * 2.0).reshape(r, h)
        return call(k)
    if probe == "dot3d_128":
        # isolates flip_matmul's second half: 3-D dot_general over lanes
        j = np.eye(128, dtype=np.float32)

        def k(x_ref, j_ref, o_ref):
            x = x_ref[...].reshape(r, h // 128, 128)
            y = jax.lax.dot_general(x, j_ref[...], (((2,), (0,)), ((), ())))
            o_ref[...] = y.reshape(r, h)
        f = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec((r, h), lambda: (0, 0)),
                      pl.BlockSpec((128, 128), lambda: (0, 0))],
            out_specs=pl.BlockSpec((r, h), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((r, h), jnp.float32),
            interpret=interpret,
        )
        return lambda x: f(x, jnp.asarray(j))
    if probe == "dot_1024":
        # large flat weight: an [h, h] exchange-matrix flip alternative
        def k(x_ref, w_ref, o_ref):
            o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                                 precision=jax.lax.Precision.HIGHEST)
        hh = 1024
        f = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec((r, hh), lambda: (0, 0)),
                      pl.BlockSpec((hh, hh), lambda: (0, 0))],
            out_specs=pl.BlockSpec((r, hh), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((r, hh), jnp.float32),
            interpret=interpret,
        )
        j = np.zeros((1024, 1024), np.float32)
        j[np.arange(1024), 1023 - np.arange(1024)] = 1.0
        return lambda x: f(jnp.concatenate([x, x], axis=-1), jnp.asarray(j))
    if probe == "dot3d_mid":
        # contraction over the MIDDLE axis of a 3-D operand: the balanced
        # four-step's stage-1 DFT ([r, n1, n2] x [n1, k1] over axis 1)
        j = np.eye(64, dtype=np.float32)

        def k(x_ref, j_ref, o_ref):
            x = x_ref[...].reshape(r, h // 128, 128)  # [8, 4, 128]
            w = j_ref[...][: h // 128, : h // 128]
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())))
            # y: [r, 128, h//128] -> flatten via lane concat of last-dim slices
            o_ref[...] = jnp.concatenate(
                [y[:, :, i] for i in range(h // 128)], axis=-1)
        f = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec((r, h), lambda: (0, 0)),
                      pl.BlockSpec((64, 64), lambda: (0, 0))],
            out_specs=pl.BlockSpec((r, h), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((r, h), jnp.float32),
            interpret=interpret,
        )
        return lambda x: f(x, jnp.asarray(j))
    if probe == "transpose_minor2":
        # swap of the two minor axes ([r, a, b] -> [r, b, a])
        def k(x_ref, o_ref):
            x = x_ref[...].reshape(r, h // 128, 128)
            y = jnp.swapaxes(x, -1, -2)  # [r, 128, h//128]
            o_ref[...] = y.reshape(r, h)
        return call(k)
    if probe == "concat_mid":
        # isolates flip_matmul's third ingredient: concat of middle-axis
        # slices in reversed order
        def k(x_ref, o_ref):
            x3 = x_ref[...].reshape(r, h // 128, 128)
            nt = h // 128
            o_ref[...] = jnp.concatenate(
                [x3[:, nt - 1 - i, :] for i in range(nt)], axis=-1)
        return call(k)
    raise ValueError(probe)


def run_one(probe: str, interpret: bool):
    import jax
    import jax.numpy as jnp

    fn = build(probe, interpret)
    x = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    t0 = time.time()
    y = jax.jit(fn)(x)
    jax.block_until_ready(y)
    return time.time() - t0


def main():
    if os.environ.get("BFIR_MOSAIC_PROBE"):
        probe = os.environ["BFIR_MOSAIC_PROBE"]
        interpret = os.environ.get("BFIR_MOSAIC_CPU") == "1"
        if interpret:
            import jax

            jax.config.update("jax_platforms", "cpu")
        try:
            dt = run_one(probe, interpret)
            print(json.dumps({"probe": probe, "status": "ok",
                              "compile_s": round(dt, 1)}))
        except Exception as e:
            print(json.dumps({"probe": probe, "status": "compile-error",
                              "detail": f"{type(e).__name__}: {e}"[:300]}))
        return

    cpu = "--cpu" in sys.argv
    results = []
    for probe in PROBES:
        env = dict(os.environ)
        env["BFIR_MOSAIC_PROBE"] = probe
        if cpu:
            env["BFIR_MOSAIC_CPU"] = "1"
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=600)
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            res = (json.loads(line[-1]) if line else
                   {"probe": probe, "status": "compile-error",
                    "detail": (r.stderr or "no output")[-300:]})
        except subprocess.TimeoutExpired:
            res = {"probe": probe, "status": "timeout"}
        results.append(res)
        print(json.dumps(res), flush=True)
    ok = [r["probe"] for r in results if r["status"] == "ok"]
    bad = [r["probe"] for r in results if r["status"] != "ok"]
    print(json.dumps({"summary": True, "ok": ok, "failing": bad}))


if __name__ == "__main__":
    main()
