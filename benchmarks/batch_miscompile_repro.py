"""Minimal repro for the axon large-shape batch MISCOMPILE class
(VERDICT r3 weak #7: the production guard — bench.py's scipy check and the
session self-check — trips on it, but no committed artifact reproduces the
backend bug itself for future rounds / a fixed backend to re-probe).

The characterized failure (2026-08-18, core/convolver.process_batch
docstring): ``process_batch`` at B=256/C=64/P=128 (also 256/32, 128/128)
produced DETERMINISTIC, bit-identical wrong results (~4 dB SNR vs scipy).
RE-PROBED 2026-08-21 (MISCOMPILE_r04.json): the class SHIFTED with a
backend update — 256/64 and 256/32 are now exact while 128/128/128 is
wrong (3.8 dB) and NON-deterministic. Conclusion: the failing-shape set is
a property of the PJRT plugin build and moves with it; a static shape cap
is necessary but not sufficient, and the runtime guards (bench scipy
check, session self-check with plugin-version-keyed verdict cache) are
the real defense.

Run:  python benchmarks/batch_miscompile_repro.py [--quick]

Prints one JSON line per probed geometry {B, C, P, snr_db, determinism}
plus a summary. On a fixed backend every row reads > 100 dB and
``still_miscompiles`` goes false — that is the signal to re-evaluate the
B=240 cap (core/convolver.py) and re-wire the faster sliced-transform
variants listed in PARITY.md. Each geometry runs in a subprocess under a
timeout so a wedged tunnel cannot hang the probe. CPU sanity:
``--cpu`` runs the same geometries on the CPU backend (all exact).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# (B, C, P): the characterized-bad shapes + the good neighbor
GEOMETRIES = [(240, 64, 128), (256, 64, 128), (256, 32, 128), (128, 128, 128)]
QUICK = [(240, 64, 128), (256, 64, 128)]


def child(b: int, c: int, p: int):
    import jax

    if os.environ.get("BFIR_BATCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy import signal

    from bfir_tpu.core import convolver as cv
    from bfir_tpu.core.spec import FilterSpec

    n = 1024
    spec = FilterSpec(block_length=n, n_partitions=p, dtype="float32")
    rng = np.random.default_rng(0)
    h = (rng.standard_normal((c, spec.max_taps)) *
         np.exp(-np.arange(spec.max_taps) / 20000.0)).astype(np.float32) * 0.05
    co = cv.coeffs_to_spectra(h, spec)
    g = jax.jit(lambda st, co_, blk: cv.process_batch(st, co_, blk))
    xs = rng.standard_normal((b, c, n)).astype(np.float32)
    t0 = time.time()
    _, o1 = g(cv.init_state(spec, c), co, jnp.asarray(xs))
    y1 = np.asarray(o1)
    compile_s = time.time() - t0
    # determinism: the documented failure is bit-identical across runs
    _, o2 = g(cv.init_state(spec, c), co, jnp.asarray(xs))
    deterministic = bool(np.array_equal(y1, np.asarray(o2)))
    y = y1.transpose(1, 0, 2).reshape(c, -1).astype(np.float64)
    flat = xs.transpose(1, 0, 2).reshape(c, -1).astype(np.float64)
    ref = signal.fftconvolve(flat, h.astype(np.float64), axes=1)[:, : y.shape[1]]
    snr = min(
        10 * np.log10(float((ref[ch] ** 2).sum())
                      / max(float(((y[ch] - ref[ch]) ** 2).sum()), 1e-300))
        for ch in range(c))
    print(json.dumps({"B": b, "C": c, "P": p, "snr_db": round(snr, 1),
                      "deterministic": deterministic,
                      "compile_s": round(compile_s, 1),
                      "backend": jax.default_backend()}))


def main():
    if os.environ.get("BFIR_BATCH_PROBE"):
        b, c, p = (int(v) for v in os.environ["BFIR_BATCH_PROBE"].split(","))
        child(b, c, p)
        return
    geoms = QUICK if "--quick" in sys.argv else GEOMETRIES
    results = []
    for b, c, p in geoms:
        env = dict(os.environ)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        env["BFIR_BATCH_PROBE"] = f"{b},{c},{p}"
        if "--cpu" in sys.argv:
            env["BFIR_BATCH_CPU"] = "1"
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=1200)
            lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
            res = (json.loads(lines[-1]) if lines else
                   {"B": b, "C": c, "P": p, "error": (r.stderr or "")[-200:]})
        except subprocess.TimeoutExpired:
            res = {"B": b, "C": c, "P": p, "error": "timeout"}
        results.append(res)
        print(json.dumps(res), flush=True)
    bad = [r for r in results if r.get("snr_db", 999) < 80]
    errs = [r for r in results if "snr_db" not in r]
    fixed = not bad and not errs
    print(json.dumps({
        "summary": True,
        "still_miscompiles": bool(bad),
        "probe_errors": len(errs),
        "bad_geometries": [[r["B"], r["C"], r["P"]] for r in bad],
        "note": ("B=240 cap in core/convolver.py stays" if (bad or errs) else
                 "backend appears FIXED: re-evaluate the B=240 cap and the "
                 "unwired sliced-transform variants (PARITY.md)"),
    }))


if __name__ == "__main__":
    main()
