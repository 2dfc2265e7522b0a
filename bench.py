"""Benchmark harness: the BASELINE.json headline workload.

Measures streaming throughput of the partitioned convolution engine at
64 channels x 131072 taps (128 partitions x 1024-sample blocks, float32) on
one chip, and prints ONE JSON line:

    {"metric": ..., "value": samples/s, "unit": "samples/s", "vs_baseline": x}

"value" counts total audio samples (frames x channels) convolved per second.
The reference publishes no numbers (BASELINE.md), so "vs_baseline" is the
real-time factor for the workload: value / (44100 Hz * 64 ch) — how many
times faster than real-time one chip runs the full 64-channel 131072-tap
correction. >1.0 means the chip keeps up.

Extra diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from bfir_tpu.core import convolver as cv
    from bfir_tpu.core.spec import FilterSpec

    backend = jax.default_backend()
    dev = jax.devices()[0]
    log(f"backend={backend} device={dev}")

    channels = 64
    block = 1024
    partitions = 128  # 131072 taps
    spec = FilterSpec(block_length=block, n_partitions=partitions, dtype="float32")

    rng = np.random.default_rng(0)
    h = (rng.standard_normal((channels, spec.max_taps)) *
         np.exp(-np.arange(spec.max_taps) / 8000.0)).astype(np.float32) * 0.02

    state = cv.init_state(spec, channels)
    coeffs = cv.coeffs_to_spectra(h, spec)
    step = jax.jit(cv.step_rolled, donate_argnums=0)

    x = jax.numpy.asarray(rng.standard_normal((channels, block)).astype(np.float32))

    t0 = time.time()
    state, out = step(state, coeffs, x)
    out.block_until_ready()
    log(f"first step (compile): {time.time()-t0:.1f}s")

    # correctness spot check against scipy on the warmed state
    # (cheap: one extra block on host)
    # timing: run a stream of blocks back-to-back
    n_iters = 200 if backend != "cpu" else 20
    t0 = time.time()
    for _ in range(n_iters):
        state, out = step(state, coeffs, x)
    out.block_until_ready()
    dt = time.time() - t0
    frames = n_iters * block
    samples_per_s = frames * channels / dt
    block_ms = dt / n_iters * 1e3
    log(f"{n_iters} blocks in {dt:.3f}s -> {block_ms:.3f} ms/block, "
        f"{samples_per_s/1e6:.1f} M samples/s")

    realtime = 44100.0 * channels
    print(json.dumps({
        "metric": "audio samples/sec/chip, 64ch x 131072-tap partitioned conv "
                  f"(streaming 1024-block, float32, {backend})",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / realtime, 2),
    }))


if __name__ == "__main__":
    main()
