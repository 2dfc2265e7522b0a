"""Benchmark harness: the BASELINE.json headline workload.

Measures the partitioned convolution engine at 64 channels x 131072 taps
(128 partitions x 1024-sample blocks, float32) on one chip and prints ONE
JSON line. Two paths are measured:

- streaming: one block per dispatch through the Pallas split-plane step
  (the one-block-latency mode; p50 dispatch latency reported on stderr)
- batch: `process_batch` (block-axis FFT over 128 blocks per dispatch, the
  offline/bulk mode)

"value" is the better path's throughput in audio samples (frames x
channels) per second. The reference publishes no numbers (BASELINE.md), so
"vs_baseline" is the real-time factor: value / (44100 Hz * 64 ch). Output
correctness is spot-checked against scipy each run; a failed check zeroes
the result rather than reporting a wrong-fast number.

Timing notes: inputs are pre-staged on device (a pool of distinct blocks,
cycled) because this image reaches the TPU through an HTTP tunnel whose
host->device bandwidth (~5 MB/s) would otherwise dominate; completion is
forced every iteration via a scalar reduction fetch — chained-async timing
on this tunnel has shown bogus-fast results. Extra diagnostics go to
stderr; stdout carries exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


CHANNELS = 64
BLOCK = 1024
PARTITIONS = 128  # 131072 taps


def snr_db(y, ref):
    err = y - ref
    return 10 * np.log10(float((ref**2).sum()) / max(float((err**2).sum()), 1e-300))


def bench_streaming(spec, h, jnp, jax, n_iters):
    from bfir_tpu.kernels import spectrum_mac as K

    cr, ci = K.split_coeffs(h, spec)
    interp = jax.default_backend() == "cpu"  # pallas interpret mode on CPU
    step = jax.jit(
        lambda s, a, b, blk: K.step_split(s, a, b, blk, use_pallas=True,
                                          interpret=interp),
        donate_argnums=0,
    )
    rng = np.random.default_rng(1)
    state = K.init_split_state(spec, CHANNELS)
    x0 = jnp.asarray(rng.standard_normal((CHANNELS, BLOCK)).astype(np.float32))
    t0 = time.time()
    state, out = step(state, cr, ci, x0)
    float(jnp.sum(out))
    log(f"streaming compile: {time.time()-t0:.1f}s")

    # correctness: short stream vs scipy
    from scipy import signal

    st2 = K.init_split_state(spec, CHANNELS)
    xs = rng.standard_normal((CHANNELS, BLOCK * 3)).astype(np.float32)
    outs = []
    for b in range(3):
        st2, o = step(st2, cr, ci, jnp.asarray(xs[:, b * BLOCK : (b + 1) * BLOCK]))
        outs.append(np.asarray(o))
    y = np.concatenate(outs, axis=1)
    ref = signal.fftconvolve(xs[0].astype(np.float64), h[0].astype(np.float64))[: y.shape[1]]
    s = snr_db(y[0], ref)
    log(f"streaming SNR vs scipy: {s:.1f} dB")
    if s < 80:
        return 0.0, float("nan"), s

    pool = [jnp.asarray(rng.standard_normal((CHANNELS, BLOCK)).astype(np.float32))
            for _ in range(16)]
    jax.block_until_ready(pool)
    lats = []
    for i in range(n_iters):
        t0 = time.time()
        state, out = step(state, cr, ci, pool[i % 16])
        float(jnp.sum(out))  # force completion
        lats.append(time.time() - t0)
    p50 = float(np.percentile(lats, 50))
    sps = BLOCK * CHANNELS / p50
    log(f"streaming: p50 {p50*1e3:.3f} ms/block -> {sps/1e6:.0f} M samples/s")
    return sps, p50, s


def bench_batch(spec, h, jnp, jax, n_iters, batch_blocks=240, scan_batches=8):
    """Bulk-mode throughput: ``scan_batches`` x ``process_batch`` per
    dispatch (lax.scan), amortizing this image's ~30 ms tunnel round-trip
    over NB*B blocks; inputs are device-born (host->device here is ~5 MB/s).
    B=240 with P=128 shares one 512-point block-axis FFT among ~2x the
    blocks of B=128 (batch_fft_len is 512 for both) — measured ~1.8x faster
    per block. B=256 is OFF-LIMITS: the axon backend deterministically
    miscompiles that batch graph (SNR 4 dB, bit-identical across runs; the
    scipy check below catches it — see process_batch's docstring)."""
    from bfir_tpu.core import convolver as cv

    co = cv.coeffs_to_spectra(h, spec)
    hs = cv.prepare_batch_coeffs(co, batch_blocks)

    def steps(st, co_, hs_, many):  # many: [NB, B, C, N]
        def body(s, blk):
            return cv.process_batch(s, co_, blk, coeff_batch_fft=hs_)
        return jax.lax.scan(body, st, many)  # outputs materialize [NB,B,C,N]

    f = jax.jit(steps, donate_argnums=0)
    state = cv.init_state(spec, CHANNELS)
    key = jax.random.PRNGKey(2)
    make_pool = jax.jit(lambda k: jax.random.normal(
        k, (scan_batches, batch_blocks, CHANNELS, BLOCK), dtype=jnp.float32))
    pool = [make_pool(k) for k in jax.random.split(key, 2)]
    jax.block_until_ready(pool)
    t0 = time.time()
    state, outs = f(state, co, hs, pool[0])
    float(jnp.sum(outs))
    log(f"batch B={batch_blocks} x NB={scan_batches} compile: {time.time()-t0:.1f}s")

    # correctness vs scipy on a fresh state (the same process_batch the
    # scan dispatches, via the jitted single-call path)
    from scipy import signal

    rng = np.random.default_rng(2)
    g = jax.jit(lambda st, co_, hs_, blk: cv.process_batch(st, co_, blk,
                                                           coeff_batch_fft=hs_))
    st2 = cv.init_state(spec, CHANNELS)
    xs = rng.standard_normal((batch_blocks, CHANNELS, BLOCK)).astype(np.float32)
    _, o = g(st2, co, hs, jnp.asarray(xs))
    y = np.asarray(o).transpose(1, 0, 2).reshape(CHANNELS, -1)
    flat = xs.transpose(1, 0, 2).reshape(CHANNELS, -1)
    ref = signal.fftconvolve(flat[0].astype(np.float64), h[0].astype(np.float64))[: y.shape[1]]
    s = snr_db(y[0], ref)
    log(f"batch SNR vs scipy: {s:.1f} dB")
    if s < 80:
        return 0.0, s

    nblocks = scan_batches * batch_blocks
    times = []
    for i in range(n_iters):
        t0 = time.time()
        state, outs = f(state, co, hs, pool[i % 2])
        float(jnp.sum(outs))  # force completion via scalar fetch
        times.append((time.time() - t0) / nblocks)
    per_block = float(np.median(times))
    sps = BLOCK * CHANNELS / per_block
    log(f"batch: {per_block*1e3:.3f} ms/block -> {sps/1e6:.0f} M samples/s")
    return sps, s


def _setup_jax():
    import os

    import jax

    if os.environ.get("BFIR_BENCH_CPU") == "1":
        # JAX_PLATFORMS is consumed by this image's sitecustomize before we
        # run; only the config update can force CPU (see CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    base = (os.path.dirname(os.path.abspath(__file__))
            if "__file__" in globals() else os.getcwd())
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(base, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _run_path(which: str):
    """Run one bench path and print its result as JSON on stdout (invoked as
    a subprocess so a wedged TPU tunnel cannot hang the whole bench)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from bfir_tpu.core.spec import FilterSpec

    backend = jax.default_backend()
    on_cpu = backend == "cpu"
    spec = FilterSpec(block_length=BLOCK, n_partitions=PARTITIONS, dtype="float32")
    rng = np.random.default_rng(0)
    h = (rng.standard_normal((CHANNELS, spec.max_taps)) *
         np.exp(-np.arange(spec.max_taps) / 20000.0)).astype(np.float32) * 0.05
    if which == "batch":
        sps, s = bench_batch(spec, h, jnp, jax, n_iters=2 if on_cpu else 8,
                             batch_blocks=16 if on_cpu else 240,
                             scan_batches=2 if on_cpu else 8)
        print(json.dumps({"sps": sps, "snr": s, "backend": backend}))
    else:
        sps, p50, s = bench_streaming(spec, h, jnp, jax,
                                      n_iters=5 if on_cpu else 50)
        print(json.dumps({"sps": sps, "p50": p50, "snr": s, "backend": backend}))


def main():
    import subprocess

    def sub(which, timeout):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--path", which],
                capture_output=True, text=True, timeout=timeout)
            sys.stderr.write(r.stderr)
            for line in r.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
        except subprocess.TimeoutExpired:
            log(f"{which} bench timed out")
        except Exception as e:
            log(f"{which} bench failed: {type(e).__name__}: {e}")
        return {}

    batch = sub("batch", 900)      # headline path first
    stream = sub("stream", 600)

    batch_sps = batch.get("sps", 0.0) or 0.0
    stream_sps = stream.get("sps", 0.0) or 0.0
    p50 = stream.get("p50", float("nan"))
    snrs = [v for v in (batch.get("snr"), stream.get("snr")) if v is not None]
    backend = batch.get("backend") or stream.get("backend") or "unknown"

    value = max(stream_sps, batch_sps)
    mode = "batch" if batch_sps >= stream_sps else "streaming"
    realtime = 44100.0 * CHANNELS
    print(json.dumps({
        "metric": "audio samples/sec/chip, 64ch x 131072-tap partitioned conv "
                  f"({mode} mode, float32, {backend}; p50 stream dispatch "
                  f"{(p50 or float('nan'))*1e3:.2f} ms/block, SNR "
                  f"{min(snrs) if snrs else float('nan'):.0f} dB)",
        "value": round(value, 1),
        "unit": "samples/s",
        "vs_baseline": round(value / realtime, 2),
    }))


if __name__ == "__main__":
    if "--path" in sys.argv:
        _run_path(sys.argv[sys.argv.index("--path") + 1])
    else:
        main()
