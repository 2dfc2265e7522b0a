"""G-cycle batched bulk scan (core.nubatch): equivalence with the
per-cycle macro scan, the scipy oracle, state interchange with the
per-block engine, shared-coefficient planes, and the guard rails.

Reference behavior under test: the overlap-save partitioned MAC law of
/root/reference/brutefir/fftw_convolver.cpp:1429-1525 on the non-uniform
schedule — the batched formulation must be numerically interchangeable
with ``process_blocks_nu_fast`` (same spectra, same MAC law, same tails).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import signal

from bfir_tpu.core import nonuniform as NU
from bfir_tpu.core import nubatch as NB


SPEC = NU.NuSpec(block_length=128, ratio=2, p_head=4, p_tail=3)
C = 4


def _mk(seed=0, taps=None, shared=False):
    rng = np.random.default_rng(seed)
    taps = taps or SPEC.max_taps
    h = rng.standard_normal((1 if shared else C, taps)).astype(np.float32) * 0.1
    co = NU.nu_coeffs(h, SPEC, C, shared=shared)
    return rng, h, co


def _blocks(rng, nblocks):
    xs = rng.standard_normal((C, nblocks * 128)).astype(np.float32)
    return xs, jnp.asarray(xs.reshape(C, nblocks, 128).transpose(1, 0, 2))


@pytest.mark.parametrize("g", [1, 2, 4])
def test_gbatch_matches_macro_scan(g):
    rng, h, co = _mk()
    xs, blocks = _blocks(rng, 16)
    st_a, ya = NU.process_blocks_nu_fast(
        NU.init_nu_state(SPEC, C), co, blocks, interpret=True,
        use_pallas=False)
    st_b, yb = NB.process_blocks_nu_gbatch(
        NU.init_nu_state(SPEC, C), co, blocks, cycles_per_step=g,
        interpret=True, use_pallas=False)
    scale = float(np.abs(np.asarray(ya)).max())
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               atol=2e-6 * scale)
    # the returned NuState must continue identically under the per-block
    # engine (ring/counter/pending reconstruction is exact)
    _, b2 = _blocks(rng, 4)
    _, ya2 = NU.process_blocks_nu(st_a, co, b2, interpret=True,
                                  use_pallas=False)
    _, yb2 = NU.process_blocks_nu(st_b, co, b2, interpret=True,
                                  use_pallas=False)
    np.testing.assert_allclose(np.asarray(yb2), np.asarray(ya2),
                               atol=2e-6 * scale)


def test_gbatch_scipy_oracle():
    rng, h, co = _mk(seed=3)
    xs, blocks = _blocks(rng, 16)
    _, out = NB.process_blocks_nu_gbatch(
        NU.init_nu_state(SPEC, C), co, blocks, cycles_per_step=4,
        interpret=True, use_pallas=False)
    y = np.asarray(out).transpose(1, 0, 2).reshape(C, -1)
    ref = signal.fftconvolve(xs.astype(np.float64), h.astype(np.float64),
                             axes=1)[:, : y.shape[1]]
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-5


def test_gbatch_resume_from_midstream_state():
    """Conversion must be exact from a NON-zero counter (arbitrary ring
    rotation) at an M-cycle boundary."""
    rng, h, co = _mk(seed=5)
    xs, blocks = _blocks(rng, 20)
    # warm a per-block state through 3 cycles (6 blocks)
    st = NU.init_nu_state(SPEC, C)
    st, y0 = NU.process_blocks_nu(st, co, blocks[:6], interpret=True,
                                  use_pallas=False)
    st_a, ya = NU.process_blocks_nu_fast(st, co, blocks[6:14],
                                         interpret=True, use_pallas=False)
    st_b, yb = NB.process_blocks_nu_gbatch(st, co, blocks[6:14],
                                           cycles_per_step=2,
                                           interpret=True, use_pallas=False)
    scale = float(np.abs(np.asarray(ya)).max())
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               atol=2e-6 * scale)


def test_gbatch_shared_coeffs():
    rng, h, co = _mk(seed=7, shared=True)
    xs, blocks = _blocks(rng, 8)
    _, out = NB.process_blocks_nu_gbatch(
        NU.init_nu_state(SPEC, C), co, blocks, cycles_per_step=2,
        interpret=True, use_pallas=False)
    y = np.asarray(out).transpose(1, 0, 2).reshape(C, -1)
    hb = np.broadcast_to(h, (C, h.shape[-1]))
    ref = signal.fftconvolve(xs.astype(np.float64), hb.astype(np.float64),
                             axes=1)[:, : y.shape[1]]
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-5


def test_gbatch_rejects_int_planes_and_misaligned_blocks():
    rng = np.random.default_rng(9)
    spec_i = NU.NuSpec(block_length=128, ratio=2, p_head=4, p_tail=3,
                       tail_store="int24")
    h = rng.standard_normal((C, spec_i.max_taps)).astype(np.float32) * 0.1
    co_i = NU.nu_coeffs(h, spec_i, C)
    blocks = jnp.zeros((8, C, 128), jnp.float32)
    with pytest.raises(ValueError, match="float plane storage"):
        NB.process_blocks_nu_gbatch(NU.init_nu_state(spec_i, C), co_i,
                                    blocks, cycles_per_step=2)
    _, _, co = _mk()
    with pytest.raises(ValueError, match="multiple of G\\*R"):
        NB.process_blocks_nu_gbatch(NU.init_nu_state(SPEC, C), co,
                                    blocks[:6], cycles_per_step=2)
