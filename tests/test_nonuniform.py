"""Two-stage non-uniform partitioned convolution (core/nonuniform.py):
scipy oracle, uniform-engine equivalence, state-carry/checkpoint property,
tiled-MAC kernel parity, geometry validation."""

import numpy as np
import pytest
from scipy import signal

import jax
import jax.numpy as jnp

from bfir_tpu.core import nonuniform as NU
from bfir_tpu.core.spec import FilterSpec
from bfir_tpu.kernels import spectrum_mac as K


def _run_nu(spec, h, x, **kw):
    c = h.shape[0]
    coeffs = NU.nu_coeffs(h, spec, c)
    st = NU.init_nu_state(spec, c)
    n = spec.block_length
    blocks = jnp.asarray(x.reshape(c, -1, n).transpose(1, 0, 2))
    st, out = NU.process_blocks_nu(st, coeffs, blocks, **kw)
    return st, np.asarray(out.transpose(1, 0, 2).reshape(c, -1))


def _scipy_ref(h, x, nsamp):
    return np.stack(
        [signal.fftconvolve(x[c], h[c])[:nsamp] for c in range(h.shape[0])]
    )


@pytest.mark.parametrize("use_pallas", [False, True])
def test_nu_matches_scipy(use_pallas):
    rng = np.random.default_rng(0)
    spec = NU.NuSpec(block_length=8, ratio=2, p_head=4, p_tail=3)
    c = 2
    h = rng.standard_normal((c, spec.max_taps)).astype(np.float32)
    x = rng.standard_normal((c, 30 * spec.block_length)).astype(np.float32)
    _, y = _run_nu(spec, h, x, use_pallas=use_pallas, interpret=use_pallas)
    ref = _scipy_ref(h, x, y.shape[1])
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_nu_partial_taps_and_ratio4():
    """Impulse shorter than max_taps (tail partially filled) and R=4."""
    rng = np.random.default_rng(1)
    spec = NU.NuSpec(block_length=4, ratio=4, p_head=8, p_tail=2)
    c = 3
    taps = spec.max_taps - spec.m - 3  # ends mid tail partition
    h = rng.standard_normal((c, taps)).astype(np.float32)
    x = rng.standard_normal((c, 64 * spec.block_length)).astype(np.float32)
    _, y = _run_nu(spec, h, x, use_pallas=False)
    ref = _scipy_ref(h, x, y.shape[1])
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_nu_head_only_taps():
    """Impulse entirely inside the head: tail contributes exact zeros."""
    rng = np.random.default_rng(2)
    spec = NU.NuSpec(block_length=4, ratio=2, p_head=4, p_tail=1)
    c = 2
    h = rng.standard_normal((c, 3 * spec.block_length)).astype(np.float32)
    x = rng.standard_normal((c, 20 * spec.block_length)).astype(np.float32)
    _, y = _run_nu(spec, h, x, use_pallas=False)
    ref = _scipy_ref(h, x, y.shape[1])
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_nu_matches_uniform_engine():
    """Same impulse through the uniform hc engine and the nu engine."""
    rng = np.random.default_rng(3)
    spec = NU.NuSpec(block_length=8, ratio=2, p_head=4, p_tail=2)
    c = 2
    h = rng.standard_normal((c, spec.max_taps)).astype(np.float32)
    x = rng.standard_normal((c, 24 * spec.block_length)).astype(np.float32)
    _, y = _run_nu(spec, h, x, use_pallas=False)

    uspec = FilterSpec(spec.block_length, spec.max_taps // spec.block_length)
    ucoef = K.hc_coeffs(h, uspec, c)
    ust = K.init_hc_state(uspec, c)
    blocks = jnp.asarray(x.reshape(c, -1, spec.block_length).transpose(1, 0, 2))

    def body(st, blk):
        st, out = K.step_hc(st, ucoef, blk, use_pallas=False)
        return st, out

    _, uout = jax.lax.scan(body, ust, blocks)
    uy = np.asarray(uout.transpose(1, 0, 2).reshape(c, -1))
    np.testing.assert_allclose(y, uy, rtol=0, atol=2e-5 * np.abs(uy).max())


def test_nu_state_carry_equals_one_shot():
    """Splitting the stream across two process calls (checkpoint/resume
    pattern, engine/checkpoint.py) is bit-identical to one shot."""
    rng = np.random.default_rng(4)
    spec = NU.NuSpec(block_length=4, ratio=2, p_head=4, p_tail=2)
    c = 2
    h = rng.standard_normal((c, spec.max_taps)).astype(np.float32)
    x = rng.standard_normal((c, 21 * spec.block_length)).astype(np.float32)
    coeffs = NU.nu_coeffs(h, spec, c)
    n = spec.block_length
    blocks = jnp.asarray(x.reshape(c, -1, n).transpose(1, 0, 2))

    st = NU.init_nu_state(spec, c)
    _, one = NU.process_blocks_nu(st, coeffs, blocks, use_pallas=False)

    st = NU.init_nu_state(spec, c)
    st, a = NU.process_blocks_nu(st, coeffs, blocks[:7], use_pallas=False)
    st, b = NU.process_blocks_nu(st, coeffs, blocks[7:], use_pallas=False)
    two = jnp.concatenate([a, b], axis=0)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(two))


def test_mac_pallas_hc_tiled_matches_reference():
    """Freq-tiled MAC == untiled reference, tile < Hp (multi-tile grid)."""
    rng = np.random.default_rng(5)
    p, c, hp, tile = 5, 3, 512, 128
    ring = rng.standard_normal((p, 2 * c, hp)).astype(np.float32)
    coef = rng.standard_normal((p, 2 * c, hp)).astype(np.float32)
    for pos in [0, 2, 4]:
        yr, yi = K.mac_pallas_hc_tiled(ring, coef, jnp.int32(pos), tile=tile,
                                       interpret=True)
        rr, ri = K.mac_reference_hc(ring[:, :c], ring[:, c:],
                                    coef[:, :c], coef[:, c:], jnp.int32(pos))
        np.testing.assert_allclose(np.asarray(yr), np.asarray(rr), atol=1e-4)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(ri), atol=1e-4)


def test_nu_geometry_helper():
    spec = NU.nu_geometry(131072, 1024, 8)
    assert spec.p_head == 16 and spec.m == 8192
    assert spec.max_taps >= 131072
    assert spec.delay_blocks == 2
    # amortized traffic must beat the uniform engine's by >= 3x
    uniform = 2 * 128 * 2 * 1024 * 4
    assert uniform / spec.traffic_bytes_per_block > 3.0


def test_nu_spec_validation():
    with pytest.raises(ValueError):
        NU.NuSpec(block_length=8, ratio=3, p_head=6, p_tail=1)
    with pytest.raises(ValueError):
        NU.NuSpec(block_length=8, ratio=4, p_head=6, p_tail=1)  # not multiple
    with pytest.raises(ValueError):
        NU.NuSpec(block_length=8, ratio=4, p_head=4, p_tail=1)  # D < 2
    with pytest.raises(ValueError):
        NU.NuSpec(block_length=8, ratio=2, p_head=4, p_tail=0)
