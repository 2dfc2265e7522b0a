"""Pallas spectrum-MAC kernel (interpret mode on CPU) vs jnp reference and
the complex-dtype convolver path."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal

from bfir_tpu.core import convolver as cv
from bfir_tpu.core.spec import FilterSpec
from bfir_tpu.kernels import spectrum_mac as K
from bfir_tpu.ops import fft as F


def test_mac_reference_matches_complex():
    rng = np.random.default_rng(0)
    p, c, f = 4, 2, 33
    rr, ri = rng.standard_normal((2, p, c, f))
    cr, ci = rng.standard_normal((2, p, c, f))
    for pos in range(p):
        yr, yi = K.mac_reference(rr, ri, cr, ci, np.int32(pos))
        ring = rr + 1j * ri
        coeffs = cr + 1j * ci
        idx = (pos - np.arange(p)) % p
        ref = (coeffs * ring[idx]).sum(axis=0)
        np.testing.assert_allclose(np.asarray(yr), ref.real, atol=1e-12)
        np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=1e-12)


@pytest.mark.parametrize("pos", [0, 3, 7])
def test_mac_pallas_interpret_matches_reference(pos):
    rng = np.random.default_rng(1)
    p, c, fp = 8, 8, 128
    rr = rng.standard_normal((p, c, fp)).astype(np.float32)
    ri = rng.standard_normal((p, c, fp)).astype(np.float32)
    cr = rng.standard_normal((p, c, fp)).astype(np.float32)
    ci = rng.standard_normal((p, c, fp)).astype(np.float32)
    import jax.numpy as jnp

    yr, yi = K.mac_pallas(rr, ri, cr, ci, jnp.int32(pos), interpret=True)
    yr2, yi2 = K.mac_reference(rr, ri, cr, ci, jnp.int32(pos))
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yr2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(yi2), atol=1e-4)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_step_split_matches_scipy(use_pallas):
    rng = np.random.default_rng(2)
    spec = FilterSpec(block_length=128, n_partitions=4, dtype="float64")
    c = 2
    h = rng.standard_normal(450) * 0.1
    x = rng.standard_normal((c, 128 * 8))

    state = K.init_split_state(spec, c)
    cr, ci = K.split_coeffs(h, spec)
    outs = []
    for b in range(8):
        state, o = K.step_split(state, cr, ci, x[:, b * 128 : (b + 1) * 128],
                                use_pallas=use_pallas, interpret=True)
        outs.append(np.asarray(o))
    y = np.concatenate(outs, axis=1)
    ref = np.stack([signal.fftconvolve(x[i], h)[: x.shape[-1]] for i in range(c)])
    np.testing.assert_allclose(y, ref, atol=1e-9)


def test_split_coeffs_matches_complex():
    rng = np.random.default_rng(3)
    spec = FilterSpec(block_length=64, n_partitions=3, dtype="float64")
    h = rng.standard_normal((2, 150))
    cr, ci = K.split_coeffs(h, spec)
    ref = np.asarray(F.to_numpy(cv.coeffs_to_spectra(h, spec)))
    np.testing.assert_allclose(np.asarray(cr)[..., : spec.n_freq], ref.real, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ci)[..., : spec.n_freq], ref.imag, atol=1e-10)
    assert cr.shape[-1] % 128 == 0


def test_rfft_irfft_split_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 2048))
    F.set_mode("matmul")
    try:
        re, im = F.rfft_split(x)
        y = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(np.asarray(re), y.real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(im), y.imag, atol=1e-9)
        back = F.irfft_split(re, im, n=2048)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-10)
    finally:
        F.set_mode("auto")


@pytest.mark.parametrize("blocks", [6])
def test_step_packed_matches_split(blocks):
    rng = np.random.default_rng(7)
    spec = FilterSpec(block_length=128, n_partitions=4, dtype="float64")
    c = 2
    h = rng.standard_normal(450) * 0.1
    x = rng.standard_normal((c, 128 * blocks))

    s1 = K.init_split_state(spec, c)
    cr, ci = K.split_coeffs(h, spec)
    s2 = K.init_packed_state(spec, c)
    cpk = K.pack_coeffs(h, spec, c)
    assert cpk.shape == (4, 2 * c, s2.ring.shape[-1])

    for b in range(blocks):
        blk = x[:, b * 128 : (b + 1) * 128]
        s1, o1 = K.step_split(s1, cr, ci, blk, use_pallas=False)
        s2, o2 = K.step_packed(s2, cpk, blk, interpret=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-10)


@pytest.mark.parametrize("k", [1, 2, 4])
def test_step_chunked_matches_split(k):
    rng = np.random.default_rng(8)
    spec = FilterSpec(block_length=128, n_partitions=4, dtype="float64")
    c = 2
    h = rng.standard_normal(450) * 0.1
    x = rng.standard_normal((c, 128 * 7))

    s1 = K.init_split_state(spec, c)
    cr, ci = K.split_coeffs(h, spec)
    s3 = K.init_doubled_state(spec, c)
    crk = K.chunk_reverse_coeffs(K.pack_coeffs(h, spec, c), k)

    for b in range(7):
        blk = x[:, b * 128 : (b + 1) * 128]
        s1, o1 = K.step_split(s1, cr, ci, blk, use_pallas=False)
        s3, o3 = K.step_chunked(s3, crk, blk, k=k, interpret=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o3), atol=1e-10,
                                   err_msg=f"block {b} k={k}")


def test_chunk_reverse_coeffs():
    x = np.arange(8 * 2 * 4, dtype=np.float64).reshape(8, 2, 4)
    y = np.asarray(K.chunk_reverse_coeffs(x, 4))
    np.testing.assert_array_equal(y[0], x[3])
    np.testing.assert_array_equal(y[3], x[0])
    np.testing.assert_array_equal(y[4], x[7])


def test_rfft_irfft_split_hc_roundtrip():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((3, 2048))
    F.set_mode("matmul")
    try:
        hr, hi = F.rfft_split_hc(x)
        assert hr.shape[-1] == 1024 and hi.shape[-1] == 1024
        y = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(np.asarray(hr[..., 0]), y[..., 0].real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(hi[..., 0]), y[..., -1].real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(hr[..., 1:]), y[..., 1:1024].real, atol=1e-9)
        np.testing.assert_allclose(np.asarray(hi[..., 1:]), y[..., 1:1024].imag, atol=1e-9)
        back = F.irfft_split_hc(hr, hi, n=2048)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-10)
        # padded planes accepted (engine stores lane-rounded arrays)
        import jax.numpy as jnp

        back2 = F.irfft_split_hc(jnp.pad(hr, ((0, 0), (0, 64))),
                                 jnp.pad(hi, ((0, 0), (0, 64))), n=2048)
        np.testing.assert_allclose(np.asarray(back2), x, atol=1e-10)
    finally:
        F.set_mode("auto")


def test_irfft_hc_tail_matches_full():
    rng = np.random.default_rng(15)
    for m in (256, 2048):
        hr = rng.standard_normal((3, m // 2))
        hi = rng.standard_normal((3, m // 2))
        full = np.asarray(F.irfft_split_hc(hr, hi, n=m))
        tail = np.asarray(F.irfft_hc_tail(hr, hi, n=m))
        np.testing.assert_allclose(tail, full[..., m // 2:], atol=1e-10)
    # lane-padded input accepted
    import jax.numpy as jnp

    t2 = np.asarray(F.irfft_hc_tail(jnp.pad(hr, ((0, 0), (0, 64))),
                                    jnp.pad(hi, ((0, 0), (0, 64))), n=2048))
    np.testing.assert_allclose(t2, tail, atol=1e-12)


@pytest.mark.parametrize("pos", [0, 3, 7])
def test_mac_pallas_hc_interpret_matches_reference(pos):
    rng = np.random.default_rng(10)
    p, c, hp = 8, 4, 128
    ring = rng.standard_normal((p, 2 * c, hp)).astype(np.float32)
    coef = rng.standard_normal((p, 2 * c, hp)).astype(np.float32)
    import jax.numpy as jnp

    yr, yi = K.mac_pallas_hc(ring, coef, jnp.int32(pos), interpret=True)
    yr2, yi2 = K.mac_reference_hc(ring[:, :c], ring[:, c:],
                                  coef[:, :c], coef[:, c:], jnp.int32(pos))
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yr2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(yi2), atol=1e-4)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_step_hc_matches_split_and_scipy(use_pallas):
    rng = np.random.default_rng(11)
    spec = FilterSpec(block_length=128, n_partitions=4, dtype="float64")
    c = 2
    h = rng.standard_normal((c, 450)) * 0.1
    x = rng.standard_normal((c, 128 * 8))

    s1 = K.init_split_state(spec, c)
    cr, ci = K.split_coeffs(h, spec)
    s2 = K.init_hc_state(spec, c)
    chc = K.hc_coeffs(h, spec, c)
    assert chc.shape == (4, 2 * c, 128)  # n_fft//2 = 128: no pad at all

    outs = []
    for b in range(8):
        blk = x[:, b * 128 : (b + 1) * 128]
        s1, o1 = K.step_split(s1, cr, ci, blk, use_pallas=False)
        s2, o2 = K.step_hc(s2, chc, blk, use_pallas=use_pallas, interpret=True)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-10)
        outs.append(np.asarray(o2))
    y = np.concatenate(outs, axis=1)
    ref = np.stack([signal.fftconvolve(x[i], h[i])[: x.shape[-1]] for i in range(c)])
    np.testing.assert_allclose(y, ref, atol=1e-9)


@pytest.mark.parametrize("blocklen", [128, 64])
def test_step_hc2_matches_step_hc(blocklen):
    rng = np.random.default_rng(19)
    spec = FilterSpec(block_length=blocklen, n_partitions=4, dtype="float64")
    c = 2
    h = rng.standard_normal((c, 3 * blocklen)) * 0.1
    x = rng.standard_normal((c, blocklen * 6))

    s1 = K.init_hc_state(spec, c)
    s2 = K.init_hc_state(spec, c)
    chc = K.hc_coeffs(h, spec, c)
    for b in range(6):
        blk = x[:, b * blocklen : (b + 1) * blocklen]
        s1, o1 = K.step_hc(s1, chc, blk, use_pallas=False)
        s2, o2 = K.step_hc2(s2, chc, blk, interpret=True)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-10,
                                   err_msg=f"block {b}")
        np.testing.assert_allclose(np.asarray(s2.ring), np.asarray(s1.ring),
                                   atol=1e-12, err_msg=f"ring after block {b}")


@pytest.mark.parametrize("blocklen", [128, 64])  # 64: hp (128) > h (64)
def test_step_hc_fused_matches_step_hc(blocklen):
    rng = np.random.default_rng(17)
    spec = FilterSpec(block_length=blocklen, n_partitions=4, dtype="float64")
    c = 2
    h = rng.standard_normal((c, 3 * blocklen)) * 0.1
    x = rng.standard_normal((c, blocklen * 6))

    s1 = K.init_hc_state(spec, c)
    s2 = K.init_hc_state(spec, c)
    chc = K.hc_coeffs(h, spec, c)
    for b in range(6):
        blk = x[:, b * blocklen : (b + 1) * blocklen]
        s1, o1 = K.step_hc(s1, chc, blk, use_pallas=False)
        s2, o2 = K.step_hc_fused(s2, chc, blk, interpret=True)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-10,
                                   err_msg=f"block {b}")


def test_step_hc_crossfade_matches_packed():
    rng = np.random.default_rng(13)
    spec = FilterSpec(block_length=128, n_partitions=4, dtype="float64")
    c = 2
    h_old = rng.standard_normal((c, 400)) * 0.1
    h_new = rng.standard_normal((c, 400)) * 0.1
    x = rng.standard_normal((c, 128 * 5))

    sp = K.init_packed_state(spec, c)
    pk_old = K.pack_coeffs(h_old, spec, c)
    pk_new = K.pack_coeffs(h_new, spec, c)
    sh = K.init_hc_state(spec, c)
    hc_old = K.hc_coeffs(h_old, spec, c)
    hc_new = K.hc_coeffs(h_new, spec, c)

    for b in range(3):
        blk = x[:, b * 128 : (b + 1) * 128]
        sp, op = K.step_packed(sp, pk_old, blk, interpret=True)
        sh, oh = K.step_hc(sh, hc_old, blk, interpret=True)
        np.testing.assert_allclose(np.asarray(oh), np.asarray(op), atol=1e-10)
    blk = x[:, 3 * 128 : 4 * 128]
    sp, op = K.step_packed_crossfade(sp, pk_old, pk_new, blk, interpret=True)
    sh, oh = K.step_hc_crossfade(sh, hc_old, hc_new, blk, interpret=True)
    np.testing.assert_allclose(np.asarray(oh), np.asarray(op), atol=1e-10)
    blk = x[:, 4 * 128 : 5 * 128]
    sp, op = K.step_packed(sp, pk_new, blk, interpret=True)
    sh, oh = K.step_hc(sh, hc_new, blk, interpret=True)
    np.testing.assert_allclose(np.asarray(oh), np.asarray(op), atol=1e-10)


def test_dither_pallas_matches_scan():
    from bfir_tpu.ops import dither as dth

    rng = np.random.default_rng(12)
    c, n = 2, 512
    x = rng.uniform(-30000, 30000, (c, n))
    x[0, 5] = 40000.0  # force a clip
    st = dth.init_dither_state(c, seed=3, dtype=np.float64)
    of = dth.init_overflow_stats(c, dtype=np.float64)
    q1, st1, of1 = dth.quantize_hp_tpdf(x, -32768, 32767, st, of)
    q2, st2, of2 = dth.quantize_hp_tpdf(x, -32768, 32767, st, of,
                                        use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_allclose(np.asarray(st1.e0), np.asarray(st2.e0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st1.e1), np.asarray(st2.e1), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(of1.n_overflows), np.asarray(of2.n_overflows))
    np.testing.assert_allclose(np.asarray(of1.largest), np.asarray(of2.largest))
    np.testing.assert_array_equal(np.asarray(of1.intlargest), np.asarray(of2.intlargest))


# -- partial-fusion transforms (kernels/fft_fused.py, VERDICT r3 next #3) ---


def test_rfft_hc_fused_matches_ops_fft():
    """Interpret-mode parity of the partial-fusion forward transform vs the
    production XLA formulation (identical hc layout, fp-level agreement)."""
    from bfir_tpu.kernels import fft_fused as FF
    from bfir_tpu.ops import fft as F

    rng = np.random.default_rng(90)
    for rows, m in ((64, 2048), (8, 4096)):
        x = rng.standard_normal((rows, m)).astype(np.float32)
        hr, hi = FF.rfft_hc_fused(jnp.asarray(x), interpret=True)
        rr, ri = F.rfft_split_hc(jnp.asarray(x))
        scale = float(np.max(np.abs(np.asarray(rr))))
        np.testing.assert_allclose(np.asarray(hr), np.asarray(rr),
                                   atol=1e-3 * scale)
        np.testing.assert_allclose(np.asarray(hi), np.asarray(ri),
                                   atol=1e-3 * scale)
    with pytest.raises(ValueError, match="pow2"):
        FF.rfft_hc_fused(jnp.zeros((4, 512)), interpret=True)


def test_irfft_hc_tail_fused_matches_ops_fft():
    """The DIF-form fused inverse tail == ops.fft.irfft_hc_tail (the
    overlap-save tail the hc engine renders every block)."""
    from bfir_tpu.kernels import fft_fused as FF
    from bfir_tpu.ops import fft as F

    rng = np.random.default_rng(91)
    m = 4096
    yr = rng.standard_normal((16, m // 2)).astype(np.float32)
    yi = rng.standard_normal((16, m // 2)).astype(np.float32)
    t1 = FF.irfft_hc_tail_fused(jnp.asarray(yr), jnp.asarray(yi), n=m,
                                interpret=True)
    t2 = F.irfft_hc_tail(jnp.asarray(yr), jnp.asarray(yi), n=m)
    sc = float(np.max(np.abs(np.asarray(t2))))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-3 * sc)


def test_fused_roundtrip_convolution_law():
    """End-to-end law: rfft_hc_fused -> elementwise hc product -> fused
    tail == the valid block of a linear convolution (the step_hc data
    path with both transforms swapped for the fused kernels)."""
    from scipy import signal

    from bfir_tpu.kernels import fft_fused as FF
    from bfir_tpu.kernels.spectrum_mac import mac_reference_hc

    rng = np.random.default_rng(92)
    n = 2048
    m = 2 * n
    c = 4
    h = rng.standard_normal((c, n)).astype(np.float32) * 0.1
    prev = rng.standard_normal((c, n)).astype(np.float32)
    blk = rng.standard_normal((c, n)).astype(np.float32)
    frame = np.concatenate([prev, blk], axis=1)
    hr, hi = FF.rfft_hc_fused(jnp.asarray(frame), interpret=True)
    cr, ci = FF.rfft_hc_fused(jnp.asarray(np.pad(h, ((0, 0), (0, n)))),
                              interpret=True)
    yr, yi = mac_reference_hc(hr[None], hi[None], cr[None], ci[None],
                              jnp.zeros((), jnp.int32))
    out = FF.irfft_hc_tail_fused(yr, yi, n=m, interpret=True)
    ref = np.stack([signal.fftconvolve(frame[ch].astype(np.float64),
                                       h[ch].astype(np.float64))[n: 2 * n]
                    for ch in range(c)])
    np.testing.assert_allclose(np.asarray(out), ref,
                               atol=1e-4 * np.abs(ref).max())


# -- shared-coefficient MAC (one filter for all channels) -------------------


def test_mac_shared_coeffs_match_broadcast():
    """coeff [P, 2, Hp] (shared) == coeff [P, 2C, Hp] (broadcast) through
    every MAC formulation: reference, untiled kernel, tiled kernel."""
    rng = np.random.default_rng(95)
    p, c, hp = 4, 6, 256
    ring = jnp.asarray(rng.standard_normal((p, 2 * c, hp)).astype(np.float32))
    co1 = rng.standard_normal((p, 2, hp)).astype(np.float32)
    cob = np.concatenate([np.repeat(co1[:, :1], c, axis=1),
                          np.repeat(co1[:, 1:], c, axis=1)], axis=1)
    pos = jnp.asarray(2, jnp.int32)
    r_ref = K.mac_reference_hc(ring[:, :c], ring[:, c:],
                               jnp.asarray(cob[:, :c]), jnp.asarray(cob[:, c:]),
                               pos)
    r_sh = K.mac_reference_hc(ring[:, :c], ring[:, c:],
                              jnp.asarray(co1[:, :1]), jnp.asarray(co1[:, 1:]),
                              pos)
    np.testing.assert_allclose(np.asarray(r_sh[0]), np.asarray(r_ref[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_sh[1]), np.asarray(r_ref[1]),
                               atol=1e-5)
    k_b = K.mac_pallas_hc(ring, jnp.asarray(cob), pos, interpret=True)
    k_s = K.mac_pallas_hc(ring, jnp.asarray(co1), pos, interpret=True)
    np.testing.assert_allclose(np.asarray(k_s[0]), np.asarray(k_b[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_s[1]), np.asarray(k_b[1]), atol=1e-5)
    t_b = K.mac_pallas_hc_tiled(ring, jnp.asarray(cob), pos, tile=128,
                                interpret=True)
    t_s = K.mac_pallas_hc_tiled(ring, jnp.asarray(co1), pos, tile=128,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(t_s[0]), np.asarray(t_b[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_s[1]), np.asarray(t_b[1]), atol=1e-5)


def test_step_hc_with_shared_coeffs():
    """step_hc streams correctly with shared coefficient planes."""
    from scipy import signal

    rng = np.random.default_rng(96)
    spec = FilterSpec(block_length=64, n_partitions=4, dtype="float32")
    c = 3
    h1 = rng.standard_normal((1, spec.max_taps)).astype(np.float32) * 0.1
    co = K.hc_coeffs(h1, spec, c, shared=True)
    assert co.shape[1] == 2  # one plane pair, not 2C
    st = K.init_hc_state(spec, c)
    x = rng.standard_normal((c, 64 * 8)).astype(np.float32)
    outs = []
    for b in range(8):
        st, o = K.step_hc(st, co, x[:, b * 64:(b + 1) * 64], use_pallas=False)
        outs.append(np.asarray(o))
    y = np.concatenate(outs, axis=1)
    ref = np.stack([signal.fftconvolve(x[ch].astype(np.float64),
                                       h1[0].astype(np.float64))[:y.shape[1]]
                    for ch in range(c)])
    snr = 10 * np.log10(float((ref**2).sum()) / float(((y - ref)**2).sum()))
    assert snr > 100, snr
