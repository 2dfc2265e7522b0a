"""EQ renderer tests.

Oracle: a literal (loop-for-loop) re-implementation of the reference's
render_d synthesis (equalizer.cpp:330-358) in numpy, checked against the
vectorized jnp version; plus behavioral checks of the rendered filter's
actual frequency response.
"""

import numpy as np
import pytest

from bfir_tpu.core.spec import EqSpec, FilterSpec
from bfir_tpu.ops import equalizer as eq


def reference_render(taps, band_freqs, band_mags_db, rate):
    """Direct transliteration of the reference synthesis semantics
    (equalizer.cpp:57-66,113-121,330-358) as a slow-loop oracle."""
    freqs = [0.0] + list(band_freqs) + [rate / 2.0]
    mags = [band_mags_db[0]] + list(band_mags_db) + [band_mags_db[-1]]
    freqs = [f / rate for f in freqs]
    mags = [10 ** (m / 20.0) for m in mags]
    if freqs[-1] == freqs[-2]:
        freqs, mags = freqs[:-1], mags[:-1]

    scale = 1.0 / taps
    buf = np.zeros(taps)
    buf[0] = mags[0] * scale
    i = 0
    for n in range(1, taps // 2):
        curfreq = n / taps
        while curfreq > freqs[i + 1]:
            i += 1
        m = ((mags[i] - mags[i + 1]) * 0.5 * np.cos(np.pi * (curfreq - freqs[i]) / (freqs[i + 1] - freqs[i]))
             + (mags[i] + mags[i + 1]) * 0.5) * scale
        rad = -taps * np.pi * curfreq
        buf[n] = np.cos(rad) * m
        buf[taps - n] = np.sin(rad) * m
    buf[taps // 2] = mags[-1] * scale
    # unnormalized FFTW HC2R inverse: X_k = buf[k] + i*buf[taps-k]
    spec = np.zeros(taps // 2 + 1, dtype=complex)
    spec[0] = buf[0]
    spec[taps // 2] = buf[taps // 2]
    for k in range(1, taps // 2):
        spec[k] = buf[k] + 1j * buf[taps - k]
    impulse = np.fft.irfft(spec * taps, n=taps)  # HC2R is unnormalized
    return impulse[taps // 2 :]


def test_matches_reference_semantics():
    rng = np.random.default_rng(0)
    mags_db = rng.uniform(-12, 12, 31)
    taps, rate = 4096, 44100
    ref = reference_render(taps, eq.ISO_BANDS, mags_db, rate)
    ours = np.asarray(eq.render_fir(taps, mags_db, rate))
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_flat_eq_is_identityish():
    # 0 dB everywhere -> |H| = 1 at all frequencies; impulse ~ dirac at 0
    fir = np.asarray(eq.render_fir(8192, [0.0] * 31, 44100))
    h = np.abs(np.fft.rfft(fir, n=16384))
    np.testing.assert_allclose(h, 1.0, atol=1e-6)
    assert abs(fir[0] - 1.0) < 1e-6


def test_broad_boost_realized():
    # A broad boost (bands 10..20 at +6 dB) raises the response across the
    # boosted range and leaves far bands at 0 dB. Note: the reference's
    # causal-half extraction (equalizer.cpp:273-276) realizes roughly half
    # the linear boost (see module docstring) — ~+3.8 dB here — and the
    # parity oracle in test_matches_reference_semantics pins that exactly.
    mags = [0.0] * 31
    for b in range(10, 21):
        mags[b] = 6.0
    rate = 44100
    taps = 65536  # plugin default geometry: 1024 * 64 (common.h:18-19)
    fir = np.asarray(eq.render_fir(taps, mags, rate))

    def resp_db(f0):
        w = np.exp(-2j * np.pi * f0 / rate * np.arange(fir.size))
        return 20 * np.log10(np.abs(np.sum(fir * w)))

    assert 3.3 < resp_db(eq.ISO_BANDS[15]) < 4.5  # 630 Hz, mid-boost
    assert abs(resp_db(50.0)) < 0.5
    assert abs(resp_db(10000.0)) < 0.5


def test_single_band_peak_location():
    # A single-band boost produces a (truncation-broadened) peak at the band
    # center. The reference realizes only part of a narrow boost — e.g. a
    # +6 dB boost of the 1 kHz band peaks around +3.5 dB with 32768 taps —
    # we assert location and sign, not full magnitude.
    mags = [0.0] * 31
    mags[17] = 6.0  # 1 kHz
    rate = 44100
    fir = np.asarray(eq.render_fir(65536, mags, rate))
    freqs = np.array([500.0, 800.0, 1000.0, 1250.0, 2000.0])
    resp = []
    for f0 in freqs:
        w = np.exp(-2j * np.pi * f0 / rate * np.arange(fir.size))
        resp.append(20 * np.log10(np.abs(np.sum(fir * w))))
    assert np.argmax(resp) == 2  # peak at 1 kHz
    assert resp[2] > 3.0
    assert abs(resp[0]) < 0.3 and abs(resp[4]) < 0.3


def test_boost_is_localized():
    # Boosting the 20 kHz band must raise that band well above distant bands.
    # (Absolute off-band gain is nonzero in the reference design: the
    # band-30 magnitude is copied to the Nyquist endpoint, equalizer.cpp:114,
    # and the causal-half truncation spreads a fraction of any boost.)
    mags = [0.0] * 31
    mags[30] = 12.0  # 20 kHz
    rate = 44100
    fir = np.asarray(eq.render_fir(16384, mags, rate))

    def resp_db(f0):
        w = np.exp(-2j * np.pi * f0 / rate * np.arange(fir.size))
        return 20 * np.log10(np.abs(np.sum(fir * w)))

    assert resp_db(20000.0) > resp_db(100.0) + 6.0
    assert resp_db(100.0) < 2.5


def test_render_eq_spec_geometry():
    spec = FilterSpec(block_length=256, n_partitions=4, dtype="float64")
    e = EqSpec(enabled=True, mag_steps=tuple([0] * 31))
    fir = eq.render_eq_spec(e, spec, eq_filter_blocks=8, sample_rate=48000)
    assert fir.shape == (256 * 8 // 2,)


def test_validation():
    with pytest.raises(ValueError):
        eq.render_fir(1000, [0.0] * 31, 44100)  # not pow2
    with pytest.raises(ValueError):
        eq.synthesize_spectrum(1024, [100.0, 50.0], [0, 0], 44100)  # not increasing
    with pytest.raises(ValueError):
        eq.synthesize_spectrum(1024, [100.0, 40000.0], [0, 0], 44100)  # > nyquist


def test_accurate_mode_realizes_full_boost():
    # the new accurate mode returns the full linear-phase FIR and realizes
    # narrow boosts exactly (unlike the reference's causal-half render)
    mags = [0.0] * 31
    mags[17] = 6.0  # 1 kHz
    rate = 44100
    fir = np.asarray(eq.render_fir(65536, mags, rate, mode="accurate"))
    assert fir.shape == (65536,)
    w = np.exp(-2j * np.pi * 1000.0 / rate * np.arange(fir.size))
    resp_db = 20 * np.log10(np.abs(np.sum(fir * w)))
    assert abs(resp_db - 6.0) < 0.2
    with pytest.raises(ValueError):
        eq.render_fir(1024, mags, rate, mode="bogus")
