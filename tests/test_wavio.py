import numpy as np
import pytest

from bfir_tpu.io import wavio


@pytest.mark.parametrize("subtype,tol", [
    ("float64", 0.0),
    ("float32", 1e-7),
    ("pcm16", 1 / 32768.0),
    ("pcm24", 1 / 8388608.0),
    ("pcm32", 1 / 2147483648.0),
])
def test_roundtrip(tmp_path, subtype, tol):
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.9, 0.9, size=(1000, 3))
    p = str(tmp_path / f"t_{subtype}.wav")
    wavio.write(p, audio, 48000, subtype=subtype)
    back, rate = wavio.read(p)
    assert rate == 48000
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=tol or 1e-15)


def test_info(tmp_path):
    p = str(tmp_path / "i.wav")
    wavio.write(p, np.zeros((123, 2)), 44100, subtype="pcm24")
    info = wavio.read_info(p)
    assert info.n_channels == 2
    assert info.sample_rate == 44100
    assert info.n_frames == 123
    assert info.bits == 24 and not info.is_float
    assert info.format_name == "pcm24"


def test_mono_1d_write(tmp_path):
    p = str(tmp_path / "m.wav")
    x = np.sin(np.linspace(0, 10, 500))
    wavio.write(p, x, 44100, subtype="float32")
    back, _ = wavio.read(p)
    assert back.shape == (500, 1)
    np.testing.assert_allclose(back[:, 0], x, atol=1e-7)


def test_pcm8_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, (300, 2))
    p = str(tmp_path / "u8.wav")
    wavio.write(p, x, 22050, subtype="pcm8")
    back, rate = wavio.read(p)
    assert rate == 22050
    np.testing.assert_allclose(back, x, atol=1 / 127.0)
