import numpy as np
import pytest

from bfir_tpu.core import spec as S


def test_sample_format_properties():
    f = S.SampleFormat.S16_LE
    assert f.bytes == 2 and f.bits == 16 and not f.isfloat
    assert f.full_scale == 32768.0
    assert f.imin == -32768 and f.imax == 32767
    assert S.SampleFormat.from_label("s24_le").bits == 24
    assert S.SampleFormat.FLOAT_LE.full_scale == 1.0


def test_filter_spec_geometry():
    fs = S.FilterSpec(block_length=1024, n_partitions=64)
    assert fs.n_fft == 2048
    assert fs.n_freq == 1025
    assert fs.max_taps == 65536
    with pytest.raises(ValueError):
        S.FilterSpec(block_length=1000)


def test_level_conversion():
    # prefs_eq.cpp:628-631: linear = 10^((steps/10)/20)
    assert S.level_steps_to_linear(0) == 1.0
    np.testing.assert_allclose(S.level_steps_to_linear(200), 10.0)
    np.testing.assert_allclose(S.level_steps_to_linear(-200), 0.1)


def test_eq_spec_validation():
    eq = S.EqSpec(enabled=True, mag_steps=tuple([10] * 31))
    assert eq.mag_db == tuple([1.0] * 31)
    with pytest.raises(ValueError):
        S.EqSpec(mag_steps=tuple([300] * 31))
    with pytest.raises(ValueError):
        S.EqSpec(mag_steps=(0,) * 30)


def test_engine_config_json_roundtrip():
    cfg = S.EngineConfig(
        filter=S.FilterSpec(block_length=512, n_partitions=8, dtype="float64"),
        stream=S.StreamSpec(n_channels=4, sample_rate=96000,
                            out_format=S.SampleFormat.S24_LE, apply_dither=True),
        chain=S.ChainSpec(
            eq=S.EqSpec(enabled=True, level_steps=-30, mag_steps=tuple(range(31))),
            files=(S.ImpulseFileSpec(enabled=True, filename="/tmp/a.wav", level_steps=5),
                   S.ImpulseFileSpec(), S.ImpulseFileSpec()),
        ),
        overflow_warnings=True,
    )
    s = S.to_json(cfg)
    back = S.engine_config_from_json(s)
    assert back == cfg


def test_chain_active():
    assert not S.ChainSpec().active
    assert S.ChainSpec(eq=S.EqSpec(enabled=True)).active
