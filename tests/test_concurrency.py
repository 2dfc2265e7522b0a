"""Cross-thread config mutation during streaming.

The reference's one real shared-state hazard: the CLI thread mutates cfg_*
globals while the DSP thread reads them, unprotected (SURVEY.md §5;
connection.cpp:110 vs foo_dsp_bfir.cpp:161-246). Here the store swaps
immutable snapshots and the session applies them at block boundaries — this
test hammers both threads and asserts output stays sane throughout.
"""

import threading

import numpy as np

from bfir_tpu.cli.protocol import CommandHandler
from bfir_tpu.cli.store import ConfigStore
from bfir_tpu.engine.cache import ArtifactCache
from bfir_tpu.engine.session import StreamProcessor
from bfir_tpu.io import wavio
from tests.test_engine import make_config


def test_cli_mutation_during_streaming(tmp_path):
    h = np.zeros((2, 8))
    h[:, 0] = 0.5
    p = str(tmp_path / "imp.wav")
    wavio.write(p, h.T, 44100, subtype="float64")

    cfg = make_config(tmp_path, files=[(p, 0, False)])
    sp = StreamProcessor(cfg, ArtifactCache(str(tmp_path / "c")))
    store = ConfigStore(cfg, on_change=sp.reconfigure)
    handler = CommandHandler(store, default_dir=str(tmp_path))

    stop = threading.Event()
    errors = []

    def mutate():
        i = 0
        try:
            while not stop.is_set():
                # toggle file level between 0 dB and -6 dB over and over
                handler.handle(f"F1LV {0 if i % 2 else -60}")
                handler.handle("F1LV")
                i += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=mutate)
    t.start()
    try:
        rng = np.random.default_rng(0)
        for _ in range(60):
            x = rng.standard_normal((2, 256)) * 0.1
            y = sp.process(x)
            # output is always a finite, sane filtering of the input: gain
            # is either 0.5 (0 dB) or 0.25 (-6 dB) or a crossfade between
            assert np.isfinite(y).all()
            if y.size:
                ratio = np.abs(y).max() / max(np.abs(x).max(), 1e-9)
                assert 0.1 < ratio < 0.8, f"wild gain {ratio}"
    finally:
        stop.set()
        t.join(timeout=10)
    assert not errors
