"""Filter-chain composition: EQ + impulse files -> one impulse response.

Replaces the plugin's init-time chain build (foo_dsp_bfir.cpp:140-300) and
``preprocessor::convolve_impulses`` (preprocessor.cpp:33-233):

reference                                     here
---------                                     ----
EQ enabled -> equalizer::generate, cached     render via ops.equalizer, cached
  WAV keyed by band hash (:151-176)             with the same eq-<hash> scheme
per file: channel/rate check, else resample   sndio read (WAV/FLAC/AIFF) +
  via libsamplerate if flag set, else drop        ops.resample, cached
  (:177-247)                                    with the ir-<hash> scheme
>1 impulse: iterative block convolution       one direct spectral multiply per
  through an offline brutefir instance          impulse (mathematically what the
  (preprocessor.cpp:104-194)                    block scheme computes), cached
                                                with the file-<hash> scheme
composition length: padded to the largest     same truncation reproduced
  impulse's frame count; tail truncated
  (preprocessor.cpp:85,196-201)

Scale/divergence notes:
- the reference *drops the last impulse's level scale* in the multi-impulse
  path: set_coeff applies ``it->scale`` to the running coefficients only
  after that impulse has been convolved into the output, and the final
  output buffer is saved before the scale lands (preprocessor.cpp:168-194,
  with scale=1.0 then used at foo_dsp_bfir.cpp:259). We apply *every*
  impulse's scale — a deliberate bug fix, documented here.
- single-impulse path: the scale is passed through to coefficient
  preprocessing (set_coeff(..., scale), foo_dsp_bfir.cpp:289) — same here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from bfir_tpu.core.convolver import direct_convolve_spectra
from bfir_tpu.core.spec import ChainSpec, EngineConfig, FilterSpec, StreamSpec
from bfir_tpu.engine.cache import ArtifactCache
from bfir_tpu.io import sndio, wavio
from bfir_tpu.ops.equalizer import ISO_BANDS, render_fir
from bfir_tpu.ops.resample import resample
from bfir_tpu.utils.logging import pinfo


@dataclass
class BuiltChain:
    """Result of chain composition: the impulse [C, taps] (None => chain
    inactive, stream passes through), the scale to fold into the
    coefficients, and the partition count implied by the impulse length."""

    impulse: Optional[np.ndarray]
    scale: float
    n_partitions: int


def _load_impulse_file(
    f, stream: StreamSpec, cache: ArtifactCache, realsize: int
) -> Optional[np.ndarray]:
    """Load one impulse slot: channel/rate compat check, optional cached
    resample, else drop (foo_dsp_bfir.cpp:177-247)."""
    if not f.filename or not os.path.exists(f.filename):
        pinfo("Impulse file missing: %s", f.filename)
        return None
    info = sndio.read_info(f.filename)
    if info.n_channels not in (1, stream.n_channels):
        pinfo("Impulse channel mismatch (%d vs %d): %s",
              info.n_channels, stream.n_channels, f.filename)
        return None
    if info.sample_rate != stream.sample_rate:
        if not f.resample:
            pinfo("Impulse rate mismatch without resample flag: %s", f.filename)
            return None
        cached = cache.resampled_filename(f.filename, stream.n_channels, stream.sample_rate)
        if os.path.exists(cached):
            audio, _ = wavio.read(cached)
        else:
            audio, src_rate = sndio.read(f.filename)
            audio = np.asarray(
                resample(audio.T, src_rate, stream.sample_rate, dtype=np.float64)
            ).T
            # reference caches resampled impulses as float32 WAV (buffer.cpp:260)
            wavio.write(cached, audio, stream.sample_rate, subtype="float32")
    else:
        audio, _ = sndio.read(f.filename)
    imp = audio.T  # [C, taps]
    if imp.shape[0] == 1 and stream.n_channels > 1:
        imp = np.repeat(imp, stream.n_channels, axis=0)
    return imp


def build_chain(
    config: EngineConfig, stream: StreamSpec, cache: Optional[ArtifactCache] = None
) -> BuiltChain:
    """Compose the configured chain for this stream format.

    Returns impulse=None when nothing is enabled (the plugin's passthrough
    case, foo_dsp_bfir.cpp:352-357).
    """
    cache = cache or ArtifactCache()
    chain: ChainSpec = config.chain
    fspec: FilterSpec = config.filter
    realsize = 4 if fspec.dtype == "float32" else 8

    impulses: List[Tuple[np.ndarray, float]] = []  # (impulse [C, taps], scale)

    if chain.eq.enabled:
        taps = fspec.block_length * config.eq_filter_blocks
        eq_path = cache.eq_filename(
            ISO_BANDS, chain.eq.mag_db, [0.0] * len(ISO_BANDS),
            taps // 2, realsize, stream.n_channels, stream.sample_rate,
        )
        audio = cache.get_or_render_wav(
            eq_path,
            lambda: np.repeat(
                np.asarray(render_fir(taps, chain.eq.mag_db, stream.sample_rate))[:, None],
                stream.n_channels, axis=1,
            ),
            stream.sample_rate,
            subtype="float32" if realsize == 4 else "float64",
        )
        impulses.append((audio.T, chain.eq.level_linear))

    for f in chain.files:
        if not (f.enabled and f.filename):
            continue
        imp = _load_impulse_file(f, stream, cache, realsize)
        if imp is not None:
            impulses.append((imp, f.level_linear))

    if not impulses:
        return BuiltChain(impulse=None, scale=1.0, n_partitions=1)

    if len(impulses) == 1:
        imp, scale = impulses[0]
    else:
        # compose by direct spectral multiplication, truncated to the longest
        # constituent's length (preprocessor.cpp:85,196-201 semantics)
        max_len = max(i.shape[1] for i, _ in impulses)
        acc, s0 = impulses[0]
        acc = acc * s0
        for nxt, s in impulses[1:]:
            acc = np.asarray(
                direct_convolve_spectra(acc, nxt * s, max_taps=max_len, dtype=np.float64)
            )
        imp, scale = acc[:, :max_len], 1.0

    n_partitions = max(1, -(-imp.shape[1] // fspec.block_length))
    return BuiltChain(impulse=imp, scale=scale, n_partitions=n_partitions)
