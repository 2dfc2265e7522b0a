"""Compiled-executable wisdom: the FFTW-wisdom analogue for this framework.

FFTW persists measured plans to disk and reloads them on every convolver
construction (/root/reference/brutefir/fftw_convolver.cpp:81-137). The XLA
compilation cache plays that role for plain XLA graphs, but NOT for
Pallas/Mosaic kernels: on this image a fresh process pays the full Mosaic
compile at first execution (measured 2026-08-21: 62 s for a trivial
kernel on a mid-health tunnel; 840-1100 s for the fused/aliased MAC
variants), which is exactly why the measured-faster fused-kernel shelf
stayed unwired (VERDICT r2 missing #2).

``jax.experimental.serialize_executable`` closes the gap: serializing the
compiled executable (62 KB for a small kernel) and deserializing it in a
fresh process skips the Mosaic compile entirely (measured: 0.12 s
deserialize + 1.6 s first run vs 62 s). ``Wisdom.jit`` wraps a function
with a disk-backed executable cache keyed by the lowered HLO fingerprint +
backend + device kind + jax version; entries are invalidated automatically
by any change to the traced computation (the fingerprint covers it).

Scope guard: an executable is only valid for the exact backend/device it
was compiled for; the key covers that, and any load/compile failure falls
back to a plain ``jax.jit`` so wisdom can never break the engine.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
from typing import Optional

import jax

from bfir_tpu.utils.logging import pinfo


def _backend_tag() -> str:
    # full compiler-stack identity (jaxlib + PJRT plugin version included,
    # ADVICE r3): a plugin upgrade must invalidate serialized executables —
    # an executable compiled by a buggy plugin build must not outlive it
    from bfir_tpu.utils.hashing import backend_fingerprint

    return backend_fingerprint()


class Wisdom:
    """Disk-backed compiled-executable cache.

    ``Wisdom(dir).jit(fn, donate_argnums=...)`` returns a callable with
    jax.jit semantics; per input shape/dtype signature it lowers once,
    fingerprints the HLO, and loads the serialized executable on a hit
    (skipping compilation — including Mosaic kernel compilation, which the
    XLA persistent cache does not cover) or compiles-and-stores on a miss.
    """

    # executables embed their constant operands (DFT weight matrices run to
    # MBs each), and every compute-source change orphans old keys — bound
    # the directory, evicting oldest-access first
    DEFAULT_MAX_BYTES = 2 << 30

    def __init__(self, cache_dir: Optional[str], enable: bool = True,
                 max_bytes: int = DEFAULT_MAX_BYTES):
        self.dir = cache_dir
        self.enable = enable and cache_dir is not None
        self.max_bytes = max_bytes
        if self.enable:
            os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _evict(self) -> None:
        try:
            entries = []
            for name in os.listdir(self.dir):
                fp = os.path.join(self.dir, name)
                st = os.stat(fp)
                entries.append((st.st_atime, st.st_size, fp))
            total = sum(e[1] for e in entries)
            entries.sort()
            while total > self.max_bytes and entries:
                _, size, fp = entries.pop(0)
                os.unlink(fp)
                total -= size
        except OSError:
            pass

    def jit(self, fn, donate_argnums=(), static_argnums=()):
        jitted = jax.jit(fn, donate_argnums=donate_argnums,
                         static_argnums=static_argnums)
        if not self.enable:
            return jitted
        compiled_by_sig = {}
        wisdom = self
        donated = tuple(donate_argnums) if donate_argnums else ()

        def _sig(args):
            return tuple(
                (tuple(leaf.shape), str(leaf.dtype))
                for leaf in jax.tree_util.tree_leaves(args)
            )

        def _copy_leaf(x):
            # device-side copy (no host crossing — complex arrays can't
            # cross the axon tunnel, CLAUDE.md)
            return jax.numpy.copy(x) if isinstance(x, jax.Array) else x

        def wrapped(*args):
            sig = _sig(args)
            entry = compiled_by_sig.get(sig)
            if entry is None:
                entry = wisdom._load_or_compile(jitted, args)
                compiled_by_sig[sig] = entry
            exe, from_disk = entry
            if not from_disk:
                return exe(*args)
            # First call of a deserialized executable for this signature:
            # if it fails AFTER donation invalidated donated inputs, a bare
            # retry would dereference deleted buffers and lose the engine
            # state (ADVICE r3) — keep device-side copies to retry from.
            # One successful call validates the executable and the copy
            # overhead disappears.
            backups = {i: jax.tree_util.tree_map(_copy_leaf, args[i])
                       for i in donated if i < len(args)}
            try:
                out = exe(*args)
            except Exception as e:
                # a deserialized executable can be call-incompatible with
                # the live device topology (e.g. N virtual CPU devices vs
                # the single-device environment it was built in): recompile
                # rather than fail (wisdom must never break the engine)
                pinfo("Wisdom executable incompatible (%s); recompiling.", e)
                wisdom.hits -= 1
                compiled_by_sig[sig] = (jitted, False)
                if backups:
                    args = list(args)
                    for i, b in backups.items():
                        args[i] = b
                    args = tuple(args)
                return jitted(*args)
            compiled_by_sig[sig] = (exe, False)  # validated
            return out

        wrapped._wisdom = self  # introspection/tests
        return wrapped

    # -- internals -----------------------------------------------------------

    def _load_or_compile(self, jitted, args):
        try:
            lowered = jitted.lower(*args)
            hlo = lowered.as_text()
            key = hashlib.sha256(
                (hlo + "\n" + _backend_tag()).encode()).hexdigest()[:32]
            path = os.path.join(self.dir, f"wisdom-{key}.pkl")
        except Exception as e:  # tracing failed under lower(): plain jit
            pinfo("Wisdom lowering failed (%s); falling back to jit.", e)
            return (jitted, False)
        if os.path.exists(path):
            try:
                from jax.experimental.serialize_executable import (
                    deserialize_and_load)

                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                exe = deserialize_and_load(payload, in_tree, out_tree)
                self.hits += 1
                return (exe, True)
            except Exception as e:
                pinfo("Wisdom load failed (%s); recompiling.", e)
                try:
                    os.unlink(path)
                except OSError:
                    pass
        try:
            compiled = lowered.compile()
        except Exception as e:
            pinfo("Wisdom compile failed (%s); falling back to jit.", e)
            return (jitted, False)
        self.misses += 1
        if os.environ.get("BFIR_WISDOM_DEBUG"):
            with open(path.replace(".pkl", ".hlo"), "w") as f:
                f.write(hlo)
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            fd, tmp = tempfile.mkstemp(dir=self.dir)
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)  # atomic vs concurrent sessions
            self._evict()
        except Exception as e:
            pinfo("Wisdom store failed (%s); executable not cached.", e)
        return (compiled, False)
