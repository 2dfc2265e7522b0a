"""Hashing for artifact cache keys.

The reference keys its derived-artifact cache (rendered EQ FIRs, resampled
impulses, preconvolved chains) on DJB string hashes (``hash.c:113-124``,
used at ``equalizer.cpp:152-180``, ``buffer.cpp:243-253``,
``preprocessor.cpp:89-98``). We keep DJB for byte-level parity of the naming
scheme and add a stronger content hash for cache integrity.
"""

from __future__ import annotations

import hashlib


def djb_hash(data: bytes) -> int:
    """DJB string hash (hash.c:113-124), 32-bit."""
    h = 5381
    for b in data:
        h = ((h << 5) + h + b) & 0xFFFFFFFF
    return h


def content_key(*parts) -> str:
    """Stable hex key over heterogeneous parts (floats, strings, bytes)."""
    m = hashlib.sha256()
    for p in parts:
        if isinstance(p, bytes):
            m.update(p)
        else:
            m.update(repr(p).encode())
        m.update(b"\x00")
    return m.hexdigest()[:16]
