"""Vectorized numpy replica of Spark's ``XxHash64`` over LONG fields.

Spark's ``F.xxhash64(a, b, ...)`` on long columns folds the fields
left-to-right through ``XXH64.hashLong``::

    hash = seed(42)
    for field in fields:        # null fields are skipped
        hash = hashLong(field, hash)

where ``hashLong`` is the fixed-width-8 XXH64 path::

    h  = seed + PRIME64_5 + 8
    h ^= rotl(input * PRIME64_2, 31) * PRIME64_1
    h  = rotl(h, 27) * PRIME64_1 + PRIME64_4
    fmix: h ^= h>>33; h *= PRIME64_2; h ^= h>>29; h *= PRIME64_3; h ^= h>>32

Everything is uint64 wraparound arithmetic, so the whole pipeline
vectorizes on ``np.uint64`` arrays — this module exists so Arrow
kernels can reproduce JVM-side xxhash64 chains BIT-FOR-BIT (the
`_gram_windows` rolling chain) instead of paying the interpreted
HigherOrderFunction evaluator per element. Parity with the JVM is
pinned by ``tests/test_gram_kernel_parity.py`` (64-case direct check
plus whole-operator output equality).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_SEED = np.uint64(42)
_R31, _R27, _R33, _R29, _R32, _R64 = (
    np.uint64(31),
    np.uint64(27),
    np.uint64(33),
    np.uint64(29),
    np.uint64(32),
    np.uint64(64),
)
_EIGHT = np.uint64(8)


def xxh64_hash_long(inp: np.ndarray, seed) -> np.ndarray:
    """``XXH64.hashLong(inp, seed)`` elementwise on uint64 arrays.
    ``seed`` may be a scalar or an array broadcastable to ``inp``."""
    with np.errstate(over="ignore"):
        h = seed + _P5 + _EIGHT
        k1 = inp * _P2
        k1 = (k1 << _R31) | (k1 >> (_R64 - _R31))
        h = h ^ (k1 * _P1)
        h = ((h << _R27) | (h >> (_R64 - _R27))) * _P1 + _P4
        h ^= h >> _R33
        h *= _P2
        h ^= h >> _R29
        h *= _P3
        h ^= h >> _R32
        return h


def xxh64_longs2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``F.xxhash64(a, b)`` for non-null long columns: the two-field
    fold ``hashLong(b, hashLong(a, 42))``, elementwise."""
    return xxh64_hash_long(b, xxh64_hash_long(a, _SEED))
