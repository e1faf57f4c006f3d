"""Portable hashing/shingling column functions.

All hot-path hashing is JVM-side (md5 / xxhash64 / conv are codegen'd builtin
expressions). ``hash32`` is deliberately md5-based rather than xxhash64: the
correctness gate cross-checks results against an external SQL engine, and
md5-prefix-as-int is the one 32-bit hash every engine computes identically.
Engine-internal paths that need no portability (bucketing, salting) use
xxhash64 — one instruction-level hash, no string render.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: modulus for the (a*h + b) % p permutation family
MINHASH_P = 2147483647


def hash32(col: Column) -> Column:
    """First 8 hex chars of md5 as a bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def shingles(col: Column, k: int = 5) -> Column:
    """Character k-shingles of a string as an array (distinct). Built from
    sequence+transform — whole-stage-codegen, no UDF."""
    n = F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, k))
    )


def _perm(h: Column, a: int, b: int) -> Column:
    return (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def perm_params(n_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic LCG-derived (a, b) pairs — reproducible across engines
    (the oracle re-derives the identical list)."""
    params = []
    x = seed
    for _ in range(n_hashes):
        x = (x * 1103515245 + 12345) % (2**31)
        a = (x % (MINHASH_P - 2)) + 1
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % MINHASH_P
        params.append((a, b))
    return params


def minhash_signature(shingle_hashes: Column, n_hashes: int, seed: int = 7) -> Column:
    """MinHash signature (array<bigint>, length n_hashes) from an array of
    shingle hash32s: sig[k] = min over shingles of (a_k * h + b_k) % p."""
    sig = []
    for a, b in perm_params(n_hashes, seed):
        sig.append(
            F.array_min(F.transform(shingle_hashes, lambda h: _perm(h, a, b)))
        )
    return F.array(*sig)
