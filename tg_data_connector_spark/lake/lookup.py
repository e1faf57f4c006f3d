"""Point-lookup path: driver-side bucket computation + pruned, pushed scan.

The 100-TB read pattern bucketing exists for: "give me these doc_ids" must
touch O(|keys|) buckets of the table, never the table. Two pieces:

  * ``bucket_of`` — a pure-Python mirror of Spark's ``hash()`` (Murmur3
    x86-32, seed 42, over the key's UTF-8 bytes) so the bucket of a key is
    computable WITHOUT a Spark job or a scan. ``lake/table.bucket_expr``
    deliberately equals Spark's own ``HashPartitioning`` placement; this
    function equals both — property-tested against Spark's ``F.hash`` in
    ``tests/test_lookup.py`` (hypothesis, arbitrary unicode).
  * ``LakeTable.lookup(keys)`` (``table.py``, built on this module) — prunes the snapshot's file list to the keys' buckets, then drops files
    whose manifest-recorded key min/max excludes every probe (column-stats
    data skipping, Iceberg-style — decisive when appends / MoR deltas stack
    several files per bucket), then applies an IN-list predicate that Spark
    pushes into the parquet scan, so within a surviving file only the row
    groups whose doc_id min/max straddle a probe key are decoded (tight when
    the table was written key-sorted, see ``sort_on_write`` in
    ``write_data_files``).

The reference has no point-read at all — reads are full-table SELECTs
(``CommonRdbmsReader.java`` builds ``SELECT cols FROM table WHERE range``);
this is the capability its TigerGraph *target* serves and a lake table must
replicate to be a drop-in store.
"""

from __future__ import annotations

import struct


def _mixk1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    return (k1 * 0x1B873593) & 0xFFFFFFFF


def _mixh1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """Spark's ``Murmur3_x86_32.hashUnsafeBytes`` over ``data`` — the exact
    function behind ``F.hash()`` on a string column (seed 42). Returns a
    SIGNED 32-bit int, matching Spark's int result.

    Tail handling is Spark's, not canonical Murmur3: each byte past the last
    aligned word is sign-extended and mixed as its own k1 block (canonical
    Murmur3 accumulates the tail into one k1) — the difference matters for
    any key whose UTF-8 length isn't a multiple of 4.
    """
    h1 = seed & 0xFFFFFFFF
    n_aligned = len(data) - (len(data) % 4)
    for (word,) in struct.iter_unpack("<i", data[:n_aligned]):
        h1 = _mixh1(h1, _mixk1(word & 0xFFFFFFFF))
    for i in range(n_aligned, len(data)):
        b = data[i]
        if b >= 0x80:  # JVM getByte is signed; sign-extend before mixing
            b -= 0x100
        h1 = _mixh1(h1, _mixk1(b & 0xFFFFFFFF))
    out = _fmix(h1, len(data))
    return out - 0x100000000 if out >= 0x80000000 else out


def bucket_of(key: str, n_buckets: int) -> int:
    """The bucket ``bucket_expr`` / ``repartition(n, key)`` assigns ``key``
    to: ``pmod(murmur3(utf8(key)), n)``. Driver-side, no Spark session."""
    h = murmur3_x86_32(key.encode("utf-8"))
    return h % n_buckets  # python % is already pmod (sign of divisor)
