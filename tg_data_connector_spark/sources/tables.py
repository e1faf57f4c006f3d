"""Sharded-table expansion: ``schema.table[0-31]suffix`` patterns.

The reference expands a bracketed shard range into N physical table scans
(``plugin-rdbms-util/.../util/TableExpandUtil.java:29-70``, regex at ``:12-13``)
and oversubscribes each by ``splitFactor`` slices (``ReaderSplitUtil.java:62-87``).
Spark-side, the expansion is the same string algebra; the N scans union into one
DataFrame and Catalyst/AQE own the slice sizing.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame

_PATTERN = re.compile(r"^(.*)\[(\d+)-(\d+)\](.*)$")


def expand_sharded_tables(pattern: str) -> list[str]:
    """'db.tab[0-3]_x' -> ['db.tab0_x', ..., 'db.tab3_x']; zero-padding of the
    lower bound is preserved (reference keeps literal digits)."""
    m = _PATTERN.match(pattern)
    if not m:
        return [pattern]
    head, lo, hi, tail = m.groups()
    if int(lo) > int(hi):
        raise ValueError(f"bad shard range in {pattern!r}")
    width = len(lo) if lo.startswith("0") and len(lo) > 1 else 0
    return [
        f"{head}{str(i).zfill(width) if width else i}{tail}"
        for i in range(int(lo), int(hi) + 1)
    ]


def read_sharded(pattern: str, read_one: Callable[[str], DataFrame]) -> DataFrame:
    """Union-by-name over all expanded shards; `read_one` maps a physical table
    name to its DataFrame (jdbc/parquet/...)."""
    names = expand_sharded_tables(pattern)
    return reduce(lambda a, b: a.unionByName(b), (read_one(n) for n in names))
