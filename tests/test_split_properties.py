"""Property-based invariants for the split planners (SURVEY §2 S2/S3).

The reference's contract (SingleTableSplitUtil.java:33-124,
RangeSplitUtil.java:43-128): the emitted predicate list DISJOINTLY COVERS the
key domain — every row (including NULL keys) matches exactly one slice, for
any bounds and any slice count. Hypothesis drives the bounds; DuckDB
evaluates the SQL predicates, so the invariant is checked against a real SQL
engine without a Spark session.
"""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from tg_data_connector_spark.sources.jdbc import (
    range_split_predicates,
    string_range_split_predicates,
)


def _check_disjoint_cover(con, preds: list[str]) -> None:
    matches = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    bad = con.execute(
        f"SELECT count(*) FROM t WHERE ({matches}) <> 1"
    ).fetchone()[0]
    assert bad == 0


@settings(max_examples=60, deadline=None)
@given(
    lo=st.integers(min_value=-(2**40), max_value=2**40),
    width=st.integers(min_value=0, max_value=2**20),
    n=st.integers(min_value=1, max_value=40),
)
def test_range_split_disjoint_cover(lo, width, n):
    hi = lo + width
    preds = range_split_predicates(lo, hi, n, "pk")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS "
        f"SELECT CASE WHEN r % 97 = 0 THEN NULL ELSE {lo} + "
        f"CAST(floor(random() * ({width} + 1)) AS BIGINT) END AS pk "
        "FROM range(500) _(r)"
    )
    # force the exact bounds into the sample so edges are always tested
    con.execute(f"INSERT INTO t VALUES ({lo}), ({hi}), (NULL)")
    _check_disjoint_cover(con, preds)


_ascii = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(a=_ascii, b=_ascii, n=st.integers(min_value=1, max_value=20))
def test_string_radix_split_disjoint_cover(a, b, n):
    lo, hi = (a, b) if a <= b else (b, a)
    preds = string_range_split_predicates(lo, hi, n, "pk")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (pk VARCHAR)")
    # sample points inside [lo, hi] by construction: the bounds, and the
    # bounds with suffixes (suffixes of lo sort >= lo; prefixes of hi <= hi)
    pts = {lo, hi}
    for i in range(len(hi)):
        if lo <= hi[: i + 1] <= hi:
            pts.add(hi[: i + 1])
    for c in ("0", "A", "a", "~"):
        cand = lo + c
        if lo <= cand <= hi:
            pts.add(cand)
    con.executemany("INSERT INTO t VALUES (?)", [(p,) for p in pts])
    con.execute("INSERT INTO t VALUES (NULL)")
    _check_disjoint_cover(con, preds)
