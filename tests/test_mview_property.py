"""Property-based incremental-view maintenance: ARBITRARY change sequences
(upserts that move rows across groups, deletes, NULL group values, groups
born and dying, multi-commit refresh windows) must keep the maintained
aggregate identical to a full GROUP BY recompute after every refresh.

This adversarially pins the signed-delta algorithm in lake/mview.py — the
classic failure modes of incremental view maintenance (a group's count
reaching zero but the row surviving, NULL group keys colliding with empty
strings, a key's intra-window intermediate states double-counting) are all
reachable from this generator.
"""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.lake.merge import merge_upsert
from tg_data_connector_spark.lake.mview import (
    create_aggregate_view,
    refresh_aggregate,
)

SCHEMA = TableSchema(
    [("doc_id", "string"), ("n_tok", "int"), ("source", "string")]
)
GROUP = ["source"]
MEASURES = {"n": ("count", "*"), "tok": ("sum", "n_tok")}

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("commit_lsn", T.LongType()),
        T.StructField("seq_no", T.LongType()),
    ]
)

# NULL and "" are distinct groups; "" vs NULL collisions are a classic
# sentinel-coding bug.
SOURCES = ["a", "b", "", None]
DOCS = [f"d{k}" for k in range(6)]


@st.composite
def change_batches(draw):
    n_batches = draw(st.integers(min_value=1, max_value=4))
    batches, lsn = [], 0
    for _ in range(n_batches):
        n_rows = draw(st.integers(min_value=1, max_value=5))
        docs = draw(
            st.lists(
                st.sampled_from(DOCS),
                unique=True,
                min_size=n_rows,
                max_size=n_rows,
            )
        )
        rows = []
        for d in docs:  # one row per key per batch (merge contract)
            lsn += 1
            if draw(st.booleans()) or draw(st.booleans()):  # 75% upsert
                rows.append(
                    (d, draw(st.integers(min_value=0, max_value=9)),
                     draw(st.sampled_from(SOURCES)), "U", lsn, 0)
                )
            else:
                rows.append((d, None, None, "D", lsn, 0))
        # refresh after this batch? (False -> the next refresh window spans
        # multiple source commits and intra-window states must cancel)
        batches.append((rows, draw(st.booleans())))
    return batches


def _expected(t):
    return {
        r["source"]: (r["n"], r["tok"])
        for r in t.read()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok"))
        .collect()
    }


def _got(v):
    rows = v.read().collect()
    for r in rows:
        assert r["_cnt"] == r["n"] and r["n"] > 0  # dead groups are deleted
    return {r["source"]: (r["n"], r["tok"]) for r in rows}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=change_batches())
def test_incremental_refresh_matches_full_recompute(spark, batches):
    root = tempfile.mkdtemp(prefix="prop_mview_")
    try:
        t = LakeTable.create(
            spark, f"{root}/src", SCHEMA, key="doc_id", n_buckets=2
        )
        v = create_aggregate_view(t, f"{root}/view", GROUP, MEASURES,
                                  n_buckets=2)
        for rows, do_refresh in batches:
            merge_upsert(t, spark.createDataFrame(rows, BATCH_SCHEMA))
            if do_refresh:
                refresh_aggregate(t, v, GROUP, MEASURES)
                assert _got(v) == _expected(t)
        refresh_aggregate(t, v, GROUP, MEASURES)  # drain any tail window
        assert _got(v) == _expected(t)
    finally:
        shutil.rmtree(root, ignore_errors=True)
