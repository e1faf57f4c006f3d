"""Property: batching must not change dedup results.

For ANY corpus and ANY split into ingest batches, the union of per-batch
keep-sets from dedup_incremental (with absorb between batches) must equal
the one-shot dedup_exact keep-set over the whole corpus; and the union of
per-batch neardup_incremental candidate pairs must equal the one-shot
minhash_lsh_pairs candidates (uncapped buckets). Texts draw from a tiny
alphabet so collisions are dense.

Arrival order: batches slice the corpus in id order (the realistic ingest
shape), so first-seen-wins and min-id-wins agree on WHICH doc is kept; for
out-of-order arrival the keep-set cardinality is still equal but membership
follows first-seen — that semantic is pinned by the unit tests instead."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tg_data_connector_spark.operators.dedup_text import (
    create_dedup_index,
    create_neardup_index,
    dedup_exact,
    dedup_incremental,
    minhash_lsh_pairs,
    neardup_incremental,
)

TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "alpha beta gamma delta epsilon zeta eta thetas",
    "one completely different document body of words",
    "another unrelated piece of text with other words",
    None,
]


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = [
        (i, draw(st.sampled_from(TEXTS))) for i in range(n)
    ]
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=n),
                min_size=0, max_size=2,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [n]:
        if c > prev:
            batches.append(rows[prev:c])
            prev = c
    return batches


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=corpora())
def test_batched_dedup_equals_one_shot(spark, tmp_path_factory, batches):
    root = str(tmp_path_factory.mktemp("prop"))
    schema = "doc_id bigint, text string"
    all_rows = [r for b in batches for r in b]
    full = spark.createDataFrame(all_rows, schema)

    idx = create_dedup_index(spark, f"{root}/fp", n_buckets=2)
    nidx = create_neardup_index(spark, f"{root}/band", n_buckets=2)
    keeps, pairs = set(), set()
    for j, rows in enumerate(batches):
        b = spark.createDataFrame(rows, schema)
        out = dedup_incremental(idx, b, batch_lsn=j + 1)
        keeps |= {
            int(r["doc_id"])
            for r in out.collect()
            if r["status"] == "kept"
        }
        pairs |= {
            tuple(r)
            for r in neardup_incremental(
                nidx, b, batch_lsn=j + 1, bucket_cap=1000
            ).collect()
        }

    exact = {
        int(r["doc_id"])
        for r in dedup_exact(full.where("text IS NOT NULL")).collect()
    }
    null_ids = {r[0] for r in all_rows if r[1] is None}
    assert keeps == exact | null_ids

    one_shot = {
        tuple(r)
        for r in minhash_lsh_pairs(
            full.selectExpr("cast(doc_id as string) doc_id", "text")
        ).collect()
    }
    assert pairs == one_shot
