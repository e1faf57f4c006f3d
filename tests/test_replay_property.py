"""Property-based replay equivalence: ARBITRARY small event logs — shapes
the deterministic generator never emits — must reach the same final table
state as the engine-independent window-function oracle (tests/oracle.py).

Coverage the fixed fixtures cannot give: empty logs, all-dirty logs,
single-doc hammering (many versions of one key), empty token arrays,
deletes of never-seen docs, duplicate at-least-once deliveries of random
subsets, random batch splits, and both payload modes (pre-decoded tokens
vs packed-binary payload through the vectorized Arrow parse path).

Version pairs (commit_lsn, seq_no) are drawn globally UNIQUE: when two
events for one doc carry the identical version, last-writer-wins is
genuinely ambiguous — engine (max_by on the packed version) and oracle
(row_number desc) may legitimately disagree, so that shape is excluded
rather than asserted. Exact duplicate DELIVERIES of one event (same
version, same part/offset — the at-least-once case) are generated on
purpose and must converge.
"""

import math
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tg_data_connector_spark.cdc import (
    ErrorLimit,
    ReplayConfig,
    ReplayEngine,
    gen_seed_sequences,
)
from tg_data_connector_spark.cdc.genlog import with_binary_payload
from tg_data_connector_spark.lake import LakeTable, TableSchema

from oracle import oracle_final_state

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)

LOG_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("commit_lsn", T.LongType()),
        T.StructField("seq_no", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("part", T.IntegerType()),
        T.StructField("offset", T.LongType()),
    ]
)

N_PARTS = 2


@st.composite
def event_logs(draw):
    n_docs = draw(st.integers(min_value=1, max_value=5))
    pool = [f"d{k:08d}" for k in range(n_docs)]
    n_ev = draw(st.integers(min_value=0, max_value=18))
    versions = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=40),
                st.integers(min_value=0, max_value=6),
            ),
            unique=True,
            min_size=n_ev,
            max_size=n_ev,
        )
    )
    rows = []
    for idx in range(n_ev):
        lsn, seq = versions[idx]
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        doc = draw(st.sampled_from(pool))
        kind = draw(
            st.sampled_from(
                ["clean"] * 6 + ["bad_ntok", "null_doc", "bad_op", "null_tok"]
            )
        )
        if op == "D":
            tokens, n_tok = None, None
        else:
            tokens = draw(
                st.lists(
                    st.integers(min_value=0, max_value=999),
                    min_size=0,
                    max_size=6,
                )
            )
            n_tok = len(tokens)
        if kind == "bad_ntok" and op != "D":
            n_tok = (n_tok or 0) + 1  # violates the size invariant -> dirty
        elif kind == "null_doc":
            doc = None  # dirty for every op
        elif kind == "bad_op":
            op = draw(st.sampled_from(["X", None]))  # unknown envelope
        elif kind == "null_tok" and op != "D":
            tokens, n_tok = None, 1  # I/U without a token array -> dirty
        rows.append(
            (op, lsn, seq, doc, tokens, n_tok, "src_p", idx % N_PARTS,
             idx // N_PARTS)
        )
    # at-least-once: re-deliver a random subset EXACTLY (same version,
    # same part/offset) — the replay must converge regardless
    for idx in draw(
        st.lists(
            st.integers(min_value=0, max_value=max(n_ev - 1, 0)),
            max_size=4,
        )
    ):
        if rows:
            rows.append(rows[idx % len(rows)])
    return rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=event_logs(),
    seed_docs=st.integers(min_value=0, max_value=3),
    batches=st.integers(min_value=1, max_value=3),
    payload_mode=st.booleans(),
)
def test_replay_random_logs_match_oracle(
    spark, rows, seed_docs, batches, payload_mode
):
    log = spark.createDataFrame(rows, LOG_SCHEMA)
    root = tempfile.mkdtemp(prefix="prop_replay_")
    try:
        table = LakeTable.create(
            spark, f"{root}/t", SCHEMA, key="doc_id", n_buckets=2
        )
        seed = gen_seed_sequences(spark, seed_docs)
        if seed_docs:
            table.append(seed)
        engine_log = log
        if payload_mode:
            engine_log = with_binary_payload(log).drop("tokens")
        eng = ReplayEngine(
            spark,
            table,
            ReplayConfig(
                events_per_batch=max(1, math.ceil(len(rows) / batches)),
                parse_payload=payload_mode,
                error_limit=ErrorLimit(),  # all-dirty examples must replay
            ),
        )
        eng.replay(engine_log, run_id="prop")
        e = table.read().select("doc_id", "tokens", "n_tok", "source")
        o = oracle_final_state(seed, log).select(
            "doc_id", "tokens", "n_tok", "source"
        )
        assert e.count() == o.count()
        assert e.exceptAll(o).count() + o.exceptAll(e).count() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
