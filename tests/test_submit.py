"""End-to-end ``spark-submit --py-files`` deployment test (north-rule shape).

The north rule requires the engine to run "via spark-submit --py-files on a
multi-executor cluster". This test exercises that literal deployment path:

1. build the deterministic zip artifact with ``tools/make_pyfiles.build``;
2. write a standalone driver script into a tmpdir (NOT the repo — the repo
   package must not be importable from the driver's cwd or PYTHONPATH);
3. ``spark-submit --master local[4] --py-files <zip> driver.py`` it;
4. the driver asserts the package was imported FROM THE ZIP, replays a
   deterministic changelog into a fresh lake table, and writes the final
   row count + an order-independent content checksum to a JSON file;
5. the test recomputes the same checksum in-process from the LWW oracle and
   asserts equality — zip-deployed run == in-repo oracle, byte-for-byte on
   (doc_id, tokens, n_tok, source).

Reference cue: the reference ships as a packaged job archive launched by a
wrapper (datax.py tars plugin dirs onto the classpath); --py-files is the
Spark-native equivalent of that deployment unit.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from oracle import oracle_final_state  # noqa: E402

N_EVENTS, N_DOCS, N_SEED = 3000, 500, 300

DRIVER = '''
import json, sys

def main():
    out_path, table_root = sys.argv[1], sys.argv[2]
    import tg_data_connector_spark
    pkg_file = tg_data_connector_spark.__file__
    # the whole point: the package must come from the --py-files zip, not a
    # repo checkout on some inherited path.
    assert ".zip" in pkg_file, f"package imported from {pkg_file}, not the zip"

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.getOrCreate()
    from tg_data_connector_spark.cdc import (
        ReplayConfig, ReplayEngine, gen_changelog, gen_seed_sequences,
    )
    from tg_data_connector_spark.lake import LakeTable, TableSchema

    schema = TableSchema([
        ("doc_id", "string"), ("tokens", "array<int>"),
        ("n_tok", "int"), ("source", "string"),
    ])
    t = LakeTable.create(spark, table_root, schema, key="doc_id", n_buckets=8)
    t.append(gen_seed_sequences(spark, %(n_seed)d))
    log = gen_changelog(spark, %(n_events)d, %(n_docs)d, n_parts=4)
    eng = ReplayEngine(spark, t, ReplayConfig(events_per_batch=1500))
    reports = eng.replay(log, run_id="submit-e2e")
    final = t.read().select("doc_id", "tokens", "n_tok", "source")
    agg = final.selectExpr(
        "count(*) as rows",
        "sum(cast(hash(doc_id, tokens, n_tok, source) as bigint)) as checksum",
    ).collect()[0]
    with open(out_path, "w") as fh:
        json.dump({
            "rows": agg["rows"],
            "checksum": int(agg["checksum"]),
            "batches": len(reports),
            "pkg": pkg_file,
        }, fh)
    spark.stop()

if __name__ == "__main__":
    main()
''' % {"n_seed": N_SEED, "n_events": N_EVENTS, "n_docs": N_DOCS}


def _spark_submit_bin():
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit_bin() is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_replay_matches_oracle(spark, tmp_path):
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "tg_data_connector_spark.zip"))
    driver_py = tmp_path / "driver.py"
    driver_py.write_text(DRIVER)
    out_json = tmp_path / "result.json"
    table_root = tmp_path / "tbl"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--py-files", zip_path,
            str(driver_py), str(out_json), str(table_root),
        ],
        cwd=str(tmp_path),  # repo dir must not be the cwd
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    got = json.loads(out_json.read_text())
    assert ".zip" in got["pkg"]
    assert got["batches"] == 2  # 3000 events / 1500 per batch

    # same deterministic generators in-process -> the LWW oracle
    from tg_data_connector_spark.cdc import gen_changelog, gen_seed_sequences

    seed = gen_seed_sequences(spark, N_SEED)
    log = gen_changelog(spark, N_EVENTS, N_DOCS, n_parts=4)
    want = (
        oracle_final_state(seed, log)
        .select("doc_id", "tokens", "n_tok", "source")
        .selectExpr(
            "count(*) as rows",
            "sum(cast(hash(doc_id, tokens, n_tok, source) as bigint)) as checksum",
        )
        .collect()[0]
    )
    assert got["rows"] == want["rows"]
    assert got["checksum"] == int(want["checksum"])
