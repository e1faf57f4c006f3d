"""Lineage flush URI routing + torn-write safety (ADVICE r3 items 1 and 5).

Hadoop canonicalizes URIs to the SINGLE-slash form (``file:/tmp/t`` — what
``Path.toString()``/``makeQualified`` return), which the old ``"://" in path``
check misrouted to a RELATIVE local path under CWD (evidence: a junk
``file:/…`` tree appeared in the repo root). These are driver-side pyarrow
paths — no Spark session needed.
"""

import os

import pyarrow.parquet as pq

from tg_data_connector_spark.cdc.metrics import LineageLog
from tg_data_connector_spark.lake.fs import local_path, uri_scheme


def _log_with_rows(root: str) -> LineageLog:
    log = LineageLog(root)
    log.record_batch("r", "b0", {0: {"hwm": 5, "events": 10, "dirty": 1}}, 3, 0.5)
    return log


def test_uri_scheme_detection():
    assert uri_scheme("file:/tmp/t") == "file"
    assert uri_scheme("file:///tmp/t") == "file"
    assert uri_scheme("hdfs:/user/t") == "hdfs"
    assert uri_scheme("s3a://bucket/t") == "s3a"
    assert uri_scheme("/tmp/t") is None
    assert uri_scheme("relative/path") is None
    assert local_path("file:/tmp/t") == "/tmp/t"
    assert local_path("file:///tmp/t") == "/tmp/t"
    assert local_path("/tmp/t") == "/tmp/t"


def test_flush_single_slash_file_uri_lands_at_real_path(tmp_path, monkeypatch):
    """file:/<abs> (Hadoop canonical form) must write to <abs>, never CWD."""
    cwd = tmp_path / "cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    root = tmp_path / "tbl"
    log = _log_with_rows(f"file:{root}")
    assert log.flush() == 1
    files = os.listdir(root / "_lineage")
    assert any(f.startswith("lineage-") and f.endswith(".parquet") for f in files)
    assert not (cwd / "file:").exists()  # the old bug's junk tree
    # the written file is a complete parquet readable standalone
    [fname] = [f for f in files if f.endswith(".parquet")]
    assert pq.read_table(str(root / "_lineage" / fname)).num_rows == 1


def test_flush_writes_temp_then_renames(tmp_path, monkeypatch):
    """A write torn mid-stream leaves only a hidden temp (Spark readers skip
    dot-files), never a corrupt lineage-*.parquet."""
    log = _log_with_rows(str(tmp_path / "t"))

    import pyarrow.parquet as real_pq

    def boom(tbl, out):
        out.write(b"torn")  # partial bytes, then die
        raise OSError("quota")

    monkeypatch.setattr(real_pq, "write_table", boom)
    try:
        log.flush()  # spark=None -> fallback re-raises
        raise AssertionError("expected OSError")
    except OSError:
        pass
    ldir = tmp_path / "t" / "_lineage"
    visible = [f for f in os.listdir(ldir) if not f.startswith(".")]
    assert visible == []  # no torn file a later read() would trip on
