"""ConditionalPutTableFS: the raw-object-store seam (no atomic rename).

VERDICT r3 directive #5: the commit protocol's two guarantees must map onto a
store exposing only conditional PUTs (S3 ``If-None-Match: *``, GCS
``ifGenerationMatch=0``) and atomic whole-object replace. An in-memory mock
store drives the tests; production wires a boto3/gcs adapter with the same
five methods.
"""

import time

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema, merge_upsert
from tg_data_connector_spark.lake.fs import ConditionalPutTableFS


class MockStore:
    """Flat key->bytes object store with conditional create. No directories,
    no rename — the raw-S3 shape.

    ``mirror_root``: in production Spark writes the DATA files through its own
    Hadoop IO into the SAME bucket the store client lists; the mock emulates
    that shared namespace by also surfacing local files under this directory
    (where local-mode Spark actually lands its parquet)."""

    def __init__(self, mirror_root: str | None = None):
        self.objects: dict[str, bytes] = {}
        self.mtimes: dict[str, float] = {}
        self.puts = 0
        self.mirror_root = mirror_root

    def get(self, key):
        return self.objects.get(key)

    def put(self, key, data: bytes):
        self.puts += 1
        self.objects[key] = bytes(data)
        self.mtimes[key] = time.time()

    def put_if_absent(self, key, data: bytes) -> bool:
        if key in self.objects:
            return False
        self.put(key, data)
        return True

    def list_prefix(self, prefix):
        import os

        keys = {k for k in self.objects if k.startswith(prefix)}
        if self.mirror_root and prefix.startswith(self.mirror_root):
            for root, _dirs, files in os.walk(prefix.rstrip("/")):
                keys.update(os.path.join(root, f) for f in files)
        return sorted(keys)

    def delete(self, key):
        self.objects.pop(key, None)
        self.mtimes.pop(key, None)

    def mtime(self, key):
        return self.mtimes[key]


def test_excl_create_arbitrates_version_claim():
    """Two racing writers cannot both claim a snapshot version file."""
    fs = ConditionalPutTableFS(MockStore())
    fs.write_text_excl("/t/_versions/v3.json", '{"a": 1}')
    with pytest.raises(FileExistsError):
        fs.write_text_excl("/t/_versions/v3.json", '{"b": 2}')
    assert fs.read_text("/t/_versions/v3.json") == '{"a": 1}'


def test_pointer_swap_is_whole_object():
    """The publish is one PUT: a reader sees the old or the new pointer."""
    store = MockStore()
    fs = ConditionalPutTableFS(store)
    with fs.write_text_atomic("/t/_current") as f:
        f.write("1")
    assert fs.read_text("/t/_current") == "1"
    before = store.puts
    with fs.write_text_atomic("/t/_current") as f:
        f.write("2")  # buffered — nothing hits the store until exit
        assert fs.read_text("/t/_current") == "1"
    assert fs.read_text("/t/_current") == "2"
    assert store.puts == before + 1  # exactly one PUT, no temp objects


def test_failed_atomic_write_leaves_old_pointer():
    fs = ConditionalPutTableFS(MockStore())
    with fs.write_text_atomic("/t/_current") as f:
        f.write("1")
    with pytest.raises(RuntimeError):
        with fs.write_text_atomic("/t/_current") as f:
            f.write("torn")
            raise RuntimeError("writer died mid-publish")
    assert fs.read_text("/t/_current") == "1"


def test_prefix_listing_semantics():
    fs = ConditionalPutTableFS(MockStore())
    fs.write_text_excl("/t/_versions/v1.json", "a")
    fs.write_text_excl("/t/_versions/v2.json", "b")
    fs.write_text_excl("/t/data/c-1/b=0/f1.parquet", "x")
    fs.write_text_excl("/t/data/c-1/b=1/f2.parquet", "y")
    assert fs.listdir("/t/_versions") == ["v1.json", "v2.json"]
    assert fs.listdir("/t/data") == ["c-1"]
    assert fs.isdir("/t/data/c-1")
    assert not fs.isdir("/t/_versions/v1.json")
    assert fs.exists("/t/data/c-1") and fs.exists("/t/_versions/v1.json")
    assert fs.list_files_recursive("/t/data") == [
        "/t/data/c-1/b=0/f1.parquet",
        "/t/data/c-1/b=1/f2.parquet",
    ]
    fs.rmtree("/t/data/c-1")
    assert not fs.exists("/t/data/c-1")


def test_lake_table_lifecycle_on_conditional_put_store(spark, tmp_table_root):
    """Full metadata lifecycle (create -> append -> MERGE -> conflict guard)
    over the conditional-put seam. Data parquet still lands on local disk via
    Spark (the seam covers metadata only — same split as HadoopTableFS)."""
    store = MockStore(mirror_root=tmp_table_root)
    fs = ConditionalPutTableFS(store)
    schema = TableSchema(
        [("doc_id", "string"), ("tokens", "array<int>"),
         ("n_tok", "int"), ("source", "string")]
    )
    t = LakeTable.create(spark, tmp_table_root, schema, "doc_id", 4, fs=fs)
    seed = spark.range(20).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.append(seed)
    assert t.read().count() == 20
    ev = spark.createDataFrame(
        [("d1", [42], 1, "s", "U", 10, 0), ("d2", None, None, "s", "D", 10, 1)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, commit_lsn bigint, seq_no bigint",
    )
    merge_upsert(t, ev, summary_update={"batch_id": "m1"})
    t2 = LakeTable(spark, tmp_table_root, fs=fs)  # re-open from store metadata
    rows = {r["doc_id"]: r["tokens"] for r in t2.read().collect()}
    assert rows["d1"] == [42] and "d2" not in rows and len(rows) == 19
    assert "m1" in t2.snapshot().applied_batches()
    # every version file lives in the STORE, not on the local FS
    import os

    assert not os.path.exists(f"{tmp_table_root}/_versions")
    assert store.list_prefix(f"{tmp_table_root}/_versions/")
