"""Engine-independent final-state oracle (FIXTURES.md 'Oracle for F1+F2').

Computed with plain PySpark window functions — deliberately a different
algorithm (global window over the whole log, no batching/merging/snapshots)
so it cannot share a bug with the engine's incremental path.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tg_data_connector_spark.cdc.quality import dirty_predicate

CORE = ["doc_id", "tokens", "n_tok", "source"]


def oracle_final_state(seed: DataFrame, changelog: DataFrame) -> DataFrame:
    ev = changelog.where(~dirty_predicate()).where(F.col("op") != "S")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("commit_lsn").desc(), F.col("seq_no").desc()
    )
    latest = (
        ev.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )
    cols = [c for c in CORE if c in changelog.columns]
    survivors = latest.where(F.col("op") != "D").select(cols)
    touched = latest.select("doc_id")
    untouched = seed.join(touched, "doc_id", "left_anti").select(
        [c for c in cols if c in seed.columns]
    )
    return survivors.unionByName(untouched, allowMissingColumns=True)
