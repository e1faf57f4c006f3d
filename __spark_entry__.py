"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship: the full CDC engine (seed -> changelog replay with
             snapshot/watermark commits -> final table) at sf0.001.
queries()  — one entry per implemented operator (SURVEY.md §2 + the
             training-data-pipeline additions); each runs at (spark, sf_dir).
oracle_sql() — DuckDB-equivalent SQL per query (every entry has one: the LSH
             bucketer is integer-quantized so its bucket assignment is exact,
             and the stub media featurizer is closed-form).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tg_data_connector_spark.gate import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tg_data_connector_spark.gate import q_cdc_merge_final_state

    return q_cdc_merge_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql() for name, (_, sql) in QUERIES.items() if sql is not None}
