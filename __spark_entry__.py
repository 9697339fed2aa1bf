"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship suspected-bots detection spine on sf0.001.
queries()     — every declared query from SURVEY.md §2 (see
                dipa_collaborative_pulsar_idps_spark/queries/).
oracle_sql()  — DuckDB-equivalent SQL per query (omitted only for
                non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dipa_collaborative_pulsar_idps_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Mirai suspected-bots detection spine
    (filter → grouped sum → argmax → bias ratio → threshold)."""
    from dipa_collaborative_pulsar_idps_spark.queries.detection import suspected_bots

    return suspected_bots(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
