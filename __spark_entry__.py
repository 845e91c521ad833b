"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship anonymise pipeline on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions); ``oracle_sql()`` gives the
DuckDB-runnable ANSI SQL the driver compares each query against
(row-count + schema + order-insensitive value-hash at sf0.01).

Implementations live in ``database_anonymiser_minimiser_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_anonymiser_minimiser_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.entry_df(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here (non-SQL-
    expressible ops) get the driver's weaker rows-only check."""
    return dict(Q.ORACLE)
