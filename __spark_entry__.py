"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship NEW_PATRONS-shaped chain at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator pack from
``queries.py`` (one entry per implemented SURVEY.md §2 operator plus the
north-star extended operators; DuckDB oracle twins wherever the semantics are
ANSI-SQL-expressible, rows-only otherwise).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from queries import flagship_patron_chain

    return flagship_patron_chain(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from queries import ORACLE_SQL

    return dict(ORACLE_SQL)
