"""Registry-wide output contracts for the driver correctness gate.

The driver's comparator canonicalizes results by sorting raw pandas cells;
list/dict cells are unhashable and crash it (CORRECTNESS_r04:
``TypeError: unhashable type: 'list'`` on embedding_quantize /
embedding_matryoshka).  These gates make that failure mode impossible to
reintroduce: every registered query's output schema must contain only
scalar columns, and every query name registers exactly once (a duplicate
silently shadowed ``funnel_conversion`` + its oracle in r4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _query_names():
    from queries import SPARK_QUERIES

    return sorted(SPARK_QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_no_complex_output_columns(spark, name):
    """Every registry query — oracle-paired or rows-only — must emit only
    scalar (driver-canonicalizable) columns.  Arrays render via
    queries._arr_str / matching SQL string assembly instead."""
    from queries import SPARK_QUERIES

    df = SPARK_QUERIES[name](spark, SF)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name} emits complex-typed columns {bad}: the driver comparator "
        f"cannot canonicalize Array/Map/Struct cells — render as strings "
        f"(queries._arr_str) in BOTH engines"
    )


def test_duplicate_registration_raises():
    from queries import q

    with pytest.raises(ValueError, match="duplicate query registration"):
        q("flagship_patron_chain")(lambda spark, sf: None)


def test_oracle_names_subset_of_queries():
    from queries import ORACLE_SQL, SPARK_QUERIES

    orphans = set(ORACLE_SQL) - set(SPARK_QUERIES)
    assert not orphans, f"oracle SQL with no Spark twin: {sorted(orphans)}"
