"""Canonicalizer-safety guard for the driver's correctness gate.

The driver canonicalizes Spark/oracle results with pandas
``sort_values`` before hashing; list/dict cells raise
``TypeError: unhashable type`` there (seen in round 3 for
``sketch_bitmap_subset_ops`` / ``behavioral_retention`` /
``embedding_quantize_int8``).  Every oracle-backed entry must therefore
emit only atomic column types — arrays belong serialized via
``array_join``/``to_json`` in BOTH the entry and its oracle.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from palo_spark.suite import all_oracles, all_queries

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_oracle_backed_entries_emit_scalar_columns_only(spark, sf_dir):
    oracles = all_oracles()
    bad: list[str] = []
    for name, fn in all_queries().items():
        if name not in oracles:
            continue  # rows-only: driver never canonicalizes the cells
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # pragma: no cover - surfaced by parity tests
            pytest.fail(f"{name}: failed to build DataFrame: {e}")
        for field in schema.fields:
            if isinstance(field.dataType, _COMPLEX):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "oracle-backed entries with canonicalizer-unsafe (non-scalar) "
        "output columns:\n  " + "\n  ".join(bad)
    )
