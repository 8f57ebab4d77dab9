"""VARIANT-lite (Doris 2.1 [docs: variant], SURVEY §1.4): typed
subcolumn access over JSON text columns — session subscript rewrite +
the variant_schema/variant_shred operators."""

from __future__ import annotations

import pytest

from palo_spark.operators.variant import variant_schema, variant_shred
from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def test_variant_schema_inference(spark):
    df = spark.createDataFrame(
        [('{"k": 87, "tag": "a", "score": 1.5, "ok": true}',),
         ('{"k": 3, "tag": "b", "ok": false}',),
         ('{"k": 9, "score": 2}',)], "props string")
    # least-upper-bound typing: ints everywhere -> bigint; 1.5 and 2
    # mixed -> double; true/false -> boolean; free text -> string
    assert variant_schema(df, "props") == {
        "k": "bigint", "ok": "boolean", "score": "double", "tag": "string"}


def test_variant_shred_typed_columns(spark):
    df = spark.createDataFrame(
        [('{"k": 87, "tag": "a"}',), ('{"k": 3}',)], "props string")
    out = variant_shred(df, "props")
    assert dict(out.dtypes)["props_k"] == "bigint"
    rows = {r["props_k"]: r["props_tag"] for r in out.collect()}
    assert rows == {87: "a", 3: None}  # absent key -> NULL (sparse)


def test_variant_schema_key_cap(spark):
    import json
    rows = [(json.dumps({f"key{i}": i}),) for i in range(40)]
    df = spark.createDataFrame(rows, "props string")
    with pytest.raises(ValueError, match="max_keys"):
        variant_schema(df, "props", max_keys=10)


def test_variant_subscript_sql(ps):
    """`props['a']` / nested `props['b']['c']` on a declared VARIANT
    column rewrite to JSON-path access; a same-named subscript on a
    NON-variant column is untouched; string literals survive."""
    ps.sql("CREATE TABLE ev (k BIGINT, props VARIANT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("""INSERT INTO ev VALUES (1, '{"a": 5, "b": {"c": 7}}'), """
           """(2, '{"a": 9}')""")
    rows = {r["k"]: (r["a"], r["bc"]) for r in ps.sql(
        "SELECT k, CAST(props['a'] AS INT) AS a, "
        "CAST(props['b']['c'] AS INT) AS bc FROM ev ORDER BY k").collect()}
    assert rows == {1: (5, 7), 2: (9, None)}
    # WHERE and GROUP BY positions rewrite too
    assert ps.sql("SELECT count(*) AS n FROM ev "
                  "WHERE CAST(props['a'] AS INT) > 6").collect()[0]["n"] == 1
    # view bodies see the rewrite (statement-wide, not query-tail-only)
    ps.sql("CREATE VIEW evv AS SELECT CAST(props['a'] AS INT) AS a FROM ev")
    assert sorted(r["a"] for r in ps.sql("SELECT a FROM evv").collect()) == [5, 9]
    # a genuine map column with the same subscript shape is untouched
    df = ps.spark.createDataFrame([({"a": 1},)], "m map<string,int>")
    df.createOrReplaceTempView("mm")
    assert ps.sql("SELECT m['a'] AS x FROM mm").collect()[0]["x"] == 1


def test_variant_like_clone_keeps_variant_cols(ps):
    ps.sql("CREATE TABLE vsrc (k BIGINT, props VARIANT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE TABLE vdst LIKE vsrc")
    ps.sql("""INSERT INTO vdst VALUES (1, '{"z": 4}')""")
    assert ps.sql("SELECT CAST(props['z'] AS INT) AS z FROM vdst"
                  ).collect()[0]["z"] == 4


def test_variant_array_subscripts(ps):
    """Array elements inside a VARIANT: `props['arr'][0]` rewrites to
    the JSON array path `$.arr[0]`; CAST of the whole array works via
    from_json at the user's discretion; a bare-integer FIRST subscript
    never rewrites (could be a genuine array column)."""
    ps.sql("CREATE TABLE va (k BIGINT, props VARIANT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("""INSERT INTO va VALUES (1, '{"arr": [7, 8, 9], """
           """"m": {"x": [1, 2]}}')""")
    r = ps.sql("SELECT CAST(props['arr'][0] AS INT) AS a0, "
               "CAST(props['arr'][2] AS INT) AS a2, "
               "CAST(props['m']['x'][1] AS INT) AS mx1 FROM va").collect()[0]
    assert (r["a0"], r["a2"], r["mx1"]) == (7, 9, 2)
    # LATERAL explode over a variant array via explode_json_array_int
    rows = ps.sql("SELECT e FROM va LATERAL VIEW "
                  "explode_json_array_int(props['arr']) t AS e").collect()
    assert sorted(r["e"] for r in rows) == [7, 8, 9]
