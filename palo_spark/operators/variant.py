"""VARIANT-lite shredding: typed subcolumn extraction from a JSON
text column ([docs: variant] — Doris 2.1 shreds VARIANT values into
typed subcolumns at load time; the Spark-first equivalent is read-time
shredding into real DataFrame columns, which Catalyst then prunes and
pushes down like any other projection).

Scale posture: schema inference is ONE aggregate over the key space
(not a ``.collect()`` of rows) — the per-key type vote travels as a
few counters per distinct key, so the driver materializes a frame the
size of the SCHEMA, never the data. The shredding itself is pure
``from_json``/``get_json_object`` projections — whole-stage codegen,
zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: fail-loud bound on the number of distinct keys an inferred variant
#: schema may carry — a key space that grows with the data (e.g. ids
#: used as keys) is not a schema, and silently shredding it would
#: explode the column count. Same posture as semantic_decontaminate's
#: cap: loud, with the knob in the error message.
MAX_INFERRED_KEYS = 256


def variant_schema(
    df: DataFrame, col: str, max_keys: int = MAX_INFERRED_KEYS
) -> dict[str, str]:
    """Infer the key -> Spark-type mapping of a JSON object column.

    One keyed aggregate: parse to ``map<string,string>``, explode
    the entries, and per key count how many non-null values survive
    ``try_cast`` to bigint / double / boolean. A type wins only when
    EVERY non-null occurrence casts (Doris promotes conflicting
    subcolumn types the same way — least upper bound, string at the
    top). Returns ``{key: 'bigint'|'double'|'boolean'|'string'}``.
    """
    parsed = df.select(
        F.explode(
            F.from_json(F.col(col), "map<string,string>")
        ).alias("k", "v")
    ).where(F.col("v").isNotNull())
    votes = (
        parsed.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.count(F.expr("try_cast(v AS BIGINT)")).alias("n_big"),
            F.count(F.expr("try_cast(v AS DOUBLE)")).alias("n_dbl"),
            F.count(F.expr("try_cast(v AS BOOLEAN)")).alias("n_bool"),
        )
        .collect()  # bounded: one row per DISTINCT KEY (schema-sized)
    )
    if len(votes) > max_keys:
        raise ValueError(
            f"variant column {col!r} has {len(votes)} distinct keys "
            f"(> max_keys={max_keys}); a data-sized key space is not a "
            "schema — pass explicit keys or raise max_keys"
        )
    out: dict[str, str] = {}
    for r in sorted(votes, key=lambda r: r["k"]):
        if r["n_big"] == r["n"]:
            out[r["k"]] = "bigint"
        elif r["n_dbl"] == r["n"]:
            out[r["k"]] = "double"
        elif r["n_bool"] == r["n"]:
            out[r["k"]] = "boolean"
        else:
            out[r["k"]] = "string"
    return out


def variant_shred(
    df: DataFrame,
    col: str,
    schema: dict[str, str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Shred a JSON object column into typed top-level columns.

    ``schema`` maps key -> Spark type; inferred via
    :func:`variant_schema` when omitted. Each key becomes a column
    ``{prefix}{key}`` (prefix defaults to ``{col}_``) via
    ``get_json_object`` + cast — a pure projection that whole-stage
    codegen fuses into the scan; absent keys are NULL, exactly the
    sparse-subcolumn semantic of the upstream VARIANT type.
    """
    if schema is None:
        schema = variant_schema(df, col)
    prefix = f"{col}_" if prefix is None else prefix
    out = df
    for key, typ in schema.items():
        out = out.withColumn(
            f"{prefix}{key}",
            F.get_json_object(F.col(col), f"$.{key}").cast(typ),
        )
    return out
