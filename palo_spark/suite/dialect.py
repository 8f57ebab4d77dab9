"""MySQL-dialect edge semantics (SURVEY.md §0 dialect goals; §7 hard
item (d)): division ``/`` vs ``div``, modulo sign/zero, the lax implicit
cast matrix, and zero-date handling.

Doris speaks MySQL dialect: ``/`` is always real division (5/2 = 2.5),
``div`` is integer division truncating toward zero, ``x/0`` and ``x%0``
are NULL (not errors), and invalid casts yield NULL rather than raising.
Our engine runs with ``spark.sql.ansi.enabled=false`` (session default,
palo_spark/session.py) which gives exactly these MySQL-ish semantics;
these entries pin each edge against the DuckDB oracle so a future conf
or Spark-version change cannot silently flip them.

All expressions are per-row, whole-stage-codegen JVM arithmetic — no
shuffles beyond the final collect, scale-free by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.suite.util import register

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
q = register(QUERIES, ORACLE)


@q(
    "dialect_division_semantics",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / l_quantity          AS unit_price,
           l_quantity / 0                        AS div_zero,
           CAST(l_linenumber AS DOUBLE) / 2      AS half_line,
           l_orderkey // 7                       AS okey_div7,
           (0 - l_orderkey) // 7                 AS neg_div7,
           l_orderkey % 7                        AS okey_mod7,
           (0 - l_orderkey) % 7                  AS neg_mod7,
           l_orderkey % 0                        AS mod_zero
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def dialect_division_semantics(spark, sf_dir):
    """MySQL ``/`` is real division even on integers (5/2 = 2.5), ``div``
    truncates toward zero (also for negatives: -15 div 7 = -2, NOT the
    floor -3), ``%`` takes the dividend's sign, and both are NULL-safe on
    zero divisors (no error). DuckDB's ``//`` and ``%`` share exactly
    these conventions, so the oracle expresses them natively."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        (F.col("l_quantity") / F.lit(0)).alias("div_zero"),
        (F.col("l_linenumber").cast("double") / F.lit(2)).alias("half_line"),
        F.expr("l_orderkey div 7").alias("okey_div7"),
        F.expr("(-l_orderkey) div 7").alias("neg_div7"),
        (F.col("l_orderkey") % F.lit(7)).alias("okey_mod7"),
        ((-F.col("l_orderkey")) % F.lit(7)).alias("neg_mod7"),
        (F.col("l_orderkey") % F.lit(0)).alias("mod_zero"),
    )


@q(
    "dialect_implicit_cast_cmp",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey <= 2000
      AND l_shipdate >= DATE '1996-01-01'
      AND l_quantity > TRY_CAST('17' AS DOUBLE)
    """,
)
def dialect_implicit_cast_cmp(spark, sf_dir):
    """Implicit-cast comparisons: a DATE column compared to a string
    literal (string→date coercion) and a numeric column compared to a
    numeric *string* literal (string→double coercion) — the two
    commonest MySQL lax-comparison shapes. The Spark side leans on the
    implicit coercions (ANSI off); the oracle spells the casts out."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))  # string vs date
        & (F.col("l_quantity") > F.lit("17"))  # double vs string
    ).select("l_orderkey", "l_linenumber")


@q(
    "dialect_string_number_arith",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_linenumber AS DOUBLE) + 1                       AS str_plus,
           TRY_CAST('3abc' AS DOUBLE) + l_linenumber              AS junk_plus,
           TRY_CAST(' 7 ' AS INT) + l_linenumber                  AS trimmed_int
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def dialect_string_number_arith(spark, sf_dir):
    """String↔number arithmetic: a numeric string in arithmetic coerces
    to DOUBLE ('5' + 2 = 7.0); a non-numeric string coerces to NULL (a
    documented deviation from MySQL's prefix-parse '3abc'→3 — Doris 2.x
    also returns NULL here); leading/trailing blanks are tolerated in
    string→int casts."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_linenumber").cast("string") + F.lit(1)).alias("str_plus"),
        (F.lit("3abc") + F.col("l_linenumber")).alias("junk_plus"),
        (F.lit(" 7 ").cast("int") + F.col("l_linenumber")).alias("trimmed_int"),
    )


@q(
    "dialect_lax_cast_null",
    """
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INT)                      AS prio_int,
           TRY_CAST('0000-00-00' AS DATE)                        AS zero_date,
           TRY_CAST('2024-13-99' AS DATE)                        AS bad_date,
           CAST(TRUNC(TRY_CAST('12.5' AS DOUBLE)) AS INT)        AS frac_int,
           TRY_CAST(o_orderdate AS VARCHAR)                      AS date_str
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def dialect_lax_cast_null(spark, sf_dir):
    """Lax cast matrix: invalid string→int and string→date casts are
    NULL (MySQL zero-date '0000-00-00' included — Doris stores it as
    NULL by default); fractional string→int truncates toward zero
    (MySQL rounds — documented deviation, Spark/Doris truncate);
    date→string round-trips ISO format."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").cast("int").alias("prio_int"),
        F.lit("0000-00-00").cast("date").alias("zero_date"),
        F.lit("2024-13-99").cast("date").alias("bad_date"),
        F.lit("12.5").cast("int").alias("frac_int"),
        F.col("o_orderdate").cast("string").alias("date_str"),
    )


@q(
    "dialect_largeint_decimal",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_orderkey AS DECIMAL(38,0)) * 1000000000000) AS VARCHAR)
               AS big_sum,
           CAST(MAX(CAST(l_orderkey AS DECIMAL(38,0))
                    + CAST('99999999999999999999' AS DECIMAL(38,0))) AS VARCHAR)
               AS beyond_i64
    FROM lineitem GROUP BY l_returnflag
    """,
)
def dialect_largeint_decimal(spark, sf_dir):
    """Doris LARGEINT (int128) emulation — SURVEY §7 documented gap,
    closed the Spark way: DECIMAL(38,0) holds the int128 value range
    used in practice (IDs, big counters) with exact integer arithmetic.
    Values beyond int64 range round-trip exactly; results compared as
    strings so no engine float path can touch them."""
    li = load_table(spark, sf_dir, "lineitem")
    big = F.col("l_orderkey").cast("decimal(38,0)")
    return li.groupBy("l_returnflag").agg(
        F.sum(big * F.lit(1000000000000).cast("decimal(38,0)"))
        .cast("string")
        .alias("big_sum"),
        F.max(big + F.lit("99999999999999999999").cast("decimal(38,0)"))
        .cast("string")
        .alias("beyond_i64"),
    )


@q(
    "dialect_largeint_overflow",
    """
    SELECT n_nationkey,
           CAST(n_nationkey + 30 AS INT) AS n_digits,
           CAST(TRY_CAST(repeat('9', n_nationkey + 30) AS DECIMAL(38,0))
                AS VARCHAR) AS pos_fit,
           CAST(TRY_CAST('-' || repeat('9', n_nationkey + 30) AS DECIMAL(38,0))
                AS VARCHAR) AS neg_fit,
           CASE WHEN n_nationkey >= 1 THEN NULL
                ELSE CAST(CAST(repeat('9', 38) AS DECIMAL(38,0)) AS VARCHAR)
           END AS max_plus_key,
           CAST(TRY_CAST('170141183460469231731687303715884105727'
                         AS DECIMAL(38,0)) AS VARCHAR) AS int128_max
    FROM nation
    ORDER BY n_nationkey
    """,
)
def dialect_largeint_overflow(spark, sf_dir):
    """SURVEY §1.4's LARGEINT deviation, machine-checked at the exact
    boundary (VERDICT r7 advice #7): our LARGEINT is DECIMAL(38,0), so
    the representable range ends at 10³⁸−1 — BELOW Doris's int128 max
    2¹²⁷−1 (a 39-digit value). Pinned behaviors, identical rows from
    both engines:

    - ``pos_fit``/``neg_fit``: repeat('9', 30..54)-digit strings cast
      with TRY_CAST — the value for ≤38 digits, NULL above (both engines'
      TRY_CAST contract, same grid).
    - ``max_plus_key``: (10³⁸−1) + n_nationkey — our engine returns
      NULL on decimal overflow (``spark.sql.ansi.enabled=false``, the
      MySQL posture); DuckDB would raise, so the oracle states the
      SAME boundary explicitly with CASE — the comparison pins that
      our overflow-NULL starts exactly at key=1.
    - ``int128_max``: Doris's true LARGEINT max → NULL here, the
      documented deviation made visible as data.

    Per-row codegen arithmetic; no shuffle."""
    n = load_table(spark, sf_dir, "nation")
    digits = (F.col("n_nationkey") + 30).cast("int")
    max38 = F.lit("9" * 38).cast("decimal(38,0)")
    return (
        n.select(
            "n_nationkey",
            digits.alias("n_digits"),
            F.expr(
                "CAST(TRY_CAST(repeat('9', n_nationkey + 30)"
                " AS DECIMAL(38,0)) AS STRING)"
            ).alias("pos_fit"),
            F.expr(
                "CAST(TRY_CAST('-' || repeat('9', n_nationkey + 30)"
                " AS DECIMAL(38,0)) AS STRING)"
            ).alias("neg_fit"),
            (max38 + F.col("n_nationkey").cast("decimal(38,0)"))
            .cast("string")
            .alias("max_plus_key"),
            F.expr(
                "CAST(TRY_CAST('170141183460469231731687303715884105727'"
                " AS DECIMAL(38,0)) AS STRING)"
            ).alias("int128_max"),
        )
        .orderBy("n_nationkey")
    )
