"""Star Schema Benchmark (SSB) — the 13 O'Neil et al. queries, the last
upstream benchmark family (Doris runs them as a golden-output regression
suite: [upstream: regression-test/suites/ssb_sf1_p1], SURVEY.md §5.1).

Fixture adaptation (FIXTURES.md has no SSB dbgen tables):

- ``lineorder`` is the flat fact SSB derives from TPC-H — here the
  lineitem ⋈ orders join on the order key, with ``lo_orderdate :=
  o_orderdate``, ``lo_revenue := l_extendedprice·(1−l_discount)``.
- The ``date`` dimension is EXPRESSED, not stored: ``d_year``,
  ``d_yearmonthnum`` (yyyymm), ``d_weeknuminyear`` (ISO week — the same
  function in Spark and DuckDB) derive from ``lo_orderdate``. At rest a
  production table would materialize these as partition columns; the
  predicates are identical either way.
- SSB's integer discounts 1–10 map to the fixture's 0.01–0.10 doubles;
  ``p_category`` maps to ``p_type`` (6 values ≈ SSB's 25 categories),
  ``p_brand1`` to ``p_brand`` (Brand#1..25 ≈ SSB's 1000).
- ``city`` (SSB: 10 cities per nation, 'UNITED KI1') is derived
  deterministically: ``n_name || '#' || key % 10``.
- ``lo_supplycost``: the fixtures carry no partsupp, so the SSB profit
  queries use the documented deterministic proxy ``0.6 ·
  l_extendedprice`` (dbgen itself prices supplycost as a fixed fraction
  of price); profit = revenue − supplycost replays exactly in DuckDB.

Scale posture: every query is ONE pass over the fact join — dimensions
(part/supplier/customer/nation/region, all sublinear) broadcast under
AQE, the lineitem⋈orders equi-join shuffles on the order key once, and
every aggregate is two-phase with map-side partials. Discount/quantity
bands push into the lineitem parquet scan; the derived-date predicates
evaluate scan-adjacent on the ORDERS side BEFORE the join (Catalyst
pushes the filter below the join, though ``year(ts)`` does not reach
parquet row-group pruning — a stored lineorder table would carry the
date parts as partition columns, making these partition-pruning);
brand/type/region filters push into their dimension scans before the
broadcast. No query shuffles the fact twice (plan-verified: 0
CartesianProduct, 0 SinglePartition exchanges, dims all
BroadcastHashJoin at the test SFs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.suite.util import dsum, o_dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

#: lo_revenue (SSB stores it; we derive it — identical arithmetic)
_REV = "l_extendedprice * (1 - l_discount)"
#: Q1.x revenue definition (extendedprice · discount, per the spec)
_DISC_REV = "l_extendedprice * l_discount"
#: deterministic supplycost proxy (no partsupp in the fixtures)
_COST = "0.6 * l_extendedprice"
_PROFIT = f"({_REV}) - ({_COST})"

_O_LINEORDER = "lineitem JOIN orders ON l_orderkey = o_orderkey"


def _lineorder(spark, sf_dir):
    """The flat SSB fact: lineitem ⋈ orders with derived date columns.
    One equi-join on the order key (the only fact-fact shuffle any SSB
    query pays); the derived columns are pure projections."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .withColumn("d_year", F.year("o_orderdate"))
        .withColumn(
            "d_yearmonthnum",
            F.year("o_orderdate") * 100 + F.month("o_orderdate"),
        )
        .withColumn("d_weeknuminyear", F.weekofyear("o_orderdate"))
    )


_O_DATES = (
    "YEAR(o_orderdate) AS d_year, "
    "YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS d_yearmonthnum, "
    "WEEKOFYEAR(o_orderdate) AS d_weeknuminyear"
)


def _supplier_geo(spark, sf_dir):
    """supplier + nation/region names + derived city."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            "s_suppkey",
            F.col("n_name").alias("s_nation"),
            F.col("r_name").alias("s_region"),
            F.concat(
                F.col("n_name"), F.lit("#"), (F.col("s_suppkey") % 10).cast("string")
            ).alias("s_city"),
        )
    )


def _customer_geo(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            "c_custkey",
            F.col("n_name").alias("c_nation"),
            F.col("r_name").alias("c_region"),
            F.concat(
                F.col("n_name"), F.lit("#"), (F.col("c_custkey") % 10).cast("string")
            ).alias("c_city"),
        )
    )


_O_SUPP_GEO = """
    (SELECT s_suppkey, n_name AS s_nation, r_name AS s_region,
            n_name || '#' || CAST(s_suppkey % 10 AS VARCHAR) AS s_city
     FROM supplier JOIN nation ON s_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey) sg
"""
_O_CUST_GEO = """
    (SELECT c_custkey, n_name AS c_nation, r_name AS c_region,
            n_name || '#' || CAST(c_custkey % 10 AS VARCHAR) AS c_city
     FROM customer JOIN nation ON c_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey) cg
"""


# --------------------------------------------------------------- Q1 flight
# One scan, no dimension joins: date band × discount band × quantity band
# → a single scalar. The derived-date predicates fold to o_orderdate
# ranges; everything else pushes to the lineitem scan.


@q(
    "ssb_q1_1",
    f"""
    SELECT {o_dsum(_DISC_REV, scale=10)} AS revenue
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    WHERE d_year = 1997
      AND l_discount BETWEEN 0.01 AND 0.03
      AND l_quantity < 25
    """,
)
def ssb_q1_1(spark, sf_dir):
    """SSB Q1.1: one-year revenue delta — scan + pushed bands + scalar
    two-phase agg. [upstream: ssb_sf1_p1 q1.1]"""
    lo = _lineorder(spark, sf_dir)
    return lo.filter(
        (F.col("d_year") == 1997)
        & F.col("l_discount").between(0.01, 0.03)
        & (F.col("l_quantity") < 25)
    ).agg(dsum(F.expr(_DISC_REV), scale=10).alias("revenue"))


@q(
    "ssb_q1_2",
    f"""
    SELECT {o_dsum(_DISC_REV, scale=10)} AS revenue
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    WHERE d_yearmonthnum = 199701
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity BETWEEN 26 AND 35
    """,
)
def ssb_q1_2(spark, sf_dir):
    """SSB Q1.2: one-month revenue delta (tighter bands)."""
    lo = _lineorder(spark, sf_dir)
    return lo.filter(
        (F.col("d_yearmonthnum") == 199701)
        & F.col("l_discount").between(0.04, 0.06)
        & F.col("l_quantity").between(26, 35)
    ).agg(dsum(F.expr(_DISC_REV), scale=10).alias("revenue"))


@q(
    "ssb_q1_3",
    f"""
    SELECT {o_dsum(_DISC_REV, scale=10)} AS revenue
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    WHERE d_weeknuminyear = 6 AND d_year = 1997
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity BETWEEN 26 AND 35
    """,
)
def ssb_q1_3(spark, sf_dir):
    """SSB Q1.3: one-ISO-week revenue delta (weekofyear is ISO-8601 in
    both Spark and DuckDB — identical weeks, identical result)."""
    lo = _lineorder(spark, sf_dir)
    return lo.filter(
        (F.col("d_weeknuminyear") == 6)
        & (F.col("d_year") == 1997)
        & F.col("l_discount").between(0.05, 0.07)
        & F.col("l_quantity").between(26, 35)
    ).agg(dsum(F.expr(_DISC_REV), scale=10).alias("revenue"))


# --------------------------------------------------------------- Q2 flight
# part × supplier-region restrictions, revenue by (year, brand).


def _q2(spark, sf_dir, part_pred, supp_region):
    lo = _lineorder(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(part_pred)
    sg = _supplier_geo(spark, sf_dir).filter(F.col("s_region") == supp_region)
    return (
        lo.join(F.broadcast(p), lo["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(sg), lo["l_suppkey"] == sg["s_suppkey"])
        .groupBy("d_year", "p_brand")
        .agg(dsum(F.expr(_REV), scale=10).alias("lo_revenue"))
        .orderBy("d_year", "p_brand")
    )


def _o_q2(part_pred_sql, supp_region):
    return f"""
    SELECT d_year, p_brand, {o_dsum(_REV, scale=10)} AS lo_revenue
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    JOIN part ON l_partkey = p_partkey
    JOIN {_O_SUPP_GEO} ON l_suppkey = sg.s_suppkey
    WHERE ({part_pred_sql}) AND s_region = '{supp_region}'
    GROUP BY d_year, p_brand
    ORDER BY d_year, p_brand
    """


@q("ssb_q2_1", _o_q2("p_type = 'ECONOMY'", "AMERICA"))
def ssb_q2_1(spark, sf_dir):
    """SSB Q2.1: category × supplier-region, revenue by (year, brand).
    p_category → p_type (fixture adaptation, module docstring)."""
    return _q2(spark, sf_dir, F.col("p_type") == "ECONOMY", "AMERICA")


@q(
    "ssb_q2_2",
    _o_q2("p_brand BETWEEN 'Brand#21' AND 'Brand#24'", "ASIA"),
)
def ssb_q2_2(spark, sf_dir):
    """SSB Q2.2: brand RANGE (lexicographic BETWEEN — same collation
    both engines; Brand#2/Brand#25 fall outside by string order)."""
    return _q2(
        spark, sf_dir, F.col("p_brand").between("Brand#21", "Brand#24"), "ASIA"
    )


@q("ssb_q2_3", _o_q2("p_brand = 'Brand#23'", "EUROPE"))
def ssb_q2_3(spark, sf_dir):
    """SSB Q2.3: single brand, single supplier region."""
    return _q2(spark, sf_dir, F.col("p_brand") == "Brand#23", "EUROPE")


# --------------------------------------------------------------- Q3 flight
# customer-geo × supplier-geo, revenue by (c_geo, s_geo, year), year band.


def _q3(spark, sf_dir, c_pred, s_pred, c_col, s_col, year_pred):
    lo = _lineorder(spark, sf_dir)
    cg = _customer_geo(spark, sf_dir).filter(c_pred)
    sg = _supplier_geo(spark, sf_dir).filter(s_pred)
    return (
        lo.join(F.broadcast(cg), lo["o_custkey"] == cg["c_custkey"])
        .join(F.broadcast(sg), lo["l_suppkey"] == sg["s_suppkey"])
        .filter(year_pred)
        .groupBy(c_col, s_col, "d_year")
        .agg(dsum(F.expr(_REV), scale=10).alias("lo_revenue"))
        .orderBy("d_year", F.desc("lo_revenue"), c_col, s_col)
    )


def _o_q3(c_pred_sql, s_pred_sql, c_col, s_col, year_pred_sql):
    return f"""
    SELECT {c_col}, {s_col}, d_year, {o_dsum(_REV, scale=10)} AS lo_revenue
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    JOIN {_O_CUST_GEO} ON o_custkey = cg.c_custkey
    JOIN {_O_SUPP_GEO} ON l_suppkey = sg.s_suppkey
    WHERE ({c_pred_sql}) AND ({s_pred_sql}) AND ({year_pred_sql})
    GROUP BY {c_col}, {s_col}, d_year
    ORDER BY d_year, lo_revenue DESC, {c_col}, {s_col}
    """


@q(
    "ssb_q3_1",
    _o_q3(
        "c_region = 'ASIA'", "s_region = 'ASIA'",
        "c_nation", "s_nation", "d_year BETWEEN 1995 AND 1997",
    ),
)
def ssb_q3_1(spark, sf_dir):
    """SSB Q3.1: intra-region (ASIA) trade by nation pair and year."""
    return _q3(
        spark, sf_dir,
        F.col("c_region") == "ASIA", F.col("s_region") == "ASIA",
        "c_nation", "s_nation", F.col("d_year").between(1995, 1997),
    )


@q(
    "ssb_q3_2",
    _o_q3(
        "c_nation = 'NATION_21'", "s_nation = 'NATION_21'",
        "c_city", "s_city", "d_year BETWEEN 1995 AND 1997",
    ),
)
def ssb_q3_2(spark, sf_dir):
    """SSB Q3.2: intra-nation trade by city pair (derived cities —
    module docstring; NATION_21 has suppliers at every fixture SF (supplier nations are sparse at sf0.001) and is an AMERICA member)."""
    return _q3(
        spark, sf_dir,
        F.col("c_nation") == "NATION_21", F.col("s_nation") == "NATION_21",
        "c_city", "s_city", F.col("d_year").between(1995, 1997),
    )


@q(
    "ssb_q3_3",
    _o_q3(
        "c_city IN ('NATION_15#0', 'NATION_19#1')",
        "s_city IN ('NATION_15#0', 'NATION_19#1')",
        "c_city", "s_city", "d_year BETWEEN 1995 AND 1997",
    ),
)
def ssb_q3_3(spark, sf_dir):
    """SSB Q3.3: two specific cities ('UNITED KI1'/'UNITED KI5' → two
    derived cities chosen to be POPULATED at every fixture SF — supplier
    cities are sparse because suppliers scale sublinearly)."""
    cities = ["NATION_15#0", "NATION_19#1"]
    return _q3(
        spark, sf_dir,
        F.col("c_city").isin(cities), F.col("s_city").isin(cities),
        "c_city", "s_city", F.col("d_year").between(1995, 1997),
    )


@q(
    "ssb_q3_4",
    _o_q3(
        "c_city IN ('NATION_15#0', 'NATION_19#1')",
        "s_city IN ('NATION_15#0', 'NATION_19#1')",
        "c_city", "s_city", "d_yearmonthnum = 199701",
    ),
)
def ssb_q3_4(spark, sf_dir):
    """SSB Q3.4: the city pair narrowed to one month (199701 — the
    one month with trades between these cities at every fixture SF;
    upstream uses Dec1997)."""
    cities = ["NATION_15#0", "NATION_19#1"]
    return _q3(
        spark, sf_dir,
        F.col("c_city").isin(cities), F.col("s_city").isin(cities),
        "c_city", "s_city", F.col("d_yearmonthnum") == 199701,
    )


# --------------------------------------------------------------- Q4 flight
# profit (revenue − supplycost proxy) drill-down.


@q(
    "ssb_q4_1",
    f"""
    SELECT d_year, c_nation, {o_dsum(_PROFIT, scale=10)} AS profit
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    JOIN {_O_CUST_GEO} ON o_custkey = cg.c_custkey
    JOIN {_O_SUPP_GEO} ON l_suppkey = sg.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_region = 'AMERICA' AND s_region = 'AMERICA'
      AND p_type IN ('ECONOMY', 'STANDARD')
    GROUP BY d_year, c_nation
    ORDER BY d_year, c_nation
    """,
)
def ssb_q4_1(spark, sf_dir):
    """SSB Q4.1: profit by (year, customer nation) — p_mfgr-pair →
    two p_type values (fixture adaptation)."""
    lo = _lineorder(spark, sf_dir)
    cg = _customer_geo(spark, sf_dir).filter(F.col("c_region") == "AMERICA")
    sg = _supplier_geo(spark, sf_dir).filter(F.col("s_region") == "AMERICA")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "STANDARD")
    )
    return (
        lo.join(F.broadcast(cg), lo["o_custkey"] == cg["c_custkey"])
        .join(F.broadcast(sg), lo["l_suppkey"] == sg["s_suppkey"])
        .join(F.broadcast(p), lo["l_partkey"] == p["p_partkey"])
        .groupBy("d_year", "c_nation")
        .agg(dsum(F.expr(_PROFIT), scale=10).alias("profit"))
        .orderBy("d_year", "c_nation")
    )


@q(
    "ssb_q4_2",
    f"""
    SELECT d_year, s_nation, p_type AS p_category,
           {o_dsum(_PROFIT, scale=10)} AS profit
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    JOIN {_O_CUST_GEO} ON o_custkey = cg.c_custkey
    JOIN {_O_SUPP_GEO} ON l_suppkey = sg.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_region = 'AMERICA' AND s_region = 'AMERICA'
      AND d_year IN (1997, 1998)
      AND p_type IN ('ECONOMY', 'STANDARD')
    GROUP BY d_year, s_nation, p_type
    ORDER BY d_year, s_nation, p_category
    """,
)
def ssb_q4_2(spark, sf_dir):
    """SSB Q4.2: the drill-down — two years, supplier nation ×
    category grain."""
    lo = _lineorder(spark, sf_dir)
    cg = _customer_geo(spark, sf_dir).filter(F.col("c_region") == "AMERICA")
    sg = _supplier_geo(spark, sf_dir).filter(F.col("s_region") == "AMERICA")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "STANDARD")
    )
    return (
        lo.filter(F.col("d_year").isin(1997, 1998))
        .join(F.broadcast(cg), lo["o_custkey"] == cg["c_custkey"])
        .join(F.broadcast(sg), lo["l_suppkey"] == sg["s_suppkey"])
        .join(F.broadcast(p), lo["l_partkey"] == p["p_partkey"])
        .groupBy("d_year", "s_nation", F.col("p_type").alias("p_category"))
        .agg(dsum(F.expr(_PROFIT), scale=10).alias("profit"))
        .orderBy("d_year", "s_nation", "p_category")
    )


@q(
    "ssb_q4_3",
    f"""
    SELECT d_year, s_city, p_brand, {o_dsum(_PROFIT, scale=10)} AS profit
    FROM (SELECT *, {_O_DATES} FROM {_O_LINEORDER}) lo
    JOIN {_O_SUPP_GEO} ON l_suppkey = sg.s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE s_nation = 'NATION_21'
      AND d_year IN (1997, 1998)
      AND p_type = 'PROMO'
    GROUP BY d_year, s_city, p_brand
    ORDER BY d_year, s_city, p_brand
    """,
)
def ssb_q4_3(spark, sf_dir):
    """SSB Q4.3: deepest drill — one supplier nation, city × brand
    grain (customer side unconstrained, so its join is elided)."""
    lo = _lineorder(spark, sf_dir)
    sg = _supplier_geo(spark, sf_dir).filter(F.col("s_nation") == "NATION_21")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    return (
        lo.filter(F.col("d_year").isin(1997, 1998))
        .join(F.broadcast(sg), lo["l_suppkey"] == sg["s_suppkey"])
        .join(F.broadcast(p), lo["l_partkey"] == p["p_partkey"])
        .groupBy("d_year", "s_city", "p_brand")
        .agg(dsum(F.expr(_PROFIT), scale=10).alias("profit"))
        .orderBy("d_year", "s_city", "p_brand")
    )
