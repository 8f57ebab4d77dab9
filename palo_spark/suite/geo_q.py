"""Geo family suite entries (bonus beyond SURVEY §2.5's out-of-scope
declaration — VERDICT r4 "What's missing" #4).

Coordinates are derived from table keys with pure integer arithmetic
(identical in Spark and DuckDB), so every entry is a genuine value
oracle: the DuckDB side replays the same haversine / ray-casting
formulas on the same derived points.

Float determinism: distances are floor-quantized to whole meters and
angles to 1e-6 degrees/radians, each with a +1e-3 pre-floor guard. The
guard matters because the half-degree key-derived coordinates make
EXACTLY-on-grid results structurally common (not 1e-8-probability
random events): at an exact boundary, JVM and C libm land a few ulp on
opposite sides — the r7 full-registry sf0.1 sweep caught precisely this
(an 82.5° angle flooring to 82.499999 in one engine). The shift puts
both engines on the same side of the grid line.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.functions import geo as G
from palo_spark.suite.util import register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_R = G.EARTH_RADIUS_M  # 6371000.0, pinned in both engines


def _haversine_sql(lon1, lat1, lon2, lat2):
    a = (
        f"(POW(SIN((RADIANS({lat2}) - RADIANS({lat1})) / 2), 2)"
        f" + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * POW(SIN((RADIANS({lon2}) - RADIANS({lon1})) / 2), 2))"
    )
    return f"(2.0 * {_R!r} * ASIN(LEAST(SQRT({a}), 1.0)))"


# Derived point A (from c_custkey) and B (from c_custkey*7 + c_nationkey).
# Spark Columns must be built lazily (they need an active session), so
# the Spark forms are functions; the SQL mirrors are plain strings.
def _lonlat(k):
    return (
        ((k % 360) - 180).cast("double") + 0.5,
        ((k % 170) - 85).cast("double") + 0.25,
    )


_SQL_LON1 = "(CAST((c_custkey % 360) - 180 AS DOUBLE) + 0.5)"
_SQL_LAT1 = "(CAST((c_custkey % 170) - 85 AS DOUBLE) + 0.25)"
_SQL_K2 = "(c_custkey * 7 + c_nationkey)"
_SQL_LON2 = f"(CAST(({_SQL_K2} % 360) - 180 AS DOUBLE) + 0.5)"
_SQL_LAT2 = f"(CAST(({_SQL_K2} % 170) - 85 AS DOUBLE) + 0.25)"


@q(
    "geo_point_wkt_roundtrip",
    f"""
    SELECT c_custkey,
           {_SQL_LON1} AS x,
           {_SQL_LAT1} AS y,
           TRUE AS roundtrip_ok
    FROM customer
    """,
)
def geo_point_wkt_roundtrip(spark, sf_dir):
    """ST_Point → ST_AsText → ST_GeometryFromText → ST_X/ST_Y round
    trip. x/y are genuine value parity; roundtrip_ok asserts the
    text→geometry→text loop is lossless inside Spark (the WKT string
    itself is engine-formatting-dependent, so it is round-tripped, not
    diffed cross-engine)."""
    c = load_table(spark, sf_dir, "customer")
    lon1, lat1 = _lonlat(F.col("c_custkey"))
    pt = G.st_point(lon1, lat1)
    parsed = G.st_geometryfromtext(G.st_astext(pt))
    return c.select(
        "c_custkey",
        G.st_x(parsed).alias("x"),
        G.st_y(parsed).alias("y"),
        (
            (G.st_x(parsed) == G.st_x(pt)) & (G.st_y(parsed) == G.st_y(pt))
        ).alias("roundtrip_ok"),
    )


@q(
    "geo_distance_azimuth",
    f"""
    SELECT c_custkey,
           CAST(FLOOR({_haversine_sql(_SQL_LON1, _SQL_LAT1, _SQL_LON2, _SQL_LAT2)} + 1e-3)
                AS BIGINT) AS dist_m,
           FLOOR(({_haversine_sql(_SQL_LON1, _SQL_LAT1, _SQL_LON2, _SQL_LAT2)}
                  / {_R!r} * 180.0 / PI()) * 1e6 + 1e-3) / 1e6 AS angle_deg,
           FLOOR(((ATAN2(SIN(RADIANS({_SQL_LON2}) - RADIANS({_SQL_LON1})) * COS(RADIANS({_SQL_LAT2})),
                         COS(RADIANS({_SQL_LAT1})) * SIN(RADIANS({_SQL_LAT2}))
                         - SIN(RADIANS({_SQL_LAT1})) * COS(RADIANS({_SQL_LAT2}))
                           * COS(RADIANS({_SQL_LON2}) - RADIANS({_SQL_LON1})))
                   + 2 * PI()) % (2 * PI())) * 1e6 + 1e-3) / 1e6 AS azimuth_rad,
           {_haversine_sql(_SQL_LON1, _SQL_LAT1, "0.0", "0.0")} <= 2000000.0
               AS in_circle
    FROM customer
    """,
)
def geo_distance_azimuth(spark, sf_dir):
    """ST_Distance_Sphere / ST_Angle_Sphere / ST_Azimuth between two
    key-derived points, plus ST_Contains over an ST_Circle at the
    origin — all native trig, oracle replays the formulas verbatim.

    Floors carry a +1e-3 guard (both engines): the half-degree
    key-derived coordinates make EXACT grid values (an angle of
    precisely 82.5°, say) structurally common, and at an exact boundary
    JVM vs C libm land a few ulp on opposite sides (caught by the r7
    full-registry sf0.1 sweep). The shift puts both engines on the same
    side unless the true value sits within ~1e-7 of (boundary − 1e-3) —
    back to a genuinely negligible-probability event."""
    c = load_table(spark, sf_dir, "customer")
    lon1, lat1 = _lonlat(F.col("c_custkey"))
    lon2, lat2 = _lonlat(F.col("c_custkey") * 7 + F.col("c_nationkey"))
    p1 = G.st_point(lon1, lat1)
    p2 = G.st_point(lon2, lat2)
    circle = G.st_circle(0.0, 0.0, 2000000.0)
    return c.select(
        "c_custkey",
        F.floor(
            G.st_distance_sphere(p1["x"], p1["y"], p2["x"], p2["y"]) + 1e-3
        ).cast("bigint").alias("dist_m"),
        (
            F.floor(
                G.st_angle_sphere(p1["x"], p1["y"], p2["x"], p2["y"]) * 1e6
                + 1e-3
            ) / 1e6
        ).alias("angle_deg"),
        (F.floor(G.st_azimuth(p1, p2) * 1e6 + 1e-3) / 1e6).alias("azimuth_rad"),
        G.st_contains_circle(circle, p1).alias("in_circle"),
    )


# Pentagon with no horizontal edges (ray-cast degenerate case avoided by
# construction; the WHEN guard handles it anyway). Closed ring, first
# vertex repeated last.
_PENT = [(0.0, -8.0), (7.0, -2.0), (4.0, 7.0), (-5.0, 6.0), (-8.0, -3.0), (0.0, -8.0)]
_PENT_WKT = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in _PENT) + "))"
_EDGE_VALUES = ", ".join(
    f"({ax!r}, {ay!r}, {bx!r}, {by!r})"
    for (ax, ay), (bx, by) in zip(_PENT, _PENT[1:])
)


@q(
    "geo_contains_polygon",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               CAST(c_custkey % 41 AS DOUBLE) / 2.0 - 10.0 AS px,
               CAST((c_custkey * 3) % 41 AS DOUBLE) / 2.0 - 10.0 AS py
        FROM customer
    ),
    edges AS (SELECT * FROM (VALUES {_EDGE_VALUES}) e(ax, ay, bx, by)),
    cr AS (
        SELECT p.c_custkey, p.px, p.py,
               SUM(CASE WHEN (e.ay > p.py) <> (e.by > p.py)
                         AND p.px < (e.bx - e.ax) * (p.py - e.ay)
                                    / (e.by - e.ay) + e.ax
                        THEN 1 ELSE 0 END) AS crossings
        FROM pts p CROSS JOIN edges e
        GROUP BY p.c_custkey, p.px, p.py
    )
    SELECT c_custkey, px, py, (crossings % 2 = 1) AS inside FROM cr
    """,
)
def geo_contains_polygon(spark, sf_dir):
    """ST_Contains(ST_Polygon(wkt), point): even-odd ray casting folded
    natively over the ring's edges. The polygon reaches Spark through
    the WKT text parser (ST_Polygon), and the oracle replays the same
    ray-cast via an edge cross join — genuine value parity on the
    inside/outside verdict for every customer-derived point."""
    c = load_table(spark, sf_dir, "customer")
    px = (F.col("c_custkey") % 41).cast("double") / 2.0 - 10.0
    py = ((F.col("c_custkey") * 3) % 41).cast("double") / 2.0 - 10.0
    ring = G.st_polygon(F.lit(_PENT_WKT))
    pt = G.st_point(px, py)
    return c.select(
        "c_custkey",
        px.alias("px"),
        py.alias("py"),
        G.st_contains(ring, pt).alias("inside"),
    )
