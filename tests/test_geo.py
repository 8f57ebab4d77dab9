"""Geo family (ST_*) kernels — known-value and edge-case checks."""

import math

import pytest
from pyspark.sql import functions as F

from palo_spark.functions import geo as G


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_distance_sphere_known_values(spark):
    # Paris (2.3522, 48.8566) → London (-0.1276, 51.5072): ~343.5 km
    # on a 6371 km sphere (haversine reference value).
    d = _one(spark, G.st_distance_sphere(2.3522, 48.8566, -0.1276, 51.5072))
    ref = 2 * G.EARTH_RADIUS_M * math.asin(
        math.sqrt(
            math.sin(math.radians(51.5072 - 48.8566) / 2) ** 2
            + math.cos(math.radians(48.8566))
            * math.cos(math.radians(51.5072))
            * math.sin(math.radians(-0.1276 - 2.3522) / 2) ** 2
        )
    )
    assert abs(d - ref) < 1e-6
    assert 340_000 < d < 348_000
    # zero distance, antipodal clamp
    assert _one(spark, G.st_distance_sphere(10.0, 20.0, 10.0, 20.0)) == 0.0
    anti = _one(spark, G.st_distance_sphere(0.0, 0.0, 180.0, 0.0))
    assert abs(anti - math.pi * G.EARTH_RADIUS_M) < 1.0


def test_point_wkt_roundtrip_and_parse_failure(spark):
    p = G.st_point(-73.9857, 40.7484)
    row = spark.range(1).select(
        G.st_astext(p).alias("wkt"),
        G.st_x(G.st_geometryfromtext(G.st_astext(p))).alias("x"),
        G.st_y(G.st_geometryfromtext(G.st_astext(p))).alias("y"),
        G.st_geometryfromtext(F.lit("POINT (not a number)")).alias("bad"),
        G.st_geometryfromtext(F.lit("LINESTRING (0 0, 1 1)")).alias("other"),
    ).first()
    assert row["wkt"] == "POINT (-73.9857 40.7484)"
    assert row["x"] == -73.9857 and row["y"] == 40.7484
    assert row["bad"] is None and row["other"] is None


def test_st_polygon_parse(spark):
    ring = _one(
        spark, G.st_polygon(F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    )
    assert [(v["x"], v["y"]) for v in ring] == [
        (0.0, 0.0),
        (4.0, 0.0),
        (4.0, 4.0),
        (0.0, 4.0),
        (0.0, 0.0),
    ]


@pytest.mark.parametrize(
    "x,y,inside",
    [
        (2.0, 2.0, True),  # interior
        (5.0, 5.0, False),  # exterior
        (-1.0, 2.0, False),  # left of square
        (3.9999, 3.9999, True),  # near corner, inside
        (2.0, 4.5, False),  # above
    ],
)
def test_st_contains_square(spark, x, y, inside):
    ring = G.st_polygon(F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    got = _one(spark, G.st_contains(ring, G.st_point(x, y)))
    assert got is inside


def test_st_contains_concave(spark):
    # Concave "C" shape: point in the notch is outside.
    wkt = "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 4, 6 4, 6 6, 0 6, 0 0))"
    ring = G.st_polygon(F.lit(wkt))
    assert _one(spark, G.st_contains(ring, G.st_point(1.0, 3.0))) is True
    assert _one(spark, G.st_contains(ring, G.st_point(4.0, 3.0))) is False
    assert _one(spark, G.st_contains(ring, G.st_point(4.0, 1.0))) is True


def test_azimuth_cardinal_directions(spark):
    # Due east along the equator → π/2; due north → 0.
    east = _one(spark, G.st_azimuth(G.st_point(0.0, 0.0), G.st_point(1.0, 0.0)))
    north = _one(spark, G.st_azimuth(G.st_point(0.0, 0.0), G.st_point(0.0, 1.0)))
    south = _one(spark, G.st_azimuth(G.st_point(0.0, 1.0), G.st_point(0.0, 0.0)))
    assert abs(east - math.pi / 2) < 1e-9
    assert abs(north) < 1e-9
    assert abs(south - math.pi) < 1e-9


def test_circle_contains(spark):
    c = G.st_circle(0.0, 0.0, 200_000.0)
    assert _one(spark, G.st_contains_circle(c, G.st_point(1.0, 0.0))) is True
    assert _one(spark, G.st_contains_circle(c, G.st_point(3.0, 0.0))) is False


def test_geo_is_native_no_python_udf(spark):
    """The whole family must stay JVM-side: plan contains no Python eval."""
    df = spark.range(10).select(
        G.st_contains(
            G.st_polygon(F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")),
            G.st_point(F.col("id").cast("double"), F.lit(1.0)),
        ).alias("c"),
        G.st_distance_sphere(F.col("id").cast("double"), 0.0, 0.0, 0.0).alias("d"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
