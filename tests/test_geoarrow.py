"""Native GeoArrow typed-array ingest/egress roundtrips
(geoarrow.h:59-115 Reader/Writer analog with :40-76 import options)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2geography_spark.core.geog import from_wkb, from_wkt, to_wkb, to_wkt
from s2geography_spark.functions import geoarrow as GA
from s2geography_spark.functions.geo import st_area, st_astext, st_length


def _xy(x, y):
    return {"x": float(x), "y": float(y)}


def test_point_roundtrip(spark):
    rows = [(1, _xy(-64.0, 45.0)), (2, _xy(170.25, -85.5)), (3, None)]
    df = spark.createDataFrame(rows, "id long, pt struct<x double, y double>")
    wkb = df.select("id", GA.geoarrow_point_to_wkb()(F.col("pt")).alias("g"))
    back = wkb.select("id", GA.wkb_to_geoarrow_point()(F.col("g")).alias("pt"))
    got = {r.id: r.pt for r in back.collect()}
    assert got[1].x == -64.0 and got[1].y == 45.0
    assert got[2].x == 170.25 and got[2].y == -85.5
    assert got[3].x is None


def test_linestring_roundtrip_and_length(spark):
    chain = [_xy(0.0, -10.0), _xy(0.0, 10.0)]  # meridian: exact length
    df = spark.createDataFrame([(1, chain)],
                               "id long, ls array<struct<x double, y double>>")
    wkb = df.select("id",
                    GA.geoarrow_linestring_to_wkb()(F.col("ls")).alias("g"))
    row = wkb.select("id", st_length(F.col("g")).alias("len"),
                     GA.wkb_to_geoarrow_linestring()(F.col("g")).alias("ls")) \
        .collect()[0]
    assert row.len == pytest.approx(np.radians(20.0) * 6371010.0, rel=1e-12)
    assert [(p.x, p.y) for p in row.ls] == [(0.0, -10.0), (0.0, 10.0)]


def test_polygon_roundtrip_normalized(spark):
    # CW input ring: default (oriented=False) normalizes to a CCW shell
    ring = [_xy(0, 0), _xy(0, 10), _xy(10, 10), _xy(10, 0), _xy(0, 0)]
    df = spark.createDataFrame(
        [(1, [ring])],
        "id long, poly array<array<struct<x double, y double>>>")
    wkb = df.select("id",
                    GA.geoarrow_polygon_to_wkb()(F.col("poly")).alias("g"))
    row = wkb.select(st_area("g").alias("area"),
                     GA.wkb_to_geoarrow_polygon()(F.col("g")).alias("poly")) \
        .collect()[0]
    # small CCW-normalized box, not the 'everything else' complement
    assert row.area < 5e13
    shell = [(p.x, p.y) for p in row.poly[0]]
    assert shell[0] == shell[-1] and len(shell) == 5


def test_polygon_oriented_keeps_winding():
    # driverless check on the kernel path: oriented CW shell = complement
    ring = [_xy(0, 0), _xy(0, 10), _xy(10, 10), _xy(10, 0), _xy(0, 0)]
    import pandas as pd
    norm = GA.geoarrow_polygon_to_wkb(oriented=False)
    orient = GA.geoarrow_polygon_to_wkb(oriented=True)
    b_norm = norm.func(pd.Series([[ring]]))[0]
    b_orient = orient.func(pd.Series([[ring]]))[0]
    from s2geography_spark.core import ops
    a_norm = ops.s2_area(from_wkb(b_norm, oriented=True))
    a_orient = ops.s2_area(from_wkb(b_orient, oriented=True))
    sphere_area = 4 * np.pi * 6371010.0 ** 2
    assert a_norm < 5e13
    assert a_orient == pytest.approx(sphere_area - a_norm, rel=1e-9)


def test_planar_tessellation(spark):
    # a long east-west planar edge at lat 60 must densify: the geodesic
    # midpoint of (-30,60)-(30,60) is at ~63.4N, > 300 km off the parallel
    chain = [_xy(-30.0, 60.0), _xy(30.0, 60.0)]
    df = spark.createDataFrame([(1, chain)],
                               "id long, ls array<struct<x double, y double>>")
    planar = df.select(GA.geoarrow_linestring_to_wkb(planar=True)(
        F.col("ls")).alias("g"))
    geodesic = df.select(GA.geoarrow_linestring_to_wkb()(
        F.col("ls")).alias("g"))
    n_planar = len(from_wkb(planar.collect()[0].g).lines[0])
    n_geo = len(from_wkb(geodesic.collect()[0].g).lines[0])
    assert n_geo == 2 and n_planar > 16
    # every tessellated vertex stays on (near) the lat-60 parallel
    lats = from_wkb(planar.collect()[0].g).lines[0][:, 1]
    assert np.abs(lats - 60.0).max() < 0.01


def test_wkt_parity(spark):
    # GeoArrow ingest and WKT ingest agree byte-for-byte on the transport
    chain = [_xy(1.5, 2.25), _xy(3.0, 4.5), _xy(5.0, 6.0)]
    df = spark.createDataFrame([(1, chain)],
                               "id long, ls array<struct<x double, y double>>")
    via_ga = df.select(GA.geoarrow_linestring_to_wkb()(F.col("ls")).alias("g")) \
        .collect()[0].g
    via_wkt = to_wkb(from_wkt("LINESTRING (1.5 2.25, 3 4.5, 5 6)"))
    assert bytes(via_ga) == via_wkt
