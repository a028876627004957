"""Coverage tests for the remaining UDF surface: validity, box-intersects,
build-op UDFs, cell-op UDFs, SQL registration, projections."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import s2geography_spark.functions as sf
from s2geography_spark.core import cellid as C
from s2geography_spark.core.geog import from_wkb, from_wkt, to_wkb


def wkb(w):
    return to_wkb(from_wkt(w))


def test_validity(spark):
    rows = [(0, wkb("POLYGON ((0 0, 2 0, 0 2, 0 0))")),
            (1, wkb("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")),  # bowtie
            (2, None)]
    df = spark.createDataFrame(rows, "id long, geog binary")
    out = df.select("id", sf.st_isvalid("geog").alias("v"),
                    sf.st_isvalidreason("geog").alias("r")).orderBy("id").collect()
    assert out[0].v is True and out[0].r == "Valid Geometry"
    assert out[1].v is False and "self-intersection" in out[1].r
    assert out[2].v is None


def test_intersects_box(spark):
    df = spark.createDataFrame([(wkb("POINT (5 5)"),), (wkb("POINT (50 50)"),)],
                               "geog binary")
    out = df.select(sf.s2_intersectsbox(
        "geog", F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0)).alias("b")).collect()
    assert [r.b for r in out] == [True, False]


def test_build_op_udfs(spark):
    tri = wkb("POLYGON ((0 0, 2 0, 0 2, 0 0))")
    rows = [(0, tri, wkb("MULTIPOINT ((0.25 0.25), (-1 -1))")),
            (1, tri, wkb("POLYGON ((30 30, 31 30, 30 31, 30 30))")),
            (2, tri, wkb("POLYGON ((1 0, 3 0, 1 2, 1 0))"))]  # crossing overlay
    df = spark.createDataFrame(rows, "id long, a binary, b binary")
    out = (df.select("id",
                     sf.st_intersection("a", "b").alias("i"),
                     sf.st_union("a", "b").alias("u"),
                     sf.st_convexhull("a").alias("h"),
                     sf.st_pointonsurface("a").alias("p"),
                     sf.st_touches("a", "b").alias("t"))
           .orderBy("id").collect())
    g0 = from_wkb(bytes(out[0].i))
    assert {tuple(p) for p in g0.points} == {(0.25, 0.25)}
    assert from_wkb(bytes(out[1].i)).is_empty()
    assert from_wkb(bytes(out[2].i)).dimension() == 2  # crossing overlay works
    assert from_wkb(bytes(out[1].u)).dimension() == 2
    assert from_wkb(bytes(out[0].h)).dimension() == 2
    assert out[0].t is False  # overlapping interior, not touching
    # simplify / reduceprecision / buffer
    line = wkb("LINESTRING (0 0, 0.0001 1, 0 2)")
    df2 = spark.createDataFrame([(line,)], "geog binary")
    r = df2.select(
        sf.st_simplify("geog", F.lit(100.0)).alias("s"),
        sf.st_reduceprecision("geog", F.lit(2)).alias("rp"),
        sf.st_buffer(sf.st_pointonsurface("geog"), F.lit(1000.0)).alias("bf"),
    ).collect()[0]
    assert len(from_wkb(bytes(r.s)).lines[0]) == 2
    assert from_wkb(bytes(r.bf)).dimension() == 2


def test_cell_udfs(spark):
    a = int(C.from_lnglat(np.array([0.0]), np.array([0.0])).view(np.int64)[0])
    b = int(C.from_lnglat(np.array([180.0]), np.array([0.0])).view(np.int64)[0])
    df = spark.createDataFrame([(a, b)], "a long, b long")
    r = df.select(
        sf.s2_cell_distance("a", "b").alias("d"),
        sf.s2_cell_max_distance("a", "b").alias("md"),
        sf.s2_cell_area(sf.cell_parent(F.col("a"), 0)).alias("ar"),
        sf.s2_cell_center("a").alias("c"),
        sf.s2_cell_common_ancestor_level("a", sf.cell_parent(F.col("a"), 5)).alias("cal"),
        sf.s2_celltodebugstring("a").alias("dbg"),
    ).collect()[0]
    assert r.d == pytest.approx(np.pi, abs=1e-8)
    assert r.md == pytest.approx(np.pi, abs=1e-12)
    assert r.ar == pytest.approx(4 * np.pi / 6, abs=1e-12)
    assert abs(r.c.lng) < 1e-7 and abs(r.c.lat) < 1e-7
    assert r.cal == 5
    # token/debug round trips through UDFs
    r2 = df.select(
        sf.s2_cellfromtoken(sf.cell_token(F.col("a"))).alias("t"),
        sf.s2_cellfromdebugstring(sf.s2_celltodebugstring(F.col("a"))).alias("g"),
    ).collect()[0]
    assert r2.t == a and r2.g == a


def test_cell_vertex_area_udfs(spark):
    # face-0 cell at level 0: vertices are the normalized cube corners
    # (1, +/-1, +/-1)/sqrt(3) -> lng +/-45, lat +/-atan(1/sqrt(2));
    # area is exactly 1/6 of the sphere and ApproxArea the same average
    face0 = 1 << 60
    leaf = int(C.from_lnglat(np.array([10.0]), np.array([20.0])).view(np.int64)[0])
    df = spark.createDataFrame([(face0, leaf)], "f long, leaf long")
    r = df.select(
        sf.s2_cell_vertex("f", F.lit(0)).alias("v0"),
        sf.s2_cell_vertex("f", F.lit(2)).alias("v2"),
        sf.s2_cell_vertex("f", F.lit(7)).alias("bad"),
        sf.s2_cell_area("f").alias("ar"),
        sf.s2_cell_area_approx("f").alias("ap"),
        sf.s2_cell_area_approx("leaf").alias("ap_leaf"),
        sf.s2_cell_area("leaf").alias("ar_leaf"),
    ).collect()[0]
    lat_corner = np.degrees(np.arctan(1.0 / np.sqrt(2.0)))
    assert r.v0.lng == pytest.approx(-45.0, abs=1e-9)
    assert r.v0.lat == pytest.approx(-lat_corner, abs=1e-9)
    assert r.v2.lng == pytest.approx(45.0, abs=1e-9)
    assert r.v2.lat == pytest.approx(lat_corner, abs=1e-9)
    assert r.bad.lng is None or np.isnan(r.bad.lng)  # out-of-range k
    assert r.ar == pytest.approx(4 * np.pi / 6, abs=1e-12)
    assert r.ap == pytest.approx(4 * np.pi / 6, abs=1e-12)
    # ApproxArea is within ~3% of exact area at leaf level (S2 guarantee)
    assert r.ap_leaf == pytest.approx(r.ar_leaf, rel=0.03)


def test_sql_registration_full(spark):
    names = sf.register_sql_functions(spark)
    assert len(names) >= 45
    out = spark.sql("""
        SELECT st_isvalid(st_geogfromtext('POLYGON ((0 0, 1 0, 0 1, 0 0))')) AS v,
               st_astext(st_convexhull(st_geogfromtext('MULTIPOINT ((0 0), (0 1))'))) AS h
    """).collect()[0]
    assert out.v is True
    assert out.h.startswith("LINESTRING")


def test_projections(spark):
    from s2geography_spark.operators.tiles import (orthographic_xy_columns,
                                                   pseudo_mercator_xy_columns)
    df = spark.createDataFrame([(0.0, 0.0), (10.0, 50.0)], "lng double, lat double")
    x, y = orthographic_xy_columns("lng", "lat", 0.0, 0.0)
    rows = df.select(x.alias("x"), y.alias("y")).collect()
    assert rows[0].x == 0.0 and rows[0].y == 0.0
    assert rows[1].x == pytest.approx(np.cos(np.radians(50)) * np.sin(np.radians(10)), abs=1e-12)
    mx, my = pseudo_mercator_xy_columns("lng", "lat")
    rows2 = df.select(mx.alias("x"), my.alias("y")).collect()
    assert rows2[1].x == pytest.approx(np.radians(10) * 6378137.0, abs=1e-6)
    assert rows2[1].y == pytest.approx(
        6378137.0 * np.log(np.tan(np.pi / 4 + np.radians(50) / 2)), abs=1e-6)
