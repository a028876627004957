"""Spark-level kernel tests: the reference's scalar×array / array×scalar
Arrow-batch shapes (sedona_udf_test_internal.h:268-409 harness) re-expressed
as DataFrame queries with pandas UDFs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import s2geography_spark.functions as sf
from s2geography_spark.core import cellid as C
from s2geography_spark.core.geog import from_wkt, to_wkb


def wkb(w):
    return to_wkb(from_wkt(w))


@pytest.fixture(scope="module")
def geo_df(spark):
    rows = [
        (0, wkb("POINT (0.25 0.25)")),
        (1, wkb("POINT (-1 -1)")),
        (2, None),
    ]
    return spark.createDataFrame(rows, "id long, geog binary")


def test_intersects_scalar_array(spark, geo_df):
    # predicates_test.cc:9-27: POLYGON((0 0,1 0,0 1,0 0)) x [in, out, null]
    poly = wkb("POLYGON ((0 0, 1 0, 0 1, 0 0))")
    out = (geo_df
           .withColumn("r", sf.st_intersects(F.lit(poly), F.col("geog")))
           .orderBy("id").collect())
    assert [r.r for r in out] == [True, False, None]


def test_contains_and_distance(spark, geo_df):
    poly = wkb("POLYGON ((0 0, 2 0, 0 2, 0 0))")
    out = (geo_df
           .withColumn("c", sf.st_contains(F.lit(poly), F.col("geog")))
           .withColumn("d", sf.st_distance(F.lit(wkb("POINT (0 0)")), F.col("geog")))
           .orderBy("id").collect())
    assert [r.c for r in out] == [True, False, None]
    # great-circle (0,0)->(0.25,0.25): verified against the haversine formula
    assert out[0].d == pytest.approx(39313.3426658, abs=1e-3)
    assert out[2].d is None


def test_distance_golden_via_sql(spark):
    sf.register_sql_functions(spark)
    df = spark.sql("""
        SELECT st_distance(st_geogfromtext('POINT (0 0)'),
                           st_geogfromtext('POINT (0 1)')) AS d
    """)
    assert df.collect()[0].d == pytest.approx(111195.10117748393, abs=1e-9)


def test_accessors_batch(spark):
    rows = [(0, wkb("POLYGON ((0 0, 1 0, 0 1, 0 0))")),
            (1, wkb("LINESTRING (0 0, 0 1)")),
            (2, wkb("POINT (-64 45)")),
            (3, None)]
    df = spark.createDataFrame(rows, "id long, geog binary")
    out = (df.select(
        "id",
        sf.st_area("geog").alias("area"),
        sf.st_length("geog").alias("len"),
        sf.st_npoints("geog").alias("np"),
        sf.st_dimension("geog").alias("dim"),
        sf.st_isempty("geog").alias("empty"),
        sf.st_x("geog").alias("x"),
    ).orderBy("id").collect())
    assert out[0].area > 0 and out[0].dim == 2 and out[0].np == 3
    assert out[1].len == pytest.approx(111195.10117748393, abs=1e-6)
    assert out[2].x == -64.0
    assert out[3].area is None and out[3].dim is None


def test_cellid_and_covering(spark):
    rows = [(0, wkb("POINT (-64 45)")), (1, wkb("POLYGON ((0 0, 2 0, 0 2, 0 0))"))]
    df = spark.createDataFrame(rows, "id long, geog binary")
    out = (df.select(
        "id",
        sf.s2_cellidfrompoint(F.when(F.col("id") == 0, F.col("geog"))).alias("cid"),
        sf.s2_coveringcellids("geog").alias("cov"),
    ).orderBy("id").collect())
    expect = int(C.from_lnglat(np.array([-64.0]), np.array([45.0])).view(np.int64)[0])
    assert out[0].cid == expect
    assert out[0].cov == [expect]
    assert 1 <= len(out[1].cov) <= 8


def test_pure_column_cell_math(spark):
    # cells.py vs NumPy reference on the same ids
    ids = C.from_lnglat(np.array([-64.0, 10.0, 170.0]),
                        np.array([45.0, -30.0, -85.0])).view(np.int64)
    df = spark.createDataFrame([(int(i),) for i in ids], "cid long")
    out = df.select(
        "cid",
        sf.cell_level(F.col("cid")).alias("lev"),
        sf.cell_parent(F.col("cid"), 10).alias("p10"),
        sf.cell_token(F.col("cid")).alias("tok"),
        sf.cell_is_valid(F.col("cid")).alias("ok"),
    ).collect()
    p10 = C.parent(ids.view(np.uint64), 10).view(np.int64)
    toks = C.to_token(ids.view(np.uint64))
    for row, pid, tok in zip(out, p10, toks):
        assert row.lev == 30 and row.ok
        assert row.p10 == int(pid)
        assert row.tok == tok
    # cell_contains: parent contains leaf
    df2 = df.select(sf.cell_contains(sf.cell_parent(F.col("cid"), 5),
                                     F.col("cid")).alias("c"))
    assert all(r.c for r in df2.collect())


def test_point_wkb_columns_roundtrip(spark):
    df = spark.createDataFrame([(-64.0, 45.0), (170.5, -85.25)], "lng double, lat double")
    out = df.select(
        sf.st_x(sf.point_wkb_columns(F.col("lng"), F.col("lat"))).alias("x"),
        sf.st_y(sf.point_wkb_columns(F.col("lng"), F.col("lat"))).alias("y"),
    ).collect()
    assert out[0].x == -64.0 and out[0].y == 45.0
    assert out[1].x == 170.5 and out[1].y == -85.25


def test_boundingbox_struct(spark):
    df = spark.createDataFrame([(wkb("POLYGON ((0 0, 2 0, 0 2, 0 0))"),)],
                               "geog binary")
    r = df.select(sf.st_boundingbox("geog").alias("b")).collect()[0].b
    assert r.xmin == pytest.approx(0.0, abs=1e-12)
    assert r.xmax == pytest.approx(2.0, abs=1e-12)
