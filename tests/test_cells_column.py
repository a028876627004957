"""with_leaf_cell (pure-Column Hilbert encode) == core.cellid.from_lnglat
(the NumPy form behind leaf_cell_udf), bit-identical."""

import numpy as np
import pyspark.sql.functions as F

from s2geography_spark.core import cellid as C
from s2geography_spark.functions.cells import cell_parent, with_leaf_cell


def _check(spark, lngs, lats):
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lngs, lats)],
        "lng double, lat double")
    got = np.array([r.leaf for r in
                    with_leaf_cell(df, "lng", "lat", "leaf")
                    .select("leaf").collect()], dtype=np.int64)
    want = C.from_lnglat(np.asarray(lngs, dtype=np.float64),
                         np.asarray(lats, dtype=np.float64)).view(np.int64)
    mism = got != want
    assert not mism.any(), (
        f"{mism.sum()} mismatches, first at "
        f"({np.asarray(lngs)[mism][0]}, {np.asarray(lats)[mism][0]}): "
        f"{got[mism][0]:#x} != {want[mism][0]:#x}")


def test_leaf_column_matches_numpy_grid(spark):
    g = np.arange(-175.0, 176.0, 8.5)
    lt = np.arange(-85.0, 86.0, 7.5)
    lngs, lats = np.meshgrid(g, lt)
    _check(spark, lngs.ravel(), lats.ravel())


def test_leaf_column_matches_numpy_random(spark):
    rng = np.random.default_rng(20260818)
    lngs = rng.uniform(-180, 180, 5000)
    lats = rng.uniform(-90, 90, 5000)
    _check(spark, lngs, lats)


def test_leaf_column_faces_poles_antimeridian(spark):
    pts = [(0.0, 0.0), (90.0, 0.0), (180.0, 0.0), (-180.0, 0.0),
           (-90.0, 0.0), (0.0, 90.0), (0.0, -90.0), (45.0, 35.26),
           (-135.0, -35.26), (179.999999, 89.999999),
           (-179.999999, -89.999999), (1e-12, -1e-12)]
    _check(spark, [p[0] for p in pts], [p[1] for p in pts])


def test_leaf_column_null_propagates(spark):
    df = spark.createDataFrame([(None, 1.0), (2.0, None), (3.0, 4.0)],
                               "lng double, lat double")
    rows = with_leaf_cell(df, "lng", "lat", "leaf").select("leaf").collect()
    assert rows[0].leaf is None and rows[1].leaf is None
    assert rows[2].leaf is not None


def test_leaf_column_parent_matches(spark):
    rng = np.random.default_rng(7)
    lngs = rng.uniform(-180, 180, 500)
    lats = rng.uniform(-90, 90, 500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lngs, lats)],
        "lng double, lat double")
    got = np.array([r.p for r in with_leaf_cell(df, "lng", "lat", "leaf")
                    .select(cell_parent(F.col("leaf"), 8).alias("p"))
                    .collect()], dtype=np.int64)
    want = C.parent(C.from_lnglat(lngs, lats), 8).view(np.int64)
    assert (got == want).all()


def test_level_truncated_chain_matches_parent(spark):
    """with_leaf_cell(level=L) (r6: the planning-cost-truncated chain —
    only ceil((L+2)/4) Hilbert rounds) must be bit-identical to
    parent(from_lnglat(...), L) at every level class: round-boundary
    levels (2, 6), mid-round (8 — the join level every fixed-level query
    uses), coarse (0, 1), and the full-chain fallbacks (27, 30)."""
    rng = np.random.default_rng(20260822)
    lngs = np.concatenate([rng.uniform(-180, 180, 2000),
                           [0.0, 180.0, -180.0, 179.999999, -179.999999]])
    lats = np.concatenate([rng.uniform(-90, 90, 2000),
                           [90.0, -90.0, 0.0, 89.999999, -89.999999]])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lngs, lats)],
        "lng double, lat double")
    leaf = C.from_lnglat(lngs, lats)
    for level in (0, 1, 2, 6, 8, 10, 27, 30):
        got = np.array(
            [r.c for r in with_leaf_cell(df, "lng", "lat", "c", level=level)
             .select("c").collect()], dtype=np.int64)
        want = (leaf if level == 30 else C.parent(leaf, level)).view(np.int64)
        assert (got == want).all(), f"level {level}"


def test_level_truncated_chain_nulls(spark):
    df = spark.createDataFrame([(None, 1.0), (2.0, None), (3.0, 4.0)],
                               "lng double, lat double")
    rows = with_leaf_cell(df, "lng", "lat", "c", level=8) \
        .select("c").collect()
    assert rows[0].c is None and rows[1].c is None and rows[2].c is not None
