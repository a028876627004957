"""Two-phase distributed spatial join: covering -> explode -> join -> refine.

This operator IS the engine's replacement for the reference's in-memory
``GeographyIndex::Iterator::Query`` (index.h:26-101): instead of walking a
shared S2ShapeIndex, candidates are produced by a hash equi-join on covering
cell ids, then refined with the exact predicate kernels.

Plan shape (scales to 10^12 rows / 1000 executors):

  regions (small dim, <= ~10^6 rows)
      covering array<long> (precomputed or s2_coveringcellids)
      -> explode -> (cell_id, region_id, geog)               [map-only]
  points (the 10^12-row fact side)
      leaf cell id from lng/lat (vectorized NumPy, no WKB)    [map-only]
      -> ancestors at exactly the levels present in the region
         coverings (collected once from the dim side)         [map-only]
      -> equi-join on cell_id, broadcast the exploded dim     [NO shuffle]
      -> refine with vectorized PIP (winding number), grouped
         per distinct region per Arrow batch                  [map-only]

With a broadcastable dim the whole join is shuffle-free: the only wide
operation in a typical query is the user's downstream aggregation.  For a
large region side use broadcast=False: the same plan becomes a shuffle
equi-join on cell_id; enable salting for hot cells via `salt`.

Correctness notes: a region's covering cells are disjoint (normalized
covering), so a point's ancestor chain hits at most one covering cell per
region — the candidate set needs no pair dedupe.  Coverings are supersets
of the region, so refine-only false positives are dropped, never misses.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..core import cellid as C
from ..core import sphere
from ..core.geog import from_wkb
from ..functions.cells import cell_parent


@pandas_udf(T.LongType())
def leaf_cell_udf(lng: pd.Series, lat: pd.Series) -> pd.Series:
    """Vectorized lng/lat -> leaf cell id (signed int64)."""
    ids = C.from_lnglat(lng.to_numpy(dtype=np.float64),
                        lat.to_numpy(dtype=np.float64)).view(np.int64)
    out = pd.Series(ids, dtype=object)
    bad = (lng.isna() | lat.isna()).to_numpy()
    if bad.any():
        out[bad] = None
    return out


@pandas_udf(T.BooleanType())
def contains_lnglat_udf(geog: pd.Series, lng: pd.Series, lat: pd.Series) -> pd.Series:
    """Vectorized refine: polygon WKB (repeating) x point lng/lat.

    Groups the Arrow batch by distinct polygon bytes, decodes each polygon
    once (scalar-prepare analog, sedona_udf_internal.h:849-867), then runs
    one winding-number PIP over all points of that group."""
    n = len(geog)
    out = np.empty(n, dtype=object)
    lngv = lng.to_numpy(dtype=np.float64)
    latv = lat.to_numpy(dtype=np.float64)
    xyz = np.stack(C.lnglat_to_xyz(np.nan_to_num(lngv), np.nan_to_num(latv)), axis=-1)
    codes, uniques = pd.factorize(geog, use_na_sentinel=True)
    for u, key in enumerate(uniques):
        g = from_wkb(bytes(key))
        ra, rb = g.ring_edges_xyz()
        rows = np.where(codes == u)[0]
        if len(ra) == 0:
            out[rows] = False
            continue
        res = sphere.contains_points(xyz[rows], ra, rb, model="semi_open")
        out[rows] = res.astype(object)
    bad = geog.isna().to_numpy() | np.isnan(lngv) | np.isnan(latv)
    out[bad] = None
    return pd.Series(out, dtype=object)


def ancestors_at_levels(cell_col, levels):
    """Array column of the leaf cell's ancestors at the given levels (pure
    Column bit math — no Python)."""
    return F.array(*[cell_parent(cell_col, int(l)) for l in sorted(levels)])


def covering_levels(regions: DataFrame, covering_col: str = "covering"):
    """Distinct levels used by the dim side's coverings (one tiny action)."""
    rows = (regions
            .select(F.explode(covering_col).alias("c"))
            .select(F.bit_count(F.col("c").bitwiseAND(-F.col("c")) - 1).alias("ctz"))
            .select((F.lit(30) - F.col("ctz") / 2).cast("int").alias("lev"))
            .distinct().collect())
    return sorted({r.lev for r in rows})


def spatial_join(points: DataFrame, regions: DataFrame, *,
                 lng: str = "lng", lat: str = "lat",
                 region_geog: str = "geog",
                 covering_col: str = "covering",
                 predicate: str = "contains",
                 broadcast: bool = True,
                 salt: Optional[int] = None) -> DataFrame:
    """Join each point row to every region whose polygon satisfies
    `predicate` (contains/intersects) — the engine's flagship operator.

    points: any DataFrame with lng/lat columns (degrees).
    regions: dim with polygon WKB + covering array<long>.
    Returns points' columns + regions' columns (minus internals).
    """
    if covering_col not in regions.columns:
        from ..functions.geo import s2_coveringcellids
        regions = regions.withColumn(covering_col, s2_coveringcellids(region_geog))

    levels = covering_levels(regions, covering_col)
    exploded = regions.withColumn("cell_id", F.explode(covering_col)) \
        .drop(covering_col)

    pts = points.withColumn("_leaf", leaf_cell_udf(F.col(lng), F.col(lat)))
    pts = pts.withColumn("cell_id", F.explode(ancestors_at_levels(F.col("_leaf"), levels)))

    if salt and not broadcast:
        nsalt = int(salt)
        pts = pts.withColumn("_salt", F.pmod(F.hash(F.col(lng), F.col(lat)), F.lit(nsalt)))
        exploded = exploded.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1))))
        join_keys = ["cell_id", "_salt"]
    else:
        join_keys = ["cell_id"]

    rhs = F.broadcast(exploded) if broadcast else exploded
    cand = pts.join(rhs, join_keys, "inner")

    refined = cand.where(contains_lnglat_udf(F.col(region_geog), F.col(lng), F.col(lat))
                         if predicate == "contains"
                         else _intersects_refine(region_geog, lng, lat))
    drop_cols = ["_leaf", "cell_id"] + (["_salt"] if salt and not broadcast else [])
    return refined.drop(*drop_cols)


def _intersects_refine(region_geog, lng, lat):
    from ..functions.geo import st_intersects, _point_wkb_udf
    return st_intersects(F.col(region_geog), _point_wkb_udf(F.col(lng), F.col(lat)))


# ---------------------------------------------------------------------------
# distributed kNN join
# ---------------------------------------------------------------------------

@pandas_udf(T.DoubleType())
def distance_to_geog_udf(geog: pd.Series, lng: pd.Series, lat: pd.Series) -> pd.Series:
    """Vectorized min distance (meters) from points to a repeating geography:
    per distinct geography, one NumPy pass over its edges/vertices."""
    n = len(geog)
    out = np.full(n, np.nan)
    lngv = lng.to_numpy(dtype=np.float64)
    latv = lat.to_numpy(dtype=np.float64)
    xyz = np.stack(C.lnglat_to_xyz(np.nan_to_num(lngv), np.nan_to_num(latv)), axis=-1)
    codes, uniques = pd.factorize(geog, use_na_sentinel=True)
    for u, key in enumerate(uniques):
        g = from_wkb(bytes(key))
        rows = np.where(codes == u)[0]
        p = xyz[rows]
        d = np.full(len(rows), np.inf)
        gp = g.points_xyz()
        if len(gp):
            d = np.minimum(d, sphere.angle(p[:, None, :], gp[None, :, :]).min(axis=1))
        ea, eb = g.all_edges_xyz()
        if len(ea):
            d = np.minimum(d, sphere.point_arc_distance(
                p[:, None, :], ea[None, :, :], eb[None, :, :]).min(axis=1))
        ra, rb = g.ring_edges_xyz()
        if len(ra):
            inside = sphere.contains_points(p, ra, rb, model="closed")
            d = np.where(inside, 0.0, d)
        out[rows] = d * sphere.EARTH_RADIUS_METERS
    res = pd.Series(out, dtype=object)
    bad = geog.isna().to_numpy() | np.isnan(lngv) | np.isnan(latv)
    res[bad] = None
    return res


def knn_join(points: DataFrame, regions: DataFrame, k: int, *,
             point_id: str, lng: str = "lng", lat: str = "lat",
             region_geog: str = "geog",
             distance_col: str = "distance_m") -> DataFrame:
    """k nearest regions per point (S2ClosestEdgeQuery semantics over the
    broadcast dim: exact distances, window top-k).

    Plan: broadcast nested-loop pairing (points x |regions|) with the
    distance computed by one vectorized kernel per distinct region per
    batch, then Window.partitionBy(point).orderBy(distance) row_number <= k
    (SURVEY.md §2.6 kNN building block).  Right-sized when the dim side is
    broadcastable; for a large dim use the buffered-covering candidate join
    (s2_coveringcellids_buffered) before this refine.
    """
    from pyspark.sql import Window as W

    pair = points.crossJoin(F.broadcast(regions))
    pair = pair.withColumn(distance_col,
                           distance_to_geog_udf(F.col(region_geog),
                                                F.col(lng), F.col(lat)))
    w = W.partitionBy(point_id).orderBy(F.col(distance_col).asc(),
                                        F.col("region_id").asc())
    return (pair.withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k))
