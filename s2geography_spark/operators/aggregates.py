"""Geography aggregations — the reference's Aggregator<T> contract
(aggregator.h:8-13: Add/Merge/Finalize) mapped to Spark's partial+final
aggregation shapes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..core import sphere
from ..core.build import s2_convex_hull, s2_union
from ..core.geog import Geog, from_wkb, to_wkb
from ..core.ops import centroid_vector

_XYZ = T.StructType([T.StructField("x", T.DoubleType()),
                     T.StructField("y", T.DoubleType()),
                     T.StructField("z", T.DoubleType())])


@pandas_udf(_XYZ)
def centroid_xyz_udf(wkb: pd.Series) -> pd.DataFrame:
    """Per-geography un-normalized centroid vector — the Add step of
    CentroidAggregator (accessors-geog.h:16-24).  The Merge step is a plain
    Spark SUM (map-side partials for free); Finalize = normalize + to lnglat."""
    rows = []
    for b in wkb:
        if b is None:
            rows.append((None, None, None))
            continue
        v = centroid_vector(from_wkb(bytes(b)))
        rows.append((0.0, 0.0, 0.0) if v is None else tuple(float(c) for c in v))
    return pd.DataFrame(rows, columns=["x", "y", "z"])


def centroid_agg(df: DataFrame, geog: str, group_cols: list[str]) -> DataFrame:
    """ST_Centroid_Agg: groupBy sum of centroid vectors, then normalize.
    Fully distributed: the shuffle carries 3 doubles per group."""
    withv = df.withColumn("_c", centroid_xyz_udf(F.col(geog)))
    agg = (withv.groupBy(*group_cols)
           .agg(F.sum("_c.x").alias("sx"), F.sum("_c.y").alias("sy"),
                F.sum("_c.z").alias("sz")))
    norm = F.sqrt(F.col("sx") ** 2 + F.col("sy") ** 2 + F.col("sz") ** 2)
    return agg.select(
        *group_cols,
        F.degrees(F.atan2(F.col("sy") / norm, F.col("sx") / norm)).alias("centroid_lng"),
        F.degrees(F.atan2(F.col("sz") / norm,
                          F.sqrt((F.col("sx") / norm) ** 2 + (F.col("sy") / norm) ** 2)))
        .alias("centroid_lat"))


def _hull_partial(pdf_wkbs) -> bytes:
    g = Geog()
    pts = []
    for b in pdf_wkbs:
        if b is None:
            continue
        gg = from_wkb(bytes(b))
        v = gg.all_vertices_xyz()
        if len(v):
            pts.append(v)
    if not pts:
        return to_wkb(Geog(typ=7))
    allv = np.vstack(pts)
    return to_wkb(s2_convex_hull(Geog(points=sphere.xyz_to_lnglat(allv))))


def _map_side_partials(df: DataFrame, value_col: str, group_cols: list[str],
                       out_col: str, partial_fn) -> DataFrame:
    """One partial per (Arrow batch, group) via mapInPandas — a TRUE
    map-side combine with NO exchange of the input rows (r6: the previous
    groupBy(group, spark_partition_id()) 'partial' still hash-exchanged
    every input row to build the partials; the whole point of a two-phase
    aggregate is that the only shuffle carries partials)."""
    fields = df.select(*group_cols).schema
    schema = T.StructType(list(fields)
                          + [T.StructField(out_col, T.BinaryType())])
    src = df.select(*group_cols, value_col)

    def partial_map(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            recs = []
            for keys, sub in pdf.groupby(list(group_cols), sort=False,
                                         dropna=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                recs.append((*keys, partial_fn(sub[value_col])))
            yield pd.DataFrame(recs, columns=[*group_cols, out_col])

    return src.mapInPandas(partial_map, schema), schema


def convex_hull_agg(df: DataFrame, geog: str, group_cols: list[str]) -> DataFrame:
    """ST_ConvexHull_Agg (S2ConvexHullAggregator analog, accessors-geog.h:
    26-35): two-phase — MAP-SIDE partial hull per (batch, group) via
    mapInPandas (no exchange of input points), then final hull of hull
    vertices.  The only shuffle carries partial-hull vertices (<= input;
    hull-of-hulls == hull of the union, so batch granularity is free)."""
    partials, schema1 = _map_side_partials(df, geog, group_cols, "hull",
                                           _hull_partial)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        out = {**{c: [keys[c]] for c in group_cols},
               "hull": [_hull_partial(pdf["hull"])]}
        return pd.DataFrame(out)

    return partials.groupBy(*group_cols).applyInPandas(final, schema1)


def union_agg(df: DataFrame, geog: str, group_cols: list[str]) -> DataFrame:
    """ST_Union_Agg (S2UnionAggregator analog, build.h:88-106): two-phase
    pairwise union — per-partition partials, then a final merge per group.
    Round-1 scope: exact for point/line collections and disjoint polygons
    (matching core/build.py overlay support)."""

    def merge_series(wkbs) -> bytes:
        acc = None
        for b in wkbs:
            if b is None:
                continue
            g = from_wkb(bytes(b))
            acc = g if acc is None else s2_union(acc, g)
        return to_wkb(acc if acc is not None else Geog(typ=7))

    # map-side partials (see _map_side_partials): union is associative and
    # commutative for the supported inputs (point/line collections and
    # disjoint polygons), and every consumer metric (max-distance,
    # area/point-on-surface) is grouping-insensitive — the previous
    # per-partition grouping already merged partials in nondeterministic
    # shuffle-arrival order
    partials, schema1 = _map_side_partials(df, geog, group_cols,
                                           "geog_union", merge_series)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        return pd.DataFrame({**{c: [keys[c]] for c in group_cols},
                             "geog_union": [merge_series(pdf["geog_union"])]})

    return partials.groupBy(*group_cols).applyInPandas(final, schema1)


def bbox_agg(df: DataFrame, group_cols: list[str], lng: str = "lng",
             lat: str = "lat") -> DataFrame:
    """Mergeable per-group bounding box over point columns — pure-Column
    min/max partials (map-side combine; no per-group array
    materialization, unlike collect_list which at 100x would put millions
    of doubles in one aggregation buffer row).

    Antimeridian-aware lng interval (coverings.cc:89-211 bound semantics
    for point sets spanning < 180 deg): both the direct [min, max] and the
    0..360-wrapped interval are folded; the narrower wins.  A wrapping
    result is returned with xmin > xmax (the S2LatLngRect lng_lo > lng_hi
    convention the engine's bbox prefilter already consumes)."""
    wrapped = F.pmod(F.col(lng) + 360.0, F.lit(360.0))
    agg = df.groupBy(*group_cols).agg(
        F.min(lng).alias("_dlo"), F.max(lng).alias("_dhi"),
        F.min(wrapped).alias("_wlo"), F.max(wrapped).alias("_whi"),
        F.min(lat).alias("ymin"), F.max(lat).alias("ymax"))
    direct_span = F.col("_dhi") - F.col("_dlo")
    wrap_span = F.col("_whi") - F.col("_wlo")
    unwrap = lambda c: F.when(c > 180.0, c - 360.0).otherwise(c)  # noqa: E731
    xmin = F.when(wrap_span < direct_span, unwrap(F.col("_wlo"))) \
        .otherwise(F.col("_dlo"))
    xmax = F.when(wrap_span < direct_span, unwrap(F.col("_whi"))) \
        .otherwise(F.col("_dhi"))
    return agg.select(*group_cols, xmin.alias("xmin"), F.col("ymin"),
                      xmax.alias("xmax"), F.col("ymax"))


def _concat_merge(wkbs, dedupe_points: bool) -> bytes:
    """Merge shape vectors across a group with the same Z/M negotiation as
    build._concat (sedona_udf_internal.h:449-461): the output dimension is
    the union of input dimensions, narrower coordinate arrays widen with
    NaN padding — mixed POINT Z + POINT groups merge instead of crashing,
    and uniform-ZM groups keep their Z/M."""
    from ..core.geog import _widen_coords
    parts = [from_wkb(bytes(b)) for b in wkbs if b is not None]
    parts = [g for g in parts if g is not None and not g.is_empty()]
    if not parts:
        return to_wkb(Geog(typ=7))
    zm = (any(g.zm[0] for g in parts), any(g.zm[1] for g in parts))

    def w(arr, src_zm):
        return _widen_coords(np.asarray(arr, dtype=np.float64), src_zm, zm)

    pts = [w(g.points, g.zm) for g in parts if len(g.points)]
    points = np.vstack(pts) if pts else None
    if points is not None and dedupe_points:
        points = np.unique(points, axis=0)
    return to_wkb(Geog(
        points=points,
        lines=[w(l, g.zm) for g in parts for l in g.lines],
        polys=[[w(r, g.zm) for r in rings] for g in parts for rings in g.polys],
        zm=zm))


def _two_phase_merge(df: DataFrame, geog: str, group_cols: list[str],
                     dedupe_points: bool) -> DataFrame:
    fields = df.select(*group_cols).schema
    schema1 = T.StructType(list(fields) +
                           [T.StructField("geog_union", T.BinaryType())])

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        return pd.DataFrame({**{c: [keys[c]] for c in group_cols},
                             "geog_union": [_concat_merge(pdf[geog],
                                                          dedupe_points)]})

    salted = df.withColumn("_p", F.spark_partition_id())
    partials = salted.groupBy(*group_cols, "_p").applyInPandas(partial, schema1)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        return pd.DataFrame({**{c: [keys[c]] for c in group_cols},
                             "geog_union": [_concat_merge(pdf["geog_union"],
                                                          dedupe_points)]})

    return partials.groupBy(*group_cols).applyInPandas(final, schema1)


def rebuild_agg(df: DataFrame, geog: str, group_cols: list[str]) -> DataFrame:
    """RebuildAggregator (build.h:64-73): accumulate every input shape and
    rebuild once into a single normalized geography — shapes are merged
    verbatim (ring orientation re-normalized at decode), duplicate points
    collapse.  No boolean op runs: overlapping polygon inputs stay as-is
    (use union_agg for a true union)."""
    return _two_phase_merge(df, geog, group_cols, dedupe_points=True)


def coverage_union_agg(df: DataFrame, geog: str,
                       group_cols: list[str]) -> DataFrame:
    """S2CoverageUnionAggregator (build.h:75-86): union of DISJOINT inputs —
    the no-compute fast path that simply merges shape vectors (the
    reference unions with empty over the combined index).  Caller contract:
    inputs within a group do not overlap; for overlapping inputs the result
    double-covers (exactly like the reference) — use union_agg instead."""
    return _two_phase_merge(df, geog, group_cols, dedupe_points=False)
