"""Tiling: per-zoom S2 parent-cell assignment + Web-Mercator z/x/y tiles.

S2 side: pure-Column bit math (cell_parent, op/cell.cc:103-123).
Web Mercator (projections.h:17 pseudo_mercator): pure-Column trig — the
whole operator is JVM-side whole-stage codegen, no Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.cells import cell_parent
from .spatial_join import leaf_cell_udf

MAX_MERCATOR_LAT = 85.05112877980659  # atan(sinh(pi)) — standard web-mercator clamp


def xyz_tile_columns(lng_col, lat_col, zoom: int):
    """(x, y) Web-Mercator tile indices at `zoom` (slippy-map convention)."""
    n = float(1 << zoom)
    lng = F.col(lng_col) if isinstance(lng_col, str) else lng_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lat_c = F.greatest(F.least(lat, F.lit(MAX_MERCATOR_LAT)),
                       F.lit(-MAX_MERCATOR_LAT))
    lat_rad = F.radians(lat_c)
    x = F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    y = F.floor((F.lit(1.0) - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad))
                 / F.lit(math.pi)) / F.lit(2.0) * F.lit(n))
    # clamp x for lng == 180 exactly
    x = F.least(x, F.lit(int(n) - 1)).cast("long")
    y = F.greatest(F.least(y, F.lit(int(n) - 1)), F.lit(0)).cast("long")
    return x, y


def orthographic_xy_columns(lng_col, lat_col, center_lng: float, center_lat: float):
    """Orthographic projection about a center (projections.h:12-22 analog):
    unit-sphere tangent-plane x/y; pure Column trig."""
    lng = F.col(lng_col) if isinstance(lng_col, str) else lng_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lam = F.radians(lng) - math.radians(center_lng)
    phi = F.radians(lat)
    phi0 = math.radians(center_lat)
    x = F.cos(phi) * F.sin(lam)
    y = F.lit(math.cos(phi0)) * F.sin(phi) \
        - F.lit(math.sin(phi0)) * F.cos(phi) * F.cos(lam)
    return x, y


def plate_carree_xy_columns(lng_col, lat_col):
    """lnglat (plate carree) projection — identity in degrees
    (projections.h:14)."""
    lng = F.col(lng_col) if isinstance(lng_col, str) else lng_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    return lng, lat


def pseudo_mercator_xy_columns(lng_col, lat_col):
    """Web-Mercator meters (projections.h:17): x = R*lam, y = R*ln(tan(pi/4+phi/2))."""
    R = 6378137.0  # the projection's conventional sphere radius
    lng = F.col(lng_col) if isinstance(lng_col, str) else lng_col
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lat_c = F.greatest(F.least(lat, F.lit(MAX_MERCATOR_LAT)),
                       F.lit(-MAX_MERCATOR_LAT))
    x = F.radians(lng) * F.lit(R)
    y = F.log(F.tan(F.lit(math.pi / 4) + F.radians(lat_c) / 2)) * F.lit(R)
    return x, y


def hex_tile_udf(res: int):
    """H3-style fallback tile family: axial hexagonal lattice over the
    Web-Mercator plane, multi-resolution by halving the hex size per res.

    Not the H3 icosahedral grid (that is a separate published system); this
    supplies the same *key-family* property the north star asks for — a
    second, hexagonal, multi-resolution spatial key independent of the S2
    quad hierarchy (hexagons have uniform neighbor distances, useful as a
    fallback join/partition key when quad-cell aliasing is adversarial).

    Returns a vectorized pandas UDF: (lng, lat) -> int64 tile id packing
    (res, q, r) axial coordinates."""
    size = 20_037_508.0 / (4 << res)  # hex circumradius in mercator meters

    @pandas_udf(T.LongType())
    def udf(lng: pd.Series, lat: pd.Series) -> pd.Series:
        R = 6378137.0
        lngv = lng.to_numpy(dtype=np.float64)
        latv = np.clip(lat.to_numpy(dtype=np.float64),
                       -MAX_MERCATOR_LAT, MAX_MERCATOR_LAT)
        x = np.radians(lngv) * R
        y = R * np.log(np.tan(np.pi / 4 + np.radians(latv) / 2))
        # pointy-top axial coordinates
        qf = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size
        rf = (2.0 / 3.0 * y) / size
        # cube rounding
        xf, zf = qf, rf
        yf = -xf - zf
        rx, ry, rz = np.rint(xf), np.rint(yf), np.rint(zf)
        dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
        fix_x = (dx > dy) & (dx > dz)
        fix_z = ~fix_x & (dz > dy)
        rx = np.where(fix_x, -ry - rz, rx)
        rz = np.where(fix_z, -rx - ry, rz)
        q = rx.astype(np.int64)
        r = rz.astype(np.int64)
        tile = (np.int64(res) << np.int64(52)) | ((q & 0x3FFFFFF) << np.int64(26)) \
            | (r & 0x3FFFFFF)
        out = pd.Series(tile, dtype=object)
        bad = (lng.isna() | lat.isna()).to_numpy()
        out[bad] = None
        return out

    return udf


def assign_tiles(df: DataFrame, *, lng: str = "lng", lat: str = "lat",
                 s2_levels=(4, 8, 12), mercator_zooms=(4, 8, 12),
                 hex_resolutions=()) -> DataFrame:
    """Add per-zoom tile key columns: s2_cell_l{L}, tile_z{z}_x/_y and
    (optionally) hex_r{res} H3-style fallback keys.

    One vectorized leaf-cell UDF call; every quad-derived key is Column bit
    math (map-only, no shuffle)."""
    out = df.withColumn("_leaf", leaf_cell_udf(F.col(lng), F.col(lat)))
    for lev in s2_levels:
        out = out.withColumn(f"s2_cell_l{lev}", cell_parent(F.col("_leaf"), lev))
    for z in mercator_zooms:
        x, y = xyz_tile_columns(lng, lat, z)
        out = out.withColumn(f"tile_z{z}_x", x).withColumn(f"tile_z{z}_y", y)
    for res in hex_resolutions:
        out = out.withColumn(f"hex_r{res}", hex_tile_udf(res)(F.col(lng), F.col(lat)))
    return out.drop("_leaf")


_FACE_BLOCK_TYPE = T.StructType([T.StructField("face", T.LongType()),
                                 T.StructField("i_blk", T.LongType()),
                                 T.StructField("j_blk", T.LongType())])


def cell_face_block_udf(level: int):
    """cell id -> (face, i_blk, j_blk): inverse-Hilbert decode of a level-L
    cell id into its face and leaf-grid block (i >> (30 - L), j >> (30 - L)).

    Level-L cells biject to (face, block) pairs, so this is an independent
    SQL-expressible formulation of the cell id: an oracle can compute the
    same block from raw lng/lat with the direct face/uv/st projection and
    never touch the Hilbert curve — a hash match proves the engine's
    encode (from_lnglat) and decode (to_face_ij) agree with the direct
    math (op/cell.cc parity check)."""
    from ..core import cellid as C

    shift = np.int64(30 - int(level))

    @pandas_udf(_FACE_BLOCK_TYPE)
    def udf(cid: pd.Series) -> pd.DataFrame:
        if cid.dtype != np.int64:
            raise ValueError(
                "cell_face_block_udf expects a non-null bigint cell column "
                f"(got dtype {cid.dtype}; nulls lose 64-bit id precision)")
        ids = cid.to_numpy().view(np.uint64)
        face, i, j, _ = C.to_face_ij(ids)
        return pd.DataFrame({"face": face.astype(np.int64),
                             "i_blk": i >> shift, "j_blk": j >> shift})

    return udf


# ---------------------------------------------------------------------------
# Raster-tile <-> vector assignment (polygon/polyline -> z/x/y coverage)
# ---------------------------------------------------------------------------

def _tile_y_of_lat(lat, zoom: int):
    """Web-Mercator tile row of a latitude (same formula as
    xyz_tile_columns, factored for reuse on bbox corners)."""
    n = float(1 << zoom)
    lat_c = F.greatest(F.least(lat, F.lit(MAX_MERCATOR_LAT)),
                       F.lit(-MAX_MERCATOR_LAT))
    lat_rad = F.radians(lat_c)
    y = F.floor((F.lit(1.0) - F.log(F.tan(lat_rad)
                                    + F.lit(1.0) / F.cos(lat_rad))
                 / F.lit(math.pi)) / F.lit(2.0) * F.lit(n))
    return F.greatest(F.least(y, F.lit(int(n) - 1)), F.lit(0)).cast("long")


def _tile_x_of_lng(lng, zoom: int):
    n = float(1 << zoom)
    x = F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.greatest(F.least(x, F.lit(int(n) - 1)), F.lit(0)).cast("long")


def vector_tile_coverage(df: DataFrame, zoom: int, *, geog: str = "geog",
                         bbox=None, refine: bool = True,
                         max_tiles_per_feature: int = 65536) -> DataFrame:
    """Raster-tile <-> vector assignment at one zoom: one output row per
    (feature row, z/x/y tile) the feature covers — the polygon/polyline
    counterpart of `assign_tiles` (which is point -> single tile).

    Semantics: half-open slippy-map rasterization — each point of the
    feature maps to exactly one tile per zoom (a tile owns its west and
    north edges), and the feature covers the union of its points' tiles.

    Two-phase, mirroring the spatial join's candidates -> refine design:

    1. CANDIDATES in pure Column math (JVM whole-stage codegen, no
       Python): the Mercator transform is monotone in each axis, so the
       feature bbox's corner tiles bound its tile rectangle exactly;
       x/y index ranges come from F.sequence + explode.  An
       antimeridian-crossing bbox (xmin > xmax) splits into two x-runs.
       Cost is O(bbox tiles) per feature BEFORE any Python, so the
       explode stays proportional to output size.
    2. REFINE (exact, vectorized Arrow batch): keep candidates whose
       tile rectangle spherically intersects the feature
       (s2_intersectsbox — tile edges tessellated along parallels).
       For features that fill their bbox rows/columns (rectangles,
       meridian/parallel-aligned shapes) phase 1 is already exact and
       `refine=False` skips the Python stage entirely; concave or
       diagonal features need the refine to drop empty bbox corners.

    At scale: map-only (no shuffle) — candidates explode inside the scan
    stage and the refine is a projection, so the operator composes with
    any downstream groupBy("z", "x", "y") tile rollup, which then
    shuffles ALREADY-FILTERED rows.  A planet-wide feature at high zoom
    would explode to n^2 tiles; `max_tiles_per_feature` fails loudly
    (F.raise_error, not a silent cap) steering such dims to S2 coverings.

    bbox: None computes it from `geog` via the st_boundingbox kernel; or
    pass a (xmin, ymin, xmax, ymax) column-name 4-tuple to keep the whole
    candidate stage Python-free (the 100 TB path: bbox persisted at
    ingest like the embedded leaf cell).
    """
    from ..functions import geo as G

    n = 1 << zoom
    if bbox is None:
        df = df.withColumn("_bb", G.st_boundingbox(F.col(geog)))
        xmin, ymin = F.col("_bb.xmin"), F.col("_bb.ymin")
        xmax, ymax = F.col("_bb.xmax"), F.col("_bb.ymax")
    else:
        xmin, ymin, xmax, ymax = (F.col(c) for c in bbox)

    x0, x1 = _tile_x_of_lng(xmin, zoom), _tile_x_of_lng(xmax, zoom)
    # north edge (ymax) has the SMALLER tile row
    y0, y1 = _tile_y_of_lat(ymax, zoom), _tile_y_of_lat(ymin, zoom)
    xs = F.when(xmin <= xmax, F.sequence(x0, x1)) \
        .otherwise(F.concat(F.sequence(x0, F.lit(n - 1)),
                            F.sequence(F.lit(0), x1)))
    n_tiles = F.size(xs).cast("long") * (y1 - y0 + F.lit(1))
    # guard as a WHERE, not an unused projection (Catalyst would prune a
    # dead column and never evaluate the raise_error)
    guard = F.when(
        n_tiles > max_tiles_per_feature,
        F.raise_error(F.concat(
            F.lit(f"vector_tile_coverage: feature covers > "
                  f"{max_tiles_per_feature} tiles at zoom {zoom}; "
                  f"use an S2 covering for planet-scale features "
                  f"(n_tiles="), n_tiles.cast("string"), F.lit(")")))
    ).otherwise(F.lit(True))
    out = (df.where(guard)
           .withColumn("x", F.explode(xs))
           .withColumn("y", F.explode(F.sequence(y0, y1)))
           .withColumn("z", F.lit(zoom).cast("long")))
    if refine:
        inv = 1 << zoom  # tile bounds back to lnglat for the exact test
        lng_w = F.col("x").cast("double") / inv * 360.0 - 180.0
        lng_e = (F.col("x") + 1).cast("double") / inv * 360.0 - 180.0
        pi = math.pi
        lat_n = F.degrees(F.atan(F.sinh(
            F.lit(pi) * (F.lit(1.0) - F.col("y").cast("double")
                         * F.lit(2.0 / inv)))))
        lat_s = F.degrees(F.atan(F.sinh(
            F.lit(pi) * (F.lit(1.0) - (F.col("y") + 1).cast("double")
                         * F.lit(2.0 / inv)))))
        out = out.where(G.s2_intersectsbox(
            F.col(geog), lng_w, lat_s, lng_e, lat_n))
    drop = ["_bb"] if bbox is None else []
    return out.drop(*drop)
