"""Pure-Column (JVM-side, codegen'd) S2 cell-id bit math.

Cell ids are stored as signed int64 (same bit pattern as the reference's
uint64, op/cell.h:20-24).  Everything here compiles to Catalyst expressions —
no Python in the hot path.  Mirrors op/cell.cc:76-123 (Level/Parent) and
:144-164 (Contains/MayIntersect via range arithmetic).

Key bit facts (valid cell id): trailing one bit at position 2*(30-level);
position bits below it are zero, so range_min/max arithmetic never carries —
safe under ANSI overflow checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "cell_lsb", "cell_level", "cell_parent", "cell_range_min",
    "cell_range_max", "cell_contains", "cell_ord", "cell_token",
    "cell_is_valid", "cell_join_key", "cell_child", "with_leaf_cell",
]

_LONG_MIN = -(1 << 63)


def cell_lsb(cid: Column) -> Column:
    """Lowest set bit: id & -id (two's complement works on signed int64)."""
    return cid.bitwiseAND(-cid)


def cell_level(cid: Column) -> Column:
    """Level 0..30 (ctz = popcount(lsb-1); level = 30 - ctz/2)."""
    lsb = cell_lsb(cid)
    ctz = F.bit_count(lsb - F.lit(1).cast("long"))
    return (F.lit(30) - ctz / F.lit(2)).cast("int")


def cell_parent(cid: Column, level: int) -> Column:
    """Parent at fixed level (op/cell.cc:103-123, non-negative absolute
    level only; callers validate level <= cell level)."""
    new_lsb = 1 << (2 * (30 - level))
    return cid.bitwiseAND(F.lit(-new_lsb)).bitwiseOR(F.lit(new_lsb))


def cell_range_min(cid: Column) -> Column:
    return cid - (cell_lsb(cid) - F.lit(1).cast("long"))


def cell_range_max(cid: Column) -> Column:
    return cid + (cell_lsb(cid) - F.lit(1).cast("long"))


def cell_ord(cid: Column) -> Column:
    """Order-preserving signed image of the unsigned cell id: flip the sign
    bit so unsigned comparisons become plain signed comparisons."""
    return cid.bitwiseXOR(F.lit(_LONG_MIN))


def cell_contains(cid: Column, test: Column) -> Column:
    """cell contains test (range containment in unsigned order)."""
    return (cell_ord(test) >= cell_ord(cell_range_min(cid))) & \
        (cell_ord(test) <= cell_ord(cell_range_max(cid)))


def cell_is_valid(cid: Column) -> Column:
    face6 = (6 << 61) - (1 << 64)  # signed two's-complement image of 6<<61
    face_ok = cell_ord(cid) < cell_ord(F.lit(face6).cast("long"))
    lsb_ok = cell_lsb(cid).bitwiseAND(F.lit(0x1555555555555555)) != F.lit(0)
    return face_ok & lsb_ok


def cell_join_key(cid: Column) -> Column:
    """Bijective xor-shift mix of a cell id for use as an equi-join key.

    Cell ids at one level differ only in their HIGH bits (the trailing-one
    marker fixes the low bits), which degenerates hash maps that bucket on
    low bits — a 2010-entry broadcast map turned into a single 2010-long
    chain, costing 40x on the probe side.  x ^ (x >>> 31) is invertible, so
    joining on the mixed key is exactly equivalent to joining on the id."""
    return cid.bitwiseXOR(F.shiftrightunsigned(cid, 31))


def cell_child(cid: Column, k: int) -> Column:
    """k-th child (0..3) in id space: cid - lsb + (2k+1)*(lsb/4) — the
    children partition the parent's Hilbert range into four quarters whose
    center markers sit at the odd quarter positions (op/cell.cc Child).
    Callers validate the cell is not a leaf."""
    if not 0 <= k <= 3:
        raise ValueError(f"child index {k} out of range 0..3")
    lsb = cell_lsb(cid)
    quarter = F.shiftrightunsigned(lsb, 2)
    return cid - lsb + F.lit(2 * k + 1).cast("long") * quarter


def cell_token(cid: Column) -> Column:
    """Hex token with trailing zeros stripped; 'X' for 0 (op/cell.cc:40-43)."""
    h = F.lower(F.lpad(F.hex(cid), 16, "0"))
    stripped = F.regexp_replace(h, "0+$", "")
    return F.when(cid == 0, F.lit("X")).otherwise(
        F.when(stripped == "", F.lit("X")).otherwise(stripped))


_LOOKUP_SQL: str | None = None


def _lookup_pos_sql() -> str:
    """The 1024-entry S2 Hilbert lookup table (ij+orientation -> position+
    orientation, 4 levels per step) as SQL array-literal text — parsed
    JVM-side and constant-folded to one Literal per reference."""
    global _LOOKUP_SQL
    if _LOOKUP_SQL is None:
        from ..core.cellid import _LOOKUP_POS
        _LOOKUP_SQL = "array(" + ",".join(str(int(v))
                                          for v in _LOOKUP_POS) + ")"
    return _LOOKUP_SQL


def with_leaf_cell(df, lng: str = "lng", lat: str = "lat",
                   out: str = "_leaf", level: int | None = None):
    """Add `out` = LEAF cell id of columns (lng, lat) in degrees as PURE
    Catalyst expressions — the whole-stage-codegen form of
    core.cellid.from_lnglat (same quadratic face/uv/st projection, same
    4-bit lookup-table Hilbert encode, bit-identical output asserted in
    tests/test_cells_column.py).

    level: when set, `out` is the VALID CELL ID AT that level (bit-identical
    to cell_parent(leaf, level), asserted in tests) computed with only
    ceil((level+2)/4) Hilbert lookup rounds instead of all 8.  The S2
    Hilbert encode is a prefix code — round k yields the position bits of
    levels 4*(7-k)-1..4*(7-k)+2 (round 7 yields levels 1-2), so a level-L
    ancestor needs only the first rounds and the rest of the chain can be
    dropped.  This is a PLANNING optimization, not an execution one: the
    fixed-level join queries (level 8) embed this chain in every branch of
    their plan, and Catalyst analysis/optimization/AQE-re-optimization time
    is linear in the chain length — measured 7-12 s of single-threaded
    driver CPU per geo_pip_counts_agg execution with the full chain at
    sf0.1, the dominant cost of the whole query (r6 optimization round).

    This removes the last Python hop from the spatial join's fact-side key
    derivation: corpora WITHOUT a stored leaf column used to pay an
    ArrowEvalPython pass (leaf_cell_udf) over every row before the cover
    join; this form keeps the scan -> key -> join pipeline entirely inside
    codegen.  NULL lng/lat propagates to NULL.

    Shape matters, twice over:

    * It is a DataFrame transform of ~12 CHAINED PROJECTIONS, not one
      Column: each Hilbert round's state feeds the next round twice
      (position bits into the id, orientation bits onward), so a monolithic
      expression doubles per round — 2^8 copies of the trig subtree, which
      blew Catalyst planning past the driver heap.  With projections every
      round references the previous state as an ATTRIBUTE and the plan
      stays linear (CollapseProject keeps non-cheap multiply-referenced
      aliases in their own projection).
    * Expressions are SQL-STRING selectExpr steps, not pyspark Column
      algebra: building this chain Column-by-Column cost ~1.3 s of py4j
      round trips per QUERY CONSTRUCTION on the driver (measured on the
      flagship bench); ~13 selectExpr calls parse JVM-side in ~50 ms.

    The `out` column carries a rand()*0 term: PushDownPredicates
    substitutes aliases when moving a predicate below a projection, so a
    join's inferred isnotnull(key) filter would otherwise be rewritten
    through the whole chain — re-doubling at every alias referenced twice.
    rand()*0 adds exactly 0 but marks the column nondeterministic, which
    no optimizer rule will duplicate or push through — the same barrier
    the old pandas-UDF derivation provided, without the Arrow hop.
    Downstream joins use the attribute, which stays deterministic.

    Numeric note: trig comes from the JVM's Math.cos/sin vs NumPy's libm
    in the UDF form; both are <=1 ulp and the equality test covers a dense
    grid, random points, poles, and the antimeridian."""
    t = "_s2leaf"
    lngq, latq = f"`{lng}`", f"`{lat}`"
    exprs = []
    exprs.append(
        f"cos(radians(cast({lngq} as double))) * "
        f"cos(radians(cast({latq} as double))) AS {t}_x")
    exprs.append(
        f"sin(radians(cast({lngq} as double))) * "
        f"cos(radians(cast({latq} as double))) AS {t}_y")
    exprs.append(f"sin(radians(cast({latq} as double))) AS {t}_z")
    x, y, z = f"{t}_x", f"{t}_y", f"{t}_z"
    # largest-|component| face, tie toward the higher axis index
    exprs.append(
        f"CASE WHEN abs({x}) > abs({y}) THEN "
        f"(CASE WHEN abs({x}) > abs({z}) THEN 0 ELSE 2 END) ELSE "
        f"(CASE WHEN abs({y}) > abs({z}) THEN 1 ELSE 2 END) END AS {t}_f0")
    comp = (f"CASE WHEN {t}_f0 = 0 THEN {x} WHEN {t}_f0 = 1 THEN {y} "
            f"ELSE {z} END")
    exprs.append(
        f"cast(CASE WHEN {comp} < 0 THEN {t}_f0 + 3 ELSE {t}_f0 END "
        f"AS bigint) AS {t}_face")
    fc = f"{t}_face"
    u = (f"CASE WHEN {fc} = 0 THEN {y}/{x} WHEN {fc} = 1 THEN -{x}/{y} "
         f"WHEN {fc} = 2 THEN -{x}/{z} WHEN {fc} = 3 THEN {z}/{x} "
         f"WHEN {fc} = 4 THEN {z}/{y} ELSE -{y}/{z} END")
    v = (f"CASE WHEN {fc} = 0 THEN {z}/{x} WHEN {fc} = 1 THEN {z}/{y} "
         f"WHEN {fc} = 2 THEN -{y}/{z} WHEN {fc} = 3 THEN {y}/{x} "
         f"WHEN {fc} = 4 THEN -{x}/{y} ELSE -{x}/{z} END")

    def ij(w):  # quadratic uv -> st -> clamped 30-bit integer
        st = (f"CASE WHEN ({w}) >= 0 THEN 0.5d * sqrt(1.0d + 3.0d * ({w})) "
              f"ELSE 1.0d - 0.5d * sqrt(1.0d - 3.0d * ({w})) END")
        return (f"greatest(cast(0 as bigint), least(cast({(1 << 30) - 1} "
                f"as bigint), floor({float(1 << 30)}d * ({st}))))")

    exprs.append(f"{ij(u)} AS {t}_i")
    exprs.append(f"{ij(v)} AS {t}_j")
    exprs.append(f"{fc} & cast(1 as bigint) AS {t}_b8")    # kSwapMask
    exprs.append(f"shiftleft({fc}, 60) AS {t}_n8")
    # the lookup table as ONE lateral alias: embedding its 6 KB literal
    # text in all 8 rounds cost ~0.75 s of parse time per construction;
    # ConstantFolding turns the alias into a single Literal, and
    # CollapseProject freely inlines literal references, so each
    # element_at is still a plain JVM array index
    exprs.append(f"{_lookup_pos_sql()} AS {t}_tab")
    if level is None:
        rounds = 8
    else:
        if not 0 <= int(level) <= 30:
            raise ValueError(f"level must be in 0..30 (got {level})")
        # round k covers levels up to 2 + 4*(7-k); need the first R rounds
        # with 4R-2 >= level (round 7 contributes only 2 levels: i/j are
        # 30-bit, so (i >> 28) & 15 has its top two bits always zero)
        rounds = min(8, max(1, -(-(int(level) + 2) // 4)))
    k_last = 8 - rounds
    for k in range(7, k_last - 1, -1):
        idx = (f"{t}_b{k + 1}"
               f" + shiftleft(shiftrightunsigned({t}_i, {4 * k}) & 15, 6)"
               f" + shiftleft(shiftrightunsigned({t}_j, {4 * k}) & 15, 2)")
        exprs.append(
            f"cast(element_at({t}_tab, cast({idx} + 1 as int)) as bigint) "
            f"AS {t}_l{k}")
        exprs.append(
            f"{t}_n{k + 1} | shiftleft(shiftrightunsigned({t}_l{k}, 2), "
            f"{8 * k}) AS {t}_n{k}")
        exprs.append(f"{t}_l{k} & 3 AS {t}_b{k}")
    # *2+1 via shift: the face-5 high bit wraps, which ANSI `*` would
    # reject.  Explicit NULL gate: greatest/least SKIP nulls (a null ij
    # would otherwise clamp to 0 and encode a spurious valid cell).
    if level is None or rounds == 8:
        cell = f"(shiftleft({t}_n0, 1) | 1)"
        if level is not None and int(level) < 30:
            # parent bit math inline (op/cell.cc:103-123)
            new_lsb = 1 << (2 * (30 - int(level)))
            cell = f"(({cell} & {-new_lsb}L) | {new_lsb}L)"
    else:
        # cell id at the truncated chain's own level L0 = 4*rounds - 2:
        # position bits of levels 1..L0 sit in n_{k_last}'s top bits; the
        # level-L0 trailing-one marker is bit 2*(30-L0) = 64 - 8*rounds
        marker = 1 << (64 - 8 * rounds)
        cell = f"(shiftleft({t}_n{k_last}, 1) | {marker}L)"
        l0 = 4 * rounds - 2
        if int(level) < l0:
            new_lsb = 1 << (2 * (30 - int(level)))
            cell = f"(({cell} & {-new_lsb}L) | {new_lsb}L)"
    exprs.append(
        f"CASE WHEN {lngq} IS NULL OR {latq} IS NULL THEN "
        f"cast(NULL as bigint) ELSE "
        f"{cell} + cast(rand(7) * 0.0d as bigint) "
        f"END AS `{out}`")
    tmp = [f"{t}_{c}" for c in ("x", "y", "z", "f0", "face", "i", "j",
                                "tab")] + \
        [f"{t}_{c}{k}" for c in ("n", "b", "l") for k in range(9)]
    # ONE selectExpr: lateral column aliases (Spark >= 3.4) let later
    # expressions reference earlier aliases inside the same SELECT; the
    # analyzer rewrites them into the nested projections this chain needs,
    # in a single py4j call and a single analysis pass
    return df.selectExpr("*", *exprs).drop(*tmp)
