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
    "cell_is_valid", "cell_join_key", "cell_child",
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
