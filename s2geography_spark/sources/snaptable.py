"""Snapshot-table: a minimal Iceberg-style table format over parquet.

BASELINE.json's input_hint names the corpus an **Iceberg table**; the
sandbox has no Iceberg jars, so this module supplies the semantics Iceberg
is actually named for — atomic snapshot commits, time travel, and
manifest-level file pruning — as a from-scratch layer over plain parquet:

    table_dir/
      metadata/
        version-hint.text        current metadata version (atomic swap)
        v<N>.metadata.json       snapshot log + current snapshot pointer
      manifests/
        manifest-<snap>.json     data-file list + per-file column min/max
      data/
        snap<NNNNN>-<tok>-<i>.parquet   immutable data files

Design constraints mirror the real thing:

- **Commits are optimistic + atomic.** A writer reads the current version,
  stages data files, then creates ``v<N+1>.metadata.json`` with
  ``O_CREAT|O_EXCL`` — the filesystem arbitrates racing writers; the loser
  gets ``CommitConflictError`` and can retry against the new state.  The
  version hint is swapped with ``os.replace`` (atomic on POSIX) and is
  only a hint: readers fall back to scanning for the highest version.
- **Data files are immutable and append-only.** Overwrite commits a
  snapshot that references only the new files; the old files stay on disk
  so every previous snapshot remains readable (time travel) until
  ``expire_snapshots`` garbage-collects unreferenced files.
- **File stats come from parquet footers only** (pyarrow row-group
  metadata) — committing N files reads zero data pages.
- **Scan planning prunes before Spark.** ``plan_files`` evaluates
  conjunctive predicates against per-file min/max and returns the files
  that may match; ``read_table`` hands only those paths to
  ``spark.read.parquet``.  Pruning is conservative: a file is skipped only
  when its stats PROVE the predicate false; missing stats keep the file.

At 10^12 rows the JSON manifests would themselves be parquet/avro and the
planning distributed (exactly Iceberg's metadata tree); here planning cost
is bounded by file count, not row count — the same contract real Iceberg
gives the driver.  Everything downstream is unchanged: the DataFrame
returned by ``read_table`` feeds the same declarative plans as a direct
parquet read (README "Iceberg stand-in").
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from typing import Iterable, Optional, Sequence

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


class CommitConflictError(RuntimeError):
    """Another writer committed the version this writer was about to
    create.  Re-read the table state and retry the commit."""


class SnapshotNotFoundError(KeyError):
    pass


_VERSION_RE = re.compile(r"^v(\d+)\.metadata\.json$")


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _current_version(path: str) -> int:
    """Highest committed metadata version; the hint file is advisory."""
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    best = 0
    try:
        with open(hint) as f:
            v = int(f.read().strip())
        if os.path.exists(os.path.join(_meta_dir(path),
                                       f"v{v}.metadata.json")):
            best = v
    except (OSError, ValueError):
        pass
    # the hint can lag a racing committer — scan forward from it
    for name in os.listdir(_meta_dir(path)):
        m = _VERSION_RE.match(name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def _load_metadata(path: str) -> dict:
    v = _current_version(path)
    if v == 0:
        raise FileNotFoundError(f"{path}: not a snapshot table (no "
                                "metadata/v*.metadata.json)")
    with open(os.path.join(_meta_dir(path), f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    meta["_version"] = v
    return meta


def create_table(path: str) -> None:
    """Initialize an empty table (version 1, no snapshots)."""
    os.makedirs(_meta_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
    _commit_metadata(path, expected_version=0, metadata={
        "format": "snaptable/1", "snapshots": [],
        "current_snapshot_id": None,
    })


def _commit_metadata(path: str, expected_version: int,
                     metadata: dict) -> int:
    new_v = expected_version + 1
    target = os.path.join(_meta_dir(path), f"v{new_v}.metadata.json")
    payload = json.dumps(
        {k: v for k, v in metadata.items() if not k.startswith("_")},
        indent=1)
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        raise CommitConflictError(
            f"{path}: version {new_v} already committed by another writer")
    with os.fdopen(fd, "w") as f:
        f.write(payload)
    hint = os.path.join(_meta_dir(path), "version-hint.text")
    tmp = hint + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(str(new_v))
    os.replace(tmp, hint)
    return new_v


def _file_stats(fpath: str) -> dict:
    """Per-column min/max + rows/bytes from the parquet FOOTER only.

    Stats are kept for JSON-safe scalar types; anything else (binary,
    nested, timestamps-as-objects) records None and never prunes."""
    md = pq.ParquetFile(fpath).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if st is None or not st.has_min_max:
                mins[name] = maxs[name] = None
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    lo = hi = None
            if not isinstance(lo, (int, float, str, type(None))):
                lo = hi = None
            if name in mins and mins[name] is not None and lo is not None:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
            elif name not in mins:
                mins[name], maxs[name] = lo, hi
            elif lo is None:
                mins[name] = maxs[name] = None
    return {"rows": md.num_rows, "bytes": os.path.getsize(fpath),
            "min": mins, "max": maxs}


def _stage_data_files(spark: SparkSession, df: DataFrame, path: str,
                      snapshot_id: int) -> list[dict]:
    """Write df through Spark into a temp dir, then move the parts into
    data/ under unique immutable names and footer-scan their stats."""
    tok = uuid.uuid4().hex[:8]
    tmp = os.path.join(path, f"_staging-{tok}")
    df.write.mode("overwrite").parquet(tmp)
    entries = []
    parts = sorted(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    for i, p in enumerate(parts):
        name = f"snap{snapshot_id:05d}-{tok}-{i:04d}.parquet"
        dst = os.path.join(path, "data", name)
        os.replace(os.path.join(tmp, p), dst)
        entries.append({"path": f"data/{name}", **_file_stats(dst)})
    for leftover in os.listdir(tmp):
        os.remove(os.path.join(tmp, leftover))
    os.rmdir(tmp)
    return entries


def _write_snapshot(spark: SparkSession, df: DataFrame, path: str, *,
                    operation: str, ts: Optional[float] = None,
                    max_retries: int = 3) -> int:
    """Commit df as a new snapshot. operation: 'append' carries the prior
    snapshot's files forward; 'overwrite' references only the new files.
    Data files are staged once; only the metadata commit retries."""
    meta = _load_metadata(path)
    snap_id = (meta["snapshots"][-1]["snapshot_id"] + 1
               if meta["snapshots"] else 1)
    new_entries = _stage_data_files(spark, df, path, snap_id)
    for _ in range(max_retries + 1):
        meta = _load_metadata(path)
        snap_id = (meta["snapshots"][-1]["snapshot_id"] + 1
                   if meta["snapshots"] else 1)
        if operation == "append" and meta["current_snapshot_id"] is not None:
            base = _load_manifest(path, meta["current_snapshot_id"])
            entries = base + new_entries
        else:
            entries = new_entries
        mname = f"manifest-{snap_id:05d}.json"
        with open(os.path.join(path, "manifests", mname), "w") as f:
            json.dump(entries, f, indent=1)
        snap = {"snapshot_id": snap_id, "operation": operation,
                "timestamp": float(ts if ts is not None else time.time()),
                "manifest": f"manifests/{mname}",
                "rows": sum(e["rows"] for e in entries),
                "added_files": len(new_entries),
                "total_files": len(entries)}
        new_meta = {"format": "snaptable/1",
                    "snapshots": meta["snapshots"] + [snap],
                    "current_snapshot_id": snap_id}
        try:
            _commit_metadata(path, meta["_version"], new_meta)
            return snap_id
        except CommitConflictError:
            # staged data files are immutable and uniquely named — only
            # the metadata commit is retried against the new state
            continue
    raise CommitConflictError(
        f"{path}: gave up after {max_retries} commit retries")


def append(spark: SparkSession, df: DataFrame, path: str, *,
           ts: Optional[float] = None) -> int:
    return _write_snapshot(spark, df, path, operation="append", ts=ts)


def overwrite(spark: SparkSession, df: DataFrame, path: str, *,
              ts: Optional[float] = None) -> int:
    return _write_snapshot(spark, df, path, operation="overwrite", ts=ts)


def _load_manifest(path: str, snapshot_id: int) -> list[dict]:
    meta = _load_metadata(path)
    for s in meta["snapshots"]:
        if s["snapshot_id"] == snapshot_id:
            with open(os.path.join(path, s["manifest"])) as f:
                return json.load(f)
    raise SnapshotNotFoundError(f"{path}: snapshot {snapshot_id}")


def _resolve_snapshot(meta: dict, snapshot_id: Optional[int],
                      as_of: Optional[float]) -> int:
    if snapshot_id is not None:
        return snapshot_id
    if as_of is not None:
        live = [s for s in meta["snapshots"] if s["timestamp"] <= as_of]
        if not live:
            raise SnapshotNotFoundError(
                f"no snapshot at or before as_of={as_of}")
        return live[-1]["snapshot_id"]
    if meta["current_snapshot_id"] is None:
        raise SnapshotNotFoundError("table has no snapshots")
    return meta["current_snapshot_id"]


_OPS = {
    "<": lambda lo, hi, v: lo is not None and lo < v,
    "<=": lambda lo, hi, v: lo is not None and lo <= v,
    ">": lambda lo, hi, v: hi is not None and hi > v,
    ">=": lambda lo, hi, v: hi is not None and hi >= v,
    "=": lambda lo, hi, v: lo is None or hi is None or lo <= v <= hi,
}


def plan_files(path: str, *, snapshot_id: Optional[int] = None,
               as_of: Optional[float] = None,
               filters: Optional[Sequence[tuple]] = None
               ) -> tuple[list[str], list[str]]:
    """(kept, skipped) absolute file paths for a snapshot under conjunctive
    ``filters`` = [(column, op, literal), ...] with op in {<,<=,>,>=,=}.

    A file is kept unless its footer min/max PROVE some predicate can
    match no row (missing stats never prune) — the manifest-level scan
    planning Iceberg does before the engine sees a single file."""
    meta = _load_metadata(path)
    snap = _resolve_snapshot(meta, snapshot_id, as_of)
    kept, skipped = [], []
    for e in _load_manifest(path, snap):
        ok = True
        for col, op, val in (filters or ()):
            if op not in _OPS:
                raise ValueError(f"unsupported op {op!r}")
            lo = e["min"].get(col)
            hi = e["max"].get(col)
            if lo is None and hi is None and col in e["min"]:
                continue  # no stats -> cannot prune
            if col not in e["min"]:
                continue  # column absent from stats (schema drift)
            if not _OPS[op](lo, hi, val):
                ok = False
                break
        (kept if ok else skipped).append(os.path.join(path, e["path"]))
    return kept, skipped


def read_table(spark: SparkSession, path: str, *,
               snapshot_id: Optional[int] = None,
               as_of: Optional[float] = None,
               filters: Optional[Sequence[tuple]] = None) -> DataFrame:
    """Snapshot-consistent read: plan files from the manifest (with
    stats pruning), then scan only those.  The predicate itself must
    still be applied by the caller — pruning is file-granular, exactly
    like Iceberg's scan planning feeding Spark's own pushdown."""
    kept, _ = plan_files(path, snapshot_id=snapshot_id, as_of=as_of,
                         filters=filters)
    if not kept:
        snap = _resolve_snapshot(_load_metadata(path), snapshot_id, as_of)
        # preserve the schema for an all-pruned scan
        all_files = [os.path.join(path, e["path"])
                     for e in _load_manifest(path, snap)]
        if not all_files:
            raise SnapshotNotFoundError(f"{path}: snapshot {snap} is empty")
        return spark.read.parquet(all_files[0]).limit(0)
    return spark.read.parquet(*kept)


def history(path: str) -> list[dict]:
    return list(_load_metadata(path)["snapshots"])


def expire_snapshots(path: str, *, keep_last: int = 1) -> list[str]:
    """Drop all but the last ``keep_last`` snapshots and delete data files
    no surviving snapshot references.  Returns deleted file paths."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    meta = _load_metadata(path)
    snaps = meta["snapshots"]
    keep, drop = snaps[-keep_last:], snaps[:-keep_last]
    if not drop:
        return []
    live: set[str] = set()
    for s in keep:
        live.update(e["path"] for e in _load_manifest(path, s["snapshot_id"]))
    deleted = []
    for s in drop:
        for e in _load_manifest(path, s["snapshot_id"]):
            if e["path"] not in live:
                fp = os.path.join(path, e["path"])
                if os.path.exists(fp):
                    os.remove(fp)
                    deleted.append(fp)
        os.remove(os.path.join(path, s["manifest"]))
    new_meta = {"format": "snaptable/1", "snapshots": keep,
                "current_snapshot_id": meta["current_snapshot_id"]}
    _commit_metadata(path, meta["_version"], new_meta)
    return deleted
