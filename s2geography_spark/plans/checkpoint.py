"""Stage-boundary checkpointing with per-partition lineage manifests.

Every pipeline stage can be wrapped in ``checkpointed_stage``: the stage's
output is written to Parquet together with a manifest JSON recording, per
output partition, ``(partition_id, rows, bytes, checksum)`` plus stage-level
totals.  A rerun whose manifest is complete skips the compute entirely and
reads the Parquet back — the engine analog of the reference's encoded
index + embedded covering reload shortcut (geography_interface.h:150-158).

Checksums are order-insensitive (sum of per-row xxhash64 over the
stringified row), so a resumed run can be verified bit-identical regardless
of task scheduling order.  This is the per-partition lineage + row/byte
metrics surface required by the north rule.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_stage_manifest.json"


def _require_local(path: str) -> None:
    """Manifest IO uses local os.path/open while the data goes through
    Spark's Hadoop FS; on hdfs://-style URIs the manifest would silently
    never be found (checkpoints never resume) and byte accounting would
    raise after the expensive write.  Enforce local-path-only up front;
    cluster-storage support would route manifests through the Hadoop
    FileSystem API."""
    if "://" in path:
        raise ValueError(
            f"checkpoint path {path!r} has a URI scheme: manifests are read "
            "and written with local filesystem IO — pass a plain local path")


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST_NAME)


def stage_metrics(df: DataFrame) -> tuple[list[dict], dict]:
    """Per-partition (rows, checksum) + stage totals for a materialized df."""
    cols = [F.col(c).cast("string") for c in df.columns]
    # sum xxhash64 values in decimal(38,0) — a plain long sum overflows
    # under ANSI mode; decimal keeps the checksum exact and order-free
    per_part = (df
                .withColumn("_pid", F.spark_partition_id())
                .withColumn("_h", F.xxhash64(*cols).cast("decimal(38,0)"))
                .groupBy("_pid")
                .agg(F.count("*").alias("rows"), F.sum("_h").alias("checksum"))
                .collect())
    parts = [{"partition_id": int(r._pid), "rows": int(r.rows),
              "checksum": int(r.checksum)} for r in per_part]
    totals = {"rows": sum(p["rows"] for p in parts),
              "checksum": sum(p["checksum"] for p in parts) % (1 << 63),
              "n_partitions": len(parts)}
    return parts, totals


def manifest_is_complete(path: str) -> bool:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as f:
            m = json.load(f)
        return m.get("status") == "complete"
    except (json.JSONDecodeError, OSError):
        return False


def checkpointed_stage(spark: SparkSession, path: str, stage_name: str,
                       build: Callable[[], DataFrame],
                       verify_checksum: bool = False) -> DataFrame:
    """Run (or resume) a checkpointed stage.

    If `path` holds a complete manifest the stage is skipped and the parquet
    is read back (optionally re-verifying the order-insensitive checksum).
    Otherwise `build()` runs, the result is written, and the manifest is
    committed last (write-then-rename is unnecessary: an incomplete/absent
    manifest simply forces recompute)."""
    _require_local(path)
    if manifest_is_complete(path):
        df = spark.read.parquet(path)
        if verify_checksum:
            _, totals = stage_metrics(df)
            with open(_manifest_path(path)) as f:
                recorded = json.load(f)["totals"]
            if totals["rows"] != recorded["rows"] or \
                    totals["checksum"] != recorded["checksum"]:
                raise RuntimeError(
                    f"stage {stage_name}: checkpoint at {path} fails checksum "
                    f"({totals} != {recorded})")
        return df

    t0 = time.time()
    out = build()
    out.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    parts, totals = stage_metrics(df)
    bytes_total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet"))
    manifest = {
        "stage": stage_name,
        "status": "complete",
        "wall_seconds": round(time.time() - t0, 3),
        "bytes": bytes_total,
        "totals": totals,
        "partitions": parts,
        "written_at_unix": int(time.time()),
    }
    with open(_manifest_path(path), "w") as f:
        json.dump(manifest, f, indent=1)
    return df


def read_manifest(path: str) -> Optional[dict]:
    if not os.path.exists(_manifest_path(path)):
        return None
    with open(_manifest_path(path)) as f:
        return json.load(f)
