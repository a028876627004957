"""Checkpoint/resume: manifests record per-partition lineage; reruns skip
compute; checksums are order-insensitive and verify bit-identical resume."""

import json
import os

from pyspark.sql import functions as F

from s2geography_spark.plans.checkpoint import (checkpointed_stage,
                                                manifest_is_complete,
                                                read_manifest, stage_metrics)


def test_checkpoint_resume_skips_compute(spark, tmp_path):
    path = str(tmp_path / "stage1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(1000).withColumn("v", F.col("id") * 2)

    df1 = checkpointed_stage(spark, path, "stage1", build)
    assert calls["n"] == 1
    assert manifest_is_complete(path)
    m = read_manifest(path)
    assert m["totals"]["rows"] == 1000
    assert m["bytes"] > 0
    assert len(m["partitions"]) == m["totals"]["n_partitions"]
    assert sum(p["rows"] for p in m["partitions"]) == 1000

    # resume: build() must NOT run again; checksum verifies
    df2 = checkpointed_stage(spark, path, "stage1", build, verify_checksum=True)
    assert calls["n"] == 1
    assert df2.count() == 1000
    assert df1.exceptAll(df2).count() == 0


def test_checksum_is_order_insensitive(spark):
    df = spark.range(500).withColumn("v", F.col("id") % 7)
    _, t1 = stage_metrics(df.repartition(3))
    _, t2 = stage_metrics(df.repartition(11))
    assert t1["rows"] == t2["rows"] == 500
    assert t1["checksum"] == t2["checksum"]


def test_incomplete_manifest_forces_recompute(spark, tmp_path):
    path = str(tmp_path / "stage2")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    checkpointed_stage(spark, path, "stage2", build)
    # corrupt the manifest -> rerun recomputes
    with open(os.path.join(path, "_stage_manifest.json"), "w") as f:
        json.dump({"status": "running"}, f)
    checkpointed_stage(spark, path, "stage2", build)
    assert calls["n"] == 2
