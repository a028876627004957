"""Snapshot-table (Iceberg-lite) layer: atomic commits, time travel,
manifest stats pruning, overwrite isolation, snapshot expiry."""
import json
import os

import pytest
from pyspark.sql import functions as F

from s2geography_spark.sources import snaptable as ST


@pytest.fixture()
def tbl(tmp_path):
    p = str(tmp_path / "tbl")
    ST.create_table(p)
    return p


def _range_df(spark, lo, hi, parts=2):
    return (spark.range(lo, hi, 1, parts)
            .select(F.col("id").alias("k"),
                    (F.col("id") * 10).alias("v"),
                    F.concat(F.lit("s"), F.col("id")).alias("s")))


def test_append_and_current_read(spark, tbl):
    s1 = ST.append(spark, _range_df(spark, 0, 100), tbl)
    s2 = ST.append(spark, _range_df(spark, 100, 150), tbl)
    assert (s1, s2) == (1, 2)
    df = ST.read_table(spark, tbl)
    assert df.count() == 150
    assert df.agg(F.sum("k")).first()[0] == sum(range(150))


def test_time_travel_by_snapshot_and_ts(spark, tbl):
    ST.append(spark, _range_df(spark, 0, 100), tbl, ts=1000.0)
    ST.append(spark, _range_df(spark, 100, 150), tbl, ts=2000.0)
    assert ST.read_table(spark, tbl, snapshot_id=1).count() == 100
    assert ST.read_table(spark, tbl, as_of=1500.0).count() == 100
    assert ST.read_table(spark, tbl, as_of=2500.0).count() == 150
    with pytest.raises(ST.SnapshotNotFoundError):
        ST.read_table(spark, tbl, as_of=500.0)
    hist = ST.history(tbl)
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[1]["rows"] == 150 and hist[1]["added_files"] > 0


def test_overwrite_isolates_old_snapshot(spark, tbl):
    ST.append(spark, _range_df(spark, 0, 100), tbl)
    ST.overwrite(spark, _range_df(spark, 500, 510), tbl)
    assert ST.read_table(spark, tbl).count() == 10
    # the pre-overwrite snapshot still reads its original rows
    old = ST.read_table(spark, tbl, snapshot_id=1)
    assert old.count() == 100
    assert old.agg(F.max("k")).first()[0] == 99


def test_stats_pruning_skips_disjoint_files(spark, tbl):
    # 4 appends with disjoint k ranges -> disjoint per-file stats
    for lo in (0, 100, 200, 300):
        ST.append(spark, _range_df(spark, lo, lo + 100, parts=1), tbl)
    kept, skipped = ST.plan_files(tbl, filters=[("k", "<", 150)])
    assert len(kept) == 2 and len(skipped) == 2
    kept2, skipped2 = ST.plan_files(tbl, filters=[("k", ">=", 100),
                                                  ("k", "<", 200)])
    assert len(kept2) == 1 and len(skipped2) == 3
    # string stats prune too
    kept3, _ = ST.plan_files(tbl, filters=[("s", "=", "s150")])
    assert any("snap00002" in k for k in kept3)
    # the pruned read returns exactly the filtered rows
    df = ST.read_table(spark, tbl, filters=[("k", "<", 150)]) \
        .filter(F.col("k") < 150)
    assert df.count() == 150


def test_pruning_is_conservative_without_stats(spark, tbl):
    ST.append(spark, _range_df(spark, 0, 50, parts=1), tbl)
    # poison the manifest stats for k -> file must be KEPT
    man = os.path.join(tbl, "manifests", "manifest-00001.json")
    with open(man) as f:
        entries = json.load(f)
    for e in entries:
        e["min"]["k"] = None
        e["max"]["k"] = None
    with open(man, "w") as f:
        json.dump(entries, f)
    kept, skipped = ST.plan_files(tbl, filters=[("k", ">", 10 ** 9)])
    assert len(kept) == 1 and not skipped


def test_all_pruned_read_keeps_schema(spark, tbl):
    ST.append(spark, _range_df(spark, 0, 50), tbl)
    df = ST.read_table(spark, tbl, filters=[("k", ">", 10 ** 9)])
    assert df.count() == 0
    assert set(df.columns) == {"k", "v", "s"}


def test_commit_conflict_detected_and_retried(spark, tbl):
    ST.append(spark, _range_df(spark, 0, 10), tbl)
    # simulate a racing writer owning v3 — direct O_EXCL loser path
    meta = ST._load_metadata(tbl)
    with pytest.raises(ST.CommitConflictError):
        ST._commit_metadata(tbl, expected_version=meta["_version"] - 1,
                            metadata={"format": "snaptable/1",
                                      "snapshots": [],
                                      "current_snapshot_id": None})
    # the public writer retries past an interleaved commit: prepare a
    # conflicting future version, then append — it must succeed anyway
    v = meta["_version"]
    ST._commit_metadata(tbl, expected_version=v, metadata={
        "format": "snaptable/1", "snapshots": meta["snapshots"],
        "current_snapshot_id": meta["current_snapshot_id"]})
    sid = ST.append(spark, _range_df(spark, 10, 20), tbl)
    assert sid == 2
    assert ST.read_table(spark, tbl).count() == 20


def test_expire_snapshots_gc(spark, tbl):
    ST.append(spark, _range_df(spark, 0, 100), tbl)
    ST.overwrite(spark, _range_df(spark, 100, 110), tbl)
    n_files_before = len(os.listdir(os.path.join(tbl, "data")))
    deleted = ST.expire_snapshots(tbl, keep_last=1)
    assert deleted  # snapshot 1's files are unreferenced by snapshot 2
    assert len(os.listdir(os.path.join(tbl, "data"))) < n_files_before
    assert ST.read_table(spark, tbl).count() == 10
    with pytest.raises(ST.SnapshotNotFoundError):
        ST.read_table(spark, tbl, snapshot_id=1)


def test_expired_append_chain_keeps_shared_files(spark, tbl):
    ST.append(spark, _range_df(spark, 0, 100), tbl)
    ST.append(spark, _range_df(spark, 100, 150), tbl)
    # snapshot 2's manifest carries snapshot 1's files forward: expiring
    # snapshot 1 must delete NOTHING
    assert ST.expire_snapshots(tbl, keep_last=1) == []
    assert ST.read_table(spark, tbl).count() == 150
