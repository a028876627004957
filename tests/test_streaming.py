"""Structured Streaming: file-source stream over events parquet; the
availableNow drain must equal the batch aggregation on the same data."""

import pytest
from pyspark.sql import functions as F

from s2geography_spark.streaming.events import (run_stream_to_memory,
                                                session_windows,
                                                stream_events_from_parquet,
                                                windowed_event_counts)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


def test_windowed_counts_stream_equals_batch(spark, events, tmp_path_factory):
    # re-write events as several files so the stream sees multiple microbatches
    path = str(tmp_path_factory.mktemp("events_stream"))
    events.repartition(4).write.mode("overwrite").parquet(path)

    batch = windowed_event_counts(spark.read.parquet(path)).collect()

    stream = stream_events_from_parquet(spark, path, events.schema)
    agg = windowed_event_counts(stream, streaming=True)
    run_stream_to_memory(agg, "win_counts", output_mode="complete")
    got = spark.table("win_counts").collect()

    def key(rows):
        return {(r.window_start, r.event_type): (r.n_events, float(r.sum_value))
                for r in rows}
    bk, gk = key(batch), key(got)
    assert set(bk) == set(gk)
    for k in bk:
        assert bk[k][0] == gk[k][0]
        assert bk[k][1] == pytest.approx(gk[k][1], rel=1e-9)


def test_session_windows_batch(spark, events):
    out = session_windows(events).limit(20).collect()
    assert all(r.session_end >= r.session_start and r.n_events >= 1 for r in out)


def test_streaming_dedup_watermark_eviction(spark, tmp_path_factory):
    """Within-delay duplicates drop across microbatches; a duplicate
    arriving after the watermark passed its key's eviction point is
    RE-emitted (bounded state, documented contract)."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from s2geography_spark.streaming.events import streaming_dedup

    path = str(tmp_path_factory.mktemp("stream_dedup"))
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    batches = [
        # batch 0: first arrivals
        [("a", t0), ("b", t0)],
        # batch 1: dup of a within delay -> dropped; c advances the
        # watermark to 03:00 - 1h = 02:00 > a's eviction point (01:00)
        [("a", t0 + pd.Timedelta("10 minutes")),
         ("c", t0 + pd.Timedelta("3 hours"))],
        # batch 2: a is STILL deduped — eviction runs at batch END, after
        # this batch's rows were matched against the surviving state
        [("a", t0 + pd.Timedelta("3 hours"))],
        # batch 3: a's state is gone now -> re-emitted
        [("a", t0 + pd.Timedelta("3 hours 10 minutes"))],
    ]
    for k, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["k", "event_time"])
        # microsecond UTC timestamps: pyarrow's default nanos don't read
        # back as Spark's `timestamp`
        pdf["event_time"] = pdf["event_time"].dt.tz_localize("UTC")
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        tbl = tbl.cast(pa.schema([("k", pa.string()),
                                  ("event_time",
                                   pa.timestamp("us", tz="UTC"))]))
        f = os.path.join(path, f"{k:02d}.parquet")
        pq.write_table(tbl, f)
        os.utime(f, (1700000000 + k, 1700000000 + k))

    stream = (spark.readStream.schema("k string, event_time timestamp")
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = streaming_dedup(stream, ["k"], event_time="event_time",
                          delay="1 hour")
    from s2geography_spark.streaming.events import run_stream_to_memory
    run_stream_to_memory(out, "dedup_evict")
    got = [(r.k, r.event_time) for r in
           spark.table("dedup_evict").collect()]
    ks = sorted(k for k, _ in got)
    assert ks == ["a", "a", "b", "c"], got  # a re-emitted exactly once
    a_times = sorted(t for k, t in got if k == "a")
    assert a_times[1] >= a_times[0] + pd.Timedelta("3 hours")
