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
