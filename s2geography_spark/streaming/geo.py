"""Streaming geo operators.

* enrich_stream_with_tiles — tile/cell assignment on a stream of points
  (identical Column/UDF plan as batch; Structured Streaming executes it
  per microbatch).
* streaming_spatial_tag — the flagship cover-join refine applied to a
  stream: stream-static broadcast join + UDF refine (stateless, so it runs
  under any output mode).
* streaming_first_seen — custom stateful operator via applyInPandasWithState:
  emits only the first occurrence of each key (streaming exact-dedup), with
  a processing-time TTL to bound state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.tiles import assign_tiles


def enrich_stream_with_tiles(stream: DataFrame, *, lng: str = "lng",
                             lat: str = "lat", s2_levels=(8,),
                             mercator_zooms=(8,)) -> DataFrame:
    return assign_tiles(stream, lng=lng, lat=lat, s2_levels=s2_levels,
                        mercator_zooms=mercator_zooms)


def streaming_spatial_tag(stream: DataFrame, prepared_regions,
                          *, lng: str = "lng", lat: str = "lat",
                          level: int = 6, leaf_col=None) -> DataFrame:
    """Tag each streamed point with the region(s) containing it — the
    spatial join's stream-static form (broadcast dim, stateless refine)."""
    from ..operators.spatial_join import spatial_join
    return spatial_join(stream, prepared_regions, lng=lng, lat=lat,
                        level=level, leaf_col=leaf_col)


def streaming_first_seen(stream: DataFrame, key: str,
                         ttl_ms: int | None = None) -> DataFrame:
    """Keep the first row per key across the whole stream (stateful dedup
    via applyInPandasWithState).  Output: (key string, first_seen_count long).

    ttl_ms: optional processing-time TTL that expires state for keys not
    seen recently (bounds state for unbounded key spaces on continuous
    streams).  Leave None for availableNow/backfill runs — pending
    processing-time timeouts keep an availableNow query alive indefinitely.
    """
    out_schema = T.StructType([
        T.StructField(key, T.StringType()),
        T.StructField("first_seen_count", T.LongType()),
    ])
    state_schema = T.StructType([T.StructField("seen", T.LongType())])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if not state.exists and n > 0:
            state.update((1,))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame({key: [key_tuple[0]], "first_seen_count": [n]})

    return (stream.groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", timeout))
