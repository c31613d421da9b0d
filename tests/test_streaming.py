"""Structured Streaming correctness: stream-mode (availableNow) results
must equal the batch run of the same transform — the incremental-execution
guarantee. Uses the events fixture as a file source.
"""

import pyspark.sql.functions as F
import pytest

from bearly_spark.sources.tables import events_with_timestamp
from bearly_spark.streaming import (
    events_stream,
    session_window_counts,
    sliding_window_counts,
    stateful_running_max,
    tumbling_window_counts,
)


def _run_stream_to_memory(spark, sdf, name, output_mode="complete"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def _normalize(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir, tmp_path_factory):
    # The file streaming source requires a directory (production layout:
    # a landing dir files arrive into) — stage the fixture file into one.
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return events_stream(spark, str(d))


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return events_with_timestamp(spark, sf_dir)


def test_tumbling_stream_equals_batch(spark, stream_src, batch_events):
    got = _run_stream_to_memory(
        spark, tumbling_window_counts(stream_src), "t_tumbling"
    )
    want = tumbling_window_counts(batch_events)
    assert _normalize(got) == _normalize(want)


def test_sliding_stream_equals_batch(spark, stream_src, batch_events):
    got = _run_stream_to_memory(spark, sliding_window_counts(stream_src), "t_sliding")
    want = sliding_window_counts(batch_events)
    assert _normalize(got) == _normalize(want)


def test_session_stream_equals_batch(spark, stream_src, batch_events):
    got = _run_stream_to_memory(spark, session_window_counts(stream_src), "t_session")
    want = session_window_counts(batch_events)
    assert _normalize(got) == _normalize(want)


def test_stateful_running_max(spark, stream_src, batch_events):
    """applyInPandasWithState per-user running max: after draining the
    whole fixture, state must equal the batch max(value) per user."""
    got = _run_stream_to_memory(
        spark, stateful_running_max(stream_src), "t_state", output_mode="update"
    )
    # "update" memory sink keeps every update; take the last per user
    final = (
        got.groupBy("user_id")
        .agg(F.max("running_max").alias("running_max"), F.max("n_seen").alias("n_seen"))
        .collect()
    )
    want = {
        r.user_id: (r.mx, r.n)
        for r in batch_events.groupBy("user_id")
        .agg(F.max("value").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_map = {r.user_id: (r.running_max, r.n_seen) for r in final}
    assert got_map == want
