"""Streaming harness (SURVEY.md §5.2.4): the SAME transforms must produce the
same results mounted on a batch DataFrame and on a Structured Streaming file
source; plus watermark late-data semantics."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from genesapi_cli_spark.io import load
from genesapi_cli_spark.streaming.runtime import (
    events_file_stream,
    run_to_memory,
    with_watermark,
)
from genesapi_cli_spark.streaming.windows import (
    session_stats,
    sliding_counts,
    tumbling_counts,
)

from .conftest import SMOKE_SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_event_files(spark, tmp_path, n_files):
    ev = load(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "ts_us", "user_id", "event_type", "value", "props"
    )
    src = str(tmp_path / "events_ndjson")
    ev.repartition(n_files).write.mode("overwrite").json(src)
    return src


def test_tumbling_batch_equals_stream(spark, tmp_path):
    src = _write_event_files(spark, tmp_path, 3)
    batch = tumbling_counts(load(spark, SMOKE_SF_DIR, "events"))
    stream = tumbling_counts(events_file_stream(spark, src))
    q = run_to_memory(stream, "t_tumbling", output_mode="complete")
    try:
        assert _rows(spark.table("t_tumbling")) == _rows(batch)
    finally:
        q.stop()


def test_sliding_batch_equals_stream(spark, tmp_path):
    src = _write_event_files(spark, tmp_path, 3)
    batch = sliding_counts(load(spark, SMOKE_SF_DIR, "events"))
    stream = sliding_counts(events_file_stream(spark, src))
    q = run_to_memory(stream, "t_sliding", output_mode="complete")
    try:
        assert _rows(spark.table("t_sliding")) == _rows(batch)
    finally:
        q.stop()


def test_session_batch_equals_stream(spark, tmp_path):
    """Session windows only support append mode in streaming: sessions emit
    once the watermark passes their end (+gap). Two rounds of synthetic
    'flush' events push the watermark far enough that every real session
    finalizes; flush sessions themselves are excluded by timestamp."""
    ev = load(spark, SMOKE_SF_DIR, "events")
    max_us = ev.agg(F.max("ts_us")).collect()[0][0]
    flush1_us = max_us + 8 * 3_600_000_000
    flush2_us = max_us + 16 * 3_600_000_000

    src = tmp_path / "session_src"
    src.mkdir()
    ev.select("event_id", "ts_us", "user_id", "event_type", "value", "props").coalesce(
        1
    ).write.mode("overwrite").json(str(src / "b1"))
    users = [r.user_id for r in ev.select("user_id").distinct().collect()]

    stream = session_stats(
        with_watermark(events_file_stream(spark, str(src) + "/*/", 100), "0 seconds")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_session")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        flush1 = [
            {"event_id": 10_000_000 + u, "ts_us": flush1_us, "user_id": u,
             "event_type": "flush", "value": 0.0, "props": "{}"}
            for u in users
        ]
        (src / "b2").mkdir()
        (src / "b2" / "data.json").write_text("\n".join(json.dumps(e) for e in flush1))
        q.processAllAvailable()
        (src / "b3").mkdir()
        (src / "b3" / "data.json").write_text(
            json.dumps({"event_id": 99_999_999, "ts_us": flush2_us, "user_id": users[0],
                        "event_type": "flush", "value": 0.0, "props": "{}"})
        )
        q.processAllAvailable()
        got = spark.table("t_session").filter(F.col("start_us") < flush1_us)
        batch = session_stats(ev)
        assert _rows(got) == _rows(batch)
    finally:
        q.stop()


def test_watermark_drops_late_rows(spark, tmp_path):
    """An event older than (max event time - watermark delay) at the time its
    micro-batch runs must be dropped from the aggregation state."""
    base = 1_704_100_000_000_000  # ~2024-01-01, µs
    hour = 3_600_000_000

    def ev(i, us):
        return {
            "event_id": i,
            "ts_us": us,
            "user_id": 1,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }

    src = tmp_path / "late_src"
    src.mkdir()
    # batch 1: five events in hour H → watermark advances to max - 1h
    batch1 = [ev(i, base + i * 60_000_000) for i in range(5)]
    # batch 2: one event 3h earlier (late → dropped), one fresh event in hour H
    batch2 = [ev(10, base - 3 * hour), ev(11, base + 5 * 60_000_000)]
    (src / "b1.json").write_text("\n".join(json.dumps(e) for e in batch1))

    stream = tumbling_counts(with_watermark(events_file_stream(spark, str(src)), "1 hour"))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b2.json").write_text("\n".join(json.dumps(e) for e in batch2))
        q.processAllAvailable()
        rows = {(r.win_start_s, r.n) for r in spark.table("t_late").collect()}
        late_win_start = (base - 3 * hour) // 1_000_000 // 3600 * 3600
        live_win_start = base // 1_000_000 // 3600 * 3600
        assert not any(w == late_win_start for w, _ in rows), rows
        # the live window must have been updated to include the fresh event (6 total)
        assert (live_win_start, 6) in rows, rows
    finally:
        q.stop()


def test_stateful_profile_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user profile accumulated across multiple
    micro-batches (one file each) must equal the batch groupBy over all
    events — state survives batch boundaries."""
    import math

    from genesapi_cli_spark.streaming.stateful import user_running_profile

    src = _write_event_files(spark, tmp_path, 3)
    stream = events_file_stream(spark, src)
    q = run_to_memory(user_running_profile(stream), "t_stateful", output_mode="update")
    try:
        # update-mode memory sink appends one row per (user, batch); the
        # final state per user is the one with the largest (monotone) count
        rows = spark.sql("SELECT * FROM t_stateful").collect()
        got = {}
        for r in rows:
            if r.user_id not in got or r.n_events > got[r.user_id][0]:
                got[r.user_id] = (r.n_events, r.total_value, r.max_value)
        exp = {
            r.user_id: (r.n, r.tv, r.mv)
            for r in load(spark, SMOKE_SF_DIR, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("tv"),
                F.max("value").alias("mv"),
            )
            .collect()
        }
        assert set(got) == set(exp)
        for u in exp:
            assert got[u][0] == exp[u][0]
            assert math.isclose(got[u][1], exp[u][1], rel_tol=1e-9)
            assert math.isclose(got[u][2], exp[u][2], rel_tol=1e-12)
    finally:
        q.stop()


def test_ndjson_sink_exactly_once_on_replay(spark, tmp_path):
    """Checkpointed file sink: re-starting the same query over the same
    source and checkpoint must not duplicate output rows — the streaming
    form of the reference's idempotent indexing."""
    src = _write_event_files(spark, tmp_path, 2)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    agg = tumbling_counts(with_watermark(events_file_stream(spark, src), "0 seconds"))
    from genesapi_cli_spark.streaming.runtime import write_ndjson_stream

    q1 = write_ndjson_stream(agg, out, ckpt)
    q1.awaitTermination(120)
    q1.stop()
    n_first = spark.read.json(out).count()
    assert n_first > 0
    # replay: same source, same checkpoint — nothing new to process
    q2 = write_ndjson_stream(agg, out, ckpt)
    q2.awaitTermination(120)
    q2.stop()
    assert spark.read.json(out).count() == n_first


def test_stream_stream_join_batch_equals_stream(spark, tmp_path):
    """The attribution join must produce identical rows mounted on batch
    DataFrames and on two watermarked file streams (stream-stream inner
    join with an event-time range bound)."""
    from genesapi_cli_spark.streaming.joins import purchase_attribution

    src = _write_event_files(spark, tmp_path, 3)
    ev = load(spark, SMOKE_SF_DIR, "events")
    batch = purchase_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "signup"),
    )
    # Watermark wider than the data span (30 days): state never evicts in
    # this bounded test, so no row can be dropped by arrival order; the
    # range condition still marks the join state-bounded for the planner.
    sp = with_watermark(
        events_file_stream(spark, src).filter(F.col("event_type") == "purchase"),
        "40 days",
    )
    ss = with_watermark(
        events_file_stream(spark, src).filter(F.col("event_type") == "signup"),
        "40 days",
    )
    stream = purchase_attribution(sp, ss)
    q = run_to_memory(stream, "t_ssjoin", output_mode="append")
    try:
        assert _rows(spark.table("t_ssjoin")) == _rows(batch)
    finally:
        q.stop()


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: at-least-once upstreams (Kafka redelivery,
    file re-lists) re-emit the same event_id across micro-batches; bounded-state
    dedup must collapse them to exactly one row WITHOUT keeping all history
    (the watermark bounds the dedup state — the only way streaming dedup
    survives an unbounded 100 TB/day feed)."""
    ev = load(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "ts_us", "user_id", "event_type", "value", "props"
    ).limit(200)
    src = str(tmp_path / "dup_events")
    # Write the same 200 events TWICE (two files → two micro-batches):
    # a redelivered source.
    ev.coalesce(1).write.mode("overwrite").json(src)
    import glob, shutil

    f = glob.glob(src + "/part-*.json")[0]
    shutil.copy(f, f.replace("part-", "redelivered-part-"))

    stream = events_file_stream(spark, src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = run_to_memory(deduped, "t_dedup_stream", output_mode="append")
    try:
        got = spark.table("t_dedup_stream")
        assert got.count() == 200
        assert got.select("event_id").distinct().count() == 200
    finally:
        q.stop()


def test_foreachbatch_streaming_merge_into_lake(spark, tmp_path):
    """foreachBatch: the streaming→lake upsert pattern. Each micro-batch
    merges (keep-latest by event_id) into a parquet state table — the
    mechanism for maintaining a continuously-updated serving copy when the
    sink has no native streaming support. Must be idempotent per batch
    (batch_id-keyed) and converge to exactly the batch-dedup result."""
    ev = load(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "ts_us", "user_id", "event_type", "value", "props"
    ).limit(300)
    src = str(tmp_path / "merge_src")
    ev.repartition(3).write.mode("overwrite").json(src)

    state_dir = str(tmp_path / "state")

    COLS = ["event_id", "ts_us", "user_id", "event_type", "value", "props"]

    def merge_batch(batch_df, batch_id):
        s = batch_df.sparkSession
        batch_df = batch_df.select(*COLS)
        import os as _os

        if _os.path.exists(state_dir):
            cur = s.read.parquet(state_dir)
            merged = (
                cur.unionByName(batch_df)
                .groupBy("event_id")
                .agg(
                    F.max(F.struct("ts_us", "user_id", "event_type", "value", "props")).alias("r")
                )
                .select("event_id", "r.*")
            )
        else:
            merged = batch_df.dropDuplicates(["event_id"])
        # write-then-swap would be atomic on a real lake; local tmp is fine
        merged.write.mode("overwrite").parquet(state_dir + ".next")
        import shutil

        if _os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        _os.rename(state_dir + ".next", state_dir)

    stream = events_file_stream(spark, src)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = spark.read.parquet(state_dir)
    assert final.count() == 300
    assert final.select("event_id").distinct().count() == 300
    # state content equals the batch answer for the same input
    want = sorted(tuple(r) for r in ev.collect())
    got = sorted(
        tuple(r)
        for r in final.select(
            "event_id", "ts_us", "user_id", "event_type", "value", "props"
        ).collect()
    )
    assert got == want


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: a streaming event source enriched against a static
    (batch) dimension broadcast per micro-batch — the standard streaming
    enrichment pattern (no state store involved; the static side is re-read
    per batch, so a dim refresh is picked up between batches)."""
    src = _write_event_files(spark, tmp_path, 2)
    static_dim = spark.range(0, 2000).select(
        F.col("id").alias("user_id"), (F.col("id") % 3).alias("segment")
    )
    stream = events_file_stream(spark, src).join(static_dim, "user_id").groupBy(
        "segment"
    ).agg(F.count(F.lit(1)).alias("n"))
    q = run_to_memory(stream, "t_enrich", output_mode="complete")
    try:
        got = _rows(spark.table("t_enrich"))
        batch = (
            load(spark, SMOKE_SF_DIR, "events")
            .join(static_dim, "user_id")
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert got == _rows(batch)
    finally:
        q.stop()


def test_python_streaming_datasource_replays_events(spark, tmp_path):
    """The Spark 4 Python STREAMING data source (events_replay) delivers the
    whole events table in deterministic micro-batches: the streamed
    aggregate equals the batch aggregate, and more than one micro-batch
    actually ran (batch_rows < table size)."""
    from genesapi_cli_spark.streaming.pysource import EventsReplayDataSource

    try:
        spark.dataSource.register(EventsReplayDataSource)
    except Exception:
        pass
    path = "/root/testdata/sf0.001/events.parquet"
    stream = (
        spark.readStream.format("events_replay")
        .option("path", path)
        .option("batch_rows", "200")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "replay_ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.table("t_replay")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")).alias("c"),
            )
        )
        want = (
            spark.read.parquet(path)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")).alias("c"),
            )
        )
        assert _rows(got) == _rows(want)
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert n_batches >= 2, f"expected multiple micro-batches, got {n_batches}"
    finally:
        q.stop()


def test_page_hinkley_stream_equals_batch(spark, tmp_path):
    """Stateful streaming Page-Hinkley across time-ordered micro-batches must
    equal the batch q_events_page_hinkley exactly — the sequential-detector
    analog of the stateful-profile equivalence, with EXACT integer state (no
    float tolerance anywhere). Files are dropped one per micro-batch in
    event-time order (the sequential detector's delivery contract)."""
    import json as _json

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.streaming.stateful import page_hinkley_stream

    genesapi_cli_spark.load_all()

    ev = (
        load(spark, SMOKE_SF_DIR, "events")
        .select("event_id", "ts_us", "event_type", "value")
        .orderBy("ts_us", "event_id")
        .collect()
    )
    cut = ev[len(ev) // 2].ts_us
    src = tmp_path / "ph_src"
    src.mkdir()

    def dump(rows, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts_us": r.ts_us,
                        "user_id": 0,
                        "event_type": r.event_type,
                        "value": r.value,
                        "props": None,
                    }
                )
                for r in rows
            )
        )

    import os
    import time as _time

    dump([r for r in ev if r.ts_us <= cut], "b1.json")
    dump([r for r in ev if r.ts_us > cut], "b2.json")
    # file source orders micro-batches by modification time: make the
    # earlier time-range strictly older so batch order == event-time order
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(page_hinkley_stream(stream), "t_ph", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM t_ph").collect()
        got = {}
        for r in rows:  # update-mode sink: keep the latest (largest n) per key
            if r.event_type not in got or r.n > got[r.event_type][0]:
                got[r.event_type] = (
                    r.n,
                    r.n_alarms,
                    r.first_alarm_t,
                    r.max_ph_micro,
                )
        exp = {
            r.event_type: (r.n, r.n_alarms, r.first_alarm_t, r.max_ph_micro)
            for r in REGISTRY["q_events_page_hinkley"]
            .fn(spark, SMOKE_SF_DIR)
            .collect()
        }
        assert got == exp
    finally:
        q.stop()


def test_cusum_stream_equals_batch(spark, tmp_path):
    """Stateful streaming fixed-target CUSUM across time-ordered
    micro-batches must equal the batch cumulative-window rollup exactly —
    the profile→monitor contract: targets come from a batch profile
    (per-stream floor-mean cents), then the online detector's final state
    is bit-identical to the retrospective window over the same rows."""
    import json as _json
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.streaming.stateful import (
        cusum_fixed_target_batch,
        cusum_stream,
    )

    genesapi_cli_spark.load_all()

    events = load(spark, SMOKE_SF_DIR, "events")
    from pyspark.sql import functions as F

    prof = (
        events.select("event_type", F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c"))
        .groupBy("event_type")
        .agg(F.expr("SUM(c) div COUNT(*)").alias("k"))
        .collect()
    )
    targets = {r.event_type: int(r.k) for r in prof}

    want = {
        r.event_type: (r.n, r.max_cusum_scaled, r.min_cusum_scaled)
        for r in cusum_fixed_target_batch(events, targets).collect()
    }

    ev = (
        events.select("event_id", "ts_us", "event_type", "value")
        .orderBy("ts_us", "event_id")
        .collect()
    )
    cut = ev[len(ev) // 2].ts_us
    src = tmp_path / "cusum_src"
    src.mkdir()

    def dump(rows, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts_us": r.ts_us,
                        "user_id": 0,
                        "event_type": r.event_type,
                        "value": r.value,
                        "props": None,
                    }
                )
                for r in rows
            )
        )

    dump([r for r in ev if r.ts_us <= cut], "b1.json")
    dump([r for r in ev if r.ts_us > cut], "b2.json")
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(cusum_stream(stream, targets), "t_cusum", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM t_cusum").collect()
        # update mode: the LAST emission per key wins, but memory-sink row
        # iteration order is NOT contractual across micro-batches — select
        # it by the monotone per-key event count n instead of row order.
        got = {}
        for r in rows:
            if r.event_type not in got or r.n > got[r.event_type][0]:
                got[r.event_type] = (r.n, r.max_cusum_scaled, r.min_cusum_scaled)
    finally:
        q.stop()
    assert got == want


def _dump_shuffled(src, name, rows, seed):
    """Write one micro-batch file with rows in a seeded-SHUFFLED order —
    the arrival-order-vs-event-order probe: a sequential detector's fold
    sorts by (ts_us, event_id) WITHIN each micro-batch, so any arrival
    permutation inside the delivery horizon must fold identically."""
    import json as _json
    import random as _random

    rows = list(rows)
    _random.Random(seed).shuffle(rows)
    (src / name).write_text(
        "\n".join(
            _json.dumps(
                {
                    "event_id": r.event_id,
                    "ts_us": r.ts_us,
                    "user_id": 0,
                    "event_type": r.event_type,
                    "value": r.value,
                    "props": None,
                }
            )
            for r in rows
        )
    )


def test_page_hinkley_shuffled_arrival_equals_batch(spark, tmp_path):
    """Out-of-order-ARRIVAL twin of test_page_hinkley_stream_equals_batch:
    the same time-cut micro-batches, but rows inside each file are written
    in a seeded random permutation. Page-Hinkley is order-SENSITIVE across
    events, so correctness rests entirely on the fold's within-batch
    (ts_us, event_id) sort — this proves arrival order inside the horizon
    is free, exactly as q_stream_late proves it for the accounting row."""
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.streaming.stateful import page_hinkley_stream

    genesapi_cli_spark.load_all()

    ev = (
        load(spark, SMOKE_SF_DIR, "events")
        .select("event_id", "ts_us", "event_type", "value")
        .orderBy("ts_us", "event_id")
        .collect()
    )
    cut = ev[len(ev) // 2].ts_us
    src = tmp_path / "ph_shuf_src"
    src.mkdir()
    _dump_shuffled(src, "b1.json", (r for r in ev if r.ts_us <= cut), seed=12)
    _dump_shuffled(src, "b2.json", (r for r in ev if r.ts_us > cut), seed=34)
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(page_hinkley_stream(stream), "t_ph_shuf", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM t_ph_shuf").collect()
        got = {}
        for r in rows:  # update-mode sink: latest (largest n) per key wins
            if r.event_type not in got or r.n > got[r.event_type][0]:
                got[r.event_type] = (r.n, r.n_alarms, r.first_alarm_t, r.max_ph_micro)
        exp = {
            r.event_type: (r.n, r.n_alarms, r.first_alarm_t, r.max_ph_micro)
            for r in REGISTRY["q_events_page_hinkley"].fn(spark, SMOKE_SF_DIR).collect()
        }
        assert got == exp
    finally:
        q.stop()


def test_cusum_shuffled_arrival_equals_batch(spark, tmp_path):
    """Out-of-order-ARRIVAL twin of test_cusum_stream_equals_batch: same
    time-cut micro-batches, rows inside each file seeded-shuffled. Proves
    the CUSUM fold's within-batch sort makes arrival order inside the
    horizon free — only the batch boundary (the delivery contract) carries
    ordering responsibility."""
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.streaming.stateful import (
        cusum_fixed_target_batch,
        cusum_stream,
    )

    genesapi_cli_spark.load_all()

    events = load(spark, SMOKE_SF_DIR, "events")
    prof = (
        events.select(
            "event_type", F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c")
        )
        .groupBy("event_type")
        .agg(F.expr("SUM(c) div COUNT(*)").alias("k"))
        .collect()
    )
    targets = {r.event_type: int(r.k) for r in prof}
    want = {
        r.event_type: (r.n, r.max_cusum_scaled, r.min_cusum_scaled)
        for r in cusum_fixed_target_batch(events, targets).collect()
    }

    ev = (
        events.select("event_id", "ts_us", "event_type", "value")
        .orderBy("ts_us", "event_id")
        .collect()
    )
    cut = ev[len(ev) // 2].ts_us
    src = tmp_path / "cusum_shuf_src"
    src.mkdir()
    _dump_shuffled(src, "b1.json", (r for r in ev if r.ts_us <= cut), seed=56)
    _dump_shuffled(src, "b2.json", (r for r in ev if r.ts_us > cut), seed=78)
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(
        cusum_stream(stream, targets), "t_cusum_shuf", output_mode="update"
    )
    try:
        rows = spark.sql("SELECT * FROM t_cusum_shuf").collect()
        got = {}
        for r in rows:
            if r.event_type not in got or r.n > got[r.event_type][0]:
                got[r.event_type] = (r.n, r.max_cusum_scaled, r.min_cusum_scaled)
    finally:
        q.stop()
    assert got == want


def test_ks_shuffled_arrival_equals_batch(spark, tmp_path):
    """Shuffled-arrival twin for the order-FREE detector: KS state is a
    distribution (cents histogram per side), so even the file-level row
    permutation needs no within-batch sort to land on the batch row —
    asserted here so the order-freedom claim in stateful.py is pinned by a
    test for all three detector families, not just argued."""
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.streaming.stateful import ks_stream

    genesapi_cli_spark.load_all()

    want = REGISTRY["q_events_ks"].fn(spark, SMOKE_SF_DIR).collect()[0]
    ev = (
        load(spark, SMOKE_SF_DIR, "events")
        .select("event_id", "ts_us", "event_type", "value")
        .collect()
    )
    src = tmp_path / "ks_shuf_src"
    src.mkdir()
    _dump_shuffled(src, "b1.json", (r for r in ev if r.event_id % 3 != 0), seed=90)
    _dump_shuffled(src, "b2.json", (r for r in ev if r.event_id % 3 == 0), seed=91)
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(ks_stream(stream), "t_ks_shuf", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM t_ks_shuf").collect()
        last = max(rows, key=lambda r: r.na + r.nb)
    finally:
        q.stop()
    assert (last.na, last.nb, last.d_num, last.d_r4) == (
        want.na,
        want.nb,
        want.d_num,
        want.d_r4,
    )


def test_ks_stream_equals_batch(spark, tmp_path):
    """Stateful streaming exact two-sample KS across micro-batches must
    equal the batch q_events_ks row exactly after the final micro-batch —
    and, because KS is a DISTRIBUTION statistic (order-free, unlike
    CUSUM/Page-Hinkley), the equivalence holds regardless of how rows are
    split across micro-batches; the split here is an arbitrary event_id
    hash, not a time cut."""
    import json as _json
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.streaming.stateful import ks_stream

    genesapi_cli_spark.load_all()

    want = REGISTRY["q_events_ks"].fn(spark, SMOKE_SF_DIR).collect()[0]

    events = load(spark, SMOKE_SF_DIR, "events")
    ev = events.select("event_id", "ts_us", "event_type", "value").collect()
    src = tmp_path / "ks_src"
    src.mkdir()

    def dump(rows, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts_us": r.ts_us,
                        "user_id": 0,
                        "event_type": r.event_type,
                        "value": r.value,
                        "props": None,
                    }
                )
                for r in rows
            )
        )

    dump([r for r in ev if r.event_id % 3 != 0], "b1.json")
    dump([r for r in ev if r.event_id % 3 == 0], "b2.json")
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(ks_stream(stream), "t_ks", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM t_ks").collect()
        # update mode: pick the final emission by the monotone sample sizes
        # (na+nb grows every batch), never by memory-sink row order.
        last = max(rows, key=lambda r: r.na + r.nb)
    finally:
        q.stop()
    assert (last.na, last.nb, last.d_num, last.d_r4) == (
        want.na,
        want.nb,
        want.d_num,
        want.d_r4,
    )


def test_esd_stream_equals_batch(spark, tmp_path):
    """Stateful streaming generalized-ESD must equal the batch q_events_esd
    rows exactly after the final micro-batch. Like KS (and unlike CUSUM),
    the day→cents rollup state is ORDER-FREE, so the equivalence holds for
    an arbitrary event_id-hash split across micro-batches."""
    import json as _json
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.streaming.stateful import esd_stream

    genesapi_cli_spark.load_all()

    want = {
        (r.event_type, r.round, r.day_idx, r.cents, r.r_micro, r.n_at_round)
        for r in REGISTRY["q_events_esd"].fn(spark, SMOKE_SF_DIR).collect()
    }
    assert want  # smoke data must actually exercise the screen

    events = load(spark, SMOKE_SF_DIR, "events")
    ev = events.select("event_id", "ts_us", "event_type", "value").collect()
    src = tmp_path / "esd_src"
    src.mkdir()

    def dump(rows, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts_us": r.ts_us,
                        "user_id": 0,
                        "event_type": r.event_type,
                        "value": r.value,
                        "props": None,
                    }
                )
                for r in rows
            )
        )

    dump([r for r in ev if r.event_id % 3 != 0], "b1.json")
    dump([r for r in ev if r.event_id % 3 == 0], "b2.json")
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(esd_stream(stream), "t_esd", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM t_esd").collect()
        # update mode: final emission per key = that key's max monotone
        # `seen` marker, never memory-sink row order.
        last_seen = {}
        for r in rows:
            last_seen[r.event_type] = max(last_seen.get(r.event_type, 0), r.seen)
        got = {
            (r.event_type, r.round, r.day_idx, r.cents, r.r_micro, r.n_at_round)
            for r in rows
            if r.seen == last_seen[r.event_type]
        }
    finally:
        q.stop()
    assert got == want


def test_psi_stream_equals_batch(spark, tmp_path):
    """The frozen-reference streaming PSI monitor must equal the batch
    q_quality_psi verdicts exactly after the final micro-batch: the
    calibration snapshot (psi_reference) freezes the grid + reference
    counts, the stream replays all traffic (the fold itself skips
    reference-period rows), and PSI is order-free, so an arbitrary
    event_id-hash split across micro-batches lands on the batch row."""
    import json as _json
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.registry import REGISTRY
    from genesapi_cli_spark.streaming.stateful import psi_reference, psi_stream

    genesapi_cli_spark.load_all()

    want = {
        r.event_type: (r.n_ref, r.n_cur, r.psi_r4, r.drifted)
        for r in REGISTRY["q_quality_psi"].fn(spark, SMOKE_SF_DIR).collect()
    }
    assert want

    events = load(spark, SMOKE_SF_DIR, "events")
    ref = psi_reference(events)
    ev = events.select("event_id", "ts_us", "event_type", "value").collect()
    src = tmp_path / "psi_src"
    src.mkdir()

    def dump(rows, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts_us": r.ts_us,
                        "user_id": 0,
                        "event_type": r.event_type,
                        "value": r.value,
                        "props": None,
                    }
                )
                for r in rows
            )
        )

    dump([r for r in ev if r.event_id % 3 != 0], "b1.json")
    dump([r for r in ev if r.event_id % 3 == 0], "b2.json")
    now = _time.time()
    os.utime(src / "b1.json", (now - 100, now - 100))
    os.utime(src / "b2.json", (now, now))
    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(psi_stream(stream, ref), "t_psi", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM t_psi").collect()
        last_seen = {}
        for r in rows:
            last_seen[r.event_type] = max(last_seen.get(r.event_type, 0), r.seen)
        got = {
            r.event_type: (r.n_ref, r.n_cur, r.psi_r4, r.drifted)
            for r in rows
            if r.seen == last_seen[r.event_type]
        }
    finally:
        q.stop()
    assert got == want


def test_pack_stream_equals_batch_prefix_sum(spark, tmp_path):
    """Pack-on-ingest must equal the batch exclusive-prefix-sum packing
    relation BIT-FOR-BIT: the smoke corpus is split into three
    doc_id-ordered NDJSON files (the append-log ingest contract), streamed
    one file per micro-batch through the stateful fold, and every emitted
    (source, doc_id, n_tokens, bin_id) row must match pack_assignments —
    the carry crosses micro-batch boundaries exactly. State is two longs
    per source."""
    import json as _json
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.operators.extended import pack_assignments
    from genesapi_cli_spark.streaming.runtime import (
        documents_file_stream,
        run_to_memory,
    )
    from genesapi_cli_spark.streaming.stateful import pack_stream

    genesapi_cli_spark.load_all()

    docs = load(spark, SMOKE_SF_DIR, "documents")
    want = {
        (r.source, r.doc_id): (r.n_tokens, r.bin_id)
        for r in pack_assignments(docs).collect()
    }

    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    src = tmp_path / "pack_src"
    src.mkdir()
    k = len(rows) // 3 + 1

    def dump(chunk, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "doc_id": r.doc_id,
                        "text": r.text,
                        "lang": r.lang,
                        "source": r.source,
                        "n_chars": r.n_chars,
                    }
                )
                for r in chunk
            )
        )

    now = _time.time()
    for i in range(3):
        name = f"b{i}.json"
        dump(rows[i * k : (i + 1) * k], name)
        os.utime(src / name, (now - 100 + i, now - 100 + i))

    stream = documents_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(pack_stream(stream), "t_pack", output_mode="append")
    try:
        got = {
            (r.source, r.doc_id): (r.n_tokens, r.bin_id)
            for r in spark.sql("SELECT * FROM t_pack").collect()
        }
    finally:
        q.stop()
    assert got == want


def test_dedup_stream_equals_batch_first_seen(spark, tmp_path):
    """Dedup-on-ingest must equal the batch min-doc-per-content-hash
    relation exactly across micro-batch boundaries: a duplicate whose
    original arrived in an EARLIER file must still point at that keeper
    (state crosses batches), and keepers must flag is_dup=false. The smoke
    corpus carries real exact duplicates by construction."""
    import json as _json
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.streaming.runtime import (
        documents_file_stream,
        run_to_memory,
    )
    from genesapi_cli_spark.streaming.stateful import dedup_stream
    from pyspark.sql import Window

    genesapi_cli_spark.load_all()

    docs = load(spark, SMOKE_SF_DIR, "documents")
    rows = [r.asDict() for r in sorted(docs.collect(), key=lambda r: r.doc_id)]
    # plant exact duplicates ACROSS the three chunk boundaries: later
    # arrivals of doc 2's and doc 7's content, so the keeper lives in an
    # earlier micro-batch than its dups (the state-crossing case).
    k = len(rows) // 3 + 1
    for i in (k + 5, 2 * k + 5):
        rows[i]["text"] = rows[2]["text"]
    rows[2 * k + 9]["text"] = rows[7]["text"]
    corpus = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    want = {
        (r.doc_id): (r.keeper_doc, r.is_dup)
        for r in corpus.selectExpr("doc_id", "md5(text) AS h")
        .withColumn(
            "keeper_doc", F.min("doc_id").over(Window.partitionBy("h"))
        )
        .selectExpr("doc_id", "keeper_doc", "doc_id != keeper_doc AS is_dup")
        .collect()
    }
    assert sum(v[1] for v in want.values()) == 3
    src = tmp_path / "dedup_src"
    src.mkdir()

    def dump(chunk, name):
        (src / name).write_text("\n".join(_json.dumps(r) for r in chunk))

    now = _time.time()
    for i in range(3):
        name = f"b{i}.json"
        dump(rows[i * k : (i + 1) * k], name)
        os.utime(src / name, (now - 100 + i, now - 100 + i))

    stream = documents_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(dedup_stream(stream), "t_dedup", output_mode="append")
    try:
        got = {
            r.doc_id: (r.keeper_doc, r.is_dup)
            for r in spark.sql("SELECT * FROM t_dedup").collect()
        }
    finally:
        q.stop()
    assert got == want


def test_near_dedup_stream_equals_batch_bands(spark, tmp_path):
    """The band-signature swap, proved: near-dedup-on-ingest's per-band
    emissions must equal the batch portable_bands relation's
    min-doc-per-bucket keepers exactly (multiset — one row per doc per
    band), and the doc-level LSH OR (near-dup iff any band flags) must
    match the batch side's. The smoke corpus carries near-duplicates by
    construction, so both sides must flag a nonzero set."""
    import json as _json
    import os
    import time as _time
    from collections import Counter

    import genesapi_cli_spark
    from genesapi_cli_spark.operators.dedup import build_portable_bands
    from genesapi_cli_spark.streaming.runtime import (
        documents_file_stream,
        run_to_memory,
    )
    from genesapi_cli_spark.streaming.stateful import near_dedup_stream
    from pyspark.sql import Window

    genesapi_cli_spark.load_all()

    bands = build_portable_bands(spark, SMOKE_SF_DIR)
    w = Window.partitionBy("lang", "band", "k1", "k2")
    batch = (
        bands.withColumn("keeper_doc", F.min("doc_id").over(w))
        .selectExpr("doc_id", "keeper_doc", "doc_id != keeper_doc AS is_dup")
        .collect()
    )
    want = Counter((r.doc_id, r.keeper_doc, r.is_dup) for r in batch)
    want_dup_docs = {r.doc_id for r in batch if r.is_dup}
    assert want_dup_docs, "smoke corpus should carry near-duplicates"

    docs = load(spark, SMOKE_SF_DIR, "documents")
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    src = tmp_path / "neardedup_src"
    src.mkdir()
    k = len(rows) // 3 + 1

    def dump(chunk, name):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "doc_id": r.doc_id,
                        "text": r.text,
                        "lang": r.lang,
                        "source": r.source,
                        "n_chars": r.n_chars,
                    }
                )
                for r in chunk
            )
        )

    now = _time.time()
    for i in range(3):
        name = f"b{i}.json"
        dump(rows[i * k : (i + 1) * k], name)
        os.utime(src / name, (now - 100 + i, now - 100 + i))

    stream = documents_file_stream(spark, str(src), max_files_per_trigger=1)
    q = run_to_memory(near_dedup_stream(stream), "t_ndd", output_mode="append")
    try:
        emitted = spark.sql("SELECT * FROM t_ndd").collect()
    finally:
        q.stop()
    got = Counter((r.doc_id, r.keeper_doc, r.is_dup) for r in emitted)
    assert got == want
    got_dup_docs = {r.doc_id for r in emitted if r.is_dup}
    assert got_dup_docs == want_dup_docs


def test_dedup_stream_ttl_evicts_idle_state(spark, tmp_path):
    """The bounded-state production guard: dedup_stream(ttl_ms=...) must
    (a) keep exact first-seen semantics for arrivals inside the retention
    horizon, and (b) EVICT state for content idle past the TTL — a later
    duplicate of evicted content is re-admitted as a fresh keeper (the
    documented recall caveat). Eviction is lazy (ProcessingTimeTimeout
    fires in a micro-batch where the group has no new data), so the
    timeline below interleaves an unrelated spacer document after the
    idle period to give the engine a batch in which to time the groups
    out, then proves the evicted content restarts as its own keeper."""
    import json as _json
    import time as _time

    from genesapi_cli_spark.streaming.runtime import documents_file_stream
    from genesapi_cli_spark.streaming.stateful import dedup_stream

    src = tmp_path / "ttl_src"
    src.mkdir()
    # 15s TTL: the in-horizon assertions (docs 3 and 6) need their
    # micro-batch to land within the TTL of the keeper's batch; on a loaded
    # host consecutive 500ms-trigger batches were observed >5s apart, so a
    # 5s TTL evicted doc 1 before doc 3 arrived (the same wall-clock-margin
    # flake the r11 advice fixed in test_profile_stream_ttl_evicts_idle_users).
    ttl_ms = 15000

    def dump(name, rows):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "doc_id": d,
                        "text": t,
                        "lang": "en",
                        "source": "s",
                        "n_chars": len(t),
                    }
                )
                for d, t in rows
            )
        )

    stream = documents_file_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        dedup_stream(stream, ttl_ms=ttl_ms)
        .writeStream.format("memory")
        .queryName("t_ttl")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM t_ttl").collect()[0].c >= n:
                return
            _time.sleep(0.2)
        raise AssertionError(f"timed out waiting for {n} emitted rows")

    try:
        # batch 1: two fresh contents X (doc 1) and Y (doc 2).
        dump("f1.json", [(1, "xxxx"), (2, "yyyy")])
        wait_rows(2)
        # batch 2, inside the horizon: a duplicate of X must still resolve
        # to keeper 1 — TTL mode is exact within the retention window.
        dump("f2.json", [(3, "xxxx")])
        wait_rows(3)
        # idle past the TTL: the engine runs timed-out processing for X and
        # Y in a subsequent batch (the spacer Z guarantees one executes).
        _time.sleep(ttl_ms / 1000 + 3)
        dump("f3.json", [(4, "zzzz")])
        wait_rows(4)
        # duplicate of evicted Y -> fresh keeper (the recall caveat,
        # proving eviction actually removed the state); duplicate of Z,
        # still inside ITS horizon, -> keeper 4.
        dump("f4.json", [(5, "yyyy"), (6, "zzzz")])
        wait_rows(6)
        got = {
            r.doc_id: (r.keeper_doc, r.is_dup)
            for r in spark.sql("SELECT * FROM t_ttl").collect()
        }
    finally:
        q.stop()
    assert got == {
        1: (1, False),
        2: (2, False),
        3: (1, True),
        4: (4, False),
        5: (5, False),
        6: (4, True),
    }


def test_ingest_pipeline_composite_stream_equals_batch(spark, tmp_path):
    """END-TO-END continuous curation pipeline — "training shards ready the
    moment ingest lands": one streaming source cascades through the three
    ingest screens as SEPARATE queries connected by file sinks (Structured
    Streaming allows one stateful operator per query, so a production
    pipeline is exactly this lakehouse cascade):

        raw docs ──dedup_stream──▶ kept1 ──near_dedup_stream──▶ kept2
                  ──pack_stream──▶ bin assignments ──▶ shard manifest

    and the composed stream must equal the composed BATCH relations
    (min-doc-per-md5 keepers → LSH-OR band keepers over those → the
    exclusive-prefix-sum packing → the shard rollup) row for row. Each
    stage's foreachBatch forwards the KEPT documents (verdict joined back
    to the content store by doc_id) as one ordered NDJSON file per
    micro-batch, preserving the append-log contract the folds require."""
    import json as _json
    import os
    import time as _time

    import genesapi_cli_spark
    from genesapi_cli_spark.operators.dedup import portable_bands
    from genesapi_cli_spark.operators.extended import pack_assignments
    from genesapi_cli_spark.streaming.runtime import (
        DOC_STREAM_SCHEMA,
        documents_file_stream,
    )
    from genesapi_cli_spark.streaming.stateful import (
        dedup_stream,
        near_dedup_stream,
        pack_stream,
    )
    from pyspark.sql import Window

    genesapi_cli_spark.load_all()
    raw_rows = [
        r.asDict()
        for r in sorted(
            load(spark, SMOKE_SF_DIR, "documents").collect(),
            key=lambda r: r.doc_id,
        )
    ]
    # plant exact duplicates ACROSS chunk boundaries (the state-crossing
    # case), same as the single-screen tests — the smoke corpus has none.
    k = len(raw_rows) // 3 + 1
    for i in (k + 5, 2 * k + 5):
        raw_rows[i]["text"] = raw_rows[2]["text"]
    raw_rows[2 * k + 9]["text"] = raw_rows[7]["text"]
    docs = spark.createDataFrame(
        raw_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    # ---- batch ground truth: the composed relations -------------------------
    b1 = (
        docs.withColumn(
            "k", F.min("doc_id").over(Window.partitionBy(F.md5("text")))
        )
        .filter(F.col("doc_id") == F.col("k"))
        .drop("k")
    )
    band_keep = (
        portable_bands(b1)
        .withColumn(
            "bk",
            F.min("doc_id").over(Window.partitionBy("lang", "band", "k1", "k2")),
        )
        .groupBy("doc_id")
        .agg(F.max(F.expr("doc_id != bk")).alias("any_dup"))
        .filter(~F.col("any_dup"))
        .select("doc_id")
    )
    b2 = b1.join(band_keep, "doc_id")
    assert b1.count() < docs.count(), "smoke corpus should carry exact dups"
    assert b2.count() < b1.count(), "smoke corpus should carry near dups"
    b3 = {
        (r.source, r.doc_id): (r.n_tokens, r.bin_id)
        for r in pack_assignments(b2).collect()
    }
    manifest_rollup = lambda df: {  # noqa: E731 - tiny local rollup
        (r.source, r.shard_id): (r.n_docs, r.n_tokens)
        for r in df.groupBy(
            "source", F.expr("bin_id div 2").alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .collect()
    }
    b4 = manifest_rollup(
        spark.createDataFrame(
            [(s, d, t, b) for (s, d), (t, b) in b3.items()],
            "source string, doc_id long, n_tokens long, bin_id long",
        )
    )

    # ---- streaming cascade ---------------------------------------------------
    raw = tmp_path / "raw"
    kept1 = tmp_path / "kept1"
    kept2 = tmp_path / "kept2"
    for d in (raw, kept1, kept2):
        d.mkdir()

    now = _time.time()
    for i in range(3):
        name = raw / f"b{i}.json"
        name.write_text(
            "\n".join(_json.dumps(r) for r in raw_rows[i * k : (i + 1) * k])
        )
        os.utime(name, (now - 100 + i, now - 100 + i))

    def forward_kept(verdict_df, out_dir, epoch_id, content_dir):
        """Test-glue content-store lookup: join the screen's kept doc_ids
        back to the documents and append ONE ordered NDJSON file."""
        keep = (
            verdict_df.groupBy("doc_id")
            .agg(F.max("is_dup").alias("any_dup"))
            .filter(~F.col("any_dup"))
        )
        content = verdict_df.sparkSession.read.schema(DOC_STREAM_SCHEMA).json(
            str(content_dir)
        )
        out = sorted(
            content.join(keep, "doc_id").collect(), key=lambda r: r.doc_id
        )
        if not out:
            return
        (out_dir / f"b{epoch_id:05d}.json").write_text(
            "\n".join(
                _json.dumps(
                    {
                        "doc_id": r.doc_id,
                        "text": r.text,
                        "lang": r.lang,
                        "source": r.source,
                        "n_chars": r.n_chars,
                    }
                )
                for r in out
            )
        )

    q1 = (
        dedup_stream(documents_file_stream(spark, str(raw)))
        .writeStream.foreachBatch(
            lambda df, eid: forward_kept(df, kept1, eid, raw)
        )
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .outputMode("append")
        .trigger(processingTime="400 milliseconds")
        .start()
    )
    q2 = (
        near_dedup_stream(documents_file_stream(spark, str(kept1)))
        .writeStream.foreachBatch(
            lambda df, eid: forward_kept(df, kept2, eid, kept1)
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .outputMode("append")
        .trigger(processingTime="400 milliseconds")
        .start()
    )
    q3 = (
        pack_stream(documents_file_stream(spark, str(kept2)))
        .writeStream.format("memory")
        .queryName("t_pipeline_pack")
        .outputMode("append")
        .trigger(processingTime="400 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 180
        want_n = len(b3)
        while _time.time() < deadline:
            n = (
                spark.sql("SELECT count(*) c FROM t_pipeline_pack")
                .collect()[0]
                .c
            )
            if n >= want_n:
                break
            _time.sleep(0.5)
        packed = spark.sql("SELECT * FROM t_pipeline_pack").collect()
    finally:
        for q in (q1, q2, q3):
            q.stop()
    got = {(r.source, r.doc_id): (r.n_tokens, r.bin_id) for r in packed}
    assert got == b3
    got_manifest = manifest_rollup(
        spark.createDataFrame(
            [(r.source, r.doc_id, r.n_tokens, r.bin_id) for r in packed],
            "source string, doc_id long, n_tokens long, bin_id long",
        )
    )
    assert got_manifest == b4


def test_leaderboard_batch_equals_stream_foreachbatch(spark, tmp_path):
    """q_stream_leaderboard's streaming mount (the one §2 row whose stream
    claim was docstring-only through round 10): the windowed cent aggregate
    runs as an APPEND-mode streaming query under a 0-second watermark, and
    foreachBatch ranks each micro-batch of CLOSED windows on emit — rank is
    not incrementally maintainable inside one query, so production emits
    exactly this relation per close. Events arrive TIME-SPLIT across ≥3
    micro-batches (first half, second half, then two watermark-advancing
    flush events), so closed windows emit across at least two distinct
    micro-batches and the per-emit rank is genuinely exercised, not a
    single-batch degenerate case. The union of everything emitted must
    equal the batch leaderboard relation row for row."""
    from genesapi_cli_spark.streaming.windows import (
        leaderboard_cents,
        rank_leaderboard,
    )

    ev = load(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "ts_us", "user_id", "event_type", "value", "props"
    )
    lo_us, mid_us, hi_us = ev.selectExpr(
        "min(ts_us)", "cast(percentile(ts_us, 0.5) as long)", "max(ts_us)"
    ).collect()[0]
    src = tmp_path / "lb_src"
    src.mkdir()
    # Time-ordered split: batch 2's events are all >= batch 1's max, so the
    # watermark (advanced between micro-batches) never drops a late row and
    # batch ≡ stream holds exactly.
    ev.filter(F.col("ts_us") <= mid_us).coalesce(1).write.json(str(src / "b1"))
    ev.filter(F.col("ts_us") > mid_us).coalesce(1).write.json(str(src / "b2"))
    out = str(tmp_path / "lb_emitted")

    emit_batches: list[int] = []

    def emit(bdf, bid):
        ranked = rank_leaderboard(bdf)
        n = ranked.count()
        if n:
            emit_batches.append(bid)
            ranked.write.mode("append").parquet(out)

    stream = leaderboard_cents(
        with_watermark(events_file_stream(spark, str(src) + "/*/", 100), "0 seconds")
    )
    q = (
        stream.writeStream.foreachBatch(emit)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "lb_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # Two flush events far past the last real window: the first closes
        # every real window up to max(ts), the second closes the window
        # containing max(ts) itself. Flush windows never close (nothing
        # follows them), so they are never emitted.
        for i, off_h in enumerate((8, 16)):
            d = src / f"f{i}"
            d.mkdir()
            (d / "data.json").write_text(
                json.dumps(
                    {
                        "event_id": 90_000_000 + i,
                        "ts_us": int(hi_us) + off_h * 3_600_000_000,
                        "user_id": 1,
                        "event_type": "flush",
                        "value": 0.0,
                        "props": "{}",
                    }
                )
            )
            q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out).filter(F.col("event_type") != "flush")
    batch = rank_leaderboard(leaderboard_cents(load(spark, SMOKE_SF_DIR, "events")))
    assert _rows(got) == _rows(batch)
    # the emit-side rank ran on >= 2 distinct non-empty micro-batches
    assert len(set(emit_batches)) >= 2, emit_batches


def test_profile_stream_ttl_evicts_idle_users(spark, tmp_path):
    """user_running_profile(ttl_ms=...) — the bounded-state guard for the
    ONE stateful operator whose key universe (user_id) is genuinely
    unbounded: (a) arrivals inside the horizon keep folding into the
    persisted profile exactly; (b) a user idle past the TTL is EVICTED, so
    their next arrival restarts the running profile from zero (the
    documented accuracy caveat that proves the state actually left the
    store). Eviction is lazy, so a spacer user gives the engine a
    micro-batch in which to time the idle user out."""
    import json as _json
    import time as _time

    from genesapi_cli_spark.streaming.runtime import events_file_stream
    from genesapi_cli_spark.streaming.stateful import user_running_profile

    src = tmp_path / "prof_ttl_src"
    src.mkdir()
    # TTL wide enough that the in-horizon fold (f2) cannot land after the
    # window even on a loaded host: f2 is dumped the instant f1's rows
    # appear, so the fold-to-fold gap is bounded by a couple of 500 ms
    # trigger cycles plus poll latency — far under 10 s.
    ttl_ms = 10_000

    def dump(name, rows):
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": i,
                        "ts_us": 1_700_000_000_000_000 + i,
                        "user_id": u,
                        "event_type": "click",
                        "value": v,
                        "props": "{}",
                    }
                )
                for i, (u, v) in enumerate(rows, start=hash(name) % 1000 * 100)
            )
        )

    stream = events_file_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        user_running_profile(stream, ttl_ms=ttl_ms)
        .writeStream.format("memory")
        .queryName("t_prof_ttl")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def wait_rows(n, timeout_s=60):
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM t_prof_ttl").collect()[0].c >= n:
                return
            _time.sleep(0.2)
        raise AssertionError(f"timed out waiting for {n} emitted rows")

    try:
        # batch 1: user 1 gets two events, user 2 one.
        dump("f1.json", [(1, 1.0), (1, 2.0), (2, 10.0)])
        wait_rows(2)
        # batch 2, inside the horizon: user 1's profile keeps folding.
        dump("f2.json", [(1, 4.0)])
        wait_rows(3)
        # idle past the TTL, then a spacer user so a micro-batch runs and
        # the engine times users 1 and 2 out.
        _time.sleep(ttl_ms / 1000 + 2)
        dump("f3.json", [(99, 0.5)])
        wait_rows(4)
        # user 1 returns after eviction: the profile must restart from
        # zero (n=1, total=5.0), NOT continue at n=4/total=12.0.
        dump("f4.json", [(1, 5.0)])
        wait_rows(5)
        rows = spark.sql("SELECT * FROM t_prof_ttl").collect()
    finally:
        q.stop()
    # last emission per user (memory-sink order within a user follows
    # n_events, which is monotone per state lifetime; the restart makes
    # user 1's final n_events == 1, so key on the emitted tuples directly).
    emitted = {(r.user_id, r.n_events, r.total_value) for r in rows}
    assert (1, 2, 3.0) in emitted  # batch-1 fold of user 1
    assert (1, 3, 7.0) in emitted  # batch-2 fold inside the horizon
    assert (1, 1, 5.0) in emitted  # post-eviction restart from zero
    assert (1, 4, 12.0) not in emitted  # state did NOT survive the TTL
    assert (2, 1, 10.0) in emitted
    assert (99, 1, 0.5) in emitted
