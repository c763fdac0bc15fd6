"""Structured Streaming tests: incremental bronze->silver ingest (file
source, availableNow, checkpointed exactly-once), watermarked dedup and
windowed aggregation, and the applyInPandasWithState custom stateful ops."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest

from asterlake.operators.flatten import flatten_feed
from asterlake.sources.bronze import read_bronze, write_bronze_document
from asterlake.streaming.pipeline import (
    read_bronze_stream,
    running_user_counts,
    sessionize_stream,
    stream_bronze_to_silver,
    watermarked_dedup,
    windowed_event_counts,
)
from tests.fixtures_neows import N_ASTEROID_ROWS, feed_document

# streaming drains + checkpoint restarts (~1.2 min) — excluded from the -m "not slow" inner loop (r9 verdict ask #3)
pytestmark = pytest.mark.slow

BATCH_TIME = datetime(2025, 10, 12, 1, 30, 0)


def _drain(df, checkpoint, queryName, mode="append"):
    """Run a streaming DataFrame to a memory sink until drained."""
    (
        df.writeStream.format("memory")
        .queryName(queryName)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _write_events_jsonl(path: str, rows: list[tuple[int, str]]) -> None:
    with open(path, "w") as f:
        for uid, ts in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")


def _events_stream(spark, events_dir, max_files=None):
    reader = spark.readStream.schema("user_id long, ts timestamp")
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.json(events_dir)


def test_stream_ingest_matches_batch_and_is_exactly_once(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    write_bronze_document(bronze, "2025-10-10", feed_document())

    stream_bronze_to_silver(
        spark, bronze, silver, ckpt, batch_id=42, processing_time=BATCH_TIME
    )
    got = spark.read.parquet(silver)
    assert got.count() == N_ASTEROID_ROWS

    want = flatten_feed(
        read_bronze(spark, bronze), batch_id=42, processing_time=BATCH_TIME
    )
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    assert sorted(map(tuple, got.select(cols).collect()), key=repr) == sorted(
        map(tuple, want.select(cols).collect()), key=repr
    )

    # second drain with same checkpoint: no new files -> no new rows
    stream_bronze_to_silver(
        spark, bronze, silver, ckpt, batch_id=43, processing_time=BATCH_TIME
    )
    assert spark.read.parquet(silver).count() == N_ASTEROID_ROWS

    # a NEW bronze document is picked up incrementally
    write_bronze_document(bronze, "2025-10-11", feed_document())
    stream_bronze_to_silver(
        spark, bronze, silver, ckpt, batch_id=44, processing_time=BATCH_TIME
    )
    assert spark.read.parquet(silver).count() == 2 * N_ASTEROID_ROWS


def test_watermarked_dedup(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    _write_events_jsonl(
        os.path.join(events_dir, "a.json"),
        [
            (1, "2025-01-01 10:00:00"),
            (1, "2025-01-01 10:00:00"),  # exact dup -> dropped
            (1, "2025-01-01 10:05:00"),
            (2, "2025-01-01 10:00:00"),
        ],
    )
    stream = _events_stream(spark, events_dir)
    deduped = watermarked_dedup(stream, ["user_id"], event_col="ts", delay="1 hour")
    _drain(deduped, str(tmp_path / "ck1"), "dedup_sink")
    rows = spark.sql("SELECT user_id, ts FROM dedup_sink").collect()
    assert len(rows) == 3


def test_windowed_event_counts(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    _write_events_jsonl(
        os.path.join(events_dir, "a.json"),
        [
            (1, "2025-01-01 10:01:00"),
            (2, "2025-01-01 10:04:00"),
            (1, "2025-01-01 10:11:00"),
        ],
    )
    stream = _events_stream(spark, events_dir)
    counts = windowed_event_counts(stream, window="10 minutes", watermark="5 minutes")
    _drain(counts, str(tmp_path / "ck2"), "win_sink", mode="complete")
    got = {
        (r.window_start.minute, r.n_events)
        for r in spark.sql("SELECT * FROM win_sink").collect()
    }
    assert got == {(0, 2), (10, 1)}


def test_running_user_counts_state_survives_batches(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    # two files + maxFilesPerTrigger=1 => two micro-batches
    _write_events_jsonl(
        os.path.join(events_dir, "b1.json"),
        [(1, "2025-01-01 10:00:00"), (1, "2025-01-01 10:01:00"), (2, "2025-01-01 10:00:00")],
    )
    _write_events_jsonl(
        os.path.join(events_dir, "b2.json"),
        [(1, "2025-01-01 11:00:00")],
    )
    stream = _events_stream(spark, events_dir, max_files=1)
    counts = running_user_counts(stream)
    _drain(counts, str(tmp_path / "ck3"), "cnt_sink", mode="update")
    rows = spark.sql("SELECT * FROM cnt_sink").collect()
    # final cumulative count per user reflects state carried across batches
    final = {}
    for r in rows:
        final[r.user_id] = max(final.get(r.user_id, 0), r.n_events_total)
    assert final == {1: 3, 2: 1}


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    # batch 1: user 1 has two sessions separated by a >30min gap; the second
    # session stays open. batch 2: a much later event advances the watermark
    # past (last + gap) so the open session flushes via EventTimeTimeout.
    _write_events_jsonl(
        os.path.join(events_dir, "b1.json"),
        [
            (1, "2025-01-01 10:00:00"),
            (1, "2025-01-01 10:10:00"),
            (1, "2025-01-01 12:00:00"),
        ],
    )
    _write_events_jsonl(
        os.path.join(events_dir, "b2.json"),
        [(2, "2025-01-01 20:00:00")],
    )
    stream = _events_stream(spark, events_dir, max_files=1)
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="0 seconds")
    _drain(sessions, str(tmp_path / "ck4"), "sess_sink", mode="append")
    rows = spark.sql(
        "SELECT * FROM sess_sink ORDER BY user_id, session_start"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = by_user[1]
    assert [(s.n_events, s.closed_by) for s in u1] == [(2, "gap"), (1, "timeout")]
    assert u1[0].session_start.minute == 0 and u1[0].session_end.minute == 10


def _write_typed_events(path: str, rows: list[tuple[int, int, str, float]]) -> None:
    with open(path, "w") as f:
        for eid, uid, ts, val in rows:
            f.write(
                json.dumps(
                    {"event_id": eid, "user_id": uid, "ts": ts, "value": val}
                )
                + "\n"
            )


def test_stream_stream_interval_join_matches_batch_range_join(spark, tmp_path):
    """The watermarked stream-stream interval join must reproduce the batch
    bucketed_range_join(inner) pair set exactly when the stream drains —
    the same strongest-form check the windowed-counts stream gets."""
    from asterlake.operators.temporal import bucketed_range_join
    from asterlake.streaming.pipeline import stream_stream_interval_join

    err_dir, clk_dir = str(tmp_path / "err"), str(tmp_path / "clk")
    os.makedirs(err_dir)
    os.makedirs(clk_dir)
    errs = [
        (100, 1, "2025-01-01 10:05:00", 0.0),
        (101, 1, "2025-01-01 10:20:00", 0.0),
        (102, 2, "2025-01-01 10:05:00", 0.0),
    ]
    clks = [
        (200, 1, "2025-01-01 10:00:00", 1.0),  # exactly l.ts - W for err 100
        (201, 1, "2025-01-01 10:05:00", 2.0),  # simultaneous with err 100
        (202, 1, "2025-01-01 10:06:00", 3.0),  # after 100, within 101's window... no (>5min)
        (203, 2, "2025-01-01 09:59:59", 4.0),  # just outside err 102's window
        (204, 3, "2025-01-01 10:05:00", 5.0),  # wrong user
    ]
    _write_typed_events(os.path.join(err_dir, "e.json"), errs)
    _write_typed_events(os.path.join(clk_dir, "c.json"), clks)

    schema = "event_id long, user_id long, ts timestamp, value double"
    err_s = spark.readStream.schema(schema).json(err_dir)
    clk_s = spark.readStream.schema(schema).json(clk_dir)
    joined = stream_stream_interval_join(
        err_s.drop("value"), clk_s, key="user_id", window_seconds=300
    ).select("l_event_id", "r_event_id")
    _drain(joined, str(tmp_path / "ck_ssj"), "ssj_sink", mode="append")
    got = sorted(
        (r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM ssj_sink").collect()
    )

    err_b = spark.createDataFrame(
        [(e, u, datetime.fromisoformat(t)) for e, u, t, _ in errs],
        "event_id long, user_id long, ts timestamp",
    )
    clk_b = spark.createDataFrame(
        [(e, u, datetime.fromisoformat(t), v) for e, u, t, v in clks],
        "event_id long, user_id long, ts timestamp, value double",
    )
    want = sorted(
        (r.l_event_id, r.r_event_id)
        for r in bucketed_range_join(
            err_b, clk_b, by="user_id", window_seconds=300, how="inner"
        ).select("l_event_id", "r_event_id").collect()
    )
    assert got == want and len(got) > 0
    # spot semantics: window-edge inclusive both ends, wrong-user excluded
    assert (100, 200) in got and (100, 201) in got
    assert (102, 203) not in got
    assert all(r != 204 for _, r in got)


def test_stream_merge_dimension_upserts_and_is_idempotent(spark, tmp_path):
    """foreachBatch merge sink: keys merge across micro-batches with
    first-write-wins survivors, and a re-drain (same checkpoint, no new
    files) changes nothing."""
    from asterlake.streaming.pipeline import stream_merge_dimension

    src = str(tmp_path / "src")
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ck_merge")
    os.makedirs(src)
    _write_typed_events(
        os.path.join(src, "b1.json"),
        [(1, 10, "2025-01-01 10:00:00", 1.0), (2, 20, "2025-01-01 10:01:00", 2.0)],
    )
    _write_typed_events(
        os.path.join(src, "b2.json"),
        [(3, 10, "2025-01-01 11:00:00", 9.0), (4, 30, "2025-01-01 11:01:00", 3.0)],
    )
    schema = "event_id long, user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    stream_merge_dimension(stream, dim, "user_id", ckpt)

    rows = {r.user_id: r.value for r in spark.read.parquet(dim).collect()}
    # user 10 existed from batch 1 -> first write wins; 30 inserted
    assert rows == {10: 1.0, 20: 2.0, 30: 3.0}

    # re-drain with same checkpoint: no new input -> table unchanged
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    stream_merge_dimension(stream2, dim, "user_id", ckpt)
    rows2 = {r.user_id: r.value for r in spark.read.parquet(dim).collect()}
    assert rows2 == rows


def test_session_window_exact_gap_merges(spark):
    """Pins the built-in session_window boundary tie rule (round-3 advice):
    an event at EXACTLY last_ts + gap merges into the running session in
    Spark — so the q_session_window oracle's strict `> gap` new-session
    predicate is the correct twin (an exact-gap delta is NOT > gap)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00"),
            ("u", "2024-01-01 00:30:00"),  # exactly gap after the first
            ("u", "2024-01-01 01:00:01"),  # 1s past gap -> new session
        ],
        "user_id string, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    rows = sorted(
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("session_window.start").cast("string").alias("start"), "n"
        )
        .collect()
    )
    assert [(r.start, r.n) for r in rows] == [
        ("2024-01-01 00:00:00", 2),
        ("2024-01-01 01:00:01", 1),
    ]


def test_session_window_counts_merges_across_microbatches(spark, tmp_path):
    """Built-in streaming session windows: two micro-batches
    (maxFilesPerTrigger=1) whose events belong to ONE logical session must
    merge into a single session row — the SessionWindow state carries and
    extends the open session across batches."""
    from asterlake.streaming.pipeline import session_window_counts

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    _write_events_jsonl(
        os.path.join(events_dir, "b1.json"),
        [(1, "2025-01-01 10:00:00"), (1, "2025-01-01 10:10:00")],
    )
    _write_events_jsonl(
        os.path.join(events_dir, "b2.json"),
        [(1, "2025-01-01 10:25:00"), (1, "2025-01-01 12:00:00")],
    )
    stream = _events_stream(spark, events_dir, max_files=1)
    sessions = session_window_counts(
        stream, gap="30 minutes", group_cols=["user_id"]
    )
    _drain(sessions, str(tmp_path / "ck_sw"), "sw_sink", mode="complete")
    got = {
        (r.session_start.hour, r.session_start.minute, r.n_events)
        for r in spark.sql("SELECT * FROM sw_sink").collect()
    }
    # batch 1's open session absorbs batch 2's 10:25 event (gap < 30m from
    # 10:10); the 12:00 event starts a fresh session
    assert got == {(10, 0, 3), (12, 0, 1)}


def test_running_ewma_state_survives_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the accumulator stored in
    state must continue the recursion across the batch boundary, matching
    a single-shot replay of the full history."""
    from asterlake.streaming.pipeline import running_ewma

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)

    def _write(path, rows):
        with open(path, "w") as f:
            for uid, eid, ts, v in rows:
                f.write(
                    json.dumps(
                        {"user_id": uid, "event_id": eid, "ts": ts, "value": v}
                    )
                    + "\n"
                )

    _write(
        os.path.join(events_dir, "b1.json"),
        [
            (1, 1, "2025-01-01 10:00:00", 10.0),
            (1, 2, "2025-01-01 10:01:00", 20.0),
        ],
    )
    _write(
        os.path.join(events_dir, "b2.json"),
        [(1, 3, "2025-01-01 11:00:00", 0.0)],
    )
    reader = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp, value double"
    ).option("maxFilesPerTrigger", 1)
    stream = reader.json(events_dir)
    ew = running_ewma(stream, alpha=0.5)
    _drain(ew, str(tmp_path / "ck_ewma"), "ewma_sink", mode="update")
    rows = spark.sql("SELECT * FROM ewma_sink").collect()
    final = max(rows, key=lambda r: r.n_events)
    y1 = 10.0
    y2 = 0.5 * y1 + 0.5 * 20.0
    y3 = 0.5 * y2 + 0.5 * 0.0
    assert final.n_events == 3
    assert final.ewma == y3


def test_stream_quarantine_routes_and_keeps_violations(spark, tmp_path):
    from pyspark.sql import functions as F

    from asterlake.streaming.pipeline import stream_quarantine

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)

    def _write(path, rows):
        with open(path, "w") as f:
            for uid, v in rows:
                f.write(json.dumps({"user_id": uid, "value": v}) + "\n")

    _write(os.path.join(events_dir, "b1.json"), [(1, 5.0), (2, -1.0)])
    _write(os.path.join(events_dir, "b2.json"), [(3, 99.0), (4, None)])
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    good, bad = str(tmp_path / "good"), str(tmp_path / "bad")
    stream_quarantine(
        stream,
        {"value_pos": F.col("value") > 0, "value_under_50": F.col("value") < 50},
        good,
        bad,
        str(tmp_path / "ck_q"),
    )
    good_ids = {r.user_id for r in spark.read.parquet(good).collect()}
    bad_rows = {
        r.user_id: sorted(r._violations)
        for r in spark.read.parquet(bad).collect()
    }
    assert good_ids == {1}
    assert bad_rows == {
        2: ["value_pos"],
        3: ["value_under_50"],
        4: ["value_pos", "value_under_50"],
    }


def test_stream_drift_reports_per_batch_tvd(spark, tmp_path):
    from asterlake.streaming.pipeline import stream_drift

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)

    def _write(path, types):
        with open(path, "w") as f:
            for i, t in enumerate(types):
                f.write(json.dumps({"event_id": i, "event_type": t}) + "\n")

    # batch 1 matches the reference mix exactly; batch 2 is disjoint;
    # batch 3 is EMPTY (a trigger with no rows) and must be a silent
    # no-op, not an ANSI divide-by-zero stream crash (ADVICE r5)
    _write(os.path.join(events_dir, "b1.json"), ["a", "a", "a", "b"])
    _write(os.path.join(events_dir, "b2.json"), ["c", "c"])
    _write(os.path.join(events_dir, "b3.json"), [])
    ref = spark.createDataFrame(
        [("a",)] * 3 + [("b",)], "event_type string"
    )
    stream = (
        spark.readStream.schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    report = str(tmp_path / "drift")
    stream_drift(
        stream, ref, "event_type", report, str(tmp_path / "ck_d")
    )
    rows = spark.read.parquet(report).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, {})[r.event_type] = r
    # exactly two report batches: the empty trigger wrote nothing (file
    # pickup order is mtime-arbitrary, so identify batches by content)
    assert len(by_batch) == 2
    disjoint = next(b for b in by_batch.values() if "c" in b)
    matching = next(b for b in by_batch.values() if "c" not in b)
    # identical mix -> tvd 0 on every evidence row; disjoint -> tvd 1
    assert all(r.tvd == 0.0 for r in matching.values())
    assert all(r.tvd == 1.0 for r in disjoint.values())
    assert disjoint["c"].cur_n == 2 and disjoint["c"].ref_n == 0


def test_running_counts_tws_state_survives_batches(spark, tmp_path):
    """The transformWithStateInPandas twin of running_user_counts: the
    named ValueState continues the count across micro-batches, matching
    the legacy-API operator's contract. Skips where the runtime lacks
    the API's protobuf worker protocol (this container); the operator
    then raises a documented RuntimeError instead of crashing the
    stream mid-flight."""
    import pytest as _pytest

    from asterlake.streaming.pipeline import (
        has_transform_with_state,
        running_counts_tws,
    )

    if not has_transform_with_state():
        with _pytest.raises(RuntimeError, match="google.protobuf"):
            running_counts_tws(_events_stream(spark, str(tmp_path)))
        _pytest.skip("runtime lacks google.protobuf for transformWithState")

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    _write_events_jsonl(
        os.path.join(events_dir, "b1.json"),
        [
            (1, "2025-01-01 10:00:00"),
            (1, "2025-01-01 10:01:00"),
            (2, "2025-01-01 10:00:00"),
        ],
    )
    _write_events_jsonl(
        os.path.join(events_dir, "b2.json"),
        [(1, "2025-01-01 11:00:00")],
    )
    stream = _events_stream(spark, events_dir, max_files=1)
    counts = running_counts_tws(stream, state_ttl_ms=None)
    _drain(counts, str(tmp_path / "ck_tws"), "tws_sink", mode="update")
    final: dict = {}
    for r in spark.sql("SELECT * FROM tws_sink").collect():
        final[r.user_id] = max(final.get(r.user_id, 0), r.n_events)
    assert final == {1: 3, 2: 1}


def test_bloom_probe_composes_into_streaming(spark, tmp_path):
    """The Bloom semi-join reduction (operators/bloomjoin.py) is a pure
    projection + 1-row broadcast, so it applies UNCHANGED to a streaming
    DataFrame — the stream-static join's fact side can be pruned before
    the join in each micro-batch. Pin: bloom-probed stream-static join
    drains to the identical result set as the unpruned join, across
    multiple micro-batches, including a saturated tiny bitmap (false
    positives removed by the exact join)."""
    from pyspark.sql import functions as F

    from asterlake.operators.bloomjoin import bloom_bitmap, bloom_probe

    src = str(tmp_path / "ev")
    os.makedirs(src)
    rows = [(i % 7, f"2025-10-12T01:3{i % 10}:00Z") for i in range(40)]
    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    _write_events_jsonl(os.path.join(src, "a.jsonl"), rows[:20])
    _write_events_jsonl(os.path.join(src, "b.jsonl"), rows[20:])

    allow = spark.createDataFrame([(1,), (3,), (5,)], "user_id bigint")
    for n_bits, name in [(1 << 16, "bloomed_big"), (64, "bloomed_tiny")]:
        bitmap = bloom_bitmap(allow, "user_id", n_bits=n_bits, n_hashes=3)
        stream = _events_stream(spark, src, max_files=1)
        pruned = bloom_probe(
            stream, F.col("user_id"), bitmap, n_bits=n_bits, n_hashes=3
        ).join(allow, "user_id")  # exact join removes any false positives
        _drain(pruned, str(tmp_path / f"ck_{name}"), name)
        got = sorted(
            (r.user_id, str(r.ts))
            for r in spark.table(name).collect()
        )
        want = sorted(
            (uid, str(ts))
            for uid, ts in [
                (r.user_id, r.ts)
                for r in spark.read.schema("user_id long, ts timestamp")
                .json(src)
                .join(allow, "user_id")
                .collect()
            ]
        )
        assert got == want, name


def test_sketch_state_advances_per_micro_batch(spark, tmp_path):
    """Mergeable distinct-count maintenance (operators/sketches.py)
    composes into Structured Streaming: a foreachBatch sink folds each
    micro-batch into the persisted sketch state with
    advance_sketch_state — the fact is sketched exactly once per batch,
    the state table is all later batches ever read. Pin: after the
    stream drains, the final state's rollup estimates equal both the
    one-shot batch rebuild AND (coupon-regime cardinalities) the true
    distinct user counts per group."""
    from pyspark.sql import functions as F

    from asterlake.operators.sketches import (
        advance_sketch_state,
        distinct_sketches,
        rollup_sketches,
        sketch_estimates,
    )

    src = str(tmp_path / "ev")
    os.makedirs(src)
    rows = [(i * 13 % 61, f"2025-10-12T01:3{i % 10}:00Z") for i in range(50)]
    _write_events_jsonl(os.path.join(src, "a.jsonl"), rows[:25])
    _write_events_jsonl(os.path.join(src, "b.jsonl"), rows[25:])

    state_dir = str(tmp_path / "sketch_state")
    latest: list[str] = []

    def fold(batch_df, batch_id):
        with_g = batch_df.withColumn("g", F.pmod("user_id", F.lit(3)))
        out = f"{state_dir}/v{batch_id}"
        if latest:
            prior = batch_df.sparkSession.read.parquet(latest[-1])
            new_state = advance_sketch_state(
                prior, with_g, ["g"], "user_id"
            )
        else:
            new_state = distinct_sketches(with_g, ["g"], "user_id")
        new_state.write.parquet(out)
        latest.append(out)

    stream = _events_stream(spark, src, max_files=1)
    (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck_sketch"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert len(latest) >= 2  # really advanced across micro-batches

    final = spark.read.parquet(latest[-1])
    got = {
        r.g: r.est
        for r in sketch_estimates(
            rollup_sketches(final, ["g"]), out="est"
        ).collect()
    }
    full = (
        spark.read.schema("user_id long, ts timestamp")
        .json(src)
        .withColumn("g", F.pmod("user_id", F.lit(3)))
    )
    rebuild = {
        r.g: r.est
        for r in sketch_estimates(
            rollup_sketches(distinct_sketches(full, ["g"], "user_id"), ["g"]),
            out="est",
        ).collect()
    }
    exact = {
        r.g: r.x
        for r in full.groupBy("g")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    assert got == rebuild == exact


def test_streaming_frequent_candidates_bounded_and_lossless(spark, tmp_path):
    """Streaming Misra-Gries (streaming/pipeline.py): summaries carried
    across micro-batches as per-SHARD state. Pins the three contracts:
    (1) every token holding >= 1/denom of the whole stream is in the
    final candidate set (no false negatives across batch boundaries),
    (2) state/output stay bounded by capacity per shard, and (3) the
    exact recount of the candidates equals the batch frequent_items on
    the full data. With n_shards=1 the final summary also replays the
    batch algorithm on the concatenated files in arrival order."""
    import json

    from asterlake.operators.frequency import _trim, frequent_items
    from asterlake.streaming.pipeline import streaming_frequent_candidates

    src = str(tmp_path / "toks")
    os.makedirs(src)
    # heavy hitters "hot"/"warm" spread across BOTH files; a long tail of
    # one-off tokens pressures the summaries
    file_a = ["hot"] * 12 + ["warm"] * 6 + [f"a{i}" for i in range(22)]
    file_b = ["hot"] * 8 + ["warm"] * 6 + [f"b{i}" for i in range(26)]
    for name, toks in [("a.jsonl", file_a), ("b.jsonl", file_b)]:
        with open(os.path.join(src, name), "w") as f:
            for t in toks:
                f.write(json.dumps({"token": t}) + "\n")

    denom, capacity, n_shards = 5, 6, 4
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    cands = streaming_frequent_candidates(
        stream, denom=denom, capacity=capacity, n_shards=n_shards
    )
    _drain(cands, str(tmp_path / "ck_mg"), "mg_sink", mode="update")
    emitted = spark.table("mg_sink").collect()
    assert len({r.shard for r in emitted}) >= 2  # sharding actually split

    # latest summary per shard = rows at that shard's max n_shard_total
    latest_n: dict = {}
    for r in emitted:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.n_shard_total)
    final = {}
    for r in emitted:
        if r.n_shard_total == latest_n[r.shard]:
            final.setdefault(r.shard, set()).add(r.token)
    for shard, toks in final.items():
        assert len(toks) <= capacity, (shard, toks)
    candidates = set().union(*final.values())

    all_toks = file_a + file_b
    n_total = len(all_toks)
    from collections import Counter

    true_frequent = {
        t for t, c in Counter(all_toks).items() if c * denom >= n_total
    }
    assert true_frequent  # the fixture really exercises the bound
    assert true_frequent <= candidates  # (1) no false negatives

    # (3) exact recount of the streaming candidates == batch operator
    full = spark.createDataFrame([(t,) for t in all_toks], "token string")
    want = {
        (r.token, r.cnt)
        for r in frequent_items(full, "token", denom=denom).collect()
    }
    recount = Counter(t for t in all_toks if t in candidates)
    got = {
        (t, c) for t, c in recount.items() if c * denom >= n_total
    }
    assert got == want

    # replay equality with one shard: state IS the batch MG summary
    # (each file is <10k rows = one Arrow chunk, so the per-chunk trim
    # sequence is exactly the per-file sequence this replay models)
    stream1 = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    c1 = streaming_frequent_candidates(
        stream1, denom=denom, capacity=capacity, n_shards=1
    )
    _drain(c1, str(tmp_path / "ck_mg1"), "mg1_sink", mode="update")
    rows1 = spark.table("mg1_sink").collect()
    last = max(r.n_shard_total for r in rows1)
    final1 = {r.token for r in rows1 if r.n_shard_total == last}
    summary: dict = {}
    for chunk in (file_a, file_b):
        for t, c in Counter(chunk).items():
            summary[t] = summary.get(t, 0) + c
        summary = _trim(summary, capacity)
    assert final1 == set(summary)


def test_streaming_frequent_candidates_preserve_token_type(spark, tmp_path):
    """The token column keeps its source type (here bigint) end-to-end,
    so the documented exact-recount recipe — semi-join candidates back
    against the original column — works without casts. A string-typed
    candidate set would match nothing here."""
    import json

    from collections import Counter

    from asterlake.streaming.pipeline import streaming_frequent_candidates

    src = str(tmp_path / "itoks")
    os.makedirs(src)
    vals_a = [7] * 10 + list(range(100, 112))
    vals_b = [7] * 6 + list(range(200, 210))
    for name, vals in [("a.jsonl", vals_a), ("b.jsonl", vals_b)]:
        with open(os.path.join(src, name), "w") as f:
            for v in vals:
                f.write(json.dumps({"token": v}) + "\n")
    stream = (
        spark.readStream.schema("token bigint")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    cands = streaming_frequent_candidates(
        stream, denom=4, capacity=8, n_shards=2
    )
    assert dict(cands.dtypes)["token"] == "bigint"
    _drain(cands, str(tmp_path / "ck_img"), "mg_int_sink", mode="update")
    emitted = spark.table("mg_int_sink").collect()
    latest_n: dict = {}
    for r in emitted:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.n_shard_total)
    candidates = {
        r.token
        for r in emitted
        if r.n_shard_total == latest_n[r.shard]
    }
    assert all(isinstance(t, int) for t in candidates)
    # exact recount against the original ints: the one true heavy
    # hitter (7 holds 16/38 >= 1/4) survives
    all_vals = vals_a + vals_b
    n_total = len(all_vals)
    got = {
        t
        for t, c in Counter(v for v in all_vals if v in candidates).items()
        if c * 4 >= n_total
    }
    assert got == {7}


def test_streaming_frequent_candidates_survive_nulls_and_big_ints(
    spark, tmp_path
):
    """A NULL token in an Arrow chunk used to coerce the bigint column
    to float64 in pandas, silently rounding tokens >= 2^53 (where
    xxhash64 surrogate keys live) and dropping the true heavy hitter
    from the candidate set. NULLs are now filtered before the stateful
    operator; the exact 2^53+1 value must come back intact."""
    import json

    from asterlake.streaming.pipeline import streaming_frequent_candidates

    big = (1 << 53) + 1
    src = str(tmp_path / "btoks")
    os.makedirs(src)
    vals_a = [big] * 8 + [None] * 3 + [5, 6, 7]
    vals_b = [big] * 4 + [None] * 2 + [8, 9]
    for name, vals in [("a.jsonl", vals_a), ("b.jsonl", vals_b)]:
        with open(os.path.join(src, name), "w") as f:
            for v in vals:
                f.write(json.dumps({"token": v}) + "\n")
    stream = (
        spark.readStream.schema("token bigint")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    cands = streaming_frequent_candidates(
        stream, denom=3, capacity=6, n_shards=2
    )
    _drain(cands, str(tmp_path / "ck_big"), "mg_big_sink", mode="update")
    emitted = spark.table("mg_big_sink").collect()
    latest_n: dict = {}
    for r in emitted:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.n_shard_total)
    candidates = {
        r.token for r in emitted if r.n_shard_total == latest_n[r.shard]
    }
    assert big in candidates  # exact value, not 2^53
    assert None not in candidates
    # NULLs count toward neither candidates nor shard totals
    assert sum(latest_n.values()) == sum(
        1 for v in vals_a + vals_b if v is not None
    )


def test_streaming_frequent_candidates_state_survives_restart(
    spark, tmp_path
):
    """The per-shard summaries live in the checkpoint: a SECOND drain
    with the same checkpoint over newly-arrived files continues from
    the stored state (not from zero), so the candidate set after the
    restart reflects the whole history — the daily-maintenance restart
    pattern every stateful operator must support."""
    import json

    from asterlake.streaming.pipeline import streaming_frequent_candidates

    src = str(tmp_path / "rtoks")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        for t in ["hot"] * 9 + [f"a{i}" for i in range(11)]:
            f.write(json.dumps({"token": t}) + "\n")
    ck = str(tmp_path / "ck_restart")
    out = str(tmp_path / "mg_out")

    def drain():
        # memory sinks refuse checkpoint recovery; foreachBatch is the
        # fault-tolerant sink shape for update-mode stateful queries
        stream = (
            spark.readStream.schema("token string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        # capacity exceeds the fixture's distinct-per-shard count, so
        # no trim ever empties a summary mid-test (a trim that drops
        # every count-1 key makes that shard emit zero rows — correct
        # MG behavior, but it would hide the n_shard_total we assert on)
        cands = streaming_frequent_candidates(
            stream, denom=4, capacity=24, n_shards=2
        )
        (
            cands.writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    drain()
    rows1 = spark.read.parquet(out).collect()
    n_after_first = max(r.n_shard_total for r in rows1)
    assert n_after_first <= 20

    # new file lands AFTER the first query stopped; restart from the
    # same checkpoint processes ONLY the new file but keeps the state
    with open(os.path.join(src, "b.jsonl"), "w") as f:
        for t in ["hot"] * 6 + [f"b{i}" for i in range(9)]:
            f.write(json.dumps({"token": t}) + "\n")
    drain()
    rows2 = spark.read.parquet(out).collect()
    assert len(rows2) > len(rows1), "restart emitted nothing"
    latest_n: dict = {}
    for r in rows2:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.n_shard_total)
    # cumulative counts span BOTH files (35 rows total): the state was
    # resumed, not rebuilt from the new file alone
    assert sum(latest_n.values()) == 35
    final = {
        r.token for r in rows2 if r.n_shard_total == latest_n[r.shard]
    }
    # 'hot' holds 15/35 >= 1/4 across the restart boundary
    assert "hot" in final


def test_bloom_state_advances_per_micro_batch(spark, tmp_path):
    """Incremental Bloom allowlist maintenance composes into Structured
    Streaming (r8): a foreachBatch sink ORs each micro-batch's NEW-key
    bitmap into the persisted state with bloom_merge — the identical-
    bitmap property (positions are pure key functions) means the final
    folded state is BIT-IDENTICAL to a one-shot bitmap of all keys, so
    a probe through the folded state equals a probe through the
    rebuild, row for row."""
    from pyspark.sql import functions as F

    from asterlake.operators.bloomjoin import (
        bloom_bitmap,
        bloom_merge,
        bloom_probe,
    )

    n_bits, n_hashes = 1 << 12, 4
    src = str(tmp_path / "ev")
    os.makedirs(src)
    rows = [(i * 7 % 97, f"2025-10-12T02:1{i % 10}:00Z") for i in range(40)]
    _write_events_jsonl(os.path.join(src, "a.jsonl"), rows[:20])
    _write_events_jsonl(os.path.join(src, "b.jsonl"), rows[20:])

    state_dir = str(tmp_path / "bloom_state")
    latest: list[str] = []

    def fold(batch_df, batch_id):
        new_bits = bloom_bitmap(
            batch_df, "user_id", n_bits=n_bits, n_hashes=n_hashes
        )
        out = f"{state_dir}/v{batch_id}"
        if latest:
            prior = batch_df.sparkSession.read.parquet(latest[-1])
            bloom_merge(prior, new_bits).write.parquet(out)
        else:
            new_bits.write.parquet(out)
        latest.append(out)

    (
        _events_stream(spark, src, max_files=1)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck_bloom"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert len(latest) >= 2  # really folded across micro-batches

    folded = spark.read.parquet(latest[-1])
    all_keys = spark.createDataFrame(
        [(uid,) for uid, _ in rows], ["user_id"]
    )
    rebuilt = bloom_bitmap(
        all_keys, "user_id", n_bits=n_bits, n_hashes=n_hashes
    )
    assert folded.collect()[0]._bloom == rebuilt.collect()[0]._bloom

    # probe equality through both states on a fact with members + strangers
    fact = spark.range(0, 200).select(F.col("id").alias("user_id"))
    via_folded = sorted(
        r.user_id
        for r in bloom_probe(
            fact, "user_id", folded, n_bits=n_bits, n_hashes=n_hashes
        ).collect()
    )
    via_rebuilt = sorted(
        r.user_id
        for r in bloom_probe(
            fact, "user_id", rebuilt, n_bits=n_bits, n_hashes=n_hashes
        ).collect()
    )
    assert via_folded == via_rebuilt
    assert set(uid for uid, _ in rows) <= set(via_folded)  # no false negatives


def test_cms_state_advances_per_micro_batch(spark, tmp_path):
    """Incremental count-min maintenance composes into Structured
    Streaming the same way the Bloom allowlist does (r8): a
    foreachBatch sink folds each micro-batch's sketch into the
    persisted state with cms_advance — counters ADD exactly, so the
    folded state is BIT-IDENTICAL (slot for slot) to a one-shot build
    over all rows, and point estimates through the folded state equal
    estimates through the rebuild for every key."""
    from pyspark.sql import functions as F

    from asterlake.operators.cms import cms_advance, cms_build, cms_estimate

    depth, width = 4, 128
    src = str(tmp_path / "ev_cms")
    os.makedirs(src)
    rows = [(i * 3 % 17, f"2025-10-12T03:1{i % 10}:00Z") for i in range(48)]
    _write_events_jsonl(os.path.join(src, "a.jsonl"), rows[:24])
    _write_events_jsonl(os.path.join(src, "b.jsonl"), rows[24:])

    state_dir = str(tmp_path / "cms_state")
    latest: list[str] = []

    def fold(batch_df, batch_id):
        out = f"{state_dir}/v{batch_id}"
        if latest:
            prior = batch_df.sparkSession.read.parquet(latest[-1])
            cms_advance(
                prior, batch_df, [], "user_id", depth, width
            ).write.parquet(out)
        else:
            cms_build(
                batch_df, [], "user_id", depth, width
            ).write.parquet(out)
        latest.append(out)

    (
        _events_stream(spark, src, max_files=1)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck_cms"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert len(latest) >= 2  # really folded across micro-batches

    folded = spark.read.parquet(latest[-1])
    all_keys = spark.createDataFrame(
        [(uid,) for uid, _ in rows], ["user_id"]
    )
    rebuilt = cms_build(all_keys, [], "user_id", depth, width)
    assert sorted((r.slot, r.cnt) for r in folded.collect()) == sorted(
        (r.slot, r.cnt) for r in rebuilt.collect()
    )

    probes = all_keys.distinct()
    via_folded = {
        r.user_id: r.estimate
        for r in cms_estimate(
            folded, probes, "user_id", None, depth, width
        ).collect()
    }
    via_rebuilt = {
        r.user_id: r.estimate
        for r in cms_estimate(
            rebuilt, probes, "user_id", None, depth, width
        ).collect()
    }
    assert via_folded == via_rebuilt
    exact = {
        r.user_id: r.cnt
        for r in all_keys.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert all(via_folded[k] >= exact[k] for k in exact)


def test_tokenizers_and_quality_gate_compose_into_streaming(spark, tmp_path):
    """The r9 tokenizer apply operators and the logistic gate are pure
    row-local projections (Arrow UDF / literal folds), so they apply
    UNCHANGED to a streaming DataFrame — the shape a corpus-ingest
    micro-batch pipeline runs: segment each arriving document, gate it
    on engineered quality features. Pin: draining the streamed pipeline
    over multiple micro-batches equals the batch run row-for-row."""
    import json as _json

    from pyspark.sql import functions as F

    from asterlake.operators.bpe import bpe_segment
    from asterlake.operators.classifier import feature_vector, logit_margin
    from asterlake.operators.textstats import quality_features
    from asterlake.operators.unigram import unigram_segment

    src = str(tmp_path / "docs")
    os.makedirs(src)
    texts = [
        "the small table joins a fast key",
        "slow scan slow scan slow scan",
        "value part hash merge window sort",
        "a a a the the line",
    ]
    for fi in range(2):  # two files -> two micro-batches
        with open(os.path.join(src, f"{fi}.jsonl"), "w") as f:
            for i, t in enumerate(texts):
                f.write(_json.dumps({"doc_id": fi * 10 + i, "text": t}) + "\n")

    merges = [("th", "e"), ("t", "h"), ("a", "</w>")]
    model = {"the": -1.5, "s": -2.0, "a": -1.0, "lo": -2.5, "w": -3.0}
    weights = [-0.5, 1.0, -2.0, 0.05, -1.0, 1.0]
    fcols = [
        "distinct_ratio", "stopword_ratio", "mean_token_len",
        "punct_ratio", "quality_score",
    ]

    def pipe(df):
        seg1 = bpe_segment(df, merges, text_col="text", out_col="bpe")
        seg2 = unigram_segment(
            seg1, model, max_piece_len=3, text_col="text", out_col="uni"
        )
        feats = feature_vector(
            quality_features(seg2.select("doc_id", "text")), fcols
        )
        scored = logit_margin(feats, weights, vec_col="features")
        return (
            seg2.select("doc_id", "bpe", "uni")
            .join(scored.select("doc_id", "logit"), "doc_id")
            .select(
                "doc_id",
                F.array_join("bpe", "|").alias("bpe"),
                F.array_join("uni", "|").alias("uni"),
                (F.col("logit") >= 0.0).alias("kept"),
            )
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    _drain(pipe(stream), str(tmp_path / "ck_tok"), "tok_stream")
    got = sorted(tuple(r) for r in spark.table("tok_stream").collect())
    batch = spark.read.schema("doc_id long, text string").json(src)
    want = sorted(tuple(r) for r in pipe(batch).collect())
    assert got == want
    assert len(got) == 8


def test_bigram_gate_and_mixture_compose_into_streaming(spark, tmp_path):
    """The r9 bigram-LM scorer is a literal-map fold (pure row-local
    projection) and apply_mixture is a stream-static broadcast join +
    deterministic explode — both apply UNCHANGED to a streaming
    DataFrame: the corpus-ingest shape where each arriving document is
    perplexity-gated against the pinned LM and replicated per the
    mixture plan. Pin: draining the streamed pipeline over multiple
    micro-batches equals the batch run row-for-row (the gate and the
    copy set are exact-integer deterministic, so equality is exact)."""
    import json as _json

    from pyspark.sql import functions as F

    from asterlake.operators.mixture import apply_mixture
    from asterlake.operators.ngramlm import bigram_score

    src = str(tmp_path / "bgdocs")
    os.makedirs(src)
    texts = [
        ("a", "the small table joins a fast key"),
        ("a", "slow scan slow scan slow scan"),
        ("b", "value part hash merge window sort"),
        ("b", "a a a the the line"),
    ]
    for fi in range(2):  # two files -> two micro-batches
        with open(os.path.join(src, f"{fi}.jsonl"), "w") as f:
            for i, (dom, t) in enumerate(texts):
                f.write(
                    _json.dumps(
                        {"doc_id": fi * 10 + i, "source": dom, "text": t}
                    )
                    + "\n"
                )

    vocab = ["the", "a", "slow", "scan", "table"]
    model = {
        "<s> the": -1_200_000, "<s> slow": -1_500_000,
        "the table": -900_000, "slow scan": -400_000,
        "scan slow": -700_000, "a a": -1_100_000,
        "the <unk>": -1_800_000, "<unk> <unk>": -2_000_000,
    }
    unk = -2_900_000
    factors = spark.createDataFrame(
        [("a", 2_500_000), ("b", 500_000)], "domain string, factor_ppm bigint"
    )

    def pipe(df):
        scored = bigram_score(df, vocab, model, unk)
        gated = df.join(scored, "doc_id").where(
            F.col("loglik_micros")
            >= F.lit(-2_000_000).cast("bigint") * F.col("n_pairs")
        )
        return apply_mixture(gated, factors).select(
            "doc_id", "source", "copy_id", "n_pairs", "loglik_micros"
        )

    schema = "doc_id long, source string, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    _drain(pipe(stream), str(tmp_path / "ck_bg"), "bg_stream")
    got = sorted(tuple(r) for r in spark.table("bg_stream").collect())
    batch = spark.read.schema(schema).json(src)
    want = sorted(tuple(r) for r in pipe(batch).collect())
    assert got == want
    assert len(got) > 0
    # both domains' factors actually bit: domain a replicates, domain b thins
    by_src = {}
    for _, srcv, *_ in got:
        by_src[srcv] = by_src.get(srcv, 0) + 1
    assert by_src.get("a", 0) > by_src.get("b", 0)


def test_stream_domain_caps_admits_first_cap_per_domain(spark, tmp_path):
    """Stateful streaming admission cap: across micro-batches each
    domain admits exactly its first `cap` arrivals (batch order, then
    ascending doc_id within a batch — deterministic given the file
    sequence), the counter state survives between batches AND across a
    checkpoint restart, and admit_seq is dense per domain."""
    import json as _json

    from asterlake.streaming.pipeline import stream_domain_caps

    src = str(tmp_path / "capdocs")
    os.makedirs(src)
    batches = [
        [(4, "a"), (1, "a"), (10, "b")],
        [(2, "a"), (11, "b"), (12, "b")],
    ]
    for fi, rows in enumerate(batches):
        path = os.path.join(src, f"{fi:02d}.jsonl")
        with open(path, "w") as f:
            for doc_id, dom in rows:
                f.write(_json.dumps({"doc_id": doc_id, "source": dom}) + "\n")
        # FileStreamSource orders batches by modification time — pin it,
        # or same-ms writes arrive in arbitrary order
        os.utime(path, (1_700_000_000 + fi, 1_700_000_000 + fi))

    def ref_admitted(batch_seq):
        n: dict[str, int] = {}
        out = []
        for rows in batch_seq:
            by_dom: dict[str, list[int]] = {}
            for doc_id, dom in rows:
                by_dom.setdefault(dom, []).append(doc_id)
            for dom, ids in by_dom.items():
                for i in sorted(ids)[: max(0, 3 - n.get(dom, 0))]:
                    out.append((dom, i, n.get(dom, 0)))
                    n[dom] = n.get(dom, 0) + 1
        return sorted(out)

    schema = "doc_id long, source string"
    ck = str(tmp_path / "ck_cap")
    out = str(tmp_path / "cap_out")

    def drain():
        # memory sinks refuse checkpoint recovery; foreachBatch is the
        # fault-tolerant sink shape for update-mode stateful queries
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        (
            stream_domain_caps(stream, cap=3)
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    drain()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == ref_admitted(batches)
    # domain a admitted 3 of its 4 arrivals; b admitted all 3
    assert sum(1 for d, *_ in got if d == "a") == 3

    # restart from the same checkpoint with one more file: the counters
    # resume (a and b are full at 3, so only the new domain c admits)
    p3 = os.path.join(src, "02.jsonl")
    with open(p3, "w") as f:
        for doc_id, dom in [(3, "a"), (13, "b"), (20, "c")]:
            f.write(_json.dumps({"doc_id": doc_id, "source": dom}) + "\n")
    os.utime(p3, (1_700_000_002, 1_700_000_002))
    drain()
    got2 = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got2 == sorted(got + [("c", 20, 0)])


def test_stream_domain_caps_honors_custom_column_names(spark, tmp_path):
    """ADVICE r9: the output schema is built FROM domain_col/id_col —
    non-default names come back under their own names, not hard-coded
    'source'/'doc_id'."""
    import json as _json

    from asterlake.streaming.pipeline import stream_domain_caps

    src = str(tmp_path / "namedocs")
    os.makedirs(src)
    with open(os.path.join(src, "00.jsonl"), "w") as f:
        for i, host in [(3, "x"), (1, "x"), (2, "x"), (9, "y")]:
            f.write(_json.dumps({"id": i, "host": host}) + "\n")

    got: list = []
    stream = spark.readStream.schema("id long, host string").json(src)
    q = (
        stream_domain_caps(stream, domain_col="host", id_col="id", cap=2)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _eid: got.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got and list(got[0].asDict()) == ["host", "id", "admit_seq"]
    assert sorted((r["host"], r["id"], r["admit_seq"]) for r in got) == [
        ("x", 1, 0), ("x", 2, 1), ("y", 9, 0)
    ]


# ---------------------------------------------------------------------------
# End-to-end streaming curation chain (r10): gate -> caps -> mixture -> pack
# ---------------------------------------------------------------------------

# pinned gate model: all-'a' documents score -100 micro-nats/pair, any
# OOV pair falls to the -1e6 floor -> gate at -500000 separates exactly
_CUR_VOCAB = ["a"]
_CUR_MODEL = {"<s> a": -100, "a a": -100}
_CUR_UNK = -1_000_000
_CUR_GATE = -500_000
_CUR_FACTORS = {"big": 2_500_000, "off": 0}  # x2.5, dropped, default x1
_CUR_CAP = 2
_CUR_BUDGET = 5
_CUR_BUCKETS = 2


def _cur_bucket(i: int, n: int) -> int:
    import hashlib

    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n


def _cur_replay(batches, prior_admits=None, prior_totals=None):
    """Pure-Python replay of the chain given the micro-batch sequence:
    gate (pinned model fold), per-domain arrival-order caps, pinned
    mixture expansion, per-bucket arrival-order packing. Returns
    (packed rows set, cap counters, bucket token totals) so a restart
    continues from the returned state."""
    n_admitted = dict(prior_admits or {})
    totals = dict(prior_totals or {})
    packed = []
    for rows in batches:
        # stage 1: gate + caps (ties by id inside a batch)
        admitted = []
        by_dom: dict[str, list[tuple[int, int]]] = {}
        for doc_id, dom, text in rows:
            toks = (text or "").split()
            stream = ["<s>"] + toks
            ll = sum(
                _CUR_MODEL.get(f"{x} {y}", _CUR_UNK)
                for x, y in zip(stream, stream[1:])
            )
            if ll >= _CUR_GATE * len(toks):
                by_dom.setdefault(dom, []).append((doc_id, len(toks)))
        for dom, ids in by_dom.items():
            room = max(0, _CUR_CAP - n_admitted.get(dom, 0))
            take = sorted(ids)[:room]
            n_admitted[dom] = n_admitted.get(dom, 0) + len(take)
            admitted.extend((dom, i, t) for i, t in take)
        # stage 2 (single drain batch per run): mixture + pack
        expanded = []
        for dom, i, t in admitted:
            f = _CUR_FACTORS.get(dom, 1_000_000)
            n_copies = f // 1_000_000 + (
                1 if (i * 48271) % 1_000_000 < f % 1_000_000 else 0
            )
            expanded.extend((i, c, t) for c in range(n_copies))
        by_bucket: dict[int, list[tuple[int, int, int]]] = {}
        for i, c, t in expanded:
            by_bucket.setdefault(_cur_bucket(i, _CUR_BUCKETS), []).append(
                (i, c, t)
            )
        for b, rs in by_bucket.items():
            cur = totals.get(b, 0)
            for i, c, t in sorted(rs):
                packed.append(
                    (
                        b, i, c, t, cur,
                        cur // _CUR_BUDGET,
                        cur % _CUR_BUDGET,
                        (cur + max(t - 1, 0)) // _CUR_BUDGET,
                    )
                )
                cur += t
            totals[b] = cur
    return packed, n_admitted, totals


def _cur_write_batch(src, fi, rows):
    path = os.path.join(src, f"{fi:02d}.jsonl")
    with open(path, "w") as f:
        for doc_id, dom, text in rows:
            f.write(
                json.dumps({"doc_id": doc_id, "source": dom, "text": text})
                + "\n"
            )
    os.utime(path, (1_700_000_000 + fi, 1_700_000_000 + fi))


def test_stream_curation_chain_matches_replay_and_restarts(spark, tmp_path):
    """The full chain drained over a pinned micro-batch sequence equals
    the pure-Python replay row-for-row; a SECOND run with new source
    files and the same workdir resumes BOTH stateful stages (cap
    counters and bucket token totals) from their checkpoints."""
    from asterlake.streaming.pipeline import stream_curation_chain

    src = str(tmp_path / "curdocs")
    os.makedirs(src)
    work = str(tmp_path / "curwork")
    batches1 = [
        # doc 3 gated out ('b' -> unk floor); src0 over cap across batches
        [(4, "src0", "a a a a"), (1, "src0", "a a a"), (3, "big", "b b b")],
        [(2, "src0", "a a a a a a a"), (5, "big", "a a"), (6, "off", "a a")],
    ]
    for fi, rows in enumerate(batches1):
        _cur_write_batch(src, fi, rows)

    def run():
        return stream_curation_chain(
            spark, src, "doc_id long, source string, text string", work,
            _CUR_VOCAB, _CUR_MODEL, _CUR_UNK, _CUR_GATE, _CUR_FACTORS,
            cap=_CUR_CAP, budget=_CUR_BUDGET, n_buckets=_CUR_BUCKETS,
            max_files_per_trigger=1,
        )

    got1 = sorted(tuple(r) for r in run().collect())
    want1, admits, totals = _cur_replay(batches1)
    assert got1 == sorted(want1)
    # the gate and the cap really bit: doc 3 gone, src0 kept 2 of 3,
    # 'off' domain zeroed by its 0-ppm factor, 'big' doc duplicated
    ids = [r[1] for r in got1]
    assert 3 not in ids and 6 not in ids
    assert sorted(set(ids)) == [1, 4, 5]
    assert ids.count(5) >= 2  # factor 2.5e6 -> at least 2 copies

    # restart: two more files, same workdir -> checkpoints resume state
    batches2 = [
        [(7, "src0", "a a"), (8, "new", "a a a a")],
        [(9, "new", "a"), (10, "new", "a a")],
    ]
    for fi, rows in enumerate(batches2, start=len(batches1)):
        _cur_write_batch(src, fi, rows)
    got2 = sorted(tuple(r) for r in run().collect())
    want_new, admits, totals = _cur_replay(batches2, admits, totals)
    assert got2 == sorted(want1 + want_new)
    ids2 = [r[1] for r in got2]
    assert 7 not in ids2  # src0 cap already exhausted before the restart
    # 'new' admits 8 (batch 3) then 9 (batch 4, lowest id); 10 caps out
    assert 9 in ids2 and 10 not in ids2 and ids2.count(8) == 1
    # packing resumed, not restarted: offsets in each bucket are dense
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for r in got2:
        by_bucket.setdefault(r[0], []).append((r[4], r[3]))
    for b, offs in by_bucket.items():
        offs.sort()
        assert offs[0][0] == 0
        for (o1, t1), (o2, _) in zip(offs, offs[1:]):
            assert o2 == o1 + t1, (b, offs)


def test_stream_pack_single_bucket_matches_batch_pack(spark, tmp_path):
    """With n_buckets=1 and monotone-id arrival the drained streaming
    packer is bit-identical to batch pack_sequences (bucket_prefix = 0,
    identical (id) order) — the drained-stream == batch pin."""
    from pyspark.sql import functions as F

    from asterlake.operators.packing import pack_sequences
    from asterlake.streaming.pipeline import stream_pack_sequences

    src = str(tmp_path / "packdocs")
    os.makedirs(src)
    rows = [(i, (i * 7) % 11 + 1) for i in range(20)]  # (id, n_tokens)
    for fi in range(4):  # monotone ids across files
        path = os.path.join(src, f"{fi:02d}.jsonl")
        with open(path, "w") as f:
            for i, t in rows[fi * 5 : (fi + 1) * 5]:
                f.write(json.dumps({"doc_id": i, "copy_id": 0, "n_tokens": t}) + "\n")
        os.utime(path, (1_700_000_000 + fi, 1_700_000_000 + fi))

    got: list = []
    stream = spark.readStream.schema(
        "doc_id long, copy_id int, n_tokens long"
    ).option("maxFilesPerTrigger", 1).json(src)
    q = (
        stream_pack_sequences(stream, budget=16, n_buckets=1)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _eid: got.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = {
        r["doc_id"]: (r["offset"], r["pack_id"], r["pack_offset"], r["end_pack_id"])
        for r in got
    }
    batch = pack_sequences(
        spark.createDataFrame(rows, "doc_id long, n_tokens long"),
        F.col("n_tokens"), budget=16, n_buckets=1,
    )
    batch_out = {
        r["doc_id"]: (r["offset"], r["pack_id"], r["pack_offset"], r["end_pack_id"])
        for r in batch.collect()
    }
    assert stream_out == batch_out


def test_quality_ensemble_gate_is_stream_composable(spark, tmp_path):
    """The multi-signal ensemble is a stateless row-local projection,
    so it composes UNCHANGED into micro-batches: the drained stream of
    ensemble verdicts equals the batch query row-for-row (the same
    one-code-path pin the mixture gate carries)."""
    import json as _json

    from asterlake.queries import QUERIES

    SF = "/root/testdata/sf0.001"
    batch = {
        r["doc_id"]: tuple(r)[1:]
        for r in QUERIES["q_quality_ensemble"].spark(spark, SF).collect()
    }

    # replay the documents table as a 3-micro-batch file stream and
    # apply the same column expressions (via the operator helpers the
    # query composes)
    import pyspark.sql.functions as F

    from asterlake.operators.dsir import dsir_weight_cols
    from asterlake.operators.ngramlm import bigram_score_cols
    from asterlake.queries import (
        _BIGRAM_GATE,
        _BIGRAM_MODEL,
        _BIGRAM_UNK,
        _BIGRAM_VOCAB,
        _DSIR_BUCKETS,
        _DSIR_RATIOS,
        _DSIR_THRESHOLD,
    )

    rows = (
        spark.read.parquet(SF + "/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    src = str(tmp_path / "qedocs")
    os.makedirs(src)
    for fi in range(3):
        path = os.path.join(src, f"{fi:02d}.jsonl")
        with open(path, "w") as f:
            for r in rows[fi::3]:
                f.write(
                    _json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                    + "\n"
                )
        os.utime(path, (1_700_000_000 + fi, 1_700_000_000 + fi))

    n_pairs, ll = bigram_score_cols(_BIGRAM_VOCAB, _BIGRAM_MODEL, _BIGRAM_UNK)
    n_grams, dw = dsir_weight_cols(_DSIR_RATIOS, _DSIR_BUCKETS)
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    n_tokens = n_pairs.cast("bigint")
    ppl_ok = ll >= F.lit(_BIGRAM_GATE).cast("bigint") * n_tokens
    dsir_ok = dw >= F.lit(_DSIR_THRESHOLD).cast("bigint") * n_grams.cast("bigint")
    lex_ok = (
        F.lit(2).cast("bigint") * F.size(F.array_distinct(toks)).cast("bigint")
        >= n_tokens
    )
    len_ok = n_tokens >= 5
    votes = ppl_ok.cast("int") + dsir_ok.cast("int") + lex_ok.cast("int")

    got: list = []
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select(
            "doc_id",
            n_tokens.cast("int").alias("n_tokens"),
            ppl_ok.alias("ppl_ok"),
            dsir_ok.alias("dsir_ok"),
            lex_ok.alias("lex_ok"),
            len_ok.alias("len_ok"),
            (len_ok & (votes >= 2)).alias("kept"),
        )
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, _eid: got.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert {r["doc_id"]: tuple(r)[1:] for r in got} == batch


def _ss_write_batch(src, fi, rows):
    path = os.path.join(src, f"{fi:02d}.jsonl")
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(path, (1_700_000_000 + fi, 1_700_000_000 + fi))


@pytest.mark.slow
def test_stream_substring_screen_flags_across_batches_and_restarts(
    spark, tmp_path
):
    """The streaming ExactSubstr ingest loop: a document repeating an
    EARLIER micro-batch's content flags on arrival; same-batch repeats
    do not flag (never new-vs-new); a restart with new files resumes
    from the checkpoint and screens against the index the first run
    appended."""
    from asterlake.streaming.pipeline import stream_substring_screen

    K = 4
    src = str(tmp_path / "ssdocs")
    os.makedirs(src)
    work = str(tmp_path / "sswork")
    # batch 0: two docs sharing a 4-token run WITH EACH OTHER only —
    # same batch, must not flag; batch 1: doc 10 repeats doc 1's run
    # (cross-batch -> flags), doc 11 is fresh
    _ss_write_batch(src, 0, [
        (1, "alpha beta gamma delta tail1"),
        (2, "pre alpha beta gamma delta"),
    ])
    _ss_write_batch(src, 1, [
        (10, "xx alpha beta gamma delta yy"),
        (11, "nothing shared here at all"),
    ])

    def run():
        return stream_substring_screen(
            spark, src, "doc_id long, text string", work,
            min_tokens=K, max_files_per_trigger=1,
        )

    got1 = {r.doc_id: (r.n_spans, r.dup_tokens) for r in run().collect()}
    # batch-0 pair shared only within their own batch: unflagged;
    # doc 10's "alpha beta gamma delta" (two windows merged to one
    # 5-token span via coverage: positions 1 and... exactly one window
    # "alpha beta gamma delta" at pos 1 -> span 4... compute: windows
    # of doc 10 hitting the index = the one window == doc 1/2's run
    assert 1 not in got1 and 2 not in got1 and 11 not in got1
    assert 10 in got1 and got1[10][0] == 1

    # restart: doc 20 repeats batch-0 content (now indexed), doc 21
    # repeats DOC 11's content (indexed by batch 1's append)
    _ss_write_batch(src, 2, [
        (20, "zz alpha beta gamma delta tail1 qq"),
        (21, "well nothing shared here at all friend"),
    ])
    got2 = {r.doc_id: (r.n_spans, r.dup_tokens) for r in run().collect()}
    assert got2[10] == got1[10]  # first run's flags persisted
    assert 20 in got2 and 21 in got2
    # doc 20 covers "alpha beta gamma delta tail1" (5 tokens, 2 windows
    # merged by coverage into one span)
    assert got2[20] == (1, 5)
    # doc 21 covers "nothing shared here at all" (5 tokens)
    assert got2[21] == (1, 5)
    assert 1 not in got2 and 2 not in got2 and 11 not in got2


def test_stream_ohlc_append_emits_closed_bars_exactly_once(spark, tmp_path):
    """Watermarked append-mode OHLC (the q_stream_ohlc_append shape,
    r11 verdict ask #4): over a 3-file / 3-micro-batch drain, the sink
    holds EXACTLY the closed bars (window.end <= max(ts) - delay) of
    the batch twin, each emitted once — cross-batch struct-min/max
    merge, watermark eviction, and no duplicate emission under
    availableNow."""
    import datetime

    from pyspark.sql import functions as F

    from asterlake.operators.timeseries import ohlc_bars_windowed

    events_dir = str(tmp_path / "ohlc_events")
    os.makedirs(events_dir)

    def _write(path, rows, mtime):
        full = os.path.join(events_dir, path)
        with open(full, "w") as f:
            for eid, uid, ts, val in rows:
                f.write(
                    json.dumps(
                        {"event_id": eid, "user_id": uid, "ts": ts,
                         "value": val}
                    )
                    + "\n"
                )
        # the file source orders micro-batches by MODIFICATION TIME;
        # equal mtimes make the order arbitrary (observed: the newest
        # data first, which legitimately drops the older files as late
        # vs the advanced watermark) — pin the arrival order explicitly
        os.utime(full, (mtime, mtime))

    # day 1 split across two batches (merge must combine partials);
    # day 3 arrives last and stays open (watermark = day3 12:00 - 1h)
    _write("b1.json", [
        (1, 1, "2025-01-01 09:00:00", 10.0),
        (2, 1, "2025-01-01 12:00:00", 30.0),
        (3, 2, "2025-01-01 10:00:00", 7.0),
    ], mtime=1_700_000_000)
    _write("b2.json", [
        (4, 1, "2025-01-01 15:00:00", 5.0),   # same day-1 bar, later batch
        (5, 1, "2025-01-02 09:00:00", 20.0),
    ], mtime=1_700_000_060)
    _write("b3.json", [
        (6, 2, "2025-01-03 12:00:00", 9.0),
    ], mtime=1_700_000_120)
    schema = "event_id long, user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
        .withWatermark("ts", "1 hour")
    )
    bars = ohlc_bars_windowed(stream)
    _drain(bars, str(tmp_path / "ck_ohlc"), "ohlc_append_sink")
    got = {
        (r.user_id, str(r.bar_start)): (
            r.open, r.high, r.low, r.close, r.n_events
        )
        for r in spark.sql("SELECT * FROM ohlc_append_sink").collect()
    }
    batch = spark.read.json(
        events_dir, schema=schema
    )
    wm = datetime.datetime(2025, 1, 3, 11, 0, 0)
    closed = {
        (r.user_id, str(r.bar_start)): (
            r.open, r.high, r.low, r.close, r.n_events
        )
        for r in ohlc_bars_windowed(batch)
        .filter(F.col("bar_end") <= F.lit(wm))
        .collect()
    }
    assert got == closed
    # the day-1 user-1 bar merged across batches b1+b2: open at 09:00,
    # close at the 15:00 observation
    assert got[(1, "2025-01-01 00:00:00")] == (10.0, 30.0, 5.0, 5.0, 3)
    # the still-open day-3 bar must NOT have been emitted
    assert (2, "2025-01-03 00:00:00") not in got
    assert len(got) == 3


def test_ohlc_append_cutoff_is_tie_free_at_every_shipped_sf():
    """r12 verdict ask #6: q_stream_ohlc_append's oracle applies the
    closed-bar cutoff as ``bar_start + 1 day <= max(ts) - 1 hour``,
    and the equivalence to the streaming eviction relies on the
    watermark never landing EXACTLY on a midnight bar boundary (a tie
    would make the <= comparison eviction-order-sensitive). Assert the
    chosen 1-hour delay keeps the watermark >= 30 minutes away from
    the nearest midnight at every shipped SF — if the driver testdata
    ever moves events near a boundary, this fails loudly and the
    tie-free argument must be re-verified (the query docstring says
    so)."""
    import glob

    import duckdb

    sfs = sorted(glob.glob("/root/testdata/sf*"))
    assert sfs, "no shipped testdata directories found"
    con = duckdb.connect()
    for d in sfs:
        wm = con.execute(
            "SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR "
            f"FROM read_parquet('{d}/events.parquet')"
        ).fetchone()[0]
        secs = wm.hour * 3600 + wm.minute * 60 + wm.second
        dist = min(secs, 86400 - secs)
        assert dist >= 1800, (
            f"{d}: watermark {wm} is {dist}s from midnight — the "
            "q_stream_ohlc_append tie-free cutoff argument needs "
            "re-verification"
        )


def test_stream_apply_changes_folds_epochs_and_is_exactly_once(
    spark, tmp_path
):
    """Streaming CDC apply (r12 verdict ask #4b): two sequence-ordered
    change waves fold into the maintained snapshot one epoch at a
    time; the final version equals the ONE-SHOT batch application of
    the whole changelog, the intermediate version shows only wave 1,
    and a re-drain from the same checkpoint is a no-op (no new
    versions — exactly-once effective)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from asterlake.operators.cdc import apply_changes
    from asterlake.streaming.pipeline import (
        read_cdc_snapshot,
        stream_apply_changes,
    )

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, val double"
    )
    wave1 = spark.createDataFrame(
        [
            (1, 11.0, "U", 1),  # update
            (2, 0.0, "D", 1),  # delete
            (4, 40.0, "I", 1),  # insert
        ],
        "id long, val double, op string, seq long",
    )
    wave2 = spark.createDataFrame(
        [
            (1, 12.0, "U", 2),  # latest-wins re-update
            (2, 21.0, "I", 2),  # re-insert of the deleted key
        ],
        "id long, val double, op string, seq long",
    )
    src_dir = str(tmp_path / "changes")
    os.makedirs(src_dir)
    for i, wave in enumerate((wave1, wave2)):
        stage = str(tmp_path / f"stage{i}")
        wave.coalesce(1).write.parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(src_dir, f"wave{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    snap_dir = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(wave1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        stream_apply_changes(
            stream, snap_dir, ["id"], "seq", ckpt, initial=base
        )

    drain()
    versions = sorted(os.listdir(snap_dir))
    assert versions == ["batch=0", "batch=1"]
    # intermediate version: wave 1 only
    v0 = {
        (r.id, r.val)
        for r in spark.read.parquet(
            os.path.join(snap_dir, "batch=0")
        ).collect()
    }
    assert v0 == {(1, 11.0), (3, 30.0), (4, 40.0)}
    # final version == one-shot batch application of the full log
    want = {
        (r.id, r.val)
        for r in apply_changes(
            base, wave1.unionByName(wave2), ["id"], "seq"
        ).collect()
    }
    got = {
        (r.id, r.val) for r in read_cdc_snapshot(spark, snap_dir).collect()
    }
    assert got == want == {(1, 12.0), (2, 21.0), (3, 30.0), (4, 40.0)}
    # re-drain from the same checkpoint: nothing new to process, no new
    # versions, snapshot unchanged
    drain()
    assert sorted(os.listdir(snap_dir)) == ["batch=0", "batch=1"]
    assert {
        (r.id, r.val) for r in read_cdc_snapshot(spark, snap_dir).collect()
    } == want


def test_stream_apply_changes_epoch_replay_overwrites_partial(
    spark, tmp_path
):
    """A foreachBatch retry overwrites its OWN batch=<eid> version: a
    poisoned partial write under batch=1 disappears after the epoch is
    re-applied (the idempotent-epoch-landing contract), and the base
    read for epoch 1 excludes the in-flight epoch-1 junk."""
    import glob
    import os
    import shutil

    from asterlake.streaming.pipeline import (
        read_cdc_snapshot,
        stream_apply_changes,
    )

    base = spark.createDataFrame([(1, 1.0)], "id long, val double")
    wave1 = spark.createDataFrame(
        [(1, 2.0, "U", 1)], "id long, val double, op string, seq long"
    )
    wave2 = spark.createDataFrame(
        [(1, 3.0, "U", 2)], "id long, val double, op string, seq long"
    )
    src_dir = str(tmp_path / "changes")
    os.makedirs(src_dir)
    for i, wave in enumerate((wave1, wave2)):
        stage = str(tmp_path / f"stage{i}")
        wave.coalesce(1).write.parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(src_dir, f"wave{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
    snap_dir = str(tmp_path / "snap")
    # simulate a crashed epoch-1 attempt: partial junk under batch=1
    # BEFORE the stream runs — the epoch-1 fold must both ignore it as
    # a base (reads batch=0) and replace it
    junk = os.path.join(snap_dir, "batch=1")
    os.makedirs(junk)
    spark.createDataFrame(
        [(99, 99.0)], "id long, val double"
    ).write.mode("overwrite").parquet(junk)
    stream = (
        spark.readStream.schema(wave1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream_apply_changes(
        stream, snap_dir, ["id"], "seq", str(tmp_path / "ckpt"),
        initial=base,
    )
    got = {
        (r.id, r.val) for r in read_cdc_snapshot(spark, snap_dir).collect()
    }
    assert got == {(1, 3.0)}  # junk replaced, base chain intact


def test_read_cdc_snapshot_missing_dir_raises(spark, tmp_path):
    import pytest

    from asterlake.streaming.pipeline import read_cdc_snapshot

    with pytest.raises(FileNotFoundError, match="no CDC snapshot"):
        read_cdc_snapshot(spark, str(tmp_path / "nope"))


def _land_cdc_waves(spark, tmp_path, waves, start=0):
    """Stage change waves as single mtime-pinned parquet files so the
    file source replays them in sequence order."""
    import glob
    import os
    import shutil

    src_dir = str(tmp_path / "changes")
    os.makedirs(src_dir, exist_ok=True)
    for i, wave in enumerate(waves, start=start):
        stage = str(tmp_path / f"stage{i}")
        wave.coalesce(1).write.parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(src_dir, f"wave{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))
    return src_dir


def test_stream_apply_changes_commits_manifests_and_restart_resumes(
    spark, tmp_path
):
    """r13 verdict ask #3: every epoch's ``batch=<eid>`` version is
    COMMITTED by an ``_manifest.json`` (epoch id + observed row count,
    invisible to Spark's own file listing), and a RESTART from the same
    checkpoint against the manifest-committed snapshot_dir resumes the
    fold chain — the new epoch reads the highest committed version as
    its base, never re-seeding from ``initial``."""
    import json
    import os

    from asterlake.streaming.pipeline import (
        _CDC_MANIFEST,
        read_cdc_snapshot,
        stream_apply_changes,
    )

    schema = "id long, val double, op string, seq long"
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, val double")
    wave0 = spark.createDataFrame([(1, 11.0, "U", 1)], schema)
    wave1 = spark.createDataFrame([(2, 21.0, "U", 2)], schema)
    src_dir = _land_cdc_waves(spark, tmp_path, [wave0, wave1])
    snap_dir = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(wave0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        stream_apply_changes(
            stream, snap_dir, ["id"], "seq", ckpt, initial=base
        )

    drain()
    # every version committed: manifest present, epoch + row count match
    for eid in (0, 1):
        mpath = os.path.join(snap_dir, f"batch={eid}", _CDC_MANIFEST)
        assert os.path.isfile(mpath)
        manifest = json.load(open(mpath))
        n = spark.read.parquet(
            os.path.join(snap_dir, f"batch={eid}")
        ).count()
        assert manifest == {"epoch": eid, "n_rows": n}
    # restart: new wave arrives, SAME checkpoint — epoch 2 must fold on
    # the committed batch=1 (val 11.0 and 21.0 survive), not on initial
    wave2 = spark.createDataFrame([(3, 30.0, "I", 3)], schema)
    _land_cdc_waves(spark, tmp_path, [wave2], start=2)
    drain()
    got = {
        (r.id, r.val) for r in read_cdc_snapshot(spark, snap_dir).collect()
    }
    assert got == {(1, 11.0), (2, 21.0), (3, 30.0)}
    assert json.load(
        open(os.path.join(snap_dir, "batch=2", _CDC_MANIFEST))
    ) == {"epoch": 2, "n_rows": 3}


def test_stream_apply_changes_rejects_stale_snapshot_versions(
    spark, tmp_path
):
    """r13 ADVICE: a FRESH checkpoint against a snapshot_dir that
    outlived its original checkpoint fails loudly — epoch 0 finds
    committed versions newer than itself (which would silently shadow
    every new fold in read_cdc_snapshot) and raises instead of landing
    stale-served data."""
    import pytest

    from asterlake.streaming.pipeline import stream_apply_changes

    schema = "id long, val double, op string, seq long"
    base = spark.createDataFrame([(1, 1.0)], "id long, val double")
    wave0 = spark.createDataFrame([(1, 2.0, "U", 1)], schema)
    wave1 = spark.createDataFrame([(1, 3.0, "U", 2)], schema)
    src_dir = _land_cdc_waves(spark, tmp_path, [wave0, wave1])
    snap_dir = str(tmp_path / "snap")

    def drain(ckpt):
        stream = (
            spark.readStream.schema(wave0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        stream_apply_changes(
            stream, snap_dir, ["id"], "seq", ckpt, initial=base
        )

    drain(str(tmp_path / "ckpt1"))  # commits batch=0 and batch=1
    with pytest.raises(Exception, match="stale CDC snapshot versions"):
        drain(str(tmp_path / "ckpt2"))  # fresh checkpoint: epoch 0 again


def test_cdc_snapshot_functions_reject_non_local_schemes(spark, tmp_path):
    """The driver-listdir snapshot layout is local-filesystem only
    (r13 verdict ask #3): object-store schemes are refused up front on
    both the write and read path."""
    import pytest

    from asterlake.streaming.pipeline import (
        read_cdc_snapshot,
        stream_apply_changes,
    )

    with pytest.raises(NotImplementedError, match="driver-local"):
        read_cdc_snapshot(spark, "s3a://bucket/cdc")
    stream = (
        spark.readStream.format("rate")
        .load()
        .selectExpr("value AS id", "'I' AS op", "value AS seq")
    )
    with pytest.raises(NotImplementedError, match="driver-local"):
        stream_apply_changes(
            stream,
            "s3a://bucket/cdc",
            ["id"],
            "seq",
            str(tmp_path / "ckpt"),
        )
