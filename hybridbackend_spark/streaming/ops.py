"""Structured Streaming operators: windowed aggregations, sessionization,
streaming dedup, and synchronous (availableNow) execution helpers.

The reference's streaming layer is an iterator pull pipeline with
replica-synchronized termination (``data/sync/sync_replicas_dataset.cc``) and
no event-time semantics. Spark's Structured Streaming supplies coordination,
checkpointing, and exactly-once natively (SURVEY §2.10 T1/T3), so this
module only adds the event-time operators the driver's north-star asks for:
watermarks, tumbling/sliding/session windows, and stateful dedup.

Every operator is defined on an unbounded DataFrame and works identically
on a bounded one — tests drive them with availableNow over parquet, which
is also the replay/backfill story at scale.
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

__all__ = [
    "read_event_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_dedup",
    "stream_stream_join",
    "run_available_now",
    "foreach_batch_epoch_sink",
    "RUN_LOG",
]

# events.parquet carries TIMESTAMP(NANOS). Depending on the Spark build
# that surfaces as either int64 nanos (builds honoring the legacy
# ``nanosAsLong`` conf) or a timestamp_ntz truncated to micros (builds
# that ignore it) — so the ``ts`` field type cannot be hard-declared.
# EVENTS_SCHEMA carries the NTZ variant for reference/back-compat;
# read_event_stream probes a batch read of the same directory (exactly
# what the batch loader queries.py::_t observes) and declares whatever
# type THIS build produces, then normalizes to a session-zone TIMESTAMP.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _probed_events_schema(spark: SparkSession, path: str) -> T.StructType:
    """EVENTS_SCHEMA with the ``ts`` field typed as a batch read of
    ``path`` actually surfaces it on this Spark build (int64 nanos vs
    timestamp_ntz) — file-source streams require a declared schema, and
    declaring the wrong variant makes every batch unreadable."""
    probed = dict(spark.read.parquet(path).dtypes).get("ts")
    ts_type = T.LongType() if probed == "bigint" else T.TimestampNTZType()
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", ts_type)
            for f in EVENTS_SCHEMA.fields
        ]
    )


# Session-wide default for file-source ingest throttling (files per
# micro-batch). None = unthrottled (availableNow drains everything in
# one batch when the source is a single file).
DEFAULT_MAX_FILES_PER_TRIGGER: int | None = None


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the events table (nanos ts -> micros
    timestamp). ``schema=None`` (default) probes the directory with a
    batch read and declares the ts type this build actually produces;
    pass an explicit schema to skip the probe.
    ``max_files_per_trigger`` throttles ingest for backpressure
    control; when the caller leaves it None, the module-level
    ``DEFAULT_MAX_FILES_PER_TRIGGER`` applies (the bench sets it to
    drive multi-batch runs that separate state-store setup cost from
    per-batch marginal cost)."""
    if max_files_per_trigger is None:
        max_files_per_trigger = DEFAULT_MAX_FILES_PER_TRIGGER
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin the session zone so window alignment and hour buckets match the
    # naive-timestamp oracles regardless of the caller's session zone
    # (same once-per-session contract as queries._pin_utc)
    from ..queries import _pin_utc

    _pin_utc(spark)
    if schema is None:
        schema = _probed_events_schema(spark, path)
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # File-source streams require a directory; a concrete file path becomes
    # its parent dir + a glob filter on the file name.
    import os

    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.load(path)
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_agg(
    events: DataFrame,
    ts: str,
    duration: str,
    keys: Sequence[str] = (),
    watermark: str = "30 minutes",
    aggs: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark.
    Defaults to count + sum(value)."""
    # exact-cents sum: per-row cents quantization then an integer sum,
    # so the result is order-independent and engine-exact (a double sum
    # rounded at 2 dp is order-dependent in the last ulp — the oracle
    # hazard gate in tests/test_oracle_hazards.py forbids it)
    aggs = aggs or {
        "n_events": F.count(F.lit(1)),
        "sum_value": F.sum(F.round(F.col("value") * 100).cast("long"))
        / F.lit(100.0),
    }
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), duration), *keys)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def sliding_agg(
    events: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding event-time window (overlapping windows every ``slide``)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), duration, slide), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            *keys,
            "n_events",
        )
    )


def session_agg(
    events: DataFrame,
    ts: str,
    gap: str,
    keys: Sequence[str],
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: dynamic-length windows closing after ``gap``
    inactivity per key (streaming analog of the batch ``sessionize``)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame, keys: Sequence[str], ts: str, watermark: str = "30 minutes"
) -> DataFrame:
    """Stateful streaming dedup on ``keys`` with bounded state:
    duplicates arriving within the watermark horizon are dropped;
    state older than the watermark is evicted (constant memory at scale)."""
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_available_now(
    stream_df: DataFrame, name: str | None = None, mode: str | None = None
) -> DataFrame:
    """Execute a streaming plan synchronously over all currently-available
    input (availableNow trigger -> memory sink) and return the bounded
    result. This is the replay/backfill path: identical code serves the
    live stream and the batch catch-up.

    ``mode`` overrides the inferred output mode. NOTE the semantics
    difference for watermarked aggregations: in ``complete`` mode (the
    inference for aggregates, so replays cover every window) the
    watermark does NOT drop late rows; ``append``/``update`` enforce the
    late-data drop and evict closed state — use those to exercise or
    rely on drop semantics."""
    qname = name or f"hb_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"hbq_{qname}_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode or _output_mode(stream_df))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _record_progress(qname, q)
    return stream_df.sparkSession.table(qname)


# Per-process log of completed stream executions (query name + per-batch
# trigger durations), appended by the availableNow runners. The bench
# reads it to split a stream query's FIXED cost (first micro-batch:
# state-store init, offset log setup) from its MARGINAL cost (subsequent
# batches) — the number that actually tracks regressions, since several
# stateful queries have been setup-bound for rounds. Bounded; callers
# may clear it (`RUN_LOG.clear()`) before a measured run.
RUN_LOG: list[dict] = []
_RUN_LOG_MAX = 256


def _record_progress(qname: str, q) -> None:
    try:
        batches = [
            (p.batchId, (p.durationMs or {}).get("triggerExecution", 0))
            for p in q.recentProgress
        ]
        # per-batch state-store footprint: at 100 TB the state store,
        # not the data, is the streaming bottleneck — rows and bytes per
        # batch make its growth observable (bounded state should plateau
        # once the watermark starts evicting)
        state = []
        for p in q.recentProgress:
            sops = p.stateOperators or []
            if sops:
                state.append(
                    (
                        p.batchId,
                        sum(s.numRowsTotal for s in sops),
                        sum(s.numRowsUpdated for s in sops),
                        sum(s.memoryUsedBytes for s in sops),
                    )
                )
    except Exception:
        return
    if len(RUN_LOG) >= _RUN_LOG_MAX:
        del RUN_LOG[: _RUN_LOG_MAX // 2]
    RUN_LOG.append({"name": qname, "batches": batches, "state": state})


def _output_mode(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().analyzed().toString()
    if "FlatMapGroupsInPandasWithState" in plan:
        return "update"  # custom stateful ops declare their own output mode
    return "complete" if "Aggregate" in plan else "append"


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within_expr: str = "INTERVAL 30 MINUTES",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair each left event with right
    events of the same key whose time falls in
    ``(left_ts, left_ts + within]``.

    Both sides carry watermarks and the join condition bounds event time
    relative to the other stream, so Spark can EVICT join state once the
    watermark passes — per-key state is bounded by the window, not the
    stream length. This is the streaming form of
    :func:`~hybridbackend_spark.operators.joins.interval_join`.

    ``how="left_outer"`` additionally emits unmatched left rows
    null-padded — but only ONCE THE WATERMARK PASSES their join window
    (that is the moment "no match" becomes provable; until then the row
    sits in state awaiting a possible right match). Trailing rows whose
    window the watermark never crosses stay unemitted — size the
    watermark to the staleness you can afford. ``right_outer`` is the
    mirror image.
    """
    joins = {"inner": "inner", "left_outer": "leftOuter",
             "leftOuter": "leftOuter", "right_outer": "rightOuter",
             "rightOuter": "rightOuter"}
    if how not in joins:
        raise ValueError(f"how must be one of {sorted(joins)}")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    joined = l.join(
        r,
        (l[key] == r[key])
        & (r[right_ts] > l[left_ts])
        & (r[right_ts] <= F.expr(f"{left_ts} + {within_expr}")),
        joins[how],
    )
    # under an outer join the null-padded side's key column is null;
    # keep the non-null one
    return joined.drop(r[key] if joins[how] != "rightOuter" else l[key])


def foreach_batch_epoch_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
) -> None:
    """Exactly-once file sink via the foreachBatch idempotence contract:
    each micro-batch is written to its own ``epoch=N`` partition
    directory with overwrite mode. On failure/restart Structured
    Streaming re-delivers the SAME epoch id for an unacknowledged batch,
    and the overwrite replaces rather than appends — the replay is
    idempotent, which upgrades the sink's at-least-once delivery to
    effectively-once output (the pattern Delta/Iceberg MERGE implements
    transactionally; plain parquet gets it from epoch-directory
    overwrite + the checkpoint's epoch tracking).

    Read the result with ``spark.read.parquet(path)`` (epoch becomes a
    partition column); compact per-key state from it with
    :func:`~..operators.structural.changelog_compact`.
    """

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                f"{path}/epoch={epoch_id}"
            )
        )

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _record_progress("foreach_batch_epoch_sink", q)
