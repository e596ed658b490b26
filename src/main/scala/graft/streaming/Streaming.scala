package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.functions.Signal

/** Structured Streaming surface (SURVEY.md §2.7, T1-T8). Every
  * transform is the SAME DataFrame program as its batch twin — the
  * reference's edge/preprocessing pipelines (§3.1/§3.2) become one
  * declarative plan that runs under either execution mode.
  *
  * Reference semantics mapped:
  *  - T1 exactly-once: checkpoint + idempotent file sink (the
  *    reference's manual commit-after-produce is at-least-once;
  *    README.md:265-273 — ours is stronger by construction)
  *  - T2/T3 windows + watermark: 1-min tumbling features over event
  *    time, late data dropped past the watermark
  *  - T4 keyed state: retry counting via flatMapGroupsWithState
  *    replaces the Redis processing:{id} hash (README.md:280-289)
  *  - T5 session windows; T7 streaming dedup; T8 DLQ routing
  */
object Streaming {

  /** README.md:99 MAX_RETRIES. */
  val MaxRetries = 5

  // ---- T2/T3: tumbling event-time feature window -----------------------

  /** The reference's 60-s feature aggregation (TechSpikeDataPipeline.md:
    * 54-64): per machine per window, RMS/peak/kurtosis of the signal.
    * Map-side partial aggregation keeps the shuffle at |keys × windows|.
    */
  def windowedFeatures(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLen: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(
        Signal.rms(col(valueCol)).as("rms"),
        Signal.peak(col(valueCol)).as("peak"),
        Signal.kurtosisPop(col(valueCol)).as("kurtosis"),
        count(lit(1)).as("n"))

  // ---- T5: session windows --------------------------------------------

  def sessionCounts(df: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  // ---- T7: streaming dedup --------------------------------------------

  def dedupWithinWatermark(df: DataFrame, tsCol: String,
      idCols: Seq[String], watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  // ---- T8/P6: DLQ routing ---------------------------------------------

  /** Split a frame on a validity predicate; invalid rows become DLQ
    * records wrapping the original payload (README.md:383-388 contract:
    * original_message + error_count + last_error_time).
    */
  def dlqRecord(df: DataFrame, errorCount: Int = 1): DataFrame =
    df.select(
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("original_message"),
      lit(errorCount).as("error_count"),
      current_timestamp().as("last_error_time"))

  /** foreachBatch fan-out: valid rows → processed path, invalid (or
    * NULL-validity — never silently dropped) → DLQ path. Each epoch
    * writes its own `epoch=<id>` directory with overwrite, so a
    * replayed epoch after a mid-write crash lands idempotently
    * (true exactly-once on both sinks); readers see `epoch` as an
    * extra partition column via discovery.
    */
  def routeToSinks(df: DataFrame, isValid: org.apache.spark.sql.Column,
      processedPath: String, dlqPath: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        // NULL validity counts as invalid → routed to DLQ, not lost
        val flagged = batch
          .withColumn("__valid", coalesce(isValid, lit(false))).cache()
        try {
          flagged.filter(col("__valid")).drop("__valid")
            .write.mode("overwrite").parquet(s"$processedPath/epoch=$epoch")
          dlqRecord(flagged.filter(!col("__valid")).drop("__valid"))
            .write.mode("overwrite").parquet(s"$dlqPath/epoch=$epoch")
        } finally flagged.unpersist()
      }
      .start()

  /** Streaming incremental ingest dedup — the daily-crawl path under
    * Structured Streaming: each micro-batch of incoming documents is
    * LSH-probed against the static corpus and Levenshtein-verified
    * via Dedup.lshVerifiedLookup — the EXACT operator batch q93 runs,
    * so the two execution modes cannot drift (differential in
    * StreamingSpec). Each epoch's verified pairs land idempotently in
    * their own `epoch=<id>` directory (the routeToSinks exactly-once
    * convention): a replayed epoch overwrites itself.
    *
    * Scale: probe cost tracks the BATCH, not the corpus — the corpus
    * banded table is an equi-join build side that a production
    * deployment materializes bucketed by (band, bucket) once and
    * reuses across days.
    */
  def incrementalDedup(incoming: DataFrame, corpus: DataFrame,
      outPath: String, checkpoint: String,
      maxDist: Int = 30): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        graft.operators.Dedup.lshVerifiedLookup(corpus, batch,
          col("text"), col("doc_id"), graft.LshStages.ShingleN,
          graft.LshStages.Bands, graft.LshStages.RowsPerBand, maxDist)
          .write.mode("overwrite").parquet(s"$outPath/epoch=$epoch")
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** CDC MERGE-UPSERT under streaming (batch twin: Queries9.q128).
    * Each micro-batch of change rows (doc_id, text, version) merges
    * latest-version-wins into the corpus state: epoch N reads the
    * previous epoch's state (or the base corpus for the first), unions
    * the batch, keeps row_number()=1 per key by version desc, and
    * writes the full new state to its own `epoch=<id>` directory — a
    * replayed epoch re-reads the same input state and overwrites
    * itself, so the sink stays exactly-once (the routeToSinks
    * convention). Sequential per-batch merging reaches the SAME state
    * as one all-at-once merge because latest-version-wins is
    * associative — proved against q128 in StreamingSpec.
    *
    * Scale: this is the Delta/Iceberg MERGE loop without the table
    * format: one shuffle on the merge key per batch. A production
    * deployment replaces full-state rewrite with partition-pruned
    * rewrite (only key ranges present in the batch), same plan shape.
    */
  def cdcMergeUpsert(incoming: DataFrame, base: DataFrame,
      statePath: String, checkpoint: String): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val s = batch.sparkSession
        // resolve through Hadoop FileSystem, not java.io.File: the state
        // dir lives wherever the cluster's default FS puts it (HDFS, S3,
        // abfs), where a local listFiles() would return null and silently
        // merge against `base` — losing every earlier epoch's changes
        val stateDir = new org.apache.hadoop.fs.Path(statePath)
        val hfs = stateDir.getFileSystem(s.sessionState.newHadoopConf())
        val priorEpochs =
          (if (hfs.exists(stateDir)) hfs.listStatus(stateDir).toSeq
           else Seq.empty)
            .map(_.getPath.getName)
            .filter(_.startsWith("epoch="))
            .map(_.stripPrefix("epoch=").toLong)
            .filter(_ < epoch)
        val prior =
          if (priorEpochs.nonEmpty)
            s.read.parquet(s"$statePath/epoch=${priorEpochs.max}")
          else base
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("version").desc)
        prior.unionByName(batch)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .write.mode("overwrite").parquet(s"$statePath/epoch=$epoch")
      }
      .trigger(Trigger.AvailableNow())
      .start()

  // ---- T4: keyed retry state ------------------------------------------

  case class Attempt(id: Long, ok: Boolean, payload: String, atMillis: Long)
  case class RetryState(retries: Int)
  /** route: "processed" | "dlq" (B6 contract fields for dlq). */
  case class Routed(id: Long, route: String, error_count: Int,
      last_error_millis: Long, payload: String)

  /** The per-key retry fold both T4 implementations run — ONE body so
    * the legacy (flatMapGroupsWithState) and modern (transformWithState)
    * state APIs cannot drift. Attempts are folded in EVENT order within
    * each batch (the iterator arrives in shuffle order, so we sort); a
    * terminal event closes the current cycle and later attempts start a
    * fresh one. Cross-batch reordering (an attempt older than an
    * already-processed terminal event arriving in a later batch) starts
    * a new cycle — full event-time reconciliation would require
    * buffering attempts until a watermark.
    */
  private[streaming] def foldAttempts(id: Long, attempts: Seq[Attempt],
      retries0: Int): (Seq[Routed], Int) = {
    var retries = retries0
    val out = scala.collection.mutable.ArrayBuffer.empty[Routed]
    // secondary keys make the fold order-stable when two attempts share
    // a timestamp — the iterator arrives in nondeterministic shuffle
    // order, and the payload chosen / dlq boundary must not vary by run
    attempts.sortBy(a => (a.atMillis, a.ok, a.payload)).foreach { a =>
      if (a.ok) {
        out += Routed(id, "processed", retries, a.atMillis, a.payload)
        retries = 0
      } else {
        retries += 1
        if (retries >= MaxRetries) {
          out += Routed(id, "dlq", retries, a.atMillis, a.payload)
          retries = 0
        }
      }
    }
    (out.toSeq, retries)
  }

  /** Per-id retry loop replacing the reference's Redis processing-state
    * hash + retry topic (README.md:280-289, 372-391): failures
    * accumulate per key; after MaxRetries total failures the record is
    * emitted as a DLQ row; a success emits a processed row and clears
    * state.
    */
  def retryRoute(ds: Dataset[Attempt])(
      implicit spark: SparkSession): Dataset[Routed] = {
    import spark.implicits._
    ds.groupByKey(_.id)
      .flatMapGroupsWithState[RetryState, Routed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, attempts: Iterator[Attempt], state: GroupState[RetryState]) =>
          val (out, retries) = foldAttempts(id, attempts.toSeq,
            state.getOption.map(_.retries).getOrElse(0))
          if (retries > 0) state.update(RetryState(retries)) else state.remove()
          out.iterator
      }
  }

  /** The SAME retry state machine on Spark 4's transformWithState —
    * the arbitrary-state API that replaces flatMapGroupsWithState
    * (per-state-variable storage, TTL support, RocksDB-backed).
    * Requires `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider`. Output proved identical to
    * [[retryRoute]] in StreamingSpec (shared [[foldAttempts]] body +
    * a same-input differential).
    */
  class RetryStateProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Attempt, Routed] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, TimerValues, ValueState}
    @transient private var retries: ValueState[Int] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      retries = getHandle.getValueState[Int]("retries",
        org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)
    override def handleInputRows(id: Long, rows: Iterator[Attempt],
        timerValues: TimerValues): Iterator[Routed] = {
      val (out, r) = foldAttempts(id, rows.toSeq,
        if (retries.exists()) retries.get() else 0)
      if (r > 0) retries.update(r) else retries.clear()
      out.iterator
    }
  }

  def retryRouteTws(ds: Dataset[Attempt])(
      implicit spark: SparkSession): Dataset[Routed] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ds.groupByKey(_.id)
      .transformWithState(new RetryStateProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  // ---- T4c: retry with the exponential-backoff SCHEDULE ----------------

  /** README.md:99-100 backoff policy: after the k-th failure the key
    * may not be retried for base × 2^(k−1) — 1 s, 2 s, 4 s, 8 s with
    * the 1 s default base, then the 5th failure dead-letters.
    */
  val BackoffBaseMillis = 1000L

  /** Livelock bound on the bounce route: a key whose redeliveries
    * consistently arrive BEFORE their due time would otherwise loop on
    * "retry" forever without ever consuming a retry credit (the
    * upstream redelivery delay being shorter than the backoff
    * schedule). After this many consecutive premature bounces the
    * record dead-letters — the poison-message escape the plain
    * MaxRetries counter cannot provide, because premature attempts
    * never touch `retries`.
    */
  val MaxBounces = 8

  case class BackoffState(retries: Int, dueMillis: Long, bounces: Int = 0)

  /** The backoff-aware per-key fold (ONE body for both state APIs,
    * like [[foldAttempts]]). On top of the plain retry state machine it
    * keeps a next-attempt-DUE timestamp: a failure schedules
    * due = at + base × 2^(retries−1); an attempt arriving BEFORE its
    * due time is not consumed — it is bounced back to the retry topic
    * as a "retry" row carrying the due time in `last_error_millis`
    * (the redelivery hint a Kafka retry-topic consumer would delay
    * on), leaving retries and the schedule untouched — except that
    * [[MaxBounces]] consecutive premature bounces dead-letter the
    * record (poison-message livelock bound). Due attempts fold exactly
    * as before: success → processed + clear; failure → count, and
    * dead-letter at MaxRetries.
    */
  private[graft] def foldAttemptsBackoff(id: Long, attempts: Seq[Attempt],
      st0: BackoffState, baseMillis: Long): (Seq[Routed], BackoffState) = {
    var st = st0
    val out = scala.collection.mutable.ArrayBuffer.empty[Routed]
    attempts.sortBy(a => (a.atMillis, a.ok, a.payload)).foreach { a =>
      if (a.atMillis < st.dueMillis) {
        // premature: bounce with the due-time hint — but BOUNDED
        // (MaxBounces consecutive premature redeliveries dead-letter;
        // an on-time attempt resets the bounce count below)
        val bounces = st.bounces + 1
        if (bounces >= MaxBounces) {
          out += Routed(id, "dlq", st.retries, st.dueMillis, a.payload)
          st = BackoffState(0, 0L)
        } else {
          out += Routed(id, "retry", st.retries, st.dueMillis, a.payload)
          st = st.copy(bounces = bounces)
        }
      } else if (a.ok) {
        out += Routed(id, "processed", st.retries, a.atMillis, a.payload)
        st = BackoffState(0, 0L)
      } else {
        val retries = st.retries + 1
        if (retries >= MaxRetries) {
          out += Routed(id, "dlq", retries, a.atMillis, a.payload)
          st = BackoffState(0, 0L)
        } else {
          st = BackoffState(retries, a.atMillis + (baseMillis << (retries - 1)))
        }
      }
    }
    (out.toSeq, st)
  }

  /** [[retryRoute]] + the exponential-backoff schedule (legacy
    * flatMapGroupsWithState form; differential-proved against
    * [[retryRouteBackoffTws]] in StreamingSpec).
    */
  def retryRouteBackoff(ds: Dataset[Attempt],
      baseMillis: Long = BackoffBaseMillis)(
      implicit spark: SparkSession): Dataset[Routed] = {
    import spark.implicits._
    ds.groupByKey(_.id)
      .flatMapGroupsWithState[BackoffState, Routed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, attempts: Iterator[Attempt], state: GroupState[BackoffState]) =>
          val (out, st) = foldAttemptsBackoff(id, attempts.toSeq,
            state.getOption.getOrElse(BackoffState(0, 0L)), baseMillis)
          if (st.retries > 0) state.update(st) else state.remove()
          out.iterator
      }
  }

  /** The SAME backoff state machine on transformWithState. */
  class BackoffStateProcessor(baseMillis: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Attempt, Routed] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, TimerValues, ValueState}
    @transient private var st: ValueState[BackoffState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BackoffState]("backoff",
        org.apache.spark.sql.Encoders.product[BackoffState], TTLConfig.NONE)
    override def handleInputRows(id: Long, rows: Iterator[Attempt],
        timerValues: TimerValues): Iterator[Routed] = {
      val (out, s) = foldAttemptsBackoff(id, rows.toSeq,
        if (st.exists()) st.get() else BackoffState(0, 0L), baseMillis)
      if (s.retries > 0) st.update(s) else st.clear()
      out.iterator
    }
  }

  def retryRouteBackoffTws(ds: Dataset[Attempt],
      baseMillis: Long = BackoffBaseMillis)(
      implicit spark: SparkSession): Dataset[Routed] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ds.groupByKey(_.id)
      .transformWithState(new BackoffStateProcessor(baseMillis),
        TimeMode.None(), OutputMode.Append())
  }

  // ---- T4b: timeout-closed sessions (custom state machine) -------------

  case class Click(user: Long, eventTime: java.sql.Timestamp) {
    def tsMillis: Long = eventTime.getTime
  }
  case class SessionState(start: Long, end: Long, n: Int)
  case class ClosedSession(user: Long, startMillis: Long, endMillis: Long,
      n_events: Int)

  /** Session tracking as an explicit state machine with
    * EventTimeTimeout: events extend the open session; when the
    * watermark passes lastEvent + gap, the state times out and the
    * CLOSED session is emitted. Demonstrates GroupState timeouts — the
    * general form session_window can't express (e.g. per-key dynamic
    * gaps, side outputs on close).
    */
  def timeoutSessions(ds: Dataset[Click], gapMillis: Long)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    ds.withWatermark("eventTime", "10 seconds")
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Click], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            Iterator.single(ClosedSession(user, s.start, s.end, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.tsMillis)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { c =>
              cur match {
                case Some(s) if c.tsMillis >= s.start - gapMillis &&
                    c.tsMillis - s.end <= gapMillis =>
                  // within gap of the open session (possibly late) —
                  // extend, never moving the bounds backwards
                  cur = Some(s.copy(start = math.min(s.start, c.tsMillis),
                    end = math.max(s.end, c.tsMillis), n = s.n + 1))
                case Some(s) if c.tsMillis > s.end + gapMillis =>
                  closed += ClosedSession(user, s.start, s.end, s.n)
                  cur = Some(SessionState(c.tsMillis, c.tsMillis, 1))
                case Some(_) =>
                  // a late straggler more than gap BEFORE the open
                  // session: it cannot merge; emit it as its own
                  // single-event session (approximation — an even
                  // later neighbor within its gap would need full
                  // event-list state to merge with it)
                  closed += ClosedSession(user, c.tsMillis, c.tsMillis, 1)
                case None =>
                  cur = Some(SessionState(c.tsMillis, c.tsMillis, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMillis)
            }
            closed.iterator
          }
      }
  }

  // ---- T12: streaming distinct-count state (HLL registers per key) -----

  case class KeyedValue(key: String, value: String)
  case class HllRegsState(regs: Array[Byte], nUpdates: Long)
  case class KeyRegs(key: String, nUpdates: Long, regs: Seq[Int])

  /** Incremental per-key distinct-count sketch: the per-key state IS
    * an HLL register file, folded through the SAME kernel the batch
    * aggregate uses (SketchAggregates.hllUpdate), so after any batch
    * split / restart the state is bit-identical to
    * `hll_registers(value, p)` over the rows seen so far — the sketch
    * analogue of the q93 incremental-dedup contract, differential-
    * proved in StreamingSpec.
    *
    * Scale: per-key state is 2^p bytes FOREVER (distinct counting
    * without storing members), updates are append-only max, and the
    * emitted register file composes with the q163 register algebra
    * (union across keys = zip_with greatest) — a live dashboard over
    * arbitrary key rollups from kilobytes of state.
    */
  def streamingHllRegs(ds: Dataset[KeyedValue], p: Int)(
      implicit spark: SparkSession): Dataset[KeyRegs] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .mapGroupsWithState[HllRegsState, KeyRegs](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedValue],
            state: GroupState[HllRegsState]) =>
          val st = state.getOption.getOrElse(
            HllRegsState(new Array[Byte](1 << p), 0L))
          var n = st.nUpdates
          rows.foreach { r =>
            if (r.value != null) {
              graft.functions.SketchAggregates.hllUpdate(st.regs, r.value, p)
              n += 1
            }
          }
          val next = HllRegsState(st.regs, n)
          state.update(next)
          KeyRegs(key, n, next.regs.map(_.toInt).toSeq)
      }
  }

  // ---- T13: streaming as-of feature serve (the q196 serving twin) -----

  case class FeatEvent(user: Long, kind: String, t: Long, id: Long,
      value: Double)
  case class ViewState(t: Long, value: Double)
  case class Served(user: Long, t: Long, id: Long, fresh: Boolean,
      feature: Option[Double], staleness_us: Option[Long])

  /** Streaming point-in-time feature lookup: per-user state carries
    * the latest view's (t, value); each purchase is served the
    * feature iff it is within `tolUs` of that view — the SERVING
    * path of q196's batch as-of-with-tolerance. Within a batch, rows
    * fold in (t, id) order, so when the input arrives in event-time
    * order the emitted enrichments are row-identical to q196's
    * ROWS-frame window under ANY batch split (the q93/T12
    * incremental contract, differential-proved in StreamingSpec).
    *
    * Scale: per-user state is ONE (t, value) pair — constant bytes
    * per key forever; no time-range join state, no buffered event
    * log. The same shape extends to a feature VECTOR by widening the
    * state struct, never by widening a join.
    */
  def asofServe(ds: Dataset[FeatEvent], tolUs: Long)(
      implicit spark: SparkSession): Dataset[Served] = {
    import spark.implicits._
    ds.groupByKey(_.user)
      .flatMapGroupsWithState[ViewState, Served](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FeatEvent],
            state: GroupState[ViewState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.t, e.id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Served]
          var st = state.getOption
          sorted.foreach { e =>
            // Cross-batch monotonicity guard: a view landing in a LATER
            // micro-batch with an EARLIER event time must not rewind the
            // stored state (it would silently diverge from the q196 batch
            // twin). Out-of-order views are dropped, so disorder degrades
            // predictably instead of corrupting per-user state.
            if (e.kind == "view") {
              if (st.forall(_.t <= e.t)) st = Some(ViewState(e.t, e.value))
            } else if (e.kind == "purchase") {
              val fresh = st.exists(v => e.t - v.t <= tolUs)
              out += Served(user, e.t, e.id, fresh,
                if (fresh) st.map(_.value) else None,
                if (fresh) st.map(v => e.t - v.t) else None)
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  // ---- stream-stream join ---------------------------------------------

  /** Watermarked stream-stream inner join: left events matched to
    * right events on `key` within `withinSec` AFTER the left event —
    * the two-zone correlation the reference's parallel raw/processed
    * paths imply (README.md:141-149). Both sides carry watermarks so
    * the join state is bounded and eventually purged. Right columns
    * are prefixed `r_` in the output automatically (both frames may
    * use natural names, including the same `key` name).
    */
  // ---- T14: streaming CUSUM changepoint alerts ------------------------

  case class CusumIn(key: String, day: Long, x: Double,
      mu: Double, sd: Double)
  case class CusumState(s: Double, lastDay: Long)
  case class CusumOut(key: String, day: Long, s: Double)

  /** Streaming one-sided CUSUM: per-key state is the single running
    * evidence scalar S = max(0, S + (x − μ − 0.5σ)); a day whose S
    * crosses 2σ emits an alert — the SERVING path of q229's batch
    * detector (k = 0.5σ, h = 2σ, same no-reset-after-alert
    * convention). μ/σ ride on the input rows (in production they come
    * from a calibration join against the batch-computed parameters;
    * carrying them per-row keeps the operator pure). INPUT CONTRACT:
    * at most one row per (key, day) — the daily pre-aggregation is
    * the upstream window's job (q229's batch twin aggregates first
    * for the same reason). The operator enforces the contract
    * deterministically rather than trusting it: within a batch, rows
    * fold in (day, x, mu, sd) order and only the FIRST row of a day
    * folds — so even contract-violating duplicate-day input yields
    * one batch-split-invariant answer instead of an
    * arrival-order-dependent one (ADVICE r8). The asofServe
    * cross-batch guard applies: a day at or before the last folded
    * day is dropped, so disorder degrades predictably instead of
    * double-counting evidence.
    *
    * Scale: per-key state is ONE double + ONE long forever; alerts
    * stream out the moment the crossing batch is processed instead of
    * waiting for a nightly batch scan.
    */
  def cusumAlerts(ds: Dataset[CusumIn])(
      implicit spark: SparkSession): Dataset[CusumOut] = {
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CusumIn],
            state: GroupState[CusumState]) =>
          // total order (not day alone): same-day rows would otherwise
          // resolve by arrival order — the first-row-wins guard below
          // then picks a deterministic representative
          val sorted = rows.toSeq.sortBy(e => (e.day, e.x, e.mu, e.sd))
          var st = state.getOption.getOrElse(CusumState(0.0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumOut]
          sorted.foreach { e =>
            if (e.day > st.lastDay) {
              val s = math.max(0.0, st.s + (e.x - e.mu - 0.5 * e.sd))
              st = CusumState(s, e.day)
              if (s > 2.0 * e.sd) out += CusumOut(key, e.day, s)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  // ---- T15: streaming space-saving heavy hitters ----------------------

  case class DocRow(source: String, text: String)

  case class SsIn(shard: String, item: String)
  case class SsState(items: Map[String, (Long, Long)])
  case class SsOut(shard: String, item: String, count: Long, err: Long)

  /** Streaming space-saving top-k (Metwally, Agrawal & El Abbadi
    * 2005): per-shard state holds at most `capacity`
    * (item → (count, overestimate)) counters. A tracked item
    * increments; an untracked item evicts the minimum counter and
    * inherits its count as the overestimate bound. Guarantees:
    * true ≤ count ≤ true + err, and any item with true frequency
    * > N/capacity is tracked — the streaming serving path of q118's
    * batch heavy-hitter report. Eviction picks the minimum by
    * (count, item) — deterministic under any arrival order of
    * bound-equal candidates. With capacity ≥ distinct items the
    * state degenerates to EXACT per-item counts, which is the
    * StreamingSpec differential gate (≡ batch groupBy count under
    * any batch split); the capacity-constrained bounds are asserted
    * separately.
    *
    * Scale: per-shard state is `capacity` counters FOREVER —
    * heavy-hitter tracking over unbounded item cardinality in
    * constant memory, the reason telemetry pipelines ship this
    * sketch instead of a streaming groupBy.
    */
  def spaceSavingTopK(ds: Dataset[SsIn], capacity: Int)(
      implicit spark: SparkSession): Dataset[SsOut] = {
    import spark.implicits._
    ds.groupByKey(_.shard)
      .flatMapGroupsWithState[SsState, SsOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: String, rows: Iterator[SsIn],
            state: GroupState[SsState]) =>
          var m = state.getOption.map(_.items).getOrElse(
            Map.empty[String, (Long, Long)])
          rows.foreach { r =>
            m.get(r.item) match {
              case Some((c, e)) => m = m.updated(r.item, (c + 1, e))
              case None if m.size < capacity =>
                m = m.updated(r.item, (1L, 0L))
              case None =>
                val (evict, (minC, _)) =
                  m.minBy { case (it, (c, _)) => (c, it) }
                m = (m - evict).updated(r.item, (minC + 1, minC))
            }
          }
          state.update(SsState(m))
          m.toSeq.sortBy { case (it, (c, _)) => (-c, it) }
            .map { case (it, (c, e)) => SsOut(shard, it, c, e) }
            .iterator
      }
  }

  /** T16: streaming Gopher repetition census — the q295 intra-doc
    * dup-n-gram filter run at INGEST, where the reference's quality
    * routing lives (README.md:239-263 validity gate shape). The
    * per-doc stage is stateless row math (HOF n-gram scan, integer
    * cross-multiplied flag); the census is a streaming groupBy whose
    * every column is a mergeable sum/count over per-doc 6dp decimals
    * (order-free by §7.4 construction) — so complete-mode state after
    * ANY batch split equals the batch census bit-for-bit
    * (StreamingSpec T16 differential vs the oracled q295). Uses the
    * SAME Queries66 stage functions, not a re-derivation.
    *
    * Scale: no per-key custom state — plain streaming aggregation
    * state of ≤|sources| rows per shard; the n-gram arrays live only
    * inside the row.
    */
  def repetitionCensus(docs: DataFrame): DataFrame =
    graft.Queries66.repCensus(graft.Queries66.repPerDoc(docs))

  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, withinSec: Long,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val renamed = right.columns.foldLeft(right)(
      (d, c) => d.withColumnRenamed(c, s"r_$c"))
    val r = renamed.withWatermark(s"r_$rightTs", watermark)
    l.join(r, col(key) === col(s"r_$key") &&
      col(s"r_$rightTs") >= col(leftTs) &&
      col(s"r_$rightTs") <= col(leftTs) + expr(s"INTERVAL $withinSec SECONDS"))
  }

  // ---- T1: exactly-once file pipeline ---------------------------------

  /** Run a streaming frame to parquet with checkpointing under
    * Trigger.AvailableNow — restart-safe, each input row lands exactly
    * once in the sink (checkpoint offsets + file-sink manifest).
    */
  def runToParquet(df: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
