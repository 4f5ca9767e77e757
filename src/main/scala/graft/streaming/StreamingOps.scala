package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-state extensions (SURVEY §2.8/§7 step 6): the reference
  * is a stateless delivery engine; these add the stateful streaming
  * operators a training-data pipeline needs, with watermark-bounded
  * state so they run indefinitely on unbounded streams.
  */
object StreamingOps {

  /** Committed-state resolution shared by the foreachBatch sinks:
    * the newest `batch=<id>` dir with id STRICTLY below the current
    * batch (a replay must not read its own partial output) carrying
    * the committer's `_SUCCESS` marker (a mid-write crash leaves a
    * marker-less dir that must never be read as state).
    */
  private[streaming] def latestCommittedDir(root: String,
                                            batchId: Long): Option[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix("batch=").toLong).toOption.map(_ -> f))
      .filter { case (id, f) =>
        id < batchId && new java.io.File(f, "_SUCCESS").isFile }
      .sortBy(_._1).lastOption.map { case (id, _) => s"$root/batch=$id" }
  }

  /** Exact streaming dedup on a content hash: watermark bounds the
    * dedup state (a key older than `delay` is forgotten — at 100 TB/day
    * unbounded dedup state is the first thing that falls over).
    */
  def dedupStream(df: DataFrame, eventTimeCol: String, delay: String,
                  keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicates(keyCols :+ eventTimeCol)

  /** Tumbling/sliding windowed aggregation with watermarking. */
  def windowedCounts(df: DataFrame, eventTimeCol: String, delay: String,
                     windowDuration: String, slide: Option[String] = None,
                     groupCols: Seq[String] = Nil): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(eventTimeCol), windowDuration, s)
      case None => window(col(eventTimeCol), windowDuration)
    }
    df.withWatermark(eventTimeCol, delay)
      .groupBy(w +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Session windows (gap-based) — the streaming analogue of the
    * q9_user_sessions batch query.
    */
  def sessionCounts(df: DataFrame, eventTimeCol: String, delay: String,
                    gap: String, keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(session_window(col(eventTimeCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))

  /** Streaming incremental dedup — the ingest-time twin of
    * `Dedup.incremental`: every arriving document is classified as
    * `kept` (first of its content anywhere), `dup_stream` (its content
    * arrived earlier on this stream), or `dup_history` (the content is
    * in the static historical corpus). History participates as a
    * digest set via a stream-static join (broadcast when small, else
    * a shuffle join the planner re-evaluates per micro-batch);
    * stream-side first-occurrence is one boolean of
    * `flatMapGroupsWithState` state per DISTINCT content digest.
    *
    * Scale shape: the state store holds 32-byte digests, not
    * documents, and only for content NOT already in history (history
    * dups resolve from the join alone). Within a micro-batch, copies
    * of the same digest classify by the MINIMUM doc_id (winner =
    * kept) — the batch operator's min-id rule. Iterator order inside
    * `flatMapGroupsWithState` is NOT guaranteed to be arrival order
    * after the group-by shuffle, so ranking by id is what makes the
    * within-batch winner deterministic on any partitioning.
    * State is unbounded by default (exactness — a duplicate is caught
    * no matter how old its first occurrence); pass `eventTimeCol` +
    * `horizon` for WATERMARK-DRIVEN TTL: the input is watermarked at
    * `horizon`, each digest's state carries an event-time timeout
    * refreshed to (that digest's latest event time + horizon), and a
    * digest unseen for a full horizon of event time is evicted when
    * the watermark passes it — state stays bounded by the horizon's
    * digest cardinality on a weeks-running 100 TB stream, and a
    * re-arrival AFTER eviction classifies `kept` again (the
    * documented finite-horizon semantics; verdicts INSIDE the horizon
    * are unchanged — the eviction spec proves both).
    */
  def incrementalDedup(stream: DataFrame, history: DataFrame,
                       idCol: String, textCol: String,
                       eventTimeCol: Option[String] = None,
                       horizon: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val hist = history.select(sha2(col(textCol), 256).as("h")).distinct()
      .withColumn("in_hist", lit(true))
    val in = eventTimeCol match {
      case Some(tc) => stream.withWatermark(tc, horizon)
      case None => stream
    }
    // no cast: withWatermark already requires TimestampType, and an
    // Alias only inherits the watermark metadata from a BARE attribute
    // (a cast in between would strip it and fail analysis)
    val et = eventTimeCol.map(col)
      .getOrElse(lit(null).cast("timestamp"))
    val flagged = in
      .select(col(idCol).as("doc_id"), sha2(col(textCol), 256).as("h"),
        et.as("_et"))
      .join(hist, Seq("h"), "left")
      .select(col("h"), col("doc_id"),
        coalesce(col("in_hist"), lit(false)).as("in_hist"), col("_et"))
      .as[(String, Long, Boolean, Option[java.sql.Timestamp])]
    val timeoutConf =
      if (eventTimeCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    flagged.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: String, rows: Iterator[(String, Long, Boolean, Option[java.sql.Timestamp])],
         state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            // horizon of event time elapsed with no arrival: forget
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(false)
            val batch = rows.toList
            // deterministic winner: min doc_id among the batch's
            // non-history copies (iterator order is shuffle-dependent)
            val fresh = batch.collect { case (_, id, false, _) => id }
            val winner = if (!seen && fresh.nonEmpty) Some(fresh.min) else None
            if (fresh.nonEmpty && !seen) state.update(true)
            if (state.exists && timeoutConf == GroupStateTimeout.EventTimeTimeout) {
              // sliding TTL: any arrival refreshes the digest's horizon.
              // Base clamped above the watermark — a straggler older
              // than the watermark must still set a LEGAL (future)
              // timeout rather than throw
              val maxEt = batch.flatMap(_._4).map(_.getTime).maxOption
              val wm = state.getCurrentWatermarkMs()
              maxEt.foreach(ms =>
                state.setTimeoutTimestamp(math.max(ms, wm + 1), horizon))
            }
            batch.iterator.map { case (_, id, inHist, _) =>
              val status =
                if (inHist) "dup_history"
                else if (winner.contains(id)) "kept"
                else "dup_stream"
              (id, status)
            }
          }
        })
      .toDF("doc_id", "status")
  }

  /** Streaming NEAR-dup classification against a static history — the
    * ingest-time twin of `Dedup.crossMinhashPairs` (re-crawl triage:
    * "is this arriving page a near-copy of anything we already
    * hold?"). Every arriving document is classified `kept` or
    * `near_dup_history` with the best exact Jaccard and the number of
    * verified history matches.
    *
    * Shape: MinHash-LSH banding on both sides; the history collapses
    * to its (band_id, band_hash) bucket table via
    * [[historyBucketTable]] — persisted here before the stream starts,
    * because a stream-static join re-evaluates an unpersisted static
    * side on EVERY micro-batch and re-shingling the whole history per
    * batch defeats the triage design. The persist is a deliberately
    * resident dimension (slim bucket rows, not documents) that lives
    * for the query; callers wanting explicit lifetime control build
    * the table themselves (write to storage, read back, pass to the
    * overload below). Arriving docs explode
    * to their 16 band rows, join candidate buckets, and verify with
    * the EXACT one-pass [[graft.analytics.HashFunctions.jaccard_sim]]
    * on the carried shingle arrays — LSH only generates candidates,
    * precision is exact. The per-doc verdict (ANY verified match) is
    * a `flatMapGroupsWithState` group fold over the doc's ≤ numBands
    * rows — a streaming aggregation in append mode without watermark
    * gymnastics, no state retained (a doc's rows all land in its own
    * micro-batch).
    *
    * Scale notes: history buckets larger than `maxBucket` are DROPPED
    * (standard LSH hot-bucket hygiene — a degenerate band value would
    * otherwise multiply every arriving doc by the bucket size; recall
    * for such docs rests on their other 15 bands, the
    * boundedSelfPairs rationale). Within-stream near-dup state is
    * deliberately out of scope — compose with [[incrementalDedup]]
    * for exact within-stream dedup, or run the batch operator over
    * completed partitions.
    */
  def nearDupAgainstHistory(stream: DataFrame, history: DataFrame,
                            idCol: String, textCol: String,
                            shingleSize: Int = 3, numHashes: Int = 128,
                            numBands: Int = 16, threshold: Double = 0.5,
                            maxBucket: Int = 4096): DataFrame = {
    // materialize once, serve every micro-batch from memory/disk —
    // without this, Spark re-runs the full shingle+minhash+bucket-size
    // aggregation of the history on every batch
    val histBounded = historyBucketTable(history, idCol, textCol,
      shingleSize, numHashes, numBands, maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nearDupAgainstHistory(stream, histBounded, idCol, textCol,
      shingleSize, numHashes, numBands, threshold)
  }

  /** The static-side bucket table for [[nearDupAgainstHistory]]: one
    * slim row per (band_id, band_hash, hist_id) with the doc's shingle
    * array for exact verification; buckets larger than `maxBucket`
    * dropped (LSH hot-bucket hygiene). Build it once, write it to
    * storage (or persist), and pass it to the overload below to control
    * the materialization lifetime yourself — e.g. refresh nightly while
    * the triage stream keeps running.
    */
  def historyBucketTable(history: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 3, numHashes: Int = 128,
                         numBands: Int = 16, maxBucket: Int = 4096): DataFrame = {
    import graft.analytics.HashFunctions.{word_shingles, minhash_bands}
    val histSigned = history.select(col(idCol).as("hist_id"),
        word_shingles(col(textCol), shingleSize).as("sh_h"))
      .select(col("hist_id"), col("sh_h"),
        minhash_bands(col("sh_h"), numHashes, numBands).as("bands"))
      .groupBy(col("hist_id")).agg(first(col("sh_h")).as("sh_h"),
        first(col("bands")).as("bands"))
    val histBuckets = histSigned
      .select(col("hist_id"), col("sh_h"),
        posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    val bucketSizes = histBuckets.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("_bsz"))
    histBuckets.join(bucketSizes, Seq("band_id", "band_hash"))
      .filter(col("_bsz") <= maxBucket).drop("_bsz")
  }

  /** [[nearDupAgainstHistory]] against a PREBUILT bucket table
    * ([[historyBucketTable]] output, materialized by the caller).
    */
  def nearDupAgainstHistory(stream: DataFrame, histBounded: DataFrame,
                            idCol: String, textCol: String,
                            shingleSize: Int, numHashes: Int,
                            numBands: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.analytics.HashFunctions.{word_shingles, minhash_bands, jaccard_sim}
    val spark = stream.sparkSession
    import spark.implicits._

    // stream side: shingles materialized below the posexplode barrier
    // so the verify condition can't inline re-tokenization per match
    val streamExploded = stream
      .select(col(idCol).as("doc_id"),
        word_shingles(col(textCol), shingleSize).as("sh_s"))
      .select(col("doc_id"), col("sh_s"),
        minhash_bands(col("sh_s"), numHashes, numBands).as("bands"))
      .select(col("doc_id"), col("sh_s"),
        posexplode_outer(col("bands")).as(Seq("band_id", "band_hash")))

    val candidates = streamExploded
      .join(histBounded, Seq("band_id", "band_hash"), "left")
      .select(col("doc_id"),
        when(col("hist_id").isNotNull,
          jaccard_sim(col("sh_s"), col("sh_h"))).as("j"),
        col("hist_id"))
      .select(col("doc_id"),
        (col("j").isNotNull && col("j") >= threshold).as("hit"),
        when(col("j").isNotNull && col("j") >= threshold, col("j")).as("j"),
        when(col("j").isNotNull && col("j") >= threshold, col("hist_id")).as("hist_id"))
      .as[(Long, Boolean, Option[Double], Option[Long])]

    candidates.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (doc: Long, rows: Iterator[(Long, Boolean, Option[Double], Option[Long])],
         _: GroupState[Boolean]) => {
          var best = Double.NaN
          val seen = scala.collection.mutable.Set.empty[Long]
          rows.foreach { case (_, hit, j, h) =>
            if (hit) {
              h.foreach(seen += _)
              j.foreach(x => if (best.isNaN || x > best) best = x)
            }
          }
          Iterator.single((doc,
            if (seen.nonEmpty) "near_dup_history" else "kept",
            if (best.isNaN) None else Some(best),
            seen.size.toLong))
        })
      .toDF("doc_id", "status", "best_jaccard", "n_matches")
  }

  /** Streaming gap sessionization — the ingest-time twin of
    * [[graft.analytics.Temporal.sessionize]]: every arriving event is
    * assigned its key's 1-based session ordinal, with sessions that
    * SPAN micro-batch boundaries numbered continuously (the state is
    * one (last event time, current ordinal) pair per key — 16 bytes,
    * not the session's events). Within a batch a key's events are
    * sorted by (time, tie) before folding, so intra-batch order is
    * deterministic on any partitioning; ACROSS batches events must
    * arrive in nondecreasing time order per key (the micro-batch
    * pipeline's natural order — replaying out-of-order history is the
    * batch operator's job). Output matches the batch operator exactly
    * on an in-order stream, which is how the gate row oracles it.
    *
    * Key, time and tie columns must be long-castable; output is
    * (keyCol, tsCol, tieCol, session_seq).
    */
  /** `eventTimeCol` + `ttl`: optional watermark-driven state TTL, the
    * same mechanics as [[compactLatest]]'s — a key quiet for a full
    * ttl of EVENT time is evicted once the watermark passes. With
    * ttl ≥ the session gap, eviction cannot move a session BOUNDARY
    * (the next event would have opened a new session anyway); the
    * only trade is that the evicted key's per-key ordinal restarts at
    * 1 instead of continuing — which is why the gate row runs without
    * TTL (exact ordinal parity with the batch operator) and a
    * weeks-running 100 TB stream runs with it (16 bytes per key
    * FOREVER is the alternative).
    */
  def sessionizeStream(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, gapSeconds: Long,
                       eventTimeCol: Option[String] = None,
                       ttl: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val in = eventTimeCol match {
      case Some(tc) => df.withWatermark(tc, ttl)
      case None => df
    }
    val et = eventTimeCol.map(col).getOrElse(lit(null).cast("timestamp"))
    val timeoutConf =
      if (eventTimeCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    in.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
        col(tieCol).cast("long"), et.as("_et"))
      .as[(Long, Long, Long, Option[java.sql.Timestamp])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (k: Long, rows: Iterator[(Long, Long, Long, Option[java.sql.Timestamp])],
         state: GroupState[(Long, Long)]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = rows.toArray.sortBy(e => (e._2, e._3))
            var (lastTs, seq) = state.getOption.getOrElse((0L, 0L))
            val out = evs.map { case (_, ts, tie, _) =>
              if (seq == 0L || ts - lastTs > gapSeconds) seq += 1
              lastTs = ts
              (k, ts, tie, seq)
            }
            if (evs.nonEmpty) {
              state.update((lastTs, seq))
              if (timeoutConf == GroupStateTimeout.EventTimeTimeout) {
                val wm = state.getCurrentWatermarkMs()
                evs.flatMap(_._4).map(_.getTime).maxOption.foreach(ms =>
                  state.setTimeoutTimestamp(math.max(ms, wm + 1), ttl))
              }
            }
            out.iterator
          }
        })
      .toDF(keyCol, tsCol, tieCol, "session_seq")
  }

  /** Streaming funnel progression — the ingest-time twin of
    * [[graft.analytics.Temporal.funnelSteps]]: per key, the greedy
    * min-cascade fold (advance to step i+1 on the first step-(i+1)
    * event at-or-after step i's time) continues ACROSS micro-batches;
    * state is (steps_reached, reached-step times) — a few dozen
    * bytes per key, never the key's events. Within a batch the key's
    * events sort by (time, step index) exactly like the batch
    * operator; across batches events must arrive in nondecreasing
    * time order per key (the micro-batch pipeline's natural order).
    *
    * Emits the key's CURRENT (steps_reached, step_times) whenever it
    * receives events (Update-mode semantics). steps_reached is
    * monotone and a reached step's time never changes, so the final
    * funnel table is `max(struct(steps_reached, times…))` per key —
    * which is how the gate row reduces the update stream, and why it
    * can be oracle-checked against the batch min-cascade join chain.
    *
    * Key and time must be long-castable; output is
    * (keyCol, steps_reached, step_times).
    *
    * `eventTimeCol` + `ttl`: optional watermark-driven state TTL, the
    * same mechanics as [[sessionizeStream]]'s — a key quiet for a
    * full ttl of EVENT time is evicted once the watermark passes
    * (EventTimeTimeout with the straggler-safe clamp: the timeout
    * target is max(batch-max event time, watermark + 1) + ttl, so a
    * late batch can never request a timestamp the store rejects).
    * Eviction forgets a dormant key's funnel progress — events
    * arriving after eviction restart it at step 0 — so pick ttl ≥
    * the funnel's conversion window; within the horizon, emitted
    * (steps_reached, step_times) are UNCHANGED by TTL (the gate row
    * runs without it for exact batch parity, a weeks-running stream
    * runs with it because per-key state forever is the alternative).
    */
  def funnelStepsStream(df: DataFrame, keyCol: String, typeCol: String,
                        timeCol: String, steps: Seq[String],
                        eventTimeCol: Option[String] = None,
                        ttl: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps must be non-empty and distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val idxCol = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i + 1)).otherwise(acc)
    }
    val in = eventTimeCol match {
      case Some(tc) => df.withWatermark(tc, ttl)
      case None => df
    }
    val et = eventTimeCol.map(col).getOrElse(lit(null).cast("timestamp"))
    val timeoutConf =
      if (eventTimeCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    in.select(col(keyCol).cast("long"), col(timeCol).cast("long"),
        idxCol.as("_si"), et.as("_et"))
      .filter(col("_si").isNotNull)
      .as[(Long, Long, Int, Option[java.sql.Timestamp])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        (k: Long, rows: Iterator[(Long, Long, Int, Option[java.sql.Timestamp])],
         state: GroupState[(Int, Seq[Long])]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (r, ts) = state.getOption.getOrElse((0, Seq.empty[Long]))
            // same tie order as the batch fold: earlier step sorts first
            // at an equal instant, so a later step CAN be reached at the
            // same time as its predecessor
            val evs = rows.toArray.sortBy(e => (e._2, e._3))
            evs.foreach { case (_, t, si, _) =>
              if (si == r + 1) { r += 1; ts = ts :+ t }
            }
            state.update((r, ts))
            if (timeoutConf == GroupStateTimeout.EventTimeTimeout) {
              val wm = state.getCurrentWatermarkMs()
              evs.flatMap(_._4).map(_.getTime).maxOption.foreach(ms =>
                state.setTimeoutTimestamp(math.max(ms, wm + 1), ttl))
            }
            Iterator.single((k, r, ts))
          }
        })
      .toDF(keyCol, "steps_reached", "step_times")
  }

  /** One compacted row per key: (key, operation, position, payload). */
  case class CompactedRecord(key: String, operation: String,
                             position: String, payload_after: String)

  /** Streaming CDC compaction via `flatMapGroupsWithState`: materialize
    * the LATEST record per key from a create/update/delete stream (the
    * consumer-side table view of the CDC sources). State = one
    * (position, payload) per live key — a delete emits a tombstone and
    * CLEARS the state, so the state store tracks live keys only, not
    * history. Positions compare as (length, bytes), numeric order for
    * every builtin source's digit-string positions; a stale redelivery
    * (at-least-once) never overwrites a newer state entry.
    */
  /** Streaming materialized-view maintenance: a foreachBatch sink
    * that keeps BOTH a compacted key→latest-row table and a grouped
    * (count, sum) aggregate view continuously up to date from a CDC
    * delta stream — the streaming twin of
    * [[graft.model.Cdc.maintainGroupedAgg]] exactly as
    * [[compactLatest]] twins [[graft.model.Cdc.materializeLatest]].
    *
    * Per micro-batch: view' = maintainGroupedAgg(view, base, batch)
    * (delta processing only — the base is touched by one semi-join
    * prune, never re-aggregated) and base' = materializeLatest(base ∪
    * batch) (base rows carry their original order columns, so stale
    * redeliveries lose to the state they would regress). Both land in
    * `batch=<id>` subdirectories; batch n reads its inputs ONLY from
    * committed (`_SUCCESS`-marked) dirs with id < n, so a foreachBatch
    * replay of batch n after a crash — even a crash BETWEEN the view
    * write and the base write — recomputes from exactly the same
    * pre-n state and overwrites its own partial output (idempotent
    * restart); a mid-write partial dir can never be mistaken for
    * committed state. Readers use the same committed-only rule.
    *
    * At 100 TB the view stays metadata-sized while the base rewrite
    * is the same cost envelope as any compacted streaming table; swap
    * the parquet-dir base for a keyed store (Delta/Iceberg upsert)
    * without touching the maintenance math.
    */
  def viewMaintenanceSink(
      viewDir: String,
      baseDir: String,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String,
      groupExpr: Column,
      valueExpr: Column): (DataFrame, Long) => Unit = {

    (batch: DataFrame, batchId: Long) => {
      def latestDir(root: String): Option[String] =
        latestCommittedDir(root, batchId)
      val spark = batch.sparkSession
      val base = latestDir(baseDir).map(spark.read.parquet(_))
        .getOrElse(batch.limit(0))
      // redelivery guard: a delta row at-or-below the base row's order
      // would regress the VIEW while materializeLatest keeps the newer
      // base row — drop stale rows so view and base stay consistent
      // (maintainGroupedAgg's batch contract assumes delta > snapshot)
      val bOrd = struct(orderCols.map(col): _*)
      val bKeyed = base.select(
        (keyCols.map(col) :+ bOrd.as("_bord")): _*)
      val guarded = batch.join(bKeyed, keyCols, "left")
        .filter(col("_bord").isNull || bOrd > col("_bord"))
        .drop("_bord")
      val aggOf = (df: DataFrame) => df.groupBy(groupExpr.as("g"))
        .agg(count(lit(1)).as("cnt"), sum(valueExpr).as("sv"))
      val view = latestDir(viewDir).map(spark.read.parquet(_))
        .getOrElse(aggOf(base))
      val v1 = graft.model.Cdc.maintainGroupedAgg(view, base, guarded,
        keyCols, orderCols.map(col), opCol, groupExpr, valueExpr)
      val b1 = graft.model.Cdc.materializeLatest(
        base.unionByName(guarded), keyCols, orderCols.map(col), opCol)
      // pin the stored sum dtype to the canonical aggregate type —
      // decimal addition otherwise widens precision every batch
      val sumType = aggOf(base.limit(0)).schema("sv").dataType
      val v1Stable = v1.select(col(v1.columns(0)), col(v1.columns(1)),
        col(v1.columns(2)).cast(sumType).as("sv"))
      v1Stable.write.mode("overwrite").parquet(s"$viewDir/batch=$batchId")
      b1.write.mode("overwrite").parquet(s"$baseDir/batch=$batchId")
    }
  }

  /** Streaming HLL maintenance — the sketch twin of
    * [[viewMaintenanceSink]]: each micro-batch is hashed into a
    * register table once and min-MERGED into the committed register
    * state ([[graft.analytics.Sketch.hllMerge]] — the same merge law
    * the `sketch_hll_union` gate row proves bit-exact), so the
    * running distinct-count state stays ≤ groups × 2^p rows no matter
    * how much stream has passed. `batch=` versioning + `_SUCCESS`
    * committed-only reads make replays idempotent (min-merge is
    * itself idempotent, so even a double-applied batch cannot corrupt
    * the registers — the versioning guards against PARTIAL writes,
    * not double counts). Estimate any committed state with
    * [[graft.analytics.Sketch.hllEstimate]].
    */
  def hllRegisterSink(
      stateDir: String,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 12,
      seed: Long = 7L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newRegs = graft.analytics.Sketch.hllRegisters(
        batch, groupCols, valueCol, p, seed)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => graft.analytics.Sketch.hllMerge(
          Seq(spark.read.parquet(prev), newRegs), groupCols)
        case None => newRegs
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming Bloom maintenance — the membership sibling of
    * [[hllRegisterSink]]: each micro-batch's word table
    * ([[graft.analytics.Sketch.bloomWords]]) OR-merges into the
    * committed state via [[graft.analytics.Sketch.bloomMerge]]. OR is
    * idempotent AND associative, so the state after any prefix of the
    * stream equals the batch filter of that prefix exactly (the
    * `sketch_bloom_stream` gate row proves the law bit-for-bit) and
    * foreachBatch replays are harmless. State is ≤ mBits/64 word rows
    * forever — the cross-batch "seen before?" primitive for ingest
    * dedup at 100 TB (probe with
    * [[graft.analytics.Sketch.bloomProbe]]; no false negatives).
    */
  def bloomSink(
      stateDir: String,
      itemCol: String,
      mBits: Int = 1 << 16,
      kHashes: Int = 4,
      seed: Long = 7L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newWords = graft.analytics.Sketch.bloomWords(
        batch, itemCol, mBits, kHashes, seed)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => graft.analytics.Sketch.bloomMerge(
          Seq(spark.read.parquet(prev), newWords))
        case None => newWords
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Append sink for BATCH-DECOMPOSABLE row-local transforms (quality
    * scoring, hash-gate sampling, PII redaction, fingerprinting): each
    * micro-batch maps through `fn` independently, and because the
    * transform reads nothing but the row, the appended union over ANY
    * batch split equals the one-shot batch run — the law the
    * `text_quality_stream` / `sample_hash_stream` gate rows prove
    * bit-for-bit. Per-batch `b<id>` dirs give replay idempotence (a
    * replayed batch overwrites its own output).
    */
  def rowLocalSink(outDir: String)(fn: DataFrame => DataFrame): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      fn(batch).write.mode("overwrite").parquet(s"$outDir/b$batchId")

  /** Streaming winnowing triage against a FIXED fingerprint history
    * ([[graft.analytics.Dedup.winnowHistoryPostings]], built once and
    * persisted/stored by the caller — refresh it on your own schedule
    * while the stream runs, the [[historyBucketTable]] contract): each
    * micro-batch winnows its own documents and counts shared df-capped
    * fingerprints per (doc, history doc). Per-DOC decomposable — a
    * doc's fingerprints derive from its text alone and the history
    * (including its boilerplate cap) is fixed, so the appended union
    * over any batch split equals the one-shot
    * [[graft.analytics.Dedup.crossWinnowPairs]] run — the
    * `dedup_winnow_stream` gate row proves it against the batch
    * oracle. Per-batch `b<id>` dirs give replay idempotence.
    */
  def winnowTriageSink(outDir: String, histPostings: DataFrame,
                       idCol: String, textCol: String, k: Int = 4,
                       w: Int = 8, minShared: Int = 2): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      graft.analytics.Dedup.crossWinnowPairs(batch, histPostings,
          idCol, textCol, k, w, minShared)
        .write.mode("overwrite").parquet(s"$outDir/b$batchId")

  /** Streaming URL-dedup maintenance: canonicalization
    * ([[graft.analytics.Urls.canonicalize]]) is row-local and appends
    * per batch; the keeper vote is a (canonical_url → min id) state
    * min-merged across batches — min is idempotent AND associative,
    * so the committed state after any stream prefix equals the batch
    * vote over that prefix (the `dedup_url_stream` gate row proves it
    * by joining the appended rows to the final state). This is the
    * crawl-ingest "have I seen this page?" primitive: state is one
    * row per distinct canonical URL, never the documents.
    */
  def urlDedupSink(rowsDir: String, stateDir: String, idCol: String,
                   urlCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val canon = batch.select(col(idCol), col(urlCol),
        graft.analytics.Urls.canonicalize(col(urlCol)).as("canonical_url"))
      canon.write.mode("overwrite").parquet(s"$rowsDir/b$batchId")
      val newState = canon.groupBy(col("canonical_url"))
        .agg(min(col(idCol)).as("keep_id"))
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newState)
          .groupBy(col("canonical_url")).agg(min(col("keep_id")).as("keep_id"))
        case None => newState
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }

  /** Stream-static fuzzy linkage: each micro-batch of records
    * JW-matches the static master table through
    * [[graft.analytics.Linkage.fuzzyLinks]]' non-self path (the
    * blocked, maxBlock-capped join), appending matched pairs per
    * batch. A record's matches depend only on itself and the master,
    * so the appended union over ANY batch split equals the one-shot
    * batch run over the whole stream — the law the `link_jw_stream`
    * gate row proves bit-for-bit. The block-size aggregation inside
    * the bounded join is why this runs in foreachBatch rather than as
    * a stream-static transform (aggregate-then-join is restricted on
    * streaming DataFrames).
    */
  def fuzzyLinkSink(
      master: DataFrame,
      idCol: String,
      blockCol: String,
      textCol: String,
      minSim: Double,
      outDir: String,
      maxBlock: Int = 10000): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      graft.analytics.Linkage.fuzzyLinks(batch, master, idCol, idCol,
        blockCol, textCol, minSim, selfPairs = false, maxBlock)
        .write.mode("overwrite").parquet(s"$outDir/b$batchId")

  /** Streaming KMV maintenance — the k-minimum-values sibling of
    * [[hllRegisterSink]]: each micro-batch's KMV state
    * ([[graft.analytics.Sketch.kmvState]]) min-merges into the
    * committed state via [[graft.analytics.Sketch.kmvMerge]]. The
    * k-smallest-of-a-union law makes the merge idempotent AND
    * associative, so the state after any prefix of the stream equals
    * the batch sketch of that prefix exactly (the merge law the
    * `sketch_kmv_stream` gate row proves bit-for-bit); `batch=`
    * versioning + `_SUCCESS` committed-only reads give replay
    * safety. State is ≤ groups × k hash rows forever.
    */
  def kmvSink(
      stateDir: String,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 256,
      seed: Long = 7L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newState = graft.analytics.Sketch.kmvState(
        batch, groupCols, valueCol, k, seed)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => graft.analytics.Sketch.kmvMerge(
          Seq(spark.read.parquet(prev), newState), groupCols, k)
        case None => newState
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming KLL maintenance — the quantile sibling of [[kmvSink]]:
    * each micro-batch's KLL state
    * ([[graft.analytics.Sketch.kllState]]) merges into the committed
    * state via [[graft.analytics.Sketch.kllMerge]]. Item levels are
    * per-row hash coins, so the merged state after any prefix of the
    * stream is bit-identical to the batch sketch of that prefix (the
    * law the `sketch_kll_stream` gate row proves); `batch=`
    * versioning + `_SUCCESS` committed-only reads keep foreachBatch
    * replays safe (exact counts re-add from the same pre-batch
    * state). State stays ≤ ~2k rows per group forever.
    */
  def kllSink(
      stateDir: String,
      groupCols: Seq[String],
      valueCol: String,
      idCol: String,
      k: Int = 256,
      seed: Long = 7L): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newState = graft.analytics.Sketch.kllState(
        batch, groupCols, valueCol, idCol, k, seed)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => graft.analytics.Sketch.kllMerge(
          Seq(spark.read.parquet(prev), newState), groupCols, k)
        case None => newState
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming count-min maintenance — the additive sibling of
    * [[hllRegisterSink]]: each micro-batch's token counts become a
    * depth×width counter table ([[graft.analytics.Sketch.cmsCounters]])
    * SUMMED into the committed state. Counter addition is linear, so
    * the state after any prefix of the stream equals the batch sketch
    * of that prefix exactly — the merge law the `sketch_cm_stream`
    * gate row proves bit-for-bit. Unlike the HLL min-merge, addition
    * is NOT idempotent, so the `batch=` versioning + `_SUCCESS`
    * committed-only reads here are what make foreachBatch replays
    * safe (a re-run of batch n recomputes from the same pre-n state).
    * State is ≤ depth × width rows — constant — no matter how much
    * stream has passed.
    */
  def cmsCounterSink(
      stateDir: String,
      itemCol: String,
      depth: Int = 4,
      width: Int = 1024): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val counts = batch.groupBy(col(itemCol))
        .agg(count(lit(1)).as("_n"))
      val newC = graft.analytics.Sketch.cmsCounters(
        counts, itemCol, "_n", depth, width)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newC)
          .groupBy(col("_row"), col("_idx"))
          .agg(sum(col("_c")).as("_c"))
        case None => newC
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Incremental JOIN view maintenance for two INSERT-ONLY sides —
    * the delta-join rule (classic IVM, e.g. Gupta & Mumick's survey):
    * with batch deltas ΔL, ΔR against accumulated sides L, R,
    *
    *   Δ(L ⋈ R) = ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR
    *
    * so each micro-batch touches delta-sized join probes instead of
    * recomputing the join — the aggregate-view sibling is
    * [[viewMaintenanceSink]]. The stream carries both sides tagged by
    * `_side` ('l'/'r'), each projected to the other side's columns as
    * nulls; the view appends its delta; sides append their rows.
    * `batch=` + `_SUCCESS` committed-only reads make replays
    * recompute from the same pre-batch state (idempotent restarts).
    *
    * Scale: per batch, two delta×accumulated probes (broadcast the
    * delta side) + one delta×delta. The full-history rewrite per
    * batch is the parquet-dir simplification — swap for appendable
    * storage exactly like scd2Sink's note says.
    */
  def joinViewSink(
      stateDir: String,
      keyCol: String,
      leftCols: Seq[String],
      rightCols: Seq[String]): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val dl = batch.filter(col("_side") === "l")
        .select(col(keyCol) +: leftCols.map(col): _*)
      val dr = batch.filter(col("_side") === "r")
        .select(col(keyCol) +: rightCols.map(col): _*)
      val prevL = latestCommittedDir(s"$stateDir/left", batchId)
        .map(spark.read.parquet(_)).getOrElse(dl.limit(0))
      val prevR = latestCommittedDir(s"$stateDir/right", batchId)
        .map(spark.read.parquet(_)).getOrElse(dr.limit(0))
      val prevV = latestCommittedDir(s"$stateDir/view", batchId)
      // the delta-join rule's asymmetry in executable form (guide §3.1):
      // ΔL and ΔR are batch-sized while L and R accumulate the whole
      // stream, so each delta×accumulated probe BROADCASTS the delta —
      // without the hint the planner's size estimate of the fresh
      // micro-batch side is unreliable and a sort-merge join would
      // shuffle the full accumulated side every batch
      val delta = broadcast(dl).join(prevR, keyCol)
        .unionByName(prevL.join(broadcast(dr), keyCol))
        .unionByName(broadcast(dl).join(dr, keyCol))
      val view = prevV match {
        case Some(p) => spark.read.parquet(p).unionByName(delta)
        case None => delta
      }
      view.write.mode("overwrite")
        .parquet(s"$stateDir/view/batch=$batchId")
      prevL.unionByName(dl).write.mode("overwrite")
        .parquet(s"$stateDir/left/batch=$batchId")
      prevR.unionByName(dr).write.mode("overwrite")
        .parquet(s"$stateDir/right/batch=$batchId")
    }
  }

  /** Streaming histogram maintenance — the third additive sketch sink
    * beside [[hllRegisterSink]] (min-merge) and [[cmsCounterSink]]
    * (sum-merge): per-batch [[graft.analytics.Sketch.histogramBins]]
    * summed into the committed state via
    * [[graft.analytics.Sketch.histogramMerge]], so the state after
    * any stream prefix equals the batch sketch of that prefix and
    * quantiles are one [[graft.analytics.Sketch.histogramQuantilesFromBins]]
    * call away at any moment. State ≤ groups × bins rows; the same
    * `batch=` + `_SUCCESS` guard makes non-idempotent sum replays
    * safe.
    */
  /** Streaming mixture-divergence monitor — the fourth additive sketch
    * sink: per-batch per-stratum TOKEN sums merged (sum-merge, like
    * [[cmsCounterSink]]) into the committed (stratum, target, tokens)
    * state, so KL(realized‖target) after any stream prefix — one
    * [[graft.analytics.Sampling.mixtureKlFromCounts]] call over the
    * state — equals the batch verdict over that prefix. State ≤
    * |targets| rows; the same `batch=` + `_SUCCESS` guard makes
    * non-idempotent sum replays safe. The drift alarm a pretraining
    * ingest runs continuously: fire when kl_term moves.
    */
  def mixtureKlSink(
      stateDir: String,
      strataCol: String,
      tokensCol: String,
      targets: Seq[(String, Double)]): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      import spark.implicits._
      val tDf = broadcast(targets.toDF(strataCol, "target"))
      val newC = batch.join(tDf, strataCol)
        .groupBy(col(strataCol), col("target"))
        .agg(sum(col(tokensCol)).cast("long").as("tokens"))
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newC)
          .groupBy(col(strataCol), col("target"))
          .agg(sum(col("tokens")).cast("long").as("tokens"))
        case None => newC
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming per-stratum token totals — the sum-merged
    * (stratum, n_tokens) frame [[graft.analytics.Sampling
    * .unimaxFromCounts]] plans from: each micro-batch's per-stratum
    * sums merge into the committed state by addition, which is
    * order-insensitive, so the state after any prefix equals the
    * batch aggregate over that prefix. State size = |strata|
    * (languages/domains), constant per batch.
    */
  def stratumSumSink(
      stateDir: String,
      strataCol: String,
      tokensCol: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newC = batch.filter(col(strataCol).isNotNull)
        .groupBy(col(strataCol).cast("string").as("stratum"))
        .agg(sum(col(tokensCol).cast("long")).cast("long").as("n_tokens"))
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newC)
          .groupBy(col("stratum"))
          .agg(sum(col("n_tokens")).cast("long").as("n_tokens"))
        case None => newC
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming keyed mean state — sum/count pairs per (domain, step)
    * key, the frame [[graft.analytics.Sampling.doremiFromLosses]]
    * reads (loss = s/n at read time): both components merge by
    * addition, which is order-insensitive, so the state after any
    * prefix equals the batch aggregate over that prefix. State size =
    * |domains|×|steps| (training checkpoints), constant per batch.
    */
  def keyedMeanSink(
      stateDir: String,
      domainCol: String,
      stepCol: String,
      valueCol: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newC = batch
        .filter(col(domainCol).isNotNull && col(stepCol).isNotNull)
        .groupBy(col(domainCol).cast("string").as("domain"),
          col(stepCol).cast("long").as("step"))
        .agg(sum(col(valueCol).cast("double")).as("s"),
          count(lit(1)).cast("long").as("n"))
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newC)
          .groupBy(col("domain"), col("step"))
          .agg(sum(col("s")).as("s"), sum(col("n")).cast("long").as("n"))
        case None => newC
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming vocabulary maintenance — sum-merged (token, freq)
    * state from each batch's [[graft.analytics.Text.vocab]] counts
    * (minCount 1 INTO the state: a threshold applied per batch would
    * drop tokens whose total crosses it across batches; filter at
    * read time instead). The corpus-health monitor's feed: Zipf slope
    * after any stream prefix is one
    * [[graft.analytics.Text.zipfFitFromCounts]] call over the state
    * and equals the batch fit of that prefix. State = the vocabulary
    * (sublinear in the corpus, Heaps' law); the `batch=` + `_SUCCESS`
    * guard makes non-idempotent sum replays safe.
    */
  def vocabCountSink(
      stateDir: String,
      textCol: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newV = graft.analytics.Text.vocab(batch, textCol, minCount = 1)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newV)
          .groupBy(col("token"))
          .agg(sum(col("freq")).cast("long").as("freq"))
        case None => newV
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming stratum-keyed token counts — the
    * [[graft.analytics.Text.stratumTokenCounts]] frame maintained
    * across micro-batches by sum-merge (order-insensitive, so the
    * state after any stream prefix equals the one-shot batch
    * aggregate over that prefix). Feed the committed state to
    * [[graft.analytics.Text.jsDivergenceFromCounts]] for a live
    * slice-divergence monitor: is today's crawl drifting from the
    * reference mixture? State size = distinct (stratum, token) —
    * Heaps-law sublinear; `batch=` + `_SUCCESS` keeps replays
    * idempotent.
    */
  def stratumCountSink(
      stateDir: String,
      stratumCol: String,
      textCol: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newC = graft.analytics.Text.stratumTokenCounts(
        batch, stratumCol, textCol)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newC)
          .groupBy(col("stratum"), col("tok"))
          .agg(sum(col("c")).cast("long").as("c"))
        case None => newC
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming exact-dedup state — the content-hash registry of
    * [[graft.analytics.Dedup.exact]] maintained across micro-batches:
    * per sha-256 digest, the smallest id seen so far and the running
    * duplicate count. Both merge laws are order-insensitive
    * (min ∘ min = min, sum ∘ count = count), so the state after any
    * stream prefix equals the one-shot batch vote over that prefix —
    * the at-least-once crawl-ingest dedup ledger. State size = one
    * row per DISTINCT content (sublinear in a duplicate-bearing
    * corpus); the `batch=` + `_SUCCESS` guard makes sum replays
    * idempotent on restart.
    */
  def exactDedupSink(
      stateDir: String,
      idCol: String,
      textCol: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newS = batch.groupBy(sha2(col(textCol), 256).as("content_hash"))
        .agg(min(col(idCol)).as("keep_id"),
          count(lit(1)).cast("long").as("dup_count"))
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => spark.read.parquet(prev).unionByName(newS)
          .groupBy(col("content_hash"))
          .agg(min(col("keep_id")).as("keep_id"),
            sum(col("dup_count")).cast("long").as("dup_count"))
        case None => newS
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  def histogramBinSink(
      stateDir: String,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      width: Double,
      bins: Int): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val newH = graft.analytics.Sketch.histogramBins(
        batch, groupCols, valueCol, lo, width, bins)
      val merged = latestCommittedDir(stateDir, batchId) match {
        case Some(prev) => graft.analytics.Sketch.histogramMerge(
          Seq(spark.read.parquet(prev), newH), groupCols)
        case None => newH
      }
      merged.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** Streaming SCD Type-2 maintenance — the incremental twin of
    * [[graft.model.Cdc.scd2]]: the committed state is the full
    * version history; each micro-batch chains its own versions
    * (within-batch [[graft.model.Cdc.scd2]]), closes the state's open
    * versions at the batch's first change per key, and appends.
    * Batch positions must be at-or-after the state's per key —
    * stale redeliveries (a position at or below the key's newest
    * `valid_from`) are DROPPED by the same order guard
    * [[viewMaintenanceSink]] uses, so at-least-once delivery cannot
    * re-open closed history. `batch=` versioning + committed-only
    * reads give idempotent restarts.
    *
    * Scale: the state append is delta-sized; the close touches only
    * keys present in the batch (semi-join shape). The full-history
    * rewrite per batch is the parquet-dir simplification — swap for a
    * keyed upsert store exactly like viewMaintenanceSink's base.
    */
  def scd2Sink(
      stateDir: String,
      keyCols: Seq[String],
      orderCols: Seq[String],
      posCol: String,
      opCol: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val prev = latestCommittedDir(stateDir, batchId)
        .map(spark.read.parquet(_))
      val versions = prev.getOrElse {
        graft.model.Cdc.scd2(batch.limit(0), keyCols,
          orderCols.map(col), col(posCol), opCol)
      }
      // stale-redelivery guard: the newest version start per key is
      // the high-water mark; batch rows at or below it were processed
      val hwm = versions.groupBy(keyCols.map(col): _*)
        .agg(max(col("valid_from")).as("_hwm"))
      val guarded = batch.join(hwm, keyCols, "left")
        .filter(col("_hwm").isNull || col(posCol) > col("_hwm"))
        .drop("_hwm")
      val dNew = graft.model.Cdc.scd2(guarded, keyCols,
        orderCols.map(col), col(posCol), opCol)
      val firstPerKey = guarded.groupBy(keyCols.map(col): _*)
        .agg(min(col(posCol)).as("_fp"))
      val closed = versions.join(firstPerKey, keyCols, "left")
        .withColumn("valid_to",
          when(col("is_current") && col("_fp").isNotNull, col("_fp"))
            .otherwise(col("valid_to")))
        .withColumn("is_current", col("is_current") && col("_fp").isNull)
        .drop("_fp")
      closed.unionByName(dNew)
        .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    }
  }

  /** `eventTimeCol` + `ttl`: optional WATERMARK-DRIVEN TTL for the
    * per-key state — the input is watermarked at `ttl`, every arrival
    * refreshes its key's event-time timeout to (arrival time + ttl),
    * and a key quiet for a full ttl of event time is dropped from the
    * state store once the watermark passes (its latest row was
    * already emitted downstream), bounding state on a weeks-running
    * high-cardinality stream. Event-time (not processing-time) on
    * purpose: eviction is then deterministic under replay, and the
    * engine does not have to run empty batches continuously to poll
    * wall-clock timeouts. The only semantic trade: an at-least-once
    * redelivery arriving AFTER its key's eviction is no longer
    * suppressed and re-emits the old row (downstream keyed sinks
    * overwrite-by-position, so the materialized table is unaffected).
    * Positions order totally, so a re-created key after eviction
    * still compacts correctly.
    */
  def compactLatest(df: DataFrame, eventTimeCol: Option[String] = None,
                    ttl: String = "1 hour")
      : org.apache.spark.sql.Dataset[CompactedRecord] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    // (len, bytes) order; null position (Cdc.wrap / parquet / s3 /
    // directory-file sources) sorts as OLDEST so one such record can
    // never crash or block the state — arrival order breaks ties below
    def newer(a: String, b: String): Boolean = {
      val x = if (a == null) "" else a
      val y = if (b == null) "" else b
      x.length > y.length || (x.length == y.length && x > y)
    }
    val in = eventTimeCol match {
      case Some(tc) => df.withWatermark(tc, ttl)
      case None => df
    }
    // bare attribute (no cast) so the alias keeps the watermark tag
    val et = eventTimeCol.map(col)
      .getOrElse(lit(null).cast("timestamp"))
    val timeoutConf =
      if (eventTimeCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    in.select(
        col(graft.model.Cdc.Key).cast("string").as("key"),
        col(graft.model.Cdc.Operation).as("operation"),
        col(graft.model.Cdc.Position).cast("string").as("position"),
        col(graft.model.Cdc.PayloadAfter).as("payload_after"),
        et.as("_et"))
      .as[(String, String, String, String, Option[java.sql.Timestamp])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CompactedRecord, CompactedRecord](
        OutputMode.Update, timeoutConf) {
        (key: String,
         rows: Iterator[(String, String, String, String, Option[java.sql.Timestamp])],
         state: GroupState[CompactedRecord]) =>
          if (state.hasTimedOut) {
            state.remove() // quiet past the TTL: evict, nothing to emit
            Iterator.empty
          } else {
            val batch = rows.toList
            // later arrival wins ties — the only order null positions have
            val latest = batch
              .map { case (k, op, pos, pay, _) => CompactedRecord(k, op, pos, pay) }
              .reduceOption { (a, b) =>
                if (newer(a.position, b.position)) a else b
              }
            val out = latest match {
              case None => Iterator.empty
              case Some(rec) =>
                val cur = state.getOption
                if (cur.exists(c => newer(c.position, rec.position)))
                  Iterator.empty // stale redelivery: state strictly newer
                else if (rec.operation == "delete") {
                  state.remove() // tombstone: key no longer live
                  Iterator.single(rec.copy(payload_after = null))
                } else {
                  state.update(rec)
                  Iterator.single(rec)
                }
            }
            // any arrival on a live key refreshes its event-time TTL
            // (base clamped above the watermark so stragglers set a
            // legal future timeout rather than throw)
            if (state.exists && timeoutConf == GroupStateTimeout.EventTimeTimeout) {
              val wm = state.getCurrentWatermarkMs()
              batch.flatMap(_._5).map(_.getTime).maxOption
                .foreach(ms => state.setTimeoutTimestamp(math.max(ms, wm + 1), ttl))
            }
            out
          }
      }
  }
}
