package graft.streaming

import graft.store.TableCatalog
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

/** Structured Streaming surface of the engine.
  *
  * The reference's streaming model is micro-batch by file rotation
  * (spool -> closed file -> insert worker; SURVEY §2A A5/A7), which the
  * batch ingest loop reproduces exactly. This module is the
  * Spark-NATIVE continuous form of the same dataflow, for deployments
  * that want end-to-end Structured Streaming instead of the polling
  * loop:
  *
  *  - [[ingestStream]]: `readStream` over the spool's closed-file
  *    directory (file source tracks processed files in the checkpoint —
  *    exactly-once per file, upgrading the polling loop's
  *    at-least-once) -> `foreachBatch` append through the same
  *    TableCatalog alignment path.
  *  - [[windowedCounts]]: event-time tumbling windows + watermark —
  *    late data beyond the watermark is dropped, state is bounded.
  *  - [[sessionCounts]]: `session_window` gap sessions per key, the
  *    streaming sibling of the batch sessionization query (q32).
  *
  * Scale posture: file-source listing is incremental (`maxFilesPerTrigger`
  * bounds a micro-batch), windowed state is pruned by the watermark, and
  * every transform is a plain declarative plan — the same code runs on a
  * 1000-executor cluster with a durable checkpoint dir.
  */
object StreamingIngest {

  /** Stream closed NDJSON spool files (`<spoolRoot>/closed/<db>/<table>`)
    * into the catalog table, with FULL schema evolution mid-stream.
    *
    * The stream reads raw TEXT lines (no schema pinned at start) and
    * each micro-batch runs the exact batch-ingest dataflow —
    * distributed inference, additive/widening catalog evolution,
    * aligned append ([[graft.store.IngestService.ingestTextBatch]]).
    * A new JSON key appearing in a later file is therefore INGESTED,
    * not silently dropped, which a schema pinned at `readStream` time
    * cannot do (Spark file streams never re-infer).
    *
    * Exactly-once: the file source tracks processed files in the
    * checkpoint, and the epoch id (stable across a replay of a failed
    * micro-batch) keys the batch directory, so a replayed epoch
    * OVERWRITES its own output instead of duplicating it. */
  def ingestStream(spark: SparkSession, catalog: TableCatalog, db: String, table: String,
                   closedDir: String, checkpointDir: String,
                   maxFilesPerTrigger: Int = 100,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val in = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(closedDir)
    // stable per-stream prefix so two streams feeding one table can't
    // collide on an epoch number
    val streamTag = f"${math.abs(checkpointDir.hashCode)}%08x"
    in.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val sess = batch.sparkSession
        import sess.implicits._
        new graft.store.IngestService(sess, catalog)
          .ingestTextBatch(db, table, batch.select("value").as[String],
            batchId = Some(s"stream-$streamTag-$epochId"))
        ()
      }
      .start()
  }

  /** Event-time tumbling-window counts with a watermark: rows later than
    * `watermark` past the max seen event time are dropped and their
    * window state is released (bounded state at 100 TB/day rates). */
  def windowedCounts(events: DataFrame, timeCol: String, keyCol: String,
                     windowLength: String, watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"), col("total"))

  /** Streaming MATERIALIZED VIEW: continuously maintain a catalog table
    * of finalized event-time windows. The watermarked aggregate runs in
    * `append` output mode, so a window's row is emitted exactly once —
    * when the watermark passes its end and its state is released — and
    * appended to the (queryable, compactable) catalog table like any
    * ingest batch. Epoch-keyed batch dirs make a replayed micro-batch
    * overwrite its own output: the view never double-counts a window.
    * This is the streaming half of a lambda-free pipeline: the same
    * table serves SQL while the stream keeps appending closed windows. */
  def materializeWindowedCounts(catalog: TableCatalog, db: String, table: String,
                                events: DataFrame, timeCol: String, keyCol: String,
                                windowLength: String, watermark: String,
                                checkpointDir: String,
                                trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery = {
    val streamTag = f"${math.abs(checkpointDir.hashCode)}%08x"
    windowedCounts(events, timeCol, keyCol, windowLength, watermark)
      .writeStream
      .outputMode("append") // only watermark-finalized windows are emitted
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          catalog.evolve(batch.sparkSession, db, table, batch.schema)
          catalog.append(batch.sparkSession, db, table, batch, Some(s"mv-$streamTag-$epochId"))
        }
      }
      .start()
  }

  /** Streaming maintenance of a SUMMING [[graft.store.MergeStore]]:
    * each micro-batch reduces to per-key partial sums written as the
    * epoch's part — the live rollup-MV pattern (readers `readSummed` a
    * handful of partial-sum parts, never the stream's history).
    *
    * Unlike the sketch store, summing has NO idempotent algebra — a
    * re-appended epoch would double-count — so delivery semantics come
    * from ADDRESSING instead: the part path is a pure function of the
    * epoch id (`epoch=<id>/`) and the write is mode=overwrite, so a
    * replayed micro-batch (crash between write and checkpoint commit)
    * overwrites ITS OWN output rather than adding to it. At-least-once
    * re-execution of an epoch is exactly-once in the store —
    * spec-pinned by re-applying a committed epoch and watching the
    * totals stay put. The `epoch` directory column surfaces on read
    * and is simply not a group key, so readers never see it. */
  def maintainSummingParts(events: DataFrame, groupCols: Seq[String], sumCols: Seq[String],
                           storePath: String, checkpointDir: String,
                           trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        writeSummingPart(batch, groupCols, sumCols, storePath, epochId)
      }
      .start()

  /** One epoch's partial-sum part — package-visible so the replay
    * contract ("re-applying a committed epoch changes nothing") is
    * directly testable without staging a mid-stream crash. */
  private[graft] def writeSummingPart(batch: DataFrame, groupCols: Seq[String],
                                      sumCols: Seq[String], storePath: String,
                                      epochId: Long): Unit =
    // epochs at/below the store's compaction watermark FROM THE SAME
    // QUERY are crash-replays of parts already folded into epoch=-1;
    // re-writing them would double-count. The fence is keyed on (query
    // id, epoch id): a fresh-checkpoint query restarting at epoch 0
    // fails loudly instead of losing data (MergeStore.epochFenced).
    if (!graft.store.MergeStore.epochFenced(batch.sparkSession, storePath, epochId)
        && !batch.isEmpty) {
      val partial = batch
        .groupBy(groupCols.map(c => col(s"`$c`")): _*)
        .agg(sum(col(s"`${sumCols.head}`")).as(sumCols.head),
             sumCols.tail.map(c => sum(col(s"`$c`")).as(c)): _*)
      partial.write.mode("overwrite").parquet(s"$storePath/epoch=$epochId")
    }

  /** Streaming maintenance of the QUANTILE store
    * ([[graft.store.MergeStore.readQuantiles]]): each micro-batch
    * reduces to its (key, quantized-value) bin counts written as the
    * epoch's part — live percentile dashboards with the same
    * exactly-once-by-addressing contract as [[maintainSummingParts]]
    * (bin counts, like sums, have no idempotent algebra; the epoch
    * path is the delivery guarantee). The `epoch` directory column
    * surfaces on read and is not a group key, so readers never see
    * it. */
  def maintainQuantileParts(events: DataFrame, keyCols: Seq[String], valueCol: String,
                            storePath: String, checkpointDir: String, scale: Int = 100,
                            trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.store.MergeStore.writeQuantileEpoch(
          batch, keyCols, valueCol, storePath, scale, epochId)
      }
      .start()

  /** Streaming maintenance of the KLL quantile store
    * ([[graft.store.MergeStore.readKllQuantiles]]): each micro-batch
    * reduces to per-key KLL sketches written as the epoch's part —
    * live percentile dashboards over WIDE-RANGE value columns where
    * the histogram store's O(occupied bins) state breaks down
    * ([[maintainQuantileParts]] is the rank-exact sibling for bounded
    * ranges). Exactly-once by epoch-addressed overwrite: sketch union
    * is NOT idempotent across a mixed store (a replayed epoch merged
    * twice double-weights its rows), so delivery comes from
    * addressing + the compaction watermark, like the summing MV. */
  def maintainKllParts(events: DataFrame, keyCols: Seq[String], valueCol: String,
                       storePath: String, checkpointDir: String, k: Int = 200,
                       trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.store.MergeStore.writeKllEpoch(
          batch, keyCols, valueCol, storePath, k, epochId)
      }
      .start()

  /** Streaming maintenance of a [[graft.store.SketchStore]]: each
    * micro-batch reduces to per-(part, group) HLL sketches appended to
    * the store — the live distinct-count dashboard pattern (readers
    * union a few KB of sketches, never the stream's history).
    *
    * Delivery semantics come for FREE from the sketch algebra: HLL
    * union is a register-wise max, so a replayed epoch re-appending
    * identical sketches cannot move any estimate — at-least-once
    * delivery IS effectively-once here, with no epoch bookkeeping
    * (spec-pinned: a full re-run of the stream against the same store
    * leaves every estimate unchanged). */
  def maintainDistinctSketches(events: DataFrame, groupCols: Seq[String], valueCol: String,
                               storePath: String, partExpr: org.apache.spark.sql.Column,
                               checkpointDir: String,
                               trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val _ = epochId // delivery tracking unnecessary: union is idempotent
        if (!batch.isEmpty)
          graft.store.SketchStore.writeDistinctSketches(
            batch, groupCols, valueCol, storePath, partExpr)
      }
      .start()

  /** Stream-stream INTERVAL join: pair each left event with right
    * events of the same key whose time falls in `[left.t - before,
    * left.t + after]` — the "click within an hour of the error" join,
    * computed continuously. Both sides carry watermarks so Spark can
    * BOUND the join state: a buffered left row can stop waiting once
    * the right watermark passes `left.t + after` (and vice versa) —
    * without the time bounds the state grows forever and the job dies
    * at stream scale; with them, state is O(events inside the
    * watermark+interval horizon). Inner join: late rows beyond the
    * watermark are dropped, exactly like the windowed aggregations.
    *
    * `joinType` `inner` (default) or `left_outer`: outer emits an
    * unmatched left row with null right columns — but only once the
    * RIGHT watermark has passed the row's interval edge (no earlier
    * moment can prove "no match will come"), so outer results trail
    * the watermark by construction. Returns the joined (unaggregated)
    * stream; compose with `groupBy`/`writeStream` downstream. Column
    * names of the two sides must be disjoint except the join key. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   watermark: String, before: String, after: String,
                   joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"intervalJoin supports inner/left_outer, got $joinType")
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      l(s"`$key`") === r(s"`$key`") &&
        r(s"`$rightTime`") >= l(s"`$leftTime`") - expr(s"INTERVAL $before") &&
        r(s"`$rightTime`") <= l(s"`$leftTime`") + expr(s"INTERVAL $after"),
      joinType)
      .drop(r(s"`$key`"))
  }

  /** Gap-based sessions (`session_window`): consecutive events of one key
    * within `gap` merge into one session — streaming q32. */
  def sessionCounts(events: DataFrame, timeCol: String, keyCol: String,
                    gap: String, watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n_events"))

  /** Streaming FIRST-OCCURRENCE dedup with custom state
    * (`mapGroupsWithState`): the first row of each key passes, later
    * occurrences are dropped — exact dedup applied AT INGEST, before
    * duplicates ever hit storage (the streaming sibling of Dedup.exact).
    *
    * State per key is one boolean; with `stateTtl` set it carries a
    * processing-time timeout, bounding state to (distinct keys within
    * TTL) — the knob a 100 TB/day stream needs: an unbounded seen-set
    * fits nowhere, a TTL'd one matches the horizon within which
    * duplicates occur (retries, re-crawls). Emits `(key, payload)` for
    * passed rows. */
  def firstOccurrenceDedup(rows: Dataset[(String, String)],
                           stateTtl: Option[String] = None): Dataset[(String, String)] = {
    import rows.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    rows.groupByKey(_._1)
      .mapGroupsWithState[Boolean, (String, String)](timeoutConf) {
        (key: String, it: Iterator[(String, String)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); (key, null) }
          else if (state.exists) { it.size; (key, null) } // drain; duplicates dropped
          else {
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            val first = it.next()
            it.size // drain remaining duplicates in this batch
            first
          }
      }
      .filter(_._2 != null)
  }
}
