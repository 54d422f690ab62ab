package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the reference's events surface
  * (ScratchDB's headline use case is exactly this kind of product
  * analytics over ingested JSON events — see
  * /root/reference/README.md:9-14): ordered-funnel conversion (plain
  * and complete-within-T) and cohort retention. All are single-shuffle
  * shapes: one hash exchange on the user key, one in-partition sort,
  * chained window functions — no self-joins, no per-step re-scans, so
  * the event table is read exactly once regardless of funnel depth.
  * The operators project down to the event columns they use before
  * adding any internal column, so at 100 TB the exchange carries only
  * (user, ts, tie, type) however wide the input rows are, and caller
  * columns can never collide with the `__`-prefixed temporaries.
  */
object EventAnalytics {

  /** The four analysis columns, projected in a fixed internal order.
    * Input column names must not use the reserved `__` prefix (that
    * namespace belongs to the operator's temporaries). */
  private def projected(events: DataFrame, cols: String*): DataFrame = {
    require(cols.forall(!_.startsWith("__")),
      s"column names must not start with the reserved '__' prefix, got ${cols.mkString(", ")}")
    events.select(cols.map(c => col(c)): _*)
  }

  /** Shared funnel tail: per-user reached flags from the qual columns,
    * one global total row, then an O(steps) typed unpivot. `step_idx`,
    * `step`, `users` and `rate` are built with `lit`/`struct` (never
    * string-interpolated SQL, so step names containing quotes are data,
    * not syntax) and rate is computed on the single totals row BEFORE
    * unpivoting — no window over the O(steps) output, so nothing here
    * ever plans a single-partition WindowExec. */
  private def funnelTail(withQuals: DataFrame, userCol: String,
                         qualCols: Seq[String], steps: Seq[String]): DataFrame = {
    val perUser = withQuals.groupBy(col(userCol))
      .agg(qualCols.zipWithIndex.map { case (c, k) =>
        max(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__r$k")
      }.head, qualCols.zipWithIndex.tail.map { case (c, k) =>
        max(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__r$k")
      }: _*)

    val totals = perUser.agg(
      sum(col("__r0")).as("__u0"),
      qualCols.indices.tail.map(k => sum(col(s"__r$k")).as(s"__u$k")): _*)

    // O(steps) rows out of ONE totals row: rate = users/step-0 users
    // (double division of exact longs — deterministic).
    val rows = array(steps.indices.map { k =>
      struct(lit(k.toLong).as("step_idx"), lit(steps(k)).as("step"),
        col(s"__u$k").cast("long").as("users"),
        when(col("__u0") === 0L, lit(0.0))
          .otherwise(col(s"__u$k").cast("double") / col("__u0").cast("double"))
          .as("rate"))
    }: _*)
    totals.select(explode(rows).as("__s")).select("__s.*")
  }

  /** Ordered funnel: for each user, step k counts as reached when an
    * event of `steps(k)` occurs strictly after (in (ts, tie) sort
    * order) some event that completed step k-1. Computed with chained
    * running-min windows over ONE sort:
    *
    *   prev1(r) = min ts of step-0 events strictly before r
    *   qual_k(r) = ts  if r is a step-k event and prev_{k-1}(r) exists
    *   prev_k(r) = min qual_k strictly before r
    *
    * All windows share the same partitioning + ordering, so Catalyst
    * plans a single Exchange + Sort with stacked Window operators.
    * Returns (step_idx, step, users, rate) with rate = users /
    * step-0 users (double division of exact longs — deterministic).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    val base = projected(events, userCol, tsCol, tieCol, typeCol)
    val wPrev = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)

    // qualCols(k): per-row ts iff this row completes step k.
    val qual0 = when(col(typeCol) === steps.head, col(tsCol))
    val (withQuals, qualCols) =
      steps.zipWithIndex.tail.foldLeft((base.withColumn("__q0", qual0), Seq("__q0"))) {
        case ((df, cols), (step, k)) =>
          val prev = min(col(cols.last)).over(wPrev)
          val q = when(col(typeCol) === step && prev.isNotNull, col(tsCol))
          (df.withColumn(s"__q$k", q), cols :+ s"__q$k")
      }
    funnelTail(withQuals, userCol, qualCols, steps)
  }

  /** Time-boxed ordered funnel: step k counts only when the whole chain
    * completes within `withinSeconds` of its step-0 anchor event —
    * "signed up, then activated, then purchased, all inside 7 days",
    * the form product funnels over the reference's events use case
    * actually take (readme.md:9-14, the events-table quickstart).
    *
    * Same single Exchange + Sort + stacked-Window plan as [[funnel]];
    * the recurrence carries the chain's ANCHOR (the step-0 event time,
    * as exact integer epoch-micros) instead of the completion time, and
    * propagates the MAXIMUM anchor:
    *
    *   a_0(r)  = epoch_us(ts)   if r is a step-0 event
    *   prevA_k(r) = max a_k over rows strictly before r
    *   a_k(r)  = prevA_{k-1}(r) if r is a step-k event
    *             and epoch_us(ts(r)) - prevA_{k-1}(r) <= T_us
    *
    * Propagating the max (most recent) anchor is the correct greedy
    * witness: if ANY chain within the deadline reaches step k at r,
    * the max-anchor chain does too (every intermediate event of the
    * witness chain is <= ts(r), so it satisfies the deadline under any
    * anchor >= the witness's). The deadline is inclusive — a chain
    * completing at exactly T counts (spec-pinned) — and all window
    * arithmetic is integer microseconds, bit-replayable in SQL.
    */
  def funnelWithin(events: DataFrame, userCol: String, tsCol: String,
                   tieCol: String, typeCol: String, steps: Seq[String],
                   withinSeconds: Long): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    require(withinSeconds > 0, s"withinSeconds must be positive, got $withinSeconds")
    val withinUs = math.multiplyExact(withinSeconds, 1000000L)
    val base = projected(events, userCol, tsCol, tieCol, typeCol)
    val wPrev = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)

    val tsUs = unix_micros(col(tsCol))
    val anchor0 = when(col(typeCol) === steps.head, tsUs)
    val (withQuals, qualCols) =
      steps.zipWithIndex.tail.foldLeft((base.withColumn("__q0", anchor0), Seq("__q0"))) {
        case ((df, cols), (step, k)) =>
          val prevA = max(col(cols.last)).over(wPrev)
          val q = when(col(typeCol) === step && prevA.isNotNull &&
            tsUs - prevA <= withinUs, prevA)
          (df.withColumn(s"__q$k", q), cols :+ s"__q$k")
      }
    funnelTail(withQuals, userCol, qualCols, steps)
  }

  /** Cohort retention: users cohorted by the Monday of their first
    * event; a (cohort_week, week_offset) cell counts users with any
    * activity in that offset week. One exchange on the user key: the
    * cohort min is a whole-partition window, the distinct + count
    * re-aggregates (user, cohort, offset) triples — O(users x active
    * weeks), not O(events), after the map-side distinct.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wUser = Window.partitionBy(col(userCol))
    projected(events, userCol, tsCol)
      .withColumn("__cohort", date_trunc("week", min(col(tsCol)).over(wUser)).cast("date"))
      .withColumn("__week", date_trunc("week", col(tsCol)).cast("date"))
      .withColumn("week_offset",
        (datediff(col("__week"), col("__cohort")).cast("long") / 7L).cast("long"))
      .select(col(userCol), col("__cohort").as("cohort_week"), col("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** First-order transition matrix over each user's ordered event
    * stream: how often does `from_type` precede `to_type`? The Markov
    * view behind "where do users go after an error" / next-event
    * prediction features. Same single-shuffle shape as the funnels:
    * one exchange on the user key, one in-partition sort, a `lag`
    * window, then a tiny (|types|²-row) re-aggregation — partial
    * (map-side) combine makes the second exchange carry at most
    * |types|² rows per task regardless of event volume. Ordering ties
    * on `tsCol` break deterministically by `tieCol`. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    projected(events, userCol, tsCol, tieCol, typeCol)
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Top-k most common event PATHS: each user's first `pathLen` events
    * (by time, ties broken by `tieCol`) joined into a `a>b>c` string,
    * counted across users. The "common journeys" report.
    *
    * Scale shape: a `row_number` window keeps only the first `pathLen`
    * events per user BEFORE any collection, so the per-user buffer in
    * the subsequent `collect_list` is bounded by `pathLen` — never by
    * the user's raw event count (a power user with 10⁹ events
    * contributes `pathLen` rows past the filter, not a 10⁹-element
    * array on one task). Both window and groupBy key on the user, so
    * the exchange is reused; the final path count is a small
    * re-aggregation with map-side combine, and top-k lowers to
    * TakeOrderedAndProject (no global sort). Ties in count order
    * deterministically by path string.
    *
    * Users with FEWER than `pathLen` events count with their full
    * (shorter) journey — `path_len` in the output distinguishes a
    * complete short journey (`path_len < pathLen`) from a truncated
    * prefix (`path_len == pathLen`, journey may continue past the
    * cut); filter `path_len < pathLen` for ended-journeys-only. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, typeCol: String, pathLen: Int, k: Int): DataFrame = {
    require(pathLen >= 1, s"pathLen must be >= 1, got $pathLen")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    projected(events, userCol, tsCol, tieCol, typeCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
      .groupBy(col(userCol))
      // collect_list order is partition-arrival order (non-deterministic
      // under retries); sorting the (rn, type) structs restores the
      // deterministic event order before the join into a string.
      .agg(sort_array(collect_list(struct(col("__rn").as("r"), col(typeCol).as("t"))))
        .as("__evs"))
      .select(concat_ws(">", transform(col("__evs"), e => e.getField("t"))).as("path"),
        size(col("__evs")).cast("long").as("path_len"))
      // path_len is a pure function of path (its segment count), so
      // adding it to the key changes no group — it exists so callers
      // can tell a 2-event user's full journey from the pathLen-cut
      // prefix of a longer one (path_len < pathLen ⇔ the journey ENDED
      // there; filter on it for complete-paths-only semantics)
      .groupBy(col("path"), col("path_len"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** Time-bucket downsampling with OHLC semantics (open / high / low /
    * close per bucket and key) — the resample step that turns a raw
    * event stream into a dashboard-sized series. ONE aggregate with
    * map-side partial combine: `min_by`/`max_by` carry a single
    * (ordering, value) candidate through the exchange, so the shuffle
    * is O(buckets × keys) however many raw events feed it.
    *
    * Determinism: open/close pick by a composite ordering key —
    * zero-padded `(epoch micros, tieCol)` — so equal timestamps break
    * by the tie column instead of partition arrival order; the string
    * form is byte-comparable identically on every engine (which is
    * what lets DuckDB's `arg_min` replay it bit-for-bit); the padding
    * assumes post-1970 timestamps and a non-negative `tieCol` (a minus
    * sign would break byte order). `bucket` is any `date_trunc` unit
    * ("hour", "day", …). */
  def downsampleOhlc(events: DataFrame, tsCol: String, tieCol: String,
                     keyCol: String, valueCol: String, bucket: String): DataFrame = {
    val ord = concat(
      lpad(unix_micros(col(tsCol)).cast("string"), 20, "0"),
      lpad(col(tieCol).cast("string"), 20, "0"))
    projected(events, tsCol, tieCol, keyCol, valueCol)
      .groupBy(date_trunc(bucket, col(tsCol)).as("bucket"), col(keyCol))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max_by(col(valueCol), ord).as("close"),
        min(col(valueCol)).as("low"),
        max(col(valueCol)).as("high"),
        count(lit(1)).as("n"))
  }

  /** Volume-anomaly detection: buckets whose event count deviates more
    * than `zThreshold` standard deviations from the TRAILING
    * `trailing`-bucket baseline (current bucket excluded — it must not
    * vouch for itself). The "error spike at 3am" alert, as a query.
    *
    * Two bounded shuffles: (key, bucket) counts first — O(keys ×
    * buckets) rows ever after, whatever the raw volume — then a
    * key-partitioned window for the trailing sums. Buckets with fewer
    * than `trailing` predecessors are withheld (no baseline, no
    * verdict), as are zero-variance baselines (a constant series has
    * no unit to measure deviation in).
    *
    * The z-score is built ONLY from correctly-rounded IEEE-754 ops
    * over exact integer window sums — n, Σn, Σn² are integers; the
    * divisions, one subtraction and `sqrt` are each exact-operand
    * correctly-rounded — so any engine replaying the same formula
    * produces the same BITS, which is what lets the battery
    * hash-check a floating-point anomaly score at all. The trailing
    * window is row-based: gaps in the series mean "last `trailing`
    * OBSERVED buckets", identically on both engines. */
  def anomalies(events: DataFrame, tsCol: String, keyCol: String,
                bucket: String, trailing: Int, zThreshold: Double): DataFrame =
    anomaliesFromCounts(
      projected(events, tsCol, keyCol)
        .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
        .agg(count(lit(1)).as("n")),
      keyCol, "bucket", "n", trailing, zThreshold)

  /** [[anomalies]]' scoring stage over PRE-AGGREGATED counts — the
    * entry point when the (key, bucket, n) series comes from somewhere
    * other than a raw event scan: a summing MergeStore a stream
    * maintains (q155's live-dashboard path), a gap-filled series, a
    * downsampled rollup. One row per (key, bucket) expected —
    * duplicate buckets would each get their own baseline row rather
    * than merging. */
  def anomaliesFromCounts(counts: DataFrame, keyCol: String, bucketCol: String,
                          nCol: String, trailing: Int, zThreshold: Double): DataFrame = {
    require(trailing >= 2, s"trailing must be >= 2 (variance needs it), got $trailing")
    val n = col(s"`$nCol`")
    val tw = Window.partitionBy(col(s"`$keyCol`")).orderBy(col(s"`$bucketCol`"))
      .rowsBetween(-trailing, -1)
    val sD = col("__s").cast("double")
    val ssD = col("__ss").cast("double")
    // project first — the key exchange carries three columns, not
    // whatever width the caller's rollup arrived with
    projected(counts, keyCol, bucketCol, nCol)
      .withColumn("__s", sum(n).over(tw))
      .withColumn("__ss", sum(n * n).over(tw))
      .withColumn("__c", count(n).over(tw))
      .filter(col("__c") === trailing)
      .withColumn("__m2", ssD - sD * sD / col("__c"))
      .filter(col("__m2") > 0)
      .withColumn("zscore",
        (n.cast("double") - sD / col("__c")) /
          sqrt(col("__m2") / (col("__c") - 1)))
      .filter(abs(col("zscore")) >= zThreshold)
      .select(col(s"`$keyCol`"), col(s"`$bucketCol`").as("bucket"),
        n.as("n"), col("zscore"))
  }

  /** Gap filling for a bucketed series: densify each key's series to a
    * regular `stepUs` grid between its first and last observation and
    * forward-fill `valueCol` across the introduced holes (`filled`
    * marks them). Downstream windows — the trailing baseline in
    * [[anomalies]], OHLC charts — silently assume regular spacing;
    * this is the operator that makes that true.
    *
    * Shape: per-key span aggregate (tiny), `sequence` + `explode` to
    * the grid — O(span/step) rows PER KEY, generated distributed, so a
    * key's grid never materializes on the driver — left join back on
    * (key, bucket), then a key-partitioned running `last(ignoreNulls)`.
    * Pick `stepUs` to match the bucketing that produced the series;
    * the grid size is span/step — a caller densifying years at
    * 1-second steps gets the row count they asked for.
    *
    * Preconditions: `series` is an aggregated series — at most one row
    * per (key, bucket), buckets ON the step grid (off-grid
    * observations miss the equi join and are dropped), and observed
    * values non-null (a null observation is indistinguishable from a
    * hole and will be forward-filled over). */
  /** Shared grid stage of both densifiers: per-key span → step grid →
    * left-join of the observations, with holes flagged `filled` and
    * `valueCol` still null on them — each sibling is one fill
    * expression on top (the two cannot diverge on grid semantics). */
  private def gridJoin(series: DataFrame, keyCol: String, bucketCol: String,
                       valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val spans = projected(series, keyCol, bucketCol, valueCol)
      .groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val grid = spans.select(col(keyCol),
        explode(sequence(unix_micros(col("__lo")), unix_micros(col("__hi")),
          lit(stepUs))).as("__b"))
      .select(col(keyCol), timestamp_micros(col("__b")).as(bucketCol))
    grid.join(projected(series, keyCol, bucketCol, valueCol),
        Seq(keyCol, bucketCol), "left")
      .withColumn("filled", col(valueCol).isNull)
  }

  def fillGaps(series: DataFrame, keyCol: String, bucketCol: String,
               valueCol: String, stepUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gridJoin(series, keyCol, bucketCol, valueCol, stepUs)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Weekly growth accounting — the classic user-lifecycle ledger
    * (new / retained / resurrected / churned) behind every growth
    * dashboard: each active (user, week) is classified by the user's
    * PREVIOUS active week (none → new; exactly last week → retained;
    * older → resurrected), and churned(w) = active(w−1) − retained(w)
    * — the users who were there last week and aren't now. Churn is
    * only attributed when w−1 actually exists as a row (a globally
    * silent week breaks the adjacency and yields null, not a bogus
    * count against an older week).
    *
    * Shape: distinct (user, week) first — everything after is
    * O(users × active weeks), not O(events); one user-keyed window
    * for the previous-active-week lag; the final churn lag runs over
    * the O(weeks) weekly summary (a single-partition window over
    * dozens of rows — bounded by calendar time, not data). All counts
    * are exact integers. Adjacency is CALENDAR arithmetic
    * (`prev == week − INTERVAL 7 days`), not a fixed microsecond
    * delta: in a non-UTC session, `date_trunc('week')` Mondays
    * bracketing a DST switch sit 7d±1h apart in epoch time, and a
    * fixed-delta test would misclassify a retained user as
    * resurrected across every DST boundary. */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = projected(events, userCol, tsCol)
      .select(col(userCol).as("__u"), date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    val priorWeek = col("week") - expr("INTERVAL 7 DAYS")
    val wu = Window.partitionBy(col("__u")).orderBy(col("week"))
    val classified = weeks
      .withColumn("__prev", lag(col("week"), 1).over(wu))
      .withColumn("__status",
        when(col("__prev").isNull, lit("new"))
          .when(col("__prev") === priorWeek, lit("retained"))
          .otherwise(lit("resurrected")))
    val weekly = classified.groupBy("week").agg(
      count(lit(1)).as("active"),
      sum(when(col("__status") === "new", 1L).otherwise(0L)).as("n_new"),
      sum(when(col("__status") === "retained", 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("__status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"))
    val ww = Window.orderBy(col("week"))
    weekly
      .withColumn("__pw", lag(col("week"), 1).over(ww))
      .withColumn("__pa", lag(col("active"), 1).over(ww))
      .withColumn("n_churned",
        when(col("__pw") === priorWeek, col("__pa") - col("n_retained")))
      .select("week", "active", "n_new", "n_retained", "n_resurrected", "n_churned")
  }

  /** [[fillGaps]]' constant-fill sibling — the right densifier for
    * COUNT series: a missing bucket means "nothing happened" (n = 0),
    * not "same as before" (forward fill would paper over the exact
    * outages a volume detector exists to catch; zero-filled holes
    * score as large negative z and SURFACE instead). No window at
    * all: grid left-join + coalesce, so this is the cheaper of the
    * two fills — one O(keys) span aggregate, the grid explode, one
    * join. Same grid preconditions as [[fillGaps]]. */
  def fillGapsConstant(series: DataFrame, keyCol: String, bucketCol: String,
                       valueCol: String, stepUs: Long,
                       fillValue: Column): DataFrame =
    gridJoin(series, keyCol, bucketCol, valueCol, stepUs)
      .withColumn(valueCol, coalesce(col(valueCol), fillValue))
}
