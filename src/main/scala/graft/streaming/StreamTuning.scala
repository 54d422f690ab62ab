package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-partition sizing for the engine's BOUNDED streaming runs
  * (battery rows, fuzz seeds, MV maintenance over staged file sets).
  *
  * Why this exists (optimization round 21, guide §2.4/§1.2): a stateful
  * micro-batch commits one state-store delta PER (shuffle partition ×
  * state store) per batch, and each commit carries a large CONSTANT
  * cost (checkpoint-file create + atomic rename + offset bookkeeping)
  * that has nothing to do with the rows in it. A stream-stream interval
  * join holds 4 state stores per partition, so at the session default
  * of one shuffle partition per core (32 locally) ONE batch pays 128
  * commits. Measured on the sf0.1 interval-join row (StreamProbe,
  * this round): state commitTimeMs summed 120–1,060 s per batch at 32
  * partitions vs 1–3 s at 4 partitions — the commit cost is also
  * SUPERLINEAR in concurrent commits (parallel tiny checkpoint writes
  * contend in the filesystem journal), so 8× fewer partitions bought
  * ~100× less commit time and cut the stream's wall from 52–127 s to
  * 6–10 s on the same host.
  *
  * The principle is the guide's partition-sizing rule applied to
  * state: partitions must scale with STATE VOLUME, not with the host's
  * core count. The battery's streams hold KB–MB of state (thousands of
  * windows/sessions/join rows), where 4 partitions is already generous;
  * a production deployment ingesting 100 TB/day sizes this knob to its
  * key cardinality (e.g. state-bytes / ~64 MB per partition) via the
  * same env override the driver uses —
  * `SPARK_GRAFT_STREAM_STATE_PARTITIONS`. The chaos/soak workers
  * (StreamChaosWorker, SeamWorker, SoakBench) already pin small
  * partition counts (4/8) for exactly this reason; this helper makes
  * the battery rows consistent with them.
  *
  * Correctness: every battery stream's result is partition-count
  * independent by construction — windowed/session aggregates and
  * interval joins are deterministic set operations, the summing /
  * quantile MVs use exact algebra (DECIMAL sums, integer bin counts),
  * and the sdedup family pre-reduces each batch to one winning row per
  * key (r20's struct(ts, event_id) ordering fix). The 400-seed
  * StreamFuzz DuckDB gate re-verifies all of this at the new setting.
  * On a checkpoint RESUME Spark reapplies the partition count recorded
  * in the checkpoint's offset metadata, so a restart never re-shards
  * state regardless of the session value at restart time.
  */
object StreamTuning {
  val EnvKey = "SPARK_GRAFT_STREAM_STATE_PARTITIONS"

  /** Local default 4 (see scaladoc): generous for KB–MB state, small
    * enough that per-batch commit count — the measured wall sink — is
    * bounded. Overridable per deployment via [[EnvKey]]. */
  def stateParts: Int =
    sys.env.get(EnvKey).flatMap(_.toIntOption).filter(_ >= 1).getOrElse(4)

  /** Run `body` (stream start → awaitTermination) with
    * `spark.sql.shuffle.partitions` set to [[stateParts]], restoring
    * the caller's value afterwards. The conf must span the WHOLE run,
    * not just `.start()`: the micro-batch planner reads it when batch 0
    * is planned, which happens asynchronously after start returns. */
  def withStateParts[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, stateParts.toString)
    try body finally s.conf.set(key, old)
  }
}
