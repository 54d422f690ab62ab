package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the
  * supported path for libraries shipping native Catalyst expressions is
  * `classic.ExpressionUtils.column`, which is `private[sql]`. This bridge
  * lives inside the `org.apache.spark.sql` package namespace to re-export
  * it — the standard extension-library pattern.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The RDD a `Dataset.localCheckpoint` persisted, or None. A
    * checkpointed Dataset's plan is a `LogicalRDD` over the persisted
    * internal RDD; `Dataset.unpersist()` only talks to the
    * CacheManager and never releases those blocks, so an iterative
    * caller that checkpoints per round must unpersist the superseded
    * round's RDD DIRECTLY — this is the handle. */
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }

  /** Clear the context's checkpoint dir (`SparkContext.checkpointDir`
    * is `private[spark]` with a set-only public API). Scoped reliable
    * checkpointing — set a dir for one loss-tolerant computation (see
    * `Dedup.connectedComponents`), restore the fast local path after —
    * needs the unset half. */
  def clearCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    sc.checkpointDir = None
}
