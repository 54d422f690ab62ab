package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving (Metwally et al. 2005) heavy-hitters state: at most
  * `capacity` (token -> (cnt, err)) entries. Invariants the specs pin:
  * `cnt` never underestimates the true count, overestimates it by at
  * most `err`, and any token with true frequency > N/capacity is
  * guaranteed present after a single-stream pass. Merging follows
  * Agarwal et al. 2013 ("Mergeable Summaries"): sum counts and errors
  * for shared keys, union the rest, then evict the smallest-count
  * entries down to capacity — the per-entry count bounds survive
  * merging in any order. While the structure never saturates (distinct
  * tokens <= capacity) nothing is ever evicted and the summary is the
  * EXACT word count with err = 0 — the regime the battery oracle
  * hash-checks; saturation is deliberately approximate (eviction and
  * merge order sensitive), covered by the bound specs instead. */
final class SpaceSavingState(val capacity: Int) {
  // insertion-ordered so min-eviction tie-breaks are reproducible for a
  // given arrival order (cross-partition arrival order is still Spark's)
  val entries = new java.util.LinkedHashMap[String, Array[Long]]()

  def add(token: String, cnt: Long, err: Long): Unit = {
    val cur = entries.get(token)
    if (cur != null) { cur(0) += cnt; cur(1) += err }
    else entries.put(token, Array(cnt, err))
  }

  def update(token: String): Unit = {
    val cur = entries.get(token)
    if (cur != null) cur(0) += 1
    else if (entries.size() < capacity) entries.put(token, Array(1L, 0L))
    else {
      // evict the (first-seen) minimum-count entry; the newcomer
      // inherits its count as the classic overestimate-with-receipt
      var minKey: String = null; var minCnt = Long.MaxValue
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue()(0) < minCnt) { minCnt = e.getValue()(0); minKey = e.getKey }
      }
      entries.remove(minKey)
      entries.put(token, Array(minCnt + 1, minCnt))
    }
  }

  def trimToCapacity(): Unit = if (entries.size() > capacity) {
    val all = new java.util.ArrayList(entries.entrySet())
    // drop smallest counts (ties: later insertion order goes first)
    all.sort((a, b) => java.lang.Long.compare(a.getValue()(0), b.getValue()(0)))
    var toDrop = entries.size() - capacity
    val it = all.iterator()
    while (toDrop > 0 && it.hasNext) { entries.remove(it.next().getKey); toDrop -= 1 }
  }
}

/** Native heavy-hitters aggregate over a STRING column: ONE bounded
  * sketch per partition (partial aggregation), merged pairwise — the
  * 100 TB replacement for a full word-count exchange when only the top
  * of the distribution matters: the shuffle carries `capacity`-entry
  * summaries instead of one row per distinct token. Output is
  * `ARRAY<STRUCT<token, cnt, err>>` sorted (cnt DESC, token ASC). */
case class TopKTokens(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingState] {
  require(capacity >= 1 && capacity <= 65536, "capacity must be in [1, 65536]")

  override def prettyName: String = "top_k_tokens"
  override def nullable: Boolean = false
  override def dataType: DataType = TopKTokens.schema
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): SpaceSavingState = new SpaceSavingState(capacity)

  override def update(buf: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    other.entries.forEach((k, ce) => buf.add(k, ce(0), ce(1)))
    buf.trimToCapacity()
    buf
  }

  override def eval(buf: SpaceSavingState): Any = {
    val all = new java.util.ArrayList(buf.entries.entrySet())
    all.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val rows = new Array[Any](all.size())
    var i = 0
    while (i < all.size()) {
      val e = all.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0), e.getValue()(1))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: SpaceSavingState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.entries.size())
    buf.entries.forEach { (k, ce) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(ce(0)); out.writeLong(ce(1))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new SpaceSavingState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      st.add(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong(), in.readLong())
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKTokens =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKTokens =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object TopKTokens {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
}

/** KLL quantile sketch aggregates (Karnin–Lang–Liberty, FOCS 2016;
  * the Apache DataSketches implementation Spark already bundles for
  * its own hll_* functions). Where the equi-width quantile store
  * ([[graft.store.MergeStore.writeQuantilePart]]) trades VALUE
  * resolution at O(occupied bins) state — unbounded when a key's value
  * range is wide — KLL trades RANK accuracy at FIXED size: k = 200
  * holds ~1.65% normalized rank error (99% confidence) in a few KB
  * regardless of value range or row count. Two aggregates because the
  * store needs both halves of the mergeable-summary contract:
  * [[KllSketchAgg]] builds a sketch from raw DOUBLE values (the part
  * writer), [[KllMergeAgg]] unions serialized sketches (the reader,
  * merging across parts).
  *
  * Determinism caveat, pinned in the specs: KLL compaction flips a
  * random coin per level, so serialized bytes and last-ulp quantile
  * positions are NOT bit-replayable — the battery row is rows-only
  * with spec-pinned rank-error bounds (the q35/q111 discipline), never
  * hash-checked. */
abstract class KllAggBase
    extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch] {
  def k: Int
  // NOTE: no require() in this (abstract) body — superclass init runs
  // before the concrete case class assigns `k`, so a check here reads 0
  // and breaks Java deserialization on executors; each case class
  // checks in its own body instead
  protected def checkK(): Unit =
    require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): org.apache.datasketches.kll.KllDoublesSketch =
    org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)

  override def merge(buf: org.apache.datasketches.kll.KllDoublesSketch,
                     other: org.apache.datasketches.kll.KllDoublesSketch):
      org.apache.datasketches.kll.KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: org.apache.datasketches.kll.KllDoublesSketch): Any =
    buf.toByteArray

  override def serialize(buf: org.apache.datasketches.kll.KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.kll.KllDoublesSketch =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))
}

/** Serialized KLL sketch of a DOUBLE column (nulls skipped, standard
  * percentile semantics). */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0) extends KllAggBase {
  checkK()
  override def prettyName: String = "kll_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def update(buf: org.apache.datasketches.kll.KllDoublesSketch,
                      input: InternalRow): org.apache.datasketches.kll.KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Union of serialized KLL sketches (a BINARY column of
  * [[KllSketchAgg]] outputs) — the read-side merge across store
  * parts. */
case class KllMergeAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0) extends KllAggBase {
  checkK()
  override def prettyName: String = "kll_merge"
  override def children: Seq[Expression] = Seq(child)

  override def update(buf: org.apache.datasketches.kll.KllDoublesSketch,
                      input: InternalRow): org.apache.datasketches.kll.KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object AggFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column => C, expression => E}
  def top_k_tokens(c: Column, capacity: Int): Column =
    C(TopKTokens(E(c), capacity).toAggregateExpression())
  def kll_sketch(c: Column, k: Int = 200): Column =
    C(KllSketchAgg(E(c), k).toAggregateExpression())
  def kll_merge(c: Column, k: Int = 200): Column =
    C(KllMergeAgg(E(c), k).toAggregateExpression())
  def theta_sketch(c: Column, lgK: Int = 12): Column =
    C(ThetaSketchAgg(E(c), lgK).toAggregateExpression())
  def theta_union(c: Column, lgK: Int = 12): Column =
    C(ThetaUnionAgg(E(c), lgK).toAggregateExpression())
}

/** Theta sketch distinct-set aggregates (Dasgupta/Lang/Rhodes, the
  * DataSketches theta family) — the set-OPERATION side of approximate
  * distinct counting that HLL (q35/q111) cannot do: theta sketches
  * keep a hash SAMPLE, so two sketches support intersection and
  * difference estimates ("users who purchased AND hit an error",
  * audience overlap) where HLL only unions. ClickHouse ships the same
  * trade as `uniqTheta`.
  *
  * Exactness regime, pinned by the battery: below ~k retained entries
  * (lgK=12 → 4096) the sketch holds EVERY distinct hash, theta stays
  * 1.0, and every estimate — including intersections and differences —
  * is the exact integer count, replayable against a COUNT(DISTINCT)
  * oracle. Past k it degrades gracefully to ~1/sqrt(k) relative error
  * (documented, spec-pinned direction only). Serialized form is the
  * compact ordered sketch; [[ThetaUnionAgg]] re-merges stored sketches
  * (the SketchStore pattern).
  */
abstract class ThetaAggBase
    extends TypedImperativeAggregate[org.apache.datasketches.theta.Union] {
  def lgK: Int
  protected def checkLgK(): Unit =
    require(lgK >= 4 && lgK <= 26, s"theta lgK must be in [4, 26], got $lgK")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
    org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()

  override def merge(buf: org.apache.datasketches.theta.Union,
                     other: org.apache.datasketches.theta.Union):
      org.apache.datasketches.theta.Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: org.apache.datasketches.theta.Union): Any =
    buf.getResult.toByteArray

  override def serialize(buf: org.apache.datasketches.theta.Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
    val u = createAggregationBuffer()
    u.union(org.apache.datasketches.memory.Memory.wrap(bytes))
    u
  }
}

/** Theta sketch of a LONG or STRING column (nulls skipped). */
case class ThetaSketchAgg(child: Expression, lgK: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0) extends ThetaAggBase {
  checkLgK()
  override def prettyName: String = "theta_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"theta_sketch expects a BIGINT/INT/STRING column, got $other")
    }

  override def update(buf: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long    => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case s: UTF8String        => buf.update(s.toString)
      case other => throw new IllegalStateException(
        s"theta_sketch: unexpected runtime type ${other.getClass}")
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Union of serialized theta sketches (read-side merge of stored
  * sketch parts). */
case class ThetaUnionAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends ThetaAggBase {
  checkLgK()
  override def prettyName: String = "theta_union"
  override def children: Seq[Expression] = Seq(child)

  override def update(buf: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(org.apache.datasketches.memory.Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
