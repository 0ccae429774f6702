package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared machinery for bounded k-smallest-distinct-longs aggregates:
  * the buffer is the k smallest DISTINCT long inputs seen — O(k) state
  * per group regardless of input size, mergeable by
  * set-union-and-truncate, so partial aggregation (map-side combine)
  * works exactly like any built-in agg and a 100 TB groupBy carries
  * ≤ 8k-byte buffers through the shuffle, not value sets. Also valid in
  * Structured Streaming state stores (the serialized buffer is the
  * state), where unbounded aggregates like collect_set/count_distinct
  * are rejected.
  */
abstract class KSmallestAgg
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  def child: Expression
  def k: Int

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint column, got ${child.dataType.simpleString}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  protected final def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }

  override final def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override final def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override final def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override final def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }
}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the deterministic alternative to HyperLogLog for corpus
  * cardinality audits (distinct tokens / shingles / urls per group).
  *
  * With fewer than k distinct hashes the sketch IS the exact distinct
  * count; at k and beyond the estimator is the classic (k−1) / r_k
  * where r_k is the k-th smallest hash normalized to [0,1)
  * (Bar-Yossef et al., "Counting distinct elements in a data stream";
  * relative error ≈ 1/√(k−2)).
  *
  * Input must be a PRE-HASHED non-negative long occupying < 2^60 (use
  * TextFns.hash60 — codegen'd md5, identical in DuckDB) — keeping the
  * hash outside the aggregate makes the whole sketch deterministic and
  * bit-reproducible across engines: the oracle reproduces it with
  * ROW_NUMBER() ≤ k over distinct hashes, which is feasible at oracle
  * scale exactly where the sketch is unnecessary.
  *
  * Registered as SQL function `graft_kmv(hash_col, k)` by
  * [[graft.GraftExtensions]]; reachable from the Column API via
  * `call_function("graft_kmv", col, lit(k))`.
  */
case class KmvSketch(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KSmallestAgg {

  /** normalizer: hashes are uniform in [0, 2^60) (md5-prefix). */
  private val HashSpace: Double = (1L << 60).toDouble

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv"

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / (buf.last().toDouble / HashSpace)

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** The k smallest DISTINCT values of a long column, as a sorted
  * ascending array — bounded order statistics for plans that need "the
  * two smallest ids per group" (e.g. Ranges.bandStats' min-partner
  * column) without collect_set's unbounded state. Groups with fewer
  * than k distinct values return all of them.
  *
  * Registered as SQL function `graft_kmin(col, k)` by
  * [[graft.GraftExtensions]].
  */
case class KMin(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KSmallestAgg {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmin"

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KMin =
    copy(child = newChild)
}
