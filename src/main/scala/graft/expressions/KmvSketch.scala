package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the deterministic alternative to HyperLogLog for corpus
  * cardinality audits (distinct tokens / shingles / urls per group).
  *
  * State is the k smallest DISTINCT hash values seen: O(k) longs per
  * group regardless of input size, mergeable by set-union-and-truncate,
  * so partial aggregation (map-side combine) works exactly like any
  * built-in agg and a 100 TB groupBy carries 512-byte sketches through
  * the shuffle, not value sets. With fewer than k distinct hashes the
  * sketch IS the exact distinct count; at k and beyond the estimator is
  * the classic (k−1) / r_k where r_k is the k-th smallest hash
  * normalized to [0,1) (Bar-Yossef et al., "Counting distinct elements
  * in a data stream"; relative error ≈ 1/√(k−2)).
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
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  /** normalizer: hashes are uniform in [0, 2^60) (md5-prefix). */
  private val HashSpace: Double = (1L << 60).toDouble

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv requires a bigint hash column, got ${child.dataType.simpleString}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"graft_kmv requires k >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / (buf.last().toDouble / HashSpace)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
