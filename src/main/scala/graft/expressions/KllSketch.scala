package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mutable state of [[KllSketch]]: a ladder of levels where level i
  * holds items each standing for 2^i original inputs. Level capacity is
  * the constant `k`; when a level fills it is sorted and every other
  * element survives into the level above (weight doubles), the
  * surviving parity alternating per level per compaction — the
  * deterministic variant of the KLL/MRL compactor (no RNG: replayable,
  * and the alternation makes consecutive compaction errors cancel
  * rather than accumulate with one sign).
  *
  * State is O(k · log(n/k)) doubles per group regardless of input
  * size; total weight is tracked as Σ 2^i · |level i| (compaction of an
  * odd-sized level drops or keeps one item's weight — the usual KLL
  * weight drift, self-consistent because rank targets are computed
  * against the SAME tracked weight).
  */
final class KllBuffer(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  /** one alternation bit per level (bit i = next surviving parity) */
  var parity: Long = 0L
  /** exact extremes, tracked OUTSIDE the ladder: compaction can drop
    * the true min/max item (its rank error is within the bound, but
    * p=0 / p=1 deserve exactness — the standard KLL min/max sidecar) */
  var lo: Double = Double.NaN
  var hi: Double = Double.NaN

  def insert(v: Double): Unit = {
    if (lo.isNaN || v < lo) lo = v
    if (hi.isNaN || v > hi) hi = v
    levels(0) += v
    if (levels(0).length >= k) compactCascade()
  }

  def mergeIn(other: KllBuffer): Unit = {
    if (!other.lo.isNaN && (lo.isNaN || other.lo < lo)) lo = other.lo
    if (!other.hi.isNaN && (hi.isNaN || other.hi > hi)) hi = other.hi
    while (levels.length < other.levels.length)
      levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    compactCascade()
  }

  private def compactCascade(): Unit = {
    var i = 0
    while (i < levels.length) {
      if (levels(i).length >= k) {
        val arr = levels(i).toArray
        java.util.Arrays.sort(arr)
        val start = ((parity >>> i) & 1L).toInt
        parity ^= (1L << i)
        if (i + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
        var j = start
        while (j < arr.length) { levels(i + 1) += arr(j); j += 2 }
        levels(i).clear()
      }
      i += 1
    }
  }

  def totalWeight: Long = {
    var w = 0L
    var i = 0
    while (i < levels.length) { w += levels(i).length.toLong << i; i += 1 }
    w
  }

  /** All (value, weight) pairs sorted by value. */
  def weighted: Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.sortBy(_._1).toArray
  }

  /** The smallest value whose cumulative weight reaches rank
    * ceil(p · W), clamped to [1, W]; p=0 returns the EXACT min and
    * p=1 the EXACT max (the sidecar, not the ladder — surviving ladder
    * extremes are only bound-accurate), and interior answers clamp
    * into [lo, hi]. */
  def quantile(p: Double): Double = {
    if (p <= 0.0) return lo
    if (p >= 1.0) return hi
    val items = weighted
    val w = totalWeight
    val target = math.min(w, math.max(1L, math.ceil(p * w).toLong))
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target)
        return math.min(hi, math.max(lo, items(i)._1))
      i += 1
    }
    hi
  }
}

/** Streaming-capable quantile sketch as a native Catalyst aggregate —
  * the mergeable companion to `Corpus.sampledQuantiles` (p70) the way
  * [[KmvSketch]] is to exact distinct counts: bounded O(k log(n/k))
  * state per group, set-union-and-compact merge, so map-side partial
  * aggregation works like any built-in agg and the serialized ladder
  * is legal Structured Streaming state (windowed corpus-health
  * quantiles over an endless stream — `Streams.windowedQuantiles`).
  *
  * `graft_kll(double_col, k, p1, p2, …)` returns array<double>, one
  * entry per requested probability. Rank-error contract (deterministic
  * alternating-parity KLL/MRL compaction): a level-i compaction
  * displaces any rank by at most its item weight 2^i, and level i
  * compacts at most n/(k·2^i) times (each consumes k·2^i inputs'
  * worth), so the absolute rank error is ≤ Σ_i n/(k·2^i) · 2^i =
  * n·L/k with L = ⌈log2(n/k)⌉ levels — KllSpec asserts this hard
  * bound plus a far tighter empirical one (the parity alternation
  * cancels consecutive errors instead of letting them accumulate with
  * one sign). Below k inputs the sketch is EXACT (level 0 never
  * compacts).
  *
  * Spec-gated, not oracle-gated (the [[UnicodeNormalize]] precedent):
  * the result depends on the merge tree Spark happens to execute —
  * every merge order satisfies the error bound, but no SQL replay can
  * reproduce the exact bits, and pinning a partition layout to force
  * one would test the pin, not the operator. Exact quantile parity at
  * oracle scale is p24/p70's job.
  *
  * NULLs and NaNs are skipped (a NaN would poison every sort the
  * ladder does); an all-null group returns null.
  */
case class KllSketch(
    child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketch =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kll requires a double column, got ${child.dataType.simpleString}")
    else if (k < 8 || k > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kll requires 8 <= k <= 65536, got $k")
    else if (probs.isEmpty || probs.exists(p => p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure(
        s"graft_kll probabilities must be in [0, 1], got ${probs.mkString(",")}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.insert(d)
    }
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllBuffer): Any =
    if (buf.totalWeight == 0L) null
    else new GenericArrayData(
      probs.map(p => buf.quantile(p): Any).toArray)

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val nItems = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(
      4 + 8 + 16 + buf.levels.length * 4 + nItems * 8)
    bb.putInt(buf.levels.length)
    bb.putLong(buf.parity)
    bb.putDouble(buf.lo)
    bb.putDouble(buf.hi)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val buf = new KllBuffer(k)
    val bb = ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt
    buf.parity = bb.getLong
    buf.lo = bb.getDouble
    buf.hi = bb.getDouble
    while (buf.levels.length < nLevels) buf.levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < nLevels) {
      val n = bb.getInt
      var j = 0
      while (j < n) { buf.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketch =
    copy(inputAggBufferOffset = offset)
}
