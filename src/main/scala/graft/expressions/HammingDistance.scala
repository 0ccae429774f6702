package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Allocation-free Hamming distance between two sign-pack arrays:
  * Σᵢ bitCount(a[i] ^ b[i]) — the candidate-scoring kernel of the
  * 1-bit ANN tiers ([[graft.operators.Similarity]] `binaryTopK` /
  * `ivfBinaryTopK` / the persisted `IvfIndex.topKBinary`).
  *
  * The Column-API equivalent (`aggregate(zip_with(a, b, bit_count ∘
  * xor), 0, +)`) materializes a fresh int array per candidate pair via
  * zip_with before folding it — per-candidate allocation on the
  * hottest scan of the tier, the same hotspot shape the ADC path had
  * before [[RangeFold]] (measured there: allocations made the smaller
  * scan SLOWER on warm local CPU). This expression reads both arrays
  * in place — fully codegen'd in the shortlist projection.
  *
  * Parity with the HOF form is exact (integer arithmetic, same word
  * order), so the p50/p53/p54 oracles are untouched by the swap.
  *
  * Null semantics — a deliberate mirror of the zip_with composition:
  * NULL if either input is NULL, if any element is NULL, or if the
  * lengths differ (zip_with pads the shorter side with nulls, which
  * poisons its fold to NULL; mismatched packs are a caller bug that
  * surfaces as a NULL distance, never a wrong small number).
  */
case class HammingDistance(a: Expression, b: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(a, b)

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(a.dataType) && arr(b.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"${children.map(_.dataType.simpleString)}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hamming"

  private def elementsMayBeNull: Boolean = Seq(a, b).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  override def eval(input: InternalRow): Any = {
    val av = a.eval(input)
    val bv = b.eval(input)
    if (av == null || bv == null) return null
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsMayBeNull
    var s = 0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aG = a.genCode(ctx)
    val bG = b.genCode(ctx)
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val n = ctx.freshName("n")
    val nullProbe =
      if (elementsMayBeNull)
        s"""if (${aG.value}.isNullAt($i) || ${bG.value}.isNullAt($i)) {
           |  ${ev.isNull} = true; break;
           |}""".stripMargin
      else ""
    ev.copy(code =
      code"""
        |${aG.code}
        |${bG.code}
        |boolean ${ev.isNull} = true;
        |int ${ev.value} = 0;
        |if (!${aG.isNull} && !${bG.isNull}) {
        |  int $n = ${aG.value}.numElements();
        |  if ($n == ${bG.value}.numElements()) {
        |    ${ev.isNull} = false;
        |    int $s = 0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      $nullProbe
        |      $s += java.lang.Long.bitCount(
        |        ${aG.value}.getLong($i) ^ ${bG.value}.getLong($i));
        |    }
        |    if (!${ev.isNull}) {
        |      ${ev.value} = $s;
        |    }
        |  }
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HammingDistance =
    copy(a = newChildren(0), b = newChildren(1))
}
