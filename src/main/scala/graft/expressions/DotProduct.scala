package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two double arrays.
  *
  * The Column-API equivalent — `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` — is a higher-order function, which Catalyst evaluates
  * interpreted (lambda dispatch per element, boxed accumulator) and which
  * breaks the surrounding whole-stage-codegen span. This expression
  * compiles to a tight primitive loop inside the generated code, keeping
  * the embedding similarity operators (Similarity, Dedup.embedding*)
  * fully codegen'd — the difference is ~4× on the brute-force pair scan.
  *
  * Null semantics MATCH the HOF fold exactly (so the
  * [[DotProductRewrite]] optimizer rule is semantics-preserving on every
  * input, not just the clean ones): NULL if either array is NULL, if the
  * lengths differ (zip_with null-pads the shorter side, poisoning the
  * sum), or if any element is NULL. Otherwise the summation is
  * sequential by index, identical to the HOF fold and to the DuckDB
  * oracle's list_reduce — results stay bit-exact. The per-element null
  * probes are emitted only when the input types admit null elements.
  *
  * Registered as SQL function `graft_dot` by [[graft.GraftExtensions]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // null also on length mismatch / null elements, independent of child
  // nullability
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  private def elementsMayBeNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsMayBeNull
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullProbe =
        if (elementsMayBeNull)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullProbe
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
}
