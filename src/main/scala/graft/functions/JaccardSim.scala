package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: Jaccard similarity |A∩B| / |A∪B| between two
  * arrays treated as sets (bigint or string elements).
  *
  * Why native (same rationale as [[CosineSim]]): the composed form needs
  * `size(array_intersect(a, b))` TWICE (numerator and union denominator),
  * each an interpreted set build per candidate pair — the dominant cost of
  * the near-dup verify stage. This runs one fused hash-set pass inside
  * whole-stage codegen.
  *
  * Parity: exact integer intersection/union counts then one double
  * division — identical to the DuckDB oracle's len()-based arithmetic.
  * Null input or a null element yields null; two effectively-empty sets
  * yield null (0/0).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sim"

  private def elemOk(e: Expression) = e.dataType match {
    case ArrayType(LongType | StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left) && elemOk(right) && left.dataType.asInstanceOf[ArrayType]
        .elementType == right.dataType.asInstanceOf[ArrayType].elementType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint> or two array<string> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val setA = new java.util.HashSet[Any]()
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      setA.add(x.get(i, et)); i += 1
    }
    val seenB = new java.util.HashSet[Any]()
    var inter = 0
    var j = 0
    while (j < y.numElements()) {
      if (y.isNullAt(j)) return null
      val e = y.get(j, et)
      if (seenB.add(e) && setA.contains(e)) inter += 1
      j += 1
    }
    val union = setA.size() + seenB.size() - inter
    if (union == 0) null else inter.toDouble / union
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    def boxed(arr: String, i: String): String = et match {
      case LongType => s"java.lang.Long.valueOf($arr.getLong($i))"
      case StringType => s"$arr.getUTF8String($i)"
      case _ => throw new IllegalStateException("unreachable: checked types")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val setA = ctx.freshName("setA")
      val seenB = ctx.freshName("seenB")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      s"""
         |java.util.HashSet $setA = new java.util.HashSet();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $setA.add(${boxed(a, i)});
         |}
         |if (!${ev.isNull}) {
         |  java.util.HashSet $seenB = new java.util.HashSet();
         |  int $inter = 0;
         |  for (int $j = 0; $j < $b.numElements(); $j++) {
         |    if ($b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    Object $e = ${boxed(b, j)};
         |    if ($seenB.add($e) && $setA.contains($e)) $inter++;
         |  }
         |  if (!${ev.isNull}) {
         |    int $union = $setA.size() + $seenB.size() - $inter;
         |    if ($union == 0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = ((double) $inter) / $union; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}
