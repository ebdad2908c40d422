package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the SimHash signature —
  * `simhash_sig(shl, bits)` returns a `bits`-wide bit pattern (bigint)
  * where bit k is set iff the majority vote over the shingle-hash set is
  * non-negative, each shingle voting ±1 via bit 15 of
  * `LCG(((2k+1)·x + k²·7919 + 1) mod 1e9+7)` — exactly the NearDup
  * dedup_simhash HOF form and its DuckDB `list_reduce` twin (PropertySpec
  * pins the equivalence; see NearDup.scala for why k enters
  * MULTIPLICATIVELY and why it is the mid LCG bit).
  *
  * Why native (the [[CosineSim]] rationale): the HOF form is a
  * double-nested interpreted aggregate — bits × |shl| ≈ 4 096 lambda
  * frames per document at 64 bits, the heaviest per-doc HOF left after
  * poly_hash/minhash_sigs went native. One fused codegen loop here.
  *
  * Bit 63 is set via Java's wrapping shift (the signature is a bit
  * pattern, not a magnitude). Null input or a null element yields null;
  * an empty set yields the all-ties pattern (every sum is 0 ⇒ every bit
  * set), matching the HOF fold. `bits` must be a foldable int in [1, 64].
  */
case class SimHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    def intLit(e: Expression): Option[Int] =
      if (e.foldable && e.dataType == IntegerType)
        Option(e.eval(null)).map(_.asInstanceOf[Int])
      else None
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<bigint> shingle set, got ${left.dataType.sql}")
    else intLit(right) match {
      case Some(n) if n >= 1 && n <= 64 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable int bits in [1, 64], got ${right.sql}")
    }
  }

  override def nullSafeEval(vec: Any, bitsV: Any): Any = {
    val x = vec.asInstanceOf[ArrayData]
    val bits = bitsV.asInstanceOf[Int]
    val n = x.numElements()
    var acc = 0L
    var k = 0
    while (k < bits) {
      var s = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val h = ((2L * k + 1L) * x.getLong(i) + (k.toLong * k * 7919L + 1L)) % 1000000007L
        s += (if ((((1103515245L * h + 12345L) % 2147483648L) / 32768L) % 2L == 1L) 1L else -1L)
        i += 1
      }
      if (s >= 0L) acc += (1L << k)
      k += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, bits) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $k = 0; $k < $bits && !${ev.isNull}; $k++) {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $h = ((2L * $k + 1L) * $a.getLong($i) + ((long) $k * $k * 7919L + 1L)) % 1000000007L;
         |    $s += ((((1103515245L * $h + 12345L) % 2147483648L) / 32768L) % 2L == 1L) ? 1L : -1L;
         |  }
         |  if (!${ev.isNull} && $s >= 0L) $acc += (1L << $k);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashSig =
    copy(left = newLeft, right = newRight)
}
