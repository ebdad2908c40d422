package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the MinHash signature vector —
  * `minhash_sigs(shl, nPerms)` returns `array<bigint>` of length `nPerms`
  * where element p = min over the shingle-hash set of the affine
  * permutation `((2p+1)·x + (p²·7919 + 1)) mod 1e9+7`. Exactly the value
  * of the HOF form `transform(sequence(0, n-1), p -> array_min(
  * transform(shl, x -> ...)))` that the shared LSH index was built on,
  * and of the DuckDB oracles' `list_min(list_transform(...))` twin
  * (PropertySpec pins the equivalence).
  *
  * Why native (the [[CosineSim]] rationale): the HOF form allocates an
  * intermediate array and runs interpreted lambda frames per permutation ×
  * per shingle — nPerms·|shl| ≈ 1 000 frames per document — measured
  * 2.8 s at sf0.1, the second-largest cost in the near-dup index build.
  * This is one fused two-level loop inside whole-stage codegen with a
  * single output allocation.
  *
  * Null semantics: null input or a null element yields null; an EMPTY
  * shingle set also yields null (the HOF form produces an array of
  * `array_min(empty) = null` elements — an all-null signature no band can
  * use; callers filter `size(shl) >= 2` before signing, so the only
  * change is representing "no signature" as null rather than nulls-inside,
  * which keeps the output type `containsNull = false`).
  * `nPerms` must be a foldable int in [1, 64].
  */
case class MinHashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

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
        s"$prettyName needs a foldable int nPerms in [1, 64], got ${right.sql}")
    }
  }

  override def nullSafeEval(vec: Any, nPermsV: Any): Any = {
    val x = vec.asInstanceOf[ArrayData]
    val nPerms = nPermsV.asInstanceOf[Int]
    val n = x.numElements()
    if (n == 0) return null
    val out = new Array[Long](nPerms)
    var p = 0
    while (p < nPerms) {
      val a = 2L * p + 1L
      val b = p.toLong * p * 7919L + 1L
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = (a * x.getLong(i) + b) % 1000000007L
        if (v < mn) mn = v
        i += 1
      }
      out(p) = mn
      p += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, nPerms) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val mn = ctx.freshName("mn")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |final long[] $out = new long[$nPerms];
         |for (int $p = 0; $p < $nPerms && !${ev.isNull}; $p++) {
         |  long $mn = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $v = ((2L * $p + 1L) * $a.getLong($i) + ((long) $p * $p * 7919L + 1L)) % 1000000007L;
         |    if ($v < $mn) $mn = $v;
         |  }
         |  $out[$p] = $mn;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)
}
