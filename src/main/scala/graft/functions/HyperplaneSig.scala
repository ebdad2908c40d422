package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: banded random-hyperplane LSH signature of a
  * float/double vector — `hyperplane_sig(vec, bands, bits)` returns
  * `array<bigint>` of length `bands`, each element a `bits`-bit signature.
  *
  * Hyperplane components are pseudo-random ±1 signs derived from BIT 15 of
  * an LCG state (`(((1103515245 * idx + 12345) mod 2^31) div 2^15) mod 2`
  * over `idx = (band * bits + row) * dim + k`) — pure mod-arithmetic, so
  * the DuckDB oracle regenerates IDENTICAL signatures (no stored model, no
  * engine-specific hash). Bit 15, NOT bit 0: the LCG multiplier and
  * increment are both odd and `mod 2^31` preserves parity, so the low bit
  * is exactly `(idx + 1) mod 2` — with a fixed even dim every "random"
  * hyperplane collapses to the same ±alternating vector and the whole LSH
  * degenerates to 2 buckets (this library shipped that bug once; the
  * bucket-growth property test now pins it). Middle LCG bits pass the
  * distribution tests that low bits famously fail.
  * Bit r of a band is `1` iff the dot product of the
  * vector with hyperplane (band*bits + r) is ≥ 0, folded MSB-first
  * (`acc*2 + bit`), accumulating in doubles sequentially over ascending k —
  * the same operation order as the HOF form it replaces and the oracle's
  * `list_reduce`/`list_sum`, so signatures are bit-identical across all
  * three.
  *
  * Why native (same rationale as [[CosineSim]]): the HOF form is a
  * triple-nested interpreted lambda (bands × bits × dim frames per row,
  * ~10 ms/vector) because HigherOrderFunction has no codegen. This runs as
  * one fused loop nest inside whole-stage codegen — the signature stage of
  * every embedding-LSH query (dedup + ANN) sits on it.
  *
  * Scale knob: buckets per band = 2^bits, so `bits` must grow with corpus
  * size (target ≈ log2(N / desired-bucket-size); 8 bits suits the 5e3-row
  * fixtures, a 1e9-vector corpus wants ≥ 16) — callers pass it explicitly,
  * nothing is hard-coded here. PropertySpec pins both the HOF equivalence
  * and that bucket count grows as bits widen.
  *
  * Null semantics: null vector, null band/bit count, or a null element
  * yields null. `bands`/`bits` must be foldable positive ints (bits ≤ 62
  * so the fold stays in a long).
  */
case class HyperplaneSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  private def elemIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    def intLit(e: Expression): Option[Int] =
      if (e.foldable && e.dataType == IntegerType)
        Option(e.eval(null)).map(_.asInstanceOf[Int])
      else None
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<float|double> vector, got ${first.dataType.sql}")
    else (intLit(second), intLit(third)) match {
      case (Some(bands), Some(bits)) if bands >= 1 && bits >= 1 && bits <= 62 =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs foldable int bands >= 1 and 1 <= bits <= 62, " +
            s"got ${second.sql} / ${third.sql}")
    }
  }

  override def nullSafeEval(vec: Any, bandsV: Any, bitsV: Any): Any = {
    val x = vec.asInstanceOf[ArrayData]
    val bands = bandsV.asInstanceOf[Int]
    val bits = bitsV.asInstanceOf[Int]
    val n = x.numElements()
    val isF = elemIsFloat
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < bits) {
        var dot = 0d
        var k = 0
        while (k < n) {
          if (x.isNullAt(k)) return null
          val xv = if (isF) x.getFloat(k).toDouble else x.getDouble(k)
          val idx = (b.toLong * bits + r) * n + k
          dot += xv * (if ((((1103515245L * idx + 12345L) % 2147483648L) / 32768L) % 2L == 1L) 1d else -1d)
          k += 1
        }
        acc = acc * 2L + (if (dot >= 0d) 1L else 0L)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get =
      if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, bands, bits) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val dot = ctx.freshName("dot")
      val idx = ctx.freshName("idx")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands && !${ev.isNull}; $b++) {
         |  long $acc = 0L;
         |  for (int $r = 0; $r < $bits; $r++) {
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      if ($a.isNullAt($k)) { ${ev.isNull} = true; break; }
         |      final long $idx = ((long) $b * $bits + $r) * $n + $k;
         |      $dot += ${get(a, k)} *
         |        (((((1103515245L * $idx + 12345L) % 2147483648L) / 32768L) % 2L == 1L) ? 1.0 : -1.0);
         |    }
         |    if (${ev.isNull}) break;
         |    $acc = $acc * 2L + ($dot >= 0.0 ? 1L : 0L);
         |  }
         |  $out[$b] = $acc;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HyperplaneSig =
    copy(first = newFirst, second = newSecond, third = newThird)
}
