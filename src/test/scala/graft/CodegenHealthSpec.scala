package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CosineSim, HyperplaneSig, JaccardSim, MinHashSigs, NgramHashes, NgramHashesPos, NgramHashesPosB, PolyHash, SimHashSig}

/** Codegen HEALTH gate for the native Catalyst expressions (VERDICT r4 #1/#2).
  *
  * The result-equality suites (PropertySpec) can never catch a broken
  * `doGenCode`: Spark's projection factory catches the Janino compile error,
  * logs one `WARN ... Expr codegen error`, and silently re-runs the
  * expression interpreted — results stay bit-identical while the entire
  * performance rationale for writing a native expression dies. That is
  * exactly how HyperplaneSig shipped for two rounds with
  * `catalyst.util.UnsafeArrayData` (wrong package; the class lives in
  * `catalyst.expressions`) in its generated Java.
  *
  * Two layers, both of which FAIL (not warn) on a codegen regression:
  *   1. [[GenerateUnsafeProjection]].generate — the raw generator has no
  *      interpreted fallback, so a compile error in the emitted Java
  *      propagates as an exception. We then evaluate the compiled projection
  *      and require bit-equality with the interpreted `eval` path.
  *   2. The DataFrame path under `spark.sql.codegen.factoryMode=CODEGEN_ONLY`
  *      (and whole-stage codegen off, so every projection goes through the
  *      factory): with that conf the factory rethrows instead of falling
  *      back, so the query itself dies if any expression's codegen breaks.
  */
class CodegenHealthSpec extends AnyFunSuite with SparkFixture {

  private def floatArr(xs: Float*): GenericArrayData =
    new GenericArrayData(xs.toArray[Any])
  private def strArr(xs: String*): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  /** Compile expr's generated Java (throws on any Janino error), run it on
    * `row`, and pin the result to the interpreted eval. */
  private def compiledEqualsInterpreted(expr: Expression, row: InternalRow): Unit = {
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // no fallback here
    val compiled = proj(row).get(0, expr.dataType)
    val interpreted = expr.eval(row)
    (compiled, interpreted) match {
      case (c: org.apache.spark.sql.catalyst.util.ArrayData,
            i: org.apache.spark.sql.catalyst.util.ArrayData) =>
        assert(c.toLongArray().toSeq == i.toLongArray().toSeq)
      case (c, i) => assert(c == i)
    }
  }

  test("CosineSim codegen compiles and matches interpreted eval") {
    val ref = (o: Int) => BoundReference(o, ArrayType(FloatType, containsNull = true), nullable = true)
    val row = new GenericInternalRow(Array[Any](
      floatArr(1.0f, 2.0f, 3.0f), floatArr(-0.5f, 4.0f, 0.25f)))
    compiledEqualsInterpreted(CosineSim(ref(0), ref(1)), row)
  }

  test("JaccardSim codegen compiles and matches interpreted eval (string + long)") {
    val sRef = (o: Int) => BoundReference(o, ArrayType(StringType, containsNull = true), nullable = true)
    val sRow = new GenericInternalRow(Array[Any](
      strArr("ab", "bc", "cd", "ab"), strArr("bc", "xy", "cd")))
    compiledEqualsInterpreted(JaccardSim(sRef(0), sRef(1)), sRow)

    val lRef = (o: Int) => BoundReference(o, ArrayType(LongType, containsNull = true), nullable = true)
    val lRow = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](1L, 2L, 3L)),
      new GenericArrayData(Array[Any](3L, 4L))))
    compiledEqualsInterpreted(JaccardSim(lRef(0), lRef(1)), lRow)
  }

  test("HyperplaneSig codegen compiles and matches interpreted eval") {
    val vec = BoundReference(0, ArrayType(FloatType, containsNull = true), nullable = true)
    val row = new GenericInternalRow(Array[Any](
      floatArr(0.3f, -1.2f, 0.01f, 2.5f, -0.7f)))
    compiledEqualsInterpreted(
      HyperplaneSig(vec, Literal(8, IntegerType), Literal(8, IntegerType)), row)
  }

  test("PolyHash codegen compiles and matches interpreted eval") {
    val ref = BoundReference(0, StringType, nullable = true)
    for (s <- Seq("the fast key order", "", "café 中文 𝄞")) {
      val row = new GenericInternalRow(Array[Any](UTF8String.fromString(s)))
      compiledEqualsInterpreted(PolyHash(ref), row)
    }
  }

  test("MinHashSigs codegen compiles and matches interpreted eval") {
    val ref = BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true)
    val row = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L, 999999999L, 31337L))))
    compiledEqualsInterpreted(MinHashSigs(ref, Literal(16, IntegerType)), row)
  }

  test("SimHashSig codegen compiles and matches interpreted eval (incl. bit 63)") {
    val ref = BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true)
    val row = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L, 999999999L, 31337L, 777L))))
    compiledEqualsInterpreted(SimHashSig(ref, Literal(64, IntegerType)), row)
    compiledEqualsInterpreted(SimHashSig(ref, Literal(30, IntegerType)), row)
  }

  test("NgramHashes codegen compiles and matches interpreted eval (incl. short input)") {
    val ref = BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true)
    val row = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L, 999999999L, 12L, 874563L, 31337L))))
    compiledEqualsInterpreted(NgramHashes(ref, Literal(3, IntegerType)), row)
    compiledEqualsInterpreted(NgramHashes(ref, Literal(5, IntegerType)), row)
    val short = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L))))
    compiledEqualsInterpreted(NgramHashes(ref, Literal(3, IntegerType)), short)
  }

  test("NgramHashesPos codegen compiles and matches interpreted eval (rolling + fallback)") {
    val ref = BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true)
    // in-domain (rolling path)
    val row = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L, 999999999L, 12L, 874563L, 31337L))))
    compiledEqualsInterpreted(NgramHashesPos(ref, Literal(3, IntegerType)), row)
    compiledEqualsInterpreted(NgramHashesPos(ref, Literal(5, IntegerType)), row)
    // out-of-domain element (per-window fold fallback) and short input
    val ood = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 2000000008L, 999999999L, 12L))))
    compiledEqualsInterpreted(NgramHashesPos(ref, Literal(2, IntegerType)), ood)
    val short = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L))))
    compiledEqualsInterpreted(NgramHashesPos(ref, Literal(3, IntegerType)), short)
  }

  test("NgramHashesPosB codegen compiles and matches interpreted eval (reduce-first, no fallback)") {
    val ref = BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true)
    // poly_hash-domain values (the production input)
    val row = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L, 999999999L, 12L, 874563L, 31337L))))
    compiledEqualsInterpreted(NgramHashesPosB(ref, Literal(3, IntegerType)), row)
    compiledEqualsInterpreted(NgramHashesPosB(ref, Literal(5, IntegerType)), row)
    // values past BOTH moduli and negative values: the reduce-first fold
    // keeps the rolling recurrence exact (no fallback branch exists)
    val wide = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 2000000008L, -7L, 998244353L, 12L))))
    compiledEqualsInterpreted(NgramHashesPosB(ref, Literal(2, IntegerType)), wide)
    compiledEqualsInterpreted(NgramHashesPosB(ref, Literal(4, IntegerType)), wide)
    val short = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array[Any](874563L, 12L))))
    compiledEqualsInterpreted(NgramHashesPosB(ref, Literal(3, IntegerType)), short)
  }

  test("PqNearest codegen compiles and matches interpreted eval " +
      "(incl. the (d, code) tie-break and the empty-candidates null)") {
    val svRef = BoundReference(0,
      ArrayType(FloatType, containsNull = true), nullable = true)
    val candType = ArrayType(StructType(Seq(
      StructField("code", LongType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = true),
        nullable = false))), containsNull = true)
    val candRef = BoundReference(1, candType, nullable = true)
    def cand(code: Long, cs: Double*): GenericInternalRow =
      new GenericInternalRow(Array[Any](code,
        new GenericArrayData(cs.toArray[Any])))
    def rowOf(sv: GenericArrayData, cands: GenericInternalRow*)
        : GenericInternalRow =
      new GenericInternalRow(Array[Any](sv,
        new GenericArrayData(cands.toArray[Any])))
    val expr = graft.functions.PqNearest(svRef, candRef)
    def check(row: InternalRow): Unit = {
      val proj = GenerateUnsafeProjection.generate(Seq(expr)) // no fallback
      val compiled = proj(row)
      val interpreted = expr.eval(row)
      if (interpreted == null) assert(compiled.isNullAt(0))
      else {
        val c = compiled.getStruct(0, 2)
        val i = interpreted.asInstanceOf[InternalRow]
        assert(java.lang.Double.compare(c.getDouble(0), i.getDouble(0)) == 0
          && c.getLong(1) == i.getLong(1))
      }
    }
    val sv = floatArr(0.5f, -0.25f, 1.0f, 0.0f)
    check(rowOf(sv,
      cand(3L, 0.5, -0.25, 1.0, 0.0), // exact hit, d = 0
      cand(1L, 0.5, -0.25, 1.0, 0.0), // duplicate → tie, lower code wins
      cand(2L, 9.0, 9.0, 9.0, 9.0)))
    check(rowOf(sv, cand(7L, 0.1, 0.2, 0.3, 0.4)))
    check(rowOf(sv)) // empty candidates → null (array_min semantics)
    // and the winner really is the tie-broken lower code
    val win = expr.eval(rowOf(sv,
      cand(3L, 0.5, -0.25, 1.0, 0.0),
      cand(1L, 0.5, -0.25, 1.0, 0.0))).asInstanceOf[InternalRow]
    assert(win.getLong(1) == 1L && win.getDouble(0) == 0.0d)
  }

  test("CosArgmax codegen compiles and matches interpreted eval " +
      "(incl. the (ns, cell) tie-break and empty-candidates null)") {
    val vecRef = BoundReference(0,
      ArrayType(FloatType, containsNull = true), nullable = true)
    val candType = ArrayType(StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = true),
        nullable = false))), containsNull = true)
    val candRef = BoundReference(1, candType, nullable = true)
    def cand(cell: Long, cs: Double*): GenericInternalRow =
      new GenericInternalRow(Array[Any](cell,
        new GenericArrayData(cs.toArray[Any])))
    def rowOf(vec: GenericArrayData, cands: GenericInternalRow*)
        : GenericInternalRow =
      new GenericInternalRow(Array[Any](vec,
        new GenericArrayData(cands.toArray[Any])))
    val expr = graft.functions.CosArgmax(vecRef, candRef)
    def check(row: InternalRow): Unit = {
      val proj = GenerateUnsafeProjection.generate(Seq(expr)) // no fallback
      val compiled = proj(row)
      val interpreted = expr.eval(row)
      if (interpreted == null) assert(compiled.isNullAt(0))
      else assert(compiled.getLong(0) == interpreted.asInstanceOf[Long])
    }
    val vec = floatArr(1.0f, 0.0f, -0.5f)
    check(rowOf(vec,
      cand(2L, 1.0, 0.0, -0.5), // cosine 1 — the winner
      cand(1L, -1.0, 0.0, 0.5),
      cand(0L, 0.0, 1.0, 0.0))) // orthogonal → rounded 0
    // exact tie (duplicated centroid) → lower cell wins
    check(rowOf(vec,
      cand(5L, 1.0, 0.0, -0.5),
      cand(3L, 1.0, 0.0, -0.5)))
    check(rowOf(vec)) // empty candidates → null
    // zero-norm centroid: null cosine sorts FIRST (array_min struct
    // semantics) — degenerate, documented, still deterministic
    check(rowOf(vec, cand(9L, 0.0, 0.0, 0.0), cand(4L, 1.0, 0.0, -0.5)))
    assert(expr.eval(rowOf(vec,
      cand(5L, 1.0, 0.0, -0.5),
      cand(3L, 1.0, 0.0, -0.5))).asInstanceOf[Long] == 3L)
  }

  test("query path survives CODEGEN_ONLY (no silent interpreted fallback)") {
    import spark.implicits._
    CosineSim.register(spark)
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevWhole = spark.conf.getOption("spark.sql.codegen.wholeStage")
    // CODEGEN_ONLY turns the factory's silent catch-and-fallback into a
    // throw; wholeStage off routes every projection through that factory.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val out = Seq(
        (Seq(1.0f, 0.0f, 2.0f), Seq(0.5f, 1.5f, -1.0f), Seq("ab", "bc"), Seq("bc", "cd"))
      ).toDF("a", "b", "sa", "sb")
        .select(
          expr("cosine_sim(a, b)").as("cos"),
          expr("jaccard_sim(sa, sb)").as("jac"),
          expr("hyperplane_sig(a, 4, 8)").as("sig"),
          expr("poly_hash(sa[0])").as("ph"),
          expr("minhash_sigs(transform(sa, t -> poly_hash(t)), 4)").as("mh"),
          expr("simhash_sig(transform(sa, t -> poly_hash(t)), 64)").as("sh"),
          expr("ngram_hashes(transform(sa, t -> poly_hash(t)), 2)").as("ng"),
          expr("ngram_hashes_pos(transform(sa, t -> poly_hash(t)), 2)").as("np"),
          expr("pq_nearest(a, array(named_struct(" +
            "'code', CAST(1 AS BIGINT), 'centroid', array(0.1D, 0.2D, 0.3D))," +
            " named_struct('code', CAST(0 AS BIGINT), " +
            "'centroid', array(1.0D, 0.0D, 2.0D)))).code").as("pqc"),
          expr("cos_argmax(a, array(named_struct(" +
            "'cell', CAST(7 AS BIGINT), 'centroid', array(0.0D, 1.0D, 0.0D))," +
            " named_struct('cell', CAST(4 AS BIGINT), " +
            "'centroid', array(1.0D, 0.0D, 2.0D))))").as("cam"))
        .collect()
      assert(out.length == 1)
      assert(out.head.getAs[scala.collection.Seq[Long]]("sig").length == 4)
      assert(out.head.getAs[scala.collection.Seq[Long]]("mh").length == 4)
      assert(out.head.getAs[scala.collection.Seq[Long]]("ng").length == 1)
      assert(out.head.getAs[scala.collection.Seq[Long]]("np").length == 1)
      assert(out.head.getAs[Long]("pqc") == 0L) // exact match wins
      assert(out.head.getAs[Long]("cam") == 4L) // parallel vector wins
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevWhole.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
    }
  }
}
