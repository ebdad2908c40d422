package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point. A full isolated-session test is
  * not possible here (getOrCreate would reuse the suite-shared session and
  * ignore the extensions conf), so this asserts (a) the injection wiring
  * applies cleanly to a fresh SparkSessionExtensions, and (b) the same
  * builder produces correct results via the runtime-registration path on
  * the shared session. */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("GraftExtensions injects cosine_sim without error") {
    new graft.functions.GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("registered cosine_sim computes a correct value end-to-end") {
    import spark.implicits._
    graft.functions.CosineSim.register(spark)
    val r = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).as[Double].head()
    assert(math.abs(r - 24.0 / 25.0) < 1e-12) // cos = (12+12)/(5*5)
  }
}
