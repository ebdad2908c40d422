package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Operational ingestion surface: pipeline metrics via the Observation API
  * (no separate action, no accumulator plumbing) and malformed-record
  * tolerance on schema-on-read JSON — both are what keeps a 100 TB ingest
  * job observable and non-aborting on dirty data. */
class IngestionSpec extends AnyFunSuite with SparkFixture {

  test("Observation collects row/sum metrics as a side effect of one action") {
    val obs = Observation("ingest_stats")
    val df = Tables.lineitem(spark, sfSmall)
      .observe(obs, count(lit(1)).as("rows"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
      .filter(col("l_quantity") > 25.0)
    val kept = df.count()
    val row = obs.get
    assert(row("rows") == 6000L)      // observed BEFORE the filter
    assert(kept < 6000L && kept > 0L)
    assert(row("total_price").asInstanceOf[Double] > 0.0)
  }

  test("malformed JSON lines land in the corrupt-record column, not an abort") {
    val dir = "/root/repo/target/dirty_json_" + System.nanoTime()
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/part.json"),
      """{"id": 1, "v": 10.5}
        |{"id": 2, "v": not-json!!
        |{"id": 3, "v": 7.25}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column can't be queried alone off a bare scan
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    val good = df.filter(col("_corrupt_record").isNull)
      .select(sum(col("v"))).head().getDouble(0)
    assert(math.abs(good - 17.75) < 1e-9)
    df.unpersist()
  }
}
