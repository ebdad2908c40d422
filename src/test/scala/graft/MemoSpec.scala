package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{LlmSimilarity, NearDup}

/** The train-once-serve-many memo (graft.Memo): the registry that lets
  * composed queries (similarity_ivfpq, curation_keep_best) consume the
  * model tables their siblings trained, instead of re-running the Lloyd's /
  * label-propagation loops per query. */
class MemoSpec extends AnyFunSuite with SparkFixture {

  test("cached builds once per key, isolates keys, and clear() invalidates") {
    val app = spark.sparkContext.applicationId
    var builds = 0
    def make() = { builds += 1; spark.range(1).toDF("x") }
    val a1 = Memo.cached(app, "memospec:a")(make())
    val a2 = Memo.cached(app, "memospec:a")(make())
    assert(a1 eq a2, "same key must serve the same frame instance")
    assert(builds == 1, "second lookup must not re-run the builder")
    Memo.cached(app, "memospec:b")(make())
    assert(builds == 2, "distinct key must build")
    // a different applicationId namespace can never serve this frame
    Memo.cached(app + "-other", "memospec:a")(make())
    assert(builds == 3, "distinct appId must build")
    Memo.clear()
    Memo.cached(app, "memospec:a")(make())
    assert(builds == 4, "clear() must force a rebuild")
  }

  test("trainers serve the memoized model table within a session") {
    Memo.clear()
    // IVF cells: second call must be the SAME frame (no retraining)
    val c1 = LlmSimilarity.ivfTrained(spark, sfSmall)
    val c2 = LlmSimilarity.ivfTrained(spark, sfSmall)
    assert(c1 eq c2)
    // cluster labels: shared between dedup_clusters and curation_keep_best
    val l1 = NearDup.clusterLabels(spark, sfSmall)
    val l2 = NearDup.clusterLabels(spark, sfSmall)
    assert(l1 eq l2)
    // star labels live under their OWN key — dedup_clusters_star exists to
    // exercise the star-contraction code path, so it must not be handed
    // the label-propagation result even though the values agree
    val s1 = NearDup.starLabels(spark, sfSmall)
    assert(!(s1 eq l1))
    // ...and the values DO agree (the PropertySpec equivalence, end-to-end)
    val lp = l1.orderBy(col("v")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val st = s1.orderBy(col("v")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lp.sameElements(st))
    Memo.clear()
    val c3 = LlmSimilarity.ivfTrained(spark, sfSmall)
    assert(!(c3 eq c1), "clear() must retrain")
    spark.catalog.clearCache()
    Memo.clear()
  }
}
