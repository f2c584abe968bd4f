package graft.ops

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** r19 (VERDICT r18 #5): intra-query `.cache()` /  `localCheckpoint`
  * handles must be freed once the caller's action completes — WITHOUT an
  * external `clearCache()`. The free is listener-driven (asynchronous on
  * the QueryExecutionListener bus), so the assertions poll briefly.
  * Mirrors MediaIngestSpec's pinned-storage-count pattern: compare
  * against the pre-test pin count rather than zero, so pre-existing pins
  * from other suites sharing the session don't fail this one.
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def pinned(): Int =
    spark.sparkContext.getPersistentRDDs.values
      .count(_.getStorageLevel != StorageLevel.NONE)

  private def assertEventuallyFreed(before: Int, what: String): Unit = {
    val deadline = System.currentTimeMillis() + 15000
    while (pinned() > before && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    val after = pinned()
    assert(after <= before,
      s"$what left pinned blocks after its action: $before -> $after (" +
        spark.sparkContext.getPersistentRDDs.values
          .filter(_.getStorageLevel != StorageLevel.NONE)
          .map(r => s"${r.id}:${r.name}").mkString(", ") + ")")
  }

  private val docs = Seq(
    (1L, "aa bb cc dd ee ff gg hh"),
    (2L, "aa bb cc dd ee ff gg ii"),
    (3L, "zz yy xx ww vv uu tt ss"),
    (4L, "aa bb cc dd ee ff gg hh"),
    (5L, "mm nn oo pp qq rr"),
  ).toDF("doc_id", "text")

  private val emb = Seq(
    (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0),
    (2L, Seq(0.8f, 0.2f), 1), (3L, Seq(0.0f, 1.0f), 1),
    (4L, Seq(0.1f, 0.9f), 0), (5L, Seq(0.5f, 0.5f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("derived-cap pair machine frees its caches after the action") {
    spark.catalog.clearCache()
    val before = pinned()
    assert(NearDup.ngramJaccardPairsCapped(docs, n = 2).count() >= 0)
    assertEventuallyFreed(before, "ngramJaccardPairsCapped")
  }

  test("prefix-filtered jaccard frees its caches after the action") {
    spark.catalog.clearCache()
    val before = pinned()
    assert(NearDup.ngramJaccardPairs(docs, n = 2).count() >= 0)
    assertEventuallyFreed(before, "ngramJaccardPairs")
  }

  test("winnowing overlap frees its caches after the action") {
    spark.catalog.clearCache()
    val before = pinned()
    assert(TextAnalysis.winnowingOverlap(docs, k = 2, w = 2).count() >= 0)
    assertEventuallyFreed(before, "winnowingOverlap")
  }

  test("adaptive IVF with explicit nprobe frees the corpus cache " +
    "after the action (no external clearCache)") {
    spark.catalog.clearCache()
    val before = pinned()
    assert(Similarity.ivfTopKAdaptive(emb, k = 2, nprobe = 1).count() >= 0)
    assertEventuallyFreed(before, "ivfTopKAdaptive(nprobe=1)")
  }

  test("embedding near-dup grid frees the block cache after the action") {
    spark.catalog.clearCache()
    val before = pinned()
    assert(Similarity.embeddingNearDups(emb).count() >= 0)
    assertEventuallyFreed(before, "embeddingNearDups")
  }

  test("a second action on the same freed DataFrame still computes the " +
    "identical result (unpersist drops blocks, not semantics)") {
    val df = TextAnalysis.winnowingOverlap(docs, k = 2, w = 2)
    val first = df.collect().toSeq
    val second = df.collect().toSeq
    assert(first == second)
  }
}
