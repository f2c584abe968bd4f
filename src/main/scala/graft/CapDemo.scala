package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: measures WHY the df-cap escalation (q38) exists, on the
  * degenerate 2-gram vocabulary of the documents corpus.
  *
  * Measured at sf0.1 (local[32], 2026-08-12):
  *  - 2-gram vocab = 931 distinct shingles; uncapped posting join
  *    Σdf² = 73,200,955 of which 73,198,557 (99.997%) comes from shingles
  *    with df > 100 — cost concentrated in a handful of hot keys whose df
  *    (hence df²) grows with corpus size.
  *  - uncapped exact Jaccard (n=2): 19.0 s, 256 pairs.
  *  - capped maxDf=400: 15.6 s, SAME 256 pairs (the cap binds only
  *    non-discriminative keys here — zero recall loss).
  *  - capped maxDf=100: 6.5 s, 13 pairs (hot-only pairs dropped — the
  *    documented recall contract).
  *
  * The asymptotic point, not the local ratio, is the claim: hot-shingle df
  * scales linearly with corpus size, so the uncapped join cost grows
  * QUADRATICALLY (100× corpus → 10⁴× join rows from the hot keys) while
  * the capped index is bounded by cap²·vocab regardless of corpus size.
  */
object CapDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.sources.Tables.documents(spark, dir)
    val ex = docs.select(col("doc_id"),
      explode(graft.functions.ShingleSet.shingles(col("text"), 2)).as("sh"))
    val stats = ex.groupBy("sh").count()
      .agg(count(lit(1)).as("vocab"),
        sum(col("count") * col("count")).as("sumdf2"),
        coalesce(sum(when(col("count") > 100, col("count") * col("count"))), lit(0L))
          .as("hot_sumdf2"))
      .collect()(0)
    println(s"[capdemo] 2-gram vocab=${stats.getLong(0)} sumdf2=${stats.getLong(1)} " +
      s"hot_sumdf2=${stats.getLong(2)}")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[capdemo] $label: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    time("uncapped 2-gram")(
      graft.ops.NearDup.ngramJaccardPairs(docs, n = 2, minJaccard = 0.5).count())
    for (cap <- Seq(400, 100))
      time(s"capped 2-gram maxDf=$cap")(
        graft.ops.NearDup.ngramJaccardPairsCapped(docs, n = 2, minJaccard = 0.5,
          maxDf = cap).count())
    spark.stop()
  }
}
