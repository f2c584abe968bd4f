package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the audio keep-list (r15, VERDICT r14 #2): times
  * fingerprint+cache, hub-budgeted band-pair candidates WITH the in-join
  * verify, and the star-rounds closure separately, so the 50× wall time
  * is attributed by measurement instead of guessed.
  * `sbt "runMain graft.AudioProf /tmp/graft-scale50"`.
  */
object AudioProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 18).selectExpr("sum(id)").collect() // warmup
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[audioprof] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val fp = t("fingerprint (decode + cache)") {
      val f = graft.ops.Multimodal
        .audioFingerprintsOfVariants(docs).cache()
      f.count()
      f
    }
    val pairs = t("pairs (hubs + collision-join + in-join verify + dedup)")(
      graft.ops.Multimodal.audioKeepListPairs(fp)
        .distinct().localCheckpoint(true))
    println(s"[audioprof] unique pair rows: ${pairs.count()}")
    t("components (star rounds)")(
      graft.ops.NearDup.components(pairs).count())
    // candidate-multiset census: how many collision rows the in-join
    // verify sees, split true/false — whether a de-clustered band key
    // (which can only cut FALSE candidates) has anything left to cut
    t("candidate census") {
      val r = graft.ops.Multimodal.audioKeepListCandidateCensus(fp)
      println(s"[audioprof] collision rows: ${r._1}  within-radius rows: " +
        s"${r._2} (${"%.1f".format(100.0 * r._2 / math.max(1, r._1))}%)")
    }
    pairs.unpersist()
    fp.unpersist()
    spark.stop()
  }
}
