package graft

import org.apache.spark.sql.SparkSession

/** Throwaway stage-level profiler for NearDup (kept out of queries map). */
object Scratch {
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
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[scratch] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import graft.ops.NearDup
    val sh = NearDup.shingled(docs).cache()
    time("shingled")(sh.count())
    time("signatures")(NearDup.minhashSignatures(docs).count())
    time("candidates")(NearDup.lshCandidates(docs).count())
    time("neardups")(NearDup.minhashNearDups(docs).count())
    time("simhash")(NearDup.simhash(docs).count())
    time("simhash_pairs")(NearDup.simhashNearDups(docs).count())
    time("components")(NearDup.components(NearDup.minhashNearDups(docs)).count())
    time("keeplist")(NearDup.dedupKeepList(docs).count())
    spark.stop()
  }
}
