package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries run in sorted name order after a small
  * warmup (JVM/codegen/parquet-reader initialization), so per-query times
  * are comparable across rounds rather than the first slot absorbing
  * session startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: parquet reader + codegen + shuffle machinery
    try {
      spark.range(1 << 18).selectExpr("sum(id)").collect()
      graft.sources.Tables.lineitem(spark, sfDir).limit(1000)
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }
    // Two passes, report the per-query minimum: the shared host shows
    // intermittent multi-second CPU-steal spikes (identical code measured
    // 40s and 230s totals), and min-of-2 keeps one spike from dominating
    // a query's number. Caches are cleared between queries so each timing
    // is independent.
    def onePass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        name -> dt
      }
    val p1 = onePass().toMap
    val results = onePass().map { case (name, dt) =>
      name -> math.min(dt, p1.getOrElse(name, dt))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
