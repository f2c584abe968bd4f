package graft

import org.apache.spark.sql.SparkSession

/** Throwaway per-query timer (kept out of the queries map): times each
  * SparkEntry query whose name starts with one of the given prefixes at
  * the given sf dir. `sbt "runMain graft.Scratch /tmp/sf1 q36 q44"`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.range(1 << 18).selectExpr("sum(id)").collect()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[scratch] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
