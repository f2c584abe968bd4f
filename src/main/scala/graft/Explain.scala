package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted physical plan and timing for one or more
  * queries. Usage: runMain graft.Explain <sfDir> <queryName> [queryName...]
  * (no names → all queries, timing only).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: unknown query ==")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (args.length > 1) {
            println(s"\n========== $name ==========")
            df.explain("formatted")
          }
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"== $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs ==")
          if (sys.env.contains("SPARK_GRAFT_CLEARCACHE")) spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
