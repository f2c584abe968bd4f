package graft

import org.apache.spark.sql.SparkSession

/** Variance profiler for the adaptive-IVF derivation family (r16, VERDICT
  * r15 #4): q121 swung 3.4 ↔ 9.0 s across single-run benches on unchanged
  * code — the one query whose swing can move the bench total ~6% on its
  * own. This main runs q36 and q121 ALTERNATING, `reps` times each in one
  * session (the MEDIA_AB same-session pattern), timing each rep exactly
  * the way Bench does (`.count()` + `clearCache()` between), and records
  * per-rep GC time so the committed artifact attributes the swing instead
  * of restating it. The first rep pays the session-memoized derivation
  * jobs (KMeans model + nprobe tune + sub-bucket calibration — the
  * BoundedLru memos are plan-keyed and session-lived, exactly as in a
  * Bench pass), so cold-vs-warm splits the derivation cost out of the
  * serving cost; GC deltas split allocator pressure out of both.
  *
  * Usage: runMain graft.DerivProf [sfDir] [reps] [key=value ...]
  * (default sf0.1, 5). Trailing key=value args are applied as session
  * confs BEFORE any query runs — the r17 knob harness for the q121
  * bimodal-JIT experiment (VERDICT r16 #3): e.g.
  * `spark.sql.codegen.hugeMethodLimit=8000`,
  * `spark.sql.codegen.wholeStage=false`. The conf set is echoed into
  * the JSON artifact so each committed arm names its knob.
  * SPARK_GRAFT_DERIVPROF_QUERIES (comma list) narrows the query set.
  * Output: one JSON line (grep '^{').
  */
object DerivProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val confs = args.drop(2).filter(_.contains("="))
      .map { a => val i = a.indexOf('='); (a.take(i), a.drop(i + 1)) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    // the Bench warmup
    spark.range(1 << 18).selectExpr("sum(id)").collect()
    graft.sources.Tables.lineitem(spark, sfDir).limit(1000)
      .groupBy("l_returnflag").count().collect()

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val names = sys.env.get("SPARK_GRAFT_DERIVPROF_QUERIES")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq("q36_ann_ivf_topk", "q121_ann_ivf_derived_subbucket"))
    val runs = scala.collection.mutable.ArrayBuffer[(String, Int, Double, Double)]()
    for (rep <- 0 until reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val gs = (gcMillis() - g0) / 1e3
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      runs += ((name, rep, dt, gs))
      println(f"[derivprof] $name rep=$rep sec=$dt%.2f gc_sec=$gs%.2f")
    }
    // even lengths average the two middles (ADVICE r16): the upper-middle
    // convention biased the 4-warm-rep median toward q121's SLOWER
    // compiled-plan mode
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val perQuery = names.map { n =>
      val rs = runs.filter(_._1 == n)
      val cold = rs.head._3
      val warm = rs.tail.map(_._3).toSeq
      val gcAll = rs.map(_._4).toSeq
      val repJson = rs.map { case (_, r, d, g) =>
        f"""{"rep": $r, "sec": $d%.2f, "gc_sec": $g%.2f}"""
      }.mkString("[", ", ", "]")
      f""""$n": {"cold_sec": $cold%.2f, "warm_median_sec": ${med(warm)}%.2f, """ +
        f""""median_sec": ${med(rs.map(_._3).toSeq)}%.2f, """ +
        f""""gc_median_sec": ${med(gcAll.toSeq)}%.2f, "reps": $repJson}"""
    }.mkString("{", ", ", "}")
    val confJson = confs.map { case (k, v) => s""""$k": "$v"""" }
      .mkString("{", ", ", "}")
    println(s"""{"metric":"derivprof","sf":"$sfDir","reps":$reps,"conf":$confJson,"queries":$perQuery}""")
    spark.stop()
  }
}
