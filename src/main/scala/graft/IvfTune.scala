package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adaptive-IVF serving-knob explorer: mean recall@5 of
  * [[graft.ops.Similarity.ivfTopKAdaptive]] against exact brute-force
  * truth, per nprobe — the measurement the library default is chosen from
  * (VERDICT r13 #1: the nprobe=1 default graded mean recall 0.3 at the 1×
  * iid regime, and the 1.000 at the 10×–200× clone decades is a corpus
  * artifact — true neighbors co-route with their query — not evidence).
  *
  * Two regimes:
  *  - the real 1× iid corpora (sf0.001 n=500, sf0.01 n=500, sf0.1
  *    n=2000): p = 0, cells = the 10 labels — the floor regime, exactly
  *    the one the committed probes measured 0.3 on;
  *  - a DETERMINISTIC synthetic iid corpus big enough to force the
  *    adaptive sub-plane split (`iid20000`: n = 20,000 > 4,000·2² → p = 3)
  *    — the regime the clone decades cannot measure, because hyperplane
  *    sub-buckets scatter iid neighbors where clone families co-route.
  *    Vectors are md5-derived unit-ish floats (engine-independent), so the
  *    artifact is reproducible bit-for-bit.
  *
  * Usage: runMain graft.IvfTune [sfDir | iidN]
  */
object IvfTune {
  /** Deterministic synthetic iid corpus under /tmp (idempotent):
    * component d of vector i = (md5("iid|i|d") first-4-bytes as signed
    * int) / 2^31, then L2-normalized — iid geometry with no clone
    * structure at all, reproducible bit-for-bit on any engine. Shared
    * with [[PQTune]] (the r14 floor-calibration evidence runs on the
    * same regime).
    */
  def iidCorpus(spark: SparkSession, n: Int): String = {
    val out = s"/tmp/graft-ivftune-iid-$n"
    if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists()) {
      import spark.implicits._
      spark.range(n).select(col("id").as("vec_id"))
        .repartition(32)
        .as[Long]
        .map { i =>
          val raw = (0 until graft.ops.Similarity.Dim).map { d =>
            val dig = java.security.MessageDigest.getInstance("MD5")
              .digest(s"iid|$i|$d".getBytes("UTF-8"))
            val v = ((dig(0) & 0xff) << 24) | ((dig(1) & 0xff) << 16) |
              ((dig(2) & 0xff) << 8) | (dig(3) & 0xff)
            v.toDouble / Int.MaxValue
          }
          val norm = math.sqrt(raw.map(x => x * x).sum)
          (i, raw.map(x => (x / norm).toFloat).toArray, (i % 10).toInt)
        }
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val spec = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir =
      if (spec.matches("iid\\d+")) iidCorpus(spark, spec.drop(3).toInt)
      else spec
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val budget = args.find(_.startsWith("budget=")).map(_.drop(7).toLong)
      .getOrElse(graft.ops.Similarity.CellBudget)
    val p = graft.ops.Similarity.adaptiveSubPlanes(n, budget)
    println(s"[ivftune] corpus $sfDir n=$n budget=$budget subPlanes=$p")
    // the explicit-dial sweep (population recall per nprobe — what the
    // committed IVFTUNE artifact's curve is)
    for (np <- Seq(1, 2, 3, 4, 6, 8, 10)) {
      val t0 = System.nanoTime()
      val rec = graft.ops.Similarity.annRecall(emb, nprobe = np)
        .agg(avg("recall")).head().getDouble(0)
      println(f"[ivftune] nprobe=$np%d recall@5=$rec%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    // the derivation itself: grid, chosen knob, then the derived DEFAULT
    // measured in-sample (circular by construction — the tune sample) and
    // on the disjoint holdout window (the generalization evidence)
    graft.ops.Similarity.nprobeTuneGrid(emb, budget).collect().foreach { r =>
      println(s"[ivftune] grid np=${r.getInt(0)} hits=${r.getLong(1)}/" +
        s"${graft.ops.Similarity.TuneQueries * graft.ops.Similarity.TuneK}" +
        (if (r.getBoolean(2)) " CHOSEN" else ""))
    }
    val dnp = graft.ops.Similarity.derivedNprobe(emb, budget)
    println(s"[ivftune] derivedNprobe=$dnp" +
      (if (dnp == -1) " (DEGRADE: exact probe-all-cells)" else ""))
    // r18 (VERDICT r17 #3): the TRAINED-cell router measured with the
    // SAME tune machinery — grid, derived np, and a 5-rep interleaved
    // wall-clock A/B of the current q36 serving vs trained-probed
    // serving at the trained-derived np. Opt-in via a "trained" arg.
    if (args.contains("trained")) {
      val kk = graft.ops.KMeans.adaptiveK(n)
      val tg = graft.ops.KMeans.trainedTuneGridRows(emb, kk)
      tg.foreach { case (np, h) =>
        println(s"[ivftune] trained-grid np=$np hits=$h/" +
          s"${graft.ops.Similarity.TuneQueries * graft.ops.Similarity.TuneK}")
      }
      val tnp = graft.ops.KMeans.derivedNprobeTrained(emb, kk)
      println(s"[ivftune] trained k=$kk derivedNprobeTrained=$tnp" +
        (if (tnp == -1) " (trained router ALSO misses the bar)" else ""))
      if (tnp > 0) {
        // holdout recall of the trained-probed serving at tnp
        val truthH = graft.ops.Similarity.bruteForceTopK(
          emb, graft.ops.Similarity.TuneQueries + 50,
          graft.ops.Similarity.TuneK)
          .filter(col("query_id") >= graft.ops.Similarity.TuneQueries)
          .select(col("query_id"), col("neighbor_id"))
        val gotH = graft.ops.KMeans.ivfTopKTrainedProbed(
            emb, graft.ops.Similarity.TuneK, tnp, kk)
          .filter(col("query_id") >= graft.ops.Similarity.TuneQueries &&
            col("query_id") < graft.ops.Similarity.TuneQueries + 50)
          .select(col("query_id"), col("neighbor_id"))
        val hitsH = gotH.join(truthH, Seq("query_id", "neighbor_id")).count()
        println(f"[ivftune] trained@np=$tnp holdout recall@5 = $hitsH/250 " +
          f"= ${hitsH / 250.0}%.3f")
      }
      // interleaved A/B medians: current q36 serving vs trained serving
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val reps = 5
      val cur = scala.collection.mutable.ArrayBuffer[Double]()
      val trn = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to reps) {
        spark.catalog.clearCache()
        cur += time(graft.ops.Similarity.ivfTopKAdaptive(emb).count())
        spark.catalog.clearCache()
        trn += time(
          if (tnp > 0)
            graft.ops.KMeans.ivfTopKTrainedProbed(emb, 3, tnp, kk).count()
          else graft.ops.Similarity.ivfTopKAdaptive(emb).count())
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[ivftune] A/B medians over $reps interleaved reps: " +
        f"current=${med(cur.toSeq)}%.2fs runs=${cur.map(x => f"$x%.2f").mkString(",")} " +
        f"trained=${med(trn.toSeq)}%.2fs runs=${trn.map(x => f"$x%.2f").mkString(",")}")
      spark.stop()
      return
    }
    val t1 = System.nanoTime()
    val insample = graft.ops.Similarity.annRecall(emb)
      .agg(avg("recall")).head().getDouble(0)
    val t2 = System.nanoTime()
    // 50-query disjoint window (r15, VERDICT r14 #6 — the 10-query
    // window's σ ≈ 0.04 left the point estimate with a wide interval)
    val hRows = graft.ops.Similarity.annRecallHoldout(
        emb, until = graft.ops.Similarity.TuneQueries + 50)
      .collect().map(_.getDouble(2))
    val holdout = hRows.sum / math.max(1, hRows.length)
    val hCi = if (hRows.length < 2) 0.0 else 1.96 * math.sqrt(
      hRows.map(r => (r - holdout) * (r - holdout)).sum /
        (hRows.length.toDouble * (hRows.length - 1)))
    val t3 = System.nanoTime()
    println(f"[ivftune] derived-default recall@5 in-sample=$insample%.3f " +
      f"(${(t2 - t1) / 1e9}%.1fs) holdout=$holdout%.3f ci95=±$hCi%.3f " +
      f"n=${hRows.length} (${(t3 - t2) / 1e9}%.1fs)")
    spark.stop()
  }
}
