package graft

import org.apache.spark.sql.SparkSession

/** Focused measurement for the vocabulary-build scale path: 256 merges
  * over the 10× ScaleProbe corpus. Two trainers:
  *   - `local` (default): one distributed vocab pass + driver-local merge
  *     loop over the trainCap most frequent word types
  *     ([[graft.ops.BPE.bpeMergesLocal]]) — the shipped remedy;
  *   - `dist`: the distributed incremental loop with the same cap —
  *     measured >15 minutes at 256 merges (killed), because ~3 job
  *     schedules + fresh codegen per sequential merge dominate however
  *     small the capped data is (SURVEY §8 round-8 finding).
  * Run after `runMain graft.ScaleProbe` has written /tmp/graft-scale10.
  *
  * Usage: sbt "runMain graft.BpeCapProbe [local|dist] [merges] [cap] [dir]"
  */
object BpeCapProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("local")
    val merges = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val cap = args.drop(2).headOption.map(_.toInt).getOrElse(4096)
    val dir = args.drop(3).headOption.getOrElse("/tmp/graft-scale10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val n =
      if (mode == "dist")
        graft.ops.BPE.bpeMerges(docs, merges = merges, trainCap = cap).count()
      else
        graft.ops.BPE.bpeMergesLocal(docs, merges = merges, trainCap = cap).count()
    println(f"[bpecap] mode=$mode bpe_merges=$merges trainCap=$cap on $dir: " +
      f"$n merges in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
