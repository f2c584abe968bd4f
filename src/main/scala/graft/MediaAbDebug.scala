package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the media pre-gate A/B verdict-equivalence contract:
  * replay the media_ingest_heavy probe stream batch-for-batch through
  * [[graft.streaming.MediaIngest.processBatch]] with `payloadGate` on and
  * off, and after EVERY batch diff the two arms' verdicts and sig/bands
  * index contents — printing the first divergent batch and the exact
  * media_ids involved, which the end-of-run digests cannot localize.
  *
  * Usage: runMain graft.MediaAbDebug [mediaDir] [filesPerBatch]
  */
object MediaAbDebug {
  final class MapSink extends graft.sink.Sink {
    val rows = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[(Long, String, Long)]]()
    override def append(df: DataFrame, table: String): Unit = {
      val buf = rows.getOrElseUpdate(table,
        scala.collection.mutable.ArrayBuffer.empty)
      val cols = df.columns
      buf ++= df.collect().map { r =>
        val id = r.getLong(cols.indexOf("media_id"))
        val status =
          if (cols.contains("status")) r.getString(cols.indexOf("status"))
          else if (cols.contains("reject_reason"))
            r.getString(cols.indexOf("reject_reason"))
          else table
        val dupOf =
          if (cols.contains("dup_of") && !r.isNullAt(cols.indexOf("dup_of")))
            r.getLong(cols.indexOf("dup_of"))
          else -1L
        (id, status, dupOf)
      }
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val mediaDir = args.headOption
      .getOrElse("/tmp/graft-streamprobe/media-heavy")
    val perBatch = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = new java.io.File(mediaDir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
    val batches = parts.grouped(perBatch).toSeq
    println(s"[abdebug] ${parts.length} files -> ${batches.size} batches")

    val arms = Seq(true, false).map { gate =>
      val ix = java.nio.file.Files
        .createTempDirectory(s"graft-abdebug-$gate").toString
      graft.streaming.MediaIngest.initIndex(spark, ix)
      (gate, ix, new MapSink)
    }
    def sigSet(ix: String): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$ix/sig").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def bandSet(ix: String): Set[(Long, Int, Long)] =
      spark.read.parquet(s"$ix/bands").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    batches.zipWithIndex.foreach { case (files, bi) =>
      val df = spark.read.parquet(files: _*)
      arms.foreach { case (gate, ix, sink) =>
        graft.streaming.MediaIngest.processBatch(
          df, bi.toLong, ix, sink, payloadGate = gate)
      }
      val Seq((_, ixOn, sinkOn), (_, ixOff, sinkOff)) = arms
      val (sOn, sOff) = (sigSet(ixOn), sigSet(ixOff))
      val (bOn, bOff) = (bandSet(ixOn), bandSet(ixOff))
      // routing equivalence too: every (media, status, ROOT dup_of) the
      // arms appended so far — the full verdict contract, not just the
      // index contents
      def routed(s: MapSink): Set[(Long, String, Long)] =
        s.rows.getOrElse("duplicate_media",
            scala.collection.mutable.ArrayBuffer.empty).toSet ++
          s.rows.getOrElse("rejected_media",
            scala.collection.mutable.ArrayBuffer.empty).toSet
      val (rOn, rOff) = (routed(sinkOn), routed(sinkOff))
      println(s"[abdebug] batch $bi: sig on=${sOn.size} off=${sOff.size} " +
        s"sigDiff=${(sOn diff sOff).size}/${(sOff diff sOn).size} " +
        s"bands on=${bOn.size} off=${bOff.size} " +
        s"bandDiff=${(bOn diff bOff).size}/${(bOff diff bOn).size} " +
        s"verdictDiff=${(rOn diff rOff).size}/${(rOff diff rOn).size}")
      if ((rOn diff rOff).nonEmpty || (rOff diff rOn).nonEmpty) {
        println(s"[abdebug]   only-gated verdicts: " +
          (rOn diff rOff).toSeq.sortBy(_._1).take(10))
        println(s"[abdebug]   only-nogate verdicts: " +
          (rOff diff rOn).toSeq.sortBy(_._1).take(10))
        spark.stop(); sys.exit(1)
      }
      val dOn = (sOn diff sOff).toSeq.sortBy(_._1).take(10)
      val dOff = (sOff diff sOn).toSeq.sortBy(_._1).take(10)
      if (dOn.nonEmpty || dOff.nonEmpty) {
        println(s"[abdebug]   only-gated sig: $dOn")
        println(s"[abdebug]   only-nogate sig: $dOff")
        val ids = (dOn ++ dOff).map(_._1).toSet
        def verdictsOf(s: MapSink) = s.rows.toSeq.flatMap { case (t, b) =>
          b.filter(r => ids.contains(r._1) || ids.contains(r._3))
            .map(r => s"$t:${r._1}->${r._2}/${r._3}")
        }.sorted
        println(s"[abdebug]   gated verdicts:  ${verdictsOf(sinkOn)}")
        println(s"[abdebug]   nogate verdicts: ${verdictsOf(sinkOff)}")
        // stop at first divergence — later batches only compound it
        spark.stop(); sys.exit(1)
      }
    }
    println("[abdebug] arms bit-identical on sig+bands across all batches")
    spark.stop()
  }
}
