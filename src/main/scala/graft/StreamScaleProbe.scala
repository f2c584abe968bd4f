package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.{DocIngest, Joins, SourceQuota, StateStores}

/** Streaming scale probe: drives the stateful streaming operators through a
  * ~1M-row file stream with the RocksDB state store on, and records what a
  * 100-TB review actually needs to see — rows/s AND the state-store row
  * count over time, because the scale contract of every one of these
  * operators is "state is bounded by the watermark/TTL, not by the stream
  * length". A probe that only measured throughput would miss the failure
  * mode that kills long-running streams: unbounded keyed state.
  *
  * Probes (all Trigger.AvailableNow over multi-file parquet input, so the
  * run is a deterministic sequence of micro-batches):
  *
  *  - `interval_join` — [[Joins.attribution]] (stream-stream inner interval
  *    join) over 1M events (10× sf0.1, range-partitioned by ts so file
  *    arrival approximates event-time order and the watermark advances).
  *    Both join sides hold keyed state; the watermark + time-range bound
  *    must keep max live state rows ≪ input rows.
  *  - `content_dedup` — [[graft.ops.Dedup.streamingContentDedup]]
  *    (dropDuplicatesWithinWatermark) over 1M docs: dedup state must track
  *    rate × watermark, not corpus size.
  *  - `source_quota` — [[SourceQuota.sourceQuota]] (transformWithState +
  *    TTL ValueState) over 1M docs: state is one counter per live source
  *    (bounded by distinct sources — single digits here — never by rows).
  *  - `doc_ingest` — the full [[DocIngest]] pipeline (watermarked dedup →
  *    Bloom gate → quality routing → metrics) over 1M docs: the end-to-end
  *    rows/s number for the ingest path, with the driver-side Bloom filter
  *    staying fixed-size across batches.
  *
  * Output: one JSON artifact (default STREAMPROBE.json in cwd, override
  * with SPARK_GRAFT_STREAMPROBE_OUT) with, per probe: input rows, output
  * rows, wall sec, rows/s, micro-batch count, and per-state-operator
  * max/final state rows + memory — committed each round so the
  * state-boundedness claim is diffable evidence, not prose.
  *
  * Run: sbt "runMain graft.StreamScaleProbe [eventMult] [docMult]"
  * (defaults 10 and 200 → 1M events and 1M docs from sf0.1).
  */
object StreamScaleProbe {

  /** Sink that only counts rows per table — the probe measures the
    * pipeline, not sink materialization (1M accepted docs as collected
    * Rows would measure driver heap instead).
    */
  final class CountingSink extends graft.sink.Sink {
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    override def append(df: DataFrame, table: String): Unit =
      synchronized { counts(table) += df.count() }
  }

  final case class StateOpStats(
      name: String, maxRows: Long, finalRows: Long, maxMemBytes: Long)

  final case class ProbeResult(
      name: String, inputRows: Long, outputRows: Long, sec: Double,
      batches: Int, state: Seq[StateOpStats])

  /** Run a streaming query to completion (AvailableNow) and fold its
    * progress history into per-state-operator max/final stats.
    */
  private def runProbe(name: String, outputRows: () => Long)(
      start: => StreamingQuery): ProbeResult = {
    val t0 = System.nanoTime()
    val q = start
    // Drain-and-stop rather than awaitTermination: a query holding TTL'd
    // state (source_quota) keeps scheduling batches under AvailableNow
    // until the TTL clock runs out — and even processAllAvailable blocks on
    // that self-triggering. The probe's scope is the real input, so poll
    // until data has been seen and the latest ticks are empty (or the
    // query terminated on its own), then stop.
    var drained = false
    while (!drained && q.isActive) {
      Thread.sleep(2000)
      val ps = q.recentProgress
      drained = ps.length >= 3 && ps.map(_.numInputRows).sum > 0 &&
        ps.takeRight(2).forall(_.numInputRows == 0)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    if (q.isActive) q.stop()
    q.awaitTermination()
    val progress = q.recentProgress.toSeq
    val inputRows = progress.map(_.numInputRows).sum
    // batches that processed data (AvailableNow emits a final empty tick;
    // TTL'd state can add more) — rows/s uses the wall between start and
    // drain detection, so it is conservative by up to one poll interval
    val batches = progress.count(_.numInputRows > 0)
    val opNames = progress.flatMap(_.stateOperators.map(_.operatorName)).distinct
    val state = opNames.map { op =>
      val series = progress.flatMap(_.stateOperators.filter(_.operatorName == op))
      StateOpStats(op,
        maxRows = series.map(_.numRowsTotal).max,
        finalRows = series.last.numRowsTotal,
        maxMemBytes = series.map(_.memoryUsedBytes).max)
    }
    val r = ProbeResult(name, inputRows, outputRows(), sec, batches, state)
    println(f"[streamprobe] $name: ${r.inputRows} rows in ${r.sec}%.1fs " +
      f"(${r.inputRows / r.sec}%.0f rows/s, ${r.batches} batches, out=${r.outputRows}) " +
      r.state.map(s => s"${s.name}: max=${s.maxRows} final=${s.finalRows} rows").mkString("; "))
    r
  }

  def main(args: Array[String]): Unit = {
    val eventMult = args.headOption.map(_.toInt).getOrElse(10)
    val docMult = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StateStores.useRocksDB(spark) // the 100-TB state-store configuration
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/graft-streamprobe"
    val Files = 40 // per-trigger 4 → 10 micro-batches

    // ---- inputs (kept across runs — delete $out to regenerate) -----------
    // events ×eventMult: same users (denser timelines), ts jittered per
    // copy; range-partitioned by ts so file listing order ≈ event-time
    // order and the watermark advances realistically between batches.
    val haveInputs = new java.io.File(s"$out/docs/_SUCCESS").exists() &&
      new java.io.File(s"$out/events/_SUCCESS").exists()
    val copies = explode(sequence(lit(0), lit(eventMult - 1))).as("k")
    if (!haveInputs) {
    graft.sources.Tables.events(spark, base)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"), copies)
      .select((col("event_id") * eventMult + col("k")).as("event_id"),
        expr("ts + make_interval(0, 0, 0, 0, 0, 0, k * 7)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .repartitionByRange(Files, col("ts"))
      .write.mode("overwrite").parquet(s"$out/events")
    // docs ×docMult with a synthetic ingest_ts advancing one MINUTE per
    // copy wave: the stream spans ~docMult minutes of event time — many
    // multiples of the 10-minute dedup watermark, so eviction must actually
    // happen for the state-rows metric to stay bounded (a span shorter than
    // the watermark would hold every hash forever and prove nothing).
    // Every 20th copy reuses the previous copy's text → ~5% true
    // in-watermark (1 minute apart) duplicates for the dedup stages.
    val dcopies = explode(sequence(lit(0), lit(docMult - 1))).as("k")
    graft.sources.Tables.documents(spark, base)
      .select(col("doc_id"), col("text"), col("source"), dcopies)
      .select((col("doc_id") * docMult + col("k")).as("doc_id"),
        expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, k, 0)")
          .as("ingest_ts"),
        concat(col("text"), lit(" uniq"),
          when(pmod(col("k"), lit(20)) === 1, col("doc_id") * docMult + col("k") - 1)
            .otherwise(col("doc_id") * docMult + col("k"))).as("text"),
        col("source"))
      .repartitionByRange(Files, col("ingest_ts"))
      .write.mode("overwrite").parquet(s"$out/docs")
    // The file source admits files in MTIME order, and 32 parallel write
    // tasks finish in arbitrary order — without re-stamping, batch arrival
    // is random in event time and most rows land behind the watermark as
    // "late" drops. part-file NAME order IS range (= time) order, so stamp
    // mtimes along it to make arrival ≈ event-time order, the shape a real
    // time-partitioned ingest directory has.
    for (dir <- Seq(s"$out/events", s"$out/docs")) {
      val fs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val t0 = System.currentTimeMillis() - fs.length * 2000L
      fs.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }
    }
    }

    val eventSchema = spark.read.parquet(s"$out/events").schema
    val docSchema = spark.read.parquet(s"$out/docs").schema
    def eventStream() = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", Files / 10).parquet(s"$out/events")
    def docStream() = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", Files / 10).parquet(s"$out/docs")
    def ckpt(tag: String): String = {
      val d = s"$out/ckpt-$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)); d
    }

    val results = scala.collection.mutable.ArrayBuffer[ProbeResult]()

    // ---- probe 1: stream-stream interval join ----------------------------
    locally {
      @volatile var n = 0L
      results += runProbe("interval_join", () => n) {
        val s = eventStream()
        Joins.attribution(s, s).writeStream
          .option("checkpointLocation", ckpt("join"))
          .trigger(Trigger.AvailableNow())
          .foreachBatch((b: DataFrame, _: Long) => n += b.count()).start()
      }
    }

    // ---- probe 2: watermarked content dedup ------------------------------
    locally {
      @volatile var n = 0L
      results += runProbe("content_dedup", () => n) {
        graft.ops.Dedup.streamingContentDedup(docStream())
          .writeStream
          .option("checkpointLocation", ckpt("dedup"))
          .trigger(Trigger.AvailableNow())
          .foreachBatch((b: DataFrame, _: Long) => n += b.count()).start()
      }
    }

    // ---- probe 3: per-source quota (transformWithState + TTL) ------------
    locally {
      @volatile var n = 0L
      results += runProbe("source_quota", () => n) {
        SourceQuota.sourceQuota(docStream(), quota = 100000L)
          .writeStream
          .option("checkpointLocation", ckpt("quota"))
          .trigger(Trigger.AvailableNow())
          .foreachBatch(
            (b: org.apache.spark.sql.Dataset[SourceQuota.QuotaDecision], _: Long) =>
              n += b.count()).start()
      }
    }

    // ---- probe 4: full doc-ingest pipeline -------------------------------
    locally {
      val sink = new CountingSink
      results += runProbe("doc_ingest",
        () => sink.counts("accepted_documents") + sink.counts("rejected_documents")) {
        DocIngest.startAvailableNow(spark,
          docStream().select(col("doc_id"), col("ingest_ts"), col("text")),
          ckpt("ingest"), sink)
      }
    }

    // ---- artifact ---------------------------------------------------------
    val outFile = sys.env.getOrElse("SPARK_GRAFT_STREAMPROBE_OUT", "STREAMPROBE.json")
    val body = results.map { r =>
      val st = r.state.map(s =>
        f"""      {"operator": "${s.name}", "max_rows": ${s.maxRows}, "final_rows": ${s.finalRows}, "max_mem_bytes": ${s.maxMemBytes}}""")
        .mkString("[\n", ",\n", "\n    ]")
      f"""  {"probe": "${r.name}", "input_rows": ${r.inputRows}, "output_rows": ${r.outputRows}, "sec": ${r.sec}%.2f, "rows_per_sec": ${r.inputRows / r.sec}%.0f, "batches": ${r.batches}, "state_operators": $st}"""
    }.mkString(",\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      s"""{"event_mult": $eventMult, "doc_mult": $docMult, "state_store": "rocksdb", "probes": [\n$body\n]}\n""")
    println(s"[streamprobe] wrote $outFile")
    spark.stop()
  }
}
