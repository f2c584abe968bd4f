package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.JsonlSource

/** The END-TO-END corpus pipeline as one runnable artifact — the product
  * story the extension surface exists for, composed from pieces that are
  * individually oracle-checked/spec'd (VERDICT r9 #6 asked for the
  * composition as committed evidence, not just the parts):
  *
  *   1. JSONL ingest (streaming, pinned schema, PERMISSIVE) with
  *      dead-letter routing for malformed/missing-field lines
  *      ([[JsonlSource]] — the S1/P3 shape for corpora);
  *   2. the [[graft.streaming.DocIngest]] gate chain over the valid
  *      stream: watermarked in-stream content dedup → cross-batch Bloom
  *      gate → quality routing, landing accepted/rejected/metrics in
  *      parquet ([[graft.sink.ParquetSink]]);
  *   3. batch curation of the accepted corpus: quality-priority near-dup
  *      keep-list (q103's rule — the canonical-copy selection) over
  *      MinHash→LSH→verified-Jaccard components;
  *   4. content-stable train/validation/test split (q51's md5 bucketing);
  *   5. the q101 shard writer ([[graft.sink.DatasetWriter.writeShards]]):
  *      one shuffle, task-local sorts, `shard=N/` dirs in global
  *      pseudo-random order;
  *   6. VERIFICATION: the written shard dirs are read back and checked
  *      against [[graft.ops.Curate.trainingShards]]' independent
  *      assignment — every doc in exactly one shard, shard equal, and
  *      per-shard positions a 1..n permutation.
  *
  * Emits PIPELINE.json: rows in / dead-lettered / dup-flagged /
  * quality-rejected / accepted / kept / per-split counts / shard files,
  * plus per-stage wall seconds — the dataset-card ledger of one complete
  * corpus build.
  *
  * Corpus: the StreamScaleProbe shape (docMult copies of sf0.1's 5k docs,
  * every 20th copy an exact dup of its predecessor, event time advancing
  * one minute per copy wave) written as JSONL plus injected hostile lines
  * (malformed JSON / missing doc_id / missing text). Default docMult=200
  * → 1M valid lines + 3k dead-letter lines.
  *
  * Run: sbt "runMain graft.PipelineProbe [docMult]"
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val docMult = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.StateStores.useRocksDB(spark)
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/graft-pipeline"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))

    val stages = scala.collection.mutable.LinkedHashMap[String, Double]()
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      stages(name) = (System.nanoTime() - t0) / 1e9
      println(f"[pipeline] $name: ${stages(name)}%.1fs")
      r
    }

    // ---- stage 0: the raw JSONL drop (generation, not a pipeline stage) --
    val nMalformed = 2000L
    val nMissingField = 1000L
    locally {
      val dcopies = explode(sequence(lit(0), lit(docMult - 1))).as("k")
      val docs = graft.sources.Tables.documents(spark, base)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), dcopies)
        .select((col("doc_id") * docMult + col("k")).as("doc_id"),
          concat(col("text"), lit(" uniq"),
            when(pmod(col("k"), lit(20)) === 1,
              col("doc_id") * docMult + col("k") - 1)
              .otherwise(col("doc_id") * docMult + col("k"))).as("text"),
          col("lang"), col("source"), col("k"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      // range-partition by copy wave k so file NAME order ≈ event-time
      // order, then stamp mtimes along it (the file source admits files in
      // mtime order — same arrival-realism trick as StreamScaleProbe)
      docs.repartitionByRange(40, col("k"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").json(s"$out/jsonl")
      import spark.implicits._
      val bad =
        (1L to nMalformed).map(i => s"""{"doc_id": $i, "text: truncated-$i""") ++
        (1L to nMissingField / 2).map(i => s"""{"doc_id": ${-i}, "lang": "en"}""") ++
        (1L to nMissingField / 2).map(i => s"""{"text": "orphan line $i"}""")
      bad.toDS().repartition(1).write.mode("append").text(s"$out/jsonl")
      val fs = new java.io.File(s"$out/jsonl").listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      val t0 = System.currentTimeMillis() - fs.length * 2000L
      fs.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }
    }

    // ---- stage 1a: streaming dead-letter routing -------------------------
    val sink = new graft.sink.ParquetSink(s"$out/sink")
    def ckpt(tag: String): String = s"$out/ckpt-$tag"
    time("jsonl_dead_letter") {
      val q = JsonlSource.deadLetter(
          JsonlSource.readDocumentsStream(spark, s"$out/jsonl", maxFilesPerTrigger = 4))
        .writeStream
        .option("checkpointLocation", ckpt("dead"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          sink.append(b, "jsonl_dead_letter")
        }.start()
      q.awaitTermination()
    }

    // ---- stage 1b: streaming ingest gates (dedup → Bloom → quality) -----
    // Bloom SIZED FOR THE CORPUS (r10: the first pipeline run kept the
    // 2^20-bit default at 1M docs — fill ratio hit 0.95+ and 40% of novel
    // content was falsely rejected as duplicate; 2^24 bits ≈ 16 bits/doc
    // holds FP under 1%, and the artifact now records the fill ratio so
    // saturation is observable, not silent)
    val bloomBits = 1L << 24
    val filterRef = new java.util.concurrent.atomic.AtomicReference(
      graft.ops.Bloom.emptyWords(bloomBits))
    val timings = new graft.streaming.DocIngest.StageTimings
    time("doc_ingest") {
      val valid = JsonlSource.valid(
        JsonlSource.readDocumentsStream(spark, s"$out/jsonl", maxFilesPerTrigger = 4))
      // event-time stamp: one minute per copy wave (k = doc_id mod docMult),
      // many multiples of the 10-minute watermark → dedup state must evict
      val stamped = valid.select(col("doc_id"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("timestamp")
          + make_dt_interval(lit(0), lit(0), pmod(col("doc_id"), lit(docMult)), lit(0)))
          .as("ingest_ts"),
        col("text"))
      val q = graft.streaming.DocIngest.startAvailableNow(
        spark, stamped, ckpt("ingest"), sink, timings,
        bloomBits = bloomBits, filterOut = filterRef)
      q.awaitTermination()
    }

    // ---- stage 2: batch curation of the accepted corpus ------------------
    // accepted carries (doc_id, text, quality_score); lang/source/n_chars
    // come from the source of record via one doc_id equi-join
    val curated = time("keeplist_curation") {
      val acceptedIds = spark.read.parquet(s"$out/sink/accepted_documents")
        .select("doc_id")
      val pool = JsonlSource.valid(JsonlSource.readDocuments(spark, s"$out/jsonl"))
        .join(acceptedIds, Seq("doc_id"))
        .localCheckpoint()
      val kept = graft.ops.NearDup.dedupKeepListByQuality(pool)
      pool.join(kept.select("doc_id"), Seq("doc_id")).localCheckpoint()
    }

    // ---- stage 3: content-stable split -----------------------------------
    val withSplit = time("split") {
      graft.ops.Curate.trainTestSplit(curated)
        .select("doc_id", "split")
        .join(curated, Seq("doc_id"))
        .localCheckpoint()
    }

    // ---- stage 4: shard write (train) + plain dirs (validation/test) -----
    val nShards = 16
    time("write_shards") {
      graft.sink.DatasetWriter.writeShards(
        withSplit.filter(col("split") === "train")
          .select("doc_id", "text", "lang", "source", "n_chars"),
        s"$out/shards", nShards)
      for (s <- Seq("validation", "test"))
        withSplit.filter(col("split") === s)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$out/$s")
    }

    // ---- stage 5: verification against the q101 assignment ---------------
    val (vTotal, vMismatch, vBadPerm, shardFiles) = time("verify_shards") {
      val trainDocs = withSplit.filter(col("split") === "train")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val expected = graft.ops.Curate.trainingShards(trainDocs, nShards)
        .select(col("doc_id"), col("shard").as("exp_shard"),
          col("shard_pos").as("exp_pos"))
      val got = spark.read.parquet(s"$out/shards")
        .select(col("doc_id"), col("shard").cast("int").as("shard"),
          col("shard_pos"))
      val joined = got.join(expected, Seq("doc_id"), "full").cache()
      val total = joined.count()
      val mismatch = joined.filter(
        col("shard").isNull || col("exp_shard").isNull ||
        col("shard") =!= col("exp_shard") || col("shard_pos") =!= col("exp_pos"))
        .count()
      // per-shard positions must be a 1..n permutation
      val badPerm = joined.groupBy("shard")
        .agg(count(lit(1)).as("n"), countDistinct("shard_pos").as("nd"),
          min("shard_pos").as("mn"), max("shard_pos").as("mx"))
        .filter(col("nd") =!= col("n") || col("mn") =!= 1 || col("mx") =!= col("n"))
        .count()
      joined.unpersist()
      val files = new java.io.File(s"$out/shards").listFiles()
        .filter(_.getName.startsWith("shard="))
        .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
      (total, mismatch, badPerm, files)
    }

    // ---- ledger -----------------------------------------------------------
    def cnt(table: String): Long =
      spark.read.parquet(s"$out/sink/$table").count()
    val deadLetters = cnt("jsonl_dead_letter")
    val rejected = spark.read.parquet(s"$out/sink/rejected_documents")
    val rejByReason = rejected.groupBy("reject_reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val accepted = cnt("accepted_documents")
    val keptN = curated.count()
    val splits = withSplit.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nValid = spark.read.json(s"$out/jsonl").count() - nMalformed - nMissingField
    val verified = vMismatch == 0 && vBadPerm == 0 && vTotal == splits("train")
    if (!verified)
      sys.error(s"shard verification FAILED: total=$vTotal (train=${splits("train")}), " +
        s"mismatch=$vMismatch, badPerm=$vBadPerm")

    val stageJson = stages.map { case (k, v) => f""""$k": $v%.2f""" }
      .mkString("{", ", ", "}")
    val ingestJson = timings.snapshot.map {
      case (stage, c, s) => f""""$stage": {"batches": $c, "sec": $s%.2f}"""
    }.mkString("{", ", ", "}")
    val json =
      s"""{
         |  "doc_mult": $docMult,
         |  "jsonl_lines": ${nValid + nMalformed + nMissingField},
         |  "dead_letter_lines": $deadLetters,
         |  "valid_lines": $nValid,
         |  "flagged_duplicate": ${rejByReason.getOrElse("duplicate_content", 0L)},
         |  "low_quality": ${rejByReason.getOrElse("low_quality", 0L)},
         |  "accepted": $accepted,
         |  "keeplist_kept": $keptN,
         |  "splits": {"train": ${splits.getOrElse("train", 0L)}, "validation": ${splits.getOrElse("validation", 0L)}, "test": ${splits.getOrElse("test", 0L)}},
         |  "shards": $nShards,
         |  "shard_files": $shardFiles,
         |  "verified_shard_assignment": $verified,
         |  "bloom_bits": $bloomBits,
         |  "bloom_fill_ratio": ${f"${graft.ops.Bloom.fillRatio(filterRef.get)}%.4f"},
         |  "stage_sec": $stageJson,
         |  "ingest_breakdown": $ingestJson
         |}
         |""".stripMargin
    val outFile = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_OUT", "PIPELINE.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(s"[pipeline] wrote $outFile\n$json")
    spark.stop()
  }
}
