package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** JSONL ingestion: pinned schema, PERMISSIVE parse, valid/dead-letter
  * routing — one scan, no silent drops.
  */
class JsonlSourceSpec extends SparkSpec {

  private def writeFixture(lines: String*): String = {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    lines.foreach(w.println)
    w.close()
    dir.getAbsolutePath
  }

  test("valid lines parse to the documents schema; corrupt and " +
    "missing-required lines route to the dead letter with reasons") {
    val path = writeFixture(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}""",
      """{"doc_id": 2, "text": "zwei", "lang": "de", "source": "s1", "n_chars": 4}""",
      """this is not json at all""",
      """{"doc_id": 3, "lang": "en", "source": "s0", "n_chars": 0}""",
      """{"text": "orphan text", "lang": "en", "source": "s1", "n_chars": 11}""")
    val parsed = JsonlSource.readDocuments(spark, path)

    val good = JsonlSource.valid(parsed).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(good.toSeq == Seq((1L, "hello world"), (2L, "zwei")))
    // schema is the pinned one, not inferred
    assert(JsonlSource.valid(parsed).schema.map(f => f.name -> f.dataType.typeName) ==
      Seq("doc_id" -> "long", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "long"))

    val dead = JsonlSource.deadLetter(parsed).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(dead.length == 3)
    val byReason = dead.groupBy(_._2)
    assert(byReason("malformed_json").head._1 == "this is not json at all")
    assert(byReason("missing_text").head._1.contains("\"doc_id\":3"))
    assert(byReason("missing_doc_id").head._1.contains("orphan text"))
    // no silent drops: every input line lands in exactly one stream
    assert(good.length + dead.length == 5)
  }

  test("streaming JSONL: file drops route valid/dead-letter across micro-batches") {
    val dir = Files.createTempDirectory("jsonl-stream").toFile
    def drop(name: String, lines: String*): Unit = {
      // atomic move, same as the S7 generator: the file source must never
      // see a half-written file
      val tmp = new java.io.File(dir, s".$name.tmp")
      val w = new java.io.PrintWriter(tmp, "UTF-8")
      lines.foreach(w.println)
      w.close()
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(dir, name).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    drop("a.jsonl",
      """{"doc_id": 1, "text": "first doc", "lang": "en", "source": "s", "n_chars": 9}""",
      """broken line""")
    val parsed = JsonlSource.readDocumentsStream(spark, dir.getAbsolutePath)
    val goodRows = scala.collection.mutable.Buffer[(Long, String)]()
    val deadRows = scala.collection.mutable.Buffer[(String, String)]()
    val batches = scala.collection.mutable.Buffer[Long]()
    val q = parsed.writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("jsonl-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.persist()
        try {
          batches += id
          goodRows ++= JsonlSource.valid(batch).collect()
            .map(r => (r.getLong(0), r.getString(1)))
          deadRows ++= JsonlSource.deadLetter(batch).collect()
            .map(r => (r.getString(0), r.getString(1)))
        } finally batch.unpersist()
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      drop("b.jsonl",
        """{"doc_id": 2, "text": "second doc", "lang": "de", "source": "s", "n_chars": 10}""",
        """{"text": "no id", "lang": "en", "source": "s", "n_chars": 5}""")
      q.processAllAvailable()
      assert(goodRows.sortBy(_._1).toSeq == Seq((1L, "first doc"), (2L, "second doc")))
      assert(deadRows.map(_._2).sorted.toSeq == Seq("malformed_json", "missing_doc_id"))
      assert(batches.size >= 2) // maxFilesPerTrigger=1: one batch per drop
    } finally q.stop()
  }

  test("type-mismatched fields corrupt the LINE (raw capture), not the column") {
    val path = writeFixture(
      """{"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "s", "n_chars": 1}""",
      """{"doc_id": 7, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""")
    val parsed = JsonlSource.readDocuments(spark, path)
    assert(JsonlSource.valid(parsed).collect().map(_.getLong(0)).toSeq == Seq(7L))
    val dead = JsonlSource.deadLetter(parsed).collect()
    assert(dead.length == 1 && dead.head.getString(0).contains("not-a-number"))
  }
}
