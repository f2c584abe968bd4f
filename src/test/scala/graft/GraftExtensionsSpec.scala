package graft

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("quantized_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((1L, Seq(1.0f, 0.5f), Seq(2.0f, 2.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT quantized_dot(a, b) AS d FROM vecs")
      .as[Long].collect()(0)
    // floor(1e6)*floor(2e6) + floor(.5e6)*floor(2e6) = 2e12 + 1e12
    assert(got == 3000000000000L)
  }

  test("quantized_dot rejects wrong argument counts and types") {
    GraftExtensions.register(spark)
    intercept[Exception](spark.sql("SELECT quantized_dot(1)").collect())
    intercept[Exception](spark.sql("SELECT quantized_dot(1, 2)").collect())
  }

  test("long_array_dot / shingle_set / text_stats callable from SQL") {
    GraftExtensions.register(spark)
    Seq((1L, "The quick brown fox the END"))
      .toDF("id", "text").createOrReplaceTempView("docs_sql")
    assert(spark.sql("SELECT long_array_dot(array(2L,3L), array(4L,5L)) AS d")
      .as[Long].collect()(0) == 23L)
    val sh = spark.sql("SELECT shingle_set(text, 2) AS s FROM docs_sql")
      .collect()(0).getSeq[String](0)
    assert(sh.contains("the quick") && sh.contains("fox the"))
    val st = spark.sql(
      "SELECT text_stats(text).n_tokens AS n, text_stats(text).n_distinct AS d FROM docs_sql")
      .collect()(0)
    assert(st.getInt(0) == 6 && st.getInt(1) == 5) // 'the' twice after lowering
    intercept[Exception](
      spark.sql("SELECT shingle_set(text, id) FROM docs_sql").collect())
  }
}
