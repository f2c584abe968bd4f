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

  test("extension descriptors: distinct names, builders construct and eval") {
    // the spark.sql.extensions path can't be exercised in-JVM (getOrCreate
    // returns the shared test session, ignoring extensions), so pin the
    // pieces it is made of: apply() accepts a fresh SparkSessionExtensions,
    // and each descriptor's builder yields a working expression.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    val names = GraftExtensions.descriptors.map(_._1.funcName)
    assert(names == names.distinct &&
      names.toSet == Set("quantized_dot", "long_array_dot", "shingle_set",
        "text_stats", "minhash_sig", "sorted_intersect_count", "winnow_keys"))
    import org.apache.spark.sql.catalyst.expressions.Literal
    val byName = GraftExtensions.descriptors.map(d => d._1.funcName -> d._3).toMap
    val dot = byName("long_array_dot")(Seq(
      Literal.create(Seq(3L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)),
      Literal.create(Seq(4L), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))))
    assert(dot.eval(null) == 12L)
    intercept[Exception](byName("shingle_set")(Seq(Literal("x"), Literal("y"))))
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

  test("minhash_sig / sorted_intersect_count / winnow_keys callable from SQL") {
    GraftExtensions.register(spark)
    Seq((1L, "a b c d e f g h")).toDF("id", "text")
      .createOrReplaceTempView("docs_sql2")
    // minhash_sig over a shingle set: 12 five-hex-char slices
    val sig = spark.sql(
      "SELECT minhash_sig(shingle_set(text, 3)) AS s FROM docs_sql2")
      .collect()(0).getSeq[String](0)
    assert(sig.length == 12 && sig.forall(_.matches("[0-9a-f]{5}")))
    assert(spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
      .collect()(0).getInt(0) == 2)
    // winnow_keys: 42-char keys (md5 hex + 10-digit position), nonempty
    // for an 8-token doc at k=5, and every key's position parses
    val keys = spark.sql(
      "SELECT winnow_keys(text, 5, 4) AS ks FROM docs_sql2")
      .collect()(0).getSeq[String](0)
    assert(keys.nonEmpty && keys.forall(_.matches("[0-9a-f]{32}[0-9]{10}")))
  }
}
