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
}
