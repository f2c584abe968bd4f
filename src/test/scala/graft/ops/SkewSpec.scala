package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation") {
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toLong, i * 1.0))
      .toDF("key", "id", "v")
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(22,6)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedAgg(
      df, Seq("key"), Seq(col("id")), salts = 8,
      Seq(
        "n" -> ((count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))),
        "s" -> ((sum(col("v").cast("decimal(22,6)")), (c: org.apache.spark.sql.Column) => sum(c)))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == direct)
  }

  test("salted aggregation spreads a hot key across salts in phase 1") {
    val df = (1 to 100).map(i => ("hot", i.toLong)).toDF("key", "id")
    val saltDist = df.withColumn("__salt", Skew.saltCol(8, Seq(col("id"))))
      .groupBy("__salt").count().collect()
    assert(saltDist.length > 1) // the single key shards across salts
  }

  test("salted broadcast join equals plain join") {
    val probe = (1 to 500).map(i => (if (i <= 450) "hot" else s"k$i", i)).toDF("key", "pid")
    val build = Seq(("hot", 1), ("k451", 2)).toDF("key", "attr")
    val plain = probe.join(build, "key")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val salted = Skew.saltedBroadcastJoin(probe, build, "key", 4, Seq(col("pid")))
      .select("key", "pid", "attr")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(salted == plain)
  }
}
