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

  test("AQE skew-join splits the hot partition at runtime (adaptive half of q41)") {
    // static salting (saltedAgg / saltedBroadcastJoin) is the planned-ahead
    // remedy; this pins the adaptive one: plant one key holding ~94% of the
    // probe side, force a sort-merge join, and assert the EXECUTED adaptive
    // plan marked the join/shuffle-read as skew-handled — i.e. the hot
    // partition was split into advisory-sized chunks instead of pinning one
    // task.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // pad must be referenced downstream (or column pruning drops it from
      // the shuffle) and incompressible (or lz4 shrinks the hot partition
      // below threshold): per-row md5 hex does both
      val left = spark.range(64000).select(
        when(col("id") < 60000, 0L).otherwise(col("id") % 4000).as("key"),
        concat(md5(col("id").cast("string")), md5(concat(lit("p"), col("id")))).as("pad"))
      val right = spark.range(4000).select(col("id").as("key"), (col("id") * 2).as("attr"))
      val joined = left.join(right, "key").select("key", "pad", "attr")
      // execute THIS queryExecution (count() would build its own plan and
      // leave joined's adaptive plan un-finalized)
      assert(joined.collect().length == 64000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.toLowerCase.contains("skew"), s"no skew handling in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
