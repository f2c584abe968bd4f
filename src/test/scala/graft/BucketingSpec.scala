package graft

import org.apache.spark.sql.functions._

/** Demonstrates (and pins) the bucketed-table co-location path: two tables
  * bucketed on the join key by the same bucket count join WITHOUT any
  * exchange — the pre-shuffle investment that pays off when the same big
  * join runs repeatedly (fact-to-fact joins at 100 TB are bucketed or they
  * are re-shuffled every run).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketing join plans with ZERO exchanges on the bucket key") {
    val base = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val events = (1L to 5000L).map(i => (i, i % 97, s"t$i")).toDF("event_id", "user_id", "tag")
    val profiles = (0L to 96L).map(u => (u, s"segment${u % 5}")).toDF("user_id", "segment")
    // force the shuffle-vs-bucket question: with a broadcastable side the
    // planner (rightly) broadcasts and bucketing is moot — the property
    // under test is the big-to-big case
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      events.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$base/ev").mode("overwrite").saveAsTable("ev_bucketed")
      profiles.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$base/pr").mode("overwrite").saveAsTable("pr_bucketed")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("pr_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == 5000L)
      // the same join on plain (unbucketed) frames shuffles both sides —
      // the contrast that makes the investment visible
      val unbucketed = events.join(profiles, "user_id")
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS pr_bucketed")
    }
  }
}
