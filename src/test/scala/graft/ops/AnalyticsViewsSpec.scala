package graft.ops

import graft.SparkSpec

class AnalyticsViewsSpec extends SparkSpec {

  test("the four reference views are queryable by their DDL names") {
    Analytics.registerViews(spark, "/root/testdata/sf0.001")
    Seq(
      "v_hourly_event_summary",
      "v_user_sessions",
      "v_category_performance",
      "v_data_quality_summary").foreach { v =>
      assert(spark.sql(s"SELECT * FROM $v").count() > 0, v)
    }
    // view shape spot-check: category performance carries the DDL columns
    val cols = spark.sql("SELECT * FROM v_category_performance").columns.toSet
    assert(Set("category", "event_count", "total_revenue", "avg_price").subsetOf(cols))
  }
}
