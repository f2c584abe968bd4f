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

  private def enrichedOf(rows: Seq[(Long, String, Long, String)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val raw = rows
      .toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("event_type"), lit(5.0).as("value"), lit(null).cast("string").as("props"))
    Enrich.enriched(raw)
  }

  test("abandonedSessions keeps click sessions without purchases and drops the rest") {
    // user 1: one session (same 30-min bucket) with click+purchase → excluded
    // user 2: click-only session → kept; user 3: view-only session → filtered (no click)
    val enriched = enrichedOf(Seq(
      (1L, "2024-05-01 10:00:00", 1L, "click"),
      (2L, "2024-05-01 10:05:00", 1L, "purchase"),
      (3L, "2024-05-01 10:00:00", 2L, "click"),
      (4L, "2024-05-01 10:01:00", 2L, "click"),
      (5L, "2024-05-01 10:00:00", 3L, "view")))
    val out = Analytics.abandonedSessions(enriched).collect()
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(2L))
    assert(out.head.getAs[Long]("n_clicks") == 2L)
    // the anti-join survives a purchase in a DIFFERENT session of the same user
    val enriched2 = enrichedOf(Seq(
      (1L, "2024-05-01 10:00:00", 1L, "click"),
      (2L, "2024-05-01 12:00:00", 1L, "purchase"))) // separate 30-min bucket
    assert(Analytics.abandonedSessions(enriched2).count() == 1)
  }

  test("interEventGaps computes per-user integer-µs gap aggregates via lag") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      (1L, "2024-05-01 10:00:00", 7L),
      (2L, "2024-05-01 10:00:10", 7L),
      (3L, "2024-05-01 10:01:10", 7L), // gaps: 10s, 60s
      (4L, "2024-05-01 10:00:00", 8L)) // single event → no gap row
      .toDF("event_id", "tss", "user_id")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"))
    val out = Analytics.interEventGaps(events).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("user_id") == 7L)
    assert(out.head.getAs[Long]("n_gaps") == 2L)
    assert(out.head.getAs[Long]("max_gap_us") == 60_000_000L)
    assert(out.head.getAs[Long]("total_gap_us") == 70_000_000L)
  }

  test("incremental state merge equals full recompute for any split") {
    import org.apache.spark.sql.functions._
    val enriched = Enrich.enriched(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))
    val full = Incremental.readout(Incremental.hourlyState(enriched)).collect()
    // three-way split on an arbitrary non-time key — merge must not care
    val parts = (0 until 3).map(i => enriched.filter(pmod(col("event_id"), lit(3)) === i))
    val merged = Incremental.readout(
      Incremental.merge(parts.map(Incremental.hourlyState): _*)).collect()
    assert(merged.toSeq == full.toSeq) // bit-for-bit, revenue double included
    assert(full.nonEmpty)
  }

  test("incremental time-cut split does not drop NULL-timestamp rows") {
    import org.apache.spark.sql.functions._
    val enriched = enrichedOf(Seq(
      (1L, "2024-05-01 10:00:00", 1L, "click"),
      (2L, "2024-05-02 10:00:00", 1L, "view")))
      .withColumn("ts", when(col("event_id") === 2L, lit(null).cast("timestamp"))
        .otherwise(col("ts")))
    val out = Incremental.incrementalHourly(
      enriched, lit("2024-05-01 12:00:00").cast("timestamp"))
    // the null-ts row must survive as a NULL-hour state cell
    assert(out.count() == 2)
    assert(out.filter(col("event_hour_ts").isNull).count() == 1)
  }

  test("length histogram bins by integer division with a capped top bin") {
    import spark.implicits._
    val docs = Seq((1L, 48L), (2L, 99L), (3L, 100L), (4L, 5000L))
      .toDF("doc_id", "n_chars")
    val got = Analytics.lengthHistogram(docs, binWidth = 100, maxBin = 9)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_docs")).toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 9L -> 1L)) // 5000 capped into bin 9
  }

  test("typeCorrelation: perfect linear relation → corr 1.0; zero variance → null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val enriched = Seq(
      ("a", 1.0, 2), ("a", 2.0, 4), ("a", 3.0, 6),   // quantity = 2·value
      ("b", 1.0, 7), ("b", 5.0, 7))                   // quantity constant
      .toDF("event_type", "value", "quantity")
    val got = Analytics.typeCorrelation(enriched).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Any]("corr"), r.getAs[Double]("cov_pop")))).toMap
    // corr is DETERMINISTIC but not exact (sqrt products round in the last
    // ulp — the same 1.0000000000000002 in any IEEE engine, which is what
    // the oracle hash-checks); the spec asserts the math, not bit identity
    assert(math.abs(got("a")._1.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(got("b")._1 == null) // var(quantity)=0 → undefined, not NaN
    assert(math.abs(got("a")._2 - 4.0 / 3.0) < 1e-12) // cov_pop of planted data
  }

  test("eventCube emits all four marginals with grouping flags") {
    val enriched = enrichedOf(Seq(
      (1L, "2024-05-06 10:00:00", 1L, "click"),  // Monday
      (2L, "2024-05-07 10:00:00", 1L, "view"),   // Tuesday
      (3L, "2024-05-07 11:00:00", 2L, "click")))
    val out = Analytics.eventCube(enriched).collect()
    // 3 detail cells + 2 type totals + 2 dow totals + 1 grand total
    assert(out.length == 8)
    val grand = out.filter(r =>
      r.getAs[Int]("is_type_total") == 1 && r.getAs[Int]("is_dow_total") == 1)
    assert(grand.length == 1 && grand.head.getAs[Long]("n_events") == 3L)
    // a type subtotal row aggregates across dows with a NULL dow column
    val clickTotal = out.filter(r => r.getAs[Int]("is_dow_total") == 1 &&
      r.getAs[Int]("is_type_total") == 0 && r.getAs[String]("event_type") == "click")
    assert(clickTotal.length == 1 && clickTotal.head.getAs[Long]("n_events") == 2L)
    assert(clickTotal.head.isNullAt(clickTotal.head.fieldIndex("event_dayofweek")))
  }
}
