package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Deterministic.{davg, dsum}
import graft.sources.Tables

/** The analytics surface: the reference's four PostgreSQL views plus its
  * ad-hoc monitoring queries, re-expressed as first-class Spark queries
  * (`/root/reference/docker/postgres/postgres_setup.sql:101-151`,
  * `README.md:368-384`), and a set of star-schema queries that exercise
  * joins / windows / top-k at scale.
  *
  * Scale notes: all aggregations are partial-agg friendly (`groupBy.agg`
  * with algebraic functions only → map-side combine); only FIXED-cardinality
  * dimension tables (`nation` 25 rows, `region` 5) carry explicit
  * `broadcast()` hints — `customer` and `part` grow linearly with SF
  * (measured: ×100 rows sf0.001→sf0.1), so their joins are left to AQE,
  * which broadcasts while they fit and switches to a shuffled join when
  * they don't; sorts happen post-aggregation on already-tiny results.
  * Monetary aggregates go through [[graft.functions.Deterministic]] (exact
  * decimal sums) so results are order-independent.
  */
object Analytics {

  /** Register the reference's four analytics views under their DDL names
    * (`postgres_setup.sql:101-151`) as temp views over the events pipeline,
    * so the SQL surface is name-compatible:
    * `spark.sql("SELECT * FROM v_hourly_event_summary")` etc.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val enriched = Enrich.enriched(Validate.withValidation(Tables.events(spark, dir)))
    hourlySummary(enriched).createOrReplaceTempView("v_hourly_event_summary")
    sessionSummary(enriched).createOrReplaceTempView("v_user_sessions")
    categoryPerformance(Tables.lineitem(spark, dir), Tables.part(spark, dir))
      .createOrReplaceTempView("v_category_performance")
    qualitySummary(enriched).createOrReplaceTempView("v_data_quality_summary")
  }

  /** A1 — event-type distribution (per-batch monitoring,
    * `spark_streaming_to_postgres.py:260-262`).
    */
  def eventDistribution(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(count("*").as("n_events")).orderBy("event_type")

  /** A3 — hourly event summary view (`postgres_setup.sql:101-110`):
    * tumbling hour × event_type → count, distinct users, revenue.
    */
  def hourlySummary(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(date_trunc("hour", col("ts")).as("event_hour_ts"), col("event_type"))
      .agg(
        count("*").as("event_count"),
        countDistinct("user_id").as("unique_users"),
        dsum(col("total_amount")).as("total_revenue"))
      .orderBy(col("event_hour_ts"), col("event_type"))

  /** A4 — user session summary view (`postgres_setup.sql:113-125`). */
  def sessionSummary(enriched: DataFrame): DataFrame =
    enriched
      .groupBy("user_id", "session_id")
      .agg(
        count("*").as("total_events"),
        count(when(col("event_type") === "view", 1)).as("view_count"),
        count(when(col("event_type") === "purchase", 1)).as("purchase_count"),
        dsum(col("total_amount")).as("session_revenue"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
      .orderBy("user_id", "session_id")

  /** A5 — category performance view (`postgres_setup.sql:128-137`), over the
    * star schema: part type as the category, lineitem revenue as the spend.
    * `part` scales linearly with SF, so no broadcast hint — AQE broadcasts
    * it while small and shuffles on `l_partkey`/`p_partkey` once it isn't.
    */
  def categoryPerformance(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_type").as("category"))
      .agg(
        count("*").as("event_count"),
        count(when(col("l_returnflag") === "R", 1)).as("return_count"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"),
        davg(col("l_extendedprice")).as("avg_price"))
      .orderBy(col("total_revenue").desc, col("category"))

  /** A6 — data-quality summary view (`postgres_setup.sql:140-151`): last-24h
    * window (anchored at [[Enrich.AnchorTs]] for determinism), hourly
    * buckets, sums + average validity rate.
    */
  def qualitySummary(validated: DataFrame): DataFrame =
    validated
      .filter(
        col("ts") >= lit(Enrich.AnchorTs).cast("timestamp") - expr("INTERVAL 24 HOURS"))
      .groupBy(date_trunc("hour", col("ts")).as("hour_bucket"))
      .agg(
        count("*").as("total_events"),
        count(when(col("is_valid"), 1)).as("valid_events"),
        count(when(!col("is_valid"), 1)).as("invalid_events"),
        davg(col("value")).as("avg_value"))
      .orderBy("hour_bucket")

  /** A7 — ad-hoc event count + revenue by type (`README.md:377-384`). */
  def topEventTypes(enriched: DataFrame): DataFrame =
    enriched
      .groupBy("event_type")
      .agg(count("*").as("event_count"), dsum(col("total_amount")).as("revenue"))
      .orderBy(col("event_count").desc, col("event_type"))

  /** §2.6 set op — UNION ALL of two scalar counts (monitoring query,
    * `README.md:368-374`).
    */
  def unionCounts(validated: DataFrame): DataFrame = {
    val valid = validated.filter(col("is_valid"))
      .agg(count("*").as("n")).select(lit("events").as("side"), col("n"))
    val dead = validated.filter(!col("is_valid"))
      .agg(count("*").as("n")).select(lit("dead_letter").as("side"), col("n"))
    valid.union(dead).orderBy("side")
  }

  /** §2.6 sort + limit — deterministic top-k by value. */
  def topKByValue(events: DataFrame, k: Int = 10): DataFrame =
    events
      .select("event_id", "event_type", "value")
      .orderBy(col("value").desc, col("event_id"))
      .limit(k)

  /** P6 — time-range predicate with a literal anchor
    * (`postgres_setup.sql:149`).
    */
  def last24h(events: DataFrame): DataFrame = {
    val anchor = lit(Enrich.AnchorTs).cast("timestamp")
    events
      .filter(col("ts") >= anchor - expr("INTERVAL 24 HOURS") && col("ts") < anchor)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Star-schema join: revenue by nation/region. Only the FIXED-cardinality
    * dims (nation 25, region 5) carry a broadcast hint; customer grows
    * linearly with SF, so its join is left to AQE — broadcast at small SF,
    * shuffled-hash/sort-merge once it outgrows the threshold. The large
    * shuffles are orders⋈lineitem and orders⋈customer on their keys plus
    * the final tiny aggregation.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count("*").as("n_lineitems"))
      .orderBy(col("revenue").desc, col("nation_name"))
  }

  /** TPC-H Q5-shaped local-supplier revenue: two independent dimension
    * paths (orders→customer and lineitem→supplier) meet at the fact and
    * must agree on the nation — the classic multi-path star topology. The
    * region filter prunes through broadcast `nation⋈region` BEFORE the
    * fact shuffles, and the `o_orderdate` range predicate pushes down to
    * the orders scan. `customer`/`supplier` joins are AQE's call (both
    * scale with SF); the only guaranteed big shuffle is lineitem⋈orders.
    */
  def localSupplierRevenue(
      spark: SparkSession, dir: String, region: String = "ASIA",
      yearFrom: String = "1996-01-01 00:00:00",
      yearTo: String = "1998-01-01 00:00:00"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(yearFrom).cast("timestamp") &&
        col("o_orderdate") < lit(yearTo).cast("timestamp"))
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).filter(col("r_name") === region)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name").as("nation_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("nation_name"))
  }

  /** Window function: top-3 customers by revenue within each nation
    * (rank + partitioned window; deterministic tie-break on custkey).
    * customer is NOT broadcast-hinted (it scales with SF — AQE decides);
    * nation is fixed-size and stays hinted.
    */
  def topCustomersPerNation(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val perCust = ord
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"), col("c_custkey").as("custkey"),
        col("c_name").as("customer_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val w = Window.partitionBy(col("nation_name"))
      .orderBy(col("revenue").desc, col("custkey"))
    perCust
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= k)
      .orderBy(col("nation_name"), col("rank_in_nation"))
  }

  /** TPC-H Q1-style pricing summary over lineitem — the classic partial-agg
    * benchmark shape (one scan, map-side combine, tiny shuffle).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count("*").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** §2.6 joins — LEFT ANTI exclusion join: sessions with clicks but no
    * purchase (the cart-abandonment cohort). The general pattern for "in A
    * but not in B" at scale: both sides hash-partition on the join key (an
    * equi-join, so AQE broadcasts the exclusion set while it's small and
    * falls back to a shuffled anti-join when it isn't); the left side is
    * already aggregated, so only (session, counters) rows move — never raw
    * events. For this single-table special case a lone groupBy with a
    * purchase counter would also work; the anti-join form is what
    * generalizes to a cross-table exclusion list (blocklists, already-
    * processed registries).
    */
  def abandonedSessions(enriched: DataFrame): DataFrame = {
    val perSession = enriched
      .filter(col("user_id").isNotNull)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        max(col("ts")).as("last_seen"))
      .filter(col("n_clicks") > 0)
    val purchasedSessions = enriched
      .filter(col("user_id").isNotNull && col("event_type") === "purchase")
      .select("session_id")
    perSession
      .join(purchasedSessions, Seq("session_id"), "left_anti")
      .orderBy("user_id", "session_id")
  }

  /** Oracle for [[abandonedSessions]]; takes the caller's enriched-events
    * SQL so the session/normalization derivation cannot drift from the
    * Spark side.
    */
  def abandonedSessionsSql(enrichedSql: String): String =
    s"""SELECT session_id, user_id, n_events, n_clicks, last_seen FROM (
       |  SELECT user_id, session_id, COUNT(*) AS n_events,
       |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
       |    MAX(ts) AS last_seen
       |  FROM ($enrichedSql) WHERE user_id IS NOT NULL
       |  GROUP BY user_id, session_id
       |) s
       |WHERE n_clicks > 0 AND NOT EXISTS (
       |  SELECT 1 FROM ($enrichedSql) p
       |  WHERE p.user_id IS NOT NULL AND p.event_type = 'purchase'
       |    AND p.session_id = s.session_id)
       |ORDER BY user_id, session_id""".stripMargin

  /** §2.6 window fns — `lag` over an event-time order: per-user inter-event
    * gaps (the feed for activity/churn features). Gap arithmetic stays in
    * exact integer microseconds (`unix_micros`), so aggregates are
    * engine-portable with no float time math. One exchange total: the
    * window partitions by user_id and the following groupBy aggregates the
    * same key, so Spark reuses the window's hash partitioning for the agg.
    */
  def interEventGaps(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ordering by the µs projection == ordering by ts (monotone), so the
    // raw timestamp need not survive the projection
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .groupBy("user_id")
      .agg(
        count(col("gap_us")).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("total_gap_us"))
      .filter(col("n_gaps") > 0)
      .orderBy("user_id")
  }

  def interEventGapsSql: String =
    """SELECT user_id, COUNT(gap_us) AS n_gaps, MAX(gap_us) AS max_gap_us,
      |  CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
      |FROM (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events WHERE user_id IS NOT NULL)
      |GROUP BY user_id HAVING COUNT(gap_us) > 0 ORDER BY user_id""".stripMargin

  /** §2.6 grouping sets — CUBE(event_type, day-of-week): every marginal of
    * the two-dimensional activity matrix in ONE expand+aggregate pass (the
    * dashboard companion of q60's ROLLUP). grouping() flags distinguish
    * subtotal rows from genuine NULL dimension values; sort order pins
    * NULLS LAST explicitly because Spark's ASC default (nulls first)
    * differs from DuckDB's (nulls last).
    */
  def eventCube(enriched: DataFrame): DataFrame =
    enriched
      .cube("event_type", "event_dayofweek")
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("total_amount")).as("revenue"),
        grouping(col("event_type")).cast("int").as("is_type_total"),
        grouping(col("event_dayofweek")).cast("int").as("is_dow_total"))
      .orderBy(col("is_type_total"), col("is_dow_total"),
        col("event_type").asc_nulls_last, col("event_dayofweek").asc_nulls_last)

  /** Discretization: fixed-width histogram of document length. Bins are
    * exact integer division (`div` / DuckDB `//` agree on non-negatives),
    * so the bucketing is engine-identical with no float boundary
    * ambiguity; one map-side-combinable groupBy.
    */
  def lengthHistogram(documents: DataFrame, binWidth: Int = 100, maxBin: Int = 9): DataFrame =
    documents
      .withColumn("bin", least(expr(s"n_chars div $binWidth"), lit(maxBin.toLong)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("bin")

  def lengthHistogramSql(binWidth: Int = 100, maxBin: Int = 9): String =
    s"""SELECT least(n_chars // $binWidth, $maxBin) AS bin,
       |  COUNT(*) AS n_docs,
       |  MIN(n_chars) AS min_chars,
       |  MAX(n_chars) AS max_chars
       |FROM documents
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bivariate statistical profiling: per event type, the exact-input
    * Pearson correlation and population covariance of (value, quantity).
    * Determinism across engines needs only two things: the AGGREGATED
    * inputs are exact (decimal sums of value, quantity, value·quantity,
    * value², quantity² — order-independent), and every subsequent step is
    * an IEEE-754-specified double op on identical inputs (+,−,×,÷ and
    * sqrt are all correctly rounded by spec) — so even the final
    * correlation is bit-identical without avoiding float math.
    */
  def typeCorrelation(enriched: DataFrame): DataFrame = {
    val paired = enriched.filter(col("value").isNotNull)
    val d = (c: org.apache.spark.sql.Column) => dsum(c)
    val agged = paired
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        d(col("value")).as("sx"),
        d(col("quantity").cast("double")).as("sy"),
        d(col("value") * col("quantity")).as("sxy"),
        d(col("value") * col("value")).as("sxx"),
        d(col("quantity").cast("double") * col("quantity")).as("syy"))
    val n = col("n").cast("double")
    val covPop = (col("sxy") - col("sx") * col("sy") / n) / n
    val varX = col("sxx") * n - col("sx") * col("sx")
    val varY = col("syy") * n - col("sy") * col("sy")
    val corr = when(varX > 0 && varY > 0,
      (col("sxy") * n - col("sx") * col("sy")) / (sqrt(varX) * sqrt(varY)))
    agged
      .select(col("event_type"), col("n"),
        covPop.as("cov_pop"), corr.as("corr"))
      .orderBy("event_type")
  }

  def typeCorrelationSql(enrichedSql: String): String = {
    def d(e: String) = graft.functions.Deterministic.dsumSql(e)
    s"""SELECT event_type, n, cov_pop,
       |  CASE WHEN var_x > 0 AND var_y > 0
       |       THEN (sxy * nd - sx * sy) / (sqrt(var_x) * sqrt(var_y)) END AS corr
       |FROM (
       |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
       |    (sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS cov_pop,
       |    sxx * CAST(n AS DOUBLE) - sx * sx AS var_x,
       |    syy * CAST(n AS DOUBLE) - sy * sy AS var_y,
       |    sxy, sx, sy
       |  FROM (
       |    SELECT event_type, COUNT(*) AS n,
       |      ${d("value")} AS sx,
       |      ${d("CAST(quantity AS DOUBLE)")} AS sy,
       |      ${d("value * quantity")} AS sxy,
       |      ${d("value * value")} AS sxx,
       |      ${d("CAST(quantity AS DOUBLE) * quantity")} AS syy
       |    FROM ($enrichedSql) WHERE value IS NOT NULL
       |    GROUP BY event_type))
       |ORDER BY event_type""".stripMargin
  }

  def eventCubeSql(enrichedSql: String): String =
    s"""SELECT event_type, event_dayofweek, COUNT(*) AS n_events,
       |  ${graft.functions.Deterministic.dsumSql("total_amount")} AS revenue,
       |  CAST(GROUPING(event_type) AS INTEGER) AS is_type_total,
       |  CAST(GROUPING(event_dayofweek) AS INTEGER) AS is_dow_total
       |FROM (SELECT e.*, CAST(dayofweek(ts) + 1 AS INTEGER) AS event_dayofweek
       |      FROM ($enrichedSql) e)
       |GROUP BY CUBE (event_type, event_dayofweek)
       |ORDER BY is_type_total, is_dow_total, event_type, event_dayofweek""".stripMargin
}
