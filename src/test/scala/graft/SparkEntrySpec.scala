package graft

import graft.SparkSpec

/** Driver-contract invariants: the flagship entry returns rows, every query
  * runs at sf0.001, every oracle key names a real query, and result column
  * names match what each oracle SQL aliases (the driver hash-compares by
  * sorted column name).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key corresponds to a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("all queries execute at sf0.001 without error") {
    val dir = "/root/testdata/sf0.001"
    // q02 may legitimately be empty (no invalid rows in the small sample);
    // emptiness elsewhere is suspicious but the oracle compare owns value
    // correctness — here we pin that every plan analyzes and runs.
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).count()
    }
    val empty = counts.filter(_._2 == 0).keySet -- Set("q02_dead_letter")
    assert(empty.isEmpty, s"unexpectedly empty queries: $empty")
  }
}
