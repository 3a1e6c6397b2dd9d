package graft

/** Every declared query runs at sf0.001 and the flagship entry has rows. */
class SmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL exists only for declared queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"query $name runs at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.columns.nonEmpty)
      df.count() // executes the plan
    }
  }
}
