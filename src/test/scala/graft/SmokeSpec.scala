package graft

/** Contract smoke: the driver's entry points hold their invariants. */
class SmokeSpec extends SparkSuite {

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("declared surface covers the SURVEY §2 + §2.M inventory") {
    // pinned to the shipped counts (SURVEY §2.M): 117 keys, 106 oracled —
    // a dropped key or oracle fails here before the driver sees it
    assert(SparkEntry.queries.size >= 117,
      s"only ${SparkEntry.queries.size} keys declared")
    assert(SparkEntry.oracleSql.size >= 106,
      s"only ${SparkEntry.oracleSql.size} oracles declared")
  }

  test("entry() returns the 66 exemplar clusters (FIXTURES.md)") {
    assert(SparkEntry.entry(spark).count() == 66)
  }
}
