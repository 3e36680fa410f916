package graft

/** Driver-contract smoke: entry() must return rows on sf0.001 and every
  * oracleSql key must reference a registered query (the reverse need not
  * hold — rows-only ops are legitimate).
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query; no orphans") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o.diff(q)}")
    assert(q.size >= 70 && o.size >= 67)
  }

  test("API queries serialize to JSON frames at the edge (API.py contract)") {
    val js = graft.queries.Serving.jsonEdge(
      SparkEntry.queries("q_api_latest")(spark, sf0001)).collect()
    assert(js.length == 1)
    assert(js.head.startsWith("{") && js.head.contains("\"event_id\":"))
  }
}
