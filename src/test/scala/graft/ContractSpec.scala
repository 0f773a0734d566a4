package graft

/** Driver-contract guards: the correctness gate hashes (query, oracle)
  * pairs by NAME, so a rename or a missing twin silently weakens coverage —
  * these laws make drift a test failure instead.
  */
class ContractSpec extends SparkSpec {

  test("every driver query has a DuckDB oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("query names are unique across the family objects") {
    val all = (QueriesPipeline.queries ++ QueriesOps.queries ++
      QueriesProto.queries ++ QueriesVendors.queries).map(_._1)
    val dupes = all.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }

  test("every query builds a plan against sf0.001 (no analysis errors)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      // schema forces full analysis without executing the plan
      val schema = fn(spark, Sf).schema
      assert(schema.nonEmpty, s"$name produced an empty schema")
    }
  }
}
