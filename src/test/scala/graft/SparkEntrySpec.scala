package graft

/** Driver-contract guards: the smoke entry returns rows; every oracle key
  * has a matching query; names are unique across modules. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("query names are unique across modules") {
    val names = Seq(
      queries.CoreQueries.all, queries.TableQueries.all,
      queries.TextQueries.all, queries.DedupQueries.all,
      queries.VectorQueries.all, queries.EventsQueries.all,
      queries.MultimodalQueries.all, queries.PipelineQueries.all,
      queries.FunctionQueries.all).flatten.map(_._1)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }

  test("bench headline names all resolve to registered queries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline without query: $missing")
  }
}
