package graft

import graft.queries.Queries

/** Every registered query runs on sf0.001 without throwing; contract
  * invariants of the SparkEntry facade (the driver's t1 smoke, run
  * locally).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("query names are unique and every oracle key has a query") {
    val names = Queries.all.map(_.name)
    assert(names.distinct == names)
    assert(Queries.oracleMap.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Queries.all.foreach { q =>
    test(s"${q.name} executes on sf0.001${if (!q.oracleGated) " (rows-only)" else ""}") {
      val df = q.run(spark, sf("sf0.001"))
      val n = df.count()
      assert(n >= 0)
      // ordered-output queries must declare an orderable schema; smoke
      // only asserts executability + non-exploding row counts here.
      assert(n < 5000000, s"${q.name} exploded to $n rows at sf0.001")
    }
  }
}
