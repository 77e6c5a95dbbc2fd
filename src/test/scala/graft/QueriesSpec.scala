package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke guard over the driver contract: entry() returns rows, every
  * catalog query runs at sf0.001 without error, names are unique, and
  * every oracle key has a matching query (the column-name contract is
  * checked value-by-value by the oracle gate; this guards runtime
  * regressions before the driver ever runs). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("catalog names are unique and oracles reference existing queries") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every catalog query executes at sf0.001") {
    val failures = SparkEntry.catalog.flatMap { q =>
      try { q.run(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
