package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity over the driver contract: every declared query runs, returns
  * rows, and every oracle key points at an existing query. Value-level
  * correctness is covered by the DuckDB differential harness
  * (tools/check_oracle.py + driver Verify). */
class RosterSpec extends AnyFunSuite {
  import SparkSessionFixture._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is non-empty at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
