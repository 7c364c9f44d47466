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

  test("events.ts physical type is one normalizeEventTs handles (schema-drift guard)") {
    // Reads the REAL testdata schema, not a fixture: when the driver
    // regenerates /root/testdata with a new ts encoding (it has shipped
    // TIMESTAMP(NANOS) and TIMESTAMP(MICROS) vintages already), this one
    // named test fails with the observed type — instead of nineteen
    // events-reading roster queries failing with the same analysis error.
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val physical = Tables.eventsRawSchema(spark, sf0001)("ts").dataType
    assert(Set[org.apache.spark.sql.types.DataType](
      LongType, TimestampNTZType, TimestampType).contains(physical),
      s"events.ts is $physical — teach Tables.normalizeEventTs this vintage")
    // and the normalized contract holds: ts is a µs instant, ts_ns a Long
    val norm = Tables.events(spark, sf0001).schema
    assert(norm("ts").dataType == TimestampType)
    assert(norm("ts_ns").dataType == LongType)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("EVERY query carries a DuckDB oracle — the rows-only allowlist is retired") {
    // r11 closed the last four rows-only queries (d02/d03/d05/s02) by
    // moving them onto portable signature families (h60 minhash, h60
    // simhash votes, axis-sign LSH) whose pipelines replicate in SQL;
    // the engine-native splitmix64/Gaussian variants keep their planted
    // ground-truth companions (d06, d08/d11, d07, s05). A query without
    // an oracle entry is now ALWAYS a bug — it must fail here, never
    // silently degrade to the driver's rows-only check.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracle: $rowsOnly")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is non-empty at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
