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

  test("all 10 tables match the pinned physical schema fingerprint (epoch canary)") {
    // The events.ts canary above catches the ONE drift that has already
    // happened; this pins the ENTIRE physical surface of the testdata
    // epoch (every table, every column name and scanned type), so ANY
    // driver regeneration — a renamed field, a widened int, a timestamp
    // vintage flip on orders/lineitem — fails HERE with the observed
    // diff instead of as a smear of downstream analysis errors.
    // On an intentional new epoch: verify the roster is green against
    // the new files, then update the pins below to the printed actuals.
    val pinned = Map(
      "region" -> "r_regionkey:int, r_name:string",
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, " +
        "p_type:string, p_size:int, p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
        "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
        "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
        "l_discount:double, l_tax:double, l_returnflag:string, " +
        "l_linestatus:string, l_shipdate:timestamp_ntz"),
      // ts is pinned per-FIELD-NAME only: its type legitimately varies by
      // vintage and is separately gated by the events.ts canary above
      "events" -> ("event_id:bigint, ts:*, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    val diffs = Tables.All.flatMap { name =>
      val actual = Tables.t(spark, sf0001, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      pinned.get(name) match {
        // a table added to Tables.All without a pin is its OWN diff
        // entry (a raw Map apply would throw key-not-found and hide
        // the formatted drift report for every other table)
        case None =>
          Some(s"$name:\n  pinned: <no pinned schema for table " +
            s"'$name' — add one>\n  actual: $actual")
        case Some(expect) =>
          val matches =
            if (!expect.contains(":*")) actual == expect
            else { // wildcard fields compare name-only
              val as = actual.split(", ").map(_.split(":", 2))
              val es = expect.split(", ").map(_.split(":", 2))
              as.length == es.length && as.zip(es).forall { case (a, e) =>
                a(0) == e(0) && (e(1) == "*" || a(1) == e(1)) }
            }
          if (matches) None
          else Some(s"$name:\n  pinned: $expect\n  actual: $actual")
      }
    }
    assert(diffs.isEmpty,
      "testdata epoch drift — verify the roster against the new files, " +
        "then update the pins:\n" + diffs.mkString("\n"))
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
