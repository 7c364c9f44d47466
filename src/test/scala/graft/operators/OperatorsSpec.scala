package graft.operators

import graft.SparkSessionFixture
import graft.functions.TypedAggregators
import graft.streaming.StatefulSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  test("SampleVariance aggregator matches built-in var_samp") {
    val xs = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 3.5, -2.25)
    val ds = xs.toDS()
    val typed = ds.select(TypedAggregators.SampleVariance.toColumn).collect()(0)
    val builtin = xs.toDF("x").agg(var_samp(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(typed - builtin) < 1e-9)
  }

  test("SampleVariance groups + partial merge (groupByKey over partitions)") {
    val ds = spark.range(0, 1000, 1, 8) // 8 partitions → real merges
      .select((col("id") % 4).as("k"), (col("id") * 1.5).as("x"))
      .as[(Long, Double)]
    val typed = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(TypedAggregators.SampleVariance.toColumn.name("v"))
      .collect().toMap
    val builtin = ds.toDF("k", "x").groupBy("k").agg(var_samp(col("x")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    typed.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-6, s"k=$k")
    }
  }

  test("GeometricMean of powers of 2 is exact") {
    val g = Seq(2.0, 8.0).toDS()
      .select(TypedAggregators.GeometricMean.toColumn).collect()(0)
    assert(math.abs(g - 4.0) < 1e-12)
  }

  test("saltedSumCount equals direct groupBy sum/count") {
    val df = spark.range(0, 10000)
      .select((col("id") % 3).as("k"), (col("id") % 7).cast("double").as("v"))
      .toDF()
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewTools.saltedSumCount(df, Seq("k"), "v")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(c == direct(k)._2 && math.abs(s - direct(k)._1) < 1e-6)
    }
  }

  test("saltedJoin equals plain inner join") {
    val left = spark.range(0, 5000).select((col("id") % 5).as("k"), col("id").as("lv")).toDF()
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = SkewTools.saltedJoin(left, right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("stateful streaming sessionization emits closed sessions") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatefulSessionize.Event]
    val q = StatefulSessionize.sessions(mem.toDS(), gapSec = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions").start()
    def ev(u: Long, sec: Long, id: Long) =
      StatefulSessionize.Event(u, new java.sql.Timestamp(sec * 1000), id)
    // session 1: events at t=0,30; gap >60 → closes when t=200 arrives
    mem.addData(ev(1, 0, 1), ev(1, 30, 2))
    q.processAllAvailable()
    mem.addData(ev(1, 200, 3))
    q.processAllAvailable()
    val out = spark.table("graft_sessions")
      .as[StatefulSessionize.Session].collect()
    q.stop()
    assert(out.length == 1)
    assert(out(0) == StatefulSessionize.Session(1, 2, 30.0, 1, 2))
  }

  test("sessionize: late in-gap event moves first_event with the start") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatefulSessionize.Event]
    val q = StatefulSessionize.sessions(mem.toDS(), gapSec = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions_late").start()
    def ev(u: Long, sec: Long, id: Long) =
      StatefulSessionize.Event(u, new java.sql.Timestamp(sec * 1000), id)
    mem.addData(ev(1, 30, 2))
    q.processAllAvailable()
    // late event BEFORE the recorded start, still within the gap:
    // session becomes [10, 30] and its first event must be id 9
    mem.addData(ev(1, 10, 9))
    q.processAllAvailable()
    mem.addData(ev(1, 300, 3)) // gap > 60 closes the session
    q.processAllAvailable()
    val out = spark.table("graft_sessions_late")
      .as[StatefulSessionize.Session].collect()
    q.stop()
    assert(out.length == 1)
    assert(out(0) == StatefulSessionize.Session(1, 2, 20.0, 9, 2))
  }

  test("sessionize: far-early late event becomes its own session, no merge") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatefulSessionize.Event]
    val q = StatefulSessionize.sessions(mem.toDS(), gapSec = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions_early").start()
    def ev(u: Long, sec: Long, id: Long) =
      StatefulSessionize.Event(u, new java.sql.Timestamp(sec * 1000), id)
    mem.addData(ev(1, 1000, 2))
    q.processAllAvailable()
    // late event 900s BEFORE the open session's start (gap is 60s): it
    // must NOT merge — the open session's bounds stay [1000, 1000]
    mem.addData(ev(1, 100, 1))
    q.processAllAvailable()
    mem.addData(ev(1, 2000, 3)) // closes the open session
    q.processAllAvailable()
    val out = spark.table("graft_sessions_early")
      .as[StatefulSessionize.Session].collect().sortBy(_.first_event)
    q.stop()
    assert(out.toSeq == Seq(
      StatefulSessionize.Session(1, 1, 0.0, 1, 1),
      StatefulSessionize.Session(1, 1, 0.0, 2, 2)))
  }

  test("sessionize: equal-ts late event never demotes last_event") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatefulSessionize.Event]
    val q = StatefulSessionize.sessions(mem.toDS(), gapSec = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions_tie").start()
    def ev(u: Long, sec: Long, id: Long) =
      StatefulSessionize.Event(u, new java.sql.Timestamp(sec * 1000), id)
    mem.addData(ev(1, 30, 5))
    q.processAllAvailable()
    // same timestamp, smaller id, later batch: (ts, event_id) order says
    // id 5 is still the last event (and 2 becomes the first)
    mem.addData(ev(1, 30, 2))
    q.processAllAvailable()
    mem.addData(ev(1, 300, 9))
    q.processAllAvailable()
    val out = spark.table("graft_sessions_tie")
      .as[StatefulSessionize.Session].collect()
    q.stop()
    assert(out.length == 1)
    assert(out(0) == StatefulSessionize.Session(1, 2, 0.0, 2, 5))
  }
}
