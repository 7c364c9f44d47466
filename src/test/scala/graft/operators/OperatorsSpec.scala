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

  private def ev(u: Long, sec: Long, id: Long) =
    StatefulSessionize.Event(u, new java.sql.Timestamp(sec * 1000), id)

  /** Session clone with the RocksDB state store the transformWithState
    * twins require (the shared fixture session keeps the default
    * provider so the legacy paths stay covered on it). */
  private lazy val rocks: org.apache.spark.sql.SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    ss
  }

  private def runSessionsOn(s2: org.apache.spark.sql.SparkSession,
      name: String,
      mk: (org.apache.spark.sql.Dataset[StatefulSessionize.Event],
        org.apache.spark.sql.SparkSession) =>
        org.apache.spark.sql.Dataset[StatefulSessionize.Session])(
      batches: Seq[StatefulSessionize.Event]*): Seq[StatefulSessionize.Session] = {
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val mem = MemoryStream[StatefulSessionize.Event]
    val q = mk(mem.toDS(), s2)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s2.table(name).as[StatefulSessionize.Session]
        .collect().toSeq.sortBy(_.first_event)
    } finally q.stop()
  }

  /** Feed `batches` one micro-batch at a time through the sessionizer
    * (gap 60s) on BOTH arbitrary-state APIs — legacy
    * flatMapGroupsWithState on the default store and the
    * transformWithState twin on RocksDB — assert they emit identically
    * (twin parity rides every scenario for free), and return the
    * output sorted by first_event. Queries are stopped in a finally so
    * a failing assertion cannot leak a running stream into later
    * tests. */
  private def runSessions(name: String)(
      batches: Seq[StatefulSessionize.Event]*): Seq[StatefulSessionize.Session] = {
    val legacy = runSessionsOn(spark, name,
      (ds, s) => StatefulSessionize.sessions(ds, gapSec = 60)(s))(batches: _*)
    val tws = runSessionsOn(rocks, name + "_tws",
      (ds, s) => StatefulSessionize.sessionsTws(ds, gapSec = 60)(s))(batches: _*)
    assert(tws == legacy,
      s"modern-API twin diverged:\n legacy=$legacy\n    tws=$tws")
    legacy
  }

  test("stateful streaming sessionization emits closed sessions") {
    // session 1: events at t=0,30; gap >60 → closes when t=200 arrives
    val out = runSessions("graft_sessions")(
      Seq(ev(1, 0, 1), ev(1, 30, 2)), Seq(ev(1, 200, 3)))
    assert(out == Seq(StatefulSessionize.Session(1, 2, 30.0, 1, 2)))
  }

  test("sessionize: late in-gap event moves first_event with the start") {
    // late event BEFORE the recorded start, still within the gap:
    // session becomes [10, 30] and its first event must be id 9
    val out = runSessions("graft_sessions_late")(
      Seq(ev(1, 30, 2)), Seq(ev(1, 10, 9)), Seq(ev(1, 300, 3)))
    assert(out == Seq(StatefulSessionize.Session(1, 2, 20.0, 9, 2)))
  }

  test("sessionize: far-early late event becomes its own session, no merge") {
    // late event 900s BEFORE the open session's start (gap is 60s): it
    // must NOT merge — the open session's bounds stay [1000, 1000]
    val out = runSessions("graft_sessions_early")(
      Seq(ev(1, 1000, 2)), Seq(ev(1, 100, 1)), Seq(ev(1, 2000, 3)))
    assert(out == Seq(
      StatefulSessionize.Session(1, 1, 0.0, 1, 1),
      StatefulSessionize.Session(1, 1, 0.0, 2, 2)))
  }

  test("sessionize: clustered far-early late events merge into ONE session") {
    // two late events within the gap of each other, both far before the
    // open session: they are a single earlier session [100, 140], not
    // two singletons
    val out = runSessions("graft_sessions_early2")(
      Seq(ev(1, 1000, 5)), Seq(ev(1, 100, 1), ev(1, 140, 2)), Seq(ev(1, 2000, 9)))
    assert(out == Seq(
      StatefulSessionize.Session(1, 2, 40.0, 1, 2),
      StatefulSessionize.Session(1, 1, 0.0, 5, 5)))
  }

  test("sessionize: late chain bridging into the open session merges with it") {
    // late events [700, 750, ..., 950] chain to within the gap of the
    // open session's start (1000): batch semantics say ONE session
    val chain = (0 to 5).map(i => ev(1, 700 + i * 50, 10 + i))
    val out = runSessions("graft_sessions_bridge")(
      Seq(ev(1, 1000, 5)), chain, Seq(ev(1, 2000, 9)))
    assert(out == Seq(StatefulSessionize.Session(1, 7, 300.0, 10, 5)))
  }

  test("sessionize: cross-batch state matches a batch reference on seeded random streams") {
    // 300 seeded random events over 6 users, delivered in 6 ts-ordered
    // micro-batches (ordered delivery = no lateness, so the pure
    // cross-batch state-resumption path is what's under test). The
    // operator must emit exactly the batch-computed sessions minus each
    // user's final (never-closed) one.
    val rng = new scala.util.Random(7)
    val events = (1 to 300).map { id =>
      ev(1 + rng.nextInt(6), rng.nextInt(10000).toLong, id.toLong)
    }
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val batches = sorted.grouped(50).toSeq
    def batchSessions(evs: Seq[StatefulSessionize.Event]): Seq[StatefulSessionize.Session] =
      evs.groupBy(_.user_id).toSeq.flatMap { case (uid, us) =>
        val ordered = us.sortBy(e => (e.ts.getTime, e.event_id))
        val groups = ordered.tail.foldLeft(Vector(Vector(ordered.head))) {
          (acc, e) =>
            if (e.ts.getTime - acc.last.last.ts.getTime <= 60000L)
              acc.init :+ (acc.last :+ e)
            else acc :+ Vector(e)
        }
        groups.map { g =>
          StatefulSessionize.Session(uid, g.size,
            (g.last.ts.getTime - g.head.ts.getTime) / 1000.0,
            g.head.event_id, g.last.event_id)
        }
      }
    val expected = batchSessions(sorted)
      .groupBy(_.user_id).values.flatMap(_.init).toSet // drop each user's open last
    val emitted = runSessions("graft_sessions_prop")(batches: _*).toSet
    assert(emitted == expected,
      s"missing=${expected -- emitted} extra=${emitted -- expected}")
  }

  test("sessionize: cross-batch early split is detected via the counter") {
    // t=100 arrives in batch 2 (early session, closed + emitted at end
    // of batch), t=130 in batch 3: batch semantics would merge them
    // (gap 60) into ONE session, but append mode cannot retract the
    // emission — the operator emits two sessions AND increments the
    // split counter so the divergence is auditable.
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val counter = spark.sparkContext.longAccumulator("graft_session_splits")
    val mem = MemoryStream[StatefulSessionize.Event]
    val q = StatefulSessionize.sessions(mem.toDS(), gapSec = 60,
        splitCounter = Some(counter))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions_split").start()
    try {
      Seq(Seq(ev(1, 1000, 5)), Seq(ev(1, 100, 1)), Seq(ev(1, 130, 2)),
        Seq(ev(1, 2000, 9))).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      val out = spark.table("graft_sessions_split")
        .as[StatefulSessionize.Session].collect().toSeq.sortBy(_.first_event)
      assert(out == Seq(
        StatefulSessionize.Session(1, 1, 0.0, 1, 1),
        StatefulSessionize.Session(1, 1, 0.0, 2, 2),
        StatefulSessionize.Session(1, 1, 0.0, 5, 5)))
      assert(counter.value == 1L, s"split counter = ${counter.value}")
    } finally q.stop()
  }

  test("sessionize: equal-ts late event never demotes last_event") {
    // same timestamp, smaller id, later batch: (ts, event_id) order says
    // id 5 is still the last event (and 2 becomes the first)
    val out = runSessions("graft_sessions_tie")(
      Seq(ev(1, 30, 5)), Seq(ev(1, 30, 2)), Seq(ev(1, 300, 9)))
    assert(out == Seq(StatefulSessionize.Session(1, 2, 0.0, 2, 5)))
  }

  test("PrefixScan.runningSum equals the window cumsum on a multi-partition frame") {
    // 3 groups × 2000 rows over 16 input partitions, scanned with 8
    // range partitions — every partition boundary cuts through a group
    val df = spark.range(0, 6000, 1, 16)
      .select((col("id") % 3).cast("string").as("g"), col("id").as("ord"),
        ((col("id") * 7) % 13 + 1).as("v"))
    val scanned = PrefixScan.runningSum(df, Seq("g"), Seq("ord"), "v", "cum",
      numPartitions = 8)
    val expected = df.withColumn("cum",
      sum("v").over(org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("ord")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    assert(scanned.select("g", "ord", "v", "cum").except(expected).isEmpty &&
      expected.except(scanned.select("g", "ord", "v", "cum")).isEmpty)
    assert(scanned.count() == 6000)
  }

  test("PrefixScan: no window ever partitions by the bare low-cardinality group") {
    // the data-sized window must key on (__pid, group); only the
    // metadata-sized offset window may key on the group alone
    val df = spark.range(0, 1000, 1, 8)
      .select(lit("onegroup").as("g"), col("id").as("ord"), lit(1L).as("v"))
    val scanned = PrefixScan.runningSum(df, Seq("g"), Seq("ord"), "v", "cum",
      numPartitions = 4)
    val plan = scanned.queryExecution.executedPlan.toString
    // the big window runs over (__pid, g): its specification string
    // mentions __pid; a bare [g] window over the full data would not
    assert(plan.contains("__pid"), plan.take(2000))
    val row = scanned.agg(max("cum")).collect()(0)
    assert(row.getLong(0) == 1000L)
  }

  import graft.streaming.QuotaAdmission
  import graft.streaming.QuotaAdmission.Doc

  private def runQuotaOn(s2: org.apache.spark.sql.SparkSession,
      name: String, quota: Long,
      mk: (org.apache.spark.sql.Dataset[Doc], Long,
        org.apache.spark.sql.SparkSession) => org.apache.spark.sql.Dataset[Doc])(
      batches: Seq[Doc]*): Seq[Doc] = {
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val mem = MemoryStream[Doc]
    val q = mk(mem.toDS(), quota, s2)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s2.table(name).as[Doc].collect().toSeq
    } finally q.stop()
  }

  /** Both APIs (see runSessions): legacy wrapper on the default store,
    * transformWithState twin on RocksDB, asserted identical per
    * (source, ids-in-order), legacy returned. */
  private def runQuota(name: String, quota: Long)(
      batches: Seq[Doc]*): Seq[Doc] = {
    val legacy = runQuotaOn(spark, name, quota,
      (ds, qt, s) => QuotaAdmission.admit(ds, qt)(s))(batches: _*)
    val tws = runQuotaOn(rocks, name + "_tws", quota,
      (ds, qt, s) => QuotaAdmission.admitTws(ds, qt)(s))(batches: _*)
    def canon(d: Seq[Doc]) = d.groupBy(_.source)
      .view.mapValues(_.map(_.doc_id)).toMap
    assert(canon(tws) == canon(legacy),
      s"modern-API twin diverged:\n legacy=$legacy\n    tws=$tws")
    legacy
  }

  test("quota admission keeps the k smallest doc_ids per key — the bounded-" +
      "heap path admits exactly what sort-then-take did") {
    // key a: 5 rows against quota 3 → the 3 smallest ids, never the 3
    // first-iterated; key b stays under quota and admits everything
    val out = runQuota("graft_quota_heap", 3)(Seq(
      Doc(5, "a"), Doc(1, "a"), Doc(9, "a"), Doc(3, "a"), Doc(7, "a"),
      Doc(2, "b")))
    assert(out.filter(_.source == "a").map(_.doc_id).sorted == Seq(1L, 3L, 5L))
    assert(out.filter(_.source == "b").map(_.doc_id) == Seq(2L))
  }

  test("quota admission: an exhausted key short-circuits (emits nothing " +
      "ever after); an open key tops up to exactly the remaining quota") {
    val out = runQuota("graft_quota_exhaust", 2)(
      Seq(Doc(10, "a"), Doc(11, "a"), Doc(12, "a"), Doc(5, "b")),
      Seq(Doc(1, "a"), Doc(2, "a"), Doc(6, "b"), Doc(7, "b")))
    // batch 1 admits a:{10,11} (quota 2) and b:{5}; batch 2 finds a
    // exhausted — even though its ids are smaller — and b admits only
    // ONE more row, the smaller of {6,7}
    assert(out.filter(_.source == "a").map(_.doc_id).sorted == Seq(10L, 11L))
    assert(out.filter(_.source == "b").map(_.doc_id).sorted == Seq(5L, 6L))
  }

  test("ivfCandidatesRanked prefix-filter ≡ per-arm ivfCandidates for " +
      "every sweep point (r21: s17 builds one ranked frame and each " +
      "nprobe arm is a prank filter — probe lists are nested prefixes " +
      "of the same deterministic ranking)") {
    import graft.SparkSessionFixture.sf0001
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"),
        expr("transform(embedding, x -> double(x))").as("vec"))
    val cents = CentroidBuild.centroids(
      graft.Tables.embeddings(spark, sf0001)
        .select(col("label"),
          expr("transform(embedding, x -> double(x))").as("vec")),
      col("label"), col("vec"))
    val ranked = CentroidBuild.ivfCandidatesRanked(
      emb, cents, col("vec_id") < 3, 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1, 2, 4).foreach { np =>
      val perArm = pairs(CentroidBuild.ivfCandidates(
        emb, cents, col("vec_id") < 3, np))
      val prefix = pairs(ranked.filter(col("prank") <= np))
      assert(prefix == perArm,
        s"nprobe=$np: prefix-filtered ranked candidates diverged from " +
          "the per-arm build")
    }
  }
}
