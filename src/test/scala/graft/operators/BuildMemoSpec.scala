package graft.operators

import graft.SparkSessionFixture
import org.scalatest.funsuite.AnyFunSuite

/** BuildMemo's contract is "skip recomputation, change NOTHING else":
  * the r20 shared-build memoization (BPE merge table, t44 perceptron
  * model, s27/s28 graph index) is only sound if memo-hit ≡ memo-miss
  * bit-for-bit and a session's handoff dirs are reclaimed. The
  * consumer-level equivalence legs compare the memoized accessors
  * against DIRECT unmemoized computations of the same builds. */
class BuildMemoSpec extends AnyFunSuite {
  import SparkSessionFixture.{spark, sf0001}

  test("memo runs the build once per (session, key) and returns the " +
    "same value to every caller") {
    var builds = 0
    def get() = BuildMemo.memo(spark, "spec:counter") {
      builds += 1; Seq(1, 2, 3)
    }
    val a = get(); val b = get()
    assert(builds == 1, "second call must not re-run the build")
    assert((a eq b) || a == b)
    assert(BuildMemo.handleInfo(spark, "spec:counter").contains("memo"))
    BuildMemo.invalidate("spec:counter")
    assert(BuildMemo.handleInfo(spark, "spec:counter").isEmpty)
  }

  test("memoParquet creates the dir once, returns the same path, and " +
    "evictSession deletes it") {
    var builds = 0
    def get() = BuildMemo.memoParquet(spark, "spec:pq") { out =>
      builds += 1
      spark.range(3).toDF("n").write.parquet(s"$out/part")
    }
    val d1 = get(); val d2 = get()
    assert(builds == 1 && d1 == d2)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d1, "part")))
    assert(spark.read.parquet(s"$d1/part").count() == 3)
    // eviction reclaims the handoff and forgets the entry; a fresh
    // call rebuilds into a NEW dir (the application-end listener runs
    // exactly this method)
    BuildMemo.evictSession(spark.sparkContext.applicationId)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)),
      "evictSession must delete the parquet handoff dir")
    assert(BuildMemo.handleInfo(spark, "spec:pq").isEmpty)
    val d3 = get()
    assert(builds == 2 && d3 != d1)
    BuildMemo.invalidate("spec:pq")
  }

  test("memo builds may NEST — a build that reads another memo entry " +
    "must not hit ConcurrentHashMap's recursive-update guard (the r20 " +
    "soak x10 failure: qcModel's build reads the qcFeatures handoff)") {
    // force many nested pairs so same-bin collisions are overwhelmingly
    // likely — under computeIfAbsent this threw IllegalStateException
    (1 to 64).foreach { i =>
      val outer = BuildMemo.memo(spark, s"spec:nest:outer:$i") {
        val inner = BuildMemo.memoParquet(spark, s"spec:nest:inner:$i") {
          out => spark.range(1).toDF("n").write.parquet(s"$out/p")
        }
        s"built-from:$inner"
      }
      assert(outer.startsWith("built-from:"))
      BuildMemo.invalidate(s"spec:nest:outer:$i")
      BuildMemo.invalidate(s"spec:nest:inner:$i")
    }
  }

  test("a key cannot hold both a value and a parquet handoff") {
    BuildMemo.memo(spark, "spec:dual") { "v" }
    val e = intercept[RuntimeException] {
      BuildMemo.memoParquet(spark, "spec:dual") { _ => () }
    }
    assert(e.getMessage.contains("cannot be both"))
    BuildMemo.invalidate("spec:dual")
  }

  test("bpe memo-hit ≡ memo-miss: the memoized merge table equals a " +
    "direct BpeMerge.learn over the canonical corpus fold") {
    import org.apache.spark.sql.functions._
    val rounds = graft.queries.TextQueries.BpeRounds
    // direct, unmemoized: the same fold the memo build owns
    val words = graft.Tables.documents(spark, sf0001)
      .select(explode(filter(split(col("text"), " "), t => t =!= ""))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val direct = BpeMerge.learn(words, rounds)
      .orderBy("merge_round").collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val miss = graft.queries.TextQueries.bpeLearnTable(spark, sf0001)
    val hit = graft.queries.TextQueries.bpeLearnTable(spark, sf0001)
    assert(miss == direct, "memoized learn diverged from direct learn")
    assert(hit == direct)
    assert(BuildMemo
      .handleInfo(spark, s"bpe:$sf0001:$rounds").contains("memo"))
  }

  test("qc model memo-hit ≡ memo-miss: the memoized trajectory equals " +
    "a direct QualityPerceptron.learn over the memoized features") {
    val rounds = graft.queries.TextQueries.QcRounds
    val feats = graft.queries.TextQueries.qcFeaturesMemo(spark, sf0001)
    val direct = QualityPerceptron.learn(feats, rounds)._2
      .orderBy("learn_round").collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val memo = graft.queries.TextQueries.qcModel(spark, sf0001)
    assert(memo == direct)
    // final weights frame = last trajectory row
    val w = graft.queries.TextQueries.qcWeights(spark, sf0001)
      .collect()(0)
    val last = direct.last
    assert((w.getLong(0), w.getLong(1), w.getLong(2), w.getLong(3),
      w.getLong(4)) == ((last._2, last._3, last._4, last._5, last._6)))
  }

  test("verbatim-span memo-hit ≡ memo-miss: the memoized repeated-start " +
    "table equals the direct positioned-gram census (r21: d14's audit " +
    "and d28's excision serve one detection build)") {
    import org.apache.spark.sql.functions.col
    def startSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").cast("long"), col("lang"),
        col("i").cast("long")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val memo = startSet(
      graft.queries.DedupQueries.verbatimRepStarts(spark, sf0001))
    val direct = startSet(
      graft.queries.DedupQueries.verbatimRepStartsDirect(spark, sf0001))
    assert(memo == direct,
      "memoized repeated-start table diverged from direct detection")
    assert(memo.nonEmpty, "planted banner must produce repeated spans")
  }

  test("pq index memo-hit ≡ memo-miss: memoized cents/codebook/enc " +
    "equal the direct pqIndexDirect build bit-for-bit (r21: s11/s18/" +
    "s19 serve one shared index build per sweep)") {
    import org.apache.spark.sql.functions.col
    val (centsM, bookM, encM) =
      graft.queries.SimilarityQueries.pqIndexMemo(spark, sf0001)
    val (centsD, bookD, encD) =
      graft.queries.SimilarityQueries.pqIndexDirect(spark, sf0001)
    def encSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").cast("long"), col("cl_id").cast("long"),
        col("sp").cast("int"), col("code").cast("int")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
    assert(encSet(encM) == encSet(encD),
      "memoized PQ codes diverged from direct build")
    // centroid / codebook vectors must round-trip parquet bit-exactly
    def vecMap(df: org.apache.spark.sql.DataFrame, ks: String*) =
      df.collect().map { r =>
        ks.map(k => r.getAs[Any](k)).mkString(":") ->
          r.getAs[scala.collection.Seq[Double]]("cvec")
            .map(java.lang.Double.doubleToRawLongBits).toSeq
      }.toMap
    assert(vecMap(centsM, "cl_id") == vecMap(centsD, "cl_id"),
      "memoized centroids diverged (bitwise) from direct build")
    assert(vecMap(bookM, "sp", "code") == vecMap(bookD, "sp", "code"),
      "memoized codebook diverged (bitwise) from direct build")
  }

  test("graph index memo-hit ≡ memo-miss: memoized edges and routing " +
    "equal the direct hierRoute/graphEdges build") {
    val (idxM, edgesM) =
      graft.queries.SimilarityQueries.graphIndexMemo(
        spark, sf0001, union = true)
    val (idxD, edgesD) =
      graft.queries.SimilarityQueries.graphIndexDirect(
        spark, sf0001, union = true)
    import org.apache.spark.sql.functions.col
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(edgesM) == edgeSet(edgesD),
      "memoized edge set diverged from direct build")
    def routedSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").cast("long"), col("cell").cast("long"),
        col("fid").cast("long"), col("rn").cast("int")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
    assert(routedSet(idxM.routed) == routedSet(idxD.routed),
      "memoized routing diverged from direct build")
  }
}
