package graft.operators

import graft.SparkSessionFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale proofs for the d13/s04 coarse-quantizer cap-split: sub-cluster
  * sizes stay bounded when vectors pile into one cluster (the Σ cluster²
  * failure mode the round-6 verdict named), and the sign-pattern salt
  * provably co-locates scaled duplicates — the recall property a row-id
  * hash would destroy.
  */
class CentroidSplitSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def randVec(): Seq[Double] = Seq.fill(16)(rng.nextGaussian())

  test("capSplit bounds sub-cluster size on a single oversized cluster") {
    // 1000 vectors all assigned to ONE cluster — the unsplit pair join
    // would do 1000*999/2 ≈ 500k comparisons
    val cap = 64
    val assigned = (0 until 1000).map(i => (i.toLong, 1L, randVec()))
      .toDF("vec_id", "cl_id", "vec")
      .withColumn("salt", CentroidBuild.signSalt(col("vec")))
    val sizes = CentroidBuild.capSplit(assigned, cap)
      .groupBy("cl_id", "sub").count().select("count").as[Long].collect()
    val expectedSubs = (1000 + cap - 1) / cap
    assert(sizes.length <= expectedSubs,
      s"expected at most $expectedSubs sub-clusters, got ${sizes.length}")
    assert(sizes.sum == 1000, "splitting must not drop or duplicate rows")
    // sign-salt assignment is near-uniform on gaussian vectors: each
    // sub-cluster stays within a small factor of cap
    assert(sizes.max <= 2L * cap,
      s"sub-cluster overflow: max ${sizes.max} vs cap $cap")
    // pair work collapses from ~500k to ~nsub * (2cap)^2 / 2
    val pairCost = sizes.map(n => n * (n - 1) / 2).sum
    assert(pairCost <= expectedSubs * 2L * cap * cap,
      s"pair cost $pairCost not capped")
  }

  test("signSalt is invariant under positive scaling — scaled dups " +
      "always share their original's sub-cluster") {
    val base = (0 until 500).map(i => (i.toLong, randVec()))
      .toDF("vec_id", "vec")
    val scaled = base.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("vec"), x => x * lit(1.001)).as("vec"))
    val salts = base.unionByName(scaled)
      .select(col("vec_id"), CentroidBuild.signSalt(col("vec")).as("salt"))
    val diverged = salts.as("a").join(salts.as("b"),
        col("a.vec_id") + 100000 === col("b.vec_id") &&
          col("a.salt") =!= col("b.salt"))
      .count()
    assert(diverged == 0, s"$diverged scaled copies changed salt")
    // and therefore share `sub` whatever nsub their cluster gets: same
    // salt ⇒ same salt % nsub for every nsub
  }

  test("capSplit's bound has an identical-content escape hatch — " +
      "pinned, not hidden: h exact copies share (cl_id, salt) and " +
      "land in ONE sub whatever the cap") {
    // the salt is content-derived BY DESIGN (recall: a duplicate must
    // co-locate with its original), so identical vectors cannot be
    // split apart — the d10Blocked overflow caveat, vector edition.
    // This is why semDedupBuild collapses exact vectors FIRST.
    val v = randVec()
    val assigned = (0 until 200).map(i => (i.toLong, 1L, v))
      .toDF("vec_id", "cl_id", "vec")
      .withColumn("salt", CentroidBuild.signSalt(col("vec")))
    val sizes = CentroidBuild.capSplit(assigned, cap = 8)
      .groupBy("cl_id", "sub").count().select("count").as[Long].collect()
    assert(sizes.length == 1 && sizes.head == 200,
      s"identical vectors split across subs (${sizes.toSeq}) — the salt " +
        "is no longer content-derived and scaled-dup recall is broken")
  }

  test("semDedupBuild: the exact-vector collapse is the identity on a " +
      "duplicate-free corpus") {
    val corpus = (0 until 50).map(i => (i.toLong, randVec()))
      .toDF("vec_id", "vec")
    val (reps, assign, _) =
      graft.queries.SimilarityQueries.semDedupBuild(corpus, dim = 16)
    assert(reps.count() == 50)
    assert(reps.filter(col("gsize") =!= 1).count() == 0)
    assert(assign.select("vec_id").distinct().count() == 50)
  }

  test("semDedupBuild: a mega-duplicate group collapses to one rep, " +
      "members drop by arithmetic, and the near-dup NEIGHBOR is " +
      "recalled where the uncollapsed cap-split provably loses it") {
    // Fixture built for determinism, not luck:
    //  - v: first 8 dims negative with dim 1 at −1e−9 ⇒ salt 0
    //  - neighbor: same vector with dim 1 at +1e−9 ⇒ salt 1,
    //    cosine(v, neighbor) ≈ 1 ≥ 0.999
    //  - 60 exact copies of v (ids 100–159, rep = 100), neighbor id
    //    500, 20 organic gaussians (ids 0–19, pairwise cos ≪ 0.999)
    // UNCOLLAPSED: the group's cluster census bn ≥ 61 ⇒ nsub ≥ 8, and
    // sub(group) = 0 ≠ 1 = sub(neighbor) ⇒ the genuine near-dup pair
    // is never compared — the cap SILENTLY COSTS RECALL exactly when
    // the corpus is duplicate-heavy. COLLAPSED: the group is one rep,
    // its cluster census stays ≤ cap ⇒ nsub = 1 ⇒ the pair is
    // compared and the neighbor drops.
    val vBase = randVec().map(x => -math.abs(x) - 0.1)
    val v = vBase.updated(0, -1e-9)
    val neighbor = vBase.updated(0, 1e-9)
    val organic = (0 until 20).map(i => (i.toLong, randVec()))
    val group = (0 until 60).map(i => ((100 + i).toLong, v))
    val corpus = (organic ++ group :+ (500L, neighbor))
      .toDF("vec_id", "vec")

    val (reps, _, dupPairs) =
      graft.queries.SimilarityQueries.semDedupBuild(corpus, dim = 16)
    assert(reps.count() == 22, "collapse must leave 20 organic + rep + neighbor")
    val grp = reps.filter(col("vec_id") === 100L)
      .select("gsize").as[Long].collect()
    assert(grp.sameElements(Array(60L)),
      s"group row (rep=100) must carry gsize 60, got ${grp.toSeq}")
    val droppedReps = dupPairs.select(col("b.vec_id")).as[Long]
      .collect().toSet
    assert(droppedReps == Set(500L),
      s"collapsed build must drop exactly the neighbor, got $droppedReps")

    // the uncollapsed comparator on the SAME corpus: the 59 non-min
    // members drop (in-sub identical pairs) but the neighbor escapes
    val un = graft.Soak.d13Uncollapsed(corpus, dim = 16)
      .select("n_dropped").as[Long].collect()
    assert(un.sameElements(Array(59L)),
      s"uncollapsed pipeline expected to drop exactly the 59 non-min " +
        s"copies and MISS the neighbor (the pinned recall bug), got ${un.toSeq}")
  }

  test("hierarchical IVF composes from lloyd: coarse outer cells, then " +
      "the same build per cell — the documented 100 TB shape") {
    // beyond ~10^8 vectors a single k=√n broadcast outgrows megabytes;
    // the standard move is lloyd(√k) coarse cells then lloyd per cell,
    // which must compose from the same blocks with no new shuffle shapes
    val corpus = (0 until 400).map(i => (i.toLong, randVec()))
      .toDF("vec_id", "vec")
    val kOuter = 4
    val coarse = CentroidBuild.lloyd(corpus, "vec_id", "vec", kOuter,
      rounds = 1, dim = 16)
    val assign = CentroidBuild.nearest(
      CentroidBuild.similarities(corpus, coarse, "vec_id", "vec"), "vec_id")
    // every vector lands in exactly one outer cell
    assert(assign.count() == 400)
    assert(assign.select("vec_id").distinct().count() == 400)
    val cells = corpus.join(assign, "vec_id")
    val biggest = cells.groupBy("cl_id").count()
      .orderBy(col("count").desc, col("cl_id")).select("cl_id")
      .as[Long].head()
    val cell = cells.filter(col("cl_id") === biggest).drop("cl_id")
    val inner = CentroidBuild.lloyd(cell, "vec_id", "vec", 3,
      rounds = 1, dim = 16)
    val innerAssign = CentroidBuild.nearest(
      CentroidBuild.similarities(cell, inner, "vec_id", "vec"), "vec_id")
    // the inner build partitions the cell the same way the outer build
    // partitioned the corpus — same operator, one level down
    assert(innerAssign.count() == cell.count())
    assert(inner.count() >= 1 && inner.count() <= 3)
  }

  test("d13's shipped corpus actually exercises the split (cap is not " +
      "dormant) and still finds every planted duplicate") {
    val rows = graft.SparkEntry.queries("d13_semantic_dedup")(spark, sf0001)
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    // every planted x1.001 copy must be dropped (keep-lowest-id) — the
    // salt cannot separate a planted pair
    assert(r.getAs[Long]("n_dropped") >= r.getAs[Long]("n_planted"),
      s"planted dups escaped the capped dedup: $r")
    // and the corpus is big enough that at least one cluster overflows
    // SemDedupCap, so the split path genuinely ran
    val perCluster = (r.getAs[Long]("n_vecs").toDouble
      / r.getAs[Long]("n_clusters"))
    assert(perCluster > graft.queries.SimilarityQueries.SemDedupCap,
      s"avg cluster ${perCluster} under cap — split dormant, weaken cap")
  }
}
