package graft.operators

import graft.SparkSessionFixture
import org.scalatest.funsuite.AnyFunSuite

/** QualityPerceptron's fixed-point arithmetic is the load-bearing idea
  * (t44/t45's hash oracle rests on every gradient being an exact
  * associative integer sum and every update a correctly-rounded
  * floor(double-div)), so the update rule gets a hand-computed leg
  * beside the convergence behavior. */
class QualityPerceptronSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private def feats(rows: Seq[(Long, Long, Long, Long, Long, Long)]) =
    rows.toDF("y", "x1", "x2", "x3", "x4", "x5")

  test("round-1 update is the hand-computed mean mistake vector " +
    "(all docs mistaken at w=0, floor of grad/n)") {
    // two docs: y=+1 x=(100,200,0,0,10000), y=-1 x=(50,300,0,0,10000)
    // w0 = 0 -> margins 0 -> both mistaken (y*m <= 0)
    // grad = (+100-50, +200-300, 0, 0, +10000-10000) = (50,-100,0,0,0)
    // denom = max(2,1)*2^0 = 2 -> update = (25, -50, 0, 0, 0)
    val f = feats(Seq(
      (1L, 100L, 200L, 0L, 0L, 10000L),
      (-1L, 50L, 300L, 0L, 0L, 10000L)))
    val (wFinal, traj) = QualityPerceptron.learn(f, 1)
    val t = traj.collect()(0)
    assert(t.getAs[Int]("learn_round") == 1)
    assert(t.getAs[Long]("n_mistakes") == 2L)
    assert((1 to 5).map(i => t.getAs[Long](s"w$i")) ==
      Seq(25L, -50L, 0L, 0L, 0L))
    assert(wFinal.collect()(0).toSeq == Seq(25L, -50L, 0L, 0L, 0L))
  }

  test("negative gradients floor toward -inf (not truncate toward 0) — " +
    "the Spark/DuckDB-portable convention") {
    // one doc, y=-1, x1=5 -> grad1 = -5, denom = 1 -> w1 = floor(-5/1) = -5
    // then with 2 rounds: round 2 margin = -5*5 = -25, y*m = +25 > 0 ->
    // no mistake, grad 0, w unchanged
    val f = feats(Seq((-1L, 5L, 0L, 0L, 0L, 0L)))
    val (_, traj) = QualityPerceptron.learn(f, 2)
    val rows = traj.collect().sortBy(_.getAs[Int]("learn_round"))
    assert(rows(0).getAs[Long]("w1") == -5L)
    assert(rows(1).getAs[Long]("n_mistakes") == 0L)
    assert(rows(1).getAs[Long]("w1") == -5L)
    // odd split: grad -5 over denom 2 (2 mistakes) floors to -3, not -2
    val f2 = feats(Seq((-1L, 2L, 0L, 0L, 0L, 0L), (-1L, 3L, 0L, 0L, 0L, 0L)))
    val (_, traj2) = QualityPerceptron.learn(f2, 1)
    assert(traj2.collect()(0).getAs[Long]("w1") == -3L)
  }

  test("linearly separable planted data converges to zero mistakes and " +
    "score() agrees with the trajectory's final weights") {
    // separable on x2: positives x2=8000, negatives x2=2000, shared bias
    val rows = (1 to 40).map { i =>
      if (i % 4 == 0) (-1L, 5000L, 2000L, 1000L, 5000L, 10000L)
      else (1L, 5000L, 8000L, 1500L, 5000L, 10000L)
    }
    val f = feats(rows)
    val (wFinal, traj) = QualityPerceptron.learn(f, 8)
    val t = traj.collect().sortBy(_.getAs[Int]("learn_round"))
    assert(t.last.getAs[Long]("n_mistakes") == 0L,
      "separable data did not converge within 8 annealed rounds")
    val scored = QualityPerceptron.score(f, wFinal).collect()
    scored.foreach { r =>
      assert(r.getAs[Long]("y") * r.getAs[Long]("margin") > 0,
        s"final weights misclassify a row: $r")
    }
  }

  test("carry columns ride untouched and do not perturb the gradient") {
    val f = feats(Seq(
      (1L, 100L, 200L, 0L, 0L, 10000L),
      (-1L, 50L, 300L, 0L, 0L, 10000L)))
      .withColumn("source", org.apache.spark.sql.functions.lit("src0"))
    val (_, traj) = QualityPerceptron.learn(f, 1)
    assert((1 to 5).map(i => traj.collect()(0).getAs[Long](s"w$i")) ==
      Seq(25L, -50L, 0L, 0L, 0L))
  }
}
