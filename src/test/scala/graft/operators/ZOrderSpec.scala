package graft.operators

import graft.{SparkSessionFixture, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order claims, proven end-to-end: the column-algebra Morton key
  * is bit-exact, and files written by [[ZOrder.writeZOrdered]] really
  * carry min/max footers tight enough that a single-dimension probe
  * prunes most of them — while a one-key-sorted layout is blind to the
  * other dimension and scans everything. */
class ZOrderSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("interleave2 matches a bit-by-bit reference; normalize handles " +
      "the degenerate range") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (12345L, 54321L), (40000L, 1L))
    val got = cases.toDF("x", "y")
      .withColumn("z", ZOrder.interleave2(col("x"), col("y"), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 16), s"interleave2($x, $y)")
    }
    // canonical spot values: x fills even bits, y fills odd bits
    assert(ref(65535L, 0L, 16) == 0x55555555L)
    assert(ref(0L, 65535L, 16) == 0xAAAAAAAAL)

    // k-dim generalization: bit i·k+j comes from column j
    def refN(vs: Seq[Long], bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        vs.zipWithIndex.foldLeft(acc) { case (a, (v, j)) =>
          a | (((v >> i) & 1L) << (i * vs.size + j))
        }
      }
    val tri = Seq((255L, 17L, 200L), (0L, 255L, 0L), (255L, 255L, 255L))
    val gotN = tri.toDF("a", "b", "c")
      .withColumn("z", ZOrder.interleaveN(
        Seq(col("a"), col("b"), col("c")), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    gotN.foreach { case (a, b, c, z) =>
      assert(z == refN(Seq(a, b, c), 8), s"interleaveN($a, $b, $c)")
    }

    val n = Seq(5L).toDF("v").select(
      ZOrder.normalize(col("v"), lit(5L), lit(5L), 16).as("n"),
      ZOrder.normalize(col("v"), lit(0L), lit(10L), 16).as("mid")).head()
    assert(n.getLong(0) == 0L)   // hi == lo must not divide by zero
    assert(n.getLong(1) == (5L * 65535L) / 10L)
  }

  test("normalize overflow guard: an in-bound range is untouched, an " +
      "out-of-bound range raises, NULL bounds yield NULL not a crash") {
    val maxRange = Long.MaxValue / ((1L << 16) - 1)
    // in-bound: the widest legal range still produces the exact value
    val ok = Seq(maxRange).toDF("v").select(
      ZOrder.normalize(col("v"), lit(0L), lit(maxRange), 16)).head()
    assert(ok.getLong(0) == 65535L)
    // out-of-bound: one past the cap must raise with the r14 message,
    // not silently wrap the 64-bit numerator into garbage z-keys
    val e = intercept[Exception] {
      Seq(1L).toDF("v").select(
        ZOrder.normalize(col("v"), lit(0L), lit(maxRange + 1), 16)).collect()
    }
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(rootMsg(e).contains("exceeds"), rootMsg(e))
    // NULL bounds (entirely-NULL column through min/max): NULL result,
    // the pre-guard behavior — not raise_error with a NULL message
    val nul = Seq(1L).toDF("v").select(
      ZOrder.normalize(col("v"), lit(null).cast("long"),
        lit(null).cast("long"), 16)).head()
    assert(nul.isNullAt(0))
    // normalizeSql mirrors normalize's bits bound (bits=64 would emit
    // `* 0` SQL where the Spark side rejects loudly)
    intercept[IllegalArgumentException] {
      ZOrder.normalizeSql("v", "0", "10", 64)
    }
    // swapped bounds: hi < lo makes den = greatest(negative, 1) = 1
    // pass a range-only check while v − lo wraps — must raise, not wrap
    val sw = intercept[Exception] {
      Seq(1L).toDF("v").select(
        ZOrder.normalize(col("v"), lit(10L), lit(0L), 16)).collect()
    }
    assert(rootMsg(sw).contains("outside bounds"), rootMsg(sw))
    // out-of-domain v: hi − lo only bounds the v − lo numerator when
    // lo ≤ v ≤ hi, so a stale-bounds v must raise too
    val od = intercept[Exception] {
      Seq(100L).toDF("v").select(
        ZOrder.normalize(col("v"), lit(0L), lit(10L), 16)).collect()
    }
    assert(rootMsg(od).contains("outside bounds"), rootMsg(od))
    // NULL v with live bounds: NULL result, same as the pre-guard math
    val nulV = Seq(Option.empty[Long]).toDF("v").select(
      ZOrder.normalize(col("v"), lit(0L), lit(10L), 16)).head()
    assert(nulV.isNullAt(0))
  }

  test("property: interleaveN is a bijection whose inverse recovers " +
      "every coordinate (400 generated samples, batch-evaluated)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val g = for {
      k <- Gen.choose(1, 4)
      bits <- Gen.choose(1, 63 / k)
      vs <- Gen.listOfN(k, Gen.choose(0L, (1L << bits) - 1))
    } yield (bits, vs)
    val samples = (1 to 400).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))
    // one Spark job per (k, bits) shape, each evaluating its whole batch
    samples.groupBy { case (bits, vs) => (bits, vs.size) }
      .foreach { case ((bits, k), group) =>
        val df = group.map(_._2.mkString(",")).toDF("csv")
          .withColumn("vs", split(col("csv"), ","))
        val cols = (0 until k).map(j =>
          element_at(col("vs"), j + 1).cast("long"))
        val got = df.withColumn("z", ZOrder.interleaveN(cols, bits))
          .select("csv", "z").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        got.foreach { case (csv, z) =>
          val vs = csv.split(",").map(_.toLong)
          // inverse: bit i of coordinate j is z's bit i*k + j
          val back = (0 until k).map { j =>
            (0 until bits).foldLeft(0L) { (acc, i) =>
              acc | (((z >> (i * k + j)) & 1L) << i)
            }
          }
          assert(back.toSeq == vs.toSeq, s"k=$k bits=$bits vs=$csv z=$z")
        }
      }
  }

  test("z-ordered files bound the worst case: a y-only probe scans ALL " +
      "x-sorted files but only a band of z-files") {
    val dims = Tables.orders(spark, sf0001).select(
      col("o_custkey").cast("long").as("x"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
        .cast("long").as("y"))
    val r = dims.agg(min("x"), max("x"), min("y"), max("y")).head()
    val norm = dims.select(
      ZOrder.normalize(col("x"), lit(r.getLong(0)), lit(r.getLong(1)), 16)
        .as("xn"),
      ZOrder.normalize(col("y"), lit(r.getLong(2)), lit(r.getLong(3)), 16)
        .as("yn"))
    val baseDir = java.nio.file.Files.createTempDirectory("graft-zorder")
    val base = baseDir.toString
    val zdir = s"$base/z"
    val xdir = s"$base/x"
    try {
      runLayoutContrast(norm, zdir, xdir)
    } finally { // remove the two staged parquet datasets
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(baseDir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("writeZOrdered fails loudly on out-of-range values instead of " +
      "silently aliasing distant keys") {
    val bad = Seq((70000L, 1L), (5L, 2L)).toDF("xn", "yn") // 70000 >= 2^16
    val dir = java.nio.file.Files.createTempDirectory("graft-zbad")
    try {
      val e = intercept[IllegalArgumentException] {
        ZOrder.writeZOrdered(bad, s"$dir/z", "xn", "yn", 16, 2)
      }
      assert(e.getMessage.contains("normalize"), e.getMessage)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private def runLayoutContrast(norm: org.apache.spark.sql.DataFrame,
      zdir: String, xdir: String): Unit = {
    ZOrder.writeZOrdered(norm, zdir, "xn", "yn", 16, 8)
    // control layout: same data, same file count, sorted by x only
    norm.repartitionByRange(8, col("xn")).sortWithinPartitions("xn")
      .write.mode("overwrite").parquet(xdir)

    // per-file min/max — what parquet footers would give a scan planner
    def fileStats(path: String): Array[Row] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("xn").as("mnx"), max("xn").as("mxx"),
          min("yn").as("mny"), max("yn").as("mxy"))
        .collect()
    val (loY, hiY) = (26214L, 39321L) // middle 20% of the y domain
    def scannedForY(stats: Array[Row]): Int = stats.count { s =>
      s.getAs[Long]("mny") <= hiY && s.getAs[Long]("mxy") >= loY
    }
    val zStats = fileStats(zdir)
    val xStats = fileStats(xdir)
    val (zScan, xScan) = (scannedForY(zStats), scannedForY(xStats))
    // the x-sorted layout cannot prune a y predicate: every file spans y
    assert(xScan == xStats.length, s"x-layout pruned y?! $xScan/${xStats.length}")
    // the z-layout prunes at least a quarter of its files on the SAME probe
    assert(zScan * 4 <= zStats.length * 3,
      s"z-layout scanned $zScan of ${zStats.length} files for a 20% y-probe")
    // layout change must not lose rows
    assert(spark.read.parquet(zdir).count() == norm.count())
  }
}
