package graft.engine

import graft.engine.schema.Schemas
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class SchemasSpec extends AnyFunSuite {

  /** Plain-ScalaCheck property driver (the scalatestplus bridge is not
    * in the offline cache): 200 deterministic samples per property. */
  private def forAllSamples[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to 200).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def st(cols: (String, DataType)*): StructType =
    StructType(cols.map { case (n, t) => StructField(n, t) })

  test("headerSchema: all-string NOT NULL (ref schema.go:144-155)") {
    val s = Schemas.headerSchema(Seq("a", "b"))
    assert(s.fields.forall(f => f.dataType == StringType && !f.nullable))
    assert(s.fieldNames.toSeq == Seq("a", "b"))
  }

  test("syntheticSchema: col0..colN (ref schema.go:157-169)") {
    assert(Schemas.syntheticSchema(3).fieldNames.toSeq == Seq("col0", "col1", "col2"))
  }

  test("byName: CSV column order irrelevant, target order wins") {
    val csv = Schemas.headerSchema(Seq("b", "a", "x"))
    val target = st("a" -> LongType, "b" -> StringType, "c" -> IntegerType)
    val al = Schemas.alignByName(csv, target)
    assert(al.cols.map(_.csvCol) == Seq("a", "b"))
    assert(al.droppedCsv == Seq("x"))        // CSV col with no DB match: dropped
    assert(al.unloadedTarget == Seq("c"))    // DB col not in CSV: left unloaded
  }

  test("byOrdinal: wider CSV truncated (ref manual_test_cases.md:183-205)") {
    val csv = Schemas.headerSchema(Seq("c0", "c1", "c2"))
    val target = st("x" -> LongType, "y" -> StringType)
    val al = Schemas.alignByOrdinal(csv, target)
    assert(al.cols.map(a => (a.csvCol, a.target.name)) == Seq("c0" -> "x", "c1" -> "y"))
    assert(al.droppedCsv == Seq("c2"))
  }

  test("byOrdinal: wider DB leaves trailing cols unloaded (ref :157-181)") {
    val csv = Schemas.headerSchema(Seq("c0"))
    val target = st("x" -> LongType, "y" -> StringType)
    val al = Schemas.alignByOrdinal(csv, target)
    assert(al.cols.map(_.csvCol) == Seq("c0"))
    assert(al.unloadedTarget == Seq("y"))
  }

  val nameGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(8))
  val pairGen: Gen[(List[String], List[String])] = for {
    a <- Gen.listOfN(6, nameGen).map(_.distinct)
    b <- Gen.listOfN(6, nameGen).map(_.distinct)
    if a.nonEmpty && b.nonEmpty
  } yield (a, b)

  test("property: byName never invents columns and preserves target order") {
    forAllSamples(pairGen) { case (csvCols, dbCols) =>
      val al = Schemas.alignByName(
        Schemas.headerSchema(csvCols), Schemas.headerSchema(dbCols))
      assert(al.cols.map(_.csvCol).forall(csvCols.contains))
      assert(al.cols.map(_.target.name) == dbCols.filter(csvCols.contains))
      assert((al.cols.map(_.csvCol) ++ al.droppedCsv).toSet == csvCols.toSet)
    }
  }

  test("property: byOrdinal pairs exactly min(n,m) columns in order") {
    forAllSamples(pairGen) { case (csvCols, dbCols) =>
      val al = Schemas.alignByOrdinal(
        Schemas.headerSchema(csvCols), Schemas.headerSchema(dbCols))
      assert(al.cols.length == math.min(csvCols.length, dbCols.length))
      assert(al.cols.map(_.csvCol) == csvCols.take(al.cols.length))
      assert(al.cols.map(_.target.name) == dbCols.take(al.cols.length))
    }
  }
}
