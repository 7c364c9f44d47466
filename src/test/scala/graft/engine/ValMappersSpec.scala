package graft.engine

import graft.SparkSessionFixture
import graft.engine.cast.ValMappers
import graft.functions.GoBoolParse
import org.apache.spark.SparkException
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests for the §2.3 cast table and §1.4 null semantics. */
class ValMappersSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private def mapOne(v: String, target: StructField): Any = {
    val df = Seq(Option(v)).toDF("c")
    df.select(ValMappers.mapper("c", target)).collect()(0).get(0)
  }

  // --- Go bool domain (ref common/val_mapper.go:68-70) ------------------
  val trues = Seq("1", "t", "T", "TRUE", "true", "True")
  val falses = Seq("0", "f", "F", "FALSE", "false", "False")
  val invalid = Seq("yes", "no", "y", "n", "tRuE", " true", "true ", "2", "")

  trues.foreach { v =>
    test(s"go_bool('$v') = true") {
      assert(mapOne(v, StructField("b", BooleanType, nullable = false)) == true)
    }
  }
  falses.foreach { v =>
    test(s"go_bool('$v') = false") {
      assert(mapOne(v, StructField("b", BooleanType, nullable = false)) == false)
    }
  }
  invalid.foreach { v =>
    test(s"go_bool('$v') aborts (Go parity: Spark cast would accept some of these)") {
      intercept[Exception] {
        mapOne(v, StructField("b", BooleanType, nullable = false))
      }
    }
  }
  test("go_bool('') on NULLABLE bool is null, not error") {
    assert(mapOne("", StructField("b", BooleanType, nullable = true)) == null)
  }

  // --- empty-string→NULL matrix (ref manual_test_cases.md:68-82) --------
  test("empty string → NULL for nullable numeric") {
    assert(mapOne("", StructField("n", LongType, nullable = true)) == null)
  }
  test("empty string fails for non-nullable numeric (ref 'Fail on not null')") {
    intercept[Exception] {
      mapOne("", StructField("n", LongType, nullable = false))
    }
  }
  test("empty string loads as empty string for non-nullable string") {
    assert(mapOne("", StructField("s", StringType, nullable = false)) == "")
  }
  test("empty string → NULL for nullable string") {
    assert(mapOne("", StructField("s", StringType, nullable = true)) == null)
  }

  // --- strict numeric parses (ref strconv.Parse* → abort) ---------------
  test("int64 parse") {
    assert(mapOne("9223372036854775807", StructField("n", LongType, true)) ==
      Long.MaxValue)
  }
  test("int32 range-checked: overflow aborts") {
    intercept[Exception] {
      mapOne("2147483648", StructField("n", IntegerType, false))
    }
  }
  test("int8 range-checked") {
    assert(mapOne("-128", StructField("n", ByteType, true)) == (-128).toByte)
    intercept[Exception] { mapOne("128", StructField("n", ByteType, false)) }
  }
  test("int16 supported (fixes reference MySQL Int16 gap)") {
    assert(mapOne("32767", StructField("n", ShortType, true)) == Short.MaxValue)
  }
  test("float64/float32 parse") {
    assert(mapOne("1.5e10", StructField("n", DoubleType, true)) == 1.5e10)
    assert(mapOne("2.5", StructField("n", FloatType, true)) == 2.5f)
  }
  test("malformed numeric aborts, never silently nulls") {
    intercept[Exception] { mapOne("12x", StructField("n", LongType, false)) }
    intercept[Exception] { mapOne("abc", StructField("n", DoubleType, false)) }
  }

  // --- codegen parity: expression works inside wholestage codegen -------
  test("GoBoolParse survives a full column pipeline (codegen path)") {
    val df = Seq("true", "0", "T", "False").toDF("c")
    val out = df.select(GoBoolParse.go_bool(col("c")).as("b"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, false, true, false))
  }
}
