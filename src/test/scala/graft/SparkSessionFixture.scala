package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark sessions are
  * expensive; suites share the singleton via getOrCreate). */
object SparkSessionFixture {
  lazy val spark: SparkSession = {
    val s = Sessions.tune(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
