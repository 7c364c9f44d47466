package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Companion shim to [[ColumnBridge]]: `SparkSession.sessionState` is
  * `private[sql]` in Spark 4, so imperative temp-function registration
  * needs one re-export under the sql package. */
object FunctionRegistryBridge {
  def registerTemp(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
