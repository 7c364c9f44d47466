package graft.engine.sink

import java.sql.Types
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Spark's built-in Derby dialect maps StringType → CLOB, which Derby
  * refuses to `setNull` into a VARCHAR column (the shape our
  * reference-parity all-string CREATE TABLE produces). This dialect
  * keeps strings as VARCHAR end-to-end; everything else follows the
  * JDBC defaults. Registered once via [[GraftDerbyDialect.register]]
  * (public `JdbcDialects.registerDialect` API — registration order wins
  * over the built-in). */
class GraftDerbyDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType  => Some(JdbcType("VARCHAR(4000)", Types.VARCHAR))
    case BooleanType => Some(JdbcType("BOOLEAN", Types.BOOLEAN))
    case ByteType    => Some(JdbcType("SMALLINT", Types.SMALLINT))
    case ShortType   => Some(JdbcType("SMALLINT", Types.SMALLINT))
    case FloatType   => Some(JdbcType("REAL", Types.REAL))
    case DoubleType  => Some(JdbcType("DOUBLE", Types.DOUBLE))
    case _           => None
  }

  override def quoteIdentifier(colName: String): String = s""""$colName""""
}

object GraftDerbyDialect {
  private val registered = new AtomicBoolean(false)
  def register(): Unit =
    if (registered.compareAndSet(false, true))
      JdbcDialects.registerDialect(new GraftDerbyDialect)
}
