package graft.engine.sink

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Table lifecycle modes (ref `config.go:18-30`, SURVEY.md §2.10). */
sealed trait TableMode
object TableMode {
  case object Create extends TableMode        // create if missing, else append
  case object DropAndCreate extends TableMode // drop, recreate, load
  case object Truncate extends TableMode      // TRUNCATE then append
  case object DeleteAll extends TableMode     // DELETE FROM then append
  case object AsIs extends TableMode          // must exist; pure append

  def parse(s: String): TableMode = s match {
    case "create"          => Create
    case "drop-and-create" => DropAndCreate
    case "truncate"        => Truncate
    case "delete-all"      => DeleteAll
    case "" | "as-is"      => AsIs
    case other => throw new IllegalArgumentException(s"unknown table mode: $other")
  }
}

/** Sink primitives over a target table; the mode dispatch lives in
  * [[graft.engine.Loader]] (mirroring ref `csv2db.go:219-241`). */
trait TableSink {
  def exists(): Boolean
  /** Introspected schema of the existing table (ref S6/S7 catalog scan). */
  def schema(): StructType
  /** CREATE TABLE with every column as string — the reference's
    * missing-table behavior (`common/db.go:52-91`: all columns get the
    * dialect's string primary type). */
  def createAllString(cols: Seq[String]): Unit
  def drop(): Unit
  def truncate(): Unit
  def deleteAll(): Unit
  def append(df: DataFrame): Unit
}

/** Session-catalog (managed table) backend. `delete-all` degrades to
  * truncate: DELETE FROM needs a v2/ACID table, and for a managed
  * parquet table the two have identical observable results. */
final class ManagedTableSink(spark: SparkSession, table: String) extends TableSink {
  // Spark forces file-based table schemas nullable, which would flip the
  // reference's create-path semantics from "empty cell loads as empty
  // string" to ""→NULL (the rule is keyed on target nullability). When
  // THIS sink created the table, we know the intended shape and report
  // it; a pre-existing managed table is genuinely all-nullable.
  private var createdCols: Option[Seq[String]] = None

  override def exists(): Boolean = spark.catalog.tableExists(table)

  override def schema(): StructType = createdCols match {
    case Some(cols) => graft.engine.schema.Schemas.headerSchema(cols)
    case None       => spark.table(table).schema
  }

  override def createAllString(cols: Seq[String]): Unit = {
    val st = StructType(graft.engine.schema.Schemas.headerSchema(cols))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      .write.saveAsTable(table)
    createdCols = Some(cols)
  }

  override def drop(): Unit = spark.sql(s"DROP TABLE IF EXISTS $table")
  override def truncate(): Unit = spark.sql(s"TRUNCATE TABLE $table")
  override def deleteAll(): Unit = truncate()
  override def append(df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).saveAsTable(table)
}

/** JDBC backend (proven on embedded Derby — no PG/MySQL drivers offline;
  * Spark's JdbcDialect supplies identifier quoting and type DDL, ref W8).
  *
  * Batch sizing follows the reference's heuristic
  * `batchsize = max(1, 1000/ncols)` (caps bind params ≈1000 per
  * statement — `_postgres/postgres.go:152`, `_mysql/mysql.go:144-148`).
  * `numPartitions = 1` restores the reference's single-transaction
  * atomicity (Spark JDBC commits per partition — SURVEY.md §7.5).
  */
final class JdbcTableSink(
    spark: SparkSession,
    url: String,
    table: String,
    numPartitions: Option[Int] = None,
    user: Option[String] = None,
    password: Option[String] = None) extends TableSink {

  if (url.startsWith("jdbc:derby")) GraftDerbyDialect.register()

  // Schema-qualified names (ref `load_config.go:22-27`): a dotted table
  // splits into (schema = first part, table = last part) — metadata
  // lookups must filter by BOTH, or `exists()`/`schema()` on
  // "sales.orders" silently never match (as-is mode fails, create mode
  // re-creates). SQL text keeps the full dotted name; the dialect quotes.
  private val nameParts = table.split('.')
  private val tablePlain: String = nameParts.last
  private val schemaPlain: Option[String] =
    if (nameParts.length > 1) Some(nameParts.head) else None

  private def props: Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  private def withConn[A](f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Fold an unquoted identifier the way THIS database stores it (Derby
    * and PG disagree: upper- vs lowercase folding). */
  private def fold(conn: java.sql.Connection, name: String): String = {
    val md = conn.getMetaData
    if (md.storesUpperCaseIdentifiers) name.toUpperCase
    else if (md.storesLowerCaseIdentifiers) name.toLowerCase
    else name
  }

  /** `getTables`/`getColumns` treat their schema/table arguments as SQL
    * LIKE patterns, so a name containing `_` (any `my_table`) matches
    * any character in that position — exists() could return a false
    * positive for a DIFFERENT table (`my_t` matches `myXt`) and as-is
    * mode would proceed against it. Escape the wildcards with the
    * driver's declared escape string — and because some drivers honor
    * NO escape at all (Derby's getSearchStringEscape is "", and a
    * backslash is matched literally), every metadata row is ALSO
    * post-filtered by exact folded-name equality ([[sameIdentifier]]). */
  private def escapeLike(conn: java.sql.Connection, name: String): String = {
    val esc = Option(conn.getMetaData.getSearchStringEscape).getOrElse("")
    if (esc.isEmpty) name
    else name.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
  }

  private def foldPattern(conn: java.sql.Connection, name: String): String =
    escapeLike(conn, fold(conn, name))

  /** Exact-match check for a metadata result row: the driver-reported
    * identifier vs our folded literal name. */
  private def sameIdentifier(conn: java.sql.Connection,
      reported: String, plain: String): Boolean =
    reported == fold(conn, plain)

  /** Does this metadata row belong to OUR (schema, table) — not a
    * LIKE-wildcard near-miss? Unqualified names accept any schema
    * (the connection default decides visibility, as before). */
  private def rowMatches(conn: java.sql.Connection,
      rs: java.sql.ResultSet): Boolean =
    sameIdentifier(conn, rs.getString("TABLE_NAME"), tablePlain) &&
      schemaPlain.forall(s =>
        sameIdentifier(conn, Option(rs.getString("TABLE_SCHEM")).getOrElse(""), s))

  override def exists(): Boolean = withConn { conn =>
    val rs = conn.getMetaData.getTables(null,
      schemaPlain.map(foldPattern(conn, _)).orNull,
      foldPattern(conn, tablePlain), null)
    try {
      var found = false
      while (!found && rs.next()) found = rowMatches(conn, rs)
      found
    } finally rs.close()
  }

  /** Catalog introspection via JDBC metadata (ref S6/S7,
    * `_postgres/postgres.go:67-112`). Not `spark.read.jdbc(...).schema`:
    * Spark marks every JDBC relation field nullable, losing exactly the
    * bit that drives the reference's `""→NULL` vs fail-on-empty split. */
  override def schema(): StructType = withConn { conn =>
    val rs = conn.getMetaData.getColumns(null,
      schemaPlain.map(foldPattern(conn, _)).orNull,
      foldPattern(conn, tablePlain), null)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, StructField)]
    try {
      while (rs.next()) if (rowMatches(conn, rs)) {
        val name = rs.getString("COLUMN_NAME")
        val jdbcType = rs.getInt("DATA_TYPE")
        val nullable = rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls
        val pos = rs.getInt("ORDINAL_POSITION")
        // many→one like the reference's DbToGoTypeMapping: temporal /
        // decimal / unknown types deliberately pass through as string
        // (SURVEY.md §1.2)
        val dt = jdbcType match {
          case java.sql.Types.BIGINT => org.apache.spark.sql.types.LongType
          case java.sql.Types.INTEGER => org.apache.spark.sql.types.IntegerType
          case java.sql.Types.SMALLINT => org.apache.spark.sql.types.ShortType
          case java.sql.Types.TINYINT => org.apache.spark.sql.types.ByteType
          case java.sql.Types.DOUBLE | java.sql.Types.FLOAT =>
            org.apache.spark.sql.types.DoubleType
          case java.sql.Types.REAL => org.apache.spark.sql.types.FloatType
          case java.sql.Types.BOOLEAN | java.sql.Types.BIT =>
            org.apache.spark.sql.types.BooleanType
          case _ => StringType
        }
        buf += ((pos, StructField(name, dt, nullable)))
      }
    } finally rs.close()
    require(buf.nonEmpty, s"table $table not found or has no columns")
    StructType(buf.sortBy(_._1).map(_._2).toSeq)
  }

  override def createAllString(cols: Seq[String]): Unit = withConn { conn =>
    val colDdl = cols.map(c => s""""$c" VARCHAR(4000) NOT NULL""").mkString(", ")
    conn.createStatement().executeUpdate(s"""CREATE TABLE $table ($colDdl)""")
  }

  override def drop(): Unit = withConn { conn =>
    if (exists()) conn.createStatement().executeUpdate(s"DROP TABLE $table")
  }

  override def truncate(): Unit = withConn { conn =>
    conn.createStatement().executeUpdate(s"TRUNCATE TABLE $table")
  }

  /** MVCC-friendly truncate (ref `common/db.go:103-106`): row-by-row
    * DELETE in one statement, preserving the table. */
  override def deleteAll(): Unit = withConn { conn =>
    conn.createStatement().executeUpdate(s"DELETE FROM $table")
  }

  override def append(df: DataFrame): Unit = {
    val batchSize = math.max(1, 1000 / math.max(1, df.schema.length))
    val writer = df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
    val partitioned = numPartitions match {
      case Some(n) => writer.option("numPartitions", n.toString)
      case None    => writer
    }
    partitioned.jdbc(url, table, props)
  }
}
