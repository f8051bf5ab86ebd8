package graft.sources

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, Statement}
import java.util.Locale

/** Test stub: a real `java.sql.Driver` answering `jdbc:clickhouse:`
  * URLs with embedded-Derby storage, so Spark's JDBC relation resolves
  * [[ClickHouseDialect]] through the REAL dispatch path (URL match in
  * the dialect registry) instead of only direct dialect unit calls —
  * the sandbox has no ClickHouse server and no clickhouse-jdbc jar.
  *
  * What it fakes, and how:
  *  - DDL: Spark's CREATE TABLE arrives with the dialect's ClickHouse
  *    types (`Int64`, `Nullable(String)`, `Array(Float32)`, …) and
  *    backtick quoting; the stub records each column's CH type in
  *    [[StubClickHouseRegistry]], rewrites the types to Derby storage
  *    (arrays/tuples/maps as VARCHAR), and swaps backticks for double
  *    quotes.
  *  - Metadata: ResultSetMetaData.getColumnTypeName reports the
  *    REGISTERED ClickHouse type name (exactly what a real ClickHouse
  *    driver reports), so the dialect's name-driven getCatalystType
  *    runs against the genuine article.
  *  - Arrays: Connection.createArrayOf returns an in-memory
  *    java.sql.Array; setArray serializes it into the VARCHAR cell
  *    (unit-separator-joined); ResultSet.getArray parses it back into
  *    boxed elements per the registered CH element type.
  * Everything else passes through to Derby untouched.
  */
object StubClickHouseRegistry {
  /** (TABLE, COLUMN) upper-cased → ClickHouse type name as authored. */
  val chTypes =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Raw CH-typed CREATE TABLE statements seen, for write-path asserts. */
  val ddlLog = new java.util.concurrent.CopyOnWriteArrayList[String]()

  private[sources] val Sep = '\u001f' // unit separator: array cell join

  private[sources] def chTypeOf(table: String, col: String): Option[String] =
    Option(chTypes.get((table.toUpperCase(Locale.ROOT),
      col.toUpperCase(Locale.ROOT))))

  private def stripNullable(t: String): String = {
    val s = t.trim
    if (s.startsWith("Nullable(") && s.endsWith(")"))
      s.substring("Nullable(".length, s.length - 1).trim
    else s
  }

  /** Derby storage type for a ClickHouse DDL type. */
  private[sources] def derbyType(ch: String): String =
    stripNullable(ch) match {
      case t if t.startsWith("Decimal(") =>
        "DECIMAL" + t.stripPrefix("Decimal")
      case "UInt64" => "DECIMAL(20,0)"
      case "Int64" | "UInt32" => "BIGINT"
      case "Int32" | "UInt16" => "INTEGER"
      case "Int16" | "UInt8" | "Int8" => "SMALLINT"
      case "Float64" => "DOUBLE"
      case "Float32" => "REAL"
      case "Bool" => "BOOLEAN"
      case "Date" | "Date32" => "DATE"
      case t if t.startsWith("DateTime") => "TIMESTAMP"
      case _ => "VARCHAR(32000)" // String/Array/Tuple/Map/Enum/UUID/…
    }

  /** Parse serialized array cells back into boxed elements of the CH
    * element type (`Array(X)`).
    */
  private[sources] def parseElems(s: String, chType: String): Array[AnyRef] = {
    val inner = stripNullable(chType)
    require(inner.startsWith("Array(") && inner.endsWith(")"),
      s"not an array type: $chType")
    val et = stripNullable(inner.substring("Array(".length, inner.length - 1))
    if (s.isEmpty) Array.empty
    else s.split(Sep).map[AnyRef] { v =>
      et match {
        case "Float32" => java.lang.Float.valueOf(v)
        case "Float64" => java.lang.Double.valueOf(v)
        case "Int64" | "UInt32" => java.lang.Long.valueOf(v)
        case "Int32" | "UInt16" => Integer.valueOf(v)
        case _ => v
      }
    }
  }

  /** Split a CREATE TABLE column list at top-level commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val CreateTable =
    "(?is)^\\s*CREATE\\s+TABLE\\s+(\\S+)\\s*\\((.*)\\)\\s*$".r

  /** Translate one SQL statement from ClickHouse-flavored (backtick
    * quoting, CH DDL types) to Derby, recording CH column types.
    */
  private[sources] def translate(sql: String): String = sql match {
    case CreateTable(rawTable, cols) =>
      ddlLog.add(sql)
      val table = rawTable.replace("`", "").replace("\"", "")
      val derbyCols = splitTop(cols).map { c =>
        val (name, rest) =
          if (c.startsWith("`")) {
            val end = c.indexOf('`', 1)
            (c.substring(1, end), c.substring(end + 1).trim)
          } else {
            val sp = c.indexOf(' ')
            (c.substring(0, sp), c.substring(sp + 1).trim)
          }
        val notNull = rest.toUpperCase(Locale.ROOT).endsWith("NOT NULL")
        val chType =
          if (notNull) rest.substring(0, rest.length - "NOT NULL".length).trim
          else rest
        chTypes.put((table.toUpperCase(Locale.ROOT),
          name.toUpperCase(Locale.ROOT)), chType)
        "\"" + name + "\" " + derbyType(chType) +
          (if (notNull) " NOT NULL" else "")
      }
      s"CREATE TABLE $table (${derbyCols.mkString(", ")})"
    case _ => sql.replace('`', '"')
  }

  private val FromTable = "(?is)\\bFROM\\s+[`\"]?([A-Za-z0-9_.]+)".r

  private[sources] def tableOf(sql: String): String =
    FromTable.findFirstMatchIn(sql).map(_.group(1))
      .orElse("(?is)\\bINTO\\s+[`\"]?([A-Za-z0-9_.]+)".r
        .findFirstMatchIn(sql).map(_.group(1)))
      .getOrElse("")

  // ---- dynamic proxies --------------------------------------------

  private def mkProxy[T](iface: Class[T], target: AnyRef)(
      pf: PartialFunction[(String, Array[AnyRef], Method), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method,
            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          try {
            if (pf.isDefinedAt((m.getName, a, m))) pf((m.getName, a, m))
            else m.invoke(target, args: _*)
          } catch {
            case e: InvocationTargetException => throw e.getCause
          }
        }
      }).asInstanceOf[T]

  private[sources] class StubArray(elems: Array[AnyRef], baseType: String)
      extends java.sql.Array {
    override def getArray: AnyRef = elems
    override def getArray(map: java.util.Map[String, Class[_]]): AnyRef = elems
    override def getArray(index: Long, count: Int): AnyRef =
      elems.slice(index.toInt - 1, index.toInt - 1 + count)
    override def getArray(index: Long, count: Int,
        map: java.util.Map[String, Class[_]]): AnyRef = getArray(index, count)
    override def getBaseTypeName: String = baseType
    override def getBaseType: Int = java.sql.Types.OTHER
    override def getResultSet: ResultSet = throw new UnsupportedOperationException
    override def getResultSet(map: java.util.Map[String, Class[_]]): ResultSet =
      throw new UnsupportedOperationException
    override def getResultSet(index: Long, count: Int): ResultSet =
      throw new UnsupportedOperationException
    override def getResultSet(index: Long, count: Int,
        map: java.util.Map[String, Class[_]]): ResultSet =
      throw new UnsupportedOperationException
    override def free(): Unit = ()
    private[sources] def serialized: String =
      elems.map(String.valueOf).mkString(Sep.toString)
  }

  private def wrapRsmd(rsmd: ResultSetMetaData,
      table: String): ResultSetMetaData =
    mkProxy(classOf[ResultSetMetaData], rsmd) {
      case ("getColumnTypeName", Array(idx: Integer), _) =>
        chTypeOf(table, rsmd.getColumnName(idx))
          .getOrElse(rsmd.getColumnTypeName(idx))
    }

  private def wrapRs(rs: ResultSet, table: String): ResultSet =
    mkProxy(classOf[ResultSet], rs) {
      case ("getMetaData", _, _) => wrapRsmd(rs.getMetaData, table)
      case ("getArray", Array(idx: Integer), _) =>
        val col = rs.getMetaData.getColumnName(idx)
        val ch = chTypeOf(table, col).getOrElse(
          throw new java.sql.SQLException(
            s"stub: no CH type registered for $table.$col"))
        Option(rs.getString(idx))
          .map(s => new StubArray(parseElems(s, ch), "OTHER")).orNull
    }

  private def wrapPs(ps: PreparedStatement,
      table: String): PreparedStatement =
    mkProxy(classOf[PreparedStatement], ps) {
      case ("executeQuery", Array(), _) => wrapRs(ps.executeQuery(), table)
      case ("getMetaData", _, _) =>
        Option(ps.getMetaData).map(wrapRsmd(_, table)).orNull
      case ("setArray", Array(idx: Integer, arr), _) =>
        arr match {
          case sa: StubArray => ps.setString(idx, sa.serialized); null
          case a: java.sql.Array =>
            ps.setString(idx,
              a.getArray.asInstanceOf[Array[AnyRef]]
                .map(String.valueOf).mkString(Sep.toString))
            null
        }
    }

  private def wrapStatement(st: Statement): Statement =
    mkProxy(classOf[Statement], st) {
      case ("executeQuery", Array(sql: String), _) =>
        wrapRs(st.executeQuery(translate(sql)), tableOf(sql))
      case ("executeUpdate", Array(sql: String), _) =>
        Integer.valueOf(st.executeUpdate(translate(sql)))
      case ("execute", Array(sql: String), _) =>
        java.lang.Boolean.valueOf(st.execute(translate(sql)))
    }

  private[sources] def wrapConnection(conn: Connection): Connection =
    mkProxy(classOf[Connection], conn) {
      // every createStatement/prepareStatement overload (Spark's JDBC
      // relation uses the (sql, resultSetType, concurrency) variant on
      // the read path) — translate the SQL, wrap the result
      case ("createStatement", a, m) =>
        wrapStatement(m.invoke(conn, a: _*).asInstanceOf[Statement])
      case ("prepareStatement", a, m)
        if a.nonEmpty && a(0).isInstanceOf[String] =>
        val sql = a(0).asInstanceOf[String]
        val na = a.clone(); na(0) = translate(sql)
        wrapPs(m.invoke(conn, na: _*).asInstanceOf[PreparedStatement],
          tableOf(sql))
      case ("createArrayOf", Array(typeName: String, elems), _) =>
        new StubArray(elems.asInstanceOf[Array[AnyRef]], typeName)
    }
}

/** The registered driver: answers `jdbc:clickhouse:` with Derby-backed
  * stub connections. Registration happens on first touch of the
  * companion ([[StubClickHouseJdbcDriver.ensureRegistered]]) — call it
  * before handing the URL to Spark.
  */
class StubClickHouseJdbcDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.toLowerCase(Locale.ROOT).startsWith("jdbc:clickhouse:")

  override def connect(url: String,
      info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
      StubClickHouseRegistry.wrapConnection(
        DriverManager.getConnection("jdbc:derby:memory:chstub;create=true"))
    }

  override def getPropertyInfo(url: String,
      info: java.util.Properties): Array[DriverPropertyInfo] = Array.empty
  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

object StubClickHouseJdbcDriver {
  lazy val ensureRegistered: Unit =
    DriverManager.registerDriver(new StubClickHouseJdbcDriver)
}
