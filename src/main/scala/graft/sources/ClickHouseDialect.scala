package graft.sources

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** JDBC dialect for ClickHouse — the reference's actual transport
  * (reference: clickhouse_migrator/clients/ch_client.py:13-19 speaks
  * ClickHouse over HTTP; on Spark the equivalent live connection is
  * `spark.read.jdbc` with the ClickHouse JDBC driver, and THIS dialect
  * supplies the type/identifier rules Spark's generic dialect gets
  * wrong for ClickHouse).
  *
  * Everything here is public ClickHouse knowledge: the
  * `jdbc:clickhouse:`/`jdbc:ch:` URL schemes, backtick identifier
  * quoting, and the documented type system (the UInt/Int families,
  * Float32/64, String/FixedString, Date/Date32, DateTime/DateTime64,
  * Decimal, Enum, UUID, Bool) with its
  * `Nullable(...)`/`LowCardinality(...)` wrappers.
  *
  * READ side (`getCatalystType`) — the cases the generic mapping
  * mishandles:
  *   - `UInt64` overflows LongType → DecimalType(20, 0), the smallest
  *     exact container for 0 … 2⁶⁴−1.
  *   - `UInt8`/`UInt16`/`UInt32` widen one signed step (Short/Int/Long)
  *     instead of overflowing the same-width signed type.
  *   - `FixedString(N)` surfaces as JDBC BINARY; it is text in every
  *     migration schema the reference handles → StringType.
  *   - `DateTime`/`DateTime64(p[, tz])` → TimestampType (Spark keeps
  *     µs; DateTime64 precision beyond 6 truncates, documented).
  *   - `Date`/`Date32` → DateType; `Enum8/16` and `UUID` → StringType;
  *     `Bool` → BooleanType.
  *   - `Array(T)` / `Map(K, V)` parse recursively → `ArrayType` /
  *     `MapType`, with nested `Nullable(...)` driving
  *     containsNull/valueContainsNull (embeddings in ClickHouse are
  *     canonically `Array(Float32)` — the flagship read for an
  *     LLM-data pipeline).
  *   - `Tuple(T1, T2, …)` → `StructType` with positional `_1`…`_N`
  *     field names; named tuples — `Tuple(a UInt8, b Array(String))`,
  *     the modern ClickHouse spelling — keep their declared names
  *     (backtick-quoted names are unquoted). Tuples nest freely inside
  *     Array/Map and vice versa.
  *   - `Nested(a T, b U)` (the flatten_nested=0 spelling: one column of
  *     record arrays) → `ArrayType(StructType(a, b))`; the default
  *     flatten_nested=1 layout surfaces as plain `Array(T)` subcolumns
  *     the Array case already covers. `AggregateFunction` still defers
  *     to the generic mapping (its binary states are
  *     ClickHouse-internal).
  *
  * WRITE side (`getJDBCType`): Spark's defaults emit ANSI-ish DDL
  * (`TEXT`, `BIT(1)`, `TIMESTAMP`) that ClickHouse rejects — emit
  * native ClickHouse types instead, with TimestampType as
  * `DateTime64(6)` to preserve Spark's full µs precision, and
  * ArrayType/MapType/StructType as native
  * `Array(...)`/`Map(...)`/`Tuple(name T, ...)` (nullable scalar
  * elements become `Nullable(T)`; ClickHouse forbids Nullable around
  * composite types, so those stay bare; struct fields keep their
  * Catalyst names as named-tuple elements).
  *
  * Known asymmetry (documented, intentional): BinaryType writes as
  * ClickHouse `String` (its canonical byte container — CH String is
  * arbitrary bytes, not UTF-8) but reads back as Catalyst StringType,
  * as does `FixedString(N)`. A binary round trip therefore lands on
  * StringType; callers with non-UTF8 FixedString payloads should cast
  * back (`$"col".cast(BinaryType)`) on read.
  *
  * Registered automatically the first time [[Sources.clickhouseJdbc]]
  * runs (idempotent — `ensureRegistered` can also be called directly by
  * applications that build their own JDBC reads).
  *
  * ==Driver-version compatibility (the fallback matrix)==
  * The offline build carries no clickhouse-jdbc jar, and the driver
  * generations disagree on the `java.sql.Types` codes they report
  * (legacy `ru.yandex.clickhouse`, `com.clickhouse` 0.3–0.6, and the
  * v2 `com.clickhouse.jdbc` rewrite). The dialect is therefore
  * deliberately NAME-driven: `getCatalystType` ignores the reported
  * code entirely, so every driver generation resolves identically
  * (ClickHouseDialectSpec sweeps the full `java.sql.Types` constant
  * space to pin this). Where a name DEFERS (`None`), resolution falls
  * through to Spark's generic `JdbcUtils.getCatalystType` keyed on the
  * driver's code + metadata — the intended behavior in exactly two
  * cases:
  *   - top-level `Decimal(P, S)` → driver reports `DECIMAL` with exact
  *     precision/scale metadata, which is MORE precise than re-parsing
  *     the name;
  *   - `AggregateFunction(...)` / unknown future types → whatever code
  *     the driver reports (typically `OTHER` → error, or `VARBINARY` →
  *     BinaryType), surfacing the unsupported type instead of silently
  *     mis-mapping it.
  * What a LIVE-server round trip would add beyond this (and why it
  * must wait for an environment with a reachable ClickHouse): the
  * server's own DDL acceptance of the write-side type strings, and the
  * driver's VALUE marshalling (e.g. UInt64 → BigInteger) — the type
  * strings themselves are pinned against ClickHouse's public
  * documented DDL grammar in the spec's round-trip cases.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean = {
    val u = url.toLowerCase(Locale.ROOT)
    u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:")
  }

  /** ClickHouse quotes identifiers with backticks (double quotes are
    * also accepted, but backtick survives ANSI_QUOTES-style settings);
    * embedded backticks escape by doubling.
    */
  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** Strip `Nullable(...)` / `LowCardinality(...)` wrappers — the JDBC
    * driver reports them verbatim in the column type name, but the
    * inner type drives the Catalyst mapping. Returns the stripped type
    * and whether a `Nullable` wrapper was present (top-level column
    * nullability arrives via ResultSetMetaData separately, but NESTED
    * nullability — `Array(Nullable(String))` — only exists in the type
    * name).
    */
  private def stripWrappers(typeName: String): (String, Boolean) = {
    var t = typeName.trim
    var nullable = false
    var changed = true
    while (changed) {
      changed = false
      if (t.startsWith("Nullable(") && t.endsWith(")")) {
        t = t.substring("Nullable(".length, t.length - 1).trim
        nullable = true; changed = true
      }
      if (t.startsWith("LowCardinality(") && t.endsWith(")")) {
        t = t.substring("LowCardinality(".length, t.length - 1).trim
        changed = true
      }
    }
    (t, nullable)
  }

  /** Split `Map(String, Array(UInt8))`'s argument list at top-level
    * commas only — parentheses nest and single-quoted literals (enum
    * labels, timezone names) may themselves contain commas or parens.
    */
  private def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case '(' if !inQuote => depth += 1; cur += '('
      case ')' if !inQuote => depth -= 1; cur += ')'
      case ',' if !inQuote && depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.toSeq
  }

  /** Recursive ClickHouse-type-name → (Catalyst type, nullable) parse.
    *
    * `topLevel` distinguishes the one case where the JDBC metadata is
    * MORE precise than the type name needs to be: a top-level
    * `Decimal(P, S)` defers to the driver's JDBC DECIMAL
    * precision/scale (`None` → generic mapping); a Decimal NESTED
    * inside Array/Map has no per-element metadata, so its
    * precision/scale must come from the parsed name.
    */
  private def parseType(raw: String, topLevel: Boolean): Option[(DataType, Boolean)] = {
    val (t, nullable) = stripWrappers(raw)
    val base = t.takeWhile(_ != '(') // "DateTime64(3, 'UTC')" → "DateTime64"
    def args: Seq[String] =
      if (t.length > base.length && t.endsWith(")"))
        splitArgs(t.substring(base.length + 1, t.length - 1))
      else Nil
    val parsed: Option[DataType] = base match {
      case "Array" => args match {
        case Seq(inner) =>
          parseType(inner, topLevel = false)
            .map { case (et, en) => ArrayType(et, containsNull = en) }
        case _ => None
      }
      case "Map" => args match {
        case Seq(k, v) =>
          for {
            (kt, _) <- parseType(k, topLevel = false) // CH map keys are non-nullable
            (vt, vn) <- parseType(v, topLevel = false)
          } yield MapType(kt, vt, valueContainsNull = vn)
        case _ => None
      }
      case "Tuple" if args.nonEmpty => parseTuple(args)
      // Nested(a T, b U) with flatten_nested=0 is one column whose rows
      // are arrays of (a, b) records — exactly Array(Struct) in
      // Catalyst. (With the default flatten_nested=1 ClickHouse exposes
      // per-subcolumn Array(T) columns instead, which the Array case
      // above already handles; this arm covers the unflattened
      // spelling, which previously deferred to the generic mapping.)
      case "Nested" if args.nonEmpty =>
        parseTuple(args).map(st => ArrayType(st, containsNull = false))
      case "Decimal" if topLevel =>
        None // driver reports exact precision/scale via JDBC DECIMAL
      case "Decimal" => args.map(_.toIntOption) match {
        case Seq(Some(p), Some(s)) => Some(DecimalType(math.min(p, 38), s))
        case _ => None
      }
      case "Decimal32" | "Decimal64" | "Decimal128" | "Decimal256" =>
        if (topLevel) None
        else args.map(_.toIntOption) match {
          case Seq(Some(s)) =>
            val p = base match {
              case "Decimal32" => 9
              case "Decimal64" => 18
              case _ => 38 // Decimal128 exactly; Decimal256 best-effort cap
            }
            Some(DecimalType(p, s))
          case _ => None
        }
      case other => scalarType(other)
    }
    parsed.map(dt => (dt, nullable))
  }

  /** `Tuple(...)` argument list → `StructType`. ClickHouse spells tuple
    * elements either bare (`Tuple(UInt8, String)` → positional `_1`,
    * `_2` — the same convention Spark's own `struct(col, col)` and
    * Scala tuples use) or named (`Tuple(a UInt8, b Array(String))`).
    * Naming is all-or-nothing in ClickHouse DDL, and the parse mirrors
    * that: if every element carries a name the declared names win;
    * otherwise each element must itself parse as a type. A mixed or
    * unparseable list yields None → generic mapping (same failure mode
    * as before Tuple support).
    */
  private def parseTuple(args: Seq[String]): Option[DataType] = {
    val named = args.map(splitNamedElement)
    val fields: Option[Seq[StructField]] =
      if (named.forall(_.isDefined)) {
        val pairs = named.map(_.get)
        sequence(pairs.map { case (name, tpe) =>
          parseType(tpe, topLevel = false).map { case (dt, n) =>
            StructField(name, dt, nullable = n)
          }
        })
      } else {
        sequence(args.zipWithIndex.map { case (tpe, i) =>
          parseType(tpe, topLevel = false).map { case (dt, n) =>
            StructField(s"_${i + 1}", dt, nullable = n)
          }
        })
      }
    fields.map(fs => StructType(fs.toArray))
  }

  /** `a UInt8` → Some(("a", "UInt8")); `` `odd name` String `` unquotes
    * the backticks, un-escaping the `` `` `` pairs the write side emits
    * for a backtick INSIDE a name (so quoted names round-trip exactly).
    * A bare type (`Array(String)`, `Nullable(UInt8)`) has no top-level
    * whitespace before its parenthesis and returns None.
    */
  private def splitNamedElement(arg: String): Option[(String, String)] = {
    val s = arg.trim
    if (s.startsWith("`")) {
      // scan for the closing backtick, treating `` as an escaped literal
      val name = new StringBuilder
      var i = 1
      var close = -1
      while (i < s.length && close < 0) {
        if (s.charAt(i) == '`') {
          if (i + 1 < s.length && s.charAt(i + 1) == '`') { name.append('`'); i += 2 }
          else close = i
        } else { name.append(s.charAt(i)); i += 1 }
      }
      if (close < 0) None
      else {
        val rest = s.substring(close + 1).trim
        if (rest.isEmpty) None else Some((name.toString, rest))
      }
    } else {
      var i = 0
      var depth = 0
      var inQuote = false
      var split = -1
      while (i < s.length && split < 0) {
        s.charAt(i) match {
          case '\'' => inQuote = !inQuote
          case '(' if !inQuote => depth += 1
          case ')' if !inQuote => depth -= 1
          case c if c.isWhitespace && depth == 0 && !inQuote => split = i
          case _ =>
        }
        i += 1
      }
      if (split <= 0) None
      else {
        val name = s.substring(0, split)
        val rest = s.substring(split + 1).trim
        // A name is a plain identifier; "Enum8 ('a' = 1)"-style spacing
        // would otherwise masquerade as a named element.
        if (rest.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_') &&
            !name.head.isDigit && scalarType(name).isEmpty &&
            name != "Array" && name != "Map" && name != "Tuple" &&
            name != "Nullable" && name != "LowCardinality" &&
            !name.startsWith("Decimal") && !name.startsWith("Enum"))
          Some((name, rest))
        else None
      }
    }
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def scalarType(base: String): Option[DataType] = base match {
    case "String" => Some(StringType)
    case "FixedString" => Some(StringType)
    case "UUID" => Some(StringType)
    case "Enum8" | "Enum16" => Some(StringType)
    case "Bool" => Some(BooleanType)
    case "Int8" => Some(ByteType)
    case "Int16" => Some(ShortType)
    case "Int32" => Some(IntegerType)
    case "Int64" => Some(LongType)
    case "UInt8" => Some(ShortType)    // 0…255 exceeds ByteType
    case "UInt16" => Some(IntegerType) // 0…65535 exceeds ShortType
    case "UInt32" => Some(LongType)    // 0…2³²−1 exceeds IntegerType
    case "UInt64" => Some(DecimalType(20, 0)) // 0…2⁶⁴−1 exceeds LongType
    case "Int128" | "UInt128" | "Int256" | "UInt256" =>
      Some(DecimalType(38, 0)) // best-effort: Spark's max decimal
    case "Float32" => Some(FloatType)
    case "Float64" => Some(DoubleType)
    case "Date" | "Date32" => Some(DateType)
    case "DateTime" | "DateTime32" | "DateTime64" => Some(TimestampType)
    case "IPv4" => Some(StringType)
    case "IPv6" => Some(StringType)
    case _ => None // Tuple/Nested/AggregateFunction etc.: defer to generic
  }

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    parseType(typeName, topLevel = true).map(_._1)

  /** Write-side DDL for a NESTED position: wraps nullable scalar
    * elements as `Nullable(T)` (the only way element nullability exists
    * in ClickHouse DDL). Composite types are never Nullable-wrapped —
    * ClickHouse forbids `Nullable(Array(...))`/`Nullable(Map(...))`.
    */
  private def chNestedDdl(dt: DataType, nullable: Boolean): Option[String] = {
    val inner: Option[String] = dt match {
      case ArrayType(et, en) => chNestedDdl(et, en).map(i => s"Array($i)")
      case MapType(kt, vt, vn) =>
        for {
          k <- chNestedDdl(kt, nullable = false) // CH map keys are non-nullable
          v <- chNestedDdl(vt, vn)
        } yield s"Map($k, $v)"
      case st: StructType =>
        // Named-tuple DDL keeps Catalyst field names (backtick-quoted
        // when not a plain identifier), so a Spark→CH→Spark round trip
        // preserves struct field access by name.
        sequence(st.fields.toSeq.map { f =>
          chNestedDdl(f.dataType, f.nullable).map { d =>
            val plain = f.name.nonEmpty && !f.name.head.isDigit &&
              f.name.forall(c => c.isLetterOrDigit || c == '_')
            val n = if (plain) f.name else s"`${f.name.replace("`", "``")}`"
            s"$n $d"
          }
        }).map(cols => s"Tuple(${cols.mkString(", ")})")
      case other => getJDBCType(other).map(_.databaseTypeDefinition)
    }
    dt match {
      case _: ArrayType | _: MapType | _: StructType => inner
      case _ if nullable => inner.map(i => s"Nullable($i)")
      case _ => inner
    }
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("String", Types.VARCHAR))
    case BinaryType => Some(JdbcType("String", Types.BINARY))
    case BooleanType => Some(JdbcType("Bool", Types.BOOLEAN))
    case ByteType => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", Types.INTEGER))
    case LongType => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", Types.DOUBLE))
    case d: DecimalType =>
      Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", Types.DECIMAL))
    case DateType => Some(JdbcType("Date32", Types.DATE))
    // DateTime64(6): Spark timestamps are µs; plain DateTime is
    // second-precision and would silently truncate.
    case TimestampType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case TimestampNTZType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    // Array/Map/Struct mappings cover the CREATE TABLE DDL path (and
    // are what the read side's parseType round-trips). The actual row
    // WRITE path additionally needs a JDBC driver with the matching
    // setter — Spark's JDBC writer has an array setter (Types.ARRAY
    // works end-to-end on drivers exposing createArrayOf) but no
    // map/struct setter, so Map/Tuple columns are DDL-only through
    // this dialect: schemas round-trip, inserts of those columns
    // require the ClickHouse driver's own writer or a flattened layout.
    case a: ArrayType =>
      chNestedDdl(a, nullable = false).map(JdbcType(_, Types.ARRAY))
    case m: MapType =>
      chNestedDdl(m, nullable = false).map(JdbcType(_, Types.OTHER))
    case st: StructType =>
      chNestedDdl(st, nullable = false).map(JdbcType(_, Types.STRUCT))
    case _ => None
  }

  /** ClickHouse's native truncate (the generic `DELETE FROM` is not
    * supported on MergeTree tables).
    */
  override def getTruncateQuery(table: String,
      cascade: Option[Boolean] = isCascadingTruncateTable): String =
    s"TRUNCATE TABLE $table"

  override def isCascadingTruncateTable: Option[Boolean] = Some(false)

  @volatile private var registered = false

  /** Idempotent global registration with Spark's dialect registry. */
  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
