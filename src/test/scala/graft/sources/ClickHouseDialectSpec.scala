package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ClickHouseDialectSpec extends AnyFunSuite {

  private val d = ClickHouseDialect
  private val md = new MetadataBuilder()

  private def catalyst(typeName: String, sqlType: Int = Types.OTHER) =
    d.getCatalystType(sqlType, typeName, 0, md)

  test("canHandle: clickhouse/ch schemes only") {
    assert(d.canHandle("jdbc:clickhouse://host:8123/db"))
    assert(d.canHandle("jdbc:ch://host:8443/db?ssl=true"))
    assert(d.canHandle("JDBC:CLICKHOUSE://host:8123/db")) // case-insensitive
    assert(!d.canHandle("jdbc:derby:memory:db"))
    assert(!d.canHandle("jdbc:postgresql://host/db"))
  }

  test("registration: dialect registry resolves clickhouse URLs to this dialect") {
    ClickHouseDialect.ensureRegistered()
    ClickHouseDialect.ensureRegistered() // idempotent
    assert(JdbcDialects.get("jdbc:clickhouse://host:8123/db") eq d)
    // other URLs are untouched by the registration
    assert(JdbcDialects.get("jdbc:derby:memory:db") ne d)
  }

  test("quoteIdentifier: backticks, embedded backtick doubled") {
    assert(d.quoteIdentifier("order") == "`order`")
    assert(d.quoteIdentifier("we`ird") == "`we``ird`")
  }

  test("read mapping: unsigned widths widen, UInt64 is exact decimal") {
    assert(catalyst("UInt8").contains(ShortType))
    assert(catalyst("UInt16").contains(IntegerType))
    assert(catalyst("UInt32").contains(LongType))
    assert(catalyst("UInt64").contains(DecimalType(20, 0)))
    assert(catalyst("Int8").contains(ByteType))
    assert(catalyst("Int64").contains(LongType))
  }

  test("read mapping: temporal, string-ish, bool, wrappers") {
    assert(catalyst("DateTime").contains(TimestampType))
    assert(catalyst("DateTime64(3)").contains(TimestampType))
    assert(catalyst("DateTime64(9, 'UTC')").contains(TimestampType))
    assert(catalyst("Date").contains(DateType))
    assert(catalyst("Date32").contains(DateType))
    assert(catalyst("FixedString(16)", Types.BINARY).contains(StringType))
    assert(catalyst("Enum8('a' = 1)").contains(StringType))
    assert(catalyst("UUID").contains(StringType))
    assert(catalyst("Bool").contains(BooleanType))
    // Nullable/LowCardinality wrappers unwrap (nested too)
    assert(catalyst("Nullable(UInt64)").contains(DecimalType(20, 0)))
    assert(catalyst("LowCardinality(Nullable(String))").contains(StringType))
    assert(catalyst("Nullable(DateTime64(6))").contains(TimestampType))
    // genuinely unknown/complex types still defer to the generic mapping
    assert(catalyst("AggregateFunction(sum, UInt64)").isEmpty)
    // Nested now maps structurally (record-array) instead of deferring
    assert(catalyst("Nested(a UInt8, b String)")
      .contains(ArrayType(StructType(Seq(
        StructField("a", ShortType, nullable = false),
        StructField("b", StringType, nullable = false))),
        containsNull = false)))
  }

  test("read mapping: Array(T) parses recursively with nested nullability") {
    // the flagship LLM-pipeline column type: embeddings
    assert(catalyst("Array(Float32)")
      .contains(ArrayType(FloatType, containsNull = false)))
    assert(catalyst("Array(Nullable(String))")
      .contains(ArrayType(StringType, containsNull = true)))
    assert(catalyst("Array(Array(UInt32))")
      .contains(ArrayType(ArrayType(LongType, containsNull = false),
        containsNull = false)))
    // wrappers at any depth
    assert(catalyst("Nullable(Array(LowCardinality(Nullable(String))))")
      .contains(ArrayType(StringType, containsNull = true)))
    // unsigned widening applies inside arrays too
    assert(catalyst("Array(UInt64)")
      .contains(ArrayType(DecimalType(20, 0), containsNull = false)))
    // nested Decimal has no JDBC metadata → parse precision/scale from the name
    assert(catalyst("Array(Decimal(18, 4))")
      .contains(ArrayType(DecimalType(18, 4), containsNull = false)))
    assert(catalyst("Array(Decimal64(4))")
      .contains(ArrayType(DecimalType(18, 4), containsNull = false)))
    // malformed / unknown element types defer rather than mis-map
    assert(catalyst("Array()").isEmpty)
    // Nested nests inside Array like any structural type
    assert(catalyst("Array(Nested(a UInt8))")
      .contains(ArrayType(ArrayType(StructType(Seq(
        StructField("a", ShortType, nullable = false))),
        containsNull = false), containsNull = false)))
  }

  test("read mapping: Map(K, V) parses recursively; quoted args don't confuse the split") {
    assert(catalyst("Map(String, UInt8)")
      .contains(MapType(StringType, ShortType, valueContainsNull = false)))
    assert(catalyst("Map(String, Nullable(Float64))")
      .contains(MapType(StringType, DoubleType, valueContainsNull = true)))
    assert(catalyst("Map(LowCardinality(String), Array(UInt32))")
      .contains(MapType(StringType, ArrayType(LongType, containsNull = false),
        valueContainsNull = false)))
    // a comma inside a quoted enum label or tz must not split the args
    assert(catalyst("Map(String, DateTime64(3, 'UTC'))")
      .contains(MapType(StringType, TimestampType, valueContainsNull = false)))
    assert(catalyst("Map(Enum8('a,b' = 1), UInt8)")
      .contains(MapType(StringType, ShortType, valueContainsNull = false)))
    assert(catalyst("Map(String)").isEmpty) // wrong arity defers
  }

  test("read mapping: bare Tuple → positional _1/_2 struct; named Tuple keeps names") {
    assert(catalyst("Tuple(UInt8, String)").contains(StructType(Seq(
      StructField("_1", ShortType, nullable = false),
      StructField("_2", StringType, nullable = false)))))
    assert(catalyst("Tuple(a UInt8, b Array(String))").contains(StructType(Seq(
      StructField("a", ShortType, nullable = false),
      StructField("b", ArrayType(StringType, containsNull = false),
        nullable = false)))))
    // nested Nullable drives per-field nullability; wrappers unwrap anywhere
    assert(catalyst("Tuple(a Nullable(Int64), b LowCardinality(String))")
      .contains(StructType(Seq(
        StructField("a", LongType, nullable = true),
        StructField("b", StringType, nullable = false)))))
    // backtick-quoted field names unquote
    assert(catalyst("Tuple(`odd name` UInt16)").contains(StructType(Seq(
      StructField("odd name", IntegerType, nullable = false)))))
    // doubled backticks (the write side's escape for ` inside a name)
    // un-escape on read, so such names round-trip instead of deferring
    assert(catalyst("Tuple(`tick``name` UInt16)").contains(StructType(Seq(
      StructField("tick`name", IntegerType, nullable = false)))))
    // tuples nest inside arrays/maps and vice versa
    assert(catalyst("Array(Tuple(Float32, Float32))")
      .contains(ArrayType(StructType(Seq(
        StructField("_1", FloatType, nullable = false),
        StructField("_2", FloatType, nullable = false))),
        containsNull = false)))
    assert(catalyst("Tuple(xs Array(UInt32), kv Map(String, UInt8))")
      .contains(StructType(Seq(
        StructField("xs", ArrayType(LongType, containsNull = false),
          nullable = false),
        StructField("kv", MapType(StringType, ShortType,
          valueContainsNull = false), nullable = false)))))
    // a quoted enum label with spaces is a TYPE, not a named element
    assert(catalyst("Tuple(Enum8('a b' = 1), UInt8)").contains(StructType(Seq(
      StructField("_1", StringType, nullable = false),
      StructField("_2", ShortType, nullable = false)))))
    // nested Decimal parses precision/scale from the name (no JDBC metadata)
    assert(catalyst("Tuple(d Decimal(18, 4))").contains(StructType(Seq(
      StructField("d", DecimalType(18, 4), nullable = false)))))
    // mixed named/unnamed or unknown element types defer, never mis-map
    assert(catalyst("Tuple(a UInt8, String)").isEmpty)
    assert(catalyst("Tuple(a AggregateFunction(sum, UInt64))").isEmpty)
    assert(catalyst("Tuple()").isEmpty)
    // Nested(a T, b U) — the flatten_nested=0 record-array column —
    // maps to Array(Struct), nullability and nesting included
    assert(catalyst("Nested(id UInt32, tags Array(String))")
      .contains(ArrayType(StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("tags", ArrayType(StringType, containsNull = false),
          nullable = false))), containsNull = false)))
    assert(catalyst("Nested(v Nullable(Float64))")
      .contains(ArrayType(StructType(Seq(
        StructField("v", DoubleType, nullable = true))),
        containsNull = false)))
    // unknown inner types still defer
    assert(catalyst("Nested(x AggregateFunction(sum, UInt64))").isEmpty)
  }

  test("write mapping: StructType emits named-Tuple DDL and round-trips") {
    def ddl(dt: DataType) = d.getJDBCType(dt).map(_.databaseTypeDefinition)
    val pt = StructType(Seq(
      StructField("x", FloatType, nullable = false),
      StructField("y", FloatType, nullable = false)))
    assert(ddl(pt).contains("Tuple(x Float32, y Float32)"))
    // nullable scalar fields become Nullable(T); composite fields stay bare
    val mixed = StructType(Seq(
      StructField("n", LongType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = false),
        nullable = true)))
    assert(ddl(mixed).contains("Tuple(n Nullable(Int64), tags Array(String))"))
    // non-identifier field names backtick-quote in the DDL
    val odd = StructType(Seq(StructField("odd name", IntegerType, nullable = false)))
    assert(ddl(odd).contains("Tuple(`odd name` Int32)"))
    // write → read round trip preserves names, types, nullability —
    // including a field name CONTAINING a backtick (escaped as `` in
    // the emitted DDL, un-escaped by the read side)
    val ticked = StructType(Seq(
      StructField("tick`name", IntegerType, nullable = false)))
    assert(ddl(ticked).contains("Tuple(`tick``name` Int32)"))
    Seq(pt, odd, ticked,
      StructType(Seq(StructField("pts",
        ArrayType(pt, containsNull = false), nullable = false)))).foreach { st =>
      val emitted = ddl(st).get
      assert(catalyst(emitted).contains(st), s"$st → $emitted did not round-trip")
    }
    // documented asymmetry: a nullable COMPOSITE field can't be spelled in
    // CH DDL (Nullable(Array) is forbidden), so its nullability is dropped
    // on write and reads back as non-nullable; scalar nullability survives.
    assert(catalyst(ddl(mixed).get).contains(StructType(Seq(
      StructField("n", LongType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = false),
        nullable = false)))))
  }

  test("write mapping: ArrayType/MapType emit native CH DDL, Nullable on scalar elements only") {
    def ddl(dt: DataType) = d.getJDBCType(dt).map(_.databaseTypeDefinition)
    assert(ddl(ArrayType(FloatType, containsNull = false)).contains("Array(Float32)"))
    assert(ddl(ArrayType(StringType, containsNull = true)).contains("Array(Nullable(String))"))
    assert(ddl(MapType(StringType, ShortType, valueContainsNull = false))
      .contains("Map(String, Int16)"))
    // composite elements are never Nullable-wrapped (CH forbids it)
    assert(ddl(ArrayType(ArrayType(LongType, containsNull = false), containsNull = true))
      .contains("Array(Array(Int64))"))
    assert(ddl(MapType(StringType, ArrayType(DoubleType, containsNull = false),
      valueContainsNull = true)).contains("Map(String, Array(Float64))"))
  }

  test("round-trip: Array(Float32) embedding column write → read is lossless") {
    val written = ArrayType(FloatType, containsNull = false)
    val ddl = d.getJDBCType(written).get.databaseTypeDefinition
    assert(catalyst(ddl).contains(written))
    val withNulls = ArrayType(DoubleType, containsNull = true)
    val ddl2 = d.getJDBCType(withNulls).get.databaseTypeDefinition
    assert(catalyst(ddl2).contains(withNulls))
  }

  test("write mapping: native ClickHouse DDL types, µs-precision DateTime64") {
    def ddl(dt: DataType) = d.getJDBCType(dt).map(_.databaseTypeDefinition)
    assert(ddl(StringType).contains("String"))
    assert(ddl(BooleanType).contains("Bool"))
    assert(ddl(IntegerType).contains("Int32"))
    assert(ddl(LongType).contains("Int64"))
    assert(ddl(FloatType).contains("Float32"))
    assert(ddl(DoubleType).contains("Float64"))
    assert(ddl(TimestampType).contains("DateTime64(6)"))
    assert(ddl(DateType).contains("Date32"))
    assert(ddl(DecimalType(20, 0)).contains("Decimal(20, 0)"))
  }

  test("round-trip: write type re-reads to the same catalyst type") {
    // for each writable type: the ClickHouse DDL it emits, read back
    // through getCatalystType, lands on a type that loses nothing.
    val cases: Seq[(DataType, DataType)] = Seq(
      (StringType, StringType),
      (BooleanType, BooleanType),
      (ByteType, ByteType),
      (ShortType, ShortType),
      (IntegerType, IntegerType),
      (LongType, LongType),
      (FloatType, FloatType),
      (DoubleType, DoubleType),
      (DateType, DateType),
      (TimestampType, TimestampType))
    cases.foreach { case (written, expected) =>
      val ddl = d.getJDBCType(written).get.databaseTypeDefinition
      assert(catalyst(ddl).contains(expected),
        s"$written → $ddl did not read back as $expected")
    }
  }

  test("driver type-code invariance: the name-driven mapping is identical across every java.sql.Types code") {
    // The real clickhouse-jdbc driver jar is not on the offline
    // classpath, and its reported java.sql.Types codes have CHANGED
    // across driver generations (the legacy ru.yandex driver, the
    // com.clickhouse 0.3/0.4 line, and the v2 com.clickhouse.jdbc
    // rewrite do not agree on codes for UInt64, FixedString, Enum,
    // UUID, Array, Map, or Tuple). This contract test pins the
    // property that makes every one of those drivers work unmodified:
    // getCatalystType is a pure function of the TYPE NAME — for any
    // code any driver version reports, the result is the same. The
    // code space swept is the full public java.sql.Types constant set.
    val allJdbcCodes: Seq[Int] =
      classOf[java.sql.Types].getFields.toSeq
        .filter(f => f.getType == classOf[Int] || f.getType == java.lang.Integer.TYPE)
        .map(_.getInt(null)).distinct
    assert(allJdbcCodes.size > 30) // the sweep really is the whole set
    val names = Seq(
      "UInt8", "UInt16", "UInt32", "UInt64", "Int8", "Int16", "Int32",
      "Int64", "Float32", "Float64", "String", "FixedString(16)",
      "Date", "Date32", "DateTime", "DateTime64(3, 'UTC')",
      "Enum8('a' = 1)", "UUID", "Bool", "Nullable(UInt64)",
      "LowCardinality(Nullable(String))", "Array(Float32)",
      "Array(Nullable(String))", "Map(String, UInt8)",
      "Tuple(a UInt8, b Array(String))", "Nested(a UInt8, b String)",
      "Array(Decimal(18, 4))")
    names.foreach { n =>
      val expected = catalyst(n, Types.OTHER)
      assert(expected.nonEmpty, s"$n must map")
      allJdbcCodes.foreach { code =>
        assert(catalyst(n, code) == expected,
          s"$n mapped differently under java.sql.Types code $code")
      }
    }
    // The documented exceptions — names that DEFER to the generic
    // mapping (None), where the driver's code+metadata DO decide:
    // top-level Decimal(P, S) (driver DECIMAL precision/scale is
    // exact) and AggregateFunction (CH-internal binary states). The
    // deferral itself must also be code-invariant.
    Seq("Decimal(18, 4)", "AggregateFunction(sum, UInt64)").foreach { n =>
      allJdbcCodes.foreach { code =>
        assert(catalyst(n, code).isEmpty,
          s"$n must defer to the generic mapping under code $code")
      }
    }
  }

  test("truncate: ClickHouse TRUNCATE TABLE, non-cascading") {
    assert(d.getTruncateQuery("`db`.`t`") == "TRUNCATE TABLE `db`.`t`")
    assert(d.isCascadingTruncateTable.contains(false))
  }

  test("fallback matrix: unknown/malformed/future type names defer, never throw") {
    // The documented failure contract: any name the parser can't FULLY
    // resolve defers to Spark's generic code-driven mapping (None) —
    // never a partial mis-map, never an exception. Rows grouped by why
    // they defer; each is asserted under both a benign and a hostile
    // JDBC code so the deferral is code-invariant like everything else.
    val unknowable = Seq(
      // future / server-side-only types (ClickHouse 23+/24+ additions)
      "JSON", "Dynamic", "Variant(String, UInt64)", "Object('json')",
      "SimpleAggregateFunction(any, String)", "Nothing",
      "IntervalDay", "Point", "Ring", "Polygon", "MultiPolygon",
      // malformed generics: unclosed, empty, wrong arity
      "Array(", "Array()", "Array(String, UInt8)",
      "Map(String)", "Map(String, UInt8, UInt8)",
      "Tuple()", "Nested()", "Nested(a)",
      "Nullable(String", "Nullable()", "LowCardinality()",
      // unparseable parameters / mixed naming
      "Array(Decimal(abc, def))", "Tuple(a UInt8, String)",
      // unknown INNER type poisons the whole composite (no partial map)
      "Array(JSON)", "Map(String, Dynamic)", "Tuple(a JSON)",
      // degenerate names
      "", "   ", "(", ")", "'quote")
    for (name <- unknowable; code <- Seq(Types.OTHER, Types.VARCHAR)) {
      val r = try catalyst(name, code) catch {
        case e: Exception => fail(s"'$name' threw ${e.getClass.getSimpleName}")
      }
      assert(r.isEmpty, s"'$name' must defer, resolved to $r")
    }
    // positive controls: the matrix must not be vacuous — wrappers,
    // deep nesting, and named tuples still resolve. Enum label lists
    // are DELIBERATELY ignored (even a truncated one): the scalar head
    // alone fixes the Catalyst type — enum VALUES are strings whatever
    // the labels say.
    assert(catalyst("Enum8('a' =").contains(StringType))
    assert(catalyst("Nullable(Nullable(String))").contains(StringType))
    assert(catalyst("Array(Array(Array(Nullable(UInt8))))").contains(
      ArrayType(ArrayType(ArrayType(ShortType, containsNull = true),
        containsNull = false), containsNull = false)))
    assert(catalyst("Nested(a UInt8, b Array(String))").contains(
      ArrayType(StructType(Seq(
        StructField("a", ShortType, nullable = false),
        StructField("b", ArrayType(StringType, containsNull = false),
          nullable = false))), containsNull = false)))
  }
}
