package graft.operators

import graft.SparkFunSuite

class JoinsSpec extends SparkFunSuite {

  test("asofJoin: latest right row at or before left ts, per key") {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    val left = Seq(
      (1L, "u1", 5L), (2L, "u1", 20L), (3L, "u1", 10L), (4L, "u2", 7L)
    ).toDF("lid", "k", "ts")
    val right = Seq(
      ("u1", 4L, 100L), ("u1", 10L, 200L), ("u1", 30L, 300L)
    ).toDF("k", "ts", "payload")
    val res = Joins.asofJoin(left, right, Seq("k"), "ts", "ts",
        Seq("payload"), rightTieBreak = Some("payload"))
      .select("lid", "payload_asof")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(res(1L) == 100L) // ts=5 → right@4
    assert(res(2L) == 200L) // ts=20 → right@10 (30 is in the future)
    assert(res(3L) == 200L) // ts=10 → right@10 (simultaneous matches)
    assert(res(4L) == -1L)  // u2 has no right rows → null
  }

  test("asofJoin: simultaneous right rows resolve by tie-break (max wins)") {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    val left = Seq((1L, "u", 10L)).toDF("lid", "k", "ts")
    val right = Seq(("u", 10L, 7L), ("u", 10L, 9L)).toDF("k", "ts", "payload")
    val res = Joins.asofJoin(left, right, Seq("k"), "ts", "ts",
      Seq("payload"), rightTieBreak = Some("payload")).collect()
    assert(res.head.getAs[Long]("payload_asof") == 9L)
  }

  test("asofJoin: latest right ROW wins atomically — null payload values " +
      "do not inherit older rows, columns never mix across rows") {
    val s = graft.SparkTestBase.spark
    import s.implicits._
    val left = Seq((1L, "u", 30L)).toDF("lid", "k", "ts")
    // latest right row (ts=20) has a NULL a and a fresh b: the left row
    // must see (null, "y2"), not (10, "y2") stitched from two rows.
    val right = Seq(
      ("u", 10L, Option(10L), "y1"),
      ("u", 20L, Option.empty[Long], "y2")
    ).toDF("k", "ts", "a", "b")
    val res = Joins.asofJoin(left, right, Seq("k"), "ts", "ts",
      Seq("a", "b"), rightTieBreak = Some("ts")).collect().head
    assert(res.isNullAt(res.fieldIndex("a_asof")),
      "null payload value must win, not inherit the older row's 10")
    assert(res.getAs[String]("b_asof") == "y2")
  }

  test("hamming_dist: codegen, interpreted, and SQL paths agree") {
    val s = graft.SparkTestBase.spark
    graft.GraftExtensions.register(s)
    import org.apache.spark.sql.functions._
    // SQL registration
    assert(s.sql("SELECT hamming_dist('10110', '10011') AS d")
      .head().getLong(0) == 2L)
    // Column API over real rows (codegen path) vs the HOF formulation
    val sigs = graft.operators.Dedup.simhashBits(
      s.read.parquet(s"$sf0001/documents.parquet").limit(50), "doc_id", "text")
    val pairs = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.simhash").as("x"), col("b.simhash").as("y"))
    val hof = aggregate(sequence(lit(1), lit(32)), lit(0L),
      (acc, p) => acc + when(
        col("x").substr(p, lit(1)) =!= col("y").substr(p, lit(1)), 1L)
        .otherwise(0L))
    val mismatches = pairs.select(
      graft.plans.StringOps.hammingDist(col("x"), col("y")).as("fast"),
      hof.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatches == 0L)
    // null propagation (interpreted eval path)
    assert(s.sql("SELECT hamming_dist(CAST(NULL AS STRING), '1') IS NULL")
      .head().getBoolean(0))
  }

  test("float_dot is SQL-registered and matches the Column API") {
    val s = graft.SparkTestBase.spark
    graft.GraftExtensions.register(s)
    val viaSql = s.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(viaSql == 1.5 * 3 + 2 * 0.5)
    import org.apache.spark.sql.functions._
    val emb = s.read.parquet(s"$sf0001/embeddings.parquet").limit(5)
    val rows = emb.select(
      graft.plans.FloatVecOps.floatDot(col("embedding"), col("embedding")).as("a"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) > 0))
  }
}
