package graft

import org.apache.spark.sql.functions._

/** The scale-up generator's design claims, verified at factor=2 on
  * sf0.001: counts scale exactly, the orders↔lineitem FK survives, and
  * the per-copy transforms are true isometries — the text permutation
  * preserves within-copy shingle structure and the embedding sign-flip
  * preserves within-copy cosines bit-for-bit. These properties are what
  * make the measured sf-ratios (SCALING.md) evidence about the PLANS
  * rather than about generator artifacts.
  */
class ScaleDataSpec extends SparkFunSuite {

  private lazy val outDir: String = {
    val dir = tmpDir("scale2x")
    ScaleData.generate(spark, sf0001, dir, 2)
    dir
  }

  test("fact tables scale by the factor; dims verbatim; ids disjoint") {
    Seq("orders", "lineitem", "events", "documents", "embeddings").foreach { t =>
      val src = graft.sources.Sources.table(spark, sf0001, t).count()
      val out = graft.sources.Sources.table(spark, outDir, t).count()
      assert(out == 2 * src, s"$t: $out != 2*$src")
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      assert(graft.sources.Sources.table(spark, outDir, t).count()
        == graft.sources.Sources.table(spark, sf0001, t).count())
    }
    // shifted keys collide with nothing
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
  }

  test("orders-lineitem FK preserved: every lineitem finds its order") {
    val o = spark.read.parquet(s"$outDir/orders.parquet")
    val l = spark.read.parquet(s"$outDir/lineitem.parquet")
    val orphans = l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
    assert(orphans.count() == 0)
  }

  test("Caesar shift is a within-copy isometry, cross-copy fully discordant") {
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = spark.read.parquet(s"$outDir/documents.parquet")
    val stride = src.agg(max("doc_id")).head().getLong(0) + 1
    // copy 0 is the identity
    val joined0 = src.as("a").join(out.as("b"), col("a.doc_id") === col("b.doc_id"))
    assert(joined0.filter(col("a.text") =!= col("b.text")).count() == 0)
    // copy 1: same length (bijective char map), different text
    val joined1 = src.as("a").join(out.as("b"),
      col("a.doc_id") + lit(stride) === col("b.doc_id"))
    assert(joined1.filter(length(col("a.text")) =!= length(col("b.text"))).count() == 0)
    assert(joined1.filter(col("a.text") === col("b.text") &&
      col("a.text").rlike("[a-zA-Z]")).count() == 0)
    // cross-copy discordance at the shingle level: copies share NO word
    // containing a letter (a shift moves every letter), so LSH candidate
    // counts scale linearly instead of picking up cross-copy collisions
    val w0 = src.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("[a-zA-Z]")).distinct()
    val w1 = out.filter(col("doc_id") >= stride)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("[a-zA-Z]")).distinct()
    assert(w0.intersect(w1).count() == 0)
  }

  test("embedding sign-flip preserves within-copy cosines exactly") {
    val out = spark.read.parquet(s"$outDir/embeddings.parquet")
    val src = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val stride = src.agg(max("vec_id")).head().getLong(0) + 1
    val n = 20 // pairwise over a sample is plenty to catch a broken flip
    def vecs(df: org.apache.spark.sql.DataFrame, shift: Long): Map[Long, Array[Float]] =
      df.filter(col("vec_id") >= shift && col("vec_id") < shift + n)
        .collect()
        .map(r => (r.getLong(0) - shift) -> r.getSeq[Float](1).toArray).toMap
    val orig = vecs(out, 0L)
    val flip = vecs(out, stride)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    for (i <- 0L until n.toLong; j <- (i + 1) until n.toLong) {
      // identical dot products pair-for-pair: sign pattern cancels
      assert(dot(orig(i), orig(j)) == dot(flip(i), flip(j)),
        s"cosine broken for pair ($i,$j)")
    }
    // ...and the flip is not a no-op
    assert((0L until n.toLong).exists(i => !orig(i).sameElements(flip(i))))
  }

  test("regeneration is deterministic: per-table content hashes reproduce") {
    // The scaled datasets live in /tmp (ephemeral), so the SCALING.md
    // evidence is only reproducible if a REGENERATED dataset provably
    // equals the one the measurements ran on. Generate factor-2 a second
    // time and require every table's order-independent content hash
    // (count + sum of per-row xxhash64 over all columns) to match the
    // first generation bit-for-bit — any nondeterminism in the generator
    // (partition-order-dependent ids, clock/random input, float drift)
    // breaks this immediately.
    val dir2 = tmpDir("scale2x_regen")
    ScaleData.generate(spark, sf0001, dir2, 2)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      def fingerprint(dir: String): (Long, java.math.BigDecimal) = {
        val df = graft.sources.Sources.table(spark, dir, t)
        val row = df.agg(
          count(lit(1)),
          sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).head()
        (row.getLong(0), row.getDecimal(1))
      }
      assert(fingerprint(outDir) == fingerprint(dir2),
        s"$t: regenerated content hash differs")
    }
  }
}
