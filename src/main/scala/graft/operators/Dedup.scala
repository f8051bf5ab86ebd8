package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact (hash
  * groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design:
  *  - Exact dedup is one hash-shuffle on the fingerprint key.
  *  - MinHash/LSH turns the O(n²) near-dup problem into
  *    shingle→signature→band→bucket-join: candidate pairs come from a
  *    self-join on band keys (a shuffle keyed by tiny band strings), and
  *    only candidates pay the exact-Jaccard verification join. At 100 TB
  *    this is the only shape that works — the direct pairwise operator
  *    [[jaccardPairs]] is provided for verification at small n.
  *  - All hashing is md5-based and arithmetic-free so the DuckDB oracle
  *    can reproduce signatures bit-for-bit (lexicographic min over
  *    `md5(shingle || ':' || i)` replaces the usual `(a·h+b) mod p`
  *    family — same minwise-independence idea, engine-portable).
  */
object Dedup {

  /** Word 3-gram shingles, distinct, as an array column. Assumes ≥3
    * tokens (the corpus guarantees ≥10).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(off => element_at(toks, i + off)): _*)))
  }

  /** Exploded (id, shingle) pairs — the inverted-index relation. */
  def shingleRelation(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(shingles(col(textCol))).as("shingle"))

  /** Exact near-duplicate pairs by shingle-set Jaccard ≥ threshold,
    * via the inverted index (shared-shingle pairs only — never all pairs).
    * Output: (id_a, id_b, jac) with id_a < id_b.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val rel = shingleRelation(df, idCol, textCol)
    val sizes = rel.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = rel.as("a").join(rel.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") /
          (col("sa.n") + col("sb.n") - col("c")).cast("double"), 6).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** MinHash band keys: k = bands*rowsPerBand hash functions
    * h_i(s) = md5(s || ':' || i), signature = per-i lexicographic min,
    * band key = concat of the band's minima. Returns (id, band, key).
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val rel = shingleRelation(df, idCol, textCol)
    val hashed = rel
      .select(col("id"), explode(sequence(lit(0), lit(k - 1))).as("i"),
        col("shingle"))
      .select(col("id"), col("i"),
        md5(concat(col("shingle"), lit(":"), col("i"))).as("h"))
    val minCols = (0 until rowsPerBand).map(r =>
      min(when(col("i") % rowsPerBand === r, col("h"))).as(s"m$r"))
    val minPerBand = hashed
      .groupBy(col("id"), (col("i") / rowsPerBand).cast("int").as("band"))
      .agg(minCols.head, minCols.tail: _*)
    minPerBand.select(col("id"), col("band"),
      concat_ws("|", (0 until rowsPerBand).map(r => col(s"m$r")): _*).as("key"))
  }

  /** LSH candidate pairs: ids sharing any band bucket (id_a < id_b). */
  def lshCandidates(bandsDf: DataFrame): DataFrame =
    bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

  /** MinHash-LSH near-dup pipeline: bucket-join candidates, then exact
    * Jaccard verification of candidates only.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val cand = lshCandidates(minhashBands(df, idCol, textCol, bands, rowsPerBand))
    jaccardPairs(df, idCol, textCol, threshold)
      .join(cand, Seq("id_a", "id_b"), "left_semi")
  }

  /** 32-bit SimHash over the distinct-word set, as a '0'/'1' bit string.
    * Bit j is derived from hex digit j/4 of each word's md5 (portable
    * nibble arithmetic, no engine-specific bit ops): the bit is set when
    * the word-population majority sets it.
    */
  def simhashBits(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("word"))
    val withHash = words.select(col("id"), md5(col("word")).as("h"),
      explode(sequence(lit(0), lit(bits - 1))).as("j"))
    val nibble = expr(
      "locate(substring(h, cast(j div 4 as int) + 1, 1), '0123456789abcdef') - 1")
    // divisor 8/4/2/1 by bit-in-nibble position
    val divisor = when(col("j") % 4 === 0, 8).when(col("j") % 4 === 1, 4)
      .when(col("j") % 4 === 2, 2).otherwise(1)
    val bit = floor(nibble.cast("double") / divisor.cast("double")).cast("int") % 2
    val votes = withHash
      .select(col("id"), col("j"), (bit * 2 - 1).as("vote"))
      .groupBy("id", "j")
      .agg(sum(col("vote")).as("v"))
      .select(col("id"), col("j"),
        when(col("v") >= 0, "1").otherwise("0").as("b"))
    votes.groupBy("id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("j"), col("b")))),
        x => x.getField("b")), "").as("simhash"))
  }

  /** Hamming-distance pairs over simhash bit strings (verification-scale
    * helper; production path bands the signature like LSH).
    */
  def simhashPairs(sigs: DataFrame, maxDist: Int): DataFrame = {
    val positions = sigs.select(col("id"), col("simhash"),
      explode(sequence(lit(1), lit(32))).as("p"),
      expr("substring(simhash, p, 1)").as("c"))
    positions.as("a").join(positions.as("b"),
        col("a.p") === col("b.p") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(when(col("a.c") =!= col("b.c"), 1).otherwise(0)).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
