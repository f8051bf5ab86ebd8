package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BPE tokenizer training and application as vocabulary-sized Spark ops
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the byte-pair-encoding recipe every modern LLM
  * tokenizer descends from). The reference repo has no tokenizer; this
  * completes the `t_bpe_pairs` pair-statistics query into the full
  * train → encode loop (north-star LLM-pipeline surface, SURVEY.md §2B).
  *
  * Scale shape: the corpus is touched exactly once per phase — the
  * distinct-word frequency count for training, and one explode+join
  * pass for encoding. Every training iteration runs over the |vocab|
  * table only: pair counts are one map-side-combined shuffle over
  * vocab rows, the argmax is a 1-row collect (model state, O(1) on the
  * driver), and the merge application is a map-only fold. At 100 TB
  * the corpus scans dominate and are paid once; the merge loop never
  * re-reads documents. The folds use interpreted higher-order
  * functions, which is safe here precisely because they execute per
  * DISTINCT word, never per corpus token.
  */
object Bpe {

  /** word → space-separated single-character symbol string
    * ("hello" → "h e l l o"). Built positionally (not `split(w, "")`)
    * so the Spark and DuckDB formulations are the same expression.
    */
  def toSymbols(word: Column): Column =
    concat_ws(" ", transform(sequence(lit(1), length(word)),
      i => word.substr(i, lit(1))))

  /** One greedy left-to-right merge pass of the pair (a, b) over a
    * space-separated symbol string: fold the symbols, replacing the
    * accumulator's tail with a+b whenever the tail is `a` and the next
    * symbol is `b`. A freshly merged tail equals a+b and can never
    * re-match `a` (b is non-empty), so the no-overlap rule of the
    * reference algorithm's in-order scan is structural, with no
    * lookarounds (the oracle's RE2 engine has none) and no
    * consumed-separator pitfalls a string replace would have.
    */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val arr = split(syms, " ")
    aggregate(
      slice(arr, lit(2), size(arr) - 1),
      element_at(arr, 1),
      (acc, x) =>
        when(regexp_extract(acc, "[^ ]*$", 0) === lit(a) && x === lit(b),
          concat(regexp_replace(acc, "[^ ]*$", ""), lit(a + b)))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** Distinct-word frequency table — the one corpus-sized scan training
    * pays (one map-side-combined shuffle).
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Frequency-weighted adjacent-symbol pair counts over a vocab frame
    * carrying a `syms` column. |vocab|-sized input, |pairs|-sized
    * output; single-symbol words contribute nothing (filtered before
    * the sequence so Spark's descending `sequence(1, 0)` never fires).
    */
  def pairCounts(withSyms: DataFrame): DataFrame = {
    val arr = split(col("syms"), " ")
    withSyms
      .filter(size(arr) >= 2)
      .select(col("freq"), explode(transform(sequence(lit(1), size(arr) - 1),
        i => struct(element_at(arr, i).as("lft"),
          element_at(arr, i + 1).as("rgt")))).as("p"))
      .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
      .agg(sum("freq").as("cnt"))
  }

  /** Train `n` merges: (rank, left, right, weighted count). Ties break
    * deterministically (count desc, then pair lexicographic) so the
    * model is reproducible across engines, runs, and cluster sizes.
    * Each iteration persists the |vocab|-sized working set and drops
    * the previous one — bounded state, balanced cache.
    */
  def trainMerges(docs: DataFrame, textCol: String,
      n: Int): Seq[(Int, String, String, Long)] = {
    var cur = vocab(docs, textCol)
      .withColumn("syms", toSymbols(col("w")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var k = 1
    var exhausted = false
    while (k <= n && !exhausted) {
      val best = pairCounts(cur)
        .orderBy(col("cnt").desc, col("lft"), col("rgt"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val a = best(0).getString(0)
        val b = best(0).getString(1)
        out += ((k, a, b, best(0).getLong(2)))
        val next = cur.withColumn("syms", applyMerge(col("syms"), a, b))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        cur.unpersist()
        cur = next
        k += 1
      }
    }
    cur.unpersist()
    out.toSeq
  }

  /** Vocab with each word's final segmentation after applying the given
    * merges in rank order — map-only chained folds over |vocab| rows.
    * Encoding a corpus is then one explode + join against this table
    * (tokenization cost rides on DISTINCT words, not corpus tokens).
    */
  def encodeVocab(docs: DataFrame, textCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame =
    merges.sortBy(_._1).foldLeft(
      vocab(docs, textCol).withColumn("syms", toSymbols(col("w")))) {
      case (df, (_, a, b, _)) =>
        df.withColumn("syms", applyMerge(col("syms"), a, b))
    }
}
