package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** BPE training/encoding semantics (Sennrich et al. 2016): the greedy
  * left-to-right merge fold, deterministic tie-breaks, and the
  * vocab-join encode economy.
  */
class BpeSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def merged(syms: String, a: String, b: String): String =
    Seq(syms).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), a, b).as("m"))
      .head().getString(0)

  test("applyMerge is greedy left-to-right and non-overlapping") {
    // back-to-back identical pairs: BPE merges positions 1-2 and 3-4
    assert(merged("a a a a", "a", "a") === "aa aa")
    // odd run: the trailing symbol survives
    assert(merged("a a a", "a", "a") === "aa a")
    // a freshly merged tail never re-matches the left symbol
    assert(merged("a b b", "a", "b") === "ab b")
    // interior merge keeps neighbors intact
    assert(merged("x a b y", "a", "b") === "x ab y")
    // multi-char symbols merge whole-symbol, never substrings
    assert(merged("qa b c", "a", "b") === "qa b c")
    assert(merged("p ar t", "p", "ar") === "par t")
    // single-symbol input is a fixed point
    assert(merged("z", "a", "b") === "z")
  }

  test("trainMerges learns the hand-computed model and is deterministic") {
    // freq-weighted corpus: "abab"×3, "abc"×2 → pairs:
    //   (a,b) 3*2+2=8, (b,a) 3, (b,c) 2 → merge 1 = (a,b) cnt 8
    // after merge: "ab ab"×3, "ab c"×2 → (ab,ab) 3, (ab,c) 2
    //   → merge 2 = (ab,ab) cnt 3
    val docs = Seq("abab abab abab abc abc").toDF("text")
    val m = Bpe.trainMerges(docs, "text", 2)
    assert(m === Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
    // reproducible: a second training run yields the identical model
    assert(Bpe.trainMerges(docs, "text", 2) === m)
  }

  test("tie-breaks are lexicographic on the pair") {
    // (a,b) and (c,d) both occur once → (a,b) wins the tie
    val docs = Seq("ab cd").toDF("text")
    val m = Bpe.trainMerges(docs, "text", 1)
    assert(m === Seq((1, "a", "b", 1L)))
  }

  test("training stops early when no pairs remain") {
    // single-char words only → zero mergeable pairs
    val docs = Seq("a b c").toDF("text")
    assert(Bpe.trainMerges(docs, "text", 5).isEmpty)
  }

  test("encodeVocab applies the full merge sequence per distinct word") {
    val docs = Seq("abab abab abc xy").toDF("text")
    val m = Bpe.trainMerges(docs, "text", 2)
    val enc = Bpe.encodeVocab(docs, "text", m)
      .select("w", "syms").as[(String, String)].collect().toMap
    assert(enc("abab") === "abab")    // merge 2 (ab,ab) → 1 token
    assert(enc("abc") === "ab c")     // 3 chars → 2 tokens
    assert(enc("xy") === "x y")       // untouched by the learned merges
  }

  test("training leaves no cached data behind") {
    val docs = Seq("abab abc").toDF("text")
    Bpe.trainMerges(docs, "text", 2)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
