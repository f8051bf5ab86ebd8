package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer semantics (Kudo 2018, hard-EM variant): the
  * Viterbi fold's max-product segmentation and tie rule, the EM
  * count re-estimation, and the vocab-join encode economy.
  */
class UnigramSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def seg(word: String, vm: Map[String, Double]): String =
    Seq(word).toDF("w")
      .select(Unigram.viterbiSeg(col("w"), typedLit(vm), 4).as("s"))
      .head().getString(0)

  test("viterbiSeg picks the max-probability segmentation") {
    // p(ab) beats p(a)p(b): one piece wins
    assert(seg("ab", Map("a" -> 0.1, "b" -> 0.1, "ab" -> 0.5)) === "ab")
    // p(ab) below the product: two pieces win
    assert(seg("ab", Map("a" -> 0.3, "b" -> 0.3, "ab" -> 0.05)) === "a b")
    // mixed: the DP finds the best split, not greedy-longest —
    // "abc" as ab|c (0.4*0.5=0.2) beats a|bc (0.1*0.6=0.06) and
    // a|b|c (0.005)
    assert(seg("abc", Map("a" -> 0.1, "b" -> 0.1, "c" -> 0.5,
      "ab" -> 0.4, "bc" -> 0.6)) === "ab c")
  }

  test("viterbiSeg breaks exact score ties toward the shorter piece") {
    // "a a" scores 0.5*0.5 = 0.25 = p(aa): tie → the m=1 path wins
    // (the oracle's replace-on-strictly-greater chain, mirrored by
    // the (score, -m) array_max key)
    assert(seg("aa", Map("a" -> 0.5, "aa" -> 0.25)) === "a a")
    // strictly better long piece still wins
    assert(seg("aa", Map("a" -> 0.5, "aa" -> 0.2500000001)) === "aa")
  }

  test("train runs the hand-computed EM and is deterministic") {
    // corpus "ab"×3: seed counts a:3 b:3 ab:3; round 1 probs are all
    // (3+1)/(9+3)=1/3, so "ab" (1/3) beats "a b" (1/9) → counts
    // ab:3, a:0, b:0; rounds 2-3 only reinforce the winner.
    val docs = Seq("ab ab ab").toDF("text")
    val m = Unigram.train(docs, "text", topK = 64, maxPiece = 4, rounds = 3)
    assert(m.counts === Seq(("ab", 3L), ("a", 0L), ("b", 0L)))
    // final smoothed probs: (3+1)/(3+3), (0+1)/(3+3)
    assert(m.probs.toMap === Map("ab" -> 4.0 / 6, "a" -> 1.0 / 6,
      "b" -> 1.0 / 6))
    // reproducible: a second training run yields the identical model
    assert(Unigram.train(docs, "text", 64, 4, 3) === m)
  }

  test("EM reassigns mass from characters to winning multi-char pieces") {
    val docs = Seq("abab abab abab cd cd").toDF("text")
    val m = Unigram.train(docs, "text", 64, 4, 3)
    val c = m.counts.toMap
    // "abab" tokenizes through the 4-gram piece; "cd" through its own
    assert(c("abab") === 3L && c("cd") === 2L)
    // every single character survives in the model (coverage rule)
    assert(Seq("a", "b", "c", "d").forall(c.contains))
    // total piece usage equals the tokenized corpus length
    assert(m.counts.map(_._2).sum === 5L)
  }

  test("topK caps the multi-char seed but never the characters") {
    val docs = Seq("abc abd abe").toDF("text")
    val m = Unigram.train(docs, "text", topK = 1, maxPiece = 4, rounds = 2)
    val pieces = m.counts.map(_._1)
    // only ONE multi-char piece admitted: "ab" (cnt 3 beats all others)
    assert(pieces.filter(_.length >= 2) === Seq("ab"))
    assert(Seq("a", "b", "c", "d", "e").forall(pieces.contains))
  }

  test("EM on a morphology-rich corpus concentrates mass on real morphemes") {
    // 5 stems × 4 suffixes, 20 distinct words with skewed frequencies —
    // the shape tokenizer training exists for. After 3 EM rounds the
    // model must carve words at the stem/suffix seam: the stems and
    // productive suffixes hold the mass, not arbitrary crossings.
    val stems = Seq("walk", "talk", "jump", "lift", "push")
    val sufs = Seq("s", "ed", "ing", "er")
    val words = for { (st, i) <- stems.zipWithIndex; (su, j) <- sufs.zipWithIndex }
      yield Seq.fill(1 + (i + j) % 3)(st + su).mkString(" ")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val m = Unigram.train(docs, "text", topK = 64, maxPiece = 4, rounds = 3)
    val c = m.counts.toMap
    // every stem survives as a piece with positive usage
    stems.foreach(st => assert(c.getOrElse(st, 0L) > 0L, s"stem $st lost"))
    // the productive multi-char suffixes hold mass too
    Seq("ed", "ing", "er").foreach(su =>
      assert(c.getOrElse(su, 0L) > 0L, s"suffix $su lost"))
    // segmentation audit: every word splits exactly at the seam
    val enc = Unigram.encodeVocab(docs, "text", m, 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (st <- stems; su <- Seq("ed", "ing", "er"))
      assert(enc(st + su) == s"$st $su", s"${st + su} → ${enc(st + su)}")
    // mass concentrates on multi-char pieces; the only single-char
    // usage left is the legitimate "-s" suffix (one per stem's plural)
    val multiMass = m.counts.collect { case (p, n) if p.length >= 2 => n }.sum
    val charMass = m.counts.collect { case (p, n) if p.length == 1 => n }.sum
    assert(multiMass > 5 * math.max(charMass, 1L),
      s"multi-char mass $multiMass vs char mass $charMass")
    assert(c.getOrElse("s", 0L) == charMass,
      s"all residual char mass should be the -s suffix, got ${m.counts.filter(t => t._1.length == 1 && t._2 > 0)}")
  }

  test("encodeVocab segments every distinct word under the final model") {
    val docs = Seq("ab ab ab xy").toDF("text")
    val m = Unigram.train(docs, "text", 64, 4, 3)
    val enc = Unigram.encodeVocab(docs, "text", m, 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc("ab") === "ab")
    // "xy" never won a multi-char piece against "ab"'s head start?
    // it did seed ("xy" cnt 1) — both words segment via their pieces
    assert(enc("xy").split(" ").forall(m.counts.toMap.contains))
  }

  test("OOV characters segment at the Laplace floor instead of nulling the DP") {
    val docs = Seq("ab ab ab").toDF("text")
    val m = Unigram.train(docs, "text", 64, 4, 3)
    // without the fallback, any word containing a char the training
    // corpus never saw folded to null (all candidates null at that
    // position; the null prev poisons the rest of the DP)
    def segWith(word: String, unk: org.apache.spark.sql.Column): Option[String] =
      Option(Seq(word).toDF("w")
        .select(Unigram.viterbiSeg(col("w"), typedLit(m.probs.toMap), 4,
          unk).as("s"))
        .head().getString(0))
    assert(segWith("azb", lit(null)) === None) // the pre-fix behavior
    // with the model floor: OOV chars become their own floor-scored
    // pieces and the in-vocab neighbors still segment normally
    assert(segWith("azb", lit(m.unkProb)) === Some("a z b"))
    assert(segWith("zzab", lit(m.unkProb)) === Some("z z ab"))
    // the floor is the Laplace zero-count probability of this model:
    // counts (ab:3, a:0, b:0) → 1 / (3 + 3)
    assert(m.unkProb === 1.0 / 6)
    // encodeVocab applies the model WITH the floor — a corpus with
    // unseen characters tokenizes end-to-end
    val enc = Unigram.encodeVocab(Seq("ab qab").toDF("text"), "text", m, 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(enc("ab") === "ab" && enc("qab") === "q ab")
    // in-vocab segmentation is untouched by the fallback (coalesce
    // only fires where try_element_at was null)
    assert(segWith("abab", lit(m.unkProb)) ===
      Some(seg("abab", m.probs.toMap)))
  }
}
