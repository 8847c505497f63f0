package graft

import org.apache.spark.sql.functions._
import graft.ops.Unigram

/** Unigram LM tokenizer (Kudo 2018 / SentencePiece, hard-EM variant):
  * the fixed-point log, seeding, Viterbi argmin + tie-break, EM
  * pruning, and the encode digest. */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  test("mb1024: fixed-point 1024*log2 matches the cross-engine pins") {
    // exact values the DuckDB fold computes (prototyped + pinned) —
    // these are the digits BOTH engines must agree on
    assert(Unigram.mb1024(1L) == 0L)
    assert(Unigram.mb1024(2L) == 1024L)
    assert(Unigram.mb1024(3L) == 1623L)
    assert(Unigram.mb1024(10L) == 3401L)
    assert(Unigram.mb1024(1000L) == 10204L)
    assert(Unigram.mb1024(1048576L) == 20480L)
    assert(Unigram.mb1024(999999999999L) == 40819L)
    // and the quantization never strays more than one step from the
    // true floor(1024*log2 x)
    for (x <- 1L to 4096L) {
      val exact = math.floor(1024.0 * math.log(x.toDouble) / math.log(2.0))
      assert(math.abs(Unigram.mb1024(x) - exact) <= 1,
        s"mb1024($x) = ${Unigram.mb1024(x)} vs floor $exact")
    }
  }

  test("substrings: every window up to MaxPieceChars") {
    val got = Seq("abc").toDF("w")
      .select(Unigram.substrings(col("w")).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("a", "ab", "abc", "b", "bc", "c"))
  }

  test("viterbi: min-cost segmentation; ties break to the least token list") {
    def seg(w: String, costs: Map[String, Long]): Seq[String] =
      Seq(w).toDF("w")
        .select(Unigram.viterbiTokens(col("w"), costs).as("t"))
        .as[Seq[String]].head()
    // cheaper whole piece wins
    assert(seg("abab", Map("a" -> 10L, "b" -> 10L, "ab" -> 15L,
      "abab" -> 25L)) == Seq("abab"))
    // 20 = 20 tie: ["a","b"] < ["ab"] lexicographically -> chars win
    assert(seg("ab", Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)) ==
      Seq("a", "b"))
    // and when the single piece is strictly cheaper it wins
    assert(seg("ab", Map("a" -> 10L, "b" -> 10L, "ab" -> 19L)) ==
      Seq("ab"))
  }

  test("fit: seed -> hard-EM -> prune on a hand-worked corpus") {
    val df = Seq("abab abab cd").toDF("text")
    val ps = Unigram.fit(df, "text")
    // EM counts: viterbi("abab") = [abab] (3542 < any split), x2 words;
    // viterbi("cd") = [cd]; chars survive pruning at count 0
    assert(ps.map(p => (p.piece, p.n)) == Seq(
      ("abab", 2L), ("cd", 1L),
      ("a", 0L), ("b", 0L), ("c", 0L), ("d", 0L)))
    assert(ps.map(_.rank) == (1 to 6))
    // final costs are the Laplace milli-bit formula over the kept set
    val total1 = 3L
    val v1 = 6L
    ps.foreach { p =>
      assert(p.costMb == Unigram.costMb(p.n, total1, v1), p.piece)
    }
  }

  test("fitIterated(rounds = 1) is bit-identical to fit") {
    val corpus = Seq("abab abab cd", "zq zq abab cd cd").toDF("text")
    assert(Unigram.fitIterated(corpus, "text", rounds = 1) ==
      Unigram.fit(corpus, "text"))
  }

  test("fitIterated: the prune schedule changes the vocabulary vs one round") {
    // Built to expose the schedule: 240 distinct filler words spread
    // the seed's top-256 multi-piece cap thin, so the intermediate
    // 3/4 prunes (256 -> 192 -> 144) BIND and evict pieces that a
    // single seed-cost round would have kept; re-estimated costs then
    // redirect later Viterbi rounds toward the survivors.
    val filler = (0 until 240).map(i => f"w$i%03dq$i%03d")
    val corpus = (Seq.fill(8)("abcdef") ++ Seq.fill(6)("abc def") ++
      Seq.fill(4)("abcd ef") ++ filler).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val one = Unigram.fitIterated(df, "text", rounds = 1)
    val three = Unigram.fitIterated(df, "text", rounds = 3)
    assert(one.map(_.rank) == (1 to one.size))
    assert(three.map(_.rank) == (1 to three.size))
    assert(one.map(p => (p.piece, p.n)) != three.map(p => (p.piece, p.n)),
      "prune schedule had no effect — fixture does not expose it")
  }

  test("viterbi: OOV character takes the explicit <unk> fallback") {
    // vocabulary without 'z': the persisted-vocab encode path on new
    // text must emit <unk>, never a silently-skipped null
    val costs = Map("a" -> 10L, "b" -> 10L, "ab" -> 15L)
    val got = Seq("azb").toDF("w")
      .select(Unigram.viterbiTokens(col("w"), costs).as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("a", Unigram.UnkToken, "b"))
    // and in-vocabulary words segment exactly as without the fallback
    val inVocab = Seq("abab").toDF("w")
      .select(Unigram.viterbiTokens(col("w"), costs).as("t"))
      .as[Seq[String]].head()
    assert(inVocab == Seq("ab", "ab"))
  }

  test("piece table persists and reloads bit-identically") {
    val ps = Unigram.fit(Seq("abab abab cd").toDF("text"), "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-uni").toString
    Unigram.piecesDF(spark, ps).write.parquet(s"$dir/p")
    assert(Unigram.fromDF(spark.read.parquet(s"$dir/p")) == ps)
  }

  test("encodeDigest: per-doc counts, order-sensitive digest, empty rows") {
    val docs = Seq((1L, "abab cd"), (2L, ""), (3L, "cd abab"))
      .toDF("doc_id", "text")
    val ps = Unigram.fit(Seq("abab abab cd").toDF("text"), "text")
    val out = Unigram.encodeDigest(docs, "doc_id", "text", ps)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2L) // [abab] [cd]
    assert(out(1).getLong(1) == 0L)
    assert(out(2).getLong(1) == 2L)
    assert(out(0).getString(2) != out(2).getString(2))
  }
}
