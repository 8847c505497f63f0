package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram language-model tokenizer (Kudo 2018, "Subword
  * Regularization", arXiv:1804.10959 — the SentencePiece unigram
  * algorithm), completing the engine's subword-tokenizer triad next to
  * [[Bpe]] and [[WordPiece]]:
  *
  *   1. SEED a candidate vocabulary from the most frequent substrings
  *      (every substring of length 1..[[MaxPieceChars]] over the
  *      weighted distinct-word table; ALL single characters kept for
  *      coverage plus the top [[SeedMultiPieces]] longer pieces).
  *   2. EM over segmentations: the E-step segments every distinct word
  *      with the current piece costs and re-counts pieces from the
  *      winning segmentations; the M-step re-derives costs from the
  *      counts. This is the HARD-EM (Viterbi) variant — Kudo's
  *      published E-step sums expected counts over ALL segmentations
  *      with float forward-backward, which no cross-engine oracle can
  *      replay bit-exactly; Viterbi counts keep every step exact
  *      integer arithmetic (the trade is documented, not hidden; the
  *      same algorithm family SentencePiece exposes for final
  *      segmentation).
  *   3. PRUNE to the target vocabulary: all single characters (full
  *      coverage, as SentencePiece requires) plus the top
  *      [[VocabMultiPieces]] longer pieces by EM count.
  *
  * Determinism / oracle replay: piece costs are integer "milli-bits",
  * cost(p) = mb1024(N + V) − mb1024(cnt_p + 1) with Laplace smoothing
  * (the engine's established surprisal convention), where mb1024(x) is
  * a FIXED-POINT floor(1024·log2 x): exponent from the binary digit
  * count, a 10-round square-and-shift fraction over a 30-bit mantissa
  * — every operation integer, so Scala, Spark and DuckDB compute the
  * same digits (a float log2 differs in the last ulp across libms and
  * would flip Viterbi argmins). Viterbi ties break by the
  * lexicographically least (cost, token-list) pair in binary string
  * order — identical struct/list ordering in Spark and DuckDB.
  *
  * Scale shape: the corpus is touched once (the distinct-word count);
  * seeding and E-steps are hash aggregates over the vocabulary-sized
  * word table; every collect is model-sized (the seed and the piece
  * counts, bounded by seed size); the Viterbi fold runs once per
  * DISTINCT word. Encoding is the [[TokenDigest]] shape — the corpus
  * text never folds and never shuffles.
  */
object Unigram {

  /** One vocabulary piece: rank, the piece, its (weighted, hard-EM)
    * count, and its integer milli-bit cost. */
  final case class Piece(rank: Int, piece: String, n: Long, costMb: Long)

  /** Longest candidate piece, in characters. */
  val MaxPieceChars = 6

  /** Multi-character pieces kept at seeding (plus all single chars). */
  val SeedMultiPieces = 256

  /** Multi-character pieces kept after EM pruning (plus all chars). */
  val VocabMultiPieces = 128

  /** Token emitted for a character absent from the vocabulary (the
    * persisted-vocab encode path on unseen text). */
  val UnkToken = "<unk>"

  /** Milli-bit cost of one [[UnkToken]]: 2^40 mb. Any real piece costs
    * < 2^16 mb (mb1024 tops out near 64·1024 at Long range), so a word
    * of length L has a real-path cost < L·2^16 — for any L < 2^24 the
    * UNK fallback strictly loses to every vocabulary path and the
    * in-vocabulary segmentation is bit-identical to the fold without
    * it. */
  val UnkCostMb: Long = 1L << 40

  /** Fixed-point floor(1024 * log2(x)) for x >= 1: exponent e =
    * bit-length − 1, then ten square-and-shift rounds on the 30-bit
    * normalized mantissa emit the 10 fraction bits. Pure integer ops —
    * the DuckDB oracle replays the identical rounds. */
  def mb1024(x: Long): Long = {
    require(x >= 1, s"mb1024 domain is x >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e > 30) x >> (e - 30) else x << (30 - e)
    var frac = 0L
    var i = 0
    while (i < 10) {
      m = (m * m) >> 30
      if (m >= 2147483648L) { frac = frac * 2 + 1; m >>= 1 }
      else frac = frac * 2
      i += 1
    }
    e.toLong * 1024 + frac
  }

  /** Laplace-smoothed milli-bit cost of a piece with count `cnt` in a
    * vocabulary of `v` pieces totalling `total` occurrences. */
  def costMb(cnt: Long, total: Long, v: Long): Long =
    mb1024(total + v) - mb1024(cnt + 1)

  /** All substrings of length 1..[[MaxPieceChars]] of a word. */
  def substrings(word: Column): Column =
    flatten(transform(sequence(lit(1), length(word)), p =>
      transform(sequence(lit(1), least(lit(MaxPieceChars),
          length(word) - p + 1)),
        l => word.substr(p, l))))

  /** Viterbi (min-cost) segmentation of one word against driver-held
    * piece costs: a DP fold over character positions — the state list
    * carries, per position, the best (cost, tokens) struct; candidates
    * at position i are the vocabulary pieces ending there (length
    * 1..[[MaxPieceChars]]); ties break by the least (cost, tokens)
    * struct. A character ABSENT from the vocabulary (possible only on
    * the [[fromDF]] persisted-vocab encode path over a new corpus —
    * seeding keeps every training char) takes the explicit
    * [[UnkToken]] fallback at [[UnkCostMb]]: the fallback consumes one
    * character and costs strictly more than any real segmentation, so
    * it is chosen ONLY where no vocabulary path exists — in-vocabulary
    * words segment bit-identically with or without it, and
    * out-of-vocabulary input yields a visible `<unk>` in the digest
    * instead of a silently-skipped null (r18 ADVICE). */
  def viterbiTokens(word: Column, costs: Map[String, Long]): Column = {
    val keys = costs.keys.toArray.sortWith(Bpe.Utf8Order.lt)
    val vals = keys.map(costs)
    val cmap = map_from_arrays(lit(keys), lit(vals))
    val zero = array(struct(lit(0L).as("c"),
      array().cast("array<string>").as("t")))
    val folded = aggregate(sequence(lit(1), length(word)), zero,
      (acc, i) => {
        val cands = (1 to MaxPieceChars).map { l =>
          val piece = word.substr(i - l + 1, lit(l))
          val c = try_element_at(cmap, piece)
          val prev = element_at(acc, i - l + 1)
          when(i >= l && c.isNotNull && prev.isNotNull,
            struct((prev.getField("c") + c).as("c"),
              concat(prev.getField("t"), array(piece)).as("t")))
        }
        // Explicit-UNK fallback: consumes one character at a cost no
        // vocabulary path can reach, so least() picks it only when
        // every real candidate is null (OOV character).
        val prev1 = element_at(acc, i)
        val unk = when(prev1.isNotNull,
          struct((prev1.getField("c") + lit(UnkCostMb)).as("c"),
            concat(prev1.getField("t"), array(lit(UnkToken))).as("t")))
        concat(acc, array(least(cands :+ unk: _*)))
      })
    element_at(folded, -1).getField("t")
  }

  /** Hard-EM E-step: Viterbi-segment every distinct word (weighted by
    * its corpus count) and re-count pieces from the winning
    * segmentations. Result is bounded by the vocabulary size. */
  private def viterbiCounts(words: DataFrame,
                            costs: Map[String, Long]): Map[String, Long] =
    words
      .select(col("n"), explode(viterbiTokens(col("w"), costs)).as("p"))
      .groupBy("p").agg(sum("n").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Weighted distinct-word table of a corpus — the ONLY corpus-scale
    * reduction either trainer runs. */
  private def wordTable(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Substring-seeded candidate counts: (all single chars, top
    * [[SeedMultiPieces]] longer pieces by (count desc, UTF-8 piece)). */
  private def seedCounts(words: DataFrame)
      : (Seq[(String, Long)], Seq[(String, Long)]) = {
    val subs = words
      .select(col("n"), explode(substrings(col("w"))).as("p"))
      .groupBy("p").agg(sum("n").as("cnt"))
    val chars = subs.filter(length(col("p")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val multi = subs.filter(length(col("p")) > 1)
      .orderBy(col("cnt").desc, col("p")).limit(SeedMultiPieces)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    (chars, multi)
  }

  private def byCountThenPiece(a: (String, Long), b: (String, Long)): Boolean =
    if (a._2 != b._2) a._2 > b._2 else Bpe.Utf8Order.lt(a._1, b._1)

  /** Rank + re-cost a kept vocabulary into the final [[Piece]] list. */
  private def rankPieces(kept: Seq[(String, Long)]): Seq[Piece] = {
    val total = kept.map(_._2).sum
    val v = kept.size.toLong
    kept.sortWith(byCountThenPiece).zipWithIndex
      .map { case ((p, c), i) => Piece(i + 1, p, c, costMb(c, total, v)) }
  }

  /** Train the unigram vocabulary: seed, one hard-EM round, prune,
    * final costs. Returns pieces ranked by (EM count desc, piece) in
    * binary string order. The bit-frozen 1-round path — the iterated
    * prune schedule Kudo 2018 runs is [[fitIterated]]. */
  def fit(corpus: DataFrame, textCol: String): Seq[Piece] = {
    val words = wordTable(corpus, textCol).persist()
    try {
      val (chars, multi) = seedCounts(words)
      val seed = (chars ++ multi).toMap
      val total0 = seed.valuesIterator.sum
      val v0 = seed.size.toLong
      val costs0 = seed.map { case (p, c) => p -> costMb(c, total0, v0) }
      // E-step with seed costs, then prune: all chars stay (coverage),
      // top multi-char pieces by EM count survive
      val em = viterbiCounts(words, costs0)
      val keptChars = chars.map { case (p, _) => p -> em.getOrElse(p, 0L) }
      // Codepoint length, not UTF-16 units: Spark length() and DuckDB
      // len() both count codepoints, and the seed's chars list is
      // codepoint-split — a Java-length filter would double-list a
      // supplementary-plane character in keptChars AND keptMulti.
      val keptMulti = em.toSeq
        .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
        .sortWith(byCountThenPiece)
        .take(VocabMultiPieces)
      rankPieces(keptChars ++ keptMulti)
    } finally { words.unpersist(); () }
  }

  /** Kudo 2018's training loop proper: EM rounds interleaved with a
    * PRUNE SCHEDULE — after each E-step the multi-piece set shrinks to
    * 3/4 of its cap (floored at `targetMulti`; the final round prunes
    * to exactly `targetMulti`), and the next round's piece costs are
    * re-derived from the SURVIVORS' counts, so a piece that only
    * looked good against the bloated seed vocabulary loses its
    * segmentations to re-costed competitors before the final cut —
    * the behavior a single-round prune cannot express. Every step is
    * the same integer arithmetic as [[fit]] (mb1024 costs, UTF-8 tie
    * order, codepoint lengths), so a DuckDB oracle replays all rounds
    * digit-for-digit; `fitIterated(c, t, rounds = 1)` is bit-identical
    * to [[fit]] (spec-pinned). Per-round work: one Viterbi E-step over
    * the distinct-word table (vocabulary-sized) — the corpus is still
    * touched exactly once, by [[wordTable]]. */
  def fitIterated(corpus: DataFrame, textCol: String, rounds: Int = 3,
                  targetMulti: Int = VocabMultiPieces): Seq[Piece] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(targetMulti >= 0, s"targetMulti must be >= 0, got $targetMulti")
    val words = wordTable(corpus, textCol).persist()
    try {
      val (chars, multi) = seedCounts(words)
      var charCounts = chars
      var keptMulti = multi
      var kCap = SeedMultiPieces
      for (r <- 1 to rounds) {
        val current = charCounts ++ keptMulti
        val total = current.map(_._2).sum
        val v = current.size.toLong
        val costs = current.map { case (p, c) =>
          p -> costMb(c, total, v) }.toMap
        val em = viterbiCounts(words, costs)
        // 3/4 is Kudo's published shrinking factor (SentencePiece's
        // --shrinking_factor default 0.75, integer-floored here so the
        // oracle replays the schedule exactly): each intermediate round
        // keeps 75% of the cap, the last round cuts to the target
        kCap = if (r == rounds) targetMulti
               else math.max(targetMulti, (kCap * 3) / 4)
        charCounts = charCounts.map { case (p, _) =>
          p -> em.getOrElse(p, 0L) }
        keptMulti = em.toSeq
          .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
          .sortWith(byCountThenPiece)
          .take(kCap)
      }
      rankPieces(charCounts ++ keptMulti)
    } finally { words.unpersist(); () }
  }

  /** The learned vocabulary as a flat DataFrame (persist/audit). */
  def piecesDF(spark: SparkSession, pieces: Seq[Piece]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        pieces.map(p => Row(p.rank, p.piece, p.n, p.costMb)), 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("piece", StringType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("cost_mb", LongType, nullable = false))))

  /** Reload a persisted [[piecesDF]] into driver state — the round-trip
    * that lets a later session segment against a learned vocabulary
    * WITHOUT refitting ([[Bpe.fromDF]]'s contract). */
  def fromDF(pieces: DataFrame): Seq[Piece] = {
    val rows = pieces.select("rank", "piece", "n", "cost_mb").collect()
    require(rows.nonEmpty, "empty piece table")
    rows.map(r => Piece(r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3))).sortBy(_.rank).toSeq
  }

  /** Per-doc Viterbi encode at corpus scale ([[TokenDigest]] shape):
    * token count + md5 digest of the ordered token stream per doc. */
  def encodeDigest(corpus: DataFrame, idCol: String, textCol: String,
                   pieces: Seq[Piece]): DataFrame =
    TokenDigest.of(corpus, idCol, textCol, "n_uni", "uni_md5",
      viterbiTokens(_, pieces.map(p => p.piece -> p.costMb).toMap))
}
