package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics for training-data curation: repetition
  * signals (the Gopher-style "repetitious document" filters) and TF-IDF
  * salient-term extraction.
  *
  * These are DataFrame-level operators (they aggregate across tokens and
  * across the corpus), unlike the per-row Column expressions in
  * [[TextAnalysis]]. Both are engine extensions beyond the reference
  * (which has no text analytics) per the engine brief.
  *
  * Scale design: every aggregation is an explode + hash-aggregate on
  * `(doc, gram)` / `(term)` keys — map-side partial aggregation applies,
  * and nothing ever materializes a per-document map on the driver. The
  * per-document top-k uses `row_number` over a per-doc window, which Spark
  * plans as WindowGroupLimit (top-k pushdown) rather than a full sort.
  */
object Corpus {

  /** Token n-grams as a space-joined string array; empty array when the
    * document has fewer than `n` tokens (guards Spark's `sequence`, which
    * would otherwise count DOWN for start > stop). */
  def ngrams(toks: Column, n: Int): Column = {
    // the token array is bound as a lambda variable: an index-driven HOF
    // lambda re-evaluates invariant subtrees per element, so a caller
    // passing a computed `toks` expression would re-run it once per
    // n-gram (the Dedup.wordShingles lesson)
    val grams = element_at(transform(array(toks), ts =>
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ts, i + j)): _*))), 1)
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition signals per document:
    *   - `top2gram_frac`: occurrences of the single most frequent word
    *     2-gram over total 2-grams — boilerplate and template spam score
    *     high;
    *   - `dup3gram_frac`: fraction of 3-gram occurrences whose 3-gram
    *     appears more than once — near-loop text scores high.
    * Documents with fewer than 3 tokens are dropped (no 3-gram exists).
    * Two explode→hash-agg passes joined on the doc key; candidate
    * fractions are rounded to 6 digits (portable across engines).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 3)

    def gramCounts(n: Int): DataFrame = base
      .select(col(idCol), explode(ngrams(col("__toks"), n)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__n"))

    val top2 = gramCounts(2)
      .groupBy(idCol).agg(max("__n").as("__mx"), sum("__n").as("__tot"))
      .select(col(idCol), round(col("__mx") / col("__tot"), 6).as("top2gram_frac"))
    val dup3 = gramCounts(3)
      .groupBy(idCol).agg(
        sum(when(col("__n") > 1, col("__n")).otherwise(0L)).as("__dup"),
        sum("__n").as("__tot"))
      .select(col(idCol), round(col("__dup") / col("__tot"), 6).as("dup3gram_frac"))
    top2.join(dup3, idCol)
  }

  /** The COMPLETE Gopher n-gram repetition table (Rae et al. 2021,
    * App. A1.2, Table A1): per document, the TOP-n-gram fraction for
    * n = 2, 3, 4 (occurrences of the single most frequent n-gram over
    * total n-grams; thresholds 0.20 / 0.18 / 0.16) and the
    * DUP-n-gram fraction for n = 5..10 (occurrences of n-grams seen
    * more than once, over total; thresholds 0.15 / 0.14 / 0.13 / 0.12 /
    * 0.11 / 0.10). [[repetitionSignals]] keeps the classic 2/3 pair;
    * this emits all nine signals plus their verdicts and the combined
    * `rep_all_ok` (Gopher discards a doc if ANY signal exceeds its
    * threshold). Verdicts are integer cross-multiplications
    * (`stat·100 ≤ total·thr100`), fractions rounded to 6 digits.
    *
    * Scale shape: ONE tagged explode of all nine n-gram streams (the
    * 2..10 windows are built per-row — the Σn ≈ 54-token-per-position
    * concat cost is map-side CPU, which is what computing the published
    * table costs anywhere), then three hash aggregates — (id, n, gram)
    * count, (id, n) roll-up, (id) conditional pivot — all map-side
    * partial; the only join is the doc-id spine (every input doc keeps
    * a row; a doc with fewer than n tokens has no n-grams and its
    * verdict is vacuously TRUE with a NULL fraction). */
  def gopherNgramSignals(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val ns = 2 to 10
    val topThr = Map(2 -> 20, 3 -> 18, 4 -> 16)
    val dupThr = Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)
    val toks = TextAnalysis.tokens(col(textCol))
    val tagged = flatten(array(ns.map(n =>
      transform(ngrams(toks, n),
        g => struct(lit(n).as("n"), g.as("g")))): _*))
    val perGram = df
      .select(col(idCol), explode(tagged).as("__x"))
      .select(col(idCol), col("__x.n").as("__n"), col("__x.g").as("__g"))
      .groupBy(col(idCol), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val perN = perGram.groupBy(col(idCol), col("__n"))
      .agg(max("__c").as("__mx"), sum("__c").as("__tot"),
        sum(when(col("__c") > 1, col("__c")).otherwise(0L)).as("__dup"))
    def statFor(n: Int, c: String) = max(when(col("__n") === n, col(c)))
    def kindOf(n: Int) = if (n <= 4) "top" else "dup"
    val sigCols = ns.flatMap { n =>
      val stat = if (n <= 4) "__mx" else "__dup"
      val thr = if (n <= 4) topThr(n) else dupThr(n)
      Seq(
        round(statFor(n, stat) / statFor(n, "__tot"), 6)
          .as(s"${kindOf(n)}${n}gram_frac"),
        (coalesce(statFor(n, stat), lit(0L)) * 100 <=
          coalesce(statFor(n, "__tot"), lit(0L)) * thr)
          .as(s"${kindOf(n)}${n}gram_ok"))
    }
    val sig = perN.groupBy(col(idCol)).agg(sigCols.head, sigCols.tail: _*)
    val okNames = ns.map(n => s"${kindOf(n)}${n}gram_ok")
    val outCols = col(idCol) +:
      (ns.map(n => col(s"${kindOf(n)}${n}gram_frac")) ++
        okNames.map(c => coalesce(col(c), lit(true)).as(c)) :+
        okNames.map(c => coalesce(col(c), lit(true)))
          .reduce(_ && _).as("rep_all_ok"))
    df.select(col(idCol)).join(sig, Seq(idCol), "left")
      .select(outCols: _*)
  }

  /** Gopher line-repetition signals (Rae et al. 2021, App. A1.2 — the
    * LINE-level complement of [[repetitionSignals]]'s n-gram rules):
    * per document,
    *   - `dup_line_frac`: line occurrences BEYOND the first of their
    *     value, over total non-empty lines (threshold 0.30 in the
    *     paper);
    *   - `dup_char_frac`: characters in those beyond-first occurrences
    *     over total line characters (threshold 0.20).
    * Both verdicts are integer cross-multiplications. Exactly one
    * (id, line)-keyed hash aggregate then one id-keyed roll-up — the
    * partials collapse map-side, nothing else shuffles, and the line
    * text itself never leaves the first aggregate. */
  def lineRepetitionSignals(df: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val perLine = df
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__l"))
      .where(length(col("__l")) > 0)
      .groupBy(idCol, "__l").agg(count(lit(1)).as("__n"))
    val sig = perLine.groupBy(idCol).agg(
        sum("__n").as("__tot"),
        sum(col("__n") - 1).as("__dup"),
        sum(col("__n") * length(col("__l"))).as("__totc"),
        sum((col("__n") - 1) * length(col("__l"))).as("__dupc"))
      .select(col(idCol), col("__tot").as("n_lines"),
        round(col("__dup") / col("__tot"), 6).as("dup_line_frac"),
        round(col("__dupc") / col("__totc"), 6).as("dup_char_frac"),
        (col("__dup") * 10L <= col("__tot") * 3L).as("dup_line_ok"),
        (col("__dupc") * 10L <= col("__totc") * 2L).as("dup_char_ok"))
    // EVERY input doc gets a row: a doc with no nonempty lines has no
    // line-explode output, and an aggregate-only shape would silently
    // drop it from the signal frame (a gate joining on these signals
    // would then drop the doc for the wrong reason). Degenerate docs
    // carry n_lines=0, NULL fractions (0/0 is undefined, not 0), and
    // vacuously-true rule verdicts (0 duplicated of 0).
    df.select(col(idCol)).join(sig, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        col("dup_line_frac"), col("dup_char_frac"),
        coalesce(col("dup_line_ok"), lit(true)).as("dup_line_ok"),
        coalesce(col("dup_char_ok"), lit(true)).as("dup_char_ok"))
  }

  /** C4-style inter-document line deduplication (Raffel et al. 2020,
    * arXiv:1910.10683 §2.2: lines occurring more than once in the corpus
    * are boilerplate — nav bars, cookie banners, license footers — and
    * are removed from EVERY document, unlike within-doc repetition which
    * [[lineRepetitionSignals]] only scores). A line is stripped iff its
    * corpus-wide occurrence count exceeds `maxOccurrences`; surviving
    * lines are reassembled in their original order.
    *
    * Every input doc keeps a row: a doc whose every line is boilerplate
    * comes back with empty text and n_kept = 0 (the downstream length
    * gate is where it dies, with provenance — not a silent drop here).
    *
    * EMPTY lines are never boilerplate candidates: blank paragraph
    * separators recur across essentially every real document, so an
    * unguarded count would push "" over any threshold and strip every
    * blank line corpus-wide, collapsing paragraph structure — C4-family
    * line dedup excludes empty lines from the repeated set for exactly
    * this reason. Blank lines always survive in place.
    *
    * Scale shape: posexplode → line-keyed count (map-side partial) →
    * the REPEATED subset only (count > max — for real corpora orders of
    * magnitude smaller than distinct lines, and the natural broadcast
    * side) → left-anti join of the exploded lines against it → per-doc
    * array_agg re-assembly (one hash exchange on the doc id). The
    * repeated-line key is intrinsically skewed (that is what makes it
    * boilerplate) — the anti-join probes, never groups, on it, so the
    * skew lands on AQE's join-skew handling, not on a hot reducer.
    * Reassembly order rides struct(pos, line) array_sort, not a window —
    * no per-doc sort partition needed. */
  def stripRepeatedLines(df: DataFrame, idCol: String, textCol: String,
                         maxOccurrences: Long = 1L): DataFrame = {
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__l")))
    // empty lines filtered BEFORE the count (cheaper) — they can never
    // enter the repeated set, so the anti-join below always keeps them
    val repeated = lines.filter(length(col("__l")) > 0)
      .groupBy("__l")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxOccurrences)
      .select("__l")
    val kept = lines.join(repeated, Seq("__l"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__l")))),
          s => s("__l")), "\n").as("text_clean"))
    df.select(col(idCol),
        (size(split(col(textCol), "\n"))).cast("long").as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Multinomial Naive Bayes text classifier, trained AND applied
    * in-engine — the classifier stage of a CCNet-style curation pipeline
    * (there a fasttext model; here the same bag-of-words decision rule)
    * — in EXACT integer bits, no libm anywhere:
    *
    *   bits_c(t)  = floor(log2((N_c + V) DIV (cnt_{t,c} + 1)))   (token
    *                surprisal under class c, add-one smoothing over the
    *                GLOBAL vocabulary — unseen (t, c) pairs get the
    *                full N_c + V surprisal, never an infinity)
    *   prior_c    = floor(log2((D + C) DIV (d_c + 1)))
    *   score_c(doc) = prior_c + Σ_t cnt_doc(t) · bits_c(t)
    *   predicted  = argmin_c score_c, ties by class name ascending
    *
    * floor(log2(x)) is bin-string length − 1 — the [[unigramSurprisal]]
    * trick — so training and inference replay bit-identically in any
    * engine. Scale shape: two hash-aggregates over the exploded token
    * stream ((class, token) and (id, token), both map-side partial), a
    * C-row class-totals broadcast crossed with the distinct vocabulary
    * to keep unseen pairs (V×C rows — C is small), a token-keyed join of
    * collapsed per-doc counts against the weight table, and a (doc)
    * struct-min for the argmin. The corpus text never shuffles. */
  def naiveBayesClassify(df: DataFrame, idCol: String, textCol: String,
                         classCol: String): DataFrame = {
    val (weights, priors) = nbWeightsAndPriors(df, idCol, textCol, classCol)
    nbApply(df, idCol, textCol, weights, priors)
  }

  /** The trained NB model as ONE flat frame — the audit/persist format
    * (the [[graft.ops.KMeans.centroidsDF]] / [[Bpe.mergesDF]] convention:
    * fit once, store, reload in a later session and classify without the
    * training corpus). Token rows carry (cls, tok, bits); the C prior
    * rows carry (cls, NULL, prior_bits) — `tok IS NULL` is the
    * discriminator, safe because [[graft.ops.TextAnalysis.tokens]] never
    * yields a NULL token. */
  def nbModelDF(df: DataFrame, idCol: String, textCol: String,
                classCol: String): DataFrame = {
    val (weights, priors) = nbWeightsAndPriors(df, idCol, textCol, classCol)
    weights.select(col("__cls").as("cls"), col("tok"),
        col("__bits").as("bits"))
      .unionByName(priors.select(col("__cls").as("cls"),
        lit(null: String).as("tok"), col("__prior").as("bits")))
  }

  /** Classify with a persisted/reloaded [[nbModelDF]] frame: predictions
    * are bit-identical to the fitting session's (integer bits at rest,
    * nothing lossy in the round-trip). */
  def nbClassify(df: DataFrame, idCol: String, textCol: String,
                 model: DataFrame): DataFrame = {
    val weights = model.filter(col("tok").isNotNull)
      .select(col("cls").as("__cls"), col("tok"), col("bits").as("__bits"))
    val priors = model.filter(col("tok").isNull)
      .select(col("cls").as("__cls"), col("bits").as("__prior"))
    nbApply(df, idCol, textCol, weights, priors)
  }

  /** Training halves of the NB surface: the (cls, tok, bits) weight
    * table and the (cls, prior_bits) priors, shared by the one-shot
    * classifier and the persist path so the smoothing arithmetic has
    * exactly one owner. */
  private def nbWeightsAndPriors(df: DataFrame, idCol: String,
                                 textCol: String, classCol: String)
      : (DataFrame, DataFrame) = {
    val toks = df.select(col(idCol), col(classCol).as("__cls"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val classCounts = toks.groupBy("__cls", "tok")
      .agg(count(lit(1)).as("__cnt"))
    val classTotals = toks.groupBy("__cls").agg(count(lit(1)).as("__nc"))
    val docTotals = df.groupBy(col(classCol).as("__cls"))
      .agg(count(lit(1)).as("__dc"))
    val globals = df.agg(count(lit(1)).as("__d"),
      countDistinct(col(classCol)).as("__c"))
    // vocabulary and V both derive from the ALREADY-AGGREGATED
    // (class, token) counts — the raw exploded stream is scanned only
    // by the two hash-aggregates above, never re-distincted
    val vocabToks = classCounts.select("tok").distinct()
    val vocab = vocabToks
      .crossJoin(broadcast(vocabToks.agg(count(lit(1)).as("__v"))))
    val weights = vocab
      .crossJoin(broadcast(classTotals))
      .join(classCounts, Seq("__cls", "tok"), "left")
      .select(col("__cls"), col("tok"),
        (length(bin(expr("(__nc + __v) DIV (coalesce(__cnt, 0L) + 1)"))) - 1)
          .cast("long").as("__bits"))
    val priors = docTotals.crossJoin(broadcast(globals))
      .select(col("__cls"),
        (length(bin(expr("(__d + __c) DIV (__dc + 1)"))) - 1)
          .cast("long").as("__prior"))
    (weights, priors)
  }

  /** Inference half: per-doc token counts against the weight table, the
    * struct-min argmin, and the empty-doc fallback — a doc whose text
    * yields zero tokens has score_c = prior_c for every class, so it
    * gets the PRIOR-ONLY argmin (ties by class name) instead of silently
    * vanishing from the output. */
  private def nbApply(df: DataFrame, idCol: String, textCol: String,
                      weights: DataFrame, priors: DataFrame): DataFrame = {
    val docTok = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("__n"))
    val scores = docTok.join(weights, Seq("tok"))
      .groupBy(col(idCol), col("__cls"))
      .agg(sum(col("__n") * col("__bits")).as("__s"))
      .join(broadcast(priors), Seq("__cls"))
      .select(col(idCol), col("__cls"), (col("__s") + col("__prior")).as("__score"))
    val best = scores.groupBy(idCol)
      .agg(min(struct(col("__score"), col("__cls"))).as("__best"))
    val priorBest = priors
      .agg(min(struct(col("__prior"), col("__cls"))).as("__pb"))
    df.select(col(idCol)).join(best, Seq(idCol), "left")
      .crossJoin(broadcast(priorBest))
      .select(col(idCol),
        coalesce(col("__best.__cls"), col("__pb.__cls")).as("predicted"),
        coalesce(col("__best.__score"), col("__pb.__prior")).as("score_bits"))
  }

  /** CCNet's head/middle/tail quality split (Wenzek et al. 2020,
    * arXiv:1911.00359 §4.3: rank documents by LM perplexity and cut the
    * corpus into equal thirds — "head" is the cleanest text, "tail" the
    * noisiest; pre-training recipes then keep head+middle or reweight).
    * Perplexity is [[unigramSurprisal]]'s exact integer
    * `bits_x1000_per_tok`; a doc lands in `head` iff its value is at or
    * below the first tercile cutoff, `middle` up to the second, `tail`
    * above.
    *
    * The cutoffs are EXACT percentiles computed scale-cleanly: the
    * per-doc score is a bounded small integer, so its full histogram is
    * a tiny aggregate (distinct-value-count rows, thousands at most —
    * never doc-count), cumulated on the driver; the k-th cutoff is the
    * smallest value whose cumulative count reaches ceil(k·n/3). No
    * global sort, no approx_percentile nondeterminism — the same
    * histogram trick replays in any engine. Bucketing is then a
    * map-side CASE. Empty docs are absent (the [[unigramSurprisal]]
    * contract — nothing to score).
    *
    * The histogram-size bound holds BECAUSE `bits_x1000_per_tok` is a
    * quantized small integer (milli-bits/token: surprisal < 63 bits/tok,
    * so < 63000 distinct values at any corpus size). Swapping in an
    * unquantized float score would break the bound — re-quantize first.
    *
    * The scored frame is localCheckpointed (eager) before the histogram
    * collect: the surprisal pipeline is corpus-scale (token explode,
    * corpus-wide counts, per-doc join), and without the cut every
    * consumer of the returned frame would run it a SECOND time — the
    * funnel lineage discipline applied at the operator boundary. */
  def perplexityBuckets(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val scored = unigramSurprisal(df, idCol, textCol).localCheckpoint()
    val hist = scored.groupBy("bits_x1000_per_tok")
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    if (hist.isEmpty) // empty corpus: nothing to rank, nothing to return
      return scored.withColumn("bucket", lit(null: String))
    val total = hist.map(_._2).sum
    def cutoff(target: Long): Long = {
      var c = 0L
      hist.find { case (_, n) => c += n; c >= target }
        .map(_._1).getOrElse(hist.last._1)
    }
    val c1 = cutoff((total + 2) / 3)
    val c2 = cutoff((2 * total + 2) / 3)
    scored.withColumn("bucket",
      when(col("bits_x1000_per_tok") <= c1, "head")
        .when(col("bits_x1000_per_tok") <= c2, "middle")
        .otherwise("tail"))
  }

  /** Top-k salient terms per document by TF-IDF, with a RATIONAL idf
    * (N/df instead of ln(N/df)) scaled to parts-per-million:
    *
    *   score_ppm = floor(cnt * 1e6 * N / (total_doc_tokens * df))
    *
    * The rational form keeps the entire score in exact integer/IEEE-double
    * arithmetic (numerator < 2^52), so the ranking — and the score itself —
    * is bit-identical in any engine; ln() differs in the last ulp across
    * libm implementations and would make cross-engine top-k flaky. Ties
    * break on the term string.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__cnt"))
    val totals = tf.groupBy(col(idCol)).agg(sum("__cnt").as("__total"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val nDocs = df.select(col(idCol)).agg(count(lit(1)).as("__n_docs"))

    val scored = tf
      .join(totals, idCol)
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_ppm",
        floor(col("__cnt") * lit(1000000L) * col("__n_docs") /
          (col("__total") * col("__df"))))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_ppm").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("score_ppm"))
  }

  /** Frequency-ranked vocabulary: the `topK` most frequent tokens with
    * contiguous ids 1..topK (rank by count desc, token asc — fully
    * deterministic). The global top-K is a TakeOrdered (scales: partial
    * top-K per partition, K-row merge on the driver-side reducer); the
    * row_number that assigns ids runs on those K rows ONLY, so the
    * single-partition window is bounded by K, never by corpus size. */
  def vocabulary(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val counts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topK)
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
  }

  /** Tokenize documents to vocabulary ids — the text -> tensor step a
    * training pipeline runs last: (id, pos, token_id) per token in
    * document order, out-of-vocabulary tokens mapped to 0 (the
    * conventional UNK id). One generate + one broadcast join against the
    * K-row vocabulary; the corpus never shuffles. */
  def tokenizeToIds(df: DataFrame, idCol: String, textCol: String,
                    vocab: DataFrame): DataFrame =
    df.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(0)).as("token_id"))

  /** CCNet-style unigram language-model quality score: per document, the
    * total and per-token SURPRISAL under a unigram LM trained on the
    * corpus itself — the perplexity-proxy statistic CCNet (Wenzek et al.
    * 2020) filters crawl text with (perplexity = 2^(bits/token); low
    * bits/token ⇒ head-like fluent text, high ⇒ gibberish/rare-token
    * soup).
    *
    * Engine-portable by construction: instead of `-log2(p)` (whose libm
    * last-ulp behavior differs across engines), the per-token surprisal is
    * the EXACT integer `floor(log2((N + V) DIV (cnt + 1)))` — the bit
    * length minus one of the Laplace-smoothed inverse probability ratio,
    * computed as `length(bin(r)) - 1` (no floating point anywhere; DuckDB
    * reproduces it digit-for-digit). Per document:
    *
    *   bits               = Σ cnt_doc(tok) * surprisal(tok)   — exact int64
    *   bits_x1000_per_tok = (1000 * bits) DIV n_toks          — the filter
    *                        statistic, in milli-bits/token
    *
    * Documents with zero tokens have no LM evidence and produce no row.
    *
    * Scale shape: identical to [[importanceWeights]] — two hash-aggregates
    * over the exploded token stream ((token) and (doc, token) keys, both
    * map-side partial), a 2-long broadcast of the totals, and a
    * token-keyed join of per-doc counts against the surprisal table
    * (auto-broadcast for small vocabularies; per-doc counts are already
    * collapsed, so stopword skew is bounded by distinct docs). The int64
    * bound is generous: surprisal < 63 bits, so `bits` overflows only
    * past ~10^17 tokens in one document. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("__cnt"))
    val totals = counts.agg(sum("__cnt").as("__n"), count(lit(1)).as("__v"))
    val surprisal = counts.crossJoin(broadcast(totals))
      .select(col("tok"),
        (length(bin(expr("(__n + __v) DIV (__cnt + 1)"))) - 1)
          .cast("long").as("__bits"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__cnt"))
      .join(surprisal, "tok")
      .groupBy(col(idCol))
      .agg(sum("__cnt").as("n_toks"),
        sum(col("__cnt") * col("__bits")).as("bits"))
      .withColumn("bits_x1000_per_tok", expr("(1000L * bits) DIV n_toks"))
  }

  /** DSIR-style importance weights for target-domain data selection
    * (Xie et al. 2023): score every document by how much its unigram
    * distribution favors a target subcorpus over the full corpus.
    *
    * Per token, with Laplace smoothing over the joint vocabulary V:
    *
    *   w_ppm(tok) = (1e6 * (cnt_target+1) * (N_corpus+V))
    *                  DIV ((cnt_corpus+1) * (N_target+V))
    *
    * i.e. the RATIO p_target/p_corpus in parts-per-million — the rational
    * surrogate of DSIR's per-token log-likelihood ratio (same per-token
    * ordering; ln() differs in the last ulp across libms and would make
    * the result engine-dependent, the same reason [[tfidfTopTerms]] uses
    * rational idf). Per document:
    *
    *   score_ppm     = sum(cnt_doc(tok) * w_ppm(tok))   — exact int64
    *   score_avg_ppm = score_ppm DIV n_toks             — length-normalized
    *
    * Scale shape: two hash-aggregates over the exploded token stream
    * ((token) and (doc, token) keys, both map-side partial), a 3-long
    * broadcast of the totals, and a token-keyed join of per-doc counts
    * against the weight table (auto-broadcast when the vocabulary is
    * small; a plain shuffle join on the token key otherwise — per-doc
    * counts are already collapsed, so stopword skew is bounded by
    * distinct docs, not token occurrences). Int64 holds exactly while
    * 1e6 * (N+V)^2-ish products stay under 2^63 — beyond that (corpora
    * past ~10^12 tokens) switch the weight computation to DECIMAL(38,0);
    * the per-doc sums remain int64-safe far longer.
    *
    * MEASURED DEAD END (round 22, do not re-try): deriving the (token)
    * stats FROM the (doc, token) aggregate — one tokenization subtree
    * instead of two — was 1.7-2x SLOWER end-to-end at bench scale on
    * this operator and on [[unigramSurprisal]] (same-window ITERS=7
    * mins, canary-flat): the extra two-level aggregate chain costs more
    * than the tokenization it saves, AQE's cross-branch exchange reuse
    * on the (doc, token) exchange proved run-dependent, and a lazy
    * localCheckpoint of the vocab table on top demoted the weight join.
    * The two-aggregate shape below is the measured optimum.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        targetPred: Column): DataFrame = {
    val toks = df.select(col(idCol), targetPred.as("__is_t"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val stats = toks.groupBy("tok").agg(
      count(lit(1)).as("__cnt_c"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("__cnt_t"))
    val totals = stats.agg(
      sum("__cnt_c").as("__n_c"), sum("__cnt_t").as("__n_t"),
      count(lit(1)).as("__v"))
    val weights = stats.crossJoin(broadcast(totals))
      .select(col("tok"), expr(
        """(1000000L * (__cnt_t + 1) * (__n_c + __v))
          | DIV ((__cnt_c + 1) * (__n_t + __v))""".stripMargin).as("__w_ppm"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__cnt"))
      .join(weights, "tok")
      .groupBy(col(idCol))
      .agg(sum("__cnt").as("n_toks"),
        sum(col("__cnt") * col("__w_ppm")).as("score_ppm"))
      .withColumn("score_avg_ppm", expr("score_ppm DIV n_toks"))
  }
}
