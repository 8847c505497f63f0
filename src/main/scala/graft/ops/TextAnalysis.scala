package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, language-ID heuristics, quality scoring, fingerprinting.
  *
  * These extend the reference (which has no text analytics) per the engine
  * brief; every operator is a pure Column expression — whole-stage codegen,
  * no UDFs, no shuffles — so they stream through a 100 TB `documents` scan
  * at full throughput and any filter on their outputs can still prune
  * columns at the parquet scan.
  */
object TextAnalysis {

  /** Whitespace-delimited tokens, lowercased. `\S+` extraction (rather than
    * split-on-`\s+`) avoids leading/trailing empty-string artifacts. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** BPE-ish subword count estimate: words + digit runs + punctuation marks
    * each count as a token boundary (cheap stand-in for a real tokenizer at
    * scan time; the point is the column-expression shape, not BPE fidelity). */
  def subwordCountEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{Punct}"), lit(0)))

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Count of tokens that appear in `words` (exact whole-token match). */
  def wordListCount(text: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(arr, t)))
  }

  // Language marker stopword lists (tiny n-gram-free heuristic).
  val EnStop = Seq("the", "and", "of", "to", "a", "in", "is", "that")
  val EsStop = Seq("el", "la", "de", "que", "y", "en", "los", "una")
  val FrStop = Seq("le", "la", "de", "et", "les", "des", "une", "est")
  val DeStop = Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit")

  def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))

  /** Heuristic language ID: CJK chars dominate, else argmax of per-language
    * stopword hits with a fixed tie-break order (en > es > fr > de), 'und'
    * when no marker fires. Deterministic, fully SQL-expressible (the DuckDB
    * oracle replicates the same CASE chain). */
  def langIdHeuristic(text: Column): Column = {
    val en = wordListCount(text, EnStop)
    val es = wordListCount(text, EsStop)
    val fr = wordListCount(text, FrStop)
    val de = wordListCount(text, DeStop)
    when(cjkCount(text) > 0, "zh")
      .when(en > 0 && en >= es && en >= fr && en >= de, "en")
      .when(es > 0 && es >= fr && es >= de, "es")
      .when(fr > 0 && fr >= de, "fr")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** Stopword ratio (English list): quality signal — natural prose has a
    * stable stopword density; keyword spam and boilerplate do not. */
  def stopwordRatio(text: Column): Column =
    wordListCount(text, EnStop).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  def meanWordLength(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double"))

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * word-length sanity. Thresholds are ordinary literals so Catalyst can
    * constant-fold and the whole thing stays in one codegen stage. */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(20, 20000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val wordOk = when(meanWordLength(text).between(2.0, 14.0), 1.0).otherwise(0.0)
    (lenOk + punctOk + wordOk) / 3.0
  }

  /** The integer numerator of [[qualityScore]] — how many of the three
    * rules pass (0..3). Survivor selection keys on THIS form: the
    * order is integer-exact in any engine (no division in the sort
    * key), so a cross-engine oracle replays argmax ties digit-free. */
  def qualityRuleCount(text: Column): Column =
    when(length(text).between(20, 20000), 1).otherwise(0) +
      when(punctRatio(text) < 0.2, 1).otherwise(0) +
      when(meanWordLength(text).between(2.0, 14.0), 1).otherwise(0)

  /** The eight words Gopher's rule 7 requires at least two of. */
  val GopherRequiredWords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality rules (Rae et al. 2021, arXiv:2112.11446, App. A1.1)
    * as a struct of per-rule booleans plus the conjunction — the published
    * heuristic filter suite for web-scale pre-training corpora:
    *   1. word count in [50, 100000];
    *   2. mean word length in [3, 10] characters;
    *   3. symbol-to-word ratio <= 0.1 for EACH of '#' and '...'
    *      separately (the paper applies the ratio per symbol, not to
    *      their sum);
    *   4. <= 90% of lines start with a bullet ('-', '*', '•') — the
    *      paper removes only bullet-DOMINATED documents;
    *   5. <= 30% of lines end with an ellipsis;
    *   6. >= 80% of words contain an alphabetic character;
    *   7. at least 2 of the 8 required English words appear.
    *
    * Every ratio threshold is evaluated as an INTEGER cross-multiplication
    * (e.g. symbols*10 <= words), never a double division — exact, ANSI-
    * overflow-safe at document scale, and bit-identical in any engine.
    * Pure column expressions end to end: one codegen stage, zero shuffle,
    * streams through a 100 TB scan. */
  def gopherRules(text: Column): Column = {
    val toks = tokens(text)
    val w = size(toks).cast("long")
    val chars = length(regexp_replace(text, "\\s+", "")).cast("long")
    val hashes = size(regexp_extract_all(text, lit("#"), lit(0))).cast("long")
    val ellipsisSyms =
      size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bullets = size(filter(lines,
      l => l.rlike("^\\s*[-*•]"))).cast("long")
    val ellipses = size(filter(lines,
      l => l.rlike("\\.\\.\\.\\s*$"))).cast("long")
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val reqHits = size(filter(array(GopherRequiredWords.map(lit): _*),
      sw => array_contains(toks, sw)))
    val r1 = w.between(50L, 100000L)
    val r2 = chars >= w * 3L && chars <= w * 10L
    val r3 = hashes * 10L <= w && ellipsisSyms * 10L <= w
    val r4 = bullets * 10L <= nLines * 9L
    val r5 = ellipses * 10L <= nLines * 3L
    val r6 = alphaWords * 5L >= w * 4L
    val r7 = reqHits >= 2
    struct(r1.as("word_count_ok"), r2.as("mean_word_len_ok"),
      r3.as("symbol_ratio_ok"), r4.as("bullet_ok"), r5.as("ellipsis_ok"),
      r6.as("alpha_word_ok"), r7.as("required_words_ok"),
      (r1 && r2 && r3 && r4 && r5 && r6 && r7).as("passes"))
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercase text.
    * The canonical exact-dedup key (same hex in Spark and DuckDB). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Rolling (Karp-Rabin-style) polynomial fingerprint over tokens:
    * fp = fold(tokens, 0, (acc, t) -> (acc*B + h(t)) mod M) with
    * M = 2^31-1, B = 1000003, h(t) = first 8 md5 hex digits as int.
    * Order-sensitive (unlike the md5 set fingerprint) — detects
    * reorderings; bounds keep every intermediate < 2^52, so the fold is
    * ANSI-overflow-safe and bit-identical across engines. */
  def rollingFingerprint(text: Column): Column = {
    val M = 2147483647L
    val B = 1000003L
    val tokHash = (t: Column) =>
      conv(substring(md5(t), 1, 8), 16, 10).cast("long")
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * B + tokHash(t), lit(M)))
  }

  // ------------------------------------------------------------------ PII

  /** PII patterns, applied in this order (email before the bare-number
    * pass so an address's digits aren't half-eaten first; IP before phone
    * so dotted quads don't match the phone shape). Kept to syntax RE2 and
    * java.util.regex evaluate identically — no backreferences, no
    * lookaround — so the DuckDB oracle applies the same strings verbatim. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d{1,3}[-. ]\\(?\\d{3,4}\\)?[-. ]\\d{3,8}\\b" -> "<PHONE>",
    "\\b\\d{13,19}\\b" -> "<NUMBER>")

  /** PII redaction — the standard pre-training scrub pass: emails, IPv4s,
    * phone shapes, and credit-card-length digit runs become typed
    * placeholder tokens. A chain of regexp_replace Column expressions:
    * whole-stage codegen, zero shuffle, linear in bytes — the only shape
    * that survives a 100 TB scrub. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Occurrences of a placeholder after redaction (audit counts). The
    * tokens contain no regex metacharacters, so the literal doubles as the
    * pattern in Spark and DuckDB alike. */
  def redactionCount(redacted: Column, token: String): Column =
    size(regexp_extract_all(redacted, lit(token), lit(0)))
}
