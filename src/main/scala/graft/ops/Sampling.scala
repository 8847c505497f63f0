package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data pipelines.
  *
  * Everything here is HASH-priority based, never `rand()`: a sample taken
  * on a 1000-executor cluster, re-run after a failure, or recomputed next
  * quarter selects EXACTLY the same rows. Priorities use md5 of the key
  * (engine-portable — the DuckDB oracle reproduces them bit-for-bit),
  * making samples auditable end to end.
  */
object Sampling {

  /** Stable per-row priority in [0, 1): first 12 md5 hex digits of the key
    * scaled down. Uniform enough for sampling; deterministic everywhere.
    *
    * COMPOSITION CAVEAT: two sampling stages keyed on the SAME key draw
    * the SAME uniform variate, so their selections are perfectly
    * correlated — rows that survived an upstream `p1` threshold pass a
    * downstream `p2 > p1` with certainty instead of probability `p2`
    * (the curate_corpus_v2 funnel hit exactly this composing
    * [[mixCorpus]] with [[weightedSample]]). When stages must draw
    * independently, domain-separate the key per stage (e.g.
    * `concat(lit("rs:"), key)`), the [[graft.ops.Layout.shardOrderKey]]
    * discipline. */
  def hashPriority(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("double") / lit(math.pow(16, 12))

  /** Stratified top-k sample: the k rows with lowest hash priority per
    * stratum. One shuffle on the strata; no sort of the full data (window
    * top-k). */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], keyCol: String,
                       k: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashPriority(col(keyCol)), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic train/validation/test split by key hash: stable across
    * runs and engines, disjoint and exhaustive. Fractions are in percent
    * of the 2^8 hash space (granularity 1/256). */
  def hashSplit(df: DataFrame, keyCol: String, testPct: Double = 0.1,
                valPct: Double = 0.1): DataFrame =
    hashSplitBy(df, col(keyCol), testPct, valPct)

  /** [[hashSplit]] generalized to an arbitrary key EXPRESSION. The split
    * unit is whatever the expression identifies: pass the row id for a
    * plain per-row split, or any GROUP key — all rows sharing the key
    * land in the same split by construction (the split is a pure function
    * of the key hash), with zero shuffles: the assignment is a map-side
    * expression, never a join against a group table. */
  def hashSplitBy(df: DataFrame, key: Column, testPct: Double = 0.1,
                  valPct: Double = 0.1): DataFrame = {
    val bucket = conv(substring(md5(key.cast("string")), 1, 2), 16, 10)
      .cast("int") // 0..255
    val testMax = (256 * testPct).toInt
    val valMax = testMax + (256 * valPct).toInt
    df.withColumn("split",
      when(bucket < testMax, "test")
        .when(bucket < valMax, "validation")
        .otherwise("train"))
  }

  /** LEAKAGE-SAFE train/validation/test split: the split unit is the
    * exact-duplicate GROUP (the [[graft.ops.TextAnalysis.fingerprint]] of
    * the text), not the row — every copy of a duplicated document lands
    * in the same split, so the test set can never contain a verbatim
    * twin of a training document (the classic evaluation-contamination
    * hole a per-row split leaves open on a deduplicated-later corpus).
    * Pure map-side expression — no group table, no shuffle, 100 TB-safe
    * by construction; NULL texts share one group (fingerprint NULL
    * buckets to 'train' via the CASE fallthrough, deterministically). */
  def leakageSafeSplit(df: DataFrame, textCol: String,
                       testPct: Double = 0.1, valPct: Double = 0.1): DataFrame =
    hashSplitBy(df, graft.ops.TextAnalysis.fingerprint(col(textCol)),
      testPct, valPct)

  /** Downsample a stratum-skewed corpus to at most `cap` rows per stratum
    * (e.g. cap documents per domain/language) — the standard pre-training
    * balance operation, deterministic by construction. */
  def capPerStratum(df: DataFrame, strataCols: Seq[String], keyCol: String,
                    cap: Int): DataFrame =
    stratifiedSample(df, strataCols, keyCol, cap).drop("sample_rank")

  /** Corpus mixing to a target domain composition: sample each domain down
    * so its kept MASS (tokens/chars, `massCol`) approximates
    * `share * budget`, the way a pre-training run assembles "x% web, y%
    * code, z% books" out of wildly unequal raw pools. Per domain the keep
    * fraction is `min(1, share * budget / domainMass)` — a domain too
    * small to fill its allocation is kept whole (the mix degrades toward
    * availability, it never upsamples), and rows survive by
    * [[hashPriority]] threshold, so the selection is deterministic,
    * engine-portable, and MONOTONE in the budget: growing the budget only
    * ever ADDS documents (a re-mix for a larger run strictly extends the
    * smaller corpus — no churn in what was already selected). Domains
    * absent from `targetShares` are dropped: the mix spec is the corpus
    * definition.
    *
    * Scale shape: one partial-aggregated `groupBy(domain)` over the corpus
    * (domain cardinality is tiny), then a broadcast join of the per-domain
    * fractions back onto the corpus and a map-side filter — the corpus
    * itself never shuffles, so this runs at 100 TB for the cost of one
    * scan plus one scan-and-filter.
    *
    * Masses sum through DECIMAL(28,9) (quantized to 9 dp) so the total is
    * exact and partition-order-independent even for fractional mass
    * columns; a NULL or all-zero domain mass yields keep fraction 0 (the
    * domain contributes nothing), never a kept row. */
  def mixCorpus(df: DataFrame, domainCol: String, keyCol: String,
                massCol: String, targetShares: Map[String, Double],
                budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val shares = targetShares.toSeq.toDF(domainCol, "__target_share")
    val frac = df.groupBy(domainCol)
      .agg(sum(col(massCol).cast("decimal(28,9)")).cast("double")
        .as("__domain_mass"))
      .join(shares, Seq(domainCol))
      .select(col(domainCol),
        least(lit(1.0),
          coalesce(nanvl(when(col("__domain_mass") > 0.0,
            col("__target_share") * budget / col("__domain_mass")),
            lit(0.0)), lit(0.0)))
          .as("__keep_frac"))
    df.join(broadcast(frac), Seq(domainCol))
      .filter(hashPriority(col(keyCol)) < col("__keep_frac"))
      .drop("__keep_frac")
  }

  /** Temperature-flattened domain shares (the mT5 / XLM-R alpha-sampling
    * rule, arXiv:1910.10683 / 1911.02116: sample domain d with
    * probability ∝ mass_d^alpha, alpha < 1 upweighting low-resource
    * domains) — the share map a [[mixCorpus]] call consumes when the
    * target composition should be DERIVED from the corpus instead of
    * hand-written.
    *
    * `alphaQuarters`/4 is the exponent (1 → 0.25, 2 → 0.5, 3 → 0.75,
    * 4 → 1.0): the power is computed as a product of iterated square
    * roots, because sqrt is IEEE-correctly-rounded on every engine
    * while libm pow(x, 0.3) differs in the last ulp across
    * implementations — the same portability discipline that keeps ln()
    * out of the TF-IDF scores. Weights and shares are then EXACT
    * integers (w_d = floor(sqrt-product × 1e6),
    * share_ppm = 1e6·w_d DIV Σw) — an oracle replays them
    * digit-for-digit.
    *
    * Domain masses aggregate exactly (DECIMAL(28,9), the mixCorpus
    * discipline); the per-domain table is model-sized (domains are few
    * by definition), collected and shared out on the driver like the
    * k-means centroid state. That DOMAIN-CARDINALITY assumption is the
    * operator's contract — mT5 runs 101 languages, real mixes tens of
    * sources; the collect and the single-partition result frame are
    * sized to that, exactly like [[mixCorpus]]'s driver-held share map.
    * A "domain" column with data-scale cardinality (e.g. a URL host hash)
    * belongs in [[stratifiedSample]]/[[capPerStratum]], not here.
    * Returns (domain, mass, w, share_ppm) sorted by domain. */
  def temperatureShares(df: DataFrame, domainCol: String, massCol: String,
                        alphaQuarters: Int): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      s"alphaQuarters must be in 1..4, got $alphaQuarters")
    val spark = df.sparkSession
    val masses = df.groupBy(domainCol)
      .agg(sum(col(massCol).cast("decimal(28,9)")).cast("double")
        .as("__mass"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1)
    def powQ(m: Double): Double = {
      val s2 = math.sqrt(m)        // m^(1/2)
      val s4 = math.sqrt(s2)       // m^(1/4)
      alphaQuarters match {
        case 1 => s4
        case 2 => s2
        case 3 => s2 * s4
        case 4 => m
      }
    }
    val ws = masses.map { case (d, m) =>
      (d, m, math.floor(powQ(math.max(m, 0.0)) * 1e6).toLong)
    }
    val tot = ws.map(_._3).sum
    val rows = ws.map { case (d, m, w) =>
      Row(d, m, w, if (tot > 0) 1000000L * w / tot else 0L)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(domainCol,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("mass",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("share_ppm",
          org.apache.spark.sql.types.LongType))))
  }

  /** Poisson PPS sample: keep each row with inclusion probability
    * `min(1, expectedRows * weight / totalWeight)` — probability
    * proportional to a non-negative weight column, expected sample size
    * `expectedRows` (exact only when no row's share exceeds 1/n; heavier
    * rows saturate at certainty and the realized size runs slightly
    * under). This is the RESAMPLING half of importance sampling: feed it
    * [[graft.ops.Corpus.importanceWeights]] scores and it materializes
    * the DSIR-style target-shifted corpus the weights describe. Inclusion
    * is judged by [[hashPriority]], so the draw is deterministic,
    * engine-portable, and MONOTONE in `expectedRows` (enlarging the
    * sample only adds rows) — and deliberately avoids the classic
    * u^(1/w) / -ln(u)/w reservoir keys, whose transcendental-function
    * last-ulp differences are not reproducible across engines.
    *
    * Scale shape: one all-to-one total (map-side partial aggregate),
    * broadcast back, map-side filter — no shuffle of the data.
    *
    * Weights sum through DECIMAL(28,9) (quantized to 9 dp) so the total
    * is exact and partition-order-independent even for fractional weight
    * columns; NULL weights and a zero/NULL total yield inclusion
    * probability 0 — such rows are undrawable, and an all-zero-weight
    * corpus samples to empty rather than to itself. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     expectedRows: Long): DataFrame = {
    val tot = df.agg(sum(col(weightCol).cast("decimal(28,9)")).cast("double")
      .as("__total_w"))
    // NULL weights and a zero/NULL total must yield threshold 0 (row
    // undrawable), never 1: least() SKIPS null operands in both Spark and
    // SQL, so an unguarded NULL/NaN ratio would collapse least(1, ratio)
    // to 1 and keep the row with certainty — and ANSI mode would throw on
    // the zero-total division before that, so the divisor is gated too.
    df.crossJoin(broadcast(tot))
      .filter(hashPriority(col(keyCol)) < least(lit(1.0),
        coalesce(nanvl(when(col("__total_w") > 0.0,
          lit(expectedRows.toDouble) * col(weightCol) / col("__total_w")),
          lit(0.0)), lit(0.0))))
      .drop("__total_w")
  }

  /** UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): spread a token budget across
    * languages as uniformly as possible while capping every language
    * at `epochCap` epochs of its own data — the successor to
    * temperature sampling that stops over-epoching the tail.
    *
    * Relational water-filling in exact integers (the whole thing is a
    * direct SQL replay): languages sorted by (cap, domain) take their
    * FULL cap while cap_i * langs_from_i <= budget_remaining_i — the
    * waterline predicate, provably monotone along the sort (once it
    * fails it keeps failing), so the capped set is a prefix. The rest
    * split the first uncapped row's remaining budget evenly; the DIV
    * remainder goes +1 apiece to the smallest-cap uncapped languages
    * in sort order (deterministic, documented — alloc <= cap always
    * holds because the breakpoint's cap exceeds its waterline). When
    * the budget exceeds the summed caps every language is capped and
    * the excess goes unallocated — the published behavior: the epoch
    * cap binds, the budget does not stretch it.
    *
    * Windows run over the DOMAIN table — model-sized by the same
    * contract as [[temperatureShares]] (languages/sources, never a
    * data-scale key), so the single-partition sort is the k-means-
    * centroid shape, not a corpus sort. Returns (domain, n_tok, cap,
    * alloc, epochs_x1000) ordered by domain. */
  def unimaxAllocations(df: DataFrame, domainCol: String, massCol: String,
                        budget: Long, epochCap: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(epochCap >= 1, s"epochCap must be >= 1, got $epochCap")
    val byCap = Window.orderBy(col("cap"), col(domainCol))
    val all = Window.partitionBy()
    val ranked = df.groupBy(domainCol)
      .agg(sum(massCol).cast("long").as("n_tok"))
      .select(col(domainCol), col("n_tok"),
        (col("n_tok") * epochCap).as("cap"))
      .withColumn("idx", row_number().over(byCap))
      .withColumn("pfx", coalesce(sum("cap").over(
        byCap.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("nl", count(lit(1)).over(all))
      .withColumn("rem", lit(budget) - col("pfx"))
      .withColumn("capped",
        col("cap") * (col("nl") - col("idx") + 1) <= col("rem"))
    val marked = ranked
      .withColumn("bidx",
        min(when(!col("capped"), col("idx"))).over(all))
      .withColumn("brem",
        max(when(col("idx") === col("bidx"), col("rem"))).over(all))
      .withColumn("bk", col("nl") - col("bidx") + 1)
    marked.select(col(domainCol), col("n_tok"), col("cap"),
        when(col("capped"), col("cap"))
          .otherwise(expr("brem DIV bk") +
            when(col("idx") - col("bidx") < expr("brem % bk"), 1L)
              .otherwise(0L)).as("alloc"))
      .withColumn("epochs_x1000",
        expr("1000 * alloc DIV greatest(n_tok, 1)"))
      .orderBy(domainCol)
  }

  /** Expand [[unimaxAllocations]] into the actual epoch-expanded
    * training MANIFEST — the artifact a loader consumes: each domain
    * contributes floor(alloc / n_tok) FULL epochs (every doc appears
    * once per epoch, exact token accounting) plus one PARTIAL epoch
    * drawing each doc with probability (alloc mod n_tok) / n_tok via
    * the engine's uniform variate, "umx:"-salted so the draw is
    * independent of every other sampling stage (the composition
    * caveat on [[hashPriority]]). Deterministic and engine-replayable;
    * the per-domain token total is exact over the full epochs and
    * unbiased over the partial one. Scale shape: the allocation table
    * is domain-sized and broadcast; the corpus is touched once, with
    * the full-epoch fan-out a generator (no shuffle) and the partial
    * draw a map-side filter. */
  def unimaxManifest(df: DataFrame, domainCol: String, massCol: String,
                     keyCol: String, budget: Long,
                     epochCap: Int): DataFrame = {
    val allocs = unimaxAllocations(df, domainCol, massCol, budget, epochCap)
      .select(col(domainCol), col("n_tok"), col("alloc"))
      .withColumn("full_epochs", expr("alloc DIV greatest(n_tok, 1)"))
      .withColumn("rem_num", expr("alloc % greatest(n_tok, 1)"))
    val joined = df.join(broadcast(allocs), Seq(domainCol))
    val full = joined.filter(col("full_epochs") > 0)
      .select(col(domainCol), col(keyCol), col(massCol),
        explode(sequence(lit(0L), col("full_epochs") - 1)).as("epoch"))
    val part = joined.filter(col("rem_num") > 0)
      .filter(hashPriority(concat(lit("umx:"), col(keyCol))) <
        col("rem_num").cast("double") / col("n_tok").cast("double"))
      .select(col(domainCol), col(keyCol), col(massCol),
        col("full_epochs").as("epoch"))
    full.unionByName(part)
  }
}
