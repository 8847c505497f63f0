package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-plan assertions (T3/P3 made mechanical): the properties the
  * 100 TB posture depends on — filter pushdown to the parquet scan, column
  * pruning in ReadSchema, broadcast choice for small dims, shuffle-free
  * generator pipelines, TakeOrdered top-k — are checked programmatically
  * instead of by eyeballing `graft.Explain` output, so a plan regression
  * fails the suite, not a later bench read. */
class PlanSpec extends SparkSuite {
  import spark.implicits._

  private def planOf(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  private lazy val dir = {
    // a tiny parquet table written by the test itself: plan shapes don't
    // need scale, they need a real FileSourceScanExec to push into
    val d = Files.createTempDirectory("graft-plan").toString
    (0L until 100L).map(i => (i, s"name_$i", i % 7, i * 1.5))
      .toDF("id", "name", "grp", "price")
      .write.parquet(s"$d/t")
    d
  }

  test("filter pushes to the parquet scan; projection prunes ReadSchema") {
    val df = spark.read.parquet(s"$dir/t")
      .filter(col("grp") === 3 && col("id") > 10)
      .select("id", "price")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") &&
      (plan.contains("IsNotNull(grp)") || plan.contains("EqualTo(grp,3)")),
      s"no pushed filters in:\n$plan")
    val readSchema = plan.split("ReadSchema:").lift(1)
      .map(_.takeWhile(_ != '\n')).getOrElse("")
    assert(readSchema.contains("id") && readSchema.contains("price") &&
      !readSchema.contains("name"), s"ReadSchema not pruned: $readSchema")
  }

  test("small dimension side is broadcast, not shuffled") {
    val facts = spark.read.parquet(s"$dir/t")
    val dim = Seq((0, "a"), (3, "b")).toDF("grp", "label")
    val plan = planOf(facts.join(broadcast(dim), Seq("grp")))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("chunking is a generator pipeline: zero exchanges") {
    val docs = Seq((1L, ("tok " * 300).trim), (2L, ("tok " * 50).trim))
      .toDF("doc_id", "text")
    val chunked = graft.ops.Chunking.chunkByTokens(docs, "doc_id", "text",
      chunkSize = 128, overlap = 16)
    val plan = planOf(chunked)
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("orderBy+limit plans as TakeOrderedAndProject, not a global sort") {
    val df = spark.read.parquet(s"$dir/t").orderBy(col("price").desc).limit(5)
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
  }

  test("v2_grid_panel reads through the edb-grid BatchScan, not the driver reader") {
    val plan = planOf(SparkEntry.queries("v2_grid_panel")(spark, "unused"))
    assert(plan.contains("BatchScan") && plan.contains("edb-grid"),
      s"v2_grid_panel does not scan via the V2 connector:\n$plan")
  }

  test("revision-history date predicate reaches the parquet scan") {
    val d = Files.createTempDirectory("graft-plan-rev").toString
    Seq(("autosales", "2024-01-01", "sales", 1.0, 2.0,
        java.sql.Timestamp.valueOf("2025-06-01 00:00:00")))
      .toDF("dataset", "data_date", "value_field", "old_value", "new_value",
        "revision_date")
      .write.parquet(s"$d/datarevisions")
    val revs = spark.read.parquet(s"$d/datarevisions")
    val q = graft.merge.RevisionHistory.query(revs,
      dataset = Some("autosales"), date = Some("2024-01-01"),
      field = None, limit = None)
    val plan = planOf(q)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(dataset,autosales)"),
      s"dataset predicate not pushed:\n$plan")
  }

  test("incremental-index matchers are equi-joins, never cartesian") {
    import graft.ops.{Dedup, Similarity}
    val docs = (0L until 40L).map(i => (i, s"some text number $i about topic ${i % 5}"))
      .toDF("doc_id", "text")
    val mIdx = Dedup.minhashIndex(docs.filter($"doc_id" < 20), "doc_id", "text")
    val pMh = planOf(Dedup.nearDupAgainstIndex(
      docs.filter($"doc_id" >= 20), mIdx, "doc_id", "text"))
    assert(!pMh.contains("CartesianProduct") &&
      !pMh.contains("BroadcastNestedLoopJoin"),
      s"minhash incremental degenerated to an all-pairs join:\n$pMh")
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => (i % 5 + d).toFloat))).toDF("vec_id", "embedding")
    val eIdx = Similarity.embeddingIndex(
      vecs.filter($"vec_id" % 2 === 0), "vec_id", "embedding", numPlanes = 4)
    val pEm = planOf(Similarity.embeddingNearDupAgainstIndex(
      vecs.filter($"vec_id" % 2 === 1), eIdx, "vec_id", "embedding",
      threshold = 0.2, numPlanes = 4))
    assert(!pEm.contains("CartesianProduct") &&
      !pEm.contains("BroadcastNestedLoopJoin"),
      s"embedding incremental degenerated to an all-pairs join:\n$pEm")
  }

  test("semDedup pair generation is a cluster equi-join, never all-pairs") {
    import graft.ops.KMeans
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => (i % 5 + d).toFloat))).toDF("vec_id", "embedding")
    val cents = KMeans.fit(vecs, "vec_id", "embedding", k = 3, iters = 1)
    val p = planOf(KMeans.semDedup(vecs, "vec_id", "embedding", cents,
      threshold = 0.9))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"semDedup degenerated to an all-pairs join:\n$p")
    // the incremental form: batch x (index + itself) rides the same
    // cluster equi-join — the cosine threshold is a join FILTER on the
    // cluster key, never a join condition that degenerates to all-pairs
    val idx = KMeans.semIndex(vecs.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", cents)
    val pInc = planOf(KMeans.semDedupAgainstIndex(
      vecs.filter($"vec_id" % 2 === 1), idx, "vec_id", "embedding",
      cents, threshold = 0.9))
    assert(!pInc.contains("CartesianProduct") &&
      !pInc.contains("BroadcastNestedLoopJoin"),
      s"incremental semDedup degenerated to an all-pairs join:\n$pInc")
  }

  test("mixCorpus/weightedSample join their tiny stats by broadcast, never SMJ") {
    import graft.ops.Sampling
    val corpus = spark.read.parquet(s"$dir/t")
    val mixed = Sampling.mixCorpus(corpus, "grp", "id", "price",
      Map("0" -> 0.5, "1" -> 0.5), 100L)
    val pMix = planOf(mixed)
    assert(pMix.contains("BroadcastHashJoin"), s"no broadcast join:\n$pMix")
    assert(!pMix.contains("SortMergeJoin") && !pMix.contains("ShuffledHashJoin"),
      s"corpus shuffled for the fraction join:\n$pMix")
    val pps = Sampling.weightedSample(corpus, "id", "price", 10L)
    val pPps = planOf(pps)
    assert(pPps.contains("BroadcastNestedLoopJoin") ||
      pPps.contains("BroadcastExchange"),
      s"total not broadcast back:\n$pPps")
    assert(!pPps.contains("SortMergeJoin") && !pPps.contains("CartesianProduct"),
      s"weightedSample shuffles the corpus:\n$pPps")
  }

  test("assignShards: exactly one data exchange (the shard hash), never a global sort") {
    val corpus = spark.read.parquet(s"$dir/t")
    val plan = planOf(graft.ops.Layout.assignShards(corpus, "id", 8))
    // one Exchange for the per-shard window; a global sort or a second
    // shuffle would break the "ordering is free at write time" contract
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort in shard assignment:\n$plan")
  }

  test("unigramSurprisal: corpus-side aggregates are partial (map-side combine)") {
    import graft.ops.Corpus
    val docs = spark.read.parquet(s"$dir/t")
      .select($"id".as("doc_id"), $"name".as("text"))
    val plan = planOf(Corpus.unigramSurprisal(docs, "doc_id", "text"))
    // the totals ride a 1-row broadcast (never a shuffle of the corpus);
    // the token/doc aggregates must be two-phase HashAggregates
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"totals not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in surprisal plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"no hash aggregate:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"sort-aggregate (no map-side combine) in:\n$plan")
  }

  test("curate_corpus_v2 funnel: never cartesian; text crosses at most one shuffle") {
    // The composed ten-stage funnel's scale contract: every per-doc
    // gate/signal is consumed map-side or reduced to an id-keyed frame
    // before joining the spine, so the corpus `text` column itself rides
    // at most ONE shuffle exchange (the export attach) — re-shuffling
    // multi-KB text bodies per stage is the composition failure mode
    // this pins against. Built on the real sf0.001 testdata because the
    // funnel's constants (history sources, benchmark ids) are part of
    // the query contract.
    val df = SparkEntry.curateFunnelV2(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in the funnel plan:\n$plan")
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // formatted-explain node blocks: "(n) Exchange" + "Input [k]: [...]";
    // count shuffle exchanges whose input carries the text attribute
    // (BroadcastExchange excluded: a small-side broadcast of the final
    // packed frame is the good path, and AQE picks SMJ at real scale)
    val blocks = fmt.split("\n\n").map(_.linesIterator.toSeq)
    val shuffleBlocks = blocks.filter(
      _.headOption.exists(_.matches("""\(\d+\) Exchange.*""")))
    // parse sanity: the funnel HAS shuffles (windows, aggregates) — zero
    // found means the block format drifted and the pin went vacuous
    assert(shuffleBlocks.nonEmpty,
      s"formatted-explain parse found no Exchange blocks:\n$fmt")
    val textShuffles = shuffleBlocks.count(
      _.exists(l => l.startsWith("Input") && l.contains("text#")))
    assert(textShuffles <= 1,
      s"corpus text crosses $textShuffles shuffles (max 1):\n$fmt")
  }

  test("stripRepeatedLines: anti-join on the repeated subset, never cartesian") {
    val docs = (0L until 50L).map(i =>
      (i, s"unique $i\nshared line\nalso $i")).toDF("doc_id", "text")
    val plan = planOf(graft.ops.Corpus.stripRepeatedLines(
      docs, "doc_id", "text", maxOccurrences = 2))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"line strip degenerated to all-pairs:\n$plan")
    // the exploded lines must ANTI-join the repeated subset (the filter
    // direction that lets the small side broadcast at scale) — an inner
    // join + negation would carry every line through the join
    assert(plan.contains("LeftAnti"), s"no anti-join in line strip:\n$plan")
    assert(plan.contains("HashAggregate"), s"line counts not hash-agg:\n$plan")
  }

  test("stripDuplicatedSpans: equi-joins + anti-join rebuild, never cartesian") {
    val docs = (0L until 40L).map(i =>
      (i, s"alpha beta shared passage tokens appear twice verbatim u$i v$i"))
      .toDF("doc_id", "text")
    val plan = planOf(graft.ops.Dedup.stripDuplicatedSpans(
      docs, "doc_id", "text", windowTokens = 4))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup degenerated to all-pairs:\n$plan")
    // the corpus token stream must ANTI-join the covered-position set
    // (candidate-bounded small side), and the window-hash counting must
    // be a hash aggregate (map-side partial over the corpus windows);
    // the canonical struct-min may be a SortAggregate but only on the
    // duplicated subset
    assert(plan.contains("LeftAnti"), s"no anti-join rebuild:\n$plan")
    assert(plan.contains("HashAggregate"), s"window counts not hash-agg:\n$plan")
  }

  test("perplexityBuckets: bucketing is a map-side CASE over the scored frame") {
    val docs = (0L until 30L).map(i =>
      (i, s"tok${i % 5} tok${i % 7} tok$i")).toDF("doc_id", "text")
    val out = graft.ops.Corpus.perplexityBuckets(docs, "doc_id", "text")
    val plan = planOf(out)
    // the surprisal pipeline ran ONCE (localCheckpointed before the
    // histogram collect), so the returned frame is a checkpoint scan plus
    // the map-side CASE — ZERO exchanges, and in particular no global
    // sort or percentile shuffle (the scale-killer this operator exists
    // to avoid) and no re-run of the corpus-scale token aggregation
    def exchanges(p: String) = "Exchange".r.findAllIn(p).length
    assert(exchanges(plan) == 0,
      s"bucketing re-runs or shuffles the scored frame:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort in bucketing:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"scored frame not checkpointed — surprisal would run twice:\n$plan")
  }

  test("naiveBayesClassify: no cartesian on data, hash aggs, broadcast model") {
    import graft.ops.Corpus
    val docs = spark.read.parquet(s"$dir/t")
      .select($"id".as("doc_id"), $"name".as("text"),
        ($"id" % 3).cast("string").as("cls"))
    val plan = planOf(Corpus.naiveBayesClassify(docs, "doc_id", "text", "cls"))
    // the only nested-loop joins permitted are the broadcast totals /
    // priors (bounded by C and V); the corpus stream itself must never
    // cartesian; the token-keyed corpus aggregates must be hash. The
    // struct-argmins are ALLOWED to be SortAggregates (struct buffers
    // aren't hash-aggregable) because their inputs are already reduced
    // (the D x C score stream; the C-row priors for the empty-doc
    // fallback) and both still get map-side partial_mins — exactly four
    // SortAggregate nodes (partial + final for each argmin), no more.
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in NB plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"no hash aggregate:\n$plan")
    val sortAggs = plan.sliding("SortAggregate".length)
      .count(_ == "SortAggregate")
    assert(sortAggs == 4 && plan.contains("min(struct"),
      s"unexpected sort-aggregates ($sortAggs) beyond the two argmins:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"model/priors not broadcast:\n$plan")
  }

  test("quarterNearDupPairs: pigeonhole equi-join, never all-pairs") {
    import graft.ops.Dedup
    val prints = (0L until 80L).map(i =>
      (i, Array(i % 7, i % 11, i % 13, i % 17)))
      .toDF("id", "sh")
    val plan = planOf(Dedup.quarterNearDupPairs(prints, maxHamming = 3))
    // the blocking join must be an equi-join on (quarter, key) — a
    // cartesian or nested-loop here is the all-pairs failure mode the
    // pigeonhole exists to prevent, for text simhash AND the media
    // prints alike
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"quartered blocking degenerated to all-pairs:\n$plan")
    val planIdx = planOf(Dedup.quarterNearDupAgainstIndex(
      prints.filter($"id" % 2 === 1), prints.filter($"id" % 2 === 0)))
    assert(!planIdx.contains("CartesianProduct") &&
      !planIdx.contains("BroadcastNestedLoopJoin"),
      s"index blocking degenerated to all-pairs:\n$planIdx")
    // the HOT path too: with a threshold that escalates every bucket,
    // the level-2 sub-block join must still be a pure equi-join —
    // both the pair form and the index form
    val planHot = planOf(Dedup.quarterNearDupPairs(prints,
      maxHamming = 3, hotThreshold = 2))
    assert(!planHot.contains("CartesianProduct") &&
      !planHot.contains("BroadcastNestedLoopJoin"),
      s"escalated blocking degenerated to all-pairs:\n$planHot")
    val planHotIdx = planOf(Dedup.quarterNearDupAgainstIndex(
      prints.filter($"id" % 2 === 1), prints.filter($"id" % 2 === 0),
      maxHamming = 3, hotThreshold = 2))
    assert(!planHotIdx.contains("CartesianProduct") &&
      !planHotIdx.contains("BroadcastNestedLoopJoin"),
      s"escalated index blocking degenerated to all-pairs:\n$planHotIdx")
  }

  test("wordpiece encode: fold per distinct word, equi-join back, no cartesian") {
    import graft.ops.WordPiece
    val docs = (0L until 60L).map(i => (i, s"alpha bravo w$i alpha"))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "l", "p", "h", "b", "r", "v", "o", "w", "0",
      "##a", "##l", "##p", "##h", "##b", "##r", "##v", "##o", "##0",
      "alpha", "##ravo")
    val plan = planOf(WordPiece.encodeDigest(docs, "doc_id", "text", vocab))
    // the MaxMatch fold must run on the DISTINCT word table (a hash
    // aggregate dedups words before any fold output is joined), the
    // occurrence join must be an equi-join on the word key, and nothing
    // may degenerate to all-pairs — the corpus text itself never folds
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wordpiece encode degenerated to all-pairs:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"no hash aggregate (distinct words / per-doc agg):\n$plan")
  }
}
