package graft


/** Benchmark main: times every SparkEntry query at the given scale dir.
  * A failing query records "<name>_error" and the run exits 1; FAILED
  * iterations are excluded from that query's median/min and from the
  * summed "total" (a fast crash must not read as a fast query). A query
  * with zero successful iterations reports the -1 sentinel.
  *
  * Output, in order:
  *   1. the FULL record (total + per-query medians + per-query mins) is
  *      written to BENCH_FULL.json in the working directory — the durable
  *      artifact, never truncated;
  *   2. the same full record prints as one stdout line (greppable:
  *      `"metric"`);
  *   3. the LAST stdout line is a compact summary that fits inside a
  *      2000-char log tail — total (median sum) AND value_min (min sum,
  *      the contention-robust headline), errors/sf, the slowest-median
  *      queries that fit a fixed byte budget and a "queries_omitted"
  *      count pointing at BENCH_FULL.json. Harness log collectors that
  *      keep only the tail of stdout can always parse this final line;
  *      every omitted query is sub-the-cutoff and present in the file
  *      and in line 2.
  *
  * Iterations are INTERLEAVED round-robin over the whole query list (run
  * the full list, then run it again, SPARK_GRAFT_ITERS times — default 3)
  * and each query reports the MEDIAN of its iterations, with the per-query
  * MIN published alongside ("queries_min"). Two reasons:
  *   - single-shot timings of sub-second queries in one shared JVM are
  *     dominated by JIT/GC/page-cache timing (observed 10-20x swings on
  *     identical bytecode between rounds);
  *   - back-to-back iterations of ONE query land entirely inside any
  *     machine-contention window, which round 10 showed can fabricate
  *     10-20x "regressions" for a contiguous alphabetical block of
  *     queries. Interleaving spreads a contention window thinly across
  *     every query's sample set, and the min column shows the
  *     uncontended floor either way. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = LocalSession.build(defaultCpus = "32")
    // warm-up: scheduler, codegen pipeline, parquet footers — so the first
    // timed query doesn't absorb session cold-start
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    var errors = List.empty[String]
    // local-iteration subset (comma-separated); driver leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val list = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to iters; (name, fn) <- list) {
      // drop any persisted entry a previous run left (operators with
      // materialize=true return caller-owned cached frames the bench
      // cannot unpersist after its action): a plan-keyed cache entry
      // surviving into the next iteration would serve it a cached read
      // and report a phantom speedup — the r10 bench-honesty bug, which
      // resurfaced in focused SPARK_GRAFT_ONLY subsets that exclude the
      // queries whose own unpersist coincidentally evicted the entry
      spark.catalog.clearCache()
      // guide §1.5: label the jobs so a UI / event-log reading of the
      // bench maps every stage back to its query (no timing effect)
      spark.sparkContext.setJobDescription(s"bench: $name")
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (!errors.contains(name)) errors ::= name
      } finally spark.sparkContext.setJobDescription(null)
    }
    val results = list.map { case (name, _) =>
      val ts = samples(name).sorted
      val key = if (errors.contains(name)) s"${name}_error" else name
      if (ts.isEmpty) (key, -1.0, -1.0) else (key, ts(ts.size / 2), ts.head)
    }
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma-decimal locale would turn every number into invalid JSON
    def num(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", d)
    def fmt(rs: Seq[(String, Double, Double)])(
        f: ((String, Double, Double)) => Double) =
      rs.map { r => "\"" + r._1 + "\":" + num(f(r)) }
        .mkString("{", ",", "}")
    val total = results.collect { case (_, m, _) if m >= 0 => m }.sum
    // value_min = sum of per-query mins — the noise-robust headline (r12
    // verdict #6): a machine-contention window inflates medians ~20% but
    // each query's min stays at the uncontended floor, so a contended
    // final run can no longer read as a regression in the committed
    // artifact. "value" stays the median sum for cross-round continuity.
    val totalMin = results.collect { case (_, _, mn) if mn >= 0 => mn }.sum
    val full = s"""{"metric":"total","value":${num(total)},"value_min":${
      num(totalMin)},"unit":"sec","queries":${
      fmt(results)(_._2)},"queries_min":${fmt(results)(_._3)},"errors":${
      errors.size},"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] cannot write $out: ${e.getMessage}") }
    println(full)
    // compact tail line: slowest medians first, fixed byte budget so the
    // line survives a 2000-char stdout-tail capture intact (errors always
    // listed — an "_error" key must never be silently omitted)
    val budget = 1300
    val ranked = results.sortBy { case (k, m, _) =>
      (if (k.endsWith("_error")) Double.MinValue else -m) }
    val kept = collection.mutable.ListBuffer.empty[(String, Double, Double)]
    var used = 0
    var closed = false // first non-fitting entry CLOSES admission: the kept
    for (r <- ranked) { // set must be exactly "every median above a cutoff"
      val sz = r._1.length + 10
      if (r._1.endsWith("_error")) { kept += r; used += sz }
      else if (!closed && used + sz <= budget) { kept += r; used += sz }
      else closed = true
    }
    println(s"""{"metric":"total","value":${num(total)},"value_min":${
      num(totalMin)},"unit":"sec","queries":${
      fmt(kept.toSeq)(_._2)},"queries_omitted":${results.size - kept.size
      },"full":"$out","errors":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
