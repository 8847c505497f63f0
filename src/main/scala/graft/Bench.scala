package graft


/** Benchmark main: times every SparkEntry query at the given scale dir and
  * prints ONE JSON line. A failing query records "<name>_error" and the run
  * exits 1; FAILED iterations are excluded from that query's median/min and
  * from the summed "total" (a fast crash must not read as a fast query). A
  * query with zero successful iterations reports the -1 sentinel.
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
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (!errors.contains(name)) errors ::= name
      }
    }
    val results = list.map { case (name, _) =>
      val ts = samples(name).sorted
      val key = if (errors.contains(name)) s"${name}_error" else name
      if (ts.isEmpty) (key, -1.0, -1.0) else (key, ts(ts.size / 2), ts.head)
    }
    def fmt(f: ((String, Double, Double)) => Double) =
      results.map { r => "\"" + r._1 + "\":" + f"${f(r)}%.3f" }
        .mkString("{", ",", "}")
    val total = results.collect { case (_, m, _) if m >= 0 => m }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${
      fmt(_._2)},"queries_min":${fmt(_._3)},"errors":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
