package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the given scale dir and
  * prints ONE JSON line. A failing query records "<name>_error" (negative
  * sentinel time) instead of silently looking benched.
  *
  * Each query runs SPARK_GRAFT_ITERS times (default 3) and reports the
  * MEDIAN: single-shot timings of sub-second queries in one shared JVM are
  * dominated by JIT/GC/page-cache timing (observed 10-20x swings on
  * identical bytecode between rounds), which makes regression detection
  * impossible. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: scheduler, codegen pipeline, parquet footers — so the first
    // timed query doesn't absorb session cold-start
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    var errors = List.empty[String]
    // local-iteration subset (comma-separated); driver leaves it unset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              if (!errors.contains(name)) errors ::= name
              false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val median = times.map(_._1).sorted.apply(times.size / 2)
      (if (times.forall(_._2)) name else s"${name}_error") -> median
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
