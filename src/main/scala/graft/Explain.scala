package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection diagnostic: prints the formatted physical plan of the
  * named queries (or a scale-sensitive default set) so pushdown, pruning,
  * broadcast choice, and codegen coverage can be audited per operator.
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_agg", "q02_filter_project", "q03_join_broadcast",
        "q11_diff_classify", "q14_panel", "dedup_minhash", "ann_brute")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
