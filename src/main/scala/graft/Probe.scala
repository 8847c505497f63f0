package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probes (COVERAGE.md): adversarial topologies and skew
  * shapes the sf-scaled bench doesn't naturally produce. Each subcommand
  * prints one `[probe]` line; not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    args(0) match {
      // a pure PATH of near-dups: the worst case for label propagation
      // (diameter = n); large-star/small-star must stay logarithmic
      case "chain" =>
        val n = args(1).toInt
        val pairs = spark.range(n - 1)
          .select(col("id").as("idA"), (col("id") + 1).as("idB"))
        val ((labels, rounds), secs) =
          timed(Dedup.clusterPairsCounted(pairs) match {
            case (l, r) => (l.collect(), r)
          })
        val allMin = labels.forall(_.getLong(1) == 0L)
        println(f"[probe] chain n=$n rounds=$rounds nodes=${labels.length} " +
          f"all_to_min=$allMin time=$secs%.2fs")

      // round count + wall time of the real dedup_cluster pair graph
      case "cluster_rounds" =>
        val dir = args(1)
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
          shingleWords = 3, numHashes = 64, bands = 16, threshold = 0.7,
          materialize = true)
        val ((n, rounds), secs) = timed(Dedup.clusterPairsCounted(pairs) match {
          case (l, r) => (l.count(), r)
        })
        pairs.unpersist(false)
        println(f"[probe] cluster_rounds dir=$dir rounds=$rounds nodes=$n " +
          f"time=$secs%.2fs")

      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
