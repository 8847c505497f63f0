package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession construction for every driver-contract main (Verify,
  * Bench, Probe), so measurements and correctness dumps always run under
  * identical session settings — a config drift between mains would make
  * probe-published numbers incomparable with bench numbers. */
object LocalSession {
  def build(defaultCpus: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
