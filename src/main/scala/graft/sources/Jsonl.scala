package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus sink/scan — the interchange
  * format LLM training stacks consume and produce. The reference engine
  * has no corpus-delivery surface; this is part of the training-data
  * pipeline extension (brief §extensions), sitting beside the CSV panel
  * export as the document-corpus counterpart.
  *
  * Write path: each row becomes one `to_json(struct(data cols))` line
  * through the TEXT sink — map-only, whole-stage codegen, no shuffle
  * beyond the optional `partitionBy` layout (partition columns are
  * carried by the directory structure, not repeated in the lines, the
  * standard lakehouse layout). JSON escaping (quotes, newlines, tabs,
  * backslashes, unicode) is Jackson's — the write is safe for arbitrary
  * document text, which a hand-rolled concat would not be.
  *
  * Read path: Spark's JSON scan with a CALLER-DECLARED schema (never
  * inference — at 100 TB schema inference is a full extra pass, and a
  * corpus with a rare all-null column would silently drop it). Partition
  * columns come back from the directory layout.
  */
object Jsonl {

  /** Write `df` as JSONL under `outDir`, one line per row; columns in
    * `partitionBy` become directory levels, the rest the JSON payload.
    * `saveMode` is the caller's clobber contract: the default
    * "overwrite" REPLACES any existing directory at `outDir` (the
    * deliver-to-a-fresh-path convention this engine's sinks use); pass
    * "errorifexists" when a delivery must never silently clobber a
    * previous one — the explicit knob keeps the write path's posture as
    * contract-bound as the read path's FAILFAST. */
  def write(df: DataFrame, outDir: String,
            partitionBy: Seq[String] = Nil,
            saveMode: String = "overwrite"): Unit = {
    val dataCols = df.columns.filterNot(partitionBy.contains).toSeq
    require(dataCols.nonEmpty, "no data columns left outside partitionBy")
    val w = df
      .select(partitionBy.map(col) :+
        to_json(struct(dataCols.map(col): _*)).as("value"): _*)
      .write.mode(saveMode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .text(outDir)
  }

  /** Read a JSONL directory with a declared data schema; partition
    * columns (if the layout has them) are appended by the scan. The
    * DEFAULT mode is FAILFAST — a corpus delivery is contract-bound, so
    * a malformed line fails the read loudly. Pass mode = "PERMISSIVE"
    * to null-fill bad rows instead (and add a `_corrupt_record` string
    * field to the declared schema if the raw line should be captured —
    * Spark only populates it when the schema declares it). */
  def read(spark: SparkSession, dir: String, schema: StructType,
           mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(dir)
}
