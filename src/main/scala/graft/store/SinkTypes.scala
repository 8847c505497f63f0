package graft.store

import graft.config.Registry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Declared-type fidelity at the lakehouse boundary (SURVEY.md §1.4).
  *
  * The reference's DDL declares per-column DECIMAL(p,s)
  * (config.py:9-26, fred_config.py:10-17, nyu_config.py:6-15) that its
  * actual store erases to doubles at rest. This engine keeps the erased
  * DOUBLE as the in-engine numeric surface (all merge tolerance math,
  * panels, and the SQL views stay double — oracle-consistent), but writes
  * parquet with the DECLARED DecimalType so an external lakehouse consumer
  * re-deriving the DDL sees the intended logical types.
  *
  * Both casts are value-preserving for data that fits the declared scale
  * (every real series here does by construction — the DDL was written for
  * this data); a hypothetical out-of-scale value would round HALF_UP at
  * the sink, exactly what inserting it into the declared SQL column would
  * have done.
  */
object SinkTypes {

  /** Engine frame -> declared at-rest schema, applied at table writes. */
  def sinkCast(df: DataFrame, tableName: String): DataFrame =
    Registry.declaredDecimals(tableName).foldLeft(df) {
      case (d, (c, (p, s))) if d.columns.contains(c) =>
        d.withColumn(c, col(c).cast(DecimalType(p, s)))
      case (d, _) => d
    }

  /** At-rest frame -> engine numeric surface (doubles), applied at reads.
    * Only columns that are actually DecimalType are touched, so frames
    * from stores written before this policy read back unchanged. */
  def engineCast(df: DataFrame, tableName: String): DataFrame =
    Registry.declaredDecimals(tableName).foldLeft(df) {
      case (d, (c, _)) if d.schema.fields.exists(f =>
          f.name == c && f.dataType.isInstanceOf[DecimalType]) =>
        d.withColumn(c, col(c).cast(DoubleType))
      case (d, _) => d
    }
}
