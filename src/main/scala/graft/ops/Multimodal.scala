package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel decode
  * via mapPartitions over a typed Dataset — is real and tested. The decode
  * kernel itself is a clearly-marked DETERMINISTIC STUB (this container has
  * no image/audio codecs); swapping in a real codec changes only the body of
  * `stubDecodeBytes`, not the distributed plan: each partition's rows are
  * decoded locally by one task, exactly how a Pandas-UDF/mapInPandas batch
  * would run, with no shuffle introduced by the decode stage.
  */
object Multimodal {

  /** Media row shape used by the typed decode path. */
  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, byteLen: Int, features: Array[Float])

  /** Wrap a string column as an opaque binary payload (stand-in for real
    * media bytes in the fixture tables). */
  def asPayload(text: Column): Column = text.cast("binary")

  /** Typed metadata for an opaque payload: size, content hash, declared
    * mime, and a stable 64-bit checksum — everything downstream partitioning
    * and dedup needs without decoding. Pure column expressions. */
  def mediaMetadata(payload: Column, mime: String): Column = struct(
    octet_length(payload).as("byte_len"),
    md5(payload).as("content_md5"),
    xxhash64(payload).as("checksum64"),
    lit(mime).as("mime"))

  /** Frame-sample stub: pick `n` evenly-spaced single bytes from the payload
    * as "frames" (real frame extraction would slice real frame boundaries;
    * the sampling geometry and column shape are what the pipeline tests).
    * Byte at position p is read as conv(hex(substr(payload, p, 1)), 16, 10).
    * Returns array<int> of the sampled byte values (<= n entries). */
  def frameSample(payload: Column, n: Int): Column = {
    val len = octet_length(payload)
    val stride = greatest((len / n).cast("int"), lit(1))
    filter(
      transform(sequence(lit(0), lit(n - 1)), i => {
        val pos = i * stride + 1
        when(pos <= len,
          conv(hex(payload.substr(pos, lit(1))), 16, 10).cast("int"))
          .otherwise(lit(null).cast("int"))
      }),
      x => x.isNotNull)
  }

  /** STUB decode kernel — deterministic fake "embedding" from raw bytes:
    * feature j = mean of bytes j mod 4 == j. A real implementation would
    * call a codec here (???); everything around it is production-shaped. */
  private[graft] def stubDecodeBytes(payload: Array[Byte], dims: Int): Array[Float] = {
    val acc = new Array[Float](dims)
    val cnt = new Array[Int](dims)
    var i = 0
    while (i < payload.length) {
      val d = i % dims
      acc(d) += (payload(i) & 0xFF).toFloat
      cnt(d) += 1
      i += 1
    }
    var j = 0
    while (j < dims) { if (cnt(j) > 0) acc(j) /= cnt(j); j += 1 }
    acc
  }

  /** Partition-parallel decode / feature-extract: the mapPartitions batch
    * stage. One task decodes one partition's rows locally — the same
    * execution shape as `mapInPandas` with an image library, and the stage
    * Spark cannot express as a column expression. */
  def decodeFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.id, r.payload.length, stubDecodeBytes(r.payload, dims))
      }
    }
  }

  /** End-to-end multimodal prep over a (id, text-as-payload) frame:
    * payload + metadata + stub features, ready for downstream dedup
    * (checksum64) or similarity (features). */
  def prepare(df: DataFrame, idCol: String, textCol: String, dims: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withPayload = df.select(col(idCol).cast("long").as("id"),
      asPayload(col(textCol)).as("payload"))
    val media = withPayload.as[MediaRow]
    val feats = decodeFeatures(media, dims).toDF()
    withPayload
      .withColumn("meta", mediaMetadata(col("payload"), "application/octet-stream"))
      .join(feats, Seq("id"))
  }
}
