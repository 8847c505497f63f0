package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The decode kernel sniffs the payload's magic bytes and dispatches to a
  * real pure-JVM decoder — RIFF/WAVE 16-bit PCM (per-window mean amplitude
  * features) or BMP 24-bpp (per-vertical-band mean luminance features) —
  * falling back to a raw-byte kernel for opaque octet streams. The
  * distributed shape is mapPartitions over a typed Dataset: each partition's
  * rows are decoded locally by one task, exactly how a mapInPandas batch
  * with an image/audio library would run, with no shuffle introduced by the
  * decode stage.
  */
object Multimodal {

  /** Media row shape used by the typed decode path. */
  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, byteLen: Int, features: Array[Float])
  final case class MediaFeaturesSafe(id: Long, byteLen: Int, status: String,
                                     features: Option[Array[Float]])

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

  // ---------------------------------------------------------------------
  // Pure-JVM codecs (no external deps; little-endian helpers below).

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    putLe16(b, off, v & 0xFFFF); putLe16(b, off + 2, (v >>> 16) & 0xFFFF)
  }
  private def tag(b: Array[Byte], off: Int, s: String): Boolean =
    off + s.length <= b.length &&
      s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
  private def putTag(b: Array[Byte], off: Int, s: String): Unit =
    s.indices.foreach(i => b(off + i) = s.charAt(i).toByte)

  /** Encode 16-bit mono PCM samples as a canonical 44-byte-header WAV. */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    putTag(out, 0, "RIFF"); putLe32(out, 4, 36 + dataLen); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putLe32(out, 16, 16)
    putLe16(out, 20, 1)                       // PCM
    putLe16(out, 22, 1)                       // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2)          // byte rate
    putLe16(out, 32, 2)                       // block align
    putLe16(out, 34, 16)                      // bits/sample
    putTag(out, 36, "data"); putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { putLe16(out, 44 + 2 * i, samples(i) & 0xFFFF); i += 1 }
    out
  }

  /** Parse a RIFF/WAVE payload's 16-bit PCM data chunk. Walks the chunk
    * list (so extra chunks before `data` are fine). Throws on malformed
    * input — decode errors surface per-row, like a real codec. */
  def decodeWavPcm(payload: Array[Byte]): Array[Short] = {
    require(tag(payload, 0, "RIFF") && tag(payload, 8, "WAVE"), "not a WAVE file")
    var off = 12
    while (off + 8 <= payload.length) {
      val size = le32(payload, off + 4)
      // a lying chunk size (negative via the high bit, or past the buffer)
      // must THROW, never stall: a non-advancing walk would hang the
      // executor task in a way no try/catch (decodeFeaturesSafe) can stop.
      // Bound is written subtraction-side so size near Int.MaxValue cannot
      // wrap `off + 8 + size` negative and slip past the check (the loop
      // guard guarantees payload.length - off - 8 >= 0).
      if (size < 0 || size > payload.length - off - 8)
        throw new IllegalArgumentException(s"WAVE chunk size $size at $off exceeds payload")
      if (tag(payload, off, "data")) {
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = le16(payload, off + 8 + 2 * i).toShort; i += 1 }
        return out
      }
      off += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    throw new IllegalArgumentException("WAVE file has no data chunk")
  }

  /** Encode a grayscale image as a 24-bpp bottom-up BMP (gray in all three
    * channels), rows padded to 4 bytes — the standard Windows DIB layout. */
  def encodeBmp(width: Int, height: Int, grayAt: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (3 * width + 3) & ~3
    val dataLen = rowSize * height
    val out = new Array[Byte](54 + dataLen)
    putTag(out, 0, "BM"); putLe32(out, 2, out.length); putLe32(out, 10, 54)
    putLe32(out, 14, 40)                      // BITMAPINFOHEADER
    putLe32(out, 18, width); putLe32(out, 22, height)
    putLe16(out, 26, 1); putLe16(out, 28, 24) // planes, bpp
    putLe32(out, 34, dataLen)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val g = (grayAt(x, y) & 0xFF).toByte
        out(rowOff + 3 * x) = g; out(rowOff + 3 * x + 1) = g; out(rowOff + 3 * x + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bpp BMP into (width, height, row-major luminance), honoring
    * the pixel-array offset, bottom-up row order, and 4-byte row padding.
    * Luminance = mean of the three channels. */
  def decodeBmpGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    require(tag(payload, 0, "BM"), "not a BMP file")
    val dataOff = le32(payload, 10)
    val width = le32(payload, 18)
    val height = le32(payload, 22)
    require(le16(payload, 28) == 24, "only 24-bpp BMP supported")
    val rowSize = (3 * width + 3) & ~3
    val gray = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rowOff = dataOff + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val b = payload(rowOff + 3 * x) & 0xFF
        val g = payload(rowOff + 3 * x + 1) & 0xFF
        val r = payload(rowOff + 3 * x + 2) & 0xFF
        gray(y * width + x) = (r + g + b) / 3
        x += 1
      }
      y += 1
    }
    (width, height, gray)
  }

  /** Raw-byte fallback kernel for opaque octet streams: feature j = mean of
    * bytes at positions ≡ j (mod dims). */
  private[graft] def rawByteFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
    val acc = new Array[Double](dims)
    val cnt = new Array[Int](dims)
    var i = 0
    while (i < payload.length) {
      val d = i % dims
      acc(d) += (payload(i) & 0xFF).toDouble
      cnt(d) += 1
      i += 1
    }
    Array.tabulate(dims)(j => if (cnt(j) > 0) (acc(j) / cnt(j)).toFloat else 0f)
  }

  /** Format-sniffing decode: WAV → per-window mean amplitude over `dims`
    * equal time windows (window of sample i = i*dims/n); BMP → per-band mean
    * luminance over `dims` vertical bands (band of column x = x*dims/w);
    * anything else → raw-byte fallback. Accumulation is in double, rounded
    * to float once at the end, so results are bit-deterministic. */
  private[graft] def decodeBytes(payload: Array[Byte], dims: Int): Array[Float] = {
    if (tag(payload, 0, "RIFF") && tag(payload, 8, "WAVE")) {
      val samples = decodeWavPcm(payload)
      val n = samples.length
      val acc = new Array[Double](dims)
      val cnt = new Array[Int](dims)
      var i = 0
      while (i < n) {
        val w = i * dims / n
        acc(w) += samples(i).toDouble; cnt(w) += 1; i += 1
      }
      Array.tabulate(dims)(j => if (cnt(j) > 0) (acc(j) / cnt(j)).toFloat else 0f)
    } else if (tag(payload, 0, "BM")) {
      val (width, height, gray) = decodeBmpGray(payload)
      val acc = new Array[Double](dims)
      val cnt = new Array[Int](dims)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val b = x * dims / width
          acc(b) += gray(y * width + x).toDouble; cnt(b) += 1; x += 1
        }
        y += 1
      }
      Array.tabulate(dims)(j => if (cnt(j) > 0) (acc(j) / cnt(j)).toFloat else 0f)
    } else rawByteFeatures(payload, dims)
  }

  /** Partition-parallel decode / feature-extract: the mapPartitions batch
    * stage. One task decodes one partition's rows locally — the same
    * execution shape as `mapInPandas` with an image library, and the stage
    * Spark cannot express as a column expression. */
  def decodeFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.id, r.payload.length, decodeBytes(r.payload, dims))
      }
    }
  }

  /** Nearest-neighbor resize of a gray pixel grid — the downscale every
    * image prep stage runs before feature extraction / model input.
    * Source pixel of (x2, y2) is (x2*w/w2, y2*h/h2): pure integer
    * arithmetic, bit-identical on any engine. */
  private[graft] def resizeGray(w: Int, h: Int, px: Array[Int],
                                w2: Int, h2: Int): Array[Int] =
    Array.tabulate(h2 * w2) { i =>
      val y2 = i / w2
      val x2 = i % w2
      px((y2 * h / h2) * w + (x2 * w / w2))
    }

  /** Decode BMP -> nearest-neighbor resize to (w2, h2) -> per-band mean
    * luminance over the RESIZED grid: the decode+resize+extract chain of
    * a real image pipeline, partition-parallel like [[decodeFeatures]]
    * (mapPartitions is the mapInPandas-shaped stage Spark cannot express
    * as a column expression). */
  def resizeFeatures(media: Dataset[MediaRow], w2: Int, h2: Int,
                     dims: Int = 4): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, gray) = decodeBmpGray(r.payload)
        val rz = resizeGray(w, h, gray, w2, h2)
        val acc = new Array[Double](dims)
        val cnt = new Array[Int](dims)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            val b = x * dims / w2
            acc(b) += rz(y * w2 + x).toDouble; cnt(b) += 1; x += 1
          }
          y += 1
        }
        MediaFeatures(r.id, r.payload.length,
          Array.tabulate(dims)(j =>
            if (cnt(j) > 0) (acc(j) / cnt(j)).toFloat else 0f))
      }
    }
  }

  /** Perceptual DIFFERENCE HASH (dHash — the published gradient-based
    * perceptual image fingerprint; Krawetz 2013's formulation of the
    * pHash family): decode → nearest-neighbor resize to 9×8 grayscale →
    * 64 bits, bit (x, y) = 1 iff the pixel right of (x, y) is brighter.
    * Brightness-invariant by construction (a uniform exposure shift
    * flips no comparisons), which is what makes it a NEAR-dup key for
    * re-encoded/re-exposed images where byte hashes are useless.
    *
    * Emits the engine's standard quartered-fingerprint shape — `sh` =
    * four 16-bit blocks, bit i of quarter q at weight 1 << (15 − i) for
    * global bit b = q·16 + i = y·8 + x — so the SimHash pigeonhole
    * blocking ([[Dedup.quarterNearDupPairs]]) applies unchanged:
    * hamming ≤ 3 pairs must agree on one quarter, candidates come from
    * a quarter equi-join, never all-pairs. Decode is mapPartitions
    * like every media kernel here. */
  def dHashQuarters(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong,
      Encoders.product[Tuple1[Array[Long]]])
    val hashed = media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, gray) = decodeBmpGray(r.payload)
        val rz = resizeGray(w, h, gray, 9, 8)
        val quarters = Array.tabulate(4) { q =>
          var acc = 0L
          var i = 0
          while (i < 16) {
            val b = q * 16 + i
            val x = b % 8
            val y = b / 8
            if (rz(y * 9 + x + 1) > rz(y * 9 + x)) acc |= (1L << (15 - i))
            i += 1
          }
          acc
        }
        (r.id, Tuple1(quarters))
      }
    }
    hashed.toDF("id", "shw")
      .select(col("id"), col("shw._1").as("sh"))
  }

  /** Time windows in the audio fingerprint grid: 33 windows give 32
    * energy-delta bits — four 8-bit blocks for the quarter blocking. */
  val AudioPrintWindows = 33

  /** Audio ENERGY-DELTA fingerprint — the deterministic time-domain
    * re-expression of Haitsma & Kalker 2002's sign-of-band-energy-
    * difference audio print (the published form differences FFT
    * frequency bands; an FFT is float arithmetic no cross-engine
    * oracle can replay bit-exactly, so the delta runs on the time
    * axis, documented as such): decode PCM → [[AudioPrintWindows]]
    * equal time windows (window of sample i = i·W DIV n, the
    * [[decodeFeatures]] convention) → 32 bits, bit i = 1 iff window
    * i+1 is LOUDER than window i, compared as the exact rational mean
    * |amplitude| via integer CROSS-MULTIPLICATION
    * (S_{i+1}·c_i > S_i·c_{i+1} — the Gopher-rules idiom; a floored
    * division would make the print only approximately volume-invariant
    * because ties and near-ties re-resolve under gain). EXACTLY
    * volume-invariant: scaling every sample by a positive constant
    * scales both sides of every comparison equally — the re-encoded/
    * re-normalized copy a byte hash can never match. Emits the
    * standard quartered shape (four 8-bit blocks, bit i of quarter q
    * at weight 1 << (7 − i)), so [[Dedup.quarterNearDupPairs]] applies
    * unchanged. */
  /** Exact a·b > c·d for non-negative longs via 128-bit products
    * (high word from Math.multiplyHigh, low word compared unsigned).
    * The naive 64-bit product overflows once a clip passes ~5·10^8
    * samples (~3 h at 44.1 kHz: window sums reach 1024·n, counts n/32,
    * product 32n²) and would silently flip print bits; this comparison
    * is exact for every length a Long can index. */
  private def mulGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(lo1, lo2) > 0
  }

  def audioPrintQuarters(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong,
      Encoders.product[Tuple1[Array[Long]]])
    val w = AudioPrintWindows
    val hashed = media.mapPartitions { rows =>
      rows.map { r =>
        val pcm = decodeWavPcm(r.payload)
        val n = pcm.length
        val sums = new Array[Long](w)
        val cnts = new Array[Long](w)
        var i = 0
        while (i < n) {
          val wi = (i.toLong * w / n).toInt
          sums(wi) += math.abs(pcm(i).toLong)
          cnts(wi) += 1
          i += 1
        }
        val quarters = Array.tabulate(4) { q =>
          var acc = 0L
          var b = 0
          while (b < 8) {
            val bit = q * 8 + b
            if (mulGt(sums(bit + 1), cnts(bit), sums(bit), cnts(bit + 1)))
              acc |= (1L << (7 - b))
            b += 1
          }
          acc
        }
        (r.id, Tuple1(quarters))
      }
    }
    hashed.toDF("id", "shw")
      .select(col("id"), col("shw._1").as("sh"))
  }

  /** Error-isolating variant of [[decodeFeatures]]: a malformed payload
    * (truncated header, lying chunk sizes, missing data chunk) yields a
    * per-row `status = "error"` with null features instead of failing the
    * task — the contract a 100 TB corpus of crawled media requires, where
    * some fraction of every batch is always corrupt. */
  def decodeFeaturesSafe(media: Dataset[MediaRow],
                         dims: Int = 8): Dataset[MediaFeaturesSafe] = {
    implicit val enc = Encoders.product[MediaFeaturesSafe]
    media.mapPartitions { rows =>
      rows.map { r =>
        // byte length computed defensively ONCE: a null binary column is a
        // legal row, and reading r.payload.length inside the catch would
        // re-throw the very NPE the handler exists to contain
        val len = if (r.payload == null) 0 else r.payload.length
        try {
          if (r.payload == null) throw new IllegalArgumentException("null payload")
          MediaFeaturesSafe(r.id, len, "ok", Some(decodeBytes(r.payload, dims)))
        } catch { case _: Exception =>
          MediaFeaturesSafe(r.id, len, "error", None)
        }
      }
    }
  }

  /** End-to-end multimodal prep over a (id, text-as-payload) frame:
    * payload + metadata + decoded features (raw-byte kernel for text
    * payloads), ready for downstream dedup (checksum64) or similarity
    * (features). */
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
