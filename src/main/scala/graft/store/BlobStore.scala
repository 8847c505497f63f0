package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import java.io.{ByteArrayOutputStream}

/** S10: opaque blob object store (raw source payloads, exports, logs) over
  * the Hadoop FS API — local FS in tests, HDFS/S3A/ABFS on a cluster with
  * zero code change. Mirrors upload/download/list/delete
  * (/root/reference/core_local/azure_connector.py:296-423) plus the
  * write-through raw-payload cache the scrapers layer on top of it
  * (azure_common_scrapers.py:35-64: serve from cache if present, else fetch
  * and populate — the engine's bronze landing zone). */
final class BlobStore(spark: SparkSession, root: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(name: String) = new Path(s"$root/$name")

  def upload(name: String, data: Array[Byte], overwrite: Boolean = true): Unit = {
    val out = fs.create(p(name), overwrite)
    try out.write(data) finally out.close()
  }

  def download(name: String): Option[Array[Byte]] =
    if (!fs.exists(p(name))) None
    else {
      val in = fs.open(p(name))
      try {
        val buf = new ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toByteArray)
      } finally in.close()
    }

  def list(prefix: String = ""): Seq[String] = {
    val dir = new Path(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
      .filter(_.startsWith(prefix)).sorted
  }

  def delete(name: String): Boolean =
    fs.exists(p(name)) && fs.delete(p(name), false)

  def exists(name: String): Boolean = fs.exists(p(name))

  /** Write-through cache (S1's `download_excel` shape): return the cached
    * payload if present, else run `fetch` and populate the cache. */
  def getOrFetch(name: String)(fetch: => Array[Byte]): Array[Byte] =
    download(name).getOrElse {
      val data = fetch
      upload(name, data)
      data
    }
}
