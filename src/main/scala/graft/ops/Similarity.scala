package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the engine brief:
  *   - brute-force cosine top-k: the exact baseline. The QUERY side is
  *     broadcast (queries are few), so the corpus streams map-side with no
  *     shuffle of vectors; per-query top-k is a windowed rank over the
  *     (small) scored pairs.
  *   - random-hyperplane LSH buckets: the 100 TB path. Each vector maps to a
  *     `numPlanes`-bit bucket; candidates come ONLY from an equi-join on the
  *     bucket key (optionally multi-probing neighboring buckets), never from
  *     a cross join. Recall is tunable via numPlanes/probes; exactness is
  *     traded for a shuffle bounded by bucket occupancy.
  *
  * All arithmetic is double-precision higher-order-function expressions
  * (zip_with/aggregate) — codegen'd, deterministic (sequential array fold,
  * no float reassociation), no UDFs.
  */
object Similarity {

  /** Cast array<float> -> array<double> once, up front. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Squared L2 distance as the ascending-index fold Σ(a_i - b_i)² —
    * THE portability-critical distance shape (PQ/ADC, refine, exact
    * ground truth): every consumer and every SQL oracle must fold in
    * this exact order, so there is exactly one owner. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (ties broken by id for determinism).
    * Output: (query_id, neighbor_id, rank, cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    // norms are computed ONCE per vector on each side (map-side, before the
    // join) — cosine inside the pair loop is then a single dot product,
    // not three (norm recomputation per pair would triple the dominant
    // interpreted-HOF cost)
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("nid") =!= col("qid") else lit(true))
      .select(col("qid"), col("nid"),
        when(col("qn") * col("cn") > 0,
          dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(lit(0.0)).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1]: a
    * quadratic integer hash of (plane, dim) in plain 64-bit arithmetic —
    * h = (73856093 p + 19349663 i) mod 1000003, c = ((h² + h) mod 1000003)
    * / 500000 − 1 — so every executor materializes the same planes with
    * zero driver-side state, AND an external SQL engine (the DuckDB
    * correctness oracle) can materialize bit-identical planes from the
    * same formula. */
  private def planeComponent(plane: Column, dim: Column): Column = {
    val h = pmod(plane.cast("long") * 73856093L + dim.cast("long") * 19349663L,
      lit(1000003L))
    (pmod(h * h + h, lit(1000003L)).cast("double") / 500000.0) - 1.0
  }

  /** Random-projection dimensionality reduction (Johnson-Lindenstrauss
    * style): y_p = dot(v, r_p) for `outDims` pseudo-random directions
    * r_p drawn from the SAME portable integer-arithmetic plane family as
    * [[lshBucket]] — components are regenerated from (plane, dim) on any
    * engine, so there is NO projection matrix to store, broadcast, or
    * keep consistent across a 1000-executor cluster; the "matrix" is two
    * multiplies and a mod per component, inside the scan stage, zero
    * shuffle. Values round to 6 decimals (the repo's portable-double
    * contract). Output exploded as (id, dim, value) rows.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDims: Int, planeOffset: Int = 0): DataFrame = {
    val v = asDouble(col(vecCol))
    val proj = transform(sequence(lit(0), lit(outDims - 1)), p =>
      round(aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(lit(planeOffset) + p, i)),
        lit(0.0), (acc, x) => acc + x), 6))
    df.select(col(idCol), posexplode(proj).as(Seq("dim", "value")))
  }

  /** `numPlanes`-bit LSH bucket of a vector: bit p = sign of dot(v, r_g),
    * g = planeOffset + p. The offset selects an independent hash table from
    * the same plane family (table t of width r uses planes t*r .. t*r+r-1),
    * which is what banding amplification needs.
    *
    * Dispatches to the native codegen expression
    * ([[graft.expressions.LshBucket]], registered by GraftExtensions) —
    * the planes×dims loop is the hot inner kernel of every LSH scan and the
    * HOF formulation runs interpreted. Bit-identical to [[lshBucketHof]]. */
  def lshBucket(vec: Column, numPlanes: Int, planeOffset: Column = lit(0)): Column =
    call_function("lsh_bucket", vec, lit(numPlanes), planeOffset.cast("long"))

  /** Reference HOF formulation of [[lshBucket]] (interpreted; kept as the
    * executable spec the native expression is cross-checked against). */
  def lshBucketHof(vec: Column, numPlanes: Int, planeOffset: Column = lit(0)): Column = {
    val v = asDouble(vec)
    val bits = transform(sequence(lit(0), lit(numPlanes - 1)), p => {
      val d = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(planeOffset + p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, 1L).otherwise(0L)
    })
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** Approximate top-k via LSH buckets, ranked by exact cosine within the
    * candidate set. Output matches bruteForceTopK.
    *
    * `numTables = 1` is the cheapest single-probe tier: candidates are
    * corpus vectors in the SAME bucket as the query. For real recall on
    * weakly-clustered corpora, banding amplification (`numTables` = L
    * independent r-plane tables; a pair is a candidate if it collides in
    * ANY table) trades an L× map-side bucket computation — the corpus is
    * still never shuffled and never all-paired; candidates come only from
    * (table, bucket) equi-join collisions, so the 100 TB cost envelope is
    * bounded by bucket occupancy, exactly like a single table. Recall for
    * per-plane agreement prob. p is 1-(1-p^r)^L instead of p^r.
    *
    * `probes > 0` adds MULTI-PROBE: the query side also looks in the
    * `probes` Hamming-1 neighbor buckets of each table (low bit flips —
    * the planes most likely to have mis-signed a near neighbor flip one at
    * a time). Recall rises at the same table count for a query-side-only
    * (probes+1)x key fan-out; the corpus is untouched, so at 100 TB scale
    * this is the cheap knob — probing costs O(queries), tables cost
    * O(corpus). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 8,
              excludeSelf: Boolean = true, numTables: Int = 1,
              probes: Int = 0): DataFrame = {
    require(probes >= 0 && probes <= numPlanes,
      s"probes must be in [0, numPlanes=$numPlanes], got $probes")
    val tbl = explode(sequence(lit(0), lit(numTables - 1)))
    def bucketed(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(v))
        .withColumn("tbl", tbl)
        .withColumn("bucket",
          lshBucket(col(v), numPlanes, col("tbl") * numPlanes))
        .withColumn(s"${v}n", l2Norm(col(v)))
    val c = bucketed(corpus, "nid", "cv")
    val q0 = bucketed(queries, "qid", "qv")
    val q =
      if (probes == 0) q0
      else {
        // probe j flips bit j-1 (LSB side; bits are packed acc*2+b so the
        // LAST planes sit in the low bits) — a static when-chain keeps the
        // whole expansion inside codegen, no pow/shift-by-column
        val probed = (1 to probes).foldLeft(
          when(col("__probe") === 0, col("bucket"))) { (acc, j) =>
          acc.when(col("__probe") === j,
            col("bucket").bitwiseXOR(lit(1L << (j - 1))))
        }
        q0.withColumn("__probe", explode(sequence(lit(0), lit(probes))))
          .withColumn("bucket", probed)
          .drop("__probe")
      }
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(if (excludeSelf) col("nid") =!= col("qid") else lit(true))
      .select(col("qid"), col("nid"),
        when(col("qvn") * col("cvn") > 0,
          dot(col("qv"), col("cv")) / (col("qvn") * col("cvn")))
          .otherwise(lit(0.0)).as("cosine"))
    // a pair colliding in several tables (or probes) yields identical rows
    // -> distinct is deterministic and dedups the candidate set
    val cand = if (numTables > 1 || probes > 0) scored.distinct() else scored
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("nid"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cosine")
  }

  /** Symmetric int8 quantization of an embedding (scale = max |component|):
    * q_i = round(v_i / scale * 127) — the 4x storage compression every
    * embedding corpus ships with at scale. Pure column expressions; the
    * round is HALF_UP (ties away from zero) in both Spark and the DuckDB
    * oracle, so quantized values are engine-portable. */
  def quantizeScale(v: Column): Column = array_max(transform(v, x => abs(x)))

  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale > 0, round(x / scale * 127)).otherwise(lit(0.0)).cast("int"))

  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale / 127)

  /** Embedding-cosine near-duplicate pairs, exact: all pairs (idA < idB)
    * with cosine >= threshold. O(n^2) — for bounded subsets and as the
    * oracle baseline; the scale path is embeddingNearDupLsh. */
  def cosinePairsAbove(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("idA"), asDouble(col(vecCol)).as("va"))
      .withColumn("na", l2Norm(col("va")))
    val b = df.select(col(idCol).as("idB"), asDouble(col(vecCol)).as("vb"))
      .withColumn("nb", l2Norm(col("vb")))
    a.join(broadcast(b), col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        when(col("na") * col("nb") > 0,
          dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .otherwise(lit(0.0)).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Embedding-cosine near-dup at scale: candidates ONLY from equal LSH
    * buckets (hyperplane signs — high-cosine pairs agree on most signs),
    * verified by exact cosine. The dedup flavor for embedding-keyed corpora:
    * drop idB of every pair to keep min-id representatives. */
  def embeddingNearDupLsh(df: DataFrame, idCol: String, vecCol: String,
                          threshold: Double, numPlanes: Int = 6): DataFrame = {
    val f = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
        lshBucket(col(vecCol), numPlanes).as("bucket"))
      .withColumn("n", l2Norm(col("v")))
    f.as("a").join(f.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("idA"), col("b.id").as("idB"),
        when(col("a.n") * col("b.n") > 0,
          dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")))
          .otherwise(lit(0.0)).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The persisted embedding near-dup index rows for a batch:
    * (id, bucket, v) — unlike the minhash index, the VECTOR travels with
    * its bucket, because exact-cosine verification needs it and the
    * embedding already is the compressed representation (no text to
    * avoid). What an incremental pipeline appends so later batches find
    * embedding near-dups against history without recomputing historical
    * buckets. */
  def embeddingIndex(df: DataFrame, idCol: String, vecCol: String,
                     numPlanes: Int = 6): DataFrame =
    df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      lshBucket(col(vecCol), numPlanes).as("bucket"))

  /** INCREMENTAL embedding near-dup: match an incoming batch against a
    * persisted [[embeddingIndex]] — same-bucket candidates (the
    * hyperplane family is closed-form and static, so incoming buckets are
    * directly comparable with buckets computed in any earlier run),
    * verified by exact cosine at `threshold`. Returns (id, matched_id,
    * cosine). Scale shape: bucket equi-join bounded by true bucket
    * occupancy + per-candidate cosine — history participates as stored
    * (bucket, vector) rows, never re-bucketed. */
  def embeddingNearDupAgainstIndex(incoming: DataFrame, index: DataFrame,
                                   idCol: String, vecCol: String,
                                   threshold: Double,
                                   numPlanes: Int = 6): DataFrame = {
    val inc = incoming.select(col(idCol).as("id"),
        asDouble(col(vecCol)).as("iv"),
        lshBucket(col(vecCol), numPlanes).as("bucket"))
      .withColumn("in_", l2Norm(col("iv")))
    val idx = index.select(col("id").as("matched_id"), col("v").as("hv"),
        col("bucket"))
      .withColumn("hn", l2Norm(col("hv")))
    inc.join(idx, Seq("bucket"))
      .select(col("id"), col("matched_id"),
        when(col("in_") * col("hn") > 0,
          dot(col("iv"), col("hv")) / (col("in_") * col("hn")))
          .otherwise(lit(0.0)).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** IVF-style variant: assign every vector to its nearest of `nCells`
    * hash-derived centroid surrogates (here: LSH bucket modulo nCells as the
    * cell id — a centroid-free stand-in that keeps the partition-local
    * search shape), search only the query's cell. The plan shape — cell
    * equi-join then windowed top-k — is exactly what a trained-centroid IVF
    * produces; swapping in real centroids changes only the cell id column. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 64): DataFrame = {
    val cell = (v: Column) => pmod(lshBucket(v, 16), lit(nCells))
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("cv"),
        cell(col(vecCol)).as("cell"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"),
        cell(col(vecCol)).as("cell"))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        when(col("qn") * col("cn") > 0,
          dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(lit(0.0)).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "nid", "rank", "cosine")
  }
}
