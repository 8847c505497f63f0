package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking and sequence packing for training-data
  * pipelines: split documents into fixed-token windows with overlap, and
  * pack documents into token-budget bins.
  *
  * Extends the reference (which has no text pipeline) per the engine brief,
  * alongside TextAnalysis. Both operators are generator + column
  * expressions — whole-stage codegen, no UDFs; chunking needs no shuffle at
  * all, packing shuffles once on the stratum key (never a global sort):
  * at 100 TB a single-partition running sum would serialize the world, so
  * packing is defined PER STRATUM (e.g. per source shard), which is also
  * what a real pretraining mix does.
  */
object Chunking {

  /** Token windows of `chunkSize` with `overlap` tokens shared between
    * consecutive chunks (stride = chunkSize - overlap); the last chunk may
    * be short, and every token is covered. Output: one row per chunk with
    * `chunk_idx`, `n_tokens`, `chunk_text`.
    *
    * Chunk count is pure integer arithmetic — n <= chunkSize gives 1,
    * otherwise (n - chunkSize + stride - 1) div stride + 1 — so an external
    * SQL oracle reproduces it exactly; no doubles, no ceil. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // `/` is double division in Spark SQL; floor() is exact here (counts
    // are far below 2^52, where doubles are integral-exact)
    val nChunks = when(col("__n") <= chunkSize, lit(1L)).otherwise(
      floor((col("__n") - chunkSize + (stride - 1)).cast("double") / stride)
        .cast("long") + 1L)
    val start = col("chunk_idx").cast("int") * stride + 1
    val window = slice(col("__toks"), start, lit(chunkSize))
    toks
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1)))
      .select(col(idCol), col("chunk_idx"),
        size(window).as("n_tokens"),
        array_join(window, " ").as("chunk_text"))
  }

  /** Sequence packing: within each stratum (ordered by `idCol`), assign
    * documents to consecutive token-budget bins by exclusive running sum —
    * bin = floor(tokens_before_this_doc / budget). Deterministic, one
    * shuffle (the stratum-partitioned window), no global order.
    * `carryCols` are passed through untouched (e.g. the doc id and source
    * when packing a sharded layout ordered by `shard_pos`), so a composed
    * pipeline does not need a join to recover them afterwards.
    *
    * LOADER CONTRACT (bin-boundary semantics): documents are assigned
    * WHOLE — a doc whose tokens run past its bin's budget is NOT split
    * here, so a bin is not guaranteed to hold ≤ budget tokens of its
    * member docs. The output states the overflow explicitly:
    * `spans_next_bin` is true iff `bin_offset + tokens > budget`, and
    * `end_bin` is the bin the doc's LAST token lands in (= `bin` for
    * non-straddling and zero-token docs). A loader emitting fixed
    * `budget`-token sequences either (a) pre-chunks oversized docs
    * through [[chunkByTokens]] with chunkSize = budget BEFORE packing —
    * then no doc exceeds the budget and every `spans_next_bin` is the
    * sub-budget straddle it must continue reading across — or (b) reads
    * a straddling doc's tokens across bins `bin..end_bin`, taking
    * `budget - bin_offset` tokens from the first and `budget` per full
    * middle bin. Either way the columns carry everything the seek needs;
    * nothing is silently truncated. */
  def packByBudget(df: DataFrame, strataCols: Seq[String], idCol: String,
                   tokenCountCol: Column, budget: Int,
                   carryCols: Seq[String] = Nil,
                   orderCols: Seq[Column] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // default packing order is the id; callers may override (semantic
    // packing orders by (typicality desc, id) within its cluster
    // strata) — the override must still be a TOTAL order per stratum
    // or the running sum is nondeterministic
    val ord = if (orderCols.nonEmpty) orderCols else Seq(col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // bin AND the doc's token offset inside it both derive from ONE
    // exclusive running sum — bin_offset = cum - bin*budget costs no
    // second window, and is exactly the seek position a data loader
    // needs to place each doc inside its packed sequence
    df.select((strataCols.map(col) :+ col(idCol) :+
        tokenCountCol.cast("long").as("__tok")) ++ carryCols.map(col): _*)
      .withColumn("__cum",
        coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("bin",
        floor(col("__cum").cast("double") / budget).cast("long"))
      .withColumn("bin_offset", col("__cum") - col("bin") * budget)
      // the straddle markers — still the SAME running sum, no new window.
      // greatest(tok, 1) pins a zero-token doc's end_bin to its own bin
      // (floor((cum - 1)/budget) would step it back across a boundary)
      .withColumn("spans_next_bin",
        col("bin_offset") + col("__tok") > budget)
      .withColumn("end_bin",
        floor((col("__cum") + greatest(col("__tok"), lit(1L)) - 1L)
          .cast("double") / budget).cast("long"))
      .drop("__cum")
  }
}
