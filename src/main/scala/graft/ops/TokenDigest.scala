package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared corpus-scale encode shape for driver-held tokenizers
  * ([[WordPiece]] MaxMatch, [[Unigram]] Viterbi): the per-word fold
  * runs once per DISTINCT word, each doc's word occurrences equi-join
  * back to their token list, and the doc row carries the token count
  * plus an md5 digest of the space-joined token stream in document
  * order (empty docs keep their row: 0 tokens, digest of ""). The join
  * deliberately carries no broadcast hint — a web corpus's \S+
  * vocabulary is heavy-tailed; AQE broadcasts when it actually is
  * small ([[Bpe.encodedLengths]]'s reasoning). */
private[ops] object TokenDigest {

  def of(corpus: DataFrame, idCol: String, textCol: String,
         countCol: String, digestCol: String,
         tokensOf: Column => Column): DataFrame = {
    val docWords = corpus.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))))
      .withColumnRenamed("col", "w")
    val wenc = docWords.select("w").distinct()
      .select(col("w"), tokensOf(col("w")).as("ts"))
      .select(col("w"), size(col("ts")).cast("long").as("k"),
        array_join(col("ts"), " ").as("tss"))
    val perDoc = docWords.join(wenc, "w")
      .groupBy(idCol)
      .agg(sum("k").as(countCol),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tss")))),
          x => x.getField("tss")), " ")).as(digestCol))
    corpus.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(countCol), lit(0L)).as(countCol),
        coalesce(col(digestCol), md5(lit(""))).as(digestCol))
  }
}
