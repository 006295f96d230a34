package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Full-text relevance search over the corpus: classic BM25 (Robertson/
  * Sparck Jones idf with the +1 floor, Okapi tf saturation) expressed as
  * the inverted-index dataflow — a term-frequency table is the index,
  * queries probe it with a broadcast equi-join on the term.
  *
  * Scale shape: ONE scan of the corpus builds tf(doc, term); df/dl/avgdl
  * all derive from tf (no second scan); scoring touches only postings of
  * query terms (the semi-join through the broadcast query table prunes
  * the rest at the first hash probe). The only shuffles are the tf
  * aggregation (two-phase, map-side combine absorbs Zipf skew) and the
  * per-query top-k window, whose partition count = |queries|. Hot terms
  * ("the") are naturally capped by the postings aggregation — scoring is
  * per (term, doc), never per occurrence.
  */
object Search {

  /** @param queries (query_id, term) rows, one per query term
    * @return (query_id, rank, doc_id, score) — top `k` docs per query by
    *         BM25, ties broken by doc_id; score rounded to 6 decimals.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the inverted index: one corpus scan -> postings with tf; three
    // consumers (df, dl, scoring) read the materialized table, not the
    // corpus scan (eager localCheckpoint; blocks GC'd with the DF)
    val tf = docs
      .select(col("doc_id"), explode(TextStats.tokens(graft.functions.F.lower_simple(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus stats ride along as a broadcast single-row cross join
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    val scored = tf
      .join(broadcast(queries.select(col("query_id"), col("term")).distinct()), "term")
      .join(df, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id").agg(sum(col("s")).as("score"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), round(col("score"), 6).as("score"))
  }
}
