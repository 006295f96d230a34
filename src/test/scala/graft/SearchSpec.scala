package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ops/Search BM25: exact scores vs an independent in-test scorer, rank
  * order, k cut, and multi-term accumulation. lengthStats: hand-computed
  * interpolated percentiles.
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val corpus = Seq(
    (1L, "hash join hash join table"),
    (2L, "hash table scan"),
    (3L, "window agg window"),
    (4L, "scan scan scan scan scan scan"))

  /** independent BM25 (textbook formula, same params) */
  private def bm25Ref(query: Seq[String], k1: Double = 1.2, b: Double = 0.75)
  : Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    corpus.map { case (id, _) =>
      val tks = toks(id)
      id -> query.distinct.map { t =>
        val tf = tks.count(_ == t)
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(t))
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * tks.size / avgdl))
        }
      }.sum
    }.toMap
  }

  test("bm25TopK: scores match the textbook formula, ranked, k-cut") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq(("q1", "hash"), ("q1", "join"), ("q2", "scan")).toDF("query_id", "term")
    val got = ops.Search.bm25TopK(docs, queries, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val q1 = bm25Ref(Seq("hash", "join")).filter(_._2 > 0)
      .toSeq.sortBy { case (id, s) => (-s, id) }
    val q2 = bm25Ref(Seq("scan")).filter(_._2 > 0)
      .toSeq.sortBy { case (id, s) => (-s, id) }
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(got(("q1", 1L)) == ((q1(0)._1, r6(q1(0)._2))))
    assert(got(("q1", 2L)) == ((q1(1)._1, r6(q1(1)._2))))
    assert(got(("q2", 1L)) == ((q2(0)._1, r6(q2(0)._2))))
    assert(got.size == 4) // k=2 per query, q1 has >=2 hits, q2 has 2
  }

  test("lengthStats: hand percentiles with linear interpolation") {
    import spark.implicits._
    val docs = Seq(("en", "a b c d"), ("en", "a"), ("en", "a b"), ("en", "a b c"),
      ("ru", "x y")).toDF("lang", "text")
    val m = ops.TextStats.lengthStats(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    // en lengths sorted: 1,2,3,4 -> p50 = 2.5; p90 idx 0.9*3=2.7 -> 3+0.7 = 3.7
    assert(m("en") == ((4L, 10L, 1L, 4L, 2.5, 3.7)))
    assert(m("ru") == ((1L, 2L, 2L, 2L, 2.0, 2.0)))
  }

  test("knnGraph with nprobe = cells equals the exact brute-force kNN graph") {
    // probing every cell removes the recall approximation — the cell-keyed
    // shuffle-join graph must equal bruteTopK run with every vector as query
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val graph = ops.Similarity.knnGraph(e, k = 3, cells = 16, nprobe = 16)
      .collect().map(key).toSet
    val brute = ops.Similarity.bruteTopK(e, e, 3).collect().map(key).toSet
    assert(graph == brute && graph.nonEmpty)
  }

  test("annRecall: perfect method scores 10^6 ppm everywhere; twin matches a hand intersection count") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 97 === 0)
    val exact = ops.Similarity.bruteTopK(e, q, 5)
    // brute vs itself = perfect recall on every query
    val perfect = ops.Similarity.annRecall(exact, Seq("self" -> exact))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(perfect.nonEmpty)
    perfect.foreach { case (_, k, h, ppm) =>
      assert(k == h && ppm == 1000000L)
    }
    // lsh/ivf recall equals a hand-computed per-query intersection
    val lsh = ops.Similarity.annLsh(e, q, 5)
    val got = ops.Similarity.annRecall(exact, Seq("lsh" -> lsh)).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .map { case (qid, xs) => qid -> xs.map(_._2).toSet }
    val ex = sets(exact); val ap = sets(lsh)
    assert(got.keySet == ex.keySet) // truth side drives: every query reported
    got.foreach { case (qid, (k, h, ppm)) =>
      val inter = ex(qid).intersect(ap.getOrElse(qid, Set.empty)).size.toLong
      assert(k == ex(qid).size.toLong && h == inter &&
        ppm == inter * 1000000L / k)
    }
  }

  test("knnGraph: ranks contiguous from 1, self-edges excluded, at most k per query") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = ops.Similarity.knnGraph(e, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (q, _, n) => assert(q != n) }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ranks = g.map(_._2).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1L to ranks.length))
    }
  }
}
