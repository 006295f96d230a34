package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 extension text-stats ops: NB quality classifier, skip-gram
  * pair counts, per-domain KL — invariants on planted fixtures (the
  * driver oracle checks exact values at sf0.01 via q_nb_quality,
  * q_skipgram, q_domain_kl).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("nbQualityScores: separates planted pos/neg vocab; partition-invariant; tie is neg") {
    import spark.implicits._
    val pos = Seq((1L, "хорошо отлично супер"), (2L, "хорошо прекрасно супер"))
      .toDF("doc_id", "text")
    val neg = Seq((3L, "плохо ужасно кошмар"), (4L, "плохо скверно кошмар"))
      .toDF("doc_id", "text")
    // doc 5 looks pos, doc 6 looks neg, doc 7 is all-unseen tokens:
    // with symmetric training masses (Np == Nn, dp == dn) every unseen
    // token's llr and the prior are exactly 0 -> score 0 -> tie -> "neg"
    val score = Seq((5L, "отлично супер"), (6L, "ужасно кошмар"),
      (7L, "нейтрально неизвестно")).toDF("doc_id", "text")
    val out = ops.TextStats.nbQualityScores(pos, neg, score)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(5L)._1 > 0 && out(5L)._2 == "pos")
    assert(out(6L)._1 < 0 && out(6L)._2 == "neg")
    assert(out(7L)._1 == 0 && out(7L)._2 == "neg")
    // partition order must not change the integer scores
    val out2 = ops.TextStats.nbQualityScores(
      pos.repartition(7), neg.repartition(5), score.repartition(3))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out == out2)
  }

  test("nbQualityScores: training slices of the real corpus score all non-empty docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = ops.TextStats.nbQualityScores(
      docs.where(col("doc_id") % 11 === 0),
      docs.where(col("doc_id") % 11 =!= 0), docs)
    val withToks = docs
      .where(size(ops.TextStats.tokens(functions.F.lower_simple(col("text")))) > 0)
      .count()
    assert(out.count() == withToks)
    assert(out.where(col("label") === "pos").count() > 0)
    assert(out.where(col("label") === "neg").count() > 0)
  }

  test("skipgramPairs: hand-traced window-2 counts on 'a b c a'") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val got = ops.TextStats.skipgramPairs(docs, window = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Map(
      ("a", "b") -> 2L, ("b", "a") -> 2L, // d=1 (a,b) + d=2 (b,a) mirror
      ("b", "c") -> 1L, ("c", "b") -> 1L,
      ("c", "a") -> 2L, ("a", "c") -> 2L) // d=1 (c,a) + d=2 (a,c)
    assert(got == want)
  }

  test("skipgramPairs: symmetric (center,context) == (context,center); short docs contribute nothing") {
    import spark.implicits._
    val docs = Seq((1L, "x"), (2L, ""), (3L, "p q r s t p q")).toDF("doc_id", "text")
    val got = ops.TextStats.skipgramPairs(docs, window = 3, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { case ((c, x), n) => assert(got((x, c)) == n) }
    assert(!got.keys.exists(k => k._1 == "x" || k._2 == "x"))
  }

  test("domainKl: identical domain distributions give exactly 0; divergent domain is positive") {
    import spark.implicits._
    val same = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    val k0 = ops.TextStats.domainKl(same).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(k0("a") == 0L && k0("b") == 0L)
    val div = Seq(("a", "x x"), ("b", "y y")).toDF("source", "text")
    val k1 = ops.TextStats.domainKl(div).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // c_s(x)=2/2 vs corpus 2/4: sum = 2*(mn(1) - mn(0.5)) = 2*693147,
    // kl_nats = 1386294 / (2 * 1e6) = ln 2
    assert(k1("a") == (2L, 1386294L, 0.693147) && k1("b") == k1("a"))
  }

  test("domainKl: partition-invariant integer sums on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = ops.TextStats.domainKl(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = ops.TextStats.domainKl(docs.repartition(13)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a == b && a.nonEmpty)
    // KL >= 0, up to one micro-nat of floor-rounding per (domain, token)
    a.values.foreach(v => assert(v > -1000L))
  }
}
