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

  test("removeDupSpans: planted shared 25-token span removed from both docs, clean docs untouched") {
    import spark.implicits._
    val shared = (0 until 25).map(i => s"s$i").mkString(" ")
    val a = (0 until 7).map(i => s"pa$i").mkString(" ") + " " + shared
    val b = (0 until 5).map(i => s"pb$i").mkString(" ") + " " + shared
    val c = (0 until 30).map(i => s"pc$i").mkString(" ") // no dups
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = ops.Dedup.removeDupSpans(docs, k = 20, minDocs = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.size == 3)
    assert(out(1L)._1 == 32 && out(1L)._2 == 25)
    assert(out(2L)._1 == 30 && out(2L)._2 == 25)
    assert(out(3L) == ((30L, 0L,
      java.security.MessageDigest.getInstance("MD5")
        .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString)))
    // kept stream = the unique prefixes only
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._3 == md5((0 until 7).map(i => s"pa$i").mkString(" ")))
    assert(out(2L)._3 == md5((0 until 5).map(i => s"pb$i").mkString(" ")))
  }

  test("ccnetBuckets: buckets contiguous in key space, sized per ntile, partition-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = ops.TextStats.ccnetBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    rows.groupBy(_._2).foreach { case (_, g) =>
      // value-contiguity: max key of an earlier bucket <= min key of a later
      val byB = g.groupBy(_._4).view.mapValues(v => (v.map(_._3).min, v.map(_._3).max))
      byB.toSeq.sortBy(x => order(x._1)).sliding(2).foreach {
        case Seq((_, (_, hiMax)), (_, (loMin, _))) => assert(hiMax <= loMin)
        case _ =>
      }
      // same key value never splits across buckets
      g.groupBy(_._3).foreach { case (_, ks) => assert(ks.map(_._4).distinct.size == 1) }
      // sizes: each bucket within one key-run of the ntile target n/3
      val n = g.size
      if (n >= 3) {
        val q = n / 3
        val maxRun = g.groupBy(_._3).values.map(_.size).max
        byB.foreach { case (_, _) => () }
        g.groupBy(_._4).values.foreach(b =>
          assert(math.abs(b.size - q) <= maxRun + 1))
      }
    }
    val rows2 = ops.TextStats.ccnetBuckets(docs.repartition(11)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.sortBy(_._1).sameElements(rows2.sortBy(_._1)))
  }

  test("bpeFertility: pieces partition words exactly; ppm fields are the floor ratios") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = ops.TextStats.bpeMerges(docs, rounds = 3)
    val rows = ops.TextStats.bpeFertility(docs, merges).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.nonEmpty)
    // n_words per lang equals the corpus token count (the vocab join drops nothing)
    val tokCounts = docs
      .select(col("lang"),
        size(ops.TextStats.tokens(functions.F.lower_simple(col("text")))).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (lang, (nw, np, nc, ppw, cpp)) =>
      assert(nw == tokCounts(lang))
      assert(nw <= np && np <= nc) // pieces partition words: 1..chars pieces/word
      assert(ppw == np * 1000000L / nw && cpp == nc * 1000000L / np)
    }
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
