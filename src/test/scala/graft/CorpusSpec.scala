package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-assembly ops: dedup clustering, stratified sampling, sequence
  * packing, domain mixing — invariants checked on the sf0.001 documents
  * table (driver-oracle queries cover the exact values at sf0.01).
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("dedupClusters: pairs land in one cluster, survivors are cluster minima") {
    val pairs = ops.Dedup.minhashDupPairs(docs, 3, 32, 8, 0.1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dups")
    val cl = ops.Dedup.dedupClusters(docs, 3, 32, 8, 0.1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(cl.size == docs.count())
    // every dup pair shares a cluster
    pairs.foreach { case (a, b) =>
      assert(cl(a)._1 == cl(b)._1, s"pair ($a,$b) split across clusters")
    }
    // cluster id is the min member; keep <=> doc IS the min
    val members = cl.groupBy(_._2._1).view.mapValues(_.keys.min)
    members.foreach { case (cid, minDoc) => assert(cid == minDoc) }
    cl.foreach { case (doc, (cid, keep)) => assert(keep == (doc == cid)) }
    // docs in no pair are their own singleton cluster
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    cl.collect { case (doc, (cid, _)) if !inPairs.contains(doc) =>
      assert(cid == doc)
    }
  }

  test("stratifiedSample: deterministic, subset, rate-shaped") {
    val rates = Map("en" -> 0.5, "de" -> 0.0, "zh" -> 1.0)
    val s1 = ops.Corpus.stratifiedSample(docs, rates).collect().map(_.getLong(0)).sorted
    val s2 = ops.Corpus.stratifiedSample(docs, rates).collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "hash-based sample must be reproducible")
    val byLang = ops.Corpus.stratifiedSample(docs, rates)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("de"), "rate 0 keeps nothing")
    assert(byLang("zh") == total("zh"), "rate 1 keeps everything")
    val enFrac = byLang("en").toDouble / total("en")
    assert(enFrac > 0.2 && enFrac < 0.8, s"en fraction $enFrac far from 0.5")
    // default rate 1.0: unlisted langs all kept
    assert(byLang.getOrElse("fr", 0L) == total("fr"))
  }

  test("packSequences: per-shard boundary rule and full coverage") {
    val rows = ops.Corpus.packSequences(docs, 512, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == docs.count())
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (docId, sh, packId, nTok) =>
        assert(sh == docId % 8)
        assert(packId == cum / 512, s"doc $docId: pack $packId != ${cum / 512}")
        cum += nTok
      }
      // pack ids are nondecreasing in doc order
      assert(sorted.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("domainMix: shares sum to 1 and token totals add up") {
    val m = ops.Corpus.domainMix(docs).collect()
    val shareSum = m.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"share sum $shareSum")
    val tokTotal = m.map(_.getAs[Long]("n_tokens")).sum
    val expected = docs.select(sum(size(ops.TextStats.tokens(col("text")))))
      .first().getLong(0)
    assert(tokTotal == expected)
    assert(m.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("piiScrub: redacts every class, counts on original text") {
    import spark.implicits._
    val in = Seq(
      (1L, "пишите на ivan.petrov+news@mail.example.ru или звоните +7 (921) 123-45-67"),
      (2L, "см. https://example.com/a?b=c и сервер 192.168.10.1 (порт 8080)"),
      (3L, "обычный текст без контактов, цена 100 руб."),
      (4L, "два адреса: a@b.io b@c.org, два ip 10.0.0.1 10.0.0.2")
    ).toDF("doc_id", "text")
    val out = ops.TextStats.piiScrub(in).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1 && out(1L).getLong(4) == 1) // email+phone
    assert(out(1L).getString(5) ==
      "пишите на <EMAIL> или звоните <PHONE>")
    assert(out(2L).getLong(2) == 1 && out(2L).getLong(3) == 1) // url+ip
    assert(out(2L).getString(5) == "см. <URL> и сервер <IP> (порт 8080)")
    assert(out(3L).getString(5) == "обычный текст без контактов, цена 100 руб.")
    assert(Seq(1, 2, 3, 4).map(i => out(3L).getLong(i)).sum == 0)
    assert(out(4L).getLong(1) == 2 && out(4L).getLong(3) == 2)
    assert(out(4L).getString(5) == "два адреса: <EMAIL> <EMAIL>, два ip <IP> <IP>")
  }

  test("dupNgramSpans: overlapping hits merge, within-doc repeats excluded") {
    import spark.implicits._
    val in = Seq(
      (1L, "a b c d e f"),          // shares "a b c d" with doc 2
      (2L, "x x a b c d y"),
      (3L, "p q r p q r p q r"),    // repeats only WITHIN one doc -> no rows
      (4L, "m n o k1 u v w"),       // two separated shared runs with doc 5
      (5L, "m n o k2 u v w")
    ).toDF("doc_id", "text")
    val out = ops.Dedup.dupNgramSpans(in, k = 3, minDocs = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      (1L, 0L, 3L, 2L), (2L, 2L, 5L, 2L),
      (4L, 0L, 2L, 1L), (4L, 4L, 6L, 1L),
      (5L, 0L, 2L, 1L), (5L, 4L, 6L, 1L)))
  }

  test("bloomDecontaminate: result-identical to exact; no false negatives; filters") {
    val bench = docs.where(col("doc_id") % 97 === 0)
    val train = docs.where(col("doc_id") % 97 =!= 0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = toMap(ops.Dedup.decontaminate(train, bench, 3))
    assert(exact.nonEmpty, "fixture should contain bench collisions")
    assert(toMap(ops.Dedup.bloomDecontaminate(train, bench, 3)) == exact)
    // the guarantee the equality rests on: every built hash probes true
    val hs = ops.Dedup.shingleHashes(bench, 3).select("shingle")
      .collect().map(_.getLong(0))
    val words = functions.Bloom64.build(hs)
    hs.foreach(h => assert(functions.Bloom64.contains(words, 5, h)))
    // and the filter actually filters: ~16 bits/elem + k=5 -> fpp ~5e-4
    val probes = 20000
    val fp = (1 to probes).count(i =>
      functions.Bloom64.contains(words, 5, corpus.RuCorpus.mix(0x5DEECE66DL * i)))
    assert(fp < probes / 50, s"false-positive count $fp of $probes too high")
  }

  test("minhashCrossPairs / fuzzyDecontaminationReport: exact copy flagged at 1.0; cross == union restricted") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    def mk(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val train = mk(Seq(1L -> base,
      3L -> "completely different words entirely unrelated content here now"))
    val bench = mk(Seq(200L -> base))
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pairs = key(ops.Dedup.minhashCrossPairs(train, bench, 3, 32, 8, 0.1)
      .collect())
    assert(pairs == Set((1L, 200L, 1.0)))
    val rep = key(ops.Dedup.fuzzyDecontaminationReport(train, bench,
      3, 32, 8, 0.1).collect())
    assert(rep == Set((1L, 1L, 1.0)))
    // signatures are row-local: the cross pairs equal the union-table
    // self-pairs restricted to cross-side (the oracle's construction)
    val un = ops.Dedup.minhashDupPairs(train.unionByName(bench), 3, 32, 8, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a < 100L) != (b < 100L) }
      .map { case (a, b, j) => if (a < 100L) (a, b, j) else (b, a, j) }.toSet
    assert(un == pairs)
  }

  test("lengthQuantiles: cutoff is the tight bucket bound around the exact quantile") {
    val lens = docs.select(length(col("text"))).collect().map(_.getInt(0)).sorted
    val n = lens.length
    val out = ops.TextStats.lengthQuantiles(docs, 64, Seq(50, 90, 99)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(50, 90, 99))
    out.foreach { case (p, (cutoff, cum)) =>
      assert(cum * 100 >= p.toLong * n, s"p$p cum $cum misses threshold")
      // nearest-rank exact percentile lives in the reported bucket
      val exact = lens(math.max(0, math.ceil(n * p / 100.0).toInt - 1))
      assert(exact >= cutoff - 64 && exact < cutoff,
        s"p$p exact $exact outside bucket [${cutoff - 64}, $cutoff)")
    }
  }

  test("curate: every stage drops exactly its target; survivors get packed") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val docs = Seq(
      (1L, "ru", a),                            // near-dup cluster survivor
      (2L, "ru", a),                            // identical twin -> dropped by dedup
      (3L, "ru", "one two three four five six seven eight nine ten eleven twelve"),
      // ^ shares 3-gram "five six seven" with bench -> dropped by decontaminate
      (4L, "xx", "red orange yellow green blue indigo violet pink brown black white"),
      // ^ lang rate 0 -> dropped by the stratified sample
      (5L, "ru", "cat dog bird fish horse cow sheep goat duck hen pig"),
      (6L, "ru", "too short text here")         // < 10 tokens -> dropped at the gate
    ).toDF("doc_id", "lang", "text")
    val bench = Seq((99L, "ru", "contains five six seven among other words entirely"))
      .toDF("doc_id", "lang", "text")
    val out = ops.Corpus.curate(docs, bench,
        Map("ru" -> 1.0, "xx" -> 0.0), minTokens = 10, dedupThreshold = 0.1)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 0L, 11L), (5L, 5L, 0L, 11L)))
  }

  test("curate/curateDsir: precomputed whole-corpus dupPairs give identical output") {
    // pairwise-restriction equivalence (Corpus.gatedPairs): pairs computed
    // on the WHOLE corpus, restricted to the gated slice, must reproduce
    // the from-scratch gated-pair derivation exactly — on the real fixture
    // table, where near-dup pairs and every gate actually fire
    val all = docs
    val bench = all.where(col("doc_id") % 97 === 0)
    val train = all.where(col("doc_id") % 97 =!= 0)
    val pairs = ops.Dedup.minhashDupPairs(all, 3, 32, 8, 0.1).localCheckpoint()
    val rates = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.8, "fr" -> 1.0, "es" -> 0.125)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val scratch = key(ops.Corpus.curate(train, bench, rates,
      minTokens = 10, dedupThreshold = 0.1))
    val reused = key(ops.Corpus.curate(train, bench, rates,
      minTokens = 10, dedupThreshold = 0.1, dupPairs = Some(pairs)))
    assert(scratch.nonEmpty)
    assert(reused == scratch)
    val target = all.where(col("doc_id") % 23 === 0)
    val trainD = all.where(col("doc_id") % 97 =!= 0 && col("doc_id") % 23 =!= 0)
    val scratchD = key(ops.Corpus.curateDsir(trainD, bench, target, k = 100,
      minTokens = 10, dedupThreshold = 0.1))
    val reusedD = key(ops.Corpus.curateDsir(trainD, bench, target, k = 100,
      minTokens = 10, dedupThreshold = 0.1, dupPairs = Some(pairs)))
    assert(reusedD == scratchD)
  }

  test("shared shingle table: jaccard/decontaminate/bloom/curate derived paths == from-scratch") {
    // one distinct (doc_id, shingle-string) table, the derived forms the
    // session cache feeds (SparkEntry.shingleTable3) — each must reproduce
    // its from-scratch twin exactly on the real fixture
    val sh3 = ops.Dedup.shingles(docs, 3).localCheckpoint()
    val hsh3 = sh3.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .localCheckpoint()
    def pairKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val jacScratch = pairKey(ops.Dedup.ngramJaccardPairs(docs, 3, 0.1))
    val jacDerived = pairKey(ops.Dedup.ngramJaccardPairs(docs, 3, 0.1,
      shinglesOpt = Some(hsh3)))
    assert(jacScratch.nonEmpty && jacDerived == jacScratch)
    val mhScratch = pairKey(ops.Dedup.minhashDupPairs(docs, 3, 32, 8, 0.1))
    val mhDerived = pairKey(ops.Dedup.minhashDupPairs(docs, 3, 32, 8, 0.1,
      shinglesOpt = Some(sh3)))
    assert(mhScratch.nonEmpty && mhDerived == mhScratch)
    // one-pass double-hash table: its xxhash64 view must equal (as a
    // multiset) the xxhash64 of the distinct STRING table, and the pair
    // builder over it must reproduce the string-path pair set exactly
    val dh3 = ops.Dedup.shingleDoubleHashes(docs, 3).localCheckpoint()
    def viewKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viewKey(dh3.select("doc_id", "shingle")) == viewKey(hsh3))
    val mhHashed = pairKey(ops.Dedup.minhashDupPairsFromHashes(dh3, 32, 8, 0.1))
    assert(mhHashed == mhScratch)
    val bench = docs.where(col("doc_id") % 97 === 0)
    val train = docs.where(col("doc_id") % 97 =!= 0)
    def hitKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = hitKey(ops.Dedup.decontaminate(train, bench, 3))
    val hashed = hitKey(ops.Dedup.decontaminateHashed(
      hsh3.where(col("doc_id") % 97 =!= 0),
      hsh3.where(col("doc_id") % 97 === 0)))
    assert(exact.nonEmpty && hashed == exact)
    val (bh, words) = ops.Dedup.benchBloomBuild(bench, 3)
    assert(hitKey(ops.Dedup.bloomDecontaminateWith(train, bh, words, 3,
      shinglesOpt = Some(hsh3))) == exact)
    val rates = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.8, "fr" -> 1.0, "es" -> 0.125)
    def packKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val cScratch = packKey(ops.Corpus.curate(train, bench, rates,
      minTokens = 10, dedupThreshold = 0.1))
    val cDerived = packKey(ops.Corpus.curate(train, bench, rates,
      minTokens = 10, dedupThreshold = 0.1,
      benchFilter = Some((bh, words)), docShingles = Some(hsh3)))
    assert(cScratch.nonEmpty && cDerived == cScratch)
  }

  test("fuzzyDecontaminationReportFromPairs == from-scratch report") {
    val bench = docs.where(col("doc_id") % 89 === 0)
    val train = docs.where(col("doc_id") % 89 =!= 0)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val scratch = key(ops.Dedup.fuzzyDecontaminationReport(
      train, bench, 3, 32, 8, 0.1))
    val pairs = ops.Dedup.minhashDupPairs(docs, 3, 32, 8, 0.1)
    val derived = key(ops.Dedup.fuzzyDecontaminationReportFromPairs(pairs,
      t => t % 89 =!= 0, b => b % 89 === 0, 0.1))
    assert(derived == scratch)
  }

  test("lmPerplexity: hand-computed bigram LM; unseen-gram backoff; <2-token docs absent") {
    import spark.implicits._
    // independent in-test twin of the micro-nat contract
    def mn(c12: Long, c1: Long, v: Long): Long =
      math.floor(math.log((c12 + 1).toDouble / (c1 + v).toDouble) * 1e6 + 0.5).toLong
    def avgOf(mns: Seq[Long]): Double = -(mns.sum.toDouble / (mns.length * 1e6))
    def rnd(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    // corpus: unigrams a:2 b:2 c:1 solo:1 (V=4); bigrams ab:1 ba:1 bc:1
    val in = Seq((1L, "a b a"), (2L, "b c"), (3L, "solo")).toDF("doc_id", "text")
    val out = ops.TextStats.lmPerplexity(in).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L)) // "solo" has no bigrams
    val d1 = Seq(mn(1, 2, 4), mn(1, 2, 4)) // (a,b), (b,a): p = 2/6 each
    val d2 = Seq(mn(1, 2, 4))              // (b,c): p = 2/6
    assert(out(1L) == ((2L, rnd(avgOf(d1)), rnd(math.exp(avgOf(d1))))))
    assert(out(2L) == ((1L, rnd(avgOf(d2)), rnd(math.exp(avgOf(d2))))))

    // model != docs: unseen bigram and unseen token back off to the
    // smoothing floor instead of being dropped
    val model = Seq((1L, "a b a")).toDF("doc_id", "text") // uni a:2 b:1, V=2
    val score = Seq((9L, "b z")).toDF("doc_id", "text")   // (b,z): c12=0, c1(b)=1
    val s = ops.TextStats.lmPerplexity(score, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val bz = Seq(mn(0, 1, 2))
    assert(s(9L) == ((1L, rnd(avgOf(bz)), rnd(math.exp(avgOf(bz))))))
  }

  test("tfidfTop: hand-computed micro-nat idf, score order, term tie-break") {
    import spark.implicits._
    // independent in-test twin of the micro-nat idf contract
    def idf(n: Long, df: Long): Long =
      math.floor(math.log((1 + n).toDouble / (1 + df).toDouble) * 1e6 + 0.5).toLong
    // tf: d1 a:2 b:1; d2 a:1 c:1; d3 b:4.  df: a:2 b:2 c:1.  N=3
    val in = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b b"))
      .toDF("doc_id", "text")
    val out = ops.TextStats.tfidfTop(in, topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      (1L, 1L) -> (("a", 2L, 2L, 2 * idf(3, 2))),
      (1L, 2L) -> (("b", 1L, 2L, idf(3, 2))),
      (2L, 1L) -> (("c", 1L, 1L, idf(3, 1))),
      (2L, 2L) -> (("a", 1L, 2L, idf(3, 2))),
      (3L, 1L) -> (("b", 4L, 2L, 4 * idf(3, 2)))))
    // equal scores break ties on term text ascending
    val tie = ops.TextStats.tfidfTop(
      Seq((1L, "x y"), (2L, "x"), (3L, "y")).toDF("doc_id", "text"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(tie((1L, 1L)) == "x" && tie((1L, 2L)) == "y")
  }

  test("pmiCollocations: hand-computed micro-nat PMI, count floor") {
    import spark.implicits._
    // unigrams a:3 b:3 (T=6); bigrams (a,b):3 (b,a):1 (B=4)
    val in = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = ops.TextStats.pmiCollocations(in, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // pmi(a,b) = ln(3*6*6 / (4*3*3)) = ln(3) -> floor(ln(3)*1e6 + 0.5)
    val pmiAb = math.floor(math.log(3.0) * 1e6 + 0.5).toLong
    assert(out == Map(("a", "b") -> ((3L, 3L, 3L, pmiAb))))
    // floor 1 keeps the reverse pair too, with pmi = ln(1*36/36) = 0
    val all = ops.TextStats.pmiCollocations(in, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(all(("b", "a")) == math.floor(math.log(1.0 * 6 * 6 / (4.0 * 3 * 3)) * 1e6 + 0.5).toLong)
  }

  test("hllTokenDistinct: partition-invariant registers, sane estimates") {
    import spark.implicits._
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i % 2 == 0) "aa" else "bb",
        (0 until 20).map(j => s"tok${(i * 7 + j * 13) % 500}").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    // register max is order-independent: any partitioning, same sketch
    val a = ops.TextStats.hllTokenDistinct(docs.repartition(13)).collect()
      .map(_.toString).sorted.toSeq
    val b = ops.TextStats.hllTokenDistinct(docs.coalesce(1)).collect()
      .map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
    // estimates land within the m=64 error regime (sigma ~ 1.04/8 = 13%)
    val rows = ops.TextStats.hllTokenDistinct(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4)))).toMap
    rows.foreach { case (lang, (exact, est)) =>
      assert(math.abs(est - exact) / exact < 0.5,
        s"$lang: est $est vs exact $exact")
    }
  }

  test("cmsTopK: overestimate property, partition-invariant registers, row sums") {
    import spark.implicits._
    val docs = (0 until 300).map(i =>
      (i.toLong, "ru",
        // skewed: 'hot' appears every row, a long tail appears rarely
        "hot " + (0 until 10).map(j => s"w${(i * 3 + j * 11) % 400}").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    // register addition is order-independent: any partitioning, same table
    val a = ops.TextStats.cmsRegisters(docs.repartition(13)).collect()
      .map(_.toString).sorted.toSeq
    val b = ops.TextStats.cmsRegisters(docs.coalesce(1)).collect()
      .map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
    // every row of the sketch conserves the total token count
    val totalToks = 300L * 11
    val rowSums = ops.TextStats.cmsRegisters(docs)
      .groupBy("i").agg(org.apache.spark.sql.functions.sum("cnt").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowSums.size == ops.TextStats.CmsDepth)
    rowSums.foreach { case (i, s) => assert(s == totalToks, s"row $i sum $s") }
    // the Count-Min guarantee: estimate >= exact, never under; and the
    // true heavy hitter surfaces at the top
    val top = ops.TextStats.cmsTopK(docs, k = 30).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 300L)
  }

  test("bpeMerges: hand-traced merges, overlap counting, early exhaustion") {
    import spark.implicits._
    // words: ab x3, cab x1. r1: (a,b)=3+1=4 beats (c,a)=1 -> merge 'ab'
    // r2: only (c,ab)=1 remains -> merge 'cab'; r3: nothing left -> stop
    val in = Seq((1L, "ab ab cab"), (2L, "ab")).toDF("doc_id", "text")
    val m = ops.TextStats.bpeMerges(in, rounds = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "b", 4L), (2, "c", "ab", 1L)))
    // counting is OVERLAPPING ((a,a) x3 in 'aaaa'), the rewrite is
    // left-to-right NON-overlapping ('aaaa' -> [aa, aa])
    val aa = ops.TextStats.bpeMerges(
      Seq((1L, "aaaa")).toDF("doc_id", "text"), rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(aa == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpeEncode: train->encode round trip — hand trace, merge coverage, reconstruction; packBpe") {
    import spark.implicits._
    val in = Seq((1L, "ab ab cab"), (2L, "ab"), (3L, "abc abd")).toDF("doc_id", "text")
    // trace: r1 (a,b)=6 -> 'ab'; r2 tie cnt=1, (ab,c) wins l-asc -> 'abc';
    // r3 (ab,d) wins over (c,ab) -> 'abd'
    val merges = ops.TextStats.bpeMerges(in, rounds = 3)
    val enc = ops.TextStats.bpeEncode(in, merges)
    val rows = enc.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    // pieces sorted asc: ab=1, abc=2, abd=3, c=4
    assert(rows == Seq(
      (1L, 0L, 0L, "ab", 1L), (1L, 1L, 0L, "ab", 1L),
      (1L, 2L, 0L, "c", 4L), (1L, 2L, 1L, "ab", 1L),
      (2L, 0L, 0L, "ab", 1L),
      (3L, 0L, 0L, "abc", 2L), (3L, 1L, 0L, "abd", 3L)))
    // every trained merge's OUTPUT actually appears as an emitted piece
    val pieces = rows.map(_._4).toSet
    merges.collect().foreach(m =>
      assert(pieces.contains(m.getString(1) + m.getString(2)),
        s"merge ${m.getString(1)}+${m.getString(2)} never applied"))
    // fixture corpus: concat(pieces in seq order) reconstructs every word
    val m6 = ops.TextStats.bpeMerges(docs, rounds = 6)
    val recon = ops.TextStats.bpeEncode(docs, m6)
      .groupBy("doc_id", "pos")
      .agg(array_join(transform(array_sort(collect_list(struct(col("seq"), col("piece")))),
        x => x.getField("piece")), "").as("word"))
    val src = docs.select(col("doc_id"),
      posexplode(ops.TextStats.tokens(functions.F.lower_simple(col("text")))))
      .toDF("doc_id", "pos", "w")
    assert(recon.join(src, Seq("doc_id", "pos"))
      .where(col("word") =!= col("w")).count() == 0)
    assert(recon.count() == src.count())
    // packBpe: doc1 = 4 pieces, doc2 = 1, doc3 = 2; budget 2, 1 shard
    val p = ops.Corpus.packBpe(in, merges, budget = 2, shards = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(p == Map(1L -> ((0L, 4L)), 2L -> ((2L, 1L)), 3L -> ((2L, 2L))))
  }

  test("unigramEncode: fx twin, reconstruction, optimal vs all-vocab brute force, unk on unseen chars") {
    import spark.implicits._
    // fx fixed-point log2: hand values (f*256 + (x*256 >> f) - 256)
    assert(ops.TextStats.fx(1L) == 0L && ops.TextStats.fx(2L) == 256L &&
      ops.TextStats.fx(3L) == 384L && ops.TextStats.fx(4L) == 512L)
    val merges = ops.TextStats.bpeMerges(docs, rounds = 3)
    val scores = ops.TextStats.unigramScores(docs, merges)
    val vm = scores.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(vm.values.forall(_ < 0L)) // negative centibits: cnt < total
    val enc = ops.TextStats.unigramEncodeWith(docs, scores).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(enc.nonEmpty)
    // per word occurrence: pieces sorted by seq concatenate to the word,
    // every piece is in vocab (the BPE alphabet covers the corpus), the
    // reported score is their sum, and it is >= every all-vocab
    // segmentation's score (brute force over all compositions)
    def bruteBest(w: String): Long = {
      def go(i: Int): Long = // best all-vocab score of suffix from i
        if (i == w.length) 0L
        else (i + 1 to w.length).foldLeft(Long.MinValue) { (b, e) =>
          vm.get(w.substring(i, e)) match {
            case Some(s) =>
              val rest = go(e)
              if (rest == Long.MinValue) b else math.max(b, s + rest)
            case None => b
          }
        }
      go(0)
    }
    val checkedWords = scala.collection.mutable.Set.empty[String]
    enc.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      val srt = rows.sortBy(_._3)
      assert(srt.map(_._3).sameElements(rows.indices.map(_.toLong)))
      val word = srt.map(_._4).mkString
      assert(srt.forall(t => vm.contains(t._4)), s"non-vocab piece in $word")
      val sum = srt.map(t => vm(t._4)).sum
      assert(rows.head._5 == sum && rows.head._6 == rows.length.toLong)
      if (word.length <= 8 && checkedWords.add(word))
        assert(sum == bruteBest(word), s"suboptimal segmentation of $word")
    }
    assert(checkedWords.nonEmpty)
    // unseen character falls back to a single-char UNK piece priced at
    // min(score) - 2560, and the word still reconstructs
    val alien = Seq((9999L, "zzß", "de", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val arow = ops.TextStats.unigramEncodeWith(alien, scores).collect()
      .map(r => (r.getLong(2), r.getString(3), r.getLong(4)))
    val apieces = arow.sortBy(_._1).map(_._2)
    assert(apieces.mkString == "zzß" && apieces.contains("ß"))
    assert(!vm.contains("ß"))
  }

  test("tokenizerCompare: columns equal the standalone fertilities; delta consistent") {
    val merges = ops.TextStats.bpeMerges(docs, rounds = 3)
    val cmp = ops.TextStats.tokenizerCompare(docs, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(cmp.nonEmpty)
    val bpe = ops.TextStats.bpeFertility(docs, merges).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    // independent recompute of the unigram column from the vocab table
    val uniVocab = ops.TextStats.unigramVocab(docs,
        ops.TextStats.unigramScores(docs, merges)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val byLang = docs.select(col("lang"),
        explode(ops.TextStats.tokens(functions.F.lower_simple(col("text")))).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (l, ws) =>
        val np = ws.map(w => uniVocab(w._2)).sum
        l -> np * 1000000L / ws.length
      }
    cmp.foreach { case (lang, (b, u, d)) =>
      assert(b == bpe(lang) && d == u - b && u == byLang(lang))
    }
  }

  test("ngramCounts: bigram counts equal a hand count; unigram path") {
    import spark.implicits._
    val in = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val bg = ops.TextStats.ngramCounts(in, 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bg == Map("a b" -> 3, "b a" -> 1, "b c" -> 1, "b x" -> 1))
    val ug = ops.TextStats.ngramCounts(in, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ug == Map("a" -> 3, "b" -> 3, "c" -> 1, "x" -> 1))
    // minCount filter
    val f = ops.TextStats.ngramCounts(in, 2, 2).collect()
    assert(f.map(_.getString(0)).toSeq == Seq("a b"))
    // one-word docs contribute nothing at n=2
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(ops.TextStats.ngramCounts(one, 2).count() == 0)
  }

  test("ngramCountsHashed == ngramCounts on the fixture corpus (100 TB shuffle-diet path)") {
    for ((n, minCount) <- Seq((2, 2L), (3, 1L), (1, 5L))) {
      val a = ops.TextStats.ngramCounts(docs, n, minCount).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val b = ops.TextStats.ngramCountsHashed(docs, n, minCount).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(a == b, s"n=$n minCount=$minCount")
      assert(a.nonEmpty)
    }
  }

  test("dedupClusters: negative doc ids fail loudly (lpad order invariant)") {
    import spark.implicits._
    // two identical texts so a dup pair (hence the padded edge path) exists
    val bad = Seq((-1L, "a b c d e f g h"), (7L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      ops.Dedup.dedupClusters(bad, 3, 32, 8, 0.1).collect()
    }
    assert(e.getMessage != null)
  }

  test("curateDsir: cleaning stages compose, DSIR picks the target-like survivors") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val in = Seq(
      (1L, "ru", a),                            // near-dup cluster survivor
      (2L, "ru", a),                            // identical twin -> dedup-dropped
      (3L, "ru", "one two three four five six seven eight nine ten eleven twelve"),
      // ^ shares 3-gram "five six seven" with bench -> decontaminated
      (4L, "xx", "red orange yellow green blue indigo violet pink brown black white"),
      // ^ clean, but off-domain -> the doc DSIR leaves out at k=2
      (5L, "ru", "cat dog bird fish horse cow sheep goat duck hen pig"),
      (6L, "ru", "too short text here")         // < 10 tokens -> gate-dropped
    ).toDF("doc_id", "lang", "text")
    val bench = Seq((99L, "ru", "contains five six seven among other words entirely"))
      .toDF("doc_id", "lang", "text")
    val target = Seq(
      (50L, "ru", "cat dog bird alpha beta gamma fish horse kappa lambda"))
      .toDF("doc_id", "lang", "text")
    val out = ops.Corpus.curateDsir(in, bench, target, k = 2,
        minTokens = 10, dedupThreshold = 0.1)
      .as[(Long, Long, Long, Long)].collect().toSet
    // clean pool = {1, 4, 5}; the composite must select exactly what
    // standalone DSIR selects on that pool — and the fixture's target
    // shares vocabulary with 1 and 5 only, so off-domain 4 loses
    val clean = in.where(col("doc_id").isin(1L, 4L, 5L))
    val expIds = ops.TextStats.dsirSelect(clean, target, 2)
      .collect().map(_.getLong(0)).toSet
    assert(expIds == Set(1L, 5L), s"fixture should make docs 1,5 win, got $expIds")
    assert(out.map(_._1) == expIds)
    // packing columns = packSequences over exactly the selected docs
    val expPack = ops.Corpus.packSequences(
        in.where(col("doc_id").isin(expIds.toSeq: _*)), 512, 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == expPack)
  }

  test("dsirSelect: deterministic, partition-invariant, exact Gumbel-top-k") {
    val raw = docs.where(col("doc_id") % 23 =!= 0)
    val tgt = docs.where(col("doc_id") % 23 === 0)
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val sel = ops.TextStats.dsirSelect(raw, tgt, 20).collect().map(tup)
    assert(sel.length == 20)
    val sel2 = ops.TextStats.dsirSelect(raw.repartition(13), tgt.repartition(7), 20)
      .collect().map(tup)
    assert(sel.sameElements(sel2), "selection must be partition-invariant")
    // gumbel is the md5-ppm Gumbel and sel_key = logw + gumbel, exactly
    def ppm(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L
    }
    def gumbel(id: Long): Long = {
      val u = (ppm(id) + 0.5) / 1e6
      math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
    }
    sel.foreach { case (id, _, logw, gum, key) =>
      assert(gum == gumbel(id)); assert(key == logw + gum)
    }
    // the selected set IS the brute-force top-k of logw + gumbel over
    // every scored doc (Gumbel-top-k = weighted sample w/o replacement)
    val brute = ops.TextStats.dsirLogWeights(raw, tgt).collect()
      .map(r => (r.getLong(2) + gumbel(r.getLong(0)), r.getLong(0)))
      .sortBy { case (k, id) => (-k, id) }.take(20).map(_._2)
    assert(sel.map(_._1).sameElements(brute))
  }

  test("dsirLogWeights: target-like docs outweigh off-domain docs") {
    import spark.implicits._
    val tgt = (1L to 40L)
      .map(i => (i, "quantum lattice gauge theory renormalization flow"))
      .toDF("doc_id", "text")
    val rawLike = (100L to 119L)
      .map(i => (i, "lattice gauge flow quantum renormalization"))
    val rawOff = (200L to 219L)
      .map(i => (i, "cheap flights hotel booking deals tonight"))
    val raw = (rawLike ++ rawOff).toDF("doc_id", "text")
    val w = ops.TextStats.dsirLogWeights(raw, tgt).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.size == 40)
    rawLike.foreach { case (i, _) =>
      rawOff.foreach { case (j, _) =>
        assert(w(i) > w(j), s"target-like doc $i (${w(i)}) should outweigh " +
          s"off-domain doc $j (${w(j)})")
      }
    }
  }
}
