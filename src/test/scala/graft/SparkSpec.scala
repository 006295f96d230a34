package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    // local[4, 2]: allow ONE task retry so ResumeSpec can inject a real
    // task failure and assert the commit counters stay honest under it
    val s = SparkSession.builder()
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** End-to-end pipeline goldens: the distributed output must equal the
  * planted corpus annotations AND the single-threaded oracle.
  */
class PipelineSpec extends AnyFunSuite {
  import graft.corpus.RuCorpus
  import graft.nlp.Pipeline
  import graft.sources.Docs

  lazy val spark: SparkSession = TestSpark.spark

  test("distributed parse equals single-threaded oracle on 60 docs") {
    val pack = SparkEntry.packBc(spark)
    val docs = Docs.russianDocs(spark, 60L)
    val parsed = Pipeline.parse(Docs.sentences(docs), pack)
      .collect()
      .map(p => (p.docId, p.spanOrder, p.sentIdx) ->
        (p.nerSpans.toSeq, p.morph.toSeq, p.syn.toSeq))
      .toMap
    val local = docs.collect()
    var checked = 0
    for (d <- local; (sp, order) <- d.spans.zipWithIndex if sp.kind == "text") {
      for (o <- Pipeline.oracleParse(pack.value, d.doc_id, order, sp.text)) {
        val got = parsed((o.docId, o.spanOrder, o.sentIdx))
        assert(got == ((o.nerSpans.toSeq, o.morph.toSeq, o.syn.toSeq)),
          s"doc=${d.doc_id} order=$order")
        checked += 1
      }
    }
    assert(checked > 60)
  }

  test("NER spans match planted dictionary entities") {
    val pack = SparkEntry.packBc(spark)
    val docs = Docs.russianDocs(spark, 40L)
    val parsed = Pipeline.parse(Docs.sentences(docs), pack).collect()
    assert(parsed.nonEmpty)
    for (p <- parsed; sp <- p.nerSpans) {
      val mention = p.text.substring(sp.start, sp.stop)
      val words = mention.split(" ")
      sp.tpe match {
        case "PER" =>
          assert(RuCorpus.firstNames.contains(words.head) &&
            RuCorpus.surnames.contains(words.last), mention)
        case "LOC" => assert(RuCorpus.cities.contains(mention), mention)
        case "ORG" => assert(
          (RuCorpus.orgsSubj ++ RuCorpus.orgsObj ++ RuCorpus.orgsGen).contains(mention), mention)
        case t => fail(s"unexpected type $t")
      }
    }
    // every planted PER mention is found: count sentences of template 0/1/3
    val perSents = parsed.count(_.nerSpans.exists(_.tpe == "PER"))
    assert(perSents > 10)
  }

  test("russianDocs: output invariant to slice layout (wave alignment is safe)") {
    // the wave-aligned slice count changes only HOW docs are split across
    // tasks; per-doc generation is id-keyed, so any layout must produce
    // the same triples (the contract the bench-leg slicing change relies on)
    def run(): Set[(String, Int, String, String, String)] =
      graft.kg.Kg.triples(Pipeline.parse(
          Docs.sentences(Docs.russianDocs(spark, 50L)), SparkEntry.packBc(spark)))
        .collect().map(t => (t.docId, t.spanOrder, t.subj, t.pred, t.obj)).toSet
    val base = run()
    assert(base.nonEmpty)
    for (n <- Seq("1", "3", "17")) {
      sys.props("graft.gen.slices") = n
      try assert(run() == base, s"slices=$n changed the output")
      finally sys.props.remove("graft.gen.slices")
    }
  }

  test("triples equal golden planted triples exactly") {
    import spark.implicits._
    val nDocs = 50L
    val got = graft.kg.Kg.triples(
      Pipeline.parse(Docs.sentences(Docs.russianDocs(spark, nDocs)), SparkEntry.packBc(spark)))
      .collect()
      .map(t => (t.docId, t.spanOrder, t.sentIdx, t.subj, t.pred, t.obj))
      .toSet
    val expected = (0L until nDocs).flatMap { id =>
      val spans = RuCorpus.docSpans(id)
      spans.zipWithIndex.collect { case (s, order) if s.kind == "text" =>
        // span k is sentence k of the doc: sentIdx within span = 0
        val textIdx = spans.take(order).count(_.kind == "text")
        RuCorpus.goldenTriples(id, textIdx).map(g =>
          (s"d$id", order, 0, g.subj, g.pred, g.obj))
      }.flatten
    }.toSet
    assert(got == expected)
  }

  test("span-sequence invariant holds via q_span_invariant") {
    val df = SparkEntry.queries("q_span_invariant")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(1)), "invariant violated")
  }

  test("annIvf with nprobe = cells equals exact brute-force top-k") {
    // probing every cell makes IVF an exact search — must match bruteTopK
    // bit for bit (same re-rank, same tie order)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(org.apache.spark.sql.functions.col("vec_id") % 97 === 0)
    val ivf = graft.ops.Similarity.annIvf(e, q, 5, cells = 8, nprobe = 8)
      .collect().map(_.toString).sorted
    val brute = graft.ops.Similarity.bruteTopK(e, q, 5)
      .collect().map(_.toString).sorted
    assert(ivf.nonEmpty && ivf.sameElements(brute))
  }

  test("kmeans: hand-traced tiny run; partition-invariant on real embeddings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 1-d points 0.0, 0.1, 1.0, 1.1 -> quantized 0, 100, 1000, 1100
    // init (k=2): cluster 0 = [0], cluster 1 = [100]
    // a0: 0->c0(d2=0), 100->c1(0), 1000->c1(810000 < 1000000), 1100->c1(1000000)
    // cent1: c0=[0], c1=[(100+1000+1100)/3 = 733]
    // a1: 0->c0(0), 100->c0(10000 < 400689), 1000->c1(71289), 1100->c1(134689)
    val tiny = Seq((0L, Array(0.0f)), (1L, Array(0.1f)),
      (2L, Array(1.0f)), (3L, Array(1.1f))).toDF("vec_id", "embedding")
    val r = graft.ops.Similarity.kmeans(tiny, k = 2, iters = 1).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(0L -> ((0L, 0L)), 1L -> ((0L, 10000L)),
      2L -> ((1L, 71289L)), 3L -> ((1L, 134689L))))
    // integer contract: repartitioning cannot move a single assignment
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = graft.ops.Similarity.kmeans(e.repartition(7), k = 4, iters = 2)
      .collect().map(_.toString).sorted
    val b = graft.ops.Similarity.kmeans(e.coalesce(1), k = 4, iters = 2)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("annIvfPq: recall vs brute, determinism, and exact-config equality") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 97 === 0)
    val pq = graft.ops.Similarity.annIvfPq(e, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pq2 = graft.ops.Similarity.annIvfPq(e, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pq.nonEmpty && pq.sorted.sameElements(pq2.sorted), "nondeterministic")
    // recall@5 vs the exact search: the fixture is UNSTRUCTURED gaussian
    // data, where a true neighbor lands in a probed cell with probability
    // ~nprobe/cells (= 0.25 here) — the theoretical recall ceiling of the
    // coarse probe (measured 0.23). Assert the floor at half that: much
    // lower would mean the ADC/rerank stage is discarding in-cell true
    // neighbors, which IS a bug regardless of data structure.
    val brute = graft.ops.Similarity.bruteTopK(e, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = pq.count { case (qid, _, nid) => brute.contains((qid, nid)) }
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.125, f"recall@5 $recall%.2f below nprobe/cells/2 floor")
    // nprobe = cells + rerank >= candidate count makes the PQ stage a
    // pure pre-filter: the exact-cosine rerank must equal brute top-k
    val exact = graft.ops.Similarity.annIvfPq(e, q, 5,
        cells = 8, nprobe = 8, rerank = 1000)
      .collect().map(_.toString).sorted
    val bruteAll = graft.ops.Similarity.bruteTopK(e, q, 5)
      .collect().map(_.toString).sorted
    assert(exact.sameElements(bruteAll))
  }

  test("fused linkCanonicalize == canonicalize(link(...)) row for row") {
    val triples = graft.kg.Kg.triples(Pipeline.parse(
      Docs.sentences(Docs.russianDocs(spark, 120L)), SparkEntry.packBc(spark)))
    val twoStep = graft.kg.Kg.canonicalize(spark, graft.kg.Kg.link(spark, triples))
      .collect().map(_.toString).sorted
    val fusedDf = graft.kg.Kg.linkCanonicalize(spark, triples)
    // broadcast-dict branch: the link probe is an object-mode
    // mapPartitions fused onto the extraction flatMap — no join operator,
    // no exchange, no per-action broadcast rebuild in the plan at all
    val plan = fusedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"fused path must be join- and shuffle-free; plan:\n${plan.take(2000)}")
    val fused = fusedDf.collect().map(_.toString).sorted
    assert(fused.sameElements(twoStep))
    assert(fused.nonEmpty)
  }

  test("linking above the broadcast threshold flips strategy, keeps rows identical") {
    // simulate a Wikidata-slice-sized dictionary: drop the broadcast hint
    // (threshold 0) and pin autoBroadcastJoinThreshold off so neither the
    // hint nor AQE re-broadcasts — the plan must become a shuffle join and
    // the output must not change by a single row
    val triples = graft.kg.Kg.triples(Pipeline.parse(
      Docs.sentences(Docs.russianDocs(spark, 80L)), SparkEntry.packBc(spark)))
    val want = graft.kg.Kg.linkCanonicalize(spark, triples)
      .collect().map(_.toString).sorted
    val conf = spark.conf
    val prevAuto = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      conf.set("spark.graft.link.broadcastMaxRows", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the cached dict's InMemoryRelation stores the plan it was BUILT
      // with (which legitimately used broadcasts) — judge the probe joins
      // by the plan prefix above the first cached relation
      def probePlan(df: org.apache.spark.sql.DataFrame): String = {
        val s = df.queryExecution.executedPlan.toString
        val cut = s.indexOf("InMemoryRelation")
        if (cut >= 0) s.substring(0, cut) else s
      }
      val df = graft.kg.Kg.linkCanonicalize(spark, triples)
      val plan = probePlan(df)
      assert(!plan.contains("BroadcastHashJoin"),
        s"hint must be dropped above the threshold; plan:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join; plan:\n${plan.take(2000)}")
      val got = df.collect().map(_.toString).sorted
      assert(got.sameElements(want), "non-broadcast path must be row-identical")
      // two-step path flips too
      val two = graft.kg.Kg.canonicalize(spark, graft.kg.Kg.link(spark, triples))
      assert(!probePlan(two).contains("BroadcastHashJoin"))
      assert(two.collect().map(_.toString).sorted.sameElements(want))
    } finally {
      conf.set("spark.graft.link.broadcastMaxRows", "4000000")
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("entity linking + canonicalization merge duplicate org ids") {
    import spark.implicits._
    val linked = graft.kg.Kg.link(spark,
      graft.kg.Kg.triples(Pipeline.parse(
        Docs.sentences(Docs.russianDocs(spark, 80L)), SparkEntry.packBc(spark))))
    val canon = graft.kg.Kg.canonicalize(spark, linked)
    val subjIds = canon.select("subj_id").as[String].collect().toSet
    // PER/ORG subjects resolve to entity ids, not mention literals
    assert(subjIds.exists(_.startsWith("Q")) || subjIds.exists(_.startsWith("L")))
    // canonical map collapses planted duplicate ids: L-ids and their Q twin
    val cm = graft.kg.Kg.canonicalMap(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val dupPairs = RuCorpus.aliasDict.groupBy(_.alias).values.filter(_.size > 1)
    assert(dupPairs.nonEmpty)
    for (group <- dupPairs) {
      val comps = group.map(a => cm(a.entityId)).toSet
      assert(comps.size == 1, s"alias group not merged: $group")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }

  test("AQE splits the skewed join partition (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled down so the fixture-sized hot key trips the
      // same OptimizeSkewedJoin rule a hot entity would at 100 TB
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // key 0 carries ~95% of all probe rows (the hot-PER-mention shape)
      val big = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(9900).select((col("id") % 99 + 1).as("k"), col("id").as("v")))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name"))
      val j = big.join(dim, "k")
      // execute j ITSELF (count() builds a separate QueryExecution whose
      // final adaptive plan j.queryExecution would never see)
      assert(j.collect().length == 209900)
      val plan = j.queryExecution.executedPlan.toString // final adaptive plan
      assert(plan.contains("skew=true"),
        s"AQE must have split the skewed partition:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("bucketed tables: co-located join plans with zero Exchange") {
    val sf = "/root/testdata/sf0.001"
    graft.ops.Bucketed.materialize(spark, sf)
    val conf = spark.conf
    val prevAuto = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = graft.ops.Bucketed.colocatedJoin(spark, sf)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(1500)}")
      // result identical to the plain (shuffling) join
      import org.apache.spark.sql.functions.col
      val plain = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
      assert(j.count() == plain.count())
      val a = j.select("o_orderkey", "c_custkey").collect().map(_.toString).sorted
      val b = plain.select("o_orderkey", "c_custkey").collect().map(_.toString).sorted
      assert(a.sameElements(b))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
  }
}

class CanonicalCacheSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("canonicalTriples is cached per (session, dir) and matches the uncached chain") {
    val d = "/root/testdata/sf0.001"
    val a = SparkEntry.canonicalTriples(spark, d)
    val b = SparkEntry.canonicalTriples(spark, d)
    // identity: a second call must NOT build a new (re-evaluated) frame
    assert(a eq b)
    val fresh = graft.kg.Kg.linkCanonicalize(spark,
      graft.kg.Kg.triples(SparkEntry.parsed(spark, d)))
    def keys(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString(" ")).sorted.toSeq
    assert(keys(a) == keys(fresh))
  }
}

class CcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("connected components on a chain + star + isolated vertex") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), // chain -> comp a
      ("x", "y"), ("x", "z"),             // star  -> comp x
      ("m", "n")).toDF("src", "dst")
    val vertices = Seq("a", "b", "c", "d", "x", "y", "z", "m", "n", "solo").toDF("id")
    val got = graft.kg.ConnectedComponents.run(edges, vertices)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x",
      "m" -> "m", "n" -> "m", "solo" -> "solo"))
  }

  test("long chain converges (log-round algorithm)") {
    import spark.implicits._
    val n = 64
    val edges = (0 until n - 1).map(i => (s"v${"%03d".format(i)}", s"v${"%03d".format(i + 1)}"))
      .toDF("src", "dst")
    val vertices = (0 until n).map(i => s"v${"%03d".format(i)}").toDF("id")
    val got = graft.kg.ConnectedComponents.run(edges, vertices).collect()
    assert(got.forall(_.getString(1) == "v000"))
  }
}
