package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  *  - value = headline triples/sec of the full KG pipeline (sentenize ->
  *    fused NER/morph/syntax inference -> triples -> linking ->
  *    canonicalization) at the high parallelism level
  *  - queries = per-query wall seconds for the whole SparkEntry catalog
  *  - scaling = the same pipeline at N and 4N EXECUTORS (separate JVMs via
  *    Spark local-cluster — the closest in-sandbox analogue of a real
  *    multi-executor cluster; falls back to local[N] threads if
  *    local-cluster cannot spawn) + efficiency = thr(4N)/(4*thr(N))
  */
object Bench {

  private def classesPath: String =
    new java.io.File(getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
      .getAbsolutePath

  private def clusterSession(workers: Int, coresPerWorker: Int): SparkSession = {
    System.setProperty("spark.test.home", sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,$coresPerWorker,6144]")
      .appName(s"graft-bench-${workers}x$coresPerWorker")
      .config("spark.executor.extraClassPath", classesPath)
      // size each executor's GC/JIT pools for ITS core share, not the box
      .config("spark.executor.extraJavaOptions",
        s"-XX:ActiveProcessorCount=$coresPerWorker -XX:+UseParallelGC")
      .config("spark.sql.shuffle.partitions", (workers * coresPerWorker).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def localSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** end-to-end pipeline: returns (triples, seconds) */
  private def pipeline(spark: SparkSession, nDocs: Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val docs = graft.sources.Docs.russianDocs(spark, nDocs)
    val parsed = graft.nlp.Pipeline.parse(graft.sources.Docs.sentences(docs),
      SparkEntry.packBc(spark))
    val canon = graft.kg.Kg.linkCanonicalize(spark, graft.kg.Kg.triples(parsed))
    val n = canon.count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  // one seeded reference-dims pack per session (navec 250K x 300d x 100q,
  // CNN [256,128,64] — the honest production-FLOPs workload)
  private val refPackCache =
    new graft.runtime.SessionCache[
      org.apache.spark.broadcast.Broadcast[graft.pack.ModelPack]]
  private def refPackBc(s: SparkSession) =
    refPackCache.getOrUpdate(s)(
      ss => ss.sparkContext.broadcast(graft.pack.SynthPack.buildRandom()))

  /** NLP inference at production model dims: returns (sentences, seconds).
    * Parse-only count: at these dims the forward pass is >99% of pipeline
    * cost (MicroBench: extract 0.10s vs ~25s forwards per 100k docs), and
    * random-weight parses would make triple counts meaningless — sents/s
    * is the honest metric for this leg.
    */
  private def refPipeline(spark: SparkSession, nDocs: Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val docs = graft.sources.Docs.russianDocs(spark, nDocs)
    val parsed = graft.nlp.Pipeline.parse(graft.sources.Docs.sentences(docs),
      refPackBc(spark))
    val n = parsed.count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  private def measureRef(s: SparkSession, nDocs: Long): (Long, Double) = {
    refPipeline(s, math.max(2000L, nDocs / 10)) // warmup/JIT
    (1 to 3).map(_ => refPipeline(s, nDocs)).minBy(_._2)
  }

  /** warmup + best-of-reps within one session (the sandbox VM has
    * host-steal noise; min is the honest steady-state estimate). Each leg
    * additionally runs THREE such sessions interleaved in time — steal
    * epochs last minutes, so no single window decides a leg (the
    * min-reduction lives HERE, inside the one driver-recorded run).
    */
  private def measure(s: SparkSession, scaleDocs: Long,
                      reps: Int): (Long, Double) = {
    // a 5k-doc warmup barely touches executor JIT: the first big run was
    // measured 2-3x slower than the second purely from compilation — warm
    // with ~1/12 of the real load so every measured rep is steady-state
    pipeline(s, math.max(5000L, scaleDocs / 12))
    (1 to reps).map(_ => pipeline(s, scaleDocs)).minBy(_._2)
  }

  /** One leg session's best-of-reps results. */
  final case class Leg(triples: Long, sec: Double, mode: String,
                       refSents: Long, refSec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cpusLow = math.max(1, cpus / 4)
    // scaling legs need enough work to amortize fixed job overhead —
    // per-leg fixed seconds (scheduling, broadcast, JIT residue) deflate
    // the high-parallelism leg disproportionately, so run ~24M docs per
    // measured leg at sf0.1
    val scaleDocs = graft.corpus.RuCorpus.docCount(sfDir) * 240

    // --- N executors, then 4N executors (each leg its own session)
    val coresPerWorker = 4
    // local-cluster can fail to LAUNCH executors in foreign environments
    // (missing SPARK_SCALA_VERSION etc.) — Spark would then hang waiting
    // for resources, so probe liveness with a timeout before trusting it
    def probe(s: SparkSession): Boolean = {
      @volatile var ok = false
      val t = new Thread(() => {
        try ok = s.range(1000).repartition(4).count() == 1000L
        catch { case _: Throwable => }
      })
      t.setDaemon(true); t.start(); t.join(90000)
      ok
    }
    // reference-dims inference is ~2 orders of magnitude more FLOPs/token;
    // size its legs so each stays multi-second without dominating the run
    // (the SIMD conv rework made inference ~5x faster — 200k docs keeps
    // the 32-core leg ~8s and the 8-core leg ~30s)
    val refDocs = math.max(80000L, graft.corpus.RuCorpus.docCount(sfDir) * 2)
    def leg(totalCores: Int): Leg = {
      // 3 reps x 3 interleaved sessions = 9 draws per leg: fresh-executor
      // JIT makes run1 of a session 1.3-1.9x slower than run3 even after
      // the doc warmup, and host steal swings adjacent runs ±50% — the
      // min over 9 draws is what actually converges (measured 2026-08-17)
      val reps = 3
      // exact core budget even when totalCores < coresPerWorker
      val cpw = math.min(coresPerWorker, totalCores)
      try {
        val s = clusterSession(math.max(1, totalCores / cpw), cpw)
        if (probe(s)) {
          try {
            val (n, t) = measure(s, scaleDocs, reps)
            val (rn, rt) = measureRef(s, refDocs)
            return Leg(n, t, "local-cluster", rn, rt)
          } finally s.stop()
        } else s.stop()
      } catch { case _: Throwable => }
      val s = localSession(totalCores)
      try {
        val (n, t) = measure(s, scaleDocs, reps)
        val (rn, rt) = measureRef(s, refDocs)
        Leg(n, t, "local", rn, rt)
      } finally s.stop()
    }
    // THREE time-interleaved sessions per leg (lo,hi,lo,hi,lo,hi); the
    // recorded figure is the min across sessions, and the per-session
    // spread is reported so the noise band is visible in the artifact
    // itself (hypervisor steal epochs last minutes — see BASELINE.md)
    val sessions = (1 to 3).map(_ => (leg(cpusLow), leg(cpus)))
    val los = sessions.map(_._1)
    val his = sessions.map(_._2)
    val lo = los.minBy(_.sec)
    val hi = his.minBy(_.sec)
    val thrLow = lo.triples / lo.sec
    val thrHigh = hi.triples / hi.sec
    val efficiency = thrHigh / (4.0 * thrLow)
    // ref-dims: pick the (sents, sec) PAIR from the min-ref-time session so
    // the throughput stays self-consistent even if leg inputs diverge
    val refLo = los.minBy(_.refSec)
    val refHi = his.minBy(_.refSec)
    val refThrLow = refLo.refSents / refLo.refSec
    val refThrHigh = refHi.refSents / refHi.refSec
    val refEff = refThrHigh / (4.0 * refThrLow)
    def secs(xs: Seq[Double]): String =
      xs.map(v => f"$v%.2f").mkString("[", ",", "]")

    // --- per-query catalog timings on plain local[cpus]; best-of-2 (the
    // host has hypervisor-level steal spikes that single-shot timings hit)
    val spark = localSession(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      name -> math.min(once(), once())
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val scaling =
      f"""{"cpus_low":$cpusLow,"cpus_high":$cpus,"docs":$scaleDocs,"mode":"${lo.mode}/${hi.mode}",""" +
        f""""sessions_per_leg":${sessions.length},""" +
        f""""sec_low_sessions":${secs(los.map(_.sec))},"sec_high_sessions":${secs(his.map(_.sec))},""" +
        f""""triples_low":${lo.triples},"sec_low":${lo.sec}%.2f,"triples_per_sec_low":$thrLow%.1f,""" +
        f""""triples_high":${hi.triples},"sec_high":${hi.sec}%.2f,"triples_per_sec_high":$thrHigh%.1f,""" +
        f""""efficiency":$efficiency%.3f}"""
    val refDims =
      f"""{"dims":"navec 250Kx300d 100q, cnn [256,128,64] k3, dense","docs":$refDocs,""" +
        f""""sents":${refHi.refSents},""" +
        f""""sec_low_sessions":${secs(los.map(_.refSec))},"sec_high_sessions":${secs(his.map(_.refSec))},""" +
        f""""sents_per_sec_low":$refThrLow%.1f,""" +
        f""""sents_per_sec_high":$refThrHigh%.1f,"efficiency":$refEff%.3f}"""
    println(
      f"""{"metric":"triples_per_sec","value":$thrHigh%.1f,"unit":"triples/sec","queries":$qs,"sf":"$sfDir","scaling":$scaling,"ref_dims":$refDims,"total_query_sec":${results.map(_._2).sum}%.1f}""")
    spark.stop()
  }
}
