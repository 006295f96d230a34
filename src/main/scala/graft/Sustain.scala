package graft

import org.apache.spark.sql.SparkSession

/** Sustained-throughput evidence: run the flagship pipeline (generate →
  * sentenize → fused NER/morph/syntax inference → triple extraction →
  * linking → canonicalization) over many sequential slices and report each
  * slice's triples/s plus driver-heap occupancy. A 10^12-doc job is this
  * loop continued: per-slice throughput must stay FLAT (no state
  * accumulates across jobs — the model broadcast and alias dictionary are
  * session-scoped constants, nothing else persists) and driver heap must
  * not grow. args = cpus docsPerSlice slices
  */
object Sustain {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val docsPerSlice = if (args.length > 1) args(1).toLong else 8000000L
    val slices = if (args.length > 2) args(2).toInt else 12
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-sustain")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Docs
    def slice(n: Long): Long =
      graft.kg.Kg.linkCanonicalize(spark,
        graft.kg.Kg.triples(graft.nlp.Pipeline.parse(
          Docs.sentences(Docs.russianDocs(spark, n)), SparkEntry.packBc(spark)))).count()
    slice(docsPerSlice / 4) // warmup: JIT + broadcast build, untimed
    var totalTriples = 0L
    val t00 = System.nanoTime()
    val thrs = (1 to slices).map { i =>
      val t0 = System.nanoTime()
      val n = slice(docsPerSlice)
      val sec = (System.nanoTime() - t0) / 1e9
      totalTriples += n
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / 1024 / 1024
      println(f"SLICE $i%2d docs=$docsPerSlice triples=$n sec=$sec%.1f thr=${n / sec}%.0f/s driver_heap_mb=$heapMb")
      n / sec
    }
    val wall = (System.nanoTime() - t00) / 1e9
    // flatness: last-third mean vs first-third mean — sustained means ~1.0
    val third = math.max(1, slices / 3)
    val drift = thrs.takeRight(third).sum / thrs.take(third).sum
    println(f"SUSTAIN docs=${docsPerSlice * slices} triples=$totalTriples wall=$wall%.0fs " +
      f"thr=${totalTriples / wall}%.0f/s last3rd_over_first3rd=$drift%.3f")
    spark.stop()
  }
}
