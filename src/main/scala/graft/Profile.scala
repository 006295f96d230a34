package graft

import org.apache.spark.sql.SparkSession

/** Phase profiler: args = cpus nDocs. Times generation / inference /
  * triples / full pipeline separately.
  */
/** Time individual catalog queries: args = cpus sfDir q1 [q2 ...] —
  * best-of-3 wall seconds per query (the bench harness measures the whole
  * catalog; this isolates one query for optimization work).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val sfDir = args(1)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args.drop(2)) {
      val fn = SparkEntry.queries(q)
      fn(spark, sfDir).count() // warmup
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"QTIME $q $best%.2f s")
    }
    spark.stop()
  }
}

object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nDocs = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val secs = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
        if (secs > 0.5)
          println(f"  STAGE ${i.stageId} tasks=${i.numTasks} $secs%.1f s  ${i.name.take(60)}")
      }
    })
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r0 = f
      val d0 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); val r = f
      val d1 = (System.nanoTime() - t1) / 1e9
      println(f"PROFILE $name run1=$d0%.2f run2=$d1%.2f s"); r
    }
    import graft.sources.Docs
    // warmup
    graft.kg.Kg.linkCanonicalize(spark,
      graft.kg.Kg.triples(graft.nlp.Pipeline.parse(
        Docs.sentences(Docs.russianDocs(spark, 2000L)), SparkEntry.packBc(spark)))).count()
    time("triples")(graft.kg.Kg.triples(graft.nlp.Pipeline.parse(
      Docs.sentences(Docs.russianDocs(spark, nDocs)), SparkEntry.packBc(spark))).count())
    val full = graft.kg.Kg.linkCanonicalize(spark,
      graft.kg.Kg.triples(graft.nlp.Pipeline.parse(
        Docs.sentences(Docs.russianDocs(spark, nDocs)), SparkEntry.packBc(spark))))
    time("full")(full.count())
    // parquet-input variant: materialize once, then measure scan -> pipeline
    val pq = s"/tmp/graft_docs_$nDocs"
    if (!new java.io.File(pq).exists())
      Docs.russianDocs(spark, nDocs).write.parquet(pq)
    import org.apache.spark.sql.Encoders
    def fromPq = spark.read.parquet(pq).as(Encoders.product[graft.sources.InterleavedDoc])
    time("full_pq")(graft.kg.Kg.linkCanonicalize(spark,
      graft.kg.Kg.triples(graft.nlp.Pipeline.parse(
        Docs.sentences(fromPq), SparkEntry.packBc(spark)))).count())
    spark.stop()
  }
}
