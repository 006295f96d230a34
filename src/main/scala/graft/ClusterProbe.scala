package graft

import org.apache.spark.sql.SparkSession

/** Probe: run the pipeline on local-cluster (separate executor JVMs).
  * args = numWorkers coresPerWorker nDocs
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val (nw, cpw, nDocs) = (args(0).toInt, args(1).toInt, args(2).toLong)
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    // local-cluster workers resolve the executor launch command via
    // spark.test.home / SPARK_HOME
    System.setProperty("spark.test.home", sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    val spark = SparkSession.builder()
      .master(s"local-cluster[$nw,$cpw,6144]")
      .appName("graft-cluster-probe")
      .config("spark.executor.extraClassPath", classes)
      // each executor JVM sizes its GC/JIT pools for ITS core share, not
      // the whole box — otherwise N executors spawn N full GC-thread pools
      .config("spark.executor.extraJavaOptions",
        s"-XX:ActiveProcessorCount=$cpw -XX:+UseParallelGC" +
          sys.env.get("GRAFT_GC_THREADS").map(n => s" -XX:ParallelGCThreads=$n").getOrElse(""))
      .config("spark.sql.shuffle.partitions", (nw * cpw).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      val canon = graft.kg.Kg.linkCanonicalize(spark,
        graft.kg.Kg.triples(graft.nlp.Pipeline.parse(
          graft.sources.Docs.sentences(graft.sources.Docs.russianDocs(spark, nDocs)),
          SparkEntry.packBc(spark))))
      val n = canon.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"CLUSTER nw=$nw cpw=$cpw docs=$nDocs triples=$n sec=$dt%.2f thr=${n / dt}%.0f")
      dt
    }
    graft.kg.Kg.linkCanonicalize(spark,
      graft.kg.Kg.triples(graft.nlp.Pipeline.parse(
        graft.sources.Docs.sentences(graft.sources.Docs.russianDocs(spark, 5000L)),
        SparkEntry.packBc(spark)))).count() // warmup
    run(); run()
    spark.stop()
  }
}
