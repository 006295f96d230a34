package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-6 optimization harness (guide §1.1/§1.4) — measurement ONLY, the
  * graded Bench.scala is frozen. Two modes:
  *
  *   catalog [qPrefix...] — replicate the frozen Bench catalog loop exactly
  *     (same session config, same sorted order, same untimed first-query
  *     warmup, same best-of-2 rule) and print one JSON line of per-query
  *     seconds + total. Passing prefixes restricts the timed set but keeps
  *     catalog order and the shared session caches, so first-consumer
  *     derivation costs land on the same queries as in the real bench.
  *
  *   plans outDir [qPrefix...] — dump .explain("formatted") for each
  *     selected query to outDir/<name>.txt (the plans/r06 evidence files).
  */
object BenchExtra {

  private def localSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mode = if (args.nonEmpty) args(0) else "catalog"
    val spark = localSession(cpus)
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    def selected(rest: Array[String]): Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (rest.isEmpty) sorted
      else sorted.filter { case (n, _) => rest.exists(p => n.startsWith(p)) }

    mode match {
      case "stages" =>
        // stages <target> [warmQuery...] — run warm queries untimed (to
        // populate the session caches the catalog order would have), then
        // the target once with a per-stage listener (guide §1.1/§7.1:
        // find WHERE the time goes before changing anything)
        val target = args(1)
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val secs = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
            if (secs >= 0.05)
              println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%3d $secs%6.2f s  ${i.name.take(80)}")
          }
        })
        for (w <- args.drop(2)) {
          try SparkEntry.queries(w)(spark, sfDir).count() catch { case _: Throwable => }
        }
        println(s"=== warm done; running $target ===")
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(target)(spark, sfDir).count()
        Thread.sleep(400)
        println(f"TARGET $target rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "plans" =>
        val outDir = Paths.get(args(1))
        Files.createDirectories(outDir)
        for ((name, fn) <- selected(args.drop(2))) {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.writeString(outDir.resolve(s"$name.txt"), plan)
          println(s"wrote $outDir/$name.txt")
        }
      case _ =>
        // exact clone of Bench.runCatalog's timing discipline
        try sorted.head._2(spark, sfDir).count() catch { case _: Throwable => }
        val qs = selected(args.drop(1))
        val rs = qs.map { case (name, fn) =>
          def once(): Double = {
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
            (System.nanoTime() - t0) / 1e9
          }
          val first = once()
          name -> (if (first < 0.4 || first > 3.0) first else math.min(first, once()))
        }
        val json = rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString("{", ",", "}")
        println(f"""{"queries":$json,"total_query_sec":${rs.map(_._2).sum}%.1f}""")
    }
    try spark.stop() catch { case _: Throwable => }
  }
}
