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
            if (secs >= 0.05) {
              val site = i.details.linesIterator
                .find(l => l.contains("graft") && !l.contains("BenchExtra"))
                .getOrElse(i.name).trim
              println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%3d $secs%6.2f s  ${i.name.take(50)} @ ${site.take(90)}")
            }
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
      case "minhash" =>
        // A/B probe (guide §1.4): the old two-table string fill
        // (distinct strings persisted, xxhash64 view persisted on top)
        // vs the one-pass double-hash fill, and the string-verified pair
        // set vs minhashDupPairsFromHashes. Checks outputs are identical
        // on this data before trusting the timings.
        import org.apache.spark.sql.functions._
        import graft.ops.Dedup
        import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        def time[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime()
          val r = f
          println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          r
        }
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        for (i <- 1 to 5) {
          val shStr = Dedup.shingles(docs, 3).persist(MEMORY_AND_DISK)
          time(s"old string fill r$i")(shStr.count())
          val shView = shStr
            .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
            .persist(MEMORY_AND_DISK)
          time(s"old hash view r$i")(shView.count())
          val dh = Dedup.shingleDoubleHashes(docs, 3).persist(MEMORY_AND_DISK)
          time(s"new double-hash fill r$i")(dh.count())
          time(s"pairs from strings r$i")(
            Dedup.minhashDupPairs(docs, 3, 32, 8, 0.1,
              shinglesOpt = Some(shStr)).write.format("noop").mode("overwrite").save())
          time(s"pairs from hashes r$i")(
            Dedup.minhashDupPairsFromHashes(dh, 32, 8, 0.1)
              .write.format("noop").mode("overwrite").save())
          if (i == 1) {
            val a = Dedup.minhashDupPairs(docs, 3, 32, 8, 0.1,
              shinglesOpt = Some(shStr)).collect().map(_.toString).sorted
            val b = Dedup.minhashDupPairsFromHashes(dh, 32, 8, 0.1)
              .collect().map(_.toString).sorted
            val va = shView.collect().map(_.toString).sorted
            val vb = dh.select("doc_id", "shingle").collect().map(_.toString).sorted
            println(s"PROBE pairsEqual=${a.sameElements(b)} rows=${a.length} " +
              s"viewEqual=${va.sameElements(vb)} viewRows=${va.length}")
          }
          shStr.unpersist(); shView.unpersist(); dh.unpersist()
        }
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
