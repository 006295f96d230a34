package graft.runtime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg.Kg
import graft.nlp.Pipeline
import graft.sources.Docs

/** Resumable, bucketed KG-construction job (north_rule: per-partition
  * lineage + metrics, resume after kill with no reprocessing).
  *
  * No Iceberg runtime ships in this sandbox, so "Iceberg tables" are
  * partitioned Parquet plus an explicit commit-log table, with the same
  * semantics a real catalog would give:
  *
  *  - input is hash-bucketed on doc_id (`pmod(xxhash64(doc_id), nBuckets)`);
  *    each bucket is one unit of work and one output partition dir
  *  - per bucket: (1) overwrite `triples/bucket=<k>/` (idempotent), then
  *    (2) append one commit row (run lineage + counters + watermark) to the
  *    commit log as its own parquet file via an atomic rename
  *  - on startup, committed buckets are read from the log and skipped
  *    (anti-join on bucket id); a crash between (1) and (2) just reruns
  *    that bucket and overwrites — output is exactly-once
  *
  * The same loop is the incremental mode: new data lands as new buckets.
  * At cluster scale the driver loop over O(1000) buckets is negligible and
  * gives natural checkpoint granularity; within a bucket all parallelism
  * is Spark's.
  */
object KgJob {

  final case class Commit(run_id: String, bucket: Int, docs: Long,
                          sents: Long, triples: Long, max_doc_id: String,
                          committed_at: Long)

  def commitLog(spark: SparkSession, outDir: String): DataFrame = {
    val dir = new java.io.File(s"$outDir/_commits")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  def committedBuckets(spark: SparkSession, outDir: String): Set[Int] = {
    val log = commitLog(spark, outDir)
    if (log.columns.isEmpty) Set.empty
    else log.select("bucket").distinct().collect().map(_.getInt(0)).toSet
  }

  /** Append one commit row atomically: write to a temp dir, then move the
    * part file into `_commits/` under a unique name (rename is atomic on
    * the same filesystem — the staged-commit protocol from SURVEY.md §7.6).
    */
  private def appendCommit(spark: SparkSession, outDir: String, c: Commit): Unit = {
    import spark.implicits._
    val tmp = s"$outDir/_tmp_commit_${c.run_id}_${c.bucket}"
    Seq(c).toDF().coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$outDir/_commits/${c.run_id}_${c.bucket}.parquet")
    dst.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  /** Run (or resume) the full pipeline. Returns buckets processed this run.
    * @param failAfterBuckets test hook: throw after N successful buckets
    */
  def run(spark: SparkSession, sfDir: String, outDir: String, runId: String,
          nBuckets: Int = 8, failAfterBuckets: Int = -1): Int = {
    import spark.implicits._
    val done = committedBuckets(spark, outDir)
    val docs = Docs.russianDocs(spark, sfDir)
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(nBuckets)).cast("int"))
    var processed = 0
    for (b <- 0 until nBuckets if !done.contains(b)) {
      if (failAfterBuckets >= 0 && processed >= failAfterBuckets)
        throw new RuntimeException(s"injected failure before bucket $b")
      val bucketDocs = docs.where(col("bucket") === b).drop("bucket")
        .as[graft.sources.InterleavedDoc]
      val sents = Docs.sentences(bucketDocs)
      val parsed = Pipeline.parse(sents, graft.SparkEntry.packBc(spark))
      val triples = Kg.link(spark, Kg.triples(parsed)).cache()
      val nTriples = triples.count()
      triples.toDF().write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/triples/bucket=$b")
      val stats = bucketDocs.agg(count(lit(1)), max(col("doc_id"))).first()
      val nSents = sents.count()
      appendCommit(spark, outDir, Commit(runId, b, stats.getLong(0), nSents,
        nTriples, Option(stats.getString(1)).getOrElse(""),
        System.currentTimeMillis()))
      triples.unpersist()
      processed += 1
    }
    processed
  }

  /** All committed triples (union of bucket partitions). */
  def triples(spark: SparkSession, outDir: String): DataFrame = {
    val done = committedBuckets(spark, outDir)
    val dirs = done.toSeq.sorted.map(b => s"$outDir/triples/bucket=$b")
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*)
  }
}
