package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.runtime.KgJob

/** Kill/resume semantics: a job killed mid-run must resume without
  * reprocessing committed buckets and produce exactly the single-run output
  * (BASELINE.md "Resumability" row).
  */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("kgjob").toFile
    d.getAbsolutePath
  }

  test("kill after 3 buckets, resume, output equals single-shot run") {
    val sf = "/root/testdata/sf0.001"
    val full = freshDir()
    assert(KgJob.run(spark, sf, full, "run_full", nBuckets = 8) == 8)
    val expected = KgJob.triples(spark, full).collect()
      .map(_.toString).sorted.toSeq

    val resumable = freshDir()
    val boom = intercept[RuntimeException] {
      KgJob.run(spark, sf, resumable, "run_a", nBuckets = 8, failAfterBuckets = 3)
    }
    assert(boom.getMessage.contains("injected failure"))
    assert(KgJob.committedBuckets(spark, resumable).size == 3)

    // resume: processes exactly the remaining 5 buckets
    val processed = KgJob.run(spark, sf, resumable, "run_b", nBuckets = 8)
    assert(processed == 5)
    val got = KgJob.triples(spark, resumable).collect()
      .map(_.toString).sorted.toSeq
    assert(got == expected)

    // lineage: commit log records both run ids with per-bucket counters
    val log = KgJob.commitLog(spark, resumable)
    assert(log.select("run_id").distinct().count() == 2)
    assert(log.count() == 8)
    assert(log.selectExpr("sum(triples)").first().getLong(0) == expected.length)

    // idempotence: a third run is a no-op
    assert(KgJob.run(spark, sf, resumable, "run_c", nBuckets = 8) == 0)

    // ---- snapshot surface over the same kill/resume table ----
    val snaps = KgJob.snapshots(spark, resumable).collect()
    assert(snaps.length == 8)
    val sids = snaps.map(_.getAs[Long]("snapshot_id")).sorted.toSeq
    assert(sids == (1L to 8L)) // dense, 1-based
    // the killed run's 3 commits strictly precede the resume's 5
    val byRun = snaps.groupBy(_.getAs[String]("run_id"))
      .view.mapValues(_.map(_.getAs[Long]("snapshot_id")).toSet).toMap
    assert(byRun("run_a") == Set(1L, 2L, 3L) && byRun("run_b") == Set(4L, 5L, 6L, 7L, 8L))
    // cum_triples is the running total and ends at the table size
    val ordered = snaps.sortBy(_.getAs[Long]("snapshot_id"))
    assert(ordered.map(_.getAs[Long]("triples")).scanLeft(0L)(_ + _).drop(1).toSeq
      == ordered.map(_.getAs[Long]("cum_triples")).toSeq)
    assert(ordered.last.getAs[Long]("cum_triples") == expected.length)

    // time travel: as-of the kill point = exactly the 3 committed buckets;
    // as-of the head = the full table
    val mid = KgJob.triplesAsOf(spark, resumable, 3L)
    assert(mid.count() == ordered(2).getAs[Long]("cum_triples"))
    assert(KgJob.triplesAsOf(spark, resumable, 8L).collect()
      .map(_.toString).sorted.toSeq == expected)

    // CDC: (0,3] + (3,8] partitions the table exactly
    val d1 = KgJob.changesBetween(spark, resumable, 0L, 3L).collect().map(_.toString)
    val d2 = KgJob.changesBetween(spark, resumable, 3L, 8L).collect().map(_.toString)
    assert((d1 ++ d2).sorted.toSeq == expected)
    assert(KgJob.changesBetween(spark, resumable, 8L, 8L).count() == 0)

    // expired snapshot fails loudly: delete one file referenced by snap 1
    val f1 = snaps.find(_.getAs[Long]("snapshot_id") == 1L).get
      .getAs[scala.collection.Seq[String]]("files").head
    assert(new java.io.File(s"$resumable/$f1").delete())
    val err = intercept[IllegalArgumentException] {
      KgJob.triplesAsOf(spark, resumable, 8L)
    }
    assert(err.getMessage.contains("expired data file"))
  }

  test("compaction rewrites a bucket; vacuum expires superseded history") {
    val sf = "/root/testdata/sf0.001"
    val out = freshDir()
    assert(KgJob.run(spark, sf, out, "run_c0", nBuckets = 4) == 4)
    val before = KgJob.triples(spark, out).collect().map(_.toString).sorted.toSeq
    val nFilesBefore = new java.io.File(s"$out/triples/bucket=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    KgJob.compactBucket(spark, out, 0, "cmp1")
    val snaps = KgJob.snapshots(spark, out).collect()
      .sortBy(_.getAs[Long]("snapshot_id"))
    assert(snaps.length == 5)
    val last = snaps.last
    assert(last.getAs[String]("op") == "rewrite" &&
      last.getAs[Int]("bucket") == 0)
    assert(last.getAs[scala.collection.Seq[String]]("files").length == 1)
    // live table identical through the rewrite; cum does not double-count
    assert(KgJob.triples(spark, out).collect().map(_.toString).sorted.toSeq == before)
    assert(last.getAs[Long]("cum_triples") == snaps(3).getAs[Long]("cum_triples"))
    // CDC: a rewrite appends no rows
    assert(KgJob.changesBetween(spark, out, 4L, 5L).count() == 0)
    // pre-vacuum, the superseded snapshot is still readable (files retained)
    assert(KgJob.triplesAsOf(spark, out, 4L).collect()
      .map(_.toString).sorted.toSeq == before)
    // vacuum deletes exactly the superseded bucket-0 files; live unchanged
    assert(KgJob.vacuum(spark, out) == nFilesBefore)
    assert(KgJob.triples(spark, out).collect().map(_.toString).sorted.toSeq == before)
    val err = intercept[IllegalArgumentException] {
      KgJob.triplesAsOf(spark, out, 4L)
    }
    assert(err.getMessage.contains("expired"))
  }

  test("bucket-partitioned input: pruned reads, single action per bucket") {
    val sf = "/root/testdata/sf0.001"
    val in = freshDir(); val out = freshDir(); val viaGen = freshDir()
    KgJob.writeBucketedInput(spark, sf, in, nBuckets = 4)

    assert(KgJob.run(spark, sf, out, "run_p", nBuckets = 4,
      bucketedInputDir = Some(in)) == 4)

    // identical output to generated-input mode
    assert(KgJob.run(spark, sf, viaGen, "run_g", nBuckets = 4) == 4)
    assert(KgJob.triples(spark, out).collect().map(_.toString).sorted.toSeq ==
      KgJob.triples(spark, viaGen).collect().map(_.toString).sorted.toSeq)

    // empty buckets are valid: partitionBy writes no dir for them, but a
    // resumable run must commit them (zero counters), not crash on read.
    // Force one deterministically by deleting a bucket dir post-write.
    val inWide = freshDir(); val outWide = freshDir()
    KgJob.writeBucketedInput(spark, sf, inWide, nBuckets = 8)
    val victim = new java.io.File(inWide, "bucket=5")
    assert(victim.exists, "expected bucket=5 dir from partitionBy")
    victim.listFiles().foreach(_.delete()); assert(victim.delete())
    assert(KgJob.run(spark, sf, outWide, "run_w", nBuckets = 8,
      bucketedInputDir = Some(inWide)) == 8)
    val log5 = KgJob.commitLog(spark, outWide).where("bucket = 5")
      .selectExpr("docs", "triples").first()
    assert(log5.getLong(0) == 0L && log5.getLong(1) == 0L,
      "missing bucket dir must commit as an empty bucket")

    // single-pass proof: the docs counter rides the ONE action per bucket
    // as an accumulator, so any re-scan of the input (the old
    // count/agg/sents.count shape) would double-count it. Summing to
    // exactly the corpus size across buckets == each input row read once.
    for (dir <- Seq(out, viaGen)) {
      val log = KgJob.commitLog(spark, dir)
      assert(log.selectExpr("sum(docs)").first().getLong(0) ==
        graft.corpus.RuCorpus.docCount(sf), s"input scanned more than once ($dir)")
      assert(log.selectExpr("max(max_doc_id)").first().getString(0).nonEmpty)
      assert(log.where("not counters_exact").count() == 0,
        "retry-free run must record exact counters")
    }
  }

  test("injected task retry: triples counter stays exact, accumulators flagged") {
    val sf = "/root/testdata/sf0.001"
    val clean = freshDir(); val chaotic = freshDir()
    assert(KgJob.run(spark, sf, clean, "run_clean", nBuckets = 2) == 2)

    // arm the chaos hook: the first doc mapped in the next run throws once,
    // failing that task attempt; local[4,2] retries it, re-executing the
    // accumulator updates of the partial attempt
    KgJob.chaosArm.set(true)
    assert(KgJob.run(spark, sf, chaotic, "run_chaos", nBuckets = 2) == 2)
    assert(!KgJob.chaosArm.get, "chaos must have fired")

    val cleanLog = KgJob.commitLog(spark, clean).orderBy("bucket")
      .selectExpr("bucket", "triples", "counters_exact").collect()
    val chaosLog = KgJob.commitLog(spark, chaotic).orderBy("bucket")
      .selectExpr("bucket", "triples", "counters_exact").collect()
    // OUTPUT and the footer-derived triples counter are retry-immune
    assert(KgJob.triples(spark, chaotic).collect().map(_.toString).sorted.toSeq ==
      KgJob.triples(spark, clean).collect().map(_.toString).sorted.toSeq)
    assert(chaosLog.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      cleanLog.map(r => (r.getInt(0), r.getLong(1))).toSeq,
      "triples counter must equal the written row count even under retries")
    // the bucket that saw the retry is flagged; the other stays exact
    assert(chaosLog.exists(!_.getBoolean(2)), "retried bucket must be flagged inexact")
    assert(cleanLog.forall(_.getBoolean(2)))
  }

  test("upsert mid-history: pre-image time travel + typed changelog delta") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = freshDir()
    assert(KgJob.run(spark, sf, out, "run_u0", nBuckets = 4) == 4)
    // canonical projection for every comparison: Spark's USING-join
    // reorders columns keys-first, so raw Row.toString across stages
    // would compare different column orders
    val cols = Seq("docId", "spanOrder", "sentIdx", "subjId", "subjType",
      "pred", "objId", "objType")
    def norm(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
    val before = norm(KgJob.triples(spark, out))

    // the re-canonicalization scenario: two existing triples of bucket 0
    // get their subjId merged into a new canonical id, plus one brand-new
    // triple (MERGE's insert path) — keyed on everything that is NOT
    // being rewritten
    val keys = Seq("docId", "spanOrder", "sentIdx", "pred", "objId")
    val old0 = spark.read.parquet(s"$out/triples/bucket=0")
    // victims drawn from keys that occur exactly once, so the retract set
    // is exactly the two chosen rows (a shared key would retract more)
    val uniq = old0.groupBy(keys.map(col): _*).count()
      .where(col("count") === 1).drop("count")
    val victims = old0.join(uniq, keys, "left_semi")
      .orderBy("docId", "spanOrder", "sentIdx", "pred", "objId")
      .limit(2).localCheckpoint()
    assert(victims.count() == 2)
    val renamed = victims.withColumn("subjId", lit("Q_MERGED"))
    val fresh = renamed.limit(1)
      .withColumn("docId", lit("doc_upsert_new"))
      .withColumn("objId", lit("Q_NEW_OBJ"))
    val updates = renamed.unionByName(fresh).localCheckpoint()

    KgJob.upsertBucket(spark, out, 0, "up1", updates, keys)

    val snaps = KgJob.snapshots(spark, out).collect()
      .sortBy(_.getAs[Long]("snapshot_id"))
    assert(snaps.length == 5)
    val last = snaps.last
    assert(last.getAs[String]("op") == "upsert" && last.getAs[Int]("bucket") == 0)
    assert(last.getAs[scala.collection.Seq[String]]("change_files").length == 1)

    // time travel to the pre-upsert head shows the pre-image exactly
    assert(norm(KgJob.triplesAsOf(spark, out, 4L)) == before)

    // live table = before - victims + updates (multiset arithmetic)
    val expected = ((before diff norm(victims)) ++ norm(updates)).sorted
    assert(norm(KgJob.triples(spark, out)) == expected)

    // typed changelog between the two snapshots: the retract+insert pair
    val log = KgJob.changelog(spark, out, 4L, 5L).localCheckpoint()
    assert(log.collect().forall(_.getAs[Long]("snapshot_id") == 5L))
    assert(norm(log.where(col("change_type") === "delete")) == norm(victims))
    assert(norm(log.where(col("change_type") === "insert")) == norm(updates))
    val nChanges = log.count()
    // the append-only CDC view is (documented) blind to upserts
    assert(KgJob.changesBetween(spark, out, 4L, 5L).count() == 0)
    // full changelog from genesis = 4 bucket appends + the upsert pair
    assert(KgJob.changelog(spark, out, 0L, 5L).count() ==
      before.length + nChanges)

    // vacuum expires the pre-image files; time travel fails loudly but
    // the _changes/ changelog survives (it is not a data file)
    assert(KgJob.vacuum(spark, out) > 0)
    val err = intercept[IllegalArgumentException] {
      KgJob.triplesAsOf(spark, out, 4L)
    }
    assert(err.getMessage.contains("expired"))
    assert(KgJob.changelog(spark, out, 4L, 5L).count() == nChanges)
  }
}
