package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.runtime.KgJob

/** Z-order (Morton-curve) compaction: the rewrite must keep table
  * semantics bit-identical (same rows, rewrite snapshot, time travel,
  * empty CDC) while making per-file min-max ranges selective on EVERY
  * z column at once — the layout property that lets a 10^12-row triple
  * scan prune files for subj lookups AND pred scans from the same copy.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("zorder").toFile.getAbsolutePath

  test("interleaveBits: hand-computed Morton values") {
    // bins (0b101, 0b011), 3 bits: z = s1 p0 | s0 p1 | s1 p1 = 0b100111
    val df = spark.range(1).select(
      KgJob.interleaveBits(Seq(lit(5L), lit(3L)), 3).as("z"),
      KgJob.interleaveBits(Seq(lit(0L), lit(0L)), 3).as("z0"),
      KgJob.interleaveBits(Seq(lit(7L), lit(7L)), 3).as("z7"),
      // one dimension degenerates to the identity
      KgJob.interleaveBits(Seq(lit(6L)), 3).as("zid"))
    val r = df.first()
    assert(r.getLong(0) == 0x27L)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 0x3fL)
    assert(r.getLong(3) == 6L)
  }

  test("sampleBoundaries: deterministic, sorted, bounded") {
    import spark.implicits._
    val df = (0 until 5000).map(i => f"k$i%05d").toDF("k")
    val b1 = KgJob.sampleBoundaries(df, "k", 4)
    val b2 = KgJob.sampleBoundaries(df, "k", 4)
    assert(b1 == b2, "same seed must give the same boundaries")
    assert(b1.nonEmpty && b1.length <= 15)
    assert(b1 == b1.sorted, "boundaries must be ascending")
    // rangeBin respects the boundaries: min value bins below max value
    val bins = df.agg(
      min(KgJob.rangeBin("k", b1)), max(KgJob.rangeBin("k", b1))).first()
    assert(bins.getLong(0) == 0L)
    assert(bins.getLong(1) == b1.length.toLong)
  }

  test("z-order compaction: same rows, rewrite snapshot, 2-D pruning beats plain compaction") {
    val sf = "/root/testdata/sf0.001"
    val out = freshDir()
    assert(KgJob.run(spark, sf, out, "run_z0", nBuckets = 2) == 2)
    val before = KgJob.triples(spark, out).collect().map(_.toString).sorted.toSeq

    // plain compaction first: its (retained) files are the baseline layout
    KgJob.compactBucket(spark, out, 0, "plain", targetFiles = 8)
    val headPlain = KgJob.snapshots(spark, out)
      .agg(max("snapshot_id")).first().getLong(0)

    KgJob.compactBucketZOrder(spark, out, 0, "zo", Seq("subjId", "pred"),
      targetFiles = 8)
    val snaps = KgJob.snapshots(spark, out).collect()
      .sortBy(_.getAs[Long]("snapshot_id"))
    assert(snaps.last.getAs[String]("op") == "rewrite")

    // table semantics untouched: live rows identical, CDC empty, pre-image
    // time travel still works (old files retained until vacuum)
    assert(KgJob.triples(spark, out).collect()
      .map(_.toString).sorted.toSeq == before)
    assert(KgJob.changesBetween(spark, out, headPlain,
      snaps.last.getAs[Long]("snapshot_id")).count() == 0)
    assert(KgJob.triplesAsOf(spark, out, headPlain).collect()
      .map(_.toString).sorted.toSeq == before)

    // pruning effectiveness: average number of files whose [min,max]
    // admits a probe value, over all distinct values of the column. A
    // coalesce of pipeline-ordered input leaves every file spanning the
    // full range on both columns; the z-ordered layout must shrink BOTH.
    val dir = new java.io.File(s"$out/triples/bucket=0")
    def admitting(prefix: String, c: String): Double = {
      val files = dir.listFiles().map(_.getName)
        .filter(n => n.startsWith(prefix) && n.endsWith(".parquet")).sorted
      assert(files.length >= 6, s"$prefix wrote ${files.length} files")
      val ranges = files.map { f =>
        val r = spark.read.parquet(s"$dir/$f").agg(min(c), max(c)).first()
        (r.getString(0), r.getString(1))
      }
      val probes = spark.read.parquet(s"$dir/${files.head}")
        .unionByName(spark.read.parquet(
          files.tail.map(f => s"$dir/$f"): _*))
        .select(c).distinct().collect().map(_.getString(0))
      val total = probes.iterator.map { v =>
        ranges.count { case (lo, hi) => lo <= v && v <= hi }
      }.sum
      total.toDouble / probes.length
    }
    for (c <- Seq("subjId", "pred")) {
      val plain = admitting("compact-plain", c)
      val zo = admitting("zorder-zo", c)
      assert(zo <= plain * 0.75,
        s"$c: z-order avg admitting files $zo not < 0.75x plain $plain")
    }
  }

  test("z-order compaction: guards") {
    val out = freshDir()
    intercept[IllegalArgumentException] {
      KgJob.compactBucketZOrder(spark, out, 0, "zg", Seq("subjId"))
    }
    intercept[IllegalArgumentException] {
      // bits*k > 63 must be rejected up front
      KgJob.compactBucketZOrder(spark, out, 0, "zg", Seq("a", "b"), bits = 32)
    }
  }
}
