package graft.eval

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Score meters + metrics table — the Spark analogue of the reference's
  * ScoreMeter/BoardWriter pairs (score.py:120-369 accumulate batch scores
  * and write scalars to a board; here the accumulation is a distributed
  * aggregation and the "board" is a parquet metrics table).
  *
  * Idempotence mirrors runtime/KgJob's commit protocol: one partition dir
  * per (run_id, step), written with Overwrite — re-logging a step after a
  * retry replaces its rows instead of duplicating them.
  */
object Meters {

  /** NERScoreMeter (score.py:162-213): per-entity-type P/R/F1 between a
    * predicted and a gold span table. Join on exact span identity
    * (doc/sent/start/stop/type) — token-level variants reduce to the same
    * shape. Expects columns: doc_id, sent_idx, start, stop, type.
    */
  def nerTypeF1(pred: DataFrame, gold: DataFrame): DataFrame = {
    val keys = Seq("doc_id", "sent_idx", "start", "stop", "type")
    val hits = pred.join(gold, keys, "inner").groupBy("type").agg(count(lit(1)).as("hits"))
    val p = pred.groupBy("type").agg(count(lit(1)).as("pred_n"))
    val g = gold.groupBy("type").agg(count(lit(1)).as("gold_n"))
    p.join(g, Seq("type"), "full_outer")
      .join(hits, Seq("type"), "left_outer")
      .na.fill(0L, Seq("pred_n", "gold_n", "hits"))
      .select(col("type"),
        when(col("pred_n") > 0, col("hits") / col("pred_n")).otherwise(0.0).as("precision"),
        when(col("gold_n") > 0, col("hits") / col("gold_n")).otherwise(0.0).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(0.0))
  }

  /** MorphScoreMeter (score.py:120-143): tag accuracy. Expects columns
    * pred_tag, gold_tag.
    */
  def morphAccuracy(joined: DataFrame): Double = {
    val r = joined.agg(
      avg(when(col("pred_tag") === col("gold_tag"), 1.0).otherwise(0.0)).as("acc"))
      .head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** SyntaxScoreMeter (score.py:307-369): UAS/LAS over joined head/rel
    * predictions. Expects columns pred_head, gold_head, pred_rel, gold_rel.
    */
  def syntaxUasLas(joined: DataFrame): (Double, Double) = {
    import org.apache.spark.sql.Encoders
    implicit val e = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt,
      Encoders.STRING, Encoders.STRING)
    val ds = joined.select(col("pred_head").cast("int"), col("gold_head").cast("int"),
      col("pred_rel"), col("gold_rel")).as[(Int, Int, String, String)]
    val ul = ds.select(new UasLasAgg().toColumn).head()
    (ul.uas, ul.las)
  }

  /** The metrics board: append scalar metrics for (runId, step). One
    * Overwrite'd partition dir per step — idempotent under retries.
    */
  def log(spark: SparkSession, dir: String, runId: String, step: Long,
          metrics: Map[String, Double]): Unit = {
    import spark.implicits._
    // the (escaped) run id keys the partition DIR (Overwrite idempotency
    // per (run, step)); the VERBATIM run_id travels as a data column —
    // path-recovered values pass through Spark's own %hh partition-path
    // unescaping, which would mangle any custom path encoding on read
    // fail fast on a pre-rename board layout: old `run_id=` partition
    // dirs would make read() see conflicting partition columns, and the
    // (run, step) overwrite idempotency would silently stop applying
    val stale = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .exists(f => f.isDirectory && f.getName.startsWith("run_id="))
    require(!stale,
      s"metrics board at $dir uses the old run_id= partition layout — use a fresh dir")
    metrics.toSeq.sortBy(_._1).map { case (n, v) => (runId, n, v) }
      .toDF("run_id", "name", "value")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/rid=${escape(runId)}/step=$step")
  }

  /** Read the whole board back. `step` is recovered from the partition
    * path; `run_id` comes from the data files verbatim (the `rid` path
    * key is a write-side dir name only — see [[log]]).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("basePath", dir)
      .parquet(dir)
      .select(col("run_id"), col("step").cast("long").as("step"),
        col("name"), col("value"))

  /** injective path encoding — distinct run ids must never collide into
    * one partition dir (Overwrite would clobber across runs); '%' itself
    * is escaped so the mapping is reversible, and ONLY ASCII
    * letters/digits pass through (non-ASCII dir names die on filesystems
    * whose JVM file.encoding cannot map them)
    */
  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      if (c < 128 && (c.isLetterOrDigit || c == '_' || c == '.' || c == '-'))
        sb.append(c)
      else sb.append(f"%%${c.toInt}%04x")
    }
    sb.toString
  }
}
