package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the static-table twin of
  * streaming/StreamOps' flatMapGroupsWithState sessionizer (same gap
  * semantics, no state store): events of one key belong to the same
  * session while consecutive gaps stay <= `gapSec`.
  *
  * Shape: ONE hash shuffle on the key + an in-partition sort, then two
  * narrow window passes (lag -> boundary flags, running sum -> session
  * index) and a final hash aggregate — the classic gaps-and-islands
  * rewrite. Gap arithmetic is integer microseconds, so session
  * boundaries are exact and engine-independent. Ordering ties on equal
  * timestamps are broken by `tiebreak` (must make (key, ts, tiebreak)
  * unique) — without it, session indices would be nondeterministic
  * under retries.
  *
  * At 100 TB: same caveat as every per-key ordered op — a single hot
  * key serializes in its partition; shard such keys by coarse time
  * range first (sessions never span the gap, so any split at a
  * >gap-quiet boundary is exact).
  */
object Sessions {

  /** @return one row per session:
    *         (key, session_idx, session_start, session_end, n_events)
    *         plus sum of `valueCol` rounded to 6 decimals.
    */
  def sessionize(events: DataFrame, key: String, ts: String,
                 tiebreak: String, valueCol: String,
                 gapSec: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts).asc, col(tiebreak).asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NTZ-safe: parquet timestamps load as TIMESTAMP_NTZ in Spark 4;
    // unix_micros needs TIMESTAMP (cast is exact under the UTC session tz)
    val micros = unix_micros(col(ts).cast("timestamp"))
    events
      .withColumn("__prev", lag(micros, 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull ||
          micros - col("__prev") > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(running))
      .groupBy(col(key), col("session_idx"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 6).as("sum_value"))
  }

  /** Ordered-funnel analysis: how many users reach step k of `steps`,
    * where step k must occur STRICTLY AFTER the user's first completion
    * of step k-1 (the classic product-analytics funnel; strict order
    * means a purchase logged before the click does not count the
    * funnel's click->purchase edge).
    *
    * Shape per step: one per-user min-aggregate + one equi-join on the
    * user key with a timestamp predicate — all hash joins on user_id,
    * no window, no self cross join; the per-step count() actions are
    * O(steps) tiny jobs. Deterministic: `min(ts)` needs no tiebreak.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    // the rewrite introduces t/prev_t working columns (asofJoin's
    // reserved-name contract): collisions would resolve silently wrong
    require(!events.columns.exists(Set("t", "prev_t")),
      s"funnel: input must not contain reserved columns t/prev_t")
    val spark = events.sparkSession
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var cur = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      .localCheckpoint() // each step and its count both read it
    out += ((1, steps.head, cur.count()))
    for ((s, i) <- steps.tail.zipWithIndex) {
      cur = events.where(col(typeCol) === s)
        .join(cur.select(col(userCol), col("t").as("prev_t")), userCol)
        .where(col(tsCol) > col("prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
        .localCheckpoint()
      out += ((i + 2, s, cur.count()))
    }
    spark.createDataFrame(out.toSeq).toDF("step", "event_type", "n_users")
  }

  /** Cohort retention matrix: users bucketed by first-activity day,
    * counted on each later active day as an offset from their cohort —
    * the (cohort, day-N) retention table. Two per-user aggregates + one
    * user-keyed equi-join; day arithmetic is integer (exact).
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    require(!events.columns.exists(Set("cohort_date", "day")),
      s"retention: input must not contain reserved columns cohort_date/day")
    val first = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    events.select(col(userCol), to_date(col(tsCol)).as("day")).distinct()
      .join(first, userCol)
      .groupBy(col("cohort_date"),
        datediff(col("day"), col("cohort_date")).cast("long").as("offset_days"))
      .agg(count(lit(1)).as("n_users")) // (user, day) distinct upstream
  }

  /** Two-sided integer CUSUM changepoint flags over per-bucket ingest
    * volume — the pipeline-monitoring query that catches a burst
    * (high side) or a crawler stall (low side) the mean can't see
    * (Page 1954): with d_i = n_i − mean − drift, the one-sided
    * statistic s_i = max(0, s_{i−1} + d_i) exceeds `threshold` exactly
    * when recent volume has run persistently above mean+drift; the low
    * side runs the same recurrence on mean − drift − n_i.
    *
    * The sequential recurrence is computed WITHOUT a fold:
    * s_i = c_i − min(0, min_{j≤i} c_j) where c = running sum of d — so
    * each side is two window functions over the AGGREGATED bucket
    * table (one row per hour — the global-order window runs on ~10^5
    * rows for a decade of hourly buckets, never on the corpus), and all
    * arithmetic is integer (mean = total div n_buckets), hence
    * engine-exact.
    */
  def ingestCusum(events: DataFrame, tsCol: String = "ts",
                  bucket: String = "hour", drift: Long = 0L,
                  threshold: Long = 0L): DataFrame = {
    require(drift >= 0L && threshold >= 0L,
      s"ingestCusum: drift/threshold must be >= 0")
    val b = events.groupBy(date_trunc(bucket, col(tsCol)).as("ws"))
      .agg(count(lit(1)).as("n"))
    val tot = b.agg(sum("n").as("tot"), count(lit(1)).as("nb"))
    val run = Window.orderBy("ws")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.crossJoin(broadcast(tot))
      .withColumn("d", col("n") - expr("tot div nb") - lit(drift))
      .withColumn("dl", expr("tot div nb") - lit(drift) - col("n"))
      .withColumn("c", sum("d").over(run))
      .withColumn("cl", sum("dl").over(run))
      .withColumn("cusum_high",
        col("c") - least(min("c").over(run), lit(0L)))
      .withColumn("cusum_low",
        col("cl") - least(min("cl").over(run), lit(0L)))
      .select(col("ws"), col("n"), col("cusum_high"), col("cusum_low"),
        (col("cusum_high") > lit(threshold)).as("flagged_high"),
        (col("cusum_low") > lit(threshold)).as("flagged_low"))
  }
}
