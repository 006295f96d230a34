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
}
