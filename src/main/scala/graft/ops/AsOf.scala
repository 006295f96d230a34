package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` (inclusive, DuckDB `ASOF JOIN` semantics) on the
  * same key. Spark has no native as-of join; the classic rewrites are a
  * range join (quadratic blow-up per key) or a per-key `collect_list` +
  * binary search (memory-bound on hot keys). This implementation is the
  * scalable third form: UNION the two sides, ONE hash shuffle on the key,
  * and a running `last(_, ignoreNulls)` window over the time-sorted
  * per-key stream — linear work, no pair materialization, and the sort is
  * the same Exchange+Sort a sort-merge join would pay anyway.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate the right side
  * (the caller chooses the survivor rule); ambiguity at equal timestamps
  * is otherwise unresolvable in ANY as-of engine, not just this one.
  *
  * At 100 TB: the only shuffle is by `key`, so AQE handles partition
  * sizing; a single pathologically hot key serializes within its
  * partition (inherent to as-of ordering) — shard such keys by coarse
  * time bucket with boundary carry-over if they ever dominate.
  */
object AsOf {

  /** @param payload right-side columns carried to matches, emitted as
    *                `matched_<name>`; the right timestamp is always
    *                emitted as `matched_ts` (null when no match).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the rewrite introduces __src/__r/__m and reads matches as __m.<name>:
    // a pre-existing column with a reserved name would silently resolve
    // wrong, and a dot inside ts/payload would parse as struct access
    val reserved = Set("__src", "__r", "__m")
    require(!(leftCols ++ right.columns).exists(reserved),
      s"asofJoin: input columns collide with reserved names $reserved")
    require(!(ts +: payload).exists(_.contains(".")),
      "asofJoin: ts/payload column names must be dot-free (struct access ambiguity)")
    val rSchema = right.select((ts +: payload).map(col): _*).schema
    val l = left
      .withColumn("__src", lit(1))
      // a genuinely NULL struct (not a struct of nulls) so the running
      // last(_, ignoreNulls) skips left rows entirely
      .withColumn("__r", lit(null).cast(rSchema))
    val r = right
      .select((key +: ts +: payload).map(col): _*)
      .withColumn("__src", lit(0))
      .withColumn("__r", struct((ts +: payload).map(col): _*))
      // left-only columns become nulls on the right leg
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols :+ "__src" :+ "__r").map(col): _*)

    // right (src=0) sorts BEFORE left (src=1) at equal ts => inclusive <=
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((leftCols :+ "__src" :+ "__r").map(col): _*)
      .unionByName(rAligned)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__src") === 1)
      .select(leftCols.map(col) ++
        (col(s"__m.$ts").as("matched_ts") +:
          payload.map(c => col(s"__m.$c").as(s"matched_$c"))): _*)
  }
}
