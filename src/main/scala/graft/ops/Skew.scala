package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling patterns (north_rule: "skew handled explicitly"
  * — AQE skew-join splitting is left enabled globally; these are the
  * planner-independent tools for known-hot keys).
  */
object Skew {

  /** Two-phase salted aggregation: count per key where one key may carry
    * a large share of all rows (hot entities — e.g. a high-frequency PER
    * mention). Phase 1 aggregates (key, salt) — spreading a hot key over
    * `salts` reducers — phase 2 merges the partials. Result is identical
    * to a direct groupBy(key).count().
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts)).as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("k")
      .agg(sum("partial").as("n"))

  /** Salted broadcast-side replication join for a skewed probe side:
    * replicate each build row `salts` times with a salt id, add a random
    * salt to probe rows, join on (key, salt). Keeps one hot key from
    * landing in a single task when the join must shuffle.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(keyCol), monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedBig.join(saltedSmall, Seq(keyCol, "_salt")).drop("_salt")
  }
}
