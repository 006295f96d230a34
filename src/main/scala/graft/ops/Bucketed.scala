package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) table materialization and co-located joins —
  * the disk-layout lever at 100 TB: pay the shuffle ONCE at write time
  * (`bucketBy` on the join key, hash-partitioned files + catalog
  * metadata), then every subsequent equi-join or aggregation on that key
  * runs WITHOUT an Exchange on the bucketed side. In-sandbox the tables
  * live in the session catalog's warehouse dir (plain parquet + bucket
  * spec); on a real deployment the same calls target the production
  * catalog. Complements the runtime.KgJob layout (which buckets the
  * DOCUMENT stream for resumability) with join-key bucketing for the
  * relational side.
  */
object Bucketed {

  val Buckets = 16

  /** table names are keyed by the source dir: reusing a table built from a
    * DIFFERENT scale factor would silently answer with the wrong data
    */
  private def names(sfDir: String): (String, String) = {
    val sfx = sfDir.filter(_.isLetterOrDigit)
    (s"customer_bucketed_$sfx", s"orders_bucketed_$sfx")
  }

  /** The session catalog is in-memory but the warehouse DIR persists
    * across sessions — a fresh session sees no table yet an occupied
    * location and refuses the write. Drop both before rematerializing.
    */
  private def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(s"$wh/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Materialize customer/orders as bucketed tables on the join key —
    * ONCE per session per source dir ("pay the shuffle at write time"):
    * repeated calls reuse the catalog tables, so query timings measure
    * the co-located JOIN, not the write. sortBy keeps bucket files sorted
    * so the sort-merge join needs no per-task sort of the big side.
    */
  def materialize(spark: SparkSession, sfDir: String): Unit = {
    val (cust, ord) = names(sfDir)
    if (!spark.catalog.tableExists(cust) || !spark.catalog.tableExists(ord)) {
      reset(spark, cust)
      spark.read.parquet(s"$sfDir/customer.parquet")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(Buckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable(cust)
      reset(spark, ord)
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(Buckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ord)
    }
  }

  /** The co-located join itself (no aggregation): both inputs are
    * bucket-pruned file scans; with matching bucket counts the join plans
    * with ZERO Exchange nodes.
    */
  def colocatedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val (cust, ord) = names(sfDir)
    val c = spark.table(cust)
    val o = spark.table(ord)
    o.join(c, o("o_custkey") === c("c_custkey"))
  }

  /** Orders per market segment over the co-located join. The only
    * shuffle in the whole plan is the final tiny segment aggregation —
    * order-insensitive exact aggregates (count/distinct/max) so the
    * result is value-checkable cross-engine.
    */
  def ordersPerSegment(spark: SparkSession, sfDir: String): DataFrame = {
    materialize(spark, sfDir)
    colocatedJoin(spark, sfDir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct("c_custkey").as("n_customers"),
        max("o_totalprice").as("max_price"))
  }
}
