package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.kg.Kg
import graft.nlp.Pipeline
import graft.sources.{Docs, InterleavedDoc}

/** Incremental KG construction as a Structured Streaming job.
  *
  * The reference is a pull-based generator pipeline with bounded memory
  * (exec/encoders.py:45-49, exec/infer.py:37-51); its streaming analogue
  * here: `readStream` over the interleaved-docs table directory →
  * `foreachBatch` runs the SAME batch pipeline per micro-batch and appends
  * to the triple table. Spark's streaming file-source checkpoint gives
  * exactly-once file tracking (new parquet files = new documents), which
  * composes with the bucketed KgJob commit log for lineage/metrics.
  */
object IncrementalKg {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", IntegerType)))))))

  /** Start (or resume — the checkpoint dir carries offsets) the stream. */
  def start(spark: SparkSession, inputDir: String, outDir: String): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .schema(docSchema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", s"$outDir/_stream_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val docs = batch.as[InterleavedDoc]
        val triples = Kg.link(spark,
          Kg.triples(Pipeline.parse(Docs.sentences(docs), graft.SparkEntry.packBc(spark))))
        // idempotent sink: one partition dir per micro-batch, OVERWRITE —
        // a replayed batch (foreachBatch is at-least-once) rewrites its own
        // dir instead of appending duplicates, so the composition with the
        // file-source checkpoint is exactly-once end to end
        triples.toDF()
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/triples_stream/batch_id=$batchId")
        ()
      }
      .start()
  }
}
