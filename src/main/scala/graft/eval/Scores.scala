package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable score accumulators as typed Spark Aggregators.
  * The buffer/merge semantics map 1:1 to the reference's score objects
  * (slovnet/score.py:12-81): partial aggregation on executors = `add`,
  * final merge on the reducer = `+`.
  */
final case class AccBuf(correct: Long, total: Long)

/** Acc: correct/total (score.py:12-31). IN = Boolean "was correct". */
class AccAgg extends Aggregator[Boolean, AccBuf, Double] {
  def zero: AccBuf = AccBuf(0L, 0L)
  def reduce(b: AccBuf, ok: Boolean): AccBuf =
    AccBuf(b.correct + (if (ok) 1 else 0), b.total + 1)
  def merge(a: AccBuf, b: AccBuf): AccBuf =
    AccBuf(a.correct + b.correct, a.total + b.total)
  def finish(b: AccBuf): Double =
    if (b.total == 0) 0.0 else b.correct.toDouble / b.total
  def bufferEncoder: Encoder[AccBuf] = Encoders.product[AccBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Acc over any row type via a predicate (for groupByKey.agg composition). */
class AccOn[IN](ok: IN => Boolean) extends Aggregator[IN, AccBuf, Double] {
  private val inner = new AccAgg
  def zero: AccBuf = inner.zero
  def reduce(b: AccBuf, v: IN): AccBuf = inner.reduce(b, ok(v))
  def merge(a: AccBuf, b: AccBuf): AccBuf = inner.merge(a, b)
  def finish(b: AccBuf): Double = inner.finish(b)
  def bufferEncoder: Encoder[AccBuf] = inner.bufferEncoder
  def outputEncoder: Encoder[Double] = inner.outputEncoder
}

final case class MeanBuf(accum: Double, count: Long)

/** Mean: accum/count (score.py:34-53). */
class MeanAgg extends Aggregator[Double, MeanBuf, Double] {
  def zero: MeanBuf = MeanBuf(0.0, 0L)
  def reduce(b: MeanBuf, v: Double): MeanBuf = MeanBuf(b.accum + v, b.count + 1)
  def merge(a: MeanBuf, b: MeanBuf): MeanBuf =
    MeanBuf(a.accum + b.accum, a.count + b.count)
  def finish(b: MeanBuf): Double = if (b.count == 0) 0.0 else b.accum / b.count
  def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

final case class F1Buf(predTotal: Long, goldTotal: Long, hits: Long)
final case class PRF1(precision: Double, recall: Double, f1: Double)

/** F1 = two Acc meters (prec = hits/pred, recall = hits/gold;
  * score.py:56-81). IN = (isPredicted, isGold) per candidate.
  */
class F1Agg extends Aggregator[(Boolean, Boolean), F1Buf, PRF1] {
  def zero: F1Buf = F1Buf(0L, 0L, 0L)
  def reduce(b: F1Buf, v: (Boolean, Boolean)): F1Buf = F1Buf(
    b.predTotal + (if (v._1) 1 else 0),
    b.goldTotal + (if (v._2) 1 else 0),
    b.hits + (if (v._1 && v._2) 1 else 0))
  def merge(a: F1Buf, b: F1Buf): F1Buf =
    F1Buf(a.predTotal + b.predTotal, a.goldTotal + b.goldTotal, a.hits + b.hits)
  def finish(b: F1Buf): PRF1 = {
    val p = if (b.predTotal == 0) 0.0 else b.hits.toDouble / b.predTotal
    val r = if (b.goldTotal == 0) 0.0 else b.hits.toDouble / b.goldTotal
    val f = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    PRF1(p, r, f)
  }
  def bufferEncoder: Encoder[F1Buf] = Encoders.product[F1Buf]
  def outputEncoder: Encoder[PRF1] = Encoders.product[PRF1]
}

/** Triple-level P/R of a predicted triple set vs a gold triple set
  * (the BASELINE.md "P/R >= 0.95" gate). Distributed: full outer join on
  * the triple identity, then one F1 aggregation pass.
  */
object TripleEval {
  def prf1(pred: DataFrame, gold: DataFrame): PRF1 = {
    val spark = pred.sparkSession
    import spark.implicits._
    val keys = Seq("doc_id", "sent_key", "subj", "pred", "obj")
    val p = pred.select(keys.map(col): _*).distinct().withColumn("in_pred", lit(true))
    val g = gold.select(keys.map(col): _*).distinct().withColumn("in_gold", lit(true))
    val joined = p.join(g, keys, "full_outer")
      .select(coalesce(col("in_pred"), lit(false)).as("p"),
        coalesce(col("in_gold"), lit(false)).as("g"))
      .as[(Boolean, Boolean)]
    joined.select(new F1Agg().toColumn).head()
  }
}
