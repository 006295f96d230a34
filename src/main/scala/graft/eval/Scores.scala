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

final case class UasLasBuf(headHits: Long, bothHits: Long, total: Long)
final case class UasLas(uas: Double, las: Double)

/** UAS/LAS attachment scores (score.py:109-117, 372-396 semantics:
  * masked elementwise equality rates — uas counts head matches, las counts
  * head+rel matches; only valid tokens reach the aggregator).
  * IN = (predHead, goldHead, predRel, goldRel).
  */
class UasLasAgg extends Aggregator[(Int, Int, String, String), UasLasBuf, UasLas] {
  def zero: UasLasBuf = UasLasBuf(0L, 0L, 0L)
  def reduce(b: UasLasBuf, v: (Int, Int, String, String)): UasLasBuf = {
    val head = v._1 == v._2
    UasLasBuf(b.headHits + (if (head) 1 else 0),
      b.bothHits + (if (head && v._3 == v._4) 1 else 0), b.total + 1)
  }
  def merge(a: UasLasBuf, b: UasLasBuf): UasLasBuf =
    UasLasBuf(a.headHits + b.headHits, a.bothHits + b.bothHits, a.total + b.total)
  def finish(b: UasLasBuf): UasLas =
    if (b.total == 0) UasLas(0.0, 0.0)
    else UasLas(b.headHits.toDouble / b.total, b.bothHits.toDouble / b.total)
  def bufferEncoder: Encoder[UasLasBuf] = Encoders.product[UasLasBuf]
  def outputEncoder: Encoder[UasLas] = Encoders.product[UasLas]
}

/** UasLasAgg over any row type via an extractor (groupByKey composition). */
class UasLasOn[IN](f: IN => (Int, Int, String, String))
    extends Aggregator[IN, UasLasBuf, UasLas] {
  private val inner = new UasLasAgg
  def zero: UasLasBuf = inner.zero
  def reduce(b: UasLasBuf, v: IN): UasLasBuf = inner.reduce(b, f(v))
  def merge(a: UasLasBuf, b: UasLasBuf): UasLasBuf = inner.merge(a, b)
  def finish(b: UasLasBuf): UasLas = inner.finish(b)
  def bufferEncoder: Encoder[UasLasBuf] = inner.bufferEncoder
  def outputEncoder: Encoder[UasLas] = inner.outputEncoder
}

/** Top-k accuracy (score.py:84-106): a row is correct when the target
  * index ranks in the top k of its score vector. Rank = stable descending
  * order (ties broken by first index, matching numpy/torch stable sorts).
  * IN = (scores, targetIdx).
  */
class TopkAccAgg(k: Int) extends Aggregator[(Array[Float], Int), AccBuf, Double] {
  private val inner = new AccAgg
  def zero: AccBuf = inner.zero
  def reduce(b: AccBuf, v: (Array[Float], Int)): AccBuf = {
    val (scores, target) = v
    val st = scores(target)
    var rank = 0
    var i = 0
    while (i < scores.length) {
      if (scores(i) > st || (scores(i) == st && i < target)) rank += 1
      i += 1
    }
    inner.reduce(b, rank < k)
  }
  def merge(a: AccBuf, b: AccBuf): AccBuf = inner.merge(a, b)
  def finish(b: AccBuf): Double = inner.finish(b)
  def bufferEncoder: Encoder[AccBuf] = inner.bufferEncoder
  def outputEncoder: Encoder[Double] = inner.outputEncoder
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
