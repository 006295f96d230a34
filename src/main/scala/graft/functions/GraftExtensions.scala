package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: exposes the native expressions to SQL.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT word_shape(w), cosine_sim(a, b), poly_hash(t) ...")
  *
  * Registration is also available on an existing session via
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("word_shape", info("word_shape", "word shape class"),
      (es: Seq[Expression]) => WordShapeExpr(es.head)),
    ("cosine_sim", info("cosine_sim", "cosine similarity of float arrays"),
      (es: Seq[Expression]) => CosineSim(es.head, es(1))),
    ("poly_hash", info("poly_hash", "64-bit polynomial rolling hash"),
      (es: Seq[Expression]) => PolyHash(es.head)),
    ("mix64", info("mix64", "splitmix64 finalizer over a long"),
      (es: Seq[Expression]) => Mix64(es.head)),
    ("simhash64", info("simhash64", "64-bit simhash over token FNV hashes"),
      (es: Seq[Expression]) => Simhash64(es.head)),
    ("lower_simple", info("lower_simple",
      "per-codepoint simple Unicode lowercase (no ICU full casemap)"),
      (es: Seq[Expression]) => LowerSimple(es.head))
  )

  /** Register on an already-built session (tests, spark-shell). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
