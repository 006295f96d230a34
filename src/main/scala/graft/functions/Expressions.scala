package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (codegen'd — they live inside
  * WholeStageCodegen spans, unlike Scala UDFs which break them).
  */
object F {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def word_shape(c: Column): Column = column(WordShapeExpr(expression(c)))
  def cosine(a: Column, b: Column): Column = column(CosineSim(expression(a), expression(b)))
  def poly_hash(c: Column): Column = column(PolyHash(expression(c)))
  def simhash64(c: Column): Column = column(Simhash64(expression(c)))
  def hyperplane_sig(c: Column, planes: Array[Array[Double]]): Column =
    column(HyperplaneSig(expression(c), planes))
  def ivf_cell(c: Column, centroids: Array[Array[Double]]): Column =
    column(IvfCell(expression(c), centroids))
  def ivf_probe(c: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    column(IvfProbe(expression(c), centroids, nprobe))
}

/** word_shape as a scalar expression (semantics: graft.text.Shape,
  * reference slovnet/shape.py:76-86). Codegen emits a static call, so the
  * surrounding stage stays in whole-stage codegen.
  */
case class WordShapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.text.Shape.wordShape(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.Shape.wordShape($c.toString()))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Cosine similarity over two float-array columns, computed in double
  * precision (parity with the DuckDB oracle). The hot kernel of the ANN
  * brute-force path.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object CosineSim {
  /** static so generated code can call it */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Deterministic 64-bit polynomial rolling hash of a string (document
  * fingerprinting): h = Σ h*31 + codePoint, over the raw string.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    PolyHash.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.compute($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object PolyHash {
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 1125899906842597L
    var i = 0
    while (i < str.length) { h = 31 * h + str.charAt(i); i += 1 }
    h
  }
}

/** Random-hyperplane LSH signature over a float-array column: bit b set
  * iff dot(planes(b), v) >= 0, accumulated in double precision (parity
  * with the DuckDB oracle's inlined-plane SQL). Native codegen expression,
  * so the ANN/dedup scan side stays inside whole-stage codegen (the
  * previous per-row Scala UDF broke the span).
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneSig.compute($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneSig {
  /** static so generated code can call it */
  def compute(v: ArrayData, ps: Array[Array[Double]]): Int = {
    var s = 0
    var b = 0
    while (b < ps.length) {
      val p = ps(b)
      val n = math.min(p.length, v.numElements())
      var d = 0.0
      var i = 0
      while (i < n) { d += p(i) * v.getFloat(i); i += 1 }
      if (d >= 0) s |= (1 << b)
      b += 1
    }
    s
  }
}

/** IVF coarse-quantizer cell id: the index of the centroid with the
  * highest cosine similarity to the vector (first index on exact ties).
  * Cosine is accumulated exactly like [[CosineSim.compute]] so the DuckDB
  * oracle's `list_cosine_similarity` ranking reproduces the assignment.
  * Codegen'd — the embedding scan stays inside whole-stage codegen.
  */
case class IvfCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    IvfCell.compute(v.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.IvfCell.compute($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IvfCell {
  def cos(v: ArrayData, c: Array[Double]): Double = {
    val n = math.min(c.length, v.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val y = c(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** static so generated code can call it */
  def compute(v: ArrayData, cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val d = cos(v, cs(c))
      if (d > bestCos) { bestCos = d; best = c } // first-index ties
      c += 1
    }
    best
  }
}

/** The `nprobe` nearest IVF cells for a query vector, by (cosine desc,
  * cell asc) — the query-side companion of [[IvfCell]].
  */
case class IvfProbe(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    IvfProbe.compute(v.asInstanceOf[ArrayData], centroids, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.IvfProbe.compute($c, $ref, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IvfProbe {
  /** static so generated code can call it */
  def compute(v: ArrayData, cs: Array[Array[Double]],
              nprobe: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val sims = Array.tabulate(cs.length)(c => (IvfCell.cos(v, cs(c)), c))
    val top = sims.sortBy { case (d, c) => (-d, c) }.take(math.min(nprobe, cs.length))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(top.map(_._2))
  }
}

/** 64-bit SimHash over FNV-1a token hashes (graft.ops.Simhash semantics),
  * as a codegen'd expression — keeps the dedup scan inside whole-stage
  * codegen instead of a typed-map encoder round-trip.
  */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.ops.Simhash.of(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Simhash.of($c.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
