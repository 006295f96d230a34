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
  def mix64(c: Column): Column = column(Mix64(expression(c)))
  def simhash64(c: Column): Column = column(Simhash64(expression(c)))
  def hyperplane_sig(c: Column, planes: Array[Array[Double]]): Column =
    column(HyperplaneSig(expression(c), planes))
  def ivf_cell(c: Column, centroids: Array[Array[Double]]): Column =
    column(IvfCell(expression(c), centroids))
  def ivf_probe(c: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    column(IvfProbe(expression(c), centroids, nprobe))
  def lower_simple(c: Column): Column = column(LowerSimple(expression(c)))
  def bloom_contains(c: Column, words: Array[Long], k: Int): Column =
    column(BloomContains(expression(c), words, k))
}

/** Per-codepoint SIMPLE Unicode lowercasing, straight over the UTF-8
  * bytes. Spark's `lower()` on non-ASCII strings takes the
  * collation-aware path (UTF8String.toValidString -> toString -> ICU full
  * CaseMap with Edits tracking -> fromString): on the Russian corpus that
  * chain was the single largest allocation site of the whole pipeline
  * (~24 GB of a 70 GB JFR profile — ICU char[] churn plus four byte[]
  * conversions per value). Simple mapping differs from full mapping only
  * in context-sensitive cases (final Greek sigma) and expansions
  * (U+0130 'İ' -> "i̇"), none of which exists in Cyrillic/Latin; use
  * `lower()` where full ICU semantics are required.
  */
case class LowerSimple(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    SimpleCase.lower(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimpleCase.lower($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object SimpleCase {
  /** In-place-width lowercase over UTF-8 bytes: ASCII and 2-byte
    * sequences (all of Cyrillic) lower without decoding to String; 3/4-byte
    * codepoints copy through when caseless, re-encode when the lowercase
    * keeps the same encoded width, and only a width-CHANGING lowercase
    * (vanishingly rare: e.g. U+023A -> U+2C65) falls back to the
    * String-building path. Two allocations per value on the fast path.
    */
  def lower(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) {
        out(i) = (if (b0 >= 'A' && b0 <= 'Z') b0 + 32 else b0).toByte
        i += 1
      } else if ((b0 & 0xE0) == 0xC0 && i + 1 < n) {
        val cp = ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F)
        val lc = Character.toLowerCase(cp)
        if (lc == cp) { out(i) = b(i); out(i + 1) = b(i + 1) }
        else if (lc >= 0x80 && lc <= 0x7FF) {
          out(i) = (0xC0 | (lc >> 6)).toByte
          out(i + 1) = (0x80 | (lc & 0x3F)).toByte
        } else return lowerViaString(s)
        i += 2
      } else if ((b0 & 0xF0) == 0xE0 && i + 2 < n) {
        val cp = ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        val lc = Character.toLowerCase(cp)
        if (lc == cp) { out(i) = b(i); out(i + 1) = b(i + 1); out(i + 2) = b(i + 2) }
        else if (lc >= 0x800 && lc <= 0xFFFF) {
          out(i) = (0xE0 | (lc >> 12)).toByte
          out(i + 1) = (0x80 | ((lc >> 6) & 0x3F)).toByte
          out(i + 2) = (0x80 | (lc & 0x3F)).toByte
        } else return lowerViaString(s)
        i += 3
      } else if ((b0 & 0xF8) == 0xF0 && i + 3 < n) {
        val cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        val lc = Character.toLowerCase(cp)
        if (lc == cp) {
          out(i) = b(i); out(i + 1) = b(i + 1)
          out(i + 2) = b(i + 2); out(i + 3) = b(i + 3)
        } else if (lc >= 0x10000) {
          out(i) = (0xF0 | (lc >> 18)).toByte
          out(i + 1) = (0x80 | ((lc >> 12) & 0x3F)).toByte
          out(i + 2) = (0x80 | ((lc >> 6) & 0x3F)).toByte
          out(i + 3) = (0x80 | (lc & 0x3F)).toByte
        } else return lowerViaString(s)
        i += 4
      } else { // malformed tail: copy verbatim (Spark strings are valid UTF-8)
        out(i) = b(i)
        i += 1
      }
    }
    UTF8String.fromBytes(out)
  }

  /** Same SIMPLE per-codepoint mapping, via String — only for inputs with
    * a width-changing lowercase. */
  private def lowerViaString(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
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

/** splitmix64 finalizer over a long column — the avalanche mix sketches
  * (HLL register selection) need on top of the structure-preserving
  * [[PolyHash]]. Delegates to RuCorpus.mix, whose DuckDB twin
  * (OracleSql.mixSql) is verified bit-exact including inputs >= 2^63.
  */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.corpus.RuCorpus.mix(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.corpus.RuCorpus.mix($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
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

/** Bloom-filter membership probe over a long-hash column. The bit array
  * (`words`, m = 64·words.length bits, power of two) is built once on the
  * driver from the SMALL side's hashes and rides into generated code via
  * `addReferenceObj` — one shared array per executor, no giant literal in
  * the plan. k probe positions come from double hashing (Kirsch &
  * Mitzenmacher 2006: pos_i = h1 + i·h2 works as well as k independent
  * hashes), h1/h2 derived from the input through the same mix64 finalizer
  * the sketches use.
  *
  * Guarantee the callers build on: NO false negatives — every hash that
  * was fed to [[Bloom64.build]] probes true. False positives (~(1-e^(-kn/m))^k)
  * only admit extra rows into whatever exact verify runs next.
  */
case class BloomContains(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    Bloom64.contains(words, k, v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bloom64.contains($ref, $k, $c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Bloom64 {
  private def mix(z0: Long): Long = { // splitmix64 finalizer (public domain)
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sized so m = nextPow2(n*bitsPerElement) — power-of-two m lets the
    * probe mask instead of mod. ~16 bits/element with k=5 gives fpp ~5e-4;
    * vs a broadcast-join hashtable (~16 bytes + table overhead per key)
    * that is a 10–20x memory cut, which is what keeps a 100M-n-gram eval
    * union broadcastable on a 1000-executor cluster.
    */
  def build(hashes: Array[Long], bitsPerElement: Int = 16, k: Int = 5): Array[Long] = {
    val wantBits = math.max(64L, hashes.length.toLong * bitsPerElement)
    var m = 64L
    while (m < wantBits) m <<= 1
    require(m <= (1L << 36), s"bloom of $m bits (> 8 GiB) — shard the build")
    val words = new Array[Long]((m >>> 6).toInt)
    var i = 0
    while (i < hashes.length) {
      val h1 = mix(hashes(i))
      val h2 = mix(h1) | 1L
      var j = 0
      while (j < k) {
        val pos = ((h1 + j * h2) & (m - 1)).toInt
        words(pos >>> 6) |= (1L << (pos & 63))
        j += 1
      }
      i += 1
    }
    words
  }

  /** static so generated code can call it; words.length is a power of two */
  def contains(words: Array[Long], k: Int, h: Long): Boolean = {
    val m = words.length.toLong << 6
    val h1 = mix(h)
    val h2 = mix(h1) | 1L
    var j = 0
    while (j < k) {
      val pos = ((h1 + j * h2) & (m - 1)).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      j += 1
    }
    true
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
