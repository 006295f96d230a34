package graft.kernel

/** f32 tensor kernels — the physical operators of the inference engine.
  *
  * Re-creates the semantics of the reference's NumPy exec engine
  * (reference: slovnet/exec/model.py). Layout: flat row-major
  * `Array[Float]`; a [B,S,D] tensor indexes as (b*S+s)*D+d. All kernels are
  * allocation-light and run inside `mapPartitions` on executors; model
  * weights arrive via one broadcast per job.
  *
  * Tie-breaking: every argmax returns the FIRST maximal index, matching
  * `numpy.argmax` (parity-critical for CRF/biaffine decode).
  */
object Kernels {

  /** out[m,n] = a[m,k] x b[k,n] (+= if acc). */
  def gemm(a: Array[Float], m: Int, k: Int, b: Array[Float], n: Int,
           out: Array[Float]): Unit = {
    java.util.Arrays.fill(out, 0, m * n, 0f)
    var i = 0
    while (i < m) {
      var p = 0
      while (p < k) {
        val av = a(i * k + p)
        if (av != 0f) {
          val bOff = p * n
          val oOff = i * n
          var j = 0
          while (j < n) { out(oOff + j) += av * b(bOff + j); j += 1 }
        }
        p += 1
      }
      i += 1
    }
  }

  def argmaxFirst(a: Array[Float], off: Int, len: Int): Int = {
    var best = 0
    var bv = a(off)
    var i = 1
    while (i < len) {
      val v = a(off + i)
      if (v > bv) { bv = v; best = i }
      i += 1
    }
    best
  }

  def relu(a: Array[Float]): Unit = relu(a, a.length)

  /** workspace buffers may be longer than the logical size */
  def relu(a: Array[Float], n: Int): Unit = {
    var i = 0
    while (i < n) { if (a(i) < 0f) a(i) = 0f; i += 1 }
  }
}

/** x·W + b over leading dims (exec/model.py:50-68). weight is [in,out]
  * (already transposed at export, model/exec.py:20-26).
  */
final case class Linear(weight: Array[Float], inDim: Int, outDim: Int,
                        bias: Array[Float]) extends Serializable {
  def apply(input: Array[Float], rows: Int): Array[Float] = {
    val out = new Array[Float](rows * outDim)
    into(input, rows, out)
    out
  }

  /** write x·W + b into a caller-provided buffer (≥ rows*outDim). */
  def into(input: Array[Float], rows: Int, out: Array[Float]): Unit = {
    Kernels.gemm(input, rows, inDim, weight, outDim, out)
    var r = 0
    while (r < rows) {
      val off = r * outDim
      var j = 0
      while (j < outDim) { out(off + j) += bias(j); j += 1 }
      r += 1
    }
  }
}

/** 1-D convolution via im2col + GEMM (exec/model.py:71-112).
  * weight [filters, in, kernel] flattened as filters x (in*kernel);
  * input [B, in, seq] -> output [B, filters, seq] (padding keeps seq).
  */
final case class Conv1d(weight: Array[Float], filters: Int, inDim: Int,
                        kernel: Int, bias: Array[Float], padding: Int)
    extends Serializable {

  // nonzero taps in (filter, channel, tap) ascending order — iterating only
  // these preserves the per-output-element accumulation order while
  // skipping the (dominant, for sparse weights) zero-weight scan
  @transient private lazy val nzTaps: (Array[Int], Array[Int], Array[Float]) = {
    // the 4-bit tap packing below holds only for small kernels/padding
    // (all shipped packs are kernel=3/padding=1); fail loudly otherwise
    require(padding <= 8 && kernel - padding <= 8,
      s"tap packing supports kernel-padding<=8, padding<=8 (kernel=$kernel padding=$padding)")
    val fs = Array.newBuilder[Int]   // filter
    val cd = Array.newBuilder[Int]   // channel * 16 + (tap - padding + 8)
    val vs = Array.newBuilder[Float]
    var f = 0
    while (f < filters) {
      var c = 0
      while (c < inDim) {
        var t = 0
        while (t < kernel) {
          val v = weight((f * inDim + c) * kernel + t)
          if (v != 0f) { fs += f; cd += c * 16 + (t - padding + 8); vs += v }
          t += 1
        }
        c += 1
      }
      f += 1
    }
    (fs.result(), cd.result(), vs.result())
  }

  def apply(input: Array[Float], batch: Int, seqLen: Int): Array[Float] = {
    val windows = seqLen + 2 * padding - kernel + 1
    val out = new Array[Float](batch * filters * windows)
    into(input, batch, seqLen, out)
    out
  }

  /** Direct convolution, tap-accumulation form (numerically identical to
    * the reference's im2col+GEMM: per output element the products are added
    * in the same (channel-major, tap-minor) order, bias last). Each
    * (filter, channel, tap) pass is a unit-stride saxpy over the sequence —
    * JIT-vectorizable, no im2col materialization (the im2col inner loop was
    * 56% of pipeline CPU in JFR), and taps with zero weight are skipped
    * entirely. out ≥ batch*filters*seqLen (requires the reference's
    * same-pad config: windows == seqLen).
    */
  def into(input: Array[Float], batch: Int, seqLen: Int, out: Array[Float]): Unit = {
    // the direct form assumes same-padding output (windows == seqLen)
    require(seqLen + 2 * padding - kernel + 1 == seqLen,
      s"Conv1d.into requires same padding (kernel=$kernel padding=$padding)")
    val (nzF, nzCD, nzV) = nzTaps
    val n = nzF.length
    var b = 0
    while (b < batch) {
      val oBase = b * filters * seqLen
      val iBase = b * inDim * seqLen
      java.util.Arrays.fill(out, oBase, oBase + filters * seqLen, 0f)
      var i = 0
      while (i < n) {
        val oOff = oBase + nzF(i) * seqLen
        val cd = nzCD(i)
        val d = (cd & 15) - 8 // out[s] += v * in[s + d]
        val io = iBase + (cd >>> 4) * seqLen + d
        val v = nzV(i)
        var s = if (d < 0) -d else 0
        val e = if (d > 0) seqLen - d else seqLen
        while (s < e) { out(oOff + s) += v * input(io + s); s += 1 }
        i += 1
      }
      var f = 0
      while (f < filters) {
        val bv = bias(f)
        if (bv != 0f) {
          val oOff = oBase + f * seqLen
          var s = 0
          while (s < seqLen) { out(oOff + s) += bv; s += 1 }
        }
        f += 1
      }
      b += 1
    }
  }
}

/** (x-mean)/std*w+b per channel on [B,C,L] (exec/model.py:120-138;
  * std = sqrt(var+eps) folded at export, model/exec.py:39-46).
  */
final case class BatchNorm1d(weight: Array[Float], bias: Array[Float],
                             mean: Array[Float], std: Array[Float])
    extends Serializable {
  def applyInPlace(x: Array[Float], batch: Int, channels: Int, len: Int): Unit = {
    var b = 0
    while (b < batch) {
      var c = 0
      while (c < channels) {
        val off = (b * channels + c) * len
        val m = mean(c); val s = std(c); val w = weight(c); val bi = bias(c)
        var l = 0
        while (l < len) { x(off + l) = (x(off + l) - m) / s * w + bi; l += 1 }
        c += 1
      }
      b += 1
    }
  }
}

/** Plain embedding gather (exec/model.py:196-210). weight [vocab, dim]. */
final case class Embedding(weight: Array[Float], dim: Int) extends Serializable {
  def lookup(id: Int, out: Array[Float], off: Int): Unit =
    System.arraycopy(weight, id * dim, out, off, dim)
}

/** Product-quantized Navec embedding (exec/model.py:213-234).
  * indexes [vocab, qdim] (centroid ids), codes [qdim, centroids, chunk];
  * a word vector is the concat of its per-subquantizer centroid chunks:
  * dim = qdim*chunk. Keeps the broadcast small (u8-size ids + one codebook).
  */
final case class NavecEmbedding(indexes: Array[Int], qdim: Int,
                                codes: Array[Float], centroids: Int, chunk: Int)
    extends Serializable {
  val dim: Int = qdim * chunk
  def lookup(id: Int, out: Array[Float], off: Int): Unit = {
    var q = 0
    while (q < qdim) {
      val cIdx = indexes(id * qdim + q)
      System.arraycopy(codes, (q * centroids + cIdx) * chunk, out, off + q * chunk, chunk)
      q += 1
    }
  }
}

/** concat(navec word emb, shape emb) (exec/model.py:237-247). */
final case class WordShapeEmbedding(word: NavecEmbedding, shape: Embedding)
    extends Serializable {
  val dim: Int = word.dim + shape.dim
  /** wordIds/shapeIds [B*S] -> [B*S, dim] */
  def apply(wordIds: Array[Int], shapeIds: Array[Int]): Array[Float] = {
    val out = new Array[Float](wordIds.length * dim)
    into(wordIds, shapeIds, wordIds.length, out)
    out
  }

  def into(wordIds: Array[Int], shapeIds: Array[Int], n: Int,
           out: Array[Float]): Unit = {
    var i = 0
    while (i < n) {
      word.lookup(wordIds(i), out, i * dim)
      shape.lookup(shapeIds(i), out, i * dim + word.dim)
      i += 1
    }
  }
}

/** conv -> relu -> batchnorm (exec/model.py:257-268). */
final case class CNNEncoderLayer(conv: Conv1d, norm: BatchNorm1d) extends Serializable

/** Masked CNN encoder (exec/model.py:271-286): runs layers on [B,C,S],
  * zeroing PAD positions after EVERY layer (parity-critical near
  * boundaries since conv kernels straddle the pad).
  */
final case class CNNEncoder(layers: Seq[CNNEncoderLayer]) extends Serializable {
  val outDim: Int = layers.last.conv.filters
  @transient private lazy val layerArr: Array[CNNEncoderLayer] = layers.toArray

  /** input [B,S,E] row-major, padMask [B,S] (true = PAD) -> [B,S,outDim].
    * Allocating path (tests/oracle); the pipeline uses [[forwardT]] with a
    * per-partition workspace.
    */
  def apply(input: Array[Float], batch: Int, seqLen: Int, embDim: Int,
            padMask: Array[Boolean]): Array[Float] = {
    val ws = new Workspace
    val xT = new Array[Float](batch * embDim * seqLen)
    CNNEncoder.transposeInto(input, batch, seqLen, embDim, xT)
    val enc = forwardT(xT, batch, seqLen, embDim, padMask, ws)
    java.util.Arrays.copyOf(enc, batch * seqLen * outDim)
  }

  /** xT [B,E,S] (left untouched, reusable across the three trunks) ->
    * [B,S,outDim] written into ws(WS.ENC_OUT); valid until the next
    * forwardT call on the same workspace.
    */
  def forwardT(xT: Array[Float], batch: Int, seqLen: Int, embDim: Int,
               padMask: Array[Boolean], ws: Workspace): Array[Float] = {
    val ls = layerArr
    var x = xT
    var channels = embDim
    var li = 0
    while (li < ls.length) {
      val layer = ls(li)
      val f = layer.conv.filters
      val y = ws.f(if (li % 2 == 0) WS.ENC_A else WS.ENC_B, batch * f * seqLen)
      layer.conv.into(x, batch, seqLen, y)
      Kernels.relu(y, batch * f * seqLen)
      layer.norm.applyInPlace(y, batch, f, seqLen)
      // zero masked positions after EVERY layer (exec/model.py:277-286)
      var bb = 0
      while (bb < batch) {
        var s = 0
        while (s < seqLen) {
          if (padMask(bb * seqLen + s)) {
            var c = 0
            while (c < f) { y((bb * f + c) * seqLen + s) = 0f; c += 1 }
          }
          s += 1
        }
        bb += 1
      }
      x = y
      channels = f
      li += 1
    }
    // swap back to [B,S,C]
    val out = ws.f(WS.ENC_OUT, batch * seqLen * channels)
    var b = 0
    while (b < batch) {
      var s = 0
      while (s < seqLen) {
        var c = 0
        while (c < channels) {
          out((b * seqLen + s) * channels + c) = x((b * channels + c) * seqLen + s)
          c += 1
        }
        s += 1
      }
      b += 1
    }
    out
  }
}

object CNNEncoder {
  /** [B,S,E] -> [B,E,S] */
  def transposeInto(input: Array[Float], batch: Int, seqLen: Int, embDim: Int,
                    out: Array[Float]): Unit = {
    var b = 0
    while (b < batch) {
      var s = 0
      while (s < seqLen) {
        var c = 0
        while (c < embDim) {
          out((b * embDim + c) * seqLen + s) = input((b * seqLen + s) * embDim + c)
          c += 1
        }
        s += 1
      }
      b += 1
    }
  }
}

/** Viterbi decode over transitions[T,T] (exec/model.py:148-186).
  * emissions [B,S,T]; mask [B,S] true = valid token. Ties: first argmax.
  */
final case class CRF(transitions: Array[Float], tags: Int) extends Serializable {
  // with all-zero transitions, cand(tp) = score(tp) + 0f for every target
  // tag, so the inner T×T loop collapses to one argmax over score — same
  // arithmetic (x + 0f), same first-index tie-breaks, T ops instead of T²
  @transient private lazy val zeroTransitions: Boolean = {
    var i = 0
    var z = true
    while (z && i < transitions.length) { z = transitions(i) == 0f; i += 1 }
    z
  }

  def decode(emissions: Array[Float], batch: Int, seqLen: Int,
             mask: Array[Boolean]): Array[Array[Int]] =
    decode(emissions, batch, seqLen, mask, new Workspace)

  def decode(emissions: Array[Float], batch: Int, seqLen: Int,
             mask: Array[Boolean], ws: Workspace): Array[Array[Int]] = {
    val T = tags
    val score = ws.f(WS.CRF_SCORE, batch * T)
    var b = 0
    while (b < batch) {
      System.arraycopy(emissions, (b * seqLen) * T, score, b * T, T)
      b += 1
    }
    // history[(step-1)*batch*T + b*T + tCur] = best previous tag
    val bt = batch * T
    val history = ws.i(WS.CRF_HIST, math.max(0, seqLen - 1) * bt)
    val cand = ws.f(WS.CRF_CAND, T)
    val newScore = ws.f(WS.CRF_NS, T)
    var index = 1
    while (index < seqLen) {
      val hOff = (index - 1) * bt
      b = 0
      while (b < batch) {
        val eOff = (b * seqLen + index) * T
        val sOff = b * T
        if (zeroTransitions) {
          // collapsed inner loop; arithmetic identical to the general path
          val bestPrev = Kernels.argmaxFirst(score, sOff, T)
          java.util.Arrays.fill(history, hOff + sOff, hOff + sOff + T, bestPrev)
          if (mask(b * seqLen + index)) {
            val base = score(sOff + bestPrev) + 0f
            var tc = 0
            while (tc < T) { score(sOff + tc) = base + emissions(eOff + tc); tc += 1 }
          }
        } else if (mask(b * seqLen + index)) {
          var tc = 0
          while (tc < T) {
            var tp = 0
            while (tp < T) { cand(tp) = score(sOff + tp) + transitions(tp * T + tc); tp += 1 }
            val bestPrev = Kernels.argmaxFirst(cand, 0, T)
            history(hOff + sOff + tc) = bestPrev
            newScore(tc) = cand(bestPrev) + emissions(eOff + tc)
            tc += 1
          }
          System.arraycopy(newScore, 0, score, sOff, T)
        } else {
          // history still records indexes (reference appends pre-where
          // indexes), but score keeps its value for masked steps
          var tc = 0
          while (tc < T) {
            var tp = 0
            while (tp < T) { cand(tp) = score(sOff + tp) + transitions(tp * T + tc); tp += 1 }
            history(hOff + sOff + tc) = Kernels.argmaxFirst(cand, 0, T)
            tc += 1
          }
        }
        b += 1
      }
      index += 1
    }
    val out = new Array[Array[Int]](batch)
    b = 0
    while (b < batch) {
      var size = 0
      var s = 0
      while (s < seqLen) { if (mask(b * seqLen + s)) size += 1; s += 1 }
      val n = math.max(size, 1)
      var best = Kernels.argmaxFirst(score, b * T, T)
      val tags0 = new Array[Int](n)
      tags0(n - 1) = best
      var h = size - 2
      while (h >= 0) {
        best = history(h * bt + b * T + best)
        tags0(h) = best
        h -= 1
      }
      out(b) = if (size == 0) Array.empty[Int] else tags0
      b += 1
    }
    out
  }
}

/** linear + relu (exec/model.py:352-361). */
final case class FF(proj: Linear) extends Serializable {
  def apply(input: Array[Float], rows: Int): Array[Float] = {
    val out = proj(input, rows)
    Kernels.relu(out)
    out
  }
  def into(input: Array[Float], rows: Int, out: Array[Float]): Unit = {
    proj.into(input, rows, out)
    Kernels.relu(out, rows * proj.outDim)
  }
}

/** Biaffine arc scorer (exec/model.py:388-412): scores[b,s,h] over
  * S+1 candidate heads (0 = root); decode = masked argmax with global-min
  * fill.
  */
final case class SyntaxHead(head: FF, tail: FF, root: Array[Float],
                            kernel: Array[Float], hidden: Int)
    extends Serializable {
  /** input [B,S,D] -> scores [B,S,S+1] */
  def apply(input: Array[Float], batch: Int, seqLen: Int, dim: Int): Array[Float] = {
    val out = new Array[Float](batch * seqLen * (seqLen + 1))
    into(input, batch, seqLen, dim, new Workspace, out)
    out
  }

  def into(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
           ws: Workspace, out: Array[Float]): Unit = {
    val s1 = seqLen + 1
    val withRoot = ws.f(WS.SH_ROOT, batch * s1 * dim)
    SyntaxOps.appendRootInto(input, batch, seqLen, dim, root, withRoot)
    val h = ws.f(WS.SH_H, batch * s1 * hidden)
    head.into(withRoot, batch * s1, h) // [B,S+1,H]
    val t = ws.f(WS.SH_T, batch * s1 * hidden)
    tail.into(withRoot, batch * s1, t)
    // x = (h x kernel) x t^T per batch -> [B,S+1,S+1], strip root row
    val hk = ws.f(WS.SH_HK, s1 * hidden)
    val hBlock = ws.f(WS.SH_HB, s1 * hidden)
    var b = 0
    while (b < batch) {
      System.arraycopy(h, b * s1 * hidden, hBlock, 0, s1 * hidden)
      Kernels.gemm(hBlock, s1, hidden, kernel, hidden, hk)
      // scores[i,j] = hk[i,:] . t[b,j,:]
      var i = 1 // strip root row (output rows = tokens only)
      while (i < s1) {
        val oOff = (b * seqLen + (i - 1)) * s1
        var j = 0
        while (j < s1) {
          val tOff = (b * s1 + j) * hidden
          var d = 0
          var acc = 0f
          while (d < hidden) { acc += hk(i * hidden + d) * t(tOff + d); d += 1 }
          out(oOff + j) = acc
          j += 1
        }
        i += 1
      }
      b += 1
    }
  }

  /** Masked argmax decode (exec/model.py:397-403): valid (token i, head j)
    * pairs are the outer product of the root-augmented valid mask,
    * root-row-stripped; invalid filled with the global min.
    */
  def decode(pred: Array[Float], batch: Int, seqLen: Int,
             valid: Array[Boolean]): Array[Int] =
    decodeInto(pred, batch, seqLen, valid, new Array[Int](batch * seqLen))

  def decodeInto(pred: Array[Float], batch: Int, seqLen: Int,
                 valid: Array[Boolean], out: Array[Int]): Array[Int] = {
    val s1 = seqLen + 1
    val n = batch * seqLen * s1
    var mn = Float.MaxValue
    var i = 0
    while (i < n) { if (pred(i) < mn) mn = pred(i); i += 1 }
    var b = 0
    while (b < batch) {
      var s = 0
      while (s < seqLen) {
        val off = (b * seqLen + s) * s1
        val rowValid = valid(b * seqLen + s)
        var best = 0
        var bv = Float.NegativeInfinity
        var j = 0
        while (j < s1) {
          val colValid = j == 0 || valid(b * seqLen + (j - 1))
          val v = if (rowValid && colValid) pred(off + j) else mn
          if (v > bv) { bv = v; best = j }
          j += 1
        }
        out(b * seqLen + s) = best
        s += 1
      }
      b += 1
    }
    out
  }
}

/** Biaffine relation scorer conditioned on decoded heads
  * (exec/model.py:430-458). kernel [H, H*R].
  */
final case class SyntaxRel(head: FF, tail: FF, root: Array[Float],
                           kernel: Array[Float], hidden: Int, rels: Int)
    extends Serializable {
  /** input [B,S,D], headIds [B,S] (0=root) -> scores [B,S,R] */
  def apply(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
            headIds: Array[Int]): Array[Float] = {
    val out = new Array[Float](batch * seqLen * rels)
    into(input, batch, seqLen, dim, headIds, new Workspace, out)
    out
  }

  def into(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
           headIds: Array[Int], ws: Workspace, out: Array[Float]): Unit = {
    val gathered = ws.f(WS.GATH, batch * seqLen * dim)
    SyntaxOps.gatherHeadInto(input, batch, seqLen, dim, root, headIds, gathered)
    val h = ws.f(WS.SH_H, batch * seqLen * hidden)
    head.into(gathered, batch * seqLen, h) // [B,S,H]
    val t = ws.f(WS.SH_T, batch * seqLen * hidden)
    tail.into(input, batch * seqLen, t)    // [B,S,H]
    val hk = ws.f(WS.SH_HK, seqLen * hidden * rels)
    val hBlock = ws.f(WS.SH_HB, seqLen * hidden)
    var b = 0
    while (b < batch) {
      System.arraycopy(h, b * seqLen * hidden, hBlock, 0, seqLen * hidden)
      Kernels.gemm(hBlock, seqLen, hidden, kernel, hidden * rels, hk)
      // out[s,r] = hk[s, r*hidden:(r+1)*hidden] . t[b,s,:]
      // NOTE kernel layout is [H, H*R]; numpy reshape of the product row
      // (len H*R) to [R,H] means rel r occupies columns [r*H, (r+1)*H)
      var s = 0
      while (s < seqLen) {
        val tOff = (b * seqLen + s) * hidden
        var r = 0
        while (r < rels) {
          var d = 0
          var acc = 0f
          val hkOff = s * hidden * rels + r * hidden
          while (d < hidden) { acc += hk(hkOff + d) * t(tOff + d); d += 1 }
          out((b * seqLen + s) * rels + r) = acc
          r += 1
        }
        s += 1
      }
      b += 1
    }
  }

  /** Masked argmax over rels with global-min fill (exec/model.py:439-445). */
  def decode(pred: Array[Float], batch: Int, seqLen: Int,
             valid: Array[Boolean]): Array[Int] =
    decodeInto(pred, batch, seqLen, valid, new Array[Int](batch * seqLen))

  def decodeInto(pred: Array[Float], batch: Int, seqLen: Int,
                 valid: Array[Boolean], out: Array[Int]): Array[Int] = {
    val n = batch * seqLen * rels
    var mn = Float.MaxValue
    var i = 0
    while (i < n) { if (pred(i) < mn) mn = pred(i); i += 1 }
    var p = 0
    while (p < batch * seqLen) {
      if (valid(p)) out(p) = Kernels.argmaxFirst(pred, p * rels, rels)
      else {
        // whole row filled with mn -> argmax = 0
        out(p) = 0
      }
      p += 1
    }
    out
  }
}

object SyntaxOps {
  /** Prepend learned ROOT vector (exec/model.py:364-371): [B,S,D] -> [B,S+1,D]. */
  def appendRoot(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
                 root: Array[Float]): Array[Float] = {
    val out = new Array[Float](batch * (seqLen + 1) * dim)
    appendRootInto(input, batch, seqLen, dim, root, out)
    out
  }

  def appendRootInto(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
                     root: Array[Float], out: Array[Float]): Unit = {
    val s1 = seqLen + 1
    var b = 0
    while (b < batch) {
      System.arraycopy(root, 0, out, b * s1 * dim, dim)
      System.arraycopy(input, b * seqLen * dim, out, (b * s1 + 1) * dim, seqLen * dim)
      b += 1
    }
  }

  /** Select per-token predicted-head vectors (exec/model.py:415-427). */
  def gatherHead(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
                 root: Array[Float], headIds: Array[Int]): Array[Float] = {
    val out = new Array[Float](batch * seqLen * dim)
    gatherHeadInto(input, batch, seqLen, dim, root, headIds, out)
    out
  }

  def gatherHeadInto(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
                     root: Array[Float], headIds: Array[Int],
                     out: Array[Float]): Unit = {
    var b = 0
    while (b < batch) {
      var s = 0
      while (s < seqLen) {
        val hid = headIds(b * seqLen + s) // 0 = root, 1..S = token index+1
        if (hid == 0)
          System.arraycopy(root, 0, out, (b * seqLen + s) * dim, dim)
        else
          System.arraycopy(input, (b * seqLen + (hid - 1)) * dim, out,
            (b * seqLen + s) * dim, dim)
        s += 1
      }
      b += 1
    }
  }
}
