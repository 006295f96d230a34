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

  def relu(a: Array[Float]): Unit = {
    var i = 0
    while (i < a.length) { if (a(i) < 0f) a(i) = 0f; i += 1 }
  }
}

/** x·W + b over leading dims (exec/model.py:50-68). weight is [in,out]
  * (already transposed at export, model/exec.py:20-26).
  */
final case class Linear(weight: Array[Float], inDim: Int, outDim: Int,
                        bias: Array[Float]) extends Serializable {
  def apply(input: Array[Float], rows: Int): Array[Float] = {
    val out = new Array[Float](rows * outDim)
    Kernels.gemm(input, rows, inDim, weight, outDim, out)
    var r = 0
    while (r < rows) {
      val off = r * outDim
      var j = 0
      while (j < outDim) { out(off + j) += bias(j); j += 1 }
      r += 1
    }
    out
  }
}

/** 1-D convolution via im2col + GEMM (exec/model.py:71-112).
  * weight [filters, in, kernel] flattened as filters x (in*kernel);
  * input [B, in, seq] -> output [B, filters, seq] (padding keeps seq).
  */
final case class Conv1d(weight: Array[Float], filters: Int, inDim: Int,
                        kernel: Int, bias: Array[Float], padding: Int)
    extends Serializable {
  // pre-transposed [in*kernel, filters] for GEMM
  private val wT: Array[Float] = {
    val ik = inDim * kernel
    val t = new Array[Float](ik * filters)
    var f = 0
    while (f < filters) {
      var p = 0
      while (p < ik) { t(p * filters + f) = weight(f * ik + p); p += 1 }
      f += 1
    }
    t
  }

  def apply(input: Array[Float], batch: Int, seqLen: Int): Array[Float] = {
    val padded = seqLen + 2 * padding
    val windows = padded - kernel + 1 // == seqLen when padding=(kernel-1)/2
    val ik = inDim * kernel
    val col = new Array[Float](windows * ik)
    val prod = new Array[Float](windows * filters)
    val out = new Array[Float](batch * filters * windows)
    var b = 0
    while (b < batch) {
      // im2col: col[w, c*kernel + t] = input[b, c, w + t - padding]
      var w = 0
      while (w < windows) {
        val cOff = w * ik
        var c = 0
        while (c < inDim) {
          val iOff = (b * inDim + c) * seqLen
          var t = 0
          while (t < kernel) {
            val s = w + t - padding
            col(cOff + c * kernel + t) =
              if (s >= 0 && s < seqLen) input(iOff + s) else 0f
            t += 1
          }
          c += 1
        }
        w += 1
      }
      Kernels.gemm(col, windows, ik, wT, filters, prod)
      // prod is [w, f]; output wants [f, w] (+bias)
      var f = 0
      while (f < filters) {
        val oOff = (b * filters + f) * windows
        val bv = bias(f)
        var w2 = 0
        while (w2 < windows) { out(oOff + w2) = prod(w2 * filters + f) + bv; w2 += 1 }
        f += 1
      }
      b += 1
    }
    out
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
    val n = wordIds.length
    val out = new Array[Float](n * dim)
    var i = 0
    while (i < n) {
      word.lookup(wordIds(i), out, i * dim)
      shape.lookup(shapeIds(i), out, i * dim + word.dim)
      i += 1
    }
    out
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

  /** input [B,S,E] row-major, padMask [B,S] (true = PAD) -> [B,S,outDim]. */
  def apply(input: Array[Float], batch: Int, seqLen: Int, embDim: Int,
            padMask: Array[Boolean]): Array[Float] = {
    // swap to [B,C,S]
    var x = new Array[Float](batch * embDim * seqLen)
    var b = 0
    while (b < batch) {
      var s = 0
      while (s < seqLen) {
        var c = 0
        while (c < embDim) {
          x((b * embDim + c) * seqLen + s) = input((b * seqLen + s) * embDim + c)
          c += 1
        }
        s += 1
      }
      b += 1
    }
    var channels = embDim
    for (layer <- layers) {
      val y = layer.conv.apply(x, batch, seqLen)
      Kernels.relu(y)
      layer.norm.applyInPlace(y, batch, layer.conv.filters, seqLen)
      channels = layer.conv.filters
      // zero masked positions
      var bb = 0
      while (bb < batch) {
        var s = 0
        while (s < seqLen) {
          if (padMask(bb * seqLen + s)) {
            var c = 0
            while (c < channels) { y((bb * channels + c) * seqLen + s) = 0f; c += 1 }
          }
          s += 1
        }
        bb += 1
      }
      x = y
    }
    // swap back to [B,S,C]
    val out = new Array[Float](batch * seqLen * channels)
    b = 0
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

/** Viterbi decode over transitions[T,T] (exec/model.py:148-186).
  * emissions [B,S,T]; mask [B,S] true = valid token. Ties: first argmax.
  */
final case class CRF(transitions: Array[Float], tags: Int) extends Serializable {
  def decode(emissions: Array[Float], batch: Int, seqLen: Int,
             mask: Array[Boolean]): Array[Array[Int]] = {
    val T = tags
    val score = new Array[Float](batch * T)
    var b = 0
    while (b < batch) {
      System.arraycopy(emissions, (b * seqLen) * T, score, b * T, T)
      b += 1
    }
    // history(step)(b*T + tCur) = best previous tag
    val history = new Array[Array[Int]](math.max(0, seqLen - 1))
    val cand = new Array[Float](T)
    var index = 1
    while (index < seqLen) {
      val idx = new Array[Int](batch * T)
      b = 0
      while (b < batch) {
        val eOff = (b * seqLen + index) * T
        val sOff = b * T
        if (mask(b * seqLen + index)) {
          val newScore = new Array[Float](T)
          var tc = 0
          while (tc < T) {
            var tp = 0
            while (tp < T) { cand(tp) = score(sOff + tp) + transitions(tp * T + tc); tp += 1 }
            val bestPrev = Kernels.argmaxFirst(cand, 0, T)
            idx(sOff + tc) = bestPrev
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
            idx(sOff + tc) = Kernels.argmaxFirst(cand, 0, T)
            tc += 1
          }
        }
        b += 1
      }
      history(index - 1) = idx
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
        best = history(h)(b * T + best)
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
    val s1 = seqLen + 1
    val withRoot = SyntaxOps.appendRoot(input, batch, seqLen, dim, root)
    val h = head(withRoot, batch * s1) // [B,S+1,H]
    val t = tail(withRoot, batch * s1)
    // x = (h x kernel) x t^T per batch -> [B,S+1,S+1], strip root row
    val hk = new Array[Float](s1 * hidden)
    val out = new Array[Float](batch * seqLen * s1)
    val hBlock = new Array[Float](s1 * hidden)
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
    out
  }

  /** Masked argmax decode (exec/model.py:397-403): valid (token i, head j)
    * pairs are the outer product of the root-augmented valid mask,
    * root-row-stripped; invalid filled with the global min.
    */
  def decode(pred: Array[Float], batch: Int, seqLen: Int,
             valid: Array[Boolean]): Array[Int] = {
    val s1 = seqLen + 1
    var mn = Float.MaxValue
    var i = 0
    while (i < pred.length) { if (pred(i) < mn) mn = pred(i); i += 1 }
    val out = new Array[Int](batch * seqLen)
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
    val gathered = SyntaxOps.gatherHead(input, batch, seqLen, dim, root, headIds)
    val h = head(gathered, batch * seqLen) // [B,S,H]
    val t = tail(input, batch * seqLen)    // [B,S,H]
    val hk = new Array[Float](seqLen * hidden * rels)
    val out = new Array[Float](batch * seqLen * rels)
    val hBlock = new Array[Float](seqLen * hidden)
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
    out
  }

  /** Masked argmax over rels with global-min fill (exec/model.py:439-445). */
  def decode(pred: Array[Float], batch: Int, seqLen: Int,
             valid: Array[Boolean]): Array[Int] = {
    var mn = Float.MaxValue
    var i = 0
    while (i < pred.length) { if (pred(i) < mn) mn = pred(i); i += 1 }
    val out = new Array[Int](batch * seqLen)
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
    val s1 = seqLen + 1
    val out = new Array[Float](batch * s1 * dim)
    var b = 0
    while (b < batch) {
      System.arraycopy(root, 0, out, b * s1 * dim, dim)
      System.arraycopy(input, b * seqLen * dim, out, (b * s1 + 1) * dim, seqLen * dim)
      b += 1
    }
    out
  }

  /** Select per-token predicted-head vectors (exec/model.py:415-427). */
  def gatherHead(input: Array[Float], batch: Int, seqLen: Int, dim: Int,
                 root: Array[Float], headIds: Array[Int]): Array[Float] = {
    val out = new Array[Float](batch * seqLen * dim)
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
    out
  }
}
