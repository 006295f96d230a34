package graft.kernel

import jdk.incubator.vector.{FloatVector, VectorSpecies}

/** SIMD twin of the scalar dense GEMM (Kernels.gemmDenseScalar), built on
  * the JDK Vector API (AVX-512 on this box: 16 f32 lanes).
  *
  * BIT-EXACT CONTRACT: per-output-element arithmetic — operation order and
  * per-op f32 rounding — is IDENTICAL to the scalar path. Lanes are
  * independent output columns; accumulation still walks k in the same
  * 4-term groups, left-associated, and deliberately does NOT use fused
  * multiply-add (the scalar path rounds after each mul and each add, so a
  * fused intermediate would change results). Golden checksums therefore do
  * not depend on which path ran; Kernels dispatches here when the Vector
  * API module is present and falls back to the scalar loop otherwise.
  *
  * Layout matches exec/model.py:97-108's im2col GEMM: a[m,k] row-major
  * (im2col columns), b[k,n] row-major (pre-transposed weight), out[m,n].
  *
  * Register blocking: 2 output rows x 4 vectors (2x64 floats at AVX-512)
  * held in registers across the whole k loop — out is written once per
  * tile instead of re-loaded per k-group, and each loaded b vector feeds
  * two rows.
  */
private[graft] object VectorGemm {
  private val SP: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_PREFERRED
  private val L = SP.length()

  /** Used by Kernels to decide dispatch once at class-load. */
  def lanes: Int = L

  def gemmDense(a: Array[Float], m: Int, k: Int, b: Array[Float], n: Int,
                out: Array[Float]): Unit = {
    val k4 = k - (k & 3)
    val n4v = n - n % (4 * L) // columns covered by 4-vector tiles
    val n1v = n - n % L       // columns covered by single-vector tiles
    var i = 0
    while (i + 2 <= m) {
      val aA = i * k
      val aB = aA + k
      val oA = i * n
      val oB = oA + n
      // --- 2 rows x 4 vectors register tile
      var j = 0
      while (j < n4v) {
        var acc00 = FloatVector.zero(SP); var acc01 = FloatVector.zero(SP)
        var acc02 = FloatVector.zero(SP); var acc03 = FloatVector.zero(SP)
        var acc10 = FloatVector.zero(SP); var acc11 = FloatVector.zero(SP)
        var acc12 = FloatVector.zero(SP); var acc13 = FloatVector.zero(SP)
        var p = 0
        while (p < k4) {
          // same 4-term groups as the scalar path:
          // acc += ((a0*t0 + a1*t1) + a2*t2) + a3*t3
          val a00 = a(aA + p); val a01 = a(aA + p + 1)
          val a02 = a(aA + p + 2); val a03 = a(aA + p + 3)
          val a10 = a(aB + p); val a11 = a(aB + p + 1)
          val a12 = a(aB + p + 2); val a13 = a(aB + p + 3)
          val b0 = p * n + j; val b1 = b0 + n; val b2 = b1 + n; val b3 = b2 + n
          var t0 = FloatVector.fromArray(SP, b, b0)
          var t1 = FloatVector.fromArray(SP, b, b1)
          var t2 = FloatVector.fromArray(SP, b, b2)
          var t3 = FloatVector.fromArray(SP, b, b3)
          acc00 = acc00.add(t0.mul(a00).add(t1.mul(a01)).add(t2.mul(a02)).add(t3.mul(a03)))
          acc10 = acc10.add(t0.mul(a10).add(t1.mul(a11)).add(t2.mul(a12)).add(t3.mul(a13)))
          t0 = FloatVector.fromArray(SP, b, b0 + L)
          t1 = FloatVector.fromArray(SP, b, b1 + L)
          t2 = FloatVector.fromArray(SP, b, b2 + L)
          t3 = FloatVector.fromArray(SP, b, b3 + L)
          acc01 = acc01.add(t0.mul(a00).add(t1.mul(a01)).add(t2.mul(a02)).add(t3.mul(a03)))
          acc11 = acc11.add(t0.mul(a10).add(t1.mul(a11)).add(t2.mul(a12)).add(t3.mul(a13)))
          t0 = FloatVector.fromArray(SP, b, b0 + 2 * L)
          t1 = FloatVector.fromArray(SP, b, b1 + 2 * L)
          t2 = FloatVector.fromArray(SP, b, b2 + 2 * L)
          t3 = FloatVector.fromArray(SP, b, b3 + 2 * L)
          acc02 = acc02.add(t0.mul(a00).add(t1.mul(a01)).add(t2.mul(a02)).add(t3.mul(a03)))
          acc12 = acc12.add(t0.mul(a10).add(t1.mul(a11)).add(t2.mul(a12)).add(t3.mul(a13)))
          t0 = FloatVector.fromArray(SP, b, b0 + 3 * L)
          t1 = FloatVector.fromArray(SP, b, b1 + 3 * L)
          t2 = FloatVector.fromArray(SP, b, b2 + 3 * L)
          t3 = FloatVector.fromArray(SP, b, b3 + 3 * L)
          acc03 = acc03.add(t0.mul(a00).add(t1.mul(a01)).add(t2.mul(a02)).add(t3.mul(a03)))
          acc13 = acc13.add(t0.mul(a10).add(t1.mul(a11)).add(t2.mul(a12)).add(t3.mul(a13)))
          p += 4
        }
        while (p < k) { // k remainder: one term per step, same as scalar
          val avA = a(aA + p); val avB = a(aB + p)
          val b0 = p * n + j
          val t0 = FloatVector.fromArray(SP, b, b0)
          val t1 = FloatVector.fromArray(SP, b, b0 + L)
          val t2 = FloatVector.fromArray(SP, b, b0 + 2 * L)
          val t3 = FloatVector.fromArray(SP, b, b0 + 3 * L)
          acc00 = acc00.add(t0.mul(avA)); acc10 = acc10.add(t0.mul(avB))
          acc01 = acc01.add(t1.mul(avA)); acc11 = acc11.add(t1.mul(avB))
          acc02 = acc02.add(t2.mul(avA)); acc12 = acc12.add(t2.mul(avB))
          acc03 = acc03.add(t3.mul(avA)); acc13 = acc13.add(t3.mul(avB))
          p += 1
        }
        acc00.intoArray(out, oA + j); acc01.intoArray(out, oA + j + L)
        acc02.intoArray(out, oA + j + 2 * L); acc03.intoArray(out, oA + j + 3 * L)
        acc10.intoArray(out, oB + j); acc11.intoArray(out, oB + j + L)
        acc12.intoArray(out, oB + j + 2 * L); acc13.intoArray(out, oB + j + 3 * L)
        j += 4 * L
      }
      // --- single-vector columns
      while (j < n1v) {
        var accA = FloatVector.zero(SP)
        var accB = FloatVector.zero(SP)
        var p = 0
        while (p < k4) {
          val a00 = a(aA + p); val a01 = a(aA + p + 1)
          val a02 = a(aA + p + 2); val a03 = a(aA + p + 3)
          val a10 = a(aB + p); val a11 = a(aB + p + 1)
          val a12 = a(aB + p + 2); val a13 = a(aB + p + 3)
          val b0 = p * n + j; val b1 = b0 + n; val b2 = b1 + n; val b3 = b2 + n
          val t0 = FloatVector.fromArray(SP, b, b0)
          val t1 = FloatVector.fromArray(SP, b, b1)
          val t2 = FloatVector.fromArray(SP, b, b2)
          val t3 = FloatVector.fromArray(SP, b, b3)
          accA = accA.add(t0.mul(a00).add(t1.mul(a01)).add(t2.mul(a02)).add(t3.mul(a03)))
          accB = accB.add(t0.mul(a10).add(t1.mul(a11)).add(t2.mul(a12)).add(t3.mul(a13)))
          p += 4
        }
        while (p < k) {
          val t = FloatVector.fromArray(SP, b, p * n + j)
          accA = accA.add(t.mul(a(aA + p)))
          accB = accB.add(t.mul(a(aB + p)))
          p += 1
        }
        accA.intoArray(out, oA + j)
        accB.intoArray(out, oB + j)
        j += L
      }
      // --- scalar tail columns
      while (j < n) {
        var sA = 0f; var sB = 0f
        var p = 0
        while (p < k4) {
          val b0 = p * n + j; val b1 = b0 + n; val b2 = b1 + n; val b3 = b2 + n
          val t0 = b(b0); val t1 = b(b1); val t2 = b(b2); val t3 = b(b3)
          sA += a(aA + p) * t0 + a(aA + p + 1) * t1 + a(aA + p + 2) * t2 + a(aA + p + 3) * t3
          sB += a(aB + p) * t0 + a(aB + p + 1) * t1 + a(aB + p + 2) * t2 + a(aB + p + 3) * t3
          p += 4
        }
        while (p < k) {
          val t = b(p * n + j)
          sA += a(aA + p) * t; sB += a(aB + p) * t
          p += 1
        }
        out(oA + j) = sA; out(oB + j) = sB
        j += 1
      }
      i += 2
    }
    // --- odd final row
    while (i < m) {
      val aOff = i * k
      val oOff = i * n
      var j = 0
      while (j < n1v) {
        var acc = FloatVector.zero(SP)
        var p = 0
        while (p < k4) {
          val a0 = a(aOff + p); val a1 = a(aOff + p + 1)
          val a2 = a(aOff + p + 2); val a3 = a(aOff + p + 3)
          val b0 = p * n + j; val b1 = b0 + n; val b2 = b1 + n; val b3 = b2 + n
          val t0 = FloatVector.fromArray(SP, b, b0)
          val t1 = FloatVector.fromArray(SP, b, b1)
          val t2 = FloatVector.fromArray(SP, b, b2)
          val t3 = FloatVector.fromArray(SP, b, b3)
          acc = acc.add(t0.mul(a0).add(t1.mul(a1)).add(t2.mul(a2)).add(t3.mul(a3)))
          p += 4
        }
        while (p < k) {
          acc = acc.add(FloatVector.fromArray(SP, b, p * n + j).mul(a(aOff + p)))
          p += 1
        }
        acc.intoArray(out, oOff + j)
        j += L
      }
      while (j < n) {
        var s = 0f
        var p = 0
        while (p < k4) {
          s += a(aOff + p) * b(p * n + j) + a(aOff + p + 1) * b((p + 1) * n + j) +
            a(aOff + p + 2) * b((p + 2) * n + j) + a(aOff + p + 3) * b((p + 3) * n + j)
          p += 4
        }
        while (p < k) { s += a(aOff + p) * b(p * n + j); p += 1 }
        out(oOff + j) = s
        j += 1
      }
      i += 1
    }
  }
}
