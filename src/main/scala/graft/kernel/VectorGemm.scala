package graft.kernel

import jdk.incubator.vector.{FloatVector, VectorSpecies}

/** SIMD twin of the scalar dense GEMM (Kernels.gemmDenseScalar), built on
  * the JDK Vector API (AVX-512 on this box: 16 f32 lanes).
  *
  * BIT-EXACT CONTRACT: per-output-element arithmetic — operation order and
  * per-op rounding — is IDENTICAL to the scalar path. Lanes are independent
  * output columns; every element accumulates its k terms in ascending-k
  * order as FUSED multiply-adds (one rounding per term):
  *   acc_p = fma(a[i,p], b[p,j], acc_{p-1}),  acc_{-1} = 0.
  * The scalar twin uses java.lang.Math.fma, which C2 intrinsifies to the
  * same vfmadd instruction, so the two paths agree bit-for-bit (KernelSpec
  * asserts it on all tail shapes). The dense path serves only dense
  * trained/production weights, where the reference's own numpy matmul
  * delegates to BLAS with an implementation-defined accumulation order —
  * FMA is as faithful as any; the rigged sparse packs (the oracle-checked
  * toy path) keep Kernels.gemm's sequential mul-then-add kernel.
  *
  * Layout matches exec/model.py:97-108's im2col GEMM: a[m,k] row-major
  * (im2col columns), b[k,n] row-major (pre-transposed weight), out[m,n].
  *
  * Register blocking: 4 output rows x 4 vectors (4x64 floats at AVX-512)
  * held in registers across the whole k loop — out is written once per
  * tile, each loaded b vector feeds four rows, and the 16 independent
  * accumulator chains cover the FMA latency-bandwidth product.
  */
private[graft] object VectorGemm {
  private val SP: VectorSpecies[java.lang.Float] = FloatVector.SPECIES_PREFERRED
  private val L = SP.length()

  /** Used by Kernels to decide dispatch once at class-load. */
  def lanes: Int = L

  def gemmDense(a: Array[Float], m: Int, k: Int, b: Array[Float], n: Int,
                out: Array[Float]): Unit = {
    val n4v = n - n % (4 * L) // columns covered by 4-vector tiles
    val n1v = n - n % L       // columns covered by single-vector tiles
    var i = 0
    // --- 4 rows x 4 vectors register tile
    while (i + 4 <= m) {
      val aA = i * k; val aB = aA + k; val aC = aB + k; val aD = aC + k
      val oA = i * n; val oB = oA + n; val oC = oB + n; val oD = oC + n
      var j = 0
      while (j < n4v) {
        var acc00 = FloatVector.zero(SP); var acc01 = FloatVector.zero(SP)
        var acc02 = FloatVector.zero(SP); var acc03 = FloatVector.zero(SP)
        var acc10 = FloatVector.zero(SP); var acc11 = FloatVector.zero(SP)
        var acc12 = FloatVector.zero(SP); var acc13 = FloatVector.zero(SP)
        var acc20 = FloatVector.zero(SP); var acc21 = FloatVector.zero(SP)
        var acc22 = FloatVector.zero(SP); var acc23 = FloatVector.zero(SP)
        var acc30 = FloatVector.zero(SP); var acc31 = FloatVector.zero(SP)
        var acc32 = FloatVector.zero(SP); var acc33 = FloatVector.zero(SP)
        var p = 0
        while (p < k) {
          val vA = FloatVector.broadcast(SP, a(aA + p))
          val vB = FloatVector.broadcast(SP, a(aB + p))
          val vC = FloatVector.broadcast(SP, a(aC + p))
          val vD = FloatVector.broadcast(SP, a(aD + p))
          val b0 = p * n + j
          val t0 = FloatVector.fromArray(SP, b, b0)
          val t1 = FloatVector.fromArray(SP, b, b0 + L)
          val t2 = FloatVector.fromArray(SP, b, b0 + 2 * L)
          val t3 = FloatVector.fromArray(SP, b, b0 + 3 * L)
          acc00 = t0.fma(vA, acc00); acc01 = t1.fma(vA, acc01)
          acc02 = t2.fma(vA, acc02); acc03 = t3.fma(vA, acc03)
          acc10 = t0.fma(vB, acc10); acc11 = t1.fma(vB, acc11)
          acc12 = t2.fma(vB, acc12); acc13 = t3.fma(vB, acc13)
          acc20 = t0.fma(vC, acc20); acc21 = t1.fma(vC, acc21)
          acc22 = t2.fma(vC, acc22); acc23 = t3.fma(vC, acc23)
          acc30 = t0.fma(vD, acc30); acc31 = t1.fma(vD, acc31)
          acc32 = t2.fma(vD, acc32); acc33 = t3.fma(vD, acc33)
          p += 1
        }
        acc00.intoArray(out, oA + j); acc01.intoArray(out, oA + j + L)
        acc02.intoArray(out, oA + j + 2 * L); acc03.intoArray(out, oA + j + 3 * L)
        acc10.intoArray(out, oB + j); acc11.intoArray(out, oB + j + L)
        acc12.intoArray(out, oB + j + 2 * L); acc13.intoArray(out, oB + j + 3 * L)
        acc20.intoArray(out, oC + j); acc21.intoArray(out, oC + j + L)
        acc22.intoArray(out, oC + j + 2 * L); acc23.intoArray(out, oC + j + 3 * L)
        acc30.intoArray(out, oD + j); acc31.intoArray(out, oD + j + L)
        acc32.intoArray(out, oD + j + 2 * L); acc33.intoArray(out, oD + j + 3 * L)
        j += 4 * L
      }
      while (j < n1v) {
        var accA = FloatVector.zero(SP); var accB = FloatVector.zero(SP)
        var accC = FloatVector.zero(SP); var accD = FloatVector.zero(SP)
        var p = 0
        while (p < k) {
          val t = FloatVector.fromArray(SP, b, p * n + j)
          accA = t.fma(FloatVector.broadcast(SP, a(aA + p)), accA)
          accB = t.fma(FloatVector.broadcast(SP, a(aB + p)), accB)
          accC = t.fma(FloatVector.broadcast(SP, a(aC + p)), accC)
          accD = t.fma(FloatVector.broadcast(SP, a(aD + p)), accD)
          p += 1
        }
        accA.intoArray(out, oA + j); accB.intoArray(out, oB + j)
        accC.intoArray(out, oC + j); accD.intoArray(out, oD + j)
        j += L
      }
      while (j < n) {
        var sA = 0f; var sB = 0f; var sC = 0f; var sD = 0f
        var p = 0
        while (p < k) {
          val t = b(p * n + j)
          sA = Math.fma(a(aA + p), t, sA); sB = Math.fma(a(aB + p), t, sB)
          sC = Math.fma(a(aC + p), t, sC); sD = Math.fma(a(aD + p), t, sD)
          p += 1
        }
        out(oA + j) = sA; out(oB + j) = sB
        out(oC + j) = sC; out(oD + j) = sD
        j += 1
      }
      i += 4
    }
    // --- remainder rows, one at a time (same per-element order)
    while (i < m) {
      val aOff = i * k
      val oOff = i * n
      var j = 0
      while (j < n4v) {
        var acc0 = FloatVector.zero(SP); var acc1 = FloatVector.zero(SP)
        var acc2 = FloatVector.zero(SP); var acc3 = FloatVector.zero(SP)
        var p = 0
        while (p < k) {
          val v = FloatVector.broadcast(SP, a(aOff + p))
          val b0 = p * n + j
          acc0 = FloatVector.fromArray(SP, b, b0).fma(v, acc0)
          acc1 = FloatVector.fromArray(SP, b, b0 + L).fma(v, acc1)
          acc2 = FloatVector.fromArray(SP, b, b0 + 2 * L).fma(v, acc2)
          acc3 = FloatVector.fromArray(SP, b, b0 + 3 * L).fma(v, acc3)
          p += 1
        }
        acc0.intoArray(out, oOff + j); acc1.intoArray(out, oOff + j + L)
        acc2.intoArray(out, oOff + j + 2 * L); acc3.intoArray(out, oOff + j + 3 * L)
        j += 4 * L
      }
      while (j < n1v) {
        var acc = FloatVector.zero(SP)
        var p = 0
        while (p < k) {
          acc = FloatVector.fromArray(SP, b, p * n + j)
            .fma(FloatVector.broadcast(SP, a(aOff + p)), acc)
          p += 1
        }
        acc.intoArray(out, oOff + j)
        j += L
      }
      while (j < n) {
        var s = 0f
        var p = 0
        while (p < k) { s = Math.fma(a(aOff + p), b(p * n + j), s); p += 1 }
        out(oOff + j) = s
        j += 1
      }
      i += 1
    }
  }
}
