package graft.functions

/** Dense symmetric eigensolve for DRIVER-side use on dims²-sized
  * moment matrices (never on anything corpus-sized). The split is the
  * Spark-canonical one — MLlib's `RowMatrix.computePrincipalComponents`
  * does exactly this: the Gram/covariance matrix of a d-dim corpus is
  * d×d regardless of row count, so the O(d³) eigensolve is local
  * arithmetic while every corpus-sized pass stays distributed.
  *
  * Algorithm: classical cyclic Jacobi (Golub & Van Loan §8.5) — slower
  * than QR for big d but simple, unconditionally stable on symmetric
  * input, and fully deterministic (fixed sweep order, fixed rotation
  * formulas, fixed convergence threshold), which is what replay-stable
  * query results need. */
object Eigen {

  /** Eigen-decomposition of symmetric `a0` (not mutated). Returns
    * (values, vectors) with `vectors(c)` the eigenvector of
    * `values(c)`; pairs sorted by eigenvalue descending (index
    * tie-break keeps the order deterministic on exact ties), and each
    * vector sign-canonicalized: its largest-|entry| coordinate (first
    * such index on ties) is non-negative. */
  def symmetric(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    require(n > 0 && a0.forall(_.length == n), "square matrix required")
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offNorm2: Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var frob2 = offNorm2 * 2.0
    var di = 0
    while (di < n) { frob2 += a(di)(di) * a(di)(di); di += 1 }
    // fixed relative threshold: rotations stop once the off-diagonal
    // mass is negligible against the matrix itself
    val stop = 1e-26 * math.max(frob2, Double.MinPositiveValue)

    var sweep = 0
    while (offNorm2 > stop && sweep < 64) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            // tan of the annihilating rotation, smaller-root form
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val tau = s / (1.0 + c)
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var k = 0
            while (k < n) {
              if (k != p && k != q) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = akp - s * (akq + tau * akp)
                a(p)(k) = a(k)(p)
                a(k)(q) = akq + s * (akp - tau * akq)
                a(q)(k) = a(k)(q)
              }
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = vkp - s * (vkq + tau * vkp)
              v(k)(q) = vkq + s * (vkp - tau * vkq)
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    val order = (0 until n).sortBy(i => (-a(i)(i), i)).toArray
    val vals = order.map(i => a(i)(i))
    val vecs = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      // canonical sign: first largest-|entry| coordinate non-negative
      var best = 0
      var k = 1
      while (k < n) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) { k = 0; while (k < n) { col(k) = -col(k); k += 1 } }
      col
    }
    (vals, vecs)
  }
}
