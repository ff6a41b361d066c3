package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tall-skinny PCA over an embedding column — the dimensionality-
  * reduction / whitening step before ANN indexing or SemDeDup-style
  * audits (classic two-phase scheme, e.g. Halko et al. 2011 §4 for the
  * tall-skinny regime): the DATA-SCALE phase reduces N×d rows to a d×d
  * moment matrix in one pass; the eigensolve on that d×d matrix is
  * driver-side metadata work (d is 64–1024 while N is billions — the
  * matrix is a few KB).
  *
  * The moment phase is EXACT and order-free: each float is cast to
  * DECIMAL(18,9) once (deterministic), products are DECIMAL(37,18)
  * (exact — no precision loss at these operand scales), and decimal
  * sums are associative, so the result is bit-identical under any
  * partitioning or AQE re-plan — and identical to a SQL oracle's
  * derivation. Compare the naive distributed spelling (explode to
  * (vec, i, x) then self-join on vec): that shuffles N·d rows twice
  * and pays an N·d² join. Here each row emits its d(d+1)/2 products
  * into ONE posexplode + partial-aggregated groupBy — the only shuffle
  * is the ~2·d²/2-row partial-aggregate merge, independent of N.
  */
object Pca {

  /** Output row order: first-order sums (i, j = -1, Σ x_i), then upper-
    * triangle second moments (i, j >= i, Σ x_i·x_j).
    */
  def momentIndex(d: Int): Seq[(Int, Int)] =
    (0 until d).map(i => (i, -1)) ++
      (for { i <- 0 until d; j <- i until d } yield (i, j))

  /** Exact decimal moment rows (i, j, s) for `vecCol: Array[Float]` of
    * fixed length `d`; j = -1 rows carry Σ x_i, j >= i rows Σ x_i·x_j.
    */
  def moments(vecs: DataFrame, vecCol: String, d: Int): DataFrame = {
    require(d > 0 && d <= 1024, s"d=$d out of the tall-skinny regime")
    val spark = vecs.sparkSession
    import spark.implicits._
    val xd = transform(col(vecCol), x => x.cast(DecimalType(18, 9)))
    def at(i: Int): Column = element_at(col("__xd"), i + 1)
    val terms: Seq[Column] = momentIndex(d).map {
      case (i, -1) => at(i).cast(DecimalType(37, 18))
      case (i, j)  => at(i) * at(j)
    }
    val idx = momentIndex(d).zipWithIndex
      .map { case ((i, j), pos) => (pos, i, j) }.toDF("pos", "i", "j")
    vecs.select(xd.as("__xd"))
      .select(posexplode(array(terms: _*)))
      .groupBy($"pos")
      .agg(sum($"col").as("s"))
      .join(broadcast(idx), "pos")
      .select($"i", $"j", $"s".cast(DecimalType(38, 18)).as("s"))
  }

  /** Driver-side eigensolve of the COVARIANCE matrix assembled from
    * [[moments]] rows and the row count `n`: cyclic Jacobi on the d×d
    * symmetric matrix (Golub & Van Loan §8.5). Returns eigenvalues in
    * descending order paired with their (unit) eigenvectors. The
    * metadata-scale step by design — never ship N rows to the driver,
    * ship the d×d summary.
    */
  def eigen(
      moments: Seq[(Int, Int, java.math.BigDecimal)],
      n: Long, d: Int): Array[(Double, Array[Double])] = {
    require(n > 1, "need at least two rows for a covariance")
    val s1 = Array.ofDim[Double](d)
    val s2 = Array.ofDim[Double](d, d)
    moments.foreach {
      case (i, -1, s) => s1(i) = s.doubleValue()
      case (i, j, s)  => s2(i)(j) = s.doubleValue(); s2(j)(i) = s.doubleValue()
    }
    val a = Array.tabulate(d, d)((i, j) =>
      (s2(i)(j) - s1(i) * s1(j) / n) / (n - 1))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a, d)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) rotate(a, v, p, q, d)
          q += 1
        }
        p += 1
      }
      off = offDiag(a, d)
      sweep += 1
    }
    (0 until d).map(i => (a(i)(i), (0 until d).map(v(_)(i)).toArray))
      .sortBy(-_._1).toArray
  }

  private def offDiag(a: Array[Array[Double]], d: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
    s
  }

  /** One Jacobi rotation zeroing a(p)(q), accumulating into v. */
  private def rotate(
      a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int, d: Int): Unit = {
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
    val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
      case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0)) // theta == 0
      case x   => x
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var k = 0
    while (k < d) {
      val akp = a(k)(p); val akq = a(k)(q)
      a(k)(p) = c * akp - s * akq
      a(k)(q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < d) {
      val apk = a(p)(k); val aqk = a(q)(k)
      a(p)(k) = c * apk - s * aqk
      a(q)(k) = s * apk + c * aqk
      val vkp = v(k)(p); val vkq = v(k)(q)
      v(k)(p) = c * vkp - s * vkq
      v(k)(q) = s * vkp + c * vkq
      k += 1
    }
  }
}
