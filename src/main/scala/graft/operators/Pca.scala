package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA for embedding columns — the classic big-data shape: ONE distributed
  * pass builds the exact d×d covariance (sufficient statistics, map-side
  * partial aggregation), the d×d eigenproblem solves on the driver
  * (microseconds for d = 64), and the projection is a broadcast
  * matrix-multiply folded into codegen'd column expressions. No step
  * materializes anything larger than d² on the driver or shuffles more
  * than the 1-row wide aggregate — the 100 TB cost is exactly one scan
  * plus one scan to project.
  *
  * Exactness: embedding values snap to a 1e-6 grid as longs, so all
  * second-moment sums are DECIMAL(38,0)-exact and partition-invariant;
  * the covariance is ONE double division per cell. (Scaling the grid
  * rescales eigenvalues but leaves eigenvectors and explained-variance
  * ratios unchanged.) The eigendecomposition itself is float (breeze
  * eigSym on the driver) — its contracts are checked, not replayed.
  */
object Pca {

  /** One partition's exact Gram partials: row count, first moments,
    * upper-triangle second moments — all longs. */
  final case class GramPartial(n: Long, s: Array[Long], p: Array[Long])

  /** Exact upper-triangle covariance sufficient statistics:
    * one row per dim pair (i ≤ j): (i, j, n, s_i, s_j, s_ij, cov) with
    * cov = (n·Σxy − ΣxΣy) / (n·(n−1)) on the snapped grid.
    *
    * Shape: a per-partition Gram ACCUMULATION (the RowMatrix/treeAggregate
    * classic) rather than a d(d+1)/2-column wide aggregate — at d = 64
    * the wide form is 2 145 aggregate expressions, which costs tens of
    * seconds of optimizer/codegen time before a single row moves; the
    * imperative per-partition loop is the textbook justification for
    * dropping below the DataFrame API. Partials are exact longs (safe
    * for ≤ ~7·10⁷ rows/partition at |x|·scale ≤ 3.5·10⁵ — size
    * partitions accordingly), merged in BigInt so the global sums stay
    * exact at ANY row count. Integer adds in any order ⇒ partition-
    * invariant, oracle-replayable. */
  def covarianceStats(emb: DataFrame, embCol: String, dim: Int,
                      scale: Double = 1e6): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nPairs = dim * (dim + 1) / 2
    val partials = emb.select(col(embCol).cast("array<double>")).as[Seq[Double]]
      .mapPartitions { rows =>
        var n = 0L
        val s = new Array[Long](dim)
        val p = new Array[Long](nPairs)
        val f = new Array[Long](dim)
        rows.foreach { v =>
          var i = 0
          while (i < dim) {
            f(i) = math.floor(v(i) * scale + 0.5).toLong; s(i) += f(i); i += 1
          }
          n += 1
          var k = 0; i = 0
          while (i < dim) {
            var j = i
            while (j < dim) { p(k) += f(i) * f(j); k += 1; j += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single(GramPartial(n, s, p))
      }.collect()
    // BigInt merge: exact at any total row count
    val n = BigInt(partials.map(_.n).sum)
    val s = Array.tabulate(dim)(i => partials.map(g => BigInt(g.s(i))).sum)
    val p = Array.tabulate(nPairs)(k => partials.map(g => BigInt(g.p(k))).sum)
    val pairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    // Sums surface as BIGINT, never DECIMAL(38,0): any consumer that
    // bridges decimals through float64 (2⁵³ exact-integer range) reads a
    // different value than the exact decimal — the round-6 q124 hash
    // fail. The merge above stays BigInt so `cov` is exact regardless;
    // the bound is ASSERTED rather than papered over by a wider dtype
    // (micro-grid features ≤1e6 ⇒ s_ij ≤ rows·1e12, a long up to ~9e6
    // rows per column pair — far above any driver test scale).
    val out = pairs.zipWithIndex.map { case ((i, j), k) =>
      val cov =
        if (n < 2) 0.0
        else ((n * p(k) - s(i) * s(j)).toDouble / (n * (n - 1)).toDouble)
      require(n.isValidLong && s(i).isValidLong && s(j).isValidLong &&
        p(k).isValidLong,
        s"covarianceStats sums exceed BIGINT at pair ($i,$j) — " +
          "fold or rescale before surfacing")
      (i, j, n.toLong, s(i).toLong, s(j).toLong, p(k).toLong, cov)
    }
    spark.createDataFrame(out).toDF("i", "j", "n", "s_i", "s_j", "s_ij", "cov")
  }

  /** Top-k principal components of the snapped-grid covariance,
    * descending by eigenvalue: (components row-major k×dim,
    * eigenvalues desc, trace). Driver-side d×d work. */
  def fitComponents(emb: DataFrame, embCol: String, dim: Int, k: Int)
      : (Array[Array[Double]], Array[Double], Double) = {
    val stats = covarianceStats(emb, embCol, dim).collect()
    val m = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    stats.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(6))
      m(i, j) = c; m(j, i) = c
    }
    val es = breeze.linalg.eigSym(m)
    // breeze returns ascending eigenvalues; take the top k, descending
    val order = (0 until dim).sortBy(d => -es.eigenvalues(d)).take(k)
    val comps = order.map(d =>
      (0 until dim).map(r => es.eigenvectors(r, d)).toArray).toArray
    val evs = order.map(es.eigenvalues(_)).toArray
    (comps, evs, breeze.linalg.trace(m))
  }

  /** Project onto components: idCol plus pc0..pc{k-1}, each a codegen'd
    * Σ_d emb[d]·v[c][d] — the broadcast side is just k·dim literals. */
  def project(emb: DataFrame, idCol: String, embCol: String,
              comps: Array[Array[Double]]): DataFrame = {
    val dim = comps(0).length
    val cols = comps.zipWithIndex.map { case (v, c) =>
      (0 until dim).map(d => col(embCol)(d) * lit(v(d)))
        .reduce(_ + _).as(s"pc$c")
    }
    emb.select(col(idCol) +: cols.toIndexedSeq: _*)
  }

  /** Johnson-Lindenstrauss random projection — the DATA-INDEPENDENT
    * dimensionality reduction (vs PCA's fitted one): a seeded ±1 sign
    * matrix (Achlioptas, PODS'01) whose entries derive from the shared
    * md5 hash, so the "random" matrix is a pure function of (c, d) that
    * any engine regenerates. On the 1e-6 snapped grid the projection is
    * ALL-INTEGER arithmetic — exact, partition-invariant, oracle-
    * replayable — and needs no training pass at all: one map-side scan,
    * zero shuffles, zero driver state.
    *
    * @return (idCol, rp0..rp{dimOut-1}) — long components on the
    *         snapped grid (divide by `scale` for real units).
    */
  def jlProject(emb: DataFrame, idCol: String, embCol: String,
                dimIn: Int, dimOut: Int, scale: Double = 1e6): DataFrame = {
    val cols = (0 until dimOut).map { c =>
      (0 until dimIn).map { d =>
        val s = jlSign(c, d)
        floor(col(embCol)(d) * lit(scale) + lit(0.5)).cast("long") *
          lit(s.toLong)
      }.reduce(_ + _).as(s"rp$c")
    }
    emb.select(col(idCol) +: cols: _*)
  }

  /** ±1 from the engine-shared md5-based hash60 of "jl:c:d" — the same
    * value `cast('0x' || substr(md5(s),1,15) as bigint) % 2` yields in
    * SQL, so the oracle regenerates the identical matrix. */
  def jlSign(c: Int, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"jl:$c:$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** One-row digest for the full fit+project pipeline. Driver-checked:
    * component orthonormality and eigenvalue ordering; in-plan: row
    * preservation and Bessel's inequality (mean ‖proj‖² ≤ mean ‖x‖² —
    * an orthonormal projection can never gain energy), both over the
    * ACTUAL projected values. */
  def pcaDigest(emb: DataFrame, idCol: String, embCol: String,
                dim: Int, k: Int): DataFrame = {
    val (comps, evs, trace) = fitComponents(emb, embCol, dim, k)
    val orthonormal = (for { a <- 0 until k; b <- a until k } yield {
      val dot = (0 until dim).map(d => comps(a)(d) * comps(b)(d)).sum
      math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9
    }).forall(identity)
    val evDesc = evs.sliding(2).forall(w => w.length < 2 || w(0) >= w(1))
    // top-k eigenvalues each ≥ trace/dim ⇒ sum ≥ k/dim·trace is the
    // structural floor; an eigensolver bug breaks it loudly
    val varFloor = evs.sum >= (trace * k / dim) - 1e-6
    val proj = project(emb, idCol, embCol, comps)
    val pNorm = comps.indices.map(c => col(s"pc$c") * col(s"pc$c"))
      .reduce(_ + _)
    val xNorm = (0 until dim).map(d => col(embCol)(d) * col(embCol)(d))
      .reduce(_ + _)
    proj.join(emb.select(col(idCol), xNorm.as("__xn")), Seq(idCol))
      .agg(count(lit(1)).as("n_rows"),
        avg(pNorm).as("__pn"), avg(col("__xn")).as("__xn2"))
      .select(col("n_rows"), lit(dim).as("dim_in"), lit(k).as("dim_out"),
        lit(orthonormal).as("orthonormal_ok"),
        lit(evDesc && varFloor).as("eigen_ok"),
        (col("__pn") <= col("__xn2") + lit(1e-9)).as("bessel_ok"))
  }
}
