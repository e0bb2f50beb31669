package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dimensionality reduction (reference SURVEY.md §2.10 M5-M9;
  * src/mdataframe/projection.py:24-99).
  *
  * The reference transposes so SAMPLES are the instances and genes the
  * features (projection.py:43-50) — on Spark the genes axis is the 100 TB
  * dimension, so the PCA is computed from the SAMPLES×SAMPLES centered
  * Gram matrix, which needs exactly ONE distributed aggregation pass over
  * the genes (features are centered per gene, and G = XcᵀXc has S² small
  * entries). The eigendecomposition of the S×S Gram happens on the driver
  * (Breeze); scores = U·√Λ. No gene-dimension collect, no shuffle beyond
  * the single agg.
  *
  * Output mirrors the reference: one row per sample, coordinate columns
  * labeled `"PC1 (expl.var = 12.3%)"` (projection.py:63-67).
  */
final case class PcaOp(
    name: String = "PCA",
    nComponents: Int = 2,
    protect: Seq[String] = Seq("gene_stable_id")) extends Transformer {

  @transient var explainedVarianceRatio: Array[Double] = Array.empty

  def apply(df: DataFrame): DataFrame = {
    import breeze.linalg.{DenseMatrix, eigSym}
    val samples = graft.operators.Transforms.numericValueColumns(df, protect)
    val s = samples.size
    require(s > nComponents, s"need more than $nComponents sample columns, got $s")
    // one pass: per-gene row mean, then sums of centered cross-products
    val rowMean = samples.map(c => col(c).cast("double")).reduce(_ + _) / s
    val centered = samples.map(c => (col(c).cast("double") - rowMean))
    val aggs = for (i <- 0 until s; j <- i until s)
      yield sum(centered(i) * centered(j)).as(s"g_${i}_$j")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val g = DenseMatrix.zeros[Double](s, s)
    var idx = 0
    for (i <- 0 until s; j <- i until s) {
      val v = row.getDouble(idx); g(i, j) = v; g(j, i) = v; idx += 1
    }
    val eig = eigSym(g)
    // descending eigenvalues
    val order = (0 until s).sortBy(i => -eig.eigenvalues(i))
    val total = eig.eigenvalues.toArray.map(math.max(_, 0.0)).sum
    explainedVarianceRatio = order.take(nComponents)
      .map(i => math.max(eig.eigenvalues(i), 0.0) / math.max(total, 1e-300)).toArray
    val cols = (0 until nComponents).map { c =>
      f"PC${c + 1} (expl.var = ${100 * explainedVarianceRatio(c)}%1.1f%%)"
    }
    val schema = StructType(
      StructField("sample", StringType) +:
        cols.map(c => StructField(c, DoubleType)))
    val rows = (0 until s).map { si =>
      val coords = (0 until nComponents).map { c =>
        val ev = eig.eigenvalues(order(c))
        eig.eigenvectors(si, order(c)) * math.sqrt(math.max(ev, 0.0))
      }
      Row.fromSeq(samples(si) +: coords)
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), schema)
  }
}

/** M6 t-SNE: the samples axis is small by the data model, so the exact
  * algorithm runs on the driver over the samples×samples distances (which
  * come from the same one-pass Gram trick as PCA: d²(i,j) = G_ii + G_jj −
  * 2·G_ij on UNcentered products). Deterministic seeded init. */
final case class TsneOp(
    name: String = "TSNE",
    nComponents: Int = 2,
    perplexity: Double = 30,
    iterations: Int = 400,
    seed: Long = 42L,
    protect: Seq[String] = Seq("gene_stable_id")) extends Transformer {

  def apply(df: DataFrame): DataFrame = {
    val samples = graft.operators.Transforms.numericValueColumns(df, protect)
    val s = samples.size
    require(s > nComponents, "need more sample columns than components")
    // uncentered Gram in one pass → pairwise squared distances
    val xs = samples.map(c => col(c).cast("double"))
    val aggs = for (i <- 0 until s; j <- i until s) yield sum(xs(i) * xs(j)).as(s"g_${i}_$j")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val g = Array.ofDim[Double](s, s)
    var idx = 0
    for (i <- 0 until s; j <- i until s) { g(i)(j) = row.getDouble(idx); g(j)(i) = g(i)(j); idx += 1 }
    val d2 = Array.tabulate(s, s)((i, j) => math.max(g(i)(i) + g(j)(j) - 2 * g(i)(j), 0.0))
    // P matrix via per-row perplexity binary search
    val p = Array.ofDim[Double](s, s)
    val target = math.log(math.min(perplexity, (s - 1).toDouble))
    for (i <- 0 until s) {
      var lo = 1e-20; var hi = 1e20; var beta = 1.0
      var it = 0
      while (it < 60) {
        var sum = 0.0; var ent = 0.0
        for (j <- 0 until s if j != i) {
          val e = math.exp(-d2(i)(j) * beta); sum += e; ent += d2(i)(j) * beta * e
        }
        val h = if (sum > 0) math.log(sum) + ent / sum else 0.0
        if (h > target) { lo = beta; beta = if (hi >= 1e20) beta * 2 else (beta + hi) / 2 }
        else { hi = beta; beta = (beta + lo) / 2 }
        it += 1
      }
      var sum = 0.0
      for (j <- 0 until s if j != i) { p(i)(j) = math.exp(-d2(i)(j) * beta); sum += p(i)(j) }
      for (j <- 0 until s if j != i) p(i)(j) = math.max(p(i)(j) / math.max(sum, 1e-300), 1e-12)
    }
    val pSym = Array.tabulate(s, s)((i, j) => (p(i)(j) + p(j)(i)) / (2.0 * s))
    // gradient descent on the t-SNE objective
    val rng = new java.util.Random(seed)
    val y = Array.fill(s, nComponents)(rng.nextGaussian() * 1e-4)
    val lr = 100.0
    for (_ <- 0 until iterations) {
      val num = Array.ofDim[Double](s, s)
      var z = 0.0
      for (i <- 0 until s; j <- 0 until s if i != j) {
        var dd = 0.0
        for (c <- 0 until nComponents) { val d = y(i)(c) - y(j)(c); dd += d * d }
        num(i)(j) = 1.0 / (1.0 + dd); z += num(i)(j)
      }
      for (i <- 0 until s) {
        val grad = new Array[Double](nComponents)
        for (j <- 0 until s if j != i) {
          val q = math.max(num(i)(j) / z, 1e-12)
          val m = 4.0 * (pSym(i)(j) - q) * num(i)(j)
          for (c <- 0 until nComponents) grad(c) += m * (y(i)(c) - y(j)(c))
        }
        for (c <- 0 until nComponents) y(i)(c) -= lr * grad(c)
      }
    }
    val schema = StructType(StructField("sample", StringType) +:
      (0 until nComponents).map(c => StructField(s"$name dim ${c + 1}", DoubleType)))
    val rows = (0 until s).map(i => Row.fromSeq(samples(i) +: y(i).toSeq))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), schema)
  }
}

object Projection {
  /** M8 `MDF.reduce` guard semantics (mdataframe.py:841-923): reduction
    * only applies when there are more feature columns than target dims;
    * meta on the reduced axis is reset. */
  def reduce(df: DataFrame, op: Transformer with Product, dims: Int,
      protect: Seq[String] = Seq("gene_stable_id")): DataFrame = {
    val features = graft.operators.Transforms.numericValueColumns(df, protect)
    require(features.size > dims,
      s"reduce needs more than $dims feature columns, got ${features.size}")
    op.asInstanceOf[Transformer](df)
  }

  /** M7 UMAP is broken in the reference itself (projection.py:12 import
    * commented out); declared-but-unsupported here as well. */
  def umap(): Nothing =
    throw new UnsupportedOperationException(
      "UMAP is non-functional in the reference (projection.py:12) and not provided")

  /** Rademacher random projection — Achlioptas (2001)'s
    * "database-friendly" Johnson–Lindenstrauss transform: project each
    * `dim`-vector onto `outDim` rows of ±1 signs (no Gaussians, no
    * transcendentals), scaled by 1/√outDim so expected squared norms
    * are preserved. The cheap front-end before ANN indexing / near-dup
    * at 100 TB: a 64→16 projection cuts every downstream shuffle and
    * distance kernel 4×, with JL-bounded distortion.
    *
    * The sign matrix derives DRIVER-SIDE from the same md5 walk the
    * DuckDB oracle replays (s(i,j) = ±1 by bit 0 of h60("seed:i:j")),
    * then ships into the plan as array literals — the executors never
    * hash; per row the work is outDim ordered zip_with/aggregate folds,
    * entirely map-side (no shuffle, no UDF). Output: (idCol, proj
    * array<float>) — the float cast is the cross-engine canonicalizer,
    * same as the cosine gates. */
  def rademacherProject(df: DataFrame, vecCol: String, idCol: String,
      dim: Int, outDim: Int, seed: Long = 1L,
      scale: Boolean = true): DataFrame = {
    require(outDim >= 1 && outDim < dim,
      s"rademacherProject: outDim=$outDim must be in [1, dim=$dim)")
    def sign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed:$i:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ((java.lang.Long.parseLong(hex.take(15), 16) & 1L) == 1L) 1.0 else -1.0
    }
    val c = if (scale) 1.0 / math.sqrt(outDim.toDouble) else 1.0
    val v = col(vecCol).cast("array<double>")
    val comps = (0 until outDim).map { j =>
      val signs = array((0 until dim).map(i => lit(sign(i, j))): _*)
      (aggregate(zip_with(v, signs, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) * lit(c)).cast("float")
    }
    df.select(col(idCol), array(comps: _*).as("proj"))
  }
}
