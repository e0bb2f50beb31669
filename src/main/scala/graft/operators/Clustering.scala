package graft.operators

import graft.core.{MFrame, Transformer}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.clustering.{BisectingKMeans, KMeans => MlKMeans, KMeansModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustering operators (reference SURVEY.md §2.10 M1-M4;
  * src/mdataframe/clustering.py:9-60, strategies.py:99-486).
  *
  * Contract mirrored from the reference `Cluster` transformers: a label
  * column named after the operator is appended; `sort` orders rows by
  * label (`ascending`), `add=false` removes the column again
  * (clustering.py:31-44; tests/test_clustering.py:20-46).
  */
sealed abstract class ClusterOp extends Transformer {
  def columnName: Option[String]
  def sort: Boolean
  def ascending: Boolean
  def add: Boolean
  def protect: Seq[String]

  final def newColumn: String = columnName.getOrElse(name)

  protected def assignLabels(df: DataFrame, features: Seq[String]): DataFrame

  def apply(df: DataFrame): DataFrame = {
    val features = graft.operators.Transforms.numericValueColumns(df, protect)
    require(features.nonEmpty, "clustering needs numeric feature columns")
    // no .cache() here: Spark ML's iterative fits persist their training
    // input internally for the duration of the fit, and a cache we never
    // unpersist would accumulate across operator invocations in a
    // long-lived session (the upstream plan executes once for the fit and
    // once more at the caller's action — bounded, unlike the leak)
    val labeled = assignLabels(df, features)
    val sorted =
      if (sort) labeled.orderBy(if (ascending) col(newColumn).asc else col(newColumn).desc)
      else labeled
    if (add) sorted else sorted.drop(newColumn)
  }
}

/** M1: KMeans via Spark ML (codegen'd assembler + distributed Lloyd).
  * Default name "KNN" follows the reference (clustering.py:55-56). */
final case class KMeansOp(
    name: String = "KNN",
    nClusters: Int = 8,
    columnName: Option[String] = None,
    sort: Boolean = true,
    ascending: Boolean = true,
    add: Boolean = true,
    seed: Long = 42L,
    // sklearn KMeans surface mirrored by the reference's NewKMeans
    // (strategies.py:136-185): max_iter / tol with sklearn defaults —
    // Lloyd converges by tol long before 300 on real matrices
    maxIter: Int = 300,
    tol: Double = 1e-4,
    protect: Seq[String] = Seq("gene_stable_id")) extends ClusterOp {

  @transient var lastModel: Option[KMeansModel] = None

  protected def assignLabels(df: DataFrame, features: Seq[String]): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .transform(df)
    val model = new MlKMeans().setK(nClusters).setSeed(seed)
      .setMaxIter(maxIter).setTol(tol)
      .setFeaturesCol("__features").setPredictionCol(newColumn)
      .fit(assembled)
    lastModel = Some(model)
    model.transform(assembled).drop("__features")
  }

  /** M3 `predict`: apply the trained model to new data
    * (strategies.py:126-133 — caller pre-applies impute+scale). */
  def predict(df: DataFrame): DataFrame = {
    val model = lastModel.getOrElse(throw new IllegalStateException("fit first"))
    val features = graft.operators.Transforms.numericValueColumns(df, protect)
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features").transform(df)
    model.transform(assembled).drop("__features")
  }

  /** Reference-shaped predict (strategies.py:126-133): impute, drop rows
    * whose row-max is not positive (F3 guard, strategies.py:131), scale,
    * then apply the trained model. */
  def predict(df: DataFrame, imputer: graft.core.Transformer,
      scaler: graft.core.Transformer): DataFrame = {
    val imputed = imputer(df)
    val features = graft.operators.Transforms.numericValueColumns(imputed, protect)
    val guarded = imputed.filter(
      org.apache.spark.sql.functions.greatest(features.map(col): _*) > 0)
    predict(scaler(guarded))
  }
}

/** M2: agglomerative clustering. Spark ML has no hierarchical clustering;
  * dual path per SURVEY.md §7.3: exact Ward agglomeration on the driver
  * for small inputs (≤ `maxExactRows`, matching sklearn semantics), and
  * BisectingKMeans — the scalable divisive analog — beyond that
  * (documented semantic substitute).
  *
  * Memory note on `maxExactRows`: the exact path's driver footprint is
  * LINKAGE-dependent. Ward runs centroid-based (O(n·dim) beyond the
  * points), but single/complete/average maintain the full n×n distance
  * matrix — 8·n² bytes, ~800 MB at the default 10k cap — so a non-ward
  * fit near the cap needs a driver heap comfortably above 1 GB. The
  * exact path checks available headroom up front and fails with an
  * actionable message rather than OOM-ing mid-fit. */
final case class AggloOp(
    name: String = "Agglo",
    nClusters: Int = 2,
    columnName: Option[String] = None,
    sort: Boolean = true,
    ascending: Boolean = true,
    add: Boolean = true,
    maxExactRows: Int = 10000,
    seed: Long = 42L,
    linkage: String = "ward",
    protect: Seq[String] = Seq("gene_stable_id")) extends ClusterOp {

  require(Seq("ward", "single", "complete", "average").contains(linkage),
    s"Unknown linkage type $linkage. Allowed: ward, single, complete, average.")

  /** scipy-convention linkage matrix from the last exact-path fit: rows
    * (id_a, id_b, dist, size) where singleton clusters are 0..n-1, the
    * k-th merge creates cluster n+k, and dist is the linkage height in
    * Euclidean units (ward: √(2·sᵢsⱼ/(sᵢ+sⱼ)·‖cᵢ−cⱼ‖²), singletons merge
    * at their plain Euclidean distance; single/complete/average: the
    * min/max/mean inter-point distance). Mirrors the reference's exposed
    * `ScipyAgglomerative` linkage + method param (strategies.py:450-486,
    * SKlearnAgglomerative linkage=, strategies.py:284-311). None before a
    * fit or when the BisectingKMeans scale path ran. */
  @transient var lastLinkage: Option[Array[Array[Double]]] = None

  /** Last linkage as a small DataFrame (n−1 rows — driver-scale by
    * construction, the dendrogram is what a user plots next). */
  def linkageFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rows = lastLinkage.getOrElse(
      throw new IllegalStateException("fit the exact path first")).toSeq
    import spark.implicits._
    rows.map(r => (r(0), r(1), r(2), r(3))).toDF("id_a", "id_b", "dist", "size")
  }

  protected def assignLabels(df0: DataFrame, features: Seq[String]): DataFrame = {
    // the path-selection count and the fit both read the input: cache it
    // (unless the caller already did) so an expensive upstream plan is
    // scanned once, not twice — same fix as Tmm.apply
    val df = graft.core.CacheScope.retainInput(df0)
    val n = df.count()
    if (n <= maxExactRows) exactLinkage(df, features)
    else {
      // scale fallback regardless of linkage method: divisive bisecting
      // k-means approximates the Ward-style variance objective; exact
      // single/complete/average beyond the cap would need the full
      // distance matrix, which is exactly what cannot exist at scale
      lastLinkage = None
      val assembled = new VectorAssembler()
        .setInputCols(features.toArray).setOutputCol("__features").transform(df)
      new BisectingKMeans().setK(nClusters).setSeed(seed)
        .setFeaturesCol("__features").setPredictionCol(newColumn)
        .fit(assembled).transform(assembled).drop("__features")
    }
  }

  /** Exact agglomeration by nearest-neighbor chain: O(n²·dim) total
    * (each chain step scans active clusters once; ≤ 3(n−1) steps), versus
    * the O(n³) rescan-all-pairs loop this replaced — at the 10k-row cap
    * that is ~10⁸ operations instead of ~3×10¹¹. Every supported linkage
    * (ward / single / complete / average) satisfies Lance-Williams
    * reducibility, so reciprocal nearest neighbors found chain-wise merge
    * in an order that yields the SAME dendrogram as greedy global-minimum
    * merging (ties broken deterministically: ascending cluster id, chain
    * predecessor preferred on equality). Ward runs centroid-based (O(n)
    * memory beyond the points); the other linkages maintain the full
    * inter-cluster distance matrix under Lance-Williams updates (n²
    * doubles — 800 MB at the 10k cap, driver-transient). Labels numbered
    * by first-seen row order like sklearn. */
  /** Centroid-based Ward NN-chain: merges carry the Ward objective
    * 2·sᵢsⱼ/(sᵢ+sⱼ)·‖cᵢ−cⱼ‖² (squared units; √ applied at output).
    * Returns (mergeA, mergeB, mergeW, sizeByGeneration) with cluster ids
    * in GENERATION numbering: singletons 0..n-1, m-th merge = n+m. */
  private def chainWard(rows: Array[Array[Double]])
      : (Array[Int], Array[Int], Array[Double], Array[Double]) = {
    val n = rows.length
    val total = 2 * n - 1
    val size = new Array[Double](total)
    java.util.Arrays.fill(size, 0, n, 1.0)
    val centroid = new Array[Array[Double]](total)
    var i0 = 0
    while (i0 < n) { centroid(i0) = rows(i0).clone(); i0 += 1 }
    val alive = new Array[Boolean](total)
    java.util.Arrays.fill(alive, 0, n, true)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def ward(i: Int, j: Int): Double =
      (2.0 * size(i) * size(j) / (size(i) + size(j))) * d2(centroid(i), centroid(j))
    // generation-order merges; the chain stack holds cluster ids whose
    // nearest neighbor is the next element
    val mergeA = new Array[Int](math.max(n - 1, 0))
    val mergeB = new Array[Int](math.max(n - 1, 0))
    val mergeW = new Array[Double](math.max(n - 1, 0))
    val chain = new Array[Int](total)
    var top = -1
    var m = 0
    while (m < n - 1) {
      if (top < 0) {
        var s0 = 0
        while (!alive(s0)) s0 += 1
        chain(0) = s0; top = 0
      }
      var merged = false
      while (!merged) {
        val x = chain(top)
        val prev = if (top > 0) chain(top - 1) else -1
        // nearest alive neighbor of x; the chain predecessor wins ties so
        // reciprocal pairs are always detected (standard NN-chain rule)
        var best = if (prev >= 0) ward(x, prev) else Double.MaxValue
        var bi = prev
        var c = 0
        while (c < total) {
          if (alive(c) && c != x && c != prev) {
            val w = ward(x, c)
            if (w < best) { best = w; bi = c }
          }
          c += 1
        }
        if (bi == prev && prev >= 0) {
          // reciprocal nearest neighbors: merge into generation id n+m
          val a = math.min(prev, x); val b = math.max(prev, x)
          mergeA(m) = a; mergeB(m) = b; mergeW(m) = best
          val g = n + m
          val tot = size(a) + size(b)
          val cg = new Array[Double](centroid(a).length)
          var k = 0
          while (k < cg.length) {
            cg(k) = (centroid(a)(k) * size(a) + centroid(b)(k) * size(b)) / tot
            k += 1
          }
          centroid(g) = cg; size(g) = tot
          alive(a) = false; alive(b) = false; alive(g) = true
          top -= 2 // rest of the chain stays valid under reducibility
          m += 1
          merged = true
        } else {
          top += 1; chain(top) = bi
        }
      }
    }
    (mergeA, mergeB, mergeW, size)
  }

  /** Distance-matrix NN-chain for single/complete/average linkage:
    * clusters live in SLOTS 0..n-1 (a merge reuses its smaller slot and
    * frees the larger), Euclidean inter-cluster distances update by
    * Lance-Williams (single: min, complete: max, average: size-weighted
    * mean). Same return contract as [[chainWard]] — merge records carry
    * GENERATION ids via the slot→generation map. */
  private def chainMatrix(rows: Array[Array[Double]], method: String)
      : (Array[Int], Array[Int], Array[Double], Array[Double]) = {
    val n = rows.length
    val kind = method match {
      case "single" => 0
      case "complete" => 1
      case "average" => 2
    }
    val sizeByGen = new Array[Double](2 * n - 1)
    java.util.Arrays.fill(sizeByGen, 0, n, 1.0)
    val D = new Array[Double](n * n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0; var k = 0
        while (k < rows(i).length) { val d = rows(i)(k) - rows(j)(k); s += d * d; k += 1 }
        val dist = math.sqrt(s)
        D(i * n + j) = dist; D(j * n + i) = dist
        j += 1
      }
      i += 1
    }
    val slotSize = Array.fill(n)(1.0)
    val slotGen = Array.tabulate(n)(identity)
    val alive = Array.fill(n)(true)
    val mergeA = new Array[Int](math.max(n - 1, 0))
    val mergeB = new Array[Int](math.max(n - 1, 0))
    val mergeW = new Array[Double](math.max(n - 1, 0))
    val chain = new Array[Int](n + 1)
    var top = -1
    var m = 0
    while (m < n - 1) {
      if (top < 0) {
        var s0 = 0
        while (!alive(s0)) s0 += 1
        chain(0) = s0; top = 0
      }
      var merged = false
      while (!merged) {
        val x = chain(top)
        val prev = if (top > 0) chain(top - 1) else -1
        var best = if (prev >= 0) D(x * n + prev) else Double.MaxValue
        var bi = prev
        var c = 0
        while (c < n) {
          if (alive(c) && c != x && c != prev) {
            val w = D(x * n + c)
            if (w < best) { best = w; bi = c }
          }
          c += 1
        }
        if (bi == prev && prev >= 0) {
          val a = math.min(prev, x); val b = math.max(prev, x)
          val ga = slotGen(a); val gb = slotGen(b)
          mergeA(m) = math.min(ga, gb); mergeB(m) = math.max(ga, gb)
          mergeW(m) = best
          val na = slotSize(a); val nb = slotSize(b)
          var k2 = 0
          while (k2 < n) {
            if (alive(k2) && k2 != a && k2 != b) {
              val dak = D(a * n + k2); val dbk = D(b * n + k2)
              val nd = kind match {
                case 0 => math.min(dak, dbk)
                case 1 => math.max(dak, dbk)
                case _ => (na * dak + nb * dbk) / (na + nb)
              }
              D(a * n + k2) = nd; D(k2 * n + a) = nd
            }
            k2 += 1
          }
          alive(b) = false
          slotSize(a) = na + nb
          slotGen(a) = n + m
          sizeByGen(n + m) = na + nb
          top -= 2
          m += 1
          merged = true
        } else {
          top += 1; chain(top) = bi
        }
      }
    }
    (mergeA, mergeB, mergeW, sizeByGen)
  }

  private def exactLinkage(df: DataFrame, features: Seq[String]): DataFrame = {
    // one cached materialization backs the collected feature matrix AND
    // the labeled output (n ≤ maxExactRows) — only the numeric features
    // reach the driver; see ExactCollect
    val (rdd, rows) = ExactCollect.featureMatrix(df, features)
    val n = rows.length
    if (n == 0) { lastLinkage = Some(Array.empty); return df.withColumn(newColumn, lit(0)) }
    // single/complete/average hold the full n×n distance matrix on the
    // driver (8·n² bytes ≈ 800 MB at the 10k cap) while ward is O(n)
    // beyond the points; fail with an actionable message instead of an
    // opaque driver OOM when the matrix cannot fit alongside the running
    // heap (ward fits whenever the collected points do)
    if (linkage != "ward") {
      val needed = 8L * n * n
      // bound against MAX heap, not instantaneous occupancy: current
      // usage includes collectable garbage from earlier queries, and a
      // guard keyed to it would spuriously fail a fit a GC would allow
      val budget = Runtime.getRuntime.maxMemory / 2
      require(needed < budget,
        s"$linkage linkage needs an n×n distance matrix (${needed / (1 << 20)} MB at n=$n) " +
          s"but the driver heap budget for it is ${budget / (1 << 20)} MB (half of -Xmx); " +
          "lower maxExactRows (the scale path takes over), raise driver memory, " +
          "or use ward linkage (centroid-based, O(n) memory)")
    }
    val total = 2 * n - 1
    val (mergeA, mergeB, mergeW, size) =
      if (linkage == "ward") chainWard(rows) else chainMatrix(rows, linkage)
    // Reducibility makes merge heights mathematically monotone along
    // dendrogram paths, but floating-point evaluation can invert a parent
    // below its child by an ulp (different arithmetic paths). Clamp each
    // parent to at least its children's height IN GENERATION ORDER
    // (children are always generated first), so the stable height sort
    // below provably relabels every child before its parent and the
    // cluster cut unions consistently.
    var gm = 0
    while (gm < n - 1) {
      if (mergeA(gm) >= n) mergeW(gm) = math.max(mergeW(gm), mergeW(mergeA(gm) - n))
      if (mergeB(gm) >= n) mergeW(gm) = math.max(mergeW(gm), mergeW(mergeB(gm) - n))
      gm += 1
    }
    // sort merges by linkage height (stable: equal heights keep generation
    // order) and emit scipy ids
    val order = (0 until n - 1).sortBy(g => mergeW(g))
    val sortedId = new Array[Int](total)
    var s1 = 0
    while (s1 < n) { sortedId(s1) = s1; s1 += 1 }
    val linkOut = new Array[Array[Double]](math.max(n - 1, 0))
    // union-find over generation ids for the cluster cut
    val uf = Array.tabulate(total)(identity)
    def find(v: Int): Int = {
      var r = v
      while (uf(r) != r) r = uf(r)
      var w = v
      while (uf(w) != r) { val nx = uf(w); uf(w) = r; w = nx }
      r
    }
    val cut = math.max(n - nClusters, 0)
    order.zipWithIndex.foreach { case (g, k) =>
      val a = sortedId(mergeA(g)); val b = sortedId(mergeB(g))
      // ward accumulates the SQUARED objective; the distance-matrix
      // linkages already carry Euclidean heights (scipy convention)
      val height = if (linkage == "ward") math.sqrt(mergeW(g)) else mergeW(g)
      linkOut(k) = Array(math.min(a, b).toDouble, math.max(a, b).toDouble,
        height, size(n + g))
      sortedId(n + g) = n + k
      if (k < cut) {
        // removing the (nClusters−1) tallest merges cuts the dendrogram
        val ra = find(mergeA(g)); val rb = find(mergeB(g))
        uf(rb) = ra; uf(n + g) = ra
      }
    }
    lastLinkage = Some(linkOut)
    // relabel clusters 0..k-1 by first occurrence
    val relabel = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    val labels = Array.tabulate(n)(r => relabel.getOrElseUpdate(find(r), relabel.size))
    ExactCollect.labeled(df, rdd, labels, newColumn)
  }
}

/** ClassLabel (strategies.py:187-211): assign labels from an explicit
  * index→label map — a broadcast map join, -1 for unmapped rows. */
final case class ClassLabel(
    labels: Map[String, Int],
    name: String = "ClassLabel",
    index: String = "gene_stable_id") extends Transformer {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val labelDf = spark.createDataFrame(labels.toSeq).toDF(index, name)
    df.join(broadcast(labelDf), Seq(index), "left")
      .withColumn(name, coalesce(col(name), lit(-1)))
  }
}

object Clustering {
  /** M4 `MDF.cluster` semantics (mdataframe.py:768-839): cluster the ROWS
    * of the data block, join the labels into metaRows with -1 fill; if the
    * row count is not greater than k, all labels are 0 (skip-fit guard).
    * (The reference's axis=0 clusters the small samples axis — that path
    * collects the transposed matrix, which is exactly AggloOp/KMeansOp on
    * a pivoted frame.) */
  def clusterRows(mf: MFrame, op: ClusterOp): MFrame = {
    val k = op match {
      case k1: KMeansOp => k1.nClusters
      case a: AggloOp   => a.nClusters
    }
    val n = mf.data.count()
    val labels =
      if (n <= k) mf.data.select(col(mf.index), lit(0).as(op.newColumn))
      else {
        val noSort = op match {
          case k1: KMeansOp => k1.copy(sort = false, add = true)
          case a: AggloOp   => a.copy(sort = false, add = true)
        }
        noSort(mf.data).select(col(mf.index), col(op.newColumn))
      }
    val meta = mf.metaRows.fold(labels)(m => m.join(labels, Seq(mf.index), "left"))
      .withColumn(op.newColumn, coalesce(col(op.newColumn).cast("double"), lit(-1.0)))
    mf.copy(metaRows = Some(meta))
  }
}
