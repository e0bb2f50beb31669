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
    protect: Seq[String] = Seq("gene_stable_id")) extends ClusterOp {

  @transient var lastModel: Option[KMeansModel] = None

  protected def assignLabels(df: DataFrame, features: Seq[String]): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .transform(df)
    val model = new MlKMeans().setK(nClusters).setSeed(seed)
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
  * (documented semantic substitute). */
final case class AggloOp(
    name: String = "Agglo",
    nClusters: Int = 2,
    columnName: Option[String] = None,
    sort: Boolean = true,
    ascending: Boolean = true,
    add: Boolean = true,
    maxExactRows: Int = 10000,
    seed: Long = 42L,
    protect: Seq[String] = Seq("gene_stable_id")) extends ClusterOp {

  protected def assignLabels(df: DataFrame, features: Seq[String]): DataFrame = {
    val n = df.count()
    if (n <= maxExactRows) exactWard(df, features)
    else {
      val assembled = new VectorAssembler()
        .setInputCols(features.toArray).setOutputCol("__features").transform(df)
      new BisectingKMeans().setK(nClusters).setSeed(seed)
        .setFeaturesCol("__features").setPredictionCol(newColumn)
        .fit(assembled).transform(assembled).drop("__features")
    }
  }

  /** Exact Ward agglomeration (Lance-Williams update), labels numbered by
    * first-seen row order like sklearn's deterministic output. */
  private def exactWard(df: DataFrame, features: Seq[String]): DataFrame = {
    // one cached materialization backs the collected feature matrix AND
    // the labeled output (n ≤ maxExactRows) — only the numeric features
    // reach the driver; see ExactCollect
    val (rdd, rows) = ExactCollect.featureMatrix(df, features)
    val n = rows.length
    if (n == 0) return df.withColumn(newColumn, lit(0))
    // cluster membership + sizes + centroids
    val parent = Array.tabulate(n)(identity)
    val active = scala.collection.mutable.Set(0 until n: _*)
    val size = Array.fill(n)(1.0)
    val centroid = rows.map(_.clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def ward(i: Int, j: Int): Double =
      (2.0 * size(i) * size(j) / (size(i) + size(j))) * d2(centroid(i), centroid(j))
    var clusters = n
    while (clusters > nClusters) {
      var bi = -1; var bj = -1; var best = Double.MaxValue
      val act = active.toArray.sorted
      var x = 0
      while (x < act.length) {
        var y = x + 1
        while (y < act.length) {
          val w = ward(act(x), act(y))
          if (w < best) { best = w; bi = act(x); bj = act(y) }
          y += 1
        }
        x += 1
      }
      // merge bj into bi
      val tot = size(bi) + size(bj)
      var k = 0
      while (k < centroid(bi).length) {
        centroid(bi)(k) = (centroid(bi)(k) * size(bi) + centroid(bj)(k) * size(bj)) / tot
        k += 1
      }
      size(bi) = tot
      active -= bj
      var r = 0
      while (r < n) { if (parent(r) == bj) parent(r) = bi; r += 1 }
      clusters -= 1
    }
    // relabel clusters 0..k-1 by first occurrence
    val relabel = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    val labels = parent.map(p => relabel.getOrElseUpdate(p, relabel.size))
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
