package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** DBSCAN clustering (reference strategies.py:99-486 exposes sklearn's
  * DBSCAN as a legacy strategy; SURVEY.md §2.10 M3 "none in Spark ML").
  * Same calling contract as the other cluster ops: appends an integer
  * label column, -1 = noise.
  *
  * Dual path like [[AggloOp]]:
  *  - n ≤ maxExactRows: exact textbook DBSCAN on the driver (BFS
  *    expansion, sklearn-compatible labels in first-discovery order);
  *  - large n: grid DBSCAN — points bucket into ε-side cells (map-side),
  *    cells with ≥ minSamples points are dense, dense cells union across
  *    the 3^d adjacent-cell neighborhood (driver union-find over the
  *    ≤ n/minSamples dense cells), points inherit their cell's cluster or
  *    join an adjacent dense cell, else noise. A documented approximation:
  *    cell diameter ε·√d exceeds ε, so same-cell density is assumed —
  *    standard grid-DBSCAN trade-off that keeps the pass map-side with one
  *    small aggregation (no all-pairs join at 100 TB).
  */
final case class DbscanOp(
    eps: Double = 0.5,
    minSamples: Int = 5,
    name: String = "DBSCAN",
    columnName: Option[String] = None,
    add: Boolean = true,
    maxExactRows: Int = 10000,
    protect: Seq[String] = Seq("gene_stable_id"),
    exactOnly: Boolean = false) extends Transformer {

  def newColumn: String = columnName.getOrElse(name)

  def apply(df: DataFrame): DataFrame = {
    val features = Transforms.numericValueColumns(df, protect)
    require(features.nonEmpty, "DBSCAN needs numeric feature columns")
    val n = df.count()
    // `exactOnly` pins callers that depend on exact-DBSCAN semantics
    // (e.g. an oracle comparison): a silent switch to the approximate
    // grid path would surface as a confusing result mismatch instead of
    // this actionable error
    require(!exactOnly || n <= maxExactRows,
      s"exactOnly DBSCAN got $n rows > maxExactRows=$maxExactRows; " +
        "raise maxExactRows or drop exactOnly to allow the grid path")
    val labeled =
      if (n <= maxExactRows) exact(df, features)
      else grid(df, features)
    if (add) labeled else labeled.drop(newColumn)
  }

  private def exact(df: DataFrame, features: Seq[String]): DataFrame = {
    // one cached materialization backs the collected feature matrix AND
    // the labeled output (n ≤ maxExactRows by construction) — only the
    // numeric features reach the driver; see ExactCollect
    val (rdd, pts) = ExactCollect.featureMatrix(df, features)
    val n = pts.length
    val eps2 = eps * eps
    def neighbors(i: Int): Array[Int] = {
      val out = Array.newBuilder[Int]
      var j = 0
      while (j < n) {
        var s = 0.0; var k = 0
        while (k < pts(i).length) { val d = pts(i)(k) - pts(j)(k); s += d * d; k += 1 }
        if (s <= eps2) out += j
        j += 1
      }
      out.result()
    }
    val UNVISITED = -99
    val labels = Array.fill(n)(UNVISITED)
    var c = -1
    var i = 0
    while (i < n) {
      if (labels(i) == UNVISITED) {
        val nb = neighbors(i)
        if (nb.length < minSamples) labels(i) = -1
        else {
          c += 1
          labels(i) = c
          val queue = scala.collection.mutable.Queue(nb.toSeq: _*)
          while (queue.nonEmpty) {
            val q = queue.dequeue()
            if (labels(q) == -1) labels(q) = c // border point
            if (labels(q) == UNVISITED) {
              labels(q) = c
              val nq = neighbors(q)
              if (nq.length >= minSamples) queue.enqueueAll(nq)
            }
          }
        }
      }
      i += 1
    }
    ExactCollect.labeled(df, rdd, labels, newColumn)
  }

  private def grid(df: DataFrame, features: Seq[String]): DataFrame = {
    require(features.length <= 8,
      s"grid DBSCAN supports ≤ 8 feature dims, got ${features.length}")
    val cellCols = features.map(c => floor(col(c).cast("double") / eps).cast("long"))
    val withCell = df.withColumn("__cell", array(cellCols: _*))
    val dense = withCell.groupBy("__cell").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minSamples)
      .select("__cell").collect().map(_.getSeq[Long](0).toVector)
    // driver union-find over dense cells (adjacent = Chebyshev distance 1)
    val cellSet = dense.toSet
    val parent = scala.collection.mutable.Map(dense.map(c => c -> c): _*)
    // NUMERIC lexicographic cell order (dims compared left to right as
    // longs, not as strings): the smaller-root-wins rule then makes every
    // component's final root its numerically-minimal cell, which a SQL
    // oracle replays with a plain MIN over (c0, c1, ...) tuples — string
    // order ("10" < "2") would not be
    val vecOrd: Ordering[Vector[Long]] = math.Ordering.Implicits.seqOrdering
    def find(c: Vector[Long]): Vector[Long] = {
      var r = c
      while (parent(r) != r) r = parent(r)
      var x = c
      while (parent(x) != x) { val nx = parent(x); parent(x) = r; x = nx }
      r
    }
    def union(a: Vector[Long], b: Vector[Long]): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        // deterministic: numerically smaller root wins
        if (vecOrd.lteq(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val d = features.length
    val offsets = Seq.fill(d)(Seq(-1L, 0L, 1L))
      .foldLeft(Seq(Vector.empty[Long]))((acc, s) => acc.flatMap(v => s.map(v :+ _)))
      .filterNot(_.forall(_ == 0L))
    dense.foreach { c =>
      offsets.foreach { off =>
        val nb = Vector.tabulate(d)(i => c(i) + off(i))
        if (cellSet.contains(nb)) union(c, nb)
      }
    }
    // stable cluster ids: rank of the root cell (numeric lexicographic —
    // component root == its minimal member cell, see vecOrd above)
    val roots = dense.map(find).distinct.sorted(vecOrd)
    val rootId = roots.zipWithIndex.toMap
    val cellLabel: Map[Vector[Long], Int] = dense.map(c => c -> rootId(find(c))).toMap
    val bc = df.sparkSession.sparkContext.broadcast((cellLabel, offsets))
    val labelUdf = udf { (cell: Seq[Long]) =>
      val (m, offs) = bc.value
      val v = cell.toVector
      m.get(v) match {
        case Some(l) => l
        case None =>
          // border: join the smallest-id adjacent dense cluster
          val adj = offs.iterator
            .map(off => Vector.tabulate(v.length)(i => v(i) + off(i)))
            .flatMap(m.get)
          if (adj.hasNext) adj.min else -1
      }
    }
    withCell.withColumn(newColumn, labelUdf(col("__cell"))).drop("__cell")
  }
}
