package graft

import graft.core.MFrame
import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mirrors tests/test_clustering.py + projection contract checks. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** conftest test_frame: 4 genes × 6 samples. */
  lazy val counts: DataFrame = Seq(
    ("genA", 23.0, 2.0, 21.0, 23.0, 3.0, 4.0),
    ("genB", 12.0, 14.0, 14.0, 4.0, 4.0, 5.0),
    ("genC", 9.0, 6.0, 6.0, 21.0, 22.0, 23.0),
    ("genD", 40.0, 80.0, 80.0, 90.0, 90.0, 80.0)
  ).toDF("gene_stable_id", "sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3")

  test("Agglo defaults and naming (test_clustering.py:9-17)") {
    val a = AggloOp()
    assert(a.name == "Agglo" && a.nClusters == 2)
    val other = AggloOp("other", nClusters = 3)
    assert(other.name == "other" && other.nClusters == 3)
  }

  test("cluster adds a label column, monotonic after sort (test_clustering.py:20-25)") {
    val out = AggloOp()(counts)
    assert(out.columns.contains("Agglo"))
    val labels = out.collect().map(_.getAs[Int]("Agglo"))
    assert(labels.zip(labels.tail).forall { case (a, b) => a <= b })
    assert(labels.distinct.length == 2)
  }

  test("sort=false preserves input, ascending=false reverses (test_clustering.py:28-36)") {
    val desc = AggloOp(ascending = false)(counts)
    val dl = desc.collect().map(_.getAs[Int]("Agglo"))
    assert(dl.zip(dl.tail).forall { case (a, b) => a >= b })
    val noSort = AggloOp(sort = false)(counts)
    assert(noSort.select("gene_stable_id").collect().map(_.getString(0)).toSeq ==
      Seq("genA", "genB", "genC", "genD"))
  }

  test("add=false drops the label column (test_clustering.py:39-46)") {
    val out = AggloOp(add = false)(counts)
    assert(!out.columns.contains("Agglo"))
  }

  test("ward merges the obviously-close genes") {
    // genA/genB/genC are two orders of magnitude below genD
    val labels = AggloOp(sort = false)(counts).collect()
      .map(r => r.getString(0) -> r.getAs[Int]("Agglo")).toMap
    assert(labels("genD") != labels("genA"))
    assert(labels("genA") == labels("genB") && labels("genB") == labels("genC"))
  }

  test("NN-chain single/complete/average equal naive greedy linkage (property)") {
    // in-test oracle: textbook greedy global-minimum agglomeration with
    // Lance-Williams updates on plain Euclidean distances, scipy ids
    def naive(pts: Array[Array[Double]], method: String): Seq[(Int, Int, Double, Int)] = {
      val n = pts.length
      val size = scala.collection.mutable.Map((0 until n).map(i => i -> 1.0): _*)
      val active = scala.collection.mutable.SortedSet((0 until n): _*)
      val d = scala.collection.mutable.Map.empty[(Int, Int), Double]
      def key(i: Int, j: Int) = (math.min(i, j), math.max(i, j))
      for (i <- 0 until n; j <- i + 1 until n)
        d(key(i, j)) = math.sqrt(
          pts(i).zip(pts(j)).map { case (a, b) => (a - b) * (a - b) }.sum)
      var next = n
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Int)]
      while (active.size > 1) {
        val pairs = for (i <- active.toSeq; j <- active.toSeq if i < j) yield (i, j)
        val (bi, bj) = pairs.minBy(p => d(key(p._1, p._2)))
        val h = d(key(bi, bj))
        active.foreach { k =>
          if (k != bi && k != bj) {
            val dik = d(key(bi, k)); val djk = d(key(bj, k))
            d(key(next, k)) = method match {
              case "single"   => math.min(dik, djk)
              case "complete" => math.max(dik, djk)
              case _          => (size(bi) * dik + size(bj) * djk) / (size(bi) + size(bj))
            }
          }
        }
        size(next) = size(bi) + size(bj)
        out += ((bi, bj, h, size(next).toInt))
        active -= bi; active -= bj; active += next
        next += 1
      }
      out.toSeq
    }
    val rng = new scala.util.Random(11)
    Seq("single", "complete", "average").foreach { method =>
      (0 until 2).foreach { trial =>
        val pts = Array.fill(35, 4)(rng.nextDouble() * 10)
        val df = pts.zipWithIndex.map { case (p, i) => (s"r$i", p(0), p(1), p(2), p(3)) }
          .toSeq.toDF("gene_stable_id", "f1", "f2", "f3", "f4")
        val op = AggloOp(nClusters = 3, sort = false, linkage = method)
        op(df).collect()
        val got = op.lastLinkage.get
        val want = naive(pts, method)
        assert(got.length == want.length)
        got.zip(want).foreach { case (g, (a, b, d, s)) =>
          assert(g(0) == a.toDouble && g(1) == b.toDouble,
            s"$method trial $trial: merge ids ${g.toSeq} vs ($a,$b,$d,$s)")
          assert(math.abs(g(2) - d) < 1e-9 && g(3) == s.toDouble, s"$method: ${g.toSeq} vs ($a,$b,$d,$s)")
        }
      }
    }
    intercept[IllegalArgumentException] { AggloOp(linkage = "centroid") }
  }

  test("ward linkage matrix matches scipy on the 4×6 fixture (strategies.py:475-486)") {
    val op = AggloOp(sort = false)
    op(counts).collect()
    // golden: naive greedy Ward (scipy linkage convention) on the fixture
    val expected = Seq(
      Seq(0.0, 1.0, 26.019223662515376, 2.0),
      Seq(2.0, 4.0, 35.57620927904864, 3.0),
      Seq(3.0, 5.0, 201.46546436879282, 4.0))
    val got = op.lastLinkage.get.map(_.toSeq).toSeq
    assert(got.length == 3)
    got.zip(expected).foreach { case (g, e) =>
      assert(g(0) == e(0) && g(1) == e(1) && g(3) == e(3), s"$g vs $e")
      assert(math.abs(g(2) - e(2)) < 1e-9, s"$g vs $e")
    }
    val frame = op.linkageFrame(spark).collect()
    assert(frame.length == 3 && frame(0).getDouble(2) > 26.0 && frame(0).getDouble(2) < 26.1)
  }

  test("NN-chain ward equals naive greedy Ward on random matrices (property)") {
    // in-test oracle: textbook greedy global-minimum Ward with scipy
    // linkage conventions — O(n³), fine at n=40
    def naiveWard(pts: Array[Array[Double]]): Seq[(Int, Int, Double, Int)] = {
      val n = pts.length
      val size = scala.collection.mutable.Map((0 until n).map(i => i -> 1.0): _*)
      val cent = scala.collection.mutable.Map((0 until n).map(i => i -> pts(i).clone()): _*)
      val active = scala.collection.mutable.SortedSet((0 until n): _*)
      def wd(i: Int, j: Int): Double = {
        val d2 = cent(i).zip(cent(j)).map { case (a, b) => (a - b) * (a - b) }.sum
        2.0 * size(i) * size(j) / (size(i) + size(j)) * d2
      }
      var next = n
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Int)]
      while (active.size > 1) {
        val pairs = for (i <- active.toSeq; j <- active.toSeq if i < j) yield (i, j)
        val (bi, bj) = pairs.minBy { case (i, j) => wd(i, j) }
        val d = math.sqrt(wd(bi, bj))
        val s = size(bi) + size(bj)
        cent(next) = cent(bi).zip(cent(bj)).map { case (a, b) =>
          (a * size(bi) + b * size(bj)) / s
        }
        size(next) = s
        out += ((bi, bj, d, s.toInt))
        active -= bi; active -= bj; active += next
        next += 1
      }
      out.toSeq
    }
    val rng = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val pts = Array.fill(40, 4)(rng.nextDouble() * 10)
      val df = pts.zipWithIndex.map { case (p, i) => (s"r$i", p(0), p(1), p(2), p(3)) }
        .toSeq.toDF("gene_stable_id", "f1", "f2", "f3", "f4")
      val op = AggloOp(nClusters = 3, sort = false)
      op(df).collect()
      val got = op.lastLinkage.get
      val want = naiveWard(pts)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, (a, b, d, s)) =>
        assert(g(0) == a.toDouble && g(1) == b.toDouble,
          s"trial $trial: merge ids ${g.toSeq} vs ($a,$b,$d,$s)")
        assert(math.abs(g(2) - d) < 1e-9 && g(3) == s.toDouble)
      }
    }
  }

  test("NN-chain ward handles a 2k-row input in driver time (O(n²) path)") {
    // 2000 rows × 3 features with two planted blobs; the pre-NN-chain
    // all-pairs rescan took minutes here, the chain runs in < ~2s
    val rows = (0 until 2000).map { i =>
      val blob = if (i % 2 == 0) 0.0 else 100.0
      (s"g$i", blob + i % 7, blob + (i * 3) % 11, blob + (i * 5) % 13)
    }
    val df = rows.toDF("gene_stable_id", "f1", "f2", "f3")
    val t0 = System.nanoTime()
    val out = AggloOp(sort = false)(df)
    val labels = out.collect().map(r => (r.getString(0), r.getAs[Int]("Agglo")))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"NN-chain too slow: $secs s")
    // the two blobs separate perfectly at k=2
    val byParity = labels.groupBy(_._1.drop(1).toInt % 2).map { case (p, g) =>
      p -> g.map(_._2).distinct
    }
    assert(byParity(0).length == 1 && byParity(1).length == 1)
    assert(byParity(0).head != byParity(1).head)
  }

  test("KMeans labels with k clusters; predict reuses the model (M1/M3)") {
    val km = KMeansOp(nClusters = 2, sort = false)
    val out = km(counts)
    assert(out.columns.contains("KNN"))
    assert(out.select("KNN").distinct().count() == 2)
    val pred = km.predict(counts)
    assert(pred.columns.contains("KNN"))
    assert(pred.count() == 4)
    // reference-shaped predict: impute → max>0 guard → scale → model
    // (strategies.py:126-133); the all-zero row is dropped by the guard
    import org.apache.spark.sql.functions._
    val withNullZero = counts
      .withColumn("sampleA_1",
        when(col("gene_stable_id") === "genA", lit(null)).otherwise(col("sampleA_1")))
      .union(counts.limit(1).select(
        (col("gene_stable_id") +: counts.columns.tail.map(_ => lit(0.0)).toSeq): _*))
    val pred2 = km.predict(withNullZero,
      graft.operators.ImputeFixed(replacementValue = 0.0, protect = Seq("gene_stable_id")),
      graft.core.Transformer("identity", Seq.empty)(identity))
    assert(pred2.count() == 4) // zero row guarded out, imputed rows kept
    assert(pred2.columns.contains("KNN"))
  }

  test("ClassLabel maps ids, -1 unmapped (strategies.py:187-211)") {
    val cl = ClassLabel(Map("genA" -> 7, "genD" -> 9))
    val out = cl(counts).collect().map(r => r.getString(0) -> r.getAs[Int]("ClassLabel")).toMap
    assert(out("genA") == 7 && out("genD") == 9 && out("genB") == -1)
  }

  test("MFrame cluster wrapper joins labels into metaRows with -1 fill (M4/J2)") {
    val mf = MFrame(counts)
    val clustered = Clustering.clusterRows(mf, AggloOp(nClusters = 2))
    val meta = clustered.metaRows.get.collect()
      .map(r => r.getString(r.fieldIndex("gene_stable_id")) -> r.getAs[Double]("Agglo")).toMap
    assert(meta.size == 4 && meta.values.forall(v => v == 0.0 || v == 1.0))
    // skip-fit guard: k >= n rows -> all zero labels
    val tiny = MFrame(counts.limit(2))
    val skipped = Clustering.clusterRows(tiny, AggloOp(nClusters = 2))
    assert(skipped.metaRows.get.collect().forall(_.getAs[Double]("Agglo") == 0.0))
  }

  test("PCA over samples: coords per sample, labeled expl.var columns (M5)") {
    val pca = PcaOp(nComponents = 2)
    val out = pca(counts)
    assert(out.count() == 6)
    val cols = out.columns.toSeq
    assert(cols.head == "sample")
    assert(cols(1).matches("PC1 \\(expl\\.var = \\d+\\.\\d%\\)"), cols(1))
    assert(pca.explainedVarianceRatio.length == 2)
    assert(pca.explainedVarianceRatio(0) >= pca.explainedVarianceRatio(1))
    assert(pca.explainedVarianceRatio.sum <= 1.0 + 1e-9)
    // sampleA_* and sampleB_* separate on PC1 or PC2 given the data shape
    val coords = out.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(coords.size == 6)
  }

  test("t-SNE driver-local embedding: deterministic, right shape (M6)") {
    val t = TsneOp(perplexity = 2, iterations = 50)
    val a = t(counts).collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val b = t(counts).collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(a.length == 6 && a.toSeq == b.toSeq)
  }

  test("reduce guard + UMAP unsupported (M7/M8)") {
    intercept[IllegalArgumentException] {
      Projection.reduce(counts.select("gene_stable_id", "sampleA_1"), PcaOp(), 2)
    }
    intercept[UnsupportedOperationException] { Projection.umap() }
  }
}
