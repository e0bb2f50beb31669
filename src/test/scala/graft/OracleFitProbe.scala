package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extracts the data-dependent fitted constants that the q_vst /
  * q_kmeans / q_agglo_single oracle SQL embeds as literals at the
  * sf0.01 correctness gate (the q_batch_effect embedded-coefficients
  * pattern; not a test). Re-run after any fixture regeneration and
  * refresh the literals in SparkEntry. */
object OracleFitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val m = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_partkey"))
      .agg(
        sum(when(col("l_returnflag") === "A", 1).otherwise(0)).cast("double").as("rf_a"),
        sum(when(col("l_returnflag") === "N", 1).otherwise(0)).cast("double").as("rf_n"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("double").as("rf_r"))

    // ---- VST: trend coefficients + size factors (sf recomputed in SQL,
    //      printed here only as a cross-check) ----
    val vst = graft.stats.Vst(index = "l_partkey")
    vst(m).count()
    val (ad, ep) = vst.lastTrend.get
    println(f"VST ad=$ad%.17g ep=$ep%.17g")
    val sf = graft.stats.DESeq2Unpaired.sizeFactors(m, Seq("rf_a", "rf_n", "rf_r"))
    println(f"VST sf=${sf.mkString(", ")}")

    // ---- KMeans: converged centroids (same pinned layout as q_kmeans —
    //      kmeans|| init samples per partition, so centroids are only
    //      deterministic per physical layout) ----
    val mPinned = m.repartition(8, col("l_partkey")).sortWithinPartitions("l_partkey")
    val km = graft.operators.KMeansOp(nClusters = 4, sort = false,
      protect = Seq("l_partkey"))
    km(mPinned).count()
    km.lastModel.get.clusterCenters.zipWithIndex.foreach { case (c, i) =>
      println(f"KMEANS c$i=${c.toArray.map(v => f"$v%.17g").mkString(", ")}")
    }

    // disagreements between the model's own assignment and exact argmin
    // over its centroids (near-tie diagnosis)
    locally {
      val centers = km.lastModel.get.clusterCenters.map(_.toArray)
      val labeled = km.lastModel.get.transform(
        new org.apache.spark.ml.feature.VectorAssembler()
          .setInputCols(Array("rf_a", "rf_n", "rf_r")).setOutputCol("__features")
          .transform(mPinned))
      val dcols = centers.zipWithIndex.map { case (c, i) =>
        ((col("rf_a") - c(0)) * (col("rf_a") - c(0)) +
          (col("rf_n") - c(1)) * (col("rf_n") - c(1)) +
          (col("rf_r") - c(2)) * (col("rf_r") - c(2))).as(s"d$i")
      }
      val exact = least(col("d0"), col("d1"), col("d2"), col("d3"))
      val am = when(col("d0") === exact, 0).otherwise(
        when(col("d1") === exact, 1).otherwise(when(col("d2") === exact, 2).otherwise(3)))
      val dis = labeled.select((col("l_partkey") +: col("KNN") +: dcols): _*)
        .withColumn("argmin", am)
        .where(col("KNN") =!= col("argmin"))
      println(s"KMEANS disagreements=${dis.count()}")
      dis.orderBy("l_partkey").limit(10).collect().foreach { r =>
        println(s"KMEANS dis: " + r.mkString(", "))
      }
    }

    // ---- single-linkage 200-row subset: merge heights around the k=3
    //      cut (heights are sqrt of integer squared lattice distances;
    //      print d^2 so the oracle can compare exactly in integers) ----
    val sub = m.orderBy("l_partkey").limit(200)
    val ag = graft.operators.AggloOp(nClusters = 3, sort = false,
      linkage = "single", protect = Seq("l_partkey"))
    ag(sub).count()
    val h = ag.lastLinkage.get.map(_(2)).sorted
    val n = h.length + 1
    // d2 multiset of the largest merges: a k-cut equals eps-graph
    // connected components only when h[n-k-1] < h[n-k] strictly — print
    // the tail so the query picks a k whose boundary sits in a gap
    val d2 = h.map(x => math.round(x * x))
    println("AGGLO top d2 (k for cut AFTER this merge): " +
      (1 to 30).map(j => s"k=${j}:${d2(n - 1 - j)}").mkString(" "))

    // ---- ward-linkage 200-row subset: a flat k-cut equals the connected
    //      components of the graph whose edges are the n−k KEPT merges,
    //      each expressed as a pair of member keys (one representative
    //      per merged side). q_agglo embeds those edges; the Ward
    //      objective itself stays pinned by ClusteringSpec. The replay
    //      below must reproduce the op's labels or the mapping
    //      (row index == ascending l_partkey rank) is wrong. ----
    locally {
      val aw = graft.operators.AggloOp(nClusters = 3, sort = false,
        linkage = "ward", protect = Seq("l_partkey"))
      val out = aw(sub).select("l_partkey", "Agglo").collect()
        .map(r => (r.get(0).asInstanceOf[Number].longValue(),
          r.get(1).asInstanceOf[Number].intValue()))
      val n2 = out.length
      val keys = out.map(_._1).sorted
      val link = aw.lastLinkage.get
      // rep(c) = one member row index of cluster c (sorted-id numbering;
      // children always precede parents after the monotonicity clamp)
      val rep = new Array[Int](2 * n2 - 1)
      var ri = 0
      while (ri < n2) { rep(ri) = ri; ri += 1 }
      val cutW = n2 - 3
      val edges = (0 until cutW).map { k =>
        val a = link(k)(0).toInt; val b = link(k)(1).toInt
        val ra = rep(a); val rb = rep(b)
        rep(n2 + k) = math.min(ra, rb)
        (ra, rb)
      }
      val uf = Array.tabulate(n2)(identity)
      def findW(v: Int): Int = { var r = v; while (uf(r) != r) r = uf(r); r }
      edges.foreach { case (a, b) => uf(findW(a)) = findW(b) }
      val canon = scala.collection.mutable.Map.empty[Int, Long]
      for (i <- 0 until n2) {
        val r = findW(i)
        canon(r) = math.min(canon.getOrElse(r, Long.MaxValue), keys(i))
      }
      val replay = (0 until n2).map(i => keys(i) -> canon(findW(i))).toMap
      val byLabel = out.groupBy(_._2).map { case (l, g) => l -> g.map(_._1).min }
      val opMap = out.map { case (k, lab) => k -> byLabel(lab) }.toMap
      println(s"AGGLO_WARD replay==op: ${replay == opMap} " +
        s"clusters=${byLabel.values.toSeq.sorted.mkString(",")}")
      println("AGGLO_WARD edges=" + edges.map { case (a, b) =>
        s"(${keys(a)},${keys(b)})" }.mkString(","))
    }

    // ---- SemDeDup: converged centroids on the pinned embeddings layout
    //      (q_semdedup embeds them), plus the two margins that make the
    //      embedded-constants oracle robust: the assignment margin
    //      (nearest vs second-nearest centroid — must dwarf cross-engine
    //      ulp noise in the distance arithmetic) and the cosine-vs-tau
    //      gap over within-cluster pairs (must dwarf ulp noise in the
    //      cosine formulas, which differ between engines). ----
    locally {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .repartition(8, col("vec_id")).sortWithinPartitions("vec_id")
      val cs = graft.operators.SemDedup.fitCentroids(emb, "embedding", 8)
      cs.zipWithIndex.foreach { case (c, i) =>
        println(s"SEMDEDUP c$i=[" + c.map(v => f"$v%.17g").mkString(", ") + "]")
      }
      val rows = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      def d2(a: Array[Double], c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val t = a(i) - c(i); s += t * t; i += 1 }; s
      }
      val assignMargin = rows.map { case (_, v) =>
        val ds = cs.map(c => d2(v, c)).sorted
        ds(1) - ds(0)
      }.min
      println(f"SEMDEDUP assign margin(min d2nd-d1st)=$assignMargin%.6g")
      val byCell = rows.groupBy { case (_, v) =>
        cs.indices.minBy(i => d2(v, cs(i)))
      }
      println("SEMDEDUP cell sizes=" +
        byCell.toSeq.sortBy(_._1).map(_._2.length).mkString(","))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
        dot / math.sqrt(na * nb)
      }
      for (tau <- Seq(0.30, 0.35, 0.40, 0.45, 0.50)) {
        var nPairs = 0L; var nOver = 0L; var minGap = Double.MaxValue
        for (cell <- byCell.values; i <- cell.indices; j <- (i+1) until cell.length) {
          val c = cos(cell(i)._2, cell(j)._2)
          nPairs += 1
          if (c >= tau) nOver += 1
          val g = math.abs(c - tau)
          if (g < minGap) minGap = g
        }
        println(f"SEMDEDUP tau=$tau pairs=$nPairs over_tau=$nOver min|cos-tau|=$minGap%.6g")
      }
    }

    // ---- IVF coarse quantizer at the q_similarity_ivf gate parameters
    //      (nlist=16, seed=42, maxIter=10, UNIT vectors — exactly what
    //      IvfIndex.build fits). q_similarity_ivf embeds the centroids;
    //      the margins below are what make the embedded-constant oracle
    //      robust: every discrete choice (corpus cell argmin, the probe
    //      set boundary, each output rank) must sit in a gap that dwarfs
    //      cross-engine ulp noise. ----
    locally {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val cu = graft.operators.Similarity.withUnitVec(emb, "embedding", "__cv")
        .select(col("vec_id"), col("__cv"))
      val cs = graft.operators.Similarity.fitQuantizer(cu, "__cv", 16, 42L, 10)
      cs.zipWithIndex.foreach { case (c, i) =>
        println(s"IVF c$i=[" + c.map(v => f"$v%.17g").mkString(", ") + "]")
      }
      val rows = cu.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      def d2(a: Array[Double], c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val t = a(i) - c(i); s += t * t; i += 1 }; s
      }
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val assignMargin = rows.map { case (_, v) =>
        val ds = cs.map(c => d2(v, c)).sorted
        ds(1) - ds(0)
      }.min
      println(f"IVF assign margin(min d2nd-d1st)=$assignMargin%.6g")
      val probeMargin = rows.filter(_._1 < 8).map { case (_, v) =>
        val ds = cs.map(c => d2(v, c)).sorted
        ds(6) - ds(5)
      }.min
      println(f"IVF probe margin(min d7th-d6th)=$probeMargin%.6g")
      val cellOf = rows.map { case (id, v) =>
        id -> cs.indices.minBy(i => d2(v, cs(i)))
      }.toMap
      println("IVF cell sizes=" + (0 until 16).map(i =>
        cellOf.values.count(_ == i)).mkString(","))
      // min adjacent score gap across the top-11 candidates of every
      // query: every output rank boundary (1..10) must be separated by
      // more than the ~1e-15 disagreement the two engines' score
      // formulas (unit-vec dot here vs raw-vec cosine in DuckDB) can
      // produce. Exact ties are rank-stable only if tied in BOTH
      // engines, so a ~0 gap here would demand a different tie story.
      val rankGap = rows.filter(_._1 < 8).map { case (qid, qv) =>
        val probed = cs.indices.map(i => (i, d2(qv, cs(i))))
          .sortBy(_._2).take(6).map(_._1).toSet
        val scores = rows.iterator
          .filter { case (nid, _) => nid != qid && probed.contains(cellOf(nid)) }
          .map { case (nid, nv) => (dot(qv, nv), nid) }
          .toSeq.sortBy { case (s, id) => (-s, id) }
          .take(11).map(_._1)
        scores.sliding(2).map(p => p(0) - p(1)).min
      }.min
      println(f"IVF rank gap(min adjacent in top-11)=$rankGap%.6g")
    }

    // ---- HNSW vs brute-force at the q_similarity_hnsw gate parameters:
    //      print the queries whose top-10 deviates and their full HNSW
    //      rows (q_similarity_hnsw embeds those as the deviation patch
    //      over a replayed brute-force oracle). Deterministic: seeded
    //      level stream, hash shard membership, id-sorted insertion. ----
    locally {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 8)
      val hn = graft.operators.Hnsw.topK(emb, q, "embedding", "vec_id", k = 10)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val br = graft.operators.Similarity
        .bruteForceTopK(emb, q, "embedding", "vec_id", 10)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val hByQ = hn.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      val bByQ = br.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      val devQ = hByQ.keySet.union(bByQ.keySet)
        .filter(q => hByQ.get(q) != bByQ.get(q)).toSeq.sorted
      println("HNSW deviating queries=" + devQ.mkString(","))
      devQ.foreach { q =>
        println(s"HNSW dev q$q=" + hByQ(q).zipWithIndex
          .map { case (n, i) => s"($q,$n,${i + 1})" }.mkString(","))
      }
    }

    // ---- temperature mix thresholds (q_temperature_mix embeds them) ----
    locally {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val counts = docs.groupBy("lang").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val ts = graft.operators.Sampling.temperatureThresholds(counts, 0.5)
      println("TEMPMIX thresholds=" + ts.toSeq.sorted.map { case (g, t) =>
        s"('$g',${t})" }.mkString(","))
      val kept = ts.map { case (g, t) =>
        // expected keep count per source (diagnostic only)
        counts(g) * (t.toDouble / math.pow(2.0, 60.0))
      }.sum
      println(f"TEMPMIX expected kept total=$kept%.1f of ${counts.values.sum}")
    }

    // ---- DSIR quantized bucket log-ratios (q_dsir_select embeds them;
    //      target = the 'en' slice, raw = full corpus, 64 buckets) ----
    locally {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val m = graft.operators.Sampling.dsirLogRatios(
        docs, docs.where(col("lang") === "en"), "text")
      println("DSIR m=" + (0 until 64).map(b => s"($b,${m(b)})").mkString(", "))
    }
    spark.stop()
  }
}
