package graft

import graft.stats.EdgeRKernel._

/** Scratch probe for calibrating the edgeR kernels on the reference
  * fixture (not a test; run via Test/runMain graft.EdgeRProbe). */
object EdgeRProbe {
  def main(args: Array[String]): Unit = {
    val genes = Seq("genA", "genB", "genC", "genD")
    val counts: Map[String, Array[Double]] = Map(
      "genA" -> Array(23.0, 2, 21, 23, 3, 4),
      "genB" -> Array(12.0, 14, 14, 4, 4, 5),
      "genC" -> Array(9.0, 6, 6, 21, 22, 23),
      "genD" -> Array(40.0, 80, 80, 90, 90, 80))
    val groupOf = Array(0, 0, 0, 1, 1, 1)
    val spark = SparkSpec.spark
    val samples = Seq("sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3")
    val rows = genes.map(g => (g, counts(g)(0), counts(g)(1), counts(g)(2),
      counts(g)(3), counts(g)(4), counts(g)(5)))
    val df = spark.createDataFrame(rows).toDF(("gene_stable_id" +: samples): _*)
    val lib = graft.functions.Normalization.libSizes(df, samples)
    val factors = graft.functions.Normalization.tmmFactors(df, samples)
    println(s"lib=${samples.map(lib)}")
    println(s"factors=${samples.map(factors)}")
    val effLib = samples.map(c => lib(c) * factors(c)).toArray
    val rawLib = samples.map(lib).toArray
    val commonLib = math.exp(effLib.map(math.log).sum / effLib.length)
    println(s"commonLib=$commonLib")

    for (g <- genes) {
      val aEff = aveLogCpm(counts(g), effLib)
      val aRaw = aveLogCpm(counts(g), rawLib)
      println(f"$g aveLogCPM eff=$aEff%.6f raw=$aRaw%.6f")
    }
    for (g <- genes) {
      print(s"$g p(d): ")
      for (d <- Seq(1e-6, 1e-4, 0.001, 0.01, 0.05, 0.1, 0.2, 0.3, 0.5, 1.0)) {
        val pseudo = pseudoCounts(counts(g), groupOf, 2, effLib, commonLib, d)
        val p = exactTestDoubleTail(pseudo.take(3), pseudo.drop(3), d)
        print(f"$d%g->$p%.4g  ")
      }
      println()
      val pseudo01 = pseudoCounts(counts(g), groupOf, 2, effLib, commonLib, 0.1)
      println(s"  pseudo@0.1 = ${pseudo01.map(v => f"$v%.3f").mkString(",")} raw=${counts(g).mkString(",")}")
      for (d <- Seq(0.05, 0.1, 0.3)) {
        val lfc = exactLogFc(counts(g), groupOf, effLib, d)
        print(f"  lfc@$d%g=$lfc%.5f")
      }
      println()
    }
    // which dispersion reproduces R's aveLogCPM per gene?
    val goldenCpm = Map("genA" -> 16.94768, "genB" -> 16.53769,
      "genC" -> 17.10778, "genD" -> 19.37526)
    for (g <- genes) {
      print(s"$g aveLogCPM by disp: ")
      for (d <- Seq(0.0, 0.01, 0.05, 0.1, 0.19259776962324535, 0.3, 0.5, 0.95)) {
        print(f"$d%g->${aveLogCpm(counts(g), effLib, 2.0, d)}%.5f ")
      }
      println(f" target=${goldenCpm(g)}%.5f")
    }
    // dispersion estimation trace
    val pseudoAll = genes.map(g => pseudoCounts(counts(g), groupOf, 2, effLib, commonLib, 0.01))
    val l0s = pseudoAll.map(p => l0Grid(p, groupOf, 2))
    val sum0 = Array.tabulate(21)(i => l0s.map(_(i)).sum)
    println(s"common disp = ${maximizeGridDisp(sum0)}")
    genes.zip(l0s).foreach { case (g, l0) =>
      println(s"$g tag-only disp = ${maximizeGridDisp(l0)}")
    }

    // full two-stage WLEB pipeline at several prior.df values
    val goldenP = Map("genA" -> 5.263604e-01, "genB" -> 1.429378e-04,
      "genC" -> 6.638539e-06, "genD" -> 4.473013e-01)
    val goldenLfc = Map("genA" -> 0.7643766, "genB" -> 1.7107356,
      "genC" -> -1.5167703, "genD" -> -0.2533613)
    val cov = genes.map(g => g -> aveLogCpm(counts(g), effLib)).toMap
    val order = genes.sortBy(cov) // AveLogCPM ascending
    val n = order.length
    val width = n // span=1 for <=10 genes
    val half1 = math.ceil((width - 1) / 2.0).toInt
    val half2 = math.floor((width - 1) / 2.0).toInt
    def movAvg(mat: Map[String, Array[Double]]): Map[String, Array[Double]] =
      order.zipWithIndex.map { case (g, i) =>
        val js = (math.max(0, i - half1) to math.min(n - 1, i + half2))
        g -> Array.tabulate(21)(k => js.map(j => mat(order(j))(k)).sum / js.size)
      }.toMap
    val l0Map = genes.zip(l0s).toMap
    val m0 = movAvg(l0Map)
    val trended = genes.map(g => g -> maximizeGridDisp(m0(g))).toMap
    println(s"trended = $trended")
    val pseudo2 = genes.map(g => g ->
      pseudoCounts(counts(g), groupOf, 2, effLib, commonLib, trended(g))).toMap
    val l02 = genes.map(g => g -> l0Grid(pseudo2(g), groupOf, 2)).toMap
    val m0p = movAvg(l02)
    for (priorDf <- Seq(0.0, 0.5, 1.0, 2.0, 3.0, 5.0, 10.0, 20.0)) {
      val priorN = priorDf / (6 - 2).toDouble
      val tag = genes.map { g =>
        g -> maximizeGridDisp(Array.tabulate(21)(i => l02(g)(i) + priorN * m0p(g)(i)))
      }.toMap
      val ps = genes.map { g =>
        val pp = pseudoCounts(counts(g), groupOf, 2, effLib, commonLib, tag(g))
        g -> exactTestDoubleTail(pp.take(3), pp.drop(3), tag(g))
      }.toMap
      val lfcs = genes.map(g => g -> exactLogFc(counts(g), groupOf, effLib, tag(g))).toMap
      val pGap = genes.map(g => math.abs(math.log10(ps(g)) - math.log10(goldenP(g)))).max
      val lfcGap = genes.map(g => math.abs(lfcs(g) - goldenLfc(g))).max
      println(f"priorDf=$priorDf%5.1f tag=${genes.map(g => f"${tag(g)}%.4f").mkString(",")} " +
        f"p=${genes.map(g => f"${ps(g)}%.3g").mkString(",")} maxLog10Gap=$pGap%.3f maxLfcGap=$lfcGap%.4f")
    }
  }
}
