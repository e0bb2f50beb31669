package graft

import graft.stats.EdgeRKernel._

/** Pure-JVM timing of the edgeR per-gene kernels on sf0.1-like data
  * (not a test; Test/runMain graft.KernelProbe). */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val rng = new scala.util.Random(1)
    val nGenes = 20000
    val genes = Array.fill(nGenes) {
      // ~30 counts spread across 9 cells, many zeros (sf0.1 replicateMatrix)
      val y = new Array[Double](9)
      (0 until 30).foreach(_ => y(rng.nextInt(9)) += 1)
      y
    }
    val groupOf = Array(0, 0, 0, 1, 1, 1, 0, 0, 0) // A vs R with N as extra? use 2 groups over 6
    val cols9 = Array(0, 0, 0, 1, 1, 1, 2, 2, 2)
    val effLib = Array.fill(9)(60000.0 + rng.nextInt(10000))
    val commonLib = math.exp(effLib.map(math.log).sum / 9)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // use A-vs-R = 6 columns like the query
    val sel = Array(0, 1, 2, 6, 7, 8)
    val g2 = genes.map(y => sel.map(y(_)))
    val lib6 = sel.map(effLib(_))
    val go6 = Array(0, 0, 0, 1, 1, 1)

    time("aveLogCpm x20k")(g2.foreach(y => aveLogCpm(y, lib6)))
    var pseudo: Array[Array[Double]] = null
    time("pseudoCounts@0.01 x20k") {
      pseudo = g2.map(y => pseudoCounts(y, go6, 2, lib6, commonLib, 0.01))
    }
    time("l0Grid x20k")(pseudo.foreach(p => l0Grid(p, go6, 2)))
    time("pseudo+test@0.19 x20k")(g2.foreach { y =>
      val p = pseudoCounts(y, go6, 2, lib6, commonLib, 0.19)
      exactTestDoubleTail(p.take(3), p.drop(3), 0.19)
    })
    time("exactLogFc x20k")(g2.foreach(y => exactLogFc(y, go6, lib6, 0.19)))
    time("maximizeInterpolant x20k")((0 until nGenes).foreach { i =>
      maximizeInterpolant(SplinePts, Array.tabulate(21)(j => -(j - 7.0) * (j - 7.0)))
    })
  }
}
