package graft

import org.apache.spark.sql.functions._
import graft.core.MFrame
import graft.operators.PlotPrep

/** Plot data-prep contracts (reference mdataframe.py:1062-1065 label
  * substitution, 1124-1139 pagination, 1193-1205 class-label join). */
class PlotPrepSpec extends SparkSpec {

  import spark.implicits._

  def dataDf = Seq(
    ("genA", 1.0, 4.0), ("genB", 2.0, 5.0), ("genC", 3.0, 6.0), ("genD", 4.0, 7.0)
  ).toDF("gene_stable_id", "pc1", "pc2")

  test("substituteLabels uses meta labels, falls back to index") {
    val labels = Seq(("genA", "TP53"), ("genC", "BRCA1")).toDF("gene_stable_id", "name")
    val out = PlotPrep.substituteLabels(dataDf, "gene_stable_id", labels, "name")
      .select("gene_stable_id").orderBy("gene_stable_id").collect().map(_.getString(0)).toSeq
    assert(out.sorted == Seq("BRCA1", "TP53", "genB", "genD").sorted)
  }

  test("paginate assigns fixed-size pages in index order") {
    val out = PlotPrep.paginate(dataDf, "gene_stable_id", 3)
      .select("gene_stable_id", "page").orderBy("gene_stable_id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("genA" -> 1, "genB" -> 1, "genC" -> 1, "genD" -> 2))
  }

  test("scatterData joins class labels with unknown fill") {
    val meta = Seq(("genA", "up"), ("genB", "down")).toDF("gene_stable_id", "cls")
    val mf = MFrame(dataDf, index = "gene_stable_id").withMetaRows(meta)
    val out = PlotPrep.scatterData(mf, "cls")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getString(3))).toMap
    assert(out("genA") == ((1.0, 4.0, "up")))
    assert(out("genC") == ((3.0, 6.0, "unknown")))
    // no meta at all → every row labeled unknown
    val mf2 = MFrame(dataDf, index = "gene_stable_id")
    val out2 = PlotPrep.scatterData(mf2, "cls").select("cls").distinct().collect()
    assert(out2.map(_.getString(0)).toSeq == Seq("unknown"))
  }
}
