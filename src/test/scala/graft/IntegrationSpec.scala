package graft

import org.apache.spark.sql.functions._
import graft.core.MFrame
import graft.operators._
import graft.sources.{Excel, Sinks}

/** End-to-end workflow mirroring the reference README's promise
  * (README.rst:22-54: load → impute → scale → cluster → report): one
  * lazy Catalyst plan from load to label join, then report sinks, all on
  * the shared 4×6 conformance fixture. */
class IntegrationSpec extends SparkSpec {

  import spark.implicits._

  def countsDf = Seq(
    ("genA", 23.0, 2.0, 21.0, 23.0, 3.0, 4.0),
    ("genB", 12.0, 14.0, 14.0, 4.0, 4.0, 5.0),
    ("genC", 9.0, 6.0, 6.0, 21.0, 22.0, 23.0),
    ("genD", 40.0, 80.0, 80.0, 90.0, 90.0, 80.0)
  ).toDF("gene_stable_id", "sampleA_1", "sampleA_2", "sampleA_3",
    "sampleB_1", "sampleB_2", "sampleB_3")

  test("impute → scale → filter chain composes into one plan; cluster + report") {
    val meta = Seq(("genA", "coding"), ("genB", "coding"),
      ("genC", "lincRNA"), ("genD", "coding")).toDF("gene_stable_id", "biotype")
    val mf = MFrame(countsDf, index = "gene_stable_id").withMetaRows(meta)

    // chained transformers — lazily composed, one optimized plan
    val chain = ImputeFixed(replacementValue = 0.0)
      .andThen(ZScale(ddof = 1))
    val transformed = mf.transform(chain)
    assert(chain.name == "Im(None0.0)>Z") // reference naming: Im(...)/Z
    assert(chain.fingerprint.length == 64)
    // z-scaled columns have ~zero mean
    val means = transformed.data.agg(
      avg("sampleA_1").as("m1"), avg("sampleB_3").as("m2")).collect()(0)
    assert(math.abs(means.getDouble(0)) < 1e-12 && math.abs(means.getDouble(1)) < 1e-12)

    // cluster rows, labels land in metaRows with -1 fill
    val clustered = Clustering.clusterRows(transformed,
      KMeansOp(nClusters = 2, sort = false))
    val labels = clustered.metaRows.get.select("gene_stable_id", "KNN")
      .collect().map(r => r.getString(0) -> r.getAs[Number](1).intValue()).toMap
    assert(labels.size == 4 && labels.values.toSet.subsetOf(Set(0, 1)))

    // filter DSL on the transformed frame
    val strong = Filter(("sampleB_1", "|>", 0.5))(transformed.data)
    assert(strong.count() >= 1)

    // report sinks: single-file TSV + xlsx with meta sheets, then read back
    val dir = java.nio.file.Files.createTempDirectory("graft-report")
    Sinks.writeTsv(clustered.full, dir.resolve("report.tsv").toString)
    val tsv = java.nio.file.Files.readAllLines(dir.resolve("report.tsv"))
    assert(tsv.size() == 5 && tsv.get(0).contains("gene_stable_id"))
    Excel.writeExcel(clustered, dir.resolve("report.xlsx").toString, full = true)
    val back = Excel.readXlsx(spark, dir.resolve("report.xlsx").toString)
    assert(back.count() == 4)
  }
}
