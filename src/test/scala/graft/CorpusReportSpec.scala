package graft

import graft.operators.CorpusReport
import org.apache.spark.sql.functions._

/** Zipf-fit corpus diagnostics: the slope must read ≈ −1 on a corpus
  * sampled from an actual Zipf distribution and flatten on a
  * template-generated one — the discrimination the report exists for. */
class CorpusReportSpec extends SparkSpec {
  import spark.implicits._

  test("zipfReport: slope ≈ -1 on a Zipfian corpus, flat on a template corpus") {
    // deterministic Zipfian corpus: word w_r appears ~N/r times
    val n = 2000
    val words = (1 to 200).flatMap { r =>
      Seq.fill(math.max(1, n / r))(s"w$r")
    }
    val zipfDocs = words.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val z = CorpusReport.zipfReport(zipfDocs, "text", topN = 100)
      .collect()(0)
    val slope = z.getAs[Double]("zipf_slope")
    assert(math.abs(slope - (-1.0)) < 0.1, s"Zipfian slope $slope")
    assert(z.getAs[String]("top_word") == "w1")
    assert(z.getAs[Long]("n_types") == 200)

    // template corpus: every word equally frequent → slope ≈ 0
    val flatDocs = Seq.fill(100)((1 to 30).map(i => s"t$i").mkString(" ")).toDF("text")
    val f = CorpusReport.zipfReport(flatDocs, "text", topN = 100).collect()(0)
    assert(math.abs(f.getAs[Double]("zipf_slope")) < 0.01,
      s"flat slope ${f.getAs[Double]("zipf_slope")}")

    // deterministic across partitioning (decimal-exact OLS sums)
    val again = CorpusReport.zipfReport(zipfDocs.repartition(7), "text", topN = 100)
      .collect()(0)
    assert(again.getAs[Double]("zipf_slope") == slope)
  }

  test("heapsReport: sublinear beta on growing vocabulary, ~0 on a fixed-template corpus") {
    // corpus where each doc introduces new words (vocab grows like n^0.5-ish)
    val grow = (1 to 100).map { d =>
      val words = (1 to 20).map(i => s"w${(d * i * 7) % (d * 6 + 20)}")
      (d.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val g = CorpusReport.heapsReport(grow, "text", "doc_id").collect()(0)
    val beta = g.getAs[Double]("heaps_beta")
    assert(beta > 0.2 && beta < 0.95, s"growing-vocab beta $beta")
    assert(g.getAs[Double]("heaps_k") > 0)

    // fixed template: vocabulary saturates immediately -> beta ~ 0
    val flat = (1 to 100).map(d => (d.toLong, (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val f = CorpusReport.heapsReport(flat, "text", "doc_id").collect()(0)
    assert(math.abs(f.getAs[Double]("heaps_beta")) < 0.01,
      s"template beta ${f.getAs[Double]("heaps_beta")}")
    assert(f.getAs[Long]("n_types") == 20)

    // deterministic across partitioning
    val again = CorpusReport.heapsReport(grow.repartition(7), "text", "doc_id").collect()(0)
    assert(again.getAs[Double]("heaps_beta") == beta)
  }

  test("statsCube: every grouping level with the standard bitmask; null labels disambiguated") {
    import spark.implicits._
    val docs = Seq(
      (Some("en"), "a", 10L), (Some("en"), "b", 20L),
      (Some("de"), "a", 5L), (None, "a", 7L) // a NULL lang VALUE
    ).toDF("lang", "source", "n_chars")
    val got = CorpusReport.statsCube(docs, Seq("lang", "source"), "n_chars")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4))).toList
    // grouping_id 0 = (lang, source) detail rows — the null lang VALUE
    // keeps bitmask 0, distinguishing it from the aggregated-out level
    assert(got.contains((None, Some("a"), 0L, 1L, 7L)))
    assert(got.contains((Some("en"), Some("a"), 0L, 1L, 10L)))
    // grouping_id 1 = source aggregated out (per-lang)
    assert(got.contains((Some("en"), None, 1L, 2L, 30L)))
    // grouping_id 2 = lang aggregated out (per-source) — null lang rows count
    assert(got.contains((None, Some("a"), 2L, 3L, 22L)))
    // grouping_id 3 = grand total
    assert(got.contains((None, None, 3L, 4L, 42L)))
    assert(got.length == 4 + 3 + 2 + 1) // details + langs + sources + total
  }
}
