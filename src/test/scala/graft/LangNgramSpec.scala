package graft

import org.apache.spark.sql.functions._
import graft.functions.{LangNgram, TextFunctions}

/** Cavnar–Trenkle language ID: the fitted profiles are deterministic and
  * well-formed, the classifier beats the marker heuristic's accuracy
  * floors on the shared labeled fixture (100% per language, where the
  * heuristic only guarantees 90%), and it classifies short text the
  * marker lists cannot see at all. */
class LangNgramSpec extends SparkSpec {
  import spark.implicits._

  test("profiles: deterministic fit, 1-based dense ranks, saturated topK") {
    val a = LangNgram.fit()
    val b = LangNgram.fit()
    assert(a == b, "fit must be a pure function of the slices")
    assert(a.map(_._1) == LangNgram.Langs)
    a.foreach { case (lang, grams) =>
      assert(grams.length == LangNgram.TopK,
        s"$lang profile must saturate topK (grow the slice otherwise)")
      assert(grams.map(_._2) == (1 to grams.length),
        s"$lang ranks must be dense 1..k")
      assert(grams.map(_._1).distinct.length == grams.length)
      // every gram is <= NMax chars and space-padded word-internal
      grams.foreach { case (g, _) =>
        assert(g.length <= LangNgram.NMax && g.nonEmpty)
      }
    }
    // the five profiles are pairwise distinct models
    val heads = a.map(_._2.take(30).toSet)
    heads.combinations(2).foreach { case Seq(x, y) => assert(x != y) }
  }

  test("per-language accuracy on the labeled fixture: 100%") {
    val preds = LangFixture.sentences.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("id", "truth", "text")
    val got = LangNgram.classify(preds, "text", "id")
      .join(preds, Seq("id"))
      .select("truth", "lang_pred")
      .collect().map(r => r.getString(0) -> r.getString(1))
    Seq("en", "de", "es", "fr", "it").foreach { l =>
      val mine = got.filter(_._1 == l)
      val acc = mine.count(p => p._2 == p._1).toDouble / mine.size
      assert(acc == 1.0,
        s"$l accuracy $acc: ${mine.filter(p => p._2 != p._1).mkString(", ")}")
    }
    // empty text stays und; the n-gram model classifies the latin junk
    // lines to SOME language (character statistics always answer) —
    // that routing call belongs to a quality screen, not the classifier
    val und = got.filter(_._1 == "und")
    assert(und.exists(_._2 == "und"), "empty text must stay und")
  }

  test("short phrases without marker words: n-grams answer, markers cannot") {
    // none of these contains a word from the marker lists
    val shorts = Seq(
      ("de", "guten morgen liebe freunde"),
      ("es", "buenos dias queridos amigos"),
      ("fr", "bonjour mes chers amis"),
      ("it", "buongiorno cari amici"),
      ("en", "good morning dear friends"))
    val df = shorts.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("id", "truth", "text")
    val marker = df.select(col("truth"),
      TextFunctions.langId(col("text")).as("pred")).collect()
    assert(marker.count(r => r.getString(1) == "und") >= 3,
      "fixture error: these phrases should be invisible to the marker lists")
    val ct = LangNgram.classify(df, "text", "id")
      .join(df, Seq("id")).select("truth", "lang_pred").collect()
    ct.foreach(r => assert(r.getString(1) == r.getString(0),
      s"${r.getString(0)}: got ${r.getString(1)}"))
  }

  test("classification is partitioning-invariant and null-safe") {
    val base = LangFixture.sentences.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, t) }
      .toDF("id", "text")
    val a = LangNgram.classify(base, "text", "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = LangNgram.classify(base.repartition(13), "text", "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
    val withNull = Seq((1L, "the weather is cold today"), (2L, null))
      .toDF("id", "text")
    val got = LangNgram.classify(withNull, "text", "id")
      .orderBy("id").collect().map(_.getString(1))
    assert(got(0) == "en" && got(1) == "und")
  }
}
