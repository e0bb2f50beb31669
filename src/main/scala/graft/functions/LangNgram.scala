package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram language identification after Cavnar & Trenkle,
  * "N-Gram-Based Text Categorization" (SDAIR 1994): each language gets a
  * rank-ordered profile of its most frequent character 1..3-grams (words
  * space-padded, so grams carry word-boundary markers); a document is
  * profiled the same way and classified to the language minimizing the
  * out-of-place distance Σ |rank_doc − rank_lang| (grams absent from a
  * language profile pay the maximum displacement, the profile size).
  *
  * This is the replayable upgrade over the stopword-marker heuristic
  * [[TextFunctions.langId]] (which stays available as the cheap scalar
  * routing form): character statistics classify short strings and
  * morphology-heavy text where whole-word markers miss, and adding a
  * language is one reference slice, not a curated word list.
  *
  * Replayability contract (the reason everything here is deterministic):
  * the profiles are fit DRIVER-SIDE from the embedded [[ReferenceSlices]]
  * (original text written for this library) and joined as a broadcast
  * literal table, and the per-document ranking uses only engine-portable
  * orderings (count desc, gram asc — Spark's UTF8String and DuckDB both
  * compare strings as unsigned UTF-8 bytes), so the full classification
  * replays in DuckDB SQL generated from the very same profile object.
  *
  * Scale shape: ZERO shuffles — the per-doc gram count, top-K rank and
  * per-language out-of-place distance are a pure function of one row's
  * text against the ≤(langs×topK)-entry profile table riding in the
  * kernel closure, so classification is one Project over the scan. The
  * corpus text never leaves its partition.
  */
object LangNgram {

  val NMax = 3
  val TopK = 200

  /** Per-language reference text (original prose written for this library,
    * lowercase, apostrophe-free to keep the generated oracle SQL simple —
    * the fit lowercases and whitespace-splits anyway). Each slice is long
    * enough to saturate a TopK=200 profile of 1..3-grams. */
  val ReferenceSlices: Seq[(String, String)] = Seq(
    "en" -> """the quiet evening rain settled over the small town and the
      people watched from their windows while the river rose slowly under
      the old stone bridge. a young teacher walked home along the wet
      street thinking about the lesson she would give in the morning and
      the questions her students might ask about the history of their
      region. there was bread on the table and a warm light in the kitchen
      when she arrived, and her brother told her that the neighbors had
      brought apples from the orchard because the harvest this year was
      better than anyone had expected. later that night the wind turned
      cold and the first leaves of autumn fell across the garden paths
      where the children had played all summer long with their friends
      from the other side of the valley.""",
    "de" -> """der alte garten liegt hinter dem haus und die kinder spielen
      dort jeden nachmittag bis die sonne hinter den bergen verschwindet.
      im herbst sammeln die nachbarn das obst von den alten baeumen und
      bringen einen korb voller aepfel in die kueche, wo die grossmutter
      schon den teig fuer den kuchen vorbereitet hat. der lehrer geht am
      abend durch die nassen strassen der kleinen stadt und denkt an den
      unterricht vom naechsten morgen, waehrend der fluss langsam unter
      der steinernen bruecke steigt. spaeter in der nacht dreht der wind
      und die ersten blaetter des herbstes fallen auf die wege des
      gartens, auf denen die kinder den ganzen sommer mit ihren freunden
      aus dem dorf gespielt haben. niemand wusste, dass dieses jahr die
      ernte besser sein wuerde als alle erwartet hatten. man kann nicht
      immer wissen was richtig und was falsch ist, aber wer zu leicht
      aufgibt, hat schon verloren. vielleicht ist es wichtig, dass jeder
      mensch in einem solchen augenblick ruhig bleibt, nichts
      verspricht und nicht zu schnell spricht.""",
    "es" -> """la lluvia tranquila de la tarde cayo sobre el pequeno pueblo
      y la gente miraba desde sus ventanas mientras el rio subia despacio
      bajo el viejo puente de piedra. una maestra joven caminaba a casa
      por la calle mojada pensando en la leccion que daria por la manana
      y en las preguntas que sus alumnos harian sobre la historia de su
      region. habia pan en la mesa y una luz calida en la cocina cuando
      llego, y su hermano le dijo que los vecinos habian traido manzanas
      del huerto porque la cosecha de este ano era mejor de lo que nadie
      esperaba. mas tarde esa noche el viento se volvio frio y las
      primeras hojas del otono cayeron sobre los caminos del jardin donde
      los ninos habian jugado todo el verano con sus amigos del otro lado
      del valle. este tipo de problema lleva mucho tiempo y es mejor
      pensarlo bien, porque casi todo se puede resolver como es debido
      cuando hay tiempo y ganas de hacerlo.""",
    "fr" -> """la pluie calme du soir est tombee sur la petite ville et les
      gens regardaient depuis leurs fenetres pendant que la riviere
      montait lentement sous le vieux pont de pierre. une jeune
      institutrice rentrait chez elle par la rue mouillee en pensant a la
      lecon du lendemain matin et aux questions que ses eleves poseraient
      sur l histoire de leur region. il y avait du pain sur la table et
      une lumiere chaude dans la cuisine quand elle est arrivee, et son
      frere lui a dit que les voisins avaient apporte des pommes du
      verger parce que la recolte de cette annee etait meilleure que
      personne ne l avait espere. plus tard dans la nuit le vent est
      devenu froid et les premieres feuilles de l automne sont tombees
      sur les chemins du jardin ou les enfants avaient joue tout l ete
      avec leurs amis de l autre cote de la vallee.""",
    "it" -> """la pioggia tranquilla della sera e caduta sul piccolo paese
      e la gente guardava dalle finestre mentre il fiume saliva lentamente
      sotto il vecchio ponte di pietra. una giovane maestra tornava a casa
      lungo la strada bagnata pensando alla lezione che avrebbe dato la
      mattina e alle domande che i suoi alunni avrebbero fatto sulla
      storia della loro regione. c era del pane sulla tavola e una luce
      calda in cucina quando e arrivata, e suo fratello le ha detto che i
      vicini avevano portato delle mele dal frutteto perche il raccolto
      di questo anno era migliore di quanto nessuno si aspettasse. piu
      tardi quella notte il vento e diventato freddo e le prime foglie
      dell autunno sono cadute sui sentieri del giardino dove i bambini
      avevano giocato tutta la estate con i loro amici dell altro lato
      della valle.""")

  /** Languages in profile (tie-break) order. */
  val Langs: Seq[String] = ReferenceSlices.map(_._1)

  /** Character 1..nMax-grams of one lowercase word, space-padded — the
    * gram universe shared bit-for-bit by the fit, the Spark expression
    * and the generated oracle SQL. */
  private def wordGrams(w: String, nMax: Int): Seq[String] = {
    val p = " " + w + " "
    for (n <- 1 to nMax; i <- 0 to p.length - n) yield p.substring(i, i + n)
  }

  /** Rank profile per language: the topK grams by (count desc, gram asc
    * in UTF-8 byte order — the same portable ordering the engines use),
    * rank 1-based. Pure function of the slices: fit once, embed
    * everywhere. */
  def fit(slices: Seq[(String, String)] = ReferenceSlices,
      nMax: Int = NMax, topK: Int = TopK): Seq[(String, Seq[(String, Int)])] =
    slices.map { case (lang, text) =>
      val counts = scala.collection.mutable.Map.empty[String, Int]
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { w =>
        wordGrams(w, nMax).foreach(g => counts(g) = counts.getOrElse(g, 0) + 1)
      }
      val ranked = counts.toSeq.sortWith { case ((g1, c1), (g2, c2)) =>
        if (c1 != c2) c1 > c2 else utf8Less(g1, g2)
      }.take(topK)
      lang -> ranked.zipWithIndex.map { case ((g, _), ix) => (g, ix + 1) }
    }

  /** UTF-8 unsigned-byte string ordering — what Spark's UTF8String and
    * DuckDB's binary collation both implement (Java's String.compareTo
    * differs on supplementary-plane characters). */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The embedded model: fit of the reference slices. */
  lazy val Profiles: Seq[(String, Seq[(String, Int)])] = fit()

  /** All 1..nMax-grams of a text column as one array (per word:
    * space-padded substrings), the expression twin of [[wordGrams]]. */
  def gramsExpr(c: Column, nMax: Int = NMax): Column = {
    val words = filter(split(lower(c), " "), w => w =!= "")
    flatten(transform(words, w => {
      val padded = concat(lit(" "), w, lit(" "))
      flatten(transform(sequence(lit(1), lit(nMax)), n =>
        transform(sequence(lit(1), length(padded) - n + lit(1)),
          i => padded.substr(i, n))))
    }))
  }

  /** Classify every row: returns (<idCol>, lang_pred), "und" for rows
    * whose text yields no grams (null/empty/whitespace-only).
    *
    * MAP-SIDE: the per-doc gram count, the top-`topK` rank under the
    * portable (count desc, gram asc UTF-8-byte) order, and the
    * out-of-place distance against every ≤(langs×topK)-entry profile
    * are a pure function of ONE row's text, so the whole classification
    * runs as a single row-local kernel with the profiles in the closure
    * (the [[TextFunctions.gopherRepetitionStats]] pattern) — zero
    * shuffles, zero generated gram table. The round-12 form exploded
    * every gram of every doc (~5× corpus bytes) and shuffled it twice
    * for groupBy + rank windows; at corpus scale that shuffles hundreds
    * of TB for zero algorithmic benefit. The output contract (and the
    * step-for-step DuckDB oracle replay) is unchanged. */
  def classify(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", nMax: Int = NMax, topK: Int = TopK): DataFrame = {
    // language -> gram -> rank, in profile (tie-break) order; built
    // once on the driver, broadcast inside the UDF closure
    val profs: Array[(String, java.util.HashMap[String, Int])] =
      Profiles.map { case (l, gs) =>
        val m = new java.util.HashMap[String, Int](gs.length * 2)
        gs.foreach { case (g, r) => m.put(g, r) }
        (l, m)
      }.toArray
    val kernel = udf { (lowered: String) =>
      if (lowered == null) "und"
      else {
        // gram counts of the space-padded words — the identical gram
        // universe gramsExpr/wordGrams/the SQL replay enumerate
        val counts = new java.util.HashMap[String, Int]()
        val words = lowered.split(" ", -1)
        var wi = 0
        while (wi < words.length) {
          val w = words(wi)
          if (w.nonEmpty) {
            val p = " " + w + " "
            var n = 1
            while (n <= nMax) {
              var i = 0
              val last = p.length - n
              while (i <= last) {
                counts.merge(p.substring(i, i + n), 1, (a, b) => a + b)
                i += 1
              }
              n += 1
            }
          }
          wi += 1
        }
        if (counts.isEmpty) "und"
        else {
          // top-K by (count desc, gram asc in UTF-8 byte order) — the
          // same portable total order the SQL replay ranks with
          val entries = new Array[java.util.Map.Entry[String, Int]](counts.size)
          counts.entrySet().toArray(entries)
          java.util.Arrays.sort(entries,
            new java.util.Comparator[java.util.Map.Entry[String, Int]] {
              def compare(a: java.util.Map.Entry[String, Int],
                  b: java.util.Map.Entry[String, Int]): Int = {
                val c = Integer.compare(b.getValue, a.getValue)
                if (c != 0) c
                else if (utf8Less(a.getKey, b.getKey)) -1
                else if (utf8Less(b.getKey, a.getKey)) 1
                else 0
              }
            })
          val nTop = math.min(topK, entries.length)
          // out-of-place distance per language; unseen grams pay the
          // max displacement topK; winner = min distance, ties to
          // profile order (strict < keeps the earlier index)
          var bestIx = 0
          var bestD = Long.MaxValue
          var li = 0
          while (li < profs.length) {
            val pm = profs(li)._2
            var d = 0L
            var r = 0
            while (r < nTop) {
              val pr = pm.get(entries(r).getKey)
              d += (if (pr == 0 && !pm.containsKey(entries(r).getKey)) topK.toLong
                    else math.abs((r + 1).toLong - pr))
              r += 1
            }
            if (d < bestD) { bestD = d; bestIx = li }
            li += 1
          }
          profs(bestIx)._1
        }
      }
    }
    // one Project over the scan: lower() stays a builtin column op so
    // casing is bit-identical to the round-12 form and the oracle
    df.select(col(idCol), kernel(lower(col(textCol))).as("lang_pred"))
  }
}
