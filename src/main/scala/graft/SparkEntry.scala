package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}
import graft.operators._
import graft.functions.BhFdr
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is demonstrated by a
  * `queries` entry over the harness test tables; where the semantics are
  * ANSI-SQL-expressible, `oracleSql` holds the equivalent DuckDB SQL.
  *
  * Determinism rules for oracle parity (doubles hash-compare exactly):
  *  - aggregate sums of decimal-valued doubles go through exact decimal
  *    summation ([[Tables.dsum]]) — order-independent;
  *  - count matrices aggregate integer-valued doubles — exact in IEEE;
  *  - derived columns use only +,-,*,/ ,sqrt, comparisons (IEEE-exact given
  *    identical expression trees) — no transcendentals, no engine `round`;
  *    where a pipeline is irreducibly transcendental (TMM's log2), BOTH
  *    sides round to 4 decimals and the query comment argues why the
  *    cross-engine error is orders of magnitude inside the bucket;
  *  - every computed column is aliased identically on both sides;
  *  - every query ends in a total-order `orderBy`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** The wide "genes × samples"-shaped count matrix used to demonstrate the
    * reference's matrix operators on harness data: rows = l_partkey, value
    * columns = per-returnflag lineitem counts. */
  private def countMatrix(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).groupBy(col("l_partkey"))
      .agg(
        sum(when(col("l_returnflag") === "A", 1).otherwise(0)).cast("double").as("rf_a"),
        sum(when(col("l_returnflag") === "N", 1).otherwise(0)).cast("double").as("rf_n"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("double").as("rf_r"))

  /** Count matrix with three pseudo-replicates per returnflag condition
    * (replicate id = l_linenumber mod 3) for the differential operators. */
  /** The crawl-pipeline fixture synthesis shared by q_crawl_pipeline and
    * q_warc_pipeline: per-doc robots.txt body, crawl URL and raw HTML
    * page (doc_id-keyed arithmetic so the DuckDB oracle re-derives all
    * three without reading any file). */
  private def crawlRobots: Column = {
    val m = pmod(col("doc_id"), lit(6))
    when(m === 0, lit(
        "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\nAllow: /\n"))
      .when(m === 1, lit("User-agent: *\nDisallow: /private\n"))
      .when(m === 2, lit("User-agent: *\nAllow: /page\nDisallow: /\n"))
      .when(m.isin(3, 4), lit("User-agent: *\nDisallow: /*.gif$\n"))
      .otherwise(lit(""))
  }

  private def crawlUrl: Column = {
    val m = pmod(col("doc_id"), lit(6))
    when(m === 0, lit("https://ex.com/anything"))
      .when(m === 1, lit("https://ex.com/private/p1"))
      .when(m === 2, lit("https://ex.com/page"))
      .when(m === 3, lit("https://ex.com/img/a.gif"))
      .when(m === 4, lit("https://ex.com/img/a.gifx"))
      .otherwise(lit("https://ex.com/open"))
  }

  private def crawlPage: Column = {
    // the dirty tail rides the PROSE line so the hygiene stage's work
    // survives the boilerplate strip; the CRLF opens a short debris
    // line that dies there (everything \u-escaped: plain-text source)
    val dirty = concat(col("text"),
      lit(" cafe\u0301 \u200Bzero\u200Dwidth \u0007bell"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit(" A\u030A"))
        .otherwise(lit(" \u00C5")),
      lit("\r\nshort tail"))
    concat(
      lit("<html><head><title>Doc "), col("doc_id"),
      lit("</title><style type=\"text/css\">body { margin: 0 }</style>" +
        "<script>var a = \"<p>hidden</p>\";</script></head>" +
        "<body><!-- nav\nblock --><h1>Heading "), col("doc_id"),
      lit("</h1><p>"), dirty,
      lit("</p><div>5 &lt; 6 &amp; it&#39;s&nbsp;\"ok&quot;</div>" +
        "</body></html>"))
  }

  private def replicateMatrix(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
    val aggs = for (rf <- Seq("A", "N", "R"); rep <- 0 to 2) yield
      sum(when(col("l_returnflag") === rf && pmod(col("l_linenumber"), lit(3)) === rep, 1)
        .otherwise(0)).cast("double").as(s"${rf.toLowerCase}_$rep")
    li.groupBy(col("l_partkey")).agg(aggs.head, aggs.tail: _*)
  }

  /** documents ∪ synthetic snippets for the containment gates: every
    * doc_id % 7 == 0 doc contributes its first ⌈w/3⌉ NORMALIZED tokens
    * as a new doc at id + 1000000 — a guaranteed tau-contained excerpt
    * whose symmetric Jaccard (≈ 1/3) no symmetric dedup cut would
    * catch. Token arithmetic is integer-exact and replayed verbatim by
    * the oracle CTEs (floor((w+2)/3) = ⌈w/3⌉). */
  private def containmentBase(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).where(col("text").isNotNull).select("doc_id", "text")

  private def containmentSnippets(base: DataFrame): DataFrame = {
    import graft.functions.TextFunctions._
    val toks = tokens(normalizeText(col("text")))
    base.where(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ",
          slice(toks, lit(1), floor((size(toks) + lit(2)) / 3).cast("int"))).as("text"))
  }

  private def containmentCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = containmentBase(s, dir)
    base.unionByName(containmentSnippets(base))
  }

  /** Link-graph fixture for the PageRank gates: nodes = customers
    * (c_custkey is dense 0..n-1, spec-checked), every non-dangling node
    * (c % 13 != 0) links to two modular targets, and 3-in-10 of them
    * also link to the hub node 0. Self-loops/duplicates are dropped by
    * the operator; the oracle re-derives the identical edge set in SQL
    * (n via scalar-subquery COUNT). */
  private def linkGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = customer(s, dir).select(col("c_custkey").cast("long").as("c"))
    val n = c.count()
    val out = c.where(pmod(col("c"), lit(13)) =!= 0)
    val e1 = out.select(col("c").as("src"), pmod(col("c") * 31 + 7, lit(n)).as("dst"))
    val e2 = out.select(col("c").as("src"), pmod(col("c") * 17 + 3, lit(n)).as("dst"))
    val e3 = out.where(pmod(col("c"), lit(10)) < 3)
      .select(col("c").as("src"), lit(0L).as("dst"))
    (c, e1.unionByName(e2).unionByName(e3))
  }

  /** Interval fixtures for the overlap-join gates: deterministic
    * non-negative [start, end) spans on a 100k coordinate domain,
    * integer-derived so the oracle re-creates them verbatim. Left =
    * one span per order (l_linenumber = 1), right = one span per
    * part. */
  private def intervalFixtureLeft(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir).where(col("l_linenumber") === 1)
      .select(
        col("l_orderkey").as("li_id"),
        pmod(col("l_orderkey") * 37 + col("l_partkey"), lit(100000L)).as("ls"),
        (pmod(col("l_orderkey") * 37 + col("l_partkey"), lit(100000L)) + 1 +
          pmod(col("l_quantity").cast("long") * 13, lit(200L))).as("le"))

  private def intervalFixtureRight(s: SparkSession, dir: String): DataFrame =
    part(s, dir).select(
      col("p_partkey").as("r_id"),
      pmod(col("p_partkey") * 53, lit(100000L)).as("rs"),
      (pmod(col("p_partkey") * 53, lit(100000L)) + 1 +
        pmod(col("p_partkey") * 7, lit(300L))).as("re"))

  /** Scored-frame fixture for the classifier-eval gates: score =
    * ((doc_id·37 + 11) mod 1000) / 1000.0 (one integer-to-double
    * division — bit-identical cross-engine), label = [doc_id mod 3
    * == 0]. */
  private def evalScored(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      (pmod(col("doc_id") * 37 + 11, lit(1000)).cast("double") / 1000.0)
        .as("score"),
      when(pmod(col("doc_id"), lit(3)) === 0, 1).otherwise(0).as("label"))

  /** DuckDB replay of [[graft.operators.Graph.pageRank]] over the
    * [[linkGraph]] fixture: the 8 power iterations UNROLLED as chained
    * CTEs (standard SQL forbids aggregation in a recursive term; the
    * multiply-referenced CTEs are MATERIALIZED to stop re-inlining),
    * every step in the same BIGINT floor-division arithmetic the
    * operator uses — bit-exact, no float tolerance anywhere. */
  private def pageRankOracleSql(seeded: Boolean): String = {
    val scale = graft.operators.Graph.DefaultScale
    val telWhere = if (seeded) " WHERE node % 17 = 0" else ""
    val sb = new StringBuilder
    sb ++= s"""WITH cnt AS (SELECT COUNT(*)::BIGINT AS n FROM customer),
      |nd AS (SELECT c_custkey::BIGINT AS node FROM customer),
      |tel AS (SELECT node FROM nd$telWhere),
      |tc AS (SELECT COUNT(*)::BIGINT AS t FROM tel),
      |raw AS (
      |  SELECT c_custkey::BIGINT AS src,
      |         (c_custkey * 31 + 7) % (SELECT n FROM cnt) AS dst
      |    FROM customer WHERE c_custkey % 13 <> 0
      |  UNION
      |  SELECT c_custkey::BIGINT, (c_custkey * 17 + 3) % (SELECT n FROM cnt)
      |    FROM customer WHERE c_custkey % 13 <> 0
      |  UNION
      |  SELECT c_custkey::BIGINT, 0 FROM customer
      |    WHERE c_custkey % 13 <> 0 AND c_custkey % 10 < 3),
      |e AS MATERIALIZED (SELECT src, dst::BIGINT AS dst FROM raw WHERE src <> dst),
      |od AS MATERIALIZED (SELECT nd.node, COALESCE(d.cdeg, 0)::BIGINT AS outdeg,
      |         (CASE WHEN tel.node IS NULL THEN 0 ELSE 1 END)::BIGINT AS t
      |       FROM nd
      |       LEFT JOIN (SELECT src, COUNT(*) AS cdeg FROM e GROUP BY src) d
      |         ON d.src = nd.node
      |       LEFT JOIN tel ON tel.node = nd.node),
      |r0 AS MATERIALIZED (SELECT node, outdeg, t,
      |         (CASE WHEN t = 1 THEN $scale // (SELECT t FROM tc)
      |               ELSE 0 END)::BIGINT AS r
      |       FROM od),
      |""".stripMargin
    for (k <- 1 to 8) {
      val p = s"r${k - 1}"
      sb ++= s"""d$k AS (SELECT COALESCE(SUM(r), 0)::BIGINT AS dang
        |       FROM $p WHERE outdeg = 0),
        |c$k AS (SELECT e.dst AS node, SUM(p.r // p.outdeg)::BIGINT AS s
        |       FROM $p p JOIN e ON e.src = p.node
        |       WHERE p.outdeg > 0 GROUP BY e.dst),
        |r$k AS MATERIALIZED (SELECT o.node, o.outdeg, o.t,
        |         (((15 * $scale) // (100 * (SELECT t FROM tc))) * o.t
        |          + (85 * (COALESCE(c.s, 0)
        |               + ((SELECT dang FROM d$k) // (SELECT t FROM tc)) * o.t)) // 100
        |         )::BIGINT AS r
        |       FROM od o LEFT JOIN c$k c ON c.node = o.node)""".stripMargin
      sb ++= (if (k < 8) ",\n" else "\n")
    }
    sb ++= "SELECT node, r AS rank_micro FROM r8 ORDER BY rank_micro DESC, node"
    sb.toString
  }

  private val CountMatrixSql =
    """SELECT l_partkey,
      |  CAST(SUM(CASE WHEN l_returnflag='A' THEN 1 ELSE 0 END) AS DOUBLE) AS rf_a,
      |  CAST(SUM(CASE WHEN l_returnflag='N' THEN 1 ELSE 0 END) AS DOUBLE) AS rf_n,
      |  CAST(SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS DOUBLE) AS rf_r
      |FROM lineitem GROUP BY l_partkey""".stripMargin

  /** Parquet side table emitted for a partial oracle (the embedded-
    * constants pattern generalized beyond what fits in SQL literals):
    * the query writes its fitted per-row internals here and the oracle
    * SQL reads them back with read_parquet. The path is keyed by the sf
    * dir basename so a bench run at another sf cannot clobber the
    * sf0.01 table the correctness gate reads. */
  private def writeOracleSide(df: DataFrame, dir: String, name: String): Unit =
    // Bench sets this property: the side table is oracle BOOKKEEPING, and
    // a parquet write inside the timed region bills the test harness as
    // query time (r6: q_deseq2_lrt read 2.1× its real cost). Verify never
    // sets it, so the correctness gate always gets fresh side tables.
    if (!sys.props.get("graft.bench.skipOracleSide").exists(_.toBoolean))
      df.coalesce(1).write.mode("overwrite")
        .parquet(s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/$name")

  /** The gate-sf side-table path the oracle SQL embeds (the driver's
    * DuckDB compare runs at sf0.01). Verify.scala substitutes the actual
    * run-dir basename for `sf0.01` when it dumps oracle_sql.json, so an
    * oracle run at any sf reads the side files that run wrote. */
  private def oracleSidePath(name: String): String =
    s"/root/repo/data/oracle_side/sf0.01/$name/*.parquet"

  /** q_mixture_select's target composition (50/20/20/10 en/es/de/fr;
    * zh deliberately unweighted → dropped, exercising the "a mix is a
    * contract" semantics). The oracle SQL embeds these same literals
    * and re-derives every threshold from the observed counts, so the
    * weights live here once, next to the SQL that mirrors them. */
  private val MixtureWeights: Map[String, Double] =
    Map("en" -> 0.5, "es" -> 0.2, "de" -> 0.2, "fr" -> 0.1)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1-family vertical aggregation over a scan (S1/P1) ----
    "q1_agg" -> ((s, dir) => {
      val li = lineitem(s, dir)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) - dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- F1 filter DSL: thresholds + k-of-n quantifier + isin (F1a-F1e) ----
    "q_filter_dsl" -> ((s, dir) => {
      val f = Filter(
        ("l_quantity", ">", 30),
        (Seq("l_discount", "l_tax"), "2>=", 0.02),
        ("l_returnflag", "in", Seq("A", "R")))
      f(lineitem(s, dir))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_returnflag")
    }),

    // ---- F2 filter algebra: (f1 | f2) & f3 (filter.py:141-162) ----
    "q_filter_algebra" -> ((s, dir) => {
      val f = (Filter(("l_quantity", ">=", 49.0)) | Filter(("l_discount", "|>", 0.09))) &
        Filter(("l_returnflag", "in", Seq("N")))
      f(lineitem(s, dir))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    }),

    // ---- O1 multi-key sort DSL + top-k (mdataframe.py:319-487) ----
    "q_sort_topk" -> ((s, dir) => {
      val sorter = SortDsl.transformer(
        Seq("l_quantity", "l_extendedprice", "l_orderkey", "l_linenumber"),
        Seq(false, false, true, true))
      sorter(lineitem(s, dir))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .limit(100)
    }),

    // ---- E1 elementwise transform chain (mdataframe.py:489-676) ----
    // ---- O1 computed sort keys (the reference's callable keys,
    //      mdataframe.py:339-348): a (name, Column) DSL entry sorts by a
    //      derived expression that never materializes outside the plan.
    //      Two steps — the later computed-revenue step dominates, the
    //      earlier (l_orderkey, l_linenumber) step becomes the tiebreak,
    //      exercising the reference's last-sort-wins chaining. Per-row
    //      double products are IEEE-exact, so no rounding is needed. ----
    "q_sort_computed" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("double") *
        (lit(1.0) - col("l_discount").cast("double"))
      val steps = SortDsl.parse(Seq(
        Seq("l_orderkey", "l_linenumber"), true,
        ("revenue", rev), false))
      SortDsl.sortRows(lineitem(s, dir), steps)
        .select(col("l_orderkey"), col("l_linenumber"), rev.as("revenue"))
        .limit(100)
    }),

    "q_elementwise" -> ((s, dir) => {
      val base = lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_discount") - lit(0.05)).as("disc_centered"),
        col("l_quantity").as("qty_clip"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      val keys = Seq("l_orderkey", "l_linenumber")
      val chain = Elementwise("abs", protect = keys ++ Seq("qty_clip", "unit_price"))
        .andThen(Elementwise("clip", Seq(10.0, 40.0), protect = keys ++ Seq("disc_centered", "unit_price")))
      chain(base).orderBy("l_orderkey", "l_linenumber", "disc_centered", "qty_clip", "unit_price")
    }),

    // ---- A4 fixed impute (ImputeFixed, mdataframe.py:90-103) ----
    "q_impute_fixed" -> ((s, dir) => {
      val base = lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_tax") === 0.0, lit(null)).otherwise(col("l_tax")).as("tax_n"))
      ImputeFixed(replacementValue = -1.0, protect = Seq("l_orderkey", "l_linenumber"))(base)
        .orderBy("l_orderkey", "l_linenumber", "tax_n")
    }),

    // ---- A5 mean impute (ImputeStrategy, mdataframe.py:106-124) ----
    "q_impute_mean" -> ((s, dir) => {
      val base = lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_tax") === 0.0, lit(null)).otherwise(col("l_tax")).as("tax_n"))
      ImputeStrategy("mean", protect = Seq("l_orderkey", "l_linenumber"))(base)
        .orderBy("l_orderkey", "l_linenumber", "tax_n")
    }),

    // ---- A5 mode impute (single-pass distributed mode; ties pick the
    //      smallest value — mirrored by the oracle's min-over-argmax) ----
    "q_impute_mode" -> ((s, dir) => {
      val base = lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") >= 49.0, lit(null)).otherwise(col("l_quantity")).as("qty_n"))
      ImputeStrategy("most_frequent", protect = Seq("l_orderkey", "l_linenumber"))(base)
        .orderBy("l_orderkey", "l_linenumber", "qty_n")
    }),

    // ---- A5 median impute ----
    "q_impute_median" -> ((s, dir) => {
      val base = lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_tax") === 0.0, lit(null)).otherwise(col("l_tax")).as("tax_n"))
      ImputeStrategy("median", protect = Seq("l_orderkey", "l_linenumber"))(base)
        .orderBy("l_orderkey", "l_linenumber", "tax_n")
    }),

    // ---- A2 z-score per column, ddof=1 (ZScaler, mdataframe.py:146-157) ----
    "q_zscale_matrix" -> ((s, dir) =>
      ZScale(axis = 0, ddof = 1, protect = Seq("l_partkey"))(countMatrix(s, dir))
        .orderBy("l_partkey")),

    // ---- J3 FromFile/FromTable broadcast annotation join ----
    "q_annotate_join" -> ((s, dir) => {
      val annotated = FromTable(part(s, dir), Seq("p_brand", "p_retailprice"),
        indexColumnTarget = "l_partkey", indexColumnTable = "p_partkey")(lineitem(s, dir))
      annotated.select("l_orderkey", "l_linenumber", "l_partkey", "p_brand", "p_retailprice")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    }),

    // ---- J1/J5 star-schema joins + aggregation ----
    "q_star_join" -> ((s, dir) => {
      val c = customer(s, dir); val n = nation(s, dir); val r = region(s, dir)
      val o = orders(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("r_name")
    }),

    // ---- skew tooling, oracle-checked: the salted equi-join must be
    //      RESULT-IDENTICAL to the plain join (salting only changes the
    //      shuffle layout), and the two-phase distinct must equal
    //      COUNT(DISTINCT ...) ----
    "q_skew_join" -> ((s, dir) => {
      val li = lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      val sup = supplier(s, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      graft.operators.Skew.saltedJoin(li, sup, Seq("l_suppkey"), saltFactor = 8)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_skew_distinct" -> ((s, dir) =>
      graft.operators.Skew.distinctCountSalted(
        lineitem(s, dir), "l_orderkey", "l_suppkey")
        .orderBy("l_orderkey")),

    // ---- sink round-trips, oracle-checked through an INDEPENDENT
    //      parser: the query writes the documents through our
    //      single-file JSONL / TSV sink and reads its own file back;
    //      the oracle hands the same file to DuckDB's read_json /
    //      read_csv. A sink that emitted nonstandard escaping would
    //      round-trip consistently in Spark and still fail the gate.
    //      NOTE: the sink write runs eagerly at query-CONSTRUCTION time
    //      (deliberate — the write IS the operator under test, so Bench
    //      times it with the read-back), and the file path derives from
    //      the run dir; Verify substitutes the same dir into the oracle
    //      SQL so both sides always read this run's file. ----
    "q_jsonl_roundtrip" -> ((s, dir) => {
      val d = documents(s, dir).select("doc_id", "lang", "source", "text")
      val f = new java.io.File(
        s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/jsonl_documents.jsonl")
      f.getParentFile.mkdirs()
      graft.sources.Jsonl.write(d, f.getPath)
      graft.sources.Jsonl.read(s, f.getPath, d.schema).orderBy("doc_id")
    }),

    // ---- ORC round-trip (the other columnar interchange format a
    //      migrating user ships; Spark-native ORC writer/reader, zstd):
    //      hash equality against the parquet-derived oracle == the
    //      write → read cycle is lossless for every row and type. ----
    "q_orc_roundtrip" -> ((s, dir) => {
      val d = documents(s, dir).select("doc_id", "lang", "source", "text")
      val f = new java.io.File(
        s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/orc_documents.orc")
      f.getParentFile.mkdirs()
      d.write.mode("overwrite").option("compression", "zstd").orc(f.getPath)
      s.read.schema(d.schema).orc(f.getPath).orderBy("doc_id")
    }),

    "q_tsv_roundtrip" -> ((s, dir) => {
      val d = documents(s, dir).select("doc_id", "lang", "source", "text")
      val f = new java.io.File(
        s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/tsv_documents.tsv")
      f.getParentFile.mkdirs()
      graft.sources.Sinks.writeTsv(d, f.getPath)
      s.read.option("sep", "\t").option("header", "true")
        .schema(d.schema).csv(f.getPath).orderBy("doc_id")
    }),

    // ---- S7 Excel sink + S5 xlsx scan round-trip, oracle-checked
    //      through the sink's own file: a report-shaped aggregate (the
    //      reference's Excel surface is driver-side gene reports) is
    //      written with writeXlsx, re-read with readXlsx (StAX parse +
    //      pandas-style numeric inference → DoubleType), and the oracle
    //      recomputes the same aggregate from parquet. Byte lengths via
    //      UTF-8 encode on both sides (char-count semantics differ
    //      across engines for non-BMP text; byte counts cannot). ----
    "q_excel_roundtrip" -> ((s, dir) => {
      val report = documents(s, dir)
        .groupBy("lang", "source")
        .agg(count(lit(1)).cast("double").as("n_docs"),
          sum(length(encode(col("text"), "UTF-8")).cast("long")).cast("double").as("n_bytes"))
      val f = new java.io.File(
        s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/excel_report.xlsx")
      f.getParentFile.mkdirs()
      graft.sources.Excel.writeXlsx(f.getPath, Seq("report" -> report))
      graft.sources.Excel.readXlsx(s, f.getPath)
        .orderBy("lang", "source")
    }),

    // ---- WARC source (sources/Warc.scala), oracle-checked end-to-end:
    //      the documents table is serialized DETERMINISTICALLY into
    //      member-per-file .warc.gz shards (one response record per doc;
    //      uri/date/mime derived from doc_id/lang, payload = UTF-8 text),
    //      executor-side per partition — no driver collect. Warc.read
    //      then parses the shards back and the oracle re-derives every
    //      header field plus the byte-exact payload length from the
    //      parquet originals: a parser that mis-split a header, dropped
    //      a record, or truncated a payload hash-mismatches. ----
    "q_warc" -> ((s, dir) => {
      import graft.sources.Warc
      val outDir = new java.io.File(
        s"/root/repo/data/warc_fixture/${new java.io.File(dir).getName}")
      outDir.mkdirs()
      Option(outDir.listFiles()).foreach(_.foreach(_.delete()))
      val base = outDir.getPath
      documents(s, dir).select("doc_id", "lang", "text")
        .repartition(8, col("doc_id"))
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          val recs = it.map { r =>
            val id = r.getLong(0)
            ("response", s"http://corpus.local/doc/$id",
              java.time.Instant.ofEpochSecond(1704067200L + id).toString,
              s"text/plain; lang=${r.getString(1)}",
              r.getString(2).getBytes("UTF-8"))
          }.toSeq
          if (recs.nonEmpty) {
            val gz = new java.util.zip.GZIPOutputStream(
              new java.io.FileOutputStream(new java.io.File(base, f"part_$pid%05d.warc.gz")))
            gz.write(Warc.recordBytes(recs)); gz.close()
          }
          Iterator.single(1)
        }.count()
      Warc.read(s, s"$base/*.warc.gz")
        .select(
          regexp_extract(col("target_uri"), "([0-9]+)$", 1).cast("long").as("doc_id"),
          col("warc_type"), col("target_uri"), col("date"),
          col("content_type"), col("content_length"),
          decode(col("payload"), "UTF-8").as("text"))
        .orderBy("doc_id")
    }),

    // ---- U1 set operations on keyed projections ----
    "q_setops" -> ((s, dir) => {
      val li = lineitem(s, dir)
      def keys(flag: String) = li.filter(col("l_returnflag") === flag).select("l_orderkey")
      keys("R").intersect(keys("A")).except(keys("N")).orderBy("l_orderkey")
    }),

    // ---- W2 window ranks ----
    // (l_orderkey, l_linenumber) is NOT unique in the harness data, so the
    // window orders include enough columns that any remaining ties are
    // complete-duplicate output rows (multiset-deterministic).
    "q_window_rank" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val byOrder = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      val byQty = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_quantity").desc, col("l_linenumber"))
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(byOrder))
        .withColumn("qty_rank", rank().over(byQty))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // ---- A8 CPM normalization (exact, oracle-checked) ----
    "q_cpm" -> ((s, dir) => {
      val m = countMatrix(s, dir)
      val cols = Seq("rf_a", "rf_n", "rf_r")
      val lib = graft.functions.Normalization.libSizes(m, cols)
      graft.functions.Normalization.cpm(m, cols, lib).orderBy("l_partkey")
    }),

    // ---- A8 full TMM → log2 CPM (edgeR algorithm; rows-only check —
    //      transcendental math is not bit-reproducible across engines;
    //      conformance is pinned by NormalizationSpec golden values) ----
    // ---- A8 TMM → log2 CPM, oracle-checked: the full edgeR TMM pipeline
    //      is re-derived in DuckDB SQL (TmmOracle — exact type-7
    //      quantiles, average-rank trim, trimmed weighted mean,
    //      geometric-mean normalization, prior-scaled log-CPM). log2 is
    //      transcendental, so cross-engine doubles differ in the last
    //      bits; BOTH sides round to 4 decimals (~1e-13 relative noise
    //      vs a 1e-4 bucket). Rank-trim tie groups are exact rational
    //      equalities of count ratios — identical in both engines. ----
    "q_tmm_logcpm" -> ((s, dir) => {
      val t = graft.functions.Tmm(protect = Seq("l_partkey"))(countMatrix(s, dir))
      t.select(col("l_partkey") +:
          Seq("rf_a", "rf_n", "rf_r").map(c => round(col(c), 4).as(c)): _*)
        .orderBy("l_partkey")
    }),

    // ---- D5 NOISeq differential expression (rows-only: TMM factors and
    //      the noise distribution are not ANSI-SQL-expressible; M/D/Rank
    //      conformance is pinned by NOISeqSpec golden values) ----
    // ---- D5 NOISeq (replicate path), oracle-checked: every step —
    //      zero-replacement, the pairwise old-edgeR TMM factors (exact
    //      rank-trim, the TmmOracle pattern), normalization, per-gene
    //      M/D, the pooled within-condition noise multiset, and the
    //      strict 2-D dominance probability — is re-derived in DuckDB.
    //      The noise cap (maxNoisePoints = 500k) does not bind at the
    //      gate (6 pairs × 2000 genes = 12k points), so the oracle
    //      reproduces the FULL multiset and no hash-order subsample is
    //      involved. Prob values are exact multiples of 1/12000, which
    //      sit on round() half-boundaries — both sides canonicalize with
    //      an explicit floor(x·10⁴+0.5)/10⁴ instead of engine round()
    //      (IEEE-identical given identical inputs). ----
    "q_noiseq" -> ((s, dir) => {
      val ns = graft.stats.NOISeq("A", "R",
        Map("A" -> Seq("a_0", "a_1", "a_2"), "N" -> Seq("n_0", "n_1", "n_2"),
          "R" -> Seq("r_0", "r_1", "r_2")),
        comparisonName = Some("A_vs_R"),
        includeOtherColumnsForVariance = true,
        index = "l_partkey")
      val out = ns(replicateMatrix(s, dir))
      val r4 = (c: String) => (floor(col(c) * 10000 + 0.5) / 10000).as(c)
      out.select(col("l_partkey") +: ns.columns.map(r4): _*).orderBy("l_partkey")
    }),

    // ---- D5 NOISeqBIO (biological-replicates branch) + rpkm norm,
    //      FULL oracle: zero-replacement, rpkm scaling with the lc=1
    //      length factor (annotation synthesized from part, exercising
    //      the start/stop join), per-gene M/D and delta-method SE²s,
    //      nclust expression buckets with decimal-exact pooled
    //      variances, the a0per SE offsets, θ = (M*+D*)/2, the 8
    //      hash-capped balanced relabelings as the permutation null
    //      (NOISeq.balancedRelabelings shared with the oracle
    //      generator), 64-bin smoothed densities, central-matching p0
    //      and the empirical-Bayes local-fdr — every step re-derived in
    //      DuckDB (percentiles are exact at the gate → quantile_cont).
    //      Both sides canonicalize at 1e-4 (q_noiseq pattern). ----
    "q_noiseq_bio" -> ((s, dir) => {
      val ns = graft.stats.NOISeq("A", "R",
        Map("A" -> Seq("a_0", "a_1", "a_2"), "R" -> Seq("r_0", "r_1", "r_2")),
        comparisonName = Some("A_vs_R_bio"),
        norm = "rpkm", lc = 1, replicates = "biological",
        r = 8, bins = 64, index = "l_partkey",
        lengths = Some(part(s, dir).select(col("p_partkey").as("l_partkey"),
          ((pmod(col("p_partkey"), lit(97)).cast("double") + lit(3.0)) * lit(50.0))
            .as("length"))))
      val out = ns(replicateMatrix(s, dir))
      val r4 = (c: String) => (floor(col(c) * 10000 + 0.5) / 10000).as(c)
      out.select(col("l_partkey") +: ns.columns.map(r4): _*).orderBy("l_partkey")
    }),

    // ---- D2 DESeq2-style Wald differential expression, PARTIAL oracle
    //      (the q_kmeans embedded-constants pattern, generalized to a
    //      side table): the iterative parts — CR dispersion MLE, trend,
    //      MAP shrinkage, IRLS — emit their per-gene results (final
    //      dispersion, fitted log2 intercept + lfc) to a parquet side
    //      table; GIVEN those, everything the gate output contains is
    //      closed-form and DuckDB replays it from scratch: size factors
    //      (median-of-log-ratios), baseMean, mu = max(sf·2^Xβ, 0.5),
    //      weights μ/(1+αμ)·ln²2, the ridged 2×2 information matrix, its
    //      inverse ⇒ lfcSE, and the Wald stat. The normal-CDF p itself
    //      is not DuckDB-expressible (kernel R-golden-pinned in
    //      DESeq2Spec) so p rides in the side table — which puts p AND
    //      the BH-FDR column inside the hash: the oracle replays BH from
    //      the side-table p with the q_bh_fdr reverse-min window.
    //      Both sides round to 4 decimals (cross-engine pow/ln jitter
    //      ~1e-13 relative, orders inside the bucket). ----
    "q_deseq2_wald" -> ((s, dir) => {
      val d = graft.stats.DESeq2Unpaired("A", "R",
        Map("A" -> Seq("a_0", "a_1", "a_2"), "R" -> Seq("r_0", "r_1", "r_2")),
        comparisonName = Some("A_vs_R"),
        index = "l_partkey")
      val full = graft.core.CacheScope.retain(
        d.applyWithFit(replicateMatrix(s, dir)))
      // p rides in the side table (spec-pinned kernel — no normal CDF in
      // DuckDB), which brings p AND the BH-FDR column inside the oracle
      // hash: the oracle replays BH from the side-table p with the
      // q_bh_fdr reverse-min window (r6 VERDICT ask #5)
      writeOracleSide(full.select(col("l_partkey"),
        col("__alpha").as("alpha"), col("__beta0").as("beta0"),
        col(d.logFCColumn).as("beta1"), col(d.pColumn).as("p")),
        dir, "deseq2_wald")
      val r4 = (c: Column, n: String) => (floor(c * 10000 + 0.5) / 10000).as(n)
      val r6 = (c: Column, n: String) => (floor(c * 1e6 + 0.5) / 1e6).as(n)
      full.select(col("l_partkey"),
        r4(col(d.baseMeanColumn), d.baseMeanColumn),
        r4(col(d.logFCColumn), d.logFCColumn),
        r4(col(d.lfcSEColumn), d.lfcSEColumn),
        r4(col(d.statColumn), d.statColumn),
        r6(col(d.pColumn), d.pColumn),
        r6(col(d.fdrColumn), d.fdrColumn))
        .orderBy("l_partkey")
    }),

    // ---- A9 batch-effect removal (limma removeBatchEffect linear-model
    //      residuals; the projection matrix is data-independent, so the
    //      oracle embeds the same coefficients — see BatchEffectOracle) ----
    "q_batch_effect" -> ((s, dir) =>
      graft.functions.Normalization.removeBatchEffect(
        countMatrix(s, dir), Seq("rf_a", "rf_n", "rf_r"), BatchEffectOracle.batches)
        .orderBy("l_partkey")),

    // ---- M3 DBSCAN density clustering, oracle-checked. The query runs
    //      on the high-count shell (row sum ≥ 38), where the integer
    //      lattice fragments into 5 clusters + border + noise (the full
    //      matrix is one connected blob at any workable ε — structurally
    //      useless as a clustering demo), then relabels every cluster to
    //      its minimum member l_partkey, erasing discovery-order
    //      numbering. At (eps=1.8, minSamples=4) NO border point touches
    //      two clusters (verified exhaustively on the gate data), so the
    //      canonical labels are fully order-independent and equal the
    //      DuckDB re-derivation: core = ε-self-join degree ≥ minSamples,
    //      clusters = recursive-CTE connected components over core-core
    //      edges, borders adopt their core neighbors' cluster. Squared
    //      distances are exact integers, so ε² comparisons cannot
    //      straddle float noise. `exactOnly` pins the exact path: if a
    //      regenerated fixture ever pushes the shell (178 rows at the
    //      gate sf) past maxExactRows, the op fails loudly instead of
    //      silently switching to the approximate grid path the SQL
    //      oracle does not model. ----
    "q_dbscan" -> ((s, dir) => {
      val m = countMatrix(s, dir)
        .where(col("rf_a") + col("rf_n") + col("rf_r") >= 38)
      DbscanOp(eps = 1.8, minSamples = 4, protect = Seq("l_partkey"),
        exactOnly = true)(m)
        .withColumn("cluster",
          when(col("DBSCAN") === -1, lit(-1L))
            .otherwise(min(col("l_partkey")).over(Window.partitionBy(col("DBSCAN")))))
        .select("l_partkey", "cluster")
        .orderBy("l_partkey")
    }),

    // ---- M3 grid DBSCAN — the documented 100 TB scale path (cells
    //      bucket map-side, dense-cell union-find on the driver over
    //      ≤ n/minSamples cells), previously probe-measured only; this
    //      gate oracle-checks its SEMANTICS end-to-end. maxExactRows=100
    //      pins the grid branch (2000 gene rows > 100). The full replay:
    //      cells = floor(count/eps) per axis (eps=1.0 ⇒ integer-exact on
    //      both engines), dense = cells with ≥ minSamples points,
    //      components = recursive-CTE CC over Chebyshev-1 dense-cell
    //      adjacency with ids ranked by the component's minimal cell
    //      (numeric lexicographic — exactly the operator's union-find
    //      ordering), border points adopt the MIN adjacent component id
    //      (52 gate points touch ≥2 components, so the tie rule itself
    //      is under test), else noise −1. Raw cluster IDS are hashed,
    //      not a relabeling — numbering discipline included. ----
    "q_dbscan_grid" -> ((s, dir) =>
      DbscanOp(eps = 1.0, minSamples = 3, protect = Seq("l_partkey"),
        maxExactRows = 100)(countMatrix(s, dir))
        .select(col("l_partkey"), col("DBSCAN").cast("long").as("cluster"))
        .orderBy("l_partkey")),

    // ---- D4 DESeq2 LRT (intended semantics of the reference's broken
    //      DESeq2Timeseries), PARTIAL oracle (fitted side table, the
    //      q_deseq2_wald pattern): the side table carries the per-gene
    //      final dispersion and BOTH coefficient vectors; given them the
    //      likelihood-ratio stat is a closed-form lgamma sum (both
    //      9-sample log-likelihoods replayed term-for-term), the SE of
    //      the reported coefficient is a 3×3 ridged-information inverse,
    //      and baseMean/size factors re-derive from parquet. The upper
    //      χ² tail itself is not DuckDB-expressible (no incomplete
    //      gamma; spec-pinned via DESeq2LRTSpec χ² calibration) so p
    //      rides in the side table, putting p and the BH-FDR replay
    //      inside the hash (the q_deseq2_wald pattern). ----
    "q_deseq2_lrt" -> ((s, dir) => {
      val sampleCols = Seq("a_0", "a_1", "a_2", "n_0", "n_1", "n_2", "r_0", "r_1", "r_2")
      val l = graft.stats.DESeq2LRT(sampleCols,
        Map("condition" -> Seq("A", "A", "A", "N", "N", "N", "R", "R", "R")),
        full = Seq("condition"), reduced = Seq(),
        comparisonName = Some("cond_lrt"),
        index = "l_partkey")
      val full = graft.core.CacheScope.retain(
        l.applyWithFit(replicateMatrix(s, dir)))
      // p in the side table → p and BH-FDR inside the oracle hash (the
      // q_deseq2_wald pattern; the χ² tail itself stays spec-pinned)
      writeOracleSide(full.select(col("l_partkey"),
        col("__alpha").as("alpha"),
        col("__bf")(0).as("bf0"), col("__bf")(1).as("bf1"),
        col("__bf")(2).as("bf2"), col("__br")(0).as("br0"),
        col(l.pColumn).as("p")),
        dir, "deseq2_lrt")
      val r4 = (c: Column, n: String) => (floor(c * 10000 + 0.5) / 10000).as(n)
      val r6 = (c: Column, n: String) => (floor(c * 1e6 + 0.5) / 1e6).as(n)
      full.select(col("l_partkey"),
        r4(col(l.baseMeanColumn), l.baseMeanColumn),
        r4(col(l.logFCColumn), l.logFCColumn),
        r4(col(l.lfcSEColumn), l.lfcSEColumn),
        r4(col(l.statColumn), l.statColumn),
        r6(col(l.pColumn), l.pColumn),
        r6(col(l.fdrColumn), l.fdrColumn))
        .orderBy("l_partkey")
    }),

    // ---- A10 VST, oracle-checked via the embedded-coefficients pattern
    //      (q_batch_effect): the dispersion-trend FIT is not
    //      SQL-expressible (iterative gamma-family GLM on a sampled
    //      subset), but given the two fitted coefficients (asymptDisp,
    //      extraPois) the whole transform is closed-form per cell, and
    //      the size factors (median-of-log-ratios) are exactly
    //      re-derivable in DuckDB (quantile_cont == Spark's exact
    //      percentile). The oracle embeds AD/EP measured at the sf0.01
    //      gate (OracleFitProbe prints them; refresh after any fixture
    //      regeneration) and re-derives everything else from the parquet.
    //      Both sides round to 4 decimals (log/sqrt cross-engine jitter
    //      ~1e-13, far inside the bucket). Transform kernel additionally
    //      pinned at 1e-5 vs the R golden frame in VstSpec. ----
    "q_vst" -> ((s, dir) =>
      graft.stats.Vst(index = "l_partkey")(countMatrix(s, dir))
        .select(col("l_partkey"),
          round(col("rf_a"), 4).as("rf_a"),
          round(col("rf_n"), 4).as("rf_n"),
          round(col("rf_r"), 4).as("rf_r"))
        .orderBy("l_partkey")),

    // ---- D1 edgeR exact test, PARTIAL oracle (fitted side table, the
    //      q_deseq2_wald pattern): the iterative machinery — TMM, qCML
    //      grid dispersions, trend, empirical prior — emits per gene
    //      the rounded pseudo-count sums (s1, s2) and tagwise
    //      dispersion; GIVEN those, the exact NB double-tail p-value is
    //      a finite lgamma sum DuckDB replays term by term
    //      (EdgeR.scala exactTestDoubleTail), and BH-FDR follows in a
    //      window. logFC/logCPM (iterative one-group NB fits) stay
    //      spec-pinned (EdgeRSpec golden). Replayed branches: the gate
    //      dispersions are grid values ≥ ~1e-4 (never the Poisson
    //      limit) and pseudo sums ≪ 900 (never the beta
    //      approximation) — a fixture change crossing either boundary
    //      surfaces as a hash mismatch, not silence. Both sides round
    //      to 6 decimals (term-order jitter ~1e-14 relative). ----
    "q_edger" -> ((s, dir) => {
      val e = graft.stats.EdgeRUnpaired("A", "R",
        Map("A" -> Seq("a_0", "a_1", "a_2"), "R" -> Seq("r_0", "r_1", "r_2")),
        comparisonName = Some("A_vs_R"),
        index = "l_partkey")
      val full = graft.core.CacheScope.retain(
        e.applyWithFit(replicateMatrix(s, dir)))
      writeOracleSide(full.select(col("l_partkey"),
        col("__s1").as("s1"), col("__s2").as("s2"),
        col("__disp").as("disp")), dir, "edger")
      val r6 = (c: Column, n: String) => (floor(c * 1e6 + 0.5) / 1e6).as(n)
      full.select(col("l_partkey"),
        r6(col(e.pColumn), e.pColumn),
        r6(col(e.fdrColumn), e.fdrColumn))
        .orderBy("l_partkey")
    }),

    // ---- W1 Benjamini-Hochberg FDR ----
    "q_bh_fdr" -> ((s, dir) => {
      val t = lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (((col("l_orderkey") * 7 + col("l_linenumber") * 13) % 9973) / lit(9973.0)).as("p"))
      BhFdr.adjust(t, "p", "fdr").orderBy("l_orderkey", "l_linenumber", "p")
    }),

    // ================== training-data pipeline extensions ==================

    // ---- text analysis: token/punct/stopword stats, quality, lang-ID ----
    "q_text_stats" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      documents(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        punctCount(col("text")).as("n_punct"),
        size(filter(tokens(lower(col("text"))), t => t.isin(Stopwords: _*))).as("n_stop"),
        meanTokenLength(col("text")).as("mean_tok_len"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // ---- curation pipeline: quality/language/length filter over the
    //      text metrics (oracle: same generated SQL as q_text_stats with
    //      a WHERE) ----
    "q_text_curation" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      documents(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred"))
        .where(evalHere(col("quality") >= 0.5 && col("lang_pred") === "en" &&
          col("n_tokens").between(10, 1000)))
        .orderBy("doc_id")
    }),

    // ---- chained dedup pass: exact fingerprint dedup, then MinHash-LSH
    //      near-dup removal over the survivors (rows-only; stage
    //      semantics pinned by DedupSpec) ----
    "q_dedup_pipeline" -> ((s, dir) => {
      val d = documents(s, dir)
      val afterExact = Dedup.exactDedup(d, "text", "doc_id")
      // 16×8 banding matched to the 0.8 verify threshold — see
      // q_dedup_minhash; shallower bands generate quadratic candidates
      Dedup.minHashLshDedup(afterExact, "text", "doc_id",
        shingleK = 5, bands = 16, rowsPerBand = 8, jaccardThreshold = 0.8)
        .select("doc_id").orderBy("doc_id")
    }),

    // ---- exact dedup groups by MD5 content fingerprint ----
    // ---- video frame sampling, oracle-checked: synthesize a GVID
    //      container of REAL PNG frames per doc (id-derived count/dims),
    //      parse + frame-sample + decode in one mapPartitions pass; the
    //      oracle recomputes sampled indices and dimensions
    //      arithmetically, so container-layout or sampling bugs break
    //      the hash ----
    "q_multimodal_frames" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"),
        (pmod(col("doc_id"), lit(7)) + 1).cast("int").as("w"),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int").as("h"),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int").as("nf"))
      val vid = Multimodal.deriveMany(d, Seq("video" -> BinaryType)) { row =>
        Seq(Multimodal.VideoCodec.synthVideo(row.getAs[Int]("w"), row.getAs[Int]("h"),
          row.getAs[Int]("nf"), row.getAs[Long]("doc_id")))
      }
      Multimodal.explodeSampledFrames(vid, "video", every = 2)
        .select(col("doc_id"), col("frame_idx"),
          col("frame_meta.format").as("format"),
          col("frame_meta.width").as("width"),
          col("frame_meta.height").as("height"))
        .orderBy("doc_id", "frame_idx")
    }),

    // ---- winnowing document fingerprints (MOSS scheme), oracle-checked:
    //      the gram hash is md5-derived (TextFunctions.portableHash), so
    //      DuckDB recomputes the identical winnowed set per doc ----
    "q_text_winnow" -> ((s, dir) => {
      val d = documents(s, dir)
      d.select(col("doc_id"),
          explode(graft.functions.TextFunctions.winnowedFingerprints(col("text"))).as("fp"))
        .orderBy("doc_id", "fp")
    }),

    // ---- benchmark decontamination (GPT-3/PaLM pipeline step),
    //      oracle-checked: corpus docs sharing ANY word 5-gram with the
    //      pseudo-benchmark slice (id % 31 == 0) are flagged with their
    //      hit counts — exact containment via a broadcast gram join,
    //      recomputed verbatim in SQL ----
    "q_decontaminate" -> ((s, dir) => {
      val d = documents(s, dir)
      val benchmark = d.where(pmod(col("doc_id"), lit(31)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
      Dedup.contaminatedDocs(corpus, benchmark, "text", "doc_id", n = 5)
        .orderBy("doc_id")
    }),

    // ---- the BLOOM branch of decontamination (Dolma-scale eval
    //      suites: grams enter a ~1.2-byte/gram filter instead of a
    //      string broadcast; the corpus probes it map-side — no join).
    //      Gated against the EXACT-path oracle: flags are a superset
    //      and per-doc hit counts ≥ exact by contract, and at fpp 1e-8
    //      both collapse to equality on this corpus (expected FP count
    //      ~1e-4; DedupSpec pins superset + equality + layout
    //      invariance), so seeding/hashing/fpp-sizing regressions
    //      surface as hash mismatches. ----
    "q_decontaminate_bloom" -> ((s, dir) => {
      val d = documents(s, dir)
      val benchmark = d.where(pmod(col("doc_id"), lit(31)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
      Dedup.contaminatedDocsBloom(corpus, benchmark, "text", "doc_id", n = 5,
        fpp = 1e-8)
        .orderBy("doc_id")
    }),

    // ---- incremental near-dup: probe docs (id % 7 == 0) screened
    //      against the frozen remainder — the streaming-compatible
    //      LSH join (stateless probe side; see Dedup.nearDupAgainst).
    //      Oracle = exact all-pairs Jaccard across the split, with the
    //      same recall argument as q_dedup_minhash (bimodal verified-J,
    //      families ≈ 0.97 where 16×8 banding recall > 0.9999).
    //      FIXTURE-DEPENDENT equality: banding recall is probabilistic,
    //      so LSH == all-pairs only holds because the measured J
    //      distribution has no mass near the 0.8 cutoff. If the driver
    //      ever regenerates documents.parquet, re-measure the verified-J
    //      histogram; a borderline pair (J barely above 0.8) would make
    //      this a spurious hash mismatch, and the right fix then is
    //      asserting LSH ⊆ oracle plus a recall floor, not debugging. ----
    "q_dedup_incremental" -> ((s, dir) => {
      val d = documents(s, dir)
      val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
      Dedup.nearDupAgainst(probe, corpus, "text", "doc_id")
        .orderBy("probe_id", "corpus_id")
    }),

    // ---- the build-once/serve-many form of the incremental screen:
    //      persistable MinHash-LSH index over the frozen corpus, probed
    //      by the arriving split — gated against the SAME oracle as
    //      q_dedup_incremental (probe must be bit-identical to the
    //      ad-hoc nearDupAgainst derivation). The save→load→probe
    //      round-trip and append==rebuild laws are DedupSpec-pinned. ----
    "q_lsh_index" -> ((s, dir) => {
      val d = documents(s, dir)
      val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
      graft.operators.LshIndex.build(corpus, "text", "doc_id")
        .probe(probe, "text", "doc_id")
        .orderBy("probe_id", "corpus_id")
    }),

    // ---- index REMOVAL (takedown/opt-out support): forget id%5 docs
    //      from the built index; a probe afterwards must equal the
    //      ad-hoc screen against the SURVIVING corpus — the oracle is
    //      the q_dedup_incremental derivation with the removed ids
    //      excluded from the corpus side. remove == build-on-difference
    //      frame-for-frame is DedupSpec-pinned. ----
    "q_lsh_index_remove" -> ((s, dir) => {
      val d = documents(s, dir)
      val probe = d.where(pmod(col("doc_id"), lit(7)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
      graft.operators.LshIndex.build(corpus, "text", "doc_id")
        .remove(corpus.where(pmod(col("doc_id"), lit(5)) === 0).select("doc_id"))
        .probe(probe, "text", "doc_id")
        .orderBy("probe_id", "corpus_id")
    }),

    // ---- Bm25Index removal law as a gate: append synthetic takedown
    //      docs, remove them, and the index must answer EXACTLY as the
    //      never-appended build — the q_bm25_index oracle verbatim
    //      (integer stats subtract, df terms reaching 0 drop). ----
    "q_bm25_index_remove" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq(
        (0L, "spark hash join"), (1L, "window sort merge"),
        (2L, "table scan filter"), (3L, "fast batch value"))
        .toDF("query_id", "qtext")
      val d = documents(s, dir)
      val extra = d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", col("text"), lit("takedown fodder tokens")).as("text"))
      graft.operators.Bm25.Bm25Index.build(d, "text", "doc_id")
        .append(extra, "text")
        .remove(extra, "text")
        .topK(qs, "query_id", "qtext", k = 10)
        .orderBy("query_id", "rank")
    }),

    // ---- IvfIndex removal law as a gate: append negated-vector
    //      takedown rows, remove them, query in EXACT mode (nprobe =
    //      nlist ⇒ brute force regardless of centroids) — must equal
    //      the q_similarity_ivf_exact oracle verbatim. ----
    "q_ivf_index_remove" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val extra = e.select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      graft.operators.Similarity.IvfIndex
        .build(e, "embedding", "vec_id", nlist = 16)
        .append(extra, "embedding", "vec_id")
        .remove(extra.select("vec_id"))
        .topK(e.filter(col("vec_id") < 8), "embedding", "vec_id",
          k = 10, nprobe = 16)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(documents(s, dir), "text", "doc_id")
        .orderBy("fingerprint")),

    // ---- the flagship END-TO-END curation pass, oracle-checked: the
    //      full training-data sequence a real pipeline runs — quality/
    //      language/length gates → exact dedup → MinHash-LSH near-dup
    //      dedup → benchmark decontamination — chained as ONE lazy plan
    //      and re-derived step for step in DuckDB (each stage's oracle
    //      pattern is individually proven by q_text_curation,
    //      q_dedup_exact, q_dedup_pipeline and q_decontaminate; the LSH
    //      == exact-all-pairs recall argument inherits because the
    //      curated survivors are a SUBSET of the corpus, so their pair
    //      set is a subset of the pairs already verified gap-separated).
    //      Output: the surviving doc ids. ----
    "q_curation_pipeline" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val d = documents(s, dir)
      val evalSet = d.where(pmod(col("doc_id"), lit(31)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
      val curated = corpus
        .withColumn("__q", qualityScore(col("text")))
        .withColumn("__lang", langId(col("text")))
        .withColumn("__nt", tokenCount(col("text")))
        .where(graft.functions.TextFunctions.evalHere(
          col("__q") >= 0.5 && col("__lang") === "en" &&
            col("__nt").between(10, 1000)))
        .drop("__q", "__lang", "__nt")
      val afterExact = Dedup.exactDedup(curated, "text", "doc_id")
      val afterNear = Dedup.minHashLshDedup(afterExact, "text", "doc_id",
        shingleK = 5, bands = 16, rowsPerBand = 8, jaccardThreshold = 0.8)
      Dedup.decontaminate(afterNear, evalSet, "text", "doc_id", n = 5)
        .select("doc_id").orderBy("doc_id")
    }),

    // ---- end-to-end curation v2: the v1 chain with the ExactSubstr
    //      span scrub inserted AFTER family-level dedup (the standard
    //      Lee et al. placement — doc-level dedup removes whole family
    //      members first, then residual repeated passages across the
    //      survivors are cut) and decontamination screening the
    //      SCRUBBED text. Output carries the final text, so the hash
    //      pins the whole rewrite, not just survivorship. Oracle:
    //      stage-for-stage SQL, every fragment its standalone oracle's
    //      proven form. ----
    "q_curation_pipeline2" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val d = documents(s, dir)
      val evalSet = d.where(pmod(col("doc_id"), lit(31)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
      val curated = corpus
        .withColumn("__q", qualityScore(col("text")))
        .withColumn("__lang", langId(col("text")))
        .withColumn("__nt", tokenCount(col("text")))
        .where(graft.functions.TextFunctions.evalHere(
          col("__q") >= 0.5 && col("__lang") === "en" &&
            col("__nt").between(10, 1000)))
        .drop("__q", "__lang", "__nt")
      val afterExact = Dedup.exactDedup(curated, "text", "doc_id")
      val afterNear = Dedup.minHashLshDedup(afterExact, "text", "doc_id",
        shingleK = 5, bands = 16, rowsPerBand = 8, jaccardThreshold = 0.8)
      val scrubbed = Dedup.duplicateSpanScrub(
        afterNear.select("doc_id", "text"), "text", "doc_id", n = 8)
      Dedup.decontaminate(scrubbed.select("doc_id", "text"), evalSet,
        "text", "doc_id", n = 5)
        .orderBy("doc_id")
    }),

    // ---- MinHash+LSH near-dup pairs (rows-only: xxhash64 signatures) ----
    // threshold 0.8 = the standard near-dup setting; on this corpus the
    // verified-J distribution is bimodal (families ≈ 0.97, background
    // ≈ 0.17), so 0.5 and 0.8 select the same pairs at bench scale, but
    // 0.8 keeps the output linear in true duplicates on denser corpora
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLshPairs(documents(s, dir), "text", "doc_id",
        shingleK = 5, bands = 16, rowsPerBand = 8, jaccardThreshold = 0.8)
        .orderBy("id_a", "id_b")),

    // ---- SimHash near-dup pairs (rows-only) ----
    // ---- SimHash near-dup pairs, oracle-checked: signatures build on
    //      the md5-derived portable token hash, so DuckDB recomputes
    //      them bit-for-bit; 16-bit x 4 banding guarantees candidates
    //      for every hamming <= 3 pair (pigeonhole over 4 bands), so the
    //      LSH output EQUALS the all-pairs oracle by construction ----
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simHashPairs(documents(s, dir), "text", "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // ---- word-3-gram Jaccard near-dup pairs ----
    // 32×4 banding: the gate corpus' ngram-J distribution is strictly
    // bimodal (all 25 true pairs at J ≥ 0.9, background ≤ 0.067, nothing
    // between — measured in DuckDB), so candidate recall at the observed
    // mode is 1−(1−0.9⁴)³² ≈ 1−5e-16 and the LSH output provably equals
    // the exact all-pairs oracle; default 16 bands would leave ~4e-8
    // miss probability per pair at J = 0.9
    "q_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(documents(s, dir), "text", "doc_id",
        n = 3, bands = 32, jaccardThreshold = 0.4)
        .orderBy("id_a", "id_b")),

    // ---- fuzzy (edit-budget) near-dup pairs: LSH candidates + exact
    //      Levenshtein verify. Oracle = exact all-pairs ground truth
    //      (with the |len diff| ≤ d lower-bound prune — a theorem, not a
    //      heuristic): equality holds because pairs within 20 edits on
    //      ~50-word docs have n-gram Jaccard far above the banding
    //      S-curve (see fuzzyNearDupPairs' completeness note), and the
    //      gate corpus' distance spectrum has a wide gap at the cut
    //      (25 true pairs at d ≤ 8, next pair at d = 38 — measured), so
    //      no boundary case can straddle. Integer distances — exact
    //      hash compare. ----
    "q_dedup_fuzzy" -> ((s, dir) =>
      Dedup.fuzzyNearDupPairs(documents(s, dir), "text", "doc_id",
        maxEdits = 20)
        .orderBy("id_a", "id_b")),

    // ---- ASYMMETRIC containment near-dup pairs: |A∩B|/|A| ≥ 0.8 over
    //      distinct word 3-grams — the duplication mode symmetric
    //      Jaccard is blind to. Corpus = documents ∪ synthetic snippets
    //      (the first ⌈w/3⌉ normalized tokens of every doc_id % 7 == 0
    //      doc, re-keyed + 1000000), derived by identical arithmetic on
    //      both engines: each snippet is containment 1.0 in its source
    //      while its symmetric Jaccard ≈ 1/3 sits far below any dedup
    //      cut. Candidates come from LOSSLESS prefix filtering (rarest
    //      document-frequency-ordered grams, PPJoin pigeonhole), every
    //      candidate exact-verified — so the oracle is the plain
    //      all-pairs ground truth. Integer basis-point threshold
    //      compare + one division of exact ints: no float trust. ----
    "q_dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(containmentCorpus(s, dir), "text", "doc_id",
        n = 3, tau = 0.8)
        .orderBy("id_a", "id_b")),

    // ---- containment scrub over the same corpus: drop every doc
    //      tau-contained in a doc with a larger gram set (ties → keep
    //      the smaller id) — the excerpt/boilerplate collapse. The
    //      oracle re-derives the survivor set from the all-pairs
    //      containment graph and the same drop rule. ----
    "q_containment_scrub" -> ((s, dir) =>
      Dedup.containmentScrub(containmentCorpus(s, dir), "text", "doc_id",
        n = 3, tau = 0.8)
        .select("doc_id")
        .orderBy("doc_id")),

    // ---- incremental containment SCREEN (probe vs corpus — the
    //      foreachBatch ingestion form of the containment family):
    //      probe = the synthetic snippets, corpus = documents; gram
    //      rarity from the corpus side's frequencies (absent grams rank
    //      rarest). Prefix filtering is lossless, so the oracle is the
    //      exact probe×corpus ground truth. ----
    "q_containment_screen" -> ((s, dir) => {
      val base = containmentBase(s, dir)
      Dedup.containedAgainst(containmentSnippets(base), base,
        "text", "doc_id", n = 3, tau = 0.8)
        .orderBy("probe_id", "corpus_id")
    }),

    // ---- winnowing-fingerprint near-dup pairs (the MOSS detector):
    //      pairs whose shared winnowed fingerprints cover ≥ 90% of the
    //      smaller side's set (integer cross-multiplied cut — exact on
    //      both engines even for pairs landing ON the 0.9 boundary,
    //      which the sf0.1 fixture has). Raw shared COUNTS have no gap
    //      on a shared-phrase-pool corpus (measured: background reaches
    //      60+ where true dups hold ~100-150); the coverage ratio is
    //      the MOSS report statistic. Oracle re-derives the fingerprint
    //      sets (the q_text_winnow chain) + the same integer cut. ----
    "q_dedup_winnow" -> ((s, dir) =>
      Dedup.winnowNearDupPairs(documents(s, dir), "text", "doc_id",
        k = 5, w = 4, minShared = 5, minCoverage = 0.9)
        .orderBy("id_a", "id_b")),

    // ---- unit-level exact dedup (Dolma/Lee-et-al paragraph pass) over
    //      chunkWindows units (lines in production; the 10-token
    //      chunker is the gate's deterministic splitter). First
    //      occurrence by (doc, pos) survives corpus-wide; docs
    //      reassemble in order. Fully SQL-replayable: chunk CTE +
    //      first-occurrence window + ordered string_agg. ----
    "q_paragraph_dedup" -> ((s, dir) =>
      Dedup.unitExactDedup(
        graft.operators.Packing.chunkWindows(documents(s, dir), "text",
          "doc_id", maxTokens = 10),
        "doc_id", "chunk_ix", "chunk_text", delim = " ")
        .orderBy("doc_id")),

    // ---- SENTENCE-level exact dedup (the Dolma unit-dedup recipe at
    //      its natural grain): every doc gains two boilerplate
    //      sentences — one shared corpus-wide, one shared by its
    //      doc_id%7 cohort — and each distinct sentence survives only
    //      at its globally-first (doc, pos). The splitter is the
    //      regex-portable sentinel mark-and-split (terminal marks stay
    //      with their sentence); the oracle replays split, first-
    //      occurrence window, and ordered reassembly. ----
    "q_sentence_dedup" -> ((s, dir) => {
      val boiler = concat(col("text"),
        lit(" Subscribe to our newsletter today. Thanks for reading issue "),
        pmod(col("doc_id"), lit(7)), lit("."))
      val units = documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.sentenceSplit(boiler)))
        .toDF("doc_id", "pos", "unit")
      Dedup.unitExactDedup(units, "doc_id", "pos", "unit", delim = " ")
        .orderBy("doc_id")
    }),

    // ---- corpus-wide duplicate-SPAN scrub (Lee et al. 2022 ExactSubstr
    //      over 8-token grams): repeated passages at arbitrary offsets
    //      are cut, keeping only the globally-first occurrence. FULL
    //      oracle: grams on the portable hash, duplicate counts, the
    //      canonical-first rule, interval coverage and ordered
    //      reassembly all replay in SQL ----
    "q_dedup_spans" -> ((s, dir) =>
      Dedup.duplicateSpanScrub(documents(s, dir), "text", "doc_id", n = 8)
        .orderBy("doc_id")),

    // ---- incremental span scrub: probe docs (doc_id % 7 == 0) lose
    //      every 8-token passage already present in the frozen corpus
    //      (the rest) — the ingestion-time ExactSubstr form, exact
    //      hash-join path. FULL oracle: corpus gram set + probe
    //      coverage + reassembly in SQL ----
    "q_dedup_spans_incremental" -> ((s, dir) => {
      val d = documents(s, dir)
      Dedup.duplicateSpanScrubAgainst(
        d.where(pmod(col("doc_id"), lit(7)) === 0),
        d.where(pmod(col("doc_id"), lit(7)) =!= 0),
        "text", "doc_id", n = 8)
        .orderBy("doc_id")
    }),

    // ---- the BLOOM branch of the incremental span scrub — the
    //      designated 100 TB path (map-side membership screen, no gram
    //      join). Gated against the EXACT-path oracle: Bloom
    //      over-scrubs at ≤ fpp per gram and never under-scrubs, and at
    //      fpp 1e-8 on this corpus the expected false-positive count is
    //      ~1e-4 (DedupSpec pins output == exact at this fpp), so any
    //      mismatch is a real defect in seeding/hashing/sizing, not
    //      probabilistic noise. ----
    "q_dedup_spans_incremental_bloom" -> ((s, dir) => {
      val d = documents(s, dir)
      Dedup.duplicateSpanScrubAgainst(
        d.where(pmod(col("doc_id"), lit(7)) === 0),
        d.where(pmod(col("doc_id"), lit(7)) =!= 0),
        "text", "doc_id", n = 8, bloomFpp = 1e-8)
        .orderBy("doc_id")
    }),

    // ---- persistable span-gram index: the build-once/serve-many form
    //      of the incremental span scrub (SpanIndex = the corpus'
    //      distinct gram-hash set + gram width). Gated against the
    //      q_dedup_spans_incremental oracle VERBATIM: scrub over the
    //      built index must be bit-identical to the ad-hoc operator
    //      over the same corpus split. ----
    "q_span_index" -> ((s, dir) => {
      val d = documents(s, dir)
      val idx = graft.operators.SpanIndex.build(
        d.where(pmod(col("doc_id"), lit(7)) =!= 0), "text", n = 8)
      idx.scrub(d.where(pmod(col("doc_id"), lit(7)) === 0), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- the same index serving its Bloom branch (map-side filter
    //      probe, no gram join): gated against the SAME exact-path
    //      oracle at fpp 1e-8 — the q_dedup_spans_incremental_bloom
    //      pattern (expected false-positive count ~1e-4 on this gram
    //      set, so Bloom == exact; the PERSISTED filter is additionally
    //      spec-pinned identical in DedupSpec). ----
    "q_span_index_bloom" -> ((s, dir) => {
      val d = documents(s, dir)
      val idx = graft.operators.SpanIndex.build(
        d.where(pmod(col("doc_id"), lit(7)) =!= 0), "text", n = 8)
      idx.scrub(d.where(pmod(col("doc_id"), lit(7)) === 0), "text", "doc_id",
        bloomFpp = 1e-8)
        .orderBy("doc_id")
    }),

    // ---- persistable EVAL gram index (build-once/serve-many
    //      decontamination — the last screen input without an index
    //      form): flagging through the index must equal the ad-hoc
    //      contaminatedDocs walk, so the q_decontaminate oracle applies
    //      verbatim. Save/load round-trip, append == build-on-union,
    //      and mutated-meta loudness are DedupSpec-pinned. ----
    "q_eval_index" -> ((s, dir) => {
      val d = documents(s, dir)
      graft.operators.EvalIndex
        .build(d.where(pmod(col("doc_id"), lit(31)) === 0), "text", n = 5)
        .contaminated(d.where(pmod(col("doc_id"), lit(31)) =!= 0),
          "text", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- the same index serving its Bloom branch (map-side filter
    //      probe, no gram join) at fpp 1e-8 == the exact path on this
    //      gram set (expected FP count ~1e-4); the PERSISTED-filter
    //      form is additionally spec-pinned identical in DedupSpec. ----
    "q_eval_index_bloom" -> ((s, dir) => {
      val d = documents(s, dir)
      graft.operators.EvalIndex
        .build(d.where(pmod(col("doc_id"), lit(31)) === 0), "text", n = 5)
        .contaminated(d.where(pmod(col("doc_id"), lit(31)) =!= 0),
          "text", "doc_id", bloomFpp = 1e-8)
        .orderBy("doc_id")
    }),

    // ---- brute-force cosine top-k similarity search ----
    "q_similarity_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id", 10)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- corpus SELF k-NN graph (the SemDeDup/NN-descent/diversity
    //      primitive — q_similarity_topk answers retrieval, this
    //      answers corpus structure): every row's 5 nearest neighbors,
    //      self excluded, rank-only output (ties by neighbor id; the
    //      fixture's rank-boundary score gaps are pinned ≫ float noise
    //      by SimilaritySpec). ----
    "q_knn_graph" -> ((s, dir) =>
      Similarity.knnGraph(embeddings(s, dir), "embedding", "vec_id", 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")),

    // ---- the same graph served from a frozen IvfIndex at nprobe =
    //      nlist (exact by construction, spec-pinned): oracle is the
    //      q_knn_graph SQL verbatim, so any index-path divergence —
    //      cell assignment, the k+1 self over-fetch, re-rank ties —
    //      breaks the hash. The beyond-10⁵ form whose candidate work
    //      per query is ~nprobe/nlist of the corpus. ----
    "q_knn_graph_indexed" -> ((s, dir) =>
      Similarity.knnGraphIndexed(embeddings(s, dir), "embedding", "vec_id", 5,
        nlist = 8, nprobe = 8)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")),

    // ---- semantic families: connected components over the MUTUAL
    //      4-NN edge set (reciprocity strips hub-induced one-way edges)
    //      — the embedding-space analog of q_dedup_cluster. Oracle
    //      replays ranks, the reciprocity intersection, and the
    //      recursive-CTE component walk; family = min member id. ----
    "q_semantic_families" -> ((s, dir) =>
      Similarity.semanticFamilies(embeddings(s, dir), "embedding", "vec_id", k = 4)
        .orderBy("vec_id")),

    // ---- the same families over the INDEXED graph at nprobe = nlist
    //      (exact by construction) — the scale composition the exact
    //      quadratic form stands in for, answered to the exact oracle
    //      VERBATIM so any index-path divergence breaks the hash. ----
    "q_semantic_families_indexed" -> ((s, dir) =>
      Similarity.semanticFamiliesFromGraph(
        Similarity.knnGraphIndexed(embeddings(s, dir), "embedding", "vec_id",
          k = 4, nlist = 8, nprobe = 8), "vec_id")
        .orderBy("vec_id")),

    // ---- margin-based bitext mining (Artetxe & Schwenk 2019): the
    //      multilingual parallel-pair primitive. Sides = even/odd
    //      vec_id halves of the embeddings table; FULL oracle — every
    //      A×B cosine, both k-NN means (exact-decimal addends), both
    //      NN1 candidate directions and the rounded ratio margin
    //      replayed in SQL. Margin/rank boundary gaps at the fixture
    //      are pinned ≫ float noise by SimilaritySpec. ----
    "q_bitext_mine" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.bitextMine(
        e.where(pmod(col("vec_id"), lit(2)) === 0),
        e.where(pmod(col("vec_id"), lit(2)) === 1),
        "embedding", "vec_id", k = 4, threshold = 1.02)
    }),

    // ---- the same mining served from two frozen IvfIndexes at full
    //      probe (nprobe = nlist — exact by construction, spec-pinned):
    //      oracle is the q_bitext_mine SQL verbatim, so any index-path
    //      divergence (cell assignment, over-fetch, rank ties, margin
    //      arithmetic) breaks the hash. The build-once/serve-many form
    //      for two sides too large to broadcast. ----
    "q_bitext_indexed" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val a = e.where(pmod(col("vec_id"), lit(2)) === 0)
      val b = e.where(pmod(col("vec_id"), lit(2)) =!= 0)
      val nlist = 8
      val idxA = Similarity.IvfIndex.build(a, "embedding", "vec_id", nlist = nlist)
      val idxB = Similarity.IvfIndex.build(b, "embedding", "vec_id", nlist = nlist)
      Similarity.bitextMineIndexed(a, b, idxA, idxB, "embedding", "vec_id",
        k = 4, threshold = 1.02, nprobe = nlist)
    }),

    // ---- text-only similarity search end to end: hashing-trick TF
    //      vectors (portable md5 hash, integer counts) + exact cosine
    //      top-k. Every quantity is exact integer arithmetic until one
    //      sqrt and one division, so scores are bit-identical to the
    //      SQL replay — the full-precision oracle form no float-trust
    //      argument needs. ----
    "q_text_knn" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val docs = documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          TextFunctions.hashingTfVector(col("text"), 64).as("v"))
      val q = docs.where(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"), col("v").as("qv"))
      val scored = docs.select(col("doc_id").as("neighbor_id"), col("v").as("cv"))
        .crossJoin(broadcast(q))
        .where(col("neighbor_id") =!= col("query_id"))
        .withColumn("dot", aggregate(
          zip_with(col("qv"), col("cv"), (a, b) => a * b),
          lit(0.0), (s0, x) => s0 + x))
        .withColumn("na", aggregate(transform(col("qv"), x => x * x),
          lit(0.0), (s0, x) => s0 + x))
        .withColumn("nb", aggregate(transform(col("cv"), x => x * x),
          lit(0.0), (s0, x) => s0 + x))
        .withColumn("score", when(col("na") * col("nb") === 0.0, lit(0.0))
          .otherwise(col("dot") / (sqrt(col("na")) * sqrt(col("nb")))))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("score").cast("float").as("score"))
        .orderBy("query_id", "rank")
    }),

    // ---- chunk→vector→document pipeline end to end: overlapping
    //      context windows, hashing-TF chunk vectors, mean-pooled doc
    //      vectors — the "document embedding from chunk embeddings"
    //      composition, with the hashing vectors standing in for the
    //      model call (same schema, same pooling math). Every stage is
    //      integer- or decimal-exact, so the composed oracle replays
    //      bit-for-bit. ----
    // ---- the SAME composition behind the encoder seam: the operator
    //      form with the encoder as a parameter (HashingTfEncoder = the
    //      sandbox stub). Shares q_chunk_pool's oracle verbatim, so the
    //      seam path is pinned bit-identical to the inline form. ----
    "q_doc_embed" -> ((s, dir) => {
      import graft.operators.Embedding
      Embedding.documentEmbeddings(
        documents(s, dir), "text", "doc_id",
        Embedding.HashingTfEncoder(32), maxTokens = 32, overlap = 8)
        .select(col("doc_id"),
          posexplode(col("embedding").cast("array<float>")).as(Seq("dim", "value")))
        .orderBy("doc_id", "dim")
    }),

    "q_chunk_pool" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val chunks = graft.operators.Packing.chunkWindows(
        documents(s, dir).where(col("text").isNotNull), "text", "doc_id",
        maxTokens = 32, overlap = 8)
        .select(col("doc_id"),
          TextFunctions.hashingTfVector(col("chunk_text"), 32).as("v"))
      Similarity.meanPoolBy(chunks, "v", "doc_id")
        .select(col("doc_id"),
          posexplode(col("embedding").cast("array<float>")).as(Seq("dim", "value")))
        .orderBy("doc_id", "dim")
    }),

    // ---- grouped embedding mean-pooling (chunk→doc reducer): per
    //      (group, position) exact-decimal means, position-ordered
    //      reassembly. Fully deterministic cross-engine: float inputs
    //      widen to double exactly, decimal sums of identical doubles
    //      are identical, so the pooled REAL vector is bit-equal in
    //      both engines — no canonicalization needed beyond the output
    //      float cast. ----
    "q_embed_meanpool" -> ((s, dir) => {
      val e = embeddings(s, dir)
        .withColumn("grp", pmod(col("vec_id"), lit(16)))
      Similarity.meanPoolBy(e, "embedding", "grp")
        .select(col("grp"),
          posexplode(col("embedding").cast("array<float>")).as(Seq("dim", "value")))
        .orderBy("grp", "dim")
    }),

    // ---- embedding-space decontamination (semantic complement of the
    //      n-gram q_decontaminate): eval = vec_id % 31 == 0, corpus =
    //      rest; survivors are corpus vectors whose max cosine against
    //      every eval vector stays under tau (0.377 — the midpoint of a
    //      wide max-cos gap at BOTH sf0.001 and sf0.01, measured; the
    //      synthetic fixture has no planted cross-split near-dups, so a
    //      discriminative tau sits inside the natural distribution).
    //      FULL oracle — the max-cos rollup replayed; the tau boundary
    //      gap pinned in spec. ----
    "q_semantic_decon" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.semanticDecontaminate(
        e.where(pmod(col("vec_id"), lit(31)) =!= 0),
        e.where(pmod(col("vec_id"), lit(31)) === 0),
        "embedding", "vec_id", tau = 0.377)
        .select(col("vec_id")).orderBy("vec_id")
    }),

    // ---- LSH-bucketed approximate top-k. FULL oracle: the seeded
    //      splitmix64 hyperplanes, sketches, bucket joins and re-rank
    //      are all replayed exactly in SQL (recall vs brute force
    //      additionally asserted in SimilaritySpec) ----
    "q_similarity_lsh" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id",
        k = 10, dim = 64)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- graph ANN: sharded HNSW. PARTIAL oracle (embedded-deviations
    //      pattern, deviation set EMPTY at the gate): HNSW is fully
    //      deterministic here (seeded level stream, hash shard
    //      membership, id-sorted insertion) and the OracleFitProbe HNSW
    //      section measures exactly which queries' top-10 deviate from
    //      brute force — currently NONE (recall 10/10 for all 8 gate
    //      queries, matching the q_ann_recall constants), so the oracle
    //      replays plain brute force and any search regression surfaces
    //      as a hash mismatch. If a fixture change introduces
    //      deviations, the probe prints the patch rows to embed. ----
    "q_similarity_hnsw" -> ((s, dir) => {
      val e = embeddings(s, dir)
      graft.operators.Hnsw.topK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id",
        k = 10)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- IVF (inverted-file) approximate top-k. PARTIAL oracle: the
    //      deterministic quantizer's centroids are embedded constants;
    //      the oracle replays assignment, probing and the exact re-rank
    //      in SQL (recall + exactness at nprobe=nlist additionally
    //      pinned by SimilaritySpec) ----
    "q_similarity_ivf" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id",
        k = 10, nlist = 16, nprobe = 6)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- IVF in exact mode: nprobe = nlist probes every cell, so the
    //      candidate set is the full corpus and the result equals brute
    //      force regardless of the learned centroids — oracle-checkable
    //      with the same SQL as q_similarity_topk ----
    "q_similarity_ivf_exact" -> ((s, dir) => {
      val e = embeddings(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), "embedding", "vec_id",
        k = 10, nlist = 16, nprobe = 16)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- Product quantization ADC top-k: the corpus serves from 16
    //      one-byte codes per row (16× under float32 at dim 64) and each
    //      pair scores with 16 table lookups instead of 64 multiplies —
    //      the ANN memory story at 100 TB. PARTIAL oracle (the
    //      q_similarity_ivf embedded-constants pattern): the
    //      deterministic per-subspace codebooks are literals; the SQL
    //      replays unit-normalize, encode argmin (first-cell-wins ties),
    //      the query LUT, the subspace-order ADC sum and the (adist, id)
    //      ranking. PqOracleProbe margins at the gate: encode 3.3e-6,
    //      ADC rank 3.3e-4, refine rank 5.4e-6, zero exact ties — all
    //      ≥ 10 orders above cross-engine ulp disagreement. ----
    "q_similarity_pq" -> ((s, dir) => {
      val e = embeddings(s, dir)
      graft.operators.Pq.topK(e, e.filter(col("vec_id") < 8), "embedding",
        "vec_id", k = 10, m = 16, ksub = 16)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- PQ + exact re-rank of the top-64 ADC shortlist (IVFADC's "R"
    //      step): measured recall@10 0.9125 vs 0.4125 ADC-only at the
    //      gate — the compressed scan finds the neighborhood, 64 true
    //      vectors per query repair the order. ----
    "q_similarity_pq_refine" -> ((s, dir) => {
      val e = embeddings(s, dir)
      graft.operators.Pq.topK(e, e.filter(col("vec_id") < 8), "embedding",
        "vec_id", k = 10, m = 16, ksub = 16, refine = 64)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- binary (sign-bit) quantization: ONE long per 64-dim vector
    //      (64× under float32), ranked by Hamming distance — pure
    //      INTEGER arithmetic after the sign, so this is the only ANN
    //      gate with a constant-free FULL oracle (packing, xor,
    //      popcount and the (hamming, id) rank all replayed bit-exactly,
    //      no margins needed). Recall + the refine repair are measured
    //      in q_ann_recall like every other method. ----
    "q_similarity_bq" -> ((s, dir) => {
      val e = embeddings(s, dir)
      graft.operators.Bq.topK(e, e.filter(col("vec_id") < 8), "embedding",
        "vec_id", k = 10, dim = 64)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("hamming").cast("int").as("hamming"))
        .orderBy("query_id", "rank")
    }),

    // ---- IVFADC (Jégou et al. 2011 §IV — the FAISS billion-scale
    //      layout): coarse cells prune the SCAN (nprobe of nlist cells
    //      per query), residual PQ codes prune the MEMORY (cell id + 16
    //      bytes-ish per row); ADC over the probed cells' residual
    //      codes. PARTIAL oracle: both fitted tables embedded (one
    //      shared layout-invariant sample), assignment / residual /
    //      encode / probing / LUT / rank replayed. IvfPqOracleProbe
    //      margins: assign 5.5e-4, probe 1.8e-3, residual encode
    //      1.2e-5, ADC rank 5.5e-4, zero exact ties. ----
    "q_similarity_ivfpq" -> ((s, dir) => {
      val e = embeddings(s, dir)
      graft.operators.IvfPq.topK(e, e.filter(col("vec_id") < 8), "embedding",
        "vec_id", k = 10, nlist = 16, nprobe = 6, m = 16, ksub = 16)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- IVFADC + exact re-rank of the top-64 ADC shortlist (recall
    //      0.74 vs 0.43 ADC-only at the gate — capped by the nprobe=6
    //      cell pruning, the measured recall/scan-cost trade) ----
    "q_similarity_ivfpq_refine" -> ((s, dir) => {
      val e = embeddings(s, dir)
      graft.operators.IvfPq.topK(e, e.filter(col("vec_id") < 8), "embedding",
        "vec_id", k = 10, nlist = 16, nprobe = 6, m = 16, ksub = 16,
        refine = 64)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- ANN recall artifact: measured recall@10 of each approximate
    //      path (lsh / ivf / hnsw, at the gate queries' own parameters)
    //      against the brute-force exact top-10 — makes the approximate
    //      paths' quality auditable from the round artifacts instead of
    //      only inside HnswSpec/SimilaritySpec assertions. All three
    //      methods are deterministic per pinned input (seeded levels /
    //      seeded fits over a fresh parquet scan), so the per-query hit
    //      counts are constants at the gate: the oracle embeds them as
    //      literals (the q_kmeans embedded-constants pattern) — a recall
    //      regression surfaces as a hash mismatch, not silence. ----
    "q_ann_recall" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
      val brute = graft.core.CacheScope.retain(
        Similarity.bruteForceTopK(e, q, "embedding", "vec_id", 10)
          .select(col("query_id"), col("neighbor_id")))
      val methods: Seq[(String, DataFrame)] = Seq(
        "hnsw" -> graft.operators.Hnsw.topK(e, q, "embedding", "vec_id", k = 10),
        "ivf" -> Similarity.ivfTopK(e, q, "embedding", "vec_id",
          k = 10, nlist = 16, nprobe = 6),
        // hyperplane LSH needs shorter sketches + more tables in the
        // moderate-cosine top-k regime (collision prob per table is
        // (1-θ/π)^bits): the near-dup defaults (12 bits) give ~0 recall
        // here — measured and recorded, which is exactly what this
        // artifact is for
        "lsh" -> Similarity.lshTopK(e, q, "embedding", "vec_id",
          k = 10, dim = 64, bits = 6, tables = 24),
        // compressed-domain ADC scan and its refine-repaired form (the
        // two PQ serving modes; see q_similarity_pq)
        "pq" -> graft.operators.Pq.topK(e, q, "embedding", "vec_id",
          k = 10, m = 16, ksub = 16),
        "pq_refine" -> graft.operators.Pq.topK(e, q, "embedding", "vec_id",
          k = 10, m = 16, ksub = 16, refine = 64),
        // IVFADC: cell-pruned scan over residual codes, and its
        // refine-repaired form (see q_similarity_ivfpq)
        "ivfpq" -> graft.operators.IvfPq.topK(e, q, "embedding", "vec_id",
          k = 10, nlist = 16, nprobe = 6, m = 16, ksub = 16),
        "ivfpq_refine" -> graft.operators.IvfPq.topK(e, q, "embedding",
          "vec_id", k = 10, nlist = 16, nprobe = 6, m = 16, ksub = 16,
          refine = 64),
        // binary quantization: 1 bit/dim Hamming scan + its refine form
        // (see q_similarity_bq)
        "bq" -> graft.operators.Bq.topK(e, q, "embedding", "vec_id",
          k = 10, dim = 64),
        "bq_refine" -> graft.operators.Bq.topK(e, q, "embedding", "vec_id",
          k = 10, dim = 64, refine = 64))
      methods.map { case (m, df) =>
        val hits = df.select(col("query_id"), col("neighbor_id"))
          .join(brute, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        q.select(col("vec_id").as("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(lit(m).as("method"), col("query_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      }.reduce(_ unionByName _)
        .withColumn("recall",
          floor(col("n_hits").cast("double") / 10.0 * 1e4 + 0.5) / 1e4)
        .orderBy("method", "query_id")
    }),

    // ---- native Catalyst cosine_sim expression (whole-stage codegen,
    //      registered via SparkSessionExtensions; float-cast on both
    //      sides so engine summation-order ulps cannot flake the exact
    //      hash compare) ----
    "q_cosine_native" -> ((s, dir) => {
      graft.plans.GraftExtensions.register(s)
      val e = embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val a = e.alias("a"); val b = e.alias("b")
      a.join(b, col("b.vec_id") === col("a.vec_id") + 1)
        .select(col("a.vec_id").as("vec_id"),
          expr("cosine_sim(a.v, b.v)").cast("float").as("cos_next"))
        .orderBy("vec_id")
    }),

    // ---- incremental embedding near-dup: probe slice against a FROZEN
    //      IvfIndex (the Dedup.nearDupAgainst analog for the embedding
    //      modality). FULL oracle: every candidate is exact-verified,
    //      so the result equals the exact probe×corpus threshold filter
    //      whenever the nprobe cell cover recalls every qualifying pair
    //      — verified exact-equal at the sf0.01 gate (refresh the check
    //      after any testdata regeneration); nprobe = nlist is exact by
    //      construction (spec-pinned), and the 30× probe corpus
    //      measures 99.48% recall at the default 12-of-16 cover
    //      (EmbIncrProbe, PERF.md). ----
    "q_embedding_neardup_incr" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val idx = Similarity.IvfIndex.build(
        e.filter(col("vec_id") % 7 =!= 0), "embedding", "vec_id", nlist = 16)
      idx.nearDupAgainst(e.filter(col("vec_id") % 7 === 0), "embedding",
        "vec_id", threshold = 0.45, nprobe = 12)
        .select("probe_id", "corpus_id")
        .orderBy("probe_id", "corpus_id")
    }),

    // ---- embedding-cosine near-duplicate pairs ----
    "q_embedding_neardup" -> ((s, dir) =>
      Similarity.embeddingNearDupPairs(embeddings(s, dir), "embedding", "vec_id", 0.45)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")),

    // ---- multimodal: synthesize PNG payloads with id-derived dims,
    //      decode REAL metadata back through javax.imageio (header-only
    //      read), extract pixel features. Oracle-checked: the encode →
    //      decode round-trip must recover exactly the dimensions the SQL
    //      computes arithmetically. Feature extraction stays in the plan
    //      (exercised, not selected — PNG byte lengths and pixel sums are
    //      encoder-specific, not ANSI-SQL-expressible) ----
    "q_multimodal_meta" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"),
        (pmod(col("doc_id"), lit(7)) + 1).cast("int").as("w"),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int").as("h"))
      // audio leg: synthesize a REAL RIFF/PCM WAV per doc (id-derived
      // rate/length), decode it back through the chunk-walking codec —
      // the oracle recomputes the same numbers arithmetically, so a
      // header-layout or sample-count bug breaks the hash.
      // TWO mapPartitions passes total (synth both payloads; decode both
      // + featurize) — chaining per-column derivations would re-serialize
      // the binary payloads at every RDD boundary (Multimodal.deriveMany)
      val params = d
        .withColumn("rate", (lit(8000) + pmod(col("doc_id"), lit(3)) * 4000).cast("int"))
        .withColumn("n_in", ((pmod(col("doc_id"), lit(50)) + 1) * 160).cast("int"))
      val synth = Multimodal.deriveMany(params,
        Seq("payload" -> BinaryType, "audio_payload" -> BinaryType)) { row =>
        val w = row.getAs[Int]("w"); val h = row.getAs[Int]("h")
        Seq(Multimodal.ImageCodec.synthPng(w, h, w.toLong * 31 + h),
          Multimodal.AudioCodec.synthWav(row.getAs[Int]("rate"), row.getAs[Int]("n_in"),
            row.getAs[Int]("rate").toLong * 31 + row.getAs[Int]("n_in")))
      }
      val decoded = Multimodal.deriveMany(synth,
        Seq("media_meta" -> Multimodal.MetaSchema,
          "audio_meta" -> Multimodal.AudioMetaSchema,
          "features" -> ArrayType(FloatType))) { row =>
        val png = row.getAs[Array[Byte]]("payload")
        val wav = row.getAs[Array[Byte]]("audio_payload")
        val (fmt, w, h, c) = Multimodal.ImageCodec.decodeMeta(png)
        val (afmt, rate, ch, n, ms) = Multimodal.AudioCodec.decodeMeta(wav)
        Seq(Row(fmt, w, h, c, if (png == null) 0L else png.length.toLong),
          Row(afmt, rate, ch, n, ms),
          Multimodal.ImageCodec.features(png).toSeq)
      }
      decoded
        .where(size(col("features")) === Multimodal.FeatureDim)
        .select(col("doc_id"),
          col("media_meta.format").as("format"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"),
          col("media_meta.channels").as("channels"),
          col("audio_meta.sample_rate").as("sample_rate"),
          col("audio_meta.n_samples").as("n_samples"),
          col("audio_meta.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    }),

    // ---- real-world video container metadata: synthesize a spec-shaped
    //      ISO-BMFF (MP4) file per doc with id-derived brand-independent
    //      parameters (dims, movie timescale/duration, optional audio
    //      track; durations past u32 force the version-1 64-bit box
    //      layout), parse it back through the box-walking codec — the
    //      oracle recomputes every field arithmetically, so a box
    //      layout, fixed-point, or v0/v1 offset bug breaks the hash ----
    "q_mp4_meta" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"),
        ((pmod(col("doc_id"), lit(7)) + 1) * 16).cast("int").as("w"),
        ((pmod(col("doc_id"), lit(5)) + 1) * 16).cast("int").as("h"),
        (lit(600) + pmod(col("doc_id"), lit(5)) * 100).cast("long").as("ts"),
        ((pmod(col("doc_id"), lit(50)) + 1) * 300 +
          when(pmod(col("doc_id"), lit(4)) === 0, lit(4294967296L))
            .otherwise(lit(0L))).cast("long").as("dur"),
        (pmod(col("doc_id"), lit(3)) === 0).as("with_audio"))
      val synth = Multimodal.deriveMany(d, Seq("payload" -> BinaryType)) { row =>
        Seq(Multimodal.Mp4Codec.synthMp4(row.getAs[Int]("w"), row.getAs[Int]("h"),
          row.getAs[Long]("ts"), row.getAs[Long]("dur"),
          row.getAs[Boolean]("with_audio"),
          payloadBytes = 64, seed = row.getAs[Long]("doc_id")))
      }
      val parsed = Multimodal.deriveMany(synth,
        Seq("mp4_meta" -> Multimodal.Mp4Codec.Mp4MetaSchema)) { row =>
        Seq(Multimodal.Mp4Codec.parseMetaRow(row.getAs[Array[Byte]]("payload")))
      }
      parsed.select(col("doc_id"),
        col("mp4_meta.brand").as("brand"),
        col("mp4_meta.timescale").as("timescale"),
        col("mp4_meta.duration").as("duration"),
        col("mp4_meta.n_tracks").as("n_tracks"),
        col("mp4_meta.width").as("width"),
        col("mp4_meta.height").as("height"),
        col("mp4_meta.handlers").as("handlers"))
        .orderBy("doc_id")
    }),

    // ---- streaming surface (batch-equivalent of the Structured Streaming
    //      transforms; the streaming path itself is exercised in
    //      StreamingSpec with a file source + watermark + memory sink) ----
    "q_stream_tumbling" -> ((s, dir) =>
      graft.streaming.EventStream.tumblingCounts(events(s, dir))
        .withColumn("window_start", unix_timestamp(col("window_start")))
        .orderBy("window_start", "event_type")),

    "q_stream_sliding" -> ((s, dir) =>
      graft.streaming.EventStream.slidingCounts(events(s, dir))
        .withColumn("window_start", unix_timestamp(col("window_start")))
        .orderBy("window_start", "event_type")),

    // ---- repetition quality signals (Gopher/Dolma rules): top-2-gram
    //      share + duplicate-3-gram share per doc. Fractions are exact
    //      integer ratios, so both sides canonicalize with the explicit
    //      floor(x·10⁴+0.5)/10⁴ (round() half-boundaries hit k/m
    //      rationals). ----
    "q_text_repetition" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val r4 = (c: Column) => floor(c * 10000 + 0.5) / 10000
      documents(s, dir).select(col("doc_id"),
        repetitionStats(col("text"), 2).as("__r2"),
        repetitionStats(col("text"), 3).as("__r3"))
        .select(col("doc_id"),
          r4(col("__r2")(0)).as("top2_frac"),
          r4(col("__r3")(1)).as("dup3_frac"))
        .orderBy("doc_id")
    }),

    // ---- per-source quota sampling: the "balance the mix" curation
    //      step — a reproducible fixed-size random sample per source,
    //      selected by the n smallest engine-portable hashes so DuckDB
    //      re-derives the EXACT sample. ----
    "q_sample_quota" -> ((s, dir) =>
      graft.operators.Sampling.quotaPerGroup(
        documents(s, dir).select("doc_id", "source"), "source", "doc_id", quota = 50)
        .orderBy("doc_id")),

    // ---- deterministic global training order: portable keyed-hash
    //      sort with a DISTRIBUTED dense rank (range partition +
    //      per-partition window + broadcast prefix offsets — no
    //      single-partition window stage). Fully SQL-replayable. ----
    "q_shuffle_order" -> ((s, dir) =>
      graft.operators.Sampling.deterministicShuffle(
        documents(s, dir).select("doc_id"), "doc_id", seed = 42L)
        .orderBy("doc_id")),

    // ---- deterministic sharded export manifest: the final mix dealt
    //      round-robin by training-order rank into 8 shards, with
    //      per-shard doc/token/byte counts and an order-free bit-XOR
    //      content checksum over the portable doc hashes. Fully
    //      SQL-replayable (same md5 walk, same bit_xor). ----
    "q_shard_manifest" -> ((s, dir) =>
      graft.sources.ShardedExport.manifest(
        documents(s, dir).select("doc_id", "text"), "text", "doc_id",
        nShards = 8, seed = 42L)
        .orderBy("shard")),

    // ---- pre-tokenized BINARY export (Megatron-style .bin/.idx): the
    //      corpus is tokenized, id-encoded against its own sorted-
    //      distinct vocabulary, written as little-endian u16 shards,
    //      and READ BACK from the bytes — doc ids, shard deal, within-
    //      shard training order, and the exact id sequence must all
    //      survive the byte round-trip. The oracle derives everything
    //      from parquet alone: vocabulary = row_number−1 over sorted
    //      distinct tokens, shard/ordinal = the q_shard_manifest md5
    //      deal, ids re-joined in token order. The write runs at
    //      query-construction time (the sink IS the operator under
    //      test, so Bench times write + read-back together). ----
    "q_tokenized_export" -> ((s, dir) => {
      val d = documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"), graft.functions.TextFunctions.tokens(
          graft.functions.TextFunctions.normalizeText(col("text"))).as("toks"))
      val vocab = graft.sources.TokenizedExport.vocabulary(d, "toks")
      val enc = graft.sources.TokenizedExport.encodeIds(d, "toks", vocab)
        .select("doc_id", "token_ids")
      val out = new java.io.File(
        s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/tokbin")
      graft.sources.TokenizedExport.write(enc, "doc_id", "token_ids",
        out.getPath, nShards = 4, vocabSize = vocab.count().toInt)
      graft.sources.TokenizedExport.read(s, out.getPath)
        .select(col("doc_id"), col("shard"),
          col("ordinal").cast("long").as("ordinal"),
          size(col("token_ids")).cast("long").as("n_tokens"),
          array_join(col("token_ids").cast("array<string>"), " ").as("ids"))
        .orderBy("doc_id")
    }),

    // ---- deterministic token-budget mix selection: keep documents in
    //      shuffle order while the running char total fits the budget.
    //      Distributed prefix sums (range partition + broadcast
    //      offsets + per-partition window); over-budget partitions are
    //      pruned before the window runs. All-integer output. ----
    "q_token_budget" -> ((s, dir) =>
      graft.operators.Sampling.tokenBudgetSelect(
        documents(s, dir).select("doc_id", "n_chars"), "doc_id", "n_chars",
        budget = 50000L)
        .select("doc_id", "running_total").orderBy("doc_id")),

    // ---- per-group token budgets ("at most N chars per language",
    //      with an override): the budget-denominated quotaPerGroup.
    //      Grouped two-phase prefix sums — no whole-group
    //      single-task sort. ----
    "q_token_budget_group" -> ((s, dir) =>
      graft.operators.Sampling.tokenBudgetPerGroup(
        documents(s, dir).select("doc_id", "lang", "n_chars"),
        "lang", "doc_id", "n_chars",
        budget = 5000L, overrides = Map("en" -> 12000L))
        .select("doc_id", "lang", "running_total").orderBy("doc_id")),

    // ---- weighted reservoir sample (Efraimidis–Spirakis A-ES, keyed
    //      by the engine-portable hash): exactly k rows, inclusion
    //      probability ∝ weight (n_chars here — longer docs likelier).
    //      Oracle re-derives the same ln(u)/w keys and takes the same
    //      top-k; the rank-k key gap is orders above cross-engine ln()
    //      jitter (continuous random keys, ~1e-3 spacing at n=500). ----
    "q_sample_weighted" -> ((s, dir) =>
      graft.operators.Sampling.weightedReservoir(
        documents(s, dir).select("doc_id", "n_chars"), "doc_id", "n_chars",
        k = 100)
        .orderBy("doc_id")),

    // ---- HTML → text extraction (the step BEFORE every text gate
    //      when the source is raw crawl markup): each doc is wrapped in
    //      a deterministic page — head with style+script payloads, a
    //      comment, a heading, the prose in <p>, an entity sampler
    //      (incl. the &amp;lt; double-decode trap), and per-parity
    //      either a <br> line pair or a <ul> list. Both engines extract
    //      the SAME page through the SAME RE2-portable chain — payload
    //      removal, block-closer newlines, tag strip, pinned-order
    //      entity decode, whitespace collapse. ----
    "q_html_extract" -> ((s, dir) => {
      val page = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style type=\"text/css\">body { margin: 0 }</style>" +
          "<script>var a = \"<p>hidden</p>\";</script></head>" +
          "<body><!-- nav\nblock --><h1>Heading "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><div>5 &lt; 6 &amp; it&#39;s&nbsp;\"ok&quot;</div>" +
          "<p>Literal: &amp;lt; stays</p>"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("alpha<br>beta"))
          .otherwise(lit("<ul><li>one</li><li>two</li></ul>")),
        lit("</body></html>"))
      documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.TextFunctions.htmlToText(page).as("text"))
        .orderBy("doc_id")
    }),

    // ---- RFC 9309 robots.txt gate ("may I even ingest this page"):
    //      five deterministic robots/URL shapes by doc_id arithmetic —
    //      agent-group override beats *, path-prefix disallow, longest-
    //      match allow-over-disallow, wildcard+anchor block, the anchor
    //      NOT matching, and the no-robots default. The oracle derives
    //      the expected verdicts INDEPENDENTLY by id arithmetic — never
    //      by evaluating robots rules. ----
    "q_robots_filter" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(6))
      val robots = when(m === 0, lit(
          "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\nAllow: /\n"))
        .when(m === 1, lit("User-agent: *\nDisallow: /private\n"))
        .when(m === 2, lit("User-agent: *\nAllow: /page\nDisallow: /\n"))
        .when(m.isin(3, 4), lit("User-agent: *\nDisallow: /*.gif$\n"))
        .otherwise(lit(""))
      val url = when(m === 0, lit("https://ex.com/anything"))
        .when(m === 1, lit("https://ex.com/private/p1"))
        .when(m === 2, lit("https://ex.com/page"))
        .when(m === 3, lit("https://ex.com/img/a.gif"))
        .when(m === 4, lit("https://ex.com/img/a.gifx"))
        .otherwise(lit("https://ex.com/open"))
      documents(s, dir).select(col("doc_id"),
          graft.functions.UrlFunctions.robotsAllowed(robots,
            graft.functions.UrlFunctions.urlPathQuery(url))
            .cast("int").as("allowed"))
        .orderBy("doc_id")
    }),

    // ---- CRAWL-INGESTION pipeline (raw markup → curated text — the
    //      front half every web corpus pays before the q_curation_*
    //      chains): robots gate (drop disallowed pages) → HTML → text
    //      extraction → Unicode hygiene (the prose line carries a
    //      dirty NFC/zero-width/BEL tail) → boilerplate line strip
    //      (the extraction's heading/entity debris lines die here) →
    //      character length gate. Stage-for-stage oracle: the
    //      q_robots_filter id arithmetic, the q_html_extract RE2
    //      chain, the q_unicode_clean normalize+strip, the
    //      q_boilerplate list_filter, one integer length compare. ----
    "q_crawl_pipeline" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      import graft.functions.UrlFunctions._
      documents(s, dir).where(col("text").isNotNull)
        .where(robotsAllowed(crawlRobots, urlPathQuery(crawlUrl)))
        .select(col("doc_id"),
          stripBoilerplate(cleanUnicode(htmlToText(crawlPage))).as("clean"))
        .where(length(col("clean")) >= 100)
        .orderBy("doc_id")
    }),

    // ---- Luhn-validated card redaction (precision PII): every 4th
    //      doc gets a VALID 16-digit card appended (check digit
    //      computed by the Luhn rule from doc_id-derived digits),
    //      every 7th an INVALID one — redactCards must consume exactly
    //      the valid candidates. Candidate counts, validity and the
    //      post-redaction length all re-derive in DuckDB (the check
    //      digit itself recomputed with list arithmetic, so the Luhn
    //      math is cross-engine-pinned). ----
    "q_pii_cards" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val mkValid = udf { (id: Long) =>
        val body = "4" + ("%014d".format(id % 100000000L))
        body + luhnCheckDigit(body).toString
      }
      val mkInvalid = udf { (id: Long) =>
        val body = "4" + ("%014d".format(id % 100000000L))
        body + ((luhnCheckDigit(body) + 5) % 10).toString
      }
      val t = concat(col("text"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit(" "), mkValid(col("doc_id")))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" "), mkInvalid(col("doc_id")))).otherwise(lit("")))
      val cands = regexp_extract_all(t, lit(CardCandidatePattern), lit(0))
      val validUdf = udf { (xs: Seq[String]) => xs.count(luhnValid) }
      documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          size(cands).as("n_candidates"),
          validUdf(cands).as("n_valid"),
          length(redactCards(t)).as("len_redacted"))
        .orderBy("doc_id")
    }),

    // ---- hard-negative mining for contrastive pairs (ANCE/DPR
    //      recipe): k nearest CROSS-label neighbors per anchor, ranked
    //      within the filtered set. Labels by id arithmetic; full
    //      brute-force DuckDB replay (q_similarity_topk pattern + the
    //      label predicate). ----
    "q_hard_negatives" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .withColumn("label", pmod(col("vec_id"), lit(5)))
      graft.operators.Similarity.hardNegatives(
        e, e.filter(col("vec_id") < 8), "embedding", "vec_id", "label", k = 5)
        .select("query_id", "neighbor_id", "neighbor_label", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- Heaps'-law vocabulary-growth report: V at 10 id-ordered
    //      corpus prefixes via the first-occurrence trick (MIN doc per
    //      word — no cumulative window), decimal-exact OLS of ln(V) on
    //      ln(n). Fully replayed in DuckDB. ----
    "q_heaps_report" -> ((s, dir) => {
      val r = graft.operators.CorpusReport.heapsReport(
        documents(s, dir), "text", "doc_id", points = 10)
      val r4 = (c: String) => (floor(col(c) * 10000 + 0.5) / 10000).as(c)
      r.select(col("n_tokens"), col("n_types"), r4("heaps_beta"), r4("heaps_k"))
    }),

    // ---- the multimodal threads composed: WebDataset shards of PNG
    //      payloads in, dHash near-dup pairs, connected components,
    //      min-id representative per image family out — the "dedupe an
    //      image corpus that arrives as tar shards" path as ONE lazy
    //      chain. 180 images in 30 planted duplicate groups; the
    //      oracle derives family representatives from the SAME id
    //      arithmetic without running any of it. ----
    "q_wds_image_dedup" -> ((s, dir) => {
      import graft.sources.Tar
      val outDir = new java.io.File(
        s"/root/repo/data/tar_img_fixture/${new java.io.File(dir).getName}")
      outDir.mkdirs()
      Option(outDir.listFiles()).foreach(_.foreach(_.delete()))
      val base = outDir.getPath
      s.range(180).select(col("id"))
        .repartition(3, col("id"))
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          val entries = it.map { r =>
            val id = r.getLong(0)
            (f"$id%012d.png",
              graft.operators.Multimodal.ImageCodec.synthPng(16, 12, id % 30))
          }.toSeq
          if (entries.nonEmpty) {
            val gz = new java.util.zip.GZIPOutputStream(
              new java.io.FileOutputStream(new java.io.File(base, f"img_$pid%05d.tar.gz")))
            gz.write(Tar.recordBytes(entries)); gz.close()
          }
          Iterator.single(1)
        }.count()
      val imgs = Tar.webdatasetSamples(Tar.read(s, s"$base/*.tar.gz"))
        .select(col("sample_key").cast("long").as("id"),
          element_at(col("parts"), "png").as("payload"))
      val pairs = graft.operators.Multimodal.imageNearDupPairs(
        imgs, "payload", "id", maxHamming = 3)
      // (id, component): every image maps to its family's min id
      graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .orderBy("id")
    }),

    // ---- WebDataset TAR shards end-to-end (the multimodal-corpus
    //      interchange format): documents serialize as {id}.txt +
    //      {id}.cls entries into .tar.gz shards (pure-JDK ustar
    //      writer), Tar.read streams them back one task per shard,
    //      webdatasetSamples regroups by basename — and the recovered
    //      (doc_id, text, lang) frame must equal the parquet original
    //      (the q_warc lossless-hop oracle pattern). ----
    "q_webdataset" -> ((s, dir) => {
      import graft.sources.Tar
      val outDir = new java.io.File(
        s"/root/repo/data/tar_fixture/${new java.io.File(dir).getName}")
      outDir.mkdirs()
      Option(outDir.listFiles()).foreach(_.foreach(_.delete()))
      val base = outDir.getPath
      documents(s, dir).where(col("text").isNotNull)
        .select("doc_id", "lang", "text")
        .repartition(4, col("doc_id"))
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          val entries = it.flatMap { r =>
            val id = r.getLong(0)
            Seq((f"$id%012d.txt", r.getString(2).getBytes("UTF-8")),
              (f"$id%012d.cls", r.getString(1).getBytes("UTF-8")))
          }.toSeq
          if (entries.nonEmpty) {
            val gz = new java.util.zip.GZIPOutputStream(
              new java.io.FileOutputStream(new java.io.File(base, f"shard_$pid%05d.tar.gz")))
            gz.write(Tar.recordBytes(entries)); gz.close()
          }
          Iterator.single(1)
        }.count()
      Tar.webdatasetSamples(Tar.read(s, s"$base/*.tar.gz"))
        .select(col("sample_key").cast("long").as("doc_id"),
          decode(element_at(col("parts"), "txt"), "UTF-8").as("text"),
          decode(element_at(col("parts"), "cls"), "UTF-8").as("lang"))
        .orderBy("doc_id")
    }),

    // ---- video near-dup: per-frame dHash, positional banded match,
    //      pair kept when >= half the sampled frame positions agree
    //      within tolerance. Synth clips in 20 exact-duplicate groups
    //      (6 frames, stride 2 -> 3 sampled positions); id-arithmetic
    //      oracle expects every same-group pair at 3/3 matches. ----
    "q_video_neardup" -> ((s, dir) => {
      val synth = udf((i: Long) =>
        graft.operators.Multimodal.VideoCodec.synthVideo(16, 12, 6, i % 20))
      val vids = s.range(120).select(col("id"), synth(col("id")).as("payload"))
      graft.operators.Multimodal.videoNearDupPairs(vids, "payload", "id",
        every = 2, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // ---- audio near-dup by the FFT-free chromaprint-style
    //      fingerprint (Goertzel filterbank gradients): synth WAVs in
    //      30 exact-duplicate tone groups; the banded Hamming join
    //      must recover exactly the same-group pairs (id-arithmetic
    //      oracle; perceptual tolerances — volume invariance —
    //      spec-pinned). ----
    "q_audio_neardup" -> ((s, dir) => {
      val synth = udf((i: Long) =>
        graft.operators.Multimodal.AudioCodec.synthWavSweep(8000, 4000, i % 30))
      val wavs = s.range(240).select(col("id"), synth(col("id")).as("payload"))
      graft.operators.Multimodal.audioNearDupPairs(wavs, "payload", "id",
        maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // ---- image near-dup by perceptual dHash (re-encode/resize-robust
    //      fingerprint): 360 synthetic payloads in 40 exact-duplicate
    //      groups — the banded Hamming join must recover exactly the
    //      same-group pairs (inter-group dHashes sit ~32 bits apart, so
    //      the id-arithmetic oracle enumerates the full expected set;
    //      MultimodalSpec pins the perceptual tolerances on perturbed/
    //      resized payloads). Payloads never shuffle — only (id, hash)
    //      does. ----
    "q_image_neardup" -> ((s, dir) => {
      val synth = udf((i: Long) =>
        graft.operators.Multimodal.ImageCodec.synthPng(24, 16, i % 40))
      val imgs = s.range(360).select(col("id"), synth(col("id")).as("payload"))
      graft.operators.Multimodal.imageNearDupPairs(imgs, "payload", "id",
        maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // ---- Zipf's-law corpus report (the data-card frequency QA
    //      number): token/type totals + decimal-exact OLS fit of
    //      ln(freq) on ln(rank) over the top-200 types — one word
    //      shuffle, fit on a knob-bounded frame, fully replayed in
    //      DuckDB (DECIMAL(38,12) sums, same repeated slope
    //      expression). ----
    "q_zipf_report" -> ((s, dir) => {
      val r = graft.operators.CorpusReport.zipfReport(
        documents(s, dir), "text", topN = 200)
      val r4 = (c: String) => (floor(col(c) * 10000 + 0.5) / 10000).as(c)
      r.select(col("n_tokens"), col("n_types"), col("top_word"),
        col("top_freq"), r4("zipf_slope"), r4("zipf_intercept"))
    }),

    // ---- homoglyph skeleton folding (UTS #39 curated subset): every
    //      3rd doc gets Latin->Cyrillic lookalike substitution planted
    //      (visually identical, hashes apart — the spam evasion that
    //      dodges exact dedup), then foldConfusables must restore the
    //      original fingerprint. One translate() each way, replayed
    //      verbatim by DuckDB's translate over the same mapping. ----
    "q_confusables" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val mutated = when(pmod(col("doc_id"), lit(3)) === 0,
        translate(col("text"), "aeopc", "\u0430\u0435\u043E\u0440\u0441"))
        .otherwise(col("text"))
      documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          (md5(mutated) =!= md5(col("text"))).cast("int").as("mutated_differs"),
          (md5(foldConfusables(mutated)) === md5(col("text")))
            .cast("int").as("skeleton_matches"))
        .orderBy("doc_id")
    }),

    // ---- Rademacher (JL) random projection: 64-dim embeddings down to
    //      16 via a ±1 sign matrix derived driver-side from the md5
    //      walk the oracle replays; per-row ordered folds, map-side
    //      only, scale 1/sqrt(16)=0.25 exact. Output posexploded to
    //      scalar floats — the REAL cast is the canonicalizer, same as
    //      q_cosine_native. ----
    "q_jl_project" -> ((s, dir) => {
      Projection.rademacherProject(embeddings(s, dir), "embedding", "vec_id",
        dim = 64, outDim = 16, seed = 1L)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    }),

    // ---- chat/SFT conversation processing: documents synthesize into
    //      JSON turn lists (conv = doc_id%50, turns ordered by doc_id,
    //      roles alternate except the %7==0 all-user protocol breakers),
    //      then the REAL pipeline runs — JSON parse (fail-loud), role
    //      validation, flatten with loss-mask char spans. The oracle
    //      derives every output directly from the doc columns, so the
    //      JSON encode→parse round-trip is itself under test. ----
    "q_chat_flatten" -> ((s, dir) => {
      val d = documents(s, dir).where(col("text").isNotNull)
        .select(pmod(col("doc_id"), lit(50)).as("conv_id"), col("doc_id"),
          substring(col("text"), 1, 40).as("content"))
      val ranked = d.withColumn("rk", row_number().over(
        Window.partitionBy("conv_id").orderBy("doc_id")) - 1)
        .withColumn("role",
          when(pmod(col("conv_id"), lit(7)) === 0, lit("user"))
            .otherwise(when(col("rk") % 2 === 0, lit("user"))
              .otherwise(lit("assistant"))))
      val json = ranked.groupBy("conv_id").agg(
        to_json(transform(
          array_sort(collect_list(struct(col("rk"), col("role"), col("content")))),
          t => struct(t.getField("role").as("role"),
            t.getField("content").as("content")))).as("convo"))
      val turns = Chat.parseConversations(json, "convo", "conv_id")
      val flat = Chat.flattenWithSpans(turns, "conv_id")
      val valid = Chat.validateConversations(turns, "conv_id")
      flat.join(valid.select("conv_id", "n_turns", "valid"), "conv_id")
        .select("conv_id", "turn_ix", "role", "seg_start", "seg_end",
          "train_on", "n_turns", "valid")
        .orderBy("conv_id", "turn_ix")
    }),

    // ---- SFT last mile: pack the flattened conversations into
    //      120-token examples (whole conversations, 8 streams) and
    //      remap every turn's loss-mask span into example coordinates.
    //      Chat synthesis ∘ greedy layout ∘ one offsets window — the
    //      oracle replays the layout with the q_pack_sequences
    //      recursive CTE and the spans with the q_chat_flatten walk. ----
    "q_chat_pack" -> ((s, dir) => {
      val d = documents(s, dir).where(col("text").isNotNull)
        .select(pmod(col("doc_id"), lit(50)).as("conv_id"), col("doc_id"),
          substring(col("text"), 1, 40).as("content"))
      val ranked = d.withColumn("rk", row_number().over(
        Window.partitionBy("conv_id").orderBy("doc_id")) - 1)
        .withColumn("role",
          when(pmod(col("conv_id"), lit(7)) === 0, lit("user"))
            .otherwise(when(col("rk") % 2 === 0, lit("user"))
              .otherwise(lit("assistant"))))
        .select(col("conv_id"), col("rk").as("turn_ix"), col("role"), col("content"))
      Chat.packConversations(ranked, "conv_id", budgetTokens = 120, streams = 8)
        .orderBy("conv_id", "turn_ix")
    }),

    // ---- log-histogram quantile sketch: doc-length p50/p90/p99 per
    //      source + global, from the HdrHistogram-style integer bucket
    //      frame (subBits=5 → ≤3% relative error, estimate always a
    //      lower bound). Target ranks are exact rationals (ceil(p·n) in
    //      integer arithmetic — a double p·n flips at boundaries), so
    //      the WHOLE derivation is integer-exact and fully replayed,
    //      with the true rank values beside the estimates. ----
    "q_sketch_hist" -> ((s, dir) => {
      val d0 = documents(s, dir).where(col("n_chars").isNotNull)
        .select(col("source"), col("n_chars"))
      val d = d0.union(d0.select(lit("*").as("source"), col("n_chars")))
      val ps = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
      val est = Sketches.histQuantiles(
        Sketches.logHistogram(d, "n_chars", Seq("source"), subBits = 5),
        Seq("source"), ps, subBits = 5)
      val withRn = d.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("n_chars")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      val psDf = broadcast({ import s.implicits._; ps.toDF("p", "num", "den") })
      val exact = withRn.crossJoin(psDf)
        .where(col("rn") === expr("(n * num + den - 1) div den"))
        .select(col("source"), col("p"), col("n_chars").cast("long").as("q_exact"))
      est.join(exact, Seq("source", "p")).orderBy("source", "p")
    }),

    // ---- Z-order (Morton) layout key: the multi-column scan-pruning
    //      lever — bit-interleave (l_partkey, l_suppkey) at 16 bits
    //      each into one sort key so a range-partitioned write clusters
    //      rows close in BOTH dimensions into the same files. Pure
    //      integer arithmetic (disjoint powers of two summed), replayed
    //      bit-for-bit in the oracle; the rollup groups by z-prefix
    //      (the 256-cell hyper-box grid) and pins min/max/count per
    //      cell — exactly the per-file stats a pruning reader uses. ----
    "q_zorder" -> ((s, dir) => {
      val z = ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey")), bits = 16)
      lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"), z.as("z"))
        .groupBy(shiftright(col("z"), 24).as("z_prefix"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("z")).as("z_min"), max(col("z")).as("z_max"),
          min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
          min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
        .orderBy("z_prefix")
    }),

    // ---- Hilbert curve index: the stronger-locality layout key
    //      (consecutive indices are ALWAYS grid neighbors — spec-pinned
    //      as a law; Z jumps at quadrant seams). Same grid rollup as
    //      q_zorder; the oracle replays the identical unrolled xy2d
    //      levels as chained CTEs, all integer arithmetic. ----
    "q_hilbert" -> ((s, dir) => {
      ZOrder.hilbertValue(lineitem(s, dir).select("l_partkey", "l_suppkey"),
        "l_partkey", "l_suppkey", bits = 16, out = "h")
        .groupBy(shiftright(col("h"), 24).as("h_prefix"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("h")).as("h_min"), max(col("h")).as("h_max"),
          min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
          min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
        .orderBy("h_prefix")
    }),

    // ---- z-layout pruning audit: WRITE lineitem z-ordered into 16
    //      parquet files, then read the FOOTER statistics back (the
    //      exact min/max a pruning reader consults) — the oracle reads
    //      the SAME files through DuckDB's parquet_metadata, so two
    //      independent parquet implementations must agree on every
    //      row-group stat. Pins that layoutZOrdered produces really-
    //      prunable files, not just a sorted frame. ----
    "q_prune_stats" -> ((s, dir) => {
      val out = s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/zorder_layout"
      ZOrder.layoutZOrdered(
        lineitem(s, dir).select("l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"), bits = 16, nFiles = 16)
        .write.mode("overwrite").parquet(out)
      ZOrder.fileStats(s, out, "z_value").orderBy("ordinal")
    }),

    // ---- JL-space retrieval recall: exact top-10 by cosine in the
    //      16-dim PROJECTED space vs the 64-dim full space, hits per
    //      query. FULL oracle — both rankings replayed end-to-end (the
    //      projected floats are the q_jl_project values, so the two
    //      engines rank identical doubles). The gate quantifies what
    //      the 4x-cheaper JL front-end costs in recall — on THIS
    //      fixture that cost is large (~14% recall@10): the synthetic
    //      embeddings are near-isotropic, so neighbor cosine gaps sit
    //      inside the k=16 JL distortion and rankings flip freely.
    //      That is the honest read: JL is a DISTANCE-preserving
    //      front-end, fit for threshold near-dup screens and clustered
    //      real embeddings, not for fine ranking of isotropic data —
    //      use PQ/IVF (q_similarity_*) when ranking matters. ----
    "q_jl_recall" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val proj = Projection.rademacherProject(e, "embedding", "vec_id",
        dim = 64, outDim = 16, seed = 1L)
      val exactTop = Similarity.bruteForceTopK(
        e, e.filter(col("vec_id") < 8), "embedding", "vec_id", 10)
        .select(col("query_id"), col("neighbor_id"))
      val projTop = Similarity.bruteForceTopK(
        proj, proj.filter(col("vec_id") < 8), "proj", "vec_id", 10)
        .select(col("query_id"), col("neighbor_id"))
      val queries = e.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"))
      val hits = exactTop.join(projTop, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      queries.join(hits, Seq("query_id"), "left").na.fill(0L, Seq("n_hit"))
        .orderBy("query_id")
    }),

    // ---- mergeable-sketch family (Sketches.scala — the 100 TB rollup
    //      primitives): every sketch is md5-derived, deterministic and
    //      order-free, so the oracle replays the FULL construction in
    //      SQL — registers, signatures, and counters bit-for-bit, with
    //      the only transcendental (ln in HLL's linear-counting branch)
    //      4dp-rounded on both sides per the repo convention.
    //
    //      HLL distinct 3-gram estimate per source PLUS a global '*'
    //      row: per-source counts (~850 at sf0.01) land in the
    //      linear-counting branch, the global union (~16k) in the raw
    //      harmonic-mean branch — one gate exercises both. The
    //      indicator sum rides an exact DECIMAL(38,0) so partition
    //      order cannot flake the hash. ----
    "q_sketch_hll" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val toks = tokens(normalizeText(col("text")))
      val grams = graft.core.CacheScope.retain(
        documents(s, dir).where(col("text").isNotNull)
          .select(col("source"), explode(wordNgramsFromTokens(toks, 3)).as("g3"))
          .where(col("g3") =!= ""))
      val stream = grams.union(grams.select(lit("*").as("source"), col("g3")))
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(stream, "g3", Seq("source"), p = 10),
        Seq("source"), p = 10)
      val exact = stream.groupBy("source")
        .agg(countDistinct(col("g3")).as("n_exact"))
      est.join(exact, "source")
        .select("source", "set_buckets", "v_zero", "n_distinct_est", "n_exact")
        .orderBy("source")
    }),

    // ---- KMV source-overlap matrix: a <=k sorted-long signature per
    //      source (bounded-state typed Aggregator — map-side partials,
    //      k longs per group per task on the shuffle), then the
    //      pairwise distinct estimates and Jaccard computed from the
    //      SIGNATURES ALONE (the 100 TB selling point: the overlap
    //      matrix never re-reads the corpus). Exact counterparts ride
    //      beside the estimates. ----
    "q_sketch_kmv" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val k = 128
      val toks = tokens(normalizeText(col("text")))
      val grams = graft.core.CacheScope.retain(
        documents(s, dir).where(col("text").isNotNull)
          .select(col("source"), explode(wordNgramsFromTokens(toks, 3)).as("g3"))
          .where(col("g3") =!= ""))
      val sigs = Sketches.kmvSketch(grams, "g3", Seq("source"), k)
      val a = sigs.select(col("source").as("src_a"), col("kmv_sig").as("sig_a"))
      val b = sigs.select(col("source").as("src_b"), col("kmv_sig").as("sig_b"))
      val pairs = a.crossJoin(b).where(col("src_a") < col("src_b"))
      val dw = graft.core.CacheScope.retain(grams.distinct())
      val cn = dw.groupBy("source").agg(count(lit(1)).as("n"))
      val ix = dw.alias("x").join(dw.alias("y"),
          col("x.g3") === col("y.g3") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      pairs
        .join(ix, Seq("src_a", "src_b"), "left").na.fill(0L, Seq("n_inter"))
        .join(cn.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .join(cn.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"),
          Sketches.kmvEstimateCol(col("sig_a"), k).as("est_a"),
          Sketches.kmvEstimateCol(col("sig_b"), k).as("est_b"),
          Sketches.kmvJaccardCol(col("sig_a"), col("sig_b"), k).as("kmv_jaccard"),
          (floor(col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double")
            * 10000 + 0.5) / 10000).as("exact_jaccard"))
        .orderBy("src_a", "src_b")
    }),

    // ---- KMV set-operation estimates (theta-style): |A∩B| and |A\B|
    //      per source pair from the SIGNATURES ALONE, exact
    //      counterparts beside them — the cross-source audit arithmetic
    //      at 100 TB reads k longs per source, never the corpus. Same
    //      synthesis as q_sketch_kmv; the oracle extends its replay
    //      with the union-signature h_k and the two rounded
    //      estimator expressions in the same IEEE order. ----
    "q_sketch_setops" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val k = 128
      val toks = tokens(normalizeText(col("text")))
      val grams = graft.core.CacheScope.retain(
        documents(s, dir).where(col("text").isNotNull)
          .select(col("source"), explode(wordNgramsFromTokens(toks, 3)).as("g3"))
          .where(col("g3") =!= ""))
      val sigs = Sketches.kmvSketch(grams, "g3", Seq("source"), k)
      val a = sigs.select(col("source").as("src_a"), col("kmv_sig").as("sig_a"))
      val b = sigs.select(col("source").as("src_b"), col("kmv_sig").as("sig_b"))
      val pairs = a.crossJoin(b).where(col("src_a") < col("src_b"))
      val dw = graft.core.CacheScope.retain(grams.distinct())
      val cn = dw.groupBy("source").agg(count(lit(1)).as("n"))
      val ix = dw.alias("x").join(dw.alias("y"),
          col("x.g3") === col("y.g3") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      pairs
        .join(ix, Seq("src_a", "src_b"), "left").na.fill(0L, Seq("n_inter"))
        .join(cn.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .select(col("src_a"), col("src_b"),
          Sketches.kmvIntersectCol(col("sig_a"), col("sig_b"), k).as("est_inter"),
          Sketches.kmvDifferenceCol(col("sig_a"), col("sig_b"), k).as("est_diff"),
          col("n_inter").cast("long").as("exact_inter"),
          (col("n_a") - col("n_inter")).cast("long").as("exact_diff"))
        .orderBy("src_a", "src_b")
    }),

    // ---- KMV ASYMMETRIC containment matrix: C(A→B) = |A∩B|/|A| per
    //      source pair IN BOTH DIRECTIONS from the signatures alone —
    //      the provenance question Jaccard can't see (a small source
    //      swallowed by a big one scores high one way, low the other).
    //      Same synthesis as q_sketch_kmv; exact counterparts ride
    //      beside the estimates; the oracle extends the setops replay
    //      with the guarded ratio in the same IEEE order. ----
    "q_sketch_containment" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val k = 128
      val toks = tokens(normalizeText(col("text")))
      val grams = graft.core.CacheScope.retain(
        documents(s, dir).where(col("text").isNotNull)
          .select(col("source"), explode(wordNgramsFromTokens(toks, 3)).as("g3"))
          .where(col("g3") =!= ""))
      val sigs = Sketches.kmvSketch(grams, "g3", Seq("source"), k)
      val a = sigs.select(col("source").as("src_a"), col("kmv_sig").as("sig_a"))
      val b = sigs.select(col("source").as("src_b"), col("kmv_sig").as("sig_b"))
      val pairs = a.crossJoin(b).where(col("src_a") < col("src_b"))
      val dw = graft.core.CacheScope.retain(grams.distinct())
      val cn = dw.groupBy("source").agg(count(lit(1)).as("n"))
      val ix = dw.alias("x").join(dw.alias("y"),
          col("x.g3") === col("y.g3") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      val r4 = (c: Column, nm: String) => (floor(c * 10000 + 0.5) / 10000).as(nm)
      pairs
        .join(ix, Seq("src_a", "src_b"), "left").na.fill(0L, Seq("n_inter"))
        .join(cn.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .join(cn.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"),
          Sketches.kmvContainmentCol(col("sig_a"), col("sig_b"), k).as("est_cont_ab"),
          Sketches.kmvContainmentCol(col("sig_b"), col("sig_a"), k).as("est_cont_ba"),
          r4(col("n_inter").cast("double") / col("n_a").cast("double"), "exact_cont_ab"),
          r4(col("n_inter").cast("double") / col("n_b").cast("double"), "exact_cont_ba"))
        .orderBy("src_a", "src_b")
    }),

    // ---- count-min heavy hitters: one 4x1024 counter frame for the
    //      whole 3-gram stream (bounded whatever the corpus size,
    //      map-side-combined sums), the 20 heaviest grams point-queried
    //      against it via a broadcast join. Overcount-only guarantee:
    //      cms_est >= n_exact always, equality when the gram's 4 cells
    //      dodge collisions. ----
    "q_sketch_cms" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val toks = tokens(normalizeText(col("text")))
      val grams = graft.core.CacheScope.retain(
        documents(s, dir).where(col("text").isNotNull)
          .select(explode(wordNgramsFromTokens(toks, 3)).as("g3"))
          .where(col("g3") =!= ""))
      val counters = Sketches.cmsCounters(grams, "g3", depth = 4, widthPow = 10)
      val top = grams.groupBy("g3").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("g3")).limit(20)
      Sketches.cmsQuery(counters, top, "g3", depth = 4, widthPow = 10)
        .orderBy(col("n_exact").desc, col("g3"))
    }),

    // ---- dedup family-size histogram (the data-card number behind
    //      the cluster dedup: how many families of each size, plus the
    //      doc mass they hold). Composition of the q_dedup_cluster walk
    //      and two integer rollups — same recursive-CTE replay plus the
    //      same rollups in the oracle. ----
    "q_dedup_family_sizes" -> ((s, dir) => {
      graft.operators.Dedup.nearDupClusters(documents(s, dir), "text", "doc_id")
        .groupBy(col("cluster")).agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz").as("family_size"))
        .agg(count(lit(1)).as("n_families"),
          sum(col("__sz")).as("n_docs"))
        .orderBy("family_size")
    }),

    // ---- corpus n-gram novelty audit: fraction of each doc's
    //      distinct word 3-grams occurring in NO other doc — full
    //      integer re-derivation in DuckDB (the gopher tk/gram CTE
    //      machinery). ----
    "q_novelty" -> ((s, dir) => {
      val r4 = (c: org.apache.spark.sql.Column, nm: String) =>
        (floor(c * 10000 + 0.5) / 10000).as(nm)
      graft.operators.Dedup.noveltyScore(
        documents(s, dir), "text", "doc_id", n = 3)
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          r4(col("novelty"), "novelty"))
        .orderBy("doc_id")
    }),

    // ---- EXACT stratified split (8/1/1 by language): per-group
    //      hash-order ranks with integer cross-multiplied cuts via the
    //      grouped two-phase rank — per-group proportions exact to
    //      rounding, replayed by a per-group ROW_NUMBER + the same
    //      integer arithmetic. ----
    "q_split_stratified" -> ((s, dir) => {
      val d = documents(s, dir).where(col("text").isNotNull)
        .select("doc_id", "lang")
      graft.operators.Sampling.stratifiedSplit(d, "lang", "doc_id",
        Seq(("train", 8), ("valid", 1), ("test", 1)))
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")
    }),

    // ---- curriculum ordering: token-count difficulty cut into 4
    //      equal-frequency bands, deterministic seeded shuffle within
    //      each band, ONE global serving order (two-phase rank — no
    //      single-partition window). The oracle replays cuts
    //      (quantile_cont == exact percentile), bands, the portable
    //      md5 shuffle keys and the global ROW_NUMBER. ----
    "q_curriculum" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val docs = documents(s, dir).where(col("text").isNotNull)
        .withColumn("__score", tokenCount(col("text")))
      graft.operators.Sampling.curriculumOrder(docs, "__score", "doc_id", nBands = 4)
        .select(col("doc_id"), col("band"), col("curriculum_order"))
        .orderBy("doc_id")
    }),

    // ---- greedy k-center diverse subset selection (farthest-first
    //      traversal) over the embeddings table: k map-side distance
    //      scans into TakeOrdered(1), centers as broadcast literals.
    //      FULL oracle: the identical greedy unrolled as k layered
    //      1-row CTEs in DuckDB (argmax margins are corpus-scale;
    //      SamplingSpec probes them ≥ 1e-5 so a cross-engine cosine
    //      ulp cannot flip a selection); radius rides at REAL
    //      precision (the q_cosine_native float-trust pattern). ----
    "q_kcenter" -> ((s, dir) =>
      graft.operators.Sampling.kCenterSelect(
        Tables.embeddings(s, dir), "embedding", "vec_id", k = 8)
        .select(col("rank"), col("vec_id"),
          col("radius").cast("float").as("radius"))
        .orderBy("rank")),

    // ---- language ID over the corpus — the REAL model (r11 VERDICT
    //      ask #5): Cavnar–Trenkle character-n-gram rank profiles fit
    //      driver-side from the embedded reference slices, classified
    //      by out-of-place distance. Per-row oracle: the entire chain
    //      (space-padded 1..3-gram explosion, per-doc top-200 ranking
    //      with the portable (count desc, gram asc) tie rule, profile
    //      join, displacement sum, min-distance argmin with
    //      profile-order ties) re-derived in DuckDB from the SAME
    //      LangNgram.Profiles object generated into the SQL, so model
    //      and oracle can never drift apart silently. The marker
    //      heuristic TextFunctions.langId stays as the cheap scalar
    //      routing form used inside the curation screens. ----
    "q_langid" -> ((s, dir) =>
      graft.functions.LangNgram.classify(
        documents(s, dir).where(col("text").isNotNull), "text", "doc_id")
        .orderBy("doc_id")),

    // ---- the SAME crawl pipeline, end-to-end from an actual WARC
    //      archive (r10 VERDICT ask #7): the query first serializes
    //      every page (no pre-gating) into .warc.gz shards with its
    //      crawl URL as WARC-Target-URI and doc_id encoded in the
    //      record date (URLs repeat across docs by design — their
    //      robots-relevant shapes must survive byte round-tripping
    //      untouched), then Warc.read → robots gate on the READ
    //      target_uri → HTML extraction → hygiene → boilerplate →
    //      length gate. The oracle is the q_crawl_pipeline replay
    //      verbatim: the WARC hop must be lossless, so the same
    //      curated frame falls out. ----
    "q_warc_pipeline" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      import graft.functions.UrlFunctions._
      import graft.sources.Warc
      val outDir = new java.io.File(
        s"/root/repo/data/warc_pipeline_fixture/${new java.io.File(dir).getName}")
      outDir.mkdirs()
      Option(outDir.listFiles()).foreach(_.foreach(_.delete()))
      val base = outDir.getPath
      documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"), crawlUrl.as("url"), crawlPage.as("page"))
        .repartition(8, col("doc_id"))
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          val recs = it.map { r =>
            val id = r.getLong(0)
            ("response", r.getString(1),
              java.time.Instant.ofEpochSecond(1704067200L + id).toString,
              "text/html", r.getString(2).getBytes("UTF-8"))
          }.toSeq
          if (recs.nonEmpty) {
            val gz = new java.util.zip.GZIPOutputStream(
              new java.io.FileOutputStream(new java.io.File(base, f"part_$pid%05d.warc.gz")))
            gz.write(Warc.recordBytes(recs)); gz.close()
          }
          Iterator.single(1)
        }.count()
      Warc.read(s, s"$base/*.warc.gz")
        .select(
          (unix_timestamp(to_timestamp(col("date"))) - lit(1704067200L)).as("doc_id"),
          col("target_uri"),
          decode(col("payload"), "UTF-8").as("page"))
        .where(robotsAllowed(crawlRobots, urlPathQuery(col("target_uri"))))
        .select(col("doc_id"),
          stripBoilerplate(cleanUnicode(htmlToText(col("page")))).as("clean"))
        .where(length(col("clean")) >= 100)
        .orderBy("doc_id")
    }),
    // ---- span-duplication audit (the data-card number behind the
    //      ExactSubstr scrub): per language, how many tokens sit inside
    //      duplicated ≥8-token windows. Fully-scrubbed docs count all
    //      tokens removed; zero-token docs contribute zero. The oracle
    //      reuses the q_dedup_spans window replay and rolls it up. ----
    "q_span_stats" -> ((s, dir) =>
      graft.operators.Dedup.spanDuplicationStats(
        documents(s, dir), "text", "doc_id", "lang")
        .orderBy("lang")),

    // ---- line-level boilerplate strip (CCNet/Dolma header-footer
    //      pass): the fixture text is single-line prose, so the query
    //      wraps each doc in deterministic nav/footer chrome (menu,
    //      copyright, cookie banner) — both engines strip the SAME
    //      composite document and must keep exactly the prose line.
    //      Codegen'd split→filter→rejoin, replayed in DuckDB with
    //      list_filter over identical arithmetic. ----
    "q_boilerplate" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val framed = concat(
        lit(">> home | products | login | cart (0) <<\n"), col("text"),
        lit("\n(c) 2024 | all rights reserved.\ncookies: accept-all"))
      documents(s, dir).select(col("doc_id"),
        stripBoilerplate(framed).as("clean"))
        .orderBy("doc_id")
    }),

    // ---- near-dup FAMILIES: connected components of the verified LSH
    //      pair graph, min-member labels — the cluster form of dedup
    //      that collapses transitive edit-chains (vs q_dedup_minhash's
    //      pairwise rule). Oracle: recursive-CTE components over the
    //      exact all-pairs Jaccard graph (the q_dbscan machinery); the
    //      LSH-pairs-equal-exact-pairs recall argument is inherited
    //      verbatim from q_dedup_minhash (same banding, same corpus). ----
    "q_dedup_cluster" -> ((s, dir) =>
      graft.operators.Dedup.nearDupClusters(documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")),

    // ---- corpus snapshot diff (dataset-versioning audit). Synthetic
    //      v1/v2 derived from documents by id arithmetic: m=0 docs
    //      exist only in v1 (removed), m=4 only in v2 (added), m=2
    //      edited between snapshots (changed), m∈{1,3} untouched
    //      (omitted). The oracle derives the expected statuses
    //      INDEPENDENTLY from the same arithmetic — it never runs a
    //      diff, so the hash checks intended semantics. ----
    "q_corpus_diff" -> ((s, dir) => {
      val d = documents(s, dir)
      val m = pmod(col("doc_id"), lit(5))
      val before = d.where(m =!= 4).select(col("doc_id"), col("text"))
      val after = d.where(m =!= 0).select(col("doc_id"),
        when(m === 2, concat(col("text"), lit(" edited")))
          .otherwise(col("text")).as("text"))
      graft.operators.Dedup.corpusDiff(before, after, "text", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- cross-source near-dup overlap matrix (dataset-card audit:
    //      which sources ship the same content). LSH pairs ≡ exact
    //      all-pairs at this banding/corpus (the q_dedup_minhash
    //      argument, inherited verbatim), rolled up by unordered
    //      source pair. ----
    "q_source_overlap" -> ((s, dir) =>
      graft.operators.Dedup.groupOverlapMatrix(
        documents(s, dir), "text", "doc_id", "source")
        .orderBy("group_a", "group_b")),

    // ---- PII redaction (C4-style scrub): email → <EMAIL>, dotted-quad
    //      → <IP>, 9+-digit run → <NUMBER>, a codegen'd regexp_replace
    //      chain over RE2-compatible patterns. The fixture text carries
    //      no planted PII, so the query prepends a deterministic
    //      id-derived contact line — both engines scrub the SAME
    //      composite string, and the real text tail keeps the patterns
    //      honest against arbitrary content. ----
    "q_pii_redact" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      val d = col("doc_id").cast("string")
      val planted = concat(
        lit("reach me at user"), d, lit("@mail"),
        pmod(col("doc_id"), lit(7)).cast("string"), lit(".example.org or 10."),
        pmod(col("doc_id"), lit(250)).cast("string"), lit(".0.1 acct 9021"),
        (col("doc_id") * 100000 + 77).cast("string"), lit(" :: "), col("text"))
      documents(s, dir)
        .select(col("doc_id"), redactPii(planted).as("clean"))
        .orderBy("doc_id")
    }),

    // ---- Unicode text hygiene (the CCNet pre-hashing contract): NFC
    //      normalization (native codegen'd expression over the JDK
    //      normalizer) + invisible-character scrub. The fixture text is
    //      ASCII, so the query appends a deterministic dirty tail —
    //      decomposed e+U+0301 (→ é), zero-widths, a BEL, a CRLF, and
    //      Å spelled COMPOSED on odd ids / DECOMPOSED on even ids (both
    //      must emerge identical). The oracle replays via DuckDB's
    //      utf8proc nfc_normalize + the same RE2-portable strip class —
    //      two independent UAX #15 implementations agreeing byte-for-
    //      byte. ----
    "q_unicode_clean" -> ((s, dir) => {
      // every non-ASCII/control char spelled as a \u escape so the
      // source stays plain text under grep/diff (the r9 ADVICE lesson)
      val dirty = concat(col("text"),
        lit(" cafe\u0301 \u200Bzero\u200Dwidth \u0007bell\r\nnext"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit(" A\u030A"))
          .otherwise(lit(" \u00C5")))
      documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.TextFunctions.cleanUnicode(dirty).as("text"))
        .orderBy("doc_id")
    }),

    // ---- mojibake repair (the ftfy core case): five deterministic
    //      encoding-damage shapes appended by id arithmetic — Latin-1
    //      double-encode, cp1252 punctuation triples, an undefined-byte
    //      closing quote, TRUE Latin-1 prose (must stay), mixed
    //      CJK+mojibake (repair would destroy the CJK, must stay). The
    //      oracle writes the expected repaired text directly by the
    //      same arithmetic — never by running a repair. ----
    "q_mojibake" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(5))
      val tail = when(m === 0, lit(" caf\u00C3\u00A9"))
        .when(m === 1, lit(" it\u00E2\u20AC\u2122s fine"))
        .when(m === 2, lit(" \u00E2\u20AC\u0153q\u00E2\u20AC\u009D"))
        .when(m === 3, lit(" na\u00EFve r\u00E9sum\u00E9"))
        .otherwise(lit(" \u4E2D\u6587 caf\u00C3\u00A9"))
      documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.TextFunctions.fixMojibake(concat(col("text"), tail))
            .as("text"))
        .orderBy("doc_id")
    }),

    // ---- URL canonicalization + registrable domain (the C4/CCNet
    //      url-dedup primitives). The documents table has no URL
    //      column, so the query synthesizes five deterministic messy
    //      shapes per doc_id (case soup, default/explicit ports,
    //      userinfo, tracking params, duplicate/trailing slashes,
    //      fragments, multi-part TLDs). The oracle derives the expected
    //      canonical forms INDEPENDENTLY by doc_id arithmetic — it does
    //      not re-implement the string surgery, so the hash compare
    //      checks intended semantics, not a parallel port. ----
    "q_url_normalize" -> ((s, dir) => {
      import graft.functions.UrlFunctions._
      val d = col("doc_id").cast("string")
      val url = when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit("HTTP://WWW.Example.COM:80/Docs//"), d,
            lit("/?utm_source=feed&id="), d, lit("#frag")))
        .when(pmod(col("doc_id"), lit(5)) === 1,
          concat(lit("https://user:pw@News.Example.co.uk:443/Article?id="), d,
            lit("&fbclid=abc123&page=2")))
        .when(pmod(col("doc_id"), lit(5)) === 2,
          concat(lit("https://cdn.example.org:8080/a//b///"), d))
        .when(pmod(col("doc_id"), lit(5)) === 3,
          concat(lit("http://blog.example.com/post/"), d, lit("/")))
        .otherwise(
          concat(lit("https://Example.net/?gclid=x&q="), d, lit("&utm_campaign=z")))
      documents(s, dir)
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          urlCanonicalize(col("url")).as("canonical_url"),
          urlHost(col("url")).as("host"),
          registrableDomain(urlHost(col("url"))).as("domain"))
        .orderBy("doc_id")
    }),

    // ---- URL-level dedup — the composition the C4 crawl rule runs
    //      ("one document per page"): two messy spellings of the SAME
    //      page per doc (tracking params vs case soup + default port +
    //      userinfo + duplicate/trailing slashes + fragment) collapse
    //      onto one canonical key; the min url_id survives. Oracle
    //      derives survivors INDEPENDENTLY by id arithmetic (url_id =
    //      2·doc_id, canonical spelled out directly) — it never
    //      canonicalizes, so the hash checks intended semantics. ----
    "q_url_dedup" -> ((s, dir) => {
      val d = col("doc_id").cast("string")
      val variants = documents(s, dir).select(col("doc_id"))
        .select(col("doc_id"), explode(array(lit(0), lit(1))).as("__v"))
        .select((col("doc_id") * 2 + col("__v")).as("url_id"),
          when(col("__v") === 0,
            concat(lit("https://example.com/p/"), d, lit("?utm_source=feed")))
            .otherwise(concat(lit("HTTPS://crawler@EXAMPLE.com:443/p//"), d,
              lit("/#top"))).as("url"))
      Dedup.urlDedup(variants, "url", "url_id")
        .select(col("url_id"),
          graft.functions.UrlFunctions.urlCanonicalize(col("url")).as("canonical_url"))
        .orderBy("url_id")
    }),

    // ---- registrable domain driven by a full public-suffix list
    //      (plain + wildcard + exception rules, publicsuffix.org
    //      semantics) with built-in fallback for unlisted TLDs — the
    //      deployment path that fixes the silent wrong answers of the
    //      20-entry subset on com.ar/co.id-class hosts. Oracle derives
    //      every expected domain INDEPENDENTLY by doc_id arithmetic. ----
    "q_url_domain_psl" -> ((s, dir) => {
      import s.implicits._
      val psl = Seq("// synthetic public-suffix slice", "com.ar", "co.id",
        "com.tw", "*.ck", "!www.ck").toDF("rule")
      val d = col("doc_id").cast("string")
      val m = pmod(col("doc_id"), lit(6))
      val host = when(m === 0, concat(lit("www.shop.site"), d, lit(".com.ar")))
        .when(m === 1, concat(lit("a.b.page"), d, lit(".co.id")))
        .when(m === 2, concat(lit("x.brand"), d, lit(".com.tw")))
        .when(m === 3, concat(lit("sub"), d, lit(".host"), d, lit(".ck")))
        .when(m === 4, concat(lit("deep.sub"), d, lit(".www.ck")))
        .otherwise(concat(lit("blog.site"), d, lit(".org")))
      documents(s, dir).select(col("doc_id"), host.as("host"))
        .withColumn("domain",
          graft.functions.UrlFunctions.registrableDomainWith(col("host"), psl))
        .orderBy("doc_id")
    }),

    // ---- the same PSL walk at REALISTIC list scale: a 10,000-rule
    //      synthetic suffix list (9000 plain + 500 wildcard + 500
    //      exception rules, generated by id arithmetic so the oracle
    //      derives every expected domain independently) — exercises the
    //      broadcast hash-set build and the per-row walk at the size of
    //      the real publicsuffix.org file (~9.5k rules). ----
    "q_url_domain_psl10k" -> ((s, dir) => {
      val k = col("id")
      val psl = s.range(10000).select(
        when(k < 9000, concat(lit("t"), k.cast("string"), lit(".zz")))
          .when(k < 9500, concat(lit("*.w"), (k - 9000).cast("string"), lit(".zz")))
          .otherwise(concat(lit("!x.w"), (k - 9500).cast("string"), lit(".zz")))
          .as("rule"))
      val d = col("doc_id").cast("string")
      val m = pmod(col("doc_id"), lit(4))
      val t = pmod(col("doc_id"), lit(9000)).cast("string")
      val w = pmod(col("doc_id"), lit(500)).cast("string")
      val host = when(m === 0, concat(lit("a.b.t"), t, lit(".zz")))
        .when(m === 1, concat(lit("a.y.w"), w, lit(".zz")))
        .when(m === 2, concat(lit("deep.x.w"), w, lit(".zz")))
        .otherwise(concat(lit("foo.bar"), d, lit(".qq")))
      documents(s, dir).select(col("doc_id"), host.as("host"))
        .withColumn("domain",
          graft.functions.UrlFunctions.registrableDomainWith(col("host"), psl))
        .orderBy("doc_id")
    }),

    // ---- sequence packing: greedy fixed-budget layout of documents
    //      into training sequences (8 streams dealt by doc_id mod 8,
    //      id-order greedy fill, 256-token budget). One narrow shuffle +
    //      per-stream sequential scan; the oracle replays the identical
    //      greedy recurrence with a per-stream recursive CTE. ----
    "q_pack_sequences" -> ((s, dir) =>
      graft.operators.Packing.packSequences(documents(s, dir), "text", "doc_id",
        budgetTokens = 256, streams = 8)
        .orderBy("doc_id")),

    // ---- packing-efficiency audit: per-stream pack count, carried
    //      tokens, and utilization (padding-waste complement) over the
    //      q_pack_sequences layout — the oracle extends the same
    //      recursive-CTE replay with a rollup. ----
    "q_pack_stats" -> ((s, dir) =>
      graft.operators.Packing.packingStats(documents(s, dir), "text", "doc_id",
        budgetTokens = 256, streams = 8)
        .orderBy("stream")),

    // ---- BPE-token-denominated packing: the same greedy layout with
    //      budgets counted in REAL subword tokens (Bpe.tokenCount under
    //      the corpus-fit model) instead of whitespace tokens — what a
    //      training run actually packs against. The oracle replays the
    //      full BPE apply (recursive-CTE merge replay over the emitted
    //      merge table) to re-derive every per-doc count, then the
    //      packing recurrence on those counts. ----
    "q_pack_bpe" -> ((s, dir) => {
      val docs = documents(s, dir)
      // 40 merges (vs q_bpe_tokens' 200): the synthetic corpus has a
      // ~31-word vocabulary that 200 merges fully merges back to one
      // token per word — identical to whitespace counts, so the BPE
      // denomination would not bite; at 40 merges words stay subword-
      // split and budgets genuinely repack
      val model = graft.functions.Bpe.fit(docs, "text", numMerges = 40)
      import s.implicits._
      writeOracleSide(model.merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }.toDF("rank", "a", "b"),
        dir, "bpe_merges_pack")
      graft.operators.Packing.packSequencesBy(docs,
        graft.functions.Bpe.tokenCount(col("text"), model), "doc_id",
        budgetTokens = 256, streams = 8)
        .orderBy("doc_id")
    }),

    // ---- byte-level BPE packing (r11 VERDICT ask #6): the q_pack_bpe
    //      replay with budgets counted in GPT-2-style BYTE-level BPE
    //      tokens — pretokenizer regex + byte→printable mapping + merges
    //      over byte units, what a production trainer actually counts.
    //      The oracle re-derives every per-doc count from scratch: the
    //      same pretokenization (regex + whitespace-donation fixup,
    //      replayed with RE2), initial units as hex byte pairs of
    //      encode(w) (bijective to the mapped alphabet — concatenation
    //      commutes), the recursive-CTE merge replay over the emitted
    //      hex merge table, then the packing recurrence. ----
    "q_pack_bpe_bytes" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.functions.Bpe.fitBytes(docs, "text", numMerges = 40)
      import s.implicits._
      writeOracleSide(model.merges.zipWithIndex
        .map { case ((a, b), i) =>
          (i, graft.functions.Bpe.unitHex(a), graft.functions.Bpe.unitHex(b)) }
        .toDF("rank", "a", "b"),
        dir, "bpe_merges_bytes")
      graft.operators.Packing.packSequencesBy(docs,
        graft.functions.Bpe.tokenCountBytes(col("text"), model), "doc_id",
        budgetTokens = 256, streams = 8)
        .orderBy("doc_id")
    }),

    // ---- byte-level BPE losslessness, end to end on the corpus: the
    //      query emits detokenize(tokenize(text)) and the ORACLE emits
    //      the original text — the hash matches only if the pretokenizer
    //      covers every character class, the byte map is a bijection,
    //      and merges only ever concatenate. Any silent mangling
    //      anywhere in the chain breaks the gate. ----
    "q_bpe_roundtrip" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.functions.Bpe.fitBytes(docs, "text", numMerges = 40)
      docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.Bpe.detokenizeBytesCol(
            graft.functions.Bpe.tokenizeBytes(col("text"), model)).as("text"))
        .orderBy("doc_id")
    }),

    // ---- tokenizer fertility report: bytes/chars per byte-level BPE
    //      token, rolled up per source — the compression-ratio audit a
    //      tokenizer owner runs per language/domain slice (fertility
    //      regressions silently inflate training cost). Integer sums;
    //      the two ratios are double divisions of those integers,
    //      rounded 1e-4. Oracle: the q_pack_bpe_bytes count re-derivation
    //      (own side table) rolled up per source. ----
    "q_tokenizer_fertility" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.functions.Bpe.fitBytes(docs, "text", numMerges = 40)
      import s.implicits._
      writeOracleSide(model.merges.zipWithIndex
        .map { case ((a, b), i) =>
          (i, graft.functions.Bpe.unitHex(a), graft.functions.Bpe.unitHex(b)) }
        .toDF("rank", "a", "b"),
        dir, "bpe_merges_fert")
      def r4(c: Column) = floor(c * 1e4 + 0.5) / 1e4
      docs.where(col("text").isNotNull)
        .select(col("source"), col("text"),
          graft.functions.Bpe.tokenCountBytes(col("text"), model).as("__nt"))
        .groupBy("source")
        .agg(sum(octet_length(col("text"))).as("n_bytes"),
          sum(length(col("text"))).as("n_chars"),
          sum(col("__nt")).as("n_tokens"))
        .withColumn("bytes_per_token",
          when(col("n_tokens") === 0, lit(null))
            .otherwise(r4(col("n_bytes").cast("double") / col("n_tokens").cast("double"))))
        .withColumn("chars_per_token",
          when(col("n_tokens") === 0, lit(null))
            .otherwise(r4(col("n_chars").cast("double") / col("n_tokens").cast("double"))))
        .orderBy("source")
    }),

    // ---- context-window chunking: split each doc's canonical token
    //      stream into ≤32-token windows overlapping by 8 — the
    //      long-document complement of sequence packing. Map-side only;
    //      the oracle replays the same window arithmetic with
    //      generate_series + list slicing. ----
    "q_chunk_windows" -> ((s, dir) =>
      graft.operators.Packing.chunkWindows(documents(s, dir), "text", "doc_id",
        maxTokens = 32, overlap = 8)
        .orderBy("doc_id", "chunk_ix")),

    // ---- corpus n-gram census: occurrence counts of every word 3-gram
    //      corpus-wide, top 25 — ordered by (count desc, gram asc) so
    //      the LIMIT selection is deterministic through count ties. ----
    "q_corpus_ngrams" -> ((s, dir) =>
      graft.functions.TextFunctions.corpusNgramCounts(documents(s, dir), "text", 3)
        .orderBy(col("n_occurrences").desc, col("gram"))
        .limit(25)),

    // ---- deterministic train/valid/test hash split: per-id bucket from
    //      the portable 60-bit hash against integer thresholds — stable
    //      under corpus growth, no shuffle, engine-reproducible. ----
    "q_split_hash" -> ((s, dir) =>
      graft.operators.Sampling.hashSplit(
        documents(s, dir).select("doc_id"), "doc_id",
        Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
        .orderBy("doc_id")),

    // ---- LEAKAGE-SAFE split: hashSplit keyed by near-dup family (min
    //      member id), so a near-duplicate pair can never straddle the
    //      train/eval boundary. Oracle: exact all-pairs Jaccard →
    //      recursive-CTE components (the q_dedup_cluster pattern, LSH ≡
    //      exact at this corpus/banding) → the same md5 walk against
    //      the same embedded integer thresholds as q_split_hash. ----
    "q_split_leakage" -> ((s, dir) =>
      graft.operators.Sampling.leakageSafeSplit(
        documents(s, dir).select("doc_id", "text"), "text", "doc_id",
        Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
        .select("doc_id", "split").orderBy("doc_id")),

    // ---- per-domain caps (the C4 crawl rule "at most N pages per
    //      registrable domain"): pay-level-domain extraction composed
    //      with the exact per-group quota — hosts synthesized by id
    //      arithmetic over a multi-part TLD so the oracle derives both
    //      the domain and the survivors independently. ----
    "q_domain_quota" -> ((s, dir) => {
      val d = col("doc_id").cast("string")
      val host = concat(lit("sub"), d, lit(".site"),
        pmod(col("doc_id"), lit(3)).cast("string"), lit(".co.uk"))
      val withDomain = documents(s, dir).select(col("doc_id"))
        .withColumn("domain", graft.functions.UrlFunctions.registrableDomain(host))
      graft.operators.Sampling.quotaPerGroup(withDomain, "domain", "doc_id",
        quota = 40)
        .orderBy("doc_id")
    }),

    // ---- blocklist gates (the C4 "bad words" page filter + the
    //      "never ingest these sites" domain rule): token blocklist
    //      over the canonical token stream, domain blocklist at the
    //      pay-level domain so subdomains block with their site. Both
    //      codegen'd scalar predicates; hosts and survivors derived
    //      independently by id arithmetic in the oracle. ----
    // ---- model-based quality filtering (the FineWeb-Edu/DCLM
    //      classifier stage): ridge-IRLS logistic regression over
    //      three engine-replayable features, fit DISTRIBUTED but
    //      deterministic (exact-decimal Gram aggregates, fixed
    //      iteration count), scored map-side. The gate compares the
    //      LINEAR score η and the decision (η ≥ 0 ⇔ p ≥ ½) so the
    //      oracle replays pure arithmetic — no cross-engine exp. ----
    "q_quality_classifier" -> ((s, dir) => {
      val docs = documents(s, dir)
      val labeled = docs.withColumn("label",
        (graft.functions.TextFunctions.tokenCount(col("text")) >= 40).cast("int"))
      val model = graft.operators.QualityClassifier.fit(labeled, "text", "label")
      writeOracleSide(model.toFrame(s), dir, "quality_clf")
      docs.select(col("doc_id"),
        (floor(model.linearScore(col("text")) * 1e4 + 0.5) / 1e4).as("eta"),
        (model.linearScore(col("text")) >= 0).cast("int").as("pred"))
        .orderBy("doc_id")
    }),

    // ---- the classifier FIT itself oracled (companion to
    //      q_quality_classifier, which gates the scoring from exported
    //      weights): ONE ridge-IRLS Newton step from w = 0 is
    //      transcendental-free (η ≡ 0 ⇒ p = ½ exactly, s = ¼,
    //      g = y − ½ — all exact rationals), so the oracle re-derives
    //      the WEIGHTS themselves with no side table: the same
    //      decimal(38,6) Gram/gradient sums, then the same 4×4
    //      partially-pivoted Gaussian elimination unrolled in SQL —
    //      the identical IEEE operation sequence, so the weights match
    //      bit for bit. (The full 8-step fit crosses exp per
    //      iteration, whose last-ulp behavior is engine-specific — the
    //      same reason every gate here compares η, not σ(η); the
    //      8-step fit stays pinned by QualityClassifierSpec.) ----
    "q_quality_fit1" -> ((s, dir) => {
      val docs = documents(s, dir)
      val labeled = docs.withColumn("label",
        (graft.functions.TextFunctions.tokenCount(col("text")) >= 40).cast("int"))
      graft.operators.QualityClassifier.fit(labeled, "text", "label", iters = 1)
        .toFrame(s).orderBy("feature")
    }),

    // ---- model-stage FILTERING end-to-end, zero side tables: fit the
    //      one-step model on the corpus split, score EVERY doc with the
    //      codegen'd linear score, keep η ≥ 0 — the full FineWeb-style
    //      classifier filter whose model the oracle derives itself
    //      (weights bit-identical via the fit1 replay, scoring the same
    //      IEEE sequence, null text → null η → dropped like every
    //      null-drop gate). ----
    "q_quality_filter1" -> ((s, dir) => {
      val docs = documents(s, dir)
      val train = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
        .withColumn("label",
          (graft.functions.TextFunctions.tokenCount(col("text")) >= 40).cast("int"))
      val m = graft.operators.QualityClassifier.fit(train, "text", "label", iters = 1)
      docs.where(graft.functions.TextFunctions.evalHere(m.linearScore(col("text")) >= 0))
        .select("doc_id").orderBy("doc_id")
    }),

    "q_blocklist_filter" -> ((s, dir) => {
      val d = col("doc_id").cast("string")
      val host = concat(lit("h"), d, lit(".site"),
        pmod(col("doc_id"), lit(4)).cast("string"), lit(".co.uk"))
      documents(s, dir).select(col("doc_id"), col("text"), host.as("host"))
        .where(graft.functions.TextFunctions.evalHere(
          graft.functions.TextFunctions.noBlocklistedToken(col("text"),
            Seq("agg", "scan")) &&
          graft.functions.UrlFunctions.domainNotBlocklisted(col("host"),
            Seq("site0.co.uk", "site2.co.uk"))))
        .select("doc_id", "host")
        .orderBy("doc_id")
    }),

    // ---- LARGE phrase blocklist via Aho–Corasick — the 100k-entry
    //      scale path (the literal-array isin gate above stops making
    //      sense past a few hundred single tokens; production bad-word
    //      lists are 10⁵ multi-word phrases). The 10,000-phrase list is
    //      fit from the corpus itself (top word-bigrams, deterministic
    //      tie rule) and emitted as a side table; matching is one
    //      driver-built automaton in the UDF closure, O(text) per doc
    //      whatever the list size, map-side, no join. Oracle: every
    //      (doc, phrase) hit re-derived by a space-flanked containment
    //      join over the same normalized text and the same side table —
    //      any automaton bug (boundary, overlap, fail-link) breaks the
    //      hash. ----
    "q_blocklist_10k" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val docs = documents(s, dir)
      val phrases = TextFunctions.corpusNgramCounts(docs, "text", n = 2)
        .orderBy(col("n_occurrences").desc, col("gram"))
        .limit(10000)
        .collect().map(_.getString(0)).toSeq
      import s.implicits._
      writeOracleSide(phrases.toDF("phrase"), dir, "blocklist_10k")
      docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          explode(TextFunctions.blocklistHits(col("text"), phrases)).as("phrase"))
        .orderBy("doc_id", "phrase")
    }),

    // ---- bigram-LM perplexity scoring (the CCNet quality-filter step):
    //      fit an add-one-smoothed bigram model on the English slice,
    //      score every doc's cross-entropy. Every model count is an
    //      integer and every probability a ratio of integers, so the
    //      oracle re-derives the FULL pipeline (vocab selection included)
    //      in SQL; per-doc log2 sums go through exact decimal summation
    //      (order-independent) and round to 4 decimals. ----
    "q_lm_perplexity" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.operators.QualityLm.fit(
        docs.where(col("lang") === "en"), "text", vocabSize = 256)
      graft.operators.QualityLm.score(docs, "text", "doc_id", model)
        .orderBy("doc_id")
    }),

    // ---- interpolated Kneser–Ney bigram scoring (the smoothing KenLM —
    //      and therefore the real CCNet filter — uses): same fit slice
    //      and output contract as q_lm_perplexity, but absolute
    //      discounting interpolated with the continuation probability
    //      n1r/(T+V+1). Every model quantity is an integer count plus
    //      the constant D=0.75, so the oracle re-derives the FULL model
    //      (vocab, c2/c1, the two N1+ tables, T) and replays the scoring
    //      arithmetic term-for-term in the same IEEE order. ----
    "q_lm_kneser_ney" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.operators.QualityLm.fitKn(
        docs.where(col("lang") === "en"), "text", vocabSize = 256)
      graft.operators.QualityLm.scoreKn(docs, "text", "doc_id", model)
        .orderBy("doc_id")
    }),

    // ---- CCNet head/middle/tail perplexity bucketing (Wenzek et al.
    //      2020 §4.3): rank every doc by its entropy under the 'en'
    //      reference model WITHIN its language, cut at the cumulative
    //      1/3 and 2/3 of each language's size — integer cross-
    //      multiplied cuts, (entropy_bits, doc_id) tie order, so the
    //      oracle replays rank and bucket exactly on top of the
    //      q_lm_perplexity score chain. ----
    "q_ccnet_buckets" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.operators.QualityLm.fit(
        docs.where(col("lang") === "en"), "text", vocabSize = 256)
      graft.operators.QualityLm.perplexityBuckets(
        docs, "text", "doc_id", "lang", model)
        .select("doc_id", "lang", "entropy_bits", "ppl_rank", "bucket")
        .orderBy("doc_id")
    }),

    // ---- the same CCNet bucketing under the interpolated-KN model
    //      (the smoothing CCNet actually uses — q_lm_kneser_ney's score
    //      chain + the shared grouped rank and integer cuts, all
    //      re-derived by the oracle). ----
    "q_ccnet_buckets_kn" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.operators.QualityLm.fitKn(
        docs.where(col("lang") === "en"), "text", vocabSize = 256)
      graft.operators.QualityLm.perplexityBucketsKn(
        docs, "text", "doc_id", "lang", model)
        .select("doc_id", "lang", "entropy_bits", "ppl_rank", "bucket")
        .orderBy("doc_id")
    }),

    // ---- BM25 lexical retrieval: keyword search over the corpus for a
    //      small query set — retrieval-side decontamination / corpus
    //      audit. Map-side tf (no postings shuffle), query terms
    //      broadcast, df computed only for query terms; per-term
    //      contributions decimal-summed so the score is order-
    //      independent and re-derivable in SQL (idf uses log2 — the
    //      engine-portable transcendental, a constant factor off
    //      Lucene's ln). ----
    "q_bm25" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq(
        (0L, "spark hash join"), (1L, "window sort merge"),
        (2L, "table scan filter"), (3L, "fast batch value"))
        .toDF("query_id", "qtext")
      graft.operators.Bm25.topK(documents(s, dir), "text", "doc_id",
        qs, "query_id", "qtext", k = 10)
        .orderBy("query_id", "rank")
    }),

    // ---- BM25 from the PREBUILT index (build-once/serve-many, the
    //      IvfIndex pattern): full postings + df table with portable
    //      term buckets. Identical output contract to q_bm25 — the two
    //      share one oracle SQL, which is itself the equality proof. ----
    "q_bm25_index" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq(
        (0L, "spark hash join"), (1L, "window sort merge"),
        (2L, "table scan filter"), (3L, "fast batch value"))
        .toDF("query_id", "qtext")
      graft.operators.Bm25.Bm25Index
        .build(documents(s, dir), "text", "doc_id")
        .topK(qs, "query_id", "qtext", k = 10)
        .orderBy("query_id", "rank")
    }),

    // ---- SemDeDup semantic pruning: k-means clusters bound the
    //      quadratic within-cluster cosine scan (Σc² not n²). PARTIAL
    //      oracle like q_kmeans: embedded converged centroids
    //      (OracleFitProbe prints them at the sf0.01 gate; the fit is
    //      layout-invariant — hash-sampled driver Lloyd), assignment +
    //      pairwise prune rule verified in DuckDB; the Lloyd fit itself
    //      is pinned by SimilaritySpec. Probe-checked margins:
    //      nearest-vs-second centroid distance and cosine-vs-tau gaps
    //      are orders of magnitude above cross-engine ulp noise. ----
    //      Probe-measured at the sf0.01 gate: assign margin (min
    //      d2nd−d1st) 1.1e-4, min |cos−tau| 3.6e-4 — both gaps are ~11
    //      orders of magnitude above the ~1e-15 ulp disagreement the
    //      differing distance/cosine formulas can produce, so neither
    //      the argmin nor the threshold can flip. ----
    "q_semdedup" -> ((s, dir) =>
      graft.operators.SemDedup.prune(
        embeddings(s, dir),
        "embedding", "vec_id", nClusters = 8, tau = 0.35)
        .orderBy("vec_id")),

    // ---- temperature-flattened corpus mixing (p_s ∝ n_s^alpha): thin
    //      dominant sources so the mix follows the flattened composition,
    //      binding source kept whole. Deterministic portable-hash
    //      Bernoulli thinning — the per-source integer thresholds depend
    //      on observed counts, so the oracle embeds the probe-printed
    //      literals (the q_kmeans embedded-constants pattern). ----
    //      Grouped by lang (218/75/73/70/64 at the gate — real skew;
    //      `source` is near-uniform there and would make every
    //      threshold trivial). ----
    "q_temperature_mix" -> ((s, dir) =>
      graft.operators.Sampling.temperatureMix(
        documents(s, dir).select("doc_id", "lang"), "lang", "doc_id",
        alpha = 0.5)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // ---- EXPLICIT-target corpus mixing (The Pile / DoReMi static
    //      reweighting: the caller dictates the composition): thin to
    //      50/20/20/10 en/es/de/fr, binding group whole, zh unweighted
    //      → dropped. FULL-replay oracle — unlike temperatureMix's
    //      embedded thresholds, every threshold re-derives in SQL from
    //      the observed counts and the weight literals (pinned IEEE
    //      order: z in sorted-key order, ratio n/(w/z), binding by
    //      (v, g) min, floor(r·2^60) exact because ·2^60 only shifts
    //      the exponent). ----
    "q_mixture_select" -> ((s, dir) =>
      graft.operators.Sampling.mixtureSelect(
        documents(s, dir).select("doc_id", "lang"), "lang", "doc_id",
        MixtureWeights)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // ---- EPOCH-aware mixing (the UPSAMPLING counterpart: GPT-3 runs
    //      Wikipedia 3.4 epochs while CC sees 0.44): en×2.5, fr×1.25,
    //      de×1.0 — es/zh unlisted → dropped. Every row emits its full
    //      copies plus a fractional copy kept by the deterministic
    //      id:epoch:seed hash walk. The fractional thresholds are
    //      floor(frac·2⁶⁰) with frac ∈ {0.5, 0.25, 0} — exact
    //      powers-of-two literals (2⁵⁹, 2⁵⁸, 0) the oracle writes down
    //      directly. ----
    "q_epoch_mix" -> ((s, dir) =>
      graft.operators.Sampling.epochMix(
        documents(s, dir).select("doc_id", "lang"), "lang", "doc_id",
        Map("en" -> 2.5, "fr" -> 1.25, "de" -> 1.0))
        .select("doc_id", "lang", "epoch")
        .orderBy("doc_id", "epoch")),

    // ---- END-TO-END training-run export (pipeline v4's last mile):
    //      epoch-aware mix (en×2.5/fr×1.25/de×1.0) → per-copy key
    //      k = doc_id·8 + epoch → corpus vocabulary → id encoding →
    //      BINARY .bin/.idx shards → decoded read-back. Every repeated
    //      copy ships as its own training doc with its own position in
    //      the deterministic deal; the id sequence of every copy of one
    //      doc is identical. The oracle composes the q_epoch_mix and
    //      q_tokenized_export replays over the k arithmetic — parquet
    //      in, bytes out, nothing trusted in between. ----
    "q_training_export" -> ((s, dir) => {
      val d = documents(s, dir).where(col("text").isNotNull)
      val mixed = graft.operators.Sampling.epochMix(
        d.select("doc_id", "lang", "text"), "lang", "doc_id",
        Map("en" -> 2.5, "fr" -> 1.25, "de" -> 1.0))
        .withColumn("k", col("doc_id") * 8 + col("epoch"))
      val toks = mixed.select(col("k"), graft.functions.TextFunctions.tokens(
        graft.functions.TextFunctions.normalizeText(col("text"))).as("toks"))
      val vocab = graft.sources.TokenizedExport.vocabulary(toks, "toks")
      val enc = graft.sources.TokenizedExport.encodeIds(toks, "toks", vocab)
        .select("k", "token_ids")
      val out = new java.io.File(
        s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}/trainbin")
      graft.sources.TokenizedExport.write(enc, "k", "token_ids",
        out.getPath, nShards = 4, vocabSize = vocab.count().toInt)
      graft.sources.TokenizedExport.read(s, out.getPath)
        .select(col("doc_id").as("k"), col("shard"),
          col("ordinal").cast("long").as("ordinal"),
          size(col("token_ids")).cast("long").as("n_tokens"),
          array_join(col("token_ids").cast("array<string>"), " ").as("ids"))
        .orderBy("k")
    }),

    // ---- mix audit report (the data-card numbers next to "we
    //      reweighted X"): before/after per-language composition of the
    //      q_epoch_mix stage — counts, 4-decimal shares on both sides,
    //      keep ratio (≈2.5 for en, 0 for the dropped es/zh). Oracle:
    //      the epoch-mix replay + two rollups + the same share/ratio
    //      arithmetic. ----
    "q_mix_report" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "lang")
      val mixed = graft.operators.Sampling.epochMix(docs, "lang", "doc_id",
        Map("en" -> 2.5, "fr" -> 1.25, "de" -> 1.0))
      graft.operators.Sampling.mixReport(docs, mixed, "lang")
        .orderBy("lang")
    }),

    // ---- the Gopher rule-set page filter (Rae et al. 2021 appendix
    //      A1.1.1): word count, mean word length, symbol-to-word
    //      ratios, bullet/ellipsis line shares, alphabetic-word ratio,
    //      stop-word presence — ALL ratio rules cross-multiplied into
    //      integer comparisons, so the decision is float-free and the
    //      oracle replays it exactly. minWords/stop list tuned to the
    //      synthetic corpus shape (30 words; {the, a} both required)
    //      so the gate actually splits; every other threshold is the
    //      published default. ----
    "q_gopher_filter" -> ((s, dir) => {
      val stop = Seq("the", "a")
      documents(s, dir)
        .where(graft.functions.TextFunctions.evalHere(
          graft.functions.TextFunctions.gopherRules(col("text"),
            minWords = 30, stopWords = stop, minStopHits = 2)))
        .select(col("doc_id"),
          graft.functions.TextFunctions.gopherStats(col("text"), stop)
            .getField("n_words").as("n_words"))
        .orderBy("doc_id")
    }),

    // ---- C4 line+page cleaning (Raffel et al. 2020 §2.2) over pages
    //      SYNTHESIZED from the corpus by id arithmetic (the flat word
    //      streams carry no lines/punctuation — the q_blocklist
    //      pattern): each page mixes a surviving sentence, a too-short
    //      line, a javascript-marked line on id%3, an unpunctuated
    //      line, and lorem-ipsum / curly-brace page poisons on
    //      id%17 / id%19. Survivors = pages whose CLEANED text keeps
    //      ≥4 sentences and whose RAW page carries no poison — the
    //      oracle rebuilds page, cleaning, and rules from the same
    //      exact string ops. ----
    "q_c4_clean" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val page = concat_ws("\n",
        concat(array_join(slice(toks, 1, 6), " "), lit(".")),
        lit("Too short."),
        concat(array_join(slice(toks, 7, 6), " "),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit(" pages need JavaScript enabled.")).otherwise(lit("?"))),
        array_join(slice(toks, 13, 4), " "),
        when(pmod(col("doc_id"), lit(17)) === 0,
          lit("Generated from lorem ipsum filler."))
          .otherwise(lit("A closing remark for the page.")),
        when(pmod(col("doc_id"), lit(19)) === 0,
          lit("template { placeholder } here."))
          .otherwise(lit("Another fine sentence here.")))
      documents(s, dir).where(col("text").isNotNull)
        .withColumn("__page", page)
        .withColumn("__clean",
          graft.functions.TextFunctions.c4CleanLines(col("__page")))
        .where(graft.functions.TextFunctions.evalHere(
          graft.functions.TextFunctions.c4PageRules(
            col("__page"), col("__clean"), minSentences = 4)))
        .select(col("doc_id"), col("__clean").as("text"))
        .orderBy("doc_id")
    }),

    // ---- Gopher REPETITION rule set (Rae et al. 2021 A1.1.2 — the
    //      companion of q_gopher_filter's composition rules): pages
    //      synthesized with a duplicated line on id%4 and a paragraph
    //      break; the 31-word corpus vocabulary makes top/dup-gram
    //      coverage vary naturally (89/500 pass at the published
    //      thresholds). Every stat is an exact integer and every rule a
    //      cross-multiplied comparison, replayed gram-for-gram in SQL. ----
    "q_gopher_repetition" -> ((s, dir) => {
      val toksRaw = graft.functions.TextFunctions.tokens(col("text"))
      val l1 = array_join(slice(toksRaw, 1, 8), " ")
      val page = concat_ws("\n", l1,
        array_join(slice(toksRaw, 9, 8), " "),
        when(pmod(col("doc_id"), lit(4)) === 0, l1)
          .otherwise(array_join(slice(toksRaw, 17, 8), " ")),
        lit(""),
        array_join(slice(toksRaw, 25, 6), " "))
      val st = graft.functions.TextFunctions.gopherRepetitionStats(col("__page"))
      documents(s, dir).where(col("text").isNotNull)
        .withColumn("__page", page)
        .where(graft.functions.TextFunctions.evalHere(
          graft.functions.TextFunctions.gopherRepetitionRules(col("__page"))))
        .select(col("doc_id"),
          st.getField("top2_chars").as("top2_chars"),
          st.getField("dup5_chars").as("dup5_chars"),
          st.getField("tok_chars").as("tok_chars"))
        .orderBy("doc_id")
    }),

    // ---- intra-document repeated-line scrub (crawlers duplicate nav
    //      blocks inside one page): pages synthesized with lines
    //      1,2,1,3,2,1 — the scrub must return 1,2,3 (first
    //      occurrences, order kept), replayed in SQL by the identical
    //      predecessor-scan fold. ----
    "q_line_dedup" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val l1 = array_join(slice(toks, 1, 5), " ")
      val l2 = array_join(slice(toks, 6, 5), " ")
      val l3 = array_join(slice(toks, 11, 5), " ")
      val page = concat_ws("\n", l1, l2, l1, l3, l2, l1)
      documents(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.TextFunctions.dedupLinesWithin(page).as("text"))
        .orderBy("doc_id")
    }),

    // ---- quality-ranked family representative: per near-dup family
    //      keep the member with the most content (n_chars desc, tie min
    //      id) instead of the min id — the curation policy real
    //      pipelines want. Oracle re-derives families via the
    //      q_dedup_cluster recursive-CTE walk, then the same argmax. ----
    "q_dedup_cluster_best" -> ((s, dir) =>
      graft.operators.Dedup.clusterDedupBy(
        documents(s, dir), "text", "doc_id", "n_chars")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    // ---- contamination AUDIT report (the measurement half of
    //      q_decontaminate, same id-arithmetic benchmark split): per
    //      contaminated doc, distinct shared grams AND distinct eval
    //      docs touched — the numbers a data card publishes. ----
    "q_contamination_report" -> ((s, dir) => {
      val d = documents(s, dir)
      val benchmark = d.where(pmod(col("doc_id"), lit(31)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
      graft.operators.Dedup.contaminationReport(
        corpus, benchmark, "text", "doc_id", n = 5)
        .orderBy("doc_id")
    }),

    // ---- per-EVAL-ITEM contamination fraction (the PaLM §9 /
    //      Chinchilla direction, same id-arithmetic split): an eval doc
    //      is burned when ≥ 7/10 of its distinct 5-grams appear in the
    //      corpus. All-integer cross-multiplied flag; the oracle
    //      replays the gram walk with the eval/corpus roles of
    //      q_decontaminate swapped and the rollup per eval doc. ----
    "q_eval_contamination" -> ((s, dir) => {
      val d = documents(s, dir)
      val benchmark = d.where(pmod(col("doc_id"), lit(31)) === 0)
      val corpus = d.where(pmod(col("doc_id"), lit(31)) =!= 0)
      graft.operators.Dedup.evalContamination(
        corpus, benchmark, "text", "doc_id", n = 5)
        .orderBy("doc_id")
    }),

    // ---- DSIR data selection (Xie et al. 2023): top-120 raw docs by
    //      hashed-unigram importance against the 'en' slice as the
    //      target domain. The fitted model is 64 QUANTIZED integer
    //      log-ratios (floor(2^20·Δln)) — embedded in the oracle (the
    //      temperatureMix pow boundary; refreshed by OracleFitProbe),
    //      which then re-derives every per-doc weight EXACTLY: the
    //      same md5 bucket walk, integer Σ m_b, /2^20 dyadic double. ----
    "q_dsir_select" -> ((s, dir) => {
      val d = documents(s, dir)
      graft.operators.Sampling.dsirSelect(
        d, d.where(col("lang") === "en"), "text", "doc_id", k = 120)
        .select("doc_id", "log_weight")
    }),

    // ---- curation pipeline v3 — the ROUND-10 stage chain end-to-end:
    //      C4 line+page cleaning → intra-doc line dedup → Gopher
    //      repetition rules (top-gram thresholds tuned to the short
    //      synthesized pages; every other threshold published) →
    //      explicit-target mixture (zh dropped) → DSIR importance gate
    //      on the SOURCE text (select en-like docs, deliver the cleaned
    //      rewrite). Funnel at the gate: 500 → 445 → 293 → 216 → 61 —
    //      every stage does real work. The oracle replays all five
    //      stages (mixture thresholds re-derived from the stage-3
    //      survivor counts; DSIR via the shared embedded model). ----
    "q_curation_pipeline3" -> ((s, dir) => {
      val T = graft.functions.TextFunctions
      val toks = T.tokens(col("text"))
      val page = concat_ws("\n",
        concat(array_join(slice(toks, 1, 6), " "), lit(".")),
        lit("Too short."),
        concat(array_join(slice(toks, 7, 6), " "),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit(" pages need JavaScript enabled.")).otherwise(lit("?"))),
        array_join(slice(toks, 13, 4), " "),
        when(pmod(col("doc_id"), lit(17)) === 0,
          lit("Generated from lorem ipsum filler."))
          .otherwise(lit("A closing remark for the page.")),
        when(pmod(col("doc_id"), lit(19)) === 0,
          lit("template { placeholder } here."))
          .otherwise(lit("Another fine sentence here.")),
        lit("Another fine sentence here."))
      val d = documents(s, dir)
      val s2 = d.where(col("text").isNotNull)
        .withColumn("__page", page)
        .withColumn("__clean", T.c4CleanLines(col("__page")))
        .where(T.evalHere(
          T.c4PageRules(col("__page"), col("__clean"), minSentences = 4)))
      val s4 = s2.withColumn("__text", T.dedupLinesWithin(col("__clean")))
        .where(T.evalHere(T.gopherRepetitionRules(col("__text"),
          maxTopGramFrac100 = Seq(30, 28, 26))))
      val s5 = graft.operators.Sampling.mixtureSelect(
        s4.select("doc_id", "lang", "text", "__text"), "lang", "doc_id",
        MixtureWeights)
      val m = graft.operators.Sampling.dsirLogRatios(
        d, d.where(col("lang") === "en"), "text")
      graft.operators.Sampling.dsirScore(s5, "text", m)
        .where(col("__wnum") >= 0)
        .select(col("doc_id"), col("lang"), col("__text").as("text"),
          (col("__wnum").cast("double") / lit(1048576.0d)).as("log_weight"))
        .orderBy("doc_id")
    }),

    // ---- real BPE subword tokenization (Sennrich/GPT-2 recipe): fit
    //      merges on the corpus' bounded word-frequency table (driver
    //      loop over exact integer counts — deterministic), apply
    //      map-side with broadcast ranks + per-partition memo.
    //      PARTIAL oracle (fitted side table): the fitted merge list is
    //      emitted ranked, and DuckDB replays the ENTIRE apply path —
    //      normalization, word split, and the greedy lowest-rank-first
    //      per-word merge recursion as a recursive CTE over token
    //      lists — then recounts per doc. All-integer outputs, no
    //      rounding. The fit loop itself (argmax over pair counts)
    //      stays pinned by BpeSpec's golden merges and the
    //      driver/distributed-equality test. ----
    "q_bpe_tokens" -> ((s, dir) => {
      val docs = documents(s, dir)
      val model = graft.functions.Bpe.fit(docs, "text", numMerges = 200)
      import s.implicits._
      writeOracleSide(model.merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }.toDF("rank", "a", "b"),
        dir, "bpe_merges")
      docs.select(col("doc_id"),
        graft.functions.Bpe.tokenCount(col("text"), model).as("n_bpe_tokens"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_words"))
        .orderBy("doc_id")
    }),

    // ---- corpus audit stats (the "dataset card" numbers): per
    //      (lang, source) doc/token/char counts + mean quality, one
    //      partial-aggregated pass. ----
    "q_corpus_stats" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      documents(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          graft.Tables.dsum(qualityScore(col("text")), 6).as("__q"))
        .withColumn("mean_quality",
          floor(col("__q") / col("n_docs") * 1e4 + 0.5) / 1e4)
        .drop("__q")
        .orderBy("lang", "source")
    }),

    // ---- as-of (point-in-time) join: for every purchase, the latest
    //      view by the same user at-or-before the purchase time — the
    //      feature-lookup primitive Spark lacks natively, implemented as
    //      ONE key-shuffle union-sort window (linear; no per-key range
    //      explosion). Oracle = DuckDB's native ASOF LEFT JOIN. ----
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts"), col("value").as("purchase_value"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsofJoin.backward(purchases, views, Seq("user_id"), "ts",
        suffix = "_view")
        .select(col("user_id"), col("purchase_id"),
          unix_micros(col("ts")).as("ts_us"), col("purchase_value"),
          unix_micros(col("ts_view")).as("view_ts_us"),
          col("value_view").as("view_value"))
        .orderBy("user_id", "purchase_id")
    }),

    // ---- forward as-of: the NEXT view at-or-after each purchase (the
    //      mirror scan; DuckDB replays it as backward ASOF on negated
    //      epoch micros) ----
    "q_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts"), col("value").as("purchase_value"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsofJoin.forward(purchases, views, Seq("user_id"), "ts",
        suffix = "_view")
        .select(col("user_id"), col("purchase_id"),
          unix_micros(col("ts")).as("ts_us"), col("purchase_value"),
          unix_micros(col("ts_view")).as("view_ts_us"),
          col("value_view").as("view_value"))
        .orderBy("user_id", "purchase_id")
    }),

    // ---- nearest as-of: closer of the two directions, ties backward
    //      (one key shuffle — both scans are windows over the same
    //      partitioning) ----
    "q_asof_nearest" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts"), col("value").as("purchase_value"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsofJoin.nearest(purchases, views, Seq("user_id"), "ts",
        suffix = "_view")
        .select(col("user_id"), col("purchase_id"),
          unix_micros(col("ts")).as("ts_us"), col("purchase_value"),
          unix_micros(col("ts_view")).as("view_ts_us"),
          col("value_view").as("view_value"))
        .orderBy("user_id", "purchase_id")
    }),

    // ---- stream-stream interval join (batch equivalent; the true
    //      two-stream path with watermark-bounded join state runs in
    //      StreamingSpec). Timestamps are micro-exact in both engines
    //      (the fixture has no sub-microsecond parts), so the range
    //      predicate and lag are integer-exact. ----
    "q_stream_join" -> ((s, dir) =>
      graft.streaming.EventStream.attributedPurchases(events(s, dir))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("lag_us"),
          col("value"))
        .orderBy("user_id", "click_id", "purchase_id")),

    "q_stream_session" -> ((s, dir) =>
      graft.streaming.EventStream.sessionize(events(s, dir))
        .select(col("user_id"),
          unix_timestamp(col("session_start")).as("session_start_sec"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_sec")),

    // ---- custom streaming state (flatMapGroupsWithState + event-time
    //      timeout eviction): on a single batch the state machine
    //      degrades to one emission per user — exactly a grouped
    //      count/exact-decimal-sum, which the oracle replays. The
    //      streaming semantics (running emission per micro-batch,
    //      idle-state eviction, restart-from-zero) are pinned by
    //      StreamingSpec's MemoryStream scenario. ----
    "q_stream_running" -> ((s, dir) =>
      graft.streaming.EventStream.runningUserTotals(s, events(s, dir))
        .orderBy("user_id")),

    // ---- M1/M2/M5 ML operators (rows-only: model fits are not
    //      SQL-expressible; contracts pinned by ClusteringSpec) ----
    // ---- M1 KMeans, PARTIAL oracle: the oracle embeds the converged
    //      centroids (OracleFitProbe prints them at the sf0.01 gate) and
    //      verifies nearest-centroid ASSIGNMENT in DuckDB — it checks the
    //      assignment semantics and label canonicalization, NOT the Lloyd
    //      fit itself (the iterative fit is pinned by ClusteringSpec).
    //      Labels are canonicalized to the minimum member l_partkey on
    //      both sides, erasing Spark ML's arbitrary cluster numbering.
    //      The input layout is PINNED (fixed-count hash repartition +
    //      within-partition sort) because kmeans|| initialization samples
    //      per partition: an upstream cache with a different physical
    //      layout would otherwise seed a different local optimum — the
    //      fit is only deterministic per layout, so the gate pins one.
    //      Refresh the embedded centroids after any fixture change. ----
    "q_kmeans" -> ((s, dir) =>
      KMeansOp(nClusters = 4, sort = false, protect = Seq("l_partkey"))(
        countMatrix(s, dir).repartition(8, col("l_partkey"))
          .sortWithinPartitions("l_partkey"))
        .withColumn("cluster", min(col("l_partkey")).over(Window.partitionBy(col("KNN"))))
        .select("l_partkey", "cluster")
        .orderBy("l_partkey")),

    // ---- M2 ward linkage, PARTIAL oracle (embedded merge edges): a flat
    //      k-cut of ANY dendrogram equals the connected components of the
    //      graph whose edges are the n−k kept merges, each expressed as a
    //      pair of member keys (one representative per merged side).
    //      OracleFitProbe prints those 197 edges from the fitted linkage
    //      matrix and verifies the CC replay reproduces the op's labels;
    //      the oracle re-runs the replay in DuckDB (recursive-CTE CC, the
    //      q_dbscan machinery). This checks the cut/labeling semantics
    //      and join-back — the Ward NN-chain objective itself is pinned
    //      by ClusteringSpec (scipy golden). Labels canonicalize to the
    //      min member key on both sides. Refresh the embedded edges after
    //      any fixture change. ----
    "q_agglo" -> ((s, dir) =>
      // deterministic subset: a bare limit over an unordered aggregation
      // could pick different rows per run
      AggloOp(nClusters = 3, sort = false, protect = Seq("l_partkey"))(
        countMatrix(s, dir).orderBy("l_partkey").limit(200))
        .withColumn("cluster", min(col("l_partkey")).over(Window.partitionBy(col("Agglo"))))
        .select("l_partkey", "cluster")
        .orderBy("l_partkey")),

    // ---- M2 single-linkage agglomeration, oracle-checked: a flat k-cut
    //      of the single-linkage dendrogram equals the connected
    //      components of the ε-graph with ε = the largest KEPT merge
    //      height, PROVIDED the boundary is strict (kept max < removed
    //      min). On the gate subset the k=5 cut sits in a strict gap:
    //      kept merges have d² ≤ 13, removed ones d² ≥ 14 (OracleFitProbe
    //      prints the spectrum — k=3 would land inside a √14 tie group,
    //      which is why this query cuts at 5). Squared lattice distances
    //      are exact integers, so the ε² comparison cannot straddle float
    //      noise; labels canonicalize to min member id on both sides
    //      (the q_dbscan recursive-CTE machinery). The ward-linkage
    //      q_agglo stays rows-only (its merge objective is not
    //      SQL-expressible). ----
    "q_agglo_single" -> ((s, dir) =>
      AggloOp(nClusters = 5, sort = false, linkage = "single",
        protect = Seq("l_partkey"))(
        countMatrix(s, dir).orderBy("l_partkey").limit(200))
        .withColumn("cluster", min(col("l_partkey")).over(Window.partitionBy(col("Agglo"))))
        .select("l_partkey", "cluster")
        .orderBy("l_partkey")),

    // ---- M5/M9 PCA, oracle-checked. The samples×samples Gram is 3×3
    //      here, so DuckDB can solve the SAME eigenproblem in closed
    //      form (trigonometric cubic roots; eigenvectors = cross
    //      products of (G−λI) rows — measured agreement with the
    //      driver-side LAPACK path ~1e-11). Eigenvector sign is
    //      arbitrary, so BOTH sides flip each component to make the
    //      first sample's coordinate positive (|coord| ≥ 17 on the gate
    //      data — far from the flip boundary), rename to positional
    //      pc1/pc2 (the reference's dynamic "expl.var" labels are not
    //      SQL-expressible), and round to 4 decimals. ----
    "q_pca" -> ((s, dir) => {
      val op = PcaOp(nComponents = 2, protect = Seq("l_partkey"))
      // positional rename: the reference's "PC1 (expl.var = …%)" labels
      // embed data-dependent percentages (and dots that fight column
      // resolution) — static names are what the oracle can address
      val out = op(countMatrix(s, dir)).toDF("sample", "c1", "c2")
      val ev = op.explainedVarianceRatio
      val first = out.orderBy("sample").limit(1).collect()(0)
      def sg(i: Int): Double = if (first.getDouble(i) < 0) -1.0 else 1.0
      out.select(col("sample"),
          round(col("c1") * sg(1), 4).as("pc1"),
          round(col("c2") * sg(2), 4).as("pc2"),
          round(lit(ev(0)), 4).as("expl_var1"),
          round(lit(ev(1)), 4).as("expl_var2"))
        .orderBy("sample")
    }),

    // ---- stream-static enrichment join + windowed per-segment counts ----
    "q_stream_enriched" -> ((s, dir) => {
      val e = events(s, dir)
      val dim = e.select(col("user_id")).distinct()
        .withColumn("segment",
          when(pmod(col("user_id"), lit(3)) === 0, "gold")
            .when(pmod(col("user_id"), lit(3)) === 1, "silver")
            .otherwise("bronze"))
      graft.streaming.EventStream.enrichedCounts(e, dim)
        .withColumn("window_start", unix_timestamp(col("window_start")))
        .orderBy("window_start", "segment")
    }),

    "q_stream_dedup" -> ((s, dir) => {
      val e = events(s, dir)
      graft.streaming.EventStream.dedupEvents(e.union(e))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    // ---- link-graph analytics (crawl/domain quality ranking): classic
    //      PageRank over the customer-derived link fixture — hub node 0,
    //      modular link targets, every c % 13 == 0 node dangling. The
    //      WHOLE recurrence is scaled-integer arithmetic (BIGINT
    //      micro-units, floor divisions, exact integer sums), so the
    //      oracle replays all 8 unrolled power iterations bit-for-bit
    //      with zero float trust. ----
    "q_pagerank" -> ((s, dir) => {
      val (nodes, edges) = linkGraph(s, dir)
      Graph.pageRank(nodes, edges, "c", "src", "dst", iterations = 8)
    }),

    // ---- personalized PageRank: the random surfer restarts (and
    //      dangling mass re-enters) uniformly over the c % 17 == 0 seed
    //      set only — the "rank relative to a trusted seed list" form
    //      (domain allowlists, TrustRank-style). Same integer
    //      recurrence, teleport-indicator weighted. ----
    "q_pagerank_seeded" -> ((s, dir) => {
      val (nodes, edges) = linkGraph(s, dir)
      val seeds = nodes.where(pmod(col("c"), lit(17)) === 0)
      Graph.pageRank(nodes, edges, "c", "src", "dst", iterations = 8,
        teleport = Some(seeds))
    }),

    // ---- in/out degree profile of the same simple-graph view the
    //      ranker walks (frontier diagnostics: dangling nodes, hubs) ----
    "q_degree_profile" -> ((s, dir) => {
      val (nodes, edges) = linkGraph(s, dir)
      Graph.degreeProfile(nodes, edges, "c", "src", "dst")
    }),

    // ---- single-pass column profiling (the batch-admission "unit
    //      tests for data" layer): every measure for every column from
    //      ONE aggregation over ONE scan. Columns kept ASCII/integer so
    //      min/max-as-string is engine-neutral (text min/max would pit
    //      UTF-16 vs UTF-8 collation — documented in Profile). ----
    "q_profile" -> ((s, dir) =>
      Profile.columns(documents(s, dir),
        Seq("doc_id", "lang", "source", "n_chars"))),

    // ---- declarative constraint suite over lineitem, all verdicts
    //      from one aggregation: null check, key uniqueness (violated
    //      on purpose — orderkey repeats per line), domain range, enum
    //      membership, and a regex kept inside the Java∩RE2 subset ----
    "q_quality_checks" -> ((s, dir) =>
      Profile.check(lineitem(s, dir), Seq(
        Profile.NotNull("l_orderkey"),
        Profile.Unique("l_orderkey"),
        Profile.InRange("l_quantity", 1, 50),
        Profile.InSet("l_returnflag", Seq("A", "N", "R")),
        Profile.Matches("l_linestatus", "^[OF]$")))),

    // ---- interval overlap join (the genomics region join) via bin
    //      promotion: equi-join on 256-wide bins + exact refine +
    //      first-shared-bin dedup — the shape that replaces the
    //      BroadcastNestedLoop a raw range join would plan. Oracle is
    //      DuckDB's native IEJoin over the same synthetic intervals. ----
    "q_interval_join" -> ((s, dir) =>
      Intervals.overlapJoin(
          intervalFixtureLeft(s, dir), intervalFixtureRight(s, dir),
          "ls", "le", "rs", "re", binSize = 256)
        .select(col("li_id"), col("r_id"), col("overlap_len"))
        .orderBy("li_id", "r_id")),

    // ---- per-right-interval coverage counts (features-per-region),
    //      0-covered regions included ----
    "q_interval_cover" -> ((s, dir) =>
      Intervals.coverageCount(
        intervalFixtureLeft(s, dir), intervalFixtureRight(s, dir),
        "ls", "le", "rs", "re", rKey = "r_id", binSize = 256)),

    // ---- BEDTools `merge` per group (chromosome): collapse
    //      overlapping/touching right intervals into maximal runs via
    //      per-group window scan — never a global sort ----
    "q_interval_merge" -> ((s, dir) =>
      Intervals.mergeIntervals(
        intervalFixtureRight(s, dir).withColumn("g", pmod(col("r_id"), lit(16L))),
        "g", "rs", "re")),

    // ---- BEDTools `closest` per group: distance-0 overlaps from the
    //      binned join + two directional union-window scans, then one
    //      per-left argmin; ties to the smaller right id. Oracle is the
    //      naive per-group cross join argmin. ----
    "q_interval_closest" -> ((s, dir) =>
      Intervals.closest(
        intervalFixtureLeft(s, dir).withColumn("g", pmod(col("li_id"), lit(16L))),
        intervalFixtureRight(s, dir).withColumn("g", pmod(col("r_id"), lit(16L))),
        "g", "li_id", "ls", "le", "r_id", "rs", "re", binSize = 256)),

    // ---- the streaming admission screen's per-batch verdict surface
    //      (QualityMonitor runs EXACTLY this Profile.check suite on
    //      each micro-batch; batch degradation per the q_stream_*
    //      convention — the ownership/replay machinery is spec-pinned
    //      in QualityMonitorSpec) ----
    "q_stream_quality" -> ((s, dir) =>
      Profile.check(events(s, dir), Seq(
        Profile.NotNull("user_id"),
        Profile.InRange("value", 0, 500),
        Profile.InSet("event_type",
          Seq("click", "error", "purchase", "signup", "view")),
        Profile.Matches("props", "^\\{\"k\": [0-9]+\\}$")))),

    // ---- snapshot drift: documents vs a derived "next ingest" with a
    //      fifth of the rows dropped and a null-flood injected into
    //      lang — the n_nulls/n_distinct/min-max shifts the report must
    //      surface ----
    "q_profile_drift" -> ((s, dir) => {
      val before = documents(s, dir)
      val after = before.where(pmod(col("doc_id"), lit(5)) =!= 0)
        .withColumn("lang",
          when(pmod(col("doc_id"), lit(7)) === 0, lit(null).cast("string"))
            .otherwise(col("lang")))
      Profile.drift(before, after, Seq("doc_id", "lang", "n_chars"))
    }),

    // ---- per-group Tukey fences over EXACT order-statistic quartiles
    //      (elements at ceil(n/4)/ceil(3n/4) — never interpolated, so
    //      lo/hi combine stored doubles with +,-,*,/ only and replay
    //      bit-exactly) ----
    "q_outliers" -> ((s, dir) =>
      Profile.iqrOutliers(events(s, dir), "value", Seq("event_type"))),

    // ---- small-files compaction round-trip: 64 tiny files in,
    //      ~targetBytes files out, content hash-equal to the source
    //      table (the ORC-gate losslessness pattern; the file-count
    //      contract is pinned in ZOrderSpec) ----
    "q_compact_roundtrip" -> ((s, dir) => {
      val d = documents(s, dir).select("doc_id", "lang", "source", "text")
      val base = s"/root/repo/data/oracle_side/${new java.io.File(dir).getName}"
      new java.io.File(base).mkdirs()
      val small = s"$base/compact_in.parquet"
      val out = s"$base/compact_out.parquet"
      d.repartition(64).write.mode("overwrite").parquet(small)
      ZOrder.compact(s, small, out, targetBytes = 512L * 1024)
        .orderBy("doc_id")
    }),

    // ---- OLAP CUBE over the data-card dimensions: every subset level
    //      ((lang, source), lang, source, total) in one pass, levels
    //      distinguished by the standard grouping_id bitmask ----
    "q_corpus_cube" -> ((s, dir) =>
      CorpusReport.statsCube(documents(s, dir), Seq("lang", "source"),
        "n_chars")),

    // ---- classifier-eval loop: per-threshold confusion counts (all
    //      exact integers; P/R/F1 one division each) and reliability
    //      bins over a doc_id-derived scored frame the oracle
    //      re-creates verbatim ----
    "q_eval_pr" -> ((s, dir) =>
      Eval.prCurve(evalScored(s, dir), "score", "label",
        Seq(0.1, 0.3, 0.5, 0.7, 0.9))),

    "q_eval_calibration" -> ((s, dir) =>
      Eval.calibration(evalScored(s, dir), "score", "label", bins = 10)),

    // ---- CDC merge: latest version wins per key, change side wins
    //      version ties, "D" tombstones remove the key — one union +
    //      one key-window, no join ----
    "q_cdc_upsert" -> ((s, dir) => {
      val snap = orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          lit(0L).as("version"))
      val changes = orders(s, dir).where(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2).as("o_totalprice"), lit(1L).as("version"))
        .withColumn("op",
          when(pmod(col("o_orderkey"), lit(9)) === 0, "D").otherwise("U"))
      Cdc.applyChanges(snap, changes, Seq("o_orderkey"), "version", Some("op"))
        .orderBy("o_orderkey")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared by q_bm25 and q_bm25_index: the indexed path must produce
    * IDENTICAL output, so one SQL verifies both (and the shared oracle
    * is itself the equality proof at the gate). */
  private lazy val Bm25OracleSql: String =
    s"""WITH q(query_id, qtext) AS (
          |  VALUES (CAST(0 AS BIGINT), 'spark hash join'), (1, 'window sort merge'),
          |         (2, 'table scan filter'), (3, 'fast batch value')),
          |qt AS (
          |  SELECT query_id, unnest(list_distinct(list_filter(
          |    string_split(trim(regexp_replace(lower(qtext), '[^a-z0-9]+', ' ', 'g')), ' '),
          |    x -> x <> ''))) AS term
          |  FROM q),
          |toks AS (
          |  SELECT doc_id, list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
          |  FROM documents),
          |stats AS (SELECT count(*) AS n, sum(len(toks)) AS sdl FROM toks),
          |terms AS (SELECT DISTINCT term FROM qt),
          |post AS (
          |  SELECT doc_id, len(toks) AS dl, term,
          |    len(list_filter(toks, x -> x = term)) AS tf
          |  FROM toks CROSS JOIN terms
          |  WHERE list_contains(toks, term)),
          |dfv AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT qt.query_id, p.doc_id, count(*) AS n_terms,
          |    CAST(sum(CAST(
          |      log2(1.0 + ((SELECT n FROM stats) - dfv.df + 0.5) / (dfv.df + 0.5)) *
          |      (p.tf * (1.2 + 1.0)) /
          |      (p.tf + 1.2 * ((1.0 - 0.75) + 0.75 * p.dl / ((SELECT CAST(sdl AS DOUBLE) / n FROM stats))))
          |      AS DECIMAL(18,12))) AS DOUBLE) AS s
          |  FROM post p JOIN qt ON p.term = qt.term JOIN dfv ON p.term = dfv.term
          |  GROUP BY 1, 2),
          |r AS (
          |  SELECT query_id, doc_id, n_terms,
          |    floor(s * 1e4 + 0.5) / 1e4 AS score,
          |    ROW_NUMBER() OVER (PARTITION BY query_id
          |      ORDER BY floor(s * 1e4 + 0.5) / 1e4 DESC, doc_id) AS rank
          |  FROM scored)
          |SELECT query_id, doc_id, n_terms, score, rank FROM r WHERE rank <= 10
          |ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    base ++ Map(
      // the Bloom scale paths are gated against the EXACT-path oracles
      // verbatim: their contract is superset-flagging that collapses to
      // equality at fpp 1e-8 (DedupSpec proves it on this corpus), so
      // any divergence is a seeding/hashing/sizing defect
      "q_decontaminate_bloom" -> base("q_decontaminate"),
      "q_dedup_spans_incremental_bloom" -> base("q_dedup_spans_incremental"),
      // the persistable index is gated against the ad-hoc screen's
      // oracle verbatim: probe(build(corpus)) must be bit-identical to
      // nearDupAgainst over the same split (DedupSpec pins the same)
      "q_lsh_index" -> base("q_dedup_incremental"),
      // same pattern for the persistable span-gram index:
      // scrub(build(corpus)) must be bit-identical to
      // duplicateSpanScrubAgainst over the same split
      "q_span_index" -> base("q_dedup_spans_incremental"),
      // the index's Bloom branch at fpp 1e-8 == the exact path
      "q_span_index_bloom" -> base("q_dedup_spans_incremental"),
      // removal laws gated as exact equalities: append(extra) then
      // remove(extra) must return the ORIGINAL index bit-for-bit, so
      // the original gates' oracles apply verbatim
      "q_bm25_index_remove" -> base("q_bm25_index"),
      "q_ivf_index_remove" -> base("q_similarity_ivf_exact"),
      // EvalIndex flagging == the ad-hoc contamination walk (exact
      // path verbatim; Bloom at fpp 1e-8 collapses to it)
      "q_eval_index" -> base("q_decontaminate"),
      "q_eval_index_bloom" -> base("q_decontaminate"))
  }

  /** The one-Newton-step fit replay as a WITH-clause body (f → lab →
    * agg → ridge → (i,j,v) matrix → partially-pivoted elimination →
    * back-substituted x0..x3), parameterized by the training-rows
    * predicate — shared by q_quality_fit1 (weights output) and
    * q_quality_filter1 (scoring + filter output). The CTE chain is the
    * SAME IEEE operation sequence the Spark fit runs, so x0..x3 are
    * bit-identical to Model(intercept, weights). */
  private def fit1OracleCtes(trainWhere: String): String =
    s"""WITH f AS (SELECT
        |  len(list_filter(string_split(text, ' '), x -> x <> ''))::DOUBLE AS f0r,
        |  CASE WHEN len(list_filter(string_split(lower(text), ' '), x -> x <> '')) = 0 THEN 0.0
        |       ELSE len(list_filter(string_split(lower(text), ' '),
        |              x -> x <> '' AND list_contains([${graft.functions.TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")}], x)))::DOUBLE
        |            / len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |  END AS f1r,
        |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) = 0 THEN 0.0
        |       ELSE list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''), t -> length(t)))::DOUBLE
        |            / len(list_filter(string_split(text, ' '), x -> x <> ''))
        |  END AS f2r
        | FROM documents$trainWhere),
        |lab AS (SELECT
        |  CASE WHEN f0r >= 40 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
        |  COALESCE(f0r, 0.0) AS f0, COALESCE(f1r, 0.0) AS f1, COALESCE(f2r, 0.0) AS f2
        | FROM f WHERE f0r IS NOT NULL),
        |agg AS MATERIALIZED (SELECT
        |  CAST(SUM(CAST(0.25 * 1.0 * 1.0 AS DECIMAL(38,6))) AS DOUBLE) AS a00,
        |  CAST(SUM(CAST(0.25 * 1.0 * f0 AS DECIMAL(38,6))) AS DOUBLE) AS a01,
        |  CAST(SUM(CAST(0.25 * 1.0 * f1 AS DECIMAL(38,6))) AS DOUBLE) AS a02,
        |  CAST(SUM(CAST(0.25 * 1.0 * f2 AS DECIMAL(38,6))) AS DOUBLE) AS a03,
        |  CAST(SUM(CAST(0.25 * f0 * f0 AS DECIMAL(38,6))) AS DOUBLE) AS a11,
        |  CAST(SUM(CAST(0.25 * f0 * f1 AS DECIMAL(38,6))) AS DOUBLE) AS a12,
        |  CAST(SUM(CAST(0.25 * f0 * f2 AS DECIMAL(38,6))) AS DOUBLE) AS a13,
        |  CAST(SUM(CAST(0.25 * f1 * f1 AS DECIMAL(38,6))) AS DOUBLE) AS a22,
        |  CAST(SUM(CAST(0.25 * f1 * f2 AS DECIMAL(38,6))) AS DOUBLE) AS a23,
        |  CAST(SUM(CAST(0.25 * f2 * f2 AS DECIMAL(38,6))) AS DOUBLE) AS a33,
        |  CAST(SUM(CAST((y - 0.5) * 1.0 AS DECIMAL(38,6))) AS DOUBLE) AS g0,
        |  CAST(SUM(CAST((y - 0.5) * f0 AS DECIMAL(38,6))) AS DOUBLE) AS g1,
        |  CAST(SUM(CAST((y - 0.5) * f1 AS DECIMAL(38,6))) AS DOUBLE) AS g2,
        |  CAST(SUM(CAST((y - 0.5) * f2 AS DECIMAL(38,6))) AS DOUBLE) AS g3
        | FROM lab),
        |rdg AS (SELECT a00, a01, a02, a03,
        |  a11 + CAST(0.1 AS DOUBLE) AS a11, a12, a13,
        |  a22 + CAST(0.1 AS DOUBLE) AS a22, a23,
        |  a33 + CAST(0.1 AS DOUBLE) AS a33,
        |  g0, g1, g2, g3 FROM agg),
        |mat AS MATERIALIZED (
        |  SELECT 0 AS i, 0 AS j, a00 AS v FROM rdg UNION ALL
        |  SELECT 0, 1, a01 FROM rdg UNION ALL SELECT 0, 2, a02 FROM rdg UNION ALL
        |  SELECT 0, 3, a03 FROM rdg UNION ALL SELECT 0, 4, g0 FROM rdg UNION ALL
        |  SELECT 1, 0, a01 FROM rdg UNION ALL SELECT 1, 1, a11 FROM rdg UNION ALL
        |  SELECT 1, 2, a12 FROM rdg UNION ALL SELECT 1, 3, a13 FROM rdg UNION ALL
        |  SELECT 1, 4, g1 FROM rdg UNION ALL
        |  SELECT 2, 0, a02 FROM rdg UNION ALL SELECT 2, 1, a12 FROM rdg UNION ALL
        |  SELECT 2, 2, a22 FROM rdg UNION ALL SELECT 2, 3, a23 FROM rdg UNION ALL
        |  SELECT 2, 4, g2 FROM rdg UNION ALL
        |  SELECT 3, 0, a03 FROM rdg UNION ALL SELECT 3, 1, a13 FROM rdg UNION ALL
        |  SELECT 3, 2, a23 FROM rdg UNION ALL SELECT 3, 3, a33 FROM rdg UNION ALL
        |  SELECT 3, 4, g3 FROM rdg),
        |p0 AS (SELECT i AS piv FROM mat WHERE j = 0 ORDER BY abs(v) DESC, i LIMIT 1),
        |s0 AS (SELECT CASE WHEN m.i = 0 THEN p0.piv WHEN m.i = p0.piv THEN 0 ELSE m.i END AS i,
        |              m.j, m.v FROM mat m, p0),
        |e0 AS MATERIALIZED (SELECT r.i, r.j,
        |         CASE WHEN r.i > 0 THEN r.v - (fv.v / dv.v) * pv.v ELSE r.v END AS v
        |       FROM s0 r
        |       JOIN s0 pv ON pv.i = 0 AND pv.j = r.j
        |       JOIN s0 fv ON fv.i = r.i AND fv.j = 0
        |       JOIN s0 dv ON dv.i = 0 AND dv.j = 0),
        |p1 AS (SELECT i AS piv FROM e0 WHERE j = 1 AND i >= 1 ORDER BY abs(v) DESC, i LIMIT 1),
        |s1 AS (SELECT CASE WHEN e.i = 1 THEN p1.piv WHEN e.i = p1.piv THEN 1 ELSE e.i END AS i,
        |              e.j, e.v FROM e0 e, p1),
        |e1 AS MATERIALIZED (SELECT r.i, r.j,
        |         CASE WHEN r.i > 1 AND r.j >= 1 THEN r.v - (fv.v / dv.v) * pv.v ELSE r.v END AS v
        |       FROM s1 r
        |       JOIN s1 pv ON pv.i = 1 AND pv.j = r.j
        |       JOIN s1 fv ON fv.i = r.i AND fv.j = 1
        |       JOIN s1 dv ON dv.i = 1 AND dv.j = 1),
        |p2 AS (SELECT i AS piv FROM e1 WHERE j = 2 AND i >= 2 ORDER BY abs(v) DESC, i LIMIT 1),
        |s2 AS (SELECT CASE WHEN e.i = 2 THEN p2.piv WHEN e.i = p2.piv THEN 2 ELSE e.i END AS i,
        |              e.j, e.v FROM e1 e, p2),
        |e2 AS MATERIALIZED (SELECT r.i, r.j,
        |         CASE WHEN r.i > 2 AND r.j >= 2 THEN r.v - (fv.v / dv.v) * pv.v ELSE r.v END AS v
        |       FROM s2 r
        |       JOIN s2 pv ON pv.i = 2 AND pv.j = r.j
        |       JOIN s2 fv ON fv.i = r.i AND fv.j = 2
        |       JOIN s2 dv ON dv.i = 2 AND dv.j = 2),
        |x3 AS (SELECT (SELECT v FROM e2 WHERE i = 3 AND j = 4)
        |            / (SELECT v FROM e2 WHERE i = 3 AND j = 3) AS w),
        |x2 AS (SELECT ((SELECT v FROM e2 WHERE i = 2 AND j = 4)
        |             - (SELECT v FROM e2 WHERE i = 2 AND j = 3) * (SELECT w FROM x3))
        |            / (SELECT v FROM e2 WHERE i = 2 AND j = 2) AS w),
        |x1 AS (SELECT (((SELECT v FROM e2 WHERE i = 1 AND j = 4)
        |              - (SELECT v FROM e2 WHERE i = 1 AND j = 2) * (SELECT w FROM x2))
        |              - (SELECT v FROM e2 WHERE i = 1 AND j = 3) * (SELECT w FROM x3))
        |            / (SELECT v FROM e2 WHERE i = 1 AND j = 1) AS w),
        |x0 AS (SELECT ((((SELECT v FROM e2 WHERE i = 0 AND j = 4)
        |               - (SELECT v FROM e2 WHERE i = 0 AND j = 1) * (SELECT w FROM x1))
        |               - (SELECT v FROM e2 WHERE i = 0 AND j = 2) * (SELECT w FROM x2))
        |               - (SELECT v FROM e2 WHERE i = 0 AND j = 3) * (SELECT w FROM x3))
        |            / (SELECT v FROM e2 WHERE i = 0 AND j = 0) AS w)""".stripMargin

  /** The q_gopher_repetition replay, its nine per-n gram blocks
    * generated by the same loop bounds the operator uses (n = 2..10):
    * page synthesis, line/paragraph occurrence counting, gram
    * count×char-length coverage (top = max-count × longest among
    * max-count ties; dup = Σ c·len over c ≥ 2 counting every
    * occurrence), then every published threshold as the identical
    * cross-multiplied integer comparison. */
  /** The quantized DSIR model at the sf0.01 gate (floor(2²⁰·Δln) bucket
    * log-ratios, target = the 'en' slice, raw = full documents, 64
    * buckets) — OracleFitProbe-printed, shared by q_dsir_select and
    * q_curation_pipeline3. The quantization is the ln replay boundary:
    * everything downstream of these integers is exact on both engines. */
  private val DsirModelValuesSql: String =
    """m(b, v) AS (SELECT * FROM (VALUES
      |  (0,-26531), (1,874937), (2,874937), (3,874937), (4,-74709),
      |  (5,874937), (6,874937), (7,-55640), (8,874937), (9,-10915),
      |  (10,-33228), (11,874937), (12,874937), (13,874937), (14,874937),
      |  (15,874937), (16,874937), (17,-33417), (18,-36575), (19,874937),
      |  (20,874937), (21,874937), (22,874937), (23,64188), (24,90276),
      |  (25,-12358), (26,874937), (27,874937), (28,874937), (29,-9824),
      |  (30,-66623), (31,874937), (32,874937), (33,-53762), (34,-37165),
      |  (35,874937), (36,-1124), (37,874937), (38,874937), (39,874937),
      |  (40,874937), (41,21977), (42,50085), (43,874937), (44,-7003),
      |  (45,-41315), (46,-60436), (47,874937), (48,874937), (49,874937),
      |  (50,874937), (51,-18302), (52,61886), (53,874937), (54,874937),
      |  (55,874937), (56,874937), (57,874937), (58,-29601), (59,874937),
      |  (60,874937), (61,874937), (62,874937), (63,83515)))""".stripMargin

  /** The lns..dup10 CTE chain computing the repetition stats over
    * `$src`(doc_id, `$pageCol`) — shared by q_gopher_repetition (over
    * its synthesized pages) and q_curation_pipeline3 (over the
    * line-deduped cleaned text). */
  private def gopherRepStatCtes(src: String, pageCol: String): String = {
    val gramBlocks = (2 to 10).map { n =>
      s"""g$n AS (SELECT doc_id, gram, count(*) AS c, length(gram) - ${n - 1} AS l
         |  FROM (SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(ntoks) - ${n - 1}),
         |      i -> array_to_string(ntoks[i:i+${n - 1}], ' '))) AS gram
         |    FROM tk WHERE len(ntoks) >= $n)
         |  GROUP BY doc_id, gram)""".stripMargin
    }.mkString(",\n")
    val topBlocks = (2 to 4).map { n =>
      s"""m$n AS (SELECT doc_id, MAX(c) AS mc FROM g$n GROUP BY doc_id),
         |top$n AS (SELECT g.doc_id, m.mc * MAX(g.l) AS cover
         |  FROM g$n g JOIN m$n m ON m.doc_id = g.doc_id AND g.c = m.mc
         |  GROUP BY g.doc_id, m.mc)""".stripMargin
    }.mkString(",\n")
    val dupBlocks = (5 to 10).map { n =>
      s"""dup$n AS (SELECT doc_id,
         |    COALESCE(SUM(c * l) FILTER (WHERE c >= 2), 0) AS cover
         |  FROM g$n GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
    s"""lns AS (SELECT doc_id, unnest(string_split($pageCol, chr(10))) AS u FROM $src),
       |lnc AS (SELECT doc_id, u, count(*) AS c, length(u) AS len
       |  FROM lns GROUP BY doc_id, u),
       |ln AS (SELECT doc_id, SUM(c) AS n_lines, SUM(c - 1) AS n_dup,
       |    SUM(c * len) AS chars, SUM((c - 1) * len) AS dup_chars
       |  FROM lnc GROUP BY doc_id),
       |prs AS (SELECT doc_id, unnest(string_split($pageCol, chr(10) || chr(10))) AS u FROM $src),
       |prc AS (SELECT doc_id, u, count(*) AS c, length(u) AS len
       |  FROM prs GROUP BY doc_id, u),
       |pr AS (SELECT doc_id, SUM(c) AS n_paras, SUM(c - 1) AS n_dup,
       |    SUM(c * len) AS chars, SUM((c - 1) * len) AS dup_chars
       |  FROM prc GROUP BY doc_id),
       |tk AS (SELECT doc_id,
       |    list_filter(string_split(trim(regexp_replace(lower($pageCol), '[^a-z0-9]+', ' ', 'g')), ' '),
       |      x -> x <> '') AS ntoks
       |  FROM $src),
       |tc AS (SELECT doc_id,
       |    CAST(COALESCE(list_sum(list_transform(ntoks, x -> length(x))), 0) AS BIGINT) AS tok_chars
       |  FROM tk),
       |$gramBlocks,
       |$topBlocks,
       |$dupBlocks""".stripMargin
  }

  /** LEFT JOINs binding every repetition-stat CTE to `$anchor.doc_id`. */
  private def gopherRepJoins(anchor: String): String =
    (Seq(s"JOIN ln ON ln.doc_id = $anchor.doc_id",
      s"JOIN pr ON pr.doc_id = $anchor.doc_id",
      s"JOIN tc ON tc.doc_id = $anchor.doc_id") ++
      (2 to 4).map(n => s"LEFT JOIN top$n ON top$n.doc_id = $anchor.doc_id") ++
      (5 to 10).map(n => s"LEFT JOIN dup$n ON dup$n.doc_id = $anchor.doc_id"))
      .mkString("\n")

  /** Every repetition rule as the cross-multiplied integer comparison,
    * top-gram thresholds parameterized (percent ×100). */
  private def gopherRepWhere(tops: Seq[Int]): String = {
    val topRules = (2 to 4).map(n => s"COALESCE(top$n.cover, 0)").zip(tops)
      .map { case (c, t) => s"$c * 100 <= tc.tok_chars * $t" }
    val dupRules = (5 to 10).map(n => s"COALESCE(dup$n.cover, 0)")
      .zip(Seq(15, 14, 13, 12, 11, 10))
      .map { case (c, t) => s"$c * 100 <= tc.tok_chars * $t" }
    s"""ln.n_dup * 100 <= ln.n_lines * 30
       |  AND ln.dup_chars * 100 <= ln.chars * 20
       |  AND pr.n_dup * 100 <= pr.n_paras * 30
       |  AND pr.dup_chars * 100 <= pr.chars * 20
       |  AND ${(topRules ++ dupRules).mkString("\n  AND ")}""".stripMargin
  }

  private def gopherRepetitionOracleSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |t0 AS (SELECT doc_id,
       |    COALESCE(array_to_string(toks[1:8], ' '), '') || chr(10) ||
       |    COALESCE(array_to_string(toks[9:16], ' '), '') || chr(10) ||
       |    CASE WHEN doc_id % 4 = 0 THEN COALESCE(array_to_string(toks[1:8], ' '), '')
       |         ELSE COALESCE(array_to_string(toks[17:24], ' '), '') END ||
       |    chr(10) || chr(10) ||
       |    COALESCE(array_to_string(toks[25:30], ' '), '') AS page
       |  FROM t),
       |${gopherRepStatCtes("t0", "page")}
       |SELECT t0.doc_id,
       |  CAST(COALESCE(top2.cover, 0) AS BIGINT) AS top2_chars,
       |  CAST(COALESCE(dup5.cover, 0) AS BIGINT) AS dup5_chars,
       |  tc.tok_chars AS tok_chars
       |FROM t0
       |${gopherRepJoins("t0")}
       |WHERE ${gopherRepWhere(Seq(20, 18, 16))}
       |ORDER BY t0.doc_id""".stripMargin

  /** The q_curation_pipeline3 replay — all five stages: page synthesis
    * (with the deliberately duplicated closing line), C4 cleaning +
    * page rules, the predecessor-scan line dedup, the repetition rules
    * over the DEDUPED text (shared CTE builders, tuned top thresholds),
    * mixture thresholds re-derived from the stage-3 survivor counts in
    * the pinned IEEE order, and the DSIR gate on the SOURCE text via
    * the shared embedded model. */
  private def curationPipeline3OracleSql: String =
    s"""WITH $DsirModelValuesSql,
       |t AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents WHERE text IS NOT NULL),
       |pg AS (SELECT doc_id,
       |    COALESCE(array_to_string(toks[1:6], ' '), '') || '.' || chr(10) ||
       |    'Too short.' || chr(10) ||
       |    COALESCE(array_to_string(toks[7:12], ' '), '') ||
       |      CASE WHEN doc_id % 3 = 0 THEN ' pages need JavaScript enabled.'
       |           ELSE '?' END || chr(10) ||
       |    COALESCE(array_to_string(toks[13:16], ' '), '') || chr(10) ||
       |    CASE WHEN doc_id % 17 = 0 THEN 'Generated from lorem ipsum filler.'
       |         ELSE 'A closing remark for the page.' END || chr(10) ||
       |    CASE WHEN doc_id % 19 = 0 THEN 'template { placeholder } here.'
       |         ELSE 'Another fine sentence here.' END || chr(10) ||
       |    'Another fine sentence here.' AS page
       |  FROM t),
       |cl AS (SELECT doc_id, page,
       |    array_to_string(list_filter(string_split(page, chr(10)),
       |      l -> (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
       |            OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
       |        AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 3
       |        AND NOT contains(lower(l), 'javascript')), chr(10)) AS ctext
       |  FROM pg),
       |s2 AS (SELECT doc_id, ctext FROM cl
       |  WHERE NOT contains(lower(page), 'lorem ipsum')
       |    AND NOT contains(page, '{')
       |    AND length(ctext) - length(regexp_replace(ctext, '[.!?]', '', 'g')) >= 4),
       |ld AS (SELECT doc_id,
       |    array_to_string(list_filter(string_split(ctext, chr(10)),
       |      (x, i) -> NOT list_contains(string_split(ctext, chr(10))[1:i-1], x)),
       |      chr(10)) AS dtext
       |  FROM s2),
       |${gopherRepStatCtes("ld", "dtext")},
       |s4 AS (SELECT ld.doc_id, ld.dtext FROM ld
       |${gopherRepJoins("ld")}
       |WHERE ${gopherRepWhere(Seq(30, 28, 26))}),
       |s4l AS (SELECT s4.doc_id, s4.dtext, d.lang, d.text
       |  FROM s4 JOIN documents d ON d.doc_id = s4.doc_id),
       |cnt AS (SELECT lang, COUNT(*) AS n FROM s4l GROUP BY lang),
       |wts AS (SELECT * FROM (VALUES
       |    ('de', CAST(0.2 AS DOUBLE)), ('en', CAST(0.5 AS DOUBLE)),
       |    ('es', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE))) AS t(lang, wt)),
       |zz AS (SELECT ((CAST(0.2 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |               + CAST(0.2 AS DOUBLE)) + CAST(0.1 AS DOUBLE) AS z),
       |rat AS (SELECT c.lang, c.n, w.wt,
       |    CAST(c.n AS DOUBLE) / (w.wt / zz.z) AS ratio
       |  FROM cnt c JOIN wts w USING (lang), zz),
       |bnd AS (SELECT lang AS bg, ratio AS mr FROM rat ORDER BY ratio, lang LIMIT 1),
       |th AS (SELECT r.lang,
       |    CASE WHEN r.lang = bnd.bg THEN CAST(1152921504606846976 AS BIGINT)
       |         ELSE CAST(floor(least(CAST(1.0 AS DOUBLE),
       |                bnd.mr * (r.wt / zz.z) / CAST(r.n AS DOUBLE))
       |              * CAST(1152921504606846976 AS DOUBLE)) AS BIGINT) END AS t
       |  FROM rat r, bnd, zz),
       |s5 AS (SELECT s4l.* FROM s4l JOIN th ON th.lang = s4l.lang
       |  WHERE CAST(('0x' || substring(md5(s4l.doc_id::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) < th.t),
       |x AS (SELECT doc_id,
       |    CAST(('0x' || substring(md5(unnest(
       |      list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
       |        y -> y <> ''))), 1, 15)) AS BIGINT) % 64 AS bk
       |  FROM s5),
       |w AS (SELECT x.doc_id, SUM(CAST(m.v AS BIGINT)) AS wnum
       |  FROM x JOIN m ON m.b = x.bk GROUP BY x.doc_id),
       |res AS (SELECT s5.doc_id, s5.lang, s5.dtext, COALESCE(w.wnum, 0) AS wnum
       |  FROM s5 LEFT JOIN w ON w.doc_id = s5.doc_id)
       |SELECT doc_id, lang, dtext AS text,
       |  CAST(wnum AS DOUBLE) / 1048576.0 AS log_weight
       |FROM res WHERE wnum >= 0
       |ORDER BY doc_id""".stripMargin

  private val oracleSqlBase: Map[String, String] = Map(
    "q_gopher_repetition" -> gopherRepetitionOracleSql,
    "q_curation_pipeline3" -> curationPipeline3OracleSql,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) - CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_dsl" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 30
        |  AND ((CASE WHEN l_discount >= 0.02 THEN 1 ELSE 0 END
        |      + CASE WHEN l_tax >= 0.02 THEN 1 ELSE 0 END) >= 2)
        |  AND l_returnflag IN ('A','R')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_returnflag""".stripMargin,

    "q_filter_algebra" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE ((l_quantity >= 49.0) OR (ABS(l_discount) > 0.09))
        |  AND l_returnflag IN ('N')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,

    "q_sort_topk" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_quantity DESC, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q_sort_computed" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_extendedprice AS DOUBLE) * (1.0 - CAST(l_discount AS DOUBLE)) AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q_elementwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_discount - 0.05) AS disc_centered,
        |  LEAST(GREATEST(l_quantity, 10.0), 40.0) AS qty_clip,
        |  l_extendedprice / l_quantity AS unit_price
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, disc_centered, qty_clip, unit_price""".stripMargin,

    "q_impute_fixed" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(NULLIF(l_tax, 0.0), -1.0) AS tax_n
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, tax_n""".stripMargin,

    "q_impute_mean" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, NULLIF(l_tax, 0.0) AS tax_n FROM lineitem),
        |m AS (SELECT CAST(SUM(CAST(tax_n AS DECIMAL(28,10))) AS DOUBLE) / COUNT(tax_n) AS mu FROM t)
        |SELECT l_orderkey, l_linenumber, COALESCE(t.tax_n, m.mu) AS tax_n
        |FROM t, m
        |ORDER BY l_orderkey, l_linenumber, tax_n""".stripMargin,

    "q_impute_mode" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity >= 49.0 THEN NULL ELSE l_quantity END AS qty_n FROM lineitem),
        |m AS (SELECT qty_n AS mode_v FROM t WHERE qty_n IS NOT NULL
        |  GROUP BY qty_n ORDER BY count(*) DESC, qty_n LIMIT 1)
        |SELECT l_orderkey, l_linenumber, COALESCE(t.qty_n, m.mode_v) AS qty_n
        |FROM t, m
        |ORDER BY l_orderkey, l_linenumber, qty_n""".stripMargin,

    "q_impute_median" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, NULLIF(l_tax, 0.0) AS tax_n FROM lineitem),
        |m AS (SELECT median(tax_n) AS md FROM t)
        |SELECT l_orderkey, l_linenumber, COALESCE(t.tax_n, m.md) AS tax_n
        |FROM t, m
        |ORDER BY l_orderkey, l_linenumber, tax_n""".stripMargin,

    "q_zscale_matrix" ->
      s"""WITH m AS ($CountMatrixSql),
        |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  SUM(rf_a) AS s_a, SUM(rf_a*rf_a) AS q_a, MAX(rf_a) AS mx_a, MIN(rf_a) AS mn_a,
        |  SUM(rf_n) AS s_n, SUM(rf_n*rf_n) AS q_n, MAX(rf_n) AS mx_n, MIN(rf_n) AS mn_n,
        |  SUM(rf_r) AS s_r, SUM(rf_r*rf_r) AS q_r, MAX(rf_r) AS mx_r, MIN(rf_r) AS mn_r
        |  FROM m)
        |SELECT l_partkey,
        |  CASE WHEN mx_a = mn_a THEN 0.0 ELSE (rf_a - s_a/n)/sqrt((q_a - s_a*s_a/n)/(n - 1.0)) END AS rf_a,
        |  CASE WHEN mx_n = mn_n THEN 0.0 ELSE (rf_n - s_n/n)/sqrt((q_n - s_n*s_n/n)/(n - 1.0)) END AS rf_n,
        |  CASE WHEN mx_r = mn_r THEN 0.0 ELSE (rf_r - s_r/n)/sqrt((q_r - s_r*s_r/n)/(n - 1.0)) END AS rf_r
        |FROM m, s
        |ORDER BY l_partkey""".stripMargin,

    "q_annotate_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_brand, p.p_retailprice
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey""".stripMargin,

    "q_star_join" ->
      """SELECT r.r_name,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name
        |ORDER BY r.r_name""".stripMargin,

    // The salted join must be result-identical to the plain join.
    "q_skew_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, s.s_name
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "q_skew_distinct" ->
      """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_distinct
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,

    // DuckDB's own JSON parser over the file our sink wrote.
    "q_jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, text
        |FROM read_json('/root/repo/data/oracle_side/sf0.01/jsonl_documents.jsonl',
        |  format='newline_delimited',
        |  columns={doc_id: 'BIGINT', lang: 'VARCHAR', source: 'VARCHAR', text: 'VARCHAR'})
        |ORDER BY doc_id""".stripMargin,

    // The query emits the ORC write→read cycle; the oracle reads the
    // ORIGINAL parquet rows. Hash equality == losslessness (the
    // q_bpe_roundtrip gate pattern; DuckDB never parses ORC).
    "q_orc_roundtrip" ->
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin,

    // The xlsx round-trip report re-aggregated from parquet (byte
    // lengths via UTF-8 encode on both sides).
    "q_excel_roundtrip" ->
      """SELECT lang, source,
        |  CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |  CAST(SUM(octet_length(encode(text))) AS DOUBLE) AS n_bytes
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    // Every WARC header field + payload re-derived from the parquet
    // originals (the serialization is a pure function of doc_id/lang/
    // text — see the q_warc query comment).
    "q_warc" ->
      """SELECT doc_id,
        |  'response' AS warc_type,
        |  'http://corpus.local/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
        |  strftime(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND,
        |           '%Y-%m-%dT%H:%M:%SZ') AS "date",
        |  'text/plain; lang=' || lang AS content_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
        |  text
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // DuckDB's own CSV parser over the TSV our sink wrote.
    "q_tsv_roundtrip" ->
      """SELECT doc_id, lang, source, text
        |FROM read_csv('/root/repo/data/oracle_side/sf0.01/tsv_documents.tsv',
        |  delim='\t', header=true,
        |  columns={'doc_id': 'BIGINT', 'lang': 'VARCHAR', 'source': 'VARCHAR', 'text': 'VARCHAR'})
        |ORDER BY doc_id""".stripMargin,

    "q_setops" ->
      """(SELECT l_orderkey FROM lineitem WHERE l_returnflag='R'
        | INTERSECT
        | SELECT l_orderkey FROM lineitem WHERE l_returnflag='A')
        |EXCEPT
        |SELECT l_orderkey FROM lineitem WHERE l_returnflag='N'
        |ORDER BY l_orderkey""".stripMargin,

    "q_window_rank" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn,
        |  RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS qty_rank
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q_cpm" ->
      s"""WITH m AS ($CountMatrixSql),
        |s AS (SELECT SUM(rf_a) AS l_a, SUM(rf_n) AS l_n, SUM(rf_r) AS l_r FROM m)
        |SELECT l_partkey,
        |  rf_a / l_a * 1e6 AS rf_a,
        |  rf_n / l_n * 1e6 AS rf_n,
        |  rf_r / l_r * 1e6 AS rf_r
        |FROM m, s
        |ORDER BY l_partkey""".stripMargin,

    "q_batch_effect" -> BatchEffectOracle.sql(CountMatrixSql),

    "q_tmm_logcpm" -> TmmOracle.sql(CountMatrixSql),

    // Closed-form 3×3 symmetric eigenproblem (trigonometric cubic
    // roots; eigenvectors = cross products of (G−λI) rows), mirroring
    // PcaOp's one-pass centered Gram. See the queries entry for the
    // sign-canonicalization argument.
    "q_pca" ->
      s"""WITH m AS ($CountMatrixSql),
        |c AS (SELECT rf_a - (rf_a+rf_n+rf_r)/3.0 AS ca,
        |             rf_n - (rf_a+rf_n+rf_r)/3.0 AS cn,
        |             rf_r - (rf_a+rf_n+rf_r)/3.0 AS cr FROM m),
        |g AS (SELECT SUM(ca*ca) AS a11, SUM(ca*cn) AS a12, SUM(ca*cr) AS a13,
        |             SUM(cn*cn) AS a22, SUM(cn*cr) AS a23, SUM(cr*cr) AS a33 FROM c),
        |t1 AS (SELECT *, (a11+a22+a33)/3.0 AS q FROM g),
        |t2 AS (SELECT *, sqrt(((a11-q)*(a11-q)+(a22-q)*(a22-q)+(a33-q)*(a33-q)
        |  + 2.0*(a12*a12+a13*a13+a23*a23))/6.0) AS p FROM t1),
        |t4 AS (SELECT *, ((a11-q)/p*((a22-q)/p*(a33-q)/p - a23/p*a23/p)
        |  - a12/p*(a12/p*(a33-q)/p - a23/p*a13/p)
        |  + a13/p*(a12/p*a23/p - (a22-q)/p*a13/p))/2.0 AS r FROM t2),
        |t5 AS (SELECT *, acos(GREATEST(LEAST(r, 1.0), -1.0))/3.0 AS phi FROM t4),
        |lam AS (SELECT *, q + 2.0*p*cos(phi) AS l1,
        |                  q + 2.0*p*cos(phi + 2.0*pi()/3.0) AS l3 FROM t5),
        |lam2 AS (SELECT *, 3.0*q - l1 - l3 AS l2 FROM lam),
        |vraw AS (SELECT k.pc,
        |    CASE k.pc WHEN 1 THEN l1 ELSE l2 END AS lv,
        |    a12*a23 - a13*(a22 - CASE k.pc WHEN 1 THEN l1 ELSE l2 END) AS vx,
        |    a13*a12 - (a11 - CASE k.pc WHEN 1 THEN l1 ELSE l2 END)*a23 AS vy,
        |    (a11 - CASE k.pc WHEN 1 THEN l1 ELSE l2 END)
        |      * (a22 - CASE k.pc WHEN 1 THEN l1 ELSE l2 END) - a12*a12 AS vz
        |  FROM lam2, (VALUES (1),(2)) k(pc)),
        |vnorm AS (SELECT pc, lv,
        |    vx/sqrt(vx*vx+vy*vy+vz*vz) AS ux, vy/sqrt(vx*vx+vy*vy+vz*vz) AS uy,
        |    vz/sqrt(vx*vx+vy*vy+vz*vz) AS uz FROM vraw),
        |coords AS (SELECT pc, lv,
        |    (CASE WHEN ux < 0 THEN -1.0 ELSE 1.0 END) * ux * sqrt(GREATEST(lv, 0.0)) AS c1,
        |    (CASE WHEN ux < 0 THEN -1.0 ELSE 1.0 END) * uy * sqrt(GREATEST(lv, 0.0)) AS c2,
        |    (CASE WHEN ux < 0 THEN -1.0 ELSE 1.0 END) * uz * sqrt(GREATEST(lv, 0.0)) AS c3
        |  FROM vnorm),
        |tot AS (SELECT GREATEST(l1,0.0)+GREATEST(l2,0.0)+GREATEST(l3,0.0) AS t FROM lam2)
        |SELECT s.sample,
        |  round(CASE s.i WHEN 1 THEN (SELECT c1 FROM coords WHERE pc=1)
        |                 WHEN 2 THEN (SELECT c2 FROM coords WHERE pc=1)
        |                 ELSE (SELECT c3 FROM coords WHERE pc=1) END, 4) AS pc1,
        |  round(CASE s.i WHEN 1 THEN (SELECT c1 FROM coords WHERE pc=2)
        |                 WHEN 2 THEN (SELECT c2 FROM coords WHERE pc=2)
        |                 ELSE (SELECT c3 FROM coords WHERE pc=2) END, 4) AS pc2,
        |  round((SELECT GREATEST(lv,0.0) FROM coords WHERE pc=1)
        |    / GREATEST((SELECT t FROM tot), 1e-300), 4) AS expl_var1,
        |  round((SELECT GREATEST(lv,0.0) FROM coords WHERE pc=2)
        |    / GREATEST((SELECT t FROM tot), 1e-300), 4) AS expl_var2
        |FROM (VALUES ('rf_a', 1), ('rf_n', 2), ('rf_r', 3)) s(sample, i)
        |ORDER BY sample""".stripMargin,

    // Exact DBSCAN re-derived in SQL: ε-ball self-join → core degree →
    // recursive-CTE connected components (min-id propagation) → border
    // adoption → canonical min-member relabel. See the queries entry for
    // why this is order-independent on the gate data.
    "q_dbscan" ->
      s"""WITH cm AS ($CountMatrixSql),
        |m AS (SELECT * FROM cm WHERE rf_a + rf_n + rf_r >= 38),
        |pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM m a JOIN m b
        |  ON (a.rf_a-b.rf_a)*(a.rf_a-b.rf_a) + (a.rf_n-b.rf_n)*(a.rf_n-b.rf_n)
        |     + (a.rf_r-b.rf_r)*(a.rf_r-b.rf_r) <= 3.24),
        |core AS (SELECT pa AS id FROM pairs GROUP BY pa HAVING count(*) >= 4),
        |ce AS (SELECT pa, pb FROM pairs
        |  WHERE pa IN (SELECT id FROM core) AND pb IN (SELECT id FROM core)),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT id, id FROM core
        |    UNION
        |    SELECT e.pb, r.rep FROM r JOIN ce e ON e.pa = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node),
        |assigned AS (
        |  SELECT m.l_partkey,
        |    COALESCE(c.rep,
        |      (SELECT MIN(c2.rep) FROM pairs p JOIN comp c2 ON p.pb = c2.node
        |       WHERE p.pa = m.l_partkey)) AS rep
        |  FROM m LEFT JOIN comp c ON m.l_partkey = c.node)
        |SELECT l_partkey,
        |  CASE WHEN rep IS NULL THEN CAST(-1 AS BIGINT)
        |       ELSE MIN(l_partkey) OVER (PARTITION BY rep) END AS cluster
        |FROM assigned
        |ORDER BY l_partkey""".stripMargin,

    // Grid-DBSCAN replay: ε-cells → dense cells → recursive-CTE CC over
    // Chebyshev-1 adjacency → min-cell-ranked ids → border = min
    // adjacent id. Cells pack into one BIGINT (coords < 64 at the gate;
    // packed order == numeric lexicographic order the operator uses).
    "q_dbscan_grid" ->
      s"""WITH m AS ($CountMatrixSql),
        |cells AS (SELECT l_partkey,
        |    CAST(floor(rf_a / 1.0) AS BIGINT) AS c0,
        |    CAST(floor(rf_n / 1.0) AS BIGINT) AS c1,
        |    CAST(floor(rf_r / 1.0) AS BIGINT) AS c2
        |  FROM m),
        |dense AS (SELECT c0, c1, c2 FROM cells
        |  GROUP BY c0, c1, c2 HAVING count(*) >= 3),
        |dk AS (SELECT c0, c1, c2, c0*4096 + c1*64 + c2 AS k FROM dense),
        |e AS (SELECT a.k AS ak, b.k AS bk FROM dk a JOIN dk b
        |  ON abs(a.c0-b.c0) <= 1 AND abs(a.c1-b.c1) <= 1
        |     AND abs(a.c2-b.c2) <= 1 AND a.k <> b.k),
        |comp AS (
        |  WITH RECURSIVE r(k, rep) AS (
        |    SELECT k, k FROM dk
        |    UNION
        |    SELECT e.bk, r.rep FROM r JOIN e ON e.ak = r.k)
        |  SELECT k, MIN(rep) AS rep FROM r GROUP BY k),
        |lab AS (SELECT dk.c0, dk.c1, dk.c2,
        |    DENSE_RANK() OVER (ORDER BY comp.rep) - 1 AS cid
        |  FROM dk JOIN comp USING (k)),
        |pt AS (SELECT c.l_partkey, c.c0, c.c1, c.c2, l.cid AS own
        |  FROM cells c LEFT JOIN lab l USING (c0, c1, c2)),
        |border AS (SELECT p.l_partkey, MIN(l2.cid) AS adj
        |  FROM pt p JOIN lab l2
        |  ON abs(p.c0-l2.c0) <= 1 AND abs(p.c1-l2.c1) <= 1
        |     AND abs(p.c2-l2.c2) <= 1
        |  WHERE p.own IS NULL GROUP BY p.l_partkey)
        |SELECT p.l_partkey,
        |  CAST(COALESCE(p.own, b.adj, -1) AS BIGINT) AS cluster
        |FROM pt p LEFT JOIN border b USING (l_partkey)
        |ORDER BY l_partkey""".stripMargin,

    // Full NOISeq replicate-path re-derivation (see NoiseqOracle).
    "q_noiseq" -> NoiseqOracle.sql,
    // Full NOISeqBIO biological-replicates + rpkm re-derivation.
    "q_noiseq_bio" -> NoiseqBioOracle.sql,

    // Partial oracle via fitted side table (see DeseqWaldOracle).
    "q_deseq2_wald" -> DeseqWaldOracle.sql(oracleSidePath("deseq2_wald")),

    // Partial oracle via fitted side table (see EdgerOracle).
    "q_edger" -> EdgerOracle.sql(oracleSidePath("edger")),

    // Partial oracle via fitted side table (see LrtOracle).
    "q_deseq2_lrt" -> LrtOracle.sql(oracleSidePath("deseq2_lrt")),

    // Embedded-coefficients oracle (q_batch_effect pattern): AD/EP are the
    // dispersion-trend coefficients fitted at the sf0.01 gate
    // (OracleFitProbe prints them — refresh after fixture regeneration);
    // size factors and the closed-form transform re-derive from parquet.
    "q_vst" -> {
      val ad = "0.11765865151955804"
      val ep = "0.0"
      def u(c: String, sf: String) = {
        val q = s"($c / $sf)"
        s"round(log2((1.0 + $ep + 2.0*$ad*$q + " +
          s"2.0*sqrt($ad*$q*(1.0 + $ep + $ad*$q))) / (4.0*$ad)), 4)"
      }
      s"""WITH m AS ($CountMatrixSql),
        |pos AS (SELECT *, (ln(rf_a)+ln(rf_n)+ln(rf_r))/3.0 AS gm FROM m
        |  WHERE rf_a > 0 AND rf_n > 0 AND rf_r > 0),
        |sf AS (SELECT
        |  exp(quantile_cont(ln(rf_a) - gm, 0.5)) AS sa,
        |  exp(quantile_cont(ln(rf_n) - gm, 0.5)) AS sn,
        |  exp(quantile_cont(ln(rf_r) - gm, 0.5)) AS sr FROM pos)
        |SELECT l_partkey,
        |  ${u("rf_a", "sf.sa")} AS rf_a,
        |  ${u("rf_n", "sf.sn")} AS rf_n,
        |  ${u("rf_r", "sf.sr")} AS rf_r
        |FROM m, sf
        |ORDER BY l_partkey""".stripMargin
    },

    // PARTIAL oracle: embedded converged centroids (OracleFitProbe) +
    // nearest-centroid assignment with lowest-index tie-break (Spark ML
    // findClosest keeps the first strict minimum), canonicalized to min
    // member l_partkey. Verifies assignment semantics, not the fit.
    "q_kmeans" -> {
      val cs = Seq(
        Seq("7.6348920863309360", "8.2230215827338140", "8.2338129496402890"),
        Seq("13.500000000000000", "8.8696498054474710", "8.7120622568093380"),
        Seq("9.4271844660194170", "14.201456310679610", "9.1310679611650480"),
        Seq("9.5752895752895760", "9.5444015444015450", "13.953667953667955"))
      val dists = cs.zipWithIndex.map { case (c, i) =>
        s"(rf_a-(${c(0)}))*(rf_a-(${c(0)})) + (rf_n-(${c(1)}))*(rf_n-(${c(1)})) + " +
          s"(rf_r-(${c(2)}))*(rf_r-(${c(2)})) AS d$i"
      }.mkString(",\n  ")
      s"""WITH m AS ($CountMatrixSql),
        |d AS (SELECT l_partkey,
        |  $dists
        |FROM m),
        |a AS (SELECT l_partkey,
        |  CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
        |       WHEN d1 <= d2 AND d1 <= d3 THEN 1
        |       WHEN d2 <= d3 THEN 2
        |       ELSE 3 END AS c
        |FROM d)
        |SELECT l_partkey, MIN(l_partkey) OVER (PARTITION BY c) AS cluster
        |FROM a
        |ORDER BY l_partkey""".stripMargin
    },

    // Ward flat k=3 cut == connected components over the 197 kept-merge
    // edges (member-key pairs emitted by OracleFitProbe from the fitted
    // linkage matrix and replay-verified there against the op's labels).
    // Verifies cut/labeling/join-back; the Ward NN-chain objective is
    // pinned by ClusteringSpec. Refresh after any fixture change.
    "q_agglo" ->
      s"""WITH cm AS ($CountMatrixSql),
        |sub AS (SELECT l_partkey FROM cm ORDER BY l_partkey LIMIT 200),
        |ev(pa, pb) AS (VALUES
        |    (81,160),(58,168),(9,144),(17,63),(95,141),(36,164),(126,185),
        |    (147,156),(56,165),(100,131),(60,169),(118,166),(1,84),(108,130),
        |    (14,39),(48,189),(59,187),(7,124),(10,180),(88,104),(31,127),
        |    (57,158),(68,159),(41,91),(133,155),(77,80),(179,192),(37,113),
        |    (72,135),(21,51),(71,191),(25,111),(29,89),(30,40),(33,175),
        |    (38,199),(103,129),(92,119),(54,102),(150,153),(90,198),(87,181),
        |    (109,171),(176,58),(8,81),(172,147),(193,36),(85,108),(137,48),
        |    (46,57),(154,41),(178,72),(195,7),(140,77),(182,8),(2,82),
        |    (120,148),(4,28),(86,93),(66,115),(11,35),(94,167),(16,18),
        |    (145,183),(27,121),(32,122),(34,98),(44,143),(53,146),(67,139),
        |    (70,194),(14,54),(56,1),(100,147),(43,126),(116,72),(5,97),
        |    (188,59),(13,88),(184,10),(133,179),(45,105),(26,142),(23,61),
        |    (177,29),(55,107),(75,190),(79,152),(78,92),(110,134),(151,30),
        |    (132,174),(163,37),(50,16),(76,66),(157,95),(106,161),(75,132),
        |    (48,53),(123,77),(52,133),(6,86),(3,85),(101,149),(120,94),
        |    (19,20),(42,170),(62,99),(9,70),(21,32),(112,14),(73,90),
        |    (0,22),(65,197),(103,87),(114,26),(47,5),(74,79),(25,58),
        |    (36,106),(117,118),(67,1),(38,150),(68,16),(138,4),(136,60),
        |    (17,94),(71,23),(96,59),(109,27),(46,37),(34,66),(41,44),
        |    (24,19),(33,8),(10,45),(110,60),(2,78),(186,0),(69,128),
        |    (31,17),(101,73),(49,125),(100,59),(173,4),(9,117),(14,37),
        |    (15,196),(77,52),(38,27),(12,13),(7,62),(145,16),(64,95),
        |    (83,74),(11,5),(21,41),(25,34),(162,65),(75,1),(43,30),(26,15),
        |    (23,7),(42,49),(72,21),(48,6),(3,14),(36,73),(87,1),(55,69),
        |    (10,4),(29,5),(17,12),(8,16),(60,65),(2,25),(74,3),(9,30),
        |    (0,15),(59,1),(52,2),(19,64),(27,1),(42,6),(7,9),(8,0),
        |    (36,12),(5,2),(21,60),(4,0),(55,7),(1,6),(3,12),(21,7),
        |    (19,2),(1,2),(0,3)),
        |e AS (SELECT pa, pb FROM ev UNION ALL SELECT pb, pa FROM ev),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT l_partkey, l_partkey FROM sub
        |    UNION
        |    SELECT e.pb, r.rep FROM r JOIN e ON e.pa = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node)
        |SELECT node AS l_partkey, rep AS cluster
        |FROM comp
        |ORDER BY l_partkey""".stripMargin,

    // Single-linkage flat k-cut == connected components of the ε-graph
    // when the cut boundary is strict: on the gate subset kept merges
    // have d² ≤ 13 and removed ones ≥ 14 (integer lattice distances), so
    // ε² = 13 reproduces the k=5 cut exactly. Same recursive-CTE
    // component machinery as q_dbscan; labels are min member id.
    "q_agglo_single" ->
      s"""WITH cm AS ($CountMatrixSql),
        |sub AS (SELECT * FROM cm ORDER BY l_partkey LIMIT 200),
        |e AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM sub a JOIN sub b
        |  ON a.l_partkey <> b.l_partkey AND
        |     (a.rf_a-b.rf_a)*(a.rf_a-b.rf_a) + (a.rf_n-b.rf_n)*(a.rf_n-b.rf_n)
        |     + (a.rf_r-b.rf_r)*(a.rf_r-b.rf_r) <= 13.0),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT l_partkey, l_partkey FROM sub
        |    UNION
        |    SELECT e.pb, r.rep FROM r JOIN e ON e.pa = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node)
        |SELECT node AS l_partkey, rep AS cluster
        |FROM comp
        |ORDER BY l_partkey""".stripMargin,

    "q_bh_fdr" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber,
        |    ((l_orderkey*7 + l_linenumber*13) % 9973)/9973.0 AS p FROM lineitem),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p) AS rk, COUNT(*) OVER () AS n FROM t)
        |SELECT l_orderkey, l_linenumber, p,
        |  LEAST(MIN(p*n/rk) OVER (ORDER BY p DESC), 1.0) AS fdr
        |FROM r
        |ORDER BY l_orderkey, l_linenumber, p""".stripMargin,

    "q_text_stats" ->
      s"""${TextFunctionsOracle.statsCtes}
        |SELECT doc_id, n_tokens, n_punct, n_stop, mean_tok_len,
        |  ${TextFunctionsOracle.qualityExpr} AS quality,
        |  ${TextFunctionsOracle.langExpr} AS lang_pred
        |FROM sc
        |ORDER BY doc_id""".stripMargin,

    "q_text_curation" ->
      s"""${TextFunctionsOracle.statsCtes},
        |m AS (
        |  SELECT doc_id, n_tokens,
        |    ${TextFunctionsOracle.qualityExpr} AS quality,
        |    ${TextFunctionsOracle.langExpr} AS lang_pred
        |  FROM sc)
        |SELECT doc_id, n_tokens, quality, lang_pred
        |FROM m
        |WHERE quality >= 0.5 AND lang_pred = 'en' AND n_tokens BETWEEN 10 AND 1000
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS canonical_id, count(*) AS n_docs
        |FROM documents
        |GROUP BY 1
        |ORDER BY fingerprint""".stripMargin,

    // LSH output equals the exact all-pairs Jaccard at this threshold:
    // verification inside buckets is EXACT (so no false positives), and
    // candidate recall at the corpus' verified-J modes (families ≈ 0.97)
    // is > 1 - 1e-4 with 16×8 banding — confirmed by running both sides
    // on the gate corpus. DuckDB recomputes the shingle sets from scratch.
    "q_dedup_minhash" -> DedupOracle.pairSql(
      DedupOracle.charShingleCtes("documents"), 0.8),

    "q_multimodal_frames" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, 'png' AS format,
        |  CAST(doc_id % 7 + 1 AS INTEGER) AS width,
        |  CAST(doc_id % 5 + 1 AS INTEGER) AS height
        |FROM documents, LATERAL unnest(generate_series(0, CAST(doc_id % 4 AS BIGINT))) t(i)
        |WHERE i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_text_winnow" ->
      s"""WITH n AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN length(norm) < 5 THEN [norm]
        |         ELSE list_transform(generate_series(1, length(norm) - 4),
        |              i -> substring(norm, i, 5))
        |    END AS grams
        |  FROM n),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(grams,
        |      g -> CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT)) AS hs
        |  FROM g),
        |w AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) < 4 THEN [list_min(hs)]
        |         ELSE list_transform(generate_series(1, len(hs) - 3),
        |              i -> list_min(hs[i:i+3]))
        |    END AS mins
        |  FROM h)
        |SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fp
        |FROM w
        |ORDER BY doc_id, fp""".stripMargin,

    // Exact all-pairs ground truth; |len diff| ≤ d is a LOWER BOUND on
    // edit distance (a legitimate prune, not an approximation). The
    // Spark side's LSH candidates lose no true pair (completeness note
    // on fuzzyNearDupPairs), so the row sets coincide.
    "q_dedup_fuzzy" ->
      s"""WITH d AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS nt FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.nt, b.nt) AS INTEGER) AS dist
        |FROM d a JOIN d b
        |  ON a.doc_id < b.doc_id AND abs(length(a.nt) - length(b.nt)) <= 20
        |WHERE levenshtein(a.nt, b.nt) <= 20
        |ORDER BY id_a, id_b""".stripMargin,

    // 10-token disjoint chunk units (the q_chunk_windows CTE at
    // max=10/overlap=0), first occurrence per distinct unit by
    // (doc, pos), ordered reassembly per doc.
    "q_paragraph_dedup" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) <= 10 THEN 1
        |         ELSE 1 + (len(toks) - 10 + 9) // 10 END AS nchunks
        |  FROM t WHERE len(toks) >= 1),
        |u AS (
        |  SELECT doc_id, g.i AS chunk_ix,
        |    array_to_string(toks[(g.i * 10 + 1):(g.i * 10 + least(10, n - g.i * 10))], ' ') AS chunk_text
        |  FROM k, unnest(generate_series(0, nchunks - 1)) AS g(i)),
        |f AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_text
        |    ORDER BY doc_id, chunk_ix) AS rn
        |  FROM u)
        |SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_ix) AS text
        |FROM f WHERE rn = 1
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Same sentinel mark-and-split (RE2 \1 backreference), gapped
    // positions (relative order is all the first-occurrence rule and
    // the reassembly sort read), ROW_NUMBER first-occurrence, ordered
    // string_agg.
    "q_sentence_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || ' Subscribe to our newsletter today. Thanks for reading issue '
        |         || (doc_id % 7) || '.' AS text
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '([.!?]+)[ \t]+', '\1' || chr(1), 'g') AS t
        |  FROM d),
        |x AS (
        |  SELECT doc_id, unnest(string_split(t, chr(1))) AS unit,
        |    generate_subscripts(string_split(t, chr(1)), 1) AS pos
        |  FROM m),
        |u AS (SELECT doc_id, pos, unit FROM x WHERE unit <> ''),
        |f AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY unit
        |    ORDER BY doc_id, pos) AS rn
        |  FROM u)
        |SELECT doc_id, string_agg(unit, ' ' ORDER BY pos) AS text
        |FROM f WHERE rn = 1
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // Full replay of the duplicate-span scrub: same 8-token grams on the
    // portable md5 hash, duplicate/canonical marking via windows ((doc,
    // start) unique ⟹ ROW_NUMBER over (doc_id, s) ≡ Spark's
    // min(struct) canonical rule), interval coverage via
    // generate_series, ordered reassembly via string_agg.
    "q_dedup_spans" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, g.i - 1 AS s,
        |    CAST(('0x' || substring(md5(array_to_string(toks[g.i:g.i+7], ' ')), 1, 15)) AS BIGINT) AS gram
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE len(toks) >= 8),
        |d AS (
        |  SELECT doc_id, s,
        |    count(*) OVER (PARTITION BY gram) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, s) AS rn
        |  FROM o),
        |cov AS (
        |  SELECT DISTINCT doc_id, g.ix AS ix
        |  FROM d, unnest(generate_series(s, s + 7)) AS g(ix)
        |  WHERE cnt >= 2 AND rn >= 2),
        |tok AS (
        |  SELECT doc_id, g.i - 1 AS ix, toks[g.i] AS tok
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)
        |  WHERE len(toks) >= 1),
        |j AS (
        |  SELECT tok.doc_id, tok.ix, tok.tok, cov.ix IS NOT NULL AS rm
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.ix = cov.ix)
        |SELECT doc_id,
        |  string_agg(tok, ' ' ORDER BY ix) FILTER (WHERE NOT rm) AS text,
        |  CAST(count(*) FILTER (WHERE rm) AS INT) AS n_tokens_removed
        |FROM j GROUP BY doc_id
        |HAVING count(*) FILTER (WHERE NOT rm) > 0
        |ORDER BY doc_id""".stripMargin,

    // Incremental form: the corpus (doc_id % 7 <> 0) contributes a
    // distinct gram set; every probe occurrence matching it is
    // scrubbed unconditionally (the corpus holds the canonicals).
    "q_dedup_spans_incremental" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |cg AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substring(md5(array_to_string(toks[g.i:g.i+7], ' ')), 1, 15)) AS BIGINT) AS gram
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE doc_id % 7 <> 0 AND len(toks) >= 8),
        |po AS (
        |  SELECT doc_id, g.i - 1 AS s,
        |    CAST(('0x' || substring(md5(array_to_string(toks[g.i:g.i+7], ' ')), 1, 15)) AS BIGINT) AS gram
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE doc_id % 7 = 0 AND len(toks) >= 8),
        |hit AS (SELECT po.doc_id, po.s FROM po JOIN cg USING (gram)),
        |cov AS (
        |  SELECT DISTINCT doc_id, g.ix AS ix
        |  FROM hit, unnest(generate_series(s, s + 7)) AS g(ix)),
        |tok AS (
        |  SELECT doc_id, g.i - 1 AS ix, toks[g.i] AS tok
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)
        |  WHERE doc_id % 7 = 0 AND len(toks) >= 1),
        |j AS (
        |  SELECT tok.doc_id, tok.ix, tok.tok, cov.ix IS NOT NULL AS rm
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.ix = cov.ix)
        |SELECT doc_id,
        |  string_agg(tok, ' ' ORDER BY ix) FILTER (WHERE NOT rm) AS text,
        |  CAST(count(*) FILTER (WHERE rm) AS INT) AS n_tokens_removed
        |FROM j GROUP BY doc_id
        |HAVING count(*) FILTER (WHERE NOT rm) > 0
        |ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      s"""WITH n AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents),
        |t AS (
        |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS toks
        |  FROM n),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 4),
        |              i -> array_to_string(toks[i:i+4], ' '))
        |    END)) AS gram
        |  FROM t),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 31 = 0)
        |SELECT g.doc_id, count(*) AS n_hits
        |FROM g JOIN bg USING (gram)
        |WHERE g.doc_id % 31 <> 0
        |GROUP BY g.doc_id
        |ORDER BY doc_id""".stripMargin,

    // The q_decontaminate gram walk with the roles swapped: rollup per
    // EVAL doc over a LEFT join against the corpus' distinct gram set,
    // flag by the same cross-multiplied integer comparison.
    "q_eval_contamination" ->
      s"""WITH n AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents),
        |t AS (
        |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS toks
        |  FROM n),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 4),
        |              i -> array_to_string(toks[i:i+4], ' '))
        |    END)) AS gram
        |  FROM t),
        |eg AS (SELECT doc_id, gram FROM g WHERE doc_id % 31 = 0),
        |cg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 31 <> 0)
        |SELECT eg.doc_id, count(*) AS n_grams, count(cg.gram) AS n_matched,
        |  CAST(count(cg.gram) * 10 >= count(*) * 7 AS INT) AS contaminated
        |FROM eg LEFT JOIN cg ON eg.gram = cg.gram
        |GROUP BY eg.doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_incremental" ->
      s"""${DedupOracle.charShingleCtes("documents")},
        |p AS (
        |  SELECT a.doc_id AS probe_id, b.doc_id AS corpus_id,
        |    ${DedupOracle.jaccardExpr} AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0)
        |SELECT probe_id, corpus_id, jaccard FROM p WHERE jaccard >= 0.8
        |ORDER BY probe_id, corpus_id""".stripMargin,

    // The incremental-screen derivation with the removed ids excluded
    // from the corpus side: an index that forgot id%5 must answer as if
    // those docs were never indexed.
    "q_lsh_index_remove" ->
      s"""${DedupOracle.charShingleCtes("documents")},
        |p AS (
        |  SELECT a.doc_id AS probe_id, b.doc_id AS corpus_id,
        |    ${DedupOracle.jaccardExpr} AS jaccard
        |  FROM sh a JOIN sh b
        |    ON a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0 AND b.doc_id % 5 <> 0)
        |SELECT probe_id, corpus_id, jaccard FROM p WHERE jaccard >= 0.8
        |ORDER BY probe_id, corpus_id""".stripMargin,

    // Independent derivation by the same id arithmetic — no diff run.
    "q_corpus_diff" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 'removed' WHEN 2 THEN 'changed'
        |    WHEN 4 THEN 'added' END AS status
        |FROM documents
        |WHERE doc_id % 5 IN (0, 2, 4)
        |ORDER BY doc_id""".stripMargin,

    // Exact all-pairs Jaccard graph (≡ the LSH pairs at this corpus,
    // the q_dedup_minhash recall argument) rolled up by unordered
    // source pair.
    "q_source_overlap" ->
      s"""${DedupOracle.charShingleCtes("documents")},
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    ${DedupOracle.jaccardExpr} AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |q AS (SELECT id_a, id_b FROM p WHERE jaccard >= 0.8)
        |SELECT least(da.source, db.source) AS group_a,
        |  greatest(da.source, db.source) AS group_b,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM q
        |JOIN documents da ON q.id_a = da.doc_id
        |JOIN documents db ON q.id_b = db.doc_id
        |GROUP BY 1, 2
        |ORDER BY group_a, group_b""".stripMargin,

    "q_dedup_ngram" -> DedupOracle.pairSql(
      DedupOracle.wordNgramCtes("documents"), 0.4),

    "q_dedup_simhash" -> DedupOracle.simhashSql(3),

    // All-pairs asymmetric-containment ground truth over the snippet-
    // augmented corpus: the Spark side's prefix filtering is LOSSLESS
    // (pigeonhole on the rarest-gram prefix), so its candidate-join
    // output must equal this exact derivation row for row. The
    // threshold compares in integer basis points; containment is one
    // IEEE division of exact integers.
    "q_dedup_containment" ->
      s"""${DedupOracle.containmentCtes}
        |SELECT id_a, id_b, n_a, n_b, n_inter,
        |  CAST(n_inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
        |FROM p WHERE n_inter * 10000 >= 8000 * n_a
        |ORDER BY id_a, id_b""".stripMargin,

    // Survivor set of the one-pass containment scrub: drop id_a when
    // tau-contained in a strictly-larger gram set (ties toward the
    // smaller id), keep everything else — including snippet ids whose
    // only container is themselves dropped.
    "q_containment_scrub" ->
      s"""${DedupOracle.containmentCtes},
        |dropped AS (
        |  SELECT DISTINCT id_a FROM p
        |  WHERE n_inter * 10000 >= 8000 * n_a
        |    AND (n_b > n_a OR (n_b = n_a AND id_b < id_a)))
        |SELECT doc_id FROM corpus
        |WHERE doc_id NOT IN (SELECT id_a FROM dropped)
        |ORDER BY doc_id""".stripMargin,

    // Exact probe×corpus containment ground truth (probe = the same
    // derived snippets): the screen's prefix filtering is lossless, so
    // its candidate output must equal the full cross product's
    // surviving rows.
    "q_containment_screen" ->
      s"""WITH n0 AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents WHERE text IS NOT NULL),
        |t0 AS (
        |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS toks
        |  FROM n0),
        |pr AS (
        |  SELECT doc_id + 1000000 AS probe_id, toks[1:((len(toks) + 2) // 3)] AS toks
        |  FROM t0 WHERE doc_id % 7 = 0),
        |shc AS (SELECT doc_id, ${DedupOracle.shCase("toks")} AS s FROM t0),
        |shp AS (SELECT probe_id, ${DedupOracle.shCase("toks")} AS s FROM pr),
        |p AS (
        |  SELECT p.probe_id, c.doc_id AS corpus_id,
        |    len(p.s) AS n_probe, len(list_intersect(p.s, c.s)) AS n_inter
        |  FROM shp p, shc c)
        |SELECT probe_id, corpus_id, n_probe, n_inter,
        |  CAST(n_inter AS DOUBLE) / CAST(n_probe AS DOUBLE) AS containment
        |FROM p WHERE n_inter * 10000 >= 8000 * n_probe
        |ORDER BY probe_id, corpus_id""".stripMargin,

    // The q_text_winnow fingerprint chain joined pairwise: all-integer
    // shared-fingerprint counts — the MOSS detector's ground truth.
    "q_dedup_winnow" ->
      s"""WITH n AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN length(norm) < 5 THEN [norm]
        |         ELSE list_transform(generate_series(1, length(norm) - 4),
        |              i -> substring(norm, i, 5))
        |    END AS grams
        |  FROM n),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(grams,
        |      g -> CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT)) AS hs
        |  FROM g),
        |w AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) < 4 THEN [list_min(hs)]
        |         ELSE list_transform(generate_series(1, len(hs) - 3),
        |              i -> list_min(hs[i:i+3]))
        |    END AS mins
        |  FROM h),
        |f AS (SELECT doc_id, list_distinct(mins) AS fps FROM w),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(a.fps) AS n_a, len(b.fps) AS n_b,
        |    len(list_intersect(a.fps, b.fps)) AS n_shared
        |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, n_a, n_b, n_shared,
        |  CAST(n_shared AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE) AS coverage
        |FROM p
        |WHERE n_shared >= 5 AND n_shared * 10000 >= 9000 * least(n_a, n_b)
        |ORDER BY id_a, id_b""".stripMargin,

    // Stage-for-stage re-derivation of the end-to-end curation pass;
    // every fragment is the same proven SQL as its standalone oracle.
    "q_curation_pipeline" ->
      s"""${TextFunctionsOracle.statsCtes},
        |cur AS (
        |  SELECT doc_id, text FROM sc
        |  WHERE doc_id % 31 <> 0
        |    AND ${TextFunctionsOracle.qualityExpr} >= 0.5
        |    AND ${TextFunctionsOracle.langExpr} = 'en'
        |    AND n_tokens BETWEEN 10 AND 1000),
        |dd AS (
        |  SELECT doc_id, text,
        |    ROW_NUMBER() OVER (PARTITION BY md5(${DedupOracle.normExpr}) ORDER BY doc_id) AS rn
        |  FROM cur),
        |surv AS (SELECT doc_id, text FROM dd WHERE rn = 1),
        |${DedupOracle.charShingleCtes("surv").stripPrefix("WITH ")},
        |losers AS (
        |  SELECT DISTINCT b.doc_id AS doc_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE ${DedupOracle.jaccardExpr} >= 0.8),
        |nd AS (
        |  SELECT doc_id, text FROM surv
        |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |ct AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM nd),
        |gn AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 4),
        |              i -> array_to_string(toks[i:i+4], ' '))
        |    END)) AS gram
        |  FROM ct),
        |et AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 31 = 0),
        |bg AS (
        |  SELECT DISTINCT unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 4),
        |              i -> array_to_string(toks[i:i+4], ' '))
        |    END)) AS gram
        |  FROM et),
        |cont AS (SELECT DISTINCT gn.doc_id FROM gn JOIN bg USING (gram))
        |SELECT doc_id FROM nd
        |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
        |ORDER BY doc_id""".stripMargin,

    // v2 = the v1 chain + the q_dedup_spans fragment on the near-dup
    // survivors + decontamination over the SCRUBBED text; the final
    // text column rides the hash.
    "q_curation_pipeline2" ->
      s"""${TextFunctionsOracle.statsCtes},
        |cur AS (
        |  SELECT doc_id, text FROM sc
        |  WHERE doc_id % 31 <> 0
        |    AND ${TextFunctionsOracle.qualityExpr} >= 0.5
        |    AND ${TextFunctionsOracle.langExpr} = 'en'
        |    AND n_tokens BETWEEN 10 AND 1000),
        |dd AS (
        |  SELECT doc_id, text,
        |    ROW_NUMBER() OVER (PARTITION BY md5(${DedupOracle.normExpr}) ORDER BY doc_id) AS rn
        |  FROM cur),
        |surv AS (SELECT doc_id, text FROM dd WHERE rn = 1),
        |${DedupOracle.charShingleCtes("surv").stripPrefix("WITH ")},
        |losers AS (
        |  SELECT DISTINCT b.doc_id AS doc_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE ${DedupOracle.jaccardExpr} >= 0.8),
        |nd AS (
        |  SELECT doc_id, text FROM surv
        |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |spt AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM nd),
        |spo AS (
        |  SELECT doc_id, g.i - 1 AS s,
        |    CAST(('0x' || substring(md5(array_to_string(toks[g.i:g.i+7], ' ')), 1, 15)) AS BIGINT) AS gram
        |  FROM spt, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE len(toks) >= 8),
        |spd AS (
        |  SELECT doc_id, s,
        |    count(*) OVER (PARTITION BY gram) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, s) AS rn
        |  FROM spo),
        |spcov AS (
        |  SELECT DISTINCT doc_id, g.ix AS ix
        |  FROM spd, unnest(generate_series(s, s + 7)) AS g(ix)
        |  WHERE cnt >= 2 AND rn >= 2),
        |sptok AS (
        |  SELECT doc_id, g.i - 1 AS ix, toks[g.i] AS tok
        |  FROM spt, unnest(generate_series(1, len(toks))) AS g(i)
        |  WHERE len(toks) >= 1),
        |spj AS (
        |  SELECT sptok.doc_id, sptok.ix, sptok.tok, spcov.ix IS NOT NULL AS rm
        |  FROM sptok LEFT JOIN spcov ON sptok.doc_id = spcov.doc_id AND sptok.ix = spcov.ix),
        |scr AS (
        |  SELECT doc_id,
        |    string_agg(tok, ' ' ORDER BY ix) FILTER (WHERE NOT rm) AS text
        |  FROM spj GROUP BY doc_id
        |  HAVING count(*) FILTER (WHERE NOT rm) > 0),
        |ct AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM scr),
        |gn AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 4),
        |              i -> array_to_string(toks[i:i+4], ' '))
        |    END)) AS gram
        |  FROM ct),
        |et AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 31 = 0),
        |bg AS (
        |  SELECT DISTINCT unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 4),
        |              i -> array_to_string(toks[i:i+4], ' '))
        |    END)) AS gram
        |  FROM et),
        |cont AS (SELECT DISTINCT gn.doc_id FROM gn JOIN bg USING (gram))
        |SELECT doc_id, text FROM scr
        |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_pipeline" ->
      s"""${DedupOracle.survivorsCte},
        |${DedupOracle.charShingleCtes("surv").stripPrefix("WITH ")},
        |losers AS (
        |  SELECT DISTINCT b.doc_id AS doc_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE ${DedupOracle.jaccardExpr} >= 0.8)
        |SELECT doc_id FROM surv
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(doc_id % 7 + 1 AS INTEGER) AS width,
        |  CAST(doc_id % 5 + 1 AS INTEGER) AS height,
        |  3 AS channels,
        |  CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |  CAST((doc_id % 50 + 1) * 160 AS BIGINT) AS n_samples,
        |  CAST((doc_id % 50 + 1) * 160 AS BIGINT) * 1000
        |    // CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS duration_ms
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Every ISO-BMFF field the codec parses back, re-derived by the id
    // arithmetic that synthesized it (brand/handlers are container
    // constants; the duration arm past u32 pins the version-1 64-bit
    // box layout).
    "q_mp4_meta" ->
      """SELECT doc_id, 'isom' AS brand,
        |  CAST(600 + (doc_id % 5) * 100 AS BIGINT) AS timescale,
        |  CAST((doc_id % 50 + 1) * 300
        |    + CASE WHEN doc_id % 4 = 0 THEN 4294967296 ELSE 0 END AS BIGINT) AS duration,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER) AS n_tracks,
        |  CAST((doc_id % 7 + 1) * 16 AS INTEGER) AS width,
        |  CAST((doc_id % 5 + 1) * 16 AS INTEGER) AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN 'vide,soun' ELSE 'vide' END AS handlers
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_similarity_ivf_exact" -> // nprobe = nlist ⇒ identical to brute force
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qv, e.v) AS score
        |  FROM q JOIN e ON e.vec_id <> q.query_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // Embedded-constants oracle (q_kmeans pattern): the three ANN paths
    // are deterministic per pinned input (seeded levels/fits over a
    // fresh parquet scan), so the per-query brute-force hit counts are
    // gate constants — measured from the verify output at sf0.01
    // (refresh by reading q_ann_recall's parquet after any fixture or
    // parameter change). A recall regression breaks the hash compare.
    "q_ann_recall" -> {
      val hits = Seq(
        ("bq", Seq(3, 5, 1, 3, 4, 3, 0, 2)),
        ("bq_refine", Seq(8, 10, 4, 5, 10, 9, 5, 4)),
        ("hnsw", Seq(10, 10, 10, 10, 10, 10, 10, 10)),
        ("ivf", Seq(6, 7, 9, 5, 8, 8, 9, 10)),
        ("lsh", Seq(4, 6, 7, 6, 5, 8, 4, 7)),
        ("ivfpq", Seq(1, 4, 6, 3, 6, 6, 3, 5)),
        ("ivfpq_refine", Seq(5, 7, 9, 5, 8, 7, 8, 10)),
        ("pq", Seq(4, 4, 3, 5, 5, 3, 3, 6)),
        ("pq_refine", Seq(10, 9, 9, 9, 9, 10, 7, 10)))
      val rows = for ((m, hs) <- hits; (h, q) <- hs.zipWithIndex)
        yield s"('$m', $q, $h)"
      s"""WITH v(method, query_id, n_hits) AS (VALUES ${rows.mkString(", ")})
        |SELECT method, CAST(query_id AS BIGINT) AS query_id,
        |  CAST(n_hits AS BIGINT) AS n_hits,
        |  floor(CAST(n_hits AS DOUBLE) / 10.0 * 1e4 + 0.5) / 1e4 AS recall
        |FROM v ORDER BY method, query_id""".stripMargin
    },

    // Brute-force replay: the probe-measured HNSW deviation set is
    // empty at the gate (see the query-side comment), so the exact
    // top-10 IS the expected output. Same SQL as q_similarity_topk.
    "q_similarity_hnsw" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qv, e.v) AS score
        |  FROM q JOIN e ON e.vec_id <> q.query_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // FULL oracle, zero fitted constants: the hyperplanes are pure
    // splitmix64 arithmetic on (seed, plane, dim), replayed in SQL with
    // UBIGINT xor/shift and a HUGEINT split-multiply for the wrapping
    // 64-bit products (validated component-for-component against the
    // Scala generator: 4608/4608 exact). Sketch dots use per-plane
    // DOUBLE[] lists + list_inner_product - the same sequential
    // index-order summation as the Scala loop, so the sign bits are
    // bit-exact, not margin-dependent (measured min |dot| 1.8e-5
    // anyway). Downstream: bucket collisions, distinct candidates,
    // exact cosine re-rank - the whole lshTopK path cross-checked.
    "q_similarity_lsh" ->
      """WITH g AS (
        |  SELECT t.range::UBIGINT * 7919 AS seed, p.range::UBIGINT AS p, d.range::UBIGINT AS d
        |  FROM range(6) t, range(12) p, range(64) d),
        |s0 AS (SELECT seed, p, d,
        |  (((((seed)::HUGEINT * 2654435769 % 4294967296 * 4294967296 + (seed)::HUGEINT * 2135587861) % 18446744073709551616)::UBIGINT::HUGEINT + (((p)::HUGEINT * 3210233709 % 4294967296 * 4294967296 + (p)::HUGEINT * 484763065) % 18446744073709551616)::UBIGINT::HUGEINT + d + 1)
        |   % 18446744073709551616)::UBIGINT AS z FROM g),
        |s1 AS (SELECT seed, p, d, (((xor(z, z >> 30))::HUGEINT * 3210233709 % 4294967296 * 4294967296 + (xor(z, z >> 30))::HUGEINT * 484763065) % 18446744073709551616)::UBIGINT AS z FROM s0),
        |s2 AS (SELECT seed, p, d, (((xor(z, z >> 27))::HUGEINT * 2496678331 % 4294967296 * 4294967296 + (xor(z, z >> 27))::HUGEINT * 321982955) % 18446744073709551616)::UBIGINT AS z FROM s1),
        |s3 AS (SELECT seed, p, d, xor(z, z >> 31) AS z FROM s2),
        |pl AS (SELECT seed, p, d,
        |  (((CASE WHEN z >= 9223372036854775808::UBIGINT
        |       THEN z::HUGEINT - 18446744073709551616 ELSE z::HUGEINT END
        |      % 2000000) + 2000000) % 2000000)::DOUBLE / 1000000.0 - 1.0 AS w
        |  FROM s3),
        |pv AS (SELECT seed, p, list(w ORDER BY d) AS pw FROM pl GROUP BY seed, p),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS uv
        |  FROM e),
        |sig AS (SELECT u.vec_id, pv.seed,
        |    CAST(SUM(CASE WHEN list_inner_product(u.uv, pv.pw) > 0
        |      THEN (1::BIGINT << pv.p::INTEGER) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM u CROSS JOIN pv GROUP BY u.vec_id, pv.seed),
        |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM sig q JOIN sig c ON q.seed = c.seed AND q.bucket = c.bucket
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |scored AS (SELECT cd.query_id, cd.neighbor_id,
        |    list_cosine_similarity(qe.v, ne.v) AS score
        |  FROM cand cd
        |  JOIN e qe ON qe.vec_id = cd.query_id
        |  JOIN e ne ON ne.vec_id = cd.neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // PARTIAL oracle (the q_semdedup embedded-centroids pattern): the
    // 16 coarse-quantizer centroids are constants of the deterministic,
    // layout-invariant fitQuantizer fit (OracleFitProbe prints them at
    // the sf0.01 gate — refresh after any testdata regeneration); the
    // SQL replays everything downstream of the fit exactly: unit
    // normalization, argmin cell assignment, the 6-nearest-cell probe
    // set per query, and the exact cosine re-rank inside candidates.
    // The Lloyd fit itself stays pinned by SimilaritySpec. Probe-checked
    // margins at the gate: corpus assign margin (min d2nd-d1st) 5.5e-4,
    // probe boundary (min d7th-d6th) 1.8e-3, rank boundary (min
    // adjacent top-11 score gap) 2.0e-4 - each ~11 orders of magnitude
    // above the ~1e-15 cross-engine ulp disagreement of the distance /
    // cosine formulas, so no discrete choice can flip.
    "q_similarity_ivf" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS uv
        |  FROM e),
        |c(cell, ctr) AS (VALUES
        |  (0, [-0.029647921449040663, 0.022591227551941012, -0.050224233735827774, 0.0055495760947127840, -0.050814233870624816, -0.013243826454324092, -0.0071346718342410790, -0.017274321288120000, -0.020772087994589960, -0.062697202571580570, -0.0064932233768894060, -0.018087499542542100, -0.059497491152962400, -0.029687898488398975, -0.022437686597278565, -0.081902440554351640, -0.023731325996745380, -0.027826328729332610, 0.030134769504679866, 0.015747920830698054, 0.0043024920691457030, -0.016344941810941958, 0.013196314564122100, 0.046448886277278480, 0.066773044348591810, 0.043898425273959820, 0.0067018738058201230, -0.034687889739340440, -0.011286857837536354, -0.029509170565637280, 0.028575274565815900, -0.018900227691767020, 0.035379471687558520, -0.028058580459595597, 0.0026966828163923380, -0.051661442105554890, -0.050542393068864900, -0.042527695021781920, -0.028587060551814043, -0.0055173898794267020, 0.013850163982505643, 0.041055198182015230, 0.055036903249102945, -0.055877073762119000, 0.015629877567566546, 0.044605501452065310, 0.031566478411684265, -0.030437544781449870, 0.041316395696013190, 0.034950055404657225, -0.024182471431135187, 0.019539490863702574, 0.0030935182119666014, -0.048513667771627980, -0.096124355437398680, -0.046742681998915010, 0.048917838609353820, -0.016760238452586380, 0.033743963581947325, 0.041385525918040740, -0.039100627085925730, 0.046587574325254980, -0.014625397492380584, 0.0037834268155730287]::DOUBLE[]),
        |  (1, [0.0054231678316132800, -0.012822579107721268, -0.014747213630607213, -0.031923099879736815, 8.0432442389326590e-05, 0.067592237645187780, 0.016396934983612124, 0.030838371748530810, 0.075361344200407880, 0.080659890181341880, 0.048821852745847480, 0.062278146948031535, 0.013235118283479388, 0.011429049805778742, 0.065062234833440500, 0.0086893483445106520, 0.020376929749953903, 0.015109134280399497, -0.0083652732767849940, -0.033347706914911894, -0.025354957572507462, -0.010845123709754163, -0.024288328386401707, -0.0061390724443633160, -0.018854902532577760, 0.019975619653851244, -0.0096266853365283080, 0.027424432521539626, -0.023367495195376658, -0.058220004076280000, 0.033533418596506444, 0.025518577112393366, 0.053767058872124520, -0.034418508693379360, 0.00039382966917350166, 0.0057262249707925520, -0.035497676130010060, -0.035055086909587430, 0.028936789092844972, 0.014132208045499890, -0.035238182010071990, -0.025320181739921604, -0.015431616739789360, 0.044590869871341130, 0.011206350233669098, -0.067704006969619980, 0.024611843397624414, 0.095469723530261440, -0.027502840741476140, -0.0018147861279036333, 0.023673562281596335, -0.026095478934510714, 0.035281200998325900, -0.027726475385818200, 0.017603131922574563, 0.048547140996394500, -0.046947582065863570, -0.070945555798730520, -0.026765056155018736, -0.11021608239954304, 0.024546649215412340, -0.028222573702781847, -0.066392437045600450, -0.058018802145837550]::DOUBLE[]),
        |  (2, [0.016026937748226392, 0.11885779860784836, -0.024600073906639420, -0.016969727135985463, 0.028987539733133845, 0.0020067465049765387, -0.054888524931464476, 0.066727486357963920, 0.037942958663525360, -0.035881977564606950, -0.045032640843027860, -0.029062966830274126, 0.025244743016908100, 0.0037832451463821115, 0.016455155043517410, 0.066037101043715190, 0.050197752722338720, -0.024471147404454730, -0.018487761373744110, -0.083056028085455670, 0.034250319851192550, 0.0097828571422694970, 0.021619418216388752, -0.034428292271698090, 0.0060676468677977960, -0.018685974293042090, -0.020985567924280715, -0.013414951055419249, -0.021280163980557567, -0.050584243815445950, -0.0014949167834283558, -0.024739391345246470, -0.056812757826272130, -0.034053060722700150, -0.060205535111676194, -0.031710001866574250, 0.039472247959387300, 0.030215655639544068, -0.012982718994981424, -0.031149158577262090, 0.018401382422348500, -0.022457406994424868, -0.038989029362457010, -0.068587187117613230, 0.013767843213098246, -0.036016391534208096, 0.0012251035053926138, 0.066563844387474650, -0.015854493159863557, -0.040221975141589130, -0.040108742980548354, -0.041752452527614630, -0.032263272009916896, -0.0035566268689654324, 0.058352550732959606, -0.010139969530158091, -0.017256656556860397, 0.024253817924616193, -0.052976757654168210, -0.025670816270391313, -0.042127811478261340, -0.097757371362353250, 0.077746087847268840, -0.039227993564877330]::DOUBLE[]),
        |  (3, [0.024066221323009986, -0.051222032993315520, 0.032110780072197200, 0.014941746624570052, 0.0047441633826229790, -0.017957552711141904, -0.049423191550667220, 0.028013323946302744, -0.023302000759014892, -0.029385742763576354, 0.0073434189294371740, 0.012634488735335354, -0.0011325097252666760, -0.057028822624577630, -0.0045422801134861490, -0.020196014302048890, -0.035502672566887890, -0.053608428636152120, 0.019643112056689510, 0.010199397273827302, -0.096405433184596950, 0.010331904982119538, -0.0018491701162578213, 0.034657790683657760, 0.059274671371593260, 0.059267135819457240, 0.058582365787323840, -0.0026300112390851573, 0.075930340874064210, 0.063694642337216010, -0.019695278511459628, 0.10423876718128344, -0.031258231954605390, -0.017892090245514056, 0.020230218167148675, 0.027075234420588307, -0.061881705120894800, 0.054498482389234690, -0.064423683412074770, 0.0094440202829588410, 0.013838095088450303, -0.024290946636017816, -0.0010631209213067590, 0.026832047428885272, -0.044171191844455480, 0.013502732245244820, 0.019626776642200520, -0.0040154521584611580, -0.11029863416947377, 0.013100210575778372, -0.0024926674443572546, 0.014324542184407100, -0.034572067348135394, -0.032527352503555590, -0.026860494781597362, 0.044021055109130840, 0.0094611377350574070, 0.016231864496930353, -0.14271770367012895, -0.026461555275173870, 0.026849700709156835, -0.035561341107701455, 0.021146720562926755, 0.036472843498674770]::DOUBLE[]),
        |  (4, [0.024599188748134777, -0.013862250208097641, 0.016765254557215944, -0.030377661866195012, 0.052957828333253874, 0.042435372160211810, -0.0048678819346133450, -0.066685740718145270, 0.030947012119295220, -0.019288729391777115, -0.028509245672330890, 0.068592799005237150, 0.051106576412291520, 0.053262458019114440, -0.0033097883421820260, 0.033415019109204684, -0.063072231892630990, 0.097805785301323460, -0.054755372137170870, 0.014325436300942620, 0.0087297952503493370, -0.0095927314178518160, -0.035207218946875890, -0.050066260797743180, -0.027209490029287155, 0.041234673100209290, -0.029381374615592783, -0.024582348317585236, -0.040735672783522330, 0.027616022561399868, -0.0017813529193596478, -0.057429572943155700, 0.024290230775312747, 0.046992166661200690, -0.043115660023178090, 0.010273373588522941, -0.041518692458881054, 0.048448260835114950, -0.042806126281460330, 0.021279251100444617, 0.0042626815595332420, -0.093579858699786100, -0.0033557721217184985, 0.0064116226236358970, 0.0080682138525903190, 0.021165008162770310, 0.010581490364369527, -0.042280340262928234, 0.012534006119257882, -0.095978866822702530, -0.0071824173096687490, 0.021735117439400188, 0.019421415541498035, 0.038703931099193820, 0.0010206628975074844, 0.0077266036670802210, 0.019855608914224936, -0.0055470777372517330, 0.061857027939684680, -0.021003104131154342, 0.057589801746460830, -0.048391242882534290, 0.025950152111320970, -0.0074239614519610800]::DOUBLE[]),
        |  (5, [-0.040680154103034920, 0.0071982399645772145, 0.065609393159147270, 0.023041778635976548, 0.0035501449061990102, -0.017372875243193950, -0.021398409536361710, 0.061189066797611160, -0.020494287020027934, 0.050096131911192290, -0.050810854012198470, 0.059731211662609660, 0.041046781810642086, 0.0021306949407077875, 0.10256833391079642, 0.019861740542696262, -0.016214974179037382, -0.049434488505653150, -0.030542765994539170, 0.026220603090256044, -0.0094308055653408820, -0.017416274354215864, -0.051558158435323680, -0.0016133758856317660, 0.050807755133629420, -0.0010356048822724561, -0.039118332835787320, -0.011974980798342734, -0.028498165687556400, -0.0015776812863416690, 0.035238023034880920, -0.024204746091519810, 0.060992852662452954, 0.057884974705589700, 0.015542797604581346, 0.0039285668717522560, 0.046383839788625780, -0.056561685697926620, -0.092376647738401300, -0.072870459907452630, 0.0064005518129155030, -0.020127399676568684, 0.061980828626759770, 0.063805165414902620, -0.078095069717318100, -0.012359194836946313, -0.11438991180822816, -0.022833124218714880, -0.038838901575979065, -0.035239702346503870, 0.047873304066916830, 0.059273215657329490, 0.019907520102290910, 0.023476002765084060, 0.057477299670094810, -0.0099030792597622120, 0.016270180598207923, -0.0035471138628046478, -0.0024813492306441480, 0.062976181518618030, -0.0024684196379151104, -0.030504884587890448, 0.024987463181290373, -0.047695002267489380]::DOUBLE[]),
        |  (6, [-0.016150379121137820, -0.022181088341993248, 0.018657419861759904, -0.0010348074766146518, -0.0073421869011213120, -0.087077678281333400, -0.012366895795408818, 0.063134535195725600, -0.022993312516387050, 0.12778470399996790, 0.024826824773652610, 0.052515286200219390, -0.011454065823686220, -0.0038735678064575370, -0.022614183589106650, -0.039664332161028540, -0.040978163185238656, 0.033501290758353106, 0.0072294790956160640, 0.073671880188968100, -0.015020320130657374, -0.010071753913877617, 0.0054873290534171205, -0.043809767814102760, -0.047477471391255610, 0.0065740251169083540, -0.067236454791169900, 0.070513631172606760, 0.00092069168759027550, 0.053585918474301610, 0.014174332833754270, 0.0071641143633621770, 0.016468235864214020, 0.026981774954528020, -0.054234452648460090, 0.019224917354825847, -0.0014065247995390757, -0.011471646764319030, 0.050150990767214920, -0.039054448468627316, -0.020197719554895452, 0.058293698616498810, -0.089795880579929180, -0.046945049808920856, -0.099467818898730960, 0.0080373413697255400, 0.021169870454243920, 0.020836193883364440, -0.018565548773961292, -0.048193372318944500, 0.072577836489263250, -0.025720219154338128, 0.063859929481016100, 0.0093906315899931950, -0.029839888648539266, -0.0025004114498934082, -0.024495841348177710, -0.065370304518500510, -0.025811279745031920, -0.049471829225265160, -0.0048594974516119850, 0.10597487381243947, -0.031470070616537880, -0.035321488575535400]::DOUBLE[]),
        |  (7, [0.075020265306635110, -0.028149156132891690, -0.0070110073355056570, -0.029590936921644564, 0.070398196303734620, 0.038867739705319640, -0.016359628997025973, -0.023064399047101200, -0.029434386745500540, -0.033186137794295925, 0.0062815192311112605, -0.0038046820039956800, -0.031167185325709120, 0.035286242926226466, 0.0040083952261175730, -0.11395456684777285, 0.033335665187503490, 0.016826080706716214, -0.00015004375012113590, -0.0040046635928051450, 0.027443457563569080, -0.029895894952773037, 0.0029143314859150418, -0.097418247550884640, 0.010624135546298572, 0.058163391165996720, 0.15773768739221708, 0.018702401180714284, -0.015062846647886066, 0.063387659222131460, -0.038593072157996630, -0.035034044827741770, 0.0020430034737115580, -0.010414024975320737, -0.019398110863045135, -0.024122136855847480, -0.0064627568746709840, 0.019810282155871734, 0.077433490680303200, 0.044685175996174970, -0.029919289237588020, -0.0064024724704928480, 0.00071323518684585380, 0.065040981430178170, 0.010029337731497967, 0.0092447116655512990, -0.030515037117816154, -0.018604779698814870, -0.0042352751639103140, 0.048761482283500704, -0.012896034760580022, -0.096306283593568880, -0.055291541011708790, -0.0033884367661456295, 0.015089111247272125, -0.073134562197213320, 0.047513044498984636, -0.016688682118443890, 0.020243099025728212, 0.029756521567586150, 0.058730618052240640, -0.0049592926340754255, 0.041923616424076784, -0.049075754975514516]::DOUBLE[]),
        |  (8, [-0.013813278191274207, 0.056771851356674870, -0.037945141224553060, -0.066992657104304740, -0.090357006648479100, 0.085719759253411780, 0.026154220868051702, 0.013619246982586050, 0.011301971480920600, -0.079925780662271460, -0.039218559338125770, 0.032303875902017580, -0.016513321978382680, -0.032389271036815240, -0.042471408182409735, 0.042169660396714645, 0.014770138800861660, -0.015502595442174557, 0.063017672897811420, 0.071165113645376500, 0.043034990183437455, 0.022737063337339890, 0.036986359935287800, -0.011334529228894538, 0.061518594419707500, -0.012242501526996801, 0.044354029885564020, 0.059478941909536200, -0.0063496906293164860, 0.015004703304107770, -0.033836040681542810, 0.094034712252749550, -0.020887809605628527, -0.014199448224258048, -0.0063720710488178940, 0.099450704413487620, 0.049477933589769840, -0.028869936934276967, 0.037383093951171730, -0.012494534132055254, -0.040595343752532030, 0.013303538175630365, 0.039156594285296430, 0.0028911986054030647, -0.078890134557041820, 0.082984950453431420, 0.030292932549296454, -0.060753113756042330, 0.039101913418314815, 0.014286207323255700, -0.035950945265708490, -0.038399472289196795, 0.017550163215133180, -0.040472659820987400, 0.016203360631147720, -0.037768509996098580, 0.046507693072565144, -0.0048493165352720840, -0.047174032781255110, -0.060976110303827165, -0.021865098380869890, 0.038509347327049887, 0.019400078463300312, 0.0066344468092996160]::DOUBLE[]),
        |  (9, [-0.022744507003192888, -0.039213958777919740, 0.090388703014147130, -0.023527872937832660, 0.010821683798960391, -0.026210751004607030, 0.10197501475370864, 0.031256625401627804, -0.016329702538479820, 0.019053302758436468, 0.068541452723204100, -0.13292115183921932, -0.028525003399970123, -0.018121245442772200, -0.049676602286373016, 0.044821843335013550, 0.085309549148482490, 0.020229031163967360, 0.0046299094846144240, 0.054088819767823730, 0.010222190598216750, -0.027326344811889197, 0.022083233818967433, 0.064330076813007130, -0.050253980505777580, 0.030573465060176580, -0.011083886024347935, 0.048021094401100440, 0.038632988206006220, 0.047483463143081224, 0.063874779532086580, -0.061651329202243420, -0.0033026298107032477, 0.088104450839935220, 0.054243562461029377, -0.021376735622784150, -0.019295656233879393, -0.025491060089876440, -0.022384551957889710, 0.042565469955258820, -0.065146075975159170, 0.033592940058441710, -0.054792268356662780, -0.037799478629562490, 0.016884021400785692, -0.042083462924338420, -0.048803715870267810, -0.010539615762420866, 0.029729328058089370, 0.027063568483125550, 0.012430238332327764, 0.021336810819667595, -0.0011075075059132970, 0.041635598245252690, 0.093032267437129150, 0.00097544810935701990, 0.040355395186824660, -0.054594702461347185, -0.0024916437525869240, 0.012982561253224023, 0.0082429111636323270, -0.012808246184114185, 0.030602848211564688, -0.074116968069564570]::DOUBLE[]),
        |  (10, [0.020215710400967823, -0.062444726227382220, -0.0015334836034316599, -0.0088631034444366290, 0.011183601864211353, -0.031343252079185420, -0.033994773865096486, -0.048962562883023635, -0.025029191581833043, -0.095135053072361540, -0.018237368186193797, -0.055410724517307955, -0.051778406684264075, 0.079077657507807260, -0.051561009768075410, 0.039830934447027490, -0.0078420432806458090, 0.060198778531416580, -0.013450699305434398, 0.014540041667523875, 0.0096895371248144880, 0.11065221707028093, 0.019678941777822048, -0.0071479710874513230, -0.018459871293812487, -0.047952670708988274, -0.017937847233449804, -0.021695789986130774, 0.033459366652525760, 0.015935847239982967, -0.052349627688343926, -0.026571247563192930, -0.082294259991841650, 0.0056915165366595740, 0.047337106752031520, 0.047615525682782220, 0.068275585444189630, 0.057420871398290510, -0.0011205696213072158, -0.00039891310304798663, 0.015673141035302186, -0.041907306225868954, -0.027124868857313080, -0.027247993573501016, 0.052940790614128880, -0.0060456089580613950, -0.010412023669055791, 0.060797236040316760, 0.057077341740181545, 0.041842026988036530, -0.022019887384370173, -0.025164135078529503, 0.060167954584881640, -0.064282907241178040, 0.056330876758225590, 0.053600844202914140, -0.0033721130048704560, -0.022948602581109392, 0.020582368141608530, 0.046754283647467254, -0.022742143448576942, 0.086175126838417000, -0.021373415742153505, -0.017403386278469782]::DOUBLE[]),
        |  (11, [0.038526522379143930, -0.034678532567121510, 0.048746777462743314, 0.027789072386627485, 0.042713822174712826, -0.031672654862959450, 0.0050138868508539820, 0.033463966040552800, -0.0025298068805542397, 0.073961315306474750, -0.0069121645897835050, -0.00095322312438272590, 0.045231683490653720, -0.093384064568272720, 0.038466783158830730, -0.016166173781780250, 0.032856485843784096, 0.028746571619129954, 0.035398582472102230, 0.094766261245226750, 0.038942211651662250, 0.015804182935164498, -0.031880255757615654, 0.061667453744087136, -0.010921094034870168, 0.033156683246164394, -0.0055871868403364250, -0.0022410361061343420, -0.050610550131262200, -0.056703070427634124, -0.052284463342266110, -0.016377304596255398, 0.075291103710709320, -0.023198228349778773, 0.023943939740761016, -0.051449416855007570, 0.014503698608989065, -0.032740241606333810, 0.032597363432853130, -0.029659008593728440, 0.037295698256885286, -0.069179277754062200, -0.038411202827509570, -0.041440781071147334, 0.077751374886389630, -0.00046476612283898710, 0.034391009625173520, 0.0019308546075856839, -0.0074806183305274920, -0.053894336001029740, 0.050749458633737470, 0.018525730007267534, -0.045129016462472755, 0.0027017699152220073, -0.024906686832313785, -0.033324088214170470, 0.059924041058580690, 0.077405624278494680, 0.097073090355139890, -0.069603908958767280, 0.028537775231850738, 0.041880277594575950, -0.10348594357517843, -0.030283229508292334]::DOUBLE[]),
        |  (12, [-0.051432218222805755, -0.0063084465744073750, -0.049623535417360210, 0.018470060915206046, 0.0093304031666605770, 0.051962979717026870, -0.094126072854497020, 0.0064207272646925620, -0.0055855715427632355, -0.0049388667476212905, 0.092416347913036050, -0.033004602155608534, 0.033411900848702050, -0.039431326725653030, -0.0059843155587437490, 0.011192389498479808, 0.025720125180027902, 0.084533560680899480, 0.042898495428095180, -0.085233964472048100, -0.010400756767327525, -0.066784852339005870, 0.076217856830907630, -0.061936763612190560, 0.015883282010014863, -0.011643040484928986, -0.014122837639592252, 0.051067103792119620, -0.032405440706997704, 0.0012521143572688247, -0.048165406500324920, 0.017556348613610558, 0.062429300264583605, -0.046376877649843204, -0.014347241947155547, 0.012092476250616652, 0.031477969018811900, 0.066036140544343080, -0.0049728131022920500, 0.032658733356909615, 0.010877515067991905, 0.0071472608193255670, -0.046948505000909960, 0.0010429796878455504, -0.0078052037709203540, 0.016379733848255074, -0.022686252880172750, 0.0023389467496237226, 0.079298778606828090, -0.027860021932181223, 0.010237812750619246, 0.024232820602677264, -0.025651566777716097, 0.054294101241185010, -0.017536654024287180, 0.020878541717453460, -0.066560566676426830, 0.087093088541764400, -0.071987979577025350, 0.046227775261975110, 0.037307282106521705, 0.010377810860503923, -0.019602333863259530, 0.088936317708231930]::DOUBLE[]),
        |  (13, [-0.10986620818271321, 0.011289771794831701, -0.034135608427023680, 0.027400302861584410, 0.068065674367560470, 0.010884165097258853, 0.016913971718346212, -0.018320240935899484, 0.032279423335441246, 0.078387086804381580, 0.081142696703233600, -0.019816826791137450, -0.061204409806565475, 0.047210347230748975, 0.00064492015014774710, -0.049442690259119370, 0.075090445406747900, -0.028733012535398044, -0.043321836058809515, -0.030406536441330893, -0.036282733558361036, 0.056826125677106930, -0.021672266864470546, -0.020767085609367648, -0.078661813276679000, -0.015448378578836814, -0.020992027769284344, 0.046747656002308200, 0.043545527741538796, -0.0046015797360079500, 0.0038197303358083017, -0.067634985060103820, 0.064048578684468070, -0.047740192807437570, 0.0075563598413310290, 0.052280178714652500, 0.047158168414474070, 0.0082767117209324500, -0.012013682826709947, 0.037568444703006500, 0.053045792403980545, 0.031533492283880170, 0.018353508786390270, -0.0054188611791818360, -0.040765884893122405, -0.056645286172989070, 0.022036963018847920, -0.056072804820244286, -0.055800897849662530, 0.024019805089791537, 0.013817128234716090, -0.010599238982223163, 0.062995473352407420, -0.030381654472269207, 0.011413567657759405, -0.026020751374097126, -0.082215382869093050, 0.033747912004874744, 0.023457498572788334, -0.023671820014005175, 0.010530055485716257, 0.066600320231463090, -0.028361357997634257, -0.011391453600714035]::DOUBLE[]),
        |  (14, [0.089949138033958970, 0.030048516780037900, 0.0048900381022430744, 0.015559563329468593, -0.0065428693733370830, -0.017542139490150700, -0.028444150413880473, 0.080650083009552450, -0.072083078330212700, -0.047939956098268420, 0.010713035995169743, -0.019288504829302933, 0.0064174063525455000, 0.014976435785417982, -0.029649081412913820, 0.070946870666186430, -0.038997735593473554, 0.024856835537844420, -0.017786150918862393, -0.070812936709526100, -0.0041585328860195870, 0.011081656322513697, 0.056450930060534970, -0.017860366452281680, -0.042977924136330926, 0.0071011704971063970, -0.037965445658892990, 0.043267176887004460, 0.0012221258948740350, 0.0024781072869718890, 0.080903937888546590, -0.00088106210401770460, -0.046722748672557400, -0.0046055808904852434, 0.068292248309208780, 0.029857866033370010, -0.10315799730090800, -0.022380731902212233, 0.036952426699581370, 0.010221133801944608, 0.029214818996267230, -0.075528306015866620, 0.069338501570946000, 0.019846004850465090, -0.038368099025675350, 0.060734403474573560, 0.012038840543255817, 0.053689441865531270, -0.0060052293594489260, -0.053867235699913820, 0.047346079130057050, 0.057129271378819240, -0.034703678578425210, 0.00037356312290779694, 0.0015867490325133546, -0.014622506131395041, 0.048758758373446800, -0.019287263919296990, 0.00037942842141819994, 0.024121672225445770, -0.046313655931025330, -0.032420729126402300, -0.0069897203679073360, -0.011064867987229991]::DOUBLE[]),
        |  (15, [0.020865100343680363, -0.072383130272662410, 0.044607680995797885, 0.0046139588440696500, 0.056249447556719845, 0.035275712113886900, -0.12992670341625823, -0.090315479825634290, -0.00045106448659551290, 0.0098828298888998470, -0.022021968059940084, 0.022849236382110640, -0.0010630862071391670, 0.047297825515218760, -0.027300994844051600, 0.083103204458058450, 0.00030658045249274687, -0.088187723566006650, -0.013366792959576015, -0.010227536165564965, -0.023039185026220887, -0.0056862202963805980, -0.013263745291499407, 0.011664375759847254, -0.052761087173234904, 0.00028683767469290443, -0.0032587910940899380, -0.056968655311477774, 0.038385486971012360, -0.054394811054392210, 0.045537658426413836, -0.032890890889111915, -0.036172866996183155, -0.062037509538504670, 0.036384377528703340, -0.12400365552433712, -0.0083257866985067520, -0.036659740074444650, 0.038892202782032490, -0.036961527705272050, -0.052544955098899020, 0.034466625467643740, 0.0061147975890754784, 0.014413015124732195, 0.0043680933761700960, 0.0054251802320669550, -0.0026680365992975525, 0.022363420601956226, -0.039722208254682350, -0.0047596179305261940, 0.029005909779163428, -0.030739383386174435, 0.062691840339983110, 0.049193121636208405, -0.017615711007502876, 0.0041063408208569890, -0.026887660985977408, 0.036661804226275414, 0.044256674807480170, -0.025092613037758327, -0.068064896862766620, 0.0054355040227955070, 0.047443888024180880, 0.022033281580192472]::DOUBLE[])),
        |a AS (SELECT vec_id, cell,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY list_distance(uv, ctr), cell) AS rnk
        |  FROM u CROSS JOIN c),
        |cells AS (SELECT vec_id AS neighbor_id, cell FROM a WHERE rnk = 1),
        |probes AS (SELECT vec_id AS query_id, cell FROM a WHERE vec_id < 8 AND rnk <= 6),
        |cand AS (SELECT p.query_id, cl.neighbor_id
        |  FROM probes p JOIN cells cl USING (cell)
        |  WHERE cl.neighbor_id <> p.query_id),
        |scored AS (SELECT cd.query_id, cd.neighbor_id,
        |    list_cosine_similarity(qe.v, ne.v) AS score
        |  FROM cand cd
        |  JOIN e qe ON qe.vec_id = cd.query_id
        |  JOIN e ne ON ne.vec_id = cd.neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // PARTIAL oracle (the q_similarity_ivf embedded-constants pattern):
    // the 16x16 per-subspace PQ codebooks are constants of the
    // deterministic, layout-invariant Pq.fit (PqOracleProbe prints them
    // at the sf0.01 gate - refresh after any testdata regeneration); the
    // SQL replays everything downstream of the fit exactly: unit
    // normalization, per-subspace argmin encode (index-order squared-L2
    // sums, first-cell ties), the query LUT, the subspace-order ADC sum
    // and the (adist, id) ranking. Probe-checked margins at the gate:
    // encode argmin 3.3e-6, ADC rank boundary 3.3e-4, zero exact ties -
    // each >= 10 orders above cross-engine ulp disagreement.
    "q_similarity_pq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS uv
        |  FROM e),
        |cb(s, cell, ctr) AS (VALUES
        |  (0, 0, [-0.13610586106763312, 0.039118060600433290, -0.022962199820180034, 0.17174565250703275]::DOUBLE[]),
        |  (0, 1, [-0.019466110915790705, 0.028206636520855432, -0.048462577229604770, 0.010645203710871298]::DOUBLE[]),
        |  (0, 2, [0.027222375058049763, 0.13815839032310356, -0.10988835380941009, -0.12433033175038456]::DOUBLE[]),
        |  (0, 3, [0.21768871512900350, -0.036947077397927320, 0.10981679714007980, -0.047450429536651280]::DOUBLE[]),
        |  (0, 4, [0.10700452438421953, -0.12280707935894074, -0.094580119004003540, -0.047208264414167170]::DOUBLE[]),
        |  (0, 5, [-0.19226679252528940, 0.043292933560848240, 0.061147992511911230, -0.0016844055758454420]::DOUBLE[]),
        |  (0, 6, [0.020866403283964732, 0.014594889881664743, 0.13641056469873200, 0.089202433338707450]::DOUBLE[]),
        |  (0, 7, [0.11736627318944645, 0.018826927304429843, 0.022461362436438070, -0.14347243217916947]::DOUBLE[]),
        |  (0, 8, [-0.018945463660768585, 0.18776079767029835, 0.11496019565079368, -0.046879022838273415]::DOUBLE[]),
        |  (0, 9, [-0.043979433753324255, -0.20223327753816092, 0.045629699090889854, 0.042478386235347090]::DOUBLE[]),
        |  (0, 10, [-0.046638257598192570, -0.039893516842072470, 0.23696091282178056, -0.058474396089753494]::DOUBLE[]),
        |  (0, 11, [0.10518875392743285, -0.055722156304101180, -0.0097033910980379860, 0.13229491745153310]::DOUBLE[]),
        |  (0, 12, [0.027597356212321870, -0.0066780771468689860, -0.19254125829932675, 0.10925991853707784]::DOUBLE[]),
        |  (0, 13, [-0.15222656557436862, -0.059831908341600910, -0.16103720282839457, -0.078482457827697350]::DOUBLE[]),
        |  (0, 14, [0.13739652563581528, 0.15019066426794890, -0.061121480460260870, 0.10121707294136302]::DOUBLE[]),
        |  (0, 15, [-0.078758548899238300, -0.060874805417737876, 0.034234734928308770, -0.14911375442285557]::DOUBLE[]),
        |  (1, 0, [-0.11196469286419344, 0.17587524357433648, -0.020115250739304674, -0.014440258251488550]::DOUBLE[]),
        |  (1, 1, [-0.24875634246523900, -0.047856566556752090, -0.043069356825672410, 0.024119215250173890]::DOUBLE[]),
        |  (1, 2, [0.030047104315032536, -0.0016916511809903605, -0.052602143182208620, 0.0072902733526942235]::DOUBLE[]),
        |  (1, 3, [0.090839920752016950, 0.045410812763950335, 0.080462787942599440, -0.14657632148148975]::DOUBLE[]),
        |  (1, 4, [-0.077018806856632500, -0.017118845730793830, 0.081796328163236550, 0.14279085154481586]::DOUBLE[]),
        |  (1, 5, [-0.016299550111460490, -0.11105602804342468, 0.25791983480859860, 0.020915326564511505]::DOUBLE[]),
        |  (1, 6, [0.0042325487744036220, 0.021331027180024154, -0.15912017371862913, -0.18686867598651870]::DOUBLE[]),
        |  (1, 7, [0.034315493023515080, 0.12089693535486767, -0.044736488701724905, 0.19339321642604648]::DOUBLE[]),
        |  (1, 8, [-0.082655259724086190, -0.20427076891564927, -0.010109389015834398, -0.065206140003184240]::DOUBLE[]),
        |  (1, 9, [0.13384242287177142, -0.11613633550517098, 0.071867321817697450, 0.089493896295244180]::DOUBLE[]),
        |  (1, 10, [0.041745918904119130, -0.16570428529430917, -0.10339364535748657, 0.12641492882619810]::DOUBLE[]),
        |  (1, 11, [-0.071072749053790920, 0.038148406428153140, -0.19364322222642508, 0.067047687626663900]::DOUBLE[]),
        |  (1, 12, [0.12687585577590205, 0.14661304070014680, 0.13235967279480170, 0.055448768187461875]::DOUBLE[]),
        |  (1, 13, [0.20518658030911635, -0.076634682357159400, -0.13233351710807040, 0.019871066690781203]::DOUBLE[]),
        |  (1, 14, [0.14505297418865190, 0.15643993514334878, -0.14775571803392104, -0.0040407449478260760]::DOUBLE[]),
        |  (1, 15, [-0.084875393386553090, -0.00081533838660088500, 0.052421841500518346, -0.071482829202461730]::DOUBLE[]),
        |  (2, 0, [0.024284390244406418, -0.051540845363074130, -0.20271865829724553, 0.078880297707060870]::DOUBLE[]),
        |  (2, 1, [0.0093060982900150500, 0.014804782328551827, 0.13930086537543726, 0.19876194941335298]::DOUBLE[]),
        |  (2, 2, [0.13873162466636540, -0.064793670409947820, -0.019328888948956867, -0.023140019864559585]::DOUBLE[]),
        |  (2, 3, [-0.15054255147040077, -0.036441266245989444, 0.10978950449445248, 0.010821853851473860]::DOUBLE[]),
        |  (2, 4, [-0.097161866820290820, 0.16119451826952005, -0.071585631814750300, 0.15728701492975714]::DOUBLE[]),
        |  (2, 5, [0.010242959849427623, 0.070537392293424050, -0.020828618254035685, -0.29931893880894234]::DOUBLE[]),
        |  (2, 6, [0.075799035390444520, 0.20127434834139720, 0.064961066339022240, -0.012501373038926783]::DOUBLE[]),
        |  (2, 7, [-0.14988500182939285, 0.13230220617543867, 0.047857893147875606, -0.037139592776258620]::DOUBLE[]),
        |  (2, 8, [0.15066919405551177, 0.11005947620799825, -0.10226225564706666, 0.067550214358371730]::DOUBLE[]),
        |  (2, 9, [-0.066055514456246550, 0.058300899093001060, -0.091074690005915860, -0.093458839808208970]::DOUBLE[]),
        |  (2, 10, [-0.0070446642220540695, -0.14963112871587247, 0.13493207799898652, -0.020770842997066250]::DOUBLE[]),
        |  (2, 11, [0.015948235173972213, 0.043302998745583810, 0.15609971277210297, -0.098566693054443460]::DOUBLE[]),
        |  (2, 12, [-0.014065685833279681, -0.053860578021577364, -0.039010797392503130, 0.087429470727785230]::DOUBLE[]),
        |  (2, 13, [-0.059749297763295410, -0.12880251465338188, -0.088925024856633240, -0.12656614795376900]::DOUBLE[]),
        |  (2, 14, [0.10284400248775603, -0.18980679873921627, 0.091838158336284880, -0.17808018670246392]::DOUBLE[]),
        |  (2, 15, [-0.15115393933884720, -0.20403277242178000, -0.041735921970266690, 0.099853742591528450]::DOUBLE[]),
        |  (3, 0, [-0.11136265808334231, 0.0088435105026642960, -0.18004092701999010, 0.14699474123678916]::DOUBLE[]),
        |  (3, 1, [0.062757907111591600, -0.018748297095815422, -0.049911918466170550, 0.22664225109870317]::DOUBLE[]),
        |  (3, 2, [0.038704187558854776, -0.13388549660738850, -0.11237781657091016, 0.068098783654797660]::DOUBLE[]),
        |  (3, 3, [-0.047636015433851445, -0.022946786036450560, 0.042071685216775430, 0.081371850315897320]::DOUBLE[]),
        |  (3, 4, [0.17811439242556876, 0.15239227572834760, 0.017733344368171568, 0.078650890815229940]::DOUBLE[]),
        |  (3, 5, [0.036968128677704640, 0.086654444124000500, -0.17284755641875420, -0.036870811956073175]::DOUBLE[]),
        |  (3, 6, [-0.0010966763224230448, -0.021599879096391366, 0.080683884830900330, -0.20802065703403044]::DOUBLE[]),
        |  (3, 7, [0.015919473882920834, -0.17245070538801843, 0.057993927866434400, -0.078415723537320320]::DOUBLE[]),
        |  (3, 8, [-0.057736774911233746, 0.19233523841915810, 0.039908072004513980, -0.072078356465009010]::DOUBLE[]),
        |  (3, 9, [0.11717342918976476, -0.050096707847709970, 0.13699302780248160, 0.029698623007351963]::DOUBLE[]),
        |  (3, 10, [-0.034035098552878125, 0.12956385149052457, -0.052197313631472814, 0.097968375427719630]::DOUBLE[]),
        |  (3, 11, [-0.16195929587902483, -0.065672223565877970, -0.088906213376687730, -0.10423641592355974]::DOUBLE[]),
        |  (3, 12, [0.022313864330771170, -0.27343136539153370, 0.085058616201422190, 0.050570312463124900]::DOUBLE[]),
        |  (3, 13, [-0.032836717360924660, 0.15448803858692450, 0.17624361057127460, 0.12833372430508772]::DOUBLE[]),
        |  (3, 14, [-0.14953024065425732, -0.030953995092363792, 0.16119828152616040, -0.042840072531550910]::DOUBLE[]),
        |  (3, 15, [0.10678801302494258, 0.0023442598170814494, -0.025286180486377006, -0.10082394103548215]::DOUBLE[]),
        |  (4, 0, [0.0093616090178639800, -0.11520721851055206, 0.13595053999958148, 0.0018688488226003560]::DOUBLE[]),
        |  (4, 1, [0.042837035298847740, 0.11632141701815615, -0.060084977853753450, 0.13851743052548762]::DOUBLE[]),
        |  (4, 2, [-0.028349400787295965, 0.026961711197932895, -0.16062689236010988, 0.030910695755593420]::DOUBLE[]),
        |  (4, 3, [0.044468181927736630, 0.072713825306856090, 0.11936117707679207, -0.085643276004944450]::DOUBLE[]),
        |  (4, 4, [-0.092934338826987720, 0.28137896429644120, -0.053420473087978050, -0.068666940787227060]::DOUBLE[]),
        |  (4, 5, [-0.19563790378466803, -0.13015955374763333, -0.17884165244859687, 0.0067608301729845030]::DOUBLE[]),
        |  (4, 6, [0.22000340216382644, -0.035188671837805130, 0.057726847133692800, 0.11885765330973674]::DOUBLE[]),
        |  (4, 7, [-0.043927946820322050, 0.037590709490441720, 0.047536693535171020, -0.20107507399212202]::DOUBLE[]),
        |  (4, 8, [0.062924862832647210, -0.12156379446971832, -0.12989569564980680, 0.077711979574129470]::DOUBLE[]),
        |  (4, 9, [-0.14022966452329944, 0.13739906787400957, 0.060119190828817120, 0.019591295030863850]::DOUBLE[]),
        |  (4, 10, [0.017612268767359714, 0.025122087326071237, 0.17535952887828218, 0.14064811996261892]::DOUBLE[]),
        |  (4, 11, [-0.12593915304800557, -0.061436937215429685, 0.020667709438804853, 0.082108490227696440]::DOUBLE[]),
        |  (4, 12, [-0.046748567358535940, -0.18759240044806105, -0.043367510691708216, -0.11051679930677626]::DOUBLE[]),
        |  (4, 13, [0.17749275435577280, -0.022614204021586728, -0.025145070781173970, -0.095720516596370610]::DOUBLE[]),
        |  (4, 14, [-0.048834020436063190, 0.074459858154966140, -0.10993217098133386, -0.15442716127920583]::DOUBLE[]),
        |  (4, 15, [0.080768360147450340, 0.17538488286874804, 0.014840098275395106, -0.033360634391070516]::DOUBLE[]),
        |  (5, 0, [-0.099744390972739130, 0.18748053331555680, -0.044221513185595000, 0.085344240568135120]::DOUBLE[]),
        |  (5, 1, [-0.12770726756730008, -0.044617392203491670, -0.091571765511826600, -0.083446870543562650]::DOUBLE[]),
        |  (5, 2, [0.030768134566240078, 0.028939171271910816, 0.0031128353679765680, -0.0051745811771046160]::DOUBLE[]),
        |  (5, 3, [0.073511139594057150, -0.023383295690852770, -0.066000175088841860, 0.24353958045177030]::DOUBLE[]),
        |  (5, 4, [0.046313354735904530, -0.11646802034183218, 0.098768991641765770, 0.076049741555295910]::DOUBLE[]),
        |  (5, 5, [0.19824462285619465, 0.00081306422667835050, 0.10418106412508703, -0.0065952663428641030]::DOUBLE[]),
        |  (5, 6, [0.028779561551811265, -0.13201704584935878, -0.11201788579086157, 0.029189666625717240]::DOUBLE[]),
        |  (5, 7, [0.10164370438550546, -0.034080024611857350, 0.058363510678189770, -0.24996266969435474]::DOUBLE[]),
        |  (5, 8, [0.026377826187557303, 0.11639873928509717, 0.099777838073214220, 0.22607551987024710]::DOUBLE[]),
        |  (5, 9, [-0.054762864339424136, -0.14411233518425484, 0.10277018529080240, -0.10215139691192814]::DOUBLE[]),
        |  (5, 10, [-0.16010711773222736, -0.084201697089387020, -0.022967576415698920, 0.17925033246590574]::DOUBLE[]),
        |  (5, 11, [0.069726686425208960, 0.15161411181860185, 0.11259611472338414, -0.048783190874136630]::DOUBLE[]),
        |  (5, 12, [0.051482253735918660, 0.063384974544980970, -0.20383295072641314, 0.043762997522379090]::DOUBLE[]),
        |  (5, 13, [0.17894468529318633, 0.011552126934017554, -0.10974835048311159, -0.022357880286600407]::DOUBLE[]),
        |  (5, 14, [-0.12827554030336670, 0.043235898542775730, 0.11514925250964280, 0.060499203531293550]::DOUBLE[]),
        |  (5, 15, [-0.079987943267454470, 0.10472907869686504, 0.023470146403075706, -0.18446889976100800]::DOUBLE[]),
        |  (6, 0, [-0.090577594823267550, 0.043386064699175800, 0.21902788903032194, -0.042429757296101205]::DOUBLE[]),
        |  (6, 1, [0.011686368779188806, -0.0088984553487631410, -0.14411877556796365, -0.11790553252314809]::DOUBLE[]),
        |  (6, 2, [0.074019235235724030, 0.072895679502441830, -0.054626232462053496, 0.020725614395582770]::DOUBLE[]),
        |  (6, 3, [0.17001975707886471, -0.099425281414182900, -0.041508825855342920, -0.015767242368086480]::DOUBLE[]),
        |  (6, 4, [0.10828765881934050, 0.13487461442159054, 0.10036553552593670, -0.10435606693713194]::DOUBLE[]),
        |  (6, 5, [-0.078135753013758040, 0.014714375710858185, 0.080164218336626510, 0.22384188760916907]::DOUBLE[]),
        |  (6, 6, [0.15361693801848342, 0.071678746496906980, 0.14258609796980110, 0.069610401309007600]::DOUBLE[]),
        |  (6, 7, [0.0082173338223566880, 0.24848938774941048, 0.011052175673293970, 0.031167338447443987]::DOUBLE[]),
        |  (6, 8, [-0.059733966346151590, -0.17797816187914950, -0.10039382171261386, 0.054540691612570690]::DOUBLE[]),
        |  (6, 9, [0.024531609837859340, -0.16139406464029704, 0.10424894173361873, -9.6403848385253600e-05]::DOUBLE[]),
        |  (6, 10, [-0.059738692753138930, 0.027886782093978320, -0.16556297625532385, 0.083406634237906240]::DOUBLE[]),
        |  (6, 11, [-0.19454701497103652, 0.13763155078293550, -0.11246036356223271, 0.013094994616579788]::DOUBLE[]),
        |  (6, 12, [0.16332670910585678, 0.16242585315745553, -0.081624762410505100, -0.16415199505198133]::DOUBLE[]),
        |  (6, 13, [-0.099378011696177550, -0.013984872763243722, 0.041642701147306796, 0.041320611320664410]::DOUBLE[]),
        |  (6, 14, [0.11654263315811150, 0.023883639145311110, -0.075355758210943310, 0.18467199666942263]::DOUBLE[]),
        |  (6, 15, [-0.12015747418053924, -0.041481173222787285, -0.013320435171923056, -0.17303907464843900]::DOUBLE[]),
        |  (7, 0, [-0.098362578856394850, -0.079407807967538050, 0.12131417112098478, 0.092231945293779720]::DOUBLE[]),
        |  (7, 1, [0.018873479643433236, -0.20339321640561353, 0.0043320162882370890, 0.14629365625221544]::DOUBLE[]),
        |  (7, 2, [0.075164333110365120, -0.0072709632520199440, 0.0098080440735796950, -0.22682927454491470]::DOUBLE[]),
        |  (7, 3, [0.14242364901777850, 0.079144495381127080, -0.050540552093176280, -0.042805456187065556]::DOUBLE[]),
        |  (7, 4, [-0.051618402098019565, -0.037850722108728520, -0.11140097697460732, 0.19762202789450400]::DOUBLE[]),
        |  (7, 5, [0.020492441645449652, 0.078576737545918530, 0.21139466373777366, -0.0016224577824282260]::DOUBLE[]),
        |  (7, 6, [2.6432362889437616e-05, 0.22749739610390010, -0.040600687833742835, 0.10827882947137876]::DOUBLE[]),
        |  (7, 7, [-0.018521901391430820, -0.17930664279329644, 0.10836500943615404, -0.12289732557442423]::DOUBLE[]),
        |  (7, 8, [0.13626574687454054, -0.069202885782523220, 0.088186503144776800, 0.00033973985223540473]::DOUBLE[]),
        |  (7, 9, [-0.043339138966272770, 0.19012845969961070, 0.028245457624328300, -0.10854399280608007]::DOUBLE[]),
        |  (7, 10, [-0.16746950461359444, -0.029606375584137540, -0.12300955701909826, -0.065621942534803720]::DOUBLE[]),
        |  (7, 11, [-0.010473546342504816, 0.10252605167283615, -0.17946951754552246, 0.010174989450228660]::DOUBLE[]),
        |  (7, 12, [-0.033723000552488710, 0.011308096149477462, -0.0047368796241346860, 0.044315396064941226]::DOUBLE[]),
        |  (7, 13, [0.12000976430709882, 0.079525880315023180, 0.061503490224827740, 0.15614606893358232]::DOUBLE[]),
        |  (7, 14, [-0.18103607482363385, 0.014666772242447330, 0.11260657493035627, -0.094872171135723190]::DOUBLE[]),
        |  (7, 15, [0.082976147309514870, -0.15344769647354833, -0.12836530792259493, -0.036793017676053280]::DOUBLE[]),
        |  (8, 0, [0.012494348602294070, -0.056428358585105220, -0.013952261017852010, 0.24895329998103027]::DOUBLE[]),
        |  (8, 1, [0.15980338130314184, 0.061867531011239380, -0.065529166052407080, 0.10276169646644039]::DOUBLE[]),
        |  (8, 2, [0.012367008168901765, -0.18378436647942273, -0.068902670497858340, 0.043575910056112284]::DOUBLE[]),
        |  (8, 3, [0.16613800535135437, -0.097774928734899850, 0.038367381848455850, -0.12454551267628379]::DOUBLE[]),
        |  (8, 4, [-0.17123974863074218, 0.078194058040846160, 0.0053744065244062070, -0.067086629413817890]::DOUBLE[]),
        |  (8, 5, [-0.036884247583861860, 0.076964857548382340, -0.15395917950148000, 0.069784572540186690]::DOUBLE[]),
        |  (8, 6, [0.077305800436976140, 0.23719888406747372, 0.069345018284117490, 0.00074379620420690230]::DOUBLE[]),
        |  (8, 7, [-0.0079499107163532540, 0.011632519427768521, 0.20631656107336070, -0.14391455620649835]::DOUBLE[]),
        |  (8, 8, [0.039253996387160386, -0.11434577226400700, -0.17721453599088927, -0.070381640018850940]::DOUBLE[]),
        |  (8, 9, [0.054388068464380520, 0.086695658918709800, -0.033256124775882720, -0.086459094379202560]::DOUBLE[]),
        |  (8, 10, [0.018512870904664636, -0.099305313170217650, 0.042583122858241104, -0.0070435094930043490]::DOUBLE[]),
        |  (8, 11, [-0.24746536113587586, -0.11495277702307527, 0.013620041264711029, 0.057548733493997210]::DOUBLE[]),
        |  (8, 12, [-0.091341916407488730, -0.069318419520226700, -0.011025028455270959, -0.19353273428969750]::DOUBLE[]),
        |  (8, 13, [0.17298762596501880, 0.039476239965151790, 0.095222650104938450, 0.014639425978295149]::DOUBLE[]),
        |  (8, 14, [0.0072811172823506700, -0.0064162427781880250, 0.20895285584473586, 0.096308004101941070]::DOUBLE[]),
        |  (8, 15, [-0.066559305938359330, 0.024051811932884240, 0.018139225873376570, 0.11484069745189053]::DOUBLE[]),
        |  (9, 0, [-0.24042617056209695, 0.088583711346765750, -0.028258149975847704, 0.0080069881532742450]::DOUBLE[]),
        |  (9, 1, [0.090757967793752860, -0.12652582240628707, -0.23345035120376964, 0.060354187752071194]::DOUBLE[]),
        |  (9, 2, [-0.20107281488917642, -0.056360740907832970, 0.17813119226793675, -0.022861426973931220]::DOUBLE[]),
        |  (9, 3, [-0.10976630484532236, -0.17874562461655652, 0.038799916617701560, 0.090473811458049610]::DOUBLE[]),
        |  (9, 4, [-0.082703780150365450, 0.19295351342877580, 0.024981691625951482, 0.13250303329417004]::DOUBLE[]),
        |  (9, 5, [0.014168045326956320, -0.062392873866228780, 0.097841733922744800, -0.16061515300456990]::DOUBLE[]),
        |  (9, 6, [-0.0086112138816294200, 0.018847171913634160, 0.15926649282975880, 0.029372061670523954]::DOUBLE[]),
        |  (9, 7, [-0.021255980600058900, -0.087124334551099940, -0.10321874431210162, -0.10736941858493708]::DOUBLE[]),
        |  (9, 8, [-0.049582504676675375, -0.017240411636814760, -0.10446192132737163, 0.17564526161395270]::DOUBLE[]),
        |  (9, 9, [-0.068626842025512090, 0.11937370683792707, 0.028529732806540545, -0.17491484990950137]::DOUBLE[]),
        |  (9, 10, [0.10123999255438985, 0.15213197762314748, -0.16732513583517666, -0.019946833730088880]::DOUBLE[]),
        |  (9, 11, [0.17370027026540608, 0.062369188511733155, 0.055496718821636940, -0.014052654521248362]::DOUBLE[]),
        |  (9, 12, [0.046083728792263405, 0.063814370418664460, 0.13683782023696436, 0.23105107319874318]::DOUBLE[]),
        |  (9, 13, [0.10631192381267514, -0.17084042152079523, 0.0043015319677085010, -0.010381698169772106]::DOUBLE[]),
        |  (9, 14, [-0.072490529693462330, 0.11151108360476190, -0.10310160877104517, -0.022235886282386400]::DOUBLE[]),
        |  (9, 15, [0.070535709030221920, -0.011779049453403766, -0.016334416092424135, 0.090294463764466050]::DOUBLE[]),
        |  (10, 0, [-0.043431463537625545, -0.18251618472504808, 0.031975649639154890, -0.051769035775248890]::DOUBLE[]),
        |  (10, 1, [-0.053438394739075204, -0.021742073239935330, -0.12578688204679087, -0.0016940509528820856]::DOUBLE[]),
        |  (10, 2, [0.23906669575720418, 0.061350990870829084, -0.083405923574059720, -0.11783700095499478]::DOUBLE[]),
        |  (10, 3, [0.12136989881766216, 0.080514391124287970, -0.058426562950227930, 0.10194109011126569]::DOUBLE[]),
        |  (10, 4, [-0.052858734808640600, 0.16084730135391853, -0.048148254761688940, -0.13138488811808050]::DOUBLE[]),
        |  (10, 5, [-0.069643493188273860, 0.039372534608815670, 0.21778051172283150, 0.0025512590737660840]::DOUBLE[]),
        |  (10, 6, [0.16196269462659530, -0.12107917082241387, 0.036260651130720925, -0.095740573624342630]::DOUBLE[]),
        |  (10, 7, [0.013966799959997367, -0.022414686177569780, -0.069461657749110990, -0.21955579248093290]::DOUBLE[]),
        |  (10, 8, [-0.19042974504538987, 0.0031258953890241355, -0.021876065220571096, -0.0048088511321231980]::DOUBLE[]),
        |  (10, 9, [-0.10981449124343583, -0.12779307486099814, 0.15757092015418683, 0.094307743950153480]::DOUBLE[]),
        |  (10, 10, [-0.077429844251552330, -0.12698712081294217, -0.068815812233666670, 0.16482774384251567]::DOUBLE[]),
        |  (10, 11, [0.083100507015867580, 0.033887501965906760, 0.16610585524925980, -0.077679733448847110]::DOUBLE[]),
        |  (10, 12, [-0.039162302233517830, 0.13541332892235370, -0.16996015349420193, 0.056665460211564090]::DOUBLE[]),
        |  (10, 13, [0.087589910179580600, -0.042710162326762220, 0.068953365205177340, 0.13902398703875254]::DOUBLE[]),
        |  (10, 14, [-0.014756400101862846, 0.17885310493450463, 0.043840589725100600, 0.034573202301061830]::DOUBLE[]),
        |  (10, 15, [0.10205838846548068, -0.16711947770193855, -0.14637055462109874, 0.040626961775782870]::DOUBLE[]),
        |  (11, 0, [-0.036484241358074410, 0.061312762117646170, -0.13623318632582782, 0.010677041987001179]::DOUBLE[]),
        |  (11, 1, [0.010606065135559410, -0.15708530718311560, -0.015728494345545670, -0.064323612002487530]::DOUBLE[]),
        |  (11, 2, [-0.11866404771488870, 0.087609035512011320, 0.16150544585461007, -0.18000614949030955]::DOUBLE[]),
        |  (11, 3, [0.15708427285289422, -0.095750508114927300, 0.044567281110781640, -0.099274653119783830]::DOUBLE[]),
        |  (11, 4, [0.097188889028104500, 0.15887374739713594, 0.053706895916829846, -0.052607490734396520]::DOUBLE[]),
        |  (11, 5, [0.13410268713756404, 0.084296929495521940, -0.11167317103095804, 0.076871293675939170]::DOUBLE[]),
        |  (11, 6, [-0.13112488784344203, -0.11306972096518360, 0.038183961314916190, -0.092811486233467370]::DOUBLE[]),
        |  (11, 7, [-0.13520118986779114, 0.014008852410119530, 0.10604857175142005, 0.076727282672715540]::DOUBLE[]),
        |  (11, 8, [0.076275588829146160, -0.034639301322299636, 0.19118073626694113, -0.032413813908432410]::DOUBLE[]),
        |  (11, 9, [-0.20574640261550672, -0.034218788173002860, -0.15368666516719695, -0.060362895962848450]::DOUBLE[]),
        |  (11, 10, [0.045654433549277670, -0.039126208816051215, 0.058758078957484580, 0.21486964483896970]::DOUBLE[]),
        |  (11, 11, [0.070113175400815050, -0.14252882418485327, -0.15705125835765340, 0.25830183770912500]::DOUBLE[]),
        |  (11, 12, [-0.17491533268189682, 0.14431927661109414, -0.041787455702481054, 0.011199994968244018]::DOUBLE[]),
        |  (11, 13, [-0.036849272174505590, 0.10138387029877087, -0.073419734773418440, -0.21034553588926794]::DOUBLE[]),
        |  (11, 14, [-0.040436458095501590, -0.090365469807026280, -0.13196539952678993, 0.099455068362506590]::DOUBLE[]),
        |  (11, 15, [0.040181790107052000, 0.042153837401675900, 0.043838897708548220, 0.075032054945387570]::DOUBLE[]),
        |  (12, 0, [-0.13301545846788270, -0.19101599767346280, 0.13860722536538870, 0.0064080055959152400]::DOUBLE[]),
        |  (12, 1, [-0.14798589715485050, -0.028205290138896517, -0.082794836534879550, -0.097826106990596810]::DOUBLE[]),
        |  (12, 2, [-0.18472448672108277, 0.038687263608523000, 0.060194978972363320, 0.060480784265495590]::DOUBLE[]),
        |  (12, 3, [-0.068278973835264380, -0.20253001425447253, -0.12196054437598608, 0.0086347464365563470]::DOUBLE[]),
        |  (12, 4, [0.17992931991220740, 0.045995446533317066, -0.14273820148869454, 0.029880029349615780]::DOUBLE[]),
        |  (12, 5, [0.0047795989830098480, 0.077067668260138240, 0.023175559798822280, 0.14877547960078194]::DOUBLE[]),
        |  (12, 6, [-0.014078009804150984, -0.078758149216573480, 0.037520992467711390, 0.019933011140354570]::DOUBLE[]),
        |  (12, 7, [-0.056730915360434404, 0.076668975023625460, 0.13022269193990824, -0.16631149129067177]::DOUBLE[]),
        |  (12, 8, [-0.081492833508604620, -0.053851013796222036, -0.10966435795820285, 0.19322962693235146]::DOUBLE[]),
        |  (12, 9, [0.071901437686891280, -0.17165679825511430, 0.046753254014368265, -0.13336822299152240]::DOUBLE[]),
        |  (12, 10, [0.054225061642809270, 0.035889345462483150, -0.067836146962860030, -0.21824028997726622]::DOUBLE[]),
        |  (12, 11, [-0.025505964976329544, 0.055378266528448790, -0.12656817760464306, -0.016214965500483236]::DOUBLE[]),
        |  (12, 12, [0.024452645301719240, 0.19016778616756025, 0.097944018699425180, -0.0077151692957999835]::DOUBLE[]),
        |  (12, 13, [0.17038703621599094, -0.20299405201562026, -0.0020850201078329313, 0.094568346881214560]::DOUBLE[]),
        |  (12, 14, [0.036295983269848430, -0.048471133226719240, 0.19566061837697923, 0.041440215906153634]::DOUBLE[]),
        |  (12, 15, [0.15484462658639153, 0.031319796804338135, 0.052927088454916780, -0.057875761957973810]::DOUBLE[]),
        |  (13, 0, [-0.0088308552000840490, -0.098955842082641630, -0.077583450182384660, -0.13469396789827745]::DOUBLE[]),
        |  (13, 1, [0.27394119941724410, -0.26237936495131650, -0.12211797337228121, 0.11972938240549445]::DOUBLE[]),
        |  (13, 2, [-0.23113078915503120, 0.082090688682518080, 0.010901174674342335, -0.018276833774819708]::DOUBLE[]),
        |  (13, 3, [-0.12959326592031942, -0.062982830545748420, 0.17576384755666140, -0.039124636083064310]::DOUBLE[]),
        |  (13, 4, [0.15737874829491966, 0.016723045292320850, -0.061587107873549160, -0.059368835587455170]::DOUBLE[]),
        |  (13, 5, [-0.070175725591430880, 0.098815970357272500, -0.17200423403904003, -0.10777963285472232]::DOUBLE[]),
        |  (13, 6, [0.022264000552326650, 0.13009844130365655, 0.092443435222684220, -0.026507902999736103]::DOUBLE[]),
        |  (13, 7, [-0.070111833554022480, -0.19665427555387593, -0.10544849458078775, -0.0087993548955093980]::DOUBLE[]),
        |  (13, 8, [0.17485809620452590, -0.050879513435419050, -0.16074267467847556, 0.084887811598610680]::DOUBLE[]),
        |  (13, 9, [0.077553504276429960, -0.11865536748815485, 0.067994061178624440, -0.051533459250946750]::DOUBLE[]),
        |  (13, 10, [0.067731824437626900, -0.054928569796286300, 0.059634363162134510, 0.17452534692311966]::DOUBLE[]),
        |  (13, 11, [0.071572588144107230, 0.11851968168366893, -0.069087089695192280, 0.10485340141895082]::DOUBLE[]),
        |  (13, 12, [0.18339372566178597, -0.018675648607661890, 0.12976826770784033, 0.026052801849638207]::DOUBLE[]),
        |  (13, 13, [-0.035831397527153120, 0.049571478686404075, 0.00033666270551011870, -0.21646045594237820]::DOUBLE[]),
        |  (13, 14, [-0.10912405737924400, 0.020994388444665897, 0.058061777094466790, 0.11961104567573767]::DOUBLE[]),
        |  (13, 15, [-0.040948690028250570, -0.028098536331474170, -0.13402989004578897, 0.11014083894200400]::DOUBLE[]),
        |  (14, 0, [-0.11531394048449800, 0.043249552257515124, 0.077820101260322630, -0.083695372889408880]::DOUBLE[]),
        |  (14, 1, [-0.013964035643937840, 0.018720251968577430, -0.070528972359674800, 0.16058730576302058]::DOUBLE[]),
        |  (14, 2, [0.12374426172496956, 0.040214909148484114, -0.20463889909433366, -0.076559685737060360]::DOUBLE[]),
        |  (14, 3, [-0.10375132541504446, -0.081504857685559680, -0.12739504455701420, -0.088936986701123860]::DOUBLE[]),
        |  (14, 4, [-0.13457959474955983, 0.044694904536370365, 0.015020152839753127, 0.098886884815817440]::DOUBLE[]),
        |  (14, 5, [0.15658815932985312, -0.019899399324289360, -0.0066247503984569490, 0.040928270386981276]::DOUBLE[]),
        |  (14, 6, [0.023358308703220053, 0.14762849042198550, 0.24215096127732832, -0.16448860316527464]::DOUBLE[]),
        |  (14, 7, [-0.076654944696293930, 0.20024657208188860, -0.13523441054914356, -0.022580164388836543]::DOUBLE[]),
        |  (14, 8, [0.097222114686648500, 0.14741273248300416, 0.064578997810429570, -0.010234116164297242]::DOUBLE[]),
        |  (14, 9, [0.11914161813887462, -0.13582703135970490, 0.017715005655482202, -0.077274695562047120]::DOUBLE[]),
        |  (14, 10, [-0.010653723770142504, -0.018385087636858657, 0.20620946107904733, 0.092668195012612340]::DOUBLE[]),
        |  (14, 11, [-0.048521128778383160, -0.15759846682716400, 0.033914533895433786, -0.020005536256491624]::DOUBLE[]),
        |  (14, 12, [0.013331534712222745, -0.12140607231078682, 0.12210790194570560, -0.15229203111479228]::DOUBLE[]),
        |  (14, 13, [0.024768687617816480, 0.030337386403016240, -0.045346180533527200, -0.20713051078502800]::DOUBLE[]),
        |  (14, 14, [0.12507681082431715, -0.10722876229835855, 0.038893079536012140, 0.16437904827838176]::DOUBLE[]),
        |  (14, 15, [-0.0059577796262183045, -0.095043025352176850, -0.20635107319205231, 0.055056844767208644]::DOUBLE[]),
        |  (15, 0, [0.044541309818839180, -0.047777760938160960, 0.067740235652361850, -0.23662816710512120]::DOUBLE[]),
        |  (15, 1, [0.034562858070391720, -0.023418216430107254, 0.22479056214494697, -0.024533587973640213]::DOUBLE[]),
        |  (15, 2, [0.086566946891005180, 0.049429787780741995, 0.047223200498655960, 0.12695705973811594]::DOUBLE[]),
        |  (15, 3, [0.11254615746964343, 0.0054072676852465850, -0.15083757064614142, -0.046405624519808200]::DOUBLE[]),
        |  (15, 4, [0.033703727461765350, 0.18773194960031217, -0.015742911402701645, -0.057028476945551520]::DOUBLE[]),
        |  (15, 5, [-0.094658665611314180, 0.080343945202390870, -0.13282095613671974, 0.065489457086376160]::DOUBLE[]),
        |  (15, 6, [-0.035737563893410410, -0.17932063001436438, 0.10420586646376497, 0.019862181645681053]::DOUBLE[]),
        |  (15, 7, [0.19202328600666770, 0.00037901314761113610, 0.020114875206362254, -0.042599240904449140]::DOUBLE[]),
        |  (15, 8, [-0.00031758324349454460, 0.082662175434226660, -0.13807603919554073, -0.16943806572962347]::DOUBLE[]),
        |  (15, 9, [-0.17568636070581112, -0.069866993428408140, -0.022683645911974720, -0.074753938170063230]::DOUBLE[]),
        |  (15, 10, [0.069981430681766530, -0.10508259285273666, -0.083953196174169080, 0.14511782773091270]::DOUBLE[]),
        |  (15, 11, [0.054616067898839264, -0.19404301693347240, -0.059236291374967600, -0.10645015819988077]::DOUBLE[]),
        |  (15, 12, [-0.054612783512553420, -2.0676759019758476e-05, 0.042431607106240140, -0.019343641744002560]::DOUBLE[]),
        |  (15, 13, [0.050382408347137815, 0.19392563232958446, 0.13968235820327238, 0.052097330250745776]::DOUBLE[]),
        |  (15, 14, [-0.10902858187370935, 0.024360910065041040, 0.061014556068524850, 0.17740660095432340]::DOUBLE[]),
        |  (15, 15, [-0.18407303605425765, 0.14435401549709980, -0.032545658209738390, -0.091806386184413420]::DOUBLE[])),
        |d AS (SELECT u.vec_id, cb.s, cb.cell,
        |    list_sum(list_transform(generate_series(1, 4),
        |      j -> (uv[cb.s * 4 + j] - ctr[j]) * (uv[cb.s * 4 + j] - ctr[j]))) AS d2
        |  FROM u CROSS JOIN cb),
        |enc AS (SELECT vec_id, s, cell AS code FROM (
        |    SELECT vec_id, s, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, cell) AS rnk
        |    FROM d) WHERE rnk = 1),
        |pair AS (SELECT dq.vec_id AS query_id, ec.vec_id AS neighbor_id,
        |    SUM(dq.d2) AS adist
        |  FROM enc ec JOIN d dq ON dq.s = ec.s AND dq.cell = ec.code
        |  WHERE dq.vec_id < 8 AND ec.vec_id <> dq.vec_id
        |  GROUP BY 1, 2),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        |  FROM pair)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // The ADC replay above + exact-cosine re-rank of each query's
    // top-64 shortlist (refine rank margin probed at 5.4e-6).
    "q_similarity_pq_refine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS uv
        |  FROM e),
        |cb(s, cell, ctr) AS (VALUES
        |  (0, 0, [-0.13610586106763312, 0.039118060600433290, -0.022962199820180034, 0.17174565250703275]::DOUBLE[]),
        |  (0, 1, [-0.019466110915790705, 0.028206636520855432, -0.048462577229604770, 0.010645203710871298]::DOUBLE[]),
        |  (0, 2, [0.027222375058049763, 0.13815839032310356, -0.10988835380941009, -0.12433033175038456]::DOUBLE[]),
        |  (0, 3, [0.21768871512900350, -0.036947077397927320, 0.10981679714007980, -0.047450429536651280]::DOUBLE[]),
        |  (0, 4, [0.10700452438421953, -0.12280707935894074, -0.094580119004003540, -0.047208264414167170]::DOUBLE[]),
        |  (0, 5, [-0.19226679252528940, 0.043292933560848240, 0.061147992511911230, -0.0016844055758454420]::DOUBLE[]),
        |  (0, 6, [0.020866403283964732, 0.014594889881664743, 0.13641056469873200, 0.089202433338707450]::DOUBLE[]),
        |  (0, 7, [0.11736627318944645, 0.018826927304429843, 0.022461362436438070, -0.14347243217916947]::DOUBLE[]),
        |  (0, 8, [-0.018945463660768585, 0.18776079767029835, 0.11496019565079368, -0.046879022838273415]::DOUBLE[]),
        |  (0, 9, [-0.043979433753324255, -0.20223327753816092, 0.045629699090889854, 0.042478386235347090]::DOUBLE[]),
        |  (0, 10, [-0.046638257598192570, -0.039893516842072470, 0.23696091282178056, -0.058474396089753494]::DOUBLE[]),
        |  (0, 11, [0.10518875392743285, -0.055722156304101180, -0.0097033910980379860, 0.13229491745153310]::DOUBLE[]),
        |  (0, 12, [0.027597356212321870, -0.0066780771468689860, -0.19254125829932675, 0.10925991853707784]::DOUBLE[]),
        |  (0, 13, [-0.15222656557436862, -0.059831908341600910, -0.16103720282839457, -0.078482457827697350]::DOUBLE[]),
        |  (0, 14, [0.13739652563581528, 0.15019066426794890, -0.061121480460260870, 0.10121707294136302]::DOUBLE[]),
        |  (0, 15, [-0.078758548899238300, -0.060874805417737876, 0.034234734928308770, -0.14911375442285557]::DOUBLE[]),
        |  (1, 0, [-0.11196469286419344, 0.17587524357433648, -0.020115250739304674, -0.014440258251488550]::DOUBLE[]),
        |  (1, 1, [-0.24875634246523900, -0.047856566556752090, -0.043069356825672410, 0.024119215250173890]::DOUBLE[]),
        |  (1, 2, [0.030047104315032536, -0.0016916511809903605, -0.052602143182208620, 0.0072902733526942235]::DOUBLE[]),
        |  (1, 3, [0.090839920752016950, 0.045410812763950335, 0.080462787942599440, -0.14657632148148975]::DOUBLE[]),
        |  (1, 4, [-0.077018806856632500, -0.017118845730793830, 0.081796328163236550, 0.14279085154481586]::DOUBLE[]),
        |  (1, 5, [-0.016299550111460490, -0.11105602804342468, 0.25791983480859860, 0.020915326564511505]::DOUBLE[]),
        |  (1, 6, [0.0042325487744036220, 0.021331027180024154, -0.15912017371862913, -0.18686867598651870]::DOUBLE[]),
        |  (1, 7, [0.034315493023515080, 0.12089693535486767, -0.044736488701724905, 0.19339321642604648]::DOUBLE[]),
        |  (1, 8, [-0.082655259724086190, -0.20427076891564927, -0.010109389015834398, -0.065206140003184240]::DOUBLE[]),
        |  (1, 9, [0.13384242287177142, -0.11613633550517098, 0.071867321817697450, 0.089493896295244180]::DOUBLE[]),
        |  (1, 10, [0.041745918904119130, -0.16570428529430917, -0.10339364535748657, 0.12641492882619810]::DOUBLE[]),
        |  (1, 11, [-0.071072749053790920, 0.038148406428153140, -0.19364322222642508, 0.067047687626663900]::DOUBLE[]),
        |  (1, 12, [0.12687585577590205, 0.14661304070014680, 0.13235967279480170, 0.055448768187461875]::DOUBLE[]),
        |  (1, 13, [0.20518658030911635, -0.076634682357159400, -0.13233351710807040, 0.019871066690781203]::DOUBLE[]),
        |  (1, 14, [0.14505297418865190, 0.15643993514334878, -0.14775571803392104, -0.0040407449478260760]::DOUBLE[]),
        |  (1, 15, [-0.084875393386553090, -0.00081533838660088500, 0.052421841500518346, -0.071482829202461730]::DOUBLE[]),
        |  (2, 0, [0.024284390244406418, -0.051540845363074130, -0.20271865829724553, 0.078880297707060870]::DOUBLE[]),
        |  (2, 1, [0.0093060982900150500, 0.014804782328551827, 0.13930086537543726, 0.19876194941335298]::DOUBLE[]),
        |  (2, 2, [0.13873162466636540, -0.064793670409947820, -0.019328888948956867, -0.023140019864559585]::DOUBLE[]),
        |  (2, 3, [-0.15054255147040077, -0.036441266245989444, 0.10978950449445248, 0.010821853851473860]::DOUBLE[]),
        |  (2, 4, [-0.097161866820290820, 0.16119451826952005, -0.071585631814750300, 0.15728701492975714]::DOUBLE[]),
        |  (2, 5, [0.010242959849427623, 0.070537392293424050, -0.020828618254035685, -0.29931893880894234]::DOUBLE[]),
        |  (2, 6, [0.075799035390444520, 0.20127434834139720, 0.064961066339022240, -0.012501373038926783]::DOUBLE[]),
        |  (2, 7, [-0.14988500182939285, 0.13230220617543867, 0.047857893147875606, -0.037139592776258620]::DOUBLE[]),
        |  (2, 8, [0.15066919405551177, 0.11005947620799825, -0.10226225564706666, 0.067550214358371730]::DOUBLE[]),
        |  (2, 9, [-0.066055514456246550, 0.058300899093001060, -0.091074690005915860, -0.093458839808208970]::DOUBLE[]),
        |  (2, 10, [-0.0070446642220540695, -0.14963112871587247, 0.13493207799898652, -0.020770842997066250]::DOUBLE[]),
        |  (2, 11, [0.015948235173972213, 0.043302998745583810, 0.15609971277210297, -0.098566693054443460]::DOUBLE[]),
        |  (2, 12, [-0.014065685833279681, -0.053860578021577364, -0.039010797392503130, 0.087429470727785230]::DOUBLE[]),
        |  (2, 13, [-0.059749297763295410, -0.12880251465338188, -0.088925024856633240, -0.12656614795376900]::DOUBLE[]),
        |  (2, 14, [0.10284400248775603, -0.18980679873921627, 0.091838158336284880, -0.17808018670246392]::DOUBLE[]),
        |  (2, 15, [-0.15115393933884720, -0.20403277242178000, -0.041735921970266690, 0.099853742591528450]::DOUBLE[]),
        |  (3, 0, [-0.11136265808334231, 0.0088435105026642960, -0.18004092701999010, 0.14699474123678916]::DOUBLE[]),
        |  (3, 1, [0.062757907111591600, -0.018748297095815422, -0.049911918466170550, 0.22664225109870317]::DOUBLE[]),
        |  (3, 2, [0.038704187558854776, -0.13388549660738850, -0.11237781657091016, 0.068098783654797660]::DOUBLE[]),
        |  (3, 3, [-0.047636015433851445, -0.022946786036450560, 0.042071685216775430, 0.081371850315897320]::DOUBLE[]),
        |  (3, 4, [0.17811439242556876, 0.15239227572834760, 0.017733344368171568, 0.078650890815229940]::DOUBLE[]),
        |  (3, 5, [0.036968128677704640, 0.086654444124000500, -0.17284755641875420, -0.036870811956073175]::DOUBLE[]),
        |  (3, 6, [-0.0010966763224230448, -0.021599879096391366, 0.080683884830900330, -0.20802065703403044]::DOUBLE[]),
        |  (3, 7, [0.015919473882920834, -0.17245070538801843, 0.057993927866434400, -0.078415723537320320]::DOUBLE[]),
        |  (3, 8, [-0.057736774911233746, 0.19233523841915810, 0.039908072004513980, -0.072078356465009010]::DOUBLE[]),
        |  (3, 9, [0.11717342918976476, -0.050096707847709970, 0.13699302780248160, 0.029698623007351963]::DOUBLE[]),
        |  (3, 10, [-0.034035098552878125, 0.12956385149052457, -0.052197313631472814, 0.097968375427719630]::DOUBLE[]),
        |  (3, 11, [-0.16195929587902483, -0.065672223565877970, -0.088906213376687730, -0.10423641592355974]::DOUBLE[]),
        |  (3, 12, [0.022313864330771170, -0.27343136539153370, 0.085058616201422190, 0.050570312463124900]::DOUBLE[]),
        |  (3, 13, [-0.032836717360924660, 0.15448803858692450, 0.17624361057127460, 0.12833372430508772]::DOUBLE[]),
        |  (3, 14, [-0.14953024065425732, -0.030953995092363792, 0.16119828152616040, -0.042840072531550910]::DOUBLE[]),
        |  (3, 15, [0.10678801302494258, 0.0023442598170814494, -0.025286180486377006, -0.10082394103548215]::DOUBLE[]),
        |  (4, 0, [0.0093616090178639800, -0.11520721851055206, 0.13595053999958148, 0.0018688488226003560]::DOUBLE[]),
        |  (4, 1, [0.042837035298847740, 0.11632141701815615, -0.060084977853753450, 0.13851743052548762]::DOUBLE[]),
        |  (4, 2, [-0.028349400787295965, 0.026961711197932895, -0.16062689236010988, 0.030910695755593420]::DOUBLE[]),
        |  (4, 3, [0.044468181927736630, 0.072713825306856090, 0.11936117707679207, -0.085643276004944450]::DOUBLE[]),
        |  (4, 4, [-0.092934338826987720, 0.28137896429644120, -0.053420473087978050, -0.068666940787227060]::DOUBLE[]),
        |  (4, 5, [-0.19563790378466803, -0.13015955374763333, -0.17884165244859687, 0.0067608301729845030]::DOUBLE[]),
        |  (4, 6, [0.22000340216382644, -0.035188671837805130, 0.057726847133692800, 0.11885765330973674]::DOUBLE[]),
        |  (4, 7, [-0.043927946820322050, 0.037590709490441720, 0.047536693535171020, -0.20107507399212202]::DOUBLE[]),
        |  (4, 8, [0.062924862832647210, -0.12156379446971832, -0.12989569564980680, 0.077711979574129470]::DOUBLE[]),
        |  (4, 9, [-0.14022966452329944, 0.13739906787400957, 0.060119190828817120, 0.019591295030863850]::DOUBLE[]),
        |  (4, 10, [0.017612268767359714, 0.025122087326071237, 0.17535952887828218, 0.14064811996261892]::DOUBLE[]),
        |  (4, 11, [-0.12593915304800557, -0.061436937215429685, 0.020667709438804853, 0.082108490227696440]::DOUBLE[]),
        |  (4, 12, [-0.046748567358535940, -0.18759240044806105, -0.043367510691708216, -0.11051679930677626]::DOUBLE[]),
        |  (4, 13, [0.17749275435577280, -0.022614204021586728, -0.025145070781173970, -0.095720516596370610]::DOUBLE[]),
        |  (4, 14, [-0.048834020436063190, 0.074459858154966140, -0.10993217098133386, -0.15442716127920583]::DOUBLE[]),
        |  (4, 15, [0.080768360147450340, 0.17538488286874804, 0.014840098275395106, -0.033360634391070516]::DOUBLE[]),
        |  (5, 0, [-0.099744390972739130, 0.18748053331555680, -0.044221513185595000, 0.085344240568135120]::DOUBLE[]),
        |  (5, 1, [-0.12770726756730008, -0.044617392203491670, -0.091571765511826600, -0.083446870543562650]::DOUBLE[]),
        |  (5, 2, [0.030768134566240078, 0.028939171271910816, 0.0031128353679765680, -0.0051745811771046160]::DOUBLE[]),
        |  (5, 3, [0.073511139594057150, -0.023383295690852770, -0.066000175088841860, 0.24353958045177030]::DOUBLE[]),
        |  (5, 4, [0.046313354735904530, -0.11646802034183218, 0.098768991641765770, 0.076049741555295910]::DOUBLE[]),
        |  (5, 5, [0.19824462285619465, 0.00081306422667835050, 0.10418106412508703, -0.0065952663428641030]::DOUBLE[]),
        |  (5, 6, [0.028779561551811265, -0.13201704584935878, -0.11201788579086157, 0.029189666625717240]::DOUBLE[]),
        |  (5, 7, [0.10164370438550546, -0.034080024611857350, 0.058363510678189770, -0.24996266969435474]::DOUBLE[]),
        |  (5, 8, [0.026377826187557303, 0.11639873928509717, 0.099777838073214220, 0.22607551987024710]::DOUBLE[]),
        |  (5, 9, [-0.054762864339424136, -0.14411233518425484, 0.10277018529080240, -0.10215139691192814]::DOUBLE[]),
        |  (5, 10, [-0.16010711773222736, -0.084201697089387020, -0.022967576415698920, 0.17925033246590574]::DOUBLE[]),
        |  (5, 11, [0.069726686425208960, 0.15161411181860185, 0.11259611472338414, -0.048783190874136630]::DOUBLE[]),
        |  (5, 12, [0.051482253735918660, 0.063384974544980970, -0.20383295072641314, 0.043762997522379090]::DOUBLE[]),
        |  (5, 13, [0.17894468529318633, 0.011552126934017554, -0.10974835048311159, -0.022357880286600407]::DOUBLE[]),
        |  (5, 14, [-0.12827554030336670, 0.043235898542775730, 0.11514925250964280, 0.060499203531293550]::DOUBLE[]),
        |  (5, 15, [-0.079987943267454470, 0.10472907869686504, 0.023470146403075706, -0.18446889976100800]::DOUBLE[]),
        |  (6, 0, [-0.090577594823267550, 0.043386064699175800, 0.21902788903032194, -0.042429757296101205]::DOUBLE[]),
        |  (6, 1, [0.011686368779188806, -0.0088984553487631410, -0.14411877556796365, -0.11790553252314809]::DOUBLE[]),
        |  (6, 2, [0.074019235235724030, 0.072895679502441830, -0.054626232462053496, 0.020725614395582770]::DOUBLE[]),
        |  (6, 3, [0.17001975707886471, -0.099425281414182900, -0.041508825855342920, -0.015767242368086480]::DOUBLE[]),
        |  (6, 4, [0.10828765881934050, 0.13487461442159054, 0.10036553552593670, -0.10435606693713194]::DOUBLE[]),
        |  (6, 5, [-0.078135753013758040, 0.014714375710858185, 0.080164218336626510, 0.22384188760916907]::DOUBLE[]),
        |  (6, 6, [0.15361693801848342, 0.071678746496906980, 0.14258609796980110, 0.069610401309007600]::DOUBLE[]),
        |  (6, 7, [0.0082173338223566880, 0.24848938774941048, 0.011052175673293970, 0.031167338447443987]::DOUBLE[]),
        |  (6, 8, [-0.059733966346151590, -0.17797816187914950, -0.10039382171261386, 0.054540691612570690]::DOUBLE[]),
        |  (6, 9, [0.024531609837859340, -0.16139406464029704, 0.10424894173361873, -9.6403848385253600e-05]::DOUBLE[]),
        |  (6, 10, [-0.059738692753138930, 0.027886782093978320, -0.16556297625532385, 0.083406634237906240]::DOUBLE[]),
        |  (6, 11, [-0.19454701497103652, 0.13763155078293550, -0.11246036356223271, 0.013094994616579788]::DOUBLE[]),
        |  (6, 12, [0.16332670910585678, 0.16242585315745553, -0.081624762410505100, -0.16415199505198133]::DOUBLE[]),
        |  (6, 13, [-0.099378011696177550, -0.013984872763243722, 0.041642701147306796, 0.041320611320664410]::DOUBLE[]),
        |  (6, 14, [0.11654263315811150, 0.023883639145311110, -0.075355758210943310, 0.18467199666942263]::DOUBLE[]),
        |  (6, 15, [-0.12015747418053924, -0.041481173222787285, -0.013320435171923056, -0.17303907464843900]::DOUBLE[]),
        |  (7, 0, [-0.098362578856394850, -0.079407807967538050, 0.12131417112098478, 0.092231945293779720]::DOUBLE[]),
        |  (7, 1, [0.018873479643433236, -0.20339321640561353, 0.0043320162882370890, 0.14629365625221544]::DOUBLE[]),
        |  (7, 2, [0.075164333110365120, -0.0072709632520199440, 0.0098080440735796950, -0.22682927454491470]::DOUBLE[]),
        |  (7, 3, [0.14242364901777850, 0.079144495381127080, -0.050540552093176280, -0.042805456187065556]::DOUBLE[]),
        |  (7, 4, [-0.051618402098019565, -0.037850722108728520, -0.11140097697460732, 0.19762202789450400]::DOUBLE[]),
        |  (7, 5, [0.020492441645449652, 0.078576737545918530, 0.21139466373777366, -0.0016224577824282260]::DOUBLE[]),
        |  (7, 6, [2.6432362889437616e-05, 0.22749739610390010, -0.040600687833742835, 0.10827882947137876]::DOUBLE[]),
        |  (7, 7, [-0.018521901391430820, -0.17930664279329644, 0.10836500943615404, -0.12289732557442423]::DOUBLE[]),
        |  (7, 8, [0.13626574687454054, -0.069202885782523220, 0.088186503144776800, 0.00033973985223540473]::DOUBLE[]),
        |  (7, 9, [-0.043339138966272770, 0.19012845969961070, 0.028245457624328300, -0.10854399280608007]::DOUBLE[]),
        |  (7, 10, [-0.16746950461359444, -0.029606375584137540, -0.12300955701909826, -0.065621942534803720]::DOUBLE[]),
        |  (7, 11, [-0.010473546342504816, 0.10252605167283615, -0.17946951754552246, 0.010174989450228660]::DOUBLE[]),
        |  (7, 12, [-0.033723000552488710, 0.011308096149477462, -0.0047368796241346860, 0.044315396064941226]::DOUBLE[]),
        |  (7, 13, [0.12000976430709882, 0.079525880315023180, 0.061503490224827740, 0.15614606893358232]::DOUBLE[]),
        |  (7, 14, [-0.18103607482363385, 0.014666772242447330, 0.11260657493035627, -0.094872171135723190]::DOUBLE[]),
        |  (7, 15, [0.082976147309514870, -0.15344769647354833, -0.12836530792259493, -0.036793017676053280]::DOUBLE[]),
        |  (8, 0, [0.012494348602294070, -0.056428358585105220, -0.013952261017852010, 0.24895329998103027]::DOUBLE[]),
        |  (8, 1, [0.15980338130314184, 0.061867531011239380, -0.065529166052407080, 0.10276169646644039]::DOUBLE[]),
        |  (8, 2, [0.012367008168901765, -0.18378436647942273, -0.068902670497858340, 0.043575910056112284]::DOUBLE[]),
        |  (8, 3, [0.16613800535135437, -0.097774928734899850, 0.038367381848455850, -0.12454551267628379]::DOUBLE[]),
        |  (8, 4, [-0.17123974863074218, 0.078194058040846160, 0.0053744065244062070, -0.067086629413817890]::DOUBLE[]),
        |  (8, 5, [-0.036884247583861860, 0.076964857548382340, -0.15395917950148000, 0.069784572540186690]::DOUBLE[]),
        |  (8, 6, [0.077305800436976140, 0.23719888406747372, 0.069345018284117490, 0.00074379620420690230]::DOUBLE[]),
        |  (8, 7, [-0.0079499107163532540, 0.011632519427768521, 0.20631656107336070, -0.14391455620649835]::DOUBLE[]),
        |  (8, 8, [0.039253996387160386, -0.11434577226400700, -0.17721453599088927, -0.070381640018850940]::DOUBLE[]),
        |  (8, 9, [0.054388068464380520, 0.086695658918709800, -0.033256124775882720, -0.086459094379202560]::DOUBLE[]),
        |  (8, 10, [0.018512870904664636, -0.099305313170217650, 0.042583122858241104, -0.0070435094930043490]::DOUBLE[]),
        |  (8, 11, [-0.24746536113587586, -0.11495277702307527, 0.013620041264711029, 0.057548733493997210]::DOUBLE[]),
        |  (8, 12, [-0.091341916407488730, -0.069318419520226700, -0.011025028455270959, -0.19353273428969750]::DOUBLE[]),
        |  (8, 13, [0.17298762596501880, 0.039476239965151790, 0.095222650104938450, 0.014639425978295149]::DOUBLE[]),
        |  (8, 14, [0.0072811172823506700, -0.0064162427781880250, 0.20895285584473586, 0.096308004101941070]::DOUBLE[]),
        |  (8, 15, [-0.066559305938359330, 0.024051811932884240, 0.018139225873376570, 0.11484069745189053]::DOUBLE[]),
        |  (9, 0, [-0.24042617056209695, 0.088583711346765750, -0.028258149975847704, 0.0080069881532742450]::DOUBLE[]),
        |  (9, 1, [0.090757967793752860, -0.12652582240628707, -0.23345035120376964, 0.060354187752071194]::DOUBLE[]),
        |  (9, 2, [-0.20107281488917642, -0.056360740907832970, 0.17813119226793675, -0.022861426973931220]::DOUBLE[]),
        |  (9, 3, [-0.10976630484532236, -0.17874562461655652, 0.038799916617701560, 0.090473811458049610]::DOUBLE[]),
        |  (9, 4, [-0.082703780150365450, 0.19295351342877580, 0.024981691625951482, 0.13250303329417004]::DOUBLE[]),
        |  (9, 5, [0.014168045326956320, -0.062392873866228780, 0.097841733922744800, -0.16061515300456990]::DOUBLE[]),
        |  (9, 6, [-0.0086112138816294200, 0.018847171913634160, 0.15926649282975880, 0.029372061670523954]::DOUBLE[]),
        |  (9, 7, [-0.021255980600058900, -0.087124334551099940, -0.10321874431210162, -0.10736941858493708]::DOUBLE[]),
        |  (9, 8, [-0.049582504676675375, -0.017240411636814760, -0.10446192132737163, 0.17564526161395270]::DOUBLE[]),
        |  (9, 9, [-0.068626842025512090, 0.11937370683792707, 0.028529732806540545, -0.17491484990950137]::DOUBLE[]),
        |  (9, 10, [0.10123999255438985, 0.15213197762314748, -0.16732513583517666, -0.019946833730088880]::DOUBLE[]),
        |  (9, 11, [0.17370027026540608, 0.062369188511733155, 0.055496718821636940, -0.014052654521248362]::DOUBLE[]),
        |  (9, 12, [0.046083728792263405, 0.063814370418664460, 0.13683782023696436, 0.23105107319874318]::DOUBLE[]),
        |  (9, 13, [0.10631192381267514, -0.17084042152079523, 0.0043015319677085010, -0.010381698169772106]::DOUBLE[]),
        |  (9, 14, [-0.072490529693462330, 0.11151108360476190, -0.10310160877104517, -0.022235886282386400]::DOUBLE[]),
        |  (9, 15, [0.070535709030221920, -0.011779049453403766, -0.016334416092424135, 0.090294463764466050]::DOUBLE[]),
        |  (10, 0, [-0.043431463537625545, -0.18251618472504808, 0.031975649639154890, -0.051769035775248890]::DOUBLE[]),
        |  (10, 1, [-0.053438394739075204, -0.021742073239935330, -0.12578688204679087, -0.0016940509528820856]::DOUBLE[]),
        |  (10, 2, [0.23906669575720418, 0.061350990870829084, -0.083405923574059720, -0.11783700095499478]::DOUBLE[]),
        |  (10, 3, [0.12136989881766216, 0.080514391124287970, -0.058426562950227930, 0.10194109011126569]::DOUBLE[]),
        |  (10, 4, [-0.052858734808640600, 0.16084730135391853, -0.048148254761688940, -0.13138488811808050]::DOUBLE[]),
        |  (10, 5, [-0.069643493188273860, 0.039372534608815670, 0.21778051172283150, 0.0025512590737660840]::DOUBLE[]),
        |  (10, 6, [0.16196269462659530, -0.12107917082241387, 0.036260651130720925, -0.095740573624342630]::DOUBLE[]),
        |  (10, 7, [0.013966799959997367, -0.022414686177569780, -0.069461657749110990, -0.21955579248093290]::DOUBLE[]),
        |  (10, 8, [-0.19042974504538987, 0.0031258953890241355, -0.021876065220571096, -0.0048088511321231980]::DOUBLE[]),
        |  (10, 9, [-0.10981449124343583, -0.12779307486099814, 0.15757092015418683, 0.094307743950153480]::DOUBLE[]),
        |  (10, 10, [-0.077429844251552330, -0.12698712081294217, -0.068815812233666670, 0.16482774384251567]::DOUBLE[]),
        |  (10, 11, [0.083100507015867580, 0.033887501965906760, 0.16610585524925980, -0.077679733448847110]::DOUBLE[]),
        |  (10, 12, [-0.039162302233517830, 0.13541332892235370, -0.16996015349420193, 0.056665460211564090]::DOUBLE[]),
        |  (10, 13, [0.087589910179580600, -0.042710162326762220, 0.068953365205177340, 0.13902398703875254]::DOUBLE[]),
        |  (10, 14, [-0.014756400101862846, 0.17885310493450463, 0.043840589725100600, 0.034573202301061830]::DOUBLE[]),
        |  (10, 15, [0.10205838846548068, -0.16711947770193855, -0.14637055462109874, 0.040626961775782870]::DOUBLE[]),
        |  (11, 0, [-0.036484241358074410, 0.061312762117646170, -0.13623318632582782, 0.010677041987001179]::DOUBLE[]),
        |  (11, 1, [0.010606065135559410, -0.15708530718311560, -0.015728494345545670, -0.064323612002487530]::DOUBLE[]),
        |  (11, 2, [-0.11866404771488870, 0.087609035512011320, 0.16150544585461007, -0.18000614949030955]::DOUBLE[]),
        |  (11, 3, [0.15708427285289422, -0.095750508114927300, 0.044567281110781640, -0.099274653119783830]::DOUBLE[]),
        |  (11, 4, [0.097188889028104500, 0.15887374739713594, 0.053706895916829846, -0.052607490734396520]::DOUBLE[]),
        |  (11, 5, [0.13410268713756404, 0.084296929495521940, -0.11167317103095804, 0.076871293675939170]::DOUBLE[]),
        |  (11, 6, [-0.13112488784344203, -0.11306972096518360, 0.038183961314916190, -0.092811486233467370]::DOUBLE[]),
        |  (11, 7, [-0.13520118986779114, 0.014008852410119530, 0.10604857175142005, 0.076727282672715540]::DOUBLE[]),
        |  (11, 8, [0.076275588829146160, -0.034639301322299636, 0.19118073626694113, -0.032413813908432410]::DOUBLE[]),
        |  (11, 9, [-0.20574640261550672, -0.034218788173002860, -0.15368666516719695, -0.060362895962848450]::DOUBLE[]),
        |  (11, 10, [0.045654433549277670, -0.039126208816051215, 0.058758078957484580, 0.21486964483896970]::DOUBLE[]),
        |  (11, 11, [0.070113175400815050, -0.14252882418485327, -0.15705125835765340, 0.25830183770912500]::DOUBLE[]),
        |  (11, 12, [-0.17491533268189682, 0.14431927661109414, -0.041787455702481054, 0.011199994968244018]::DOUBLE[]),
        |  (11, 13, [-0.036849272174505590, 0.10138387029877087, -0.073419734773418440, -0.21034553588926794]::DOUBLE[]),
        |  (11, 14, [-0.040436458095501590, -0.090365469807026280, -0.13196539952678993, 0.099455068362506590]::DOUBLE[]),
        |  (11, 15, [0.040181790107052000, 0.042153837401675900, 0.043838897708548220, 0.075032054945387570]::DOUBLE[]),
        |  (12, 0, [-0.13301545846788270, -0.19101599767346280, 0.13860722536538870, 0.0064080055959152400]::DOUBLE[]),
        |  (12, 1, [-0.14798589715485050, -0.028205290138896517, -0.082794836534879550, -0.097826106990596810]::DOUBLE[]),
        |  (12, 2, [-0.18472448672108277, 0.038687263608523000, 0.060194978972363320, 0.060480784265495590]::DOUBLE[]),
        |  (12, 3, [-0.068278973835264380, -0.20253001425447253, -0.12196054437598608, 0.0086347464365563470]::DOUBLE[]),
        |  (12, 4, [0.17992931991220740, 0.045995446533317066, -0.14273820148869454, 0.029880029349615780]::DOUBLE[]),
        |  (12, 5, [0.0047795989830098480, 0.077067668260138240, 0.023175559798822280, 0.14877547960078194]::DOUBLE[]),
        |  (12, 6, [-0.014078009804150984, -0.078758149216573480, 0.037520992467711390, 0.019933011140354570]::DOUBLE[]),
        |  (12, 7, [-0.056730915360434404, 0.076668975023625460, 0.13022269193990824, -0.16631149129067177]::DOUBLE[]),
        |  (12, 8, [-0.081492833508604620, -0.053851013796222036, -0.10966435795820285, 0.19322962693235146]::DOUBLE[]),
        |  (12, 9, [0.071901437686891280, -0.17165679825511430, 0.046753254014368265, -0.13336822299152240]::DOUBLE[]),
        |  (12, 10, [0.054225061642809270, 0.035889345462483150, -0.067836146962860030, -0.21824028997726622]::DOUBLE[]),
        |  (12, 11, [-0.025505964976329544, 0.055378266528448790, -0.12656817760464306, -0.016214965500483236]::DOUBLE[]),
        |  (12, 12, [0.024452645301719240, 0.19016778616756025, 0.097944018699425180, -0.0077151692957999835]::DOUBLE[]),
        |  (12, 13, [0.17038703621599094, -0.20299405201562026, -0.0020850201078329313, 0.094568346881214560]::DOUBLE[]),
        |  (12, 14, [0.036295983269848430, -0.048471133226719240, 0.19566061837697923, 0.041440215906153634]::DOUBLE[]),
        |  (12, 15, [0.15484462658639153, 0.031319796804338135, 0.052927088454916780, -0.057875761957973810]::DOUBLE[]),
        |  (13, 0, [-0.0088308552000840490, -0.098955842082641630, -0.077583450182384660, -0.13469396789827745]::DOUBLE[]),
        |  (13, 1, [0.27394119941724410, -0.26237936495131650, -0.12211797337228121, 0.11972938240549445]::DOUBLE[]),
        |  (13, 2, [-0.23113078915503120, 0.082090688682518080, 0.010901174674342335, -0.018276833774819708]::DOUBLE[]),
        |  (13, 3, [-0.12959326592031942, -0.062982830545748420, 0.17576384755666140, -0.039124636083064310]::DOUBLE[]),
        |  (13, 4, [0.15737874829491966, 0.016723045292320850, -0.061587107873549160, -0.059368835587455170]::DOUBLE[]),
        |  (13, 5, [-0.070175725591430880, 0.098815970357272500, -0.17200423403904003, -0.10777963285472232]::DOUBLE[]),
        |  (13, 6, [0.022264000552326650, 0.13009844130365655, 0.092443435222684220, -0.026507902999736103]::DOUBLE[]),
        |  (13, 7, [-0.070111833554022480, -0.19665427555387593, -0.10544849458078775, -0.0087993548955093980]::DOUBLE[]),
        |  (13, 8, [0.17485809620452590, -0.050879513435419050, -0.16074267467847556, 0.084887811598610680]::DOUBLE[]),
        |  (13, 9, [0.077553504276429960, -0.11865536748815485, 0.067994061178624440, -0.051533459250946750]::DOUBLE[]),
        |  (13, 10, [0.067731824437626900, -0.054928569796286300, 0.059634363162134510, 0.17452534692311966]::DOUBLE[]),
        |  (13, 11, [0.071572588144107230, 0.11851968168366893, -0.069087089695192280, 0.10485340141895082]::DOUBLE[]),
        |  (13, 12, [0.18339372566178597, -0.018675648607661890, 0.12976826770784033, 0.026052801849638207]::DOUBLE[]),
        |  (13, 13, [-0.035831397527153120, 0.049571478686404075, 0.00033666270551011870, -0.21646045594237820]::DOUBLE[]),
        |  (13, 14, [-0.10912405737924400, 0.020994388444665897, 0.058061777094466790, 0.11961104567573767]::DOUBLE[]),
        |  (13, 15, [-0.040948690028250570, -0.028098536331474170, -0.13402989004578897, 0.11014083894200400]::DOUBLE[]),
        |  (14, 0, [-0.11531394048449800, 0.043249552257515124, 0.077820101260322630, -0.083695372889408880]::DOUBLE[]),
        |  (14, 1, [-0.013964035643937840, 0.018720251968577430, -0.070528972359674800, 0.16058730576302058]::DOUBLE[]),
        |  (14, 2, [0.12374426172496956, 0.040214909148484114, -0.20463889909433366, -0.076559685737060360]::DOUBLE[]),
        |  (14, 3, [-0.10375132541504446, -0.081504857685559680, -0.12739504455701420, -0.088936986701123860]::DOUBLE[]),
        |  (14, 4, [-0.13457959474955983, 0.044694904536370365, 0.015020152839753127, 0.098886884815817440]::DOUBLE[]),
        |  (14, 5, [0.15658815932985312, -0.019899399324289360, -0.0066247503984569490, 0.040928270386981276]::DOUBLE[]),
        |  (14, 6, [0.023358308703220053, 0.14762849042198550, 0.24215096127732832, -0.16448860316527464]::DOUBLE[]),
        |  (14, 7, [-0.076654944696293930, 0.20024657208188860, -0.13523441054914356, -0.022580164388836543]::DOUBLE[]),
        |  (14, 8, [0.097222114686648500, 0.14741273248300416, 0.064578997810429570, -0.010234116164297242]::DOUBLE[]),
        |  (14, 9, [0.11914161813887462, -0.13582703135970490, 0.017715005655482202, -0.077274695562047120]::DOUBLE[]),
        |  (14, 10, [-0.010653723770142504, -0.018385087636858657, 0.20620946107904733, 0.092668195012612340]::DOUBLE[]),
        |  (14, 11, [-0.048521128778383160, -0.15759846682716400, 0.033914533895433786, -0.020005536256491624]::DOUBLE[]),
        |  (14, 12, [0.013331534712222745, -0.12140607231078682, 0.12210790194570560, -0.15229203111479228]::DOUBLE[]),
        |  (14, 13, [0.024768687617816480, 0.030337386403016240, -0.045346180533527200, -0.20713051078502800]::DOUBLE[]),
        |  (14, 14, [0.12507681082431715, -0.10722876229835855, 0.038893079536012140, 0.16437904827838176]::DOUBLE[]),
        |  (14, 15, [-0.0059577796262183045, -0.095043025352176850, -0.20635107319205231, 0.055056844767208644]::DOUBLE[]),
        |  (15, 0, [0.044541309818839180, -0.047777760938160960, 0.067740235652361850, -0.23662816710512120]::DOUBLE[]),
        |  (15, 1, [0.034562858070391720, -0.023418216430107254, 0.22479056214494697, -0.024533587973640213]::DOUBLE[]),
        |  (15, 2, [0.086566946891005180, 0.049429787780741995, 0.047223200498655960, 0.12695705973811594]::DOUBLE[]),
        |  (15, 3, [0.11254615746964343, 0.0054072676852465850, -0.15083757064614142, -0.046405624519808200]::DOUBLE[]),
        |  (15, 4, [0.033703727461765350, 0.18773194960031217, -0.015742911402701645, -0.057028476945551520]::DOUBLE[]),
        |  (15, 5, [-0.094658665611314180, 0.080343945202390870, -0.13282095613671974, 0.065489457086376160]::DOUBLE[]),
        |  (15, 6, [-0.035737563893410410, -0.17932063001436438, 0.10420586646376497, 0.019862181645681053]::DOUBLE[]),
        |  (15, 7, [0.19202328600666770, 0.00037901314761113610, 0.020114875206362254, -0.042599240904449140]::DOUBLE[]),
        |  (15, 8, [-0.00031758324349454460, 0.082662175434226660, -0.13807603919554073, -0.16943806572962347]::DOUBLE[]),
        |  (15, 9, [-0.17568636070581112, -0.069866993428408140, -0.022683645911974720, -0.074753938170063230]::DOUBLE[]),
        |  (15, 10, [0.069981430681766530, -0.10508259285273666, -0.083953196174169080, 0.14511782773091270]::DOUBLE[]),
        |  (15, 11, [0.054616067898839264, -0.19404301693347240, -0.059236291374967600, -0.10645015819988077]::DOUBLE[]),
        |  (15, 12, [-0.054612783512553420, -2.0676759019758476e-05, 0.042431607106240140, -0.019343641744002560]::DOUBLE[]),
        |  (15, 13, [0.050382408347137815, 0.19392563232958446, 0.13968235820327238, 0.052097330250745776]::DOUBLE[]),
        |  (15, 14, [-0.10902858187370935, 0.024360910065041040, 0.061014556068524850, 0.17740660095432340]::DOUBLE[]),
        |  (15, 15, [-0.18407303605425765, 0.14435401549709980, -0.032545658209738390, -0.091806386184413420]::DOUBLE[])),
        |d AS (SELECT u.vec_id, cb.s, cb.cell,
        |    list_sum(list_transform(generate_series(1, 4),
        |      j -> (uv[cb.s * 4 + j] - ctr[j]) * (uv[cb.s * 4 + j] - ctr[j]))) AS d2
        |  FROM u CROSS JOIN cb),
        |enc AS (SELECT vec_id, s, cell AS code FROM (
        |    SELECT vec_id, s, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, cell) AS rnk
        |    FROM d) WHERE rnk = 1),
        |pair AS (SELECT dq.vec_id AS query_id, ec.vec_id AS neighbor_id,
        |    SUM(dq.d2) AS adist
        |  FROM enc ec JOIN d dq ON dq.s = ec.s AND dq.cell = ec.code
        |  WHERE dq.vec_id < 8 AND ec.vec_id <> dq.vec_id
        |  GROUP BY 1, 2),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        |  FROM pair),
        |short AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 64),
        |scored AS (SELECT sh.query_id, sh.neighbor_id,
        |    list_cosine_similarity(qe.v, ne.v) AS score
        |  FROM short sh
        |  JOIN e qe ON qe.vec_id = sh.query_id
        |  JOIN e ne ON ne.vec_id = sh.neighbor_id),
        |rr AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM rr WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // PARTIAL oracle: the coarse centroids and the residual codebooks
    // are constants of the shared-sample layout-invariant IvfPq.fit
    // (IvfPqOracleProbe prints them at the sf0.01 gate); the SQL replays
    // everything downstream - unit normalization, cell assignment and
    // the 6-cell probe set (the q_similarity_ivf idiom), per-row
    // residuals, per-subspace argmin encode, the per-(query, cell)
    // residual LUT and the subspace-order ADC sum, (adist, id) ranking.
    // Probe-checked margins: assign 5.5e-4, probe boundary 1.8e-3,
    // residual encode 1.2e-5, ADC rank 5.5e-4, zero exact ties.
    "q_similarity_ivfpq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS uv
        |  FROM e),
        |cc(cell, ctr) AS (VALUES
        |  (0, [-0.029647921449040663, 0.022591227551941012, -0.050224233735827774, 0.0055495760947127840, -0.050814233870624816, -0.013243826454324092, -0.0071346718342410790, -0.017274321288120000, -0.020772087994589960, -0.062697202571580570, -0.0064932233768894060, -0.018087499542542100, -0.059497491152962400, -0.029687898488398975, -0.022437686597278565, -0.081902440554351640, -0.023731325996745380, -0.027826328729332610, 0.030134769504679866, 0.015747920830698054, 0.0043024920691457030, -0.016344941810941958, 0.013196314564122100, 0.046448886277278480, 0.066773044348591810, 0.043898425273959820, 0.0067018738058201230, -0.034687889739340440, -0.011286857837536354, -0.029509170565637280, 0.028575274565815900, -0.018900227691767020, 0.035379471687558520, -0.028058580459595597, 0.0026966828163923380, -0.051661442105554890, -0.050542393068864900, -0.042527695021781920, -0.028587060551814043, -0.0055173898794267020, 0.013850163982505643, 0.041055198182015230, 0.055036903249102945, -0.055877073762119000, 0.015629877567566546, 0.044605501452065310, 0.031566478411684265, -0.030437544781449870, 0.041316395696013190, 0.034950055404657225, -0.024182471431135187, 0.019539490863702574, 0.0030935182119666014, -0.048513667771627980, -0.096124355437398680, -0.046742681998915010, 0.048917838609353820, -0.016760238452586380, 0.033743963581947325, 0.041385525918040740, -0.039100627085925730, 0.046587574325254980, -0.014625397492380584, 0.0037834268155730287]::DOUBLE[]),
        |  (1, [0.0054231678316132800, -0.012822579107721268, -0.014747213630607213, -0.031923099879736815, 8.0432442389326590e-05, 0.067592237645187780, 0.016396934983612124, 0.030838371748530810, 0.075361344200407880, 0.080659890181341880, 0.048821852745847480, 0.062278146948031535, 0.013235118283479388, 0.011429049805778742, 0.065062234833440500, 0.0086893483445106520, 0.020376929749953903, 0.015109134280399497, -0.0083652732767849940, -0.033347706914911894, -0.025354957572507462, -0.010845123709754163, -0.024288328386401707, -0.0061390724443633160, -0.018854902532577760, 0.019975619653851244, -0.0096266853365283080, 0.027424432521539626, -0.023367495195376658, -0.058220004076280000, 0.033533418596506444, 0.025518577112393366, 0.053767058872124520, -0.034418508693379360, 0.00039382966917350166, 0.0057262249707925520, -0.035497676130010060, -0.035055086909587430, 0.028936789092844972, 0.014132208045499890, -0.035238182010071990, -0.025320181739921604, -0.015431616739789360, 0.044590869871341130, 0.011206350233669098, -0.067704006969619980, 0.024611843397624414, 0.095469723530261440, -0.027502840741476140, -0.0018147861279036333, 0.023673562281596335, -0.026095478934510714, 0.035281200998325900, -0.027726475385818200, 0.017603131922574563, 0.048547140996394500, -0.046947582065863570, -0.070945555798730520, -0.026765056155018736, -0.11021608239954304, 0.024546649215412340, -0.028222573702781847, -0.066392437045600450, -0.058018802145837550]::DOUBLE[]),
        |  (2, [0.016026937748226392, 0.11885779860784836, -0.024600073906639420, -0.016969727135985463, 0.028987539733133845, 0.0020067465049765387, -0.054888524931464476, 0.066727486357963920, 0.037942958663525360, -0.035881977564606950, -0.045032640843027860, -0.029062966830274126, 0.025244743016908100, 0.0037832451463821115, 0.016455155043517410, 0.066037101043715190, 0.050197752722338720, -0.024471147404454730, -0.018487761373744110, -0.083056028085455670, 0.034250319851192550, 0.0097828571422694970, 0.021619418216388752, -0.034428292271698090, 0.0060676468677977960, -0.018685974293042090, -0.020985567924280715, -0.013414951055419249, -0.021280163980557567, -0.050584243815445950, -0.0014949167834283558, -0.024739391345246470, -0.056812757826272130, -0.034053060722700150, -0.060205535111676194, -0.031710001866574250, 0.039472247959387300, 0.030215655639544068, -0.012982718994981424, -0.031149158577262090, 0.018401382422348500, -0.022457406994424868, -0.038989029362457010, -0.068587187117613230, 0.013767843213098246, -0.036016391534208096, 0.0012251035053926138, 0.066563844387474650, -0.015854493159863557, -0.040221975141589130, -0.040108742980548354, -0.041752452527614630, -0.032263272009916896, -0.0035566268689654324, 0.058352550732959606, -0.010139969530158091, -0.017256656556860397, 0.024253817924616193, -0.052976757654168210, -0.025670816270391313, -0.042127811478261340, -0.097757371362353250, 0.077746087847268840, -0.039227993564877330]::DOUBLE[]),
        |  (3, [0.024066221323009986, -0.051222032993315520, 0.032110780072197200, 0.014941746624570052, 0.0047441633826229790, -0.017957552711141904, -0.049423191550667220, 0.028013323946302744, -0.023302000759014892, -0.029385742763576354, 0.0073434189294371740, 0.012634488735335354, -0.0011325097252666760, -0.057028822624577630, -0.0045422801134861490, -0.020196014302048890, -0.035502672566887890, -0.053608428636152120, 0.019643112056689510, 0.010199397273827302, -0.096405433184596950, 0.010331904982119538, -0.0018491701162578213, 0.034657790683657760, 0.059274671371593260, 0.059267135819457240, 0.058582365787323840, -0.0026300112390851573, 0.075930340874064210, 0.063694642337216010, -0.019695278511459628, 0.10423876718128344, -0.031258231954605390, -0.017892090245514056, 0.020230218167148675, 0.027075234420588307, -0.061881705120894800, 0.054498482389234690, -0.064423683412074770, 0.0094440202829588410, 0.013838095088450303, -0.024290946636017816, -0.0010631209213067590, 0.026832047428885272, -0.044171191844455480, 0.013502732245244820, 0.019626776642200520, -0.0040154521584611580, -0.11029863416947377, 0.013100210575778372, -0.0024926674443572546, 0.014324542184407100, -0.034572067348135394, -0.032527352503555590, -0.026860494781597362, 0.044021055109130840, 0.0094611377350574070, 0.016231864496930353, -0.14271770367012895, -0.026461555275173870, 0.026849700709156835, -0.035561341107701455, 0.021146720562926755, 0.036472843498674770]::DOUBLE[]),
        |  (4, [0.024599188748134777, -0.013862250208097641, 0.016765254557215944, -0.030377661866195012, 0.052957828333253874, 0.042435372160211810, -0.0048678819346133450, -0.066685740718145270, 0.030947012119295220, -0.019288729391777115, -0.028509245672330890, 0.068592799005237150, 0.051106576412291520, 0.053262458019114440, -0.0033097883421820260, 0.033415019109204684, -0.063072231892630990, 0.097805785301323460, -0.054755372137170870, 0.014325436300942620, 0.0087297952503493370, -0.0095927314178518160, -0.035207218946875890, -0.050066260797743180, -0.027209490029287155, 0.041234673100209290, -0.029381374615592783, -0.024582348317585236, -0.040735672783522330, 0.027616022561399868, -0.0017813529193596478, -0.057429572943155700, 0.024290230775312747, 0.046992166661200690, -0.043115660023178090, 0.010273373588522941, -0.041518692458881054, 0.048448260835114950, -0.042806126281460330, 0.021279251100444617, 0.0042626815595332420, -0.093579858699786100, -0.0033557721217184985, 0.0064116226236358970, 0.0080682138525903190, 0.021165008162770310, 0.010581490364369527, -0.042280340262928234, 0.012534006119257882, -0.095978866822702530, -0.0071824173096687490, 0.021735117439400188, 0.019421415541498035, 0.038703931099193820, 0.0010206628975074844, 0.0077266036670802210, 0.019855608914224936, -0.0055470777372517330, 0.061857027939684680, -0.021003104131154342, 0.057589801746460830, -0.048391242882534290, 0.025950152111320970, -0.0074239614519610800]::DOUBLE[]),
        |  (5, [-0.040680154103034920, 0.0071982399645772145, 0.065609393159147270, 0.023041778635976548, 0.0035501449061990102, -0.017372875243193950, -0.021398409536361710, 0.061189066797611160, -0.020494287020027934, 0.050096131911192290, -0.050810854012198470, 0.059731211662609660, 0.041046781810642086, 0.0021306949407077875, 0.10256833391079642, 0.019861740542696262, -0.016214974179037382, -0.049434488505653150, -0.030542765994539170, 0.026220603090256044, -0.0094308055653408820, -0.017416274354215864, -0.051558158435323680, -0.0016133758856317660, 0.050807755133629420, -0.0010356048822724561, -0.039118332835787320, -0.011974980798342734, -0.028498165687556400, -0.0015776812863416690, 0.035238023034880920, -0.024204746091519810, 0.060992852662452954, 0.057884974705589700, 0.015542797604581346, 0.0039285668717522560, 0.046383839788625780, -0.056561685697926620, -0.092376647738401300, -0.072870459907452630, 0.0064005518129155030, -0.020127399676568684, 0.061980828626759770, 0.063805165414902620, -0.078095069717318100, -0.012359194836946313, -0.11438991180822816, -0.022833124218714880, -0.038838901575979065, -0.035239702346503870, 0.047873304066916830, 0.059273215657329490, 0.019907520102290910, 0.023476002765084060, 0.057477299670094810, -0.0099030792597622120, 0.016270180598207923, -0.0035471138628046478, -0.0024813492306441480, 0.062976181518618030, -0.0024684196379151104, -0.030504884587890448, 0.024987463181290373, -0.047695002267489380]::DOUBLE[]),
        |  (6, [-0.016150379121137820, -0.022181088341993248, 0.018657419861759904, -0.0010348074766146518, -0.0073421869011213120, -0.087077678281333400, -0.012366895795408818, 0.063134535195725600, -0.022993312516387050, 0.12778470399996790, 0.024826824773652610, 0.052515286200219390, -0.011454065823686220, -0.0038735678064575370, -0.022614183589106650, -0.039664332161028540, -0.040978163185238656, 0.033501290758353106, 0.0072294790956160640, 0.073671880188968100, -0.015020320130657374, -0.010071753913877617, 0.0054873290534171205, -0.043809767814102760, -0.047477471391255610, 0.0065740251169083540, -0.067236454791169900, 0.070513631172606760, 0.00092069168759027550, 0.053585918474301610, 0.014174332833754270, 0.0071641143633621770, 0.016468235864214020, 0.026981774954528020, -0.054234452648460090, 0.019224917354825847, -0.0014065247995390757, -0.011471646764319030, 0.050150990767214920, -0.039054448468627316, -0.020197719554895452, 0.058293698616498810, -0.089795880579929180, -0.046945049808920856, -0.099467818898730960, 0.0080373413697255400, 0.021169870454243920, 0.020836193883364440, -0.018565548773961292, -0.048193372318944500, 0.072577836489263250, -0.025720219154338128, 0.063859929481016100, 0.0093906315899931950, -0.029839888648539266, -0.0025004114498934082, -0.024495841348177710, -0.065370304518500510, -0.025811279745031920, -0.049471829225265160, -0.0048594974516119850, 0.10597487381243947, -0.031470070616537880, -0.035321488575535400]::DOUBLE[]),
        |  (7, [0.075020265306635110, -0.028149156132891690, -0.0070110073355056570, -0.029590936921644564, 0.070398196303734620, 0.038867739705319640, -0.016359628997025973, -0.023064399047101200, -0.029434386745500540, -0.033186137794295925, 0.0062815192311112605, -0.0038046820039956800, -0.031167185325709120, 0.035286242926226466, 0.0040083952261175730, -0.11395456684777285, 0.033335665187503490, 0.016826080706716214, -0.00015004375012113590, -0.0040046635928051450, 0.027443457563569080, -0.029895894952773037, 0.0029143314859150418, -0.097418247550884640, 0.010624135546298572, 0.058163391165996720, 0.15773768739221708, 0.018702401180714284, -0.015062846647886066, 0.063387659222131460, -0.038593072157996630, -0.035034044827741770, 0.0020430034737115580, -0.010414024975320737, -0.019398110863045135, -0.024122136855847480, -0.0064627568746709840, 0.019810282155871734, 0.077433490680303200, 0.044685175996174970, -0.029919289237588020, -0.0064024724704928480, 0.00071323518684585380, 0.065040981430178170, 0.010029337731497967, 0.0092447116655512990, -0.030515037117816154, -0.018604779698814870, -0.0042352751639103140, 0.048761482283500704, -0.012896034760580022, -0.096306283593568880, -0.055291541011708790, -0.0033884367661456295, 0.015089111247272125, -0.073134562197213320, 0.047513044498984636, -0.016688682118443890, 0.020243099025728212, 0.029756521567586150, 0.058730618052240640, -0.0049592926340754255, 0.041923616424076784, -0.049075754975514516]::DOUBLE[]),
        |  (8, [-0.013813278191274207, 0.056771851356674870, -0.037945141224553060, -0.066992657104304740, -0.090357006648479100, 0.085719759253411780, 0.026154220868051702, 0.013619246982586050, 0.011301971480920600, -0.079925780662271460, -0.039218559338125770, 0.032303875902017580, -0.016513321978382680, -0.032389271036815240, -0.042471408182409735, 0.042169660396714645, 0.014770138800861660, -0.015502595442174557, 0.063017672897811420, 0.071165113645376500, 0.043034990183437455, 0.022737063337339890, 0.036986359935287800, -0.011334529228894538, 0.061518594419707500, -0.012242501526996801, 0.044354029885564020, 0.059478941909536200, -0.0063496906293164860, 0.015004703304107770, -0.033836040681542810, 0.094034712252749550, -0.020887809605628527, -0.014199448224258048, -0.0063720710488178940, 0.099450704413487620, 0.049477933589769840, -0.028869936934276967, 0.037383093951171730, -0.012494534132055254, -0.040595343752532030, 0.013303538175630365, 0.039156594285296430, 0.0028911986054030647, -0.078890134557041820, 0.082984950453431420, 0.030292932549296454, -0.060753113756042330, 0.039101913418314815, 0.014286207323255700, -0.035950945265708490, -0.038399472289196795, 0.017550163215133180, -0.040472659820987400, 0.016203360631147720, -0.037768509996098580, 0.046507693072565144, -0.0048493165352720840, -0.047174032781255110, -0.060976110303827165, -0.021865098380869890, 0.038509347327049887, 0.019400078463300312, 0.0066344468092996160]::DOUBLE[]),
        |  (9, [-0.022744507003192888, -0.039213958777919740, 0.090388703014147130, -0.023527872937832660, 0.010821683798960391, -0.026210751004607030, 0.10197501475370864, 0.031256625401627804, -0.016329702538479820, 0.019053302758436468, 0.068541452723204100, -0.13292115183921932, -0.028525003399970123, -0.018121245442772200, -0.049676602286373016, 0.044821843335013550, 0.085309549148482490, 0.020229031163967360, 0.0046299094846144240, 0.054088819767823730, 0.010222190598216750, -0.027326344811889197, 0.022083233818967433, 0.064330076813007130, -0.050253980505777580, 0.030573465060176580, -0.011083886024347935, 0.048021094401100440, 0.038632988206006220, 0.047483463143081224, 0.063874779532086580, -0.061651329202243420, -0.0033026298107032477, 0.088104450839935220, 0.054243562461029377, -0.021376735622784150, -0.019295656233879393, -0.025491060089876440, -0.022384551957889710, 0.042565469955258820, -0.065146075975159170, 0.033592940058441710, -0.054792268356662780, -0.037799478629562490, 0.016884021400785692, -0.042083462924338420, -0.048803715870267810, -0.010539615762420866, 0.029729328058089370, 0.027063568483125550, 0.012430238332327764, 0.021336810819667595, -0.0011075075059132970, 0.041635598245252690, 0.093032267437129150, 0.00097544810935701990, 0.040355395186824660, -0.054594702461347185, -0.0024916437525869240, 0.012982561253224023, 0.0082429111636323270, -0.012808246184114185, 0.030602848211564688, -0.074116968069564570]::DOUBLE[]),
        |  (10, [0.020215710400967823, -0.062444726227382220, -0.0015334836034316599, -0.0088631034444366290, 0.011183601864211353, -0.031343252079185420, -0.033994773865096486, -0.048962562883023635, -0.025029191581833043, -0.095135053072361540, -0.018237368186193797, -0.055410724517307955, -0.051778406684264075, 0.079077657507807260, -0.051561009768075410, 0.039830934447027490, -0.0078420432806458090, 0.060198778531416580, -0.013450699305434398, 0.014540041667523875, 0.0096895371248144880, 0.11065221707028093, 0.019678941777822048, -0.0071479710874513230, -0.018459871293812487, -0.047952670708988274, -0.017937847233449804, -0.021695789986130774, 0.033459366652525760, 0.015935847239982967, -0.052349627688343926, -0.026571247563192930, -0.082294259991841650, 0.0056915165366595740, 0.047337106752031520, 0.047615525682782220, 0.068275585444189630, 0.057420871398290510, -0.0011205696213072158, -0.00039891310304798663, 0.015673141035302186, -0.041907306225868954, -0.027124868857313080, -0.027247993573501016, 0.052940790614128880, -0.0060456089580613950, -0.010412023669055791, 0.060797236040316760, 0.057077341740181545, 0.041842026988036530, -0.022019887384370173, -0.025164135078529503, 0.060167954584881640, -0.064282907241178040, 0.056330876758225590, 0.053600844202914140, -0.0033721130048704560, -0.022948602581109392, 0.020582368141608530, 0.046754283647467254, -0.022742143448576942, 0.086175126838417000, -0.021373415742153505, -0.017403386278469782]::DOUBLE[]),
        |  (11, [0.038526522379143930, -0.034678532567121510, 0.048746777462743314, 0.027789072386627485, 0.042713822174712826, -0.031672654862959450, 0.0050138868508539820, 0.033463966040552800, -0.0025298068805542397, 0.073961315306474750, -0.0069121645897835050, -0.00095322312438272590, 0.045231683490653720, -0.093384064568272720, 0.038466783158830730, -0.016166173781780250, 0.032856485843784096, 0.028746571619129954, 0.035398582472102230, 0.094766261245226750, 0.038942211651662250, 0.015804182935164498, -0.031880255757615654, 0.061667453744087136, -0.010921094034870168, 0.033156683246164394, -0.0055871868403364250, -0.0022410361061343420, -0.050610550131262200, -0.056703070427634124, -0.052284463342266110, -0.016377304596255398, 0.075291103710709320, -0.023198228349778773, 0.023943939740761016, -0.051449416855007570, 0.014503698608989065, -0.032740241606333810, 0.032597363432853130, -0.029659008593728440, 0.037295698256885286, -0.069179277754062200, -0.038411202827509570, -0.041440781071147334, 0.077751374886389630, -0.00046476612283898710, 0.034391009625173520, 0.0019308546075856839, -0.0074806183305274920, -0.053894336001029740, 0.050749458633737470, 0.018525730007267534, -0.045129016462472755, 0.0027017699152220073, -0.024906686832313785, -0.033324088214170470, 0.059924041058580690, 0.077405624278494680, 0.097073090355139890, -0.069603908958767280, 0.028537775231850738, 0.041880277594575950, -0.10348594357517843, -0.030283229508292334]::DOUBLE[]),
        |  (12, [-0.051432218222805755, -0.0063084465744073750, -0.049623535417360210, 0.018470060915206046, 0.0093304031666605770, 0.051962979717026870, -0.094126072854497020, 0.0064207272646925620, -0.0055855715427632355, -0.0049388667476212905, 0.092416347913036050, -0.033004602155608534, 0.033411900848702050, -0.039431326725653030, -0.0059843155587437490, 0.011192389498479808, 0.025720125180027902, 0.084533560680899480, 0.042898495428095180, -0.085233964472048100, -0.010400756767327525, -0.066784852339005870, 0.076217856830907630, -0.061936763612190560, 0.015883282010014863, -0.011643040484928986, -0.014122837639592252, 0.051067103792119620, -0.032405440706997704, 0.0012521143572688247, -0.048165406500324920, 0.017556348613610558, 0.062429300264583605, -0.046376877649843204, -0.014347241947155547, 0.012092476250616652, 0.031477969018811900, 0.066036140544343080, -0.0049728131022920500, 0.032658733356909615, 0.010877515067991905, 0.0071472608193255670, -0.046948505000909960, 0.0010429796878455504, -0.0078052037709203540, 0.016379733848255074, -0.022686252880172750, 0.0023389467496237226, 0.079298778606828090, -0.027860021932181223, 0.010237812750619246, 0.024232820602677264, -0.025651566777716097, 0.054294101241185010, -0.017536654024287180, 0.020878541717453460, -0.066560566676426830, 0.087093088541764400, -0.071987979577025350, 0.046227775261975110, 0.037307282106521705, 0.010377810860503923, -0.019602333863259530, 0.088936317708231930]::DOUBLE[]),
        |  (13, [-0.10986620818271321, 0.011289771794831701, -0.034135608427023680, 0.027400302861584410, 0.068065674367560470, 0.010884165097258853, 0.016913971718346212, -0.018320240935899484, 0.032279423335441246, 0.078387086804381580, 0.081142696703233600, -0.019816826791137450, -0.061204409806565475, 0.047210347230748975, 0.00064492015014774710, -0.049442690259119370, 0.075090445406747900, -0.028733012535398044, -0.043321836058809515, -0.030406536441330893, -0.036282733558361036, 0.056826125677106930, -0.021672266864470546, -0.020767085609367648, -0.078661813276679000, -0.015448378578836814, -0.020992027769284344, 0.046747656002308200, 0.043545527741538796, -0.0046015797360079500, 0.0038197303358083017, -0.067634985060103820, 0.064048578684468070, -0.047740192807437570, 0.0075563598413310290, 0.052280178714652500, 0.047158168414474070, 0.0082767117209324500, -0.012013682826709947, 0.037568444703006500, 0.053045792403980545, 0.031533492283880170, 0.018353508786390270, -0.0054188611791818360, -0.040765884893122405, -0.056645286172989070, 0.022036963018847920, -0.056072804820244286, -0.055800897849662530, 0.024019805089791537, 0.013817128234716090, -0.010599238982223163, 0.062995473352407420, -0.030381654472269207, 0.011413567657759405, -0.026020751374097126, -0.082215382869093050, 0.033747912004874744, 0.023457498572788334, -0.023671820014005175, 0.010530055485716257, 0.066600320231463090, -0.028361357997634257, -0.011391453600714035]::DOUBLE[]),
        |  (14, [0.089949138033958970, 0.030048516780037900, 0.0048900381022430744, 0.015559563329468593, -0.0065428693733370830, -0.017542139490150700, -0.028444150413880473, 0.080650083009552450, -0.072083078330212700, -0.047939956098268420, 0.010713035995169743, -0.019288504829302933, 0.0064174063525455000, 0.014976435785417982, -0.029649081412913820, 0.070946870666186430, -0.038997735593473554, 0.024856835537844420, -0.017786150918862393, -0.070812936709526100, -0.0041585328860195870, 0.011081656322513697, 0.056450930060534970, -0.017860366452281680, -0.042977924136330926, 0.0071011704971063970, -0.037965445658892990, 0.043267176887004460, 0.0012221258948740350, 0.0024781072869718890, 0.080903937888546590, -0.00088106210401770460, -0.046722748672557400, -0.0046055808904852434, 0.068292248309208780, 0.029857866033370010, -0.10315799730090800, -0.022380731902212233, 0.036952426699581370, 0.010221133801944608, 0.029214818996267230, -0.075528306015866620, 0.069338501570946000, 0.019846004850465090, -0.038368099025675350, 0.060734403474573560, 0.012038840543255817, 0.053689441865531270, -0.0060052293594489260, -0.053867235699913820, 0.047346079130057050, 0.057129271378819240, -0.034703678578425210, 0.00037356312290779694, 0.0015867490325133546, -0.014622506131395041, 0.048758758373446800, -0.019287263919296990, 0.00037942842141819994, 0.024121672225445770, -0.046313655931025330, -0.032420729126402300, -0.0069897203679073360, -0.011064867987229991]::DOUBLE[]),
        |  (15, [0.020865100343680363, -0.072383130272662410, 0.044607680995797885, 0.0046139588440696500, 0.056249447556719845, 0.035275712113886900, -0.12992670341625823, -0.090315479825634290, -0.00045106448659551290, 0.0098828298888998470, -0.022021968059940084, 0.022849236382110640, -0.0010630862071391670, 0.047297825515218760, -0.027300994844051600, 0.083103204458058450, 0.00030658045249274687, -0.088187723566006650, -0.013366792959576015, -0.010227536165564965, -0.023039185026220887, -0.0056862202963805980, -0.013263745291499407, 0.011664375759847254, -0.052761087173234904, 0.00028683767469290443, -0.0032587910940899380, -0.056968655311477774, 0.038385486971012360, -0.054394811054392210, 0.045537658426413836, -0.032890890889111915, -0.036172866996183155, -0.062037509538504670, 0.036384377528703340, -0.12400365552433712, -0.0083257866985067520, -0.036659740074444650, 0.038892202782032490, -0.036961527705272050, -0.052544955098899020, 0.034466625467643740, 0.0061147975890754784, 0.014413015124732195, 0.0043680933761700960, 0.0054251802320669550, -0.0026680365992975525, 0.022363420601956226, -0.039722208254682350, -0.0047596179305261940, 0.029005909779163428, -0.030739383386174435, 0.062691840339983110, 0.049193121636208405, -0.017615711007502876, 0.0041063408208569890, -0.026887660985977408, 0.036661804226275414, 0.044256674807480170, -0.025092613037758327, -0.068064896862766620, 0.0054355040227955070, 0.047443888024180880, 0.022033281580192472]::DOUBLE[])),
        |cb(s, bc, bctr) AS (VALUES
        |  (0, 0, [-0.046933751421323040, -0.14180979294090856, 0.10996852162655384, 0.087701178175621810]::DOUBLE[]),
        |  (0, 1, [-0.10246180324070712, 0.052720484634418270, -0.018844324713375120, 0.043710971654120294]::DOUBLE[]),
        |  (0, 2, [0.0051307584550162270, 0.081825432095323460, -0.087313027749635870, -0.14072084914103122]::DOUBLE[]),
        |  (0, 3, [0.090668492885435210, 0.0058465755919292890, 0.14245232704420044, -0.091216310184613580]::DOUBLE[]),
        |  (0, 4, [0.10654583481196088, 0.0015549617650304370, -0.097086695139540140, -0.042835775969147206]::DOUBLE[]),
        |  (0, 5, [-0.21786785690276470, -0.10538665619282670, 0.024134284892330698, -0.030604263222698942]::DOUBLE[]),
        |  (0, 6, [0.12081490928216232, 0.0085064183419437820, 0.038047397734711476, 0.12288887652813870]::DOUBLE[]),
        |  (0, 7, [0.21333060566747644, -0.039483060963153870, 0.032170621999743305, -0.054127618829523920]::DOUBLE[]),
        |  (0, 8, [-0.032920143216223450, 0.18789880381056700, 0.11104591983476472, -0.031299980835693130]::DOUBLE[]),
        |  (0, 9, [0.051515360794447095, -0.17500344703955384, -0.033822815145546510, 0.0039167649524191640]::DOUBLE[]),
        |  (0, 10, [-0.067310102192967430, 0.033636942774473820, 0.18551486163174040, 0.028425086257628816]::DOUBLE[]),
        |  (0, 11, [0.040036335977399355, 0.046814877475602014, -0.16805636408330550, 0.10813432164951389]::DOUBLE[]),
        |  (0, 12, [-0.061518658295845075, -0.050633101043703330, -0.041083641429695145, 0.20052025471525117]::DOUBLE[]),
        |  (0, 13, [-0.11186319047421485, -0.089083595941958330, -0.14076864665604522, -0.067412921449085030]::DOUBLE[]),
        |  (0, 14, [-0.0027562912181403070, 0.20914139282869712, -0.031015687775955100, 0.12211165505928073]::DOUBLE[]),
        |  (0, 15, [-0.064074612768650410, -0.0069940184101128270, 0.052021202874725620, -0.14253929007203087]::DOUBLE[]),
        |  (1, 0, [-0.093196849177814050, 0.15817724241832030, 0.033840706016138470, -0.058889417341903866]::DOUBLE[]),
        |  (1, 1, [-0.15015608412711565, -0.17308033020606245, -0.015500413574998624, 0.072989554759129300]::DOUBLE[]),
        |  (1, 2, [0.024761492305258707, -0.042152354890642674, -0.0033660160915932303, -0.034754865793466090]::DOUBLE[]),
        |  (1, 3, [0.13140994384559450, 0.058834438626071500, 0.087066028023528320, -0.13776137110288283]::DOUBLE[]),
        |  (1, 4, [-0.032981495902521810, -0.0045108503577067310, 0.10085018374545751, 0.14522365043858210]::DOUBLE[]),
        |  (1, 5, [-0.022291757821722620, -0.064409520044255200, 0.24302542477000388, -0.056884024029799064]::DOUBLE[]),
        |  (1, 6, [0.00024392506738456283, 0.012047446529736104, -0.094658578298052310, -0.18934164057113880]::DOUBLE[]),
        |  (1, 7, [0.034689382741247800, 0.090988256985795350, -0.063184222353346000, 0.16386988162206154]::DOUBLE[]),
        |  (1, 8, [-0.036151785665862704, -0.19598989416944582, -0.013324420459005356, -0.12160216498878190]::DOUBLE[]),
        |  (1, 9, [0.16813529941572702, 0.0095149610761967000, 0.097558242995690000, 0.053535105759745870]::DOUBLE[]),
        |  (1, 10, [0.090568355940930480, -0.19034841754232978, -0.033918682060214080, 0.13638500834053760]::DOUBLE[]),
        |  (1, 11, [-0.084618375298675390, 0.037975834260401970, -0.12759860642847187, 0.030223792789574370]::DOUBLE[]),
        |  (1, 12, [0.055127116128001180, 0.17301844636250002, 0.11256260589379345, 0.057003086565360700]::DOUBLE[]),
        |  (1, 13, [0.18889277782779450, -0.076574989474215620, -0.099605869121329280, 0.034834309414769020]::DOUBLE[]),
        |  (1, 14, [0.13383439785764340, 0.11640198363637416, -0.16216079842184822, -0.00098427936822497800]::DOUBLE[]),
        |  (1, 15, [-0.15082259255271374, -0.031069554726034390, 0.060568953096691600, -0.051855185002434810]::DOUBLE[]),
        |  (2, 0, [0.023191552236803168, 0.036976365226925274, -0.13258712436288778, 0.13498561742879550]::DOUBLE[]),
        |  (2, 1, [0.013860460096058848, -0.0060722805191136030, 0.11421771312958985, 0.17753390785877812]::DOUBLE[]),
        |  (2, 2, [0.091674532518797050, -0.16986642742259092, 0.024788096138837916, -0.021381700197437934]::DOUBLE[]),
        |  (2, 3, [-0.095668321596935670, 0.078896618933827900, 0.12545921348750083, 0.025633673020914214]::DOUBLE[]),
        |  (2, 4, [-0.11479646005321052, 0.18938025214031662, -0.053023551755891185, 0.15759067974001176]::DOUBLE[]),
        |  (2, 5, [-0.079556763456245020, 0.079845515898705460, 0.0042706309366237710, -0.20566047387384520]::DOUBLE[]),
        |  (2, 6, [0.13267825224676474, 0.16213508269466617, 0.012562163611891240, -0.053503406028610326]::DOUBLE[]),
        |  (2, 7, [-0.11585547635231311, 0.041499290295682556, -0.018466455967254942, 0.013296902463186011]::DOUBLE[]),
        |  (2, 8, [0.15386565752594916, -0.039488045374374700, -0.083491923623497510, 0.042415341430681040]::DOUBLE[]),
        |  (2, 9, [-0.029754130200801334, 0.14229327400448905, -0.14633658822575177, -0.064947755662108230]::DOUBLE[]),
        |  (2, 10, [-0.10225959586862882, -0.092744292873647880, 0.12770520980198097, -0.096440492922449130]::DOUBLE[]),
        |  (2, 11, [0.048049147387647060, 0.040111806376272055, 0.043149653601926060, -0.044701385204921215]::DOUBLE[]),
        |  (2, 12, [-0.048467711877366560, -0.082518137742304150, -0.14292452509606193, -0.015695489318558988]::DOUBLE[]),
        |  (2, 13, [0.097971294034073660, -0.078564829139122100, -0.062537550816920610, -0.15564964082026508]::DOUBLE[]),
        |  (2, 14, [0.12248970500986335, -0.063028197464737270, 0.22427555094130275, -0.088811142254514530]::DOUBLE[]),
        |  (2, 15, [-0.10713937617571631, -0.14786735276694113, 0.00086377231981613330, 0.10834622304733960]::DOUBLE[]),
        |  (3, 0, [-0.085604131265762880, -0.028349994068427890, -0.14738501014942917, 0.15690917381633280]::DOUBLE[]),
        |  (3, 1, [0.070477297235850970, 0.031546302985888265, 0.074700352297204080, 0.20560916231360635]::DOUBLE[]),
        |  (3, 2, [-0.0083484628452300100, -0.099183319621970980, 0.022736658139570074, 0.090501565713596130]::DOUBLE[]),
        |  (3, 3, [-0.18988103233618040, -0.046598526600895960, 0.026186532042345032, 0.0079419982537882900]::DOUBLE[]),
        |  (3, 4, [0.16864350675467218, 0.13789140722855453, 0.080306210020260030, 0.0064736961938594340]::DOUBLE[]),
        |  (3, 5, [0.074200916522950310, 0.16532829938483326, -0.090803965194475370, -0.096073161318639090]::DOUBLE[]),
        |  (3, 6, [-0.10013421312959318, -0.066980381526766690, 0.055957973467423190, -0.13303317857557326]::DOUBLE[]),
        |  (3, 7, [0.074603778648868630, -0.16393423394373420, 0.093032022218837680, -0.022350271773985655]::DOUBLE[]),
        |  (3, 8, [-0.085240696525761220, 0.21047299613013350, -0.013884249876213945, -0.0092584729287312880]::DOUBLE[]),
        |  (3, 9, [0.14932258071667423, -0.0087474087338296080, -0.10846240806950712, 0.071075318903285850]::DOUBLE[]),
        |  (3, 10, [0.0085809726155567210, 0.10998386434103287, -0.054633283891204940, 0.081311825262117720]::DOUBLE[]),
        |  (3, 11, [-0.093150536420862030, -0.026102652956441052, -0.16008697787061443, -0.079160400011259180]::DOUBLE[]),
        |  (3, 12, [0.035962349407064730, -0.16636904452656800, -0.094848421439906110, -0.031318815173860260]::DOUBLE[]),
        |  (3, 13, [-0.085605276452256860, 0.13208082886653447, 0.14361209503411299, 0.0056080051984073160]::DOUBLE[]),
        |  (3, 14, [0.014551780117394960, -0.0087003000642653960, 0.16946539540117692, 0.021926403447402577]::DOUBLE[]),
        |  (3, 15, [0.061461451689512960, -0.0046989712039147485, 0.049007922309064730, -0.14847093926531790]::DOUBLE[]),
        |  (4, 0, [0.011172741738474806, -0.088337824050705230, 0.095170431251888830, -0.088386552908501700]::DOUBLE[]),
        |  (4, 1, [0.033896099683397890, 0.034955472932280726, -0.028058668688130340, 0.14950942032187847]::DOUBLE[]),
        |  (4, 2, [0.035854503575852490, -0.0046139028533964320, -0.19984793411615215, 0.027086546130624695]::DOUBLE[]),
        |  (4, 3, [0.078614370515819580, 0.10004040040262813, 0.13692339161954625, 0.020078492028701773]::DOUBLE[]),
        |  (4, 4, [-0.0013984355591102257, 0.21101191476187800, -0.092964520732465180, -0.0069414946230297080]::DOUBLE[]),
        |  (4, 5, [-0.16548196098476134, -0.16256191876732864, -0.10657196165893348, -0.019861212804569983]::DOUBLE[]),
        |  (4, 6, [0.17130617338497340, -0.093041353097672970, 0.0055605099533859440, 0.0048559789699106580]::DOUBLE[]),
        |  (4, 7, [-0.0021848416375255175, 0.054401470202008737, -0.014194226896621780, -0.051979976603436740]::DOUBLE[]),
        |  (4, 8, [0.022877431070336160, -0.15310153866851892, -0.10885708144371477, 0.12210094040663316]::DOUBLE[]),
        |  (4, 9, [-0.10007768168571826, 0.13059281937407030, 0.016109229601739335, 0.040705035608599914]::DOUBLE[]),
        |  (4, 10, [0.0053163228119884560, -0.044205555153831205, 0.22394680399355146, 0.044613661761269324]::DOUBLE[]),
        |  (4, 11, [-0.14313726860779460, -0.045727890543853365, 0.064454677099711840, 0.053124227791295706]::DOUBLE[]),
        |  (4, 12, [-0.037718356870835040, -0.053774880372820610, -0.044169291418447450, -0.14485944193372868]::DOUBLE[]),
        |  (4, 13, [0.17234035527310018, 0.042541009200146356, -0.054049584891188240, -0.086773510884966130]::DOUBLE[]),
        |  (4, 14, [-0.040387969302110220, 0.060361089130821060, -0.22567552880745168, -0.29478508665731440]::DOUBLE[]),
        |  (4, 15, [-0.042563719494194140, 0.18435690963824160, 0.11046220817012384, -0.14730374258331938]::DOUBLE[]),
        |  (5, 0, [-0.083269020339994390, 0.22393113756956468, 0.019703821513221507, -0.00020649629995287422]::DOUBLE[]),
        |  (5, 1, [-0.18723075942252446, -0.023986311911180270, -0.056427179161154200, -0.087716108506230130]::DOUBLE[]),
        |  (5, 2, [0.035047099952372740, 0.068383929651344890, 0.071415165379275500, 0.042987998272714050]::DOUBLE[]),
        |  (5, 3, [0.050752351400759760, -0.13936793630030667, 0.0017326417536570576, 0.10924751313155230]::DOUBLE[]),
        |  (5, 4, [-0.11049295630438621, 0.0068021223396815830, 0.14612708494116713, 0.011906499602788289]::DOUBLE[]),
        |  (5, 5, [0.11907799128763029, -0.072146033078775390, 0.15290246211813946, 0.072081587101530330]::DOUBLE[]),
        |  (5, 6, [-0.029163344399308913, -0.10085282781496561, -0.12053883680676808, -0.026311177855146858]::DOUBLE[]),
        |  (5, 7, [0.095083620980237720, 0.020739466655092593, 0.13670351264736902, -0.16555570896010535]::DOUBLE[]),
        |  (5, 8, [-0.015168419683874643, 0.10947864637124541, 0.078332108492704720, 0.24880776836045365]::DOUBLE[]),
        |  (5, 9, [-0.031935886341734360, -0.14124428181788157, 0.075471515364087470, -0.071759021387931530]::DOUBLE[]),
        |  (5, 10, [-0.17939748399113095, -0.072928471981149710, 0.0017198550731451253, 0.20439038746270036]::DOUBLE[]),
        |  (5, 11, [0.14348548683079300, 0.12362688997565369, -0.047849457668996100, -0.058907611066450406]::DOUBLE[]),
        |  (5, 12, [0.063907019176263850, 0.052318619716597510, -0.16984380409043630, 0.076909081134026300]::DOUBLE[]),
        |  (5, 13, [0.17357774881759985, -0.050097458774918890, -0.070717383265393970, 0.030169254393999017]::DOUBLE[]),
        |  (5, 14, [-0.076550280407649570, 0.079099788467447350, -0.061076247095972940, 0.080060259632864210]::DOUBLE[]),
        |  (5, 15, [-0.013283682081333386, 0.043049841032649380, -0.0087763606864258970, -0.16458248172923223]::DOUBLE[]),
        |  (6, 0, [-0.040250257148373006, 0.14957128878474601, 0.19218273958214538, -0.082080339334786980]::DOUBLE[]),
        |  (6, 1, [0.047338949263319510, 0.16949139708632740, -0.10066692806460985, -0.067161307854801010]::DOUBLE[]),
        |  (6, 2, [0.0076670016374355745, 0.060611127212651536, 0.042593088811908180, -0.0074378114401042060]::DOUBLE[]),
        |  (6, 3, [0.15303840664296625, -0.0042034261444464320, -0.060690782604804070, 0.039668329920337184]::DOUBLE[]),
        |  (6, 4, [-0.016618479134765295, -0.12938371085281790, 0.11115331372704688, -0.11866323677366886]::DOUBLE[]),
        |  (6, 5, [-0.067717598528923450, 0.019888205182918330, 0.12159643665239318, 0.18498834085249424]::DOUBLE[]),
        |  (6, 6, [0.15096542055677967, 0.095124213056860200, 0.11210789171363283, 0.039641893093825660]::DOUBLE[]),
        |  (6, 7, [-0.042440725975031590, 0.24066212129676157, 0.014494359266799800, 0.067442178809231630]::DOUBLE[]),
        |  (6, 8, [0.0078663984055296720, -0.17901025234598314, -0.11348957452027243, 0.0079670371015535070]::DOUBLE[]),
        |  (6, 9, [0.076930556336607280, -0.16299336464698436, 0.079038510696788050, 0.087497615201034270]::DOUBLE[]),
        |  (6, 10, [-0.040815151151236760, -0.0065221209887663700, -0.11386386661782200, 0.0043445368777288070]::DOUBLE[]),
        |  (6, 11, [-0.20532997367146370, 0.072206302991530070, -0.087641278613720830, 0.015902704716637583]::DOUBLE[]),
        |  (6, 12, [0.14997175886033150, 0.012612245780404107, 0.0056655884937343140, -0.15976636808829955]::DOUBLE[]),
        |  (6, 13, [-0.13762932392400415, -0.091752110691422720, 0.062051963166812475, 0.0061140647219930770]::DOUBLE[]),
        |  (6, 14, [0.076267794119251540, 0.0096049186983126630, -0.12489669699461810, 0.17948280849915096]::DOUBLE[]),
        |  (6, 15, [-0.096061902586669430, 0.0094098682746585200, -0.052222812586687280, -0.19459610836111250]::DOUBLE[]),
        |  (7, 0, [-0.14132077441330146, -0.075733474155958400, 0.071023877949926660, 0.12312903702561079]::DOUBLE[]),
        |  (7, 1, [0.021284438695039046, -0.21791186259152703, -0.015695375863283186, 0.037815626533085490]::DOUBLE[]),
        |  (7, 2, [-0.064785460348363330, -0.084220247734685060, 0.0080710628496109650, -0.098599852659207760]::DOUBLE[]),
        |  (7, 3, [0.14200461414698512, 0.044827156417749654, -0.0087301951408918670, -0.098678760633060700]::DOUBLE[]),
        |  (7, 4, [-0.018767598783432038, -0.025307242414522268, -0.12257475952773286, 0.15012543488370753]::DOUBLE[]),
        |  (7, 5, [-0.0050450153630827470, 0.10526293952990799, 0.18919608111935285, -0.0059589127853443960]::DOUBLE[]),
        |  (7, 6, [-0.043179207540292750, 0.18406412744314887, 0.013843362687615810, 0.14106833528340650]::DOUBLE[]),
        |  (7, 7, [0.051703315234262616, -0.13358416692641242, 0.14246421783038900, -0.15724316099439656]::DOUBLE[]),
        |  (7, 8, [0.10804908324687412, -0.059505350809911220, 0.091712402801818930, 0.056797186358818204]::DOUBLE[]),
        |  (7, 9, [0.035602383807395270, 0.18242806901657760, -0.066870814447705000, -0.036238481031710484]::DOUBLE[]),
        |  (7, 10, [-0.13529568026346525, 0.0042561764631390070, -0.19480626067984289, -0.022917855708772507]::DOUBLE[]),
        |  (7, 11, [0.047097976646536810, 0.033655712315483054, -0.15384406717166180, -0.23859377728188670]::DOUBLE[]),
        |  (7, 12, [-0.056306638305873014, 0.017760071265626863, 0.023970590515591507, -0.0037538837176325790]::DOUBLE[]),
        |  (7, 13, [0.10359422940478948, 0.070634223634133990, 0.0037947591972172260, 0.12326275125968465]::DOUBLE[]),
        |  (7, 14, [-0.18222692474781466, 0.095925672729833780, 0.075751581370230680, -0.11826888636428588]::DOUBLE[]),
        |  (7, 15, [0.13199741503641937, -0.11649687749472312, -0.13762068221445495, -0.034063516211071330]::DOUBLE[]),
        |  (8, 0, [-0.075214318785014200, 0.051322358141738036, 0.0068780679852228210, 0.16688089051284810]::DOUBLE[]),
        |  (8, 1, [0.11523067625631620, -0.020270693663303384, -0.048993420098525545, 0.16165776209862350]::DOUBLE[]),
        |  (8, 2, [-0.0086146892662251700, -0.16316351054459566, -0.11905204178737154, -0.030508766516134390]::DOUBLE[]),
        |  (8, 3, [0.095800686236840700, -0.12778764706675128, 0.093323072234740400, -0.036610489388620236]::DOUBLE[]),
        |  (8, 4, [-0.076680903276459380, 0.069718471417359150, -0.038847980747118870, -0.075531449642775360]::DOUBLE[]),
        |  (8, 5, [-0.044627401308570410, 0.057093648235508890, -0.15291358722695725, 0.063422292889850370]::DOUBLE[]),
        |  (8, 6, [0.061441262119298370, 0.13466049984885012, 0.17070856037048818, -0.081922627852899580]::DOUBLE[]),
        |  (8, 7, [-0.069905094007383320, 0.0034132842898061740, 0.14247093427901195, -0.17321489151363662]::DOUBLE[]),
        |  (8, 8, [0.028918511879703564, -0.051384448167957910, -0.076220685961671020, -0.19342000215019028]::DOUBLE[]),
        |  (8, 9, [0.12468584974578037, 0.077574752049544960, -0.035832367472703845, -0.063968412820814900]::DOUBLE[]),
        |  (8, 10, [0.016447665385911636, -0.036147696688513230, 0.0063210090123687880, -0.00028198971544810827]::DOUBLE[]),
        |  (8, 11, [-0.095683691838627610, -0.13589312062137440, 0.088412426561331830, 0.12183013728240316]::DOUBLE[]),
        |  (8, 12, [-0.21521637100776586, 0.066205363276835850, 0.0098162837579344480, -0.071994584767182730]::DOUBLE[]),
        |  (8, 13, [0.074812063713057510, 0.25085581316812500, 0.0012698154455775012, 0.033466448080734240]::DOUBLE[]),
        |  (8, 14, [0.042821426382126700, 0.021478331018856045, 0.16547071258628070, 0.067163619239091740]::DOUBLE[]),
        |  (8, 15, [-0.18536899288547784, -0.11400965670621793, -0.061061235818835600, 0.017226708905727150]::DOUBLE[]),
        |  (9, 0, [-0.15094970170647656, 0.10011102790456737, -0.091190019879046580, -0.034938894304155886]::DOUBLE[]),
        |  (9, 1, [0.064350281497126960, -0.14016281316054904, -0.20429804078972824, 0.066129371399389440]::DOUBLE[]),
        |  (9, 2, [-0.12376419513055514, 0.098318513908617950, 0.077758053183894420, -0.097216241301539300]::DOUBLE[]),
        |  (9, 3, [-0.062538424574353140, -0.12005336362736851, 0.094753750837215950, 0.052286071855076034]::DOUBLE[]),
        |  (9, 4, [-0.065565242727427090, 0.17243544654614595, 0.034449553611131490, 0.16468238791099607]::DOUBLE[]),
        |  (9, 5, [-0.071915301999367020, -0.058654354790962660, 0.17085029661809126, -0.10964758986730565]::DOUBLE[]),
        |  (9, 6, [0.14335704089216542, 0.00091605894366085900, 0.080615865047613560, -0.012481362179615482]::DOUBLE[]),
        |  (9, 7, [-0.039556162953638070, -0.065324152511601420, -0.094714208772891230, -0.12864684841797980]::DOUBLE[]),
        |  (9, 8, [-0.16829891714083970, -0.10886450646121341, -0.052811125646383156, 0.15847035615333135]::DOUBLE[]),
        |  (9, 9, [0.085933212131408200, 0.037028799745303494, 0.047711516302724036, -0.17289409064335506]::DOUBLE[]),
        |  (9, 10, [0.071243059733193630, 0.16876947591906227, -0.15531211389640460, -0.0077774936189914500]::DOUBLE[]),
        |  (9, 11, [-0.015709590612076156, -0.0081655791916276000, -0.031891310298799290, 0.067265991797725240]::DOUBLE[]),
        |  (9, 12, [0.043250775863259480, 0.074286564021873240, 0.20208307413160062, 0.096637214139111970]::DOUBLE[]),
        |  (9, 13, [0.11592808900429158, -0.12756699460761406, -0.033008758912266796, -0.026108170742293903]::DOUBLE[]),
        |  (9, 14, [0.012382561440764700, 0.11987197517188271, 0.011833153284798208, 0.0042996215407710890]::DOUBLE[]),
        |  (9, 15, [0.10026395770732503, -0.040485406330724526, -0.0088572223399913940, 0.18434514721351064]::DOUBLE[]),
        |  (10, 0, [-0.066774817008684780, -0.19241967993910497, 0.020030712551588167, -0.013279941134526569]::DOUBLE[]),
        |  (10, 1, [0.035696771848000430, 0.061160791153137610, -0.082660795846609290, -0.13282387304123447]::DOUBLE[]),
        |  (10, 2, [0.10835734470237261, -0.13953645566002576, -0.093263467293365950, -0.012161799808253989]::DOUBLE[]),
        |  (10, 3, [0.13944678407462710, 0.10986229014174550, -0.016186070908075250, 0.016988212076661728]::DOUBLE[]),
        |  (10, 4, [-0.11290365999235503, 0.12823973563236770, -0.00032234206844737650, -0.082452424368112310]::DOUBLE[]),
        |  (10, 5, [-0.11744710266041754, 0.054824705194365955, 0.22048391229032502, 0.047647116305537814]::DOUBLE[]),
        |  (10, 6, [0.12472092207616688, -0.052967014010796454, 0.012036676376776984, -0.16952295439426850]::DOUBLE[]),
        |  (10, 7, [-0.17250930207824655, -0.043763367990981655, -0.086174073282794930, -0.10736405997886646]::DOUBLE[]),
        |  (10, 8, [-0.12314647273108463, -0.027994168405425760, 0.014530934429598538, 0.044435591379614670]::DOUBLE[]),
        |  (10, 9, [0.029810308498286562, -0.11235538170602029, 0.16370458300613377, -0.048075504710483774]::DOUBLE[]),
        |  (10, 10, [-0.045619035377537170, -0.11221536669190396, -0.046942460544159630, 0.17936762612895957]::DOUBLE[]),
        |  (10, 11, [0.060308694438858210, 0.084459489425037460, 0.15756220431020523, -0.055361840391148845]::DOUBLE[]),
        |  (10, 12, [-0.0069673158404278300, 0.12787706068374197, -0.17944825302008433, 0.011385636594127734]::DOUBLE[]),
        |  (10, 13, [0.11226431600488143, -0.022928270488058920, 0.049939013106451935, 0.14823977489461680]::DOUBLE[]),
        |  (10, 14, [-0.039350050279082670, 0.18685777948632962, 0.032478746447052405, 0.075054348203872120]::DOUBLE[]),
        |  (10, 15, [-0.026997568793913403, -0.021671908284481390, -0.16322118455609100, 0.11119836427049969]::DOUBLE[]),
        |  (11, 0, [-0.073291708806333370, 0.11151238042456095, 0.12092445805539828, 0.0048468489278072130]::DOUBLE[]),
        |  (11, 1, [0.15078613714184180, -0.041480805847772875, 0.014795496615292423, 0.080485897978073100]::DOUBLE[]),
        |  (11, 2, [0.029146961497155566, 0.028519947810318542, 0.17814565071439425, -0.15583822318946988]::DOUBLE[]),
        |  (11, 3, [0.060379326275639500, -0.095780817423115050, 0.022190632432926957, -0.16095154717014454]::DOUBLE[]),
        |  (11, 4, [0.11093283998162412, 0.14921491870762152, 0.023884065578743015, -0.047650891588801605]::DOUBLE[]),
        |  (11, 5, [0.14659083040763626, 0.042334218268813550, -0.14030007996021235, 0.046393028825965250]::DOUBLE[]),
        |  (11, 6, [-0.10787717452488989, -0.096283525428932200, 0.076889833211228540, -0.041300383522577650]::DOUBLE[]),
        |  (11, 7, [-0.13376960280266740, -0.016319303430590536, 0.074650720745613240, 0.14595465184862280]::DOUBLE[]),
        |  (11, 8, [0.11895531280263723, -0.098006626160968830, 0.13728747392196400, 0.031413809900694100]::DOUBLE[]),
        |  (11, 9, [-0.20609131884412020, 0.054827207629595680, -0.087585263028359530, -0.014964019542226860]::DOUBLE[]),
        |  (11, 10, [0.055398510913763800, 0.068065826566092530, 0.11303449484944263, 0.11373507003619238]::DOUBLE[]),
        |  (11, 11, [0.0024481741794959012, -0.14012333410056993, -0.065221817942820120, 0.17221784853057830]::DOUBLE[]),
        |  (11, 12, [-0.046005552040781640, 0.12229406422430718, -0.10248711188933220, 0.11033605896727935]::DOUBLE[]),
        |  (11, 13, [-0.051363723193825095, 0.081600721246064740, -0.068449626224661980, -0.15906362820601855]::DOUBLE[]),
        |  (11, 14, [-0.032097354887062950, -0.18094483169811512, -0.10602595663844928, -0.039100742124070435]::DOUBLE[]),
        |  (11, 15, [-0.023364586574018156, -0.0031583263040321306, -0.054442487139975600, 0.016479967027317965]::DOUBLE[]),
        |  (12, 0, [-0.10491661866539793, -0.18656137931152508, 0.066214468551982200, -0.026096600913893540]::DOUBLE[]),
        |  (12, 1, [-0.12735918376762112, -0.058533488761754840, -0.092797805150802520, -0.0022240574739178280]::DOUBLE[]),
        |  (12, 2, [-0.16373879987412465, 0.010211129634524089, 0.10311984963736702, 0.050502125915590790]::DOUBLE[]),
        |  (12, 3, [-0.047759133017237530, -0.16035185299288920, -0.16074613780875980, -0.13709358940392890]::DOUBLE[]),
        |  (12, 4, [0.16510785454330157, 0.077521168964023860, -0.15450723995787766, 0.10548096091495356]::DOUBLE[]),
        |  (12, 5, [-0.030580278754981594, 0.077009208457808940, 0.030309758711106676, 0.13082973204403833]::DOUBLE[]),
        |  (12, 6, [0.063800101336273510, -0.11951648213627930, -0.080421224872841830, -0.019962224976167765]::DOUBLE[]),
        |  (12, 7, [0.044519374261615210, -0.038019682119948724, 0.12743165926959402, 0.0085823281912071580]::DOUBLE[]),
        |  (12, 8, [-0.096780364088336980, -0.028034633918517640, -0.13613992445320988, 0.16789503154254565]::DOUBLE[]),
        |  (12, 9, [0.16265561553018446, -0.18106491431070890, 0.076971998509335990, -0.084134184647793350]::DOUBLE[]),
        |  (12, 10, [0.089686413088156700, 0.010990101860622036, -0.071329762889330130, -0.14564991854171322]::DOUBLE[]),
        |  (12, 11, [-0.045287558543445630, 0.071892641577842880, -0.13442034426867097, -0.021086213411769427]::DOUBLE[]),
        |  (12, 12, [-0.0023506838698365137, 0.17969220753516962, 0.090485028383544430, -0.029032214245020414]::DOUBLE[]),
        |  (12, 13, [0.056507142652517675, -0.12581082437721358, 0.063535061471062930, 0.17364302350093214]::DOUBLE[]),
        |  (12, 14, [-0.036118156634409350, 0.027430315018909638, 0.037139220760460950, -0.17317976570398935]::DOUBLE[]),
        |  (12, 15, [0.17170216989460100, 0.092848331245452750, 0.053694076443290560, -0.036345726291855940]::DOUBLE[]),
        |  (13, 0, [0.043617303387941994, -0.020813634513538123, -0.051235003829965690, -0.067480888828337220]::DOUBLE[]),
        |  (13, 1, [0.11424479065725611, -0.099034172205030500, 0.047933362228607550, 0.14047302900820957]::DOUBLE[]),
        |  (13, 2, [-0.16020498774418263, 0.12270885244155928, 0.016404587633552715, 0.072580480961761710]::DOUBLE[]),
        |  (13, 3, [-0.089717994876940380, -0.00091141035467764360, 0.20983292828700656, 0.078216335646910580]::DOUBLE[]),
        |  (13, 4, [0.13175126063115030, -0.077363879269383050, 0.051474699917208630, -0.17549475648445978]::DOUBLE[]),
        |  (13, 5, [-0.072611810818382110, 0.085745853842990850, -0.13700516532544876, -0.11685874058884847]::DOUBLE[]),
        |  (13, 6, [0.025082416794900086, 0.16867044811906906, 0.056663969271667860, 0.049527538183159360]::DOUBLE[]),
        |  (13, 7, [-0.072955817329173860, -0.16925510061435864, -0.050659025525778170, -0.074684065964833640]::DOUBLE[]),
        |  (13, 8, [0.12107364765893185, -0.13833918596040531, -0.18478667134734936, 0.031270142676498190]::DOUBLE[]),
        |  (13, 9, [0.066155382896168370, -0.096514340785101610, 0.087110373349191500, 0.0081711470091828420]::DOUBLE[]),
        |  (13, 10, [-0.060285427878144480, -0.058868779671611020, -0.16091890706415704, 0.13783903683024004]::DOUBLE[]),
        |  (13, 11, [0.16708934157314492, 0.050583554136961015, -0.11651975912992911, -0.0072812327030349604]::DOUBLE[]),
        |  (13, 12, [0.12492248777633072, 0.067628011528085720, 0.11186358402095652, -0.059487325965016255]::DOUBLE[]),
        |  (13, 13, [-0.062853754846832950, 0.071015497592805290, 0.085153029226400970, -0.15799310943969797]::DOUBLE[]),
        |  (13, 14, [-0.15646085681696986, -0.057878282150599660, 0.034031450210863456, 0.034100143003839005]::DOUBLE[]),
        |  (13, 15, [0.030980208460199592, 0.036501878869190320, -0.039847568530997066, 0.13776258923630286]::DOUBLE[]),
        |  (14, 0, [-0.16647847047062436, -0.0038348872188705696, 0.069846930350400570, -0.085277543762399490]::DOUBLE[]),
        |  (14, 1, [-0.066875902676461360, -0.083988490968678660, 0.12513784091118190, 0.14462607511781522]::DOUBLE[]),
        |  (14, 2, [0.12707272219440288, 0.038919734650971524, -0.15230211595799592, -0.12423898266650610]::DOUBLE[]),
        |  (14, 3, [-0.093085515760479210, -0.069559723339445360, -0.14296412754102028, -0.057986759855092820]::DOUBLE[]),
        |  (14, 4, [-0.16664622597064450, 0.087382602549391050, -0.078460941205401500, 0.085670751997465220]::DOUBLE[]),
        |  (14, 5, [0.10686471802481402, -0.073531117108204040, -0.10462687961252869, 0.087140083169555600]::DOUBLE[]),
        |  (14, 6, [0.0098726728637826450, 0.046395580665237200, 0.25558526370065770, -0.018566231874865193]::DOUBLE[]),
        |  (14, 7, [-0.0095178783527023680, 0.076042267560648700, -0.069960462391466610, -0.0081231869334256540]::DOUBLE[]),
        |  (14, 8, [0.12084588440957585, 0.14700759650500410, 0.052387995290435294, 0.026201214994253208]::DOUBLE[]),
        |  (14, 9, [0.16446938226718540, -0.064425592728217820, 0.022076549744510864, -0.058895578529819520]::DOUBLE[]),
        |  (14, 10, [-0.074235157895309860, 0.10074598088437786, 0.093728458669311070, 0.074131834994833920]::DOUBLE[]),
        |  (14, 11, [0.0025506875716955458, -0.19748920390975858, -0.010427546858137252, -0.045520158112854654]::DOUBLE[]),
        |  (14, 12, [-0.014565756086075975, -0.047924847309119200, 0.072475890298013530, -0.083100409875592130]::DOUBLE[]),
        |  (14, 13, [-0.0028136861902614504, 0.12168864346848039, -0.011313122298501888, -0.18680937205765620]::DOUBLE[]),
        |  (14, 14, [0.10083736419254051, -0.047435712561119510, 0.074181166337496130, 0.12760124686243632]::DOUBLE[]),
        |  (14, 15, [-0.051834148665982740, -0.026543354080314392, -0.10443830370339403, 0.14448416425801047]::DOUBLE[]),
        |  (15, 0, [-0.0022032604384075263, -0.062625650854178100, 0.050072127056267860, -0.26740974758772235]::DOUBLE[]),
        |  (15, 1, [0.0085789357801904190, -0.014226968237876754, 0.21484606286947142, -0.039560143464345050]::DOUBLE[]),
        |  (15, 2, [0.030384419551390110, 0.13046888760930770, 0.050582818635626690, 0.058785746802472120]::DOUBLE[]),
        |  (15, 3, [0.10609357851686275, -0.018901880830659846, -0.098760278503039690, 0.0071901611201707480]::DOUBLE[]),
        |  (15, 4, [-0.0025907714936471330, 0.17175866374108745, 0.046489297826390470, -0.10987583914672859]::DOUBLE[]),
        |  (15, 5, [-0.014367148800965566, 0.13648254121030940, -0.14569693976838644, -0.0059532252544110760]::DOUBLE[]),
        |  (15, 6, [-0.044533440978763180, -0.083966408617101040, 0.10503404172151772, 0.049275832071775970]::DOUBLE[]),
        |  (15, 7, [0.18185056719350848, 0.043233144260807314, 0.025186212872889740, -0.044896934276864990]::DOUBLE[]),
        |  (15, 8, [-0.0083316159364945820, 0.032853674591891674, -0.14362051782910792, -0.16790920090054350]::DOUBLE[]),
        |  (15, 9, [-0.035638849116387226, -0.0017693904778554417, -0.016368904833746230, -0.099671343944030600]::DOUBLE[]),
        |  (15, 10, [0.071904325075698450, -0.088290345154604950, -0.091221090328239120, 0.17935323050031313]::DOUBLE[]),
        |  (15, 11, [0.064065875261293510, -0.18620854101617834, -0.010276670485616854, -0.057797737414419140]::DOUBLE[]),
        |  (15, 12, [-0.12734891826160363, -0.078007875565152790, -0.10133337676677996, 0.028148171334978923]::DOUBLE[]),
        |  (15, 13, [0.088193017258828280, 0.029766686851726124, 0.11181781229204571, 0.14801187823602124]::DOUBLE[]),
        |  (15, 14, [-0.092935176326641870, 0.015977220546199614, 0.015571409335128896, 0.17672161673350403]::DOUBLE[]),
        |  (15, 15, [-0.20078788029954225, 0.024300206720834830, 0.022911973499683807, -0.054796262418478380]::DOUBLE[])),
        |a AS (SELECT u.vec_id, cc.cell,
        |    ROW_NUMBER() OVER (PARTITION BY u.vec_id
        |      ORDER BY list_distance(uv, ctr), cc.cell) AS rnk
        |  FROM u CROSS JOIN cc),
        |cells AS (SELECT vec_id, cell FROM a WHERE rnk = 1),
        |res AS (SELECT u.vec_id, cl.cell,
        |    list_transform(generate_series(1, 64), i -> u.uv[i] - c2.ctr[i]) AS r
        |  FROM u JOIN cells cl USING (vec_id) JOIN cc c2 ON c2.cell = cl.cell),
        |encd AS (SELECT res.vec_id, res.cell, cb.s, cb.bc,
        |    list_sum(list_transform(generate_series(1, 4),
        |      j -> (r[cb.s * 4 + j] - bctr[j]) * (r[cb.s * 4 + j] - bctr[j]))) AS d2
        |  FROM res CROSS JOIN cb),
        |enc AS (SELECT vec_id, cell, s, bc AS code FROM (
        |    SELECT vec_id, cell, s, bc,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, bc) AS rnk
        |    FROM encd) WHERE rnk = 1),
        |probes AS (SELECT vec_id AS query_id, cell FROM a WHERE vec_id < 8 AND rnk <= 6),
        |qres AS (SELECT p.query_id, p.cell,
        |    list_transform(generate_series(1, 64), i -> u.uv[i] - c2.ctr[i]) AS r
        |  FROM probes p JOIN u ON u.vec_id = p.query_id JOIN cc c2 ON c2.cell = p.cell),
        |qlut AS (SELECT q.query_id, q.cell, cb.s, cb.bc,
        |    list_sum(list_transform(generate_series(1, 4),
        |      j -> (q.r[cb.s * 4 + j] - bctr[j]) * (q.r[cb.s * 4 + j] - bctr[j]))) AS d2
        |  FROM qres q CROSS JOIN cb),
        |pair AS (SELECT l.query_id, ec.vec_id AS neighbor_id, SUM(l.d2) AS adist
        |  FROM enc ec JOIN qlut l ON l.cell = ec.cell AND l.s = ec.s AND l.bc = ec.code
        |  WHERE ec.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        |  FROM pair)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // The IVFADC replay above + exact-cosine re-rank of each query's
    // top-64 ADC shortlist.
    "q_similarity_ivfpq_refine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS uv
        |  FROM e),
        |cc(cell, ctr) AS (VALUES
        |  (0, [-0.029647921449040663, 0.022591227551941012, -0.050224233735827774, 0.0055495760947127840, -0.050814233870624816, -0.013243826454324092, -0.0071346718342410790, -0.017274321288120000, -0.020772087994589960, -0.062697202571580570, -0.0064932233768894060, -0.018087499542542100, -0.059497491152962400, -0.029687898488398975, -0.022437686597278565, -0.081902440554351640, -0.023731325996745380, -0.027826328729332610, 0.030134769504679866, 0.015747920830698054, 0.0043024920691457030, -0.016344941810941958, 0.013196314564122100, 0.046448886277278480, 0.066773044348591810, 0.043898425273959820, 0.0067018738058201230, -0.034687889739340440, -0.011286857837536354, -0.029509170565637280, 0.028575274565815900, -0.018900227691767020, 0.035379471687558520, -0.028058580459595597, 0.0026966828163923380, -0.051661442105554890, -0.050542393068864900, -0.042527695021781920, -0.028587060551814043, -0.0055173898794267020, 0.013850163982505643, 0.041055198182015230, 0.055036903249102945, -0.055877073762119000, 0.015629877567566546, 0.044605501452065310, 0.031566478411684265, -0.030437544781449870, 0.041316395696013190, 0.034950055404657225, -0.024182471431135187, 0.019539490863702574, 0.0030935182119666014, -0.048513667771627980, -0.096124355437398680, -0.046742681998915010, 0.048917838609353820, -0.016760238452586380, 0.033743963581947325, 0.041385525918040740, -0.039100627085925730, 0.046587574325254980, -0.014625397492380584, 0.0037834268155730287]::DOUBLE[]),
        |  (1, [0.0054231678316132800, -0.012822579107721268, -0.014747213630607213, -0.031923099879736815, 8.0432442389326590e-05, 0.067592237645187780, 0.016396934983612124, 0.030838371748530810, 0.075361344200407880, 0.080659890181341880, 0.048821852745847480, 0.062278146948031535, 0.013235118283479388, 0.011429049805778742, 0.065062234833440500, 0.0086893483445106520, 0.020376929749953903, 0.015109134280399497, -0.0083652732767849940, -0.033347706914911894, -0.025354957572507462, -0.010845123709754163, -0.024288328386401707, -0.0061390724443633160, -0.018854902532577760, 0.019975619653851244, -0.0096266853365283080, 0.027424432521539626, -0.023367495195376658, -0.058220004076280000, 0.033533418596506444, 0.025518577112393366, 0.053767058872124520, -0.034418508693379360, 0.00039382966917350166, 0.0057262249707925520, -0.035497676130010060, -0.035055086909587430, 0.028936789092844972, 0.014132208045499890, -0.035238182010071990, -0.025320181739921604, -0.015431616739789360, 0.044590869871341130, 0.011206350233669098, -0.067704006969619980, 0.024611843397624414, 0.095469723530261440, -0.027502840741476140, -0.0018147861279036333, 0.023673562281596335, -0.026095478934510714, 0.035281200998325900, -0.027726475385818200, 0.017603131922574563, 0.048547140996394500, -0.046947582065863570, -0.070945555798730520, -0.026765056155018736, -0.11021608239954304, 0.024546649215412340, -0.028222573702781847, -0.066392437045600450, -0.058018802145837550]::DOUBLE[]),
        |  (2, [0.016026937748226392, 0.11885779860784836, -0.024600073906639420, -0.016969727135985463, 0.028987539733133845, 0.0020067465049765387, -0.054888524931464476, 0.066727486357963920, 0.037942958663525360, -0.035881977564606950, -0.045032640843027860, -0.029062966830274126, 0.025244743016908100, 0.0037832451463821115, 0.016455155043517410, 0.066037101043715190, 0.050197752722338720, -0.024471147404454730, -0.018487761373744110, -0.083056028085455670, 0.034250319851192550, 0.0097828571422694970, 0.021619418216388752, -0.034428292271698090, 0.0060676468677977960, -0.018685974293042090, -0.020985567924280715, -0.013414951055419249, -0.021280163980557567, -0.050584243815445950, -0.0014949167834283558, -0.024739391345246470, -0.056812757826272130, -0.034053060722700150, -0.060205535111676194, -0.031710001866574250, 0.039472247959387300, 0.030215655639544068, -0.012982718994981424, -0.031149158577262090, 0.018401382422348500, -0.022457406994424868, -0.038989029362457010, -0.068587187117613230, 0.013767843213098246, -0.036016391534208096, 0.0012251035053926138, 0.066563844387474650, -0.015854493159863557, -0.040221975141589130, -0.040108742980548354, -0.041752452527614630, -0.032263272009916896, -0.0035566268689654324, 0.058352550732959606, -0.010139969530158091, -0.017256656556860397, 0.024253817924616193, -0.052976757654168210, -0.025670816270391313, -0.042127811478261340, -0.097757371362353250, 0.077746087847268840, -0.039227993564877330]::DOUBLE[]),
        |  (3, [0.024066221323009986, -0.051222032993315520, 0.032110780072197200, 0.014941746624570052, 0.0047441633826229790, -0.017957552711141904, -0.049423191550667220, 0.028013323946302744, -0.023302000759014892, -0.029385742763576354, 0.0073434189294371740, 0.012634488735335354, -0.0011325097252666760, -0.057028822624577630, -0.0045422801134861490, -0.020196014302048890, -0.035502672566887890, -0.053608428636152120, 0.019643112056689510, 0.010199397273827302, -0.096405433184596950, 0.010331904982119538, -0.0018491701162578213, 0.034657790683657760, 0.059274671371593260, 0.059267135819457240, 0.058582365787323840, -0.0026300112390851573, 0.075930340874064210, 0.063694642337216010, -0.019695278511459628, 0.10423876718128344, -0.031258231954605390, -0.017892090245514056, 0.020230218167148675, 0.027075234420588307, -0.061881705120894800, 0.054498482389234690, -0.064423683412074770, 0.0094440202829588410, 0.013838095088450303, -0.024290946636017816, -0.0010631209213067590, 0.026832047428885272, -0.044171191844455480, 0.013502732245244820, 0.019626776642200520, -0.0040154521584611580, -0.11029863416947377, 0.013100210575778372, -0.0024926674443572546, 0.014324542184407100, -0.034572067348135394, -0.032527352503555590, -0.026860494781597362, 0.044021055109130840, 0.0094611377350574070, 0.016231864496930353, -0.14271770367012895, -0.026461555275173870, 0.026849700709156835, -0.035561341107701455, 0.021146720562926755, 0.036472843498674770]::DOUBLE[]),
        |  (4, [0.024599188748134777, -0.013862250208097641, 0.016765254557215944, -0.030377661866195012, 0.052957828333253874, 0.042435372160211810, -0.0048678819346133450, -0.066685740718145270, 0.030947012119295220, -0.019288729391777115, -0.028509245672330890, 0.068592799005237150, 0.051106576412291520, 0.053262458019114440, -0.0033097883421820260, 0.033415019109204684, -0.063072231892630990, 0.097805785301323460, -0.054755372137170870, 0.014325436300942620, 0.0087297952503493370, -0.0095927314178518160, -0.035207218946875890, -0.050066260797743180, -0.027209490029287155, 0.041234673100209290, -0.029381374615592783, -0.024582348317585236, -0.040735672783522330, 0.027616022561399868, -0.0017813529193596478, -0.057429572943155700, 0.024290230775312747, 0.046992166661200690, -0.043115660023178090, 0.010273373588522941, -0.041518692458881054, 0.048448260835114950, -0.042806126281460330, 0.021279251100444617, 0.0042626815595332420, -0.093579858699786100, -0.0033557721217184985, 0.0064116226236358970, 0.0080682138525903190, 0.021165008162770310, 0.010581490364369527, -0.042280340262928234, 0.012534006119257882, -0.095978866822702530, -0.0071824173096687490, 0.021735117439400188, 0.019421415541498035, 0.038703931099193820, 0.0010206628975074844, 0.0077266036670802210, 0.019855608914224936, -0.0055470777372517330, 0.061857027939684680, -0.021003104131154342, 0.057589801746460830, -0.048391242882534290, 0.025950152111320970, -0.0074239614519610800]::DOUBLE[]),
        |  (5, [-0.040680154103034920, 0.0071982399645772145, 0.065609393159147270, 0.023041778635976548, 0.0035501449061990102, -0.017372875243193950, -0.021398409536361710, 0.061189066797611160, -0.020494287020027934, 0.050096131911192290, -0.050810854012198470, 0.059731211662609660, 0.041046781810642086, 0.0021306949407077875, 0.10256833391079642, 0.019861740542696262, -0.016214974179037382, -0.049434488505653150, -0.030542765994539170, 0.026220603090256044, -0.0094308055653408820, -0.017416274354215864, -0.051558158435323680, -0.0016133758856317660, 0.050807755133629420, -0.0010356048822724561, -0.039118332835787320, -0.011974980798342734, -0.028498165687556400, -0.0015776812863416690, 0.035238023034880920, -0.024204746091519810, 0.060992852662452954, 0.057884974705589700, 0.015542797604581346, 0.0039285668717522560, 0.046383839788625780, -0.056561685697926620, -0.092376647738401300, -0.072870459907452630, 0.0064005518129155030, -0.020127399676568684, 0.061980828626759770, 0.063805165414902620, -0.078095069717318100, -0.012359194836946313, -0.11438991180822816, -0.022833124218714880, -0.038838901575979065, -0.035239702346503870, 0.047873304066916830, 0.059273215657329490, 0.019907520102290910, 0.023476002765084060, 0.057477299670094810, -0.0099030792597622120, 0.016270180598207923, -0.0035471138628046478, -0.0024813492306441480, 0.062976181518618030, -0.0024684196379151104, -0.030504884587890448, 0.024987463181290373, -0.047695002267489380]::DOUBLE[]),
        |  (6, [-0.016150379121137820, -0.022181088341993248, 0.018657419861759904, -0.0010348074766146518, -0.0073421869011213120, -0.087077678281333400, -0.012366895795408818, 0.063134535195725600, -0.022993312516387050, 0.12778470399996790, 0.024826824773652610, 0.052515286200219390, -0.011454065823686220, -0.0038735678064575370, -0.022614183589106650, -0.039664332161028540, -0.040978163185238656, 0.033501290758353106, 0.0072294790956160640, 0.073671880188968100, -0.015020320130657374, -0.010071753913877617, 0.0054873290534171205, -0.043809767814102760, -0.047477471391255610, 0.0065740251169083540, -0.067236454791169900, 0.070513631172606760, 0.00092069168759027550, 0.053585918474301610, 0.014174332833754270, 0.0071641143633621770, 0.016468235864214020, 0.026981774954528020, -0.054234452648460090, 0.019224917354825847, -0.0014065247995390757, -0.011471646764319030, 0.050150990767214920, -0.039054448468627316, -0.020197719554895452, 0.058293698616498810, -0.089795880579929180, -0.046945049808920856, -0.099467818898730960, 0.0080373413697255400, 0.021169870454243920, 0.020836193883364440, -0.018565548773961292, -0.048193372318944500, 0.072577836489263250, -0.025720219154338128, 0.063859929481016100, 0.0093906315899931950, -0.029839888648539266, -0.0025004114498934082, -0.024495841348177710, -0.065370304518500510, -0.025811279745031920, -0.049471829225265160, -0.0048594974516119850, 0.10597487381243947, -0.031470070616537880, -0.035321488575535400]::DOUBLE[]),
        |  (7, [0.075020265306635110, -0.028149156132891690, -0.0070110073355056570, -0.029590936921644564, 0.070398196303734620, 0.038867739705319640, -0.016359628997025973, -0.023064399047101200, -0.029434386745500540, -0.033186137794295925, 0.0062815192311112605, -0.0038046820039956800, -0.031167185325709120, 0.035286242926226466, 0.0040083952261175730, -0.11395456684777285, 0.033335665187503490, 0.016826080706716214, -0.00015004375012113590, -0.0040046635928051450, 0.027443457563569080, -0.029895894952773037, 0.0029143314859150418, -0.097418247550884640, 0.010624135546298572, 0.058163391165996720, 0.15773768739221708, 0.018702401180714284, -0.015062846647886066, 0.063387659222131460, -0.038593072157996630, -0.035034044827741770, 0.0020430034737115580, -0.010414024975320737, -0.019398110863045135, -0.024122136855847480, -0.0064627568746709840, 0.019810282155871734, 0.077433490680303200, 0.044685175996174970, -0.029919289237588020, -0.0064024724704928480, 0.00071323518684585380, 0.065040981430178170, 0.010029337731497967, 0.0092447116655512990, -0.030515037117816154, -0.018604779698814870, -0.0042352751639103140, 0.048761482283500704, -0.012896034760580022, -0.096306283593568880, -0.055291541011708790, -0.0033884367661456295, 0.015089111247272125, -0.073134562197213320, 0.047513044498984636, -0.016688682118443890, 0.020243099025728212, 0.029756521567586150, 0.058730618052240640, -0.0049592926340754255, 0.041923616424076784, -0.049075754975514516]::DOUBLE[]),
        |  (8, [-0.013813278191274207, 0.056771851356674870, -0.037945141224553060, -0.066992657104304740, -0.090357006648479100, 0.085719759253411780, 0.026154220868051702, 0.013619246982586050, 0.011301971480920600, -0.079925780662271460, -0.039218559338125770, 0.032303875902017580, -0.016513321978382680, -0.032389271036815240, -0.042471408182409735, 0.042169660396714645, 0.014770138800861660, -0.015502595442174557, 0.063017672897811420, 0.071165113645376500, 0.043034990183437455, 0.022737063337339890, 0.036986359935287800, -0.011334529228894538, 0.061518594419707500, -0.012242501526996801, 0.044354029885564020, 0.059478941909536200, -0.0063496906293164860, 0.015004703304107770, -0.033836040681542810, 0.094034712252749550, -0.020887809605628527, -0.014199448224258048, -0.0063720710488178940, 0.099450704413487620, 0.049477933589769840, -0.028869936934276967, 0.037383093951171730, -0.012494534132055254, -0.040595343752532030, 0.013303538175630365, 0.039156594285296430, 0.0028911986054030647, -0.078890134557041820, 0.082984950453431420, 0.030292932549296454, -0.060753113756042330, 0.039101913418314815, 0.014286207323255700, -0.035950945265708490, -0.038399472289196795, 0.017550163215133180, -0.040472659820987400, 0.016203360631147720, -0.037768509996098580, 0.046507693072565144, -0.0048493165352720840, -0.047174032781255110, -0.060976110303827165, -0.021865098380869890, 0.038509347327049887, 0.019400078463300312, 0.0066344468092996160]::DOUBLE[]),
        |  (9, [-0.022744507003192888, -0.039213958777919740, 0.090388703014147130, -0.023527872937832660, 0.010821683798960391, -0.026210751004607030, 0.10197501475370864, 0.031256625401627804, -0.016329702538479820, 0.019053302758436468, 0.068541452723204100, -0.13292115183921932, -0.028525003399970123, -0.018121245442772200, -0.049676602286373016, 0.044821843335013550, 0.085309549148482490, 0.020229031163967360, 0.0046299094846144240, 0.054088819767823730, 0.010222190598216750, -0.027326344811889197, 0.022083233818967433, 0.064330076813007130, -0.050253980505777580, 0.030573465060176580, -0.011083886024347935, 0.048021094401100440, 0.038632988206006220, 0.047483463143081224, 0.063874779532086580, -0.061651329202243420, -0.0033026298107032477, 0.088104450839935220, 0.054243562461029377, -0.021376735622784150, -0.019295656233879393, -0.025491060089876440, -0.022384551957889710, 0.042565469955258820, -0.065146075975159170, 0.033592940058441710, -0.054792268356662780, -0.037799478629562490, 0.016884021400785692, -0.042083462924338420, -0.048803715870267810, -0.010539615762420866, 0.029729328058089370, 0.027063568483125550, 0.012430238332327764, 0.021336810819667595, -0.0011075075059132970, 0.041635598245252690, 0.093032267437129150, 0.00097544810935701990, 0.040355395186824660, -0.054594702461347185, -0.0024916437525869240, 0.012982561253224023, 0.0082429111636323270, -0.012808246184114185, 0.030602848211564688, -0.074116968069564570]::DOUBLE[]),
        |  (10, [0.020215710400967823, -0.062444726227382220, -0.0015334836034316599, -0.0088631034444366290, 0.011183601864211353, -0.031343252079185420, -0.033994773865096486, -0.048962562883023635, -0.025029191581833043, -0.095135053072361540, -0.018237368186193797, -0.055410724517307955, -0.051778406684264075, 0.079077657507807260, -0.051561009768075410, 0.039830934447027490, -0.0078420432806458090, 0.060198778531416580, -0.013450699305434398, 0.014540041667523875, 0.0096895371248144880, 0.11065221707028093, 0.019678941777822048, -0.0071479710874513230, -0.018459871293812487, -0.047952670708988274, -0.017937847233449804, -0.021695789986130774, 0.033459366652525760, 0.015935847239982967, -0.052349627688343926, -0.026571247563192930, -0.082294259991841650, 0.0056915165366595740, 0.047337106752031520, 0.047615525682782220, 0.068275585444189630, 0.057420871398290510, -0.0011205696213072158, -0.00039891310304798663, 0.015673141035302186, -0.041907306225868954, -0.027124868857313080, -0.027247993573501016, 0.052940790614128880, -0.0060456089580613950, -0.010412023669055791, 0.060797236040316760, 0.057077341740181545, 0.041842026988036530, -0.022019887384370173, -0.025164135078529503, 0.060167954584881640, -0.064282907241178040, 0.056330876758225590, 0.053600844202914140, -0.0033721130048704560, -0.022948602581109392, 0.020582368141608530, 0.046754283647467254, -0.022742143448576942, 0.086175126838417000, -0.021373415742153505, -0.017403386278469782]::DOUBLE[]),
        |  (11, [0.038526522379143930, -0.034678532567121510, 0.048746777462743314, 0.027789072386627485, 0.042713822174712826, -0.031672654862959450, 0.0050138868508539820, 0.033463966040552800, -0.0025298068805542397, 0.073961315306474750, -0.0069121645897835050, -0.00095322312438272590, 0.045231683490653720, -0.093384064568272720, 0.038466783158830730, -0.016166173781780250, 0.032856485843784096, 0.028746571619129954, 0.035398582472102230, 0.094766261245226750, 0.038942211651662250, 0.015804182935164498, -0.031880255757615654, 0.061667453744087136, -0.010921094034870168, 0.033156683246164394, -0.0055871868403364250, -0.0022410361061343420, -0.050610550131262200, -0.056703070427634124, -0.052284463342266110, -0.016377304596255398, 0.075291103710709320, -0.023198228349778773, 0.023943939740761016, -0.051449416855007570, 0.014503698608989065, -0.032740241606333810, 0.032597363432853130, -0.029659008593728440, 0.037295698256885286, -0.069179277754062200, -0.038411202827509570, -0.041440781071147334, 0.077751374886389630, -0.00046476612283898710, 0.034391009625173520, 0.0019308546075856839, -0.0074806183305274920, -0.053894336001029740, 0.050749458633737470, 0.018525730007267534, -0.045129016462472755, 0.0027017699152220073, -0.024906686832313785, -0.033324088214170470, 0.059924041058580690, 0.077405624278494680, 0.097073090355139890, -0.069603908958767280, 0.028537775231850738, 0.041880277594575950, -0.10348594357517843, -0.030283229508292334]::DOUBLE[]),
        |  (12, [-0.051432218222805755, -0.0063084465744073750, -0.049623535417360210, 0.018470060915206046, 0.0093304031666605770, 0.051962979717026870, -0.094126072854497020, 0.0064207272646925620, -0.0055855715427632355, -0.0049388667476212905, 0.092416347913036050, -0.033004602155608534, 0.033411900848702050, -0.039431326725653030, -0.0059843155587437490, 0.011192389498479808, 0.025720125180027902, 0.084533560680899480, 0.042898495428095180, -0.085233964472048100, -0.010400756767327525, -0.066784852339005870, 0.076217856830907630, -0.061936763612190560, 0.015883282010014863, -0.011643040484928986, -0.014122837639592252, 0.051067103792119620, -0.032405440706997704, 0.0012521143572688247, -0.048165406500324920, 0.017556348613610558, 0.062429300264583605, -0.046376877649843204, -0.014347241947155547, 0.012092476250616652, 0.031477969018811900, 0.066036140544343080, -0.0049728131022920500, 0.032658733356909615, 0.010877515067991905, 0.0071472608193255670, -0.046948505000909960, 0.0010429796878455504, -0.0078052037709203540, 0.016379733848255074, -0.022686252880172750, 0.0023389467496237226, 0.079298778606828090, -0.027860021932181223, 0.010237812750619246, 0.024232820602677264, -0.025651566777716097, 0.054294101241185010, -0.017536654024287180, 0.020878541717453460, -0.066560566676426830, 0.087093088541764400, -0.071987979577025350, 0.046227775261975110, 0.037307282106521705, 0.010377810860503923, -0.019602333863259530, 0.088936317708231930]::DOUBLE[]),
        |  (13, [-0.10986620818271321, 0.011289771794831701, -0.034135608427023680, 0.027400302861584410, 0.068065674367560470, 0.010884165097258853, 0.016913971718346212, -0.018320240935899484, 0.032279423335441246, 0.078387086804381580, 0.081142696703233600, -0.019816826791137450, -0.061204409806565475, 0.047210347230748975, 0.00064492015014774710, -0.049442690259119370, 0.075090445406747900, -0.028733012535398044, -0.043321836058809515, -0.030406536441330893, -0.036282733558361036, 0.056826125677106930, -0.021672266864470546, -0.020767085609367648, -0.078661813276679000, -0.015448378578836814, -0.020992027769284344, 0.046747656002308200, 0.043545527741538796, -0.0046015797360079500, 0.0038197303358083017, -0.067634985060103820, 0.064048578684468070, -0.047740192807437570, 0.0075563598413310290, 0.052280178714652500, 0.047158168414474070, 0.0082767117209324500, -0.012013682826709947, 0.037568444703006500, 0.053045792403980545, 0.031533492283880170, 0.018353508786390270, -0.0054188611791818360, -0.040765884893122405, -0.056645286172989070, 0.022036963018847920, -0.056072804820244286, -0.055800897849662530, 0.024019805089791537, 0.013817128234716090, -0.010599238982223163, 0.062995473352407420, -0.030381654472269207, 0.011413567657759405, -0.026020751374097126, -0.082215382869093050, 0.033747912004874744, 0.023457498572788334, -0.023671820014005175, 0.010530055485716257, 0.066600320231463090, -0.028361357997634257, -0.011391453600714035]::DOUBLE[]),
        |  (14, [0.089949138033958970, 0.030048516780037900, 0.0048900381022430744, 0.015559563329468593, -0.0065428693733370830, -0.017542139490150700, -0.028444150413880473, 0.080650083009552450, -0.072083078330212700, -0.047939956098268420, 0.010713035995169743, -0.019288504829302933, 0.0064174063525455000, 0.014976435785417982, -0.029649081412913820, 0.070946870666186430, -0.038997735593473554, 0.024856835537844420, -0.017786150918862393, -0.070812936709526100, -0.0041585328860195870, 0.011081656322513697, 0.056450930060534970, -0.017860366452281680, -0.042977924136330926, 0.0071011704971063970, -0.037965445658892990, 0.043267176887004460, 0.0012221258948740350, 0.0024781072869718890, 0.080903937888546590, -0.00088106210401770460, -0.046722748672557400, -0.0046055808904852434, 0.068292248309208780, 0.029857866033370010, -0.10315799730090800, -0.022380731902212233, 0.036952426699581370, 0.010221133801944608, 0.029214818996267230, -0.075528306015866620, 0.069338501570946000, 0.019846004850465090, -0.038368099025675350, 0.060734403474573560, 0.012038840543255817, 0.053689441865531270, -0.0060052293594489260, -0.053867235699913820, 0.047346079130057050, 0.057129271378819240, -0.034703678578425210, 0.00037356312290779694, 0.0015867490325133546, -0.014622506131395041, 0.048758758373446800, -0.019287263919296990, 0.00037942842141819994, 0.024121672225445770, -0.046313655931025330, -0.032420729126402300, -0.0069897203679073360, -0.011064867987229991]::DOUBLE[]),
        |  (15, [0.020865100343680363, -0.072383130272662410, 0.044607680995797885, 0.0046139588440696500, 0.056249447556719845, 0.035275712113886900, -0.12992670341625823, -0.090315479825634290, -0.00045106448659551290, 0.0098828298888998470, -0.022021968059940084, 0.022849236382110640, -0.0010630862071391670, 0.047297825515218760, -0.027300994844051600, 0.083103204458058450, 0.00030658045249274687, -0.088187723566006650, -0.013366792959576015, -0.010227536165564965, -0.023039185026220887, -0.0056862202963805980, -0.013263745291499407, 0.011664375759847254, -0.052761087173234904, 0.00028683767469290443, -0.0032587910940899380, -0.056968655311477774, 0.038385486971012360, -0.054394811054392210, 0.045537658426413836, -0.032890890889111915, -0.036172866996183155, -0.062037509538504670, 0.036384377528703340, -0.12400365552433712, -0.0083257866985067520, -0.036659740074444650, 0.038892202782032490, -0.036961527705272050, -0.052544955098899020, 0.034466625467643740, 0.0061147975890754784, 0.014413015124732195, 0.0043680933761700960, 0.0054251802320669550, -0.0026680365992975525, 0.022363420601956226, -0.039722208254682350, -0.0047596179305261940, 0.029005909779163428, -0.030739383386174435, 0.062691840339983110, 0.049193121636208405, -0.017615711007502876, 0.0041063408208569890, -0.026887660985977408, 0.036661804226275414, 0.044256674807480170, -0.025092613037758327, -0.068064896862766620, 0.0054355040227955070, 0.047443888024180880, 0.022033281580192472]::DOUBLE[])),
        |cb(s, bc, bctr) AS (VALUES
        |  (0, 0, [-0.046933751421323040, -0.14180979294090856, 0.10996852162655384, 0.087701178175621810]::DOUBLE[]),
        |  (0, 1, [-0.10246180324070712, 0.052720484634418270, -0.018844324713375120, 0.043710971654120294]::DOUBLE[]),
        |  (0, 2, [0.0051307584550162270, 0.081825432095323460, -0.087313027749635870, -0.14072084914103122]::DOUBLE[]),
        |  (0, 3, [0.090668492885435210, 0.0058465755919292890, 0.14245232704420044, -0.091216310184613580]::DOUBLE[]),
        |  (0, 4, [0.10654583481196088, 0.0015549617650304370, -0.097086695139540140, -0.042835775969147206]::DOUBLE[]),
        |  (0, 5, [-0.21786785690276470, -0.10538665619282670, 0.024134284892330698, -0.030604263222698942]::DOUBLE[]),
        |  (0, 6, [0.12081490928216232, 0.0085064183419437820, 0.038047397734711476, 0.12288887652813870]::DOUBLE[]),
        |  (0, 7, [0.21333060566747644, -0.039483060963153870, 0.032170621999743305, -0.054127618829523920]::DOUBLE[]),
        |  (0, 8, [-0.032920143216223450, 0.18789880381056700, 0.11104591983476472, -0.031299980835693130]::DOUBLE[]),
        |  (0, 9, [0.051515360794447095, -0.17500344703955384, -0.033822815145546510, 0.0039167649524191640]::DOUBLE[]),
        |  (0, 10, [-0.067310102192967430, 0.033636942774473820, 0.18551486163174040, 0.028425086257628816]::DOUBLE[]),
        |  (0, 11, [0.040036335977399355, 0.046814877475602014, -0.16805636408330550, 0.10813432164951389]::DOUBLE[]),
        |  (0, 12, [-0.061518658295845075, -0.050633101043703330, -0.041083641429695145, 0.20052025471525117]::DOUBLE[]),
        |  (0, 13, [-0.11186319047421485, -0.089083595941958330, -0.14076864665604522, -0.067412921449085030]::DOUBLE[]),
        |  (0, 14, [-0.0027562912181403070, 0.20914139282869712, -0.031015687775955100, 0.12211165505928073]::DOUBLE[]),
        |  (0, 15, [-0.064074612768650410, -0.0069940184101128270, 0.052021202874725620, -0.14253929007203087]::DOUBLE[]),
        |  (1, 0, [-0.093196849177814050, 0.15817724241832030, 0.033840706016138470, -0.058889417341903866]::DOUBLE[]),
        |  (1, 1, [-0.15015608412711565, -0.17308033020606245, -0.015500413574998624, 0.072989554759129300]::DOUBLE[]),
        |  (1, 2, [0.024761492305258707, -0.042152354890642674, -0.0033660160915932303, -0.034754865793466090]::DOUBLE[]),
        |  (1, 3, [0.13140994384559450, 0.058834438626071500, 0.087066028023528320, -0.13776137110288283]::DOUBLE[]),
        |  (1, 4, [-0.032981495902521810, -0.0045108503577067310, 0.10085018374545751, 0.14522365043858210]::DOUBLE[]),
        |  (1, 5, [-0.022291757821722620, -0.064409520044255200, 0.24302542477000388, -0.056884024029799064]::DOUBLE[]),
        |  (1, 6, [0.00024392506738456283, 0.012047446529736104, -0.094658578298052310, -0.18934164057113880]::DOUBLE[]),
        |  (1, 7, [0.034689382741247800, 0.090988256985795350, -0.063184222353346000, 0.16386988162206154]::DOUBLE[]),
        |  (1, 8, [-0.036151785665862704, -0.19598989416944582, -0.013324420459005356, -0.12160216498878190]::DOUBLE[]),
        |  (1, 9, [0.16813529941572702, 0.0095149610761967000, 0.097558242995690000, 0.053535105759745870]::DOUBLE[]),
        |  (1, 10, [0.090568355940930480, -0.19034841754232978, -0.033918682060214080, 0.13638500834053760]::DOUBLE[]),
        |  (1, 11, [-0.084618375298675390, 0.037975834260401970, -0.12759860642847187, 0.030223792789574370]::DOUBLE[]),
        |  (1, 12, [0.055127116128001180, 0.17301844636250002, 0.11256260589379345, 0.057003086565360700]::DOUBLE[]),
        |  (1, 13, [0.18889277782779450, -0.076574989474215620, -0.099605869121329280, 0.034834309414769020]::DOUBLE[]),
        |  (1, 14, [0.13383439785764340, 0.11640198363637416, -0.16216079842184822, -0.00098427936822497800]::DOUBLE[]),
        |  (1, 15, [-0.15082259255271374, -0.031069554726034390, 0.060568953096691600, -0.051855185002434810]::DOUBLE[]),
        |  (2, 0, [0.023191552236803168, 0.036976365226925274, -0.13258712436288778, 0.13498561742879550]::DOUBLE[]),
        |  (2, 1, [0.013860460096058848, -0.0060722805191136030, 0.11421771312958985, 0.17753390785877812]::DOUBLE[]),
        |  (2, 2, [0.091674532518797050, -0.16986642742259092, 0.024788096138837916, -0.021381700197437934]::DOUBLE[]),
        |  (2, 3, [-0.095668321596935670, 0.078896618933827900, 0.12545921348750083, 0.025633673020914214]::DOUBLE[]),
        |  (2, 4, [-0.11479646005321052, 0.18938025214031662, -0.053023551755891185, 0.15759067974001176]::DOUBLE[]),
        |  (2, 5, [-0.079556763456245020, 0.079845515898705460, 0.0042706309366237710, -0.20566047387384520]::DOUBLE[]),
        |  (2, 6, [0.13267825224676474, 0.16213508269466617, 0.012562163611891240, -0.053503406028610326]::DOUBLE[]),
        |  (2, 7, [-0.11585547635231311, 0.041499290295682556, -0.018466455967254942, 0.013296902463186011]::DOUBLE[]),
        |  (2, 8, [0.15386565752594916, -0.039488045374374700, -0.083491923623497510, 0.042415341430681040]::DOUBLE[]),
        |  (2, 9, [-0.029754130200801334, 0.14229327400448905, -0.14633658822575177, -0.064947755662108230]::DOUBLE[]),
        |  (2, 10, [-0.10225959586862882, -0.092744292873647880, 0.12770520980198097, -0.096440492922449130]::DOUBLE[]),
        |  (2, 11, [0.048049147387647060, 0.040111806376272055, 0.043149653601926060, -0.044701385204921215]::DOUBLE[]),
        |  (2, 12, [-0.048467711877366560, -0.082518137742304150, -0.14292452509606193, -0.015695489318558988]::DOUBLE[]),
        |  (2, 13, [0.097971294034073660, -0.078564829139122100, -0.062537550816920610, -0.15564964082026508]::DOUBLE[]),
        |  (2, 14, [0.12248970500986335, -0.063028197464737270, 0.22427555094130275, -0.088811142254514530]::DOUBLE[]),
        |  (2, 15, [-0.10713937617571631, -0.14786735276694113, 0.00086377231981613330, 0.10834622304733960]::DOUBLE[]),
        |  (3, 0, [-0.085604131265762880, -0.028349994068427890, -0.14738501014942917, 0.15690917381633280]::DOUBLE[]),
        |  (3, 1, [0.070477297235850970, 0.031546302985888265, 0.074700352297204080, 0.20560916231360635]::DOUBLE[]),
        |  (3, 2, [-0.0083484628452300100, -0.099183319621970980, 0.022736658139570074, 0.090501565713596130]::DOUBLE[]),
        |  (3, 3, [-0.18988103233618040, -0.046598526600895960, 0.026186532042345032, 0.0079419982537882900]::DOUBLE[]),
        |  (3, 4, [0.16864350675467218, 0.13789140722855453, 0.080306210020260030, 0.0064736961938594340]::DOUBLE[]),
        |  (3, 5, [0.074200916522950310, 0.16532829938483326, -0.090803965194475370, -0.096073161318639090]::DOUBLE[]),
        |  (3, 6, [-0.10013421312959318, -0.066980381526766690, 0.055957973467423190, -0.13303317857557326]::DOUBLE[]),
        |  (3, 7, [0.074603778648868630, -0.16393423394373420, 0.093032022218837680, -0.022350271773985655]::DOUBLE[]),
        |  (3, 8, [-0.085240696525761220, 0.21047299613013350, -0.013884249876213945, -0.0092584729287312880]::DOUBLE[]),
        |  (3, 9, [0.14932258071667423, -0.0087474087338296080, -0.10846240806950712, 0.071075318903285850]::DOUBLE[]),
        |  (3, 10, [0.0085809726155567210, 0.10998386434103287, -0.054633283891204940, 0.081311825262117720]::DOUBLE[]),
        |  (3, 11, [-0.093150536420862030, -0.026102652956441052, -0.16008697787061443, -0.079160400011259180]::DOUBLE[]),
        |  (3, 12, [0.035962349407064730, -0.16636904452656800, -0.094848421439906110, -0.031318815173860260]::DOUBLE[]),
        |  (3, 13, [-0.085605276452256860, 0.13208082886653447, 0.14361209503411299, 0.0056080051984073160]::DOUBLE[]),
        |  (3, 14, [0.014551780117394960, -0.0087003000642653960, 0.16946539540117692, 0.021926403447402577]::DOUBLE[]),
        |  (3, 15, [0.061461451689512960, -0.0046989712039147485, 0.049007922309064730, -0.14847093926531790]::DOUBLE[]),
        |  (4, 0, [0.011172741738474806, -0.088337824050705230, 0.095170431251888830, -0.088386552908501700]::DOUBLE[]),
        |  (4, 1, [0.033896099683397890, 0.034955472932280726, -0.028058668688130340, 0.14950942032187847]::DOUBLE[]),
        |  (4, 2, [0.035854503575852490, -0.0046139028533964320, -0.19984793411615215, 0.027086546130624695]::DOUBLE[]),
        |  (4, 3, [0.078614370515819580, 0.10004040040262813, 0.13692339161954625, 0.020078492028701773]::DOUBLE[]),
        |  (4, 4, [-0.0013984355591102257, 0.21101191476187800, -0.092964520732465180, -0.0069414946230297080]::DOUBLE[]),
        |  (4, 5, [-0.16548196098476134, -0.16256191876732864, -0.10657196165893348, -0.019861212804569983]::DOUBLE[]),
        |  (4, 6, [0.17130617338497340, -0.093041353097672970, 0.0055605099533859440, 0.0048559789699106580]::DOUBLE[]),
        |  (4, 7, [-0.0021848416375255175, 0.054401470202008737, -0.014194226896621780, -0.051979976603436740]::DOUBLE[]),
        |  (4, 8, [0.022877431070336160, -0.15310153866851892, -0.10885708144371477, 0.12210094040663316]::DOUBLE[]),
        |  (4, 9, [-0.10007768168571826, 0.13059281937407030, 0.016109229601739335, 0.040705035608599914]::DOUBLE[]),
        |  (4, 10, [0.0053163228119884560, -0.044205555153831205, 0.22394680399355146, 0.044613661761269324]::DOUBLE[]),
        |  (4, 11, [-0.14313726860779460, -0.045727890543853365, 0.064454677099711840, 0.053124227791295706]::DOUBLE[]),
        |  (4, 12, [-0.037718356870835040, -0.053774880372820610, -0.044169291418447450, -0.14485944193372868]::DOUBLE[]),
        |  (4, 13, [0.17234035527310018, 0.042541009200146356, -0.054049584891188240, -0.086773510884966130]::DOUBLE[]),
        |  (4, 14, [-0.040387969302110220, 0.060361089130821060, -0.22567552880745168, -0.29478508665731440]::DOUBLE[]),
        |  (4, 15, [-0.042563719494194140, 0.18435690963824160, 0.11046220817012384, -0.14730374258331938]::DOUBLE[]),
        |  (5, 0, [-0.083269020339994390, 0.22393113756956468, 0.019703821513221507, -0.00020649629995287422]::DOUBLE[]),
        |  (5, 1, [-0.18723075942252446, -0.023986311911180270, -0.056427179161154200, -0.087716108506230130]::DOUBLE[]),
        |  (5, 2, [0.035047099952372740, 0.068383929651344890, 0.071415165379275500, 0.042987998272714050]::DOUBLE[]),
        |  (5, 3, [0.050752351400759760, -0.13936793630030667, 0.0017326417536570576, 0.10924751313155230]::DOUBLE[]),
        |  (5, 4, [-0.11049295630438621, 0.0068021223396815830, 0.14612708494116713, 0.011906499602788289]::DOUBLE[]),
        |  (5, 5, [0.11907799128763029, -0.072146033078775390, 0.15290246211813946, 0.072081587101530330]::DOUBLE[]),
        |  (5, 6, [-0.029163344399308913, -0.10085282781496561, -0.12053883680676808, -0.026311177855146858]::DOUBLE[]),
        |  (5, 7, [0.095083620980237720, 0.020739466655092593, 0.13670351264736902, -0.16555570896010535]::DOUBLE[]),
        |  (5, 8, [-0.015168419683874643, 0.10947864637124541, 0.078332108492704720, 0.24880776836045365]::DOUBLE[]),
        |  (5, 9, [-0.031935886341734360, -0.14124428181788157, 0.075471515364087470, -0.071759021387931530]::DOUBLE[]),
        |  (5, 10, [-0.17939748399113095, -0.072928471981149710, 0.0017198550731451253, 0.20439038746270036]::DOUBLE[]),
        |  (5, 11, [0.14348548683079300, 0.12362688997565369, -0.047849457668996100, -0.058907611066450406]::DOUBLE[]),
        |  (5, 12, [0.063907019176263850, 0.052318619716597510, -0.16984380409043630, 0.076909081134026300]::DOUBLE[]),
        |  (5, 13, [0.17357774881759985, -0.050097458774918890, -0.070717383265393970, 0.030169254393999017]::DOUBLE[]),
        |  (5, 14, [-0.076550280407649570, 0.079099788467447350, -0.061076247095972940, 0.080060259632864210]::DOUBLE[]),
        |  (5, 15, [-0.013283682081333386, 0.043049841032649380, -0.0087763606864258970, -0.16458248172923223]::DOUBLE[]),
        |  (6, 0, [-0.040250257148373006, 0.14957128878474601, 0.19218273958214538, -0.082080339334786980]::DOUBLE[]),
        |  (6, 1, [0.047338949263319510, 0.16949139708632740, -0.10066692806460985, -0.067161307854801010]::DOUBLE[]),
        |  (6, 2, [0.0076670016374355745, 0.060611127212651536, 0.042593088811908180, -0.0074378114401042060]::DOUBLE[]),
        |  (6, 3, [0.15303840664296625, -0.0042034261444464320, -0.060690782604804070, 0.039668329920337184]::DOUBLE[]),
        |  (6, 4, [-0.016618479134765295, -0.12938371085281790, 0.11115331372704688, -0.11866323677366886]::DOUBLE[]),
        |  (6, 5, [-0.067717598528923450, 0.019888205182918330, 0.12159643665239318, 0.18498834085249424]::DOUBLE[]),
        |  (6, 6, [0.15096542055677967, 0.095124213056860200, 0.11210789171363283, 0.039641893093825660]::DOUBLE[]),
        |  (6, 7, [-0.042440725975031590, 0.24066212129676157, 0.014494359266799800, 0.067442178809231630]::DOUBLE[]),
        |  (6, 8, [0.0078663984055296720, -0.17901025234598314, -0.11348957452027243, 0.0079670371015535070]::DOUBLE[]),
        |  (6, 9, [0.076930556336607280, -0.16299336464698436, 0.079038510696788050, 0.087497615201034270]::DOUBLE[]),
        |  (6, 10, [-0.040815151151236760, -0.0065221209887663700, -0.11386386661782200, 0.0043445368777288070]::DOUBLE[]),
        |  (6, 11, [-0.20532997367146370, 0.072206302991530070, -0.087641278613720830, 0.015902704716637583]::DOUBLE[]),
        |  (6, 12, [0.14997175886033150, 0.012612245780404107, 0.0056655884937343140, -0.15976636808829955]::DOUBLE[]),
        |  (6, 13, [-0.13762932392400415, -0.091752110691422720, 0.062051963166812475, 0.0061140647219930770]::DOUBLE[]),
        |  (6, 14, [0.076267794119251540, 0.0096049186983126630, -0.12489669699461810, 0.17948280849915096]::DOUBLE[]),
        |  (6, 15, [-0.096061902586669430, 0.0094098682746585200, -0.052222812586687280, -0.19459610836111250]::DOUBLE[]),
        |  (7, 0, [-0.14132077441330146, -0.075733474155958400, 0.071023877949926660, 0.12312903702561079]::DOUBLE[]),
        |  (7, 1, [0.021284438695039046, -0.21791186259152703, -0.015695375863283186, 0.037815626533085490]::DOUBLE[]),
        |  (7, 2, [-0.064785460348363330, -0.084220247734685060, 0.0080710628496109650, -0.098599852659207760]::DOUBLE[]),
        |  (7, 3, [0.14200461414698512, 0.044827156417749654, -0.0087301951408918670, -0.098678760633060700]::DOUBLE[]),
        |  (7, 4, [-0.018767598783432038, -0.025307242414522268, -0.12257475952773286, 0.15012543488370753]::DOUBLE[]),
        |  (7, 5, [-0.0050450153630827470, 0.10526293952990799, 0.18919608111935285, -0.0059589127853443960]::DOUBLE[]),
        |  (7, 6, [-0.043179207540292750, 0.18406412744314887, 0.013843362687615810, 0.14106833528340650]::DOUBLE[]),
        |  (7, 7, [0.051703315234262616, -0.13358416692641242, 0.14246421783038900, -0.15724316099439656]::DOUBLE[]),
        |  (7, 8, [0.10804908324687412, -0.059505350809911220, 0.091712402801818930, 0.056797186358818204]::DOUBLE[]),
        |  (7, 9, [0.035602383807395270, 0.18242806901657760, -0.066870814447705000, -0.036238481031710484]::DOUBLE[]),
        |  (7, 10, [-0.13529568026346525, 0.0042561764631390070, -0.19480626067984289, -0.022917855708772507]::DOUBLE[]),
        |  (7, 11, [0.047097976646536810, 0.033655712315483054, -0.15384406717166180, -0.23859377728188670]::DOUBLE[]),
        |  (7, 12, [-0.056306638305873014, 0.017760071265626863, 0.023970590515591507, -0.0037538837176325790]::DOUBLE[]),
        |  (7, 13, [0.10359422940478948, 0.070634223634133990, 0.0037947591972172260, 0.12326275125968465]::DOUBLE[]),
        |  (7, 14, [-0.18222692474781466, 0.095925672729833780, 0.075751581370230680, -0.11826888636428588]::DOUBLE[]),
        |  (7, 15, [0.13199741503641937, -0.11649687749472312, -0.13762068221445495, -0.034063516211071330]::DOUBLE[]),
        |  (8, 0, [-0.075214318785014200, 0.051322358141738036, 0.0068780679852228210, 0.16688089051284810]::DOUBLE[]),
        |  (8, 1, [0.11523067625631620, -0.020270693663303384, -0.048993420098525545, 0.16165776209862350]::DOUBLE[]),
        |  (8, 2, [-0.0086146892662251700, -0.16316351054459566, -0.11905204178737154, -0.030508766516134390]::DOUBLE[]),
        |  (8, 3, [0.095800686236840700, -0.12778764706675128, 0.093323072234740400, -0.036610489388620236]::DOUBLE[]),
        |  (8, 4, [-0.076680903276459380, 0.069718471417359150, -0.038847980747118870, -0.075531449642775360]::DOUBLE[]),
        |  (8, 5, [-0.044627401308570410, 0.057093648235508890, -0.15291358722695725, 0.063422292889850370]::DOUBLE[]),
        |  (8, 6, [0.061441262119298370, 0.13466049984885012, 0.17070856037048818, -0.081922627852899580]::DOUBLE[]),
        |  (8, 7, [-0.069905094007383320, 0.0034132842898061740, 0.14247093427901195, -0.17321489151363662]::DOUBLE[]),
        |  (8, 8, [0.028918511879703564, -0.051384448167957910, -0.076220685961671020, -0.19342000215019028]::DOUBLE[]),
        |  (8, 9, [0.12468584974578037, 0.077574752049544960, -0.035832367472703845, -0.063968412820814900]::DOUBLE[]),
        |  (8, 10, [0.016447665385911636, -0.036147696688513230, 0.0063210090123687880, -0.00028198971544810827]::DOUBLE[]),
        |  (8, 11, [-0.095683691838627610, -0.13589312062137440, 0.088412426561331830, 0.12183013728240316]::DOUBLE[]),
        |  (8, 12, [-0.21521637100776586, 0.066205363276835850, 0.0098162837579344480, -0.071994584767182730]::DOUBLE[]),
        |  (8, 13, [0.074812063713057510, 0.25085581316812500, 0.0012698154455775012, 0.033466448080734240]::DOUBLE[]),
        |  (8, 14, [0.042821426382126700, 0.021478331018856045, 0.16547071258628070, 0.067163619239091740]::DOUBLE[]),
        |  (8, 15, [-0.18536899288547784, -0.11400965670621793, -0.061061235818835600, 0.017226708905727150]::DOUBLE[]),
        |  (9, 0, [-0.15094970170647656, 0.10011102790456737, -0.091190019879046580, -0.034938894304155886]::DOUBLE[]),
        |  (9, 1, [0.064350281497126960, -0.14016281316054904, -0.20429804078972824, 0.066129371399389440]::DOUBLE[]),
        |  (9, 2, [-0.12376419513055514, 0.098318513908617950, 0.077758053183894420, -0.097216241301539300]::DOUBLE[]),
        |  (9, 3, [-0.062538424574353140, -0.12005336362736851, 0.094753750837215950, 0.052286071855076034]::DOUBLE[]),
        |  (9, 4, [-0.065565242727427090, 0.17243544654614595, 0.034449553611131490, 0.16468238791099607]::DOUBLE[]),
        |  (9, 5, [-0.071915301999367020, -0.058654354790962660, 0.17085029661809126, -0.10964758986730565]::DOUBLE[]),
        |  (9, 6, [0.14335704089216542, 0.00091605894366085900, 0.080615865047613560, -0.012481362179615482]::DOUBLE[]),
        |  (9, 7, [-0.039556162953638070, -0.065324152511601420, -0.094714208772891230, -0.12864684841797980]::DOUBLE[]),
        |  (9, 8, [-0.16829891714083970, -0.10886450646121341, -0.052811125646383156, 0.15847035615333135]::DOUBLE[]),
        |  (9, 9, [0.085933212131408200, 0.037028799745303494, 0.047711516302724036, -0.17289409064335506]::DOUBLE[]),
        |  (9, 10, [0.071243059733193630, 0.16876947591906227, -0.15531211389640460, -0.0077774936189914500]::DOUBLE[]),
        |  (9, 11, [-0.015709590612076156, -0.0081655791916276000, -0.031891310298799290, 0.067265991797725240]::DOUBLE[]),
        |  (9, 12, [0.043250775863259480, 0.074286564021873240, 0.20208307413160062, 0.096637214139111970]::DOUBLE[]),
        |  (9, 13, [0.11592808900429158, -0.12756699460761406, -0.033008758912266796, -0.026108170742293903]::DOUBLE[]),
        |  (9, 14, [0.012382561440764700, 0.11987197517188271, 0.011833153284798208, 0.0042996215407710890]::DOUBLE[]),
        |  (9, 15, [0.10026395770732503, -0.040485406330724526, -0.0088572223399913940, 0.18434514721351064]::DOUBLE[]),
        |  (10, 0, [-0.066774817008684780, -0.19241967993910497, 0.020030712551588167, -0.013279941134526569]::DOUBLE[]),
        |  (10, 1, [0.035696771848000430, 0.061160791153137610, -0.082660795846609290, -0.13282387304123447]::DOUBLE[]),
        |  (10, 2, [0.10835734470237261, -0.13953645566002576, -0.093263467293365950, -0.012161799808253989]::DOUBLE[]),
        |  (10, 3, [0.13944678407462710, 0.10986229014174550, -0.016186070908075250, 0.016988212076661728]::DOUBLE[]),
        |  (10, 4, [-0.11290365999235503, 0.12823973563236770, -0.00032234206844737650, -0.082452424368112310]::DOUBLE[]),
        |  (10, 5, [-0.11744710266041754, 0.054824705194365955, 0.22048391229032502, 0.047647116305537814]::DOUBLE[]),
        |  (10, 6, [0.12472092207616688, -0.052967014010796454, 0.012036676376776984, -0.16952295439426850]::DOUBLE[]),
        |  (10, 7, [-0.17250930207824655, -0.043763367990981655, -0.086174073282794930, -0.10736405997886646]::DOUBLE[]),
        |  (10, 8, [-0.12314647273108463, -0.027994168405425760, 0.014530934429598538, 0.044435591379614670]::DOUBLE[]),
        |  (10, 9, [0.029810308498286562, -0.11235538170602029, 0.16370458300613377, -0.048075504710483774]::DOUBLE[]),
        |  (10, 10, [-0.045619035377537170, -0.11221536669190396, -0.046942460544159630, 0.17936762612895957]::DOUBLE[]),
        |  (10, 11, [0.060308694438858210, 0.084459489425037460, 0.15756220431020523, -0.055361840391148845]::DOUBLE[]),
        |  (10, 12, [-0.0069673158404278300, 0.12787706068374197, -0.17944825302008433, 0.011385636594127734]::DOUBLE[]),
        |  (10, 13, [0.11226431600488143, -0.022928270488058920, 0.049939013106451935, 0.14823977489461680]::DOUBLE[]),
        |  (10, 14, [-0.039350050279082670, 0.18685777948632962, 0.032478746447052405, 0.075054348203872120]::DOUBLE[]),
        |  (10, 15, [-0.026997568793913403, -0.021671908284481390, -0.16322118455609100, 0.11119836427049969]::DOUBLE[]),
        |  (11, 0, [-0.073291708806333370, 0.11151238042456095, 0.12092445805539828, 0.0048468489278072130]::DOUBLE[]),
        |  (11, 1, [0.15078613714184180, -0.041480805847772875, 0.014795496615292423, 0.080485897978073100]::DOUBLE[]),
        |  (11, 2, [0.029146961497155566, 0.028519947810318542, 0.17814565071439425, -0.15583822318946988]::DOUBLE[]),
        |  (11, 3, [0.060379326275639500, -0.095780817423115050, 0.022190632432926957, -0.16095154717014454]::DOUBLE[]),
        |  (11, 4, [0.11093283998162412, 0.14921491870762152, 0.023884065578743015, -0.047650891588801605]::DOUBLE[]),
        |  (11, 5, [0.14659083040763626, 0.042334218268813550, -0.14030007996021235, 0.046393028825965250]::DOUBLE[]),
        |  (11, 6, [-0.10787717452488989, -0.096283525428932200, 0.076889833211228540, -0.041300383522577650]::DOUBLE[]),
        |  (11, 7, [-0.13376960280266740, -0.016319303430590536, 0.074650720745613240, 0.14595465184862280]::DOUBLE[]),
        |  (11, 8, [0.11895531280263723, -0.098006626160968830, 0.13728747392196400, 0.031413809900694100]::DOUBLE[]),
        |  (11, 9, [-0.20609131884412020, 0.054827207629595680, -0.087585263028359530, -0.014964019542226860]::DOUBLE[]),
        |  (11, 10, [0.055398510913763800, 0.068065826566092530, 0.11303449484944263, 0.11373507003619238]::DOUBLE[]),
        |  (11, 11, [0.0024481741794959012, -0.14012333410056993, -0.065221817942820120, 0.17221784853057830]::DOUBLE[]),
        |  (11, 12, [-0.046005552040781640, 0.12229406422430718, -0.10248711188933220, 0.11033605896727935]::DOUBLE[]),
        |  (11, 13, [-0.051363723193825095, 0.081600721246064740, -0.068449626224661980, -0.15906362820601855]::DOUBLE[]),
        |  (11, 14, [-0.032097354887062950, -0.18094483169811512, -0.10602595663844928, -0.039100742124070435]::DOUBLE[]),
        |  (11, 15, [-0.023364586574018156, -0.0031583263040321306, -0.054442487139975600, 0.016479967027317965]::DOUBLE[]),
        |  (12, 0, [-0.10491661866539793, -0.18656137931152508, 0.066214468551982200, -0.026096600913893540]::DOUBLE[]),
        |  (12, 1, [-0.12735918376762112, -0.058533488761754840, -0.092797805150802520, -0.0022240574739178280]::DOUBLE[]),
        |  (12, 2, [-0.16373879987412465, 0.010211129634524089, 0.10311984963736702, 0.050502125915590790]::DOUBLE[]),
        |  (12, 3, [-0.047759133017237530, -0.16035185299288920, -0.16074613780875980, -0.13709358940392890]::DOUBLE[]),
        |  (12, 4, [0.16510785454330157, 0.077521168964023860, -0.15450723995787766, 0.10548096091495356]::DOUBLE[]),
        |  (12, 5, [-0.030580278754981594, 0.077009208457808940, 0.030309758711106676, 0.13082973204403833]::DOUBLE[]),
        |  (12, 6, [0.063800101336273510, -0.11951648213627930, -0.080421224872841830, -0.019962224976167765]::DOUBLE[]),
        |  (12, 7, [0.044519374261615210, -0.038019682119948724, 0.12743165926959402, 0.0085823281912071580]::DOUBLE[]),
        |  (12, 8, [-0.096780364088336980, -0.028034633918517640, -0.13613992445320988, 0.16789503154254565]::DOUBLE[]),
        |  (12, 9, [0.16265561553018446, -0.18106491431070890, 0.076971998509335990, -0.084134184647793350]::DOUBLE[]),
        |  (12, 10, [0.089686413088156700, 0.010990101860622036, -0.071329762889330130, -0.14564991854171322]::DOUBLE[]),
        |  (12, 11, [-0.045287558543445630, 0.071892641577842880, -0.13442034426867097, -0.021086213411769427]::DOUBLE[]),
        |  (12, 12, [-0.0023506838698365137, 0.17969220753516962, 0.090485028383544430, -0.029032214245020414]::DOUBLE[]),
        |  (12, 13, [0.056507142652517675, -0.12581082437721358, 0.063535061471062930, 0.17364302350093214]::DOUBLE[]),
        |  (12, 14, [-0.036118156634409350, 0.027430315018909638, 0.037139220760460950, -0.17317976570398935]::DOUBLE[]),
        |  (12, 15, [0.17170216989460100, 0.092848331245452750, 0.053694076443290560, -0.036345726291855940]::DOUBLE[]),
        |  (13, 0, [0.043617303387941994, -0.020813634513538123, -0.051235003829965690, -0.067480888828337220]::DOUBLE[]),
        |  (13, 1, [0.11424479065725611, -0.099034172205030500, 0.047933362228607550, 0.14047302900820957]::DOUBLE[]),
        |  (13, 2, [-0.16020498774418263, 0.12270885244155928, 0.016404587633552715, 0.072580480961761710]::DOUBLE[]),
        |  (13, 3, [-0.089717994876940380, -0.00091141035467764360, 0.20983292828700656, 0.078216335646910580]::DOUBLE[]),
        |  (13, 4, [0.13175126063115030, -0.077363879269383050, 0.051474699917208630, -0.17549475648445978]::DOUBLE[]),
        |  (13, 5, [-0.072611810818382110, 0.085745853842990850, -0.13700516532544876, -0.11685874058884847]::DOUBLE[]),
        |  (13, 6, [0.025082416794900086, 0.16867044811906906, 0.056663969271667860, 0.049527538183159360]::DOUBLE[]),
        |  (13, 7, [-0.072955817329173860, -0.16925510061435864, -0.050659025525778170, -0.074684065964833640]::DOUBLE[]),
        |  (13, 8, [0.12107364765893185, -0.13833918596040531, -0.18478667134734936, 0.031270142676498190]::DOUBLE[]),
        |  (13, 9, [0.066155382896168370, -0.096514340785101610, 0.087110373349191500, 0.0081711470091828420]::DOUBLE[]),
        |  (13, 10, [-0.060285427878144480, -0.058868779671611020, -0.16091890706415704, 0.13783903683024004]::DOUBLE[]),
        |  (13, 11, [0.16708934157314492, 0.050583554136961015, -0.11651975912992911, -0.0072812327030349604]::DOUBLE[]),
        |  (13, 12, [0.12492248777633072, 0.067628011528085720, 0.11186358402095652, -0.059487325965016255]::DOUBLE[]),
        |  (13, 13, [-0.062853754846832950, 0.071015497592805290, 0.085153029226400970, -0.15799310943969797]::DOUBLE[]),
        |  (13, 14, [-0.15646085681696986, -0.057878282150599660, 0.034031450210863456, 0.034100143003839005]::DOUBLE[]),
        |  (13, 15, [0.030980208460199592, 0.036501878869190320, -0.039847568530997066, 0.13776258923630286]::DOUBLE[]),
        |  (14, 0, [-0.16647847047062436, -0.0038348872188705696, 0.069846930350400570, -0.085277543762399490]::DOUBLE[]),
        |  (14, 1, [-0.066875902676461360, -0.083988490968678660, 0.12513784091118190, 0.14462607511781522]::DOUBLE[]),
        |  (14, 2, [0.12707272219440288, 0.038919734650971524, -0.15230211595799592, -0.12423898266650610]::DOUBLE[]),
        |  (14, 3, [-0.093085515760479210, -0.069559723339445360, -0.14296412754102028, -0.057986759855092820]::DOUBLE[]),
        |  (14, 4, [-0.16664622597064450, 0.087382602549391050, -0.078460941205401500, 0.085670751997465220]::DOUBLE[]),
        |  (14, 5, [0.10686471802481402, -0.073531117108204040, -0.10462687961252869, 0.087140083169555600]::DOUBLE[]),
        |  (14, 6, [0.0098726728637826450, 0.046395580665237200, 0.25558526370065770, -0.018566231874865193]::DOUBLE[]),
        |  (14, 7, [-0.0095178783527023680, 0.076042267560648700, -0.069960462391466610, -0.0081231869334256540]::DOUBLE[]),
        |  (14, 8, [0.12084588440957585, 0.14700759650500410, 0.052387995290435294, 0.026201214994253208]::DOUBLE[]),
        |  (14, 9, [0.16446938226718540, -0.064425592728217820, 0.022076549744510864, -0.058895578529819520]::DOUBLE[]),
        |  (14, 10, [-0.074235157895309860, 0.10074598088437786, 0.093728458669311070, 0.074131834994833920]::DOUBLE[]),
        |  (14, 11, [0.0025506875716955458, -0.19748920390975858, -0.010427546858137252, -0.045520158112854654]::DOUBLE[]),
        |  (14, 12, [-0.014565756086075975, -0.047924847309119200, 0.072475890298013530, -0.083100409875592130]::DOUBLE[]),
        |  (14, 13, [-0.0028136861902614504, 0.12168864346848039, -0.011313122298501888, -0.18680937205765620]::DOUBLE[]),
        |  (14, 14, [0.10083736419254051, -0.047435712561119510, 0.074181166337496130, 0.12760124686243632]::DOUBLE[]),
        |  (14, 15, [-0.051834148665982740, -0.026543354080314392, -0.10443830370339403, 0.14448416425801047]::DOUBLE[]),
        |  (15, 0, [-0.0022032604384075263, -0.062625650854178100, 0.050072127056267860, -0.26740974758772235]::DOUBLE[]),
        |  (15, 1, [0.0085789357801904190, -0.014226968237876754, 0.21484606286947142, -0.039560143464345050]::DOUBLE[]),
        |  (15, 2, [0.030384419551390110, 0.13046888760930770, 0.050582818635626690, 0.058785746802472120]::DOUBLE[]),
        |  (15, 3, [0.10609357851686275, -0.018901880830659846, -0.098760278503039690, 0.0071901611201707480]::DOUBLE[]),
        |  (15, 4, [-0.0025907714936471330, 0.17175866374108745, 0.046489297826390470, -0.10987583914672859]::DOUBLE[]),
        |  (15, 5, [-0.014367148800965566, 0.13648254121030940, -0.14569693976838644, -0.0059532252544110760]::DOUBLE[]),
        |  (15, 6, [-0.044533440978763180, -0.083966408617101040, 0.10503404172151772, 0.049275832071775970]::DOUBLE[]),
        |  (15, 7, [0.18185056719350848, 0.043233144260807314, 0.025186212872889740, -0.044896934276864990]::DOUBLE[]),
        |  (15, 8, [-0.0083316159364945820, 0.032853674591891674, -0.14362051782910792, -0.16790920090054350]::DOUBLE[]),
        |  (15, 9, [-0.035638849116387226, -0.0017693904778554417, -0.016368904833746230, -0.099671343944030600]::DOUBLE[]),
        |  (15, 10, [0.071904325075698450, -0.088290345154604950, -0.091221090328239120, 0.17935323050031313]::DOUBLE[]),
        |  (15, 11, [0.064065875261293510, -0.18620854101617834, -0.010276670485616854, -0.057797737414419140]::DOUBLE[]),
        |  (15, 12, [-0.12734891826160363, -0.078007875565152790, -0.10133337676677996, 0.028148171334978923]::DOUBLE[]),
        |  (15, 13, [0.088193017258828280, 0.029766686851726124, 0.11181781229204571, 0.14801187823602124]::DOUBLE[]),
        |  (15, 14, [-0.092935176326641870, 0.015977220546199614, 0.015571409335128896, 0.17672161673350403]::DOUBLE[]),
        |  (15, 15, [-0.20078788029954225, 0.024300206720834830, 0.022911973499683807, -0.054796262418478380]::DOUBLE[])),
        |a AS (SELECT u.vec_id, cc.cell,
        |    ROW_NUMBER() OVER (PARTITION BY u.vec_id
        |      ORDER BY list_distance(uv, ctr), cc.cell) AS rnk
        |  FROM u CROSS JOIN cc),
        |cells AS (SELECT vec_id, cell FROM a WHERE rnk = 1),
        |res AS (SELECT u.vec_id, cl.cell,
        |    list_transform(generate_series(1, 64), i -> u.uv[i] - c2.ctr[i]) AS r
        |  FROM u JOIN cells cl USING (vec_id) JOIN cc c2 ON c2.cell = cl.cell),
        |encd AS (SELECT res.vec_id, res.cell, cb.s, cb.bc,
        |    list_sum(list_transform(generate_series(1, 4),
        |      j -> (r[cb.s * 4 + j] - bctr[j]) * (r[cb.s * 4 + j] - bctr[j]))) AS d2
        |  FROM res CROSS JOIN cb),
        |enc AS (SELECT vec_id, cell, s, bc AS code FROM (
        |    SELECT vec_id, cell, s, bc,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, bc) AS rnk
        |    FROM encd) WHERE rnk = 1),
        |probes AS (SELECT vec_id AS query_id, cell FROM a WHERE vec_id < 8 AND rnk <= 6),
        |qres AS (SELECT p.query_id, p.cell,
        |    list_transform(generate_series(1, 64), i -> u.uv[i] - c2.ctr[i]) AS r
        |  FROM probes p JOIN u ON u.vec_id = p.query_id JOIN cc c2 ON c2.cell = p.cell),
        |qlut AS (SELECT q.query_id, q.cell, cb.s, cb.bc,
        |    list_sum(list_transform(generate_series(1, 4),
        |      j -> (q.r[cb.s * 4 + j] - bctr[j]) * (q.r[cb.s * 4 + j] - bctr[j]))) AS d2
        |  FROM qres q CROSS JOIN cb),
        |pair AS (SELECT l.query_id, ec.vec_id AS neighbor_id, SUM(l.d2) AS adist
        |  FROM enc ec JOIN qlut l ON l.cell = ec.cell AND l.s = ec.s AND l.bc = ec.code
        |  WHERE ec.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
        |  FROM pair),
        |short AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 64),
        |scored AS (SELECT sh.query_id, sh.neighbor_id,
        |    list_cosine_similarity(qe.v, ne.v) AS score
        |  FROM short sh
        |  JOIN e qe ON qe.vec_id = sh.query_id
        |  JOIN e ne ON ne.vec_id = sh.neighbor_id),
        |rr AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM rr WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // FULL oracle, zero fitted constants and zero float margins: sign
    // packing (bit b of the unit vector's dim b; ±0 both pack set, so
    // normalization underflow cannot flip a bit), xor, popcount and the
    // (hamming, id) total order are all integer-exact replays.
    "q_similarity_bq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT vec_id,
        |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS uv
        |  FROM e),
        |bits AS (SELECT vec_id,
        |    list_aggregate(list_transform(generate_series(0, 63),
        |      b -> CASE WHEN uv[b + 1] >= 0 THEN
        |             CASE WHEN b = 63 THEN (-9223372036854775808)::BIGINT
        |                  ELSE (1::BIGINT << b) END
        |           ELSE 0::BIGINT END), 'bit_or') AS w0
        |  FROM u),
        |pair AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(bit_count(xor(q.w0, c.w0)) AS INTEGER) AS hamming
        |  FROM bits q JOIN bits c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, hamming,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
        |  FROM pair)
        |SELECT query_id, neighbor_id, rank, hamming FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    "q_similarity_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qv, e.v) AS score
        |  FROM q JOIN e ON e.vec_id <> q.query_id),
        |ranked AS (SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // Full self-graph replay (every row is a query); rank-only output —
    // the ordering decisions' score gaps are pinned ≫ float noise by
    // SimilaritySpec, the ivf-gate trust argument.
    "q_knn_graph" -> KnnGraphOracleSql,

    // nprobe = nlist is exact by construction (spec-pinned), so the
    // indexed graph answers to the exact oracle verbatim.
    "q_knn_graph_indexed" -> KnnGraphOracleSql,

    // Ranks → reciprocity intersection → recursive-CTE components
    // (min-member labels): the full mutual-k-NN family walk.
    "q_semantic_families" ->
      s"""$KnnScoredCtes,
        |fwd AS (SELECT query_id AS u, neighbor_id AS v FROM ranked WHERE rank <= 4),
        |m AS (SELECT a.u, a.v FROM fwd a JOIN fwd b ON b.u = a.v AND b.v = a.u
        |      WHERE a.u < a.v),
        |ee AS (SELECT u, v FROM m UNION SELECT v, u FROM m),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT u, u FROM ee
        |    UNION
        |    SELECT ee.v, r.rep FROM r JOIN ee ON ee.u = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node)
        |SELECT node AS vec_id, rep AS family FROM comp
        |ORDER BY vec_id""".stripMargin,

    // The indexed composition at nprobe = nlist is exact by
    // construction — the exact families oracle verbatim.
    "q_semantic_families_indexed" ->
      s"""$KnnScoredCtes,
        |fwd AS (SELECT query_id AS u, neighbor_id AS v FROM ranked WHERE rank <= 4),
        |m AS (SELECT a.u, a.v FROM fwd a JOIN fwd b ON b.u = a.v AND b.v = a.u
        |      WHERE a.u < a.v),
        |ee AS (SELECT u, v FROM m UNION SELECT v, u FROM m),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT u, u FROM ee
        |    UNION
        |    SELECT ee.v, r.rep FROM r JOIN ee ON ee.u = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node)
        |SELECT node AS vec_id, rep AS family FROM comp
        |ORDER BY vec_id""".stripMargin,

    // Every A×B cosine, both k-NN means (decimal-exact addends, double
    // division), both NN1 candidate directions, and the rounded ratio
    // margin replayed end to end. The NN1 choices and the threshold
    // compare are discrete decisions whose gaps at the fixture are
    // pinned ≫ float noise by SimilaritySpec.
    "q_bitext_mine" -> BitextMineOracleSql,

    // The indexed form at nprobe = nlist is exact by construction
    // (spec-pinned), so its oracle is the exact-mining SQL verbatim —
    // any index-path divergence breaks the hash.
    "q_bitext_indexed" -> BitextMineOracleSql,

    // The oracle emits the ORIGINAL text; the query emits the
    // detokenized re-encode. Hash equality == losslessness.
    "q_bpe_roundtrip" ->
      """SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,



    // The hashing-TF vectors rebuilt from the same md5 hash, then the
    // exact cosine: dot and norms are integer sums (order-free exact),
    // one sqrt + one division — scores bit-identical, no float trust.
    "q_text_knn" -> {
      s"""WITH docs AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |vec AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), i -> CAST(len(list_filter(toks,
        |      t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 64 = i)) AS DOUBLE)) AS v
        |  FROM docs),
        |q AS (SELECT doc_id AS query_id, v AS qv FROM vec WHERE doc_id < 8),
        |scored AS (
        |  SELECT q.query_id, vec.doc_id AS neighbor_id,
        |    list_sum(list_transform(range(1, 65), i -> q.qv[i] * vec.v[i])) AS dot,
        |    list_sum(list_transform(q.qv, x -> x * x)) AS na,
        |    list_sum(list_transform(vec.v, x -> x * x)) AS nb
        |  FROM vec JOIN q ON vec.doc_id <> q.query_id),
        |sc AS (
        |  SELECT query_id, neighbor_id,
        |    CASE WHEN na * nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
        |  FROM scored),
        |ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM sc)
        |SELECT query_id, neighbor_id, rank, CAST(score AS REAL) AS score
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin
    },

    // The chunk-window slices (q_chunk_windows' arithmetic), the
    // hashing-TF vectors (q_text_knn's md5 bucketing), and the decimal
    // means (q_embed_meanpool's rollup) composed — each fragment its
    // standalone gate's proven form.
    "q_chunk_pool" -> ChunkPoolOracleSql,

    // same replay gates q_doc_embed: documentEmbeddings(HashingTfEncoder)
    // IS the q_chunk_pool composition behind the encoder seam, so any
    // seam-path divergence (row surgery, cast, pooling) breaks the hash
    "q_doc_embed" -> ChunkPoolOracleSql,

    // Per-(group, position) decimal-exact means over the widened
    // doubles, list-assembled in position order — bit-identical in both
    // engines by construction.
    "q_embed_meanpool" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ex AS (
        |  SELECT vec_id % 16 AS grp, s.i AS p, v[s.i] AS x
        |  FROM e,
        |       UNNEST(list_transform(generate_series(1, len(v)), y -> y)) AS s(i)),
        |m AS (
        |  SELECT grp, p,
        |    CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mx
        |  FROM ex GROUP BY grp, p)
        |SELECT grp, p - 1 AS dim, CAST(mx AS REAL) AS value
        |FROM m
        |ORDER BY grp, dim""".stripMargin,

    // The max-cosine rollup replayed; survivors are corpus vectors
    // under the tau ceiling against every eval vector. The tau boundary
    // gap at the fixture is pinned in SimilaritySpec.
    "q_semantic_decon" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ev AS (SELECT vec_id, v FROM e WHERE vec_id % 31 = 0),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id % 31 <> 0),
        |mx AS (SELECT c.vec_id, MAX(list_cosine_similarity(c.v, ev.v)) AS m
        |  FROM c CROSS JOIN ev GROUP BY c.vec_id)
        |-- COALESCE mirrors the Spark-side null-embedding policy: a
        |-- corpus row with no vector cannot be assessed and SURVIVES
        |SELECT vec_id FROM mx WHERE COALESCE(m, -2) < 0.377
        |ORDER BY vec_id""".stripMargin,

    "q_cosine_native" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS vec_id,
        |  CAST(list_cosine_similarity(a.v, b.v) AS REAL) AS cos_next
        |FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
        |ORDER BY vec_id""".stripMargin,

    "q_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,

    // FULL oracle — the exact probe×corpus threshold filter (every
    // index candidate is exact-verified; the nprobe cell cover is
    // measured recall-complete on the gate fixture — see the query-side
    // comment for the 30× recall measurement).
    "q_embedding_neardup_incr" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id
        |FROM e p JOIN e c ON p.vec_id % 7 = 0 AND c.vec_id % 7 <> 0
        |WHERE list_cosine_similarity(p.v, c.v) >= 0.45
        |ORDER BY probe_id, corpus_id""".stripMargin,

    "q_text_repetition" ->
      s"""WITH n AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents),
        |t AS (
        |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS toks FROM n),
        |g2 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 1),
        |              i -> array_to_string(toks[i:i+1], ' ')) END) AS g
        |  FROM t),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |s2 AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS v FROM c2 GROUP BY doc_id),
        |g3 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 2),
        |              i -> array_to_string(toks[i:i+2], ' ')) END) AS g
        |  FROM t),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |s3 AS (SELECT doc_id, 1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c) AS v FROM c3 GROUP BY doc_id)
        |SELECT s2.doc_id,
        |  floor(s2.v * 10000 + 0.5) / 10000 AS top2_frac,
        |  floor(s3.v * 10000 + 0.5) / 10000 AS dup3_frac
        |FROM s2 JOIN s3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_sample_quota" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) AS hh
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk
        |  FROM h)
        |SELECT doc_id, source FROM r WHERE rk <= 50
        |ORDER BY doc_id""".stripMargin,

    // Global hash order replayed with a plain window rank: Spark's
    // distributed range-partition + offset machinery must produce the
    // identical dense 1..n ranking DuckDB gets from one ORDER BY over
    // the same lowercase-hex md5 keys (unique ids ⇒ strict total
    // order, no tie ambiguity).
    "q_shuffle_order" ->
      """SELECT doc_id,
        |  ROW_NUMBER() OVER (
        |    ORDER BY md5(doc_id::VARCHAR || ':' || '42'), doc_id) AS shuffle_rank
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Same md5 walk order as q_shuffle_order; round-robin shard deal;
    // bit_xor over the portable per-doc hash of id:text (id mixed in so
    // equal-text pairs cannot XOR-cancel) replays the order-free
    // content checksum exactly.
    "q_shard_manifest" ->
      """WITH r AS (
        |  SELECT doc_id, text,
        |    ROW_NUMBER() OVER (
        |      ORDER BY md5(doc_id::VARCHAR || ':' || '42'), doc_id) AS rk
        |  FROM documents)
        |SELECT CAST((rk - 1) % 8 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens,
        |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
        |  bit_xor(CAST(('0x' || substring(md5(strlen(doc_id::VARCHAR)::VARCHAR || ':' || doc_id::VARCHAR || ':' || text), 1, 15)) AS BIGINT)) AS content_hash
        |FROM r
        |GROUP BY 1
        |ORDER BY shard""".stripMargin,

    // Full parquet-side re-derivation of the binary export's read-back:
    // vocabulary ids from row_number−1 over sorted distinct tokens, ids
    // re-joined in token order (unnest zipped with generate_subscripts),
    // shard/ordinal from the q_shard_manifest md5 deal. The Spark side
    // answered from DECODED BYTES, so agreement proves the .bin/.idx
    // layout round-trips content, deal, and training order.
    "q_tokenized_export" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |v AS (
        |  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS INT) AS id
        |  FROM (SELECT DISTINCT unnest(toks) AS token FROM t)),
        |x AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |    generate_subscripts(toks, 1) AS pos
        |  FROM t),
        |e AS (
        |  SELECT x.doc_id,
        |    array_to_string(list(v.id::VARCHAR ORDER BY x.pos), ' ') AS ids,
        |    count(*) AS n_tokens
        |  FROM x JOIN v USING (token) GROUP BY x.doc_id),
        |r AS (
        |  SELECT doc_id, ROW_NUMBER() OVER (
        |    ORDER BY md5(doc_id::VARCHAR || ':' || '42'), doc_id) AS rk
        |  FROM t),
        |s AS (
        |  SELECT doc_id, (rk - 1) % 4 AS shard,
        |    ROW_NUMBER() OVER (PARTITION BY (rk - 1) % 4 ORDER BY rk) - 1 AS ordinal
        |  FROM r)
        |SELECT t.doc_id, CAST(s.shard AS BIGINT) AS shard,
        |  CAST(s.ordinal AS BIGINT) AS ordinal,
        |  CAST(COALESCE(e.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  COALESCE(e.ids, '') AS ids
        |FROM t JOIN s USING (doc_id) LEFT JOIN e USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // One windowed integer SUM over the same md5 walk order replays the
    // distributed two-phase prefix sum exactly.
    "q_token_budget" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    md5(doc_id::VARCHAR || ':' || '42') AS hh
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    SUM(n_chars) OVER (ORDER BY hh, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS running_total
        |  FROM h)
        |SELECT doc_id, CAST(running_total AS BIGINT) AS running_total
        |FROM r WHERE running_total <= 50000
        |ORDER BY doc_id""".stripMargin,

    // Same walk order, summed per language, budget per group with the
    // en override inline.
    "q_token_budget_group" ->
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(doc_id::VARCHAR || ':' || '42') AS hh
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    SUM(n_chars) OVER (PARTITION BY lang ORDER BY hh, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS running_total
        |  FROM h)
        |SELECT doc_id, lang, CAST(running_total AS BIGINT) AS running_total
        |FROM r
        |WHERE running_total <= CASE WHEN lang = 'en' THEN 12000 ELSE 5000 END
        |ORDER BY doc_id""".stripMargin,

    // A-ES weighted reservoir: same portable-hash u, same ln(u)/w key,
    // same (key DESC, id) top-100. The denominator literal rounds to
    // exactly 2⁶⁰ in IEEE on both sides; the rank-100 key gap is ~1e-3,
    // twelve orders above cross-engine ln() jitter.
    "q_sample_weighted" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    (CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) + 1.0)
        |      / 1152921504606846976.0 AS u
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars FROM h
        |  ORDER BY ln(u) / CAST(n_chars AS DOUBLE) DESC, doc_id
        |  LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // The identical RE2 chain over the identical synthesized page:
    // payload removal (lazy (?is) spans), block-closer newlines, tag
    // strip, pinned-order entity decode (amp LAST so &amp;lt; comes out
    // as the literal text &lt;), whitespace collapse and edge trim.
    "q_html_extract" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id ||
        |    '</title><style type="text/css">body { margin: 0 }</style>' ||
        |    '<script>var a = "<p>hidden</p>";</script></head>' ||
        |    '<body><!-- nav' || chr(10) || 'block --><h1>Heading ' || doc_id ||
        |    '</h1><p>' || text ||
        |    '</p><div>5 &lt; 6 &amp; it&#39;s&nbsp;"ok&quot;</div>' ||
        |    '<p>Literal: &amp;lt; stays</p>' ||
        |    CASE WHEN doc_id % 2 = 0 THEN 'alpha<br>beta'
        |         ELSE '<ul><li>one</li><li>two</li></ul>' END ||
        |    '</body></html>' AS page
        |  FROM documents WHERE text IS NOT NULL),
        |s1 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(page,
        |    '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g') AS t FROM d),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |    '(?i)<(?:br\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote)\s*>',
        |    chr(10), 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(t,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |      '&nbsp;', ' '), '&amp;', '&') AS t
        |  FROM s3)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[ \t]*\n[ \t]*', chr(10), 'g'),
        |    '[ \t]+', ' ', 'g'),
        |    '^[ \n]+|[ \n]+$', '', 'g') AS text
        |FROM s4 ORDER BY doc_id""".stripMargin,

    // Expected verdicts derived INDEPENDENTLY by id arithmetic (never
    // by evaluating robots rules): shapes 0/2/4/5 allow (agent-group
    // override, longest-match allow, unanchored .gifx, no robots),
    // 1/3 block (path prefix, wildcard+anchor).
    "q_robots_filter" ->
      """SELECT doc_id,
        |  CAST((doc_id % 6) IN (0, 2, 4, 5) AS INT) AS allowed
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // The q_dedup_spans window replay rolled up per language: per-doc
    // (total, removed) token counts from the same coverage walk —
    // fully-covered docs carry rem == tot (no HAVING filter here),
    // zero-token docs fall out of the token explode and coalesce to 0.
    "q_span_stats" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (
        |  SELECT doc_id, g.i - 1 AS s,
        |    CAST(('0x' || substring(md5(array_to_string(toks[g.i:g.i+7], ' ')), 1, 15)) AS BIGINT) AS gram
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS g(i)
        |  WHERE len(toks) >= 8),
        |d AS (
        |  SELECT doc_id, s,
        |    count(*) OVER (PARTITION BY gram) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, s) AS rn
        |  FROM o),
        |cov AS (
        |  SELECT DISTINCT doc_id, g.ix AS ix
        |  FROM d, unnest(generate_series(s, s + 7)) AS g(ix)
        |  WHERE cnt >= 2 AND rn >= 2),
        |tok AS (
        |  SELECT doc_id, g.i - 1 AS ix
        |  FROM t, unnest(generate_series(1, len(toks))) AS g(i)
        |  WHERE len(toks) >= 1),
        |j AS (
        |  SELECT tok.doc_id, cov.ix IS NOT NULL AS rm
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.ix = cov.ix),
        |per AS (
        |  SELECT doc_id, count(*) AS tot,
        |    count(*) FILTER (WHERE rm) AS rem
        |  FROM j GROUP BY doc_id)
        |SELECT t.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(per.tot, 0)) AS BIGINT) AS n_tokens,
        |  CAST(sum(coalesce(per.rem, 0)) AS BIGINT) AS n_tokens_removed,
        |  CASE WHEN sum(coalesce(per.tot, 0)) = 0 THEN 0.0
        |       ELSE floor(sum(coalesce(per.rem, 0)) * 1.0 /
        |                  sum(coalesce(per.tot, 0)) * 1e4 + 0.5) / 1e4
        |  END AS dup_share
        |FROM t LEFT JOIN per USING (doc_id)
        |GROUP BY t.lang
        |ORDER BY t.lang""".stripMargin,

    // Stage-for-stage composition: the q_robots_filter id arithmetic
    // gates the input, the q_html_extract RE2 chain extracts, the
    // q_unicode_clean normalize+strip cleans (nfc AFTER extraction —
    // the operator order of the Spark side), the q_boilerplate
    // list_filter strips debris lines, one integer length compare.
    "q_pii_cards" -> PiiCardsOracleSql,

    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, vec_id % 5 AS label, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS ql, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
        |    list_cosine_similarity(q.qv, e.v) AS score
        |  FROM q JOIN e ON e.vec_id <> q.query_id AND e.label <> q.ql),
        |ranked AS (SELECT query_id, neighbor_id, neighbor_label,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, neighbor_label, rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_heaps_report" -> HeapsOracleSql,

    // The TAR hop is lossless by contract: the recovered frame equals
    // the parquet original field-for-field.
    "q_wds_image_dedup" ->
      """SELECT range AS id, range % 30 AS component
        |FROM range(0, 180)
        |ORDER BY id""".stripMargin,

    "q_webdataset" ->
      """SELECT doc_id, text, lang FROM documents
        |WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "q_video_neardup" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 120))
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(3 AS BIGINT) AS n_matched, CAST(3 AS BIGINT) AS n_frames
        |FROM ids a JOIN ids b ON a.id < b.id AND a.id % 20 = b.id % 20
        |ORDER BY id_a, id_b""".stripMargin,

    "q_audio_neardup" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 240))
        |SELECT a.id AS id_a, b.id AS id_b, CAST(0 AS INT) AS hamming
        |FROM ids a JOIN ids b ON a.id < b.id AND a.id % 30 = b.id % 30
        |ORDER BY id_a, id_b""".stripMargin,

    "q_image_neardup" ->
      """WITH ids AS (SELECT range AS id FROM range(0, 360))
        |SELECT a.id AS id_a, b.id AS id_b, CAST(0 AS INT) AS hamming
        |FROM ids a JOIN ids b ON a.id < b.id AND a.id % 40 = b.id % 40
        |ORDER BY id_a, id_b""".stripMargin,

    "q_zipf_report" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_types FROM c),
        |top AS (SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
        |  FROM c ORDER BY c DESC, w LIMIT 200),
        |f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy
        |  FROM top)
        |SELECT tot.n_tokens, tot.n_types,
        |  (SELECT w FROM top WHERE r = 1) AS top_word,
        |  (SELECT c FROM top WHERE r = 1) AS top_freq,
        |  floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 10000 + 0.5) / 10000 AS zipf_slope,
        |  floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * 10000 + 0.5) / 10000 AS zipf_intercept
        |FROM f, tot""".stripMargin,

    "q_confusables" -> ConfusablesOracleSql,

    "q_jl_project" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ij AS (SELECT i.i, j.j
        |  FROM (SELECT unnest(generate_series(0, 63)) AS i) i
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j),
        |sgn AS (SELECT i, j,
        |    CASE WHEN ('0x' || substr(md5('1:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT & 1 = 1
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM ij),
        |sl AS (SELECT j, list(s ORDER BY i) AS sl FROM sgn GROUP BY j),
        |p AS (SELECT e.vec_id, CAST(sl.j AS INTEGER) AS dim,
        |        CAST(list_inner_product(e.v, sl.sl) * 0.25 AS REAL) AS value
        |      FROM e CROSS JOIN sl)
        |SELECT vec_id, dim, value FROM p ORDER BY vec_id, dim""".stripMargin,

    "q_chat_flatten" ->
      """WITH d AS (
        |  SELECT doc_id % 50 AS conv_id, doc_id, substring(text, 1, 40) AS content
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT conv_id, content,
        |        ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY doc_id) - 1 AS rk
        |      FROM d),
        |t AS (SELECT conv_id, CAST(rk AS INTEGER) AS turn_ix, content,
        |        CASE WHEN conv_id % 7 = 0 THEN 'user'
        |             WHEN rk % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
        |      FROM r),
        |seg AS (SELECT conv_id, turn_ix, role,
        |          4 + length(role) + length(content) AS seg_len,
        |          content
        |        FROM t),
        |f AS (SELECT conv_id, turn_ix, role,
        |        CAST(SUM(seg_len) OVER (PARTITION BY conv_id ORDER BY turn_ix
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_end,
        |        CAST(seg_len AS BIGINT) AS seg_len,
        |        content
        |      FROM seg),
        |v AS (SELECT conv_id, COUNT(*) AS n_turns,
        |        MAX(CASE WHEN turn_ix = 0 THEN role END) AS first_role,
        |        (SUM(CASE WHEN role = (CASE WHEN turn_ix % 2 = 0 THEN 'user' ELSE 'assistant' END)
        |              THEN 1 ELSE 0 END) = COUNT(*)
        |         OR SUM(CASE WHEN role = (CASE WHEN turn_ix % 2 = 0 THEN 'assistant' ELSE 'user' END)
        |              THEN 1 ELSE 0 END) = COUNT(*)) AS alternates,
        |        arg_max(role, turn_ix) AS last_role,
        |        MAX(CASE WHEN content IS NULL OR length(trim(content)) = 0
        |              THEN 1 ELSE 0 END) AS has_empty
        |      FROM f GROUP BY conv_id)
        |SELECT f.conv_id, f.turn_ix, f.role,
        |  f.seg_end - f.seg_len AS seg_start, f.seg_end,
        |  f.role = 'assistant' AS train_on,
        |  v.n_turns,
        |  (v.first_role = 'user' AND v.alternates
        |    AND v.last_role = 'assistant' AND v.has_empty = 0) AS valid
        |FROM f JOIN v ON v.conv_id = f.conv_id
        |ORDER BY f.conv_id, f.turn_ix""".stripMargin,

    "q_chat_pack" ->
      """WITH d AS (
        |  SELECT doc_id % 50 AS conv_id, doc_id, substring(text, 1, 40) AS content
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT conv_id, content,
        |        ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY doc_id) - 1 AS rk
        |      FROM d),
        |t AS (SELECT conv_id, CAST(rk AS INTEGER) AS turn_ix, content,
        |        CASE WHEN conv_id % 7 = 0 THEN 'user'
        |             WHEN rk % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
        |      FROM r),
        |flat AS (SELECT conv_id,
        |           string_agg('<|' || role || '|>' || content, '' ORDER BY turn_ix) AS text,
        |           CAST(SUM(4 + length(role) + length(content)) AS BIGINT) AS clen
        |         FROM t GROUP BY conv_id),
        |tt AS (SELECT conv_id, conv_id % 8 AS stream,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok,
        |         clen
        |       FROM flat),
        |o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY stream ORDER BY conv_id) AS rn FROM tt),
        |rec AS (
        |  WITH RECURSIVE rr(stream, rn, conv_id, ntok, clen, pack, ofs) AS (
        |    SELECT stream, rn, conv_id, ntok, clen, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |    FROM o WHERE rn = 1
        |    UNION ALL
        |    SELECT o.stream, o.rn, o.conv_id, o.ntok, o.clen,
        |      CASE WHEN rr.ofs + rr.ntok > 0 AND rr.ofs + rr.ntok + o.ntok > 120
        |           THEN rr.pack + 1 ELSE rr.pack END,
        |      CASE WHEN rr.ofs + rr.ntok > 0 AND rr.ofs + rr.ntok + o.ntok > 120
        |           THEN CAST(0 AS BIGINT) ELSE rr.ofs + rr.ntok END
        |    FROM rr JOIN o ON o.stream = rr.stream AND o.rn = rr.rn + 1)
        |  SELECT * FROM rr),
        |off AS (SELECT conv_id, stream, pack,
        |          CAST(SUM(clen) OVER (PARTITION BY stream, pack ORDER BY conv_id
        |            ROWS UNBOUNDED PRECEDING) - clen AS BIGINT) AS conv_start
        |        FROM rec),
        |seg AS (SELECT conv_id, turn_ix, role,
        |          CAST(4 + length(role) + length(content) AS BIGINT) AS seg_len
        |        FROM t),
        |f AS (SELECT conv_id, turn_ix, role, seg_len,
        |        CAST(SUM(seg_len) OVER (PARTITION BY conv_id ORDER BY turn_ix
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_end
        |      FROM seg)
        |SELECT f.conv_id, off.stream, off.pack, f.turn_ix, f.role,
        |  off.conv_start + f.seg_end - f.seg_len AS ex_start,
        |  off.conv_start + f.seg_end AS ex_end,
        |  f.role = 'assistant' AS train_on
        |FROM f JOIN off ON off.conv_id = f.conv_id
        |ORDER BY f.conv_id, f.turn_ix""".stripMargin,

    "q_sketch_hist" ->
      """WITH d0 AS (SELECT source, n_chars FROM documents WHERE n_chars IS NOT NULL),
        |d AS (SELECT source, n_chars FROM d0
        |      UNION ALL SELECT '*' AS source, n_chars FROM d0),
        |b AS (SELECT source, n_chars,
        |    CASE WHEN n_chars < 32 THEN n_chars
        |         ELSE (length(bin(n_chars)) - 5) * 32
        |              + ((n_chars >> (length(bin(n_chars)) - 6)) & 31) END AS bucket
        |  FROM d),
        |h AS (SELECT source, bucket, COUNT(*) AS cnt FROM b GROUP BY source, bucket),
        |c AS (SELECT source, bucket, cnt,
        |        SUM(cnt) OVER (PARTITION BY source ORDER BY bucket
        |          ROWS UNBOUNDED PRECEDING) AS cum,
        |        SUM(cnt) OVER (PARTITION BY source) AS n
        |      FROM h),
        |ps(p, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)),
        |sel AS (SELECT c.source, ps.p, MIN(bucket) AS b
        |        FROM c CROSS JOIN ps
        |        WHERE cum >= (n * num + den - 1) // den
        |        GROUP BY c.source, ps.p),
        |est AS (SELECT source, p,
        |          CASE WHEN b < 32 THEN b
        |               ELSE (32 + (b & 31)) << ((b >> 5) - 1) END AS q_est
        |        FROM sel),
        |rn AS (SELECT source, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS n
        |       FROM d),
        |ex AS (SELECT rn.source, ps.p, n_chars AS q_exact
        |       FROM rn CROSS JOIN ps
        |       WHERE rn.rn = (n * num + den - 1) // den)
        |SELECT est.source, est.p, CAST(q_est AS BIGINT) AS q_est,
        |  CAST(q_exact AS BIGINT) AS q_exact
        |FROM est JOIN ex ON ex.source = est.source AND ex.p = est.p
        |ORDER BY est.source, est.p""".stripMargin,

    "q_zorder" ->
      """WITH z0 AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(list_sum(list_transform(generate_series(0, 15), b ->
        |      (((l_partkey >> b) & 1) << (b * 2)) +
        |      (((l_suppkey >> b) & 1) << (b * 2 + 1)))) AS BIGINT) AS z
        |  FROM lineitem)
        |SELECT z >> 24 AS z_prefix,
        |  COUNT(*) AS n_rows,
        |  MIN(z) AS z_min, MAX(z) AS z_max,
        |  MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
        |  MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max
        |FROM z0
        |GROUP BY z >> 24
        |ORDER BY z_prefix""".stripMargin,

    "q_hilbert" ->
      s"""WITH ${hilbertOracleCtes(16)}
        |SELECT hd >> 24 AS h_prefix,
        |  COUNT(*) AS n_rows,
        |  MIN(hd) AS h_min, MAX(hd) AS h_max,
        |  MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
        |  MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max
        |FROM h16
        |GROUP BY hd >> 24
        |ORDER BY h_prefix""".stripMargin,

    "q_prune_stats" ->
      """WITH m AS (
        |  SELECT CAST(stats_min AS BIGINT) AS stat_min,
        |    CAST(stats_max AS BIGINT) AS stat_max,
        |    row_group_num_rows AS n_rows
        |  FROM parquet_metadata('/root/repo/data/oracle_side/sf0.01/zorder_layout/*.parquet')
        |  WHERE path_in_schema = 'z_value')
        |SELECT ROW_NUMBER() OVER (ORDER BY stat_min, stat_max) - 1 AS ordinal,
        |  stat_min, stat_max, n_rows
        |FROM m
        |ORDER BY ordinal""".stripMargin,

    "q_jl_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ij AS (SELECT i.i, j.j
        |  FROM (SELECT unnest(generate_series(0, 63)) AS i) i
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j),
        |sgn AS (SELECT i, j,
        |    CASE WHEN ('0x' || substr(md5('1:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT & 1 = 1
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM ij),
        |sl AS (SELECT j, list(s ORDER BY i) AS sl FROM sgn GROUP BY j),
        |pr AS (SELECT e.vec_id, sl.j,
        |        CAST(CAST(list_inner_product(e.v, sl.sl) * 0.25 AS REAL) AS DOUBLE) AS value
        |      FROM e CROSS JOIN sl),
        |pv AS (SELECT vec_id, list(value ORDER BY j) AS pv FROM pr GROUP BY vec_id),
        |extop AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank
        |    FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
        |  WHERE rank <= 10),
        |prtop AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.pv, c.pv) DESC, c.vec_id) AS rank
        |    FROM pv q JOIN pv c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
        |  WHERE rank <= 10),
        |h AS (SELECT extop.query_id, COUNT(*) AS n_hit
        |      FROM extop JOIN prtop
        |        ON prtop.query_id = extop.query_id
        |       AND prtop.neighbor_id = extop.neighbor_id
        |      GROUP BY extop.query_id)
        |SELECT e.vec_id AS query_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit
        |FROM e LEFT JOIN h ON h.query_id = e.vec_id
        |WHERE e.vec_id < 8
        |ORDER BY query_id""".stripMargin,

    "q_sketch_hll" ->
      """WITH tk AS (
        |  SELECT source,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |      x -> x <> '') AS ntoks
        |  FROM documents WHERE text IS NOT NULL),
        |g0 AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |         ELSE list_transform(generate_series(1, len(ntoks) - 2),
        |                i -> array_to_string(ntoks[i:i+2], ' ')) END) AS g3
        |  FROM tk),
        |g AS (SELECT source, g3 FROM g0 WHERE g3 <> ''
        |      UNION ALL SELECT '*' AS source, g3 FROM g0 WHERE g3 <> ''),
        |h AS (SELECT source, ('0x' || substr(md5(g3), 1, 15))::BIGINT AS h FROM g),
        |r AS (SELECT source, h & 1023 AS bucket,
        |        CASE WHEN (h >> 10) = 0 THEN 51 ELSE 50 - length(bin(h >> 10)) + 1 END AS rho
        |      FROM h),
        |regs AS (SELECT source, bucket, MAX(rho) AS max_rho FROM r GROUP BY source, bucket),
        |agg AS (SELECT source, COUNT(*) AS set_buckets,
        |          SUM(1::HUGEINT << (60 - max_rho)) AS z_set FROM regs GROUP BY source),
        |e AS (SELECT source, set_buckets, 1024 - set_buckets AS v_zero,
        |        CAST(z_set + (1024 - set_buckets)::HUGEINT * (1::HUGEINT << 60) AS DOUBLE) AS z
        |      FROM agg),
        |f AS (SELECT source, set_buckets, v_zero,
        |        0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 * 1152921504606846976.0 / z AS raw
        |      FROM e),
        |x AS (SELECT source, CAST(set_buckets AS BIGINT) AS set_buckets,
        |        CAST(v_zero AS BIGINT) AS v_zero,
        |        floor((CASE WHEN raw <= 2560.0 AND v_zero > 0
        |               THEN 1024.0 * ln(1024.0 / CAST(v_zero AS DOUBLE)) ELSE raw END)
        |          * 10000 + 0.5) / 10000 AS n_distinct_est
        |      FROM f),
        |n AS (SELECT source, COUNT(DISTINCT g3) AS n_exact FROM g GROUP BY source)
        |SELECT x.source, set_buckets, v_zero, n_distinct_est, n_exact
        |FROM x JOIN n USING (source) ORDER BY source""".stripMargin,

    "q_sketch_kmv" ->
      """WITH tk AS (
        |  SELECT source,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |      x -> x <> '') AS ntoks
        |  FROM documents WHERE text IS NOT NULL),
        |g0 AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |         ELSE list_transform(generate_series(1, len(ntoks) - 2),
        |                i -> array_to_string(ntoks[i:i+2], ' ')) END) AS g3
        |  FROM tk),
        |g AS (SELECT source, g3 FROM g0 WHERE g3 <> ''),
        |dh AS (SELECT DISTINCT source, ('0x' || substr(md5(g3), 1, 15))::BIGINT AS h FROM g),
        |sg AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM dh),
        |s AS (SELECT source, h, rn FROM sg WHERE rn <= 128),
        |c AS (SELECT source, COUNT(*) AS sz, MAX(CASE WHEN rn = 128 THEN h END) AS hk
        |      FROM s GROUP BY source),
        |est AS (SELECT source,
        |          floor((CASE WHEN sz >= 128 THEN 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)
        |                 ELSE CAST(sz AS DOUBLE) END) * 10000 + 0.5) / 10000 AS est
        |        FROM c),
        |p AS (SELECT a.source AS src_a, b.source AS src_b FROM c a JOIN c b ON a.source < b.source),
        |u AS (SELECT DISTINCT p.src_a, p.src_b, s.h
        |      FROM p JOIN s ON s.source = p.src_a OR s.source = p.src_b),
        |x AS (SELECT src_a, src_b, h,
        |        ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn FROM u),
        |xx AS (SELECT src_a, src_b, h FROM x WHERE rn <= 128),
        |num AS (SELECT xx.src_a, xx.src_b, COUNT(*) AS xsz,
        |          SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END) AS inter
        |        FROM xx
        |        LEFT JOIN s sa ON sa.source = xx.src_a AND sa.h = xx.h
        |        LEFT JOIN s sb ON sb.source = xx.src_b AND sb.h = xx.h
        |        GROUP BY xx.src_a, xx.src_b),
        |dw AS (SELECT DISTINCT source, g3 FROM g),
        |cn AS (SELECT source, COUNT(*) AS n FROM dw GROUP BY source),
        |ix AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
        |       FROM dw a JOIN dw b ON a.g3 = b.g3 AND a.source < b.source GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, ea.est AS est_a, eb.est AS est_b,
        |  floor(CAST(num.inter AS DOUBLE) / CAST(num.xsz AS DOUBLE) * 10000 + 0.5) / 10000
        |    AS kmv_jaccard,
        |  floor(CAST(COALESCE(ix.n_inter, 0) AS DOUBLE)
        |    / CAST(ca.n + cb.n - COALESCE(ix.n_inter, 0) AS DOUBLE) * 10000 + 0.5) / 10000
        |    AS exact_jaccard
        |FROM p
        |JOIN est ea ON ea.source = p.src_a
        |JOIN est eb ON eb.source = p.src_b
        |JOIN num ON num.src_a = p.src_a AND num.src_b = p.src_b
        |JOIN cn ca ON ca.source = p.src_a
        |JOIN cn cb ON cb.source = p.src_b
        |LEFT JOIN ix ON ix.src_a = p.src_a AND ix.src_b = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,

    "q_sketch_setops" ->
      """WITH tk AS (
        |  SELECT source,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |      x -> x <> '') AS ntoks
        |  FROM documents WHERE text IS NOT NULL),
        |g0 AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |         ELSE list_transform(generate_series(1, len(ntoks) - 2),
        |                i -> array_to_string(ntoks[i:i+2], ' ')) END) AS g3
        |  FROM tk),
        |g AS (SELECT source, g3 FROM g0 WHERE g3 <> ''),
        |dh AS (SELECT DISTINCT source, ('0x' || substr(md5(g3), 1, 15))::BIGINT AS h FROM g),
        |sg AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM dh),
        |s AS (SELECT source, h, rn FROM sg WHERE rn <= 128),
        |c AS (SELECT source, COUNT(*) AS sz, MAX(CASE WHEN rn = 128 THEN h END) AS hk
        |      FROM s GROUP BY source),
        |est AS (SELECT source,
        |          floor((CASE WHEN sz >= 128 THEN 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)
        |                 ELSE CAST(sz AS DOUBLE) END) * 10000 + 0.5) / 10000 AS est
        |        FROM c),
        |p AS (SELECT a.source AS src_a, b.source AS src_b FROM c a JOIN c b ON a.source < b.source),
        |u AS (SELECT DISTINCT p.src_a, p.src_b, s.h
        |      FROM p JOIN s ON s.source = p.src_a OR s.source = p.src_b),
        |x AS (SELECT src_a, src_b, h,
        |        ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn FROM u),
        |xx AS (SELECT src_a, src_b, h, rn FROM x WHERE rn <= 128),
        |num AS (SELECT xx.src_a, xx.src_b, COUNT(*) AS xsz,
        |          MAX(CASE WHEN xx.rn = 128 THEN xx.h END) AS hk_x,
        |          SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END) AS inter
        |        FROM xx
        |        LEFT JOIN s sa ON sa.source = xx.src_a AND sa.h = xx.h
        |        LEFT JOIN s sb ON sb.source = xx.src_b AND sb.h = xx.h
        |        GROUP BY xx.src_a, xx.src_b),
        |ei AS (SELECT src_a, src_b,
        |         floor(CAST(inter AS DOUBLE) / CAST(xsz AS DOUBLE)
        |           * (CASE WHEN xsz >= 128 THEN 127.0 * 1152921504606846976.0 / CAST(hk_x AS DOUBLE)
        |              ELSE CAST(xsz AS DOUBLE) END) * 10000 + 0.5) / 10000 AS est_inter
        |       FROM num),
        |dw AS (SELECT DISTINCT source, g3 FROM g),
        |cn AS (SELECT source, COUNT(*) AS n FROM dw GROUP BY source),
        |ix AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
        |       FROM dw a JOIN dw b ON a.g3 = b.g3 AND a.source < b.source GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b,
        |  ei.est_inter,
        |  floor((ea.est - ei.est_inter) * 10000 + 0.5) / 10000 AS est_diff,
        |  CAST(COALESCE(ix.n_inter, 0) AS BIGINT) AS exact_inter,
        |  CAST(ca.n - COALESCE(ix.n_inter, 0) AS BIGINT) AS exact_diff
        |FROM p
        |JOIN est ea ON ea.source = p.src_a
        |JOIN ei ON ei.src_a = p.src_a AND ei.src_b = p.src_b
        |JOIN cn ca ON ca.source = p.src_a
        |LEFT JOIN ix ON ix.src_a = p.src_a AND ix.src_b = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,

    // The setops replay (same sig/union/intersection CTEs) extended
    // with the guarded containment ratio in the same IEEE order as
    // kmvContainmentCol: rounded-intersect / rounded-estimate, one
    // division, re-floored to 1e-4; exact directional counterparts
    // from the distinct-gram counts.
    "q_sketch_containment" ->
      """WITH tk AS (
        |  SELECT source,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |      x -> x <> '') AS ntoks
        |  FROM documents WHERE text IS NOT NULL),
        |g0 AS (
        |  SELECT source, unnest(
        |    CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |         ELSE list_transform(generate_series(1, len(ntoks) - 2),
        |                i -> array_to_string(ntoks[i:i+2], ' ')) END) AS g3
        |  FROM tk),
        |g AS (SELECT source, g3 FROM g0 WHERE g3 <> ''),
        |dh AS (SELECT DISTINCT source, ('0x' || substr(md5(g3), 1, 15))::BIGINT AS h FROM g),
        |sg AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn FROM dh),
        |s AS (SELECT source, h, rn FROM sg WHERE rn <= 128),
        |c AS (SELECT source, COUNT(*) AS sz, MAX(CASE WHEN rn = 128 THEN h END) AS hk
        |      FROM s GROUP BY source),
        |est AS (SELECT source,
        |          floor((CASE WHEN sz >= 128 THEN 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)
        |                 ELSE CAST(sz AS DOUBLE) END) * 10000 + 0.5) / 10000 AS est
        |        FROM c),
        |p AS (SELECT a.source AS src_a, b.source AS src_b FROM c a JOIN c b ON a.source < b.source),
        |u AS (SELECT DISTINCT p.src_a, p.src_b, s.h
        |      FROM p JOIN s ON s.source = p.src_a OR s.source = p.src_b),
        |x AS (SELECT src_a, src_b, h,
        |        ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn FROM u),
        |xx AS (SELECT src_a, src_b, h, rn FROM x WHERE rn <= 128),
        |num AS (SELECT xx.src_a, xx.src_b, COUNT(*) AS xsz,
        |          MAX(CASE WHEN xx.rn = 128 THEN xx.h END) AS hk_x,
        |          SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END) AS inter
        |        FROM xx
        |        LEFT JOIN s sa ON sa.source = xx.src_a AND sa.h = xx.h
        |        LEFT JOIN s sb ON sb.source = xx.src_b AND sb.h = xx.h
        |        GROUP BY xx.src_a, xx.src_b),
        |ei AS (SELECT src_a, src_b,
        |         floor(CAST(inter AS DOUBLE) / CAST(xsz AS DOUBLE)
        |           * (CASE WHEN xsz >= 128 THEN 127.0 * 1152921504606846976.0 / CAST(hk_x AS DOUBLE)
        |              ELSE CAST(xsz AS DOUBLE) END) * 10000 + 0.5) / 10000 AS est_inter
        |       FROM num),
        |dw AS (SELECT DISTINCT source, g3 FROM g),
        |cn AS (SELECT source, COUNT(*) AS n FROM dw GROUP BY source),
        |ix AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
        |       FROM dw a JOIN dw b ON a.g3 = b.g3 AND a.source < b.source GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b,
        |  CASE WHEN ea.est = 0 THEN 0.0
        |       ELSE floor(ei.est_inter / ea.est * 10000 + 0.5) / 10000 END AS est_cont_ab,
        |  CASE WHEN eb.est = 0 THEN 0.0
        |       ELSE floor(ei.est_inter / eb.est * 10000 + 0.5) / 10000 END AS est_cont_ba,
        |  floor(CAST(COALESCE(ix.n_inter, 0) AS DOUBLE) / CAST(ca.n AS DOUBLE) * 10000 + 0.5) / 10000
        |    AS exact_cont_ab,
        |  floor(CAST(COALESCE(ix.n_inter, 0) AS DOUBLE) / CAST(cb.n AS DOUBLE) * 10000 + 0.5) / 10000
        |    AS exact_cont_ba
        |FROM p
        |JOIN est ea ON ea.source = p.src_a
        |JOIN est eb ON eb.source = p.src_b
        |JOIN ei ON ei.src_a = p.src_a AND ei.src_b = p.src_b
        |JOIN cn ca ON ca.source = p.src_a
        |JOIN cn cb ON cb.source = p.src_b
        |LEFT JOIN ix ON ix.src_a = p.src_a AND ix.src_b = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,

    "q_sketch_cms" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |      x -> x <> '') AS ntoks
        |  FROM documents WHERE text IS NOT NULL),
        |g0 AS (
        |  SELECT unnest(
        |    CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |         ELSE list_transform(generate_series(1, len(ntoks) - 2),
        |                i -> array_to_string(ntoks[i:i+2], ' ')) END) AS g3
        |  FROM tk),
        |g AS (SELECT g3 FROM g0 WHERE g3 <> ''),
        |d AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |rb AS (SELECT d.i,
        |         ('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' || g.g3), 1, 15))::BIGINT & 1023
        |           AS bucket
        |       FROM g CROSS JOIN d),
        |cnt AS (SELECT i, bucket, COUNT(*) AS cnt FROM rb GROUP BY i, bucket),
        |top AS (SELECT g3, COUNT(*) AS n_exact FROM g GROUP BY g3
        |        ORDER BY n_exact DESC, g3 LIMIT 20),
        |q AS (SELECT t.g3, t.n_exact, d.i,
        |        ('0x' || substr(md5(CAST(d.i AS VARCHAR) || ':' || t.g3), 1, 15))::BIGINT & 1023
        |          AS bucket
        |      FROM top t CROSS JOIN d)
        |SELECT q.g3, q.n_exact, MIN(COALESCE(cnt.cnt, 0)) AS cms_est
        |FROM q LEFT JOIN cnt ON cnt.i = q.i AND cnt.bucket = q.bucket
        |GROUP BY q.g3, q.n_exact
        |ORDER BY n_exact DESC, g3""".stripMargin,

    "q_dedup_family_sizes" ->
      s"""${DedupOracle.charShingleCtes("documents")},
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    ${DedupOracle.jaccardExpr} AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |e AS (SELECT id_a, id_b FROM p WHERE j >= 0.8),
        |ee AS (SELECT id_a AS u, id_b AS v FROM e
        |       UNION SELECT id_b, id_a FROM e),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT u, u FROM ee
        |    UNION
        |    SELECT ee.v, r.rep FROM r JOIN ee ON ee.u = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node),
        |fam AS (SELECT rep, COUNT(*) AS sz FROM comp GROUP BY rep)
        |SELECT sz AS family_size,
        |  COUNT(*) AS n_families,
        |  CAST(SUM(sz) AS BIGINT) AS n_docs
        |FROM fam
        |GROUP BY sz
        |ORDER BY family_size""".stripMargin,

    "q_novelty" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |      x -> x <> '') AS ntoks
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, gram FROM (
        |    SELECT doc_id, unnest(list_distinct(
        |      CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |           ELSE list_transform(generate_series(1, len(ntoks) - 2),
        |                  i -> array_to_string(ntoks[i:i+2], ' ')) END)) AS gram
        |    FROM tk)
        |  WHERE gram <> ''),
        |f AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
        |SELECT g.doc_id,
        |  COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  floor((CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)) * 10000 + 0.5) / 10000 AS novelty
        |FROM g JOIN f USING (gram)
        |GROUP BY g.doc_id
        |ORDER BY g.doc_id""".stripMargin,

    "q_split_stratified" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    md5(CAST(doc_id AS VARCHAR) || ':42') AS h
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM d)
        |SELECT doc_id, lang,
        |  CASE WHEN rk * 10 <= n * 8 THEN 'train'
        |       WHEN rk * 10 <= n * 9 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "q_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS score
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT quantile_cont(CAST(score AS DOUBLE), [0.25, 0.5, 0.75]) AS cs FROM d),
        |b AS (SELECT doc_id,
        |    (CASE WHEN CAST(score AS DOUBLE) > cs[1] THEN 1 ELSE 0 END
        |     + CASE WHEN CAST(score AS DOUBLE) > cs[2] THEN 1 ELSE 0 END
        |     + CASE WHEN CAST(score AS DOUBLE) > cs[3] THEN 1 ELSE 0 END) AS band,
        |    md5(CAST(doc_id AS VARCHAR) || ':42') AS h
        |  FROM d, c)
        |SELECT doc_id, band,
        |  ROW_NUMBER() OVER (ORDER BY band, h, doc_id) AS curriculum_order
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    "q_kcenter" -> KCenterOracleSql,
    "q_langid" -> LangIdOracleSql,
    "q_crawl_pipeline" -> CrawlPipelineOracleSql,
    // The q_crawl_pipeline replay verbatim: the WARC hop (serialize all
    // pages -> .warc.gz -> Warc.read -> gate on the read target_uri) is
    // lossless by contract, so the identical curated frame falls out.
    "q_warc_pipeline" -> CrawlPipelineOracleSql,

    // Same composite document (nav + prose + footer chrome), same
    // line-survival arithmetic via list_filter.
    "q_boilerplate" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(
        |    string_split('>> home | products | login | cart (0) <<' || chr(10) || text || chr(10)
        |      || '(c) 2024 | all rights reserved.' || chr(10) || 'cookies: accept-all', chr(10)),
        |    l -> len(list_filter(string_split(l, ' '), w -> w <> '')) >= 4
        |      AND CAST(length(regexp_replace(l, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |          >= 0.6 * CAST(length(l) AS DOUBLE)), chr(10)) AS clean
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Exact-Jaccard pair graph → recursive-CTE connected components →
    // min-member labels (the q_dbscan component machinery over the
    // q_dedup_minhash pair definition).
    "q_dedup_cluster" ->
      s"""${DedupOracle.charShingleCtes("documents")},
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    ${DedupOracle.jaccardExpr} AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |e AS (SELECT id_a, id_b FROM p WHERE j >= 0.8),
        |ee AS (SELECT id_a AS u, id_b AS v FROM e
        |       UNION SELECT id_b, id_a FROM e),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT u, u FROM ee
        |    UNION
        |    SELECT ee.v, r.rep FROM r JOIN ee ON ee.u = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node)
        |SELECT node AS doc_id, rep AS cluster FROM comp
        |ORDER BY doc_id""".stripMargin,

    // Quality-ranked representative: the q_dedup_cluster family walk,
    // then per family keep the (n_chars DESC, doc_id ASC) argmax; every
    // other family member drops, everything outside a family survives.
    "q_dedup_cluster_best" ->
      s"""${DedupOracle.charShingleCtes("documents")},
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    ${DedupOracle.jaccardExpr} AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |e AS (SELECT id_a, id_b FROM p WHERE j >= 0.8),
        |ee AS (SELECT id_a AS u, id_b AS v FROM e
        |       UNION SELECT id_b, id_a FROM e),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT u, u FROM ee
        |    UNION
        |    SELECT ee.v, r.rep FROM r JOIN ee ON ee.u = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node),
        |best AS (
        |  SELECT rep, node AS keep FROM (
        |    SELECT c.rep, c.node,
        |      row_number() OVER (PARTITION BY c.rep
        |        ORDER BY d.n_chars DESC, c.node) AS rn
        |    FROM comp c JOIN documents d ON d.doc_id = c.node)
        |  WHERE rn = 1),
        |losers AS (
        |  SELECT c.node FROM comp c JOIN best b ON b.rep = c.rep
        |  WHERE c.node <> b.keep)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT node FROM losers)
        |ORDER BY doc_id""".stripMargin,

    // The q_decontaminate gram walk with the audit rollup: per
    // contaminated corpus doc, DISTINCT shared grams and DISTINCT
    // benchmark docs those grams touch.
    "q_contamination_report" ->
      s"""WITH n AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents),
        |t AS (
        |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS toks
        |  FROM n),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(generate_series(1, len(toks) - 4),
        |              i -> array_to_string(toks[i:i+4], ' '))
        |    END)) AS gram
        |  FROM t),
        |bg AS (SELECT DISTINCT doc_id AS bench_id, gram FROM g WHERE doc_id % 31 = 0)
        |SELECT g.doc_id,
        |  count(DISTINCT g.gram) AS n_hit_grams,
        |  count(DISTINCT bg.bench_id) AS n_eval_docs
        |FROM g JOIN bg USING (gram)
        |WHERE g.doc_id % 31 <> 0
        |GROUP BY g.doc_id
        |ORDER BY doc_id""".stripMargin,

    // DSIR replay: the embedded table is the QUANTIZED fit
    // (floor(2^20·Δln) integers — the ln boundary, same as
    // temperatureMix's pow; refresh via OracleFitProbe); everything
    // downstream is exact — the md5 bucket walk, the integer Σ m_b per
    // doc (docs with zero tokens keep the empty-sum 0, like the Spark
    // fold's init), the /2^20 dyadic double, the (weight DESC, id)
    // top-120.
    "q_dsir_select" ->
      s"""WITH $DsirModelValuesSql,
        |t AS (SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |      x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |x AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5(unnest(toks)), 1, 15)) AS BIGINT) % 64 AS bk
        |  FROM t),
        |w AS (SELECT x.doc_id, SUM(CAST(m.v AS BIGINT)) AS wnum
        |  FROM x JOIN m ON m.b = x.bk GROUP BY x.doc_id),
        |all_w AS (SELECT t.doc_id, COALESCE(w.wnum, 0) AS wnum
        |  FROM t LEFT JOIN w ON w.doc_id = t.doc_id)
        |SELECT doc_id, CAST(wnum AS DOUBLE) / 1048576.0 AS log_weight
        |FROM all_w
        |ORDER BY wnum DESC, doc_id
        |LIMIT 120""".stripMargin,

    // The same regexp_replace chain; patterns are RE2/java.util.regex
    // portable by construction (see TextFunctions.redactPii scaladoc).
    "q_pii_redact" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        'reach me at user' || doc_id::VARCHAR || '@mail' ||
        |        (doc_id % 7)::VARCHAR || '.example.org or 10.' ||
        |        (doc_id % 250)::VARCHAR || '.0.1 acct 9021' ||
        |        (doc_id * 100000 + 77)::VARCHAR || ' :: ' || text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\d{9,}', '<NUMBER>', 'g') AS clean
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // Cross-implementation check, not a replay: Spark normalizes via
    // the JDK (ICU-lineage) normalizer, the oracle via DuckDB's
    // utf8proc nfc_normalize — two independent UAX #15 implementations
    // must agree byte-for-byte on the composed output; the strip class
    // is the same \x{...} RE2-portable literal on both sides.
    "q_unicode_clean" ->
      """WITH d AS (SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' ' || chr(8203) || 'zero' ||
        |    chr(8205) || 'width ' || chr(7) || 'bell' || chr(13) || chr(10) ||
        |    'next' ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' A' || chr(778) ELSE ' ' || chr(197) END
        |    AS dirty
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  regexp_replace(
        |    replace(replace(nfc_normalize(dirty), chr(13)||chr(10), chr(10)),
        |            chr(13), chr(10)),
        |    '[\x{00}-\x{08}\x{0B}-\x{1F}\x{7F}-\x{9F}\x{AD}\x{200B}-\x{200D}\x{FEFF}]',
        |    '', 'g') AS text
        |FROM d ORDER BY doc_id""".stripMargin,

    // Expected repaired text written directly by the same id
    // arithmetic (chr() codepoints): repaired forms for the three
    // damage shapes, the inputs VERBATIM for the two must-stay shapes.
    "q_mojibake" ->
      """SELECT doc_id,
        |  text || CASE doc_id % 5
        |    WHEN 0 THEN ' caf' || chr(233)
        |    WHEN 1 THEN ' it' || chr(8217) || 's fine'
        |    WHEN 2 THEN ' ' || chr(8220) || 'q' || chr(8221)
        |    WHEN 3 THEN ' na' || chr(239) || 've r' || chr(233) || 'sum' || chr(233)
        |    ELSE ' ' || chr(20013) || chr(25991) || ' caf' || chr(195) || chr(169)
        |  END AS text
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // INDEPENDENT derivation, not a replay: the expected canonical
    // form / host / registrable domain of each synthesized URL shape is
    // written down directly by doc_id arithmetic, so the hash compare
    // checks the Spark string surgery against intended semantics rather
    // than against a DuckDB port of the same surgery.
    "q_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id, CAST(doc_id % 5 AS INT) AS m, doc_id::VARCHAR AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CASE m
        |    WHEN 0 THEN 'HTTP://WWW.Example.COM:80/Docs//' || n || '/?utm_source=feed&id=' || n || '#frag'
        |    WHEN 1 THEN 'https://user:pw@News.Example.co.uk:443/Article?id=' || n || '&fbclid=abc123&page=2'
        |    WHEN 2 THEN 'https://cdn.example.org:8080/a//b///' || n
        |    WHEN 3 THEN 'http://blog.example.com/post/' || n || '/'
        |    ELSE 'https://Example.net/?gclid=x&q=' || n || '&utm_campaign=z' END AS url,
        |  CASE m
        |    WHEN 0 THEN 'http://www.example.com/Docs/' || n || '?id=' || n
        |    WHEN 1 THEN 'https://news.example.co.uk/Article?id=' || n || '&page=2'
        |    WHEN 2 THEN 'https://cdn.example.org:8080/a/b/' || n
        |    WHEN 3 THEN 'http://blog.example.com/post/' || n
        |    ELSE 'https://example.net/?q=' || n END AS canonical_url,
        |  CASE m WHEN 0 THEN 'www.example.com' WHEN 1 THEN 'news.example.co.uk'
        |         WHEN 2 THEN 'cdn.example.org' WHEN 3 THEN 'blog.example.com'
        |         ELSE 'example.net' END AS host,
        |  CASE m WHEN 0 THEN 'example.com' WHEN 1 THEN 'example.co.uk'
        |         WHEN 2 THEN 'example.org' WHEN 3 THEN 'example.com'
        |         ELSE 'example.net' END AS domain
        |FROM u ORDER BY doc_id""".stripMargin,

    // Survivors + canonicals derived purely by id arithmetic: both
    // variant URLs of doc d canonicalize to the same page, so the even
    // url_id (= 2·doc_id) survives — the oracle never canonicalizes.
    "q_url_dedup" ->
      """SELECT doc_id * 2 AS url_id,
        |  'https://example.com/p/' || doc_id::VARCHAR AS canonical_url
        |FROM documents
        |ORDER BY url_id""".stripMargin,

    // Expected registrable domains by doc_id arithmetic — plain rules
    // give suffix+1 label, the *.ck wildcard makes host<d>.ck a public
    // suffix (whole 3-label host registrable), !www.ck carves the
    // exception back out, and unlisted .org falls back to the built-in
    // last-two-labels answer.
    "q_url_domain_psl" ->
      """WITH u AS (
        |  SELECT doc_id, CAST(doc_id % 6 AS INT) AS m, doc_id::VARCHAR AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CASE m
        |    WHEN 0 THEN 'www.shop.site' || n || '.com.ar'
        |    WHEN 1 THEN 'a.b.page' || n || '.co.id'
        |    WHEN 2 THEN 'x.brand' || n || '.com.tw'
        |    WHEN 3 THEN 'sub' || n || '.host' || n || '.ck'
        |    WHEN 4 THEN 'deep.sub' || n || '.www.ck'
        |    ELSE 'blog.site' || n || '.org' END AS host,
        |  CASE m
        |    WHEN 0 THEN 'site' || n || '.com.ar'
        |    WHEN 1 THEN 'page' || n || '.co.id'
        |    WHEN 2 THEN 'brand' || n || '.com.tw'
        |    WHEN 3 THEN 'sub' || n || '.host' || n || '.ck'
        |    WHEN 4 THEN 'www.ck'
        |    ELSE 'site' || n || '.org' END AS domain
        |FROM u ORDER BY doc_id""".stripMargin,

    // 10k-rule PSL: every expected domain derived by the same id
    // arithmetic that generated the rules — plain t<k>.zz gives
    // suffix+1, wildcard *.w<k>.zz makes y.w<k>.zz a public suffix
    // (whole 4-label host registrable), !x.w<k>.zz carves the
    // exception back out, and unlisted .qq falls back to the built-in
    // last-two-labels answer.
    "q_url_domain_psl10k" ->
      """WITH u AS (
        |  SELECT doc_id, CAST(doc_id % 4 AS INT) AS m, doc_id::VARCHAR AS n,
        |    (doc_id % 9000)::VARCHAR AS t, (doc_id % 500)::VARCHAR AS w
        |  FROM documents)
        |SELECT doc_id,
        |  CASE m
        |    WHEN 0 THEN 'a.b.t' || t || '.zz'
        |    WHEN 1 THEN 'a.y.w' || w || '.zz'
        |    WHEN 2 THEN 'deep.x.w' || w || '.zz'
        |    ELSE 'foo.bar' || n || '.qq' END AS host,
        |  CASE m
        |    WHEN 0 THEN 'b.t' || t || '.zz'
        |    WHEN 1 THEN 'a.y.w' || w || '.zz'
        |    WHEN 2 THEN 'x.w' || w || '.zz'
        |    ELSE 'bar' || n || '.qq' END AS domain
        |FROM u ORDER BY doc_id""".stripMargin,

    // Replay of the greedy packing recurrence, one recursive-CTE step
    // per document rank within its stream (all 8 streams advance
    // set-wise per iteration).
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS stream,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok
        |  FROM documents),
        |o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS rn FROM t),
        |rec AS (
        |  WITH RECURSIVE r(stream, rn, doc_id, ntok, pack, ofs) AS (
        |    SELECT stream, rn, doc_id, ntok, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |    FROM o WHERE rn = 1
        |    UNION ALL
        |    SELECT o.stream, o.rn, o.doc_id, o.ntok,
        |      CASE WHEN r.ofs + r.ntok > 0 AND r.ofs + r.ntok + o.ntok > 256
        |           THEN r.pack + 1 ELSE r.pack END,
        |      CASE WHEN r.ofs + r.ntok > 0 AND r.ofs + r.ntok + o.ntok > 256
        |           THEN CAST(0 AS BIGINT) ELSE r.ofs + r.ntok END
        |    FROM r JOIN o ON o.stream = r.stream AND o.rn = r.rn + 1)
        |  SELECT * FROM r)
        |SELECT doc_id, stream, pack, ofs AS "offset", ntok AS n_tokens
        |FROM rec
        |ORDER BY doc_id""".stripMargin,

    // The q_pack_sequences recurrence rolled up per stream; long/long
    // division through DOUBLE with the floor canonicalization on both
    // sides.
    "q_pack_stats" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS stream,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ntok
        |  FROM documents),
        |o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS rn FROM t),
        |rec AS (
        |  WITH RECURSIVE r(stream, rn, doc_id, ntok, pack, ofs) AS (
        |    SELECT stream, rn, doc_id, ntok, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |    FROM o WHERE rn = 1
        |    UNION ALL
        |    SELECT o.stream, o.rn, o.doc_id, o.ntok,
        |      CASE WHEN r.ofs + r.ntok > 0 AND r.ofs + r.ntok + o.ntok > 256
        |           THEN r.pack + 1 ELSE r.pack END,
        |      CASE WHEN r.ofs + r.ntok > 0 AND r.ofs + r.ntok + o.ntok > 256
        |           THEN CAST(0 AS BIGINT) ELSE r.ofs + r.ntok END
        |    FROM r JOIN o ON o.stream = r.stream AND o.rn = r.rn + 1)
        |  SELECT * FROM r)
        |SELECT stream,
        |  CAST(max(pack) + 1 AS BIGINT) AS n_packs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  floor(sum(ntok)::DOUBLE / ((max(pack) + 1) * 256) * 1e4 + 0.5) / 1e4 AS utilization
        |FROM rec
        |GROUP BY stream
        |ORDER BY stream""".stripMargin,

    // BPE counts re-derived by the q_bpe_tokens merge-replay CTEs, then
    // the identical packing recurrence over those counts.
    "q_pack_bpe" ->
      s"""WITH docs AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS nw
        |  FROM documents),
        |words AS (SELECT DISTINCT unnest(nw) AS w FROM docs),
        |ml AS (SELECT list(a || chr(1) || b ORDER BY rank) AS mlist
        |  FROM read_parquet('${oracleSidePath("bpe_merges_pack")}')),
        |init AS (
        |  SELECT w, list_concat(
        |     list_transform(range(1, length(w)), i -> w[i]),
        |     [w[length(w)] || '${graft.functions.Bpe.Eow}']) AS toks
        |  FROM words),
        |brec AS (
        |  WITH RECURSIVE r1(w, toks, it) AS (
        |    SELECT w, toks, 0 FROM init
        |    UNION ALL
        |    SELECT w,
        |      toks[1:att-1] || [toks[att] || toks[att+1]] || toks[att+2:],
        |      it + 1
        |    FROM (
        |      SELECT w, toks, it, list_position(rs, list_min(rs)) AS att,
        |        list_min(rs) AS minr
        |      FROM (
        |        SELECT w, toks, it,
        |          list_transform(range(1, len(toks)),
        |            i -> coalesce(nullif(list_position(mlist, toks[i] || chr(1) || toks[i+1]), 0), 1000000)) AS rs
        |        FROM r1, ml
        |        WHERE len(toks) >= 2))
        |    WHERE minr < 1000000)
        |  SELECT * FROM r1),
        |fin AS (
        |  SELECT w, toks FROM (
        |    SELECT w, toks, it, max(it) OVER (PARTITION BY w) AS mx FROM brec)
        |  WHERE it = mx),
        |counts AS (SELECT w, len(toks) AS k FROM fin),
        |ex AS (SELECT doc_id, unnest(nw) AS w FROM docs),
        |agg AS (SELECT ex.doc_id, SUM(c.k) AS nb
        |  FROM ex JOIN counts c USING (w) GROUP BY ex.doc_id),
        |t AS (
        |  SELECT d.doc_id, d.doc_id % 8 AS stream,
        |    CAST(COALESCE(a.nb, 0) AS BIGINT) AS ntok
        |  FROM docs d LEFT JOIN agg a USING (doc_id)),
        |o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS rn FROM t),
        |prec AS (
        |  WITH RECURSIVE r2(stream, rn, doc_id, ntok, pack, ofs) AS (
        |    SELECT stream, rn, doc_id, ntok, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |    FROM o WHERE rn = 1
        |    UNION ALL
        |    SELECT o.stream, o.rn, o.doc_id, o.ntok,
        |      CASE WHEN r2.ofs + r2.ntok > 0 AND r2.ofs + r2.ntok + o.ntok > 256
        |           THEN r2.pack + 1 ELSE r2.pack END,
        |      CASE WHEN r2.ofs + r2.ntok > 0 AND r2.ofs + r2.ntok + o.ntok > 256
        |           THEN CAST(0 AS BIGINT) ELSE r2.ofs + r2.ntok END
        |    FROM r2 JOIN o ON o.stream = r2.stream AND o.rn = r2.rn + 1)
        |  SELECT * FROM r2)
        |SELECT doc_id, stream, pack, ofs AS "offset", ntok AS n_tokens
        |FROM prec
        |ORDER BY doc_id""".stripMargin,

    // Byte-level BPE counts re-derived from scratch (shared CTE chain —
    // see byteBpeCountCtes), then the identical packing recurrence.
    "q_pack_bpe_bytes" -> {
      s"""${byteBpeCountCtes("bpe_merges_bytes")},
        |t AS (
        |  SELECT d.doc_id, d.doc_id % 8 AS stream,
        |    CAST(COALESCE(a.nb, 0) AS BIGINT) AS ntok
        |  FROM docs d LEFT JOIN agg a USING (doc_id)),
        |o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS rn FROM t),
        |prec AS (
        |  WITH RECURSIVE r2(stream, rn, doc_id, ntok, pack, ofs) AS (
        |    SELECT stream, rn, doc_id, ntok, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |    FROM o WHERE rn = 1
        |    UNION ALL
        |    SELECT o.stream, o.rn, o.doc_id, o.ntok,
        |      CASE WHEN r2.ofs + r2.ntok > 0 AND r2.ofs + r2.ntok + o.ntok > 256
        |           THEN r2.pack + 1 ELSE r2.pack END,
        |      CASE WHEN r2.ofs + r2.ntok > 0 AND r2.ofs + r2.ntok + o.ntok > 256
        |           THEN CAST(0 AS BIGINT) ELSE r2.ofs + r2.ntok END
        |    FROM r2 JOIN o ON o.stream = r2.stream AND o.rn = r2.rn + 1)
        |  SELECT * FROM r2)
        |SELECT doc_id, stream, pack, ofs AS "offset", ntok AS n_tokens
        |FROM prec
        |ORDER BY doc_id""".stripMargin
    },

    // The byte-BPE count re-derivation (own side table) rolled up per
    // source; ratios are double divisions of the integer sums, rounded
    // 1e-4 — identical IEEE ops on identical integers.
    "q_tokenizer_fertility" -> {
      s"""${byteBpeCountCtes("bpe_merges_fert")},
        |per_doc AS (
        |  SELECT d.doc_id, d.source,
        |    octet_length(encode(d.text)) AS nb,
        |    length(d.text) AS nc,
        |    CAST(COALESCE(a.nb, 0) AS BIGINT) AS nt
        |  FROM docs d LEFT JOIN agg a USING (doc_id)
        |  WHERE d.text IS NOT NULL),
        |roll AS (
        |  SELECT source,
        |    CAST(SUM(nb) AS BIGINT) AS n_bytes,
        |    CAST(SUM(nc) AS BIGINT) AS n_chars,
        |    CAST(SUM(nt) AS BIGINT) AS n_tokens
        |  FROM per_doc GROUP BY source)
        |SELECT source, n_bytes, n_chars, n_tokens,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |    ELSE floor(CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e4 + 0.5) / 1e4 END
        |    AS bytes_per_token,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |    ELSE floor(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1e4 + 0.5) / 1e4 END
        |    AS chars_per_token
        |FROM roll
        |ORDER BY source""".stripMargin
    },

    // Same integer cut points (Sampling.splitThresholds embeds the exact
    // literals) over the same portable 60-bit hash — integer-only
    // comparisons, so no float-boundary disagreement is possible.
    // Window k starts at token 1 + k·24 (stride = 32 − 8) and takes
    // min(32, remaining); integer-only arithmetic on both sides.
    "q_chunk_windows" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) <= 32 THEN 1
        |         ELSE 1 + (len(toks) - 32 + 23) // 24 END AS nchunks
        |  FROM t WHERE len(toks) >= 1)
        |SELECT doc_id, g.i AS chunk_ix,
        |  least(32, n - g.i * 24) AS n_tokens,
        |  array_to_string(toks[(g.i * 24 + 1):(g.i * 24 + least(32, n - g.i * 24))], ' ') AS chunk_text
        |FROM k, unnest(generate_series(0, nchunks - 1)) AS g(i)
        |ORDER BY doc_id, chunk_ix""".stripMargin,

    // Full re-derivation: vocab = top-256 English unigrams by
    // (count DESC, token ASC); bigram/context counts over vocab-mapped
    // consecutive pairs; add-one smoothing over the 257-event space.
    // Probabilities are integer ratios (bit-identical division), log2
    // differs by ≤ a few ulp cross-engine — absorbed by the decimal-12
    // summation and the 4-decimal canonicalization.
    // Full BM25 re-derivation: same tokenization, df over query terms
    // only, identical IEEE expression tree (log2 idf; see Bm25.scala),
    // per-term contributions decimal-summed (order-independent), score
    // rounded to 4dp BEFORE ranking on both sides.
    "q_bm25" -> Bm25OracleSql,

    "q_bm25_index" -> Bm25OracleSql,

    // PARTIAL oracle (the q_kmeans embedded-constants pattern): the 8
    // converged centroids from the pinned-layout fit are embedded as
    // literals (OracleFitProbe prints them — refresh after any fixture
    // change); DuckDB re-derives the nearest-centroid assignment, the
    // within-cluster cosine prune rule, and the min-member cluster
    // canonicalization. The Lloyd fit itself is pinned by
    // SimilaritySpec. list_distance (sqrt of the udf's d-squared) keeps
    // the identical argmin: sqrt is monotone and the probe-measured
    // assignment margin is 1.6e-3.
    "q_semdedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |d AS (SELECT vec_id, v,
        |    list_distance(v, [0.014308023336956180, -0.061422300417784990, 0.032981451868468674, -0.019409301666248786, 0.065422460720200390, 0.027351764012373200, -0.097571104195115980, 0.039658036614510866, 0.0018072205926536729, 0.046791957533155494, -0.025169135291913624, -0.0010626544305858644, 0.046737152196185070, -0.0072685610091292275, 0.011818184321639006, 0.046400537990082646, -0.028576575424794054, -0.0082593645408786330, -0.0025308596147959562, -0.013140917372718258, 0.041771613649631800, -0.014040018009070895, 0.033779306113597400, -0.032955808031960930, -0.045343838325750674, 0.058803186742711420, -0.013036307432661200, 0.011915883288326623, -0.016718367191252150, -0.010906226611328557, 0.0061534655458097790, -0.049505474074210630, -0.0074756705198524290, 0.051534761444169190, 0.068332783240628870, -0.024181094994817517, -0.021441252056607290, 0.016007276242721434, 0.041987111082275270, -0.0016198323941544483, -0.030772523119881760, -0.034838928718512000, -0.0064536860690599210, -0.0078518260285674930, 0.0016698374437462342, -0.034376105014847495, -0.032187423563491870, -0.040249362131458170, -0.0042739826726335050, 0.018220651475099946, 0.0094441246167805640, -0.0038652256018969254, -0.043105936662916640, 0.065283669541761470, 0.021683019618074850, -0.027338500918918533, 0.011060706152133398, -0.0018634386544458960, 0.038666513291996364, 0.012683993019508259, 0.0020388501648803390, 0.0082005605585628040, -0.016905062078302235, -0.058153620130676580]) AS d0,
        |    list_distance(v, [0.057219051215927010, -0.015968898924863122, 0.036415713910375620, -0.010551010216456942, 0.032472778357461920, -0.011870846341480501, -0.043023169865288460, -0.012748777555922667, -0.010076586942886934, -0.061120086171690166, 0.032672131731588810, -0.041224614673410540, -0.053081705709094730, -0.073606943250827800, -0.044233607383729470, 0.045709881802192990, -0.027479326952339360, -0.0053479325045676280, 0.027295514794887923, 0.021868554720034200, 0.0033863766414773030, -0.0089367703282429520, -0.033815884333711840, 0.022533529693545360, -0.013570432322416713, -0.024238409628904063, -0.0055410715932440420, 0.021396351584472640, 0.072568791958878540, 0.049566593703881760, -0.022664223606827565, 0.062551705284780230, -0.024328001639029633, 0.017998379760279530, 0.012425004427010814, -0.0095070816241786820, -0.0066505672714103840, -0.00053744056074517880, -0.035256330793749330, -0.013799871775619168, 0.033541648810367204, -0.060739692160293800, 0.033711874625118474, -0.00091516142593819600, -0.037049018238298634, 0.045001745724423220, -0.0075463190700651870, 0.0084810011936092950, 0.0066322316488367505, 0.024424484701335640, 0.026086400929165796, -0.016493468116095755, 0.00096491355604181680, -0.039181612299418904, -0.0016013225637531530, 0.0043077485881642340, 0.025765644415514544, 0.029166759046751797, -0.047588216590358770, 0.0035111258095841752, 0.017187810069622680, -0.037161077317755880, -0.026572463225521560, 0.042526293468351160]) AS d1,
        |    list_distance(v, [-0.018483656896645890, 0.042295619140771270, 0.021245714986754025, -0.044205205760111936, -0.024827188730501290, 0.014019497572199294, 0.024979380042631213, 0.0013939361333062774, 0.048302401249090680, -0.016513969111991555, -0.033897929515469036, -0.024198278437548300, -0.028907628329634144, 0.010932772635817201, -0.026251392034617693, -0.069889115365712270, 0.059535835387610030, 0.029589355155302770, 0.021152013747364674, -0.010944328115632137, 0.0013330821438055289, 0.025590638540227684, 0.051864618139357810, -0.071541577516319720, 0.023576409801056510, 0.054929119616485480, 0.049848972141677350, -0.0046243360061852030, -0.021998083096389707, 0.022790627566313270, -0.038392019417267620, 0.069229506454512220, -0.0096112434229437720, -0.025574100906388800, -0.035167721690397640, 0.021041197130423888, 0.047911309939400670, -0.015253316533441344, 0.0055909177713226850, -0.0079231447532054100, -0.0081380075517747740, 0.058839817586040385, -0.061278131524950530, 0.0072271791205071570, -0.0063500814201114210, 0.00032600651805599530, 0.062751130045702060, -0.017883280207394835, -0.054659401854957664, -0.045567256423007500, -0.037857597497733014, 0.029941494509234633, 0.028525486465935643, 0.015085279075592234, 0.034092513096861930, -0.042288584722483760, -0.014480621580763622, 0.024825485835766846, -0.063823213000177290, -0.011086686179368642, -0.024981117374345400, 0.023104197797038706, 0.017240547485192093, -0.020802761366786927]) AS d2,
        |    list_distance(v, [-0.0018656305799430067, 0.018754142378880220, 0.011512455835261129, -0.026004495268518276, -0.0033839810385622760, 0.017391201294958590, 0.024698180817755534, 0.016427943442778830, -0.015155600358478048, 0.022745012868703767, 0.013503088160756637, 0.055319096605208784, 0.0065449237146160820, 0.036838163951919835, 0.011672695226628673, -0.018938157686286350, -0.029046363493596964, 0.070112217406064950, -0.023300090688280760, 0.036147905403578824, -0.0091442432762546980, -0.0072597205215557060, -0.0055441055309281430, 0.0010735353793610227, -0.021340312007602980, 0.023908017842437734, -0.020672120424834163, 0.0080065159211781900, -0.044152990250255576, 0.054538434168154540, -0.055782560665499080, -0.026825125481594693, 0.070502122203734800, -0.049359881289472635, -0.067262966727668590, -0.034293105690316720, -0.017388950102031230, 0.075360604971005650, 0.026549172217809510, 0.044137339791367680, -0.00039897735696285960, -0.058611871695823290, -0.044295708267864860, -0.015445222633636811, -0.010911935508589854, 0.013228794335472313, 0.00071934961967847560, -0.011916875255040147, 0.063562043066221210, -0.080030804587824440, 0.064410850782455370, -0.021094012372619050, 0.020896662568504160, -0.040109149364500560, -0.012989312241023237, -0.026358494789085606, 0.011665245753035626, 0.0098608409149826250, 0.060440287335553546, 0.0039792229463769630, 0.038018042771992360, 0.027311805862171405, -0.0090828598053617920, -0.030965027644891630]) AS d3,
        |    list_distance(v, [-0.0029530703528400730, -0.022555495103862247, -0.039460808497524875, 0.027648048556062243, -0.0068448219955077070, -0.0075125145992976340, -0.016291842097416520, 0.0092272825456936570, -0.020578048141888920, 0.035829437879489404, 0.044969911269350520, -0.018341998527723585, -0.040452696695437600, 0.040232793582082890, -0.016194748322424644, 0.052070622492893190, 0.032507379768717590, 0.044517690106979850, 0.010961832718321067, -0.031382238184211445, -0.046705620048348516, 0.0064220737480996730, 0.0010523009353646023, 0.033914809348061680, -0.019110298801131326, -0.057813775444896350, -0.012845568185559172, 0.0034216653460616190, -0.0034092687316896286, -0.047039926408187430, 0.054332073582747185, 0.024928142987204516, 0.0063294246030957710, -0.041713944110704365, 0.017078623470083317, 0.052834275846287390, 0.014187787830665270, -0.0070837638537769260, -0.0079448925804600170, 0.022652633737968300, -0.023196164035813555, 0.029319139206028710, -0.044111788591287810, 0.033648422114578460, -0.00088065801537595690, -0.0095839167325346560, 0.036209133672801890, 0.070541307402035110, -0.014055120386140462, -0.019831619295634000, 0.045247971620376440, -0.029837108278811416, 0.061863369664506000, -0.023048567427488650, 0.027063716891194310, -0.018930307496167885, -0.026953612820601420, -0.049787549259182176, 0.030994590078668862, -0.049513642011922510, -0.031735358040725050, -0.011346323020167320, -0.0093784432734965400, -0.0084823825112407040]) AS d4,
        |    list_distance(v, [0.017305327279286253, -0.0023283200545443430, -0.0055078388528070520, -0.033558099178804290, 0.016426099619517725, 0.021883193889839780, 0.035828045357225670, -0.0029855472889418404, -0.019873411417938767, -0.048054131531777480, 0.028687186751307714, 0.0042522137324946625, 0.041670861772985920, -0.0035089702642936674, 0.050305815020369160, -0.035624487868820630, 0.046178084262646730, 0.017863017387895120, 0.025993998985116680, 0.0053412019482089410, 0.029175458006405582, -0.028147148083533264, -0.026726359191040200, 0.030190461604959435, 0.057009581341925596, 0.057683804031047560, 0.023618469243713965, 0.021682915205342903, 0.0070430622953507640, -0.078804705824909930, 0.017883678528273272, -0.050098499759203860, 0.041749992469946550, 0.040994022791791290, -0.022012339708291823, -0.016737425104818410, -0.071958046240939030, -0.057468405549944790, 0.023314908748984130, 0.0053787419727693000, -0.0072985492439733610, 0.0083037557908230350, 0.049625431125362710, -0.016619693627581000, 0.031908962503075600, -0.0080436977454357680, 0.010257677194507172, -0.020293867549238107, 0.067335536791425610, -0.037207321605334680, -0.083004608838301560, 0.038462249406923850, -0.0013880109181627631, -0.065628779389792020, 0.038077404091341630, 0.026531513143951694, 0.0066560519031352470, 0.0029245710569537346, 0.018416482551644246, -0.088120244640029140, -0.017460100745989218, 0.017623112345528272, -0.013835098064090643, 0.030513116152077500]) AS d5,
        |    list_distance(v, [0.015421877232109827, 0.026604033820706630, -0.0014821592241435523, 0.027699174021460837, -0.073992003930822740, -0.0010369644934994980, 0.0045881167471018290, 0.027805941378427370, -0.027557703411026348, -0.020009533336926854, -0.024282443735207760, 0.040884992310536966, 0.038487051149845240, -0.014467981321016146, 0.0091750964507340430, 0.015040995907076004, -0.017794318046540983, 0.012083412502937380, 0.011466085863855457, -0.0083086769652342600, -0.028790607905736374, 0.041784734089648530, 0.0016081850983262543, -0.044032714907981210, 0.012331629916462266, -0.022986984323529948, -0.033043887631426900, 0.0037433080405237214, -0.012330081488471478, 0.023805712444535006, 0.067532861364945280, -0.045787179350642665, -0.0040274514467455450, -0.0066251958412448730, 0.010144449049426664, 0.0026632716068096700, -0.035233602412195220, -0.060524351635737520, -0.0090966944234453200, -0.081431868673873050, 0.016253415784317878, -0.040370215440259110, 0.034321766973833640, 0.0031033486744608155, 0.0060571520570515385, 0.052221464282352360, -0.026950605132902462, 0.097008533051966000, -0.072356294953234260, -0.029381443359588665, -0.0019619057101437883, 0.025657484437913575, -0.040816936367792225, 0.0056735494121488540, 0.0035520296754135240, 0.036623653452543000, 0.0081700493371294400, 0.0014719704894589321, -0.022373003668279476, 0.045880470740338485, -0.028751526206002790, 0.014551729340089350, 0.0040500894608539380, -0.063096131768918800]) AS d6,
        |    list_distance(v, [-0.069272857555188240, 0.0013958189134987500, -0.030531596601940693, 0.026166484207631305, 0.055022116123627014, 0.0076462304828545220, -0.033441697268818430, -0.010576714679168967, 0.022414974383830740, 0.018345594006733825, 0.017302247795921107, 0.024365056932975467, -0.019729614913320310, 0.039214582834392790, 0.020035553025081754, -0.026267563512262244, 0.012864324380643666, -0.095340796946906130, -0.070057871011802200, 0.016684608094734498, -0.019430451317188832, 0.00063794204392112220, 0.0051032885747890055, -0.00093830460861611830, 0.019646000220270184, 0.030693114096692835, 0.011479197019854417, 0.019227049481840088, -0.0026051181261069500, -0.024222244664381904, 0.0082542070832390050, -0.041695778657538960, 0.016895273943933156, -0.045771055288899400, 0.021449205945604122, 0.012199475515920382, 0.032676671932523070, 0.024155910785954730, -0.043995775268054926, 0.028255784601788035, 0.0066996856212007020, 0.017066542431712150, 0.042886298317339075, -0.014061910090430712, -0.061678619177725450, -0.025868601009894448, -0.033518595027271655, -0.043536465723389900, 5.9758124049179830e-05, 0.054892649580366330, 0.022890332951926842, -0.016905317627466640, 0.041580476893935920, 0.021780237859974686, -0.064317320079471050, 0.025565620035362932, 0.013873546921576444, -0.030588934267423330, -0.048770786814678176, -0.010408333469576274, 0.038864262452205780, 0.012487098630495333, 0.048377305584458206, 0.011218101660219523]) AS d7
        |  FROM e),
        |a AS (SELECT vec_id, v,
        |  CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 AND d0 <= d4 AND d0 <= d5 AND d0 <= d6 AND d0 <= d7 THEN 0
        |       WHEN d1 <= d2 AND d1 <= d3 AND d1 <= d4 AND d1 <= d5 AND d1 <= d6 AND d1 <= d7 THEN 1
        |       WHEN d2 <= d3 AND d2 <= d4 AND d2 <= d5 AND d2 <= d6 AND d2 <= d7 THEN 2
        |       WHEN d3 <= d4 AND d3 <= d5 AND d3 <= d6 AND d3 <= d7 THEN 3
        |       WHEN d4 <= d5 AND d4 <= d6 AND d4 <= d7 THEN 4
        |       WHEN d5 <= d6 AND d5 <= d7 THEN 5
        |       WHEN d6 <= d7 THEN 6
        |       ELSE 7 END AS c
        |  FROM d),
        |p AS (SELECT a1.vec_id AS id_a, a2.vec_id AS id_b
        |      FROM a a1 JOIN a a2 ON a1.c = a2.c AND a1.vec_id < a2.vec_id
        |      WHERE list_cosine_similarity(a1.v, a2.v) >= 0.35),
        |l AS (SELECT DISTINCT id_b FROM p)
        |SELECT a.vec_id,
        |  MIN(a.vec_id) OVER (PARTITION BY a.c) AS cluster,
        |  (l.id_b IS NULL) AS keep
        |FROM a LEFT JOIN l ON a.vec_id = l.id_b
        |ORDER BY a.vec_id""".stripMargin,

    // Embedded per-lang integer thresholds (OracleFitProbe prints them —
    // they depend on the observed lang counts at the gate; refresh after
    // any fixture change). Same portable-hash expression as
    // q_sample_quota / q_split_hash.
    // Group rollup over the q_text_stats per-doc machinery; mean quality
    // decimal-summed then 4dp-canonicalized on both sides.
    "q_corpus_stats" ->
      s"""${TextFunctionsOracle.statsCtes},
        |m AS (
        |  SELECT d.lang, d.source, sc.n_tokens, d.n_chars,
        |    ${TextFunctionsOracle.qualityExpr} AS q
        |  FROM sc JOIN documents d USING (doc_id))
        |SELECT lang, source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  floor(CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4 AS mean_quality
        |FROM m
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "q_temperature_mix" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) AS hh
        |  FROM documents)
        |SELECT doc_id, lang FROM h
        |WHERE hh < CASE lang
        |  WHEN 'de' THEN 1102403813298366723
        |  WHEN 'en' THEN 624685578636996824
        |  WHEN 'es' THEN 1079514044210194263
        |  WHEN 'fr' THEN 1152921504606846976
        |  WHEN 'zh' THEN 1065023265662834428 END
        |ORDER BY doc_id""".stripMargin,

    // FULL-replay mixture oracle: every per-group threshold re-derives
    // in SQL from the observed counts and the weight literals in the
    // SAME IEEE sequence mixtureThresholds runs — z as the left-assoc
    // double sum in sorted-key order, ratio n/(w/z), binding by
    // (ratio, group) min, keep rate (m*(w/z))/n, floor(r*2^60) exact in
    // double (power-of-two scaling only shifts the exponent; floor of
    // any double is exactly representable). zh carries no weight, so
    // the inner threshold join drops it — "a mix is a contract".
    "q_mixture_select" ->
      """WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |wts AS (SELECT * FROM (VALUES
        |    ('de', CAST(0.2 AS DOUBLE)), ('en', CAST(0.5 AS DOUBLE)),
        |    ('es', CAST(0.2 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE))) AS t(lang, wt)),
        |zz AS (SELECT ((CAST(0.2 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |               + CAST(0.2 AS DOUBLE)) + CAST(0.1 AS DOUBLE) AS z),
        |rat AS (SELECT c.lang, c.n, w.wt,
        |    CAST(c.n AS DOUBLE) / (w.wt / zz.z) AS ratio
        |  FROM cnt c JOIN wts w USING (lang), zz),
        |b AS (SELECT lang AS bg, ratio AS m FROM rat ORDER BY ratio, lang LIMIT 1),
        |th AS (SELECT r.lang,
        |    CASE WHEN r.lang = b.bg THEN CAST(1152921504606846976 AS BIGINT)
        |         ELSE CAST(floor(least(CAST(1.0 AS DOUBLE),
        |                b.m * (r.wt / zz.z) / CAST(r.n AS DOUBLE))
        |              * CAST(1152921504606846976 AS DOUBLE)) AS BIGINT) END AS t
        |  FROM rat r, b, zz),
        |h AS (SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) AS hh
        |  FROM documents)
        |SELECT doc_id, lang FROM h JOIN th USING (lang) WHERE hh < th.t
        |ORDER BY doc_id""".stripMargin,

    // Epoch-mix replay: full copies via generate_series(0, floor(e)),
    // the fractional copy kept by the id:epoch:seed hash against
    // floor(frac(e)·2^60) — frac ∈ {0.5, 0.25, 0} makes the thresholds
    // the exact literals 2^59, 2^58, 0. es/zh carry no epoch target and
    // drop with the IN filter ("a mix is a contract").
    "q_epoch_mix" ->
      """WITH e AS (SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2 ELSE 1 END AS fullc,
        |    CASE lang WHEN 'en' THEN CAST(576460752303423488 AS BIGINT)
        |              WHEN 'fr' THEN CAST(288230376151711744 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS t
        |  FROM documents WHERE lang IN ('en', 'fr', 'de')),
        |x AS (SELECT doc_id, lang, fullc, t,
        |    unnest(generate_series(0, fullc)) AS epoch FROM e)
        |SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch FROM x
        |WHERE epoch < fullc
        |   OR CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' ||
        |        epoch::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) < t
        |ORDER BY doc_id, epoch""".stripMargin,

    // The q_epoch_mix replay composed with the q_tokenized_export
    // replay over the per-copy key k = doc_id·8 + epoch: copies of one
    // doc share its id sequence; the shard deal walks k.
    "q_training_export" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |em AS (SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2 ELSE 1 END AS fullc,
        |    CASE lang WHEN 'en' THEN CAST(576460752303423488 AS BIGINT)
        |              WHEN 'fr' THEN CAST(288230376151711744 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS thr
        |  FROM t WHERE lang IN ('en', 'fr', 'de')),
        |mx AS (
        |  SELECT doc_id, doc_id * 8 + epoch AS k
        |  FROM (SELECT doc_id, fullc, thr,
        |          unnest(generate_series(0, fullc)) AS epoch FROM em)
        |  WHERE epoch < fullc
        |     OR CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' ||
        |          epoch::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) < thr),
        |v AS (
        |  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS INT) AS id
        |  FROM (SELECT DISTINCT unnest(toks) AS token FROM t
        |        WHERE lang IN ('en', 'fr', 'de'))),
        |x AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |    generate_subscripts(toks, 1) AS pos
        |  FROM t WHERE lang IN ('en', 'fr', 'de')),
        |e AS (
        |  SELECT x.doc_id,
        |    array_to_string(list(v.id::VARCHAR ORDER BY x.pos), ' ') AS ids,
        |    count(*) AS n_tokens
        |  FROM x JOIN v USING (token) GROUP BY x.doc_id),
        |r AS (
        |  SELECT k, ROW_NUMBER() OVER (
        |    ORDER BY md5(k::VARCHAR || ':' || '42'), k) AS rk
        |  FROM mx),
        |s AS (
        |  SELECT k, (rk - 1) % 4 AS shard,
        |    ROW_NUMBER() OVER (PARTITION BY (rk - 1) % 4 ORDER BY rk) - 1 AS ordinal
        |  FROM r)
        |SELECT mx.k, CAST(s.shard AS BIGINT) AS shard,
        |  CAST(s.ordinal AS BIGINT) AS ordinal,
        |  CAST(COALESCE(e.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  COALESCE(e.ids, '') AS ids
        |FROM mx JOIN s USING (k) LEFT JOIN e USING (doc_id)
        |ORDER BY k""".stripMargin,

    // The epoch-mix replay rolled up on both sides, full-outer joined,
    // with the identical 4-decimal share/ratio arithmetic.
    "q_mix_report" ->
      """WITH em AS (SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2 ELSE 1 END AS fullc,
        |    CASE lang WHEN 'en' THEN CAST(576460752303423488 AS BIGINT)
        |              WHEN 'fr' THEN CAST(288230376151711744 AS BIGINT)
        |              ELSE CAST(0 AS BIGINT) END AS thr
        |  FROM documents WHERE lang IN ('en', 'fr', 'de')),
        |mx AS (
        |  SELECT doc_id, lang
        |  FROM (SELECT doc_id, lang, fullc, thr,
        |          unnest(generate_series(0, fullc)) AS epoch FROM em)
        |  WHERE epoch < fullc
        |     OR CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' ||
        |          epoch::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) < thr),
        |b AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY 1),
        |a AS (SELECT lang, count(*) AS n_after FROM mx GROUP BY 1),
        |j AS (
        |  SELECT coalesce(b.lang, a.lang) AS lang,
        |    coalesce(n_before, 0) AS n_before,
        |    coalesce(n_after, 0) AS n_after
        |  FROM b FULL OUTER JOIN a ON b.lang = a.lang),
        |t AS (SELECT sum(n_before) AS tb, sum(n_after) AS ta FROM j)
        |SELECT lang, CAST(n_before AS BIGINT) AS n_before,
        |  CAST(n_after AS BIGINT) AS n_after,
        |  CASE WHEN tb = 0 THEN 0.0
        |       ELSE floor(n_before * 1.0 / tb * 1e4 + 0.5) / 1e4 END AS share_before,
        |  CASE WHEN ta = 0 THEN 0.0
        |       ELSE floor(n_after * 1.0 / ta * 1e4 + 0.5) / 1e4 END AS share_after,
        |  CASE WHEN n_before = 0 THEN NULL
        |       ELSE floor(n_after * 1.0 / n_before * 1e4 + 0.5) / 1e4 END AS keep_ratio
        |FROM j, t
        |ORDER BY lang""".stripMargin,

    // Gopher rule replay: every count is exact integer arithmetic over
    // the same tokenization (split on ' ', empties dropped; lines on
    // chr(10)) and every ratio rule is the same cross-multiplied
    // integer comparison — no floating point anywhere in the decision,
    // so the survivor set matches bit-for-bit. The '...' count divides
    // exactly by 3 (each left-to-right match removes 3 chars, and
    // plain replace scans left-to-right like the regexp engine).
    "q_gopher_filter" ->
      """WITH st AS (SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS lowtoks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS word_chars,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ellipsis,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines,
        |        l -> list_contains(['-', '*', '•'], substring(ltrim(l), 1, 1)))) AS BIGINT) AS n_bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS n_ellipsis_lines,
        |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(['the', 'a'], w -> list_contains(lowtoks, w))) AS BIGINT) AS n_stop_hits
        |  FROM st)
        |SELECT doc_id, n_words FROM c
        |WHERE n_words >= 30 AND n_words <= 100000
        |  AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
        |  AND n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words
        |  AND n_bullet_lines * 10 <= n_lines * 9
        |  AND n_ellipsis_lines * 10 <= n_lines * 3
        |  AND n_alpha_words * 5 >= n_words * 4
        |  AND n_stop_hits >= 2
        |ORDER BY doc_id""".stripMargin,

    // C4 replay: the same synthesized page (list slices + poison lines
    // by id arithmetic), the same line filter (terminal punct after
    // rtrim, >= 3 space-words, no 'javascript'), the same page rules
    // (raw-page lorem/brace probes, >= 4 [.!?] in the CLEANED text) —
    // exact string ops end to end, so survivors and their rewritten
    // text hash-match byte-for-byte.
    "q_c4_clean" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |pg AS (SELECT doc_id,
        |    COALESCE(array_to_string(toks[1:6], ' '), '') || '.' || chr(10) ||
        |    'Too short.' || chr(10) ||
        |    COALESCE(array_to_string(toks[7:12], ' '), '') ||
        |      CASE WHEN doc_id % 3 = 0 THEN ' pages need JavaScript enabled.'
        |           ELSE '?' END || chr(10) ||
        |    COALESCE(array_to_string(toks[13:16], ' '), '') || chr(10) ||
        |    CASE WHEN doc_id % 17 = 0 THEN 'Generated from lorem ipsum filler.'
        |         ELSE 'A closing remark for the page.' END || chr(10) ||
        |    CASE WHEN doc_id % 19 = 0 THEN 'template { placeholder } here.'
        |         ELSE 'Another fine sentence here.' END AS page
        |  FROM t),
        |cl AS (SELECT doc_id, page,
        |    array_to_string(list_filter(string_split(page, chr(10)),
        |      l -> (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
        |            OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
        |        AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 3
        |        AND NOT contains(lower(l), 'javascript')), chr(10)) AS text
        |  FROM pg)
        |SELECT doc_id, text FROM cl
        |WHERE NOT contains(lower(page), 'lorem ipsum')
        |  AND NOT contains(page, '{')
        |  AND length(text) - length(regexp_replace(text, '[.!?]', '', 'g')) >= 4
        |ORDER BY doc_id""".stripMargin,

    // The identical predecessor-scan fold: line i survives iff it does
    // not appear among lines 1..i-1 (DuckDB lambdas index 1-based;
    // Spark's filter index is 0-based with slice(lines, 1, i) — the
    // same predecessor set).
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |pg AS (SELECT doc_id,
        |    [COALESCE(array_to_string(toks[1:5], ' '), ''), COALESCE(array_to_string(toks[6:10], ' '), ''),
        |     COALESCE(array_to_string(toks[1:5], ' '), ''), COALESCE(array_to_string(toks[11:15], ' '), ''),
        |     COALESCE(array_to_string(toks[6:10], ' '), ''), COALESCE(array_to_string(toks[1:5], ' '), '')]
        |    AS lines
        |  FROM t)
        |SELECT doc_id,
        |  array_to_string(list_filter(lines,
        |    (x, i) -> NOT list_contains(lines[1:i-1], x)), chr(10)) AS text
        |FROM pg ORDER BY doc_id""".stripMargin,

    // Partial oracle (fitted side table, the q_deseq2_wald pattern):
    // the ranked merge list is read back and the FULL apply path
    // replays — normalize + word split, then the greedy per-word BPE
    // segmentation as a recursive CTE: each step looks up every
    // adjacent pair's rank (list_position over the rank-ordered merge
    // list; nullif(...,0) maps "absent" to a sentinel), merges the
    // FIRST lowest-rank pair (list_position returns the first minimum,
    // matching the Scala scan), and stops when nothing is mergeable.
    // Distinct words segment once; counts join back per doc instance.
    // All-integer outputs — exact hash compare, no rounding.
    "q_bpe_tokens" ->
      s"""WITH docs AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS nw,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words
        |  FROM documents),
        |words AS (SELECT DISTINCT unnest(nw) AS w FROM docs),
        |ml AS (SELECT list(a || chr(1) || b ORDER BY rank) AS mlist
        |  FROM read_parquet('${oracleSidePath("bpe_merges")}')),
        |init AS (
        |  SELECT w, list_concat(
        |     list_transform(range(1, length(w)), i -> w[i]),
        |     [w[length(w)] || '${graft.functions.Bpe.Eow}']) AS toks
        |  FROM words),
        |rec AS (
        |  WITH RECURSIVE r(w, toks, it) AS (
        |    SELECT w, toks, 0 FROM init
        |    UNION ALL
        |    SELECT w,
        |      toks[1:att-1] || [toks[att] || toks[att+1]] || toks[att+2:],
        |      it + 1
        |    FROM (
        |      SELECT w, toks, it, list_position(rs, list_min(rs)) AS att,
        |        list_min(rs) AS minr
        |      FROM (
        |        SELECT w, toks, it,
        |          list_transform(range(1, len(toks)),
        |            i -> coalesce(nullif(list_position(mlist, toks[i] || chr(1) || toks[i+1]), 0), 1000000)) AS rs
        |        FROM r, ml
        |        WHERE len(toks) >= 2))
        |    WHERE minr < 1000000)
        |  SELECT * FROM r),
        |fin AS (
        |  SELECT w, toks FROM (
        |    SELECT w, toks, it, max(it) OVER (PARTITION BY w) AS mx FROM rec)
        |  WHERE it = mx),
        |counts AS (SELECT w, len(toks) AS k FROM fin),
        |ex AS (SELECT doc_id, unnest(nw) AS w FROM docs),
        |agg AS (SELECT ex.doc_id, SUM(c.k) AS nb
        |  FROM ex JOIN counts c USING (w) GROUP BY ex.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a.nb, 0) AS INTEGER) AS n_bpe_tokens,
        |  CAST(d.n_words AS INTEGER) AS n_words
        |FROM docs d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_lm_perplexity" ->
      s"""${DedupOracle.lmScoreCtes}
        |SELECT doc_id, n_bigrams, entropy_bits
        |FROM e
        |ORDER BY doc_id""".stripMargin,

    // FULL oracle: the interpolated-KN model (vocab, c2/c1, both N1+
    // tables, T) re-derived from scratch; scoring arithmetic replayed
    // term-for-term in the same IEEE order as QualityLm.scoreKn.
    "q_lm_kneser_ney" ->
      s"""${DedupOracle.lmKnScoreCtes}
        |SELECT doc_id, n_bigrams, entropy_bits
        |FROM e
        |ORDER BY doc_id""".stripMargin,

    // The KN score chain + the q_ccnet_buckets rank/cut replay.
    "q_ccnet_buckets_kn" ->
      s"""${DedupOracle.lmKnScoreCtes},
        |j AS (
        |  SELECT e.doc_id, d.lang, e.entropy_bits
        |  FROM e JOIN documents d USING (doc_id)),
        |r AS (
        |  SELECT doc_id, lang, entropy_bits,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY entropy_bits, doc_id) AS ppl_rank,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM j)
        |SELECT doc_id, lang, entropy_bits,
        |  CAST(ppl_rank AS BIGINT) AS ppl_rank,
        |  CASE WHEN ppl_rank * 3 <= n * 1 THEN 'head'
        |       WHEN ppl_rank * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    // The same score chain, then rank-within-language on the canonical
    // (entropy_bits, doc_id) total order and the integer-cross-multiplied
    // cumulative 1/3, 2/3 cuts.
    "q_ccnet_buckets" ->
      s"""${DedupOracle.lmScoreCtes},
        |j AS (
        |  SELECT e.doc_id, d.lang, e.entropy_bits
        |  FROM e JOIN documents d USING (doc_id)),
        |r AS (
        |  SELECT doc_id, lang, entropy_bits,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY entropy_bits, doc_id) AS ppl_rank,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM j)
        |SELECT doc_id, lang, entropy_bits,
        |  CAST(ppl_rank AS BIGINT) AS ppl_rank,
        |  CASE WHEN ppl_rank * 3 <= n * 1 THEN 'head'
        |       WHEN ppl_rank * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "q_split_hash" -> {
      val cuts = graft.operators.Sampling.splitThresholds(
        Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
      s"""WITH h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) AS hh
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN hh < ${cuts(0)._2} THEN 'train'
        |       WHEN hh < ${cuts(1)._2} THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM h
        |ORDER BY doc_id""".stripMargin
    },

    // Family labels re-derived exactly (all-pairs Jaccard + recursive
    // components), then the identical hash/threshold walk keyed by
    // COALESCE(family, doc_id).
    "q_split_leakage" -> {
      val cuts = graft.operators.Sampling.splitThresholds(
        Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
      s"""${DedupOracle.charShingleCtes("documents")},
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    ${DedupOracle.jaccardExpr} AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |e AS (SELECT id_a, id_b FROM p WHERE j >= 0.8),
        |ee AS (SELECT id_a AS u, id_b AS v FROM e
        |       UNION SELECT id_b, id_a FROM e),
        |comp AS (
        |  WITH RECURSIVE r(node, rep) AS (
        |    SELECT u, u FROM ee
        |    UNION
        |    SELECT ee.v, r.rep FROM r JOIN ee ON ee.u = r.node)
        |  SELECT node, MIN(rep) AS rep FROM r GROUP BY node),
        |k AS (
        |  SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS sk
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
        |h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(sk::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) AS hh
        |  FROM k)
        |SELECT doc_id,
        |  CASE WHEN hh < ${cuts(0)._2} THEN 'train'
        |       WHEN hh < ${cuts(1)._2} THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM h
        |ORDER BY doc_id""".stripMargin
    },

    // Scoring replayed as PURE double arithmetic over the exported
    // model row and bit-identical integer-rational features (raw
    // whitespace tokens, stopword fraction, mean token length) — the
    // same IEEE operation sequence, so eta matches exactly, not just
    // to rounding.
    "q_quality_classifier" ->
      s"""WITH m AS (SELECT feature, weight FROM read_parquet('${oracleSidePath("quality_clf")}')),
        |w AS (SELECT
        |  max(CASE WHEN feature = '__intercept' THEN weight END) AS b,
        |  max(CASE WHEN feature = 'n_tokens' THEN weight END) AS w0,
        |  max(CASE WHEN feature = 'stopword_ratio' THEN weight END) AS w1,
        |  max(CASE WHEN feature = 'mean_token_len' THEN weight END) AS w2
        | FROM m),
        |f AS (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> ''))::DOUBLE AS f0,
        |  CASE WHEN len(list_filter(string_split(lower(text), ' '), x -> x <> '')) = 0 THEN 0.0
        |       ELSE len(list_filter(string_split(lower(text), ' '),
        |              x -> x <> '' AND list_contains([${graft.functions.TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")}], x)))::DOUBLE
        |            / len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |  END AS f1,
        |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) = 0 THEN 0.0
        |       ELSE list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''), t -> length(t)))::DOUBLE
        |            / len(list_filter(string_split(text, ' '), x -> x <> ''))
        |  END AS f2
        | FROM documents),
        |e AS (SELECT doc_id, b + w0 * f0 + w1 * f1 + w2 * f2 AS eta FROM f, w)
        |SELECT doc_id, floor(eta * 1e4 + 0.5) / 1e4 AS eta,
        |  CAST(eta >= 0 AS INT) AS pred
        |FROM e ORDER BY doc_id""".stripMargin,

    // The FIT replayed end-to-end with NO side table: one Newton step
    // from w=0 is exp-free (p = 1/2, s = 1/4, g = y - 1/2 exactly), so
    // the oracle recomputes the decimal(38,6) Gram/gradient sums from
    // the raw features, applies the ridge, and unrolls the SAME
    // partially-pivoted 4x4 Gaussian elimination + back-substitution
    // (matrix as (i,j,v) rows, pivot = max |v| with smallest-i
    // tie-break, augmented column j=4) — plain IEEE +,-,*,/ in the
    // identical order, so the weights are bit-identical, not just close.
    "q_quality_fit1" ->
      (fit1OracleCtes("") + """
        |SELECT * FROM (
        |  SELECT '__intercept' AS feature, (SELECT w FROM x0) AS weight
        |  UNION ALL SELECT 'n_tokens', (SELECT w FROM x1)
        |  UNION ALL SELECT 'stopword_ratio', (SELECT w FROM x2)
        |  UNION ALL SELECT 'mean_token_len', (SELECT w FROM x3))
        |ORDER BY feature""".stripMargin),

    // Model-stage FILTERING end-to-end with zero side tables: the model
    // fits (one replayable Newton step) on the corpus split, every doc
    // scores through the same IEEE sequence (b + w0*f0 + w1*f1 + w2*f2,
    // null text -> null eta -> dropped, like the engine's null-drop
    // gates), and only eta >= 0 survives.
    "q_quality_filter1" ->
      (fit1OracleCtes(" WHERE doc_id % 7 <> 0") + s""",
        |sc AS (SELECT doc_id,
        |  (SELECT w FROM x0)
        |    + (SELECT w FROM x1) * len(list_filter(string_split(text, ' '), x -> x <> ''))::DOUBLE
        |    + (SELECT w FROM x2) * (CASE WHEN len(list_filter(string_split(lower(text), ' '), x -> x <> '')) = 0 THEN 0.0
        |         ELSE len(list_filter(string_split(lower(text), ' '),
        |                x -> x <> '' AND list_contains([${graft.functions.TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")}], x)))::DOUBLE
        |              / len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |         END)
        |    + (SELECT w FROM x3) * (CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) = 0 THEN 0.0
        |         ELSE list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''), t -> length(t)))::DOUBLE
        |              / len(list_filter(string_split(text, ' '), x -> x <> ''))
        |         END) AS eta
        | FROM documents)
        |SELECT doc_id FROM sc WHERE eta >= 0
        |ORDER BY doc_id""".stripMargin),

    // Survivors derived independently: token hit via list_has_any over
    // the same canonical tokens, domain hit by the id arithmetic that
    // synthesized the host (m in {0,2} blocked).
    // Every (doc, phrase) hit re-derived independently: space-flanked
    // containment of each side-table phrase in the same normalized text.
    "q_blocklist_10k" ->
      s"""WITH docs AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS nt
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT phrase FROM read_parquet('${oracleSidePath("blocklist_10k")}'))
        |SELECT d.doc_id, p.phrase
        |FROM docs d JOIN p ON contains(' ' || d.nt || ' ', ' ' || p.phrase || ' ')
        |ORDER BY doc_id, phrase""".stripMargin,

    "q_blocklist_filter" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  'h' || doc_id::VARCHAR || '.site' || (doc_id % 4)::VARCHAR || '.co.uk' AS host
        |FROM t
        |WHERE NOT list_has_any(toks, ['agg', 'scan'])
        |  AND (doc_id % 4) IN (1, 3)
        |ORDER BY doc_id""".stripMargin,

    // Domain derived by the same id arithmetic (multi-part .co.uk TLD →
    // pay-level = site<m>.co.uk), survivors by the q_sample_quota rank
    // replay per domain.
    "q_domain_quota" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    'site' || (doc_id % 3)::VARCHAR || '.co.uk' AS domain,
        |    CAST(('0x' || substring(md5(doc_id::VARCHAR || ':' || '42'), 1, 15)) AS BIGINT) AS hh
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, domain,
        |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY hh, doc_id) AS rk
        |  FROM h)
        |SELECT doc_id, domain FROM r WHERE rk <= 40
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_ngrams" ->
      s"""WITH n AS (
        |  SELECT doc_id, ${DedupOracle.normExpr} AS norm FROM documents),
        |t AS (
        |  SELECT list_filter(string_split(norm, ' '), x -> x <> '') AS toks FROM n),
        |g AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 2),
        |    i -> array_to_string(toks[i:i+2], ' '))) AS gram
        |  FROM t WHERE len(toks) >= 3)
        |SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram
        |LIMIT 25""".stripMargin,

    "q_asof_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, epoch_us(p.ts) AS ts_us,
        |  p.value AS purchase_value,
        |  epoch_us(v.ts) AS view_ts_us, v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    // Forward = backward ASOF on negated epoch micros: -p >= -v ⟺
    // v.ts >= p.ts, and "max -v.ts" = "min v.ts at-or-after".
    "q_asof_forward" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, ts, value,
        |    -epoch_us(ts) AS nts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, value,
        |    -epoch_us(ts) AS nts FROM events WHERE event_type = 'view')
        |SELECT p.user_id, p.purchase_id, epoch_us(p.ts) AS ts_us,
        |  p.value AS purchase_value,
        |  epoch_us(v.ts) AS view_ts_us, v.value AS view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.nts >= v.nts
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    // Nearest: both ASOF directions, then pick the closer (integer
    // micro distances; ties → backward).
    "q_asof_nearest" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, ts, value
        |    FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |b AS (SELECT p.purchase_id, v.ts AS bts, v.value AS bval
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts),
        |pn AS (SELECT user_id, purchase_id, -epoch_us(ts) AS nts FROM p),
        |vn AS (SELECT user_id, ts, value, -epoch_us(ts) AS nts FROM v),
        |f AS (SELECT pn.purchase_id, vn.ts AS fts, vn.value AS fval
        |  FROM pn ASOF LEFT JOIN vn ON pn.user_id = vn.user_id AND pn.nts >= vn.nts)
        |SELECT p.user_id, p.purchase_id, epoch_us(p.ts) AS ts_us,
        |  p.value AS purchase_value,
        |  CASE WHEN b.bts IS NULL THEN epoch_us(f.fts)
        |       WHEN f.fts IS NULL THEN epoch_us(b.bts)
        |       WHEN epoch_us(p.ts) - epoch_us(b.bts)
        |            <= epoch_us(f.fts) - epoch_us(p.ts) THEN epoch_us(b.bts)
        |       ELSE epoch_us(f.fts) END AS view_ts_us,
        |  CASE WHEN b.bts IS NULL THEN f.fval
        |       WHEN f.fts IS NULL THEN b.bval
        |       WHEN epoch_us(p.ts) - epoch_us(b.bts)
        |            <= epoch_us(f.fts) - epoch_us(p.ts) THEN b.bval
        |       ELSE f.fval END AS view_value
        |FROM p
        |LEFT JOIN b USING (purchase_id)
        |LEFT JOIN f USING (purchase_id)
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    "q_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us, p.value AS value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,

    "q_stream_sliding" ->
      """WITH slots AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS slot
        |  FROM events),
        |expanded AS (
        |  SELECT event_type, slot AS window_start FROM slots
        |  UNION ALL
        |  SELECT event_type, slot - 1800 AS window_start FROM slots)
        |SELECT window_start, event_type, COUNT(*) AS n_events
        |FROM expanded
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,

    "q_stream_session" ->
      """WITH o AS (SELECT user_id, ts, value,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |marked AS (SELECT *, CASE WHEN prev IS NULL
        |    OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM o),
        |g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM marked)
        |SELECT user_id,
        |  CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_sec,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM g
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start_sec""".stripMargin,

    // Batch degradation of the flatMapGroupsWithState running totals:
    // one emission per user carrying the exact-decimal running sum.
    "q_stream_running" ->
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_stream_enriched" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  CASE WHEN user_id % 3 = 0 THEN 'gold'
        |       WHEN user_id % 3 = 1 THEN 'silver'
        |       ELSE 'bronze' END AS segment,
        |  COUNT(*) AS n_events
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, segment""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // 8 unrolled integer power iterations — bit-exact replay of the
    // scaled-BIGINT recurrence (floor divisions, exact integer sums,
    // dangling mass through the teleport set); no float trust anywhere
    "q_pagerank" -> pageRankOracleSql(seeded = false),
    "q_pagerank_seeded" -> pageRankOracleSql(seeded = true),

    "q_degree_profile" ->
      """WITH cnt AS (SELECT COUNT(*)::BIGINT AS n FROM customer),
        |nd AS (SELECT c_custkey::BIGINT AS node FROM customer),
        |raw AS (
        |  SELECT c_custkey::BIGINT AS src,
        |         (c_custkey * 31 + 7) % (SELECT n FROM cnt) AS dst
        |    FROM customer WHERE c_custkey % 13 <> 0
        |  UNION
        |  SELECT c_custkey::BIGINT, (c_custkey * 17 + 3) % (SELECT n FROM cnt)
        |    FROM customer WHERE c_custkey % 13 <> 0
        |  UNION
        |  SELECT c_custkey::BIGINT, 0 FROM customer
        |    WHERE c_custkey % 13 <> 0 AND c_custkey % 10 < 3),
        |e AS MATERIALIZED (SELECT src, dst::BIGINT AS dst FROM raw WHERE src <> dst)
        |SELECT nd.node,
        |  COALESCE(od.c, 0)::BIGINT AS out_deg,
        |  COALESCE(id.c, 0)::BIGINT AS in_deg
        |FROM nd
        |LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) od ON od.src = nd.node
        |LEFT JOIN (SELECT dst, COUNT(*) AS c FROM e GROUP BY dst) id ON id.dst = nd.node
        |ORDER BY node""".stripMargin,

    // one row per profiled column; min/max stringified — every
    // profiled column is integer or ASCII so the casts are
    // engine-neutral
    "q_profile" ->
      """WITH m AS (SELECT COUNT(*)::BIGINT AS n FROM documents)
        |SELECT 'doc_id' AS "column", (SELECT n FROM m) AS n_rows,
        |  (SELECT n FROM m) - COUNT(doc_id) AS n_nulls,
        |  COUNT(DISTINCT doc_id) AS n_distinct,
        |  CAST(MIN(doc_id) AS VARCHAR) AS min_s, CAST(MAX(doc_id) AS VARCHAR) AS max_s
        |FROM documents
        |UNION ALL
        |SELECT 'lang', (SELECT n FROM m), (SELECT n FROM m) - COUNT(lang),
        |  COUNT(DISTINCT lang), MIN(lang), MAX(lang) FROM documents
        |UNION ALL
        |SELECT 'n_chars', (SELECT n FROM m), (SELECT n FROM m) - COUNT(n_chars),
        |  COUNT(DISTINCT n_chars),
        |  CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', (SELECT n FROM m), (SELECT n FROM m) - COUNT(source),
        |  COUNT(DISTINCT source), MIN(source), MAX(source) FROM documents
        |ORDER BY "column"""".stripMargin,

    // each constraint's violation count re-derived independently
    "q_quality_checks" ->
      """SELECT * FROM (
        |SELECT 'l_orderkey' AS "column", 'not_null' AS "constraint",
        |  COUNT(*) FILTER (WHERE l_orderkey IS NULL)::BIGINT AS violations,
        |  COUNT(*) FILTER (WHERE l_orderkey IS NULL) = 0 AS passed
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_orderkey', 'unique',
        |  (COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey))::BIGINT,
        |  COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) = 0 FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', 'in_range',
        |  COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
        |    AND (l_quantity < 1 OR l_quantity > 50))::BIGINT,
        |  COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
        |    AND (l_quantity < 1 OR l_quantity > 50)) = 0 FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', 'in_set',
        |  COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
        |    AND l_returnflag NOT IN ('A', 'N', 'R'))::BIGINT,
        |  COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
        |    AND l_returnflag NOT IN ('A', 'N', 'R')) = 0 FROM lineitem
        |UNION ALL
        |SELECT 'l_linestatus', 'matches',
        |  COUNT(*) FILTER (WHERE l_linestatus IS NOT NULL
        |    AND NOT regexp_matches(l_linestatus, '^[OF]$'))::BIGINT,
        |  COUNT(*) FILTER (WHERE l_linestatus IS NOT NULL
        |    AND NOT regexp_matches(l_linestatus, '^[OF]$')) = 0 FROM lineitem
        |) ORDER BY "column", "constraint"""".stripMargin,

    // DuckDB's native inequality join over the same derived intervals —
    // the engine-level range join our binned plan must agree with
    "q_interval_join" ->
      """WITH l AS (
        |  SELECT l_orderkey AS li_id,
        |    (l_orderkey * 37 + l_partkey) % 100000 AS ls,
        |    (l_orderkey * 37 + l_partkey) % 100000 + 1
        |      + (CAST(l_quantity AS BIGINT) * 13) % 200 AS le
        |  FROM lineitem WHERE l_linenumber = 1),
        |r AS (
        |  SELECT p_partkey AS r_id,
        |    (p_partkey * 53) % 100000 AS rs,
        |    (p_partkey * 53) % 100000 + 1 + (p_partkey * 7) % 300 AS re
        |  FROM part)
        |SELECT l.li_id, r.r_id,
        |  LEAST(l.le, r.re) - GREATEST(l.ls, r.rs) AS overlap_len
        |FROM l JOIN r ON l.ls < r.re AND r.rs < l.le
        |ORDER BY li_id, r_id""".stripMargin,

    "q_interval_cover" ->
      """WITH l AS (
        |  SELECT l_orderkey AS li_id,
        |    (l_orderkey * 37 + l_partkey) % 100000 AS ls,
        |    (l_orderkey * 37 + l_partkey) % 100000 + 1
        |      + (CAST(l_quantity AS BIGINT) * 13) % 200 AS le
        |  FROM lineitem WHERE l_linenumber = 1),
        |r AS (
        |  SELECT p_partkey AS r_id,
        |    (p_partkey * 53) % 100000 AS rs,
        |    (p_partkey * 53) % 100000 + 1 + (p_partkey * 7) % 300 AS re
        |  FROM part),
        |hits AS (
        |  SELECT r.r_id, COUNT(*)::BIGINT AS n
        |  FROM l JOIN r ON l.ls < r.re AND r.rs < l.le
        |  GROUP BY r.r_id)
        |SELECT r.r_id AS r_id, COALESCE(hits.n, 0)::BIGINT AS n_overlaps
        |FROM r LEFT JOIN hits ON hits.r_id = r.r_id
        |ORDER BY 1""".stripMargin,

    // the identical per-group run-detection window replayed: running
    // max of predecessor ends -> new-run flag -> run id -> rollup
    "q_interval_merge" ->
      """WITH r AS (
        |  SELECT p_partkey % 16 AS g,
        |    (p_partkey * 53) % 100000 AS rs,
        |    (p_partkey * 53) % 100000 + 1 + (p_partkey * 7) % 300 AS re
        |  FROM part),
        |f AS (
        |  SELECT g, rs, re,
        |    MAX(re) OVER (PARTITION BY g ORDER BY rs, re
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM r),
        |runs AS (
        |  SELECT g, rs, re,
        |    SUM(CASE WHEN pmax IS NULL OR rs > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY g ORDER BY rs, re
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM f)
        |SELECT g, MIN(rs) AS start, MAX(re) AS "end", COUNT(*)::BIGINT AS n_merged
        |FROM runs GROUP BY g, run
        |ORDER BY g, start""".stripMargin,

    // naive per-group cross join + argmin — the exact ground truth the
    // three-way candidate plan must reproduce, tie to smaller r_id;
    // GREATEST(ls - re, rs - le, 0) is the half-open distance in both
    // engines (0 iff overlap)
    "q_interval_closest" ->
      """WITH l AS (
        |  SELECT l_orderkey AS li_id, l_orderkey % 16 AS g,
        |    (l_orderkey * 37 + l_partkey) % 100000 AS ls,
        |    (l_orderkey * 37 + l_partkey) % 100000 + 1
        |      + (CAST(l_quantity AS BIGINT) * 13) % 200 AS le
        |  FROM lineitem WHERE l_linenumber = 1),
        |r AS (
        |  SELECT p_partkey AS r_id, p_partkey % 16 AS g,
        |    (p_partkey * 53) % 100000 AS rs,
        |    (p_partkey * 53) % 100000 + 1 + (p_partkey * 7) % 300 AS re
        |  FROM part),
        |cand AS (
        |  SELECT l.li_id, r.r_id,
        |    GREATEST(l.ls - r.re, r.rs - l.le, 0) AS dist,
        |    ROW_NUMBER() OVER (PARTITION BY l.li_id
        |      ORDER BY GREATEST(l.ls - r.re, r.rs - l.le, 0), r.r_id) AS rn
        |  FROM l JOIN r ON l.g = r.g)
        |SELECT li_id, r_id, dist AS distance FROM cand WHERE rn = 1
        |ORDER BY li_id""".stripMargin,

    // the streaming screen's verdict suite re-derived with FILTER
    // aggregates over events (regex inside the Java∩RE2 subset)
    "q_stream_quality" ->
      """SELECT * FROM (
        |SELECT 'user_id' AS "column", 'not_null' AS "constraint",
        |  COUNT(*) FILTER (WHERE user_id IS NULL)::BIGINT AS violations,
        |  COUNT(*) FILTER (WHERE user_id IS NULL) = 0 AS passed
        |FROM events
        |UNION ALL
        |SELECT 'value', 'in_range',
        |  COUNT(*) FILTER (WHERE value IS NOT NULL
        |    AND (value < 0 OR value > 500))::BIGINT,
        |  COUNT(*) FILTER (WHERE value IS NOT NULL
        |    AND (value < 0 OR value > 500)) = 0 FROM events
        |UNION ALL
        |SELECT 'event_type', 'in_set',
        |  COUNT(*) FILTER (WHERE event_type IS NOT NULL AND event_type
        |    NOT IN ('click', 'error', 'purchase', 'signup', 'view'))::BIGINT,
        |  COUNT(*) FILTER (WHERE event_type IS NOT NULL AND event_type
        |    NOT IN ('click', 'error', 'purchase', 'signup', 'view')) = 0
        |FROM events
        |UNION ALL
        |SELECT 'props', 'matches',
        |  COUNT(*) FILTER (WHERE props IS NOT NULL
        |    AND NOT regexp_matches(props, '^\{"k": [0-9]+\}$'))::BIGINT,
        |  COUNT(*) FILTER (WHERE props IS NOT NULL
        |    AND NOT regexp_matches(props, '^\{"k": [0-9]+\}$')) = 0
        |FROM events
        |) ORDER BY "column", "constraint"""".stripMargin,

    // both sides profiled by the same per-column arms, joined on the
    // column name — before = documents, after = the derived ingest
    "q_profile_drift" -> {
      def arms(table: String): String = Seq(
        ("doc_id", true), ("lang", false), ("n_chars", true)).map { case (c, isInt) =>
        val mn = if (isInt) s"CAST(MIN($c) AS VARCHAR)" else s"MIN($c)"
        val mx = if (isInt) s"CAST(MAX($c) AS VARCHAR)" else s"MAX($c)"
        s"""SELECT '$c' AS col, (SELECT COUNT(*) FROM $table)::BIGINT AS n_rows,
           |    ((SELECT COUNT(*) FROM $table) - COUNT($c))::BIGINT AS n_nulls,
           |    COUNT(DISTINCT $c) AS n_distinct, $mn AS min_s, $mx AS max_s
           |  FROM $table""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH aft AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
         |    n_chars
         |  FROM documents WHERE doc_id % 5 <> 0),
         |pb AS (
         |  ${arms("documents")}),
         |pa AS (
         |  ${arms("aft")})
         |SELECT pb.col AS "column",
         |  pb.n_rows AS n_rows_before, pb.n_nulls AS n_nulls_before,
         |  pb.n_distinct AS n_distinct_before,
         |  pb.min_s AS min_before, pb.max_s AS max_before,
         |  pa.n_rows AS n_rows_after, pa.n_nulls AS n_nulls_after,
         |  pa.n_distinct AS n_distinct_after,
         |  pa.min_s AS min_after, pa.max_s AS max_after
         |FROM pb JOIN pa ON pa.col = pb.col
         |ORDER BY 1""".stripMargin
    },

    // the identical rank arithmetic: order-statistic quartiles at
    // ceil(n/4)/ceil(3n/4), Tukey fences with the same +,-,*,/ tree —
    // lo/hi are double expressions over stored doubles, bit-exact in
    // both engines
    "q_outliers" ->
      """WITH nn AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |rk AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM nn),
        |f AS (
        |  SELECT event_type, MAX(n)::BIGINT AS n,
        |    MAX(CASE WHEN rn = (n + 3) // 4 THEN value END) AS q1,
        |    MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) AS q3
        |  FROM rk GROUP BY event_type),
        |fen AS (
        |  SELECT event_type, n, q1, q3,
        |    q1 - 3 * (q3 - q1) / 2 AS lo,
        |    q3 + 3 * (q3 - q1) / 2 AS hi
        |  FROM f),
        |cnt AS (
        |  SELECT nn.event_type,
        |    COUNT(*) FILTER (WHERE nn.value < fen.lo OR nn.value > fen.hi)::BIGINT
        |      AS n_outliers
        |  FROM nn JOIN fen USING (event_type) GROUP BY nn.event_type)
        |SELECT fen.event_type, fen.n, fen.q1, fen.q3, fen.lo, fen.hi,
        |  cnt.n_outliers
        |FROM fen JOIN cnt USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // compaction is content-preserving: the oracle is the source table
    // verbatim — hash equality across the 64-file write + compaction
    // rewrite is the losslessness proof
    "q_compact_roundtrip" ->
      """SELECT doc_id, lang, source, text FROM documents
        |ORDER BY doc_id""".stripMargin,

    // the standard-SQL cube with GROUPING(lang, source) — the same
    // bitmask semantics (dimension aggregated-out => bit set) in both
    // engines
    "q_corpus_cube" ->
      """SELECT lang, source,
        |  GROUPING(lang, source)::BIGINT AS grouping_id,
        |  COUNT(*)::BIGINT AS n_docs,
        |  COALESCE(SUM(n_chars), 0)::BIGINT AS n_chars
        |FROM documents
        |GROUP BY CUBE (lang, source)
        |ORDER BY grouping_id, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    // per-threshold confusion arms generated from the same list the
    // query uses; P/R/F1 as one division of exact counts, NULL-guarded
    // identically
    "q_eval_pr" -> {
      val arms = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map { t =>
        s"""SELECT $t::DOUBLE AS threshold,
           |  COUNT(*) FILTER (WHERE score >= $t AND label = 1)::BIGINT AS tp,
           |  COUNT(*) FILTER (WHERE score >= $t AND label = 0)::BIGINT AS fp,
           |  COUNT(*) FILTER (WHERE score < $t AND label = 1)::BIGINT AS fn,
           |  COUNT(*) FILTER (WHERE score < $t AND label = 0)::BIGINT AS tn
           |FROM sc""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH sc AS (
         |  SELECT ((doc_id * 37 + 11) % 1000) / 1000.0 AS score,
         |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label
         |  FROM documents),
         |cm AS (
         |$arms)
         |SELECT threshold, tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp)::DOUBLE END AS precision,
         |  CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn)::DOUBLE END AS recall,
         |  CASE WHEN 2 * tp + fp + fn > 0
         |    THEN (2 * tp)::DOUBLE / (2 * tp + fp + fn)::DOUBLE END AS f1
         |FROM cm ORDER BY threshold""".stripMargin
    },

    // equal-width bins via the identical floor(score*bins) tree;
    // mean_score through the decimal-exact sum (the dsumWide shape)
    "q_eval_calibration" ->
      """WITH sc AS (
        |  SELECT ((doc_id * 37 + 11) % 1000) / 1000.0 AS score,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label
        |  FROM documents),
        |b AS (SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
        |        score, label FROM sc)
        |SELECT bin, COUNT(*)::BIGINT AS n,
        |  COUNT(*) FILTER (WHERE label = 1)::BIGINT AS n_pos,
        |  CAST(SUM(CAST(score AS DECIMAL(38,6))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS mean_score,
        |  CAST(COUNT(*) FILTER (WHERE label = 1) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS frac_pos
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // the same union + key-window merge: version DESC, change side
    // wins ties, tombstones filtered after ranking
    "q_cdc_upsert" ->
      """WITH snap AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    0::BIGINT AS version, 'U' AS op, 0 AS src
        |  FROM orders),
        |ch AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
        |    1::BIGINT AS version,
        |    CASE WHEN o_orderkey % 9 = 0 THEN 'D' ELSE 'U' END AS op, 1 AS src
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |u AS (SELECT * FROM snap UNION ALL SELECT * FROM ch),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC, src DESC) AS rn
        |  FROM u)
        |SELECT o_orderkey, o_custkey, o_totalprice, version
        |FROM rk WHERE rn = 1 AND op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
  )

  /** Batch assignment + oracle SQL for q_batch_effect, generated from the
    * SAME projection matrix the operator uses (cannot drift). */
  /** DuckDB re-derivation of the full edgeR TMM → log-CPM pipeline
    * ([[graft.functions.Normalization.tmmAndLib]] exact path +
    * [[graft.functions.Normalization.logCpm]], prior.count = 5):
    *
    *  - library sizes + exact type-7 75th percentiles (`quantile_cont`
    *    mirrors Spark's `percentile` interpolation bit-for-bit on
    *    integer counts);
    *  - reference column = first minimum of |f75 − mean| in column
    *    declaration order (Scala `minBy` tie semantics);
    *  - M/A/weight values over genes with positive counts on both sides;
    *  - two-sided trim by R average ranks (rank() + (peers−1)/2): tie
    *    groups are exact rational equalities of count ratios — e.g.
    *    (5,7) vs (10,14) yields bit-identical IEEE ratios — so they
    *    form identically in both engines, and distinct ratios sit
    *    hundreds of ulps apart, far outside cross-engine log2 jitter;
    *  - trimmed weighted mean, 2^f with edgeR's |M|max < 1e-6 guard,
    *    geometric-mean normalization, prior-scaled log2 CPM.
    *
    * Both sides round to 4 decimals: the only cross-engine
    * nondeterminism left is summation order inside the trimmed means
    * (~1e-13 relative), far inside the 1e-4 bucket. */
  /** DuckDB re-derivation of the full NOISeq replicate path
    * ([[graft.stats.NOISeq]] with A/R replicates): zeros → k = 0.5,
    * library sizes on the zeroed data, pairwise old-edgeR TMM factors vs
    * the first data column (exact rank-trim — the [[TmmOracle]] pattern,
    * but per pair and WITHOUT the |M|max guard, matching
    * [[graft.stats.Tmm2.pairFactor]]), geometric-mean renormalization to
    * the mean library size, per-gene M = log2(meanA/meanB) and
    * D = |meanA − meanB|, the pooled within-condition noise pairs, and
    * Prob = fraction of noise points strictly dominated in both |M*| and
    * D*. The trimmed-mean sums are the only cross-engine nondeterminism
    * (~1e-13 summation order); the strict dominance comparisons are
    * between value populations whose pairwise gaps are ≫ 1e-7 on the
    * gate data, so no comparison straddles the jitter. */
  /** Robots gate + HTML extraction + hygiene + boilerplate + length
    * gate, re-derived stage-for-stage in DuckDB (shared by
    * q_crawl_pipeline and its WARC-fed twin q_warc_pipeline). */
  /** The langId marker-set argmax replayed in DuckDB, generated from
    * [[graft.functions.TextFunctions.LangProfiles]] itself (first-wins
    * tie rule = first profile whose score equals the max). */
  /** The greedy k-center selection unrolled as k layered 1-row CTEs:
    * c0 = smallest vec_id; cI = argmax over the corpus of the least
    * cosine distance to c0..c(I-1), ties to the smallest id — the
    * exact farthest-first traversal [[graft.operators.Sampling
    * .kCenterSelect]] runs, selection-for-selection. */
  /** The Luhn card gate re-derived in DuckDB: card synthesis (check
    * digit recomputed with list arithmetic from the same body), the
    * identical RE2 candidate pattern, per-candidate Luhn validation,
    * and the post-redaction length as length arithmetic over the
    * validated candidates. */
  private def PiiCardsOracleSql: String = {
    val pat = graft.functions.TextFunctions.CardCandidatePattern
    // Luhn sum over digit string r with doubling at odd right offsets
    def luhnSum(r: String) =
      s"""list_sum(list_transform(generate_series(1, len($r)), i ->
         |      CASE WHEN (len($r) - i) % 2 = 1
         |        THEN CASE WHEN 2 * CAST(substring($r, i, 1) AS INT) > 9
         |          THEN 2 * CAST(substring($r, i, 1) AS INT) - 9
         |          ELSE 2 * CAST(substring($r, i, 1) AS INT) END
         |        ELSE CAST(substring($r, i, 1) AS INT) END))""".stripMargin
    val chkSum =
      s"""list_sum(list_transform(generate_series(1, 15), j ->
         |      CASE WHEN j % 2 = 1
         |        THEN CASE WHEN 2 * CAST(substring(body, j, 1) AS INT) > 9
         |          THEN 2 * CAST(substring(body, j, 1) AS INT) - 9
         |          ELSE 2 * CAST(substring(body, j, 1) AS INT) END
         |        ELSE CAST(substring(body, j, 1) AS INT) END))""".stripMargin
    val validPred = "len(r) >= 13 AND len(r) <= 19 AND (" +
      luhnSum("r") + ") % 10 = 0"
    val rExpr = "regexp_replace(x, '[^0-9]', '', 'g')"
    val validExpanded = ("len(" + rExpr + ") >= 13 AND len(" + rExpr + ") <= 19 AND (" +
      luhnSum(rExpr) + ") % 10 = 0")
    s"""WITH d0 AS (
       |  SELECT doc_id, text,
       |    '4' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 14, '0') AS body
       |  FROM documents WHERE text IS NOT NULL),
       |d1 AS (SELECT doc_id, text, body,
       |    CAST((10 - CAST($chkSum AS INT) % 10) % 10 AS VARCHAR) AS chk
       |  FROM d0),
       |d AS (SELECT doc_id,
       |    text ||
       |    CASE WHEN doc_id % 4 = 0 THEN ' ' || body || chk ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0
       |      THEN ' ' || body || CAST((CAST(chk AS INT) + 5) % 10 AS VARCHAR)
       |      ELSE '' END AS t
       |  FROM d1),
       |c AS (SELECT doc_id, t,
       |    regexp_extract_all(t, '$pat') AS cands
       |  FROM d),
       |v AS (SELECT doc_id, t, cands,
       |    -- validity judged on the stripped digits (expanded inline —
       |    -- DuckDB lambdas take no subqueries), lengths taken from the
       |    -- ORIGINAL matched candidates (what the UDF replaces)
       |    list_filter(cands, x -> $validExpanded) AS valids
       |  FROM c)
       |SELECT doc_id,
       |  CAST(len(cands) AS INT) AS n_candidates,
       |  CAST(len(valids) AS INT) AS n_valid,
       |  CAST(length(t)
       |    - COALESCE(list_sum(list_transform(valids, x -> length(x))), 0)
       |    + 6 * len(valids) AS INT) AS len_redacted
       |FROM v
       |ORDER BY doc_id""".stripMargin
  }

  /** The Heaps'-law report re-derived in DuckDB: same id-arithmetic
    * prefix cuts, first-occurrence vocabulary counts, decimal-exact OLS
    * ([[graft.operators.CorpusReport.heapsReport]] step for step). */
  private def HeapsOracleSql: String = {
    val points = 10
    val cutsSql = (1 to points).map(k =>
      s"CAST(ceil(CAST(m.mx AS DOUBLE) * $k / $points) AS BIGINT)")
    val tokCols = cutsSql.zipWithIndex.map { case (c, i) =>
      s"SUM(CASE WHEN __id <= $c THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS t$i"
    }.mkString(",\n    ")
    val vocCols = cutsSql.zipWithIndex.map { case (c, i) =>
      s"SUM(CASE WHEN __first <= $c THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS v$i"
    }.mkString(",\n    ")
    val ptArms = (0 until points).map(i =>
      s"  SELECT ${i + 1} AS decile, CAST(tok.t$i AS BIGINT) AS n_tokens, CAST(voc.v$i AS BIGINT) AS n_types FROM tok, voc")
      .mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT doc_id AS __id,
       |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS __w
       |  FROM documents WHERE text IS NOT NULL),
       |m AS (SELECT MAX(__id) AS mx FROM base),
       |fs AS (SELECT __w, MIN(__id) AS __first FROM base GROUP BY __w),
       |tok AS (SELECT
       |    $tokCols
       |  FROM base, m),
       |voc AS (SELECT
       |    $vocCols
       |  FROM fs, m),
       |pts AS (
       |$ptArms),
       |f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(ln(CAST(n_types AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_types AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy
       |  FROM pts WHERE n_tokens > 0),
       |tot AS (SELECT MAX(n_tokens) AS n_tokens, MAX(n_types) AS n_types FROM pts)
       |SELECT tot.n_tokens, tot.n_types,
       |  floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 10000 + 0.5) / 10000 AS heaps_beta,
       |  floor(exp((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * 10000 + 0.5) / 10000 AS heaps_k
       |FROM f, tot""".stripMargin
  }

  /** The confusable-fold round-trip replayed with DuckDB's translate
    * over the IDENTICAL mapping (generated from
    * [[graft.functions.TextFunctions.ConfusablePairs]] so the two can
    * never drift). */
  private def ConfusablesOracleSql: String = {
    val pairs = graft.functions.TextFunctions.ConfusablePairs
    val from = pairs.map(_._1).mkString
    val to = pairs.map(_._2).mkString
    s"""WITH d AS (SELECT doc_id, text,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN translate(text, 'aeopc', '\u0430\u0435\u043E\u0440\u0441')
       |      ELSE text END AS m
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id,
       |  CAST(md5(m) <> md5(text) AS INT) AS mutated_differs,
       |  CAST(md5(translate(m, '$from', '$to')) = md5(text) AS INT) AS skeleton_matches
       |FROM d
       |ORDER BY doc_id""".stripMargin
  }

  private def KCenterOracleSql: String = {
    val k = 8
    val steps = (1 until k).map { i =>
      val dists = (0 until i).map(j => s"1 - list_cosine_similarity(e.v, c$j.v$j)")
      val d = if (dists.size == 1) dists.head else s"least(${dists.mkString(", ")})"
      s"""c$i AS (SELECT e.vec_id AS id$i, e.v AS v$i, $d AS d$i
         |  FROM e${(0 until i).map(j => s", c$j").mkString}
         |  ORDER BY d$i DESC, e.vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val arms = (s"SELECT 0 AS rank, id0 AS vec_id, CAST(NULL AS REAL) AS radius FROM c0" +:
      (1 until k).map(i =>
        s"SELECT $i AS rank, id$i AS vec_id, CAST(d$i AS REAL) AS radius FROM c$i"))
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS id0, v AS v0 FROM e ORDER BY vec_id LIMIT 1),
       |$steps
       |$arms
       |ORDER BY rank""".stripMargin
  }

  /** Byte-level BPE per-document token counts re-derived from scratch —
    * the shared CTE chain of q_pack_bpe_bytes and q_tokenizer_fertility:
    * GPT-2-style pretokenization (the lookahead-free regex +
    * whitespace-donation fixup — the exact algorithm
    * [[graft.functions.Bpe.pretokenize]] runs), initial merge units as
    * hex byte pairs of encode(w) (bijective image of the byte→printable
    * alphabet, so the merge algebra replays verbatim against the
    * hex-serialized merge side table `side`), the recursive-CTE merge
    * replay, and the per-doc rollup `agg(doc_id, nb)`. Ends WITHOUT a
    * trailing comma; callers append their own CTEs/select. */
  private def byteBpeCountCtes(side: String): String = {
    val pat = graft.functions.Bpe.PretokenRegex.replace("'", "''")
    s"""WITH docs AS (SELECT doc_id, source, text FROM documents),
      |raw AS (
      |  SELECT doc_id, regexp_extract_all(text, '$pat') AS rt
      |  FROM docs WHERE text IS NOT NULL),
      |fixed AS (SELECT doc_id,
      |  list_filter(
      |    flatten(list_transform(range(1, len(rt)+1), i ->
      |      CASE
      |        WHEN regexp_matches(rt[i], '^\\s+$$') AND i < len(rt)
      |          THEN CASE WHEN substring(rt[i], length(rt[i]), 1) = ' '
      |            THEN [substring(rt[i], 1, length(rt[i])-1)]
      |            ELSE [substring(rt[i], 1, length(rt[i])-1),
      |                  substring(rt[i], length(rt[i]), 1)] END
      |        WHEN i > 1 AND regexp_matches(rt[i-1], '^\\s+$$')
      |             AND substring(rt[i-1], length(rt[i-1]), 1) = ' '
      |          THEN [' ' || rt[i]]
      |        ELSE [rt[i]] END)),
      |    x -> x <> '') AS pt
      |  FROM raw),
      |words AS (SELECT DISTINCT unnest(pt) AS w FROM fixed),
      |ml AS (SELECT list(a || chr(1) || b ORDER BY rank) AS mlist
      |  FROM read_parquet('${oracleSidePath(side)}')),
      |init AS (
      |  SELECT w, list_transform(range(1, octet_length(encode(w)) + 1),
      |    i -> substring(hex(encode(w)), 2*i-1, 2)) AS toks
      |  FROM words),
      |brec AS (
      |  WITH RECURSIVE r1(w, toks, it) AS (
      |    SELECT w, toks, 0 FROM init
      |    UNION ALL
      |    SELECT w,
      |      toks[1:att-1] || [toks[att] || toks[att+1]] || toks[att+2:],
      |      it + 1
      |    FROM (
      |      SELECT w, toks, it, list_position(rs, list_min(rs)) AS att,
      |        list_min(rs) AS minr
      |      FROM (
      |        SELECT w, toks, it,
      |          list_transform(range(1, len(toks)),
      |            i -> coalesce(nullif(list_position(mlist, toks[i] || chr(1) || toks[i+1]), 0), 1000000)) AS rs
      |        FROM r1, ml
      |        WHERE len(toks) >= 2))
      |    WHERE minr < 1000000)
      |  SELECT * FROM r1),
      |fin AS (
      |  SELECT w, toks FROM (
      |    SELECT w, toks, it, max(it) OVER (PARTITION BY w) AS mx FROM brec)
      |  WHERE it = mx),
      |counts AS (SELECT w, len(toks) AS k FROM fin),
      |ex AS (SELECT doc_id, unnest(pt) AS w FROM fixed),
      |agg AS (SELECT ex.doc_id, SUM(c.k) AS nb
      |  FROM ex JOIN counts c USING (w) GROUP BY ex.doc_id)""".stripMargin
  }

  /** The exact bitext-mining replay — shared by q_bitext_mine and
    * q_bitext_indexed (the indexed gate is exact at full probe, so the
    * same SQL gates both): every A×B cosine, both k-NN means
    * (decimal-exact addends, double division), both NN1 candidate
    * directions, and the rounded ratio margin. */
  // lazy: referenced by the oracleSql map, which is declared earlier in
  // the object body — a strict val would still be null at map init
  /** The chunk→hashing-TF→mean-pool replay — shared by q_chunk_pool and
    * q_doc_embed (the encoder-seam form of the same composition). */
  private lazy val ChunkPoolOracleSql: String =
    s"""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(${DedupOracle.normExpr}, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |k AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    CASE WHEN len(toks) <= 32 THEN 1
        |         ELSE 1 + (len(toks) - 32 + 23) // 24 END AS nchunks
        |  FROM t WHERE len(toks) >= 1),
        |ch AS (
        |  SELECT doc_id,
        |    toks[(g.i * 24 + 1):(g.i * 24 + least(32, n - g.i * 24))] AS ctoks
        |  FROM k, unnest(generate_series(0, nchunks - 1)) AS g(i)),
        |vec AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 32), b -> CAST(len(list_filter(ctoks,
        |      t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % 32 = b)) AS DOUBLE)) AS v
        |  FROM ch),
        |ex AS (
        |  SELECT doc_id, s.i AS p, v[s.i] AS x
        |  FROM vec,
        |       UNNEST(list_transform(generate_series(1, len(v)), y -> y)) AS s(i)),
        |m AS (
        |  SELECT doc_id, p,
        |    CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS mx
        |  FROM ex GROUP BY doc_id, p)
        |SELECT doc_id, p - 1 AS dim, CAST(mx AS REAL) AS value
        |FROM m
        |ORDER BY doc_id, dim""".stripMargin

  /** Self k-NN scored+ranked CTE chain (every row a query, self
    * excluded, ties by neighbor id) — shared by the graph gates and
    * the family walk so all three pin the same rank derivation. */
  private lazy val KnnScoredCtes: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |scored AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(q.v, e.v) AS score
      |  FROM e q JOIN e ON e.vec_id <> q.vec_id),
      |ranked AS (SELECT query_id, neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
      |  FROM scored)""".stripMargin

  private lazy val KnnGraphOracleSql: String =
    s"""$KnnScoredCtes
      |SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  private lazy val BitextMineOracleSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |a AS (SELECT vec_id AS a_id, v AS av FROM e WHERE vec_id % 2 = 0),
        |b AS (SELECT vec_id AS b_id, v AS bv FROM e WHERE vec_id % 2 = 1),
        |scored AS (SELECT a_id, b_id,
        |    list_cosine_similarity(av, bv) AS score
        |  FROM a CROSS JOIN b),
        |fa AS (SELECT a_id,
        |    CAST(SUM(CAST(score AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS avg_a
        |  FROM (SELECT a_id, score,
        |      ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY score DESC, b_id) AS r
        |    FROM scored) WHERE r <= 4 GROUP BY a_id),
        |fb AS (SELECT b_id,
        |    CAST(SUM(CAST(score AS DECIMAL(18,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS avg_b
        |  FROM (SELECT b_id, score,
        |      ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY score DESC, a_id) AS r
        |    FROM scored) WHERE r <= 4 GROUP BY b_id),
        |cand AS (SELECT a_id, b_id, score FROM (
        |    SELECT a_id, b_id, score,
        |      ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY score DESC, b_id) AS rf,
        |      ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY score DESC, a_id) AS rb
        |    FROM scored) WHERE rf = 1 OR rb = 1),
        |m AS (SELECT c.a_id, c.b_id,
        |    floor(c.score * 1e4 + 0.5) / 1e4 AS score,
        |    floor(c.score / ((fa.avg_a + fb.avg_b) / 2) * 1e4 + 0.5) / 1e4 AS margin
        |  FROM cand c JOIN fa USING (a_id) JOIN fb USING (b_id))
        |SELECT a_id, b_id, score, margin FROM m
        |WHERE margin >= 1.02
        |ORDER BY a_id, b_id""".stripMargin

  /** The Cavnar–Trenkle classification replayed step-for-step in DuckDB,
    * generated from [[graft.functions.LangNgram.Profiles]] itself: the
    * identical space-padded 1..NMax-gram explosion, per-doc top-TopK
    * ranking under the portable (count desc, gram asc) tie rule (both
    * engines compare strings as unsigned UTF-8 bytes), the embedded
    * profile VALUES table, the out-of-place distance with max
    * displacement TopK for unseen grams, and the min-distance /
    * profile-order argmin. */
  private def LangIdOracleSql: String = {
    import graft.functions.LangNgram
    val k = LangNgram.TopK
    val ns = (1 to LangNgram.NMax).mkString(", ")
    val profVals = LangNgram.Profiles.flatMap { case (l, gs) =>
      gs.map { case (g, r) => s"('$l', '${g.replace("'", "''")}', $r)" }
    }.mkString(",\n      ")
    val langVals = LangNgram.Langs.zipWithIndex
      .map { case (l, i) => s"('$l', $i)" }.mkString(", ")
    s"""WITH base AS (
      |  SELECT doc_id, lower(text) AS t FROM documents WHERE text IS NOT NULL),
      |words AS (
      |  SELECT doc_id, w
      |  FROM base, UNNEST(list_filter(string_split(t, ' '), x -> x <> '')) AS u(w)),
      |grams AS (
      |  -- padded word ' '||w||' ' has length(w)+2 chars -> length(w)+3-n grams of size n
      |  SELECT doc_id, substring(' ' || w || ' ', i, n) AS g
      |  FROM words,
      |       UNNEST([$ns]) AS s(n),
      |       UNNEST(list_transform(generate_series(1, length(w) + 3 - n), x -> x)) AS s2(i)),
      |counts AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
      |ranked AS (
      |  SELECT doc_id, g,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rdoc
      |  FROM counts QUALIFY rdoc <= $k),
      |prof(lang, g, r) AS (VALUES
      |      $profVals),
      |langs(lang, ix) AS (VALUES $langVals),
      |dist AS (
      |  SELECT ranked.doc_id, langs.lang, langs.ix,
      |    SUM(COALESCE(ABS(ranked.rdoc - prof.r), $k)) AS d
      |  FROM ranked CROSS JOIN langs
      |  LEFT JOIN prof ON prof.lang = langs.lang AND prof.g = ranked.g
      |  GROUP BY 1, 2, 3),
      |pick AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY d ASC, ix ASC) AS rn
      |  FROM dist)
      |SELECT base.doc_id, COALESCE(pick.lang, 'und') AS lang_pred
      |FROM base LEFT JOIN pick ON pick.doc_id = base.doc_id AND pick.rn = 1
      |ORDER BY base.doc_id""".stripMargin
  }

  private def CrawlPipelineOracleSql: String =
    """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE text IS NOT NULL AND (doc_id % 6) IN (0, 2, 4, 5)),
        |d AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id ||
        |    '</title><style type="text/css">body { margin: 0 }</style>' ||
        |    '<script>var a = "<p>hidden</p>";</script></head>' ||
        |    '<body><!-- nav' || chr(10) || 'block --><h1>Heading ' || doc_id ||
        |    '</h1><p>' || text || ' cafe' || chr(769) || ' ' || chr(8203) ||
        |    'zero' || chr(8205) || 'width ' || chr(7) || 'bell' ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' A' || chr(778) ELSE ' ' || chr(197) END ||
        |    chr(13) || chr(10) || 'short tail' ||
        |    '</p><div>5 &lt; 6 &amp; it&#39;s&nbsp;"ok&quot;</div>' ||
        |    '</body></html>' AS page
        |  FROM base),
        |s1 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(page,
        |    '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g') AS t FROM d),
        |s2 AS (SELECT doc_id, regexp_replace(t,
        |    '(?i)<(?:br\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote)\s*>',
        |    chr(10), 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(t,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        |      '&nbsp;', ' '), '&amp;', '&') AS t
        |  FROM s3),
        |x AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[ \t]*\n[ \t]*', chr(10), 'g'),
        |      '[ \t]+', ' ', 'g'),
        |      '^[ \n]+|[ \n]+$', '', 'g') AS t
        |  FROM s4),
        |u AS (SELECT doc_id,
        |    regexp_replace(
        |      replace(replace(nfc_normalize(t), chr(13)||chr(10), chr(10)),
        |              chr(13), chr(10)),
        |      '[\x{00}-\x{08}\x{0B}-\x{1F}\x{7F}-\x{9F}\x{AD}\x{200B}-\x{200D}\x{FEFF}]',
        |      '', 'g') AS t
        |  FROM x),
        |b AS (SELECT doc_id,
        |    array_to_string(list_filter(string_split(t, chr(10)),
        |      l -> len(list_filter(string_split(l, ' '), w -> w <> '')) >= 4
        |        AND CAST(length(regexp_replace(l, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |            >= 0.6 * CAST(length(l) AS DOUBLE)), chr(10)) AS clean
        |  FROM u)
        |SELECT doc_id, clean FROM b
        |WHERE length(clean) >= 100
        |ORDER BY doc_id""".stripMargin

  private object NoiseqOracle {
    private val dataCols = Seq("a_0", "a_1", "a_2", "r_0", "r_1", "r_2")
    private val ref = "a_0"
    private val noisePairs = Seq(
      ("a_0", "a_1"), ("a_0", "a_2"), ("a_1", "a_2"),
      ("r_0", "r_1"), ("r_0", "r_2"), ("r_1", "r_2"))

    def sql: String = {
      val rmCols = dataCols.map { c =>
        val rf = c.head.toUpper
        val rep = c.last
        s"CAST(SUM(CASE WHEN l_returnflag='$rf' AND l_linenumber % 3 = $rep " +
          s"THEN 1 ELSE 0 END) AS DOUBLE) AS $c"
      }.mkString(",\n    ")
      val zCols = dataCols.map(c =>
        s"CASE WHEN $c = 0 THEN 0.5 ELSE $c END AS $c").mkString(",\n    ")
      val libCols = dataCols.map(c => s"SUM($c) AS l_$c").mkString(", ")
      val meanLib = dataCols.map(c => s"SUM($c)").mkString("(", " + ", s") / ${dataCols.size}.0 AS meanlib")
      // per-pair M/A/w long frame (obs column vs the fixed reference);
      // all zeroed counts are >= 0.5, so no NaN/Inf filter is needed
      // qv/pv mirror Tmm2.pairFactor's exact-rank keys: pure IEEE
      // division/multiplication of exact-integer-valued sums, so the tie
      // structure (and therefore the trimmed set) is bit-identical across
      // engines — ranking on log2 values is not (1-ulp tie splits)
      val longArms = dataCols.filterNot(_ == ref).map { c =>
        s"""  SELECT '$c' AS pid,
           |    (z.$c / lib.l_$c) / (z.$ref / lib.l_$ref) AS qv,
           |    (z.$c / lib.l_$c) * (z.$ref / lib.l_$ref) AS pv,
           |    log2((z.$c / lib.l_$c) / (z.$ref / lib.l_$ref)) AS m,
           |    (lib.l_$c - z.$c)/lib.l_$c/z.$c + (lib.l_$ref - z.$ref)/lib.l_$ref/z.$ref AS w
           |  FROM z, lib""".stripMargin
      }.mkString("\n  UNION ALL\n")
      val fPiv = dataCols.map(c =>
        s"MAX(CASE WHEN pid = '$c' THEN f END) AS f_$c").mkString(",\n    ")
      val scaleCols = dataCols.map(c =>
        s"lib.meanlib / (lib.l_$c * fpiv.f_$c / gmf.gm) AS s_$c").mkString(",\n    ")
      val normCols = dataCols.map(c => s"z.$c * sc.s_$c AS $c").mkString(",\n    ")
      val meanA = "((a_0 + a_1 + a_2) / 3)"
      val meanB = "((r_0 + r_1 + r_2) / 3)"
      val noiseArms = noisePairs.map { case (x, y) =>
        s"  SELECT abs(log2($x / $y)) AS nm, abs($x - $y) AS nd FROM normed"
      }.mkString("\n  UNION ALL\n")
      def r4(e: String) = s"floor(($e) * 10000 + 0.5) / 10000"
      s"""WITH rm0 AS (
        |  SELECT l_partkey,
        |    $rmCols
        |  FROM lineitem GROUP BY l_partkey),
        |z AS (SELECT l_partkey,
        |    $zCols
        |  FROM rm0),
        |lib AS (SELECT $libCols, $meanLib FROM z),
        |long AS (
        |$longArms),
        |ranked AS (
        |  SELECT *, count(*) OVER (PARTITION BY pid) AS n,
        |    rank() OVER (PARTITION BY pid ORDER BY qv)
        |      + (count(*) OVER (PARTITION BY pid, qv) - 1) / 2.0 AS rnk_m,
        |    rank() OVER (PARTITION BY pid ORDER BY pv)
        |      + (count(*) OVER (PARTITION BY pid, pv) - 1) / 2.0 AS rnk_a
        |  FROM long),
        |fstat AS (
        |  SELECT pid, SUM(m / w) / SUM(1.0 / w) AS fw
        |  FROM ranked
        |  WHERE rnk_m >= floor(n * 0.3) + 1 AND rnk_m <= n + 1 - (floor(n * 0.3) + 1)
        |    AND rnk_a >= floor(n * 0.05) + 1 AND rnk_a <= n + 1 - (floor(n * 0.05) + 1)
        |  GROUP BY pid),
        |allf AS (
        |  SELECT pid, power(2.0, fw) AS f FROM fstat
        |  UNION ALL SELECT '$ref', 1.0),
        |gmf AS (SELECT exp(AVG(ln(f))) AS gm FROM allf),
        |fpiv AS (SELECT
        |    $fPiv
        |  FROM allf),
        |sc AS (SELECT
        |    $scaleCols
        |  FROM lib, fpiv, gmf),
        |normed AS (SELECT l_partkey,
        |    $normCols
        |  FROM z, sc),
        |md AS (SELECT l_partkey,
        |    log2($meanA / $meanB) AS m,
        |    abs($meanA - $meanB) AS d
        |  FROM normed),
        |noise AS (
        |$noiseArms),
        |prob AS (
        |  SELECT g.l_partkey,
        |    CAST(SUM(CASE WHEN n.nm < abs(g.m) AND n.nd < g.d THEN 1 ELSE 0 END) AS DOUBLE)
        |      / (SELECT COUNT(*) FROM noise) AS p
        |  FROM md g CROSS JOIN noise n GROUP BY g.l_partkey)
        |SELECT md.l_partkey,
        |  ${r4("md.m")} AS "logFC (A_vs_R)",
        |  ${r4("md.d")} AS "D (A_vs_R)",
        |  ${r4("prob.p")} AS "Prob (A_vs_R)",
        |  ${r4("sign(md.m) * sqrt(md.m * md.m + md.d * md.d)")} AS "Rank (A_vs_R)"
        |FROM md JOIN prob USING (l_partkey)
        |ORDER BY l_partkey""".stripMargin
    }
  }

  /** Full NOISeqBIO re-derivation in DuckDB ([[graft.stats.NOISeq]]'s
    * biological-replicates branch, q_noiseq_bio): rpkm normalization
    * with the lc=1 length factor, delta-method SE²s, decimal-exact
    * bucket-pooled variances, a0 offsets, θ and the 8 shared balanced
    * relabelings, histogram densities, central-matching p0 and the
    * empirical-Bayes local-fdr. Every IEEE operation is mirrored in the
    * engine's evaluation order; driver-collected constants (cuts, a0,
    * lo/hi/w, histograms, p0) become CTEs computing the identical
    * values. Perm enumeration comes from the SAME
    * [[graft.stats.NOISeq.balancedRelabelings]] call the engine makes,
    * including the hash-order cap at r=8. */
  private object NoiseqBioOracle {
    private val colsA = Seq("a_0", "a_1", "a_2")
    private val colsB = Seq("r_0", "r_1", "r_2")
    private val dataCols = colsA ++ colsB
    private val nclust = 15
    private val bins = 64
    private val perms = graft.stats.NOISeq.balancedRelabelings(colsA, colsB, 8)
    private val ln2sq = (math.log(2.0) * math.log(2.0)).toString

    private def meanSql(cs: Seq[String]): String =
      cs.mkString("(", " + ", s") / ${cs.size}")
    private def varSql(cs: Seq[String], m: String): String =
      cs.map(c => s"($c - $m) * ($c - $m)")
        .mkString("(", " + ", s") / ${cs.size - 1}")
    private def varMSql(v1: String, m1: String, v2: String, m2: String): String =
      s"($v1 / (3.0 * $m1 * $m1) + $v2 / (3.0 * $m2 * $m2)) / $ln2sq"
    private def varDSql(v1: String, v2: String): String = s"$v1 / 3.0 + $v2 / 3.0"
    private def davgSql(c: String): String =
      s"CAST(SUM(CAST($c AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)"
    private def r4(e: String) = s"floor(($e) * 10000 + 0.5) / 10000"

    def sql: String = {
      val rmCols = dataCols.map { c =>
        val rf = c.head.toUpper
        val rep = c.last
        s"CAST(SUM(CASE WHEN l_returnflag='$rf' AND l_linenumber % 3 = $rep " +
          s"THEN 1 ELSE 0 END) AS DOUBLE) AS $c"
      }.mkString(",\n    ")
      val zCols = dataCols.map(c =>
        s"CASE WHEN $c = 0 THEN 0.5 ELSE $c END AS $c").mkString(",\n    ")
      val libCols = dataCols.map(c => s"SUM($c) AS l_$c").mkString(", ")
      val meanLib = dataCols.map(c => s"SUM($c)")
        .mkString("(", " + ", s") / ${dataCols.size} AS meanlib")
      // rpkm: column scale meanlib/l_c, then the lc=1 length factor
      val normCols = dataCols.map(c =>
        s"z.$c * (lib.meanlib / lib.l_$c) / power(lens.len / 1000.0, 1.0) AS $c")
        .mkString(",\n    ")
      val permMeans = perms.zipWithIndex.flatMap { case ((pa, pb), i) =>
        Seq(s"${meanSql(pa)} AS pm1_$i", s"${meanSql(pb)} AS pm2_$i")
      }.mkString(",\n    ")
      val permVars = perms.zipWithIndex.flatMap { case ((pa, pb), i) =>
        Seq(s"${varSql(pa, s"pm1_$i")} AS pv1_$i", s"${varSql(pb, s"pm2_$i")} AS pv2_$i")
      }.mkString(",\n    ")
      val permStats = perms.indices.flatMap { i =>
        Seq(s"log2(pm1_$i / pm2_$i) AS m_$i", s"pm1_$i - pm2_$i AS dsig_$i",
          s"${varMSql(s"pv1_$i", s"pm1_$i", s"pv2_$i", s"pm2_$i")} AS vm_$i",
          s"${varDSql(s"pv1_$i", s"pv2_$i")} AS vd_$i")
      }.mkString(",\n    ")
      val cutPs = (1 until nclust).map(_.toDouble / nclust)
      val cutCols = cutPs.zipWithIndex
        .map { case (p, i) => s"quantile_cont(lt, $p) AS c$i" }.mkString(",\n    ")
      val bkExpr = cutPs.indices
        .map(i => s"CASE WHEN lt > cuts.c$i THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      val poolCols = (Seq(s"${davgSql("vm")} AS pvm", s"${davgSql("vd")} AS pvd") ++
        perms.indices.flatMap(i => Seq(s"${davgSql(s"vm_$i")} AS pvm_$i",
          s"${davgSql(s"vd_$i")} AS pvd_$i"))).mkString(",\n    ")
      val a0Cols = (Seq("quantile_cont(sqrt(pvm), 0.9) AS am",
        "quantile_cont(sqrt(pvd), 0.9) AS ad") ++
        perms.indices.flatMap(i => Seq(
          s"quantile_cont(sqrt(pvm_$i), 0.9) AS am_$i",
          s"quantile_cont(sqrt(pvd_$i), 0.9) AS ad_$i"))).mkString(",\n    ")
      def thetaSql(m: String, d: String, pvm: String, pvd: String,
          am: String, ad: String): String =
        s"($m / greatest(a0.$am + sqrt($pvm), 1e-300) + " +
          s"$d / greatest(a0.$ad + sqrt($pvd), 1e-300)) / 2"
      val thetaCols = (Seq(thetaSql("m", "dsig", "pvm", "pvd", "am", "ad") + " AS t") ++
        perms.indices.map(i => thetaSql(s"m_$i", s"dsig_$i", s"pvm_$i", s"pvd_$i",
          s"am_$i", s"ad_$i") + s" AS t_$i")).mkString(",\n    ")
      val allT = "t" +: perms.indices.map(i => s"t_$i")
      val nullArms = perms.indices
        .map(i => s"  SELECT t_$i AS t0 FROM thetas").mkString("\n  UNION ALL\n")
      s"""WITH rm0 AS (
        |  SELECT l_partkey,
        |    $rmCols
        |  FROM lineitem GROUP BY l_partkey),
        |z AS (SELECT l_partkey,
        |    $zCols
        |  FROM rm0),
        |lib AS (SELECT $libCols, $meanLib FROM z),
        |lens AS (SELECT p_partkey AS l_partkey,
        |    (CAST(p_partkey % 97 AS DOUBLE) + 3.0) * 50.0 AS len FROM part),
        |normed AS (SELECT z.l_partkey,
        |    $normCols
        |  FROM z JOIN lens ON lens.l_partkey = z.l_partkey, lib),
        |means AS (SELECT *,
        |    ln(${dataCols.mkString(" + ")}) AS lt,
        |    ${meanSql(colsA)} AS m1, ${meanSql(colsB)} AS m2,
        |    $permMeans
        |  FROM normed),
        |vars AS (SELECT *,
        |    ${varSql(colsA, "m1")} AS v1, ${varSql(colsB, "m2")} AS v2,
        |    $permVars
        |  FROM means),
        |st AS (SELECT l_partkey, lt,
        |    log2(m1 / m2) AS m, m1 - m2 AS dsig,
        |    ${varMSql("v1", "m1", "v2", "m2")} AS vm,
        |    ${varDSql("v1", "v2")} AS vd,
        |    $permStats
        |  FROM vars),
        |cuts AS (SELECT
        |    $cutCols
        |  FROM st),
        |bucketed AS (SELECT st.*, $bkExpr AS bk FROM st, cuts),
        |pools AS (SELECT bk,
        |    $poolCols
        |  FROM bucketed GROUP BY bk),
        |joined AS (SELECT b.*, ${(Seq("pvm", "pvd") ++ perms.indices.flatMap(i =>
             Seq(s"pvm_$i", s"pvd_$i"))).map(c => s"p.$c").mkString(", ")}
        |  FROM bucketed b JOIN pools p USING (bk)),
        |a0 AS (SELECT
        |    $a0Cols
        |  FROM joined),
        |thetas AS (SELECT l_partkey, m, dsig,
        |    $thetaCols
        |  FROM joined, a0),
        |lohi AS (SELECT min(least(${allT.mkString(", ")})) AS lo,
        |    max(greatest(${allT.mkString(", ")})) AS hi,
        |    COUNT(*) AS n FROM thetas),
        |binc AS (SELECT lo, greatest((hi - lo) / $bins, 1e-300) AS w, n FROM lohi),
        |nulls AS (
        |$nullArms),
        |tb AS (SELECT th.*, CAST(least(${bins - 1}, floor((th.t - binc.lo) / binc.w)) AS INT) AS b
        |  FROM thetas th, binc),
        |oh AS (SELECT b, COUNT(*) AS cnt FROM tb GROUP BY b),
        |nh AS (SELECT CAST(least(${bins - 1}, floor((t0 - binc.lo) / binc.w)) AS INT) AS b,
        |    COUNT(*) AS cnt
        |  FROM nulls, binc GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS nn FROM nulls),
        |medabs AS (SELECT quantile_cont(abs(t0), 0.5) AS ma FROM nulls),
        |p0 AS (SELECT least(1.0,
        |    2.0 * (SELECT COUNT(*) FROM thetas, medabs WHERE abs(t) <= ma)
        |      / (SELECT n FROM lohi)) AS p)
        |SELECT tb.l_partkey,
        |  ${r4("tb.m")} AS "logFC (A_vs_R_bio)",
        |  ${r4("abs(tb.dsig)")} AS "D (A_vs_R_bio)",
        |  ${r4(s"1.0 - least(1.0, p0.p * ((COALESCE(nh.cnt, 0) + 1.0) / (nn.nn + $bins)) " +
             s"/ ((oh.cnt + 1.0) / (binc.n + $bins)))")} AS "Prob (A_vs_R_bio)",
        |  ${r4("sign(tb.m) * sqrt(tb.m * tb.m + tb.dsig * tb.dsig)")} AS "Rank (A_vs_R_bio)"
        |FROM tb
        |JOIN oh USING (b)
        |LEFT JOIN nh USING (b), p0, nn, binc
        |ORDER BY tb.l_partkey""".stripMargin
    }
  }

  /** DuckDB replay of the closed-form tail of the DESeq2 Wald pipeline
    * ([[graft.stats.DESeq2Unpaired]], A-vs-R replicates), given the
    * per-gene iterative-fit results (final dispersion `alpha`, fitted
    * log2 intercept `beta0` and contrast `beta1`) from the side table
    * the query emits. Re-derived from scratch: size factors
    * (median-of-log-ratios over genes with all counts positive —
    * quantile_cont == Spark's exact percentile), baseMean
    * (mean of y/sf in sample order), per-sample mu =
    * max(sf·2^(β₀+β₁·x), 0.5) (x = A-indicator), IRLS weights
    * μ/(1+αμ)·ln²2, the ridged (+1e-6) 2×2 observed-information matrix,
    * its closed-form inverse ⇒ lfcSE = sqrt(inv₁₁), stat = β₁/SE
    * (NbGlm.fit's SE tail, NbGlm.scala:115-132). */
  private object DeseqWaldOracle {
    private val cols = Seq("a_0", "a_1", "a_2", "r_0", "r_1", "r_2")
    def sql(sidePath: String): String = {
      val rmCols = cols.map { c =>
        val rf = c.head.toUpper
        val rep = c.last
        s"CAST(SUM(CASE WHEN l_returnflag='$rf' AND l_linenumber % 3 = $rep " +
          s"THEN 1 ELSE 0 END) AS DOUBLE) AS $c"
      }.mkString(",\n    ")
      val gm = cols.map(c => s"ln($c)").mkString("(", " + ", s") / ${cols.size}.0")
      val allPos = cols.map(c => s"$c > 0").mkString(" AND ")
      val sfCols = cols.map(c =>
        s"exp(quantile_cont(ln($c) - gm, 0.5)) AS sf_$c").mkString(",\n    ")
      val baseMean = cols.map(c => s"m.$c / sf.sf_$c")
        .mkString("(", " + ", s") / ${cols.size}.0")
      val muCols = cols.map { c =>
        val eta = if (c.head == 'a') "s.beta0 + s.beta1" else "s.beta0"
        s"greatest(sf.sf_$c * power(2.0, $eta), 0.5) AS mu_$c"
      }.mkString(",\n    ")
      val wCols = cols.map(c =>
        s"mu_$c / (1.0 + alpha * mu_$c) * ln(2.0) * ln(2.0) AS w_$c")
        .mkString(",\n    ")
      val wAll = cols.map(c => s"w_$c").mkString(" + ")
      val wA = cols.filter(_.head == 'a').map(c => s"w_$c").mkString(" + ")
      def r4(e: String) = s"floor(($e) * 10000 + 0.5) / 10000"
      def r6(e: String) = s"floor(($e) * 1e6 + 0.5) / 1e6"
      s"""WITH m AS (
        |  SELECT l_partkey,
        |    $rmCols
        |  FROM lineitem GROUP BY l_partkey),
        |pos AS (SELECT *, $gm AS gm FROM m WHERE $allPos),
        |sf AS (SELECT
        |    $sfCols
        |  FROM pos),
        |side AS (SELECT * FROM read_parquet('$sidePath')),
        |mu AS (
        |  SELECT m.l_partkey, $baseMean AS basemean, s.alpha, s.beta1, s.p,
        |    $muCols
        |  FROM m JOIN side s USING (l_partkey), sf),
        |w AS (
        |  SELECT l_partkey, basemean, beta1, p,
        |    $wCols
        |  FROM mu),
        |info AS (
        |  SELECT l_partkey, basemean, beta1, p,
        |    ($wAll) + 1e-6 AS a00,
        |    ($wA) AS a01,
        |    ($wA) + 1e-6 AS a11
        |  FROM w),
        |fin AS (
        |  SELECT l_partkey, basemean, beta1, p,
        |    sqrt(a00 / (a00 * a11 - a01 * a01)) AS se
        |  FROM info),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p) AS rk,
        |    COUNT(*) OVER () AS n FROM fin)
        |SELECT l_partkey,
        |  ${r4("basemean")} AS "baseMean (A_vs_R)",
        |  ${r4("beta1")} AS "log2FC (A_vs_R)",
        |  ${r4("se")} AS "lfcSE (A_vs_R)",
        |  ${r4("beta1 / se")} AS "stat (A_vs_R)",
        |  ${r6("p")} AS "p (A_vs_R)",
        |  ${r6("LEAST(MIN(p*n/rk) OVER (ORDER BY p DESC), 1.0)")} AS "FDR (A_vs_R)"
        |FROM r
        |ORDER BY l_partkey""".stripMargin
    }
  }

  /** DuckDB replay of the closed-form tail of the DESeq2 LRT pipeline
    * ([[graft.stats.DESeq2LRT]], 9-sample condition design), given the
    * per-gene side table (final dispersion `alpha`, full-design
    * coefficients `bf0..bf2` = intercept + N + R treatment dummies,
    * reduced intercept `br0`). Re-derived: size factors + baseMean over
    * all nine samples, per-sample full/reduced mu = max(sf·2^η, 0.5),
    * BOTH NB log-likelihoods term-for-term (lgamma sums, exactly
    * NbGlm.nbLogLik's form, including the terms that cancel in the
    * difference — so IEEE behavior tracks the Scala kernel),
    * stat = max(2(llF−llR), 0), and the SE of the reported (last)
    * coefficient from the closed-form inverse of the ridged 3×3
    * observed information. */
  private object LrtOracle {
    private val groups = Seq(
      ("a", "s.bf0"), ("n", "s.bf0 + s.bf1"), ("r", "s.bf0 + s.bf2"))
    private val cols = for ((g, _) <- groups; i <- 0 to 2) yield s"${g}_$i"
    def sql(sidePath: String): String = {
      val rmCols = cols.map { c =>
        val rf = c.head.toUpper
        val rep = c.last
        s"CAST(SUM(CASE WHEN l_returnflag='$rf' AND l_linenumber % 3 = $rep " +
          s"THEN 1 ELSE 0 END) AS DOUBLE) AS $c"
      }.mkString(",\n    ")
      val gm = cols.map(c => s"ln($c)").mkString("(", " + ", s") / ${cols.size}.0")
      val allPos = cols.map(c => s"$c > 0").mkString(" AND ")
      val sfCols = cols.map(c =>
        s"exp(quantile_cont(ln($c) - gm, 0.5)) AS sf_$c").mkString(",\n    ")
      val baseMean = cols.map(c => s"m.$c / sf.sf_$c")
        .mkString("(", " + ", s") / ${cols.size}.0")
      val muCols = groups.flatMap { case (g, eta) =>
        (0 to 2).map { i =>
          s"greatest(sf.sf_${g}_$i * power(2.0, $eta), 0.5) AS muf_${g}_$i, " +
            s"greatest(sf.sf_${g}_$i * power(2.0, s.br0), 0.5) AS mur_${g}_$i"
        }
      }.mkString(",\n    ")
      // NB log-likelihood contribution of one sample at mu `m`
      def ll(y: String, m: String) =
        s"lgamma($y + 1.0/alpha) - lgamma(1.0/alpha) - lgamma($y + 1.0)" +
          s" + $y * ln($m * alpha / (1.0 + $m * alpha))" +
          s" - (1.0/alpha) * ln(1.0 + $m * alpha)"
      val llF = cols.map(c => s"(${ll(s"y_$c", s"muf_$c")})").mkString(" + ")
      val llR = cols.map(c => s"(${ll(s"y_$c", s"mur_$c")})").mkString(" + ")
      val wCols = cols.map(c =>
        s"muf_$c / (1.0 + alpha * muf_$c) * ln(2.0) * ln(2.0) AS w_$c")
        .mkString(",\n    ")
      def wg(g: Char) = cols.filter(_.head == g).map(c => s"w_$c").mkString(" + ")
      def r4(e: String) = s"floor(($e) * 10000 + 0.5) / 10000"
      def r6(e: String) = s"floor(($e) * 1e6 + 0.5) / 1e6"
      s"""WITH m AS (
        |  SELECT l_partkey,
        |    $rmCols
        |  FROM lineitem GROUP BY l_partkey),
        |pos AS (SELECT *, $gm AS gm FROM m WHERE $allPos),
        |sf AS (SELECT
        |    $sfCols
        |  FROM pos),
        |side AS (SELECT * FROM read_parquet('$sidePath')),
        |mu AS (
        |  SELECT m.l_partkey, $baseMean AS basemean, s.alpha, s.bf2, s.p,
        |    ${cols.map(c => s"m.$c AS y_$c").mkString(", ")},
        |    $muCols
        |  FROM m JOIN side s USING (l_partkey), sf),
        |lik AS (
        |  SELECT *, ($llF) AS llf, ($llR) AS llr,
        |    $wCols
        |  FROM mu),
        |info AS (
        |  SELECT l_partkey, basemean, bf2, p,
        |    greatest(2.0 * (llf - llr), 0.0) AS stat,
        |    (${wg('a')}) + (${wg('n')}) + (${wg('r')}) + 1e-6 AS a00,
        |    (${wg('n')}) AS a01, (${wg('r')}) AS a02,
        |    (${wg('n')}) + 1e-6 AS a11, (${wg('r')}) + 1e-6 AS a22
        |  FROM lik),
        |fin AS (
        |  SELECT l_partkey, basemean, bf2, p, stat,
        |    sqrt((a00 * a11 - a01 * a01)
        |      / (a00 * a11 * a22 - a01 * a01 * a22 - a02 * a02 * a11)) AS se
        |  FROM info),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p) AS rk,
        |    COUNT(*) OVER () AS n FROM fin)
        |SELECT l_partkey,
        |  ${r4("basemean")} AS "baseMean (cond_lrt)",
        |  ${r4("bf2")} AS "log2FC (cond_lrt)",
        |  ${r4("se")} AS "lfcSE (cond_lrt)",
        |  ${r4("stat")} AS "stat (cond_lrt)",
        |  ${r6("p")} AS "p (cond_lrt)",
        |  ${r6("LEAST(MIN(p*n/rk) OVER (ORDER BY p DESC), 1.0)")} AS "FDR (cond_lrt)"
        |FROM r
        |ORDER BY l_partkey""".stripMargin
    }
  }

  /** DuckDB replay of edgeR's exact NB double-tail test
    * ([[graft.stats.EdgeRKernel.exactTestDoubleTail]]) given the
    * per-gene side table (s1, s2 = rounded pseudo-count sums; disp =
    * tagwise dispersion). With n1 = n2 = 3: size = 3/disp,
    * mu1 = mu2 = 3·(s/6) (kept in that exact arithmetic form so branch
    * comparisons agree in IEEE), pBot = dnb(s, 6/disp, s), and the tail
    * sum runs x ∈ [0, s1] (s1 < mu1) or [s1, s] (s1 > mu1), each term
    * exp(dnb(x) + dnb(s−x) − pBot) with
    * dnb(x, sz, mu) = lgamma(x+sz) − lgamma(sz) − lgamma(x+1)
    *                + sz·ln(sz/(sz+mu)) + x·ln(mu/(sz+mu)).
    * p = min(2·Σ, 1), 1.0 at s ≤ 0 or s1 = mu1; BH-FDR via the
    * established reverse-min window (q_bh_fdr). The series is a
    * 0..100000 literal (generate_series cannot be correlated in
    * DuckDB 1.0) pruned by an IEJoin range predicate. */
  private object EdgerOracle {
    def sql(sidePath: String): String = {
      // dnb at the gene's shared size/mu — mu written EXACTLY as Scala
      // forms it: 3.0*((s1+s2)/6.0)
      def dnb(x: String) =
        s"lgamma(($x) + sz) - lgamma(sz) - lgamma(($x) + 1.0) " +
          s"+ sz * ln(sz / (sz + mu1)) + ($x) * ln(mu1 / (sz + mu1))"
      def r6(e: String) = s"floor(($e) * 1e6 + 0.5) / 1e6"
      s"""WITH side AS (SELECT l_partkey, s1, s2, disp FROM read_parquet('$sidePath')),
        |g AS (SELECT l_partkey, s1, s2, disp,
        |    s1 + s2 AS s,
        |    3.0 / disp AS sz,
        |    3.0 * ((s1 + s2) / 6.0) AS mu1
        |  FROM side),
        |pb AS (SELECT *,
        |    CASE WHEN s > 0 THEN
        |      lgamma(s + 6.0/disp) - lgamma(6.0/disp) - lgamma(s + 1.0)
        |      + (6.0/disp) * ln((6.0/disp) / (6.0/disp + s))
        |      + s * ln(s / (6.0/disp + s)) END AS pbot,
        |    CASE WHEN s <= 0 OR s1 = mu1 THEN 1.0
        |         WHEN s1 < mu1 THEN 0.0 ELSE s1 END AS lo,
        |    CASE WHEN s <= 0 OR s1 = mu1 THEN 0.0
        |         WHEN s1 < mu1 THEN s1 ELSE s END AS hi
        |  FROM g),
        |ser AS (SELECT CAST(x AS DOUBLE) AS x
        |  FROM generate_series(0, 100000) t(x)),
        |acc AS (
        |  SELECT pb.l_partkey,
        |    SUM(exp((${dnb("ser.x")}) + (${dnb("pb.s - ser.x")}) - pb.pbot)) AS a
        |  FROM pb JOIN ser ON ser.x >= pb.lo AND ser.x <= pb.hi
        |  GROUP BY pb.l_partkey),
        |praw AS (
        |  SELECT pb.l_partkey,
        |    CASE WHEN pb.s <= 0 OR pb.s1 = pb.mu1 THEN 1.0
        |         ELSE LEAST(2.0 * a.a, 1.0) END AS p
        |  FROM pb LEFT JOIN acc a USING (l_partkey)),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p) AS rk,
        |    COUNT(*) OVER () AS n FROM praw)
        |SELECT l_partkey,
        |  ${r6("p")} AS "p (A_vs_R)",
        |  ${r6("LEAST(MIN(p*n/rk) OVER (ORDER BY p DESC), 1.0)")} AS "FDR (A_vs_R)"
        |FROM r
        |ORDER BY l_partkey""".stripMargin
    }
  }

  private object TmmOracle {
    def sql(countMatrixSql: String): String = {
      val cols = Seq("rf_a", "rf_n", "rf_r")
      val libs = cols.map(c => s"SUM($c) AS l_$c").mkString(", ")
      val quarts = cols.map(c => s"quantile_cont($c, 0.75) AS p_$c").mkString(", ")
      val fr = cols.map(c => s"p_$c / l_$c AS f_$c").mkString(", ")
      val mean3 = cols.map(c => s"p_$c / l_$c").mkString("(", " + ", s") / ${cols.size}.0")
      val ds = cols.map(c => s"abs(f_$c - mean3)")
      val refCase =
        s"""CASE WHEN ${ds(0)} <= ${ds(1)} AND ${ds(0)} <= ${ds(2)} THEN '${cols(0)}'
           |       WHEN ${ds(1)} <= ${ds(2)} THEN '${cols(1)}'
           |       ELSE '${cols(2)}' END""".stripMargin
      def pick(sel: String, f: String => String) =
        s"CASE $sel ${cols.map(c => s"WHEN '$c' THEN ${f(c)}").mkString(" ")} END"
      val values = cols.map(c => s"('$c')").mkString(", ")
      val outCols = cols.map(c =>
        s"round(log2((m.$c + (SELECT pr FROM prior WHERE cname = '$c')) / " +
          s"(SELECT adj FROM prior WHERE cname = '$c') * 1e6), 4) AS $c")
        .mkString(",\n  ")
      s"""WITH m AS ($countMatrixSql),
        |s AS (SELECT $libs, $quarts FROM m),
        |refsel AS (SELECT *, $mean3 AS mean3 FROM (SELECT *, $fr FROM s)),
        |refcol AS (SELECT *, $refCase AS ref FROM refsel),
        |long AS (
        |  SELECT sm.cname,
        |    ${pick("sm.cname", c => s"m.$c")} AS obs,
        |    ${pick("r.ref", c => s"m.$c")} AS refc,
        |    ${pick("sm.cname", c => s"r.l_$c")} AS n_o,
        |    ${pick("r.ref", c => s"r.l_$c")} AS n_r
        |  FROM m, (VALUES $values) sm(cname), refcol r
        |  WHERE sm.cname <> r.ref),
        |mav AS (
        |  SELECT cname, log2((obs / n_o) / (refc / n_r)) AS mval,
        |    log2((obs / n_o) * (refc / n_r)) * 0.5 AS aval,
        |    (n_o - obs) / n_o / obs + (n_r - refc) / n_r / refc AS w
        |  FROM long WHERE obs > 0 AND refc > 0),
        |ranked AS (
        |  SELECT *, count(*) OVER (PARTITION BY cname) AS n,
        |    max(abs(mval)) OVER (PARTITION BY cname) AS maxabs,
        |    rank() OVER (PARTITION BY cname ORDER BY mval)
        |      + (count(*) OVER (PARTITION BY cname, mval) - 1) / 2.0 AS rm,
        |    rank() OVER (PARTITION BY cname ORDER BY aval)
        |      + (count(*) OVER (PARTITION BY cname, aval) - 1) / 2.0 AS ra
        |  FROM mav),
        |fstat AS (
        |  SELECT cname, SUM(mval / w) / SUM(1.0 / w) AS fw, MAX(maxabs) AS maxabs
        |  FROM ranked
        |  WHERE rm >= floor(n * 0.3) + 1 AND rm <= n + 1 - (floor(n * 0.3) + 1)
        |    AND ra >= floor(n * 0.05) + 1 AND ra <= n + 1 - (floor(n * 0.05) + 1)
        |  GROUP BY cname),
        |allf AS (
        |  SELECT cname, CASE WHEN maxabs >= 1e-6 THEN power(2.0, fw) ELSE 1.0 END AS f
        |  FROM fstat
        |  UNION ALL SELECT ref, 1.0 FROM refcol),
        |normf AS (SELECT cname, f / (SELECT exp(AVG(ln(f))) FROM allf) AS f FROM allf),
        |eff AS (
        |  SELECT n0.cname, ${pick("n0.cname", c => s"r.l_$c")} * n0.f AS el
        |  FROM normf n0, refcol r),
        |prior AS (
        |  SELECT cname, 5.0 * el / (SELECT AVG(el) FROM eff) AS pr,
        |    el + 2 * (5.0 * el / (SELECT AVG(el) FROM eff)) AS adj
        |  FROM eff)
        |SELECT l_partkey,
        |  $outCols
        |FROM m
        |ORDER BY l_partkey""".stripMargin
    }
  }

  private object BatchEffectOracle {
    val cols = Seq("rf_a", "rf_n", "rf_r")
    val batches: Map[String, String] =
      Map("rf_a" -> "b1", "rf_n" -> "b2", "rf_r" -> "b1")
    def sql(countMatrixSql: String): String = {
      val p = graft.functions.Normalization.batchProjection(cols, batches)
      val exprs = cols.zipWithIndex.map { case (ci, i) =>
        val terms = cols.zipWithIndex
          .map { case (cj, j) => s"(${p(i)(j)}) * $cj" }.mkString(" + ")
        s"$ci - ($terms) AS $ci"
      }.mkString(",\n  ")
      s"""WITH m AS ($countMatrixSql)
         |SELECT l_partkey,
         |  $exprs
         |FROM m
         |ORDER BY l_partkey""".stripMargin
    }
  }

  /** DuckDB SQL builders recomputing the dedup shingle pipelines from
    * first principles (string shingle sets, not hashes): exact-Jaccard
    * all-pairs — O(n²) is fine at the sf0.01 correctness-gate corpus.
    * Shingle semantics mirror [[graft.functions.TextFunctions]]:
    * normalize = lower + collapse non-alnum + trim; char shingles =
    * distinct k-substrings (whole string when shorter than k); word
    * n-grams = space-joined token windows (whole doc when fewer than n
    * tokens). Jaccard division is (double)|∩| / |∪| in both engines. */
  /** The q_hilbert oracle's unrolled xy2d levels: the SAME bit walk
    * [[graft.operators.ZOrder.hilbertValue]] runs (d-accumulate from the
    * pre-rotation coordinates, reflect-then-swap when ry = 0), one CTE
    * per level — all integer arithmetic, generated from the identical
    * (bits, s, n) constants. */
  private def hilbertOracleCtes(bits: Int): String = {
    val n = 1L << bits
    val levels = ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, j) =>
      val s = 1L << i
      s"""h${j + 1} AS (
         |  SELECT l_partkey, l_suppkey,
         |    hd + ${s * s} * CAST(xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
         |      (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS hd,
         |    CASE WHEN (hy & $s) = 0
         |         THEN (CASE WHEN (hx & $s) > 0 THEN ${n - 1} - hy ELSE hy END)
         |         ELSE hx END AS hx,
         |    CASE WHEN (hy & $s) = 0
         |         THEN (CASE WHEN (hx & $s) > 0 THEN ${n - 1} - hx ELSE hx END)
         |         ELSE hy END AS hy
         |  FROM h$j)""".stripMargin
    }
    s"""h0 AS (SELECT l_partkey, l_suppkey, CAST(l_partkey AS BIGINT) AS hx,
       |  CAST(l_suppkey AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM lineitem),
       |${levels.mkString(",\n")}""".stripMargin
  }

  private object DedupOracle {
    val normExpr = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

    /** CTE chain ending in e(doc_id, n_bigrams, entropy_bits): the full
      * bigram-LM fit + score replay (vocab 256 on the 'en' slice, add-one
      * smoothing, exact-decimal log2 sums, 4-decimal canonicalization) —
      * shared by q_lm_perplexity and q_ccnet_buckets so the bucket gate
      * pins rank/cut logic on top of the SAME score derivation. */
    val lmScoreCtes: String =
      s"""WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split($normExpr, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |uni AS (
        |  SELECT u.token, count(*) AS cnt
        |  FROM toks, unnest(toks.toks) AS u(token)
        |  WHERE lang = 'en'
        |  GROUP BY 1),
        |vocab AS (SELECT token FROM uni ORDER BY cnt DESC, token LIMIT 256),
        |pairs AS (
        |  SELECT t.doc_id, t.lang, t.toks[g.i] AS rw1, t.toks[g.i + 1] AS rw2
        |  FROM toks t, unnest(generate_series(1, len(t.toks) - 1)) AS g(i)),
        |mapped AS (
        |  SELECT p.doc_id, p.lang,
        |    CASE WHEN v1.token IS NULL THEN '<unk>' ELSE p.rw1 END AS w1,
        |    CASE WHEN v2.token IS NULL THEN '<unk>' ELSE p.rw2 END AS w2
        |  FROM pairs p
        |  LEFT JOIN vocab v1 ON p.rw1 = v1.token
        |  LEFT JOIN vocab v2 ON p.rw2 = v2.token),
        |big AS (
        |  SELECT w1, w2, count(*) AS c2 FROM mapped
        |  WHERE lang = 'en' GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(c2) AS c1 FROM big GROUP BY 1),
        |scored AS (
        |  SELECT m.doc_id,
        |    count(*) AS n_bigrams,
        |    CAST(sum(CAST(-log2(
        |      CAST(COALESCE(b.c2, 0) + 1 AS DOUBLE) /
        |      CAST(COALESCE(c.c1, 0) + (SELECT count(*) FROM vocab) + 1 AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE) AS hsum
        |  FROM mapped m
        |  LEFT JOIN big b ON m.w1 = b.w1 AND m.w2 = b.w2
        |  LEFT JOIN ctx c ON m.w1 = c.w1
        |  GROUP BY 1),
        |e AS (
        |  SELECT doc_id, n_bigrams,
        |    floor(hsum / n_bigrams * 1e4 + 0.5) / 1e4 AS entropy_bits
        |  FROM scored)""".stripMargin

    /** The q_lm_perplexity chain with interpolated-KN smoothing: same
      * toks/vocab/mapped/big CTEs, plus the two N1+ tables and T; the
      * scoring CASE mirrors QualityLm.scoreKn term-for-term (same IEEE
      * op order, so the decimal-summed entropies are bit-identical). */
    val lmKnScoreCtes: String =
      s"""WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split($normExpr, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |uni AS (
        |  SELECT u.token, count(*) AS cnt
        |  FROM toks, unnest(toks.toks) AS u(token)
        |  WHERE lang = 'en'
        |  GROUP BY 1),
        |vocab AS (SELECT token FROM uni ORDER BY cnt DESC, token LIMIT 256),
        |pairs AS (
        |  SELECT t.doc_id, t.lang, t.toks[g.i] AS rw1, t.toks[g.i + 1] AS rw2
        |  FROM toks t, unnest(generate_series(1, len(t.toks) - 1)) AS g(i)),
        |mapped AS (
        |  SELECT p.doc_id, p.lang,
        |    CASE WHEN v1.token IS NULL THEN '<unk>' ELSE p.rw1 END AS w1,
        |    CASE WHEN v2.token IS NULL THEN '<unk>' ELSE p.rw2 END AS w2
        |  FROM pairs p
        |  LEFT JOIN vocab v1 ON p.rw1 = v1.token
        |  LEFT JOIN vocab v2 ON p.rw2 = v2.token),
        |big AS (
        |  SELECT w1, w2, count(*) AS c2 FROM mapped
        |  WHERE lang = 'en' GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(c2) AS c1, count(*) AS n1c FROM big GROUP BY 1),
        |rgt AS (SELECT w2, count(*) AS n1r FROM big GROUP BY 1),
        |tv AS (SELECT (SELECT count(*) FROM big) +
        |              (SELECT count(*) FROM vocab) + 1 AS tv1),
        |scored AS (
        |  SELECT m.doc_id,
        |    count(*) AS n_bigrams,
        |    CAST(sum(CAST(-log2(
        |      CASE WHEN COALESCE(c.c1, 0) > 0 THEN
        |        greatest(CAST(COALESCE(b.c2, 0) AS DOUBLE) - 0.75, 0.0)
        |          / CAST(c.c1 AS DOUBLE)
        |        + 0.75 * CAST(c.n1c AS DOUBLE) / CAST(c.c1 AS DOUBLE)
        |          * (CAST(COALESCE(r.n1r, 0) + 1 AS DOUBLE)
        |             / CAST((SELECT tv1 FROM tv) AS DOUBLE))
        |      ELSE CAST(COALESCE(r.n1r, 0) + 1 AS DOUBLE)
        |           / CAST((SELECT tv1 FROM tv) AS DOUBLE)
        |      END) AS DECIMAL(18,12))) AS DOUBLE) AS hsum
        |  FROM mapped m
        |  LEFT JOIN big b ON m.w1 = b.w1 AND m.w2 = b.w2
        |  LEFT JOIN ctx c ON m.w1 = c.w1
        |  LEFT JOIN rgt r ON m.w2 = r.w2
        |  GROUP BY 1),
        |e AS (
        |  SELECT doc_id, n_bigrams,
        |    floor(hsum / n_bigrams * 1e4 + 0.5) / 1e4 AS entropy_bits
        |  FROM scored)""".stripMargin

    /** CTE chain ending in sh(doc_id, s): distinct 5-char shingle sets. */
    def charShingleCtes(src: String): String =
      s"""WITH n AS (
         |  SELECT doc_id, $normExpr AS norm FROM $src),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN length(norm) < 5 THEN [norm]
         |         ELSE list_distinct(list_transform(generate_series(1, length(norm) - 4),
         |              i -> substring(norm, i, 5)))
         |    END AS s
         |  FROM n)""".stripMargin

    /** CTE chain ending in sh(doc_id, s): distinct word-3-gram sets. */
    def wordNgramCtes(src: String): String =
      s"""WITH n AS (
         |  SELECT doc_id, $normExpr AS norm FROM $src),
         |t AS (
         |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS toks
         |  FROM n),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
         |              i -> array_to_string(toks[i:i+2], ' ')))
         |    END AS s
         |  FROM t)""".stripMargin

    val jaccardExpr: String =
      """CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))""".stripMargin

    /** Distinct word-3-gram set expression over a token-list column —
      * the SQL mirror of array_distinct(wordNgramsFromTokens(toks, 3)). */
    def shCase(toks: String): String =
      s"""CASE WHEN len($toks) < 3 THEN [array_to_string($toks, ' ')]
         |       ELSE list_distinct(list_transform(generate_series(1, len($toks) - 2),
         |            i -> array_to_string($toks[i:i+2], ' ')))
         |  END""".stripMargin

    /** CTE chain ending in p(id_a, id_b, n_a, n_b, n_inter): the
      * containment-gate corpus (documents ∪ the first ⌈w/3⌉ normalized
      * tokens of every doc_id % 7 == 0 doc at id + 1000000) and its
      * ORDERED all-pairs distinct-3-gram intersection — the ground
      * truth the lossless prefix-filtered operators must equal. */
    val containmentCtes: String =
      s"""WITH n0 AS (
         |  SELECT doc_id, $normExpr AS norm FROM documents WHERE text IS NOT NULL),
         |t0 AS (
         |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS toks
         |  FROM n0),
         |corpus AS (
         |  SELECT doc_id, toks FROM t0
         |  UNION ALL
         |  SELECT doc_id + 1000000, toks[1:((len(toks) + 2) // 3)] FROM t0
         |  WHERE doc_id % 7 = 0),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |         ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
         |              i -> array_to_string(toks[i:i+2], ' ')))
         |    END AS s
         |  FROM corpus),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(a.s) AS n_a, len(b.s) AS n_b, len(list_intersect(a.s, b.s)) AS n_inter
         |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)""".stripMargin

    /** Full pair query: all-pairs exact Jaccard ≥ threshold. */
    def pairSql(ctes: String, threshold: Double): String =
      s"""$ctes,
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    $jaccardExpr AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= $threshold
         |ORDER BY id_a, id_b""".stripMargin

    /** All-pairs SimHash oracle: recompute the 60-bit signatures from
      * the portable md5 token hash (multiset semantics — duplicate
      * tokens count), then hamming over every pair. Banding recall is
      * 100% at hamming ≤ 3 by pigeonhole, so LSH output equals this. */
    def simhashSql(maxHamming: Int): String = {
      val bitCols = (0 until 60)
        .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS c$b")
        .mkString(",\n    ")
      val sigExpr = (0 until 60)
        .map(b => s"CASE WHEN b.c$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END")
        .mkString(" + ")
      s"""WITH n AS (
         |  SELECT doc_id, $normExpr AS norm FROM documents),
         |tk AS (
         |  SELECT doc_id, unnest(list_filter(string_split(norm, ' '), x -> x <> '')) AS t
         |  FROM n),
         |th AS (
         |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h FROM tk),
         |bits AS (
         |  SELECT doc_id,
         |    $bitCols
         |  FROM th GROUP BY doc_id),
         |sig AS (
         |  SELECT n.doc_id, $sigExpr AS s
         |  FROM n LEFT JOIN bits b USING (doc_id)),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming FROM p WHERE hamming <= $maxHamming
         |ORDER BY id_a, id_b""".stripMargin
    }

    /** Exact-dedup survivors (min doc_id per content fingerprint). */
    val survivorsCte: String =
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    ROW_NUMBER() OVER (PARTITION BY md5($normExpr) ORDER BY doc_id) AS rn
         |  FROM documents),
         |surv AS (SELECT doc_id, text FROM d WHERE rn = 1)""".stripMargin
  }

  /** SQL fragments for the text oracle, generated from TextFunctions so
    * the Spark expressions and the DuckDB SQL cannot drift apart. */
  private object TextFunctionsOracle {
    import graft.functions.TextFunctions
    def stopList: String =
      TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")
    def langIdSql: String =
      TextFunctions.LangProfiles.map { case (lang, markers) =>
        val lst = markers.map(m => s"'$m'").mkString(", ")
        s"len(list_intersect(dtoks, [$lst])) AS s_$lang"
      }.mkString(",\n    ")

    /** Shared CTE chain computing the per-doc text metrics (used by the
      * stats dump and the curation filter — single source of truth). */
    def statsCtes: String =
      s"""WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ltoks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, text, toks,
        |    len(toks) AS n_tokens,
        |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
        |    len(list_filter(ltoks, x -> x IN ($stopList))) AS n_stop,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE) END AS mean_tok_len,
        |    list_distinct(ltoks) AS dtoks
        |  FROM t),
        |sc AS (
        |  SELECT *,
        |    LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |    CAST(n_punct AS DOUBLE) / GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        |    LEAST((CASE WHEN len(toks) = 0 THEN 0.0
        |           ELSE CAST(n_stop AS DOUBLE) / CAST(len(toks) AS DOUBLE) END) * 4.0, 1.0) AS stop_score,
        |    CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 10.0 THEN 1.0 ELSE 0.5 END AS word_score,
        |    $langIdSql
        |  FROM b)""".stripMargin

    val qualityExpr: String =
      """GREATEST(LEAST(len_score * 0.3 + stop_score * 0.3 + word_score * 0.2
        |    + (1.0 - punct_ratio * 5.0) * 0.2, 1.0), 0.0)""".stripMargin

    val langExpr: String =
      """CASE WHEN GREATEST(s_en, s_de, s_es, s_fr, s_it) <= 0 THEN 'und'
        |       WHEN s_en >= GREATEST(s_de, s_es, s_fr, s_it) THEN 'en'
        |       WHEN s_de >= GREATEST(s_es, s_fr, s_it) THEN 'de'
        |       WHEN s_es >= GREATEST(s_fr, s_it) THEN 'es'
        |       WHEN s_fr >= s_it THEN 'fr'
        |       ELSE 'it' END""".stripMargin
  }
}
