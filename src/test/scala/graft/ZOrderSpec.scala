package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly (hand-checked)") {
    // x=5 (101), y=3 (011) at 3 bits: z-bit 2b <- x bit b, 2b+1 <- y bit b
    // z = x0 + y0<<1 + x1<<2 + y1<<3 + x2<<4 + y2<<5 = 1+2+0+8+16+0 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 3)).head.getLong(0)
    assert(z == 27L)
    // zero and max corners
    val corners = Seq((0L, 0L), (7L, 7L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 3)).collect().map(_.getLong(0))
    assert(corners.toSeq == Seq(0L, 63L))
  }

  test("out-of-range and null values raise instead of aliasing") {
    def z(x: java.lang.Long, y: java.lang.Long) =
      Seq((x, y)).toDF("x", "y")
        .select(ZOrder.zValue(Seq(col("x"), col("y")), 3)).head.getLong(0)
    intercept[Exception](z(8L, 0L))  // >= 2^3
    intercept[Exception](z(-1L, 0L))
    intercept[Exception](z(null, 0L))
    intercept[IllegalArgumentException](
      ZOrder.zValue(Seq(col("x"), col("y")), 32)) // 64 z-bits > 63
  }

  test("z-order layout clusters both dimensions: bbox audit beats single-column sort") {
    // the full 64x64 grid — every (x, y) once
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64)).as("y"))
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 6))
    // on a FULL grid any equal-count contiguous chunking tiles the
    // space, so total bbox AREA is constant — the discriminator is box
    // SHAPE: z-order gives compact squares, a single-column sort gives
    // slivers spanning all of y. Perimeter (= query-intersection
    // probability for small boxes) captures it.
    val perim = (r: org.apache.spark.sql.DataFrame) => r.agg(sum(
      (col("x_max") - col("x_min") + 1) + (col("y_max") - col("y_min") + 1)))
      .head.getLong(0)
    val zRep = ZOrder.localityReport(grid, "z", "x", "y", nChunks = 16)
    val xRep = ZOrder.localityReport(grid, "x", "x", "y", nChunks = 16)
    // the audit itself follows the repo's no-global-window rule: the
    // two-phase rank leaves no window without a partition spec
    val plan = zRep.queryExecution.executedPlan.toString
    val globalWin = "Window \\[[^\\]]*\\], \\[[^\\]]*\\](?!, \\[)".r
    assert(globalWin.findFirstIn(plan).isEmpty,
      "localityReport must not use a single-partition global window")
    val (zPer, xPer) = (perim(zRep), perim(xRep))
    // z: 16 perfect 16x16 squares -> 16*(16+16) = 512
    assert(zPer == 512L, s"z chunks must be 16x16 squares, got perimeter sum $zPer")
    // x-sort: 16 slivers 4 wide x 64 tall -> 16*(4+64) = 1088
    assert(xPer == 1088L, s"x-sort chunks must be 4x64 slivers, got $xPer")
    assert(zPer * 2 < xPer, s"z=$zPer x=$xPer")
  }

  test("layoutZOrdered writes disjoint z-ranges and a range query touches few files") {
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64)).as("y"))
    val laid = ZOrder.layoutZOrdered(grid, Seq("x", "y"), bits = 6, nFiles = 16)
    // per-partition z-ranges are disjoint (range partitioner contract)
    val ranges = laid.groupBy(spark_partition_id().as("p"))
      .agg(min(col("z_value")).as("lo"), max(col("z_value")).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlapping ranges $ranges")
      case _ =>
    }
    // written as one file per partition, a small 2-d box (8x8 corner =
    // one 64-entry z-range) lands in very few files
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    laid.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 64 * 64)
    val touched = back.where(col("x") < 8 && col("y") < 8)
      .select(input_file_name()).distinct().count()
    assert(touched <= 2, s"8x8 corner box touched $touched of 16 files")
    // the same box under an x-sorted layout touches 1/8 of the X RANGE
    // but every file holds all y — box rows spread across ~2 of 16 x-files
    // only because x<8 is narrow; make the contrast on a y-box instead:
    val yBox = back.where(col("y") < 8) // all x
      .select(input_file_name()).distinct().count()
    val xLaid = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val xDir = java.nio.file.Files.createTempDirectory("xorder").toString
    xLaid.write.mode("overwrite").parquet(xDir)
    val xTouched = spark.read.parquet(xDir).where(col("y") < 8)
      .select(input_file_name()).distinct().count()
    assert(xTouched >= 14, s"x-sorted layout should spread y-queries, got $xTouched")
    assert(yBox <= 16, s"sanity: $yBox")
  }

  test("hilbertValue: base case, bijectivity, and the neighbor law") {
    // bits=1 quadrant order: (0,0)=0, (0,1)=1, (1,1)=2, (1,0)=3
    val base = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
    val got = ZOrder.hilbertValue(base, "x", "y", bits = 1, out = "h")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))

    // full 64x64 grid at bits=6: h is a bijection onto [0, 4096) and
    // CONSECUTIVE indices are grid neighbors — the curve's defining law
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64)).as("y"))
    val pts = ZOrder.hilbertValue(grid, "x", "y", bits = 6, out = "h")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(pts.map(_._1).toSeq == (0L until 4096L).toSeq, "h must be a bijection")
    pts.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"non-adjacent consecutive points ($x1,$y1) -> ($x2,$y2)")
    case _ => }
  }

  test("hilbert locality is at least z-order's on the chunk audit") {
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64)).as("y"))
    val h = ZOrder.hilbertValue(grid, "x", "y", bits = 6, out = "h")
    val z = grid.withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 6))
    val perim = (r: org.apache.spark.sql.DataFrame) => r.agg(sum(
      (col("x_max") - col("x_min") + 1) + (col("y_max") - col("y_min") + 1)))
      .head.getLong(0)
    val hPer = perim(ZOrder.localityReport(h, "h", "x", "y", nChunks = 16))
    val zPer = perim(ZOrder.localityReport(z, "z", "x", "y", nChunks = 16))
    assert(hPer <= zPer, s"hilbert $hPer vs z $zPer")
    intercept[Exception](
      ZOrder.hilbertValue(Seq((64L, 0L)).toDF("x", "y"), "x", "y", 6, "h").collect())
  }

  test("layoutHilbertOrdered: disjoint ranges; box queries touch at most as many files as z") {
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64)).as("y"))
    val laid = ZOrder.layoutHilbertOrdered(grid, "x", "y", bits = 6, nFiles = 16)
    val ranges = laid.groupBy(spark_partition_id().as("p"))
      .agg(min(col("h_value")).as("lo"), max(col("h_value")).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlap: ${ranges.toSeq}")
      case _ =>
    }
    val dir = java.nio.file.Files.createTempDirectory("horder").toString
    laid.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 64 * 64)
    val touched = back.where(col("x") < 8 && col("y") < 8)
      .select(input_file_name()).distinct().count()
    assert(touched <= 2, s"8x8 corner box touched $touched of 16 hilbert files")
  }

  test("compact: collapses a 64-file directory, preserves content, sizes from bytes") {
    import graft.operators.ZOrder
    val df = spark.range(20000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"))
    val in = java.nio.file.Files.createTempDirectory("compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString
    df.repartition(64).write.mode("overwrite").parquet(in)
    assert(ZOrder.parquetFileCount(spark, in) == 64)
    val bytes = ZOrder.parquetBytes(spark, in)
    // target = half the total -> exactly 2 output files
    val back = ZOrder.compact(spark, in, out, targetBytes = (bytes + 1) / 2)
    assert(ZOrder.parquetFileCount(spark, out) == 2)
    val a = df.orderBy("id").collect().map(_.toSeq).toList
    val b = back.orderBy("id").collect().map(_.toSeq).toList
    assert(a == b, "compaction must preserve content exactly")
    // a huge target floors at one file
    val out1 = java.nio.file.Files.createTempDirectory("compact_out1").toString
    ZOrder.compact(spark, in, out1, targetBytes = Long.MaxValue / 2)
    assert(ZOrder.parquetFileCount(spark, out1) == 1)
  }
}
