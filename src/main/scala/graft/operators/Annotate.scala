package graft.operators

import graft.core.Transformer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Annotation joins (reference SURVEY.md §2.3).
  *
  * The reference's `FromFile` annotator (reference:
  * src/mdataframe/mbf_compliance.py:57-91 / J3) reindexes an external table
  * to the target's index with a fill value — i.e. a LEFT equi-join on a
  * configurable key pair, projecting `columnsToAdd`. Annotation tables are
  * small by construction, so the join side is broadcast: no shuffle of the
  * (100 TB-scale) target. */
final case class FromTable(
    table: DataFrame,
    columnsToAdd: Seq[String],
    indexColumnTarget: String = "gene_stable_id",
    indexColumnTable: String = "gene_stable_id",
    fill: Option[Any] = None) extends Transformer {
  val name = "FromTable"

  def apply(df: DataFrame): DataFrame = {
    require(df.columns.contains(indexColumnTarget),
      s"Column $indexColumnTarget not found in target, found was: ${df.columns.mkString(", ")}.")
    require(table.columns.contains(indexColumnTable),
      s"Column $indexColumnTable not found in table, found was: ${table.columns.mkString(", ")}.")
    columnsToAdd.foreach(c => require(table.columns.contains(c),
      s"Column $c not found in table, found was: ${table.columns.mkString(", ")}."))
    val slim = table.select((indexColumnTable +: columnsToAdd).distinct.map(col): _*)
    val joined = df.join(broadcast(slim),
      df(indexColumnTarget) === slim(indexColumnTable), "left")
      .drop(slim(indexColumnTable))
    fill match {
      case Some(v: Double) => joined.na.fill(v, columnsToAdd)
      case Some(v: Long)   => joined.na.fill(v, columnsToAdd)
      case Some(v: Int)    => joined.na.fill(v.toLong, columnsToAdd)
      case Some(v: String) => joined.na.fill(v, columnsToAdd)
      case _               => joined
    }
  }
}

object Annotate {
  /** Format-detecting annotation source (reference mbf_compliance.py:57-63
    * / S5 `FromFile(...).parse()`): `.xlsx` and legacy `.xls` through the
    * JDK-only readers ([[graft.sources.Excel]] / [[graft.sources.Biff]]),
    * `.csv` comma-separated, `.json` lines, `.parquet` native, anything
    * else tab-separated (the reference's default). All text paths infer
    * header + schema like pandas. */
  def fromFile(spark: SparkSession, path: String): DataFrame = {
    if (path.endsWith(".parquet")) spark.read.parquet(path)
    else if (path.endsWith(".xlsx")) graft.sources.Excel.readXlsx(spark, path)
    else if (path.endsWith(".xls")) graft.sources.Excel.readXls(spark, path)
    else if (path.endsWith(".json")) spark.read.json(path)
    else {
      val sep = if (path.endsWith(".csv")) "," else "\t"
      spark.read
        .option("sep", sep).option("header", "true").option("inferSchema", "true")
        .csv(path)
    }
  }

  /** Cluster-label annotation (reference mdataframe.py:47-75 `ClusterAnnotator`
    * + 801-807 / J2): left-join per-row labels, fill -1 for rows the model
    * skipped. */
  def clusterLabels(labels: DataFrame, labelCol: String, index: String = "gene_stable_id"): Transformer =
    Transformer("ClusterAnnotator", Seq(labelCol, index)) { df =>
      df.join(broadcast(labels.select(col(index), col(labelCol))), Seq(index), "left")
        .withColumn(labelCol, coalesce(col(labelCol).cast("double"), lit(-1.0)))
    }
}
