package graft.operators

import graft.core.MFrame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S8/S9 plot-sink DATA PREP (SURVEY.md §2.1): rendering stays out of the
  * engine (the reference collects to matplotlib; outputs are
  * report-sized), but the frame shaping the reference does before
  * plotting is DataFrame work and lives here:
  *
  *  - row-label substitution (mdataframe.py:1062-1065): display labels
  *    pulled from a meta column, falling back to the index;
  *  - multipage pagination (mdataframe.py:1124-1139): the reference
  *    splits heatmaps into pages because matplotlib caps pixel sizes —
  *    we emit a page column over the plot ordering;
  *  - class-label series join (mdataframe.py:1193-1205, plots.py:470-494):
  *    pull a label column from meta_rows to group scatter points into
  *    series.
  *
  * Every helper also serves as the S9 side-dump: each plot writes its
  * prepared frame as TSV next to the image (mdataframe.py:1078, 1154) —
  * compose with [[graft.sources.Sinks.writeTsv]].
  */
object PlotPrep {

  /** Replace the index with display labels from `labels(index, labelCol)`;
    * rows without a label keep their index (left join + coalesce). */
  def substituteLabels(df: DataFrame, index: String,
      labels: DataFrame, labelCol: String): DataFrame = {
    val l = labels.select(col(index), col(labelCol).as("__lbl"))
    df.join(broadcast(l), Seq(index), "left")
      .withColumn(index, coalesce(col("__lbl"), col(index).cast("string")))
      .drop("__lbl")
  }

  /** Assign 1-based page numbers of `rowsPerPage` rows in index order
    * (multipage heatmap slicing). Plot-sized data: the global order
    * window is acceptable here by construction. */
  def paginate(df: DataFrame, index: String, rowsPerPage: Int): DataFrame = {
    require(rowsPerPage > 0, "rowsPerPage must be positive")
    val w = Window.orderBy(col(index))
    df.withColumn("page",
      ((row_number().over(w) - 1) / rowsPerPage + 1).cast("int"))
  }

  /** Scatter data for a 2-D projection: first two value columns as x/y,
    * plus a class-label series column pulled from meta_rows (fill
    * "unknown" like the reference's fillna) — ready to group into
    * series. */
  def scatterData(mf: MFrame, classLabelColumn: String): DataFrame = {
    val Seq(xCol, yCol, _*) = mf.valueColumns
    val base = mf.data.select(col(mf.index), col(xCol).as("x"), col(yCol).as("y"))
    mf.metaRows match {
      case Some(meta) if meta.columns.contains(classLabelColumn) =>
        base.join(broadcast(meta.select(col(mf.index), col(classLabelColumn))),
          Seq(mf.index), "left")
          .withColumn(classLabelColumn,
            coalesce(col(classLabelColumn).cast("string"), lit("unknown")))
      case _ => base.withColumn(classLabelColumn, lit("unknown"))
    }
  }
}
