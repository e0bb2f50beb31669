package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's tri-partite table model (reference:
  * src/mdataframe/mdataframe.py:276-305): a numeric data block `data` plus
  * optional per-row metadata (`metaRows`, e.g. gene annotations) and
  * per-column/sample metadata (`metaCols`, one row per *sample column* of
  * `data` — the reference stores it transposed; we store it long with a
  * `sample` key since Spark has no cheap transpose).
  *
  * Spark has no row index, so the reference's semantic index
  * (default "gene_stable_id", mdataframe.py:166-167) is an explicit key
  * column carried through every operator. The rows axis is the distributed
  * 100 TB dimension; the samples axis is assumed small (≤ thousands).
  *
  * Alignment rules follow mdataframe.py:688-702: meta frames stay 1:1 with
  * `data` on the index; operators that change the index DISCARD meta; columns
  * duplicated between data and meta are dropped from meta.
  */
final case class MFrame(
    data: DataFrame,
    index: String = MFrame.DefaultIndex,
    metaRows: Option[DataFrame] = None,
    metaCols: Option[DataFrame] = None) {

  /** Value (sample) columns = everything but the index. */
  def valueColumns: Seq[String] = data.columns.toSeq.filterNot(_ == index)

  /** Load-time sub-selection (mdataframe.py:271-305 / S4): trim `data` to
    * `columns`, moving the complement into metaRows; optionally keep only
    * the given row labels. */
  def select(columns: Seq[String], rows: Option[Seq[Any]] = None): MFrame = {
    val keep = Seq(index) ++ columns
    val extra = data.columns.toSeq.filterNot(c => keep.contains(c))
    val trimmed = data.select(keep.map(col): _*)
    val newMetaRows =
      if (extra.isEmpty) metaRows
      else {
        val extraDf = data.select((index +: extra).map(col): _*)
        Some(metaRows.fold(extraDf)(m => m.join(extraDf, Seq(index), "left")))
      }
    val rowFiltered = rows.fold(trimmed)(r => trimmed.filter(col(index).isin(r: _*)))
    copy(data = rowFiltered, metaRows = newMetaRows.map(dedupAgainst(rowFiltered, _)))
  }

  /** Meta-frame join at load (J1, mdataframe.py:283, 289-292): extend
    * metaRows with extra per-row annotation columns (left join on index). */
  def withMetaRows(extra: DataFrame): MFrame = {
    val joined = metaRows.fold(extra)(m => m.join(extra, Seq(index), "left"))
    copy(metaRows = Some(dedupAgainst(data, joined)))
  }

  /** Per-sample metadata; `sample` column must key the value columns. */
  def withMetaCols(extra: DataFrame): MFrame =
    copy(metaCols = Some(metaCols.fold(extra)(m => m.join(extra, Seq(MFrame.SampleKey), "left"))))

  /** Apply a transformer to the data block, keeping meta aligned. If the
    * transformer changes the index column set, meta is discarded
    * (mdataframe.py:688-692). */
  def transform(t: Transformer): MFrame = transform(t, transformData = true)

  /** `transform` with the reference's modify mask (mdataframe.py:590-676:
    * `transform_data` / `transform_meta_rows` / `transform_meta_columns`):
    * the same transformer routes to any subset of the three frames —
    * renames and elementwise cleanups legitimately apply to metadata too.
    * metaCols is stored LONG (one row per sample) rather than transposed,
    * so a metaCols transform sees that long frame directly — no transpose
    * round-trip like the reference's `.transpose().apply().transpose()`.
    * The index-change discard rule applies per frame: a data transform
    * that drops the index discards metaRows (mdataframe.py:688-692). */
  def transform(t: Transformer, transformData: Boolean,
      transformMetaRows: Boolean = false,
      transformMetaCols: Boolean = false): MFrame = {
    val newData = if (transformData) t(data) else data
    val newMetaRows = if (transformMetaRows) metaRows.map(t) else metaRows
    val newMetaCols = if (transformMetaCols) metaCols.map(t) else metaCols
    if (transformData && !newData.columns.contains(index))
      MFrame(newData, index, None, newMetaCols)
    else copy(data = newData, metaRows = newMetaRows, metaCols = newMetaCols).dedupMeta
  }

  /** The reference's convenience wrappers over the modify mask
    * (mdataframe.py:727-763). Naming note, preserved from the reference:
    * `add_meta_column` ADDS A COLUMN TO the meta-ROWS frame (per-gene
    * metadata), and `add_meta_row` augments meta-COLUMNS (per-sample). */
  def addMetaColumn(t: Transformer): MFrame =
    transform(t, transformData = false, transformMetaRows = true)

  def addMetaRow(t: Transformer): MFrame =
    transform(t, transformData = false, transformMetaCols = true)

  def addMeta(t: Transformer, axis: Int = 0): MFrame =
    if (axis == 0) addMetaColumn(t) else addMetaRow(t)

  /** `MDF.impute()` default: NaN/NULL → 0 (mdataframe.py:753-758). */
  def impute(t: Option[Transformer] = None): MFrame =
    transform(t.getOrElse(
      graft.operators.ImputeFixed(None, 0.0, protect = Seq(index))))

  /** `MDF.scale()` default: sklearn `preprocessing.scale` applied per
    * row via the axis=1 transpose dance (mdataframe.py:617-620, 760-763)
    * = population-std z-score along each gene row. */
  def scale(t: Option[Transformer] = None): MFrame =
    transform(t.getOrElse(
      graft.operators.ZScale(axis = 1, ddof = 0, protect = Seq(index))))

  /** Full frame = data + metaRows columns (used by sinks with full=true,
    * mdataframe.py:938-944 / J4). metaCols, living on the samples axis,
    * cannot be row-joined; sinks emit it separately (S7 sheet model). */
  def full: DataFrame =
    metaRows.fold(data)(m => data.join(m, Seq(index), "left"))

  /** Drop meta columns whose names collide with data columns
    * (mdataframe.py:696-702 / U3). */
  private def dedupMeta: MFrame =
    copy(metaRows = metaRows.map(dedupAgainst(data, _)))

  private def dedupAgainst(base: DataFrame, meta: DataFrame): DataFrame = {
    val dup = meta.columns.toSeq.filter(c => c != index && base.columns.contains(c))
    if (dup.isEmpty) meta else meta.drop(dup: _*)
  }
}

object MFrame {
  val DefaultIndex = "gene_stable_id"
  /** Key column of `metaCols` naming the sample/value column it describes. */
  val SampleKey = "sample"
}
