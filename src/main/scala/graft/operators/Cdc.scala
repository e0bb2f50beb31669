package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance: apply a batch of keyed changes
  * (upserts + tombstone deletes) to a snapshot — the "merge into" a
  * curation pipeline runs when a feed re-delivers corrected documents
  * or retracts bad ones (takedowns, robots revocations, licensing
  * pulls). Latest version wins per key; a delete tombstone removes the
  * key from the result.
  *
  * Scale shape: one union + one key-partitioned window rank — the
  * whole merge is a single shuffle on the key, no join, and the
  * snapshot never round-trips through the driver. Determinism: ties on
  * the version column resolve change-side-wins then by the tag, so a
  * re-delivered change batch (at-least-once feeds) merges to the
  * identical result — the operator is idempotent over replayed
  * changes. */
object Cdc {

  /** Apply `changes` to `snapshot`.
    *
    * Both sides must carry `keyCols` and `versionCol` (the snapshot's
    * version is whatever it was written with — 0 for a fresh load).
    * `changes` may carry `opCol` with value "D" for a tombstone; any
    * other value (or a missing column) means upsert. Output schema =
    * snapshot schema (+ the version column as updated); tombstoned
    * keys are absent. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String,
      opCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "Cdc.applyChanges: need at least one key column")
    val dataCols = snapshot.columns.toSeq
    require(dataCols.contains(versionCol),
      s"Cdc.applyChanges: snapshot lacks version column '$versionCol'")
    val op = opCol.getOrElse("__op")
    val snapTagged = snapshot
      .withColumn(op, lit("U"))
      .withColumn("__src", lit(0))
    val chTagged = {
      val base = opCol match {
        case Some(c) =>
          require(changes.columns.contains(c),
            s"Cdc.applyChanges: changes lack op column '$c'")
          changes
        case None => changes.withColumn(op, lit("U"))
      }
      base.select((dataCols :+ op).map(col): _*).withColumn("__src", lit(1))
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    snapTagged.select((dataCols :+ op :+ "__src").map(col): _*)
      .unionByName(chTagged)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(op) =!= "D")
      .select(dataCols.map(col): _*)
  }
}
