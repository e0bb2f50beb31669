package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.IntegerType

/** Shared machinery for the driver-scale exact paths (exact DBSCAN,
  * exact Ward): ONE cached RDD materialization backs both the collected
  * feature matrix and the labeled output, so row positions align even
  * when the upstream plan is nondeterministic (sample, AQE-coalesced
  * shuffle re-enumeration) — and only the casted numeric features ever
  * travel to the driver, never the full (possibly wide) rows. */
private[operators] object ExactCollect {

  /** Cache df's row RDD and collect ONLY the feature matrix from it. */
  def featureMatrix(df: DataFrame, features: Seq[String]): (RDD[Row], Array[Array[Double]]) = {
    // RDD-level cache: unlike Dataset caches, unreferenced cached RDDs
    // are released by Spark's ContextCleaner once GC'd on the driver
    val rdd = df.rdd.cache()
    val featIdx = features.map(df.schema.fieldIndex).toArray
    val pts = rdd.map { r =>
      featIdx.map { j =>
        r.get(j) match {
          case null                => Double.NaN
          case x: java.lang.Number => x.doubleValue()
          case x                   => x.toString.toDouble
        }
      }
    }.collect()
    (rdd, pts)
  }

  /** Labeled output built from the SAME cached materialization
    * [[featureMatrix]] collected from: zipWithIndex over the cached
    * blocks assigns row i the driver-computed labels(i). */
  def labeled(df: DataFrame, rdd: RDD[Row], labels: Array[Int],
      newColumn: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(labels)
    val outRdd = rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ bc.value(i.toInt))
    }
    spark.createDataFrame(outRdd, df.schema.add(newColumn, IntegerType))
  }
}
