package org.apache.spark.sql

/** Minimal `private[sql]` access shim, the established pattern open-source
  * Spark extensions use when a connector needs an engine entry point that
  * is package-private (see e.g. qbeast-spark's DatasetFactory / pathling's
  * ColumnDataset, both `package org.apache.spark.sql` objects for exactly
  * this reason). One method, nothing else. */
object GraftSqlShims {

  /** Re-tag a batch DataFrame's physical plan as a STREAMING DataFrame —
    * what a v1 streaming `Source.getBatch` must return (the engine splices
    * the plan into the micro-batch run; `FileStreamSource` and Delta's
    * source do the identical `internalCreateDataFrame(rdd, schema,
    * isStreaming = true)` call, which is `private[sql]`). */
  def asStreamingDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
