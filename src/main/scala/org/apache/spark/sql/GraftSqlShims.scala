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

  /** The inverse: re-tag the micro-batch DataFrame a v1 `Sink.addBatch`
    * receives (physically a batch, but flagged streaming, so every
    * batch write verb refuses it) as a plain batch DataFrame over the
    * SAME physical plan — no collect, no extra serialization round-trip
    * (the `createDataFrame(df.rdd, schema)` folk recipe pays one). */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
