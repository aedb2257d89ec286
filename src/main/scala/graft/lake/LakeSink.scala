package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming → ACID table: every micro-batch lands as one
  * idempotent transactional append ([[LakeTable.appendIdempotent]] with
  * the batch id as the txn version), so a restarted query that replays a
  * batch commits nothing twice — exactly-once sink semantics from the
  * log's CAS, with no coordination beyond the checkpoint's batch ids.
  * This is the streaming-ingest half of the lakehouse: readers keep
  * their snapshot isolation while the stream appends behind them. */
object LakeSink {

  def start(stream: DataFrame, table: String, appId: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        LakeTable.appendIdempotent(
          batch.sparkSession, table, batch, appId, batchId)
        ()
      }
      .trigger(trigger)
      .start()
}
