package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming → ACID table: every micro-batch lands as one
  * idempotent transactional append ([[LakeTable.appendIdempotent]] with
  * the batch id as the txn version), so a query restarted FROM ITS
  * CHECKPOINT that replays a batch commits nothing twice — exactly-once
  * sink semantics from the log's CAS, with no coordination beyond the
  * checkpoint's batch ids. This is the streaming-ingest half of the
  * lakehouse: readers keep their snapshot isolation while the stream
  * appends behind them.
  *
  * The token contract (identical to Delta's txnAppId/txnVersion): batch
  * ids must name deterministic content, which the checkpoint
  * guarantees. Discarding the checkpoint re-numbers batches from 0 over
  * whatever the source NOW contains — reuse the appId only if the
  * source is unchanged (pure replay); if the source has grown, a fresh
  * checkpoint needs a fresh appId or the re-numbered batches collide
  * with committed tokens and the new data is skipped. */
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
