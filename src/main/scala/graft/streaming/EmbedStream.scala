package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sim.Ivf2

/** Streaming twin of the ANN index-maintenance path: arriving vectors
  * are assigned against FROZEN two-level codebooks — the Structured
  * Streaming spelling of [[graft.sim.Ivf2.assign2Append]], so a vector
  * reaches its (c1, scid) leaf within its arrival micro-batch instead
  * of waiting for the next batch append job.
  *
  * Scale shape: STATELESS. Quantization and the coarse argmin are
  * map-only expressions over the stream (the coarse codebook is a
  * literal reference array inside the codegen'd kernel); the leaf
  * argmin joins the K1-row packed level-2 codebook — a stream-STATIC
  * join, which Spark executes map-side per micro-batch with no state
  * store at all. Output mode append, no watermark needed: at 1000
  * executors this ingests at scan speed, and the cost per vector is
  * the same O(√K_old) as the batch path because it IS the same
  * `assignFrozen` plan. Retraining stays a periodic batch job
  * (`emb_cell_drift` is the trigger); the streaming query simply
  * restarts against the new codebooks — exactly how a production
  * deployment rolls an index version.
  *
  * Batch ≡ stream is spec-pinned: the appended corpus half fed through
  * a MemoryStream in several micro-batches yields row-for-row the
  * batch operator's assignment. */
object EmbedStream {

  /** `vectors`: a STREAMING DataFrame with (vec_id: long,
    * embedding: array<float>). Returns the streaming assignment
    * (vec_id, c1, scid, dist) — append-mode, stateless. */
  def streamingIndexIngest(vectors: DataFrame,
      coarse: Seq[(Long, Array[Long])], cents: DataFrame): DataFrame =
    Ivf2.assignFrozen(vectors, coarse, cents)
}
