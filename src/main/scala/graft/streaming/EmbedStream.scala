package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.streaming.StreamingQuery

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
  * batch operator's assignment ([[EmbedStreamSpec]]), and the SINK
  * path below lands the same rows as queryable layout files exactly
  * once across restarts ([[EmbedStreamIngestSpec]]). */
object EmbedStream {

  /** `vectors`: a STREAMING DataFrame with (vec_id: long,
    * embedding: array<float>). Returns the streaming assignment
    * (vec_id, c1, scid, dist) — append-mode, stateless. */
  def streamingIndexIngest(vectors: DataFrame,
      coarse: Seq[(Long, Array[Long])], cents: DataFrame): DataFrame =
    Ivf2.assignFrozen(vectors, coarse, cents)

  /** End-to-end ingest INTO A QUERYABLE INDEX SEGMENT: the streaming
    * assignment (embedding kept — [[Ivf2.assignFrozenFull]]) written as
    * a coarse-cell-partitioned parquet DELTA directory through Spark's
    * file sink, whose `_spark_metadata` commit log makes the append
    * EXACTLY-ONCE across restarts from `checkpoint` (a batch reader of
    * `path` sees only committed files — a crashed micro-batch's
    * half-written parquet is invisible). The segment's row shape and
    * partitioning are column-identical to [[Ivf2.layout2Path]]'s base
    * layout, so a search reads `base UNION delta` with the SAME
    * coarse-cell file pruning on both sides — the base+delta segment
    * model every LSM-ish index uses, with the periodic retrain
    * (`emb_cell_drift`-triggered) as the fold that absorbs the delta
    * into the next base. Deletes compose unchanged: the DV anti-join
    * ([[Ivf2.topK2Deleted]]) applies to the union like any other
    * layout read. */
  def startIndexIngest(vectors: DataFrame,
      coarse: Seq[(Long, Array[Long])], cents: DataFrame,
      path: String, checkpoint: String): StreamingQuery =
    Ivf2.assignFrozenFull(vectors, coarse, cents)
      .writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("c1")
      .outputMode("append")
      .start()

  /** The queryable view of an ingest delta segment: committed files
    * only (the file sink's metadata log), with the `c1` partition
    * column restored to the library-wide LongType contract — the same
    * normalization [[Ivf2.assign2FromLayout]] applies to the base. A
    * segment with NO committed batch yet (ingest started, first
    * micro-batch still in flight — schema cannot be inferred from zero
    * files) is an EMPTY segment, not an error: a search must be able
    * to read base ∪ delta at any moment of the ingest's life. */
  def deltaSegment(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    // a nonexistent dir is a caller error (mistyped segment path), not
    // an empty segment — same discipline as Ivf2.readDv. Emptiness is
    // detected STRUCTURALLY, not by swallowing AnalysisException (which
    // would also swallow a wrong-schema/corrupt segment as "empty"):
    // the segment is empty iff (a) no visible data file exists yet, or
    // (b) the file sink's metadata log exists but has committed no
    // batch — in-flight files are present but not yet COMMITTED, and a
    // metadata-log read of zero files cannot infer a schema.
    val root = java.nio.file.Paths.get(path)
    require(java.nio.file.Files.isDirectory(root),
      s"delta segment path does not exist: $path")
    val meta = root.resolve("_spark_metadata")
    // the committed-file SET (not just batch presence) decides: a
    // micro-batch can legitimately commit ZERO files (every row of the
    // batch filtered out), leaving a log with batches but no data —
    // with the next batch's part files in flight on disk, a
    // batch-presence test would fall through to a metadata-log read of
    // zero files, which cannot infer a schema and would crash a live
    // base ∪ delta search. The sink's own log (FileStreamSinkLog) is
    // the one reader of record; a corrupt log still fails loudly here.
    // The log is consulted FIRST: when it lists committed files, the
    // visible-data-file probe is a CROSS-CHECK, not a short-circuit — a
    // segment whose log names committed files but whose data files are
    // gone (partial copy, external deletion) must fail loudly, not read
    // as an empty delta that silently drops the whole segment from a
    // composed search.
    val committedNonEmpty: Option[Boolean] =
      if (!java.nio.file.Files.isDirectory(meta)) None
      else {
        import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
        Some(new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark,
          meta.toString).allFiles().nonEmpty)
      }
    def emptySegment = spark.range(0).select(col("id").as("vec_id"),
      expr("CAST(array() AS array<float>)").as("embedding"),
      col("id").as("scid"), col("id").as("dist"), col("id").as("c1"))
    committedNonEmpty match {
      case Some(true) =>
        require(Ivf2.hasVisibleDataFile(root),
          s"delta segment $path: the sink's commit log lists committed " +
            "files but no visible data file exists — partial copy or " +
            "external deletion; refusing to read a truncated segment as empty")
        Ivf2.readSegment(spark, path) // the ONE segment row contract
      case Some(false) => emptySegment // log present, zero files committed
      case None => // no sink log: a batch-written (or still file-less) dir
        if (Ivf2.hasVisibleDataFile(root)) Ivf2.readSegment(spark, path)
        else emptySegment
    }
  }

  /** FOLD a delta segment into the base layout WITHOUT retraining — the
    * file-move analog of [[graft.sim.Ivf2.compactDeletes]], closing the
    * base+delta lifecycle: at 100 TB you do not retrain the quantizer
    * to absorb a day of ingest; you merge the delta's COMMITTED rows
    * into the base's coarse-cell directories and retire the segment.
    * Codebooks and assignments are untouched (delta rows were assigned
    * by the SAME frozen codebooks as the base — [[startIndexIngest]]),
    * so fold(base, delta) carries exactly the rows of a batch-built
    * layout over the grown corpus, and every reader (search, dedup,
    * drift, delete) sees identical results before and after
    * ([[FoldDeltaSpec]]). The periodic retrain remains the SHAPE fold
    * (a drifted codebook wants new cells); this is the SPACE fold.
    *
    * Two modes, both with work independent of the corpus:
    *  - `compact = false` (default): the delta's committed rows are
    *    appended into the base's partition dirs — O(delta) bytes
    *    written, NO base file read or touched (spec-pinned: the base's
    *    pre-fold files survive byte-identical).
    *  - `compact = true`: the AFFECTED coarse cells (those the delta
    *    touches) are rewritten as merged files — the
    *    [[graft.sim.Ivf2.compactDeletes]] discipline applied to
    *    appends, reclaiming the file-count cost of many small
    *    micro-batch files; work is proportional to the affected cells'
    *    data. The rewrite frame is localCheckpoint'ed first (it reads
    *    the path it overwrites) and the overwrite mode is per-write.
    *
    * The delta segment is CONSUMED (directory removed): its rows now
    * live in the base, and a reader unioning base with a stale segment
    * would double-count. A segment whose ingest committed ZERO rows is
    * consumed too (its sink commit log proves it is a retired segment);
    * only a bare directory with no commit log — not provably a
    * segment — is left in place as the identity fold. A delta row whose
    * vec_id already exists in the base with a DIFFERENT payload is an
    * id collision, not a crash-recovery re-land, and the fold fails
    * rather than silently dropping it. Fold only a STOPPED ingest's
    * segment; the next
    * ingest epoch starts a fresh segment + checkpoint (a restarted
    * query against the old checkpoint would re-create the dir and
    * re-land only post-fold batches — the committed offsets live in the
    * checkpoint, not the retired segment).
    *
    * CRASH RECOVERY — re-running foldDelta is IDEMPOTENT: only the
    * delta rows whose vec_id is not already in the base's affected
    * cells are folded (one file-pruned anti-join against those cells —
    * O(affected-cell data), never the corpus), so a crash in the
    * window between the completed base write and the segment removal
    * is healed by simply running the fold again; the second pass
    * appends nothing and deletes the stale segment. Returns the
    * affected coarse-cell ids. */
  def foldDelta(spark: org.apache.spark.sql.SparkSession, basePath: String,
      deltaPath: String, compact: Boolean = false): Seq[Long] = {
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(basePath)),
      s"base layout path does not exist: $basePath")
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(deltaPath)),
      s"delta segment path does not exist: $deltaPath")
    // base == delta (under any alias: symlink, `.`, trailing slash)
    // would make the anti-join drop every row as "already landed" and
    // then CONSUME the segment — i.e. silently delete the base layout
    // and report success. Canonicalize before comparing.
    require(java.nio.file.Paths.get(basePath).toRealPath() !=
        java.nio.file.Paths.get(deltaPath).toRealPath(),
      s"fold of a segment into itself: base and delta both resolve to " +
        java.nio.file.Paths.get(basePath).toRealPath())
    // the base must be a BATCH layout: folding into another streaming
    // segment would append files its _spark_metadata log never lists
    require(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(basePath, "_spark_metadata")),
      s"$basePath is itself a streaming delta segment; fold into the batch base")
    val delta = deltaSegment(spark, deltaPath) // committed rows only
    val cells = delta.select("c1").distinct()
      .collect().map(_.getLong(0)).toSeq
    if (cells.nonEmpty) {
      def baseCells = Ivf2.readSegment(spark, basePath)
        .filter(col("c1").isin(cells: _*)) // file-pruned to affected dirs
      // idempotence: drop delta rows a crashed previous fold already
      // landed (vec_id is unique across the index's life). ONE left
      // join serves both the fresh-row split and the relanded-row
      // ACCOUNTING: a dropped row whose base payload matches is the
      // crash-recovery no-op this anti-join exists for, but a dropped
      // row whose payload DIFFERS is an id collision (update-semantics
      // ingest, or a duplicate-id bug) — consuming the segment there
      // would silently discard data, so it fails instead.
      val joined = delta.join(
        baseCells.select(col("vec_id"), col("embedding").as("b_embedding"),
          col("scid").as("b_scid"), col("dist").as("b_dist"),
          col("c1").as("b_c1")),
        Seq("vec_id"), "left_outer").localCheckpoint(true)
      val relanded = joined.filter(col("b_scid").isNotNull)
      val mismatched = relanded.filter(
        col("c1") =!= col("b_c1") || col("scid") =!= col("b_scid") ||
          col("dist") =!= col("b_dist") ||
          col("embedding") =!= col("b_embedding")).count()
      if (mismatched > 0) throw new IllegalStateException(
        s"foldDelta: $mismatched delta row(s) collide on vec_id with base " +
          s"rows whose payload DIFFERS ($deltaPath into $basePath) — not a " +
          "crash-recovery re-land; refusing to drop them and consume the segment")
      val nRelanded = relanded.count()
      if (nRelanded > 0) System.err.println(
        s"foldDelta: skipping $nRelanded delta row(s) already in the base " +
          s"(payload-identical — a crashed previous fold's re-land)")
      val fresh = joined.filter(col("b_scid").isNull)
        .select(delta.columns.map(col): _*)
      if (fresh.head(1).nonEmpty) {
        if (!compact)
          fresh.write.mode("append").partitionBy("c1").parquet(basePath)
        else {
          val merged = baseCells
            .unionByName(fresh)
            .repartition(cells.size, col("c1")) // merged files per cell
            .localCheckpoint(true)
          merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("c1").parquet(basePath)
        }
      }
      Ivf2.deleteTree(java.nio.file.Paths.get(deltaPath))
    } else if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(deltaPath, "_spark_metadata"))) {
      // a stopped ingest that committed ZERO rows is still a RETIRED
      // segment — the sink's commit log proves an ingest owned this dir,
      // and leaving it would leak the directory forever (the one
      // lifecycle verb whose "consumed" postcondition would otherwise
      // have a silent exception). A bare directory WITHOUT a commit log
      // is not provably a segment (it may be a caller's mistyped or
      // pre-created path), so the identity fold leaves it alone.
      Ivf2.deleteTree(java.nio.file.Paths.get(deltaPath))
    }
    cells
  }
}
