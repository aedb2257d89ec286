package graft.lake

import org.apache.spark.sql.{DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming SOURCE over the lake's transaction log — the
  * pull-based twin of [[LakeSink]]: `spark.readStream.format("lake")
  * .load(tableDir)` tails the table, emitting the rows each append
  * commit added, exactly once.
  *
  * Offsets ARE log versions: batch (v1, v2] reads precisely the files
  * the commits in that range added ([[LakeTable.changesBetween]]), so
  * the engine's offset checkpointing gives exactly-once for free — a
  * restarted query resumes from its last committed version. Commits
  * that REWRITE data (overwrite / merge / delete / update) have no
  * row-level delta in the log; a batch range containing one FAILS the
  * query loudly (the consumer re-syncs from a snapshot and restarts
  * with `startingVersion`), exactly Delta's behavior when its change
  * feed is unavailable. Row-identical re-layouts (`optimize` /
  * `compact`) pass through silently, like Delta's dataChange=false.
  *
  * Options: `startingVersion` (default 0) — emit only commits AFTER
  * this version; use it to start past historical rewrites or to tail
  * new data only (`startingVersion` = current version at start).
  * `startingTimestamp` (exclusive with `startingVersion`) — start at
  * the first commit at or after the instant, resolved from the commit
  * wall-clock the log records ([[LakeTable.streamStartVersionAt]]).
  * `maxVersionsPerBatch` (default unlimited) — admission control: cap
  * how many commits one micro-batch may cover, so a stream that starts
  * on a long history (or falls behind a hot writer) catches up in
  * bounded batches instead of reading every pending version in one
  * unbounded batch — the `maxFilesPerTrigger` of this source.
  * `readChangeFeed` (default false) — serve [[LakeTable.changeFeed]]
  * instead of plain inserts: rows carry `_change_type` /
  * `_commit_version`, and DML commits (delete / update / merge) STREAM
  * their staged change files rather than failing the query; only
  * whole-table rewrites still refuse. */
class LakeStreamSource(spark: SparkSession, table: String,
    override val schema: StructType, startingVersion: Long,
    maxVersionsPerBatch: Option[Long] = None,
    readChangeFeed: Boolean = false) extends Source {

  require(maxVersionsPerBatch.forall(_ >= 1),
    s"maxVersionsPerBatch must be >= 1, got ${maxVersionsPerBatch.get}")

  /** End version of the last batch the engine asked for — the admission
    * base. MicroBatchExecution is serial (getOffset -> getBatch ->
    * commit), and on restart it calls getBatch with the checkpointed
    * range BEFORE the first getOffset, so this is correctly seeded in
    * both fresh and recovered runs. */
  @volatile private var lastBatchEnd: Long = startingVersion

  /** The engine replays offsets from its checkpoint as SerializedOffset;
    * both forms carry the version as their json. */
  private def versionOf(o: Offset): Long = o.json.trim.toLong

  private final case class LakeVersionOffset(version: Long) extends Offset {
    override def json: String = version.toString
  }

  override def getOffset: Option[Offset] =
    LakeTable.latestVersion(table).filter(_ > startingVersion)
      .map { latest =>
        LakeVersionOffset(maxVersionsPerBatch
          .fold(latest)(m => math.min(latest, math.max(lastBatchEnd, startingVersion) + m)))
      }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startingVersion)
    val toV = versionOf(end)
    if (toV > lastBatchEnd) lastBatchEnd = toV
    // both readers refuse commits they cannot express as a row delta —
    // the loud-failure contract — and serve the range as one batch read
    GraftSqlShims.asStreamingDataFrame(
      if (readChangeFeed) LakeTable.changeFeed(spark, table, fromV, toV)
      else LakeTable.changesBetween(spark, table, fromV, toV))
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakeStreamSource[$table from v$startingVersion]"
}
