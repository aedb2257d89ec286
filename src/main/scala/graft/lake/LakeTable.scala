package graft.lake

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** ACID table format on plain Parquet — the transaction-log half of the
  * "lakehouse" (data lake + ACID) thesis, built from scratch because no
  * Delta/Iceberg jars exist in this environment. The protocol is the
  * published one (Armbrust et al., "Delta Lake: High-Performance ACID
  * Table Storage over Cloud Object Stores", VLDB 2020): an append-only
  * log of versioned commits, each listing data files added/removed;
  * a snapshot at version V is the replay of commits 1..V; writers race
  * to create version V+1 with an ATOMIC create-exclusive, and the loser
  * rebases and retries (optimistic concurrency).
  *
  * Guarantees (spec-verified in `LakeTableSpec`):
  *  - **Atomicity**: a commit is one log-file creation; data files are
  *    staged first and invisible until the log entry exists, so a
  *    crashed writer leaves orphans, never a torn table.
  *  - **Isolation**: snapshots pin a file list; concurrent commits
  *    (even overwrites) never change what an open snapshot reads,
  *    because data files are immutable and removal is logical.
  *  - **Serializability**: the contiguous version counter is the
  *    serial order; appends commute and rebase-retry, overwrite
  *    re-derives its remove-set against the winner before retrying
  *    (last-writer-wins, like Delta under WriteSerializable).
  *  - **Time travel**: any historical version remains readable until
  *    vacuumed.
  *
  * The log CAS uses `Files.createLink` (hard-link creation is O_EXCL-
  * atomic and publishes fully-written content in one syscall) — the
  * local-filesystem equivalent of the HDFS rename-no-overwrite
  * LogStore; an object-store deployment would swap in a put-if-absent.
  * Data files are written by Spark (distributed, any size); ONLY the
  * driver touches the log, which is O(commits), not O(data). */
object LakeTable {

  private val LogDir = "_txlog"

  final case class Commit(version: Long, op: String, add: Seq[String],
      remove: Seq[String], schemaJson: String)

  // ---- log encoding (hand-rolled, no deps beyond the JDK) -------------

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'n' => b += '\n'; i += 2
          case 'u' => b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o => b += o; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private def encode(c: Commit): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")
    s"""{"version":${c.version},"op":"${c.op}","add":${arr(c.add)},"remove":${arr(c.remove)},"schema":"${esc(c.schemaJson)}"}"""
  }

  /** Parse one commit file. The format is self-authored (see [[encode]]),
    * so a targeted parser is safe — no general JSON needed. */
  private def decode(s: String): Commit = {
    def field(name: String): String = {
      val key = "\"" + name + "\":"
      val i = s.indexOf(key)
      require(i >= 0, s"corrupt commit: missing $name")
      s.drop(i + key.length)
    }
    def str(rest: String): String = {
      // rest starts with '"'; scan to the unescaped closing quote
      val b = rest.drop(1)
      var i = 0
      while (b.charAt(i) != '"') { if (b.charAt(i) == '\\') i += 1; i += 1 }
      unesc(b.take(i))
    }
    def strArr(rest: String): Seq[String] = {
      require(rest.startsWith("["), "corrupt commit: expected array")
      val out = Seq.newBuilder[String]
      var r = rest.drop(1)
      while (!r.startsWith("]")) {
        val v = str(r)
        out += v
        // skip past the quoted value we just read (re-escaped length)
        r = r.drop(2 + esc(v).length)
        if (r.startsWith(",")) r = r.drop(1)
      }
      out.result()
    }
    Commit(
      version = field("version").takeWhile(c => c.isDigit).toLong,
      op = str(field("op")),
      add = strArr(field("add")),
      remove = strArr(field("remove")),
      schemaJson = str(field("schema")))
  }

  // ---- log primitives --------------------------------------------------

  private def logDir(table: String): Path = Paths.get(table, LogDir)

  private def versionFile(table: String, v: Long): Path =
    logDir(table).resolve(f"$v%020d.json")

  /** All committed versions, ascending. */
  def versions(table: String): Seq[Long] = {
    val d = logDir(table)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val it = Files.list(d)
      try it.iterator().asInstanceOf[java.util.Iterator[Path]]
        .asScala_().filter(_.getFileName.toString.matches("\\d{20}\\.json"))
        .map(_.getFileName.toString.dropRight(5).toLong).toSeq.sorted
      finally it.close()
    }
  }

  // tiny shim: avoid importing scala.jdk here and in tests differently
  private implicit class IterShim[A](it: java.util.Iterator[A]) {
    def asScala_(): Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  def latestVersion(table: String): Option[Long] = versions(table).lastOption

  private def readCommit(table: String, v: Long): Commit =
    decode(new String(Files.readAllBytes(versionFile(table, v)), UTF_8))

  def history(table: String): Seq[Commit] = versions(table).map(readCommit(table, _))

  /** Live file list + schema at `version` (default: latest). */
  def snapshotFiles(table: String, version: Option[Long] = None): (Seq[String], Option[String]) = {
    val upTo = version.orElse(latestVersion(table)).getOrElse(0L)
    val live = scala.collection.mutable.LinkedHashSet[String]()
    var schema: Option[String] = None
    versions(table).takeWhile(_ <= upTo).foreach { v =>
      val c = readCommit(table, v)
      c.remove.foreach(live -= _)
      live ++= c.add
      schema = Some(c.schemaJson)
    }
    (live.toSeq, schema)
  }

  /** The atomic commit CAS: returns true iff this writer created the
    * version file. Content is fully durable before publication (written
    * to a temp file, published by hard-link creation — one atomic
    * syscall that fails if the target exists). */
  private def tryCommit(table: String, c: Commit): Boolean = {
    Files.createDirectories(logDir(table))
    val tmp = logDir(table).resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, encode(c).getBytes(UTF_8))
    try { Files.createLink(versionFile(table, c.version), tmp); true }
    catch { case NonFatal(_) => false }
    finally Files.deleteIfExists(tmp)
  }

  // ---- write path ------------------------------------------------------

  /** Stage `df` as immutable parquet files under a unique subdir and
    * return their table-relative paths. Distributed write; nothing is
    * visible until a log entry references it. */
  private def stage(df: DataFrame, table: String): Seq[String] = {
    val sub = s"stage-${java.util.UUID.randomUUID().toString.take(12)}"
    val dir = Paths.get(table, sub)
    df.write.parquet(dir.toString)
    val it = Files.list(dir)
    try it.iterator().asScala_()
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .map(n => s"$sub/$n").toSeq.sorted
    finally it.close()
  }

  private val MaxRetries = 20

  private def commitLoop(table: String, op: String, add: Seq[String],
      removeAt: Seq[Long] => Seq[String], schemaJson: String): Long = {
    var tries = 0
    while (tries < MaxRetries) {
      val base = versions(table)
      val next = base.lastOption.getOrElse(0L) + 1
      val c = Commit(next, op, add, removeAt(base), schemaJson)
      if (tryCommit(table, c)) return next
      tries += 1 // lost the race: rebase on the new latest and retry
    }
    throw new IllegalStateException(
      s"$op on $table failed after $MaxRetries optimistic retries")
  }

  /** Append: stages files, then commits. Appends commute, so losing the
    * version race just rebases the version number — no re-staging, no
    * data rewrite, exactly Delta's blind-append behavior. */
  def append(spark: SparkSession, table: String, df: DataFrame): Long = {
    val add = stage(df, table)
    commitLoop(table, "append", add, _ => Seq.empty, df.schema.json)
  }

  /** Overwrite: logically removes every file live at commit time and
    * adds the staged ones. The remove-set is recomputed against the
    * winner on each retry (last-writer-wins serialization). Old files
    * stay on disk for time travel until [[vacuum]]. */
  def overwrite(spark: SparkSession, table: String, df: DataFrame): Long = {
    val add = stage(df, table)
    commitLoop(table, "overwrite", add,
      base => base.lastOption.map(v => snapshotFiles(table, Some(v))._1)
        .getOrElse(Seq.empty),
      df.schema.json)
  }

  // ---- read path -------------------------------------------------------

  /** Snapshot read, optionally at a historical version. The file list
    * and schema are pinned at call time: concurrent commits cannot
    * change what this DataFrame reads (immutable files + logical
    * deletes = snapshot isolation for free). */
  def snapshot(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val (files, schemaJson) = snapshotFiles(table, version)
    schemaJson match {
      case None => throw new IllegalArgumentException(s"no such table: $table")
      case Some(sj) =>
        val schema = DataType.fromJson(sj).asInstanceOf[StructType]
        if (files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else
          spark.read.schema(schema)
            .parquet(files.map(f => s"$table/$f"): _*)
    }
  }

  /** Delete data files no snapshot ≥ `retainFrom` can reach, plus
    * orphaned stage files a crashed writer left behind. Never touches
    * the log, so `versions` stays contiguous; time travel BELOW
    * `retainFrom` becomes unreadable (exactly Delta's VACUUM trade). */
  def vacuum(table: String, retainFrom: Long): Seq[String] = {
    val keep = versions(table).filter(_ >= retainFrom)
      .flatMap(v => snapshotFiles(table, Some(v))._1).toSet
    val referenced = history(table).flatMap(_.add).toSet
    val root = Paths.get(table)
    val deleted = Seq.newBuilder[String]
    val it = Files.list(root)
    try it.iterator().asScala_()
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("stage-"))
      .foreach { dir =>
        val sub = dir.getFileName.toString
        val files = Files.list(dir)
        try files.iterator().asScala_().foreach { f =>
          val rel = s"$sub/${f.getFileName}"
          val isData = f.getFileName.toString.endsWith(".parquet")
          val orphan = isData && !referenced(rel) // crashed writer
          val expired = isData && referenced(rel) && !keep(rel)
          if (orphan || expired) { Files.delete(f); deleted += rel }
        } finally files.close()
      }
    finally it.close()
    deleted.result()
  }
}
