package graft.lake

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Lake tables as a Spark SQL **catalog** — the pure-SQL addressing the
  * DSv2 `format("lake")` path can't give:
  *
  * {{{
  *   spark.sql.catalog.lake      = graft.lake.LakeCatalog
  *   spark.sql.catalog.lake.root = /data/lakes
  *
  *   SELECT * FROM lake.prod.orders                 -- /data/lakes/prod/orders
  *   SELECT * FROM lake.prod.orders VERSION AS OF 3 -- SQL time travel
  *   SELECT * FROM lake.prod.orders TIMESTAMP AS OF '2026-08-13 10:00:00'
  * }}}
  *
  * Identifiers map to directories under `root` (namespace segments are
  * path segments), and `VERSION AS OF` rides Spark's own time-travel
  * hook (`loadTable(ident, version)`), pinning the snapshot's file list
  * AND schema from the same log replay. Reads get everything the DSv2
  * table has (log-seeded file index, log-stats pruning in
  * `planInputPartitions`). `DELETE FROM` / `TRUNCATE TABLE` execute as
  * lake transactions ([[LakeV2Table]]'s `SupportsDeleteV2`); other
  * writes stay with the transactional API
  * ([[LakeTable.append]]/[[LakeSink]]) — unsupported DDL/DML through
  * the catalog is refused loudly, never silently non-atomic. */
class LakeCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"lake catalog `$name`: set spark.sql.catalog.$name.root=<dir>"))
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    (root +: (ident.namespace.toSeq :+ ident.name)).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    LakeTable.latestVersion(dirOf(ident)).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = Paths.get((root +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    val it = Files.list(d)
    try it.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        LakeTable.latestVersion(p.toString).isDefined)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally it.close()
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL `VERSION AS OF v` lands here (Spark's time-travel hook). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v =
      try version.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"lake: VERSION AS OF takes a commit version (long), got `$version`") }
    load(ident, Some(v))
  }

  /** SQL `TIMESTAMP AS OF t` (Spark passes epoch MICROseconds): resolve
    * to the latest commit at or before `t` from the wall-clock recorded
    * IN the commit records ([[LakeTable.versionAtTimestamp]] — log
    * state, not file mtime, and monotonized against writer clock skew).
    * Tables whose logs predate recorded timestamps refuse rather than
    * guess. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val v = LakeTable.versionAtTimestamp(dirOf(ident),
      Math.floorDiv(timestamp, 1000L))
    load(ident, Some(v))
  }

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val dir = dirOf(ident)
    val latest = LakeTable.latestVersion(dir).getOrElse(
      throw new NoSuchTableException(ident))
    version.foreach(v => require(v >= 1 && v <= latest,
      s"lake: ${ident} has versions 1..$latest, not $v"))
    val pinned = version.orElse(Some(latest))
    val schema = DataType.fromJson(
      LakeTable.snapshotFiles(dir, pinned)._2.getOrElse(
        throw new NoSuchTableException(ident))).asInstanceOf[StructType]
    val opts = new CaseInsensitiveStringMap(Map("path" -> dir).asJava)
    new LakeV2Table(SparkSession.active, opts, dir, pinned, schema)
  }

  private def refuseDdl(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"lake catalog: $what is not supported — tables are managed by the " +
        "transactional API (LakeTable.append/overwrite/merge/delete, LakeSink)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    refuseDdl("CREATE TABLE")

  /** `ALTER TABLE lake.ns.t ADD COLUMN x TYPE` / `DROP COLUMN x` run as
    * metadata-only lake commits ([[LakeTable.addColumn]] /
    * [[LakeTable.dropColumn]]); every other table change refuses. Only
    * TOP-LEVEL single-name columns, no position clauses — each would
    * silently diverge from the lake's evolution rules if
    * half-translated. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (LakeTable.latestVersion(dir).isEmpty) throw new NoSuchTableException(ident)
    changes.foreach {
      // NOT NULL would silently commit as nullable (old files null-fill
      // added columns, so the constraint is unenforceable) — refuse
      // rather than half-translate, like every other unsupported shape
      case a: TableChange.AddColumn if !a.isNullable() =>
        refuseDdl("ALTER TABLE ADD COLUMN ... NOT NULL (existing rows " +
          "null-fill added columns, so the constraint cannot hold)")
      case a: TableChange.AddColumn
          if a.fieldNames.length == 1 && a.position() == null =>
        LakeTable.addColumn(dir, a.fieldNames.head, a.dataType())
      case d: TableChange.DeleteColumn if d.fieldNames.length == 1 =>
        LakeTable.dropColumn(SparkSession.active, dir, d.fieldNames.head)
      case other => refuseDdl(s"ALTER TABLE change ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = refuseDdl("DROP TABLE")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    refuseDdl("RENAME TABLE")
}
