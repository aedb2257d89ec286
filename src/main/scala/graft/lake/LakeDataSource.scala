package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The ACID lake as a first-class Spark DSv2 table:
  * `spark.read.format("lake").load(tableDir)`, with time travel via
  * `.option("versionAsOf", v)` — mirroring how the reference registers
  * every source as a queryable table (pc-io/src/las/mod.rs:92-126,
  * pc-cli/src/benchmark.rs:73-80) rather than a library-only API.
  *
  * Architecture: the table extends Spark's own `FileTable` and delegates
  * scan building to `ParquetScanBuilder`, so column pruning, parquet
  * filter pushdown (row-group skipping), and the vectorized reader all
  * come from the engine. The lake-specific part is [[LakeFileIndex]]: a
  * file index seeded from the TRANSACTION LOG's snapshot (not a
  * directory listing — staged-but-uncommitted files are invisible, and
  * the file set is pinned at load time for snapshot isolation) that
  * applies LOG-STATS file pruning inside `listFiles`, which is what the
  * scan's `planInputPartitions` consults with the pushed data filters.
  * A plain `WHERE price BETWEEN ...` therefore skips every file whose
  * log min/max excludes the range — no footer reads, no file opens —
  * the data-skipping read path a Delta reader gets from its log. */
class LakeDataSource extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider {

  override def shortName(): String = "lake"

  // -- streaming source (readStream.format("lake")): v1 Source API, the
  // route Delta's own streaming source takes, so getBatch can serve each
  // version range through the ordinary vectorized parquet read path
  override def sourceSchema(sqlContext: org.apache.spark.sql.SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("lake", inferSchema(new CaseInsensitiveStringMap(parameters.asJava)))

  override def createSource(sqlContext: org.apache.spark.sql.SQLContext,
      metadataPath: String, schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val options = new CaseInsensitiveStringMap(parameters.asJava)
    new LakeStreamSource(sqlContext.sparkSession, tableRoot(options),
      schema.getOrElse(inferSchema(options)),
      Option(options.get("startingVersion")).map(_.toLong).getOrElse(0L),
      Option(options.get("maxVersionsPerBatch")).map(_.toLong))
  }

  private def tableRoot(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("lake source: no table path given"))
    require(!p.trim.startsWith("["),
      "lake source: exactly one table path (multi-path load is not a lake table)")
    p
  }

  private def versionOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("versionAsOf")).map(_.toLong)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, schemaJson) =
      LakeTable.snapshotFiles(tableRoot(options), versionOf(options))
    DataType.fromJson(schemaJson.getOrElse(throw new IllegalArgumentException(
      s"no such lake table: ${tableRoot(options)}"))).asInstanceOf[StructType]
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val root = tableRoot(options)
    // pin the CONCRETE version now: every later read of this table object
    // (schema, file list, stats) replays the same snapshot even if
    // writers keep committing — snapshot isolation at the table level.
    // The schema is re-derived FROM the pinned version rather than taken
    // from the earlier inferSchema call: a commit racing between the two
    // would otherwise pair version-N+1 files with the version-N schema
    // (silent null-fill after an overwrite that changed columns)
    val version = versionOf(options).orElse(LakeTable.latestVersion(root))
    val pinnedSchema = DataType.fromJson(
      LakeTable.snapshotFiles(root, version)._2.getOrElse(
        throw new IllegalArgumentException(s"no such lake table: $root")))
      .asInstanceOf[StructType]
    new LakeV2Table(SparkSession.active, options, root, version, pinnedSchema)
  }

  override def supportsExternalMetadata(): Boolean = false
}

class LakeV2Table(spark: SparkSession, options: CaseInsensitiveStringMap,
    root: String, version: Option[Long], tableSchema: StructType)
    extends FileTable(spark, options, Seq.empty, Some(tableSchema)) {

  /** (relative path, stats) of the pinned snapshot. */
  private val entries: Seq[(String, String)] =
    LakeTable.snapshotFilesWithStats(root, version)._1

  /** A deletion-vector entry cannot be expressed as a bare file scan —
    * reading the data file raw would RESURRECT deleted rows, so the
    * BATCH scan refuses loudly rather than return wrong data. Checked in
    * [[newScanBuilder]], NOT the constructor: `readStream` probes the
    * TableProvider (constructing this table) before falling back to the
    * v1 streaming source, and the stream serves append commits only — a
    * constructor check would kill legitimate streams over DV-carrying
    * tables. */
  private def requireNoDvEntries(): Unit =
    require(entries.forall(e => LakeTable.parseEntry(e._1).dv.isEmpty),
      s"lake: snapshot of $root${version.fold("")(v => s"@v$v")} carries " +
        "deletion vectors, which the DSv2 scan does not apply; read it via " +
        "LakeTable.snapshot(...) or compact with LakeTable.optimize(...)")

  override def name(): String = s"lake:$root${version.fold("")(v => s"@v$v")}"

  override def formatName: String = "lake"

  override def fallbackFileFormat: Class[_ <: org.apache.spark.sql.execution.datasources.FileFormat] =
    classOf[ParquetFileFormat]

  override def inferSchema(files: Seq[org.apache.hadoop.fs.FileStatus]): Option[StructType] =
    Some(tableSchema)

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new LakeFileIndex(spark, root, entries, tableSchema)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    requireNoDvEntries()
    ParquetScanBuilder(spark, fileIndex, schema, dataSchema, mergedOptions(o))
  }

  /** Writes go through the transactional API ([[LakeTable.append]] /
    * [[LakeSink]]) — a bare file write could not be atomic. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    throw new UnsupportedOperationException(
      "lake: write via LakeTable.append/overwrite or stream via LakeSink " +
        "(a plain file write would bypass the transaction log)")
}

/** File index seeded from the lake log snapshot. `listFiles` receives
  * the pushed data filters as catalyst predicates and drops every file
  * whose log min/max cannot contain a matching row — the same interval
  * test as `LakeTable.pruneByStats`, applied where `FileScan.partitions`
  * (and hence `planInputPartitions`) gets its file list. */
class LakeFileIndex(spark: SparkSession, root: String,
    entries: Seq[(String, String)], schema: StructType)
    extends InMemoryFileIndex(
      spark,
      entries.map { case (rel, _) => new Path(s"$root/$rel") },
      Map.empty[String, String],
      Some(schema)) {

  /** Stats keyed the way the log stores files: `stage-sub/name`. */
  private val statsByRel: Map[String, String] = entries.toMap

  private def relOf(p: Path): String = s"${p.getParent.getName}/${p.getName}"

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, Seq.empty)
    val bounds = LakeStatsPruning.constraints(dataFilters)
    if (bounds.isEmpty) base
    else base.map { pd =>
      pd.copy(files = pd.files.filter(f =>
        LakeStatsPruning.mayMatch(bounds,
          statsByRel.getOrElse(relOf(f.getPath), ""))))
    }.filter(_.files.nonEmpty)
  }
}

/** Catalyst-predicate → per-column interval extraction for log-stats
  * pruning. Deliberately conservative: only simple `col <op> literal`
  * conjuncts on numeric columns contribute bounds (each element of
  * `dataFilters` is one conjunct, so collecting across the Seq is an
  * AND); anything unrecognized contributes nothing and the file is
  * kept. Strict bounds are widened to inclusive — pruning may keep a
  * borderline file, never drop a matching one. */
object LakeStatsPruning {

  /** (column, lower, upper) — None = unbounded on that side. */
  type Bound = (String, Option[BigDecimal], Option[BigDecimal])

  private def attrName(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case Cast(a: Attribute, _, _, _) => Some(a.name)
    case _ => None
  }

  private def litValue(e: Expression): Option[BigDecimal] = e match {
    case Literal(v, _) => v match {
      case null => None
      case b: Byte => Some(BigDecimal(b.toInt))
      case s: Short => Some(BigDecimal(s.toInt))
      case i: Int => Some(BigDecimal(i))
      case l: Long => Some(BigDecimal(l))
      case f: Float => if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.toDouble))
      case d: Double => if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
      case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
      case _ => None
    }
    case _ => None
  }

  def constraints(filters: Seq[Expression]): Seq[Bound] =
    filters.flatMap(constraintsOf)

  private def constraintsOf(e: Expression): Seq[Bound] = e match {
    case And(l, r) => constraintsOf(l) ++ constraintsOf(r)
    case GreaterThan(a, v) => bound(a, v, lower = true)
    case GreaterThanOrEqual(a, v) => bound(a, v, lower = true)
    case LessThan(a, v) => bound(a, v, lower = false)
    case LessThanOrEqual(a, v) => bound(a, v, lower = false)
    case EqualTo(a, v) =>
      bound(a, v, lower = true) ++ bound(a, v, lower = false)
    case _ => Seq.empty
  }

  /** Normalize `attr op lit` / `lit op attr` into a one-sided bound. */
  private def bound(l: Expression, r: Expression, lower: Boolean): Seq[Bound] =
    (attrName(l), litValue(r), attrName(r), litValue(l)) match {
      case (Some(a), Some(v), _, _) =>
        Seq(if (lower) (a, Some(v), None) else (a, None, Some(v)))
      case (_, _, Some(a), Some(v)) => // literal on the left: flip the side
        Seq(if (lower) (a, None, Some(v)) else (a, Some(v), None))
      case _ => Seq.empty
    }

  /** Can a file with `stats` contain a row satisfying ALL bounds?
    * A column with no usable stats never prunes. */
  def mayMatch(bounds: Seq[Bound], stats: String): Boolean =
    bounds.forall { case (column, lo, hi) =>
      LakeTable.statsRange(stats, column).forall { case (mn, mx) =>
        hi.forall(mn <= _) && lo.forall(_ <= mx)
      }
    }
}
