package graft.lake

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom data skipping for POINT predicates on
  * high-cardinality columns — the pruning class min/max range stats
  * cannot serve: a hash-distributed id column spans the full value
  * domain in EVERY file, so range pruning keeps everything while a
  * Bloom filter prunes all but the true file(s) (± fpp). Delta ships
  * the same feature as its bloom-filter index.
  *
  * The index is a directory of per-file sidecars
  * (`table/_bloom/<column>/<fileId>`), each the serialized
  * `org.apache.spark.util.sketch.BloomFilter` over that file's RAW
  * PHYSICAL 64-bit value hashes — deletion vectors deliberately NOT
  * applied at build time, so the filter over-approximates EVERY
  * snapshot of the immutable file. That is what makes the
  * version-agnostic probe in [[LakeFileIndex.listFiles]] safe: a
  * `versionAsOf` read of a snapshot predating a DV still probes
  * positive for the value the DV later masked (hashing DV-applied rows
  * would be a false negative for exactly that time-travel read).
  * Correctness leans on the log's file IMMUTABILITY (every verb
  * adds/removes whole entries, never edits a file in place): a sidecar
  * can never go stale, files added after the build simply have no
  * sidecar and are scanned conservatively, and a DV — whenever added —
  * only makes the filter over-approximate; Bloom filters have no false
  * negatives, and the row-level predicate after the scan stays exact.
  * Sidecars are advisory metadata: no log commit; a crash mid-build
  * leaves a partial index that is correct for the files it covers.
  *
  * Values bloom through ONE uniform path — `xxhash64` of the column
  * (integrals cast to LONG first so int/long spellings of the same id
  * hash identically) — so the probe side reproduces the exact hash
  * with a driver-side `XxHash64.eval` on the literal: no type-support
  * gaps, no false negatives, the hash-collision contribution to the
  * false-positive rate is negligible against `fpp`.
  *
  * Scale shape: the build is one distributed aggregation
  * (`graft_bloom_agg` keyed by the scan-bound provenance column —
  * stable across shuffles, unlike `input_file_name`), and sidecars
  * stream to disk via `toLocalIterator`, so the driver holds ONE
  * filter at a time. Query-time pruning streams each candidate's
  * sidecar (kilobytes), tests, discards: O(files) tiny reads replace
  * scanning the data.
  */
object BloomIndex {

  /** Versioned index root: `_bloom2` marks sidecars written under the
    * INJECTIVE `~`-escaped naming. The retired `_bloom` root used a
    * non-injective `/`→`~` mapping, so a legacy sidecar for rel `a/sX`
    * shares a file name with the new-format sidecar for `a/X` — probed
    * through the new naming it could prune the WRONG file (a Bloom
    * false negative, the one failure class the design forbids).
    * Versioning the root makes legacy files unreachable by
    * construction; [[build]] additionally purges any legacy root. */
  val IndexRoot = "_bloom2"

  private def indexDir(table: String, column: String): Path =
    Paths.get(table, IndexRoot, column)

  /** Injective flattening of a data entry's REL path (`stage-sub/name`)
    * to a sidecar file name: `~` escapes first (`~` → `~~`, `/` → `~s`)
    * so `a/b~c` and `a~b/c` cannot collide on one sidecar — a shared
    * filter would prune incorrectly for one of the two files. */
  private[lake] def sidecarName(rel: String): String =
    rel.replace("~", "~~").replace("/", "~s")

  /** Sidecar file for a data entry's REL path. */
  private def sidecar(table: String, column: String, rel: String): Path =
    indexDir(table, column).resolve(sidecarName(rel))

  /** Delete a retired non-injective `_bloom` root wholesale: its
    * sidecars are advisory (removal can only un-prune) and were written
    * under a naming that cannot be trusted per-file. Returns the number
    * of filesystem entries removed (0 when no legacy root exists) so
    * callers can surface the purge — vacuum deleting an unrecognized
    * directory tree must be observable. */
  private[lake] def purgeLegacyRoot(table: String): Int = {
    val legacy = Paths.get(table, "_bloom")
    if (!Files.isDirectory(legacy)) 0
    else {
      import scala.jdk.CollectionConverters._
      val all = Files.walk(legacy)
      try all.iterator().asScala.toSeq.reverseIterator
        .count(Files.deleteIfExists(_))
      finally all.close()
    }
  }

  /** The uniform 64-bit value hash, as a COLUMN (build side). */
  private def hashCol(f: StructField): org.apache.spark.sql.Column =
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        xxhash64(col(f.name).cast(LongType))
      case StringType => xxhash64(col(f.name))
      case other => throw new IllegalArgumentException(
        s"bloom index on `${f.name}`: $other is not an integral or " +
          "string column (point-lookup skipping targets id-like keys)")
    }

  /** The same hash, computed driver-side for the probe literal. */
  private def hashValue(f: StructField, value: Any): Long = {
    val lit = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType => value match {
        case n: Number => Literal(n.longValue(), LongType)
        case other => throw new IllegalArgumentException(
          s"bloom probe on `${f.name}`: $other is not numeric")
      }
      case StringType => Literal.create(value.toString, StringType)
      case other => throw new IllegalArgumentException(
        s"bloom probe on `${f.name}`: unsupported type $other")
    }
    // seed 42L = the xxhash64() SQL function's default seed
    XxHash64(Seq(lit), 42L).eval(null).asInstanceOf[Long]
  }

  private def resolve(schema: StructType, column: String): StructField =
    schema.fields.find(_.name == column)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(column)))
      .getOrElse(throw new IllegalArgumentException(
        s"bloom index: no such column `$column`"))

  /** Build (or extend) the index for `column`: one sidecar per live
    * data file that does not have one yet. `expectedItemsPerFile` sizes
    * each filter (Spark's defaults give ~1.2 MB per million items at
    * 3% fpp). Returns the number of sidecars written. Incremental by
    * construction: re-running after appends blooms ONLY the new files. */
  def build(spark: SparkSession, table: String, column: String,
      expectedItemsPerFile: Long = 1000000L): Int = {
    val (all, schemaJson) = LakeTable.snapshotFilesWithStats(table, None)
    val schema = DataType.fromJson(schemaJson.getOrElse(
      throw new IllegalArgumentException(s"no such lake table: $table")))
      .asInstanceOf[StructType]
    val f = resolve(schema, column)
    graft.text.TextOps.registerBloomFns(spark)
    purgeLegacyRoot(table)
    Files.createDirectories(indexDir(table, f.name))
    // only files not yet bloomed: the build is append-incremental
    val todo = all.map(_._1)
      .filter(e => !Files.exists(
        sidecar(table, f.name, LakeTable.parseEntry(e).data)))
    if (todo.isEmpty) return 0
    // RAW physical rows: see the class doc — the filter must cover
    // every snapshot of the file, including ones predating current DVs
    val perFile = LakeTable
      .readEntriesRawWithRel(spark, table, todo, schema)
      .select(col(LakeTable.RelCol).as("rel"), hashCol(f).as("h"))
      .groupBy("rel")
      .agg(call_function("graft_bloom_agg", col("h"),
        lit(expectedItemsPerFile)).as("bloom"))
    var n = 0
    val it = perFile.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      Files.write(sidecar(table, f.name, r.getString(0)),
        r.getAs[Array[Byte]](1))
      n += 1
    }
    n
  }

  /** Planning-time survivor test for `column = value`, used by the DSv2
    * [[LakeFileIndex]]: None when the column has no index directory (the
    * common case — zero per-file cost), otherwise a predicate on the
    * file's REL path. Files without a sidecar always survive. The hash
    * is computed once per (column, value); each candidate's sidecar is
    * read, tested, and discarded — kilobytes per file at planning vs
    * scanning the file's data. */
  private[lake] def pointTest(table: String, f: StructField, value: Any)
      : Option[String => Boolean] = {
    if (!Files.isDirectory(indexDir(table, f.name))) return None
    val h =
      try hashValue(f, value)
      catch { case _: IllegalArgumentException => return None }
    Some { rel =>
      val sc = sidecar(table, f.name, rel)
      !Files.exists(sc) || BloomFilter.readFrom(
        new ByteArrayInputStream(Files.readAllBytes(sc))).mightContainLong(h)
    }
  }

  /** Live entries that MIGHT contain `column = value`, plus the total —
    * the file-skipping decision a point query plans from. Entries
    * without a sidecar never prune (conservative). */
  def prunedFilesPoint(table: String, column: String, value: Any)
      : (Seq[String], Int) = {
    val (all, schemaJson) = LakeTable.snapshotFilesWithStats(table, None)
    val schema = DataType.fromJson(schemaJson.getOrElse(
      throw new IllegalArgumentException(s"no such lake table: $table")))
      .asInstanceOf[StructType]
    val f = resolve(schema, column)
    val h = hashValue(f, value)
    val kept = all.map(_._1).filter { e =>
      val sc = sidecar(table, f.name, LakeTable.parseEntry(e).data)
      !Files.exists(sc) || {
        val bloom = BloomFilter.readFrom(
          new ByteArrayInputStream(Files.readAllBytes(sc)))
        bloom.mightContainLong(h)
      }
    }
    (kept, all.size)
  }

  /** Point-lookup snapshot read: scan ONLY the bloom-surviving files
    * (plus the exact row filter — Bloom false positives cannot leak). */
  def snapshotPoint(spark: SparkSession, table: String, column: String,
      value: Any): DataFrame = {
    val (_, schemaJson) = LakeTable.snapshotFilesWithStats(table, None)
    val schema = DataType.fromJson(schemaJson.get).asInstanceOf[StructType]
    val f = resolve(schema, column)
    val (kept, _) = prunedFilesPoint(table, f.name, value)
    if (kept.isEmpty)
      return LakeTable.readEntries(spark, table, Seq.empty, schema)
        .filter(col(f.name) === lit(value))
    LakeTable.readEntries(spark, table, kept, schema)
      .filter(col(f.name) === lit(value))
  }
}
