package graft

import org.apache.spark.sql.SparkSession

/** Keys and cleanup for the path-keyed derived-artifact caches (shingle
  * index, ANN/IVF layouts, IVF codebooks). Two hygiene rules:
  *
  *  - cache keys carry an input snapshot marker (mtime + length), so a
  *    dataset REWRITTEN at the same path within one JVM re-derives its
  *    artifacts instead of serving stale ones;
  *  - derived temp layouts register for recursive deletion at JVM exit
  *    (`deleteOnExit` alone cannot remove non-empty directories).
  */
object DatasetCache {

  /** Cache key for artifacts derived from `dir/table`. For a dataset
    * DIRECTORY the marker hashes the sorted child (name, mtime, length)
    * list — a directory's own status is useless as a snapshot (length 0
    * everywhere; object stores synthesize mtime 0 for prefixes, and
    * local-FS dir mtime has coarse granularity). */
  def snapshotKey(spark: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val marker =
      if (!st.isDirectory) s"${st.getModificationTime}:${st.getLen}"
      else {
        val kids = fs.listStatus(p)
          .map(k => s"${k.getPath.getName}:${k.getModificationTime}:${k.getLen}")
          .sorted.mkString("|")
        java.util.UUID.nameUUIDFromBytes(kids.getBytes("UTF-8")).toString
      }
    s"$dir/$table@$marker"
  }

  private val tempDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val installHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempDirs.forEach { d =>
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(d))
      }
    }))

  /** Register a derived temp directory for exit-time cleanup. */
  def registerTempDir(path: String): String = {
    installHook
    tempDirs.add(path)
    path
  }

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** `spark.read.parquet(path)` with the inferred schema CACHED per
    * (path, input snapshot) — r12 optimization round: schema inference
    * runs a 1-task Spark job (footer read) on EVERY `read.parquet`
    * call, so a query joining five tables paid five ~30 ms driver
    * round-trips per invocation before any real work (profiled:
    * rel_mkt_share spent its first 150 ms on five such jobs, re-paid in
    * each of the bench's three timed runs). Passing the cached schema
    * skips the job; the snapshot marker (mtime+length, the
    * [[snapshotKey]] discipline) re-infers when the dataset is
    * rewritten. Column METADATA rides in the schema, so readers that
    * tag columns (PC metadata) are unaffected. */
  def readTable(spark: SparkSession, dir: String, table: String): org.apache.spark.sql.DataFrame = {
    val path = s"$dir/$table"
    val schema = schemaCache.computeIfAbsent(
      snapshotKey(spark, dir, table),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Spread a CPU-heavy map stage when the input has fewer splits than
    * the cluster has cores (small files, single-row-group parquet — a
    * 1-row-group file is always 1 task no matter how wide the cluster).
    * Identity whenever splits already cover the cores, so at real scale
    * (input splits >> cores) no shuffle is added; the guard reads only
    * plan metadata, it runs no job. Callers pass a PROJECTED frame so
    * the spread moves only the columns the stage consumes. */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
