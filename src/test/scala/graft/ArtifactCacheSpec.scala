package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.text.TextOps

/** r13 optimization-round internals: the artifact-frame cache
  * ([[DatasetCache.readArtifact]]) and the posting build's range-write
  * sizing guard. */
class ArtifactCacheSpec extends SparkSpec {

  test("readArtifact returns the cached resolved frame per (session, path)") {
    val dir = Files.createTempDirectory("artifact_cache").toString
    val s: SparkSession = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/t.parquet")
    Seq((3L, "c")).toDF("id", "v")
      .write.parquet(s"$dir/u.parquet")
    val a = DatasetCache.readArtifact(spark, s"$dir/t.parquet")
    val b = DatasetCache.readArtifact(spark, s"$dir/t.parquet")
    // the whole point: the SAME resolved DataFrame (schema + listing)
    // comes back, so no schema-inference / partition-discovery job
    // re-runs per invocation — while the DATA is still re-read (collect
    // sees the parquet rows, not a cached result)
    assert(a eq b, "second read must hit the per-session frame cache")
    assert(a.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val other = DatasetCache.readArtifact(spark, s"$dir/u.parquet")
    assert(!(other eq a), "different path must resolve its own frame")
    assert(other.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("posting-index build tolerates an empty corpus (NULL token sum)") {
    val dir = Files.createTempDirectory("posting_empty").toString
    val s: SparkSession = spark
    import s.implicits._
    // a zero-ROW (not zero-file) corpus: the filter keeps the write task
    // alive so a schema-carrying empty part file lands (a no-file dir
    // would fail at read in every round, not just this code path)
    Seq((0L, "x")).toDF("doc_id", "text").filter("doc_id < 0")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // sum(size(words)) over zero docs is NULL; the r13 range-write
    // sizing must read it as 0 tokens, not NPE. (Reading the resulting
    // file-less postings dir back is out of scope: a zero-row
    // partitionBy write lands no part files, so the consumer read
    // failed identically before r13.)
    TextOps.prebuildPostingIndex(spark, dir)
    val stats = spark.read.parquet(
      TextOps.postingIndexPath(spark, dir) + "/stats").head
    assert(stats.getLong(0) == 0L, "doc count must be 0")
    assert(stats.isNullAt(1), "token sum over zero docs is NULL")
  }
}
