package graft

import org.apache.spark.sql.functions._

/** Deterministic scale-up fixture generator for scale-stress runs:
  * materializes N key-shifted copies of a base SF directory's
  * relational tables (`ScaleGen <srcDir> <outDir> [copies=10]`).
  *
  * Every join key is shifted by `copy * 10_000_000`, so the copies are
  * disjoint universes with IDENTICAL per-key distributions — exactly
  * what stressing join/aggregation plans one order of magnitude up
  * needs: table cardinalities, join fan-outs and group counts all
  * scale by N while per-key skew, date ranges, and categorical mixes
  * (brands, segments, statuses) stay bit-identical to the base SF.
  * The fixed-cardinality dimensions (`nation`, `region`) are copied
  * unshifted — they do not grow with SF, which is precisely the
  * property the broadcast-hint policy in [[graft.rel.RelQueries]]
  * keys on.
  */
object ScaleGen {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val copies = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    require(copies >= 1 && copies * Off < (1L << 40), s"bad copies: $copies")
    val spark = LocalSession("32")

    def shifted(t: String, keyCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      // the disjoint-universe promise requires every base key < Off —
      // a larger base (≳ TPC-H sf10) would silently collide keys
      // across copies, corrupting every scale-stress conclusion
      val maxes = df.agg(max(keyCols.head),
        keyCols.tail.map(k => max(col(k))): _*).head()
      keyCols.zipWithIndex.foreach { case (k, i) =>
        require(maxes.getLong(i) < Off,
          s"scalegen: $t.$k max ${maxes.getLong(i)} >= shift $Off — " +
            "copies would collide; raise Off for this base size")
      }
      val fan = spark.range(copies).select(col("id").as("_copy"))
      val wide = keyCols.foldLeft(df.crossJoin(fan)) { (d, k) =>
        d.withColumn(k, col(k) + col("_copy") * Off)
      }
      // one output shard per copy: an N×-bigger corpus arrives as N×
      // the shards, so scans must parallelize N× wider too — a single
      // coalesced file would serialize every downstream scan into ONE
      // input partition and measure the fixture, not the plan
      wide.repartitionByRange(copies, col("_copy")).drop("_copy")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"scalegen: $t x$copies")
    }
    def copied(t: String): Unit = {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"scalegen: $t (fixed cardinality, unshifted)")
    }

    shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    shifted("orders", Seq("o_orderkey", "o_custkey"))
    shifted("customer", Seq("c_custkey"))
    shifted("supplier", Seq("s_suppkey"))
    shifted("part", Seq("p_partkey"))
    copied("nation")
    copied("region")

    // documents: shift doc_id AND tag every token with the copy id —
    // the text twin of key-shifting. Within a copy the dup/shingle/line
    // structure is bit-identical to the base SF; across copies the
    // token universes are DISJOINT, so no cross-copy exact/near-dup
    // pairs exist and the candidate-pair workload scales linearly with
    // the data like a real N×-bigger corpus (naively duplicating the
    // text instead would grow pair counts quadratically in N — a skew
    // test, not a scale test).
    locally {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val maxDoc = docs.agg(max("doc_id")).head.getLong(0)
      require(maxDoc < Off,
        s"scalegen: documents.doc_id max $maxDoc >= shift $Off — " +
          "copies would collide; raise Off for this base size")
      val fan = spark.range(copies).select(col("id").as("_copy"))
      docs.crossJoin(fan)
        .withColumn("text",
          expr("array_join(transform(split(text, ' '), w -> concat(w, '_', _copy)), ' ')"))
        .withColumn("doc_id", col("doc_id") + col("_copy") * Off)
        .withColumn("n_chars", length(col("text")))
        .repartitionByRange(copies, col("_copy")) // shard-per-copy, as above
        .drop("_copy")
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      println(s"scalegen: documents x$copies (copy-tagged tokens)")
    }
    // embeddings: vec_id shift only — identical vectors across copies
    // cost top-k searches linearly (k is fixed), and codebook training
    // sees the same distribution
    shifted("embeddings", Seq("vec_id"))
    // events: disjoint user universes per copy; the time range stays the
    // base SF's, so windows/sessions see 10x events, not a longer span
    shifted("events", Seq("event_id", "user_id"))
    spark.stop()
  }
}
