package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Semantics of the two r5 pipeline additions: PII redaction and
  * C4-style cross-document line dedup. */
class PiiLineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("PII patterns mask crafted strings exactly, in the load-bearing order") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org today"),
      (2L, "server 10.2.33.4 answered"),
      (3L, "call 555-0134 now"),
      (4L, "all three: a@b.co 1.2.3.4 555-9999"),
      (5L, "no pii here at all")).toDF("id", "t")
    val red = df.select(col("id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("t"), TextOps.PiiEmail, "<EMAIL>"),
          TextOps.PiiIp, "<IP>"),
        TextOps.PiiPhone, "<PHONE>").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "mail me at <EMAIL> today")
    assert(red(2L) == "server <IP> answered")
    assert(red(3L) == "call <PHONE> now")
    assert(red(4L) == "all three: <EMAIL> <IP> <PHONE>")
    assert(red(5L) == "no pii here at all")
  }

  test("docPiiScrub finds exactly the injected PII in every document") {
    val rows = TextOps.docPiiScrub(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"email count off for doc ${r.getLong(0)}")
      assert(r.getLong(2) == 1L, s"ip count off for doc ${r.getLong(0)}")
      assert(r.getLong(3) == 1L, s"phone count off for doc ${r.getLong(0)}")
    }
  }

  test("docLineDedup keeps a shared line only at its first occurrence") {
    val rows = TextOps.docLineDedup(spark, sf0001).collect()
    assert(rows.length == 500)
    val totalLines = rows.map(_.getLong(1)).sum
    val totalKept = rows.map(_.getLong(2)).sum
    // the synthetic corpus repeats 8-token runs across documents, so the
    // dedup must actually remove something — and never add
    assert(totalKept < totalLines, "no cross-document duplicate line removed")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // doc 0 can lose lines only to ITSELF (first doc in keeper order):
    // any line it loses must duplicate an earlier line of doc 0
    val d0 = rows.find(_.getLong(0) == 0L).get
    val d0Lines = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") === 0L)
      .select(regexp_replace(col("text"), "((\\S+ ){7}\\S+) ", "$1\n").as("lt"))
      .head().getString(0).split("\n")
    assert(d0.getLong(2) == d0Lines.distinct.length.toLong,
      "doc 0 must keep exactly its distinct lines")
  }

  test("plan budget: pii scrub is scan+sort; line dedup stays at 4 keyed shuffles") {
    // pii: map-side projection + the presentation sort's range
    // partitioning, plus (r12) ONE conditional spread exchange — the
    // regex pass is spread to scheduler width when the scan has fewer
    // splits than cores (single-file corpus at test SFs); at real scale
    // splits >> cores and spread inserts nothing, so the budget there
    // is still 1. A THIRD exchange would mean a genuine regression
    // (e.g. a window or join sneaking in).
    assert(countShuffles(TextOps.docPiiScrub(spark, sf0001)) <= 2)
    // line dedup: keeper groupBy, join probe, per-doc rebuild, final
    // sort — anything beyond that means a plan regression (e.g. a
    // window sneaking in a global sort)
    assert(countShuffles(TextOps.docLineDedup(spark, sf0001)) <= 5)
  }

  test("docDupSpanCoverage: verbatim duplicate docs are fully covered, bounds hold") {
    val rows = TextOps.docDupSpanCoverage(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nt, ng, cov, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cov <= nt && ng <= math.max(nt - 7, 0L) && ppm <= 1000000L,
        s"bounds broken for doc ${r.getLong(0)}")
      assert(ppm == cov * 1000000L / nt)
    }
    // full independent recomputation over the RAW STRINGS (no hashing,
    // no Spark) at this test SF: global 8-gram counts, then per-doc
    // covered-position union — every ppm must agree exactly
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val gramCount = scala.collection.mutable.Map[Seq[String], Int]()
    texts.foreach { case (_, ws) =>
      ws.sliding(8).filter(_.size == 8).foreach(g =>
        gramCount(g) = gramCount.getOrElse(g, 0) + 1)
    }
    val expected = texts.map { case (d, ws) =>
      val covered = scala.collection.mutable.Set[Int]()
      ws.sliding(8).filter(_.size == 8).zipWithIndex.foreach { case (g, i) =>
        if (gramCount(g) > 1) (i until i + 8).foreach(covered += _)
      }
      d -> covered.size.toLong * 1000000L / ws.size
    }.toMap
    rows.foreach(r => assert(r.getLong(4) == expected(r.getLong(0)),
      s"coverage_ppm mismatch for doc ${r.getLong(0)}"))
    // the signal must actually fire somewhere on this corpus
    assert(rows.exists(_.getLong(4) == 1000000L), "no fully-covered doc")
    assert(rows.exists(_.getLong(4) == 0L), "no clean doc")
  }

  test("docSplit: deterministic, exhaustive, roughly 80/10/10") {
    val a = TextOps.docSplit(spark, sf0001).collect()
    val b = TextOps.docSplit(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "not deterministic")
    val bySplit = a.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.values.sum == 500)
    assert(bySplit("train") > 350 && bySplit("train") < 450)
    assert(bySplit("valid") > 20 && bySplit("valid") < 80)
    assert(bySplit("test") > 20 && bySplit("test") < 80)
  }

  test("docPipelineKeep composes the signals with a deterministic drop reason") {
    val rows = TextOps.docPipelineKeep(spark, sf0001).collect()
    assert(rows.length == 500)
    val reasonOf = Seq(1 -> "quality", 2 -> "duplicate", 3 -> "dup_spans",
      4 -> "language")
    rows.foreach { r =>
      val bits = (1 to 4).map(r.getLong)
      assert(r.getLong(5) == bits.product, s"keep != product for ${r.getLong(0)}")
      val expected = reasonOf.find { case (i, _) => r.getLong(i) == 0L }
        .map(_._2).getOrElse("")
      assert(r.getString(6) == expected,
        s"drop_reason for doc ${r.getLong(0)}: got ${r.getString(6)}, want $expected")
    }
    // q_dedup must agree with the exact-dedup surface it composes
    val keepers = TextOps.exactDedup(spark, sf0001).collect()
      .map(_.getLong(2)).toSet
    rows.foreach(r => assert((r.getLong(2) == 1L) == keepers(r.getLong(0))))
    // every signal must fire somewhere, and some docs survive
    assert(rows.exists(_.getLong(5) == 1L))
    (1 to 4).foreach(i => assert(rows.exists(_.getLong(i) == 0L) ||
      i == 4, s"signal $i never fires")) // language may be all-identified
  }

  test("docLineDedup n_kept matches an independent window-rank recomputation") {
    // independent implementation of the same semantics: rank every
    // (line, doc_id, pos) occurrence by (doc_id, pos) per line with a
    // WINDOW (the op itself uses groupBy-min + join — different plan,
    // same answer), keep rank 1, count per doc
    val lines = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        posexplode(split(
          regexp_replace(col("text"), "((\\S+ ){7}\\S+) ", "$1\n"), "\n"))
          .as(Seq("pos", "line")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("line").orderBy("doc_id", "pos")
    val indep = lines.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TextOps.docLineDedup(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == indep.getOrElse(r.getLong(0), 0L),
        s"n_kept mismatch for doc ${r.getLong(0)}")
    }
  }
}
