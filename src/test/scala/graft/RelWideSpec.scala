package graft

import org.apache.spark.sql.functions._
import graft.rel.RelQueries
import graft.events.EventOps
import graft.text.TextOps

/** Semantic + plan-shape checks for the round-4 wide relational surface
  * (Q7/Q10/Q13/Q14/Q15/Q19 twins, CUBE, window top-k, winnowing).
  * Cross-engine value equality is the oracle's job; these specs pin the
  * invariants the oracle can't see (internal consistency, plan shape). */
class RelWideSpec extends SparkSpec {

  test("nationPairs covers only the filtered ship years and real nations") {
    val rows = RelQueries.nationPairs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val years = rows.map(_.getLong(2)).toSet
    assert(years.subsetOf(Set(1996L, 1997L)))
    val nations = spark.read.parquet(s"$sf0001/nation.parquet")
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet.subsetOf(nations))
    assert(rows.map(_.getString(1)).toSet.subsetOf(nations))
    // revenue splits exactly: pair totals sum to the unpaired total
    val total = RelQueries.nationPairs(spark, sf0001)
      .agg(sum("revenue_units")).collect()(0).getLong(0)
    val direct = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))))
      .collect()(0).getLong(0)
    assert(total == direct)
  }

  test("topReturned returns exactly k rows in descending revenue order") {
    val rows = RelQueries.topReturned(spark, sf001).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getLong(4))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("topSupplier returns the true argmax (ties included)") {
    val df = RelQueries.topSupplier(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val winners = rows.map(_.getLong(2)).toSet
    assert(winners.size == 1) // all returned rows carry the max revenue
    // recompute the max independently
    val expected = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("r"))
      .agg(max("r")).collect()(0).getLong(0)
    assert(winners.head == expected)
  }

  test("orderCountHist conserves customers and counts the zero-order bucket") {
    val hist = RelQueries.orderCountHist(spark, sf0001).collect()
    val nCust = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(hist.map(_.getLong(1)).sum == nCust)
    val zeroBucket = hist.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    val custWithOrders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(zeroBucket == nCust - custWithOrders)
  }

  test("partBands equals the sum of its three disjoint conjunctive bands") {
    def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Long = {
      val parts = spark.read.parquet(s"$sf0001/part.parquet")
        .filter(col("p_brand") === brand && col("p_size").between(1, sizeHi))
        .select("p_partkey")
      spark.read.parquet(s"$sf0001/lineitem.parquet")
        .filter(col("l_quantity").between(qLo, qHi))
        .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
        .count()
    }
    val cnt = RelQueries.partBands(spark, sf0001).collect()(0).getLong(0)
    assert(cnt == band("Brand#1", 15, 1, 15) + band("Brand#2", 25, 10, 25) +
      band("Brand#3", 50, 25, 40))
  }

  test("promoShare ppm is a true integer share") {
    // promo/total cross the boundary as STRING (DECIMAL kept internal
    // since the r10 100x sweep caught the int64 ppm numerator overflow)
    val r = RelQueries.promoShare(spark, sf001).collect()(0)
    val (promo, total, ppm) =
      (BigInt(r.getString(0)), BigInt(r.getString(1)), r.getLong(2))
    assert(promo >= 0 && promo <= total)
    assert(BigInt(ppm) == promo * 1000000 / total)
  }

  test("events cube margins are consistent with the grand total") {
    val rows = EventOps.cubeByHour(spark, sf0001).collect()
    val grand = rows.filter(_.getLong(2) == 3L)
    assert(grand.length == 1)
    val total = grand(0).getLong(3)
    // each grouping set's counts sum to the grand total
    for (gid <- Seq(0L, 1L, 2L))
      assert(rows.filter(_.getLong(2) == gid).map(_.getLong(3)).sum == total)
  }

  test("docTopPerSource keeps at most k per source and pushes a group limit") {
    val df = TextOps.docTopPerSource(3)(spark, sf001)
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length <= 3))
    assert(rows.forall(_.getLong(3) <= 3L))
    // scale shape: the rank filter must run as WindowGroupLimit (a per-
    // partition top-k heap BEFORE the shuffle), not a post-window filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("pivot/unpivot round-trips to the hourly rollup") {
    val back = EventOps.unpivotByType(spark, sf0001)
      .select("hour_id", "event_type", "cnt")
    val rollup = EventOps.hourlyRollup(spark, sf0001)
      .select("hour_id", "event_type", "cnt")
    assert(back.exceptAll(rollup).isEmpty && rollup.exceptAll(back).isEmpty)
  }

  test("value deciles are equi-depth with monotone bounds") {
    val rows = EventOps.valueDeciles(spark, sf0001).collect()
    for ((_, rs) <- rows.groupBy(_.getString(0))) {
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 10L))
      val counts = sorted.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"not equi-depth: ${counts.toSeq}")
      // bounds are internally ordered and monotone across buckets
      // (ties can share a boundary value, so <= not <)
      sorted.foreach(r => assert(r.getLong(3) <= r.getLong(4)))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(3) <= b.getLong(3) && a.getLong(4) <= b.getLong(4))
      case _ => ()
      }
    }
  }

  test("dense hourly grid is complete and conserves event counts") {
    val rows = EventOps.denseHourly(spark, sf0001).collect()
    val hours = rows.map(_.getLong(0)).distinct.sorted
    val types = rows.map(_.getString(1)).distinct
    assert(rows.length == hours.length * types.length, "grid has holes")
    assert(hours.zip(hours.tail).forall { case (a, b) => b == a + 1 },
      "hour axis is not dense")
    val total = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("feed reconcile (full outer) conserves both sides") {
    val rows = EventOps.purchaseVsErrorHourly(spark, sf0001).collect()
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    assert(rows.map(_.getLong(1)).sum ==
      ev.filter(col("event_type") === "purchase").count())
    assert(rows.map(_.getLong(2)).sum ==
      ev.filter(col("event_type") === "error").count())
    // full-outer actually matters: some hours are one-sided
    assert(rows.exists(r => r.getLong(1) == 0L || r.getLong(2) == 0L))
  }

  test("set ops: overlap terms appear in both slices, except days have no purchase") {
    val overlap = TextOps.vocabOverlap("en", "de")(spark, sf0001)
      .collect().map(_.getString(0)).toSet
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def vocab(l: String) = docs.filter(col("lang") === l)
      .select(explode(split(col("text"), " ")).as("t"))
      .collect().map(_.getString(0)).toSet
    assert(overlap.nonEmpty && overlap.subsetOf(vocab("en") intersect vocab("de")))
    val noBuy = EventOps.clickNoBuyDays(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val buyDays = EventOps.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts div ${EventOps.NsPerDay}").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noBuy.nonEmpty && noBuy.intersect(buyDays).isEmpty)
  }

  test("winnow pairs recall the ngram near-duplicate pairs") {
    // the winnowing guarantee: any shared run of w+k-1 tokens yields a
    // shared fingerprint — so at minShared=1 every high-jaccard shingle
    // pair must surface as a winnow candidate. minShared=2 (the
    // registered query's precision knob) holds NO such guarantee: a doc
    // short enough to carry a single fingerprint can share only one.
    val winnow = TextOps.docWinnowPairs(1)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngram = TextOps.ngramJaccardPairs(0.8)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ngram.nonEmpty)
    val missed = ngram -- winnow
    assert(missed.isEmpty, s"winnow candidates missed near-dup pairs: $missed")
    // and the precision knob only ever removes candidates
    val strict = TextOps.docWinnowPairs(2)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict.subsetOf(winnow))
  }

  test("time-weighted integral covers every within-type interval") {
    val rows = EventOps.timeWeighted(spark, sf0001).collect()
    val counts = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == counts(r.getString(0)) - 1,
        s"intervals != events-1 for ${r.getString(0)}")
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0)
    }
  }

  test("docWinnow fingerprints are exactly the set of window minima") {
    // recompute on the driver for a handful of documents
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(5).collect()
    val got = TextOps.docWinnow(spark, sf0001)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toMap).toMap
    for (r <- docs) {
      val (id, text) = (r.getLong(0), r.getString(1))
      val toks = text.split(" ", -1)
      val hs = (0 to toks.length - TextOps.WinnowK).map { i =>
        val g = toks.slice(i, i + TextOps.WinnowK).mkString(" ")
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md5hex.take(15), 16)
      }
      val mins = hs.sliding(TextOps.WinnowW).map(_.min).toSeq
      val expected = mins.groupBy(identity).map { case (h, picks) => (h, picks.size.toLong) }
      assert(got.getOrElse(id, Map.empty) == expected, s"doc $id")
    }
  }

  test("mktShare ppm is a true sub-share of region revenue per year") {
    val rows = RelQueries.mktShare("NATION_2", "ASIA")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, reg, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nat >= 0 && nat <= reg, s"nation units outside region: $r")
      assert(ppm == nat * BigInt(1000000) / reg, s"ppm not the exact ratio: $r")
    }
    // all five region nations together own the whole region's revenue
    val all = spark.read.parquet(s"$sf0001/nation.parquet")
      .join(spark.read.parquet(s"$sf0001/region.parquet")
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0))
    val perNation = all.map(n =>
      RelQueries.mktShare(n, "ASIA")(spark, sf0001).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap)
    val regionByYear = rows.map(r => r.getInt(0) -> r.getLong(2)).toMap
    regionByYear.foreach { case (y, reg) =>
      assert(perNation.map(_.getOrElse(y, 0L)).sum == reg,
        s"year $y nation shares do not sum to the region total")
    }
  }

  test("supplierYearRev conserves total revenue and line count") {
    val rows = RelQueries.supplierYearRev(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    assert(rows.map(_.getLong(3)).sum == li.count(),
      "every lineitem must land in exactly one (nation, year) cell")
    val direct = li
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == direct)
  }

  test("partSuppliers counts real suppliers and excludes the brand") {
    val rows = RelQueries.partSuppliers("Brand#1")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getString(0) == "Brand#1"))
    val nSupp = spark.read.parquet(s"$sf0001/supplier.parquet").count()
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(2) <= nSupp))
    // descending by count with deterministic tiebreak
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("lateOrders counts orders once however many lineitems are late") {
    val rows = RelQueries.lateOrders("1996-01-01", "1997-01-01")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), unix_millis(col("o_orderdate").cast("timestamp_ltz")),
        col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val lateKeys = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), unix_millis(col("l_shipdate").cast("timestamp_ltz")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val ninetyDaysMs = 90L * 24 * 3600 * 1000
    val expected = ord
      .filter { case (k, od, _) =>
        lateKeys.get(k).exists(_ > od + ninetyDaysMs) }
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    assert(rows == expected)
  }

  test("forecastRevenue is the exact integer sum over the band") {
    val r = RelQueries.forecastRevenue(1996, 5L, 7L, 24L)(spark, sf0001)
      .collect()(0)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(round(col("l_extendedprice") * 100).cast("long").as("ep"),
        round(col("l_discount") * 100).cast("long").as("dc"),
        col("l_quantity"))
      .collect()
      .filter(x => x.getLong(1) >= 5 && x.getLong(1) <= 7 && x.getDouble(2) < 24)
    assert(r.getLong(1) == li.length.toLong)
    assert(r.getLong(0) == li.map(x => x.getLong(0) * x.getLong(1)).sum)
    assert(r.getLong(1) > 0, "band must be non-empty at sf0.001")
  }

  test("shipStatusPriority splits every joined line exactly once") {
    val rows = RelQueries.shipStatusPriority(1996)(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val joined = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == joined.count())
    val high = joined.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(rows.map(_.getLong(1)).sum == high)
  }

  test("waitingSuppliers blames only last-shippers of staggered F orders") {
    val rows = RelQueries.waitingSuppliers(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_millis(col("l_shipdate").cast("timestamp_ltz")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fOrders = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val byOrder = li.groupBy(_._1)
    val blamed = byOrder.toSeq.flatMap { case (k, ls) =>
      val supps = ls.map(_._2).distinct
      val (mx, mn) = (ls.map(_._3).max, ls.map(_._3).min)
      if (supps.length >= 2 && mx > mn && fOrders(k))
        ls.filter(_._3 == mx).map(_._2).distinct.map(s => (s, k))
      else Seq.empty
    }
    val names = spark.read.parquet(s"$sf0001/supplier.parquet")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = blamed.groupBy(b => names(b._1)).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    // the query returns the top 20 by (numwait desc, name asc)
    val top = expected.toSeq.sortBy { case (n, w) => (-w, n) }.take(20).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == top)
  }

  test("idleCustomers matches a driver-side recomputation") {
    val cutoff = "2000-01-01"
    val rows = RelQueries.idleCustomers(cutoff)(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.nonEmpty, "cutoff must leave a non-empty idle set at sf0.001")
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pos = cust.map(_._3).filter(_ > 0L)
    val (s, n) = (pos.sum, pos.length.toLong)
    val recentBuyers = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected = cust
      .filter(c => c._3 * n > s && !recentBuyers.contains(c._1))
      .groupBy(_._2).map { case (seg, cs) =>
        (seg, cs.length.toLong, cs.map(_._3).sum)
      }.toSet
    assert(rows == expected)
  }
}
