package graft.events

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event-log operators over the `events` table (event_id, ts
  * nanosecond-timestamp, user_id, event_type, value, props JSON).
  *
  * All time arithmetic here is exact int64 nanoseconds (and the DuckDB
  * oracle uses epoch_ns), no float time anywhere; [[events]] normalizes
  * whatever physical timestamp type the parquet carries to that int64-ns
  * contract. Money-like doubles aggregate as integer cents.
  *
  * These are the batch shapes of the streaming pipeline (windowed rollup,
  * sessionization, JSON extraction); `graft.streaming` runs the same
  * logic incrementally.
  */
object EventOps {

  val NsPerHour: Long = 3600L * 1000 * 1000 * 1000
  val SessionGapNs: Long = 1800L * 1000 * 1000 * 1000 // 30 min
  val SessionGapUs: Long = SessionGapNs / 1000

  /** The events table with `ts` guaranteed int64 nanoseconds, whatever
    * the parquet physically stores — the column's type has drifted across
    * testdata generations (TIMESTAMP(NANOS), which
    * `spark.sql.legacy.parquet.nanosAsLong=true` surfaces as LongType;
    * then TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ and silently
    * ignores that flag). Every downstream operator does integer ns
    * arithmetic, so the normalization lives HERE, once, not in each
    * query. See [[normalizeTs]]. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(graft.DatasetCache.readTable(spark, dir, "events.parquet"))

  /** Normalize a `ts` column to int64 nanoseconds-since-epoch.
    *
    *  - LongType: already ns (TIMESTAMP(NANOS) read under `nanosAsLong`,
    *    or an upstream-normalized frame) — passthrough, no-op plan node.
    *  - TIMESTAMP / TIMESTAMP_NTZ: `unix_micros * 1000` — exact, since
    *    both store micros physically (µs-grained data makes the later
    *    `ts div 1000` in streaming round-trips lossless). The NTZ→TZ cast
    *    is value-preserving because every session here pins
    *    `spark.sql.session.timeZone=UTC` ([[graft.LocalSession]] and the
    *    test builder), matching DuckDB's naive-as-UTC `epoch_ns`.
    *
    * Anything else is a schema regression worth failing loudly on. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampType | TimestampNTZType =>
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts: expected int64 ns or a timestamp type, got $other")
  }

  /** Hourly windowed rollup per event type: the canonical streaming
    * aggregation run as a batch. Count + exact integer-cent sum. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(expr(s"ts div $NsPerHour").as("hour_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast(LongType)).as("cents"))
      .orderBy("hour_id", "event_type")

  val hourlyRollupSql: String =
    s"""SELECT epoch_ns(ts) // $NsPerHour AS hour_id, event_type, count(*) AS cnt,
       | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** Exact sufficient statistics of the value distribution per event
    * type — n, Σcents, Σcents², min, max — the standardization /
    * normalization stats a feature pipeline ships to training (mean and
    * variance derive exactly from these on the consumer side). ONE scan,
    * ONE map-side-combinable reduce onto |types| rows; all integer
    * arithmetic (Σcents² in DECIMAL(38,0) — cents ≤ 2³¹ per row keeps
    * even a 10¹² -row sum inside 38 digits), so the stats hash-compare
    * across engines at any scale, unlike a float mean/stddev whose
    * summation order differs per engine. The wide sum stays DECIMAL
    * internally but is EMITTED as a canonical decimal STRING: typed
    * Decimal readers (Spark parquet) and float-coercing clients
    * (DuckDB fetchdf) disagree on a DECIMAL(38,0) column's value
    * representation even when every integer is identical, so exact
    * big integers cross the engine boundary as text. */
  def valueMoments(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .groupBy("event_type")
      .agg(
        count(col("cents")).as("n"),
        sum(col("cents")).as("sum_cents"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")
          .cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("sum_sq"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy("event_type")

  val valueMomentsSql: String =
    """SELECT event_type, count(cents) AS n,
      | CAST(sum(cents) AS BIGINT) AS sum_cents,
      | CAST(sum(CAST(cents AS HUGEINT) * cents) AS VARCHAR) AS sum_sq,
      | min(cents) AS min_cents, max(cents) AS max_cents FROM (
      | SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      | FROM events) GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** Sliding (hopping) windowed rollup: 1-hour windows every 30
    * minutes, through Spark's native sliding `window()` TVF — each
    * event lands in exactly size/slide = 2 windows, which the engine
    * expands MAP-SIDE before the keyed aggregation (one shuffle, 2×
    * the rows, no self-join). The oracle states the same semantics
    * arithmetically: a 1 h/30 min hop is the union of two
    * phase-shifted tumbling grids, so each event's two window starts
    * are `(us div slide)·slide − {0, slide}`. Epoch-aligned on both
    * sides (Spark's default window origin). */
  def slidingRollup(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(timestamp_micros(expr("ts div 1000")).as("et"),
        col("event_type"), col("value"))
      .groupBy(window(col("et"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast(LongType)).as("cents"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("cnt"), col("cents"))
      .orderBy("win_start_us", "event_type")

  val slidingRollupSql: String = {
    val slideUs = 1800L * 1000000L
    s"""SELECT (epoch_us(ts) // $slideUs) * $slideUs - o.off AS win_start_us,
       | event_type, count(*) AS cnt,
       | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       | FROM events CROSS JOIN (SELECT unnest([0, $slideUs]) AS off) o
       | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")
  }

  /** Sliding-window DISTINCT users — the deduplicating variant of
    * [[slidingRollup]] (active-users dashboards): count(DISTINCT
    * user_id) per hopping 1 h/30 min window. Spark plans the distinct
    * over the same map-side window Expand as a two-phase aggregate
    * ((window, user) partial dedup, then the count) — two keyed
    * shuffles, no self-join, state bounded by distinct (window, user)
    * pairs. */
  def slidingUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(timestamp_micros(expr("ts div 1000")).as("et"), col("user_id"))
      .groupBy(window(col("et"), "1 hour", "30 minutes"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n_users"))
      .orderBy("win_start_us")

  val slidingUsersSql: String = {
    val slideUs = 1800L * 1000000L
    s"""SELECT (epoch_us(ts) // $slideUs) * $slideUs - o.off AS win_start_us,
       | count(DISTINCT user_id) AS n_users
       | FROM events CROSS JOIN (SELECT unnest([0, $slideUs]) AS off) o
       | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")
  }

  /** CUBE report over (event type × hour-of-day): all four grouping
    * sets — the full cross-tab, row margins, column margins, grand
    * total — in ONE pass over the fact table (Spark expands the cube
    * after the partial aggregation, so the scan and the map-side
    * combine are shared across all four). `grouping_id` disambiguates;
    * keys coalesce to sentinels so the result is null-free for stable
    * hashing. Complements [[graft.rel.RelQueries.rollupSummary]]
    * (hierarchical sets) with the full-lattice variant. */
  def cubeByHour(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("hour_of_day", expr(s"(ts div $NsPerHour) % 24"))
      .cube("event_type", "hour_of_day")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast(LongType)).as("cents"))
      .select(
        coalesce(col("event_type"), lit("(all)")).as("etype"),
        coalesce(col("hour_of_day"), lit(-1L)).as("hod"),
        col("gid"), col("cnt"), col("cents"))
      .orderBy("gid", "etype", "hod")

  val cubeByHourSql: String =
    s"""SELECT coalesce(event_type, '(all)') AS etype,
       | coalesce(hour_of_day, -1) AS hod,
       | CAST(GROUPING(event_type, hour_of_day) AS BIGINT) AS gid,
       | count(*) AS cnt,
       | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       | FROM (SELECT event_type, epoch_ns(ts) // $NsPerHour % 24 AS hour_of_day, value FROM events)
       | GROUP BY CUBE(event_type, hour_of_day) ORDER BY gid, etype, hod""".stripMargin.replace("\n", " ")

  /** The event-type vocabulary, pinned so [[pivotByType]]'s output
    * schema is static (a dynamic pivot would run an extra distinct job
    * AND make the result schema data-dependent — both wrong for a
    * production report at scale). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Hour × event-type counts PIVOTED wide — the crosstab report. The
    * explicit value list keeps it one aggregation pass (pivot with
    * known values compiles to conditional counts — no distinct job, no
    * second shuffle) with a static schema; absent combinations surface
    * as 0, not null, for stable hashing. */
  def pivotByType(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = events(spark, dir)
      .groupBy(expr(s"ts div $NsPerHour").as("hour_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    pivoted.select(col("hour_id") +:
      EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("hour_id")
  }

  val pivotByTypeSql: String = {
    val cols = EventTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(", ")
    s"""SELECT epoch_ns(ts) // $NsPerHour AS hour_id, $cols
       | FROM events GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")
  }

  /** The inverse: UNPIVOT the wide crosstab back to long (hour_id,
    * event_type, cnt) — Spark's `unpivot` operator (melt). Zero counts
    * are dropped so the round trip reproduces exactly the observed
    * (hour, type) pairs of [[hourlyRollup]]; the unpivot itself is a
    * zero-shuffle row-local expansion. */
  def unpivotByType(spark: SparkSession, dir: String): DataFrame =
    pivotByType(spark, dir)
      .unpivot(Array(col("hour_id")),
        EventTypes.map(t => col(s"n_$t")).toArray, "etype_col", "cnt")
      .filter(col("cnt") > 0)
      .select(col("hour_id"),
        expr("substring(etype_col, 3)").as("event_type"), col("cnt"))
      .orderBy("hour_id", "event_type")

  val unpivotByTypeSql: String =
    s"""SELECT epoch_ns(ts) // $NsPerHour AS hour_id, event_type, count(*) AS cnt
       | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** Per-type value deciles via NTILE: every event ranked into 10
    * equal-frequency buckets within its type, reported as per-bucket
    * counts and exact integer-cent bounds — the equi-depth histogram
    * shape. The window partitions by event_type (bounded cardinality;
    * each partition sorts in parallel). Cents (exact int64) as
    * everywhere, with (cents, event_id) as the total tiebreak order so
    * both engines assign identical bucket boundaries. */
  /** Decile report from the SAME value histogram as [[quantiles]] — no
    * per-row ntile over a corpus-sized type partition. ntile(10)'s rank
    * intervals are pure arithmetic (the first n%10 tiles get one extra
    * row), so each tile's count is its interval width and its lo/hi
    * cents are the histogram values overlapping the interval; the
    * event_id tiebreak inside equal-cents runs never changes any of
    * the three aggregates. The tile relation is |types|×10 rows —
    * bounded categorical × constant, so the broadcast hint is
    * policy-legal. */
  def valueDeciles(spark: SparkSession, dir: String): DataFrame = {
    // ONE histogram materialization (r13): hist feeds the tile derivation
    // AND the interval-join probe side — as two subtree copies the
    // corpus-sized cents aggregation ran twice (profiled: the query's two
    // ~300 ms scan stages). The relation is bounded (distinct cents ×
    // types), so the checkpoint is metadata-cheap at any scale.
    val hist = centsRankHistogram(spark, dir).localCheckpoint(false)
    val tiles = hist.select("event_type", "n").distinct()
      .select(col("event_type").as("t_type"), col("n"),
        explode(sequence(lit(1L), lit(10L))).as("decile"))
      .withColumn("t_start",
        expr("(decile - 1) * (n div 10) + least(decile - 1, n % 10) + 1"))
      .withColumn("t_end", expr("decile * (n div 10) + least(decile, n % 10)"))
      .filter(col("t_end") >= col("t_start")) // n<10: absent tiles, like ntile
      .select("t_type", "decile", "t_start", "t_end")
    hist.join(broadcast(tiles),
        col("event_type") === col("t_type") &&
          col("lo_rank") <= col("t_end") && col("hi_rank") >= col("t_start"))
      .groupBy(col("event_type"), col("decile"))
      .agg(max(expr("t_end - t_start + 1")).as("cnt"),
        min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
      .orderBy(col("event_type"), col("decile"))
  }

  val valueDecilesSql: String =
    """SELECT event_type, decile, count(*) AS cnt,
      | min(cents) AS lo_cents, max(cents) AS hi_cents FROM (
      | SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents,
      |  CAST(ntile(10) OVER (PARTITION BY event_type
      |    ORDER BY CAST(round(value*100) AS BIGINT), event_id) AS BIGINT) AS decile
      | FROM events WHERE value IS NOT NULL)
      | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** Gap-filled (dense) hourly series: every (hour, type) cell between
    * the observed min and max hour, zero-filled — the resample /
    * gap-fill shape every time-series consumer needs before
    * differencing or charting.
    *
    * Scale design: the dense grid is |hours| × |types| — TIME-bounded
    * metadata, independent of event volume — generated from a 1-row
    * bounds aggregate (`sequence` + explode, no driver loop); the only
    * data-sized work is the counts aggregation (one shuffle), and the
    * grid⋈counts join runs between two aggregate-sized relations (AQE
    * broadcasts). */
  def denseHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(expr(s"ts div $NsPerHour").as("hour_id"), col("event_type"))
    val counts = ev.groupBy("hour_id", "event_type")
      .agg(count(lit(1)).as("n"))
    val hours = ev.agg(min("hour_id").as("mn"), max("hour_id").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("hour_id"))
    val types = ev.select("event_type").distinct()
    hours.crossJoin(types)
      .join(counts, Seq("hour_id", "event_type"), "left_outer")
      .select(col("hour_id"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("cnt"))
      .orderBy("hour_id", "event_type")
  }

  val denseHourlySql: String =
    s"""WITH ev AS (SELECT epoch_ns(ts) // $NsPerHour AS hour_id, event_type FROM events),
       | c AS (SELECT hour_id, event_type, count(*) AS n FROM ev GROUP BY 1, 2),
       | h AS (SELECT unnest(generate_series((SELECT min(hour_id) FROM ev), (SELECT max(hour_id) FROM ev))) AS hour_id),
       | t AS (SELECT DISTINCT event_type FROM ev)
       | SELECT h.hour_id, t.event_type, coalesce(c.n, 0) AS cnt
       | FROM h CROSS JOIN t LEFT JOIN c ON c.hour_id = h.hour_id AND c.event_type = t.event_type
       | ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** Purchases vs errors per hour via FULL OUTER join — the
    * reconcile-two-feeds shape, where either side can have hours the
    * other lacks. Both inputs are hour-grained aggregates (one fact
    * shuffle each, map-side combinable), so the full-outer join runs on
    * two time-bounded relations; the USING key coalesces across sides
    * and missing counts surface as 0 for stable hashing. */
  def purchaseVsErrorHourly(spark: SparkSession, dir: String): DataFrame = {
    def hourly(etype: String, as: String) = events(spark, dir)
      .filter(col("event_type") === etype)
      .groupBy(expr(s"ts div $NsPerHour").as("hour_id"))
      .agg(count(lit(1)).as(as))
    hourly("purchase", "n_purchase")
      .join(hourly("error", "n_error"), Seq("hour_id"), "full_outer")
      .select(col("hour_id"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("n_error"), lit(0L)).as("n_error"))
      .orderBy("hour_id")
  }

  val purchaseVsErrorHourlySql: String =
    s"""WITH p AS (SELECT epoch_ns(ts) // $NsPerHour AS hour_id, count(*) AS n_purchase
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       | e AS (SELECT epoch_ns(ts) // $NsPerHour AS hour_id, count(*) AS n_error
       |  FROM events WHERE event_type = 'error' GROUP BY 1)
       | SELECT hour_id, coalesce(n_purchase, 0) AS n_purchase,
       |  coalesce(n_error, 0) AS n_error
       | FROM p FULL JOIN e USING (hour_id) ORDER BY hour_id""".stripMargin.replace("\n", " ")

  val NsPerDay: Long = 24L * NsPerHour

  /** Time-weighted value integral per event type: each event's value
    * holds until the next event of the same type — the step-function
    * integral behind time-weighted averages (billing, exposure, TWAP).
    *
    * Exactness discipline: weights are whole SECONDS via integer
    * division (µs would overflow int64 on the sum at scale; seconds
    * keep the per-type total ≤ cents·observation-window ≈ 10¹⁰ —
    * int64-safe by eight orders), time is µs (DuckDB truncates ns), and
    * the final open-ended interval drops identically in both engines
    * (lead IS NULL). One shuffle on event_type for the lead window,
    * then a map-side-combinable aggregate in the same partitioning. */
  /** Time-weighted value integral per type (Σ cents·seconds-held over
    * adjacent-event intervals).
    *
    * Scale: a `lead` directly over an event_type partition sorts a
    * whole type in one task (bounded categorical ⇒ corpus-sized window
    * — the quantiles/deciles trap). The adjacency is two-phased on
    * TIME-RANGE buckets instead: `lead` runs within (type, day)
    * partitions, and each bucket's LAST event takes its successor from
    * the next non-empty bucket's FIRST event — a (types × days)
    * boundary relation (time-bounded metadata, like the dense-hourly
    * grid, so its broadcast and its own tiny lead window are
    * policy-legal). Same-µs events always share a bucket, so the
    * stitched adjacency is exactly the global (ts_us, event_id) order
    * and the result is bit-identical to the one-window spelling — the
    * oracle keeps that spelling. */
  def timeWeighted(spark: SparkSession, dir: String): DataFrame = {
    val base = events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("ts div 1000").as("ts_us"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("g", expr(s"ts_us div $UsPerDay"))
    val inBucket = Window.partitionBy("event_type", "g")
      .orderBy(col("ts_us"), col("event_id"))
    val byTypeBucket = Window.partitionBy("event_type").orderBy("g")
    val nextFirst = base.groupBy("event_type", "g")
      .agg(min(struct(col("ts_us"), col("event_id"))).as("f"))
      .withColumn("nf_us", lead(col("f.ts_us"), 1).over(byTypeBucket))
      .select("event_type", "g", "nf_us")
    base
      .withColumn("next_in", lead(col("ts_us"), 1).over(inBucket))
      .join(broadcast(nextFirst), Seq("event_type", "g"))
      .withColumn("next_us", coalesce(col("next_in"), col("nf_us")))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_s", expr("(next_us - ts_us) div 1000000"))
      .groupBy("event_type")
      .agg(sum(col("cents") * col("dur_s")).as("cent_seconds"),
        sum(col("dur_s")).as("dur_s_total"),
        count(lit(1)).as("n_intervals"))
      .orderBy("event_type")
  }

  val timeWeightedSql: String =
    """SELECT event_type,
      | CAST(sum(cents * dur_s) AS BIGINT) AS cent_seconds,
      | CAST(sum(dur_s) AS BIGINT) AS dur_s_total,
      | count(*) AS n_intervals
      | FROM (
      |  SELECT event_type, cents,
      |   (lead(ts_us) OVER (PARTITION BY event_type ORDER BY ts_us, event_id) - ts_us) // 1000000 AS dur_s
      |  FROM (SELECT event_type, event_id, epoch_us(ts) AS ts_us,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events))
      | WHERE dur_s IS NOT NULL
      | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** (user, day) pairs with engagement but no conversion — EXCEPT, the
    * set-difference operator (the anti-join twin of
    * [[graft.text.TextOps.vocabOverlap]]'s INTERSECT). Spark compiles
    * EXCEPT to a left-anti join over two pre-distinct sides; both sides
    * here are (user, day)-compressed BEFORE they meet — the same
    * distinct-first discipline the retention query uses, so the anti
    * join never sees raw event volume. */
  def clickNoBuyDays(spark: SparkSession, dir: String): DataFrame = {
    def userDays(etype: String) = events(spark, dir)
      .filter(col("event_type") === etype)
      .select(col("user_id"), expr(s"ts div $NsPerDay").as("day_id"))
      .distinct()
    userDays("click").except(userDays("purchase"))
      .orderBy("user_id", "day_id")
  }

  val clickNoBuyDaysSql: String =
    s"""SELECT DISTINCT user_id, epoch_ns(ts) // $NsPerDay AS day_id
       | FROM events WHERE event_type = 'click'
       | EXCEPT
       | SELECT DISTINCT user_id, epoch_ns(ts) // $NsPerDay AS day_id
       | FROM events WHERE event_type = 'purchase'
       | ORDER BY user_id, day_id""".stripMargin.replace("\n", " ")

  /** Daily per-user resample with forward fill (last observation
    * carried forward): every (user, day) cell of the dense calendar
    * grid carries the user's most recent observed value at or before
    * that day — the gap-filling shape behind balance/exposure
    * reporting and feature snapshots over sparse event streams
    * ([[denseHourly]] zero-fills COUNTS; this carries VALUES).
    *
    * The observation per (user, day) is the value of the day's LAST
    * event under the (µs, event_id) tie rule (the [[sessionize]]
    * discipline — never ns, which DuckDB truncates). Days before a
    * user's first observation surface as the -1 sentinel, not NULL, so
    * the output is null-free for stable hashing (cents are ≥ 0).
    *
    * Scale design: the day axis is TIME-bounded metadata from a 1-row
    * bounds aggregate; the grid is |users| × |days| — linear in users —
    * and the only event-volume work is the per-(user, day)
    * last-observation reduction (one shuffle; its row_number window
    * partitions by (user, day), never wider). The carry-forward window
    * partitions by user over the bounded day axis, so no corpus-sized
    * window partition exists at any SF. */
  def ffillDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"),
      expr(s"ts div $NsPerDay").as("day_id"),
      expr("ts div 1000").as("ts_us"), col("event_id"),
      round(col("value") * 100).cast(LongType).as("cents"))
    val lastPerDay = Window.partitionBy("user_id", "day_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val obs = ev.withColumn("rn", row_number().over(lastPerDay))
      .filter(col("rn") === 1).select("user_id", "day_id", "cents")
    val days = ev.agg(min("day_id").as("mn"), max("day_id").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day_id"))
    val grid = ev.select("user_id").distinct().crossJoin(days)
    val carry = Window.partitionBy("user_id").orderBy("day_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day_id"), "left_outer")
      .select(col("user_id"), col("day_id"),
        coalesce(last(col("cents"), ignoreNulls = true).over(carry),
          lit(-1L)).as("cents_ffill"),
        when(col("cents").isNull, 0L).otherwise(1L).as("is_obs"))
      .orderBy("user_id", "day_id")
  }

  val ffillDailySql: String =
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) // $NsPerDay AS day_id,
       |  epoch_us(ts) AS ts_us, event_id,
       |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       | obs AS (SELECT user_id, day_id, cents FROM (
       |   SELECT user_id, day_id, cents, row_number() OVER (
       |     PARTITION BY user_id, day_id ORDER BY ts_us DESC, event_id DESC) AS rn
       |   FROM ev) WHERE rn = 1),
       | days AS (SELECT unnest(generate_series(
       |   (SELECT min(day_id) FROM ev), (SELECT max(day_id) FROM ev))) AS day_id),
       | grid AS (SELECT u.user_id, d.day_id
       |   FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN days d)
       | SELECT g.user_id, g.day_id,
       |  coalesce(last_value(o.cents IGNORE NULLS) OVER (
       |    PARTITION BY g.user_id ORDER BY g.day_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS cents_ffill,
       |  CAST(CASE WHEN o.cents IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_obs
       | FROM grid g LEFT JOIN obs o
       |  ON g.user_id = o.user_id AND g.day_id = o.day_id
       | ORDER BY g.user_id, g.day_id""".stripMargin.replace("\n", " ")

  /** Sessionization: per-user sessions split at >30 min gaps, via
    * lag + running sum — one shuffle on user_id, then linear per-user
    * work. Output: per-user session count and longest session. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    // ALL oracle-visible time arithmetic in MICROSECONDS: events.ts is
    // int64 ns but DuckDB truncates TIMESTAMP(NANOS) to us, so ns-level
    // gaps/ordering would silently diverge at a boundary (same class of
    // bug as the doc_quality float-round incident). Ties at equal us are
    // broken by event_id on both sides.
    val byUser = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
    val s = events(spark, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_us") - col("prev") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    s.groupBy("user_id", "sess").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(max(col("sess")).as("n_sessions"), max(col("n")).as("max_session_len"))
      .orderBy("user_id")
  }

  val sessionizeSql: String =
    s"""WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev FROM events),
       | m AS (SELECT user_id, event_id, ts_us, CASE WHEN prev IS NULL OR ts_us - prev > $SessionGapUs THEN 1 ELSE 0 END AS new_sess FROM s),
       | g AS (SELECT user_id, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM m),
       | c AS (SELECT user_id, sess, count(*) AS n FROM g GROUP BY 1, 2)
       | SELECT user_id, max(sess) AS n_sessions, max(n) AS max_session_len
       | FROM c GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** JSON property extraction + rollup: parse `props.$.k` (bucketed mod
    * 10) — scan-side JSON path extraction, single aggregation shuffle. */
  def jsonRollup(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        col("event_type"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("cnt"),
        count_distinct(col("event_type")).as("n_types"))
      .orderBy("k_bucket")

  val jsonRollupSql: String =
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      | count(*) AS cnt, count(DISTINCT event_type) AS n_types
      | FROM events GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** Sketch aggregates: approximate distinct users + an approximate
    * median — the HLL/quantile-sketch dashboard surface for 100 TB
    * where exactness doesn't pay. Both sketches are built FROM SCRATCH
    * on deterministic integer arithmetic so the DuckDB oracle replays
    * them bit-exactly (engine-native `approx_count_distinct` /
    * `percentile_approx` are internally seeded sketches no other
    * engine can reproduce — this query was the surface's ONLY
    * rows-only gate until r10):
    *
    *  - `approx_users`: the [[hllUsers]] deterministic HLL folded to
    *    an INTEGER estimate. Raw estimator `alpha*m^2*2^23/harmonic`
    *    with alpha_64 = 709/1000 exact-rational, evaluated as one
    *    BIGINT floor division; the small-range regime (raw <= 2.5m
    *    with empty registers) switches to linear counting
    *    `m*ln(m/V)` — transcendental, so it ships as a PRECOMPUTED
    *    63-entry literal table (V has only 63 possible values),
    *    identical digits in both engines.
    *  - `p50_lo_cents`: equal-width-histogram median — the fixed-
    *    memory quantile sketch. [[HistBuckets]] buckets spanning the
    *    per-type [mn, mx] cent range; the reported value is the lower
    *    edge of the first bucket whose cumulative count covers rank
    *    ceil(n/2). Error is bounded by one bucket width by
    *    construction (spec-pinned against the exact order statistic).
    *
    * The exact arm is computed from a DISTINCT-COMPRESSED relation and
    * joined back, NOT mixed into the sketch aggregate (mixed, Spark's
    * single-distinct rewrite evaluates the sketches once per distinct
    * user — measured 2.9x at sf0.1 in the r5 form of this query).
    *
    * Scale shape: three independent aggregations of the fact table
    * (register maxima, distinct pairs, bucket counts) — each
    * map-side-combinable to a bounded relation (64 registers / distinct
    * pairs / [[HistBuckets]] cells per type); the histogram needs one
    * extra min/max pass (equi-width needs the range first), joined back
    * as a type-count-bounded broadcast. The cumulative-rank window runs
    * over the BUCKET relation (<= types x 1000 rows), never the corpus. */
  def approxStats(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    // count(user_id), not count(*): count_distinct excludes NULLs, and
    // the distinct-compressed spelling must keep that semantic (a null
    // user would otherwise count as one extra "user" per type)
    val exact = e.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(col("user_id")).as("exact_users"))
    // HLL integer estimate from the shared register state
    val vEmpty = lit(HllBuckets.toLong) - col("used_buckets")
    val raw = expr(s"$HllRawNum div (1000 * harmonic_scaled)")
    val approx = hllRegisters(spark, dir)
      .select(col("event_type"),
        when(vEmpty > 0 && raw <= lit(160L), // 2.5 * m, exact at m=64
          element_at(typedLit(LcTable), vEmpty.cast("int")))
          .otherwise(raw).as("approx_users"))
    // equal-width histogram median over integer cents. NULL values are
    // filtered BEFORE bucketing (mirrored in the oracle): a NULL lands
    // in a NULL bucket the two engines ORDER BY differently (Spark
    // nulls-first, DuckDB nulls-last) while count(*) would still count
    // it in n — the exact-users arm NULL-proofs user_id the same way.
    val cents = round(col("value") * 100).cast(LongType)
    val base = e.filter(col("value").isNotNull)
      .select(col("event_type"), cents.as("c"))
    val mm = base.groupBy("event_type")
      .agg(min("c").as("mn"), max("c").as("mx"), count(lit(1)).as("n"))
    val buck = base.join(broadcast(mm), "event_type") // bounded: row per type
      .select(col("event_type"),
        expr(s"((c - mn) * $HistBuckets) div (mx - mn + 1)").as("b"))
      .groupBy("event_type", "b").agg(count(lit(1)).as("bc"))
    val wcum = Window.partitionBy("event_type").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p50 = buck.withColumn("cum", sum("bc").over(wcum))
      .join(broadcast(mm), "event_type") // bounded: row per type
      .filter(col("cum") * 2 >= col("n"))
      .groupBy("event_type")
      // mn/mx are per-type constants; max() just carries them through
      .agg(min("b").as("pb"), max("mn").as("mn"), max("mx").as("mx"))
      .select(col("event_type"),
        expr(s"mn + (pb * (mx - mn + 1)) div $HistBuckets").as("p50_lo_cents"))
    // LEFT join on the histogram arm: a type whose values are all NULL
    // has no histogram row, but its user counts must still report
    // (p50_lo_cents NULL) rather than the type vanishing entirely
    approx.join(exact, "event_type")
      .join(p50, Seq("event_type"), "left")
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        col("p50_lo_cents"))
      .orderBy("event_type")
  }

  // lazy: references the HLL constants declared further down the file
  lazy val approxStatsSql: String = {
    val lc = LcTable.mkString("[", ", ", "]")
    s"""WITH hr AS (
       | SELECT event_type, CAST(count(*) AS BIGINT) AS used_buckets,
       |  CAST(sum(CAST(1 AS BIGINT) << CAST(${TailBits + 1} - mreg AS INTEGER))
       |    + ($HllBuckets - count(*)) * $EmptyWeight AS BIGINT) AS harmonic_scaled
       | FROM (
       |  SELECT event_type, bucket, CAST(max(${TailBits + 1} - (CASE $bitLenLadderSql END)) AS BIGINT) AS mreg
       |  FROM (
       |   SELECT event_type, hv // $TailMod AS bucket, hv % $TailMod AS tail
       |   FROM (SELECT event_type, CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,7) AS BIGINT) AS hv FROM events))
       |  GROUP BY 1, 2) GROUP BY event_type),
       |ap AS (SELECT event_type,
       | CAST(CASE WHEN ($HllBuckets - used_buckets) > 0
       |   AND ($HllRawNum // (1000 * harmonic_scaled)) <= 160
       |  THEN ($lc)[CAST($HllBuckets - used_buckets AS INTEGER)]
       |  ELSE $HllRawNum // (1000 * harmonic_scaled) END AS BIGINT) AS approx_users FROM hr),
       |ex AS (SELECT event_type, CAST(count(user_id) AS BIGINT) AS exact_users
       | FROM (SELECT DISTINCT event_type, user_id FROM events) GROUP BY 1),
       |cb AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events WHERE value IS NOT NULL),
       |mm AS (SELECT event_type, min(c) AS mn, max(c) AS mx,
       | CAST(count(*) AS BIGINT) AS n FROM cb GROUP BY 1),
       |bk AS (SELECT cb.event_type, ((c - mn) * $HistBuckets) // (mx - mn + 1) AS b,
       | CAST(count(*) AS BIGINT) AS bc FROM cb JOIN mm USING (event_type) GROUP BY 1, 2),
       |cm AS (SELECT event_type, b,
       | sum(bc) OVER (PARTITION BY event_type ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum FROM bk),
       |p5 AS (SELECT t.event_type,
       | CAST(mn + (pb * (mx - mn + 1)) // $HistBuckets AS BIGINT) AS p50_lo_cents
       | FROM (SELECT cm.event_type, min(b) AS pb FROM cm JOIN mm USING (event_type)
       |  WHERE cum * 2 >= n GROUP BY 1) t JOIN mm ON t.event_type = mm.event_type)
       |SELECT ap.event_type, approx_users, exact_users, p50_lo_cents
       |FROM ap JOIN ex USING (event_type) LEFT JOIN p5 USING (event_type)
       |ORDER BY event_type""".stripMargin.replace("\n", " ")
  }

  /** As-of join: each `purchase` event paired with the user's most recent
    * `click` at-or-before it. Implemented the scalable way — NOT a range
    * join: union both sides, one shuffle on user_id, then a running
    * `last(click_ts)` window over the merged time order. O(n log n) per
    * user partition, no pair blow-up, the standard distributed as-of
    * formulation (what a custom SparkStrategy would also do). */
  def asOfJoin(spark: SparkSession, dir: String): DataFrame = {
    // order by MICROSECOND time (+ event_id tiebreak): DuckDB only sees
    // us-truncated timestamps, so an ns-resolution order could disagree
    // whenever two events of a user share the same us
    val byUserTime = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // microsecond precision: DuckDB TIMESTAMP truncates ns -> us, so the
    // oracle-facing numbers are us on both sides (ns div 1000 == epoch_us)
    val e = events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_us",
        when(col("event_type") === "click", expr("ts div 1000")))
    e.withColumn("last_click_us", last(col("click_us"), ignoreNulls = true).over(byUserTime))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("last_click_us"),
        (expr("ts div 1000") - coalesce(col("last_click_us"), expr("ts div 1000")))
          .as("gap_us"))
      .orderBy("event_id")
  }

  val asOfJoinSql: String =
    """SELECT event_id, user_id, last_click_us,
      | epoch_us(ts) - coalesce(last_click_us, epoch_us(ts)) AS gap_us FROM (
      | SELECT event_id, user_id, ts, event_type,
      |  last(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS last_click_us
      | FROM events WHERE event_type IN ('click', 'purchase'))
      | WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin.replace("\n", " ")

  /** Tolerance-bounded as-of join: like [[asOfJoin]], but a click more
    * than `tolUs` microseconds old does NOT match (the merge-asof
    * `tolerance` semantic — feature-freshness bounds: a stale
    * observation must not leak into a training row). The identical
    * union + user-keyed window plan; the tolerance is a post-window
    * predicate on the running match, so the bound costs nothing. */
  def asOfJoinTol(tolUs: Long)(spark: SparkSession, dir: String): DataFrame = {
    val byUserTime = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_us",
        when(col("event_type") === "click", expr("ts div 1000")))
      .withColumn("last_click_us",
        last(col("click_us"), ignoreNulls = true).over(byUserTime))
      .filter(col("event_type") === "purchase")
      .withColumn("match_us",
        when(expr("ts div 1000") - col("last_click_us") <= tolUs,
          col("last_click_us")))
      .select(col("event_id"), col("user_id"), col("match_us"),
        (expr("ts div 1000") - col("match_us")).as("gap_us"))
      .orderBy("event_id")
  }

  def asOfJoinTolSql(tolUs: Long): String =
    s"""SELECT event_id, user_id, match_us, epoch_us(ts) - match_us AS gap_us
       | FROM (SELECT event_id, user_id, ts, event_type,
       |  CASE WHEN epoch_us(ts) - last_click_us <= $tolUs
       |   THEN last_click_us END AS match_us FROM (
       |  SELECT event_id, user_id, ts, event_type,
       |   last(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS last_click_us
       |  FROM events WHERE event_type IN ('click', 'purchase')))
       | WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin.replace("\n", " ")

  /** Click→purchase conversion funnel: users whose first purchase
    * strictly follows their first click, with the conversion delay —
    * the sequence-analytics shape (did A happen, then B?) behind every
    * funnel/retention report.
    *
    * Scale design: first-click is one map-side-combined aggregation on
    * user_id; purchases then join and re-aggregate ON THE SAME KEY, so
    * the exchange introduced by the first groupBy is reused by both the
    * join and the second groupBy — no second full shuffle of the events
    * table, no per-user pair blow-up, state is one row per user. All
    * time math in integer microseconds (DuckDB truncates ns → us). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(expr("ts div 1000")).as("click_us"))
    e.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("p_us"))
      .join(clicks, "user_id")
      .filter(col("p_us") > col("click_us"))
      .groupBy("user_id")
      .agg(min(col("click_us")).as("click_us"), min(col("p_us")).as("purch_us"))
      .select(col("user_id"), col("click_us"), col("purch_us"),
        (col("purch_us") - col("click_us")).as("delay_us"))
      .orderBy("user_id")
  }

  val funnelSql: String =
    """WITH c AS (SELECT user_id, min(epoch_us(ts)) AS click_us
      |  FROM events WHERE event_type = 'click' GROUP BY 1)
      | SELECT e.user_id, min(c.click_us) AS click_us,
      |  min(epoch_us(e.ts)) AS purch_us,
      |  min(epoch_us(e.ts)) - min(c.click_us) AS delay_us
      | FROM events e JOIN c ON e.user_id = c.user_id
      | WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
      | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** Three-step strict-order funnel view→click→purchase: each user's
    * FIRST view, then FIRST click strictly after it, then FIRST
    * purchase strictly after that — the k-step generalization of
    * [[funnel]] every product-analytics suite ships. Same aggregate-
    * then-join shape, applied twice: each stage is one map-side-
    * combinable per-user min aggregation joined user-keyed into the
    * next stage's filtered events. Per-stage relations are user-sized
    * (SF-proportional), so NO broadcast hints — AQE owns the
    * broadcast-vs-shuffle choice, and all three joins co-shuffle on
    * user_id (the sessionize exchange class). Timestamps compare at µs
    * like every cross-engine time rule here; strictly-greater bounds
    * make same-µs stage pairs non-converting (the [[funnel]] rule). */
  def funnel3(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    val views = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(expr("ts div 1000")).as("view_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("c_us"))
      .join(views, "user_id")
      .filter(col("c_us") > col("view_us"))
      .groupBy("user_id")
      .agg(min(col("view_us")).as("view_us"), min(col("c_us")).as("click_us"))
    e.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("p_us"))
      .join(clicks, "user_id")
      .filter(col("p_us") > col("click_us"))
      .groupBy("user_id")
      .agg(min(col("view_us")).as("view_us"),
        min(col("click_us")).as("click_us"),
        min(col("p_us")).as("purch_us"))
      .select(col("user_id"), col("view_us"), col("click_us"),
        col("purch_us"), (col("purch_us") - col("view_us")).as("delay_us"))
      .orderBy("user_id")
  }

  val funnel3Sql: String =
    """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS view_us
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      | c AS (SELECT e.user_id, min(v.view_us) AS view_us,
      |   min(epoch_us(e.ts)) AS click_us
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.view_us
      |  GROUP BY 1)
      | SELECT e.user_id, min(c.view_us) AS view_us,
      |  min(c.click_us) AS click_us, min(epoch_us(e.ts)) AS purch_us,
      |  min(epoch_us(e.ts)) - min(c.view_us) AS delay_us
      | FROM events e JOIN c ON e.user_id = c.user_id
      | WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
      | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** Top user paths of three consecutive events (trigrams) in per-user
    * event-time order — the path-analysis extension of the transition
    * matrix (2-grams in [[GraphOps.transitions]]): which 3-step flows
    * dominate. ONE window shuffle on user_id (lead×2 shares the same
    * sort), then a keyed aggregation on a ≤|types|³-bounded relation;
    * top-k is TakeOrderedAndProject. The (µs, event_id) tie rule keeps
    * same-µs order identical across engines. */
  def trigramPaths(k: Int)(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("e1").asc, col("e2").asc, col("e3").asc)
      .limit(k)
  }

  def trigramPathsSql(k: Int): String =
    s"""SELECT e1, e2, e3, cnt FROM (
       | SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS cnt FROM (
       |  SELECT event_type AS e1,
       |   lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS e2,
       |   lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS e3
       |  FROM events)
       | WHERE e2 IS NOT NULL AND e3 IS NOT NULL
       | GROUP BY 1, 2, 3)
       | ORDER BY cnt DESC, e1 ASC, e2 ASC, e3 ASC LIMIT $k""".stripMargin.replace("\n", " ")

  /** Users whose event-type sequence matches a regex —
    * MATCH_RECOGNIZE-style sequence search (Spark has no
    * MATCH_RECOGNIZE; the reference engines it twins against do not
    * either). Each user's events collapse, in (µs, event_id) order, to
    * a string of per-type initial characters (v/c/p/s/e — distinct for
    * this schema), and the pattern is an ordinary regex over it:
    * `vc.*p` = a view IMMEDIATELY followed by a click, with a purchase
    * any time later — stricter than the funnel's subsequence logic,
    * inexpressible as joins without a per-adjacency window pass.
    *
    * ONE user-keyed aggregation; per-user state is the user's own
    * event string (bounded by events-per-user, the same contract as
    * every sessionize/funnel op), and the regex runs once per USER,
    * not per event. The initial-character alphabet keeps the string
    * 1 byte per event. */
  def seqPattern(pattern: String)(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("user_id"),
        struct(expr("ts div 1000").as("us"), col("event_id").as("eid"),
          substring(col("event_type"), 1, 1).as("c")).as("s"))
      .groupBy("user_id")
      .agg(array_join(transform(array_sort(collect_list(col("s"))),
        x => x.getField("c")), "").as("seq"))
      .filter(col("seq").rlike(pattern))
      .select(col("user_id"), length(col("seq")).cast(LongType).as("n_events"))
      .orderBy("user_id")

  def seqPatternSql(pattern: String): String =
    s"""WITH s AS (SELECT user_id,
       |  string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id) AS seq
       |  FROM events GROUP BY 1)
       | SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events
       | FROM s WHERE regexp_matches(seq, '$pattern')
       | ORDER BY user_id""".stripMargin.replace("\n", " ")

  /** Point-in-time training features: for every purchase (the label
    * event), the user's feature vector computed over STRICTLY EARLIER
    * events only — the leakage-safe feature-store join that turns an
    * event log into supervised training rows. The frame
    * `UNBOUNDED PRECEDING .. 1 PRECEDING` under the (µs, event_id) total
    * order IS the point-in-time contract: a feature can never see the
    * label's own row or anything after it, including same-µs peers that
    * sort later.
    *
    * ONE user-keyed window shuffle computes all features in a single
    * linear pass per user (running count, running view count, last
    * observed cents); the label filter happens AFTER the window so
    * features see the full history. No join at all — the asof-join
    * spelled as a window, which at 100 TB beats a range join because
    * the event log is already the only input. */
  def pitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val wPrev = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("feat_events", count(lit(1)).over(wPrev))
      .withColumn("feat_views",
        coalesce(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .over(wPrev), lit(0L)))
      .withColumn("last_cents",
        coalesce(last(col("cents"), ignoreNulls = true).over(wPrev), lit(-1L)))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us",
        "feat_events", "feat_views", "last_cents")
      .orderBy("event_id")
  }

  val pitFeaturesSql: String =
    """SELECT event_id, user_id, ts_us, feat_events, feat_views, last_cents
      | FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
      |  CAST(count(*) OVER w AS BIGINT) AS feat_events,
      |  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w, 0) AS BIGINT) AS feat_views,
      |  CAST(coalesce(last(CAST(round(value * 100) AS BIGINT) IGNORE NULLS) OVER w, -1) AS BIGINT) AS last_cents
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      | WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin.replace("\n", " ")

  /** SCD2 dimension build from the event log: collapse each user's
    * consecutive runs of equal `tier` (a bounded categorical derived
    * from the event payload) into half-open validity intervals
    * `[valid_from_us, valid_to_us)` with a per-user version counter —
    * the slowly-changing-dimension table a warehouse derives from a
    * change stream.
    *
    * Two user-keyed windows, the second over CHANGE POINTS only (a
    * relation bounded by actual attribute changes, usually ≪ events):
    * pass 1 marks rows where tier differs from its predecessor under
    * the (µs, event_id) order; pass 2 numbers the surviving intervals
    * and closes each with its successor's start (`Long.MaxValue`
    * sentinel for the open current interval). Both shuffles are on
    * user_id, so AQE coalesces them into one exchange reuse. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    // spread before the JSON-parse projection (r13; the pii-regex
    // criterion): get_json_object per event row is far heavier than a
    // row copy, and the single-file canonical corpus otherwise runs the
    // parse as ONE task (profiled: 636 ms of a 1150 ms stage wall on one
    // core). Identity at real scale where splits cover the cores; the
    // window result is partitioning-independent (total (ts_us, event_id)
    // order per user).
    graft.DatasetCache.spread(events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("props")))
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"),
        coalesce(get_json_object(col("props"), "$.k").cast(LongType) % 4,
          lit(-1L)).as("tier"))
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .filter(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))
      .select(col("user_id"), col("tier"),
        row_number().over(w).cast(LongType).as("version"),
        col("ts_us").as("valid_from_us"),
        coalesce(lead(col("ts_us"), 1).over(w), lit(Long.MaxValue))
          .as("valid_to_us"))
      .orderBy("user_id", "version")
  }

  val scd2Sql: String =
    """WITH t AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |  coalesce(CAST(json_extract(props, '$.k') AS BIGINT) % 4, -1) AS tier FROM events),
      | c AS (SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM t),
      | cp AS (SELECT user_id, ts_us, event_id, tier FROM c WHERE prev IS NULL OR prev != tier)
      | SELECT user_id, tier, CAST(row_number() OVER w AS BIGINT) AS version,
      |  ts_us AS valid_from_us,
      |  coalesce(lead(ts_us) OVER w, 9223372036854775807) AS valid_to_us
      | FROM cp WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      | ORDER BY user_id, version""".stripMargin.replace("\n", " ")

  /** SCD2 upsert delta — the MERGE update set that applies a change
    * batch to a [[scd2]]-shaped dimension table: each affected user's
    * OPEN interval closed at the change timestamp, plus the new version
    * row opened there. No-op changes (same tier as the open interval)
    * and stale changes (ts not after the open interval's start — they
    * cannot tile) drop out. `dim_key = user_id·10⁶ + version` is the
    * surrogate MERGE key, so closing an interval REWRITES its row
    * (matched key) while the new version INSERTS (fresh key) — one
    * atomic copy-on-write commit via [[graft.lake.LakeTable.merge]].
    *
    * Scale shape: ONE keyed left join of the change batch against the
    * open slice of the dimension (no hints — AQE broadcasts a small
    * batch itself); the delta is O(changes), never O(dimension), so the
    * lake's file-granular MERGE rewrites only the files holding touched
    * users. Caller contract: one change row per user per batch (the
    * merge layer rejects duplicate keys). */
  def scd2Delta(dim: DataFrame, changes: DataFrame): DataFrame = {
    val open = dim.filter(col("valid_to_us") === lit(Long.MaxValue))
      .select(col("user_id"), col("tier").as("cur_tier"),
        col("version").as("cur_version"),
        col("valid_from_us").as("cur_from"))
    val c = changes
      .select(col("user_id"), col("tier").as("new_tier"), col("ts_us"))
      .join(open, Seq("user_id"), "left")
      .filter(col("cur_tier").isNull ||
        (col("cur_tier") =!= col("new_tier") && col("ts_us") > col("cur_from")))
    val closed = c.filter(col("cur_tier").isNotNull).select(
      col("user_id"), col("cur_tier").as("tier"),
      col("cur_version").as("version"),
      col("cur_from").as("valid_from_us"), col("ts_us").as("valid_to_us"))
    val fresh = c.select(
      col("user_id"), col("new_tier").as("tier"),
      coalesce(col("cur_version") + 1, lit(1L)).as("version"),
      col("ts_us").as("valid_from_us"),
      lit(Long.MaxValue).as("valid_to_us"))
    // surrogate-key domain: dim_key = user_id * 10^6 + version is
    // injective only while version < 10^6 and user_id fits the Long
    // headroom — a silent collision would corrupt MERGE matching, so
    // out-of-domain rows fail loudly instead (assert_true throws)
    val keyOk = col("version") < lit(Scd2VersionCap) &&
      col("user_id").between(lit(0L), lit(Long.MaxValue / Scd2VersionCap - 1))
    closed.unionByName(fresh)
      .withColumn("dim_key",
        when(assert_true(keyOk, concat(
          lit(s"scd2Delta: surrogate key out of domain (need 0 <= user_id " +
            s"< ${Long.MaxValue / Scd2VersionCap} and version < " +
            s"$Scd2VersionCap), got user_id="),
          col("user_id"), lit(" version="), col("version"))).isNull,
          col("user_id") * lit(Scd2VersionCap) + col("version")))
  }

  /** `dim_key = user_id * Scd2VersionCap + version`: the versions-per-
    * user bound that keeps the SCD2 surrogate key injective (enforced
    * per row in [[scd2Delta]]). */
  val Scd2VersionCap: Long = 1000000L

  /** Per-user moving sum over a 3-row frame (2 preceding + current) in
    * event-time order — the frame-based window shape (moving averages,
    * rolling risk scores). One shuffle on user_id, then a linear pass
    * per partition; integer cents keep the frame sum exact. */
  def movingSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events(spark, dir)
      .withColumn("cents", round(col("value") * 100).cast(LongType))
      .select(col("event_id"), col("user_id"), col("cents"),
        sum(col("cents")).over(w).as("mov3"))
      .orderBy("event_id")
  }

  val movingSumSql: String =
    """SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents,
      | CAST(sum(CAST(round(value * 100) AS BIGINT))
      |  OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3
      | FROM events ORDER BY event_id""".stripMargin.replace("\n", " ")

  val UsPerDay: Long = 86400L * 1000 * 1000

  /** Cohort retention: users grouped by their first active day, with
    * day-1 and day-7 return counts — the canonical growth-analytics
    * rollup. One distinct pass compresses events to (user, day), so
    * every later stage works on the tiny distinct relation, not the
    * event log; the remaining shuffles are all user-keyed aggregations
    * of that compressed set. Days are integer floor-divisions of the
    * µs timestamp, so both engines bucket identically. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ud = events(spark, dir)
      .select(col("user_id"), expr(s"(ts div 1000) div $UsPerDay").as("day"))
      .distinct()
    val cohort = ud.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ud.join(cohort, "user_id")
      .groupBy("cohort_day")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("day") === col("cohort_day") + 1, col("user_id")))
          .as("d1"),
        countDistinct(when(col("day") === col("cohort_day") + 7, col("user_id")))
          .as("d7"))
      .orderBy("cohort_day")
  }

  val retentionSql: String =
    s"""WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // $UsPerDay AS day FROM events),
       | c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
       | SELECT c.cohort_day, count(DISTINCT c.user_id) AS n_users,
       |  count(DISTINCT CASE WHEN ud.day = c.cohort_day + 1 THEN ud.user_id END) AS d1,
       |  count(DISTINCT CASE WHEN ud.day = c.cohort_day + 7 THEN ud.user_id END) AS d7
       | FROM ud JOIN c ON ud.user_id = c.user_id
       | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** Top-3 events by value within each event type (window rank over a
    * keyed shuffle; rank ties broken by event_id for determinism). */
  def topByType(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents").desc, col("event_id").asc)
    events(spark, dir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .orderBy("event_type", "rn")
  }

  val topByTypeSql: String =
    """SELECT event_id, event_type, cents, rn FROM (
      | SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id ASC) AS BIGINT) AS rn
      | FROM events) WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin.replace("\n", " ")

  // ---- deterministic HLL sketch (oracle-exact approx-distinct) --------

  /** Register count m = 64 (6-bit bucket index out of the 28-bit hash). */
  val HllBuckets: Int = 64
  private val TailBits = 22 // 28 - 6
  private val TailMod = 1L << TailBits // 4194304
  private val EmptyWeight = 1L << (TailBits + 1) // 2^23: rho=0 contribution

  /** Numerator of the raw HLL estimate with alpha_64 = 709/1000 kept
    * exact-rational: estimate = HllRawNum / (1000 * harmonic_scaled),
    * evaluated as BIGINT floor division in BOTH engines (709 * 64^2 *
    * 2^23 = 24361054502912, well inside int64). */
  private val HllRawNum: Long = 709L * HllBuckets * HllBuckets * EmptyWeight

  /** Linear-counting estimates m*ln(m/V) for every possible empty-
    * register count V in 1..m-1, precomputed ONCE here and embedded as
    * integer literals in both engines' plans — ln is transcendental,
    * so the only way both engines agree bit-exactly is to never let
    * either of them evaluate it. */
  private val LcTable: Seq[Long] = (1 until HllBuckets).map(v =>
    math.round(HllBuckets.toDouble * math.log(HllBuckets.toDouble / v)))

  /** Bucket count of the equal-width histogram quantile sketch. */
  val HistBuckets: Int = 1000

  /** The DuckDB bit-length comparison ladder over `tail` — shared by
    * every oracle that replays the deterministic HLL. */
  private def bitLenLadderSql: String =
    ((TailBits to 1 by -1)
      .map(k => s"WHEN tail >= ${1L << (k - 1)} THEN $k") :+ "ELSE 0")
      .mkString(" ")

  /** HyperLogLog built from scratch on deterministic integer arithmetic,
    * so the sketch itself is ORACLE-EXACT (unlike engine-native HLLs,
    * whose hashes differ): bucket = top 6 bits of the md5-derived 28-bit
    * hash, rho = leading-zero rank of the 22-bit tail, and the harmonic
    * denominator is emitted as the order-free integer
    * `sum(2^(23-M_j))` (+ 2^23 per empty register) instead of the float
    * `sum(2^-M_j)`. The float estimate `alpha*m^2*2^23/harmonic_scaled`
    * is one engine-local division away (done in the spec, not the hash-
    * compared output). Distributes as two partial-agg groupBys, like any
    * HLL merge. */
  def hllUsers(spark: SparkSession, dir: String): DataFrame =
    hllRegisters(spark, dir).orderBy("event_type")

  /** The per-type HLL register state (event_type, used_buckets,
    * harmonic_scaled), unsorted — shared by [[hllUsers]] (which emits it
    * verbatim) and [[approxStats]] (which folds it into the integer
    * estimate). */
  private def hllRegisters(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Md5Prefix.register(spark)
    val h = call_function("md5_prefix",
      col("user_id").cast("string"), lit(1), lit(7))
    // bit length of the tail via an integer comparison ladder (log2 on
    // doubles is off-by-one-ulp-hazardous at exact powers of two)
    var bl: Column = when(col("tail") >= (1L << (TailBits - 1)), lit(TailBits))
    for (k <- (TailBits - 1) to 1 by -1)
      bl = bl.when(col("tail") >= (1L << (k - 1)), lit(k))
    val rho = lit(TailBits + 1) - bl.otherwise(lit(0))
    events(spark, dir)
      .select(col("event_type"), col("user_id"), h.as("h"))
      .select(col("event_type"),
        expr(s"h div $TailMod").as("bucket"), (col("h") % TailMod).as("tail"))
      .groupBy("event_type", "bucket")
      .agg(max(rho).cast(LongType).as("mreg"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("used_buckets"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${TailBits + 1} - mreg AS INT))"))
          + (lit(HllBuckets.toLong) - count(lit(1))) * lit(EmptyWeight))
          .as("harmonic_scaled"))
  }

  val hllUsersSql: String = {
    val ladder = bitLenLadderSql
    s"""SELECT event_type, CAST(count(*) AS BIGINT) AS used_buckets,
       | CAST(sum(CAST(1 AS BIGINT) << CAST(${TailBits + 1} - mreg AS INTEGER))
       |   + ($HllBuckets - count(*)) * $EmptyWeight AS BIGINT) AS harmonic_scaled
       | FROM (
       |  SELECT event_type, bucket, CAST(max(${TailBits + 1} - (CASE $ladder END)) AS BIGINT) AS mreg
       |  FROM (
       |   SELECT event_type, hv // $TailMod AS bucket, hv % $TailMod AS tail
       |   FROM (SELECT event_type, CAST('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,7) AS BIGINT) AS hv FROM events))
       |  GROUP BY 1, 2)
       | GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " ")
  }

  /** 3-sigma outlier counts per event type — the anomaly-report shape —
    * in ALL-INTEGER arithmetic so both engines agree exactly: with
    * integer cents, `(x - mean)² > 9σ²` rewrites to
    * `(x·n − sum)² > 9·(n·sumsq − sum²)` (multiply through by n²), every
    * term an exact integer. The big products run in DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB) — `(x·n − sum)²` reaches ~1e20 at sf0.1,
    * past int64. Plan: one aggregation for the per-type moments (5 rows,
    * broadcast back), then a map-side conditional count — two scans of
    * the fact table and nothing data-sized ever shuffles. */
  def outliers(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100).cast(LongType)
    val base = events(spark, dir).select(col("event_type"), cents.as("c"))
    val stats = base.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("ss"))
    val dev = (col("c") * col("n") - col("s")).cast("decimal(38,0)")
    val isOut = dev * dev >
      lit(9) * (col("n").cast("decimal(38,0)") * col("ss") -
        col("s").cast("decimal(38,0)") * col("s"))
    base.join(broadcast(stats), "event_type")
      .groupBy("event_type")
      .agg(sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
        max(col("n")).as("n_events"))
      .orderBy("event_type")
  }

  /** Time-series spike detection: per (type, day, hour-of-day) event
    * counts tested against that (type, hour-of-day)'s OWN cross-day
    * baseline — the monitoring query that catches "payments spiked at
    * 14:00 Tuesday" without flagging types that are always busy at
    * 14:00. Spike test = the all-integer 3-sigma form of [[outliers]]
    * (`(c·n − s)² > 9·(n·ss − s²)` in DECIMAL(38,0)/HUGEINT), one-sided
    * (`c·n − s > 0`: spikes, not droughts).
    *
    * Scale: one map-side-combined aggregation compresses the corpus to
    * (type × day × 24) cells — the fact table's ONLY pass — and the
    * baseline moments are whole-partition window aggregates over that
    * bounded relation ((type × 24) partitions of ≤days rows), so
    * nothing rescans events and nothing joins. */
  def anomalyCells(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nsPerDay = NsPerDay
    val cells = events(spark, dir)
      .groupBy(col("event_type"),
        expr(s"ts div $nsPerDay").as("day_id"),
        expr(s"(ts % $nsPerDay) div $NsPerHour").as("hod"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type", "hod")
    val dev = (col("c") * col("n") - col("s")).cast("decimal(38,0)")
    cells
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("c").over(w))
      .withColumn("ss", sum(col("c").cast("decimal(38,0)") * col("c")).over(w))
      .filter(col("c") * col("n") - col("s") > 0 &&
        dev * dev > lit(9) * (col("n").cast("decimal(38,0)") * col("ss") -
          col("s").cast("decimal(38,0)") * col("s")))
      .select(col("event_type"), col("day_id"), col("hod"), col("c").as("cnt"))
      .orderBy("event_type", "day_id", "hod")
  }

  val anomalyCellsSql: String = {
    val nsPerDay = NsPerDay
    s"""WITH cells AS (
       |  SELECT event_type, epoch_ns(ts) // $nsPerDay AS day_id,
       |   (epoch_ns(ts) % $nsPerDay) // $NsPerHour AS hod, count(*) AS c
       |  FROM events GROUP BY 1, 2, 3),
       | st AS (SELECT event_type, hod, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
       |   sum(CAST(c AS HUGEINT) * c) AS ss FROM cells GROUP BY 1, 2)
       |SELECT cells.event_type, day_id, hod, CAST(c AS BIGINT) AS cnt
       |FROM cells JOIN st USING (event_type, hod)
       |WHERE c * n - s > 0 AND CAST(c * n - s AS HUGEINT) * (c * n - s)
       |  > 9 * (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
       |ORDER BY event_type, day_id, hod""".stripMargin.replace("\n", " ")
  }

  val outliersSql: String =
    """WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
      | st AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
      |   sum(CAST(c AS HUGEINT) * c) AS ss FROM c GROUP BY 1)
      | SELECT c.event_type,
      |  CAST(sum(CASE WHEN CAST(c.c * st.n - st.s AS HUGEINT) * (c.c * st.n - st.s)
      |    > 9 * (CAST(st.n AS HUGEINT) * st.ss - CAST(st.s AS HUGEINT) * st.s)
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(max(st.n) AS BIGINT) AS n_events
      | FROM c JOIN st USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** EXACT per-type heavy users (every user with more than n_type/denom
    * of their type's events) — the GROUPED form of the two-pass
    * Misra-Gries plan ([[graft.text.TextOps.docHeavyHitters]] is the
    * global form): pass 1 is ONE exchange carrying ≤2·denom counters
    * per (partition, event_type) regardless of user cardinality, whose
    * per-type candidate sets provably contain every over-threshold
    * user; pass 2 exactly counts ONLY candidates (broadcast semi-join
    * of the bounded |types|·2·denom candidate list, candidate-sized
    * aggregation) and applies the exact per-type threshold. The sketch
    * only ever ADDS false candidates — pass 2 removes them — so the
    * oracle is a plain per-type GROUP BY/HAVING. */
  def heavyUsers(denom: Int)(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.MgSketchAgg.register(spark)
    val ev = events(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    val sk = ev.groupBy("event_type")
      .agg(call_function("mg_sketch", col("u"), lit(2 * denom)).as("sk"))
      .select(col("event_type"), col("sk.n").as("n"),
        explode(col("sk.terms")).as("u"))
    // bounded: |event types| × 2·denom rows → broadcast both ways
    val cands = sk.select("event_type", "u")
    val totals = sk.select("event_type", "n").distinct()
    ev.join(broadcast(cands), Seq("event_type", "u"), "left_semi")
      .groupBy("event_type", "u")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), "event_type")
      .filter(col("cnt") * denom > col("n"))
      .select(col("event_type"), col("u").cast(LongType).as("user_id"),
        col("cnt"))
      .orderBy(col("event_type"), col("cnt").desc, col("user_id"))
  }

  def heavyUsersSql(denom: Int): String =
    s"""WITH e AS (SELECT event_type, user_id FROM events),
       | n AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1)
       | SELECT e.event_type, user_id, count(*) AS cnt
       | FROM e JOIN n USING (event_type)
       | GROUP BY e.event_type, user_id, n.n
       | HAVING count(*) * $denom > n.n
       | ORDER BY event_type, cnt DESC, user_id""".stripMargin.replace("\n", " ")

  /** [[hllUsers]] through the native [[graft.functions.HllSketchAgg]]
    * aggregate instead of the two-level groupBy: ONE exchange, 64 bytes
    * of shuffled state per (partition, group). Identical output — the
    * SAME oracle SQL gates both spellings, which is itself the proof
    * that the native aggregate's register algebra matches the published
    * formulation. */
  def hllUsersAgg(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.HllSketchAgg.register(spark)
    graft.functions.Md5Prefix.register(spark)
    val h = call_function("md5_prefix",
      col("user_id").cast("string"), lit(1), lit(7))
    events(spark, dir)
      .select(col("event_type"), h.as("h"))
      .groupBy("event_type")
      .agg(call_function("hll_sketch", col("h")).as("sk"))
      .select(col("event_type"),
        col("sk.used_buckets").as("used_buckets"),
        col("sk.harmonic_scaled").as("harmonic_scaled"))
      .orderBy("event_type")
  }

  /** The float HLL estimate from the sketch's integer state (driver/spec
    * side — deliberately outside the hash-compared surface). */
  def hllEstimate(usedBuckets: Long, harmonicScaled: Long): Double = {
    val m = HllBuckets.toDouble
    val alpha = 0.709 // published alpha_64
    val raw = alpha * m * m * EmptyWeight.toDouble / harmonicScaled.toDouble
    if (raw <= 2.5 * m && usedBuckets < HllBuckets)
      m * math.log(m / (m - usedBuckets.toDouble)) // linear counting
    else raw
  }

  // ---- exact rank-based quantiles -------------------------------------

  /** Exact p50/p90/p99 of the integer cent value per event type, by order
    * statistic (rank `1 + p*(n-1)/100`, lower value on ties via a total
    * (cents, event_id) order). Engine-agnostic by construction — no
    * interpolation, no float percentile semantics. One shuffle. */
  /** The (event_type, cents) value HISTOGRAM with each value's covered
    * rank interval [lo_rank, hi_rank] under (cents asc) order, plus the
    * per-type total `n` — the exact-quantile substrate shared by
    * [[quantiles]] and [[valueDeciles]].
    *
    * Scale: the obvious per-row plan (row_number over an event_type
    * partition) sorts a WHOLE TYPE in one task — event_type is a
    * bounded categorical, so those partitions are corpus-sized at
    * 100 TB (the same hollow-window trap the budget selection's
    * quantile bucketing closes). The histogram groupBy is map-side
    * combinable and its running sum windows over DISTINCT VALUES —
    * money-cents is a bounded value domain, orders of magnitude
    * smaller than the row count. Rank values are tiebreak-free by
    * construction: equal cents are adjacent in rank order, so the
    * VALUE at any rank never depends on the event_id tiebreak the
    * per-row spelling (and the oracle) use.
    *
    * The rank population is explicitly NULL-FREE: Spark windows sort
    * NULL first under ASC while DuckDB defaults to NULLS LAST, so a
    * null `value` would shift every rank differently in the two
    * engines — a latent divergence a null-less fixture can never
    * catch. Both spellings filter nulls, making the semantics
    * well-defined instead of engine-dependent. */
  private def centsRankHistogram(spark: SparkSession, dir: String): DataFrame = {
    val hist = events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), round(col("value") * 100).cast(LongType).as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
    val byTypeVal = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-type totals: a bounded-categorical relation; AQE broadcasts
    val n = hist.groupBy("event_type").agg(sum("c").as("n"))
    hist.withColumn("hi_rank", sum("c").over(byTypeVal))
      .withColumn("lo_rank", col("hi_rank") - col("c") + 1)
      .join(n, "event_type")
  }

  def quantiles(spark: SparkSession, dir: String): DataFrame = {
    def pick(p: Int): Column = {
      val r = expr(s"1 + ($p * (n - 1)) div 100")
      max(when(col("lo_rank") <= r && r <= col("hi_rank"), col("cents")))
    }
    centsRankHistogram(spark, dir)
      .groupBy("event_type")
      .agg(max(col("n")).as("n_events"),
        pick(50).as("p50_cents"),
        pick(90).as("p90_cents"),
        pick(99).as("p99_cents"))
      .orderBy("event_type")
  }

  val quantilesSql: String =
    """SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
      | max(CASE WHEN rn = 1 + (50 * (n - 1)) // 100 THEN cents END) AS p50_cents,
      | max(CASE WHEN rn = 1 + (90 * (n - 1)) // 100 THEN cents END) AS p90_cents,
      | max(CASE WHEN rn = 1 + (99 * (n - 1)) // 100 THEN cents END) AS p99_cents
      | FROM (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |   CAST(row_number() OVER (PARTITION BY event_type ORDER BY CAST(round(value * 100) AS BIGINT) ASC, event_id ASC) AS BIGINT) AS rn,
      |   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM events WHERE value IS NOT NULL)
      | GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " ")

  /** Equi-depth feature discretization: every non-null event value is
    * assigned to one of `bins` rank bins per event type (bin of the row
    * at rank r out of n = `((r-1)·B) div n` — the floor-NTILE rule),
    * reported as per-(type, bin) row counts, value sums, and bin value
    * bounds. The quantile-binning transform feature pipelines apply
    * before training on heavy-tailed monetary features.
    *
    * Scale shape: the ranks come from the same bounded VALUE HISTOGRAM
    * as [[quantiles]] — never a per-row corpus window (the hollow-window
    * class the r6 audit banned). Each histogram row knows its rank
    * interval [lo, hi]; the rows of one value fall into the ≤B bins
    * intersecting that interval, so a bounded explode + exact integer
    * interval arithmetic turns the histogram into per-(type, bin)
    * aggregates. The oracle states the same semantics per row with the
    * (cents, event_id)-ordered rank — equal values straddling a bin
    * boundary split purely by count, so the per-bin sums cannot depend
    * on the tiebreak. */
  def valueBins(bins: Int)(spark: SparkSession, dir: String): DataFrame = {
    // rows r with ((r-1)B) div n = k form [ceil(kn/B)+1, ceil((k+1)n/B)]
    val binLo = expr(s"((lo_rank - 1) * $bins) div n")
    val binHi = expr(s"((hi_rank - 1) * $bins) div n")
    centsRankHistogram(spark, dir)
      .select(col("event_type"), col("cents"), col("lo_rank"),
        col("hi_rank"), col("n"),
        explode(sequence(binLo, binHi)).as("bin"))
      .withColumn("ov",
        least(col("hi_rank"),
          expr(s"((bin + 1) * n + $bins - 1) div $bins")) -
        greatest(col("lo_rank"),
          expr(s"(bin * n + $bins - 1) div $bins + 1")) + 1)
      // a value's [lo, hi] interval can touch a bin whose own rank range
      // is empty (n < bins with a duplicated value spanning the gap);
      // such rows carry ov = 0 but would still mint an (event_type, bin)
      // group with n_rows = 0 and phantom min/max — the per-row oracle
      // never produces that group, so drop zero-overlap rows pre-agg
      .filter(col("ov") > 0)
      .groupBy("event_type", "bin")
      .agg(sum(col("ov")).as("n_rows"),
        sum(col("cents") * col("ov")).as("cents_sum"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy("event_type", "bin")
  }

  def valueBinsSql(bins: Int): String =
    s"""SELECT event_type, ((rn - 1) * $bins) // n AS bin,
       | count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS cents_sum,
       | min(cents) AS min_cents, max(cents) AS max_cents
       | FROM (
       |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
       |   CAST(row_number() OVER (PARTITION BY event_type ORDER BY CAST(round(value * 100) AS BIGINT) ASC, event_id ASC) AS BIGINT) AS rn,
       |   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM events WHERE value IS NOT NULL)
       | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** Winsorized (clamped-tail) value statistics per event type: every
    * cents value clamps into [p05, p95] before summing — the robust
    * aggregate feature pipelines use on heavy-tailed monetary features
    * where a single outlier dominates a plain mean. Cuts use the same
    * exact rank rule as [[quantiles]].
    *
    * Scale shape: both phases run on the bounded (type, cents) VALUE
    * HISTOGRAM — the cut extraction is one aggregation of it, the
    * clamped sum a second (weighted by the histogram counts); no
    * per-row rank window exists anywhere (the hollow-window rule). */
  def winsorized(spark: SparkSession, dir: String): DataFrame = {
    val h = centsRankHistogram(spark, dir)
    def pick(p: Int): Column = {
      val r = expr(s"1 + ($p * (n - 1)) div 100")
      max(when(col("lo_rank") <= r && r <= col("hi_rank"), col("cents")))
    }
    val cuts = h.groupBy("event_type")
      .agg(pick(5).as("p05"), pick(95).as("p95"))
    h.join(cuts, Seq("event_type"))
      .select(col("event_type"), col("c"),
        least(greatest(col("cents"), col("p05")), col("p95")).as("w"),
        col("p05"), col("p95"))
      .groupBy("event_type")
      .agg(sum(col("c")).as("n_rows"),
        sum(col("w") * col("c")).as("wsum_cents"),
        max(col("p05")).as("p05_cents"), max(col("p95")).as("p95_cents"))
      .orderBy("event_type")
  }

  val winsorizedSql: String =
    """WITH r AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |   CAST(row_number() OVER (PARTITION BY event_type ORDER BY CAST(round(value * 100) AS BIGINT) ASC, event_id ASC) AS BIGINT) AS rn,
      |   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM events WHERE value IS NOT NULL),
      | c AS (SELECT event_type,
      |   max(CASE WHEN rn = 1 + (5 * (n - 1)) // 100 THEN cents END) AS p05,
      |   max(CASE WHEN rn = 1 + (95 * (n - 1)) // 100 THEN cents END) AS p95
      |  FROM r GROUP BY 1)
      | SELECT r.event_type, count(*) AS n_rows,
      |  CAST(sum(least(greatest(cents, p05), p95)) AS BIGINT) AS wsum_cents,
      |  max(p05) AS p05_cents, max(p95) AS p95_cents
      | FROM r JOIN c ON r.event_type = c.event_type
      | GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** Exact audience overlap between event types: |users(A) ∩ users(B)|
    * and the Jaccard ppm for every unordered type pair — the
    * segment-overlap report behind campaign planning ("how much of the
    * click audience also signs up"), and the exact ground truth the HLL
    * sketch family approximates.
    *
    * Scale shape: ONE distinct pass compresses the log to (type, user);
    * the pair join is a self-equi-join ON user_id, so per-user fan-out
    * is (types-per-user)² ≤ |types|² — bounded categorical, never row
    * count; the final aggregate has ≤ |types|² keys. No hints — the
    * distinct relation is user-sized and AQE decides. */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val d = events(spark, dir).select(col("event_type"), col("user_id")).distinct()
    val n = d.groupBy("event_type").agg(count(lit(1)).as("n"))
    val a = d.select(col("event_type").as("t1"), col("user_id"))
    val b = d.select(col("event_type").as("t2"), col("user_id"))
    a.join(b, Seq("user_id")).filter(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("inter"))
      .join(n.select(col("event_type").as("t1"), col("n").as("n1")), Seq("t1"))
      .join(n.select(col("event_type").as("t2"), col("n").as("n2")), Seq("t2"))
      .select(col("t1"), col("t2"), col("n1"), col("n2"), col("inter"),
        expr("inter * 1000000 div (n1 + n2 - inter)").as("jaccard_ppm"))
      .orderBy("t1", "t2")
  }

  val audienceOverlapSql: String =
    """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
      | n AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1),
      | p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS inter
      |  FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      | SELECT t1, t2, n1.n AS n1, n2.n AS n2, inter,
      |  CAST(inter * 1000000 // (n1.n + n2.n - inter) AS BIGINT) AS jaccard_ppm
      | FROM p JOIN n n1 ON p.t1 = n1.event_type JOIN n n2 ON p.t2 = n2.event_type
      | ORDER BY t1, t2""".stripMargin.replace("\n", " ")

  val UsPerWeek: Long = 7L * 86400L * 1000 * 1000

  /** Cohort lifetime-value matrix: users cohorted by their FIRST
    * purchase week; revenue summed per (cohort_week, weeks-since-cohort)
    * cell — the LTV curve report next to [[retention]]'s activity
    * counts.
    *
    * Scale: first-purchase week is one map-side-combined aggregation on
    * user_id; the purchase relation joins and re-aggregates — the join
    * reuses the groupBy's exchange (same key), the final aggregate's
    * key space is weeks × ages (bounded by the time span squared, tiny),
    * and the distinct-user count inside it is distinct-compressed by
    * Spark's planner. All time math in integer µs. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"(ts div 1000) div $UsPerWeek").as("week"),
        round(col("value") * 100).cast(LongType).as("cents"))
    val cohort = e.groupBy("user_id").agg(min("week").as("cohort_week"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("age_weeks"))
      .agg(countDistinct("user_id").as("n_users"), sum("cents").as("cents"))
      .orderBy("cohort_week", "age_weeks")
  }

  val cohortLtvSql: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // $UsPerWeek AS week,
       |   CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       | c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
       | SELECT c.cohort_week, e.week - c.cohort_week AS age_weeks,
       |  count(DISTINCT e.user_id) AS n_users, CAST(sum(e.cents) AS BIGINT) AS cents
       | FROM e JOIN c USING (user_id)
       | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** Touch channels eligible for attribution credit, in the fixture's
    * event vocabulary (everything except `purchase` and `error`). */
  val AttributionTouches: Seq[String] = Seq("click", "signup", "view")

  /** Last-touch revenue attribution: every purchase credits its user's
    * most recent PRECEDING touch event (click/signup/view), `direct`
    * when the user never touched before buying — the standard marketing
    * report, and the same carry-forward window shape as [[asOfJoin]]
    * generalized to a channel vocabulary.
    *
    * Time discipline: ordered by (microsecond time, event_id) — DuckDB
    * only sees µs-truncated timestamps, so ns-resolution order could
    * silently disagree on same-µs pairs (the [[asOfJoin]]/
    * [[GraphOps.transitionCounts]] rule). The window includes the
    * current row, but a purchase row's own `touch` is NULL (purchases
    * are not touches) so it can never credit itself.
    *
    * Scale: one scan, one window shuffle on user_id (the sessionize
    * exchange), then a groupBy on a BOUNDED categorical key (≤4 rows)
    * — map-side combined, no second fact shuffle. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val byUserTime = Window.partitionBy("user_id")
      .orderBy(expr("ts div 1000"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .filter(col("event_type").isin(AttributionTouches :+ "purchase": _*))
      .withColumn("touch",
        when(col("event_type").isin(AttributionTouches: _*), col("event_type")))
      .withColumn("channel",
        coalesce(last(col("touch"), ignoreNulls = true).over(byUserTime),
          lit("direct")))
      .filter(col("event_type") === "purchase")
      .groupBy("channel")
      // coalesce(sum, 0): a channel whose purchases are ALL NULL-valued
      // would otherwise report NULL cents while the streaming twin
      // (which coalesces per row before summing) reports 0 — align the
      // two arms on 0 (both spellings; the fixture never hits it, the
      // streaming replay spec does)
      .agg(count(lit(1)).as("n_purchases"),
        coalesce(sum(round(col("value") * 100).cast(LongType)), lit(0L))
          .as("cents"))
      .orderBy("channel")
  }

  val attributionSql: String = {
    val touches = AttributionTouches.map(t => s"'$t'").mkString(",")
    s"""SELECT channel, count(*) AS n_purchases,
       | CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0) AS BIGINT) AS cents
       | FROM (
       |  SELECT event_type, value,
       |   coalesce(last(CASE WHEN event_type IN ($touches) THEN event_type END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING),
       |    'direct') AS channel
       |  FROM events WHERE event_type IN ($touches, 'purchase'))
       | WHERE event_type = 'purchase'
       | GROUP BY channel ORDER BY channel""".stripMargin.replace("\n", " ")
  }
}
