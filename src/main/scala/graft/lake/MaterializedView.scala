package graft.lake

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained materialized aggregate over a lake table —
  * the lakehouse answer to "this 100 TB fact table is re-aggregated by
  * every dashboard query". The view is itself a lake table (transactional
  * state, time travel, crash-safe), and each refresh folds ONLY the
  * source's row-level change feed since the last refresh into the stored
  * state: cost is O(changes + view size), never O(source size).
  *
  * Maintained aggregates: `count(*)` and `sum(measure)` per group (plus
  * per-measure non-null counts, so SQL's null-when-no-non-null-input
  * semantics survive deletion back to zero) are self-maintainable under
  * EVERY change type. `avg` is derivable (`sum/cnt`). `min`/`max` are
  * maintainable only under growth — a delete can remove the current
  * extremum, which no summary short of per-group history can repair —
  * so a view that declares min/max columns folds INSERT-ONLY change
  * ranges incrementally (the dominant append workload) and falls back
  * to a full recompute whenever the range carries a delete or update:
  * exact always, incremental whenever theory permits.
  *
  * Change semantics: an `insert`/`update_postimage` row carries weight
  * +1, a `delete`/`update_preimage` row weight −1 — the classic
  * delta-multiset view-maintenance rule, fed by [[LakeTable.changeFeed]]
  * (which serves every append and every CDC-staging DML verb). Ranges
  * the feed cannot serve exactly (whole-table rewrites, schema changes,
  * pre-CDF commits) fall back to a FULL recompute at the target version
  * — never a wrong incremental state.
  *
  * Refresh is exactly-once and stale-proof: the view overwrite carries a
  * monotone idempotence token ([[LakeTable.overwriteIdempotent]]) bound
  * to the SOURCE version it derives from, so a replayed refresh is a
  * no-op and a stale maintainer racing a newer one aborts rather than
  * clobbering newer state.
  *
  * Scale shape: the delta aggregation shuffles only the CHANGED rows;
  * the state merge is one view-sized null-safe full-outer join on the
  * group keys. Nothing driver-sized anywhere.
  */
object MaterializedView {

  /** appId under which refreshes token their source version. */
  private val MvApp = "graft-mv"

  /** Hidden state columns. */
  private[lake] val CntCol = "_mv_cnt"
  private def sumName(c: String) = s"_mv_sum_$c"
  private def nnName(c: String) = s"_mv_nn_$c"
  private def minName(c: String) = s"_mv_min_$c"
  private def maxName(c: String) = s"_mv_max_$c"

  /** How the last [[refresh]] landed — observability for specs pinning
    * that appends stay incremental and deletes trigger the min/max
    * recompute fallback. "incremental" | "full" | "noop". */
  private[graft] var lastRefreshMode: String = ""

  /** Sidecar carrying the view definition (written once at create). */
  private def specFile(view: String) = Paths.get(view, "_mv_spec")

  final case class Spec(source: String, groupCols: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String] = Nil)

  /** Define the view over `source` and build its initial state at the
    * source's current version. Validates the definition against the
    * source schema NOW (unknown columns, non-numeric or decimal
    * measures refuse loudly) so a bad definition cannot fail at the
    * first refresh instead. */
  def create(spark: SparkSession, view: String, source: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty, "materialized view: at least one group column")
    require(!Files.exists(specFile(view)), s"view already exists: $view")
    val schemaJson = LakeTable.snapshotFiles(source, None)._2.getOrElse(
      throw new IllegalArgumentException(s"no such lake table: $source"))
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    def resolve(c: String): StructField =
      schema.fields.find(_.name == c)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(c)))
        .getOrElse(throw new IllegalArgumentException(
          s"materialized view: no column `$c` in $source"))
    val g = groupCols.map(resolve(_).name)
    val s = sumCols.map { c =>
      val f = resolve(c)
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
            FloatType | DoubleType => f.name
        case d: DecimalType => throw new IllegalArgumentException(
          s"materialized view: measure `${f.name}` is $d — decimal sums " +
            "widen precision per level and are not supported; cast to " +
            "BIGINT cents (exact) or DOUBLE before ingest")
        case other => throw new IllegalArgumentException(
          s"materialized view: measure `${f.name}` is $other, not numeric")
      }
    }
    val mm = minMaxCols.map { c =>
      val f = resolve(c)
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
            FloatType | DoubleType | StringType | TimestampType |
            DateType | _: DecimalType => f.name
        case other => throw new IllegalArgumentException(
          s"materialized view: min/max column `${f.name}` is $other, " +
            "not an orderable scalar")
      }
    }
    (g ++ s ++ mm).foreach(c => require(!c.contains(",") && !c.contains("\n"),
      s"materialized view: column name `$c` must not contain ',' or newline"))
    writeSpec(view, Spec(source, g, s, mm))
    refresh(spark, view).getOrElse(
      throw new IllegalStateException(s"initial build of $view produced no commit"))
  }

  /** Fold source changes since the last refresh into the view. Returns
    * the view's new version, or None when already current (or when a
    * concurrent maintainer landed an equal-or-newer state first). */
  def refresh(spark: SparkSession, view: String): Option[Long] = {
    val sp = readSpec(view)
    val latest = LakeTable.latestVersion(sp.source).getOrElse(
      throw new IllegalArgumentException(s"no such lake table: ${sp.source}"))
    // the from-token and the state it describes must come from ONE view
    // version: reading the token first and the snapshot lazily-latest
    // would let a concurrent refresh land in between, and the merge
    // would fold the overlapping change range in twice (the monotone
    // token check cannot catch it — the racer's token is older)
    val viewV = LakeTable.latestVersion(view)
    val from = viewV.flatMap(v =>
      LakeTable.lastTxnVersion(view, MvApp, Some(v))).getOrElse(0L)
    if (latest <= from) { lastRefreshMode = "noop"; return None }
    val incremental = from > 0 &&
      LakeTable.changeFeedCovers(sp.source, from, latest) && {
        // min/max views fold only GROWTH: a delete/update in the range
        // can remove a group's current extremum, which the stored state
        // cannot repair — recompute instead (exact always)
        sp.minMaxCols.isEmpty || LakeTable.changeFeed(spark, sp.source, from, latest)
          .filter(col(LakeTable.CdcTypeCol) =!= "insert").isEmpty
      }
    val state =
      if (incremental) {
        lastRefreshMode = "incremental"
        val feed = LakeTable.changeFeed(spark, sp.source, from, latest)
        val w = when(col(LakeTable.CdcTypeCol)
          .isin("insert", "update_postimage"), 1L).otherwise(-1L)
        merge(LakeTable.snapshot(spark, view, viewV), aggState(feed, sp, w), sp)
      } else {
        // re-sync: full recompute pinned AT `latest` (a writer racing past
        // it must not leak rows the token doesn't cover)
        lastRefreshMode = "full"
        aggState(LakeTable.snapshot(spark, sp.source, Some(latest)), sp, lit(1L))
      }
    LakeTable.overwriteIdempotent(spark, view, state, MvApp, latest)
  }

  /** The view as a user-facing DataFrame: group columns, `cnt`, and one
    * `sum_<measure>` per measure — null when the group currently has no
    * non-null measure value, exactly SQL `sum`. */
  def read(spark: SparkSession, view: String): DataFrame = {
    val sp = readSpec(view)
    val st = LakeTable.snapshot(spark, view)
    st.select(sp.groupCols.map(col) ++ Seq(col(CntCol).as("cnt")) ++
      sp.sumCols.map(c =>
        when(col(nnName(c)) > 0, col(sumName(c))).otherwise(lit(null))
          .as(s"sum_$c")) ++
      sp.minMaxCols.flatMap(c => Seq(
        col(minName(c)).as(s"min_$c"), col(maxName(c)).as(s"max_$c"))): _*)
  }

  /** Source version the stored state reflects (0 = never refreshed). */
  def lastSourceVersion(view: String): Long =
    LakeTable.lastTxnVersion(view, MvApp).getOrElse(0L)

  /** Group-and-weigh: one aggregation of `df` with every row counted at
    * `w` (±1 for change rows, +1 for full recompute). Null sums are
    * normalized to typed zeros so state merges are plain additions; the
    * read path reconstructs SQL nulls from the non-null counts. */
  private def aggState(df: DataFrame, sp: Spec, w: Column): DataFrame = {
    val aggs = Seq(sum(w).as(CntCol)) ++ sp.sumCols.flatMap(c => Seq(
      sum(col(c) * w).as(sumName(c)),
      sum(when(col(c).isNotNull, w).otherwise(0L)).as(nnName(c)))) ++
      // weight-free by construction: this path only ever sees +1 rows
      // (full recompute, or a feed the insert-only gate has vetted)
      sp.minMaxCols.flatMap(c => Seq(
        min(col(c)).as(minName(c)), max(col(c)).as(maxName(c))))
    val grouped = df.groupBy(sp.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    sp.sumCols.foldLeft(grouped) { (acc, c) =>
      val t = acc.schema(sumName(c)).dataType
      acc.withColumn(sumName(c), coalesce(col(sumName(c)), lit(0).cast(t)))
    }
  }

  /** Add two states: null-safe full-outer join on the group keys (null
    * IS a group), per-column sums added, groups whose live count hits
    * zero dropped. View-sized shuffle — independent of source size. */
  private def merge(old: DataFrame, delta: DataFrame, sp: Spec): DataFrame = {
    val d = delta.columns.foldLeft(delta)((df, c) =>
      df.withColumnRenamed(c, s"_d_$c"))
    val cond = sp.groupCols.map(c => old(c) <=> d(s"_d_$c"))
      .reduce(_ && _)
    val joined = old.join(d, cond, "full_outer")
    def add(c: String): Column = {
      val t = old.schema(c).dataType
      coalesce(old(c), lit(0).cast(t)) + coalesce(d(s"_d_$c"), lit(0).cast(t))
    }
    // null-safe extremum fold: null state = "no non-null value yet", so
    // the other side wins; both non-null take least/greatest
    def fold(c: String, f: (Column, Column) => Column): Column =
      when(old(c).isNull, d(s"_d_$c"))
        .when(d(s"_d_$c").isNull, old(c))
        .otherwise(f(old(c), d(s"_d_$c")))
    val stateCols =
      sp.groupCols.map(c => coalesce(old(c), d(s"_d_$c")).as(c)) ++
        Seq(add(CntCol).as(CntCol)) ++
        sp.sumCols.flatMap(c => Seq(add(sumName(c)).as(sumName(c)),
          add(nnName(c)).as(nnName(c)))) ++
        sp.minMaxCols.flatMap(c => Seq(
          fold(minName(c), least(_, _)).as(minName(c)),
          fold(maxName(c), greatest(_, _)).as(maxName(c))))
    joined.select(stateCols: _*).filter(col(CntCol) > 0)
  }

  // ---- spec sidecar ----------------------------------------------------

  private def writeSpec(view: String, sp: Spec): Unit = {
    Files.createDirectories(Paths.get(view))
    val body = s"source=${sp.source}\ngroup=${sp.groupCols.mkString(",")}\n" +
      s"sums=${sp.sumCols.mkString(",")}\nminmax=${sp.minMaxCols.mkString(",")}\n"
    val tmp = Paths.get(view, s".tmpspec-${java.util.UUID.randomUUID()}")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, specFile(view), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private[lake] def readSpec(view: String): Spec = {
    require(Files.exists(specFile(view)),
      s"not a materialized view (no _mv_spec): $view")
    val kv = new String(Files.readAllBytes(specFile(view)), UTF_8)
      .linesIterator.filter(_.contains("=".charAt(0)))
      .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }
      .toMap
    def cols(k: String): Seq[String] =
      kv.getOrElse(k, "").split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    // `minmax` may be absent in pre-min/max specs: read as Nil
    Spec(kv("source"), cols("group"), cols("sums"), cols("minmax"))
  }
}
