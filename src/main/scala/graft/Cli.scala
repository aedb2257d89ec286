package graft

import org.apache.spark.sql.SparkSession

import graft.pc.{Layout, Points}
import graft.sources.las.LasConvert

/** Command-line surface mirroring the reference's `pc-cli`
  * (benchmark | convert | merge | partition — pc-cli/src/main.rs), so a
  * user of the reference CLI has a 1:1 entry point here:
  *
  *   sbt "runMain graft.Cli benchmark"
  *   sbt "runMain graft.Cli convert  <las-in> <parquet-out> [seed]"
  *   sbt "runMain graft.Cli merge    <parquet-in> <parquet-out> [rows-per-group]"
  *   sbt "runMain graft.Cli partition <parquet-in> <parquet-out> [grid|quadtree|zorder] [sigma|bits]"
  *
  * `partition`/`merge` operate on any parquet with x/y(/i) columns;
  * `benchmark` delegates to [[Bench]] (env-configured).
  */
object Cli {
  private def session(): SparkSession = LocalSession("8")

  def main(args: Array[String]): Unit = args.toList match {
    case "benchmark" :: Nil =>
      Bench.main(Array.empty)

    case "convert" :: in :: out :: rest =>
      val spark = session()
      val seed = rest.headOption.map(_.toLong).getOrElse(42L)
      LasConvert.toParquet(spark, in, out, seed)
      println(s"converted $in -> $out (importance seed $seed)")
      spark.stop()

    case "merge" :: in :: out :: rest =>
      val spark = session()
      val df = spark.read.parquet(in)
      val rows = rest.headOption.map(_.toLong).getOrElse(Layout.BatchSize)
      val n = df.count()
      val cluster = Seq("x", "y").filter(df.columns.contains)
      if (cluster.nonEmpty) Layout.compact(spark, in, out, cluster, n, rows)
      else df.coalesce(math.max(1L, n / rows).toInt)
        .write.mode("overwrite").option("maxRecordsPerFile", rows).parquet(out)
      println(s"merged $in ($n rows) -> $out")
      spark.stop()

    case "partition" :: in :: out :: rest =>
      val spark = session()
      val method = rest.headOption.getOrElse("grid")
      val df0 = spark.read.parquet(in)
      val df = if (df0.columns.contains("i")) df0 else Points.withImportance(df0)
      method match {
        case "grid" =>
          val sigma = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
          val geo = Layout.writeGrid(df, out, sigma)
          println(s"grid($sigma) layout at $out, cell edge ${geo.cellEdge}")
        case "quadtree" =>
          val geo = Layout.writeQuadtree(df, out)
          println(s"quadtree layout at $out, depth ${geo.depth}")
        case "zorder" =>
          val bits = rest.drop(1).headOption.map(_.toInt).getOrElse(16)
          val geo = Layout.writeZorder(df, out, bits)
          println(s"zorder($bits) layout at $out, bounds ${geo.bounds}")
        case other => sys.error(s"unknown partition method: $other")
      }
      spark.stop()

    case "experiment" :: rest =>
      // end-to-end partition-pipeline experiment (partition.rs twin)
      Experiment.main(rest.toArray)

    case "footprint" :: in :: out :: rest =>
      // the paper's six-config storage experiment (README.md:48-71)
      val spark = session()
      val scale = rest.headOption.map(_.toDouble).getOrElse(0.001)
      val src = spark.read.format("las").load(in)
      val p = new org.apache.hadoop.fs.Path(in)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val inBytes = fs.getContentSummary(p).getLength
      val report = graft.pc.StorageFootprint.run(spark, src, out, inBytes, scale)
      report.collect().foreach { r =>
        println(f"${r.getString(0)}%-30s ${r.getLong(1)}%12d B  x${r.getLong(2) / 1e6}%.3f")
      }
      spark.stop()

    case "lake" :: op :: table :: rest =>
      // ACID table ops over the from-scratch transaction log
      val spark = session()
      op match {
        case "append" | "overwrite" =>
          val src = rest.headOption.getOrElse(sys.error(s"lake $op needs a source"))
          val df = spark.read.parquet(src)
          val v =
            if (op == "append") graft.lake.LakeTable.append(spark, table, df)
            else graft.lake.LakeTable.overwrite(spark, table, df)
          println(s"committed version $v")
        case "read" =>
          val version = rest.headOption.map(_.toLong)
          val snap = graft.lake.LakeTable.snapshot(spark, table, version)
          println(s"rows=${snap.count()} version=${version.getOrElse(
            graft.lake.LakeTable.latestVersion(table).getOrElse(0L))}")
        case "history" =>
          graft.lake.LakeTable.history(table).foreach { c =>
            val at = if (c.ts == 0L) "" else " " +
              java.time.Instant.ofEpochMilli(c.ts).toString
            println(s"v${c.version} ${c.op} +${c.add.size} -${c.remove.size}$at")
          }
        case "vacuum" =>
          val retain = rest.headOption.map(_.toLong)
            .orElse(graft.lake.LakeTable.latestVersion(table)).getOrElse(1L)
          val gone = graft.lake.LakeTable.vacuum(table, retain)
          println(s"vacuumed ${gone.size} files (retained >= v$retain)")
        case "vacuum-hours" => // Delta's RETAIN n HOURS
          val hours = rest.headOption.map(_.toDouble)
            .getOrElse(sys.error("lake vacuum-hours needs <hours>"))
          val gone = graft.lake.LakeTable.vacuumRetainMillis(table,
            (hours * 3600 * 1000).toLong)
          println(s"vacuumed ${gone.size} files (retained last $hours h)")
        case "merge" =>
          val (src, key) = (rest.headOption.getOrElse(sys.error("lake merge needs a source")),
            rest.drop(1).headOption.getOrElse(sys.error("lake merge needs a key column")))
          val v = graft.lake.LakeTable.merge(spark, table, spark.read.parquet(src), key)
          println(s"committed version $v")
        case "delete" =>
          rest match {
            case c :: lo :: hi :: Nil =>
              val v = graft.lake.LakeTable.deleteWhere(spark, table, c, lo.toDouble, hi.toDouble)
              println(s"committed version $v")
            case _ => sys.error("lake delete needs <column> <lo> <hi>")
          }
        case "deletedv" => // merge-on-read: deletion-vector sidecar, no rewrite
          rest match {
            case c :: lo :: hi :: Nil =>
              val v = graft.lake.LakeTable.deleteWhereDV(spark, table, c, lo.toDouble, hi.toDouble)
              println(s"committed version $v")
            case _ => sys.error("lake deletedv needs <column> <lo> <hi>")
          }
        case "update" =>
          rest match {
            case c :: lo :: hi :: setCol :: value :: Nil =>
              // parse by shape (long → double → string); updateWhere
              // validates the literal is lossless for the column type
              val parsed: Any = value.toLongOption
                .orElse(value.toDoubleOption).getOrElse(value)
              val v = graft.lake.LakeTable.updateWhere(spark, table, c,
                lo.toDouble, hi.toDouble, Map(setCol -> parsed))
              println(s"committed version $v")
            case _ => sys.error("lake update needs <column> <lo> <hi> <setCol> <value>")
          }
        case "optimize" =>
          rest match {
            case cx :: cy :: more =>
              val files = more.headOption.map(_.toInt).getOrElse(4)
              val v = graft.lake.LakeTable.optimize(spark, table, cx, cy, files)
              println(s"committed version $v")
            case _ => sys.error("lake optimize needs <colX> <colY> [files]")
          }
        case "compact" => // bin-packing OPTIMIZE: small files + DV absorption
          val smallMb = rest.headOption.map(_.toLong).getOrElse(32L)
          val targetMb = rest.drop(1).headOption.map(_.toLong).getOrElse(128L)
          graft.lake.LakeTable.compact(spark, table,
            smallMb << 20, targetMb << 20) match {
            case Some(v) => println(s"committed version $v")
            case None => println("nothing to compact")
          }
        case "restore" =>
          // a bare long is a version; anything else parses as an instant
          val arg = rest.headOption
            .getOrElse(sys.error("lake restore needs <version | instant>"))
          val v = arg.toLongOption match {
            case Some(ver) => graft.lake.LakeTable.restoreTo(table, ver)
            case None => graft.lake.LakeTable.restoreToTimestamp(table,
              graft.lake.LakeTable.parseInstantMillis(arg, "lake restore"))
          }
          println(s"committed version $v (state of $arg)")
        case "truncate" =>
          val v = graft.lake.LakeTable.truncate(table)
          println(s"committed version $v")
        case "constrain" => // ALTER TABLE ADD CONSTRAINT <name> CHECK (<sql>)
          val (name, sql) = rest match {
            case n :: s :: Nil => (n, s)
            case _ => sys.error("lake constrain needs <name> <boolean-sql>")
          }
          val v = graft.lake.LakeTable.addConstraint(spark, table, name, sql)
          println(s"committed version $v (CHECK $name: $sql)")
        case "unconstrain" =>
          val name = rest.headOption
            .getOrElse(sys.error("lake unconstrain needs <name>"))
          val v = graft.lake.LakeTable.dropConstraint(spark, table, name)
          println(s"committed version $v (dropped $name)")
        case other => sys.error(s"unknown lake op: $other")
      }
      spark.stop()

    case _ =>
      System.err.println(
        "usage: graft.Cli benchmark | convert <las> <out> [seed] | " +
          "merge <in> <out> [rows] | partition <in> <out> [grid|quadtree|zorder] [sigma|bits] | " +
          "footprint <las> <out-dir> [scale] | experiment [sfDir] [outDir] [runs] | " +
          "lake append|overwrite|read|history|vacuum|vacuum-hours|merge|delete|deletedv|update|optimize|compact|restore|truncate|constrain|unconstrain <table> [args]")
      sys.exit(2)
  }
}
