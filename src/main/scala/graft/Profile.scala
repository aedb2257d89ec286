package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: per-stage wall/task metrics for selected
  * queries (guide §1/§7 — decide whether time goes to scheduling, shuffle,
  * or compute before changing anything). Runs each named query once
  * untimed (warm-up: plans, codegen, broadcast caches), then once under a
  * stage listener, and prints a per-stage table plus the query wall.
  * Usage: `sbt "runMain graft.Profile rel_assoc_rules pc_cell_cov"`;
  * `SPARK_GRAFT_SF_DIR` selects the corpus (default sf0.1). Not part of
  * the driver contract; never invoked by Bench/Verify. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession("32")
    spark.sparkContext.setLogLevel("ERROR")
    // Warm-up: mirror Bench — touch inputs once so footer/codegen costs
    // don't land on the first profiled query.
    Seq("lineitem", "documents", "embeddings", "events",
      "orders", "customer", "supplier", "part", "nation", "region").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }

    case class St(id: Int, name: String, wallMs: Long, tasks: Int,
      runMs: Long, gcMs: Long, shrRead: Long, shrWrite: Long,
      input: Long, cpuMs: Long, rdds: String, deserMs: Long)
    val stages = mutable.ArrayBuffer[St]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        val rdds = si.rddInfos.map(_.name).filter(n =>
          n != null && n.nonEmpty && n != "MapPartitionsRDD")
          .distinct.take(6).mkString(",")
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60),
            wall, si.numTasks, m.executorRunTime,
            m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
            m.executorCpuTime / 1000000, rdds, m.executorDeserializeTime)
        }
      }
    }

    // "index:<name>" profiles a one-time build from Bench.indexDefs — no
    // warm-up run (the build caches, a second run would no-op), so the
    // first profiled stages include plan/codegen warmup.
    lazy val builds = Bench.indexDefs(spark, sfDir)
      .map { case (n, _, b) => n -> b }.toMap
    args.foreach { name =>
      (if (name.startsWith("index:"))
        builds.get(name.stripPrefix("index:"))
          .map(b => (_: SparkSession, _: String) => { b(); spark.emptyDataFrame })
      else SparkEntry.queries.get(name)) match {
        case None => println(s"unknown query: $name")
        case Some(fn) =>
          // warm-up run (untimed, unprofiled)
          if (!name.startsWith("index:"))
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          System.gc(); Thread.sleep(200); System.gc()
          stages.clear()
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.removeSparkListener(listener)
          Thread.sleep(100) // let late stage events drain
          println(f"%n==== $name wall=$wall%.3f s stages=${stages.size} ====")
          println(f"${"stage"}%6s ${"wall_ms"}%8s ${"tasks"}%5s ${"run_ms"}%8s " +
            f"${"cpu_ms"}%8s ${"deser"}%6s ${"gc_ms"}%6s ${"shRd_kB"}%8s ${"shWr_kB"}%8s ${"in_kB"}%9s  rdds")
          stages.sortBy(_.id).foreach { s =>
            println(f"${s.id}%6d ${s.wallMs}%8d ${s.tasks}%5d ${s.runMs}%8d " +
              f"${s.cpuMs}%8d ${s.deserMs}%6d ${s.gcMs}%6d ${s.shrRead / 1024}%8d " +
              f"${s.shrWrite / 1024}%8d ${s.input / 1024}%9d  ${s.rdds.take(110)}")
          }
          val stageWall = stages.map(_.wallMs).sum
          println(f"stage wall sum=${stageWall}%d ms vs query wall=${(wall * 1000).toLong}%d ms " +
            f"(gap = scheduling/planning/driver)")
          println(f"SUMMARY $name%-28s wall=${(wall * 1000).toLong}%6d stages=${stages.size}%3d " +
            f"stageWall=${stageWall}%6d cpu=${stages.map(_.cpuMs).sum}%6d " +
            f"gc=${stages.map(_.gcMs).sum}%5d tasks=${stages.map(_.tasks).sum}%4d " +
            f"shRdMB=${stages.map(_.shrRead).sum / 1048576}%4d shWrMB=${stages.map(_.shrWrite).sum / 1048576}%4d " +
            f"gap=${(wall * 1000).toLong - stageWall}%6d")
      }
    }
    spark.stop()
  }
}
