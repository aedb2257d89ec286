package graft

/** Plan inspector: prints `explain("formatted")` for selected queries (or
  * all) so scan pushdown, broadcast choices, TakeOrderedAndProject and
  * codegen spans can be reviewed — `sbt "runMain graft.Explain pc_srect"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // the ONE shared builder (LocalSession doc: per-main copies drift —
    // this one had, losing the graft extensions, so any query whose plan
    // depends on an injected rule explained differently than it runs)
    val spark = LocalSession("8")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
