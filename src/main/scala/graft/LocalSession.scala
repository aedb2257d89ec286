package graft

import org.apache.spark.sql.SparkSession

/** ONE local-session builder for every CLI main (Verify / Bench / Cli /
  * Experiment). The mains used to each carry their own copy of this
  * block, and the copies drifted (Experiment lost the UTC timezone and
  * the nanos flag) — a timezone-dependent cast or a TIMESTAMP(NANOS)
  * read would then behave differently depending on the entry point. */
object LocalSession {
  def apply(defaultCpus: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as int64 nanoseconds
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the library's SQL surface (optimizer rules, SQL functions, and
      // the UPDATE rewrite — the latter needs a RESOLUTION hook, which
      // only the extensions API offers)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
