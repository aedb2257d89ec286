package graft

import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix

/** [[graft.functions.Md5Prefix]] is the library's universal text hash
  * (shingles, tokens, lines, buckets) — these specs pin it equal to the
  * `conv(substring(md5(..)))` spelling it replaced, over the REAL
  * corpus and at every slice geometry in use, so the DuckDB oracles
  * (which still compute the hex-prefix form) can never drift. */
class Md5PrefixSpec extends SparkSpec {

  private def pin(width: Int, start: Int = 1): Unit = {
    Md5Prefix.register(spark)
    val tok = graft.text.TextOps.docs(spark, sf001)
      .select(explode(split(col("text"), " ")).as("t"))
    val diff = tok.select(
        call_function("md5_prefix", col("t"), lit(start), lit(width)).as("k"),
        conv(substring(md5(col("t")), start, width), 16, 10).cast("long").as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(diff == 0L, s"md5_prefix(start=$start, n=$width) diverges on $diff tokens")
  }

  test("md5_prefix == conv(substring(md5)) at widths 4/7/15 over corpus tokens") {
    pin(4); pin(7); pin(15)
  }

  test("md5_prefix honors a non-1 start offset (the mm feature slices)") {
    pin(7, start = 9); pin(7, start = 25); pin(8, start = 25)
  }

  test("md5_prefix over binary input equals the string-spelling on the bytes") {
    Md5Prefix.register(spark)
    val m = graft.mm.MultimodalOps.media(spark, sf001)
      .select(col("media").as("b"))
    val diff = m.select(
        call_function("md5_prefix", col("b"), lit(1), lit(15)).as("k"),
        conv(substring(md5(col("b")), 1, 15), 16, 10).cast("long").as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(diff == 0L)
  }

  test("md5_prefix rejects slices past hex char 32 or wider than 15") {
    Md5Prefix.register(spark)
    val df = graft.text.TextOps.docs(spark, sf001).select(col("text"))
    for ((s, n) <- Seq((1, 16), (27, 7), (0, 4))) {
      intercept[Exception] {
        df.select(call_function("md5_prefix", col("text"), lit(s), lit(n)))
          .collect()
      }
    }
  }
}
