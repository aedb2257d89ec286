package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** The native k-gram/winnow kernels must be element-identical to the
  * higher-order-function spellings they replaced (which are themselves
  * oracle-pinned): same hashes, same distinctness, same window minima,
  * same short-row behavior — over the REAL corpus, not toy rows. */
class TextKernelsSpec extends SparkSpec {

  private def corpus = {
    graft.functions.Md5Prefix.register(spark)
    graft.functions.TextKernels.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
  }

  test("kgram_hashes == array_distinct(transform(md5_prefix(concat_ws(slice))))") {
    val df = corpus
      .withColumn("native", call_function("kgram_hashes", col("ws"), lit(3)))
      .withColumn("hof",
        when(size(col("ws")) >= 3, array_distinct(
          transform(sequence(lit(0), size(col("ws")) - 3), i =>
            call_function("md5_prefix",
              concat_ws(" ", slice(col("ws"), i + lit(1), lit(3))),
              lit(1), lit(15)))))
          .otherwise(array().cast("array<bigint>")))
    val diff = df.filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"kgram kernel diverges on $diff documents")
    // sanity: the fixture exercises both branches
    assert(df.filter(size(col("native")) > 0).count() > 0)
  }

  test("winnow_mins == per-window trailing array_min over the k-gram hash stream") {
    val k = TextOps.WinnowK
    val w = TextOps.WinnowW
    val hs = transform(sequence(lit(0), size(col("ws")) - k), i =>
      call_function("md5_prefix",
        concat_ws(" ", slice(col("ws"), i + lit(1), lit(k))), lit(1), lit(15)))
    val df = corpus
      .withColumn("native", call_function("winnow_mins", col("ws"), lit(k), lit(w)))
      .withColumn("hs", when(size(col("ws")) >= k + w - 1, hs))
      .withColumn("hof",
        when(col("hs").isNotNull, transform(
          sequence(lit(w - 1), size(col("hs")) - 1),
          p => array_min(slice(col("hs"), p - lit(w - 2), lit(w)))))
          .otherwise(array().cast("array<bigint>")))
    val diff = df.filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"winnow kernel diverges on $diff documents")
    assert(df.filter(size(col("native")) > 0).count() > 0)
  }

  test("property: kernels == pure-Scala md5 reference on random token arrays") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def ref60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var hi = 0L
      (0 until 8).foreach(j => hi = (hi << 8) | (d(j) & 0xffL))
      hi >>> 4
    }
    // tokens include empties and multi-byte chars — the byte-streaming
    // digest must agree with the joined-string digest on all of them
    val tok = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(""),
      Gen.const("äöü"), Gen.const("日本"))
    val toks = Gen.listOf(tok)
    val p = Prop.forAll(toks, Gen.choose(1, 5), Gen.choose(1, 5)) { (ts, k, w) =>
      val arr = new GenericArrayData(
        ts.map(t => UTF8String.fromString(t)).toArray[Any])
      val grams = ts.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSeq
      val hs = grams.map(ref60)
      val wantK = hs.distinct
      val gotK = graft.functions.TextKernels.kgramHashes(arr, k).toLongArray.toSeq
      val wantW =
        if (hs.length < w) Seq.empty[Long]
        else hs.sliding(w).map(_.min).toSeq
      val gotW = graft.functions.TextKernels.winnowMins(arr, k, w).toLongArray.toSeq
      gotK == wantK && gotW == wantW
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(r.passed, s"kernel property failed: ${r.status}")
  }

  test("short rows: below-k and below-window documents yield empty arrays") {
    import spark.implicits._
    graft.functions.TextKernels.register(spark)
    val df = Seq("a b", "a b c d e f g h").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(
        call_function("kgram_hashes", col("ws"), lit(3)).as("kg"),
        call_function("winnow_mins", col("ws"), lit(4), lit(5)).as("wm"))
      .collect()
    assert(df(0).getSeq[Long](0).isEmpty && df(0).getSeq[Long](1).isEmpty)
    // 8 tokens: six 3-grams; five 4-gram hashes = exactly one complete
    // 5-window (n = k+w-1 is the first row that winnows at all)
    assert(df(1).getSeq[Long](0).size == 6 && df(1).getSeq[Long](1).size == 1)
  }
}

/** Round-9 kernels (the standing CodegenFallback audit's finds): each
  * native expression pinned element-identical to the interpreted HOF
  * spelling it replaced, over the REAL corpus plus the edge rows the
  * corpus cannot contain. */
class TextKernels2Spec extends SparkSpec {

  private def corpus = {
    graft.functions.Md5Prefix.register(spark)
    graft.functions.TextKernels.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
  }

  private val stop = graft.text.TextOps.Stopwords

  test("token_count_in == size(filter(ws, w -> w IN set)) on the corpus") {
    val df = corpus
      .withColumn("native",
        call_function("token_count_in", col("ws"), typedLit(stop)))
      .withColumn("hof",
        size(filter(col("ws"), w => w.isin(stop: _*))).cast("long"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native") > 0).count() > 0, "fixture has stopword hits")
    // single-member set (the BM25 literal-tf case)
    val one = corpus
      .withColumn("native",
        call_function("token_count_in", col("ws"), typedLit(Seq("the"))))
      .withColumn("hof", size(filter(col("ws"), w => w === lit("the"))).cast("long"))
    assert(one.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("token_len_sum == aggregate(ws, 0L, (a, w) -> a + length(w)); null element nulls") {
    val df = corpus
      .withColumn("native", call_function("token_len_sum", col("ws")))
      .withColumn("hof", aggregate(col("ws"), lit(0L), (a, w) => a + length(w)))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    // null propagation parity on a planted null element
    import spark.implicits._
    val planted = Seq(Seq("ab", "c"), Seq("x")).toDF("ws")
      .withColumn("ws",
        when(size(col("ws")) === 1, array(lit(null).cast("string")))
          .otherwise(col("ws")))
      .withColumn("native", call_function("token_len_sum", col("ws")))
      .withColumn("hof", aggregate(col("ws"), lit(0L), (a, w) => a + length(w)))
    assert(planted.filter(col("native") <=> col("hof")).count() == 2)
    assert(planted.filter(col("native").isNull).count() == 1)
  }

  test("bigram_pairs == zip_with(slice, slice, concat) incl. 0/1-token rows") {
    val pairsHof = zip_with(
      slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0))),
      slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val df = corpus
      .withColumn("native", call_function("bigram_pairs", col("ws")))
      .withColumn("hof", pairsHof)
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    import spark.implicits._
    val short = Seq((1L, "solo"), (2L, "")).toDF("id", "text")
      .select(split(col("text"), " ").as("ws"))
      .withColumn("native", call_function("bigram_pairs", col("ws")))
    assert(short.filter(size(col("native")) =!= 0).count() == 0,
      "sub-2-token rows must yield empty pair arrays")
  }

  test("chunk_structs == transform(sequence)-slice-md5 incl. the short final chunk") {
    val width = 32
    val chunksHof = transform(
      sequence(lit(0L), expr(s"CAST((size(split(text, ' ')) - 1) div $width AS BIGINT)")),
      i => {
        val slc = slice(col("ws"), (i * width + 1).cast("int"), lit(width))
        struct(
          i.as("chunk_id"),
          size(slc).cast("long").as("n_chunk_tokens"),
          md5(array_join(slc, " ")).as("chunk_fp"))
      })
    val df = corpus
      .withColumn("native", call_function("chunk_structs", col("ws"), lit(width)))
      .withColumn("hof", chunksHof)
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    // the fixture exercises multi-chunk docs AND a short final chunk
    assert(df.filter(size(col("native")) > 1).count() > 0)
  }

  test("count_le == size(filter(cuts, c -> v >= c)) across the cut domain incl. NULL") {
    val cuts = Seq(10L, 20L, 20L, 35L)
    import spark.implicits._
    val df = (0L to 40L).toDF("v")
      .withColumn("v", when(col("v") === 40L, lit(null)).otherwise(col("v")))
      .withColumn("native",
        call_function("count_le", typedLit(cuts), col("v")))
      .withColumn("hof", size(filter(typedLit(cuts), c => col("v") >= c)))
    assert(df.filter(!(col("native") <=> col("hof"))).count() == 0)
    assert(df.schema("native").dataType == df.schema("hof").dataType,
      "count_le must return INT exactly like size()")
    // the null row: the HOF's null lambda drops every cut -> 0, never
    // NULL (a null-propagating kernel would mint a phantom NULL bucket)
    assert(df.filter(col("v").isNull).select("native").head().getInt(0) == 0)
  }

  test("chunk_structs matches array_join's skip-null-and-separator rule on planted nulls") {
    import spark.implicits._
    // 'a NULL b' must fingerprint as "a b" (one separator), not "a  b";
    // a LEADING null must not leave a leading separator either
    val rows = Seq(Seq[String]("a", null, "b"), Seq[String](null, "x", "y"))
      .toDF("ws")
    val width = 32
    val hof = transform(
      sequence(lit(0L), expr(s"CAST((size(ws) - 1) div $width AS BIGINT)")),
      i => {
        val slc = slice(col("ws"), (i * width + 1).cast("int"), lit(width))
        struct(
          i.as("chunk_id"),
          size(slc).cast("long").as("n_chunk_tokens"),
          md5(array_join(slc, " ")).as("chunk_fp"))
      })
    val df = rows
      .withColumn("native", call_function("chunk_structs", col("ws"), lit(width)))
      .withColumn("hof", hof)
    assert(df.filter(col("native") =!= col("hof")).count() == 0,
      df.select("native", "hof").collect().mkString("\n"))
  }
}
