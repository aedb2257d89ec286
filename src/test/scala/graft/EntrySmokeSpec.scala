package graft

/** The driver's own smoke check, as a spec: `SparkEntry.entry` must
  * return rows on sf0.001. Bench's warm-up swallows entry() exceptions
  * (by design — warm-up must not kill the run), so without this spec a
  * broken flagship would surface only in the driver's round report. */
class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle (the full surface is hash-gated)") {
    // r10 closed the last exemption: events_approx now runs
    // deterministic from-scratch sketches the oracle replays exactly
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("oracle entries never reference unregistered queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL is single-line (a stray newline corrupts SQL composed from these strings)") {
    val multi = SparkEntry.oracleSql.collect {
      case (k, v) if v.exists(c => c == '\n' || c == '\r') => k
    }
    assert(multi.isEmpty, s"multi-line oracle SQL (missing .replace(\"\\n\",\" \")): $multi")
  }
}
