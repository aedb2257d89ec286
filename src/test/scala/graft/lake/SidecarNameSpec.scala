package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** The sidecar-name flattening must be injective: two distinct data-file
  * rel paths sharing one sidecar would let one file's filter prune the
  * other — a silent wrong-prune. The escape ('~' → '~~' first, then
  * '/' → '~s') makes the map invertible for any rel. */
class SidecarNameSpec extends AnyFunSuite {

  test("distinct rels map to distinct flat names") {
    val rels = Seq(
      "a/b~c", "a~b/c",       // the documented collision under plain '/'→'~'
      "a~s/b", "a/~sb",       // names already containing the escape token
      "a~~/b", "a/~~b",
      "stage-0/part-00000.parquet",
      "stage-0~part-00000.parquet")
    val names = rels.map(BloomIndex.sidecarName)
    assert(names.distinct.size == rels.size,
      s"collision among: ${rels.zip(names).mkString(", ")}")
    assert(names.forall(!_.contains("/")), "flat names must be single-level")
  }

  test("plain stage/file rels keep a readable name") {
    assert(BloomIndex.sidecarName("stage-3/f.parquet") == "stage-3~sf.parquet")
  }
}
