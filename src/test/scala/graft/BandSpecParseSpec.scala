package graft

import org.scalatest.funsuite.AnyFunSuite

/** GRAFT_PAIR_WITNESS_BAND parsing contract (PredProbe.parseBandSpec).
  * The per-query form exists so one invocation can band a giant listing
  * without silently downsampling a full-listing witness (ADVICE r13) —
  * the load-bearing property is that an UNNAMED check stays at band 1.
  * No Spark session needed; pure string → Long. */
class BandSpecParseSpec extends AnyFunSuite {
  private def p(spec: String, name: String) =
    PredProbe.parseBandSpec(spec, name)

  test("global form applies the same band to every check") {
    assert(p("1", "q38") === 1L)
    assert(p("1000", "q38") === 1000L)
    assert(p("1000", "q56") === 1000L)
    assert(p(" 7 ", "q79") === 7L)
  }

  test("per-query form bands only the named checks; unnamed run unbanded") {
    val spec = "q79_passjoin_k2_varlen:4,q56_passjoin_edit_pairs:20"
    assert(p(spec, "q79_passjoin_k2_varlen") === 4L)
    assert(p(spec, "q56_passjoin_edit_pairs") === 20L)
    assert(p(spec, "q38_fuzzy_name_pairs") === 1L)
    assert(p("q35_ngram_jaccard_blocked:10", "q35_ngram_jaccard_blocked")
      === 10L)
  }

  test("whitespace and empty entries tolerated in per-query form") {
    assert(p(" q38:5 , , q56:9 ", "q38") === 5L)
    assert(p(" q38:5 , , q56:9 ", "q56") === 9L)
    assert(p(" q38:5 , , q56:9 ", "q79") === 1L)
  }

  test("bands below 1 are rejected for the check they would apply to") {
    intercept[IllegalArgumentException](p("0", "q38"))
    intercept[IllegalArgumentException](p("q38:0", "q38"))
    intercept[IllegalArgumentException](p("-3", "q38"))
    // a zero band for a DIFFERENT check must not poison an unnamed one
    assert(p("q38:0", "q56") === 1L)
  }

  test("malformed specs fail loudly rather than defaulting") {
    intercept[NumberFormatException](p("abc", "q38"))
    intercept[NumberFormatException](p("q38:xyz", "q38"))
    intercept[MatchError](p("q38:1:2", "q38"))
  }
}
