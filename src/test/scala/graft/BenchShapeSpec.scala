package graft

import org.scalatest.funsuite.AnyFunSuite

/** Standing rule from the r14 verdict ("What's wrong" item 1): every bench
  * generator carries a cardinality/domain shape assert, and the assert must
  * FIRE on the r3 defect class if it is ever reintroduced — a dim deriving
  * its key domain from its own row count instead of the fact's, which
  * collapsed j1 to a one-hot key and starved j2-j4's match rate for nine
  * rounds before anyone noticed. No Spark session needed: the assert is
  * pure arithmetic over (distinct keys, key max, draws, domain).
  */
class BenchShapeSpec extends AnyFunSuite {

  test("JoinBench dim shape assert fires on the r3 degenerate shape") {
    // r3 defect at N=1e7: medium generated nGen=1e4 rows but derived its
    // domain from its OWN rows (1e4/1e3 = 10 keys) — both the coverage and
    // the key-span checks must reject it against the true domain 1e4
    val e = intercept[IllegalArgumentException] {
      JoinBench.assertDimShape("medium", dimRows = 10, keyMax = 10,
        nGen = 10000, domain = 10000)
    }
    assert(e.getMessage.contains("shape assert"))
  }

  test("JoinBench dim shape assert fires when the key does not span the domain") {
    // right row count but keys crowded into the bottom of the domain
    val e = intercept[IllegalArgumentException] {
      JoinBench.assertDimShape("small", dimRows = 6321, keyMax = 1200,
        nGen = 10000, domain = 10000)
    }
    assert(e.getMessage.contains("span domain"))
  }

  test("JoinBench dim shape band admits honest sampling noise at small nGen") {
    // expected coverage for nGen=domain=500 is ~316; a bare ±15% band
    // (269..363) rejected honest hash-uniform draws a few σ out (ADVICE
    // r16 low item) — the widened band (±15% + 4·√expected ≈ ±118) admits
    // them while the r3 defect class (orders of magnitude off) still fires
    JoinBench.assertDimShape("tiny", dimRows = 250, keyMax = 480,
      nGen = 500, domain = 500)
    JoinBench.assertDimShape("tiny", dimRows = 380, keyMax = 480,
      nGen = 500, domain = 500)
    val e = intercept[IllegalArgumentException] {
      JoinBench.assertDimShape("tiny", dimRows = 20, keyMax = 480,
        nGen = 500, domain = 500)
    }
    assert(e.getMessage.contains("shape assert"))
  }

  test("JoinBench dim shape assert passes the healthy hash-uniform shape") {
    // expected coverage = domain·(1−e^{−nGen/domain}) ≈ 6321 for nGen=domain
    JoinBench.assertDimShape("medium", dimRows = 6321, keyMax = 9999,
      nGen = 10000, domain = 10000)
    // and the big dim (nGen = domain = N)
    JoinBench.assertDimShape("big", dimRows = 632000, keyMax = 999999,
      nGen = 1000000, domain = 1000000)
  }
}
