package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ReplaceManyUtil

/** Randomized cross-check (2000 seeded cases per property) of the trie
  * automaton against a naive specification written independently:
  * leftmost-first scan by brute force over pattern order at each position.
  * A small alphabet makes overlaps and cascades likely. No Spark session —
  * this drives the runtime kernel directly. */
class AutomatonPropertySpec extends AnyFunSuite {

  private val N = 2000

  private def cases(seed: Long): Iterator[(String, List[String])] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "abcd "
    def word() = {
      val n = 1 + rnd.nextInt(4)
      (0 until n).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
    }
    Iterator.fill(N) {
      val hay = (0 until rnd.nextInt(41))
        .map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      val pats = List.fill(1 + rnd.nextInt(6))(word())
      (hay, pats)
    }
  }

  /** Naive leftmost-first replace: at each position, first-listed matching
    * pattern wins; resume after the replacement; never rescan output. */
  private def naiveReplace(s: String, pats: List[String], reps: List[String]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      pats.indices.find(p => s.startsWith(pats(p), i)) match {
        case Some(p) => sb.append(reps(p)); i += pats(p).length
        case None => sb.append(s.charAt(i)); i += 1
      }
    }
    sb.toString
  }

  private def naiveFind(s: String, pats: List[String]): List[Int] = {
    val out = scala.collection.mutable.ListBuffer[Int]()
    var i = 0
    while (i < s.length) {
      pats.indices.find(p => s.startsWith(pats(p), i)) match {
        case Some(p) => out += i; i += pats(p).length
        case None => i += 1
      }
    }
    out.toList
  }

  test("replace_many kernel equals the naive leftmost-first spec on random inputs") {
    cases(11).foreach { case (s, pats) =>
      val reps = pats.indices.map(i => s"<$i>").toList
      val auto = ReplaceManyUtil.build(pats.toArray, reps.toArray, false)
      val got = ReplaceManyUtil.run(UTF8String.fromString(s), auto).toString
      val want = naiveReplace(s, pats, reps)
      assert(got == want, s"s='$s' pats=$pats: got '$got', want '$want'")
    }
  }

  test("find_many kernel equals the naive scan on random inputs") {
    cases(22).foreach { case (s, pats) =>
      val auto = ReplaceManyUtil.build(pats.toArray, pats.toArray, false)
      val got = ReplaceManyUtil
        .extractMany(UTF8String.fromString(s), auto, overlapping = false, findStarts = true)
        .toIntArray().toList
      val want = naiveFind(s, pats)
      assert(got == want, s"s='$s' pats=$pats: got $got, want $want")
    }
  }

  test("contains_any agrees with any-substring on random inputs") {
    cases(33).foreach { case (s, pats) =>
      val auto = ReplaceManyUtil.build(pats.toArray, pats.toArray, false)
      val got = ReplaceManyUtil.containsAny(UTF8String.fromString(s), auto)
      assert(got == pats.exists(s.contains(_)), s"s='$s' pats=$pats")
    }
  }

  test("overlapping extract reports exactly the full match-position set") {
    cases(44).foreach { case (s, pats) =>
      val auto = ReplaceManyUtil.build(pats.toArray, pats.toArray, false)
      val got = ReplaceManyUtil
        .extractMany(UTF8String.fromString(s), auto, overlapping = true, findStarts = true)
        .toIntArray().toSet
      val want = (for {
        p <- pats.distinct
        i <- 0 to (s.length - p.length) if s.startsWith(p, i)
      } yield i).toSet
      assert(got == want, s"s='$s' pats=$pats: got $got, want $want")
    }
  }
}
