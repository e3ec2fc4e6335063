package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.silver.FuzzyNames._

/** WRatio scorer spec — realistic abbreviation pairs that rapidfuzz's
  * default `process.extractOne` scorer matches at cutoff 75 but plain
  * normalized-indel ratio does not (VERDICT r1 finding #1). */
class FuzzyNamesSpec extends AnyFunSuite {

  test("indel ratio basics") {
    assert(ratio("abc", "abc") === 100.0)
    assert(ratio("", "") === 100.0)
    assert(ratio("abc", "xyz") === 0.0)
    // Gama vs Gamma: indel 1, total 9
    assert(math.abs(ratio("Gama", "Gamma") - 100.0 * (1 - 1.0 / 9)) < 1e-9)
  }

  test("partial ratio finds embedded substrings") {
    assert(partialRatio("Kohli", "Virat Kohli") === 100.0)
    assert(partialRatio("Virat Kohli", "Kohli") === 100.0)
    assert(partialRatio("", "x") === 0.0)
  }

  test("token scorers ignore word order") {
    assert(tokenSortRatio("Kohli Virat", "Virat Kohli") === 100.0)
    assert(tokenSetRatio("Kohli", "Kohli Virat Kohli") === 100.0)
    // shared token "Dhoni" ⇒ partial token-set hits 100
    assert(partialTokenSetRatio("MS Dhoni", "Mahendra Singh Dhoni") === 100.0)
  }

  test("WRatio matches abbreviated names at cutoff 75 where ratio fails") {
    val pairs = Seq(
      ("V Kohli", "Virat Kohli"),
      ("MS Dhoni", "Mahendra Singh Dhoni"),
      ("R Sharma", "Rohit Sharma"),
      ("Dhoni", "MS Dhoni"))
    pairs.foreach { case (abbr, full) =>
      assert(wratio(abbr, full) >= 75.0,
        s"WRatio('$abbr','$full') = ${wratio(abbr, full)} < 75")
    }
    // plain ratio fails at least one of these — the r1 divergence
    assert(pairs.exists { case (a, f) => ratio(a, f) < 75.0 })
  }

  test("WRatio keeps unrelated names below cutoff") {
    assert(wratio("Bumrah", "Ashwin") < 75.0)
    assert(wratio("V Kohli", "S Iyer") < 75.0)
  }

  test("extractOne honors cutoff and prefers best score") {
    val squad = Seq("Virat Kohli", "Rohit Sharma", "Jasprit Bumrah")
    assert(extractOne("V Kohli", squad, 75.0) === Some("Virat Kohli"))
    assert(extractOne("R Sharma", squad, 75.0) === Some("Rohit Sharma"))
    assert(extractOne("Zzzz Qqqq", squad, 75.0) === None)
  }

  test("teamChoices scopes candidates to the squad, fuzzy team key at 70") {
    val squads = Map(
      "Mumbai Indians" -> Seq("Rohit Sharma", "Jasprit Bumrah"),
      "Chennai Super Kings" -> Seq("MS Dhoni"))
    val all = squads.values.flatten.toSeq
    // exact team key
    assert(teamChoices("Mumbai Indians", squads, all) === Seq("Rohit Sharma", "Jasprit Bumrah"))
    // misspelled team key fuzzy-matches at cutoff 70 (X2)
    assert(teamChoices("Mumbai Indian", squads, all) === Seq("Rohit Sharma", "Jasprit Bumrah"))
    // unknown team falls back to the full catalog
    assert(teamChoices("Gotham Knights", squads, all) === all)
    // null/N-A team → full catalog
    assert(teamChoices(null, squads, all) === all)
    assert(teamChoices("N/A", squads, all) === all)
  }

  test("matchPlayerName passthroughs") {
    assert(matchPlayerName(null, Seq("A")) === "N/A")
    assert(matchPlayerName("N/A", Seq("A")) === "N/A")
    assert(matchPlayerName("  X Y  ", Nil) === "X Y")
  }
}
