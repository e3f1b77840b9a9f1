package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry↔SURVEY invariant, made mechanical (judge r16 item 3):
  * every `SparkEntry.queries` key must appear — backticked, exactly —
  * in SURVEY.md's §2.4 registry index, and every `queries` key must
  * have an `oracleSql` entry (the driver's hash gate needs both). The
  * standing rule "every entry lands with its SURVEY row in the same
  * commit" broke on the round's final entry twice (s20 in r15, x23 in
  * r16); this suite fails the build the builder runs before the judge
  * ever sees the gap. No SparkSession needed — pure file + map checks.
  */
class RegistryInventorySpec extends AnyFunSuite {

  private lazy val survey: String = {
    val p = java.nio.file.Paths.get("SURVEY.md")
    assert(java.nio.file.Files.exists(p),
      s"SURVEY.md not found at ${p.toAbsolutePath} — tests must run from the repo root")
    java.nio.file.Files.readString(p)
  }

  test("every queries key has its SURVEY.md §2.4 index line") {
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => survey.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"registry keys missing from SURVEY.md (add a §2.4 index line " +
        s"in the SAME commit as the entry): ${missing.mkString(", ")}")
  }

  test("every queries key has an oracleSql entry (driver hash gate)") {
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(SparkEntry.oracleSql.contains)
    assert(missing.isEmpty,
      s"registry keys without an oracle (the driver records only a " +
        s"weaker rows-only check): ${missing.mkString(", ")}")
  }

  test("no orphaned oracleSql entries (an oracle without a query is dead weight)") {
    val orphaned = SparkEntry.oracleSql.keys.toSeq.sorted
      .filterNot(SparkEntry.queries.contains)
    assert(orphaned.isEmpty,
      s"oracleSql keys with no queries entry: ${orphaned.mkString(", ")}")
  }
}
