package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical tie between COVERAGE.md's "Totals:" line and the code it
  * describes: the registry size, the oracle-checked count, and the
  * ScalaTest test count are parsed out of the doc and compared against
  * the registry itself and a literal count of test declarations in the
  * suite sources. Editing one side without the other fails CI, so the
  * doc can't drift (it was in sync at round 7; this keeps it so). */
class CoverageSpec extends AnyFunSuite {

  private def countOccurrences(hay: String, needle: String): Int =
    Iterator.iterate(hay.indexOf(needle))(i => hay.indexOf(needle, i + 1))
      .takeWhile(_ >= 0).size

  test("COVERAGE.md totals line tracks the registry and the test suite") {
    val md = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")

    val totals = """Totals: (\d+) registry queries \((\d+) DuckDB-oracle""".r
      .findFirstMatchIn(md)
      .getOrElse(fail("COVERAGE.md has no parsable 'Totals:' line"))
    assert(totals.group(1).toInt == Registry.all.size,
      s"COVERAGE.md says ${totals.group(1)} registry queries; " +
        s"Registry.all has ${Registry.all.size}")
    val oracled = Registry.all.count(_.oracle.isDefined)
    assert(totals.group(2).toInt == oracled,
      s"COVERAGE.md says ${totals.group(2)} oracle-checked; " +
        s"the registry has $oracled queries with oracle SQL")

    val tests = """\+ (\d+) ScalaTest tests""".r.findFirstMatchIn(md)
      .getOrElse(fail("COVERAGE.md totals line lacks the test count"))
    // count literal test declarations in the suite sources; the needle
    // is concatenated so this file's own source doesn't self-count
    val needle = "test" + "(\""
    import scala.jdk.CollectionConverters._
    val declared = java.nio.file.Files
      .list(java.nio.file.Paths.get("src/test/scala/graft"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => countOccurrences(
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"), needle))
      .sum
    assert(tests.group(1).toInt == declared,
      s"COVERAGE.md says ${tests.group(1)} tests; " +
        s"suite sources declare $declared")
  }
}
