package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical tie between COVERAGE.md's "Totals:" line and the code it
  * describes: the registry size, the oracle-checked count, and the
  * ScalaTest test count are parsed out of the doc and compared against
  * the registry itself and a literal count of test declarations in the
  * suite sources. Editing one side without the other fails CI, so the
  * doc can't drift (it was in sync at round 7; this keeps it so). */
class CoverageSpec extends AnyFunSuite {

  // Line-anchored so commented-out declarations (`// test("...`) don't
  // count; the pattern is concatenated so this file's own source line
  // doesn't self-count.
  private val testDecl = ("(?m)^\\s*" + "test\\(\"").r

  private def countDecls(src: String): Int = testDecl.findAllIn(src).size

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
    // count test declarations in the suite sources — recursive walk
    // (subpackage suites would be silently missed by Files.list) with
    // the stream closed, and a line-anchored match (see [[testDecl]])
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files
      .walk(java.nio.file.Paths.get("src/test/scala/graft"))
    val declared =
      try stream.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .map(p => countDecls(
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8")))
        .sum
      finally stream.close()
    assert(tests.group(1).toInt == declared,
      s"COVERAGE.md says ${tests.group(1)} tests; " +
        s"suite sources declare $declared")
  }
}
