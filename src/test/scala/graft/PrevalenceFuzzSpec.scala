package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Model-based composition fuzz over the segment-prevalence lifecycle
  * (the [[Bm25FuzzSpec]] harness applied to the boilerplate index): a
  * SEEDED random sequence of append / delete / compact /
  * crash-injected-compact steps, checked after EVERY step against a
  * fresh build over exactly the live (appended minus deleted) docs.
  * Docs share paragraphs from a small pool, so prevalence counts move
  * up with appends and DOWN with deletes/compacts — the assertions
  * track real boilerplate flips, never a constant frame.
  * Deterministic: fixed seed, append-only ids, no wall-clock input. */
class PrevalenceFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import operators.PrevalenceIndex

  private def tmpDir(): String = {
    val dir = Files.createTempDirectory("graft-prev-fuzz").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  /** Deterministic text per id: one unique paragraph plus one of five
    * POOL paragraphs (the shared-boilerplate fodder), delimited by the
    * q220 segment convention (ParaDelim = " the "). */
  private def text(i: Long): String =
    Seq(s"u${i}a u${i}b u${i}c", s"pool${i % 5}x pool${i % 5}y")
      .mkString(" the ")

  private def docsOf(ids: Set[Long]) = {
    import spark.implicits._
    ids.toSeq.sorted.map(i => (i, text(i))).toDF("doc_id", "text")
  }

  /** Fixed probe batch: five docs each carrying one pool paragraph and
    * a unique one — their boiler_ratio flips as pool prevalence in the
    * index crosses the drop-all threshold. */
  private def queries = {
    import spark.implicits._
    (0L until 5L).map(q =>
        (900L + q, Seq(s"q${q}a q${q}b", s"pool${q}x pool${q}y")
          .mkString(" the ")))
      .toDF("doc_id", "text")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

  test("seeded op-sequence fuzz: probe equals a fresh survivors build after EVERY step") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir()
    var live = (0L until 8L).toSet
    var nextId = 8L
    PrevalenceIndex.build(spark, docsOf(live), dir)
    val crashSeams = Seq("segs:written", "committed", "vacuumed")
    val trace = new StringBuilder
    // every op kind fires at least once, then the seeded random walk
    val kinds = (0 until 4) ++ Seq.fill(8)(rnd.nextInt(4))
    for ((kind, step) <- kinds.zipWithIndex) {
      kind match {
        case 0 =>
          val batch = (nextId until nextId + 1 + rnd.nextInt(3)).toSet
          nextId = batch.max + 1
          trace ++= s"append($batch) "
          PrevalenceIndex.append(spark, docsOf(batch), dir)
          live ++= batch
        case 1 =>
          val victims = live.filter(_ => rnd.nextInt(4) == 0)
          trace ++= s"delete($victims) "
          if (victims.nonEmpty) {
            PrevalenceIndex.delete(spark, victims.toSeq.sorted, dir)
            live --= victims
          }
        case 2 =>
          trace ++= "compact "
          PrevalenceIndex.compact(spark, dir)
        case 3 =>
          val seam = crashSeams(rnd.nextInt(crashSeams.length))
          trace ++= s"crash-compact@$seam "
          try PrevalenceIndex.compactImpl(spark, dir,
            p => if (p == seam) throw new RuntimeException(s"boom:$p"))
          catch { case e: RuntimeException if e.getMessage.startsWith("boom") => () }
          PrevalenceIndex.recover(spark, dir)
      }
      val twin = tmpDir()
      PrevalenceIndex.build(spark, docsOf(live), twin)
      assert(rowsOf(PrevalenceIndex.probe(spark, queries, dir)) ==
        rowsOf(PrevalenceIndex.probe(spark, queries, twin)),
        s"step $step diverged from the survivors model; trace: $trace")
    }
    for (tag <- Seq("append(", "delete(", "compact ", "crash-compact@"))
      assert(trace.toString.contains(tag),
        s"seed degenerated: no '$tag' in trace: $trace")
  }
}
