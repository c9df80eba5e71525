package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Model-based composition fuzz over the BM25 persisted lifecycle: a
  * SEEDED random sequence of append / delete / compact / stampOp /
  * crash-injected-compact steps, checked after EVERY step against the
  * model the per-op laws already pin individually — a fresh build over
  * exactly the live (admitted minus deleted) documents. The per-op
  * specs prove each law in isolation; this proves they COMPOSE in any
  * interleaving (the shape a year of nightly maintenance actually
  * produces), including serving from torn crash states mid-sequence.
  * Deterministic: fixed seed, append-only ids, no wall-clock input. */
class Bm25FuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import operators.Bm25Index

  private def tmpDir(): String = {
    val dir = Files.createTempDirectory("graft-bm25-fuzz").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  /** Deterministic distinct text per id: 30 unique tokens. */
  private def text(i: Long): String =
    (1 to 30).map(j => s"d${i}w$j").mkString(" ")

  private def docsOf(ids: Set[Long]) = {
    import spark.implicits._
    ids.toSeq.sorted.map(i => (i, text(i))).toDF("doc_id", "text")
  }

  /** Fixed query workload: per qid, two of its own tokens plus one
    * token of a doc ten ids up — hits survive and die as the fuzz
    * deletes/appends, so the assertions are never vacuous. */
  private def queries = {
    import spark.implicits._
    (0L until 6L).flatMap(q => Seq(
      (q, s"d${q}w1"), (q, s"d${q}w7"), (q, s"d${q + 10}w3")))
      .toDF("qid", "term")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("seeded op-sequence fuzz: probe equals a fresh survivors build after EVERY step") {
    val rnd = new scala.util.Random(20260815L)
    val dir = tmpDir()
    var live = (0L until 10L).toSet
    var nextId = 10L
    var op = 0L
    Bm25Index.build(spark, docsOf(live), dir)
    val crashSeams =
      Seq("postings:written", "stats:written", "committed", "vacuumed")
    val trace = new StringBuilder
    for (step <- 1 to 14) {
      val kind = rnd.nextInt(5)
      kind match {
        case 0 =>
          val batch = (nextId until nextId + 1 + rnd.nextInt(4)).toSet
          nextId = batch.max + 1
          op += 1
          trace ++= s"append($batch,op=$op) "
          assert(Bm25Index.append(spark, docsOf(batch), dir, Some(op)))
          live ++= batch
        case 1 =>
          val victims = live.filter(_ => rnd.nextInt(4) == 0)
          trace ++= s"delete($victims) "
          if (victims.nonEmpty) {
            Bm25Index.delete(spark, victims.toSeq.sorted, dir)
            live --= victims
          }
        case 2 =>
          trace ++= "compact "
          Bm25Index.compact(spark, dir)
        case 3 =>
          op += 1
          trace ++= s"stamp($op) "
          Bm25Index.stampOp(spark, dir, op)
        case 4 =>
          val seam = crashSeams(rnd.nextInt(crashSeams.length))
          trace ++= s"crash-compact@$seam "
          try Bm25Index.compactImpl(spark, dir,
            p => if (p == seam) throw new RuntimeException(s"boom:$p"))
          catch { case e: RuntimeException if e.getMessage.startsWith("boom") => () }
          // serving from the torn state must ALREADY match the model
          // (every crash state is fully live under the manifest) —
          // recover only reclaims orphans
          Bm25Index.recover(spark, dir)
      }
      val twin = tmpDir()
      Bm25Index.build(spark, docsOf(live), twin)
      assert(rowsOf(Bm25Index.probe(spark, queries, dir)) ==
        rowsOf(Bm25Index.probe(spark, queries, twin)),
        s"step $step diverged from the survivors model; trace: $trace")
    }
    // the sequence must have exercised every op kind at least once —
    // a silent seed degeneration would hollow the test out
    for (tag <- Seq("append(", "delete(", "compact", "stamp(",
        "crash-compact@"))
      assert(trace.toString.contains(tag),
        s"seed degenerated: no '$tag' in trace: $trace")
  }
}
