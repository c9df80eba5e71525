package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Model-based composition fuzz over the LSH near-dup lifecycle (the
  * [[Bm25FuzzSpec]] harness applied to the second persisted index): a
  * SEEDED random sequence of admit / delete / compact / crash-injected
  * compact / crash-injected admit steps, checked after EVERY step
  * against a fresh build over exactly the live (admitted minus
  * deleted) documents. Unlike BM25's append, admit GATES its batch
  * (near-dups of index or earlier-batch docs are rejected), so the
  * live set is taken from admit's own returned audit — the model
  * verifies that the incrementally-maintained index always probes
  * bit-equal to a from-scratch twin of what it CLAIMS it admitted.
  * Deterministic: fixed seed, append-only ids, no wall-clock input. */
class LshFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import operators.LshBandIndex

  private def tmpDir(): String = {
    val dir = Files.createTempDirectory("graft-lsh-fuzz").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  /** Deterministic text per id: 30 unique tokens (no cross-doc
    * shingle overlap → never a near-dup of anything else). */
  private def freshText(i: Long): String =
    (1 to 30).map(j => s"d${i}w$j").mkString(" ")

  // id -> text; clones carry an EARLIER id's exact text (jaccard 1.0)
  private val texts = scala.collection.mutable.Map.empty[Long, String]

  private def docsOf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.sorted.map(i => (i, texts(i))).toDF("doc_id", "text")
  }

  /** Fixed probe workload: clones of ids 0..5 (hits live and die with
    * the fuzz) plus two never-matching fresh texts. */
  private def queries = {
    import spark.implicits._
    ((0L until 6L).map(k => (1000L + k, freshText(k))) ++
      Seq((1100L, freshText(9100L)), (1101L, freshText(9101L))))
      .toDF("doc_id", "text")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted

  test("seeded op-sequence fuzz: probe equals a fresh build over the docs the index admitted") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir()
    var live = (0L until 10L).toSet
    live.foreach(i => texts(i) = freshText(i))
    var nextId = 10L
    LshBandIndex.build(spark, docsOf(live.toSeq), dir)
    val compactSeams =
      Seq("bands:written", "sets:written", "committed", "vacuumed")
    val admitSeams = Seq("audited", "sets:appended", "bands:appended")
    val trace = new StringBuilder
    var sawRejection = false
    // every op kind fires at least once (the seed can't degenerate the
    // coverage), then the interleaving is the seeded random walk
    val kinds = (0 until 5) ++ Seq.fill(7)(rnd.nextInt(5))
    for ((kind, step) <- kinds.zipWithIndex) {
      kind match {
        case 0 =>
          // batch of 2-4 NEW ids; the first is always a clone of a
          // random earlier doc (gate fodder — rejected while its
          // original is live, admitted once the original was
          // deleted+compacted), the rest clone or fresh at random
          val n = 2 + rnd.nextInt(3)
          val batch = (nextId until nextId + n).map { id =>
            texts(id) =
              if (id == nextId || rnd.nextInt(2) == 0)
                texts(rnd.nextInt(nextId.toInt).toLong)
              else freshText(id)
            id
          }
          nextId += n
          val audit = LshBandIndex.admit(spark, docsOf(batch), dir)
          val admitted = audit.filter(audit("admitted") === 1L)
            .collect().map(_.getLong(0)).toSet
          trace ++= s"admit($batch->$admitted) "
          if (admitted.size < n) sawRejection = true
          live ++= admitted
        case 1 =>
          val victims = live.filter(_ => rnd.nextInt(4) == 0)
          trace ++= s"delete($victims) "
          if (victims.nonEmpty) {
            LshBandIndex.delete(spark, victims.toSeq.sorted, dir)
            live --= victims
          }
        case 2 =>
          trace ++= "compact "
          LshBandIndex.compact(spark, dir)
        case 3 =>
          val seam = compactSeams(rnd.nextInt(compactSeams.length))
          trace ++= s"crash-compact@$seam "
          try operators.LshBandIndex.compactImpl(spark, dir,
            p => if (p == seam) throw new RuntimeException(s"boom:$p"))
          catch { case e: RuntimeException if e.getMessage.startsWith("boom") => () }
          LshBandIndex.recover(spark, dir)
        case 4 =>
          // crash BEFORE the admit's commit: nothing may be admitted
          val seam = admitSeams(rnd.nextInt(admitSeams.length))
          val id = nextId; nextId += 1
          texts(id) = freshText(id)
          trace ++= s"crash-admit@$seam($id) "
          try operators.LshBandIndex.admitImpl(spark, docsOf(Seq(id)), dir,
            p => if (p == seam) throw new RuntimeException(s"boom:$p"))
          catch { case e: RuntimeException if e.getMessage.startsWith("boom") => () }
          LshBandIndex.recover(spark, dir)
      }
      val twin = tmpDir()
      LshBandIndex.build(spark, docsOf(live.toSeq), twin)
      assert(rowsOf(LshBandIndex.probe(spark, queries, dir)) ==
        rowsOf(LshBandIndex.probe(spark, queries, twin)),
        s"step $step diverged from the admitted-survivors model; trace: $trace")
    }
    for (tag <- Seq("admit(", "delete(", "compact ", "crash-compact@",
        "crash-admit@"))
      assert(trace.toString.contains(tag),
        s"seed degenerated: no '$tag' in trace: $trace")
    // the gate must have actually fired at least once, or the clone
    // machinery silently stopped producing near-dups
    assert(sawRejection,
      s"seed degenerated: the near-dup gate never rejected; trace: $trace")
  }
}
