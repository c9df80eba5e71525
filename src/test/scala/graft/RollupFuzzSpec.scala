package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Model-based composition fuzz over the maintained rollup lifecycle
  * (the [[Bm25FuzzSpec]] harness applied to the retractable aggregate
  * store): a SEEDED random sequence of exactly-once appends, replayed
  * appends, GDPR retractions, and crash-injected appends/deletes (each
  * followed by its blind replay — the at-least-once delivery shape),
  * checked after EVERY step against a fresh build over exactly the
  * surviving facts. This composes the laws the per-op specs pin in
  * isolation: partial-state merge, exact-decimal retraction, min/max
  * repair from survivors, marker-skip idempotence, and crash states
  * that always leave the previous store fully live.
  * Deterministic: fixed seed, synthetic timestamps, no wall clock. */
class RollupFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import operators.RollupStore

  private def tmpDir(): String = {
    val dir = Files.createTempDirectory("graft-rollup-fuzz").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  private type Fact = (Timestamp, String, Double, Long)

  private def factsDf(rows: Seq[Fact]) = {
    import spark.implicits._
    rows.toDF("ts", "event_type", "value", "user_id")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).toSeq

  test("seeded op-sequence fuzz: the store equals a fresh survivors build after EVERY step") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir()
    val types = Seq("view", "click", "purchase")
    def mkFact(): Fact = (
      Timestamp.valueOf(f"2026-01-${1 + rnd.nextInt(3)}%02d " +
        f"${rnd.nextInt(24)}%02d:00:00"),
      types(rnd.nextInt(types.length)),
      rnd.nextInt(40) * 0.25,
      rnd.nextInt(5).toLong)
    var facts: Vector[Fact] =
      Vector.fill(8)(mkFact()) :+
        // user 0 anchor row: the store never retracts to fully empty
        ((Timestamp.valueOf("2026-01-01 00:00:00"), "view", 1.0, 0L))
    var op = 0L
    RollupStore.buildAtomic(spark, factsDf(facts), dir, Some({op += 1; op}))
    val seams = Seq("written", "swapped", "vacuumed")
    val trace = new StringBuilder
    // every op kind fires at least once, then the seeded random walk
    val kinds = (0 until 5) ++ Seq.fill(7)(rnd.nextInt(5))
    for ((kind, step) <- kinds.zipWithIndex) {
      kind match {
        case 0 =>
          val batch = Vector.fill(2 + rnd.nextInt(3))(mkFact())
          op += 1
          trace ++= s"append(op=$op,${batch.size}) "
          assert(RollupStore.append(spark, factsDf(batch), dir, Some(op)))
          facts ++= batch
        case 1 =>
          // blind replay of the op already applied: must be a no-op
          trace ++= s"replay(op=$op) "
          assert(!RollupStore.append(spark,
            factsDf(Vector.fill(3)(mkFact())), dir, Some(op)),
            "a replayed op id must be skipped")
        case 2 =>
          val present = facts.map(_._4).distinct.filter(_ != 0L)
          if (present.nonEmpty) {
            val victim = present(rnd.nextInt(present.size))
            op += 1
            trace ++= s"forget(u=$victim,op=$op) "
            import spark.implicits._
            assert(RollupStore.delete(spark, factsDf(facts),
              Seq(victim).toDF("user_id"), dir, Some(op)))
            facts = facts.filterNot(_._4 == victim)
          } else trace ++= "forget(skip) "
        case 3 =>
          val seam = seams(rnd.nextInt(seams.length))
          val batch = Vector.fill(2)(mkFact())
          op += 1
          trace ++= s"crash-append@$seam(op=$op) "
          try RollupStore.appendImpl(spark, factsDf(batch), dir,
            p => if (p == seam) throw new RuntimeException(s"boom:$p"),
            Some(op))
          catch { case e: RuntimeException if e.getMessage.startsWith("boom") => () }
          // at-least-once delivery: the blind replay must converge to
          // exactly-once regardless of which side of the swap the
          // crash landed on
          RollupStore.append(spark, factsDf(batch), dir, Some(op))
          facts ++= batch
        case 4 =>
          val present = facts.map(_._4).distinct.filter(_ != 0L)
          if (present.nonEmpty) {
            val victim = present(rnd.nextInt(present.size))
            val seam = seams(rnd.nextInt(seams.length))
            op += 1
            trace ++= s"crash-forget@$seam(u=$victim,op=$op) "
            import spark.implicits._
            try RollupStore.deleteImpl(spark, factsDf(facts),
              Seq(victim).toDF("user_id"), dir,
              p => if (p == seam) throw new RuntimeException(s"boom:$p"),
              Some(op))
            catch { case e: RuntimeException if e.getMessage.startsWith("boom") => () }
            RollupStore.delete(spark, factsDf(facts),
              Seq(victim).toDF("user_id"), dir, Some(op))
            facts = facts.filterNot(_._4 == victim)
          } else trace ++= "crash-forget(skip) "
      }
      val twin = tmpDir()
      RollupStore.buildAtomic(spark, factsDf(facts), twin)
      assert(rowsOf(RollupStore.query(spark, dir)) ==
        rowsOf(RollupStore.query(spark, twin)),
        s"step $step diverged from the survivors model; trace: $trace")
    }
    for (tag <- Seq("append(", "replay(", "forget(u=", "crash-append@",
        "crash-forget@"))
      assert(trace.toString.contains(tag),
        s"seed degenerated: no '$tag' in trace: $trace")
  }
}
