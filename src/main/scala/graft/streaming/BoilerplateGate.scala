package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of q220's boilerplate-prevalence audit: detect — at
  * ingest time, exactly — the moment a segment crosses the C4/CCNet
  * prevalence threshold (seen in ≥ 2 DISTINCT documents corpus-wide)
  * and emit one alert per segment, ever. Downstream cleaning consumes
  * the alert stream as its drop list; the batch q220 run over the
  * accumulated corpus would find the same segments hours later.
  *
  * Exactness without unbounded per-key sets: "≥ 2 distinct docs" needs
  * only the FIRST document's id — a later instance from any OTHER doc
  * crosses the threshold; a later instance from the SAME doc cannot
  * (and doc-side segmentation already collapses within-doc repeats via
  * array_distinct, so they never even reach the state store). State
  * per segment key is therefore O(1) — two fields, regardless of how
  * hot the segment is — and the alert-set law is order- and
  * batching-independent: StreamingSpec pins emitted alerts == the
  * batch q220 flag set over the same docs.
  *
  * At 100 TB the key space is the segment vocabulary: the state store
  * shards it by hash across executors like any keyed state, and a
  * production deployment bounds retention by re-keying epochs (global
  * prevalence has no event-time horizon, so NoTimeout is the honest
  * semantics here — the same unbounded-lifetime contract as exact
  * streaming dedup). The event-time TTL the user-keyed monitors carry
  * ([[BotMonitor]]/[[Funnel]]) deliberately does NOT apply: SegEvt has
  * no event-time attribute because prevalence is a corpus-lifetime
  * property — a template seen once per month is exactly as boilerplate
  * as one seen twice a second, and any idle-based expiry would silently
  * re-admit it. Epoch re-keying bounds state WITHOUT breaking that law
  * (each epoch is its own exact gate).
  */
object BoilerplateGate {

  final case class SegEvt(h: Long, doc_id: Long)
  final case class SegState(firstDoc: Long, flagged: Boolean)
  final case class BoilerAlert(h: Long, first_doc: Long, second_doc: Long)

  /** Doc-side segmentation — stateless scan shape: split on `delim`
    * (q220's [[graft.operators.Dedup]] ParaDelim convention), hash each
    * segment, and collapse within-doc repeats doc-LOCALLY so the state
    * store only ever sees one instance per (segment, doc). */
  def segments(df: DataFrame, idCol: String, textCol: String,
      delim: String): Dataset[SegEvt] = {
    implicit val enc = Encoders.product[SegEvt]
    df.select(
        explode(array_distinct(transform(
          split(col(textCol), java.util.regex.Pattern.quote(delim), -1),
          p => graft.Dsl.md5h61(p)))).as("h"),
        col(idCol).cast("long").as("doc_id"))
      .as[SegEvt]
  }

  /** The stateful gate: one alert per segment hash, emitted in the
    * micro-batch where the second distinct document arrives. Within a
    * batch, instances are applied in doc_id order so the reported
    * second_doc is deterministic under any executor interleaving. */
  def gate(segs: Dataset[SegEvt]): Dataset[BoilerAlert] = {
    implicit val stateEnc = Encoders.product[SegState]
    implicit val outEnc = Encoders.product[BoilerAlert]
    implicit val longEnc = Encoders.scalaLong
    segs.groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (h: Long, batch: Iterator[SegEvt],
            state: org.apache.spark.sql.streaming.GroupState[SegState]) =>
          var st = state.getOption
          var out = List.empty[BoilerAlert]
          batch.toSeq.sortBy(_.doc_id).foreach { e =>
            st match {
              case None =>
                st = Some(SegState(e.doc_id, flagged = false))
              case Some(s) if !s.flagged && e.doc_id != s.firstDoc =>
                out ::= BoilerAlert(h, s.firstDoc, e.doc_id)
                st = Some(s.copy(flagged = true))
              case _ => () // already flagged, or a same-doc replay
            }
          }
          st.foreach(state.update)
          out.reverse.iterator
      }
  }
}
