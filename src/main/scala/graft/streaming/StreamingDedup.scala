package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-deduplication for a document feed — the continuous twin
  * of the batch `dedup_exact` operator (SURVEY extension; the batch side
  * keys a window on `md5(text)`, see
  * `operators/DedupQueries.scala` `dedup_exact`).
  *
  * Documents are keyed by their content fingerprint; per key the state is
  * the canonical (first-seen) doc_id — O(distinct documents) state sharded
  * across executors by fingerprint hash, exactly how a 100 TB ingest
  * pipeline suppresses re-crawled pages. Emission is append-only: every
  * document yields one event marking it canonical or duplicate, so the
  * stream can fan out to a keep/drop router downstream.
  *
  * Canonical-choice semantics differ from batch by necessity: a stream
  * cannot know the global `min(doc_id)`, so FIRST ARRIVAL wins (per-key
  * arrival order; deterministic for a deterministic source). The batch
  * operator remains the oracle-checked reference for min-id semantics.
  */
object StreamingDedup {
  final case class Doc(doc_id: Long, text: String)
  final case class DedupEvent(doc_id: Long, canonical_id: Long, is_dup: Boolean)

  private def fp(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Stateful dedup over a document stream: state = canonical id per
    * content fingerprint. */
  def dedupStream(docs: Dataset[Doc]): Dataset[DedupEvent] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => fp(d.text))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, ds: Iterator[Doc], state: GroupState[Long]) =>
          var canonical = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[DedupEvent]()
          ds.foreach { d =>
            canonical match {
              case None =>
                canonical = Some(d.doc_id)
                out += DedupEvent(d.doc_id, d.doc_id, is_dup = false)
              case Some(c) =>
                out += DedupEvent(d.doc_id, c, is_dup = true)
            }
          }
          canonical.foreach(state.update)
          out.iterator
      }
  }
}
