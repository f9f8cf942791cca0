package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CDC-style continuous snapshot diff — the idiomatic scale-out form of the
  * reference's interactive loop (SURVEY §2.9).
  *
  * The reference re-snapshots the whole database and re-diffs on every
  * operator keypress (`/root/reference/cmd/dbdiff/main.go:62-87`), holding
  * both snapshots in driver heap. The streaming form instead consumes a
  * keyed changelog (each event carries the row's current normalized column
  * values, or a tombstone for deletes) and keeps only the LAST-SEEN ROW PER
  * KEY in distributed state — O(live keys) state sharded across executors,
  * emitting the same INSERTED / DELETED / UPDATED(before+after) events with
  * per-column `modified_columns` tracking as the batch
  * [[graft.operators.SnapshotDiff]].
  *
  * Deletions are explicit (tombstones): a stream cannot observe absence, so
  * a source that only re-scans snapshots must synthesize tombstones — that
  * is exactly the batch operator's job; this operator serves true
  * changelog/CDC sources.
  */
object StreamingDiff {
  /** One changelog event: normalized column values for `key`, or a
    * tombstone. `cols` is positional (the operator is schema-agnostic,
    * like the reference's positional compare, `extract_data.go:174-183`). */
  final case class KeyedRow(key: String, cols: Seq[String], tombstone: Boolean)

  /** One emitted diff event; mirrors the batch diff's output schema. */
  final case class DiffEvent(key: String, diff_status: String,
      modified_columns: String, side: String, cols: Seq[String])

  /** Stateful diff over a changelog stream. `colNames` names the positional
    * columns for `modified_columns` reporting. */
  def diffStream(events: Dataset[KeyedRow], colNames: Seq[String]): Dataset[DiffEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, evs: Iterator[KeyedRow], state: GroupState[Seq[String]]) =>
          var prior = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[DiffEvent]()
          evs.foreach { ev =>
            (prior, ev.tombstone) match {
              case (None, true) => // delete of unknown key: ignore
              case (None, false) =>
                out += DiffEvent(key, "INSERTED", "", "AFTER", ev.cols)
                prior = Some(ev.cols)
              case (Some(p), true) =>
                out += DiffEvent(key, "DELETED", "", "BEFORE", p)
                prior = None
              case (Some(p), false) =>
                val modified = colNames.indices
                  .filter(i => p.lift(i) != ev.cols.lift(i))
                  .map(colNames(_)).mkString(",")
                if (modified.nonEmpty) {
                  out += DiffEvent(key, "UPDATED", modified, "BEFORE", p)
                  out += DiffEvent(key, "UPDATED", modified, "AFTER", ev.cols)
                  prior = Some(ev.cols)
                } // equal → NOT_MODIFIED → filtered (reference F3)
            }
          }
          prior match {
            case Some(p) => state.update(p)
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** Streaming twin of the batch incremental aggregate
    * ([[graft.operators.DiffQueries]] `diff_incremental_agg`): a grouped
    * count/sum kept continuously current by folding the differ's own
    * [[DiffEvent]] changelog — AFTER-side rows add, BEFORE-side rows
    * subtract, so an update that moves a row between groups decrements the
    * old group and increments the new one in the same micro-batch.
    *
    * Spark-first: this is a NATIVE streaming aggregation (state handled by
    * the engine, map-side partial merge, one shuffle on the group key), not
    * hand-rolled `GroupState`. Sums accumulate in exact decimal, so results
    * are independent of event interleaving across micro-batches. Groups
    * whose live count reaches 0 report n_rows = 0 (complete-mode output
    * cannot retract a group); consumers filter n_rows > 0, as the batch
    * operator does. */
  def incrementalAgg(events: Dataset[DiffEvent], colNames: Seq[String],
      groupCol: String, valueCol: String): DataFrame = {
    val gi = colNames.indexOf(groupCol)
    val vi = colNames.indexOf(valueCol)
    require(gi >= 0 && vi >= 0, s"unknown column: $groupCol/$valueCol not in $colNames")
    val w = when(col("side") === "AFTER", lit(1L)).otherwise(lit(-1L))
    events.toDF()
      .select(col("cols")(gi).as(groupCol), w.as("__w"),
        (w * col("cols")(vi).cast("decimal(38,4)")).cast("decimal(38,4)").as("__wv"))
      .groupBy(col(groupCol))
      .agg(sum(col("__w")).as("n_rows"),
        sum(col("__wv")).cast("decimal(38,4)").as("sum_val"))
  }
}
