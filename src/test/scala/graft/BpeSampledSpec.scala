package graft

import graft.operators.TextQueries
import org.apache.spark.sql.functions._

/** Pins the sampled-geometry BPE trainer (the 100 TB knob on
  * [[TextQueries.bpeTrain]]): the hash-threshold word sample must actually
  * engage, and the trainer run on it must be exactly deterministic — the
  * sampling is a hash predicate over a keyed aggregate, so two runs see
  * the identical word frame and every argmax tiebreak replays. The
  * default (full-corpus) geometry stays oracle-replayed bit-for-bit by
  * `text_bpe_merges`; this spec covers the geometry the oracle never
  * sees. */
class BpeSampledSpec extends SparkTestBase {

  private def mergeRows(k: Long): Seq[(Long, String, String, String, Long)] = {
    val (merges, _) = TextQueries.bpeTrain(spark, Sf, sampleOneIn = k)
    val rows = merges.orderBy(col("step"))
      .collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
      .toSeq
    CacheScope.releaseAll()
    rows
  }

  test("sampled trainer: knob engages, merge table deterministic and well-formed") {
    val a = mergeRows(2L)
    val b = mergeRows(2L)
    assert(a.nonEmpty && a.size <= TextQueries.BpeMerges)
    assert(a == b, "sampled trainer is not deterministic across runs")
    // well-formed: steps 1..n in order, merged symbol is the concatenation
    a.zipWithIndex.foreach { case ((step, l, r, m, cnt), i) =>
      assert(step == i + 1 && m == l + r && cnt > 0, s"malformed row $i: $a")
    }
    // the sample must differ from the full geometry somewhere on this
    // fixture (pair counts at minimum), or the knob silently no-ops
    val full = mergeRows(1L)
    assert(a != full, "sampleOneIn=2 produced the identical merge table " +
      "with identical counts — the sampler did not engage")
  }
}
