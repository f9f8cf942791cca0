package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Dedup operators find the planted exact and near duplicates. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._
  private val B = DedupQueries.DeltaBase // synthetic-dup band base

  test("exact dedup marks planted copies as dups of their canonical doc") {
    val d = DedupQueries.queries("dedup_exact")(spark, Sf)
    val dups = d.filter($"is_dup").collect()
    assert(dups.nonEmpty)
    // every planted +B copy points back at its source
    dups.filter(_.getAs[Long]("doc_id") >= B).foreach { r =>
      assert(r.getAs[Long]("canonical_id") == r.getAs[Long]("doc_id") - B)
    }
  }

  test("semantic dedup drops every planted twin onto its original keeper") {
    // the planted corpus copies every 50th vector verbatim at id + B: an
    // exact twin always lands in its original's cluster (identical score
    // vector, deterministic tiebreak), so SemDeDup must drop ALL of them
    // with the original as keeper at cos ≈ 1
    val d = SparkEntry.queries("dedup_semantic")(spark, Sf).collect()
    val planted = Tables.load(spark, Sf, "embeddings")
      .filter($"vec_id" % 50 === 0).select($"vec_id").as[Long].collect().toSet
    val dropped = d.map(r => r.getAs[Long]("vec_id")).toSet
    planted.foreach { v => assert(dropped.contains(v + B), s"twin of $v not dropped") }
    d.filter(_.getAs[Long]("vec_id") >= B).foreach { r =>
      assert(r.getAs[Long]("keeper_id") == r.getAs[Long]("vec_id") - B)
      assert(r.getAs[Double]("max_cos") > 0.999)
    }
    // keeper is always the lower id — the survivor convention every other
    // dedup query uses
    d.foreach(r => assert(r.getAs[Long]("keeper_id") < r.getAs[Long]("vec_id")))
  }

  test("substring spans: planted copies surface on the zero diagonal, spans honor the floor") {
    val K = DedupQueries.SpanK
    val rows = SparkEntry.queries("dedup_substring_spans")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("span_tokens") >= DedupQueries.SpanMinTokens, r.toString)
      assert(r.getAs[Long]("start_a") >= 0L && r.getAs[Long]("start_b") >= 0L)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
    // an exact +B copy shares its whole prefix: some span for that pair
    // sits on the zero diagonal (same start on both sides)
    val copyDiag0 = rows.filter(r =>
      r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + B &&
        r.getAs[Long]("start_a") == r.getAs[Long]("start_b"))
    assert(copyDiag0.nonEmpty, "no zero-diagonal span for any planted exact copy")
    // maximality: runs are distinct per (pair, diag) — no two spans of the
    // same pair on the same diagonal may touch (they'd be one island)
    rows.groupBy(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("start_a") - r.getAs[Long]("start_b"))).values.foreach { g =>
      val iv = g.map(r => (r.getAs[Long]("start_a"),
        r.getAs[Long]("start_a") + r.getAs[Long]("span_tokens") - K + 1)).sortBy(_._1)
      iv.zip(iv.tail).foreach { case ((_, e1), (s2, _)) =>
        assert(s2 > e1, s"mergeable islands on one diagonal: $iv")
      }
    }
  }

  test("minhash LSH recovers exact copies (jaccard 1.0) and near copies") {
    val pairs = DedupQueries.queries("dedup_minhash_lsh")(spark, Sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    val exact = pairs.filter { case (a, b, _) => a < B && b == a + B }
    assert(exact.nonEmpty)
    exact.foreach { case (_, _, j) => assert(j == 1.0) }
    val near = pairs.filter { case (a, b, _) => a < B && b == a + 2*B }
    assert(near.nonEmpty)
    near.foreach { case (_, _, j) => assert(j > 0.5 && j < 1.0) }
  }

  test("simhash: identical docs share signatures; near copies are close") {
    val sigs = DedupQueries.queries("dedup_simhash")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    sigs.keys.filter(id => id >= B && id < 2*B).foreach { id =>
      assert(sigs(id) == sigs(id - B), s"exact copy $id")
    }
    val pairs = DedupQueries.queries("dedup_simhash_pairs")(spark, Sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    assert(pairs.exists { case (a, b, h) => b == a + B && h == 0 })
  }

  test("similarity: lsh near-dup finds planted vector copies with cos 1.0") {
    val pairs = graft.operators.SimilarityQueries.queries("ann_lsh_near_dup")(spark, Sf)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos")))
    val planted = pairs.filter { case (a, b, _) => b == a + B }
    assert(planted.size == 10) // 500 vecs, vec_id % 50 == 0 → 10 copies
    planted.foreach { case (_, _, c) => assert(math.abs(c - 1.0) < 1e-12) }
  }

  test("ann topk returns k ranked neighbors per probe") {
    val t = graft.operators.SimilarityQueries.queries("ann_cosine_topk")(spark, Sf)
    val byProbe = t.groupBy("probe_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .collect()
    assert(byProbe.length == 5) // 500 vecs, % 100 == 0
    byProbe.foreach { r =>
      assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("mx") == 10)
    }
  }
}
