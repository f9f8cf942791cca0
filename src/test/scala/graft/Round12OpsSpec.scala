package graft

import graft.operators.{PipelineQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Pins the round-12 operators beyond the DuckDB hash gate.
  *
  * - `text_gopher_rules`: every per-doc stat and the integer-gated
  *   gopher_ok recomputed driver-side from the raw text (independent
  *   tokenizer + top-n-gram tie-break).
  * - `pipeline_domain_caps`: cap/threshold arithmetic and the exact kept
  *   SET (n_kept + kept_id_sum) recomputed from first principles with a
  *   JVM md5 — plus the plan gate: the counts frame must broadcast.
  * - `ann_recall_report`: per-probe overlap recomputed by joining the two
  *   registry queries it composes; recall floor at the fixture.
  */
class Round12OpsSpec extends SparkTestBase {

  private def md5Hash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("gopher rules: stats and the integer-gated keep recomputed from raw text") {
    val out = SparkEntry.queries("text_gopher_rules")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.load(spark, Sf, "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty && out.size === docs.length)
    def topMass(toks: Seq[String], n: Int): Long =
      if (toks.length < n) 0L
      else {
        val counts = toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (g, o) => (g, o.size) }
        val (g, c) = counts.toSeq.minBy { case (g, c) => (-c, g) }(
          Ordering.Tuple2(Ordering.Int, Ordering.String))
        c.toLong * g.length
      }
    var kept, dropped = 0
    docs.foreach { d =>
      val text = d.getAs[String]("text")
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val r = out(d.getAs[Long]("doc_id"))
      val nWords = toks.length.toLong
      val nChars = text.length.toLong
      val sumLen = toks.map(_.length.toLong).sum
      val nAlpha = toks.count(_.matches("[a-z]+")).toLong
      // DISTINCT stop words present, per the table-A1 rule (not occurrences)
      val nStop = toks.filter(TextQueries.Stopwords.contains).distinct.length.toLong
      val m2 = topMass(toks, 2)
      val m3 = topMass(toks, 3)
      assert(r.getAs[Long]("n_words") === nWords)
      assert(r.getAs[Long]("n_chars") === nChars)
      assert(r.getAs[Long]("n_stop") === nStop)
      assert(r.getAs[Double]("top2_char_frac") === m2.toDouble / math.max(nChars, 1L))
      assert(r.getAs[Double]("top3_char_frac") === m3.toDouble / math.max(nChars, 1L))
      val expectOk = nWords >= TextQueries.GopherMinWords &&
        nWords <= TextQueries.GopherMaxWords &&
        sumLen >= 3 * nWords && sumLen <= 10 * nWords &&
        5 * nAlpha >= 4 * nWords &&
        nStop >= TextQueries.GopherMinStop &&
        5 * m2 <= nChars && 50 * m3 <= 9 * nChars
      assert(r.getAs[Boolean]("gopher_ok") === expectOk,
        s"doc ${d.getAs[Long]("doc_id")}: words=$nWords stop=$nStop m2=$m2 m3=$m3")
      if (expectOk) kept += 1 else dropped += 1
    }
    // the ruleset must actually discriminate on this corpus
    assert(kept > 0 && dropped > 0, s"kept=$kept dropped=$dropped")
    CacheScope.releaseAll()
  }

  test("domain caps: threshold arithmetic and the exact kept set; counts broadcast") {
    val df = SparkEntry.queries("pipeline_domain_caps")(spark, Sf)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "per-source caps frame must broadcast")
    val out = df.collect().map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.load(spark, Sf, "documents")
      .select("doc_id", "source").collect()
    val bySrc = docs.groupBy(_.getAs[String]("source"))
    val tot = docs.length.toLong
    val cap = math.max(PipelineQueries.DomainCapFloor, tot / PipelineQueries.DomainCapDiv)
    assert(out.size === bySrc.size)
    bySrc.foreach { case (src, rows) =>
      val r = out(src)
      val nDocs = rows.length.toLong
      val thr = math.min(1000L, cap * 1000L / nDocs)
      assert(r.getAs[Long]("cap") === cap)
      assert(r.getAs[Long]("keep_permille") === thr)
      val keptIds = rows.map(_.getAs[Long]("doc_id"))
        .filter(id => md5Hash64(id.toString) % 1000L < thr)
      assert(r.getAs[Long]("n_kept") === keptIds.length.toLong)
      assert(r.getAs[Long]("kept_id_sum") === keptIds.sum)
      // a capped domain must actually lose documents at this fixture
      if (nDocs > cap) assert(r.getAs[Long]("n_kept") < nDocs)
    }
    CacheScope.releaseAll()
  }

  test("corpus report: every column matches the standalone operators aggregated per source") {
    val rep = SparkEntry.queries("pipeline_corpus_report")(spark, Sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.load(spark, Sf, "documents").select("doc_id", "source", "text")
      .collect()
    val srcOf = docs.map(d => d.getAs[Long]("doc_id") -> d.getAs[String]("source")).toMap
    def bySrc[T](rows: Array[(Long, T)]): Map[String, Seq[T]] =
      rows.toSeq.groupBy { case (id, _) => srcOf(id) }
        .map { case (s, g) => s -> g.map(_._2) }
    val quality = bySrc(SparkEntry.queries("text_quality")(spark, Sf)
      .select("doc_id", "quality_ok").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)))
    val lang = bySrc(SparkEntry.queries("text_langid")(spark, Sf)
      .select("doc_id", "detected_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)))
    val toks = bySrc(SparkEntry.queries("text_stats")(spark, Sf)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)))
    // n_dup recomputed driver-side: non-canonical under min-doc_id-per-text
    // (dedup_exact itself runs on the dup-EXTENDED corpus, so it cannot be
    // the twin here — the report reads the raw table)
    val canonOf = docs.toSeq.groupBy(_.getAs[String]("text"))
      .toSeq.flatMap { case (_, g) =>
        val ids = g.map(_.getAs[Long]("doc_id"))
        ids.map(_ -> ids.min)
      }
    val dupBySrc = canonOf.toSeq.filter { case (id, c) => id != c }
      .groupBy { case (id, _) => srcOf(id) }.map { case (s, g) => s -> g.size.toLong }
    assert(rep.nonEmpty)
    rep.foreach { case (s, r) =>
      assert(r.getAs[Long]("n_docs") === toks(s).length.toLong, s"$s n_docs")
      assert(r.getAs[Long]("n_tokens") === toks(s).sum, s"$s n_tokens")
      assert(r.getAs[Long]("n_quality_ok") === quality(s).count(identity).toLong,
        s"$s n_quality_ok")
      assert(r.getAs[Long]("n_en") === lang(s).count(_ == "en").toLong, s"$s n_en")
      assert(r.getAs[Long]("n_dup") === dupBySrc.getOrElse(s, 0L), s"$s n_dup")
    }
    CacheScope.releaseAll()
  }

  test("recall report: overlap matches the two registry paths joined independently") {
    val report = SparkEntry.queries("ann_recall_report")(spark, Sf).collect()
    assert(report.nonEmpty)
    val exact = SparkEntry.queries("ann_cosine_topk")(spark, Sf)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("ann_ivf_sampled")(spark, Sf)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probes = exact.map(_._1)
    assert(report.map(_.getAs[Long]("probe_id")).toSet === probes)
    report.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val nExact = exact.count(_._1 == p).toLong
      val nHit = exact.count { case (pp, nn) => pp == p && approx((pp, nn)) }.toLong
      assert(r.getAs[Long]("n_exact") === nExact)
      assert(r.getAs[Long]("n_hit") === nHit)
      assert(r.getAs[Double]("recall") === nHit.toDouble / nExact)
    }
    val mean = report.map(_.getAs[Double]("recall")).sum / report.length
    assert(mean >= 0.5, s"mean recall@$$k collapsed: $mean")
    CacheScope.releaseAll()
  }
}
