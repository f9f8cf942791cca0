package graft.operators

import graft.CacheScope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's core operator: keyed snapshot diff.
  *
  * Reference semantics (`/root/reference/extract_data.go:196-246`,
  * `ExtractChangedData`): probe the *after* snapshot with every *before* key
  * — key missing from after → DELETED; present and all columns equal →
  * NOT_MODIFIED; present and unequal → UPDATED (both rows emitted, before
  * then after, with the exact set of modified columns recorded on both,
  * `extract_data.go:161-184`); keys only in after → INSERTED. Only
  * changed rows reach the report (`extract_data.go:216,226-239`).
  *
  * The reference implements this as a single-threaded driver-side hash join
  * over two fully heap-materialized Go maps — its scale ceiling is driver
  * RAM. Here the same semantics are one declarative full-outer join on the
  * derived `__key`, so Catalyst/AQE pick the physical strategy (sort-merge
  * with both sides shuffled by key; broadcast-hash when one snapshot is
  * small) and nothing ever materializes on the driver. At 100 TB: both
  * snapshots shuffle-partition by `__key` hash — one shuffle each, no
  * driver state, and if the lake bucket-stores snapshots by the same key the
  * shuffle disappears entirely. Classification compares each side's packed
  * normalized row as ONE codegen'd string equality (r13 — see
  * [[classifyNormalized]] for the byte accounting); the positional
  * per-column compare runs only on UPDATED rows.
  *
  * Output schema: `__key, diff_status, modified_columns, side, <data cols
  * stringified>`. `modified_columns` is a comma-joined list in column order
  * (empty for non-UPDATED rows); `side` is BEFORE/AFTER; NOT_MODIFIED rows
  * are filtered out (reference F3).
  *
  * Duplicate keys (non-unique PK or a separator-less key-concat collision,
  * SURVEY §7.4.1/3): the reference's map insert keeps one nondeterministic
  * winner per key (`extract_data.go:81`); this operator instead keeps every
  * pairing (join multiplicity) — deterministic and information-preserving,
  * with [[statusCounts]]/[[report]] counting distinct keys. The fixture
  * lineitem table has 1,161 duplicate PK pairs, so this path is exercised
  * by the oracle gate, not just documented.
  */
object SnapshotDiff {
  val Inserted = "INSERTED"
  val Deleted = "DELETED"
  val Updated = "UPDATED"
  val NotModified = "NOT_MODIFIED"

  /** The classification join shared by [[diff]] and [[statusCounts]]:
    * one row per key-pairing with `diff_status`, `modified_columns`, and
    * both sides' PACKED normalized rows (`__b` / `__a` — one U+0001-joined
    * string each; consumers re-split on emission). */
  private def classified(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame =
    classifyNormalized(Normalize.withKey(before, pk), Normalize.withKey(after, pk))

  /** Same classification over already-normalized inputs (each: data columns
    * stringified + `__key`). This is the entry point for pre-materialized
    * snapshot stores — e.g. [[BucketedSnapshots]], where both sides are
    * bucketed by `__key` and the join plans with ZERO shuffle. */
  private[operators] def classifyNormalized(bn: DataFrame, an: DataFrame): DataFrame = {
    val cols = bn.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
    // r13 (guide §2.3, shuffle fewer bytes): each side packs its normalized
    // columns into ONE U+0001-joined string before the exchange instead of
    // shipping n individual string columns — every UnsafeRow field costs an
    // 8-byte offset/size word on top of its bytes, so the packed row cuts
    // the full-outer join's shuffle width ~35% on an 11-column lineitem
    // row (and shrinks the sort-merge sort/spill rows identically).
    // Separator injectivity (values never contain U+0001) is the SAME
    // assumption every fingerprint in this file has always made (row_fp,
    // merkle checksums, three-way fps are md5/hash64 over the identical
    // concat); fixtures are audited clean at every SF. Under it:
    //   - packed-string equality ⇔ the former element-wise compare, so
    //     classification (F2) is unchanged — and becomes ONE codegen'd
    //     string compare instead of an n-branch when-tree per row;
    //   - split(packed) roundtrips the exact per-column values, so the
    //     positional modified-column list (F1) and every consumer's
    //     emission are unchanged. The interpreted zip_with/filter for F1
    //     runs ONLY on UPDATED rows (CaseWhen branches evaluate lazily) —
    //     the round-4 finding that killed the first packed form.
    def pack(df: DataFrame, out: String): DataFrame =
      df.select(col(Normalize.KeyCol),
        concat_ws("\u0001", cols.map(col): _*).as(out))
    val j = pack(bn, "__b").join(pack(an, "__a"), Seq(Normalize.KeyCol), "full_outer")

    // Normalized values are never null, so a null packed side ⇔ the key
    // is absent from that snapshot (the join's null-extension).
    val status = when(col("__b").isNull, Inserted)
      .when(col("__a").isNull, Deleted)
      .when(col("__b") === col("__a"), NotModified)
      .otherwise(Updated)

    // F1: positional comparison over the re-split values; comma-joined
    // names of differing columns, in column order (ModifiedColumnIndex,
    // extract_data.go:174-183). split(_, sep, -1) keeps trailing empties,
    // so each side re-yields exactly cols.size values.
    val names = array(cols.map(lit(_)): _*)
    val neq = zip_with(split(col("__b"), "\\u0001", -1),
      split(col("__a"), "\\u0001", -1), (bv, av) => bv =!= av)
    val modList = concat_ws(",",
      filter(zip_with(names, neq, (n, d) => when(d, n)), x => x.isNotNull))

    j.withColumn("diff_status", status)
      .withColumn("modified_columns",
        when(status === Updated, modList).otherwise(lit("")))
  }

  /** Full diff. `before`/`after` must share the same schema (the harness
    * always diffs two snapshots of one table; the reference's column-count-
    * mismatch branch, `extract_data.go:162-171`, is degenerate here).
    * `pk` empty is disallowed — PK-less tables pass all columns (S5). */
  def diff(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame =
    diffNormalized(Normalize.withKey(before, pk), Normalize.withKey(after, pk))

  /** Full diff over already-normalized snapshots (data columns stringified +
    * `__key`) — used directly by pre-materialized stores. */
  def diffNormalized(bn: DataFrame, an: DataFrame): DataFrame = {
    val cols = bn.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
    val j = classifyNormalized(bn, an)
    val status = col("diff_status")
    val modified = col("modified_columns")

    // emitted structs carry the packed side string; the final projection
    // re-splits it into the stringified columns — one codegen split per
    // EMITTED row (changed rows only; NOT_MODIFIED explodes to zero rows,
    // the F3 filter), where the pre-r13 form shipped every column of every
    // joined row through the exchange.
    def sideRow(side: String, packed: Column): Column =
      struct(lit(side).as("side"), packed.as("packed"))

    // Single-pass emission: UPDATED explodes into its before+after pair
    // (reference emits before first, extract_data.go:226-228 — order is
    // carried by `side`).
    val rows = when(status === Inserted, array(sideRow("AFTER", col("__a"))))
      .when(status === Deleted, array(sideRow("BEFORE", col("__b"))))
      .when(status === Updated,
        array(sideRow("BEFORE", col("__b")), sideRow("AFTER", col("__a"))))
      .otherwise(array())

    j.select(
        col(Normalize.KeyCol),
        status.as("diff_status"),
        modified.as("modified_columns"),
        explode(rows).as("__r"))
      .withColumn("__vals", split(col("__r.packed"), "\\u0001", -1))
      .select(
        Seq(col(Normalize.KeyCol), col("diff_status"), col("modified_columns"),
          col("__r.side").as("side")) ++
          cols.zipWithIndex.map { case (c, i) => col("__vals")(i).as(c) }: _*)
  }

  /** Reference map semantics (`extract_data.go:81`): ONE row per key — a Go
    * map insert keeps a nondeterministic winner among duplicate keys; here
    * the winner is the lexicographic max of the normalized row (struct max,
    * field order = column order), so reruns and retries agree. A plain
    * hash-aggregate with map-side combine: it shares the diff join's hash
    * partitioning on `__key`, so AQE plans no extra shuffle between the
    * dedup and the join. Used by the application loop ([[graft.app.DbDiffApp]]),
    * where `diff(A, A) = ∅` must hold even for duplicate-PK tables; the
    * harness `diff_*` queries keep the information-preserving multiplicity
    * semantics instead. */
  def oneRowPerKey(normalized: DataFrame): DataFrame = {
    val cols = normalized.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
    normalized.groupBy(col(Normalize.KeyCol))
      .agg(max(struct(cols.map(col): _*)).as("__r"))
      .select(col(Normalize.KeyCol) +: cols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** [[diff]] under the reference's one-row-per-key map semantics. */
  def diffOneWinner(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame =
    diffNormalized(
      oneRowPerKey(Normalize.withKey(before, pk)),
      oneRowPerKey(Normalize.withKey(after, pk)))

  /** SCD2 history build: turn a (before, after) snapshot pair into
    * slowly-changing-dimension validity intervals — the temporal-warehouse
    * consumer of the diff. Version 0 = before, version 1 = after:
    * unchanged keys keep one open row [0, NULL); deleted and updated keys
    * close their before row at [0, 1); inserted and updated keys open
    * their after row at [1, NULL). Single pass over the same one
    * full-outer join as the diff (the classify branches explode in place
    * — no re-join per branch), so the scale budget is identical:
    * one shuffle per side. */
  def scd2(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame =
    scd2Normalized(
      oneRowPerKey(Normalize.withKey(before, pk)),
      oneRowPerKey(Normalize.withKey(after, pk)))

  /** [[scd2]] over already one-winner'd normalized snapshots — used by the
    * bucketed store, where both inputs arrive hash-distributed on `__key`
    * and the whole history build plans with zero Exchange. */
  def scd2Normalized(bn: DataFrame, an: DataFrame): DataFrame = {
    val cols = bn.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
    val j = classifyNormalized(bn, an)
    val status = col("diff_status")
    // version structs carry the packed side string (classifyNormalized's
    // r13 narrow-shuffle form); the final projection re-splits it — one
    // codegen split per emitted history row
    def ver(packed: Column, from: Long, to: Option[Long]): Column =
      struct(packed.as("packed"),
        lit(from).as("valid_from"),
        to.map(v => lit(v)).getOrElse(lit(null)).cast("long").as("valid_to"))
    val bOpen = ver(col("__b"), 0L, None)
    val bClosed = ver(col("__b"), 0L, Some(1L))
    val aOpen = ver(col("__a"), 1L, None)
    val rows = when(status === NotModified, array(bOpen))
      .when(status === Deleted, array(bClosed))
      .when(status === Updated, array(bClosed, aOpen))
      .otherwise(array(aOpen)) // INSERTED
    j.select(col(Normalize.KeyCol), explode(rows).as("__r"))
      .withColumn("__vals", split(col("__r.packed"), "\\u0001", -1))
      .select(col(Normalize.KeyCol) +:
        cols.zipWithIndex.map { case (c, i) => col("__vals")(i).as(c) } :+
        col("__r.valid_from").as("valid_from") :+
        col("__r.valid_to").as("valid_to"): _*)
  }

  /** Multi-version SCD2: fold a whole ORDERED sequence of snapshots into
    * validity intervals in ONE declarative plan (not an iterative driver
    * loop): union all normalized versions tagged with their ordinal, then
    * per key detect run starts (value changed vs the previous version, or
    * the key was absent in between) with a lag window, and aggregate each
    * run to [first_version, end). A run that survives to the last version
    * stays open (valid_to NULL); a key deleted and re-inserted produces
    * two disjoint intervals. Scale shape: one union-wide shuffle on
    * `__key` shared by the window and the run aggregation — cost is
    * independent of the number of versions beyond the data volume itself.
    * Consistency with the pairwise [[scd2]] is pinned by spec. */
  def scd2Chain(snapshots: Seq[DataFrame], pk: Seq[String]): DataFrame = {
    require(snapshots.size >= 2, "scd2Chain needs at least two snapshots")
    val normed = snapshots.map(s => oneRowPerKey(Normalize.withKey(s, pk)))
    val cols = normed.head.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
    val n = normed.size
    val tagged = normed.zipWithIndex
      .map { case (df, i) => df.withColumn("__v", lit(i.toLong)) }
      .reduce(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(Normalize.KeyCol)).orderBy(col("__v"))
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val rowStruct = struct(cols.map(col): _*)
    val prevRow = lag(rowStruct, 1).over(w)
    val prevV = lag(col("__v"), 1).over(w)
    val isStart = prevRow.isNull || prevV =!= col("__v") - 1 || prevRow =!= rowStruct
    tagged
      .withColumn("__start", when(isStart, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__start")).over(run))
      .groupBy(col(Normalize.KeyCol) +: col("__run") +: cols.map(col): _*)
      .agg(min(col("__v")).as("valid_from"), max(col("__v")).as("__last_v"))
      .select(col(Normalize.KeyCol) +: cols.map(col) :+
        col("valid_from") :+
        when(col("__last_v") === (n - 1).toLong, lit(null).cast("long"))
          .otherwise(col("__last_v") + 1L).as("valid_to"): _*)
  }

  /** MERGE (the write-back direction the reference lacks): reconstruct the
    * after snapshot from `before` + a [[diffOneWinner]] diff. Keys marked
    * DELETED or UPDATED drop their before row (one anti-join), then the
    * AFTER-side rows (INSERTED + UPDATED) union in. Operates in the
    * normalized one-row-per-key domain and returns the normalized after
    * frame — so `applyDiff(A, diffOneWinner(A, B)) == oneRowPerKey(
    * normalize(B))` exactly, which the roundtrip oracle and property spec
    * pin. Scale shape: one key-hashed anti-join plus a union — the same
    * single-shuffle-per-side budget as the diff itself. */
  def applyDiff(before: DataFrame, diffed: DataFrame, pk: Seq[String]): DataFrame =
    applyDiffNormalized(oneRowPerKey(Normalize.withKey(before, pk)), diffed)

  /** [[applyDiff]] over an already-normalized, already-deduplicated before
    * snapshot — the entry point for pre-materialized stores
    * ([[BucketedSnapshots.advance]]), where `bn`'s bucketed distribution
    * makes the anti-join Exchange-free. */
  def applyDiffNormalized(bn: DataFrame, diffed: DataFrame): DataFrame = {
    val cols = bn.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
    val gone = diffed.filter(col("diff_status").isin(Deleted, Updated))
      .select(col(Normalize.KeyCol)).distinct()
    val kept = bn.join(gone, Seq(Normalize.KeyCol), "left_anti")
    val incoming = diffed.filter(col("side") === "AFTER")
      .select(cols.map(col) :+ col(Normalize.KeyCol): _*)
    kept.select(cols.map(col) :+ col(Normalize.KeyCol): _*).unionByName(incoming)
  }

  /** Fixed-width change-feed projection of a [[diff]] result: (table, key,
    * status, modified columns, side, md5 row fingerprint). Row payloads
    * travel as 32-byte fingerprints, so feed width is independent of table
    * schema — the shape a multi-table CDC export unions into one stream.
    * Shared by the `diff_changefeed` harness query and the application
    * loop's feed sink. */
  def feed(d: DataFrame, tableName: String, cols: Seq[String]): DataFrame =
    d.select(lit(tableName).as("table_name"), col(Normalize.KeyCol),
      col("diff_status"), col("modified_columns"), col("side"),
      md5(concat_ws("\u0001", cols.map(col): _*)).as("row_fp"))

  /** [[diff]]→[[feed]] fused over a PACKED row form — the multi-table
    * changefeed's plan-cost fix. The wide diff compiles a per-column
    * `when`-tree whose generated code is unique per table schema: unioning
    * nine tables meant nine wide whole-stage-codegen plans compiled in one
    * query, and at sf0.1 the driver's cost was planning/codegen, not data
    * (round-3 finding). Here each table is first packed to the GENERIC
    * shape `(__key, array<string> of normalized values)`, so the join, the
    * positional compare (one `zip_with` instead of n_cols branches), the
    * classification, and the feed projection are the SAME tiny plan — and
    * the same generated classes, JIT-shared across all tables — with only
    * the scan+pack projection differing per table.
    *
    * Semantics are exactly [[diff]]'s: same full-outer join on the derived
    * key (duplicate-key multiplicities preserved), same positional string
    * compare, same modified-column list in column order, same
    * BEFORE-then-AFTER emission — `diff_changefeed`'s oracle stays the
    * unchanged per-table wide-diff SQL. */
  def feedCompact(before: DataFrame, after: DataFrame, pk: Seq[String],
      tableName: String, cols: Seq[String]): DataFrame =
    feedCompactNormalized(Normalize.withKey(before, pk),
      Normalize.withKey(after, pk), tableName, cols)

  /** [[feedCompact]] over already-normalized snapshots (data columns
    * stringified + `__key`) — the entry point for pre-materialized stores:
    * with both sides bucketed by `__key` ([[BucketedSnapshots]]) the pack
    * projection preserves the buckets' hash distribution, the full-outer
    * join sort-merges bucket-to-bucket, and the feed projection adds no
    * shuffle — the WHOLE multi-table changefeed export plans with zero
    * Exchange (gated by `BucketedDiffSpec`). */
  def feedCompactNormalized(bn: DataFrame, an: DataFrame,
      tableName: String, cols: Seq[String]): DataFrame = {
    // r13: delegates to [[classifyNormalized]]'s packed narrow-shuffle form
    // (one U+0001-joined string per side through the exchange — see its
    // scaladoc for the byte accounting and the separator-injectivity
    // argument). The packed string is exactly the bytes the feed's md5
    // row_fp hashes, so emission applies md5 directly after the explode —
    // no per-row re-concatenation anywhere in the feed.
    val j = classifyNormalized(bn, an)
    val status = col("diff_status")
    def sideRow(side: String, packed: Column): Column =
      struct(lit(side).as("side"), packed.as("packed"))
    val rows = when(status === Inserted, array(sideRow("AFTER", col("__a"))))
      .when(status === Deleted, array(sideRow("BEFORE", col("__b"))))
      .when(status === Updated,
        array(sideRow("BEFORE", col("__b")), sideRow("AFTER", col("__a"))))
      .otherwise(array())
    j.select(col(Normalize.KeyCol), status.as("diff_status"),
        col("modified_columns"), explode(rows).as("__r"))
      .select(lit(tableName).as("table_name"), col(Normalize.KeyCol),
        col("diff_status"), col("modified_columns"), col("__r.side").as("side"),
        md5(col("__r.packed")).as("row_fp"))
  }

  /** Diff across a schema change: the snapshots disagree on shape (columns
    * added and/or dropped between them). The reference's branch for this is
    * degenerate — a column-count mismatch marks EVERY column modified
    * (`extract_data.go:162-171`) — so the useful semantics are rebuilt
    * properly: the data diff runs over the column intersection (in
    * before's column order, keeping the positional-compare discipline),
    * and the shape change itself is reported separately by
    * [[schemaDrift]]. The PK must survive the evolution. Plan shape is
    * identical to [[diff]] — the projection prunes the dropped/added
    * columns at the scan. */
  def diffEvolved(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame = {
    val afterCols = after.columns.toSet
    val common = before.columns.filter(afterCols).toIndexedSeq
    require(pk.forall(common.contains), s"pk $pk must survive the schema change")
    diff(before.select(common.map(col): _*), after.select(common.map(col): _*), pk)
  }

  /** Catalog-level twin of [[diffEvolved]]: which columns were ADDED /
    * DROPPED between the snapshots (schema metadata, not data — this is
    * driver-side by nature and O(columns)). */
  def schemaDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    (before.columns.diff(after.columns).toSeq.map((_, "DROPPED")) ++
      after.columns.diff(before.columns).toSeq.map((_, "ADDED")))
      .toDF("column_name", "change")
  }

  /** Three-way merge classification — the version-control operation over
    * snapshots: two branches (`left`, `right`) diverged from a common
    * `base`; classify every key by how the branches reconcile. Each
    * snapshot reduces to (key, row-fingerprint) — md5 over the normalized
    * columns joined with a U+0001 separator, so a whole row travels as 32
    * bytes — then two full-outer joins on `__key` give the presence/
    * equality pattern:
    *
    *   - `LEFT_CHANGE` / `RIGHT_CHANGE`: only one branch touched the key
    *     (update, delete, or insert) — the merge takes that branch;
    *   - `BOTH_SAME`: both branches made the identical change — clean;
    *   - `CONFLICT`: both touched it and disagree — `merged_fp` is NULL,
    *     a policy (or human) must pick.
    *
    * Untouched keys are dropped (the merge IS the change set). At 100 TB:
    * three shuffles of 32-byte fingerprints (one per snapshot), no row
    * data in the joins, no driver state; the bucketed layout that makes
    * two-way diffs Exchange-free applies unchanged. Keys must be unique
    * per snapshot (run the app loop's one-winner dedup first for
    * duplicate-key tables). */
  def threeWayMerge(base: DataFrame, left: DataFrame, right: DataFrame,
      pk: Seq[String]): DataFrame = {
    val Absent = "<ABSENT>"
    def fp(df: DataFrame, out: String): DataFrame = {
      val n = Normalize.withKey(df, pk)
      val cols = n.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
      n.select(col(Normalize.KeyCol),
        md5(concat_ws("\u0001", cols.map(col): _*)).as(out))
    }
    val j = fp(base, "__b")
      .join(fp(left, "__l"), Seq(Normalize.KeyCol), "full_outer")
      .join(fp(right, "__r"), Seq(Normalize.KeyCol), "full_outer")
    val bf = coalesce(col("__b"), lit(Absent))
    val lf = coalesce(col("__l"), lit(Absent))
    val rf = coalesce(col("__r"), lit(Absent))
    val status = when(lf === bf && rf === bf, "UNCHANGED")
      .when(rf === bf, "LEFT_CHANGE")
      .when(lf === bf, "RIGHT_CHANGE")
      .when(lf === rf, "BOTH_SAME")
      .otherwise("CONFLICT")
    j.select(col(Normalize.KeyCol), bf.as("base_fp"), lf.as("left_fp"),
        rf.as("right_fp"), status.as("merge_status"),
        when(status === "CONFLICT", lit(null).cast("string"))
          .when(status === "RIGHT_CHANGE", rf)
          .otherwise(lf).as("merged_fp"))
      .filter(col("merge_status") =!= "UNCHANGED")
  }

  /** Merkle-style bucket summary — the repeat-diff accelerator for very
    * large snapshots. Each side reduces to `nBuckets` fixed-width rows:
    * bucket = hash(`__key`) mod nBuckets, and per bucket a row count plus
    * an ORDER-INDEPENDENT checksum (exact decimal sum of 60-bit row
    * hashes, reduced mod 10¹⁸ — commutative, so partition order and
    * parallelism can't perturb it). A bucket whose (count, checksum) pair
    * agrees on both sides provably holds no net change worth scanning*;
    * only disagreeing ("dirty") buckets need the full-outer-join pass.
    *
    * At 100 TB this is the difference between re-joining the whole lake on
    * every diff cycle and re-joining only the touched fraction: the
    * summary pass is a narrow projection + one map-side-combined
    * aggregation per side (no join of row data at all), its output is
    * KB-sized regardless of input size, and the subsequent pruned diff
    * joins only dirty-bucket rows. (*modulo 60-bit-hash-sum collisions —
    * the standard anti-entropy trade, cf. Merkle-tree replica repair.
    * [[merkleDirty128]] IS the production profile: 128 checksum bits via
    * two xxhash64 lanes; this md5-derived single-lane variant exists so
    * the summary itself stays DuckDB-replayable, `diff_merkle_dirty`.)
    *
    * Output (dirty buckets only): `bucket, b_rows, a_rows, b_sum, a_sum`.
    * Empty ⇔ snapshots are (checksum-)identical, so `diff(A, A)` prunes
    * to nothing before any join runs. */
  def merkleSummary(bn: DataFrame, an: DataFrame, nBuckets: Int): DataFrame = {
    def side(df: DataFrame, rowsName: String, sumName: String): DataFrame = {
      val cols = df.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq
      df.select(
          bucketOf(col(Normalize.KeyCol), nBuckets).as("bucket"),
          graft.functions.Hashing.hash64(concat_ws("\u0001", cols.map(col): _*))
            .cast("decimal(38,0)").as("__h"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as(rowsName),
          (sum(col("__h")) % lit(1000000000000000000L)).cast("long").as(sumName))
    }
    side(bn, "b_rows", "b_sum")
      .join(side(an, "a_rows", "a_sum"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("b_rows"), lit(0L)).as("b_rows"),
        coalesce(col("a_rows"), lit(0L)).as("a_rows"),
        coalesce(col("b_sum"), lit(0L)).as("b_sum"),
        coalesce(col("a_sum"), lit(0L)).as("a_sum"))
      .filter(col("b_rows") =!= col("a_rows") || col("b_sum") =!= col("a_sum"))
  }

  private def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(graft.functions.Hashing.hash64(key), lit(nBuckets.toLong))

  /** The PRODUCTION checksum profile [[merkleSummary]]'s doc promises: the
    * same bucket summary with a 128-bit checksum — TWO independent
    * codegen'd xxhash64 lanes (the [[fusedReport]] fingerprint discipline:
    * multi-column hashing folds each value in with its length, no
    * separator string, no MessageDigest on the hot path), each lane an
    * exact decimal sum reduced mod 10¹⁸ per bucket. Two 60-bit-sum lanes
    * put a false-clean bucket at ~2⁻¹²⁰ — negligible at any lake size,
    * where one lane's 2⁻⁶⁰ is not. These checksums never surface in an
    * oracle-checked output (the pruned diff's oracle is the UNPRUNED
    * diff), so no cross-engine hash parity constrains the choice —
    * [[merkleSummary]] keeps the md5-derived single lane exactly so the
    * summary itself stays DuckDB-replayable (`diff_merkle_dirty`).
    * Returns dirty buckets only, as `bucket` plus per-side row counts. */
  def merkleDirty128(bn: DataFrame, an: DataFrame, nBuckets: Int): DataFrame = {
    def side(df: DataFrame, p: String): DataFrame = {
      val cols = df.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq.map(col)
      df.select(
          bucketOf(col(Normalize.KeyCol), nBuckets).as("bucket"),
          xxhash64(cols: _*).cast("decimal(38,0)").as("__h1"),
          xxhash64(lit(1L) +: cols: _*).cast("decimal(38,0)").as("__h2"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as(s"${p}_rows"),
          (sum(col("__h1")) % lit(1000000000000000000L)).cast("long").as(s"${p}_s1"),
          (sum(col("__h2")) % lit(1000000000000000000L)).cast("long").as(s"${p}_s2"))
    }
    side(bn, "b").join(side(an, "a"), Seq("bucket"), "full_outer")
      .filter(coalesce(col("b_rows"), lit(0L)) =!= coalesce(col("a_rows"), lit(0L)) ||
        coalesce(col("b_s1"), lit(0L)) =!= coalesce(col("a_s1"), lit(0L)) ||
        coalesce(col("b_s2"), lit(0L)) =!= coalesce(col("a_s2"), lit(0L)))
      .select(col("bucket"))
  }

  /** Shared prune scaffolding: normalize both sides and semi-join each
    * against the broadcast dirty-bucket list. The dirty frame is persisted
    * so the summary aggregation runs once, not once per side — the
    * harness (Verify/Bench) clears caches between queries; a standing
    * loop should use [[diffOneWinnerPrunedEager]], which caches nothing. */
  private def merklePruned(before: DataFrame, after: DataFrame, pk: Seq[String],
      nBuckets: Int): (DataFrame, DataFrame) = {
    val bn = Normalize.withKey(before, pk)
    val an = Normalize.withKey(after, pk)
    val dirty = merkleDirty128(bn, an, nBuckets)
      .select(col("bucket").as("__bkt")).transform(CacheScope.cached)
    def prune(df: DataFrame): DataFrame =
      df.withColumn("__bkt", bucketOf(col(Normalize.KeyCol), nBuckets))
        .join(broadcast(dirty), Seq("__bkt"), "left_semi")
        .drop("__bkt")
    (prune(bn), prune(an))
  }

  /** [[diff]] restricted to the dirty buckets of [[merkleSummary]] — the
    * pruned repeat-diff. Lossless by construction: every changed key lands
    * in a bucket whose count or checksum disagrees, so the pruned result
    * EQUALS the full diff (the oracle pins exactly that). The dirty-bucket
    * list is tiny (≤ nBuckets rows), so it broadcasts and each side prunes
    * with a broadcast semi-join before any shuffle of row data. */
  def merklePrunedDiff(before: DataFrame, after: DataFrame, pk: Seq[String],
      nBuckets: Int): DataFrame = {
    val (bp, ap) = merklePruned(before, after, pk, nBuckets)
    diffNormalized(bp, ap)
  }

  /** Per-key single-row reduction of a one-winner diff: status plus the
    * BEFORE/AFTER rows as nullable structs (null side ⇔ absent). */
  private def keyedDiff(d: DataFrame, cols: Seq[String]): DataFrame = {
    val rowStruct = struct(cols.map(col): _*)
    d.groupBy(col(Normalize.KeyCol))
      .agg(min(col("diff_status")).as("status"), // identical across a key's rows
        max(when(col("side") === "BEFORE", rowStruct)).as("brow"),
        max(when(col("side") === "AFTER", rowStruct)).as("arow"))
  }

  /** CDC-changefeed COMPACTION — compose two consecutive one-winner diffs
    * into the net diff: `composeDiffs(diff(A,B), diff(B,C)) = diff(A,C)`,
    * which the oracle pins by recomputing diff(A,C) directly. The algebra
    * per key: net-before is d1's BEFORE (or d2's when A→B left the key
    * untouched), net-after is d2's AFTER (or d1's when B→C did); a key
    * inserted then deleted nets to NOTHING, updated back to its original
    * nets to NOT_MODIFIED and is dropped, everything else reclassifies
    * from the null pattern. This is how a changelog retention window
    * collapses N days of feeds into one without ever touching the base
    * snapshots: the compose is one key-hashed join of FEED rows — at
    * 100 TB the net of a week of diffs costs the diffs' own size, not a
    * rescan of the lake. */
  def composeDiffs(d1: DataFrame, d2: DataFrame): DataFrame = {
    val meta = Set(Normalize.KeyCol, "diff_status", "modified_columns", "side")
    val cols = d1.columns.filterNot(meta).toIndexedSeq
    val k1 = keyedDiff(d1, cols).select(col(Normalize.KeyCol),
      col("status").as("s1"), col("brow").as("b1"), col("arow").as("a1"))
    val k2 = keyedDiff(d2, cols).select(col(Normalize.KeyCol),
      col("status").as("s2"), col("brow").as("b2"), col("arow").as("a2"))
    val j = k1.join(k2, Seq(Normalize.KeyCol), "full_outer")
      .withColumn("__nb", when(col("s1").isNotNull, col("b1")).otherwise(col("b2")))
      .withColumn("__na", when(col("s2").isNotNull, col("a2")).otherwise(col("a1")))
    val status = when(col("__nb").isNull && col("__na").isNull, lit(null).cast("string"))
      .when(col("__nb").isNull, Inserted)
      .when(col("__na").isNull, Deleted)
      .when(col("__nb") === col("__na"), lit(null).cast("string")) // net no-op
      .otherwise(Updated)
    val modList = concat_ws(",",
      cols.map(c => when(col("__nb")(c) =!= col("__na")(c), lit(c))): _*)
    def sideRow(side: String, src: String): Column =
      struct(lit(side).as("side") +: cols.map(c => col(src)(c).as(c)): _*)
    val rows = when(col("diff_status") === Inserted, array(sideRow("AFTER", "__na")))
      .when(col("diff_status") === Deleted, array(sideRow("BEFORE", "__nb")))
      .otherwise(array(sideRow("BEFORE", "__nb"), sideRow("AFTER", "__na")))
    j.withColumn("diff_status", status)
      .filter(col("diff_status").isNotNull)
      .withColumn("modified_columns",
        when(col("diff_status") === Updated, modList).otherwise(lit("")))
      .select(col(Normalize.KeyCol), col("diff_status"), col("modified_columns"),
        explode(rows).as("__r"))
      .select(Seq(col(Normalize.KeyCol), col("diff_status"), col("modified_columns"),
        col("__r.side").as("side")) ++ cols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** [[diffOneWinner]] behind the Merkle prune — the application loop's
    * fast path for repeat diffs. Sound composition: every row's key
    * columns are part of its content, so bucket-checksum equality means
    * the bucket's full row multiset (and hence EVERY key's sub-multiset)
    * is unchanged — those keys cannot produce one-winner diff rows. The
    * dedup runs after the prune, so clean buckets skip the per-key
    * aggregation too, not just the join. */
  def diffOneWinnerPruned(before: DataFrame, after: DataFrame, pk: Seq[String],
      nBuckets: Int): DataFrame = {
    val (bp, ap) = merklePruned(before, after, pk, nBuckets)
    diffNormalized(oneRowPerKey(bp), oneRowPerKey(ap))
  }

  /** [[diffOneWinnerPruned]] for STANDING loops: the dirty-bucket list is
    * materialized to the driver eagerly (≤ nBuckets longs — the same size
    * class as a broadcast-join build side) and pruned with a codegen'd
    * `InSet` filter, so nothing is ever persisted — a loop that never
    * clears caches cannot leak them. Eagerness is deliberate here: the
    * caller is an application ITERATION (already full of actions), not a
    * lazily-registered query. */
  def diffOneWinnerPrunedEager(before: DataFrame, after: DataFrame, pk: Seq[String],
      nBuckets: Int): DataFrame = {
    val bn = Normalize.withKey(before, pk)
    val an = Normalize.withKey(after, pk)
    val dirty: Seq[Long] = merkleDirty128(bn, an, nBuckets)
      .collect().map(_.getLong(0)).toIndexedSeq
    def prune(df: DataFrame): DataFrame =
      df.filter(bucketOf(col(Normalize.KeyCol), nBuckets).isInCollection(dirty))
    diffNormalized(oneRowPerKey(prune(bn)), oneRowPerKey(prune(an)))
  }

  /** Report aggregate: per-status logical change counts for one table's
    * diff (UPDATED emits two physical rows per key — count keys once). */
  def report(diffed: DataFrame): DataFrame =
    diffed.groupBy(col("diff_status"))
      .agg(countDistinct(col(Normalize.KeyCol)).as("n_keys"))

  /** Fast report path: per-status distinct-key counts straight off the
    * classification join — skips building, exploding and re-aggregating the
    * stringified per-row output entirely. Distinct, not plain count: keys
    * need not be unique per snapshot (fixture lineitem has duplicate PKs,
    * and the separator-less key concat can collide — SURVEY §7.4.1/3). */
  def statusCounts(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame =
    classified(before, after, pk)
      .filter(col("diff_status") =!= NotModified)
      .groupBy(col("diff_status"))
      .agg(countDistinct(col(Normalize.KeyCol)).as("n_keys"))

  /** Whole-lake report: per-table per-status key counts for MANY tables in
    * ONE aggregation — no join at all.
    *
    * Each side of each table is reduced to `(table, __key, fp, side)` where
    * `fp` is an md5 fingerprint of the full normalized row, then everything
    * unions into a single frame. Per (table, key) the status is a function
    * of three partial aggregates:
    *   - `min(side) = 1`  → key only in after  → INSERTED
    *   - `max(side) = 0`  → key only in before → DELETED
    *   - else `min(fp) ≠ max(fp)` → UPDATED, else NOT_MODIFIED.
    * The fp test is exactly the join semantics under duplicate keys: with
    * both sides present, some before×after pairing differs iff the key's
    * fp multiset holds more than one distinct value (two distinct fps on
    * the same side also force a differing cross pairing).
    *
    * Scale shape vs. N sequential per-table full-outer joins: ONE shuffle
    * of fixed-width ~50-byte rows (not full rows) with map-side combine,
    * plus a second keys-per-status shuffle of N×3 rows. At 100 TB this is
    * the difference between re-shuffling the lake N times and once. */
  def fusedReport(sides: Seq[(String, DataFrame, DataFrame, Seq[String])]): DataFrame = {
    def fpSide(name: String, df: DataFrame, pk: Seq[String], side: Int): DataFrame = {
      val n = Normalize.withKey(df, pk)
      val cols = n.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq.map(col)
      // Row fingerprint = TWO independent codegen'd xxhash64 lanes (128
      // bits total — collision odds stay negligible at any key count, like
      // the md5 this replaces, but with no MessageDigest on the hot path
      // and a fixed 16-byte struct instead of a 32-char hex string in the
      // shuffle). Multi-column hashing folds each value in with its
      // length, so adjacent columns can't alias ("ab","c" vs "a","bc") --
      // no separator string is ever built. The oracle never sees this
      // fingerprint: it recomputes the report from full column compares,
      // so the hash choice is pinned by the report's result.
      // the two lanes stay FLAT longs (r14): min/max over a struct has no
      // fixed-size aggregation buffer, so the (table, key) rollup planned
      // as a SortAggregate — sorting the whole ~50-byte union on the group
      // key. Flat long lanes keep it a two-phase HashAggregate with
      // map-side combine ("2 SortAggregate → 0", plans/r14/diff_report_*).
      n.select(lit(name).as("table_name"), col(Normalize.KeyCol),
        xxhash64(cols: _*).as("__h1"),
        xxhash64(lit(1L) +: cols: _*).as("__h2"),
        lit(side).as("__side"))
    }
    val unioned = sides.map { case (name, before, after, pk) =>
      fpSide(name, before, pk, 0).unionByName(fpSide(name, after, pk, 1))
    }.reduce(_.unionByName(_))

    // "some fp differs" ⟺ some LANE's min ≠ max: two distinct (h1, h2)
    // pairs differ in at least one lane, and a constant pair set is
    // constant in both — exactly the old struct min ≠ max test, in flat
    // hash-aggregable longs
    val status = when(col("__min_side") === 1, Inserted)
      .when(col("__max_side") === 0, Deleted)
      .when(col("__min_h1") =!= col("__max_h1") ||
        col("__min_h2") =!= col("__max_h2"), Updated)
      .otherwise(NotModified)

    unioned.groupBy(col("table_name"), col(Normalize.KeyCol))
      .agg(min(col("__side")).as("__min_side"), max(col("__side")).as("__max_side"),
        min(col("__h1")).as("__min_h1"), max(col("__h1")).as("__max_h1"),
        min(col("__h2")).as("__min_h2"), max(col("__h2")).as("__max_h2"))
      .select(col("table_name"), status.as("diff_status"))
      .filter(col("diff_status") =!= NotModified)
      .groupBy(col("table_name"), col("diff_status"))
      .agg(count(lit(1)).as("n_keys"))
  }
}
