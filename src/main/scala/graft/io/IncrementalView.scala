package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate over a [[SnapshotTable]] — the
  * Delta/Iceberg-style "change feed + MERGE" view-maintenance loop, for
  * ADDITIVE aggregates (count + sums). Additive is exactly the class the
  * file-granular [[SnapshotTable.changesBetween]] feed supports
  * losslessly: a copy-on-write rewrite re-emits its unchanged rows as
  * (delete, insert) pairs whose contributions cancel in the delta.
  *
  * Why this exists at 100 TB: a refresh reads ONLY the files the commits
  * since the last refresh touched, so a running per-source token ledger
  * over a petabyte corpus costs per refresh what the day's ingest cost —
  * never a corpus rescan. The view is itself a SnapshotTable (versioned,
  * time-travelable, mergeable), and its manifest meta records the exact
  * source version it reflects, which makes refresh idempotent and
  * crash-safe: re-refreshing an already-reflected version is a no-op, and
  * a crash between the source commit and the view merge just leaves the
  * next refresh a slightly larger delta.
  *
  * Keys are carried both as columns and as one synthesized `mv_key`
  * (unit-separator concat) because MERGE upserts by a single key column;
  * a key whose net row count reaches zero is tombstoned out of the view.
  */
object IncrementalView {

  val sourceVersionKey = "mv_source_version"
  val dimFingerprintKey = "mv_dim_fingerprint"
  val countCol = "mv_count"
  private val keyCol = "mv_key"
  private val dropCol = "mv_drop"

  /** Order-independent content fingerprint of the dim frames an `enrich`
    * joins against: per dim, (row count, sum of per-row xxhash64 over every
    * column cast to string, schema). The static-dims contract (see
    * [[create]]) is otherwise unenforceable — a dim edited between create
    * and refresh silently yields stale-enriched deltas — so [[create]]
    * stamps this into the view manifest and [[refresh]] fails loudly on
    * drift. Xor-of-hashes is insensitive to row order and partitioning
    * and cannot overflow — a SUM of 64-bit hashes throws under ANSI
    * arithmetic once ~a few rows of random longs accumulate (found by the
    * r13 gate: nation's 25 rows overflowed q_mv_join's stamp); xor's one
    * blind spot, even multiplicities cancelling, is covered by the row
    * count beside it (dims are broadcast-scale, so the extra scan is
    * metadata-cost).
    */
  private def dimFingerprint(dims: Seq[DataFrame]): String =
    dims.map { d =>
      val schemaTag = d.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")
      val r = d
        .select(xxhash64(d.columns.map(c => col(c).cast("string")).toIndexedSeq: _*).as("rh"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("h"))
        .head()
      val h = if (r.isNullAt(1)) 0L else r.getLong(1)
      s"${r.getLong(0)}:${java.lang.Long.toHexString(h)}:" +
        java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(schemaTag))
    }.mkString(",")

  // Shared sentinel so refresh can tell "no enrich" apart by reference:
  // a non-identity enrich may overwrite a same-named source column, and
  // then the zone-map point-read prune would filter on PRE-enrich key
  // values — the prune is only sound when the key values seen by the
  // aggregate are the values in the source files.
  private val noEnrich: DataFrame => DataFrame = identity

  def minName(c: String): String = s"mv_min_$c"
  def maxName(c: String): String = s"mv_max_$c"

  // unit-separator join, NUL marker for SQL null: distinct key tuples
  // cannot collide unless a key VALUE itself contains the separators
  private def mvKey(keys: Seq[String]) =
    concat_ws("\u001F",
      keys.map(k => coalesce(col(k).cast("string"), lit("\u0000"))): _*)

  /** Full-compute the view at the source's latest version; returns that
    * version.
    *
    * `enrich` turns this into an incremental JOIN view: it runs over the
    * source read (and, in [[refresh]], over the change feed) BEFORE the
    * filter/groupBy, so view keys and sum columns may be derived through
    * joins — the classic fact⋈dims star aggregate, maintained from the
    * fact table's feed alone. Contract: enrich must be deterministic,
    * row-preserving (an equi-join on a unique dim key; a dropped or
    * fanned-out fact row would make delta and full states disagree), must
    * not touch `_change_type`, and the joined dims must be STATIC between
    * create and refresh — a dim change is a view rebuild, exactly as in
    * warehouse practice (dims are broadcast-scale and slowly changing;
    * the fact feed is what's petabyte-scale and hot).
    *
    * Pass the dim frames enrich joins against in `dims` to make that
    * contract ENFORCED rather than assumed: create stamps their
    * [[dimFingerprint]] into the view manifest, and [[refresh]] (given the
    * same `dims`) recomputes and fails loudly on mismatch — a drifted dim
    * means the view must be rebuilt, never silently stale-enriched.
    */
  def create(spark: SparkSession, sourceDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      rowFilter: Column = lit(true),
      enrich: DataFrame => DataFrame = noEnrich,
      dims: Seq[DataFrame] = Nil): Int = {
    val v = SnapshotTable.latestVersion(sourceDir)
    val agg = enrich(SnapshotTable.read(spark, sourceDir, Some(v)))
      .filter(rowFilter)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)) ++
          minCols.map(c => min(col(c)).as(minName(c))) ++
          maxCols.map(c => max(col(c)).as(maxName(c))): _*)
      .withColumn(keyCol, mvKey(keys))
    val dimMeta =
      if (dims.isEmpty) Map.empty[String, String]
      else Map(dimFingerprintKey -> dimFingerprint(dims))
    SnapshotTable.create(agg, viewDir,
      meta = Map(sourceVersionKey -> v.toString) ++ dimMeta)
    v
  }

  /** Refresh the view to the source's latest version from the change feed
    * alone; returns the source version the view now reflects (equal input
    * and output version = the refresh was a no-op).
    *
    * min/max are NOT additive, so they ride the classic view-maintenance
    * split: inserts tighten an extremum for free (`least`/`greatest` with
    * the delta's insert-side extremum), and only keys where a DELETED value
    * ties the stored extremum — the one case where the true new extremum is
    * unknowable from the delta — fall back to an exact per-key recompute
    * (semi-join of the source at `latest` against just those keys; with the
    * source clustered on the view key the [[SnapshotTable]] zone maps prune
    * that scan to the keys' own files). An update that rewrites the
    * group-minimum row re-emits it as delete+insert in the feed, so it
    * lands in the recompute set exactly when it must.
    */
  def refresh(spark: SparkSession, sourceDir: String, viewDir: String,
      keys: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      rowFilter: Column = lit(true),
      enrich: DataFrame => DataFrame = noEnrich,
      dims: Seq[DataFrame] = Nil): Int = {
    val viewMeta = SnapshotTable.snapshot(spark, viewDir, None).meta
    val have = viewMeta
      .getOrElse(sourceVersionKey,
        throw new IllegalStateException(
          s"$viewDir carries no $sourceVersionKey — not an IncrementalView table"))
      .toInt
    if (dims.nonEmpty) {
      val stamped = viewMeta.getOrElse(dimFingerprintKey,
        throw new IllegalStateException(
          s"$viewDir carries no $dimFingerprintKey — the view was created " +
            "without dim stamps; recreate it passing the same dims"))
      val now = dimFingerprint(dims)
      if (now != stamped)
        throw new IllegalStateException(
          s"dim drift detected for $viewDir (stamped $stamped, current $now): " +
            "enrich dims changed since create — the delta would be " +
            "stale-enriched. Rebuild the view (create) against the new dims.")
    }
    val latest = SnapshotTable.latestVersion(sourceDir)
    if (latest <= have) return have
    val isIns = col("_change_type") === "insert"
    val sign = when(isIns, lit(1L)).otherwise(lit(-1L))
    // rowFilter commutes with the feed: a row outside the view's predicate
    // contributes on neither side, whether inserted, deleted, or re-emitted
    // by a rewrite — the standard partial-view maintenance identity
    // localCheckpoint: the refresh DAG consumes this aggregate up to four
    // times (fast path, recompute-key set, point-read key values, the
    // final upserts) — without materialization each consumer re-reads the
    // whole change feed. The aggregate is one row per touched key, i.e.
    // delta-sized by design; the blocks free with the frame.
    val delta = enrich(SnapshotTable.changesBetween(spark, sourceDir, have, latest))
      .filter(rowFilter)
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as(countCol),
        sumCols.map(c => sum(sign * col(c)).as(c)) ++
          minCols.flatMap(c => Seq(
            min(when(isIns, col(c))).as(s"__ins_min_$c"),
            min(when(!isIns, col(c))).as(s"__del_min_$c"))) ++
          maxCols.flatMap(c => Seq(
            max(when(isIns, col(c))).as(s"__ins_max_$c"),
            max(when(!isIns, col(c))).as(s"__del_max_$c"))): _*)
      .localCheckpoint()
    val addCols = countCol +: sumCols
    val extCols = minCols.map(minName) ++ maxCols.map(maxName)
    // join delta to the stored view on the synthesized mv_key, NOT the raw
    // key columns: a plain equi-join never matches NULL group keys, which
    // would make an existing null-keyed group look brand-new and let the
    // MERGE replace its stored aggregates with delta-only values. mv_key
    // maps null to a marker, so it IS the null-safe join key.
    val old = (addCols ++ extCols)
      .foldLeft(SnapshotTable.read(spark, viewDir, None))(
        (df, c) => df.withColumnRenamed(c, s"__old_$c"))
      .drop(keys: _*)
    val joined = delta.withColumn(keyCol, mvKey(keys))
      .join(old, Seq(keyCol), "left")
      .drop(keyCol)
    val newCount = coalesce(col(s"__old_$countCol"), lit(0L)) + col(countCol)
    // the stored extremum is the true one, so a deleted value can only TIE
    // it — equality is the recompute trigger (<=/>= keeps it robust should
    // the feed ever over-deliver)
    val tiesExtremum = (minCols.map(c =>
      col(s"__del_min_$c") <= col(s"__old_${minName(c)}")) ++
      maxCols.map(c => col(s"__del_max_$c") >= col(s"__old_${maxName(c)}")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val needsRecompute = newCount > 0 && coalesce(tiesExtremum, lit(false))
    val fast = joined.filter(!needsRecompute)
      .select(
        keys.map(col) ++
          // count: every delta row contributes ±1, so the delta count is
          // never null. sums: SQL SUM ignores NULLs, so an all-NULL delta
          // (delta sum NULL) leaves the stored sum unchanged — and only a
          // brand-new key whose delta is also all-NULL stays NULL.
          // Residual edge (deliberate): a group holding both null and
          // non-null values whose EVERY non-null row is deleted ends with
          // stored sum 0 (old + delta = s − s), where a full recompute over
          // the remaining all-null rows yields NULL. The delta cannot
          // distinguish "all non-null values gone" from "some remain"
          // without a per-sum-column non-null count in the stored view;
          // 0-vs-NULL for an empty value set is the one divergence the
          // fast path accepts. Consumers needing recompute-exact NULL
          // semantics here should coalesce on read or rebuild the view.
          Seq((coalesce(col(s"__old_$countCol"), lit(0L)) + col(countCol))
            .as(countCol)) ++
          sumCols.map(c =>
            when(col(s"__old_$c").isNull && col(c).isNull, lit(null))
              .otherwise(coalesce(col(s"__old_$c"), lit(0L)) +
                coalesce(col(c), lit(0L)))
              .as(c)) ++
          // least/greatest skip nulls: a brand-new key (old null) takes the
          // insert-side extremum, a refresh with no inserts keeps the old
          minCols.map(c =>
            least(col(s"__old_${minName(c)}"), col(s"__ins_min_$c"))
              .as(minName(c))) ++
          maxCols.map(c =>
            greatest(col(s"__old_${maxName(c)}"), col(s"__ins_max_$c"))
              .as(maxName(c))): _*)
    val changes =
      if (minCols.isEmpty && maxCols.isEmpty) fast
      else {
        val rkeys = joined.filter(needsRecompute).select(keys.map(col): _*)
        // null-safe semi-join: a null-valued group key is a real group in
        // the view and must still reach the recompute scan. enrich runs
        // before the semi-join because the view keys may only exist
        // post-enrich (the readPoints prune inside recomputeSource already
        // guards on the key being a SOURCE stats column, so a derived key
        // simply takes the full-read path). prunable = no enrich at all:
        // an enrich may legally OVERWRITE a same-named source column, and
        // the name guard alone can't see that — so any enrich disables the
        // point-read prune (join views recompute from a full read).
        val rec = enrich(recomputeSource(spark, sourceDir, latest, keys, rkeys,
            prunable = enrich eq noEnrich))
          .filter(rowFilter).as("src")
          .join(rkeys.as("rk"),
            keys.map(k => col(s"src.$k") <=> col(s"rk.$k")).reduce(_ && _),
            "left_semi")
          .groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as(countCol),
            sumCols.map(c => sum(col(c)).as(c)) ++
              minCols.map(c => min(col(c)).as(minName(c))) ++
              maxCols.map(c => max(col(c)).as(maxName(c))): _*)
        fast.unionByName(rec)
      }
    val upserts = changes
      .withColumn(keyCol, mvKey(keys))
      .withColumn(dropCol, col(countCol) === 0)
    SnapshotTable.merge(spark, viewDir, upserts, keyCol,
      deleteCol = Some(dropCol),
      meta = Map(sourceVersionKey -> latest.toString))
    latest
  }

  /** Source frame for the extremum tie-recompute: when EVERY view key
    * carries zone maps (numeric — or string, via the manifest's raw-string
    * `strStats`), the tied keys' rows are fetched through
    * [[SnapshotTable.readTuples]] — with the source clustered on the view
    * key that scan opens only the keys' own files, which is what keeps a
    * handful of ties from costing a corpus rescan at 100 TB. Composite
    * keys prune per column (a file survives only if some tied TUPLE fits
    * its ranges on every column). Falls back to a full read when any key
    * isn't zone-mapped, the tie set is large (> 4096 tuples — at that
    * point the scan is wide anyway and a driver-side key list stops being
    * "metadata-sized"), or any tied key value is NULL (zone maps say
    * nothing about nulls). The null-safe semi-join stays on top either
    * way, so pruning is an optimization, never a semantics change.
    */
  private def recomputeSource(spark: SparkSession, sourceDir: String,
      version: Int, keys: Seq[String], rkeys: DataFrame,
      prunable: Boolean): DataFrame = {
    val full = () => SnapshotTable.read(spark, sourceDir, Some(version))
    if (!prunable) return full()
    val snap = SnapshotTable.snapshot(spark, sourceDir, Some(version))
    if (!keys.forall(snap.statsCols.contains)) return full()
    val cap = 4096
    val rows = rkeys.select(keys.map(col): _*).distinct()
      .limit(cap + 1).collect()
    if (rows.length > cap || rows.exists(r => keys.indices.exists(r.isNullAt)))
      full()
    else SnapshotTable.readTuples(spark, sourceDir, keys,
      rows.map(r => keys.indices.map(r.get)).toSeq, Some(version))
  }

  /** Exact incremental COUNT(DISTINCT valueCol) per key, as a composition
    * of two ADDITIVE views — no new maintenance logic:
    *
    *   level 1 (`viewDir/values`): multiplicity of every live
    *     (keys, value) tuple, maintained from the SOURCE's change feed;
    *     a tuple whose multiplicity reaches zero is tombstoned out.
    *   level 2 (`viewDir/counts`): row count of level 1 per key,
    *     maintained from LEVEL 1's OWN change feed — a distinct value
    *     appearing is an insert there, the last copy vanishing is a
    *     delete, and a multiplicity-only change is a rewrite whose
    *     (delete, insert) pair cancels. `mv_count` in level 2 IS the
    *     distinct count.
    *
    * Null values are excluded at level 1 (SQL COUNT(DISTINCT) semantics)
    * via the partial-view `rowFilter`. At 100 TB the level-1 table is one
    * row per distinct (key, value) — the honest floor for EXACT distinct;
    * when an estimate suffices, an HLL-sketch column maintained
    * insert-only is the swap, but it cannot absorb deletes, which is
    * exactly what this composition buys.
    */
  def createDistinct(spark: SparkSession, sourceDir: String, viewDir: String,
      keys: Seq[String], valueCol: String): Int = {
    val v = create(spark, sourceDir, s"$viewDir/values", keys :+ valueCol,
      Nil, rowFilter = col(valueCol).isNotNull)
    create(spark, s"$viewDir/values", s"$viewDir/counts", keys, Nil)
    v
  }

  /** Refresh both levels of a [[createDistinct]] view; returns the source
    * version the composition now reflects.
    */
  def refreshDistinct(spark: SparkSession, sourceDir: String, viewDir: String,
      keys: Seq[String], valueCol: String): Int = {
    val v = refresh(spark, sourceDir, s"$viewDir/values", keys :+ valueCol,
      Nil, rowFilter = col(valueCol).isNotNull)
    refresh(spark, s"$viewDir/values", s"$viewDir/counts", keys, Nil)
    v
  }

  /** The level-2 table of a [[createDistinct]] composition: one row per
    * key, `mv_count` = exact COUNT(DISTINCT valueCol).
    */
  def readDistinct(spark: SparkSession, viewDir: String): DataFrame =
    SnapshotTable.read(spark, s"$viewDir/counts")
}
