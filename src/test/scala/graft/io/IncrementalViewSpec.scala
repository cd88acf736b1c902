package graft.io

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The change feed + incremental-aggregate loop: every refresh must land
  * the view exactly on the full recompute, reading only the delta files.
  */
class IncrementalViewSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def rows(xs: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    xs.toDF("doc_id", "source", "n_chars")
  }

  private def recompute(src: String): Set[(String, Long, Long)] =
    SnapshotTable.read(spark, src)
      .groupBy("source")
      .agg(count(lit(1)).as("c"), sum("n_chars").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def viewRows(view: String): Set[(String, Long, Long)] =
    SnapshotTable.read(spark, view)
      .select("source", IncrementalView.countCol, "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("changes between versions cancel to the table diff under addition") {
    val src = tmp("graft-cdf")
    SnapshotTable.create(rows((1, "a", 10), (2, "a", 20), (3, "b", 5)), src)
    SnapshotTable.merge(spark, src,
      rows((2, "a", 25), (4, "b", 7)), "doc_id") // update + insert
    val ch = SnapshotTable.changesBetween(spark, src, 1, 2)
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val net = ch.agg(sum(sign * col("n_chars")), sum(sign)).head()
    // net additive effect = (25-20) + 7 chars, (+1 insert) rows — the
    // rewritten file's unchanged rows appear on both sides and cancel
    assert(net.getLong(0) === 12L)
    assert(net.getLong(1) === 1L)
    // non-adjacent range equals the cumulative diff
    SnapshotTable.merge(spark, src, rows((5, "c", 100)), "doc_id")
    val ch13 = SnapshotTable.changesBetween(spark, src, 1, 3)
    val net13 = ch13.agg(sum(sign * col("n_chars"))).head().getLong(0)
    assert(net13 === 12L + 100L)
    // empty range: no changes
    assert(SnapshotTable.changesBetween(spark, src, 3, 3).count() === 0)
  }

  test("incremental refresh equals full recompute across updates and deletes") {
    val src = tmp("graft-mv-src")
    val view = tmp("graft-mv-view")
    SnapshotTable.create(
      rows((1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "b", 7), (5, "c", 1)), src)
    IncrementalView.create(spark, src, view, Seq("source"), Seq("n_chars"))
    assert(viewRows(view) === recompute(src))

    // commit 2: updates shift values, inserts add a new key
    SnapshotTable.merge(spark, src,
      rows((2, "a", 200), (6, "d", 50), (7, "a", 3)), "doc_id")
    // commit 3 BEFORE refreshing: refresh must absorb both commits at once
    SnapshotTable.merge(spark, src, rows((8, "c", 9)), "doc_id")
    val v = IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    assert(v === 3)
    assert(viewRows(view) === recompute(src))

    // commit 4: tombstone every doc of source c — its ledger row must drop
    import spark.implicits._
    val del = Seq((5L, "c", 1L, true), (8L, "c", 9L, true))
      .toDF("doc_id", "source", "n_chars", "gone")
    SnapshotTable.merge(spark, src, del, "doc_id", deleteCol = Some("gone"))
    IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    assert(viewRows(view) === recompute(src))
    assert(!viewRows(view).exists(_._1 == "c"), "net-zero key must leave the view")

    // idempotence: nothing new to reflect — same version back, no commit
    val vPre = SnapshotTable.latestVersion(view)
    val again = IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    assert(again === 4)
    assert(SnapshotTable.latestVersion(view) === vPre, "no-op refresh must not commit")
  }

  test("random commit sequences: refresh-at-random-points equals recompute") {
    // deterministic pseudo-random op stream (no RNG state, replayable):
    // each commit upserts ~8 docs (key space 40 so updates, inserts, and
    // re-inserts all occur) and tombstones ~3; the view refreshes only at
    // irregular points so every refresh absorbs a multi-commit gap
    val src = tmp("graft-mv-prop")
    val view = tmp("graft-mv-prop-view")
    def h(a: Long, b: Long): Long = math.abs(a * 6364136223846793005L + b * 9007199254740993L)
    SnapshotTable.create(
      rows((0L until 15L).map(i => (i, s"s${h(1, i) % 5}", h(2, i) % 1000)): _*), src)
    IncrementalView.create(spark, src, view, Seq("source"), Seq("n_chars"))
    for (commit <- 1 to 12) {
      val ups = (0 until 8).map { j =>
        val k = h(commit, j) % 40
        (k, s"s${h(commit * 31 + 7, j) % 5}", h(commit * 17 + 3, j) % 1000)
      }.distinctBy(_._1)
      SnapshotTable.merge(spark, src, rows(ups: _*), "doc_id")
      val dels = (0 until 3).map(j => h(commit * 13 + 11, j) % 40).distinct
      import spark.implicits._
      SnapshotTable.merge(spark, src,
        SnapshotTable.read(spark, src)
          .filter(col("doc_id").isin(dels: _*))
          .withColumn("gone", lit(true)),
        "doc_id", deleteCol = Some("gone"))
      if (commit % 3 == 0 || commit == 12) {
        IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
        assert(viewRows(view) === recompute(src), s"diverged at commit $commit")
      }
    }
  }

  test("join view: enriched refresh equals fact-join-dims recompute") {
    // star shape: the view's key (name) and measure (weighted) exist only
    // THROUGH the enrich join — a refresh that skipped enrichment on the
    // feed, the fast path, or the recompute path diverges immediately
    val src = tmp("graft-mvj-src")
    val view = tmp("graft-mvj-view")
    import spark.implicits._
    val dim = Seq((0L, "x", 2L), (1L, "y", 3L), (2L, "z", 5L))
      .toDF("fk", "name", "w")
    val enrich: DataFrame => DataFrame = df =>
      df.join(broadcast(dim), Seq("fk"))
        .withColumn("weighted", col("n_chars") * col("w"))
    def factRows(xs: (Long, Long, Long)*): DataFrame =
      xs.toDF("doc_id", "fk", "n_chars")
    def recomputeJoin(): Set[(String, Long, Long)] =
      enrich(SnapshotTable.read(spark, src))
        .groupBy("name")
        .agg(count(lit(1)).as("c"), sum("weighted").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def viewJoin(): Set[(String, Long, Long)] =
      SnapshotTable.read(spark, view)
        .select("name", IncrementalView.countCol, "weighted")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    def h(a: Long, b: Long): Long = math.abs(a * 6364136223846793005L + b * 9007199254740993L)
    SnapshotTable.create(
      factRows((0L until 12L).map(i => (i, h(1, i) % 3, h(2, i) % 500)): _*), src)
    IncrementalView.create(spark, src, view, Seq("name"), Seq("weighted"),
      enrich = enrich)
    assert(viewJoin() === recomputeJoin())
    for (commit <- 1 to 8) {
      val ups = (0 until 6).map { j =>
        val k = h(commit, j) % 30
        (k, h(commit * 31 + 7, j) % 3, h(commit * 17 + 3, j) % 500)
      }.distinctBy(_._1)
      SnapshotTable.merge(spark, src, factRows(ups: _*), "doc_id")
      val dels = (0 until 2).map(j => h(commit * 13 + 11, j) % 30).distinct
      SnapshotTable.merge(spark, src,
        SnapshotTable.read(spark, src)
          .filter(col("doc_id").isin(dels: _*))
          .withColumn("gone", lit(true)),
        "doc_id", deleteCol = Some("gone"))
      if (commit % 3 == 0 || commit == 8) {
        IncrementalView.refresh(spark, src, view, Seq("name"), Seq("weighted"),
          enrich = enrich)
        assert(viewJoin() === recomputeJoin(), s"diverged at commit $commit")
      }
    }
  }

  test("join view: dim drift between create and refresh fails loudly") {
    // the static-dims contract is ENFORCED when dims are stamped: a dim
    // row edited after create makes refresh throw instead of silently
    // producing a stale-enriched delta (r12 verdict #8)
    val src = tmp("graft-mvd-src")
    val view = tmp("graft-mvd-view")
    import spark.implicits._
    def dimOf(w: Long) = Seq((0L, "x", 2L), (1L, "y", w)).toDF("fk", "name", "w")
    def enrichOf(dim: DataFrame): DataFrame => DataFrame = df =>
      df.join(broadcast(dim), Seq("fk")).withColumn("weighted", col("n_chars") * col("w"))
    val dim0 = dimOf(3L)
    SnapshotTable.create(
      Seq((1L, 0L, 10L), (2L, 1L, 20L)).toDF("doc_id", "fk", "n_chars"), src)
    IncrementalView.create(spark, src, view, Seq("name"), Seq("weighted"),
      enrich = enrichOf(dim0), dims = Seq(dim0))
    SnapshotTable.merge(spark, src,
      Seq((3L, 1L, 30L)).toDF("doc_id", "fk", "n_chars"), "doc_id")
    // same dims → refresh succeeds (row order must not matter)
    IncrementalView.refresh(spark, src, view, Seq("name"), Seq("weighted"),
      enrich = enrichOf(dim0), dims = Seq(dim0.orderBy(col("fk").desc)))
    SnapshotTable.merge(spark, src,
      Seq((4L, 0L, 40L)).toDF("doc_id", "fk", "n_chars"), "doc_id")
    val drifted = dimOf(7L) // a dim VALUE changed → fingerprint mismatch
    val ex = intercept[IllegalStateException] {
      IncrementalView.refresh(spark, src, view, Seq("name"), Seq("weighted"),
        enrich = enrichOf(drifted), dims = Seq(drifted))
    }
    assert(ex.getMessage.contains("dim drift"), ex.getMessage)
    // an unstamped view asked to verify dims also fails loudly
    val view2 = tmp("graft-mvd-view2")
    IncrementalView.create(spark, src, view2, Seq("name"), Seq("weighted"),
      enrich = enrichOf(dim0))
    val ex2 = intercept[IllegalStateException] {
      IncrementalView.refresh(spark, src, view2, Seq("name"), Seq("weighted"),
        enrich = enrichOf(dim0), dims = Seq(dim0))
    }
    assert(ex2.getMessage.contains("without dim stamps"), ex2.getMessage)
  }

  test("join view: realistic-size dim stamps without ANSI overflow, still detects drift") {
    // regression (r13 gate): the dim fingerprint summed per-row xxhash64
    // values — under ANSI arithmetic a few dozen random longs overflow
    // (q_mv_join's 25-row nation dim threw ARITHMETIC_OVERFLOW at the
    // driver gate). The xor fold must stamp a nation-scale dim cleanly
    // and still catch a single-value drift.
    val src = tmp("graft-mvbig-src")
    val view = tmp("graft-mvbig-view")
    import spark.implicits._
    def dimOf(w: Long) =
      (0L until 50L).map(i => (i, s"name_$i", if (i == 49L) w else i + 2))
        .toDF("fk", "name", "w")
    def enrichOf(dim: DataFrame): DataFrame => DataFrame = df =>
      df.join(broadcast(dim), Seq("fk")).withColumn("weighted", col("n_chars") * col("w"))
    val dim0 = dimOf(100L)
    SnapshotTable.create(
      (1L to 200L).map(i => (i, i % 50, i * 10)).toDF("doc_id", "fk", "n_chars"), src)
    IncrementalView.create(spark, src, view, Seq("name"), Seq("weighted"),
      enrich = enrichOf(dim0), dims = Seq(dim0))
    SnapshotTable.merge(spark, src,
      Seq((201L, 3L, 30L)).toDF("doc_id", "fk", "n_chars"), "doc_id")
    IncrementalView.refresh(spark, src, view, Seq("name"), Seq("weighted"),
      enrich = enrichOf(dim0), dims = Seq(dim0))
    val got = SnapshotTable.read(spark, view)
      .filter(col("name") === "name_3").select("weighted").head().getLong(0)
    val want = SnapshotTable.read(spark, src).join(broadcast(dim0), Seq("fk"))
      .filter(col("name") === "name_3")
      .agg(sum(col("n_chars") * col("w"))).head().getLong(0)
    assert(got === want)
    SnapshotTable.merge(spark, src,
      Seq((202L, 5L, 50L)).toDF("doc_id", "fk", "n_chars"), "doc_id")
    val drifted = dimOf(101L)
    val ex = intercept[IllegalStateException] {
      IncrementalView.refresh(spark, src, view, Seq("name"), Seq("weighted"),
        enrich = enrichOf(drifted), dims = Seq(drifted))
    }
    assert(ex.getMessage.contains("dim drift"), ex.getMessage)
  }

  test("join view with extrema: derived-key recompute path stays enriched") {
    // min/max over an enrich-derived measure: a deleted extremum forces the
    // tie-recompute, whose source read must ALSO pass through enrich (the
    // derived key name is not a source stats column, so it takes the
    // full-read path — correctness, not pruning, is what this pins)
    val src = tmp("graft-mvjx-src")
    val view = tmp("graft-mvjx-view")
    import spark.implicits._
    val dim = Seq((0L, "x"), (1L, "y")).toDF("fk", "name")
    val enrich: DataFrame => DataFrame = df => df.join(broadcast(dim), Seq("fk"))
    def factRows(xs: (Long, Long, Long)*): DataFrame =
      xs.toDF("doc_id", "fk", "n_chars")
    SnapshotTable.create(
      factRows((1, 0, 100), (2, 0, 5), (3, 1, 50), (4, 1, 60)), src)
    IncrementalView.create(spark, src, view, Seq("name"), Nil,
      minCols = Seq("n_chars"), maxCols = Seq("n_chars"), enrich = enrich)
    // delete the group-max of x (doc 1, 100) → tie-triggered recompute
    SnapshotTable.merge(spark, src,
      factRows((1, 0, 100)).withColumn("gone", lit(true)),
      "doc_id", deleteCol = Some("gone"))
    IncrementalView.refresh(spark, src, view, Seq("name"), Nil,
      minCols = Seq("n_chars"), maxCols = Seq("n_chars"), enrich = enrich)
    val got = SnapshotTable.read(spark, view)
      .select("name", IncrementalView.minName("n_chars"),
        IncrementalView.maxName("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("x", 5L, 5L), ("y", 50L, 60L)))
  }

  test("extrema view: random commit sequences equal recompute (min/max)") {
    // same deterministic op stream as the additive property test, but the
    // view maintains min/max — every refresh exercises the non-additive
    // split: insert-side tightening, and the tie-triggered per-key
    // recompute when a deleted (or update-rewritten) row held a group
    // extremum. Values cycle over a small range so ties and extremum
    // removals both occur.
    def recomputeExt(src: String): Set[(String, Long, Long)] =
      SnapshotTable.read(spark, src)
        .groupBy("source")
        .agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def viewExt(view: String): Set[(String, Long, Long)] =
      SnapshotTable.read(spark, view)
        .select(col("source"), col(IncrementalView.minName("n_chars")),
          col(IncrementalView.maxName("n_chars")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val src = tmp("graft-mv-ext")
    val view = tmp("graft-mv-ext-view")
    def h(a: Long, b: Long): Long = math.abs(a * 6364136223846793005L + b * 9007199254740993L)
    SnapshotTable.create(
      rows((0L until 15L).map(i => (i, s"s${h(1, i) % 5}", h(2, i) % 50)): _*), src)
    IncrementalView.create(spark, src, view, Seq("source"), Nil,
      minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
    for (commit <- 1 to 12) {
      val ups = (0 until 8).map { j =>
        val k = h(commit, j) % 40
        (k, s"s${h(commit * 31 + 7, j) % 5}", h(commit * 17 + 3, j) % 50)
      }.distinctBy(_._1)
      SnapshotTable.merge(spark, src, rows(ups: _*), "doc_id")
      val dels = (0 until 3).map(j => h(commit * 13 + 11, j) % 40).distinct
      SnapshotTable.merge(spark, src,
        SnapshotTable.read(spark, src)
          .filter(col("doc_id").isin(dels: _*))
          .withColumn("gone", lit(true)),
        "doc_id", deleteCol = Some("gone"))
      if (commit % 3 == 0 || commit == 12) {
        IncrementalView.refresh(spark, src, view, Seq("source"), Nil,
          minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
        assert(viewExt(view) === recomputeExt(src), s"diverged at commit $commit")
      }
    }
  }

  test("distinct view: random commit sequences equal count-distinct recompute") {
    // the two-level composition under the same op stream: values cycle a
    // small range so multiplicities rise above 1 and fall back to 0 (the
    // tombstone edge), and some rows carry NULL values (must not count)
    def recomputeDc(src: String): Set[(String, Long)] =
      SnapshotTable.read(spark, src)
        .groupBy("source").agg(countDistinct("n_chars").as("dc"))
        // a group whose values are ALL null has dc=0 and no row in the
        // composition (level 1 filters it empty) — same information
        .filter(col("dc") > 0)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def viewDc(view: String): Set[(String, Long)] =
      IncrementalView.readDistinct(spark, view)
        .select(col("source"), col(IncrementalView.countCol))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val src = tmp("graft-mv-dc")
    val view = tmp("graft-mv-dc-view")
    def h(a: Long, b: Long): Long = math.abs(a * 6364136223846793005L + b * 9007199254740993L)
    def rowsNullable(ts: Seq[(Long, String, Long)]) = {
      val base = rows(ts: _*)
      // every 5th doc_id carries a NULL value
      base.withColumn("n_chars",
        when(pmod(col("doc_id"), lit(5)) === 0, lit(null)).otherwise(col("n_chars")))
    }
    SnapshotTable.create(
      rowsNullable((0L until 15L).map(i => (i, s"s${h(1, i) % 4}", h(2, i) % 8))), src)
    IncrementalView.createDistinct(spark, src, view, Seq("source"), "n_chars")
    for (commit <- 1 to 12) {
      val ups = (0 until 8).map { j =>
        val k = h(commit, j) % 40
        (k, s"s${h(commit * 31 + 7, j) % 4}", h(commit * 17 + 3, j) % 8)
      }.distinctBy(_._1)
      SnapshotTable.merge(spark, src, rowsNullable(ups), "doc_id")
      val dels = (0 until 3).map(j => h(commit * 13 + 11, j) % 40).distinct
      SnapshotTable.merge(spark, src,
        SnapshotTable.read(spark, src)
          .filter(col("doc_id").isin(dels: _*))
          .withColumn("gone", lit(true)),
        "doc_id", deleteCol = Some("gone"))
      if (commit % 3 == 0 || commit == 12) {
        IncrementalView.refreshDistinct(spark, src, view, Seq("source"), "n_chars")
        assert(viewDc(view) === recomputeDc(src), s"diverged at commit $commit")
      }
    }
  }

  test("refresh across a compaction commit: rewrite pairs cancel, extrema survive") {
    // a compaction is a data-preserving commit, but the file-granular feed
    // re-emits every compacted row as a (delete, insert) pair: additive
    // columns must cancel exactly, and the extrema path must shrug off the
    // delete side tying EVERY stored extremum (a recompute trigger that
    // must land on the identical answer)
    val src = tmp("graft-mv-cp")
    val view = tmp("graft-mv-cp-view")
    val viewX = tmp("graft-mv-cp-viewx")
    SnapshotTable.create(
      rows((0L until 20L).map(i => (i, s"s${i % 3}", i * 7 % 50)): _*), src)
    IncrementalView.create(spark, src, view, Seq("source"), Seq("n_chars"))
    IncrementalView.create(spark, src, viewX, Seq("source"), Nil,
      minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
    // commit 2: a real change; commit 3: pure compaction (no logical change)
    SnapshotTable.merge(spark, src,
      rows((20L until 26L).map(i => (i, s"s${i % 3}", i * 11 % 50)): _*), "doc_id")
    SnapshotTable.compact(spark, src, minFileBytes = 1L << 30, targetPartitions = 2)
    assert(SnapshotTable.latestVersion(src) === 3)
    IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    IncrementalView.refresh(spark, src, viewX, Seq("source"), Nil,
      minCols = Seq("n_chars"), maxCols = Seq("n_chars"))
    val expect = SnapshotTable.read(spark, src)
      .groupBy("source")
      .agg(count(lit(1)).as("c"), sum("n_chars").as("s"),
        min("n_chars").as("mn"), max("n_chars").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val gotAdd = SnapshotTable.read(spark, view)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long](IncrementalView.countCol), r.getAs[Long]("n_chars"))).toSet
    val gotExt = SnapshotTable.read(spark, viewX)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long](IncrementalView.minName("n_chars")),
        r.getAs[Long](IncrementalView.maxName("n_chars")))).toSet
    assert(gotAdd === expect.map(t => (t._1, t._2, t._3)))
    assert(gotExt === expect.map(t => (t._1, t._4, t._5)))
    // a second refresh with nothing new is a no-op at the same version
    assert(IncrementalView.refresh(spark, src, view,
      Seq("source"), Seq("n_chars")) === 3)
  }

  test("refresh reads the delta, not the table") {
    val src = tmp("graft-mv-delta")
    val view = tmp("graft-mv-delta-view")
    // base: many rows across many files; delta: one small commit
    import spark.implicits._
    SnapshotTable.create(
      (1L to 2000L).map(i => (i, s"s${i % 8}", i)).toDF("doc_id", "source", "n_chars")
        .repartition(8), src)
    IncrementalView.create(spark, src, view, Seq("source"), Seq("n_chars"))
    SnapshotTable.merge(spark, src, rows((2001L, "s1", 42)), "doc_id")
    val ch = SnapshotTable.changesBetween(
      spark, src, 1, SnapshotTable.latestVersion(src))
    // the feed carries the new file only — a fraction of the 2000-row table
    assert(ch.count() < 100,
      s"change feed read ${ch.count()} rows for a 1-row commit")
    IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    assert(viewRows(view) === recompute(src))
  }

  test("null group keys refresh in place, never as brand-new groups") {
    // REGRESSION (ADVICE r11): the delta-to-view join was a plain
    // equi-join on the raw key columns, which never matches NULL keys —
    // an existing null-keyed group looked brand-new and the MERGE
    // replaced its stored aggregates with delta-only values
    import spark.implicits._
    val src = tmp("graft-mv-nullkey")
    val view = tmp("graft-mv-nullkey-view")
    def df(xs: (Long, Option[String], Long)*) =
      xs.toDF("doc_id", "source", "n_chars")
    SnapshotTable.create(
      df((1, None, 10), (2, None, 20), (3, Some("a"), 5)), src)
    IncrementalView.create(spark, src, view, Seq("source"), Seq("n_chars"))
    SnapshotTable.merge(spark, src,
      df((4, None, 7), (5, Some("a"), 1)), "doc_id")
    IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    val got = SnapshotTable.read(spark, view)
      .collect().map(r => (Option(r.getAs[String]("source")),
        r.getAs[Long](IncrementalView.countCol), r.getAs[Long]("n_chars"))).toSet
    assert(got === Set((None, 3L, 37L), (Some("a"), 2L, 6L)),
      s"null-keyed group must accumulate 10+20+7, got $got")
  }

  test("all-NULL delta sum column leaves the stored running sum unchanged") {
    // REGRESSION (ADVICE r11): SQL SUM ignores NULLs, so a delta whose
    // every row is NULL in a sum column has delta-sum NULL — the fast
    // path computed old + NULL = NULL and destroyed the stored sum
    import spark.implicits._
    val src = tmp("graft-mv-nullsum")
    val view = tmp("graft-mv-nullsum-view")
    def df(xs: (Long, String, Option[Long])*) =
      xs.toDF("doc_id", "source", "n_chars")
    SnapshotTable.create(
      df((1, "a", Some(10)), (2, "a", Some(20)), (3, "b", None)), src)
    IncrementalView.create(spark, src, view, Seq("source"), Seq("n_chars"))
    // delta: key a gains a NULL-valued row; key b stays all-NULL;
    // brand-new key c arrives all-NULL (its sum must BE null, not 0)
    SnapshotTable.merge(spark, src,
      df((4, "a", None), (5, "b", None), (6, "c", None)), "doc_id")
    IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    val got = SnapshotTable.read(spark, view)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long](IncrementalView.countCol),
        Option(r.getAs[Any]("n_chars")).map(_.asInstanceOf[Long]))).toSet
    assert(got === Set(("a", 3L, Some(30L)), ("b", 2L, None), ("c", 1L, None)),
      s"NULL delta sums must not clobber stored sums, got $got")
    // and a later real value on the all-NULL key resumes from NULL -> value
    SnapshotTable.merge(spark, src, df((7, "c", Some(9))), "doc_id")
    IncrementalView.refresh(spark, src, view, Seq("source"), Seq("n_chars"))
    val got2 = SnapshotTable.read(spark, view)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long](IncrementalView.countCol),
        Option(r.getAs[Any]("n_chars")).map(_.asInstanceOf[Long]))).toSet
    assert(got2 === Set(("a", 3L, Some(30L)), ("b", 2L, None), ("c", 2L, Some(9L))))
  }

  test("extremum tie-recompute reads only the tied keys' files on a clustered key") {
    // the recompute path's 100 TB shape: with a numeric zone-mapped view
    // key and the source clustered on it, readPoints opens only the tied
    // keys' own files instead of rescanning the corpus
    import spark.implicits._
    val src = tmp("graft-mv-prune")
    val view = tmp("graft-mv-prune-view")
    val base = (0L until 4000L).map(i => (i, i % 8, (i * 13) % 100))
      .toDF("doc_id", "grp", "value")
    SnapshotTable.create(base.repartition(8, col("doc_id")), src,
      statsCols = Seq("grp"))
    SnapshotTable.compact(spark, src, minFileBytes = 1L << 30,
      targetPartitions = 8, clusterBy = Seq("grp"))
    // zone maps are now selective: one key's rows live in ~1 file
    val probe = SnapshotTable.readPoints(spark, src, "grp", Seq(3.0))
    assert(probe.inputFiles.length <= 2,
      s"clustered point read must prune: ${probe.inputFiles.length} of 8")
    assert(probe.count() === base.filter(col("grp") === 3).count())

    IncrementalView.create(spark, src, view, Seq("grp"), Nil,
      minCols = Seq("value"))
    // delete THE row holding grp=3's minimum -> tie -> per-key recompute
    val minRow = base.filter(col("grp") === 3).orderBy("value").limit(1)
    SnapshotTable.merge(spark, src, minRow.withColumn("gone", lit(true)),
      "doc_id", deleteCol = Some("gone"))
    IncrementalView.refresh(spark, src, view, Seq("grp"), Nil,
      minCols = Seq("value"))
    val got = SnapshotTable.read(spark, view)
      .select(col("grp"), col(IncrementalView.minName("value")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = SnapshotTable.read(spark, src)
      .groupBy("grp").agg(min("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("tie-recompute on a composite string+numeric key prunes like the numeric case") {
    // r12 verdict #7: the zone-map-pruned point read must also cover
    // multi-column and string view keys — same ≤2-of-8 file fraction the
    // single-numeric test pins
    import spark.implicits._
    val src = tmp("graft-mv-prune2")
    val view = tmp("graft-mv-prune2-view")
    val base = (0L until 4000L).map(i => (i, s"s${i % 4}", i % 2, (i * 13) % 100))
      .toDF("doc_id", "cat", "grp", "value")
    SnapshotTable.create(base.repartition(8, col("doc_id")), src,
      statsCols = Seq("cat", "grp"))
    SnapshotTable.compact(spark, src, minFileBytes = 1L << 30,
      targetPartitions = 8, clusterBy = Seq("cat", "grp"))
    // direct pin on the composite point read: one (cat, grp) cell ≈ 1 file
    val probe = SnapshotTable.readTuples(spark, src,
      Seq("cat", "grp"), Seq(Seq("s2", 1L)))
    assert(probe.inputFiles.length <= 2,
      s"clustered composite point read must prune: ${probe.inputFiles.length} of 8")
    assert(probe.count() ===
      base.filter(col("cat") === "s2" && col("grp") === 1).count())

    IncrementalView.create(spark, src, view, Seq("cat", "grp"), Nil,
      minCols = Seq("value"))
    // delete THE row holding (s2, 1)'s minimum -> tie -> per-key recompute,
    // which must route through the pruned tuple read and stay correct
    val minRow = base.filter(col("cat") === "s2" && col("grp") === 1)
      .orderBy("value").limit(1)
    SnapshotTable.merge(spark, src, minRow.withColumn("gone", lit(true)),
      "doc_id", deleteCol = Some("gone"))
    IncrementalView.refresh(spark, src, view, Seq("cat", "grp"), Nil,
      minCols = Seq("value"))
    val got = SnapshotTable.read(spark, view)
      .select(col("cat"), col("grp"), col(IncrementalView.minName("value")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = SnapshotTable.read(spark, src)
      .groupBy("cat", "grp").agg(min("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("change feed spans a schema-evolving merge") {
    // REGRESSION (ADVICE r11): the feed reads the insert side with the
    // evolved schema and the delete side with the pre-evolution schema;
    // the union must treat the missing column as null, not throw
    import spark.implicits._
    val src = tmp("graft-cdf-evolve")
    SnapshotTable.create(rows((1, "a", 10), (2, "b", 20)), src)
    val evolved = Seq((2L, "b", 25L, Some("news")), (3L, "c", 7L, Some("web")))
      .toDF("doc_id", "source", "n_chars", "origin")
    SnapshotTable.merge(spark, src, evolved, "doc_id")
    val ch = SnapshotTable.changesBetween(spark, src, 1, 2)
    assert(ch.columns.contains("origin"))
    // delete-side rows (pre-evolution files) read origin as null
    val delOrigins = ch.filter(col("_change_type") === "delete")
      .select("origin").collect().map(_.get(0)).toSet
    assert(delOrigins === Set(null))
    // and the additive identity still holds across the evolution
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    assert(ch.agg(sum(sign * col("n_chars"))).head().getLong(0) === 12L)
  }
}
