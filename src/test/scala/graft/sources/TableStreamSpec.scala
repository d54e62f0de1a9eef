package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.LongOffset

import graft.SparkSpec
import graft.ops.{Layout, Manifest, Merge}
import graft.streaming.Streams

/** The Manifest-table streaming SOURCE (st34): commit-log offsets,
  * snapshot-then-appends batches, exactly-once across checkpoint
  * restart, the loud non-append refusal and its skipChangeCommits
  * escape, and the DV-applied initial snapshot. */
class TableStreamSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(name).toString

  private def rows(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  private def drainTo(up: String, down: String, ckpt: String,
      skipChangeCommits: Boolean = false)(
      during: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ()): Unit = {
    val q = Streams.readTableStream(spark, up, skipChangeCommits)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        Streams.applyTableTailBatch(b, id, down)
      }
      .queryName("tablestream_spec").start()
    try { q.processAllAvailable(); during(q) } finally q.stop()
  }

  test("tail = snapshot + per-append batches, exactly-once across a " +
    "checkpoint restart (no re-served rows, replayed batch publishes " +
    "nothing), and an idle restart publishes nothing") {
    val up = fresh("ts_up"); val down = fresh("ts_down")
    val ckpt = fresh("ts_ckpt")
    Manifest.commit((0L until 10L).toDF("id"), up)   // v1
    Manifest.commit((10L until 20L).toDF("id"), up)  // v2
    // first run: the initial batch is the SNAPSHOT at start (v1+v2 in
    // one batch — version boundaries inside the snapshot are not
    // replayed one-by-one), a mid-run commit arrives as its own batch
    drainTo(up, down, ckpt) { q =>
      Manifest.commit((20L until 30L).toDF("id"), up) // v3
      q.processAllAvailable()
    }
    assert(rows(Manifest.read(spark, down)) == (0L until 30L))
    assert(Manifest.version(down) == 2L,
      "snapshot batch + one append batch")
    // restart on the same checkpoint with nothing new: nothing publishes
    drainTo(up, down, ckpt)()
    assert(Manifest.version(down) == 2L &&
      rows(Manifest.read(spark, down)) == (0L until 30L))
    // stop-the-world append, then restart: exactly the new rows arrive
    Manifest.commit((30L until 35L).toDF("id"), up)  // v4
    drainTo(up, down, ckpt)()
    assert(rows(Manifest.read(spark, down)) == (0L until 35L))
    // a replayed batch id publishes nothing (commitOnce sink contract)
    val vBefore = Manifest.version(down)
    Streams.applyTableTailBatch(
      Manifest.read(spark, up).limit(1), 0L, down)
    assert(Manifest.version(down) == vBefore)
  }

  test("getBatch plans: the initial snapshot and each append batch are " +
    "streaming-tagged; appends stay a pure parquet relation (pushdown-" +
    "capable), and the source never serves beyond its offset range") {
    val up = fresh("ts_plan")
    Manifest.commit((0L until 10L).toDF("id"), up)   // v1
    Manifest.commit((10L until 20L).toDF("id"), up)  // v2
    val src = new TableStreamProvider()
      .createSource(spark.sqlContext, "", None, "",
        Map("path" -> up))
    val snap = src.getBatch(None, LongOffset(1L))
    assert(snap.isStreaming, "v1 batches must carry isStreaming")
    assert(snap.schema.fieldNames.toSeq == Seq("id"))
    val app = src.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    assert(app.isStreaming)
    // the append batch's plan is a plain file relation — the optimizer
    // can push filters/projections into it like any batch parquet scan
    assert(app.queryExecution.logical.collectLeaves().exists(
      _.getClass.getSimpleName.startsWith("LogicalRelation")),
      app.queryExecution.logical.toString)
    // offset semantics: (0,1] is exactly v1's rows even though v2 exists
    val only1 = src.getBatch(Some(LongOffset(0L)), LongOffset(1L))
    assert(only1.isStreaming)
  }

  test("a non-append commit fails the stream loudly (naming " +
    "skipChangeCommits); with skipChangeCommits=true a compaction " +
    "skips losslessly (no duplicate rows) and a DV delete skips by " +
    "design (tail keeps what it served); a fresh tail's initial " +
    "snapshot APPLIES deletion vectors") {
    val up = fresh("ts_chg"); val down = fresh("ts_chg_down")
    val ckpt = fresh("ts_chg_ckpt")
    Manifest.commit((0L until 10L).toDF("id").coalesce(1), up,
      statsCols = Seq("id"))
    drainTo(up, down, ckpt)()
    assert(rows(Manifest.read(spark, down)) == (0L until 10L))
    // a DV delete lands: the next drain must fail loudly
    Merge.deleteWhereDv(spark, up, col("id") === 3L)
    val e = intercept[Exception] {
      drainTo(up, down, ckpt)()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("skipChangeCommits")), msgs(e))
    assert(rows(Manifest.read(spark, down)) == (0L until 10L),
      "the failed drain must publish nothing")
    // same checkpoint, skipChangeCommits: the DV commit skips (the
    // tail keeps the already-served row 3) and later appends flow
    drainTo(up, down, ckpt, skipChangeCommits = true) { q =>
      Manifest.commit((10L until 15L).toDF("id"), up)
      q.processAllAvailable()
    }
    assert(rows(Manifest.read(spark, down)) == (0L until 15L))
    // a FRESH tail while the DV is still in force: its initial
    // snapshot applies the DV — row 3, deleted upstream, never reaches
    // the new downstream
    val down2 = fresh("ts_chg_down2"); val ckpt2 = fresh("ts_chg_ckpt2")
    drainTo(up, down2, ckpt2)()
    assert(rows(Manifest.read(spark, down2)) ==
      (0L until 15L).filterNot(_ == 3L))
    // a compaction (rewrite, absorbing the DV) skips LOSSLESSLY on the
    // original tail: its rows were already served from the original
    // files — no duplicates downstream
    Layout.optimizeWhere(spark, up, "id", 0.0, 9.0)
    Manifest.commit((15L until 18L).toDF("id"), up)
    drainTo(up, down, ckpt, skipChangeCommits = true)()
    assert(rows(Manifest.read(spark, down)) == (0L until 18L),
      "compaction must not re-serve its rewritten rows")
  }

  test("a filter through the tail is applied per batch (the streaming " +
    "query's predicate reaches every batch, snapshot and append)") {
    val up = fresh("ts_filter"); val out = fresh("ts_filter_out")
    val ckpt = fresh("ts_filter_ckpt")
    Manifest.commit((0L until 10L).toDF("id"), up)
    val q = Streams.readTableStream(spark, up)
      .filter(col("id") % 2 === 0)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        Streams.applyTableTailBatch(b, id, out)
      }
      .queryName("tablestream_filter").start()
    try {
      q.processAllAvailable()
      Manifest.commit((10L until 20L).toDF("id"), up)
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(Manifest.read(spark, out)) ==
      (0L until 20L).filter(_ % 2 == 0))
  }

  test("CDC tail (readChangeFeed): snapshot arrives as inserts, a " +
    "multi-version batch carrying a DV delete AND a MoR update folds " +
    "by latest-change-per-key, the replica tracks the upstream " +
    "exactly, and a restarted tail converges without re-applying") {
    val up = fresh("cdc_up"); val rep = fresh("cdc_rep")
    val ckpt = fresh("cdc_ckpt")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("id", "v").as[(Long, Long)].collect().toSet
    Manifest.commit((0L until 10L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1), up, statsCols = Seq("id"))
    def cdcDrain(during: org.apache.spark.sql.streaming.StreamingQuery
        => Unit = _ => ()): Unit = {
      val q = spark.readStream.format("graft.sources.TableStreamProvider")
        .option("readChangeFeed", "true").option("keyCols", "id")
        .load(up)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Streams.applyCdcTailBatch(b, id, rep, "id")
        }
        .queryName("cdc_tail_spec").start()
      try { q.processAllAvailable(); during(q) } finally q.stop()
    }
    cdcDrain() // snapshot
    assert(pairs(Manifest.read(spark, rep)) ==
      (0L until 10L).map(i => (i, i)).toSet)
    // one drain window holding THREE versions: an append, a DV delete
    // hitting both an old and a new row, and a MoR update — the
    // applier's per-key reduction must order the images correctly
    cdcDrain { q =>
      Manifest.commit((10L until 15L).map(i => (i, i)).toDF("id", "v")
        .coalesce(1), up, statsCols = Seq("id"))
      Merge.deleteWhereDv(spark, up, col("id") === 3L || col("id") === 12L)
      Merge.updateWhereDv(spark, up, col("id") === 5L,
        sets = Seq("v" -> (col("v") + 100L)))
      q.processAllAvailable()
    }
    val expect: Set[(Long, Long)] = ((0L until 15L).map(i => (i, i)).toMap
      -- Seq(3L, 12L) + (5L -> 105L)).toSet
    assert(pairs(Manifest.read(spark, rep)) == expect)
    assert(pairs(Manifest.read(spark, rep)) ==
      pairs(Manifest.read(spark, up)), "replica ≡ upstream head")
    // restart on the same checkpoint with nothing new: no re-apply
    val vRep = Manifest.version(rep)
    cdcDrain()
    assert(Manifest.version(rep) == vRep &&
      pairs(Manifest.read(spark, rep)) == expect)
    // a replayed batch id converges: the delete half no-ops by MoR,
    // the upsert half is txn-gated
    import org.apache.spark.sql.functions.lit
    val replay = Manifest.read(spark, up).limit(2)
      .withColumn(graft.ops.ChangeFeed.VersionCol, lit(99L))
      .withColumn(graft.ops.ChangeFeed.TypeCol, lit("insert"))
    Streams.applyCdcTailBatch(replay, 0L, rep, "id")
    assert(pairs(Manifest.read(spark, rep)) == expect,
      "replayed batch must change nothing")
  }

  test("startingVersion: the tail serves only commits AFTER the given " +
    "version — no snapshot batch — and 'latest' means only data " +
    "committed from now on") {
    val up = fresh("sv_up")
    Manifest.commit((0L until 5L).toDF("id"), up)   // v1
    Manifest.commit((5L until 10L).toDF("id"), up)  // v2
    def tail(out: String, ckpt: String, sv: String)(
        during: org.apache.spark.sql.streaming.StreamingQuery
          => Unit = _ => ()): Unit = {
      val q = spark.readStream
        .format("graft.sources.TableStreamProvider")
        .option("startingVersion", sv).load(up)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Streams.applyTableTailBatch(b, id, out)
        }
        .queryName("tablestream_sv").start()
      try { q.processAllAvailable(); during(q) } finally q.stop()
    }
    val out1 = fresh("sv_out1")
    tail(out1, fresh("sv_ckpt1"), "1")()
    assert(rows(Manifest.read(spark, out1)) == (5L until 10L),
      "startingVersion=1 serves exactly v2, never the v1 snapshot")
    val out2 = fresh("sv_out2")
    tail(out2, fresh("sv_ckpt2"), "latest") { q =>
      assert(Manifest.version(out2) == 0L,
        "'latest' serves nothing that predates the stream")
      Manifest.commit((10L until 12L).toDF("id"), up) // v3
      q.processAllAvailable()
    }
    assert(rows(Manifest.read(spark, out2)) == (10L until 12L))
    val bad = spark.readStream
      .format("graft.sources.TableStreamProvider")
      .option("startingVersion", "banana").load(up)
      .writeStream.option("checkpointLocation", fresh("sv_ckpt3"))
      .format("noop").start()
    val e = intercept[Exception](
      try bad.processAllAvailable() finally bad.stop())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("startingVersion")), msgs(e))
  }

  test("native sink: readStream(up) → writeStream(down) replicates a " +
    "table with NO user code, exactly-once across restart (idle " +
    "restart and replayed batch publish nothing); append-only and " +
    "no-partitioning contracts refuse loudly") {
    import org.apache.spark.sql.streaming.OutputMode
    val up = fresh("sink_up"); val down = fresh("sink_down")
    val ckpt = fresh("sink_ckpt")
    Manifest.commit((0L until 10L).toDF("id"), up)
    def run(during: org.apache.spark.sql.streaming.StreamingQuery
        => Unit = _ => ()): Unit = {
      val q = Streams.readTableStream(spark, up)
        .writeStream.format("graft.sources.TableStreamProvider")
        .option("checkpointLocation", ckpt)
        .queryName("native_sink_spec").start(down)
      try { q.processAllAvailable(); during(q) } finally q.stop()
    }
    run()
    assert(rows(Manifest.read(spark, down)) == (0L until 10L))
    run { q =>
      Manifest.commit((10L until 15L).toDF("id"), up)
      q.processAllAvailable()
    }
    assert(rows(Manifest.read(spark, down)) == (0L until 15L))
    assert(Manifest.version(down) == 2L,
      "snapshot batch + one append batch; idle restart published nothing")
    // a replayed batch id publishes nothing (the txn stamp)
    val sink = new TableStreamProvider().createSink(spark.sqlContext,
      Map("path" -> down), Seq.empty, OutputMode.Append())
    sink.addBatch(0L, (100L until 103L).toDF("id"))
    assert(Manifest.version(down) == 2L &&
      rows(Manifest.read(spark, down)) == (0L until 15L))
    // ...and a genuinely NEW batch id lands (the sink really is live)
    sink.addBatch(2L, (100L until 103L).toDF("id"))
    assert(rows(Manifest.read(spark, down)) ==
      ((0L until 15L) ++ (100L until 103L)))
    // contract refusals
    intercept[IllegalArgumentException](
      new TableStreamProvider().createSink(spark.sqlContext,
        Map("path" -> down), Seq.empty, OutputMode.Complete()))
    intercept[IllegalArgumentException](
      new TableStreamProvider().createSink(spark.sqlContext,
        Map("path" -> down), Seq("id"), OutputMode.Append()))
  }

  test("tail-driven index fold (st36's shape): the post-drain probe " +
    "equals a one-shot index over the table head, and a RESTART " +
    "(seed=false, same checkpoint) folds only newly-committed versions") {
    import graft.ops.{Manifest, TextIndex}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val work = fresh("ts_fold")
    val up = s"$work/up"; val ckpt = s"$work/ckpt"
    Manifest.commit(docs.filter(col("doc_id") % 2 === 0).coalesce(1), up)
    Streams.tableIndexIngestStreaming(spark, up, s"$work/idx",
      "graft_ts_fold", laterChunks = Seq(
        docs.filter(col("doc_id") % 4 === 1).coalesce(1)),
      checkpoint = ckpt, name = "ts_fold_spec")
    // restart: one more chunk commits while the stream is DOWN; the
    // resumed drain must fold exactly that chunk (no re-fold, no loss)
    Manifest.commit(docs.filter(col("doc_id") % 4 === 3).coalesce(1), up)
    Streams.tableIndexIngestStreaming(spark, up, s"$work/idx",
      "graft_ts_fold", laterChunks = Seq.empty,
      checkpoint = ckpt, name = "ts_fold_spec2", seed = false)
    TextIndex.refresh(spark, "graft_ts_fold")
    val folded = TextIndex.bm25Probe(spark, "graft_ts_fold", "doc_id",
        terms = Seq("dup", "vector"), k = 10)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    // one-shot truth over the full table head
    TextIndex.buildIndex(spark, Manifest.read(spark, up), "doc_id",
      "text", path = s"$work/idx1s", prefix = "graft_ts_fold_1s")
    val oneShot = TextIndex.bm25Probe(spark, "graft_ts_fold_1s",
        "doc_id", terms = Seq("dup", "vector"), k = 10)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(folded == oneShot, "fold-through-the-tail ≡ one-shot build")
  }

  test("the stream refuses to start on a table with no committed " +
    "version (pinned schema and initial snapshot both need a head)") {
    val up = fresh("ts_empty")
    val e = intercept[Exception] {
      Streams.readTableStream(spark, up)
        .writeStream.option("checkpointLocation", fresh("ts_empty_ckpt"))
        .format("noop").start().processAllAvailable()
    }
    assert(e.getMessage != null)
  }
}
