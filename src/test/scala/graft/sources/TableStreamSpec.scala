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

  test("maxFilesPerTrigger: a 4-version backlog drains in bounded " +
    "batches (≥ 2), exactly-once across a MID-CATCHUP restart, and the " +
    "direct source clamps offsets to whole versions under the cap") {
    val up = fresh("adm_up")
    Manifest.commit((0L until 5L).toDF("id").coalesce(1), up)  // v1
    (1 to 4).foreach { i => // v2..v5: one file each — the backlog
      Manifest.commit((i * 100L until i * 100L + 3L).toDF("id")
        .coalesce(1), up)
    }
    // direct source: base=1 (startingVersion), cap=2 files → the first
    // offer stops at v3 (2 files), the next at v5
    val src = new TableStreamProvider()
      .createSource(spark.sqlContext, "", None, "",
        Map("path" -> up, "startingVersion" -> "1",
          "maxFilesPerTrigger" -> "2"))
    assert(src.getOffset.contains(LongOffset(3L)),
      "first admitted offset must clamp at 2 added files (v2+v3)")
    src.getBatch(Some(LongOffset(1L)), LongOffset(3L))
    assert(src.getOffset.contains(LongOffset(5L)),
      "second offer admits the rest of the backlog")
    // a RESTARTED source (fresh instance, same checkpoint story):
    // recovery getBatch for the logged range re-establishes the
    // baseline, so the next offer admits (3,5], never re-offering v2/v3
    val src2 = new TableStreamProvider()
      .createSource(spark.sqlContext, "", None, "",
        Map("path" -> up, "startingVersion" -> "1",
          "maxFilesPerTrigger" -> "2"))
    src2.getBatch(Some(LongOffset(1L)), LongOffset(3L)) // recovery replay
    assert(src2.getOffset.contains(LongOffset(5L)))
    // end-to-end: a mid-catchup restart (Trigger.Once drains exactly one
    // capped batch, then a full drain finishes) lands every row exactly
    // once, in ≥ 2 downstream versions
    val down = fresh("adm_down"); val ckpt = fresh("adm_ckpt")
    def run(once: Boolean): Unit = {
      val w = spark.readStream
        .format("graft.sources.TableStreamProvider")
        .option("startingVersion", "1")
        .option("maxFilesPerTrigger", "2").load(up)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Streams.applyTableTailBatch(b, id, down)
        }
        .queryName("adm_spec")
      val q =
        if (once) w.trigger(
          org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        else w.start()
      try {
        if (once) q.awaitTermination() else q.processAllAvailable()
      } finally q.stop()
    }
    run(once = true) // capped catch-up, stops mid-backlog or at its end
    run(once = false) // restart finishes the drain
    assert(rows(Manifest.read(spark, down)) ==
      ((1 to 4).flatMap(i => i * 100L until i * 100L + 3L)).sorted,
      "exactly-once across the mid-catchup restart")
    assert(Manifest.version(down) >= 2L,
      "the backlog must arrive in at least two bounded batches")
    // the BYTES twin: a 1-byte cap admits exactly one version per
    // trigger (every version's files exceed it — the ≥1 floor drains)
    val srcB = new TableStreamProvider()
      .createSource(spark.sqlContext, "", None, "",
        Map("path" -> up, "startingVersion" -> "1",
          "maxBytesPerTrigger" -> "1"))
    assert(srcB.getOffset.contains(LongOffset(2L)))
    srcB.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    assert(srcB.getOffset.contains(LongOffset(3L)))
    // contract refusals
    intercept[Exception] {
      new TableStreamProvider().createSource(spark.sqlContext, "", None,
        "", Map("path" -> up, "maxFilesPerTrigger" -> "0"))
    }
    intercept[Exception] {
      new TableStreamProvider().createSource(spark.sqlContext, "", None,
        "", Map("path" -> up, "maxBytesPerTrigger" -> "-3"))
    }
  }

  test("bytes admission is served from the manifest's #filebytes lines " +
    "— ZERO storage I/O (the data dir renamed away, offsets still " +
    "clamp) — and pre-recording manifests fall back to one stat") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val up = fresh("admb_up")
    Manifest.commit((0L until 5L).toDF("id").coalesce(1), up)  // v1
    (1 to 3).foreach { i => // v2..v4: one multi-KB file each
      Manifest.commit((i * 1000L until i * 1000L + 50L).toDF("id")
        .coalesce(1), up)
    }
    // hide the data: every Files.size fallback would now see a missing
    // file (0 bytes) and admit the WHOLE backlog — so per-version
    // clamping under a 1-byte cap PROVES the sizes came from metadata
    val dataDir = Paths.get(up, "data")
    val hidden = Paths.get(up, "data_hidden")
    Files.move(dataDir, hidden, StandardCopyOption.ATOMIC_MOVE)
    try {
      val src = new TableStreamProvider()
        .createSource(spark.sqlContext, "", None, "",
          Map("path" -> up, "startingVersion" -> "1",
            "maxBytesPerTrigger" -> "1"))
      assert(src.getOffset.contains(LongOffset(2L)),
        "1-byte cap must admit exactly one version — from manifest " +
          "bytes alone (the data dir is gone)")
    } finally Files.move(hidden, dataDir, StandardCopyOption.ATOMIC_MOVE)
    // pre-recording writers: strip v2's #filebytes. lines — admission
    // falls back to one driver-side stat and still clamps per version
    val mf = Paths.get(up, "_manifests", "v000002.txt")
    val body = new String(Files.readAllBytes(mf), "UTF-8")
    val stripped = body.linesIterator
      .filterNot(_.startsWith(s"#${Manifest.FileBytesPrefix}"))
      .mkString("\n")
    assert(stripped != body, "v2 must have carried recorded bytes")
    Files.write(mf, stripped.getBytes("UTF-8"))
    val src2 = new TableStreamProvider()
      .createSource(spark.sqlContext, "", None, "",
        Map("path" -> up, "startingVersion" -> "1",
          "maxBytesPerTrigger" -> "1"))
    assert(src2.getOffset.contains(LongOffset(2L)),
      "stat fallback must still clamp v2 at one version")
    src2.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    assert(src2.getOffset.contains(LongOffset(3L)))
  }

  test("a mid-stream TYPE-WIDENING commit fails the tail loudly naming " +
    "the restart (the widened files cannot be served under the pinned " +
    "narrower schema; ignoreAddedColumns cannot accept it)") {
    val up = fresh("widen_up")
    Manifest.commit(spark.range(3).selectExpr("cast(id as int) as x"),
      up)
    val src = new TableStreamProvider()
      .createSource(spark.sqlContext, "", None, "",
        Map("path" -> up, "startingVersion" -> "1",
          "ignoreAddedColumns" -> "true"))
    Manifest.commit(spark.range(3, 6).selectExpr("id as x"), up,
      allowTypeWidening = true) // v2: x INT -> BIGINT
    val e = intercept[IllegalStateException](
      src.getBatch(Some(LongOffset(1L)), LongOffset(2L)))
    assert(e.getMessage.contains("TYPE") &&
      e.getMessage.contains("RESTART"), e.getMessage)
  }

  test("a mid-stream schema commit that ADDS a column fails the tail " +
    "loudly (naming the restart contract), ignoreAddedColumns=true " +
    "accepts the documented drop, and the CDC tail fails the same way") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val up = fresh("sch_up"); val down = fresh("sch_down")
    val ckpt = fresh("sch_ckpt")
    Manifest.commit((0L until 5L).toDF("id"), up) // v1
    // the schema pins at stream START — an evolution commit arriving
    // MID-RUN would silently drop its new column from every served
    // batch; the stream must stop instead
    val e = intercept[Exception] {
      drainTo(up, down, ckpt) { q =>
        Manifest.commit((5L until 8L).map(i => (i, s"x$i"))
          .toDF("id", "extra"), up) // v2 adds 'extra'
        q.processAllAvailable()
      }
    }
    assert(msgs(e).exists(m => m.contains("extra") &&
      m.contains("RESTART") && m.contains("ignoreAddedColumns")), msgs(e))
    assert(rows(Manifest.read(spark, down)) == (0L until 5L),
      "the failed drain must publish nothing beyond the snapshot")
    // the RESTART contract: a fresh source on the SAME checkpoint pins
    // the evolved schema and serves the held-back version
    drainTo(up, down, ckpt)()
    assert(rows(Manifest.read(spark, down)) == (0L until 8L))
    assert(Manifest.read(spark, down).columns.contains("extra"),
      "the restarted stream replicates the evolved column")
    // the documented drop: ignoreAddedColumns=true keeps a pinned run
    // flowing THROUGH a mid-run evolution, minus the new column
    val up2 = fresh("schi_up"); val down2 = fresh("schi_down")
    Manifest.commit((0L until 5L).toDF("id"), up2)
    val qi = spark.readStream.format("graft.sources.TableStreamProvider")
      .option("ignoreAddedColumns", "true").load(up2)
      .writeStream.option("checkpointLocation", fresh("schi_ckpt"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        Streams.applyTableTailBatch(b, id, down2)
      }
      .queryName("sch_ignore").start()
    try {
      qi.processAllAvailable()
      Manifest.commit((5L until 8L).map(i => (i, s"x$i"))
        .toDF("id", "extra"), up2)
      qi.processAllAvailable()
    } finally qi.stop()
    assert(rows(Manifest.read(spark, down2)) == (0L until 8L))
    assert(!Manifest.read(spark, down2).columns.contains("extra"),
      "the drop is opted into, never silent")
    // CDC mode: the same mid-run evolution fails the same way
    val up3 = fresh("schc_up"); val rep = fresh("schc_rep")
    Manifest.commit((0L until 5L).map(i => (i, i)).toDF("id", "v"), up3)
    val cdcq = spark.readStream
      .format("graft.sources.TableStreamProvider")
      .option("readChangeFeed", "true").option("keyCols", "id")
      .load(up3)
      .writeStream.option("checkpointLocation", fresh("schc_ckpt"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        Streams.applyCdcTailBatch(b, id, rep, "id")
      }
      .queryName("sch_cdc").start()
    val e2 = intercept[Exception] {
      try {
        cdcq.processAllAvailable()
        Manifest.commit((5L until 8L).map(i => (i, i, s"x$i"))
          .toDF("id", "v", "extra"), up3)
        cdcq.processAllAvailable()
      } finally cdcq.stop()
    }
    assert(msgs(e2).exists(_.contains("ignoreAddedColumns")), msgs(e2))
  }

  test("CDC startingVersion: no snapshot batch — the first batch is " +
    "exactly the change images AFTER the given version") {
    val up = fresh("cdcsv_up"); val rep = fresh("cdcsv_rep")
    Manifest.commit((0L until 10L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1), up) // v1: must NOT be served
    Manifest.commit((10L until 13L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1), up) // v2
    Merge.deleteWhereDv(spark, up, col("id") === 11L) // v3: a delete image
    val q = spark.readStream.format("graft.sources.TableStreamProvider")
      .option("readChangeFeed", "true").option("keyCols", "id")
      .option("startingVersion", "1").load(up)
      .writeStream.option("checkpointLocation", fresh("cdcsv_ckpt"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        Streams.applyCdcTailBatch(b, id, rep, "id")
      }
      .queryName("cdcsv_spec").start()
    try q.processAllAvailable() finally q.stop()
    assert(Manifest.read(spark, rep).select("id").as[Long]
        .collect().sorted.toSeq == Seq(10L, 12L),
      "only post-startingVersion change images: v2's inserts minus " +
        "v3's delete — never v1's snapshot")
  }

  test("a tail resuming PAST vacuumed versions fails with the recovery " +
    "contract: the error names both the fresh-checkpoint snapshot and " +
    "startingVersion remedies") {
    val up = fresh("vac_up"); val down = fresh("vac_down")
    val ckpt = fresh("vac_ckpt")
    Manifest.commit((0L until 5L).toDF("id"), up) // v1
    drainTo(up, down, ckpt)() // checkpoint pins position at v1
    (1 to 3).foreach(i =>
      Manifest.commit((i * 10L until i * 10L + 2L).toDF("id"), up))
    Manifest.vacuum(up, retainLast = 1) // v1..v3 manifests gone
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](drainTo(up, down, ckpt)())
    assert(msgs(e).exists(m => m.contains("VACUUMED") &&
      m.contains("FRESH checkpoint") && m.contains("startingVersion") &&
      m.contains("oldest retained: 4")), msgs(e))
    assert(rows(Manifest.read(spark, down)) == (0L until 5L),
      "the failed drain must publish nothing")
  }

  test("index REBUILD recovery (st36's loud-failure remedy): an " +
    "upstream rewrite fails the tail, rebuildFromTable re-derives the " +
    "index from the head, and the resumed tail (fresh checkpoint, " +
    "startAfterVersion) folds only later commits — probe ≡ one-shot " +
    "over the final head") {
    import graft.ops.{Manifest, TextIndex}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val work = fresh("ts_rebuild")
    val up = s"$work/up"; val ckpt1 = s"$work/ckpt1"
    Manifest.commit(docs.filter(col("doc_id") % 3 === 0).coalesce(1), up)
    Streams.tableIndexIngestStreaming(spark, up, s"$work/idx",
      "graft_ts_rb", laterChunks = Seq(
        docs.filter(col("doc_id") % 3 === 1).coalesce(1)),
      checkpoint = ckpt1, name = "ts_rb_1")
    // the upstream REWRITES (drops some folded docs): the resumed tail
    // must fail loudly — a fold cannot un-fold
    Manifest.commit(
      Manifest.read(spark, up).filter(col("doc_id") % 5 =!= 2)
        .coalesce(1), up, replace = true)
    val e = intercept[Exception] {
      Streams.tableIndexIngestStreaming(spark, up, s"$work/idx",
        "graft_ts_rb", laterChunks = Seq.empty,
        checkpoint = ckpt1, name = "ts_rb_2", seed = false)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a pure append")), msgs(e))
    // RECOVERY: rebuild from the head, resume after the captured
    // version on a FRESH checkpoint; one more chunk then folds normally
    val capturedV = TextIndex.rebuildFromTable(spark, up, "doc_id",
      "text", s"$work/idx", "graft_ts_rb")
    assert(capturedV == Manifest.version(up))
    Streams.tableIndexIngestStreaming(spark, up, s"$work/idx",
      "graft_ts_rb", laterChunks = Seq(
        docs.filter(col("doc_id") % 3 === 2).coalesce(1)),
      checkpoint = s"$work/ckpt2", name = "ts_rb_3", seed = false,
      startAfterVersion = Some(capturedV))
    TextIndex.refresh(spark, "graft_ts_rb")
    val resumed = TextIndex.bm25Probe(spark, "graft_ts_rb", "doc_id",
        terms = Seq("dup", "vector"), k = 10)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    TextIndex.buildIndex(spark, Manifest.read(spark, up), "doc_id",
      "text", path = s"$work/idx1s", prefix = "graft_ts_rb_1s")
    val oneShot = TextIndex.bm25Probe(spark, "graft_ts_rb_1s", "doc_id",
        terms = Seq("dup", "vector"), k = 10)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(resumed == oneShot,
      "rebuild + resumed tail ≡ one-shot over the final head")
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
