package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.streaming.{DocStreams, EventStreams}

class StreamingSpec extends SparkSpec {
  private lazy val events = Tables(spark, SharedSpark.sf0001).events.cache()

  /** events staged into a directory of event-time-ordered parquet files
    * with mtimes forcing FileStreamSource to drain them in time order. */
  private lazy val stagedDir: String = {
    import org.apache.spark.sql.functions.col
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .repartitionByRange(5, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write
      .mode("overwrite")
      .parquet(stage)
    val parts = new java.io.File(stage).listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(1000000L + i * 60000L) }
    stage
  }

  test("streaming hourly agg == batch hourly agg on the same input") {
    // FP note: micro-batch sums accumulate in a different order than batch
    // sums — compare at cent precision, not bit-exact doubles
    val batch = EventStreams
      .hourlyAgg(events.select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), math.round(r.getDouble(3) * 100)))
      .toMap

    val sq = EventStreams
      .hourlyAggStream(EventStreams.readEventStream(spark, stagedDir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_out")
      .trigger(Trigger.AvailableNow())
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val streamed = spark
      .table("hourly_out")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), math.round(r.getDouble(3) * 100)))
      .toMap
    assert(streamed == batch)
  }

  test("native session_window streaming == batch session_window on the same input") {
    // the same operator the events_session_window gate query runs in batch,
    // here through the state-store session-merging streaming path (complete
    // mode: every session emitted regardless of watermark). FP note as
    // above — compare sums at cent precision.
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .select(
        col("user_id"),
        col("session_window.start").as("ws"),
        col("session_window.end").as("we"),
        col("n"),
        col("s"))
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r =>
        (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime) ->
          (r.getLong(3), math.round(r.getDouble(4) * 100)))
      .toMap

    val batch = keyed(sessions(events.select(col("user_id"), col("ts"), col("value"))).collect())
    val sq = sessions(
      EventStreams.readEventStream(spark, stagedDir).select(col("user_id"), col("ts"), col("value")))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("sess_win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    val streamed = keyed(spark.table("sess_win_out").collect())
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream interval join == batch interval join") {
    val batch = EventStreams
      .purchasesAfterSignup(events, withinHours = 24)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).getTime))
      .toSet
    assert(batch.nonEmpty, "corpus should contain purchase-after-signup pairs")

    val sq = EventStreams
      .purchasesAfterSignup(
        EventStreams.readEventStream(spark, stagedDir),
        withinHours = 24,
        watermark = "30 days") // nothing late-dropped in this bounded corpus
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ss_join_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val streamed = spark
      .table("ss_join_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).getTime))
      .toSet
    assert(streamed == batch)
  }

  test("streaming dedup drops in-watermark duplicates with bounded state") {
    // duplicate the staged events: every id appears twice across the stream
    val dupDir = java.nio.file.Files.createTempDirectory("graft_dup_").toString
    val staged = spark.read.parquet(stagedDir)
    staged.union(staged).repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(dupDir)

    val sq = EventStreams
      .dedupStream(EventStreams.readEventStream(spark, dupDir), watermarkDelay = "30 days")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "no id may survive twice")
    assert(ids.length == staged.count(), "every unique id survives exactly once")
  }

  test("batch sessionization: gaps split sessions, aggregates are exact") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val df = Seq(
      (1L, at(0), 1.0),
      (1L, at(10), 2.0),  // same session (gap 10 < 30)
      (1L, at(50), 3.0),  // new session (gap 40 > 30)
      (2L, at(0), 5.0)
    ).toDF("user_id", "ts", "value")
    val sessions = EventStreams
      .sessionizeBatch(df, gapMinutes = 30)
      .orderBy("user_id", "session_start")
      .collect()
    assert(sessions.length == 3)
    val s1 = sessions(0)
    assert(s1.getLong(0) == 1L && s1.getInt(3) == 2 && s1.getDouble(4) == 3.0)
    val s2 = sessions(1)
    assert(s2.getInt(3) == 1 && s2.getDouble(4) == 3.0)
  }

  test("stateful streaming sessionization emits sessions consistent with batch") {
    import spark.implicits._
    // millis precision on both sides (Timestamp.getTime truncates micros —
    // the stateful op tracks event time in millis)
    val batchSessions = EventStreams
      .sessionizeBatch(events.select(col("user_id"), col("ts"), col("value")), gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getInt(3)))
      .toSet

    val stream = EventStreams
      .readEventStream(spark, stagedDir)
      // generous watermark: no event is ever late-dropped in this corpus
      .withWatermark("ts", "30 days")
      .as[EventStreams.Event]

    val sq = EventStreams
      .sessionize(stream, gapMinutes = 30)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val streamed = spark
      .table("sessions_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getInt(3)))
      .toSet
    assert(streamed.nonEmpty, "stream should emit completed sessions")
    // every emitted session must be a true (batch-computed) session
    assert(streamed.subsetOf(batchSessions))
  }

  test("mapGroupsWithState running totals converge to batch totals") {
    import spark.implicits._
    val batch = events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap

    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .runningUserTotals(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("totals_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    // the LAST update per user is the converged running total
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("n_events").desc)
    val finalTotals = spark
      .table("totals_out")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap
    assert(finalTotals == batch)
  }

  test("streaming z-score equals the batch window bit-for-bit on an in-order stream") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .zscoreStream(stream, window = 10)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("zscore_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val streamed = spark
      .table("zscore_out")
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    val batch = graft.operators.TimeSeries
      .trailingZScore(events, "user_id", "ts", "value", "event_id", window = 10)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    // EXACT double equality — the streaming fold replays the batch
    // WindowExec's arithmetic sequence, not an approximation of it
    assert(streamed == batch)
    assert(batch.size > 100)
  }

  test("streaming Holt-Winters final snapshot equals the batch fold bit-for-bit on an in-order stream") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .holtWintersStream(stream, alpha = 0.25, beta = 0.125, gamma = 0.25, period = 7)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("hw_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    // per-batch snapshots accumulate; the final one per key (max step
    // count) must equal the batch operator over the same rows
    val streamed = spark
      .table("hw_out")
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        val last = rows.maxBy(_.getLong(1))
        k -> ((last.getLong(1), last.getDouble(2), last.getDouble(3), last.getDouble(4), last.getDouble(5)))
      }
    val batch = graft.operators.TimeSeries
      .holtWintersFinal(events, "event_type", "ts", "event_id", "value",
        alpha = 0.25, beta = 0.125, gamma = 0.25, period = 7)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.values.forall(_._1 > 50))
  }

  test("streaming Page-Hinkley equals the batch operator bit-for-bit on an in-order stream") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .pageHinkleyStream(stream, delta = 0.5, lambda = new java.math.BigDecimal(150))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ph_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val streamed = spark
      .table("ph_out")
      .collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    val batch = graft.operators.TimeSeries
      .pageHinkley(events, "user_id", "ts", "event_id", "value",
        delta = 0.5, lambda = new java.math.BigDecimal(150))
      .collect()
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    // EXACT equality — the O(1)-state fold replays the batch window's
    // decimal arithmetic move for move
    assert(streamed == batch)
    assert(batch.size > 100)
  }

  test("streaming funnel converges to the batch funnel on an in-order stream") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val stages = Seq("view", "click", "purchase")
    val sq = EventStreams
      .funnelStream(stream, stages)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("funnel_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    // stage times fill monotonically, so the max-n_stages row per user IS
    // the converged state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("n_stages").desc)
    val streamed = spark
      .table("funnel_out")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[java.sql.Timestamp](1).map(Option(_)))
      .toMap

    val batch = graft.operators.Funnel
      .firstReach(events.toDF(), "user_id", "ts", "event_type", stages)
      .collect()
      .map(r => r.getLong(0) -> Seq(Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
      .toMap

    assert(streamed == batch, "converged streaming funnel state must equal the batch fold")
    assert(batch.nonEmpty)
  }

  test("mergeStream resumes from checkpoint: restart consumes only new files, state exactly-once") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_resume_src_").toString
    val ckpt   = java.nio.file.Files.createTempDirectory("graft_resume_ck_").toString
    val cat = new graft.sources.Catalog(
      spark,
      java.nio.file.Files.createTempDirectory("graft_resume_cat_").toString)

    def stage(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("k", "v", "ts").coalesce(1).write.mode("append").parquet(srcDir)

    // the crash-recovery contract: a NEW query instance on the SAME
    // checkpoint must replay source offsets, not re-ingest history
    def run(): (Set[(Long, String, Long)], Long) = {
      val sch = spark.read.parquet(srcDir).schema
      val src = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = EventStreams
        .mergeStream(src, cat, "state_resume", Seq("k"), "ts")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query must drain and stop")
      val processed = q.recentProgress.map(_.numInputRows).sum
      val state = cat
        .readTable("state_resume")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      (state, processed)
    }

    stage(Seq((1L, "a", 1L), (2L, "b", 1L)))
    stage(Seq((1L, "a2", 2L), (3L, "c", 2L)))
    val (s1, n1) = run()
    assert(n1 == 4, s"first run ingests all staged rows, got $n1")
    assert(s1 == Set((1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 2L)))

    // simulated crash: first query instance is gone; new data arrives,
    // then a fresh query starts from the same checkpoint
    stage(Seq((2L, "b9", 9L), (4L, "d", 9L)))
    val (s2, n2) = run()
    assert(n2 == 2, s"restart must consume ONLY the new file, got $n2 rows")
    assert(s2 == Set((1L, "a2", 2L), (2L, "b9", 9L), (3L, "c", 2L), (4L, "d", 9L)),
      "merged state converges exactly-once across the restart")
  }

  test("mergeStream maintains a latest-per-key state table across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val cat = new graft.sources.Catalog(
      spark,
      java.nio.file.Files.createTempDirectory("graft_cdc_stream_").toString)

    val q = EventStreams
      .mergeStream(mem.toDF().toDF("k", "v", "ts"), cat, "state", Seq("k"), "ts")
      .start()
    try {
      // batch 1: two keys, one updated within the same micro-batch
      mem.addData((1L, "a", 1L), (2L, "b", 1L), (1L, "a2", 2L))
      q.processAllAvailable()
      val afterFirst = cat.readTable("state").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(afterFirst == Set((1L, "a2", 2L), (2L, "b", 1L)),
        "in-batch dedup keeps the newest row per key")
      // batch 2: update an existing key, insert a new one
      mem.addData((2L, "b2", 5L), (3L, "c", 5L))
      q.processAllAvailable()
    } finally q.stop()

    val out = cat.readTable("state").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a2", 2L), (2L, "b2", 5L), (3L, "c", 5L)),
      "merge across batches: update wins, insert lands, untouched key survives")
  }

  test("appendStream ingests O(delta) micro-batches; restart replays nothing") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_appstream_src_").toString
    val ckpt   = java.nio.file.Files.createTempDirectory("graft_appstream_ck_").toString
    val cat = new graft.sources.Catalog(
      spark,
      java.nio.file.Files.createTempDirectory("graft_appstream_cat_").toString)

    def stage(rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append").parquet(srcDir)

    def run(): Unit = {
      val sch = spark.read.parquet(srcDir).schema
      val src = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = EventStreams
        .appendStream(src, cat, "ingest")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query must drain and stop")
    }

    stage(Seq((1L, "a"), (2L, "b")))
    stage(Seq((3L, "c")))
    run()
    val first = cat.readTable("ingest").as[(Long, String)].collect().toSet
    assert(first == Set((1L, "a"), (2L, "b"), (3L, "c")))
    val filesAfterFirst = cat.readTable("ingest").inputFiles.toSet

    // crash + new data + fresh query on the same checkpoint: only the new
    // file lands, the old generations are re-referenced (O(delta)), and
    // nothing duplicates
    stage(Seq((4L, "d")))
    run()
    val second = cat.readTable("ingest").as[(Long, String)].collect().toSet
    assert(second == first + ((4L, "d")), "restart must append exactly the new rows")
    assert(
      filesAfterFirst.subsetOf(cat.readTable("ingest").inputFiles.toSet),
      "the earlier generations must be re-referenced, not rewritten")
  }

  test("expectStream: clean rows land, violators quarantine with rule tags, restart replays neither") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_expstream_src_").toString
    val ckpt   = java.nio.file.Files.createTempDirectory("graft_expstream_ck_").toString
    val cat = new graft.sources.Catalog(
      spark,
      java.nio.file.Files.createTempDirectory("graft_expstream_cat_").toString)
    val rules = Seq("v_pos" -> "v >= 0", "tag_ok" -> "tag <> 'bad'")

    def stage(rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("k", "v", "tag").coalesce(1).write.mode("append").parquet(srcDir)

    def run(): Unit = {
      val sch = spark.read.parquet(srcDir).schema
      val src = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = EventStreams
        .expectStream(src, cat, "gated", rules)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query must drain and stop")
    }

    // batch 0: one clean, one v-violation; batch 1: clean only;
    // batch 2: one double-violation
    stage(Seq((1L, 10L, "ok"), (2L, -1L, "ok")))
    stage(Seq((3L, 30L, "ok")))
    stage(Seq((4L, -4L, "bad")))
    run()
    assert(cat.readTable("gated").select("k").as[Long].collect().toSet == Set(1L, 3L))
    val q1 = cat.quarantineOf("gated").collect().map(r =>
      r.getAs[Long]("k") -> r.getAs[Seq[String]]("_violated").toSet).toMap
    assert(q1 == Map(2L -> Set("v_pos"), 4L -> Set("v_pos", "tag_ok")), q1.toString)

    // crash + new data + fresh query on the same checkpoint: the three
    // committed batches replay NOTHING on either side; only the new file
    // lands (split across both sides)
    stage(Seq((5L, 50L, "ok"), (6L, 60L, "bad")))
    run()
    assert(cat.readTable("gated").select("k").as[Long].collect().toSet == Set(1L, 3L, 5L))
    val q2 = cat.quarantineOf("gated").collect().map(r =>
      r.getAs[Long]("k") -> r.getAs[Seq[String]]("_violated").toSet).toMap
    assert(q2 == Map(2L -> Set("v_pos"), 4L -> Set("v_pos", "tag_ok"), 6L -> Set("tag_ok")),
      "restart must append exactly the new rows on both sides: " + q2)
  }

  test("ingest maintenance loop: many appendStream generations, then compact + vacuum, zero loss") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_maint_src_").toString
    val ckpt   = java.nio.file.Files.createTempDirectory("graft_maint_ck_").toString
    val cat = new graft.sources.Catalog(
      spark,
      java.nio.file.Files.createTempDirectory("graft_maint_cat_").toString)
    (1 to 12).foreach { b =>
      Seq.tabulate(50)(i => (b * 1000L + i, s"b$b")).toDF("k", "v").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val sch = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = EventStreams
      .appendStream(src, cat, "maint")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))
    val before = cat.readTable("maint").inputFiles.length
    assert(before >= 12, s"expected one generation per micro-batch, got $before files")
    val rep = cat.compactSmallFiles("maint", smallBytes = 1L << 30, targetBytes = 1L << 30).head()
    assert(rep.getAs[Long]("n_files_packed") === before.toLong)
    // the packed-away generations become reclaimable once their last
    // referencing version is GC'd by one more publish
    cat.appendTable("maint", Seq((999999L, "tail")).toDF("k", "v").coalesce(1))
    assert(cat.vacuum("maint") > 0L, "superseded ingest generations must be reclaimed")
    val all = cat.readTable("maint")
    assert(all.count() === 12L * 50 + 1)
    assert(all.filter(col("v") === "b7").count() === 50)
  }

  test("streaming KMV distinct estimate converges bit-identical to the batch sketch") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .kmvStream(stream, k = 64)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("kmv_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    // last update per type = the estimate over the full stream
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("n_rows").desc)
    val streamed = spark.table("kmv_out")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val batch = graft.operators.Sketches
      .kmvDistinct(events, "event_type", "user_id", k = 64)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    // EXACT double equality: the state fold replays the batch aggregator's
    // insert and the batch column's estimate arithmetic, not an analogue
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("corpus gates are stream-transparent: blocklist filter on a doc stream equals batch") {
    // the gate is a stateless narrow projection, so the SAME operator call
    // runs on a readStream frame unchanged — the define-once contract the
    // header documents, proven on a corpus gate rather than an event agg
    val docs = Tables(spark, SharedSpark.sf0001).documents.select(col("doc_id"), col("text"))
    val stage = java.nio.file.Files.createTempDirectory("graft_docstream_").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = docs.schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    val sq = graft.operators.Corpus
      .blocklistFilter(stream, "doc_id", "text", Seq("drop", "null", "slow"), maxRatio = 0.05)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("gate_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    val streamed = spark.table("gate_out").collect().map(_.toSeq).toSet
    val batch = graft.operators.Corpus
      .blocklistFilter(docs, "doc_id", "text", Seq("drop", "null", "slow"), maxRatio = 0.05)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("asofStream: query answers == batch as-of join across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = events.filter(col("user_id") < 40)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .sortBy(r => (r.getTimestamp(1).getTime, r.getLong(0)))
    assert(ev.length > 100)
    // ONE tagged source feeding both sides: each micro-batch then contains
    // its chunk's updates AND queries together, and the operator's in-batch
    // (ts, updates-first) fold interleaves them — two independent memory
    // sources would let the engine deliver a chunk's LATER updates in a
    // batch before its EARLIER queries, which breaks the ordered-arrival
    // contract (the O(1) register keeps only the latest update, so a
    // query about the past can't see a superseded value)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Boolean, Long, Double)]
    val tagged  = mem.toDS()
    val updates = tagged.filter(!_._3).map(t => EventStreams.AsofUpdate(t._1, t._2, t._4, t._5))
    val queries = tagged.filter(_._3).map(t => EventStreams.AsofQuery(t._1, t._2, t._4))
    val sq = EventStreams.asofStream(updates, queries)
      .writeStream.outputMode("update").format("memory").queryName("asof_out").start()
    try {
      // event-time-ordered arrival split into 3 micro-batches
      ev.grouped(math.max(ev.length / 3, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq.collect {
          case r if r.getString(3) == "signup" =>
            (r.getLong(2), r.getTimestamp(1), false, r.getLong(0), r.getDouble(4))
          case r if r.getString(3) == "purchase" =>
            (r.getLong(2), r.getTimestamp(1), true, r.getLong(0), 0.0)
        })
        sq.processAllAvailable()
      }
    } finally sq.stop()
    val streamed = spark.table("asof_out").collect()
      .map(r => r.getLong(0) -> ((
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[java.sql.Timestamp])))).toMap
    val base = events.filter(col("user_id") < 40)
    val right = base.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("rts"), col("event_id").as("seq"), col("value"))
    val left = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val batch = graft.operators.AsOfJoin
      .asof(left, right, Seq("user_id"), "ts", "rts", Seq("value", "rts"),
        strict = false, rightTieBreak = Some("seq"))
      .collect()
      .map(r => r.getLong(2) -> ((
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[java.sql.Timestamp])))).toMap
    assert(batch.nonEmpty && batch.values.exists(_._1.isDefined))
    assert(streamed == batch,
      s"diff: ${(batch.toSet -- streamed.toSet).take(3)} / ${(streamed.toSet -- batch.toSet).take(3)}")
  }

  test("streaming decontamination gate equals the batch Bloom-prefilter report") {
    val docs = Tables(spark, SharedSpark.sf0001).documents.select(col("doc_id"), col("text"))
    // eval set = every 13th doc: those docs are IN the stream, so each
    // shares all its own grams — guaranteed contamination plus clean docs
    val eval_ = docs.filter(col("doc_id") % 13 === 0)
    val stage = java.nio.file.Files.createTempDirectory("graft_decontam_stream_").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    val sq = graft.streaming.DocStreams
      .decontamStream(stream, eval_, "doc_id", "text", n = 8)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("decontam_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    val streamed = spark.table("decontam_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Corpus
      .evalOverlapBloom(docs, eval_, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // every eval doc long enough to carry an 8-gram must self-flag
    val evalIds = eval_.filter(size(split(col("text"), "\\s+")) >= 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.subsetOf(batch.keySet), s"missing self-hits: ${(evalIds -- batch.keySet).take(3)}")
    assert(batch.size > evalIds.size / 2 && streamed.nonEmpty)
  }

  test("streaming near-dup tier: verified hit set == batch minhashDupPairs, flags == nearDupFlags") {
    val docs = Tables(spark, SharedSpark.sf0001).documents.select(col("doc_id"), col("text"))
    val stage = java.nio.file.Files.createTempDirectory("graft_neardup_stream_").toString
    // multiple files → multiple micro-batches → cross-batch bucket state
    docs.repartition(4).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    // 0.5 keeps the fixture non-trivial at sf0.001 (0.8 may be sparse there)
    val threshold = 0.5
    val sq = graft.streaming.DocStreams
      .nearDupPairStream(stream, threshold = threshold)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("neardup_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    val hits = spark.table("neardup_out").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val streamedPairs = hits.toSet
    val batchPairs = graft.operators.Dedup
      .minhashDupPairs(docs, "doc_id", "text", threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // EXACT equality including the jaccard double: the state fold replays
    // the batch verify join's set sizes and single division
    assert(streamedPairs == batchPairs, {
      val miss = batchPairs -- streamedPairs; val extra = streamedPairs -- batchPairs
      s"missing=${miss.take(5)} extra=${extra.take(5)}"
    })
    assert(batchPairs.nonEmpty, "fixture must exercise the near-dup path")
    // keep-first decisions derived from the hit stream == the batch twin
    val streamedFlags = hits.groupBy(_._2).map { case (b, hs) =>
      val first = hs.minBy(_._1)
      (b, first._1, first._3)
    }.toSet
    val batchFlags = graft.operators.Dedup
      .nearDupFlags(docs, "doc_id", "text", threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamedFlags == batchFlags)
  }

  test("streaming count-min matrix equals the batch sketch cell for cell, any batching") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val sq = EventStreams
      .cmsStream(mem.toDF().toDF("k"), "k", logW = 6, depth = 4)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("cms_out")
      .start()
    val keys = (1L to 50L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    try {
      // deliberately uneven batch boundaries: linearity makes them irrelevant
      mem.addData(keys.take(13): _*); sq.processAllAvailable()
      mem.addData(keys.slice(13, 90): _*); sq.processAllAvailable()
      mem.addData(keys.drop(90): _*); sq.processAllAvailable()
    } finally sq.stop()
    val streamed = spark.table("cms_out").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // batch twin: the same operator on a batch frame
    val batchDf = EventStreams.cmsStream(keys.toDF("k"), "k", logW = 6, depth = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchDf, "stream != batch operator")
    // and the aggregator-built matrix: nonzero cells must coincide exactly
    val matrix = graft.operators.Sketches.cmsBuild(keys.toDF("k"), "k", logW = 6, depth = 4)
    val cells = (for {
      r <- 0 until 4; b <- 0 until 64
      c = matrix((r << 6) + b) if c != 0L
    } yield (r, b.toLong, c)).toSet
    assert(streamed == cells, "stream != Sketches.cmsBuild matrix")
  }

  test("spaceSaving heavy hitters: bounds hold, frequent keys guaranteed, k counters per shard") {
    import spark.implicits._
    val k = 16
    val shards = 4
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .spaceSavingStream(stream, k = k, shards = shards)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("ss_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    // final snapshot per shard = rows carrying that shard's max n_rows
    val fin = spark.table("ss_out")
      .withColumn("mx", max(col("n_rows")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))))
      .filter(col("n_rows") === col("mx"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(fin.nonEmpty)
    val byShard = fin.groupBy(_._1)
    assert(byShard.keySet.subsetOf((0 until shards).toSet))
    byShard.values.foreach(rows => assert(rows.length <= k))
    // exact truth per (shard, user)
    val truth = events
      .select(col("user_id"))
      .collect()
      .map(_.getLong(0))
      .groupBy(u => ((graft.functions.Mix64.mix(u) % shards + shards) % shards).toInt)
      .view.mapValues(_.groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    fin.foreach { case (sh, key, cmin, cmax, _) =>
      val t = truth(sh).getOrElse(key, 0L)
      assert(cmin <= t && t <= cmax, s"shard $sh key $key: true $t outside [$cmin,$cmax]")
    }
    // SpaceSaving guarantee: every key with true count > n_shard/k is present
    byShard.foreach { case (sh, rows) =>
      val n = rows.head._5
      val present = rows.map(_._2).toSet
      truth(sh).foreach { case (key, t) =>
        if (t > n / k) assert(present.contains(key), s"frequent key $key (count $t) missing in shard $sh")
      }
    }
  }

  test("streaming ANN serve over the static IVF index equals batch ivfSearch bit-for-bit") {
    import spark.implicits._
    val emb = Tables(spark, SharedSpark.sf0001).embeddings
      .select(col("vec_id"), col("embedding")).cache()
    val queries = emb.filter(col("vec_id") % 17 === 0) // ~1/17 of vectors ask
    // offline: train the coarse quantizer once, build + cache the cell index
    val centroids = graft.operators.Similarity.trainCoarseQuantizer(emb, nlist = 8, sampleN = 2048)
    val index     = graft.operators.Similarity.ivfAssign(emb, centroids, assign = 2).cache()
    index.count()

    val batch = graft.operators.Similarity
      .ivfSearch(index, queries, centroids, k = 5, nprobe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

    // online: the same queries arrive as a 3-file parquet stream
    val qdir = java.nio.file.Files.createTempDirectory("graft_annq_").toString
    queries.repartition(3).write.mode("overwrite").parquet(qdir)
    val sq = graft.streaming.AnnStreams
      .ivfServeStream(
        spark.readStream.schema(queries.schema).parquet(qdir),
        index, centroids, k = 5, nprobe = 3)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ann_serve_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val streamed = spark
      .table("ann_serve_out")
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.keys.map(_._1).toSet.size > 10)
  }

  test("streaming ANN serve over a TOMBSTONED persisted index: deletes propagate, stream equals batch") {
    import graft.operators.AnnIndex
    val emb = Tables(spark, SharedSpark.sf0001).embeddings
      .select(col("vec_id"), col("embedding")).cache()
    val queries = emb.filter(col("vec_id") % 17 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-ann-ts-stream").toString
    val cat  = new graft.sources.Catalog(spark, root)
    AnnIndex.build(cat, "ix_ts", emb, nlist = 8, iters = 3, assign = 2)
    // tombstone every third vector AFTER the build — the serving frame
    // must reflect it without a rebuild or stream restart
    AnnIndex.deleteVectors(cat, "ix_ts", emb.filter(col("vec_id") % 3 === 0).select(col("vec_id")))
    val centroids = AnnIndex.loadCentroids(cat, "ix_ts")
    val batch = AnnIndex.search(cat, "ix_ts", queries, k = 5, nprobe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val qdir = java.nio.file.Files.createTempDirectory("graft_annq_ts_").toString
    queries.repartition(3).write.mode("overwrite").parquet(qdir)
    val sq = graft.streaming.AnnStreams
      .ivfServeStream(
        spark.readStream.schema(queries.schema).parquet(qdir),
        AnnIndex.liveIndex(cat, "ix_ts"), centroids, k = 5, nprobe = 3)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ann_ts_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    val streamedRows = spark.table("ann_ts_out").collect()
    assert(streamedRows.forall(_.getLong(1) % 3 != 0), "a tombstoned vector streamed out")
    val streamed = streamedRows
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(streamed == batch, "tombstoned stream diverged from tombstoned batch search")
    assert(batch.nonEmpty)
  }

  test("LIVE ANN serve: a delete issued WHILE the stream runs lands on the next batch, no restart") {
    import graft.operators.AnnIndex
    val emb = Tables(spark, SharedSpark.sf0001).embeddings
      .select(col("vec_id"), col("embedding")).cache()
    val queries = emb.filter(col("vec_id") % 17 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-ann-live-stream").toString
    val cat  = new graft.sources.Catalog(spark, root)
    AnnIndex.build(cat, "ix_live", emb, nlist = 8, iters = 3, assign = 2)
    val qdir = java.nio.file.Files.createTempDirectory("graft_annq_live_").toString
    // batch 1's queries staged BEFORE the stream starts
    queries.coalesce(1).write.mode("overwrite").parquet(qdir)
    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, Array[org.apache.spark.sql.Row]]()
    val sq = graft.streaming.AnnStreams
      .ivfServeStreamLive(
        spark.readStream.schema(queries.schema).parquet(qdir),
        cat, "ix_live", k = 5, nprobe = 3) { (hits, id) => perBatch.put(id, hits.collect()) }
      .start()
    try {
      sq.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val firstBatches = perBatch.keySet().asScala.max + 1
      assert(perBatch.asScala.values.exists(_.nonEmpty))
      // pre-delete truth: some served neighbor IS about to be tombstoned,
      // otherwise the propagation assertion below is vacuous
      assert(perBatch.asScala.values.exists(_.exists(_.getLong(1) % 3 == 0)),
        "fixture degenerate: no soon-to-be-deleted neighbor served in batch 1")
      // maintenance DURING the stream: tombstone every third vector
      AnnIndex.deleteVectors(cat, "ix_live", emb.filter(col("vec_id") % 3 === 0).select(col("vec_id")))
      // batch 2: same queries arrive again as a new file
      queries.coalesce(1).write.mode("append").parquet(qdir)
      sq.processAllAvailable()
      val later = perBatch.asScala.filter(_._1 >= firstBatches).values.flatten.toArray
      assert(later.nonEmpty, "no post-delete batch produced hits")
      assert(later.forall(_.getLong(1) % 3 != 0),
        "a tombstoned vector streamed out AFTER the delete — liveness contract broken")
      // bit-parity with the batch searcher against the SAME catalog state
      val batchNow = AnnIndex.search(cat, "ix_live", queries, k = 5, nprobe = 3)
        .collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      val streamedNow = later
        .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2))))
        .toMap
      assert(streamedNow == batchNow, "live stream diverged from the batch search it re-derives")
    } finally sq.stop()
  }

  test("streaming JSD drift monitor converged snapshot equals the batch operator bit-for-bit") {
    import spark.implicits._
    // reference = the even-id half's category mix; live = the full stream
    val refDf = events.filter(col("event_id") % 2 === 0)
    val reference = refDf
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .jsdStream(stream, reference)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("jsd_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val snaps = spark.table("jsd_out").collect()
    val maxN  = snaps.map(_.getLong(6)).max
    val streamed = snaps
      .filter(_.getLong(6) == maxN)
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val batch = graft.operators.DataQuality
      .jsDivergence(refDf, events.toDF(), "event_type")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(maxN == events.count())
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.values.map(_._5).sum >= 0.0)
  }

  test("streaming CUSUM converged snapshot equals the batch scan bit-for-bit on an in-order stream") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .cusumStream(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("cusum_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val snaps = spark.table("cusum_out").collect()
    val maxN  = snaps.map(_.getLong(4)).max
    val streamed = snaps
      .filter(_.getLong(4) == maxN) // the converged (all-events) snapshot
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    val batch = graft.operators.TimeSeries
      .cusum(events.toDF(), "ts")
      .collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(maxN == events.count())
    assert(streamed == batch)
    assert(batch.size > 100 && batch.values.exists(_._3))
  }

  test("streaming SPRT converged trajectory equals the batch daily checkpoints bit-for-bit") {
    import spark.implicits._
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .sprtStream(stream, convType = "purchase", p0 = 0.15, p1 = 0.20)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("sprt_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val snaps = spark.table("sprt_out").collect()
    val maxN  = snaps.map(_.getLong(5)).max
    val streamed = snaps
      .filter(_.getLong(5) == maxN)
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    val batch = graft.operators.Funnel
      .sprtDaily(events.toDF(), "ts", "event_type", "purchase", p0 = 0.15, p1 = 0.20)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(maxN == events.count())
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.values.exists(_._4 != "continue"))
  }

  test("streaming runs test converged snapshot equals the batch row bit-for-bit") {
    import spark.implicits._
    val events = spark.read.parquet(stagedDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .runsTestStream(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("runs_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val snaps = spark.table("runs_out").collect()
    val maxN  = snaps.map(_.getLong(6)).max
    val conv  = snaps.filter(_.getLong(6) == maxN).head
    val batch = graft.operators.TimeSeries.runsTest(events, "ts").collect().head
    assert(maxN == events.count())
    assert(conv.getLong(0) == batch.getLong(0) && conv.getLong(1) == batch.getLong(1))
    assert(conv.getLong(2) == batch.getLong(2))
    assert(conv.getDouble(3) == batch.getDouble(3))
    assert(conv.getDouble(4) == batch.getDouble(4) && conv.getDouble(5) == batch.getDouble(5))
    assert(conv.getLong(2) > 1L) // a real series flips at least once
  }

  test("runs-test twins agree on the degenerate constant series: all statistic columns NULL") {
    import spark.implicits._
    // 4 hours × 1 event each → hourly series [1,1,1,1]: every hour equals
    // the median, the signed frame is empty, and BOTH twins must emit one
    // row whose six statistic columns are all NULL (no fabricated runs=1)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:30:00")
    val rows = (0 until 4).map { h =>
      (h.toLong, new java.sql.Timestamp(base.getTime + h * 3600L * 1000L), h.toLong, "view", 1.0)
    }
    val flat = rows.toDF("event_id", "ts", "user_id", "event_type", "value")

    val batch = graft.operators.TimeSeries.runsTest(flat, "ts").collect()
    assert(batch.length == 1)
    assert((0 until 6).forall(batch.head.isNullAt))

    val stage = java.nio.file.Files.createTempDirectory("graft_runs_flat_").toString
    flat.coalesce(1).write.mode("overwrite").parquet(stage)
    val sq = EventStreams
      .runsTestStream(EventStreams.readEventStream(spark, stage).as[EventStreams.Event])
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("runs_flat_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()
    val snaps = spark.table("runs_flat_out").collect()
    val conv  = snaps.filter(_.getLong(6) == 4L)
    assert(conv.length == 1)
    assert((0 until 6).forall(conv.head.isNullAt))
  }


  test("streaming drift timeline converged snapshot equals the batch per-day rows bit-for-bit") {
    import spark.implicits._
    val evDf = events.select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val ref = evDf
      .filter(to_date(col("ts")) < "2024-01-08")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stream = EventStreams.readEventStream(spark, stagedDir).as[EventStreams.Event]
    val sq = EventStreams
      .driftTimelineStream(stream, ref)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("drift_tl_out")
      .start()
    try sq.processAllAvailable()
    finally sq.stop()

    val snaps = spark.table("drift_tl_out").collect()
    val maxN  = snaps.map(_.getLong(3)).max
    val streamed = snaps
      .filter(_.getLong(3) == maxN)
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val batch = graft.operators.DataQuality
      .driftTimeline(evDf, "ts", "event_type", refEnd = "2024-01-08")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(maxN == events.count())
    assert(streamed == batch)
    assert(batch.size > 20 && batch.values.forall(_._2 >= 0.0))
  }

  test("streaming weighted sample converges to the batch A-Res rows bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two strata with opposing weight profiles; ids interleaved so batch
    // boundaries cut through both reservoirs
    val rows = (1L to 300L).map { i =>
      val stratum = if (i % 2 == 0) "web" else "code"
      val weight  = if (i <= 30) 500.0 else 0.25 + (i % 7) * 0.125 // heavy head, varied tail
      (stratum, i, weight)
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)]
    val stream = mem.toDS().map(t => DocStreams.WeightedDoc(t._1, t._2, t._3))
    val sq = DocStreams
      .weightedSampleStream(stream, k = 12, seed = 41L)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("wsample_out")
      .start()
    try {
      // shuffled arrival across three micro-batches: A-Res priorities are a
      // pure function of (id, seed, weight), so order must not matter
      val shuffled = new scala.util.Random(5).shuffle(rows)
      val (b1, rest) = shuffled.splitAt(100)
      val (b2, b3)   = rest.splitAt(100)
      mem.addData(b1: _*); sq.processAllAvailable()
      mem.addData(b2: _*); sq.processAllAvailable()
      mem.addData(b3: _*); sq.processAllAvailable()
    } finally sq.stop()

    val snaps = spark.table("wsample_out").collect()
    val finalN = snaps.groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getLong(5)).max }
    val streamed = snaps
      .filter(r => r.getLong(5) == finalN(r.getString(0)))
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getInt(4))))
      .toMap
    val batch = graft.operators.Corpus
      .weightedSample(
        rows.toDF("stratum", "doc_id", "w"), "doc_id", col("w"),
        k = 12, seed = 41L, strata = Seq("stratum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3), r.getInt(4))))
      .toMap
    assert(finalN == Map("web" -> 150L, "code" -> 150L), finalN.toString)
    assert(streamed == batch, s"stream-batch divergence: ${streamed.toSet.diff(batch.toSet).take(3)}")
    assert(batch.size == 24, "12 rows per stratum expected")
    // heavy head dominates: most sampled ids come from the weighted head
    assert(batch.keys.count(_._2 <= 30) >= 16, batch.keys.toString)
  }

  test("streaming packer emits the batch packSpans rows exactly under ordered arrival") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // varied doc lengths incl. empties and boundary-crossers, two shards
    val rnd = new scala.util.Random(11)
    val rows = (1L to 120L).map { i =>
      val shard = if (i % 2 == 0) "web" else "code"
      val words = rnd.nextInt(9) // 0..8 tokens at L=5: empties + crossers
      (shard, i, (1 to words).map(w => s"t${i}_$w").mkString(" "))
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val sq = graft.streaming.DocStreams
      .packSpansStream(mem.toDS().map(t => DocStreams.PackDoc(t._1, t._2, t._3)), seqLen = 5)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("pack_out")
      .start()
    try {
      // ordered arrival per shard across three batches (doc_id ascending)
      rows.grouped(40).foreach { b => mem.addData(b: _*); sq.processAllAvailable() }
    } finally sq.stop()

    val streamed = spark.table("pack_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    val batch = graft.operators.Corpus
      .packSpans(rows.toDF("src", "doc_id", "text"), "doc_id", "text", seqLen = 5, shardCol = "src")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(streamed == batch,
      s"stream-batch divergence: ${streamed.diff(batch).take(3)} vs ${batch.diff(streamed).take(3)}")
    assert(batch.nonEmpty && batch.exists(s => s._5 - s._4 < 5 && s._6 == 0),
      "fixture should include boundary crossings")

    // the ordered-arrival guard is loud: re-sending an already-consumed id
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    val sq2 = graft.streaming.DocStreams
      .packSpansStream(mem2.toDS().map(t => DocStreams.PackDoc(t._1, t._2, t._3)), seqLen = 5)
      .writeStream.outputMode("append").format("memory").queryName("pack_guard").start()
    try {
      mem2.addData(("w", 5L, "a b")); sq2.processAllAvailable()
      mem2.addData(("w", 5L, "c d"))
      val e = intercept[Exception](sq2.processAllAvailable())
      def msg(t: Throwable): String = {
        var m = ""; var c: Throwable = t
        while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
        m
      }
      assert(msg(e).contains("out-of-order arrival"), msg(e))
    } finally sq2.stop()
  }

}
