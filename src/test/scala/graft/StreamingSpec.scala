package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Structured-Streaming variants executed to completion on bounded input
  * (Trigger.AvailableNow) and compared to the batch operators. */
class StreamingSpec extends AnyFunSuite with CacheDrained {

  test("watermark drops events arriving later than the lateness bound") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val events = mem.toDF().toDF("epoch_s", "k")
      .withColumn("ts", timestamp_seconds(col("epoch_s")))
    val agg = events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      val base = 1700000100L // an on-the-hour-ish anchor; exact value irrelevant
      def t(min: Int) = base / 300 * 300 + min * 60L
      mem.addData((t(0), "a"), (t(1), "b"))
      q.processAllAvailable()
      mem.addData((t(30), "c")) // watermark advances to ~min 20
      q.processAllAvailable()
      mem.addData((t(2), "late")) // within the first window, behind watermark
      q.processAllAvailable()
      mem.addData((t(60), "d")) // push watermark far enough to finalize all
      q.processAllAvailable()
      val rows = spark.table("late_test").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the first 5-minute window closed with its 2 on-time events; the
      // late event was discarded by the watermark, not double-counted and
      // not re-emitted as a second row for the same window
      assert(rows(t(0)) == 2L, s"late event leaked into a closed window: $rows")
      assert(rows.values.sum == 3L, s"unexpected totals (late event counted): $rows")
    } finally q.stop()
  }

  test("streaming tumbling counts == batch events_tumbling") {
    val spark = TestSpark.spark
    val stream = StreamOps.tumblingCounts(StreamOps.eventStream(spark, TestSpark.Sf))
    val got = StreamOps.runToCompletion(stream, "tumble_test")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("events_tumbling")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("streaming session windows == batch events_session (start, n)") {
    val spark = TestSpark.spark
    val stream = StreamOps.sessionCounts(StreamOps.eventStream(spark, TestSpark.Sf))
    val got = StreamOps.runToCompletion(stream, "session_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = SparkEntry.queries("events_session")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == want)
  }

  test("streaming sliding windows == batch events_sliding") {
    val spark = TestSpark.spark
    val stream = StreamOps.eventStream(spark, TestSpark.Sf)
      .withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "5 minutes", "1 minute"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .select(org.apache.spark.sql.functions
        .expr("unix_seconds(CAST(window.start AS TIMESTAMP))").as("wstart"),
        org.apache.spark.sql.functions.col("n"))
    val got = StreamOps.runToCompletion(stream, "slide_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = SparkEntry.queries("events_sliding")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("streaming dedup within watermark keeps all distinct event_ids") {
    val spark = TestSpark.spark
    val stream = StreamOps.dedupedCount(StreamOps.eventStream(spark, TestSpark.Sf))
    val got = StreamOps.runToCompletion(stream, "dedup_test")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = graft.Tables.events(spark, TestSpark.Sf)
      .groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want) // event_ids are unique, so dedup must be lossless
  }

  test("streaming count-min cells == batch sketch cells") {
    val spark = TestSpark.spark
    // countMinCells is pure per-row expressions + one aggregation, so the
    // same function runs as a stream (incremental state) and as a batch
    // plan; after an AvailableNow drain the sketches must be identical
    val got = StreamOps.runToCompletion(
      StreamOps.countMinCells(StreamOps.eventStream(spark, TestSpark.Sf)), "cm_test")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val want = StreamOps.countMinCells(graft.Tables.events(spark, TestSpark.Sf))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want)
    assert(got.size <= 4 * 64, "state exceeded the DxW bound")
  }

  test("streaming HLL registers == batch sketch registers") {
    val spark = TestSpark.spark
    val got = StreamOps.runToCompletion(
      StreamOps.hllRegisters(StreamOps.eventStream(spark, TestSpark.Sf)), "hll_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = StreamOps.hllRegisters(graft.Tables.events(spark, TestSpark.Sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    assert(got.size <= 64, "state exceeded the register bound")
  }

  test("stream-static decontamination join == batch decontam_ngram counts") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val matches = graft.streaming.StreamOps.runAppendToCompletion(
      graft.streaming.StreamOps.decontamMatches(spark, TestSpark.Sf), "decontam_stream")
    // duplicates within a doc are emitted by design (stateless stage);
    // the consumer-side rollup must reproduce the batch per-doc counts
    val streamed = matches.groupBy("doc_id")
      .agg(countDistinct("gh").as("n_shared")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = SparkEntry.queries("decontam_ngram")(spark, TestSpark.Sf).collect()
    assert(batch.exists(_.getBoolean(2)), "corpus has contaminated docs")
    batch.foreach { r =>
      assert(streamed.getOrElse(r.getLong(0), 0L) == r.getLong(1),
        s"doc ${r.getLong(0)}: stream ${streamed.get(r.getLong(0))} != batch ${r.getLong(1)}")
    }
  }

  test("streaming incremental md5 dedup == batch first-occurrence dedup (single batch)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val stream = StreamOps.incrementalDedup(
      StreamOps.docStream(spark, TestSpark.Sf))
    val got = StreamOps.runAppendToCompletion(stream, "incdedup_test").collect()
    val batchHashes = graft.Tables.documents(spark, TestSpark.Sf)
      .select(md5(col("text").cast("binary")).as("h")).distinct()
      .collect().map(_.getString(0)).toSet
    // exactly one survivor per distinct content hash, covering all hashes
    assert(got.length == batchHashes.size)
    assert(got.map(_.getString(1)).toSet == batchHashes)
  }

  test("streaming incremental dedup drops later-batch re-emissions of earlier-batch texts") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, TestSpark.Sf)
    // b0 = first half of the corpus; b1 = second half PLUS re-emissions of
    // ten b0 texts under fresh doc_ids (the re-crawl arriving a batch later)
    val dir = java.nio.file.Files.createTempDirectory("incdedup_batches").toString
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250).unionByName(
      docs.filter(col("doc_id") < 10).withColumn("doc_id", col("doc_id") + 1000))
    val flat = java.nio.file.Files.createTempDirectory("incdedup_flat").toString
    Seq("b0" -> b0, "b1" -> b1).zipWithIndex.foreach { case ((name, df), i) =>
      df.coalesce(1).write.parquet(s"$dir/$name")
      val src = new java.io.File(s"$dir/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$flat/part-$name.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 60000 + i * 30000)
    }
    val stream = StreamOps.incrementalDedup(
      StreamOps.eventStreamFromDir(spark, flat))
    val got = StreamOps.runAppendToCompletion(stream, "incdedup_multi_test").collect()
    val keptIds = got.map(_.getLong(0)).toSet
    // every re-emission (doc_id >= 1000) duplicates a hash the state store
    // saw in the earlier microbatch — all must be dropped
    assert(keptIds.forall(_ < 1000), s"re-emitted duplicates survived: ${keptIds.filter(_ >= 1000)}")
    // and nothing else was lost: one survivor per distinct hash
    assert(got.length == docs.select(md5(col("text").cast("binary"))).distinct().count())
  }

  test("stream-stream interval join == batch interval join") {
    val spark = TestSpark.spark
    val stream = StreamOps.followWithinMinute(StreamOps.eventStream(spark, TestSpark.Sf))
    val got = StreamOps.runAppendToCompletion(stream, "ssjoin_test")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.Tables.events(spark, TestSpark.Sf)
    val l = e.select(org.apache.spark.sql.functions.col("event_id").as("l_id"),
      org.apache.spark.sql.functions.col("user_id").as("l_user"),
      org.apache.spark.sql.functions.col("ts").as("l_ts"))
    val r = e.select(org.apache.spark.sql.functions.col("event_id").as("r_id"),
      org.apache.spark.sql.functions.col("user_id").as("r_user"),
      org.apache.spark.sql.functions.col("ts").as("r_ts"))
    val want = l.join(r,
        org.apache.spark.sql.functions.col("l_user") === org.apache.spark.sql.functions.col("r_user") &&
          org.apache.spark.sql.functions.col("r_ts") > org.apache.spark.sql.functions.col("l_ts") &&
          org.apache.spark.sql.functions.col("r_ts") <=
            org.apache.spark.sql.functions.col("l_ts") + org.apache.spark.sql.functions.expr("INTERVAL 1 MINUTE"))
      .select("l_id", "r_id")
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("foreachBatch sink writes each microbatch with its batch id") {
    val spark = TestSpark.spark
    val out = java.nio.file.Files.createTempDirectory("graft-febatch").toString + "/out"
    val stream = StreamOps.eventStream(spark, TestSpark.Sf)
      .select("event_id", "event_type")
    StreamOps.foreachBatchToParquet(stream, out)
    val written = spark.read.parquet(out)
    assert(written.count() ==
      graft.Tables.events(spark, TestSpark.Sf).count())
    assert(written.columns.contains("batch_id"))
  }

  test("flatMapGroupsWithState emits per-user running totals") {
    val spark = TestSpark.spark
    val stream = StreamOps.statefulUserTotals(spark,
      StreamOps.eventStream(spark, TestSpark.Sf))
    val got = StreamOps.runAppendToCompletion(stream, "state_test")
    assert(got.count() > 0)
    val events = graft.Tables.events(spark, TestSpark.Sf)
    assert(got.select("user_id").distinct().count()
      == events.select("user_id").distinct().count())
  }

  test("stateful funnel folds incrementally across MULTIPLE microbatches") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    // split events into two time-ordered files -> two microbatches
    val dir = java.nio.file.Files.createTempDirectory("funnel_batches").toString
    val ev = graft.Tables.events(spark, TestSpark.Sf)
      .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val cut = ev.selectExpr("percentile(us, 0.5)").first().getDouble(0).toLong
    // ts back to the raw long nanos shape eventStreamFromDir re-derives from
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    dump(ev.filter(col("us") <= cut), "b0")
    dump(ev.filter(col("us") > cut), "b1")
    // flatten into one dir with ordered modification times
    val flat = java.nio.file.Files.createTempDirectory("funnel_flat").toString
    Seq("b0", "b1").zipWithIndex.foreach { case (b, i) =>
      val src = new java.io.File(s"$dir/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$flat/part-$b.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 60000 + i * 30000)
    }
    val stream = StreamOps.statefulFunnel(spark,
      StreamOps.eventStreamFromDir(spark, flat)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)")))
    val rows = StreamOps.runAppendToCompletion(stream, "funnel_multi_test").collect()
    // more emissions than users touched in only one batch proves >1 batch ran
    assert(rows.length > rows.map(_.getLong(0)).distinct.length,
      "expected upsert re-emissions across multiple microbatches")
    val got = rows
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .groupBy(_._1)
      .map { case (uid, rs) =>
        (uid, rs.map(_._2).maxBy { case (v, c, p) =>
          (v.isDefined, c.isDefined, p.isDefined) })
      }
    val want = SparkEntry.queries("events_funnel")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(got == want, "incremental multi-batch funnel diverged from batch")
  }

  test("stateful streaming funnel == batch events_funnel") {
    val spark = TestSpark.spark
    val stream = StreamOps.statefulFunnel(spark,
      StreamOps.eventStream(spark, TestSpark.Sf))
    // upsert semantics: keep the most advanced state per user (one row per
    // touching microbatch may be emitted; the state is monotone)
    val got = StreamOps.runAppendToCompletion(stream, "funnel_test")
      .collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .groupBy(_._1)
      .map { case (uid, rows) =>
        (uid, rows.map(_._2).maxBy { case (v, c, p) =>
          (v.isDefined, c.isDefined, p.isDefined) })
      }
    val want = SparkEntry.queries("events_funnel")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    assert(want.nonEmpty)
    assert(got == want, {
      val diff = (want.keySet ++ got.keySet)
        .filter(k => want.get(k) != got.get(k)).take(5)
      s"funnel mismatch on users $diff: batch=${diff.map(want.get)}, stream=${diff.map(got.get)}"
    })
  }

  test("streaming SCD2 closed intervals fold incrementally across microbatches") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    // same two-time-ordered-microbatch harness as the funnel test; the
    // interesting case is an interval OPENED in batch 0 and CLOSED in
    // batch 1 — state must carry the open interval across the batch seam
    val dir = java.nio.file.Files.createTempDirectory("scd2_batches").toString
    val ev = graft.Tables.events(spark, TestSpark.Sf)
      .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val cut = ev.selectExpr("percentile(us, 0.5)").first().getDouble(0).toLong
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    dump(ev.filter(col("us") <= cut), "b0")
    dump(ev.filter(col("us") > cut), "b1")
    val flat = java.nio.file.Files.createTempDirectory("scd2_flat").toString
    Seq("b0", "b1").zipWithIndex.foreach { case (b, i) =>
      val src = new java.io.File(s"$dir/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$flat/part-$b.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 60000 + i * 30000)
    }
    val stream = StreamOps.scd2Intervals(spark,
      StreamOps.eventStreamFromDir(spark, flat)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)")))
    val got = StreamOps.runAppendToCompletion(stream, "scd2_multi_test")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("cdc_scd2")(spark, TestSpark.Sf)
      .filter(col("valid_to_us").isNotNull)
      .select("user_id", "state", "valid_from_us", "valid_to_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // closed intervals that straddle the seam prove cross-batch state carry
    val straddling = want.count(iv => iv._3 <= cut && iv._4 > cut)
    assert(straddling > 0, "test split produced no seam-straddling interval")
    assert(want.nonEmpty && got == want,
      s"multi-batch SCD2 diverged: ${(want diff got).take(3)} missing, " +
        s"${(got diff want).take(3)} extra")
  }

  test("streaming CUSUM closed days fold incrementally across microbatches") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    // two time-ordered microbatches cut at the us median — the median
    // falls INSIDE some day, so that day's total must accumulate across
    // the batch seam before it closes in batch 1
    val dir = java.nio.file.Files.createTempDirectory("cusum_batches").toString
    val ev = graft.Tables.events(spark, TestSpark.Sf)
      .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val cut = ev.selectExpr("percentile(us, 0.5)").first().getDouble(0).toLong
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    dump(ev.filter(col("us") <= cut), "b0")
    dump(ev.filter(col("us") > cut), "b1")
    val flat = java.nio.file.Files.createTempDirectory("cusum_flat").toString
    Seq("b0", "b1").zipWithIndex.foreach { case (b, i) =>
      val src = new java.io.File(s"$dir/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$flat/part-$b.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 60000 + i * 30000)
    }
    val refs = graft.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000").as("day"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("vu"))
      .groupBy("event_type", "day").agg(sum("vu").as("x"))
      .groupBy("event_type").agg(expr("sum(x) DIV count(1)").as("ref"))
    // the seam day exists: the cut's day has rows on both sides
    val cutDay = cut / 86400000000L
    val stream = StreamOps.cusumDaily(spark,
      StreamOps.eventStreamFromDir(spark, flat)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)")), refs)
    val got = StreamOps.runAppendToCompletion(stream, "cusum_multi_test")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    val want = SparkEntry.queries("stream_cusum")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(want.exists(_._2 == cutDay),
      "test split produced no seam-straddling closed day")
    assert(want.nonEmpty && got == want,
      s"multi-batch CUSUM diverged: ${(want diff got).take(3)} missing, " +
        s"${(got diff want).take(3)} extra")
  }

  test("streaming top-k upserts across microbatches; final state == batch window") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("topk_batches").toString
    val ev = graft.Tables.events(spark, TestSpark.Sf)
      .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val cut = ev.selectExpr("percentile(us, 0.5)").first().getDouble(0).toLong
    def dump(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    dump(ev.filter(col("us") <= cut), "b0")
    dump(ev.filter(col("us") > cut), "b1")
    val flat = java.nio.file.Files.createTempDirectory("topk_flat").toString
    Seq("b0", "b1").zipWithIndex.foreach { case (b, i) =>
      val src = new java.io.File(s"$dir/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$flat/part-$b.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 60000 + i * 30000)
    }
    // foreachBatch sink tags each emission with its batch id — the upsert
    // consumer keeps, per user, the rows of the LAST batch that touched it
    val out = java.nio.file.Files.createTempDirectory("topk_emit").toString + "/rows"
    StreamOps.foreachBatchToParquet(
      StreamOps.topKPerKey(spark, StreamOps.eventStreamFromDir(spark, flat), 3), out)
    val emitted = spark.read.parquet(out)
    assert(emitted.select("batch_id").distinct().count() >= 2,
      "expected emissions from more than one microbatch")
    val wLast = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val got = emitted
      .withColumn("mb", max("batch_id").over(wLast))
      .filter(col("batch_id") === col("mb"))
      .select("user_id", "rnk", "event_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    val want = graft.Tables.events(spark, TestSpark.Sf)
      .filter(col("value").isNotNull)
      .withColumn("rnk", row_number().over(wB)).filter(col("rnk") <= 3)
      .select("user_id", "rnk", "event_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got == want,
      s"incremental top-k diverged: ${(want diff got).take(3)} missing, " +
        s"${(got diff want).take(3)} extra")
  }
}
