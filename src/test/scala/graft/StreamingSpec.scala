package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Crawl(ts: Timestamp, company_id: String, page_type: String, content_hash: String)

  test("I1/I3 — dedupByContentHash drops unchanged re-crawls, keeps changed") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Crawl]
    val deduped = Streams.dedupByContentHash(
      input.toDF(), "ts", Seq("company_id", "page_type"), "content_hash")
    val q = deduped.writeStream.format("memory").queryName("dedup_t").outputMode("append").start()
    input.addData(
      Crawl(ts("2024-01-01 00:00:00"), "acme", "home", "h1"),
      Crawl(ts("2024-01-02 00:00:00"), "acme", "home", "h1"), // unchanged -> dropped
      Crawl(ts("2024-01-03 00:00:00"), "acme", "home", "h2"), // changed -> kept
      Crawl(ts("2024-01-01 00:00:00"), "acme", "jobs", "h1")  // other page -> kept
    )
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_t").select("page_type", "content_hash")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("home", "h1"), ("home", "h2"), ("jobs", "h1")))
  }

  test("session windows — events within the gap merge, beyond it split") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val sessions = Streams.sessionCounts(
      input.toDF().toDF("ts", "user"), "ts", "user", "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_t")
      .outputMode("complete").start()
    input.addData(
      (ts("2024-01-01 00:00:00"), "u1"),
      (ts("2024-01-01 00:05:00"), "u1"), // within gap -> same session
      (ts("2024-01-01 01:00:00"), "u1"), // past gap -> new session
      (ts("2024-01-01 00:00:00"), "u2"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_t")
      .collect().map(r => (r.getString(2), r.getLong(3))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got("u1") == Seq(1L, 2L)) // one 2-event session, one 1-event
    assert(got("u2") == Seq(1L))
  }

  test("I1 custom state — changeEvents emits hash transitions across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Streams.PageUpdate]
    val q = Streams.changeEvents(input.toDS())
      .writeStream.format("memory").queryName("chg_t").outputMode("append").start()
    input.addData(
      Streams.PageUpdate("acme/home", "h1", ts("2024-01-01 00:00:00")),
      Streams.PageUpdate("acme/home", "h1", ts("2024-01-02 00:00:00")), // same -> no event
      Streams.PageUpdate("acme/home", "h2", ts("2024-01-03 00:00:00"))) // change -> event
    q.processAllAvailable()
    // state persists ACROSS batches: re-seeing h2 emits nothing,
    // changing back to h1 does
    input.addData(
      Streams.PageUpdate("acme/home", "h2", ts("2024-01-04 00:00:00")),
      Streams.PageUpdate("acme/home", "h1", ts("2024-01-05 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("chg_t")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("-"), r.getString(2)))
      .toSet
    assert(got == Set(
      ("acme/home", "-", "h1"),
      ("acme/home", "h1", "h2"),
      ("acme/home", "h2", "h1")))
  }

  test("T112 stream twin — transitionPairs keeps self-transitions and carries state across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Streams.PageUpdate]
    val q = Streams.transitionPairs(input.toDS())
      .writeStream.format("memory").queryName("trans_t").outputMode("append").start()
    input.addData(
      Streams.PageUpdate("u1", "A", ts("2024-01-01 00:00:00")),
      Streams.PageUpdate("u1", "A", ts("2024-01-02 00:00:00")), // self-transition EMITS
      Streams.PageUpdate("u1", "B", ts("2024-01-03 00:00:00")))
    q.processAllAvailable()
    // the B state crosses the batch boundary: next batch's first row
    // pairs against it
    input.addData(Streams.PageUpdate("u1", "A", ts("2024-01-04 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == Map(
      ("u1", "A", "A") -> 1,
      ("u1", "A", "B") -> 1,
      ("u1", "B", "A") -> 1))
  }

  case class Ev(ts: Timestamp, company_id: String)

  test("I5 — slidingCounts windows with watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val counts = Streams.slidingCounts(input.toDF(), "ts", "company_id", "2 days", "1 day")
    val q = counts.writeStream.format("memory").queryName("slide_t").outputMode("complete").start()
    input.addData(
      Ev(ts("2024-01-01 06:00:00"), "acme"),
      Ev(ts("2024-01-01 18:00:00"), "acme"),
      Ev(ts("2024-01-02 06:00:00"), "acme"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("slide_t")
      .select(date_format($"window_start", "yyyy-MM-dd").as("d"), $"n_events")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // windows sliding daily, len 2d: [12-31,1-2)=2, [1-1,1-3)=3, [1-2,1-4)=1
    assert(got == Map("2023-12-31" -> 2L, "2024-01-01" -> 3L, "2024-01-02" -> 1L))
  }

  test("I5 — append mode drops events later than the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    // tumbling daily windows, 1-day lateness tolerance, APPEND mode:
    // only watermark-closed windows emit, and a late event behind the
    // watermark is dropped instead of mutating an already-emitted row
    val counts = Streams.slidingCounts(input.toDF(), "ts", "company_id", "1 day", "1 day")
    val q = counts.writeStream.format("memory").queryName("late_t").outputMode("append").start()
    input.addData(
      Ev(ts("2024-01-01 06:00:00"), "acme"),
      Ev(ts("2024-01-05 00:00:00"), "acme")) // advances watermark to Jan 4
    q.processAllAvailable()
    input.addData(
      Ev(ts("2024-01-01 12:00:00"), "acme"), // late: behind Jan-4 watermark -> dropped
      Ev(ts("2024-01-06 00:00:00"), "acme")) // advances watermark further
    q.processAllAvailable()
    q.stop()
    val jan1 = spark.table("late_t")
      .filter(date_format($"window_start", "yyyy-MM-dd") === "2024-01-01")
      .collect().map(_.getLong(3)).toSeq
    // exactly one emission for the Jan-1 window, and the late event
    // did not count into it
    assert(jan1 == Seq(1L))
  }

  test("I1 — dropDuplicatesWithinWatermark re-emits after state expiry") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Crawl]
    val deduped = Streams.dedupByContentHash(
      input.toDF(), "ts", Seq("company_id", "page_type"), "content_hash")
    val q = deduped.writeStream.format("memory").queryName("expiry_t")
      .outputMode("append").start()
    input.addData(Crawl(ts("2024-01-01 00:00:00"), "acme", "home", "h1"))
    q.processAllAvailable()
    // within the 1-day delay of the first sighting's state: dropped
    // (also advances the watermark far past the state's expiry)
    input.addData(Crawl(ts("2024-01-10 00:00:00"), "acme", "home", "h1"))
    q.processAllAvailable()
    // state for (acme,home,h1) has expired -> identical re-crawl
    // RE-EMITS; the downstream last-wins upsert absorbs it
    input.addData(Crawl(ts("2024-01-10 12:00:00"), "acme", "home", "h1"))
    q.processAllAvailable()
    q.stop()
    val n = spark.table("expiry_t").count()
    assert(n == 2, s"expected first emit + post-expiry re-emit, got $n rows")
  }

  test("I2 — incrementalMerge processes only added/changed keys") {
    implicit val sc = spark.sqlContext
    val prev = Seq(("acme", "home", "h1"), ("acme", "jobs", "h2"))
      .toDF("company_id", "page_type", "content_hash")
    val input = MemoryStream[Crawl]
    var seen: Set[(String, String)] = Set.empty
    val writer = Streams.incrementalMerge(
      input.toDF().drop("ts"),
      Seq("company_id", "page_type"),
      "content_hash",
      () => Some(prev),
      (work, _) => {
        seen = work.select("company_id", "page_type").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      })
    val q = writer.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("ckpt").toString).start()
    input.addData(
      Crawl(ts("2024-01-05 00:00:00"), "acme", "home", "h1"),   // same
      Crawl(ts("2024-01-05 00:00:00"), "acme", "jobs", "h2x"),  // changed
      Crawl(ts("2024-01-05 00:00:00"), "acme", "blog", "h9"))   // added
    q.processAllAvailable()
    q.stop()
    assert(seen == Set(("acme", "jobs"), ("acme", "blog")))
  }

  test("I4 — datePartitionedJsonSink writes date= partitions") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = java.nio.file.Files.createTempDirectory("risk").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt2").toString
    input.addData(Ev(ts("2024-01-01 10:00:00"), "acme"), Ev(ts("2024-01-02 11:00:00"), "bcorp"))
    val q = Streams.datePartitionedJsonSink(input.toDF(), "ts", out, ckpt).start()
    q.processAllAvailable()
    q.stop()
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("date=")).sorted
    assert(dirs.toSeq == Seq("date=2024-01-01", "date=2024-01-02"))
  }

  test("lateDataAudit counts exactly the straggler rows the state store evicts") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stage = Files.createTempDirectory("graft_late_audit").toString
    val inDir = s"$stage/in"
    Files.createDirectories(Paths.get(inDir))
    def stageOne(rows: Seq[(Long, Timestamp)], name: String, mtime: Long): Unit = {
      val tmp = s"$stage/tmp_$name"
      rows.toDF("id", "ts").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = Paths.get(s"$inDir/$name.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      dest.toFile.setLastModified(mtime): Unit
    }
    // batch 0: two on-time rows advance the eviction watermark to
    // Jan 19; batch 1 lets the LATE-EVENTS watermark catch up (it
    // trails eviction by one batch — a straggler in batch 1 would
    // still be accepted); batch 2's 19-days-late row is dropped
    // while its fresh row lands in an open window
    stageOne(
      Seq((1L, ts("2024-01-20 08:00:00")), (2L, ts("2024-01-20 09:00:00"))),
      "0", 1000000L)
    stageOne(Seq((3L, ts("2024-01-21 00:30:00"))), "1", 2000000L)
    stageOne(
      Seq((4L, ts("2024-01-01 12:00:00")), (5L, ts("2024-01-22 01:00:00"))),
      "2", 3000000L)
    val schema = spark.read.parquet(s"$inDir/0.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*.parquet")
    val (nBatches, nDropped, nInput) =
      Streams.lateDataAudit(stream, "ts", "1 day", Seq("id"), "late_audit_t")
    assert(nBatches == 3L)
    assert(nInput == 5L)
    assert(nDropped == 1L)
  }

  test("checkpoint recovery — restarted aggregation resumes state, not recompute") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    val schema = "ts TIMESTAMP, company_id STRING"

    def drainOnce(sinkName: String): Unit = {
      val counts = Streams.slidingCounts(
        spark.readStream.schema(schema).parquet(in),
        "ts", "company_id", "1 day", "1 day")
      val q = counts.writeStream.format("memory").queryName(sinkName)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq((ts("2024-01-01 06:00:00"), "acme"), (ts("2024-01-01 09:00:00"), "acme"))
      .toDF("ts", "company_id").write.mode("append").parquet(in)
    drainOnce("ckpt_run1")
    assert(spark.table("ckpt_run1").select(sum($"n_events")).head().getLong(0) == 2L)

    // second run against the SAME checkpoint: the file source must skip
    // the already-processed file, and the window state (acme Jan-1 = 2)
    // must come back from the state store — the new event lands on top
    // of the restored count, not on a recomputed-from-scratch one
    Seq((ts("2024-01-01 18:00:00"), "acme"))
      .toDF("ts", "company_id").write.mode("append").parquet(in)
    drainOnce("ckpt_run2")
    val jan1 = spark.table("ckpt_run2")
      .filter(date_format($"window_start", "yyyy-MM-dd") === "2024-01-01")
      .select($"n_events").collect().map(_.getLong(0)).toSeq
    assert(jan1 == Seq(3L), s"expected restored 2 + 1 new = 3, got $jan1")
  }

  test("checkpoint recovery — stream-stream join state survives restart") {
    val root = java.nio.file.Files.createTempDirectory("graft_ssj_").toString
    val inL = s"$root/l"; val inR = s"$root/r"
    val ckpt = s"$root/ckpt"; val out = s"$root/out"
    new java.io.File(inL).mkdirs(); new java.io.File(inR).mkdirs()

    // a FILE sink, not memory: the append-mode memory sink refuses
    // checkpoint recovery; the parquet sink commits per batch and
    // resumes, which is also the shape a real deployment runs
    def drainOnce(): Unit = {
      val l = spark.readStream
        .schema("p_ts TIMESTAMP, purchase_id LONG, p_user LONG").parquet(inL)
      val r = spark.readStream
        .schema("c_ts TIMESTAMP, click_id LONG, c_user LONG").parquet(inR)
      val j = Streams
        .intervalJoin(l, r, "p_user", "c_user", "p_ts", "c_ts", "1 hour", "365 days")
        .select($"purchase_id", $"click_id")
      val q = j.writeStream.format("parquet").outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def emitted(): Set[(Long, Long)] = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    Seq((ts("2024-01-01 10:00:00"), 100L, 1L))
      .toDF("p_ts", "purchase_id", "p_user").write.mode("append").parquet(inL)
    Seq((ts("2024-01-01 09:30:00"), 200L, 1L))
      .toDF("c_ts", "click_id", "c_user").write.mode("append").parquet(inR)
    drainOnce()
    assert(emitted() == Set((100L, 200L)))

    // second run, SAME checkpoint: only a NEW right-side click arrives.
    // For (100, 201) to emit, the left purchase must come back from the
    // symmetric-hash-join state store, not from re-reading the source
    // (the file source skips already-committed files on restart)
    Seq((ts("2024-01-01 09:45:00"), 201L, 1L))
      .toDF("c_ts", "click_id", "c_user").write.mode("append").parquet(inR)
    drainOnce()
    assert(emitted() == Set((100L, 200L), (100L, 201L)))
  }
}
