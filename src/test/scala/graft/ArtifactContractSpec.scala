package graft

import graft.sources.Io
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE parametrized contract over ALL EIGHT persisted artifact
  * families (IVF, PQ, postings, phash, dup graph, minhash
  * signatures, LM count grids, value grid), so a family
  * drifting from the shared as-of/compaction semantics fails HERE
  * even if its own suite forgot the clause. The lifecycle under test
  * is upsert-only (deletes have per-family tombstone-visibility
  * differences that each family's own spec pins — IVF/PQ as-of
  * deliberately ignores tombstones, dup-graph/postings/phash as-of
  * applies them at the clock); the four clauses every family must
  * agree on:
  *
  *   1. as-of 0       == the base build's view
  *   2. as-of mid     == the view right after that stamp's upsert
  *   3. as-of max     == the live (latest) view
  *   4. compaction    preserves the live view AND forfeits history
  *                    (post-compact as-of 0 == live: one-generation
  *                    rewrite at stamp 0)
  *
  * Each family supplies build/upsert/live/asOf/compact and a
  * canonical Set[String] rendering of its view; the clauses run
  * verbatim over all five.
  */
class ArtifactContractSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** A persisted artifact family's lifecycle hooks. The fixture
    * contract: build() writes the stamp-0 base; upsert(seq) for
    * seq = 1, 2 each REPLACES one existing id's payload and ADDS one
    * new id, so every clause compares materially different views.
    */
  private trait Family {
    def name: String
    def build(dir: String): Unit
    def upsert(dir: String, seq: Long): Unit
    def live(dir: String): Set[String]
    def asOf(dir: String, seq: Long): Set[String]
    def compact(dir: String): Unit
    /** The plain (resolution-free) reader compaction must satisfy. */
    def plain(dir: String): Set[String]
  }

  private def ivfRows(seq: Long) = Seq(
    (100L + seq, seq * 10 + 1, 0),   // the added id for this stamp
    (1L, seq * 10 + 2, 1)            // id 1 re-assigned every stamp
  ).toDF("id", "v", "cell")

  private object IvfFamily extends Family {
    val name = "ivf"
    def build(dir: String): Unit = Io.writeIvfIndex(
      Seq((1L, 1L, 0), (2L, 2L, 1)).toDF("id", "v", "cell"),
      Seq(Array(0.0, 1.0), Array(1.0, 0.0)),
      dir)
    def upsert(dir: String, seq: Long): Unit = Io.upsertIvfIndex(ivfRows(seq), dir, seq)
    def live(dir: String) = canon(Io.readIvfIndexLatest(spark, dir, "id")._2.select("id", "v"))
    def asOf(dir: String, seq: Long) =
      canon(Io.readIvfIndexAsOf(spark, dir, "id", seq)._2.select("id", "v"))
    def compact(dir: String): Unit = Io.compactIvfIndex(spark, dir, "id")
    def plain(dir: String) = canon(Io.readIvfIndex(spark, dir)._2.select("id", "v"))
  }

  private object PqFamily extends Family {
    val name = "pq"
    def build(dir: String): Unit = Io.writePqIndex(
      Seq((1L, 0, 1), (2L, 1, 0)).toDF("id", "pq_0", "pq_1"),
      Seq(Seq(Array(0.0), Array(1.0)), Seq(Array(0.0), Array(1.0))),
      dir)
    def upsert(dir: String, seq: Long): Unit = Io.upsertPqIndex(
      Seq((100L + seq, seq.toInt, 0), (1L, 0, seq.toInt)).toDF("id", "pq_0", "pq_1"),
      dir, seq)
    def live(dir: String) =
      canon(Io.readPqIndexLatest(spark, dir, "id")._2.select("id", "pq_0", "pq_1"))
    def asOf(dir: String, seq: Long) =
      canon(Io.readPqIndexAsOf(spark, dir, "id", seq)._2.select("id", "pq_0", "pq_1"))
    def compact(dir: String): Unit = Io.compactPqIndex(spark, dir, "id")
    def plain(dir: String) = canon(Io.readPqIndex(spark, dir)._2.select("id", "pq_0", "pq_1"))
  }

  private def postingsIndex(rows: Seq[(Long, String)]) =
    graft.operators.TextAnalysis.invertedIndex(rows.toDF("id", "text"), "text", "id")

  private object PostingsFamily extends Family {
    val name = "postings"
    def build(dir: String): Unit =
      Io.writePostings(postingsIndex(Seq(1L -> "alpha beta", 2L -> "gamma")), dir, buckets = 4)
    def upsert(dir: String, seq: Long): Unit = Io.upsertPostings(
      postingsIndex(Seq(1L -> s"alpha v$seq", (100L + seq) -> s"new$seq beta")),
      dir, seq)
    def live(dir: String) =
      canon(Io.readPostingsLatest(spark, dir).select("term", "id", "positions"))
    def asOf(dir: String, seq: Long) =
      canon(Io.readPostingsAsOf(spark, dir, seq).select("term", "id", "positions"))
    def compact(dir: String): Unit = Io.compactPostings(spark, dir)
    def plain(dir: String) =
      canon(Io.readPostings(spark, dir).select("term", "id", "positions"))
  }

  private object PhashFamily extends Family {
    val name = "phash"
    def build(dir: String): Unit = Io.writePhashIndex(
      Seq((1L, 0xA0L, 0L), (2L, 0xB1L, 1L)).toDF("id", "code", "pfx"), dir)
    def upsert(dir: String, seq: Long): Unit = Io.upsertPhashIndex(
      // id 1's re-hash lands in a DIFFERENT pfx bucket (the documented
      // cross-bucket case the latest reader must resolve)
      Seq((100L + seq, 0xC0L + seq, seq), (1L, 0xD0L + seq, (seq + 1) % 3))
        .toDF("id", "code", "pfx"),
      dir, seq)
    def live(dir: String) =
      canon(Io.readPhashIndexLatest(spark, dir).select("id", "code"))
    def asOf(dir: String, seq: Long) =
      canon(Io.readPhashIndexAsOf(spark, dir, seq).select("id", "code"))
    def compact(dir: String): Unit = Io.compactPhashIndex(spark, dir)
    def plain(dir: String) =
      canon(Io.readPhashIndex(spark, dir).select("id", "code"))
  }

  private object DupGraphFamily extends Family {
    val name = "dupgraph"
    def build(dir: String): Unit =
      Io.writeDupGraph(Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"), dir, buckets = 4)
    def upsert(dir: String, seq: Long): Unit = Io.upsertDupGraph(
      // each stamp links the chain one doc further and adds a fresh pair
      Seq((4L, 4L + seq), (100L + seq, 200L + seq)).toDF("id_a", "id_b"), dir, seq)
    def live(dir: String) = canon(Io.readDupGraphPairs(spark, dir).select("id_a", "id_b"))
    def asOf(dir: String, seq: Long) =
      canon(Io.readDupGraphPairsAsOf(spark, dir, seq).select("id_a", "id_b"))
    def compact(dir: String): Unit = Io.compactDupGraph(spark, dir)
    def plain(dir: String) = live(dir) // the pair reader IS the plain reader
  }

  private def signed(rows: Seq[(Long, String)]) =
    graft.operators.Dedup.minhashSign(rows.toDF("id", "text"), "text", "id", 3, 8)

  private object MinhashSigsFamily extends Family {
    val name = "minhashsigs"
    def build(dir: String): Unit = Io.writeMinhashSigs(
      signed(Seq(1L -> "alpha beta gamma delta", 2L -> "one two three four")),
      dir, buckets = 4)
    def upsert(dir: String, seq: Long): Unit = Io.upsertMinhashSigs(
      signed(Seq(
        1L -> s"alpha beta gamma rev$seq tokens",
        (100L + seq) -> s"new$seq doc text body here")),
      dir, seq)
    def live(dir: String) = canon(Io.readMinhashSigsLatest(spark, dir).select("id", "sig"))
    def asOf(dir: String, seq: Long) =
      canon(Io.readMinhashSigsAsOf(spark, dir, seq).select("id", "sig"))
    def compact(dir: String): Unit = Io.compactMinhashSigs(spark, dir)
    def plain(dir: String) = canon(Io.readMinhashSigs(spark, dir).select("id", "sig"))
  }

  private def lmGrids(rows: Seq[(Long, String)]) =
    graft.operators.TextAnalysis.bigramCountGrids(rows.toDF("id", "text"), "text")

  private object LmCountsFamily extends Family {
    val name = "lmcounts"
    private def view(uni: DataFrame, bi: DataFrame): Set[String] =
      canon(uni.select(col("term"), col("cnt"))) ++
        canon(bi.select(concat_ws("|", col("prev"), col("term")).as("k"), col("cab")))
    def build(dir: String): Unit = {
      val (u, b) = lmGrids(Seq(1L -> "alpha beta", 2L -> "gamma alpha"))
      Io.writeLmCounts(u, b, dir, buckets = 4)
    }
    def upsert(dir: String, seq: Long): Unit = {
      // bumps existing counts (alpha, beta) AND adds a new term
      val (u, b) = lmGrids(Seq((100L + seq) -> s"alpha new$seq beta"))
      Io.upsertLmCounts(u, b, dir, seq)
    }
    def live(dir: String) = {
      val (u, b) = Io.readLmCounts(spark, dir); view(u, b)
    }
    def asOf(dir: String, seq: Long) = {
      val (u, b) = Io.readLmCountsAsOf(spark, dir, seq); view(u, b)
    }
    def compact(dir: String): Unit = Io.compactLmCounts(spark, dir)
    def plain(dir: String) = live(dir) // the merged reader IS the plain reader
  }

  private def vg(rows: Seq[(String, Long, Long)]) =
    rows.toDF("day", "v", "n").withColumn("day", to_date(col("day")))

  private object ValueGridFamily extends Family {
    val name = "valuegrid"
    private def view(df: org.apache.spark.sql.DataFrame) = canon(
      df.select(
        concat_ws("|", date_format(col("day"), "yyyy-MM-dd"), col("v")).as("k"),
        col("n")))
    def build(dir: String): Unit = Io.writeValueGrid(
      vg(Seq(("2026-01-01", 100L, 2L), ("2026-01-02", 200L, 1L))), dir, buckets = 4)
    def upsert(dir: String, seq: Long): Unit = Io.upsertValueGrid(
      // bumps an existing cell's count AND adds a new (day, v) cell
      vg(Seq(("2026-01-01", 100L, seq), ("2026-01-03", 300L + seq * 10, 1L))), dir, seq)
    def live(dir: String) = view(Io.readValueGrid(spark, dir))
    def asOf(dir: String, seq: Long) = view(Io.readValueGridAsOf(spark, dir, seq))
    def compact(dir: String): Unit = Io.compactValueGrid(spark, dir)
    def plain(dir: String) = live(dir) // the merged reader IS the plain reader
  }

  private val families: Seq[Family] =
    Seq(IvfFamily, PqFamily, PostingsFamily, PhashFamily, DupGraphFamily,
      MinhashSigsFamily, LmCountsFamily, ValueGridFamily)

  test("[valuegrid] negative-delta takedown: zeroed cells vanish live, as-of resurrects them") {
    val dir = tmp("contract_vgtd") + "/art"
    ValueGridFamily.build(dir)
    val full = ValueGridFamily.live(dir)
    Io.upsertValueGrid(vg(Seq(("2026-01-02", 200L, -1L))), dir, seq = 1L)
    val after = ValueGridFamily.live(dir)
    assert(!after.exists(_.contains("2026-01-02")), after.toString)
    assert(after.exists(_.contains("2026-01-01")), after.toString)
    assert(ValueGridFamily.asOf(dir, 0L) == full)
    Io.compactValueGrid(spark, dir)
    assert(ValueGridFamily.plain(dir) == after)
    assert(ValueGridFamily.asOf(dir, 0L) == after)
  }

  test("[valuegrid] declared-bound guard fires at WRITE time on every path") {
    val dir = tmp("contract_vgbound") + "/art"
    intercept[Exception] {
      Io.writeValueGrid(vg(Seq(("2026-01-01", 1000001L, 1L))), dir)
    }
    ValueGridFamily.build(dir)
    intercept[Exception] {
      Io.upsertValueGrid(vg(Seq(("2026-01-01", -10L, 1L))), dir, seq = 1L)
    }
  }

  test("[lmcounts] negative-delta takedown: zeroed keys vanish live, as-of resurrects them") {
    val dir = tmp("contract_lmtd") + "/art"
    LmCountsFamily.build(dir)
    val full = LmCountsFamily.live(dir)
    // takedown doc 2 ("gamma alpha"): negate its grids at stamp 1
    val (ud, bd) = lmGrids(Seq(2L -> "gamma alpha"))
    Io.upsertLmCounts(
      ud.withColumn("cnt", -col("cnt")),
      bd.withColumn("cab", -col("cab")),
      dir,
      seq = 1L)
    val after = LmCountsFamily.live(dir)
    // gamma's count hits zero -> the key DROPS (exactly what a refit
    // on the filtered corpus would produce); alpha survives at 1
    assert(!after.exists(_.contains("gamma")), after.toString)
    assert(after.exists(s => s.contains("alpha") && s.contains("1")), after.toString)
    // time travel reconstructs the pre-takedown vocabulary
    assert(LmCountsFamily.asOf(dir, 0L) == full)
    // compaction purges the zeroed keys from the base too
    Io.compactLmCounts(spark, dir)
    assert(LmCountsFamily.plain(dir) == after)
    assert(LmCountsFamily.asOf(dir, 0L) == after)
  }

  for (f <- families) {
    test(s"[${f.name}] as-of clauses: 0 == base, mid == post-upsert snapshot, max == live") {
      val dir = tmp(s"contract_${f.name}") + "/art"
      f.build(dir)
      val snap0 = f.live(dir)
      f.upsert(dir, 1L)
      val snap1 = f.live(dir)
      f.upsert(dir, 2L)
      val snap2 = f.live(dir)
      // the fixture must actually move state or the clauses are vacuous
      assert(snap0 != snap1 && snap1 != snap2, s"${f.name}: fixture must mutate state")
      assert(f.asOf(dir, 0L) == snap0, s"${f.name}: as-of 0 != base build")
      assert(f.asOf(dir, 1L) == snap1, s"${f.name}: as-of mid != post-upsert-1 snapshot")
      assert(f.asOf(dir, 2L) == snap2, s"${f.name}: as-of max != live view")
    }

    test(s"[${f.name}] compaction preserves the live view and forfeits as-of history") {
      val dir = tmp(s"contract_${f.name}c") + "/art"
      f.build(dir)
      f.upsert(dir, 1L)
      f.upsert(dir, 2L)
      val preCompact = f.live(dir)
      f.compact(dir)
      assert(f.plain(dir) == preCompact, s"${f.name}: plain read after compact != pre-compact live")
      assert(f.live(dir) == preCompact, s"${f.name}: latest read after compact != pre-compact live")
      // one-generation rewrite: everything now lives at stamp 0
      assert(f.asOf(dir, 0L) == preCompact, s"${f.name}: compact must forfeit history")
    }
  }
}
