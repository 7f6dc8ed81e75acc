package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, 400L), (2L, 500L), (3L, 200L), // 400+500 fits 1024, +200 fits too
    (4L, 900L),                          // doesn't fit after 1100 -> new seq
    (5L, 2000L),                         // oversized: own sequence
    (6L, 10L)
  ).toDF("doc_id", "n_tokens").coalesce(1)

  test("next-fit packing: multi-doc sequences never exceed the budget") {
    val packed = Packing.packGreedy(docs, "doc_id", "n_tokens", budget = 1024)
    val seqs = packed.groupBy("seq_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    // every multi-doc sequence within budget
    assert(seqs.filter(_._3 > 1).forall(_._2 <= 1024))
    // every doc packed exactly once
    assert(packed.count() == 6)
    assert(packed.select("doc_id").distinct().count() == 6)
    // oversized doc 5 is alone in its sequence
    val seq5 = packed.where(col("doc_id") === 5).select("seq_id").as[Long].head()
    assert(packed.where(col("seq_id") === seq5).count() == 1)
  }

  test("packing is deterministic and positions are contiguous") {
    val a = Packing.packGreedy(docs, "doc_id", "n_tokens", 1024)
      .as[Packing.Packed].collect().sortBy(_.doc_id).toSeq
    val b = Packing.packGreedy(docs, "doc_id", "n_tokens", 1024)
      .as[Packing.Packed].collect().sortBy(_.doc_id).toSeq
    assert(a == b)
    // within each sequence, seq_pos is 0..n-1
    a.groupBy(_.seq_id).values.foreach { g =>
      assert(g.map(_.seq_pos).sorted == (0 until g.size))
    }
  }

  test("sequences never cross partitions") {
    val multi = docs.repartition(3)
    val packed = Packing.packGreedy(multi, "doc_id", "n_tokens", 1024)
    // seq_id embeds the partition id in the high bits: grouping by
    // seq_id >> 40 must reproduce the partition boundaries
    val n = packed.select((col("seq_id") / lit(1L << 40)).cast("long"))
      .distinct().count()
    assert(n <= 3)
  }

  test("chunkOversized: every chunk fits, token mass is preserved") {
    val chunked = Packing.chunkOversized(docs, "doc_id", "n_tokens", budget = 1024)
      .as[(Long, Int, Long)].collect().toSeq
    assert(chunked.forall(_._3 <= 1024))
    // doc 5 (2000 tokens) -> chunks of 1024 + 976; everything else intact
    assert(chunked.filter(_._1 == 5L).map(_._3).sorted == Seq(976L, 1024L))
    val mass = chunked.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    Seq(1L -> 400L, 2L -> 500L, 3L -> 200L, 4L -> 900L, 5L -> 2000L, 6L -> 10L)
      .foreach { case (id, n) => assert(mass(id) == n, s"doc $id") }
    // chunk indices are contiguous from 0
    chunked.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted == (0 until g.size))
    }
  }

  test("chunkOversized keeps a single empty chunk for a zero-token doc") {
    val z = Seq((9L, 0L)).toDF("doc_id", "n_tokens")
    val got = Packing.chunkOversized(z, "doc_id", "n_tokens", 100)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((9L, 0, 0L)))
  }

  test("best-fit-decreasing: no overflow, every doc packed once, deterministic") {
    val packed = Packing.packBestFitDecreasing(docs, "doc_id", "n_tokens", 1024)
    val seqs = packed.groupBy("seq_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(seqs.filter(_._3 > 1).forall(_._2 <= 1024))
    assert(packed.count() == 6)
    assert(packed.select("doc_id").distinct().count() == 6)
    val again = Packing.packBestFitDecreasing(docs, "doc_id", "n_tokens", 1024)
    assert(packed.as[Packing.Packed].collect().sortBy(_.doc_id).toSeq ==
      again.as[Packing.Packed].collect().sortBy(_.doc_id).toSeq)
    // positions contiguous per sequence
    packed.as[Packing.Packed].collect().groupBy(_.seq_id).values.foreach { g =>
      assert(g.map(_.seq_pos).sorted.toSeq == (0 until g.size))
    }
  }

  test("best-fit-decreasing beats next-fit fill on a fragmenting input") {
    // next-fit in this order wastes gaps: 600,500 -> [600],[500,...]...
    val frag = Seq((1L, 600L), (2L, 500L), (3L, 400L), (4L, 500L), (5L, 24L),
      (6L, 424L)).toDF("doc_id", "n_tokens").coalesce(1)
    def nSeqs(df: org.apache.spark.sql.DataFrame) =
      df.select("seq_id").distinct().count()
    val nf = nSeqs(Packing.packGreedy(frag, "doc_id", "n_tokens", 1024))
    val bfd = nSeqs(Packing.packBestFitDecreasing(frag, "doc_id", "n_tokens", 1024))
    // same mass (2448 tokens -> lower bound 3 sequences of 1024)
    assert(bfd <= nf)
    assert(bfd == 3)
  }

  test("chunk + best-fit-decreasing: NO sequence over budget, ever") {
    val chunks = Packing.chunkOversized(docs, "doc_id", "n_tokens", 512)
      .select((col("doc_id") * lit(1L << 32) + col("chunk")).as("chunk_id"), col("n_tokens"))
    val packed = Packing.packBestFitDecreasing(chunks, "chunk_id", "n_tokens", 512)
    val over = packed.groupBy("seq_id").agg(sum("n_tokens").as("t"))
      .where(col("t") > 512).count()
    assert(over == 0L)
    // all chunk mass survives
    assert(packed.agg(sum("n_tokens")).head().getLong(0) == 4010L)
  }

  test("chunkSliding: overlap windows cover every token, final short") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val got = Packing.chunkSliding(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Int, String, Long)].collect().toSeq
    // nChunks = ceil((10-4)/2)+1 = 4; starts 1,3,5,7 — wait: stride 2
    // from len 10: (10-4+1)/2 rounded up +1 = 4 chunks, last covers 7-10
    assert(got == Seq(
      (0, "t1 t2 t3 t4", 4L), (1, "t3 t4 t5 t6", 4L),
      (2, "t5 t6 t7 t8", 4L), (3, "t7 t8 t9 t10", 4L)), got)
  }

  test("chunkSliding: short final window and stride=size disjoint mode") {
    val text = (1 to 7).map(i => s"w$i").mkString(" ")
    val overlap = Packing.chunkSliding(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, stride = 3)
      .orderBy("chunk_idx").select("chunk_text", "n_tokens")
      .as[(String, Long)].collect().toSeq
    assert(overlap == Seq(("w1 w2 w3 w4", 4L), ("w4 w5 w6 w7", 4L)), overlap)
    val disjoint = Packing.chunkSliding(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = 3, stride = 3)
      .orderBy("chunk_idx").select("chunk_text", "n_tokens")
      .as[(String, Long)].collect().toSeq
    assert(disjoint == Seq(("w1 w2 w3", 3L), ("w4 w5 w6", 3L), ("w7", 1L)),
      disjoint)
  }

  test("chunkSliding: zero-token and sub-size docs keep one chunk") {
    val got = Packing.chunkSliding(
        Seq((1L, ""), (2L, "only two"), (3L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text", size = 5, stride = 5)
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got == Set((1L, 0, "", 0L), (2L, 0, "only two", 2L),
      (3L, 0, "", 0L)), got)
    intercept[IllegalArgumentException](
      Packing.chunkSliding(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", size = 2, stride = 3))
  }

  // ---- sentence-aware sliding chunks ----

  test("chunkSentenceAware: truncated windows snap to the last sentence end in the zone") {
    // tokens: s1. s2 s3 s4. s5 s6 s7 s8 s9 s10 — boundaries at 1 and 4
    val text = "s1. s2 s3 s4. s5 s6 s7 s8 s9 s10"
    val got = Packing.chunkSentenceAware(
        Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = 6, stride = 3, tolerance = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "end_tok", "n_tokens", "chunk_text", "snapped")
      .as[(Int, Long, Long, Long, String, Boolean)].collect().toSeq
    // chunk 0: nominal [1,6], zone [4,6] → snaps to 4 ("s4.")
    assert(got(0) == ((0, 1L, 4L, 4L, "s1. s2 s3 s4.", true)), got(0))
    // chunk 1: nominal [4,9], zone [7,9] has no boundary → fallback
    assert(got(1) == ((1, 4L, 9L, 6L, "s4. s5 s6 s7 s8 s9", false)), got(1))
    // chunk 2 is FINAL (reaches len 10): never snaps
    assert(got(2) == ((2, 7L, 10L, 4L, "s7 s8 s9 s10", false)), got(2))
  }

  test("chunkSentenceAware: coverage law holds — every token in some chunk") {
    val text = (1 to 30).map(i => if (i % 4 == 0) s"t$i." else s"t$i").mkString(" ")
    val chunks = Packing.chunkSentenceAware(
        Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = 8, stride = 4, tolerance = 4)
      .select("start_tok", "end_tok")
      .as[(Long, Long)].collect()
    val covered = chunks.flatMap { case (s, e) => s to e }.toSet
    assert((1L to 30L).forall(covered), s"uncovered: ${(1L to 30L).filterNot(covered)}")
  }

  test("chunkSentenceAware: tolerance 0 reduces to chunkSliding; bounds enforced") {
    val df = Seq((1L, "a. b c d. e f g h i j")).toDF("doc_id", "text")
    val plain = Packing.chunkSliding(df, "doc_id", "text", 4, 2)
      .orderBy("chunk_idx").select("chunk_text", "n_tokens")
      .as[(String, Long)].collect().toSeq
    val aware = Packing.chunkSentenceAware(df, "doc_id", "text", 4, 2, 0)
      .orderBy("chunk_idx")
    assert(aware.select("chunk_text", "n_tokens")
      .as[(String, Long)].collect().toSeq == plain)
    assert(aware.select("snapped").as[Boolean].collect().forall(_ == false))
    intercept[IllegalArgumentException]( // tolerance > size - stride
      Packing.chunkSentenceAware(df, "doc_id", "text", 4, 2, 3))
    intercept[IllegalArgumentException](
      Packing.chunkSentenceAware(df, "doc_id", "text", 4, 2, 1,
        sentenceEndChars = Seq.empty))
  }

  test("chunkSentenceAware: no-boundary docs and empty docs fall back cleanly") {
    val got = Packing.chunkSentenceAware(
        Seq((1L, (1 to 9).map(i => s"w$i").mkString(" ")), (2L, "")).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, stride = 2, tolerance = 2)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "n_tokens", "snapped")
      .as[(Long, Long, Boolean)].collect().toSeq
    // doc 1: no boundary anywhere → every window nominal (the final
    // one short), none snapped
    assert(got.filter(_._1 == 1L).map(_._2) == Seq(4L, 4L, 4L, 3L), got)
    assert(got.forall(!_._3), got)
    // doc 2: the single empty chunk, unsnapped
    assert(got.filter(_._1 == 2L) == Seq((2L, 0L, false)), got)
  }

  // ---- token-stream layout (global-prefix-sum packing) ----

  test("tokenStreamOffsets: offsets equal the sequential layout; empty docs span no windows") {
    val docs = Seq((0L, 100L), (1L, 0L), (2L, 50L), (3L, 120L), (4L, 30L),
      (5L, 0L), (6L, 64L)).toDF("doc_id", "n")
    val got = Packing.tokenStreamOffsets(docs, "doc_id", "n", window = 64L,
        nBuckets = 3)
      .select("doc_id", "n_tokens", "start_offset", "first_window", "last_window")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    // hand layout: 0:[0,100) w0-1, 2:[100,150) w1-2, 3:[150,270) w2-4,
    // 4:[270,300) w4, 6:[300,364) w4-5; empty docs 1,5 → NULL windows
    assert(got == Set(
      (0L, 100L, 0L, 0L, 1L), (1L, 0L, 100L, -1L, -1L),
      (2L, 50L, 100L, 1L, 2L), (3L, 120L, 150L, 2L, 4L),
      (4L, 30L, 270L, 4L, 4L), (5L, 0L, 300L, -1L, -1L),
      (6L, 64L, 300L, 4L, 5L)), got)
  }

  test("windowManifest: token mass conserved per doc, windows full except the last") {
    val docs = (0 until 60).map(i => (i.toLong, ((i * 37) % 120).toLong))
      .toDF("doc_id", "n")
    val W = 64L
    val offsets = Packing.tokenStreamOffsets(docs, "doc_id", "n", W, nBuckets = 7)
    val manifest = Packing.windowManifest(offsets, W)
    val perDoc = manifest.groupBy("doc_id")
      .agg(sum(col("tokens_in_window")).as("m"))
      .as[(Long, Long)].collect().toMap
    val expected = docs.where(col("n") > 0).as[(Long, Long)].collect().toMap
    assert(perDoc == expected) // every nonzero doc's tokens all land somewhere
    val perWindow = manifest.groupBy("window_id")
      .agg(sum(col("tokens_in_window")).as("m"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val total = expected.values.sum
    assert(perWindow.map(_._1).toSeq == (0L until perWindow.size).toSeq,
      "window ids must be contiguous from 0")
    assert(perWindow.dropRight(1).forall(_._2 == W),
      "every window except the last must be exactly full (contiguous stream)")
    assert(perWindow.map(_._2).sum == total)
    // slice bounds stay inside each doc
    val bad = manifest.where(col("slice_start") < 0 ||
      col("tokens_in_window") <= 0).count()
    assert(bad == 0L)
  }

  test("tokenStreamOffsets: incremental append equals one-pass layout") {
    val all = (0 until 40).map(i => (i.toLong, ((i * 13) % 90).toLong))
    val (b1, b2) = all.splitAt(25)
    val W = 64L
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "start_offset").as[(Long, Long)].collect().toSet
    val onePass = rows(Packing.tokenStreamOffsets(
      all.toDF("doc_id", "n"), "doc_id", "n", W, nBuckets = 5))
    val base = b1.map(_._2).sum
    val incremental =
      rows(Packing.tokenStreamOffsets(
        b1.toDF("doc_id", "n"), "doc_id", "n", W, nBuckets = 5)) ++
      rows(Packing.tokenStreamOffsets(
        b2.toDF("doc_id", "n"), "doc_id", "n", W, nBuckets = 5, base = base))
    assert(incremental == onePass)
    intercept[IllegalArgumentException](Packing.tokenStreamOffsets(
      b1.toDF("doc_id", "n"), "doc_id", "n", W, base = -1L))
  }

  test("rehydrateWindows: window slices reassemble the exact token stream") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val withTok = docs.select(col("doc_id"),
      graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    val off = Packing.tokenStreamOffsets(withTok, "doc_id", "n_tokens",
      window = 4L, nBuckets = 2)
    val hyd = Packing.rehydrateWindows(
        Packing.windowManifest(off, 4L), docs, "doc_id", "text")
      .orderBy("window_id", "doc_id")
      .select("window_id", "text_slice").as[(Long, String)].collect()
    // 12 tokens in 3 full windows of 4, slices joined per window in
    // doc order must be exactly the packed stream
    val perWindow = hyd.groupBy(_._1).view
      .mapValues(_.map(_._2).mkString(" ")).toMap
    assert(perWindow == Map(0L -> "a b c d", 1L -> "e f g h", 2L -> "i j k l"),
      perWindow.toString)
    // and per-doc reassembly across windows is the original text
    val byDoc = Packing.rehydrateWindows(
        Packing.windowManifest(off, 4L), docs, "doc_id", "text")
      .orderBy("doc_id", "window_id")
      .select("doc_id", "text_slice").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).mkString(" ")).toMap
    assert(byDoc == Map(1L -> "a b c d e", 2L -> "f g h", 3L -> "i j k l"))
  }

  test("shardManifest: contiguous ranges partition the windows, mass " +
      "conserved, counts within one span step") {
    val docs = (0 until 30).map(i => (i.toLong, (17L + (i * 7) % 40)))
      .toDF("doc_id", "n")
    val W = 64L
    val manifest = Packing.windowManifest(
      Packing.tokenStreamOffsets(docs, "doc_id", "n", W, nBuckets = 4), W)
    val totalMass = docs.agg(sum("n")).as[Long].head()
    val nWindows = manifest.select("window_id").distinct().count()
    val shards = Packing.shardManifest(manifest, nShards = 4)
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // contiguity + partition: ranges chain with no gap or overlap
    assert(shards.head._2 == 0L)
    shards.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 == a._3 + 1, s"$a -> $b")
      case _ =>
    }
    assert(shards.last._3 == nWindows - 1)
    // conservation: every token in exactly one shard
    assert(shards.map(_._5).sum == totalMass)
    assert(shards.map(_._4).sum == nWindows)
    // balance: every shard holds exactly span windows except the last,
    // which holds the 1..span tail (the ceil-span contiguous law)
    val span = (nWindows + 3) / 4
    shards.init.foreach(s => assert(s._4 == span, shards.toString))
    assert(shards.last._4 >= 1 && shards.last._4 <= span, shards.toString)
    // n_windows agrees with the range (windows are dense)
    shards.foreach(s => assert(s._4 == s._3 - s._2 + 1))
    // degenerate cases
    assert(Packing.shardManifest(manifest.limit(0), 4).count() == 0)
    val one = Packing.shardManifest(manifest, nShards = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(one.length == 1 && one(0)._5 == totalMass)
    intercept[IllegalArgumentException](Packing.shardManifest(manifest, 0))
  }

  test("lengthBucketedBatches: batches group near-equal lengths, " +
      "deterministic tie-break, padding beats doc-id order") {
    import spark.implicits._
    // lengths engineered so doc-id order interleaves short/long
    val docs = (1L to 16L).map(i => (i, if (i % 2 == 0) 100L else 5L))
      .toDF("doc_id", "n")
    val got = Packing.lengthBucketedBatches(docs, "doc_id", "n",
        batchSize = 4, nBuckets = 4)
      .orderBy("batch_id", "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 16)
    // all 8 short docs fill batches 0-1; all 8 long docs batches 2-3
    val byBatch = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBatch(0L) ++ byBatch(1L) == Seq.fill(8)(5L))
    assert(byBatch(2L) ++ byBatch(3L) == Seq.fill(8)(100L))
    // equal lengths order by doc_id: batch 0 holds the 4 smallest odd ids
    assert(got.filter(_._3 == 0L).map(_._1) == Seq(1L, 3L, 5L, 7L))
    // padding economics: cost = Σ batch_size·max_len
    def cost(assign: Seq[(Long, Long, Long)]): Long =
      assign.groupBy(_._3).values.map(b => b.size * b.map(_._2).max).sum
    val naive = got.map { case (id, n, _) => (id, n, (id - 1) / 4) }
    assert(cost(got) < cost(naive),
      "length bucketing must beat doc-id-order batching on this fixture")
    // empty input → empty output, no crash
    assert(Packing.lengthBucketedBatches(
      docs.where(lit(false)), "doc_id", "n", 4).count() == 0L)
  }

  test("shardChecksums/verifyShards: self-verify passes; a single tampered " +
      "row, a dropped row, and a lost shard each flag exactly their shard") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, 5L + i % 7)).toDF("doc_id", "n")
    val manifest = Packing.windowManifest(
      Packing.tokenStreamOffsets(docs, "doc_id", "n", window = 16L,
        nBuckets = 4), 16L)
    val expected = Packing.shardChecksums(manifest, nShards = 4)
    assert(expected.count() == 4L)
    // self-verification: all shards ok
    val self = Packing.verifyShards(manifest, 4, expected)
    assert(self.where(!col("ok")).count() == 0L &&
      self.count() == 4L)
    // tamper exactly ONE row's length: exactly its shard flags
    val tampered = manifest.withColumn("tokens_in_window",
      when(col("window_id") === 0 && col("doc_id") === 1,
        col("tokens_in_window") + 1).otherwise(col("tokens_in_window")))
    val vt = Packing.verifyShards(tampered, 4, expected)
    assert(vt.where(!col("ok")).select("shard").as[Long].collect().toSeq
      == Seq(0L))
    // a MASS-PRESERVING flip (+1 on one row, -1 on a sibling) is
    // invisible to slice count and token mass — only the checksum
    // catches it
    val swapped = manifest.withColumn("tokens_in_window",
      when(col("window_id") === 0 && col("doc_id") === 1,
        col("tokens_in_window") + 1)
        .when(col("window_id") === 0 && col("doc_id") === 2,
          col("tokens_in_window") - 1)
        .otherwise(col("tokens_in_window")))
    val vs = Packing.verifyShards(swapped, 4, expected)
    assert(vs.where(!col("ok")).select("shard").as[Long].collect().toSeq
      == Seq(0L), "a mass-preserving flip must still flag via checksum")
    assert(vs.where(col("shard") === 0)
      .select(col("expected_mass") === col("actual_mass")).head().getBoolean(0),
      "the fixture must actually preserve mass for this arm to mean anything")
    // empty expected manifest: refused loudly, never a vacuous pass
    intercept[IllegalArgumentException] {
      Packing.verifyShards(manifest, 4, expected.where(lit(false)))
    }
    // drop one row (truncated shard): its shard flags via slice count
    val dropped = manifest.where(
      !(col("window_id") === 1 && col("slice_start") === 0))
    assert(Packing.verifyShards(dropped, 4, expected)
      .where(!col("ok")).count() >= 1L)
    // a whole missing shard still surfaces (full-outer, ok = false)
    val halfGone = manifest.where(col("window_id") < 2)
    val vh = Packing.verifyShards(halfGone, 4, expected)
    assert(vh.count() == 4L && vh.where(!col("ok")).count() >= 2L)
  }

  test("windowSegments: per-window segments tile [0, window) in stream " +
      "order, first segment starts at 0, tail window short") {
    import spark.implicits._
    // stream: doc1=7, doc2=10, doc3=4 tokens; window=10
    //   w0: doc1[0,7) + doc2[7,10)   w1: doc2[0,7)+doc3[7,10)  w2: doc3[0,1)
    val docs = Seq((1L, 7L), (2L, 10L), (3L, 4L)).toDF("doc_id", "n")
    val offsets = Packing.tokenStreamOffsets(docs, "doc_id", "n",
      window = 10L, nBuckets = 4)
    val segs = Packing.windowSegments(Packing.windowManifest(offsets, 10L))
      .orderBy("window_id", "seg_idx")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(segs == Seq(
      (0L, 1, 1L, 0L, 7L), (0L, 2, 2L, 7L, 3L),
      (1L, 1, 2L, 0L, 7L), (1L, 2, 3L, 7L, 3L),
      (2L, 1, 3L, 0L, 1L)))
    // invariants the trainer's mask builder relies on
    val byWin = segs.groupBy(_._1)
    byWin.foreach { case (_, ss) =>
      assert(ss.head._4 == 0L, "first segment starts at 0")
      // contiguity: each start = previous start + previous length
      ss.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 == a._4 + a._5)
        case _ => ()
      }
    }
    val full = byWin.filter(_._1 < 2).values
    assert(full.forall(_.map(_._5).sum == 10L), "non-tail windows tile fully")
  }

  test("windowSegments: an explicit orderCol carries manifests whose " +
      "stream order is not doc-id order (streaming layouts)") {
    import spark.implicits._
    // a window packed in ARRIVAL order 5,2,9 (mod-partitioned batch
    // layout): doc-id order would put doc2 first and assign every
    // seg_start wrong — the arrival-position column is the truth
    val manifest = Seq(
      (0L, 5L, 4L, 1L), (0L, 2L, 3L, 2L), (0L, 9L, 3L, 3L))
      .toDF("window_id", "doc_id", "tokens_in_window", "arrival_pos")
    val byArrival = Packing.windowSegments(manifest, orderCol = "arrival_pos")
      .orderBy("seg_idx")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(byArrival == Seq(
      (0L, 1, 5L, 0L, 4L), (0L, 2, 2L, 4L, 3L), (0L, 3, 9L, 7L, 3L)))
    // the default (doc-id) order on the same rows demonstrates the
    // silent-misattribution mode the contract warns about: tiling
    // still holds (it holds for ANY order), but starts move
    val byDocId = Packing.windowSegments(manifest)
      .orderBy("seg_idx").as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(byDocId.map(_._3) == Seq(2L, 5L, 9L))
    assert(byDocId != byArrival)
  }
}
