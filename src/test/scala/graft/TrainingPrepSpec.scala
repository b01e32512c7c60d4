package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingPrep

class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("shuffleShard: partition of the input, dense positions, deterministic") {
    val out = TrainingPrep.shuffleShard(ids(500), "doc_id", nShards = 8).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8))
    // positions are dense 1..|shard| within each shard
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: a second run yields the identical assignment
    val again = TrainingPrep.shuffleShard(ids(500), "doc_id", nShards = 8).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq)
    // and it actually shuffles: within-shard id order differs from pos order
    val byShard = out.groupBy(_.getInt(1)).values
    assert(byShard.exists(rows =>
      rows.sortBy(_.getLong(2)).map(_.getLong(0)).toSeq !=
        rows.map(_.getLong(0)).sorted.toSeq))
  }

  test("packSequences: integer offsets, fixed-window example ids") {
    // single shard, known order: force shard 0 and md5 order by using the
    // real operator end-to-end, then check the invariants instead of the
    // exact layout (the order is the md5 shuffle, not insertion order)
    val docs = ids(100).withColumn("n_toks", lit(10L))
    val sharded = TrainingPrep.shuffleShard(docs, "doc_id", nShards = 4)
    val packed = TrainingPrep.packSequences(sharded, "doc_id", "n_toks", "shard", seqLen = 64)
      .select("shard", "pos", "start_offset", "example_id").collect()
    packed.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_.getLong(1))
      // offsets are the exact running token count: pos k -> (k-1)*10
      inOrder.foreach(r => assert(r.getLong(2) == (r.getLong(1) - 1) * 10))
      // example_id is the start_offset window index
      inOrder.foreach(r => assert(r.getLong(3) == r.getLong(2) / 64))
    }
  }

  test("mixtureSample: weight bounds, determinism, approximate rate") {
    val df = ids(1000)
    val all = TrainingPrep.mixtureSample(df, "doc_id", lit(1.0))
    assert(all.where(!col("sampled")).count() == 0)
    val none = TrainingPrep.mixtureSample(df, "doc_id", lit(0.0))
    assert(none.where(col("sampled")).count() == 0)
    val half = TrainingPrep.mixtureSample(df, "doc_id", lit(0.5))
    val kept = half.where(col("sampled")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.size > 400 && kept.size < 600) // uniform hash, n=1000
    val keptAgain = TrainingPrep.mixtureSample(df, "doc_id", lit(0.5))
      .where(col("sampled")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == keptAgain)
  }

  test("mixtureRepeat: integer weights repeat exactly; fractional part matches mixtureSample") {
    val df = ids(1000)
    // integer weight: every row exactly w copies, copy = 0..w-1
    val twice = TrainingPrep.mixtureRepeat(df, "doc_id", lit(2.0))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"),
        min(col("copy")).as("lo"), max(col("copy")).as("hi"))
      .collect()
    assert(twice.length == 1000)
    twice.foreach(r => assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getLong(3) == 1L))
    // weight 0 emits nothing; weight in (0,1) = mixtureSample's keep set
    assert(TrainingPrep.mixtureRepeat(df, "doc_id", lit(0.0)).count() == 0)
    val repeatKept = TrainingPrep.mixtureRepeat(df, "doc_id", lit(0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sampleKept = TrainingPrep.mixtureSample(df, "doc_id", lit(0.5))
      .where(col("sampled")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repeatKept == sampleKept)
    // weight 2.5: everyone gets 2, the SAME deterministic half gets 3;
    // total = 2000 + |kept@0.5|, and the 3-copy ids are exactly that set
    val mixed = TrainingPrep.mixtureRepeat(df, "doc_id", lit(2.5))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mixed.values.forall(n => n == 2L || n == 3L))
    assert(mixed.filter(_._2 == 3L).keySet == sampleKept)
    // partitioning-invariant (hash of id, not row position)
    val repart = TrainingPrep.mixtureRepeat(df.repartition(7), "doc_id", lit(2.5))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repart == mixed)
  }

  test("lengthBuckets: power-of-two buckets, exact padding fractions, empty doc in bucket 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"),                                // 1 tok  -> bucket 0, cap 1
      (2L, ""),                                 // split("") = 1 empty tok -> bucket 0
      (3L, (1 to 3).map(_ => "t").mkString(" ")),  // 3 -> bucket 2, cap 4
      (4L, (1 to 4).map(_ => "t").mkString(" ")),  // 4 -> bucket 2 (log2 exact)
      (5L, (1 to 5).map(_ => "t").mkString(" ")))  // 5 -> bucket 3, cap 8
      .toDF("doc_id", "text")
    val out = TrainingPrep.lengthBuckets(docs, "text")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.keySet == Set(0, 2, 3))
    assert(out(0) == ((2L, 2L, 1L, 1L, 0.0)))           // two 1-token docs, no padding
    assert(out(2) == ((2L, 7L, 4L, 4L, 1.0 - 7.0 / 8))) // 3+4 toks in 2x cap-4 slots
    assert(out(3) == ((1L, 5L, 5L, 8L, 1.0 - 5.0 / 8)))
  }

  test("lengthBuckets formula: integral bit-width == ceil(log2) at every power of two") {
    import spark.implicits._
    // the reason the bucket is length(bin(n-1)) and not ceil(log2(n)):
    // Java's ln(x)/ln(2) rounds ABOVE the exact integer at some powers of
    // two (log2(2^29) = 29.000000000000004), which would flip ceil a whole
    // bucket. Check the integral formula against exact BigInt math at
    // every n in [1, 1025] and at the exact powers 2^k for k <= 62 —
    // counts far beyond any synthesizable text.
    val ns = (1L to 1025L) ++ (1 to 62).map(k => 1L << k)
    val got = ns.toDF("n")
      .select(col("n"),
        when(col("n") <= 1L, 0)
          .otherwise(length(bin(col("n") - 1L))).cast("int").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def ceilLog2(n: Long): Int = if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    for (n <- ns)
      assert(got(n) == ceilLog2(n), s"n=$n: got ${got(n)}, want ${ceilLog2(n)}")
  }

  test("buildVocab + tokenizeToIds: df-ranked dense ids, OOV -> unk, position order preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat"),
      (3L, "the cat ran rare1")).toDF("doc_id", "text")
    // df: the=3, cat=2, sat=2, dog=1, ran=1, rare1=1 → ids by (df desc, tok):
    // the=1, cat=2, sat=3, dog=4, ran=5, rare1=6
    val vocab = TrainingPrep.buildVocab(docs, "text", size = 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(vocab == Map("the" -> 1L, "cat" -> 2L, "sat" -> 3L, "dog" -> 4L))
    val out = TrainingPrep.tokenizeToIds(docs, "doc_id", "text",
      TrainingPrep.buildVocab(docs, "text", size = 4))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2).toSeq)).toMap
    assert(out(1L) == ((3L, Seq(1L, 2L, 3L))))
    assert(out(2L) == ((3L, Seq(1L, 4L, 3L))))
    assert(out(3L) == ((4L, Seq(1L, 2L, 0L, 0L)))) // ran + rare1 are OOV at size=4
  }

  test("curriculum: quartile stages are balanced and ordered by score; boundary stays low") {
    import spark.implicits._
    // scores 1..100: quartile thresholds 25.75/50.5/75.25 → 4 stages of 25
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val out = TrainingPrep.curriculum(df, "score", nStages = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert((1 to 100).forall(i => out(i.toLong) == 1 + (i - 1) / 25))
    // every doc in a lower stage scores <= every doc in a higher one
    assert(out.groupBy(_._2).view.mapValues(_.keys.max).toMap
      .toSeq.sortBy(_._1).map(_._2) == Seq(25L, 50L, 75L, 100L))
    // nStages=1 degenerates to a single stage, no percentile agg
    val one = TrainingPrep.curriculum(df, "score", nStages = 1)
    assert(one.select("stage").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("chunkDocuments: stride windows with overlap, no token dropped, short doc = one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map("w" + _).mkString(" ")), // 10 tokens
      (2L, "a b"),                                 // shorter than one chunk
      (3L, "")                                     // split("") = [""]
    ).toDF("doc_id", "text")
    val out = TrainingPrep.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,2,4,6,8 → 5 chunks; consecutive chunks share 2 tokens
    assert(d1.map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10", "w9 w10"))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 4L, 2L))
    // every source token appears in some chunk (no token dropped)
    assert((1 to 10).forall(i => d1.exists(_._3.split(" ").contains("w" + i))))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b", 2L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "", 1L)))
  }

  test("chunkDocuments reassembly law: dropping each chunk's overlap prefix reconstructs the doc") {
    val rng = new scala.util.Random(42)
    val docs = (1L to 20L).map(i =>
      (i, Seq.fill(1 + rng.nextInt(40))("t" + rng.nextInt(100)).mkString(" ")))
      .toDF("doc_id", "text")
    val chunkTokens = 7; val overlap = 3
    val chunks = TrainingPrep.chunkDocuments(docs, "doc_id", "text", chunkTokens, overlap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2).map(_._3).toSeq }
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val rebuilt = chunks(id).zipWithIndex.flatMap { case (c, i) =>
        val toks = c.split(" ").toSeq
        if (i == 0) toks else toks.drop(overlap)
      }.mkString(" ")
      assert(rebuilt == text, s"doc $id not reconstructed")
    }
  }

  test("hashSplit: exhaustive, deterministic, approximately proportioned, bad fractions rejected") {
    val df = (0L until 1000L).toDF("id")
    val out = TrainingPrep.hashSplit(df, "id", "s", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 1000 && out.values.toSet == Set("train", "val", "test"))
    val n = out.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(n("train") > 700 && n("train") < 900, s"train ${n("train")}")
    assert(n("val") > 50 && n("val") < 160 && n("test") > 50 && n("test") < 160, n.toString)
    // membership is a pure function of the id — partitioning can't move a doc
    val again = TrainingPrep.hashSplit(df.repartition(13), "id", "s",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
    intercept[IllegalArgumentException](
      TrainingPrep.hashSplit(df, "id", "s", Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("groupQuota: caps each group, equals the window formulation, partition-invariant") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val out = TrainingPrep.groupQuota(df, "id", "grp", quota = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.size == 15)
    assert(out.groupBy(_._2).forall(_._2.size == 5))
    // selection is exactly the window row_number <= quota formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(md5(col("id").cast("string")), col("id"))
    val expect = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == expect)
    // partition layout must not change the kept set
    val again = TrainingPrep.groupQuota(df.repartition(7), "id", "grp", quota = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out)
    // quota >= group size keeps every row
    val all = TrainingPrep.groupQuota(df, "id", "grp", quota = 50)
    assert(all.count() == 100)
  }

  test("sentences: terminator variety, trailing clause kept, abbreviation tradeoff pinned") {
    import spark.implicits._
    def seg(s: String): Seq[String] =
      Seq(Tuple1(s)).toDF("t")
        .select(graft.text.TextAnalysis.sentences(col("t")).as("ss"))
        .collect().head.getSeq[String](0)
    assert(seg("One two. Three four! Five six? trailing clause") ==
      Seq("One two.", "Three four!", "Five six?", "trailing clause"))
    // consecutive terminators ride with the preceding sentence
    assert(seg("Wait... what?! ok") == Seq("Wait...", "what?!", "ok"))
    // the documented rule-free tradeoff: abbreviations split
    assert(seg("Dr. Smith left.") == Seq("Dr.", "Smith left."))
    assert(seg("") == Seq.empty)
    assert(seg("   ") == Seq.empty)
  }

  test("sentenceChunks: boundaries between sentences, cumulative-threshold assignment, order kept") {
    import spark.implicits._
    // sentences of 10 chars each ("aaaaaaaaa." etc): with maxChars 25,
    // cum_before = 0,10,20,30,40 -> chunks 0,0,0,1,1
    val text = (1 to 5).map(i => ("x" * 9) + ".").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = TrainingPrep.sentenceChunks(df, "doc_id", "text", maxChars = 25)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L)._1 == 3L && out(1L)._1 == 2L)
    assert(out(0L)._2 == Seq.fill(3)(("x" * 9) + ".").mkString(" "))
    assert(out(1L)._2 == Seq.fill(2)(("x" * 9) + ".").mkString(" "))
    // a sentence longer than maxChars still lands whole in one chunk
    val long = Seq((2L, ("y" * 80) + ". short one.")).toDF("doc_id", "text")
    val lo = TrainingPrep.sentenceChunks(long, "doc_id", "text", maxChars = 25)
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(lo(0L) == ("y" * 80) + ".")
    assert(lo(3L) == "short one.") // cum_before 81 -> chunk 3
    // empty text -> no rows
    assert(TrainingPrep.sentenceChunks(
      Seq((3L, "")).toDF("doc_id", "text"), "doc_id", "text", 25).count() == 0)
  }

  test("temperatureWeights: T=1 is the natural mixture; T>1 flattens toward uniform") {
    import spark.implicits._
    // skewed corpus: 8 'en', 2 'de', 1 'fr'
    val docs = (Seq.fill(8)("en") ++ Seq.fill(2)("de") ++ Seq("fr"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    def weights(t: Double): Map[String, (Long, Double, Double, Double)] =
      TrainingPrep.temperatureWeights(docs, "lang", t).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val t1 = weights(1.0)
    for ((_, (_, p, q, w)) <- t1) {
      assert(math.abs(q - p) < 1e-9, s"T=1 must keep natural shares: $q vs $p")
      assert(math.abs(w - 1.0) < 1e-9, s"T=1 sample weight must be 1, got $w")
    }
    val t2 = weights(2.0)
    // shares move toward uniform but keep their order
    assert(t2("en")._3 < t1("en")._3 && t2("fr")._3 > t1("fr")._3)
    assert(t2("en")._3 > t2("de")._3 && t2("de")._3 > t2("fr")._3)
    // target shares normalize; expected output mass = q * total
    assert(math.abs(t2.values.map(_._3).sum - 1.0) < 1e-8)
    assert(math.abs(t2.values.map { case (n, _, _, w) => n * w }.sum - 11.0) < 1e-6)
    // minority sources upsample, majority downsample
    assert(t2("fr")._4 > 1.0 && t2("en")._4 < 1.0)
  }

  test("fimTransform: PSM re-serialization is lossless against the surfaced cuts") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc $i " + ("abcdefghij" * (i % 4).toInt)))
      .toDF("doc_id", "text")
    val out = TrainingPrep.fimTransform(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getString(5)))
    assert(out.length == 40)
    val applied = out.filter(_._3)
    assert(applied.nonEmpty && applied.length < 40, "rate 1/2 must split the corpus")
    for ((_, text, _, lo, hi, fim) <- applied) {
      assert(0 <= lo && lo <= hi && hi <= text.length)
      val (p, m, s2) = (text.substring(0, lo.toInt),
        text.substring(lo.toInt, hi.toInt), text.substring(hi.toInt))
      assert(fim == s"<PRE>$p<SUF>$s2<MID>$m")
    }
    for ((_, text, applied2, lo, hi, fim) <- out if !applied2) {
      assert(fim == text && lo == -1L && hi == -1L)
    }
  }

  test("fimTransform: deterministic across invocations; empty text survives") {
    import spark.implicits._
    val docs = Seq((7L, ""), (8L, "x")).toDF("doc_id", "text")
    val a = TrainingPrep.fimTransform(docs, "doc_id", "text", rateDenom = 1)
      .collect().map(_.toSeq).toSet
    val b = TrainingPrep.fimTransform(docs, "doc_id", "text", rateDenom = 1)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // empty doc under FIM: all three segments empty, sentinels remain
    val empty = TrainingPrep.fimTransform(docs.where($"doc_id" === 7), "doc_id", "text",
      rateDenom = 1).select("fim_text").head().getString(0)
    assert(empty == "<PRE><SUF><MID>")
  }

  test("packBoundaries: segments tile each example exactly, cross-boundary docs split") {
    import spark.implicits._
    // one shard, force a known order via a constant-shard column and ids
    // whose md5 order we recompute locally
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 500L), (4L, 0L)).toDF("doc_id", "n_toks")
      .withColumn("shard", lit(0))
    val segs = TrainingPrep.packBoundaries(docs, "doc_id", "n_toks", "shard", seqLen = 512)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // zero-token doc contributes nothing
    assert(!segs.exists(_._2 == 4L))
    // total segment length == total tokens
    assert(segs.map(s => s._4 - s._3).sum == 1100L)
    // segments within an example never overlap and tile from sorted starts
    for ((eid, group) <- segs.groupBy(_._1)) {
      val sorted = group.sortBy(_._3)
      if (sorted.size > 1)
        for (w <- sorted.sliding(2))
          assert(w(0)._4 == w(1)._3, s"gap/overlap in example $eid: ${sorted.toSeq}")
      assert(sorted.forall(s => s._3 >= 0 && s._4 <= 512))
    }
    // every doc's segments concatenate to its full length
    val perDoc = segs.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum)
    assert(perDoc(1L) == 300L && perDoc(2L) == 300L && perDoc(3L) == 500L)
  }

  test("renderChatTemplate: offsets land on assistant content; malformed turns degrade") {
    import spark.implicits._
    val turns = Seq((1L,
      Seq(("user", "hi there"), ("assistant", "hello"), ("user", ""), ("assistant", "bye"))))
      .toDF("conv_id", "raw")
      .select($"conv_id", transform($"raw", t =>
        struct(t.getField("_1").as("role"), t.getField("_2").as("content"))).as("turns"))
    val r = TrainingPrep.renderChatTemplate(turns, "turns")
      .select("chat_text", "n_turns", "mask_spans").head()
    val text = r.getString(0)
    assert(r.getInt(1) == 4)
    val spans = r.getSeq[org.apache.spark.sql.Row](2).map(s => (s.getLong(0), s.getLong(1)))
    assert(spans.length == 2)
    // the spans must slice exactly the assistant contents out of the text
    assert(spans.map { case (s, e) => text.substring(s.toInt, e.toInt) } == Seq("hello", "bye"))
    assert(text ==
      "<|user|>\nhi there<|end|>\n<|assistant|>\nhello<|end|>\n" +
      "<|user|>\n<|end|>\n<|assistant|>\nbye<|end|>\n")
    // empty conversation: empty text, no spans; null role/content render empty
    val weird = Seq(1).toDF("x").select(
      array().cast("array<struct<role:string,content:string>>").as("turns"))
    val w = TrainingPrep.renderChatTemplate(weird, "turns")
      .select("chat_text", "n_turns", "mask_spans").head()
    assert(w.getString(0) == "" && w.getInt(1) == 0 && w.getSeq[Any](2).isEmpty)
    val nullTurn = Seq(1).toDF("x").select(
      array(struct(lit(null).cast("string").as("role"),
        lit(null).cast("string").as("content"))).as("turns"))
    assert(TrainingPrep.renderChatTemplate(nullTurn, "turns")
      .select("chat_text").head().getString(0) == "<||>\n<|end|>\n")
  }

  test("renderChatTemplate: mask_spans are CODE-POINT offsets (astral-plane pin)") {
    import spark.implicits._
    // "😀" (U+1F600) is 1 code point but 2 UTF-16 units: a span after it
    // only lands on the assistant content when sliced by code points
    val turns = Seq((1L,
      Seq(("user", "hi 😀 there"), ("assistant", "ok 🚀"), ("assistant", "bye"))))
      .toDF("conv_id", "raw")
      .select($"conv_id", transform($"raw", t =>
        struct(t.getField("_1").as("role"), t.getField("_2").as("content"))).as("turns"))
    val r = TrainingPrep.renderChatTemplate(turns, "turns")
      .select("chat_text", "mask_spans").head()
    val text = r.getString(0)
    val spans = r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getLong(1)))
    def sliceCp(t: String, s: Long, e: Long): String = {
      val from = t.offsetByCodePoints(0, s.toInt)
      t.substring(from, t.offsetByCodePoints(from, (e - s).toInt))
    }
    assert(spans.map { case (s, e) => sliceCp(text, s, e) } == Seq("ok 🚀", "bye"))
    // and the naive UTF-16 slice is demonstrably WRONG for the later span
    val (s2, e2) = spans(1)
    assert(text.substring(s2.toInt, e2.toInt) != "bye")
  }

  test("renderChatTemplate: mask_spans_bytes slice the raw UTF-8 encoding (byte consumer pin)") {
    import spark.implicits._
    // the unit most training stacks actually slice: raw UTF-8 bytes.
    // "😀"/"🚀" are 4 bytes, "é" is 2 — all three span kinds (1-, 2-,
    // 4-byte code points) appear before and inside assistant content
    val turns = Seq((1L,
      Seq(("user", "hi 😀 é there"), ("assistant", "ok 🚀é"), ("assistant", "bye"))))
      .toDF("conv_id", "raw")
      .select($"conv_id", transform($"raw", t =>
        struct(t.getField("_1").as("role"), t.getField("_2").as("content"))).as("turns"))
    val r = TrainingPrep.renderChatTemplate(turns, "turns")
      .select("chat_text", "mask_spans_bytes").head()
    val bytes = r.getString(0).getBytes("UTF-8")
    val bspans = r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getLong(1)))
    val sliced = bspans.map { case (s, e) =>
      new String(java.util.Arrays.copyOfRange(bytes, s.toInt, e.toInt), "UTF-8")
    }
    assert(sliced == Seq("ok 🚀é", "bye"))
  }

  test("weightedSample: exact A-ES selection vs local replication; heavy weights dominate") {
    import spark.implicits._
    val rows = for (g <- 0 until 50; i <- 0 until 20) yield {
      val id = g * 100L + i
      (id, if (i == 0) 1000.0 else 1.0, s"g$g") // one heavy item per group
    }
    val df = rows.toDF("id", "w", "grp")
    val got = TrainingPrep.weightedSample(df, "id", "w", "grp", n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // local replication of the exact key arithmetic
    def key(id: Long, w: Double): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val v = java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
      val u = (v.toDouble + 1.0) / 4294967297.0
      BigDecimal(-math.log(u) / w).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = rows.groupBy(_._3).flatMap { case (g, rs) =>
      rs.map { case (id, w, _) => (key(id, w), id) }.sorted.take(3)
        .zipWithIndex.map { case ((_, id), i) => (g, id, i + 1) }
    }.toSet
    assert(got.toSet == want)
    assert(got.count(_._3 == 1) == 50 && got.length == 150)
    // the 1000x-weighted item should win nearly every group's first draw
    val heavyFirst = got.count { case (_, id, rk) => rk == 1 && id % 100 == 0 }
    assert(heavyFirst >= 45, s"heavy item ranked first in only $heavyFirst/50 groups")
    // n > group size degrades to the whole group
    val all = TrainingPrep.weightedSample(df.where($"grp" === "g0"), "id", "w", "grp", n = 99)
    assert(all.count() == 20)
    // null ids and non-positive weights are excluded, not thrown on
    val dirty = Seq((Some(1L), 1.0, "g"), (None, 1.0, "g"), (Some(2L), 0.0, "g"),
      (Some(3L), -1.0, "g")).toDF("id", "w", "grp")
    assert(TrainingPrep.weightedSample(dirty, "id", "w", "grp", n = 9)
      .select("id").as[Long].collect().toSet == Set(1L))
  }
}
