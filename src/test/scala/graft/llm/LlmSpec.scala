package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavioral tests over the driver-shipped sf0.001 tables: planted-pair
  * recovery, determinism, and agreement between the batched (mapPartitions)
  * multimodal decode path and its column-level mirror. */
class LlmSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("minhash LSH finds planted near-dup pairs, all with high jaccard, no all-pairs") {
    val pairs = Dedup.nearDupPairs(Tables.documents(spark, d), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length >= 20, s"expected ~25 planted pairs, got ${pairs.length}")
    assert(pairs.forall(_._3 >= 0.5))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("bigram LM: hand-computed add-half NLL on a tiny corpus; short docs omitted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams (a,b)×2, (b,a)×1
      (2L, "a b c"),   // (a,b), (b,c)
      (3L, "solo"))    // one word: no bigrams, omitted
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramNll(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // model: c(a,b)=3, c(b,a)=1, c(b,c)=1; heads: c(a)=3, c(b)=2; V=2 heads
    def term(c12: Long, c1: Long): Long =
      math.floor(-math.log((c12 + 0.5) / (c1 + 0.5 * 2)) * 1e6 + 0.5).toLong
    val (tAB, tBA, tBC) = (term(3, 3), term(1, 2), term(1, 2))
    assert(got === Array(
      (1L, 3L, (2 * tAB + tBA) / 3),
      (2L, 2L, (tAB + tBC) / 2)))
  }

  test("semantic dedup: within-cell near-dups collapse to the min id; distinct " +
    "vectors and cross-cell pairs are kept") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1f, 0f)),        // centroid; near-dup group head
      (1L, Seq(0.99f, 0.1f)),   // near 0
      (2L, Seq(0f, 1f)),        // centroid; second group head
      (3L, Seq(0.05f, 0.99f)),  // near 2
      (4L, Seq(-1f, 0f)),       // centroid; singleton
      (5L, Seq(0.98f, 0.05f)))  // near 0
      .toDF("id", "vec")
    val got = Similarity.semanticDedup(vecs, tau = 0.9, centroidStride = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cells (centroids = ids 0,2,4): {0,1,5} → 0, {2,3} → 2, {4} → 4;
    // pairs ≥ 0.9 within cells: (0,1),(0,5),(1,5),(2,3)
    assert(got === Array(
      (0L, 0L, 1L, 3L), (1L, 0L, 0L, 3L), (2L, 2L, 1L, 2L),
      (3L, 2L, 0L, 2L), (4L, 4L, 1L, 1L), (5L, 0L, 0L, 3L)))
  }

  test("IVF centroidCount contract: derived stride is deterministic and " +
    "reproduces the explicit-stride cells exactly") {
    val all = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = all.filter(col("id") % 100 === 0)
    val maxId = all.agg(max(col("id"))).head().getLong(0)
    // a count chosen so the derived stride lands EXACTLY on the explicit one:
    // stride = (maxId+1)/count = 10 — same centroid set, same cells, same ranks
    val count = (maxId + 1) / 10
    def run(centroidCount: Option[Long]) =
      Similarity.ivfTopK(q, all, k = 3, centroidStride = 10, nProbe = 2,
        centroidCount = centroidCount)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    val byCount1 = run(Some(count))
    val byCount2 = run(Some(count))
    assert(byCount1 === byCount2, "derived stride must be deterministic")
    assert(byCount1 === run(None),
      "count-derived stride must reproduce the explicit-stride result")
  }

  test("semantic dedup hot-cell cap: salting bounds per-task pair work " +
    "without changing the pair set or the dedup result") {
    import spark.implicits._
    // one pathological cell: 60 near-identical vectors (web boilerplate
    // collapsing into a single centroid cell) + a second normal cell
    val hot = (0L until 60L).map(i => (i, Seq(1f, i.toFloat * 1e-4f)))
    val other = Seq((100L, Seq(0f, 1f)), (101L, Seq(0.02f, 0.99f)))
    val vecs = (hot ++ other).toDF("id", "vec")
    def pairsWith(cap: Long): Seq[(Long, Long)] =
      Similarity.semanticPairs(vecs, tau = 0.95, centroidStride = 50,
        hotCellCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val salted = pairsWith(8L)        // 60-row cell → 8 salt buckets
    val unsalted = pairsWith(1L << 30) // effectively unsalted
    assert(salted === unsalted, "salting must not change the pair set")
    assert(salted.nonEmpty && salted.forall(p => p._1 < p._2))
    // dedup result identical too (keep_id/cluster assignments ride the pairs)
    def dedupWith(cap: Long) =
      Similarity.semanticDedup(vecs, tau = 0.95, centroidStride = 50,
        hotCellCap = cap)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(dedupWith(8L) === dedupWith(1L << 30))
  }

  test("repeated n-gram spans: planted boilerplate found and merged, unique text untouched") {
    import spark.implicits._
    val footer = (1 to 20).map(i => s"foot$i").mkString(" ") // 20-word shared footer
    val docs = Seq(
      (1L, s"alpha bravo charlie delta echo foxtrot golf hotel india juliett $footer"),
      (2L, s"kilo lima mike november oscar papa quebec romeo sierra tango $footer"),
      (3L, s"$footer uniform victor whiskey xray yankee zulu one two three four"),
      (4L, "unique unrepeated words only nothing shared here at all today friend"))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedNgramSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(s => (s._1, s._2))
    // each of docs 1-3 gets EXACTLY ONE merged span covering the footer's
    // words; doc 4 (all unique) gets none
    assert(spans.map(_._1).toSeq === Seq(1L, 2L, 3L), s"spans: ${spans.toSeq}")
    assert(spans.filter(_._1 == 1L).toSeq === Seq((1L, 10L, 30L)), s"${spans.toSeq}")
    assert(spans.filter(_._1 == 2L).toSeq === Seq((2L, 10L, 30L)))
    // doc 3's footer is at the START; its 8-grams bleed into the suffix by
    // up to n-1 words of context — the span still STARTS at word 0 and the
    // flagged-gram window ends inside the unique tail
    val s3 = spans.filter(_._1 == 3L).head
    assert(s3._2 === 0L && s3._3 === 20L, s"doc 3 span: $s3")

    // the removal half: spans applied back to the text
    val cleaned = Dedup.removeSpans(docs,
        Dedup.repeatedNgramSpans(docs, "doc_id", "text", n = 8, minDocs = 2),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(cleaned.map(c => (c._1, c._2, c._3)) ===
      Seq((1L, 30L, 20L), (2L, 30L, 20L), (3L, 30L, 20L), (4L, 11L, 0L)))
    assert(cleaned(0)._4 === "alpha bravo charlie delta echo foxtrot golf hotel india juliett")
    assert(cleaned(2)._4 === "uniform victor whiskey xray yankee zulu one two three four")
    assert(cleaned(3)._4 === "unique unrepeated words only nothing shared here at all today friend",
      "span-free documents pass through")
  }

  test("prefix-filtered jaccard join equals brute force (lossless recall)") {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val exact = Dedup.jaccardJoin(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // Brute force on the full sf0.001 set (oracle-scale only).
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jac",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("jac") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"), col("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(exact.nonEmpty, "planted pairs must be found")
    assert(exact.toSeq === brute.toSeq,
      "prefix filtering must be lossless: identical pair set to all-pairs")
    // And it must subsume the probabilistic MinHash pairs.
    val mh = Dedup.nearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact.map(p => (p._1, p._2)).toSet))
  }

  test("containment join equals brute force (lossless, directed) and finds " +
    "subsumed docs that jaccard cannot") {
    import spark.implicits._
    val corpus = Tables.documents(spark, d)
    // plant a strict subset: a small doc whose text is a slice of a big one
    val big = corpus.orderBy(desc("n_chars")).select("text").head().getString(0)
    val slice = big.split(" ").slice(5, 17).mkString(" ") // 12 words ⊂ big
    val docs = corpus.select("doc_id", "text")
      .union(Seq((900001L, slice)).toDF("doc_id", "text"))
    val exact = Dedup.containmentJoin(docs, "doc_id", "text",
        n = 3, thresholdMicros = 600000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2))
    // Brute force on the full sf0.001 set (oracle-scale only): DIRECTED
    // pairs, string shingles (containment is hash-invariant, like jaccard).
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") =!= col("b.doc_id"))
      .withColumn("ov", size(array_intersect(col("a.sh"), col("b.sh"))).cast("long"))
      .filter(col("ov") * lit(1000000L) >= lit(600000L) * size(col("a.sh")))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("ov * 1000000L div size(a.sh)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2))
    assert(exact.nonEmpty)
    assert(exact.toSeq === brute.toSeq,
      "probe-side prefix filtering must be lossless vs directed all-pairs")
    // the planted subset: found as subset→superset, never the reverse, and
    // invisible to the symmetric jaccard join at the same bar
    val fromSlice = exact.filter(_._1 == 900001L)
    assert(fromSlice.exists(_._3 == 1000000L),
      s"planted slice must be fully contained in its source: $fromSlice")
    assert(!exact.exists(p => p._2 == 900001L && p._3 >= 900000L),
      "the big doc is NOT contained in its 12-word slice")
    val jac = Dedup.jaccardJoin(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((900001L, fromSlice.head._2)) &&
      !jac.exists(p => p._1 == 900001L || p._2 == 900001L),
      "the subsumed doc is exactly what a jaccard threshold cannot see")
  }

  test("simhash pairs ⊇ high-jaccard minhash pairs (shingle-token simhash)") {
    val mh = Dedup.nearDupPairs(Tables.documents(spark, d), "doc_id", "text", threshold = 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashPairs(Tables.documents(spark, d), "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = mh -- sh
    assert(missed.size <= mh.size / 4, s"simhash missed too many: $missed")
  }

  test("exact dedup groups: members sorted, keep_id is the minimum") {
    val g = Dedup.exactDupGroups(Tables.documents(spark, d), "doc_id",
      md5(substring(col("text"), 1, 32))).collect()
    g.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      assert(members.sorted.toSeq === members.toSeq)
      assert(members.min === r.getAs[Long]("keep_id"))
      assert(members.length === r.getAs[Long]("n_dups"))
    }
  }

  test("LSH ANN is deterministic and rank-consistent with exact cosine") {
    // NOTE on recall: this synthetic embedding table is near-random (measured
    // nearest-neighbor cosine ≈ 0.35, no label clustering), where ANY
    // cosine-LSH has low rank-1 recall by the arccos law — so this test checks
    // correctness properties (determinism; candidates ranked by true cosine;
    // valid dense ranks), not recall against brute force.
    val all = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = all.filter(col("id") % 100 === 0)
    val run1 = Similarity.lshTopK(q, all, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val run2 = Similarity.lshTopK(q, all, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(run1.nonEmpty)
    assert(run1.toSeq === run2.toSeq, "LSH must be deterministic across runs")
    run1.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq, s"dense ranks for $qid")
    }
    // Within each query, LSH's reported order agrees with exact cosine order.
    val brute = Similarity.bruteForceTopK(q, all, 1000).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap // (q, neighbor) -> exact rank
    run1.groupBy(_._1).foreach { case (qid, rows) =>
      val exactRanks = rows.sortBy(_._2).map(r => brute((qid, r._3)))
      assert(exactRanks.toSeq === exactRanks.sorted.toSeq,
        s"LSH order for $qid must follow exact cosine order")
    }
  }

  test("IVF ANN: one cell per vector, deterministic, rank order = exact cosine") {
    val all = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = all.filter(col("id") % 100 === 0)
    val r1 = Similarity.ivfTopK(q, all, k = 3, centroidStride = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val r2 = Similarity.ivfTopK(q, all, k = 3, centroidStride = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(r1.toSeq === r2.toSeq, "deterministic cells and ranks")
    assert(r1.nonEmpty)
    // Within each query, ranks are dense from 1 and neighbors are distinct
    // (IVF partitions the corpus - a candidate can meet a query only once).
    r1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length))
      assert(rows.map(_._3).distinct.length === rows.length)
    }
    // IVF's neighbor ordering agrees with exact cosine: every returned
    // neighbor pair (rank i < rank j) must also be ordered that way by the
    // brute-force scores.
    val exact = Similarity.bruteForceTopK(q, all, k = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    r1.groupBy(_._1).foreach { case (qid, rows) =>
      val exactRanks = rows.sortBy(_._2).map(r => exact((qid, r._3)))
      assert(exactRanks.toSeq === exactRanks.sorted.toSeq,
        s"query $qid: IVF rank order must follow exact-cosine order")
    }
  }

  test("batched multimodal decode equals its column-level mirror") {
    val docs = Tables.documents(spark, d).limit(50)
    val media = docs.select(col("doc_id").as("id"), col("text").cast("binary").as("content"))
    val batched = Multimodal.decodeBatched(media, () => new Multimodal.StubDecoder)
      .collect().map(f => f.id -> ((f.width, f.height, f.nBytes, f.frames.mkString(",")))).toMap
    val mirror = docs.select(col("doc_id"),
        Multimodal.fakeWidth(col("text")).as("w"), Multimodal.fakeHeight(col("text")).as("h"),
        octet_length(col("text")).cast("long").as("nb"),
        concat_ws(",", Multimodal.frameSample(col("text"))).as("fr"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))).toMap
    assert(batched === mirror)
  }

  test("perceptual hash: hand-computed bits on a crafted payload; equal media ⇒ equal hash") {
    import spark.implicits._
    // content = bytes 0..15: grid is the identity, psum=120 → aHash bits are
    // exactly p[j] > 7.5 ⇒ bits 8..15 (0xFF00); ascending ⇒ dHash 0; all 16
    // bytes land in histogram bin 0 (16·8 > 16 ⇒ bit 31); n=16 even ⇒ parity 0
    val media = Seq((1L, (0 until 16).map(_.toByte).toArray),
      (2L, (0 until 16).map(_.toByte).toArray), // identical media, different id
      (3L, (0 until 16).map(i => (15 - i).toByte).toArray)) // descending: dHash all 15 bits
      .toDF("id", "content")
    val t = Multimodal.transformBatched(media, () => new Multimodal.StubTransformer).toDF()
    val got = Multimodal.perceptualHash(t)
      .select("id", "phash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === (0xFF00L + (1L << 31)))
    assert(got(2L) === got(1L), "identical payload bytes must collapse to one bucket")
    // descending: aHash bits 0..7 (big values first), dHash bits 16..30 all set
    assert(got(3L) === (0xFFL + (0x7FFFL << 16) + (1L << 31)))
  }

  test("row-local fingerprint column equals the frame-level fingerprint op") {
    val docs = Tables.documents(spark, d)
    val frame = TextAnalysis.fingerprints(docs, "doc_id", "text")
      .select("doc_id", "fp").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val colwise = docs.select(col("doc_id"),
        TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(colwise === frame,
      "per-occurrence hashing must produce the same values as the dictionary path")
  }

  test("quantized ANN: deterministic, rank order = exact cosine on its shortlist") {
    val all = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val qs = all.filter(col("id") % 100 === 0)
    def run() = Similarity.quantizedTopK(qs, all, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val a = run()
    assert(a.toSeq === run().toSeq, "quantized ANN must be deterministic")
    // Every query returns exactly k ranked neighbors, ranks dense from 1.
    a.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).toSeq === (1L to 5L), s"query $q ranks: ${rows.toSeq}")
    }
    // Top-1 agreement with exact search is high even on near-random vectors:
    // the int8 approx orders by true cosine up to quantization error, and the
    // 4k shortlist re-ranks exactly. Require top-1 recall >= 80%.
    val exact = Similarity.bruteForceTopK(qs, all, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val top1 = a.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    val hits = exact.count { case (q, n) => top1.get(q).contains(n) }
    assert(hits.toDouble / exact.size >= 0.8,
      s"top-1 recall ${hits}/${exact.size} below 0.8")
  }

  test("langid + permille are deterministic and bounded") {
    val t = Tables.documents(spark, d).select(
      TextAnalysis.langId(col("text")).as("pred"),
      TextAnalysis.permille(TextAnalysis.stopwordHits(col("text"), "en"),
        TextAnalysis.wsTokens(col("text"))).as("pm"))
    val rows = t.collect()
    assert(rows.forall(r => Set("en", "de", "fr", "es").contains(r.getString(0))))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 1000))
  }

  test("incremental dedup equals the cross-side slice of full-corpus near-dup " +
    "pairs, and never pairs batch docs with each other") {
    val docs = Tables.documents(spark, d)
    val isBatch = col("doc_id") % 10 === 0
    val inc = Dedup.incrementalNearDup(docs.filter(!isBatch), docs.filter(isBatch),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(inc.forall { case (b, c, _) => b % 10 == 0 && c % 10 != 0 },
      "candidates must be strictly batch × corpus")
    // signatures depend only on the doc's own text, so the cross-side slice
    // of the full self-join must be EXACTLY the incremental result
    val full = Dedup.nearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val wantCross = full.collect {
      case (a, b, j) if a % 10 == 0 && b % 10 != 0 => (a, b, j)
      case (a, b, j) if b % 10 == 0 && a % 10 != 0 => (b, a, j)
    }
    assert(inc.toSet === wantCross.toSet)
    assert(inc.nonEmpty, "sf0.001's planted pairs should straddle the split")
  }

  test("verify-tail variants agree: the precompute-per-doc alternative " +
    "(r18 experiment, kept as the documented loser) returns exactly the " +
    "production recompute tail's verified pairs") {
    val docs = Tables.documents(spark, d)
    val isBatch = col("doc_id") % 10 === 0
    val (corpus, batch) = (docs.filter(!isBatch), docs.filter(isBatch))
    val (cand, release) = Dedup.crossCandidates(corpus, batch, "doc_id", "text")
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val rec = rows(Dedup.verifyCrossPairs(
        cand, corpus, batch, "doc_id", "text", 0.5))
      val pre = rows(Dedup.verifyCrossPairsPre(
        cand, corpus, batch, "doc_id", "text", 0.5))
      assert(rec === pre)
      assert(rec.nonEmpty, "planted pairs should verify")
    } finally release()
  }

  test("crossNll(docs, docs) is value-identical to bigramNll(docs)") {
    val docs = Tables.documents(spark, d)
    val self = LanguageModel.crossNll(docs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val base = LanguageModel.bigramNll(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(self === base)
  }

  test("crossNll backoff: unseen bigrams and unseen heads score by add-α") {
    import spark.implicits._
    // train "a b a c": model c(a,b)=1, c(b,a)=1, c(a,c)=1; heads a=2, b=1; V=2
    val train = Seq((10L, "a b a c")).toDF("doc_id", "text")
    // score "a b z a": (a,b) seen; (b,z) unseen pair, seen head b;
    // (z,a) unseen head z
    val score = Seq((1L, "a b z a")).toDF("doc_id", "text")
    val got = LanguageModel.crossNll(score, train, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def term(c12: Long, c1: Long): Long =
      math.floor(-math.log((c12 + 0.5) / (c1 + 0.5 * 2)) * 1e6 + 0.5).toLong
    val want = (term(1, 2) + term(0, 1) + term(0, 0)) / 3
    assert(got === Array((1L, 3L, want)))
  }

  test("piiScrub masks phones, IPv4s and card-shaped digit runs; 20-digit runs " +
    "and short runs pass through") {
    import spark.implicits._
    val got = Seq(
      "call +15551234567 now",
      "at 10.3.0.21 and 255.255.255.0",
      "card 4111111111111111 ok",
      "run 12345678901234567890 is 20 digits",
      "short 123456 stays",
      "mail a@b.com via https://x.io/y  z")
      .toDF("t").select(TextAnalysis.piiScrub(col("t")).as("c"))
      .collect().map(_.getString(0))
    assert(got === Array(
      "call <phone> now",
      "at <ip> and <ip>",
      "card <digits> ok",
      "run 12345678901234567890 is 20 digits",
      "short 123456 stays",
      "mail <email> via <url> z"))
  }

  test("fuzzyJoin: deletion-neighborhood candidates are LOSSLESS vs brute-force " +
    "levenshtein at k=1 and k=2; variants hand-case") {
    import spark.implicits._
    val vs = Fuzzy.deletionVariants(col("w"), 1)
    val got = Seq("abc").toDF("w").select(vs).collect().head.getSeq[String](0).sorted
    assert(got === Seq("ab", "abc", "ac", "bc"), s"variants of abc: $got")
    // seeded word soup with planted near-misses of several edit kinds
    val words = Seq("spark", "spork", "sprk", "sparkk", "shark", "sharks",
      "table", "tale", "tables", "cable", "stable", "batch", "catch", "match",
      "window", "widow", "windows", "shuffle", "shuffl", "scuffle").distinct
    val left = words.toDF("a"); val right = words.toDF("b")
    for (k <- Seq(1, 2)) {
      val fuzzy = Fuzzy.fuzzyJoin(left, "a", right, "b", maxDist = k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val brute = (for {
        x <- words; y <- words
        d = {
          val dp = Array.tabulate(x.length + 1, y.length + 1)((i, j) => i + j)
          for (i <- 1 to x.length; j <- 1 to y.length)
            dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
              dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
          dp(x.length)(y.length)
        }
        if d <= k
      } yield (x, y, d)).toSet
      assert(fuzzy === brute, s"k=$k: neighborhood join must equal brute force")
    }
  }

  test("fuzzyJoin skew guard: sub-minIndexLen strings are excluded pre-explode; " +
    "the guard bounds the hottest variant bucket") {
    import spark.implicits._
    // 40 length-1/2 strings + a few normal words; every length-1 string
    // deletes to "", so WITHOUT the guard one bucket holds them all
    val shorts = (('a' to 't').map(_.toString) ++ ('a' to 't').map(c => s"$c$c")).toSeq
    val words = shorts ++ Seq("spark", "spork", "table", "tale")
    val df = words.toDF("w")

    // default guard (minIndexLen=3): no short string appears on either side
    val guarded = Fuzzy.fuzzyJoin(df, "w", df.toDF("w"), "w", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(guarded.forall { case (a, b) => a.length >= 3 && b.length >= 3 },
      s"short strings must be excluded: ${guarded.filter(p => p._1.length < 3 || p._2.length < 3)}")
    assert(guarded.contains(("spark", "spork")) && guarded.contains(("table", "tale")))

    // bucket-size bound: max rows per variant key is small under the guard,
    // corpus-sized without it (the "" bucket alone holds every 1-char string)
    def maxBucket(minLen: Int): Long = df
      .filter(length(col("w")) >= minLen)
      .select(explode(Fuzzy.deletionVariants(col("w"), 1)).as("v"))
      .groupBy("v").count().agg(max("count")).collect().head.getLong(0)
    val unguarded = maxBucket(1)
    val bounded = maxBucket(3)
    assert(unguarded >= shorts.length / 2,
      s"fixture must exhibit the hot bucket without the guard: $unguarded")
    assert(bounded <= 4, s"guarded max variant bucket must stay O(1): $bounded")

    // lowering the floor is an explicit opt-in that restores short pairs
    val optIn = Fuzzy.fuzzyJoin(df, "w", df.toDF("w"), "w", maxDist = 1, minIndexLen = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(optIn.contains(("a", "aa")), "opt-in floor must admit short strings")
  }

  test("pageRank: exact integer iterations match a driver-side reference; " +
    "partition-independent; dangling node keeps teleport-only rank") {
    import spark.implicits._
    // 1 -> 2 -> 3 -> 1 cycle, 4 -> 1 feeder, 5 dangling (dst-only via 1 -> 5)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 5L))
    def reference(iters: Int): Map[Long, Long] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val sums = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map(e => r(e._1) / deg(e._1)).sum
        }
        r = nodes.map(n => n -> (150000L + 850000L * sums.getOrElse(n, 0L) / 1000000L)).toMap
      }
      r
    }
    for (parts <- Seq(1, 7)) {
      val got = Graph.pageRank(edges.toDF("src", "dst").repartition(parts), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === reference(3), s"parts=$parts")
    }
    // node 5 has no inlinks' contributions only FROM 1; no outlinks at all —
    // its mass leaks (documented convention), its own rank still gets 1's flow
    val r3 = reference(3)
    assert(r3(5L) > 150000L, "dst-only node receives contributions")
  }

  test("harmonicCentrality: exact shortest-distance weights on a hand fixture; " +
    "parallel edges deduped; partition-independent; self excluded") {
    import spark.implicits._
    // 1→2 (twice: parallel edge), 1→3 shortcut, 2→3, 3→4, 4→2 cycle
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 2L))
    // shortest distances (u≠v): 1→2:1, 1→3:1, 1→4:2; 2→3:1, 2→4:2;
    // 3→4:1, 3→2:2; 4→2:1, 4→3:2. Unit 1/60 ⇒ d1=60, d2=30, d3=20.
    val expect3 = Map(1L -> 0L, 2L -> 150L, 3L -> 150L, 4L -> 120L)
    for (parts <- Seq(1, 7)) {
      val got = Graph.harmonicCentrality(edges.toDF("src", "dst").repartition(parts), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect3, s"parts=$parts")
    }
    // depth 1: only direct links count — and the duplicate 1→2 counts ONCE
    val got1 = Graph.harmonicCentrality(edges.toDF("src", "dst"), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 === Map(1L -> 0L, 2L -> 120L, 3L -> 120L, 4L -> 60L))
    // the 2→3→4→2 cycle returns to its origin in 3 hops: self excluded means
    // node 2's score gains nothing from itself (150 above already proves it —
    // 60(from 1) + 60(from 4) + 30(from 3) with no +20 self term)
  }

  test("hyperBallHarmonic: error-bounded vs exact harmonic centrality; " +
    "registers partition-independent") {
    import spark.implicits._
    // deterministic quadratic-map graph, 400 nodes, out-degree ≤ 3 — big
    // enough for meaningful ball sizes, small enough for an exact reference
    val n = 400L
    val edges = (0L until n).flatMap { src =>
      Seq(7L, 13L, 31L).collect {
        case k if (src + k) % 4 != 0 && (src * src + k * src + k) % n != src =>
          (src, (src * src + k * src + k) % n)
      }
    }
    val depth = 4
    // driver-side exact reference: BFS over reversed adjacency
    val preds = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    def exactHarmonic(v: Long): Double = {
      var ball = Set(v); var frontier = Set(v); var h = 0.0
      for (d <- 1 to depth) {
        val next = frontier.flatMap(x => preds.getOrElse(x, Set.empty)) -- ball - v
        h += next.size.toDouble / d
        ball ++= next; frontier = next
      }
      h
    }
    val df = edges.toDF("src", "dst")
    val (est, release) = Graph.hyperBallHarmonicManaged(df, depth, p = 10)
    try {
      val got = est.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size === n)
      // p=10 (1024 registers) in the linear-counting regime: tight per-node
      // agreement; assert mean relative error under 5% and worst under 20%
      val errs = (0L until n).map { v =>
        val ex = exactHarmonic(v)
        if (ex == 0.0) { assert(got(v) <= 1.0, s"node $v: exact 0, est ${got(v)}"); 0.0 }
        else math.abs(got(v) - ex) / ex
      }
      assert(errs.sum / errs.size < 0.05, f"mean rel err ${errs.sum / errs.size}%.4f")
      assert(errs.max < 0.20, f"worst rel err ${errs.max}%.4f")

      // determinism: identical estimates under a different partitioning
      // (registers are exact integers; max-merge is order-free)
      val (est2, release2) = Graph.hyperBallHarmonicManaged(df.repartition(13), depth, p = 10)
      try {
        val got2 = est2.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got2 === got, "estimates must be bit-identical across partitionings")
      } finally release2()
    } finally release()
  }

  test("property: hyperBall ball estimates are error-bounded vs exact " +
    "in-ball sizes over randomized graphs, for p in {6, 8, 10}") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val depth = 3
    val caseGen = for {
      n <- Gen.chooseNum(40, 100)
      seed <- Gen.chooseNum(0L, 1000000L)
    } yield (n, seed)
    val p = Prop.forAllNoShrink(caseGen) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      // ids offset by the seed so every case draws FRESH register hashes
      // (registers are a deterministic md5 of the id — re-using ids 0..n
      // would re-use the same hash draws across all cases)
      def id(i: Int): Long = seed * 1024L + i
      val edges = (0 until n).flatMap { s =>
        (0 to rnd.nextInt(3)).map(_ => (id(s), id(rnd.nextInt(n))))
          .filter(e => e._1 != e._2)
      }.distinct
      val preds = edges.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      def exactBall(v: Long): Int = {
        var ball = Set(v); var frontier = Set(v)
        for (_ <- 1 to depth) {
          val next = frontier.flatMap(x => preds.getOrElse(x, Set.empty)) -- ball
          ball ++= next; frontier = next
        }
        ball.size
      }
      val df = edges.toDF("src", "dst")
      Seq(6, 8, 10).forall { pBits =>
        val sigma = 1.04 / math.sqrt((1 << pBits).toDouble) // HLL std err
        val (est, release) = Graph.hyperBallHarmonicManaged(df, depth, p = pBits)
        try {
          val got = est.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
          // Regression tripwires, not tight theory. Two lumps the σ theory
          // does not cover: (a) all nodes share ball CONTENTS, so their
          // errors are correlated and the mean does not concentrate like
          // sqrt(N) independent draws; (b) relative error on TINY balls is
          // quantized — ONE register collision among 4 items reads 25% —
          // so the per-node bound is absolute-or-relative:
          // |est − exact| < max(2.5, 7σ·exact). Trips on a wrong branch,
          // a biased estimator, or a rank/index regression.
          val relErrs = got.toSeq.map { case (v, e) =>
            math.abs(e - exactBall(v)) / exactBall(v) // ball ≥ 1 (self)
          }
          val meanOk = relErrs.sum / relErrs.size < 2.5 * sigma
          val worstOk = got.forall { case (v, e) =>
            math.abs(e - exactBall(v)) < math.max(2.5, 7 * sigma * exactBall(v))
          }
          if (!(meanOk && worstOk)) println(
            f"p=$pBits n=$n seed=$seed mean=${relErrs.sum / relErrs.size}%.4f " +
              f"worstRel=${relErrs.max}%.4f sigma=$sigma%.4f")
          meanOk && worstOk
        } finally release()
      }
    }
    // fixed initial seed: a deterministic sweep (the bound is statistical —
    // fresh draws per run would make the suite bar flaky by construction)
    val params = SCTest.Parameters.default.withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val r = SCTest.check(params, p)
    assert(r.passed, s"hyperBall error-bound property failed: $r")
  }

  test("pageRank dangling redistribution: mass-conserving, exact vs driver " +
    "reference; convergence certificate matches and shrinks") {
    import spark.implicits._
    // 1 -> 2 -> 3 -> 1 cycle, 4 -> 1 feeder, 5 dangling (via 1 -> 5)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 5L))
    def reference(iters: Int, redistribute: Boolean): Map[Long, Long] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val sums = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map(e => r(e._1) / deg(e._1)).sum
        }
        val share =
          if (!redistribute) 0L
          else nodes.filterNot(deg.contains).map(r).sum / nodes.size
        r = nodes.map(n =>
          n -> (150000L + 850000L * (sums.getOrElse(n, 0L) + share) / 1000000L)).toMap
      }
      r
    }
    for (parts <- Seq(1, 5)) {
      val got = Graph.pageRank(edges.toDF("src", "dst").repartition(parts), 4,
          redistributeDangling = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === reference(4, redistribute = true), s"parts=$parts")
    }
    // redistribution conserves what the leak convention loses: node 5's
    // mass returns to the graph, so total rank mass is strictly higher
    val leakTotal = reference(4, redistribute = false).values.sum
    val consTotal = reference(4, redistribute = true).values.sum
    assert(consTotal > leakTotal, s"conserving $consTotal vs leaking $leakTotal")

    // "mass-conserving" is exact UP TO integer truncation (the scaladoc
    // contract): each round's share is dangling_mass div N, so the division
    // remainder — at most N−1 micro-units per round — is dropped. Assert the
    // bound on every round of the driver reference (which the Spark result
    // above matches bit-for-bit).
    {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> 1000000L).toMap
      for (round <- 1 to 4) {
        val sums = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map(e => r(e._1) / deg(e._1)).sum
        }
        val dangling = nodes.filterNot(deg.contains).map(r).sum
        val drop = dangling - (dangling / nodes.size) * nodes.size
        assert(drop >= 0 && drop <= nodes.size - 1,
          s"round $round truncation drop $drop outside [0, N-1]")
        val share = dangling / nodes.size
        r = nodes.map(n =>
          n -> (150000L + 850000L * (sums.getOrElse(n, 0L) + share) / 1000000L)).toMap
      }
    }

    // certificate: exact vs the reference delta, and non-increasing with
    // more iterations on this convergent graph
    def cert(iters: Int): Long = {
      val (_, c, release) = Graph.pageRankCertified(edges.toDF("src", "dst"), iters)
      try c.collect().head.getLong(0) finally release()
    }
    val refDelta = { // |r4 - r3| max under the default leak convention
      val (r3, r4) = (reference(3, false), reference(4, false))
      r4.map { case (n, v) => math.abs(v - r3(n)) }.max
    }
    assert(cert(4) === refDelta, s"certificate must equal the reference delta")
    assert(cert(8) <= cert(4), "delta must not grow with iterations here")
  }

  test("pageRank mega-hub: exact below the overflow bound, LOUD raise_error above it") {
    import spark.implicits._
    // star graph: K spokes all pointing at hub 0; after one iteration the
    // hub's rank is teleport + d·K·10^6 div 10^6 = 150000 + 850000·K
    val k = 5000L
    val star = spark.range(1, k + 1).select(col("id").as("src"), lit(0L).as("dst"))
    val (ranks, release) = Graph.pageRankManaged(star, 1)
    try {
      val hub = ranks.filter(col("id") === 0L).collect().head.getLong(1)
      assert(hub === 150000L + 850000L * k, s"hub rank exact at K=$k: $hub")
    } finally release()
    // past s > 2^63/d ≈ 1.085e13 (≈10.9M unit-degree spokes at rank 10^6)
    // the d·s multiply would silently wrap; the guard must throw instead
    val big = spark.range(1, 11_000_001L).select(col("id").as("src"), lit(0L).as("dst"))
    val (ranksBig, releaseBig) = Graph.pageRankManaged(big, 1)
    try {
      val e = intercept[Exception] { ranksBig.filter(col("id") === 0L).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("pageRank 64-bit overflow")),
        s"expected the loud overflow guard, got: ${msgs(e).mkString(" | ")}")
    } finally releaseBig()
  }

  test("snapshotDiff: added/removed/identical/retouched/rewritten buckets " +
    "with exact in-row micro-Jaccard; null ids and null texts refuse") {
    import spark.implicits._
    val prev = Seq(
      (1L, "alpha beta gamma delta epsilon"), // identical in cur
      (2L, "one two three four five six"),    // retouched (one appended word)
      (3L, "totally original body of text here"), // rewritten
      (4L, "this document gets dropped")).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six seven"),
      (3L, "completely different words now appear"),
      (5L, "a brand new arrival document")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(prev, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got(1L) === (("identical", -1L)), s"$got")
    // doc 2: shingles 4 vs 5, all 4 shared -> 4/5 = 800000 >= 500000
    assert(got(2L) === (("retouched", 800000L)), s"$got")
    assert(got(3L)._1 === "rewritten" && got(3L)._2 === 0L, s"$got")
    assert(got(4L) === (("removed", -1L)) && got(5L) === (("added", -1L)), s"$got")

    val nullText = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.snapshotDiff(nullText, cur, "doc_id", "text").collect()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("snapshotDiff")), s"$ex")
    val nullId = Seq((Option.empty[Long], "x y z")).toDF("doc_id", "text")
    val ex2 = intercept[Exception] {
      Dedup.snapshotDiff(nullId, cur, "doc_id", "text").collect()
    }
    assert(Iterator.iterate(ex2: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("null doc_id")), s"$ex2")
  }

  test("snapshotDiff property: statuses and micro-Jaccard match a " +
    "driver-side string-shingle oracle over random snapshot pairs") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def shingleSet(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ", -1)
      if (w.length >= 3) (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      else Set.empty
    }
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val text = Gen.chooseNum(1, 10).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val caseGen = for {
      na <- Gen.chooseNum(1, 8); nb <- Gen.chooseNum(1, 8)
      ta <- Gen.listOfN(na, text); tb <- Gen.listOfN(nb, text)
    } yield (ta.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      tb.zipWithIndex.map { case (t, i) => ((i + 3).toLong, t) })
    val p = Prop.forAllNoShrink(caseGen) { case (prev, cur) =>
      val got = Dedup.snapshotDiff(prev.toDF("doc_id", "text"),
          cur.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
      val pm = prev.toMap; val cm = cur.toMap
      val want = (pm.keySet ++ cm.keySet).map { id =>
        id -> ((pm.get(id), cm.get(id)) match {
          case (None, Some(_)) => ("added", -1L)
          case (Some(_), None) => ("removed", -1L)
          case (Some(a), Some(b)) if a == b => ("identical", -1L)
          case (Some(a), Some(b)) =>
            val (sa, sb) = (shingleSet(a), shingleSet(b))
            val uni = (sa ++ sb).size
            val jac = if (uni > 0) 1000000L * (sa & sb).size / uni else 1000000L
            (if (jac >= 500000L) "retouched" else "rewritten", jac)
          case _ => ("impossible", -2L)
        })
      }.toMap
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(r.passed, s"snapshotDiff property failed: $r")
  }

  test("snapshotDiff refuses DUPLICATE ids within a snapshot loudly — a " +
    "duplicated id would cross-multiply in the full-outer join and " +
    "misclassify every copy") {
    import spark.implicits._
    val dup = Seq((1L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // same text — still refused
      (2L, "one two three four")).toDF("doc_id", "text")
    val clean = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.snapshotDiff(dup, clean, "doc_id", "text").collect()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("duplicate doc_id")), s"$ex")
    val ex2 = intercept[Exception] {
      Dedup.snapshotDiff(clean, dup, "doc_id", "text").collect()
    }
    assert(Iterator.iterate(ex2: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("duplicate doc_id")), s"$ex2")
  }

  test("snapshotDiffByKey: re-minted ids classify correctly through a " +
    "stable content key, per-side ids ride along as provenance; with " +
    "key = id it equals snapshotDiff plus the provenance columns; " +
    "duplicate keys refuse") {
    import spark.implicits._
    // the crawl-refresh shape: ids are row numbers re-minted per snapshot,
    // urls are stable — an id-keyed diff would call everything added+removed
    val prev = Seq(
      ("u/a", 1L, "alpha beta gamma delta epsilon"),  // identical
      ("u/b", 2L, "one two three four five six"),     // retouched
      ("u/c", 3L, "totally original body of text here"), // rewritten
      ("u/d", 4L, "this document gets dropped"))      // removed
      .toDF("url", "doc_id", "text")
    val cur = Seq(
      ("u/a", 11L, "alpha beta gamma delta epsilon"),
      ("u/b", 12L, "one two three four five six seven"),
      ("u/c", 13L, "completely different words now appear"),
      ("u/e", 15L, "a brand new arrival document"))
      .toDF("url", "doc_id", "text")
    val got = Dedup.snapshotDiffByKey(prev, cur, "url", "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getString(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("u/a") === ((1L, 11L, "identical", -1L)), s"$got")
    assert(got("u/b") === ((2L, 12L, "retouched", 800000L)), s"$got")
    assert(got("u/c")._3 === "rewritten", s"$got")
    assert(got("u/d") === ((4L, -1L, "removed", -1L)), s"$got")
    assert(got("u/e") === ((-1L, 15L, "added", -1L)), s"$got")

    // with the key AS the id, byKey is snapshotDiff plus provenance
    val p2 = prev.select(col("doc_id"), col("text"))
    val c2 = cur.select(col("doc_id"), col("text"))
    val viaKey = Dedup.snapshotDiffByKey(p2, c2, "doc_id", "doc_id", "text")
      .select(col("key").as("doc_id"), col("status"), col("jac_micros"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val viaId = Dedup.snapshotDiff(p2, c2, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(viaKey === viaId, s"$viaKey vs $viaId")

    val dupKey = Seq(("u/a", 1L, "x y z"), ("u/a", 2L, "x y w"))
      .toDF("url", "doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.snapshotDiffByKey(dupKey, cur, "url", "doc_id", "text").collect()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("duplicate url")), s"$ex")
  }

  test("incrementalNearDupIndexed width guard aggregates over EVERY stored " +
    "part: a mixed-width part union (an intake restarted with a changed " +
    "numHashes) refuses loudly even when the first-scanned rows match") {
    import spark.implicits._
    val docsA = Seq((1L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val docsB = Seq((2L, "ii jj kk ll mm nn oo pp")).toDF("doc_id", "text")
    val mixed = Dedup.minhashSigFrame(docsA, "doc_id", "text", 12)
      .unionByName(Dedup.minhashSigFrame(docsB, "doc_id", "text", 8))
    val batch = Seq((9L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupIndexedManaged(mixed,
        docsA.unionByName(docsB), batch, "doc_id", "text", 12, 4, 0.5)
    }
    assert(ex.getMessage.contains("widths span [8, 12]"), s"$ex")
    // a uniform matching-width union still passes and probes
    val ok = Dedup.minhashSigFrame(docsA, "doc_id", "text", 12)
      .unionByName(Dedup.minhashSigFrame(docsB, "doc_id", "text", 12))
    val (pairs, rel) = Dedup.incrementalNearDupIndexedManaged(ok,
      docsA.unionByName(docsB), batch, "doc_id", "text", 12, 4, 0.5)
    try assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((9L, 1L)))
    finally rel()
  }

  test("oovRate property: matches a driver-side vocabulary + occurrence " +
    "oracle over random corpora and K") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf((1 to 12).map(i => s"w$i"))
    val text = Gen.chooseNum(1, 15).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val caseGen = for {
      n <- Gen.chooseNum(1, 20); ts <- Gen.listOfN(n, text)
      k <- Gen.chooseNum(1, 8)
    } yield (ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k)
    val p = Prop.forAllNoShrink(caseGen) { case (docs, k) =>
      val got = LanguageModel.oovRate(docs.toDF("doc_id", "text"),
          "doc_id", "text", topK = k)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val occ = docs.flatMap { case (id, t) => t.toLowerCase.split(" ", -1).map(id -> _) }
      val vocab = occ.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (w, c) => (-c, w) }.take(k).map(_._1).toSet
      val want = docs.map { case (id, t) =>
        val ws = t.toLowerCase.split(" ", -1)
        id -> ((ws.length.toLong, ws.count(w => !vocab(w)).toLong))
      }.toMap
      got == want
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(r.passed, s"oovRate property failed: $r")
  }

  test("oovRate: occurrence-mass OOV share vs a driver-side mirror; the " +
    "topK boundary cuts by (count DESC, word ASC); zero-gram docs null") {
    import spark.implicits._
    // vocab candidates: a×4, b×2, c×2, d×2, e×1 — topK=3 must keep
    // {a, b, c} (b and c beat d on the ASC word tiebreak at equal count 2)
    val docs = Seq(
      (1L, "a a b c"),        // all in-vocab -> 0
      (2L, "a b c d"),        // d OOV -> 1/4 = 250000
      (3L, "d e a"),          // d, e OOV -> 2/3 = 666666
      (4L, ""))               // splits to [""]: 1 occurrence, OOV
    val got = LanguageModel.oovRate(docs.toDF("doc_id", "text"), "doc_id", "text",
        topK = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) === ((4L, 0L, 0L)), s"$got")
    assert(got(2L) === ((4L, 1L, 250000L)), s"$got")
    assert(got(3L) === ((3L, 2L, 666666L)), s"$got")
    assert(got(4L) === ((1L, 1L, 1000000L)),
      s"empty text is one OOV occurrence of the empty word: $got")
  }

  test("hashedLinearScore: sum of the words' bucket weights, collisions and " +
    "repeats included — against a driver-side mirror") {
    import spark.implicits._
    val dim = 64 // small dim forces real bucket collisions
    val weights = graft.queries.LlmQueries.seededMicroWeights("w", dim)
    def bucket(word: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(word.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString
      ((java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2147483647L) % dim).toInt
    }
    val docs = Seq(
      (1L, "alpha beta alpha"), // repeated word counts twice
      (2L, "gamma"),
      (3L, "delta epsilon zeta eta theta iota kappa"))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.hashedLinearScore(col("text"), weights).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = docs.map { case (id, t) =>
      (id, t.split(" ").map(w => weights(bucket(w))).foldLeft(0L)(_ + _))
    }
    assert(got.toSeq === want)
  }
}
