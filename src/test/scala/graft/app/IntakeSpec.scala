package graft.app

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standing intake pipeline (q88's blocklist → novelty → split, streamed):
  * batch-equivalence of the incremental novelty gate against the
  * full-rewrite protocol, per-batch split exactness, restart across a
  * query stop/resume, byte-identical replay of an already-indexed batch,
  * the log-structured index contract (per-batch writes are DELTA-scale,
  * compaction preserves scores), the stored-signature near-dup gate, and
  * the drift monitoring stage. */
class IntakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): Path = Files.createTempDirectory("graft_intake")

  // ≥ 3 words each (cfg.n = 3); ids globally ordered across the two files.
  // b-file docs 13/14 duplicate a-file texts exactly (novelty 0 → dropped);
  // doc 17 is fresh; doc 16 is half-redundant against doc 3's batch-1
  // original. Hosts: ids ≡ 0 (mod 5) land on the blocked domain.
  private def docJson(id: Long, lang: String, text: String): String = {
    val host = if (id % 5 == 0) s"x$id.bad.com" else s"x$id.ok.org"
    s"""{"doc_id":$id,"lang":"$lang","text":"$text","host":"$host"}"""
  }
  private val fileA = (1L to 12L).map { i =>
    docJson(i, if (i % 2 == 0) "en" else "de",
      (0 to 5).map(j => s"w${(i * 7 + j * 3) % 19}").mkString(" "))
  }
  private val fileB = Seq(
    docJson(13L, "en", (0 to 5).map(j => s"w${(1 * 7 + j * 3) % 19}").mkString(" ")), // dup of doc 1
    docJson(14L, "de", (0 to 5).map(j => s"w${(2 * 7 + j * 3) % 19}").mkString(" ")), // dup of doc 2
    docJson(17L, "en", "fresh tokens nobody has ever used before"),
    docJson(16L, "de", (0 to 5).map(j => s"w${(3 * 7 + j * 3) % 19}").mkString(" ") +
      " plus some new trailing content here"),
    docJson(20L, "en", "would be fresh but this doc is on the blocklist"))

  private def cfgFor(in: Path, cp: Path, idx: Path, out: Path) = Intake.Config(
    inputDir = in.toString, checkpointDir = cp.toString,
    indexDir = idx.toString, outDir = out.toString,
    blocklist = Seq("bad.com"), noveltyMinMicros = 200000L,
    splits = Seq("train" -> 2L, "val" -> 1L), n = 3, seed = "spec",
    compactEvery = 2)

  private def readBatch(out: Path, id: Long): Seq[(Long, String, String, Long)] = {
    val dir = s"$out/batch=$id"
    if (!Files.exists(java.nio.file.Paths.get(dir))) Seq.empty
    else spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
  }

  private def idxParts(idx: Path): Seq[String] = Files.list(idx).iterator().asScala
    .map(_.getFileName.toString)
    .filter(s => s.startsWith("delta=") || s.startsWith("base=")).toSeq.sorted

  /** The FULL-REWRITE reference protocol: what each batch must produce,
    * with the merged index carried as one frame — the equivalence oracle
    * the log-structured layout must match score-for-score. */
  private def expectedBatch(batch: DataFrame, id: Long,
                            prevIdx: Option[DataFrame], cfg: Intake.Config)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    val kept1 = graft.llm.UrlFilter
      .domainBlocklist(batch, "host", Seq("doc_id"), cfg.blocklist.toDF("entry"))
      .filter(!col("blocked")).select("doc_id", "lang", "text")
    val scored = prevIdx match {
      case Some(ix) => graft.llm.Novelty.ngramNoveltyAgainst(
        ix, kept1.select("doc_id", "text"), "doc_id", "text", cfg.n)
      case None => graft.llm.Novelty.ngramNovelty(
        kept1.select("doc_id", "text"), "doc_id", "text", cfg.n)
    }
    val kept2 = kept1.join(
      scored.filter(col("novelty_micros") >= cfg.noveltyMinMicros)
        .select("doc_id"), "doc_id").select("doc_id", "lang")
    val want = graft.llm.Selection
      .splitAssign(kept2, "lang", "doc_id", cfg.splits, seed = s"${cfg.seed}:$id")
      .select(col("id"), col("stratum"), col("split"), col("rank_in_stratum"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val delta = graft.llm.Novelty.gramIndex(
      kept1.select("doc_id", "text"), "doc_id", "text", cfg.n)
    val nextIdx = prevIdx.fold(delta)(graft.llm.Novelty.mergeGramIndex(_, delta))
    (want, nextIdx)
  }

  test("intake stream: blocklist -> incremental novelty -> exact split, " +
    "correct across a stop/resume, replay byte-identical, per-batch index " +
    "writes DELTA-scale, compaction score-preserving") {
    val (in, cp, idx, out) = (tmp(), tmp(), tmp(), tmp())
    val cfg = cfgFor(in, cp, idx, out)

    // --- run 1: only file A exists; AvailableNow drains it as batch 0
    Files.write(in.resolve("a.json"), fileA.asJava)
    val q1 = Intake.start(spark, cfg)
    try assert(q1.awaitTermination(120000)) finally q1.stop()

    val batchA = spark.read.schema(Intake.docSchema).json(s"$in/a.json")
    val (wantA, idxAfterA) = expectedBatch(batchA, 0L, None, cfg)
    assert(wantA.nonEmpty)
    assert(readBatch(out, 0L) === wantA)
    // blocked docs (ids 5, 10) never reach a split
    assert(!readBatch(out, 0L).exists(r => r._1 % 5 == 0))

    // --- restart: file B lands, the SAME checkpoint resumes as batch 1
    Files.write(in.resolve("b.json"), fileB.asJava)
    val q2 = Intake.start(spark, cfg)
    try assert(q2.awaitTermination(120000)) finally q2.stop()

    val batchB = spark.read.schema(Intake.docSchema).json(s"$in/b.json")
    val (wantB, idxAfterB) = expectedBatch(batchB, 1L, Some(idxAfterA), cfg)
    val gotB = readBatch(out, 1L)
    assert(gotB === wantB,
      "log-structured probe must equal the full-rewrite protocol exactly")
    val idsB = gotB.map(_._1).toSet
    assert(!idsB.contains(13L) && !idsB.contains(14L),
      s"exact cross-batch duplicates must be novelty-dropped: $gotB")
    assert(idsB.contains(17L), s"a fresh doc must survive: $gotB")
    assert(!idsB.contains(20L), s"blocklisted doc must not reach a split: $gotB")

    // NO full-index rewrite per batch: delta=1 carries ONLY batch-1 grams
    // (every owner is a batch-1 id), and its row count is the batch's own
    // gram vocabulary — batch-scale, not corpus-scale
    val delta1 = spark.read.parquet(s"$idx/delta=1")
    assert(delta1.agg(min(col("owner"))).head().getLong(0) >= 13L,
      "a per-batch delta must never carry earlier batches' grams")
    val batchVocab = graft.llm.Novelty.gramIndex(
      graft.llm.UrlFilter.domainBlocklist(batchB, "host", Seq("doc_id"),
          cfg.blocklist.toDF("entry"))
        .filter(!col("blocked")).select("doc_id", "text"),
      "doc_id", "text", cfg.n).count()
    assert(delta1.count() === batchVocab,
      "delta row count must equal the batch's own gram vocabulary")

    // the incremental gate equals the batch statistic over the
    // concatenated (id-ordered) surviving corpus
    val allKept = graft.llm.UrlFilter
      .domainBlocklist(batchA.union(batchB), "host", Seq("doc_id"),
        cfg.blocklist.toDF("entry"))
      .filter(!col("blocked")).select("doc_id", "text")
    val batchStat = graft.llm.Novelty
      .ngramNovelty(allKept, "doc_id", "text", cfg.n)
      .filter(col("novelty_micros") >= cfg.noveltyMinMicros)
      .collect().map(_.getLong(0)).toSet
    assert((readBatch(out, 0L).map(_._1) ++ gotB.map(_._1)).toSet === batchStat,
      "incremental-over-batches must equal the batch novelty gate")

    // --- replay batch 1 directly (a foreachBatch retry AFTER delta=1
    // landed): outputs and the delta part must be byte-identical
    val d1Before = delta1
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    Intake.processBatch(spark, cfg, batchB, 1L)
    assert(readBatch(out, 1L) === gotB, "replayed assignments diverged")
    val d1After = spark.read.parquet(s"$idx/delta=1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(d1After === d1Before, "replayed delta part diverged")
    assert(idxParts(idx) === Seq("delta=0", "delta=1"),
      s"no compaction below compactEvery pending deltas: ${idxParts(idx)}")

    // --- batch 2 trips compactEvery=2: deltas {0,1} fold into base=1 and
    // retire; scores must still equal the full-rewrite protocol
    Files.write(in.resolve("c.json"),
      Seq(docJson(30L, "en", "yet another brand new document text")).asJava)
    val q3 = Intake.start(spark, cfg)
    try assert(q3.awaitTermination(120000)) finally q3.stop()
    val batchC = spark.read.schema(Intake.docSchema).json(s"$in/c.json")
    val (wantC, idxAfterC) = expectedBatch(batchC, 2L, Some(idxAfterB), cfg)
    assert(readBatch(out, 2L) === wantC)
    assert(idxParts(idx) === Seq("base=1", "delta=2"),
      s"compaction must fold pending deltas into a base: ${idxParts(idx)}")
    // the compacted base IS the merged index of batches 0-1
    val baseRows = spark.read.parquet(s"$idx/base=1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantBase = idxAfterB
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(baseRows === wantBase, "compacted base diverged from the merge")

    // --- batch 3 probes base + delta: an exact dup of a batch-0 doc must
    // still be novelty-dropped THROUGH the compacted base
    Files.write(in.resolve("d.json"), Seq(
      docJson(41L, "en", (0 to 5).map(j => s"w${(1 * 7 + j * 3) % 19}").mkString(" ")), // dup of doc 1
      docJson(42L, "de", "post compaction fresh words never seen")).asJava)
    val q4 = Intake.start(spark, cfg)
    try assert(q4.awaitTermination(120000)) finally q4.stop()
    val (wantD, _) = expectedBatch(
      spark.read.schema(Intake.docSchema).json(s"$in/d.json"), 3L,
      Some(idxAfterC), cfg)
    val gotD = readBatch(out, 3L)
    assert(gotD === wantD)
    val idsD = gotD.map(_._1).toSet
    assert(!idsD.contains(41L) && idsD.contains(42L),
      s"the compacted base must carry batch-0 ownership: $gotD")
  }

  test("near-dup gate: a MinHash near-duplicate (not exact) of an earlier " +
    "batch's doc is dropped via the STORED signature parts; survivors " +
    "accumulate text + signature parts; replay still byte-identical") {
    val (in, cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp(), tmp())
    val cfg = cfgFor(in, cp, idx, out).copy(
      nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString))

    // batch 0: ten ~12-word docs (enough 3-shingles for a stable MinHash)
    val baseText = (i: Long) =>
      (0 to 11).map(j => s"v${(i * 11 + j * 5) % 31}").mkString(" ")
    Files.write(in.resolve("a.json"),
      (1L to 10L).map(i => docJson(i, "en", baseText(i))).asJava)
    val q1 = Intake.start(spark, cfg)
    try assert(q1.awaitTermination(120000)) finally q1.stop()
    val batch0Ids = readBatch(out, 0L).map(_._1).toSet
    assert(batch0Ids.nonEmpty)
    assert(Files.exists(corp.resolve("part=0")), "corpus text part 0 must land")
    assert(Files.exists(corp.resolve("sigs=0")), "signature part 0 must land")
    // the signature part is minhashSigFrame-shaped and covers the text part
    val sigs0 = spark.read.parquet(s"$corp/sigs=0")
    assert(sigs0.columns.toSeq === Seq("doc_id", "mh"))
    assert(sigs0.select("doc_id").collect().map(_.getLong(0)).toSet ===
      spark.read.parquet(s"$corp/part=0").collect().map(_.getLong(0)).toSet,
      "signature part must cover exactly the text part's docs")

    // batch 1: doc 21 = doc 1's text with ONE word changed (near-dup, not
    // exact — novelty alone would NOT drop it: the changed word mints new
    // grams); doc 22 fresh
    val nearDup = baseText(1L).split(" ").updated(5, "changedword").mkString(" ")
    Files.write(in.resolve("b.json"), Seq(
      docJson(21L, "en", nearDup),
      docJson(22L, "en", "completely different tokens that nothing else shares ever")).asJava)
    val q2 = Intake.start(spark, cfg)
    try assert(q2.awaitTermination(120000)) finally q2.stop()
    val got1 = readBatch(out, 1L)
    assert(!got1.exists(_._1 == 21L),
      s"near-dup of batch-0 doc 1 must be dropped by the stored-sig gate: $got1")
    assert(got1.exists(_._1 == 22L), s"fresh doc must survive: $got1")
    // sanity: the stored-signature probe equals the text-recompute probe
    val viaIndex = graft.llm.Dedup.incrementalNearDupIndexedManaged(
      sigs0.select("doc_id", "mh"),
      spark.read.parquet(s"$corp/part=0").select("doc_id", "text"),
      spark.read.schema(Intake.docSchema).json(s"$in/b.json")
        .select(col("doc_id"), col("text")),
      "doc_id", "text", 12, 4, 0.5)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaText = graft.llm.Dedup.incrementalNearDup(
      spark.read.parquet(s"$corp/part=0").select("doc_id", "text"),
      spark.read.schema(Intake.docSchema).json(s"$in/b.json")
        .select(col("doc_id"), col("text")),
      "doc_id", "text", 12, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex === viaText, "stored-sig probe must equal text recompute")
    assert(viaIndex.contains((21L, 1L)), s"probe must find the planted pair: $viaIndex")

    // corpus parts 1 hold only the near-dup SURVIVORS
    val part1Ids = spark.read.parquet(s"$corp/part=1")
      .collect().map(_.getLong(0)).toSet
    assert(part1Ids === Set(22L), s"$part1Ids")
    assert(spark.read.parquet(s"$corp/sigs=1")
      .collect().map(_.getLong(0)).toSet === Set(22L))

    // replay of batch 1: assignments and corpus parts byte-identical
    val batchB = spark.read.schema(Intake.docSchema).json(s"$in/b.json")
    Intake.processBatch(spark, cfg, batchB, 1L)
    assert(readBatch(out, 1L) === got1, "replayed assignments diverged")
    assert(spark.read.parquet(s"$corp/part=1")
      .collect().map(_.getLong(0)).toSet === part1Ids)
    assert(spark.read.parquet(s"$corp/sigs=1")
      .collect().map(_.getLong(0)).toSet === Set(22L))
  }

  test("in-batch near-dup: within one batch, near-duplicate docs collapse " +
    "to the canonical (minimum-id) doc; cross-batch gate still applies; " +
    "replay byte-identical") {
    val (in, cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp(), tmp())
    val cfg = cfgFor(in, cp, idx, out).copy(
      nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
      inBatchNearDup = true, noveltyMinMicros = 0L)
    val baseText = (i: Long) =>
      (0 to 11).map(j => s"y${(i * 13 + j * 7) % 37}").mkString(" ")
    // docs 31/32 are near-dups of EACH OTHER (one appended word — shingle
    // Jaccard 10/11, high enough that the deterministic 12-hash/4-band
    // LSH reliably candidates the pair); the novelty gate alone would
    // keep both (the appended word mints new grams and
    // noveltyMinMicros=0); doc 33 fresh
    val nd = baseText(31L) + " appendedword"
    Files.write(in.resolve("a.json"), Seq(
      docJson(31L, "en", baseText(31L)),
      docJson(32L, "en", nd),
      docJson(33L, "en", "entirely distinct content in this document")).asJava)
    val q1 = Intake.start(spark, cfg)
    try assert(q1.awaitTermination(120000)) finally q1.stop()
    val got = readBatch(out, 0L).map(_._1).toSet
    assert(got === Set(31L, 33L),
      s"the in-batch pair must collapse to its minimum id: $got")
    // the corpus parts carry only the canonical survivors
    assert(spark.read.parquet(s"$corp/part=0")
      .collect().map(_.getLong(0)).toSet === Set(31L, 33L))
    // replay byte-identical
    val batchA = spark.read.schema(Intake.docSchema).json(s"$in/a.json")
    val before = readBatch(out, 0L)
    Intake.processBatch(spark, cfg, batchA, 0L)
    assert(readBatch(out, 0L) === before, "replayed in-batch dedup diverged")
    // the flag without a threshold refuses loudly
    val ex = intercept[IllegalArgumentException] {
      Intake.processBatch(spark,
        cfgFor(in, cp, idx, out).copy(inBatchNearDup = true), batchA, 0L)
    }
    assert(ex.getMessage.contains("inBatchNearDup"), s"$ex")
  }

  test("continuing split: cumulative split sizes track the cumulative " +
    "Hamilton quotas across batches; counters version like the index; " +
    "replay byte-identical") {
    val (in, cp, idx, out, ctr) = (tmp(), tmp(), tmp(), tmp(), tmp())
    // all docs unblocked + fully novel (distinct vocab per doc), one
    // stratum — isolates the split stage
    val cfg = cfgFor(in, cp, idx, out).copy(
      countersDir = Some(ctr.toString),
      splits = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L),
      noveltyMinMicros = 0L,
      blocklist = Seq("matches-nothing.example"))
    def freshDoc(i: Long): String =
      docJson(i, "en", (0 to 5).map(j => s"u${i}x$j").mkString(" "))
    def hamilton(n: Long): Map[String, Long] = {
      val sp = Seq(("train", 8L, 0), ("val", 1L, 1), ("test", 1L, 2))
      val base = sp.map { case (nm, w, _) => nm -> (n * w / 10) }
      var left = n - base.map(_._2).sum
      val order = sp.sortBy { case (_, w, i) => (-(n * w % 10), i) }.map(_._1)
      val bonus = order.takeWhile { _ => left -= 1; left >= 0 }.toSet
      base.map { case (nm, q) => nm -> (q + (if (bonus(nm)) 1L else 0L)) }.toMap
    }
    // batch sizes chosen so per-batch quotas would NOT track the global
    // ratio (7 docs: per-batch Hamilton gives (6,1,0)-ish repeatedly and
    // 'test' would starve; cumulative tracking must not)
    var next = 1L
    var cum = 0L
    for (b <- 0 to 2) {
      val docs = (1 to 7).map { _ => next += 1; freshDoc(next) }
      Files.write(in.resolve(s"f$b.json"), docs.asJava)
      val q = Intake.start(spark, cfg)
      try assert(q.awaitTermination(120000)) finally q.stop()
      cum += 7
      val counters = spark.read.parquet(s"$ctr/v=$b")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap.withDefaultValue(0L)
      val want = hamilton(cum)
      val dev = Seq("train", "val", "test")
        .map(nm => math.abs(counters(nm) - want(nm))).max
      assert(dev <= 3, s"batch $b: counters $counters vs cumulative quota $want")
      assert(counters.values.sum === cum, s"every doc assigned exactly once: $counters")
    }
    // per-batch independent quotas WOULD starve 'test' (3 batches x 7 docs
    // each: per-batch Hamilton of 7 = (6,1,0) -> test 0 after 21 docs);
    // the continuing form must have given it its cumulative ~2
    val finalCounters = spark.read.parquet(s"$ctr/v=2")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(finalCounters.getOrElse("test", 0L) >= 1L,
      s"cumulative tracking must feed the starved split: $finalCounters")
    // versions retire to (previous, current)
    val vs = Files.list(ctr).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v=")).toSeq.sorted
    assert(vs === Seq("v=1", "v=2"), s"$vs")
    // replay of batch 2 is byte-identical (reads counters v=1, not v=2)
    val before = readBatch(out, 2L)
    val batchC = spark.read.schema(Intake.docSchema).json(s"$in/f2.json")
    Intake.processBatch(spark, cfg, batchC, 2L)
    assert(readBatch(out, 2L) === before, "replayed continuing batch diverged")
    assert(spark.read.parquet(s"$ctr/v=2")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap === finalCounters)
  }

  private def readRejects(out: Path, id: Long): Set[(Long, String, String)] = {
    val dir = s"$out/rejects/batch=$id"
    if (!Files.exists(java.nio.file.Paths.get(dir))) Set.empty
    else spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
  }

  test("bucketed state layout: assignments and rejects are IDENTICAL to " +
    "the flat layout AND to an uncompacted control across batches and a " +
    "compaction of every state family; post-compaction probes prune the " +
    "bucketed bases; part counts stay O(compactEvery); the drop ledger " +
    "partitions every batch; newest-batch replay byte-identical; " +
    "stateBuckets / numHashes mismatches against recorded state refuse " +
    "loudly") {
    val in = tmp()
    // ~12-word docs (stable MinHash); ids %5==0 land on the blocked domain
    val baseText = (i: Long) =>
      (0 to 11).map(j => s"z${(i * 17 + j * 5) % 41}").mkString(" ")
    Files.write(in.resolve("a.json"),
      (1L to 10L).map(i => docJson(i, "en", baseText(i))).asJava)
    Thread.sleep(20) // distinct mtimes: the file source orders by timestamp
    val nearDup = baseText(1L).split(" ").updated(5, "changedword").mkString(" ")
    Files.write(in.resolve("b.json"), Seq(
      docJson(21L, "en", nearDup), // near-dup of doc 1 -> near_dup reject
      docJson(22L, "en", "completely different tokens that nothing else shares ever"),
      docJson(25L, "en", "on the blocked domain so never scored")).asJava)
    Thread.sleep(20)
    // batch 2 trips compactEvery=2: deltas {0,1} of EVERY family fold
    Files.write(in.resolve("c.json"), Seq(
      docJson(31L, "de",
        "solitary vocabulary appearing nowhere else in the corpus stream")).asJava)
    Thread.sleep(20)
    // batch 3 probes the COMPACTED bucketed bases plus the pending batch-2
    // deltas: 41 duplicates a batch-1 doc (found through bandsbase=1 /
    // partbase=1), 43 duplicates the batch-2 doc (found through the plain
    // bands=2 delta). Exact copies on purpose — every band collides, so
    // the candidate is GUARANTEED and each matches exactly one corpus doc
    // (unique vocab); the near-not-exact case is batch 1's doc 21.
    Files.write(in.resolve("d.json"), Seq(
      docJson(41L, "en", "completely different tokens that nothing else shares ever"),
      docJson(43L, "en",
        "solitary vocabulary appearing nowhere else in the corpus stream"),
      docJson(42L, "en", "wholly original final batch content nothing shares"),
      docJson(45L, "en", "on the blocked domain so never scored")).asJava)

    def run(buckets: Int, compact: Int): Intake.Config = {
      val (cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp())
      val cfg = cfgFor(in, cp, idx, out).copy(
        nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
        stateBuckets = buckets, compactEvery = compact,
        // one file per trigger so the four files land as batches 0..3
        maxFilesPerTrigger = Some(1))
      val q = Intake.start(spark, cfg)
      try assert(q.awaitTermination(240000)) finally q.stop()
      cfg
    }
    val cfgFlat = run(0, 2)
    val cfgBkt = run(32, 2)
    val cfgNoC = run(32, 1000) // uncompacted control: one part per batch
    val outFlat = java.nio.file.Paths.get(cfgFlat.outDir)
    val outBkt = java.nio.file.Paths.get(cfgBkt.outDir)
    val outNoC = java.nio.file.Paths.get(cfgNoC.outDir)
    val idxBkt = java.nio.file.Paths.get(cfgBkt.indexDir)
    val corpBkt = java.nio.file.Paths.get(cfgBkt.corpusDir.get)

    // score/ledger equivalence: neither the bucket layout nor the
    // compaction state is visible in any output
    for (b <- 0L to 3L) {
      assert(readBatch(outBkt, b) === readBatch(outFlat, b),
        s"batch $b assignments diverged between layouts")
      assert(readRejects(outBkt, b) === readRejects(outFlat, b),
        s"batch $b rejects diverged between layouts")
      assert(readBatch(outBkt, b) === readBatch(outNoC, b),
        s"batch $b assignments diverged vs the uncompacted control")
      assert(readRejects(outBkt, b) === readRejects(outNoC, b),
        s"batch $b rejects diverged vs the uncompacted control")
    }
    // the ledger partitions the batch: survivors ∪ rejects = batch ids,
    // disjoint, with the engineered docs in their stages
    val surv1 = readBatch(outBkt, 1L).map(_._1).toSet
    val rej1 = readRejects(outBkt, 1L)
    assert(surv1.intersect(rej1.map(_._1)).isEmpty)
    assert(surv1 ++ rej1.map(_._1) === Set(21L, 22L, 25L))
    assert(rej1.exists(r => r._1 == 25L && r._2 == "blocklist" &&
      r._3.startsWith("blocked_by:")), s"$rej1")
    assert(rej1.exists(r => r._1 == 21L && r._2 == "near_dup" &&
      r._3 == "near_dup_of:1"), s"$rej1")
    // batch 3: both near-dups drop — one through the compacted base, one
    // through the pending delta — and the fresh doc survives
    val rej3 = readRejects(outBkt, 3L)
    assert(rej3.exists(r => r._1 == 41L && r._2 == "near_dup" &&
      r._3 == "near_dup_of:22"), s"base-probed near-dup must drop: $rej3")
    assert(rej3.exists(r => r._1 == 43L && r._2 == "near_dup" &&
      r._3 == "near_dup_of:31"), s"delta-probed near-dup must drop: $rej3")
    assert(readBatch(outBkt, 3L).map(_._1).toSet === Set(42L), s"$rej3")

    // the layout actually landed: compacted BASES are partitioned by bkt;
    // per-batch DELTAS are plain (bkt rides as a data column)
    assert(idxParts(idxBkt) === Seq("base=1", "delta=2", "delta=3"),
      s"${idxParts(idxBkt)}")
    def bktDirs(p: Path): Boolean = Files.list(p).iterator().asScala
      .exists(_.getFileName.toString.startsWith("bkt="))
    assert(bktDirs(idxBkt.resolve("base=1")), "base must be bucket-partitioned")
    assert(!bktDirs(idxBkt.resolve("delta=3")), "deltas must be plain writes")
    assert(spark.read.parquet(s"$idxBkt/delta=3").columns.contains("bkt"),
      "plain deltas must still carry the bkt data column")
    // every corpus family compacted at the same horizon, so the probe
    // plans an O(compactEvery) part union: {family base=1, deltas 2..3}
    def corpParts(prefix: String): Seq[String] =
      Files.list(corpBkt).iterator().asScala.map(_.getFileName.toString)
        .filter(s => s.startsWith(prefix) &&
          s.stripPrefix(prefix).forall(_.isDigit)).toSeq.sorted
    assert(corpParts("partbase=") === Seq("partbase=1"), s"${corpParts("partbase=")}")
    assert(corpParts("part=") === Seq("part=2", "part=3"), s"${corpParts("part=")}")
    assert(corpParts("bandsbase=") === Seq("bandsbase=1"))
    assert(corpParts("bands=") === Seq("bands=2", "bands=3"))
    assert(bktDirs(corpBkt.resolve("partbase=1")) && bktDirs(corpBkt.resolve("bandsbase=1")))
    assert(!bktDirs(corpBkt.resolve("bands=3")))
    // the uncompacted control kept one part per batch (what compaction
    // is FOR); the flat run compacts too (sigsbase family)
    val corpNoC = java.nio.file.Paths.get(cfgNoC.corpusDir.get)
    def partsOf(root: Path, prefix: String): Seq[String] =
      Files.list(root).iterator().asScala.map(_.getFileName.toString)
        .filter(s => s.startsWith(prefix) &&
          s.stripPrefix(prefix).forall(_.isDigit)).toSeq.sorted
    assert(partsOf(corpNoC, "part=") ===
      Seq("part=0", "part=1", "part=2", "part=3"))
    val corpFlat = java.nio.file.Paths.get(cfgFlat.corpusDir.get)
    assert(partsOf(corpFlat, "sigsbase=") === Seq("sigsbase=1"))
    assert(partsOf(corpFlat, "sigs=") === Seq("sigs=2", "sigs=3"))

    // post-compaction probes PRUNE the corpus-scale bases: batch 3's keys
    // touch strictly fewer than 32 buckets, and the probed bytes are
    // strictly below the standing totals (the base dominates the bytes;
    // the pending deltas are read in full by design)
    val m3 = spark.read.parquet(s"$outBkt/metrics/batch=3").collect().head
    def L(n: String) = m3.getLong(m3.fieldIndex(n))
    assert(L("state_buckets") === 32L)
    assert(L("index_buckets_probed") > 0L && L("index_buckets_probed") < 32L, s"$m3")
    assert(L("index_bytes_probed") < L("index_bytes"),
      s"pruned probe must read fewer bytes than the full index: $m3")
    assert(L("sig_buckets_probed") > 0L && L("sig_buckets_probed") < 32L, s"$m3")
    assert(L("sig_bytes_probed") < L("sig_bytes"), s"$m3")
    assert(L("text_buckets_probed") >= 1L && L("text_buckets_probed") < 32L, s"$m3")
    assert(L("text_bytes_probed") < L("text_bytes"), s"$m3")
    assert(L("rej_near_dup") === 2L && L("rej_blocklist") === 1L &&
      L("survivors") === 1L && L("batch_docs") === 4L, s"$m3")
    assert(L("index_parts") === 2L && L("sig_parts") === 2L,
      s"base + one pending delta: $m3")
    // the flat layout reports unpruned probes (-1 bucket counts, probed =
    // total)
    val m3f = spark.read.parquet(s"$outFlat/metrics/batch=3").collect().head
    def Lf(n: String) = m3f.getLong(m3f.fieldIndex(n))
    assert(Lf("index_buckets_probed") === -1L &&
      Lf("index_bytes_probed") === Lf("index_bytes"), s"$m3f")

    // replay of the NEWEST batch (3) in the bucketed layout:
    // byte-identical outputs through the same pruned probes. (Only the
    // in-flight batch ever replays — foreachBatch commits offsets per
    // batch — and a LATER batch's compaction may fold state past an older
    // batch's strictly-below horizon, so newest-batch replay is exactly
    // the contract.)
    val batchD = spark.read.schema(Intake.docSchema).json(s"$in/d.json")
    val before = (readBatch(outBkt, 3L), readRejects(outBkt, 3L))
    Intake.processBatch(spark, cfgBkt, batchD, 3L)
    assert((readBatch(outBkt, 3L), readRejects(outBkt, 3L)) === before,
      "replayed bucketed batch diverged")
    // the broadcast-size fallback (maxBroadcastKeys = 0 forces BOTH probes
    // onto the shuffled-join path over the pruned index): byte-identical —
    // the probe shape is a plan choice, never a semantics choice
    Intake.processBatch(spark, cfgBkt.copy(maxBroadcastKeys = 0L), batchD, 3L)
    assert((readBatch(outBkt, 3L), readRejects(outBkt, 3L)) === before,
      "fallback-probe replay diverged")

    // the recorded layout is pinned: a run with a different stateBuckets
    // against the same state refuses loudly before touching anything
    val ex = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, cfgBkt.copy(stateBuckets = 8), batchD, 4L)
    }
    assert(ex.getMessage.contains("stateBuckets=32"), s"$ex")
    val ex2 = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, cfgBkt.copy(stateBuckets = 0), batchD, 4L)
    }
    assert(ex2.getMessage.contains("stateBuckets"), s"$ex2")
    // the recorded signature WIDTH is pinned the same way (metadata, not a
    // per-batch full-index aggregate): a mismatched numHashes refuses
    val ex3 = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, cfgBkt.copy(numHashes = 16), batchD, 4L)
    }
    assert(ex3.getMessage.contains("numHashes=16") &&
      ex3.getMessage.contains("numHashes=12"), s"$ex3")
  }

  test("marker hygiene: a marker-less directory that already holds state " +
    "parts is refused, never silently adopted (a pre-marker flat index " +
    "read as bucketed would null out bkt and prune away every match); a " +
    "missing width marker over legacy band parts is aggregate-verified " +
    "once and re-minted; the banded probe skips its width aggregate only " +
    "when the caller vouches (widthVerified)") {
    import org.apache.spark.sql.functions.lit
    val (in, cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp(), tmp())
    val cfg = cfgFor(in, cp, idx, out).copy(
      nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
      stateBuckets = 16)
    val baseText = (i: Long) =>
      (0 to 11).map(j => s"m${(i * 19 + j * 7) % 43}").mkString(" ")
    val batch0 = (1L to 6L).map(i => (i, "en", baseText(i),
      s"x$i.ok.org")).toDF("doc_id", "lang", "text", "host")
    Intake.processBatch(spark, cfg, batch0, 0L)
    assert(Files.exists(idx.resolve("_state_buckets")))
    assert(Files.exists(corp.resolve("_num_hashes")))

    // deleting the layout marker turns the state dir into pre-marker
    // legacy state: the next batch must refuse, not re-mint
    Files.delete(idx.resolve("_state_buckets"))
    val batch1 = Seq((11L, "en", baseText(11L), "x11.ok.org"))
      .toDF("doc_id", "lang", "text", "host")
    val ex = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, cfg, batch1, 1L)
    }
    assert(ex.getMessage.contains("_state_buckets") &&
      ex.getMessage.contains(idx.toString), s"$ex")
    // restore it: processing resumes
    Files.write(idx.resolve("_state_buckets"), "16".getBytes("UTF-8"))

    // a missing WIDTH marker over existing band parts (pre-r17 state) is
    // verified once by the aggregate and re-minted — matching widths pass
    Files.delete(corp.resolve("_num_hashes"))
    Intake.processBatch(spark, cfg, batch1, 1L)
    assert(Files.exists(corp.resolve("_num_hashes")))
    assert(new String(Files.readAllBytes(corp.resolve("_num_hashes")),
      "UTF-8").trim === "12")
    // ...and a mismatched width is caught by that same one-time aggregate
    Files.delete(corp.resolve("_num_hashes"))
    val ex2 = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, cfg.copy(numHashes = 24, bands = 4),
        batch1, 2L)
    }
    assert(ex2.getMessage.contains("legacy band parts"), s"$ex2")
    Files.write(corp.resolve("_num_hashes"), "12".getBytes("UTF-8"))

    // the probe-level contract behind the marker: widthVerified=false
    // aggregates the stored w column and refuses a mismatch; =true skips
    // the aggregate entirely (the caller's metadata vouches)
    val banded = Seq((1L, 0, "k|1|2", 99, 3))
      .toDF("doc_id", "b", "bkey", "w", "bkt")
    val text = Seq((1L, "some corpus text here")).toDF("doc_id", "text")
      .withColumn("bkt", lit(1))
    val probeBatch = Seq((5L, baseText(5L))).toDF("doc_id", "text")
    val ex3 = intercept[IllegalArgumentException] {
      graft.llm.Dedup.incrementalNearDupBanded(
        banded, text, probeBatch, "doc_id", "text", 12, 4, 16, 0.5)
    }
    assert(ex3.getMessage.contains("widths"), s"$ex3")
    val probe = graft.llm.Dedup.incrementalNearDupBanded(
      banded, text, probeBatch, "doc_id", "text", 12, 4, 16, 0.5,
      widthVerified = true)
    try assert(probe.pairs.collect().isEmpty) // no refusal; no collisions
    finally probe.cleanup()
  }

  test("probe plan posture: the bucketed novelty probe PRUNES the index " +
    "scan (partition filters, fewer rows read than stored) and never " +
    "sorts, exchanges, or broadcasts the index side — the index is the " +
    "STREAMED side of a broadcast join; same for the banded sig probe") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec

    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        // descend into persisted stages: a probe that materializes its
        // candidate frame hides its scans behind the cache otherwise
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(m.relation.cachedPlan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    def scansOf(p: SparkPlan, dir: String): Seq[FileSourceScanExec] =
      nodes(p).collect {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(dir)) => f
      }

    val idx = tmp()
    // a deterministic pseudo-random standing index: incompressible gram
    // values so the scan's row metrics reflect real pruning
    val corpusDocs = (1L to 400L)
      .map(i => (i, (0 to 11).map(j => s"t${(i * 131 + j * 29) % 4999}").mkString(" ")))
      .toDF("doc_id", "text")
    graft.llm.Novelty.withGramBucket(
        graft.llm.Novelty.gramIndex(corpusDocs, "doc_id", "text", 3), 32)
      .write.partitionBy("bkt").parquet(s"$idx/delta=0")
    val batch = Seq((900L, (0 to 11).map(j => s"t${(131 + j * 29) % 4999}").mkString(" ")))
      .toDF("doc_id", "text")

    val bkts = graft.llm.Novelty.gramBuckets(batch, "doc_id", "text", 3, 32)
    assert(bkts.nonEmpty && bkts.size < 32, s"$bkts")
    val index = spark.read.schema("gram BIGINT, owner BIGINT, bkt INT")
      .parquet(s"$idx/delta=0")
      .where(col("bkt").isin(bkts: _*)).select("gram", "owner")
    val scored = graft.llm.Novelty.ngramNoveltyAgainst(
      index, batch, "doc_id", "text", 3, broadcastProbe = true)
    assert(scored.collect().nonEmpty) // execute, so AQE finalizes + metrics fill
    val plan = scored.queryExecution.executedPlan
    val idxScans = scansOf(plan, idx.toString)
    assert(idxScans.nonEmpty, s"no index scan found:\n$plan")
    idxScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"the index scan must carry the bkt partition filter:\n$plan")
    }
    val totalGrams = spark.read
      .schema("gram BIGINT, owner BIGINT, bkt INT").parquet(s"$idx/delta=0").count()
    val rowsRead = idxScans.map(_.metrics("numOutputRows").value).sum
    assert(rowsRead < totalGrams,
      s"pruning must read fewer index rows than stored ($rowsRead vs $totalGrams)")
    // the index side is STREAMED: it never feeds a sort-merge join, and
    // no exchange (shuffle OR broadcast) moves the RAW index — any
    // exchange whose subtree contains the index scan must have a join
    // BELOW it, i.e. it moves post-probe matched rows, not the index
    def joinBelow(e: SparkPlan): Boolean = nodes(e).drop(1).exists(p =>
      p.getClass.getSimpleName.contains("Join"))
    nodes(plan).foreach {
      case smj: SortMergeJoinExec =>
        assert(scansOf(smj, idx.toString).isEmpty,
          s"index side must never sort-merge:\n$plan")
      case e: ShuffleExchangeLike if scansOf(e, idx.toString).nonEmpty =>
        assert(joinBelow(e),
          s"a shuffle exchanges the raw index (no join below it):\n$plan")
      case b: BroadcastExchangeLike if scansOf(b, idx.toString).nonEmpty =>
        assert(joinBelow(b),
          s"a broadcast builds over the raw index (no join below it):\n$plan")
      case _ => ()
    }

    // the banded sig probe: same posture over bands parts
    val corp = tmp()
    val sigs = graft.llm.Dedup.minhashSigFrame(corpusDocs, "doc_id", "text", 12)
    graft.llm.Dedup.bandIndexFrame(sigs, 12, 4, 32)
      .write.partitionBy("bkt").parquet(s"$corp/bands=0")
    val banded = spark.read
      .schema("doc_id BIGINT, b INT, bkey STRING, w INT, bkt INT")
      .parquet(s"$corp/bands=0")
      .select("doc_id", "b", "bkey", "w", "bkt")
    val probe = graft.llm.Dedup.incrementalNearDupBanded(
      banded, corpusDocs, batch, "doc_id", "text", 12, 4, 32, 0.5)
    try {
      probe.pairs.collect() // the planted doc matches doc 1
      assert(probe.probedBuckets.nonEmpty && probe.probedBuckets.size < 32)
      val p2 = probe.pairs.queryExecution.executedPlan
      val bandScans = scansOf(p2, s"$corp/bands=0")
      assert(bandScans.nonEmpty, s"no band-index scan found:\n$p2")
      bandScans.foreach(s => assert(s.partitionFilters.nonEmpty,
        s"the band scan must carry the bkt partition filter:\n$p2"))
      nodes(p2).foreach {
        case smj: SortMergeJoinExec =>
          assert(scansOf(smj, s"$corp/bands=0").isEmpty,
            s"band index must never sort-merge:\n$p2")
        case b: BroadcastExchangeLike =>
          assert(scansOf(b, s"$corp/bands=0").isEmpty,
            s"the band index must never be the broadcast build:\n$p2")
        case _ => ()
      }
    } finally probe.cleanup()

    // the semantic probe: same posture over the esig/emb families — the
    // stored signature index is pruned (partition filter, fewer rows than
    // stored) and never sort-merged or broadcast (the BATCH side is the
    // measured build); the embedding fetch is pruned to candidate buckets
    val scorp = tmp()
    def pEmb(i: Long): Seq[Float] = (0 until 32).map { j =>
      var v = i * 2654435761L + j * 40503L
      v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
      v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
      v ^= v >>> 33
      if ((v & 1L) == 0L) 1f else -1f
    }
    val corpusEmbs = (1L to 400L).map(i => (i, pEmb(i))).toDF("doc_id", "emb")
    graft.llm.Similarity.esigIndexFrame(corpusEmbs, 6, 3, 32)
      .write.partitionBy("bkt").parquet(s"$scorp/esigbase=0")
    corpusEmbs
      .withColumn("bkt", graft.llm.Dedup.docBucket(col("doc_id"), 32))
      .write.partitionBy("bkt").parquet(s"$scorp/embbase=0")
    val storedSigs = spark.read
      .schema("doc_id BIGINT, t INT, sig BIGINT, bkt INT")
      .parquet(s"$scorp/esigbase=0").select("doc_id", "t", "sig", "bkt")
    val storedEmbs = spark.read
      .schema("doc_id BIGINT, emb ARRAY<FLOAT>, bkt INT")
      .parquet(s"$scorp/embbase=0").select("doc_id", "emb", "bkt")
    val semBatch = Seq((900L, pEmb(1L))).toDF("doc_id", "emb")
    val sp = graft.llm.Similarity.incrementalSemanticDup(
      storedSigs, storedEmbs, semBatch, "doc_id", "emb", 0.9, 6, 3, 32)
    try {
      val got = sp.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((900L, 1L)), s"$got")
      assert(sp.probedBuckets.nonEmpty && sp.probedBuckets.size <= 3,
        s"1 doc × 3 tables probes ≤ 3 sig buckets: ${sp.probedBuckets}")
      assert(sp.probedEmbBuckets.exists(b => b.nonEmpty && b.size < 32),
        s"the emb fetch must prune to candidate buckets: ${sp.probedEmbBuckets}")
      val p3 = sp.pairs.queryExecution.executedPlan
      val esigScans = scansOf(p3, s"$scorp/esigbase=0")
      assert(esigScans.nonEmpty, s"no esig scan found:\n$p3")
      esigScans.foreach(s => assert(s.partitionFilters.nonEmpty,
        s"the esig scan must carry the bkt partition filter:\n$p3"))
      val esigRows = esigScans.map(_.metrics("numOutputRows").value).sum
      assert(esigRows < 1200L,
        s"pruning must read fewer esig rows than the 1200 stored ($esigRows)")
      scansOf(p3, s"$scorp/embbase=0").foreach(s =>
        assert(s.partitionFilters.nonEmpty,
          s"the emb scan must carry the bkt partition filter:\n$p3"))
      // the raw esig index must never move or sort-merge; an exchange
      // whose subtree contains the scan is fine only when the candidate
      // JOIN sits below it (it then moves post-probe matched rows — the
      // persisted candidate frame — not the index)
      nodes(p3).foreach {
        case smj: SortMergeJoinExec if scansOf(smj, s"$scorp/esigbase=0").nonEmpty =>
          assert(joinBelow(smj),
            s"the raw esig index feeds a sort-merge join:\n$p3")
        case b: BroadcastExchangeLike if scansOf(b, s"$scorp/esigbase=0").nonEmpty =>
          assert(joinBelow(b),
            s"a broadcast builds over the raw esig index (no join below):\n$p3")
        case e: ShuffleExchangeLike if scansOf(e, s"$scorp/esigbase=0").nonEmpty =>
          assert(joinBelow(e),
            s"a shuffle exchanges the raw esig index (no join below):\n$p3")
        case _ => ()
      }
    } finally sp.cleanup()
  }

  test("drift monitoring: per-batch KS/TV report vs the accumulated " +
    "reference equals the raw Drift operators; state versions retire; " +
    "replay byte-identical; first batch writes state only") {
    val (in, cp, idx, out, dft) = (tmp(), tmp(), tmp(), tmp(), tmp())
    // unblocked + novelty bypassed: the drift stage measures kept1 (every
    // doc), so the raw-operator oracle below sees the same rows
    val cfg = cfgFor(in, cp, idx, out).copy(
      driftDir = Some(dft.toString),
      noveltyMinMicros = 0L,
      blocklist = Seq("matches-nothing.example"))
    // batch 0: short en/de docs; batch 1: longer docs, en-heavy — both
    // statistics must move
    def doc(i: Long, lang: String, words: Int): String =
      docJson(i, lang, (1 to words).map(j => s"g${i}w$j").mkString(" "))
    Files.write(in.resolve("a.json"),
      ((1L to 6L).map(i => doc(i, if (i % 2 == 0) "en" else "de", 4)) ++
        (7L to 8L).map(i => doc(i, "en", 6))).asJava)
    val q1 = Intake.start(spark, cfg)
    try assert(q1.awaitTermination(120000)) finally q1.stop()
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/drift/batch=0")),
      "first batch has no reference — state only, no report")
    assert(Files.exists(dft.resolve("wc").resolve("v=0")))
    assert(Files.exists(dft.resolve("lang").resolve("v=0")))

    Files.write(in.resolve("b.json"),
      (11L to 15L).map(i => doc(i, "en", 9)).asJava)
    val q2 = Intake.start(spark, cfg)
    try assert(q2.awaitTermination(120000)) finally q2.stop()
    val report = spark.read.parquet(s"$out/drift/batch=1")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(report.keySet === Set("wordcount_ks", "lang_tv"), s"$report")

    // oracle: the raw Drift operators over (ref = batch-0 docs,
    // batch = batch-1 docs) must read the identical statistics
    val refDocs = spark.read.schema(Intake.docSchema).json(s"$in/a.json")
      .select(lit("ref").as("g"), col("lang"),
        size(split(lower(col("text")), " ")).cast("long").as("wc"))
    val batDocs = spark.read.schema(Intake.docSchema).json(s"$in/b.json")
      .select(lit("batch").as("g"), col("lang"),
        size(split(lower(col("text")), " ")).cast("long").as("wc"))
    val both = refDocs.unionByName(batDocs)
    val wantKs = graft.llm.Drift.ecdfDrift(both, "g", "wc").collect().head
    assert(report("wordcount_ks") ===
      ((wantKs.getString(0), wantKs.getString(1), wantKs.getLong(2),
        wantKs.getLong(3), wantKs.getLong(4))), s"$report")
    val wantTv = graft.llm.Drift.categoricalDrift(both, "g", "lang").collect().head
    assert(report("lang_tv") ===
      ((wantTv.getString(0), wantTv.getString(1), wantTv.getLong(2),
        wantTv.getLong(3), wantTv.getLong(4))), s"$report")
    // both statistics moved (longer docs, en-only batch)
    assert(report("wordcount_ks")._5 > 0L && report("lang_tv")._5 > 0L)

    // replay batch 1: report and state byte-identical
    val batchB = spark.read.schema(Intake.docSchema).json(s"$in/b.json")
    Intake.processBatch(spark, cfg, batchB, 1L)
    assert(report === spark.read.parquet(s"$out/drift/batch=1")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap, "replayed drift report diverged")

    // state hygiene: wc/lang versions retire to (previous, current), and
    // the folded state equals the accumulated counts
    val wcVs = Files.list(dft.resolve("wc")).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(wcVs === Seq("v=0", "v=1"), s"$wcVs")
    val wcState = spark.read.parquet(s"$dft/wc/v=1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wcState === Map(4L -> 6L, 6L -> 2L, 9L -> 5L), s"$wcState")
  }

  test("replay seam: batch ids must be strictly increasing; the combined " +
    "output partitions each batch exactly into survivors + ledger rows, " +
    "with survivor reasons encoding the written split assignment") {
    val (in, cp, idx, out) = (tmp(), tmp(), tmp(), tmp())
    val cfg = cfgFor(in, cp, idx, out)
    val b1 = spark.createDataFrame(
      fileA.map(j => spark.read.schema(Intake.docSchema).json(
        Seq(j).toDS()).head()).asJava, Intake.docSchema)
    val b2 = spark.createDataFrame(
      fileB.map(j => spark.read.schema(Intake.docSchema).json(
        Seq(j).toDS()).head()).asJava, Intake.docSchema)

    val exOrder = intercept[IllegalArgumentException] {
      Intake.replay(spark, cfg, Seq(2L -> b1, 1L -> b2))
    }
    assert(exOrder.getMessage.contains("strictly increasing"), s"$exOrder")

    val res = Intake.replay(spark, cfg, Seq(1L -> b1, 2L -> b2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    // exactly one outcome row per ingested doc
    val inIds = (b1.collect().map(r => 1L -> r.getLong(0)) ++
      b2.collect().map(r => 2L -> r.getLong(0))).toSet
    assert(res.map(t => (t._1, t._2)).toSet === inIds &&
      res.length === inIds.size, s"${res.toSeq.sortBy(_._2)}")
    // survivor reasons are exactly the written assignments
    val wantSurv = (Seq(1L, 2L).flatMap(id => readBatch(out, id)
      .map(t => (id, t._1, "survived", s"${t._2}:${t._3}:${t._4}")))).toSet
    assert(res.filter(_._3 == "survived").toSet === wantSurv)
    // ledger rows carry the four stage names only
    assert(res.map(_._3).toSet.subsetOf(
      Set("survived", "blocklist", "novelty", "near_dup", "in_batch_near_dup")))
  }

  test("per-family compaction triggers self-heal: after a crash between " +
    "the gram retire and the corpus-family folds, the families fold on " +
    "the NEXT batch (their own pending counts trigger), and outputs match " +
    "an uncrashed control run exactly") {
    val mk = () => (tmp(), tmp(), tmp(), tmp(), tmp())
    def run(crash: Boolean): (Seq[Seq[(Long, String, String, Long)]], Path, Path) = {
      val (in, cp, idx, out, corp) = mk()
      val cfg = cfgFor(in, cp, idx, out).copy(
        nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
        compactEvery = 1) // every batch folds whatever pends below it
      val text = (i: Long) =>
        (0 to 11).map(j => s"c${(i * 19 + j * 7) % 43}").mkString(" ")
      def batch(ids: Seq[Long]) = ids.map(i =>
        (i, "en", text(i), s"x$i.ok.org")).toDF("doc_id", "lang", "text", "host")
      Intake.processBatch(spark, cfg, batch(1L to 4L), 1L)
      if (crash) {
        // simulate the crash: the gram fold landed (base written, deltas
        // retired) but the corpus families did not — exactly the state a
        // kill between the two leaves behind
        graft.llm.Novelty.compactGramIndex(
            spark.read.parquet(s"$idx/delta=1").select("gram", "owner"))
          .write.mode("overwrite").parquet(s"$idx/base=1")
        val fs = new org.apache.hadoop.fs.Path(idx.toString).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$idx/delta=1"), true)
      }
      Intake.processBatch(spark, cfg, batch(5L to 8L), 2L)
      Intake.processBatch(spark, cfg, batch(Seq(9L, 1L + 16L)), 3L)
      (Seq(1L, 2L, 3L).map(readBatch(out, _)), idx, corp)
    }
    val (control, _, _) = run(crash = false)
    val (healed, idx, corp) = run(crash = true)
    assert(healed === control,
      "outputs diverged after the simulated crash between gram retire and family folds")
    // the families folded despite the gram family having nothing pending
    // at batch 2 (its fold already landed before the crash)
    val parts = Files.list(corp).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(parts.exists(_.startsWith("partbase=")) &&
      parts.exists(_.startsWith("sigsbase=")), s"$parts")
    // the gram family kept folding on its own schedule after the crash
    // (batch 3 folded delta=2 onto the crash-written base=1 → base=2)
    val idxParts2 = idxParts(idx)
    assert(idxParts2 === Seq("base=2", "delta=3"), s"$idxParts2")
  }

  test("two-tier text compaction: outputs identical to the single-tier " +
    "control across multiple mid and base folds; text part counts stay " +
    "bounded by O(2K); a crash between the mid fold and the base fold " +
    "heals on the next batch; a dir holding mids refuses twoTierCorpus=false") {
    val text = (i: Long) =>
      (0 to 11).map(j => s"t${(i * 23 + j * 5) % 97}").mkString(" ")
    // ten 4-doc id-ordered batches; batches 6 and 9 plant exact copies of
    // batch-1 texts, so the cross probe must find them through the folded
    // mid/base text parts (the verify join reads them)
    val batches: Seq[(Long, DataFrame)] = (1L to 10L).map { b =>
      val ids = (1L to 4L).map(k => (b - 1) * 4 + k)
      val src: Long => Long =
        if (b == 6) i => if (i == ids.last) 1L else i
        else if (b == 9) i => if (i == ids.last) 2L else i
        else identity
      b -> ids.map(i => (i, "en", text(src(i)), s"x$i.ok.org"))
        .toDF("doc_id", "lang", "text", "host")
    }
    def textParts(corp: Path): Seq[String] =
      Files.list(corp).iterator().asScala.map(_.getFileName.toString)
        .filter(s => s.startsWith("part=") || s.startsWith("partmid=") ||
          s.startsWith("partbase=")).toSeq.sorted
    def outputs(out: Path): Seq[(Long, Seq[(Long, String, String, Long)], Set[(Long, String, String)])] =
      (1L to 10L).map { id =>
        val rej = spark.read.parquet(s"$out/rejects/batch=$id").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
        (id, readBatch(out, id), rej)
      }
    def run(twoTier: Boolean, crashAt5: Boolean): (Seq[_], Seq[Int], Path, Path) = {
      val (in, cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp(), tmp())
      val cfg = cfgFor(in, cp, idx, out).copy(
        nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
        compactEvery = 2, stateBuckets = 16, twoTierCorpus = twoTier)
      val counts = scala.collection.mutable.ArrayBuffer[Int]()
      batches.foreach { case (id, df) =>
        if (crashAt5 && id == 5L) {
          // simulate the crash INSIDE batch 5's compaction: tier 1 landed
          // (deltas 3,4 folded into partmid=4 and retired) but tier 2 (the
          // base fold over mids 2,4) did not — exactly the state a kill
          // between the two writes leaves
          spark.read.schema("doc_id BIGINT, text STRING, bkt INT")
            .parquet(s"$corp/part=3", s"$corp/part=4")
            .repartition(col("bkt"))
            .write.partitionBy("bkt").mode("overwrite")
            .parquet(s"$corp/partmid=4")
          val fs = new org.apache.hadoop.fs.Path(corp.toString).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          Seq(3L, 4L).foreach(v => fs.delete(
            new org.apache.hadoop.fs.Path(s"$corp/part=$v"), true))
          // a dir holding mids refuses a run with the tier off — the
          // single-tier fold would re-fold deltas already inside the mids
          val ex = intercept[IllegalArgumentException] {
            Intake.processBatch(spark, cfg.copy(twoTierCorpus = false), df, id)
          }
          assert(ex.getMessage.contains("partmid=") &&
            ex.getMessage.contains("twoTierCorpus"), s"$ex")
        }
        Intake.processBatch(spark, cfg, df, id)
        counts += textParts(corp).size
      }
      (outputs(out), counts.toSeq, corp, idx)
    }
    val (control, _, _, _) = run(twoTier = false, crashAt5 = false)
    val (tiered, counts, corp, _) = run(twoTier = true, crashAt5 = false)
    val (healed, _, _, _) = run(twoTier = true, crashAt5 = true)
    assert(tiered === control,
      "two-tier outputs diverged from the single-tier control")
    assert(healed === control,
      "outputs diverged after the simulated crash between mid and base folds")
    // the planted copies fired THROUGH folded text state
    assert(tiered.asInstanceOf[Seq[(Long, Seq[_], Set[(Long, String, String)])]]
      .filter(t => t._1 == 6L || t._1 == 9L)
      .forall(_._3.exists(_._2 == "near_dup")))
    // O(2K) bound: never more than base + K mids + K deltas (K = 2)
    assert(counts.max <= 5, s"text part counts $counts")
    // >=2 base folds: batch 9's tier 2 folded mids 6,8 onto base=4 → base=8
    val parts = textParts(corp)
    assert(parts.contains("partbase=8") && !parts.exists(_.startsWith("partmid=")),
      s"$parts")
    // the SIGNATURE family runs the same two tiers (bands under the
    // bucketed layout): same fold horizon, mids retired by the base fold
    val bandParts = Files.list(corp).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("bands")).toSeq.sorted
    assert(bandParts.contains("bandsbase=8") &&
      !bandParts.exists(_.startsWith("bandsmid=")), s"$bandParts")
  }

  test("offline re-bucket: probe outputs identical across a bucket-count " +
    "migration (near-dups found through the migrated base); pending parts " +
    "refuse without foldPending; the in-progress sentinel refuses ingest; " +
    "flat and already-migrated dirs refuse") {
    // disjoint per-doc vocabulary: only EXACT plants near-match, so each
    // planted copy provably matches its one source through the state path
    // it targets (base vs pending delta)
    val text = (i: Long) => (0 to 11).map(j => s"r${i}x$j").mkString(" ")
    def batch(ids: Seq[Long], dup: Map[Long, Long] = Map.empty) = ids.map(i =>
        (i, if (i % 2 == 0) "en" else "de", text(dup.getOrElse(i, i)),
          s"x$i.ok.org"))
      .toDF("doc_id", "lang", "text", "host")
    def mkCfg(b: Int) = {
      val (in, cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp(), tmp())
      cfgFor(in, cp, idx, out).copy(
        nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
        stateBuckets = b, compactEvery = 2)
    }
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      Files.walk(s).iterator().asScala.foreach { p =>
        val t = java.nio.file.Paths.get(dst).resolve(s.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    // build state at B=8 — after batch 3: base=2 (folded) + delta=3
    // (pending) in every family, so the migration exercises both paths
    val cfgA = mkCfg(8)
    Intake.processBatch(spark, cfgA, batch(1L to 6L), 1L)
    Intake.processBatch(spark, cfgA, batch(7L to 10L), 2L)
    Intake.processBatch(spark, cfgA, batch(11L to 12L), 3L)
    assert(idxParts(java.nio.file.Paths.get(cfgA.indexDir)) ===
      Seq("base=2", "delta=3"))

    // control: clone the B=8 state, run batch 4 un-migrated. The batch
    // plants a copy of doc 2 (matched through the compacted BASE) and of
    // doc 11 (matched through the PENDING delta the migration must fold).
    val cfgB = mkCfg(8)
    copyDir(cfgA.indexDir, cfgB.indexDir)
    copyDir(cfgA.corpusDir.get, cfgB.corpusDir.get)
    val b4 = batch(Seq(21L, 22L, 23L), dup = Map(21L -> 2L, 22L -> 11L))
    Intake.processBatch(spark, cfgB, b4, 4L)
    val wantA = readBatch(java.nio.file.Paths.get(cfgB.outDir), 4L)
    val wantR = readRejects(java.nio.file.Paths.get(cfgB.outDir), 4L)
    assert(wantR.exists(r => r._1 == 21L && r._2 == "near_dup" &&
      r._3 == "near_dup_of:2"), s"$wantR")
    assert(wantR.exists(r => r._1 == 22L && r._2 == "near_dup" &&
      r._3 == "near_dup_of:11"), s"$wantR")

    // pending parts refuse by default
    val exPend = intercept[IllegalArgumentException] {
      Intake.rebucket(spark, cfgA, 16)
    }
    assert(exPend.getMessage.contains("pending"), s"$exPend")

    // migrate 8 → 16: every family folds to ONE bucketed base at the
    // newest part version, markers flip, the sentinel clears
    Intake.rebucket(spark, cfgA, 16, foldPending = true)
    for (dir <- Seq(cfgA.indexDir, cfgA.corpusDir.get)) {
      val names = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).toSeq.sorted
      assert(!names.exists(n => n.startsWith("delta=") || n.startsWith("part=") ||
        n.startsWith("bands=") || n.contains("mid=") ||
        n.startsWith("_rebucket")), s"$dir: $names")
    }
    assert(idxParts(java.nio.file.Paths.get(cfgA.indexDir)) === Seq("base=3"))
    assert(Files.readAllLines(java.nio.file.Paths.get(
      cfgA.indexDir, "_state_buckets")).get(0) === "16")
    assert(Files.readAllLines(java.nio.file.Paths.get(
      cfgA.corpusDir.get, "_state_buckets")).get(0) === "16")

    // the OLD bucket count now refuses; the new one reproduces the control
    // exactly — both planted near-dups found through the migrated state
    val exOld = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, cfgA, b4, 4L)
    }
    assert(exOld.getMessage.contains("stateBuckets=16"), s"$exOld")
    val cfgA16 = cfgA.copy(stateBuckets = 16)
    Intake.processBatch(spark, cfgA16, b4, 4L)
    assert(readBatch(java.nio.file.Paths.get(cfgA.outDir), 4L) === wantA,
      "assignments diverged across the migration")
    assert(readRejects(java.nio.file.Paths.get(cfgA.outDir), 4L) === wantR,
      "rejects diverged across the migration")
    // and the migrated base is really 16-way bucketed on disk
    val bkts = Files.list(java.nio.file.Paths.get(cfgA.indexDir, "base=3"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("bkt=")).toSeq
    assert(bkts.size > 8, s"$bkts")

    // already at the target (and no migration in progress) refuses
    val exSame = intercept[IllegalArgumentException] {
      Intake.rebucket(spark, cfgA16, 16)
    }
    assert(exSame.getMessage.contains("already at"), s"$exSame")

    // a FLAT-layout dir has no bucket ids to migrate
    val cfgF = mkCfg(0)
    Intake.processBatch(spark, cfgF, batch(Seq(31L, 32L)), 1L)
    val exFlat = intercept[IllegalArgumentException] {
      Intake.rebucket(spark, cfgF, 16)
    }
    assert(exFlat.getMessage.contains("FLAT"), s"$exFlat")

    // a mid-migration sentinel refuses ingest loudly
    Files.write(java.nio.file.Paths.get(cfgA.indexDir,
      "_rebucket_in_progress"), Seq("16").asJava)
    val exProg = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, cfgA16, batch(Seq(41L)), 5L)
    }
    assert(exProg.getMessage.contains("unfinished re-bucket"), s"$exProg")
    // re-running rebucket with the same target FINISHES the migration
    // (idempotent repair) and ingest resumes
    Intake.rebucket(spark, cfgA16, 16, foldPending = true)
    assert(!Files.exists(java.nio.file.Paths.get(cfgA.indexDir,
      "_rebucket_in_progress")))
    Intake.processBatch(spark, cfgA16, batch(Seq(41L)), 5L)
    assert(readBatch(java.nio.file.Paths.get(cfgA.outDir), 5L).nonEmpty ||
      readRejects(java.nio.file.Paths.get(cfgA.outDir), 5L).nonEmpty)
  }

  test("in-batch dedup empty-pair shortcut: a batch with no internal " +
    "near-dup pairs produces outputs identical to the flag-off run (every " +
    "doc its own canonical, no in_batch rejects), and a batch WITH pairs " +
    "still routes through the CC path") {
    // disjoint vocab: no internal near-dups unless planted
    val text = (i: Long) => (0 to 9).map(j => s"e${i}y$j").mkString(" ")
    def mk(inBatch: Boolean) = {
      val (in, cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp(), tmp())
      cfgFor(in, cp, idx, out).copy(
        nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
        inBatchNearDup = inBatch, noveltyMinMicros = 0L)
    }
    val clean = (1L to 5L).map(i => (i, "en", text(i), s"x$i.ok.org"))
      .toDF("doc_id", "lang", "text", "host")
    val (cfgOn, cfgOff) = (mk(true), mk(false))
    Intake.processBatch(spark, cfgOn, clean, 1L)
    Intake.processBatch(spark, cfgOff, clean, 1L)
    assert(readBatch(java.nio.file.Paths.get(cfgOn.outDir), 1L) ===
      readBatch(java.nio.file.Paths.get(cfgOff.outDir), 1L))
    assert(readRejects(java.nio.file.Paths.get(cfgOn.outDir), 1L) ===
      readRejects(java.nio.file.Paths.get(cfgOff.outDir), 1L))
    // a batch WITH an internal pair still collapses it to the canonical
    val dup = Seq((11L, "en", text(11), "a.ok.org"),
        (12L, "en", text(11), "b.ok.org"), (13L, "en", text(13), "c.ok.org"))
      .toDF("doc_id", "lang", "text", "host")
    Intake.processBatch(spark, cfgOn, dup, 2L)
    val rej2 = readRejects(java.nio.file.Paths.get(cfgOn.outDir), 2L)
    assert(rej2.exists(r => r._1 == 12L && r._2 == "in_batch_near_dup" &&
      r._3 == "canonical:11"), s"$rej2")
  }

  test("randomized crash soak (seeded, compact): batches killed at random " +
    "state-mutation seams and replayed produce outputs identical to an " +
    "uncrashed control — the whole-surface form of the per-seam crash " +
    "contracts (graft.tools.CrashSoak is the long-horizon variant)") {
    val (crashed, seams) = graft.tools.CrashSoak.run(
      spark, nBatches = 8, seed = 19L, twoTier = false)
    assert(crashed >= 4, s"soak too tame: $crashed crashes, seams $seams")
  }

  // deterministic ±1 hypercube corners (32 dims, murmur3-fmix bits):
  // distinct ids sit near cosine 0 — measured worst |cos| 0.75 over ids
  // 1..299 — so at tau=0.9 only copied vectors match (the CrashSoak
  // construction)
  private def semEmb(i: Long): Seq[Float] = (0 until 32).map { j =>
    var v = i * 2654435761L + j * 40503L
    v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
    v ^= v >>> 33
    if ((v & 1L) == 0L) 1f else -1f
  }

  test("semantic gate: an embedding near-dup (fresh text, copied vector) of " +
    "an earlier batch's doc is dropped as semantic_dup via the stored " +
    "sign-LSH index, including THROUGH a compaction fold; null-emb docs " +
    "pass and contribute no state; a lexical near-dup still dies at the " +
    "lexical stage (precedence); flat and bucketed layouts agree; replay " +
    "byte-identical; geometry markers pin the index") {
    // disjoint per-doc vocabulary: no lexical matches unless planted
    val text = (i: Long) => (0 to 9).map(j => s"m${i}k$j").mkString(" ")
    def doc(i: Long, embOf: Option[Long], textOf: Long = -1L) =
      (i, if (i % 2 == 0) "en" else "de",
        text(if (textOf >= 0) textOf else i), s"x$i.ok.org",
        embOf.map(semEmb))
    def batchDf(rows: Seq[(Long, String, String, String, Option[Seq[Float]])]) =
      rows.toDF("doc_id", "lang", "text", "host", "emb")
    // batch 1: docs 1-4 with embeddings, doc 5 null-emb
    val b1 = batchDf(Seq(doc(1, Some(1)), doc(2, Some(2)), doc(3, Some(3)),
      doc(4, Some(4)), doc(5, None)))
    // batch 2: 11 = semantic plant of 1 (fresh text, 1's vector);
    // 12 = LEXICAL copy of 2 carrying 2's vector (must die at near_dup,
    // not semantic — stage precedence); 13 fresh; 14 null-emb
    val b2 = batchDf(Seq(doc(11, Some(1)), doc(12, Some(2), textOf = 2),
      doc(13, Some(13)), doc(14, None)))
    // batch 3 probes THROUGH the fold (compactEvery=1 folds state at
    // batch 2/3 starts): 21 = semantic plant of 3; 22 fresh
    val b3 = batchDf(Seq(doc(21, Some(3)), doc(22, Some(22))))

    def run(buckets: Int): Intake.Config = {
      val (in, cp, idx, out, corp) = (tmp(), tmp(), tmp(), tmp(), tmp())
      val cfg = cfgFor(in, cp, idx, out).copy(
        nearDupThreshold = Some(0.5), corpusDir = Some(corp.toString),
        semanticThreshold = Some(0.9), noveltyMinMicros = 0L,
        compactEvery = 1, stateBuckets = buckets)
      Seq(1L -> b1, 2L -> b2, 3L -> b3).foreach { case (id, df) =>
        Intake.processBatch(spark, cfg, df, id) }
      cfg
    }
    val bucketed = run(8)
    val outB = java.nio.file.Paths.get(bucketed.outDir)
    val rej2 = readRejects(outB, 2L)
    assert(rej2.contains((11L, "semantic_dup", "semantic_dup_of:1")), s"$rej2")
    assert(rej2.contains((12L, "near_dup", "near_dup_of:2")),
      s"the lexical stage must win precedence: $rej2")
    assert(readBatch(outB, 2L).map(_._1).toSet === Set(13L, 14L),
      "fresh and null-emb docs must survive the gate")
    val rej3 = readRejects(outB, 3L)
    assert(rej3.contains((21L, "semantic_dup", "semantic_dup_of:3")),
      s"the probe must match through the folded embbase/esigbase: $rej3")
    assert(readBatch(outB, 3L).map(_._1).toSet === Set(22L))
    // state parts: null-emb docs contribute nothing; folds landed and
    // retired the deltas (compactEvery=1) — after batch 3 the family is
    // embbase=2 (batch 1+2 survivors: 5 and 14 carried null embs, 11/12/21
    // were rejected) plus the emb=3 delta ({22}; 21 was rejected)
    val corpDir = java.nio.file.Paths.get(bucketed.corpusDir.get)
    assert(spark.read.parquet(s"$corpDir/embbase=2")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 4L, 13L),
      "null-emb and rejected docs must not enter the folded embedding family")
    assert(spark.read.parquet(s"$corpDir/emb=3")
      .collect().map(_.getLong(0)).toSet === Set(22L))
    // layout invariance: flat == bucketed, batch for batch
    val flat = run(0)
    val outF = java.nio.file.Paths.get(flat.outDir)
    (1L to 3L).foreach { k =>
      assert(readBatch(outB, k) === readBatch(outF, k), s"batch $k assignments")
      assert(readRejects(outB, k) === readRejects(outF, k), s"batch $k rejects")
    }
    // replay byte-identical (newest batch, the foreachBatch horizon)
    val before = (readBatch(outB, 3L), readRejects(outB, 3L))
    Intake.processBatch(spark, bucketed, b3, 3L)
    assert((readBatch(outB, 3L), readRejects(outB, 3L)) === before)
    // geometry markers: a mismatched planes/tables run refuses loudly
    val exP = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, bucketed.copy(semanticPlanes = 8), b3, 3L)
    }
    assert(exP.getMessage.contains("semanticPlanes"), s"$exP")
    val exT = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, bucketed.copy(semanticTables = 2), b3, 3L)
    }
    assert(exT.getMessage.contains("semanticTables"), s"$exT")
    // a semantic config without an emb column refuses loudly
    val exE = intercept[IllegalArgumentException] {
      Intake.processBatch(spark, bucketed,
        Seq((31L, "en", text(31), "x.ok.org")).toDF("doc_id", "lang", "text", "host"), 4L)
    }
    assert(exE.getMessage.contains("emb"), s"$exE")
    // telemetry: the semantic families report parts/bytes and the probed
    // buckets; the stage count rode the observation
    val m3 = spark.read.parquet(s"${bucketed.outDir}/metrics/batch=3").head()
    def L(n: String) = m3.getLong(m3.fieldIndex(n))
    assert(L("rej_semantic") === 1L)
    assert(L("esig_parts") > 0L && L("emb_parts") > 0L)
    assert(L("esig_bytes") > 0L && L("emb_bytes") > 0L)
    assert(L("esig_buckets_probed") > 0L,
      "the bucketed probe must report its pruned bucket count")
  }

  test("rebucket soak: Intake.rebucket killed at EVERY migration seam in " +
    "sequence and re-run finishes the job — post-migration batches " +
    "identical to an unmigrated control; ingest refuses mid-migration " +
    "(the semantic families migrate too via CrashSoak's config)") {
    val kills = graft.tools.CrashSoak.rebucketSoak(
      spark, seed = 19L, preBatches = 4, postBatches = 4)
    assert(kills >= 8, s"the walk must kill at every seam at least once: $kills")
  }
}
