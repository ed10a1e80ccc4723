package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Selection operators: the two-phase token-budget plan must equal the naive
  * per-document running-total oracle on seeded random inputs (including score
  * ties and strata whose first document already busts the budget), and the
  * stratified sample must be deterministic and nested under rate increases. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def naiveBudget(rows: Seq[(String, Long, Long, Long)], budget: Long)
      : Seq[(String, Long, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (st, docs) =>
      var cum = 0L
      docs.sortBy(d => (-d._3, d._2)).flatMap { case (_, id, score, tok) =>
        cum += tok
        if (cum <= budget) Some((st, id, score, tok, cum)) else None
      }
    }.sortBy(r => (r._1, r._2))

  test("sequence packing: windows fill exactly, documents split losslessly, " +
    "bucket-decomposed plan equals the naive global prefix sum") {
    val rnd = new Random(50)
    val docs = (1L to 300L).map(id => (id, 1L + rnd.nextInt(40))).toDF("doc_id", "tok")
    val T = 64L
    val got = Selection.packSequences(docs, "doc_id", col("tok"), T)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    // lossless: every document's in-bin lengths sum to its token count
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._6).sum === rows.head._2, s"doc $id split lost tokens")
    }
    // windows fill EXACTLY to T (the last may be short), bins dense from 0
    val byBin = got.groupBy(_._4).toSeq.sortBy(_._1)
    assert(byBin.map(_._1) === (0L until byBin.size).toSeq, "bins must be dense")
    byBin.dropRight(1).foreach { case (bin, rows) =>
      assert(rows.map(_._6).sum === T, s"bin $bin not full")
    }
    assert(byBin.last._2.map(_._6).sum <= T)
    // coordinates: a document's window slice starts where the previous ended
    got.foreach { case (id, _, gstart, bin, off, len) =>
      assert(off >= 0 && off < T && len >= 1 && off + len <= T, s"doc $id bin $bin")
      assert(math.max(gstart, bin * T) === bin * T + off)
    }
    // equals the naive single-window global prefix sum in the same order
    val naiveOrder = docs.withColumn("__h",
        Dedup.shingleHash(concat_ws(":", lit("pack"), col("doc_id"))))
      .select(col("doc_id"), col("tok"), col("__h"), (col("__h") % 4096).as("__b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(2)))
      .sortBy(r => (r._3, r._4, r._1))
    var cum = 0L
    val naive = naiveOrder.flatMap { case (id, tok, _, _) =>
      val start = cum; cum += tok
      (start / T to (cum - 1) / T).map(bin => (id, tok, start, bin,
        math.max(start - bin * T, 0L),
        math.min(cum, (bin + 1) * T) - math.max(start, bin * T)))
    }
    assert(got.sortBy(r => (r._4, r._3)).toSeq === naive.sortBy(r => (r._4, r._3)).toSeq)
  }

  test("chunkWords: stride coverage, overlap identity, short trailing chunk") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ") // 100 words
    val out = Seq(text).toDF("text")
      .select(explode(TextAnalysis.chunkWords(col("text"), 10, 3)).as("c"))
      .select("c.chunk_id", "c.n_words", "c.chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // step 7: chunks start at 0,7,...,98 → ⌈…⌉ = (100-1)/7+1 = 15 chunks
    assert(out.length === 15)
    assert(out.forall(_._2 === 100L))
    out.foreach { case (i, _, chunk) =>
      val ws = chunk.split(" ")
      assert(ws.head === s"w${i * 7 + 1}", s"chunk $i starts wrong")
      assert(ws.length === math.min(10L, 100L - i * 7).toInt, s"chunk $i length")
    }
    // overlap identity: last 3 words of chunk i = first 3 of chunk i+1 when full
    out.sliding(2).foreach {
      case Array((_, _, a), (bId, _, b)) =>
        assert(a.split(" ").drop(7).toSeq === b.split(" ").take(3).toSeq,
          s"overlap broken entering chunk $bId")
      case _ => ()
    }
    // single-word and empty documents chunk to exactly one chunk
    val tiny = Seq("solo", "").toDF("text")
      .select(explode(TextAnalysis.chunkWords(col("text"), 10, 3)).as("c"))
      .select("c.chunk_text").collect().map(_.getString(0))
    assert(tiny.toSeq === Seq("solo", ""))
  }

  test("token budget equals the naive running-total oracle on seeded inputs") {
    val rnd = new Random(7)
    for (trial <- 1 to 4) {
      // Few distinct scores → heavy ties, the case the level-offset plan
      // must get right (within-level cumulation ordered by id).
      val rows = (1L to 200L).map { id =>
        (s"s${rnd.nextInt(4)}", id, rnd.nextInt(6).toLong, 1L + rnd.nextInt(50)) }
      val budget = 200L + rnd.nextInt(400)
      val got = Selection.tokenBudget(rows.toDF("stratum", "id", "score", "tok"),
          "stratum", "id", col("score"), col("tok"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(r => (r._1, r._2))
      assert(got.toSeq === naiveBudget(rows, budget), s"trial $trial budget=$budget")
    }
  }

  test("a stratum whose best level alone exceeds the budget keeps only fitting docs") {
    val rows = Seq(("a", 1L, 9L, 70L), ("a", 2L, 9L, 40L), ("a", 3L, 5L, 1L)).toDF(
      "stratum", "id", "score", "tok")
    val got = Selection.tokenBudget(rows, "stratum", "id", col("score"), col("tok"), 100L)
      .collect().map(r => (r.getLong(1), r.getLong(4))).sortBy(_._1)
    // id=1 (cum 70) fits; id=2 (cum 110) busts; id=3 starts past budget? No:
    // level 5 starts at prev_tok=110 >= 100 → pruned entirely.
    assert(got.toSeq === Seq((1L, 70L)))
  }

  test("stratified sample is deterministic, rate-monotone (nested), and stratum-scoped") {
    val docs = (1L to 500L).map(id => (id, if (id % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def sample(enPm: Long, dePm: Long): Set[Long] =
      Selection.stratifiedSample(docs, "lang", "doc_id",
          when(col("lang") === "en", lit(enPm)).otherwise(lit(dePm)))
        .select("doc_id").as[Long].collect().toSet
    val s1 = sample(200, 500)
    assert(s1 === sample(200, 500), "identical rates → identical sample")
    val s2 = sample(400, 700)
    assert(s1.subsetOf(s2), "raising rates must strictly grow the sample (nested)")
    // Rates land near their targets (hash uniformity, not exactness).
    val en = docs.filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val enKept = s1.intersect(en).size.toDouble / en.size
    assert(enKept > 0.1 && enKept < 0.3, s"en keep-rate ~0.2, got $enKept")
  }

  /** Driver-side replica of [[Dedup.shingleHash]]: first 60 bits of md5. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("export shuffle: deterministic permutation, hash-routed shards, dense positions") {
    val docs = (1L to 300L).map(id => (id, s"t$id")).toDF("doc_id", "text")
    def run(seed: String) = Selection.exportShuffle(docs, "doc_id", seed, numShards = 8)
      .select("shard", "pos", "doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

    val got = run("r6")
    assert(got === run("r6"), "same seed → identical order (no RNG state)")
    assert(got.map(_._3).sorted === (1L to 300L), "a permutation: every doc exactly once")
    // naive oracle: route by H(seed:id) mod 8, order by (H, id)
    val expected = (1L to 300L).map(id => (id, h60(s"r6:$id")))
      .groupBy(_._2 % 8).toSeq.flatMap { case (shard, members) =>
        members.sortBy { case (id, h) => (h, id) }.zipWithIndex
          .map { case ((id, _), i) => (shard.toInt, (i + 1).toLong, id) }
      }.toSet
    assert(got.toSet === expected, "shard routing + within-shard order match the hash oracle")
    got.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted === (1L to rows.size).map(_.toLong),
        s"shard $shard positions must be dense 1..n")
    }
    // a different seed is an independent order, not a relabeling
    val other = run("other-seed")
    assert(other.toSet !== got.toSet)
  }

  test("source mixing: ranks match the naive per-source window; prefixes track weights") {
    import org.apache.spark.sql.functions.col
    val sources = Seq(("a", 100L), ("b", 200L), ("c", 300L))
    val docs = sources.flatMap { case (s, _) => (1L to 60L).map(i => (s, s.hashCode * 1000L + i)) }
      .toDF("source", "id")
    val weights = sources.toDF("source", "weight")
    val got = Selection.mixSources(docs, "source", "id", weights)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // rank oracle: per source, order by (H mod 4096, H, id) — the level-offset
    // decomposition must equal this single-window form
    val bySource = docs.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rows) =>
        s -> rows.map(_._2).sortBy { id =>
          val h = h60(s"mix:$s:$id"); (h % 4096, h, id)
        }.zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
      }
    got.foreach { case (s, id, rank, coord) =>
      assert(rank === bySource(s)(id), s"rank mismatch for $s/$id")
      val w = sources.toMap.apply(s)
      assert(coord === rank * 1000000L / w, "stride coordinate")
    }
    // prefix proportionality: in (coord, source, id) order, a prefix holds
    // each source near its weight share (stride scheduling is within one
    // item of ideal per source at any cut)
    val ordered = got.sortBy(t => (t._4, t._1, t._2))
    val prefix = ordered.take(30).groupBy(_._1).view.mapValues(_.size).toMap
    assert((prefix.getOrElse("a", 0) - 5).abs <= 1 &&
      (prefix.getOrElse("b", 0) - 10).abs <= 1 &&
      (prefix.getOrElse("c", 0) - 15).abs <= 1,
      s"30-doc prefix should split ~5/10/15, got $prefix")
  }

  test("source mixing fails loudly on a missing or non-positive weight") {
    val docs = Seq(("a", 1L), ("b", 2L)).toDF("source", "id")
    val partial = Seq(("a", 100L)).toDF("source", "weight") // b missing
    val e = intercept[Exception] {
      Selection.mixSources(docs, "source", "id", partial).collect()
    }
    assert(e.getMessage != null && e.toString.contains("mixSources"),
      s"missing weight must raise, not silently drop the source: $e")
    val zero = Seq(("a", 100L), ("b", 0L)).toDF("source", "weight")
    val e2 = intercept[Exception] {
      Selection.mixSources(docs, "source", "id", zero).collect()
    }
    assert(e2.toString.contains("mixSources"))
  }

  test("scrub redacts urls/emails, collapses whitespace, and is idempotent") {
    val rows = Seq(
      (1L, "see https://a.b/c?x=1 and http://d.e for info"),
      (2L, "mail me at bob.smith@corp.example.com  today"),
      (3L, "already clean text"),
      (4L, "tabs\tand\r\nnewlines   everywhere "),
      (5L, ""))
    val got = rows.toDF("id", "t")
      .select(col("id"), TextAnalysis.scrub(col("t")).as("c"),
        TextAnalysis.scrub(TextAnalysis.scrub(col("t"))).as("cc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got(0)._2 === "see <url> and <url> for info")
    assert(got(1)._2 === "mail me at <email> today")
    assert(got(2)._2 === "already clean text")
    assert(got(3)._2 === "tabs and newlines everywhere")
    assert(got(4)._2 === "")
    got.foreach { case (id, c, cc) => assert(c === cc, s"scrub must be idempotent (id=$id)") }
  }

  test("repetition signals match a driver-side count oracle") {
    val texts = Seq(
      (1L, "spam spam spam spam eggs"),
      (2L, "a b c d e f g"),
      (3L, "x y x y x y x y"),
      (4L, "solo"))
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.repetitionSignals(col("text")).as("r"))
      .select("doc_id", "r.n_words", "r.top_word_pm", "r.dup_word_pm", "r.top_bigram_pm", "r.repetitive")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .sortBy(_._1)
    def pm(a: Long, b: Long) = if (b == 0) 0L else 1000L * a / b
    val exp = texts.map { case (id, t) =>
      val ws = t.toLowerCase.split(" ").toSeq
      val bgs = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val topW = ws.groupBy(identity).values.map(_.size).max.toLong
      val topB = if (bgs.isEmpty) 0L else bgs.groupBy(identity).values.map(_.size).max.toLong
      val twp = pm(topW, ws.size); val tbp = pm(topB, bgs.size)
      (id, ws.size.toLong, twp, pm(ws.size - ws.distinct.size, ws.size), tbp,
        twp > 300 || tbp > 200)
    }
    assert(got.toSeq === exp)
  }

  test("quantileCut finds the exact k-th smallest: naive sorted oracle, " +
    "duplicate-heavy scores, tiny buckets, full-keep edge") {
    import spark.implicits._
    // seeded scores with heavy duplication (mod 17 collapses many values)
    val rows = (1L to 400L).map { id =>
      val h = graft.llm.Dedup.MinhashP
      (id, ((id * 1000003L + 7L) % h) % 17L * 1000L + (id % 3L))
    }
    def naive(pct: Int): (Long, Set[Long]) = {
      val sorted = rows.map(_._2).sorted
      val k = (pct.toLong * rows.size + 99) / 100
      val thr = sorted(k.toInt - 1)
      (thr, rows.filter(_._2 <= thr).map(_._1).toSet)
    }
    for (pct <- Seq(1, 30, 50, 100); buckets <- Seq(2, 7, 4096)) {
      val got = Selection.quantileCut(rows.toDF("id", "s"), "id", "s", pct,
          maxBuckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val (thr, keep) = naive(pct)
      assert(got.forall(_._2 == thr), s"pct=$pct buckets=$buckets: wrong threshold " +
        s"${got.headOption.map(_._2)}, want $thr")
      assert(got.map(_._1).toSet === keep, s"pct=$pct buckets=$buckets: wrong keep set")
    }
  }

  test("domainCap: at most cap per domain, small domains intact, seeded order, " +
    "plans a per-key top-k (WindowGroupLimit)") {
    import spark.implicits._
    // skewed domains: domain d_j holds ~ 400/(j+1) docs (zipf-ish)
    val rows = (1L to 600L).map(id => (id, s"d${id % 7}.example.com"))
    val df = rows.toDF("doc_id", "domain")
    val capped = Selection.domainCap(df, "domain", "doc_id", cap = 30, seed = "s")
    val byDomain = capped.groupBy("domain").agg(count(lit(1)).as("n"),
        max("pos").as("maxPos")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val trueSizes = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    trueSizes.foreach { case (dom, sz) =>
      val (kept, maxPos) = byDomain(dom)
      assert(kept === math.min(sz, 30L), s"$dom: kept $kept of $sz at cap 30")
      assert(maxPos === kept, s"$dom: pos must be dense 1..kept")
    }
    // deterministic: same kept set on re-run and under repartitioning
    def keptIds(d: org.apache.spark.sql.DataFrame) =
      Selection.domainCap(d, "domain", "doc_id", cap = 30, seed = "s")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds(df) === keptIds(df.repartition(17)))
    // a different seed keeps a different (but equally-sized) set
    val other = Selection.domainCap(df, "domain", "doc_id", cap = 30, seed = "t")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(other.size === keptIds(df).size)
    assert(other !== keptIds(df))
    // the pos <= cap filter must ride the window as a per-key top-k:
    // map tasks then keep at most cap rows per domain BEFORE the shuffle
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected InferWindowGroupLimit to bound the window:\n$plan")
  }

  test("weightedSystematic: exactly k picks, PPS multiplicity for heavy docs, " +
    "partition-independent, refuses W < k") {
    import spark.implicits._
    // one massive doc among many light ones: it must absorb several grid hits
    val docs = ((1L to 50L).map(i => (i, 10L)) :+ (99L, 1000L)).toDF("doc_id", "toks")
    def run(df: org.apache.spark.sql.DataFrame, k: Long) =
      Selection.weightedSystematic(df, "doc_id", "toks", k, seed = "s")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val picks = run(docs, 30L)
    assert(picks.map(_._3).sum === 30L, s"sum of n_picks must be exactly k: ${picks.toSeq}")
    // W = 1500, stride = 50: the 1000-weight doc spans ≥ 19 grid points
    val heavy = picks.find(_._1 == 99L).map(_._3).getOrElse(0L)
    assert(heavy >= 19L && heavy <= 21L, s"heavy doc multiplicity: $heavy")
    // every pick count is proportional-ish: light docs get 0 or 1
    assert(picks.filter(_._1 != 99L).forall(_._3 === 1L), s"${picks.toSeq}")
    // deterministic across partitionings
    assert(run(docs.repartition(7), 30L).sortBy(_._1).toSeq === picks.sortBy(_._1).toSeq)
    // refusal: total weight below k has no grid
    val tiny = Seq((1L, 3L), (2L, 4L)).toDF("doc_id", "toks")
    val e = intercept[Exception] { run(tiny, 100L) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("weightedSystematic")), msgs(e).mkString(" | "))
  }

  test("weightedSystematic property: sum of n_picks = k for random weights/k") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caseGen = for {
      n <- Gen.chooseNum(1, 40)
      ws <- Gen.listOfN(n, Gen.chooseNum(1L, 50L))
      k <- Gen.chooseNum(1L, math.max(1L, ws.sum)) // k ≤ W: stride ≥ 1
    } yield (ws, k)
    // few Spark rounds (each is a real job): 30 cases is plenty to cover
    // phase/stride/remainder interactions
    val p = Prop.forAll(caseGen) { case (ws, k) =>
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "toks")
      val picks = Selection.weightedSystematic(df, "doc_id", "toks", k, seed = "prop")
        .agg(sum("n_picks")).collect().head.getLong(0)
      picks == k
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, s"exact-k property failed: $r")
  }

  test("splitAssign property: quotas are the exact Hamilton apportionment " +
    "and sum to n for random strata sizes and weights") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caseGen = for {
      nStrata <- Gen.chooseNum(1, 5)
      sizes <- Gen.listOfN(nStrata, Gen.chooseNum(1, 60))
      nSplits <- Gen.chooseNum(1, 4)
      ws <- Gen.listOfN(nSplits, Gen.chooseNum(1L, 9L))
    } yield (sizes, ws)
    val p = Prop.forAll(caseGen) { case (sizes, ws) =>
      val splits = ws.zipWithIndex.map { case (w, i) => (s"s$i", w) }
      val docs = sizes.zipWithIndex.flatMap { case (sz, si) =>
        (0 until sz).map(j => (si * 10000L + j, s"st$si"))
      }.toDF("doc_id", "lang")
      val got = Selection.splitAssign(docs, "lang", "doc_id", splits, seed = "p")
        .groupBy("stratum", "split").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val W = ws.sum
      sizes.zipWithIndex.forall { case (sz, si) =>
        val base = splits.map { case (nm, w) => nm -> sz * w / W }
        val rem = splits.zipWithIndex.map { case ((nm, w), i) => (nm, sz * w % W, i) }
        val left = sz - base.map(_._2).sum
        val bump = rem.sortBy(t => (-t._2, t._3)).take(left.toInt).map(_._1).toSet
        base.forall { case (nm, q) =>
          val want = q + (if (bump(nm)) 1L else 0L)
          got.getOrElse((s"st$si", nm), 0L) == want
        }
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), p)
    assert(r.passed, s"Hamilton apportionment property failed: $r")
  }

  test("domainCap refuses inputs carrying the reserved __h/pos column names") {
    import spark.implicits._
    val withPos = Seq((1L, "a.com", 9L)).toDF("doc_id", "domain", "pos")
    val e1 = intercept[IllegalArgumentException] {
      Selection.domainCap(withPos, "domain", "doc_id", cap = 5, seed = "s")
    }
    assert(e1.getMessage.contains("'pos'"), e1.getMessage)
    val withH = Seq((1L, "a.com", 9L)).toDF("doc_id", "domain", "__h")
    val e2 = intercept[IllegalArgumentException] {
      Selection.domainCap(withH, "domain", "doc_id", cap = 5, seed = "s")
    }
    assert(e2.getMessage.contains("'__h'"), e2.getMessage)
  }

  test("splitAssign: exact largest-remainder quotas per stratum, disjoint " +
    "total coverage, deterministic, tiny strata handled") {
    import spark.implicits._
    val rnd = new Random(84)
    // strata of sizes 1, 2, 3, 7, 10, 97, 250 — incl. sizes below the
    // split count and sizes where 80/10/10 does not divide evenly
    val sizes = Seq(1, 2, 3, 7, 10, 97, 250)
    val rows = sizes.zipWithIndex.flatMap { case (sz, si) =>
      (0 until sz).map(j => (si * 1000L + j, s"st$si"))
    }
    val docs = rnd.shuffle(rows).toDF("doc_id", "lang")
    val splits = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
    val got = Selection.splitAssign(docs, "lang", "doc_id", splits, seed = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

    // total disjoint coverage: every doc exactly once
    assert(got.length === rows.length)
    assert(got.map(_._1).distinct.length === rows.length)

    // largest-remainder oracle per stratum
    def lr(n: Long): Map[String, Long] = {
      val base = splits.map { case (nm, w) => nm -> n * w / 10 }
      val rem = splits.zipWithIndex.map { case ((nm, w), i) => (nm, n * w % 10, i) }
      val left = n - base.map(_._2).sum
      val bump = rem.sortBy(t => (-t._2, t._3)).take(left.toInt).map(_._1).toSet
      base.map { case (nm, q) => nm -> (q + (if (bump(nm)) 1L else 0L)) }.toMap
    }
    sizes.zipWithIndex.foreach { case (sz, si) =>
      val mine = got.filter(_._2 == s"st$si").groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
      val want = lr(sz).filter(_._2 > 0)
      assert(mine === want, s"stratum st$si (n=$sz): got $mine want $want")
    }

    // ranks are a permutation of 1..n per stratum; split boundaries are
    // contiguous rank ranges in declared order
    sizes.zipWithIndex.foreach { case (sz, si) =>
      val st = got.filter(_._2 == s"st$si").sortBy(_._4)
      assert(st.map(_._4).toSeq === (1L to sz).toSeq)
      val order = st.map(_._3).toSeq
      val want = lr(sz)
      assert(order === Seq.fill(want("train").toInt)("train") ++
        Seq.fill(want("val").toInt)("val") ++ Seq.fill(want("test").toInt)("test"))
    }

    // deterministic: identical on re-run
    val again = Selection.splitAssign(docs, "lang", "doc_id", splits, seed = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)

    // guards
    intercept[IllegalArgumentException] {
      Selection.splitAssign(docs, "lang", "doc_id", Seq("a" -> 1L, "a" -> 2L))
    }
    intercept[IllegalArgumentException] {
      Selection.splitAssign(docs, "lang", "doc_id", Seq("a" -> 0L))
    }
  }

  test("splitAssignContinuing: empty prior IS splitAssign; counters merge; " +
    "guards refuse bad priors loudly") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val splits = Seq("train" -> 3L, "val" -> 1L)
    val emptyPrior = Seq.empty[(String, String, Long)]
      .toDF("stratum", "split", "n_assigned")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val plain = rows(Selection.splitAssign(docs, "lang", "doc_id", splits, seed = "c"))
    val cont = rows(Selection.splitAssignContinuing(
      docs, "lang", "doc_id", splits, emptyPrior, seed = "c"))
    assert(cont === plain, "with no prior, the continuing form IS splitAssign")

    val counters = Selection.splitCounters(
      Selection.splitAssign(docs, "lang", "doc_id", splits, seed = "c"), emptyPrior)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // en: 27 rows -> 3:1 gives (20.25, 6.75) -> Hamilton (20, 7)
    assert(counters(("en", "train")) === 20L && counters(("en", "val")) === 7L, s"$counters")

    intercept[IllegalArgumentException] {
      Selection.splitAssignContinuing(docs, "lang", "doc_id", splits,
        Seq(("en", 1L)).toDF("stratum", "n"), seed = "c")
    }
    val unknown = Seq(("en", "holdout", 3L)).toDF("stratum", "split", "n_assigned")
    val ex = intercept[IllegalArgumentException] {
      Selection.splitAssignContinuing(docs, "lang", "doc_id", splits, unknown, seed = "c")
    }
    assert(ex.getMessage.contains("holdout"), s"$ex")
    val negative = Seq(("en", "train", -1L)).toDF("stratum", "split", "n_assigned")
    val ex2 = intercept[Exception] {
      Selection.splitAssignContinuing(docs, "lang", "doc_id", splits, negative,
        seed = "c").collect()
    }
    assert(Iterator.iterate(ex2: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("n_assigned")), s"$ex2")
  }

  test("groupedQuantile: exact per-group k-th smallest vs a driver-side " +
    "sorted oracle over random groups/values/pcts; guards refuse nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 6) {
      val groups = 1 + rnd.nextInt(4)
      val rows = (1 to 40 + rnd.nextInt(80)).map { _ =>
        (s"g${rnd.nextInt(groups)}", (rnd.nextInt(200) - 100).toLong) }
      val pct = 1 + rnd.nextInt(100)
      // tiny maxBuckets exercises the bucket walk (many values per bucket)
      val mb = Seq(2, 7, 4096)(trial % 3)
      val got = Selection.groupedQuantile(rows.toDF("g", "v"), "g", "v", pct, mb)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        val k = ((sorted.size.toLong * pct + 99) / 100).toInt
        g -> ((sorted.size.toLong, sorted(k - 1)))
      }
      assert(got === want, s"trial $trial pct=$pct mb=$mb")
    }
    val nullV = Seq(("a", Some(1L)), ("a", None)).toDF("g", "v")
    val ex = intercept[Exception] {
      Selection.groupedQuantile(nullV, "g", "v", 50).collect()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("null value")), s"$ex")
  }

  test("groupedQuantiles vector form: every (group, pct) matches the sorted " +
    "oracle in one call, including ranks colliding in one bucket") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 90).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toLong) }
    val pcts = Seq(10, 50, 90, 100)
    // maxBuckets=2 forces many values (and often several pct ranks) into
    // the same bucket — the in-bucket pass must serve them all
    for (mb <- Seq(2, 4096)) {
      val got = Selection.groupedQuantiles(rows.toDF("g", "v"), "g", "v", pcts, mb)
        .collect().map(r => (r.getString(0), r.getInt(2)) -> r.getLong(3)).toMap
      val want = (for {
        (g, vs) <- rows.groupBy(_._1); p <- pcts
      } yield {
        val sorted = vs.map(_._2).sorted
        (g, p) -> sorted((((sorted.size.toLong * p + 99) / 100) - 1).toInt)
      }).toMap
      assert(got === want, s"mb=$mb")
    }
    intercept[IllegalArgumentException] {
      Selection.groupedQuantiles(rows.toDF("g", "v"), "g", "v", Seq(10, 10))
    }
  }

  test("robustOutliers: med/MAD match driver-side exact medians; flags are " +
    "|v-med| > mult*mad; mad=0 groups flag every deviating row") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 11L), ("a", 4L, 13L),
      ("a", 5L, 500L), // the planted outlier
      ("b", 6L, 7L), ("b", 7L, 7L), ("b", 8L, 7L), ("b", 9L, 9L))
    val got = Selection.robustOutliers(rows.toDF("g", "id", "v"), "id", "g", "v",
        madMult = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // group a: sorted [10,11,12,13,500], med = 3rd = 12; devs
    // [2,0,1,1,488] sorted [0,1,1,2,488], mad = 3rd = 1; outlier iff dev > 5
    assert(got(5L) === ((500L, 12L, 1L, true)), s"$got")
    assert(got(1L) === ((10L, 12L, 1L, false)) && got(4L)._4 === false, s"$got")
    // group b: med = 7 (rank 2 of [7,7,7,9]), devs [0,0,0,2] -> mad 0:
    // the deviating row flags, the median-point rows don't
    assert(got(9L) === ((9L, 7L, 0L, true)), s"$got")
    assert(!got(6L)._4 && !got(7L)._4 && !got(8L)._4, s"$got")
  }

  test("splitAssignContinuing pre-aggregates the prior: duplicate " +
    "(stratum, split) rows fold instead of multiplying the bound rows") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, "en")).toDF("doc_id", "lang")
    val splits = Seq("train" -> 3L, "val" -> 1L)
    val merged = Seq(("en", "train", 6L), ("en", "val", 2L))
      .toDF("stratum", "split", "n_assigned")
    // the same counters handed as raw un-merged parts (3+3=6, 1+1=2)
    val parts = Seq(("en", "train", 3L), ("en", "train", 3L),
      ("en", "val", 1L), ("en", "val", 1L))
      .toDF("stratum", "split", "n_assigned")
    def rows(p: org.apache.spark.sql.DataFrame) =
      Selection.splitAssignContinuing(docs, "lang", "doc_id", splits, p, seed = "dup")
        .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    val want = rows(merged)
    val got = rows(parts)
    assert(got === want, "un-merged counter parts must assign identically")
    assert(got.length === 30, "every batch row lands in exactly one split " +
      "(duplicate prior rows would multiply bound rows into overlaps)")
  }

  test("splitAssignContinuing property: over random batch sequences, every " +
    "row lands exactly once and cumulative split sizes track the cumulative " +
    "Hamilton quotas within a small bound") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val splits = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
    val W = 10L
    def hamilton(n: Long): Map[String, Long] = {
      val base = splits.map { case (nm, w) => nm -> (n * w / W) }
      var left = n - base.map(_._2).sum
      val byRem = splits.zipWithIndex
        .sortBy { case ((_, w), i) => (-(n * w % W), i) }.map(_._1._1)
      val bonus = byRem.takeWhile { _ => left -= 1; left >= 0 }.toSet
      base.map { case (nm, q) => nm -> (q + (if (bonus(nm)) 1L else 0L)) }.toMap
    }
    val caseGen = for {
      sizes <- Gen.listOfN(4, Gen.chooseNum(1, 25))
      seed <- Gen.chooseNum(0L, 100000L)
    } yield (sizes, seed)
    val p = Prop.forAllNoShrink(caseGen) { case (sizes, seed) =>
      var prior = Seq.empty[(String, String, Long)].toDF("stratum", "split", "n_assigned")
      var nextId = seed * 1000L
      var cumN = 0L
      var ok = true
      for ((sz, bi) <- sizes.zipWithIndex if ok) {
        val batch = (1 to sz).map { j => nextId += 1; (nextId, "en") }
          .toDF("doc_id", "lang")
        val asg = Selection.splitAssignContinuing(
          batch, "lang", "doc_id", splits, prior, seed = s"p$seed:$bi")
        val got = asg.collect()
        ok &&= got.length == sz && got.map(_.getLong(0)).distinct.length == sz
        prior = Selection.splitCounters(asg, prior)
        cumN += sz
        val counts = prior.collect()
          .map(r => r.getString(1) -> r.getLong(2)).toMap.withDefaultValue(0L)
        val want = hamilton(cumN)
        val dev = splits.map { case (nm, _) => math.abs(counts(nm) - want(nm)) }.max
        ok &&= dev <= splits.size
        if (!ok) println(s"seed=$seed sizes=$sizes batch=$bi counts=$counts want=$want")
      }
      ok
    }
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(914L))
    val r = SCTest.check(params, p)
    assert(r.passed, s"continuing-split property failed: $r")
  }

  test("splitAssign refuses null strata loudly instead of silently dropping " +
    "the rows from every split") {
    import spark.implicits._
    val docs = Seq((1L, Some("en")), (2L, None), (3L, Some("de")))
      .toDF("doc_id", "lang")
    val ex = intercept[Exception] {
      Selection.splitAssign(docs, "lang", "doc_id", Seq("train" -> 1L)).collect()
    }
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(8)
    assert(chain(ex).exists(c =>
      String.valueOf(c.getMessage).contains("splitAssign: null")), s"$ex")
  }
}
