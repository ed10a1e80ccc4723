package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Domain blocklist (suffix rule, label-aligned, longest match) and
  * first-occurrence n-gram novelty. */
class UrlNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(hosts: Seq[(Long, String)], entries: Seq[String],
                       maxLabels: Int = 8): Map[Long, Option[String]] = {
    val docs = hosts.toDF("id", "host")
    val bl = entries.toDF("entry")
    UrlFilter.domainBlocklist(docs, "host", Seq("id"), bl, maxLabels = maxLabels)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
  }

  test("blocklist matching is label-aligned: an entry blocks itself and " +
    "subdomains, never a lookalike suffix") {
    val got = verdicts(Seq(
      1L -> "s1.com",        // exact
      2L -> "www.s1.com",    // subdomain
      3L -> "a.b.s1.com",    // deep subdomain
      4L -> "evil-s1.com",   // NOT label-aligned: must pass
      5L -> "s1.com.org",    // entry is not a suffix here: must pass
      6L -> "s2.net"), Seq("s1.com"))
    assert(got(1L) === Some("s1.com"))
    assert(got(2L) === Some("s1.com"))
    assert(got(3L) === Some("s1.com"))
    assert(got(4L) === None, "evil-s1.com shares a string suffix but not a label boundary")
    assert(got(5L) === None)
    assert(got(6L) === None)
  }

  test("the most specific (longest) matching entry wins") {
    val got = verdicts(Seq(1L -> "a.b.s1.com", 2L -> "x.s1.com", 3L -> "y.com"),
      Seq("com", "s1.com", "b.s1.com"))
    assert(got(1L) === Some("b.s1.com"))
    assert(got(2L) === Some("s1.com"))
    assert(got(3L) === Some("com"))
  }

  test("maxLabels bounds the suffix chain: only the last maxLabels labels " +
    "can start a match") {
    val deep = (1 to 10).map(i => s"l$i").mkString(".") // 10 labels
    // a 9-label entry needs a suffix the capped chain no longer generates
    val nineLabelEntry = (2 to 10).map(i => s"l$i").mkString(".")
    val threeLabelEntry = (8 to 10).map(i => s"l$i").mkString(".")
    val got = verdicts(Seq(1L -> deep), Seq(nineLabelEntry), maxLabels = 8)
    assert(got(1L) === None, "9-label suffix must be outside the 8-label cap")
    val got2 = verdicts(Seq(1L -> deep), Seq(nineLabelEntry, threeLabelEntry), maxLabels = 8)
    assert(got2(1L) === Some(threeLabelEntry))
  }

  test("null hosts survive as unblocked; working-column collisions refuse") {
    val docs = Seq((1L, "s1.com"), (2L, null.asInstanceOf[String])).toDF("id", "host")
    val bl = Seq("s1.com").toDF("entry")
    val got = UrlFilter.domainBlocklist(docs, "host", Seq("id"), bl)
      .collect().map(r => r.getLong(0) -> (Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(got(1L) === (Some("s1.com"), true))
    assert(got(2L) === (None, false), "a null host row must not be dropped")

    val collide = Seq((1L, "s1.com", "x")).toDF("id", "host", "blocked")
    val ex = intercept[IllegalArgumentException] {
      UrlFilter.domainBlocklist(collide, "host", Seq("id"), bl)
    }
    assert(ex.getMessage.contains("blocked"))
  }

  test("ngram novelty: ownership by earliest id, exact micro shares, " +
    "short docs keep a null ratio") {
    val docs = Seq((1L, "a b c"), (2L, "b c d"), (3L, "a b"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = Novelty.ngramNovelty(docs, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 2L, 1000000L)), "doc 1 owns both its grams")
    assert(got(2L) === ((2L, 1L, 500000L)), "'b c' is owned by doc 1; 'c d' is new")
    assert(got(3L) === ((1L, 0L, 0L)), "'a b' was claimed by doc 1")
    assert(got(4L) === ((0L, 0L, -1L)), "a 1-word doc has no 2-grams and a null ratio")
  }

  test("ngram novelty conservation: owned grams across docs = distinct " +
    "grams in the corpus; an exact duplicate owns nothing") {
    val base = (1L to 40L).map(i =>
      (i, (0 to 11).map(j => s"w${(i * 7 + j * 3) % 29}").mkString(" ")))
    val docs = (base :+ (41L -> base.head._2)).toDF("doc_id", "text")
    val res = Novelty.ngramNovelty(docs, "doc_id", "text", n = 3).collect()
    val totalNovel = res.map(_.getLong(2)).sum
    val distinctGrams = docs
      .select(explode(expr(
        "array_distinct(transform(sequence(1, size(split(lower(text), ' ')) - 2), " +
          "i -> array_join(slice(split(lower(text), ' '), i, 3), ' ')))")).as("g"))
      .select("g").distinct().count()
    assert(totalNovel === distinctGrams, "each distinct gram is owned exactly once")
    val dup = res.find(_.getLong(0) == 41L).get
    assert(dup.getLong(2) === 0L && dup.getLong(3) === 0L,
      "an exact duplicate of doc 1 owns no grams")
  }

  private def noveltyRows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap

  test("incremental novelty over id-ordered batches equals the batch " +
    "statistic exactly, at every split point") {
    val base = (1L to 30L).map(i =>
      (i, (0 to 9).map(j => s"w${(i * 5 + j * 3) % 17}").mkString(" ")))
    val docs = base.toDF("doc_id", "text")
    val want = noveltyRows(Novelty.ngramNovelty(docs, "doc_id", "text", n = 3))
    for (cut <- Seq(1L, 7L, 15L, 29L)) {
      val b1 = docs.filter(col("doc_id") <= cut)
      val b2 = docs.filter(col("doc_id") > cut)
      val idx = Novelty.gramIndex(b1, "doc_id", "text", n = 3)
      val got = noveltyRows(
        Novelty.ngramNovelty(b1, "doc_id", "text", n = 3)
          .union(Novelty.ngramNoveltyAgainst(idx, b2, "doc_id", "text", n = 3)))
      assert(got === want, s"split at $cut diverged from the batch statistic")
    }
  }

  test("three-batch chain through mergeGramIndex equals batch; a replayed " +
    "batch (index already contains it) scores identically") {
    val base = (1L to 24L).map(i =>
      (i, (0 to 8).map(j => s"t${(i * 7 + j * 5) % 13}").mkString(" ")))
    val docs = base.toDF("doc_id", "text")
    val want = noveltyRows(Novelty.ngramNovelty(docs, "doc_id", "text", n = 2))
    val Seq(b1, b2, b3) = Seq((1L, 8L), (9L, 16L), (17L, 24L)).map { case (lo, hi) =>
      docs.filter(col("doc_id").between(lo, hi)) }
    val idx1 = Novelty.gramIndex(b1, "doc_id", "text", n = 2)
    val idx2 = Novelty.mergeGramIndex(idx1, Novelty.gramIndex(b2, "doc_id", "text", n = 2))
    val got = noveltyRows(
      Novelty.ngramNovelty(b1, "doc_id", "text", n = 2)
        .union(Novelty.ngramNoveltyAgainst(idx1, b2, "doc_id", "text", n = 2))
        .union(Novelty.ngramNoveltyAgainst(idx2, b3, "doc_id", "text", n = 2)))
    assert(got === want)
    // replay idempotency: score b2 against an index that ALREADY folded b2
    val replayed = noveltyRows(
      Novelty.ngramNoveltyAgainst(idx2, b2, "doc_id", "text", n = 2))
    val firstTime = noveltyRows(
      Novelty.ngramNoveltyAgainst(idx1, b2, "doc_id", "text", n = 2))
    assert(replayed === firstTime,
      "a foreachBatch retry after the index update must score identically")
  }

  test("out-of-order intake refuses loudly when it would corrupt a score, " +
    "and passes when gram sets are disjoint (scores provably unaffected)") {
    // index built from doc 10; batch doc 5 SHARES a gram -> the index owner
    // (10) exceeds the batch owner (5), direct evidence of out-of-id-order
    // ingest that voids the incremental-equals-batch contract
    val idx = Novelty.gramIndex(
      Seq((10L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", n = 2)
    val earlier = Seq((5L, "a b x y")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Novelty.ngramNoveltyAgainst(idx, earlier, "doc_id", "text", n = 2).collect()
    }
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(8)
    assert(chain(ex).exists(c =>
      String.valueOf(c.getMessage).contains("out of id order")), s"$ex")
    // disjoint grams: every owner min (hence every score) equals the
    // in-order batch statistic, so the probe is allowed through
    val disjoint = Seq((5L, "p q r s")).toDF("doc_id", "text")
    val got = noveltyRows(
      Novelty.ngramNoveltyAgainst(idx, disjoint, "doc_id", "text", n = 2))
    assert(got(5L) === ((3L, 3L, 1000000L)), s"$got")
  }

  test("index-shape guards refuse non-(gram, owner) frames loudly") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val bad = Seq((1L, 2L)).toDF("g", "o")
    val ex = intercept[IllegalArgumentException] {
      Novelty.ngramNoveltyAgainst(bad, docs, "doc_id", "text", n = 2)
    }
    assert(ex.getMessage.contains("gram"))
    val ex2 = intercept[IllegalArgumentException] {
      Novelty.mergeGramIndex(bad, bad)
    }
    assert(ex2.getMessage.contains("gram"))
  }

  test("gram buckets: the bucket set matches a driver-side pmod over the " +
    "batch's distinct grams, the per-bucket distinct counts sum to the " +
    "batch vocabulary, pruning by the set is lossless, and out-of-range " +
    "bucket counts refuse") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu"),
      (3L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val vocab = Novelty.gramIndex(docs, "doc_id", "text", 3)
      .collect().map(_.getLong(0)).toSet
    val b = 8
    val (bkts, nGrams) = Novelty.gramBucketStats(docs, "doc_id", "text", 3, b)
    assert(nGrams === vocab.size.toLong,
      "per-bucket distinct counts must sum to the batch vocabulary")
    assert(bkts.toSet === vocab.map(g => ((g % b) + b) % b).map(_.toInt),
      "bucket set must be the driver-side pmod of the distinct grams")
    assert(Novelty.gramBuckets(docs, "doc_id", "text", 3, b) === bkts)
    // losslessness of the pruning contract: an index row OUTSIDE the
    // batch's buckets shares no gram with the batch
    val foreign = Novelty.withGramBucket(
        Novelty.gramIndex(docs, "doc_id", "text", 3), b)
      .filter(!col("bkt").isin(bkts: _*)).count()
    assert(foreign === 0L, "a batch gram can never live outside its buckets")
    val ex = intercept[IllegalArgumentException] {
      Novelty.gramBuckets(docs, "doc_id", "text", 3, 0)
    }
    assert(ex.getMessage.contains("numBuckets"))
    val ex2 = intercept[IllegalArgumentException] {
      Novelty.gramBucket(col("g"), Novelty.MaxBuckets + 1)
    }
    assert(ex2.getMessage.contains("numBuckets"))
  }
}
