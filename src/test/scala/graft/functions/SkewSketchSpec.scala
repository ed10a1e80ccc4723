package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale utilities: salted skew join (result-identical to the plain join,
  * hot key scattered) and the KMV distinct sketch (bounded partials,
  * deterministic estimate). */
class SkewSketchSpec extends SparkSpec {

  test("saltedJoin equals the plain join and scatters the hot key") {
    import spark.implicits._
    // 10k rows of one hot key + a uniform tail - the shape that wedges one
    // reducer in an unsalted shuffle join.
    val probe = spark.range(12000)
      .select(when(col("id") < 10000, 7L).otherwise(col("id") % 100).as("k"),
        col("id").as("row_id"))
    val build = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("v"))

    val salted = Skew.saltedJoin(probe, build, key = "k", probeUniquifier = "row_id", salt = 8)
      .select("k", "row_id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val plain = probe.join(build, "k").select("k", "row_id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(salted.toSeq === plain.toSeq, "salting must not change the join result")

    // The hot key's probe rows must actually spread over all 8 sub-keys.
    val spread = probe.filter(col("k") === 7L)
      .select(pmod(xxhash64(col("k"), col("row_id")), lit(8L)).as("s"))
      .distinct().count()
    assert(spread === 8L, "hot key must scatter across the full salt space")
  }

  test("KMV sketch: deterministic, within 10% on a known ndv, small-range exact") {
    import spark.implicits._
    // 50k rows over exactly 5000 distinct values.
    val df = spark.range(50000).select((col("id") % 5000).as("v"))
    val r1 = Sketch.kmvDistinct(df, col("v"), k = 256).collect().head
    val r2 = Sketch.kmvDistinct(df, col("v"), k = 256).collect().head
    assert(r1 === r2, "sketch must be deterministic")
    assert(r1.getLong(0) === 256L)
    val est = r1.getDouble(2)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est vs true 5000")
    // Fewer distincts than k -> exact count, not an extrapolation.
    val small = Sketch.kmvDistinct(spark.range(100).toDF("v"), col("v"), k = 256).collect().head
    assert(small.getLong(0) === 100L && small.getDouble(2) === 100.0)
  }

  test("kMinHashes partials are lossless vs the naive global form") {
    import spark.implicits._
    val df = spark.range(20000).select((col("id") * 37 % 9973).as("v")).repartition(16)
    val viaPartials = Sketch.kMinHashes(df, col("v"), k = 64)
      .collect().map(_.getLong(0)).toSeq
    val naive = df.select(Sketch.hash60(col("v")).as("h"))
      .distinct().orderBy("h").limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(viaPartials === naive)
  }

  test("Bloom: no false negatives; false positives deterministic and near fill^k") {
    val m = 4096; val k = 3
    val build = spark.range(500).select(concat(lit("key"), col("id")).as("v"))
    val bits = Bloom.build(build, col("v"), m, k)
    assert(build.filter(!Bloom.mightContain(bits, col("v"), m, k)).count() === 0L,
      "a bloom filter must never reject an inserted key")
    // bit-identical rebuild regardless of partitioning
    val bits2 = Bloom.build(build.repartition(13), col("v"), m, k)
    assert(bits.toSeq === bits2.toSeq, "filter content must be partition-independent")
    // false positives: present at this load factor, near theory, and the
    // SAME keys on every probe (md5 double hashing — no engine randomness)
    val probe = spark.range(10000).select(concat(lit("other"), col("id")).as("v"))
    def fps() = probe.filter(Bloom.mightContain(bits, col("v"), m, k))
      .collect().map(_.getString(0)).sorted.toSeq
    val fp1 = fps()
    assert(fp1 === fps(), "false positives must be deterministic")
    val expect = math.pow(Bloom.fillRatio(bits), k) * 10000
    assert(fp1.nonEmpty && fp1.size <= expect * 3 + 10,
      s"fp count ${fp1.size} should be positive and near the fill^k bound $expect")
  }

  test("Bloom: OR-merging two shard filters equals the filter over the union") {
    val m = 1024; val k = 4
    val a = spark.range(0, 300).select(col("id").cast("string").as("v"))
    val b = spark.range(300, 700).select(col("id").cast("string").as("v"))
    val merged = Bloom.build(a, col("v"), m, k).zip(Bloom.build(b, col("v"), m, k))
      .map { case (x, y) => x | y }
    val whole = Bloom.build(a.union(b), col("v"), m, k)
    assert(merged.toSeq === whole.toSeq,
      "sketch union must be the bitwise OR — filters compose across shards/days")
  }

  test("Bloom pre-hashed path: no false negatives, partition-independent, " +
    "expression probe agrees with the build's imperative arithmetic") {
    val m = 2048; val k = 3
    // well-mixed non-negative 58-bit hashes, the ngramHashesMod shape
    val hs = spark.range(400)
      .select((Sketch.hash60(col("id")) % 288230376151711717L).as("h"))
    val bits = Bloom.buildFromHashes(hs, col("h"), m, k)
    assert(bits.toSeq === Bloom.buildFromHashes(hs.repartition(7), col("h"), m, k).toSeq)
    assert(hs.filter(!Bloom.mightContainHash(bits, col("h"), m, k)).count() === 0L,
      "expression probe must accept every inserted hash (no false negatives ⇒ " +
        "probe and build compute identical positions)")
    // negatives mostly rejected at this load factor
    val others = spark.range(400, 5400)
      .select((Sketch.hash60(col("id")) % 288230376151711717L).as("h"))
    val fp = others.filter(Bloom.mightContainHash(bits, col("h"), m, k)).count()
    val bound = math.pow(Bloom.fillRatio(bits), k) * 5000 * 3 + 10
    assert(fp <= bound, s"fp count $fp exceeds the fill^k bound $bound")
    // negative hash violates the pre-hashed contract LOUDLY
    val ex = intercept[org.apache.spark.SparkException] {
      Bloom.buildFromHashes(spark.range(1).select(lit(-5L).as("h")), col("h"), m, k)
    }
    assert(ex.getMessage != null)
  }

  test("Bloom.sizeFor: derived (m, k) hits the target fp empirically; ceiling refused") {
    val n = 2000
    val (m, k) = Bloom.sizeFor(n, targetFp = 0.01)
    assert(m % 64 === 0 && k >= 1)
    val build = spark.range(n).select(concat(lit("key"), col("id")).as("v"))
    val bits = Bloom.build(build, col("v"), m, k)
    // design-point fill is ~0.5; observed fp on 20k non-members near 1%
    val probes = 20000
    val fp = spark.range(probes).select(concat(lit("zz"), col("id")).as("v"))
      .filter(Bloom.mightContain(bits, col("v"), m, k)).count()
    assert(fp <= probes * 0.01 * 3 + 10, s"observed fp $fp/$probes far over the 1% target")
    assert(fp.toDouble / probes >= 0.0005 || fp == 0, "sanity: rate is a rate")
    // the sized build passes the saturation gate its fixed-m cousins can fail
    Bloom.requireUnsaturated(bits, k, maxFp = 0.05)
    // a build side beyond the 2^30 engine ceiling is refused, not clamped
    val e = intercept[IllegalArgumentException] { Bloom.sizeFor(1L << 40, 0.01) }
    assert(e.getMessage.contains("2^30"), e.getMessage)
  }

  test("Bloom.requireUnsaturated refuses a saturated fixed-m build loudly") {
    val m = 64; val k = 4 // 64 bits for 500 keys: saturated by construction
    val bits = Bloom.build(
      spark.range(500).select(col("id").cast("string").as("v")), col("v"), m, k)
    val e = intercept[IllegalArgumentException] { Bloom.requireUnsaturated(bits, k) }
    assert(e.getMessage.contains("saturated") && e.getMessage.contains("sizeFor"),
      e.getMessage)
  }

  test("Bloom.mightContainHash: negative probe hash is defined (pmod), not an " +
    "end-of-array read; h >= 0 results unchanged vs build arithmetic") {
    val m = 2048; val k = 3
    val hs = spark.range(300)
      .select((Sketch.hash60(col("id")) % 288230376151711717L).as("h"))
    val bits = Bloom.buildFromHashes(hs, col("h"), m, k)
    // a negative probe must evaluate to a Boolean, never error, never read
    // bits from the end of the array via a negative element_at index
    val negProbe = spark.range(1000).select((-col("id") - 1).as("h"))
      .filter(Bloom.mightContainHash(bits, col("h"), m, k)).count()
    assert(negProbe >= 0L) // evaluation itself is the assertion (no throw)
    // contractual h >= 0 probes are byte-for-byte the build arithmetic:
    // still zero false negatives after the pmod/unsigned-shift change
    assert(hs.filter(!Bloom.mightContainHash(bits, col("h"), m, k)).count() === 0L)
  }

  test("CMS: null keys are excluded from build and probe (documented contract)") {
    import spark.implicits._
    val d = 4; val w = 512
    val withNulls = Seq(Some("a"), Some("a"), None, Some("b"), None).toDF("v")
    val clean = Seq("a", "a", "b").toDF("v")
    val s1 = Sketch.cmsBuild(withNulls, col("v"), d, w).orderBy("r", "pos")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val s2 = Sketch.cmsBuild(clean, col("v"), d, w).orderBy("r", "pos")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(s1 === s2, "null occurrences must not pollute the sketch frame")
    // a null probe row yields no estimate row (not a phantom 0-estimate)
    val est = Sketch.cmsEstimate(Sketch.cmsBuild(withNulls, col("v"), d, w),
      Seq(Some("a"), None).toDF("v"), "v", d, w).collect()
    assert(est.map(r => r.getString(0) -> r.getLong(1)).toSeq === Seq("a" -> 2L))
  }

  test("CMS: one-sided (est >= exact), exact without collisions, merge = counter sum") {
    val cd = 3; val cw = 512
    val words = spark.range(10000)
      .select(concat(lit("w"), col("id") % 37).as("v"))
    val sketch = Sketch.cmsBuild(words, col("v"), cd, cw)
    assert(sketch.count() <= cd.toLong * cw, "sketch frame is bounded by d*w")
    val exact = words.groupBy("v").agg(count(lit(1)).as("exact"))
    val est = Sketch.cmsEstimate(sketch, exact.select("v"), "v", cd, cw)
      .join(exact, "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length === 37)
    assert(est.forall { case (_, e, x) => e >= x }, "count-min never undercounts")
    // 37 keys into 512 counters x 3 rows: the min row is collision-free
    assert(est.forall { case (_, e, x) => e === x },
      s"expected exact estimates at this occupancy: ${est.filter(t => t._2 != t._3).toSeq}")
    // a crowded width FORCES collisions and still never undercounts
    val tiny = Sketch.cmsBuild(words, col("v"), cd, 8)
    val estT = Sketch.cmsEstimate(tiny, exact.select("v"), "v", cd, 8)
      .join(exact, "v").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(estT.forall { case (e, x) => e >= x })
    assert(estT.exists { case (e, x) => e > x }, "8 counters for 37 keys must collide")
    // shard merge: union-sum of two half-corpus sketches == whole-corpus sketch
    val h1 = words.filter(col("v") <= "w2"); val h2 = words.filter(col("v") > "w2")
    val mergedSketch = Sketch.cmsBuild(h1, col("v"), cd, cw)
      .union(Sketch.cmsBuild(h2, col("v"), cd, cw))
      .groupBy("r", "pos").agg(sum("cnt").as("cnt"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("r", "pos").collect().map(_.toSeq.map(_.toString)).toSeq
    assert(rows(mergedSketch) === rows(sketch),
      "sketches must merge by counter-wise sum")
  }
}
