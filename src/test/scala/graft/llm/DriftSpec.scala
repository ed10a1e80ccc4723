package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-ECDF KS drift: hand-checked distances, identical/disjoint
  * extremes, step-carry across the other group's values, null refusal. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def d(rows: Seq[(String, Long)]): Map[(String, String), Long] =
    Drift.ecdfDrift(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap

  test("hand-computed KS distance, including the step-carry at values only " +
    "one group observes") {
    // A = {1,2,3,4}, B = {3,4,5,6}: ECDFs diverge most on [2,4) -> 500000.
    // Values 5 and 6 exist only in B — A's ECDF must CARRY 1e6 there.
    val got = d(Seq("A" -> 1L, "A" -> 2L, "A" -> 3L, "A" -> 4L,
      "B" -> 3L, "B" -> 4L, "B" -> 5L, "B" -> 6L))
    assert(got(("A", "B")) === 500000L)
  }

  test("identical distributions read 0; disjoint-shifted read 1000000") {
    val same = d(Seq("A" -> 1L, "A" -> 7L, "B" -> 1L, "B" -> 7L))
    assert(same(("A", "B")) === 0L)
    val far = d(Seq("A" -> 1L, "A" -> 2L, "B" -> 10L, "B" -> 11L))
    assert(far(("A", "B")) === 1000000L)
  }

  test("property: d is bounded in [0, 1e6], zero iff identical multisets, " +
    "and matches a driver-side ECDF oracle on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caseGen = for {
      na <- Gen.chooseNum(1, 30); nb <- Gen.chooseNum(1, 30)
      a <- Gen.listOfN(na, Gen.chooseNum(0L, 12L))
      b <- Gen.listOfN(nb, Gen.chooseNum(0L, 12L))
    } yield (a, b)
    val p = Prop.forAll(caseGen) { case (a, b) =>
      val got = d(a.map("A" -> _) ++ b.map("B" -> _))(("A", "B"))
      val vals = (a ++ b).distinct.sorted
      def ecdfs(v: Long) = (a.count(_ <= v).toLong * 1000000L / a.size,
        b.count(_ <= v).toLong * 1000000L / b.size)
      val want = vals.map { v => val (ea, eb) = ecdfs(v); math.abs(ea - eb) }.max
      // Both directions asserted separately: identical multisets MUST read
      // 0, and 0 MUST mean the normalized (integer-micros) ECDFs agree at
      // every observed value — NOT identical multisets ([1] vs [1,1]
      // legitimately reads 0: equal empirical distributions).
      val identicalReadsZero = a.sorted != b.sorted || got == 0L
      val zeroMeansEqualEcdf = got != 0L ||
        vals.forall { v => val (ea, eb) = ecdfs(v); ea == eb }
      got == want && got >= 0 && got <= 1000000L &&
        identicalReadsZero && zeroMeansEqualEcdf
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), p)
    assert(r.passed, s"ECDF-drift property failed: $r")
  }

  test("three groups produce all three unordered pairs; null values refuse") {
    val got = d(Seq("A" -> 1L, "B" -> 2L, "C" -> 3L))
    assert(got.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    val withNull = Seq(("A", Some(1L)), ("B", None)).toDF("g", "v")
    val ex = intercept[Exception] {
      Drift.ecdfDrift(withNull, "g", "v").collect()
    }
    assert(ex.getMessage.contains("ecdfDrift") ||
      Option(ex.getCause).exists(_.getMessage.contains("ecdfDrift")), s"$ex")
  }

  test("null GROUPS refuse loudly instead of silently dropping a slice") {
    val withNullGroup = Seq((Some("A"), 1L), (None, 2L), (Some("B"), 3L))
      .toDF("g", "v")
    val ex = intercept[Exception] {
      Drift.ecdfDrift(withNullGroup, "g", "v").collect()
    }
    def msg(t: Throwable) = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .take(8).exists(c => String.valueOf(c.getMessage).contains("null g"))
    assert(msg(ex), s"$ex")
  }

  test("bounded-domain contract is guarded: a high-cardinality value column " +
    "refuses loudly at call time instead of building a corpus-scale grid") {
    val wide = spark.range(0, 300).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS g", "id AS v")
    val ex = intercept[IllegalArgumentException] {
      Drift.ecdfDrift(wide, "g", "v", maxDomain = 100)
    }
    assert(ex.getMessage.contains("maxDomain"), s"$ex")
    // ...and raising the clamp deliberately admits the same input
    assert(Drift.ecdfDrift(wide, "g", "v", maxDomain = 300).count() === 1L)
    // the categorical form shares the guard
    val ex2 = intercept[IllegalArgumentException] {
      Drift.categoricalDrift(wide, "g", "v", maxDomain = 100)
    }
    assert(ex2.getMessage.contains("categoricalDrift"), s"$ex2")
  }

  private def tv(rows: Seq[(String, String)]): Map[(String, String), Long] =
    Drift.categoricalDrift(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap

  test("categorical TV distance: hand-computed shares, zero-filled absent " +
    "values, identical mixes read 0, disjoint mixes read 1000000") {
    // A: {x, x, y, z} -> shares 500000/250000/250000 (w absent: 0)
    // B: {x, y, w, w} -> shares 250000/250000/0, w 500000
    // TV = (|500000-250000| + 0 + |250000-0| + |0-500000|) / 2 = 500000
    val got = tv(Seq("A" -> "x", "A" -> "x", "A" -> "y", "A" -> "z",
      "B" -> "x", "B" -> "y", "B" -> "w", "B" -> "w"))
    assert(got(("A", "B")) === 500000L)
    val same = tv(Seq("A" -> "x", "A" -> "y", "B" -> "x", "B" -> "y"))
    assert(same(("A", "B")) === 0L)
    val far = tv(Seq("A" -> "x", "B" -> "y"))
    assert(far(("A", "B")) === 1000000L)
  }

  test("categorical TV property: bounded in [0, 1e6], symmetric in the " +
    "group swap, matches a driver-side oracle on random mixes; nulls refuse") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caseGen = for {
      na <- Gen.chooseNum(1, 25); nb <- Gen.chooseNum(1, 25)
      a <- Gen.listOfN(na, Gen.oneOf("p", "q", "r", "s"))
      b <- Gen.listOfN(nb, Gen.oneOf("p", "q", "r", "s"))
    } yield (a, b)
    val prop = Prop.forAll(caseGen) { case (a, b) =>
      val got = tv(a.map("A" -> _) ++ b.map("B" -> _))(("A", "B"))
      val vals = (a ++ b).distinct
      val want = vals.map { v =>
        math.abs(a.count(_ == v).toLong * 1000000L / a.size -
          b.count(_ == v).toLong * 1000000L / b.size)
      }.sum / 2
      // swapping the group labels must not change the distance (the pair
      // key is ordered, the statistic is symmetric)
      val swapped = tv(a.map("B" -> _) ++ b.map("A" -> _))(("A", "B"))
      got == want && got >= 0 && got <= 1000000L && swapped == got
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(r.passed, s"categorical-TV property failed: $r")

    val withNull = Seq(("A", "x"), ("B", null.asInstanceOf[String])).toDF("g", "v")
    val ex = intercept[Exception] {
      Drift.categoricalDrift(withNull, "g", "v").collect()
    }
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(8)
    assert(chain(ex).exists(c =>
      String.valueOf(c.getMessage).contains("categoricalDrift")), s"$ex")
  }

  test("FromCounts forms equal the raw forms exactly, fold un-merged " +
    "duplicate count parts, and refuse null/negative counts") {
    val rows = Seq("A" -> 1L, "A" -> 2L, "A" -> 2L, "A" -> 3L,
      "B" -> 2L, "B" -> 3L, "B" -> 5L)
    val raw = rows.toDF("g", "v")
    val counts = raw.groupBy("g", "v").count()
    val wantKs = Drift.ecdfDrift(raw, "g", "v").collect().map(_.toSeq).toSet
    val gotKs = Drift.ecdfDriftFromCounts(counts, "g", "v", "count")
      .collect().map(_.toSeq).toSet
    assert(gotKs === wantKs, "counts-based KS must equal the raw form")
    val cats = Seq("A" -> "x", "A" -> "x", "A" -> "y", "B" -> "x", "B" -> "z")
      .toDF("g", "v")
    val wantTv = Drift.categoricalDrift(cats, "g", "v").collect().map(_.toSeq).toSet
    val gotTv = Drift.categoricalDriftFromCounts(
        cats.groupBy("g", "v").count(), "g", "v", "count")
      .collect().map(_.toSeq).toSet
    assert(gotTv === wantTv, "counts-based TV must equal the raw form")
    // un-merged parts: the same (g, v) split across two count rows folds —
    // raw accumulated monitor state is safe to pass without a pre-merge
    val parts = Seq(("A", 2L, 1L), ("A", 2L, 1L), ("A", 1L, 1L), ("A", 3L, 1L),
      ("B", 2L, 1L), ("B", 3L, 1L), ("B", 5L, 1L)).toDF("g", "v", "c")
    val gotParts = Drift.ecdfDriftFromCounts(parts, "g", "v", "c")
      .collect().map(_.toSeq).toSet
    assert(gotParts === wantKs, "duplicate (g, v) count parts must fold")
    // null/negative counts are corrupted state, refused loudly
    val neg = Seq(("A", 1L, -1L), ("B", 1L, 2L)).toDF("g", "v", "c")
    val ex = intercept[Exception] {
      Drift.ecdfDriftFromCounts(neg, "g", "v", "c").collect()
    }
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(8)
    assert(chain(ex).exists(c =>
      String.valueOf(c.getMessage).contains("non-negative")), s"$ex")
    // an ALL-ZERO-count group (legal per-row: zero is non-negative) has no
    // distribution — refused with the curated message, never a raw
    // divide-by-zero from `c·10^6 div n`
    val zeroed = Seq(("A", 1L, 0L), ("A", 2L, 0L), ("B", 1L, 2L), ("B", 2L, 1L))
      .toDF("g", "v", "c")
    val exZ = intercept[Exception] {
      Drift.ecdfDriftFromCounts(zeroed, "g", "v", "c").collect()
    }
    assert(chain(exZ).exists(c =>
      String.valueOf(c.getMessage).contains("zero total count")), s"$exZ")
    val exZt = intercept[Exception] {
      Drift.categoricalDriftFromCounts(
        Seq(("A", "x", 0L), ("B", "x", 2L)).toDF("g", "v", "c"),
        "g", "v", "c").collect()
    }
    assert(chain(exZt).exists(c =>
      String.valueOf(c.getMessage).contains("zero total count")), s"$exZt")
  }

  test("centroid drift width probe: empty input and an all-null embedding " +
    "column refuse with the curated message, never an NPE") {
    val schema = "g STRING, vec ARRAY<FLOAT>"
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    val ex = intercept[IllegalArgumentException] {
      Drift.centroidDrift(empty, "g", "vec")
    }
    assert(ex.getMessage.contains("empty input"), s"$ex")
    val allNull = Seq(("A", null.asInstanceOf[Array[Float]]),
      ("B", null.asInstanceOf[Array[Float]])).toDF("g", "vec")
    val ex2 = intercept[IllegalArgumentException] {
      Drift.centroidDrift(allNull, "g", "vec")
    }
    assert(ex2.getMessage.contains("ragged/null"), s"$ex2")
  }

  test("centroid drift: hand-computed integer geometry, floor-exact on " +
    "negative components, partition-independent") {
    // A: (1.0, 0.0), (0.5, 0.5) -> milli sums (1500, 500), n=2,
    //    mu = (750, 250), nsq_a = 625000
    // B: (-1.0, 1.0) -> mu = (-1000, 1000), nsq_b = 2000000
    // dot = 750*(-1000) + 250*1000 = -500000
    val rows = Seq(
      ("A", Array(1.0f, 0.0f)), ("A", Array(0.5f, 0.5f)),
      ("B", Array(-1.0f, 1.0f)))
    for (parts <- Seq(1, 5)) {
      val got = Drift.centroidDrift(
          rows.toDF("g", "vec").repartition(parts), "g", "vec")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      assert(got(("A", "B")) === ((2L, 1L, -500000L, 625000L, 2000000L)),
        s"parts=$parts: $got")
    }
    // floor, not truncation: sum -1 over n=2 -> mu = floor(-0.5) = -1
    val neg = Drift.centroidDrift(
        Seq(("A", Array(-0.0005f, 1.0f)), ("A", Array(-0.0005f, 1.0f)),
          ("B", Array(0.0f, 1.0f))).toDF("g", "vec"), "g", "vec")
      .collect().head
    // each doc's first milli component = floor(-0.5) = -1; sum -2, n 2, mu -1
    assert(neg.getLong(4) === (-1L * 0L + 1000L * 1000L),
      s"dot must carry the floored negative component: $neg")
  }

  test("centroid drift guards: ragged widths refuse, null groups refuse, " +
    "dims over maxDims refuse") {
    val ragged = Seq(("A", Array(1.0f)), ("B", Array(1.0f, 2.0f))).toDF("g", "vec")
    val ex = intercept[IllegalArgumentException] {
      Drift.centroidDrift(ragged, "g", "vec")
    }
    assert(ex.getMessage.contains("ragged"), s"$ex")
    val nullG = Seq((Some("A"), Array(1.0f)), (None, Array(2.0f))).toDF("g", "vec")
    val ex2 = intercept[Exception] {
      Drift.centroidDrift(nullG, "g", "vec").collect()
    }
    def chain(t: Throwable) = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(8)
    assert(chain(ex2).exists(c =>
      String.valueOf(c.getMessage).contains("centroidDrift")), s"$ex2")
    val wide = Seq(("A", Array.fill(5)(1.0f)), ("B", Array.fill(5)(1.0f)))
      .toDF("g", "vec")
    val ex3 = intercept[IllegalArgumentException] {
      Drift.centroidDrift(wide, "g", "vec", maxDims = 4)
    }
    assert(ex3.getMessage.contains("maxDims"), s"$ex3")
  }
}
