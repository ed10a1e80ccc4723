package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership sketch — deterministic, mergeable, engine-portable.
  *
  * The missing piece between [[graft.llm.Decontam]]'s exact-set probe and a
  * 100 TB reality: the exact probe broadcasts the benchmark's DISTINCT n-gram
  * set, which works while eval sets are megabytes, but the same "is this key
  * in that other corpus?" question also appears with a multi-terabyte build
  * side (dedup-against-yesterday's-crawl, URL seen-lists, paragraph hashes à
  * la Dolma's dedup pass). A Bloom filter compresses ANY number of build keys
  * into a fixed `m`-bit array with one-sided error: `mightContain` is always
  * true for present keys and false positives occur at a tunable rate — the
  * right trade for filtering, where a false positive only costs an extra
  * verify (or an over-dropped document, priced in by choosing `m`).
  *
  * Why not Spark's built-in `bloom_filter_agg`: its bit layout is an
  * implementation detail of one engine, so its probe results can never be
  * hash-checked by an independent oracle, and false positives silently shift
  * between releases. This filter's positions derive from the md5 value both
  * engines compute identically ([[Sketch.hash60]] / DuckDB hex-slice), with
  * Kirsch–Mitzenmacher double hashing: `pos_i = (h1 + i·h2) mod m` — so the
  * filter CONTENT (and therefore every false positive) is reproducible
  * across engines, retries, and partitionings, and the whole operator is
  * oracle-checkable.
  *
  * Scale shape:
  *  - build: one pass, per-partition bitset partials (`m/8` bytes each —
  *    the honest bounded-state `mapPartitions` form, like [[Sketch]]'s KMV
  *    partial), OR-merged; the driver holds O(P · m/8) transient and m/8
  *    final — a PARAMETER, independent of build-side row count. Merging two
  *    filters of different days/shards is the same bitwise OR, which is why
  *    the sketch composes across ingestion batches.
  *  - probe: row-local and codegen-friendly — k bit-tests against the bit
  *    array embedded as a literal (for the multi-GB `m` regime you would
  *    ship the array as a broadcast variable instead; the probe arithmetic
  *    is unchanged). No join, no shuffle: the 100 TB side never moves.
  */
object Bloom {

  /** Second 60-bit hash for double hashing: md5 hex chars 17..31, forced odd
    * (odd step ⇒ full cycle when m is a power of two). DuckDB computes the
    * identical value via `('0x' || substr(md5(x), 17, 15))::BIGINT | 1`. */
  def hash60b(c: Column): Column =
    conv(substring(md5(c.cast("string")), 17, 15), 16, 10).cast("long")
      .bitwiseOR(lit(1L))

  /** The i-th probe position of a value, in [0, m). All arithmetic stays
    * far below 2^63: h1 % m and h2 % m are < m ≤ 2^30, i ≤ k. */
  private def position(h1: Column, h2: Column, i: Int, m: Int): Column =
    (h1 % m + lit(i.toLong) * (h2 % m)) % m

  private def checkParams(m: Int, k: Int): Unit = {
    require(m > 0 && m % 64 == 0 && m <= (1 << 30),
      s"bloom m must be a positive multiple of 64 (≤ 2^30), got $m")
    require(k > 0 && k <= 16, s"bloom k must be in [1, 16], got $k")
  }

  /** All k probe positions of `c` as an array<long> column (build-side
    * explode form; also the shape the SQL oracle mirrors). */
  def positions(c: Column, m: Int, k: Int): Column = {
    checkParams(m, k)
    val h1 = Sketch.hash60(c)
    val h2 = hash60b(c)
    array((0 until k).map(i => position(h1, h2, i, m)): _*)
  }

  /** Build the filter over `valueCol`: one pass, per-partition `m`-bit
    * partials, OR-merge. Returns the bit array (`m/64` longs, little-endian
    * bit order within a word). This is an ACTION — the result is
    * metadata-scale by construction (m bits regardless of input size). */
  def build(df: DataFrame, valueCol: Column, m: Int, k: Int): Array[Long] = {
    checkParams(m, k)
    val words = m / 64
    val hashed = df.select(Sketch.hash60(valueCol).as("h1"), hash60b(valueCol).as("h2"))
      .where(col("h1").isNotNull)
    val partials = hashed.rdd.mapPartitions { it =>
      val bits = new Array[Long](words)
      it.foreach { row =>
        val h1 = row.getLong(0); val h2 = row.getLong(1)
        var i = 0
        while (i < k) {
          val p = ((h1 % m + i * (h2 % m)) % m).toInt
          bits(p >> 6) |= 1L << (p & 63)
          i += 1
        }
      }
      Iterator.single(bits)
    }
    partials.fold(new Array[Long](words)) { (a, b) =>
      var i = 0; while (i < words) { a(i) |= b(i); i += 1 }; a
    }
  }

  /** Membership probe: true iff every probe bit of `c` is set in `bits`.
    * Row-local, native-function-only (no UDF): k conjoined bit-tests against
    * the array literal. Composable inside higher-order-function lambdas, so
    * a document's gram array filters without exploding. */
  def mightContain(bits: Array[Long], c: Column, m: Int, k: Int): Column = {
    checkParams(m, k)
    require(bits.length == m / 64, s"bit array must hold $m bits, got ${bits.length * 64}")
    val bitsLit = typedlit(bits.toSeq)
    val h1 = Sketch.hash60(c)
    val h2 = hash60b(c)
    (0 until k).map { i =>
      val p = position(h1, h2, i, m)
      val word = element_at(bitsLit,
        (call_function("shiftright", p, lit(6)) + lit(1L)).cast("int"))
      call_function("shiftright", word, p.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Derive (m, k) for an expected `n` build keys at `targetFp` false-positive
    * rate — the standard Bloom sizing (m = ⌈−n·ln p / ln²2⌉, k = round(m/n·ln 2)),
    * with m rounded up to a multiple of 64. REFUSES (does not clamp) when the
    * derived m exceeds the 2^30 engine ceiling: a silently-undersized filter
    * saturates and flags everything, which at 100 TB means 100% contamination
    * with no error — the loud failure here is the feature. */
  def sizeFor(n: Long, targetFp: Double): (Int, Int) = {
    require(n > 0, s"bloom sizeFor: n must be positive, got $n")
    require(targetFp > 0 && targetFp < 1, s"bloom sizeFor: targetFp must be in (0,1), got $targetFp")
    val ln2 = math.log(2)
    val mRaw = math.ceil(-n * math.log(targetFp) / (ln2 * ln2))
    // Compare as Double BEFORE converting to Long: for astronomically large n
    // mRaw.toLong saturates at Long.MaxValue and the +63 below wraps negative,
    // which would sail past the m <= 2^30 check and return garbage (m, k).
    require(mRaw <= (1 << 30).toDouble,
      s"bloom sizeFor: n=$n at fp=$targetFp needs ~${mRaw} bits > 2^30 engine ceiling — " +
        "shard the filter (build per partition range and OR-merge) or relax targetFp")
    val m = (((mRaw.toLong + 63) / 64) * 64)
    require(m <= (1 << 30),
      s"bloom sizeFor: n=$n at fp=$targetFp needs m=$m bits > 2^30 engine ceiling — " +
        "shard the filter (build per partition range and OR-merge) or relax targetFp")
    val k = math.max(1, math.min(16, math.round(m.toDouble / n * ln2).toInt))
    (m.toInt, k)
  }

  /** Loud saturation refusal: throws when the built filter's observed
    * false-positive rate (fill^k) exceeds `maxFp`. Call after [[build]] /
    * [[buildFromHashes]] when `m` was chosen ahead of the data — a fixed m
    * that was right at SF 1 silently becomes a flag-everything filter at SF
    * 100, and the only honest behaviors are resize or refuse. */
  def requireUnsaturated(bits: Array[Long], k: Int, maxFp: Double = 0.05): Unit = {
    val fill = fillRatio(bits)
    val fp = math.pow(fill, k)
    require(fp <= maxFp,
      f"bloom filter saturated: fill=$fill%.3f, k=$k ⇒ fp≈$fp%.3f > $maxFp%.3f — " +
        s"resize with Bloom.sizeFor(n, targetFp) (m=${bits.length * 64} bits is too small for this build side)")
  }

  /** Fraction of set bits ∈ [0,1] — the filter's fill ratio, from which the
    * false-positive rate is fill^k. Exposed so callers can assert their
    * chosen `m` still fits the data (a saturated filter flags everything —
    * the loud check beats silent 100% contamination at 100×). */
  def fillRatio(bits: Array[Long]): Double =
    bits.map(java.lang.Long.bitCount(_).toLong).sum.toDouble / (bits.length * 64)

  // ---------------------------------------------------- pre-hashed fast path

  /** Positions for keys that ARE already well-mixed non-negative hashes
    * (n-gram hashes, fingerprints): pure integer double hashing — base
    * `h mod m`, step `((h >> 29) mod m) | 1` (upper bits; forced odd, and
    * `|1` keeps it < m because m is even) — no md5 at probe time. The md5
    * path hashes arbitrary values; this one exists because probing costs k
    * positions PER GRAM per document, where two md5 evaluations per gram
    * (interpreted, inside the HOF lambda) measured ~10× the whole probe.
    * Contract: h ≥ 0 and uniformly distributed (both true of
    * [[graft.llm.Decontam.ngramHashesMod]] values); DuckDB mirrors the
    * arithmetic verbatim (`>>`, `|`, `%` on BIGINT). */
  def buildFromHashes(df: DataFrame, hashCol: Column, m: Int, k: Int): Array[Long] = {
    checkParams(m, k)
    val words = m / 64
    val partials = df.select(hashCol.cast("long").as("h")).where(col("h").isNotNull)
      .rdd.mapPartitions { it =>
        val bits = new Array[Long](words)
        it.foreach { row =>
          val h = row.getLong(0)
          if (h < 0) throw new IllegalArgumentException(
            s"Bloom.buildFromHashes: negative hash $h — the pre-hashed contract is h >= 0")
          val base = (h % m).toInt
          val step = (((h >>> 29) % m) | 1L).toInt
          var i = 0
          while (i < k) {
            val p = (base + i * step) % m
            bits(p >> 6) |= 1L << (p & 63)
            i += 1
          }
        }
        Iterator.single(bits)
      }
    partials.fold(new Array[Long](words)) { (a, b) =>
      var i = 0; while (i < words) { a(i) |= b(i); i += 1 }; a
    }
  }

  /** [[mightContain]] for pre-hashed keys — same integer positions as
    * [[buildFromHashes]], k conjoined bit-tests, no md5. */
  def mightContainHash(bits: Array[Long], h: Column, m: Int, k: Int): Column = {
    checkParams(m, k)
    require(bits.length == m / 64, s"bit array must hold $m bits, got ${bits.length * 64}")
    val bitsLit = typedlit(bits.toSeq)
    // pmod + unsigned shift: identical to the build arithmetic for the
    // contractual h >= 0, and WELL-DEFINED (positions in [0, m), membership
    // simply false-or-fp) for a negative probe hash — the plain %/shiftright
    // form produced a negative array index there, which element_at resolves
    // from the END of the array: silent wrong membership, the worst failure
    // mode. The build side throws on negatives; the probe side can't (it
    // runs per-row inside codegen), so defined-and-harmless is the contract.
    val base = pmod(h, lit(m.toLong))
    val step = pmod(call_function("shiftrightunsigned", h, lit(29)), lit(m.toLong)).bitwiseOR(lit(1L))
    (0 until k).map { i =>
      val p = (base + lit(i.toLong) * step) % m
      val word = element_at(bitsLit,
        (call_function("shiftright", p, lit(6)) + lit(1L)).cast("int"))
      call_function("shiftright", word, p.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
