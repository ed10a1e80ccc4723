package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate STRING matching at join scale — the typo-tolerant lookup a
  * corpus pipeline needs for vocabulary normalization, entity linking and
  * query-log cleanup. The naive form is a cross join with `levenshtein`,
  * O(N·M) distance computations; the scale form here is the SymSpell-style
  * deletion neighborhood (public algorithm, Garbe 2012): every string
  * generates its ≤k-character-deletion variants, candidates are the pairs
  * sharing a variant (a keyed equi-join), and only candidates pay the exact
  * Levenshtein verify.
  *
  * LOSSLESS for plain Levenshtein distance ≤ k: any edit script of ≤ k
  * substitutions/insertions/deletions can be factored through deleting the
  * touched positions from both sides, so every true pair shares a variant
  * (spec-proven against brute force). Distances and variants are pure
  * string functions — DuckDB computes identical results (`levenshtein` has
  * the same unit-cost semantics in both engines).
  *
  * Scale shape: the join key is the variant string — N·(len choose ≤k) keys
  * instead of N·M pairs. Skew guard (ENFORCED, not advisory): VERY short
  * strings generate near-universal variants (every length-1 string deletes
  * to "", a single bucket holding the whole corpus — exactly the hot-key
  * explosion the neighborhood join exists to avoid), so both sides are
  * floored at `minIndexLen` characters BEFORE the variant explode. Strings
  * below the floor are excluded from the join by contract — a caller that
  * genuinely needs them lowers `minIndexLen` explicitly and accepts the
  * bucket-size consequence. The post-join length band (|len(a) − len(b)| ≤
  * k, implied by the distance bound) stays as the cheap candidate filter. */
object Fuzzy {

  /** All variants of `c` reachable by deleting UP TO `k` characters
    * (including `c` itself), distinct. k is small (1 or 2 in practice). */
  def deletionVariants(c: Column, k: Int): Column = {
    require(k >= 1 && k <= 3, s"deletion depth k must be in [1,3], got $k")
    def oneDeletions(w: Column): Column =
      transform(sequence(lit(1), length(w)),
        i => concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w))))
    (1 to k).foldLeft(array(c)) { (acc, _) =>
      array_distinct(concat(acc, flatten(transform(acc, oneDeletions(_)))))
    }
  }

  /** All (left, right) pairs with `levenshtein(left, right) <= maxDist`,
    * found via the deletion-neighborhood candidate join + exact verify.
    * Inputs are single-column frames of DISTINCT strings (dedupe first —
    * occurrences would multiply candidates for nothing). Strings shorter
    * than `minIndexLen` on EITHER side are excluded from the join entirely
    * (the skew guard above); the default of 3 matches standard SymSpell
    * practice. Output: (left, right, dist), one row per matching pair.
    *
    * CONTRACT CHANGE (round 12): `minIndexLen` defaults to 3 where earlier
    * rounds indexed every string. Callers that relied on sub-3-char matches
    * must pass `minIndexLen = 1` explicitly — and accept the skew that
    * motivated the floor: a 1-char string's deletion neighborhood contains
    * "" and collides with every other short string's, producing a
    * quadratic bucket. Counting the excluded rows would force an extra
    * scan/action on a lazy plan, so exclusion is documented, not logged. */
  def fuzzyJoin(left: DataFrame, leftCol: String,
                right: DataFrame, rightCol: String, maxDist: Int,
                minIndexLen: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3, s"maxDist must be in [1,3], got $maxDist")
    require(minIndexLen >= 1, s"minIndexLen must be >= 1, got $minIndexLen")
    // skew guard: floor the indexed string length on BOTH sides before the
    // variant explode — sub-floor strings are excluded by contract (scaladoc)
    val lv = left.filter(length(col(leftCol)) >= minIndexLen)
      .select(col(leftCol).as("left"),
        explode(deletionVariants(col(leftCol), maxDist)).as("__var"))
    val rv = right.filter(length(col(rightCol)) >= minIndexLen)
      .select(col(rightCol).as("right"),
        explode(deletionVariants(col(rightCol), maxDist)).as("__var"))
    lv.join(rv, "__var")
      // length band is implied by the distance bound: prune candidates
      // before the (more expensive) exact verify
      .filter(abs(length(col("left")) - length(col("right"))) <= maxDist)
      .select("left", "right").distinct()
      .withColumn("dist", levenshtein(col("left"), col("right")))
      .filter(col("dist") <= maxDist)
  }
}
