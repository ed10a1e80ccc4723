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
}
