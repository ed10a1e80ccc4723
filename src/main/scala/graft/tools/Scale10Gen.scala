// Derived 10×-scale evidence set (VERDICT r8 #8 / r9 #8): replicate the
// driver's sf0.1 documents/embeddings 10× with DETERMINISTIC per-replica
// mutations that keep the dedup/semantic pair structure per-replica (text
// gets a replica tag token so replicas are not near-dups of each other;
// embeddings get a replica-indexed orthogonal component so cross-replica
// cosine drops well below the dedup taus). This is scale evidence for the
// fixed-overhead amortization claims (q38/q43/q56/q57 tier), not a
// correctness input — correctness stays on the driver's own parquet.
//
// Usage: sbt "runMain graft.tools.Scale10Gen /root/testdata/sf0.1 /tmp/graft_sf1.0"
// Optional arg 3: replica factor (default 10) — e.g. 40 builds a 40× set
// (the larger-step intake scale series; same mutation scheme, more reps).
package graft.tools

import org.apache.spark.sql.functions._

object Scale10Gen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1.0")
    val nReps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.get()
    val reps = spark.range(0, nReps.toLong).select(col("id").as("rep"))

    // documents 10× also scales the DERIVED-INPUT tiers: q73's fuzzy-join
    // vocabulary (every distinct text token) and q74's link graph (edges are
    // a deterministic function of doc_id — 10× documents ⇒ 10× nodes/edges,
    // so the graph/fuzzy tier gets its 10× reading from this same set).
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("rep") * lit(100000000L))
      .withColumn("text", concat(col("text"), lit(" replicatag"), col("rep")))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    // add |v| to dimension (rep mod dim): cosine(v, v') ≈ sqrt((1+v_k/|v|)/2)
    // ≤ ~0.87 for unit-ish components — below the q56/q57 taus, so replicas
    // do not collapse into cross-replica near-dup groups
    embs.crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("rep") * lit(100000000L))
      .withColumn("nrm", sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))))
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            transform(sequence(lit(0), lit(dim - 1)),
              i => when(i === pmod(col("rep"), lit(dim)), col("nrm")).otherwise(lit(0.0d))),
            (x, d) => (x.cast("double") + d).cast("float"))))
      .drop("rep", "nrm")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // orders 10×: PK-offset replicas (unique o_orderkey per replica) — scale
    // evidence for the orders-derived CDC tiers (q17/q18 envelope pipeline,
    // q64–q66 apply/IVM). The apply-tier key space (okey % 1000) stays fixed,
    // so 10× data = 10× change-history depth per key, the realistic shape.
    val orders = spark.read.parquet(s"$src/orders.parquet")
    orders.crossJoin(broadcast(reps))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * lit(1000000000L))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    println(s"""{"scaled":"$out","docs10x":true,"emb10x":true,"orders10x":true}""")
    spark.stop()
  }
}
