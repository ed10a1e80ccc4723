package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL / domain filtering for web-corpus curation — the blocklist tier that
  * runs BEFORE any text ever reaches dedup or quality scoring (the
  * CCNet / RefinedWeb pipeline shape: URL filtering is the cheapest filter,
  * so it goes first).
  *
  * The matching rule is the suffix rule every domain blocklist uses
  * (adblock `||domain^`, Squid dstdomain, public-suffix semantics): an entry
  * `b` blocks the host `b` itself and every subdomain `x.b` — label-aligned,
  * so `s1.com` blocks `www.s1.com` but NOT `evil-s1.com`.
  *
  * Spark-first shape: NOT a per-entry `LIKE '%.b'` scan (that is
  * O(hosts × entries) and unindexable). Each host explodes into its label
  * suffix chain — `a.b.s1.com` → [`a.b.s1.com`, `b.s1.com`, `s1.com`,
  * `com`] — and the chain equi-joins the blocklist on the suffix string.
  * The fan-out is bounded (`maxLabels`, default 8: real registrable hosts
  * rarely exceed 5 labels; deeper hosts keep only their LAST `maxLabels`
  * labels, which is exactly the set that can match a sane blocklist entry).
  * The join is a plain equi-join, so Catalyst broadcasts a small blocklist
  * automatically and shuffle-joins a billion-entry one — both without a
  * cartesian anywhere. 100 TB posture: explode ≤8× on a narrow
  * (key, suffix) projection, one equi-join, one per-key aggregate, one
  * key-partitioned join back — every stage hash-partitioned, no global
  * sort, no driver state.
  */
object UrlFilter {

  /** Annotate `docs` with the blocklist verdict for `hostCol`.
    *
    * Returns `docs` plus:
    *  - `blocked_by`: the MOST SPECIFIC (longest) matching blocklist entry,
    *    null when no entry matches. Within one host's suffix chain the
    *    lengths are strictly decreasing, so the longest match is unique and
    *    the result is deterministic.
    *  - `blocked`: `blocked_by IS NOT NULL`.
    *
    * `blocklist` must have the single column `entryCol` of lowercase
    * hostname suffixes. Matching is exact on the dotted labels (callers
    * normalize case upstream; hosts from [[TextAnalysis.urlHost]] are
    * already bare authorities).
    *
    * `keyCols` identify a doc row for the join-back (the host column alone
    * is not a key — many docs share a host). */
  def domainBlocklist(docs: DataFrame, hostCol: String, keyCols: Seq[String],
                      blocklist: DataFrame, entryCol: String = "entry",
                      maxLabels: Int = 8): DataFrame = {
    require(maxLabels >= 1, s"maxLabels must be >= 1, got $maxLabels")
    val reserved = Seq("__labels", "__suffix", "__slen", "blocked_by", "blocked")
    reserved.foreach(r => require(!docs.columns.contains(r),
      s"domainBlocklist: input column '$r' collides with a working/output column"))

    // the ≤ maxLabels suffix chain, label-aligned: suffix i = labels i..n
    // joined by '.'; only the last maxLabels labels can start a suffix
    val chain = docs.select((keyCols :+ hostCol).map(col): _*)
      .withColumn("__labels", split(col(hostCol), "\\."))
      .withColumn("__suffix", explode(expr(
        s"""transform(
           |  sequence(greatest(1, size(__labels) - ${maxLabels - 1}), size(__labels)),
           |  i -> array_join(slice(__labels, i, size(__labels) - i + 1), '.'))""".stripMargin)))

    // equi-join the chain to the blocklist; keep the longest (most
    // specific) hit per doc. Lengths within a chain are strictly
    // decreasing, so max_by is tie-free.
    val hits = chain
      .join(blocklist.select(col(entryCol).as("__suffix")).distinct(), "__suffix")
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(length(col("__suffix")).as("__slen"),
        col("__suffix").as("blocked_by"))).getField("blocked_by").as("blocked_by"))

    docs.join(hits, keyCols, "left_outer")
      .withColumn("blocked", col("blocked_by").isNotNull)
  }
}
