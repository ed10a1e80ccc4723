package graft.app

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.llm.{Dedup, Drift, Novelty, Selection, Similarity, UrlFilter}

/** Standing corpus-intake pipeline — the q88 capstone (domain blocklist →
  * n-gram novelty → exact stratified split) driven CONTINUOUSLY from a
  * document stream, instead of as a batch job over a finished corpus, with
  * an optional PAIRWISE near-dup gate (the q59 incremental-MinHash probe
  * against the accumulated corpus) between the blocklist and novelty
  * stages, an optional SEMANTIC near-dup gate (the q56/q31 embedding
  * semantics in standing form — a stored sign-LSH index probed per batch,
  * exact-cosine verify per candidate) right after the lexical one, and
  * optional per-batch DRIFT monitoring (q87/q90's statistics) against the
  * accumulated reference — blocklist kills bad sources, near-dup kills
  * single-document copies (lexical), semantic kills paraphrase-level
  * copies the shingle gate cannot see, novelty kills diffuse redundancy,
  * drift watches what survives, split routes it. This closes the loop
  * between the repo's two halves: the llm curation operators and the
  * streaming engine tier.
  *
  * Spark-first shape: the novelty stage is stateful ACROSS batches (each
  * batch scores against everything already ingested), but its state is a
  * vocabulary-scale gram-owner TABLE, not per-key stream state — so the
  * pipeline runs as `foreachBatch` over a parquet index, the same pattern
  * the incremental MinHash tier uses (q59), not as a
  * `flatMapGroupsWithState` (gram state is not keyed by a stream key, and
  * the index must be joinable at corpus-scale — a parquet side input is
  * exactly that).
  *
  * PER-BATCH COST IS FLAT IN CORPUS SIZE — every piece of standing state
  * is probed by scan and written by DELTA, never rewritten whole:
  *
  *  - Gram index: LOG-STRUCTURED. Batch `i` writes only its own grams as
  *    `indexDir/delta=<i>` (batch-vocabulary-scale); the probe reads the
  *    union of the latest `base=<h>` plus the deltas in (h, i) —
  *    [[Novelty.ngramNoveltyAgainst]] min-folds duplicate gram rows after
  *    the join, so the raw part union needs no pre-merge. Every
  *    `compactEvery` pending deltas, the parts STRICTLY BELOW the current
  *    batch are folded into a new base ([[Novelty.compactGramIndex]]) and
  *    retired — amortized O(vocab/K) write per batch instead of O(vocab),
  *    where the full-rewrite protocol paid O(vocab · batches) total I/O
  *    over a run (quadratic in batch count).
  *  - Near-dup gate: the survivors' MinHash SIGNATURES are persisted per
  *    batch (`corpusDir/sigs=<i>`, or pre-banded `bands=<i>` under the
  *    bucketed layout) and the probe joins the stored signature parts
  *    ([[Dedup.incrementalNearDupIndexedManaged]] /
  *    [[Dedup.incrementalNearDupBanded]]); the corpus TEXT parts
  *    (`part=<i>`) are touched only by the candidate verify join —
  *    signatures are never recomputed from accumulated text. BOTH families
  *    are log-structured like the gram index: at the same compaction
  *    trigger, parts strictly below the horizon fold into `partbase=<h>` /
  *    `bandsbase=<h>` / `sigsbase=<h>` and retire, so every probe plans an
  *    O(compactEvery)-way part union instead of one part per batch forever
  *    (an O(batches) listing/planning term at a standing service's
  *    thousands of micro-batches, even when pruning keeps the bytes flat).
  *  - Drift state: domain-scale (value, count) tables per statistic, one
  *    fold per batch; the KS/TV compare runs on the counts
  *    ([[Drift.ecdfDriftFromCounts]]/[[Drift.categoricalDriftFromCounts]])
  *    and never re-scans the corpus.
  *  - With `stateBuckets` > 0 the probes are additionally PRUNED, not just
  *    scan-shaped: every compacted BASE part is written partitioned by a
  *    key bucket, each batch reads only the buckets its own keys touch
  *    from the corpus-scale base (plus the few pending batch-scale deltas
  *    in full), and nothing ever exchanges the standing index (the novelty
  *    probe's inner-join shape keeps the index on the streamed side). The
  *    signature WIDTH is pinned per corpus dir (`_num_hashes` marker), so
  *    the probe's width guard is metadata — no per-batch aggregate over
  *    the accumulated band index.
  *
  * Besides the assignments, every batch writes its DROP LEDGER
  * (`outDir/rejects/batch=<i>`: (doc_id, stage, reason) for each document
  * the blocklist/near-dup/in-batch/novelty stages rejected) and a
  * TELEMETRY row (`outDir/metrics/batch=<i>`: stage counts, state part
  * counts/bytes, probed buckets/bytes) — a standing curation service must
  * account for what it dropped and what its probes actually read.
  *
  * Restart determinism (spec-verified across a kill/resume): batch `i`
  * always scores against state written by batches STRICTLY BELOW `i`,
  * writes its outputs with per-batch overwrite, and only then appends its
  * own state parts — so a replayed batch reads the same state, recomputes
  * byte-identical assignments, and re-overwrites the same paths.
  * Compaction only ever folds parts strictly below the current batch, so
  * a replay of the CURRENT batch sees identical content whether or not
  * the compaction landed; and because gram-index merging is an idempotent
  * min, even overlapping leftover parts from a mid-compaction crash are
  * harmless by construction. The replay horizon is the NEWEST batch —
  * exactly what `foreachBatch` can ever replay (offsets commit per
  * batch, so only the in-flight batch re-fires after a crash); once a
  * LATER batch has run, its compaction may have folded state past an
  * older batch's strictly-below horizon, and replaying that older batch
  * is out of contract. The novelty probe itself is also replay-idempotent even
  * if the batch's own delta already landed (a doc's own id in the owner
  * min changes nothing — see [[Novelty.ngramNoveltyAgainst]]).
  *
  * Exactness contract, inherited from the novelty operator: when doc ids
  * arrive in non-decreasing order across batches (ids are ingest sequence
  * numbers — the append-only intake shape), the novelty scores equal the
  * batch statistic over the concatenated corpus exactly — and the
  * operator REFUSES out-of-order ingest that would corrupt a score.
  * Split quotas are exact PER BATCH (each batch apportioned by largest
  * remainder within its strata) or CUMULATIVE (`countersDir` set); a null
  * stratum refuses loudly ([[Selection.splitAssign]]).
  */
object Intake {

  /** The intake document wire schema (JSON lines): ingest-ordered id,
    * stratum label, text, and the host for the blocklist stage. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType),
    StructField("host", StringType)))

  final case class Config(
      inputDir: String,
      checkpointDir: String,
      /** Log-structured gram-owner index root: batch i appends
        * `delta=<i>`; every `compactEvery` pending deltas fold into
        * `base=<h>` (h = the newest part strictly below the compacting
        * batch) and retire. */
      indexDir: String,
      /** Assignment output root: batch i overwrites `batch=i`; with
        * `driftDir` set, drift reports land at `drift/batch=i`. */
      outDir: String,
      blocklist: Seq[String],
      /** Optional PAIRWISE near-dup gate between the blocklist and the
        * novelty stages (the q59 incremental-MinHash probe): batch docs
        * whose shingle Jaccard against any ACCUMULATED corpus doc reaches
        * the threshold are dropped before novelty scoring. Requires
        * `corpusDir`. Cross-side only — within-batch near-dups are the
        * novelty stage's job (exact dups score 0) or `inBatchNearDup`'s
        * pass; the accumulated corpus grows by each batch's near-dup
        * SURVIVORS: text at `corpusDir/part=<batch>` (verify joins only)
        * and their MinHash signatures at `corpusDir/sigs=<batch>` (flat
        * layout) or pre-banded `bands=<batch>` (bucketed layout) — the
        * probe's index. Append-only (replay overwrites its own parts),
        * with parts below the compaction horizon folded into
        * `partbase=` / `sigsbase=` / `bandsbase=` base parts. */
      nearDupThreshold: Option[Double] = None,
      corpusDir: Option[String] = None,
      /** Also dedup WITHIN each batch (requires `nearDupThreshold`): after
        * the cross-batch gate, the batch's own near-dup pairs
        * ([[Dedup.nearDupPairs]], same threshold/parameters) collapse to
        * clusters ([[graft.llm.Clusters.assign]]) and only each cluster's
        * canonical (minimum-id) document survives. Off by default — exact
        * within-batch duplicates already score novelty 0, so this matters
        * when batches are large enough to carry internal NEAR-duplicates
        * past the noveltyMinMicros gate. */
      inBatchNearDup: Boolean = false,
      /** Optional SEMANTIC (embedding) near-dup gate between the lexical
        * cross-batch gate and the in-batch pass — the q56/q31 semantics in
        * STANDING form: batch docs whose exact cosine against any
        * accumulated corpus doc reaches this threshold are dropped as
        * `semantic_dup`. Requires `corpusDir` and an `emb`
        * (`ARRAY<FLOAT>`) column on the input batch; docs with a null
        * `emb` pass the gate (nothing to compare) and contribute no
        * embedding state. Candidates come from a stored sign-LSH
        * signature index ([[Similarity.esigIndexFrame]]: `esig=<batch>`
        * parts under `corpusDir`, `esigbase=`/`esigmid=` when compacted),
        * verified by exact cosine against the doc-keyed embedding family
        * (`emb=<batch>`/`embbase=`/`embmid=`) — both log-structured,
        * bucketed, compacted and replayed EXACTLY like the lexical
        * text/signature families. Recall is sign-LSH any-of-N-tables
        * recall ([[semanticTables]] × [[semanticPlanes]] deterministic
        * planes), the same explicit trade the banded MinHash gate makes. */
      semanticThreshold: Option[Double] = None,
      /** Sign-LSH planes per table for the semantic gate's stored index —
        * pinned per corpus dir (`_sem_planes` marker): a mismatched width
        * signs differently and silently loses recall. */
      semanticPlanes: Int = 6,
      /** Sign-LSH table count for the semantic gate (`_sem_tables`
        * marker, same pinning contract). */
      semanticTables: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      noveltyMinMicros: Long = 200000L,
      splits: Seq[(String, Long)] = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L),
      /** When set, split assignment runs in the CONTINUING form
        * ([[Selection.splitAssignContinuing]]): per-(stratum, split)
        * counters persist here (versioned `v=<batch>`, same
        * strictly-below-replay protocol as the gram index), and each
        * batch is cut against the CUMULATIVE Hamilton quotas — the global
        * ratio holds over everything ingested, not merely within each
        * batch. Unset = independent per-batch quotas (q88 semantics). */
      countersDir: Option[String] = None,
      /** When set, per-batch drift monitoring: the batch's word-count
        * distribution (integer-ECDF KS) and language mix (categorical TV)
        * are compared against the ACCUMULATED reference of all prior
        * surviving batches, written to `outDir/drift/batch=<i>` as
        * (stat, grp_a, grp_b, n_a, n_b, d_micros); the domain-scale count
        * state versions here (`wc/v=<i>`, `lang/v=<i>`, strictly-below
        * replay like the counters). The first batch has no reference and
        * writes no report. Thresholding is the caller's policy — this is
        * the measurement, logged beside the assignments it describes. */
      driftDir: Option[String] = None,
      n: Int = 8,
      seed: String = "intake",
      /** Fold pending gram-index deltas into a new base once this many
        * accumulate (amortized O(vocab/K) index write per batch). */
      compactEvery: Int = 8,
      /** TWO-TIER compaction for the CORPUS-SCALE state families — text
        * (`part=`) and signatures (`bands=`/`sigs=`), the ones whose
        * single-level fold rewrites corpus-scale bytes every
        * `compactEvery` batches (the gram index is vocabulary-scale and
        * stays single-tier): per-batch deltas fold into a `*mid=` part
        * every K pending deltas (a K-batch-scale write), and the mids
        * fold with the base into a new `*base=` every K pending mids —
        * so the full-corpus rewrite happens every K² batches instead of
        * every K, O(size/K²) amortized write per batch at O(2K) standing
        * parts per family. Off by default: the single level is simpler
        * and fine until the corpus/batch ratio makes the rewrite dominate
        * (size it by that ratio — see [[compactFamily]]'s
        * write-amplification note; at a 100 TB corpus the text family is
        * TB-scale and even the thin band index is ~100 B/doc ≈ TB-scale).
        * A state directory that holds `*mid=` parts REFUSES to run with
        * this off: the single-tier fold would re-fold deltas already
        * inside the mids and silently duplicate documents. */
      twoTierCorpus: Boolean = false,
      /** BUCKET-PARTITIONED state layout (> 0 = bucket count, 0 = the flat
        * legacy layout): compacted BASE parts are written partitioned by
        * `bkt = pmod(gram, stateBuckets)` ([[Novelty.gramBucket]]) for the
        * gram index and by a hash of the band key / the doc id for the
        * near-dup state ([[Dedup.bandIndexFrame]]/[[Dedup.docBucket]]) —
        * per-batch DELTA parts stay plain batch-scale writes carrying
        * `bkt` as a data column (a per-batch dynamic-partition write fans
        * one small batch across every bucket directory; measured
        * ~+10 s/batch at 64 buckets) — so each batch's probes READ ONLY
        * the buckets the batch touches from the corpus-scale base
        * (partition-directory pruning) plus the pending deltas in full,
        * and nothing ever exchanges or scans the full standing index —
        * the difference between per-batch cost proportional to the BATCH
        * and proportional to everything ever ingested, which is the whole
        * game at 100 TB. How much the pruning saves is proportional to
        * the batch's KEY coverage of the bucket domain: band keys are
        * doc-scale (bands × docs), so the near-dup probe prunes hard for
        * ordinary micro-batches; gram keys are vocabulary-scale, so a
        * bulk batch touches most gram buckets and the layout's win there
        * is the scan-not-exchange posture (the index streams through a
        * broadcast join, never shuffles) plus hard pruning for narrow
        * tail batches. SIZING: pick the bucket count so bucket FILES stay
        * chunk-sized — B ≈ expected state bytes / 128–512 MB (a 100 TB
        * corpus's few-TB gram index wants thousands of buckets; a local
        * run wants 64) — an oversized B turns the compacted base into
        * thousands of sub-KB files and file overhead dominates (measured
        * ~5× the per-batch cost at B=4096 over a 3 MB index under the r16
        * per-batch-bucketed-write layout; deltas no longer fan out, but
        * the base read and compaction write still pay B-proportional file
        * overhead). Scores are layout-invariant (spec-asserted
        * against the flat layout): a pruned-away row's bucket is a pure
        * function of its key, so it provably cannot match any batch key.
        * The bucket count is pinned per state directory (a `_state_buckets`
        * marker): restarting with a different value is refused loudly —
        * bucket ids from two layouts do not line up, and a silent mix
        * would drop matches. */
      stateBuckets: Int = 0,
      /** The probes pin their batch-key side as a broadcast build only
        * while its MEASURED size (distinct grams / band rows, counted on
        * already-cached frames) stays under this bound; a larger batch
        * degrades to the shuffled join over the bucket-PRUNED index —
        * bounded by the batch's key coverage, never a forced broadcast
        * OOM. 4M longs ≈ 32 MB of key payload, comfortably inside
        * executor broadcast budgets. */
      maxBroadcastKeys: Long = 4L << 20,
      /** Retired state (compacted index parts, superseded counter/drift
        * versions) is deleted after each batch unless this is set. */
      keepAllIndexVersions: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None)

  private def versionsOf(spark: SparkSession, dir: String,
                         prefix: String = "v="): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).collect { case s if s.startsWith(prefix) =>
        s.stripPrefix(prefix).toLong }
  }

  private def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def readIntMarker(spark: SparkSession, dir: String,
                            name: String): Option[Int] = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      // A corrupt marker must refuse with a message naming the file, not
      // leak a NumberFormatException — the layout/width guards treat the
      // marker as the single source of truth, so an unreadable one means
      // the state dir needs repair (restore the marker or rebuild).
      val parsed = scala.util.Try(text.toInt).toOption
      require(parsed.isDefined,
        s"Intake: marker $p is corrupt (contents ${if (text.isEmpty) "empty"
          else s"'${text.take(32)}'"}, expected a single integer) — restore " +
          "the marker to the value the state was written with, or rebuild " +
          "the state directory")
      parsed
    }
  }

  /** Markers gate every later run, so their write is temp-and-rename
    * atomic: a crash mid-write leaves only an orphan temp file (ignored by
    * the guards), never a truncated marker that would refuse forever. The
    * publish is an OVERWRITE rename (`FileContext` with `Rename.OVERWRITE`,
    * one atomic step on HDFS/local), so even a re-publish over an existing
    * marker (the rebucket path) has no window where no marker exists — a
    * delete-then-rename gap would read back as pre-marker legacy state.
    * Schemes that ship a `FileSystem` but no `AbstractFileSystem` binding
    * (object stores like s3a/gs) fall back to delete-then-rename: rename
    * is not atomic there ANYWAY (it is a copy under the covers), so the
    * fallback gives up only the no-marker-window guarantee the store
    * itself cannot provide — bucketed state wants HDFS/local regardless. */
  private def writeIntMarker(spark: SparkSession, dir: String, name: String,
                             value: Int): Unit = {
    val p = new Path(dir, name)
    val tmp = new Path(dir, s"_tmp_$name")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(value.toString.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      fc.rename(fc.makeQualified(tmp), fc.makeQualified(p),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p),
          s"Intake: could not publish marker $p")
    }
  }

  /** Every state-part prefix a directory may hold (the gram-index and
    * corpus families, delta and base forms) — the marker guards scan these
    * to tell a fresh directory from pre-marker legacy state. */
  private val StatePrefixes =
    Seq("base=", "delta=", "part=", "partmid=", "partbase=", "sigs=",
      "sigsmid=", "sigsbase=", "bands=", "bandsmid=", "bandsbase=",
      "esig=", "esigmid=", "esigbase=", "emb=", "embmid=", "embbase=")

  /** Present in a state directory while [[rebucket]] is migrating it —
    * ingest refuses until the migration finishes (re-running rebucket is
    * the repair; the migration is idempotent, every bucket id being a
    * pure function of its key). */
  private[app] val RebucketSentinel = "_rebucket_in_progress"

  private def hasStateParts(spark: SparkSession, dir: String): Boolean =
    StatePrefixes.exists(pfx => versionsOf(spark, dir, pfx).nonEmpty)

  /** Pin a state directory's bucket layout: the first writer records
    * `stateBuckets` in a `_state_buckets` marker; every later run must
    * match it exactly — bucket ids from two layouts do not line up, so a
    * silent mix would prune away genuine matches. A marker-less directory
    * that ALREADY holds state parts is refused, never adopted: its layout
    * is unknowable (a pre-marker flat index read as bucketed would come
    * back with null `bkt` everywhere and the pruned probes would silently
    * drop every genuine match — the exact failure the marker exists to
    * make loud). */
  private def layoutGuard(spark: SparkSession, dir: String, buckets: Int): Unit = {
    val prog = new Path(dir, RebucketSentinel)
    require(!prog.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(prog),
      s"Intake: state at $dir has an unfinished re-bucket ($RebucketSentinel " +
        "present) — its families may be split across two bucket layouts; " +
        "re-run Intake.rebucket with the same target to finish the " +
        "migration before ingesting")
    readIntMarker(spark, dir, "_state_buckets") match {
      case Some(found) =>
        require(found == buckets,
          s"Intake: state at $dir was written with stateBuckets=$found but " +
            s"this run is configured with stateBuckets=$buckets — bucket ids " +
            "from the two layouts do not line up, so pruned probes would " +
            "silently drop matches; keep the recorded layout or rebuild the state")
      case None =>
        require(!hasStateParts(spark, dir),
          s"Intake: state at $dir holds parts but no _state_buckets marker — " +
            "its layout (flat vs bucketed, and which bucket count) is " +
            "unknowable, and adopting stateBuckets=" + buckets + " blindly " +
            "would silently prune away genuine matches; rebuild the state, " +
            "or restore the marker if you know the layout it was written with")
        writeIntMarker(spark, dir, "_state_buckets", buckets)
    }
  }

  /** Pin the corpus signature WIDTH (`numHashes`) in a `_num_hashes`
    * marker, so the banded probe's width guard is METADATA — the aggregate
    * form scanned the full accumulated band index every batch (the last
    * O(standing state) per-batch term in the pruned probe). Marker-less
    * directories with existing band parts (pre-r17 state) are verified
    * ONCE by that same aggregate and then pinned; mismatch refuses with
    * the probe's own message either way. */
  private def widthGuard(spark: SparkSession, dir: String, numHashes: Int,
                         legacyBands: () => Option[DataFrame]): Unit =
    readIntMarker(spark, dir, "_num_hashes") match {
      case Some(found) =>
        require(found == numHashes,
          s"Intake: corpus state at $dir was signed with numHashes=$found " +
            s"but this run is configured with numHashes=$numHashes — a " +
            "mismatched signature width bands differently and silently " +
            "loses recall; keep the recorded width or re-sign the corpus")
      case None =>
        legacyBands().foreach { banded =>
          val wides = banded
            .agg(min(col("w")).as("lo"), max(col("w")).as("hi")).head()
          if (!wides.isNullAt(0))
            require(wides.getInt(0) == numHashes && wides.getInt(1) == numHashes,
              s"Intake: legacy band parts at $dir carry signature widths " +
                s"[${wides.getInt(0)}, ${wides.getInt(1)}] but this run is " +
                s"configured with numHashes=$numHashes — re-sign the corpus " +
                "or match the parameters")
        }
        writeIntMarker(spark, dir, "_num_hashes", numHashes)
    }

  /** Pin the semantic gate's sign-LSH geometry (`semanticPlanes` /
    * `semanticTables`) in corpus-dir markers — the [[widthGuard]] contract
    * for the embedding index: a mismatched geometry signs differently and
    * silently loses recall, so a later run must match or rebuild. The
    * families are new with the markers (no pre-marker legacy form), so a
    * marker-less dir that already holds `esig` parts refuses outright. */
  private def semGuard(spark: SparkSession, dir: String, planes: Int,
                       tables: Int): Unit = {
    def pin(name: String, v: Int, what: String): Unit =
      readIntMarker(spark, dir, name) match {
        case Some(found) =>
          require(found == v,
            s"Intake: semantic index at $dir was signed with $what=$found " +
              s"but this run is configured with $what=$v — a mismatched " +
              "sign-LSH geometry buckets differently and silently loses " +
              "recall; keep the recorded geometry or re-sign the corpus")
        case None =>
          require(!Seq("esig=", "esigmid=", "esigbase=")
              .exists(p => versionsOf(spark, dir, p).nonEmpty),
            s"Intake: corpus state at $dir holds esig parts but no $name " +
              "marker — its sign-LSH geometry is unknowable; restore the " +
              "marker or rebuild the semantic index")
          writeIntMarker(spark, dir, name, v)
      }
    pin("_sem_planes", planes, "semanticPlanes")
    pin("_sem_tables", tables, "semanticTables")
  }

  /** The part ids a log-structured family probe reads for batch `id`: the
    * newest compacted base strictly below `id` plus every delta part in
    * (base, id). Returns (base, deltas). */
  private def familyParts(spark: SparkSession, dir: String, basePrefix: String,
                          deltaPrefix: String, id: Long): (Option[Long], Seq[Long]) = {
    val base = versionsOf(spark, dir, basePrefix).filter(_ < id).sorted.lastOption
    val deltas = versionsOf(spark, dir, deltaPrefix)
      .filter(d => d < id && base.forall(d > _)).sorted
    (base, deltas)
  }

  /** [[familyParts]] with the two-tier MID level in between: the newest
    * base strictly below `id`, the mid parts strictly between it and
    * `id`, and the deltas strictly above the newest mid (or base). The
    * same never-double-read contract per tier: a crash between a fold's
    * write and its retire leaves inputs the protocol skips and the next
    * fold sweeps. Returns (base, mids, deltas). */
  private def familyPartsTiered(spark: SparkSession, dir: String,
                                basePrefix: String, midPrefix: String,
                                deltaPrefix: String, id: Long)
      : (Option[Long], Seq[Long], Seq[Long]) = {
    val base = versionsOf(spark, dir, basePrefix).filter(_ < id).sorted.lastOption
    val mids = versionsOf(spark, dir, midPrefix)
      .filter(v => v < id && base.forall(v > _)).sorted
    val floor = base.toSeq ++ mids
    val deltas = versionsOf(spark, dir, deltaPrefix)
      .filter(d => d < id && floor.forall(d > _)).sorted
    (base, mids, deltas)
  }

  /** Write a bkt-carrying frame as a bucket-partitioned part: repartition
    * by the bucket FIRST, so each bucket directory holds one file per
    * owning task instead of one per upstream partition (a direct
    * `partitionBy` from a B-spanning shuffle writes tasks × buckets small
    * files — the classic dynamic-partition file explosion). Used only for
    * COMPACTED BASE parts — per-batch deltas are plain batch-scale writes
    * (see [[Config.stateBuckets]]). */
  private def writeBucketed(df: DataFrame, path: String): Unit =
    df.repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(path)

  /** Fold a corpus state family's pending parts at or below horizon `h`
    * (the prior base plus every per-batch part above it) into one new
    * `<basePrefix><h>` part, then retire the inputs — so the probe's plan
    * stays an O(compactEvery)-way union instead of one part per batch
    * forever (N file listings + N scan nodes per batch, an O(batches)
    * planning term even when bucket pruning keeps the BYTES flat). A pure
    * concatenation: batches hold disjoint doc ids, so no merge fold is
    * needed. Crash-safe like the gram compaction: the read protocol takes
    * the NEWEST base plus parts strictly above it, so a crash between the
    * base write and the retire never double-reads an input; the sweep here
    * deletes any such leftovers on the next trigger. When pending parts is
    * empty (a replay of the batch that already compacted), nothing is
    * rewritten — the base is never read-and-overwritten in place.
    *
    * WRITE AMPLIFICATION, stated honestly: each fold rewrites the FULL
    * family base, so the amortized extra write per batch is
    * O(family size / compactEvery) — the single-level LSM trade. For the
    * gram index (vocabulary-scale, Heaps-law sublinear) and the signature
    * family (a few longs per doc) that is cheap at any corpus size; for
    * the TEXT family it is corpus-scale ÷ K, so a long-lived 100 TB intake
    * sizes `compactEvery` by its corpus/batch ratio (the probes only need
    * the part COUNT bounded — K=64 keeps plans 65-way and cuts the rewrite
    * 64×). The next rung, if a deployment ever needs it, is a second tier
    * (deltas → mid parts → base), O(size/K²) amortized at O(2K) parts —
    * the read protocol here (newest base + everything above it) already
    * admits that extension without changing replay semantics. */
  private def compactFamily(spark: SparkSession, cfg: Config, dir: String,
                            basePrefix: String, deltaPrefix: String,
                            schema: String, h: Long, bucketed: Boolean): Unit = {
    val lastBase = versionsOf(spark, dir, basePrefix).filter(_ <= h)
      .sorted.lastOption
    val pending = versionsOf(spark, dir, deltaPrefix)
      .filter(d => d <= h && lastBase.forall(d > _)).sorted
    if (pending.nonEmpty) {
      // lastBase < h strictly here (a part at h would leave no pending
      // deltas ≤ h above it), so the write target is never an input
      val paths = lastBase.map(v => s"$dir/$basePrefix$v").toSeq ++
        pending.map(v => s"$dir/$deltaPrefix$v")
      val folded = paths.map(p => spark.read.schema(schema).parquet(p))
        .reduce(_.unionByName(_))
      if (bucketed) writeBucketed(folded, s"$dir/$basePrefix$h")
      else folded.write.mode("overwrite").parquet(s"$dir/$basePrefix$h")
    }
    CrashHooks.seam(s"family_fold:$basePrefix")
    // retire everything the LIVE base (just written, or the prior one when
    // nothing was pending) supersedes — never the live base itself
    val live = if (pending.nonEmpty) Some(h) else lastBase
    if (!cfg.keepAllIndexVersions) live.foreach { lv =>
      versionsOf(spark, dir, deltaPrefix).filter(_ <= lv)
        .foreach(v => delete(spark, s"$dir/$deltaPrefix$v"))
      versionsOf(spark, dir, basePrefix).filter(_ < lv)
        .foreach(v => delete(spark, s"$dir/$basePrefix$v"))
    }
    CrashHooks.seam(s"family_retire:$basePrefix")
  }

  /** The SECOND LSM rung [[compactFamily]]'s write-amplification note
    * admits, for the corpus-scale families ([[Config.twoTierCorpus]]): tier 1
    * folds the pending deltas (strictly above the newest mid/base, never
    * the base) into one `<midPrefix><h>` part — a K-batch-scale write;
    * tier 2 folds the base plus the pending mids into a new
    * `<basePrefix><H>` once K mids accumulate — the only corpus-scale
    * rewrite, now every K² batches. Both horizons are the family's own
    * newest pending part, strictly below the running batch, so the replay
    * contract is unchanged; each tier's retire sweeps any leftovers a
    * crash between write and retire left behind, and the tiered read
    * protocol ([[familyPartsTiered]]) never double-reads them. Mids are
    * written bucketed under the bucketed layout — the fold is K batches
    * of data, so the dynamic-partition cost that made per-batch bucketed
    * deltas a bad trade amortizes to O(1/K) per batch while the probes
    * get pruned mid reads. */
  private def compactFamilyTwoTier(spark: SparkSession, cfg: Config,
                                   dir: String, basePrefix: String,
                                   midPrefix: String, deltaPrefix: String,
                                   schema: String, id: Long,
                                   bucketed: Boolean): Unit = {
    def write(df: DataFrame, path: String): Unit =
      if (bucketed) writeBucketed(df, path)
      else df.write.mode("overwrite").parquet(path)
    val (base, mids0, pendD) =
      familyPartsTiered(spark, dir, basePrefix, midPrefix, deltaPrefix, id)
    val minted = if (pendD.size >= cfg.compactEvery) {
      val h = pendD.max
      write(pendD.map(v => spark.read.schema(schema)
          .parquet(s"$dir/$deltaPrefix$v"))
        .reduce(_.unionByName(_)), s"$dir/$midPrefix$h")
      CrashHooks.seam(s"mid_fold:$midPrefix")
      if (!cfg.keepAllIndexVersions)
        versionsOf(spark, dir, deltaPrefix).filter(_ <= h)
          .foreach(v => delete(spark, s"$dir/$deltaPrefix$v"))
      CrashHooks.seam(s"mid_retire:$midPrefix")
      Some(h)
    } else None
    // tier 1 may just have minted the K-th mid — the pre-fold listing plus
    // the minted part IS the post-fold mid set (no second directory list)
    val mids = (mids0 ++ minted).sorted
    if (mids.size >= cfg.compactEvery) {
      val hh = mids.max
      write((base.map(v => s"$dir/$basePrefix$v").toSeq ++
          mids.map(v => s"$dir/$midPrefix$v"))
        .map(p => spark.read.schema(schema).parquet(p))
        .reduce(_.unionByName(_)), s"$dir/$basePrefix$hh")
      CrashHooks.seam(s"tier2_fold:$basePrefix")
      if (!cfg.keepAllIndexVersions) {
        versionsOf(spark, dir, midPrefix).filter(_ <= hh)
          .foreach(v => delete(spark, s"$dir/$midPrefix$v"))
        versionsOf(spark, dir, basePrefix).filter(_ < hh)
          .foreach(v => delete(spark, s"$dir/$basePrefix$v"))
      }
      CrashHooks.seam(s"tier2_retire:$basePrefix")
    }
  }

  /** (total, probed) byte size of one state part — ONE recursive listing
    * per part (directory-listing scale, used only by the per-batch
    * telemetry frame). `probed` = the bucket ids the batch's probe read;
    * None = the probe was unpruned, so probed equals total. */
  private def partBytes(spark: SparkSession, path: String,
                        probed: Option[Set[Int]]): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0L, 0L)
    else {
      var tot = 0L
      var pr = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        tot += f.getLen
        val parent = f.getPath.getParent.getName
        val hit = probed match {
          case None => true
          case Some(ks) => parent.startsWith("bkt=") &&
            scala.util.Try(parent.stripPrefix("bkt=").toInt).toOption.exists(ks)
        }
        if (hit) pr += f.getLen
      }
      (tot, pr)
    }
  }

  /** One micro-batch of the intake pipeline: blocklist → (optional)
    * stored-signature near-dup gate → (optional) stored-sign-LSH
    * SEMANTIC gate → (optional) in-batch CC → incremental novelty against
    * the pre-batch part union → (optional) drift report → exact split →
    * overwrite `outDir/batch=<id>` (assignments), `outDir/rejects/batch=
    * <id>` (the per-stage DROP LEDGER: every document the batch rejected,
    * with the stage and a reason — audits and threshold tuning need the
    * rejects as much as the survivors), `outDir/metrics/batch=<id>` (the
    * state-size/probe-I/O telemetry row — the no-silent-caps rule for a
    * standing service), and append this batch's state parts. Assignments,
    * rejects and every scored state part are a deterministic function of
    * (batch contents, id, on-disk state parts < id) — the replay contract
    * above; the telemetry row alone may differ across a replay that
    * straddles a compaction (it reports the bytes of whatever pre-batch
    * parts exist). Repo-visible so the specs and the crash-soak harness
    * ([[graft.tools.CrashSoak]]) can drive a replayed batch directly. */
  /** Run independent state-mutating tasks CONCURRENTLY (the guide's
    * overlap-independent-jobs shape: Spark's scheduler happily runs several
    * jobs at once inside one application — actions are only sequential
    * because the driver calls them sequentially, and at micro-batch scale
    * each action is scheduling-dominated, leaving most cores idle).
    *
    * Contract the callers rely on:
    *  - tasks must be mutually independent: each writes its OWN directory
    *    and reads only already-persisted stage frames or state parts
    *    strictly below the running batch id (so ordering among them was
    *    never semantic — any subset having landed is a state the replay
    *    protocol already recovers from);
    *  - every task is awaited before this returns, including when one
    *    fails, so a propagated failure (or an armed [[CrashHooks]] kill)
    *    never leaves an in-flight write racing the caller's replay;
    *  - real failures propagate ahead of an injected crash (a soak must
    *    not mistake a genuine bug for its own kill). */
  private def runConcurrent(spark: SparkSession,
                            tasks: Seq[(String, () => Unit)]): Unit =
    tasks match {
      case Seq() => ()
      case Seq((_, f)) => f()
      case _ =>
        val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
        try {
          val futs = tasks.map { case (label, f) =>
            pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
              def call(): Option[Throwable] = {
                // job descriptions are thread-local: each concurrent write
                // shows up labelled in the UI/profilers
                spark.sparkContext.setJobDescription(s"intake: $label")
                try { f(); None } catch { case t: Throwable => Some(t) }
              }
            })
          }
          val errs = futs.flatMap(_.get())
          // real failures outrank an injected soak kill; SIBLING failures
          // ride the thrown error as suppressed exceptions instead of
          // being silently dropped
          (errs.filterNot(_.isInstanceOf[CrashHooks.InjectedCrash]) ++ errs)
            .headOption.foreach { e =>
              errs.filter(_ ne e).foreach(e.addSuppressed)
              throw e
            }
        } finally {
          // every-task-awaited contract, even on an interrupt mid-get():
          // nothing submitted may outlive this method (an in-flight write
          // racing the caller's replay is the hazard the contract exists
          // to exclude). In the normal path all futures already completed,
          // so this returns immediately. An interrupt during the wait is
          // remembered and re-asserted, never allowed to abandon the wait.
          pool.shutdownNow()
          var interrupted = false
          var terminated = false
          while (!terminated)
            try {
              terminated =
                pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
              if (!terminated)
                System.err.println("intake: waiting for in-flight batch " +
                  "tasks to finish before returning")
            } catch {
              case _: InterruptedException => interrupted = true
            }
          if (interrupted) Thread.currentThread().interrupt()
        }
    }

  private[graft] def processBatch(spark: SparkSession, cfg: Config,
                                  batch: DataFrame, id: Long): Unit = {
    import spark.implicits._
    require(cfg.nearDupThreshold.isEmpty || cfg.corpusDir.nonEmpty,
      "Intake: nearDupThreshold requires corpusDir (the accumulated corpus " +
        "the near-dup probe compares against)")
    require(cfg.semanticThreshold.isEmpty || cfg.corpusDir.nonEmpty,
      "Intake: semanticThreshold requires corpusDir (the accumulated " +
        "embedding state the semantic probe compares against)")
    require(cfg.semanticThreshold.isEmpty || batch.columns.contains("emb"),
      "Intake: semanticThreshold requires an `emb` (ARRAY<FLOAT>) column " +
        "on the input batch — the embedding the gate compares")
    require(cfg.compactEvery >= 1,
      s"Intake: compactEvery must be >= 1, got ${cfg.compactEvery}")
    require(cfg.stateBuckets == 0 ||
      (cfg.stateBuckets >= 1 && cfg.stateBuckets <= Novelty.MaxBuckets),
      s"Intake: stateBuckets must be 0 (flat layout) or in " +
        s"[1, ${Novelty.MaxBuckets}], got ${cfg.stateBuckets}")
    layoutGuard(spark, cfg.indexDir, cfg.stateBuckets)
    cfg.corpusDir.foreach(cd => layoutGuard(spark, cd, cfg.stateBuckets))
    val bucketed = cfg.stateBuckets > 0
    // pin the signature width as corpus-dir metadata so the banded probe
    // skips its per-batch full-index width aggregate; marker-less legacy
    // dirs are aggregate-verified once here, then pinned
    if (cfg.semanticThreshold.isDefined) cfg.corpusDir.foreach(cd =>
      semGuard(spark, cd, cfg.semanticPlanes, cfg.semanticTables))
    if (bucketed && cfg.nearDupThreshold.isDefined) cfg.corpusDir.foreach { cd =>
      widthGuard(spark, cd, cfg.numHashes, () => {
        val paths =
          versionsOf(spark, cd, "bandsbase=").sorted.map(v => s"$cd/bandsbase=$v") ++
            versionsOf(spark, cd, "bands=").sorted.map(v => s"$cd/bands=$v")
        if (paths.isEmpty) None
        else Some(paths.map(pp => spark.read
            .schema("doc_id BIGINT, b INT, bkey STRING, w INT, bkt INT")
            .parquet(pp).select("w"))
          .reduce(_.unionByName(_)))
      })
    }
    val cleanups = scala.collection.mutable.ArrayBuffer[() => Unit]()
    // Persist + FLAT LINEAGE BARRIER for every stage frame that feeds
    // multiple downstream actions (the Clusters entry-barrier idiom): a
    // batch runs several driver actions (probe stats, novelty scoring,
    // split/ledger writes, state writes), and each would re-run
    // Catalyst ANALYSIS of the stage's full stacked plan (blocklist →
    // near-dup probe → in-batch CC → novelty) even with the persist hot —
    // persist truncates execution, not analysis. That analysis is fixed
    // driver CPU per action, so it dominates exactly the narrow
    // steady-state micro-batches a standing service tails into.
    def flatPersist(df: DataFrame): DataFrame = {
      val (flat, backing) = graft.plans.Barrier.flatPersist(df)
      cleanups += (() => { backing.unpersist(); () })
      flat
    }
    val b = batch.persist()
    cleanups += (() => { b.unpersist(); () })
    try {
      val bl = cfg.blocklist.toDF("entry")
      val flagged = UrlFilter.domainBlocklist(b, "host", Seq("doc_id"), bl)
      // the embedding rides the kept frames only while the semantic gate
      // needs it — the state writes and the gate itself read it there
      val keptCols = Seq("doc_id", "lang", "text") ++
        (if (cfg.semanticThreshold.isDefined) Seq("emb") else Nil)
      val blocklisted = flagged
        .filter(!col("blocked"))
        .select(keptCols.map(col): _*)
      val rejBlocklist = flagged.filter(col("blocked"))
        .select(col("doc_id"), lit("blocklist").as("stage"),
          concat(lit("blocked_by:"), col("blocked_by")).as("reason"))

      // tiered family listing + the mids-need-the-flag refusal: a dir
      // holding *mid= parts under twoTierCorpus=false would re-fold
      // deltas already inside the mids and silently duplicate docs.
      // (path, isPrunedBase) per part: compacted base/mid parts are
      // dir-partitioned by bkt under the bucketed layout (pruned reads),
      // per-batch deltas are plain writes read in full.
      def tieredInfo(cd: String, basePfx: String, midPfx: String,
                     deltaPfx: String): Seq[(String, Boolean)] = {
        val (bv, m, ds) =
          familyPartsTiered(spark, cd, basePfx, midPfx, deltaPfx, id)
        require(cfg.twoTierCorpus || m.isEmpty,
          s"Intake: corpus state at $cd holds $midPfx parts (written " +
            "under twoTierCorpus) but this run disables it — the " +
            "single-tier fold would re-fold deltas already inside the " +
            "mids and silently duplicate documents; re-enable " +
            "twoTierCorpus or rebuild the state")
        bv.map(v => (s"$cd/$basePfx$v", bucketed)).toSeq ++
          m.map(v => (s"$cd/$midPfx$v", bucketed)) ++
          ds.map(v => (s"$cd/$deltaPfx$v", false))
      }

      // optional q59-shape near-dup gate: probe the STORED signature parts
      // < id (part=id / sigs=id / bands=id excluded — a crashed run may
      // have written them; replay must not compare the batch against
      // itself). Corpus text parts feed ONLY the candidate verify join.
      // Each family is LOG-STRUCTURED like the gram index: the probe reads
      // the newest compacted base strictly below id plus the per-batch
      // delta parts above it — O(compactEvery) parts, never one per batch
      // forever. Bucketed layout: the BASE parts are partitioned by the
      // band-key / doc bucket (pruned reads); delta parts are plain writes
      // carrying `bkt` as a data column — batch-scale, read in full, and
      // folded into the bucketed base at compaction (a per-batch 64-dir
      // dynamic-partition write cost ~3× the batch itself; bucketing only
      // the base buys the same pruned standing state without it).
      var sigParts = 0
      var probedSigBkts: Option[Seq[Int]] = None // None = unpruned probe
      var probedTextBkts: Option[Seq[Int]] = None
      // the batch's PERSISTED MinHash signature frame, computed exactly once
      // per batch (inside the cross-corpus probe when it runs, standalone
      // otherwise) and reused by the in-batch pass and the corpus signature
      // write — per-doc signatures depend only on the doc's own text, so
      // every reuse is value-identical (guide §1.4: the batch was previously
      // signed up to three times per batch). Set whenever the near-dup gate
      // is configured; released via the probe cleanup / cleanups list.
      var batchSigs: Option[DataFrame] = None
      // (path, isPrunedBase) per family part the probe reads — base parts
      // are partition-pruned, delta parts are read in full (telemetry)
      var sigPartInfo: Seq[(String, Boolean)] = Nil
      var textPartInfo: Seq[(String, Boolean)] = Nil
      val (kept1, rejNearDup) = (cfg.nearDupThreshold, cfg.corpusDir) match {
        case (Some(t), Some(cd)) =>
          textPartInfo = tieredInfo(cd, "partbase=", "partmid=", "part=")
          sigPartInfo =
            if (bucketed) tieredInfo(cd, "bandsbase=", "bandsmid=", "bands=")
            else tieredInfo(cd, "sigsbase=", "sigsmid=", "sigs=")
          sigParts = sigPartInfo.size
          if (sigPartInfo.isEmpty) {
            // no stored parts to probe (first batch) — but the in-batch
            // pass and the corpus signature write still need the batch
            // signed; sign it once here so they share one pass
            val s0 = Dedup.minhashSigFrame(
                blocklisted.select("doc_id", "text"), "doc_id", "text",
                cfg.numHashes)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            cleanups += (() => { s0.unpersist(); () })
            batchSigs = Some(s0)
            (blocklisted, spark.emptyDataset[(Long, String, String)]
              .toDF("doc_id", "stage", "reason"))
          } else {
            // bucketed layout: text parts carry the doc bucket, so the
            // candidate verify read prunes to matched buckets (the text
            // scan was the last per-batch read linear in corpus size).
            // Per-part reads unioned (NOT one multi-root read): the part
            // dirs are themselves name=value shaped, so Spark's partition
            // discovery over several roots would try to treat them as a
            // partition column and refuse — and the base is
            // dir-partitioned by bkt while deltas carry it as data.
            val corpusText =
              if (bucketed)
                textPartInfo.map { case (p, _) => spark.read
                    .schema("doc_id BIGINT, text STRING, bkt INT")
                    .parquet(p)
                    .select("doc_id", "text", "bkt") }
                  .reduce(_.unionByName(_))
              else textPartInfo.map { case (p, _) => spark.read
                  .schema("doc_id BIGINT, text STRING")
                  .parquet(p)
                  .select("doc_id", "text") }
                .reduce(_.unionByName(_))
            val dups =
              if (bucketed) {
                val banded = sigPartInfo.map { case (p, _) => spark.read
                    .schema("doc_id BIGINT, b INT, bkey STRING, w INT, bkt INT")
                    .parquet(p)
                    .select("doc_id", "b", "bkey", "w", "bkt") }
                  .reduce(_.unionByName(_))
                val probe = Dedup.incrementalNearDupBanded(
                  banded, corpusText, blocklisted.select("doc_id", "text"),
                  "doc_id", "text", cfg.numHashes, cfg.bands,
                  cfg.stateBuckets, t, cfg.maxBroadcastKeys,
                  // the width is pinned in the corpus dir's _num_hashes
                  // marker (validated above) — no per-batch full-index
                  // aggregate guard
                  widthVerified = true)
                cleanups += probe.cleanup
                probedSigBkts = Some(probe.probedBuckets)
                probedTextBkts = probe.probedTextBuckets
                batchSigs = Some(probe.sigs)
                probe.pairs
              } else {
                val corpusSigs = sigPartInfo.map { case (p, _) => spark.read
                    .schema("doc_id BIGINT, mh ARRAY<BIGINT>")
                    .parquet(p)
                    .select("doc_id", "mh") }
                  .reduce(_.unionByName(_))
                val probe = Dedup.incrementalNearDupIndexedProbe(
                  corpusSigs, corpusText, blocklisted.select("doc_id", "text"),
                  "doc_id", "text", cfg.numHashes, cfg.bands, t)
                cleanups += probe.cleanup
                batchSigs = Some(probe.sigs)
                probe.pairs
              }
            // one row per dropped doc (used by both the anti-join and the
            // ledger) — persisted so the probe runs once, flat so the
            // probe's plan is never re-analyzed downstream
            val dupAgg = flatPersist(dups
              .groupBy(col("batch_id").as("doc_id"))
              .agg(min(col("corpus_id")).as("__dup_of")))
            (blocklisted.join(dupAgg.select("doc_id"), Seq("doc_id"), "left_anti"),
              dupAgg.select(col("doc_id"), lit("near_dup").as("stage"),
                concat(lit("near_dup_of:"), col("__dup_of")).as("reason")))
          }
        case _ =>
          (blocklisted, spark.emptyDataset[(Long, String, String)]
            .toDF("doc_id", "stage", "reason"))
      }

      // optional SEMANTIC gate (q56/q31 in standing form): the lexical
      // survivors' embeddings probe the stored sign-LSH index parts < id
      // (same strictly-below replay horizon as every family), candidates
      // verify by exact cosine against the doc-keyed embedding family —
      // fetched per matched candidate, pruned to their doc buckets, never
      // scanned. Runs AFTER the lexical gate (a doc rejected there never
      // reaches here — stages stay sequential, one ledger row per doc)
      // and BEFORE the in-batch pass (cross-batch gates together).
      var esigParts = 0
      var probedESigBkts: Option[Seq[Int]] = None // None = unpruned probe
      var probedEmbBkts: Option[Seq[Int]] = None
      var esigPartInfo: Seq[(String, Boolean)] = Nil
      var embPartInfo: Seq[(String, Boolean)] = Nil
      val (kept1s, rejSemantic) = (cfg.semanticThreshold, cfg.corpusDir) match {
        case (Some(tau), Some(cd)) =>
          esigPartInfo = tieredInfo(cd, "esigbase=", "esigmid=", "esig=")
          embPartInfo = tieredInfo(cd, "embbase=", "embmid=", "emb=")
          esigParts = esigPartInfo.size
          if (esigPartInfo.isEmpty)
            (kept1, spark.emptyDataset[(Long, String, String)]
              .toDF("doc_id", "stage", "reason"))
          else {
            // per-part reads unioned — the same partition-discovery
            // refusal the bands read documents; base/mid parts are
            // dir-partitioned by bkt, deltas carry it as data
            val esigSchema =
              if (bucketed) "doc_id BIGINT, t INT, sig BIGINT, bkt INT"
              else "doc_id BIGINT, t INT, sig BIGINT"
            val embSchema =
              if (bucketed) "doc_id BIGINT, emb ARRAY<FLOAT>, bkt INT"
              else "doc_id BIGINT, emb ARRAY<FLOAT>"
            val esigCols = Seq("doc_id", "t", "sig") ++
              (if (bucketed) Seq("bkt") else Nil)
            val embCols = Seq("doc_id", "emb") ++
              (if (bucketed) Seq("bkt") else Nil)
            val storedSigs = esigPartInfo.map { case (p, _) =>
                spark.read.schema(esigSchema).parquet(p)
                  .select(esigCols.map(col): _*) }
              .reduce(_.unionByName(_))
            val storedEmbs = embPartInfo.map { case (p, _) =>
                spark.read.schema(embSchema).parquet(p)
                  .select(embCols.map(col): _*) }
              .reduce(_.unionByName(_))
            val probe = Similarity.incrementalSemanticDup(
              storedSigs, storedEmbs, kept1.filter(col("emb").isNotNull),
              "doc_id", "emb", tau, cfg.semanticPlanes, cfg.semanticTables,
              cfg.stateBuckets, cfg.maxBroadcastKeys)
            cleanups += probe.cleanup
            if (bucketed) probedESigBkts = Some(probe.probedBuckets)
            probedEmbBkts = probe.probedEmbBuckets
            val dupAgg = flatPersist(probe.pairs
              .groupBy(col("batch_id").as("doc_id"))
              .agg(min(col("corpus_id")).as("__dup_of")))
            (kept1.join(dupAgg.select("doc_id"), Seq("doc_id"), "left_anti"),
              dupAgg.select(col("doc_id"), lit("semantic_dup").as("stage"),
                concat(lit("semantic_dup_of:"), col("__dup_of")).as("reason")))
          }
        case _ =>
          (kept1, spark.emptyDataset[(Long, String, String)]
            .toDF("doc_id", "stage", "reason"))
      }
      // the index this batch scores against: the part union STRICTLY
      // below id — latest base plus the deltas above it (a crashed run
      // may already have written delta=id; replay must not read its own
      // output). ngramNoveltyAgainst min-folds the duplicate gram rows.
      // Bucketed layout: the read is PRUNED to the buckets the batch's own
      // grams touch (partition-directory pruning — non-matching buckets'
      // files are never opened; exact, because a pruned gram's bucket is a
      // pure function of the gram, so it cannot match any batch gram).
      // Listed HERE (before the in-batch stage) because the bucket-stats
      // probe rides the in-batch CC's first convergence certificate below.
      val (baseV, deltaVs) = familyParts(spark, cfg.indexDir, "base=", "delta=", id)
      // (path, isPrunedBase): the base is dir-partitioned by bkt (pruned
      // read); delta parts are plain batch-scale writes read in full
      val idxPartInfo = baseV.map(v => (s"${cfg.indexDir}/base=$v", bucketed)).toSeq ++
        deltaVs.map(v => (s"${cfg.indexDir}/delta=$v", false))
      val partPaths = idxPartInfo.map(_._1)
      var probedGramBkts: Option[Seq[Int]] = None // None = unpruned probe
      var batchGrams = -1L // measured distinct grams (bucketed path only)
      // whether the novelty probe needs the bucket-stats pass at all
      val bucketedIdxProbe = bucketed && partPaths.nonEmpty
      def readIndexParts(): DataFrame =
        if (bucketed)
          // per-part reads unioned — see the bands read above for why a
          // multi-root partitioned read is refused by partition discovery
          partPaths.map(pp =>
            spark.read.schema("gram BIGINT, owner BIGINT, bkt INT")
              .parquet(pp).select("gram", "owner", "bkt"))
            .reduce(_.unionByName(_))
        else spark.read.parquet(partPaths: _*)

      // optional WITHIN-batch dedup: the batch's own near-dup pairs
      // collapse to clusters, the minimum id per cluster survives —
      // deterministic, so replay-safe like every other stage
      require(!cfg.inBatchNearDup || cfg.nearDupThreshold.nonEmpty,
        "Intake: inBatchNearDup requires nearDupThreshold (the same " +
          "calibration the cross-batch gate uses)")
      val (kept1x, rejInBatch) = (cfg.inBatchNearDup, cfg.nearDupThreshold) match {
        case (true, Some(t)) =>
          // COMPUTE-ONCE signatures (guide §1.4): the batch was already
          // MinHash-signed once for the cross-corpus probe (batchSigs —
          // per-doc signatures depend only on the doc's own text, so the
          // superset-computed frame carries identical values restricted to
          // the in-batch survivors); only a gate-less corpus (no stored
          // parts AND no probe ran) signs here.
          val pairs0 = batchSigs match {
            case Some(sg) => Dedup.nearDupPairsFromSigs(
              kept1s.select("doc_id", "text"), "doc_id", "text", sg,
              cfg.numHashes, cfg.bands, t)
            case None =>
              val (p, relP) = Dedup.nearDupPairsManaged(
                kept1s.select("doc_id", "text"), "doc_id", "text",
                cfg.numHashes, cfg.bands, t)
              cleanups += relP
              p
          }
          val pairs = pairs0.persist()
          cleanups += (() => { pairs.unpersist(); () })
          // ONE action for three probes (guide §1.2 — at micro-batch scale
          // each action's analysis+scheduling envelope IS the cost): the
          // CC's first convergence certificate carries (a) the seeded edge
          // COUNT — 0 iff the batch has no internal near-dup pairs, which
          // replaces the previous separate `pairs.isEmpty` probe, and (b)
          // the novelty gate's gram-bucket stats as a one-row side
          // aggregate. The stats run over kept1s (the pre-in-batch
          // survivors, a SUPERSET of kept1p): the pruned index read stays
          // EXACT — a pruned-away gram's bucket is a pure function of the
          // gram, and the probe join still matches on the gram itself, so
          // extra buckets add only rows the join drops — and the broadcast
          // bound sees a conservative (larger) gram count.
          val side = if (bucketedIdxProbe) Some(Novelty.gramBucketStatsAgg(
            Novelty.explodedGramFrame(kept1s.select("doc_id", "text"),
              "doc_id", "text", cfg.n), cfg.stateBuckets)) else None
          val (assigned0, relA, firstCert) =
            graft.llm.Clusters.assignManagedProbed(
              kept1s.select("doc_id"), pairs.select("doc_a", "doc_b"), side)
          cleanups += relA
          if (bucketedIdxProbe) {
            val (bkts, nGrams) = Novelty.parseGramBucketStats(
              firstCert.getSeq[org.apache.spark.sql.Row](3))
            probedGramBkts = Some(bkts)
            batchGrams = nGrams
          }
          // common case: NO internal near-dup pairs (certificate edge count
          // 0) — every doc is its own canonical, so the outputs are
          // definitionally identical to the CC path (spec-asserted) and the
          // downstream plans skip the assignment joins entirely.
          if (firstCert.getLong(0) == 0L)
            (kept1s, spark.emptyDataset[(Long, String, String)]
              .toDF("doc_id", "stage", "reason"))
          else {
            val assigned = flatPersist(assigned0)
            (kept1s.join(
              assigned.filter(col("doc_id") === col("cluster_id"))
                .select("doc_id"), "doc_id"),
              assigned.filter(col("doc_id") =!= col("cluster_id"))
                .select(col("doc_id"), lit("in_batch_near_dup").as("stage"),
                  concat(lit("canonical:"), col("cluster_id")).as("reason")))
          }
        case _ =>
          (kept1s, spark.emptyDataset[(Long, String, String)]
            .toDF("doc_id", "stage", "reason"))
      }
      // kept1p feeds the most downstream actions of any stage frame (gram
      // stats, novelty, drift, splits, three state writes) — the barrier
      // matters most here
      val kept1p = flatPersist(kept1x)

      val prevIndex =
        if (partPaths.isEmpty) None
        else if (bucketed) {
          // the bucket stats normally rode the in-batch certificate above;
          // without an in-batch stage they are their own (kept1p-scoped)
          // action, as before
          if (probedGramBkts.isEmpty) {
            val (bkts, nGrams) = Novelty.gramBucketStats(
              kept1p.select("doc_id", "text"), "doc_id", "text", cfg.n,
              cfg.stateBuckets)
            probedGramBkts = Some(bkts)
            batchGrams = nGrams
          }
          Some(readIndexParts()
            .where(col("bkt").isin(probedGramBkts.get: _*))
            .select("gram", "owner"))
        } else Some(readIndexParts().select("gram", "owner"))

      // COMPUTE-ONCE exploded grams (guide §1.4): the novelty score
      // references the batch's (doc, gram) rows three times (batch owner,
      // probe gram set, per-doc stats) and the gram-index DELTA write below
      // derives from the same rows — one persisted frame feeds all of them
      // instead of re-running the explode/collect pipeline per consumer.
      val grams1p = flatPersist(Novelty.explodedGramFrame(
        kept1p.select("doc_id", "text"), "doc_id", "text", cfg.n))
      val scored = (prevIndex match {
        case Some(idx) =>
          // broadcastProbe while the batch-gram side is MEASURED small
          // (the bucketed path counts distinct grams in the same pass
          // that derives the pruning set): the index is then STREAMED,
          // never exchanged; an oversized batch degrades to the shuffled
          // join over the PRUNED index instead of a broadcast OOM. The
          // flat layout has no measurement pass — the planner decides.
          Novelty.ngramNoveltyAgainstGrams(idx, kept1p.select("doc_id", "text"),
            grams1p, "doc_id",
            broadcastProbe = bucketed && batchGrams <= cfg.maxBroadcastKeys)
        case None =>
          Novelty.ngramNoveltyFromGrams(kept1p.select("doc_id", "text"),
            grams1p, "doc_id")
      })
      // feeds both the gate and the reject ledger
      val scoredP = flatPersist(scored)
      val rejNovelty = scoredP
        .filter(col("novelty_micros").isNull ||
          col("novelty_micros") < cfg.noveltyMinMicros)
        .select(col("doc_id"), lit("novelty").as("stage"),
          concat(lit("novelty_micros:"),
            coalesce(col("novelty_micros").cast("string"), lit("null")))
            .as("reason"))
      val kept2 = kept1p
        .join(scoredP.filter(col("novelty_micros") >= cfg.noveltyMinMicros)
          .select("doc_id"), "doc_id")
        .select("doc_id", "lang")

      // probe-I/O telemetry, measured NOW — after the probes, before this
      // batch's state writes land and before compaction retires the very
      // parts the probes read (listing them later would read 0)
      // per-part: the bucketed BASE is partition-pruned to the probed
      // buckets; delta parts (and every flat-layout part) are read in full
      def familyBytes(info: Seq[(String, Boolean)],
                      probed: Option[Set[Int]]): (Long, Long) = {
        val sizes = info.map { case (pp, isBase) =>
          partBytes(spark, pp, if (isBase) probed else None) }
        (sizes.map(_._1).sum, sizes.map(_._2).sum)
      }
      val (idxBytes, idxBytesProbed) =
        familyBytes(idxPartInfo, probedGramBkts.map(_.toSet))
      val (sigBytes, sigBytesProbed) =
        familyBytes(sigPartInfo, probedSigBkts.map(_.toSet))
      val (textBytes, textBytesProbed) =
        familyBytes(textPartInfo, probedTextBkts.map(_.toSet))
      val (esigBytes, esigBytesProbed) =
        familyBytes(esigPartInfo, probedESigBkts.map(_.toSet))
      val (embBytes, embBytesProbed) =
        familyBytes(embPartInfo, probedEmbBkts.map(_.toSet))

      val priorCounters = cfg.countersDir.map { cd =>
        versionsOf(spark, cd).filter(_ < id).sorted.lastOption
          .map(v => spark.read.parquet(s"$cd/v=$v")
            .select("stratum", "split", "n_assigned"))
          .getOrElse {
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(Seq(StructField("stratum", StringType),
                StructField("split", StringType),
                StructField("n_assigned", LongType))))
          }
      }
      val assignments = priorCounters match {
        case Some(prior) => Selection.splitAssignContinuing(
          kept2, "lang", "doc_id", cfg.splits, prior, seed = s"${cfg.seed}:$id")
        case None => Selection.splitAssign(
          kept2, "lang", "doc_id", cfg.splits, seed = s"${cfg.seed}:$id")
      }
      // The telemetry counts ride the two output writes as OBSERVED metrics
      // (`CollectMetrics` over the exact rows the writes persist) instead
      // of separate count actions: each dropped action saves its whole
      // Catalyst-analysis + AQE-scheduling envelope — the profiled ~65 ms
      // sub-job floor × stages, the dominant term of steady-state per-batch
      // latency. Counting DURING the write also pins the values to the
      // persisted truth before compaction retires any input part a
      // recompute would need (a cached-partition loss after compaction
      // otherwise re-reads deleted paths).
      val survObs = org.apache.spark.sql.Observation(s"intake_surv_$id")
      val rejObs = org.apache.spark.sql.Observation(s"intake_rej_$id")

      // ---- concurrent write phase: every per-batch output/state write.
      // Each task writes its OWN part directory from already-persisted
      // stage frames, and every family's read side takes parts STRICTLY
      // below id — so no ordering among these writes was ever semantic (a
      // crash after any subset is a state replay already recovers from,
      // which is also why the soak's random-seam kills stay valid). Running
      // them sequentially serialized ~7 scheduling-dominated actions per
      // batch onto an idle cluster; the profiled steady-state floor is
      // exactly that sum of per-action scheduling envelopes.
      val writeTasks = Seq.newBuilder[(String, () => Unit)]
      writeTasks += "assignments" -> (() => {
        assignments
          .select(col("id").as("doc_id"), col("stratum"), col("split"),
            col("rank_in_stratum"))
          .observe(survObs, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"${cfg.outDir}/batch=$id")
        CrashHooks.seam("assignments")
      })

      // the DROP LEDGER: every rejected doc with its stage and reason —
      // stages are sequential, so each doc appears at most once, and
      // (survivors ∪ rejects) partition the batch exactly (spec-asserted).
      // Written with the same overwrite-replay contract as the assignments.
      // One action: the write is the union's only consumer (the telemetry
      // stage counts are observed on it), so no persist either.
      writeTasks += "rejects" -> (() => {
        rejBlocklist
          .unionByName(rejNearDup)
          .unionByName(rejSemantic)
          .unionByName(rejInBatch)
          .unionByName(rejNovelty)
          .observe(rejObs,
            count(when(col("stage") === "blocklist", 1)).as("blocklist"),
            count(when(col("stage") === "near_dup", 1)).as("near_dup"),
            count(when(col("stage") === "semantic_dup", 1)).as("semantic_dup"),
            count(when(col("stage") === "in_batch_near_dup", 1)).as("in_batch_near_dup"),
            count(when(col("stage") === "novelty", 1)).as("novelty"))
          .write.mode("overwrite").parquet(s"${cfg.outDir}/rejects/batch=$id")
        CrashHooks.seam("rejects")
      })

      // optional drift monitoring: the batch's surviving docs vs the
      // accumulated reference counts of every PRIOR batch's survivors
      // (self-contained: reads kept1p + its own state dirs only)
      cfg.driftDir.foreach(dd =>
        writeTasks += "drift" -> (() => driftStage(spark, cfg, dd, kept1p, id)))

      // accumulate the corpus the near-dup gate probes: this batch's
      // near-dup SURVIVORS — text part (verify joins) AND signature part
      // (the probe's stored index) — each appended as its own part
      // (replay overwrites both)
      // Delta parts are PLAIN batch-scale writes even under the bucketed
      // layout (bkt rides as a data column): a per-batch dynamic-partition
      // write fans one small batch across stateBuckets directories —
      // measured ~+10 s/batch at 64 buckets over the 10× set, 3 writes ×
      // 64 dirs of sub-MB files. The probes read the few pending deltas in
      // full (batch-scale, flat in corpus size) and the standing BASE
      // pruned; compaction below folds the deltas into the bucketed base,
      // so the corpus-scale state is always the pruned side.
      if (cfg.nearDupThreshold.isDefined) cfg.corpusDir.foreach { cd =>
        val text = kept1p.select("doc_id", "text")
        writeTasks += "corpus_text" -> (() => {
          (if (bucketed)
            text.withColumn("bkt", Dedup.docBucket(col("doc_id"), cfg.stateBuckets))
           else text)
            .write.mode("overwrite").parquet(s"$cd/part=$id")
          CrashHooks.seam("corpus_text")
        })
        writeTasks += "corpus_sigs" -> (() => {
          // reuse the batch's one persisted sign pass, restricted to the
          // surviving ids (value-identical: signatures are per-doc)
          val sigs = batchSigs.get.join(kept1p.select("doc_id"), "doc_id")
          if (bucketed)
            Dedup.bandIndexFrame(sigs, cfg.numHashes, cfg.bands, cfg.stateBuckets)
              .write.mode("overwrite").parquet(s"$cd/bands=$id")
          else
            sigs.write.mode("overwrite").parquet(s"$cd/sigs=$id")
          CrashHooks.seam("corpus_sigs")
        })
      }

      // the semantic gate's state: this batch's surviving docs' embeddings
      // (doc-keyed, the candidate verify side) and their sign-LSH index
      // rows (the probe side) — same per-batch-part, strictly-below-replay,
      // delta-then-fold protocol as every other corpus family; null-emb
      // docs contribute nothing (they can never be a semantic candidate)
      if (cfg.semanticThreshold.isDefined) cfg.corpusDir.foreach { cd =>
        val embF = kept1p.filter(col("emb").isNotNull).select("doc_id", "emb")
        writeTasks += "corpus_emb" -> (() => {
          (if (bucketed)
             embF.withColumn("bkt", Dedup.docBucket(col("doc_id"), cfg.stateBuckets))
           else embF)
            .write.mode("overwrite").parquet(s"$cd/emb=$id")
          CrashHooks.seam("corpus_emb")
        })
        writeTasks += "corpus_esig" -> (() => {
          Similarity.esigIndexFrame(embF, cfg.semanticPlanes, cfg.semanticTables,
              if (bucketed) cfg.stateBuckets else 0)
            .write.mode("overwrite").parquet(s"$cd/esig=$id")
          CrashHooks.seam("corpus_esig")
        })
      }

      // append the batch's surviving grams as a DELTA part (q88 semantics:
      // ownership within the surviving corpus — post-blocklist and, when
      // the gate is on, post-near-dup) — batch-vocabulary-scale, never the
      // merged index
      writeTasks += "gram_delta" -> (() => {
        val delta = Novelty.gramIndexFromGrams(grams1p, "doc_id")
        (if (bucketed) Novelty.withGramBucket(delta, cfg.stateBuckets) else delta)
          .write.mode("overwrite").parquet(s"${cfg.indexDir}/delta=$id")
        CrashHooks.seam("gram_delta")
      })
      runConcurrent(spark, writeTasks.result())

      // both output writes are complete here, so the observed metrics are
      // final
      val stageCounts = rejObs.get.view.mapValues(_.asInstanceOf[Long])
        .toMap.withDefaultValue(0L)
      val survivors = survObs.get("n").asInstanceOf[Long]

      // ---- concurrent fold phase: counters, compactions, telemetry.
      // These run AFTER the write phase for two reasons: the counters fold
      // reads the WRITTEN assignments back (the persisted truth), and the
      // retires below must not race the write phase's materialization of
      // the cached stage frames (a recompute after a retire would re-read
      // deleted delta paths — the r19 lineage hazard). Within the phase
      // the tasks are disjoint: each fold rewrites its OWN family from
      // parts strictly below id, none of which any other task reads.
      val foldTasks = Seq.newBuilder[(String, () => Unit)]

      // counters fold from the WRITTEN assignments (the persisted truth),
      // versioned and retired exactly like the drift state
      (cfg.countersDir, priorCounters) match {
        case (Some(cd), Some(prior)) =>
          foldTasks += "counters" -> (() => {
            Selection.splitCounters(
                spark.read.parquet(s"${cfg.outDir}/batch=$id"), prior)
              .write.mode("overwrite").parquet(s"$cd/v=$id")
            retireVersions(spark, cfg, cd, id)
            CrashHooks.seam("counters")
          })
        case _ => ()
      }

      // compaction: once enough deltas pend STRICTLY BELOW this batch,
      // fold (base, pending deltas) into base=<newest pending part> and
      // retire the inputs — for EVERY state family: the gram index
      // (min-merged) and, when the gate is on, the corpus text and
      // signature parts (pure concatenation — batches hold disjoint doc
      // ids). The horizon stays below id, so a replay of THIS batch reads
      // identical content whether or not the compaction landed; a crash
      // mid-compaction leaves overlapping parts that the read protocol
      // (newest base + parts strictly above it) never double-reads and the
      // next compaction sweeps.
      if (deltaVs.size >= cfg.compactEvery) foldTasks += "gram_fold" -> (() => {
        val h = deltaVs.max
        val compacted = Novelty.compactGramIndex(
          readIndexParts().select("gram", "owner"))
        if (bucketed)
          writeBucketed(Novelty.withGramBucket(compacted, cfg.stateBuckets),
            s"${cfg.indexDir}/base=$h")
        else compacted.write.mode("overwrite").parquet(s"${cfg.indexDir}/base=$h")
        CrashHooks.seam("gram_fold")
        if (!cfg.keepAllIndexVersions) {
          deltaVs.foreach(v => delete(spark, s"${cfg.indexDir}/delta=$v"))
          versionsOf(spark, cfg.indexDir, prefix = "base=").filter(_ < h)
            .foreach(v => delete(spark, s"${cfg.indexDir}/base=$v"))
        }
        CrashHooks.seam("gram_retire")
      })

      // corpus families fold on their OWN pending-delta counts (in normal
      // operation these track the gram family batch-for-batch, so the
      // triggers coincide; after a crash between the gram retire and a
      // family fold, the family self-heals on the very next batch instead
      // of accumulating up to ~2× compactEvery parts while it waits out
      // another gram window). Horizon = the family's own newest pending
      // delta — still strictly below id, so the replay contract holds.
      def foldCorpusFamily(cd: String, basePrefix: String, midPrefix: String,
                           deltaPrefix: String, schema: String,
                           bucketedFamily: Boolean): Unit =
        if (cfg.twoTierCorpus)
          compactFamilyTwoTier(spark, cfg, cd, basePrefix, midPrefix,
            deltaPrefix, schema, id, bucketedFamily)
        else {
          val (_, pend) = familyParts(spark, cd, basePrefix, deltaPrefix, id)
          if (pend.size >= cfg.compactEvery)
            compactFamily(spark, cfg, cd, basePrefix, deltaPrefix, schema,
              pend.max, bucketedFamily)
        }
      if (cfg.nearDupThreshold.isDefined) cfg.corpusDir.foreach { cd =>
        foldTasks += "fold_text" -> (() =>
          foldCorpusFamily(cd, "partbase=", "partmid=", "part=",
            if (bucketed) "doc_id BIGINT, text STRING, bkt INT"
            else "doc_id BIGINT, text STRING", bucketed))
        if (bucketed)
          foldTasks += "fold_bands" -> (() =>
            foldCorpusFamily(cd, "bandsbase=", "bandsmid=", "bands=",
              "doc_id BIGINT, b INT, bkey STRING, w INT, bkt INT",
              bucketedFamily = true))
        else
          foldTasks += "fold_sigs" -> (() =>
            foldCorpusFamily(cd, "sigsbase=", "sigsmid=", "sigs=",
              "doc_id BIGINT, mh ARRAY<BIGINT>", bucketedFamily = false))
      }
      if (cfg.semanticThreshold.isDefined) cfg.corpusDir.foreach { cd =>
        foldTasks += "fold_emb" -> (() =>
          foldCorpusFamily(cd, "embbase=", "embmid=", "emb=",
            if (bucketed) "doc_id BIGINT, emb ARRAY<FLOAT>, bkt INT"
            else "doc_id BIGINT, emb ARRAY<FLOAT>", bucketed))
        foldTasks += "fold_esig" -> (() =>
          foldCorpusFamily(cd, "esigbase=", "esigmid=", "esig=",
            if (bucketed) "doc_id BIGINT, t INT, sig BIGINT, bkt INT"
            else "doc_id BIGINT, t INT, sig BIGINT", bucketed))
      }

      // per-batch telemetry: stage counts and survivors were OBSERVED on
      // the two output writes above (the exact rows those writes persisted
      // — no extra action, no read-back); state sizes come from directory
      // listings. batch_docs is DERIVED: the stages are sequential and
      // (survivors ∪ rejects) partition the batch exactly (spec-asserted),
      // so the sum IS the batch row count — the last separate count action
      // removed. `*_buckets_probed` is -1 when the probe was unpruned
      // (flat layout, or no parts yet). The row is built on the driver
      // before the fold phase launches and written concurrently with it
      // (it reads nothing any fold touches).
      val batchDocs = survivors + stageCounts("blocklist") +
        stageCounts("near_dup") + stageCounts("semantic_dup") +
        stageCounts("in_batch_near_dup") + stageCounts("novelty")
      val telem: Seq[(String, Long)] = Seq(
        "batch_id" -> id, "batch_docs" -> batchDocs,
        "rej_blocklist" -> stageCounts("blocklist"),
        "rej_near_dup" -> stageCounts("near_dup"),
        "rej_semantic" -> stageCounts("semantic_dup"),
        "rej_in_batch" -> stageCounts("in_batch_near_dup"),
        "rej_novelty" -> stageCounts("novelty"),
        "survivors" -> survivors,
        "index_parts" -> partPaths.size.toLong,
        "index_bytes" -> idxBytes, "index_bytes_probed" -> idxBytesProbed,
        "index_buckets_probed" -> probedGramBkts.fold(-1L)(_.size.toLong),
        "sig_parts" -> sigParts.toLong,
        "sig_bytes" -> sigBytes, "sig_bytes_probed" -> sigBytesProbed,
        "sig_buckets_probed" -> probedSigBkts.fold(-1L)(_.size.toLong),
        "text_parts" -> textPartInfo.size.toLong,
        "text_bytes" -> textBytes, "text_bytes_probed" -> textBytesProbed,
        "text_buckets_probed" -> probedTextBkts.fold(-1L)(_.size.toLong),
        "esig_parts" -> esigParts.toLong,
        "esig_bytes" -> esigBytes, "esig_bytes_probed" -> esigBytesProbed,
        "esig_buckets_probed" -> probedESigBkts.fold(-1L)(_.size.toLong),
        "emb_parts" -> embPartInfo.size.toLong,
        "emb_bytes" -> embBytes, "emb_bytes_probed" -> embBytesProbed,
        "emb_buckets_probed" -> probedEmbBkts.fold(-1L)(_.size.toLong),
        "state_buckets" -> cfg.stateBuckets.toLong)
      foldTasks += "telemetry" -> (() => {
        spark.createDataFrame(
            java.util.Arrays.asList(
              org.apache.spark.sql.Row(telem.map(_._2): _*)),
            StructType(telem.map(t => StructField(t._1, LongType))))
          .write.mode("overwrite").parquet(s"${cfg.outDir}/metrics/batch=$id")
        CrashHooks.seam("telemetry")
      })
      runConcurrent(spark, foldTasks.result())
    } finally cleanups.reverse.foreach(f => scala.util.Try(f()))
  }

  /** The drift monitoring stage: compare this batch's surviving docs
    * against the accumulated reference counts, then fold the batch into
    * the state. Statistics: word-count distribution (integer-ECDF KS —
    * the bounded-integer-statistic contract) and language mix
    * (categorical TV). State is DOMAIN-scale (distinct values × 1 row),
    * folded once per batch; the compare runs entirely on counts. */
  private def driftStage(spark: SparkSession, cfg: Config, dd: String,
                         kept: DataFrame, id: Long): Unit = {
    // null-text docs never reach the corpus (the novelty gate's null ratio
    // fails any threshold), so the monitor measures the same stream the
    // pipeline can actually ingest instead of refusing the whole batch
    val wcBatch = kept.filter(col("text").isNotNull)
      .select(size(split(lower(col("text")), " ")).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    val langBatch = kept.select(col("lang").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    def prior(sub: String): Option[DataFrame] =
      versionsOf(spark, s"$dd/$sub").filter(_ < id).sorted.lastOption
        .map(v => spark.read.parquet(s"$dd/$sub/v=$v").select("v", "c"))
    val (wcPrior, langPrior) = (prior("wc"), prior("lang"))

    (wcPrior, langPrior) match {
      case (Some(wp), Some(lp)) =>
        def sides(ref: DataFrame, bat: DataFrame) = ref
          .select(lit("ref").as("g"), col("v"), col("c"))
          .unionByName(bat.select(lit("batch").as("g"), col("v"), col("c")))
        val ks = Drift.ecdfDriftFromCounts(sides(wp, wcBatch), "g", "v", "c")
          .select(lit("wordcount_ks").as("stat"), col("grp_a"), col("grp_b"),
            col("n_a"), col("n_b"), col("d_micros"))
        val tv = Drift.categoricalDriftFromCounts(sides(lp, langBatch), "g", "v", "c")
          .select(lit("lang_tv").as("stat"), col("grp_a"), col("grp_b"),
            col("n_a"), col("n_b"), col("tv_micros").as("d_micros"))
        ks.unionByName(tv)
          .write.mode("overwrite").parquet(s"${cfg.outDir}/drift/batch=$id")
        CrashHooks.seam("drift_report")
      case _ => () // first batch: no reference yet, state only
    }

    // fold the batch into the reference state (sum counts), versioned and
    // retired on the same strictly-below protocol as the counters
    def fold(sub: String, priorDf: Option[DataFrame], bat: DataFrame): Unit = {
      priorDf.fold(bat)(p => p.unionByName(bat)
          .groupBy("v").agg(sum(col("c")).as("c")))
        .write.mode("overwrite").parquet(s"$dd/$sub/v=$id")
      retireVersions(spark, cfg, s"$dd/$sub", id)
      CrashHooks.seam(s"drift_state:$sub")
    }
    fold("wc", wcPrior, wcBatch)
    fold("lang", langPrior, langBatch)
  }

  /** BATCH-MODE REPLAY seam: drive pre-partitioned batches through the
    * standing per-batch pipeline IN ORDER against `cfg`'s state
    * directories, then return the combined outcome — exactly one row per
    * ingested document: survivors as (batch_id, doc_id, stage='survived',
    * reason='<stratum>:<split>:<rank_in_stratum>') plus the full drop
    * ledger rows as written (`blocklist` / `near_dup` /
    * `in_batch_near_dup` / `novelty`). The same per-batch function the
    * streaming entry runs ([[processBatch]]) — same state layout, same
    * compaction, same replay contract — so a backfill through this seam
    * is bit-identical to having streamed the batches, and the whole
    * pipeline (including state evolution ACROSS compaction folds) can be
    * oracle-checked end-to-end against a batch-mode replay (q100). Batch
    * ids must be strictly increasing: every state family reads parts
    * strictly below the current id. */
  def replay(spark: SparkSession, cfg: Config,
             batches: Seq[(Long, DataFrame)]): DataFrame = {
    require(batches.nonEmpty, "Intake.replay: no batches")
    val ids = batches.map(_._1)
    require(ids == ids.sorted && ids.distinct.size == ids.size,
      s"Intake.replay: batch ids must be strictly increasing, got $ids")
    batches.foreach { case (id, df) => processBatch(spark, cfg, df, id) }
    ids.map { id =>
      spark.read.parquet(s"${cfg.outDir}/batch=$id")
        .select(lit(id).as("batch_id"), col("doc_id"),
          lit("survived").as("stage"),
          concat(col("stratum"), lit(":"), col("split"), lit(":"),
            col("rank_in_stratum")).as("reason"))
        .unionByName(spark.read.parquet(s"${cfg.outDir}/rejects/batch=$id")
          .select(lit(id).as("batch_id"), col("doc_id"), col("stage"),
            col("reason")))
    }.reduce(_.unionByName(_))
  }

  /** Retire `v=` versions below the replay horizon: a restart replays at
    * most batch id+1, which reads v≤id — every version below the PREVIOUS
    * one is dead. */
  private def retireVersions(spark: SparkSession, cfg: Config, dir: String,
                             id: Long): Unit =
    if (!cfg.keepAllIndexVersions) {
      val pv = versionsOf(spark, dir).filter(_ < id).sorted
      pv.dropRight(1).foreach(v => delete(spark, s"$dir/v=$v"))
    }

  /** OFFLINE bucket-count migration for a stopped intake's state
    * directories — the escape hatch when a corpus outgrows the bucket
    * count its state was first written with (the [[Config.stateBuckets]]
    * sizing law: bucket FILES should stay chunk-sized, so a corpus that
    * grew 100× wants more buckets; without this tool the only remedy is a
    * full rebuild). For `cfg.indexDir` and `cfg.corpusDir` (if set): each
    * bucketed family's live parts are read, re-bucketed at `newBuckets`
    * (every bucket id is a PURE FUNCTION of its key — gram, doc id, band
    * key — so the rewrite is a per-row recompute, no probe semantics
    * change), folded into ONE new base at the family's newest part
    * version, and published; the `_state_buckets` marker then flips
    * atomically. Probe results are identical before and after
    * (spec-asserted): pruning only ever skips buckets no batch key maps
    * to, under whichever count the marker records.
    *
    * Pending (un-compacted) delta/mid parts REFUSE by default — the
    * normal posture for an offline tool pointed at a directory someone
    * forgot to drain; `foldPending = true` folds them into the new base
    * instead (the same merge each family's compaction performs: min-fold
    * for the gram index, disjoint concatenation for the corpus families),
    * which is the practical path since a standing intake always leaves
    * its newest delta pending.
    *
    * Crash contract: a `_rebucket_in_progress` sentinel lands in each
    * directory before any rewrite and ingest REFUSES while it exists, so
    * a mid-migration crash can never feed a half-migrated layout to the
    * probes. Re-running rebucket with the same target finishes the job:
    * the recovery sweep restores any family whose publish was cut between
    * renames (`_rebucket_old_` backup present, live base missing), drops
    * orphan temp writes, and every re-fold recomputes the same bucket ids
    * (idempotent). The marker flip is last, after every family of that
    * directory has published. */
  def rebucket(spark: SparkSession, cfg: Config, newBuckets: Int,
               foldPending: Boolean = false): Unit = {
    import graft.llm.{Dedup, Novelty}
    require(newBuckets >= 1 && newBuckets <= Novelty.MaxBuckets,
      s"Intake.rebucket: newBuckets must be in [1, ${Novelty.MaxBuckets}], " +
        s"got $newBuckets (the flat layout is not a migration target — " +
        "rebuild instead)")
    // (base, mid, delta, schema, keep-columns, fold, re-bucket) per family;
    // the gram family is single-tier (mid prefix never exists on disk) and
    // min-folds, the corpus families concatenate (disjoint doc ids)
    final case class Fam(basePfx: String, midPfx: String, deltaPfx: String,
                         schema: String, keep: Seq[String],
                         fold: DataFrame => DataFrame,
                         bucket: DataFrame => DataFrame)
    val gram = Fam("base=", "basemid_unused=", "delta=",
      "gram BIGINT, owner BIGINT, bkt INT", Seq("gram", "owner"),
      Novelty.compactGramIndex, df => Novelty.withGramBucket(df, newBuckets))
    val text = Fam("partbase=", "partmid=", "part=",
      "doc_id BIGINT, text STRING, bkt INT", Seq("doc_id", "text"),
      identity, df => df.withColumn("bkt",
        Dedup.docBucket(col("doc_id"), newBuckets)))
    val bands = Fam("bandsbase=", "bandsmid=", "bands=",
      "doc_id BIGINT, b INT, bkey STRING, w INT, bkt INT",
      Seq("doc_id", "b", "bkey", "w"),
      identity, df => df.withColumn("bkt",
        Dedup.bandBucket(col("b"), col("bkey"), newBuckets)))
    val esig = Fam("esigbase=", "esigmid=", "esig=",
      "doc_id BIGINT, t INT, sig BIGINT, bkt INT", Seq("doc_id", "t", "sig"),
      identity, df => df.withColumn("bkt",
        graft.llm.Similarity.esigBucket(col("t"), col("sig"), newBuckets)))
    val emb = Fam("embbase=", "embmid=", "emb=",
      "doc_id BIGINT, emb ARRAY<FLOAT>, bkt INT", Seq("doc_id", "emb"),
      identity, df => df.withColumn("bkt",
        Dedup.docBucket(col("doc_id"), newBuckets)))
    val dirs = Seq(cfg.indexDir -> Seq(gram)) ++
      cfg.corpusDir.map(cd => cd -> Seq(text, bands, esig, emb))

    // a crashed migration can leave SOME directories finished (marker
    // flipped, sentinel cleared) and others mid-flight — finished ones
    // skip, so the re-run repairs the rest; a call where EVERY dir is
    // already at the target and none is mid-flight is a mistake, refused
    var touched = false
    dirs.foreach { case (dir, fams) =>
      val dp = new Path(dir)
      val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dp)) fs.mkdirs(dp)
      val sentinel = new Path(dir, RebucketSentinel)
      val resuming = fs.exists(sentinel)
      // recovery sweep: orphan temp writes die, a family whose publish was
      // cut between the two renames gets its backup restored
      fs.listStatus(dp).map(_.getPath.getName).foreach { n =>
        if (n.startsWith("_rebucket_tmp_")) delete(spark, s"$dir/$n")
        else if (n.startsWith("_rebucket_old_")) {
          val live = new Path(dir, n.stripPrefix("_rebucket_old_"))
          if (!fs.exists(live)) fs.rename(new Path(dir, n), live)
          else delete(spark, s"$dir/$n")
        }
      }
      if (resuming)
        readIntMarker(spark, dir, RebucketSentinel).foreach(rec =>
          require(rec == newBuckets,
            s"Intake.rebucket: the in-progress migration at $dir targets " +
              s"stateBuckets=$rec but this run asks for $newBuckets — every " +
              "fold recomputes bucket ids from the keep columns, so finishing " +
              "at a different target WOULD be safe, but a mismatched re-run " +
              "is far more likely a wrong-config mistake than an intentional " +
              "re-target; re-run with $rec (or delete the sentinel to " +
              "restart the migration at the new target)"))
      val old = readIntMarker(spark, dir, "_state_buckets")
      require(old.isDefined || !hasStateParts(spark, dir),
        s"Intake.rebucket: state at $dir holds parts but no _state_buckets " +
          "marker — its layout is unknowable; restore the marker first")
      require(old.forall(_ > 0),
        s"Intake.rebucket: state at $dir is FLAT (stateBuckets=0) — there " +
          "are no bucket ids to migrate; rebuild under a bucketed layout")
      if (!resuming && old.contains(newBuckets)) () // this dir already done
      else {
      touched = true
      writeIntMarker(spark, dir, RebucketSentinel, newBuckets)
      CrashHooks.seam("rebucket_sentinel")

      fams.foreach { f =>
        val (baseV, midVs, deltaVs) = familyPartsTiered(
          spark, dir, f.basePfx, f.midPfx, f.deltaPfx, Long.MaxValue)
        require(foldPending || (midVs.isEmpty && deltaVs.isEmpty),
          s"Intake.rebucket: family ${f.basePfx} at $dir holds pending " +
            s"parts (${(midVs.map(v => s"${f.midPfx}$v") ++
              deltaVs.map(v => s"${f.deltaPfx}$v")).mkString(", ")}) — " +
            "pass foldPending = true to fold them into the migrated base")
        val paths = baseV.map(v => s"$dir/${f.basePfx}$v").toSeq ++
          midVs.map(v => s"$dir/${f.midPfx}$v") ++
          deltaVs.map(v => s"$dir/${f.deltaPfx}$v")
        if (paths.nonEmpty) {
          val v = (baseV.toSeq ++ midVs ++ deltaVs).max
          val folded = f.fold(paths.map(p =>
              spark.read.schema(f.schema).parquet(p).select(f.keep.map(col): _*))
            .reduce(_.unionByName(_)))
          val liveName = s"${f.basePfx}$v"
          writeBucketed(f.bucket(folded), s"$dir/_rebucket_tmp_$liveName")
          CrashHooks.seam(s"rebucket_tmp:${f.basePfx}")
          val live = new Path(dir, liveName)
          if (fs.exists(live)) {
            fs.rename(live, new Path(dir, s"_rebucket_old_$liveName"))
            CrashHooks.seam(s"rebucket_backup:${f.basePfx}")
          }
          require(fs.rename(new Path(dir, s"_rebucket_tmp_$liveName"), live),
            s"Intake.rebucket: could not publish $dir/$liveName")
          CrashHooks.seam(s"rebucket_publish:${f.basePfx}")
          // the backup of the pre-migration live base is ALWAYS consumed —
          // a lingering _rebucket_old_ means "publish was cut" to the
          // recovery sweep, so it cannot double as keepAllIndexVersions
          // history; superseded versions below are kept under that flag
          // (harmless: every probe reads only the newest base, and the old
          // layout's bucket dirs are never selected)
          delete(spark, s"$dir/_rebucket_old_$liveName")
          if (!cfg.keepAllIndexVersions) {
            versionsOf(spark, dir, f.basePfx).filter(_ != v)
              .foreach(w => delete(spark, s"$dir/${f.basePfx}$w"))
            Seq(f.midPfx, f.deltaPfx).foreach(pfx =>
              versionsOf(spark, dir, pfx)
                .foreach(w => delete(spark, s"$dir/$pfx$w")))
          }
          CrashHooks.seam(s"rebucket_retire:${f.basePfx}")
        }
      }
      writeIntMarker(spark, dir, "_state_buckets", newBuckets)
      CrashHooks.seam("rebucket_marker")
      fs.delete(sentinel, false)
      }
    }
    require(touched,
      s"Intake.rebucket: every state directory is already at " +
        s"stateBuckets=$newBuckets and no migration is in progress")
  }

  /** Start the standing intake: JSON-lines document stream → per-batch
    * blocklist/near-dup/novelty/drift/split with the replay-deterministic
    * state protocol above. `AvailableNow` by default (drain-what-exists,
    * then stop) — use a processing-time trigger for a long-lived tail. */
  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    val schema =
      if (cfg.semanticThreshold.isDefined)
        StructType(docSchema.fields :+
          StructField("emb", ArrayType(FloatType)))
      else docSchema
    var reader = spark.readStream.schema(schema)
    cfg.maxFilesPerTrigger.foreach(k =>
      reader = reader.option("maxFilesPerTrigger", k))
    reader.json(cfg.inputDir)
      .writeStream
      .trigger(cfg.trigger)
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        processBatch(spark, cfg, df, id)
      }
      .start()
  }
}
