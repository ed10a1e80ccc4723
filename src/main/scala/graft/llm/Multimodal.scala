package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY + typed metadata.
  *
  * Contract (what a 100 TB training pipeline needs from the engine):
  *  - the media payload is an opaque `content: BINARY` column that Spark moves
  *    around without interpreting (Tungsten binary, parquet BYTE_ARRAY);
  *  - typed metadata travels in a sibling STRUCT so filters/partition pruning
  *    never touch the payload bytes;
  *  - decode / feature-extract runs batched per partition (one decoder
  *    instance per task, amortized over the iterator — the JVM analogue of a
  *    `mapInPandas` batch UDF).
  *
  * The actual codec is STUBBED (this container has no image/audio libraries):
  * [[StubDecoder]] derives deterministic fake features from the bytes. The
  * Spark-side shape — schema, batching, partitioning — is real and tested; a
  * production deployment swaps [[MediaDecoder]]'s implementation only.
  */
object Multimodal {

  /** One decoded media row. */
  final case class MediaFeatures(id: Long, width: Int, height: Int,
                                 nBytes: Long, frames: Seq[Int])

  /** The pluggable codec boundary: one instance per task/partition. */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, content: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for a real image/audio codec: "dimensions" from
    * the first two bytes, "frame samples" = every 10th byte (up to 5). A real
    * deployment replaces this class body and nothing else. */
  final class StubDecoder extends MediaDecoder {
    override def decode(id: Long, content: Array[Byte]): MediaFeatures = {
      val w = if (content.length > 0) content(0) & 0xFF else 0
      val h = if (content.length > 1) content(1) & 0xFF else 0
      val frames = (1 to math.min(5, content.length / 10)).map(i => content(i * 10 - 1) & 0xFF)
      MediaFeatures(id, w, h, content.length.toLong, frames)
    }
  }

  /** Batched decode over (id BIGINT, content BINARY): one decoder per
    * partition, streamed over the iterator — no per-row construction cost,
    * no driver-side work, arbitrary partition count. */
  def decodeBatched(media: DataFrame, decoder: () => MediaDecoder): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    media.select(col("id").cast("long"), col("content").cast("binary"))
      .mapPartitions { it =>
        val d = decoder() // one instance per task, amortized over the batch
        it.map(r => d.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }

  /** Column-level mirror of [[StubDecoder]] for engine-portable verification:
    * the same fake features expressed as pure SQL functions over the text
    * rendition of the payload (ASCII bytes == chars for the fixture corpus). */
  def fakeWidth(text: Column): Column = ascii(substring(text, 1, 1))
  def fakeHeight(text: Column): Column = ascii(substring(text, 2, 1))
  def frameSample(text: Column, maxFrames: Int = 5): Column =
    transform(sequence(lit(1), least(lit(maxFrames), (length(text) / 10).cast("int"))),
      i => ascii(substring(text, i * 10, lit(1))))

  /** One resized + feature-extracted media row: `pixels` is the
    * nearest-neighbor RESIZE of the payload byte stream to a fixed 16-sample
    * grid (what a real pipeline does to normalize decoded frames before
    * embedding); `hist` is the FEATURE-EXTRACT step — an 8-bin byte histogram,
    * the stub stand-in for a model-derived feature vector. */
  final case class MediaTensor(id: Long, pixels: Seq[Int], hist: Seq[Long])

  /** Pluggable resize/feature codec, one instance per task (same boundary
    * contract as [[MediaDecoder]]). */
  trait MediaTransformer extends Serializable {
    def transform(id: Long, content: Array[Byte]): MediaTensor
  }

  /** Deterministic stub: pixel i of 16 = byte at ⌊i·n/16⌋; histogram bin =
    * top-3 bits of each byte. A real deployment swaps this class only. */
  final class StubTransformer extends MediaTransformer {
    override def transform(id: Long, content: Array[Byte]): MediaTensor = {
      val n = content.length
      val px = (0 until 16).map(i => if (n == 0) 0 else content((i.toLong * n / 16).toInt) & 0xFF)
      val h = Array.ofDim[Long](8)
      content.foreach(b => h((b & 0xFF) >> 5) += 1)
      MediaTensor(id, px, h.toSeq)
    }
  }

  /** 40-bit composite perceptual hash over a [[MediaTensor]] frame — the
    * media-dedup fingerprint real image pipelines compute after decode+resize
    * (aHash/dHash family, e.g. for near-identical frame collapse in web-scale
    * image corpora). Integer-exact by construction (floor comparisons, no
    * float mean), so the value is engine-portable:
    *
    *  - bits 0–15  aHash:  pixel > grid average (as `16·p[j] > Σp`)
    *  - bits 16–30 dHash:  neighbor gradient `p[j] > p[j+1]`
    *  - bits 31–38 histogram shape: bin above uniform (`8·h[b] > n`)
    *  - bit  39    payload-length parity
    *
    * Row-local expression work — the dedup itself is then a hash groupBy
    * (exact) or a banded Hamming join (near), both already-bucketed shapes. */
  def perceptualHash(tensors: DataFrame): DataFrame = {
    require(Seq("pixels", "hist").forall(tensors.columns.contains),
      s"perceptualHash expects a MediaTensor frame (pixels, hist); got: ${tensors.columns.mkString(", ")}")
    require(!tensors.columns.exists(Set("psum", "nb", "phash")),
      "perceptualHash reserves column names psum/nb/phash")
    tensors
      .withColumn("psum", expr("aggregate(pixels, 0L, (a, x) -> a + x)"))
      .withColumn("nb", expr("aggregate(hist, 0L, (a, x) -> a + x)"))
      .withColumn("phash", expr(
        """aggregate(sequence(0, 15), 0L, (a, j) -> a + IF(pixels[j] * 16 > psum, shiftleft(1L, j), 0L))
          | + aggregate(sequence(0, 14), 0L, (a, j) -> a + IF(pixels[j] > pixels[j + 1], shiftleft(1L, j + 16), 0L))
          | + aggregate(sequence(0, 7), 0L, (a, j) -> a + IF(hist[j] * 8 > nb, shiftleft(1L, j + 31), 0L))
          | + shiftleft(nb % 2, 39)""".stripMargin))
      .drop("psum", "nb")
  }

  /** Batched resize + feature-extract, same shape as [[decodeBatched]]: one
    * transformer per partition, streamed over the iterator. */
  def transformBatched(media: DataFrame, mk: () => MediaTransformer): Dataset[MediaTensor] = {
    val enc = Encoders.product[MediaTensor]
    media.select(col("id").cast("long"), col("content").cast("binary"))
      .mapPartitions { it =>
        val t = mk()
        it.map(r => t.transform(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }
}
