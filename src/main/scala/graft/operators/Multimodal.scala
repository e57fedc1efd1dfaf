package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with typed metadata alongside — the
  * layout a 100 TB multimodal corpus uses (parquet binary + pushed-down
  * metadata predicates, so a filter on width/duration never decodes bytes).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): [[FakeCodec]] derives deterministic "decoded" features from
  * the bytes. Everything around it — schema, batched per-partition
  * execution, partitioning — is real: swap `FakeCodec.decodeImage` for a
  * JNI/library call and nothing else changes.
  */
object Multimodal {

  final case class ImageMeta(doc_id: Long, n_bytes: Int, width: Int,
                             height: Int, channels: Int, mean_byte: Double)

  /** STUB codec — deterministic fake decode in place of a real image library.
    * Derives plausible dimensions from the payload deterministically. */
  object FakeCodec extends Serializable {
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      val width = 64 + (first % 16) * 32
      val height = 64 + ((n % 16)) * 32
      val mean = if (n == 0) 0.0 else {
        var s = 0L; var i = 0
        while (i < n) { s += (bytes(i) & 0xff); i += 1 }
        math.round(s.toDouble / n * 10000).toDouble / 10000
      }
      ImageMeta(id, n, width, height, 3, mean)
    }
  }

  /** Attach a binary "image" column (here synthesized from text — stands in
    * for real media bytes read from parquet/object storage). */
  def withFakeImageColumn(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("image", encode(col(textCol), "UTF-8"))

  /** Decode / feature-extract: batched per-partition map over the binary
    * column (the Scala analogue of `mapInPandas` — one iterator pass per
    * partition, no per-row task overhead, decode parallelism = partitions). */
  def decodeImages(spark: SparkSession, df: DataFrame,
                   idCol: String = "doc_id", binCol: String = "image"): Dataset[ImageMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeCodec.decodeImage(id, bytes) })
  }

  /** Frame-sampling plumbing for "video": slice the payload into fixed-size
    * frames and keep every `stride`-th — shows the explode-with-metadata shape
    * a video pipeline needs (frame_idx carried alongside the bytes). */
  def sampleFrames(df: DataFrame, binCol: String = "image",
                   frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameBytes).cast("int")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame", col(binCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .drop(binCol)
  }

  /** Block-level dedup estimate — the "what would content-addressed
    * storage save?" pre-flight for a multimodal corpus: payloads split
    * into fixed-size chunks, chunks hashed, and the report says how much
    * of the chunk volume is duplicated (shared headers, repeated frames,
    * re-uploaded assets — all invisible to whole-file hashing the moment
    * one byte differs). One row: doc/chunk totals, distinct chunks, the
    * dedup ratio, and the hottest chunk's occurrence count (a
    * boilerplate-block tell). Fixed-size chunking understates savings vs
    * content-defined boundaries when content SHIFTS (an insertion
    * re-phases every later chunk) — the documented trade for an
    * engine-replayable report; the numbers are a LOWER bound on CDC-style
    * savings.
    *
    * One explode pass (corpus → chunk hashes) and two aggregations; the
    * distinct count is the only value-set shuffle, same contract as an
    * exact distinct. Works on string payloads (char-positional, the
    * oracle-checked form) — binary payloads chunk identically through the
    * same `substr`. */
  def chunkDedupReport(df: DataFrame, payloadCol: String,
                       chunkSize: Int = 256): DataFrame = {
    require(chunkSize >= 1, "chunkSize >= 1")
    val chunks = df
      .filter(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(explode(transform(
        sequence(lit(1), length(col(payloadCol)), lit(chunkSize)),
        i => graft.functions.Hashes.portableHash32(
          col(payloadCol).substr(i, lit(chunkSize))))).as("h"))
      .localCheckpoint() // feeds totals AND the per-hash counts
    val perHash = chunks.groupBy("h").agg(count(lit(1)).as("c"))
    val docs = df.filter(col(payloadCol).isNotNull &&
      length(col(payloadCol)) > 0).agg(count(lit(1)).as("n_docs"))
    docs.crossJoin(broadcast(perHash.agg(
        count(lit(1)).as("n_distinct"), sum(col("c")).as("n_chunks"),
        max(col("c")).as("top_count"))))
      .select(col("n_docs").cast("long").as("n_docs"),
        col("n_chunks").cast("long").as("n_chunks"),
        col("n_distinct").cast("long").as("n_distinct_chunks"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_chunks"), 6)
          .as("dedup_ratio"),
        col("top_count").cast("long").as("top_chunk_count"))
  }

  /** [[chunkDedupReport]]'s content-defined sibling: chunk boundaries come
    * from the gear rolling hash ([[graft.functions.CdcChunkHashes]]), so an
    * insertion re-phases only the chunks up to the next content boundary —
    * the savings this report finds are the ones fixed-size chunking
    * provably misses on shifted content, and the pair of reports brackets
    * the real dedup opportunity from below and from (nearly) above.
    * Expected chunk size ≈ 2^maskBits bytes between [minSize, maxSize].
    * NOT SQL-expressible (per-byte rolling state) — the driver records a
    * rows-only check; value correctness is spec-anchored
    * (the q217 DeflateRatio precedent). Same plan shape as the fixed-size
    * report: one explode pass, two aggregations. */
  def cdcChunkDedupReport(df: DataFrame, payloadCol: String,
                          minSize: Int = 16, maskBits: Int = 6,
                          maxSize: Int = 256): DataFrame = {
    graft.functions.TextHashFunctions.register(df.sparkSession)
    val chunks = df
      .filter(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(explode(graft.functions.TextHashFunctions.cdcChunkHashes(
        col(payloadCol), minSize, maskBits, maxSize)).as("h"))
      .localCheckpoint()
    val perHash = chunks.groupBy("h").agg(count(lit(1)).as("c"))
    val docs = df.filter(col(payloadCol).isNotNull &&
      length(col(payloadCol)) > 0).agg(count(lit(1)).as("n_docs"))
    docs.crossJoin(broadcast(perHash.agg(
        count(lit(1)).as("n_distinct"), sum(col("c")).as("n_chunks"),
        max(col("c")).as("top_count"))))
      .select(col("n_docs").cast("long").as("n_docs"),
        col("n_chunks").cast("long").as("n_chunks"),
        col("n_distinct").cast("long").as("n_distinct_chunks"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_chunks"), 6)
          .as("dedup_ratio"),
        col("top_count").cast("long").as("top_chunk_count"))
  }
}
