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

  /** The decode seam: swap implementations without touching the Spark
    * plumbing (schema, batched mapPartitions, partitioning). */
  trait ImageCodec extends Serializable {
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta
  }

  private def meanByte(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) 0.0 else {
      var s = 0L; var i = 0
      while (i < n) { s += (bytes(i) & 0xff); i += 1 }
      math.round(s.toDouble / n * 10000).toDouble / 10000
    }
  }

  /** STUB codec — deterministic fake decode in place of a real image library.
    * Derives plausible dimensions from the payload deterministically; the
    * default for the oracle-gated queries (the documents corpus is text,
    * not media). */
  object FakeCodec extends ImageCodec {
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      val width = 64 + (first % 16) * 32
      val height = 64 + ((n % 16)) * 32
      ImageMeta(id, n, width, height, 3, meanByte(bytes))
    }
  }

  /** REAL pure-JVM header codec: parses width/height/channels straight
    * from the container header bytes — PNG IHDR, JPEG SOFn, GIF logical
    * screen descriptor — no image library needed. This is the metadata
    * path a 100 TB media pipeline runs FIRST (dimension/aspect filters
    * prune the corpus before any pixel decode touches an executor);
    * full pixel decode stays behind the same [[ImageCodec]] seam.
    * Unparseable payloads throw `IllegalArgumentException` — surface
    * them per-partition (filter/`Try`) rather than silently fabricating
    * dimensions. */
  object HeaderCodec extends ImageCodec {
    def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
      val (w, h, c) = parseDims(bytes).getOrElse(throw
        new IllegalArgumentException(
          s"doc $id: not a PNG/JPEG/GIF header (${bytes.length} bytes)"))
      ImageMeta(id, bytes.length, w, h, c, meanByte(bytes))
    }

    /** (width, height, channels) from the header, or None if the payload
      * is not a recognizable PNG/JPEG/GIF. */
    def parseDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
      def u8(i: Int) = b(i) & 0xff
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int) =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      val n = b.length
      if (n >= 26 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
          u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a &&
          u8(6) == 0x1a && u8(7) == 0x0a &&
          b.slice(12, 16).sameElements("IHDR".getBytes)) {
        // IHDR is the first chunk by spec: width/height BE at 16/20,
        // color type at 25 → channel count (0 gray, 2 rgb, 3 palette,
        // 4 gray+alpha, 6 rgba)
        val channels = u8(25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => return None
        }
        Some((be32(16), be32(20), channels))
      } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk the marker segments to the first SOFn (C0–CF minus
        // C4 DHT / C8 JPG / CC DAC). SOF payload: len(2) precision(1)
        // HEIGHT(2) WIDTH(2) ncomponents(1) — height first, the classic
        // swapped-dims trap.
        var i = 2
        while (i + 3 < n) {
          if (u8(i) != 0xff) return None
          var j = i
          while (j < n && u8(j) == 0xff) j += 1 // fill bytes are legal
          if (j >= n) return None
          val m = u8(j)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc) {
            if (j + 8 >= n) return None
            return Some((be16(j + 6), be16(j + 4), u8(j + 8)))
          } else if (m == 0xd9 || m == 0xda) {
            return None // EOI/SOS before any SOF: no frame header
          } else if (m >= 0xd0 && m <= 0xd8) {
            i = j + 1 // standalone marker, no length field
          } else {
            if (j + 2 >= n) return None
            i = j + 1 + be16(j + 1)
          }
        }
        None
      } else if (n >= 10 && b.slice(0, 6).sameElements("GIF87a".getBytes)
          || n >= 10 && b.slice(0, 6).sameElements("GIF89a".getBytes)) {
        // logical screen descriptor: width/height LITTLE-endian at 6/8;
        // pixels index an RGB palette → 3 channels
        Some((le16(6), le16(8), 3))
      } else None
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
                   idCol: String = "doc_id", binCol: String = "image",
                   codec: ImageCodec = FakeCodec): Dataset[ImageMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => codec.decodeImage(id, bytes) })
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
