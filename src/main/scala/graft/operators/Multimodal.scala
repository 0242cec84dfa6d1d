package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns (record fields in graft tables) with typed metadata
  * extracted by batch decode stages.
  *
  * The decode itself is STUBBED deterministically (this container has no
  * image/audio codecs): `fakeDecode` derives metadata purely from the
  * payload bytes, so the Spark-side plumbing — physical batching via
  * `mapPartitions` with a declared output schema (the JVM analog of
  * `mapInPandas`: Iterator-of-batches in, Iterator-of-batches out),
  * partition preservation, binary-column handling — is real and
  * oracle-checkable, and a real codec drops into [[decodeBatch]] without
  * touching the pipeline. */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** STUB decode: metadata from payload length (deterministic, reproducible
    * by the oracle from the source text length). A real implementation
    * would parse the codec header here — signature unchanged. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row] =
    batch.map { case (id, payload) =>
      val n = payload.length
      // n * 7 in Int wraps past ~306 MB payloads — the long widening
      // keeps the stub total-ordered with the BIGINT oracle arithmetic
      Row(id, n, 64 + n % 512, 64 + (n.toLong * 7 % 512).toInt)
    }

  /** Batched decode over (id, payload) rows: batches of `batchSize` per
    * partition, preserving partitioning (no shuffle). Rows with a null
    * id or payload are SKIPPED — WebDataset samples legitimately miss
    * extensions (nullable payload columns), and a missing payload has
    * no metadata to decode. */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val pair = df.select(col(idCol).cast(LongType), col(payloadCol))
      .filter(col(idCol).isNotNull && col(payloadCol).isNotNull)
    pair.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        decodeBatch(rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
      }
    }(Encoders.row(MediaMetaSchema))
  }

  /** Video-style frame sampling: payload is treated as `1 + n_bytes/1000`
    * frames; emit every `step`-th frame index. Explode stays proportional
    * to SAMPLED frames only. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      step: Int = 5): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    df.select(col(idCol), octet_length(col(payloadCol)).as("n_bytes"))
      .withColumn("n_frames", (col("n_bytes") / 1000).cast(IntegerType) + 1)
      .select(col(idCol), explode(
        sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
  }

  /** Fixed-size binary chunking with ordinals (audio/window shape):
    * one output row per chunk, sliced with codegen'd `substring` on the
    * binary column — explode cost is proportional to CHUNKS, and the
    * payload bytes are sliced, never copied whole per chunk row.
    * Empty payloads emit exactly one empty chunk (`greatest(n-1, 0)`
    * keeps the chunk count at 1 instead of integer-dividing -1, which
    * truncates toward zero on this side but floors to -1 in engines
    * with floor division — the oracle mirrors the same clamp). */
  def chunkPayload(df: DataFrame, idCol: String, payloadCol: String,
      chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    df.select(col(idCol), col(payloadCol).as("__p"),
        octet_length(col(payloadCol)).as("__n"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          (greatest(col("__n") - 1, lit(0)) / chunkBytes).cast(IntegerType))))
      .select(col(idCol), col("chunk_idx"),
        expr(s"substring(__p, chunk_idx * $chunkBytes + 1, $chunkBytes)").as("chunk"))
      .withColumn("chunk_len", octet_length(col("chunk")))
  }

  /** Aspect-preserving resize parameters: fit (width, height) within
    * `maxDim`, never upscale, floor to ≥ 1 px. INTEGRAL arithmetic
    * (`div`) only, so the oracle replays it exactly — this computes the
    * per-image resize PLAN; the pixel resample itself is the stubbed
    * codec stage and would run in the same batched decode hook. */
  def resizeDims(meta: DataFrame, maxDim: Int = 256): DataFrame = {
    val m = greatest(col("width"), col("height"))
    def fit(side: String) = when(m <= maxDim, col(side))
      .otherwise(greatest(lit(1),
        expr(s"($side * $maxDim) div greatest(width, height)")))
      .cast(IntegerType)
    meta.select(col("doc_id"), col("width"), col("height"),
      fit("width").as("out_w"), fit("height").as("out_h"))
  }

  /** The fake media table every `m_*` query decodes: document text as an
    * opaque binary payload. */
  private def mediaPayload(s: SparkSession, d: String): DataFrame =
    Tables.read(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode → aspect-preserving resize plan (fit within 256, never
    // upscale) — integral math end-to-end, both branches data-covered
    "m_resize" -> ((s, d) =>
      resizeDims(decodeMeta(mediaPayload(s, d), "doc_id", "payload"))),
    // binary payload → batched stub decode → typed metadata
    "m_media_meta" -> ((s, d) =>
      decodeMeta(mediaPayload(s, d), "doc_id", "payload")),
    // frame sampling over fake video payloads
    "m_frame_sample" -> ((s, d) =>
      sampleFrames(mediaPayload(s, d), "doc_id", "payload", step = 5)),
    // audio-style chunking: payloads split into fixed-size binary chunks
    // with ordinals — the batch shape fed to chunked inference
    "m_chunk_bytes" -> ((s, d) =>
      chunkPayload(mediaPayload(s, d), "doc_id", "payload", chunkBytes = 256)
        .withColumn("chunk_text", decode(col("chunk"), "UTF-8"))
        .drop("chunk")))

  // The stub arithmetic is reproducible from length(text) (ASCII corpus:
  // chars == bytes — MultimodalSpec's "corpus is ASCII" test pins the
  // precondition; a non-ASCII doc would silently skew every m_* oracle).
  val oracleSql: Map[String, String] = Map(
    "m_resize" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    CAST(64 + length(text) % 512 AS INT) AS width,
        |    CAST(64 + (length(text) * 7) % 512 AS INT) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CAST(CASE WHEN greatest(width, height) <= 256 THEN width
        |    ELSE greatest(1, (width * 256) // greatest(width, height)) END
        |    AS INT) AS out_w,
        |  CAST(CASE WHEN greatest(width, height) <= 256 THEN height
        |    ELSE greatest(1, (height * 256) // greatest(width, height)) END
        |    AS INT) AS out_h
        |FROM meta""".stripMargin,
    "m_media_meta" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  CAST(64 + length(text) % 512 AS INT) AS width,
        |  CAST(64 + (length(text) * 7) % 512 AS INT) AS height
        |FROM documents""".stripMargin,
    "m_frame_sample" ->
      """SELECT doc_id,
        |  CAST(unnest(range(0, CAST(length(text) // 1000 AS INT) + 1, 5)) AS INT)
        |    AS frame_idx
        |FROM documents""".stripMargin,
    "m_chunk_bytes" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    CAST(unnest(range(0, CAST(greatest(length(text) - 1, 0) // 256 AS INT) + 1))
        |      AS INT) AS chunk_idx
        |  FROM documents)
        |SELECT doc_id, chunk_idx,
        |  substring(text, chunk_idx * 256 + 1, 256) AS chunk_text,
        |  CAST(length(substring(text, chunk_idx * 256 + 1, 256)) AS INT)
        |    AS chunk_len
        |FROM c""".stripMargin)
}
