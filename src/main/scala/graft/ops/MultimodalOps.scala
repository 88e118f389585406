package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * *batched* per-partition stage — the Scala analogue of an Arrow-batched
  * decode UDF (same shape: executor-side batches of rows in, feature rows
  * out, decode library called once per batch).
  *
  * No real image/audio bytes exist in the testdata (and no codec libs in
  * this container — north-star brief says STUB the decode), so the payload
  * is the document text's UTF-8 bytes and [[StubDecoder]] derives
  * deterministic fake media features from the raw bytes. Everything around
  * the stub — the binary+metadata schema, the typed Dataset, the batched
  * mapPartitions stage, the partitioning — is the real production plumbing:
  * swapping [[StubDecoder]] for a JNI/codec-backed decoder changes one
  * function.
  */
object MultimodalOps {

  /** One media record: opaque payload + typed metadata (the schema a 100 TB
    * media lake would carry next to parquet row groups).
    */
  final case class MediaRecord(doc_id: Long, data: Array[Byte], source: String, n_chars: Long)

  /** Extracted features (all derivable deterministically by the stub). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, first_byte: Long,
      width: Long, height: Long, ok: Boolean)

  /** The decode stub: deterministic fake decode of a payload batch. A real
    * implementation would hand the whole batch to a vectorized decoder; the
    * batch-in/batch-out signature is the contract.
    */
  object StubDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val n = r.data.length.toLong
        val first = if (n > 0) java.lang.Byte.toUnsignedLong(r.data(0)) else 0L
        MediaFeatures(r.doc_id, n, first, n % 640, (n * 7) % 480, n > 0)
      }
  }

  /** documents → binary media records (payload = UTF-8 bytes of `text`). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"),
        col("source"), col("n_chars"))
      .as[MediaRecord]
  }

  /** Batched feature extraction: 32-record batches per call inside
    * mapPartitions (amortizes per-call decoder setup exactly like the
    * enrichment engine amortizes API calls). Output is a plain DataFrame —
    * ready for the relational layer.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, dir)
      .mapPartitions(_.grouped(32).flatMap(b => StubDecoder.decodeBatch(b.toSeq)))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("first_byte"), col("width"), col("height"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: one output row per sampled "frame" — every 4th frame
    * index of a payload whose frame count derives from its byte length
    * (stub: 40 bytes/frame; a real video column would read the container
    * index). The explode is the row-amplification pattern a video pipeline
    * needs — per-frame rows feeding the relational layer — with
    * amplification bounded by the stride. Per-frame feature (stub luma) is
    * deterministic from payload bytes + index.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    val nf = expr("octet_length(encode(text, 'UTF-8')) DIV 40") // frames per payload
    Tables.documents(spark, dir)
      .select(col("doc_id"), ascii(substring(col("text"), 1, 1)).cast("long").as("fb"), nf.as("nf"))
      .filter(col("nf") > 0)
      .select(col("doc_id"), col("fb"),
        explode(sequence(lit(0L), col("nf") - 1, lit(stride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        ((col("fb") + col("frame_idx") * 31) % 256).as("luma"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  def oracle: Map[String, String] = Map(
    "q69_frame_sample" ->
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        | CAST((ascii(substring(text, 1, 1)) + f * 31) % 256 AS BIGINT) AS luma
        |FROM (SELECT doc_id, text, unnest(range(0, octet_length(encode(text)) // 40, 4)) AS f
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q44_media_features" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
        | CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        | CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
