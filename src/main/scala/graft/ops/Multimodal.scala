package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pattern: media payloads ride as opaque `binary`
  * columns next to a typed metadata struct, stored and scanned through the
  * strawboat format (BinaryType pages + StructType pages).
  *
  * The decode/feature-extraction step for real image/audio bytes would be a
  * vectorized Pandas UDF over `mapInPandas` on a cluster with codec
  * libraries; this container has none, so [[stubFeatures]] is a clearly
  * marked deterministic stand-in — the Spark-side plumbing (schema, binary
  * paging, partitioning, batch shape) is the real, tested part.
  */
object Multimodal {

  /** Synthesize a multimodal table from documents: payload = UTF-8 bytes of
    * the text (stands in for image/audio bytes), metadata = typed struct. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("lang").as("lang"),
        col("source").as("source"),
        col("n_chars").cast("int").as("n_chars"),
        lit("text/plain").as("mime")).as("meta"))

  /** STUB feature extractor: a real pipeline would decode `payload`
    * (image/audio) via a Pandas UDF batch; here features are deterministic
    * functions of the bytes so the dataflow is testable end-to-end. */
  def stubFeatures(mm: DataFrame): DataFrame =
    mm.select(
      col("doc_id"),
      length(col("payload")).as("byte_len"),
      md5(col("payload")).as("digest"),
      col("meta.lang").as("lang"),
      col("meta.mime").as("mime"))
}
