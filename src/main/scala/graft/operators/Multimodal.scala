package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payload columns with typed
  * metadata, plus a deterministic decode/feature-extract stub.
  *
  * The container has no image/audio codecs, so — per the task contract —
  * the decode step is a STUB: a deterministic function of the bytes
  * (dimensions derived from byte length, content digest as the "feature").
  * Everything Spark-side is real: binary column construction, metadata
  * struct schema, per-row batch-friendly codegen expressions, and the
  * output contract a real decoder (swapped in behind [[decodeStub]])
  * would keep. At 100 TB, payloads stay opaque binary end-to-end — only
  * metadata and extracted features shuffle, never the blobs.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to the documents table —
    * the canonical "media table" shape: (id, payload binary, meta struct).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB decode: deterministic fake dimensions + digest from the payload
    * bytes. A real implementation would decode image/audio frames here;
    * the signature (binary in → struct of features out) is the real
    * contract. */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("decoded", struct(
      (col("meta.n_bytes") % 64 + 1).as("width"),
      // `/` is double division in Spark — use explicit floor for the
      // integer division the oracle's `//` does.
      (floor(col("meta.n_bytes") / 64).cast("int") % 64 + 1).as("height"),
      upper(md5(col("payload"))).as("digest")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata + stub decode, flattened to an
    // oracle-comparable projection.
    "q32_multimodal_stub" -> ((s, d) => {
      decodeStub(asMediaTable(documents(s, d)))
        .select(
          col("doc_id"),
          col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q32_multimodal_stub" ->
      """SELECT doc_id, 'text/plain' AS mime,
         octet_length(encode(text)) AS n_bytes,
         octet_length(encode(text)) % 64 + 1 AS width,
         (octet_length(encode(text)) // 64) % 64 + 1 AS height
         FROM documents ORDER BY doc_id"""
  )
}
