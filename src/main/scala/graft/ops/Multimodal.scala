package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque BINARY payloads with typed metadata, plus decode /
  * feature-extract / frame-sample operators.
  *
  * The container has no image/audio codecs, so `decode` is a
  * DETERMINISTIC SYNTHETIC decode — a byte-histogram feature vector
  * standing in for a real decoder, as the native Catalyst expression
  * `graft_byte_hist` (expr/ByteHistExpr; the round-2 Scala UDF is
  * gone). Everything around it (schema, binary columns, metadata
  * struct, batch boundary, partitioning) is the real Spark plumbing a
  * production decoder (JNI/codec expression or mapPartitions batch)
  * would plug into; swap the kernel, keep the signature
  * `BINARY → ARRAY<DOUBLE>`. Because the synthetic byte algebra is
  * ANSI-SQL-expressible, the whole decode → frame-explode → rollup
  * pipeline runs under the DuckDB oracle (q80/q124) instead of a
  * rows-only check.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); feature extraction is a row-local narrow map, so asset
  * tables partition like any other fact table; frame sampling is
  * row-local binary slicing (substr on BINARY is zero-copy-ish in
  * Tungsten).
  */
object Multimodal {

  val HIST_BUCKETS = 16

  /** Build a typed asset table from `documents` — payload = UTF-8 bytes
    * of the text (a stand-in for real image/audio bytes), metadata as a
    * proper struct column. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("modality"),
      col("source"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        when(col("doc_id") % 2 === 0, lit(640)).otherwise(lit(0)).as("width"),
        when(col("doc_id") % 2 === 0, lit(0)).otherwise(lit(16000))
          .as("sample_rate")).as("meta"))

  /** Synthetic decoder: BINARY → ARRAY<DOUBLE>(HIST_BUCKETS) normalized
    * byte histogram (byte mod HIST_BUCKETS), as the native
    * `graft_byte_hist` expression — no UDF serialization boundary, stays
    * inside whole-stage codegen. Replace the kernel with a real codec at
    * the same signature. Null-safe; empty payload → zero vector. */
  def decode(s: SparkSession, payload: Column): Column =
    graft.expr.GraftFunctions.byteHist(s, payload, lit(HIST_BUCKETS))

  /** fixed-size frame sampling: payload → ARRAY<BINARY> of `frameLen`-
    * byte frames (last frame may be short) — video-frame/audio-window
    * extraction shape, pure column ops (no UDF). */
  def frameSample(payload: Column, frameLen: Int): Column =
    transform(
      sequence(lit(0), greatest(
        ceil(octet_length(payload).cast("double") / frameLen).cast("int") - 1,
        lit(0))),
      i => substring_index_bytes(payload, i, frameLen))

  private def substring_index_bytes(payload: Column, i: Column,
                                    frameLen: Int): Column =
    payload.substr(i * frameLen + 1, lit(frameLen))

  /** Batched decode over partitions — the Scala analogue of a
    * mapInPandas decode: payloads are decoded in fixed-size BATCHES per
    * partition (a real codec amortizes model/codec init and vectorizes
    * across the batch; the stub preserves exactly that batch shape).
    * Input rows: (asset_id: Long, payload: Array[Byte]); output adds
    * the feature vector. Never materializes a partition — the iterator
    * is consumed lazily, `batchSize` rows at a time. */
  def decodeBatchedPartitions(
      df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary: a real decoder would run ONE vectorized
          // call over `batch` here
          val feats = batch.map { case (_, p) => decodeKernel(p) }
          batch.zip(feats).map { case ((id, _), f) => (id, f) }
        }
      }
    out.toDF("asset_id", "features")
  }

  /** shared kernel — the SAME primitive loop the native expression
    * runs, so the mapPartitions batch path and the column path agree
    * bit-for-bit by construction (MultimodalSpec pins it). */
  private[graft] def decodeKernel(payload: Array[Byte]): Seq[Double] =
    if (payload == null) null
    else graft.expr.ByteHistExpr.histogram(payload, HIST_BUCKETS).toSeq

  /** "resize" stub: truncate-or-zero-pad the payload to `targetLen`
    * bytes (real resample/resize plugs in at the same signature). */
  def resizeStub(payload: Column, targetLen: Int): Column = {
    val cut = payload.substr(lit(1), lit(targetLen))
    val zeros = lit(Array.fill[Byte](targetLen)(0))
    concat(cut, zeros.substr(lit(1),
      greatest(lit(targetLen) - octet_length(cut), lit(0))))
  }
}
