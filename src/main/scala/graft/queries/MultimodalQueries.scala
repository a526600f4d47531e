package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.{ArrayOps, Multimodal}

/** Multimodal pipeline queries: binary payloads + metadata + stub
  * decode (see ops/Multimodal). The decode is a deterministic byte
  * histogram, so the whole pipeline — binary encode, metadata struct,
  * decode features, frame sampling — has an exact DuckDB oracle (the
  * payload is UTF-8 text, so byte == unicode codepoint for this ASCII
  * corpus and the oracle can recompute the histogram from chars).
  */
object MultimodalQueries {

  /** q80: asset table → stub-decode features → per (modality, source)
    * rollup of feature norms, payload sizes, and frame counts. */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Multimodal.assetsFromDocuments(documents(s, dir))
    assets
      .withColumn("features", Multimodal.decodeStub($"payload"))
      .withColumn("feat_norm", ArrayOps.l2Norm($"features"))
      .withColumn("n_frames", size(Multimodal.frameSample($"payload", 64)))
      .groupBy($"modality", $"source")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"meta.n_bytes").as("total_bytes"),
        round(avg($"feat_norm"), 6).as("avg_feat_norm"),
        sum($"n_frames").as("total_frames"))
      .orderBy($"modality", $"source")
  }

  private val q80Sql =
    s"""WITH a AS (
       | SELECT doc_id AS asset_id,
       |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
       |  source, text, octet_length(encode(text)) AS n_bytes
       | FROM documents),
       |f AS (
       | SELECT *,
       |  sqrt(CAST(list_sum(list_transform(
       |    list_transform(generate_series(0, ${Multimodal.HIST_BUCKETS - 1}),
       |      b -> CAST(len(list_filter(string_split(text, ''),
       |             c -> unicode(c) % ${Multimodal.HIST_BUCKETS} = b))
       |           AS DOUBLE) / greatest(n_bytes, 1)),
       |    h -> h * h)) AS DOUBLE)) AS feat_norm,
       |  greatest(CAST(ceil(CAST(n_bytes AS DOUBLE) / 64) AS BIGINT), 1)
       |    AS n_frames
       | FROM a)
       |SELECT modality, source, count(*) AS n_assets,
       | CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       | round(avg(feat_norm), 6) AS avg_feat_norm,
       | CAST(sum(n_frames) AS BIGINT) AS total_frames
       |FROM f GROUP BY modality, source
       |ORDER BY modality, source""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q80_multimodal", q80, Some(q80Sql),
      "binary payload + stub decode + frame rollup"))
}
