package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column queries over the deterministic media table derived
  * from `documents` ([[Multimodal.fromDocuments]]).
  *
  * `q_multimodal_meta` is fully oracle-checked (binary sizes + struct
  * metadata are engine-independent arithmetic). `q_multimodal_features`
  * exercises the batched binary → feature path (mapPartitions decode
  * stub), which is not SQL-expressible — the driver records the weaker
  * rows-only check for it, and FunctionsSpec/MultimodalSpec pin the
  * feature values.
  */
object MultimodalQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.fromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("kind"),
          octet_length(col("bytes")).cast("long").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
        .orderBy("media_id")),

    "q_multimodal_features" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("kind"),
          round(element_at(col("features"), 1).cast("double"), 6).as("bin0"),
          round(aggregate(col("features"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 6).as("feature_sum"))
        .orderBy("media_id")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
        | strlen(text)::BIGINT AS n_bytes,
        | ((doc_id % 4) * 256 + 256)::INT AS width,
        | ((doc_id % 3) * 256 + 256)::INT AS height,
        | ((doc_id % 2) * 22050 + 22050)::INT AS sample_rate,
        | ((doc_id % 7) * 1000 + 1000)::BIGINT AS duration_ms,
        | ['png','wav','mp4'][(doc_id % 3)::INT + 1] AS format
        | FROM documents ORDER BY media_id""".stripMargin.replace("\n", "")
    // q_multimodal_features: mapPartitions decode stub — rows-only check.
  )
}
