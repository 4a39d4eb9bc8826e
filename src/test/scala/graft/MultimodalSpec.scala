package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaAsset

class MultimodalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def assets =
    Multimodal.assetsFromDocuments(Tables.load(spark, sf, "documents"))

  test("asset table carries typed binary payloads and metadata") {
    val a = assets
    assert(a.schema("payload").dataType.typeName == "binary")
    val types = a.select("media_type").distinct().as[String].collect().sorted
    assert(types.sameElements(Array("audio", "image", "video")))
  }

  test("decode stub is deterministic and partition-independent") {
    val ds = assets.as[MediaAsset]
    val f1 = Multimodal.decodeFeatures(ds)
      .collect().map(f => (f.asset_id, f.byte_mean, f.head_hash)).sorted
    val f2 = Multimodal.decodeFeatures(ds.repartition(13))
      .collect().map(f => (f.asset_id, f.byte_mean, f.head_hash)).sorted
    assert(f1.sameElements(f2), "features must not depend on partitioning")
    assert(f1.forall { case (_, mean, _) => mean > 0.0 })
  }

  test("features line up with payload byte lengths") {
    val ds = assets.as[MediaAsset]
    val feats = Multimodal.decodeFeatures(ds).toDF()
      .withColumnRenamed("n_bytes", "feat_bytes")
    val bad = feats.join(Multimodal.metaQuery(assets), Seq("asset_id"))
      .filter(col("feat_bytes") =!= col("n_bytes")).count()
    assert(bad == 0, "decode stub byte counts must match the meta projection")
    assert(feats.count() == assets.count())
  }
}
