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

  test("size-class repartition balances bytes across partitions") {
    val parts = 4
    val sized = Multimodal.repartitionBySizeClass(assets, parts)
    val perPart = sized
      .select(spark_partition_id().as("p"), length(col("payload")).as("b"))
      .groupBy("p").agg(sum("b").as("bytes"))
      .collect().map(_.getLong(1))
    assert(perPart.length == parts, s"expected $parts partitions: ${perPart.length}")
    // row-count preserved, and no partition carries the whole corpus
    assert(sized.count() == assets.count())
    val total = perPart.sum.toDouble
    assert(perPart.max < total * 0.8,
      s"one partition holds ${perPart.max / total} of all bytes: ${perPart.mkString(",")}")
  }

  test("frame sampling emits every Nth frame for video, one row otherwise") {
    val frames = Multimodal.sampleFrames(assets, everyN = 30)
    val videos = assets.filter(col("media_type") === "video")
      .select(col("asset_id"), col("n_frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val counts = frames.groupBy("asset_id", "media_type")
      .agg(count(lit(1)).as("n"), max(col("frame_idx")).as("max_idx"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    counts.foreach { case (id, tpe, n, maxIdx) =>
      if (tpe == "video") {
        val expect = (videos(id) - 1) / 30 + 1 // ceil(n_frames / 30)
        assert(n == expect, s"asset $id: $n frame rows, expected $expect")
        assert(maxIdx % 30 == 0 && maxIdx < videos(id))
      } else assert(n == 1 && maxIdx == 0, s"non-video asset $id: $n rows")
    }
    // deterministic stub content
    val h1 = frames.select("asset_id", "frame_idx", "frame_hash").collect().toSet
    val h2 = Multimodal.sampleFrames(assets.repartition(7), 30)
      .select("asset_id", "frame_idx", "frame_hash").collect().toSet
    assert(h1 == h2)
  }
}
