package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("hash sampling is deterministic and monotone in the rate") {
    val low = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    val high = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high), "raising the rate must only ADD documents")
    val again = Sampling.stratifiedSample(docs.repartition(7), "doc_id", "lang",
      Map.empty, defaultRate = 0.2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == low, "sample must not depend on partitioning")
    // rate is approximately honored
    val n = docs.count().toDouble
    assert(math.abs(low.size / n - 0.2) < 0.08, s"${low.size} of $n at rate 0.2")
  }

  test("per-stratum rates apply to the right strata") {
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0)
    val langs = s.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.sameElements(Array("en")))
    assert(s.count() == docs.filter(col("lang") === "en").count())
  }

  test("packing fills bins contiguously within each shard") {
    val packed = Sampling.packSequences(
      docs.select(col("doc_id"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_tokens")),
      "doc_id", "est_tokens", capacity = 1000L, shards = 4)
    assert(packed.count() == docs.count(), "every document gets a bin")
    // offsets are within capacity, shards partition the id space
    assert(packed.filter(col("token_offset") >= 1000L ||
      col("token_offset") < 0L).count() == 0)
    assert(packed.filter(col("pack_shard") =!= pmod(col("doc_id"), lit(4)))
      .count() == 0)
    // bins within a shard are dense from the shard's base id
    val binsPerShard = packed.groupBy("pack_shard")
      .agg(min("bin_id").as("lo"), countDistinct("bin_id").as("n"),
        max("bin_id").as("hi"))
      .collect()
    binsPerShard.foreach { r =>
      assert(r.getLong(3) - r.getLong(1) + 1 == r.getLong(2),
        s"bin ids must be contiguous per shard: $r")
    }
  }
}
