package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, StructType, TimestampType}

import graft.pipeline.MergeTable

/** Streaming ingestion (SURVEY.md §2 #23-24): the Spark-native
  * counterpart of the reference's Autoloader-style streaming readers
  * and foreachBatch merge writers (ingest-framework readers/
  * streaming_readers.py:52-66, writers/writer.py:753-754,973 —
  * `trigger(availableNow=True)` file replay into a MERGE).
  *
  * Scale notes: the watermark bounds dedup/agg state; each
  * micro-batch merge is made idempotent and arrival-order-safe by
  * scd1Merge's order guard (a late file can never regress the
  * table), so checkpoint replay after failure is harmless.
  */
object StreamingIngest {

  /** Streaming file-source read with the same ingest control columns
    * as the batch readers (file path/mtime from the `_metadata`
    * hidden column — stays inside the scan, no RDD hop).
    */
  def readStream(spark: SparkSession, format: String, path: String,
                 schema: StructType,
                 options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format(format).schema(schema).options(options)
      .load(path)
      .withColumn("row_creation_time", current_timestamp())
      .withColumn("file_modification_time", col("_metadata.file_modification_time"))
      .withColumn("file_path", col("_metadata.file_path"))
      .withColumn("start_time", lit(null).cast(TimestampType))
      .withColumn("end_time", lit(null).cast(TimestampType))
      .withColumn("is_current", lit(null).cast(IntegerType))
      .withColumn("delete_time", lit(null).cast(TimestampType))

  /** Watermarked dedup: bounded state (the reference's streaming
    * dedup has no state bound at all). `eventTimeCol` drives the
    * watermark; duplicates of `keys` arriving within `delay` are
    * dropped.
    */
  def dedupWithinWatermark(df: DataFrame, eventTimeCol: String,
                           delay: String, keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Micro-batch SCD1 merge sink: every micro-batch runs the same
    * MergeTable.scd1Merge plan the batch path uses (one code path for
    * both modes), with `Trigger.AvailableNow` replaying all pending
    * files then stopping — the reference's availableNow semantics.
    */
  def mergeSink(source: DataFrame, tablePath: String, checkpoint: String,
                keys: Seq[String], orderBy: String,
                compareExclude: Seq[String] = graft.sources.Sources.controlColumns)
      : StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          MergeTable.scd1Merge(batch.sparkSession, tablePath, batch,
            keys, orderBy, compareExclude = compareExclude)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming tumbling-window aggregation with watermark (#24) —
    * the same shape as Events.windowedAgg so batch and stream
    * results are comparable.
    */
  def windowedAgg(df: DataFrame, eventTimeCol: String, delay: String,
                  windowLen: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
}
