package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.pipeline.{SnapshotTableFormat, TableFormat}

/** Incremental (streaming-style) reads FROM a MergeTable — the
  * silver→gold hop of a medallion pipeline. The reference accepts
  * `delta` as a streaming SOURCE type (ingest-framework readers/
  * streaming_readers.py:14-19) and relies on Delta's change feed;
  * graft's versioned tables expose the same capability by treating
  * the committed version sequence as the offset log. Every entry
  * point takes a [[graft.pipeline.TableFormat]] (default snapshot),
  * so a delta-log table streams identically — its offsets are the
  * `_delta_log` commit versions:
  *
  *  - offsets    = snapshot versions (`v=N` dirs, `_CURRENT` = head)
  *  - a batch    = the CHANGE ROWS between two committed versions
  *                 (distributed full-row anti-join — copy-on-write
  *                 rewrites unchanged rows byte-identically, so they
  *                 cancel and only upserts survive)
  *  - checkpoint = a `_PROCESSED` pointer file, committed atomically
  *                 AFTER the batch function returns
  *
  * Delivery is at-least-once per version (a crash between the batch
  * function and the offset commit re-delivers that version);
  * downstream MergeTable merges are idempotent (scd1Merge's order
  * guard), so the composed hop is effectively exactly-once — the
  * same contract Structured Streaming's foreachBatch gives.
  *
  * Retention interplay: diffing needs the FROM snapshot on disk, so
  * the consumer must not lag further behind than the producer's
  * vacuum retention. If the from-version HAS been vacuumed, the batch
  * falls back to the full current snapshot (safe under the idempotent
  * downstream merge; a re-delivery, never a loss).
  */
object MergeTableStream {

  private def processedFile(checkpoint: String) =
    Paths.get(checkpoint, "_PROCESSED")

  /** Last version committed by this consumer, if any. */
  def lastProcessed(checkpoint: String): Option[Int] = {
    val p = processedFile(checkpoint)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  private def commit(checkpoint: String, version: Int): Unit = {
    Files.createDirectories(Paths.get(checkpoint))
    val tmp = Paths.get(checkpoint, "_PROCESSED.tmp")
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, processedFile(checkpoint),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Align `from` to `to`'s schema (additive evolution: columns new
    * in `to` read as null on historical rows, which is exactly what
    * the evolved snapshot stores for them — so unchanged rows still
    * cancel in the diff).
    */
  private def aligned(from: DataFrame, to: DataFrame): DataFrame =
    to.schema.fields.foldLeft(from.select(
      to.columns.filter(from.columns.contains).map(col).toIndexedSeq: _*)) {
      (d, f) =>
        if (from.columns.contains(f.name)) d
        else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(to.columns.map(col).toIndexedSeq: _*)

  /** Rows of version `toV` not present in version `fromV` — the
    * upserted rows of every merge in (fromV, toV]. `fromV = None`
    * (or a vacuumed version) yields the full `toV` snapshot, as does
    * a schema with map-typed columns: Spark set operations reject
    * maps (unorderable — the same contract MergeTable's deterministic
    * ordering documents), and diffing around them on the other
    * columns would silently MISS rows whose only change is inside the
    * map, so full re-delivery (absorbed by the idempotent downstream
    * merge) is the correct degradation.
    */
  def changes(spark: SparkSession, path: String, fromV: Option[Int],
              toV: Int,
              fmt: TableFormat = SnapshotTableFormat): DataFrame = {
    def mapped(schema: org.apache.spark.sql.types.StructType) =
      schema.fields.exists(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    // generic path: exact two-snapshot exceptAll diff when the from
    // version is still readable, full re-delivery otherwise
    def snapshotDiff(): DataFrame = {
      val to = fmt.readVersion(spark, path, toV)
      fromV.filter(_ => !mapped(to.schema)) match {
        // readability probe, not just versions().contains: the
        // fallback must trigger on missing FILES too
        case Some(f) =>
          scala.util.Try(fmt.readVersion(spark, path, f)).toOption match {
            case Some(from) => to.exceptAll(aligned(from, to))
            case None       => to
          }
        case None => to
      }
    }
    // delta-log fast path FIRST, before any full-version read: on a
    // 100k-file table `readVersion` alone lists every live file to
    // plan its scan, which would defeat the touched-bytes-only win.
    // The map-type check comes from the log-recorded schema, and the
    // full `to` frame is built only on the fallback paths.
    if (fmt == graft.pipeline.DeltaLogTableFormat && fromV.isDefined) {
      val dl = graft.pipeline.DeltaLogTableFormat
      // a poisoned schema replay (corrupt pre-window commit, no
      // covering checkpoint) must not crash the PROBE: skip the fast
      // path and let the generic read raise the canonical error —
      // or succeed, when a checkpoint covers the corrupt commit
      val diffable = scala.util.Try(dl.schemaAt(spark, path, toV))
        .toOption.exists(_.forall(s => !mapped(s)))
      // change rows = added-files except removed-files; None = a
      // net-changed window file was vacuumed. That only rules out the
      // FILE-level diff — when both endpoint versions are themselves
      // still readable, the generic two-snapshot exceptAll still
      // yields the PRECISE change rows, so degrade to full-snapshot
      // re-delivery only when the from version is gone too (inside
      // snapshotDiff's readability probe), not on the first miss.
      val fast =
        if (diffable) dl.fileChanges(spark, path, fromV.get, toV) else None
      fast.getOrElse(snapshotDiff())
    } else snapshotDiff()
  }

  /** Keys present in `fromV` but absent from `toV` — the delete feed
    * (SCD1 hard deletes; SCD2 tables never shrink, their deletes are
    * visible as `delete_time` changes in the upsert feed).
    */
  def deletedKeys(spark: SparkSession, path: String, fromV: Int, toV: Int,
                  keys: Seq[String],
                  fmt: TableFormat = SnapshotTableFormat): DataFrame = {
    // delta-log: answer from the window's file accounting (removed-
    // file keys minus added-file keys) — touched files only, same
    // scale win as the change feed
    val fromLog =
      if (fmt == graft.pipeline.DeltaLogTableFormat)
        graft.pipeline.DeltaLogTableFormat
          .fileDeletedKeys(spark, path, fromV, toV, keys)
      else None
    fromLog.getOrElse {
      val from = fmt.readVersion(spark, path, fromV)
        .select(keys.map(col): _*).distinct()
      val to = fmt.readVersion(spark, path, toV)
        .select(keys.map(col): _*).distinct()
      from.join(to, keys, "left_anti")
    }
  }

  /** Process every committed-but-unprocessed version through `fn`
    * (receiving that version's change rows and its number), oldest
    * first, committing the consumer offset after each — the
    * `Trigger.AvailableNow` of the version log. Layout-only commits
    * (`fmt.isDataChange` false — OPTIMIZE compaction) advance the
    * offset WITHOUT invoking `fn` or scanning: their rows are
    * identical by construction, and the diff they'd cancel out of is
    * two full-table scans at scale. Returns the versions processed
    * this call, skipped ones included (empty = caught up).
    */
  def processAvailable(spark: SparkSession, path: String, checkpoint: String,
                       fmt: TableFormat = SnapshotTableFormat)
                      (fn: (DataFrame, Int) => Unit): Seq[Int] =
    walk(spark, path, checkpoint, fmt) { (prev, _, v) =>
      fn(changes(spark, path, prev, v, fmt), v)
    }

  /** [[processAvailable]] with the HARD-DELETE feed per window: `fn`
    * receives (change rows, deleted keys, version, fullResync). The
    * from-version each window's delete feed needs is internal loop
    * state here — without this entry point a consumer wanting
    * deletes (the incremental dedup family's `deletes` parameter)
    * would have to re-implement the offset tracking externally.
    *
    * A window with NO READABLE PREDECESSOR — the genuine first
    * window, or re-entry after the from-version was vacuumed past
    * retention — delivers the full current snapshot as its change
    * batch, an EMPTY delete feed (there is no older snapshot left to
    * diff against), and `fullResync = true`. That flag is a hard
    * contract, not a hint: on a vacuumed gap the consumer may
    * already hold keyed state, and keys hard-deleted inside the
    * unreadable gap are invisible to every later delete diff — a
    * keyed consumer that ignores the flag diverges from batch truth
    * PERMANENTLY (the snapshot change batch only re-merges live
    * rows; it never retracts). On `fullResync` the consumer must
    * reconcile its state against the snapshot — delete every key it
    * holds that the batch doesn't carry (the incremental dedup
    * family's `fullResync` parameter does exactly this,
    * state-minus-snapshot). Only a STATELESS consumer may ignore the
    * flag: for it, deletes of never-seen keys are no-ops.
    */
  def processAvailableWithDeletes(spark: SparkSession, path: String,
                                  checkpoint: String, keys: Seq[String],
                                  fmt: TableFormat = SnapshotTableFormat)
                                 (fn: (DataFrame, DataFrame, Int, Boolean) => Unit)
      : Seq[Int] =
    walk(spark, path, checkpoint, fmt) { (prev, readablePrev, v) =>
      val (dels, resync) = readablePrev match {
        case Some(p) => (deletedKeys(spark, path, p, v, keys, fmt), false)
        case None => (fmt.readVersion(spark, path, v)
          .select(keys.map(col): _*).limit(0), true)
      }
      fn(changes(spark, path, prev, v, fmt), dels, v, resync)
    }

  /** The shared version-walk of the two processAvailable entry
    * points: pending committed versions oldest-first, the consumer
    * offset committed after each, layout-only commits
    * (`fmt.isDataChange` false) advancing the offset without
    * invoking `fn`. `fn` receives (prev, readablePrev, version):
    * `prev` is the raw predecessor offset — what [[changes]] diffs
    * from; it re-probes readability itself so missing FILES (not
    * just missing versions) still degrade safely — and
    * `readablePrev` is that offset only when its snapshot is still
    * listed readable, i.e. what a delete diff may legally read.
    */
  private def walk(spark: SparkSession, path: String, checkpoint: String,
                   fmt: TableFormat)
                  (fn: (Option[Int], Option[Int], Int) => Unit): Seq[Int] = {
    val head = fmt.currentVersion(path).getOrElse(return Nil)
    val start = lastProcessed(checkpoint)
    // a delta-log table keeps vacuumed versions in its log; a
    // consumer lagging past retention skips them and re-enters at
    // the first readable version, whose batch is the full snapshot
    // (prev stays unreadable -> changes() falls back) — the same
    // re-delivery contract as the snapshot format's vacuum. ONE
    // readability pass for all pending versions (formats answer this
    // from their own metadata), not a state replay per version.
    val readable = fmt.readableVersions(spark, path).toSet
    val todo = fmt.versions(path)
      .filter(v => v <= head && start.forall(v > _) && readable.contains(v))
    var prev = start
    todo.foreach { v =>
      if (fmt.isDataChange(path, v))
        fn(prev, prev.filter(readable.contains), v)
      commit(checkpoint, v)
      prev = Some(v)
    }
    todo
  }
}
