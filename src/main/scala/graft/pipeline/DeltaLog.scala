package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.cdc.Cdc
import graft.sources.Sources

/** [[TableFormat]] backed by a minimal implementation of the OPEN
  * Delta Lake transaction-log protocol (the published PROTOCOL.md of
  * delta-io/delta; no Delta library involved): data lives in plain
  * parquet files, and table state is the replay of newline-delimited
  * JSON action files `_delta_log/<20-digit version>.json` — each
  * commit lists `add`/`remove` file actions, version 0 additionally
  * carries `protocol` and `metaData` (schema, partition columns),
  * and later commits re-emit `metaData` when the schema evolves.
  *
  * Commit atomicity is the protocol's: a commit exists iff its
  * version file exists, and the version file appears atomically
  * (write-temp + atomic move with no overwrite). Two writers racing
  * the same version → exactly one wins, the loser gets
  * FileAlreadyExistsException and must re-read state and retry —
  * optimistic concurrency, the same contract real Delta implements
  * over object stores.
  *
  * Merges reuse the exact same tagged merge PLANS as the snapshot
  * format (Cdc.scd1MergeTagged/scd2MergeTagged via
  * MergeTable.observedWrite) — only the commit mechanics differ.
  * Every merge here is a full-rewrite commit (adds the complete new
  * state, removes every previous live file): the copy-on-write worst
  * case, same as MergeTable.writeSnapshot. A partition-pruned
  * variant would emit add/remove for touched partitions only — the
  * protocol supports it (that is precisely what manifests are for);
  * the bundled pruned path lives in MergeTable.scd1MergePruned.
  *
  * Divergence from the full protocol, documented: no parquet
  * checkpoint files, so the JSON log is never truncated — `vacuum`
  * deletes unreferenced DATA files but keeps every commit's JSON
  * (tiny, and it doubles as an audit trail). Real Delta truncates
  * the log after checkpointing; a reader replaying from 0 sees
  * identical state either way.
  */
object DeltaLogTableFormat extends TableFormat {

  private val mapper = new ObjectMapper()

  private def logDir(path: String): Path = Paths.get(path, "_delta_log")

  private def logFile(path: String, v: Int): Path =
    logDir(path).resolve(f"$v%020d.json")

  override def versions(path: String): Seq[Int] = {
    val d = logDir(path)
    if (!Files.isDirectory(d)) Nil
    else scala.util.Using.resource(Files.list(d))(
      _.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("\\d{20}\\.json") =>
          s.stripSuffix(".json").toInt }
        .toSeq.sorted)
  }

  override def currentVersion(path: String): Option[Int] =
    versions(path).lastOption

  override def exists(path: String): Boolean = currentVersion(path).isDefined

  /** Replayed table state at a version: live file set (in add order)
    * plus the last-seen metaData (table id, schema json).
    */
  private case class State(live: Seq[String], tableId: Option[String],
                           schemaJson: Option[String])

  private def replay(path: String, upTo: Int): State = {
    val live = mutable.LinkedHashSet.empty[String]
    var tableId: Option[String] = None
    var schemaJson: Option[String] = None
    versions(path).filter(_ <= upTo).foreach { v =>
      Files.readAllLines(logFile(path, v), StandardCharsets.UTF_8)
        .asScala.filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("add")) live += node.get("add").get("path").asText()
          if (node.has("remove")) live -= node.get("remove").get("path").asText()
          if (node.has("metaData")) {
            tableId = Some(node.get("metaData").get("id").asText())
            schemaJson = Some(node.get("metaData").get("schemaString").asText())
          }
        }
    }
    State(live.toSeq, tableId, schemaJson)
  }

  override def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, currentVersion(path).getOrElse(
      throw new IllegalStateException(s"no delta log at $path")))

  override def readVersion(spark: SparkSession, path: String,
                           version: Int): DataFrame = {
    if (!Files.exists(logFile(path, version)))
      throw new IllegalStateException(
        s"version $version does not exist at $path")
    val st = replay(path, version)
    val missing = st.live.filterNot(f => Files.exists(Paths.get(path, f)))
    if (missing.nonEmpty) throw new IllegalStateException(
      s"version $version at $path references vacuumed files: " +
        missing.take(3).mkString(", "))
    if (st.live.isEmpty) {
      val schema = st.schemaJson.map(DataType.fromJson(_).asInstanceOf[StructType])
        .getOrElse(new StructType())
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else
      spark.read.parquet(st.live.map(f => s"$path/$f"): _*)
  }

  /** Full-rewrite commit: write `df` as the complete next-version
    * state and append the add/remove action file. Returns the
    * committed version.
    */
  private def commitRewrite(path: String, df: DataFrame): Int = {
    val next = currentVersion(path).getOrElse(-1) + 1
    val prev = if (next == 0) State(Nil, None, None) else replay(path, next - 1)
    // unique per ATTEMPT, not per version: two writers racing the
    // same version must not clobber each other's data files before
    // the log move picks the winner (the loser's dir is orphaned
    // garbage, never referenced by any commit)
    val subdir = f"files-$next%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(s"$path/$subdir")
    val now = System.currentTimeMillis()
    val adds = scala.util.Using.resource(Files.list(Paths.get(path, subdir)))(
      _.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map { f =>
          val a = mapper.createObjectNode()
          val add = a.putObject("add")
          add.put("path", s"$subdir/${f.getFileName}")
          add.putObject("partitionValues")
          add.put("size", Files.size(f))
          add.put("modificationTime", Files.getLastModifiedTime(f).toMillis)
          add.put("dataChange", true)
          a
        }.toSeq)
    val removes = prev.live.map { p =>
      val r = mapper.createObjectNode()
      val rm = r.putObject("remove")
      rm.put("path", p)
      rm.put("deletionTimestamp", now)
      rm.put("dataChange", true)
      r
    }
    val header = mutable.Buffer.empty[ObjectNode]
    if (next == 0) {
      val pr = mapper.createObjectNode()
      val proto = pr.putObject("protocol")
      proto.put("minReaderVersion", 1)
      proto.put("minWriterVersion", 2)
      header += pr
    }
    val schemaJson = df.schema.json
    if (next == 0 || !prev.schemaJson.contains(schemaJson)) {
      val md = mapper.createObjectNode()
      val meta = md.putObject("metaData")
      meta.put("id", prev.tableId.getOrElse(
        java.util.UUID.randomUUID().toString))
      val fmt = meta.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      meta.put("schemaString", schemaJson)
      meta.putArray("partitionColumns")
      meta.putObject("configuration")
      meta.put("createdTime", now)
      header += md
    }
    val ci = mapper.createObjectNode()
    val info = ci.putObject("commitInfo")
    info.put("timestamp", now)
    info.put("operation", if (next == 0) "WRITE" else "MERGE")
    val lines = (header.toSeq ++ removes ++ adds :+ ci)
      .map(mapper.writeValueAsString).mkString("", "\n", "\n")
    Files.createDirectories(logDir(path))
    val tmp = logDir(path).resolve(
      f".$next%020d-${java.util.UUID.randomUUID().toString.take(8)}.json.tmp")
    Files.write(tmp, lines.getBytes(StandardCharsets.UTF_8))
    publishCommit(tmp, logFile(path, next))
    next
  }

  /** Atomic put-if-absent of a commit file. POSIX rename REPLACES an
    * existing target even under ATOMIC_MOVE, so a plain move would
    * let a version-race loser silently clobber the winner; hard-link
    * creation is the filesystem primitive that is both atomic and
    * fails (FileAlreadyExistsException) when the target exists —
    * the loser gets the exception and must re-read table state and
    * retry (optimistic concurrency). Object-store deployments swap
    * this for their conditional-put.
    */
  private[graft] def publishCommit(tmp: Path, target: Path): Unit = {
    try Files.createLink(target, tmp)
    catch { case e: Throwable => Files.deleteIfExists(tmp); throw e }
    Files.deleteIfExists(tmp)
  }

  override def scd1Merge(spark: SparkSession, path: String, updates: DataFrame,
                         keys: Seq[String], orderBy: String,
                         deleteMissing: Boolean = false,
                         compareExclude: Seq[String] = Sources.controlColumns,
                         schemaEvolution: Boolean = true): MergeStats = {
    val ord = MergeTable.deterministicOrd(updates, keys, orderBy)
    if (!exists(path)) {
      val obs = Observation()
      val first = Cdc.latestPerKey(updates, keys, ord)
        .observe(obs, count(lit(1)).as("n"))
      commitRewrite(path, first)
      MergeStats(inserted = obs.get("n").asInstanceOf[Long], updated = 0,
        deleted = 0)
    } else {
      val target = MergeTable.evolveTarget(read(spark, path), updates,
        schemaEvolution)
      val tagged = Cdc.scd1MergeTagged(target,
        updates.select(target.columns.map(col).toIndexedSeq: _*),
        keys, ord, deleteMissing, compareExclude, orderGuard = Some(orderBy))
      MergeTable.observedWrite(tagged, dropActions = Seq("delete"))(
        out => { commitRewrite(path, out); () })
    }
  }

  override def scd2Merge(spark: SparkSession, path: String, updates: DataFrame,
                         keys: Seq[String], orderBy: String,
                         deleteMissing: Boolean = false,
                         compareExclude: Seq[String] = Sources.controlColumns,
                         schemaEvolution: Boolean = true): MergeStats = {
    val ord = MergeTable.deterministicOrd(updates, keys, orderBy)
    if (!exists(path)) {
      val obs = Observation()
      val first = Cdc.latestPerKey(updates, keys, ord)
        .withColumn("is_current", lit(1))
        .withColumn("start_time", current_timestamp())
        .withColumn("end_time", lit(null).cast("timestamp"))
        .withColumn("delete_time", lit(null).cast("timestamp"))
        .observe(obs, count(lit(1)).as("n"))
      commitRewrite(path, first)
      MergeStats(inserted = obs.get("n").asInstanceOf[Long], updated = 0,
        deleted = 0)
    } else {
      val target = MergeTable.evolveTarget(read(spark, path), updates,
        schemaEvolution)
      val tagged = Cdc.scd2MergeTagged(target, updates, keys, ord,
        deleteMissing, compareExclude)
      MergeTable.observedWrite(tagged, dropActions = Nil)(
        out => { commitRewrite(path, out); () })
    }
  }

  /** Delete data files referenced ONLY by versions older than the
    * newest `keepVersions` commits. The JSON log is never truncated
    * (see class doc); a dropped version's log entry remains but
    * `readVersion` on it fails with a clear vacuumed-files error.
    */
  override def vacuum(path: String, keepVersions: Int = 2): Seq[Int] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val all = versions(path)
    if (all.isEmpty) return Nil
    val dropped = all.dropRight(keepVersions)
    if (dropped.isEmpty) return Nil
    val kept = all.takeRight(keepVersions)
    val keepFiles = kept.flatMap(v => replay(path, v).live).toSet
    val droppedFiles = dropped.flatMap(v => replay(path, v).live).toSet
      .diff(keepFiles)
    droppedFiles.foreach { f =>
      Files.deleteIfExists(Paths.get(path, f))
      dropCommitDirIfOnlySidecars(Paths.get(path, f).getParent)
    }
    dropped
  }

  /** Remove a per-commit data dir once only write sidecars remain —
    * Hadoop's local committer leaves `_SUCCESS` plus `.`-prefixed
    * `.crc` shadows behind, neither ever referenced by the log.
    */
  private def dropCommitDirIfOnlySidecars(dir: Path): Unit = {
    def sidecar(n: String) = n.startsWith("_") || n.startsWith(".")
    if (Files.isDirectory(dir) &&
        scala.util.Using.resource(Files.list(dir))(
          _.iterator().asScala.forall(p => sidecar(p.getFileName.toString)))) {
      scala.util.Using.resource(Files.list(dir))(
        _.iterator().asScala.toSeq).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(dir)
    }
  }

  /** Reclaim data directories no commit references: a writer that
    * died between writing its `files-*` attempt dir and publishing
    * the version file — or that lost the version race — leaves a
    * complete rewrite's worth of parquet behind that `vacuum` can
    * never name (it walks the log, and these dirs are in no log
    * entry). Only dirs last modified more than `olderThanMs` ago are
    * touched so an IN-FLIGHT writer's not-yet-committed attempt is
    * never deleted from under it — the same retention-threshold
    * defense real Delta's VACUUM uses. Returns the removed dirs.
    */
  def vacuumOrphans(path: String,
                    olderThanMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) return Nil
    val referenced = versions(path)
      .flatMap { v =>
        Files.readAllLines(logFile(path, v), StandardCharsets.UTF_8)
          .asScala.filter(_.nonEmpty).flatMap { line =>
            val node = mapper.readTree(line)
            Seq("add", "remove").flatMap(k =>
              if (node.has(k)) Some(node.get(k).get("path").asText()) else None)
          }
      }
      .map(p => p.split('/').head).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val orphans = scala.util.Using.resource(Files.list(root))(
      _.iterator().asScala
        .filter(d => Files.isDirectory(d) &&
          d.getFileName.toString.startsWith("files-") &&
          !referenced.contains(d.getFileName.toString) &&
          Files.getLastModifiedTime(d).toMillis < cutoff)
        .toSeq)
    orphans.foreach { d =>
      scala.util.Using.resource(Files.walk(d))(
        _.iterator().asScala.toSeq.reverse).foreach(Files.deleteIfExists(_))
    }
    orphans.map(_.getFileName.toString)
  }
}
