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

  /** Replayed table state at a version: live files (in add order,
    * each with its recorded partitionValues) plus the last-seen
    * metaData (table id, schema json).
    */
  private case class State(liveMap: mutable.LinkedHashMap[String, Map[String, String]],
                           tableId: Option[String],
                           schemaJson: Option[String]) {
    def live: Seq[String] = liveMap.keys.toSeq
  }

  private def emptyState = State(mutable.LinkedHashMap.empty, None, None)

  private def replay(path: String, upTo: Int): State = {
    val live = mutable.LinkedHashMap.empty[String, Map[String, String]]
    var tableId: Option[String] = None
    var schemaJson: Option[String] = None
    versions(path).filter(_ <= upTo).foreach { v =>
      Files.readAllLines(logFile(path, v), StandardCharsets.UTF_8)
        .asScala.filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("add")) {
            val add = node.get("add")
            val pv = Option(add.get("partitionValues"))
              .map(n => n.fieldNames().asScala
                .map(k => k -> n.get(k).asText()).toMap)
              .getOrElse(Map.empty[String, String])
            live += add.get("path").asText() -> pv
          }
          if (node.has("remove")) live -= node.get("remove").get("path").asText()
          if (node.has("metaData")) {
            tableId = Some(node.get("metaData").get("id").asText())
            schemaJson = Some(node.get("metaData").get("schemaString").asText())
          }
        }
    }
    State(live, tableId, schemaJson)
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
  private def commitRewrite(path: String, df: DataFrame): Int =
    commitFiles(path, df, partitionBy = None, removeOf = (prev, _) => prev.live)

  /** Write `df`'s files as the next commit's adds and emit removes
    * for `removeOf(previous state)`. `partitionBy` duplicates the
    * named column into a `__pv` write-partitioning column, so the
    * real column STAYS in the data files (reads never reconstruct it
    * from dir names, and parquet footer stats prune whole
    * partition-homogeneous files on partition filters); the
    * Spark-written `__pv=` dir fragment is recorded as the file's
    * partitionValues entry. The fragment is an OPAQUE token — never
    * rendered by us, always by Spark's own path escaping — so
    * matching recorded tokens against the tokens of a later write of
    * the same values is exact (the lesson of the round-4
    * double-escaping bug: diff what Spark wrote, don't render names).
    */
  private def commitFiles(path: String, df: DataFrame,
                          partitionBy: Option[String],
                          removeOf: (State, Seq[(String, Map[String, String])])
                            => Seq[String]): Int = {
    val next = currentVersion(path).getOrElse(-1) + 1
    val prev = if (next == 0) emptyState else replay(path, next - 1)
    // unique per ATTEMPT, not per version: two writers racing the
    // same version must not clobber each other's data files before
    // the log move picks the winner (the loser's dir is orphaned
    // garbage, never referenced by any commit)
    val subdir = f"files-$next%05d-${java.util.UUID.randomUUID().toString.take(8)}"
    partitionBy match {
      case Some(pc) =>
        df.withColumn("__pv", col(pc)).write.mode("overwrite")
          .partitionBy("__pv").parquet(s"$path/$subdir")
      case None =>
        df.write.mode("overwrite").parquet(s"$path/$subdir")
    }
    val now = System.currentTimeMillis()
    val written: Seq[(String, Map[String, String])] =
      scala.util.Using.resource(Files.walk(Paths.get(path, subdir)))(
        _.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map { f =>
            val rel = Paths.get(path, subdir).relativize(f).toString
            val pv = partitionBy.flatMap { pc =>
              rel.split('/').find(_.startsWith("__pv="))
                .map(seg => Map(pc -> seg.stripPrefix("__pv=")))
            }.getOrElse(Map.empty)
            (s"$subdir/$rel", pv)
          }.toSeq)
    val adds = written.map { case (p, pv) =>
      val a = mapper.createObjectNode()
      val add = a.putObject("add")
      add.put("path", p)
      val pvNode = add.putObject("partitionValues")
      pv.foreach { case (k, v) => pvNode.put(k, v) }
      add.put("size", Files.size(Paths.get(path, p)))
      add.put("modificationTime",
        Files.getLastModifiedTime(Paths.get(path, p)).toMillis)
      add.put("dataChange", true)
      a
    }
    val removes = removeOf(prev, written).map { p =>
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

  /** Partition-pruned SCD1 merge: rewrite ONLY the partitions the
    * updates touch; every other partition's files stay live from
    * their original commits with ZERO copying — the manifest
    * advantage over the snapshot format, whose pruned merge must
    * still copy untouched partitions into each new version dir
    * (`MergeTable.distributedCopy`). At 100 TB with date-partitioned
    * tables a merge commit costs the hot partitions' rewrite plus
    * one JSON file.
    *
    * Same contract as `MergeTable.scd1MergePruned`: updates must
    * carry `partitionCol`, null partition values are rejected,
    * incremental extracts only (no deleteMissing — it needs global
    * key visibility), and a key must not move partitions.
    */
  def scd1MergePruned(spark: SparkSession, path: String, updates: DataFrame,
                      keys: Seq[String], orderBy: String, partitionCol: String,
                      compareExclude: Seq[String] = Sources.controlColumns)
      : MergeStats =
    mergePruned(spark, path, updates, keys, orderBy, partitionCol,
      scdType = 1, compareExclude)

  /** Partition-pruned SCD2 merge — see [[scd1MergePruned]]. */
  def scd2MergePruned(spark: SparkSession, path: String, updates: DataFrame,
                      keys: Seq[String], orderBy: String, partitionCol: String,
                      compareExclude: Seq[String] = Sources.controlColumns)
      : MergeStats =
    mergePruned(spark, path, updates, keys, orderBy, partitionCol,
      scdType = 2, compareExclude)

  private def mergePruned(spark: SparkSession, path: String, updates: DataFrame,
                          keys: Seq[String], orderBy: String,
                          partitionCol: String, scdType: Int,
                          compareExclude: Seq[String]): MergeStats = {
    require(updates.columns.contains(partitionCol),
      s"updates must carry partition column $partitionCol")
    val ord = MergeTable.deterministicOrd(updates, keys, orderBy)
    if (!exists(path)) {
      val obs = Observation()
      val base = Cdc.latestPerKey(updates, keys, ord)
      val first = (if (scdType == 2)
        base.withColumn("is_current", lit(1))
          .withColumn("start_time", current_timestamp())
          .withColumn("end_time", lit(null).cast("timestamp"))
          .withColumn("delete_time", lit(null).cast("timestamp"))
      else base).observe(obs, count(lit(1)).as("n"))
      commitFiles(path, first, Some(partitionCol), (_, _) => Nil)
      return MergeStats(obs.get("n").asInstanceOf[Long], 0, 0)
    }
    val affected = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    // same rejection as MergeTable.mergePruned: a null partition
    // value bypasses isin() pruning AND has no stable token
    require(!affected.contains(null),
      s"pruned merge: updates carry null $partitionCol values; " +
        "null partitions cannot be pruned — use the unpruned merge")
    // every live file must carry a recorded token for partitionCol:
    // mixing pruned merges into a table built by full-rewrite
    // commits would leave old-partition files unmatchable by the
    // remove targeting below (stale rows would survive as dupes)
    val prevState = replay(path, currentVersion(path).get)
    require(prevState.liveMap.values.forall(_.contains(partitionCol)),
      s"pruned merge: table at $path has live files without recorded " +
        s"'$partitionCol' partitionValues (written by an unpartitioned " +
        "commit) — run a partitioned full merge first")
    val target = read(spark, path)
    val affectedTarget = target.filter(col(partitionCol).isin(affected: _*))
    val tagged =
      if (scdType == 2)
        Cdc.scd2MergeTagged(affectedTarget, updates, keys, ord,
          deleteMissing = false, compareExclude)
      else
        Cdc.scd1MergeTagged(affectedTarget,
          updates.select(affectedTarget.columns.map(col).toIndexedSeq: _*),
          keys, ord, deleteMissing = false, compareExclude,
          orderGuard = Some(orderBy))
    MergeTable.observedWrite(tagged,
      dropActions = if (scdType == 2) Nil else Seq("delete")) { out =>
      commitPruned(path, out, partitionCol); ()
    }
  }

  /** Commit `df` (the rewritten affected partitions) and remove the
    * previous live files of exactly those partitions — identified by
    * matching their recorded tokens against the tokens Spark just
    * wrote for this commit (a pruned merge never drops rows, so
    * every affected partition appears in the output).
    */
  private def commitPruned(path: String, df: DataFrame,
                           partitionCol: String): Unit = {
    commitFiles(path, df, Some(partitionCol), (prev, written) => {
      val rewritten = written.flatMap(_._2.get(partitionCol)).toSet
      prev.liveMap.collect {
        case (p, pv) if pv.get(partitionCol).exists(rewritten.contains) => p
      }.toSeq
    })
    ()
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
