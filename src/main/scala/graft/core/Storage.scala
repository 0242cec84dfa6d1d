package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.format._

class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

/** Thrown by [[Storage.orderedSnapshotIds]] when the CDC walk is
  * impossible because the START snapshot (an MV's refresh watermark) has
  * been EXPIRED out of metadata — the one condition a consumer may
  * legitimately resolve with a whole-state rebuild. A walk failure while
  * the start snapshot still EXISTS is a caller bug (target below the
  * watermark, or on an unrelated lineage) and stays a plain
  * IllegalArgumentException, so a typo'd refresh target surfaces instead
  * of silently triggering a full source rescan (ADVICE r10). */
class ExpiredHistoryException(msg: String) extends IllegalArgumentException(msg)

/** Thrown by the under-lock exactly-once guard when a transaction tag
  * (appId, version) has already committed — the signal `appendOnce`
  * turns into its documented `None` ("skipped, already delivered")
  * result instead of crashing the redelivered worker. */
class DuplicateTransactionException(val appId: String, val version: Long)
  extends RuntimeException(
    s"duplicate transaction: appId=$appId version=$version already committed")

/** How a transaction's patch relates to concurrent commits — see
  * [[Storage.transaction]]. */
sealed trait ConflictPolicy
object ConflictPolicy {
  case object Append extends ConflictPolicy
  case object Rewrite extends ConflictPolicy
  case object Strict extends ConflictPolicy
}

/** The metadata engine of a graft table: loads/commits metadata, resolves
  * versions, manages tags/branches. Plain JVM (no Spark dependency) —
  * mirrors the reference's `Storage`
  * (`/root/reference/python/src/space/core/storage.py:60-510`).
  *
  * Concurrency model is the reference's: optimistic single-writer — a
  * transaction pins the branch head at start, re-reads it before commit,
  * and aborts if the head moved (storage.py:545-596). Atomicity relies on
  * write-temp-then-rename of the entrypoint file, atomic on local
  * filesystems and HDFS within a directory; the same documented
  * limitation as the reference (fs/arrow.py:46-49).
  */
final class Storage(val location: String, val conf: Configuration) {

  private val rootPath = new Path(location)
  private val fs: FileSystem = {
    val f = rootPath.getFileSystem(conf)
    // metadata files are tiny and atomically replaced; the local
    // ChecksumFileSystem's .crc sidecars break replace-by-rename under
    // concurrent readers (stale checksum window) — disable them
    f.setWriteChecksum(false)
    f.setVerifyChecksum(false)
    f
  }

  private var meta: StorageMetadata = _
  private var metaFilePath: String = _

  reload()

  def metadata: StorageMetadata = meta
  /** Root-relative path of the current metadata json. */
  def metadataFile: String = metaFilePath
  def schema: StructType = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]

  /** User-visible schema: physical schema with column renames applied —
    * top-level ([[StorageMetadata.renames]]) and struct members
    * ([[StorageMetadata.nestedRenames]]). */
  def logicalSchema: StructType = logicalize(schema)

  def logicalNameOf(physical: String): String = meta.renames.getOrElse(physical, physical)

  /** Inverse rename lookup; identity for never-renamed columns. */
  def physicalNameOf(logical: String): String =
    meta.renames.collectFirst { case (p, l) if l == logical => p }.getOrElse(logical)

  /** Logical leaf name of the field at a full PHYSICAL dotted path
    * (length 1 = top-level). */
  def logicalLeafOf(physPath: Seq[String]): String =
    if (physPath.lengthCompare(1) == 0) logicalNameOf(physPath.head)
    else meta.nestedRenames.getOrElse(physPath.mkString("."), physPath.last)

  /** Physical leaf name of the member of `parentPhys` (a physical path;
    * empty = top level) whose current logical name is `logical`. */
  def physicalLeafOf(parentPhys: Seq[String], logical: String): String =
    if (parentPhys.isEmpty) physicalNameOf(logical)
    else {
      val prefix = parentPhys.mkString(".") + "."
      meta.nestedRenames.collectFirst {
        case (p, l) if l == logical && p.startsWith(prefix) &&
          !p.stripPrefix(prefix).contains(".") => p.stripPrefix(prefix)
      }.getOrElse(logical)
    }

  /** Full physical path of a LOGICAL dotted path, each step resolved
    * against the renames at its level. */
  def physicalPathOf(logicalPath: Seq[String]): Seq[String] =
    logicalPath.foldLeft(Vector.empty[String]) { (phys, step) =>
      phys :+ physicalLeafOf(phys, step)
    }

  /** Rename fields physical→logical recursively. Subset-safe: walks the
    * GIVEN struct (possibly a pruned read schema), mapping any member
    * whose physical path has a rename. Descends struct spines only —
    * renames inside array/map element structs are unsupported, matching
    * [[addNestedColumn]]'s reach. */
  def logicalize(st: StructType): StructType =
    if (meta.renames.isEmpty && meta.nestedRenames.isEmpty) st
    else logicalizeType(st, Nil).asInstanceOf[StructType]

  /** [[logicalize]] for a type sitting at physical path `physPath`
    * (Nil = a whole top-level schema). */
  def logicalizeType(t: DataType, physPath: Seq[String]): DataType = t match {
    case s: StructType => StructType(s.fields.map { f =>
      val p = physPath :+ f.name
      f.copy(name = logicalLeafOf(p), dataType = logicalizeType(f.dataType, p))
    })
    case other => other
  }

  /** Inverse of [[logicalize]]: rename fields logical→physical
    * recursively; subset-safe. */
  def physicalize(st: StructType): StructType =
    if (meta.renames.isEmpty && meta.nestedRenames.isEmpty) st
    else physicalizeType(st, Nil).asInstanceOf[StructType]

  /** [[physicalize]] for a type whose PARENT physical path is
    * `physPath` (Nil = a whole top-level schema). */
  def physicalizeType(t: DataType, physPath: Seq[String]): DataType = t match {
    case s: StructType => StructType(s.fields.map { f =>
      val pl = physicalLeafOf(physPath, f.name)
      f.copy(name = pl, dataType = physicalizeType(f.dataType, physPath :+ pl))
    })
    case other => other
  }

  /** Whether any struct member under top-level PHYSICAL column `phys`
    * carries a nested rename (the read/write boundaries use this to
    * leave untouched columns on the fast path). */
  def hasNestedRenamesUnder(phys: String): Boolean =
    meta.nestedRenames.keysIterator.exists(_.startsWith(phys + "."))

  def primaryKeys: Seq[String] = meta.primaryKeys
  /** Columns with per-file min/max manifest stats: primary keys (the
    * reference's rule) plus any declared extra stats fields. */
  def statsColumns: Seq[String] = (meta.primaryKeys ++ meta.statsFields).distinct
  def recordFields: Seq[String] = meta.recordFields

  /** Resolve a manifest path: table-root-relative normally; absolute
    * paths pass through (zero-copy-ingested EXTERNAL files live outside
    * the table root, loaders/parquet.py:30-74 semantics). */
  def absolute(rel: String): String = {
    val p = new Path(rel)
    if (p.isAbsolute || rel.contains("://")) rel else new Path(rootPath, rel).toString
  }

  // ---------------------------------------------------------------- IO

  def readString(rel: String): String = {
    val in = fs.open(new Path(rootPath, rel))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Write-temp-then-rename. On local filesystems the rename is a true
    * POSIX atomic replace (no visibility window); on Hadoop FSes it
    * degrades to delete-then-rename with the same documented small
    * window as the reference (fs/arrow.py:46-49). */
  def writeStringAtomic(rel: String, content: String): Unit = {
    val dst = new Path(rootPath, rel)
    val tmp = new Path(rootPath, rel + ".tmp-" + java.util.UUID.randomUUID())
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val scheme = Option(dst.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      if (fs.exists(dst)) fs.delete(dst, false)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"rename $tmp -> $dst failed")
    }
  }

  // ------------------------------------------------------------ loading

  def reload(): Unit = {
    val ep = MetadataJson.readEntryPoint(readString(StoragePaths.EntryPointFile))
    metaFilePath = ep.metadataFile
    meta = MetadataJson.readMetadata(readString(ep.metadataFile))
  }

  // ----------------------------------------------------------- versions

  def branchHead(branch: String): Long =
    if (branch == SnapshotRef.MainBranch) meta.currentSnapshotId
    else meta.refs.get(branch) match {
      case Some(r) if r.refType == SnapshotRef.Branch => r.snapshotId
      case _ => throw new IllegalArgumentException(s"branch $branch not found")
    }

  /** tag/branch name, numeric snapshot id, or ISO-8601 timestamp
    * (`2026-08-13T01:00:00Z` → latest snapshot at or before it) →
    * snapshot id (storage.py:224-236, plus TIMESTAMP-AS-OF parity with
    * the SQL path). */
  def versionToSnapshotId(version: String): Long =
    meta.refs.get(version).map(_.snapshotId).getOrElse {
      if (version == SnapshotRef.MainBranch) meta.currentSnapshotId
      else try version.toLong catch {
        case _: NumberFormatException =>
          try snapshotIdAtTimestamp(java.time.Instant.parse(version).toEpochMilli)
          catch {
            case _: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"version $version is not a tag, branch, snapshot id, " +
                  "or ISO-8601 timestamp")
          }
      }
    }

  /** Latest snapshot created at or before `cutoffMs` — the
    * `TIMESTAMP AS OF` rule, shared by the SQL catalog and the API read
    * path. Ties on createTimeMs resolve to the higher snapshot id. */
  def snapshotIdAtTimestamp(cutoffMs: Long): Long = {
    val eligible = meta.snapshots.values.filter(_.createTimeMs <= cutoffMs)
    require(eligible.nonEmpty,
      s"no snapshot of $location exists at or before timestamp $cutoffMs ms")
    eligible.maxBy(s => (s.createTimeMs, s.snapshotId)).snapshotId
  }

  def snapshotOrFail(id: Long): Snapshot = meta.snapshot(id).getOrElse(
    throw new IllegalArgumentException(s"snapshot $id not found"))

  /** (snapshotId, parent, createTimeMs, tagOrBranchNames) rows, newest
    * first — the versions() table (storage.py:410-443). */
  def versions: Seq[(Long, Option[Long], Long, Seq[String])] = {
    val refsBySnapshot = meta.refs.values.toSeq.groupBy(_.snapshotId)
    meta.snapshots.values.toSeq.sortBy(-_.createTimeMs).map { s =>
      (s.snapshotId, s.parentSnapshotId, s.createTimeMs,
        refsBySnapshot.getOrElse(s.snapshotId, Nil).map(_.name).sorted)
    }
  }

  // --------------------------------------------------------------- refs

  private[core] def persistMetadata(newMeta: StorageMetadata): Unit = persist(newMeta)

  private def persist(newMeta: StorageMetadata): Unit = {
    val newFile = StoragePaths.newMetadataFile()
    writeStringAtomic(newFile, MetadataJson.write(newMeta))
    writeStringAtomic(StoragePaths.EntryPointFile, MetadataJson.write(EntryPoint(newFile)))
    meta = newMeta
    metaFilePath = newFile
  }

  /** Metadata-only schema evolution: append a NULLABLE non-key column.
    * Existing data files are untouched — reads null-fill the column
    * (schema-on-read; field ids are never reused, [[FieldIds.assign]]
    * continues from the consumed-id watermark). Stats/pruning are
    * unaffected (stats exist for primary keys only, which cannot be
    * added after creation). The whole table — every snapshot, time
    * travel included — reads with the evolved schema. */
  def addColumn(field: StructField): Unit = {
    require(field.nullable, s"added column ${field.name} must be nullable " +
      "(existing files null-fill it)")
    withCommitLock {
      reload()
      require(!logicalSchema.fieldNames.contains(field.name),
        s"column ${field.name} already exists")
      val start = nextFieldId
      // a name that was EVER dropped — or that is still some renamed
      // column's PHYSICAL name — gets a generated physical name + a
      // rename entry: old files hold data under the original name, and
      // name-based parquet reads must never resurrect or alias those
      // bytes into the new field
      val taken = meta.droppedColumns.contains(field.name) ||
        schema.fieldNames.contains(field.name)
      // the generated name must dodge live physical AND logical names
      // and every ever-dropped name — a user column literally named
      // "x_f7" that was dropped earlier would otherwise resurrect its
      // bytes into the re-added field
      val physName =
        if (!taken) field.name
        else Iterator.from(0)
          .map(i => s"${field.name}_f$start" + (if (i == 0) "" else s"_$i"))
          .find(c => !schema.fieldNames.contains(c) &&
            !logicalSchema.fieldNames.contains(c) &&
            !meta.droppedColumns.contains(c)).get
      val assigned = FieldIds.assign(StructType(Seq(field.copy(name = physName))), start)
      persist(meta.copy(schemaJson = StructType(schema.fields ++ assigned.fields).json,
        renames = if (taken) meta.renames + (physName -> field.name) else meta.renames,
        maxFieldId = FieldIds.maxAssignedId(assigned) max start,
        lastUpdateTimeMs = System.currentTimeMillis()))
    }
  }

  /** Metadata-only NESTED schema evolution: append a nullable field to
    * an existing struct column (`parentPath` walks structs depth-first;
    * its first step is a logical top-level name). Old files null-fill
    * the field on read — Spark's parquet reader clips nested requested
    * schemas by name — and ids come from the same never-reused watermark
    * as top-level adds ([[FieldIds.assign]] is depth-first ready).
    * Re-adding a name previously dropped from the same struct gets a
    * generated physical name + a [[StorageMetadata.nestedRenames]]
    * entry, exactly like top-level re-adds — old files' bytes for the
    * dropped member must never resurrect into the new field. */
  def addNestedColumn(parentPath: Seq[String], field: StructField): Unit = {
    require(parentPath.nonEmpty, "addNestedColumn requires a parent path")
    require(field.nullable, s"added column ${field.name} must be nullable " +
      "(existing files null-fill it)")
    withCommitLock {
      reload()
      val start = nextFieldId
      // every step of parentPath is a LOGICAL name (a stale physical
      // name must not silently resolve), mapped to physical level by
      // level as the walk descends
      def insert(st: StructType, path: Seq[String], physWalked: Seq[String])
          : (StructType, Option[(String, String)]) =
        path match {
          case Seq() =>
            val logicalHere = st.fields.map(f => logicalLeafOf(physWalked :+ f.name))
            require(!logicalHere.contains(field.name),
              s"column ${physWalked.mkString(".")}.${field.name} already exists")
            val droppedKey = (physWalked :+ field.name).mkString(".")
            // dropped before, or still occupied by a renamed-away
            // member's physical name → generated physical name
            val taken = meta.droppedColumns.contains(droppedKey) ||
              st.fieldNames.contains(field.name)
            // dodge live physical and logical member names and every
            // ever-dropped dotted key under this struct (same
            // resurrection guard as the top-level re-add path)
            val physLeaf =
              if (!taken) field.name
              else Iterator.from(0)
                .map(i => s"${field.name}_f$start" + (if (i == 0) "" else s"_$i"))
                .find(c => !st.fieldNames.contains(c) &&
                  !logicalHere.contains(c) &&
                  !meta.droppedColumns.contains((physWalked :+ c).mkString("."))).get
            val assigned = FieldIds.assign(
              StructType(Seq(field.copy(name = physLeaf))), start).fields.head
            (StructType(st.fields :+ assigned),
              if (taken) Some((physWalked :+ physLeaf).mkString(".") -> field.name)
              else None)
          case p +: rest =>
            val physName = physicalLeafOf(physWalked, p)
            val idx = st.fields.indexWhere(_.name == physName)
            // the logical-name round-trip also rejects a renamed member's
            // STALE physical name silently resolving
            require(idx >= 0 && logicalLeafOf(physWalked :+ physName) == p,
              s"struct ${(physWalked :+ p).mkString(".")} not found")
            val f = st.fields(idx)
            f.dataType match {
              case s: StructType =>
                val (inner, ren) = insert(s, rest, physWalked :+ physName)
                (StructType(st.fields.updated(idx, f.copy(dataType = inner))), ren)
              case other => throw new IllegalArgumentException(
                s"$p is not a struct (${other.simpleString})")
            }
        }

      val (newSchema, renameEntry) = insert(schema, parentPath, Vector.empty)
      // the added member consumes ids start..start+consumed-1 (the
      // whole-schema maxAssignedId formula assumes contiguous subtree
      // spans, which nested adds break)
      val addedMax = start + FieldIds.consumedIds(StructType(Seq(field))) - 1
      persist(meta.copy(schemaJson = newSchema.json,
        nestedRenames = meta.nestedRenames ++ renameEntry,
        maxFieldId = addedMax,
        lastUpdateTimeMs = System.currentTimeMillis()))
    }
  }

  /** Locate the parent struct of a LOGICAL dotted path; returns the
    * resolved full physical path and the parent's StructType. */
  private def resolveNested(path: Seq[String]): (Vector[String], StructType) = {
    require(path.lengthCompare(2) >= 0, "nested path needs at least struct.member")
    val physPath = physicalPathOf(path).toVector
    // every step must round-trip back to its given LOGICAL name — a
    // renamed member's stale physical name must not silently resolve
    physPath.indices.foreach { i =>
      require(logicalLeafOf(physPath.take(i + 1)) == path(i),
        s"column ${path.take(i + 1).mkString(".")} not found")
    }
    var parent: StructType = schema
    physPath.init.zip(path.init).foreach { case (phys, logical) =>
      val idx = parent.fields.indexWhere(_.name == phys)
      require(idx >= 0, s"struct $logical not found")
      parent = parent.fields(idx).dataType match {
        case s: StructType => s
        case other => throw new IllegalArgumentException(
          s"$logical is not a struct (${other.simpleString})")
      }
    }
    require(parent.fieldNames.contains(physPath.last),
      s"column ${path.mkString(".")} not found")
    (physPath, parent)
  }

  /** Metadata-only NESTED RENAME: change a struct member's logical
    * name. Same column-mapping contract as [[renameColumn]] — the
    * physical name in data files never changes; only the boundary map
    * ([[StorageMetadata.nestedRenames]], keyed by full physical path)
    * does. `path` is the member's current LOGICAL dotted path. */
  def renameNestedColumn(path: Seq[String], to: String): Unit = withCommitLock {
    reload()
    val (physPath, parent) = resolveNested(path)
    require(path.last != to, "rename to the same name")
    val parentPhys = physPath.init
    val logicalSiblings = parent.fields.map(f => logicalLeafOf(parentPhys :+ f.name))
    require(!logicalSiblings.contains(to),
      s"column ${(path.init :+ to).mkString(".")} already exists")
    // a new logical name may not shadow a DIFFERENT member's physical
    // name either — the write boundary resolves logical→physical by name
    require(to == physPath.last || !parent.fieldNames.contains(to),
      s"$to collides with an existing physical member of ${path.init.mkString(".")}")
    val key = physPath.mkString(".")
    val next =
      if (to == physPath.last) meta.nestedRenames - key // renamed back
      else meta.nestedRenames - key + (key -> to)
    persist(meta.copy(nestedRenames = next,
      lastUpdateTimeMs = System.currentTimeMillis()))
  }

  /** Metadata-only NESTED DROP: remove a struct member (subtree) from
    * the schema. Reads stop requesting it (name-based parquet clipping
    * sheds the bytes), its ids are retired via the
    * [[StorageMetadata.maxFieldId]] high-water mark, and its physical
    * path joins [[StorageMetadata.droppedColumns]] so a later re-add of
    * the same name can never resurrect old files' bytes. `path` is the
    * member's current LOGICAL dotted path. */
  def dropNestedColumn(path: Seq[String]): Unit = withCommitLock {
    reload()
    val (physPath, parent) = resolveNested(path)
    require(parent.fields.length > 1,
      s"cannot drop the last member of struct ${path.init.mkString(".")} " +
        "(drop the struct column instead)")
    val key = physPath.mkString(".")
    def remove(st: StructType, steps: Seq[String]): StructType = steps match {
      case Seq(leaf) => StructType(st.fields.filterNot(_.name == leaf))
      case p +: rest =>
        val idx = st.fields.indexWhere(_.name == p)
        val f = st.fields(idx)
        StructType(st.fields.updated(idx, f.copy(dataType =
          remove(f.dataType.asInstanceOf[StructType], rest))))
    }
    val highWater = math.max(meta.maxFieldId, FieldIds.maxAssignedId(schema))
    persist(meta.copy(
      schemaJson = remove(schema, physPath).json,
      statsFields = meta.statsFields.filterNot(s =>
        s == key || s.startsWith(key + ".")),
      nestedRenames = meta.nestedRenames.filterNot { case (p, _) =>
        p == key || p.startsWith(key + ".") },
      maxFieldId = highWater,
      droppedColumns = (meta.droppedColumns :+ key).distinct,
      lastUpdateTimeMs = System.currentTimeMillis()))
  }

  /** Metadata-only TYPE WIDENING: promote a column (or struct member)
    * to a wider type — the safe promotions `int→bigint`, `int→double`,
    * `float→double`. No byte of data is rewritten: Spark 4's parquet
    * readers (vectorized and row-based) widen INT32/FLOAT values to the
    * requested LONG/DOUBLE at scan time, for top-level and nested
    * fields alike, with filter pushdown intact (probed on this build;
    * SPARK-40876 is the upstream feature). The field keeps its id, so
    * manifest stats (`_STATS_f<id>` structs, themselves widened on
    * read by the same mechanism), renames, and pruning stay keyed
    * correctly; NEW files and manifests simply write the wider type.
    * Membership pruning hashes per-FILE physical types
    * ([[BloomPruning]]), so old files' blooms/dictionaries keep
    * engaging after the widen. Bucket columns cannot widen — the
    * murmur3 bucket hash of an int differs from the same value hashed
    * as long, which would break the layout contract.
    *
    * Dependent AGGREGATE VIEWS: a view's partial-state schema was
    * derived from the pre-widen type; the table holds no
    * back-references to its views, so the widen cannot be blocked
    * here — the view's next refresh detects the mismatch and fails
    * with recreate guidance instead of truncating silently
    * ([[graft.views.AggregateView]], ADVICE r11).
    *
    * `path` is a LOGICAL dotted path (length 1 = top-level). */
  def widenColumn(path: Seq[String], newType: DataType): Unit = withCommitLock {
    reload()
    require(path.nonEmpty, "widenColumn requires a column path")
    val physPath = physicalPathOf(path).toVector
    physPath.indices.foreach { i =>
      require(logicalLeafOf(physPath.take(i + 1)) == path(i),
        s"column ${path.take(i + 1).mkString(".")} not found")
    }
    if (physPath.lengthCompare(1) == 0) {
      val phys = physPath.head
      require(!meta.recordFields.contains(phys),
        s"cannot widen record field ${path.head}")
      require(!meta.bucketColumns.contains(phys),
        s"cannot widen bucket column ${path.head}: the bucket hash of the " +
          "widened type differs, which would break the bucket layout")
    }
    def widen(st: StructType, steps: Seq[String], walked: Seq[String]): StructType =
      steps match {
        case Seq(leaf) =>
          val idx = st.fields.indexWhere(_.name == leaf)
          require(idx >= 0, s"column ${path.mkString(".")} not found")
          val f = st.fields(idx)
          val ok = (f.dataType, newType) match {
            case (org.apache.spark.sql.types.IntegerType,
                  org.apache.spark.sql.types.LongType) => true
            case (org.apache.spark.sql.types.IntegerType,
                  org.apache.spark.sql.types.DoubleType) => true
            case (org.apache.spark.sql.types.FloatType,
                  org.apache.spark.sql.types.DoubleType) => true
            case _ => false
          }
          require(ok, s"unsupported type widening ${f.dataType.simpleString} -> " +
            s"${newType.simpleString} for ${path.mkString(".")} (supported: " +
            "int->bigint, int->double, float->double)")
          // copy keeps the field-id metadata: stats/pruning stay keyed
          StructType(st.fields.updated(idx, f.copy(dataType = newType)))
        case p +: rest =>
          val idx = st.fields.indexWhere(_.name == p)
          require(idx >= 0, s"struct ${(walked :+ p).mkString(".")} not found")
          val f = st.fields(idx)
          f.dataType match {
            case s: StructType =>
              StructType(st.fields.updated(idx,
                f.copy(dataType = widen(s, rest, walked :+ p))))
            case other => throw new IllegalArgumentException(
              s"$p is not a struct (${other.simpleString})")
          }
      }
    persist(meta.copy(schemaJson = widen(schema, physPath, Vector.empty).json,
      lastUpdateTimeMs = System.currentTimeMillis()))
  }

  /** First field id not yet handed out: past both the live schema's ids
    * and the high-water mark left by dropped columns (never reuse). */
  private def nextFieldId: Int =
    math.max(meta.maxFieldId, FieldIds.maxAssignedId(schema)) + 1

  /** Metadata-only RENAME COLUMN (column-mapping "name mode"): data
    * files keep the physical name forever; only the boundary mapping in
    * [[StorageMetadata.renames]] changes. Pruning is untouched because
    * manifest stats are keyed by FIELD ID, not name. `from` is the
    * current logical name. */
  def renameColumn(from: String, to: String): Unit = withCommitLock {
    reload()
    val phys = physicalNameOf(from)
    require(schema.fieldNames.contains(phys), s"column $from not found")
    require(from != to, "rename to the same name")
    val logicalNames = logicalSchema.fieldNames.toSet
    require(!logicalNames.contains(to), s"column $to already exists")
    // a new logical name may not shadow a DIFFERENT column's physical
    // name either — appends resolve logical→physical by name
    require(to == phys || !schema.fieldNames.contains(to),
      s"$to collides with an existing physical column name")
    val next =
      if (to == phys) meta.renames - phys // renamed back to the original
      else meta.renames - phys + (phys -> to)
    persist(meta.copy(renames = next, lastUpdateTimeMs = System.currentTimeMillis()))
  }

  /** Metadata-only DROP COLUMN: the field leaves the schema (reads stop
    * requesting it; compaction/clustering rewrites shed the bytes), its
    * id is retired forever via [[StorageMetadata.maxFieldId]], and its
    * stats/rename entries are cleaned up. Primary keys and record fields
    * cannot be dropped. `name` is the current logical name. */
  def dropColumn(name: String): Unit = withCommitLock {
    reload()
    val phys = physicalNameOf(name)
    require(schema.fieldNames.contains(phys), s"column $name not found")
    require(!meta.primaryKeys.contains(phys), s"cannot drop primary key $name")
    require(!meta.recordFields.contains(phys), s"cannot drop record field $name")
    require(!meta.bucketColumns.contains(phys), s"cannot drop bucket column $name")
    require(schema.fields.length > 1, "cannot drop the last column")
    val highWater = math.max(meta.maxFieldId, FieldIds.maxAssignedId(schema))
    persist(meta.copy(
      schemaJson = StructType(schema.fields.filterNot(_.name == phys)).json,
      statsFields = meta.statsFields.filterNot(s =>
        s == phys || s.startsWith(phys + ".")),
      renames = meta.renames - phys,
      nestedRenames = meta.nestedRenames.filterNot(_._1.startsWith(phys + ".")),
      maxFieldId = highWater,
      droppedColumns = (meta.droppedColumns :+ phys).distinct,
      lastUpdateTimeMs = System.currentTimeMillis()))
  }

  /** Is `ancestor` on `of`'s parent chain (inclusive)? The shared walk
    * behind [[rollback]]'s forward guard and [[fastForward]]'s inverse
    * one — one definition so a future cycle/expiry fix hits both. */
  @annotation.tailrec
  private def isAncestor(ancestor: Long, of: Long): Boolean =
    ancestor == of || (snapshotOrFail(of).parentSnapshotId match {
      case Some(p) => isAncestor(ancestor, p)
      case None => false
    })

  /** Reset `branch`'s head to an ANCESTOR snapshot — a metadata-only
    * undo (Iceberg's rollback semantics; the reference has no undo op).
    * The abandoned descendant snapshots stay readable by id/tag until
    * snapshot expiry + GC reclaim them, and snapshot ids are never
    * reused (`maxSnapshotId` is a high-water mark), so the next commit
    * continues from the restored head under a fresh id. Restricting the
    * target to the branch's own parent chain keeps its history linear —
    * jumping to an arbitrary snapshot would silently splice another
    * branch's lineage into this one's CDC feed. */
  def rollback(snapshotId: Long, branch: String = SnapshotRef.MainBranch): Unit =
    withCommitLock {
      reload()
      val head = branchHead(branch)
      require(snapshotId != head, s"branch $branch is already at snapshot $snapshotId")
      require(isAncestor(ancestor = snapshotId, of = head),
        s"snapshot $snapshotId is not an ancestor of $branch head $head")
      val now = System.currentTimeMillis()
      persist(
        if (branch == SnapshotRef.MainBranch)
          meta.copy(currentSnapshotId = snapshotId, lastUpdateTimeMs = now)
        else meta.copy(
          refs = meta.refs + (branch -> SnapshotRef(branch, SnapshotRef.Branch, snapshotId)),
          lastUpdateTimeMs = now))
    }

  /** Fast-forward `branch` to the head of `toBranch` — the publish step
    * of a write-audit-publish flow: stage writes on an audit branch,
    * validate them there, then move the consuming branch up in one
    * metadata-only operation. The inverse guard of [[rollback]]:
    * `branch`'s head must be an ANCESTOR of `toBranch`'s head, so the
    * move only appends already-committed audited snapshots — histories
    * stay linear and the CDC feed never splices an unrelated lineage. */
  def fastForward(branch: String, toBranch: String): Unit =
    withCommitLock {
      reload()
      val target = branchHead(toBranch)
      val head = branchHead(branch)
      // already at the target head: an idempotent no-op, not an error —
      // an unchanged-audit publish or a retried WAP publish step must
      // succeed silently; require failures are for non-ancestor moves
      if (target != head) {
        require(isAncestor(ancestor = head, of = target),
          s"$branch head $head is not an ancestor of $toBranch head $target " +
            "— fast-forward would rewrite history; use rollback for that")
        val now = System.currentTimeMillis()
        persist(
          if (branch == SnapshotRef.MainBranch)
            meta.copy(currentSnapshotId = target, lastUpdateTimeMs = now)
          else meta.copy(
            refs = meta.refs + (branch -> SnapshotRef(branch, SnapshotRef.Branch, target)),
            lastUpdateTimeMs = now))
      }
    }

  def addTag(name: String, snapshotId: Option[Long] = None): Unit =
    addRef(name, SnapshotRef.Tag, snapshotId)

  def addBranch(name: String, snapshotId: Option[Long] = None): Unit =
    addRef(name, SnapshotRef.Branch, snapshotId)

  // Ref mutations take the commit lock AND reload first, like every
  // other metadata mutator: persist() from a stale in-memory meta would
  // overwrite (and permanently orphan) snapshots committed concurrently
  // by another process between this handle's load and the ref edit.
  private def addRef(name: String, refType: String, snapshotId: Option[Long]): Unit =
    withCommitLock {
      reload()
      require(name != SnapshotRef.MainBranch, s"ref name $name is reserved")
      require(!meta.refs.contains(name), s"ref $name already exists")
      val id = snapshotId.getOrElse(meta.currentSnapshotId)
      snapshotOrFail(id)
      persist(meta.copy(
        refs = meta.refs + (name -> SnapshotRef(name, refType, id)),
        lastUpdateTimeMs = System.currentTimeMillis()))
    }

  def removeRef(name: String): Unit =
    withCommitLock {
      reload()
      require(meta.refs.contains(name), s"ref $name not found")
      persist(meta.copy(refs = meta.refs - name,
        lastUpdateTimeMs = System.currentTimeMillis()))
    }

  /** Remove a tag; fails if `name` is missing or is a branch
    * (storage.py:287-289, 298-307). */
  def removeTag(name: String): Unit = removeTypedRef(name, SnapshotRef.Tag)

  /** Remove a branch; fails if `name` is missing, is a tag, or is the
    * main branch (storage.py:291-296). The caller (SpaceDataset) also
    * guards against removing its current read/write branch. */
  def removeBranch(name: String): Unit = {
    require(name != SnapshotRef.MainBranch, "cannot remove the main branch")
    removeTypedRef(name, SnapshotRef.Branch)
  }

  private def removeTypedRef(name: String, refType: String): Unit =
    withCommitLock {
      reload()
      val ref = meta.refs.getOrElse(name,
        throw new IllegalArgumentException(s"ref $name not found"))
      require(ref.refType == refType,
        s"ref $name is a ${ref.refType}, not a $refType")
      persist(meta.copy(refs = meta.refs - name,
        lastUpdateTimeMs = System.currentTimeMillis()))
    }

  // ------------------------------------------------------------- commit

  /** Apply a patch as a new snapshot on `branch` (storage.py:315-367).
    * Returns the new snapshot id. Not concurrency-checked by itself —
    * use [[transaction]] for the optimistic check.
    *
    * `metaTransform` (identity by default) edits the metadata ATOMICALLY
    * with the snapshot — the hook layout-changing rewrites (rebucket)
    * use so data and the layout claim can never be observed apart. It
    * runs on the metadata that already contains the new snapshot (its
    * id = `maxSnapshotId`). */
  def commit(
      patch: Patch,
      branch: String = SnapshotRef.MainBranch,
      metaTransform: StorageMetadata => StorageMetadata = identity,
      /** True only for the rebucket commit: its snapshot starts a NEW
        * layout epoch (stamped with its own id). Every other commit
        * inherits the parent snapshot's epoch, so layout claims follow
        * COMMIT LINEAGE, not raw id order (see
        * [[graft.format.Snapshot.bucketLayoutId]]). */
      newLayoutEpoch: Boolean = false): Long = {
    val baseId = branchHead(branch)
    val base = snapshotOrFail(baseId)
    val newId = meta.maxSnapshotId + 1

    // _patch_manifests (storage.py:513-535): removals must exist exactly once.
    def patched(current: List[String], added: List[String], removed: List[String]): List[String] = {
      val cur = current.toSet
      removed.foreach(r => require(cur.contains(r), s"manifest to remove not present: $r"))
      (current.filterNot(removed.toSet) ++ added).distinct
    }
    val manifests = ManifestFiles(
      patched(base.manifestFiles.indexManifestFiles, patch.addedIndexManifests, patch.removedIndexManifests),
      patched(base.manifestFiles.recordManifestFiles, patch.addedRecordManifests, patch.removedRecordManifests))

    val changeLogFile = patch.changeLog.map { cl =>
      val f = StoragePaths.newChangeLogFile()
      writeStringAtomic(f, MetadataJson.write(cl))
      f
    }

    // merge-on-read delete vectors: fold the patch's vector edits into
    // the parent's consolidated set; write a new DV file only when the
    // set actually changed (appends inherit the parent's file pointer)
    val parentDvs = deleteVectors(baseId)
    val dvFile =
      if (patch.dvAdded.isEmpty &&
          // a removal that names no live entry is a no-op
          !patch.dvRemoved.exists(parentDvs.contains))
        base.deleteVectorFile
      else {
        val next = (parentDvs -- patch.dvRemoved) ++ patch.dvAdded
        if (next.isEmpty) None
        else {
          val f = StoragePaths.newDeleteVectorFile()
          writeStringAtomic(f, MetadataJson.write(
            DeleteVectors(next.toList.sortBy(_._1).map(_._2))))
          Some(f)
        }
      }

    val now = System.currentTimeMillis()
    val snap = Snapshot(newId, Some(baseId), now, manifests,
      base.storageStatistics + patch.statsDelta, changeLogFile, dvFile, patch.txn,
      bucketLayoutId = if (newLayoutEpoch) newId else base.bucketLayoutId)

    // exactly-once writer guard: runs under the commit lock after a
    // fresh reload, so a duplicate delivery can NEVER double-commit —
    // the typed exception lets appendOnce resolve a concurrent
    // redelivery to its documented None result instead of crashing
    patch.txn.foreach { t =>
      if (meta.txnVersions.getOrElse(t.appId, Long.MinValue) >= t.version)
        throw new DuplicateTransactionException(t.appId, t.version)
    }

    val withSnap = meta.copy(
      snapshots = meta.snapshots + (newId.toString -> snap),
      maxSnapshotId = newId,
      manifestSummaries = meta.manifestSummaries ++ patch.manifestSummaries,
      lastUpdateTimeMs = now,
      txnVersions = patch.txn.fold(meta.txnVersions)(t =>
        meta.txnVersions + (t.appId -> t.version)),
      mvSourceSnapshotId = patch.sourceSnapshotId.orElse(meta.mvSourceSnapshotId),
      mvSourceSnapshotIds =
        if (patch.sourceSnapshotIds.isEmpty) meta.mvSourceSnapshotIds
        else meta.mvSourceSnapshotIds ++ patch.sourceSnapshotIds)
    val newMeta =
      if (branch == SnapshotRef.MainBranch) withSnap.copy(currentSnapshotId = newId)
      else withSnap.copy(refs = withSnap.refs +
        (branch -> SnapshotRef(branch, SnapshotRef.Branch, newId)))
    persist(metaTransform(newMeta))
    newId
  }

  /** Optimistic transaction: pin the branch head, run the (distributed,
    * lock-free) op, then under a short commit lock re-check the head and
    * commit (storage.py:545-596 semantics, hardened: the reference's
    * check-then-flip is racy between writers — storage.py:317-319 admits
    * single-writer; the exclusive-create lock file makes the final
    * check+flip mutually exclusive, so concurrent writers serialize
    * instead of silently losing commits).
    *
    * Conflict is adjudicated with Iceberg-style policies (beyond the
    * reference's single-winner-per-head):
    *
    *  - [[ConflictPolicy.Append]]: the patch only ADDS manifests — valid
    *    against any head; concurrent appends serialize under the lock
    *    and never abort.
    *  - [[ConflictPolicy.Rewrite]]: CoW rewrites of specific files
    *    (delete/update/compact/cluster) — valid iff every manifest the
    *    patch removes still exists in the CURRENT head
    *    (first-committer-wins on overlapping files; disjoint rewrites
    *    and concurrent appends commit side by side). Snapshot-isolation
    *    caveat: rows appended concurrently are not seen by the rewrite —
    *    the outcome equals the serial order rewrite-then-append.
    *  - [[ConflictPolicy.Strict]]: patch validity depends on the whole
    *    table state read at pin time (PK dup checks, key matching,
    *    whole-table overwrite) — any head movement invalidates it.
    *
    * An invalid patch aborts the attempt and `op` RE-RUNS from the new
    * head, up to `maxRetries` times (data files written by a failed
    * attempt are unreferenced and reaped by [[GcOps.garbageCollect]]);
    * retries exhausted → [[ConcurrentCommitException]]. */
  def transaction[T](
      branch: String = SnapshotRef.MainBranch,
      policy: ConflictPolicy = ConflictPolicy.Strict,
      maxRetries: Int = 3)(
      op: Long => (Option[Patch], T)): T =
    transactionWithCommittedId(branch, policy, maxRetries) { pinned =>
      val (patch, t) = op(pinned)
      (patch, (_: Long) => t)
    }

  /** Transaction whose RESULT is the snapshot id the commit actually
    * produced (under the lock), or the branch head at lock time when the
    * op yields no patch (no-op mutation). Callers must use this — never
    * precompute `maxSnapshotId + 1` inside op: under the Append/Rewrite
    * policies a racing writer can take that id first, and the precomputed
    * value would name the OTHER writer's snapshot. */
  def commitTransaction(
      branch: String = SnapshotRef.MainBranch,
      policy: ConflictPolicy = ConflictPolicy.Strict,
      maxRetries: Int = 3)(
      op: Long => Option[Patch]): Long =
    transactionWithCommittedId(branch, policy, maxRetries)(p => (op(p), identity[Long]))

  /** General form: `op(pinnedHead)` returns the patch plus a result
    * builder that receives the COMMITTED snapshot id (head at lock time
    * if the patch is None) — the only value of the new id that is correct
    * under concurrency. */
  def transactionWithCommittedId[T](
      branch: String = SnapshotRef.MainBranch,
      policy: ConflictPolicy = ConflictPolicy.Strict,
      maxRetries: Int = 3)(
      op: Long => (Option[Patch], Long => T)): T = {
    var attempt = 0
    while (true) {
      reload()
      val pinned = branchHead(branch)
      val (patch, mkResult) = op(pinned)
      try {
        var committedId = pinned
        withCommitLock {
          reload()
          val head = branchHead(branch)
          val valid = head == pinned || (policy match {
            case ConflictPolicy.Append => true
            case ConflictPolicy.Rewrite =>
              val mf = snapshotOrFail(head).manifestFiles
              patch.forall { p =>
                p.removedIndexManifests.forall(mf.indexManifestFiles.contains) &&
                  p.removedRecordManifests.forall(mf.recordManifestFiles.contains) && {
                    // merge-on-read vector edits: valid iff (a) no index
                    // manifest was removed since pin (a concurrent CoW/
                    // compact rewrite could have replaced a file this
                    // vector targets) and (b) the HEAD's vector for each
                    // touched file is exactly what the op observed and
                    // merged with — a concurrent MoR delete of the same
                    // file would otherwise have its rows silently
                    // dropped from the last-writer's merged vector.
                    p.dvAdded.isEmpty || {
                      val pinnedMf = snapshotOrFail(pinned).manifestFiles
                      val headDvs = deleteVectors(head)
                      pinnedMf.indexManifestFiles.forall(mf.indexManifestFiles.contains) &&
                        p.dvAdded.keys.forall(f =>
                          headDvs.get(f).flatMap(_.bitmapB64) ==
                            p.dvObserved.getOrElse(f, None))
                    }
                  } && {
                    // the INVERSE interleave: a CoW/maintenance rewrite
                    // (removes manifests) computed its survivors against
                    // the PINNED snapshot's vectors — if a concurrent
                    // MoR delete changed ANY vector since pin, the
                    // rewrite could resurrect its soft-deleted rows (the
                    // CoW-vs-CoW analogue aborts via the manifest check
                    // above; MoR removes no manifests, so it must be
                    // caught here). Comparing whole vector SETS is
                    // coarser than per-file but lock-cheap; an abort
                    // just re-runs the op from the fresh head.
                    p.removedIndexManifests.isEmpty ||
                      deleteVectors(pinned) == deleteVectors(head)
                  }
              }
            case ConflictPolicy.Strict => false
          })
          if (!valid)
            throw new ConcurrentCommitException(
              s"abort commit: branch $branch moved from snapshot $pinned to $head " +
                s"and the $policy patch no longer applies")
          committedId = patch.map(commit(_, branch)).getOrElse(head)
        }
        return mkResult(committedId)
      } catch {
        case _: ConcurrentCommitException if attempt < maxRetries => attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private val lockPath = new Path(rootPath, s"${StoragePaths.MetadataDir}/commit.lock")

  /** Steal a lock only after it has sat untouched this long. The locked
    * critical section is metadata-only IO (reload + commit, milliseconds)
    * — the threshold is orders of magnitude above worst case, so a steal
    * means the holder died, not that it is slow. */
  private val LockStaleMs = 300000L

  private def readLockToken(): Option[String] =
    try {
      val in = fs.open(lockPath)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8)) finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Exclusive-create lock file carrying an OWNERSHIP TOKEN. Local scheme
    * uses nio `createFile` (true O_EXCL — Hadoop's LocalFileSystem
    * `create(overwrite=false)` is check-then-create and NOT atomic);
    * HDFS-like schemes use create-no-overwrite, atomic at the namenode.
    *
    * Stale locks (crashed writer) are stolen after [[LockStaleMs]] via
    * RENAME — only one concurrent stealer's rename succeeds, so two
    * stealers never both proceed. Release deletes the lock only while it
    * still holds our token: a holder that somehow outlived the stale
    * window cannot delete the stealer's lock out from under it. */
  private[core] def withCommitLock[A](body: => A): A = {
    val isLocal = Option(lockPath.toUri.getScheme).forall(_ == "file")
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + 30000L
    var acquired = false
    while (!acquired) {
      try {
        if (isLocal) {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(lockPath.toUri.getPath),
            token.getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
        } else {
          val out = fs.create(lockPath, false)
          out.write(token.getBytes(StandardCharsets.UTF_8))
          out.close()
        }
        acquired = true
      } catch {
        case _: java.io.IOException => // includes FileAlreadyExistsException
          try {
            val age = System.currentTimeMillis() - fs.getFileStatus(lockPath).getModificationTime
            if (age > LockStaleMs) {
              // rename-to-steal: at most one stealer wins the rename; a
              // holder releasing concurrently just makes the rename fail
              val stale = new Path(lockPath.getParent,
                lockPath.getName + ".stale-" + java.util.UUID.randomUUID())
              if (fs.rename(lockPath, stale)) fs.delete(stale, false)
            }
          } catch { case _: java.io.IOException => /* lock vanished: retry */ }
          if (System.currentTimeMillis() > deadline)
            throw new ConcurrentCommitException(s"commit lock timeout at $lockPath")
          Thread.sleep(20L)
      }
    }
    try body finally {
      // ownership check: delete only OUR lock (ADVICE r1 — without it a
      // slow holder whose lock was stolen would delete the stealer's)
      if (readLockToken().contains(token)) fs.delete(lockPath, false)
    }
  }

  def changeLog(snapshotId: Long): Option[ChangeLog] =
    snapshotOrFail(snapshotId).changeLogFile.map(f => MetadataJson.readChangeLog(readString(f)))

  /** The consolidated merge-on-read delete vectors of a snapshot:
    * data-file relative path → dead-row bitmap entry. Empty for
    * copy-on-write-only tables (the common case — one metadata field
    * check, no IO). DV files are immutable, so loads cache process-wide
    * by absolute path. */
  def deleteVectors(snapshotId: Long): Map[String, RowBitmap] =
    snapshotOrFail(snapshotId).deleteVectorFile match {
      case None => Map.empty
      case Some(f) => Storage.dvCacheGet(absolute(f), () =>
        MetadataJson.readDeleteVectors(readString(f))
          .vectors.map(v => v.file -> v).toMap)
    }

  /** The snapshot committed under exactly the exactly-once tag
    * (appId, version), if any — lets a replaying writer read the
    * changelog of ITS OWN earlier commit (what that batch actually
    * added) instead of approximating from the redelivered batch.
    * Metadata-plane scan over the snapshot map; None when the tagged
    * commit never happened (e.g. the batch had nothing to append) or
    * predates the per-snapshot tag field. */
  def snapshotIdForTxn(appId: String, version: Long): Option[Long] =
    meta.snapshots.values.collectFirst {
      case s if s.txn.contains(TxnTag(appId, version)) => s.snapshotId
    }

  /** Walk parent pointers from end back to start, exclusive of start
    * (change_data.py:59-84): returns (start, end] in increasing order.
    * Throws [[ExpiredHistoryException]] iff the walk fails AND `startId`
    * no longer exists in metadata (snapshot expiry removed it) — the
    * rebuild-eligible condition; any other failure is a caller bug and
    * throws IllegalArgumentException. */
  def orderedSnapshotIds(startId: Long, endId: Long): Seq[Long] = {
    if (startId == endId) return Nil
    def walkFailed(): Nothing =
      if (meta.snapshot(startId).isEmpty)
        throw new ExpiredHistoryException(
          s"snapshot $startId has been expired from $location — " +
            s"the change walk to $endId is impossible")
      else throw new IllegalArgumentException(
        s"snapshot $startId is not an ancestor of $endId")
    var ids = List.empty[Long]
    var cur = endId
    while (cur != startId) {
      val s = meta.snapshot(cur).getOrElse(walkFailed())
      ids = cur :: ids
      cur = s.parentSnapshotId.getOrElse(walkFailed())
    }
    ids
  }
}

object Storage {

  /** Process-wide LRU of parsed delete-vector files (immutable once
    * written, like manifests) — a bench/driver process re-loads Storage
    * handles per query and must not re-parse the same DV JSON each time.
    *
    * Weighted by RETAINED BYTES, not entry count (ADVICE r11): each
    * entry is a table's full consolidated vector map, so at the
    * many-table / 100 TB scale an entry-count bound lets the driver
    * heap grow without limit. A map too large to ever fit under the cap
    * is served uncached rather than evicting everything else. */
  private val DvCacheMaxBytes = 256L * 1024 * 1024
  private val dvCache =
    new java.util.LinkedHashMap[String, (Map[String, RowBitmap], Long)](16, 0.75f, true)
  private var dvCacheBytes = 0L
  private object dvCacheLock

  /** Approximate retained heap of one parsed vector map: dominated by
    * the base64 bitmap strings (2 bytes/char) plus per-entry object
    * overhead. */
  private def dvWeight(m: Map[String, RowBitmap]): Long =
    64L + m.iterator.map { case (k, v) =>
      2L * k.length + 2L * v.file.length +
        v.bitmapB64.map(2L * _.length).getOrElse(0L) + 96L
    }.sum

  private[core] def dvCacheGet(k: String, load: () => Map[String, RowBitmap]) =
    dvCacheLock.synchronized {
      val hit = dvCache.get(k)
      if (hit != null) hit._1
      else {
        val v = load()
        val w = dvWeight(v)
        if (w < DvCacheMaxBytes) {
          val it = dvCache.entrySet().iterator()
          while (dvCacheBytes + w > DvCacheMaxBytes && it.hasNext) {
            dvCacheBytes -= it.next().getValue._2
            it.remove()
          }
          dvCache.put(k, (v, w))
          dvCacheBytes += w
        }
        v
      }
    }

  /** Visible for the cache-bound spec. */
  private[graft] def dvCacheRetainedBytes: Long = dvCacheLock.synchronized(dvCacheBytes)
  private[graft] def dvCacheEntryCount: Int = dvCacheLock.synchronized(dvCache.size())

  def create(
      location: String,
      schema: StructType,
      primaryKeys: Seq[String],
      recordFields: Seq[String] = Nil,
      tableType: String = TableType.Dataset,
      logicalPlan: Option[String] = None,
      logicalPlanSubstrait: Option[String] = None,
      statsFields: Seq[String] = Nil,
      bloomColumns: Seq[String] = Nil,
      bucketColumns: Seq[String] = Nil,
      numBuckets: Int = 0,
      bucketCounts: Seq[Int] = Nil,
      writeClusterBy: Seq[String] = Nil,
      conf: Configuration = new Configuration()): Storage = {
    SchemaValidation.validate(schema, primaryKeys, recordFields)
    if (bucketCounts.nonEmpty) {
      require(bucketCounts.length == bucketColumns.length,
        s"bucketCounts (${bucketCounts.length}) must align with " +
          s"bucketColumns (${bucketColumns.length})")
      require(bucketCounts.forall(_ >= 1), s"bucket counts must be >= 1: $bucketCounts")
      val product = bucketCounts.map(_.toLong).product
      require(numBuckets == 0 || numBuckets.toLong == product,
        s"numBuckets ($numBuckets) must equal the bucketCounts product ($product)")
      require(product <= 100000, s"bucketCounts product $product exceeds 100000")
    }
    val effectiveNumBuckets =
      if (bucketCounts.nonEmpty) bucketCounts.map(_.toLong).product.toInt else numBuckets
    bloomColumns.foreach { c =>
      val fld = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"bloom column $c not in schema (top-level only)"))
      require(ManifestIO.statsEligible(fld.dataType),
        s"bloom column $c has non-bloom-eligible type ${fld.dataType}")
      require(!recordFields.contains(c), s"record field $c cannot carry a bloom filter")
    }
    require(bucketColumns.isEmpty == (effectiveNumBuckets == 0),
      "bucketColumns and numBuckets must be set together")
    require(effectiveNumBuckets >= 0 && effectiveNumBuckets <= 100000,
      s"bad numBuckets $effectiveNumBuckets")
    bucketColumns.foreach { c =>
      require(schema.fieldNames.contains(c), s"bucket column $c not in schema")
      require(!recordFields.contains(c), s"record field $c cannot be a bucket column")
    }
    statsFields.foreach { f =>
      // dotted names address struct members ("meta.price") — manifest
      // stats and pruning key them by the same physical dotted path
      val fld = ManifestIO.fieldAtPath(schema, f).getOrElse(
        throw new IllegalArgumentException(s"stats field $f not in schema"))
      require(ManifestIO.statsEligible(fld.dataType),
        s"stats field $f has non-stats-eligible type ${fld.dataType}")
      require(!recordFields.contains(f), s"record field $f cannot carry stats")
    }
    require(writeClusterBy.isEmpty || effectiveNumBuckets == 0,
      "write_cluster_by and bucketing are exclusive: a bucketed write's " +
        "partitioning IS the bucket layout")
    writeClusterBy.foreach { c =>
      require(schema.fieldNames.contains(c), s"write-cluster column $c not in schema")
      require(!recordFields.contains(c), s"record field $c cannot write-cluster")
    }
    val withIds = FieldIds.assign(schema)
    val root = new Path(location)
    val fs = root.getFileSystem(conf)
    fs.setWriteChecksum(false)
    fs.setVerifyChecksum(false)
    require(!fs.exists(new Path(root, StoragePaths.EntryPointFile)),
      s"table already exists at $location")
    fs.mkdirs(new Path(root, StoragePaths.ChangesDir))
    fs.mkdirs(new Path(root, StoragePaths.RecordDataDir))

    val now = System.currentTimeMillis()
    val initial = Snapshot(0L, None, now, ManifestFiles(), StorageStatistics(), None)
    val meta = StorageMetadata(
      createTimeMs = now, lastUpdateTimeMs = now, tableType = tableType,
      schemaJson = withIds.json,
      primaryKeys = primaryKeys.toList, recordFields = recordFields.toList,
      statsFields = statsFields.toList, bloomColumns = bloomColumns.toList,
      bucketColumns = bucketColumns.toList, numBuckets = effectiveNumBuckets,
      bucketCounts = bucketCounts.toList,
      writeClusterBy = writeClusterBy.toList,
      currentSnapshotId = 0L, maxSnapshotId = 0L,
      snapshots = Map("0" -> initial), logicalPlan = logicalPlan,
      logicalPlanSubstrait = logicalPlanSubstrait)

    val metaFile = StoragePaths.newMetadataFile()
    writeTo(fs, root, metaFile, MetadataJson.write(meta))
    // entrypoint birth is EXCLUSIVE: the up-front exists() is
    // check-then-act, so two concurrent creators could both pass it and
    // the second would silently clobber the first's table. Local scheme
    // uses nio CREATE_NEW (true O_EXCL — LocalFileSystem's
    // create(overwrite=false) is itself check-then-create); remote
    // schemes get create(overwrite=false), atomic at the namenode.
    val ep = new Path(root, StoragePaths.EntryPointFile)
    val epBytes = MetadataJson.write(EntryPoint(metaFile)).getBytes(StandardCharsets.UTF_8)
    try {
      if (Option(ep.toUri.getScheme).forall(_ == "file"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(ep.toUri.getPath), epBytes,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
      else {
        val out = fs.create(ep, false)
        try out.write(epBytes) finally out.close()
      }
    } catch {
      // only a genuine exists-collision means "lost the race" — other
      // IOExceptions (transient IO, disk full) must surface as what
      // they are, not be misdiagnosed as an existing table
      case e @ (_: java.nio.file.FileAlreadyExistsException |
          _: org.apache.hadoop.fs.FileAlreadyExistsException) =>
        throw new IllegalStateException(
          s"table already exists at $location (lost a concurrent create race)", e)
    }
    new Storage(location, conf)
  }

  def load(location: String, conf: Configuration = new Configuration()): Storage =
    new Storage(location, conf)

  def exists(location: String, conf: Configuration = new Configuration()): Boolean = {
    val root = new Path(location)
    root.getFileSystem(conf).exists(new Path(root, StoragePaths.EntryPointFile))
  }

  private def writeTo(fs: FileSystem, root: Path, rel: String, content: String): Unit = {
    val out = fs.create(new Path(root, rel), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
