package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manifest-based snapshot table — the catalog commit protocol the
  * plain-parquet operators ([[DedupAppend]], [[Maintenance.appendCycle]],
  * [[TableSwap]]) could only document, made real. The reference's store is
  * a transactional warehouse (`INSERT … ON CONFLICT`, reference
  * dags/etl.py:70-75); at 100 TB the equivalent substrate is a
  * manifest-committed file set (the Iceberg/Delta shape), and this is that
  * substrate in ~one file:
  *
  *   - A table VERSION is an immutable manifest: the list of data files
  *     (with row counts, byte sizes, and per-file column min/max stats)
  *     that make up the table at that version. Data files are never
  *     mutated or renamed after commit.
  *   - The COMMIT POINT is one atomic `create(commit-N, false)` marker —
  *     the same fail-if-exists primitive [[Lease]] uses. A version exists
  *     iff its marker does; a crash anywhere before the marker leaves only
  *     unreferenced garbage (reclaimed by [[vacuum]]), never a corrupt
  *     table.
  *   - READERS ARE LOCK-FREE and snapshot-isolated: resolve the highest
  *     commit marker, read that manifest, read its files — all immutable.
  *     A concurrent writer commits N+1 without disturbing any reader of N.
  *     This is the property the directory-swap operators could not give
  *     (their readers race the rename window); here old versions stay
  *     readable until vacuum ages them out (time travel).
  *   - WRITERS serialize on the table [[Lease]]; the commit marker
  *     additionally refuses a lost-update at the commit point itself, so
  *     even a lease-bypassing writer cannot silently clobber a version.
  *
  * Row-level operations are COPY-ON-WRITE at file granularity: delete and
  * update rewrite only the files that contain matching rows and carry
  * every other file forward BY REFERENCE into the new manifest. Touched
  * files are found by one distributed scan with the predicate pushed into
  * the parquet reader (row-group stats skip non-matching files cheaply),
  * optionally pre-pruned by the manifest's own min/max stats so the scan
  * never opens files outside the predicate's range. At 100 TB a
  * key-ranged delete touches the handful of files whose stats overlap the
  * range — not the table.
  *
  * Per-file stats double as a ZONE MAP: [[pruned]] intersects a range
  * predicate with each file's [min, max] driver-side (manifest-sized
  * work, no I/O) and returns only the overlapping files, which is what
  * makes range scans on a range-clustered table open a few files instead
  * of all of them. Stats are computed from one column-pruned read of the
  * newly written files only (never the whole table), and a file whose
  * stats column is all-null simply carries no interval — it is always
  * kept, never wrongly pruned.
  *
  * Layout under the table root (all manifest paths RELATIVE to the root,
  * so a table survives relocation):
  * {{{
  *   data/c<N>/part-*.parquet   files written by commit N
  *   _snapshots/v<N>/           manifest parquet (written as tmp-<N>, renamed)
  *   _snapshots/commit-<N>      atomic commit marker (existence = committed)
  *   _snapshots/schema          table schema DDL (for empty-version reads)
  *   _snapshots/statscols       stats column list, fixed at create
  * }}}
  */
object SnapshotStore {

  /** Canonical-string interval for one column of one file. `kind` selects
    * the comparison: `num` parses both sides as BigDecimal; `str` compares
    * raw (dates/timestamps are encoded fixed-width so lexicographic order
    * IS temporal order). */
  final case class ColStats(lo: String, hi: String, kind: String)

  /** One data file of one version. `path` is root-relative. */
  final case class FileEntry(path: String, rows: Long, bytes: Long,
                             stats: Map[String, ColStats])

  /** Caller promise that `pred` can only match rows where `col` falls in
    * `[lo, hi]` (canonical encoding) — lets delete/update skip reading
    * files outside the range via the manifest alone. */
  final case class RangeHint(col: String, lo: String, hi: String)

  private def snapDir(root: Path) = new Path(root, "_snapshots")
  private def manifestDir(root: Path, v: Long) = new Path(snapDir(root), s"v$v")
  private def markerPath(root: Path, v: Long) = new Path(snapDir(root), s"commit-$v")

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeSmall(fs: FileSystem, p: Path, s: String,
                         overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // ---- version resolution (reader side, lock-free) ------------------------

  /** Committed versions, ascending (existence of the commit marker IS the
    * commit — a manifest dir without its marker is a crashed committer's
    * garbage and invisible here). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val sd = snapDir(root)
    if (!fs.exists(sd)) return Nil
    fs.listStatus(sd).iterator.map(_.getPath.getName)
      .filter(_.startsWith("commit-"))
      .map(_.stripPrefix("commit-").toLong).toSeq.sorted
  }

  def currentVersion(spark: SparkSession, path: String): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed snapshot at $path")
    vs.last
  }

  /** The manifest of version `v`: file list with stats, root-relative. */
  def entries(spark: SparkSession, path: String, v: Long): Seq[FileEntry] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(fs.exists(markerPath(root, v)), s"version $v not committed at $path")
    implicit val enc = Encoders.product[FileEntry]
    spark.read.parquet(manifestDir(root, v).toString).as[FileEntry]
      .collect().toSeq.sortBy(_.path)
  }

  /** The table schema is the HIGHEST-numbered schema file (`schema` = the
    * creation schema, `schema-<k>` = the k-th evolution). Each evolution
    * is a new fail-if-exists file — never an overwrite of the previous
    * one — so a crash mid-evolution leaves the old schema intact and the
    * history readable. */
  private def schemaFiles(fs: FileSystem, root: Path): Seq[(Int, Path)] = {
    val sd = snapDir(root)
    fs.listStatus(sd).iterator.map(_.getPath).flatMap { p =>
      p.getName match {
        case "schema" => Some(0 -> p)
        case n if n.startsWith("schema-") =>
          n.stripPrefix("schema-").toIntOption.map(_ -> p)
        case _ => None
      }
    }.toSeq.sortBy(_._1)
  }

  private def tableSchema(fs: FileSystem, root: Path): StructType =
    StructType.fromDDL(readSmall(fs, schemaFiles(fs, root).last._2))

  /** Schema evolution: ADD COLUMN, zero-rewrite. No data file is touched
    * — files written before the evolution simply lack the column, and
    * every read resolves them against the latest schema, yielding NULL
    * (merge-on-read backfill). Time-travel reads also render the latest
    * schema (the column reads NULL before its data existed) — the
    * documented trade of not storing a schema per version. The new
    * schema file is created fail-if-exists under the table lease, so
    * concurrent evolutions cannot interleave and a crash leaves the
    * previous schema authoritative. At 100 TB this is the point: adding
    * a column costs one small file, not a table rewrite. */
  def evolveAddColumn(spark: SparkSession, path: String,
                      colName: String, ddlType: String): Unit = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot schema evolution") {
      val cur = tableSchema(fs, root)
      require(!cur.fieldNames.contains(colName),
        s"column $colName already exists in table at $path")
      val next = StructType(cur.fields :+
        StructField(colName, org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(ddlType), nullable = true))
      val k = schemaFiles(fs, root).last._1 + 1
      val out = fs.create(new Path(snapDir(root), s"schema-$k"), false)
      try out.write(next.toDDL.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private def statsCols(fs: FileSystem, root: Path): Seq[String] = {
    val p = new Path(snapDir(root), "statscols")
    if (!fs.exists(p)) Nil
    else readSmall(fs, p).split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Table history (DESCRIBE HISTORY): one row per committed version with
    * the operation recorded in its commit marker and its parent version —
    * the audit trail of the maintenance lifecycle, read lock-free from the
    * markers alone (manifest-sized driver work, no data I/O). */
  def history(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val rows = versions(spark, path).map { v =>
      val body = readSmall(fs, markerPath(root, v))
      val fields = body.split("\\s+").iterator
        .flatMap(t => t.split("=", 2) match {
          case Array(k, value) => Some(k -> value); case _ => None
        }).toMap
      (v, fields.getOrElse("op", "unknown"),
        fields.get("parent").flatMap(_.toLongOption).getOrElse(v - 1))
    }
    import spark.implicits._
    rows.toDF("version", "op", "parent")
  }

  /** Read a version by its manifest (absolute paths resolved against the
    * root — the table is relocatable). An empty manifest (delete-all)
    * reads as an empty frame with the recorded schema. */
  def readVersion(spark: SparkSession, path: String, v: Long): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val es = entries(spark, path, v)
    if (es.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tableSchema(fs, root))
    else spark.read.schema(tableSchema(fs, root))
      .parquet(es.map(e => new Path(root, e.path).toString): _*)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, currentVersion(spark, path))

  /** The PLANNER-INTEGRATED read: a DataFrame whose scan resolves its
    * files through [[graft.plans.SnapshotFileIndex]], so any plain
    * `.filter` on a stats column prunes files via the manifest's zone map
    * automatically — no hint, no special scan API; and the listing is
    * synthesized from the manifest (zero filesystem RPCs at planning).
    * This is the read a query layer should hand out by default; [[read]]
    * remains the dependency-light explicit-file-list form. */
  def readRelation(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val v = currentVersion(spark, path)
    val idx = new graft.plans.SnapshotFileIndex(
      fs.makeQualified(root), entries(spark, path, v), tableSchema(fs, root))
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = idx,
      partitionSchema = StructType(Nil),
      dataSchema = tableSchema(fs, root),
      bucketSpec = None,
      fileFormat = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(rel)
  }

  // ---- zone-map pruning ----------------------------------------------------

  private def cmp(kind: String, a: String, b: String): Int =
    if (kind == "num") BigDecimal(a).compare(BigDecimal(b)) else a.compareTo(b)

  /** Manifest entries whose `[lo, hi]` interval on `col` overlaps the query
    * range — driver-side, manifest-sized, zero I/O. Files with no recorded
    * interval on `col` (all-null, or `col` not a stats column) are KEPT:
    * pruning may only ever drop files proven disjoint. */
  def pruned(es: Seq[FileEntry], colName: String,
             lo: String, hi: String): Seq[FileEntry] =
    es.filter { e =>
      e.stats.get(colName) match {
        case Some(s) => cmp(s.kind, s.hi, lo) >= 0 && cmp(s.kind, s.lo, hi) <= 0
        case None => true
      }
    }

  /** Read just `es`'s files of the current table (the scan half of a
    * zone-map-pruned range query; callers re-apply the exact predicate). */
  def readFiles(spark: SparkSession, path: String,
                es: Seq[FileEntry]): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    if (es.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tableSchema(fs, root))
    else spark.read.schema(tableSchema(fs, root))
      .parquet(es.map(e => new Path(root, e.path).toString): _*)
  }

  // ---- stats + manifest construction ---------------------------------------

  /** (kind, encoder) for a stats column: numeric kinds get `num`
    * (BigDecimal-parsed canonical strings); date/timestamp are encoded
    * fixed-width ISO so `str` lexicographic order is temporal order. */
  private def statsEncoder(dt: DataType): Option[(String, Column => Column)] = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         _: DecimalType => Some(("num", c => c.cast(StringType)))
    case StringType => Some(("str", identity[Column] _))
    case DateType => Some(("str", c => c.cast(StringType)))
    case TimestampType | TimestampNTZType =>
      Some(("str", c => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")))
    case _ => None
  }

  /** Root-relative spelling of an absolute file reference. Compares on the
    * URI *path* component: the same file is rendered `file:///x` by Spark's
    * `_metadata.file_path` and `file:/x` by Hadoop's `makeQualified`, so a
    * raw string prefix-strip would silently mismatch the two sides. */
  private def relOf(fs: FileSystem, root: Path, abs: String): String = {
    val rootPath = fs.makeQualified(root).toUri.getPath
    val absPath = new Path(abs).toUri.getPath
    require(absPath.startsWith(rootPath + "/"),
      s"data file $abs outside table root $rootPath")
    absPath.stripPrefix(rootPath + "/")
  }

  /** Build manifest entries for freshly written files: one listing pass for
    * bytes plus ONE column-pruned scan of only the new files for row counts
    * and min/max per stats column (the whole-table is never re-read). */
  private def newEntries(spark: SparkSession, root: Path, fs: FileSystem,
                         commitDataDir: Path, cols: Seq[String]): Seq[FileEntry] = {
    def rel(abs: String): String = relOf(fs, root, abs)
    if (!fs.exists(commitDataDir)) return Nil
    val files = fs.listStatus(commitDataDir).iterator
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(f => rel(fs.makeQualified(f.getPath).toString) -> f.getLen)
      .toMap
    if (files.isEmpty) return Nil
    val df = spark.read.parquet(
      files.keysIterator.map(p => new Path(root, p).toString).toSeq: _*)
    val kinds = cols.flatMap(c =>
      statsEncoder(df.schema(c).dataType).map { case (k, enc) => (c, k, enc) })
    val aggs = count(lit(1)).as("__n") +: kinds.flatMap { case (c, _, enc) =>
      Seq(enc(min(col(c))).as(s"__lo_$c"), enc(max(col(c))).as(s"__hi_$c"))
    }
    val statRows = df.groupBy(col("_metadata.file_path").as("__fp"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val byFile = statRows.map(r => rel(r.getString(0)) -> r).toMap
    files.toSeq.sortBy(_._1).flatMap { case (p, bytes) =>
      byFile.get(p) match {
        case None => None // zero-row part file: dead weight, never referenced
        case Some(r) =>
          val st = kinds.flatMap { case (c, kind, _) =>
            val lo = r.getAs[String](s"__lo_$c")
            val hi = r.getAs[String](s"__hi_$c")
            if (lo == null || hi == null) None // all-null column: no interval
            else Some(c -> ColStats(lo, hi, kind))
          }.toMap
          Some(FileEntry(p, r.getAs[Long]("__n"), bytes, st))
      }
    }
  }

  /** Write `df`'s rows as version `v`'s data files. Returns their entries. */
  private def writeData(spark: SparkSession, root: Path, fs: FileSystem, v: Long,
                        df: DataFrame, cols: Seq[String]): Seq[FileEntry] = {
    val dir = new Path(root, s"data/c$v")
    df.write.mode("overwrite").parquet(dir.toString)
    newEntries(spark, root, fs, dir, cols)
  }

  /** The atomic commit: manifest parquet to a tmp sibling, rename to
    * `v<N>`, then the fail-if-exists marker. The marker is the ONLY commit
    * point — a conflicting committer (marker exists) loses cleanly and its
    * manifest/data garbage awaits vacuum; the table is never ambiguous. */
  private def commit(spark: SparkSession, root: Path, fs: FileSystem, v: Long,
                     es: Seq[FileEntry], op: String): Long = {
    val tmp = new Path(snapDir(root), s"tmp-$v-${java.util.UUID.randomUUID()}")
    implicit val enc = Encoders.product[FileEntry]
    spark.createDataset(es).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val dst = manifestDir(root, v)
    def conflict(): Nothing = {
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"snapshot commit conflict at $root: version $v already committed " +
          "(lost update refused — retry from the new current version)")
    }
    if (fs.exists(markerPath(root, v)) || fs.exists(dst)) conflict()
    if (!fs.rename(tmp, dst)) conflict()
    val out =
      try fs.create(markerPath(root, v), false)
      catch { case scala.util.control.NonFatal(_) => fs.delete(dst, true); conflict() }
    try out.write(s"op=$op parent=${v - 1} files=${es.size}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    v
  }

  // ---- write operations (all serialize on the table Lease) -----------------

  /** Create the table as version 1. `clusterBy` range-partitions the rows
    * across `numFiles` files sorted within each — the layout that makes the
    * zone map TIGHT on those columns (disjoint per-file ranges), so range
    * scans and ranged deletes open O(range/table) files, not all of them. */
  def create(spark: SparkSession, df: DataFrame, path: String,
             statsColumns: Seq[String] = Nil, clusterBy: Seq[String] = Nil,
             numFiles: Int = 0, owner: Option[String] = None): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    statsColumns.foreach(c => require(
      statsEncoder(df.schema(c).dataType).isDefined,
      s"stats column $c: unsupported type ${df.schema(c).dataType}"))
    // owner: a streaming bootstrap's crash-replay re-acquires its own
    // stale lease (create is safely re-runnable until its commit marker
    // lands — data/c1 is overwritten, the marker is the only commit point)
    Lease.withLease(fs, root, "snapshot create", owner) {
      require(versions(spark, path).isEmpty, s"snapshot table already exists at $path")
      fs.mkdirs(snapDir(root))
      writeSmall(fs, new Path(snapDir(root), "schema"), df.schema.toDDL, overwrite = true)
      writeSmall(fs, new Path(snapDir(root), "statscols"),
        statsColumns.mkString("\n"), overwrite = true)
      val shaped =
        if (clusterBy.nonEmpty && numFiles > 0)
          df.repartitionByRange(numFiles, clusterBy.map(col): _*)
            .sortWithinPartitions(clusterBy.map(col): _*)
        else if (numFiles > 0) df.repartition(numFiles)
        else df
      commit(spark, root, fs, 1L,
        writeData(spark, root, fs, 1L, shaped, statsColumns), "create")
    }
  }

  /** Multiset append: new files only; every current file carried forward by
    * reference (manifest-sized work + the new bytes — never a rewrite). */
  def append(spark: SparkSession, df: DataFrame, path: String): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot append") {
      val cur = currentVersion(spark, path)
      val v = cur + 1
      val newEs = writeData(spark, root, fs, v, df, statsCols(fs, root))
      if (newEs.isEmpty) { // empty batch: a true no-op, not an empty version
        fs.delete(new Path(root, s"data/c$v"), true)
        cur
      } else commit(spark, root, fs, v, entries(spark, path, cur) ++ newEs, "append")
    }
  }

  /** Keyed idempotent append (the reference's ON CONFLICT DO NOTHING on the
    * snapshot substrate): in-batch survivor per key by deterministic total
    * order, then anti-join against the CURRENT VERSION's keys (column-pruned
    * scan). Re-delivered batches are no-ops; unlike [[DedupAppend]] the
    * commit is atomic, so a crash mid-append never leaves half a batch
    * visible. */
  def appendDedup(spark: SparkSession, df: DataFrame, path: String,
                  keys: Seq[String], tieBreak: Seq[String],
                  owner: Option[String] = None): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    // streaming maintainers pass their checkpoint location as `owner` so a
    // crashed lineage's restart re-acquires its own stale lease; the
    // replayed batch is already a version-preserving no-op below
    Lease.withLease(fs, root, "snapshot dedup append", owner) {
      val cur = currentVersion(spark, path)
      val inBatch = DedupAppend.survivors(df, keys, tieBreak)
      val fresh = inBatch.join(
        readVersion(spark, path, cur).select(keys.map(col): _*), keys, "left_anti")
      val v = cur + 1
      val newEs = writeData(spark, root, fs, v, fresh, statsCols(fs, root))
      if (newEs.isEmpty) { // fully re-delivered batch: idempotent no-op
        fs.delete(new Path(root, s"data/c$v"), true)
        cur
      } else commit(spark, root, fs, v,
        entries(spark, path, cur) ++ newEs, "append_dedup")
    }
  }

  /** Which current files contain rows matching `pred`: manifest-range
    * pre-prune (when hinted), then ONE distributed scan with the predicate
    * pushed to the reader. Returns (touched, untouched-by-reference). */
  private def splitTouched(spark: SparkSession, path: String, root: Path,
                           es: Seq[FileEntry], pred: Column,
                           hint: Option[RangeHint]): (Seq[FileEntry], Seq[FileEntry]) = {
    val candidates = hint match {
      case Some(h) => pruned(es, h.col, h.lo, h.hi)
      case None => es
    }
    val candSet = candidates.map(_.path).toSet
    val carried0 = es.filterNot(e => candSet.contains(e.path))
    if (candidates.isEmpty) return (Nil, es)
    val fs = fsOf(spark, root)
    val touchedAbs = readFiles(spark, path, candidates)
      .filter(pred <=> lit(true))
      .select(col("_metadata.file_path")).distinct().collect()
      .map(r => relOf(fs, root, r.getString(0))).toSet
    val (touched, clean) = candidates.partition(e => touchedAbs.contains(e.path))
    (touched, carried0 ++ clean)
  }

  /** Copy-on-write DELETE: rewrite only the files containing matching rows
    * (with the matches dropped; null predicate keeps the row, SQL-style),
    * carry every other file by reference. A predicate matching nothing
    * commits nothing and returns the current version unchanged. */
  def deleteWhere(spark: SparkSession, path: String, pred: Column,
                  hint: Option[RangeHint] = None): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot delete") {
      val cur = currentVersion(spark, path)
      val es = entries(spark, path, cur)
      val (touched, carried) = splitTouched(spark, path, root, es, pred, hint)
      if (touched.isEmpty) cur
      else {
        val v = cur + 1
        val kept = readFiles(spark, path, touched).filter(!(pred <=> lit(true)))
        commit(spark, root, fs, v,
          carried ++ writeData(spark, root, fs, v, kept, statsCols(fs, root)),
          "delete")
      }
    }
  }

  /** Copy-on-write UPDATE: each assigned column becomes
    * `CASE WHEN pred THEN expr ELSE old END` in the rewritten (touched)
    * files only; untouched files carry by reference. Row count and schema
    * are invariant by construction. */
  def updateWhere(spark: SparkSession, path: String, pred: Column,
                  set: Map[String, Column],
                  hint: Option[RangeHint] = None): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot update") {
      val cur = currentVersion(spark, path)
      val schema = tableSchema(fs, root)
      set.keys.foreach(c => require(schema.fieldNames.contains(c),
        s"update of unknown column $c"))
      val es = entries(spark, path, cur)
      val (touched, carried) = splitTouched(spark, path, root, es, pred, hint)
      if (touched.isEmpty) cur
      else {
        val v = cur + 1
        val updated = readFiles(spark, path, touched).select(
          schema.fieldNames.toSeq.map { c =>
            set.get(c) match {
              case Some(e) =>
                when(pred <=> lit(true), e.cast(schema(c).dataType)).otherwise(col(c)).as(c)
              case None => col(c)
            }
          }: _*)
        commit(spark, root, fs, v,
          carried ++ writeData(spark, root, fs, v, updated, statsCols(fs, root)),
          "update")
      }
    }
  }

  /** MERGE (upsert): update matched keys to the batch's row, insert
    * unmatched keys — the reference's `ON CONFLICT DO NOTHING` upgraded to
    * `DO UPDATE`, in ONE atomic commit. Copy-on-write at file granularity:
    * the files containing matched keys are found by one semi-join-shaped
    * scan (batch keys broadcast when small), rewritten with the matched
    * rows REPLACED by the batch's version; every other file carries by
    * reference; unmatched batch rows land as new files. A crash anywhere
    * before the commit marker leaves the previous version intact — there
    * is no window where updates are visible without their inserts (the
    * failure mode of the two-step delete+append spelling on plain
    * parquet). In-batch duplicates collapse to one row per key by the
    * same deterministic total order as [[DedupAppend]].
    *
    * At 100 TB: merge cost = (files holding matched keys) + (batch
    * bytes); a key-range-clustered table with a ranged batch touches
    * O(range) files. Each file's rewrite is `anti-join keys, union batch
    * slice` — shuffle on the key only. `hint`, when given, must bound the
    * stats-column value of every batch key THAT MAY ALREADY EXIST in the
    * table (not a predicate's range): a matched key outside the hinted
    * range would be silently re-inserted as a duplicate. Keys that cannot
    * match (e.g. inserts minted past the table's max) need not be covered
    * — excluding them is exactly what keeps a small-update+new-inserts
    * merge pruned to the update range's files. */
  def merge(spark: SparkSession, batch: DataFrame, path: String,
            keys: Seq[String], tieBreak: Seq[String],
            hint: Option[RangeHint] = None,
            owner: Option[String] = None): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot merge", owner) {
      val cur = currentVersion(spark, path)
      val es = entries(spark, path, cur)
      val schema = tableSchema(fs, root)
      require(batch.schema.fieldNames.sorted.sameElements(schema.fieldNames.sorted),
        s"merge batch schema ${batch.schema.fieldNames.mkString(",")} != table " +
          s"schema ${schema.fieldNames.mkString(",")}")
      val one = DedupAppend.survivors(
        batch.select(schema.fieldNames.toSeq.map(col): _*), keys, tieBreak)
        .localCheckpoint(true) // read 3×: touched-file probe, replace, anti
      // files holding matched keys: manifest pre-prune, then one scan
      // filtered by a semi join against the (typically small) batch keys
      val candidates = hint match {
        case Some(h) => pruned(es, h.col, h.lo, h.hi)
        case None => es
      }
      val candSet = candidates.map(_.path).toSet
      val carried0 = es.filterNot(e => candSet.contains(e.path))
      val touchedSet: Set[String] =
        if (candidates.isEmpty) Set.empty
        else readFiles(spark, path, candidates)
          // _metadata resolves only on the scan itself — materialize it
          // before the join or the hidden column is gone
          .select(col("_metadata.file_path").as("__fp") +: keys.map(col): _*)
          .join(broadcast(one.select(keys.map(col): _*)), keys, "left_semi")
          .select(col("__fp")).distinct().collect()
          .map(r => relOf(fs, root, r.getString(0))).toSet
      val (touched, clean) = candidates.partition(e => touchedSet.contains(e.path))
      val carried = carried0 ++ clean
      // every matched key's row lives in a touched file BY CONSTRUCTION,
      // so the rewrite is simply: touched files' rows whose key is not in
      // the batch, union the whole batch (matched rows replaced, unmatched
      // inserted) — one anti-join on the key, nothing else
      val rewritten =
        if (touched.isEmpty) one
        else readFiles(spark, path, touched)
          .join(broadcast(one.select(keys.map(col): _*)), keys, "left_anti")
          .select(schema.fieldNames.toSeq.map(col): _*)
          .unionByName(one)
      val v = cur + 1
      val newEs = writeData(spark, root, fs, v, rewritten, statsCols(fs, root))
      if (newEs.isEmpty && touched.isEmpty) cur // empty batch: true no-op
      else commit(spark, root, fs, v, carried ++ newEs, "merge")
    }
  }

  /** Compaction on the snapshot substrate: rewrite the CURRENT file set to
    * ~`targetFileBytes` files as a new version (readers of old versions are
    * untouched — no swap dance, no reader race; old files age out via
    * [[vacuum]]). `clusterBy` restores range clustering so the zone map
    * stays tight after the rewrite; `zOrderBy` (mutually exclusive)
    * interleaves TWO numeric columns' bits into one Z-value and clusters
    * on that — each file then holds a small rectangle of the 2-D key
    * space, so the zone map is tight in BOTH dimensions and
    * [[graft.plans.SnapshotFileIndex]] prunes a filter on EITHER column.
    * Linear clustering makes one column's intervals tight and leaves the
    * other's spanning the whole domain; Z-ordering pays ~√ of each —
    * the standard multi-dimensional data-skipping layout. */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long,
              clusterBy: Seq[String] = Nil, zOrderBy: Seq[String] = Nil): Long = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    require(clusterBy.isEmpty || zOrderBy.isEmpty,
      "clusterBy and zOrderBy are mutually exclusive")
    require(zOrderBy.isEmpty || zOrderBy.size == 2,
      s"zOrderBy supports exactly two columns, got ${zOrderBy.size}")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot compact") {
      val cur = currentVersion(spark, path)
      val es = entries(spark, path, cur)
      val bytes = es.map(_.bytes).sum
      val nOut = math.min(Int.MaxValue.toLong,
        math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)).toInt
      val df = readFiles(spark, path, es)
      val shaped =
        if (zOrderBy.nonEmpty) {
          // VALUE-based normalization from the manifest's own global
          // [min,max] (integral stats columns): each column maps to 8
          // bits, interleaved by the classic shift-and-mask spread. No
          // rank pass, no window, no extra shuffle — the clustering
          // write's range exchange is the only data movement. Skewed
          // values give uneven bucket occupancy (zone-map tightness only
          // needs LOCALITY, which value buckets give); a rank-based
          // variant would buy uniformity at the cost of two rank passes.
          def spread8(c: Column): Column = {
            val c1 = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0FL))
            val c2 = (c1.bitwiseOR(shiftleft(c1, 2))).bitwiseAND(lit(0x3333L))
            (c2.bitwiseOR(shiftleft(c2, 1))).bitwiseAND(lit(0x5555L))
          }
          val Seq(a, b) = zOrderBy
          def bound(c: String, hi: Boolean): Long = {
            val vs = es.flatMap(_.stats.get(c))
            require(vs.nonEmpty, s"zOrderBy column $c has no recorded stats")
            require(vs.head.kind == "num", s"zOrderBy column $c must be numeric")
            val bs = vs.map(s => BigDecimal(if (hi) s.hi else s.lo))
            (if (hi) bs.max else bs.min).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
          }
          def bits8(c: String): Column = {
            val (lo, hi) = (bound(c, hi = false), bound(c, hi = true))
            val span = math.max(1L, hi - lo + 1L)
            expr(s"((`$c` - ${lo}L) * 256) div ${span}L")
          }
          df.withColumn("__z", spread8(bits8(a)) + shiftleft(spread8(bits8(b)), 1))
            .repartitionByRange(nOut, col("__z")).sortWithinPartitions(col("__z"))
            .drop("__z")
        } else if (clusterBy.nonEmpty)
          df.repartitionByRange(nOut, clusterBy.map(col): _*)
            .sortWithinPartitions(clusterBy.map(col): _*)
        else df.repartition(nOut)
      val v = cur + 1
      commit(spark, root, fs, v,
        writeData(spark, root, fs, v, shaped, statsCols(fs, root)), "compact")
    }
  }

  /** WRITE-AUDIT-PUBLISH, stage half: write the batch's data files and
    * manifest for version current+1 but NOT the commit marker — the
    * staged version is INVISIBLE to every reader (versions/read resolve
    * only marker-committed manifests) while being fully inspectable via
    * [[readStaged]]. The audit step runs any checks against exactly the
    * bytes that would be published; [[publish]] then commits with one
    * marker create, or [[abandon]] drops the staging (a crashed auditor's
    * staging is also reclaimed by vacuum, which already removes
    * marker-less manifests). The lease is held only during stage — the
    * audit itself can be long and holds nothing. Staging RESERVES the
    * next version slot: any other maintenance landing during the audit
    * refuses loudly at its commit point (the staged manifest occupies the
    * version), so the audited bytes are exactly what publishes; publish
    * additionally re-checks the staged version is still current+1 as
    * belt-and-suspenders against an abandon+recommit interleave. */
  def stageAppend(spark: SparkSession, df: DataFrame, path: String): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot stage") {
      val cur = currentVersion(spark, path)
      val v = cur + 1
      val es = entries(spark, path, cur) ++
        writeData(spark, root, fs, v, df, statsCols(fs, root))
      val tmp = new Path(snapDir(root), s"tmp-$v-${java.util.UUID.randomUUID()}")
      implicit val enc = Encoders.product[FileEntry]
      spark.createDataset(es).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val dst = manifestDir(root, v)
      if (fs.exists(dst) || fs.exists(markerPath(root, v)) || !fs.rename(tmp, dst)) {
        fs.delete(tmp, true)
        throw new java.io.IOException(
          s"snapshot stage conflict at $root: version $v already staged or committed")
      }
      v
    }
  }

  /** Read a STAGED (unpublished) version — the audit's input. */
  def readStaged(spark: SparkSession, path: String, v: Long): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(fs.exists(manifestDir(root, v)) && !fs.exists(markerPath(root, v)),
      s"version $v at $path is not a staged (unpublished) version")
    implicit val enc = Encoders.product[FileEntry]
    val es = spark.read.parquet(manifestDir(root, v).toString).as[FileEntry]
      .collect().toSeq.sortBy(_.path)
    readFiles(spark, path, es)
  }

  /** Publish a staged version: ONE marker create — the same atomic commit
    * point as every other operation. Refuses if the staged version is no
    * longer current+1 (another commit landed mid-audit: the audited bytes
    * would not be what lands). */
  def publish(spark: SparkSession, path: String, v: Long): Long = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot publish") {
      require(fs.exists(manifestDir(root, v)), s"no staged manifest v$v at $path")
      val cur = currentVersion(spark, path)
      if (cur != v - 1) throw new java.io.IOException(
        s"snapshot publish conflict at $path: staged v$v audited against v${v - 1} " +
          s"but current is v$cur — re-stage against the new current version")
      val out =
        try fs.create(markerPath(root, v), false)
        catch {
          case scala.util.control.NonFatal(_) => throw new java.io.IOException(
            s"snapshot publish conflict at $path: version $v already committed")
        }
      try out.write(s"op=publish parent=${v - 1}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      v
    }
  }

  /** Drop a staged version that failed its audit: manifest dir + the
    * staged data files (never any committed version's files). */
  def abandon(spark: SparkSession, path: String, v: Long): Unit = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot abandon") {
      require(!fs.exists(markerPath(root, v)),
        s"version $v at $path is committed — abandon refuses; use vacuum/delete")
      fs.delete(manifestDir(root, v), true)
      fs.delete(new Path(root, s"data/c$v"), true)
      ()
    }
  }

  /** Incremental change read: the NET row-level delta between two
    * committed versions, as (`change_type` ∈ insert|delete, row…). The
    * manifest diff does the heavy lifting: only files present in exactly
    * one of the two versions are read at all — every carried-by-reference
    * file is skipped without opening it, so a downstream consumer pays
    * for the churn between the versions, never the table. Net semantics
    * via exact multiset difference (exceptAll both ways): an update is an
    * insert+delete pair, and a pure rewrite (compaction) that changed
    * files but not content yields an EMPTY delta. This is what lets an
    * incremental consumer (a maintained MV, a replica, an index) follow
    * the table version-by-version without ever re-scanning it. */
  def changesBetween(spark: SparkSession, path: String,
                     fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"changesBetween: fromV $fromV > toV $toV")
    val fromEs = entries(spark, path, fromV)
    val toEs = entries(spark, path, toV)
    val fromPaths = fromEs.map(_.path).toSet
    val toPaths = toEs.map(_.path).toSet
    val addedRows = readFiles(spark, path, toEs.filterNot(e => fromPaths.contains(e.path)))
    val removedRows = readFiles(spark, path, fromEs.filterNot(e => toPaths.contains(e.path)))
    addedRows.exceptAll(removedRows).withColumn("change_type", lit("insert"))
      .unionByName(
        removedRows.exceptAll(addedRows).withColumn("change_type", lit("delete")))
  }

  /** Reclaim storage: keep the newest `keepVersions` committed versions,
    * delete every data file referenced by NO kept manifest, every dropped
    * version's manifest+marker, and crashed committers' tmp manifest dirs.
    * Time travel inside the kept window is untouched; reads beyond it now
    * refuse (their marker is gone) instead of returning partial data.
    * Returns (data files deleted, versions dropped). */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int): (Long, Long) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    Lease.withLease(fs, root, "snapshot vacuum") {
      val vs = versions(spark, path)
      require(vs.nonEmpty, s"no committed snapshot at $path")
      val (dropped, kept) = vs.splitAt(math.max(0, vs.size - keepVersions))
      // a marker-less manifest ABOVE the committed head is an in-flight
      // write-audit-publish staging: its files are protected (abandon is
      // the explicit cleanup), unlike tmp-* dirs which are always garbage
      val sdList = fs.listStatus(snapDir(root)).iterator.map(_.getPath.getName).toSeq
      val staged = sdList.filter(_.startsWith("v"))
        .flatMap(n => n.stripPrefix("v").toLongOption)
        .filter(v => v > vs.last && !fs.exists(markerPath(root, v)))
      implicit val enc = Encoders.product[FileEntry]
      val stagedRefs = staged.flatMap(v =>
        spark.read.parquet(manifestDir(root, v).toString).as[FileEntry]
          .collect().map(_.path))
      val referenced =
        (kept.flatMap(v => entries(spark, path, v).map(_.path)) ++ stagedRefs).toSet
      // markers first: a crash mid-vacuum must never leave a version that
      // LOOKS committed but whose files are partially deleted
      dropped.foreach { v =>
        if (!fs.delete(markerPath(root, v), false))
          throw new java.io.IOException(s"vacuum: could not drop commit marker $v")
        fs.delete(manifestDir(root, v), true)
      }
      // crashed committers: tmp manifest dirs never referenced by a marker
      val sd = snapDir(root)
      fs.listStatus(sd).iterator.filter(s => s.getPath.getName.startsWith("tmp-"))
        .foreach(s => fs.delete(s.getPath, true))
      var deleted = 0L
      val dataDir = new Path(root, "data")
      if (fs.exists(dataDir)) {
        val it = fs.listFiles(dataDir, true)
        val toDelete = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val f = it.next()
          val relPath = relOf(fs, root, fs.makeQualified(f.getPath).toString)
          val isMeta = f.getPath.getName.startsWith("_") || f.getPath.getName.startsWith(".")
          if (!referenced.contains(relPath) && !isMeta) toDelete += f.getPath
        }
        toDelete.foreach { p => if (fs.delete(p, false)) deleted += 1 }
        // drop commit data dirs emptied entirely (metadata markers aside)
        fs.listStatus(dataDir).iterator.filter(_.isDirectory).foreach { d =>
          val anyData = fs.listFiles(d.getPath, true)
          var hasData = false
          while (anyData.hasNext && !hasData) {
            val n = anyData.next().getPath.getName
            if (!n.startsWith("_") && !n.startsWith(".")) hasData = true
          }
          if (!hasData) fs.delete(d.getPath, true)
        }
      }
      (deleted, dropped.size.toLong)
    }
  }
}
