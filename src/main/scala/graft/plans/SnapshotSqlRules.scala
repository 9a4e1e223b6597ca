package graft.plans

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** The SQL/CATALOG surface of the `graft-snapshot` format — what turns
  * the path-addressed table substrate into tables a warehouse user
  * queries by NAME (the reference's only analytical interface is SQL
  * over its sink, documentation.md:411):
  *
  * {{{
  * df.write.format("graft-snapshot").saveAsTable("sales")
  * spark.sql("CREATE TABLE sales USING `graft-snapshot` OPTIONS (path '…')")
  * spark.sql("CREATE TABLE s2 USING `graft-snapshot` AS SELECT …")
  * spark.sql("INSERT INTO sales SELECT …")          // atomic versioned commit
  * spark.sql("INSERT OVERWRITE sales SELECT …")     // atomic replace commit
  * spark.sql("SELECT * FROM sales VERSION AS OF 3") // SQL time travel
  * spark.sql("SELECT * FROM sales TIMESTAMP AS OF '2026-08-16 12:00:00'")
  * }}}
  *
  * Registration, CTAS, `saveAsTable` and plain named reads need NO code
  * here — the V1 `RelationProvider`/`CreatableRelationProvider` seam
  * already routes them through the store's commit protocol. The two
  * rules below close the two places stock Spark either refuses or —
  * worse — silently corrupts:
  *
  *  - [[SnapshotTimeTravelRule]] (hint-resolution batch, which runs
  *    BEFORE the Resolution batch): stock `ResolveRelations` throws
  *    `UNSUPPORTED_FEATURE.TIME_TRAVEL` for any V1 catalog table, so
  *    this rule intercepts the parsed [[RelationTimeTravel]] node first
  *    and splices in the versioned relation the format reader builds —
  *    SQL time travel inherits the whole manifest read path (zone-map
  *    pruning included). This pre-Resolution interception is the same
  *    placement every table format with V1 roots uses for analyzer
  *    extension points the built-ins would otherwise reject.
  *  - [[SnapshotInsertRule]] (post-hoc batch, after the built-in
  *    `DataSourceAnalysis` has planned the insert): stock Spark plans
  *    `INSERT INTO` over any HadoopFsRelation as a DIRECT FILE WRITE
  *    into the table root — for a manifest-committed table that row
  *    silently never becomes visible (measured: the parquet lands
  *    unreferenced next to `_snapshots/` and reads skip it). The rule
  *    rewrites the command into an atomic [[SnapshotStore.append]] /
  *    [[SnapshotStore.overwrite]] commit, so SQL writes get exactly the
  *    guarantees the DataFrame writer gets.
  */
object SnapshotSqlRules {

  /** The graft-snapshot table root behind a (possibly qualified) relation
    * name, if the session catalog says that's what it is. One metadata
    * lookup, no data I/O; non-graft tables return None and the rules
    * leave their plans untouched. */
  private[plans] def graftTablePath(spark: SparkSession,
                                    nameParts: Seq[String]): Option[String] = {
    val ident = nameParts match {
      case Seq(t) => Some(TableIdentifier(t))
      case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        Some(TableIdentifier(t, Some(db)))
      case _ => None
    }
    ident.filter(spark.sessionState.catalog.tableExists).flatMap { id =>
      val meta = spark.sessionState.catalog.getTableMetadata(id)
      if (!meta.provider.exists(_.equalsIgnoreCase("graft-snapshot"))) None
      else meta.storage.locationUri
        .map(u => new org.apache.hadoop.fs.Path(u).toString)
        .orElse(meta.storage.properties.get("path"))
    }
  }

  /** Post-commit catalog invalidation shared by every SQL write command:
    * the catalog caches the resolved relation with its VERSION-PINNED
    * file listing — the same refresh every table format issues. */
  private[plans] def refreshAfterWrite(spark: SparkSession, path: String,
                                       table: Option[TableIdentifier]): Unit = {
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    spark.catalog.refreshByPath(path)
  }

  /** `TIMESTAMP AS OF <expr>` to epoch millis. Literal strings accept the
    * same spellings as the reader option (epoch millis, ISO-8601 instant)
    * plus the SQL-native `yyyy-MM-dd[ HH:mm:ss]` forms anchored to UTC —
    * the engine-wide session timezone. Non-literal foldable expressions
    * evaluate; anything else refuses loudly (a correlated timestamp has
    * no single version to pin). */
  private[plans] def toMillis(e: Expression): Long = {
    def parse(s: String): Long = s.toLongOption.getOrElse {
      try java.time.Instant.parse(s).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          val utc = java.time.ZoneOffset.UTC
          try java.time.LocalDateTime.parse(s,
            java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
            .toInstant(utc).toEpochMilli
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDate.parse(s).atStartOfDay.toInstant(utc).toEpochMilli
          }
      }
    }
    e match {
      case Literal(s: UTF8String, StringType) => parse(s.toString)
      case Literal(micros: Long, _: TimestampType) => micros / 1000L
      case _ if e.resolved && e.foldable =>
        e.eval() match {
          case s: UTF8String => parse(s.toString)
          case micros: java.lang.Long => micros.longValue() / 1000L
          case other => throw new IllegalArgumentException(
            s"graft-snapshot TIMESTAMP AS OF: cannot interpret $other")
        }
      case other => throw new IllegalArgumentException(
        s"graft-snapshot TIMESTAMP AS OF requires a literal or foldable " +
          s"timestamp, got $other")
    }
  }
}

/** SQL time travel for graft-snapshot catalog tables — see
  * [[SnapshotSqlRules]]. Leaves every non-graft relation to the stock
  * analyzer (including its stock refusal). */
case class SnapshotTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import SnapshotSqlRules._
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, tsOpt, verOpt) =>
      graftTablePath(spark, u.multipartIdentifier) match {
        case None => tt
        case Some(path) =>
          val r0 = spark.read.format("graft-snapshot")
          val r1 = verOpt.fold(r0)(v => r0.option("versionAsOf", v))
          val r2 = tsOpt.fold(r1)(e => r1.option("timestampAsOf",
            SnapshotSqlRules.toMillis(e).toString))
          r2.load(path).queryExecution.analyzed
      }
  }
}

/** Reroute SQL `INSERT INTO` / `INSERT OVERWRITE` on a graft-snapshot
  * table from the stock direct-file write (which would land an
  * UNREFERENCED parquet next to the manifest — a silently lost row) into
  * the store's atomic commit protocol — see [[SnapshotSqlRules]].
  * Detection is structural: the target relation's file listing is the
  * manifest-backed [[SnapshotFileIndex]], which only graft-snapshot
  * relations carry.
  *
  * The primary interception is the RESOLUTION-time match on
  * [[InsertIntoStatement]] (once target and query are resolved), which
  * runs BEFORE the built-in `DataSourceAnalysis` would plan the file
  * write — necessary for two reasons: the stock path refuses
  * `INSERT OVERWRITE t SELECT … FROM t` outright
  * (`UNSUPPORTED_OVERWRITE.TABLE` — for an in-place file table that IS
  * unsafe), while the snapshot substrate makes it SAFE AND USEFUL (the
  * query's scan is pinned to the old manifest's immutable files; the
  * overwrite lands as a new version — the SQL spelling of a predicate
  * delete, scored by q150); and the stock path's command would write
  * naked files. The [[InsertIntoHadoopFsRelationCommand]] match below it
  * is the belt-and-suspenders net for any plan shape that reaches the
  * planned command some other way. Column alignment follows the stock
  * positional contract (arity-checked here, cast in the command);
  * partition specs / explicit column lists / BY NAME refuse loudly
  * rather than fall through to the corrupting stock write. */
object SnapshotInsertRule extends Rule[LogicalPlan] {
  private def snapshotTarget(p: LogicalPlan): Option[org.apache.spark.sql.execution.datasources.LogicalRelation] =
    p match {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if h.location.isInstanceOf[SnapshotFileIndex] => Some(lr)
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case i: InsertIntoStatement if i.query.resolved &&
        snapshotTarget(i.table).isDefined =>
      val lr = snapshotTarget(i.table).get
      val h = lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      require(i.partitionSpec.isEmpty && i.userSpecifiedCols.isEmpty && !i.byName,
        "graft-snapshot INSERT supports the plain positional form only " +
          "(no PARTITION spec, column list, or BY NAME) — refusing loudly " +
          "rather than falling through to a non-transactional file write")
      require(i.query.output.size == h.schema.size,
        s"graft-snapshot INSERT: query has ${i.query.output.size} columns, " +
          s"table has ${h.schema.size}")
      SnapshotInsertCommand(h.location.rootPaths.head.toString, i.query,
        i.overwrite, lr.catalogTable.map(_.identifier))
    case i: InsertIntoHadoopFsRelationCommand
        if i.fileIndex.exists(_.isInstanceOf[SnapshotFileIndex]) =>
      SnapshotInsertCommand(i.outputPath.toString, i.query,
        i.mode == SaveMode.Overwrite, i.catalogTable.map(_.identifier))
  }
}

/** SQL ROW-LEVEL DML for graft-snapshot catalog tables — `DELETE FROM`,
  * `UPDATE … SET` and the canonical upsert `MERGE INTO`, which stock
  * Spark parses but then refuses for any non-DSv2 table ("… is only
  * supported with v2 tables"). The rule intercepts the resolved command
  * nodes and maps them onto the store's atomic row-level operations —
  * the same copy-on-write commits the DataFrame API gets, zone-map
  * pruning included (the predicate re-applies inside the store's own
  * scan, pushed to the parquet reader).
  *
  * Predicate/assignment rebinding: the parsed condition's
  * [[AttributeReference]]s are bound to THIS plan's relation instance;
  * the store's operation scans build their own frames, so bound
  * references would not resolve there. Each expression is rebound by
  * name (attribute → `UnresolvedAttribute`), which is sound because a
  * table's top-level column names are unique. Conditions carrying
  * subqueries refuse loudly (they cannot rebind by name).
  *
  * MERGE supports exactly the canonical upsert the store's merge IS —
  * `ON` a conjunction of same-named column equalities, `WHEN MATCHED
  * THEN UPDATE SET *`, `WHEN NOT MATCHED THEN INSERT *` — and refuses
  * loudly on any other clause combination rather than approximating
  * its semantics. */
object SnapshotDmlRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Unwrap alias nodes down to a graft-snapshot LogicalRelation. */
  private def target(p: LogicalPlan): Option[(String, Option[TableIdentifier])] =
    p match {
      case SubqueryAlias(_, child) => target(child)
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if h.location.isInstanceOf[SnapshotFileIndex] =>
            Some((h.location.rootPaths.head.toString,
              lr.catalogTable.map(_.identifier)))
          case _ => None
        }
      case _ => None
    }

  private def rebindable(e: Expression): Boolean =
    e.resolved && !e.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.SubqueryExpression])

  /** Rebind by NAME — wrapped as a Column, which the analyzer treats as
    * opaque (a raw unresolved Expression stored on the command would
    * trip CheckAnalysis's unresolved-attribute walk): the store's own
    * scans resolve the names when the predicate is applied. */
  private def rebind(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }
  private def columnOf(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.GraftLogicalPlanApi.columnOf(e)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformDown {
    case DeleteFromTable(t, cond) if target(t).isDefined && rebindable(cond) =>
      val (path, ident) = target(t).get
      SnapshotDeleteCommand(path, columnOf(rebind(cond)), ident)

    case UpdateTable(t, assignments, cond)
        if target(t).isDefined &&
          cond.forall(rebindable) && assignments.forall(a => rebindable(a.value)) =>
      val (path, ident) = target(t).get
      val set = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new IllegalArgumentException(
            s"graft-snapshot UPDATE supports top-level columns only, got $other")
        }
        name -> columnOf(rebind(a.value))
      }
      SnapshotUpdateCommand(path, set,
        cond.map(c => columnOf(rebind(c)))
          .getOrElse(org.apache.spark.sql.functions.lit(true)), ident)

    case MergeIntoTable(t, source, onCond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution)
        if target(t).isDefined && source.resolved && onCond.resolved =>
      val (path, ident) = target(t).get
      // the analyzer may or may not have expanded the star actions into
      // per-column identity assignments by the time this rule fires —
      // accept both spellings of the same canonical clause
      def identityAssigns(as: Seq[Assignment]): Boolean = as.forall { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference) => k.name == v.name
          case _ => false
        }
      }
      def canonical: Boolean =
        (matched match {
          case Seq(UpdateStarAction(None)) => true
          case Seq(UpdateAction(None, as, _)) => identityAssigns(as)
          case _ => false
        }) && (notMatched match {
          case Seq(InsertStarAction(None)) => true
          case Seq(InsertAction(None, as)) => identityAssigns(as)
          case _ => false
        }) && notMatchedBySource.isEmpty && !withSchemaEvolution
      require(canonical,
        "graft-snapshot MERGE supports the canonical upsert only — " +
          "WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT * " +
          "(no conditions, no DELETE, no NOT MATCHED BY SOURCE); got " +
          s"${matched.size} matched / ${notMatched.size} not-matched / " +
          s"${notMatchedBySource.size} by-source action(s): " +
          (matched ++ notMatched ++ notMatchedBySource)
            .map(_.getClass.getSimpleName).mkString(", "))
      // ON: a conjunction of same-named column equalities → the key list
      def keysOf(e: Expression): Seq[String] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          keysOf(l) ++ keysOf(r)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if a.name == b.name => Seq(a.name)
        case other => throw new IllegalArgumentException(
          "graft-snapshot MERGE ON must be a conjunction of same-named " +
            s"column equalities (t.k = s.k), got $other")
      }
      SnapshotMergeCommand(path, source, keysOf(onCond).distinct, ident)
  }
}

/** `DELETE FROM t WHERE …` as one atomic copy-on-write commit. */
case class SnapshotDeleteCommand(path: String, cond: org.apache.spark.sql.Column,
                                 table: Option[TableIdentifier])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.operators.SnapshotStore.deleteWhere(spark, path, cond)
    SnapshotSqlRules.refreshAfterWrite(spark, path, table)
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE …` as one atomic copy-on-write commit. */
case class SnapshotUpdateCommand(path: String,
                                 set: Seq[(String, org.apache.spark.sql.Column)],
                                 cond: org.apache.spark.sql.Column,
                                 table: Option[TableIdentifier])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.operators.SnapshotStore.updateWhere(spark, path, cond, set.toMap)
    SnapshotSqlRules.refreshAfterWrite(spark, path, table)
    Seq.empty
  }
}

/** Canonical `MERGE INTO` (upsert) as one atomic commit. */
case class SnapshotMergeCommand(path: String, source: LogicalPlan,
                                keys: Seq[String],
                                table: Option[TableIdentifier])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = source :: Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.classic.GraftLogicalPlanApi.ofRows(spark, source)
    graft.operators.SnapshotStore.merge(spark, src, path, keys, tieBreak = Nil)
    SnapshotSqlRules.refreshAfterWrite(spark, path, table)
    Seq.empty
  }
}

/** The atomic SQL-insert command [[SnapshotInsertRule]] plans: one
  * versioned [[graft.operators.SnapshotStore.append]] (INSERT INTO) or
  * [[graft.operators.SnapshotStore.overwrite]] (INSERT OVERWRITE) —
  * commit marker and all, so a crash mid-insert leaves the previous
  * version live instead of a half-written directory. Columns align
  * POSITIONALLY with casts to the table schema — the stock INSERT
  * contract (arity was checked at analysis by [[SnapshotInsertRule]]). */
case class SnapshotInsertCommand(path: String, query: LogicalPlan,
                                 overwrite: Boolean,
                                 table: Option[TableIdentifier])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = query :: Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val schema = graft.operators.SnapshotStore.schemaOf(spark, path)
    val df = org.apache.spark.sql.classic.GraftLogicalPlanApi.ofRows(spark, query)
      .toDF(schema.fieldNames.toIndexedSeq: _*) // positional rename
      .select(schema.fields.toSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
    if (overwrite) graft.operators.SnapshotStore.overwrite(spark, df, path)
    else graft.operators.SnapshotStore.append(spark, df, path)
    SnapshotSqlRules.refreshAfterWrite(spark, path, table)
    Seq.empty
  }
}
