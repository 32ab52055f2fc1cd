package graft.catalog

import graft.sink.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for table maintenance — the Iceberg
  * `CALL catalog.system.<proc>(...)` vocabulary (the reference operates
  * its lakehouse through exactly these: snapshot expiry per the
  * template retention policy, compaction, WAP publication;
  * `dagster/lakehouse/assets/maintenance.py`, `docs/deep-dive.md`),
  * served through Spark 4's DSv2 `ProcedureCatalog` so a SQL-only
  * operator can run the whole maintenance surface:
  * {{{
  *   CALL graft.system.expire_snapshots(`table` => 'ns.t', retain_last => 2)
  *   CALL graft.system.rollback_to_snapshot(`table` => 'ns.t', snapshot_id => 3)
  *   CALL graft.system.rewrite_data_files(`table` => 'ns.t')
  *   CALL graft.system.publish_changes(`table` => 'ns.t', snapshot_id => 5)
  * }}}
  * Each call executes the SAME engine primitive the Scala API exposes
  * (one code path, spec'd once) and returns its result relationally —
  * expired ids, removed paths, new snapshot ids — as rows.
  *
  * All procedures are metadata-bounded or delta-bounded exactly like
  * their underlying primitives: expiry and rollback are metadata flips,
  * orphan removal is a directory walk, compaction/delete-rewrite
  * rewrite only what their contracts scope. Nothing here scans a table
  * because it was called from SQL.
  */
object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def opt(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue("NULL").build()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** One procedure: parameters (param 0 is always `table` = 'ns.name'),
    * output schema, and the row-producing body.
    */
  final case class ProcDef(
      name: String,
      params: Seq[ProcedureParameter],
      output: StructType,
      describe: String,
      run: (SnapshotTable, InternalRow, SparkSession) => Seq[Array[Any]],
      // false for table-CREATING procedures (snapshot migration): the
      // catalog resolves the name to a handle without requiring a
      // visible table to already exist
      requiresTable: Boolean = true)

  val all: Seq[ProcDef] = Seq(
    ProcDef("create_materialized_view",
      Seq(p("table", StringType), p("query", StringType)),
      StructType(Seq(
        StructField("materialized_view", StringType),
        StructField("row_count", LongType),
        StructField("source_count", IntegerType))),
      "Create a MATERIALIZED view: validate the query, precompute it into " +
        "a storage snapshot table, and record one snapshot-id watermark per " +
        "source table (staleness = O(#sources) metadata probe). Reads of " +
        "the name serve the storage table directly.",
      (t, in, spark) => {
        require(!in.isNullAt(1), "create_materialized_view: 'query' is required")
        val (rows, sources) = GraftMaterializedView.create(
          spark, t, in.getUTF8String(1).toString)
        Seq(Array[Any](utf8(t.fullName), rows, sources))
      },
      requiresTable = false),

    ProcDef("refresh_materialized_view",
      Seq(p("table", StringType)),
      StructType(Seq(
        StructField("refreshed", BooleanType),
        StructField("row_count", LongType),
        StructField("stale_sources", StringType))),
      "Refresh a materialized view IFF any source table's snapshot moved " +
        "past the recorded watermark; a fresh MV is a metadata-probe no-op. " +
        "Returns whether a recompute happened and which sources were stale.",
      (t, in, spark) => {
        val (refreshed, rows, stale) = GraftMaterializedView.refresh(spark, t)
        Seq(Array[Any](refreshed, rows, utf8(stale.mkString(","))))
      }),

    ProcDef("materialized_view_status",
      Seq(p("table", StringType)),
      StructType(Seq(
        StructField("source", StringType),
        StructField("recorded_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType),
        StructField("fresh", BooleanType))),
      "Per-source freshness of a materialized view: the recorded watermark " +
        "vs the source's current snapshot id — a pure metadata listing.",
      (t, _, _) => GraftMaterializedView.status(t).map { case (src, rec, cur, fresh) =>
        Array[Any](utf8(src), rec, cur, fresh)
      }),

    ProcDef("drop_materialized_view",
      Seq(p("table", StringType)),
      StructType(Seq(StructField("dropped", BooleanType))),
      "Drop a materialized view: the sidecar and its storage table.",
      (t, _, _) => Seq(Array[Any](GraftMaterializedView.drop(t)))),

    ProcDef("expire_snapshots",
      Seq(p("table", StringType), opt("older_than_ms", LongType),
        opt("retain_last", IntegerType)),
      StructType(Seq(StructField("expired_snapshot_id", LongType))),
      "Expire published snapshots older than the cutoff (default: now), " +
        "always retaining the newest retain_last (default 1); tag/branch " +
        "targets are never expired. Returns the expired ids.",
      (t, in, _) => {
        val olderThan =
          if (in.isNullAt(1)) SnapshotTable.clockMs() else in.getLong(1)
        val retainLast = if (in.isNullAt(2)) 1 else in.getInt(2)
        t.expireSnapshots(olderThan, retainLast).map(id => Array[Any](id))
      }),

    ProcDef("rollback_to_snapshot",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType))),
      "Repoint the table to an earlier snapshot's state as NEW auditable " +
        "history (the abandoned lineage stays readable, $history marks it " +
        "not-current-ancestor).",
      (t, in, _) => {
        val prev = t.currentSnapshot.map(_.id).getOrElse(-1L)
        val snap = t.rollback(in.getLong(1))
        Seq(Array[Any](prev, snap.id))
      }),

    ProcDef("cherrypick_snapshot",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      StructType(Seq(
        StructField("source_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType))),
      "Transplant an append-shaped snapshot's delta onto the current head " +
        "(the WAP conflict resolution publish refuses).",
      (t, in, _) => {
        val src = in.getLong(1)
        Seq(Array[Any](src, t.cherryPick(src).id))
      }),

    ProcDef("publish_changes",
      Seq(p("table", StringType), p("snapshot_id", LongType)),
      StructType(Seq(
        StructField("published_snapshot_id", LongType),
        StructField("row_count", LongType))),
      "Publish an audited write-audit-publish staged snapshot: an O(1) " +
        "metadata flip; conflicts with a moved head fail loudly.",
      (t, in, _) => {
        val snap = t.publish(in.getLong(1))
        Seq(Array[Any](snap.id, snap.rowCount))
      }),

    ProcDef("fast_forward",
      Seq(p("table", StringType), p("branch", StringType)),
      StructType(Seq(
        StructField("branch", StringType),
        StructField("previous_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType))),
      "Publish a branch's staged chain by fast-forwarding the table head " +
        "to it (ancestor check: divergence fails instead of dropping rivals).",
      (t, in, _) => {
        val branch = in.getUTF8String(1).toString
        val prev = t.currentSnapshot.map(_.id).getOrElse(-1L)
        val snap = t.fastForward(branch)
        Seq(Array[Any](utf8(branch), prev, snap.id))
      }),

    ProcDef("rewrite_data_files",
      Seq(p("table", StringType)),
      StructType(Seq(
        StructField("new_snapshot_id", LongType),
        StructField("data_dir_count", IntegerType),
        StructField("row_count", LongType))),
      "Compact the table: bin-pack small files, bake in masks and deletes, " +
        "re-derive the layout under the CURRENT partition spec (the " +
        "partition-evolution migration path).",
      (t, in, spark) => {
        val snap = t.compact(spark)
        Seq(Array[Any](snap.id, snap.dataDirs.size, snap.rowCount))
      }),

    ProcDef("rewrite_deletes",
      Seq(p("table", StringType)),
      StructType(Seq(
        StructField("new_snapshot_id", LongType),
        StructField("remaining_delete_files", IntegerType))),
      "Pay down merge-on-read debt: rewrite ONLY delete-scoped dirs with " +
        "their deletes applied; out-of-scope dirs carry byte-identical; " +
        "no-op does not commit.",
      (t, in, spark) => {
        val snap = t.rewriteDeletes(spark)
        Seq(Array[Any](snap.id, snap.deletes.size))
      }),

    ProcDef("rewrite_position_deletes",
      Seq(p("table", StringType)),
      StructType(Seq(
        StructField("new_snapshot_id", LongType),
        StructField("position_delete_files", IntegerType))),
      "Consolidate the active positional delete files into one ((file, " +
        "position) pairs self-scope by file path, so the union is sound); " +
        "data files untouched; fewer than two files is a no-op.",
      (t, in, spark) => {
        val snap = t.consolidatePositionalDeletes(spark)
        Seq(Array[Any](snap.id, snap.deletes.count(_.positional)))
      }),

    ProcDef("rewrite_manifests",
      Seq(p("table", StringType)),
      StructType(Seq(
        StructField("data_dirs", IntegerType),
        StructField("data_files", IntegerType))),
      "Consolidate the current snapshot's per-dir file sidecars into one " +
        "root-level manifest listing: a $files query then opens ONE " +
        "metadata file instead of one per dir. Pure metadata; later " +
        "commits bypass it until the next rewrite.",
      (t, in, _) => {
        val (dirs, files) = t.rewriteManifests()
        Seq(Array[Any](dirs, files))
      }),

    ProcDef("create_branch",
      Seq(p("table", StringType), p("branch", StringType),
        opt("snapshot_id", LongType), opt("max_ref_age_ms", LongType),
        opt("min_snapshots_to_keep", IntegerType),
        opt("max_snapshot_age_ms", LongType)),
      StructType(Seq(
        StructField("branch", StringType),
        StructField("snapshot_id", LongType))),
      "Create a named branch at the given snapshot (default: current " +
        "head); appendToBranch then stages invisible commits on it until " +
        "fast_forward publishes the chain. Optional Iceberg branch " +
        "retention: max_ref_age_ms expires the branch itself, " +
        "min_snapshots_to_keep / max_snapshot_age_ms protect its staged " +
        "ancestor chain from expire_snapshots.",
      (t, in, _) => {
        val name = in.getUTF8String(1).toString
        val at = if (in.isNullAt(2)) None else Some(in.getLong(2))
        val maxRefAge = if (in.isNullAt(3)) None else Some(in.getLong(3))
        val minKeep = if (in.isNullAt(4)) None else Some(in.getInt(4))
        val maxSnapAge = if (in.isNullAt(5)) None else Some(in.getLong(5))
        val ref = t.createBranch(name, at, maxRefAge, minKeep, maxSnapAge)
        Seq(Array[Any](utf8(ref.name), ref.snapshotId))
      }),

    ProcDef("create_tag",
      Seq(p("table", StringType), p("tag", StringType),
        opt("snapshot_id", LongType), opt("max_ref_age_ms", LongType)),
      StructType(Seq(
        StructField("tag", StringType),
        StructField("snapshot_id", LongType))),
      "Pin a named tag to the given snapshot (default: current head); " +
        "tagged snapshots and their dirs are protected from expiry — " +
        "until the tag outlives its own optional max_ref_age_ms.",
      (t, in, _) => {
        val name = in.getUTF8String(1).toString
        val at = if (in.isNullAt(2)) None else Some(in.getLong(2))
        val maxRefAge = if (in.isNullAt(3)) None else Some(in.getLong(3))
        val ref = t.createTag(name, at, maxRefAge)
        Seq(Array[Any](utf8(ref.name), ref.snapshotId))
      }),

    ProcDef("drop_ref",
      Seq(p("table", StringType), p("name", StringType)),
      StructType(Seq(StructField("dropped", StringType))),
      "Drop a branch or tag by name; the snapshots it pointed at remain " +
        "(expiry governs their lifetime once unprotected).",
      (t, in, _) => {
        val name = in.getUTF8String(1).toString
        t.dropRef(name)
        Seq(Array[Any](utf8(name)))
      }),

    ProcDef("update_partition_spec",
      Seq(p("table", StringType), p("spec", StringType)),
      StructType(Seq(
        StructField("old_spec", StringType),
        StructField("new_spec", StringType))),
      "Evolve the declared partition spec (Iceberg updateSpec): the new " +
        "transforms govern FUTURE writes; old dirs keep their layout and " +
        "reads prune each epoch with its own transforms. Spec grammar: " +
        "'days(ts), bucket(16, id), region' ('none' = unpartitioned).",
      (t, in, _) => {
        val specStr = in.getUTF8String(1).toString
        val fields = GraftProcedures.parseSpec(specStr)
        val old = graft.sink.DeclaredPartitionSpec.read(t.root)
        t.updatePartitionSpec(fields)
        def fmt(s: Seq[graft.template.PartitionField]): String =
          if (s.isEmpty) "none"
          else s.map(f => f.transform match {
            case "identity" => f.column
            case "bucket" | "truncate" => s"${f.transform}(${f.n}, ${f.column})"
            // report in the DDL's plural form (days(ts)), as written
            case tr => s"${tr}s(${f.column})"
          }).mkString(", ")
        Seq(Array[Any](utf8(fmt(old)), utf8(fmt(fields))))
      }),

    ProcDef("remove_orphan_files",
      Seq(p("table", StringType), opt("older_than_ms", LongType)),
      StructType(Seq(StructField("orphan_path", StringType))),
      "Delete files no snapshot references (failed-commit debris), " +
        "recency-clamped (default: only files older than now) so an " +
        "in-flight writer's uncommitted dir survives.",
      (t, in, _) => {
        val olderThan =
          if (in.isNullAt(1)) System.currentTimeMillis() else in.getLong(1)
        t.removeOrphanFiles(olderThan).map(path => Array[Any](utf8(path)))
      }),

    ProcDef("add_files",
      Seq(p("table", StringType), p("source_path", StringType)),
      StructType(Seq(
        StructField("snapshot_id", LongType),
        StructField("added_files_count", LongType),
        StructField("added_rows_count", LongType))),
      "Zero-copy import (Iceberg add_files): commit a snapshot that " +
        "references the source path's parquet files in place — no data " +
        "is read or copied at import; footer counts and one stats pass " +
        "give imported dirs the same sidecar stats as written ones. " +
        "Source files are never owned: expiry and cleanup can only ever " +
        "delete the table's own link manifest.",
      (t, in, spark) => {
        val before = t.currentSnapshot.map(_.rowCount).getOrElse(0L)
        val snap = t.addFiles(spark, in.getUTF8String(1).toString)
        val added = snap.summary.get("added-files").map(_.toLong).getOrElse(-1L)
        Seq(Array[Any](snap.id, added,
          if (before < 0 || snap.rowCount < 0) -1L else snap.rowCount - before))
      }),

    ProcDef("snapshot",
      Seq(p("table", StringType), p("source_path", StringType)),
      StructType(Seq(
        StructField("snapshot_id", LongType),
        StructField("imported_files_count", LongType),
        StructField("imported_rows_count", LongType))),
      "Create a NEW table over an existing parquet path without copying " +
        "it (Iceberg snapshot/migrate): infer the schema from the " +
        "source, create the table, then zero-copy add_files. The source " +
        "stays external and is never deleted by table maintenance.",
      (t, in, spark) => {
        require(!t.existsVisible,
          s"snapshot: table ${t.fullName} already exists; use add_files " +
            "to import more data into an existing table")
        val sourcePath = in.getUTF8String(1).toString
        val colsDdl = spark.read.parquet(sourcePath)
          .schema.fields.toSeq.map(f => f.name -> f.dataType.sql)
        t.create(colsDdl): Unit
        val snap = t.addFiles(spark, sourcePath)
        val added = snap.summary.get("added-files").map(_.toLong).getOrElse(-1L)
        Seq(Array[Any](snap.id, added, snap.rowCount))
      },
      requiresTable = false)
  )

  private val byName: Map[String, ProcDef] = all.map(d => d.name -> d).toMap

  /** Parse a partition-spec string — the Iceberg transform vocabulary
    * as written in DDL: `days(ts), bucket(16, id), truncate(4, code),
    * region`; `none` (or empty) = unpartitioned.
    */
  private[catalog] def parseSpec(spec: String): Seq[graft.template.PartitionField] = {
    val trimmed = spec.trim
    if (trimmed.isEmpty || trimmed.equalsIgnoreCase("none")) return Nil
    val FnRe = """(\w+)\s*\(\s*([^)]*)\s*\)""".r
    trimmed.split(",(?![^(]*\\))").map(_.trim).toSeq.map {
      case FnRe(fn, args) =>
        val parts = args.split(",").map(_.trim).toSeq
        fn.toLowerCase match {
          case "year" | "years"   => graft.template.PartitionField(parts.head, "year")
          case "month" | "months" => graft.template.PartitionField(parts.head, "month")
          case "day" | "days"     => graft.template.PartitionField(parts.head, "day")
          case "hour" | "hours"   => graft.template.PartitionField(parts.head, "hour")
          case "bucket" =>
            require(parts.length == 2, s"bucket needs (n, col): '$fn($args)'")
            graft.template.PartitionField(parts(1), "bucket", parts.head.toInt)
          case "truncate" =>
            require(parts.length == 2, s"truncate needs (n, col): '$fn($args)'")
            graft.template.PartitionField(parts(1), "truncate", parts.head.toInt)
          case other => throw new IllegalArgumentException(
            s"unknown partition transform '$other' (year(s), month(s), day(s), " +
              "hour(s), bucket, truncate, or a bare column)")
        }
      case bare if bare.nonEmpty && bare.matches("\\w+") =>
        graft.template.PartitionField(bare, "identity")
      case bad => throw new IllegalArgumentException(
        s"bad partition-spec clause '$bad'")
    }
  }

  def list(): Array[Identifier] =
    all.map(d => Identifier.of(Array("system"), d.name)).toArray

  /** Resolve `graft.system.<name>`; `resolve` maps the 'ns.table' arg to
    * a live [[SnapshotTable]] under the calling catalog's warehouse. Its
    * second argument is the procedure's `requiresTable`: table-creating
    * procedures get a handle without the existence check.
    */
  def load(ident: Identifier, resolve: (String, Boolean) => SnapshotTable): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live under the 'system' namespace, got ${ident.toString} " +
        s"(available: ${all.map("system." + _.name).mkString(", ")})")
    val d = byName.getOrElse(ident.name, throw new IllegalArgumentException(
      s"unknown procedure system.${ident.name} " +
        s"(available: ${all.map(_.name).sorted.mkString(", ")})"))
    new UnboundProcedure {
      override def name(): String = d.name
      override def description(): String = d.describe
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = d.name
        override def description(): String = d.describe
        override def parameters(): Array[ProcedureParameter] = d.params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          require(!input.isNullAt(0), s"${d.name}: 'table' is required")
          val t = resolve(input.getUTF8String(0).toString, d.requiresTable)
          val out = d.run(t, input, SparkSession.active)
            .map(vs => new GenericInternalRow(vs): InternalRow).toArray
          java.util.List.of[Scan](new LocalScan {
            override def readSchema(): StructType = d.output
            override def rows(): Array[InternalRow] = out
          }).iterator()
        }
      }
    }
  }
}
