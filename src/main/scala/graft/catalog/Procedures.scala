package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-parity SYSTEM PROCEDURES served through Spark 4's native
  * `CALL` statement (SPARK-44167): `CALL cat.system.expire_snapshots
  * ('nyc.t', 3)` and friends — the maintenance UX the reference's users
  * get from Iceberg's procedure catalog. Each procedure is driver-side
  * metadata work delegating to the corresponding [[GraftCatalog]] verb
  * (or [[graft.etl.Maintenance]] for the rewrite), and returns its report
  * as a [[LocalScan]] — no job, same cost model as the metadata tables. */
private[catalog] object GraftProcedures {

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  val names: Seq[String] = Seq("expire_snapshots", "rollback_to_snapshot",
    "create_branch", "fast_forward", "drop_branch", "create_tag", "drop_tag",
    "rewrite_data_files", "rebuild_vector_index", "compact_text_index")

  def load(cat: GraftCatalog, pname: String): Option[UnboundProcedure] = {
    def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
    def nsT(r: InternalRow): (String, String) = {
      val parts = str(r, 0).split('.')
      require(parts.length == 2,
        s"table must be 'namespace.table', got '${str(r, 0)}'")
      (parts(0), parts(1))
    }
    def utf(s: String) = UTF8String.fromString(s)
    pname match {
      case "expire_snapshots" => Some(proc(pname,
        Seq(p("table", StringType), p("keep_last", IntegerType)),
        StructType(Seq(
          StructField("expired_snapshots", IntegerType, nullable = false),
          StructField("deleted_files", IntegerType, nullable = false),
          StructField("remaining_snapshots", IntegerType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val r = cat.expireSnapshots(ns, t, in.getInt(1))
        Seq(new GenericInternalRow(Array[Any](
          r.expiredSnapshots, r.deletedFiles, r.remainingSnapshots)))
      })
      case "rollback_to_snapshot" => Some(proc(pname,
        Seq(p("table", StringType), p("snapshot_id", LongType)),
        StructType(Seq(
          StructField("previous_snapshot_id", LongType, nullable = false),
          StructField("current_snapshot_id", LongType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val prev = cat.loadTable(ns, t).currentSnapshotId
        val m = cat.rollbackTo(ns, t, in.getLong(1))
        Seq(new GenericInternalRow(Array[Any](prev, m.currentSnapshotId)))
      })
      case "create_branch" => Some(proc(pname,
        Seq(p("table", StringType), p("branch", StringType)),
        StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("fork_snapshot_id", LongType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val b = str(in, 1)
        val m = cat.createBranch(ns, t, b)
        Seq(new GenericInternalRow(Array[Any](utf(b), m.branchOf(b).forkId)))
      })
      case "fast_forward" => Some(proc(pname,
        Seq(p("table", StringType), p("branch", StringType)),
        StructType(Seq(
          StructField("current_snapshot_id", LongType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val m = cat.fastForward(ns, t, str(in, 1))
        Seq(new GenericInternalRow(Array[Any](m.currentSnapshotId)))
      })
      case "drop_branch" => Some(proc(pname,
        Seq(p("table", StringType), p("branch", StringType)),
        StructType(Seq(
          StructField("dropped", StringType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val b = str(in, 1)
        cat.dropBranch(ns, t, b)
        Seq(new GenericInternalRow(Array[Any](utf(b))))
      })
      case "create_tag" => Some(proc(pname,
        Seq(p("table", StringType), p("tag", StringType),
          p("snapshot_id", LongType)),
        StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("snapshot_id", LongType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        cat.createTag(ns, t, str(in, 1), in.getLong(2))
        Seq(new GenericInternalRow(Array[Any](utf(str(in, 1)), in.getLong(2))))
      })
      case "drop_tag" => Some(proc(pname,
        Seq(p("table", StringType), p("tag", StringType)),
        StructType(Seq(
          StructField("dropped", StringType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        cat.dropTag(ns, t, str(in, 1))
        Seq(new GenericInternalRow(Array[Any](utf(str(in, 1)))))
      })
      case "rewrite_data_files" => Some(proc(pname,
        Seq(p("table", StringType),
          ProcedureParameter.in("target_file_bytes", LongType)
            .defaultValue((512L * 1024 * 1024).toString).build()),
        StructType(Seq(
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val before = cat.files(ns, t).size
        graft.etl.Maintenance.optimize(SparkSession.active, cat, ns, t,
          targetFileBytes = in.getLong(1))
        Seq(new GenericInternalRow(Array[Any](before, cat.files(ns, t).size)))
      })
      // The drift half of the FAISS index contract the codes tables
      // document ("the index GROWS, the model doesn't retrain; drift is
      // a periodic REBUILD"): retrain both quantizer halves on the
      // CURRENT corpus (read from the vector source-of-truth parquet)
      // and re-encode in overwrite snapshots — time travel still reaches
      // every pre-rebuild index state. One corpus-sized encode scan;
      // training is the bounded driver-side sample protocol
      // ([[graft.operators.IvfPq.initIndex]]).
      case "rebuild_vector_index" => Some(proc(pname,
        Seq(p("table", StringType), p("source_parquet", StringType)),
        StructType(Seq(
          StructField("cells_before", IntegerType, nullable = false),
          StructField("cells_after", IntegerType, nullable = false),
          StructField("vectors_indexed", LongType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val spark = SparkSession.active
        val emb = spark.read.parquet(str(in, 1))
        val before = cat.readTable(spark, ns, s"${t}_ivfpq_cells").count().toInt
        graft.operators.IvfPq.buildIndex(spark, cat, ns, t, emb)
        val after = cat.readTable(spark, ns, s"${t}_ivfpq_cells").count().toInt
        val n = cat.readTable(spark, ns, s"${t}_ivfpq_codes").count()
        Seq(new GenericInternalRow(Array[Any](before, after, n)))
      })
      // the inverted text index's maintenance verb ([[graft.operators
      // .TextIndex.compactIndex]]): re-cluster all live postings into
      // the canonical layout and fold the stats deltas — one linear
      // pass, answer-invariant (etl_text_index_compact exercises it
      // through this SQL surface)
      case "compact_text_index" => Some(proc(pname,
        Seq(p("table", StringType)),
        StructType(Seq(
          StructField("files_before", IntegerType, nullable = false),
          StructField("files_after", IntegerType, nullable = false)))) { in =>
        val (ns, t) = nsT(in)
        val spark = SparkSession.active
        val before = cat.files(ns, s"${t}_postings").size
        graft.operators.TextIndex.compactIndex(spark, cat, ns, t)
        Seq(new GenericInternalRow(Array[Any](before,
          cat.files(ns, s"${t}_postings").size)))
      })
      case _ => None
    }
  }

  private def proc(pname: String, params: Seq[ProcedureParameter],
                   out: StructType)
                  (body: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = s"graft system procedure $pname"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = s"graft system procedure $pname"
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val out0 = body(input).toArray
            java.util.List.of[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = out0
              override def readSchema(): StructType = out
              override def description(): String = pname
            }).iterator()
          }
        }
    }
}
