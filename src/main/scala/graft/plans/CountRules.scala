package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule that answers a bare `COUNT(*)` over a versioned-lake
  * scan from MANIFEST METADATA alone — the table-format classic
  * (Delta/Iceberg do the same): every commit records each file's row
  * count from its parquet footer, so
  *
  *   SELECT count(*) FROM time_travel('<lake>', v)
  *
  * needs a manifest read, not a table scan. This is the planner half
  * of [[graft.sources.VersionedLake.rowCount]] / the `lake_row_count`
  * TVF, exactly as [[ZoneMapPrune]] is the planner half of
  * `read_range`: the explicit forms stay, the natural SQL gets the
  * optimization automatically.
  *
  * Scope guards (same discipline as ZoneMapPrune — a rule that fires
  * wrongly is worse than no rule):
  *  - Aggregate with NO grouping keys, DIRECTLY over a registered lake
  *    relation (an attribute-only Project in between is fine; a Filter
  *    is not — filtered counts must scan);
  *  - every aggregate expression is a plain `count(<non-null literal>)`
  *    (`count(*)` included) — no DISTINCT, no FILTER clause, no
  *    `count(col)` (null-sensitive), nothing else in the select list;
  *  - every file the scan covers is a manifest entry WITH a recorded
  *    row count (partition- or point-pruned scans still qualify: the
  *    count folds only the scanned files' entries; legacy entries
  *    without counts keep the scan).
  *
  * `spark.graft.countmeta.enabled=false` switches the rule off.
  */
case class LakeCountFromManifest(spark: SparkSession) extends Rule[LogicalPlan] {

  import LakeCountFromManifest._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(EnabledKey).forall(_.toBoolean)) return plan
    plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _)
          if groups.isEmpty && aggExprs.nonEmpty && aggExprs.forall(isPlainCount) =>
        (for {
          lr <- scanOf(child)
          info <- graft.sources.VersionedLake.zoneInfoFor(lr.relation)
          n <- countFromManifest(lr, info._1, info._2)
        } yield LocalRelation(agg.output,
          Seq(InternalRow.fromSeq(Seq.fill(aggExprs.size)(n)))))
          .getOrElse(agg)
    }
  }

  /** The lake relation, looked through an attribute-only Project
    * (column pruning routinely leaves one). Anything else — above all
    * a Filter — keeps the scan. */
  private def scanOf(p: LogicalPlan): Option[LogicalRelation] = p match {
    case lr: LogicalRelation => Some(lr)
    case Project(projectList, lr: LogicalRelation)
        if projectList.forall(_.isInstanceOf[AttributeReference]) => Some(lr)
    case _ => None
  }

  private def isPlainCount(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(children) =>
          children.forall(c => c.foldable && c.eval() != null)
        case _ => false
      })
    case _ => false
  }

  private def countFromManifest(lr: LogicalRelation, lakeDir: String,
      v: Int): Option[Long] = {
    val current = lr.relation match {
      case hfs: HadoopFsRelation =>
        hfs.location.inputFiles
          .map(graft.sources.VersionedLake.normalizePath).toSet
      case _ => return None
    }
    val entries = graft.sources.VersionedLake.manifestEntries(lakeDir, v)
      .filter(e => current.contains(
        graft.sources.VersionedLake.normalizePath(e.path)))
    if (entries.size != current.size || !entries.forall(_.rows.isDefined)) None
    else Some(entries.flatMap(_.rows).sum)
  }
}

object LakeCountFromManifest {
  val EnabledKey = "spark.graft.countmeta.enabled"

  /** Live-session installation, idempotent. */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[LakeCountFromManifest]))
      spark.experimental.extraOptimizations = existing :+ LakeCountFromManifest(spark)
  }
}
