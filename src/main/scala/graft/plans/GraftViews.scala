package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, NoSuchViewException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL views over the DSv2 catalog — the engine-side wiring Spark 4.1
  * does not ship. The connector API ([[ViewCatalog]]) exists and
  * [[graft.sources.GraftCatalog]] implements it, but the analyzer
  * routes every view COMMAND to the session catalog and throws
  * `MISSING_CATALOG_ABILITY` for anything else
  * (ResolveSessionCatalog), and nothing resolves a SELECT against a V2
  * view. These rules supply both halves — the public Iceberg pattern
  * (iceberg-spark's RewriteViewCommands / ResolveViews):
  *
  *   - [[GraftViewCommandRewrite]] runs in the HINT-resolution batch,
  *     which the analyzer applies before the Resolution batch where
  *     ResolveSessionCatalog would throw: CREATE/DROP/SHOW/ALTER view
  *     commands whose identifier lands in a [[ViewCatalog]] become
  *     graft commands.
  *   - [[GraftViewResolution]] (same batch, fixed-point, so views can
  *     nest) expands a read of a stored view into its parsed SQL with
  *     every inner table reference qualified against the view's STORED
  *     context — a view tracks its tables' CURRENT data, and renaming
  *     the session's current namespace after CREATE cannot re-bind it.
  *
  * Direct self-reference is detected and refused at expansion; a
  * longer cycle (a→b→a) is caught by the analyzer's fixed-point
  * iteration limit. Installed by [[GraftExtensions]].
  */
object GraftViews {
  private[plans] def viewCatalogAndIdent(spark: SparkSession,
      parts: Seq[String]): Option[(String, ViewCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    def asViewCat(name: String): Option[ViewCatalog] =
      if (!cm.isCatalogRegistered(name)) None
      else cm.catalog(name) match {
        case v: ViewCatalog => Some(v)
        case _ => None
      }
    // temp and global-temp views ALWAYS win over stored catalog views —
    // the precedence every Spark catalog observes; without this guard a
    // 1-part (or global_temp.x) reference would resolve to the stored
    // view in the hint batch, BEFORE the analyzer's own temp-view lookup
    if (parts.size <= 2 &&
        spark.sessionState.catalog.isTempView(parts)) None
    else if (parts.size >= 2) {
      if (cm.isCatalogRegistered(parts.head))
        // the head names a real catalog: route there or nowhere — a
        // registered NON-view catalog (spark_catalog) must NOT fall back
        // to a relative read under the current catalog
        asViewCat(parts.head).map(v =>
          (parts.head, v, Identifier.of(parts.tail.init.toArray, parts.last)))
      else cm.currentCatalog match {
        // relative reference under a current V2 view catalog
        case v: ViewCatalog =>
          Some((cm.currentCatalog.name(), v,
            Identifier.of(parts.init.toArray, parts.last)))
        case _ => None
      }
    } else if (parts.size == 1) {
      cm.currentCatalog match {
        case v: ViewCatalog =>
          Some((cm.currentCatalog.name(), v,
            Identifier.of(cm.currentNamespace, parts.head)))
        case _ => None
      }
    } else None
  }

  /** Qualify every table reference inside a view body against the
    * view's stored context, so the body means the same thing no matter
    * which catalog/namespace the READER currently sits in. A reference
    * whose head is itself a registered catalog stays as written. */
  private[plans] def qualify(spark: SparkSession, plan: LogicalPlan,
      ctxCatalog: String, ctxNamespace: Seq[String]): LogicalPlan = {
    val cm = spark.sessionState.catalogManager
    plan.transformDownWithSubqueries {
      case u: UnresolvedRelation if !cm.isCatalogRegistered(u.multipartIdentifier.head) =>
        val full =
          if (u.multipartIdentifier.size == 1)
            (ctxCatalog +: ctxNamespace) :+ u.multipartIdentifier.head
          else ctxCatalog +: u.multipartIdentifier
        u.copy(multipartIdentifier = full)
    }
  }

  private[plans] def expand(spark: SparkSession, catName: String,
      ident: Identifier, view: View): LogicalPlan = {
    val parsed = spark.sessionState.sqlParser.parsePlan(view.query)
    // WITH clauses inside the body: the analyzer's own Substitution
    // batch already ran for the OUTER plan, so inline them here
    val noCtes = CTESubstitution(parsed)
    val qualified = qualify(spark, noCtes,
      view.currentCatalog(), view.currentNamespace().toSeq)
    val self = (Seq(catName) ++ ident.namespace().toSeq :+ ident.name())
      .map(_.toLowerCase)
    qualified.collectWithSubqueries {
      case u: UnresolvedRelation
          if u.multipartIdentifier.map(_.toLowerCase) == self =>
        throw new IllegalStateException(
          s"recursive view: ${self.mkString(".")} references itself")
    }
    val aliased =
      if (view.columnAliases() != null && view.columnAliases().nonEmpty)
        Project(view.columnAliases().toSeq.zip(view.queryColumnNames().toSeq)
          .map { case (a, q) => Alias(UnresolvedAttribute.quoted(q), a)() },
          qualified)
      else qualified
    SubqueryAlias(Seq(catName) ++ ident.namespace().toSeq :+ ident.name(), aliased)
  }
}

case class GraftViewCommandRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViews.viewCatalogAndIdent

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, originalText, _, allowExisting, replace, _) =>
      viewCatalogAndIdent(spark, parts) match {
        case Some((_, cat, ident)) =>
          val sql = originalText.getOrElse(throw new IllegalArgumentException(
            "CREATE VIEW on a graft catalog requires the view SQL text"))
          GraftCreateViewCommand(cat, ident, cols, comment, props, sql,
            allowExisting, replace)
        case None => c
      }
    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      viewCatalogAndIdent(spark, parts) match {
        case Some((_, cat, ident)) => GraftDropViewCommand(cat, ident, ifExists)
        case None => d
      }
    case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      // SHOW VIEWS IN cat.db: the namespace parts carry the catalog
      val cm = spark.sessionState.catalogManager
      val (catName, ns) =
        if (parts.nonEmpty && cm.isCatalogRegistered(parts.head))
          (parts.head, parts.tail)
        else (cm.currentCatalog.name(), parts)
      if (cm.isCatalogRegistered(catName)) cm.catalog(catName) match {
        case v: ViewCatalog => GraftShowViewsCommand(v, ns, pattern, output)
        case _ => s
      } else s
    case a @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
      viewCatalogAndIdent(spark, parts) match {
        case Some((_, cat, ident)) =>
          GraftAlterViewPropsCommand(cat, ident, set = props, unset = Seq.empty)
        case None => a
      }
    case a @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _) =>
      viewCatalogAndIdent(spark, parts) match {
        case Some((_, cat, ident)) =>
          GraftAlterViewPropsCommand(cat, ident, set = Map.empty, unset = keys)
        case None => a
      }
    case r @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true) =>
      viewCatalogAndIdent(spark, parts) match {
        case Some((catName, cat, ident)) =>
          // ALTER VIEW ... RENAME TO takes a catalog-relative name; a
          // BARE name stays in the source view's namespace (an empty
          // namespace would silently move the file to the warehouse root)
          val toParts = if (newName.headOption.contains(catName)) newName.tail
            else newName
          val to =
            if (toParts.size == 1) Identifier.of(ident.namespace(), toParts.head)
            else Identifier.of(toParts.init.toArray, toParts.last)
          GraftRenameViewCommand(cat, ident, to)
        case None => r
      }
    case a @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, _) =>
      viewCatalogAndIdent(spark, parts) match {
        case Some((_, cat, ident)) =>
          GraftAlterViewAsCommand(cat, ident, originalText)
        case None => a
      }
    case _ => plan
  }
}

case class GraftViewResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftViews._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        viewCatalogAndIdent(spark, u.multipartIdentifier) match {
          case Some((catName, cat, ident)) if cat.viewExists(ident) =>
            expand(spark, catName, ident, cat.loadView(ident))
          case _ => u
        }
    }
}

/** Shared helper: analyze a view's SQL text to its schema + output
  * names, validating user column aliases. */
private[plans] object GraftViewAnalysis {
  def analyzed(spark: SparkSession, sql: String,
      userCols: Seq[(String, Option[String])]): (StructType, Array[String]) = {
    val qe = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(sql))
    qe.assertAnalyzed()
    val schema = qe.analyzed.schema
    require(userCols.isEmpty || userCols.size == schema.fields.length,
      s"view column list has ${userCols.size} names but the query produces " +
        s"${schema.fields.length} columns")
    (schema, schema.fieldNames)
  }

  def viewInfo(spark: SparkSession, cat: ViewCatalog, ident: Identifier,
      sql: String, userCols: Seq[(String, Option[String])],
      comment: Option[String], props: Map[String, String]): ViewInfo = {
    val (schema, qcols) = analyzed(spark, sql, userCols)
    val cm = spark.sessionState.catalogManager
    val outSchema =
      if (userCols.isEmpty) schema
      else StructType(schema.fields.zip(userCols).map { case (f, (n, _)) =>
        f.copy(name = n) })
    val allProps = props ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    new ViewInfo(ident, sql, cm.currentCatalog.name(), cm.currentNamespace,
      outSchema,
      qcols,
      userCols.map(_._1).toArray,
      userCols.map(_._2.orNull).toArray,
      scala.jdk.CollectionConverters.MapHasAsJava(allProps).asJava)
  }
}

case class GraftCreateViewCommand(cat: ViewCatalog, ident: Identifier,
    userCols: Seq[(String, Option[String])], comment: Option[String],
    props: Map[String, String], sql: String,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (replace) {
      cat.replaceView(
        GraftViewAnalysis.viewInfo(spark, cat, ident, sql, userCols, comment, props),
        true)
    } else if (allowExisting && cat.viewExists(ident)) {
      // CREATE VIEW IF NOT EXISTS: silently keep the existing definition
    } else {
      cat.createView(
        GraftViewAnalysis.viewInfo(spark, cat, ident, sql, userCols, comment, props))
    }
    Seq.empty
  }
}

case class GraftDropViewCommand(cat: ViewCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!cat.dropView(ident) && !ifExists)
      throw new NoSuchViewException(ident)
    Seq.empty
  }
}

case class GraftShowViewsCommand(cat: ViewCatalog, ns: Seq[String],
    pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val views = cat.listViews(ns: _*).toSeq.map(_.name())
    val kept = pattern.fold(views)(p =>
      org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(views, p))
    kept.sorted.map(v => Row(ns.mkString("."), v, false))
  }
}

case class GraftAlterViewPropsCommand(cat: ViewCatalog, ident: Identifier,
    set: Map[String, String], unset: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val changes = set.toSeq.sortBy(_._1)
      .map { case (k, v) => ViewChange.setProperty(k, v) } ++
      unset.map(ViewChange.removeProperty)
    cat.alterView(ident, changes: _*)
    Seq.empty
  }
}

case class GraftRenameViewCommand(cat: ViewCatalog, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    cat.renameView(from, to)
    Seq.empty
  }
}

case class GraftAlterViewAsCommand(cat: ViewCatalog, ident: Identifier,
    sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val prev = cat.loadView(ident)
    val props = scala.jdk.CollectionConverters.MapHasAsScala(prev.properties())
      .asScala.toMap.filterNot { case (k, _) =>
        k == ViewCatalog.PROP_COMMENT }
    cat.replaceView(
      GraftViewAnalysis.viewInfo(spark, cat, ident, sql, Seq.empty,
        Option(prev.properties().get(ViewCatalog.PROP_COMMENT)), props),
      false)
    Seq.empty
  }
}
