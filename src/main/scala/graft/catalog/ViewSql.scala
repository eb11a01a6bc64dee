package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** The SQL-statement surface for graft views ([[GraftViewStore]] has the
  * why-both-hooks story). Injected in [[graft.Sessions]]:
  *
  *  - `injectParser` → [[GraftViewParser]]: rewrites CREATE/DROP/SHOW
  *    VIEW statements whose target names a graft catalog into runnable
  *    commands, BEFORE the analyzer's `ResolveSessionCatalog` can refuse
  *    them with MISSING_CATALOG_ABILITY.
  *  - `injectResolutionRule` → [[GraftResolveViews]]: splices a view's
  *    stored SQL under any `UnresolvedRelation` the built-in resolver
  *    left unresolved that names a stored graft view.
  */
private[graft] class GraftViewParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftViewDdl.rewrite(session, delegate.parsePlan(sqlText))

  // the parameterized entry point (spark.sql(text, args)) does not route
  // through parsePlan — rewrite its result too, or a parameterized
  // CREATE VIEW would slip past interception into the analyzer's refusal
  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    GraftViewDdl.rewrite(session, delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private[graft] object GraftViewDdl {

  /** Resolve a statement's target identifier to a graft catalog, using
    * the session's CURRENT catalog for 1/2-part names. Returns the
    * catalog name + catalog-relative identifier only when that catalog
    * is a [[GraftCatalog]] — anything else passes through to Spark
    * untouched. */
  private def graftTarget(ss: SparkSession,
                          parts: Seq[String]): Option[(String, Identifier)] = {
    // >= 3 parts ALWAYS read as catalog.ns....name — falling back to the
    // current catalog there would hijack other catalogs' DDL whenever the
    // current catalog happens to be graft
    val (cat, rest) =
      if (parts.length >= 3) (parts.head, parts.tail)
      else (ss.sessionState.catalogManager.currentCatalog.name(), parts)
    if (GraftViewStore.graftRoot(ss, cat).isEmpty) None
    else {
      val ns = if (rest.length >= 2) rest.init
        else ss.sessionState.catalogManager.currentNamespace.toSeq
      Some((cat, Identifier.of(ns.toArray, rest.last)))
    }
  }

  /** Session temp views win bare-name resolution everywhere else in
    * Spark; statements naming one must NOT be hijacked by the current
    * catalog being graft (code-review r13 finding). */
  private def isTempView(ss: SparkSession, parts: Seq[String]): Boolean =
    ss.sessionState.catalog.isTempView(parts)

  def rewrite(ss: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case c @ CreateView(UnresolvedIdentifier(parts, _), _, _, _, _, _, _, _, _, _) =>
      graftTarget(ss, parts) match {
        case Some((cat, ident)) =>
          require(c.userSpecifiedColumns.isEmpty,
            "graft views do not support a column list; alias inside the SELECT instead")
          require(c.collation.isEmpty, "graft views do not support DEFAULT COLLATION")
          val sql = c.originalText.getOrElse(throw new IllegalArgumentException(
            "CREATE VIEW needs the original query text"))
          CreateGraftViewCommand(cat, ident, sql, c.comment, c.properties,
            c.allowExisting, c.replace)
        case None => plan
      }
    case d @ DropView(UnresolvedIdentifier(parts, _), _) if !isTempView(ss, parts) =>
      graftTarget(ss, parts) match {
        case Some((cat, ident)) => DropGraftViewCommand(cat, ident, d.ifExists)
        case None => plan
      }
    case a @ AlterViewAs(UnresolvedView(parts, _, _, _), _, _) if !isTempView(ss, parts) =>
      graftTarget(ss, parts) match {
        case Some((cat, ident)) =>
          // redefine = validated replace that KEEPS comment/props (the
          // statement's documented semantics); the command reuses the
          // create path with mustExist
          CreateGraftViewCommand(cat, ident, a.originalText, comment = None,
            props = Map.empty, allowExisting = false, replace = true,
            mustExist = true)
        case None => plan
      }
    case ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      // SHOW VIEWS names a NAMESPACE, not a view: parts = catalog [+ ns].
      // A head that names a registered NON-graft catalog must pass
      // through to Spark — treating it as a namespace of the (graft)
      // current catalog would hijack the other catalog's listing
      // (ADVICE r13).
      val headIsGraft = parts.nonEmpty &&
        GraftViewStore.graftRoot(ss, parts.head).isDefined
      val headIsOtherCatalog = !headIsGraft && parts.nonEmpty &&
        ss.sessionState.catalogManager.isCatalogRegistered(parts.head)
      if (headIsOtherCatalog) plan
      else {
        val (cat, ns) =
          if (headIsGraft) (parts.head, parts.tail)
          else (ss.sessionState.catalogManager.currentCatalog.name(), parts)
        if (GraftViewStore.graftRoot(ss, cat).isEmpty) plan
        else ShowGraftViewsCommand(cat, ns, pattern, output)
      }
    case ShowViews(org.apache.spark.sql.catalyst.analysis.CurrentNamespace, pattern, output) =>
      // bare `SHOW VIEWS` parses with CurrentNamespace, not
      // UnresolvedNamespace (verified against the 4.1.2 AstBuilder)
      val cat = ss.sessionState.catalogManager.currentCatalog.name()
      if (GraftViewStore.graftRoot(ss, cat).isEmpty) plan
      else ShowGraftViewsCommand(cat,
        ss.sessionState.catalogManager.currentNamespace.toSeq, pattern, output)
    case _ => plan
  }
}

/** `CREATE [OR REPLACE] VIEW <graft-cat>.<ns>.<v> AS <query>`: analyze
  * the query in the CURRENT session context (validates it and yields the
  * stored schema), refuse cycles, persist the original text + context.
  * Metadata only — nothing runs at create beyond analysis. */
private[graft] case class CreateGraftViewCommand(catalogName: String, ident: Identifier,
                                                 sql: String, comment: Option[String],
                                                 props: Map[String, String],
                                                 allowExisting: Boolean, replace: Boolean,
                                                 mustExist: Boolean = false)
    extends LeafRunnableCommand {

  private def fullNameOf(i: Identifier): String =
    (catalogName +: i.namespace() :+ i.name()).mkString(".")

  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val exists = cat.viewExists(ident)
    if (mustExist && !exists) // ALTER VIEW ... AS on a missing view
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    if (exists) {
      if (allowExisting) return Nil
      if (!replace) throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    }
    val ctxCatalog = session.sessionState.catalogManager.currentCatalog.name()
    val ctxNamespace = session.sessionState.catalogManager.currentNamespace.toSeq
    // a PERSISTENT view must not capture a session-lifetime object: the
    // create-time analysis below would resolve the temp view and succeed,
    // but the read-time qualifier would rewrite the bare name into the
    // stored catalog context — a not-found error at best, a same-named
    // catalog table silently substituted at worst (Spark's native
    // persistent views refuse this for the same reason). CTEs substitute
    // FIRST, mirroring the read path: a body whose own CTE name shadows
    // a same-named temp view is legitimate, not a capture (ADVICE r13).
    CTESubstitution.apply(session.sessionState.sqlParser.parsePlan(sql)).collectWithSubqueries {
      case u: UnresolvedRelation
          if session.sessionState.catalog.isTempView(u.multipartIdentifier) =>
        throw new IllegalArgumentException(
          s"cannot create persistent view ${fullNameOf(ident)}: the body references " +
            s"temporary view ${u.multipartIdentifier.mkString(".")}, whose lifetime is " +
            "this session; inline it or persist it first")
    }
    GraftViewStore.assertAcyclic(session,
      (catalogName, ident.namespace().toSeq, ident.name()), sql, ctxCatalog, ctxNamespace)
    // full analysis of the body under the creating session's context:
    // bad references/types fail HERE, not at the first read
    val analyzed = session.sql(sql)
    // ALTER VIEW AS keeps the existing comment/props (its documented
    // semantics); CREATE OR REPLACE takes the statement's
    val kept: Map[String, String] =
      if (mustExist)
        GraftViewStore.load(session, catalogName, ident.namespace().toSeq, ident.name())
          .map(d => d.props ++ d.comment.map(ViewCatalog.PROP_COMMENT -> _))
          .getOrElse(Map.empty)
      else props ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ident, sql, ctxCatalog, ctxNamespace.toArray,
      analyzed.schema, analyzed.schema.fieldNames, Array.empty, Array.empty,
      kept.foldLeft(new java.util.HashMap[String, String]()) { (m, kv) =>
        m.put(kv._1, kv._2); m })
    // replace swaps the stored definition in ONE atomic write — no
    // drop-then-create window where a crash loses the view or a
    // concurrent reader gets TABLE_OR_VIEW_NOT_FOUND (ADVICE r13)
    if (exists) cat.replaceView(info) else cat.createView(info)
    Nil
  }
}

private[graft] case class DropGraftViewCommand(catalogName: String, ident: Identifier,
                                               ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

/** `SHOW VIEWS IN <graft-cat>.<ns> [LIKE 'pattern']` — same output shape
  * as Spark's own (namespace, viewName, isTemporary). */
private[graft] case class ShowGraftViewsCommand(catalogName: String, namespace: Seq[String],
                                                pattern: Option[String],
                                                override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val names = cat.listViews(namespace: _*).map(_.name()).toSeq.sorted
    val kept = pattern.fold(names)(p =>
      org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p))
    kept.map(n => Row(namespace.mkString("."), n, false))
  }
}

/** Read-path resolution: an [[UnresolvedRelation]] the built-ins left
  * behind that names a stored graft view becomes its parsed definition —
  * CTEs substituted (the analyzer's own CTESubstitution batch ran before
  * this subtree existed), bare names qualified with the view's stored
  * context, the whole thing wrapped in a SubqueryAlias carrying the
  * view's name for plan readability and self-join disambiguation.
  * Views-on-views resolve one layer per fixed-point iteration; cycles
  * were refused at CREATE time. */
private[graft] class GraftResolveViews(session: SparkSession) extends Rule[LogicalPlan] {

  // subquery-expression plans reach this rule through the analyzer's own
  // recursive subquery resolution, so plain resolveOperatorsUp suffices
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming =>
        lookup(u.multipartIdentifier) match {
          case Some((fullParts, d)) => substitute(fullParts, d)
          case None => u
        }
    }

  private def lookup(parts: Seq[String]): Option[(Seq[String], GraftViewStore.ViewDef)] = {
    val (cat, ns, name) =
      if (parts.length >= 3) (parts.head, parts.tail.init, parts.last)
      else {
        val cur = session.sessionState.catalogManager.currentCatalog.name()
        val curNs =
          if (parts.length == 2) parts.init
          else session.sessionState.catalogManager.currentNamespace.toSeq
        (cur, curNs, parts.last)
      }
    GraftViewStore.load(session, cat, ns, name).map(d => ((cat +: ns) :+ name, d))
  }

  private def substitute(fullParts: Seq[String], d: GraftViewStore.ViewDef): LogicalPlan = {
    val parsed = session.sessionState.sqlParser.parsePlan(d.sql)
    // the analyzer's CTESubstitution batch ran before this subtree was
    // spliced in — run it on the view body explicitly
    val withCtes = CTESubstitution.apply(parsed)
    val qualified = withCtes.transformDownWithSubqueries {
      case inner: UnresolvedRelation if inner.multipartIdentifier.length < 3 =>
        val (c, n, t) = GraftViewStore.resolveParts(
          inner.multipartIdentifier, d.catalog, d.namespace)
        inner.copy(multipartIdentifier = (c +: n) :+ t)
    }
    SubqueryAlias(fullParts, qualified)
  }
}
