package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.edn.Edn
import graft.edn.Edn._
import graft.model.SchemaRegistry
import graft.store.Store

/** A Datalog front-end over the EAV store — the query language the
  * reference actually speaks (`examples/explore_db.clj`). Queries are
  * EDN (parsed by graft.edn); planning is plain DataFrame
  * construction, exactly as SURVEY §4 anticipated: each `[e a v]`
  * pattern is an attribute-pruned EAV scan, shared variables become
  * equi-joins (Catalyst reorders/broadcasts), `:find` aggregates
  * become groupBy.
  *
  * Supported surface (covers every query in the reference examples):
  *   [:find ?var (count ?var) (count-distinct ?v) (min …) (max …) (sum …)
  *    :in $ ?param …
  *    :where [?e :attr ?v] [?e ?a _] …]
  * Constants: keywords, strings, longs, uuids. `_` is a wildcard.
  */
object Datalog {

  sealed trait Term
  final case class TVar(name: String) extends Term
  case object TWild extends Term
  final case class TConst(value: Edn) extends Term

  sealed trait FindElem
  final case class FVar(name: String) extends FindElem
  final case class FAgg(fn: String, varName: String) extends FindElem

  final case class Pattern(e: Term, a: Term, v: Term)
  final case class Query(find: Seq[FindElem], in: Seq[String], patterns: Seq[Pattern])

  def parse(ednText: String): Query = {
    val items = Edn.parse(ednText) match {
      case EVec(xs) => xs
      case other => throw new IllegalArgumentException(s"query must be a vector: $other")
    }
    val sections = scala.collection.mutable.Map[String, Vector[Edn]]()
    var current: String = null
    items.foreach {
      case EKw("", kw @ ("find" | "in" | "where")) =>
        current = kw; sections.getOrElseUpdate(kw, Vector())
      case form =>
        require(current != null, s"form before :find/:in/:where: ${Edn.print(form)}")
        sections(current) = sections(current) :+ form
    }
    val find = sections.getOrElse("find", Vector()).map {
      case ESym("", v) if v.startsWith("?") => FVar(v.drop(1))
      case EList(Vector(ESym("", fn), ESym("", v))) if v.startsWith("?") =>
        FAgg(fn, v.drop(1))
      case other => throw new IllegalArgumentException(s"bad :find element: ${Edn.print(other)}")
    }
    require(find.nonEmpty, "query needs :find")
    val in = sections.getOrElse("in", Vector()).collect {
      case ESym("", v) if v.startsWith("?") => v.drop(1)
      // `$` (the db) is implicit
    }
    val patterns = sections.getOrElse("where", Vector()).map {
      case EVec(terms) if terms.size == 3 =>
        Pattern(term(terms(0)), term(terms(1)), term(terms(2)))
      case other => throw new IllegalArgumentException(s"bad :where clause: ${Edn.print(other)}")
    }
    require(patterns.nonEmpty, "query needs :where")
    Query(find, in, patterns)
  }

  private def term(e: Edn): Term = e match {
    case ESym("", "_") => TWild
    case ESym("", v) if v.startsWith("?") => TVar(v.drop(1))
    case other => TConst(other)
  }

  /** Constant → the store's value text. Keyword values match ref
    * attrs' `ident|…` keys when the pattern names a ref attribute. */
  private def constText(c: Edn, attr: Option[String], registry: SchemaRegistry): String =
    c match {
      case k: EKw =>
        if (attr.exists(registry.isRef)) s"ident|${k.qualified}" else k.qualified
      case other => graft.store.Datoms.scalarText(other)
    }

  def run(store: Store, registry: SchemaRegistry, q: Query,
      args: Map[String, Edn] = Map.empty): DataFrame =
    runOn(store.eav, registry, q, args)

  /** Plan the query over any EAV-shaped DataFrame (e, a, v). */
  def runOn(eav: DataFrame, registry: SchemaRegistry, q: Query,
      args: Map[String, Edn]): DataFrame = {
    val missing = q.in.filterNot(args.contains)
    require(missing.isEmpty, s"unbound :in parameters: $missing")

    // substitute :in parameters, then plan each pattern as a pruned scan
    def resolve(t: Term): Term = t match {
      case TVar(n) if args.contains(n) => TConst(args(n))
      case other => other
    }

    var plan: Option[DataFrame] = None
    q.patterns.zipWithIndex.foreach { case (p0, idx) =>
      val p = Pattern(resolve(p0.e), resolve(p0.a), resolve(p0.v))
      val attrConst = p.a match {
        case TConst(k: EKw) => Some(k.qualified)
        case _ => None
      }
      var scan = eav.select(col("e"), col("a"), col("v"))
      attrConst.foreach(a => scan = scan.filter(col("a") === a))
      p.e match {
        case TConst(c) => scan = scan.filter(col("e") === constText(c, None, registry))
        case _ => ()
      }
      p.v match {
        case TConst(c) => scan = scan.filter(col("v") === constText(c, attrConst, registry))
        case _ => ()
      }
      // project pattern variables to var-named columns
      def bind(t: Term, src: String): Option[(String, String)] = t match {
        case TVar(n) => Some(n -> src)
        case _ => None
      }
      val binds = Seq(bind(p.e, "e"), bind(p.a, "a"), bind(p.v, "v")).flatten
      // a variable appearing twice IN ONE pattern ⇒ intra-pattern equality
      binds.groupBy(_._1).values.filter(_.size > 1).foreach { dup =>
        dup.map(_._2).sliding(2).foreach {
          case Seq(c1, c2) => scan = scan.filter(col(c1) === col(c2))
          case _ => ()
        }
      }
      val uniqueBinds = binds.distinctBy(_._1)
      val projected = scan.select(uniqueBinds.map { case (n, src) =>
        col(src).as(s"var_$n") }: _*)
      plan = plan match {
        case None => Some(projected)
        case Some(acc) =>
          val shared = acc.columns.intersect(projected.columns).toSeq
          Some(if (shared.nonEmpty) acc.join(projected, shared)
               else acc.crossJoin(projected))
      }
    }
    val joined = plan.get

    val aggs = q.find.collect { case a: FAgg => a }
    val plainVars = q.find.collect { case FVar(n) => n }
    if (aggs.isEmpty) {
      joined.select(plainVars.map(n => col(s"var_$n").as(n)): _*).distinct()
    } else {
      // Datomic :find is set-semantics: bindings dedupe BEFORE the
      // aggregate (no :with support here), so (count ?e) counts
      // distinct bindings
      val bindingVars = (plainVars ++ aggs.map(_.varName)).distinct
      val joinedSet = joined.select(bindingVars.map(n => col(s"var_$n")): _*).distinct()
      val aggCols = aggs.map {
        case FAgg("count", v) => count(col(s"var_$v")).as(s"count_$v")
        case FAgg("count-distinct", v) => countDistinct(col(s"var_$v")).as(s"count_distinct_$v")
        case FAgg("min", v) => min(col(s"var_$v")).as(s"min_$v")
        case FAgg("max", v) => max(col(s"var_$v")).as(s"max_$v")
        case FAgg("sum", v) => sum(col(s"var_$v").cast("double")).as(s"sum_$v")
        case FAgg(fn, _) => throw new IllegalArgumentException(s"unsupported aggregate: $fn")
      }
      if (plainVars.isEmpty) joinedSet.agg(aggCols.head, aggCols.tail: _*)
      else joinedSet.groupBy(plainVars.map(n => col(s"var_$n").as(n)): _*)
        .agg(aggCols.head, aggCols.tail: _*)
    }
  }
}
