package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.edn.Edn
import graft.edn.Edn._
import graft.model.SchemaRegistry
import graft.store.Store

/** The reference's metaschema (`metaschema/mbrainz.edn`) declares its
  * own relational decomposition: which attrs denote tables and which
  * ref attrs join to which table (SURVEY §1.3 "the reference telling
  * us its own DataFrame decomposition"). This module parses it and
  * builds denormalized views by following those joins.
  */
object Metaschema {

  final case class Decl(tables: Set[String], joins: Map[String, String])

  def parse(ednText: String): Decl = {
    val m = Edn.parse(ednText).asInstanceOf[EMap]
    val tables = m.getKw("tables") match {
      case Some(t: EMap) => t.entries.map { case (k: EKw, _) => k.qualified; case _ => "" }.toSet
      case _ => Set.empty[String]
    }
    val joins = m.getKw("joins") match {
      case Some(j: EMap) => j.entries.collect {
        case (k: EKw, ESym("", table)) => k.qualified -> table
      }.toMap
      case _ => Map.empty[String, String]
    }
    Decl(tables, joins)
  }

  def load(path: String): Decl = parse(graft.sources.EdnSource.readText(path))

  /** Denormalize a ref attr per the metaschema join: each (entity,
    * target) edge resolved to the target's display attr. E.g.
    * `:release/artists → artist` joined through artist/name. */
  def resolveJoin(store: Store, registry: SchemaRegistry, decl: Decl,
      refAttr: String, displayAttr: String): DataFrame = {
    require(decl.joins.contains(refAttr), s"$refAttr is not a metaschema join")
    val cur = store.current(registry)
    val edges = cur.filter(col("a") === refAttr)
      .select(col("e"), col("v").as("target"))
    val display = cur.filter(col("a") === displayAttr)
      .select(col("e").as("target"), col("v").as("display"))
    edges.join(display, "target").select(col("e"), col("display").as(colName(displayAttr)))
  }

  private def colName(attr: String): String = attr.replace("/", "_")
}
