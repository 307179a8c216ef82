package graft.catalog

import graft.dsl.Ast._

/** Catalog rewrites applied between introspection and DDL — the
  * reference's process-catalog step (migrate-database.lisp:253-302):
  * INCLUDING/EXCLUDING table filters (api.lisp:142-147), ALTER SCHEMA
  * renames and ALTER TABLE NAMES MATCHING rules (alter-table.lisp;
  * ddl/common.clj:427-496).
  */
object CatalogRewrite {

  private def matchesAny(pats: Seq[NamePattern], name: String): Boolean =
    pats.exists(_.matches(name))

  /** Keep only tables passing INCLUDING (when present) and not matching
    * EXCLUDING; filters scoped to a schema only apply there. */
  def filter(cat: Catalog, including: Seq[TableFilter],
             excluding: Seq[TableFilter]): Catalog =
    cat.copy(schemas = cat.schemas.map { s =>
      s.copy(tables = s.tables.filter { t =>
        val inc = including.filter(_.inSchema.forall(_ == s.name))
        val exc = excluding.filter(_.inSchema.forall(_ == s.name))
        val included =
          including.isEmpty || inc.exists(f => matchesAny(f.patterns, t.name))
        val excluded = exc.exists(f => matchesAny(f.patterns, t.name))
        included && !excluded
      })
    })

  /** `ALTER SCHEMA 'a' RENAME TO 'b'`. */
  def alterSchema(cat: Catalog, renames: Seq[(String, String)]): Catalog = {
    val m = renames.toMap
    cat.copy(schemas = cat.schemas.map { s =>
      m.get(s.name) match {
        case Some(to) => s.copy(name = to,
          tables = s.tables.map(_.copy(schema = to)))
        case None => s
      }
    })
  }

  /** `ALTER TABLE NAMES MATCHING … RENAME TO / SET SCHEMA …`. First
    * matching rule wins per table; SET SCHEMA moves the table between
    * schema nodes (creating the target schema node if needed). */
  def alterTable(cat: Catalog, rules: Seq[AlterTableRule]): Catalog = {
    if (rules.isEmpty) return cat
    // apply renames in place, collect schema moves
    var moved = Seq.empty[(Table, String)]
    val renamed = cat.schemas.map { s =>
      s.copy(tables = s.tables.flatMap { t =>
        rules.find(r => matchesAny(r.patterns, t.name)) match {
          case Some(AlterTableRule(_, RenameTo(n))) =>
            Some(t.copy(name = n))
          case Some(AlterTableRule(_, SetSchema(target))) =>
            moved :+= (t.copy(schema = target), target); None
          case _ => Some(t) // tablespace/params don't reshape the catalog
        }
      })
    }
    val bySchema = moved.groupBy(_._2)
    val withMoves = renamed.map { s =>
      bySchema.get(s.name) match {
        case Some(ts) => s.copy(tables = s.tables ++ ts.map(_._1))
        case None => s
      }
    }
    val existing = withMoves.map(_.name).toSet
    val newSchemas = bySchema.keys.filterNot(existing).toSeq.sorted.map {
      name => Schema(name = name, tables = bySchema(name).map(_._1))
    }
    cat.copy(schemas = withMoves ++ newSchemas)
  }
}
