package graft.catalog

import graft.dsl.Ast._
import scala.util.chaining._

/** Catalog rewrites applied between introspection and DDL — the
  * reference's process-catalog step (migrate-database.lisp:253-302):
  * INCLUDING/EXCLUDING table filters (api.lisp:142-147), ALTER SCHEMA
  * renames and ALTER TABLE NAMES MATCHING rules (alter-table.lisp;
  * ddl/common.clj:427-496).
  */
object CatalogRewrite {

  private def matchesAny(pats: Seq[NamePattern], name: String): Boolean =
    pats.exists(_.matches(name))

  /** The INCLUDING/EXCLUDING predicate for one table — shared by
    * [[filter]] and by pre-DDL checks that must see the SAME table set
    * the migration will actually touch (a preflight that runs on the
    * unfiltered catalog aborts on tables the user explicitly
    * excluded). */
  def kept(schemaName: String, tableName: String,
           including: Seq[TableFilter],
           excluding: Seq[TableFilter]): Boolean = {
    val inc = including.filter(_.inSchema.forall(_ == schemaName))
    val exc = excluding.filter(_.inSchema.forall(_ == schemaName))
    val included =
      including.isEmpty || inc.exists(f => matchesAny(f.patterns, tableName))
    val excluded = exc.exists(f => matchesAny(f.patterns, tableName))
    included && !excluded
  }

  /** Keep only tables passing INCLUDING (when present) and not matching
    * EXCLUDING; filters scoped to a schema only apply there. */
  def filter(cat: Catalog, including: Seq[TableFilter],
             excluding: Seq[TableFilter]): Catalog = {
    val filtered = cat.copy(schemas = cat.schemas.map { s =>
      s.copy(tables = s.tables.filter(t =>
        kept(s.name, t.name, including, excluding)))
    })
    // prune fkeys pointing at tables the filter removed — they were
    // never created on the target, so an unpruned REFERENCES would fail
    // in the post phase and flip the whole run's exit code (the
    // reference prunes these too). Keyed by (schema, name): the
    // REFERENCES clause resolves in the fkey's foreign schema (its
    // owning schema when unset), so a same-named survivor in a
    // DIFFERENT schema must not save the fkey.
    val surviving = filtered.schemas
      .flatMap(s => s.tables.map(t => (s.name, t.name))).toSet
    val pruned = filtered.copy(schemas = filtered.schemas.map { s =>
      s.copy(tables = s.tables.map { t =>
        t.copy(fkeys = t.fkeys.filter(fk =>
          surviving.contains((fk.foreignSchemaOr(s.name),
            fk.foreignTable))))
      })
    })
    // a FILTERED migration must not touch objects outside its scope:
    // keep only the sequences some KEPT table's nextval default
    // references (an unqualified reference matches the name in any
    // schema — over-keeping is harmless; under `include drop` an
    // out-of-scope DROP SEQUENCE … CASCADE would strip defaults from
    // unrelated target tables). Unfiltered runs keep every sequence —
    // a standalone counter is part of the whole-database contract.
    if (including.isEmpty && excluding.isEmpty) pruned
    else {
      // precise content class, not greedy .*: a default carrying TWO
      // nextval('a'), nextval('b') calls would otherwise capture one
      // garbage name spanning both and prune BOTH sequences (ADVICE
      // r20; quote-doubling inside a name cannot contain '::regclass)
      val refs = pruned.schemas.flatMap(_.tables)
        .flatMap(_.fields.flatMap(_.default)).flatMap(d =>
          NextvalRef.findAllMatchIn(d)
            .map(_.group(1).replace("''", "'")).toSeq)
        .map(graft.sinks.PgWire.splitQualified)
      pruned.copy(sequences = pruned.sequences.filter(sq =>
        refs.exists { case (sch, rel) =>
          rel == sq.name && sch.forall(_ == sq.schema) }))
    }
  }

  /** TARGET identifier casing for TABLE-level names (params.lisp
    * *identifier-case*: downcase by default, `snake_case identifiers`,
    * `quote identifiers` preserves): Table.name, the SCHEMA names
    * (catalog.lisp:279; ddl/common.clj:385 cases :schema too), INDEX
    * names (common.clj:395), user SEQUENCES, plus the index/FK table
    * references, so every DDL surface lands on one spelling.
    * `sourceName`/`sourceSchema` stay RAW — they are what the source
    * reads by. Custom types (pg-source domains/composites/ranges) keep
    * their source spelling: their bodies are server-rendered SQL text
    * whose embedded type references cannot be re-cased, and every
    * emission site quotes them exactly. Runs for every Migrator caller
    * (Migrate.migrate applies it), so the Ddl emitters never fold —
    * they quote-if-needed the FINAL name. */
  def caseTargets(cat: Catalog, mode: Identifiers.Case): Catalog = {
    def ic(n: String) = Identifiers(n, mode)
    cat.copy(
      schemas = cat.schemas.map(s => s.copy(
        name = ic(s.name),
        tables = s.tables.map(t => t.copy(
          name = ic(t.name),
          schema = ic(t.schema),
          sourceSchema = t.sourceSchemaName,
          indexes = t.indexes.map(i => i.copy(name = ic(i.name),
            table = ic(i.table))),
          fkeys = t.fkeys.map(f => f.copy(table = ic(f.table),
            foreignTable = ic(f.foreignTable),
            foreignSchema =
              if (f.foreignSchema.isEmpty) "" else ic(f.foreignSchema))),
          checks = t.checks.map(c => c.copy(name = c.name.map(ic))),
          exclusions =
            t.exclusions.map(x => x.copy(name = x.name.map(ic))))))),
      sequences = cat.sequences.map(sq =>
        sq.copy(schema = ic(sq.schema), name = ic(sq.name))))
  }

  /** The COLUMN half of [[caseTargets]], applied AFTER the cast builds
    * the target-shape ColumnDefs (the source-shape `fields` keep their
    * raw spellings for the readers): column names plus the index/FK
    * column references. Database COPY stays positional, so data
    * routing is unaffected. */
  def caseColumns(cat: Catalog, mode: Identifiers.Case): Catalog = {
    def ic(n: String) = Identifiers(n, mode)
    cat.copy(schemas = cat.schemas.map(s =>
      s.copy(tables = s.tables.map(t => t.copy(
        columns = {
          // generation expressions are server SQL referencing SOURCE
          // column spellings — recase those references like kept
          // indexDefs, or a downcased column breaks the generated DDL
          val srcCols = t.fields.map(_.name).toSet
          t.columns.map(c => c.copy(name = ic(c.name),
            generated = c.generated.map(g =>
              if (srcCols.nonEmpty) recaseSqlRefs(g, srcCols, ic)
              else g),
            // a verbatim nextval default references a standalone user
            // sequence by its SOURCE spelling; the sequence object is
            // cased by caseTargets, so the reference must follow
            default = c.default.map(recaseNextval(_, ic))))
        },
        indexes = {
          // expression indexes kept as pg_get_indexdef text reference
          // PLAIN columns by their SOURCE spellings (the USING tail is
          // verbatim server SQL): recase those references too, or a
          // downcased/snake_cased column makes the CREATE INDEX fail
          // ("userId" does not exist when the column became user_id)
          val srcCols = t.fields.map(_.name).toSet
          t.indexes.map { i =>
            val cased = i.copy(columns = i.columns.map(ic),
              // the partial-index predicate (pg_get_expr of indpred) is
              // verbatim server SQL too — unrecased it references the
              // SOURCE spelling and the CREATE INDEX fails as a
              // tolerated ddlError, silently losing the index
              filter = i.filter.map(f =>
                if (srcCols.nonEmpty) recaseSqlRefs(f, srcCols, ic)
                else f))
            i.indexDef match {
              case Some(d) if srcCols.nonEmpty =>
                cased.copy(indexDef = Some(recaseIndexDef(d, srcCols, ic)))
              case _ => cased
            }
          }
        },
        fkeys = t.fkeys.map(f => f.copy(
          columns = f.columns.map(ic),
          foreignColumns = f.foreignColumns.map(ic))),
        exclusions = {
          // EXCLUDE clauses are verbatim server SQL referencing source
          // column spellings — recase like kept index definitions
          val srcCols = t.fields.map(_.name).toSet
          t.exclusions.map(x =>
            if (srcCols.nonEmpty)
              x.copy(expr = recaseSqlRefs(x.expr, srcCols, ic))
            else x)
        },
        checks = {
          // CHECK expressions are verbatim server SQL too (pg sources;
          // mysql/sqlite check text is rewritten with raw spellings) —
          // an unrecased `("MyCol" > 0)` fails the post-load ADD under
          // fold modes and the constraint is silently lost to ddlErrors
          val srcCols = t.fields.map(_.name).toSet
          t.checks.map(c =>
            if (srcCols.nonEmpty)
              c.copy(expr = recaseSqlRefs(c.expr, srcCols, ic))
            else c)
        })))))
  }

  /** Recase column references inside a kept `pg_get_indexdef`
    * rendering. Only the tail after USING is rewritten (the head's
    * index/table names are rebuilt by [[Ddl.createIndex]] from the
    * cased catalog anyway, and an index NAMED like a column must not
    * be touched). A reference is: a quoted identifier whose unescaped
    * content equals a source column name exactly, or a bare word that
    * equals one and is NOT followed by '(' (a function call) — PG
    * renders bare only the names that need no quoting, so a column
    * needing case-preservation always arrives quoted. Rewritten
    * references are emitted always-quoted with the CASED spelling;
    * string literals pass through verbatim. */
  private[graft] def recaseIndexDef(defn: String, srcCols: Set[String],
                                    ic: String => String): String = {
    // QUOTE-AWARE head split (ADVICE r20): the old lazy regex
    // (.*?\s+ON\s+ … \s+USING\s+) could mis-split when a quoted index
    // or table name itself contains " on " / " using ", recasing part
    // of the head. Scan for the first USING keyword OUTSIDE any
    // double-quoted identifier or single-quoted literal instead —
    // pg_get_indexdef always renders the access method there, before
    // any expression that could carry its own (quoted or literal)
    // "using" text.
    val s = defn.trim
    val n = s.length
    if (!s.regionMatches(true, 0, "CREATE", 0, 6)) return defn
    var i = 0
    var usingPos = -1
    while (i < n && usingPos < 0) {
      val c = s(i)
      if (c == '"' || c == '\'') {
        val q = c
        i += 1
        var done = false
        while (i < n && !done) {
          if (s(i) == q) {
            if (i + 1 < n && s(i + 1) == q) i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
      } else if ((c == 'u' || c == 'U') &&
          s.regionMatches(true, i, "USING", 0, 5) &&
          (i == 0 || { val p = s(i - 1)
            !p.isLetterOrDigit && p != '_' && p != '"' }) &&
          (i + 5 >= n || { val nx = s(i + 5)
            !nx.isLetterOrDigit && nx != '_' })) {
        usingPos = i
      } else i += 1
    }
    if (usingPos < 0) defn
    else {
      var j = usingPos + 5
      while (j < n && s(j).isWhitespace) j += 1
      s.substring(0, j) + recaseSqlRefs(s.substring(j), srcCols, ic)
    }
  }

  /** Recase the sequence reference inside a verbatim
    * `nextval('…'::regclass)` default (a standalone user sequence —
    * serial-owned defaults were dropped at introspection). The inner
    * literal is a quote_ident-rendered, possibly schema-qualified
    * name; parse it with the shared quote-aware splitter, recase the
    * parts, and re-render always-quoted (PG resolves the literal to a
    * regclass OID at DDL time and pg_get_expr re-renders canonically,
    * so the spelling choice never leaks into catalog compares).
    * Anything that is not exactly a nextval default passes through. */
  /** Every `nextval('…'::regclass)` call inside ANY default expression
    * — not only defaults that are exactly one call: a composite
    * default (COALESCE(…, nextval(…))) must keep its sequence
    * reference consistent with the renamed/recased sequence OBJECT
    * (ADVICE r20). The literal's content class ((?:[^']|'')*) is
    * exact: quote-doubled names cannot contain a bare '::regclass. */
  private val NextvalRef =
    "(?is)nextval\\('((?:[^']|'')*)'::regclass\\)".r

  private[graft] def recaseNextval(default: String,
                            ic: String => String): String =
    NextvalRef.replaceAllIn(default, m => {
      val inner = m.group(1).replace("''", "'")
      val (schema, rel) = graft.sinks.PgWire.splitQualified(inner)
      val cased = (schema.map(s => quoteAlways(ic(s))).toSeq :+
        quoteAlways(ic(rel))).mkString(".")
      scala.util.matching.Regex.quoteReplacement(
        s"nextval('${cased.replace("'", "''")}'::regclass)")
    })

  private def quoteAlways(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  private def recaseSqlRefs(sql: String, srcCols: Set[String],
                            ic: String => String): String = {
    val out = new StringBuilder(sql.length + 16)
    def quoted(name: String): String =
      "\"" + name.replace("\"", "\"\"") + "\""
    var i = 0
    val n = sql.length
    while (i < n) {
      sql(i) match {
        case '"' =>
          val name = new StringBuilder
          i += 1
          var open = true
          while (i < n && open) {
            if (sql(i) == '"') {
              if (i + 1 < n && sql(i + 1) == '"') { name += '"'; i += 2 }
              else { open = false; i += 1 }
            } else { name += sql(i); i += 1 }
          }
          val nm = name.toString
          out ++= quoted(if (srcCols(nm)) ic(nm) else nm)
        case '\'' =>
          // string literal, '' doubling — verbatim
          out += '\''
          i += 1
          var open = true
          while (i < n && open) {
            if (sql(i) == '\'') {
              if (i + 1 < n && sql(i + 1) == '\'') { out ++= "''"; i += 2 }
              else { out += '\''; open = false; i += 1 }
            } else { out += sql(i); i += 1 }
          }
        case c if c.isLetter || c == '_' =>
          var j = i
          while (j < n && (sql(j).isLetterOrDigit || sql(j) == '_' ||
            sql(j) == '$')) j += 1
          val word = sql.substring(i, j)
          var k = j
          while (k < n && sql(k).isWhitespace) k += 1
          val isCall = k < n && sql(k) == '('
          if (!isCall && srcCols(word)) out ++= quoted(ic(word))
          else out ++= word
          i = j
        case c => out += c; i += 1
      }
    }
    out.toString
  }

  /** `ALTER SCHEMA 'a' RENAME TO 'b'`. */
  def alterSchema(cat: Catalog, renames: Seq[(String, String)]): Catalog = {
    val m = renames.toMap
    cat.copy(
      schemas = cat.schemas.map { s =>
        m.get(s.name) match {
          case Some(to) => s.copy(name = to,
            // capture the schema the source still reads by BEFORE the
            // rename — the pg/mssql read paths qualify their source
            // queries with it, and an uncaptured rename would redirect
            // the reads to the (target-only) new schema
            tables = s.tables.map(t =>
              t.copy(schema = to, sourceSchema = t.sourceSchemaName)))
          case None => s
        }
      },
      // sequences follow their schema's rename — left behind, they
      // would silently re-create and populate the OLD schema on the
      // target while every table lands in the new one
      sequences = cat.sequences.map { sq =>
        m.get(sq.schema) match {
          case Some(to) => sq.copy(schema = to)
          case None => sq
        }
      })
      // cross-schema REFERENCES follow the rename too — a stale
      // explicit foreignSchema would point post-phase FK DDL at the
      // old (absent) schema
      .pipe(c => c.copy(schemas = c.schemas.map(s2 =>
        s2.copy(tables = s2.tables.map(t2 =>
          t2.copy(
            fkeys = t2.fkeys.map(fk =>
              if (fk.foreignSchema.nonEmpty && m.contains(fk.foreignSchema))
                fk.copy(foreignSchema = m(fk.foreignSchema))
              else fk),
            // verbatim nextval defaults reference their sequence by the
            // SOURCE schema spelling; the sequence object followed the
            // rename above, so the reference must too — applied to ALL
            // tables (a table in schema B may default from A's
            // sequence), and on the SOURCE fields (the cast copies the
            // default into the target ColumnDefs later)
            fields = t2.fields.map(f => f.copy(
              default = f.default.map(renameNextvalSchema(_, m))))))))))
  }

  /** Rewrite the schema inside a `nextval('…'::regclass)` default when
    * that schema was renamed. An UNQUALIFIED reference resolved via the
    * source search_path (public) — if public itself is renamed, the
    * rewritten default must qualify explicitly, because the target
    * resolves unqualified names in ITS OWN search_path. */
  private[graft] def renameNextvalSchema(default: String,
                                  m: Map[String, String]): String =
    // rewrite every nextval reference inside the expression (composite
    // defaults included — ADVICE r20); calls whose schema is not
    // renamed pass through verbatim
    NextvalRef.replaceAllIn(default, mm => {
      val inner = mm.group(1).replace("''", "'")
      val (sch, rel) = graft.sinks.PgWire.splitQualified(inner)
      val renamed = sch match {
        case Some(s0) => m.get(s0)
        case None => m.get("public")
      }
      scala.util.matching.Regex.quoteReplacement(renamed match {
        case Some(to) =>
          val lit = (quoteAlways(to) + "." + quoteAlways(rel))
            .replace("'", "''")
          s"nextval('$lit'::regclass)"
        case None => mm.matched
      })
    })

  /** `ALTER TABLE NAMES MATCHING … RENAME TO / SET SCHEMA …`. First
    * matching rule wins per table; SET SCHEMA moves the table between
    * schema nodes (creating the target schema node if needed). */
  def alterTable(cat: Catalog, rules: Seq[AlterTableRule]): Catalog = {
    if (rules.isEmpty) return cat
    // apply renames in place, collect schema moves; a rename must
    // follow through to the table's OWN index/fkey back-references AND
    // to every other table's fkeys pointing at it — left stale, the
    // post phase emits CREATE INDEX/REFERENCES against the OLD name
    // and every statement fails with "relation does not exist"
    var moved = Seq.empty[(Table, String)]
    // keyed by (schema, old name): fkey targets resolve in the OWNING
    // table's schema, so a rename in schema A must not retarget a
    // same-named fkey reference in schema B
    var renames = Map.empty[(String, String), String]
    val renamed = cat.schemas.map { s =>
      s.copy(tables = s.tables.flatMap { t =>
        rules.find(r => matchesAny(r.patterns, t.name)) match {
          case Some(AlterTableRule(_, RenameTo(n))) =>
            renames += (s.name, t.name) -> n
            Some(t.copy(name = n,
              indexes = t.indexes.map(_.copy(table = n)),
              fkeys = t.fkeys.map(_.copy(table = n))))
          case Some(AlterTableRule(_, SetSchema(target))) =>
            // same source-read capture as the schema rename above
            moved :+= (t.copy(schema = target,
              sourceSchema = t.sourceSchemaName), target); None
          case _ => Some(t) // tablespace/params don't reshape the catalog
        }
      })
    }
    val refFixed =
      if (renames.isEmpty) renamed
      else renamed.map { s =>
        s.copy(tables = s.tables.map { t =>
          t.copy(fkeys = t.fkeys.map { fk =>
            renames.get((fk.foreignSchemaOr(s.name),
                fk.foreignTable)) match {
              case Some(n) => fk.copy(foreignTable = n)
              case None => fk
            }
          })
        })
      }
    val bySchema = moved.groupBy(_._2)
    val withMoves = refFixed.map { s =>
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

  /** PG index names are SCHEMA-scoped; sources like MySQL/MSSQL scope
    * them per-table, so two tables can both carry `idx_name` and the
    * second CREATE INDEX would collide. The reference uniquifies by
    * appending the table OID (core.clj:746-753 "index name is not unique"
    * → `name_oid`); with no OID available here the suffix is the position
    * of the duplicate. First occurrence keeps its name. PK indexes are
    * left alone — their names come from the table and stay unique. */
  def uniquifyIndexNames(cat: Catalog): Catalog = {
    val seen = scala.collection.mutable.Map.empty[(String, String), Int]
    cat.copy(schemas = cat.schemas.map { s =>
      s.copy(tables = s.tables.map { t =>
        t.copy(indexes = t.indexes.map { i =>
          val key = (s.name, i.name)
          val n = seen.getOrElse(key, 0)
          seen(key) = n + 1
          if (n == 0) i
          else {
            // truncate the BASE, never the suffix: for a 63-byte name,
            // truncate63(name_N) cuts the suffix back off and the
            // "uniquified" name still collides
            val suffix = s"_$n"
            val base = i.name.getBytes("UTF-8")
            val room = 63 - suffix.getBytes("UTF-8").length
            var m = math.min(base.length, room)
            // back off to a UTF-8 codepoint boundary
            while (m > 0 && m < base.length && (base(m) & 0xC0) == 0x80)
              m -= 1
            i.copy(name = new String(base, 0, m, "UTF-8") + suffix)
          }
        })
      })
    })
  }
}

/** Source index WHERE-filter → PG expression rewrite
  * (src/sources/mssql/mssql-index-filters.lisp:1-185): MSSQL emits
  * filters like `([deleted]=(0) AND [type]<>N'x')`; PG wants
  * `deleted = 0 AND type <> 'x'`. A tokenizing rewrite, not a full SQL
  * parser — exactly the surface the reference's esrap rules cover:
  * bracket-quoted identifiers, parenthesized numeric literals, N'…'
  * unicode strings, IS [NOT] NULL, AND/OR, comparison operators. */
object IndexFilters {

  def mssqlToPg(filter: String): String = {
    var s = filter.trim
    // strip ONE level of wrapping parens if they enclose the whole expr
    while (s.startsWith("(") && s.endsWith(")") && balanced(s.substring(1,
        s.length - 1)))
      s = s.substring(1, s.length - 1).trim
    // rewrite CODE segments only — string literals pass through verbatim
    // (minus the N unicode prefix): regexes applied to the whole text
    // would corrupt values like 'N', 'a=b' or '(1)'
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val nPrefixed = (c == 'N' || c == 'n') && i + 1 < s.length &&
        s.charAt(i + 1) == '\''
      if (c == '\'' || nPrefixed) {
        val start = if (nPrefixed) i + 1 else i // drop the N prefix
        var j = start + 1
        var closed = false
        while (!closed && j < s.length) {
          if (s.charAt(j) == '\'') {
            if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2 // ''
            else closed = true
          } else j += 1
        }
        out ++= s.substring(start, math.min(j + 1, s.length))
        i = j + 1
      } else {
        var j = i
        while (j < s.length && s.charAt(j) != '\'' &&
               !((s.charAt(j) == 'N' || s.charAt(j) == 'n') &&
                 j + 1 < s.length && s.charAt(j + 1) == '\'')) j += 1
        out ++= rewriteCodeSegment(s.substring(i, j))
        i = j
      }
    }
    out.toString.trim
  }

  private def rewriteCodeSegment(seg: String): String = {
    var s = seg
    // [ident] → ident (quote if it needs it)
    s = "\\[([^\\]]+)\\]".r.replaceAllIn(s, m => {
      val id = m.group(1)
      java.util.regex.Matcher.quoteReplacement(
        // migrated column names are downcased, so the quoted form must
        // be too — "My Col" would reference a non-existent column
        if (Identifiers.needsQuoting(id.toLowerCase))
          "\"" + id.toLowerCase + "\""
        else id.toLowerCase)
    })
    // (123) / (12.5) parenthesized numerics → bare
    s = "\\((-?\\d+(?:\\.\\d+)?)\\)".r.replaceAllIn(s, "$1")
    // spacing around comparison operators
    s = s.replaceAll("\\s*(<>|<=|>=|!=|=|<|>)\\s*", " $1 ")
    s.replaceAll("\\s+", " ")
  }

  private def balanced(s: String): Boolean = {
    var depth = 0
    s.foreach {
      case '(' => depth += 1
      case ')' => depth -= 1; if (depth < 0) return false
      case _ =>
    }
    depth == 0
  }
}
