package graft.sinks

/** libpq-compatible connection resolution the reference supports on
  * every PostgreSQL URI (src/parsers/parse-pgpass.lisp; v4
  * pg_service.clj + load_file/ast.clj:90-110):
  *
  *   - `~/.pgpass` (or `$PGPASSFILE`): when a URI carries no password,
  *     look one up by (host, port, db, user). libpq line grammar:
  *     five `:`-separated fields with `\:` / `\\` escapes, `*`
  *     wildcards any field, `#`-comment and blank lines skip, FIRST
  *     match wins.
  *   - `?service=name` (resolved through `~/.pg_service.conf` or
  *     `$PGSERVICEFILE`): an INI section supplying
  *     host/port/dbname/user/password for the connection.
  */
object PgService {

  private[graft] def pgpassPath: String =
    sys.env.getOrElse("PGPASSFILE",
      System.getProperty("user.home") + "/.pgpass")

  private[graft] def servicePath: String =
    sys.env.getOrElse("PGSERVICEFILE",
      System.getProperty("user.home") + "/.pg_service.conf")

  /** Split one pgpass line on UNESCAPED colons, unescaping `\:` and
    * `\\` inside each field (libpq's own rule; a windows path like
    * `C\:\\x` stays one field). */
  private[graft] def splitPgpass(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '\\' if i + 1 < line.length =>
          cur.append(line.charAt(i + 1)); i += 2
        case ':' => out += cur.toString; cur.clear(); i += 1
        case c => cur.append(c); i += 1
      }
    }
    out += cur.toString
    out.result()
  }

  /** Password for (host, port, db, user) from the pgpass file; None
    * when the file is absent or nothing matches. */
  def pgpassLookup(host: String, port: Int, db: String, user: String,
                   path: String = null): Option[String] = {
    val f = new java.io.File(Option(path).getOrElse(pgpassPath))
    if (!f.isFile) return None
    def matches(pat: String, v: String) = pat == "*" || pat == v
    scala.io.Source.fromFile(f, "UTF-8").getLines()
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map(splitPgpass)
      .collectFirst {
        case Seq(h, p, d, u, pw)
            if matches(h, host) && matches(p, port.toString) &&
              matches(d, db) && matches(u, user) => pw
      }
  }

  final case class Service(host: String, port: Int, db: String,
                           user: String, password: String)

  /** A named section of pg_service.conf: host/port/dbname(|database)/
    * user/password, libpq defaults for the rest. */
  def serviceLookup(name: String, path: String = null): Option[Service] = {
    val f = new java.io.File(Option(path).getOrElse(servicePath))
    if (!f.isFile) return None
    var current: String = null
    val sections =
      scala.collection.mutable.Map[String, Map[String, String]]()
    scala.io.Source.fromFile(f, "UTF-8").getLines().foreach { l0 =>
      val l = l0.trim
      if (l.nonEmpty && !l.startsWith("#")) {
        if (l.startsWith("[") && l.endsWith("]")) {
          current = l.substring(1, l.length - 1)
          sections(current) = Map.empty
        } else if (current != null && l.contains('=')) {
          val Array(k, v) = l.split("=", 2)
          sections(current) += (k.trim -> v.trim)
        }
      }
    }
    sections.get(name).map { p =>
      Service(
        host = p.getOrElse("host", "localhost"),
        port = p.get("port").flatMap(_.toIntOption).getOrElse(5432),
        db = p.getOrElse("dbname", p.getOrElse("database", "")),
        user = p.getOrElse("user", ""),
        password = p.getOrElse("password", ""))
    }
  }
}
