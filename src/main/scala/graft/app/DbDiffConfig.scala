package graft.app

import java.nio.file.{Files, Paths}

/** Connection settings, field-for-field the reference's `Db` struct
  * (`/root/reference/configuration.go:15-23`). For the parquet lake source
  * (`dbType = "parquet"`) `name` is the table directory and the remaining
  * connection fields are unused; for JDBC dialects they feed
  * [[graft.sources.JdbcSnapshots.jdbcUrl]]. */
final case class DbConfig(
    dbType: String = "",
    host: String = "",
    port: String = "",
    user: String = "",
    password: String = "",
    name: String = "",
    schema: String = "")

final case class DbDiffConfig(db: DbConfig)

/** S1: configuration loading (`/root/reference/configuration.go:25-69`).
  *
  * The reference unmarshals a two-level YAML document (`db:` section with
  * scalar fields — `testdata/configuration/test_config_normal.yaml`). The
  * build environment has no YAML dependency, so this is a parser for exactly
  * that YAML subset: top-level `section:` headers, indented `key: value`
  * scalars, `#` comments, blank lines, optional single/double quotes.
  * Anything outside the subset (a line with no colon, tabs, nested depth)
  * fails loudly like the reference's invalid-config test expects
  * (`configuration_test.go`, `test_config_invalid.yaml`).
  */
object DbDiffConfig {
  /** `cmd/dbdiff/main.go:19` (extension swapped for the YAML twin). */
  val DefaultConfigPath = "configuration.yaml"

  def load(path: String): DbDiffConfig = {
    val p = if (path.isEmpty) DefaultConfigPath else path
    parse(Files.readString(Paths.get(p)))
  }

  def parse(text: String): DbDiffConfig = {
    var section: Option[String] = None
    var fields = Map.empty[(String, String), String]
    text.linesIterator.zipWithIndex.foreach { case (raw, i) =>
      val line = stripComment(raw)
      if (line.trim.nonEmpty) {
        if (line.contains('\t'))
          fail(i, raw, "tabs are not valid YAML indentation")
        val indented = line.startsWith(" ")
        line.split(":", 2) match {
          case Array(k, v) if !indented && v.trim.isEmpty =>
            section = Some(k.trim)
          case Array(k, v) if indented =>
            section match {
              case Some(s) => fields += (s, k.trim) -> unquote(v.trim)
              case None    => fail(i, raw, "indented value outside any section")
            }
          case Array(_, _) => fail(i, raw, "top-level scalar not in the db-config schema")
          case _           => fail(i, raw, "expected 'key: value'")
        }
      }
    }
    def f(k: String) = fields.getOrElse(("db", k), "")
    DbDiffConfig(DbConfig(
      dbType = f("type"), host = f("host"), port = f("port"), user = f("user"),
      password = f("password"), name = f("name"), schema = f("schema")))
  }

  /** YAML treats `#` as a comment only at line start or after whitespace,
    * and never inside a quoted scalar — `password: "p#ss"` keeps its hash. */
  private def stripComment(raw: String): String = {
    var quote: Char = 0
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      // a quote opens a quoted scalar only at the start of a value (after
      // whitespace or ':'); a mid-word apostrophe (`dont'tell`) is plain
      // text in YAML and must not swallow a trailing comment
      val opensQuote = (c == '"' || c == '\'') &&
        (i == 0 || raw.charAt(i - 1).isWhitespace || raw.charAt(i - 1) == ':')
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (opensQuote) quote = c
      else if (c == '#' && (i == 0 || raw.charAt(i - 1).isWhitespace))
        return raw.substring(0, i)
      i += 1
    }
    raw
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  private def fail(lineNo: Int, line: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"invalid configuration at line ${lineNo + 1}: '$line' ($why)")
}
