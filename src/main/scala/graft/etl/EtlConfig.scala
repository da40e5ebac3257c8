package graft.etl

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Runtime configuration for the git ETL, mirroring the reference's
  * `Config` (config.rs:7-13): an optional repository ignore-list and an
  * optional email→name author map (looked up by email, overriding the
  * author *name* only — repository.rs:167-171).
  *
  * Parsed from the same minimal TOML shape the reference documents
  * (README.md:30-43):
  * {{{
  * ignored_repositories = ["vendor", "archive"]
  * [author_map]
  * "alias@example.com" = "Canonical Name"
  * }}}
  * Only that subset is supported (string arrays + one string-to-string
  * table) — a full TOML parser is not available offline and the
  * reference uses nothing more.
  */
final case class EtlConfig(
    ignoredRepositories: Seq[String] = Nil,
    authorMap: Map[String, String] = Map.empty)

object EtlConfig {

  /** Load an explicitly-named config file. Missing/unreadable paths
    * fail loudly — a typo'd --config silently ignoring the ignore-list
    * and author map is far worse than an error (the reference errors
    * on unreadable config too).
    */
  def load(path: Path): EtlConfig = {
    if (!Files.isRegularFile(path))
      throw new java.io.FileNotFoundException(s"config file not found: $path")
    parse(Files.readAllLines(path).asScala.toSeq)
  }

  /** CLI config resolution, matching the reference's default-lookup
    * semantics (analyzer.rs:53-54, 137-144): an explicitly passed path
    * must exist (loud failure, see [[load]]); with NO explicit path,
    * `config.toml` under `cwd` is picked up when present and silently
    * skipped when absent — the reference's clap default + `if
    * config_path.exists()` fallback.
    */
  def resolve(explicit: Option[Path],
      cwd: Path = java.nio.file.Paths.get(".")): EtlConfig =
    explicit match {
      case Some(p) => load(p)
      case None =>
        val default = cwd.resolve("config.toml")
        if (Files.isRegularFile(default)) load(default) else EtlConfig()
    }

  /** Minimal TOML-subset parser: top-level `ignored_repositories`
    * string array + `[author_map]` table of quoted pairs.
    */
  def parse(lines: Seq[String]): EtlConfig = {
    var section = ""
    var ignored = Vector.empty[String]
    var authors = Map.empty[String, String]
    val arrayRe  = """ignored_repositories\s*=\s*\[(.*)\]""".r
    val tableRe  = """\[(\w+)\]""".r
    val pairRe   = """"([^"]*)"\s*=\s*"([^"]*)"""".r

    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case arrayRe(body) if section.isEmpty =>
        ignored ++= """"([^"]*)"""".r.findAllMatchIn(body).map(_.group(1))
      case tableRe(name) => section = name
      case pairRe(k, v) if section == "author_map" => authors += (k -> v)
      case _ => // unknown keys ignored, as in the reference's serde defaults
    }
    EtlConfig(ignored, authors)
  }
}
