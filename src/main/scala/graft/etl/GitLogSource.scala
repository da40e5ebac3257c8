package graft.etl

import java.io.File
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.sys.process._
import scala.util.Try

/** One extracted commit, pre-normalization (the analog of the
  * reference's `GitLog`, log.rs:6-25, plus the repo identity carried
  * alongside instead of a SQLite FK).
  */
final case class CommitRow(
    repo_name: String,
    repo_path: String,
    repo_url: String,
    commit_hash: String,
    parent_hash: String,
    author_name: String,
    author_email: String,
    commit_epoch: Long,
    message: String,
    insertions: Long,
    deletions: Long,
    changed_files: Seq[String])

/** Git history extraction via `git log` text parsing (the JVM has no
  * bundled JGit in /opt/spark/jars, and libgit2 is C — parsing
  * porcelain output is the portable executor-side path).
  *
  * Semantics reproduced from the reference (SURVEY.md §1.3):
  *  - merge commits excluded (`--no-merges` ≡ parent_count() < 2,
  *    repository.rs:112);
  *  - root commits diff against the empty tree, parent_hash = 40×'0'
  *    (repository.rs:119-133, 175);
  *  - first-parent diffs only (implicit in `git log` for non-merges,
  *    repository.rs:120);
  *  - exact-match rename/copy detection (`-M100% -C100%` ≡
  *    find_similar(exact_match_only), repository.rs:142-147), with the
  *    NEW path recorded (repository.rs:149-152);
  *  - submodules ignored (`-c diff.ignoreSubmodules=all`,
  *    repository.rs:137);
  *  - sentinel defaults, never NULL: "(no author name)",
  *    "(no author email)", "(no commit summary)", "(no remote url)"
  *    (repository.rs:164-179, 192);
  *  - remote URL rewrite git@github.com: → https://github.com/
  *    (repository.rs:193);
  *  - commit time is COMMITTER time (`%ct` ≡ commit.time().seconds(),
  *    repository.rs:178) — author time differs on rebased/cherry-picked
  *    commits.
  *
  * Known limitation: a filename containing a literal " => " is
  * indistinguishable from git's rename marker in `--numstat` text
  * output and resolves to its suffix; the unambiguous fix is the
  * NUL-separated `-z` protocol.
  */
object GitLogSource {

  val ZeroOid = "0" * 40
  val NoAuthorName  = "(no author name)"
  val NoAuthorEmail = "(no author email)"
  val NoSummary     = "(no commit summary)"
  val NoRemoteUrl   = "(no remote url)"

  // \x01 marks a commit header, \x02 separates fields — both are
  // impossible in git metadata, so parsing is unambiguous even for
  // messages containing tabs/newlines (summary is %s: first line only,
  // like commit.summary() at repository.rs:179).
  private val HeaderMark = '\u0001'
  private val FieldSep   = '\u0002'

  /** Directory scan (analyzer.rs:102-135): immediate subdirectories of
    * `root` up to `maxDepth`, excluding `.git` dirs and configured
    * ignores. Returns (candidates, ignored) — candidates are *all*
    * non-ignored dirs; non-repos among them surface later as skipped,
    * matching the reference's report (analyzer.rs:255-263).
    */
  def scanDirectories(
      root: Path, maxDepth: Int, ignored: Seq[String]): (Seq[Path], Seq[String]) = {
    // Manual per-directory listing instead of Files.walk: one
    // unreadable subdirectory must not abort the whole scan (walk's
    // iterator throws UncheckedIOException mid-traversal and can't be
    // resumed), and each stream is closed deterministically.
    def children(dir: Path): Vector[Path] = {
      val stream = Try(Files.list(dir))
      stream.map { st =>
        try st.iterator().asScala.filter(Files.isDirectory(_)).toVector
        finally st.close()
      }.getOrElse(Vector.empty) // unreadable dir -> skipped, not fatal
    }
    def walk(dir: Path, depth: Int): Vector[Path] =
      if (depth <= 0) Vector.empty
      else children(dir)
        .filter(_.getFileName.toString != ".git") // never descend into .git
        .flatMap(c => c +: walk(c, depth - 1))
    val all = walk(root, maxDepth).sortBy(_.toString)
    val (ig, keep) = all.partition(p => ignored.contains(p.getFileName.toString))
    (keep, ig.map(_.getFileName.toString))
  }

  private def isBareRepo(p: Path): Boolean =
    Files.isRegularFile(p.resolve("HEAD")) && Files.isDirectory(p.resolve("objects"))

  private def remoteUrl(dir: File): String = {
    val raw = Try(
      Process(Seq("git", "config", "--get", "remote.origin.url"), dir).!!.trim
    ).toOption.filter(_.nonEmpty).getOrElse(NoRemoteUrl)
    raw.replace("git@github.com:", "https://github.com/")
  }

  /** The one git-log command both extraction paths share.
    * core.quotePath=false keeps non-ASCII paths raw (git's default
    * C-quotes/octal-escapes them in numstat output, which would diverge
    * from the reference's raw libgit2 paths).
    */
  private def logCommand: Seq[String] = Seq(
    "git", "-c", "diff.ignoreSubmodules=all", "-c", "core.quotePath=false", "log",
    "--no-merges", "--date-order", "--numstat",
    "--find-renames=100%", "--find-copies=100%",
    s"--pretty=format:$HeaderMark%H$FieldSep%P$FieldSep%an$FieldSep%ae$FieldSep%ct$FieldSep%s")

  /** Cheap repo validation for the report pass: confirms the path is a
    * git repository with a resolvable HEAD without reading any history.
    */
  def validateRepo(path: Path): Option[String] = {
    if (!(Files.isDirectory(path.resolve(".git")) || isBareRepo(path)))
      Some(s"not a git repository: $path")
    else {
      val ok = Try(Process(Seq("git", "rev-parse", "--verify", "HEAD"), path.toFile).!!).isSuccess
      if (ok) None else Some(s"cannot resolve HEAD in $path")
    }
  }

  /** Stream one repository's commits WITHOUT materializing the whole
    * history: `git log` output is consumed line-by-line through a lazy
    * iterator, so executor memory per repo is O(one commit), not
    * O(history) — the reference holds the entire repo in a Vec
    * (repository.rs:114,185), which SURVEY.md §4 flags as its OOM risk
    * at scale; this is the Spark-side fix.
    */
  def streamRepo(path: Path): Iterator[CommitRow] = {
    val name = path.getFileName.toString
    val url  = remoteUrl(path.toFile)
    // lazyLines (not lazyLines_!) throws when the stream ends with a
    // nonzero exit status: a git failure mid-history becomes a LOUD
    // task failure instead of silently truncating the repo's commits
    // while the report still lists it as analyzed.
    val lines = Process(logCommand, path.toFile).lazyLines
    parseLines(lines.iterator, name, path.toString, url)
  }

  /** Incremental block parser over `git log --numstat` lines. */
  def parseLines(
      lines: Iterator[String], repoName: String, repoPath: String,
      url: String): Iterator[CommitRow] = new Iterator[CommitRow] {
    private var current: CommitRow = null
    private var ins = 0L
    private var del = 0L
    private var files = Vector.newBuilder[String]
    private var pending: CommitRow = null
    private var done = false

    private def finishCurrent(): CommitRow = {
      val r = current.copy(insertions = ins, deletions = del, changed_files = files.result())
      current = null; ins = 0L; del = 0L; files = Vector.newBuilder[String]
      r
    }

    private def advance(): Unit = {
      while (pending == null && !done) {
        if (!lines.hasNext) {
          done = true
          if (current != null) pending = finishCurrent()
        } else {
          val line = lines.next()
          if (line.nonEmpty && line.charAt(0) == HeaderMark) {
            if (current != null) pending = finishCurrent()
            val f = line.substring(1).split(FieldSep.toString, -1)
            val parents = f(1).split(' ').filter(_.nonEmpty)
            current = CommitRow(
              repo_name = repoName, repo_path = repoPath, repo_url = url,
              commit_hash = f(0),
              parent_hash = parents.headOption.getOrElse(ZeroOid),
              author_name = if (f(2).isEmpty) NoAuthorName else f(2),
              author_email = if (f(3).isEmpty) NoAuthorEmail else f(3),
              commit_epoch = f(4).toLong,
              message = if (f(5).isEmpty) NoSummary else f(5),
              insertions = 0L, deletions = 0L, changed_files = Nil)
          } else if (line.nonEmpty && current != null) {
            val parts = line.split('\t')
            if (parts.length >= 3) {
              ins += Try(parts(0).toLong).getOrElse(0L)
              del += Try(parts(1).toLong).getOrElse(0L)
              files += newPath(parts.drop(2).mkString("\t"))
            }
          }
        }
      }
    }

    override def hasNext: Boolean = { advance(); pending != null }
    override def next(): CommitRow = {
      advance()
      if (pending == null) throw new NoSuchElementException
      val r = pending; pending = null; r
    }
  }

  /** Parse a complete `git log --numstat` dump (delegates to the
    * incremental parser; used by tests).
    */
  def parseLog(
      out: String, repoName: String, repoPath: String, url: String): Seq[CommitRow] =
    parseLines(out.linesIterator, repoName, repoPath, url).toVector

  /** Resolve a numstat path to the delta's NEW path
    * (repository.rs:149-152): handles both `old => new` and the
    * brace form `dir/{old => new}/file`.
    */
  // hoisted: newPath runs once per changed file — millions of calls on
  // a large history; recompiling the pattern per call is pure overhead
  private val BraceRename = """\{([^{}]*) => ([^{}]*)\}""".r

  def newPath(p: String): String = {
    val replaced = BraceRename.replaceAllIn(p, m => scala.util.matching.Regex.quoteReplacement(m.group(2)))
    val flat = replaced.indexOf(" => ")
    val cleaned = if (flat >= 0) replaced.substring(flat + 4) else replaced
    cleaned.replace("//", "/")
  }

}
