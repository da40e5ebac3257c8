package graft.etl

import java.io.{BufferedInputStream, ByteArrayOutputStream, File, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
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

/** One executor-side extraction event — the union row type that lets a
  * single distributed pass produce the repositories dimension, the
  * commit stream, AND the failure report:
  *
  *  - kind="repo":   the path validated as a git repository (url set);
  *    emitted even when the history yields zero non-merge commits, so
  *    the repositories table includes empty/all-merge repos exactly as
  *    the reference does (analyzer.rs:299-310);
  *  - kind="commit": one extracted commit (commit set);
  *  - kind="error":  validation failed (error set) — the reference's
  *    silent skip (analyzer.rs:351) surfaced as data.
  */
final case class ExtractEvent(
    kind: String,
    repo_name: String,
    repo_path: String,
    repo_url: String,
    error: String,
    commit: CommitRow,
    // incremental-extraction metadata, set on kind="repo" events of the
    // since-snapshot path only (GitEtlIncr): the repo's HEAD at
    // extraction time (the next run's frontier) and how this run
    // extracted it — full | since | noop | rewind
    head: String = null,
    mode: String = null)

/** Git history extraction via `git log` parsing (the JVM has no
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
  * Parsing is NUL-delimited end to end (`-z` + `%x00` field
  * separators): no byte that can legally appear inside git metadata or
  * a filename is used as a delimiter, so author names / summaries with
  * control characters, filenames containing a literal " => ", and even
  * filenames with embedded newlines all come through exactly — these
  * were silent-corruption cases for the earlier line-based `--numstat`
  * text parse.
  */
object GitLogSource {

  val ZeroOid = "0" * 40
  val NoAuthorName  = "(no author name)"
  val NoAuthorEmail = "(no author email)"
  val NoSummary     = "(no commit summary)"
  val NoRemoteUrl   = "(no remote url)"

  // \x01 marks a commit header. It is unambiguous by POSITION, not by
  // rarity: a NUL-token can only start with \x01 when it is our header
  // marker — plain numstat entry tokens start with the insertion count,
  // and rename path tokens are consumed positionally (see parseTokens),
  // so even a filename beginning with \x01 cannot be misread.
  private val HeaderMark = '\u0001'

  /** Directory scan (analyzer.rs:102-135) up to `maxDepth`, excluding
    * `.git` dirs and configured ignores. Returns (candidates, ignored).
    *
    * Pruning rules (matter once --recursive makes maxDepth unbounded):
    *  - an ignored name prunes its WHOLE subtree (a repo nested under
    *    vendor/ must not sneak in through recursion);
    *  - a directory that is itself a git repository is a candidate and
    *    is never descended into (its working tree — node_modules and
    *    friends — must not become thousands of bogus candidates);
    *  - top-level non-repo dirs are still candidates, so they surface
    *    as skipped in the report exactly like the reference
    *    (analyzer.rs:255-263); deeper non-repo dirs are only traversal
    *    nodes.
    */
  def scanDirectories(
      root: Path, maxDepth: Int, ignored: Seq[String]): (Seq[Path], Seq[String]) = {
    // Manual per-directory listing instead of Files.walk: one
    // unreadable subdirectory must not abort the whole scan (walk's
    // iterator throws UncheckedIOException mid-traversal and can't be
    // resumed), and each stream is closed deterministically.
    // symlinked directories are never followed: a self-referencing
    // link (root/a/loop -> root/a) would otherwise recurse forever
    // under --recursive
    def children(dir: Path): Vector[Path] = {
      val stream = Try(Files.list(dir))
      stream.map { st =>
        try st.iterator().asScala
          .filter(p => Files.isDirectory(p) && !Files.isSymbolicLink(p))
          .toVector
        finally st.close()
      }.getOrElse(Vector.empty) // unreadable dir -> skipped, not fatal
    }
    def looksLikeRepo(p: Path): Boolean =
      // .git may be a FILE (linked worktrees, submodule checkouts)
      Files.exists(p.resolve(".git")) || isBareRepo(p)
    val cands = Vector.newBuilder[Path]
    val ign   = Vector.newBuilder[String]
    def walk(dir: Path, depth: Int): Unit =
      if (depth <= maxDepth) children(dir).foreach { c =>
        val name = c.getFileName.toString
        if (name == ".git") ()                      // never descend into .git
        else if (ignored.contains(name)) ign += name // prune the subtree
        else if (looksLikeRepo(c)) cands += c        // repo: never descend inside
        else {
          if (depth == 1) cands += c // reference parity: surfaces as skipped
          walk(c, depth + 1)
        }
      }
    walk(root, 1)
    (cands.result().sortBy(_.toString), ign.result().sorted)
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
    *
    * `-z` NUL-separates commits and NUL-terminates every numstat path
    * (renames arrive as an empty path slot followed by two standalone
    * old/new path tokens — no " => " munging to disambiguate); `%x00`
    * makes every header field its own NUL token. core.quotePath=false
    * keeps non-ASCII paths raw (with -z git never quotes, but the
    * config also covers the `git config` subprocess family).
    */
  private def logCommand: Seq[String] = Seq(
    "git", "-c", "diff.ignoreSubmodules=all", "-c", "core.quotePath=false", "log",
    "-z", "--no-merges", "--date-order", "--numstat",
    "--find-renames=100%", "--find-copies=100%",
    "--pretty=format:%x01%H%x00%P%x00%an%x00%ae%x00%ct%x00%s")

  /** Cheap repo validation for the report pass: confirms the path is a
    * git repository with a resolvable HEAD without reading any history.
    */
  def validateRepo(path: Path): Option[String] = {
    // .git may be a directory or a file (worktree/submodule checkouts)
    if (!(Files.exists(path.resolve(".git")) || isBareRepo(path)))
      Some(s"not a git repository: $path")
    else {
      val ok = Try(Process(Seq("git", "rev-parse", "--verify", "HEAD"), path.toFile).!!).isSuccess
      if (ok) None else Some(s"cannot resolve HEAD in $path")
    }
  }

  /** Stream one repository's commits WITHOUT materializing the whole
    * history: the raw `git log -z` byte stream is consumed token by
    * token through a lazy iterator, so executor memory per repo is
    * O(one commit), not O(history) — the reference holds the entire
    * repo in a Vec (repository.rs:114,185), which SURVEY.md §4 flags as
    * its OOM risk at scale; this is the Spark-side fix.
    *
    * A nonzero git exit status becomes a LOUD exception at end of
    * stream (raised from the consuming task) instead of silently
    * truncating the repo's commits while the report lists it as
    * analyzed.
    */
  def streamRepo(path: Path): Iterator[CommitRow] =
    streamRepo(path, path.getFileName.toString, remoteUrl(path.toFile))

  /** Validate + extract one repository as a lazy event stream — the
    * whole per-repo subprocess budget (rev-parse validation, remote-url
    * lookup, git log) runs HERE, inside the executor task, so the
    * driver's prep per repo is O(1) (a directory listing entry) even on
    * a 100k-repo work-list.
    */
  def extractRepo(path: Path): Iterator[ExtractEvent] = {
    val name = path.getFileName.toString
    validateRepo(path) match {
      case Some(err) =>
        Iterator.single(ExtractEvent("error", name, path.toString, null, err, null))
      case None =>
        val url = remoteUrl(path.toFile)
        Iterator.single(ExtractEvent("repo", name, path.toString, url, null, null)) ++
          streamRepo(path, name, url).map(c =>
            ExtractEvent("commit", name, path.toString, url, null, c))
    }
  }

  /** The repo's current HEAD hash, or None when unresolvable. */
  def headHash(path: Path): Option[String] =
    Try(Process(Seq("git", "rev-parse", "--verify", "HEAD"), path.toFile).!!.trim)
      .toOption.filter(_.nonEmpty)

  /** Is `old` an ancestor of HEAD? False on a force-pushed/rewritten
    * history AND on an unknown object (gc'd old head) — both fall back
    * to full extraction in [[extractRepoSince]]. */
  private def isAncestor(path: Path, old: String): Boolean =
    Try(Process(Seq("git", "merge-base", "--is-ancestor", old, "HEAD"),
      path.toFile).!(ProcessLogger(_ => (), _ => ()))).toOption.contains(0)

  /** Incremental variant of [[extractRepo]] — the since-snapshot ETL's
    * per-repo extraction (the reference re-runs full history every
    * time, analyzer.rs:301; a real deployment re-extracts daily and
    * must touch only new commits). Given the repo's head recorded by
    * the PREVIOUS run:
    *
    *  - no previous head (new repo)          → mode "full": whole history;
    *  - previous head == current HEAD        → mode "noop": zero commits,
    *    no `git log` subprocess at all;
    *  - previous head is an ancestor of HEAD → mode "since": exactly
    *    `git log old..HEAD` — cost proportional to NEW commits;
    *  - previous head missing / not an ancestor (force push, gc)
    *                                         → mode "rewind": full
    *    history again — the append path's anti-join against the
    *    already-committed (repository_id, commit_hash) set deduplicates
    *    (GitEtlIncr), so a rewound repo is re-covered, never doubled.
    *
    * The kind="repo" event carries the CURRENT head (the next run's
    * frontier) and the mode taken.
    */
  def extractRepoSince(path: Path, prevHead: Option[String]): Iterator[ExtractEvent] = {
    val name = path.getFileName.toString
    validateRepo(path) match {
      case Some(err) =>
        Iterator.single(ExtractEvent("error", name, path.toString, null, err, null))
      case None =>
        val url = remoteUrl(path.toFile)
        val head = headHash(path).orNull
        val mode = prevHead match {
          case None                               => "full"
          case Some(old) if old == head           => "noop"
          case Some(old) if isAncestor(path, old) => "since"
          case Some(_)                            => "rewind"
        }
        val repoEv = Iterator.single(
          ExtractEvent("repo", name, path.toString, url, null, null, head, mode))
        val commits = mode match {
          case "noop"  => Iterator.empty[CommitRow]
          case "since" => streamRepo(path, name, url, Seq(s"${prevHead.get}..HEAD"))
          case _       => streamRepo(path, name, url)
        }
        repoEv ++ commits.map(c =>
          ExtractEvent("commit", name, path.toString, url, null, c))
    }
  }

  /** Sharded variant of [[extractRepo]] — the giant-repo straggler
    * mitigation: shard `sh` of `shards` extracts only the commits whose
    * hash falls in its slice, so one huge history spreads over several
    * tasks instead of serializing into one. The "repo" / "error"
    * events are emitted by shard 0 only (one dimension row per repo);
    * every shard still validates (a rev-parse is cheap next to its
    * extraction slice).
    */
  def extractRepoShard(path: Path, sh: Int, shards: Int): Iterator[ExtractEvent] =
    if (shards <= 1) extractRepo(path)
    else {
      val name = path.getFileName.toString
      validateRepo(path) match {
        case Some(err) =>
          if (sh == 0) Iterator.single(ExtractEvent("error", name, path.toString, null, err, null))
          else Iterator.empty
        case None =>
          val url = remoteUrl(path.toFile)
          val head =
            if (sh == 0) Iterator.single(ExtractEvent("repo", name, path.toString, url, null, null))
            else Iterator.empty
          head ++ streamRepoShard(path, name, url, sh, shards).map(c =>
            ExtractEvent("commit", name, path.toString, url, null, c))
      }
    }

  /** A commit's shard: uniform from its leading hash bits — no global
    * index pass needed, every shard streams the (cheap, diff-free)
    * rev-list independently and keeps its slice.
    */
  private[etl] def shardOf(hash: String, shards: Int): Int =
    (java.lang.Long.parseLong(hash.substring(0, 8), 16) % shards).toInt

  /** Pipe `git rev-list` (metadata-only walk) through a shard filter
    * into `git log --stdin --no-walk=unsorted`, which diffs ONLY the
    * fed commits — output bytes are the same -z grammar parseTokens
    * already handles (verified against git 2.x).
    */
  private def streamRepoShard(
      path: Path, name: String, url: String, sh: Int, shards: Int): Iterator[CommitRow] = {
    val revPb = new java.lang.ProcessBuilder("git", "rev-list", "--no-merges", "HEAD")
    revPb.directory(path.toFile)
    revPb.redirectError(java.lang.ProcessBuilder.Redirect.DISCARD)
    val revProc = revPb.start()
    revProc.getOutputStream.close()
    val revIn = new java.io.BufferedReader(
      new java.io.InputStreamReader(revProc.getInputStream, UTF_8))

    // Find the first owned hash BEFORE starting git log: `git log
    // --stdin` with empty stdin falls back to HEAD (verified), so an
    // empty shard must never launch the log process at all — it would
    // re-emit the entire history.
    var first: String = null
    var line = revIn.readLine()
    while (first == null && line != null) {
      if (line.length >= 8 && shardOf(line, shards) == sh) first = line
      else line = revIn.readLine()
    }
    if (first == null) {
      val rc = revProc.waitFor()
      if (rc != 0) throw new RuntimeException(s"git rev-list exited with $rc in $path")
      Iterator.empty
    } else {
      val logPb = new java.lang.ProcessBuilder(
        (logCommand.filterNot(_ == "--date-order") ++ Seq("--no-walk=unsorted", "--stdin")): _*)
      logPb.directory(path.toFile)
      logPb.redirectError(java.lang.ProcessBuilder.Redirect.DISCARD)
      val logProc = logPb.start()

      // feeder: stream rev-list -> shard filter -> log stdin; a thread
      // so both pipes flow without buffering the history anywhere. If
      // git log dies mid-stream the writes hit EPIPE — swallow it (the
      // exit-status check below raises the loud failure) but stop
      // feeding.
      val firstHash = first
      val feeder = new Thread(() => {
        val out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(logProc.getOutputStream, UTF_8))
        try {
          out.write(firstHash); out.write('\n')
          var l = revIn.readLine()
          while (l != null) {
            if (l.length >= 8 && shardOf(l, shards) == sh) {
              out.write(l); out.write('\n')
            }
            l = revIn.readLine()
          }
        } catch { case _: java.io.IOException => () } // EPIPE: log died
        finally Try(out.close())
      }, s"git-shard-feeder-$name-$sh")
      feeder.setDaemon(true)
      feeder.start()

      val tokens = nulTokens(new BufferedInputStream(logProc.getInputStream), onEof = () => {
        // log's stdout hit EOF, so logProc is exiting — but rev-list
        // may be wedged writing to a pipe nobody drains anymore (the
        // feeder dies on EPIPE when log aborts mid-stream). A plain
        // waitFor() would hang the task forever; bound it and kill.
        val lc = logProc.waitFor()
        val rc =
          if (revProc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) revProc.exitValue()
          else { revProc.destroyForcibly(); -1 }
        if (rc != 0 || lc != 0)
          throw new RuntimeException(
            s"sharded git extraction failed in $path (rev-list=$rc, log=$lc)")
      })
      parseTokens(tokens, name, path.toString, url)
    }
  }

  private def streamRepo(path: Path, name: String, url: String,
                         range: Seq[String] = Nil): Iterator[CommitRow] = {
    // `range` appends a rev range (e.g. "old..HEAD") to the shared log
    // command — empty means the default HEAD walk
    val pb = new java.lang.ProcessBuilder((logCommand ++ range): _*)
    pb.directory(path.toFile)
    val proc = pb.start()
    proc.getOutputStream.close()
    // stderr must be drained concurrently or a chatty git blocks on a
    // full pipe; keep a bounded tail for the failure message
    val stderrTail = new StringBuilder
    val drainer = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getErrorStream, UTF_8))
      var line = r.readLine()
      while (line != null) {
        stderrTail.synchronized {
          if (stderrTail.length < 4096) stderrTail.append(line).append('\n')
        }
        line = r.readLine()
      }
    }, s"git-stderr-$name")
    drainer.setDaemon(true)
    drainer.start()
    val tokens = nulTokens(new BufferedInputStream(proc.getInputStream), onEof = () => {
      val code = proc.waitFor()
      if (code != 0)
        throw new RuntimeException(
          s"git log exited with $code in $path: ${stderrTail.synchronized(stderrTail.toString).trim}")
    })
    parseTokens(tokens, name, path.toString, url)
  }

  /** Lazy NUL-token reader over a raw byte stream. Tokens are UTF-8
    * decoded per token (paths/metadata may contain any byte but NUL).
    * `onEof` runs once when the stream ends — the exit-status hook.
    */
  private[etl] def nulTokens(in: InputStream, onEof: () => Unit = () => ()): Iterator[String] =
    new Iterator[String] {
      private val buf = new ByteArrayOutputStream(256)
      private var pending: String = null
      private var done = false

      private def advance(): Unit = {
        while (pending == null && !done) {
          val b = in.read()
          if (b < 0) {
            done = true
            if (buf.size() > 0) pending = take()
            onEof()
          } else if (b == 0) pending = take()
          else buf.write(b)
        }
      }
      private def take(): String = {
        val s = new String(buf.toByteArray, UTF_8); buf.reset(); s
      }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): String = {
        advance()
        if (pending == null) throw new NoSuchElementException
        val t = pending; pending = null; t
      }
    }

  /** Incremental parser over the NUL-token stream of
    * `git log -z --numstat --pretty=format:%x01%H%x00...%x00%s`.
    *
    * Stream grammar (established against git 2.x output, see the
    * fixture tests):
    * {{{
    * commit   := \x01 H \0 P \0 an \0 ae \0 ct \0 summary rest
    * rest     := ""                      (no diff)
    *           | "\n" entry (\0 entry)*  (numstat entries)
    * entry    := ins \t del \t path      (plain; path may contain \t)
    *           | ins \t del \t \0 old \0 new   (rename/copy)
    * commits are separated by one \0 (an empty token when the previous
    * commit ended with a NUL-terminated entry).
    * }}}
    */
  private[etl] def parseTokens(
      tokens: Iterator[String], repoName: String, repoPath: String,
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

    // header fields are consumed positionally — control characters in
    // the name/summary fields shift nothing
    private def startCommit(hash: String): Unit = {
      val parents = tokens.next().split(' ').filter(_.nonEmpty)
      val an = tokens.next()
      val ae = tokens.next()
      val ct = tokens.next()
      // the stream can END right after %ct's NUL: a diff-less oldest
      // commit with an empty message emits no summary byte and no
      // trailing NUL (verified with --allow-empty --allow-empty-message)
      val sTok = if (tokens.hasNext) tokens.next() else "" // summary [+ "\n" + first entry chunk]
      val nl = sTok.indexOf('\n')
      val summary = if (nl >= 0) sTok.substring(0, nl) else sTok
      current = CommitRow(
        repo_name = repoName, repo_path = repoPath, repo_url = url,
        commit_hash = hash,
        parent_hash = parents.headOption.getOrElse(ZeroOid),
        author_name = if (an.isEmpty) NoAuthorName else an,
        author_email = if (ae.isEmpty) NoAuthorEmail else ae,
        commit_epoch = ct.toLong,
        message = if (summary.isEmpty) NoSummary else summary,
        insertions = 0L, deletions = 0L, changed_files = Nil)
      if (nl >= 0 && nl < sTok.length - 1) entry(sTok.substring(nl + 1))
    }

    private def entry(chunk: String): Unit = {
      val parts = chunk.split("\t", -1)
      if (parts.length >= 3) {
        ins += Try(parts(0).toLong).getOrElse(0L) // "-" for binary files
        del += Try(parts(1).toLong).getOrElse(0L)
        val path = parts.drop(2).mkString("\t") // a path may contain tabs
        if (path.isEmpty) {
          // rename/copy: empty path slot, then two standalone tokens;
          // record the NEW path (repository.rs:149-152)
          tokens.next() // old path
          files += tokens.next()
        } else files += path
      }
    }

    private def advance(): Unit = {
      while (pending == null && !done) {
        if (!tokens.hasNext) {
          done = true
          if (current != null) pending = finishCurrent()
        } else {
          val t = tokens.next()
          if (t.isEmpty) () // commit separator after a NUL-ended entry
          else if (t.charAt(0) == HeaderMark) {
            if (current != null) pending = finishCurrent()
            startCommit(t.substring(1))
          } else if (current != null) entry(t)
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

}
