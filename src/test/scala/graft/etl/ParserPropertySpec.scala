package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the -z token parser: render arbitrary commits —
  * with control characters, tabs, newlines, and " => " in every field
  * git allows them in — to the exact byte grammar `git log -z
  * --numstat --pretty=format:%x01%H%x00...%x00%s` emits (established
  * empirically, see GitLogSource.parseTokens scaladoc), then parse and
  * compare against the model. The real-git end of the contract is
  * covered by GitEtlSpec's fixture repos; this covers the content
  * space fixtures can't enumerate.
  */
class ParserPropertySpec extends AnyFunSuite {

  private sealed trait Entry
  private case class Plain(ins: String, del: String, path: String) extends Entry
  private case class Rename(ins: String, del: String, oldPath: String, newPath: String) extends Entry
  private case class C(
      hash: String, parents: List[String], an: String, ae: String,
      ct: Long, summary: String, entries: List[Entry])

  // anything git metadata can carry except the two bytes the grammar
  // owns: NUL (the delimiter) and, for header fields, newline
  private val nastyChar = Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('\u0001', '\u0002', '\t', ' ', '=', '>', 'é', '中'))
  private def nasty(maxLen: Int, minLen: Int = 0): Gen[String] =
    Gen.chooseNum(minLen, maxLen).flatMap(n => Gen.listOfN(n, nastyChar).map(_.mkString))
  // paths additionally allow embedded newlines
  private val pathChar = Gen.frequency(9 -> nastyChar, 1 -> Gen.const('\n'))
  private val pathGen  = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, pathChar).map(_.mkString))

  private val hashGen  = Gen.listOfN(40, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
  private val statGen  = Gen.frequency(8 -> Gen.chooseNum(0L, 9999L).map(_.toString), 1 -> Gen.const("-"))
  private val entryGen: Gen[Entry] = Gen.frequency(
    3 -> (for { i <- statGen; d <- statGen; p <- pathGen } yield Plain(i, d, p)),
    1 -> (for { i <- statGen; d <- statGen; o <- pathGen; n <- pathGen } yield Rename(i, d, o, n)))
  private val commitGen: Gen[C] = for {
    h  <- hashGen
    ps <- Gen.chooseNum(0, 2).flatMap(n => Gen.listOfN(n, hashGen))
    an <- nasty(10)
    ae <- nasty(10)
    ct <- Gen.chooseNum(0L, 4102444800L)
    s  <- nasty(20)
    es <- Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, entryGen))
  } yield C(h, ps, an, ae, ct, s, es)

  /** Render to the byte grammar exactly as git -z emits it. */
  private def render(cs: List[C]): String =
    cs.map { c =>
      val header = s"\u0001${c.hash}\u0000${c.parents.mkString(" ")}\u0000${c.an}\u0000${c.ae}\u0000${c.ct}\u0000${c.summary}"
      val entries = c.entries.map {
        case Plain(i, d, p)     => s"$i\t$d\t$p\u0000"
        case Rename(i, d, o, n) => s"$i\t$d\t\u0000$o\u0000$n\u0000"
      }.mkString
      if (c.entries.isEmpty) header else header + "\n" + entries
    }.mkString("\u0000")

  private def statVal(s: String): Long = scala.util.Try(s.toLong).getOrElse(0L)

  test("arbitrary commits round-trip through the NUL-token parser") {
    val listGen = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, commitGen))
    (1 to 200).foreach { i =>
      val cs = listGen.pureApply(Gen.Parameters.default.withSize(30), Seed(i.toLong))
      val bytes = render(cs).getBytes("UTF-8")
      val rows = GitLogSource.parseTokens(
        GitLogSource.nulTokens(new java.io.ByteArrayInputStream(bytes)),
        "r", "/r", "u").toVector
      assert(rows.length == cs.length, s"seed=$i")
      rows.zip(cs).foreach { case (row, c) =>
        assert(row.commit_hash == c.hash, s"seed=$i")
        assert(row.parent_hash == c.parents.headOption.getOrElse(GitLogSource.ZeroOid), s"seed=$i")
        assert(row.author_name == (if (c.an.isEmpty) GitLogSource.NoAuthorName else c.an), s"seed=$i")
        assert(row.author_email == (if (c.ae.isEmpty) GitLogSource.NoAuthorEmail else c.ae), s"seed=$i")
        assert(row.commit_epoch == c.ct, s"seed=$i")
        assert(row.message == (if (c.summary.isEmpty) GitLogSource.NoSummary else c.summary), s"seed=$i")
        assert(row.insertions == c.entries.map(e => statVal(e match {
          case Plain(x, _, _) => x; case Rename(x, _, _, _) => x })).sum, s"seed=$i")
        assert(row.deletions == c.entries.map(e => statVal(e match {
          case Plain(_, x, _) => x; case Rename(_, x, _, _) => x })).sum, s"seed=$i")
        val wantFiles = c.entries.map {
          case Plain(_, _, p) => p
          case Rename(_, _, _, n) => n
        }
        assert(row.changed_files == wantFiles, s"seed=$i")
      }
    }
  }
}
