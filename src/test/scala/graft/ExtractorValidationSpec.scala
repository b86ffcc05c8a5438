package graft

import graft.extract.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** S1 size validation: the reference rejects uploads over
  * `max_file_size` (`app/config.py:83-86` default 50 MB,
  * `file_storage.py:76-92` `validate_file_size`); the extractor's analog
  * skips oversized turn payloads as "too_large" without parsing them —
  * at 10^12 turns a single unguarded mega-payload is an executor-OOM
  * task killer.
  */
class ExtractorValidationSpec extends AnyFunSuite {

  test("payload over the cap is skipped as too_large without parsing") {
    val big = "<p>" + "x" * 100 + "</p>"
    val ex = Extractor.extract(big, maxChars = 50)
    assert(ex.skipReason == "too_large")
    assert(ex.text.isEmpty && ex.spans.isEmpty)
    assert(ex.bytesParsed == big.length.toLong, "size still recorded for lineage")
  }

  test("payload exactly at the cap is parsed normally") {
    val payload = "hello world"
    val ex = Extractor.extract(payload, maxChars = payload.length)
    assert(ex.skipReason.isEmpty)
    assert(ex.text == payload)
  }

  test("default cap matches the reference's 50 MB upload limit") {
    assert(Extractor.DefaultMaxPayloadChars == 50 * 1024 * 1024)
    // ordinary payloads are far below it and unaffected
    assert(Extractor.extract("plain text").skipReason.isEmpty)
  }
}
