package graft

import graft.pipeline.ExtractionPipeline.Config
import org.scalatest.funsuite.AnyFunSuite

/** Property 23 — configuration validation at startup
  * (`tests/test_config_properties.py:28-67,198`, `app/config.py:238-246`):
  * invalid chunk geometry fails at CONSTRUCTION with an error naming the
  * offending field, never inside a running 1000-executor job.
  */
class ConfigValidationSpec extends AnyFunSuite {

  test("valid configs construct and carry their values") {
    val c = Config("/tmp/x", chunkSize = 500, overlap = 100)
    assert(c.chunkSize == 500 && c.overlap == 100)
    // boundary: overlap one below size is legal
    Config("/tmp/x", chunkSize = 2, overlap = 1)
    Config("/tmp/x", chunkSize = 1, overlap = 0)
  }

  test("chunk_overlap >= chunk_size fails naming 'overlap' (the non-termination guard)") {
    val e = intercept[IllegalArgumentException](
      Config("/tmp/x", chunkSize = 100, overlap = 100))
    assert(e.getMessage.toLowerCase.contains("overlap"))
    intercept[IllegalArgumentException](
      Config("/tmp/x", chunkSize = 100, overlap = 500))
  }

  test("negative or zero geometry fails naming the field") {
    assert(intercept[IllegalArgumentException](
      Config("/tmp/x", chunkSize = 0)).getMessage.contains("chunk_size"))
    assert(intercept[IllegalArgumentException](
      Config("/tmp/x", chunkSize = -5)).getMessage.contains("chunk_size"))
    assert(intercept[IllegalArgumentException](
      Config("/tmp/x", overlap = -1)).getMessage.contains("chunk_overlap"))
    assert(intercept[IllegalArgumentException](
      Config("/tmp/x", nBuckets = 0)).getMessage.contains("nBuckets"))
    assert(intercept[IllegalArgumentException](
      Config("/tmp/x", waves = 0)).getMessage.contains("waves"))
    assert(intercept[IllegalArgumentException](
      Config("/tmp/x", maxPayloadChars = 0)).getMessage.contains("maxPayloadChars"))
    assert(intercept[IllegalArgumentException](
      Config("")).getMessage.contains("outDir"))
  }
}
