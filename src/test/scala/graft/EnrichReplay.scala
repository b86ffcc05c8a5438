package graft

/** In-memory replica of `TrainingDataQueries.enrichedDocs`' `text2` —
  * byte-identical to the Spark expression and the DuckDB `EnrichedCte`
  * (same md5 decile, same pad rules, same ⌊√(16·doc_id+j)⌋ tail) — for
  * the replay specs that recompute enrichment-consuming statistics from
  * first principles.
  */
object EnrichReplay {
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val markers = Map(
    "de" -> "der und nicht das ist",
    "es" -> "que los una con para",
    "fr" -> "les des une avec pour")

  private val EnPad = " the and of to is"

  def text2(docId: Long, lang: String, nChars: Long, text: String): String = {
    val h = java.lang.Long.parseLong(md5hex(docId.toString).substring(0, 6), 16) % 10
    val g = math.max(nChars / 8, 1L).toInt
    val pad =
      if (lang == "en" && h < 8) EnPad * g
      else if (lang != "en" && h < 8)
        (" " + markers.getOrElse(lang, "de shi bu le zai")) * g
      else if (lang != "en" && h >= 9) EnPad * g
      else ""
    val tail = (0 until 16).map(j =>
      "w" + math.floor(math.sqrt((docId * 16 + j).toDouble)).toLong).mkString(" ")
    text + pad + " " + tail
  }

  /** q_cooccur_lift's deterministic basket-thinning predicate. */
  def keepBasket(userId: Long, eventType: String): Boolean = eventType match {
    case "error" => userId % 2 == 0
    case "purchase" => userId % 4 == 0
    case "signup" => userId % 3 == 0
    case "view" => userId % 2 == 1
    case _ => true
  }
}
