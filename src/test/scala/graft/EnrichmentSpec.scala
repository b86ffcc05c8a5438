package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Non-degeneracy pins for the statistics that round 2 proved were
  * verifying only trivial paths on the raw synthetic corpus (all lifts
  * exactly 1.0, kappa below chance, lang-ID near-random, Heaps β = 0).
  * The enriched corpus twin (`TrainingDataQueries.enrichedDocs`) and the
  * zipfian basket thinning must keep these audits exercising their REAL
  * paths — if a future data or enrichment change re-degenerates them,
  * this spec goes red even while the cross-engine hashes stay green
  * (degenerate values hash-match just fine; that was the round-2 trap).
  */
class EnrichmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_kappa: agreement well above chance, all four cells populated") {
    val r = run("q_kappa").head
    val cells = Seq("n11", "n10", "n01", "n00").map(c => r.getLong(r.fieldIndex(c)))
    assert(cells.forall(_ > 0), s"contingency cell empty: $cells")
    val kappa = r.getDouble(r.fieldIndex("kappa"))
    assert(kappa > 0.3 && kappa < 0.98,
      s"kappa = $kappa — expected clearly above chance but honestly noisy")
  }

  test("q_heaps_fit: open vocabulary, beta strictly inside (0, 1)") {
    val r = run("q_heaps_fit").head
    val beta = r.getDouble(r.fieldIndex("beta"))
    assert(beta > 0.05 && beta < 0.95, s"Heaps beta = $beta — degenerate fit")
  }

  test("q_ct_lang_id: held-out confusion strongly diagonal, not perfect") {
    val rows = run("q_ct_lang_id").collect()
    val total = rows.map(_.getLong(2)).sum
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(total > 0)
    val acc = diag.toDouble / total
    // 5 languages → chance ≈ 0.2-0.25 given the en prior; demand far above
    assert(acc > 0.5, s"lang-ID accuracy $acc — profiles not separable")
    assert(diag < total, "perfect confusion matrix — label noise missing")
  }

  test("q_ngram_novelty: holdout novelty is nonzero and not total") {
    val rows = run("q_ngram_novelty").collect()
    val novel = rows.map(_.getLong(rows.head.fieldIndex("n_novel"))).sum
    val grams = rows.map(_.getLong(rows.head.fieldIndex("n_grams"))).sum
    assert(novel > 0,
      "zero novel holdout grams — the closed raw vocabulary leaked back in " +
        "(the enrichment tail is what gives the split unseen bigrams)")
    assert(novel < grams, "every holdout gram novel — the split saw no shared mass")
  }

  test("q_kaplan_meier: real right-censoring present, survival strictly drops") {
    val rows = run("q_kaplan_meier").collect()
    val censored = rows.map(_.getLong(rows.head.fieldIndex("c"))).sum
    val events = rows.map(_.getLong(rows.head.fieldIndex("d"))).sum
    assert(censored > 0,
      "zero censored subjects — the estimator's distinguishing branch is dead " +
        "(the round-2 degeneracy: every signup user purchased)")
    assert(events > 0, "no conversion events at all")
    val lastSurv = rows.maxBy(_.getInt(0)).getLong(rows.head.fieldIndex("surv_fp"))
    assert(lastSurv > 0L && lastSurv < 1000000000L,
      s"survival $lastSurv degenerate (never dropped, or hit zero)")
  }

  test("q_cooccur_lift: lift spectrum spreads (dependence, independence, exclusion)") {
    val rows = run("q_cooccur_lift").collect()
    val lifts = rows.map(_.getLong(rows.head.fieldIndex("lift_ppm"))).toSeq
    assert(lifts.distinct.size >= 3, s"lift values collapsed: $lifts")
    assert(lifts.max >= 1500000L,
      s"no genuinely associated pair (max lift ${lifts.max} ppm)")
    // the disjoint (error, view)/(purchase, view) pairs must vanish —
    // n_ab = 0 means no output row, the exclusion signal
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.contains(("error", "view")) && !pairs.contains(("purchase", "view")),
      s"mutually exclusive pairs resurfaced: $pairs")
  }
}
