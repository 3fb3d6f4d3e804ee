package graft.tools

import graft.SparkSpec

/** Coarse wall-time regression gate (VERDICT r4 #6): PlanAuditSpec pins
  * plan SHAPE; nothing pinned TIME until this spec. Budgets are ~3× the
  * historically observed sf0.001 minimum in this exact context (the
  * inline calibration note below), so only a plan regression well past
  * ordinary machine noise — a lost broadcast, a resurrected cartesian,
  * an uncached double-execution — can trip them. Protocol: min of 2
  * noop-write samples (the min discards one GC/JIT hiccup), cache
  * cleared between.
  *
  * Excludable on noisy machines: set SPARK_GRAFT_SKIP_BENCHGUARD=1 and
  * every case cancels instead of failing.
  */
class BenchGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // (query, budget seconds): calibrated at ~3× the observed min in THIS
  // context — the shared local[2] test session with cold codegen
  // (observed: curation 17.6, simhash_capped 4.5, jaccard_capped 3.6,
  // substring 1.4, decontaminate 1.5, ts_fetch 1.5) — not the local[32]
  // bench JVM, which is several times faster.
  private val budgets: Seq[(String, Double)] = Seq(
    "corpus_curation" -> 50.0,
    "dedup_simhash_capped" -> 15.0,
    "dedup_ngram_jaccard_capped" -> 12.0,
    "dedup_substring" -> 6.0,
    "decontaminate" -> 6.0,
    "ts_fetch" -> 6.0
  )

  private def timedMin(name: String): Double = {
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    times.min
  }

  for ((name, budget) <- budgets)
    test(s"$name stays under its ${budget}s sf0.001 budget") {
      assume(sys.env.get("SPARK_GRAFT_SKIP_BENCHGUARD").isEmpty,
        "benchmark guard disabled via SPARK_GRAFT_SKIP_BENCHGUARD")
      val sec = timedMin(name)
      info(f"$name min-of-2 at sf0.001: $sec%.2f s (budget $budget%.1f s)")
      assert(sec < budget,
        f"$name took $sec%.2f s — over the $budget%.1f s regression budget " +
          "(a plan regression, not machine noise, at ~3x the historical min)")
    }
}
