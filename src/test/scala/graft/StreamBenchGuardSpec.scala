package graft

import org.scalatest.funsuite.AnyFunSuite

/** The STREAMBENCH.json commit gate: an out-of-band (hot-host) run
  * must not be able to clobber the committed artifact, and in-band
  * folds must only ever improve committed seconds while keeping each
  * tier's record coherent (seconds paired with the MBs/jobs measured
  * alongside them).
  */
class StreamBenchGuardSpec extends AnyFunSuite {
  import StreamBenchGuard._

  private val committed =
    """{"seed_listings":100000,"seed_sec":21.3,"seed_sec_runs":[42.6,21.3],
      |"forked_jvms":2,"buckets":256,"payload_bytes":512,
      |"batches":20,"warmup_batches":2,"warmup_sec":1.2,"rows_per_batch":40,
      |"mean_batch_sec":0.511,"batches_per_sec":1.957,"rows_per_sec":78,
      |"mean_jobs_per_batch":1.8,"mean_rewritten_mb_per_batch":13.0,
      |"total_state_mb":157.5,"rewrite_fraction":0.083,
      |"large_batch":{"batches":20,"rows_per_batch":4000,
      |"mean_batch_sec":1.398,"mean_rewritten_mb_per_batch":22.2},
      |"over_cap_batch":{"batches":20,"rows_per_batch":40,
      |"mean_batch_sec":1.950,"mean_rewritten_mb_per_batch":6.8}}"""
      .stripMargin.replace("\n", "")

  private def fresh(seed: Double, smallMean: Double, largeMean: Double,
                    overcapMean: Double, largeRows: Int = 4000): String =
    s"""{"seed_listings":100000,"seed_sec":$seed,"buckets":256,""" +
      s""""payload_bytes":512,"batches":20,"warmup_batches":2,""" +
      s""""warmup_sec":1.0,"rows_per_batch":40,""" +
      s""""mean_batch_sec":$smallMean,"batches_per_sec":2.0,""" +
      s""""rows_per_sec":80,"mean_jobs_per_batch":1.9,""" +
      s""""mean_rewritten_mb_per_batch":11.0,"total_state_mb":160.0,""" +
      s""""rewrite_fraction":0.07,""" +
      s""""large_batch":{"batches":20,"rows_per_batch":$largeRows,""" +
      s""""mean_batch_sec":$largeMean,"mean_rewritten_mb_per_batch":20.0},""" +
      s""""over_cap_batch":{"batches":20,"rows_per_batch":40,""" +
      s""""mean_batch_sec":$overcapMean,"mean_rewritten_mb_per_batch":5.0}}"""

  private def fieldsOf(json: String): Map[String, String] =
    topFields(json).toMap

  test("out-of-band seed diverts to the side file; committed untouched") {
    val hot = fresh(seed = 43.0, smallMean = 0.4, largeMean = 1.0,
      overcapMean = 1.5)
    val d = guard("STREAMBENCH.json", Some(committed), hot, force = false)
    assert(d.path === "STREAMBENCH_outofband.json")
    assert(!d.fold && !d.inBand)
    // the caller writes the FRESH text to the side path and never
    // touches the committed artifact — nothing here rewrites it
  }

  test("in-band run folds; out-of-band boundary is seed*1.35 exactly") {
    val atBand = fresh(seed = 21.3 * 1.35, smallMean = 0.5, largeMean = 1.4,
      overcapMean = 1.9)
    assert(guard("STREAMBENCH.json", Some(committed), atBand,
      force = false).fold)
    val past = fresh(seed = 21.3 * 1.35 + 0.1, smallMean = 0.5,
      largeMean = 1.4, overcapMean = 1.9)
    assert(!guard("STREAMBENCH.json", Some(committed), past,
      force = false).fold)
  }

  test("fold keeps the coherent-better record per tier: prior seconds " +
      "survive with their own structural fields, fresh wins where faster") {
    val f = fresh(seed = 22.0, smallMean = 0.6, largeMean = 1.2,
      overcapMean = 2.2)
    val folded = fold(committed, f)
    val top = fieldsOf(folded)
    // small mix: prior mean 0.511 < fresh 0.6 -> prior block WHOLESALE
    assert(top("mean_batch_sec") === "0.511")
    assert(top("mean_rewritten_mb_per_batch") === "13.0")
    // large tier: fresh 1.2 < prior 1.398 -> fresh record wholesale
    val large = fieldsOf(top("large_batch"))
    assert(large("mean_batch_sec") === "1.2")
    assert(large("mean_rewritten_mb_per_batch") === "20.0")
    // over-cap: prior 1.95 < fresh 2.2 -> prior record, WITH its MB
    val oc = fieldsOf(top("over_cap_batch"))
    assert(oc("mean_batch_sec") === "1.950")
    assert(oc("mean_rewritten_mb_per_batch") === "6.8")
    // seed: min kept, this run appended to provenance, fork count bumped
    assert(top("seed_sec") === "21.3")
    assert(top("seed_sec_runs") === "[42.6,21.3,22.0]")
    assert(top("forked_jvms") === "3")
  }

  test("a reconfigured tier (different rows_per_batch) never compares " +
      "seconds — the fresh record replaces it") {
    val f = fresh(seed = 22.0, smallMean = 0.6, largeMean = 9.9,
      overcapMean = 2.2, largeRows = 8000)
    val large = fieldsOf(fieldsOf(fold(committed, f))("large_batch"))
    assert(large("mean_batch_sec") === "9.9")
    assert(large("rows_per_batch") === "8000")
  }

  test("a reconfigured BENCH (different seed size) replaces outright — " +
      "no fold, no divert") {
    val other = fresh(seed = 500.0, smallMean = 2.0, largeMean = 9.0,
      overcapMean = 9.0).replace("\"seed_listings\":100000",
      "\"seed_listings\":1000000")
    val d = guard("STREAMBENCH.json", Some(committed), other, force = false)
    assert(d.path === "STREAMBENCH.json" && !d.fold)
  }

  test("non-default targets and force bypass the gate") {
    val hot = fresh(seed = 99.0, smallMean = 9.0, largeMean = 9.0,
      overcapMean = 9.0)
    assert(guard("/tmp/x.json", Some(committed), hot, force = false).path
      === "/tmp/x.json")
    assert(guard("STREAMBENCH.json", Some(committed), hot, force = true).path
      === "STREAMBENCH.json")
    assert(guard("STREAMBENCH.json", None, hot, force = false).path
      === "STREAMBENCH.json")
  }

  test("parser handles the real committed artifact shape") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("STREAMBENCH.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    val fields = topFields(text)
    assert(fields.map(_._1).contains("seed_sec"))
    assert(fields.exists(_._2.startsWith("{")), "expected tier objects")
    // fold-with-self sanity: every tier survives, seed min unchanged
    val refolded = fieldsOf(fold(text, text))
    val orig = fieldsOf(text)
    assert(refolded.keySet === orig.keySet)
    assert(refolded("seed_sec") === orig("seed_sec"))
    orig.collect { case (k, v) if v.startsWith("{") =>
      assert(fieldsOf(refolded(k)) === fieldsOf(v), k)
    }
  }
}
