package graft

import graft.functions.{TextFunctions => TF}

/** Tripwire for operator <-> oracle mirrored constants. Several oracle
  * SQL strings hard-code values the Spark operators derive (md5 hex
  * thresholds, seeds, capacities, regex patterns); editing one side
  * without the other passes compilation and unit tests but fails the
  * driver's hash gate. These assertions fail the build instead.
  */
class OracleCouplingSpec extends SparkTestBase {

  private def oracle(q: String): String = SparkEntry.oracleSql(q)

  test("q_split oracle carries the operator's 256-bucket hex thresholds") {
    val trainMax = f"${math.floor(256 * 0.8).toInt}%02x" // 'cc'
    val valMax = f"${math.floor(256 * 0.9).toInt}%02x"   // 'e6'
    assert(oracle("q_split").contains(s"< '$trainMax'"))
    assert(oracle("q_split").contains(s"< '$valMax'"))
    assert(oracle("q_split").contains("md5('split:'"))
  }

  test("q_split_leakfree oracle mirrors the split thresholds AND the cluster keying") {
    val trainMax = f"${math.floor(256 * 0.8).toInt}%02x"
    val valMax = f"${math.floor(256 * 0.9).toInt}%02x"
    assert(oracle("q_split_leakfree").contains(s"< '$trainMax'"))
    assert(oracle("q_split_leakfree").contains(s"< '$valMax'"))
    // the hash key must be the canonical cluster label, doc id fallback
    assert(oracle("q_split_leakfree").contains("md5('split:'"))
    assert(oracle("q_split_leakfree").contains("coalesce(l.label, doc_id)"))
    // same Jaccard threshold and probe bound as q_dup_clusters' graph
    assert(oracle("q_split_leakfree").contains("> 0.5"))
    assert(oracle("q_split_leakfree").contains("doc_id < 40"))
  }

  test("q_sample / q_stratified oracles carry the 65536-bucket thresholds") {
    assert(oracle("q_sample").contains(
      f"< '${math.floor(65536 * 0.25).toInt}%04x'")) // '4000'
    Seq(0.5, 0.25, 0.75).foreach { f =>
      assert(oracle("q_stratified").contains(
        f"< '${math.floor(65536 * f).toInt}%04x'"), s"fraction $f")
    }
    assert(oracle("q_sample").contains("md5('sample:'"))
    assert(oracle("q_stratified").contains("md5('sample:'"))
  }

  test("q_shuffle / q_pack oracles carry the operator seeds and capacity") {
    assert(oracle("q_shuffle").contains("md5('epoch0:'"))
    assert(oracle("q_pack").contains("md5('pack:'"))
    assert(oracle("q_pack").contains("// 512") && oracle("q_pack").contains("% 512"))
    assert(oracle("q_pack").contains("substr(hk, 1, 1)"), "shard width must stay 1 hex char")
  }

  test("q_redact oracle uses the TextFunctions patterns verbatim") {
    // the Scala pattern escapes the dot as \\.; the raw SQL carries \.
    assert(oracle("q_redact").contains(TF.emailPattern.replace("\\\\", "\\")))
    assert(oracle("q_redact").contains(s"'${TF.digitPattern}'"))
    assert(oracle("q_redact").contains(s"'${TF.emailReplacement}'"))
    assert(oracle("q_redact").contains(s"'${TF.digitReplacement}'"))
  }

  test("q_quantize oracle mirrors the floor-based formula and scale divisor") {
    assert(oracle("q_quantize").contains("floor(v[i] / scale + 0.5)"))
    assert(oracle("q_quantize").contains("/ 127.0"))
    assert(oracle("q_quantize").contains("greatest(-127, least(127"))
  }

  test("q_corpus_diff oracle mirrors the v1/v2 synthetic version cut") {
    val o = oracle("q_corpus_diff")
    assert(o.contains("doc_id < 450") && o.contains("doc_id >= 50"))
    assert(o.contains("doc_id % 10 = 0") && o.contains("|| ' v2'"))
  }

  test("q_contamination oracle carries the split thresholds and trigram shape") {
    val o = oracle("q_contamination")
    assert(o.contains("< 'cc'") && o.contains("< 'e6'"))
    assert(o.contains("toks[i:(i+2)]"), "trigram slice must match n=3")
  }

  test("q_contamination_bloom shares q_contamination's oracle verbatim") {
    // the Bloom variant's whole contract is output-identity — the
    // oracles must be the SAME string, not two copies that can drift
    assert(oracle("q_contamination_bloom") eq oracle("q_contamination"))
  }

  test("q_source_mix oracle mirrors the weights, seed, and frac thresholds") {
    val o = oracle("q_source_mix")
    // catalog weights {src0: 2.5, src1: 0.25, default 1.0}
    assert(o.contains("md5('mix:'"), "seed must stay 'mix'")
    assert(o.contains("WHEN 'src0' THEN 2") && o.contains("WHEN 'src1' THEN 0")
      && o.contains("ELSE 1 END"), "floor-epoch CASE must match the weights")
    assert(o.contains(f"'${math.floor(65536 * 0.5).toInt}%04x'"), // '8000'
      "src0 frac threshold (2.5 -> .5)")
    assert(o.contains(f"'${math.floor(65536 * 0.25).toInt}%04x'"), // '4000'
      "src1 frac threshold (0.25)")
    assert(o.contains("'0000'"), "default frac threshold (1.0 -> .0)")
  }
}
