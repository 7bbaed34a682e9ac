package graft.operators

import graft.SparkTestBase

class ProductQuantizationSpec extends SparkTestBase {
  import spark.implicits._

  // Every subvector is drawn from a 2-value alphabet per subspace, and
  // the two init seeds (lowest ids 0, 1) carry both values in both
  // subspaces — so rounded-Lloyd centroids ARE the alphabet values
  // (means of identical members), quantization is lossless, and the ADC
  // lookup-sum must equal the EXACT dot product.
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 1f)),
    (1L, Array(0f, 1f, 1f, 0f)),
    (2L, Array(1f, 0f, 1f, 0f)),
    (3L, Array(0f, 1f, 0f, 1f)),
    (4L, Array(1f, 0f, 0f, 1f)) // exact twin of 0
  ).toDF("vec_id", "embedding")

  test("lossless codebook: ADC scores equal exact dot products; ties to lower id") {
    val out = ProductQuantization.pqTopK(
        vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding",
        m = 2, kSub = 2, iters = 1, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // dots vs probe 0: id4 -> 2.0 (twin), id2 -> 1.0, id3 -> 1.0, id1 -> 0.0
    assert(out.toSeq === Seq(
      (4L, 1L, 2.0), (2L, 2L, 1.0), (3L, 3L, 1.0), (1L, 4L, 0.0)))
  }

  test("k truncates after ranking") {
    val out = ProductQuantization.pqTopK(
        vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding",
        m = 2, kSub = 2, iters = 1, k = 1).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(4L))
  }

  test("m must divide the vector dimension") {
    intercept[IllegalArgumentException] {
      ProductQuantization.pqTopK(vecs, vecs, "vec_id", "embedding",
        m = 3, kSub = 2, iters = 1, k = 2)
    }
  }

  test("probe collect is bounded by the driver guard") {
    val many = (0L until 8L).map(i => (i, Array(1f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    // guard trips only past maxProbes; here just assert the path works
    // for a multi-probe set and emits k rows per probe
    val out = ProductQuantization.pqTopK(many, many, "vec_id", "embedding",
      m = 2, kSub = 2, iters = 1, k = 2).collect()
    assert(out.length === 16)
  }
}
