package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — combine independent rankings (lexical
  * BM25, embedding cosine, ...) with Reciprocal Rank Fusion
  * (Cormack et al., SIGIR 2009): score(id) = sum over lists of
  * 1 / (c + rank). The production shape for query-driven corpus
  * curation: lexical and semantic retrieval fail differently, and RRF
  * needs no score calibration between them — only ranks. SURVEY §2.10
  * similarity tier; no reference citation.
  *
  * Shape at scale: inputs are already top-N bounded per list (each
  * ranker's own contract), so the union carries O(lists x N) rows and
  * the fuse is one tiny keyed aggregation; the final top-k is a
  * TakeOrderedAndProject. Nothing touches the corpus again.
  *
  * Determinism: 1/(c+rank) terms are exact IEEE quotients; per-id sums
  * round to `roundScoreTo` before ranking (two-term sums are
  * order-independent in IEEE; rounding guards the >2-list case), ties
  * break on id.
  */
object HybridRetrieval {

  /** Fuse rankings, each a (idCol, rankCol) frame with ranks from 1.
    * Returns the top `k` ids by (rrf_score desc, id asc) as
    * (idCol, rrf_score, n_lists) — n_lists = how many input rankings
    * contained the id (missing lists contribute nothing, the standard
    * RRF convention).
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int, c: Int = 60, roundScoreTo: Int = 6): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    require(c >= 0, s"c must be non-negative, got $c")
    val tagged = rankings
      .map(_.select(col(idCol), col(rankCol).cast("long").as("__rank")))
      .reduce(_ unionByName _)
    tagged.groupBy(idCol)
      .agg(
        round(sum(lit(1.0) / (lit(c.toDouble) + col("__rank"))),
          roundScoreTo).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }

  /** RAG context assembly: a retrieval ranking joined to the document
    * store and concatenated IN RANK ORDER into one prompt-ready context
    * blob per probe — the last mile between a top-k and an actual LLM
    * call. Determinism: the per-probe collect is sorted on (rank, id)
    * structs before concatenation, so the blob (and its hash) is
    * partition-order independent; `collect_list` alone would not be.
    *
    * The aggregation state per probe is k (rank, text) entries — the
    * probe side is a top-k by construction, so nothing here scales
    * with the corpus; the doc join is an equi-join on the document id.
    *
    * @param ranking (probeCol, docIdCol, rankCol) rows, ranks from 1
    * @param docs    (docIdCol, textCol) document store
    * @return (probe id, n_docs, total_tokens, context) — `context` is
    *         the rank-ordered texts joined by "\n\n"
    */
  def ragContext(ranking: DataFrame, docs: DataFrame, probeCol: String,
                 docIdCol: String, rankCol: String, textCol: String,
                 separator: String = "\n\n"): DataFrame = {
    ranking
      .select(col(probeCol), col(docIdCol).as("__did"),
        col(rankCol).cast("long").as("__rank"))
      .join(docs.select(col(docIdCol).as("__did"), col(textCol).as("__text")),
        Seq("__did"))
      .groupBy(col(probeCol))
      .agg(sort_array(collect_list(
        struct(col("__rank"), col("__did"), col("__text")))).as("__c"))
      .select(col(probeCol),
        size(col("__c")).cast("long").as("n_docs"),
        concat_ws(separator,
          transform(col("__c"), x => x("__text"))).as("context"))
      .select(col(probeCol), col("n_docs"),
        graft.functions.TextFunctions.tokenCount(col("context"))
          .cast("long").as("total_tokens"),
        col("context"))
  }
}
