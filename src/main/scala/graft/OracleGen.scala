package graft

import graft.functions.VectorFunctions

/** DuckDB oracle-SQL generators for the LSH / IVF similarity queries.
  *
  * These queries are approximate by design, but their randomness is
  * DETERMINISTIC: SRP hyperplanes are literals derived from (seed, bit,
  * dim) and IVF centroids are the lowest-id corpus vectors. That makes
  * the full algorithm — bucketing/assignment, candidate generation, and
  * exact verification — re-expressible in ANSI SQL, so the oracle
  * recomputes the SAME approximate result independently instead of
  * settling for a rows-only check.
  *
  * All float math follows the r1-proven parity rules: vectors cast to
  * double per element, dot products accumulated in index order,
  * cosines guarded against zero norms.
  */
object OracleGen {

  /** `(band, bit, [p1, ..., pdim])` VALUES rows for every hyperplane
    * used by `VectorFunctions.srpBucket(seed = band)` — the identical
    * doubles Spark bakes into its plan (shortest-round-trip rendering
    * parses back to the same IEEE value).
    */
  private def planesValues(bands: Int, bitsPerBand: Int, dim: Int): String =
    (for (band <- 0 until bands; bit <- 0 until bitsPerBand) yield {
      val ps = (0 until dim)
        .map(j => VectorFunctions.planeValue(band, bit, j).toString)
        .mkString("[", ", ", "]")
      s"($band, $bit, ${ps}::DOUBLE[])"
    }).mkString(",\n           ")

  private def dotSql(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]))"

  /** Shared prelude: vectors (cast to double, with norms) and per-band
    * SRP bucket ids recomputed from the hyperplane literals.
    */
  private def srpPrelude(filter: String, bands: Int, bitsPerBand: Int,
                         dim: Int): String =
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings $filter),
       n AS (
         SELECT vec_id, v,
                sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         FROM e),
       planes(band, bit, p) AS (
         VALUES ${planesValues(bands, bitsPerBand, dim)}),
       proj AS (
         SELECT e.vec_id, pl.band, pl.bit,
                ${dotSql("e.v", "pl.p", dim)} AS pr
         FROM e CROSS JOIN planes pl),
       buckets AS (
         SELECT vec_id, band,
                CAST(sum(CASE WHEN pr >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
         FROM proj GROUP BY vec_id, band)"""

  /** Oracle for `SimilaritySearch.cosineDupePairsLsh` over
    * `embeddings` restricted by `filter` (e.g. "WHERE vec_id < 300").
    */
  def cosineDupesLshSql(filter: String, threshold: Double, bands: Int,
                        bitsPerBand: Int, dim: Int): String =
    s"""${srpPrelude(filter, bands, bitsPerBand, dim)},
       cand AS (
         SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM buckets a JOIN buckets b
           ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       scored AS (
         SELECT id_a, id_b,
                CASE WHEN na.nrm * nb.nrm <> 0
                     THEN ${dotSql("na.v", "nb.v", dim)} / (na.nrm * nb.nrm)
                END AS cosine
         FROM cand JOIN n na ON na.vec_id = id_a
                   JOIN n nb ON nb.vec_id = id_b)
       SELECT id_a, id_b, round(cosine, 6) AS cosine
       FROM scored WHERE cosine > $threshold"""

  /** Oracle for `SimilaritySearch.srpTopK` with probes
    * `vec_id < probeMax` over the full `embeddings` corpus.
    */
  def srpAnnSql(probeMax: Int, k: Int, bands: Int, bitsPerBand: Int,
                dim: Int): String =
    s"""${srpPrelude("", bands, bitsPerBand, dim)},
       cand AS (
         SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         FROM buckets p JOIN buckets c
           ON p.band = c.band AND p.bucket = c.bucket
          AND c.vec_id <> p.vec_id
         WHERE p.vec_id < $probeMax),
       scored AS (
         SELECT probe_id, neighbor_id,
                CASE WHEN np.nrm * nc.nrm <> 0
                     THEN ${dotSql("np.v", "nc.v", dim)} / (np.nrm * nc.nrm)
                END AS cosine
         FROM cand JOIN n np ON np.vec_id = probe_id
                   JOIN n nc ON nc.vec_id = neighbor_id)
       SELECT probe_id, neighbor_id, rank FROM (
         SELECT probe_id, neighbor_id,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY cosine DESC, neighbor_id) AS rank
         FROM scored WHERE cosine IS NOT NULL) t
       WHERE rank <= $k"""

  /** Oracle for `SimilaritySearch.ivfTopK` with probes
    * `vec_id < probeMax`: centroids are the `nCells` lowest-id corpus
    * vectors; assignment = argmax cosine (ties to the lowest cell id,
    * zero vectors last) — exactly the operator's row-local expression.
    */
  /** Rounded-Lloyd k-means replay ([[graft.operators.KMeans
    * .assignRounded]]): lowest-id init (cell ids = ordinals over the
    * id-sorted seed set), per-iteration cosine argmax assignment (ties
    * to the lower ordinal, zero-norm sims NULLS LAST) and per-cell
    * per-dim means rounded to 6 decimals — the rounding is what makes
    * each iteration's input, and so the whole chain, engine-independent.
    * An emptied cell keeps its previous centroid (the COALESCE in the
    * centroid rebuild).
    */
  def kmeansSql(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dim)}
       SELECT vec_id, cell_id FROM a${iters + 1}"""

  /** The shared CTE chain of [[kmeansSql]] (`e` = double-cast vectors,
    * `c0..c\$iters` = centroids, `a\${iters+1}` = the final
    * assignment), so derived oracles (semDedupSql) replay the
    * identical clustering before their own logic.
    */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String = {
    require(iters >= 1,
      // iters = 0 would leave a dangling comma between the c0 CTE and
      // the final assignment (empty iterCtes) — and needs no oracle
      // generator anyway: it is plain lowest-id assignment (the IVF
      // shape, already covered by ivfAnnSql)
      s"kmeansSql needs iters >= 1, got $iters")
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    def assignCte(t: Int, centCte: String) =
      s"""a$t AS (
         SELECT vec_id, cell_id FROM (
           SELECT e.vec_id, c.cell_id,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               (CASE WHEN ${nrm("e.v")} * ${nrm("c.cv")} <> 0
                     THEN ${dotSql("e.v", "c.cv", dim)} /
                          (${nrm("e.v")} * ${nrm("c.cv")}) END)
               DESC NULLS LAST, c.cell_id) AS rn
           FROM e CROSS JOIN $centCte c) r
         WHERE rn = 1)"""
    def updateCte(t: Int) =
      s"""cm$t AS (
         SELECT a.cell_id, u.i, round(avg(e.v[u.i]), 6) AS m
         FROM a$t a JOIN e USING (vec_id),
              unnest(range(1, ${dim + 1})) AS u(i)
         GROUP BY a.cell_id, u.i),
       c$t AS (
         SELECT g.cell_id, list(COALESCE(m.m, g.old) ORDER BY g.i) AS cv
         FROM (SELECT c.cell_id, u.i, c.cv[u.i] AS old
               FROM c${t - 1} c, unnest(range(1, ${dim + 1})) AS u(i)) g
         LEFT JOIN cm$t m ON m.cell_id = g.cell_id AND m.i = g.i
         GROUP BY g.cell_id)"""
    val iterCtes = (1 to iters).map(t =>
      assignCte(t, s"c${t - 1}") + ",\n       " + updateCte(t))
      .mkString(",\n       ")
    val finalAssign = assignCte(iters + 1, s"c$iters")
    s"""e AS (
         SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       c0 AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v AS cv
         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k)),
       $iterCtes,
       $finalAssign"""
  }

  /** Oracle for [[graft.operators.SemDedup.semDedup]]: replay the
    * rounded-Lloyd assignment, then flag every vector having a
    * same-cluster neighbor with a smaller id and cosine >= tau.
    * Zero-norm cosines are NULL and never pass the threshold — zero
    * vectors are always kept, matching the operator.
    */
  def semDedupSql(k: Int, iters: Int, tau: Double, dim: Int): String = {
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    s"""WITH ${kmeansCtes(k, iters, dim)},
       asgn AS (SELECT vec_id, cell_id FROM a${iters + 1}),
       nn AS (SELECT vec_id, v, ${nrm("v")} AS nrm FROM e),
       dropped AS (
         SELECT DISTINCT b.vec_id AS hi
         FROM asgn a JOIN asgn b
           ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         JOIN nn na ON na.vec_id = a.vec_id
         JOIN nn nb ON nb.vec_id = b.vec_id
         WHERE (CASE WHEN na.nrm * nb.nrm <> 0
                     THEN ${dotSql("na.v", "nb.v", dim)} /
                          (na.nrm * nb.nrm) END) >= $tau)
       SELECT a.vec_id, a.cell_id, (d.hi IS NULL) AS keep
       FROM asgn a LEFT JOIN dropped d ON d.hi = a.vec_id"""
  }

  /** Oracle for the q_rrf hybrid-retrieval row: BM25 top-`listK` over
    * `documents` (rank = (rounded score desc, doc_id)) fused via RRF
    * with the exact-cosine top-`listK` neighbors of probe vector
    * `probeId` over `embeddings` (the bruteTopK contract: NULL cosines
    * excluded, rank ties on neighbor_id). rrf = sum of 1/(c + rank),
    * rounded to 6; final top-`k` by (rrf desc, doc_id).
    */
  def rrfSql(queryTerms: Seq[String], probeId: Long, listK: Int, k: Int,
             c: Int, dim: Int, k1: Double = 1.2, b: Double = 0.75): String = {
    require(queryTerms.nonEmpty, "rrfSql needs query terms")
    queryTerms.foreach(t => require(t.matches("[a-z0-9]+"),
      s"query terms must be [a-z0-9]+, got $t"))
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    val termList = queryTerms.map(t => s"'$t'").mkString(", ")
    raw"""WITH tok AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
         FROM documents),
       dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
              WHERE term IN ($termList) GROUP BY 1, 2),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       bm AS (
         SELECT tf.doc_id,
           round(sum(
             ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
             (tf * ${k1 + 1.0}) /
             (tf + $k1 * (${1.0 - b} + $b * dl / avgdl))), 6) AS score
         FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
         CROSS JOIN stats GROUP BY tf.doc_id),
       lex AS (
         SELECT doc_id, rank FROM (
           SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           FROM bm) t WHERE rank <= $listK),
       e AS (
         SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       nn AS (SELECT vec_id, v, ${nrm("v")} AS nrm FROM e),
       p AS (SELECT * FROM nn WHERE vec_id = $probeId),
       sem0 AS (
         SELECT c2.vec_id AS doc_id,
                CASE WHEN p.nrm * c2.nrm <> 0
                     THEN ${dotSql("p.v", "c2.v", dim)} / (p.nrm * c2.nrm)
                END AS cosine
         FROM p CROSS JOIN nn c2 WHERE c2.vec_id <> p.vec_id),
       sem AS (
         SELECT doc_id, rank FROM (
           SELECT doc_id,
             row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank
           FROM sem0 WHERE cosine IS NOT NULL) t WHERE rank <= $listK),
       unioned AS (
         SELECT doc_id, rank FROM lex
         UNION ALL SELECT doc_id, rank FROM sem)
       SELECT doc_id, rrf_score, n_lists FROM (
         SELECT doc_id,
           round(sum(1.0 / ($c + rank)), 6) AS rrf_score,
           count(*) AS n_lists
         FROM unioned GROUP BY doc_id)
       ORDER BY rrf_score DESC, doc_id LIMIT $k"""
  }

  /** Oracle for [[graft.operators.BpeLearn.encodeStats]] with a FIXED
    * merge table, applied BOUNDARY-EXACTLY via the double-separator
    * encoding: a word's symbol string carries ONE `~` at each end and
    * TWO between adjacent symbols, so the merge pattern `~l~~r~` can
    * only match where `l` and `r` are whole symbols (a symbol merely
    * ENDING in `l` has no `~` before the `l`), and back-to-back
    * occurrences `...l,r,l,r...` never share a separator (each match
    * consumes one `~` of each double, leaving the neighbor's half in
    * place) — so one `replace()` pass is exactly the trainer's greedy
    * non-overlapping left-to-right application, including the
    * overlapping l==r chain (`aaaaa` -> `aa,aa,a`). The replacement
    * `~lr~` restores single flanks, preserving the encoding invariant
    * for the next merge in the chain. (A single-separator `replace(s,
    * 'l~r', 'lr')` is WRONG: it fuses pairs straddling a symbol
    * boundary, e.g. symbols [ab, d] under merge (b, d).) Docs with no
    * non-empty tokens emit no row (the UnigramLm convention). Merge
    * symbols are restricted to [a-z0-9] so they embed in SQL literals
    * verbatim (and can never contain the separator).
    */
  def bpeEncodeSql(merges: Seq[(String, String)]): String = {
    require(merges.nonEmpty, "bpeEncodeSql needs at least one merge")
    merges.foreach { case (l, r) =>
      require((l + r).matches("[a-z0-9]+"),
        s"merge symbols must be [a-z0-9]+, got ($l, $r)") }
    val chain = merges.foldLeft("s") { case (acc, (l, r)) =>
      s"replace($acc, '~$l~~$r~', '~$l$r~')" }
    raw"""WITH tok AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
         FROM documents),
       sep AS (
         SELECT doc_id,
           '~' || array_to_string(string_split(w, ''), '~~') || '~' AS s
         FROM tok WHERE len(w) > 0),
       enc AS (SELECT doc_id, $chain AS e FROM sep)
       SELECT doc_id, count(*) AS n_words,
         CAST(sum(len(string_split(trim(e, '~'), '~~'))) AS BIGINT)
           AS n_tokens
       FROM enc GROUP BY doc_id"""
  }

  /** Oracle for [[graft.operators.BpeLearn.learnMerges]] — the greedy
    * argmax merge LOOP unrolled as k CTE stages (the q_mmr trick for
    * greedy iterations). Each word type is a symbol string under the
    * DOUBLE-SEPARATOR encoding: one chr(31) at each end, two between
    * adjacent symbols. Per stage: adjacent-pair counts weighted by
    * word frequency (split on the double separator after trimming the
    * single end flanks), argmax under the loop's total order (count
    * desc, left, right), then the merge applied via one `replace()` of
    * `SEP||l||SEP||SEP||r||SEP` with `SEP||l||r||SEP`. The flanking
    * separators make the match boundary-exact (a symbol merely ENDING
    * in l, e.g. [ab, d] under merge (b, d), can never match — the bug
    * a single-separator replace has), and the doubles mean back-to-back
    * occurrences never share a separator, so one left-to-right
    * `replace()` pass IS the loop's greedy non-overlapping application
    * (including overlapping l==r chains: `aaaaa` -> `aa,aa,a`). The
    * replacement restores single flanks, preserving the encoding
    * invariant for the next stage. MATERIALIZED CTEs: inlined, the
    * stage chain re-evaluates its ancestors exponentially. chr(31)
    * never occurs in the corpus (checked; a corpus symbol containing
    * the separator would break the encoding).
    */
  def bpeLearnSql(k: Int): String = {
    require(k >= 1, s"k must be >= 1, got $k")
    val SEP = "chr(31)"
    val stages = (1 to k).map { i =>
      s""",
       p$i AS MATERIALIZED (
         SELECT a[j] AS l, a[j + 1] AS r, sum(n) AS c
         FROM (SELECT string_split(trim(s, $SEP), $SEP || $SEP) AS a, n
               FROM w${i - 1}),
              unnest(range(1, len(a))) AS u(j)
         GROUP BY 1, 2),
       b$i AS MATERIALIZED (
         SELECT l, r FROM p$i ORDER BY c DESC, l, r LIMIT 1),
       w$i AS MATERIALIZED (
         SELECT replace(s,
             (SELECT $SEP || l || $SEP || $SEP || r || $SEP FROM b$i),
             (SELECT $SEP || l || r || $SEP FROM b$i)) AS s, n
         FROM w${i - 1})"""
    }.mkString
    val out = (1 to k).map(i =>
      s"SELECT $i AS merge_rank, l AS sym_left, r AS sym_right FROM b$i")
      .mkString("\n       UNION ALL ")
    raw"""WITH wc AS MATERIALIZED (
         SELECT w, count(*) AS n FROM (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
           FROM documents)
         WHERE len(w) > 0 GROUP BY w),
       w0 AS MATERIALIZED (
         SELECT $SEP || array_to_string(string_split(w, ''), $SEP || $SEP)
                || $SEP AS s, n
         FROM wc)$stages
       $out"""
  }

  /** Oracle for [[graft.operators.KnnClassify.classify]] with probes
    * `vec_id < probeMax` and electorate `vec_id >= probeMax` (NULL
    * labels excluded): exact cosine top-k (rank ties on neighbor_id,
    * NULL cosines excluded — the bruteTopK contract), then majority
    * vote with ties to the smaller label.
    */
  def knnClassifySql(probeMax: Int, k: Int, dim: Int): String = {
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    s"""WITH e AS (
         SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       n AS (SELECT vec_id, label, v, ${nrm("v")} AS nrm FROM e),
       p AS (SELECT * FROM n WHERE vec_id < $probeMax),
       c AS (SELECT * FROM n
             WHERE vec_id >= $probeMax AND label IS NOT NULL),
       scored AS (
         SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
                CASE WHEN p.nrm * c.nrm <> 0
                     THEN ${dotSql("p.v", "c.v", dim)} / (p.nrm * c.nrm)
                END AS cosine
         FROM p CROSS JOIN c WHERE c.vec_id <> p.vec_id),
       ranked AS (
         SELECT probe_id, label,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY cosine DESC, neighbor_id) AS rnk
         FROM scored WHERE cosine IS NOT NULL),
       votes AS (
         SELECT probe_id, label, count(*) AS votes
         FROM ranked WHERE rnk <= $k GROUP BY 1, 2)
       SELECT probe_id, label AS pred_label, votes FROM (
         SELECT probe_id, label, votes,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY votes DESC, label) AS vr
         FROM votes) t
       WHERE vr = 1"""
  }

  /** Oracle for [[graft.operators.KMeans.clusterPurity]]: replay the
    * rounded-Lloyd assignment via [[kmeansCtes]], then the
    * (cell, label) majority with ties to the smaller label.
    */
  def clusterPuritySql(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dim)},
       lab AS (SELECT vec_id, label FROM embeddings),
       cells AS (
         SELECT a.cell_id, l.label, count(*) AS nn
         FROM a${iters + 1} a JOIN lab l USING (vec_id)
         GROUP BY 1, 2),
       tot AS (SELECT cell_id, sum(nn) AS n_vecs FROM cells GROUP BY 1)
       SELECT c.cell_id, CAST(t.n_vecs AS BIGINT) AS n_vecs,
              c.label AS top_label,
              round(CAST(c.nn AS DOUBLE) / t.n_vecs, 6) AS purity
       FROM (SELECT cell_id, label, nn,
               row_number() OVER (PARTITION BY cell_id
                 ORDER BY nn DESC, label) AS rn
             FROM cells) c
       JOIN tot t USING (cell_id)
       WHERE c.rn = 1"""

  /** Oracle for [[graft.operators.PageRank.ranks]] over the
    * customer-nation bipartite graph: the rounded power iteration
    * unrolled one CTE per step — per-iteration rounding to 6 decimals
    * is what makes each step's input (and so the chain) engine- and
    * sum-order-independent, the [[kmeansSql]] stance.
    */
  def pagerankSql(iters: Int, damping: Double): String = {
    def iterCte(t: Int) =
      s"""r$t AS (
         SELECT dir.dst AS id,
           round((SELECT CAST(${1.0 - damping} AS DOUBLE) / n FROM nn) +
             $damping * sum(r.rank / deg.d), 6) AS rank
         FROM dir JOIN r${t - 1} r ON r.id = dir.src
                  JOIN deg ON deg.src = dir.src
         GROUP BY dir.dst)"""
    val chain = (1 to iters).map(iterCte).mkString(",\n       ")
    s"""WITH edges AS (
         SELECT c_custkey AS a, c_nationkey + 1000000 AS b FROM customer),
       dir AS (SELECT a AS src, b AS dst FROM edges
               UNION ALL SELECT b, a FROM edges),
       deg AS (SELECT src, count(*) AS d FROM dir GROUP BY 1),
       nn AS (SELECT count(*) AS n FROM deg),
       r0 AS (SELECT src AS id,
                round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 6) AS rank
              FROM deg),
       $chain
       SELECT id, rank FROM r$iters"""
  }

  /** Oracle for [[graft.operators.KnnClassify.labelSuspects]]: the
    * [[knnClassifySql]] replay with probes = the whole labeled set
    * (self pairs excluded by the id inequality), joined back to the
    * true label; is_suspect = the vote contradicts it.
    */
  def labelSuspectsSql(k: Int, dim: Int): String = {
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    s"""WITH e AS (
         SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings WHERE label IS NOT NULL),
       n AS (SELECT vec_id, label, v, ${nrm("v")} AS nrm FROM e),
       scored AS (
         SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
                CASE WHEN p.nrm * c.nrm <> 0
                     THEN ${dotSql("p.v", "c.v", dim)} / (p.nrm * c.nrm)
                END AS cosine
         FROM n p CROSS JOIN n c WHERE c.vec_id <> p.vec_id),
       ranked AS (
         SELECT probe_id, label,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY cosine DESC, neighbor_id) AS rnk
         FROM scored WHERE cosine IS NOT NULL),
       votes AS (
         SELECT probe_id, label, count(*) AS votes
         FROM ranked WHERE rnk <= $k GROUP BY 1, 2),
       pred AS (
         SELECT probe_id, label AS pred_label, votes FROM (
           SELECT probe_id, label, votes,
                  row_number() OVER (PARTITION BY probe_id
                    ORDER BY votes DESC, label) AS vr
           FROM votes) t
         WHERE vr = 1)
       SELECT p.probe_id, e.label, p.pred_label, p.votes,
              p.pred_label <> e.label AS is_suspect
       FROM pred p JOIN e ON e.vec_id = p.probe_id"""
  }

  /** Oracle for [[graft.operators.ProductQuantization.pqTopK]]: replay
    * each subspace's rounded-Lloyd codebook (the [[kmeansCtes]] chain
    * over `list_slice` subvectors), re-encode every corpus vector
    * (cosine argmax, `NULLS LAST, cell_id` so zero-norm subvectors take
    * cell 0 — the NearestCells all-ties convention), then score each
    * (probe < probeMax, neighbor) pair as the sum over subspaces of
    * dot(probe subvector, assigned centroid) — the ADC lookup-sum —
    * rounded to 6; top-`topK` by (score desc, neighbor_id).
    */
  def pqAnnSql(m: Int, kSub: Int, iters: Int, dim: Int, probeMax: Int,
               topK: Int): String = {
    require(dim % m == 0, s"m = $m must divide dim = $dim")
    require(iters >= 1, s"pqAnnSql needs iters >= 1, got $iters")
    val subDim = dim / m
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    def assignCte(s: Int, t: Int, centCte: String) =
      s"""a${t}_$s AS (
         SELECT vec_id, cell_id FROM (
           SELECT e.vec_id, c.cell_id,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               (CASE WHEN ${nrm("e.v")} * ${nrm("c.cv")} <> 0
                     THEN ${dotSql("e.v", "c.cv", subDim)} /
                          (${nrm("e.v")} * ${nrm("c.cv")}) END)
               DESC NULLS LAST, c.cell_id) AS rn
           FROM es$s e CROSS JOIN $centCte c) r
         WHERE rn = 1)"""
    def updateCte(s: Int, t: Int) =
      s"""cm${t}_$s AS (
         SELECT a.cell_id, u.i, round(avg(e.v[u.i]), 6) AS m
         FROM a${t}_$s a JOIN es$s e USING (vec_id),
              unnest(range(1, ${subDim + 1})) AS u(i)
         GROUP BY a.cell_id, u.i),
       c${t}_$s AS (
         SELECT g.cell_id, list(COALESCE(m.m, g.old) ORDER BY g.i) AS cv
         FROM (SELECT c.cell_id, u.i, c.cv[u.i] AS old
               FROM c${t - 1}_$s c, unnest(range(1, ${subDim + 1})) AS u(i)) g
         LEFT JOIN cm${t}_$s m ON m.cell_id = g.cell_id AND m.i = g.i
         GROUP BY g.cell_id)"""
    def subspaceCtes(s: Int): String = {
      val lo = s * subDim + 1
      val hi = (s + 1) * subDim
      val iterCtes = (1 to iters).map(t =>
        assignCte(s, t, s"c${t - 1}_$s") + ",\n       " + updateCte(s, t))
        .mkString(",\n       ")
      s"""es$s AS (
         SELECT vec_id, list_slice(v, $lo, $hi) AS v FROM e),
       c0_$s AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v AS cv
         FROM (SELECT vec_id, v FROM es$s ORDER BY vec_id LIMIT $kSub)),
       $iterCtes,
       ${assignCte(s, iters + 1, s"c${iters}_$s")}"""
    }
    val allSub = (0 until m).map(subspaceCtes).mkString(",\n       ")
    val scoreJoins = (0 until m).map { s =>
      s"""JOIN es$s ps$s ON ps$s.vec_id = pr.vec_id
         JOIN a${iters + 1}_$s cd$s ON cd$s.vec_id = nb.vec_id
         JOIN c${iters}_$s cc$s ON cc$s.cell_id = cd$s.cell_id"""
    }.mkString("\n         ")
    val scoreSum = (0 until m)
      .map(s => dotSql(s"ps$s.v", s"cc$s.cv", subDim))
      .mkString(" + ")
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       $allSub,
       scored AS (
         SELECT pr.vec_id AS probe_id, nb.vec_id AS neighbor_id,
                round($scoreSum, 6) AS score
         FROM (SELECT vec_id FROM e WHERE vec_id < $probeMax) pr
         CROSS JOIN (SELECT vec_id FROM e) nb
         $scoreJoins
         WHERE nb.vec_id <> pr.vec_id)
       SELECT probe_id, neighbor_id, rank, score FROM (
         SELECT probe_id, neighbor_id, score,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY score DESC, neighbor_id) AS rank
         FROM scored) t
       WHERE rank <= $topK"""
  }

  /** Oracle for [[graft.operators.AnnEval.recallAtK]] over the
    * q_ivf_ann configuration: replay the IVF search ([[ivfAnnSql]] as
    * a nested-WITH CTE) and the exact cosine top-k, then count the
    * per-probe overlap. Exact ranking uses the bruteTopK contract
    * (NULL cosines excluded, ties to the lower neighbor id).
    */
  def annRecallSql(probeMax: Int, k: Int, nCells: Int, nProbe: Int,
                   dim: Int): String = {
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    s"""WITH ivf AS (${ivfAnnSql(probeMax, k, nCells, nProbe, dim)}),
       be AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       bn AS (SELECT vec_id, v, ${nrm("v")} AS nrm FROM be),
       brute AS (
         SELECT probe_id, neighbor_id FROM (
           SELECT probe_id, neighbor_id,
                  row_number() OVER (PARTITION BY probe_id
                    ORDER BY cosine DESC, neighbor_id) AS rnk
           FROM (
             SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                    CASE WHEN p.nrm * c.nrm <> 0
                         THEN ${dotSql("p.v", "c.v", dim)} / (p.nrm * c.nrm)
                    END AS cosine
             FROM (SELECT * FROM bn WHERE vec_id < $probeMax) p
             CROSS JOIN bn c WHERE c.vec_id <> p.vec_id) s
           WHERE cosine IS NOT NULL) r
         WHERE rnk <= $k),
       base AS (SELECT probe_id, count(*) AS n_exact FROM brute GROUP BY 1),
       hit AS (
         SELECT b.probe_id, count(*) AS n_hit
         FROM brute b JOIN ivf i
           ON i.probe_id = b.probe_id AND i.neighbor_id = b.neighbor_id
         GROUP BY 1)
       SELECT base.probe_id, base.n_exact,
              COALESCE(hit.n_hit, 0) AS n_hit,
              round(COALESCE(hit.n_hit, 0) / CAST(base.n_exact AS DOUBLE), 6)
                AS recall
       FROM base LEFT JOIN hit USING (probe_id)"""
  }

  /** Oracle for [[graft.functions.VectorFunctions.randomProjection]]:
    * the Rademacher sign matrix is baked as DOUBLE literals — the SAME
    * driver-side md5-parity values Spark bakes into its plan — the dot
    * accumulates in index order (the r1-proven parity rule), and the
    * 1/sqrt(outDim) scale is the identical shortest-round-trip double
    * literal, so both engines compute bit-identical projections before
    * the 6-decimal round.
    */
  def randomProjectionSql(outDim: Int, dim: Int): String = {
    val signRows = (0 until outDim).map { j =>
      val ss = (0 until dim)
        .map(d => VectorFunctions.rademacherSign(j, d).toString)
        .mkString("[", ", ", "]")
      s"($j, ${ss}::DOUBLE[])"
    }.mkString(",\n           ")
    val invSqrtK = (1.0 / math.sqrt(outDim.toDouble)).toString
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       signs(j, s) AS (
         VALUES $signRows)
       SELECT e.vec_id, CAST(signs.j AS BIGINT) AS dim_idx,
              round(${dotSql("signs.s", "e.v", dim)} * $invSqrtK, 6) AS p
       FROM e CROSS JOIN signs"""
  }

  /** Oracle for [[graft.operators.DedupOps.lshRecall]]: the candidate
    * side comes in as `candSql` (the pinned MinHash fixture — xxhash64
    * signatures have no external replay), the exact shingle-Jaccard
    * truth is recomputed from scratch, and the summary row counts the
    * overlap. `shingleSize` is fixed at 3 to keep the concat chain
    * readable — the only configuration the catalog runs.
    */
  def lshRecallSql(candSql: String, tau: Double): String =
    raw"""WITH cand AS ($candSql),
       toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
         FROM documents WHERE text IS NOT NULL),
       sh AS (
         SELECT DISTINCT doc_id,
                ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       common AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       truth AS (
         SELECT doc_a, doc_b
         FROM common
         JOIN sizes sa ON sa.doc_id = doc_a
         JOIN sizes sb ON sb.doc_id = doc_b
         WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= $tau)
       SELECT count(t.doc_a) AS n_truth, count(c.id_a) AS n_cand,
              count(CASE WHEN t.doc_a IS NOT NULL AND c.id_a IS NOT NULL
                         THEN 1 END) AS n_hit,
              round(count(CASE WHEN t.doc_a IS NOT NULL AND c.id_a IS NOT NULL
                               THEN 1 END)
                    / CAST(count(t.doc_a) AS DOUBLE), 6) AS recall,
              round(count(CASE WHEN t.doc_a IS NOT NULL AND c.id_a IS NOT NULL
                               THEN 1 END)
                    / CAST(count(c.id_a) AS DOUBLE), 6) AS precision
       FROM cand c
       FULL OUTER JOIN truth t ON c.id_a = t.doc_a AND c.id_b = t.doc_b"""

  /** Oracle for [[graft.operators.DedupOps.simhashBandPairs]]: replay
    * the band bucketing, candidate join, and Hamming verification from
    * the pinned simhash fixture (`fpSql` — the fingerprints themselves
    * are xxhash64-derived and have no external replay). DuckDB's `>>`
    * is arithmetic like Spark's shiftright, and the width mask makes
    * the sign irrelevant.
    */
  def simhashPairsSql(fpSql: String, maxHamming: Int, bands: Int): String = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandList = (0 until bands).mkString("[", ", ", "]")
    s"""WITH fp AS ($fpSql),
       banded AS (
         SELECT doc_id, simhash, b AS band,
                (simhash >> (b * $width)) & $mask AS key
         FROM fp, unnest($bandList) AS u(b)),
       cand AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
       SELECT id_a, id_b,
              CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
       FROM cand
       JOIN fp fa ON fa.doc_id = id_a
       JOIN fp fb ON fb.doc_id = id_b
       WHERE bit_count(xor(fa.simhash, fb.simhash)) <= $maxHamming"""
  }

  /** Oracle for [[graft.operators.Mmr.mmrRerank]]: candidate search
    * replayed on the unrounded cosine (identical IEEE doubles), then
    * the greedy MMR loop UNROLLED as `k` selection CTEs — the same
    * loop-unrolling style as [[pqAnnSql]]'s subspace chain. Pairwise
    * sims and rel are rounded to 6 decimals before the λ-blend, ties
    * to the lower id, matching the operator's float discipline.
    */
  def mmrSql(probeId: Long, candidateK: Int, k: Int, lambda: Double,
             dim: Int): String = {
    def nrm(v: String) = s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    val oneMinus = 1 - lambda
    val stages = (2 to k).map { t =>
      s"""s$t AS (
         SELECT c.vec_id, $t AS rank FROM cand c
         WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
         ORDER BY ($lambda * c.rel - $oneMinus *
             (SELECT max(p.sim) FROM pair p
              JOIN sel${t - 1} s ON p.ib = s.vec_id
              WHERE p.ia = c.vec_id)) DESC, c.vec_id
         LIMIT 1),
       sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM s$t)"""
    }.mkString(",\n       ")
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       probe AS (SELECT v, ${nrm("v")} AS n FROM e WHERE vec_id = $probeId),
       cand AS (
         SELECT c.vec_id, round(${dotSql("p.v", "c.v", dim)}
             / (p.n * ${nrm("c.v")}), 6) AS rel, c.v
         FROM e c, probe p WHERE c.vec_id <> $probeId
         ORDER BY ${dotSql("p.v", "c.v", dim)} / (p.n * ${nrm("c.v")}) DESC,
                  c.vec_id
         LIMIT $candidateK),
       pair AS (
         SELECT a.vec_id AS ia, b.vec_id AS ib,
           round(${dotSql("a.v", "b.v", dim)}
             / (${nrm("a.v")} * ${nrm("b.v")}), 6) AS sim
         FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       sel1 AS (
         SELECT vec_id, 1 AS rank FROM cand
         ORDER BY rel DESC, vec_id LIMIT 1),
       $stages
       SELECT CAST(sel$k.rank AS BIGINT) AS rank,
              sel$k.vec_id AS neighbor_id, cand.rel
       FROM sel$k JOIN cand ON cand.vec_id = sel$k.vec_id"""
  }

  /** Oracle for [[graft.operators.KnnClassify.labelSuspectsIvf]]: the
    * [[ivfAnnSql]] index replay (labeled rows only, EVERY labeled row
    * as probe) feeding the [[labelSuspectsSql]] vote/pred tail. Both
    * halves reuse their proven parity contracts: (cosine desc,
    * neighbor_id) candidate ranking with NULL cosines excluded, and
    * (votes desc, label) winner selection.
    */
  def labelSuspectsIvfSql(k: Int, nCells: Int, nProbe: Int,
                          dim: Int): String =
    s"""WITH e AS (
         SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings WHERE label IS NOT NULL),
       n AS (
         SELECT vec_id, v,
                sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         FROM e),
       cents AS (
         SELECT vec_id AS cell_id, v AS cv, nrm AS cn
         FROM n ORDER BY vec_id LIMIT $nCells),
       asgn AS (
         SELECT n.vec_id, c.cell_id,
                CASE WHEN n.nrm * c.cn <> 0
                     THEN ${dotSql("n.v", "c.cv", dim)} / (n.nrm * c.cn)
                END AS sim
         FROM n CROSS JOIN cents c),
       ranked AS (
         SELECT vec_id, cell_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY sim DESC NULLS LAST, cell_id) AS rn
         FROM asgn),
       corpus_cell AS (
         SELECT vec_id AS neighbor_id, cell_id FROM ranked WHERE rn = 1),
       probe_cell AS (
         SELECT vec_id AS probe_id, cell_id FROM ranked
         WHERE rn <= $nProbe),
       cand AS (
         SELECT p.probe_id, c.neighbor_id
         FROM probe_cell p JOIN corpus_cell c
           ON p.cell_id = c.cell_id AND c.neighbor_id <> p.probe_id),
       scored AS (
         SELECT cand.probe_id, cand.neighbor_id,
                CASE WHEN np.nrm * nc.nrm <> 0
                     THEN ${dotSql("np.v", "nc.v", dim)} / (np.nrm * nc.nrm)
                END AS cosine
         FROM cand JOIN n np ON np.vec_id = cand.probe_id
                   JOIN n nc ON nc.vec_id = cand.neighbor_id),
       nn AS (
         SELECT probe_id, neighbor_id FROM (
           SELECT probe_id, neighbor_id,
                  row_number() OVER (PARTITION BY probe_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored WHERE cosine IS NOT NULL) t
         WHERE rank <= $k),
       votes AS (
         SELECT nn.probe_id, l.label, count(*) AS votes
         FROM nn JOIN e l ON l.vec_id = nn.neighbor_id
         GROUP BY 1, 2),
       pred AS (
         SELECT probe_id, label AS pred_label, votes FROM (
           SELECT probe_id, label, votes,
                  row_number() OVER (PARTITION BY probe_id
                    ORDER BY votes DESC, label) AS vr
           FROM votes) t
         WHERE vr = 1)
       SELECT p.probe_id, e.label, p.pred_label, p.votes,
              p.pred_label <> e.label AS is_suspect
       FROM pred p JOIN e ON e.vec_id = p.probe_id"""

  /** Oracle for [[graft.operators.GraphAnnDist.buildIndex]] over the
    * full `embeddings` table — replays the whole deterministic
    * construction: lowest-id centroids, argmax-cosine assignment (ties
    * to the lower cell ordinal, zero-norm sims NULLS LAST), within-cell
    * NSW forward edges as a window rank over same-cell predecessor
    * pairs (node i keeps its min(m, rank) nearest j < i by cosine desc,
    * j asc — exact neighbor selection makes the sequential insertion
    * order-free, hence SQL-expressible), and the centroid-level stitch
    * between entry nodes of non-empty cells under the same rule with
    * `mCells`. Output: (src_id, dst_id), both directions.
    */
  def graphAnnDistSql(nCells: Int, m: Int, mCells: Int, dim: Int): String = {
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       n AS (
         SELECT vec_id, v, ${nrm("v")} AS nrm FROM e),
       cents AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
                v AS cv, nrm AS cn
         FROM (SELECT vec_id, v, nrm FROM n ORDER BY vec_id LIMIT $nCells)),
       asgn AS (
         SELECT n.vec_id, c.cell_id,
                CASE WHEN n.nrm * c.cn <> 0
                     THEN ${dotSql("n.v", "c.cv", dim)} / (n.nrm * c.cn)
                END AS sim
         FROM n CROSS JOIN cents c),
       cellof AS (
         SELECT vec_id, cell_id FROM (
           SELECT vec_id, cell_id,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY sim DESC NULLS LAST, cell_id) AS rn
           FROM asgn) r WHERE rn = 1),
       pairs AS (
         SELECT a.vec_id AS i, b.vec_id AS j,
                CASE WHEN ni.nrm * nj.nrm <> 0
                     THEN ${dotSql("ni.v", "nj.v", dim)} / (ni.nrm * nj.nrm)
                END AS cosine
         FROM cellof a JOIN cellof b
           ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
         JOIN n ni ON ni.vec_id = a.vec_id
         JOIN n nj ON nj.vec_id = b.vec_id),
       fwd AS (
         SELECT i, j FROM (
           SELECT i, j, row_number() OVER (PARTITION BY i
             ORDER BY cosine DESC NULLS LAST, j) AS rn
           FROM pairs) r WHERE rn <= $m),
       entries AS (
         SELECT cell_id, min(vec_id) AS entry FROM cellof GROUP BY cell_id),
       cpairs AS (
         SELECT a.cell_id AS ci, b.cell_id AS cj,
                CASE WHEN ca.cn * cb.cn <> 0
                     THEN ${dotSql("ca.cv", "cb.cv", dim)} / (ca.cn * cb.cn)
                END AS cosine
         FROM entries a JOIN entries b ON b.cell_id < a.cell_id
         JOIN cents ca ON ca.cell_id = a.cell_id
         JOIN cents cb ON cb.cell_id = b.cell_id),
       cfwd AS (
         SELECT ci, cj FROM (
           SELECT ci, cj, row_number() OVER (PARTITION BY ci
             ORDER BY cosine DESC NULLS LAST, cj) AS rn
           FROM cpairs) r WHERE rn <= $mCells),
       xfwd AS (
         SELECT ea.entry AS i, eb.entry AS j
         FROM cfwd JOIN entries ea ON ea.cell_id = cfwd.ci
                   JOIN entries eb ON eb.cell_id = cfwd.cj)
       SELECT i AS src_id, j AS dst_id FROM fwd
       UNION ALL SELECT j AS src_id, i AS dst_id FROM fwd
       UNION ALL SELECT i AS src_id, j AS dst_id FROM xfwd
       UNION ALL SELECT j AS src_id, i AS dst_id FROM xfwd"""
  }

  /** Oracle for [[graft.operators.GraphAnnDist.appendToIndex]] with the
    * base/append split at `vec_id < splitId`: quantizer = lowest-id
    * BASE vectors; appends rank their same-cell base members (cosine
    * desc, base id asc, zero-norm NULLS LAST) and keep min(m, |base
    * cell|); appends in base-empty cells anchor at the global entry
    * (min base id). Output: the NEW edges, both directions.
    */
  def graphAnnAppendSql(splitId: Long, nCells: Int, m: Int,
                        dim: Int): String = {
    def nrm(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> x * x)))"
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       n AS (
         SELECT vec_id, v, ${nrm("v")} AS nrm FROM e),
       cents AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
                v AS cv, nrm AS cn
         FROM (SELECT vec_id, v, nrm FROM n WHERE vec_id < $splitId
               ORDER BY vec_id LIMIT $nCells)),
       asgn AS (
         SELECT n.vec_id, n.vec_id < $splitId AS is_base, c.cell_id,
                CASE WHEN n.nrm * c.cn <> 0
                     THEN ${dotSql("n.v", "c.cv", dim)} / (n.nrm * c.cn)
                END AS sim
         FROM n CROSS JOIN cents c),
       cellof AS (
         SELECT vec_id, is_base, cell_id FROM (
           SELECT vec_id, is_base, cell_id,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY sim DESC NULLS LAST, cell_id) AS rn
           FROM asgn) r WHERE rn = 1),
       pairs AS (
         SELECT a.vec_id AS i, b.vec_id AS j,
                CASE WHEN ni.nrm * nj.nrm <> 0
                     THEN ${dotSql("ni.v", "nj.v", dim)} / (ni.nrm * nj.nrm)
                END AS cosine
         FROM cellof a JOIN cellof b
           ON a.cell_id = b.cell_id AND NOT a.is_base AND b.is_base
         JOIN n ni ON ni.vec_id = a.vec_id
         JOIN n nj ON nj.vec_id = b.vec_id),
       fwd AS (
         SELECT i, j FROM (
           SELECT i, j, row_number() OVER (PARTITION BY i
             ORDER BY cosine DESC NULLS LAST, j) AS rn
           FROM pairs) r WHERE rn <= $m),
       orph AS (
         SELECT a.vec_id AS i,
                (SELECT min(vec_id) FROM cellof WHERE is_base) AS j
         FROM cellof a
         WHERE NOT a.is_base AND NOT EXISTS (
           SELECT 1 FROM cellof b
           WHERE b.is_base AND b.cell_id = a.cell_id))
       SELECT i AS src_id, j AS dst_id FROM fwd
       UNION ALL SELECT j AS src_id, i AS dst_id FROM fwd
       UNION ALL SELECT i AS src_id, j AS dst_id FROM orph
       UNION ALL SELECT j AS src_id, i AS dst_id FROM orph"""
  }

  /** Oracle for [[graft.operators.Pca.projectLeading]] over
    * `embeddings`: replays the rounded power-iteration chain —
    * round(avg)-based mean and covariance (the distributed-sum-order
    * absorption, same as kmeansSql), then `iters` steps of
    * y = C·x / ||C·x|| with every component rounded, every fold in
    * ASCENDING index order (ordered list comprehensions, matching the
    * operator's driver loops bit for bit), and the final centered
    * projection rounded per vector.
    */
  def pcaProjectSql(dim: Int, iters: Int, decimals: Int = 6): String = {
    val rng = s"range(1, ${dim + 1})"
    def iterCte(t: Int) =
      s"""y$t AS (
         SELECT covl.i AS i,
                list_sum(list_transform($rng, j ->
                  covl.cs[j] * xp.xs[j])) AS y
         FROM covl, x${t - 1} xp),
       x$t AS (
         SELECT list_transform(ys, v -> round(v / sqrt(
                  list_sum(list_transform(ys, w -> w * w))), $decimals)) AS xs
         FROM (SELECT list(y ORDER BY i) AS ys FROM y$t))"""
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       m AS (
         SELECT u.i AS i, round(avg(e.v[u.i]), $decimals) AS mu
         FROM e, unnest($rng) u(i) GROUP BY u.i),
       c AS (
         SELECT a.i AS i, b.i AS j,
                round(avg(e.v[a.i] * e.v[b.i]), $decimals) AS cij
         FROM e, unnest($rng) a(i), unnest($rng) b(i)
         GROUP BY a.i, b.i),
       cov AS (
         SELECT c.i, c.j, c.cij - ma.mu * mb.mu AS cv
         FROM c JOIN m ma ON ma.i = c.i JOIN m mb ON mb.i = c.j),
       covl AS (
         SELECT i, list(cv ORDER BY j) AS cs FROM cov GROUP BY i),
       x0 AS (SELECT list_transform($rng, i -> 1.0) AS xs),
       ${(1 to iters).map(iterCte).mkString(",\n       ")},
       ml AS (SELECT list(mu ORDER BY i) AS ms FROM m)
       SELECT e.vec_id,
              round(list_sum(list_transform($rng, i ->
                (e.v[i] - ml.ms[i]) * xt.xs[i])), $decimals) AS pc1
       FROM e, ml, x$iters xt"""
  }

  /** Oracle for [[graft.operators.Pca.diagnostics]]: the
    * [[pcaProjectSql]] chain reduced to its one-row summary — trace =
    * ordered fold of the rounded covariance diagonal, λ₁ = rounded
    * Rayleigh quotient of the final iterate, dominant ratio =
    * round(λ₁·dim/trace).
    */
  def pcaDiagSql(dim: Int, iters: Int, decimals: Int = 6): String = {
    val rng = s"range(1, ${dim + 1})"
    def iterCte(t: Int) =
      s"""y$t AS (
         SELECT covl.i AS i,
                list_sum(list_transform($rng, j ->
                  covl.cs[j] * xp.xs[j])) AS y
         FROM covl covl, x${t - 1} xp),
       x$t AS (
         SELECT list_transform(ys, v -> round(v / sqrt(
                  list_sum(list_transform(ys, w -> w * w))), $decimals)) AS xs
         FROM (SELECT list(y ORDER BY i) AS ys FROM y$t))"""
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       m AS (
         SELECT u.i AS i, round(avg(e.v[u.i]), $decimals) AS mu
         FROM e, unnest($rng) u(i) GROUP BY u.i),
       c AS (
         SELECT a.i AS i, b.i AS j,
                round(avg(e.v[a.i] * e.v[b.i]), $decimals) AS cij
         FROM e, unnest($rng) a(i), unnest($rng) b(i)
         GROUP BY a.i, b.i),
       cov AS (
         SELECT c.i, c.j, c.cij - ma.mu * mb.mu AS cv
         FROM c JOIN m ma ON ma.i = c.i JOIN m mb ON mb.i = c.j),
       covl AS (
         SELECT i, list(cv ORDER BY j) AS cs FROM cov GROUP BY i),
       x0 AS (SELECT list_transform($rng, i -> 1.0) AS xs),
       ${(1 to iters).map(iterCte).mkString(",\n       ")},
       cxl AS (
         SELECT covl.i AS i,
                list_sum(list_transform($rng, j ->
                  covl.cs[j] * xf.xs[j])) AS cx
         FROM covl covl, x$iters xf),
       cxll AS (SELECT list(cx ORDER BY i) AS cxs FROM cxl),
       eig AS (
         SELECT round(
                  list_sum(list_transform($rng, i -> xf.xs[i] * c.cxs[i])) /
                  list_sum(list_transform(xf.xs, v -> v * v)),
                  $decimals) AS e
         FROM x$iters xf, cxll c),
       tr AS (
         SELECT round(list_sum(ds), $decimals) AS trace FROM (
           SELECT list(cv ORDER BY i) AS ds FROM cov WHERE i = j))
       SELECT (SELECT count(*) FROM e) AS n_vectors,
              tr.trace AS trace,
              eig.e AS lambda1,
              round(eig.e * $dim / tr.trace, $decimals) AS dominant_ratio
       FROM tr, eig"""
  }

  /** Oracle for [[graft.operators.Pca.projectTopK]]: the
    * [[pcaProjectSql]] chain extended with Hotelling deflation —
    * after each component, eigenvalue = rounded Rayleigh quotient
    * (ordered folds) and the covariance lists deflate
    * round(c_ij − λ·x_i·x_j); component r then iterates on the
    * residual. Output: (vec_id, pc1..pck).
    */
  def pcaTopKSql(dim: Int, k: Int, iters: Int, decimals: Int = 6): String = {
    val rng = s"range(1, ${dim + 1})"
    def iterCte(r: Int, t: Int) =
      s"""y${r}_$t AS (
         SELECT covl.i AS i,
                list_sum(list_transform($rng, j ->
                  covl.cs[j] * xp.xs[j])) AS y
         FROM covl$r covl, x${r}_${t - 1} xp),
       x${r}_$t AS (
         SELECT list_transform(ys, v -> round(v / sqrt(
                  list_sum(list_transform(ys, w -> w * w))), $decimals)) AS xs
         FROM (SELECT list(y ORDER BY i) AS ys FROM y${r}_$t))"""
    def componentCtes(r: Int): String = {
      val iterChain = (1 to iters).map(iterCte(r, _)).mkString(",\n       ")
      val deflate = if (r == k) "" else s""",
       cxl$r AS (
         SELECT covl.i AS i,
                list_sum(list_transform($rng, j ->
                  covl.cs[j] * xf.xs[j])) AS cx
         FROM covl$r covl, x${r}_$iters xf),
       cxll$r AS (SELECT list(cx ORDER BY i) AS cxs FROM cxl$r),
       eig$r AS (
         SELECT round(
                  list_sum(list_transform($rng, i -> xf.xs[i] * c.cxs[i])) /
                  list_sum(list_transform(xf.xs, v -> v * v)),
                  $decimals) AS e
         FROM x${r}_$iters xf, cxll$r c),
       covl${r + 1} AS (
         SELECT covl.i AS i,
                list_transform($rng, j -> round(
                  covl.cs[j] - e.e * xf.xs[covl.i] * xf.xs[j],
                  $decimals)) AS cs
         FROM covl$r covl, x${r}_$iters xf, eig$r e)"""
      s"""x${r}_0 AS (SELECT list_transform($rng, i -> 1.0) AS xs),
       $iterChain$deflate"""
    }
    val pcCols = (1 to k).map(r =>
      s"""round(list_sum(list_transform($rng, i ->
                (e.v[i] - ml.ms[i]) * xf$r.xs[i])), $decimals) AS pc$r""")
      .mkString(",\n              ")
    val pcFroms = (1 to k).map(r => s"x${r}_$iters xf$r").mkString(", ")
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       m AS (
         SELECT u.i AS i, round(avg(e.v[u.i]), $decimals) AS mu
         FROM e, unnest($rng) u(i) GROUP BY u.i),
       c AS (
         SELECT a.i AS i, b.i AS j,
                round(avg(e.v[a.i] * e.v[b.i]), $decimals) AS cij
         FROM e, unnest($rng) a(i), unnest($rng) b(i)
         GROUP BY a.i, b.i),
       cov AS (
         SELECT c.i, c.j, c.cij - ma.mu * mb.mu AS cv
         FROM c JOIN m ma ON ma.i = c.i JOIN m mb ON mb.i = c.j),
       covl1 AS (
         SELECT i, list(cv ORDER BY j) AS cs FROM cov GROUP BY i),
       ${(1 to k).map(componentCtes).mkString(",\n       ")},
       ml AS (SELECT list(mu ORDER BY i) AS ms FROM m)
       SELECT e.vec_id,
              $pcCols
       FROM e, ml, $pcFroms"""
  }

  def ivfAnnSql(probeMax: Int, k: Int, nCells: Int, nProbe: Int,
                dim: Int): String =
    s"""WITH e AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       n AS (
         SELECT vec_id, v,
                sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         FROM e),
       cents AS (
         SELECT vec_id AS cell_id, v AS cv, nrm AS cn
         FROM n ORDER BY vec_id LIMIT $nCells),
       asgn AS (
         SELECT n.vec_id, c.cell_id,
                CASE WHEN n.nrm * c.cn <> 0
                     THEN ${dotSql("n.v", "c.cv", dim)} / (n.nrm * c.cn)
                END AS sim
         FROM n CROSS JOIN cents c),
       ranked AS (
         SELECT vec_id, cell_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY sim DESC NULLS LAST, cell_id) AS rn
         FROM asgn),
       corpus_cell AS (
         SELECT vec_id AS neighbor_id, cell_id FROM ranked WHERE rn = 1),
       probe_cell AS (
         SELECT vec_id AS probe_id, cell_id FROM ranked
         WHERE rn <= $nProbe AND vec_id < $probeMax),
       cand AS (
         SELECT p.probe_id, c.neighbor_id
         FROM probe_cell p JOIN corpus_cell c
           ON p.cell_id = c.cell_id AND c.neighbor_id <> p.probe_id),
       scored AS (
         SELECT cand.probe_id, cand.neighbor_id,
                CASE WHEN np.nrm * nc.nrm <> 0
                     THEN ${dotSql("np.v", "nc.v", dim)} / (np.nrm * nc.nrm)
                END AS cosine
         FROM cand JOIN n np ON np.vec_id = cand.probe_id
                   JOIN n nc ON nc.vec_id = cand.neighbor_id)
       SELECT probe_id, neighbor_id, rank FROM (
         SELECT probe_id, neighbor_id,
                row_number() OVER (PARTITION BY probe_id
                  ORDER BY cosine DESC, neighbor_id) AS rank
         FROM scored WHERE cosine IS NOT NULL) t
       WHERE rank <= $k"""
}
