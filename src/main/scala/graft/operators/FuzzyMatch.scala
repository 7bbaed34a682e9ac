package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (SURVEY §2.10 widening): find pairs of
  * near-identical strings by Levenshtein edit distance without the
  * all-pairs cross product.
  *
  * The classic record-linkage recipe: (1) dedupe to DISTINCT strings —
  * linkage is a property of the value, not the row, so the exchange
  * carries each distinct string once no matter how many rows share it;
  * (2) assign each string a cheap BLOCKING key (last token, length
  * bucket, phonetic code — caller-supplied); (3) compare only within a
  * block, `a < b` ordered so each pair is emitted once; (4) verify
  * with the exact edit distance (Spark's codegen'd `levenshtein`).
  *
  * At 100 TB the cost is Σ |block|² over distinct values — the blocking
  * key is the knob, exactly like LSH banding in [[DedupOps]]: a block
  * key that keeps blocks near-constant-size makes the join linear in
  * the vocabulary. Nothing here ever joins on the raw table.
  */
object FuzzyMatch {

  /** Distinct-value near-match pairs within caller-defined blocks.
    *
    * @param df       input rows
    * @param strCol   string column to link on
    * @param blockKey blocking key expression over the string value
    * @param maxDist  inclusive Levenshtein threshold
    * @return (name_a, name_b, dist) with name_a < name_b
    */
  def blockedPairs(df: DataFrame, strCol: String, blockKey: Column => Column,
                   maxDist: Int): DataFrame = {
    val names = df.select(col(strCol).as("name_a"))
      .filter(col("name_a").isNotNull).distinct()
      .withColumn("__blk", blockKey(col("name_a")))
    val right = names.select(col("__blk").as("__blk_b"),
      col("name_a").as("name_b"))
    names.join(right,
        col("__blk") === col("__blk_b") && col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** [[blockedPairs]] plus the row-mass each matched pair bridges:
    * how many input rows carry each side (the "how much would merge"
    * audit before an entity-resolution rewrite). The per-value counts
    * aggregate BEFORE joining pairs, so the join stays
    * vocabulary-sized.
    */
  def blockedPairsWithMass(df: DataFrame, strCol: String,
                           blockKey: Column => Column, maxDist: Int): DataFrame = {
    val mass = df.groupBy(col(strCol).as("__v"))
      .agg(count(lit(1)).as("__n"))
    blockedPairs(df, strCol, blockKey, maxDist)
      .join(mass.select(col("__v"), col("__n").as("n_rows_a")),
        col("name_a") === col("__v")).drop("__v")
      .join(mass.select(col("__v"), col("__n").as("n_rows_b")),
        col("name_b") === col("__v")).drop("__v")
      .select("name_a", "name_b", "dist", "n_rows_a", "n_rows_b")
  }
}
