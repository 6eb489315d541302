package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-defeating two-stage (salted) aggregation: a hot key that would
 * pin one reducer is spread across `salts` sub-keys in the wide first
 * stage; the narrow second stage combines the per-salt partials.
 * Results are IDENTICAL to the direct groupBy (oracle-gated) — only the
 * plan changes: one skew-prone exchange becomes one uniform
 * (key, salt)-keyed exchange plus a |keys|·salts-row one.
 *
 * Spark's map-side partial aggregation already defuses count-like skew;
 * explicit salting is the pattern for when a single reducer key is
 * still too hot — heavy aggregation state (collect_list-ish), extreme
 * single-key dominance, or AQE skew handling disabled. This module
 * keeps the algebra honest: only aggregates with an associative merge
 * (count/sum/min/max here) may ride a salted split.
 */
object Salted {

  /** Per-key row counts via the salted two-stage plan. The salt is
    * derived from a per-row id column (any value works — the result is
    * salt-invariant; a DETERMINISTIC id keeps reruns bit-identical,
    * which `monotonically_increasing_id` would not). */
  def countByKey(df: DataFrame, keyCol: String, saltFromCol: String,
                 salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    df.select(col(keyCol).as("__k"),
        pmod(xxhash64(col(saltFromCol)), lit(salts.toLong)).as("__salt"))
      .groupBy(col("__k"), col("__salt")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__k")).agg(sum(col("__c")).as("n"))
      .select(col("__k").as(keyCol), col("n"))
  }

  /**
   * Skew-defeating replicated equi-join: every `left` row carries a
   * salt derived from a per-row column; every `right` row REPLICATES
   * across all `salts` sub-keys, and the join runs on (key, salt) — a
   * hot left key that would pin one reducer spreads across `salts`
   * tasks. Results are IDENTICAL to `left.join(right, key)` (inner);
   * only the plan changes.
   *
   * The cost contract: the right side shuffles `salts`× its size, so
   * this is the pattern for a FACT×DIM join whose dim is modest but too
   * big (or too mutable) to broadcast, with fact-side key skew AQE
   * doesn't catch (e.g. aggregation state downstream of the join). For
   * a right side that fits in memory, `broadcast()` beats salting;
   * for two huge sides, salt only the detected hot keys instead
   * (partial salting — compose from this by splitting the input).
   * `right`'s join key must be UNIQUE (a dim contract — replication
   * would otherwise double-join duplicates; enforced cheaply at plan
   * time by the caller if needed).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 saltFromCol: String, salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(saltFromCol)), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Per-key sum via the salted two-stage plan (Long column). */
  def sumByKey(df: DataFrame, keyCol: String, valCol: String,
               saltFromCol: String, salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    df.select(col(keyCol).as("__k"), col(valCol).as("__v"),
        pmod(xxhash64(col(saltFromCol)), lit(salts.toLong)).as("__salt"))
      .groupBy(col("__k"), col("__salt")).agg(sum(col("__v")).as("__c"))
      .groupBy(col("__k")).agg(sum(col("__c")).as("sum"))
      .select(col("__k").as(keyCol), col("sum"))
  }
}
