package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust equi-join by key salting. A hot key (one user producing
  * 1% of a 100 TB log) lands its entire partition on one task in a
  * plain shuffle join; AQE's skew split handles sort-merge joins, but
  * salting is the shape that ALSO fixes the downstream per-key
  * aggregation and works under any join strategy:
  *
  *   - the fact side gets a salt in [0, factor) derived per-ROW, so a
  *     hot key spreads over `factor` tasks;
  *   - the dim side is replicated `factor` times (explode of a small
  *     sequence — dim rows × factor, cheap by the dim-side contract);
  *   - the equi-join runs on (keys..., salt).
  *
  * The salt routes rows and cancels out in the result: output equals
  * the unsalted join exactly, row for row. The salt is derived from
  * xxhash64 of the fact row's OTHER columns (not the key), so it is
  * deterministic for a given row — reruns shuffle identically, which
  * keeps retried tasks stable.
  */
object SaltedJoin {

  /** Inner equi-join of `facts` (large, possibly skewed) with `dims`
    * (small enough to replicate `factor`×) on `keys`.
    *
    * @param saltOn fact columns to hash for the salt; defaults to all
    *               non-key columns (a constant-per-key fact row set
    *               still spreads if any payload column varies)
    */
  def join(facts: DataFrame, dims: DataFrame, keys: Seq[String],
           factor: Int, saltOn: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "need join keys")
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val saltCols = if (saltOn.nonEmpty) saltOn
      else facts.columns.toSeq.filterNot(keys.contains)
    require(saltCols.nonEmpty,
      "no columns to salt on: pass saltOn explicitly")
    require(!facts.columns.contains("__salt") &&
      !dims.columns.contains("__salt"),
      "column name __salt is reserved")
    val dup = facts.columns.toSet.intersect(dims.columns.toSet) -- keys
    require(dup.isEmpty,
      s"non-key columns present on both sides: ${dup.mkString(",")}")
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(saltCols.map(col): _*), lit(factor.toLong)))
    val replicated = dims.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
