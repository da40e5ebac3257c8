package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the one shuffle pathology AQE's
  * skew-join handling doesn't fix: a single hot key that exceeds one
  * task's memory even after AQE splitting, e.g. the empty-string or
  * null-ish sentinel key in a 100 TB fact table).
  *
  * `left` (large, skewed) gets a random salt in [0, salts); `right`
  * (smaller) is exploded ×salts so every salted left key finds its
  * match. The join key becomes (key, salt) — the hot key's rows spread
  * over `salts` tasks. Correctness is exact: each left row matches
  * exactly one replica of each matching right row.
  *
  * Salting is sized by `salts`, not data-dependent — callers pick it
  * from observed skew (rows of hottest key / target rows per task).
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs already contain a __salt column; rename it before salting")
    // rand() is seeded per-partition by Spark; determinism of the JOIN
    // RESULT doesn't depend on which salt a row draws.
    val saltedLeft = left.withColumn("__salt", (rand(42) * salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(
        saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop(saltedRight("__salt"))
      .drop(saltedLeft("__salt"))
  }
}
