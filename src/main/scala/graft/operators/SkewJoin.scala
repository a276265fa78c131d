package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4.2 / the 100 TB brief):
  * when one join key dominates (a node shared by thousands of ways, a
  * gram present in every document), hash-partitioning sends the whole
  * key to one task. Salting splits the hot key's left rows across
  * `salts` sub-keys deterministically and replicates the right side
  * `salts` ways, so the hot key fans out over `salts` tasks.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins at runtime; this explicit form is for (a) broadcast-
  * ineligible hot-key joins where AQE's split thresholds don't trigger,
  * and (b) deterministic plans in pipelines that must not depend on
  * runtime stats.
  */
object SkewJoin {

  /** Inner equi-join `left(leftKey) = right(rightKey)` with the right
    * side replicated `salts` ways. The salt is derived from the hash of
    * the left row's hashable columns — deterministic, no RNG in the
    * plan. The salt column name is chosen to avoid clobbering any user
    * column, and unhashable column types (maps) are excluded from the
    * salt hash rather than failing analysis. */
  def saltedInner(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    var saltCol = "__graft_salt"
    while (left.columns.contains(saltCol) || right.columns.contains(saltCol))
      saltCol += "_"
    // MapType cannot appear in a hash expression — at any nesting depth
    // (array<map<...>>, struct fields containing maps); hashing the
    // remaining columns still spreads same-key rows (degrades only if
    // the key is the sole hashable column)
    val hashable = left.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name))
    require(hashable.nonEmpty, "left side has no hashable columns to salt on")
    val saltedLeft = left.withColumn(saltCol,
      pmod(xxhash64(hashable: _*), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft(saltCol) === saltedRight(saltCol))
      .drop(saltCol)
  }

  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case StructType(fields) => fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }
}
