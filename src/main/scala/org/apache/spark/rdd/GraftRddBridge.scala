package org.apache.spark.rdd



/** Bridge to `RDD.isLocallyCheckpointed` (private[spark]): the
  * staleness probe of graft's memoized shared stages must distinguish
  * a LOCAL checkpoint (persisted blocks — an external unpersist
  * orphans it) from a RELIABLE one (file-backed — never enters
  * `getPersistentRDDs`, so registry membership says nothing). The
  * storage level cannot stand in: `unpersist` resets it to NONE, which
  * would make a swept local checkpoint read as "not local" exactly
  * when the probe must fire. Same technique as GraftExpressionBridge. */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
