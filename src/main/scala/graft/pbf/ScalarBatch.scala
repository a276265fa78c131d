package graft.pbf

/** Growable struct-of-arrays buffer for the scalar element columns
  * (`id, type, lat, lon, version, timestamp, changeset`) — the decode
  * target of the vectorized scan path (reference dense.py:83-180 keeps
  * exactly these per-block numpy arrays; tags/refs/members take the
  * row-at-a-time path, where the decoded arrays wrap zero-copy into
  * GenericArrayData — a conf-gated columnar refs/tags tier existed in
  * round 7 and was retired in round 8 after warm-JVM A/Bs showed
  * parity at best; see README "Columnar refs/tags tier" table).
  *
  * One instance per PrimitiveBlock, so capacity is bounded by the
  * ~8k-element blocks PBF writers emit, never by the file. Slots are
  * written at most once (`n` is monotone), so the zero-fill that
  * `Arrays.copyOf` gives freshly grown tails is a valid "not yet
  * written" state.
  */
final class ScalarBatch(initial: Int = 8192) {
  var n: Int = 0
  var ids: Array[Long] = new Array[Long](initial)
  var types: Array[Byte] = new Array[Byte](initial)
  var lats: Array[Double] = new Array[Double](initial)
  var lons: Array[Double] = new Array[Double](initial)
  var versions: Array[Int] = new Array[Int](initial)
  var tsMicros: Array[Long] = new Array[Long](initial)
  var changesets: Array[Long] = new Array[Long](initial)
  var hasInfo: Array[Boolean] = new Array[Boolean](initial)

  def ensure(extra: Int): Unit = {
    val need = n + extra
    if (need > ids.length) {
      var cap = ids.length
      while (cap < need) cap *= 2
      ids = java.util.Arrays.copyOf(ids, cap)
      types = java.util.Arrays.copyOf(types, cap)
      lats = java.util.Arrays.copyOf(lats, cap)
      lons = java.util.Arrays.copyOf(lons, cap)
      versions = java.util.Arrays.copyOf(versions, cap)
      tsMicros = java.util.Arrays.copyOf(tsMicros, cap)
      changesets = java.util.Arrays.copyOf(changesets, cap)
      hasInfo = java.util.Arrays.copyOf(hasInfo, cap)
    }
  }

  def add(id: Long, etype: Byte, lat: Double, lon: Double,
      version: Int, tsMicro: Long, changeset: Long, info: Boolean): Unit = {
    ensure(1)
    ids(n) = id
    types(n) = etype
    lats(n) = lat
    lons(n) = lon
    versions(n) = version
    tsMicros(n) = tsMicro
    changesets(n) = changeset
    hasInfo(n) = info
    n += 1
  }
}
