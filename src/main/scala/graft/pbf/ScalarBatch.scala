package graft.pbf

/** Growable struct-of-arrays buffer for the scalar element columns
  * (`id, type, lat, lon, version, timestamp, changeset`) plus a CSR
  * way-refs column — the decode target of the vectorized scan path
  * (reference dense.py:83-180 keeps exactly these per-block numpy
  * arrays; tags/members take the row-at-a-time path instead).
  *
  * One instance per PrimitiveBlock, so capacity is bounded by the
  * ~8k-element blocks PBF writers emit, never by the file. Slots are
  * written at most once (`n` is monotone), so the zero-fill that
  * `Arrays.copyOf` gives freshly grown tails is a valid "not yet
  * written" state.
  *
  * Refs layout: row i's refs are `refsFlat[refOffsets(i) until
  * refOffsets(i+1))` — [[add]] carries the running offset forward, so
  * rows without refs (nodes, relations) get a zero-length span (the
  * row path's empty array, never null). [[appendRefs]] must be called
  * immediately after the corresponding [[add]].
  *
  * Tags layout: same CSR shape over (tagKeyIds, tagValIds) — row i's
  * tag pairs are indices `tagOffsets(i) until tagOffsets(i+1)` into the
  * block string table [[strs]]. Strings stay block-local IDS here; the
  * batch builder UTF-8-encodes each table entry once per block instead
  * of once per occurrence (the row path pays a fresh UTF8String per
  * row per tag).
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
  var refOffsets: Array[Int] = new Array[Int](initial + 1)
  var refsFlat: Array[Long] = new Array[Long](0)
  var refsLen: Int = 0
  var tagOffsets: Array[Int] = new Array[Int](initial + 1)
  var tagKeyIds: Array[Int] = new Array[Int](0)
  var tagValIds: Array[Int] = new Array[Int](0)
  var tagsLen: Int = 0
  /** Block string table backing tagKeyIds/tagValIds (set by the decoder
    * when tags are emitted). */
  var strs: Array[String] = Array.empty

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
      refOffsets = java.util.Arrays.copyOf(refOffsets, cap + 1)
      tagOffsets = java.util.Arrays.copyOf(tagOffsets, cap + 1)
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
    refOffsets(n) = refsLen
    tagOffsets(n) = tagsLen
  }

  /** Attach refs to the row just written by [[add]]. */
  def appendRefs(refs: Array[Long]): Unit = {
    if (refs.length == 0) return
    val need = refsLen + refs.length
    if (need > refsFlat.length) {
      var cap = math.max(refsFlat.length, 1024)
      while (cap < need) cap *= 2
      refsFlat = java.util.Arrays.copyOf(refsFlat, cap)
    }
    System.arraycopy(refs, 0, refsFlat, refsLen, refs.length)
    refsLen = need
    refOffsets(n) = refsLen
  }

  /** Low-level: append one (key, val) string-id pair to the flat arrays
    * WITHOUT closing the row's span — bulk builders (the dense fast
    * path) manage tagOffsets themselves. */
  def pushTagPair(k: Int, v: Int): Unit = {
    if (tagsLen == tagKeyIds.length) {
      val cap = math.max(tagKeyIds.length * 2, 1024)
      tagKeyIds = java.util.Arrays.copyOf(tagKeyIds, cap)
      tagValIds = java.util.Arrays.copyOf(tagValIds, cap)
    }
    tagKeyIds(tagsLen) = k
    tagValIds(tagsLen) = v
    tagsLen += 1
  }

  /** Attach tag pairs to the row just written by [[add]]. */
  def appendTags(keys: Array[Long], vals: Array[Long]): Unit = {
    var i = 0
    while (i < keys.length) {
      pushTagPair(keys(i).toInt, vals(i).toInt)
      i += 1
    }
    tagOffsets(n) = tagsLen
  }

  /** Close the tag span of the row just written by [[add]] after a run
    * of [[pushTagPair]] calls. */
  def sealTags(): Unit = tagOffsets(n) = tagsLen
}
