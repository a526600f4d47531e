package graft.ops

/** THE cross-engine hash-key primitive: the first 8 hex chars of
  * md5(tag), parsed as an unsigned 32-bit integer — exactly
  * `CAST(concat('0x', substr(md5(tag), 1, 8)) AS BIGINT)` in DuckDB
  * and `conv(substr(md5(tag), 1, 8), 16, 10)` in Spark SQL. Every
  * deterministic driver-side literal in the registry (LSH
  * hyperplanes, IVF centroids, NN weight init, KMeans/power-iteration
  * init) derives from this ONE function; the per-site formulas differ
  * only in how they map the 32-bit value into their range. Keeping
  * the parse in one place is load-bearing: a divergent copy (different
  * prefix length, signedness, or charset) would silently break the
  * cross-engine equivalence the oracle gate rests on.
  */
object HashKeys {

  /** first8hex(md5(tag)) as an unsigned 32-bit value in [0, 2³²). */
  def md5Prefix32(tag: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tag.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** uniform in [−1, 1): md5Prefix32 / 2³² · 2 − 1 (the hyperplane /
    * centroid formula; callers round to a fixed scale so the SAME
    * literal appears in the Spark plan and the oracle SQL). */
  def unitUniform(tag: String): Double =
    md5Prefix32(tag).toDouble / 4294967296.0 * 2.0 - 1.0

  /** integer-exact uniform in [−1, 1]: (md5Prefix32 mod 1000) / 999 ·
    * 2 − 1 (the KMeans / power-iteration init formula — mod-1000 keeps
    * the quotient exactly representable so both engines agree
    * bit-for-bit without rounding). */
  def gridUniform(tag: String): Double =
    (md5Prefix32(tag) % 1000).toDouble / 999.0 * 2.0 - 1.0
}
