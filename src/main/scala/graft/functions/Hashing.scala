package graft.functions

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Keyed deterministic hashing — the engine's only source of "randomness".
  *
  * The reference drives carrier selection and attacks with Python's global
  * sequential PRNG (`random.seed` + `random.sample`; reference
  * watermarking.py:276 and watermarking.py:159). A sequential PRNG stream
  * cannot be replayed on a cluster where rows are partitioned arbitrarily and
  * tasks retry, so this engine replaces every draw with keyed hashing: a pure
  * function of (entity id, operation name, seed, rep). Same distribution,
  * bit-stable under any partitioning, task retry, or AQE re-plan. MD5 (not
  * xxhash64) is deliberate: DuckDB's `md5()` returns the identical hex string,
  * so oracle SQL can reproduce draws and orderings bit-exactly.
  */
object Hashing {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5Bytes(s: String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(s.getBytes(StandardCharsets.UTF_8))
  }

  private val HEX = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val b  = md5Bytes(s)
    val sb = new java.lang.StringBuilder(32)
    var i  = 0
    while (i < 16) {
      sb.append(HEX((b(i) >> 4) & 0xf)); sb.append(HEX(b(i) & 0xf)); i += 1
    }
    sb.toString
  }

  /** Full 128-bit MD5 as unsigned BigInteger — reference `hash_re`
    * (watermarking.py:20–27): `int(md5(str(x)).hexdigest(), 16)`.
    */
  def md5Big(s: String): BigInteger = new BigInteger(1, md5Bytes(s))

  /** `hash_re(s) % m` with full-width semantics (not a truncated-low-bits mod).
    * Oracle equivalent (DuckDB): Horner fold over the hex digits,
    * `list_reduce(list_transform(string_split(md5(s),''), c ->
    *   strpos('0123456789abcdef', c) - 1), (a, b) -> (a * 16 + b) % m)`.
    */
  def md5Mod(s: String, m: Long): Long =
    md5Big(s).mod(BigInteger.valueOf(m)).longValueExact()

  /** Uniform in [0,1): first 52 bits (13 hex chars) of md5 over 2^52.
    * Oracle: `cast('0x' || substr(md5(s),1,13) as bigint) / 4503599627370496.0`.
    */
  def unitUniform(s: String): Double =
    new BigInteger(md5Hex(s).substring(0, 13), 16).doubleValue / 4503599627370496.0

  def uniform(s: String, lo: Double, hi: Double): Double =
    lo + (hi - lo) * unitUniform(s)

  /** Standard normal via Box–Muller over two keyed uniforms. */
  def gauss(s: String): Double = {
    val u1 = 1.0 - unitUniform(s + "|u1") // (0,1], keeps log finite
    val u2 = unitUniform(s + "|u2")
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Deterministic sample-without-replacement of `n` distinct ints from
    * [0, d) — replaces `random.sample(range(d), 10)` (watermarking.py:282).
    * Draws md5(seed|i) mod d, skipping repeats.
    */
  def sampleDims(d: Int, n: Int, seed: String): Array[Int] = {
    require(n <= d, s"cannot sample $n dims from $d")
    val out  = new scala.collection.mutable.ArrayBuffer[Int](n)
    val seen = new java.util.BitSet(d)
    var i = 0
    while (out.length < n) {
      val c = md5Mod(s"$seed|dim|$i", d.toLong).toInt
      if (!seen.get(c)) { seen.set(c); out += c }
      i += 1
    }
    out.toArray
  }
}
