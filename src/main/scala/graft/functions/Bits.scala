package graft.functions

import java.math.BigInteger

/** Bit-level codec for the TVP/RS LSB watermark.
  *
  * Faithfully reproduces the reference's decimal-binary text codec
  * (reference assistance.py:1–31) and the per-vector LSB embed/extract
  * (reference watermarking.py:53–117), including its quirks:
  *   - `float_to_bin` drops the sign, so embedding into a negative component
  *     yields a positive one;
  *   - integer-valued floats render as "<bits>.0";
  *   - the bit index is computed over the dot-free length but applied to the
  *     dotted string, stepping left one char when it lands on the dot.
  * The only deviation: the fraction loop is capped at 1200 iterations — for
  * every float32-derived value the Python loop terminates (the fractional part
  * is a dyadic rational, ≤ 1074 doublings), so the cap is unreachable in
  * practice and only guards against non-float32 doubles
  * (assistance.py:13–21 can loop forever on those).
  */
object Bits {

  /** Reference `float_to_bin` (assistance.py:1–24). */
  def floatToBin(num0: Double): String = {
    val num = if (num0 < 0) -num0 else num0
    if (num == Math.floor(num) && !num.isInfinity) {
      // bin(int(num))[2:] + '.0'
      new java.math.BigDecimal(num).toBigInteger.toString(2) + ".0"
    } else {
      // non-integer float32 values are < 2^24 in magnitude, toLong is exact
      val intPart = num.toLong
      val sb      = new java.lang.StringBuilder(java.lang.Long.toBinaryString(intPart))
      sb.append('.')
      var temp = num - intPart
      var done = false
      var iter = 0
      while (!done && iter < 1200) {
        temp *= 2
        sb.append(if (temp >= 1.0) '1' else '0')
        if (temp > 1.0) temp -= Math.floor(temp)
        else if (temp == 1.0) done = true
        iter += 1
      }
      sb.toString
    }
  }

  /** Reference `bin_to_float` (assistance.py:26–31). Sums fraction bits
    * left-to-right in double, matching Python's `sum(...)` order.
    */
  def binToFloat(b: String): Double = {
    val dot = b.indexOf('.')
    if (dot < 0) return new BigInteger(b, 2).doubleValue
    val intPart = new BigInteger(if (dot == 0) "0" else b.substring(0, dot), 2).doubleValue
    var f = 0.0
    var i = dot + 1
    while (i < b.length) {
      if (b.charAt(i) == '1') {
        val e = i - dot
        if (e <= 1074) f += Math.pow(2.0, -e)
      }
      i += 1
    }
    intPart + f
  }

  /** Carrier dimension: md5(id) % d, skipping the secret key dims
    * (watermarking.py:55–58).
    */
  def carrierDim(h: BigInteger, d: Int, dims: Array[Int]): Int = {
    var pos = h.mod(BigInteger.valueOf(d.toLong)).intValue
    while (dims.contains(pos)) pos = (pos + 1) % d
    pos
  }

  /** Bit index inside the dotted binary string (watermarking.py:60–75). */
  private def bitPosition(h: BigInteger, binRep: String): Int = {
    val lenBin = binRep.length - 1 // float_to_bin always contains one '.'
    val minPos = (lenBin * 0.5).toInt
    val span   = lenBin - minPos
    var bp     = h.mod(BigInteger.valueOf(span.toLong)).intValue + minPos
    if (binRep.charAt(bp) == '.') bp -= 1
    bp
  }

  /** Reference `embed_watermark_single_vector` (watermarking.py:53–86).
    * Pure: returns a new array, input untouched.
    */
  def embedLsb(vec: Array[Float], wmBit: Int, dims: Array[Int], cid: String): Array[Float] = {
    val h   = Hashing.md5Big(cid)
    val pos = carrierDim(h, vec.length, dims)
    val bin = floatToBin(vec(pos).toDouble)
    val bp  = bitPosition(h, bin)
    val bit = wmBit ^ (pos % 2)
    val out = vec.clone()
    val sb  = new java.lang.StringBuilder(bin)
    sb.setCharAt(bp, if (bit == 1) '1' else '0')
    out(pos) = binToFloat(sb.toString).toFloat
    out
  }

  /** Reference `extract_watermark_single_vector` (watermarking.py:88–117). */
  def extractLsb(vec: Array[Float], dims: Array[Int], cid: String): Int = {
    val h   = Hashing.md5Big(cid)
    val pos = carrierDim(h, vec.length, dims)
    val bin = floatToBin(vec(pos).toDouble)
    val bp  = bitPosition(h, bin)
    val bit = if (bin.charAt(bp) == '1') 1 else 0
    bit ^ (pos % 2)
  }

  /** Reference `generate_id_from_selected_dims` (watermarking.py:39–50):
    * leading decimal digit of trunc(|v[dim]| * scale) per key dim, concatenated.
    * The watermarking.py variant iterates `selected_dims[:-1]` (drops the last
    * key dim — pass `dims.init`); SCPW.py:73–84 / tabularMark.py:26–39 use all
    * of `range(k)`. `scale` generalizes the reference (scale=1): the driver
    * fixture's embeddings are unit-scale gaussians where every leading digit
    * of trunc(|x|) is 0, so fixture queries pass scale=1000 to recover a
    * discriminative id. Oracle-parity: digit k is
    * `substr(cast(cast(trunc(abs(embedding[k]) * scale) as bigint) as varchar), 1, 1)`.
    */
  def contentId(vec: Array[Float], dims: Array[Int], scale: Double): String = {
    val sb = new java.lang.StringBuilder(dims.length)
    var i  = 0
    while (i < dims.length) {
      val v = Math.abs(vec(dims(i)).toDouble) * scale
      sb.append(java.lang.Long.toString(v.toLong).charAt(0))
      i += 1
    }
    sb.toString
  }
}
