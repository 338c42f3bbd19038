package graft

import graft.text.Pii
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII scrubber contract on adversarial strings the fixture corpus can't
  * produce; the oracle gate (text_pii_redact) proves Java/RE2 parity on
  * the planted corpus, this spec pins the semantics themselves.
  */
class PiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Pii.redact(col("t"))).head().getString(0)
  private def counts(s: String): (Int, Int, Int) = {
    val r = Seq(s).toDF("t").select(
      Pii.emailCount(col("t")), Pii.ipCount(col("t")), Pii.phoneCount(col("t"))).head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("all three classes redact with their tags, multiples included") {
    val in = "mail a.b+c@x-y.example.org and d@e.io from 192.168.0.1 call +44 555 123456 end"
    val out = redactOne(in)
    assert(out == "mail [EMAIL] and [EMAIL] from [IP] call [PHONE] end", out)
    assert(counts(in) == ((2, 1, 1)))
  }

  test("redaction order: an email's digit runs are never nibbled by the IP/phone patterns") {
    // local part and domain carry dotted digit runs an IP pattern could
    // partially match if it ran first
    val in = "x 1.2.3.4u@9.8.7.example.com y"
    assert(redactOne(in) == "x [EMAIL] y")
    // a bare dotted quad inside a longer dotted run: \b lets the first
    // four octets match (RE2 and Java agree — the parity the oracle gates)
    assert(counts("version 1.2.3.4.5 here")._2 == 1)
  }

  test("redaction is idempotent — tags contain nothing matchable") {
    val in = "a@b.co 10.0.0.1 +1 555 0100"
    val once = redactOne(in)
    assert(redactOne(once) == once)
  }

  test("non-PII text passes through byte-identical") {
    val in = "plain words only, punctuation; +not a phone, a@b (no tld), 1.2.3"
    assert(redactOne(in) == in)
    assert(counts(in) == ((0, 0, 0)))
  }
}
