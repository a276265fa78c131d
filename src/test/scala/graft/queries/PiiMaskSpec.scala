package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SparkTestSession

/** Redaction completeness for pipe_pii_mask: after masking, no email-
  * or phone-shaped span may survive anywhere in the output. */
class PiiMaskSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("masked output carries no residual PII spans") {
    val rows = PipelineOps.queries("pipe_pii_mask")(
        spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val phone = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}".r
    rows.foreach { r =>
      val masked = r.getString(1)
      assert(email.findFirstIn(masked).isEmpty, s"email survived: $masked")
      assert(phone.findFirstIn(masked).isEmpty, s"phone survived: $masked")
      assert(r.getInt(2) === 1 && r.getInt(3) === 1,
        s"derived contact should contain exactly one email+phone: $r")
      assert(masked.contains("<EMAIL>") && masked.contains("<PHONE>"))
    }
  }
}
