package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Repetition signals, decontamination, and PII scrubbing — the data-hygiene
  * operator family backing q67/q68/q69.
  */
class DataHygieneSpec extends SparkSpec {

  import spark.implicits._

  test("wordNgrams slides over the token stream; short docs yield empty") {
    val df = Seq("a b c d", "a b", "one", "", "x  y").toDF("t")
      .select(TextFunctions.wordNgrams($"t", 3).as("g"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Nil, Nil, Nil, Nil))
    val bigrams = Seq("x  y").toDF("t")
      .select(TextFunctions.wordNgrams($"t", 2).as("g"))
      .as[Seq[String]].head()
    // double space: empties are filtered before gram construction
    assert(bigrams == Seq("x y"))
  }

  test("scrubPii redacts emails, IPs, and phones with typed tags") {
    val in = "mail bob.smith+x@corp.example.org host 192.168.0.1 call 555-0199 done"
    val out = Seq(in).toDF("t").select(TextFunctions.scrubPii($"t")).as[String].head()
    assert(out == "mail <EMAIL> host <IP> call <PHONE> done")
    // email is scrubbed before narrower patterns can nibble its digits
    val tricky = Seq("a1.2.3.4@x.io and 1.2.3.4").toDF("t")
      .select(TextFunctions.scrubPii($"t")).as[String].head()
    assert(tricky == "<EMAIL> and <IP>")
  }

  test("contaminatedIds flags only train docs overlapping the eval set") {
    val docs = Seq(
      (0L, "alpha beta gamma delta tail"),    // eval (id % 2 == 0)
      (1L, "alpha beta gamma delta other"),   // train, shares the 4-gram
      (2L, "zz yy xx ww vv"),                 // eval
      (3L, "totally different words here now"), // train, clean
      (5L, "pre alpha beta gamma delta"),     // train, shares via offset
    ).toDF("doc_id", "text")
    val got = Decontamination
      .contaminatedIds(docs, "doc_id", "text", $"doc_id" % 2 === 0, n = 4)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 5L))
  }
}
