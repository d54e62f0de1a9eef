package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PII scrub + repetition signals on hand-computed fixtures. */
class PiiTextStatsSpec extends SparkSpec {

  import spark.implicits._

  test("pii.redact masks emails, IPv4s and phones; counts agree") {
    val df = Seq(
      ("write ana.lu+1@sub.example.pe or call 555-010-1234",
        1, 0, 1),
      ("server 10.0.255.7 then 192.168.1.1; version 1.2 stays", 0, 2, 0),
      ("no pii here at all", 0, 0, 0),
      ("a@b.io b@c.io 555 010 1234", 2, 0, 1))
      .toDF("txt", "emails", "ips", "phones")
    val got = df.select(
      pii.matchCount(col("txt"), pii.EmailRe).as("e"),
      pii.matchCount(col("txt"), pii.Ipv4Re).as("i"),
      pii.matchCount(col("txt"), pii.PhoneRe).as("p"),
      col("emails"), col("ips"), col("phones"),
      pii.redact(col("txt")).as("red")).collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(3) && r.getInt(1) == r.getInt(4) &&
        r.getInt(2) == r.getInt(5), s"counts off for ${r.getString(6)}")
    }
    assert(got(0).getString(6) == "write <EMAIL> or call <PHONE>")
    assert(got(1).getString(6) == "server <IP> then <IP>; version 1.2 stays")
    assert(got(2).getString(6) == "no pii here at all")
    assert(got(3).getString(6) == "<EMAIL> <EMAIL> <PHONE>")
  }

  test("compressionRatio separates repetitive from varied text") {
    val rep = "lorem ipsum " * 200
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val df = Seq(rep, varied).toDF("txt")
      .select(textstats.compressionRatio(col("txt")).as("r"))
    val Array(rRep, rVar) = df.collect().map(_.getDouble(0))
    assert(rRep < 0.05, s"repeated text should crush: $rRep")
    assert(rVar > 0.3, s"varied text should not: $rVar")
    // kernel sanity: deflate of known bytes is stable within a JVM
    val a = TextKernels.deflateLen("abcabcabc".getBytes("UTF-8"))
    assert(a > 0 && a == TextKernels.deflateLen("abcabcabc".getBytes("UTF-8")))
  }

  test("deflate_len is SQL-registered via GraftExtensions") {
    graft.GraftExtensions.install(spark)
    val n = spark.sql("SELECT deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa') AS n")
      .collect()(0).getInt(0)
    assert(n > 0 && n < 24, s"24 repeated bytes must compress: $n")
  }

  test("dupNgramFraction and topNgramFraction match hand computation") {
    // "a b a b a": 2-grams [a b, b a, a b, b a] -> 4 total, 2 distinct
    // -> dup 0.5; 3-grams [a b a, b a b, a b a] -> top "a b a" 2/3.
    val df = Seq("a b a b a", "all words differ here now", "x")
      .toDF("txt")
      .select(
        textstats.dupNgramFraction(textstats.tokens(col("txt")), 2).as("d2"),
        textstats.topNgramFraction(textstats.tokens(col("txt")), 3).as("t3"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.5 && rows(0).getDouble(1) == 0.6667)
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getDouble(1) == 0.3333)
    assert(rows(2).getDouble(0) == 0.0 && rows(2).getDouble(1) == 0.0,
      "sub-n docs have empty shingle sets -> 0")
  }

  test("alphaWordRatio and distinctStopHits match hand computation") {
    val df = Seq(
      "the cat and the dog in 42 9000",  // 8 tokens, 2 numeric; stops: the, and, in
      "12 34 56",                        // no alpha, no stops
      "")                                // empty -> 0 tokens, guard denominators
      .toDF("txt")
      .select(
        textstats.alphaWordRatio(textstats.tokens(col("txt"))).as("a"),
        textstats.distinctStopHits(textstats.tokens(col("txt"))).as("s"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.75 && rows(0).getInt(1) == 3,
      "'the' counts once despite two occurrences")
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getInt(1) == 0)
    assert(rows(2).getDouble(0) == 0.0 && rows(2).getInt(1) == 0)
  }
}
