package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScrubSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  test("piiCounts and redactPii on a hand-built fixture") {
    val df = Seq(
      (1L, "mail a.b@x.com and c_d%e@sub.domain.org thanks"),
      (2L, "call 555-123-4567 or 555-000-1111 from 10.0.3.7"),
      (3L, "no pii here at all"),
      (4L, "ip 192.168.0.1 and partial 12-34 and a@b")  // a@b has no TLD -> not an email
    ).toDF("id", "text")
    val counts = Scrub.piiCounts(col("text"))
    val got = df.select(col("id") +: counts.map { case (n, c) => c.as(n) } :+
        Scrub.redactPii(col("text")).as("red"): _*)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(got(1L) == ((2, 0, 0, "mail <EMAIL> and <EMAIL> thanks")))
    assert(got(2L) == ((0, 2, 1, "call <PHONE> or <PHONE> from <IP>")))
    assert(got(3L) == ((0, 0, 0, "no pii here at all")))
    assert(got(4L) == ((0, 0, 1, "ip <IP> and partial 12-34 and a@b")))
  }

  test("urlHosts extracts every host; blocklist filter drops linking docs") {
    val df = Seq(
      (1L, "see http://a.example.com/x and https://b.org/y"),
      (2L, "only https://c.net/z here"),
      (3L, "no links")
    ).toDF("id", "text")
    val hosts = Scrub.explodeHosts(df, "id", "text")
      .as[(Long, String)].collect().toSet
    assert(hosts == Set((1L, "a.example.com"), (1L, "b.org"), (2L, "c.net")))
    val block = Seq("b.org").toDF("host")
    val kept = Scrub.filterBlockedHosts(df, "id", "text", block)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L)) // doc 1 linked a blocked host
  }

  test("normalize collapses case, punctuation, and whitespace") {
    val df = Seq(
      ("Hello,   World!!", 1), ("hello world", 2), ("HELLO--WORLD", 3),
      ("held apart", 4)
    ).toDF("t", "i")
    val got = df.select(Scrub.normalize(col("t")).as("n"), col("i"))
      .as[(String, Int)].collect().map { case (n, i) => i -> n }.toMap
    assert(got(1) == "hello world" && got(2) == "hello world" && got(3) == "hello world")
    assert(got(4) == "held apart")
  }

  test("canonicalizeUrl: case, www, ports, fragments, tracking params, root path") {
    val cases = Seq(
      // lowercase + www-drop + default https port + fragment drop
      "HTTPS://WWW.Example.COM:443/Path/To?b=2&a=1#frag" ->
        "https://example.com/Path/To?a=1&b=2",
      // http default port; tracking params drop; empty query loses '?'
      "http://example.com:80/x?utm_source=a&utm_campaign=b" ->
        "http://example.com/x",
      // non-default port survives; ref= is tracking, z= is not
      "http://Example.com:8080/x?z=1&ref=tw" ->
        "http://example.com:8080/x?z=1",
      // bare root path drops; no query at all
      "https://www.site.org/" -> "https://site.org",
      // gclid/fbclid drop; param sort is lexicographic
      "http://a.net/p?gclid=123&c=3&fbclid=9&b=2" -> "http://a.net/p?b=2&c=3",
      // path casing is preserved (only scheme/host fold)
      "HTTP://HOST.COM/CaSe" -> "http://host.com/CaSe")
    val got = cases.map(_._1).toDF("url")
      .select(Scrub.canonicalizeUrl(col("url")).as("c")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("stripHtml: blocks drop whole, tags become spaces, entities decode once") {
    val df = Seq(
      (1L, "<html><head><script>if (a < b) { x(); }</script>" +
        "<style>.c{a:1}</style><!-- hidden --></head>" +
        "<body><h1>Title</h1><p>one  two</p></body></html>"),
      (2L, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      // &amp;lt; must decode to the LITERAL &lt; (amp decodes last,
      // never re-scanned) — the double-decode trap
      (3L, "tricky &amp;lt;notag&amp;gt; done"),
      (4L, "<SCRIPT>var s = \"</div>\";</SCRIPT>after"),
      (5L, "plain text stays")
    ).toDF("id", "html")
    val got = df.select(col("id"), Scrub.stripHtml(col("html")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "Title one two")
    assert(got(2L) == "a & b <tag> \"q\" 's' end")
    assert(got(3L) == "tricky &lt;notag&gt; done")
    // the script body — including the embedded "</div>" string — drops
    // whole because the block strip runs before the tag strip
    assert(got(4L) == "after")
    assert(got(5L) == "plain text stays")
  }

  test("removeBoilerplate drops frequent per-domain lines, keeps order and blanks") {
    val mk = (id: Long, dom: String, body: String) =>
      (id, dom, s"(c) $dom\n$body\n\nref $id")
    val df = (
      (1L to 6L).map(i => mk(i, "a.com", s"body a$i")) ++
        (10L to 12L).map(i => mk(i, "b.com", s"body b$i"))
      ).toDF("id", "dom", "text")
    val out = Scrub.removeBoilerplate(df, "id", "text", "dom", minDocs = 5L)
      .select("id", "text").as[(Long, String)].collect().toMap
    // a.com: copyright line in 6 docs >= 5 -> removed; blank line and
    // unique lines survive in original order
    assert(out(1L) == "body a1\n\nref 1")
    // b.com: same line only in 3 docs < 5 -> everything survives
    assert(out(10L) == "(c) b.com\nbody b10\n\nref 10")
    // the frequency rule is PER domain: a.com's removal never leaks
    assert(out.size == 9)
    // other columns survive the rebuild join
    val cols = Scrub.removeBoilerplate(df, "id", "text", "dom", 5L).columns.toSeq
    assert(cols == Seq("id", "dom", "text"))
  }

  test("dedupNormalized keeps the lowest id per canonical form") {
    val df = Seq(
      (1L, "The quick fox."), (2L, "the   QUICK fox"), (3L, "a different doc"),
      (4L, "THE QUICK FOX!!!")
    ).toDF("doc_id", "text")
    val kept = Scrub.dedupNormalized(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // original text column is preserved, the helper column is dropped
    val cols = Scrub.dedupNormalized(df, "doc_id", "text").columns.toSeq
    assert(cols == Seq("doc_id", "text"))
  }
}
