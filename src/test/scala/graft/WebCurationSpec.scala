package graft

import graft.queries.WebCurationQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the URL canonicalizer and eTLD+1 rollup beyond what
  * the synthetic residue classes exercise: mixed-case everything,
  * non-default ports, bare-host URLs, garbage input, and multi-label
  * public suffixes. The q232/q235 hash gates prove the pipeline over
  * the corpus; this spec pins the RULES on hand-picked edge cases. */
class WebCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u")
      .select(WebCurationQueries.canonicalUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0)).orNull).toSeq
  }

  private def regdom(hosts: String*): Seq[String] = {
    import spark.implicits._
    hosts.toDF("h")
      .select(WebCurationQueries.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalization rules on hand-picked edge cases") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/a/b/?x=1&utm_source=z#f",
      "https://Example.com:8443/p",     // non-default port preserved
      "https://example.com",            // bare host -> root path
      "http://example.com:80",          // default port + bare host
      "https://example.com/a//",        // multiple trailing slashes
      "https://example.com/a?utm_a=1&ref=rss", // all params tracking
      "https://example.com/a?b=2&a=1"   // params sorted
    ) == Seq(
      "http://example.com/a/b?x=1",
      "https://example.com:8443/p",
      "https://example.com/",
      "http://example.com/",
      "https://example.com/a",
      "https://example.com/a",
      "https://example.com/a?a=1&b=2"))
  }

  test("garbage input canonicalizes to NULL, not a wrong URL") {
    assert(canon("not a url", "") == Seq(null, null))
  }

  test("Curate CLI: writes canonical parquet + per-domain JSONL inventory") {
    val out = java.nio.file.Files.createTempDirectory("curate_e2e").toString
    graft.Curate.main(Array(s"${TestSpark.sfDir}/documents.parquet", out))
    val canon = spark.read.parquet(s"$out/canonical")
    assert(canon.columns.toSet == Set("doc_id", "canonical_url", "host",
      "n_chars", "registered_domain"))
    val nDocs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").count()
    assert(canon.count() == nDocs)
    val doms = spark.read.json(s"$out/domains.jsonl")
    assert(doms.agg(sum(col("n_docs"))).head().getLong(0) == nDocs)
    graft.Staging.deleteRecursively(out)
  }

  test("registered-domain rollup: eTLD+1 with multi-label suffixes") {
    assert(regdom("blog.site3.co.uk", "site3.co.uk", "a.b.example.com",
      "example.com", "localhost") ==
      Seq("site3.co.uk", "site3.co.uk", "example.com", "example.com",
        "localhost"))
  }
}
