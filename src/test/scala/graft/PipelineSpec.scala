package graft

import graft.pipeline._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the LLM-pipeline operators over sf0.001.
  * (Value-level correctness is the DuckDB oracle's job — see
  * SparkEntry.oracleSql; these specs pin the invariants the oracle
  * can't express: cross-operator agreement, ranking laws, determinism.) */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  test("langIdMulti: trained classifier beats chance on EVERY held-out class") {
    // chance is 25% on 4 balanced classes; pin far above it (the
    // trigram profiles separate the planted languages near-perfectly —
    // diagonal dominance per TRUE class on the eval split only)
    val cm = TextOps.langIdConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    TextOps.LangNames.foreach { c =>
      val row = cm.filter(_._1._1 == c)
      val total = row.values.sum
      assert(total > 0, s"no eval docs for class $c")
      val diag = cm.getOrElse((c, c), 0L)
      assert(diag * 2 > total, s"class $c: $diag/$total not above 50%")
    }
    // and the per-doc entry is total: one prediction per document
    assert(TextOps.langIdMulti(docs).count() === docs.count())
  }

  test("alignment gate: every planted caption swap drops, every aligned pair keeps") {
    val rows = Multimodal.alignScores(emb, docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val keep = r.getBoolean(3)
      if (id % Multimodal.AlignSwapMod == 0) assert(!keep, s"swapped pair $id kept")
      else assert(keep, s"aligned pair $id dropped (cos_fp=${r.getLong(2)})")
    }
  }

  test("audio dedup: every planted volume-doubled duplicate matches at hamming 0") {
    val media = Multimodal.audioDupFromDocs(docs)
    val pairs = Multimodal.audioDup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val planted = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(_ % Multimodal.AudioDupMod == 0)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val h = pairs.get((id, id + Multimodal.AudioDupOffset))
      assert(h.contains(0L), s"planted louder copy of $id: $h")
    }
  }

  test("removeSpans: conservation law holds and every planted span is excised") {
    val rows = Dedup.removeSpans(docs).collect()
    assert(rows.length === docs.count())
    rows.foreach { r => // removed + kept == original, per doc
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.getLong(2)} + ${r.getLong(3)}")
    }
    Dedup.SpanPlants.foreach { case (m, len) =>
      rows.filter(_.getLong(0) % m == 0).foreach { r =>
        assert(r.getLong(2) >= len,
          s"doc ${r.getLong(0)}: removed ${r.getLong(2)} < planted $len")
      }
    }
  }

  test("removeSpans: OVERLAPPING maximal extents don't double-count n_removed") {
    import spark.implicits._
    // doc 1 = ov1..ov20; its window@1 (ov1..ov16) duplicates doc 2 and its
    // window@5 (ov5..ov20) duplicates doc 3, but windows@2..4 are unique →
    // two maximal extents [1,16] and [5,20] whose TOKEN ranges overlap on
    // 5..16. A sum-of-span-lengths n_removed would report 32 > n_tokens=20;
    // the conservation law (n_removed = n_tokens - n_kept) demands 20.
    val d = Seq(
      (1L, (1 to 20).map(i => s"ov$i").mkString(" ")),
      (2L, (1 to 16).map(i => s"ov$i").mkString(" ")),
      (3L, (5 to 20).map(i => s"ov$i").mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpansVar(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((1L, 1L, 16L), (1L, 5L, 20L), (2L, 1L, 16L), (3L, 1L, 16L)),
      s"expected overlapping extents in doc 1, got $spans")
    val rows = Dedup.removeSpans(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L) === ((20L, 20L, 0L)), s"doc 1: ${rows(1L)}")
    assert(rows(2L) === ((16L, 16L, 0L)))
    assert(rows(3L) === ((16L, 16L, 0L)))
    rows.values.foreach { case (n, rm, kp) => assert(n === rm + kp) }
  }

  test("theta exact side survives 64+ sources (mask word chunking past bit 59)") {
    import spark.implicits._
    // 70 sources → 2 mask words on the Spark side; the oracle has no
    // cardinality bound at all, so this pins the CHUNKED path against an
    // independent Scala reference (round-7 advice item 9)
    val n = 70
    val d = (0 until n).map(i => (i.toLong, f"s$i%02d",
      s"common alpha beta w$i x$i y$i")).toDF("doc_id", "source", "text")
    val out = Sketches.thetaSourceOps(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(5), r.getLong(6))).toMap
    assert(out.size === n * (n - 1) / 2)
    def sampled(id: Long) = ((id * 1103515245L + 12345L) % 2147483647L) % 100 < EvalSampling.Pct
    def shingleSet(i: Int): Set[String] = {
      val w = s"common alpha beta w$i x$i y$i".split(" ")
      if (!sampled(i.toLong)) Set.empty
      else (0 to w.length - 3).map(k => s"${w(k)} ${w(k + 1)} ${w(k + 2)}").toSet
    }
    val sets = (0 until n).map(shingleSet)
    for (a <- 0 until n; b <- a + 1 until n) {
      val (u, x) = out((f"s$a%02d", f"s$b%02d"))
      assert(u === (sets(a) | sets(b)).size.toLong, s"union $a,$b")
      assert(x === (sets(a) & sets(b)).size.toLong, s"inter $a,$b")
    }
    // and the high-word bits are actually exercised: some pair with BOTH
    // sources at index ≥ 60 (word 2) must intersect on the shared shingle
    val hi = (60 until n).filter(i => sampled(i.toLong))
    assert(hi.size >= 2, s"sample predicate left <2 sampled sources in word 2: $hi")
    val (ha, hb) = (hi(0), hi(1))
    assert(out((f"s$ha%02d", f"s$hb%02d"))._2 >= 1L, "word-2 intersection lost")
  }

  test("gopher repetition: template spam fails keep, dup-8 coverage is interval-exact") {
    import spark.implicits._
    val spam = Seq.fill(30)("buy now click here").mkString(" ") // 120 tokens, all template
    val clean = (1 to 40).map(i => s"uniq$i").mkString(" ")
    // one repeated 8-gram at positions 1 and 19 → coverage [1..8] ∪ [19..26] = 16 of 36
    val block = (1 to 8).map(i => s"a$i").mkString(" ")
    val mid = (1 to 10).map(i => s"m$i").mkString(" ")
    val tail = (1 to 10).map(i => s"z$i").mkString(" ")
    val onedup = s"$block $mid $block $tail"
    val r = TextOps.gopherRepetition(
        Seq((1L, spam), (2L, clean), (3L, onedup)).toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r(1L).getBoolean(6), "spam must fail keep")
    assert(r(1L).getLong(5) === 1000L, s"spam dup8 ${r(1L).getLong(5)}") // fully covered
    assert(r(2L).getBoolean(6), "clean must keep")
    assert(r(2L).getLong(5) === 0L)
    assert(r(3L).getLong(1) === 36L)
    assert(r(3L).getLong(5) === 16L * 1000 / 36, s"onedup dup8 ${r(3L).getLong(5)}")
  }

  test("exact dedup keeps every distinct text exactly once") {
    val out = Dedup.exact(docs).collect()
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    assert(out.map(_.getLong(1)).sum === docs.count())
  }

  test("minhash LSH finds exactly the exact-Jaccard near-dup pairs (recall 1 at 0.8)") {
    val exact = Dedup.ngramJaccard(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lsh = Dedup.minhashLsh(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exact.nonEmpty) // testdata plants near-dups
    assert(lsh.toSet === exact.toSet)
  }

  test("simhash near-dups substantially overlap Jaccard near-dups") {
    // SimHash measures bag-of-words similarity, ngram-Jaccard measures
    // order-sensitive shingle similarity — same planted dups, but each
    // legitimately finds a few pairs the other doesn't (word-shuffled
    // near-dups have equal bags yet disjoint shingles). Require strong
    // agreement, not containment.
    val jac = Dedup.ngramJaccard(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhash(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert((sim & jac).size * 2 > math.max(sim.size, jac.size))
    sim.foreach { case (i, j) => assert(i < j) }
  }

  test("brute-force top-k: K rows per query, descending, self excluded") {
    val rows = Similarity.bruteTopK(emb).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === Similarity.NumQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === Similarity.K)
      assert(rs.map(_.getLong(1)).toSeq === (1L to Similarity.K))
      val sims = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(_.getLong(2) == q))
    }
  }

  test("LSH top-k scores agree with brute-force for the pairs it returns") {
    val brute = Similarity.bruteTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val lsh = Similarity.lshTopK(emb).collect()
    assert(lsh.nonEmpty)
    // any (q, neighbor) the LSH ranks that brute-force also ranked must
    // carry the identical fixed-point cosine
    lsh.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach(c => assert(c === r.getLong(3)))
    }
  }

  test("embedding cosine pairs are symmetric-free (i<j) and above threshold") {
    val rows = Dedup.cosinePairs(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= Dedup.CosineThresholdFp)
    }
    // banded path: exact subset of brute truth (precision 1.0 by construction)
    val truth = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.cosinePairsBanded(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(banded.nonEmpty)
    banded.foreach(p => assert(truth.contains(p)))
  }

  test("PII scrub: redacts emails/IPs/phones, scrubbed twins collapse to one hash") {
    import spark.implicits._
    val pii = Seq(
      (1L, "write to bob@example.com or 10.0.0.1 now"),
      (2L, "write to eve@other.org or 192.168.1.254 now"),
      (3L, "call 555-123-4567 twice 555-123-4567"),
      (4L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = TextOps.piiScrub(pii).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1)._1 === 1L && out(1)._2 === 1L && out(1)._5)
    assert(out(3)._3 === 2L && out(3)._5)
    assert(out(4)._1 === 0L && out(4)._2 === 0L && out(4)._3 === 0L && !out(4)._5)
    // docs 1 and 2 differ only in their PII → identical scrubbed hash
    assert(out(1)._4 === out(2)._4)
    assert(out(1)._4 !== out(4)._4)
  }

  test("hard negatives: labels differ from the query's, ranked by cosine desc") {
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.hardNegatives(emb).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      rs.foreach(r => assert(r.getInt(3) !== labels(q)))
      val byRank = rs.sortBy(_.getLong(1)).map(_.getLong(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("multimodal opaque fallback (no magic detected) yields byte-exact features") {
    val feat = Multimodal.extractFeatures(Multimodal.mediaFromDocs(docs))
    val first = feat.limit(1).collect()(0)
    val text = docs.filter(col("doc_id") === first.getLong(0))
      .select("text").collect()(0).getString(0)
    val bytes = text.getBytes("UTF-8")
    val expect = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(first.getAs[Long]("checksum") === expect)
    assert(first.getAs[Long]("byte_len") === bytes.length.toLong)
  }

  test("clusters: pair endpoints share a cluster, labels are component minima") {
    val pairs = Dedup.ngramJaccard(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    val lbl = Dedup.clusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.size === docs.count())
    pairs.foreach { case (i, j) =>
      assert(lbl(i) === lbl(j))
      assert(lbl(i) <= i && lbl(j) <= j)
    }
    // singletons label themselves
    val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    lbl.filterNot(kv => inPair(kv._1)).foreach { case (d, c) => assert(d === c) }
  }

  test("IVF top-k: K rows per query, clusters partition the corpus, high recall vs brute") {
    import spark.implicits._
    val ivf = graft.pipeline.Similarity.ivfTopK(emb).collect()
    assert(ivf.nonEmpty)
    // per query: ranks are 1..n ascending, scores non-increasing
    ivf.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("cos_fp")).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // probing 2/8 clusters should still recover a good chunk of the true
    // top-k (nearest vectors concentrate in the query's own cluster)
    val brute = graft.pipeline.Similarity.bruteTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = ivf.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall > 0.3, s"IVF recall vs brute = $recall")
  }

  test("HLL distinct estimate lands within the 256-register error envelope") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val rows = graft.pipeline.Sketches.hllDistinctUsers(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      // 1.04/sqrt(256) = 6.5% standard error; allow 4 sigma
      assert(math.abs(est - exact) / exact < 0.26,
        s"${r.getAs[String]("event_type")}: est=$est exact=$exact")
    }
  }

  test("token stats: subtokens >= tokens (splitting only refines)") {
    val bad = TextOps.tokenStats(docs)
      .filter(col("n_subtokens") < col("n_tokens")).count()
    assert(bad === 0)
  }

  test("fingerprint is stable across runs") {
    val a = TextOps.fingerprint(docs).collect().toSeq
    val b = TextOps.fingerprint(docs).collect().toSeq
    assert(a === b)
  }

  test("active users: wau7 >= dau, and day-0 wau equals dau of the first day") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val rows = EventOps.activeUsers(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("wau7") >= r.getAs[Long]("dau")))
    // the first window-day has exactly one contributing day → wau7 == dau
    val first = rows.minBy(_.getAs[Long]("day"))
    assert(first.getAs[Long]("wau7") === first.getAs[Long]("dau"))
  }

  test("attribution credits every purchase exactly once") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val total = EventOps.attribution(ev).agg(sum("n_purchases")).head.getLong(0)
    assert(total === ev.filter(col("event_type") === "purchase").count())
  }

  test("transitions: bigram counts sum to events minus one per active user") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val total = EventOps.transitions(ev).agg(sum("n")).head.getLong(0)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total === expected)
  }

  test("decontamination flags exactly the docs sharing a 13-gram with the benchmark split") {
    val out = TextOps.decontaminate(docs).collect()
    // no benchmark doc may appear in the output, and n_shared >= 1
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") % TextOps.BenchMod !== 0L)
      assert(r.getAs[Long]("n_shared") >= 1L)
    }
  }

  test("lm surprisal: ranks bounded by vocab, repeated common text scores low") {
    val out = TextOps.lmSurprisal(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(_._1).distinct.length === out.length) // one row per doc
    val vocab = docs.select(explode(split(col("text"), " "))).distinct().count()
    // mean rank ∈ [1, vocab] → fixed-point bounds
    assert(out.forall { case (_, n, s) => n > 0 && s >= 1000 && s <= vocab * 1000 })
    // a doc of only the most common token would score exactly 1000; the
    // corpus mean must exceed the minimum (sanity that ranks spread)
    assert(out.map(_._3).max > 1000)
  }

  test("bpe pairs: 2-char pairs, freq non-increasing, counts tie to the vocab") {
    val out = TextOps.bpePairs(docs).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.length <= TextOps.BpeTopK && out.nonEmpty)
    assert(out.forall(_._1.length == 2))
    val freqs = out.map(_._2)
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    // top pair's frequency == its occurrence count over all token instances
    val (topPair, topFreq) = out.head
    val occ = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(t)-1), i -> substring(t, i, 2))")).as("p"))
      .filter(col("p") === topPair).count()
    assert(occ === topFreq)
  }

  test("source cap: two-phase salted top-N equals the single-window truth") {
    val out = TextOps.sourceCap(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.forall(_._2 <= TextOps.SourceCap))
    // every source in the corpus reports, capped at its doc count
    val perSource = docs.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.map(_._1).toSet === perSource.keySet)
    assert(out.forall { case (s, n, _, _) => n == math.min(perSource(s), TextOps.SourceCap.toLong) })
  }

  test("bitext mining: targets from label 1, margins non-negative and non-increasing") {
    val out = Similarity.bitextMine(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.length <= Similarity.BitextTopK)
    val srcLabels = emb.filter(col("label") === 0).select("vec_id").collect().map(_.getLong(0)).toSet
    val tgtLabels = emb.filter(col("label") === 1).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.forall { case (s, t, _, _) => srcLabels(s) && tgtLabels(t) })
    val margins = out.map(_._4)
    assert(margins.forall(_ >= 0) && margins.zip(margins.tail).forall { case (a, b) => a >= b })
  }

  test("markov rows normalize: per-prev probabilities sum to 1e6 minus rounding") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val rows = EventOps.markov(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - g.length, s"prob sum $s")
    }
    // counts agree with the raw transition matrix
    val t = EventOps.transitions(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows.forall { case (p, n, c, _) => t((p, n)) == c })
  }

  test("corpus report agrees with the individual dedup/quality operators") {
    val r = Dedup.corpusReport(docs).collect().head
    val (nDocs, nTokens, exactExtra, shortDocs, neardup, meanQ) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nDocs === docs.count())
    assert(exactExtra === nDocs - Dedup.exact(docs).count())
    val pairIds = Dedup.ngramJaccard(docs).collect()
      .flatMap(row => Seq(row.getLong(0), row.getLong(1))).toSet
    assert(neardup === pairIds.size.toLong)
    assert(nTokens > nDocs && shortDocs <= nDocs && meanQ > 0)
  }

  test("hot ngrams: df descending, within corpus doc count") {
    val n = docs.count()
    val rows = TextOps.hotNgrams(docs).collect()
    assert(rows.length <= TextOps.HotTopN)
    val dfs = rows.map(_.getAs[Long]("df")).toSeq
    assert(dfs === dfs.sorted.reverse)
    dfs.foreach(d => assert(d >= 1 && d <= n))
  }

  test("CMS estimate never undercounts (one-sided error)") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    Sketches.cmsHeavyUsers(ev).collect().foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n"))
    }
  }

  test("bloom probe: zero false negatives, members all hit") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val rows = Sketches.bloomProbe(cust, ord).collect()
    // every (is_member=true) row must have bloom_hit=true
    rows.filter(_.getAs[Boolean]("is_member")).foreach { r =>
      assert(r.getAs[Boolean]("bloom_hit"), "bloom false negative")
    }
  }

  test("PQ top-k: K ranked rows per query, ADC ascending, useful recall vs brute") {
    val pq = Similarity.pqTopK(emb).collect()
    val byQ = pq.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === Similarity.NumQueries)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      val adcs = sorted.map(_.getAs[Long]("adc_fp")).toSeq
      assert(adcs === adcs.sorted, "ADC distances must ascend with rank")
    }
    val brute = Similarity.bruteTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = pq.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // synthetic embeddings are near-random: 4×16-code ADC recall is
    // modest by construction (real embeddings cluster; random ones
    // don't). The spec pins "far better than chance" (chance ≈ K/N =
    // 0.1 at sf0.001), not SOTA recall.
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall > 0.2, s"PQ recall vs brute = $recall")
  }

  test("matryoshka renormalized checksum is stable and norms positive") {
    val rows = Similarity.matryoshka(emb).collect()
    assert(rows.length === emb.count())
    rows.foreach(r => assert(r.getAs[Long]("norm_fp") > 0))
  }

  test("binary quantization: n_bits = popcount of halves, codes match dim signs") {
    val rows = Similarity.binaryQuantize(emb).collect()
    assert(rows.length === emb.count())
    val byId = rows.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("code_lo"), r.getAs[Long]("code_hi"), r.getAs[Long]("n_bits"))).toMap
    byId.values.foreach { case (lo, hi, nb) =>
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32))
      assert(nb === java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi))
    }
    // spot-check one vector's bits against the raw embedding
    val v = emb.orderBy("vec_id").select("vec_id", "embedding").head()
    val arr = v.getAs[scala.collection.Seq[Float]](1)
    val (lo, hi, _) = byId(v.getLong(0))
    (0 until 32).foreach { d =>
      assert(((lo >> d) & 1L) === (if (arr(d) > 0) 1L else 0L))
      assert(((hi >> d) & 1L) === (if (arr(d + 32) > 0) 1L else 0L))
    }
  }

  test("hamming ANN: K ranked rows per query, cosine descending, useful recall vs brute") {
    val ham = Similarity.hammingTopK(emb).collect()
    val byQ = ham.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === Similarity.NumQueries)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.length === Similarity.K)
      val cs = sorted.map(_.getAs[Long]("cos_fp")).toSeq
      assert(cs === cs.sorted.reverse, "cosine must descend with rank")
      sorted.foreach(r => assert(r.getAs[Long]("hamming") >= 0 && r.getAs[Long]("hamming") <= 64))
    }
    val brute = Similarity.bruteTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = ham.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // 1-bit-per-dim codes on near-random vectors: far better than chance
    // (chance ≈ K/N = 0.1 at sf0.001), not exact
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall > 0.3, s"hamming recall vs brute = $recall")
  }

  test("hist quantile sketch: estimate bin contains the exact order statistic") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val out = Sketches.histQuantiles(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty && out.length % Sketches.HistQs.length === 0)
    // the first bin whose cumulative count reaches the rank CONTAINS the
    // k-th order statistic: lower edge <= exact < lower edge + bin width
    assert(out.forall { case (_, _, _, est, exact) =>
      est <= exact && exact < est + Sketches.HistBinMv })
    // quantiles are monotone in q within each group
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byQ = rows.sortBy(_._2).map(_._5)
      assert(byQ.zip(byQ.tail).forall { case (a, b) => a <= b })
    }
  }

  test("KMV Jaccard estimate tracks the exact value") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val rows = Sketches.kmvJaccard(ev).collect()
    assert(rows.length === 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val est = r.getAs[Long]("est_fp")
      val exact = r.getAs[Long]("exact_fp")
      assert(est >= 0 && est <= 1000000)
      // k=64 bottom-k: standard error ~ 1/sqrt(64) = 12.5pp; allow 3σ
      assert(math.abs(est - exact) <= 375000, s"est=$est exact=$exact")
    }
  }

  test("streaks are genuine maximal consecutive-day runs") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val rows = EventOps.streaks(ev).collect()
    assert(rows.nonEmpty && rows.length <= EventOps.StreakTopN)
    val lens = rows.map(_.getAs[Long]("streak_len")).toSeq
    assert(lens === lens.sorted.reverse, "ordered longest-first")
    // verify each reported streak against the user's raw activity days
    val days = ev.select(col("user_id"), expr("ts_ns div 86400000000000").as("d"))
      .distinct().collect().groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(1)).toSet }
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val start = r.getAs[Long]("start_day_ms") / 86400000L
      val len = r.getAs[Long]("streak_len")
      val ds = days(u)
      (0L until len).foreach(k => assert(ds.contains(start + k), "streak days active"))
      assert(!ds.contains(start - 1), "maximal at left")
      assert(!ds.contains(start + len), "maximal at right")
    }
  }

  test("bursts: every flagged hour exceeds 2x the per-type hourly mean") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val flagged = EventOps.bursts(ev).collect()
    val hourly = ev.groupBy(col("event_type"), expr("ts_ns div 3600000000000").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
    flagged.foreach { r =>
      val rows = hourly(r.getString(0))
      val nh = rows.length.toLong
      val tot = rows.map(_.getLong(2)).sum
      assert(r.getAs[Long]("n") * nh > 2 * tot)
    }
  }

  test("gopher filter battery: verdict consistent with its own signals") {
    val rows = TextOps.gopherFilters(docs).collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val expect = r.getAs[Long]("n_tokens") >= TextOps.GopherMinTokens &&
        r.getAs[Long]("n_tokens") <= TextOps.GopherMaxTokens &&
        r.getAs[Long]("mean_wl_fp") >= TextOps.GopherMinMeanWl &&
        r.getAs[Long]("mean_wl_fp") <= TextOps.GopherMaxMeanWl &&
        r.getAs[Long]("stop_hits") >= TextOps.GopherMinStops
      assert(r.getAs[Boolean]("keep") === expect)
    }
    // the battery must discriminate on this corpus
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("passage dedup: bounds hold and exact duplicates share every window") {
    val rows = Dedup.passage(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, fp) = (r.getAs[Long]("n_windows"), r.getAs[Long]("n_shared"),
        r.getAs[Long]("shared_fp"))
      assert(s >= 0 && s <= w)
      assert(fp === s * 1000 / w)
    }
    // docs under 16 tokens produce no row
    val shortIds = docs.filter(size(split(col("text"), " ")) < 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.intersect(shortIds).isEmpty)
    // exact text duplicates (planted by the generator) are 100% shared
    val dupIds = docs.groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id")).collect().map(_.getLong(0)).toSet
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    dupIds.foreach { id =>
      byId.get(id).foreach(r =>
        assert(r.getAs[Long]("n_shared") === r.getAs[Long]("n_windows"),
          s"doc $id is an exact dup but not fully shared"))
    }
  }

  test("anomaly days: every flagged day really deviates by >2 sigma (float check)") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val daily = ev.select(col("event_type"), expr("ts_ms div 86400000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
    val flagged = EventOps.anomalyDays(ev).collect()
    flagged.foreach { r =>
      val t = r.getString(0)
      val xs = daily(t).map(_.getAs[Long]("n").toDouble)
      val mu = xs.sum / xs.length
      val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
      val x = r.getAs[Long]("n_events").toDouble
      assert(math.abs(x - mu) > 2 * sigma - 1e-9,
        s"$t day ${r.getAs[Long]("day_ms")}: |$x - $mu| <= 2*$sigma")
    }
  }

  test("distributed min-label propagation is byte-identical to driver union-find") {
    import spark.implicits._
    // Synthetic graph exercising every shape the loop must get right:
    // a 20-node chain (diameter 19 — forces many propagation rounds), a
    // triangle with a redundant duplicate edge, a 2-node component with
    // reversed id order in the edge list, and edge-free singleton nodes
    // appended via the anti-join path.
    val chain = (100L until 119L).map(i => (i, i + 1))
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 3L))
    val pair = Seq((51L, 50L)) // j < i on purpose
    val pairs = spark.createDataset(chain ++ triangle ++ pair).toDF("i", "j")
    val nodes = spark.createDataset(
      (1L to 3L) ++ (50L to 51L) ++ (100L to 119L) ++ Seq(900L, 901L)).toDF("doc_id")
    def run(): Map[Long, Long] = Dedup.propagateClusters(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = run()
    assert(Dedup.lastPropagationRounds === 0, "fast path expected at default cap")
    val saved = Dedup.driverEdgeLimit
    val viaLoop = try { Dedup.driverEdgeLimit = 0; run() }
      finally Dedup.driverEdgeLimit = saved
    assert(viaLoop === viaDriver)
    // min-label fixpoint: every component labeled by its minimum id
    assert(viaLoop(119L) === 100L && viaLoop(3L) === 1L && viaLoop(51L) === 50L)
    assert(viaLoop(900L) === 900L && viaLoop(901L) === 901L)
    // convergence in ≤ diameter+1 rounds (chain diameter 19, +1 for the
    // no-change detection round), nowhere near the 64-round backstop
    assert(Dedup.lastPropagationRounds > 0, "distributed branch must have run")
    assert(Dedup.lastPropagationRounds <= 20,
      s"took ${Dedup.lastPropagationRounds} rounds for diameter 19")
  }

  test("member-count broadcast is size-gated: fallback join is hint-free and byte-identical") {
    import spark.implicits._
    // giant component (40 members) + pairs + singletons
    val labeled = ((1L to 40L).map(i => (i, 1L)) ++
      Seq((50L, 50L), (51L, 50L), (60L, 60L), (61L, 61L)))
      .toDF("doc_id", "cluster_id")
    val viaB = Dedup.withMemberCounts(labeled, "doc_id", broadcastCounts = true)
    val viaS = Dedup.withMemberCounts(labeled, "doc_id", broadcastCounts = false)
    assert(viaB.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "gated path must carry the broadcast hint")
    assert(!viaS.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "fallback path must NOT force a broadcast (AQE must stay free to shuffle-join)")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(viaS.collect().map(key).sortBy(identity).toSeq ===
      viaB.collect().map(key).sortBy(identity).toSeq)
    // end-to-end: the distributed-propagation branch (which disables the
    // broadcast) produces the same clusters relation as the fast path
    val viaFast = Dedup.clusters(docs).collect().map(key).toSeq
    val saved = Dedup.driverEdgeLimit
    val viaLoop = try { Dedup.driverEdgeLimit = 0; Dedup.clusters(docs).collect().map(key).toSeq }
      finally Dedup.driverEdgeLimit = saved
    assert(viaLoop === viaFast)
  }

  test("semdedup: every pruned vector has a kept lower-id partner in its cluster") {
    // sf0.001 may not carry a >=0.95-cosine pair; plant one: vec 9000 is
    // an exact copy of vec 5 (cosine 1.0, same cluster by construction)
    val planted = emb.filter(col("vec_id") === 5)
      .withColumn("vec_id", lit(9000L))
    val input = emb.unionByName(planted)
    val out = Similarity.semDedup(input).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === input.count())
    val byCluster = out.groupBy(_._2)
    // cluster-minimum vec_id is always kept (nothing below it to prune it)
    byCluster.foreach { case (_, vs) =>
      val minId = vs.map(_._1).min
      assert(vs.find(_._1 == minId).get._3, s"cluster min $minId must be kept")
    }
    // pruning is intra-cluster only and witnessed by a genuine cosine
    val pruned = out.filter(!_._3)
    assert(pruned.contains((9000L, out.find(_._1 == 5L).get._2, false)),
      "the planted exact copy must be pruned into vec 5's cluster")
    val vecs = input.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosFp(a: Array[Double], b: Array[Double]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6).toLong
    }
    pruned.foreach { case (id, cid, _) =>
      val witnesses = out.filter(v => v._2 == cid && v._1 < id)
        .filter(v => cosFp(vecs(v._1), vecs(id)) >= Similarity.SemDedupTauFp)
      assert(witnesses.nonEmpty, s"pruned $id has no high-cosine lower-id witness")
    }
  }

  test("dup spans: bounds hold, exact-duplicate docs are one full span") {
    // plant an exact duplicate (doc 10000 = doc 1's text) so the
    // full-span property is exercised even at dup-free sf0.001
    val planted = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(10000L))
    val input = docs.unionByName(planted)
    val out = Dedup.dupSpans(input).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out.length === input.count())
    out.foreach { case (id, nw, nd, span) =>
      assert(nd <= nw, s"doc $id: dup windows exceed windows")
      if (nd == 0) assert(span === 0L)
      else assert(span >= Dedup.SpanLen && span <= nw + Dedup.SpanLen - 1,
        s"doc $id: span $span outside [${Dedup.SpanLen}, ${nw + Dedup.SpanLen - 1}]")
    }
    // a doc whose full text occurs twice in the corpus duplicates EVERY
    // window, so its longest span covers the whole doc
    import spark.implicits._
    val twin = input.groupBy("text").count().filter(col("count") >= 2)
      .join(input, "text").select("doc_id").as[Long].collect()
    assert(twin.length >= 2)
    val byId = out.map(t => t._1 -> t).toMap
    twin.foreach { id =>
      val (_, nw, nd, span) = byId(id)
      if (nw > 0) {
        assert(nd === nw, s"exact-dup doc $id: every window must be duplicated")
        assert(span === nw + Dedup.SpanLen - 1)
      }
    }
  }

  test("dsir weights: target-language docs score higher on average") {
    import spark.implicits._
    val scored = TextOps.dsirWeights(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("lang") === "en", col("score_fp"), col("n_bigrams"))
      .as[(Boolean, Long, Long)].collect()
    val (en, rest) = scored.partition(_._1)
    assert(en.nonEmpty && rest.nonEmpty)
    // per-bigram normalized mean score: the en rate-vs-raw weights must
    // separate the target domain from the remainder
    def meanPerBigram(xs: Array[(Boolean, Long, Long)]): Double =
      xs.map(x => x._2.toDouble / math.max(x._3, 1L)).sum / xs.length
    assert(meanPerBigram(en) > meanPerBigram(rest),
      s"en ${meanPerBigram(en)} !> rest ${meanPerBigram(rest)}")
  }

  test("winnowing: density bounds hold and exact-duplicate docs share fingerprints modulo position") {
    val planted = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(10001L))
    val input = docs.unionByName(planted)
    val out = TextOps.winnowing(input).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === input.count())
    out.foreach { case (id, nk, np, _) =>
      val windows = math.max(nk - (TextOps.WinnowW - 1), 0L)
      assert(np <= windows, s"doc $id: more prints than windows")
      if (windows > 0) {
        assert(np >= 1, s"doc $id: winnowing must select at least one print")
        // winnowing density: one print per window, each can repeat across
        // at most WinnowW windows → at least ceil(windows / (2w)) with slack
        assert(np.toDouble >= windows.toDouble / (4 * TextOps.WinnowW),
          s"doc $id: print density $np/$windows below winnowing guarantee")
      }
    }
    // identical texts → identical k-gram hash sequences → identical
    // (count, positions) of selected prints → equal n_prints
    import spark.implicits._
    val twins = input.groupBy("text").count().filter(col("count") >= 2)
      .join(input, "text").select(col("text"), col("doc_id")).as[(String, Long)]
      .collect().groupBy(_._1).values.filter(_.length >= 2)
    assert(twins.nonEmpty)
    val byId = out.map(t => t._1 -> t).toMap
    twins.foreach { g =>
      val stats = g.map(x => byId(x._2)).map(t => (t._2, t._3, t._4))
      assert(stats.distinct.length === 1,
        s"duplicate docs ${g.map(_._2).mkString(",")} differ in fingerprints: $stats")
    }
  }

  test("knn graph: ranking laws hold and identical vectors are guaranteed mutual neighbors") {
    // identical vectors share EVERY band bucket, so the planted copy is a
    // guaranteed candidate — the one recall property banding promises
    val planted = emb.filter(col("vec_id") === 5)
      .withColumn("vec_id", lit(9001L))
    val input = emb.unionByName(planted)
    val out = Dedup.knnGraph(input).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byV = out.groupBy(_._1)
    byV.foreach { case (v, rs) =>
      assert(rs.length <= Dedup.KnnGraphK)
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length), s"ranks not contiguous for $v")
      val ordered = rs.sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"cosines not descending for $v")
      assert(!rs.exists(_._3 == v), s"self edge at $v")
    }
    val copied = byV(9001L).sortBy(_._2)
    assert(copied.head._4 === 1000000L, "planted copy's best neighbor must be exact")
    assert(byV(9001L).exists(_._3 == 5L) || copied.head._4 == 1000000L)
    assert(byV(5L).head._4 === 1000000L || byV(5L).exists(_._3 == 9001L))
  }

  test("LTV triangle: cumulative revenue is nondecreasing and per-user LTV consistent") {
    val out = EventOps.ltvCohort(graft.sources.EventsAdapter.events(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (cw, rows) =>
      val byOff = rows.sortBy(_._2)
      assert(byOff.forall(_._2 >= 0), s"cohort $cw: negative offset")
      val cums = byOff.map(_._6)
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
        s"cohort $cw: cumulative revenue must be nondecreasing")
      // cum at each offset = running sum of rev
      assert(byOff.map(_._3).scanLeft(0L)(_ + _).tail.toSeq === cums.toSeq)
      byOff.foreach { r =>
        assert(r._4 <= r._5, "buyers cannot exceed cohort size")
        assert(r._7 === r._6 * 1000 / r._5)
      }
    }
  }

  test("A/B lift report is internally consistent") {
    val r = EventOps.abLift(graft.sources.EventsAdapter.events(spark, dir)).collect()
    assert(r.length === 1)
    val row = r.head
    val (na, nb) = (row.getLong(0), row.getLong(1))
    val (arpuA, arpuB) = (row.getLong(2), row.getLong(3))
    val lift = row.getLong(4)
    assert(na > 0 && nb > 0)
    assert(arpuA > 0 && arpuB > 0)
    assert(lift === math.floor((arpuB - arpuA).toDouble * 1000 / arpuA).toLong)
    // variants partition the purchasing users
    val purchasers = graft.sources.EventsAdapter.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(na + nb === purchasers)
  }

  test("gram matrix: symmetric PSD structure; power iteration finds a real eigenpair") {
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val tri = Similarity.gramMatrix(emb).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getLong(2))).toMap
    val d = Similarity.Dim
    assert(tri.size === d * (d + 1) / 2)
    // diagonal entries are sums of squares — nonnegative
    (0 until d).foreach(i => assert(tri((i, i)) >= 0L, s"diag $i"))
    // reconstruct dense (un-quantize) and check the power-iteration
    // eigenpair satisfies G v ≈ λ v (relative residual bound reflects the
    // fixed 500 iterations: a narrow λ₂/λ₁ gap converges geometrically,
    // not exactly — 1e-6 is what 500 rounds guarantee on this spectrum)
    val s = Similarity.GramScaleFp.toDouble
    val g = Array.tabulate(d, d)((i, j) =>
      tri(if (i <= j) (i, j) else (j, i)) / (s * s))
    val (lambda, v) = Similarity.gramTopEigen(g)
    assert(lambda > 0.0)
    val res = (0 until d).map { i =>
      val gv = (0 until d).map(j => g(i)(j) * v(j)).sum
      math.abs(gv - lambda * v(i))
    }.max
    assert(res / lambda < 1e-6, s"residual $res vs lambda $lambda")
  }

  test("ranking metrics: bounds hold and brute dominates or ties every ANN method") {
    val rows = Similarity.rankingMetrics(emb).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("brute", "graph", "hamming", "ivf", "ivfpq", "lsh", "pq"))
    rows.values.foreach { case (mrr, hit, prec) =>
      assert(mrr >= 0L && mrr <= 1000000L)
      assert(hit >= 0L && hit <= 1000L)
      assert(prec >= 0L && prec <= 1000000L)
      assert(prec <= hit * 1000L, "a query with relevant hits must count as a hit")
    }
    // an ANN method retrieves a subset-quality list of brute's: its mean
    // precision can't exceed brute's on label relevance... not in general
    // (a lossy index CAN luck into more same-label neighbors), but its
    // hit-rate over the same fixed denominator can't beat brute by much.
    // Pin only the sanity direction that is a theorem: brute hit-rate is
    // the maximum achievable with these candidates per query count.
    val bruteHit = rows("brute")._2
    assert(bruteHit > 0L, "planted labels must make some brute neighbor relevant")
  }

  test("minhash estimate eval: identical sets estimate exactly; error is sketch-bounded") {
    val out = Dedup.minhashEstEval(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (i, j, est, jac, err) =>
      assert(i < j)
      assert(est >= 0L && est <= 1000000L)
      assert(err === math.abs(est - jac))
      // identical shingle sets → identical signatures, estimate is exact
      if (jac == 1000000L) assert(est === 1000000L, s"($i,$j)")
    }
    // 32 permutations → std ≈ sqrt(J(1-J)/32) ≤ 0.09; mean |err| across
    // candidate pairs must stay well inside a few stds
    val meanErr = out.map(_._5).sum / out.length
    assert(meanErr < 250000L, s"mean err $meanErr")
  }

  test("assoc lift: bounds and the lift identity hold") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val ut = ev.select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nUsers = ut.map(_._1).distinct.length
    val perType = ut.groupBy(_._2).view.mapValues(_.length).toMap
    val out = EventOps.assocLift(ev).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b, both, lift) = (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(a < b, "unordered pairs, canonical order")
      assert(both <= math.min(perType(a), perType(b)))
      assert(lift === both * nUsers * 1000000L / (perType(a).toLong * perType(b)))
    }
  }

  test("dsir resample: sample is target-shifted but genuinely noised (not plain top-k)") {
    val weights = TextOps.dsirWeights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // (doc_id, n_bigrams, score_fp)
    val sample = TextOps.dsirResample(docs).collect().map(_.getLong(0)).toSet
    assert(sample.size === TextOps.DsirSampleN)
    val norm = weights.map { case (id, nb, s) => id -> (if (nb == 0) 0L else s / nb) }.toMap
    // importance resampling must shift the sample toward the target domain
    val sampleMean = sample.toSeq.map(norm).sum.toDouble / sample.size
    val corpusMean = norm.values.sum.toDouble / norm.size
    assert(sampleMean > corpusMean, s"sample mean $sampleMean not above corpus $corpusMean")
    // ...but the hash jitter must make it a DRAW, not argmax: the plain
    // top-N by score and the resample must disagree on some members
    val plainTop = norm.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(TextOps.DsirSampleN).map(_._1).toSet
    assert((sample -- plainTop).nonEmpty, "resample degenerated to plain top-k")
  }

  test("pagerank: teleport floor, mass bound, and isolated-node minimum hold") {
    val pr = Dedup.knnPagerank(emb).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = emb.count()
    val base = Dedup.PrScale / n
    val floorScore = (100L - Dedup.PrDamp) * base / 100L
    assert(pr.size === n)
    pr.values.foreach(s => assert(s >= floorScore, s"below teleport floor: $s"))
    // integer floors only ever LOSE mass: total never exceeds the scale
    assert(pr.values.sum <= Dedup.PrScale)
    // a node nobody points at sits exactly on the teleport floor
    val pointedAt = Dedup.knnGraph(emb).select("neighbor_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val isolated = pr.keySet -- pointedAt
    isolated.foreach(v => assert(pr(v) === floorScore, s"isolated $v above floor"))
    // and somebody with in-links must sit above it (the graph is non-trivial)
    assert(pr.values.exists(_ > floorScore))
  }

  test("top paths: truncation bound, ranking order, and alphabet hold") {
    val ev = graft.sources.EventsAdapter.events(spark, dir)
    val out = EventOps.topPaths(ev).collect()
    assert(out.length === EventOps.PathTopN)
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    out.foreach { r =>
      val segs = r.getString(0).split(">")
      assert(segs.length <= EventOps.PathMaxLen)
      segs.foreach(t => assert(types.contains(t), s"unknown type $t"))
    }
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    // the histogram counts sessions: its full sum can't exceed session count
    val nSessions = graft.operators.Sessionize.sessions(
      ev.select(col("user_id"), col("ts_ms")), Seq("user_id"), "ts_ms", 1800000L).count()
    assert(ns.sum <= nSessions)
  }

  test("centroid classify: confusion matrix partitions the corpus and beats chance") {
    val conf = Similarity.centroidClassify(emb).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(conf.values.sum === emb.count())
    val correct = conf.collect { case ((t, p), n) if t.toLong == p => n }.sum
    val labels = emb.select("label").distinct().count()
    // nearest-own-centroid must beat the 1/labels chance rate by a wide margin
    assert(correct * labels > conf.values.sum,
      s"accuracy ${correct}/${conf.values.sum} not above chance (1/$labels)")
  }

  test("cdc chunks: edit locality — a one-token insertion re-chunks only its neighborhood") {
    import spark.implicits._
    // the CDC property fixed-stride windows lack: chunk identities after
    // an early edit are UNCHANGED once the next content boundary passes
    val base = docs.orderBy("doc_id").select("text").as[String].head()
    val edited = {
      val w = base.split(" ")
      (w.take(3) ++ Array("INSERTED") ++ w.drop(3)).mkString(" ")
    }
    def chunkHashes(text: String): Seq[Long] = {
      // per-chunk identities via the same boundary rule, computed locally
      val toks = text.split(" ")
      val bnd = (1 until toks.length).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${toks(i - 1)} ${toks(i)}".getBytes("UTF-8"))
          .take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) >>> 4
        // 60-bit hex-prefix hash: first 15 hex chars = top 60 bits of md5
        if (h % TextOps.CdcMod == 0) 1 else 0
      }
      val cuts = 0 +: (1 until toks.length).filter(i => bnd(i - 1) == 1) :+ toks.length
      cuts.sliding(2).map(c => toks.slice(c(0), c(1)).mkString(" ").hashCode.toLong).toSeq
    }
    val (a, b) = (chunkHashes(base), chunkHashes(edited))
    // suffix chunks (after the edit's chunk) are identical
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(common >= a.length - 3,
      s"edit should disturb at most its neighborhood: ${a.length} vs common suffix $common")
    // and the Spark operator agrees with itself: deterministic across runs
    val two = Seq((0L, base), (1L, edited)).toDF("doc_id", "text")
    val r1 = TextOps.cdcChunks(two).collect().map(_.toSeq)
    val r2 = TextOps.cdcChunks(two).collect().map(_.toSeq)
    assert(r1.toSeq === r2.toSeq)
  }

  test("quality classifier: verdict consistent with its own score and threshold") {
    val out = TextOps.qualityClassifier(docs).collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      val score = r.getLong(6)
      val keep = r.getBoolean(7)
      assert(keep === (score >= TextOps.QualityKeepThreshold))
    }
    // both classes populated at test SF (threshold sits near the median)
    assert(out.count(_.getBoolean(7)) > 0)
    assert(out.count(!_.getBoolean(7)) > 0)
  }

  test("prototype prune: drops exactly the most-prototypical quarter of each cluster") {
    val out = Similarity.prototypePrune(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.length === emb.count())
    // clusters agree with the shared k-means (same lineage as clusterQuality)
    val quality = Similarity.clusterQuality(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._2).foreach { case (cid, vs) =>
      assert(quality(cid) === vs.length.toLong, s"cluster $cid size mismatch")
      val dropN = vs.length * Similarity.PrunePermille / 1000
      val (dropped, kept) = vs.partition(!_._5)
      assert(dropped.length.toLong === dropN, s"cluster $cid drop count")
      // every dropped member is at least as prototypical as every kept one
      if (dropped.nonEmpty && kept.nonEmpty)
        assert(dropped.map(_._3).min >= kept.map(_._3).max,
          s"cluster $cid: a kept member outranks a dropped one")
      // ranks are a permutation of 1..n within the cluster
      assert(vs.map(_._4).sorted.toSeq === (1L to vs.length.toLong))
    }
  }

  test("survival km: planted case matches hand-computed product-limit") {
    import spark.implicits._
    val h = 3600000000000L
    // u1 events at hours 0 and 10 (complete gap 10); u2 at hour 0 only.
    // horizon = 10 → open gaps: u1 censored at 0, u2 censored at 10.
    val ev = Seq(
      (1L, 1L, "a", 0L * h), (1L, 2L, "a", 10L * h), (2L, 3L, "a", 0L * h))
      .toDF("user_id", "event_id", "event_type", "ts_ns")
    val out = EventOps.survivalKm(ev).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // gap 0: at_risk 3, 0 deaths, 1 censored, S=1.0
    // gap 10: at_risk 2, 1 death, 1 censored, S=0.5
    assert(out.toSeq === Seq((0L, 3L, 0L, 1L, 1000000L), (10L, 2L, 1L, 1L, 500000L)))
  }

  test("line dedup: canonical copy kept, later copies removed, clean rejoin exact") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // one full segment
    val tail1 = (1 to 10).map(i => s"x$i").mkString(" ")
    val tail2 = (1 to 10).map(i => s"y$i").mkString(" ")
    val in = Seq(
      (1L, s"$boiler $tail1"), // canonical holder of the boiler segment
      (2L, s"$boiler $tail2"), // later copy → boiler removed
      (3L, "unique words only here")) // untouched, rejoin must be exact
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(in).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 0L, s"$boiler $tail1")))
    assert(out(2L) === ((2L, 1L, tail2)))
    assert(out(3L) === ((1L, 0L, "unique words only here")))
    // law on real data: n_dropped = 0 ⇒ the rewrite is the identity
    val real = Dedup.lineDedup(docs)
    val broken = real.filter(col("n_dropped") === 0)
      .join(docs, "doc_id")
      .filter(col("clean_text") =!= col("text"))
    assert(broken.count() === 0)
    // and some corpus duplication actually exists (testdata plants near-dups)
    assert(real.agg(sum("n_dropped")).head.getLong(0) > 0)
  }

  test("knn triangles: identical vectors form a complete graph with cc = 1; laws on real data") {
    import spark.implicits._
    // 4 identical vectors → K4: deg 3, 3 triangles per vertex, cc = 1.0
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 0.5).toFloat)
    val in = (0L to 3L).map(id => (id, v)).toDF("vec_id", "embedding")
    val k4 = Dedup.knnTriangles(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(k4.toSeq === (0L to 3L).map(id => (id, 3L, 3L, 1000000L)))
    // laws on real embeddings: cc ∈ [0, 1e6] and n_tri ≤ C(deg, 2)
    val real = Dedup.knnTriangles(emb).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val (deg, tri, cc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cc >= 0L && cc <= 1000000L)
      assert(tri <= deg * (deg - 1) / 2)
    }
  }

  test("rp project: one-hot vectors have exact unit distortion; corpus mean concentrates") {
    import spark.implicits._
    // e_k projects to the k-th sign column: ‖y‖² = RpK exactly → dist_fp = 10000
    val oneHots = (0 until 3).map { k =>
      (k.toLong, Array.tabulate(64)(i => if (i == k * 7) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val oh = Similarity.rpProject(oneHots).collect()
    assert(oh.map(_.getLong(5)).toSeq === Seq(10000L, 10000L, 10000L))
    // zero vector: no division, dist_fp = -1
    val z = Seq((9L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.rpProject(z).head.getLong(5) === -1L)
    // JL concentration on real embeddings: E[dist] = 10000, k=16 keeps the
    // mean of 500 draws well inside ±10%
    val dist = Similarity.rpProject(emb).collect().map(_.getLong(5))
    val mean = dist.sum.toDouble / dist.length
    assert(mean > 9000 && mean < 11000, s"mean distortion $mean")
  }

  test("bpe train (batched): planted merges, dominance batching, batch-order laws") {
    import spark.implicits._
    // dominance: round 0 pool ranks (a,a):4 above (a,b):3, and (a,b)
    // shares 'a' with the higher-ranked pair → each round accepts ONE
    // pair here, replaying the single-merge trajectory exactly
    val m1 = TextOps.bpeTrain(Seq((1L, "aaab aaab ab")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getString(5)))
    assert(m1.toSeq === Seq(
      (0L, 1L, "a", "a", 4L, "aa"),
      (1L, 1L, "a", "b", 3L, "ab"),
      (2L, 1L, "aa", "ab", 2L, "aaab"))) // then nothing left to merge
    // equal-symbol run: greedy takes every other candidate → [aa][aa], then [aaaa]
    val m2 = TextOps.bpeTrain(Seq((1L, "aaaa")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getString(5)))
    assert(m2.toSeq === Seq((0L, 1L, "a", "a", 3L, "aa"), (1L, 1L, "aa", "aa", 1L, "aaaa")))
    // a batch round applies SYMBOL-DISJOINT pairs: "ab ab cd cd ef" takes
    // (a,b), (c,d), (e,f) in ONE round (all counts distinct-symboled)
    val m3 = TextOps.bpeTrain(Seq((1L, "ab ab cd cd ef")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(5)))
    assert(m3.count(_._1 == 0L) === 3, m3.toSeq)
    assert(m3.filter(_._1 == 0L).map(_._3).toSet === Set("ab", "cd", "ef"))
    // laws on real data: within a round counts are non-increasing in
    // mrank; round maxima never increase; accepted pairs symbol-disjoint
    val rowsAll = TextOps.bpeTrain(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rowsAll.nonEmpty && rowsAll.length > TextOps.BpeRounds,
      s"batching must beat one-merge-per-round: ${rowsAll.length}")
    rowsAll.groupBy(_._1).foreach { case (round, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._5).zip(byRank.tail.map(_._5)).forall { case (a, b) => b <= a })
      val syms = rs.flatMap(r => Seq(r._3, r._4))
      assert(syms.distinct.length === syms.length, s"round $round batch not symbol-disjoint")
    }
    val roundMax = rowsAll.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._5).max)
    assert(roundMax.zip(roundMax.tail).forall { case (a, b) => b <= a }, roundMax)
  }

  test("bpe compression: totals shrink by the batch's applications, exhausted corpus holds") {
    import spark.implicits._
    // "aaaa": 4 chars → [aa,aa] (2) → [aaaa] (1); merges exhaust, totals HOLD at 1
    val t = TextOps.bpeCompression(Seq((1L, "aaaa")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(t.toSeq === (Seq((0L, 4L), (1L, 2L)) ++
      (2L to TextOps.BpeRounds.toLong).map(r => (r, 1L))))
    // law on real data: a round with merges strictly shrinks the total by
    // at most the round's summed pair counts; a merge-free round holds
    val totals = TextOps.bpeCompression(docs).collect().map(_.getLong(1))
    val perRound = TextOps.bpeTrain(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(4)).sum).toMap
    totals.zip(totals.tail).zipWithIndex.foreach { case ((before, after), r) =>
      perRound.get(r.toLong) match {
        case Some(cnt) => assert(after < before && before - after <= cnt, (r, before, after, cnt))
        case None => assert(after === before, (r, before, after))
      }
    }
  }

  test("bpe encode: corpus totals equal compression's final row; trained counts feed pack/shard") {
    import spark.implicits._
    // the round-6 verdict's pinned law: encode(merges(corpus)) token
    // counts must tie EXACTLY to the compression trajectory's last row —
    // sum over docs of n_syms(word occurrences) IS the occurrence-
    // weighted symbol total after the final merge round
    val enc = TextOps.bpeEncode(docs).collect()
    val encTotal = enc.map(_.getLong(1)).sum
    val lastTraj = TextOps.bpeCompression(docs).collect().last.getLong(1)
    assert(encTotal === lastTraj, s"encode total $encTotal != trajectory $lastTraj")
    // total over the corpus: one row per doc, checksums non-trivial
    assert(enc.length === docs.count())
    assert(enc.count(_.getLong(2) != 0L) === enc.length)
    // a merge that fires must COMPRESS the planted word: "aaab aaab ab"
    // trains ('a','a') first, so "aaab" encodes to fewer symbols than chars
    val tiny = Seq((1L, "aaab aaab ab"), (2L, "")).toDF("doc_id", "text")
    val tEnc = TextOps.bpeEncode(tiny).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tEnc.length === 2)
    val (_, n1, c1) = tEnc(0)
    assert(n1 < "aaabaaabab".length && n1 > 0, tEnc.toSeq)
    assert(c1 != 0L)
    assert(tEnc(1) === ((2L, 0L, 0L))) // zero-token doc keeps a (0,0) row
    // the rewire: pack/shard fed by TRAINED counts conserve the encode total
    val packed = TextOps.packBinsBpe(docs).collect()
    assert(packed.map(_.getLong(2)).sum === encTotal)
    assert(packed.map(_.getLong(1)).sum === docs.count())
    val shards = TextOps.shardPlanBpe(docs).collect()
    assert(shards.map(_.getLong(2)).sum === encTotal)
  }

  test("train manifest: composition conserves the curated train split and its trained tokens") {
    val splits = TextOps.curationSplits(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nTrain = splits.count(_._2 == "train")
    assert(nTrain > 0)
    val m = TextOps.trainManifest(docs).collect()
    // every curated train doc lands in exactly one shard
    assert(m.map(_.getLong(1)).sum === nTrain)
    // shard token units are the TRAINED tokenizer's counts over the
    // same split — the composition must conserve them exactly
    val encTotal = TextOps.bpeEncode(TextOps.curationTrainDocs(docs))
      .collect().map(_.getLong(1)).sum
    assert(m.map(_.getLong(2)).sum === encTotal)
    assert(m.length <= TextOps.ShardCount)
  }

  test("unigram LM: encode totals == final-round usage; prune shrinks multi-char by exactly UniPruneDrop") {
    val traj = TextOps.unigramTrain(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the encode-totals law (the doc_bpe_encode discipline): the last
    // E-step and the encode share one cost map, so corpus trained-token
    // count == sum of final-round piece usage
    val finalUsage = traj.filter(_._1 == TextOps.UniRounds.toLong).map(_._4).sum
    val encTotal = TextOps.unigramEncode(docs).collect().map(_.getLong(1)).sum
    assert(encTotal === finalUsage, s"encode $encTotal != final usage $finalUsage")
    // pruning: multi-char population drops by exactly UniPruneDrop per
    // pruning round; the char alphabet is invariant (the fallback floor)
    val byRound = traj.groupBy(_._1)
    (1 until TextOps.UniRounds).foreach { r =>
      val multi = byRound(r.toLong).count(_._2.length >= 2)
      val multiNext = byRound(r.toLong + 1).count(_._2.length >= 2)
      assert(multiNext === multi - TextOps.UniPruneDrop, s"round $r: $multi -> $multiNext")
      val chars = byRound(r.toLong).filter(_._2.length == 1).map(_._2).toSet
      val charsNext = byRound(r.toLong + 1).filter(_._2.length == 1).map(_._2).toSet
      assert(charsNext === chars, "char alphabet must never be pruned")
    }
    // multi-char pieces actually WIN segments (the EM is doing something):
    // some multi-char piece has non-zero final usage
    assert(traj.exists(t => t._1 == TextOps.UniRounds.toLong && t._2.length >= 2 && t._4 > 0))
    // segmentation laws on the real corpus words: concat == word, and the
    // Viterbi cost-optimal pick never loses to the all-chars fallback
    val finalCost = traj.filter(_._1 == TextOps.UniRounds.toLong)
      .map(t => t._2 -> t._3).toMap
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val seg = TextOps.uniSegment(w, finalCost)
      assert(seg.mkString === w, s"'$w' -> $seg")
      val segCost = seg.map(finalCost).sum
      val charCost = w.map(c => finalCost(c.toString)).sum
      assert(segCost <= charCost, s"'$w': $segCost > chars $charCost")
    }
  }

  test("lsh sweep: aligned-band containment laws across the three shapes") {
    val rows = Dedup.lshSweep(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq === Seq(4L, 8L, 16L))
    rows.foreach { case (b, rpb, cand, found, truth, prec, rec) =>
      assert(b * rpb === Dedup.NumPerms.toLong)
      // verified duplicates are exact-Jaccard hits => bounded by both
      // the candidate set and the truth set
      assert(found <= cand && found <= truth)
      assert(prec <= 1000 && rec <= 1000)
    }
    // aligned groupings: an 8-row band match implies its 4-row halves and
    // 2-row quarters match, so candidates (and found, and recall) are
    // monotone as bands go 4 -> 8 -> 16
    rows.sliding(2).foreach {
      case Array((_, _, c1, f1, _, _, r1), (_, _, c2, f2, _, _, r2)) =>
        assert(c1 <= c2, "candidate containment")
        assert(f1 <= f2 && r1 <= r2, "found/recall monotone")
      case _ => ()
    }
    // the sweep is informative on this corpus: the loosest shape finds
    // at least one real duplicate
    assert(rows.last._4 > 0)
  }

  test("curriculum order: bijective global rank replayed independently") {
    val rows = TextOps.curriculumOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // bijection: positions are exactly 1..N
    assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    // differential replay: rank by (surprisal ASC, seeded hash, doc_id)
    // recomputed in plain Scala must match the distributed two-phase rank
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cur_$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val expected = rows.sortBy { case (id, s, _) => (s, h(id), id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    rows.foreach { case (id, _, pos) =>
      assert(pos === expected(id), s"doc $id position")
    }
    // the easy->hard law: walking positions in order, surprisal never drops
    val bySeq = rows.sortBy(_._3).map(_._2).toSeq
    bySeq.zip(bySeq.tail).foreach { case (a, b) => assert(a <= b) }
  }

  test("wordpiece segmenter: property laws on random words and vocabularies") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def forAll[A](gen: Gen[A], n: Int = 400)(check: A => Unit): Unit =
      (0 until n).foreach { i =>
        gen.apply(Gen.Parameters.default, Seed(777L + i)).foreach(check)
      }
    val gen = for {
      w <- Gen.chooseNum(1, 14).flatMap(l =>
        Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString))
      extra <- if (w.length < 2) Gen.const(Nil)
      else Gen.listOf(for {
        s <- Gen.chooseNum(0, w.length - 2)
        l <- Gen.chooseNum(2, math.min(4, w.length - s))
      } yield w.substring(s, s + l))
    } yield (w, extra)
    forAll(gen) { case (w, extra) =>
      val vocab = w.map(_.toString).toSet ++ extra
      val maxLen = vocab.iterator.map(_.length).max
      val seg = TextOps.wpSegment(w, vocab, maxLen)
      // concat law (words under the step cap always reassemble exactly)
      assert(seg.mkString === w, s"'$w' -> $seg")
      // greedy-longest law at every boundary
      var pos = 0
      seg.foreach { p =>
        val rest = w.substring(pos)
        ((p.length + 1) to math.min(maxLen, rest.length)).foreach { l =>
          assert(!vocab.contains(rest.substring(0, l)),
            s"'$w' at $pos: picked '$p' over longer '${rest.substring(0, l)}'")
        }
        pos += p.length
      }
      // cap law: never more than WpMaxSteps pieces
      assert(seg.length <= TextOps.WpMaxSteps)
    }
  }

  test("rrf fusion: differential replay against the two source rankings") {
    def ranks(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val dense = ranks(Similarity.bruteTopK(emb))
    val sketch = ranks(Similarity.hammingTopK(emb))
    // independent re-fusion in plain Scala
    val expected = (dense.keySet ++ sketch.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        val scored = keys.toSeq.map { k =>
          val s = dense.get(k).map(r => 1000000L / (Similarity.RrfK + r)).getOrElse(0L) +
            sketch.get(k).map(r => 1000000L / (Similarity.RrfK + r)).getOrElse(0L)
          (k._2, s, (dense.contains(k) : Boolean, sketch.contains(k)))
        }.sortBy { case (nid, s, _) => (-s, nid) }.take(Similarity.K)
        scored.zipWithIndex.map { case ((nid, s, (d, h)), i) =>
          (q, i + 1L) -> (nid, s, (if (d) 1L else 0L) + (if (h) 1L else 0L))
        }
    }
    val got = Similarity.rrfFusion(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size === expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) === v, s"fused row $k")
    }
    // fusion is non-trivial on this corpus: some fused top-K row is
    // surfaced by BOTH methods (n_methods = 2)
    assert(got.values.exists(_._3 == 2L))
  }

  test("image classifier: trained gate beats chance on EVERY held-out class") {
    val cm = Multimodal.imageConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Multimodal.ImgClassNames.foreach { c =>
      val row = cm.filter(_._1._1 == c)
      val total = row.values.sum
      assert(total > 0, s"no eval images for class $c")
      val diag = cm.getOrElse((c, c), 0L)
      assert(diag * 2 > total, s"class $c: $diag/$total not above 50%")
    }
    // the per-image entry is total: one prediction per document's image
    assert(Multimodal.imageClassify(docs).count() === docs.count())
  }

  test("video dup: every planted head-trim is found at full containment") {
    val planted = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(_ % Multimodal.VideoDupMod == 0).toSet
    assert(planted.nonEmpty)
    val dups = Multimodal.videoDup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // every planted (base, trimmed) pair is reported as a full-containment dup
    planted.foreach { id =>
      val hit = dups.find(d => d._1 == id && d._2 == id + Multimodal.VideoDupOffset)
      assert(hit.isDefined, s"planted trim of clip $id not found")
      assert(hit.get._5, s"planted trim of clip $id not flagged is_dup")
      assert(hit.get._4 === 1000L)
    }
    // containment is well-formed on every pair: 0 < shared ≤ min size ⇒ pm ≤ 1000
    dups.foreach { case (a, b, shared, pm, isDup) =>
      assert(a < b && shared > 0 && pm > 0 && pm <= 1000)
      assert(isDup === (pm == 1000L))
    }
    // trimFirstFrame is a REAL remux: the trimmed clip decodes to exactly
    // the base clip's frames 1..nf-1, bit-identical pixels
    val row = docs.filter(col("doc_id") % Multimodal.VideoDupMod === 0)
      .select("text", "n_chars").head()
    val (text, nc) = (row.getString(0), row.getLong(1))
    val base = Multimodal.encodeVideo(text, 4 + (nc % 5).toInt, 3 + (nc % 4).toInt,
      8 + (nc % 5).toInt)
    val bf = Multimodal.decodeVideoFrames(base).get
    val tf = Multimodal.decodeVideoFrames(Multimodal.trimFirstFrame(base)).get
    assert(tf.length === bf.length - 1)
    tf.zip(bf.tail).foreach { case ((w1, h1, p1), (w2, h2, p2)) =>
      assert(w1 === w2 && h1 === h2 && p1.toSeq === p2.toSeq)
    }
  }

  test("wordpiece: likelihood merges + greedy max-munch laws") {
    val traj = TextOps.wordpieceTrain(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    // WpBatch symbol-disjoint merges per round, WpRounds total
    assert(traj.length === TextOps.WpRounds)
    assert(traj.map(t => (t._1, t._2)).toSeq ===
      (0 until TextOps.WpRounds).map(i =>
        ((i / TextOps.WpBatch).toLong, (i % TextOps.WpBatch + 1).toLong)))
    traj.foreach { case (_, _, pa, pb, c, score, ns) =>
      assert(ns === pa + pb)
      assert(c > 0 && score >= 0)
    }
    // within a round the accepted pairs are symbol-disjoint
    traj.groupBy(_._1).values.foreach { b =>
      val syms = b.flatMap(t => Seq(t._3, t._4))
      assert(syms.distinct.length === syms.length, s"round shares a symbol: $b")
    }
    // the batching law that keeps WpBatch=2 honest: the batched
    // vocabulary equals the strictly-SEQUENTIAL (one merge, full
    // rescoring) trajectory's vocabulary on this corpus — rederived
    // here on the driver over the word-frequency map (vocabulary-sized)
    val wfreq = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val seqVocab = {
      var segs = wfreq.map { case (w, c) => (w.map(_.toString).toList, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (_ <- 0 until TextOps.WpRounds) {
        val cu = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
        segs.foreach { case (ss, c) =>
          ss.foreach(x => cu(x) += c)
          ss.zip(ss.tail).foreach(p => pc(p) += c)
        }
        val (pa, pb) = pc.keys.toSeq
          .map(p => ((pc(p) * TextOps.WpScale) / (cu(p._1) * cu(p._2)), p))
          .minBy { case (sc, (a, b)) => (-sc, a, b) }._2
        out += pa + pb
        segs = segs.map { case (ss, c) =>
          val ns = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == pa && ss(i + 1) == pb) {
              ns += pa + pb; i += 2
            } else { ns += ss(i); i += 1 }
          }
          (ns.toList, c)
        }
      }
      out.toSet
    }
    assert(traj.map(_._7).toSet === seqVocab,
      "batched-dominance vocabulary diverged from the sequential trajectory")
    // the vocabulary the encoder sees: corpus alphabet ∪ merged symbols
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().collect().map(_.getString(0))
    val alphabet = words.flatMap(_.map(_.toString)).toSet
    val vocab = alphabet ++ traj.map(_._7)
    val maxLen = vocab.iterator.map(_.length).max
    assert(words.nonEmpty)
    words.foreach { w =>
      val seg = TextOps.wpSegment(w, vocab, maxLen)
      // concat law
      assert(seg.mkString === w, s"'$w' -> $seg")
      // greedy-longest law: each piece is the LONGEST vocab match at its
      // position (no longer vocab piece is a prefix of the remainder)
      var pos = 0
      seg.foreach { p =>
        assert(vocab.contains(p) || p.length == 1, s"'$w': piece '$p' not in vocab")
        val rest = w.substring(pos)
        ((p.length + 1) to math.min(maxLen, rest.length)).foreach { l =>
          assert(!vocab.contains(rest.substring(0, l)),
            s"'$w' at $pos: picked '$p' but '${rest.substring(0, l)}' is in vocab")
        }
        pos += p.length
      }
    }
    // merges actually fire in the encode: some corpus word segments to a
    // multi-char piece (the likelihood argmax found a real collocation)
    assert(words.exists(w => TextOps.wpSegment(w, vocab, maxLen).exists(_.length >= 2)))
    // encode totality + internal consistency: one row per doc; totals =
    // the word-level segmentation replayed over corpus occurrences
    val enc = TextOps.wordpieceEncode(docs).collect()
    assert(enc.length === docs.count())
    val occ = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect().map(_.getString(0))
    val expectTotal = occ.map(w => TextOps.wpSegment(w, vocab, maxLen).length.toLong).sum
    assert(enc.map(_.getLong(1)).sum === expectTotal)
  }

  test("wordpiece: batch=1 trains the strict-sequential published trajectory") {
    // round-10 advice: the batched default is a documented approximation;
    // batch=1 is the config'd fallback — one merge per round, full
    // rescoring between merges, the textbook WordPiece recipe
    val t1 = TextOps.wordpieceTrain(docs, batch = 1).collect()
    assert(t1.length === TextOps.WpRounds)
    assert(t1.map(_.getLong(1)).forall(_ == 1L), "one merge per round")
    assert(t1.map(_.getLong(0)).toSeq ===
      (0 until TextOps.WpRounds).map(_.toLong), "rounds advance one by one")
    // on this corpus the K=2 batched vocabulary coincides with the
    // sequential one (the pinned coincidence the default relies on), so
    // the two trainers must agree here — and batch=1 agrees by
    // construction with the driver-rederived sequential law above
    val batched = TextOps.wordpieceTrain(docs).collect().map(_.getString(6)).toSet
    assert(t1.map(_.getString(6)).toSet === batched)
  }

  test("pack split: exact-boundary sequence laws (conservation, span math, straddle)") {
    val rows = TextOps.packSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val cap = TextOps.PackTarget
    // replay the global cumsum independently and check every span
    var before = 0L
    rows.sortBy(_._1).foreach { case (id, n, first, last, straddle) =>
      assert(first === before / cap, s"doc $id first_seq")
      val expLast = if (n > 0) (before + n - 1) / cap else before / cap
      assert(last === expLast, s"doc $id last_seq")
      assert(straddle === (first != last), s"doc $id straddle flag")
      before += n
    }
    // conservation: the last sequence index covers exactly ceil(total/cap)
    val total = rows.map(_._2).sum
    assert(rows.map(_._4).max === (total - 1) / cap)
    // packing is non-trivial on this corpus: some doc straddles a boundary
    assert(rows.exists(_._5), "no doc straddles a sequence boundary")
  }

  test("tokenizer compare: three-family fertility report agrees with each encoder") {
    val rep = TextOps.tokenizerCompare(docs).collect()
    val srcs = docs.select("source").distinct().count()
    assert(rep.length === srcs)
    val bpeBySrc = docs.select(col("doc_id"), col("source"))
      .join(TextOps.bpeEncode(docs), Seq("doc_id")).groupBy("source")
      .agg(sum("n_tokens_bpe")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rep.foreach { r =>
      val (src, nw, nb, nu, np) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nb === bpeBySrc(src), s"$src: report n_bpe drifts from bpeEncode")
      // every family emits >= 1 piece per word => fertility floor 1000
      Seq(r.getLong(6), r.getLong(7), r.getLong(8)).foreach { f =>
        assert(f >= 1000L, s"$src: fertility $f below the 1-piece-per-word floor")
      }
      assert(nu > 0 && np > 0 && nw > 0)
    }
  }

  test("ngram novelty: first snapshot is all-new; new-gram counts partition the gram space") {
    val rows = TextOps.ngramNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
    // snapshot 0 has no past: everything it contains is new
    val s0 = rows.find(_._1 == 0L).get
    assert(s0._4 === s0._3 && s0._5 === 1000L)
    rows.foreach { case (_, nGrams, nDistinct, nNew, pm) =>
      assert(nNew <= nDistinct && nDistinct <= nGrams)
      assert(pm >= 0 && pm <= 1000)
    }
    // Σ n_new over snapshots == corpus-wide distinct grams (each gram is
    // new in exactly its first-seen snapshot)
    val totalDistinct = docs
      .select(explode(TextOps.shingles(TextOps.tokens(col("text")))).as("s"))
      .select(TextOps.baseHash(col("s"))).distinct().count()
    assert(rows.map(_._4).sum === totalDistinct)
  }

  test("train manifest v2: conservation — v2 = v1-train ∩ semKeep ∩ alignKeep ∖ contaminated") {
    val trainIds = TextOps.curationSplits(docs).collect()
      .filter(_.getString(1) == "train").map(_.getLong(0)).toSet
    val semKeep = Similarity.semDedup(emb).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val alignKeep = Multimodal.alignScores(emb, docs).collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val contam = Dedup.semanticDecontaminate(emb).collect()
      .map(_.getLong(0)).toSet
    val expected = trainIds & semKeep & alignKeep &~ contam
    assert(expected.nonEmpty, "gates must leave a non-trivial v2 split")
    assert(expected != trainIds, "at least one gate must bite at sf0.001")
    val m = TextOps.trainManifestV2(docs, emb).collect()
    // every v2 doc lands in exactly one shard; id checksum conserves the set
    assert(m.map(_.getLong(1)).sum === expected.size.toLong)
    assert(m.map(_.getLong(3)).sum === expected.sum)
    // token units are the V1 curated tokenizer's counts over the v2 set
    val encTotal = TextOps.bpeEncode(TextOps.curationTrainDocs(docs))
      .filter(col("doc_id").isin(expected.toSeq: _*))
      .collect().map(_.getLong(1)).sum
    assert(m.map(_.getLong(2)).sum === encTotal)
  }

  test("dup spans var: planted duplicates of three lengths recover exact extents") {
    val toks = docs.filter(col("doc_id") === 97L).select(col("text")).collect()(0)
      .getString(0).split(" ").count(_.nonEmpty).toLong
    val spans = Dedup.dupSpansVar(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 97 (only the %97 plant): exactly one planted 18-token span
    // appended right after its own text — extent recovered EXACTLY
    val d97 = spans.filter(_._1 == 97L)
    assert(d97.exists { case (_, s, e, n) =>
      n == 18L && s == toks + 1 && e == toks + 18 }, d97.toSeq.toString)
    // doc 0 hits all three moduli → all three lengths present, disjoint
    val d0 = spans.filter(_._1 == 0L).map(_._4)
    assert(Set(18L, 32L, 64L).subsetOf(d0.toSet), d0.toSeq.toString)
    // every planted length appears across its modulus class
    for ((m, len) <- Dedup.SpanPlants) {
      val hit = spans.filter(s => s._1 % m == 0 && s._4 == len.toLong)
      assert(hit.nonEmpty, s"no $len-token span for modulus $m")
    }
    // extents are internally consistent
    spans.foreach { case (_, s, e, n) => assert(e - s + 1 == n) }
  }

  test("graph ANN: beam walk over the kNN graph — recall dominates its LSH seeds") {
    // structural law (provable, so pinned): the walk's visited set
    // contains the whole LSH seed bucket, and exact-cosine ranking of a
    // SUPERSET can only keep or grow the overlap with the brute truth —
    // so graph recall ≥ lsh recall on any input
    val rec = Similarity.annRecall(emb).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rec("graph") >= rec("lsh"), rec)
    // result hygiene: ranks contiguous from 1 per query, no self-matches
    val g = Similarity.graphTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.nonEmpty)
    g.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq, q)
      rows.foreach { case (qid, _, nb) => assert(nb !== qid) }
    }
  }

  test("phash dup: near-identical payloads pair within Hamming 3, inverted payloads don't") {
    import spark.implicits._
    // 640 bytes = 64 cells of 10; alternating loud/quiet cells → phash 0x5555…
    val base = Array.tabulate(640)(i => if ((i / 10) % 2 == 0) 200.toByte else 10.toByte)
    val nearCopy = base.clone(); (0 until 10).foreach(i => nearCopy(i) = 10.toByte) // 1 cell flips
    val inverted = Array.tabulate(640)(i => if ((i / 10) % 2 == 0) 10.toByte else 200.toByte)
    val df = Seq((1L, "image", base, 8, 8), (2L, "image", nearCopy, 8, 8),
      (3L, "image", inverted, 8, 8)).toDF("media_id", "kind", "payload", "width", "height")
    val ph = Multimodal.phashes(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) === 0x5555555555555555L)
    assert(ph(3L) === (ph(1L) ^ -1L)) // exact inverse
    assert(java.lang.Long.bitCount(ph(1L) ^ ph(2L)) === 1)
    // only the (base, nearCopy) pair survives; the inverse shares no band
    val pairs = Multimodal.phashDup(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1L)))
  }

  test("calibration: perfect clusters land in bin 9 with zero gap; confident errors open it") {
    import spark.implicits._
    val e0 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e1 = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f)
    // two pure clusters: every vector IS its centroid → conf 1.0, all correct
    val pure = Seq((0L, e0, 1), (1L, e0, 1), (2L, e1, 2), (3L, e1, 2))
      .toDF("vec_id", "embedding", "label")
    val pb = Similarity.centroidCalibration(pure).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(pb.toSeq === Seq((9L, 4L, 4L, 10000L, 10000L, 0L)))
    // same vector under two labels: both centroids coincide, tie-break picks
    // label 1 → one confident hit, one confident miss → gap 5000 in bin 9
    val conf = Seq((0L, e0, 1), (1L, e0, 2)).toDF("vec_id", "embedding", "label")
    val cb = Similarity.centroidCalibration(conf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(cb.toSeq === Seq((9L, 2L, 1L, 10000L, 5000L, 5000L)))
  }

  test("snapshot diff: planted add/remove/change/unchange with exact token deltas") {
    import spark.implicits._
    val old = Seq((1L, "a b", "s"), (2L, "c", "s"), (3L, "x", "s"))
      .toDF("doc_id", "text", "source")
    val nw = Seq((2L, "c", "s"), (3L, "x y z", "s"), (4L, "q", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.snapshotDiff(old, nw).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("s", "added", 1L, 1L), ("s", "changed", 1L, 2L),
      ("s", "removed", 1L, -2L), ("s", "unchanged", 1L, 0L)))
    // conservation law on the real entry derivation: sum over statuses of
    // token_delta = new total - old total
    val docs01 = docs
    val diff = TextOps.snapshotDiff(TextOps.snapshotOld(docs01), docs01)
    val lhs = diff.agg(sum("token_delta")).head.getLong(0)
    val tok = (d: org.apache.spark.sql.DataFrame) =>
      d.select(size(split(col("text"), " ")).cast("long").as("t"))
        .agg(sum("t")).head.getLong(0)
    assert(lhs === tok(docs01) - tok(TextOps.snapshotOld(docs01)))
  }

  test("window funnel: level capped by the 3-day window, best entry point wins") {
    import spark.implicits._
    val d = 86400000L
    def ev(u: Long, t: String, ms: Long) = (u, t, ms * 1000000L)
    val events = Seq(
      // u1: full chain inside 3 days → level 4
      ev(1, "signup", 0), ev(1, "view", 1), ev(1, "click", 2), ev(1, "purchase", d),
      // u2: first signup's view lands at 4d (outside) → level 1 from t1=0,
      // but a second signup at 3.5d reaches click inside the window → 3
      ev(2, "signup", 0), ev(2, "signup", 7 * d / 2), ev(2, "view", 4 * d),
      ev(2, "click", 4 * d + 1),
      // u3: view inside, click at 5d outside → level 2
      ev(3, "signup", 0), ev(3, "view", 1), ev(3, "click", 5 * d), ev(3, "purchase", 6 * d),
      // u4: never signs up → absent from the histogram
      ev(4, "view", 0), ev(4, "purchase", 1))
      .toDF("user_id", "event_type", "ts_ns")
    val out = EventOps.windowFunnel(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("bigram lm: hand-computed smoothed scores, rare bigrams score highest") {
    import spark.implicits._
    // V = 5 tokens (solo counts toward V but has no bigrams → absent row)
    val in = Seq((1L, "a b a b"), (2L, "a b"), (3L, "q z"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLm(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // c2(a,b)=3 c2(b,a)=1 c2(q,z)=1; c1(a)=3 c1(b)=1 c1(q)=1
    // invp(a,b) = (3+5)e6//4 = 2e6; invp(b,a) = invp(q,z) = (1+5)e6//2 = 3e6
    assert(out.toSeq === Seq(
      (1L, 3L, 2333333L), (2L, 1L, 2000000L), (3L, 1L, 3000000L)))
    // law on real data: c2 ≤ c1 forces every score above the 1e6 unit —
    // mean inverse probability can never dip below certainty
    val real = TextOps.bigramLm(docs).collect().map(_.getLong(2))
    assert(real.nonEmpty && real.forall(_ >= 1000000L))
  }

  test("quality normalization: per-source percentile laws on real docs") {
    val out = TextOps.qualityNormalized(docs).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val n = rows.length.toLong
      // the worst doc of every source sits at percentile 0; nothing exceeds (n-1)/n
      assert(rows.map(_._3).min === 0L, src)
      assert(rows.map(_._3).max <= (n - 1) * 10000 / n, src)
      // monotone within source: higher score never gets a lower percentile,
      // and tied scores share one percentile
      val byScore = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
      byScore.values.foreach(p => assert(p.length === 1, src))
      val sorted = byScore.toSeq.sortBy(_._1)
      sorted.map(_._2.head).zip(sorted.tail.map(_._2.head))
        .foreach { case (a, b) => assert(a <= b, src) }
    }
  }

  test("mad outliers: robust to the outlier itself, zero-MAD flags frozen counters") {
    import spark.implicits._
    val day = 86400000L
    def evs(t: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, d) => (0 until c).map(k => (t, d * day + k)) }
    // "t": six flat days then one 10x spike → med 10, MAD 0, spike flagged;
    // "u": jittered days + one spike → med 10, MAD 1 — the spike does NOT
    // drag the scale (the 2σ rule's failure mode)
    val ev = (evs("t", Seq(10, 10, 10, 10, 10, 10, 100)) ++
      evs("u", Seq(8, 10, 12, 9, 11, 10, 30))).toDF("event_type", "ts_ms")
    val out = EventOps.madOutliers(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("t", 6 * day, 100L, 10L, 0L), ("u", 6 * day, 30L, 10L, 1L)))
  }

  test("shard plan: total coverage, determinism, hash balance within bounds") {
    val a = TextOps.shardPlan(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val b = TextOps.shardPlan(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(a.toSeq === b.toSeq) // byte-identical re-runs: the manifest contract
    assert(a.map(_._2).sum === docs.count()) // every doc lands in exactly one shard
    val n = docs.count()
    val ids = docs.agg(sum("doc_id")).head.getLong(0)
    assert(a.map(_._4).sum === ids) // checksums partition the id space
    // dev_pm sums to ~0 and hash balance keeps every shard within ±50%
    // at 500 docs (loose: binomial spread at small n)
    a.foreach { case (_, _, _, _, dev) => assert(math.abs(dev) < 500, a.toSeq) }
    assert(n > 0)
  }

  test("filtered topk: every neighbor shares the query's label; agrees with post-filtered brute") {
    import spark.implicits._
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.filteredTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (q, _, n, _) => assert(labels(q) === labels(n)) }
    // pre-filter ≡ post-filter-then-rerank on the full brute ordering: for
    // each query, the filtered top-K must be the first K same-label entries
    // of the unfiltered ranking (restricted to what brute's top-K window
    // exposes — so compare on the intersection)
    val brute = Similarity.bruteTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bruteFiltered = brute.filter { case (q, _, n, _) => labels(q) == labels(n) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._3, x._4))).toMap
    out.groupBy(_._1).foreach { case (q, rows) =>
      val got = rows.sortBy(_._2).map(x => (x._3, x._4))
      val expectPrefix = bruteFiltered.getOrElse(q, Array.empty[(Long, Long)])
      assert(got.take(expectPrefix.length).toSeq === expectPrefix.toSeq, q)
    }
  }

  test("bm25: tf, idf and length-normalization orderings on a planted corpus") {
    import spark.implicits._
    val in = Seq(
      (1L, "data data data table"), // high tf + a second query term
      (2L, "data xx xx xx"), // tf 1, same length as d1
      (3L, "xx yy zz ww"), // no query terms → absent
      (4L, "data xx xx xx xx xx xx xx")) // tf 1 but twice as long → below d2
      .toDF("doc_id", "text")
    val out = TextOps.bm25TopK(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 4L)) // rank order
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L)) // contiguous ranks
    assert(out.forall(_._3 > 0))
    // real corpus: exactly TopN rows, strictly ordered
    val real = TextOps.bm25TopK(docs).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(real.length === TextOps.Bm25TopN)
    real.zip(real.tail).foreach { case ((_, a), (_, b)) => assert(a >= b) }
  }

  test("cusum changepoint: planted level shift located; constant and single-day edges") {
    import spark.implicits._
    val day = 86400000L
    // "shift": 2/day for days 0-9 then 6/day for days 10-19 → argmax |dev|
    // lands on the LAST low day (d=9); "flat": constant 3/day, all dev 0,
    // earliest-day tie-break elects d=0; "one": single day, no after-side.
    val ev = (
      (for (d <- 0 until 20; k <- 0 until (if (d < 10) 2 else 6)) yield ("shift", d * day + k)) ++
      (for (d <- 0 until 5; k <- 0 until 3) yield ("flat", d * day + k)) ++
      Seq(("one", 0L))).toDF("event_type", "ts_ms")
    val out = EventOps.cusumChangepoint(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("shift") === ((9L * day, 400L, 200L, 600L)))
    assert(out("flat") === ((0L, 0L, 300L, 300L)))
    assert(out("one") === ((0L, 0L, 100L, -1L)))
  }

  test("survival km: monotone curve and at-risk accounting on real events") {
    val out = EventOps.survivalKm(graft.sources.EventsAdapter.events(spark, dir)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // survival and at-risk are weakly decreasing in the gap
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 >= b._6 && a._3 >= b._3)
        case _ =>
      }
      // the first at-risk count is the type's total gap count
      assert(sorted.head._3 === rows.map(r => r._4 + r._5).sum)
      sorted.foreach { r => assert(r._6 >= 0L && r._6 <= 1000000L) }
    }
  }

  test("ccnet buckets: tercile laws and monotone surprisal per language") {
    val out = TextOps.ccnetBuckets(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byLang = out.groupBy(_._1)
    val langTotals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rows) =>
      val n = langTotals(lang)
      assert(rows.map(_._3).sum === n, "every doc lands in exactly one bucket")
      val m = rows.map(t => t._2 -> t._3).toMap
      // cum-threshold rule: tercile prefixes are at least their share
      assert(m.getOrElse("head", 0L) * 3 >= n)
      assert((m.getOrElse("head", 0L) + m.getOrElse("middle", 0L)) * 3 >= 2 * n)
      // surprisal is monotone across buckets where all three exist
      for {
        h <- rows.find(_._2 == "head"); mi <- rows.find(_._2 == "middle")
        t <- rows.find(_._2 == "tail")
      } { assert(h._4 <= mi._4 && mi._4 <= t._4) }
    }
  }

  test("theta overlap: small-set rule is exact; set-algebra laws hold") {
    import spark.implicits._
    // sub-K sketches: estimator must degrade to the exact values.
    // doc_ids 0/3/4 all fall INSIDE the EvalSampling hash-sample (45/33/31
    // < Pct), so the sampled exact side sees the whole tiny corpus and the
    // sub-K exactness law is still a valid check.
    val tiny = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "sa"),
      (3L, "alpha beta gamma delta epsilon zeta", "sb"), // identical to sa
      (4L, "one two three four five six seven", "sc"))
      .toDF("doc_id", "text", "source")
    // distinct 3-shingle counts per source: sa/sb 4 (identical text), sc 5
    val nA = Map("sa" -> 4L, "sb" -> 4L, "sc" -> 5L)
    Sketches.thetaSourceOps(tiny).collect().foreach { r =>
      val (ue, ie, da, ux, ix) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(ue === ux, "sub-K union estimate is exact")
      assert(ie === ix, "sub-K intersection estimate is exact")
      assert(da === nA(r.getString(0)) - ix, "sub-K A-minus-B estimate is exact")
    }
    val ab = Sketches.thetaSourceOps(tiny).collect()
      .find(r => r.getString(0) == "sa" && r.getString(1) == "sb").get
    assert(ab.getLong(3) === ab.getLong(5), "identical sources: inter == union")
    // corpus laws: inter ≤ union on both the est and exact sides
    Sketches.thetaSourceOps(docs).collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "inter_est <= union_est")
      assert(r.getLong(6) <= r.getLong(5), "inter_exact <= union_exact")
      assert(r.getLong(4) >= 0L)
    }
  }

  test("theta overlap: >60 sources spill into chunked mask words, no crash") {
    import spark.implicits._
    // 64 distinct sources → 2 mask words (the old require(<=60) path died
    // here); each doc sub-K and in-sample (ids drawn from the hash-sample
    // members ≤ 400), so estimator == sampled-exact still holds. Sources
    // s00 and s63 share identical text across the word boundary: their
    // pair must report inter == union on both sides.
    val inSample = Seq(0, 3, 4, 7, 8, 11, 12, 13, 14, 17, 18, 21, 22, 25, 26,
      27, 28, 31, 32, 35, 36, 37, 40, 41, 42, 43, 46, 47, 50, 51, 54, 55, 56,
      57, 60, 61, 64, 65, 68, 69, 71, 75, 76, 79, 80, 83, 84, 85, 86, 89, 90,
      93, 94, 97, 98, 100, 103, 104, 107, 108, 109, 112, 113, 114)
    val wide = inSample.zipWithIndex.map { case (id, i) =>
      val text = if (i == 0 || i == 63) "alpha beta gamma delta epsilon"
                 else s"w${i}a w${i}b w${i}c w${i}d w${i}e"
      (id.toLong, text, f"s$i%02d")
    }.toDF("doc_id", "text", "source")
    val rows = Sketches.thetaSourceOps(wide).collect()
    assert(rows.length === 64 * 63 / 2)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "inter_est <= union_est")
      assert(r.getLong(6) <= r.getLong(5), "inter_exact_s <= union_exact_s")
      assert(r.getLong(2) === r.getLong(5), "sub-K in-sample: est == exact")
      assert(r.getLong(3) === r.getLong(6), "sub-K in-sample: est == exact")
    }
    val twin = rows.find(r => r.getString(0) == "s00" && r.getString(1) == "s63").get
    assert(twin.getLong(3) === twin.getLong(2), "identical cross-word sources")
    assert(twin.getLong(3) > 0L)
  }

  test("scene cuts: shot laws hold on real videos; corrupt payloads total to a zero row") {
    import spark.implicits._
    // a blob that is no container at all is a row, not an exception
    val junk = Seq(MediaRow(1L, "video", Array.fill(160)('a'.toByte), 64, 48)).toDF()
    val z = Multimodal.sceneCuts(junk).collect()(0)
    assert(z.getLong(1) === 0L && z.getLong(3) === 0L)
    // laws on the corpus-derived REAL videos: the planted mid-clip cut is
    // found in every clip, shots = cuts + 1, longest shot bounded
    Multimodal.sceneCuts(Multimodal.videoFromDocs(docs)).collect().foreach { r =>
      val (nf, nc, ns, ls) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nc >= 1L, "planted +128 mid-clip shift must register as a cut")
      assert(ns === nc + 1)
      assert(ls <= nf && ls >= (nf + ns - 1) / ns)
    }
  }

  test("unimax: allocation laws hold (caps, budget, monotone epochs)") {
    val out = TextOps.unimaxAlloc(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    val budget = out.map(_._2).sum * TextOps.UniMaxBudgetX
    out.foreach { case (_, nt, cap, alloc, epm) =>
      assert(cap === nt * TextOps.UniMaxEpochCap)
      assert(alloc >= 0L && alloc <= cap, "no language exceeds its epoch cap")
      assert(epm === alloc * 1000L / nt)
      assert(epm <= TextOps.UniMaxEpochCap * 1000L)
    }
    assert(out.map(_._4).sum <= budget, "allocation never exceeds the budget")
    // waterfilling signature: epochs are weakly decreasing in corpus size
    val bySize = out.sortBy(_._2)
    bySize.sliding(2).foreach {
      case Array((_, _, _, _, e1), (_, _, _, _, e2)) => assert(e1 >= e2)
      case _ =>
    }
    // unfunded languages share one level: their allocs are all equal
    val unfunded = out.filter(t => t._4 < t._3)
    assert(unfunded.map(_._4).distinct.length <= 1, "one waterfilling level")
  }

  test("soft dedup: weight laws hold and exact duplicates share depressed weights") {
    // sf0.001 plants near-dups but no exact dup; plant one (doc 9000
    // copies doc 0's text) so the twin-weight law is exercised
    val planted = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(9000L))
    val input = docs.unionByName(planted)
    val out = Dedup.softDedupWeights(input).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === input.count())
    out.foreach { case (_, nSh, meanFp, wPm) =>
      if (nSh == 0L) { assert(meanFp === 0L && wPm === 1000L) }
      else {
        assert(meanFp >= 1000000L, "mean document frequency is at least 1")
        assert(wPm >= 1L && wPm <= 1000L)
        assert(wPm === 1000000000L / meanFp)
      }
    }
    // exact twins have identical shingle sets → identical weights, cut
    // at least 2x; some unduplicated doc always outweighs every twin
    // (the testdata's 30-word vocab collides shingles across docs, so
    // nobody reaches the theoretical 1000 — anti-monotonicity is the law)
    val w = out.map(t => t._1 -> t._4).toMap
    assert(w(0L) === w(9000L), "exact twins must share a weight")
    assert(w(0L) <= 500L, "a doc with one exact twin is cut at least 2x")
    assert(out.map(_._4).max > 500L, "an unduplicated doc outweighs the twins")
  }

  test("mmr rerank: matches an independent local greedy trajectory exactly") {
    val out = Similarity.mmrRerank(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosFp(a: Array[Double], b: Array[Double]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6).toLong
    }
    val lam = Similarity.MmrLambda10
    val expected = (0L until Similarity.NumQueries.toLong).flatMap { qid =>
      val rel = vecs.keys.filter(_ != qid).toSeq
        .map(c => c -> cosFp(vecs(qid), vecs(c)))
        .sortBy { case (c, r) => (-r, c) }.take(Similarity.MmrCand).toMap
      var selected = Vector.empty[(Long, Long)] // (cand, score)
      for (_ <- 1 to Similarity.MmrPick) {
        val pool = rel.keySet -- selected.map(_._1)
        val best = pool.map { c =>
          val maxsim =
            if (selected.isEmpty) 0L
            else selected.map(s => cosFp(vecs(c), vecs(s._1))).max
          val score = if (selected.isEmpty) rel(c) * lam
                      else rel(c) * lam - maxsim * (10L - lam)
          (c, score)
        }.minBy { case (c, s) => (-s, c) }
        selected :+= best
      }
      selected.zipWithIndex.map { case ((c, s), i) => (qid, i + 1L, c, s) }
    }
    assert(out.toSeq === expected)
  }

  test("quality train: zero init, exact GD replay of iteration 1, accuracy bounds") {
    import spark.implicits._
    val out = TextOps.qualityTrain(docs).collect()
    assert(out.length === TextOps.QtIters + 1)
    val n = docs.count()
    // iter 0: untrained weights are all zero; p=500 everywhere predicts
    // keep for every doc, so n_correct(0) = number of gopher-keep docs
    val r0 = out.head
    assert((1 to 5).forall(k => r0.getLong(k) === 0L))
    val gopherKeeps = TextOps.gopherFilters(docs).filter(col("keep")).count()
    assert(r0.getLong(6) === gopherKeeps)
    out.foreach(r => assert(r.getLong(6) >= 0L && r.getLong(6) <= n))
    // replay iteration 1 by hand from the feature relation: with w=0,
    // p=500 for every row, so grad_k = sum((500 - y) * x_k) and
    // w_k(1) = -2*grad_k / n (truncating division, matching Spark div)
    val f = TextOps.qtFeatures(docs).collect()
    for (k <- 0 to 4) {
      val g = f.map(r => (500L - r.getLong(6)) * r.getLong(1 + k)).sum
      assert(out(1).getLong(1 + k) === -(TextOps.QtLrNum * g / n),
        s"iter-1 weight w$k mismatch")
    }
    // training moved the weights off zero
    assert((1 to 5).exists(k => out.last.getLong(k) !== 0L))
  }

  test("quality trained scores: z/p consistency and keep threshold") {
    val w = TextOps.qualityTrain(docs).collect().last
    val weights = (1 to 5).map(w.getLong)
    val feats = TextOps.qtFeatures(docs).collect()
      .map(r => r.getLong(0) -> (1 to 5).map(k => r.getLong(k))).toMap
    val out = TextOps.qualityTrainedScores(docs).collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      val z = weights.zip(feats(r.getLong(0))).map { case (a, b) => a * b }.sum
      assert(r.getLong(1) === z, s"z_fp mismatch for doc ${r.getLong(0)}")
      val p = math.min(1000L, math.max(0L, 500L + z / TextOps.QtSigDiv))
      assert(r.getLong(2) === p)
      assert(r.getBoolean(3) === (p >= 500L))
    }
    // the trained model separates: both classes appear on real testdata
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)))
  }

  test("url canonicalization: every normalization rule, row-exact") {
    import spark.implicits._
    val cases = Seq(
      // (raw, expected canonical)
      ("https://site1.example.com/p/2", "https://site1.example.com/p/2"),
      ("HTTPS://WWW.SITE1.EXAMPLE.COM/p/2/", "https://site1.example.com/p/2"),
      ("https://site1.example.com:443/p/2?utm_source=a&utm_campaign=b",
        "https://site1.example.com/p/2"),
      ("http://www.site1.example.com:80/p/2#frag", "https://site1.example.com/p/2"),
      // real params survive, sorted; tracking stripped mid-list
      ("https://h.com/x?b=2&utm_medium=m&a=1", "https://h.com/x?a=1&b=2"),
      // params are name-matched, not substring: ?xutm_a=1 survives
      ("https://h.com/x?xutm_a=1", "https://h.com/x?xutm_a=1"),
      ("https://h.com/x?fbclid=abc&gclid=1", "https://h.com/x"),
      // bare utm_* with no '=' is still tracking
      ("https://h.com/x?utm_source", "https://h.com/x"),
      // path case is PRESERVED (paths are case-sensitive)
      ("https://H.com/P/Q", "https://h.com/P/Q"),
      // non-default port survives
      ("https://h.com:8443/x", "https://h.com:8443/x"),
      // www-only strip is a prefix rule: wwwx stays
      ("https://wwwx.h.com/x", "https://wwwx.h.com/x"))
    val got = cases.map(_._1).toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c")).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((raw, want), have) =>
      assert(have === want, s"canonicalize($raw)")
    }
  }

  test("url dedup + host stats: group structure of the synthetic urls") {
    val ded = UrlOps.urlDedup(docs).collect()
    val n = docs.count()
    // doc_ids are dense 0..n-1 → full groups of 4 split 3+1; count totals
    assert(ded.map(_.getLong(2)).sum === n)
    val full = ded.filter(_.getLong(2) === 3L)
    assert(full.nonEmpty)
    full.foreach { r =>
      // keeper of the 3-way group is the variant-0 doc: 4*g
      assert(r.getLong(1) % 4 === 0L)
      // its canonical url carries no query string
      assert(!r.getString(0).contains("?"))
    }
    // the ?a=1&b=2 singletons: params sorted, tracking stripped
    val single = ded.filter(_.getString(0).contains("?"))
    single.foreach { r =>
      assert(r.getString(0).endsWith("?a=1&b=2"))
      assert(r.getLong(1) % 4 === 3L)
    }
    val hs = UrlOps.hostStats(docs).collect()
    assert(hs.map(_.getLong(1)).sum === n)
    hs.foreach { r =>
      assert(r.getString(0).startsWith("site") &&
        r.getString(0).endsWith(".example.com"))
      // every host's page count is ≤ its doc count and ≥ doc count / 4
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(2) * 4 >= r.getLong(1))
    }
  }

  test("bmp codec: top-down decode, padding, corruption rejection") {
    // hand-built 2x2 top-down BMP (negative height): pixel (x,y) with
    // r=10x+y marker values; decode must land them at top-left order
    val w = 2; val h = 2
    val rowBytes = (w * 3 + 3) / 4 * 4 // 8: exercises 2 pad bytes
    val buf = new Array[Byte](54 + rowBytes * h)
    buf(0) = 'B'; buf(1) = 'M'
    def le32(off: Int, v: Int): Unit = {
      buf(off) = (v & 0xff).toByte; buf(off + 1) = ((v >> 8) & 0xff).toByte
      buf(off + 2) = ((v >> 16) & 0xff).toByte; buf(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      buf(off) = (v & 0xff).toByte; buf(off + 1) = ((v >> 8) & 0xff).toByte
    }
    le32(2, buf.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, -h) // NEGATIVE height: top-down storage
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val k = y * w + x
      val off = 54 + y * rowBytes + x * 3 // top-down: file row == logical row
      buf(off) = (3 * k).toByte // B
      buf(off + 1) = (2 * k).toByte // G
      buf(off + 2) = (1 * k).toByte // R
    }
    val f = Multimodal.decodeBmp(7L, buf)
    assert(f.ok && f.width === 2 && f.height === 2 && f.n_pixels === 4L)
    assert(f.sum_r === (0 + 1 + 2 + 3))
    assert(f.sum_g === (0 + 2 + 4 + 6))
    assert(f.sum_b === (0 + 3 + 6 + 9))
    // pos checksum in logical top-left order: sum over k of luma(k)*(k+1)
    val want = (0 until 4).map(k => (299L * k + 587L * 2 * k + 114L * 3 * k) * (k + 1)).sum
    assert(f.pos_checksum === want)
    // the SAME pixel rule encoded bottom-up by encodeBmp decodes identically
    val enc = Multimodal.encodeBmp(7L, "abcdefghijkl", 2, 2)
    val dec = Multimodal.decodeBmp(7L, enc)
    assert(dec.ok && dec.sum_r === "adgj".map(_.toLong).sum)
    assert(dec.sum_g === "behk".map(_.toLong).sum)
    assert(dec.sum_b === "cfil".map(_.toLong).sum)
    // corruption: bad magic, wrong bpp, truncated data all reject cleanly
    val badMagic = enc.clone(); badMagic(0) = 'X'
    assert(!Multimodal.decodeBmp(1L, badMagic).ok)
    val bad16 = enc.clone(); bad16(28) = 16
    assert(!Multimodal.decodeBmp(1L, bad16).ok)
    assert(!Multimodal.decodeBmp(1L, enc.take(60)).ok)
  }

  test("wav codec: chunk walking, odd-size pad rule, sign extension, rejection") {
    // encodeWav places a LIST chunk before data - decode must walk past it
    val enc = Multimodal.encodeWav("abc", 4)
    val f = Multimodal.decodeWav(3L, enc)
    assert(f.ok && f.n_channels === 1 && f.sample_rate === 8000 && f.n_samples === 4L)
    // samples: (ord('a'|'b'|'c'|'a') - 96) * 128 = (1,2,3,1)*128
    assert(f.sum_abs === (1 + 2 + 3 + 1) * 128L)
    assert(f.peak === 3 * 128L)
    assert(f.pos_checksum === (1 * 1 + 2 * 2 + 3 * 3 + 1 * 4) * 128L)
    // negative samples sign-extend: ord(' ')=32 -> (32-96)*128 = -8192
    val neg = Multimodal.decodeWav(4L, Multimodal.encodeWav(" ", 1))
    assert(neg.ok && neg.sum_abs === 8192L && neg.pos_checksum === -8192L)
    // hand-built file with an ODD-size junk chunk before fmt: the RIFF
    // pad byte must be skipped or fmt parses one byte off
    val inner = Multimodal.encodeWav("ab", 2)
    val junkSz = 3 // odd
    val out = new java.io.ByteArrayOutputStream()
    out.write(inner, 0, 12) // RIFF....WAVE
    out.write("junk".getBytes("US-ASCII"))
    out.write(Array[Byte](junkSz.toByte, 0, 0, 0))
    out.write(Array[Byte](9, 9, 9, 0)) // 3 junk bytes + 1 pad byte
    out.write(inner, 12, inner.length - 12) // fmt + LIST + data
    val padded = out.toByteArray
    // fix the RIFF size field
    padded(4) = ((padded.length - 8) & 0xff).toByte
    val g = Multimodal.decodeWav(5L, padded)
    assert(g.ok && g.n_samples === 2L, g.toString)
    // rejection: non-PCM format code, missing data chunk, truncation
    val badFmt = enc.clone(); badFmt(20) = 3
    assert(!Multimodal.decodeWav(1L, badFmt).ok)
    assert(!Multimodal.decodeWav(1L, enc.take(40)).ok)
  }

  test("phash hashes decoded pixels: top-down and bottom-up encodings of one image collide") {
    import spark.implicits._
    // one logical image, two byte layouts: encodeBmpPixels stores rows
    // bottom-up; the hand-built twin uses a NEGATIVE height (top-down).
    // A byte-level hash would see different files — the pixel aHash
    // must see one image.
    val w = 8; val h = 8
    val px = Array.tabulate(w * h * 3)(i => (i * 37) % 256)
    val bottomUp = Multimodal.encodeBmpPixels(px, w, h)
    val buf = new Array[Byte](54 + w * 3 * h)
    buf(0) = 'B'; buf(1) = 'M'
    def le32(off: Int, v: Int): Unit = {
      buf(off) = (v & 0xff).toByte; buf(off + 1) = ((v >> 8) & 0xff).toByte
      buf(off + 2) = ((v >> 16) & 0xff).toByte; buf(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      buf(off) = (v & 0xff).toByte; buf(off + 1) = ((v >> 8) & 0xff).toByte
    }
    le32(2, buf.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, -h) // top-down
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, w * 3 * h)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (y * w + x) * 3
      val off = 54 + y * (w * 3) + x * 3
      buf(off) = px(k + 2).toByte; buf(off + 1) = px(k + 1).toByte
      buf(off + 2) = px(k).toByte
    }
    val df = Seq(MediaRow(1L, "image", bottomUp, w, h),
                 MediaRow(2L, "image", buf, w, h)).toDF()
    val ph = Multimodal.phashes(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) === ph(2L), ph.toString)
    val pairs = Multimodal.phashDup(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 2L, 0L)), pairs.toString)
  }

  test("decode router: magic-byte dispatch hits the right real decoder; corrupt stays total") {
    import spark.implicits._
    val bmp = Multimodal.encodeBmp(1L, "abcdef", 4, 3)
    val wav = Multimodal.encodeWav("abc", 4)
    val vid = Multimodal.encodeVideo("abcdef", 4, 3, 8)
    val raw = "just some text".getBytes("UTF-8")
    val corruptBmp = bmp.clone(); corruptBmp(28) = 16 // right magic, wrong bpp
    val jpg = Multimodal.encodeJpeg("abcdef", 8, 16)
    val df = Seq(
      MediaRow(1L, "mixed", bmp, 0, 0), MediaRow(2L, "mixed", wav, 0, 0),
      MediaRow(3L, "mixed", vid, 0, 0), MediaRow(4L, "mixed", raw, 0, 0),
      MediaRow(5L, "mixed", corruptBmp, 0, 0),
      MediaRow(6L, "mixed", jpg, 0, 0)).toDF()
    val out = Multimodal.decodeRouter(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out(1L) === (("image", true, 12L)))
    assert(out(2L) === (("audio", true, 4L)))
    assert(out(3L) === (("video", true, 8L)))
    assert(out(4L)._1 === "unknown" && out(4L)._3 === raw.length.toLong)
    // routed correctly by magic, decode rejects cleanly — a row, not a throw
    assert(out(5L) === (("image", false, 0L)))
    assert(out(6L) === (("jpeg", true, 128L)))
  }

  test("video container: real frame decode, planted mid-clip cut on decoded pixels") {
    import spark.implicits._
    val text = "abcdefghijklmnopqrstuvwxyz"
    // container round-trip: frame count, dims, per-frame pixel rule with
    // the midpoint inversion — verified on the DECODED pixel arrays
    val enc = Multimodal.encodeVideo(text, 4, 3, 8)
    val frames = Multimodal.decodeVideoFrames(enc).get
    assert(frames.length === 8)
    assert(frames.forall { case (w, h, px) => w == 4 && h == 3 && px.length == 36 })
    def b(f: Int, j: Int): Int = {
      val v = text.charAt((3 * f * 12 + j) % text.length).toInt
      if (f >= 4) (v + 128) % 256 else v
    }
    assert(frames(0)._3.toSeq === (0 until 36).map(b(0, _)))
    assert(frames(5)._3.toSeq === (0 until 36).map(b(5, _)))
    // corrupt containers reject cleanly (never throw): truncation, a
    // frame length pointing past the payload, a corrupted inner BMP
    assert(Multimodal.decodeVideoFrames(enc.take(enc.length - 3)).isEmpty)
    val lying = enc.clone(); lying(4) = -1 // frame count field
    assert(Multimodal.decodeVideoFrames(lying).isEmpty)
    val badMagic = enc.clone(); badMagic(0) = 'X'
    assert(Multimodal.decodeVideoFrames(badMagic).isEmpty)
    val badInner = enc.clone(); badInner(12) = 'X' // first frame's BMP magic
    assert(Multimodal.decodeVideoFrames(badInner).isEmpty)
    // scene cuts find EXACTLY the planted inversion boundary: nf=9 from
    // n_chars=26 → cut at frame 4, shots [0,4) and [4,9), longest 5
    val d1 = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val cuts = Multimodal.sceneCuts(Multimodal.videoFromDocs(d1)).collect()(0)
    assert(cuts.getLong(1) === 9L) // n_frames
    assert(cuts.getLong(2) === 1L, cuts.toString) // exactly the planted cut
    assert(cuts.getLong(3) === 2L)
    assert(cuts.getLong(4) === 5L)
    // frame sampling decodes + NN-resizes real frames: 9 frames → 3
    // sampled, resized to (3, 3) (w=5, h=5 at n_chars=26)
    val fs = Multimodal.sampleFrames(Multimodal.videoFromDocs(d1)).collect()(0)
    assert(fs.getLong(1) === 9L)
    assert(fs.getInt(2) === 3 && fs.getInt(3) === 3)
    assert(fs.getLong(4) !== 0L)
  }

  test("curation full: stage containment and ordered split report") {
    val out = TextOps.curationFull(docs).collect()
    val total = out.map(_.getLong(1)).sum
    // survivors passed every stage: bounded by each stage's own keep count
    val urlKeep = UrlOps.urlDedup(docs).count()
    val gopherKeep = TextOps.gopherFilters(docs).filter(col("keep")).count()
    val clsKeep = TextOps.qualityTrainedScores(docs).filter(col("keep")).count()
    assert(total <= urlKeep && total <= gopherKeep && total <= clsKeep)
    assert(total > 0, s"stacked filters killed the whole sf0.001 corpus " +
      s"(url=$urlKeep gopher=$gopherKeep cls=$clsKeep)")
    assert(out.map(_.getString(0)).toSeq === out.map(_.getString(0)).toSeq.sorted)
  }

  test("host quality budget: shares sum to ~1e6, mass conservation, clamping") {
    val out = UrlOps.hostQualityBudget(docs).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).sum === docs.count())
    val shares = out.map(_.getLong(3))
    shares.foreach(s => assert(s >= 0L && s <= 1000000L))
    // truncating division loses < 1 ppm per host
    val tot = shares.sum
    assert(tot <= 1000000L && tot > 1000000L - out.length)
    out.foreach(r => assert(r.getLong(2) >= 0L, "clamped mean can't be negative"))
  }

  test("semantic decontamination: planted bench copy flagged, clean train not") {
    import spark.implicits._
    // pseudo-random 64-dim vectors; ids 0/10/20 are the benchmark split
    // (vec_id % 10 == 0), id 7 is an exact copy of bench vector 10 (the
    // planted paraphrase-leak analogue), the rest are independent
    def vec(seed: Long): Array[Float] = (1 to 64).map(d =>
      (((seed * 2654435761L + d * 40503L) % 2001L) - 1000L) / 1000.0f).toArray
    val rows = Seq((0L, vec(0)), (10L, vec(10)), (20L, vec(20)),
      (7L, vec(10)), (8L, vec(8)), (13L, vec(13)))
    val out = Dedup.semanticDecontaminate(rows.toDF("vec_id", "embedding")).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId.contains(7L), s"planted leak must be flagged: ${out.toSeq}")
    assert(byId(7L).getLong(2) >= 999000L, "exact copy scores cosine ~1")
    assert(!byId.contains(10L) && !byId.contains(20L) && !byId.contains(0L),
      "benchmark-side vectors are never flagged as contaminated train docs")
  }

  test("bmp resize: nearest-neighbor map on real pixels, re-encode identity") {
    // 2x2 -> 1x1: NN keeps the top-left pixel only
    val enc = Multimodal.encodeBmp(1L, "abcdefghijkl", 2, 2)
    val Some((w0, h0, px)) = Multimodal.decodeBmpPixels(enc)
    assert((w0, h0) === (2, 2))
    assert(px.take(3).toSeq === Seq('a'.toInt, 'b'.toInt, 'c'.toInt))
    // encode-from-pixels o decode-to-pixels is the identity (padding,
    // row flip, BGR order all cancel)
    val Some((_, _, px2)) =
      Multimodal.decodeBmpPixels(Multimodal.encodeBmpPixels(px, w0, h0))
    assert(px2.toSeq === px.toSeq)
    // 4x3 -> 2x2 NN map: resized (x2,y2) = source (x2*4/2, y2*3/2)
    val src = Array.tabulate(4 * 3 * 3)(i => (i / 3) % 251)
    val Some((_, _, dec)) =
      Multimodal.decodeBmpPixels(Multimodal.encodeBmpPixels(src, 4, 3))
    assert(dec.toSeq === src.toSeq)
    for ((x2, y2) <- Seq((0, 0), (1, 0), (0, 1), (1, 1))) {
      val (sx, sy) = (x2 * 4 / 2, y2 * 3 / 2)
      assert(src((sy * 4 + sx) * 3) === ((sy * 4 + sx) % 251))
    }
  }

  test("wav resample: decimation on real samples, halved rate in the real header") {
    // 'abcd' -> samples (1,2,3,4)*128; decimate keeps (1,3)*128 at 4 kHz
    val f = Multimodal.decodeWav(1L,
      Multimodal.encodeWavSamples(Array(128, 256, 384, 512).map(x => x), 8000))
    assert(f.ok && f.n_samples === 4L)
    val Some((rate, ss)) = Multimodal.decodeWavSamples(Multimodal.encodeWav("abcd", 4))
    assert(rate === 8000 && ss.toSeq === Seq(128, 256, 384, 512))
    val dec = Array.tabulate((ss.length + 1) / 2)(k => ss(2 * k))
    val g = Multimodal.decodeWav(2L, Multimodal.encodeWavSamples(dec, rate / 2))
    assert(g.ok && g.sample_rate === 4000 && g.n_samples === 2L)
    assert(g.sum_abs === (128 + 384) && g.pos_checksum === (128 * 1 + 384 * 2))
  }

  test("zorder layout: Morton monotone on each axis; pruning dominates where it must") {
    // bit-interleave ground truth on small values: z(p,s) built bit-by-bit
    def zRef(p: Long, s: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((p >> i) & 1L) << (2 * i)) | (((s >> i) & 1L) << (2 * i + 1))
      }
    val spark2 = spark
    import spark2.implicits._
    val pairs = for (p <- 0L to 40L by 7L; s <- 0L to 40L by 9L) yield (p, s)
    val got = pairs.toDF("p", "s")
      .select(LayoutOps.zval(col("p"), col("s")).as("z")).as[Long].collect()
    assert(got.toSeq === pairs.map { case (p, s) => zRef(p, s) })

    val rep = LayoutOps.zorderPrune(
      spark.read.parquet(s"$dir/lineitem.parquet")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rep.keySet === Set("l1_natural", "l2_partkey", "l3_zorder"))
    val nat = rep("l1_natural"); val pk = rep("l2_partkey"); val zo = rep("l3_zorder")
    // every layout's scan is a superset of the true matches
    rep.values.foreach { case (_, boxRows, _, suppRows, boxM, suppM) =>
      assert(boxRows >= boxM && suppRows >= suppM)
    }
    // single-column clustering serves the box better than arrival order...
    assert(pk._1 <= nat._1)
    // ...but cannot prune the second-column-only predicate AT ALL
    assert(pk._3 === LayoutOps.NBuckets.toLong || pk._3 === nat._3)
    // z-order prunes BOTH predicates strictly better than natural order
    assert(zo._1 < nat._1 && zo._3 < nat._3,
      s"zorder must beat natural on both predicates: $zo vs $nat")
    // and beats single-column clustering on the suppkey-only predicate
    assert(zo._3 < pk._3, s"zorder supp pruning $zo._3 !< partkey ${pk._3}")
  }

  test("html extract: every planted page round-trips; adversarial chrome drops") {
    val spark2 = spark
    import spark2.implicits._
    // plant + extract over the corpus: extraction must recover every doc
    val rep = Extract.htmlExtract(docs).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getBoolean(5), s"doc ${r.getLong(0)} did not round-trip")
      // nav + footer always dropped; ad dropped for doc_id % 3 == 0
      val chrome = if (r.getLong(0) % 3 == 0) 3L else 2L
      assert(r.getLong(1) - r.getLong(2) === chrome,
        s"doc ${r.getLong(0)}: expected $chrome boilerplate blocks dropped")
    }
    // adversarial page the plant never produces: a link-farm block with
    // MANY words (fails naive word-count-only heuristics, caught by
    // density), prose with ONE inline link (must keep), empty blocks
    val farm = (1 to 8).map(i => s"""<a href="/$i">item number $i</a>""").mkString(" ")
    val prose = "the quick brown fox jumps over the " +
      """<a href="/dog">lazy dog</a> and keeps on running far away"""
    val page = s"""<div>$farm</div>\n<p>$prose</p>\n<p></p>"""
    val row = Seq((1L, "x")).toDF("doc_id", "text")
      .withColumn("html", lit(page))
      .withColumn("bi", expr(
        """transform(split(html, '\n'), b -> named_struct(
          |  's', trim(regexp_replace(b, '<[^>]*>', ' ')),
          |  'na', (length(b) - length(replace(b, '<a ', ''))) div 3))""".stripMargin))
      .withColumn("bi", expr(
        "transform(bi, x -> named_struct('s', x.s, 'na', x.na, " +
          "'nw', size(filter(split(x.s, ' '), t -> t != ''))))"))
      .selectExpr(s"filter(bi, x -> x.na * ${Extract.LinkDensityInv} < x.nw) AS kept")
      .selectExpr("transform(kept, x -> x.s) AS s").as[Seq[String]].head()
    assert(row.length === 1, s"exactly the prose block must survive: $row")
    assert(row.head.contains("quick brown fox") && row.head.contains("lazy dog"))
  }

  test("dp release: full domain, clamped counts, geometric noise laws") {
    // threshold table: strictly increasing CDF quantization reaching ~2^60
    val t = Privacy.NoiseThresholds
    assert(t.length === 2 * Privacy.NoiseCap + 1)
    assert(t.zip(t.tail).forall { case (a, b) => a < b }, "CDF not monotone")
    assert(t.last > (1L << 60) - 1000, "CDF must reach ~1 at the cap")
    // symmetry of the two-sided geometric: P(noise <= -1) == P(noise >= 1)
    val pNeg = t(Privacy.NoiseCap - 1)            // CDF(-1)
    val pPosTail = (1L << 60) - t(Privacy.NoiseCap) // 1 - CDF(0)
    assert(math.abs(pNeg - pPosTail) <= 2, s"asymmetric tails: $pNeg vs $pPosTail")

    val rows = Privacy.dpRelease(docs).collect()
    val nSrc = docs.select("source").distinct().count()
    val nLang = docs.select("lang").distinct().count()
    assert(rows.length.toLong === nSrc * nLang, "release must cover the FULL domain")
    rows.foreach { r =>
      val (nTrue, noise, released, sup) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(math.abs(noise) <= Privacy.NoiseCap)
      assert(released === math.max(nTrue + noise, 0L))
      assert(sup === (nTrue < Privacy.KAnonMin))
    }
    // determinism: the keyed-hash draw replays bit-identically
    val again = Privacy.dpRelease(docs).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("ccStar: log rounds on a 500-hop path; labels agree with min-label propagation") {
    val rep = Dedup.ccStar(docs).collect()
    // the whole point: component diameter ~125 at this SF, rounds ~log
    assert(Dedup.lastStarRounds <= 15,
      s"star contraction took ${Dedup.lastStarRounds} rounds — not log-bounded")
    val byId = rep.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxId = byId.keySet.max
    val chainTop = math.min(Dedup.StarChainMax, maxId)
    val chainNodes = 0L.to(chainTop, Dedup.StarChainStep)
    assert(chainNodes.map(byId).toSet.size === 1, "planted chain must be ONE component")
    assert(byId(0L) === 0L, "component label must be the minimum member")
    // n_members is consistent with the label partition
    rep.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      rows.foreach(r => assert(r.getLong(2) === rows.length.toLong))
    }
    // independent algorithm agreement: distributed min-label propagation
    // over the SAME edge relation (chain capped, so its diameter is
    // tolerable for the diameter-bound loop at this SF)
    val spark2 = spark
    import spark2.implicits._
    val chainDf = chainNodes.init.map(i => (i, i + Dedup.StarChainStep))
      .toDF("i", "j")
    val pairs = Dedup.ngramJaccard(docs).select("i", "j").unionByName(chainDf)
    val ref = Dedup.propagateClusters(pairs.distinct(), docs.select("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId === ref, "star contraction disagrees with min-label propagation")
  }

  test("mixture sample: realized epochs+fraction track the temperature targets") {
    val rows = TextOps.mixtureSample(docs).collect()
    assert(rows.nonEmpty)
    val targets = rows.map(_.getLong(2)).sum
    assert(targets <= TextOps.MixTargetDocs, "floor division cannot overshoot")
    rows.foreach { r =>
      val (n, t, ep, frac, real) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ep === t / n)
      assert(frac >= 0 && frac <= n)
      assert(real === ep * n + frac)
      // keyed-hash uniformity: the fractional sample lands near its rate
      val expect = t % n
      assert(math.abs(frac - expect) <= math.max(n / 4, 10L),
        s"fractional sample $frac far from expected $expect of $n")
    }
    // content-keyed draw: bit-identical on replay
    assert(rows.map(_.toSeq).toSeq ===
      TextOps.mixtureSample(docs).collect().map(_.toSeq).toSeq)
  }

  test("suffix ranks: prefix doubling equals the definitional sort at every position") {
    val spark2 = spark
    import spark2.implicits._
    val got = SuffixOps.suffixRankRows(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // naive reference: materialize every capped suffix STRING and rank
    // by one global sort (fine at spec SF; impossible at corpus scale —
    // which is what the doubling exists to avoid)
    val naive = docs
      .select(col("doc_id"), col("text"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("p0", "t")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        expr(s"array_join(slice(split(text, ' '), p0 + 1, ${SuffixOps.SuffixCap}), ' ')").as("sfx"))
      .withColumn("rank", dense_rank().over(org.apache.spark.sql.expressions.Window.orderBy("sfx")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.size === naive.size)
    assert(got === naive, "doubling ranks diverge from the definitional string sort")
    // a planted exact-duplicate doc: every one of its suffixes occurs
    // elsewhere, and the twin's per-doc profile is identical (positions,
    // dup mass — ranks shift globally, so compare the dup law, not the
    // checksum)
    val twin = docs.filter(col("doc_id") === 0L)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val prof = SuffixOps.suffixRanks(docs.unionByName(twin)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof(0L) === prof(1000000L), "identical docs must share their profile")
    assert(prof(0L)._2 === prof(0L)._1, "every suffix of a duplicated doc occurs elsewhere")
  }

  test("dp release: release view carries no truth columns, noisy-thresholds cells; the seed keys the noise") {
    // round-10 advice: the release filter reads the NOISED count — a
    // threshold on n_true would make cell presence a deterministic
    // function of the raw data (unbounded likelihood ratio on neighbors)
    val audit = Privacy.dpRelease(docs, Privacy.PublicDemoSeed).collect()
    val pub = Privacy.dpReleasePublic(docs, Privacy.PublicDemoSeed)
    assert(pub.columns.toSeq === Seq("source", "lang", "n_released"),
      "release view must expose ONLY the noised count")
    val pubRows = pub.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // presence law: released cells are EXACTLY those whose noised count
    // clears the floor — n_true plays no direct role
    val expected = audit.filter(_.getLong(4) >= Privacy.KAnonMin)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pubRows === expected, "release membership must be a function of the noised count only")
    assert(audit.exists(_.getLong(4) < Privacy.KAnonMin),
      "fixture must exercise suppression")
    // the seed keys the mechanism: independent seeds draw different noise
    val a = Privacy.dpRelease(docs, "seed-a").collect().map(_.getLong(3)).toSeq
    val b = Privacy.dpRelease(docs, "seed-b").collect().map(_.getLong(3)).toSeq
    assert(a !== b, "independent seeds must draw different noise")
    // and the same seed replays bit-identically (the reproducibility contract)
    assert(a === Privacy.dpRelease(docs, "seed-a").collect().map(_.getLong(3)).toSeq)
  }

  test("cluster member counts stay exact under a 90% giant component with spec-scale skew thresholds") {
    // forced skew: 90% of docs are byte-identical (one near-dup component
    // holding 900 of 1000 docs — the 100 TB boilerplate shape). With the
    // AQE skew knobs cranked to spec scale, clusters() must return exact
    // member counts: the giant cluster's count must come from the
    // aggregate+join path, not a single-task window.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      val giant = (0 until 40).map(i => s"boiler$i").mkString(" ")
      val skewed = spark.range(0, 1000).select(
        col("id").as("doc_id"),
        when(col("id") % 10 < 9, lit(giant))
          .otherwise(concat(lit("unique doc body number "), col("id"))).as("text"))
      val got = Dedup.clusters(skewed).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      assert(got.length === 1000)
      val (giants, rest) = got.partition(_._1 % 10 < 9)
      giants.foreach { case (d, (c, n)) =>
        assert(c === 0L, s"doc $d: giant component labels by its minimum")
        assert(n === 900L, s"doc $d: giant component count must be exact, got $n")
      }
      rest.foreach { case (d, (c, n)) =>
        assert(c === d && n === 1L, s"doc $d must stay a singleton, got ($c, $n)")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("sa lcp/extents: depth equals prefix-count rederivation; T=16 law-identical to dupSpansVar; plants surface") {
    val planted = Dedup.plantSpans(docs)
    // naive depth: for each L in 1..16, count positions per capped-L
    // prefix string; depth = max over L of min(L, slen) where count >= 2
    // (the DuckDB oracle's formulation, re-derived in plain Scala so the
    // law also holds away from the oracle harness)
    val toks = planted.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val cnt = scala.collection.mutable.HashMap.empty[(Int, String), Int]
    for ((_, w) <- toks; i <- w.indices; l <- 1 to SuffixOps.SuffixCap) {
      val k = (l, w.slice(i, i + l).mkString(" "))
      cnt.update(k, cnt.getOrElse(k, 0) + 1)
    }
    val naive = (for ((d, w) <- toks; i <- w.indices) yield {
      val slen = math.min(SuffixOps.SuffixCap, w.length - i)
      val depth = (1 to SuffixOps.SuffixCap).map { l =>
        if (cnt((l, w.slice(i, i + l).mkString(" "))) >= 2) math.min(l, slen) else 0
      }.max
      (d, (i + 1).toLong) -> depth.toLong
    }).toMap
    val got = SuffixOps.saDepthRows(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.size === naive.size)
    assert(got === naive, "SA-derived depth diverges from prefix-count rederivation")

    // the SA extent engine at the window threshold IS dupSpansVar
    val viaSa = SuffixOps.saDupExtents(planted, Dedup.SpanLen)
      .collect().map(_.toSeq).toSeq
    val viaWin = Dedup.dupSpansVar(docs).collect().map(_.toSeq).toSeq
    assert(viaSa === viaWin, "saDupExtents(SpanLen) must be law-identical to dupSpansVar")

    // and the REWRITE half composes: SA-driven removal at the window
    // threshold is law-identical to the windowed removeSpans, and the
    // conservation law holds at the sub-window threshold too
    val viaSaRm = SuffixOps.saRemoveSpans(planted, Dedup.SpanLen)
      .collect().map(_.toSeq).toSeq
    val viaWinRm = Dedup.removeSpans(docs).collect().map(_.toSeq).toSeq
    assert(viaSaRm === viaWinRm, "saRemoveSpans(SpanLen) must equal removeSpans")
    SuffixOps.saRemoveSpans(planted, 8).collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"conservation: ${r.toSeq}")
    }

    // every planted ≥8-token span is recovered as an extent at T=8: the
    // 32- and 64-token plants appear whole (span_tokens >= plant length)
    val ex8 = SuffixOps.saDupExtents(planted, 8).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(3)).max }
    for ((m, len) <- Dedup.SpanPlants; if len >= 8) {
      val planted = toks.map(_._1).filter(_ % m == 0)
      assert(planted.size >= 2, s"plant $m needs >= 2 docs at spec SF")
      planted.foreach { d =>
        assert(ex8.getOrElse(d, 0L) >= len,
          s"doc $d: planted $len-token span not recovered (max extent ${ex8.getOrElse(d, 0L)})")
      }
    }
  }

  test("sa extent sources: geometry equals saDupExtents; partners equal the capped true partner sets") {
    val planted = Dedup.plantSpans(docs)
    val L = SuffixOps.SuffixCap
    val src = SuffixOps.saExtentSources(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(src.nonEmpty)
    val geo = SuffixOps.saDupExtents(planted, L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(src.map(t => (t._1, t._2, t._3, t._4)).toSeq === geo.toSeq,
      "attribution view must report exactly the saDupExtents geometry")
    // naive partner rederivation: window string -> doc set, extent
    // partners = union over its windows minus self, smallest 8
    val toks = planted.collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val winDocs = scala.collection.mutable.HashMap.empty[String, Set[Long]]
    for ((d, w) <- toks; i <- 0 to w.length - L) {
      val s = w.slice(i, i + L).mkString(" ")
      winDocs.update(s, winDocs.getOrElse(s, Set.empty) + d)
    }
    val byDoc = toks.toMap
    src.foreach { case (d, start, end, _, partners) =>
      val w = byDoc(d)
      val expect = (start to end - (L - 1)).flatMap { p =>
        winDocs(w.slice(p.toInt - 1, p.toInt - 1 + L).mkString(" "))
      }.toSet - d
      val capped = expect.toSeq.sorted.take(SuffixOps.ExtentPartnerCap).mkString(",")
      assert(partners === capped, s"doc $d extent at $start: $partners != $capped")
    }
    // the plants attribute cross-document: every 32-plant doc lists
    // another 32-plant doc among its partners
    val p32 = toks.map(_._1).filter(_ % 89 == 0).toSet
    assert(p32.size >= 2)
    src.filter(t => p32(t._1) && t._5.nonEmpty).foreach { case (d, _, _, _, ps) =>
      val listed = ps.split(",").map(_.toLong).toSet
      if ((listed intersect (p32 - d)).isEmpty)
        assert(listed.nonEmpty) // at minimum SOME partner is attributed
    }
    assert(src.exists(t => p32(t._1) &&
      t._5.split(",").filter(_.nonEmpty).map(_.toLong).exists(x => p32(x) && x != t._1)),
      "no 32-plant extent attributes a sibling plant doc")
  }

  test("sa: '' tokens from irregular whitespace never merge with the pad; cap=64 serves threshold 50") {
    import spark.implicits._
    // round-10 advice: split(text, ' ') yields '' tokens for
    // consecutive/leading/trailing spaces, and the old raw-token pad
    // made suffix [p,q] rank-equal to [p,q,''] — depth(B,1) inflated to
    // slen. The encTok encoding keeps them distinct; this corpus is
    // built to hit exactly that collision.
    val irr = Seq(
      (1L, "p q"),          // [p, q]
      (2L, "p q "),         // [p, q, ''] — trailing space mints a real ''
      (3L, "x  y"),         // [x, '', y]
      (4L, " x z"),         // ['', x, z]
      (5L, "m n r s"),
      (6L, "m n r s"),      // exact duplicate: cnt>=2 fast path
      (7L, "q")
    ).toDF("doc_id", "text")
    val toks = irr.collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val cnt = scala.collection.mutable.HashMap.empty[(Int, String), Int]
    for ((_, w) <- toks; i <- w.indices; l <- 1 to SuffixOps.SuffixCap) {
      val k = (l, w.slice(i, i + l).mkString(" "))
      cnt.update(k, cnt.getOrElse(k, 0) + 1)
    }
    val naive = (for ((d, w) <- toks; i <- w.indices) yield {
      val slen = math.min(SuffixOps.SuffixCap, w.length - i)
      val depth = (1 to SuffixOps.SuffixCap).map { l =>
        if (cnt((l, w.slice(i, i + l).mkString(" "))) >= 2) math.min(l, slen) else 0
      }.max
      (d, (i + 1).toLong) -> depth.toLong
    }).toMap
    val got = SuffixOps.saDepthRows(irr).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.size === naive.size)
    assert(got === naive, "irregular-whitespace depth diverges from the truncated-slice rederivation")
    // the discriminating pair: doc 2's [p,q,''] shares only 2 tokens
    // with doc 1's [p,q] — the old pad collision reported 3
    assert(got((2L, 1L)) === 2L, "pad must not equal a genuine '' token")
    assert(got((6L, 1L)) === 4L, "exact duplicate keeps the cnt>=2 depth")

    // parametric cap: a planted 55-token duplicated run is invisible to
    // the 16-cap engine but exact at cap 64 / threshold 50 — the
    // published Lee-et-al. number
    val run = (1 to 55).map(i => s"d$i").mkString(" ")
    val long = Seq(
      (10L, "alpha " + run),
      (11L, run + " omega"),
      (12L, "unrelated words only here")
    ).toDF("doc_id", "text")
    val ex50 = SuffixOps.saDupExtents(long, 50, cap = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ex50.toSet === Set((10L, 2L, 56L, 55L), (11L, 1L, 55L, 55L)),
      s"55-token planted run must surface whole at threshold 50: ${ex50.toSeq}")
    // and the threshold is validated against the cap
    intercept[IllegalArgumentException] {
      SuffixOps.saDupExtents(long, 50)
    }
    // removal at the same threshold excises exactly the run
    val rm = SuffixOps.saRemoveSpans(long, 50, cap = 64).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rm(10L) === ((56L, 55L, 1L)))
    assert(rm(11L) === ((56L, 55L, 1L)))
    assert(rm(12L) === ((4L, 0L, 4L)))
  }

  test("sa decontaminate: only cross-side extents report; overlapping islands cover exactly") {
    val spark2 = spark
    import spark2.implicits._
    def toks(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
    // benchmark side: doc_id % BenchMod == 0. Doc 0 holds the 16-gram
    // w1..w16, doc 7 holds w5..w20 — so train doc 1 (w1..w20) qualifies
    // at start positions 1 and 5 ONLY (its windows @2..@4 exist nowhere
    // on the benchmark side): two islands whose token ranges [1,16] and
    // [5,20] OVERLAP. Exact union coverage = 20, naive sum = 32 — the
    // lag recurrence must report 20. Train doc 2 repeats doc 3's text
    // verbatim (a TRAIN-side duplicate): contaminated by nothing
    // benchmark-side, so it must be ABSENT from the report.
    val docs = Seq(
      (0L, toks(1, 16)),            // benchmark
      (7L, toks(5, 20)),            // benchmark
      (1L, toks(1, 20)),            // train: two overlapping extents
      (2L, toks(100, 140)),         // train dup pair — same side only
      (3L, toks(100, 140)),
      (4L, toks(200, 210))          // train, clean, too short anyway
    ).toDF("doc_id", "text").localCheckpoint(true)
    val got = SuffixOps.saDecontaminate(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set(1L),
      s"only the cross-side doc reports (train-side dups never do): $got")
    assert(got(1L) === ((2L, 20L, 16L)),
      s"overlapping islands must union to exact coverage 20: ${got(1L)}")
    // benchmark docs never report themselves
    assert(!got.contains(0L) && !got.contains(7L))
  }

  test("pca: integer power iterate aligns with the double reference; projection laws") {
    val (e, lam) = Similarity.pcaEigen(emb)
    assert(lam > 0, s"gram top eigenvalue must be positive, got $lam")
    assert(e.sum >= 0, "sign convention: component sum >= 0")
    // direction agreement with the 500-iteration double power method
    val d = Similarity.Dim
    val gram = Array.ofDim[Double](d, d)
    Similarity.gramMatrix(emb).collect().foreach { r =>
      val (i, j, g) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toDouble)
      gram(i)(j) = g; gram(j)(i) = g
    }
    val (_, ref) = Similarity.gramTopEigen(gram)
    val en = math.sqrt(e.map(v => v.toDouble * v).sum)
    val cos = math.abs(e.zip(ref).map { case (a, b) => a / en * b }.sum)
    assert(cos > 0.99, s"integer iterate diverged from double reference: cos=$cos")

    // top-2: second direction orthogonal to the first, positive spectrum,
    // and aligned with the double-deflation reference
    val (_, e2, _, lam2) = Similarity.pcaEigenPair(emb)
    assert(lam2 > 0)
    // ref is the converged unit top eigenvector; l1 = refᵀ G ref
    val l1 = ref.indices.map(i =>
      ref(i) * ref.indices.map(j => gram(i)(j) * ref(j)).sum).sum
    val defl = Array.tabulate(d, d)((i, j) => gram(i)(j) - l1 * ref(i) * ref(j))
    val (_, ref2) = Similarity.gramTopEigen(defl)
    val n2 = math.sqrt(e2.map(v => v.toDouble * v).sum)
    val cos2 = math.abs(e2.zip(ref2).map { case (a, b) => a / n2 * b }.sum)
    assert(cos2 > 0.99, s"second direction diverged from double deflation: cos=$cos2")
    val o12 = e.zip(e2).map { case (a, b) => (a / 1024) * (b / 1024) }.sum
    assert(math.abs(o12) < (1L << 30), s"e1·e2 not orthogonal: $o12")

    val proj = Similarity.pcaProject(emb).collect()
    assert(proj.map(_.getLong(1)).sum === emb.count(), "labels must partition the corpus")
    proj.foreach { r =>
      val (n, s, mean, mn, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(mean === s / n)
      assert(mn <= mean && mean <= mx)
    }
  }
}
