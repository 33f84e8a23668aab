package graft

import graft.ext.{Dedup, Multimodal, Similarity}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Extension-operator semantics: LSH paths must agree with their exact
  * counterparts on real data; native expressions must be bit-identical to
  * their HOF reference formulations. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(sf("documents")).cache()
  lazy val emb = spark.read.parquet(sf("embeddings")).cache()

  test("minhash-LSH near-dup pairs == exact jaccard pairs on sf0.001") {
    val sh = Dedup.hashedShingles(docs, "doc_id", "text", 3)
    val exact = Dedup.jaccardPairs(sh, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashDupPairs(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash flags the planted near-dups with small hamming distance") {
    val sh = Dedup.hashedShingles(docs, "doc_id", "text", 3)
    val planted = Dedup.jaccardPairs(sh, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashDupPairs(docs, "doc_id", "text",
        maxDist = 7, nChunks = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every planted textual near-dup is a simhash near-dup (banding is
    // exact for hamming <= 7; planted pairs measure <= 7 on this fixture)
    assert(planted.nonEmpty && planted.subsetOf(sim))
  }

  test("default 4x16-bit simhash banding is exact for hamming <= 3") {
    // pigeonhole: with 4 chunks, every pair within distance 3 collides on
    // some chunk — so the default banding must equal the wide 8-chunk
    // result filtered to hamming <= 3 (both verify exactly post-collision)
    val wide = Dedup.simhashDupPairs(docs, "doc_id", "text",
        maxDist = 7, nChunks = 8)
      .where(col("hamming") <= 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val dflt = Dedup.simhashDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(dflt == wide)
    assert(dflt.nonEmpty, "fixture should contain hamming<=3 near-dups")
  }

  test("Manku combination banding is exact for hamming <= 3 (scale path)") {
    // same pigeonhole, bigger buckets: differences within distance 3 touch
    // at most 3 of the 6 blocks, so some C(6,3) combination is untouched
    // and the pair collides in that table — output must equal the chunked
    // default (both verify exact Hamming post-collision)
    val dflt = Dedup.simhashDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val manku = Dedup.simhashDupPairsAtScale(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(manku == dflt)
    assert(manku.nonEmpty, "fixture should contain hamming<=3 near-dups")
  }

  test("portable-fingerprint banding equals brute-force all-pairs hamming") {
    // the oracle-pinned doc_simhash_pairs path: combination banding over
    // portableSimhash64 must be EXACTLY the <=3 pair set a brute-force
    // all-pairs scan of the same fingerprints produces (pigeonhole recall
    // + exact verify ⇒ zero margin either way), and must recover the
    // planted textual near-dups that sit within radius
    val sim = Dedup.portableSimhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
    val brute = (for {
      (da, sa) <- sim; (db, sb) <- sim
      if da < db && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (da, db)).toSet
    val banded = Dedup.simhashDupPairsAtScalePortable(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded == brute)
    assert(banded.nonEmpty, "fixture should contain hamming<=3 near-dups")
  }

  test("BPE training is deterministic and application resolves chained overlaps") {
    // word dict: aa×2, ab×1, aaaa×1. Round 1: pair (a,a) counts 2+3=5 >
    // (a,b)=1 → merge (a,a). Round 2: (aa,aa)=1 ties (a,b)=1 → min-left
    // tie-break picks (a,b). Round 3: (aa,aa). Applying to "aaaa"
    // exercises the chained-overlap case the multi-pass replace exists
    // for: " a a a a " → " aa aa " → " aaaa " = ONE token.
    val df = Seq((1L, "aa aa ab"), (2L, "aaaa")).toDF("doc_id", "text")
    val merges = graft.ext.Bpe.trainMerges(df, "text", m = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "aa")))
    val tc = graft.ext.Bpe.tokenCounts(df, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toSet
    assert(tc == Set((1L, 3L, 3L), (2L, 1L, 1L)))
  }

  test("BM25 top-k: tf/dl trade-off ranks right, absent terms score nothing") {
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "b c c")).toDF("id", "text")
    val out = graft.ext.TextAnalysis.bm25TopK(df, "id", "text",
        Seq(1 -> Seq("a"), 2 -> Seq("b", "c")), topK = 10)
      .as[(Int, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // query 'a': doc 1 (tf=2) must outrank doc 2 (tf=1, shorter);
    // doc 3 has no 'a' and must be ABSENT, not zero-scored
    assert(out(1).map(r => (r._2, r._3)) == Seq((1, 1L), (2, 2L)))
    assert(out(1).forall(_._4 > 0))
    assert(out(1)(0)._4 > out(1)(1)._4)
    // multi-term query sums contributions: doc 3 (b + c·2) tops b+c
    assert(out(2).map(_._3) == Seq(3L, 1L, 2L) ||
      out(2).map(_._3).head == 3L)
    assert(out(2).length == 3)
    // partition invariance: the decimal-sum + rounded contributions make
    // scores independent of layout
    val rep = graft.ext.TextAnalysis.bm25TopK(df.repartition(7), "id", "text",
        Seq(1 -> Seq("a"), 2 -> Seq("b", "c")), topK = 10)
      .as[(Int, Int, Long, Double)].collect().toSet
    assert(rep == out.values.flatten.toSet)
  }

  test("CJK fallback segmentation: per-char tokens, ASCII counts untouched") {
    val df = Seq(
      (1L, "hello world"),                       // pure ASCII: no-op
      (2L, "你好世界"),          // Han, no whitespace
      (3L, "abcカナdef"),                // katakana embedded in ASCII
      (4L, "한국어 ok")              // hangul + ASCII word
    ).toDF("id", "text")
    def n(c: org.apache.spark.sql.Column) =
      size(regexp_extract_all(c, lit("\\S+"), lit(0)))
    val out = df.select(col("id"), n(col("text")).as("ws"),
        n(graft.ext.TextAnalysis.segmentCjk(col("text"))).as("seg"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2, 2)), "ASCII text must be untouched")
    assert(out(2L) == ((1, 4)), "Han doc was ONE ws token, 4 chars")
    assert(out(3L) == ((1, 4)))  // abc, KA, NA, def
    assert(out(4L) == ((2, 4)))  // HAN, GUK, EO, ok
  }

  test("type-level BPE apply == row-local; batched training B=1 == sequential") {
    val df = Seq((1L, "aa aa ab"), (2L, "aaaa"),
      (3L, "ab aa ba aaaa aab baa")).toDF("doc_id", "text")
    val seqM = graft.ext.Bpe.trainMerges(df, "text", m = 5)
    // batch size 1 must reproduce the sequential algorithm exactly —
    // same per-round argmax, same (count desc, l, r) tie order
    assert(graft.ext.Bpe.trainMergesBatched(df, "text", m = 5,
      batchSize = 1) == seqM)
    // the typed path (dict-once apply + occurrence join-back) is the
    // same function as the row-local chain for any merge list; batch=2
    // forces multiple checkpointed projection batches
    val rl = graft.ext.Bpe.tokenCounts(df, "doc_id", "text", seqM)
      .as[(Long, Long, Long)].collect().toSet
    val tl = graft.ext.Bpe.tokenCountsTyped(df, "doc_id", "text", seqM,
        batch = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(tl == rl, "typed apply != row-local apply")
    // B>1 batched mode: deterministic across runs, and its merges still
    // compress (typed tokens strictly below the no-merge word-symbol
    // count on this fixture)
    val b1 = graft.ext.Bpe.trainMergesBatched(df, "text", m = 6, batchSize = 3)
    assert(b1 ==
      graft.ext.Bpe.trainMergesBatched(df, "text", m = 6, batchSize = 3))
    assert(b1.nonEmpty && b1.distinct.length == b1.length)
    val none = graft.ext.Bpe.tokenCountsTyped(df, "doc_id", "text", Nil)
      .agg(sum(col("bpe_tokens"))).as[Long].head()
    val after = graft.ext.Bpe.tokenCountsTyped(df, "doc_id", "text", b1)
      .agg(sum(col("bpe_tokens"))).as[Long].head()
    assert(after < none, "batched merges failed to compress")
    // and on the real corpus fixture: typed == row-local again
    val mr = graft.ext.Bpe.trainMerges(docs, "text", m = 4)
    val rlD = graft.ext.Bpe.tokenCounts(docs, "doc_id", "text", mr)
      .as[(Long, Long, Long)].collect().toSet
    val tlD = graft.ext.Bpe.tokenCountsTyped(docs, "doc_id", "text", mr)
      .as[(Long, Long, Long)].collect().toSet
    assert(tlD == rlD)
  }

  test("substring strip keeps the earliest occurrence, rebuilds the rest") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val a = "alpha beta gamma " + shared + " delta"   // 16 tokens, keeper
    val b = "x " + shared + " y z"                    // 15 tokens, stripped
    val c = "unrelated words only nothing here at all repeated never once"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = Dedup.substringStrip(df, "doc_id", "text", 8)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 is the keeper of every duplicated window: nothing removed.
    // doc 2 loses exactly the 12 shared tokens (positions 1..12),
    // keeping "x y z". doc 3 untouched.
    assert(out(0) == ((1L, 16L, 0L, md5hex(a))))
    assert(out(1) == ((2L, 15L, 12L, md5hex("x y z"))))
    assert(out(2) == ((3L, 10L, 0L, md5hex(c))))
  }

  test("substring strip: keeper protection survives chained cross-doc overlaps") {
    // the r10-review counterexample: keeper("a b") lives in d1, so d2's
    // "a b" is removable and covers d2 positions {0,1}; but d2 is the
    // KEEPER of "b c" (positions {1,2}) — without protection, stripping
    // {0,1} would destroy "b c" in its own keeper doc and the run would
    // survive NOWHERE. Protection carves the keeper occurrence out of
    // the removal, so d2 keeps "b c" and only loses position 0.
    val df = Seq((1L, "a b"), (2L, "a b c"), (3L, "b c")).toDF("doc_id", "text")
    val out = Dedup.substringStrip(df, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0) == ((1L, 2L, 0L, md5hex("a b"))))
    assert(out(1) == ((2L, 3L, 1L, md5hex("b c"))))
    assert(out(2) == ((3L, 2L, 2L, null)))
  }

  test("substring strip: row-local scan ≡ the relational coverage pipeline") {
    // the r17 rewrite replaced the covered-position explode
    // (sequence(pos, pos+k-1) → (doc,pos) aggregate → token-level join →
    // sorted-struct fold) with the SubstringStripScan per-doc sweep;
    // rebuild the OLD pipeline inline and assert identical output rows
    // on the real fixture WITH the declared query's plant (offset-
    // shifted full-doc duplicates) — the k-means-rewrite proof
    // discipline.
    val base = docs.select(col("doc_id"), col("text"))
    val planted = base.where(col("doc_id") % 37 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("planted leak prefix alpha beta "), col("text"))
          .as("text"))
    val df = base.unionByName(planted)
    val k = 8
    val windows = Dedup.windowHashes(df, "doc_id", "text", k)
    val keepers = windows.groupBy(col("whash"))
      .agg(count(lit(1)).as("_c"),
        min(struct(col("doc"), col("pos"))).as("_k"))
      .where(col("_c") >= 2)
      .select(col("whash"), col("_k.doc").as("_kdoc"),
        col("_k.pos").as("_kpos"))
    val keyed = windows.join(keepers, "whash")
      .select(col("doc"), col("pos"),
        (col("doc") === col("_kdoc") && col("pos") === col("_kpos"))
          .as("_isk"))
    val covered = keyed
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"),
        col("_isk"))
      .groupBy(col("doc"), col("pos"))
      .agg(max(when(col("_isk"), 1).otherwise(0)).as("_p"),
        max(when(!col("_isk"), 1).otherwise(0)).as("_r"))
      .where(col("_r") === 1 && col("_p") === 0)
      .select(col("doc"), col("pos"))
      .withColumn("_cov", lit(1))
    val toks = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    val tokens = df.select(col("doc_id").as("doc"), toks.as("_t"))
      .select(col("doc"), posexplode(col("_t")).as(Seq("pos", "tok")))
    val reference = tokens.join(covered, Seq("doc", "pos"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("_cov"), lit(0))).cast("long").as("removed_tokens"),
        concat_ws(" ", transform(
          sort_array(collect_list(when(col("_cov").isNull,
            struct(col("pos"), col("tok"))))),
          s => s.getField("tok"))).as("_kept"))
      .select(col("doc"), col("n_tokens"), col("removed_tokens"),
        when(col("n_tokens") > col("removed_tokens"), md5(col("_kept")))
          .as("kept_md5"))
      .as[(Long, Long, Long, String)].collect().toSet
    val rewritten = Dedup.substringStrip(df, "doc_id", "text", k)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(reference.nonEmpty &&
      reference.exists(_._3 > 0), "plant must produce stripped docs")
    assert(rewritten == reference)
  }

  test("html extraction keeps the article body and drops the chrome") {
    val html = "<html><head><title>T</title><style>p {c:1}</style></head>" +
      "<body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<div><p>The actual article body has many informative words in " +
      "plain prose form.</p></div>" +
      "<footer>Copyright 2024 Example. All rights reserved.</footer>" +
      "<script>var x = {a:1};</script></body></html>"
    val out = graft.ext.HtmlExtract.extract(
      Seq((7L, html)).toDF("doc_id", "html"), "doc_id", "html")
    val row = out.select("doc", "kept_blocks", "text").as[(Long, Long, String)].head()
    assert(row._1 == 7L && row._2 == 1L)
    assert(row._3 ==
      "The actual article body has many informative words in plain prose form.")
    // the extracted text column feeds the existing quality gates directly
    val q = graft.ext.TextAnalysis.qualityScore(
      out.select(col("doc"), col("text")), "doc", "text")
    assert(q.count() == 1L)
  }

  test("substring dedup finds offset-shifted verbatim runs as merged spans") {
    // the leak class fixed-boundary chunk dedup misses: a 12-token
    // verbatim run at DIFFERENT offsets in two docs. All five of its
    // 8-token windows are duplicated and must merge into ONE span per
    // doc covering exactly the run — nothing from the surrounding text.
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val a = "alpha beta gamma " + shared + " delta"
    val b = "x " + shared + " y z"
    val c = "unrelated words only nothing here at all repeated never once"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(df, "doc_id", "text", 8)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(spans == Set((1L, 3, 14, 5L), (2L, 1, 12, 5L)))
  }

  test("dim-truncation audit: prefix-cosine single pass ≡ five sliced cosineTopK passes") {
    // the r17 emb_dim_truncate rewrite: one PrefixCosines pair pass +
    // four rank windows must reproduce the five-pass sliced formulation
    // exactly (the declared query's old shape, rebuilt inline here).
    val cuts = Seq(8, 16, 32, 64)
    val q = emb.where(col("vec_id") < 32)
    def proj(df: org.apache.spark.sql.DataFrame, d: Int) =
      df.select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding"))
    val full = Similarity.cosineTopK(emb, q, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("candidate_id"))
      .localCheckpoint(true)
    val reference = cuts.map { d =>
      Similarity.cosineTopK(proj(emb, d), proj(q, d), "vec_id",
          "embedding", k = 10)
        .select(col("query_id"), col("candidate_id"))
        .join(full, Seq("query_id", "candidate_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(d.toLong).as("dims"), col("hits"))
    }.reduce(_ unionByName _)
      .select(col("dims"), col("hits"),
        round(col("hits").cast("double") / lit(320.0), 6).as("recall_at_10"))
      .as[(Long, Long, Double)].collect().toSet
    // the rewritten declared query over the same fixture dir
    val rewritten = SparkEntry.queries("emb_dim_truncate")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect().toSet
    assert(reference.exists(_._2 > 0), "fixture must produce hits")
    assert(rewritten == reference)
  }

  test("exact pruned IVF/PQ search == brute force on adversarial uniform data") {
    // the embeddings fixture is near-orthogonal uniform noise — ANN's
    // statistically hardest case, where the triangle-inequality bound
    // degrades toward a full scan. Exactness must hold REGARDLESS: the
    // pruned probes return brute-force top-k bit-for-bit.
    val queries = emb.where(col("vec_id") >= 32 && col("vec_id") < 40)
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 6)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    val cents = Similarity.learnCentroidArrays(emb, "vec_id", "embedding", 16, 2)
    val pruned = Similarity.ivfTopKExact(emb, queries, "vec_id", "embedding",
        k = 6, nProbe = 4, cents)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    assert(pruned == exact, "ivfTopKExact != brute force")
    val p = "/tmp/graft_test_exact_pq_idx"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", p,
      nLists = 16, m = 16, pqK = 64, iters = 2)
    val pq = Similarity.ivfPqProbeExact(spark, p, queries, "vec_id",
        "embedding", k = 6, nProbe = 4, rerankR = 40)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    assert(pq == exact, "ivfPqProbeExact != brute force")
  }

  test("pre-radii IVF-PQ index degrades to no-pruning instead of failing") {
    // an index persisted before radii.json existed (or built externally)
    // must still append and probe-exactly — with all-2.0 radii (no
    // pruning), not an exception (r10 advice).
    val p = "/tmp/graft_test_noradii_pq_idx"
    val head = emb.where(col("vec_id") < 48)
    Similarity.buildIvfPqIndex(head, "vec_id", "embedding", p,
      nLists = 8, m = 16, pqK = 64, iters = 2)
    val fs = new org.apache.hadoop.fs.Path(s"$p/radii.json")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$p/radii.json"), false))
    val stats = Similarity.ivfPqAppend(spark,
      p, emb.where(col("vec_id") >= 48), "vec_id", "embedding")
    assert(stats.nAppended > 0)
    // radii.json regenerated by the append (max of 2.0 defaults and the
    // appended batch — still a valid, if loose, completeness bound)
    assert(Similarity.loadRadii(spark, p).forall(r => r >= 0.0 && r <= 2.0))
    val queries = emb.where(col("vec_id") >= 32 && col("vec_id") < 36)
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    val pq = Similarity.ivfPqProbeExact(spark, p, queries, "vec_id",
        "embedding", k = 5, nProbe = 4, rerankR = 40)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    assert(pq == exact, "no-radii ivfPqProbeExact != brute force")
  }

  test("exact pruned search: the bound actually prunes on clustered data") {
    // tight planted clusters — the regime the pruning exists for. Members
    // are deterministic small perturbations of 4 base embeddings; every
    // query's true top-k sits inside its home cluster, so for every OTHER
    // list the triangle-inequality bound ||q^ - a^_L|| > tau + r_L must
    // exclude the list outright (phase 2 scans nothing extra), while the
    // declared output still equals brute force bit-for-bit.
    val bases = emb.where(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    val rows = for {
      c <- 0 until 4; i <- 0 until 40
    } yield (c * 100L + i,
      bases(c).zipWithIndex.map { case (x, d) =>
        x * (1.0 + 0.002 * (((i * 31 + d * 7) % 11) - 5)) }.toSeq)
    val clustered = rows.toDF("vec_id", "embedding")
    val queries = clustered.where(col("vec_id") % 100 === 0)
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    val exact = Similarity.cosineTopK(clustered, queries, "vec_id",
        "embedding", 5)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect()
    val cents = Similarity.learnCentroidArrays(clustered, "vec_id",
      "embedding", 4, 3)
    val pruned = Similarity.ivfTopKExact(clustered, queries, "vec_id",
        "embedding", k = 5, nProbe = 1, cents)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect()
    assert(pruned.toSet == exact.toSet, "clustered ivfTopKExact != brute force")
    // replay the bound math: per query, every non-home list is excludable
    val radii = Similarity.listRadii(clustered, "vec_id", "embedding", cents)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val anchors = cents.map(unit)
    val kth = exact.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(_._4).min }
    val qVecs = queries.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    var excludable = 0; var other = 0
    for ((qid, qv) <- qVecs) {
      val qh = unit(qv.toArray)
      val tau = math.sqrt(2.0 * (1.0 - kth(qid)) + 4e-6)
      val home = anchors.indices.minBy { l =>
        val d = qh.zip(anchors(l)).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, l)
      }
      for (l <- anchors.indices if l != home) {
        other += 1
        val qa = math.sqrt(
          qh.zip(anchors(l)).map { case (a, b) => (a - b) * (a - b) }.sum)
        if (qa > tau + radii.getOrElse(l, 2.0)) excludable += 1
      }
    }
    // k-means can split/merge a planted cluster (leaving one wide or
    // empty list whose radius never prunes), so demand MOST lists
    // excludable rather than all — a broken bound would exclude none
    assert(excludable.toDouble / other >= 0.75,
      s"expected most non-home lists excludable, got $excludable/$other")
  }

  test("persisted IVF index: probe equals in-memory search and prunes partitions") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 8)
    val path = "/tmp/graft_test_ivf_index"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", path,
      nLists = 16, iters = 3)
    val probed = Similarity.ivfProbeIndex(spark, path, queries,
      "vec_id", "embedding", k = 5, nProbe = 4)
    // identical centroids (partitioning-independent training) => the
    // index probe must return exactly the in-memory learned search
    val mem = Similarity.ivfTopKLearned(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 16, nProbe = 4, iters = 3)
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    assert(probed.select(cols.map(col): _*).exceptAll(
      mem.select(cols.map(col): _*)).isEmpty)
    assert(mem.select(cols.map(col): _*).exceptAll(
      probed.select(cols.map(col): _*)).isEmpty)
    // the probe scans only the probed lists' directories: the corpus scan
    // carries a partition filter on `list`
    val plan = probed.queryExecution.executedPlan.toString
    val partitionFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(partitionFilters.exists(_.contains("list")),
      s"expected partition pruning on list in:\n${plan.take(1500)}")
  }

  test("ivfAppend grows the index without retraining: probe parity + drift stat") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.where(col("vec_id") < 150)
    val batchB = emb.where(col("vec_id") >= 150 && col("vec_id") < 180)
    val batchC = emb.where(col("vec_id") >= 180)
    val queries = emb.where(col("vec_id") < 8)
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    // one append vs two appends of the same rows: bit-identical probes
    // (assignment uses the stored centroids either way)
    val p1 = "/tmp/graft_test_ivf_append1"
    val p2 = "/tmp/graft_test_ivf_append2"
    for (p <- Seq(p1, p2)) {
      val d = new java.io.File(p)
      if (d.exists()) { // clean stale corpus from previous runs
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(d)
      }
      Similarity.buildIvfIndex(base, "vec_id", "embedding", p,
        nLists = 8, iters = 2)
    }
    val s1 = Similarity.ivfAppend(spark, p1, batchB.union(batchC),
      "vec_id", "embedding")
    val s2a = Similarity.ivfAppend(spark, p2, batchB, "vec_id", "embedding")
    val s2b = Similarity.ivfAppend(spark, p2, batchC, "vec_id", "embedding")
    assert(s1.nAppended == s2a.nAppended + s2b.nAppended)
    assert(s1.nBefore == 150 && s2a.nBefore == 150)
    val q1 = Similarity.ivfProbeIndex(spark, p1, queries,
      "vec_id", "embedding", k = 5, nProbe = 3)
    val q2 = Similarity.ivfProbeIndex(spark, p2, queries,
      "vec_id", "embedding", k = 5, nProbe = 3)
    assert(q1.select(cols.map(col): _*).exceptAll(
      q2.select(cols.map(col): _*)).isEmpty)
    assert(q2.select(cols.map(col): _*).exceptAll(
      q1.select(cols.map(col): _*)).isEmpty)
    // appended vectors are discoverable: probing with an appended
    // vector's copy (fresh id) returns the appended row at cosine 1
    val twin = batchB.limit(1)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val twinId = batchB.limit(1).select("vec_id").as[Long].head()
    val found = Similarity.ivfProbeIndex(spark, p1, twin,
        "vec_id", "embedding", k = 1, nProbe = 1)
      .select("candidate_id").as[Long].head()
    assert(found == twinId, "appended vector not discoverable after append")
    // drift stat: same-distribution appends barely move the mean distance;
    // far outliers must raise it
    assert(s1.meanDistBefore > 0 && s1.driftRatio < 1.5, s1.toString)
    val dims = emb.select(size(col("embedding"))).as[Int].head()
    val outliers = spark.range(5).select(
      (col("id") + 900000).as("vec_id"),
      transform(sequence(lit(1), lit(dims)), _ => lit(1000.0)).as("embedding"))
    val s3 = Similarity.ivfAppend(spark, p1, outliers, "vec_id", "embedding")
    assert(s3.meanDistAfter > s3.meanDistBefore,
      s"outlier append must raise the drift stat: $s3")
  }

  test("ivfRetrainDrifted re-clusters only drifted lists; exact probe parity; untouched files intact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val p = "/tmp/graft_test_ivf_retrain"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(p))
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", p,
      nLists = 8, iters = 2)
    // drifted wave: +3.0 on every dim, far from every trained centroid —
    // its mass concentrates in the few lists pointing that way
    val shifted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => x + lit(3.0d)).as("embedding"))
    Similarity.ivfAppend(spark, p, shifted, "vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 8)
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    def exhaustive() = Similarity.ivfProbeIndex(spark, p, queries,
        "vec_id", "embedding", k = 5, nProbe = 8)
      .select(cols.map(col): _*).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val probeBefore = exhaustive()
    val rowsBefore = spark.read.parquet(s"$p/corpus").count()
    def listFiles(l: Int): Set[String] = {
      val d = new java.io.File(s"$p/corpus/list=$l")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => s"${f.getName}:${f.lastModified}").toSet
    }
    val filesBefore = (0 until 8).map(l => l -> listFiles(l)).toMap
    val rt = Similarity.ivfRetrainDrifted(spark, p, "vec_id", "embedding",
      bound = 1.5, iters = 2)
    // incremental: some lists drifted, not all; drift reduced
    assert(rt.drifted.nonEmpty, "no drifted list found")
    assert(rt.drifted.length < rt.nLists, s"all lists drifted: $rt")
    assert(rt.meanDriftedAfter < rt.meanDriftedBefore, rt.toString)
    // untouched lists' files are byte-untouched (name + mtime)
    val untouched = (0 until 8).filterNot(rt.drifted.contains)
    assert(untouched.nonEmpty)
    untouched.foreach { l =>
      assert(listFiles(l) == filesBefore(l), s"untouched list $l rewritten")
    }
    // rows conserved, and the drifted ids' row total equals the
    // accounting (rows only moved WITHIN the drifted id set)
    assert(spark.read.parquet(s"$p/corpus").count() == rowsBefore)
    val driftedRows = spark.read.parquet(s"$p/corpus")
      .where(col("list").isin(rt.drifted.map(Integer.valueOf): _*)).count()
    assert(driftedRows == rt.rowsReclustered,
      s"drifted rows $driftedRows != accounting ${rt.rowsReclustered}")
    // exhaustive probe parity: assignment is routing metadata, never
    // scoring — re-clustering cannot change exact results
    assert(exhaustive() == probeBefore, "exact probe changed after retrain")
    // a second retrain at the same bound is a no-op or keeps shrinking;
    // bound below 0 forces "everything drifted" to be rejected upstream
    val rt2 = Similarity.ivfRetrainDrifted(spark, p, "vec_id", "embedding",
      bound = 100.0, iters = 2)
    assert(rt2.drifted.isEmpty && rt2.rowsReclustered == 0L,
      s"absurd bound must select nothing: $rt2")
  }

  test("topPairsLsh recovers planted duplicates deterministically, no all-pairs stage") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // exact duplicates have identical sign-LSH signatures in every band,
    // so candidate generation is deterministic (p = 1), independent of
    // the hyperplane draw; background pairs at this n stay below ~0.6
    val dups = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").union(dups)
    val q = Similarity.topPairsLsh(corpus, "vec_id", "embedding",
      topN = 5, minCosine = 0.9, bits = 12, bands = 16)
    val got = q.select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    val expected = (0L until 5L).map(i => (i, i + 10000L, 1.0)).toSet
    assert(got == expected, s"got=$got")
    // the executed plan is hash/sort-merge equi-join machinery only —
    // the whole point vs topPairs is that no all-pairs stage exists
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan.take(1200))
  }

  test("ivfPqAppend: encode-on-append keeps probe parity, exact rerank, drift stat") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.where(col("vec_id") < 150)
    val batchB = emb.where(col("vec_id") >= 150 && col("vec_id") < 180)
    val batchC = emb.where(col("vec_id") >= 180)
    val queries = emb.where(col("vec_id") < 8)
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    val p1 = "/tmp/graft_test_ivfpq_append1"
    val p2 = "/tmp/graft_test_ivfpq_append2"
    for (p <- Seq(p1, p2)) {
      val d = new java.io.File(p)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(d)
      }
      Similarity.buildIvfPqIndex(base, "vec_id", "embedding", p,
        nLists = 8, m = 16, pqK = 64, iters = 2)
    }
    // one append vs two appends of the same rows: bit-identical ADC
    // probes (assignment + encoding use the STORED centroids/codebooks
    // either way — appended rows are encoded exactly as a rebuild handed
    // the same codebooks would encode them)
    val s1 = Similarity.ivfPqAppend(spark, p1, batchB.union(batchC),
      "vec_id", "embedding")
    val s2a = Similarity.ivfPqAppend(spark, p2, batchB, "vec_id", "embedding")
    val s2b = Similarity.ivfPqAppend(spark, p2, batchC, "vec_id", "embedding")
    assert(s1.nAppended == s2a.nAppended + s2b.nAppended)
    assert(s1.nBefore == 150 && s2a.nBefore == 150)
    val q1 = Similarity.ivfPqProbeIndex(spark, p1, queries,
      "vec_id", "embedding", k = 10, nProbe = 3)
    val q2 = Similarity.ivfPqProbeIndex(spark, p2, queries,
      "vec_id", "embedding", k = 10, nProbe = 3)
    assert(q1.select(cols.map(col): _*).exceptAll(
      q2.select(cols.map(col): _*)).isEmpty)
    assert(q2.select(cols.map(col): _*).exceptAll(
      q1.select(cols.map(col): _*)).isEmpty)
    // the appended rows joined the re-rank corpus too: exhaustive-routing
    // IVFADC+R over the grown index reproduces brute-force exact top-k
    // over the grown corpus bit-for-bit
    val rr = Similarity.ivfPqProbeRerank(spark, p1, queries,
        "vec_id", "embedding", k = 5, nProbe = 8, rerankR = 100000)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    val exact = Similarity.cosineTopK(base.union(batchB).union(batchC),
        queries, "vec_id", "embedding", 5)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    assert(rr == exact, "post-append exhaustive IVFADC+R != exact top-k")
    // same drift signal as the uncompressed index
    assert(s1.meanDistBefore > 0 && s1.driftRatio < 1.5, s1.toString)
  }

  test("IVF-PQ index: scans codes not vectors, prunes partitions, ranks usefully") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 8)
    val path = "/tmp/graft_test_ivfpq_index"
    // 4-dim subspaces with 64 codes: uniform random vectors (this
    // fixture) are PQ's hardest case — fine granularity keeps ADC
    // ranking faithful; still 16 bytes of codes vs 256 of floats
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", path,
      nLists = 8, m = 16, pqK = 64, iters = 2)
    val probed = Similarity.ivfPqProbeIndex(spark, path, queries,
      "vec_id", "embedding", k = 10, nProbe = 4)
    // deterministic: same index, same probe, bit-identical result
    val cols = Seq("query_id", "rank", "candidate_id", "cosine")
    val r1 = probed.select(cols.map(col): _*)
      .as[(Long, Int, Long, Double)].collect().toSet
    val r2 = Similarity.ivfPqProbeIndex(spark, path, queries,
        "vec_id", "embedding", k = 10, nProbe = 4)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    assert(r1 == r2)
    // the corpus scan must read codes/_rn, never the float vector, and
    // must keep the static partition pruning on list
    val plan = probed.queryExecution.executedPlan.toString
    val pqScan = plan.linesIterator.find(_.contains("corpus_pq"))
      .getOrElse(plan)
    assert(!plan.contains("ReadSchema: struct<embedding"),
      s"PQ probe must not read float vectors:\n${pqScan.take(800)}")
    assert("PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan)
      .exists(_.group(1).contains("list")),
      s"expected partition pruning on list in:\n${plan.take(1500)}")
    // ADC ranking is useful: with exhaustive routing (nProbe = nLists,
    // isolating pure quantization error from IVF routing) the exact
    // cosine top-1 lands in the PQ top-10 for most queries
    val full = Similarity.ivfPqProbeIndex(spark, path, queries,
        "vec_id", "embedding", k = 10, nProbe = 8)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 1)
      .select(col("query_id"), col("candidate_id"))
      .as[(Long, Long)].collect().toMap
    val pqTop = full.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    val hits = exact.count { case (q, c) => pqTop.getOrElse(q, Set.empty[Long]).contains(c) }
    assert(hits >= 6, s"exact top-1 in PQ top-10 for only $hits/8 queries")
    // IVFADC+R: exhaustive routing + a short-list covering the corpus
    // must reproduce the brute-force exact top-k bit-for-bit — the
    // re-rank stage's scoring is the same IEEE op sequence as cosineTopK
    val rr = Similarity.ivfPqProbeRerank(spark, path, queries,
        "vec_id", "embedding", k = 10, nProbe = 8, rerankR = 100000)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    val exactTopK = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 10)
      .select(cols.map(col): _*).as[(Long, Int, Long, Double)].collect().toSet
    assert(rr == exactTopK,
      s"exhaustive IVFADC+R != exact top-k (${rr.size} vs ${exactTopK.size} rows)")
  }

  test("approximate IVF/PQ probe operators keep recall above floors") {
    // the DECLARED emb_ivf_topk / emb_ivfpq_topk queries are now
    // guaranteed-exact (r10), so their recall is 1 by construction and
    // oracle-pinned; the recall floors move HERE, onto the approximate
    // library operators themselves (still the timed phase-1 of the exact
    // probes and the serving path). The uniform-random fixture is ANN's
    // statistically hardest case, where any 4-of-16-list probe must
    // trade recall (measured 0.6 at sf0.001) — a 0.9 floor in this
    // regime would pin fixture noise; the strict 0.9 routing-regression
    // guard lives in the clustered-regime test below.
    val queries = emb.where(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "candidate_id").as[(Long, Long)].collect().toSet
    val cents = Similarity.learnCentroidArrays(emb, "vec_id", "embedding", 16, 3)
    val ivf = Similarity.ivfTopKLearned(emb, queries, "vec_id", "embedding",
        k = 5, nLists = 16, nProbe = 4, precomputedCents = Some(cents))
      .select("query_id", "candidate_id").as[(Long, Long)].collect().toSet
    assert(ivf.intersect(exact).size.toDouble / exact.size >= 0.5)
    // IVFADC+R re-rank makes PQ recall IVF-routing-limited, not
    // quantization-limited: the short-list (R = 20×k over 12 probed
    // lists) recovers what routing admits
    val p = "/tmp/graft_test_recall_pq_idx"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", p,
      nLists = 16, m = 16, pqK = 64, iters = 2)
    val pq = Similarity.ivfPqProbeRerank(spark, p, queries, "vec_id",
        "embedding", k = 5, nProbe = 12, rerankR = 100)
      .select("query_id", "candidate_id").as[(Long, Long)].collect().toSet
    assert(pq.intersect(exact).size.toDouble / exact.size >= 0.9)
  }

  test("IVF routing recall >= 0.9 in the clustered regime (regression guard)") {
    // the strict floor r7 asked for, asserted where it is MEANINGFUL:
    // same planted-near-neighbor construction as ScaleSmoke's ann1m tier
    // (id ≡ 1 mod 100 is a ±0.01 perturbed copy of id−1, cosine ≈ 0.999)
    // at 20k vectors, probed with the DECLARED query's own shape
    // (nLists=16, nProbe=4). A routing regression — wrong centroid
    // assignment, wrong probe ordering, a broken nearestLists tie-break —
    // drops planted-neighbor recall well below 0.9; fixture noise cannot,
    // because the neighbor's list is essentially always probed first.
    val n = 20000L
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(when(pmod(col("id"), lit(100L)) === 1L, col("id") - 1)
            .otherwise(col("id")), i), lit(2001L)) - 1000L).cast("double") / 1000.0)
          + when(pmod(col("id"), lit(100L)) === 1L,
              (pmod(xxhash64(col("id"), i, lit(99L)), lit(21L)) - 10L).cast("double") / 1000.0)
            .otherwise(lit(0.0))).as("embedding")).cache()
    val queries = vecs.where(pmod(col("vec_id"), lit(100L)) === 1L &&
      col("vec_id") < 5000L)
    val nQueries = queries.count()
    val topk = Similarity.ivfTopKLearned(vecs, queries, "vec_id",
      "embedding", k = 10, nLists = 16, nProbe = 4)
    val hits = topk.where(col("candidate_id") === col("query_id") - 1)
      .select(countDistinct(col("query_id"))).as[Long].head()
    val recall = hits.toDouble / nQueries
    vecs.unpersist()
    assert(recall >= 0.9, s"clustered-regime IVF routing recall: $recall")
  }

  test("low-threshold LSH recall matches the banding formula's prediction") {
    // the natural-regime theory contract the emb_lsh_pairs gate carried
    // before r8 oracle-pinned it at >= 0.8: on a near-dup-free corpus
    // absolute recall of the exact top-20 pairs is LOW BY DESIGN (top
    // cosines ~0.45 ⇒ 1-(1-p^bits)^bands predicts ~0.1); the meaningful
    // check is measured ≈ expected within binomial slack — the operator
    // performs exactly as LSH theory says at whatever similarity level
    // the corpus offers.
    val bits = 10; val bands = 8
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lsh = Similarity.lshBucketedPairs(emb, "vec_id", "embedding",
        minCosine = 0.2, bits = bits, bands = bands)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact20 = Similarity.topPairs(emb, "vec_id", "embedding", 20)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    val measured = exact20.count(p => lsh.contains((p._1, p._2))).toDouble / 20
    val expected = exact20.map { p =>
      val c = math.max(-1.0, math.min(1.0, p._3))
      val pBit = 1.0 - math.acos(c) / math.Pi
      1.0 - math.pow(1.0 - math.pow(pBit, bits), bands)
    }.sum / 20
    assert(measured >= 0.5 * expected,
      s"measured recall $measured far below expected $expected")
  }

  test("exact dedup keeps deterministic keeper with count") {
    val dup = docs.select(col("doc_id"), lit("same").as("text"))
    val out = Dedup.exact(dup, Seq("text"), "doc_id")
    val (keeper, n) = out.select("doc_id", "n_copies").as[(Long, Long)].head()
    assert(keeper == 0L && n == docs.count())
  }

  test("exact-dup short-circuit clustering equals full-graph clustering") {
    // dedupClustersDistinct bands only distinct-content representatives;
    // its (doc, root) output must equal clustering the FULL near-dup pair
    // graph — on the real fixture (which carries exact copies AND
    // near-dup families) and on an adversarial copy-heavy mix
    val full = Dedup.dedupClusters(
      Dedup.jaccardPairs(Dedup.hashedShingles(docs, "doc_id", "text", 3), 0.5),
      "doc_a", "doc_b")
    val sc = Dedup.dedupClustersDistinct(docs, "doc_id", "text", 0.5)
    assert(sc.exceptAll(full).isEmpty && full.exceptAll(sc).isEmpty)
    // copy-heavy: 30 extra exact copies of doc 0 under fresh ids join
    // doc 0's cluster (or form one rooted at 0) without entering banding
    val copies = docs.where(col("doc_id") === 0L)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val mixed = docs.select(col("doc_id"), col("text")).unionByName(
      (1 to 30).map(i => copies.select((col("doc_id") + i).as("doc_id"),
        col("text"))).reduce(_ unionByName _))
    val scm = Dedup.dedupClustersDistinct(mixed, "doc_id", "text", 0.5)
    val fullm = Dedup.dedupClusters(
      Dedup.jaccardPairs(Dedup.hashedShingles(mixed, "doc_id", "text", 3), 0.5),
      "doc_a", "doc_b")
    assert(scm.exceptAll(fullm).isEmpty && fullm.exceptAll(scm).isEmpty)
    assert(scm.where(col("doc") > 100000L && col("root") =!= 0L).isEmpty,
      "planted copies must resolve to doc 0's cluster")
  }

  test("native dot product is bit-identical to the HOF fold") {
    val pairs = emb.limit(50).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("vid2"),
        col("embedding").cast("array<double>").as("w")))
    val diff = pairs.select(
        (VectorFunctions.dotNative(col("v"), col("w")) -
          Similarity.dotHof(col("v"), col("w"))).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff == 0.0)
    // HOF-equivalent null semantics: ragged lengths or null elements -> NULL
    val dirty = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val got = dirty.select(
      VectorFunctions.dotNative(col("a"), col("b")).as("n"),
      Similarity.dotHof(col("a"), col("b")).as("h")).collect()
    got.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("native shingle/minhash/band expressions are bit-identical to the HOF xxhash64 formulations") {
    // the formulations the native expressions replaced (Dedup.scala pre-r6):
    // every hash value must match so persisted band indexes, batch
    // operators, and streaming probes keep agreeing across the swap
    def hofShingles(words: org.apache.spark.sql.Column, n: Int) = {
      val idxs = when(size(words) >= n, sequence(lit(0), size(words) - n))
        .otherwise(array().cast("array<int>"))
      array_distinct(transform(idxs, i =>
        xxhash64((1 to n).map(k => element_at(words, i + k)): _*)))
    }
    def hofSig(shs: org.apache.spark.sql.Column, numHashes: Int) =
      array((0 until numHashes).map(i =>
        array_min(transform(shs, s => xxhash64(lit(i), s)))): _*)
    def hofBands(sig: org.apache.spark.sql.Column, bands: Int, rpb: Int) =
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(sig, b * rpb + 1, lit(rpb))))

    val staged = docs
      .select(col("doc_id"), split(col("text"), " ").as("_w"))
      .select(col("doc_id"), col("_w"),
        Dedup.shingleArray(col("_w"), 3).as("nat_shs"),
        hofShingles(col("_w"), 3).as("hof_shs"))
      .select(col("doc_id"), col("nat_shs"), col("hof_shs"),
        Dedup.minhashSignature(col("nat_shs"), 64).as("nat_sig"),
        hofSig(col("nat_shs"), 64).as("hof_sig"))
      .select(col("doc_id"), col("nat_shs"), col("hof_shs"),
        col("nat_sig"), col("hof_sig"),
        Dedup.minhashBandKeys(col("nat_sig"), 16, 4).as("nat_band"),
        hofBands(col("nat_sig"), 16, 4).as("hof_band"))
      .cache()
    try {
      assert(staged.count() > 0)
      assert(staged.where(not(col("nat_shs") === col("hof_shs"))).count() == 0)
      assert(staged.where(size(col("nat_shs")) > 0 &&
        not(col("nat_sig") === col("hof_sig"))).count() == 0)
      assert(staged.where(size(col("nat_shs")) > 0 &&
        not(col("nat_band") === col("hof_band"))).count() == 0)
      // short docs (< n words): empty shingle array, all-null signature
      val shortDoc = Seq((1L, "just two")).toDF("doc_id", "text")
        .select(split(col("text"), " ").as("_w"))
        .select(Dedup.shingleArray(col("_w"), 3).as("shs"))
        .select(col("shs"), Dedup.minhashSignature(col("shs"), 4).as("sig"))
        .head()
      assert(shortDoc.getSeq[Long](0).isEmpty)
      assert(shortDoc.getSeq[Any](1) == Seq(null, null, null, null))
    } finally staged.unpersist()
  }

  test("native PQ ADC dot is bit-identical to the nested HOF fold") {
    // the formulation ivfPqProbeIndex used pre-r6: per subspace, dot of
    // the query slice against the coded centroid, partials summed in
    // subspace order
    val m = 8; val pqK = 4
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val w = dims / m
    val rnd = new scala.util.Random(7)
    val cb = Array.fill(m, pqK, w)(rnd.nextDouble() * 2 - 1)
    val cbLit = array(cb.map(sub =>
      array(sub.map(c => array(c.map(lit): _*)): _*)): _*)
    val hofAdc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, i) =>
      acc + aggregate(
        zip_with(slice(col("qvec"), i * w + 1, lit(w)),
          element_at(element_at(cbLit, i + 1),
            element_at(col("codes"), i + 1) + 1),
          (a, b) => a * b),
        lit(0.0), (x, y) => x + y))
    val staged = emb.limit(200)
      .select(col("embedding").cast("array<double>").as("qvec"),
        // deterministic pseudo-codes per row
        array((0 until m).map(i =>
          pmod(xxhash64(col("vec_id"), lit(i)), lit(pqK)).cast("int")): _*)
          .as("codes"))
    val diff = staged.select(
        (graft.functions.VectorFunctions.pqAdcDot(col("qvec"), col("codes"), cb)
          - hofAdc).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff == 0.0)
    // null contract: short query vector and out-of-range code yield NULL
    val dirty = staged.limit(1)
      .select(slice(col("qvec"), 1, 3).as("qvec"), col("codes"))
      .select(graft.functions.VectorFunctions
        .pqAdcDot(col("qvec"), col("codes"), cb).as("s"))
    assert(dirty.first().isNullAt(0))
  }

  test("native nearest-centroid lists are bit-identical to the array_sort HOF formulation") {
    // the formulation nearestList/nearestLists used pre-r6: per-centroid
    // (cc − 2·v·c, list) structs, array_sort lexicographic, slice
    def selfDot(c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }
    val rnd = new scala.util.Random(11)
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val cents = Array.fill(16)(Array.fill(dims)(rnd.nextDouble() * 2 - 1))
    val centLit = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(selfDot(c)).as("cc"), typedLit(c.toSeq).as("c"),
        lit(i).as("list"))
    }: _*)
    def hofScores(vec: org.apache.spark.sql.Column) =
      transform(centLit, s => struct(
        s.getField("cc") - lit(2.0) * Similarity.dotHof(vec, s.getField("c")),
        s.getField("list")))
    val v = col("embedding").cast("array<double>")
    val staged = emb.select(
      Similarity.nearestLists(v, cents, 4).as("nat"),
      transform(slice(array_sort(hofScores(v)), 1, 4),
        s => s.getField("list")).as("hof"),
      Similarity.nearestList(v, cents).as("nat1"),
      element_at(array_sort(hofScores(v)), 1).getField("list").as("hof1"))
    assert(staged.where(not(col("nat") === col("hof")) ||
      col("nat1") =!= col("hof1")).count() == 0)
    assert(staged.count() > 0)
  }

  test("tfidfTopTerms: hand-computed scores, rounded-score rank order, corpus-wide terms score zero") {
    // corpus of 4 docs; "common" appears in all docs -> idf = ln(1) = 0
    val docs4 = Seq(
      (1L, "common apple apple banana"),
      (2L, "common banana"),
      (3L, "common cherry"),
      (4L, "common cherry cherry cherry")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .tfidfTopTerms(docs4, "doc_id", "text", topN = 2)
      .orderBy("doc", "rank")
      .as[(Long, Int, String, Double)].collect()
    def s(tf: Long, df: Long) =
      math.round(tf * math.log(4.0 / df) * 1e6) / 1e6
    // doc 1: apple tf=2 df=1 -> 2 ln 4; banana tf=1 df=2 -> ln 2
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1, "apple", s(2, 1)), (1L, 2, "banana", s(1, 2))))
    // doc 2: banana ln 2 beats common (0); common still ranks (tie floor)
    assert(out.filter(_._1 == 2L).toSeq == Seq(
      (2L, 1, "banana", s(1, 2)), (2L, 2, "common", 0.0)))
    // doc 4: cherry tf=3 df=2 -> 3 ln 2
    assert(out.filter(_._1 == 4L).head ==
      ((4L, 1, "cherry", s(3, 2))))
    // every score non-negative, ranks contiguous from 1
    assert(out.forall(r => r._4 >= 0.0 && r._2 >= 1 && r._2 <= 2))
  }

  test("repetitionStats: hand-computed 2-gram fractions, short docs omitted") {
    val fixture = Seq(
      (1L, "a b a b a"), // grams: "a b","b a","a b","b a" -> top 2/4, dup 2/4
      (2L, "x y"),       // one gram -> top 1.0, dup 0.0
      (3L, "z")          // no 2-grams -> omitted
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .repetitionStats(fixture, "doc_id", "text")
      .orderBy("doc")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 0.5, 0.5),
      (2L, 1L, 1.0, 0.0)))
  }

  test("sortedIntersectCount matches array_intersect on sorted arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(1L, 1L, 2L), Seq(1L, 2L))).toDF("a", "b")
    val out = df.select(
      VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("m"))
      .as[(Long, Long)].collect()
    // distinct-element arrays agree; (dup case counts pairwise matches)
    assert(out(0) == ((2L, 2L)))
    assert(out(1) == ((0L, 0L)))
    assert(out(2) == ((0L, 0L)))
  }

  test("cosineTopK rank-1 is the true nearest neighbour (vs brute force)") {
    val topk = Similarity.cosineTopK(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 1)
      .select("query_id", "candidate_id").as[(Long, Long)].collect().toMap
    // brute force via pair scores
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val brute = e.as("q").join(e.as("c"),
        col("q.vec_id") < 3 && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q"), col("c.vec_id").as("c"),
        (VectorFunctions.dotNative(col("q.v"), col("c.v")) /
          (sqrt(VectorFunctions.dotNative(col("q.v"), col("q.v"))) *
            sqrt(VectorFunctions.dotNative(col("c.v"), col("c.v"))))).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q")
          .orderBy(col("s").desc, col("c"))))
      .where(col("rn") === 1)
      .select("q", "c").as[(Long, Long)].collect().toMap
    assert(topk == brute)
  }

  test("LSH-bucketed pair search finds high-cosine pairs it buckets together") {
    val out = Similarity.lshBucketedPairs(emb, "vec_id", "embedding",
      minCosine = -1.0, bits = 4)
    // 4 bits -> 16 buckets over 500 vectors: must produce pairs, all scored
    assert(out.count() > 0)
    assert(out.where(col("cosine").isNull).count() == 0)
  }

  test("learned-centroid IVF: exhaustive probing equals brute-force top-1; partial probing covers the corpus") {
    // probing every list == exact search
    val full = Similarity.ivfTopKLearned(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 1, nLists = 8, nProbe = 8, iters = 2)
      .select("query_id", "candidate_id").as[(Long, Long)].collect().toMap
    val exact = Similarity.cosineTopK(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 1)
      .select("query_id", "candidate_id").as[(Long, Long)].collect().toMap
    assert(full == exact)
    // k-means partitions the whole corpus across the lists
    val cents = Similarity.learnCentroids(emb, "vec_id", "embedding", 8, 2)
    assert(cents.count() == 8)
    val dims = cents.select(size(col("c"))).as[Int].collect().toSet
    assert(dims == Set(64))
  }

  test("native simhash64 is bit-identical to the per-bit HOF fold") {
    val sample = docs.limit(40).select(col("doc_id"),
      transform(split(col("text"), " "), t => xxhash64(t)).as("_h"))
    val bits: Seq[org.apache.spark.sql.Column] = (0 until 64).map { i =>
      val s = aggregate(col("_h"), lit(0L),
        (acc, h) => acc +
          when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }
    val mismatches = sample.select(
        VectorFunctions.simhash64(col("_h")).as("nat"),
        bits.reduce((a, b) => a.bitwiseOR(b)).as("hof"))
      .where(col("nat") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("hyperplane signature is deterministic and seed-sensitive") {
    val v = emb.select(col("embedding").cast("array<double>").as("v"))
    val twice = v.select(
      VectorFunctions.hyperplaneSig(col("v"), 12, 0L).as("a"),
      VectorFunctions.hyperplaneSig(col("v"), 12, 0L).as("b"),
      VectorFunctions.hyperplaneSig(col("v"), 12, 1L).as("c"))
    assert(twice.where(col("a") =!= col("b")).count() == 0)
    // independent hyperplane families: seeds must not produce one global
    // signature function (some rows may coincide by chance, not all)
    assert(twice.where(col("a") =!= col("c")).count() > 0)
    // signatures stay inside the declared bit budget
    assert(twice.where(col("a") < 0 || col("a") >= (1L << 12)).count() == 0)
  }

  test("IVF assignment is a shuffle-free projection; seeding is distributed TakeOrdered") {
    val cents = Similarity.learnCentroidArrays(emb, "vec_id", "embedding", 4, 1)
    assert(cents.length == 4)
    val assigned = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("list", Similarity.nearestList(col("v"), cents))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not use a window:\n$plan")
    // every row lands in a real list
    assert(assigned.where(col("list") < 0 || col("list") >= 4).count() == 0)
    // the seed stage is a TakeOrdered (per-partition top-k + k-row driver
    // merge), not a global single-task window
    val seedPlan = emb
      .select(col("vec_id").as("_id"), col("embedding").cast("array<double>").as("_v"))
      .orderBy(xxhash64(col("_id")), col("_id")).limit(4)
      .queryExecution.executedPlan.toString
    assert(seedPlan.contains("TakeOrderedAndProject"), seedPlan)
  }

  test("ivfTopK returns k ranked rows per query") {
    val out = Similarity.ivfTopK(emb, emb.where(col("vec_id") < 2),
      "vec_id", "embedding", k = 3, nLists = 8, nProbe = 8)
    val got = out.groupBy("query_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    // probing all lists == exhaustive: exactly k per query
    assert(got.toSeq == Seq(3L, 3L))
  }

  test("native expressions are registered as SQL functions via SparkSessionExtensions") {
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0)
    assert(dot == 11.0)
    val n = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L))")
      .head().getLong(0)
    assert(n == 2L)
    // all-ones token hashes set every bit; signature arity checks
    val sh = spark.sql("SELECT graft_simhash64(array(-1L, -1L))").head().getLong(0)
    assert(sh == -1L)
    val hp = spark.sql(
      "SELECT graft_hyperplane_sig(array(1.0d, -2.0d, 0.5d), 12, 7L)").head().getLong(0)
    assert(hp >= 0 && hp < (1L << 12))
    // NFC composes e + COMBINING ACUTE into U+00E9 (the combining char
    // is interpolated by scalac — Spark SQL's chr() is mod-256 ASCII and
    // cannot build it); 2-arg form picks NFKC and folds the fi-ligature
    val nfc = spark.sql(s"SELECT graft_normalize('e\u0301')")
      .head().getString(0)
    assert(nfc == "\u00E9")
    val nfkc = spark.sql(s"SELECT graft_normalize('\uFB01n', 'NFKC')")
      .head().getString(0)
    assert(nfkc == "fin")
    assertThrows[Exception] {
      spark.sql("SELECT graft_normalize('x', lower('NFC'))").collect()
    }
  }

  test("two-frame as-of join picks the latest right row at or before each left ts") {
    import graft.ext.EventOps
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      ("u1", ts("2024-01-01 00:10:00"), 1L),
      ("u1", ts("2024-01-01 00:30:00"), 2L),
      ("u2", ts("2024-01-01 00:05:00"), 3L)).toDF("k", "ts", "id")
    val right = Seq(
      ("u1", ts("2024-01-01 00:00:00"), "r0"),
      ("u1", ts("2024-01-01 00:20:00"), "r1"),
      ("u2", ts("2024-01-01 00:07:00"), "r2")).toDF("k", "ts", "tag")
    val out = EventOps.asOfJoin(left, right, "k", "ts", Seq("tag"))
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "r0", 2L -> "r1", 3L -> null))
    // tie-break: two right rows at the same (key, ts) — max rightIdCol wins
    val rightTie = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1L, "low"),
      ("u1", ts("2024-01-01 00:00:00"), 9L, "high")).toDF("k", "ts", "rid", "tag")
    val tied = EventOps.asOfJoin(left, rightTie, "k", "ts", Seq("tag"),
        rightIdCol = Some("rid"))
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(tied(1L) == "high" && tied(2L) == "high")
  }

  test("bucketed range join: inclusive bounds, overlapping intervals, no duplicate matches") {
    import graft.ext.EventOps
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq((1L, ts("2024-01-01 00:30:00")), (2L, ts("2024-01-01 02:00:00")),
      (3L, ts("2024-01-01 05:00:00"))).toDF("eid", "ts")
    val iv = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")), // inclusive end hits eid 2
      (11L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00"))) // overlaps 10
      .toDF("ivid", "s", "e")
    val out = EventOps.bucketedRangeJoin(ev, iv, "ts", "s", "e", 1800L)
      .select("eid", "ivid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 11L)))
    // match count equals the θ-join reference
    val ref = ev.join(iv, col("ts") >= col("s") && col("ts") <= col("e"))
      .select("eid", "ivid").as[(Long, Long)].collect().toSet
    assert(out == ref)
  }

  test("portable Bloom filter: membership exact at generous m, never a false negative, partition-invariant") {
    import graft.ext.Dedup
    val corpus = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "ee ff"))
      .toDF("doc_id", "text")
    val probes = Seq((10L, "aa bb"), (11L, "zz yy"), (12L, "qq rr"),
      (13L, "cc dd")).toDF("doc_id", "text")
    // generous m over a 3-doc corpus: flags == exact membership (the
    // probability of a false positive here is ~(15/65536)^5 — if one ever
    // appears the fixed md5 inputs make it deterministic and this pins it)
    val bitsBig = Dedup.bloomBuild(corpus, "text", 1 << 16, 5)
    val big = Dedup.bloomProbe(probes, "doc_id", "text", bitsBig, 1 << 16, 5)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(big == Seq((10L, 1L), (11L, 0L), (12L, 0L), (13L, 1L)))
    // no false negatives at ANY m: true duplicates stay flagged even in a
    // saturated 8-bit filter
    val bitsTiny = Dedup.bloomBuild(corpus, "text", 8, 5)
    val tiny = Dedup.bloomProbe(probes, "doc_id", "text", bitsTiny, 8, 5)
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(tiny(10L) == 1L && tiny(13L) == 1L)
    // degenerate single-bit filter: everything collides — all probes flag
    val bitsOne = Dedup.bloomBuild(corpus, "text", 1, 5)
    val one = Dedup.bloomProbe(probes, "doc_id", "text", bitsOne, 1, 5)
      .as[(Long, Long)].collect()
    assert(one.forall(_._2 == 1L))
    // bit frame is bounded by m, not corpus size
    assert(bitsOne.count() == 1L && bitsTiny.count() <= 8L)
    val rep = Dedup.bloomProbe(probes.repartition(7), "doc_id", "text",
        bitsBig, 1 << 16, 5)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(rep == big)
    // the packed row-local form (the streaming/scan-side probe) decides
    // identically to the join+agg form over the same built bits
    for ((bits, m) <- Seq((bitsBig, 1 << 16), (bitsTiny, 8), (bitsOne, 1))) {
      val words = Dedup.packBloomBits(bits, m)
      val local = probes.select(col("doc_id"),
          Dedup.bloomMightContain(col("text"), words, m, 5)
            .cast("long").as("maybe_dup"))
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      val joined = Dedup.bloomProbe(probes, "doc_id", "text", bits, m, 5)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(local == joined, s"m=$m")
    }
  }

  test("count-min sketch: exact at generous width, never underestimates, merges cell-wise") {
    import graft.ext.Sketches
    val tf = Seq(("a", 100L), ("b", 40L), ("c", 7L), ("d", 1L))
      .toDF("term", "cnt")
    // wide sketch over 4 keys: no collisions, estimates are exact
    val wide = Sketches.cmsBuild(tf, "term", "cnt", d = 4, w = 1 << 12)
    val estW = Sketches.cmsEstimate(tf.select(col("term")), "term", wide,
        4, 1 << 12)
      .orderBy("term").as[(String, Long)].collect().toSeq
    assert(estW == Seq(("a", 100L), ("b", 40L), ("c", 7L), ("d", 1L)))
    // width 1: every key collides into one cell per row — est = total
    // weight for all keys; still never below the true count
    val tiny = Sketches.cmsBuild(tf, "term", "cnt", d = 4, w = 1)
    val estT = Sketches.cmsEstimate(tf.select(col("term")), "term", tiny, 4, 1)
      .as[(String, Long)].collect()
    assert(estT.forall(_._2 == 148L))
    // mergeability: sketch(A ∪ B) == cell-wise sum of the two sketches
    val (a, b) = (tf.where(col("cnt") >= 40), tf.where(col("cnt") < 40))
    val merged = Sketches.cmsBuild(a, "term", "cnt", 4, 64)
      .unionByName(Sketches.cmsBuild(b, "term", "cnt", 4, 64))
      .groupBy("row", "cell").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsBuild(tf, "term", "cnt", 4, 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // unseen key estimates 0 (left join + coalesce path)
    val unseen = Sketches.cmsEstimate(Seq("zzz").toDF("term"), "term", wide,
        4, 1 << 12)
      .as[(String, Long)].collect()
    assert(unseen.toSeq == Seq(("zzz", 0L)))
  }

  test("event-time normalization absorbs every upstream ts dtype (NTZ µs, long nanos, TZ)") {
    // The events fixture has shipped as all three dtypes across driver
    // rounds (r8: six queries silently broke on a TIMESTAMP→NTZ drift).
    // One helper owns the branch; this pins it against synthetic parquet
    // of each flavor.
    import graft.core.Observations
    import graft.ext.EventOps
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val base = Seq(
      ("u1", ts("2024-01-01 00:10:30"), 1.5),
      ("u1", ts("2024-01-01 01:10:00"), 2.5),
      ("u2", ts("2024-01-02 12:00:00"), 3.5)).toDF("user_id", "ts", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    base.write.mode("overwrite").parquet(s"$tmp/tz")
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$tmp/ntz")
    base.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$tmp/nanos")
    val expected = base
      .select(col("user_id"), EventOps.epochS(col("ts")).as("s"), col("value"))
      .collect().toSet
    for (flavor <- Seq("tz", "ntz", "nanos")) {
      val raw = spark.read.parquet(s"$tmp/$flavor")
      val norm = Observations.normalizeEventTs(raw)
      assert(norm.schema("ts").dataType == TimestampType, flavor)
      val got = norm
        .select(col("user_id"), EventOps.epochS(col("ts")).as("s"), col("value"))
        .collect().toSet
      assert(got == expected, s"flavor=$flavor")
    }
    // epochD itself is NTZ-safe even without prior normalization
    // (session tz pinned UTC → identical epoch)
    val rawNtz = spark.read.parquet(s"$tmp/ntz")
    val direct = rawNtz
      .select(col("user_id"), EventOps.epochS(col("ts")).as("s"), col("value"))
      .collect().toSet
    assert(direct == expected)
  }

  test("wide-frame ingest unpivots one column per series (reference ctor path)") {
    import graft.core.Observations
    val wide = Seq(
      (java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 1.0, 10.0),
      (java.sql.Timestamp.valueOf("2020-01-01 00:06:00"), 2.0, 20.0))
      .toDF("ts", "A", "B")
    val tall = Observations.fromWide(wide, "ts", Seq("A", "B"))
    assert(tall.columns.toSeq ==
      Seq(Observations.KeyCol, Observations.TsCol, Observations.ValueCol))
    val got = tall.orderBy("series_key", "ts")
      .select("series_key", "value").as[(String, Double)].collect().toSeq
    assert(got == Seq(("A", 1.0), ("A", 2.0), ("B", 10.0), ("B", 20.0)))
  }

  test("multimodal plumbing: ingest -> decode stub -> features, row counts preserved") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.asMedia(docs.limit(20), "doc_id", "text", "source")
      .as[Multimodal.MediaRow]
    val decoded = Multimodal.decode(media)
    val feats = Multimodal.extractFeatures(decoded, dims = 8).collect()
    assert(feats.length == 20)
    assert(feats.forall(_.features.length == 8))
    val resized = Multimodal.resize(decoded, 224, 224).collect()
    assert(resized.forall(r => r.meta.width == 224 && r.meta.height == 224))
    // deterministic stubs: same input -> same features
    val again = Multimodal.extractFeatures(Multimodal.decode(media), dims = 8).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })
  }

  test("dedupClusters resolves chains, cycles, and isolated pairs to min roots") {
    import spark.implicits._
    val pairs = Seq(
      (2L, 1L), (2L, 3L),               // component {1,2,3}
      (10L, 11L),                       // isolated pair
      (5L, 6L), (6L, 7L), (7L, 5L),     // cycle
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L) // 5-chain (multi-round)
    ).toDF("doc_a", "doc_b")
    val got = graft.ext.Dedup.dedupClusters(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L))
  }

  test("packShards: concat-then-chunk offsets and shards on a hand fixture") {
    import graft.ext.Corpus
    // token counts 3, 4, 5, 2 → exclusive cumsum 0, 3, 7, 12; budget 5
    // cuts at 5/10 → shards 0, 0, 1, 2 (doc 1 STARTS at offset 3 inside
    // shard 0 even though it spills past the cut — concat-then-chunk
    // assigns by first-token position)
    val df = Seq((0L, "a b c"), (1L, "a b c d"), (2L, "a b c d e"),
      (3L, "a b")).toDF("doc_id", "text")
    val out = Corpus.packShards(df, "doc_id", "text",
        budgetTokens = 5, bucketWidth = 2)
      .orderBy("doc")
      .select("doc", "n_tokens", "start_offset", "shard_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 0L, 0L), (1L, 4L, 3L, 0L),
      (2L, 5L, 7L, 1L), (3L, 2L, 12L, 2L)))
  }

  test("packShards output is bucketWidth-invariant (width is a parallelism knob)") {
    import graft.ext.Corpus
    // widths on either extreme: 7 ids per bucket (many buckets, uneven
    // boundary) vs one bucket holding the whole corpus (degenerates to
    // the single-window formulation) — identical output proves the
    // two-stage prefix decomposition is exact
    val a = Corpus.packShards(docs, "doc_id", "text", 1000L, 7L)
    val b = Corpus.packShards(docs, "doc_id", "text", 1000L, 1L << 30)
    assert(a.count() == docs.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("stratifiedSample keeps exactly the under-rate hash buckets, deterministically") {
    import graft.ext.Corpus
    val rates = Map("en" -> 2500L, "zh" -> 5000L)
    val out = Corpus.stratifiedSample(docs, "doc_id", "lang", rates).cache()
    val bad = out.where(
      (col("lang") === "en" && col("sample_bucket") >= 2500) ||
      (col("lang") === "zh" && col("sample_bucket") >= 5000) ||
      col("sample_bucket") >= 10000).count()
    assert(bad == 0, "kept a row whose bucket is at or above its stratum rate")
    // deterministic: an independent recomputation selects identical rows
    val out2 = Corpus.stratifiedSample(docs, "doc_id", "lang", rates)
    assert(out.exceptAll(out2).count() == 0 && out2.exceptAll(out).count() == 0)
    // default 10000 bp keeps every row
    assert(Corpus.stratifiedSample(docs, "doc_id", "lang", Map.empty[String, Long])
      .count() == docs.count())
    // downsampling actually thins the stratum (loose: 2500 bp keeps
    // strictly between none and all on any non-degenerate stratum)
    val en = docs.where(col("lang") === "en").count()
    val enKept = out.where(col("lang") === "en").count()
    assert(en == 0 || (enKept < en),
      s"en stratum not thinned: $enKept of $en kept at 2500 bp")
    out.unpersist()
  }

  test("hashSplit assigns every doc exactly one stable split at the requested rates") {
    import graft.ext.Corpus
    val out = Corpus.hashSplit(docs, "doc_id").cache()
    assert(out.count() == docs.count())
    // buckets in range, split consistent with bucket thresholds
    assert(out.where(col("split_bucket") < 0 || col("split_bucket") >= 10000)
      .count() == 0)
    assert(out.where(
      (col("split_bucket") < 9000 && col("split") =!= "train") ||
      (col("split_bucket") >= 9000 && col("split_bucket") < 9500 &&
        col("split") =!= "validation") ||
      (col("split_bucket") >= 9500 && col("split") =!= "test")).count() == 0)
    // deterministic: recomputation under a different partitioning agrees
    val out2 = Corpus.hashSplit(docs.repartition(7), "doc_id")
    assert(out.exceptAll(out2).count() == 0 && out2.exceptAll(out).count() == 0)
    // a different salt re-deals the buckets (split independence knob)
    val salted = Corpus.hashSplit(docs, "doc_id", salt = "other")
    assert(out.select("doc_id", "split_bucket")
      .exceptAll(salted.select("doc_id", "split_bucket")).count() > 0)
    // rates land near 90/5/5 (hash-uniformity sanity, generous binomial slack)
    val n = out.count().toDouble
    val trainFrac = out.where(col("split") === "train").count() / n
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train frac $trainFrac")
    assertThrows[IllegalArgumentException] {
      Corpus.hashSplit(docs, "doc_id", trainBp = 9900L, valBp = 500L)
    }
    out.unpersist()
  }

  test("uniformSampleK takes exactly k, deterministically, with the min-wise property") {
    import graft.ext.Corpus
    val k = 10
    val sel = Corpus.uniformSampleK(docs, "doc_id", k).cache()
    assert(sel.count() == k)
    // selected rows are real corpus rows
    assert(sel.drop("sample_key").exceptAll(docs).count() == 0)
    // deterministic across partitionings
    val sel2 = Corpus.uniformSampleK(docs.repartition(7), "doc_id", k)
    assert(sel.exceptAll(sel2).count() == 0 && sel2.exceptAll(sel).count() == 0)
    // min-wise: growing the corpus can only EVICT previously selected
    // docs, never pull in a doc that lost before
    val grown = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val selGrown = Corpus.uniformSampleK(grown, "doc_id", k)
    val origIds = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    val grownOrigIds = selGrown.where(col("doc_id") < 1000000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(grownOrigIds.subsetOf(origIds),
      s"non-min-wise: ${grownOrigIds -- origIds} appeared only in the grown sample")
    // the plan is a TakeOrdered, not a global sort
    assert(sel.queryExecution.sparkPlan.toString.contains("TakeOrderedAndProject"))
    sel.unpersist()
  }

  test("weightedSampleK implements Efraimidis-Spirtes keys and biases toward weight") {
    import graft.ext.Corpus
    val k = 50
    val sel = Corpus.weightedSampleK(docs, "doc_id", "n_chars", k).cache()
    assert(sel.count() == k)
    // key formula: round(-ln((bucket+0.5)/2^60)/w, 6) recomputed row-by-row
    val check = sel.select("doc_id", "n_chars", "es_key").collect().map { r =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsample:${r.getLong(0)}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val u = (bucket.toDouble + 0.5) / 1152921504606846976.0
      val key = BigDecimal(-math.log(u) / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r.getLong(0), key, r.getDouble(2))
    }
    check.foreach { case (id, want, got) =>
      assert(got == want, s"doc $id: es_key $got != recomputed $want") }
    // deterministic across partitionings
    val sel2 = Corpus.weightedSampleK(docs.repartition(5), "doc_id", "n_chars", k)
    assert(sel.exceptAll(sel2).count() == 0 && sel2.exceptAll(sel).count() == 0)
    // length bias: the weighted sample's mean n_chars exceeds the
    // uniform sample's at the same k (loose statistical check — the
    // fixture's weights span a wide range)
    val wMean = sel.agg(avg("n_chars")).head.getDouble(0)
    val uMean = Corpus.uniformSampleK(docs, "doc_id", k)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(wMean > uMean,
      s"weighted mean $wMean not above uniform mean $uMean")
    // the plan must be a TakeOrdered (heap + driver merge), not a global
    // sort of the corpus
    assert(sel.queryExecution.sparkPlan.toString
      .contains("TakeOrderedAndProject"))
    // non-positive weight = selection probability 0 (never ranked, never
    // selected — and never a null key with engine-divergent ordering)
    val zeroed = docs.withColumn("n_chars",
      when(col("doc_id") % 2 === 0, lit(0L)).otherwise(col("n_chars")))
    val selZ = Corpus.weightedSampleK(zeroed, "doc_id", "n_chars", k)
    assert(selZ.where(col("doc_id") % 2 === 0).count() == 0)
    assert(selZ.count() == k)
    sel.unpersist()
  }

  test("NormalizeUnicode matches UAX #15 on composition, compatibility and nulls") {
    import graft.functions.StringFunctions.normalizeUnicode
    val comb = "e" + "\u0301"          // decomposed e + combining acute
    val df = Seq(
      (1L, comb + "clair"),            // NFC composes to U+00E9
      (2L, "\u212B"),                  // ANGSTROM SIGN -> U+00C5 under NFC
      (3L, "\uFB01" + "n"),            // fi-ligature: NFC-stable, NFKC folds
      (4L, "plain ascii"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val got = df.select(col("id"),
        normalizeUnicode(col("s")).as("nfc"),
        normalizeUnicode(col("s"), "NFKC").as("nfkc"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(got(1L) == ((Some("\u00E9clair"), Some("\u00E9clair"))))
    assert(got(2L) == ((Some("\u00C5"), Some("\u00C5"))))
    assert(got(3L) == ((Some("\uFB01" + "n"), Some("fin"))))
    assert(got(4L) == ((Some("plain ascii"), Some("plain ascii"))))
    assert(got(5L) == ((None, None)))
    assertThrows[IllegalArgumentException] {
      df.select(normalizeUnicode(col("s"), "NFX")).collect()
    }
  }

  test("contamination counts distinct shared n-grams, training side only") {
    import graft.ext.Corpus
    // bench doc 1 has 5-grams {"a b c d e", "b c d e f"}; doc 2 shares
    // exactly one, doc 3 none (absent from output), doc 4 is a verbatim
    // leak sharing both
    val df = Seq(
      (1L, "a b c d e f", true),
      (2L, "a b c d e x", false),
      (3L, "z z z z z z", false),
      (4L, "a b c d e f", false)).toDF("doc_id", "text", "isb")
    val out = Corpus.contamination(df, "doc_id", "text", col("isb"), n = 5)
      .orderBy("doc").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L), (4L, 2L)))
  }

  test("chunkDedup keeps one corpus-wide copy per distinct chunk, lowest (doc, idx) first") {
    // chunk width 2: doc 0 → ["a b", "c d"]; doc 1 → ["a b", "x y", "z"]
    // (trailing partial chunk); doc 2 → ["c d"] only — both its chunks...
    // doc 2 = "c d a b" → ["c d", "a b"]: both already kept by docs 0/1
    val df = Seq((0L, "a b c d"), (1L, "a b x y z"), (2L, "c d a b"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 4L),   // both chunks first occurrences
      (1L, 3L, 2L, 3L),   // "a b" lost to doc 0; "x y" + partial "z" kept
      (2L, 2L, 0L, 0L)))  // fully boilerplate: every chunk seen before
  }

  test("chunkDedup intra-document repeats keep only the first occurrence") {
    val df = Seq((7L, "p q p q p q")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((7L, 3L, 1L, 2L)))
  }

  test("targetMixSample derives exact integer rates and saturates under-supplied strata") {
    import graft.ext.Corpus
    // en: n=218 at sf0.001? — hand fixture instead: strata a (4 rows),
    // b (2 rows); budget 4, shares a=5000bp, b=5000bp
    // want = (5000*4) div 10000 = 2 → rate_a = min(10000, 20000 div 4) =
    // 5000 bp; rate_b = min(10000, 20000 div 2) = 10000 bp (saturated:
    // b can't overfill its quota, keeps everything)
    val df = (0L to 3L).map(i => (i, "a")).++(Seq((4L, "b"), (5L, "b")))
      .toDF("doc_id", "stratum")
    val out = Corpus.targetMixSample(df, "doc_id", "stratum",
      Map("a" -> 5000L, "b" -> 5000L), budget = 4L).cache()
    val rates = out.select("stratum", "rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates.get("b").contains(10000L), s"b not saturated: $rates")
    assert(rates.getOrElse("a", 5000L) == 5000L)
    // the keep predicate is exactly bucket < rate
    assert(out.where(col("sample_bucket") >= col("rate_bp")).count() == 0)
    // absent stratum ⇒ share 0 ⇒ dropped
    assert(Corpus.targetMixSample(df, "doc_id", "stratum",
      Map("a" -> 10000L), budget = 100L)
      .where(col("stratum") === "b").count() == 0)
    out.unpersist()
  }

  test("temperatureMixSample boosts rare sources and cuts hot ones") {
    import graft.ext.Corpus
    // sources: hot (100 rows), rare (1 row); α=1/2 weights w=10, 1,
    // den=11, N=101, keepBp=5000:
    //   rate_rare = floor(5000·101·1/(11·1))/... = floor(45909.09) → cap 10000
    //   rate_hot  = floor(5000·101·10/(11·100)) = floor(4590.909) = 4590
    val df = ((0L until 100L).map(i => (i, "hot")) :+ ((1000L, "rare")))
      .toDF("doc_id", "source")
    val out = Corpus.temperatureMixSample(df, "doc_id", "source",
      keepBp = 5000L).cache()
    val rates = out.select("source", "rate_bp").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("rare") === 10000L, s"rare not saturated: $rates")
    assert(rates("hot") === 4590L, s"hot rate wrong: $rates")
    // keep predicate is exactly bucket < rate
    assert(out.where(col("selected") =!=
      (col("sample_bucket") < col("rate_bp"))).count() === 0L)
    out.unpersist()
  }

  test("unigramNll ranks rare-token docs above common-token docs, partition-invariantly") {
    import graft.ext.TextAnalysis
    val df = Seq((1L, "a a a a"), (2L, "a a z q")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramNll(df, "doc_id", "text")
      .orderBy("doc").as[(Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 4L), (2L, 4L)))
    // doc 1 is all corpus-dominant tokens, doc 2 carries two singletons
    assert(out(0)._3 < out(1)._3,
      s"common-token doc not ranked more likely: $out")
    // exact-decimal partials ⇒ identical result under any partitioning
    val out7 = TextAnalysis.unigramNll(df.repartition(7), "doc_id", "text")
      .orderBy("doc").as[(Long, Long, Double)].collect().toSeq
    assert(out7 == out)
  }

  test("nllBuckets assigns per-stratum head/middle/tail by exact tercile cutoffs") {
    import graft.ext.TextAnalysis
    // six docs in one stratum, increasingly rare vocabulary: the nll
    // order is the doc order, so terciles split 1-2 / 3-4 / 5-6
    val df = Seq(
      (1L, "a a a a a a", "en"), (2L, "a a a a a b", "en"),
      (3L, "a a a a c d", "en"), (4L, "a a a e f g", "en"),
      (5L, "a a h i j k", "en"), (6L, "a l m n o p", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nllBuckets(df, "doc_id", "text", "lang")
      .orderBy("doc")
      .select("doc", "bucket").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L),
      (5L, 3L), (6L, 3L)), s"unexpected buckets: $out")
    // strata are independent: a second language's cutoffs don't mix
    val two = df.unionByName(Seq((11L, "x x x x", "fr"), (12L, "x x y z", "fr"))
      .toDF("doc_id", "text", "lang"))
    val fr = TextAnalysis.nllBuckets(two, "doc_id", "text", "lang")
      .where(col("lang") === "fr").orderBy("doc")
      .select("doc", "bucket").as[(Long, Long)].collect().toSeq
    assert(fr.map(_._2).head == 1L && fr.map(_._2).last == 3L)
  }

  test("piiRedact counts and scrubs all five pattern types row-locally; Luhn gates cards") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "mail bob@test.io and alice.smith@example.org today"),
      (2L, "call 555-123-4567 from 10.0.0.1"),
      (3L, "plain words only"),
      (4L, "x 9999-867-5309 y"),
      (5L, "ssn 078-05-1120 card 4111-1111-1111-1111"),
      (6L, "pay 5500005555555559 not 1234-5678-9012-3456"),
      (7L, "spaced 4111 1111 1111 1111 works too"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(df, "doc_id", "text")
      .orderBy("doc")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 0L, 0L, 0L, 0L,
      "mail <EMAIL> and <EMAIL> today")))
    assert(out(1) == ((2L, 0L, 1L, 1L, 0L, 0L, "call <PHONE> from <IP>")))
    assert(out(2) == ((3L, 0L, 0L, 0L, 0L, 0L, "plain words only")))
    // \b guards: "9999-867-5309" is NOT a phone — no boundary inside
    // the 4-digit run, and no 3-3-4 alignment starts at any boundary
    assert(out(3)._3 == 0L, s"false phone in ${out(3)}")
    // SSN (3-2-4 grouping, not a phone) + a Luhn-valid dashed card
    assert(out(4) == ((5L, 0L, 0L, 0L, 1L, 1L,
      "ssn <SSN> card <CC>")))
    // bare 16-digit Luhn-valid card redacts; the Luhn-INVALID card-shaped
    // span is neither counted nor redacted
    assert(out(5) == ((6L, 0L, 0L, 0L, 0L, 1L,
      "pay <CC> not 1234-5678-9012-3456")))
    // space-separated grouping is a candidate too
    assert(out(6) == ((7L, 0L, 0L, 0L, 0L, 1L, "spaced <CC> works too")))
  }

  test("emb_dedup_clusters resolves each planted duplicate into a size-2 cluster") {
    val out = SparkEntry.queries("emb_dedup_clusters")(spark,
        "/root/testdata/sf0.001")
      .select("vec_id", "root", "cluster_size")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty, "no clusters — plant missing")
    // on this near-orthogonal fixture the >= 0.8 graph is exactly the
    // planted (v, v+100000) pairs: every cluster is {v, v+100000} rooted
    // at v, and every v % 10 == 0 appears
    assert(out.forall(_._3 == 2L), s"unexpected cluster size in $out")
    val roots = out.filter(r => r._1 == r._2).map(_._1).toSet
    val members = out.filter(r => r._1 != r._2)
      .map(r => r._1 - 100000L).toSet
    assert(roots == members && roots.forall(_ % 10 == 0))
  }

  test("gopherRules: hand fixture pins every metric and the pass conjunction") {
    import graft.ext.TextAnalysis
    // 60 words, clean prose -> passes; a bullet/ellipsis/symbol doc fails
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")
    val messy = "- item one ...\n- item two ...\n### # # lots of # symbols"
    val out = TextAnalysis.gopherRules(
        Seq((1L, clean), (2L, messy)).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    val c = out(0)
    assert(c.getLong(1) == 60L)
    assert(c.getBoolean(7), s"clean doc must pass: $c")
    val m = out(1)
    // 3 lines: two bullets (2/3), two ellipsis-terminated (2/3),
    // 6 '#' + 2 '...' among 13 ws-tokens
    assert(m.getLong(1) == 13L)
    assert(math.abs(m.getDouble(3) - 8.0 / 13) < 1e-6, s"symbol ratio: $m")
    assert(math.abs(m.getDouble(4) - 2.0 / 3) < 1e-6, s"bullet frac: $m")
    assert(math.abs(m.getDouble(5) - 2.0 / 3) < 1e-6, s"ellipsis frac: $m")
    assert(!m.getBoolean(7), s"messy doc must fail: $m")
  }

  test("quantizeInt8: |q| <= 127, err bound <= scale/2, zero vector safe") {
    val df = Seq(
        (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
        (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
        (3L, Array(127.0f, -127.0f, 1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    // v1: scale = 1/127; q = (64, -127, 32, 0) via half-up (31.75+0.5
    // floors to 32, 63.5+0.5 floors to 64)
    assert(out(0).getLong(2) == 64L - 127L + 32L)
    assert(out(0).getLong(3) == 64L + 127L + 32L)
    assert(out(0).getDouble(4) <= 1.0 / 127 / 2 + 1e-6)
    // zero vector: scale 0, all-zero quants, zero error
    assert(out(1).getDouble(1) == 0.0 && out(1).getLong(2) == 0L &&
      out(1).getDouble(4) == 0.0)
    // unit-scale vector quantizes exactly
    assert(out(2).getDouble(1) == 1.0 && out(2).getLong(3) == 256L &&
      out(2).getDouble(4) == 0.0)
  }

  test("bucketed-table merge join runs with zero exchange; rows match plain join") {
    spark.sql("DROP TABLE IF EXISTS bkt_orders_spec")
    spark.sql("DROP TABLE IF EXISTS bkt_customer_spec")
    spark.read.parquet(sf("orders")).write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", "/tmp/graft_spec_bkt/orders")
      .saveAsTable("bkt_orders_spec")
    spark.read.parquet(sf("customer")).write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", "/tmp/graft_spec_bkt/customer")
      .saveAsTable("bkt_customer_spec")
    val j = spark.table("bkt_orders_spec").hint("merge")
      .join(spark.table("bkt_customer_spec"),
        col("o_custkey") === col("c_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    val plain = spark.read.parquet(sf("orders"))
      .join(spark.read.parquet(sf("customer")),
        col("o_custkey") === col("c_custkey"))
    assert(j.count() == plain.count())
  }

  test("weeklyRetention: hand fixture cohorts, offsets, week-0 normalization") {
    import graft.ext.EventOps
    val w0 = 1700L
    def ts(week: Long, s: Long) =
      new java.sql.Timestamp(((w0 + week) * 604800L + s) * 1000L)
    val df = Seq(
        ("a", ts(0, 10)), ("a", ts(1, 20)), ("a", ts(2, 30)),
        ("b", ts(0, 40)), ("b", ts(2, 50)),
        ("c", ts(1, 60)))
      .toDF("u", "ts")
    val out = EventOps.weeklyRetention(df, "u", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1700L, 0L, 2L, 1.0),  // a, b start
      (1700L, 1L, 1L, 0.5),  // only a back in week 1
      (1700L, 2L, 2L, 1.0),  // a and b back in week 2
      (1701L, 0L, 1L, 1.0))) // c's own cohort
  }

  test("signProjection: deterministic, linear, k dims per vector, no shuffle") {
    val df = Seq(
        (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
        (2L, Array(2.0f, 4.0f, 6.0f, 8.0f)),  // 2x vector 1
        (3L, Array(1.0f, 2.0f, 3.0f, 4.0f)))  // identical to vector 1
      .toDF("vec_id", "embedding")
    val out = Similarity.signProjection(df, "vec_id", "embedding", k = 5)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val byVec = rows.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byVec(1L).size == 5)
    assert(byVec(1L) == byVec(3L), "identical vectors must project equally")
    assert(byVec(2L) == byVec(1L).map(_ * 2), "projection must be linear")
    // signs are ±1 draws, so at least one dim differs from the plain sum
    assert(byVec(1L).exists(p => math.abs(p) != 10.0))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged on a hand fixture") {
    import graft.ext.Corpus
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Corpus.snapshotDiff(v1, v2, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "removed"), (2L, "unchanged"), (3L, "changed"),
      (4L, "added")))
  }

  test("truncateTokens keeps exactly the first-N prefix and counts honestly") {
    import graft.ext.TextAnalysis
    val df = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.truncateTokens(df, "doc_id", "text", maxTokens = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 5L && out(0).getLong(2) == 3L)
    // kept prefix is "a b c" — same digest as md5 of the literal
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getString(3) == expected)
    // short doc passes through whole
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 2L)
  }

  test("transitionTopK counts pairs inside sessions only, ranked with tie-break") {
    import graft.ext.EventOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user u: a->b, b->a in session 1; gap > 30 min; a->b in session 2.
    // The session break between events 3 and 4 must NOT produce a pair.
    val df = Seq(
        (1L, "u", "a", ts(0)), (2L, "u", "b", ts(60)), (3L, "u", "a", ts(120)),
        (4L, "u", "a", ts(10000)), (5L, "u", "b", ts(10060)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.transitionTopK(df, "user_id", "ts", "event_id",
        gapSeconds = 1800L, typeCol = "event_type", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("tokenEntropy: uniform distribution gives ln(k); constant doc gives +0.0") {
    import graft.ext.TextAnalysis
    val df = Seq((1L, "a b a b"), (2L, "x x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L)
    assert(math.abs(out(0).getDouble(2) - math.log(2.0)) < 1e-6)
    // zero entropy normalized to +0.0, not -0.0
    assert(java.lang.Double.compare(out(1).getDouble(2), 0.0) == 0)
  }

  test("doc_keep_best picks the longest member per cluster, ties to min id") {
    val dir = "/root/testdata/sf0.001"
    val best = SparkEntry.queries("doc_keep_best")(spark, dir).cache()
    val clusters = SparkEntry.queries("doc_dedup_clusters")(spark, dir)
    val nt = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
    val member = clusters.select(col("doc_id"), col("keeper")).join(nt, "doc_id")
    // one winner per cluster, and it IS a member
    assert(best.count() == clusters.select("keeper").distinct().count())
    assert(best.join(member, best("best_doc") === member("doc_id") &&
      best("root") === member("keeper")).count() == best.count())
    // no member strictly beats its cluster's winner under (nt, -id)
    val beaten = best.join(member, best("root") === member("keeper"))
      .where(member("nt") > best("n_tokens") ||
        (member("nt") === best("n_tokens") &&
          member("doc_id") < best("best_doc")))
    assert(beaten.count() == 0)
    best.unpersist()
  }

  test("funnelSteps: order respected, pre-signup clicks ignored, window from t1") {
    import graft.ext.EventOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = Seq(
        // u1: full ordered funnel inside the window
        (1L, "u1", "signup", ts(100)), (2L, "u1", "click", ts(200)),
        (3L, "u1", "purchase", ts(300)),
        // u2: its only click is BEFORE the signup -> stops at step 1
        (4L, "u2", "click", ts(50)), (5L, "u2", "signup", ts(100)),
        // u3: click in window, purchase past the window -> stops at step 2
        (6L, "u3", "signup", ts(0)), (7L, "u3", "click", ts(10)),
        (8L, "u3", "purchase", ts(100000)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.funnelSteps(df, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"), windowSec = 1000L)
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, "signup", 3L, 1.0),
      (2, "click", 2L, 0.666667),
      (3, "purchase", 1L, 0.333333)))
  }

  test("activeUsers: DAU counts the day, WAU the trailing 7 days") {
    import graft.ext.EventOps
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L + 3600000L)
    // a active days 0 and 8; b active days 0 and 1
    val df = Seq(("a", ts(0)), ("a", ts(8)), ("b", ts(0)), ("b", ts(1)))
      .toDF("u", "ts")
    val out = EventOps.activeUsers(df, "u", "ts").orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // day 0: dau 2 wau 2; day 1: dau 1 (b), wau 2 (a@0, b);
    // day 8: dau 1 (a), wau 1 (a only — day 1 is 7 back, outside)
    assert(out == Seq((0L, 2L, 2L), (1L, 1L, 2L), (8L, 1L, 1L)))
  }

  test("lang-partitioned write prunes partitions at scan time") {
    val p = "/tmp/graft_spec_partby"
    spark.read.parquet(sf("documents"))
      .write.mode("overwrite").partitionBy("lang").parquet(p)
    val q = spark.read.parquet(p).where(col("lang") === "en")
      .select(col("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("= en"), plan)
    val expected = spark.read.parquet(sf("documents"))
      .where(col("lang") === "en").count()
    assert(q.count() == expected && expected > 0)
  }

  test("zscoreAnomalies flags exactly the planted outlier, partition-invariantly") {
    import graft.ext.CrossStats
    import graft.core.Observations._
    // 20 calm points + one wild outlier; series b has no outliers
    val rows = (1 to 20).map(i => ("a", i, 10.0 + (i % 3))) :+ (("a", 21, 500.0))
    val all = rows ++ (1 to 10).map(i => ("b", i, 5.0))
    val df = all.toDF(KeyCol, "i", ValueCol)
      .select(col(KeyCol), to_timestamp(lit("2024-01-01 00:00:00"))
        .as(TsCol), col(ValueCol))
    val out = CrossStats.zscoreAnomalies(df).orderBy("series_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 21L, 1L), ("b", 10L, 0L)))
    val rep = CrossStats.zscoreAnomalies(df.repartition(13)).orderBy("series_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == out.toSeq)
  }

  test("madOutliers: robust median/MAD picks, even-count mean, spike counted") {
    import graft.ext.CrossStats
    import graft.core.Observations.{KeyCol, TsCol, ValueCol}
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
        ("a", java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i:00"), v) } ++
      Seq(1.0, 2.0, 3.0, 5.0).zipWithIndex.map { case (v, i) =>
        ("b", java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i:00"), v) })
      .toDF(KeyCol, TsCol, ValueCol)
    val out = CrossStats.madOutliers(df).orderBy("series_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    // a: med=3, devs sorted [0,1,1,2,97] -> mad=1; only 100 exceeds 3·MAD
    // b (even count): med=(2+3)/2=2.5, devs sorted [0.5,0.5,1.5,2.5] ->
    //   mad=(0.5+1.5)/2=1.0; no |x-2.5| exceeds 3
    assert(out.toSeq == Seq(("a", 5L, 3.0, 1.0, 1L), ("b", 4L, 2.5, 1.0, 0L)))
    val rep = CrossStats.madOutliers(df.repartition(7)).orderBy("series_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rep.toSeq == out.toSeq)
  }

  test("sign-bit packing is MSB-first exact; hamming ranks a planted near-dup first") {
    // alternating +/- pattern over the first 8 dims, rest negative:
    // bits 10101010 then zeros -> b0 = 0xAA << 24
    val pat = (0 until 64).map(i => if (i < 8 && i % 2 == 0) 1.0f else -1.0f)
    val one = Seq((0L, pat)).toDF("vec_id", "embedding")
    val packed = one.select(
      Similarity.signBitHalf(col("embedding"), 0).as("b0"),
      Similarity.signBitHalf(col("embedding"), 32).as("b1"))
      .as[(Long, Long)].head()
    assert(packed == ((0xAAL << 24, 0L)))
    // planted near-dup: vec 1 = vec 0 with three sign flips; vec 2 random-ish
    val base = (0 until 64).map(i => if (i % 3 == 0) 0.5f else -0.5f)
    val flip3 = base.zipWithIndex.map { case (v, i) =>
      if (i == 5 || i == 17 || i == 40) -v else v }
    val other = (0 until 64).map(i => if (i % 7 == 0) 0.5f else -0.5f)
    val corpus = Seq((10L, base), (11L, flip3), (12L, other))
      .toDF("vec_id", "embedding")
    val top = Similarity.hammingTopK(corpus,
        corpus.where(col("vec_id") === 10L), "vec_id", "embedding", k = 2)
      .orderBy("rank")
      .select("candidate_id", "hamming").as[(Long, Long)].collect().toSeq
    assert(top.head == ((11L, 3L)))
    // distances invariant under repartitioning
    val rep = Similarity.hammingTopK(corpus.repartition(5),
        corpus.where(col("vec_id") === 10L), "vec_id", "embedding", k = 2)
      .orderBy("rank")
      .select("candidate_id", "hamming").as[(Long, Long)].collect().toSeq
    assert(rep == top)
  }

  test("globalRowNumber equals the single-partition rank at any partition count") {
    import graft.ext.Ranks
    val orders = spark.read.parquet(sf("orders"))
      .select(col("o_orderkey"), col("o_totalprice"))
    val ord = Seq(col("o_totalprice"), col("o_orderkey"))
    val ref = orders.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(ord: _*))
        .cast("long"))
      .select("o_orderkey", "rn")
    for (parts <- Seq(3, 8, 17)) {
      val got = Ranks.globalRowNumber(orders, ord, nParts = parts)
        .select("o_orderkey", "rn")
      assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0,
        s"nParts=$parts")
    }
  }

  test("stratifiedRowNumber equals the per-stratum window rank at any partition count") {
    import graft.ext.Ranks
    val orders = spark.read.parquet(sf("orders"))
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
    val ord = Seq(col("o_totalprice"), col("o_orderkey"))
    val ref = orders.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus")).orderBy(ord: _*))
        .cast("long"))
      .select("o_orderstatus", "o_orderkey", "rn")
    for (parts <- Seq(3, 8, 17)) {
      val got = Ranks.stratifiedRowNumber(orders, Seq("o_orderstatus"),
          ord, nParts = parts)
        .select("o_orderstatus", "o_orderkey", "rn")
      assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0,
        s"nParts=$parts")
    }
  }

  test("orderStatCut picks the exact bracketing order statistics (odd/even/empty)") {
    import graft.ext.Ranks
    def cut(vals: Seq[Double], t: Int, q: Int) = {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("doc", "v")
      Ranks.orderStatCut(df.repartition(5), col("v"), col("doc"), t, q)
        .collect().head
    }
    // n=5 median: position floor((5-1)/2)+1 = 3 -> lo=30, hi=40, r=0
    val odd = cut(Seq(50.0, 10.0, 30.0, 20.0, 40.0), 1, 2)
    assert((odd.getDecimal(0).doubleValue, odd.getDecimal(1).doubleValue,
      odd.getLong(2)) == ((30.0, 40.0, 0L)), odd.toString)
    // n=4 median: position floor(3/2)+1 = 2 -> lo=20, hi=30, r=1
    val even = cut(Seq(40.0, 10.0, 30.0, 20.0), 1, 2)
    assert((even.getDecimal(0).doubleValue, even.getDecimal(1).doubleValue,
      even.getLong(2)) == ((20.0, 30.0, 1L)), even.toString)
    // p75 over n=5: position floor(3*4/4)+1 = 4 -> lo=40, hi=50, r=0
    val p75 = cut(Seq(50.0, 10.0, 30.0, 20.0, 40.0), 3, 4)
    assert((p75.getDecimal(0).doubleValue, p75.getDecimal(1).doubleValue,
      p75.getLong(2)) == ((40.0, 50.0, 0L)), p75.toString)
    // empty input degrades to one all-null row (filters drop everything)
    val empty = cut(Seq.empty, 1, 2)
    assert(empty.isNullAt(0) && empty.isNullAt(1) && empty.isNullAt(2))
  }

  test("stratifiedRunningSum equals the per-stratum window prefix sum at any partition count") {
    import graft.ext.Ranks
    val orders = spark.read.parquet(sf("orders"))
      .select(col("o_orderstatus"), col("o_orderkey"),
        col("o_totalprice"), pmod(col("o_orderkey"), lit(97L)).as("v"))
    val ord = Seq(col("o_totalprice"), col("o_orderkey"))
    val ref = orders.withColumn("run_sum",
      sum(col("v")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus")).orderBy(ord: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .select("o_orderstatus", "o_orderkey", "run_sum")
    for (parts <- Seq(3, 8, 17)) {
      val got = Ranks.stratifiedRunningSum(orders, Seq("o_orderstatus"),
          ord, col("v"), nParts = parts)
        .select("o_orderstatus", "o_orderkey", "run_sum")
      assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0,
        s"nParts=$parts")
    }
  }

  test("stratifiedRunningSum matches window null semantics: null until first non-null value") {
    import graft.ext.Ranks
    val df = Seq[(String, Long, Option[Long])](
      ("a", 1L, None), ("a", 2L, None), ("a", 3L, Some(5L)), ("a", 4L, None),
      ("b", 1L, Some(2L)), ("b", 2L, None), ("b", 3L, Some(3L))
    ).toDF("st", "k", "v")
    val got = Ranks.stratifiedRunningSum(df.repartition(3), Seq("st"),
        Seq(col("k")), col("v"), nParts = 3)
      .select("st", "k", "run_sum").as[(String, Long, Option[Long])]
      .collect().toSet
    val expect = Set(
      ("a", 1L, None), ("a", 2L, None), ("a", 3L, Some(5L)),
      ("a", 4L, Some(5L)),
      ("b", 1L, Some(2L)), ("b", 2L, Some(2L)), ("b", 3L, Some(5L)))
    assert(got == expect, got.toString)
  }

  test("stratified rank/prefix treat a NULL stratum as its own partition (window semantics)") {
    import graft.ext.Ranks
    // window PARTITION BY groups NULLs together; a plain equi-join on the
    // stratum would silently DROP null-stratum rows — the null-safe join
    // must keep and rank them
    val df = Seq[(Option[String], Long, Long)](
      (Some("a"), 1L, 10L), (Some("a"), 2L, 20L),
      (None, 1L, 7L), (None, 2L, 8L), (None, 3L, 9L),
      (Some("b"), 1L, 5L)
    ).toDF("st", "k", "v")
    val rn = Ranks.stratifiedRowNumber(df.repartition(3), Seq("st"),
        Seq(col("k")), nParts = 3)
      .select("st", "k", "rn").as[(Option[String], Long, Long)]
      .collect().toSet
    assert(rn == Set(
      (Some("a"), 1L, 1L), (Some("a"), 2L, 2L),
      (None, 1L, 1L), (None, 2L, 2L), (None, 3L, 3L),
      (Some("b"), 1L, 1L)), rn.toString)
    val rs = Ranks.stratifiedRunningSum(df.repartition(3), Seq("st"),
      Seq(col("k")), col("v"), nParts = 3)
    // internal columns must not leak into the output schema
    assert(!rs.columns.exists(Set("_off", "_pid", "_val", "_ls")),
      rs.columns.mkString(","))
    val got = rs.select("st", "k", "run_sum")
      .as[(Option[String], Long, Long)].collect().toSet
    assert(got == Set(
      (Some("a"), 1L, 10L), (Some("a"), 2L, 30L),
      (None, 1L, 7L), (None, 2L, 15L), (None, 3L, 24L),
      (Some("b"), 1L, 5L)), got.toString)
  }

  test("Ranks default fan-out tracks spark.sql.shuffle.partitions with identical results") {
    import graft.ext.Ranks
    val orders = spark.read.parquet(sf("orders"))
      .select(col("o_orderkey"), col("o_totalprice"))
    val ord = Seq(col("o_totalprice"), col("o_orderkey"))
    val ref = Ranks.globalRowNumber(orders, ord, nParts = 5)
      .select("o_orderkey", "rn")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (conf <- Seq(7, 13)) {
        spark.conf.set("spark.sql.shuffle.partitions", conf.toString)
        val got = Ranks.globalRowNumber(orders, ord)
        // the rank stage's fan-out is the session conf, not a constant:
        // the broadcast offset join preserves the range partitioning
        assert(got.rdd.getNumPartitions == conf,
          s"conf=$conf got=${got.rdd.getNumPartitions}")
        assert(got.select("o_orderkey", "rn").exceptAll(ref).count() == 0 &&
          ref.exceptAll(got.select("o_orderkey", "rn")).count() == 0,
          s"conf=$conf")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("split budget arithmetic equals the naive product where naive would overflow int64") {
    // the engine computes (x * bp) div 10^4 as (x div 10^4)*bp +
    // ((x % 10^4)*bp) div 10^4 — exact identity, no wrap. Verify against
    // BigInt at values where the naive int64 product overflows (Spark
    // would silently wrap there; DuckDB throws — the oracle keeps the
    // naive form because its arithmetic is checked).
    val cases = Seq[(Long, Long)](
      (Long.MaxValue / 3, 10000L), (Long.MaxValue - 7, 8000L),
      (1234567890123456789L, 9999L), (9999L, 10000L), (0L, 5000L),
      (Long.MaxValue / 3, 999999L % 10001L))
    val got = cases.toDF("x", "bp")
      .select(expr("(x div 10000) * bp + ((x % 10000) * bp) div 10000"))
      .collect().map(_.getLong(0))
    val expect = cases.map { case (x, bp) =>
      ((BigInt(x) * bp) / 10000).toLong }
    assert(got.toSeq == expect, s"${got.toSeq} vs $expect")
  }

  test("waterfillAlloc finds the exact level: saturation, remainder, and full-budget cases") {
    import graft.ext.Corpus
    def alloc(rows: Seq[(String, Long)], bp: Long): Map[String, (Long, Boolean)] =
      Corpus.waterfillAlloc(
          rows.toDF("src", "tok").repartition(4), "src", "tok", bp)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getBoolean(3)))).toMap
    // caps 10/20/70, budget 50%: a and b saturate, c cut to the level 20
    val m1 = alloc(Seq(("a", 10L), ("b", 20L), ("c", 70L)), 5000L)
    assert(m1 == Map("a" -> ((10L, true)), "b" -> ((20L, true)),
      "c" -> ((20L, false))), m1.toString)
    // caps 10/30/40, budget 65 of 80: remainder 1 goes to the SMALLER
    // unsaturated stratum (b -> 28, c -> 27)
    val m2 = alloc(Seq(("a", 10L), ("b", 30L), ("c", 40L)), 8125L)
    assert(m2 == Map("a" -> ((10L, true)), "b" -> ((28L, false)),
      "c" -> ((27L, false))), m2.toString)
    assert(m2.values.map(_._1).sum == 65L)
    // full budget degrades to alloc = cap everywhere
    val m3 = alloc(Seq(("a", 10L), ("b", 30L), ("c", 40L)), 10000L)
    assert(m3.values.forall(v => v._2) &&
      m3.values.map(_._1).sum == 80L, m3.toString)
  }

  test("waterfillFill keeps the greedy hash-order prefix per stratum at any partition count") {
    import graft.ext.Corpus
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val ref = {
      val alloc = Corpus.waterfillAlloc(docs, "lang", "n_chars", 8000L)
        .select(col("lang"), col("alloc_tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("fill_key"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs.withColumn("fill_key", Corpus.sampleKey(col("doc_id"), "bfill"))
        .withColumn("cum_tokens", sum(col("n_chars")).over(w))
        .join(alloc, "lang")
        .where(col("cum_tokens") <= col("alloc_tokens"))
        .select("doc_id", "cum_tokens")
    }
    for (parts <- Seq(3, 8, 17)) {
      val got = Corpus.waterfillFill(docs.repartition(parts), "doc_id",
          "lang", "n_chars", 8000L, nParts = parts)
        .select("doc_id", "cum_tokens")
      assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0,
        s"nParts=$parts")
    }
  }

  test("epochCapMix caps full epochs, hands the exact remainder to the smallest keys") {
    import graft.ext.Corpus
    // strata: a=4 docs, b=2, c=10; shares a 50% / b 30% / c 20% of a
    // 2x-corpus budget (B = 32): a wants 16 -> 4 full epochs -> CAP 3
    // (12 rows, rem 0); b wants 9 -> 4 full -> cap 3 (6 rows); c wants
    // 6 -> full 0, rem 6 -> exact 6-doc downsample at 1 epoch
    val df = ((0L until 4L).map(i => (i, "a")) ++
      (10L until 12L).map(i => (i, "b")) ++
      (20L until 30L).map(i => (i, "c"))).toDF("doc_id", "stratum")
    val out = Corpus.epochCapMix(df.repartition(5), "doc_id", "stratum",
      Map("a" -> 5000L, "b" -> 3000L, "c" -> 2000L),
      budgetBp = 20000L, maxEpochs = 3)
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum == Map("a" -> 12L, "b" -> 6L, "c" -> 6L), byStratum.toString)
    // capped strata repeat EVERY doc exactly maxEpochs times
    assert(out.where(col("stratum") === "a").groupBy("doc_id").count()
      .where(col("count") =!= 3).count() == 0)
    // c's 6 kept docs are the 6 smallest salted keys of the stratum
    val gotC = out.where(col("stratum") === "c").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val refC = df.where(col("stratum") === "c")
      .select(col("doc_id"), Corpus.sampleKey(col("doc_id"), "emix").as("k"))
      .orderBy("k").limit(6).collect().map(_.getLong(0)).toSet
    assert(gotC == refC, s"$gotC vs $refC")
    // epochs are 1..n_epochs per doc
    assert(out.groupBy("doc_id", "stratum").agg(
        min(col("epoch")).as("mn"), max(col("epoch")).as("mx"),
        count(lit(1)).as("c"))
      .where(col("mn") =!= 1 || col("mx") =!= col("c")).count() == 0)
  }

  test("hostBlocklist blocks exact hosts and subdomains, reports the longest rule") {
    import graft.ext.UrlOps
    val urls = Seq(
      (1L, "https://src3.example.com/p/1"),
      (2L, "https://ads.src3.example.com/p/2"),     // subdomain of entry
      (3L, "https://notsrc3.example.com/p/3"),      // NOT a subdomain match
      (4L, "https://ads.src7.example.com/p/4"),     // exact deeper entry
      (5L, "https://src7.example.com/p/5")          // parent of an entry: kept
    ).toDF("doc_id", "url")
    val bl = Seq("src3.example.com", "ads.src7.example.com").toDF("pattern")
    val got = UrlOps.hostBlocklist(urls, "doc_id", "url", bl)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(got(1L) == ((true, Some("src3.example.com"))))
    assert(got(2L) == ((true, Some("src3.example.com"))))
    assert(got(3L) == ((false, None)), got(3L).toString)
    assert(got(4L) == ((true, Some("ads.src7.example.com"))))
    assert(got(5L) == ((false, None)))
  }

  test("CurationPipeline degrades to empty frames when every doc is cleaned away") {
    import graft.ext.{CurationPipeline, QualityModel}
    // every doc trips the C4 curly-brace gate -> cleaned is EMPTY; the
    // median-gate cutoff must yield an all-null frame (filter-to-empty),
    // never an element_at(_, 0) crash (r12 ADVICE)
    val ingest = (0L until 6L)
      .map(i => (i, s"bad { doc $i with braces. And sentences!", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val m = QualityModel.LinearModel(Array.fill(64)(0.0), 0.0, 0L)
    val st = CurationPipeline.run(ingest, m, benchOf = identity,
      urls = ingest.select(col("doc_id"),
        concat(lit("https://h.example.com/d/"),
          col("doc_id").cast("string")).as("url")),
      ranks = ingest.select(col("doc_id"), lit(0.0002).as("rank")))
    assert(st.cleaned.count() == 0)
    assert(st.scoredKeep.count() == 0, "median gate must degrade to empty")
    assert(st.ranked.count() == 0)
    assert(st.packed.count() == 0)
  }

  test("lineFreqFilter removes corpus-frequent chunks from every doc, reassembles order") {
    val d = Seq(
      (1L, "a b c d"), // "a b" in 3 docs -> dropped everywhere
      (2L, "a b x y"),
      (3L, "a b p q"),
      (4L, "u v w")    // untouched (odd-length tail chunk "w" unique)
    ).toDF("doc_id", "text")
    val out = Dedup.lineFreqFilter(d, "doc_id", "text", chunkTokens = 2,
        maxDocs = 2)
      .orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, m("c d")), (2L, 2L, 1L, m("x y")),
      (3L, 2L, 1L, m("p q")), (4L, 2L, 2L, m("u v w"))))
  }

  test("withCurationSignals matches qualityScore + languageId column-for-column") {
    import graft.ext.TextAnalysis
    val sigs = TextAnalysis.withCurationSignals(docs, "text")
      .select(col("doc_id"), col("n_tokens"), col("distinct_ratio"),
        col("stopword_ratio"), col("pred_lang"))
    val ref = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("distinct_ratio"),
        col("stopword_ratio"))
      .join(TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("pred_lang")), "doc_id")
    assert(sigs.exceptAll(ref).count() == 0 && ref.exceptAll(sigs).count() == 0)
  }

  test("winsorize clamps into the [p05,p95] band, flags honestly, partition-invariant") {
    import graft.ext.CrossStats
    import graft.core.Observations.{KeyCol, TsCol, ValueCol}
    // series a: 1..100 → p05 = 5.95, p95 = 95.05 (interpolated); the
    // spike and the trough both clamp, interior points pass untouched
    val df = (1 to 100).map(i => ("a", i, i.toDouble))
      .toDF(KeyCol, "i", ValueCol)
      .select(col(KeyCol), to_timestamp(lit("2024-01-01 00:00:00")).as(TsCol),
        col(ValueCol))
    val out = CrossStats.winsorize(df).orderBy(ValueCol)
      .select(ValueCol, "value_w", "clipped")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(out.count(_._3 == 1L) == 10) // 1..5 and 96..100 clip
    assert(out.filter(_._3 == 0L).forall { case (v, w, _) => v == w })
    assert(out.take(5).forall(_._2 == 5.95))
    assert(out.takeRight(5).forall(_._2 == 95.05))
    val rep = CrossStats.winsorize(df.repartition(9)).orderBy(ValueCol)
      .select(ValueCol, "value_w", "clipped")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(rep.toSeq == out.toSeq)
  }

  test("bigramTopK counts adjacent pairs with tie-break; short docs contribute none") {
    import graft.ext.TextAnalysis
    val d = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramTopK(d, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a b": doc1×2 + doc2×1 = 3; then "b a" 1, "b c" 1 (tie → asc)
    assert(out.toSeq == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("acf1ByKey: ramp gives +1, alternation gives -1, partition-invariant") {
    import graft.ext.CrossStats
    val rows = (1 to 5).map(i => ("ramp", i.toLong, i.toLong, i.toDouble)) ++
      (1 to 5).map(i => ("alt", i.toLong, i.toLong, (i % 2).toDouble))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      CrossStats.acf1ByKey(d, "user_id", "ts", "event_id", "value")
        .orderBy("series_key")
        .select(col("series_key"), col("n"), round(col("acf1"), 6).as("a"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val out = run(df)
    assert(out.toSeq == Seq(("alt", 4L, -1.0), ("ramp", 4L, 1.0)))
    assert(run(df.repartition(7)).toSeq == out.toSeq)
  }

  test("cusumChangepoint lands on the planted level shift; flat series picks earliest tie") {
    import graft.ext.CrossStats
    // series a: 10 points at 1.0 then 10 at 5.0 → the statistic peaks at
    // k=10 (the last pre-shift index); series b flat → all |n·Sk − k·Sn|
    // are 0, tie resolves to k=1
    val rows = (1 to 20).map(i =>
        ("a", i.toLong, i.toLong, if (i <= 10) 1.0 else 5.0)) ++
      (1 to 6).map(i => ("b", i.toLong, i.toLong, 2.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      CrossStats.cusumChangepoint(d, "user_id", "ts", "event_id", "value")
        .orderBy("series_key")
        .select(col("series_key"), col("n"), col("cp_idx"),
          round(col("cusum_stat"), 6).as("st"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          r.getDouble(3)))
    val out = run(df)
    // a at k=10: |20·10 − 10·60| / 20 = 400/20 = 20
    assert(out.toSeq == Seq(("a", 20L, 10, 20.0), ("b", 6L, 1, 0.0)))
    assert(run(df.repartition(7)).toSeq == out.toSeq)
  }

  test("bigramNll scores word-salad above repeated-phrase text; partition-invariant") {
    import graft.ext.TextAnalysis
    // both docs share the SAME unigrams — only the bigram structure
    // differs: doc 1 is the dominant "a b" alternation, doc 2 scrambles
    // the order so its aa/bb bigrams are corpus-rare. (An all-unique
    // salad would self-score 0: every unique bigram is a deterministic
    // continuation of its unique head — the score is conditional.)
    val phrase = Seq.fill(30)("a b").mkString(" ")
    val salad = Seq.fill(10)("a a b b").mkString(" ")
    val d = Seq((1L, phrase), (2L, salad)).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(d, "doc_id", "text")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(_._1) == Seq(1L, 2L))
    val (nllPhrase, nllSalad) = (out(0)._3, out(1)._3)
    assert(nllSalad > nllPhrase + 0.4,
      s"salad $nllSalad should far exceed phrase $nllPhrase")
    val rep = TextAnalysis.bigramNll(d.repartition(5), "doc_id", "text")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rep == out)
  }

  test("lmScore: known bigrams cost ln(c1/c2), OOV takes the backoff, oov_frac honest") {
    import graft.ext.TextAnalysis
    // LM = doc 1 ("a b a b a b"): c2(ab)=3, c2(ba)=2, c1(a)=3, c1(b)=2,
    // N=6. doc 2's bigrams are all known at probability 1 → nll 0;
    // doc 3 is fully OOV → every token costs ln((6+1)/(0.4·1)) = ln 17.5
    val d = Seq((1L, "a b a b a b", true), (2L, "a b a b", false),
      (3L, "x y x y", false)).toDF("doc_id", "text", "is_lm")
    val out = TextAnalysis.lmScore(d, "doc_id", "text", col("is_lm"))
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ln175 = math.floor(math.log(17.5) * 1e6 + 0.5) / 1e6 // 2.862201
    assert(out.toSeq == Seq((1L, 5L, 0.0, 0.0), (2L, 3L, 0.0, 0.0),
      (3L, 3L, ln175, 1.0)), s"got ${out.toSeq}")
    val rep = TextAnalysis.lmScore(d.repartition(5), "doc_id", "text",
        col("is_lm")).orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rep.toSeq == out.toSeq)
  }

  test("containmentPairs finds the planted fragment-in-host pair Jaccard misses") {
    import graft.ext.Dedup
    // doc 1 is a 12-word fragment; doc 2 embeds it verbatim inside 28
    // extra words → containment(1→2) = 1.0 while Jaccard ≈ 10/38 ≈ 0.26;
    // doc 3 is unrelated
    val frag = (1 to 12).map(i => s"w$i").mkString(" ")
    val host = (101 to 115).map(i => s"x$i").mkString(" ") + " " + frag +
      " " + (201 to 214).map(i => s"y$i").mkString(" ")
    val other = (301 to 330).map(i => s"z$i").mkString(" ")
    val d = Seq((1L, frag), (2L, host), (3L, other)).toDF("doc_id", "text")
    val sh = Dedup.hashedShingles(d, "doc_id", "text", 3)
    val jac = Dedup.jaccardPairs(sh, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(jac.isEmpty, "symmetric Jaccard must miss the fragment pair")
    val con = Dedup.containmentPairs(sh, 0.8)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(con == Set((1L, 2L, 1.0)), s"got $con")
  }

  test("crossMinhashPairs catches the edited leak, ignores foreign bench " +
      "docs, and never pairs within a side") {
    import graft.ext.Dedup
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val train = Seq(
      (1L, base),                                       // leaked (edited) below
      (2L, (101 to 130).map(i => s"a$i").mkString(" ")), // unrelated
      (3L, base)                                         // near-dup of 1 INSIDE train: must not pair
    ).toDF("doc_id", "text")
    val bench = Seq(
      // doc 1 with the first word dropped — exact-prefix matching breaks,
      // shingle Jaccard stays ~ (m-1)/m
      (1000001L, (2 to 30).map(i => s"tok$i").mkString(" ")),
      (1000002L, (501 to 530).map(i => s"q$i").mkString(" "))) // foreign
      .toDF("doc_id", "text")
    val pairs = Dedup.crossMinhashPairs(train, bench, "doc_id", "text",
        minJ = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // both verbatim variants of the base text match the edited leak;
    // nothing matches the foreign doc, no train-train / bench-bench pair
    assert(pairs === Set((1L, 1000001L), (3L, 1000001L)), s"got $pairs")
    val j = Dedup.crossMinhashPairs(train, bench, "doc_id", "text", 0.5)
      .where($"doc_a" === 1L).select("jaccard").as[Double].collect().head
    // 30 tokens → 28 distinct shingles; dropping w1 removes exactly 1
    assert(math.abs(j - 27.0 / 28.0) < 1e-9, s"jaccard $j")
  }

  test("packSequences spans cuts correctly and is bucketWidth-invariant") {
    import graft.ext.Corpus
    // token counts 3, 5, 4 with seqLen 4:
    //   doc 1: [0,3)  → seq 0 only, offset 0
    //   doc 2: [3,8)  → seqs 0..1, offset 3
    //   doc 3: [8,12) → seq 2 only, offset 0
    val d = Seq((1L, "a b c"), (2L, "d e f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val out = Corpus.packSequences(d, "doc_id", "text", seqLen = 4L)
      .orderBy("doc")
      .select("doc", "n_tokens", "start_offset", "seq_start", "seq_end",
        "offset_in_seq", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L, 0L, 1L),
      (2L, 5L, 3L, 0L, 1L, 3L, 2L),
      (3L, 4L, 8L, 2L, 2L, 0L, 1L)))
    val narrow = Corpus.packSequences(d, "doc_id", "text", seqLen = 4L,
        bucketWidth = 1L).orderBy("doc")
      .select("doc", "n_tokens", "start_offset", "seq_start", "seq_end",
        "offset_in_seq", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(narrow.toSeq == out.toSeq)
  }

  test("nearestCentroid assigns planted clusters exactly; ties go to the smaller key") {
    // two tight clusters around (0,0) and (10,10); a probe point at the
    // exact midpoint must tie-break to label 0
    val rows = Seq(
      (1L, Array(0.1f, -0.1f), 0), (2L, Array(-0.1f, 0.1f), 0),
      (3L, Array(10.1f, 9.9f), 1), (4L, Array(9.9f, 10.1f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.nearestCentroid(df, "vec_id", "label", "embedding")
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
    // midpoint probe: equidistant from both centroids → assigned 0
    val mid = rows :+ ((5L, Array(5.0f, 5.0f), 9))
    val out2 = Similarity.nearestCentroid(mid.toDF("vec_id", "embedding", "label"),
        "vec_id", "label", "embedding")
      .where(col("vec_id") === 5L).collect().map(_.getLong(1))
    // label 9's centroid IS the probe itself (dist 0) — drop it from the
    // planted check by probing with only the two real clusters instead
    assert(out2.toSeq == Seq(9L))
    val centsOnly = rows.toDF("vec_id", "embedding", "label")
      .union(Seq((5L, Array(5.0f, 5.0f), 0), (6L, Array(5.0f, 5.0f), 1))
        .toDF("vec_id", "embedding", "label"))
    // both centroids shift identically toward the midpoint → still
    // symmetric; the two midpoint probes tie and both resolve to label 0
    val out3 = Similarity.nearestCentroid(centsOnly, "vec_id", "label", "embedding")
      .where(col("vec_id") >= 5L).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out3.toSeq == Seq((5L, 0L), (6L, 0L)))
  }

  test("c4Rules: line keeps and every page gate on a hand fixture") {
    import graft.ext.TextAnalysis
    val d1 = "This has four words.\nshort line.\n" +
      "Nice use of javascript here.\n" +
      "Another good sentence here. And more. Plus more. Four! Five? Six."
    val d2 = "lorem ipsum dolor sit amet. Fine sentence two here. " +
      "Three here. Four here. Plus a fifth one right here."
    val d3 = "code with a { brace. And enough more sentences. Three. " +
      "Four. Five here now."
    val d4 = "a damnedword appears right here. second sentence is here. " +
      "third one here. fourth one here. fifth one here."
    val out = TextAnalysis.c4Rules(
        Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4)).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    // line 2 (<3 words) and line 3 ("javascript") drop; 1 and 4 stay
    assert(r1.getLong(1) == 4L && r1.getLong(2) == 2L, s"line keeps: $r1")
    assert(r1.getLong(3) == 7L, s"sentence count: $r1")
    assert(r1.getBoolean(8), s"clean page must keep: $r1")
    assert(!out(1).getBoolean(8) && out(1).getBoolean(4), "lorem gate")
    assert(!out(2).getBoolean(8) && out(2).getBoolean(5), "brace gate")
    assert(!out(3).getBoolean(8) && out(3).getBoolean(6), "blocklist gate")
  }

  test("canonicalUrl: RFC normalization subset on hand fixtures") {
    import graft.ext.UrlOps
    val cases = Seq(
      // case + default port + trailing slash + tracking params + fragment
      ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=3&ref=y#frag",
        "https://www.example.com/a/b?id=3"),
      // empty path normalizes to "/", http default port strips
      ("http://Host:80", "http://host/"),
      // tracking-only query drops entirely (no dangling '?')
      ("https://h/p?utm_a=1&ref=z", "https://h/p"),
      // non-default port and content query survive; param order kept
      ("https://h:8443/p?b=2&a=1", "https://h:8443/p?b=2&a=1"),
      // malformed inputs pass through UNCHANGED (r12 ADVICE): no scheme,
      // relative path, empty host — distinct keys must stay distinct
      ("example.com/page?utm_x=1", "example.com/page?utm_x=1"),
      ("/just/a/path#frag", "/just/a/path#frag"),
      ("https:///no-host/p", "https:///no-host/p"))
    val out = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), UrlOps.canonicalUrl(col("url")).as("c"))
      .orderBy("id").collect().map(_.getString(1))
    cases.zip(out).foreach { case ((u, want), got) =>
      assert(got == want, s"canon($u) = $got, want $want")
    }
    // keeper = min id per canonical form
    val dup = Seq((5L, "https://h/x?utm_s=1"), (9L, "https://H/x#f"),
      (3L, "https://h/y")).toDF("doc_id", "url")
    val dd = UrlOps.urlDedup(dup, "doc_id", "url")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    assert(dd.toSeq == Seq((3L, true), (5L, true), (9L, false)), dd.toSeq)
  }

  test("langIdTrained: separable char profiles predict perfectly") {
    import graft.ext.TextAnalysis
    // two langs with disjoint character inventories — trigram NB must
    // recover the labels exactly; partition-invariant
    val docs = (0L until 40L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val word = if (i % 2 == 0) "alpha" else "zubor"
      (i, lang, Seq.fill(6)(word + (i % 3)).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    def run(parts: Int) = TextAnalysis.langIdTrained(
        docs.repartition(parts), "doc_id", "text", "lang")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val a = run(1)
    assert(a.forall { case (_, lang, pred, _) => lang == pred },
      s"separable corpus must classify perfectly: ${a.take(4).toSeq}")
    assert(a.toSeq == run(7).toSeq, "langIdTrained must be partition-invariant")
  }

  test("langIdTrained keeps no-trigram docs via the prior-argmax fallback") {
    import graft.ext.TextAnalysis
    // docs 4 and 5 have no char trigram (empty / 2-char text) — they
    // must still appear, predicted as the prior argmax ('aa' has 4 of 6
    // docs), never be silently dropped by an inner join (r12 ADVICE)
    val docs = Seq(
      (0L, "aa", "alpha alpha alpha"), (1L, "aa", "alpha alpha again"),
      (2L, "aa", "alpha alpha more"), (3L, "bb", "zubor zubor zubor"),
      (4L, "bb", ""), (5L, "aa", "zu"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdTrained(docs, "doc_id", "text", "lang")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    assert(out.length == 6, "no silent row loss")
    val expScore = math.floor(math.log(4.0 / 6.0) * 1e6 + 0.5) / 1e6
    for (d <- Seq(4, 5)) {
      assert(out(d)._2 == "aa", s"doc $d fallback pred: ${out(d)}")
      assert(out(d)._3 == expScore, s"doc $d fallback score: ${out(d)}")
    }
  }

  test("c4Clean: rewriting form agrees with c4Rules verdict and kept text") {
    import graft.ext.TextAnalysis
    val d1 = "This has four words.\nshort line.\n" +
      "Nice use of javascript here.\n" +
      "Another good sentence here. And more. Plus more. Four! Five? Six."
    val d2 = "lorem ipsum dolor sit amet. Fine sentence two here. " +
      "Three here. Four here. Plus a fifth one right here."
    val d3 = "code with a { brace. And enough more sentences. Three. " +
      "Four. Five here now."
    val df = Seq((1L, d1, "en"), (2L, d2, "de"), (3L, d3, "es"))
      .toDF("doc_id", "text", "lang")
    val rules = TextAnalysis.c4Rules(df, "doc_id", "text")
      .select(col("doc_id"), col("kept_md5"), col("c4_keep"))
    val clean = TextAnalysis.c4Clean(df, "doc_id", "text",
      carry = Seq("lang"))
    val j = clean.join(rules, "doc_id").orderBy("doc_id").collect()
    j.foreach { r =>
      assert(r.getAs[Boolean]("c4_keep") ==
        rules.where(col("doc_id") === r.getAs[Long]("doc_id"))
          .head().getAs[Boolean]("c4_keep"))
    }
    // the emitted cleaned text IS the text c4Rules fingerprinted
    val md = clean.select(col("doc_id"), md5(col("c4_text")).as("m"))
      .join(rules, "doc_id")
      .where(col("m") =!= col("kept_md5")).count()
    assert(md == 0L, "c4_text must hash to c4Rules' kept_md5")
    // carry column survives; keep verdict matches the hand fixture
    val out = clean.orderBy("doc_id").collect()
    assert(out(0).getAs[String]("lang") == "en")
    assert(out(0).getAs[Boolean]("c4_keep"))
    assert(!out(1).getAs[Boolean]("c4_keep") &&
      !out(2).getAs[Boolean]("c4_keep"))
  }

  test("kn3Nll: repeated-trigram doc scores lower; partition-invariant") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (1L, "a b c a b c a b c"),   // one trigram pattern, tf-heavy
      (2L, "p q r s t u v w x"))   // every trigram unique
    val run = (parts: Int) => TextAnalysis.kn3Nll(
        Seq(docs: _*).toDF("doc_id", "text").repartition(parts),
        "doc_id", "text")
      .orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run(1)
    assert(a.map(_._2) == Seq(7L, 7L), s"trigram counts: $a")
    assert(a(0)._3 < a(1)._3, s"repetition must score lower: $a")
    assert(a == run(7), "kn3Nll must be partition-invariant")
  }

  test("pageRank: hand-computed one-round ranks; partition-invariant") {
    import graft.ext.Graph
    // 0 -> 1, 1 -> 0, 2 -> 0; n = 3, r0 = 0.333333, base = 0.15…/3
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val out = Graph.pageRank(edges, nodes, iters = 1)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // node 0 receives 2 contributions of 0.333333: 0.05 + 0.85·0.666666
    assert(out(0) == ((0L, 0.616666, 2L, 1L)), s"node 0: ${out.toSeq}")
    assert(out(1) == ((1L, 0.333333, 1L, 1L)), s"node 1: ${out.toSeq}")
    // node 2 has no in-links: the teleport floor
    assert(out(2) == ((2L, 0.05, 0L, 1L)), s"node 2: ${out.toSeq}")
    // exactness claim: 8 rounds over a 200-node graph, bit-equal across
    // partitionings (decimal contribution sums; grid updates)
    val big = (0L until 200L).flatMap(i =>
      (1L to (1 + i % 3)).map(c => (i, (i + c * 17) % 200L)))
      .toDF("src", "dst")
    val bigNodes = (0L until 200L).toDF("node")
    def run(parts: Int) = Graph.pageRank(big.repartition(parts), bigNodes,
        iters = 8)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    assert(run(1) == run(7), "ranks must be partition-invariant")
  }

  test("pageRank: dangling mass redistributes uniformly, conserving mass") {
    import graft.ext.Graph
    // node 2 has NO out-links: canonical semantics — its mass is spread
    // uniformly each round (random surfer jumps anywhere from a sink),
    // so total mass stays ≡ 1 up to per-node grid drift; out_deg 0
    val edges = Seq((0L, 2L), (1L, 2L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val out = Graph.pageRank(edges, nodes, iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // iter1: D = 0.333333, ds = rp(D/3) = 0.111111;
    //   r2 = rp(0.05 + 0.85·(0.666666 + 0.111111)) = 0.711110
    //   r0 = r1 = rp(0.05 + 0.85·0.111111) = 0.144444
    // iter2: D = 0.711110, ds = rp(D/3) = 0.237037;
    //   r2 = rp(0.05 + 0.85·(0.288888 + 0.237037)) = 0.497036
    //   r0 = r1 = rp(0.05 + 0.85·0.237037) = 0.251481
    assert(out(2)._1 == 2L && out(2)._3 == 2L && out(2)._4 == 0L,
      s"dangling node accounting: ${out.toSeq}")
    assert(out(2)._2 == 0.497036, s"sink rank after two rounds: ${out.toSeq}")
    assert(out(0)._2 == 0.251481 && out(1)._2 == 0.251481,
      s"redistributed share must reach link-less nodes: ${out.toSeq}")
    // mass conserved within per-node grid drift (n quanta)
    assert(math.abs(out.map(_._2).sum - 1.0) <= 3e-6,
      s"mass must be conserved: ${out.toSeq}")
    // dangling-free graphs are bit-unchanged by the redistribution term
    // (share exactly 0.0): the hand-computed spec above pins that; here
    // pin partition-invariance WITH a dangling stratum at 200 nodes
    val big = (0L until 200L).filter(_ % 3 != 0L).flatMap(i =>
      (1L to (1 + i % 3)).map(c => (i, (i + c * 17) % 200L)))
      .toDF("src", "dst")
    val bigNodes = (0L until 200L).toDF("node")
    def run(parts: Int) = Graph.pageRank(big.repartition(parts), bigNodes,
        iters = 8)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    val a = run(1)
    assert(a == run(7), "dangling ranks must be partition-invariant")
    assert(math.abs(a.sum - 1.0) <= 200e-6,
      s"dangling mass must be conserved at 200 nodes: ${a.sum}")
  }

  test("pageRank: gridDp guard refuses a collapsed grid") {
    import graft.ext.Graph
    // quantum >= 1/n means ranks collapse onto the grid — must refuse
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val nodes = (0L until 20L).toDF("node")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(edges, nodes, iters = 1, gridDp = 1)
    }
    assert(e.getMessage.contains("collapse"), e.getMessage)
  }

  test("shufflePack: matches a single-window reference; seed reshuffles") {
    import graft.ext.Corpus
    val docs = (0L until 100L).map(i =>
      (i, (0 to (i % 7).toInt).map(j => s"w${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val out = Corpus.shufflePack(df, "doc_id", "text", "s1", 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // driver-side reference: sort by (md5 key, doc), running sum
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long) = md.digest(s"s1:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ref = docs.map { case (i, t) => (i, key(i), t.split(" ").length.toLong) }
      .sortBy(x => (x._2, x._1))
      .scanLeft((0L, "", 0L, 0L)) { case ((_, _, _, acc), (i, k, n)) =>
        (i, k, n, acc + n) }
      .drop(1)
      .map { case (i, k, n, end) => (i, k, n, end - n, (end - n) / 10L) }
      .sortBy(_._1)
    assert(out.toSeq == ref, "decomposed prefix sum != single-window reference")
    val out2 = Corpus.shufflePack(df, "doc_id", "text", "s2", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(out.map(r => (r._1, r._4)).toSeq != out2.toSeq,
      "different seed must produce a different order")
  }

  test("write-time stats manifest equals stats re-derived from the data files") {
    // the oracle only proves manifest-pruned reads return the right
    // rows; this pins the manifest VALUES themselves — every per-file
    // min/max/count persisted at write time must equal what a full
    // scan of the files derives (the doc_zorder_skipping_mat audit
    // path), file by file, for all three layouts
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("doc_zorder_manifest_prune")(spark, dir).collect()
    // the layouts live under this JVM's graft_scratch_* temp dir
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    // a leftover dir from a crashed pre-r15 JVM (no _stats child) or a
    // concurrently running JVM can also match the name pattern — keep
    // only candidates that actually carry the write-time manifest for
    // all three layouts, newest first
    val matDirs = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_scratch_"))
      .flatMap(s => Option(s.listFiles()).getOrElse(Array.empty))
      .filter(f => f.isDirectory && f.getName.startsWith("graft_zorder_mat_")
        && f.getName.contains("sf0.001")
        && Seq("zorder", "linear", "hash").forall(t =>
          new java.io.File(f, s"$t/_stats").isDirectory))
      .sortBy(-_.lastModified())
    assert(matDirs.nonEmpty, "no materialized layout root found")
    for (tag <- Seq("zorder", "linear", "hash")) {
      val base = s"${matDirs.head}/$tag"
      val manifest = spark.read.parquet(s"$base/_stats")
        .select(col("file_id"), col("b1_min"), col("b1_max"),
          col("b2_min"), col("b2_max"), col("n_rows"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val derived = spark.read.parquet(base)
        .groupBy(col("file_id").cast("long").as("file_id"))
        .agg(min(col("b1")).as("b1_min"), max(col("b1")).as("b1_max"),
          min(col("b2")).as("b2_min"), max(col("b2")).as("b2_max"),
          count(lit(1)).as("n_rows"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(manifest == derived, s"$tag manifest != derived stats")
      assert(manifest.nonEmpty)
    }
  }

  test("ZTable OCC: interleaved append+optimize rebases on disjoint commits, aborts on overlap, never loses rows; vacuum over the committed log is safe") {
    import graft.ext.ZTable
    val p = "/tmp/graft_test_ztable_occ"
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    rmr(new java.io.File(p))
    val table = s"$p/table"
    val root = s"$p/_log"
    def mk(n: Int, idOff: Long, b1f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column, b2f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column) =
      spark.range(n).select((col("id") + idOff).as("doc_id"),
        b1f(col("id")).as("b1"), b2f(col("id")).as("b2"),
        (col("id") + 1).as("_rk"))
    // base: b2 in [0,127]; A1 hot append: b2 in [200,239]
    val base = mk(400, 0L, i => pmod(i * 13, lit(256L)),
      i => pmod(i * 7, lit(128L)))
    val stBase = ZTable.writeFiles(base, "_rk", nFiles = 8, offset = 0,
      out = table)
    assert(ZTable.logCommit(spark, root, -1L, stBase) == 0L)
    val a1 = mk(100, 10000L, i => pmod(i * 11, lit(256L)),
      i => lit(200L) + pmod(i, lit(40L)))
    val stA1 = ZTable.writeFiles(a1, "_rk", nFiles = 2, offset = 100,
      out = table, mode = "append")
    assert(ZTable.commitAppend(spark, root, 0L, stA1) == 1L)
    // ---- interleave 1: optimizer O1 reads v1; appender A2 (box
    // DISJOINT from O1's) commits first; O1 rebases and serializes ----
    val man1 = ZTable.logRead(spark, root, 1L).collect()
    val isApp1 = (r: org.apache.spark.sql.Row) =>
      r.getAs[Long]("file_id") >= 100 && r.getAs[Long]("file_id") < 200
    val box1 = ZTable.appendedBox(man1, isApp1)
    assert(box1._3 >= 200L, s"A1 box must sit in the hot region: $box1")
    // incrementalOptimize both WRITES the rewrite files and returns the
    // STALE v1-based combined manifest — exactly what the single-file
    // overwrite would have persisted
    val (staleManDf, _, _) = ZTable.incrementalOptimize(spark,
      ZTable.logRead(spark, root, 1L), isApp1, table, newOffset = 1000)
    val staleMan = staleManDf.collect()
    val staleIds = staleMan.map(_.getAs[Long]("file_id")).toSet
    val rwIds1 = man1.map(_.getAs[Long]("file_id")).toSet -- staleIds
    assert(rwIds1.nonEmpty && rwIds1.forall(id => id >= 100 && id < 200),
      s"O1 must rewrite exactly (a subset of) A1's files: $rwIds1")
    val stNew1 = staleManDf.where(col("file_id") >= 1000)
    // concurrent appender A2: b2 in [0,63] — outside O1's box
    val a2 = mk(60, 20000L, i => pmod(i * 5, lit(256L)),
      i => pmod(i, lit(64L)))
    val stA2 = ZTable.writeFiles(a2, "_rk", nFiles = 2, offset = 200,
      out = table, mode = "append")
    assert(ZTable.commitAppend(spark, root, 1L, stA2) == 2L)
    // O1 commits at its read snapshot v1 → conflict → disjoint → rebase
    val v3 = ZTable.commitOptimize(spark, root, 1L, rwIds1, stNew1, box1)
    assert(v3 == 3L)
    val man3 = ZTable.logRead(spark, root, 3L).collect()
    val man3Ids = man3.map(_.getAs[Long]("file_id")).toSet
    assert(Set(200L, 201L).subsetOf(man3Ids),
      "rebase must carry the concurrent append's rows (lost update)")
    assert((rwIds1 & man3Ids).isEmpty, "rewritten files must be gone")
    // the hazard the protocol prevents, made concrete: the stale
    // manifest LACKS A2's files, so a VACUUM against it would DELETE
    // A2's live data
    assert((Set(200L, 201L) & staleIds).isEmpty)
    val stalePaths = staleMan.map(_.getAs[String]("path")).toSet
    val a2Paths = stA2.collect().map(_.getAs[String]("path")).toSet
    val wouldDelete = ZTable.listDataFiles(spark, table)
      .filterNot(stalePaths).toSet
    assert(a2Paths.subsetOf(wouldDelete),
      "single-file-overwrite hazard: stale manifest orphans A2's live files")
    // ---- interleave 2: optimizer O2 reads v3; appender A3 lands
    // INSIDE O2's box first → O2 must ABORT (stale selection) ----
    val isApp2 = (r: org.apache.spark.sql.Row) =>
      r.getAs[Long]("file_id") >= 200 && r.getAs[Long]("file_id") < 300
    val box2 = ZTable.appendedBox(man3, isApp2)
    val (staleMan2Df, _, _) = ZTable.incrementalOptimize(spark,
      ZTable.logRead(spark, root, 3L), isApp2, table, newOffset = 2000)
    val stale2Ids = staleMan2Df.collect().map(_.getAs[Long]("file_id")).toSet
    val rwIds2 = man3Ids -- stale2Ids
    val stNew2 = staleMan2Df.where(col("file_id") >= 2000)
    val a3 = mk(40, 30000L, i => pmod(i * 3, lit(256L)),
      i => pmod(i, lit(64L)))
    val stA3 = ZTable.writeFiles(a3, "_rk", nFiles = 1, offset = 300,
      out = table, mode = "append")
    assert(ZTable.commitAppend(spark, root, 3L, stA3) == 4L)
    intercept[graft.ext.ZTable.OptimizeSuperseded] {
      ZTable.commitOptimize(spark, root, 3L, rwIds2, stNew2, box2)
    }
    // re-select from the fresh latest: the OCC loop picks up A3's files
    // (they intersect the box) and commits; the superseded attempt's
    // offset-2000 files stay orphaned until vacuum
    val (v5, nF, nR, aborts) = ZTable.incrementalOptimizeOcc(spark, root,
      table, r => { val f = r.getAs[Long]("file_id"); f >= 200 && f < 1000 },
      newOffset = 3000)
    assert(v5 == 5L && aborts == 0L)
    val man5 = ZTable.logRead(spark, root, 5L).collect()
    val man5Ids = man5.map(_.getAs[Long]("file_id")).toSet
    assert(!man5Ids.exists(id => id >= 200 && id < 400),
      "A2+A3 files must have been rewritten in the re-selected pass")
    assert(nR == 400L + 60L + 40L,
      s"re-selection must cover base-in-box + A2 + A3 rows, got $nR")
    // ---- no lost rows: manifest accounting == logical row set ----
    assert(man5.map(_.getAs[Long]("n_rows")).sum == 600L)
    // box truth through the committed log: prune v5's manifest with the
    // cold region box and reproduce the logical frame's aggregate
    val logical = base.unionByName(a1).unionByName(a2).unionByName(a3)
      .select(col("doc_id"), col("b1"), col("b2"))
      .localCheckpoint(true)
    def boxTruth(lo2: Long, hi2: Long): (Long, Long) = {
      val survivors = ZTable.pruneManifest(man5, 0L, 255L, lo2, hi2)
        .map(_.getAs[String]("path")).sorted.toSeq
      val r = spark.read.parquet(survivors: _*)
        .where(col("b2").between(lo2, hi2))
        .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val exp = logical.where(col("b2").between(0L, 63L))
      .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).head()
    assert(boxTruth(0L, 63L) == ((exp.getLong(0), exp.getLong(1))))
    // ---- VACUUM against the COMMITTED latest: reclaims the replaced
    // files and the superseded attempt's orphans, touches nothing live
    val (before, deleted) = ZTable.vacuum(spark, table,
      ZTable.logRead(spark, root, 5L))
    assert(deleted > 0L && before - deleted == man5.length.toLong)
    assert(ZTable.listDataFiles(spark, table).length == man5.length)
    assert(boxTruth(0L, 63L) == ((exp.getLong(0), exp.getLong(1))),
      "vacuum against the committed log must not touch live data")
  }

  test("ZTable OCC: claim file arbitrates racing appenders; logRecover frees a crashed claim") {
    import graft.ext.ZTable
    val p = "/tmp/graft_test_ztable_occ_race"
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    rmr(new java.io.File(p))
    val root = s"$p/_log"
    import spark.implicits._
    def man(fid: Long) = Seq((fid, s"p$fid", 0L, 1L, 0L, 1L, 1L))
      .toDF("file_id", "path", "b1_min", "b1_max", "b2_min", "b2_max",
        "n_rows")
    assert(ZTable.logCommit(spark, root, -1L, man(0L)) == 0L)
    // four appenders race from the SAME read snapshot; the claim file is
    // the arbiter — every loser rebases, all four rows land
    val readV = ZTable.logLatest(spark, root)
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        // generous retry budget: on a noisy host a loser can lose the
        // claim race many times in a row (observed: 10 retries exhausted
        // under an I/O stall — a liveness flake, not an arbitration bug;
        // the assertions below are about arbitration)
        ZTable.commitAppend(spark, root, readV, man(i.toLong),
          maxRetries = 50): Unit
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(ZTable.logLatest(spark, root) == 4L)
    val ids = ZTable.logRead(spark, root, 4L).collect()
      .map(_.getAs[Long]("file_id")).toSet
    assert(ids == Set(0L, 1L, 2L, 3L, 4L),
      s"every racing append must serialize into the log: $ids")
    // crashed claim: slot v=5 claimed but never written — commits block
    // on the slot until logRecover frees it
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$root/_claim_5"), false).close()
    intercept[graft.ext.ZTable.ManifestConflict] {
      ZTable.logCommit(spark, root, 4L, man(9L))
    }
    ZTable.logRecover(spark, root)
    assert(ZTable.commitAppend(spark, root, 4L, man(9L)) == 5L)
  }

  test("ZTable txn markers + retention vacuum: a replayed batch commits " +
      "nothing, a pre-commit retry never doubles a file dir, and time " +
      "travel survives inside the retention window") {
    import graft.ext.ZTable
    val p = "/tmp/graft_test_ztable_txn"
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmr))
      f.delete(): Unit
    }
    rmr(new java.io.File(p))
    val table = s"$p/table"
    val root = s"$p/_log"
    def mk(n: Int, idOff: Long) = spark.range(n)
      .select((col("id") + idOff).as("doc_id"),
        pmod(col("id") * 13, lit(256L)).as("b1"),
        pmod(col("id") * 7, lit(256L)).as("b2"),
        (col("id") + 1).as("_rk"))
    val b0 = mk(100, 0L)
    assert(ZTable.appendBatchTxn(spark, table, root, "app", 0L, b0,
      "_rk", nFiles = 2, offset = 0) == (0L, true))
    // pre-commit crash replay: batch 1's data lands but the log never
    // advances; the retry's dynamic overwrite rewrites exactly its own
    // dirs (writeFiles' one-file-per-dir require would blow on a double)
    val b1 = mk(80, 1000L)
    ZTable.writeFiles(b1, "_rk", nFiles = 2, offset = 10, out = table,
      dynamicOverwrite = true): Unit
    assert(ZTable.appendBatchTxn(spark, table, root, "app", 1L, b1,
      "_rk", nFiles = 2, offset = 10) == (1L, true))
    // post-commit replay: the txn marker short-circuits before any write
    assert(ZTable.appendBatchTxn(spark, table, root, "app", 1L, b1,
      "_rk", nFiles = 2, offset = 10) == (1L, false))
    assert(ZTable.logLatest(spark, root) == 1L)
    val b2 = mk(60, 2000L)
    assert(ZTable.appendBatchTxn(spark, table, root, "app", 2L, b2,
      "_rk", nFiles = 2, offset = 20) == (2L, true))
    // exactly-once audit: zero orphans, disk ≡ manifest, content once
    val man2 = ZTable.logRead(spark, root, 2L)
    val (_, orphans) = ZTable.vacuum(spark, table, man2)
    assert(orphans == 0L, "replays must leave no orphan data files")
    assert(ZTable.listDataFiles(spark, table).length == man2.count())
    def rowsAt(v: Long) = spark.read.parquet(
      ZTable.logRead(spark, root, v).collect()
        .map(_.getAs[String]("path")).toSeq: _*).count()
    assert(rowsAt(2L) == 240L)
    // v3 compacts batch 0 (files 0,1 leave the manifest, file 30 joins)
    val stRw = ZTable.writeFiles(mk(100, 0L), "_rk", nFiles = 1,
      offset = 30, out = table, mode = "append")
    val man3df = man2.where(!col("file_id").isInCollection(Set(0L, 1L)))
      .unionByName(stRw, allowMissingColumns = true)
    assert(ZTable.logCommit(spark, root, 2L, man3df) == 3L)
    // retention floor v2: v2 still references files 0,1 → they survive
    val (_, del0) = ZTable.vacuumRetain(spark, table, root, 2L)
    assert(del0 == 0L, "files inside the retention window must survive")
    assert(rowsAt(2L) == 240L, "time travel at a retained version")
    // retention floor v3: v2 expires, exactly the replaced files go
    val (_, del1) = ZTable.vacuumRetain(spark, table, root, 3L)
    assert(del1 == 2L, s"exactly batch 0's replaced files expire: $del1")
    assert(rowsAt(3L) == 240L, "the live snapshot is untouched")
  }
}
