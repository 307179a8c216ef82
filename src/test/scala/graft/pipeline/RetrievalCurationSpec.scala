package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.StringExpressions

/** Unit semantics for the round-12 curation additions: BM25 retrieval,
  * paragraph-level dedup, Unicode normalization, and BPE pair counts —
  * each pinned against hand-computed expectations on tiny fixtures (the
  * sf0.01 oracle gate covers corpus-scale parity). */
class RetrievalCurationSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------- BM25

  test("bm25: rarer term dominates, rank deterministic, k respected") {
    // d1 matches 'cat' (df=1), d2+d3 match 'dog' (df=2): idf(cat) >
    // idf(dog), equal tf/dl => d1 outranks; d2 < d3 only via id tiebreak
    val docs = Seq(
      (1L, "cat runs"), (2L, "dog runs"), (3L, "dog walks"),
      (4L, "bird sings")).toDF("id", "text")
    val qs = Seq((10, "cat dog")).toDF("qid", "q")
    val out = Retrieval.bm25TopK(docs, "id", "text", qs, "qid", "q", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    // equal-idf, equal-tf, equal-dl pair must score identically
    assert(out(1).getLong(2) == out(2).getLong(2))
    assert(out(0).getLong(2) > out(1).getLong(2))
  }

  test("bm25: term frequency raises the score, query terms are distinct") {
    val docs = Seq(
      (1L, "ant ant ant x"), (2L, "ant y z w")).toDF("id", "text")
    // repeated query term must count once — same result as 'ant'
    val qs = Seq((1, "ant ant")).toDF("qid", "q")
    val once = Retrieval.bm25TopK(docs, "id", "text",
      Seq((1, "ant")).toDF("qid", "q"), "qid", "q", k = 2).collect()
    val twice = Retrieval.bm25TopK(docs, "id", "text", qs,
      "qid", "q", k = 2).collect()
    assert(once.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      twice.map(r => (r.getLong(1), r.getLong(2))).toSet)
    val byId = once.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byId(1L) > byId(2L)) // tf=3 beats tf=1 at equal dl
  }

  test("bm25: docs matching no term are absent") {
    val docs = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text",
      Seq((1, "aa")).toDF("qid", "q"), "qid", "q", k = 10).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L))
  }

  // -------------------------------------------------- paragraph dedup

  private def pdedup(rows: Seq[(Long, String)], minChars: Int = 1) =
    Curation.paragraphDedup(rows.toDF("id", "text"), "id", "text",
        "\n\n", minChars)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("paragraph dedup keeps the globally first occurrence in place") {
    val out = pdedup(Seq(
      (1L, "alpha\n\nshared para\n\nbeta"),
      (2L, "shared para\n\ngamma"),
      (3L, "gamma\n\ndelta")))
    assert(out(0) == ((1L, "alpha\n\nshared para\n\nbeta", 3L, 3L)))
    assert(out(1) == ((2L, "gamma", 2L, 1L)))
    // 'gamma' first occurred in doc 2 idx 1 < doc 3 idx 0
    assert(out(2) == ((3L, "delta", 2L, 1L)))
  }

  test("paragraph dedup: duplicate WITHIN one doc collapses to first") {
    val out = pdedup(Seq((5L, "x\n\ny\n\nx")))
    assert(out(0) == ((5L, "x\n\ny", 3L, 2L)))
  }

  test("paragraph dedup: short paragraphs always survive; empty doc row") {
    val out = pdedup(Seq(
      (1L, "ab\n\nab\n\nzz long paragraph"),
      (2L, "zz long paragraph")), minChars = 3)
    // 'ab' is below minChars => both copies stay
    assert(out(0) == ((1L, "ab\n\nab\n\nzz long paragraph", 3L, 3L)))
    assert(out(1) == ((2L, "", 1L, 0L)))
  }

  // ---------------------------------------------------- hash split

  test("hashSplit: exact thresholds, stability under corpus growth") {
    assert(Curation.hashSplitThresholds(Seq(0.8, 0.1, 0.1)) == Seq(
      "cccccccccccccccccccccccccccccccc",
      "e6666666666666666666666666666666"))
    val small = (0L until 200L).map(i => (i, s"d$i")).toDF("id", "t")
    val big = (0L until 400L).map(i => (i, s"d$i")).toDF("id", "t")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assign(df: org.apache.spark.sql.DataFrame) =
      Curation.hashSplit(df, "id", splits)
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign(small); val b = assign(big)
    // growth never reassigns an existing row
    assert(a.forall { case (k, v) => b(k) == v })
    // proportions land near the weights (md5 is uniform)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train frac $frac")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("splitLeakage flags only duplicate groups straddling splits") {
    // ids 1 and 1001 share text; md5-banded splits differ for this
    // pair (verified below); unique docs never appear
    val splits = Seq("a" -> 0.5, "b" -> 0.5)
    val df = Seq(
      (1L, "dup text one"), (1001L, "dup text one"),
      (2L, "unique text"), (3L, "same split dup"), (3L + 1000L, "same split dup")
    ).toDF("id", "text")
    val assign = Curation.hashSplit(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val out = Curation.splitLeakage(df, "id", "text", splits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val expectLeaks = Seq((1L, 1001L), (3L, 1003L))
      .filter { case (x, y) => assign(x) != assign(y) }
      .map(_._1).toSet
    assert(out.map(_._1).toSet == expectLeaks)
    out.foreach { case (_, nDocs, nSplits, sl) =>
      assert(nDocs == 2L && nSplits == 2L && sl == "a,b")
    }
  }

  test("hashSplit rejects zero and non-unit weights loudly") {
    val df = Seq((1L, "x")).toDF("id", "t")
    // zero-weight trailing split once inverted every assignment
    intercept[IllegalArgumentException] {
      Curation.hashSplit(df, "id", Seq("train" -> 1.0, "holdout" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Curation.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  // ------------------------------------------------ bench containment

  test("containment: quoted benchmark scores 1.0 where jaccard dilutes") {
    // doc 1 contains the full bench text plus 6 more words: containment
    // of bench-in-doc = 1.0; jaccard = 3/(3+6+... ) far below
    val docs = Seq(
      (1L, "q w e r t y padding one two three four five six"),
      (2L, "totally unrelated words here nothing shared at all")
    ).toDF("id", "text")
    val bench = Seq((9L, "q w e r t y")).toDF("id", "text")
    val out = Curation.benchContainment(docs, bench, "id", "text",
        n = 3, threshold = 0.8).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((1L, 9L, 4L, 4L, 1.0)))
  }

  test("containment: partial overlap below threshold is filtered") {
    val docs = Seq((1L, "a b c d x y z")).toDF("id", "text")
    val bench = Seq((9L, "a b c d q q q q")).toDF("id", "text")
    // bench has 5 DISTINCT 3-grams ('q q q' repeats), doc shares 2
    // => containment 2/5 = 0.4
    val kept = Curation.benchContainment(docs, bench, "id", "text",
      n = 3, threshold = 0.5).collect()
    assert(kept.isEmpty)
    val all = Curation.benchContainment(docs, bench, "id", "text",
      n = 3, threshold = 0.0).collect()
    assert(all.length == 1 && all(0).getLong(2) == 2L
      && all(0).getLong(3) == 5L)
  }

  // ---------------------------------------------- unicode normalization

  test("NFC composes combining sequences; NFD decomposes; ASCII is identity") {
    val nfc = eval1(StringExpressions.unicodeNormalize(
      lit("é plain"), "NFC"))
    assert(nfc.toString == "é plain")
    val nfd = eval1(StringExpressions.unicodeNormalize(
      lit("é"), "NFD"))
    assert(nfd.toString == "é")
    assert(eval1(StringExpressions.unicodeNormalize(
      lit("ascii only"), "NFC")).toString == "ascii only")
    // NFKC folds compatibility forms (fullwidth digits)
    assert(eval1(StringExpressions.unicodeNormalize(
      lit("１２"), "NFKC")).toString == "12")
  }

  test("stripMarkup: tags/script/style go, entities decode, text stays") {
    def strip(s: String): String =
      spark.range(1).select(TextAnalysis.stripMarkup(lit(s))).head()
        .getString(0)
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    assert(strip("<script>if (a<b) { x(); }</script>kept") == "kept")
    assert(strip("<style a=b>p{}</style>kept") == "kept")
    // &amp; decodes LAST: &amp;lt; is a literal &lt;, not <
    assert(strip("&amp;lt; &lt; &gt; &quot; &#39; x&nbsp;y")
      == "&lt; < > \" ' x y")
    assert(strip("a</p><p>b") == "a b") // tags become spaces, no gluing
    assert(strip("  spaced\t\nout  ") == "spaced out")
  }

  test("unicode_normalize: null in, null out; bad form rejected") {
    assert(eval1(StringExpressions.unicodeNormalize(
      lit(null).cast("string"), "NFC")) == null)
    val ex = intercept[Exception] {
      spark.range(1).select(StringExpressions.unicodeNormalize(
        lit("x"), "NFX")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("nfc"))
  }

  // ------------------------------------------------------- winnowing

  test("winnow: guarantee — a shared run of >= k+w-1 words shares a " +
    "fingerprint; selection is position-robust") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared nine ten eleven twelve thirteen")
    ).toDF("id", "text")
    val fp = TextAnalysis.winnow(docs, "id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty,
      "shared 6-word run (k=3, w=4) must share a fingerprint")
    // density: every window contributes, so gaps between selected
    // positions are < w
    val pos1 = fp.filter(_._1 == 1L).map(_._2).sorted
    assert(pos1.zip(pos1.tail).forall { case (a, b) => b - a <= 4 })
  }

  test("winnow: docs shorter than k+w-1 words emit nothing") {
    val docs = Seq((1L, "a b c d e")).toDF("id", "text") // 5 < 3+4-1
    assert(TextAnalysis.winnow(docs, "id", "text", k = 3, w = 4)
      .collect().isEmpty)
    // exactly k+w-1 = one full window = exactly one fingerprint
    val just = Seq((2L, "a b c d e f")).toDF("id", "text")
    assert(TextAnalysis.winnow(just, "id", "text", k = 3, w = 4)
      .collect().length == 1)
  }

  test("winnow: rightmost-minimal tie rule via repeated grams") {
    import org.apache.spark.sql.functions.md5
    // 'x x x x x x' : all 3-grams identical -> one hash, window picks
    // the RIGHTMOST position in each window; distinct positions = one
    // per window start
    val docs = Seq((1L, "x x x x x x x")).toDF("id", "text")
    val fp = TextAnalysis.winnow(docs, "id", "text", k = 3, w = 4,
        hash = md5(_))
      .collect().map(r => r.getInt(1)).sorted
    // gram positions 0..4, window starts 0..1 -> rightmost of [0..3] is
    // 3, of [1..4] is 4
    assert(fp.toSeq == Seq(3, 4))
  }

  // --------------------------------------------------- unigram surprisal

  test("unigram surprisal: exact micro-nats against hand computation") {
    // corpus: a a a b  => p(a)=3/4, p(b)=1/4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("id", "text")
    val out = Terms.unigramSurprisal(docs, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val sa = math.floor(-math.log(3.0 / 4.0) * 1e6 + 0.5).toLong
    val sb = math.floor(-math.log(1.0 / 4.0) * 1e6 + 0.5).toLong
    assert(out.toSeq == Seq(
      (1L, 3L, 3 * sa, (3 * sa).toDouble / 3.0),
      (2L, 1L, sb, sb.toDouble)))
    // rare token scores strictly higher than the common one
    assert(sb > sa)
  }

  // ----------------------------------------------------- embedding drift

  test("label centroids: exact fixed-point means, per label and dim") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 7), (2L, Seq(3.0f, 2.0f), 7),
      (3L, Seq(5.0f, 5.0f), 8)).toDF("vec_id", "embedding", "label")
    val out = Drift.labelCentroids(df, "embedding", "label")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (7, 0L, 2L, 2.0), (7, 1L, 2L, 1.0),
      (8, 0L, 1L, 5.0), (8, 1L, 1L, 5.0)))
  }

  test("centroid drift: identical cohorts -> 0; known offset -> exact L2") {
    val same = Seq(
      (0L, Seq(1.0f, 2.0f), 1), (1L, Seq(1.0f, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val z = Drift.centroidDrift(same, "embedding", "label",
      col("vec_id") % 2 === 0).collect()
    assert(z.length == 1 && z(0).getLong(3) == 0L)
    // ref (0,0), cur (3,4): L2 = 5 => 5e9 nanos
    val off = Seq(
      (0L, Seq(0.0f, 0.0f), 1), (1L, Seq(3.0f, 4.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val d = Drift.centroidDrift(off, "embedding", "label",
      col("vec_id") % 2 === 0).collect()
    assert(d(0).getLong(3) == 5000000000L)
  }

  test("centroid drift: single-cohort labels are omitted") {
    val df = Seq(
      (0L, Seq(1.0f), 1), (1L, Seq(1.0f), 1), (2L, Seq(9.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    // label 2 exists only in the ref cohort (vec_id 2 is even)
    val out = Drift.centroidDrift(df, "embedding", "label",
      col("vec_id") % 2 === 0).collect()
    assert(out.map(_.getInt(0)).toSet == Set(1))
  }

  // --------------------------------------------------------- BPE pairs

  test("bpe pairs: counts weighted by word frequency, rank deterministic") {
    // 'abab' x2 -> pairs ab,ba,ab weighted 2: ab=4, ba=2; 'cd' x3 -> cd=3
    val docs = Seq(
      (1L, "abab cd"), (2L, "abab cd"), (3L, "cd")).toDF("id", "text")
    val out = Terms.bpePairs(docs, "id", "text", topN = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 4L, 1), ("c", "d", 3L, 2), ("b", "a", 2L, 3)))
  }

  test("bpe pairs: single-char words contribute nothing; topN caps") {
    val docs = Seq((1L, "a b c xy xy zz")).toDF("id", "text")
    val out = Terms.bpePairs(docs, "id", "text", topN = 1).collect()
    assert(out.length == 1)
    assert((out(0).getString(0), out(0).getString(1), out(0).getLong(2))
      == (("x", "y", 2L)))
  }

  test("scriptProfile: per-script fractions and fixed-priority dominance") {
    import spark.implicits._
    // "ab 12 中中" → non-ws glyphs: a b 1 2 中 中 = 6
    val r = Seq(("ab 12 中中")).toDF("t")
      .select(TextAnalysis.scriptProfile(col("t")).as("p"))
      .select("p.*").head()
    assert(r.getLong(0) == 6L)                 // n_glyphs
    assert(r.getLong(1) == 333333L)            // latin 2/6
    assert(r.getLong(2) == 333333L)            // digit 2/6
    assert(r.getLong(3) == 333333L)            // cjk 2/6
    assert(r.getString(7) == "latin")          // 3-way tie → priority
    // empty doc → zero glyphs, dominant "other"
    val e = Seq(("  ")).toDF("t")
      .select(TextAnalysis.scriptProfile(col("t")).as("p"))
      .select("p.*").head()
    assert(e.getLong(0) == 0L && e.getString(7) == "other")
  }

  test("valuePsi: two-bin hand check, degenerate and empty guards") {
    import spark.implicits._
    val a = Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0).toDF("value")
    val b = Seq(1.0, 1.0).toDF("value")
    val r = Drift.valuePsi(a, b, "value", bins = 2).head()
    // pooled lo=0 hi=1; a bins (3,3) n=6; b bins (0,2) n=2
    // p=(4/8,4/8) q=(1/4,3/4); terms micro-rounded then summed
    def term(p: Double, q: Double): Long =
      math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
    val expect = term(4.0 / 8, 1.0 / 4) + term(4.0 / 8, 3.0 / 4)
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getLong(2) == expect)
    // constant pooled range → NULL psi, counts still reported
    val c = Seq(5.0, 5.0).toDF("value")
    assert(Drift.valuePsi(c, c, "value").head().isNullAt(2))
    // empty cohort → NULL psi
    val e = Seq.empty[Double].toDF("value")
    assert(Drift.valuePsi(a, e, "value").head().isNullAt(2))
    // NaN rows are dropped like NULLs — unfiltered, a single NaN
    // poisons the pooled max (Spark orders NaN greatest) and every
    // binIndex division goes NaN
    val an = Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, Double.NaN).toDF("value")
    val rn = Drift.valuePsi(an, b, "value", bins = 2).head()
    assert(rn.getLong(0) == 6L && rn.getLong(2) == r.getLong(2))
  }

  test("valueKs: exact CDF-gap max, hand-checked; empty cohort NULL") {
    import spark.implicits._
    val a = Seq(1.0, 2.0).toDF("value")
    val b = Seq(2.0, 3.0).toDF("value")
    val r = Drift.valueKs(a, b, "value").head()
    // distinct v 1,2,3: F_a = .5,1,1; F_b = 0,.5,1 → max gap .5
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 500000L)
    val e = Seq.empty[Double].toDF("value")
    assert(Drift.valueKs(a, e, "value").head().isNullAt(2))
  }

  test("valueKs: two-level bucketed prefix matches the single-bucket sum") {
    import spark.implicits._
    // 500 distinct values spread across buckets; cohort b shifted —
    // the bucketed path (buckets=8) must equal the degenerate
    // single-bucket path (buckets=1, the old global-window shape)
    val rnd = new scala.util.Random(11)
    val av = Seq.fill(500)(rnd.nextDouble() * 100).toDF("value")
    val bv = Seq.fill(400)(rnd.nextDouble() * 100 + 15).toDF("value")
    val r8 = Drift.valueKs(av, bv, "value", buckets = 8).head()
    val r1 = Drift.valueKs(av, bv, "value", buckets = 1).head()
    assert(r8.getLong(0) == 500L && r8.getLong(1) == 400L)
    assert(r8.getLong(2) == r1.getLong(2))
    assert(r8.getLong(2) > 0L)
    // constant range degenerates to one bucket and still answers
    val c = Seq(5.0, 5.0, 5.0).toDF("value")
    assert(Drift.valueKs(c, c, "value", buckets = 8).head()
      .getLong(2) == 0L)
  }

  test("psiFromBinCounts: per-group PSI vs the valuePsi arithmetic") {
    import spark.implicits._
    // group g1 saw bins (0:3, 1:3); reference is (0:1, 1:3); bins=2
    val counts = Seq(("g1", 0, 3L), ("g1", 1, 3L)).toDF("g", "bin", "c")
    val ref = Seq((0, 1L), (1, 3L)).toDF("bin", "cr")
    def tm(p: Double, q: Double): Long =
      math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
    val expect = tm(4.0 / 8, 2.0 / 6) + tm(4.0 / 8, 4.0 / 6)
    val r = graft.pipeline.Drift.psiFromBinCounts(counts, "g", "bin",
      "c", ref, "bin", "cr", bins = 2).head()
    assert(r.getString(0) == "g1" && r.getLong(1) == 6L)
    assert(r.getLong(2) == expect)
    // a group with every value in one bin still pays the empty bin
    val skew = Seq(("g2", 0, 6L)).toDF("g", "bin", "c")
    val r2 = graft.pipeline.Drift.psiFromBinCounts(skew, "g", "bin",
      "c", ref, "bin", "cr", bins = 2).head()
    assert(r2.getLong(2) == tm(7.0 / 8, 2.0 / 6) + tm(1.0 / 8, 4.0 / 6))
  }

  test("sourceDivergence: JS vs hand-computed two-stratum corpus") {
    import spark.implicits._
    val docs = Seq(("A", "x x"), ("B", "y y")).toDF("source", "text")
    def tm(p: Double, q: Double): Long = {
      val m = 0.5 * (p + q)
      math.floor((0.5 * (if (p > 0) p * math.log(p / m) else 0.0)
        + 0.5 * (q * math.log(q / m))) * 1e6 + 0.5).toLong
    }
    // stratum A: word x (p=1,q=.5) + word y (p=0,q=.5); B symmetric
    val expect = tm(1.0, 0.5) + tm(0.0, 0.5)
    val got = Terms.sourceDivergence(docs, "source", "text")
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 2L, expect), ("B", 2L, expect)))
  }

  test("collocations: PMI formula and min-count floor, hand-checked") {
    import spark.implicits._
    // tokens: x3 y3 z1, N=7; bigrams: (x,y)x3 (y,x)x1 (y,z)x1, Nb=5
    val docs = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val got = Terms.collocations(docs, "text",
      topN = 5, minCount = 2L).collect()
    assert(got.length == 1) // only (x,y) clears the floor
    val r = got(0)
    val pmi = math.log((3.0 / 5.0) /
      ((3.0 / 7.0) * (3.0 / 7.0)))
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("x", "y", 3L)))
    assert(r.getLong(3) == math.floor(pmi * 1e6 + 0.5).toLong)
    assert(r.getInt(4) == 1)
  }

  test("secretCandidates: length, charset and diversity gates") {
    import spark.implicits._
    val key = "aB3dE5gH7jK9mN1pQsUv"          // 20 chars, 20 distinct
    val monotone = "aaaaaaaaaaaaaaaaaaaa"      // 20 chars, diversity .05
    val short = "aB3dE5gH7"                    // high diversity, short
    val badCharset = key.dropRight(1) + "!"   // '!' breaks the charset
    val r = Seq((s"hello $key $monotone $short $badCharset world"))
      .toDF("t")
      .select(TextAnalysis.secretCandidates(col("t")).as("p"))
      .select("p.*").head()
    assert(r.getLong(0) == 1L)
    assert(r.getSeq[String](1) == Seq(key))
  }

  test("sourceDivergence: collapse equals brute-force grid, randomized") {
    // model: the padded vocabulary-by-strata grid with per-cell micro
    // rounding -- exactly the spelling the analytic absent-cell
    // correction replaced; 12 seeded corpora including a null stratum
    val rnd = new scala.util.Random(7)
    val words = Array("a", "b", "c", "dd", "ee", "ff", "g'h")
    for (trial <- 1 to 12) {
      val nDocs = 3 + rnd.nextInt(8)
      val docs = (1 to nDocs).map { _ =>
        val src = rnd.nextInt(4) match {
          case 0 => null
          case k => s"s$k"
        }
        val text = Seq.fill(1 + rnd.nextInt(12))(
          words(rnd.nextInt(words.length))).mkString(" ")
        (src, text)
      }
      val df = docs.toDF("source", "text")
      // driver-side brute force over the padded grid
      val toks = docs.flatMap { case (s, t) =>
        t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)
          .map(w => (s, w))
      }
      val cSW = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cW = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nS = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nTot = toks.size.toLong
      val expect = nS.map { case (s, ns) =>
        val js = cW.keys.toSeq.map { w =>
          val p = cSW.getOrElse((s, w), 0L).toDouble / ns
          val q = cW(w).toDouble / nTot
          val m = 0.5 * (p + q)
          val term = 0.5 * (if (p > 0) p * math.log(p / m) else 0.0) +
            0.5 * (q * math.log(q / m))
          math.floor(term * 1e6 + 0.5).toLong
        }.sum
        (s, ns, js)
      }.toSet
      val got = Terms.sourceDivergence(df, "source", "text").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"trial $trial")
    }
  }
}
