package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 wave 3: the remaining classic analytic join/agg shapes the
  * registry had not pinned — dual-role dimension joins (one dimension
  * table playing two semantic roles in one query, TPC-H Q7/Q8),
  * outer-join-with-ON-residual + aggregate-of-aggregate histograms
  * (Q13), and max-of-aggregate selection via a scalar subquery over a
  * shared CTE (Q15) — plus two LLM-corpus operators: unigram
  * language-model scoring (the CCNet/Gopher quality signal) and
  * product quantization with asymmetric-distance search (the
  * memory-bounded ANN path for 100 TB embedding stores).
  *
  * Determinism: SURVEY.md §2.3 throughout — decimal accumulators on
  * exact grids for money, quotient-then-round for ratios, per-term
  * rounding to a fixed grid before decimal summation where libm
  * functions (ln) enter an accumulator, md5 for portable sampling,
  * total output orders.
  */
object QueriesR6 {
  import Tables._

  private def ts(x: String): Column = to_timestamp(lit(x))

  /** The repo's §2.3 money idiom (see QueriesR5.revDec). */
  private val revDec =
    expr("CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))")

  /** TPC-H Q7 shape — bilateral shipping volume between two nations,
    * by supplier nation × customer nation × ship year. The nation
    * dimension plays TWO roles (supplier's and customer's); the
    * disjunctive pair predicate ((A,B) ∨ (B,A)) spans both roles.
    * Scale shape: both role filters are applied to the DIMENSION side
    * before the facts join — supplier and customer shrink to 2/25 of
    * their nations first, the pruned supplier side broadcasts into
    * lineitem, and the only big shuffles left are lineitem⋈orders and
    * ⋈(pruned customer) on their natural keys. Revenue is the exact
    * decimal accumulator. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val supN = supplier(s, d)
      .join(broadcast(nation(s, d).filter(col("n_name").isin(pair: _*))),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = customer(s, d)
      .join(broadcast(nation(s, d).filter(col("n_name").isin(pair: _*))),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem(s, d)
      // size-gated: supN is supplier-derived (scales with SF)
      .join(Ops.broadcastIfSmall(supN, supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === pair(0) && col("cust_nation") === pair(1)) ||
              (col("supp_nation") === pair(1) && col("cust_nation") === pair(0)))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("n_items"),
           sum(revDec).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape — national market share: of all ECONOMY-part
    * revenue delivered to ASIA customers, the share supplied by
    * NATION_3, per order year. Seven relations, nation again in two
    * roles (supplier's nation for the share numerator, customer's
    * nation→region for the market filter). All dimensions (part
    * filtered to one type, supplier+nation, nation⋈region) broadcast.
    * The customer side contributes MEMBERSHIP only (no output
    * columns), so it folds into orders as a LEFT SEMI — the q3
    * respelling: one fact-side join instead of two, no broadcast
    * hints on the fact path, and at 100 TB the same plan degrades to
    * shuffle joins instead of OOMing a forced broadcast.
    * lineitem⋈orders stays the one fact-fact shuffle. Share is a
    * conditional decimal sum over total decimal sum, divided as
    * doubles then rounded (quotient-then-round — §2.3). */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val asiaNations = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nk"))
    val custAsia = customer(s, d)
      .join(broadcast(asiaNations), col("c_nationkey") === col("asia_nk"))
      .select(col("c_custkey"))
    val supNat = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ordersAsia = orders(s, d)
      .join(custAsia, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_orderdate")
    lineitem(s, d)
      // size-gated: part and supplier both scale with SF
      .join(Ops.broadcastIfSmall(
              part(s, d).filter(col("p_type") === "ECONOMY"), part(s, d)),
            col("l_partkey") === col("p_partkey"))
      .join(Ops.broadcastIfSmall(supNat, supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
      .join(ordersAsia, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        coalesce(sum(when(col("supp_nation") === "NATION_3", revDec)),
                 expr("CAST(0 AS DECIMAL(18,4))"))
          .cast("double").as("nation_revenue"),
        sum(revDec).cast("double").as("total_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") / col("total_revenue"), 6))
      .orderBy("o_year")
  }

  /** TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    * join with a residual predicate INSIDE the ON clause (orders that
    * are not urgent — putting it in WHERE would silently turn the join
    * inner, the classic outer-join bug this key pins), COUNT(col) over
    * the null-extended side, then a second aggregate over the first's
    * result (the histogram). Scale shape: one shuffle per aggregate,
    * both map-side combined; the outer join shuffles on the natural
    * customer key. */
  def q13OrderCountDist(s: SparkSession, d: String): DataFrame = {
    val perCust = customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
    perCust
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("n_cust").desc, col("n_orders").desc)
  }

  /** TPC-H Q15 shape — the top supplier(s) by quarterly revenue: an
    * aggregate CTE referenced twice, once as the join input and once
    * under a MAX scalar subquery selecting the winner. The equality
    * compares exact DECIMAL(18,4) accumulators, so "ties all qualify"
    * is engine-independent (§2.3 — a double max could disagree at the
    * last ulp). Scale shape: the revenue agg is one map-side-combined
    * shuffle over the date-pruned sliver of lineitem; the MAX is a
    * one-row broadcast back onto it; supplier is a broadcast dim. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("q15_lineitem")
    supplier(s, d).createOrReplaceTempView("q15_supplier")
    s.sql("""
      WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                        AS DECIMAL(18,4))) AS total_rev
        FROM q15_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s.s_suppkey, s.s_name,
             CAST(r.total_rev AS DOUBLE) AS total_revenue
      FROM q15_supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
      WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
      ORDER BY s.s_suppkey""")
  }

  /** Unigram language-model scoring — the CCNet-style corpus quality
    * signal: train token frequencies over the whole corpus (one agg),
    * then score every document's cross-entropy under the add-one-
    * smoothed model, H(doc) = -Σ c_doc(t)·ln((c(t)+1)/(N+V)) / n_tokens.
    * Scale shape: the model IS a table (token → count) joined back on
    * the token — broadcast when the vocab fits (it's zipf-bounded),
    * shuffle-join with the existing salted-agg recipe when it doesn't;
    * the corpus is scanned twice and shuffled on the token once each
    * pass, never collected.
    *
    * Exactness (§2.3): each doc×token term is rounded to the fixed
    * 1e-9 grid and summed as DECIMAL(28,9) — the ln() calls land on
    * identical doubles in both engines (the docs_entropy precedent),
    * per-term rounding of identical doubles is deterministic, and the
    * decimal sum is order-proof, so the accumulator never depends on
    * Spark's reduce order. The final per-token normalization is a
    * quotient-then-round. */
  def docsLmScore(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val model = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val nv = model.agg(sum("c").cast("double").as("n_total"),
                       count(lit(1)).cast("double").as("v_vocab"))
    val docTok = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("c_doc"))
    docTok
      .join(model, "t")
      .crossJoin(broadcast(nv))
      .withColumn("term",
        expr("CAST(round(-c_doc * ln((c + 1) / (n_total + v_vocab)), 9) " +
             "AS DECIMAL(28,9))"))
      .groupBy("doc_id")
      .agg(sum("c_doc").as("n_tokens"),
           sum("term").as("h_sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("h_sum").cast("double") / col("n_tokens").cast("double"), 6)
          .as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** Bigram language-model scoring — docs_lm_score's conditional
    * upgrade: P(w_i | w_{i-1}) with add-one smoothing over the corpus
    * bigram table, per-document cross-entropy over transitions.
    * Bigrams are cut array-natively in-row (no window, no second
    * shuffle for adjacency); the model is two tables — bigram counts
    * joined on (w1, w2) and unigram counts on w1 for the conditional
    * denominator. Same order-proof accumulator contract as the
    * unigram key: ln() terms rounded to the 1e-9 grid, summed as
    * DECIMAL(28,9), normalized as a final quotient. Single-token
    * documents have no transitions and drop out (both engines
    * agree — no bigram rows exist for them). */
  def docsLmBigram(s: SparkSession, d: String): DataFrame = {
    val bi = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      // guard BEFORE sequence(): Spark's sequence(1, 0) is the
      // DESCENDING [1, 0], so a single-token doc would emit two
      // null-bearing bogus bigrams (and corrupt every c1 denominator
      // its token touches) instead of dropping out like the oracle's
      // empty range(1, 1)
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    // Everything downstream derives from ONE aggregation of the
    // exploded bigrams: biModel/uniModel/v re-aggregate dt instead of
    // re-referencing bi, so all branches share dt's shuffle exchange
    // (ReuseExchange) and the corpus is split+exploded once, not four
    // times (4.4 s → ~1.5 s at sf0.1 in the full-session bench).
    val dt = bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("c_doc"))
    // r19 (guide §2.4): biModel/uniModel were re-AGGREGATIONS of dt
    // joined back — reuse only deduped the first exchange, and per-
    // branch column pruning made the explode subtree recompute for
    // each model join. The model counts are per-(w1, w2) / per-(w1)
    // constants, so WINDOWS over one w1 exchange attach them to every
    // dt row in a single pipeline: c12 = Σ c_doc over (w1, w2), c1 =
    // Σ c_doc over (w1) (≡ Σ c12 — same rows, same exact longs). Only
    // the 1-row vocab count still re-derives the bigram chain (a
    // global countDistinct can't ride a partitioned window).
    import org.apache.spark.sql.expressions.Window
    val scoredDt = dt
      .withColumn("c12", sum("c_doc").over(Window.partitionBy("w1", "w2")))
      .withColumn("c1", sum("c_doc").over(Window.partitionBy("w1")))
    val v = dt.select("w1").distinct()
      .agg(count(lit(1)).cast("double").as("v_vocab"))
    scoredDt
      .crossJoin(broadcast(v))
      .withColumn("term",
        expr("CAST(round(-c_doc * ln((c12 + 1) / (c1 + v_vocab)), 9) " +
             "AS DECIMAL(28,9))"))
      .groupBy("doc_id")
      .agg(sum("c_doc").as("n_bigrams"), sum("term").as("h_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("h_sum").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** Product quantization + asymmetric-distance (ADC) search — the
    * memory-bounded ANN that actually deploys at 100 TB: every 64-dim
    * vector compresses to 8 four-bit codes (one per 8-dim subspace,
    * nearest of 16 codebook centroids, tie → lowest centroid id), and
    * a query scans CODES — the distance is Σ_m ‖q_m − c_{code_m}‖²,
    * looked up from a 128-entry table, so the full store never loads
    * floats again. Codebook here = the 16 md5-least vectors (the
    * deterministic seeded-sample initialization; Ops.kmeansCodebook is
    * the trained upgrade), sliced per subspace. Scale shape: the
    * codebook (128 rows) and the query's distance table broadcast;
    * encoding is one broadcast-join pass over the store; search is a
    * scan of the 4-byte codes + an 8-term lookup sum. The 8-term
    * per-vector sums are O(1)-magnitude doubles whose reduce-order
    * jitter (~1e-15) cannot reach the 5e-7 rounding midpoint; argmin
    * uses exact distances where gaps are O(0.1) (§2.3 note in
    * BASELINE.md round-3). Output: top-10 nearest by rounded ADC
    * distance with the packed code string. */
  /** The query's 128-entry ADC lookup table — ‖q_m − c_{m,j}‖² per
    * (subspace, centroid) for query vector 0, from the same
    * deterministic codebook (Ops.pqCodebook) and the same unrolled
    * distance (Ops.pqSubDist) the encoder uses. Shared by emb_pq_adc
    * and emb_ivf_pq so encode and search can never desynchronize. */
  private def pqQueryTable(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qemb"))
      .crossJoin(broadcast(Ops.pqCodebook(emb, "vec_id", "embedding")))
      .select(col("m"), col("cid").as("code"),
              expr(Ops.pqSubDist("qemb", "cemb")).as("qdist"))

  def embPqAdc(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    // The PQ index (vec_id, m, code) is the persisted artifact —
    // encode runs once per corpus fingerprint (Ops.pqEncode: unrolled
    // codegen'd subspace distances, broadcast codebook).
    val codes = Artifacts.pqCodes(s, d)
    val qtab = pqQueryTable(emb)
    codes.join(broadcast(qtab), Seq("m", "code"))
      .groupBy("vec_id")
      .agg(round(sum("qdist"), 6).as("adc_dist"),
           array_join(expr(
             "transform(array_sort(collect_list(struct(m, code))), x -> CAST(x.code AS STRING))"),
             "-").as("code_str"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(10)
  }

  /** IVF-PQ — the two ANN artifacts composed the way a production
    * index deploys them (the FAISS IVFPQ layout): the TRAINED k-means
    * codebook (Artifacts.ivfCodebook) prunes the search to the
    * query's nprobe=4 nearest cells, and only those cells' PQ codes
    * (Artifacts.pqCodes, 4 bytes/vector) are ADC-scored — the floats
    * are never touched at query time. Cell assignment reuses
    * emb_ann_ivf's exact rule (cosine rounded 6, topk_by_score tie =
    * lowest cid), so the oracle re-derives it from the same unrolled
    * k-means CTE chain. The PQ sample codebook and the k-means seeds
    * are THE SAME 16 md5-least vectors by construction — one
    * deterministic sampling rule feeds both quantizers. At 100 TB:
    * assignment is one broadcast pass (and would itself persist next
    * to the codes); a query touches nprobe/C of the code store. */
  def embIvfPq(s: SparkSession, d: String): DataFrame = {
    Exprs.register(s); TopK.register(s)
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cent = Artifacts.ivfCodebook(s, d).select(col("cid"), col("cemb"))
    val codes = Artifacts.pqCodes(s, d)
    val scored = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
              round(expr("cosine_sim(embedding, cemb)"), 6).as("cs"))
    val assign = scored
      .groupBy("vec_id")
      .agg(expr("topk_by_score(cs, cid, 1)").as("t"))
      .select(col("vec_id"), expr("t[0].id").as("cell_id"))
    val qcells = scored.filter(col("vec_id") === 0L)
      .orderBy(col("cs").desc, col("cid")).limit(4)
      .select(col("cid").as("qcell"))
    val cand = assign
      .join(broadcast(qcells), col("cell_id") === col("qcell"), "left_semi")
    val qtab = pqQueryTable(emb)
    codes.join(cand, "vec_id")
      .join(broadcast(qtab), Seq("m", "code"))
      .groupBy("vec_id", "cell_id")
      .agg(round(sum("qdist"), 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(10)
  }

  /** SCD-2 history maintenance — the versioned complement of
    * merge_upsert_scd1: a change closes the old row (is_current =
    * false) and appends a version-2 row; inserts open at version 1;
    * untouched keys carry over. Spark-first: ONE full-outer join on
    * the key fans out into the three branches with an array+explode
    * (no second pass over either side); at 100 TB both sides shuffle
    * once on the merge key, exactly like SCD-1. Change detection is
    * value-based (update's status ≠ current status), so a no-op
    * update does NOT spawn a version — the idempotence a CDC replay
    * needs. Updates/inserts derive deterministically from returned
    * lineitems (the scd1 derivation). */
  def mergeUpsertScd2(s: SparkSession, d: String): DataFrame = {
    val target = orders(s, d)
      .select(col("o_orderkey").as("key"), col("o_orderstatus"))
    val returned = lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_returned"))
    val updates = returned
      .select(col("l_orderkey").as("key"), lit("R").as("new_status"))
      .union(returned.filter(col("l_orderkey") % 50 === 0)
        .select((col("l_orderkey") + 100000000L).as("key"),
                lit("N").as("new_status")))
    target.join(updates, Seq("key"), "full_outer")
      .select(col("key"), explode(expr(
        """CASE
          |  WHEN new_status IS NULL OR new_status = o_orderstatus THEN
          |    array(struct(o_orderstatus AS status, 1 AS version,
          |                 true AS is_current))
          |  WHEN o_orderstatus IS NULL THEN
          |    array(struct(new_status AS status, 1 AS version,
          |                 true AS is_current))
          |  ELSE array(
          |    struct(o_orderstatus AS status, 1 AS version,
          |           false AS is_current),
          |    struct(new_status AS status, 2 AS version,
          |           true AS is_current))
          |END""".stripMargin)).as("r"))
      .select(col("key"), col("r.status"), col("r.version"),
              col("r.is_current"))
      .orderBy("key", "version")
  }
}
