package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 coverage wave: the remaining join-at-scale recipes as
  * executable keys (pure range join, salted skew join), a second
  * TPC-H-style deep relational query, and random-projection
  * dimensionality reduction for the embedding pipeline.
  */
object QueriesR3 {
  import Tables._

  /** Pure range join with NO equi key — per order date, how many
    * lineitems (of any order) shipped within ±3 days. Two scale moves
    * stack: (1) both sides pre-aggregate to per-DAY rows before any
    * join (the range predicate only reads the day), collapsing 100 TB
    * of facts to a few thousand date rows; (2) Ops.rangeJoinBinned
    * turns the remaining range predicate into an equi join on 7-day
    * bins — no nested loop anywhere (PlanSpec asserts). */
  def joinRangeBinned(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val od = orders(s, d)
      .select(col("o_orderdate"),
              datediff(col("o_orderdate"), epoch).cast("long").as("od"))
      .distinct()
    val sd = lineitem(s, d)
      .groupBy("l_shipdate")
      .agg(count(lit(1)).as("n"))
      .select(datediff(col("l_shipdate"), epoch).cast("long").as("sd"),
              col("n"))
    Ops.rangeJoinBinned(od, "od", sd, "sd", radius = 3, binWidth = 7)
      .groupBy("o_orderdate")
      .agg(sum("n").as("n_shipped"))
      .orderBy("o_orderdate")
  }

  /** Salted JOIN — the skew recipe for joins (the aggregation half is
    * agg_salted_skew): the per-type dim row is replicated under 8
    * salts, each fact row routes to one salt by a data-derived key
    * (never rand(), §2.3), and the merge hint pins a shuffled join so
    * the salt genuinely spreads the 5 hot event_type keys across 40
    * reducer groups instead of 5. Result ≡ the plain join (the
    * oracle). At 100 TB this is what keeps one hot key from pinning
    * one reducer when the dim is too large to broadcast. */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val S = 8
    val dim = events(s, d).groupBy("event_type")
      .agg(round(avg("value"), 6).as("avg_value"))
    val dimSalted = dim.withColumn("salt",
      explode(array((0 until S).map(i => lit(i.toLong)): _*)))
    val fact = events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(S.toLong)))
    fact.hint("merge").join(dimSalted, Seq("event_type", "salt"))
      .filter(col("value") > col("avg_value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_above"))
      .orderBy("event_type")
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose lineitems
    * total > 150 units, joined back to customer, top 20 by price.
    * The group-filter runs FIRST and on lineitem alone (map-side
    * combine on l_orderkey), so the expensive fact table reduces to a
    * sliver before touching orders/customer — at 100 TB the only
    * full-table pass is the one partial aggregation. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Overlapping token-window chunking (size 32, stride 24) — the
    * document→training-sample splitter every LLM data pipeline runs
    * before tokenization. Entirely array-native per row (sequence of
    * starts → slice): a narrow map-side explode with no shuffle, so it
    * streams at scan speed over 100 TB. Short docs yield one chunk
    * with all their tokens. */
  def docsChunkWindows(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, greatest(size(tokens) - 31, 1), 24), i -> struct(i AS start_tok, slice(tokens, i, 32) AS ctoks))")))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
              col("col.start_tok").as("start_tok"),
              size(col("col.ctoks")).cast("long").as("n_tokens"),
              substring(md5(array_join(col("col.ctoks"), " ")), 1, 16)
                .as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Benchmark decontamination: per candidate document, the fraction
    * of its 8-gram shingles that appear in ANY "benchmark" document
    * (here: doc_id % 50 == 0 stands in for the eval set). The scale
    * shape every decontamination pass uses: the benchmark shingle set
    * is tiny relative to the corpus → broadcast it; candidate shingles
    * probe it map-side and aggregate per doc — the corpus is scanned
    * once and never shuffled on the shingle. */
  def docsContamination(s: SparkSession, d: String): DataFrame = {
    val sh = Ops.shingles(documents(s, d), "doc_id", "text", 8)
    val bench = sh.filter(col("doc_id") % 50 === 0)
      .select("shingle").distinct()
      .withColumn("hit", lit(1))
    sh.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hit"))
      .withColumn("contamination",
        round(col("n_hit").cast("double") / col("n_shingles").cast("double"), 6))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signal: duplicate 3-gram ratio per doc
    * (1 − distinct/total). Array-native — the gram set never leaves
    * its row. */
  def docsRepetition(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .filter(size(col("tokens")) >= 3)
      .select(col("doc_id"), expr(
        "transform(sequence(1, size(tokens) - 2), i -> array_join(slice(tokens, i, 3), ' '))")
        .as("g"))
      .select(col("doc_id"), size(col("g")).cast("long").as("n_grams"),
              size(array_distinct(col("g"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double")
          / col("n_grams").cast("double"), 6))
      .orderBy("doc_id")

  /** Data-mixture report: per-source doc counts, mean length, distinct
    * languages — the first dashboard any corpus build looks at. Integer
    * sums stay exact in doubles (< 2^53), so the rounded avg is
    * order-free. */
  def docsSourceMix(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_chars").cast("double")), 4).as("avg_chars"),
           countDistinct("lang").as("n_langs"))
      .orderBy("source")

  /** TPC-H Q10 shape (returned-item revenue per customer): returned
    * lineitems only, revenue = Σ price×(1−discount) in a DECIMAL
    * accumulator (addition-order-proof at any scale), joined through
    * orders to customer and nation, top 20. Same reduce-before-join
    * posture as q18.
    *
    * The per-row product has EXACTLY 4 decimal digits (2-digit price ×
    * 2-digit discount), so it is rounded to that grid BEFORE the
    * decimal cast: casting the raw double to DECIMAL(18,2) lands
    * half-cent products (x.xx5) on a rounding boundary where Spark
    * (HALF_UP on the decimal repr) and DuckDB (binary rounding)
    * disagree by one cent — measured at sf0.001. On the 4-decimal
    * grid the value is never mid-boundary, so the cast is exact. */
  def q10ReturnedRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
             .cast("decimal(18,4)")).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Parquet schema evolution: two file batches with different column
    * sets (the second adds o_totalprice) read back through one
    * mergeSchema scan — the data-lake scenario where a table's schema
    * widened mid-history. Missing columns surface as nulls; the
    * aggregate counts them. At 100 TB mergeSchema's footer-merge cost
    * is why production tables pin schemas in a catalog — the scaladoc
    * trade-off the operator demonstrates. */
  def scanSchemaEvolution(s: SparkSession, d: String): DataFrame = {
    // r19: the two-batch fixture re-WROTE two orders projections per
    // call (0.40 s of the key) for a layout fully determined by the
    // corpus — it joins the P6 fixture family (cachedLazy root memo);
    // the mergeSchema READ under test stays live per call.
    lazy val o = orders(s, d)
    val tmp = LakeFixtures.cachedLazy(s, "schema_evo_batches_v1", d)(
      Seq(o))(ArtifactCache.artifactHash(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"))) { r =>
      o.select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$r/batch=1")
      o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").parquet(s"$r/batch=2")
    }
    // DECIMAL accumulator: this sum is ~2.5e10 over 30k doubles, where
    // round(sum_double, 4) sits in addition-order ulp noise (the
    // repo's decimal-sum rule; measured unstable across orders).
    s.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
           count(col("o_totalprice")).as("n_with_price"),
           sum(col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  /** NATIVE session_window in batch — the same Spark operator the
    * streaming surface uses (StreamingSpec), now oracle-checked: the
    * engine-native gap-merge must equal the portable gaps-and-islands
    * spelling (events_session) on start/count, with end = last event
    * + gap by definition. One shuffle on user_id. */
  def eventsSessionNative(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("s_start"),
              col("sw.end").as("s_end"), col("n_events"))
      .orderBy("user_id", "s_start")

  /** Top-3 users by summed value per 6-hour tumbling window — the
    * bounded TopKByScore aggregate composed with event-time windowing
    * (its second context after annIvf): per (window, user) partials
    * map-side-combine, then only k rows per window cross the wire —
    * never a rank-filter window over the full (window, user) space.
    * Per-user sums rounded to 4dp so the (score DESC, id ASC) tie rule
    * is engine-identical. */
  def eventsTopkPerWindow(s: SparkSession, d: String): DataFrame = {
    TopK.register(s) // also tunes the ObjectHashAggregate fallback (bounded; see TopK)
    events(s, d)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(round(sum("value"), 4).as("sv"))
      .groupBy(col("w"))
      .agg(expr("topk_by_score(sv, user_id, 3)").as("t"))
      .select(col("w.start").as("wstart"), posexplode(col("t")))
      .select(col("wstart"), (col("pos") + 1).as("rk"),
              col("col.id").as("user_id"), col("col.score").as("total_value"))
      .orderBy("wstart", "rk")
  }

  /** Random-projection dimensionality reduction (64 → 8 dims): the
    * same md5-derived deterministic hyperplanes as emb_ann_lsh, but
    * emitting the CONTINUOUS projections — the cheap JL-style
    * compression an embedding pipeline applies before indexing/ANN.
    * One broadcast of 512 plane coefficients + one narrow aggregation;
    * projections rounded to 6dp so cross-engine sum order can't leak
    * into the hash (§2.3). Scalar output columns p0..p7 (never
    * array cells — driver-compare rule). */
  def embRandomProjection(s: SparkSession, d: String): DataFrame = {
    val pe = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("j"),
              col("col").cast("double").as("x"))
    val planes = s.range(0, 8).select(col("id").as("p"))
      .crossJoin(s.range(1, 65).select(col("id").as("j")))
      .select(col("p"), col("j"), expr(
        "(CAST(CAST(conv(substring(md5(concat(p, '_', j)), 1, 8), 16, 10) AS BIGINT) % 2001 AS DOUBLE) - 1000.0) / 1000.0")
        .as("h"))
    val projCols = (0 until 8).map(p =>
      round(sum(when(col("p") === p, col("x") * col("h"))), 6).as(s"p$p"))
    pe.join(broadcast(planes), Seq("j"))
      .groupBy("vec_id")
      .agg(projCols.head, projCols.tail: _*)
      .orderBy("vec_id")
  }
}
