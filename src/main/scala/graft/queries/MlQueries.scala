package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Feature-engineering queries for ML training prep: target encoding,
  * equi-depth binning, and marketing attribution. Like every family in
  * this package, each query pairs an idiomatic Spark plan with a DuckDB
  * oracle over the same fixtures, under the cross-engine float rules
  * documented on [[Queries]] — here every statistic is exact integer /
  * decimal arithmetic until one final IEEE division.
  */
object MlQueries {

  private val dec2 = DecimalType(38, 2)
  private val dec6 = DecimalType(38, 6)

  /** Per-customer lifetime spend in exact integer cents (0 for customers
    * with no orders once left-joined).
    */
  private def spendCents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast(Queries.Money.price)).cast(dec2) * 100)
        .cast("long").as("y_cents"))

  private val spendCentsSql = """
    |  SELECT o_custkey,
    |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS y_cents
    |  FROM orders GROUP BY 1""".stripMargin.trim

  private val targetEncode = QueryDef(
    "ml_target_encode",
    "Leave-one-out target encoding of c_mktsegment against customer " +
      "lifetime spend — the classic high-cardinality categorical " +
      "feature for tabular models, computed leakage-free: each row's " +
      "own target is excluded, enc = (Σ_seg − y_c) / (n_seg − 1). " +
      "Both sufficient statistics are exact BIGINT cents (one orders " +
      "rollup + one segment rollup, the segment table broadcast back). " +
      "The encoding is presented TRUNCATED to 1/100 cent by exact " +
      "integer division — round(·,6) on a ~1e8-magnitude double is NOT " +
      "cross-engine-stable (double ulp there ≈ 6e-8, coarser than the " +
      "rounding grid; caught by the sf10 decade gate as a last-digit " +
      "split). Output is a deterministic key sample (custkey % 97 = 0) " +
      "— the encoding itself is computed for every row with no extra " +
      "pass. nullif guards the singleton-segment division identically.",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
        .join(spendCents(s, dir),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          coalesce(col("y_cents"), lit(0L)).as("y_cents"))
      val seg = cust.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_seg"), sum(col("y_cents")).as("s_seg"))
      cust.join(broadcast(seg), Seq("c_mktsegment"))
        .filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey"), col("c_mktsegment"), col("y_cents"),
          (expr("((s_seg - y_cents) * 100) div nullif(n_seg - 1, 0)")
            .cast("double") / lit(100.0)).as("loo_enc"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""
      |WITH spend AS (
      |$spendCentsSql
      |), cust AS (
      |  SELECT c_custkey, c_mktsegment, COALESCE(y_cents, 0) AS y_cents
      |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey
      |), seg AS (
      |  SELECT c_mktsegment, count(*) AS n_seg, SUM(y_cents)::BIGINT AS s_seg
      |  FROM cust GROUP BY 1
      |)
      |SELECT c_custkey, c_mktsegment, y_cents,
      |       (((s_seg - y_cents) * 100) // nullif(n_seg - 1, 0))::DOUBLE / 100.0 AS loo_enc
      |FROM cust JOIN seg USING (c_mktsegment)
      |WHERE c_custkey % 97 = 0
      |ORDER BY c_custkey
      """.stripMargin.trim))

  private val quantileBins = QueryDef(
    "ml_quantile_bins",
    "Equi-depth decile binning of c_acctbal (the feature-discretization " +
      "step before monotonic models / WoE encoding): global rank from " +
      "DistributedRank (range-partitioned sort + per-partition offsets " +
      "— NOT the single-partition row_number window), bin = " +
      "((rank−1)·10) div n — the rank-proportional cut, which unlike " +
      "NTILE has one closed form both engines state identically. " +
      "Per-bin stats are exact cents; ties total-ordered by " +
      "(cents, custkey).",
    (s, dir) => {
      val bal = Tables.customer(s, dir)
        .select(col("c_custkey"),
          (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
      val ranked = graft.operators.DistributedRank.byKey(
        bal, Seq(col("cents"), col("c_custkey")))
      val n = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .withColumn("bin", expr("((rank - 1) * 10) div n"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"),
          sum(col("cents")).as("sum_cents"))
        .orderBy(col("bin"))
    },
    Some("""
      |WITH bal AS (
      |  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM customer
      |), ranked AS (
      |  SELECT cents,
      |         row_number() OVER (ORDER BY cents, c_custkey) AS rank,
      |         count(*) OVER () AS n
      |  FROM bal
      |)
      |SELECT ((rank - 1) * 10) // n AS bin,
      |       count(*) AS n_rows,
      |       min(cents) AS lo_cents,
      |       max(cents) AS hi_cents,
      |       SUM(cents)::BIGINT AS sum_cents
      |FROM ranked GROUP BY 1 ORDER BY bin
      """.stripMargin.trim))

  private val attribution = QueryDef(
    "ev_attribution_linear",
    "Linear multi-touch attribution: every purchase distributes " +
      "1 000 000 micro-credits equally across the user's view/click " +
      "touches in the preceding 7 days, remainder to the most recent " +
      "touch — so per-conversion credit sums are EXACTLY 1 000 000 and " +
      "the report is pure integer arithmetic (no 1/n floats to " +
      "reconcile cross-engine). Time windows compare epoch-µs BIGINTs. " +
      "The per-conversion window partitions by (user_id, conv_id): in " +
      "the shuffle-join regime a 100 TB run lands in, the join's " +
      "user_id hash partitioning satisfies that spec (subset rule) and " +
      "the window adds NO exchange (PlanShapeSpec pins this); at " +
      "fixture scale the small conversion side broadcasts instead and " +
      "the window pays the one keyed shuffle itself.",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"), col("us").as("c_us"))
      val touch = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id").as("touch_id"),
          col("event_type").as("touch_type"), col("us").as("t_us"))
      val horizon = 7L * 86400L * 1000000L
      val joined = conv.join(touch, Seq("user_id"))
        .filter(col("t_us") < col("c_us") && col("c_us") - col("t_us") <= horizon)
      val w = Window.partitionBy(col("user_id"), col("conv_id"))
      val credited = joined
        .withColumn("n_t", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(
          w.orderBy(col("t_us").desc, col("touch_id").desc)))
        .withColumn("credit",
          expr("1000000 div n_t") +
            when(col("rn") === 1, expr("1000000 % n_t")).otherwise(lit(0L)))
      credited.groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("conv_id")).as("n_conversions"),
          sum(col("credit")).as("credit_micros"))
        .orderBy(col("touch_type"))
    },
    Some("""
      |WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS us FROM events
      |), conv AS (
      |  SELECT user_id, event_id AS conv_id, us AS c_us FROM ev WHERE event_type = 'purchase'
      |), touch AS (
      |  SELECT user_id, event_id AS touch_id, event_type AS touch_type, us AS t_us
      |  FROM ev WHERE event_type IN ('view', 'click')
      |), joined AS (
      |  SELECT c.user_id, c.conv_id, t.touch_id, t.touch_type, t.t_us
      |  FROM conv c JOIN touch t ON c.user_id = t.user_id
      |  WHERE t.t_us < c.c_us AND c.c_us - t.t_us <= 604800000000
      |), credited AS (
      |  SELECT touch_type, conv_id,
      |         1000000 // count(*) OVER (PARTITION BY user_id, conv_id) +
      |           CASE WHEN row_number() OVER (PARTITION BY user_id, conv_id
      |                        ORDER BY t_us DESC, touch_id DESC) = 1
      |                THEN 1000000 % count(*) OVER (PARTITION BY user_id, conv_id)
      |                ELSE 0 END AS credit
      |  FROM joined
      |)
      |SELECT touch_type, count(*) AS n_touches,
      |       count(DISTINCT conv_id) AS n_conversions,
      |       SUM(credit)::BIGINT AS credit_micros
      |FROM credited GROUP BY 1 ORDER BY touch_type
      """.stripMargin.trim))

  private val itemCooccurrence = QueryDef(
    "ml_item_cooccurrence",
    "Market-basket co-occurrence mining (the item-item collaborative-" +
      "filtering / association-rule primitive): baskets = distinct " +
      "(order, part) pairs, candidate pairs generated WITHIN each " +
      "basket (a < b), so the pair space is Σ basket-size² — bounded " +
      "by order width, never |items|². Support, directed confidences " +
      "and lift are single IEEE divisions of exact BIGINT counts " +
      "(lift's numerator c_ab·N ≤ 2⁵³ decades past sf10). Top 25 " +
      "pairs selected on the exact integer count with (a, b) " +
      "tiebreaks. One orderkey shuffle for pairing; the item-count " +
      "join keys on partkey (vocabulary-sized relation).",
    (s, dir) => {
      val basket = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val nOrders = basket.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val itemCounts = basket.groupBy(col("item")).agg(count(lit(1)).as("ci"))
      // the dominant cost — the within-basket pair self-join — comes
      // from the support-1 co-purchase memo (one build per (fixture,
      // JVM), shared with graph_degree_assortativity); only the
      // basket-level stats above still scan lineitem
      val pairs = StatQueries.coPurchaseEdges(s, dir, 1)
        .select(col("src").as("ia"), col("dst").as("ib"), col("n_co").as("cab"))
      pairs
        .join(itemCounts.select(col("item").as("ia"), col("ci").as("ca")), Seq("ia"))
        .join(itemCounts.select(col("item").as("ib"), col("ci").as("cb")), Seq("ib"))
        .crossJoin(broadcast(nOrders))
        .orderBy(col("cab").desc, col("ia"), col("ib")).limit(25)
        .select(col("ia").as("item_a"), col("ib").as("item_b"),
          col("cab").as("n_both"), col("ca").as("n_a"), col("cb").as("n_b"),
          round(col("cab").cast("double") / col("n_orders").cast("double"), 6)
            .as("support"),
          round(col("cab").cast("double") / col("ca").cast("double"), 6)
            .as("conf_a_to_b"),
          round(col("cab").cast("double") / col("cb").cast("double"), 6)
            .as("conf_b_to_a"),
          round((col("cab") * col("n_orders")).cast("double") /
            (col("ca") * col("cb")).cast("double"), 6).as("lift"))
        .orderBy(col("n_both").desc, col("item_a"), col("item_b"))
    },
    Some("""
      |WITH basket AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
      |), n AS (SELECT count(DISTINCT ok) AS n_orders FROM basket),
      |ic AS (SELECT item, count(*) AS ci FROM basket GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS ia, b.item AS ib, count(*) AS cab
      |  FROM basket a JOIN basket b ON a.ok = b.ok AND a.item < b.item
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT ia, ib, cab FROM pairs ORDER BY cab DESC, ia, ib LIMIT 25
      |)
      |SELECT ia AS item_a, ib AS item_b, cab AS n_both,
      |       ca.ci AS n_a, cb.ci AS n_b,
      |       round(cab::DOUBLE / n_orders::DOUBLE, 6) AS support,
      |       round(cab::DOUBLE / ca.ci::DOUBLE, 6) AS conf_a_to_b,
      |       round(cab::DOUBLE / cb.ci::DOUBLE, 6) AS conf_b_to_a,
      |       round((cab * n_orders)::DOUBLE / (ca.ci * cb.ci)::DOUBLE, 6) AS lift
      |FROM top
      |JOIN ic ca ON top.ia = ca.item
      |JOIN ic cb ON top.ib = cb.item
      |CROSS JOIN n
      |ORDER BY n_both DESC, item_a, item_b
      """.stripMargin.trim))

  private val naiveBayes = QueryDef(
    "ml_naive_bayes",
    "Multinomial Naive Bayes trained and evaluated in-engine — the " +
      "canonical counts-only classifier that trains in ONE aggregation " +
      "pass at any corpus size: docs split train/test by doc_id % 3, " +
      "the model is per-class token counts with add-one smoothing " +
      "(log p(w|c) = ln((c_wc+1)/(N_c+V))) plus log-priors, and every " +
      "test doc is argmax-scored. Sufficient statistics are exact " +
      "BIGINT counts; each log term rounds to 6 decimals and per-" +
      "(doc, class) sums accumulate in DECIMAL(38,6), so the argmax " +
      "compares exact decimals (ties → class asc). Scale shape: " +
      "training = two corpus-scan aggregates; the (vocab × class) " +
      "likelihood table joins on the token key with NO broadcast hint " +
      "— the planner may size-broadcast a small side at fixture SFs, " +
      "and at scale the same join shuffles (PlanShapeSpec locks the " +
      "hint-free shape); scoring is one (doc, class)-keyed aggregate " +
      "and the per-doc argmax window partitions by doc_id — a subset " +
      "of the aggregate's partitioning, no extra exchange. Test " +
      "tokens outside the train vocabulary drop via the inner join " +
      "(identical in both engines). Output: the confusion matrix.",
    (s, dir) => {
      val tk = TextQueries.docToks(s, dir)
        .select(col("doc_id"), col("lang"), col("toks"))
      val train = tk.filter(col("doc_id") % 3 =!= 0)
      val test = tk.filter(col("doc_id") % 3 === 0)
      val trainTok = train.select(col("lang"), explode(col("toks")).as("w"))
      val classTok = trainTok.groupBy(col("lang"), col("w"))
        .agg(count(lit(1)).as("cwc"))
      val classTot = trainTok.groupBy(col("lang")).agg(count(lit(1)).as("nc"))
      val priors = train.groupBy(col("lang")).agg(count(lit(1)).as("dc"))
      val dAll = train.agg(count(lit(1)).as("d_all"))
      val vocab = trainTok.select(col("w")).distinct()
      val vSize = vocab.agg(count(lit(1)).as("v"))
      val tokLL = vocab
        .crossJoin(broadcast(classTot).crossJoin(broadcast(vSize)))
        .join(classTok, Seq("w", "lang"), "left")
        .select(col("w"), col("lang").as("cls"),
          round(log((coalesce(col("cwc"), lit(0L)) + 1L).cast("double") /
            (col("nc") + col("v")).cast("double")), 6).as("ll"))
      val testTok = test.select(col("doc_id"), col("lang").as("true_lang"),
        explode(col("toks")).as("w"))
      val parts = testTok.join(tokLL, Seq("w"))
        .groupBy(col("doc_id"), col("true_lang"), col("cls"))
        .agg(sum(col("ll").cast(dec6)).as("llsum"))
      val priorLL = priors.crossJoin(broadcast(dAll))
        .select(col("lang").as("cls"),
          round(log(col("dc").cast("double") / col("d_all").cast("double")), 6)
            .cast(dec6).as("lp"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cls"))
      parts.join(broadcast(priorLL), Seq("cls"))
        .withColumn("score", col("llsum") + col("lp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("true_lang"), col("cls").as("pred_lang"))
        .groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("true_lang"), col("pred_lang"))
    },
    Some(s"""
      |${Duck.docToks},
      |tk AS (SELECT doc_id, lang, toks FROM tt),
      |train AS (SELECT * FROM tk WHERE doc_id % 3 <> 0),
      |test AS (SELECT * FROM tk WHERE doc_id % 3 = 0),
      |traintok AS (SELECT lang, unnest(toks) AS w FROM train),
      |classtok AS (SELECT lang, w, count(*) AS cwc FROM traintok GROUP BY 1, 2),
      |classtot AS (SELECT lang, count(*) AS nc FROM traintok GROUP BY 1),
      |priors AS (SELECT lang, count(*) AS dc FROM train GROUP BY 1),
      |dall AS (SELECT count(*) AS d_all FROM train),
      |vocab AS (SELECT DISTINCT w FROM traintok),
      |vsize AS (SELECT count(*) AS v FROM vocab),
      |tokll AS (
      |  SELECT vocab.w, ct.lang AS cls,
      |         round(ln(CAST(COALESCE(k.cwc, 0) + 1 AS DOUBLE) /
      |                  CAST(ct.nc + vsize.v AS DOUBLE)), 6) AS ll
      |  FROM vocab CROSS JOIN classtot ct CROSS JOIN vsize
      |  LEFT JOIN classtok k ON k.w = vocab.w AND k.lang = ct.lang
      |), testtok AS (
      |  SELECT doc_id, lang AS true_lang, unnest(toks) AS w FROM test
      |), parts AS (
      |  SELECT t.doc_id, t.true_lang, l.cls,
      |         SUM(CAST(l.ll AS DECIMAL(38,6))) AS llsum
      |  FROM testtok t JOIN tokll l ON t.w = l.w
      |  GROUP BY 1, 2, 3
      |), prll AS (
      |  SELECT p.lang AS cls,
      |         CAST(round(ln(CAST(p.dc AS DOUBLE) / CAST(d.d_all AS DOUBLE)), 6)
      |              AS DECIMAL(38,6)) AS lp
      |  FROM priors p CROSS JOIN dall d
      |), pred AS (
      |  SELECT doc_id, true_lang, parts.cls AS pred_lang,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY parts.llsum + prll.lp DESC, parts.cls) AS rn
      |  FROM parts JOIN prll ON parts.cls = prll.cls
      |)
      |SELECT true_lang, pred_lang, count(*) AS n_docs
      |FROM pred WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY true_lang, pred_lang
      """.stripMargin.trim))

  private val aucRoc = QueryDef(
    "ml_auc_roc",
    "ROC curve + trapezoid AUC — the binary-classifier evaluation " +
      "primitive, computed from exact counts: score = discount cents " +
      "(11 distinct thresholds), label = returnflag 'R'. One corpus " +
      "aggregate produces per-threshold (pos, neg) counts; cumulative " +
      "TP/FP, TPR/FPR and the trapezoid terms all live on the " +
      "threshold-count relation — BOUNDED by the score's distinct " +
      "values, so the windows are single-partition by construction " +
      "and cost nothing at any corpus size (for continuous scores, " +
      "bin first — ml_quantile_bins is the companion). TPR/FPR round " +
      "at 6; each trapezoid term (product of rounded doubles — IEEE-" +
      "identical cross-engine) rounds at 10 and sums in " +
      "DECIMAL(38,10), so the AUC is order-independent exact until " +
      "the final cast.",
    (s, dir) => {
      val byThr = Tables.lineitem(s, dir)
        .select((col("l_discount").cast(Queries.Money.rate) * 100)
          .cast("long").as("thr_cents"), col("l_returnflag"))
        .groupBy(col("thr_cents"))
        .agg(count(when(col("l_returnflag") === "R", lit(1))).as("pos_d"),
          count(when(col("l_returnflag") =!= "R", lit(1))).as("neg_d"))
      val tot = byThr.agg(sum(col("pos_d")).cast("long").as("p_all"),
        sum(col("neg_d")).cast("long").as("n_all"))
      val wOrd = Window.orderBy(col("thr_cents").desc)
      val terms = byThr.crossJoin(broadcast(tot))
        .withColumn("tp", sum(col("pos_d")).over(wOrd))
        .withColumn("fp", sum(col("neg_d")).over(wOrd))
        .withColumn("tpr",
          round(col("tp").cast("double") / col("p_all").cast("double"), 6))
        .withColumn("fpr",
          round(col("fp").cast("double") / col("n_all").cast("double"), 6))
        .withColumn("term", round(
          (col("fpr") - lag(col("fpr"), 1, 0.0).over(wOrd)) *
            (col("tpr") + lag(col("tpr"), 1, 0.0).over(wOrd)) / lit(2.0), 10))
      val auc = terms.agg(
        round(sum(col("term").cast(DecimalType(38, 10))).cast("double"), 6)
          .as("auc"))
      terms.crossJoin(broadcast(auc))
        .select(col("thr_cents"), col("tp"), col("fp"),
          col("tpr"), col("fpr"), col("auc"))
        .orderBy(col("thr_cents").desc)
    },
    Some("""
      |WITH bythr AS (
      |  SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS thr_cents,
      |         count(*) FILTER (WHERE l_returnflag = 'R') AS pos_d,
      |         count(*) FILTER (WHERE l_returnflag <> 'R') AS neg_d
      |  FROM lineitem GROUP BY 1
      |), tot AS (
      |  SELECT SUM(pos_d)::BIGINT AS p_all, SUM(neg_d)::BIGINT AS n_all FROM bythr
      |), cum AS (
      |  SELECT thr_cents,
      |         CAST(SUM(pos_d) OVER w AS BIGINT) AS tp,
      |         CAST(SUM(neg_d) OVER w AS BIGINT) AS fp,
      |         p_all, n_all
      |  FROM bythr CROSS JOIN tot
      |  WINDOW w AS (ORDER BY thr_cents DESC)
      |), rates AS (
      |  SELECT thr_cents, tp, fp,
      |         round(CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE), 6) AS tpr,
      |         round(CAST(fp AS DOUBLE) / CAST(n_all AS DOUBLE), 6) AS fpr
      |  FROM cum
      |), terms AS (
      |  SELECT thr_cents, tp, fp, tpr, fpr,
      |         round((fpr - lag(fpr, 1, 0.0) OVER w) *
      |               (tpr + lag(tpr, 1, 0.0) OVER w) / 2.0, 10) AS term
      |  FROM rates
      |  WINDOW w AS (ORDER BY thr_cents DESC)
      |), auc AS (
      |  SELECT round(CAST(SUM(CAST(term AS DECIMAL(38,10))) AS DOUBLE), 6) AS auc
      |  FROM terms
      |)
      |SELECT thr_cents, tp, fp, tpr, fpr, auc
      |FROM terms CROSS JOIN auc
      |ORDER BY thr_cents DESC
      """.stripMargin.trim))

  /** Fitted k=8 KMeans centroids per fixture dir, kept for the LATE
    * oracle (same self-consistency contract as the ANN stores: KMeans
    * is not SQL-recomputable, so the oracle embeds THIS run's fitted
    * centroid literals).
    */
  private object SilStore {
    val cents = scala.collection.concurrent.TrieMap.empty[String, Array[Array[Float]]]
    @volatile var lastDir: Option[String] = None
    def ensure(s: org.apache.spark.sql.SparkSession, dir: String): Array[Array[Float]] = {
      lastDir = Some(dir)
      cents.getOrElseUpdate(dir, graft.operators.Ann.kmeansCentroids(
        Tables.embeddings(s, dir), "embedding", nlist = 8))
    }
  }

  private val silhouette = QueryDef(
    "ml_silhouette",
    "Clustering quality via simplified silhouette (Hruschka et al.'s " +
      "centroid variant of Rousseeuw 1987): per vector, a = cosine " +
      "distance to its own (nearest) centroid, b = distance to the " +
      "second-nearest, s = (b−a)/max(a,b) — the embedding-curation " +
      "health metric that tells you whether a clustering is tight " +
      "enough to drive SemDeDup pruning or IVF partitioning. O(n·k) " +
      "distance evaluations in ONE codegen'd projection (the centroid " +
      "array is a literal; per-row sort of k (distance, id) structs " +
      "replaces the self-join of the exact silhouette, which is O(n²) " +
      "and off the table at 100 TB), then one cluster-keyed " +
      "aggregate. Distances round at 6 before the per-row sort (ties " +
      "→ lower centroid id in both engines); per-cluster means " +
      "accumulate in DECIMAL(38,6). The oracle embeds this run's " +
      "fitted centroids (late-bound, like the ANN stores).",
    (s, dir) => {
      import graft.functions.VectorFunctions.cosineDistance
      val cents = SilStore.ensure(s, dir)
      val centsLit = typedLit(cents.map(_.toSeq).toSeq)
      val idxs = sequence(lit(0), lit(cents.length - 1))
      val arr = sort_array(zip_with(centsLit, idxs, (c, i) =>
        struct(round(cosineDistance(col("embedding"), c), 6).as("d"), i.as("k"))))
      Tables.embeddings(s, dir)
        .withColumn("arr", arr)
        .select(col("vec_id"),
          element_at(col("arr"), 1).getField("k").as("cluster"),
          element_at(col("arr"), 1).getField("d").as("a"),
          element_at(col("arr"), 2).getField("d").as("b"))
        .withColumn("sil", round((col("b") - col("a")) /
          when(greatest(col("a"), col("b")) === 0.0, lit(1.0))
            .otherwise(greatest(col("a"), col("b"))), 6))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("sil").cast(dec6)).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_sil"))
        .orderBy(col("cluster"))
    },
    oracle = None,
    oracleLate = Some(() => SilStore.lastDir.flatMap(SilStore.cents.get).map { cents =>
      val rows = cents.zipWithIndex
        .map { case (c, k) => s"($k, ${Duck.vecLit(c)})" }.mkString(",\n    ")
      s"""
      |WITH cents AS (
      |  SELECT * FROM (VALUES
      |    $rows) AS t(k, c)
      |), d AS (
      |  SELECT vec_id, k, round(${Duck.cosine("embedding::DOUBLE[]", "c")}, 6) AS d
      |  FROM embeddings CROSS JOIN cents
      |), r AS (
      |  SELECT vec_id, k, d,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn
      |  FROM d
      |), own AS (SELECT vec_id, k AS cluster, d AS a FROM r WHERE rn = 1),
      |nb AS (SELECT vec_id, d AS b FROM r WHERE rn = 2),
      |s AS (
      |  SELECT own.vec_id, cluster,
      |         round((b - a) / CASE WHEN greatest(a, b) = 0.0 THEN 1.0
      |                              ELSE greatest(a, b) END, 6) AS sil
      |  FROM own JOIN nb ON own.vec_id = nb.vec_id
      |)
      |SELECT cluster, count(*) AS n_vecs,
      |       round(CAST(SUM(CAST(sil AS DECIMAL(38,6))) AS DOUBLE) /
      |             CAST(count(*) AS DOUBLE), 6) AS mean_sil
      |FROM s GROUP BY 1 ORDER BY cluster
      """.stripMargin.trim
    }))

  /** Full-batch gradient-descent iterations for [[logregGd]]. Each is
    * one corpus aggregate; the oracle unrolls the same count.
    */
  private val LogregIters = 8

  /** Driver-side mirror of SQL `round(x, 8)`: BigDecimal.valueOf uses
    * the double's shortest decimal repr then HALF_UP — verified equal
    * to DuckDB's round(DOUBLE, n) on tie and boundary cases (2.675,
    * 0.1234565, negatives) before this query was written.
    */
  private def rd8(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The checkpointed training base for [[logregGd]] — factored with
    * [[logregIterAgg]] so PlanShapeSpec drives the production iteration
    * plan. The 9 GD iterations re-read this relation, so its RESIDENT
    * footprint decides the eviction decade (the sf100 probe measured the
    * 3-double base evicting at 16 GB and every iteration re-scanning):
    * all three features are low-cardinality exact integers — y ∈ {0,1},
    * discount ∈ {0.00..0.10 step .01} so d·100 ∈ 0..10, quantity ∈
    * 1..50 — so the CHECKPOINTED rows pack the triple into ONE BIGINT
    * `y·10⁴ + d100·10² + q` (16-byte UnsafeRows vs 32: null word + one
    * field slot — halving the blocks halves the decade at which
    * iterations fall back to re-scans). The unpack projection sits
    * ABOVE the checkpoint: integer div/mod then the SAME divisions as
    * before (d100/100.0 is the correctly-rounded k/100 = the parquet
    * double; q/50.0 unchanged), so every downstream activation is
    * bit-identical to the unpacked form and the oracle — which
    * recomputes the base from lineitem — is untouched.
    */
  private[graft] def logregBase(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(s, dir).select(
      (when(col("l_returnflag") === "R", 10000L).otherwise(0L) +
        round(col("l_discount") * lit(100.0)).cast("long") * lit(100L) +
        col("l_quantity").cast("long")).as("p"))
      // SUFFICIENT STATISTICS (r21, guide §8 "decide with small rows"):
      // the feature space has ≤ 2·11·50 = 1100 distinct packed values,
      // and every per-row GD term depends only on (y, x1, x2) — so ONE
      // corpus pass counts the distinct triples and each of the 9
      // iterations aggregates the 1100-row (triple, cnt) relation
      // instead of re-scanning the corpus: Σ_rows dec(term) =
      // Σ_groups cnt·dec(term) EXACTLY (decimal × integer is exact
      // repeated addition — no float reassociation anywhere). The
      // iteration cost is now O(|distinct triples|) at ANY corpus
      // scale; the one corpus-sized pass is this map-side-combining
      // count, which replaces the old 600k-row checkpoint (the packed
      // BIGINT keeps that pass's shuffle rows at 16 bytes as before).
      .groupBy(col("p")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
      .select(
        expr("CAST(p div 10000 AS DOUBLE)").as("y"),
        (expr("CAST((p div 100) % 100 AS DOUBLE)") / lit(100.0)).as("x1"),
        (expr("CAST(p % 100 AS DOUBLE)") / lit(50.0)).as("x2"),
        col("cnt"))

  /** One full-batch GD iteration for [[logregGd]] — factored so
    * PlanShapeSpec asserts the production per-iteration plan: a single
    * map-side-combining HashAggregate pair over the checkpointed
    * 3-column projection, the only exchange the final SinglePartition
    * gather of 4 decimal sums (no hashpartitioning exchange anywhere).
    */
  /** Narrow exact-sum channel for the GD terms: every per-row term is
    * round(x, 6) with |x| < 4 (err ∈ (−1,1), |x1| ≤ 0.1, x2 ≤ 1, err²
    * < 1), so DECIMAL(8,6) holds each value exactly and Spark's sum
    * buffer widens to (18,6) — still ≤ 18 digits, i.e. COMPACT-LONG
    * decimals end to end (UnsafeRow stores ≤18-digit decimals as a
    * long; 38-digit decimals are BigDecimal-backed). Same fixed-point
    * sum, same value at any SF below ~10¹² rows (Σ unscaled ≤ n·4·10⁶
    * < 10¹⁸), measured 2.2× on the whole query (r21: 16.4 s → 7.4 s
    * solo; guide §2.3 "narrower types" applied to the aggregation
    * buffer). The oracle's DECIMAL(38,6) sums the identical rounded
    * values — width is representation, not value.
    */
  private val gdTerm = DecimalType(8, 6)

  private[graft] def logregIterAgg(base: org.apache.spark.sql.DataFrame,
                                   w: (Double, Double, Double)): org.apache.spark.sql.DataFrame = {
    val z = (lit(w._1) + (lit(w._2) * col("x1"))) + (lit(w._3) * col("x2"))
    val sgm = lit(0.5) + (lit(0.5) * z) / (lit(1.0) + abs(z))
    val err = sgm - col("y")
    // cast(x as decimal(8,6)) ≡ cast(round(x,6) as decimal(8,6)) here,
    // in ONE BigDecimal chain instead of two: both paths HALF_UP-round
    // BigDecimal.valueOf(x) at scale 6, and round()'s intermediate
    // .doubleValue() round-trip is exact because a ≤7-significant-digit
    // decimal always round-trips through double. Verified per ROW over
    // the full 9-iteration weight trajectory at sf0.1 (0 mismatches;
    // r21 probe) — round() itself was ~60% of each iteration's CPU.
    // The cnt weighting keeps the sum EXACT (decimal(8,6) × bigint is
    // exact integer arithmetic on the unscaled value; ≤ 29 digits).
    base.select(
      (err.cast(gdTerm) * col("cnt")).as("t0"),
      ((err * col("x1")).cast(gdTerm) * col("cnt")).as("t1"),
      ((err * col("x2")).cast(gdTerm) * col("cnt")).as("t2"),
      ((err * err).cast(gdTerm) * col("cnt")).as("tb"))
      .agg(sum(col("t0")), sum(col("t1")), sum(col("t2")), sum(col("tb")))
  }

  private val logregGd = QueryDef(
    "ml_logreg_gd",
    "In-engine linear-classifier training by full-batch gradient " +
      s"descent ($LogregIters iterations, η=2): predict returnflag='R' " +
      "from (1, discount, quantity/50). The squashing link is the " +
      "ALGEBRAIC sigmoid σ(z) = ½ + ½·z/(1+|z|) — correctly-rounded " +
      "IEEE +,×,÷,|·| only, so every per-row activation is " +
      "bit-identical cross-engine with no libm exp() in the loop, " +
      "where a 1-ulp divergence would compound through the weight " +
      "trajectory. ONE map-side-combining corpus pass counts the " +
      "≤2·11·50 distinct (y, discount, qty) feature triples (sufficient " +
      "statistics — r21); each iteration is then one aggregate over " +
      "that bounded relation: per-triple gradient/Brier terms HALF_UP-" +
      "round at 6 into DECIMAL(8,6) and sum count-weighted (exact, " +
      "order-independent — decimal × integer is exact repeated " +
      "addition, ≡ the per-row DECIMAL(38,6) sum value for value " +
      "through ~10¹² rows), then the mean rounds at 8 and the weight " +
      "update replays in identical rounded double arithmetic on both " +
      "engines; the driver holds only the 3-vector of weights (the " +
      "KMeans contract — bounded model state, data never collected). " +
      "The oracle unrolls the same " +
      s"$LogregIters aggregate+update steps as CTEs. Output: the " +
      "(iter, w, entering-Brier) trajectory — Brier 0.25 → 0.2226 on " +
      "the gate fixture, monotone (spec-locked).",
    (s, dir) => {
      import s.implicits._
      val base = logregBase(s, dir)
      // n = corpus rows = Σ cnt over the sufficient-statistics relation
      val n = base.agg(sum(col("cnt"))).head().getLong(0).toDouble
      var w = (0.0, 0.0, 0.0)
      val hist =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Double, Double)]
      for (t <- 0 to LogregIters) {
        val r = logregIterAgg(base, w).head()
        def g(i: Int) = rd8(r.getDecimal(i).doubleValue() / n)
        hist += ((t.toLong, w._1, w._2, w._3, g(3)))
        if (t < LogregIters)
          w = (rd8(w._1 - (2.0 * g(0))),
            rd8(w._2 - (2.0 * g(1))),
            rd8(w._3 - (2.0 * g(2))))
      }
      hist.toSeq.toDF("iter", "w0", "w1", "w2", "brier")
        .orderBy(col("iter"))
    },
    Some {
      val ctes = scala.collection.mutable.ArrayBuffer(
        """base AS MATERIALIZED (
          |  SELECT CAST(CAST(l_returnflag = 'R' AS INT) AS DOUBLE) AS y,
          |         CAST(l_discount AS DOUBLE) AS x1,
          |         CAST(l_quantity AS DOUBLE) / 50.0 AS x2
          |  FROM lineitem
          |)""".stripMargin,
        "n AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM base)",
        "w0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)")
      // every g/w CTE is referenced twice (the next step + the final
      // UNION) — MATERIALIZED, or DuckDB inlines the single-row CTEs
      // and re-runs the upstream chain exponentially in the iteration
      // depth (2^8 corpus scans; surfaced as a spill-to-disk-full at
      // the sf1 gate — the triangle-count lesson again)
      for (t <- 0 to LogregIters) {
        ctes += s"""g$t AS MATERIALIZED (
          |  SELECT
          |    round(CAST(SUM(CAST(round(s - y, 6) AS DECIMAL(38,6))) AS DOUBLE) / max(n), 8) AS g0,
          |    round(CAST(SUM(CAST(round((s - y) * x1, 6) AS DECIMAL(38,6))) AS DOUBLE) / max(n), 8) AS g1,
          |    round(CAST(SUM(CAST(round((s - y) * x2, 6) AS DECIMAL(38,6))) AS DOUBLE) / max(n), 8) AS g2,
          |    round(CAST(SUM(CAST(round((s - y) * (s - y), 6) AS DECIMAL(38,6))) AS DOUBLE) / max(n), 8) AS brier
          |  FROM (
          |    SELECT y, x1, x2, n, 0.5 + (0.5 * z) / (1.0 + abs(z)) AS s
          |    FROM (SELECT y, x1, x2, n.n AS n, (w.w0 + (w.w1 * x1)) + (w.w2 * x2) AS z
          |          FROM base CROSS JOIN w$t w CROSS JOIN n)
          |  )
          |)""".stripMargin
        if (t < LogregIters)
          ctes += s"""w${t + 1} AS MATERIALIZED (
            |  SELECT round(w.w0 - (2.0 * g.g0), 8) AS w0,
            |         round(w.w1 - (2.0 * g.g1), 8) AS w1,
            |         round(w.w2 - (2.0 * g.g2), 8) AS w2
            |  FROM w$t w CROSS JOIN g$t g
            |)""".stripMargin
      }
      val sel = (0 to LogregIters).map { t =>
        s"SELECT CAST($t AS BIGINT) AS iter, w.w0, w.w1, w.w2, g.brier " +
          s"FROM w$t w CROSS JOIN g$t g"
      }.mkString("\nUNION ALL\n")
      s"""
      |WITH ${ctes.mkString(",\n")}
      |SELECT * FROM (
      |$sel
      |) ORDER BY iter
      """.stripMargin.trim
    })

  private val calibrationEce = QueryDef(
    "ml_calibration_ece",
    "Reliability diagram + expected calibration error (ECE, Naeini et " +
      "al. 2015) — the probability-quality gate beside ml_auc_roc's " +
      "discrimination gate: a per-source empirical P(lang='en') model " +
      "trains on documents with doc_id % 3 ≠ 0 (source is the one " +
      "fixture feature with real signal — confidences span 0.24–0.64; " +
      "discount→returnflag was probed first and is flat 0.33 " +
      "everywhere, which collapses the diagram to one bin), every " +
      "held-out doc is scored by its source's confidence, predictions " +
      "land in 10 equal-width confidence bins (floor(conf·10), top " +
      "bin clamped), and ECE = Σ_b (n_b/N)·|accuracy_b − " +
      "confidence_b|. Training is one source-keyed aggregate " +
      "broadcast back; scoring is one corpus pass + one ≤10-key " +
      "rollup — nothing is driver-sized at any SF. Exact counts " +
      "throughout; acc/conf round at 6, per-bin ECE terms at 10 " +
      "summing in DECIMAL(38,10).",
    (s, dir) => {
      def split(pred: org.apache.spark.sql.Column) =
        Tables.documents(s, dir).filter(pred).select(
          col("source").as("b"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      val conf = split(col("doc_id") % 3 =!= 0)
        .groupBy(col("b"))
        .agg(round(sum(col("y")).cast("double") /
          count(lit(1)).cast("double"), 6).as("conf"))
      val scored = split(col("doc_id") % 3 === 0)
        .join(broadcast(conf), Seq("b"))
        .select(col("y"), col("conf"),
          least(lit(9L), floor(col("conf") * lit(10.0)).cast("long")).as("bin"))
      val bins = scored.groupBy(col("bin"))
        .agg(count(lit(1)).as("n_rows"), sum(col("y")).as("pos_rows"),
          round(sum(col("y")).cast("double") /
            count(lit(1)).cast("double"), 6).as("acc"),
          round(sum(col("conf").cast(dec6)).cast("double") /
            count(lit(1)).cast("double"), 6).as("conf_mean"))
      val tot = bins.agg(sum(col("n_rows")).cast("long").as("n_all"))
      val terms = bins.crossJoin(broadcast(tot))
        .withColumn("term", round(
          (col("n_rows").cast("double") / col("n_all").cast("double")) *
            abs(col("acc") - col("conf_mean")), 10))
      val ece = terms.agg(
        round(sum(col("term").cast(DecimalType(38, 10))).cast("double"), 6)
          .as("ece"))
      terms.crossJoin(broadcast(ece))
        .select(col("bin"), col("n_rows"), col("pos_rows"),
          col("acc"), col("conf_mean"), col("ece"))
        .orderBy(col("bin"))
    },
    Some("""
      |WITH train AS (
      |  SELECT source AS b,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents WHERE doc_id % 3 <> 0
      |), conf AS (
      |  SELECT b, round(CAST(SUM(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS conf
      |  FROM train GROUP BY 1
      |), test AS (
      |  SELECT source AS b,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents WHERE doc_id % 3 = 0
      |), scored AS (
      |  SELECT t.y, c.conf,
      |         LEAST(9, CAST(floor(c.conf * 10.0) AS BIGINT)) AS bin
      |  FROM test t JOIN conf c USING (b)
      |), bins AS (
      |  SELECT bin, count(*) AS n_rows, SUM(y)::BIGINT AS pos_rows,
      |         round(CAST(SUM(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS acc,
      |         round(CAST(SUM(CAST(conf AS DECIMAL(38,6))) AS DOUBLE) /
      |               CAST(count(*) AS DOUBLE), 6) AS conf_mean
      |  FROM scored GROUP BY 1
      |), tot AS (
      |  SELECT SUM(n_rows)::BIGINT AS n_all FROM bins
      |), terms AS (
      |  SELECT bin, n_rows, pos_rows, acc, conf_mean,
      |         round((CAST(n_rows AS DOUBLE) / CAST(n_all AS DOUBLE)) *
      |               abs(acc - conf_mean), 10) AS term
      |  FROM bins CROSS JOIN tot
      |), ece AS (
      |  SELECT round(CAST(SUM(CAST(term AS DECIMAL(38,10))) AS DOUBLE), 6) AS ece
      |  FROM terms
      |)
      |SELECT bin, n_rows, pos_rows, acc, conf_mean, ece
      |FROM terms CROSS JOIN ece
      |ORDER BY bin
      """.stripMargin.trim))

  private val kfoldCv = QueryDef(
    "ml_kfold_cv",
    "5-fold cross-validation of the per-source P(lang='en') model (the " +
      "ml_calibration_ece model under the standard eval protocol) — " +
      "computed WITHOUT five training passes: folds are assigned by " +
      "the salted portable 48-bit hash of doc_id (doc_id % 5 is " +
      "CONSTANT per source on this fixture — source derives from " +
      "doc_id % 20, so modulo folding starves every leave-fold-out " +
      "cell to zero training mass; hash folding decorrelates), one " +
      "corpus aggregate " +
      "produces per-(source, fold) counts, and each fold's training " +
      "statistics are the leave-fold-out complements (Σ_src − fold_src) " +
      "on the sources × folds table — the same algebra ml_target_encode " +
      "uses for leave-one-out, lifted to folds. Scoring NEVER re-scans " +
      "the corpus: a doc's hit and Brier term are functions of (conf, " +
      "y) alone, so the per-fold sums collapse onto the sources × 5 " +
      "cell table — hits = conf≥.5 ? pos : n−pos, Brier mass = " +
      "pos·round((conf−1)²,6) + (n−pos)·round(conf²,6), exact in " +
      "DECIMAL(38,6) because n identical round-6 terms sum to exactly " +
      "n·term (the r16 fix for a solo-adjudicated 1.37→1.9 s mover: " +
      "the old row-level scoring paid a SECOND documents scan, " +
      "re-hashed every doc_id, and broadcast-joined the model back per " +
      "row — for what is algebraically a 100-row computation; the " +
      "oracle still scores row-level, so the gate differentially " +
      "checks the collapse). Per-fold accuracy at the 0.5 threshold " +
      "from exact counts; the cross-fold mean/spread come from the " +
      "5-row relation. (source, fold) cells with zero leave-fold-out " +
      "training mass (a source living entirely in one fold — it " +
      "happens at sf0.001) are filtered before the division, dropping " +
      "the same docs the oracle's inner join drops.",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(
        col("source").as("b"),
        (graft.operators.TextAnalysis.md5Long48(
          concat(lit("cv:"), col("doc_id").cast("string"))) % 5).as("fold"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      val cell = docs.groupBy(col("b"), col("fold"))
        .agg(count(lit(1)).as("n_bf"), sum(col("y")).as("pos_bf"))
      val src = cell.groupBy(col("b"))
        .agg(sum(col("n_bf")).as("n_b"), sum(col("pos_bf")).as("pos_b"))
      val scoredCells = cell.join(broadcast(src), Seq("b"))
        .filter(col("n_b") > col("n_bf"))
        .select(col("fold"), col("n_bf"), col("pos_bf"),
          round((col("pos_b") - col("pos_bf")).cast("double") /
            (col("n_b") - col("n_bf")).cast("double"), 6).as("conf"))
        .select(col("fold"), col("n_bf"),
          when(col("conf") >= 0.5, col("pos_bf"))
            .otherwise(col("n_bf") - col("pos_bf")).as("hits"),
          (col("pos_bf").cast(DecimalType(38, 0)) *
            round((col("conf") - lit(1.0)) * (col("conf") - lit(1.0)), 6)
              .cast(dec6) +
            (col("n_bf") - col("pos_bf")).cast(DecimalType(38, 0)) *
              round(col("conf") * col("conf"), 6).cast(dec6)).as("sq_mass"))
      val folds = scoredCells.groupBy(col("fold"))
        .agg(sum(col("n_bf")).as("n_rows"),
          round(sum(col("hits")).cast("double") /
            sum(col("n_bf")).cast("double"), 6).as("acc"),
          round(sum(col("sq_mass")).cast("double") /
            sum(col("n_bf")).cast("double"), 6).as("brier"))
      val summ = folds.agg(
        round(sum(col("acc").cast(dec6)).cast("double") / lit(5.0), 6)
          .as("mean_acc"),
        round(sum(col("brier").cast(dec6)).cast("double") / lit(5.0), 6)
          .as("mean_brier"),
        round(max(col("acc")) - min(col("acc")), 6).as("acc_spread"))
      folds.crossJoin(broadcast(summ))
        .select(col("fold"), col("n_rows"), col("acc"), col("brier"),
          col("mean_acc"), col("mean_brier"), col("acc_spread"))
        .orderBy(col("fold"))
    },
    Some("""
      |WITH docs AS (
      |  SELECT source AS b,
      |         ('0x' || substring(md5('cv:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 5 AS fold,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |), cell AS (
      |  SELECT b, fold, count(*) AS n_bf, SUM(y)::BIGINT AS pos_bf
      |  FROM docs GROUP BY 1, 2
      |), src AS (
      |  SELECT b, SUM(n_bf)::BIGINT AS n_b, SUM(pos_bf)::BIGINT AS pos_b
      |  FROM cell GROUP BY 1
      |), conf AS (
      |  SELECT cell.b, cell.fold,
      |         round(CAST(pos_b - pos_bf AS DOUBLE) /
      |               CAST(n_b - n_bf AS DOUBLE), 6) AS conf
      |  FROM cell JOIN src USING (b)
      |  WHERE n_b > n_bf
      |), scored AS (
      |  SELECT d.fold, d.y, c.conf,
      |         CASE WHEN (c.conf >= 0.5) = (d.y = 1) THEN 1 ELSE 0 END AS hit,
      |         CAST(round((c.conf - CAST(d.y AS DOUBLE)) *
      |                    (c.conf - CAST(d.y AS DOUBLE)), 6) AS DECIMAL(38,6)) AS sq
      |  FROM docs d JOIN conf c ON d.b = c.b AND d.fold = c.fold
      |), folds AS (
      |  SELECT fold, count(*) AS n_rows,
      |         round(CAST(SUM(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS acc,
      |         round(CAST(SUM(sq) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS brier
      |  FROM scored GROUP BY 1
      |), summ AS (
      |  SELECT round(CAST(SUM(CAST(acc AS DECIMAL(38,6))) AS DOUBLE) / 5.0, 6) AS mean_acc,
      |         round(CAST(SUM(CAST(brier AS DECIMAL(38,6))) AS DOUBLE) / 5.0, 6) AS mean_brier,
      |         round(max(acc) - min(acc), 6) AS acc_spread
      |  FROM folds
      |)
      |SELECT fold, n_rows, acc, brier, mean_acc, mean_brier, acc_spread
      |FROM folds CROSS JOIN summ
      |ORDER BY fold
      """.stripMargin.trim))

  private val prCurve = QueryDef(
    "ml_pr_curve",
    "Precision–recall curve + average precision (step-wise AP, the " +
      "sklearn formulation Σ (R_i − R_{i−1})·P_i) over the same " +
      "score/label pair as ml_auc_roc — the imbalanced-data companion " +
      "to ROC (precision is base-rate-sensitive where FPR is not; " +
      "gating both curves from one counts relation shows the two " +
      "evaluation geometries agree on their shared inputs). Identical " +
      "scale shape to the ROC gate: one corpus aggregate to " +
      "per-threshold counts, then all windows run on the " +
      "threshold-bounded relation. Precision/recall round at 6; AP " +
      "terms (products of rounded doubles) round at 10 and sum in " +
      "DECIMAL(38,10).",
    (s, dir) => {
      val byThr = Tables.lineitem(s, dir)
        .select((col("l_discount").cast(Queries.Money.rate) * 100)
          .cast("long").as("thr_cents"), col("l_returnflag"))
        .groupBy(col("thr_cents"))
        .agg(count(when(col("l_returnflag") === "R", lit(1))).as("pos_d"),
          count(when(col("l_returnflag") =!= "R", lit(1))).as("neg_d"))
      val tot = byThr.agg(sum(col("pos_d")).cast("long").as("p_all"))
      val wOrd = Window.orderBy(col("thr_cents").desc)
      val terms = byThr.crossJoin(broadcast(tot))
        .withColumn("tp", sum(col("pos_d")).over(wOrd))
        .withColumn("fp", sum(col("neg_d")).over(wOrd))
        .withColumn("precision",
          round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6))
        .withColumn("recall",
          round(col("tp").cast("double") / col("p_all").cast("double"), 6))
        .withColumn("term", round(
          (col("recall") - lag(col("recall"), 1, 0.0).over(wOrd)) *
            col("precision"), 10))
      val ap = terms.agg(
        round(sum(col("term").cast(DecimalType(38, 10))).cast("double"), 6)
          .as("ap"))
      terms.crossJoin(broadcast(ap))
        .select(col("thr_cents"), col("tp"), col("fp"),
          col("precision"), col("recall"), col("ap"))
        .orderBy(col("thr_cents").desc)
    },
    Some("""
      |WITH bythr AS (
      |  SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS thr_cents,
      |         count(*) FILTER (WHERE l_returnflag = 'R') AS pos_d,
      |         count(*) FILTER (WHERE l_returnflag <> 'R') AS neg_d
      |  FROM lineitem GROUP BY 1
      |), tot AS (
      |  SELECT SUM(pos_d)::BIGINT AS p_all FROM bythr
      |), cum AS (
      |  SELECT thr_cents,
      |         CAST(SUM(pos_d) OVER w AS BIGINT) AS tp,
      |         CAST(SUM(neg_d) OVER w AS BIGINT) AS fp,
      |         p_all
      |  FROM bythr CROSS JOIN tot
      |  WINDOW w AS (ORDER BY thr_cents DESC)
      |), rates AS (
      |  SELECT thr_cents, tp, fp,
      |         round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
      |         round(CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE), 6) AS recall
      |  FROM cum
      |), terms AS (
      |  SELECT thr_cents, tp, fp, precision, recall,
      |         round((recall - lag(recall, 1, 0.0) OVER w) * precision, 10) AS term
      |  FROM rates
      |  WINDOW w AS (ORDER BY thr_cents DESC)
      |), ap AS (
      |  SELECT round(CAST(SUM(CAST(term AS DECIMAL(38,10))) AS DOUBLE), 6) AS ap
      |  FROM terms
      |)
      |SELECT thr_cents, tp, fp, precision, recall, ap
      |FROM terms CROSS JOIN ap
      |ORDER BY thr_cents DESC
      """.stripMargin.trim))

  private val liftGains = QueryDef(
    "ml_lift_gains",
    "Decile lift and cumulative-gains chart — the campaign-targeting " +
      "evaluation beside ROC (discrimination), PR (imbalance) and ECE " +
      "(calibration): documents ranked by the per-source P(lang='en') " +
      "confidence, cut into rank deciles (the ml_quantile_bins " +
      "rank-proportional cut via DistributedRank — range-partitioned " +
      "sort, not a single-partition window), and per decile the " +
      "response rate, lift over the base rate, and cumulative share " +
      "of all positives captured. Every count is exact; rates and " +
      "lift are single rounded divisions; the cumulative window runs " +
      "on the 10-row decile relation. Ties rank by (conf desc, " +
      "doc_id) via exact double negation on the Spark side ≡ ORDER " +
      "BY conf DESC in SQL.",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(
        col("doc_id"), col("source").as("b"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      val conf = docs.groupBy(col("b"))
        .agg(round(sum(col("y")).cast("double") /
          count(lit(1)).cast("double"), 6).as("conf"))
      val scored = docs.join(broadcast(conf), Seq("b"))
      val ranked = graft.operators.DistributedRank.byKey(
        scored, Seq(negate(col("conf")), col("doc_id")))
      val n = ranked.agg(count(lit(1)).as("n_all"),
        sum(col("y")).cast("long").as("pos_all"))
      val dec = ranked.crossJoin(broadcast(n))
        .withColumn("decile", expr("((rank - 1) * 10) div n_all"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_rows"), sum(col("y")).as("pos_rows"),
          max(col("n_all")).as("n_all"), max(col("pos_all")).as("pos_all"))
      val wCum = Window.orderBy(col("decile"))
      dec
        .withColumn("rate",
          round(col("pos_rows").cast("double") / col("n_rows").cast("double"), 6))
        .withColumn("lift", round(
          (col("pos_rows") * col("n_all")).cast("double") /
            (col("n_rows") * col("pos_all")).cast("double"), 6))
        .withColumn("cum_gain", round(
          sum(col("pos_rows")).over(wCum).cast("double") /
            col("pos_all").cast("double"), 6))
        .select(col("decile"), col("n_rows"), col("pos_rows"),
          col("rate"), col("lift"), col("cum_gain"))
        .orderBy(col("decile"))
    },
    Some("""
      |WITH docs AS (
      |  SELECT doc_id, source AS b,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |), conf AS (
      |  SELECT b, round(CAST(SUM(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS conf
      |  FROM docs GROUP BY 1
      |), ranked AS (
      |  SELECT y,
      |         row_number() OVER (ORDER BY conf DESC, doc_id) AS rank,
      |         count(*) OVER () AS n_all,
      |         SUM(y) OVER ()::BIGINT AS pos_all
      |  FROM docs JOIN conf USING (b)
      |), dec AS (
      |  SELECT ((rank - 1) * 10) // n_all AS decile,
      |         count(*) AS n_rows, SUM(y)::BIGINT AS pos_rows,
      |         max(n_all)::BIGINT AS n_all, max(pos_all) AS pos_all
      |  FROM ranked GROUP BY 1
      |)
      |SELECT decile, n_rows, pos_rows,
      |       round(CAST(pos_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS rate,
      |       round(CAST(pos_rows * n_all AS DOUBLE) /
      |             CAST(n_rows * pos_all AS DOUBLE), 6) AS lift,
      |       round(CAST(SUM(pos_rows) OVER (ORDER BY decile) AS DOUBLE) /
      |             CAST(pos_all AS DOUBLE), 6) AS cum_gain
      |FROM dec
      |ORDER BY decile
      """.stripMargin.trim))

  /** Shared closed-form text for the ridge normal-equations solve: the
    * SAME arithmetic string runs through Spark's `expr` and DuckDB
    * verbatim, so the two engines evaluate an identical IEEE expression
    * tree over identical doubles — the strongest form of the
    * fixed-parenthesization rule. Column names are the symmetric 3×3
    * system (XᵀX + λ·diag(0,1,1)) in a11..a33 / rhs b1..b3.
    */
  private val RidgeDet =
    "(a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13))"
  private val RidgeDet0 =
    "(b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3) + a13*(b2*a23 - a22*b3))"
  private val RidgeDet1 =
    "(a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13) + a13*(a12*b3 - b2*a13))"
  private val RidgeDet2 =
    "(a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13) + b1*(a12*a23 - a22*a13))"
  private val RidgeLambda = "10000.0"
  private val RidgeR2 =
    "1.0 - (syy - 2*(beta0*b1 + beta1*b2 + beta2*b3) + " +
      "(beta0*beta0*a11 + beta1*beta1*r11 + beta2*beta2*r22 + " +
      "2*beta0*beta1*a12 + 2*beta0*beta2*a13 + 2*beta1*beta2*a23)) / " +
      "(syy - b1*b1/a11)"

  private val ridge = QueryDef(
    "ml_ridge_regression",
    "Closed-form ridge regression (normal equations, λ=" + RidgeLambda +
      " on the slopes only): fit extended price (integer dollars — " +
      "cents deterministically truncated, part of the definition) on " +
      "quantity and discount-percent across all of lineitem, entirely " +
      "in-engine. ONE aggregation pass collects the nine sufficient " +
      "statistics as exact order-independent BIGINT sums over integer-" +
      "coded features (quantity, discount·100 via exact decimal " +
      "scaling); the 3×3 system then solves by Cramer's rule in ONE " +
      "arithmetic string shared VERBATIM between Spark expr() and the " +
      "DuckDB oracle — both engines walk an identical IEEE expression " +
      "tree, so the doubles are bit-equal. R² from the same statistics " +
      "(SSE via the quadratic form — no second data pass). This is the " +
      "how-you-fit-at-100TB shape: the data-sized work is one map-side-" +
      "combining aggregate; the solve is O(1) on a one-row relation.",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_quantity").cast("long").as("x1"),
        (col("l_discount").cast(DecimalType(12, 2)) * 100).cast("long").as("x2"),
        expr("floor(l_extendedprice)").as("y"))
      val st = li.agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
      val sys = st.select(
        col("n"),
        col("n").cast("double").as("a11"),
        col("sx1").cast("double").as("a12"),
        col("sx2").cast("double").as("a13"),
        (col("s11").cast("double") + lit(RidgeLambda.toDouble)).as("a22"),
        col("s12").cast("double").as("a23"),
        (col("s22").cast("double") + lit(RidgeLambda.toDouble)).as("a33"),
        col("sy").cast("double").as("b1"),
        col("s1y").cast("double").as("b2"),
        col("s2y").cast("double").as("b3"),
        col("s11").cast("double").as("r11"),
        col("s22").cast("double").as("r22"),
        col("syy").cast("double").as("syy"))
      val solved = sys.select(col("n"), col("a11"), col("a12"), col("a13"),
        col("a23"), col("r11"), col("r22"), col("syy"), col("b1"), col("b2"),
        col("b3"),
        expr(s"$RidgeDet0 / $RidgeDet").as("beta0"),
        expr(s"$RidgeDet1 / $RidgeDet").as("beta1"),
        expr(s"$RidgeDet2 / $RidgeDet").as("beta2"))
      solved.select(col("n"),
        round(col("beta0"), 6).as("beta0"),
        round(col("beta1"), 6).as("beta1"),
        round(col("beta2"), 6).as("beta2"),
        expr(s"round($RidgeR2, 6)").as("r2"))
    },
    Some(s"""
      |WITH st AS (
      |  SELECT count(*)::BIGINT AS n,
      |         SUM(x1)::BIGINT AS sx1, SUM(x2)::BIGINT AS sx2,
      |         SUM(x1 * x1)::BIGINT AS s11, SUM(x2 * x2)::BIGINT AS s22,
      |         SUM(x1 * x2)::BIGINT AS s12, SUM(y)::BIGINT AS sy,
      |         SUM(x1 * y)::BIGINT AS s1y, SUM(x2 * y)::BIGINT AS s2y,
      |         SUM(y * y)::BIGINT AS syy
      |  FROM (
      |    SELECT CAST(l_quantity AS BIGINT) AS x1,
      |           CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS x2,
      |           CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
      |    FROM lineitem
      |  )
      |), sys AS (
      |  SELECT n,
      |         n::DOUBLE AS a11, sx1::DOUBLE AS a12, sx2::DOUBLE AS a13,
      |         s11::DOUBLE + $RidgeLambda AS a22, s12::DOUBLE AS a23,
      |         s22::DOUBLE + $RidgeLambda AS a33,
      |         sy::DOUBLE AS b1, s1y::DOUBLE AS b2, s2y::DOUBLE AS b3,
      |         s11::DOUBLE AS r11, s22::DOUBLE AS r22, syy::DOUBLE AS syy
      |  FROM st
      |), solved AS (
      |  SELECT n, a11, a12, a13, a23, r11, r22, syy, b1, b2, b3,
      |         $RidgeDet0 / $RidgeDet AS beta0,
      |         $RidgeDet1 / $RidgeDet AS beta1,
      |         $RidgeDet2 / $RidgeDet AS beta2
      |  FROM sys
      |)
      |SELECT n,
      |       round(beta0, 6) AS beta0,
      |       round(beta1, 6) AS beta1,
      |       round(beta2, 6) AS beta2,
      |       round($RidgeR2, 6) AS r2
      |FROM solved
      """.stripMargin.trim))

  private val prfReport = QueryDef(
    "ml_prf_report",
    "Per-class precision / recall / F1 — the classification report " +
      "that completes the evaluation family (confusion mass = " +
      "ml_naive_bayes, threshold sweeps = ml_auc_roc / ml_pr_curve, " +
      "calibration = ml_calibration_ece; this is the per-class " +
      "summary a model card quotes). Model under test: the majority-" +
      "lang-per-source classifier on the ml_kfold_cv split (train = " +
      "doc_id % 3 != 0, majority by exact counts with deterministic " +
      "(count desc, lang) tie-break; test = doc_id % 3 == 0). TP/FP/FN " +
      "are exact BIGINT counts from one truth×prediction rollup; " +
      "P, R round at 6 and F1 recombines the ROUNDED P/R in one fixed " +
      "shape (part of the definition). Zero-denominator classes " +
      "report 0.0 (the sklearn zero_division=0 convention).",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("lang"))
      val maj = docs.filter(col("doc_id") % 3 =!= 0)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("cnt").desc, col("lang"))))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("pred"))
      val test = docs.filter(col("doc_id") % 3 === 0)
        .join(broadcast(maj), Seq("source"))
        .select(col("lang").as("truth"), col("pred"))
      val classes = test.select(col("truth").as("cls")).distinct()
      val tp = test.filter(col("truth") === col("pred"))
        .groupBy(col("truth").as("cls")).agg(count(lit(1)).as("tp"))
      val fn = test.filter(col("truth") =!= col("pred"))
        .groupBy(col("truth").as("cls")).agg(count(lit(1)).as("fn"))
      val fp = test.filter(col("truth") =!= col("pred"))
        .groupBy(col("pred").as("cls")).agg(count(lit(1)).as("fp"))
      val m = classes
        .join(tp, Seq("cls"), "left").join(fp, Seq("cls"), "left")
        .join(fn, Seq("cls"), "left")
        .select(col("cls").as("lang"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("fp"), lit(0L)).as("fp"),
          coalesce(col("fn"), lit(0L)).as("fn"))
      val withPr = m
        .withColumn("precision", when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6)))
        .withColumn("recall", when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(round(col("tp").cast("double") /
            (col("tp") + col("fn")).cast("double"), 6)))
      withPr
        .withColumn("f1", when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)))
        .orderBy(col("lang"))
    },
    Some("""
      |WITH docs AS (
      |  SELECT doc_id, source, lang FROM documents
      |), maj AS (
      |  SELECT source, lang AS pred FROM (
      |    SELECT source, lang, count(*) AS cnt,
      |           row_number() OVER (PARTITION BY source
      |                              ORDER BY count(*) DESC, lang) AS rk
      |    FROM docs WHERE doc_id % 3 != 0 GROUP BY source, lang
      |  ) WHERE rk = 1
      |), test AS (
      |  SELECT d.lang AS truth, m.pred
      |  FROM docs d JOIN maj m ON m.source = d.source
      |  WHERE d.doc_id % 3 = 0
      |), classes AS (SELECT DISTINCT truth AS cls FROM test),
      |tp AS (SELECT truth AS cls, count(*) AS tp FROM test WHERE truth = pred GROUP BY 1),
      |fn AS (SELECT truth AS cls, count(*) AS fn FROM test WHERE truth != pred GROUP BY 1),
      |fp AS (SELECT pred AS cls, count(*) AS fp FROM test WHERE truth != pred GROUP BY 1),
      |m AS (
      |  SELECT c.cls AS lang,
      |         COALESCE(tp.tp, 0)::BIGINT AS tp,
      |         COALESCE(fp.fp, 0)::BIGINT AS fp,
      |         COALESCE(fn.fn, 0)::BIGINT AS fn
      |  FROM classes c
      |  LEFT JOIN tp ON tp.cls = c.cls
      |  LEFT JOIN fp ON fp.cls = c.cls
      |  LEFT JOIN fn ON fn.cls = c.cls
      |), pr AS (
      |  SELECT lang, tp, fp, fn,
      |         CASE WHEN tp + fp = 0 THEN 0.0
      |              ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END AS precision,
      |         CASE WHEN tp + fn = 0 THEN 0.0
      |              ELSE round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END AS recall
      |  FROM m
      |)
      |SELECT lang, tp, fp, fn, precision, recall,
      |       CASE WHEN precision + recall = 0.0 THEN 0.0
      |            ELSE round(2.0 * precision * recall / (precision + recall), 6) END AS f1
      |FROM pr ORDER BY lang
      """.stripMargin.trim))

  /** Weighted-Gini split impurity as SQL text shared VERBATIM between
    * Spark expr() and DuckDB, over exact-count columns n_l/pos_l/n_r/
    * pos_r/nn — rational arithmetic only, no transcendental.
    */
  private val StumpGini: String = {
    def side(n: String, p: String) =
      s"CAST($n AS DOUBLE) * (1.0 - " +
        s"(CAST($p AS DOUBLE) / CAST($n AS DOUBLE)) * (CAST($p AS DOUBLE) / CAST($n AS DOUBLE)) - " +
        s"(CAST($n - $p AS DOUBLE) / CAST($n AS DOUBLE)) * (CAST($n - $p AS DOUBLE) / CAST($n AS DOUBLE)))"
    s"round((${side("n_l", "pos_l")} + ${side("n_r", "pos_r")}) / CAST(nn AS DOUBLE), 6)"
  }

  private val stump = QueryDef(
    "ml_decision_stump",
    "In-engine decision-stump training: the exhaustive split scan over " +
      "l_quantity ≤ t thresholds for predicting returns (l_returnflag " +
      "= 'R'), with weighted Gini impurity per split — the tree-" +
      "induction primitive beside ml_logreg_gd's gradient channel, and " +
      "the whole-curve view (every candidate split's impurity, argmin " +
      "visible) rather than one opaque winner. The data-sized work is " +
      "ONE map-side-combining rollup to per-value (n, positives); " +
      "cumulative sums then run on the value grid (≤ 50 rows — value-" +
      "domain-bounded, the stat_ks_two_sample argument, so the " +
      "unpartitioned window is safe at any row scale). Counts exact " +
      "BIGINT; the impurity is rational arithmetic (no transcendental) " +
      "in ONE SQL string evaluated verbatim by both engines.",
    (s, dir) => {
      val perX = Tables.lineitem(s, dir)
        .select(col("l_quantity").cast("long").as("x"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        .groupBy(col("x"))
        .agg(count(lit(1)).as("nx"), sum(col("y")).as("px"))
      val w = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = perX.agg(sum(col("nx")).as("nn"), sum(col("px")).as("pp"))
      perX
        .withColumn("n_l", sum(col("nx")).over(w))
        .withColumn("pos_l", sum(col("px")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("n_r", col("nn") - col("n_l"))
        .withColumn("pos_r", col("pp") - col("pos_l"))
        .filter(col("n_r") > 0)
        .withColumn("gini_split", expr(StumpGini))
        .select(col("x").as("thr"), col("n_l").as("n_left"),
          col("pos_l").as("pos_left"), col("n_r").as("n_right"),
          col("pos_r").as("pos_right"), col("gini_split"))
        .orderBy(col("thr"))
    },
    Some(s"""
      |WITH perx AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x, count(*) AS nx,
      |         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS px
      |  FROM lineitem GROUP BY 1
      |), tot AS (SELECT SUM(nx)::BIGINT AS nn, SUM(px)::BIGINT AS pp FROM perx),
      |cum AS (
      |  SELECT x,
      |         SUM(nx) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS n_l,
      |         SUM(px) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS pos_l
      |  FROM perx
      |), cells AS (
      |  SELECT x, n_l, pos_l, nn - n_l AS n_r, pp - pos_l AS pos_r, nn
      |  FROM cum, tot WHERE nn - n_l > 0
      |)
      |SELECT x AS thr, n_l AS n_left, pos_l AS pos_left,
      |       n_r AS n_right, pos_r AS pos_right,
      |       $StumpGini AS gini_split
      |FROM cells ORDER BY thr
      """.stripMargin.trim))

  /** Per-dir fitted centroid sets for the elbow sweep (k ∈ ElbowKs),
    * late-bound into the oracle exactly like SilStore.
    */
  private val ElbowKs = Seq(2, 4, 8, 16)
  private object ElbowStore {
    val cents = scala.collection.concurrent.TrieMap
      .empty[String, Map[Int, Array[Array[Float]]]]
    @volatile var lastDir: Option[String] = None
    def ensure(s: org.apache.spark.sql.SparkSession, dir: String): Map[Int, Array[Array[Float]]] = {
      lastDir = Some(dir)
      cents.getOrElseUpdate(dir, ElbowKs.map(k =>
        k -> graft.operators.Ann.kmeansCentroids(
          Tables.embeddings(s, dir), "embedding", nlist = k)).toMap)
    }
  }

  private val kmeansElbow = QueryDef(
    "vec_kmeans_elbow",
    "KMeans model selection by the elbow curve: inertia (Σ per-vector " +
      "nearest-centroid cosine distance², the round-6 then decimal-sum " +
      "discipline) for k ∈ {" + ElbowKs.mkString(", ") + "} over the " +
      "same deterministic fits the IVF/silhouette channels use, plus " +
      "the consecutive-k improvement ratio whose flattening IS the " +
      "elbow — the answer to 'what nlist should the IVF index use'. " +
      "Each k is one O(n·k) codegen'd projection over the corpus " +
      "(centroid literals — no join, no shuffle beyond the one-row " +
      "aggregate); the four legs union to a 4-row relation and the " +
      "ratio window runs there. Oracle late-binds all four fitted " +
      "centroid sets like ml_silhouette.",
    (s, dir) => {
      import graft.functions.VectorFunctions.cosineDistance
      val fits = ElbowStore.ensure(s, dir)
      val legs = ElbowKs.map { k =>
        val cents = fits(k)
        val centsLit = typedLit(cents.map(_.toSeq).toSeq)
        val dmin = array_min(transform(centsLit, c =>
          round(cosineDistance(col("embedding"), c), 6)))
        Tables.embeddings(s, dir)
          .select(round(dmin * dmin, 6).as("d2"))
          .agg(lit(k.toLong).as("k"), count(lit(1)).as("n_vecs"),
            round(sum(col("d2").cast(dec6)).cast("double"), 6).as("inertia"))
      }
      val curve = legs.reduce(_ unionAll _)
      curve
        .withColumn("improve_ratio", round(
          col("inertia") / lag(col("inertia"), 1).over(
            Window.orderBy(col("k"))), 6))
        .orderBy(col("k"))
    },
    oracle = None,
    oracleLate = Some(() => ElbowStore.lastDir.flatMap(ElbowStore.cents.get).map { fits =>
      val legs = ElbowKs.map { k =>
        val rows = fits(k).zipWithIndex
          .map { case (c, i) => s"($i, ${Duck.vecLit(c)})" }.mkString(",\n    ")
        s"""
        |  SELECT CAST($k AS BIGINT) AS k, count(*)::BIGINT AS n_vecs,
        |         round(CAST(SUM(CAST(d2 AS DECIMAL(38,6))) AS DOUBLE), 6) AS inertia
        |  FROM (
        |    SELECT round(dmin * dmin, 6) AS d2 FROM (
        |      SELECT (SELECT MIN(round(${Duck.cosine("e.embedding::DOUBLE[]", "c")}, 6))
        |              FROM (VALUES
        |    $rows) AS t(i, c)) AS dmin
        |      FROM embeddings e
        |    )
        |  )""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""
      |WITH curve AS (
      |$legs
      |)
      |SELECT k, n_vecs, inertia,
      |       round(inertia / lag(inertia, 1) OVER (ORDER BY k), 6) AS improve_ratio
      |FROM curve ORDER BY k
      """.stripMargin.trim
    }))

  private val frequentTriples = QueryDef(
    "ml_frequent_triples",
    "A-priori level-3 frequent itemsets (Agrawal & Srikant 1994) at " +
      "the BRAND level: the 3-item extension of ml_item_cooccurrence's " +
      "pair mining — the association-rule primitive one level up, " +
      "where rule quality starts to beat pairwise lift. Items are " +
      "p_brand, not raw part keys, and that is a scale finding, not a " +
      "simplification: raw-key triple supports starve as the item " +
      "space cubes faster than the order count (94 support-2 triples " +
      "at sf0.001, TWELVE at sf0.01, ZERO from sf0.1 on — measured " +
      "before the brand rollup), so key-level level-3 mining returns " +
      "nothing exactly where it gets expensive; category-level " +
      "itemsets stay dense at every SF, which is why retail basket " +
      "analysis mines categories. Triples generate WITHIN each order " +
      "basket by the ordered a<b<c self-join (basket ≤ 7 distinct " +
      "brands → ≤ C(7,3)=35 candidates per order, never |brands|³); " +
      "exact BIGINT supports, min-support 2, top 25 on the (support " +
      "desc, a, b, c) presented key plus the total frequent count; " +
      "support share is one IEEE division of exact counts. One " +
      "orderkey shuffle feeds all three join legs; the brand lookup " +
      "is a broadcast dim join.",
    (s, dir) => {
      val basket = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
        .distinct()
      val nOrders = basket.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val b1 = basket.select(col("ok"), col("item").as("a"))
      val b2 = basket.select(col("ok"), col("item").as("b"))
      val b3 = basket.select(col("ok"), col("item").as("c"))
      val tri = b1.join(b2, Seq("ok")).filter(col("a") < col("b"))
        .join(b3, Seq("ok")).filter(col("b") < col("c"))
        .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 2)
      val total = tri.agg(count(lit(1)).as("n_frequent"))
      tri.orderBy(col("sup").desc, col("a"), col("b"), col("c")).limit(25)
        .crossJoin(broadcast(total))
        .crossJoin(broadcast(nOrders))
        .select(col("a").as("item_a"), col("b").as("item_b"),
          col("c").as("item_c"), col("sup").as("support"),
          col("n_frequent"),
          round(col("sup").cast("double") / col("n_orders").cast("double"), 6)
            .as("support_share"))
        .orderBy(col("support").desc, col("item_a"), col("item_b"), col("item_c"))
    },
    Some("""
      |WITH basket AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS item
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), n AS (SELECT count(DISTINCT ok) AS n_orders FROM basket),
      |tri AS MATERIALIZED (
      |  SELECT b1.item AS a, b2.item AS b, b3.item AS c, count(*) AS sup
      |  FROM basket b1
      |  JOIN basket b2 ON b1.ok = b2.ok AND b1.item < b2.item
      |  JOIN basket b3 ON b2.ok = b3.ok AND b2.item < b3.item
      |  GROUP BY 1, 2, 3 HAVING count(*) >= 2
      |), top AS (
      |  SELECT a, b, c, sup FROM tri ORDER BY sup DESC, a, b, c LIMIT 25
      |)
      |SELECT a AS item_a, b AS item_b, c AS item_c, sup AS support,
      |       (SELECT count(*) FROM tri) AS n_frequent,
      |       round(sup::DOUBLE / n_orders::DOUBLE, 6) AS support_share
      |FROM top, n
      |ORDER BY support DESC, item_a, item_b, item_c
      """.stripMargin.trim))

  private val bestF1 = QueryDef(
    "ml_best_f1_threshold",
    "Operating-point selection: the threshold maximizing F1 over the " +
      "same score/label pair as ml_auc_roc / ml_pr_curve — the " +
      "decision the curves inform but don't make (a deployed filter " +
      "needs ONE cutoff). F1 = 2TP/(2TP+FP+FN) is a single exact " +
      "rational of BIGINT counts, so the argmax key is EXACT integer " +
      "millionths ((2TP·10⁶) div (2TP+FP+FN)) — selection and " +
      "presentation are the same exact number, no float anywhere in " +
      "the ranking (the decade-gate tie lesson applied to a whole " +
      "query). One corpus aggregate to per-threshold counts; cumsums " +
      "and the top-1 run on the threshold-bounded relation.",
    (s, dir) => {
      val byThr = Tables.lineitem(s, dir)
        .select((col("l_discount").cast(Queries.Money.rate) * 100)
          .cast("long").as("thr_cents"), col("l_returnflag"))
        .groupBy(col("thr_cents"))
        .agg(count(when(col("l_returnflag") === "R", lit(1))).as("pos_d"),
          count(when(col("l_returnflag") =!= "R", lit(1))).as("neg_d"))
      val tot = byThr.agg(sum(col("pos_d")).cast("long").as("p_all"))
      val wOrd = Window.orderBy(col("thr_cents").desc)
      byThr.crossJoin(broadcast(tot))
        .withColumn("tp", sum(col("pos_d")).over(wOrd))
        .withColumn("fp", sum(col("neg_d")).over(wOrd))
        .withColumn("fn", col("p_all") - col("tp"))
        .withColumn("f1_micro",
          expr("CAST((2 * tp * 1000000) div (2 * tp + fp + fn) AS BIGINT)"))
        .orderBy(col("f1_micro").desc, col("thr_cents"))
        .limit(1)
        .select(col("thr_cents"), col("tp"), col("fp"), col("fn"),
          (col("f1_micro").cast("double") / lit(1000000.0)).as("best_f1"),
          round(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"), 6)
            .as("precision"),
          round(col("tp").cast("double") / col("p_all").cast("double"), 6)
            .as("recall"))
    },
    Some("""
      |WITH bythr AS (
      |  SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS thr_cents,
      |         count(*) FILTER (WHERE l_returnflag = 'R') AS pos_d,
      |         count(*) FILTER (WHERE l_returnflag <> 'R') AS neg_d
      |  FROM lineitem GROUP BY 1
      |), tot AS (SELECT SUM(pos_d)::BIGINT AS p_all FROM bythr),
      |cum AS (
      |  SELECT thr_cents,
      |         CAST(SUM(pos_d) OVER w AS BIGINT) AS tp,
      |         CAST(SUM(neg_d) OVER w AS BIGINT) AS fp,
      |         p_all
      |  FROM bythr CROSS JOIN tot
      |  WINDOW w AS (ORDER BY thr_cents DESC)
      |), f AS (
      |  SELECT thr_cents, tp, fp, p_all - tp AS fn, p_all,
      |         ((2 * tp * 1000000) // (2 * tp + fp + (p_all - tp)))::BIGINT AS f1_micro
      |  FROM cum
      |)
      |SELECT thr_cents, tp, fp, fn,
      |       f1_micro::DOUBLE / 1000000.0 AS best_f1,
      |       round(tp::DOUBLE / (tp + fp)::DOUBLE, 6) AS precision,
      |       round(tp::DOUBLE / p_all::DOUBLE, 6) AS recall
      |FROM f
      |ORDER BY f1_micro DESC, thr_cents LIMIT 1
      """.stripMargin.trim))

  private val mcc = QueryDef(
    "ml_mcc",
    "Matthews correlation coefficient of a binary classifier — the " +
      "single-number summary that, unlike accuracy or F1, stays " +
      "honest under class imbalance (it is the Pearson correlation of " +
      "the binary truth/prediction vectors), completing the " +
      "evaluation family beside ml_prf_report's per-class view. " +
      "Model under test: the per-source majority ENGLISH detector on " +
      "the shared %3 split (pred = 2·n_en > n_docs on the train " +
      "split — exact integer comparison, no ratio; test = doc_id % 3 " +
      "= 0). TP/FP/TN/FN are exact BIGINTs from ONE truth×prediction " +
      "rollup; the numerator TP·TN − FP·FN is an exact BIGINT " +
      "(< 2⁵³ decades past sf100), the denominator multiplies the " +
      "four marginal sums in double with one fixed shape, and " +
      "MCC ∈ [−1,1] rounds at 6 (far below the rounding trap). A " +
      "degenerate margin reads NULL via nullif. One aggregation " +
      "shuffle over the test scan; the majority model broadcasts.",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          (col("lang") === "en").as("is_en"))
      val maj = docs.filter(col("doc_id") % 3 =!= 0)
        .groupBy(col("source"))
        .agg((lit(2L) * sum(when(col("is_en"), 1L).otherwise(0L)) >
          count(lit(1))).as("pred_en"))
      val cm = docs.filter(col("doc_id") % 3 === 0)
        .join(broadcast(maj), Seq("source"))
        .agg(
          sum(when(col("is_en") && col("pred_en"), 1L).otherwise(0L)).as("tp"),
          sum(when(!col("is_en") && col("pred_en"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("is_en") && !col("pred_en"), 1L).otherwise(0L)).as("tn"),
          sum(when(col("is_en") && !col("pred_en"), 1L).otherwise(0L)).as("fn"))
      cm.select(col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"), 6)
          .as("accuracy"),
        round((col("tp") * col("tn") - col("fp") * col("fn")).cast("double") /
          nullif(sqrt((col("tp") + col("fp")).cast("double") *
            (col("tp") + col("fn")).cast("double") *
            (col("tn") + col("fp")).cast("double") *
            (col("tn") + col("fn")).cast("double")), lit(0.0)), 6).as("mcc"))
    },
    Some("""
      |WITH docs AS (
      |  SELECT doc_id, source, lang = 'en' AS is_en FROM documents
      |), maj AS (
      |  SELECT source,
      |         2 * SUM(CASE WHEN is_en THEN 1 ELSE 0 END) > count(*) AS pred_en
      |  FROM docs WHERE doc_id % 3 != 0 GROUP BY 1
      |), cm AS (
      |  SELECT SUM(CASE WHEN is_en AND pred_en THEN 1 ELSE 0 END)::BIGINT AS tp,
      |         SUM(CASE WHEN NOT is_en AND pred_en THEN 1 ELSE 0 END)::BIGINT AS fp,
      |         SUM(CASE WHEN NOT is_en AND NOT pred_en THEN 1 ELSE 0 END)::BIGINT AS tn,
      |         SUM(CASE WHEN is_en AND NOT pred_en THEN 1 ELSE 0 END)::BIGINT AS fn
      |  FROM docs d JOIN maj m USING (source)
      |  WHERE d.doc_id % 3 = 0
      |)
      |SELECT tp, fp, tn, fn,
      |       round((tp + tn)::DOUBLE / (tp + fp + tn + fn)::DOUBLE, 6) AS accuracy,
      |       round((tp * tn - fp * fn)::DOUBLE /
      |             nullif(sqrt((tp + fp)::DOUBLE * (tp + fn)::DOUBLE *
      |                         (tn + fp)::DOUBLE * (tn + fn)::DOUBLE), 0.0), 6) AS mcc
      |FROM cm
      """.stripMargin.trim))

  /** AdaBoost rounds for [[adaboost]]. */
  private val AdaRounds = 3

  private val adaboost = QueryDef(
    "ml_adaboost_stumps",
    s"In-engine AdaBoost (Freund & Schapire 1997) — $AdaRounds rounds " +
      "of boosting over the ml_decision_stump weak learner (predict " +
      "returnflag='R' from quantity thresholds): the ONLY data-sized " +
      "work is ONE map-side-combining rollup to the (quantity, label) " +
      "cell table, which is value-domain-bounded (≤ 2·50 cells — the " +
      "stat_ks argument), because a row's boosting weight is a pure " +
      "function of (x, y): every round's weighted stump search, ε, " +
      "and weight update run on the bounded cells. Exactness channel: " +
      "cell masses are EXACT decimals n·w (DECIMAL(18,0)×DECIMAL(18,6) " +
      "— never capped), ε = round(err/tot, 6) with a deterministic " +
      "[1e-6, 1−1e-6] clamp, re-weight factors √(ε/(1−ε)) and its " +
      "inverse round at 6 (correctly-rounded IEEE sqrt), weights " +
      "re-round to the 6dp grid each round, and α = round(½ln(·), 6) " +
      "through the established ln channel. Stump argmin orders by " +
      "(round-6 ε, θ, polarity +1 first). The output is the per-round " +
      "(θ, polarity, ε, α) trajectory plus the ensemble's training " +
      "accuracy as the exact integer (correct·10⁶) div total — the " +
      "oracle replays ALL rounds as MATERIALIZED CTEs over the same " +
      "cell relation.",
    (s, dir) => {
      import s.implicits._
      val cells = Tables.lineitem(s, dir).select(
          col("l_quantity").cast("long").as("x"),
          when(col("l_returnflag") === "R", 1).otherwise(-1).as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(c => (c._1, c._2))
      def bd(d: Double): java.math.BigDecimal = java.math.BigDecimal.valueOf(d)
      def rd6d(d: Double): Double =
        bd(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // weights on the 6dp grid per cell; masses exact BigDecimal
      var w = cells.map(c => (c._1, c._2) -> new java.math.BigDecimal("1.000000")).toMap
      val thetas = cells.map(_._1).distinct.sorted
      val hist = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int, Double, Double)]
      val stumps = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
      for (r <- 1 to AdaRounds) {
        def mass(p: ((Long, Int)) => Boolean): java.math.BigDecimal =
          cells.filter(c => p((c._1, c._2)))
            .map(c => java.math.BigDecimal.valueOf(c._3).multiply(w((c._1, c._2))))
            .foldLeft(java.math.BigDecimal.ZERO)(_ add _)
        val tot = mass(_ => true)
        val tpos = mass(_._2 == 1); val tneg = mass(_._2 == -1)
        // err(θ, +1) = mneg(x≤θ) + tpos − mpos(x≤θ); err(θ, −1) = tot − err(θ, +1)
        val cand = thetas.flatMap { th =>
          val cpos = mass(c => c._1 <= th && c._2 == 1)
          val cneg = mass(c => c._1 <= th && c._2 == -1)
          val errP = cneg.add(tpos).subtract(cpos)
          val errN = cpos.add(tneg).subtract(cneg)
          Seq((th, 1, rd6d(errP.doubleValue() / tot.doubleValue())),
            (th, -1, rd6d(errN.doubleValue() / tot.doubleValue())))
        }
        val (th, pol, eps) = cand.minBy { case (t, p, e) => (e, t, -p) }
        val ec = math.max(0.000001, math.min(0.999999, eps))
        val fc = rd6d(math.sqrt(ec / (1.0 - ec)))
        val fw = rd6d(math.sqrt((1.0 - ec) / ec))
        val alpha = rd6d(0.5 * math.log((1.0 - ec) / ec))
        hist += ((r.toLong, th, pol, eps, alpha))
        stumps += ((th, pol, alpha))
        w = cells.map { c =>
          val h = if (c._1 <= th) pol else -pol
          val f = if (h == c._2) fc else fw
          (c._1, c._2) -> bd(rd6d(w((c._1, c._2)).doubleValue() * f))
        }.toMap
      }
      // ensemble training accuracy (exact integer millionths)
      val correct = cells.filter { c =>
        val score = stumps.foldLeft(0.0) { case (acc, (th, pol, a)) =>
          acc + a * (if (c._1 <= th) pol else -pol)
        }
        (if (score >= 0) 1 else -1) == c._2
      }.map(_._3).sum
      val total = cells.map(_._3).sum
      val accM = correct * 1000000L / total
      hist.toSeq.map { case (r, th, pol, eps, a) => (r, th, pol, eps, a, accM) }
        .toDF("round", "theta", "polarity", "epsilon", "alpha", "acc_millionths")
        .orderBy(col("round"))
    },
    Some {
      val rounds = (1 to AdaRounds).map { r =>
        val wDef =
          if (r == 1) s"w$r AS MATERIALIZED (SELECT x, y, n, 1.000000::DECIMAL(18,6) AS w FROM cells)"
          else {
            val p = r - 1
            s"""w$r AS MATERIALIZED (
               |  SELECT x, y, n,
               |         CAST(round(w::DOUBLE * CASE WHEN
               |           (CASE WHEN x <= (SELECT theta FROM s$p) THEN (SELECT pol FROM s$p)
               |                 ELSE -(SELECT pol FROM s$p) END) = y
               |           THEN (SELECT fc FROM f$p) ELSE (SELECT fw FROM f$p) END, 6)
               |           AS DECIMAL(18,6)) AS w
               |  FROM w$p
               |)""".stripMargin
          }
        s"""$wDef,
           |g$r AS MATERIALIZED (
           |  SELECT x,
           |         SUM(CASE WHEN y = 1 THEN n::DECIMAL(18,0) * w ELSE 0::DECIMAL(36,6) END) AS mpos,
           |         SUM(CASE WHEN y = -1 THEN n::DECIMAL(18,0) * w ELSE 0::DECIMAL(36,6) END) AS mneg
           |  FROM w$r GROUP BY x
           |),
           |c$r AS MATERIALIZED (
           |  SELECT x AS theta,
           |         SUM(mpos) OVER (ORDER BY x) AS cpos,
           |         SUM(mneg) OVER (ORDER BY x) AS cneg,
           |         (SELECT SUM(mpos) FROM g$r) AS tpos,
           |         (SELECT SUM(mneg) FROM g$r) AS tneg
           |  FROM g$r
           |),
           |e$r AS MATERIALIZED (
           |  SELECT theta, 1 AS pol,
           |         round((cneg + tpos - cpos)::DOUBLE / (tpos + tneg)::DOUBLE, 6) AS eps
           |  FROM c$r
           |  UNION ALL
           |  SELECT theta, -1 AS pol,
           |         round((cpos + tneg - cneg)::DOUBLE / (tpos + tneg)::DOUBLE, 6) AS eps
           |  FROM c$r
           |),
           |s$r AS MATERIALIZED (
           |  SELECT theta, pol, eps FROM e$r ORDER BY eps, theta, pol DESC LIMIT 1
           |),
           |f$r AS MATERIALIZED (
           |  SELECT theta, pol, eps,
           |         round(sqrt(greatest(0.000001, least(0.999999, eps)) /
           |                    (1.0 - greatest(0.000001, least(0.999999, eps)))), 6) AS fc,
           |         round(sqrt((1.0 - greatest(0.000001, least(0.999999, eps))) /
           |                    greatest(0.000001, least(0.999999, eps))), 6) AS fw,
           |         round(0.5 * ln((1.0 - greatest(0.000001, least(0.999999, eps))) /
           |                        greatest(0.000001, least(0.999999, eps))), 6) AS alpha
           |  FROM s$r
           |)""".stripMargin
      }.mkString(",\n")
      val scoreExpr = (1 to AdaRounds).map { r =>
        s"(SELECT alpha FROM f$r) * (CASE WHEN x <= (SELECT theta FROM s$r) " +
          s"THEN (SELECT pol FROM s$r) ELSE -(SELECT pol FROM s$r) END)"
      }.mkString(" + ")
      val sel = (1 to AdaRounds).map { r =>
        s"SELECT CAST($r AS BIGINT) AS round, theta, CAST(pol AS INT) AS polarity, " +
          s"eps AS epsilon, alpha, acc_millionths FROM f$r, acc"
      }.mkString("\nUNION ALL\n")
      s"""
      |WITH cells AS MATERIALIZED (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y,
      |         count(*)::BIGINT AS n
      |  FROM lineitem GROUP BY 1, 2
      |),
      |$rounds,
      |pred AS MATERIALIZED (
      |  SELECT x, y, n, $scoreExpr AS score FROM cells
      |),
      |acc AS MATERIALIZED (
      |  SELECT CAST((SUM(CASE WHEN (CASE WHEN score >= 0 THEN 1 ELSE -1 END) = y
      |                        THEN n ELSE 0 END) * 1000000) // SUM(n) AS BIGINT)
      |           AS acc_millionths
      |  FROM pred
      |)
      |SELECT round, theta, polarity, epsilon, alpha, acc_millionths FROM (
      |$sel
      |) ORDER BY round
      """.stripMargin.trim
    })

  private val mcnemar = QueryDef(
    "ml_mcnemar",
    "McNemar's test — the PAIRED model comparison the eval family " +
      "lacked: ml_mcc/ml_prf_report score ONE classifier, but 'is " +
      "model A actually better than model B' on the SAME test set is " +
      "a marginal-homogeneity question that only the discordant pairs " +
      "answer (documents both get right or both get wrong carry zero " +
      "evidence). A = the per-source majority-English detector, B = " +
      "the GLOBAL majority baseline, both trained on the shared %3 " +
      "train split, compared per test doc: n01 = A right & B wrong, " +
      "n10 = A wrong & B right, χ² = (n01−n10)²/(n01+n10) presented " +
      "as the exact truncated integer ((n01−n10)²·10⁶) div (n01+n10) " +
      "— zero doubles anywhere; per-model accuracies ride along as " +
      "exact millionths. One truth×A×B rollup over the test scan; " +
      "both models broadcast.",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          (col("lang") === "en").as("is_en"))
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val maj = train.groupBy(col("source"))
        .agg((lit(2L) * sum(when(col("is_en"), 1L).otherwise(0L)) >
          count(lit(1))).as("pred_a"))
      val glob = train.agg((lit(2L) * sum(when(col("is_en"), 1L).otherwise(0L)) >
        count(lit(1))).as("pred_b"))
      val cm = docs.filter(col("doc_id") % 3 === 0)
        .join(broadcast(maj), Seq("source"))
        .crossJoin(broadcast(glob))
        .agg(count(lit(1)).as("n_test"),
          sum(when((col("pred_a") === col("is_en")) &&
            (col("pred_b") =!= col("is_en")), 1L).otherwise(0L)).as("n01"),
          sum(when((col("pred_a") =!= col("is_en")) &&
            (col("pred_b") === col("is_en")), 1L).otherwise(0L)).as("n10"),
          sum(when(col("pred_a") === col("is_en"), 1L).otherwise(0L)).as("ok_a"),
          sum(when(col("pred_b") === col("is_en"), 1L).otherwise(0L)).as("ok_b"))
      cm.select(col("n_test"), col("n01"), col("n10"),
        expr("ok_a * 1000000 div n_test").as("acc_a_millionths"),
        expr("ok_b * 1000000 div n_test").as("acc_b_millionths"),
        expr("CASE WHEN n01 + n10 > 0 THEN " +
          "(n01 - n10) * (n01 - n10) * 1000000 div (n01 + n10) END")
          .as("chi2_millionths"))
    },
    Some("""
      |WITH docs AS (
      |  SELECT doc_id, source, lang = 'en' AS is_en FROM documents
      |), maj AS (
      |  SELECT source,
      |         2 * SUM(CASE WHEN is_en THEN 1 ELSE 0 END) > count(*) AS pred_a
      |  FROM docs WHERE doc_id % 3 != 0 GROUP BY 1
      |), gmaj AS (
      |  SELECT 2 * SUM(CASE WHEN is_en THEN 1 ELSE 0 END) > count(*) AS pred_b
      |  FROM docs WHERE doc_id % 3 != 0
      |), cm AS (
      |  SELECT count(*)::BIGINT AS n_test,
      |         SUM(CASE WHEN pred_a = is_en AND pred_b != is_en THEN 1 ELSE 0 END)::BIGINT AS n01,
      |         SUM(CASE WHEN pred_a != is_en AND pred_b = is_en THEN 1 ELSE 0 END)::BIGINT AS n10,
      |         SUM(CASE WHEN pred_a = is_en THEN 1 ELSE 0 END)::BIGINT AS ok_a,
      |         SUM(CASE WHEN pred_b = is_en THEN 1 ELSE 0 END)::BIGINT AS ok_b
      |  FROM docs d JOIN maj m USING (source) CROSS JOIN gmaj
      |  WHERE d.doc_id % 3 = 0
      |)
      |SELECT n_test, n01, n10,
      |       (ok_a * 1000000) // n_test AS acc_a_millionths,
      |       (ok_b * 1000000) // n_test AS acc_b_millionths,
      |       CASE WHEN n01 + n10 > 0 THEN
      |         ((n01 - n10) * (n01 - n10) * 1000000) // (n01 + n10) END AS chi2_millionths
      |FROM cm
      """.stripMargin.trim))

  private val cohensKappa = QueryDef(
    "ml_cohens_kappa",
    "Cohen's κ — chance-corrected AGREEMENT between two classifiers " +
      "(the inter-annotator statistic; ml_mcnemar asks which model is " +
      "RIGHT more often, κ asks whether they are even measuring the " +
      "same thing — high-agreement models make ensembling pointless, " +
      "low-agreement ones make it profitable): the per-source majority " +
      "detector vs the global-majority baseline on the shared %3 test " +
      "split. κ = (p_o − p_e)/(1 − p_e) kept EXACT end to end: with " +
      "d = agreements, row/col marginals r_i/c_i, " +
      "κ = (n·d − Σr_ic_i)/(n² − Σr_ic_i), presented as the exact " +
      "truncated integer κ·10⁶ — zero doubles. One rollup of the " +
      "2×2 pred_a×pred_b table over the test scan.",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          (col("lang") === "en").as("is_en"))
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      val maj = train.groupBy(col("source"))
        .agg((lit(2L) * sum(when(col("is_en"), 1L).otherwise(0L)) >
          count(lit(1))).as("pred_a"))
      val glob = train.agg((lit(2L) * sum(when(col("is_en"), 1L).otherwise(0L)) >
        count(lit(1))).as("pred_b"))
      val st = docs.filter(col("doc_id") % 3 === 0)
        .join(broadcast(maj), Seq("source"))
        .crossJoin(broadcast(glob))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred_a") === col("pred_b"), 1L).otherwise(0L)).as("d"),
          sum(when(col("pred_a"), 1L).otherwise(0L)).as("ra"),
          sum(when(col("pred_b"), 1L).otherwise(0L)).as("rb"))
      st.select(col("n"), col("d").as("n_agree"),
        (col("ra") * col("rb") + (col("n") - col("ra")) * (col("n") - col("rb")))
          .as("s_chance"),
        expr("CASE WHEN n * n != ra * rb + (n - ra) * (n - rb) THEN " +
          "(n * d - (ra * rb + (n - ra) * (n - rb))) * 1000000 div " +
          "(n * n - (ra * rb + (n - ra) * (n - rb))) END")
          .as("kappa_millionths"))
    },
    Some("""
      |WITH docs AS (
      |  SELECT doc_id, source, lang = 'en' AS is_en FROM documents
      |), maj AS (
      |  SELECT source,
      |         2 * SUM(CASE WHEN is_en THEN 1 ELSE 0 END) > count(*) AS pred_a
      |  FROM docs WHERE doc_id % 3 != 0 GROUP BY 1
      |), gmaj AS (
      |  SELECT 2 * SUM(CASE WHEN is_en THEN 1 ELSE 0 END) > count(*) AS pred_b
      |  FROM docs WHERE doc_id % 3 != 0
      |), st AS (
      |  SELECT count(*)::BIGINT AS n,
      |         SUM(CASE WHEN pred_a = pred_b THEN 1 ELSE 0 END)::BIGINT AS d,
      |         SUM(CASE WHEN pred_a THEN 1 ELSE 0 END)::BIGINT AS ra,
      |         SUM(CASE WHEN pred_b THEN 1 ELSE 0 END)::BIGINT AS rb
      |  FROM docs dd JOIN maj m USING (source) CROSS JOIN gmaj
      |  WHERE dd.doc_id % 3 = 0
      |)
      |SELECT n, d AS n_agree,
      |       (ra * rb + (n - ra) * (n - rb))::BIGINT AS s_chance,
      |       CASE WHEN n * n != ra * rb + (n - ra) * (n - rb) THEN
      |         ((n * d - (ra * rb + (n - ra) * (n - rb))) * 1000000) //
      |         (n * n - (ra * rb + (n - ra) * (n - rb))) END AS kappa_millionths
      |FROM st
      """.stripMargin.trim))

  private val infoGain = QueryDef(
    "ml_feature_infogain",
    "Information-gain feature ranking — the feature-selection pass " +
      "run before training anything (ml_decision_stump exhausts ONE " +
      "feature's thresholds; this ranks CANDIDATE features): " +
      "IG(f) = H(y) − Σ_v p(v)·H(y|v) for predicting returnflag='R' " +
      "from four integer-coded candidates (quantity, discount·100, " +
      "ship month, linenumber), ALL evaluated in ONE corpus scan via " +
      "a tagged stack to (feature, value, y) counts — each feature's " +
      "cell table is value-domain-bounded (≤50 values × 2 labels), so " +
      "everything after the rollup is O(Σ|domains|). Entropy terms " +
      "through the established ln channel: each p·ln(p) rounds at 6 " +
      "into DECIMAL(38,6) order-independent sums; IG recombines the " +
      "two rounded entropies. Output ranked by IG descending — the " +
      "split-variable order a tree inducer would take.",
    (s, dir) => {
      val cells = Tables.lineitem(s, dir)
        .select((col("l_returnflag") === "R").cast("int").as("y"),
          col("l_quantity").cast("long").as("quantity"),
          (col("l_discount").cast(Queries.Money.rate) * 100).cast("long")
            .as("discount_pct"),
          month(col("l_shipdate")).cast("long").as("ship_month"),
          col("l_linenumber").cast("long").as("linenumber"))
        .select(col("y"), expr("stack(4, 'quantity', quantity, " +
          "'discount_pct', discount_pct, 'ship_month', ship_month, " +
          "'linenumber', linenumber) as (feat, v)"))
        .groupBy(col("feat"), col("v"), col("y"))
        .agg(count(lit(1)).as("c"))
      val byFeat = cells.groupBy(col("feat")).agg(sum(col("c")).as("n"))
      val hy = cells.groupBy(col("feat"), col("y"))
        .agg(sum(col("c")).as("cy"))
        .join(byFeat, Seq("feat"))
        .withColumn("term", expr(
          "round((CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)) * " +
            "ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)), 6)"))
        .groupBy(col("feat"))
        .agg(round(-sum(col("term").cast(dec6)).cast("double"), 6).as("h_y"))
      val byVal = cells.groupBy(col("feat"), col("v"))
        .agg(sum(col("c")).as("cv"))
      val hcond = cells.join(byVal, Seq("feat", "v"))
        .join(byFeat, Seq("feat"))
        .withColumn("term", expr(
          "round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * " +
            "ln(CAST(c AS DOUBLE) / CAST(cv AS DOUBLE)), 6)"))
        .groupBy(col("feat"))
        .agg(count(lit(1)).as("n_cells"),
          round(-sum(col("term").cast(dec6)).cast("double"), 6).as("h_y_given"))
      hy.join(hcond, Seq("feat"))
        .select(col("feat"), col("n_cells"), col("h_y"), col("h_y_given"),
          round(col("h_y") - col("h_y_given"), 6).as("info_gain"))
        .orderBy(col("info_gain").desc, col("feat"))
    },
    Some("""
      |WITH rows_t AS (
      |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
      |         CAST(l_quantity AS BIGINT) AS quantity,
      |         CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS discount_pct,
      |         CAST(date_part('month', l_shipdate) AS BIGINT) AS ship_month,
      |         CAST(l_linenumber AS BIGINT) AS linenumber
      |  FROM lineitem
      |), stacked AS (
      |  SELECT y, 'quantity' AS feat, quantity AS v FROM rows_t
      |  UNION ALL SELECT y, 'discount_pct', discount_pct FROM rows_t
      |  UNION ALL SELECT y, 'ship_month', ship_month FROM rows_t
      |  UNION ALL SELECT y, 'linenumber', linenumber FROM rows_t
      |), cells AS (
      |  SELECT feat, v, y, count(*)::BIGINT AS c FROM stacked GROUP BY 1, 2, 3
      |), byfeat AS (
      |  SELECT feat, SUM(c)::BIGINT AS n FROM cells GROUP BY 1
      |), hy AS (
      |  SELECT feat,
      |         round(-CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 6) AS h_y
      |  FROM (
      |    SELECT cy.feat,
      |           round((CAST(cy.cy AS DOUBLE) / CAST(f.n AS DOUBLE)) *
      |                 ln(CAST(cy.cy AS DOUBLE) / CAST(f.n AS DOUBLE)), 6) AS term
      |    FROM (SELECT feat, y, SUM(c)::BIGINT AS cy FROM cells GROUP BY 1, 2) cy
      |    JOIN byfeat f USING (feat)
      |  ) GROUP BY 1
      |), byval AS (
      |  SELECT feat, v, SUM(c)::BIGINT AS cv FROM cells GROUP BY 1, 2
      |), hcond AS (
      |  SELECT feat, count(*)::BIGINT AS n_cells,
      |         round(-CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 6) AS h_y_given
      |  FROM (
      |    SELECT c.feat,
      |           round((CAST(c.c AS DOUBLE) / CAST(f.n AS DOUBLE)) *
      |                 ln(CAST(c.c AS DOUBLE) / CAST(bv.cv AS DOUBLE)), 6) AS term
      |    FROM cells c JOIN byval bv USING (feat, v) JOIN byfeat f USING (feat)
      |  ) GROUP BY 1
      |)
      |SELECT feat, n_cells, h_y, h_y_given,
      |       round(h_y - h_y_given, 6) AS info_gain
      |FROM hy JOIN hcond USING (feat)
      |ORDER BY info_gain DESC, feat
      """.stripMargin.trim))

  private val learningCurve = QueryDef(
    "ml_learning_curve",
    "Learning curve — accuracy vs training-set size, the scaling-law " +
      "readout that answers 'how much data does this model need' " +
      "before anyone pays for more: the per-source majority language " +
      "detector (ml_mcnemar's model A) is trained on md5-selected " +
      "{1, 3, 10, 30, 100}% fractions of the train split (h = " +
      "md5₄₈(doc_id) mod 100 < pct — nested fractions, each a " +
      "superset of the previous, exactly how a scaling study holds " +
      "the data distribution fixed) and every fraction is evaluated " +
      "on the SAME fixed %3 test split; sources unseen at a small " +
      "fraction fall back to that fraction's global majority (the " +
      "backoff a production model ships with). ONE pass builds all " +
      "five models (train × fraction-grid cross with map-side " +
      "combine); accuracy is exact truncated integer millionths — " +
      "zero doubles anywhere. At 100 TB the fraction hash IS the " +
      "sampling operator (no shuffled sample materialization) and " +
      "each model is |sources| rows.",
    (s, dir) => {
      import graft.operators.TextAnalysis
      import s.implicits._
      val pcts = Seq(1, 3, 10, 30, 100).toDF("pct")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), (col("lang") === "en").as("e"))
      val train = docs.filter(col("doc_id") % 3 =!= 0)
        .withColumn("h", TextAnalysis.md5Long48(col("doc_id").cast("string")) % 100)
      val sel = train.crossJoin(broadcast(pcts)).filter(col("h") < col("pct"))
      val srcModel = sel.groupBy(col("pct"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("e").cast("long")).as("ne"))
        .select(col("pct"), col("source"), (lit(2) * col("ne") > col("n")).as("pred_s"))
      val globModel = sel.groupBy(col("pct"))
        .agg(count(lit(1)).as("n_train"), sum(col("e").cast("long")).as("ne"))
        .select(col("pct"), col("n_train"), (lit(2) * col("ne") > col("n_train")).as("pred_g"))
      val test = docs.filter(col("doc_id") % 3 === 0)
      test.crossJoin(broadcast(globModel))
        .join(broadcast(srcModel), Seq("pct", "source"), "left")
        .withColumn("pred", coalesce(col("pred_s"), col("pred_g")))
        .groupBy(col("pct").cast("long").as("pct"), col("n_train"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("pred") === col("e"), 1L).otherwise(0L)).as("n_correct"))
        .select(col("pct"), col("n_train"), col("n_test"),
          expr("(n_correct * 1000000) div n_test").as("accuracy_ppm"))
        .orderBy(col("pct"))
    },
    Some("""
      |WITH p AS (
      |  SELECT unnest([1, 3, 10, 30, 100]) AS pct
      |), d AS (
      |  SELECT doc_id, source, (lang = 'en') AS e FROM documents
      |), tr AS (
      |  SELECT *, ('0x' || substring(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 100 AS h
      |  FROM d WHERE doc_id % 3 <> 0
      |), sel AS (
      |  SELECT p.pct, tr.source, tr.e FROM tr, p WHERE tr.h < p.pct
      |), sm AS (
      |  SELECT pct, source,
      |         (2 * SUM(CASE WHEN e THEN 1 ELSE 0 END) > count(*)) AS pred_s
      |  FROM sel GROUP BY 1, 2
      |), gm AS (
      |  SELECT pct, count(*) AS n_train,
      |         (2 * SUM(CASE WHEN e THEN 1 ELSE 0 END) > count(*)) AS pred_g
      |  FROM sel GROUP BY 1
      |), te AS (
      |  SELECT doc_id, source, e FROM d WHERE doc_id % 3 = 0
      |), sc AS (
      |  SELECT gm.pct, gm.n_train, te.e,
      |         COALESCE(sm.pred_s, gm.pred_g) AS pred
      |  FROM te CROSS JOIN gm
      |  LEFT JOIN sm ON sm.pct = gm.pct AND sm.source = te.source
      |)
      |SELECT pct::BIGINT AS pct, n_train::BIGINT AS n_train,
      |       count(*)::BIGINT AS n_test,
      |       ((SUM(CASE WHEN pred = e THEN 1 ELSE 0 END) * 1000000) // count(*))::BIGINT
      |         AS accuracy_ppm
      |FROM sc GROUP BY 1, 2 ORDER BY pct
      """.stripMargin.trim))

  private val knnLabelAccuracy = QueryDef(
    "ml_knn_label_accuracy",
    "k-NN classifier evaluation over the embedding space — the " +
      "standard embedding-quality probe (does cosine neighborhood " +
      "structure predict the label?) a training-data pipeline runs " +
      "before trusting embeddings for clustering, dedup, or curation: " +
      "50 fixed leave-one-out queries (vec_id < 50 — a CONSTANT query " +
      "budget, so cost is 50·|corpus| scored rows at any scale, the " +
      "recall-eval discipline), each classified by majority vote of " +
      "its 10 cosine-nearest neighbors (self excluded; distance " +
      "rounds at 6 before ranking; vote ties break on the smaller " +
      "label — fully deterministic). Both top-k passes are row_number " +
      "≤ k over the broadcast-query cross score (WindowGroupLimit — " +
      "map tasks forward ≤ k rows per query, the corpus never " +
      "shuffles). Output: per-class query count, correct count, " +
      "accuracy — the confusion summary that says which classes the " +
      "embedding separates. The oracle replays scoring, ranking, " +
      "voting, and the accuracy rollup in SQL.",
    (s, dir) => {
      import graft.functions.VectorFunctions
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("label").as("true_label"))
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("true_label"), col("vec_id"), col("label"),
          round(VectorFunctions.cosineDistance(col("embedding"), col("qv")), 6)
            .as("dist"))
      val wq = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
      val votes = scored.withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= 10)
        .groupBy(col("qid"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val wv = Window.partitionBy(col("qid")).orderBy(col("n_votes").desc, col("label"))
      val pred = votes.withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
        .select(col("qid"), col("true_label"), col("label").as("pred_label"))
      pred.groupBy(col("true_label").cast("long").as("true_label"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("pred_label") === col("true_label"), 1L).otherwise(0L))
            .as("n_correct"))
        .withColumn("accuracy",
          round(col("n_correct").cast("double") / col("n_queries").cast("double"), 6))
        .orderBy(col("true_label"))
    },
    Some(s"""
      |WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, label AS true_label
      |  FROM embeddings WHERE vec_id < 50
      |), scored AS (
      |  SELECT q.qid, q.true_label, e.vec_id, e.label,
      |         round(${Duck.cosine("e.embedding::DOUBLE[]", "q.qv")}, 6) AS dist
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
      |), topk AS (
      |  SELECT qid, true_label, label FROM (
      |    SELECT qid, true_label, label,
      |           row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
      |    FROM scored) WHERE rn <= 10
      |), votes AS (
      |  SELECT qid, true_label, label, count(*) AS n_votes FROM topk GROUP BY 1, 2, 3
      |), pred AS (
      |  SELECT qid, true_label, label AS pred_label FROM (
      |    SELECT qid, true_label, label,
      |           row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, label) AS vr
      |    FROM votes) WHERE vr = 1
      |)
      |SELECT true_label::BIGINT AS true_label, count(*)::BIGINT AS n_queries,
      |       SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)::BIGINT AS n_correct,
      |       round(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)::DOUBLE
      |             / count(*)::DOUBLE, 6) AS accuracy
      |FROM pred GROUP BY 1 ORDER BY 1
      """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(targetEncode, quantileBins, attribution, itemCooccurrence,
      naiveBayes, aucRoc, silhouette, logregGd, calibrationEce, kfoldCv,
      prCurve, liftGains, ridge, prfReport, stump, kmeansElbow,
      frequentTriples, bestF1, mcc, adaboost, mcnemar, cohensKappa, infoGain,
      knnLabelAccuracy, learningCurve)
}
