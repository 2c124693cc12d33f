package graft

import graft.queries.Queries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic invariants for the in-engine model-training/eval and
  * data-selection queries (round-13 additions) — each query's defining
  * identity re-derived independently of the DuckDB hash gate.
  */
class ModelEvalSpec extends SparkSpec {

  private def run(name: String): DataFrame =
    Queries.queriesMap(name)(spark, sf("sf0.001"))

  test("ml_naive_bayes: confusion matrix covers exactly the scorable test docs") {
    val out = run("ml_naive_bayes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val langs = Tables.documents(spark, sf("sf0.001"))
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(out.nonEmpty)
    assert(out.forall { case (t, p, n) => langs(t) && langs(p) && n > 0 })

    // n_docs sums to the number of test docs with >= 1 train-vocab token
    // (docs whose every token is OOV drop via the inner join — recount
    // that population independently)
    val tk = Tables.documentsSpread(spark, sf("sf0.001"))
      .withColumn("toks", graft.operators.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col("toks"))
    val vocab = tk.filter(col("doc_id") % 3 =!= 0)
      .select(explode(col("toks")).as("w")).distinct()
    val scorable = tk.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .join(vocab, Seq("w"))
      .select("doc_id").distinct().count()
    assert(out.map(_._3).sum == scorable,
      s"confusion matrix mass ${out.map(_._3).sum} != scorable test docs $scorable")
  }

  test("ml_auc_roc: curve invariants + trapezoid matches the rank-based AUC") {
    val out = run("ml_auc_roc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // thresholds descend; cumulative TP/FP are monotone; curve ends at (1,1)
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted.reverse)
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted)
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted)
    assert(out.last._4 == 1.0 && out.last._5 == 1.0)
    val auc = out.head._6
    assert(out.forall(_._6 == auc), "auc must be constant across rows")

    // independent AUC: P(score_pos > score_neg) + 0.5 P(tie), brute force
    // on the sf0.001 fixture — equals the trapezoid over the full
    // tie-grouped ROC up to the 6-decimal rounding of the curve points
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select((col("l_discount").cast("decimal(4,2)") * 100).cast("long").as("c"),
        (col("l_returnflag") === "R").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = li.filter(_._2).map(_._1)
    val neg = li.filterNot(_._2).map(_._1)
    val negSorted = neg.sorted
    var wins = 0.0
    for (p <- pos) {
      val lt = negSorted.count(_ < p)
      val eq = negSorted.count(_ == p)
      wins += lt + 0.5 * eq
    }
    val rankAuc = wins / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(auc - rankAuc) < 1e-4, s"trapezoid $auc vs rank $rankAuc")
  }

  test("ml_silhouette: partitions the corpus; means in [-1, 1]; assignment is argmin") {
    val out = run("ml_silhouette").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val n = Tables.embeddings(spark, sf("sf0.001")).count()
    assert(out.map(_._2).sum == n, "every vector lands in exactly one cluster")
    assert(out.forall { case (_, _, m) => m >= -1.0 && m <= 1.0 })
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
  }

  test("stat_poisson_bootstrap: rank CI is ordered and brackets a replicate mass") {
    val Array(row) = run("stat_poisson_bootstrap").collect()
    val (nBoot, est, lo, hi) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(nBoot == 100L)
    assert(lo <= hi, s"CI inverted: [$lo, $hi]")
    // Poisson(1) weights: the resample mass concentrates near the point
    // estimate — at n=1500 orders the 95% CI must bracket it
    assert(lo <= est && est <= hi, s"est $est outside [$lo, $hi]")
    // CI width is positive but small relative to the estimate
    assert(hi - lo > 0.0 && (hi - lo) / est < 0.2)
  }

  test("graph_kcore equals the textbook sequential peel") {
    val out = run("graph_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent driver-side peel of the same support-2 graph
    val basket = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = basket.groupBy(_._1).values.flatMap { items =>
      val is = items.map(_._2).sorted
      for (i <- is.indices; j <- (i + 1) until is.length) yield (is(i), is(j))
    }
    var edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
    }
    val expect = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out == expect,
      s"engine core (${out.size} nodes) != sequential peel (${expect.size} nodes)")
    assert(out.values.forall(_ >= 3L) || out.isEmpty)
  }

  test("pipeline_dsir_select: keys verify against the doc's log-weight + Gumbel hash") {
    val out = run("pipeline_dsir_select").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length <= 20 && out.nonEmpty)
    // output is key-descending
    assert(out.map(_._5).toSeq == out.map(_._5).toSeq.sortBy(-_))
    // re-derive each selected doc's Gumbel perturbation from its id hash:
    // sel_key - log_w must equal round(-ln(-ln(u)), 6) within the decimal
    // round-trip tolerance
    for ((docId, _, _, logW, selKey) <- out) {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(md5, 16).toDouble + 0.5) / 281474976710656.0
      val g = BigDecimal(-math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs((selKey - logW) - g) < 1e-6,
        s"doc $docId: key-logw ${selKey - logW} vs gumbel $g")
    }
  }
}
