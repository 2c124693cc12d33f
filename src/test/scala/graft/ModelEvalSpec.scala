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

  /** Driver mirror of SQL round(x, 6) — HALF_UP on the shortest repr. */
  private def rd6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

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

  test("ml_logreg_gd: trajectory starts at the exact zero-model Brier and descends") {
    val out = run("ml_logreg_gd").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._1).toSeq == (0L to 8L))
    // iter 0 is the zero model: s = 0.5 for every row, so the Brier is
    // EXACTLY 0.25 regardless of the data
    val first = out.head
    assert(first._2 == 0.0 && first._3 == 0.0 && first._4 == 0.0)
    assert(first._5 == 0.25)
    // full-batch GD on a convex surrogate with this step size descends
    // monotonically on the fixture
    val briers = out.map(_._5).toSeq
    assert(briers.zip(briers.tail).forall { case (a, b) => b < a },
      s"Brier not strictly decreasing: $briers")
    // the model actually moved
    assert(out.last._2 != 0.0)
  }

  test("ml_calibration_ece: bin stats are probabilities and recompose the ECE") {
    val out = run("ml_calibration_ece").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    assert(out.forall { case (bin, n, pos, acc, conf, _) =>
      bin >= 0 && bin <= 9 && n > 0 && pos >= 0 && pos <= n &&
        acc >= 0.0 && acc <= 1.0 && conf >= 0.0 && conf <= 1.0
    })
    val ece = out.head._6
    assert(out.forall(_._6 == ece), "ece must be constant across rows")
    assert(ece >= 0.0 && ece <= 1.0)
    // recompose Σ (n_b/N)·|acc − conf| from the emitted rows
    val nAll = out.map(_._2).sum.toDouble
    val recomposed = out.map { case (_, n, _, acc, conf, _) =>
      (n / nAll) * math.abs(acc - conf)
    }.sum
    assert(math.abs(recomposed - ece) < 1e-6,
      s"recomposed ECE $recomposed vs emitted $ece")
  }

  test("ml_ranking_ndcg: rank table recomposes nDCG and MRR") {
    val out = run("ml_ranking_ndcg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(out.map(_._1).toSeq == (1L to 10L))
    // system ranking is bm25-descending with doc_id ties
    val scores = out.map(r => (r._3, r._2)).toSeq
    assert(scores == scores.sortBy { case (s, id) => (-s, id) })
    assert(out.forall(r => r._4 >= 0L && r._4 <= 3L))
    val (dcg, idcg, ndcg, mrr) = (out.head._5, out.head._6, out.head._7, out.head._8)
    assert(dcg <= idcg && ndcg > 0.0 && ndcg <= 1.0)
    assert(math.abs(ndcg - BigDecimal(dcg / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // MRR from the emitted ranks
    val firstHit = out.find(_._4 >= 2L).map(_._1)
    val expectMrr = firstHit.map(r => BigDecimal(1.0 / r)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).getOrElse(0.0)
    assert(mrr == expectMrr, s"mrr $mrr vs recomposed $expectMrr")
    // recompose DCG from the emitted (rnk, rel) pairs with the same
    // closed-form discounts
    val disc = (1 to 10).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val recomposed = out.map { r =>
      BigDecimal(((1L << r._4) - 1).toDouble * disc(r._1.toInt - 1))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(recomposed - dcg) < 1e-6, s"dcg $dcg vs recomposed $recomposed")
  }

  /** Driver-side rebuild of the support-2 co-purchase graph at sf0.001
    * (the kcore test's construction, shared by the LPA/SSSP tests).
    */
  private def smallGraph(): Set[(Long, Long)] = {
    val basket = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = basket.groupBy(_._1).values.flatMap { items =>
      val is = items.map(_._2).sorted
      for (i <- is.indices; j <- (i + 1) until is.length) yield (is(i), is(j))
    }
    pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSet
  }

  test("graph_label_propagation: communities partition the graph's node set") {
    val out = run("graph_label_propagation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nodes = smallGraph().flatMap(e => Seq(e._1, e._2))
    assert(out.map(_._2).sum == nodes.size,
      "community sizes must sum to the node count (a partition)")
    assert(out.forall { case (lbl, n, lo, hi) =>
      n > 0 && lo <= hi && nodes(lbl) && nodes(lo) && nodes(hi)
    })
    // labels are distinct (it IS a partition keyed by label)
    assert(out.map(_._1).distinct.length == out.length)
  }

  test("graph_sssp_weighted matches a driver-side 12-sweep Bellman-Ford") {
    val out = run("graph_sssp_weighted").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent bounded Bellman-Ford over the same weighted graph
    val support = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { items =>
        val is = items.map(_._2).sorted
        for (i <- is.indices; j <- (i + 1) until is.length) yield (is(i), is(j))
      }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2).toMap
    val adj = support.toSeq.flatMap { case ((a, b), nCo) =>
      val w = 1L + 100L / nCo
      Seq((a, b, w), (b, a, w))
    }
    val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
    val src = deg.toSeq.minBy { case (v, d) => (-d, v) }._1
    var dist = Map(src -> 0L)
    for (_ <- 1 to 12) {
      val relaxed = adj.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val expect = dist.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(out == expect,
      s"engine distance histogram $out != driver Bellman-Ford $expect")
    assert(out(0L) == 1L, "exactly the source sits at distance 0")
  }

  test("ml_kfold_cv: folds partition the scorable docs and recompose the means") {
    val out = run("ml_kfold_cv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.map(_._1).toSeq.sorted == out.map(_._1).toSeq)
    assert(out.forall(r => r._2 > 0 && r._3 >= 0.0 && r._3 <= 1.0 &&
      r._4 >= 0.0 && r._4 <= 1.0))
    val k = out.length
    assert(k >= 2 && k <= 5)
    // the emitted means recompose from the emitted folds (mean over 5
    // slots — missing folds contribute 0, matching the query's /5.0)
    val meanAcc = (out.map(r => BigDecimal(r._3)).sum / 5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(meanAcc - out.head._5) < 1e-6)
    val spread = out.map(_._3).max - out.map(_._3).min
    assert(math.abs(BigDecimal(spread).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble - out.head._7) < 1e-6)
  }

  test("stat_hill_tail: tail sample descends and alpha inverts gamma") {
    val out = run("stat_hill_tail").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.map(_._1).toSeq == (1L to 10L))
    val cents = out.map(_._3).toSeq
    assert(cents.zip(cents.tail).forall { case (a, b) => a >= b },
      "top order statistics must descend")
    val (gamma, alpha) = (out.head._4, out.head._5)
    assert(gamma > 0.0, "tail values exceed the threshold, so gamma > 0")
    assert(math.abs(alpha - BigDecimal(1.0 / gamma)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("dq_dp_counts: release covers every (lang, source) cell with bounded noise") {
    val out = run("dq_dp_counts").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val truth = Tables.documents(spark, sf("sf0.001"))
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out.length == truth.size)
    for ((lang, src, noisy) <- out) {
      val t = truth((lang, src)).toDouble
      assert(noisy >= 0.0)
      // Laplace(b=1) noise from a 48-bit uniform is bounded by
      // ln(2^48) ≈ 33.3 in magnitude before the zero floor
      assert(noisy <= t + 34.0 && (noisy >= t - 34.0 || noisy == 0.0),
        s"($lang,$src): noisy $noisy vs true $t")
    }
    // the mechanism actually perturbs (not an identity release)
    assert(out.exists { case (l, s0, noisy) => noisy != truth((l, s0)).toDouble })
  }

  test("graph_ppr_parts: seeds carry restart mass and total mass is conserved") {
    val out = run("graph_ppr_parts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 25)
    val ranks = out.map(_._2).toSeq
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(out.count(_._3 == 1L) >= 1, "at least one seed in the top-25")
    // truncating integer flow never creates mass
    assert(ranks.sum <= 1000000000000L)
    assert(out.forall(_._2 >= 0L))
  }

  test("ml_pr_curve: recall ascends toward 1 and AP recomposes from the rows") {
    val out = run("ml_pr_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted.reverse)
    val recalls = out.map(_._5).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(out.last._5 == 1.0)
    val ap = out.head._6
    assert(out.forall(_._6 == ap))
    val terms = out.zip(0.0 +: out.map(_._5).init).map { case (r, prevR) =>
      BigDecimal((r._5 - prevR) * r._4)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }
    val apRe = terms.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(apRe - ap) < 1e-6, s"ap $ap vs recomposed $apRe")
  }

  test("stat_spearman_daily matches a driver-side tie-aware rank correlation") {
    val out = run("stat_spearman_daily").collect()
    assert(out.length == 1)
    val (n, rho) = (out.head.getLong(0), out.head.getDouble(1))
    assert(rho >= -1.0 && rho <= 1.0)
    // independent: daily (view, purchase) cents, average ranks, Pearson
    val daily = Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(38,6)")).cast("decimal(38,2)") * 100)
        .cast("long").as("yc"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val days = daily.keys.collect { case ("view", d) if daily.contains(("purchase", d)) => d }.toSeq.sorted
    assert(days.size.toLong == n)
    def ranks2(xs: Seq[Long]): Seq[Long] =
      xs.map(v => 2L * xs.count(_ < v) + xs.count(_ == v) + 1)
    val xs = days.map(d => daily(("view", d)))
    val ys = days.map(d => daily(("purchase", d)))
    val (rx, ry) = (ranks2(xs), ranks2(ys))
    val nn = days.size.toDouble
    def s(v: Seq[Long]) = v.map(_.toDouble).sum
    val num = nn * rx.zip(ry).map { case (a, b) => a.toDouble * b }.sum - s(rx) * s(ry)
    val den = math.sqrt(nn * rx.map(a => a.toDouble * a).sum - s(rx) * s(rx)) *
      math.sqrt(nn * ry.map(a => a.toDouble * a).sum - s(ry) * s(ry))
    assert(math.abs(rho - num / den) < 1e-5, s"rho $rho vs driver ${num / den}")
  }

  test("ev_holt_winters matches a driver-side replay of the seasonal recursion") {
    val out = run("ev_holt_winters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty && out.groupBy(_._1).values.forall(_.length == 7))
    val daily = Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(38,6)")).cast("decimal(38,2)") * 100)
        .cast("long").as("yc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((et, rows) <- out.groupBy(_._1)) {
      val xs = daily.filter(_._1 == et).sortBy(_._2).map(_._3.toDouble)
      assert(xs.length >= 8)
      val l0 = xs.take(7).reduce(_ + _) / 7.0
      var l = l0; var b = 0.0
      val sArr = Array.tabulate(7)(j => xs(j) - l0)
      for (t <- 8 to xs.length) {
        val j = (t - 1) % 7
        val x = xs(t - 1)
        val lNew = 0.5 * (x - sArr(j)) + 0.5 * (l + b)
        val bNew = 0.5 * (lNew - l) + 0.5 * b
        sArr(j) = 0.5 * (x - lNew) + 0.5 * sArr(j)
        l = lNew; b = bNew
      }
      for ((_, nDays, h, _, _, fc) <- rows) {
        assert(nDays.toInt == xs.length)
        val expect = (l + h.toDouble * b + sArr(((xs.length + h.toInt - 1) % 7))) / 100.0
        assert(math.abs(fc - expect) < 1e-5, s"$et h=$h: $fc vs $expect")
      }
    }
  }

  test("graph_link_prediction: candidates are non-edges and AA recomputes") {
    val out = run("graph_link_prediction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.nonEmpty && out.length <= 25)
    val aas = out.map(_._7).toSeq
    assert(aas.zip(aas.tail).forall { case (a, b) => a >= b })
    val edges = smallGraph()
    val adj = edges.toSeq.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((a, b, cn, degA, degB, jac, aa) <- out) {
      assert(!edges((a, b)) && !edges((b, a)), s"($a,$b) is an existing edge")
      val common = adj(a).intersect(adj(b))
      assert(common.size.toLong == cn)
      assert(adj(a).size.toLong == degA && adj(b).size.toLong == degB)
      assert(math.abs(jac - BigDecimal(cn.toDouble / (degA + degB - cn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      val aaRe = common.toSeq.map(n => BigDecimal(1.0 / math.log(adj(n).size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(aa - aaRe) < 1e-6, s"($a,$b): aa $aa vs $aaRe")
    }
  }

  test("ml_lift_gains: deciles partition the corpus and gains end at 1") {
    val out = run("ml_lift_gains").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq == (0L to 9L))
    val nDocs = Tables.documents(spark, sf("sf0.001")).count()
    assert(out.map(_._2).sum == nDocs)
    val gains = out.map(_._6).toSeq
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    assert(gains.last == 1.0)
    // lift recomposes: lift_d = rate_d / base rate, via exact counts
    val posAll = out.map(_._3).sum
    for ((_, n, pos, rate, lift, _) <- out) {
      assert(math.abs(rate - BigDecimal(pos.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      val liftRe = BigDecimal((pos * nDocs).toDouble / (n * posAll))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lift - liftRe) < 1e-12, s"lift $lift vs $liftRe")
    }
  }

  test("graph_hits_nations: exact driver replay of the integer HITS iteration") {
    val dir = sf("sf0.001")
    val out = run("graph_hits_nations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 25)
    val auths = out.map(_._2).toSeq
    assert(auths.zip(auths.tail).forall { case (a, b) => a >= b })

    // independently rebuild the trade graph and replay both half-steps
    // with plain Scala Longs — bit-equality is the whole claim
    val mass = 100000000L
    val edges = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val q = raw.values.max / mass + 1
      ids.map { case (id, _) => id -> raw.getOrElse(id, 0L) / q }.toMap
    }
    var h = ids.map { case (id, _) => id -> mass }.toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      a = norm(edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => h(e._1) * e._3).sum })
      h = norm(edges.groupBy(_._1).map { case (s0, es) =>
        s0 -> es.map(e => a(e._2) * e._3).sum })
    }
    val byName = ids.map { case (id, n) => n -> id }.toMap
    for ((nation, auth, hub) <- out) {
      assert(auth == a(byName(nation)), s"$nation auth $auth vs ${a(byName(nation))}")
      assert(hub == h(byName(nation)), s"$nation hub $hub vs ${h(byName(nation))}")
    }
  }

  test("stat_anova_f: F recomposes from independent group statistics") {
    val r = run("stat_anova_f").collect().head
    val (k, n, ssb, ssw, f) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val g = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderpriority").as("grp"),
        expr("floor(o_totalprice) div 100").as("x"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cn"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"))
      .collect().map(r2 => (r2.getLong(1), r2.getLong(2), r2.getLong(3)))
    assert(k == g.length && n == g.map(_._1).sum)
    val aGroups = g.map { case (cn, sx, _) =>
      (BigInt(sx) * BigInt(sx) * 100 / cn).toLong }.sum.toDouble / 100.0
    val sAll = g.map(_._2).sum.toDouble
    val t2All = g.map(_._3).sum.toDouble
    val ssbRe = aGroups - sAll * sAll / n.toDouble
    val sswRe = t2All - aGroups
    assert(math.abs(ssb - BigDecimal(ssbRe).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(ssw - BigDecimal(sswRe).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val fRe = (ssbRe / (k - 1).toDouble) / (sswRe / (n - k).toDouble)
    assert(math.abs(f - BigDecimal(fRe).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(f > 0 && ssw > 0)
  }

  test("ml_ridge_regression: betas satisfy the ridge normal equations") {
    val r = run("ml_ridge_regression").collect().head
    val (b0, b1, b2, r2v) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val st = Tables.lineitem(spark, sf("sf0.001")).select(
        col("l_quantity").cast("long").as("x1"),
        (col("l_discount").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("x2"),
        expr("floor(l_extendedprice)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(col("x1") * col("x1")).as("s11"), sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"), sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("s1y"), sum(col("x2") * col("y")).as("s2y"))
      .collect().head
    val n = st.getLong(0).toDouble
    val Seq(sx1, sx2, s11, s22, s12, sy, s1y, s2y) =
      (1 to 8).map(i => st.getLong(i).toDouble)
    val lam = 10000.0
    // residual of (XtX + λ·diag(0,1,1))·β − Xᵀy, using the ROUNDED betas:
    // each equation must close to within the rounding-induced slack
    // (1e-6 per beta times the row's coefficient magnitude)
    val res = Seq(
      (n * b0 + sx1 * b1 + sx2 * b2 - sy, n + sx1 + sx2),
      (sx1 * b0 + (s11 + lam) * b1 + s12 * b2 - s1y, sx1 + s11 + lam + s12),
      (sx2 * b0 + s12 * b1 + (s22 + lam) * b2 - s2y, sx2 + s12 + s22 + lam))
    for (((resid, scale), i) <- res.zipWithIndex)
      assert(math.abs(resid) <= 2e-6 * scale + 1e-6,
        s"equation $i residual $resid vs scale $scale")
    // the fixture's extendedprice is independent of quantity/discount, so
    // the fit is honest-but-useless — the invariant is the mechanism
    // (normal equations close), not predictive power
    assert(r2v >= 0.0 && r2v <= 1.0, s"r2 $r2v")
  }

  test("txt_zipf_fit: slope is negative and OLS recomposes from token counts") {
    val r = run("txt_zipf_fit").collect().head
    val (k, slope, intercept, r2v) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // the sf0.001 fixture vocabulary is 31 near-uniform tokens — the
    // probe correctly reads "not natural language" (slope ≈ −0.18,
    // r² ≈ 0.06); the invariants are the mechanism and the sign
    assert(k > 0 && k <= 200)
    assert(slope < 0, s"Zipf slope must be negative: $slope")
    assert(r2v >= 0.0 && r2v <= 1.0, s"r2 $r2v")
    // replay: recount the vocabulary with the engine's own tokenizer,
    // re-rank, and re-run the rounded-term OLS in BigDecimal
    val freq = Tables.documentsSpread(spark, sf("sf0.001"))
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t")).limit(200)
      .collect().map(_.getLong(1))
    def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pts = freq.zipWithIndex.map { case (nTok, i) =>
      (rd(math.log((i + 1).toDouble)), rd(math.log(nTok.toDouble))) }
    val kk = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map { case (x, y) => rd(x.toDouble * y.toDouble) }.sum.toDouble
    val sxx = pts.map { case (x, _) => rd(x.toDouble * x.toDouble) }.sum.toDouble
    val slopeRe = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    assert(math.abs(slope - BigDecimal(slopeRe).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"$slope vs $slopeRe")
    assert(math.abs(intercept - BigDecimal((sy - slopeRe * sx) / kk).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("graph_closeness_nations: harmonic closeness replays from driver all-pairs BFS") {
    val dir = sf("sf0.001")
    val out = run("graph_closeness_nations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 25)
    val hs = out.map(_._3).toSeq
    assert(hs.zip(hs.tail).forall { case (a, b) => a >= b })
    val edges = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir).filter(col("l_quantity") > 45),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def bfs4(s0: Long): Map[Long, Long] = {
      var d = Map(s0 -> 0L)
      for (k <- 1 to 4) {
        val next = d.keys.flatMap(u => adj.getOrElse(u, Set.empty))
          .filterNot(d.contains).map(_ -> k.toLong)
        d = d ++ next
      }
      d
    }
    def rd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val byName = ids.map { case (id, n) => n -> id }.toMap
    for ((nation, nReached, harmonic) <- out) {
      val d = bfs4(byName(nation))
      assert(nReached == d.size - 1, s"$nation reached $nReached vs ${d.size - 1}")
      val hRe = d.values.filter(_ > 0).map(dd => rd6(1.0 / dd)).sum
      assert(math.abs(harmonic - rd6(hRe.toDouble).toDouble) < 1e-9,
        s"$nation harmonic $harmonic vs $hRe")
    }
  }

  test("stat_levene_bf: F recomposes from driver-side medians and deviations") {
    val r = run("stat_levene_bf").collect().head
    val (k, n, f) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val rows = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderpriority").as("grp"),
        expr("floor(o_totalprice) div 100").as("x"))
      .collect().map(rr => (rr.getString(0), rr.getLong(1)))
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(k == groups.size && n == rows.length)
    val stats = groups.values.map { xs =>
      val med = xs((xs.length + 1) / 2 - 1) // lower median, 1-indexed rank
      val z = xs.map(x => math.abs(x - med))
      (z.length.toLong, z.sum, z.map(v => v * v).sum)
    }.toSeq
    val aGroups = stats.map { case (cn, sz, _) =>
      (BigInt(sz) * BigInt(sz) * 100 / cn).toLong }.sum.toDouble / 100.0
    val sAll = stats.map(_._2).sum.toDouble
    val t2All = stats.map(_._3).sum.toDouble
    val fRe = ((aGroups - sAll * sAll / n.toDouble) / (k - 1).toDouble) /
      ((t2All - aGroups) / (n - k).toDouble)
    assert(math.abs(f - BigDecimal(fRe).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"F $f vs $fRe")
  }

  test("ev_stl_decompose: components recompose to the observed series") {
    val out = run("ev_stl_decompose").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    // days are sorted, unique, and dow matches the date
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted.distinct)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("EEEE",
      java.util.Locale.ENGLISH)
    for ((day, dow, y, trend, seasonal, residual) <- out) {
      assert(java.time.LocalDate.parse(day).format(fmt) == dow)
      // y(2dp) = trend + seasonal + residual up to the output roundings
      assert(math.abs(y - (trend + seasonal + residual)) < 0.006,
        s"$day: $y vs ${trend + seasonal + residual}")
    }
    // per-dow seasonal is constant across the series
    for ((_, g) <- out.groupBy(_._2))
      assert(g.map(_._5).distinct.length == 1)
  }

  test("ml_prf_report: metrics replay from an independent majority-vote pass") {
    val out = run("ml_prf_report").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val maj = docs.filter(_._1 % 3 != 0).groupBy(_._2).view.mapValues { ds =>
      ds.groupBy(_._3).view.mapValues(_.length).toSeq
        .sortBy { case (lang, cnt) => (-cnt, lang) }.head._1
    }.toMap
    val test = docs.filter(_._1 % 3 == 0).map(d => (d._3, maj(d._2)))
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((lang, tp, fp, fn, p, rc, f1) <- out) {
      val tpRe = test.count { case (t, pr) => t == lang && pr == lang }
      val fnRe = test.count { case (t, pr) => t == lang && pr != lang }
      val fpRe = test.count { case (t, pr) => pr == lang && t != lang }
      assert(tp == tpRe && fn == fnRe && fp == fpRe, s"$lang counts")
      val pRe = if (tpRe + fpRe == 0) 0.0 else rd6(tpRe.toDouble / (tpRe + fpRe))
      val rRe = if (tpRe + fnRe == 0) 0.0 else rd6(tpRe.toDouble / (tpRe + fnRe))
      assert(p == pRe && rc == rRe, s"$lang p/r")
      val f1Re = if (pRe + rRe == 0) 0.0 else rd6(2.0 * pRe * rRe / (pRe + rRe))
      assert(math.abs(f1 - f1Re) < 1e-12, s"$lang f1 $f1 vs $f1Re")
    }
    // every test-truth class is reported
    assert(out.map(_._1).toSet == test.map(_._1).toSet)
  }

  test("txt_collocation_llr: LLR replays from driver-side contingency tables") {
    val out = run("txt_collocation_llr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.nonEmpty && out.length <= 25)
    val ls = out.map(_._5).toSeq
    assert(ls.zip(ls.tail).forall { case (a, b) => a >= b })
    // independent bigram recount with the engine's own tokenizer
    val toks = Tables.documentsSpread(spark, sf("sf0.001"))
      .select(graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0))
    val bigrams = toks.flatMap(ts => ts.zip(ts.tail))
    val cab = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rw = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cw = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = bigrams.length.toLong
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(k: Long, a: Long, b: Long): Double =
      if (k > 0) rd6(k.toDouble * math.log(k.toDouble * nn / (a.toDouble * b.toDouble)))
      else 0.0
    for ((bg, nAb, rwOut, cwOut, llr) <- out) {
      val Array(w1, w2) = bg.split(" ", 2)
      val k11 = cab((w1, w2))
      assert(nAb == k11 && rwOut == rw(w1) && cwOut == cw(w2), s"$bg counts")
      val (k12, k21) = (rw(w1) - k11, cw(w2) - k11)
      val k22 = nn - rw(w1) - cw(w2) + k11
      assert(k11 + k12 + k21 + k22 == nn)
      val llrRe = rd6(2.0 * (term(k11, rw(w1), cw(w2)) + term(k12, rw(w1), nn - cw(w2)) +
        term(k21, nn - rw(w1), cw(w2)) + term(k22, nn - rw(w1), nn - cw(w2))))
      assert(math.abs(llr - llrRe) < 1e-9, s"$bg llr $llr vs $llrRe")
      assert(llr >= -1e-6, s"$bg negative LLR $llr")
    }
  }

  test("ml_decision_stump: split curve partitions the data and Gini recomputes") {
    val out = run("ml_decision_stump").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    val nn = out.head._2 + out.head._4
    val pp = out.head._3 + out.head._5
    for ((thr, nl, pl, nr, pr, g) <- out) {
      assert(nl + nr == nn && pl + pr == pp, s"thr $thr totals")
      assert(nl > 0 && nr > 0)
      def side(n: Long, p: Long) =
        n.toDouble * (1.0 - (p.toDouble / n) * (p.toDouble / n) -
          ((n - p).toDouble / n) * ((n - p).toDouble / n))
      val gRe = BigDecimal((side(nl, pl) + side(nr, pr)) / nn.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(g - gRe) < 1e-9, s"thr $thr gini $g vs $gRe")
      // split impurity never beats the theoretical floor, never exceeds
      // the no-split baseline Gini
      val base = 1.0 - (pp.toDouble / nn) * (pp.toDouble / nn) -
        ((nn - pp).toDouble / nn) * ((nn - pp).toDouble / nn)
      assert(g >= -1e-9 && g <= base + 1e-6, s"thr $thr gini $g vs base $base")
    }
    // thresholds ascend, cumulative left-counts strictly increase
    val thrs = out.map(_._1).toSeq
    assert(thrs == thrs.sorted && thrs.distinct == thrs)
    val nls = out.map(_._2).toSeq
    assert(nls.zip(nls.tail).forall { case (a, b) => a < b })
  }

  test("stat_jarque_bera: moments replay and JB is non-negative") {
    val r = run("stat_jarque_bera").collect().head
    val (n, skew, kurt, jb) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val xs = Tables.orders(spark, sf("sf0.001"))
      .select(expr("floor(o_totalprice) div 2000").as("x"))
      .collect().map(_.getLong(0))
    assert(n == xs.length)
    val nd = n.toDouble
    val (s1, s2, s3, s4) = (xs.map(_.toDouble).sum, xs.map(x => x.toDouble * x).sum,
      xs.map(x => x.toDouble * x * x).sum, xs.map(x => x.toDouble * x * x * x).sum)
    val mean = s1 / nd
    val m2 = s2 / nd - mean * mean
    val m3 = s3 / nd - 3.0 * mean * (s2 / nd) + 2.0 * mean * mean * mean
    val m4 = s4 / nd - 4.0 * mean * (s3 / nd) + 6.0 * mean * mean * (s2 / nd) -
      3.0 * mean * mean * mean * mean
    val skewRe = m3 / (m2 * math.sqrt(m2))
    val kurtRe = m4 / (m2 * m2)
    // driver sums are float (unordered) — compare within numeric slack,
    // not bit-exactly like the integer replays
    assert(math.abs(skew - skewRe) < 1e-6, s"skew $skew vs $skewRe")
    assert(math.abs(kurt - kurtRe) < 1e-6, s"kurt $kurt vs $kurtRe")
    val jbRe = (nd / 6.0) * (skewRe * skewRe + (kurtRe - 3.0) * (kurtRe - 3.0) / 4.0)
    assert(math.abs(jb - jbRe) < 1e-4, s"jb $jb vs $jbRe")
    assert(jb >= 0.0)
  }

  test("graph_eccentricity_nations: ecc/radius/diameter replay from driver BFS") {
    val dir = sf("sf0.001")
    val out = run("graph_eccentricity_nations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 25)
    assert(out.map(_._4).distinct.length == 1 && out.map(_._5).distinct.length == 1)
    val edges = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir).filter(col("l_quantity") > 45),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byName = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getString(1), r.getLong(0))).toMap
    def bfs4(s0: Long): Map[Long, Long] = {
      var d = Map(s0 -> 0L)
      for (k <- 1 to 4)
        d = d ++ d.keys.flatMap(u => adj.getOrElse(u, Set.empty))
          .filterNot(d.contains).map(_ -> k.toLong)
      d
    }
    val eccRe = out.map { case (nation, _, _, _, _) =>
      val d = bfs4(byName(nation))
      nation -> ((d.size - 1).toLong, d.values.max)
    }.toMap
    for ((nation, nReached, ecc, _, _) <- out) {
      assert(nReached == eccRe(nation)._1 && ecc == eccRe(nation)._2, s"$nation")
    }
    val nonIso = out.filter(_._2 > 0).map(_._3)
    assert(out.head._4 == nonIso.min && out.head._5 == nonIso.max)
  }

  test("ev_seasonality_strength: strengths replay from a driver decomposition") {
    val r = run("ev_seasonality_strength").collect().head
    val (nDays, fT, fS) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(fT >= 0.0 && fT <= 1.0 && fS >= 0.0 && fS <= 1.0)
    // full driver replay of the shared decomposition core (daily cents →
    // centered 7-day trend → weekday seasonal) with the same roundings
    val daily = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "view")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 2)) * 100)
        .cast("long").as("yc"))
      .orderBy(col("day"))
      .collect().map(rr => (rr.getString(0), rr.getLong(1)))
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val full = daily.indices.filter(i => i >= 3 && i < daily.length - 3).map { i =>
      val s7 = (i - 3 to i + 3).map(j => daily(j)._2).sum
      val trend = s7 / 700.0
      val detr = daily(i)._2 / 100.0 - trend
      val dow = java.time.LocalDate.parse(daily(i)._1)
        .format(java.time.format.DateTimeFormatter.ofPattern("EEEE",
          java.util.Locale.ENGLISH))
      (daily(i)._1, daily(i)._2, detr, dow)
    }
    assert(nDays == full.length)
    val seas = full.groupBy(_._4).view.mapValues { g =>
      rd6(g.map(x => BigDecimal(rd6(x._3))).sum.toDouble / g.length) }.toMap
    def vr(vs: Seq[Double]): Double = {
      val n = vs.length.toDouble
      val sv = vs.map(BigDecimal(_)).sum.toDouble
      val sv2 = vs.map(v => BigDecimal(rd6(v * v))).sum.toDouble
      sv2 / n - (sv / n) * (sv / n)
    }
    val varR = vr(full.map(x => rd6(x._3 - seas(x._4))))
    val varTr = vr(full.map(x => rd6(x._2 / 100.0 - seas(x._4))))
    val varSr = vr(full.map(x => rd6(x._3)))
    val fTRe = rd6(math.max(0.0, 1.0 - varR / varTr))
    val fSRe = rd6(math.max(0.0, 1.0 - varR / varSr))
    assert(math.abs(fT - fTRe) < 1e-6, s"f_trend $fT vs $fTRe")
    assert(math.abs(fS - fSRe) < 1e-6, s"f_seasonal $fS vs $fSRe")
  }

  test("stat_grubbs_outlier: statistics replay from collected values") {
    val r = run("stat_grubbs_outlier").collect().head
    val (n, xMin, xMax, meanX, gMax, gMin) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val xs = Tables.orders(spark, sf("sf0.001"))
      .select(expr("floor(o_totalprice) div 100").as("x"))
      .collect().map(_.getLong(0))
    assert(n == xs.length && xMin == xs.min && xMax == xs.max)
    val nd = n.toDouble
    val mean = xs.sum.toDouble / nd
    val sd = math.sqrt((xs.map(x => x.toDouble * x).sum / nd - mean * mean) *
      nd / (nd - 1.0))
    def rd6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(meanX - rd6(mean)) < 1e-9)
    assert(math.abs(gMax - rd6((xMax.toDouble - mean) / sd)) < 1e-6)
    assert(math.abs(gMin - rd6((mean - xMin.toDouble) / sd)) < 1e-6)
    assert(gMax > 0 && gMin > 0)
  }

  test("dq_referential_integrity: four FK edges, fixture orphans are zero, totals match") {
    val out = run("dq_referential_integrity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 4)
    val nOrders = Tables.orders(spark, sf("sf0.001")).count()
    val nLineitem = Tables.lineitem(spark, sf("sf0.001")).count()
    val byEdge = out.map(x => x._1 -> x).toMap
    assert(byEdge("orders.custkey->customer")._2 == nOrders)
    for (e <- Seq("lineitem.orderkey->orders", "lineitem.partkey->part",
        "lineitem.suppkey->supplier"))
      assert(byEdge(e)._2 == nLineitem, e)
    // the fixtures are referentially closed — every edge reports zero
    for ((edge, _, orphans, rate) <- out) {
      assert(orphans == 0L && rate == 0.0, s"$edge has orphans")
    }
  }

  test("txt_burstiness: VMR replays from driver per-doc counts") {
    val out = run("txt_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty && out.length <= 25)
    val vs = out.map(_._4).toSeq
    assert(vs.zip(vs.tail).forall { case (a, b) => a >= b })
    val toks = Tables.documentsSpread(spark, sf("sf0.001"))
      .select(graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0))
    val nDocs = toks.length.toDouble
    val perTok = toks.zipWithIndex
      .flatMap { case (ts, i) => ts.groupBy(identity).map { case (t, g) => (t, i, g.length.toLong) } }
      .groupBy(_._1)
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((token, df, tot, vmr) <- out) {
      val cs = perTok(token).map(_._3)
      assert(df == cs.length.toLong && tot == cs.sum, s"$token counts")
      val mean = tot.toDouble / nDocs
      val s2 = cs.map(c => c.toDouble * c).sum
      val vmrRe = rd6((s2 / nDocs - mean * mean) / mean)
      assert(math.abs(vmr - vmrRe) < 1e-9, s"$token vmr $vmr vs $vmrRe")
      assert(vmr > 0)
    }
  }

  test("stat_runs_test: runs and z replay from the driver day series") {
    val r = run("stat_runs_test").collect().head
    val (nUp, nDown, runs, z) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val daily = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "view")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 2)) * 100)
        .cast("long").as("yc"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val sgns = daily.zip(daily.tail).filter { case (a, b) => a != b }
      .map { case (a, b) => if (b > a) 1 else -1 }
    assert(nUp == sgns.count(_ == 1) && nDown == sgns.count(_ == -1))
    val runsRe = if (sgns.isEmpty) 0
      else 1 + sgns.zip(sgns.tail).count { case (a, b) => a != b }
    assert(runs == runsRe, s"runs $runs vs $runsRe")
    val (n1, n2) = (nUp.toDouble, nDown.toDouble)
    val nN = n1 + n2
    val e = 1.0 + 2.0 * n1 * n2 / nN
    val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nN) / (nN * nN * (nN - 1.0))
    val zRe = BigDecimal((runs.toDouble - e) / math.sqrt(v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(z - zRe) < 1e-9, s"z $z vs $zRe")
  }

  test("vec_kmeans_elbow: curve is monotone and inertia replays for each k") {
    val out = run("vec_kmeans_elbow").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    assert(out.head._4.isEmpty && out.tail.forall(_._4.isDefined))
    val in = out.map(_._3)
    assert(in.forall(_ > 0))
    assert(in.zip(in.tail).forall { case (a, b) => b <= a },
      s"inertia must not increase with k: $in")
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // ratio is self-consistent with the published inertias
    for (((_, _, i, Some(ratio)), (_, _, prev, _)) <- out.tail.zip(out))
      assert(math.abs(ratio - rd6(i / prev)) < 1e-9)
    // full replay for k=4: same deterministic fit, same rounding path
    val embs = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).toArray)
    val cents = graft.operators.Ann.kmeansCentroids(
      Tables.embeddings(spark, sf("sf0.001")), "embedding", nlist = 4)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val inertiaRe = embs.map { e =>
      val dmin = cents.map(c => rd6(cos(e, c))).min
      BigDecimal(rd6(dmin * dmin))
    }.sum.toDouble
    val k4 = out.find(_._1 == 4L).get
    assert(math.abs(k4._3 - rd6(inertiaRe)) < 1e-9,
      s"k=4 inertia ${k4._3} vs $inertiaRe")
    assert(k4._2 == embs.length.toLong)
  }

  test("ev_type_entropy_daily: entropy replays and respects the ln(k) bound") {
    val out = run("ev_type_entropy_daily").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    val ct = Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((day, nEvents, nTypes, h, hNorm) <- out) {
      val cs = ct(day)
      assert(nEvents == cs.sum && nTypes == cs.length.toLong)
      val hRe = rd6(-cs.map { c =>
        val p = c.toDouble / nEvents
        BigDecimal(rd6(p * math.log(p)))
      }.sum.toDouble)
      assert(math.abs(h - hRe) < 1e-9, s"$day H $h vs $hRe")
      assert(h >= 0.0 && h <= math.log(nTypes.toDouble) + 1e-4)
      val normRe = if (nTypes > 1) rd6(h / math.log(nTypes.toDouble)) else 0.0
      assert(math.abs(hNorm - normRe) < 1e-9)
    }
  }

  test("txt_source_jsd: divergences replay and sit inside [0, ln 2]") {
    val out = run("txt_source_jsd").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, _, _) => a < b })
    for ((_, _, _, j) <- out) assert(j >= 0.0 && j <= math.log(2.0) + 1e-6)
    // full replay of one pair from driver-side counts
    val (sa, sb, nTok, jsd) = out.head
    val rows = Tables.documentsSpread(spark, sf("sf0.001"))
      .filter(col("source").isin(sa, sb))
      .select(col("source"), graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val cnt = rows.flatMap { case (s0, ts) => ts.map((s0, _)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocabA = cnt.keys.filter(_._1 == sa).map(_._2).toSet
    val vocabB = cnt.keys.filter(_._1 == sb).map(_._2).toSet
    val vocab = vocabA ++ vocabB
    assert(nTok == vocab.size.toLong, s"pair vocab $nTok vs ${vocab.size}")
    val na = cnt.collect { case ((s0, _), c) if s0 == sa => c }.sum.toDouble
    val nb = cnt.collect { case ((s0, _), c) if s0 == sb => c }.sum.toDouble
    def rd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rd8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    // terms round at 8 (the query's boundary-hardened channel); final at 6
    def term(c: Long, n: Double, cO: Long, nO: Double): BigDecimal =
      if (c > 0) {
        val p = c / n; val q = cO / nO
        BigDecimal(rd8(p * math.log(2.0 * p / (p + q))))
      } else BigDecimal(0)
    val suma = vocab.toSeq.map(t =>
      term(cnt.getOrElse((sa, t), 0L), na, cnt.getOrElse((sb, t), 0L), nb)).sum
    val sumb = vocab.toSeq.map(t =>
      term(cnt.getOrElse((sb, t), 0L), nb, cnt.getOrElse((sa, t), 0L), na)).sum
    val jsdRe = rd6(0.5 * (suma.toDouble + sumb.toDouble))
    assert(math.abs(jsd - jsdRe) < 1e-9, s"jsd $jsd vs $jsdRe")
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

  test("graph_betweenness_approx: exact driver replay of 12-source k-capped Brandes") {
    val dir = sf("sf0.001")
    val out = run("graph_betweenness_approx").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(out.length == 25)
    val bs = out.map(_._2).toSeq
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b })
    val edges = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir).filter(col("l_quantity") > 45),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val srcs = ids.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(12)
    def rd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // one textbook Brandes sweep per sampled source, with the SAME
    // per-term round-at-6 the engine and the oracle share
    val dep = collection.mutable.Map.empty[Long, BigDecimal]
      .withDefaultValue(BigDecimal(0))
    for (s0 <- srcs) {
      var d = Map(s0 -> 0)
      for (k <- 1 to 4) {
        val next = d.filter(_._2 == k - 1).keys
          .flatMap(u => adj.getOrElse(u, Set.empty[Long]))
          .filterNot(d.contains).map(_ -> k)
        d = d ++ next
      }
      val sig = collection.mutable.Map(s0 -> 1L)
      for (l <- 1 to 4; v <- d.filter(_._2 == l).keys) {
        val preds = adj.collect {
          case (u, ns) if ns.contains(v) && d.get(u).contains(l - 1) => u
        }
        sig(v) = preds.map(sig).sum
      }
      val dlt = collection.mutable.Map.empty[Long, BigDecimal]
        .withDefaultValue(BigDecimal(0))
      for (l <- 3 to 1 by -1; v <- d.filter(_._2 == l).keys) {
        val succs = adj.getOrElse(v, Set.empty[Long])
          .filter(w => d.get(w).contains(l + 1))
        dlt(v) = succs.toSeq.map { w =>
          rd6(sig(v).toDouble / sig(w).toDouble * (1.0 + dlt(w).toDouble))
        }.sum
      }
      for ((v, x) <- dlt if v != s0) dep(v) = dep(v) + x
    }
    val want = ids.map { case (id, name) =>
      name -> rd6(dep(id).toDouble *
        (ids.length.toDouble / srcs.length.toDouble)).toDouble
    }.toMap
    for ((nation, b) <- out)
      assert(math.abs(b - want(nation)) < 1e-9,
        s"$nation: engine $b vs driver replay ${want(nation)}")
    // the sampled-source estimator found actual brokers on this graph
    assert(out.map(_._2).max > 0.0, "every betweenness is zero")
  }

  test("graph_clustering_coefficient: exact driver replay of triangles, degrees, ratios") {
    val dir = sf("sf0.001")
    val out = run("graph_clustering_coefficient").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length == 25)
    val edges = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).as("src"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("dst"))
      .distinct().collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toSet
    val names = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getString(1), r.getLong(0))).toMap
    val nbrs = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).toSet }
    val triOf = nbrs.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count {
        case Seq(a, b) => edges.contains((a min b, a max b)); case _ => false
      }.toLong
    }
    val tTotal = triOf.values.sum / 3
    val wedges = nbrs.values.map(ns => ns.size.toLong * (ns.size - 1) / 2).sum
    val transRe = if (wedges > 0) (3 * tTotal * 1000000L / wedges).toDouble / 1e6 else 0.0
    for ((nation, deg, tri, lcc, trans) <- out) {
      val v = names(nation)
      val d = nbrs.get(v).map(_.size.toLong).getOrElse(0L)
      assert(deg == d, s"$nation degree $deg vs $d")
      assert(tri == triOf.getOrElse(v, 0L), s"$nation triangles")
      val want = if (d >= 2) (2 * tri * 1000000L / (d * (d - 1))).toDouble / 1e6 else 0.0
      assert(lcc == want, s"$nation lcc $lcc vs $want")
      assert(trans == transRe, s"transitivity $trans vs $transRe")
    }
  }

  test("stat_kruskal_wallis: H replays from driver-side doubled midranks") {
    val r = run("stat_kruskal_wallis").collect().head
    val (k, n, h, hc) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val rows = Tables.events(spark, sf("sf0.001"))
      .select((col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long").as("vc"), col("event_type"))
      .collect().map(rr => (rr.getLong(0), rr.getString(1)))
    assert(n == rows.length && k == rows.map(_._2).distinct.length)
    // doubled midranks over the sorted distinct value grid
    val grid = rows.groupBy(_._1).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    var below = 0L
    val r2 = grid.map { case (vc, t) =>
      val rr2 = 2 * below + t + 1; below += t; vc -> rr2 }.toMap
    val byG = rows.groupBy(_._2).view.mapValues { vs =>
      (vs.length.toLong, vs.map(v => r2(v._1)).sum) }.toSeq.sortBy(_._1)
    // ordered fold in the same event_type order as the engines
    var a4 = 0.0
    byG.foreach { case (_, (ng, r2g)) =>
      a4 += r2g.toDouble * r2g.toDouble / ng.toDouble }
    val nD = n.toDouble
    val hRe = 3.0 * a4 / (nD * (nD + 1.0)) - 3.0 * (nD + 1.0)
    val tie3 = grid.map { case (_, t) => BigInt(t) * t * t - t }.sum
    val corr = 1.0 - tie3.toDouble / (nD * nD * nD - nD)
    def rd4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(h - rd4(hRe)) < 1e-9, s"H $h vs $hRe")
    assert(math.abs(hc - rd4(hRe / corr)) < 1e-9, s"H' $hc vs ${hRe / corr}")
    assert(hc >= h, "tie correction must not shrink H (C <= 1)")
  }

  test("txt_heaps_law: beta recomposes from per-source token/type counts") {
    val r = run("txt_heaps_law").collect().head
    val (k, beta, logk, r2v) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r2v >= 0.0 && r2v <= 1.0)
    val per = Tables.documentsSpread(spark, sf("sf0.001"))
      .select(col("source"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nt"), countDistinct(col("t")).as("ny"))
      .collect().map(rr => (rr.getLong(1), rr.getLong(2)))
    assert(k == per.length)
    def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pts = per.map { case (nt, ny) =>
      (rd(math.log(nt.toDouble)), rd(math.log(ny.toDouble))) }
    val kk = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map { case (x, y) => rd(x.toDouble * y.toDouble) }.sum.toDouble
    val sxx = pts.map { case (x, _) => rd(x.toDouble * x.toDouble) }.sum.toDouble
    val betaRe = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    assert(math.abs(beta - rd(betaRe).toDouble) < 1e-9, s"$beta vs $betaRe")
    assert(math.abs(logk - rd((sy - betaRe * sx) / kk).toDouble) < 1e-9)
  }

  test("txt_textrank_keywords: exact driver replay of the integer PageRank") {
    val dir = sf("sf0.001")
    val out = run("txt_textrank_keywords").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty && out.length <= 25)
    // rebuild the capped-vocab co-occurrence graph with the engine's tokenizer
    val toks = Tables.documentsSpread(spark, dir)
      .select(graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0))
    val vocab = toks.flatten.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(50).map(_._1).toSet
    val pairs = toks.flatMap(ts => ts.zip(ts.tail))
      .filter { case (a, b) => a != b && vocab(a) && vocab(b) }
    val und = (pairs ++ pairs.map(_.swap)).groupBy(identity)
      .map { case ((a, b), ps) => (a, b, ps.length.toLong) }.toSeq
    val totw = und.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nV = vocab.size.toLong
    var rank = vocab.map(_ -> 1000000000000L / nV).toMap
    val teleport = 150000000000L / nV
    for (_ <- 1 to 3) {
      val in = und.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        (rank(s) * 85 / 100) * w / totw(s) }.sum).toMap
      rank = vocab.map(v => v -> (teleport + in.getOrElse(v, 0L))).toMap
    }
    val want = rank.toSeq.sortBy { case (t, rr) => (-rr, t) }.take(25)
    assert(out.toSeq == want, s"engine ${out.take(3).toSeq} vs replay ${want.take(3)}")
  }

  test("ml_frequent_triples: exact driver replay of the a-priori level-3 scan") {
    val out = run("ml_frequent_triples").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val baskets = Tables.lineitem(spark, sf("sf0.001"))
      .join(Tables.part(spark, sf("sf0.001")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    val sup = collection.mutable.Map.empty[(String, String, String), Long]
      .withDefaultValue(0L)
    baskets.values.foreach { items =>
      items.combinations(3).foreach {
        case Seq(a, b, c) => sup((a, b, c)) += 1
        case _ =>
      }
    }
    val freq = sup.filter(_._2 >= 2)
    val top = freq.toSeq.sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(25)
    assert(out.length == math.min(25, freq.size))
    out.zip(top).foreach { case ((a, b, c, s, nf), ((wa, wb, wc), ws)) =>
      assert((a, b, c, s) == (wa, wb, wc, ws), s"engine ($a,$b,$c,$s) vs ($wa,$wb,$wc,$ws)")
      assert(nf == freq.size.toLong, s"n_frequent $nf vs ${freq.size}")
    }
  }

  test("vec_centroid_drift: halves partition each label; drift in [0,2] and replays") {
    val dir = sf("sf0.001")
    val out = run("vec_centroid_drift").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rows = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val byLabel = rows.groupBy(_._2)
    assert(out.map(_._1).toSet == byLabel.keySet.filter { l =>
      byLabel(l).exists(_._1 % 2 == 0) && byLabel(l).exists(_._1 % 2 == 1) })
    def centroid(vs: Array[Array[Float]]): Array[Double] = {
      val dim = vs.head.length
      (0 until dim).map { i =>
        // the engine's exact channel: DECIMAL(38,12) sum cast double,
        // THEN one double division (not exact decimal division)
        val s = vs.map(v => BigDecimal(v(i).toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        s.toDouble / vs.length
      }.toArray
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((label, nRef, nCur, drift) <- out) {
      val (ref, cur) = byLabel(label).partition(_._1 % 2 == 0)
      assert(nRef == ref.length && nCur == cur.length, s"label $label halves")
      assert(drift >= 0.0 && drift <= 2.0)
      val want = BigDecimal(cos(centroid(ref.map(_._3)), centroid(cur.map(_._3))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(drift - want) < 2e-6, s"label $label drift $drift vs $want")
    }
  }

  test("txt_code_detect: feature sums replay from a driver regex pass") {
    val out = run("txt_code_detect").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val docs = Tables.documentsSpread(spark, sf("sf0.001"))
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sym = "[{}();=<>\\[\\]]".r
    val dig = "[0-9]".r
    val per = docs.groupBy(_._1).view.mapValues { ds =>
      val feats = ds.map { case (_, text) =>
        val norm = text.trim.replaceAll("\\s+", " ").toLowerCase
        val s = sym.findAllIn(norm).length.toLong
        val d = dig.findAllIn(norm).length.toLong
        val len = norm.length.toLong
        (len, s, d, if (s * 1000000L > 30000L * len) 1L else 0L)
      }
      (feats.length.toLong, feats.map(_._4).sum, feats.map(_._2).sum,
        feats.map(_._3).sum, feats.map(_._1).sum)
    }.toMap
    assert(out.length == per.size)
    for ((source, nDocs, nCode, codeRate, symShare, digShare) <- out) {
      val (wd, wc, ws, wg, wl) = per(source)
      assert(nDocs == wd && nCode == wc, s"$source counts")
      assert(codeRate == (wc * 1000000L / wd).toDouble / 1e6)
      assert(symShare == (ws * 1000000L / wl).toDouble / 1e6, s"$source sym")
      assert(digShare == (wg * 1000000L / wl).toDouble / 1e6, s"$source dig")
    }
    // the synthetic prose corpus must not read as code
    assert(out.map(_._3).max <= 0.05, "prose fixture flagged as code")
  }

  test("dq_pk_uniqueness: audits replay for a keyed table and flag injected dupes") {
    val out = run("dq_pk_uniqueness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.length == 8 && out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
    // replay one table exactly
    val keys = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val o = out.find(_._1 == "orders").get
    assert(o._2 == keys.length && o._3 == keys.distinct.length &&
      o._4 == keys.length - keys.distinct.length)
    assert(o._5 == keys.min && o._6 == keys.max)
    assert(o._7 == (keys.distinct.length.toLong * 1000000L /
      (keys.max - keys.min + 1)).toDouble / 1e6)
    // fixtures carry no duplicate keys — the expected-green contract
    assert(out.forall(_._4 == 0L), "fixture has duplicate primary keys")
  }

  test("stat_ljung_box: Q recomposes from stat_acf_daily's rho and the day counts") {
    val q = run("stat_ljung_box").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val acf = run("stat_acf_daily").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3)))
      .groupBy(_._1)
    def rd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    for ((t, nDays, nLags, qStat) <- q) {
      val rhos = acf(t).sortBy(_._2)
      assert(nLags == rhos.length)
      val s = rhos.map { case (_, k, rho) =>
        rd6(rho * rho / (nDays - k).toDouble) }.sum
      val want = rd6(nDays.toDouble * (nDays.toDouble + 2.0) * s.toDouble).toDouble
      assert(math.abs(qStat - want) < 1e-9, s"$t Q $qStat vs $want")
      assert(qStat >= 0.0)
    }
  }

  test("vec_norm_profile: stats replay from left-to-right driver norms") {
    val out = run("vec_norm_profile").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val rows = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def rd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      math.sqrt(s)
    }
    val byLabel = rows.groupBy(_._1)
    assert(out.map(_._1).toSet == byLabel.keySet)
    for ((label, n, mean, mn, mx) <- out) {
      val ns = byLabel(label).map(v => rd6(norm(v._2)))
      assert(n == ns.length)
      assert(mn == ns.min.toDouble && mx == ns.max.toDouble, s"label $label extrema")
      assert(math.abs(mean - rd6(ns.sum.toDouble / ns.length).toDouble) < 1e-9)
    }
  }

  test("sql_grouping_sets: two independent summaries + grand total partition the fact") {
    val out = run("sql_grouping_sets").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val total = Tables.lineitem(spark, sf("sf0.001")).count()
    // grand total row: both keys ALL, both grouping flags set
    val grand = out.filter(t => t._3 == 1 && t._4 == 1)
    assert(grand.length == 1 && grand.head._1 == "ALL" && grand.head._2 == "ALL")
    assert(grand.head._6 == total)
    // each one-dimension summary partitions the fact table
    val byFlag = out.filter(t => t._3 == 0 && t._4 == 1)
    val byStatus = out.filter(t => t._3 == 1 && t._4 == 0)
    assert(byFlag.map(_._6).sum == total && byStatus.map(_._6).sum == total)
    // grouping flags, not string placeholders, carry the semantics:
    // a grouped-out dimension always presents ALL
    assert(byFlag.forall(_._2 == "ALL") && byStatus.forall(_._1 == "ALL"))
    // no (flag, status) two-dimension rows in this set spec
    assert(out.forall(t => t._3 + t._4 >= 1))
  }

  test("ev_retention_halflife: halflife recomposes and retention decays") {
    val r = run("ev_retention_halflife").collect().head
    val (k, decay, halflife, r2v) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(k >= 3 && k <= 14, s"offsets $k")
    assert(r2v >= 0.0 && r2v <= 1.0)
    val want = BigDecimal(-math.log(2.0) / decay)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the engine derives halflife from the UNROUNDED slope; recomposing
    // from the round-6 PRESENTED slope can differ by up to the slope
    // grain amplified by d(ln2/s)/ds = ln2/s² — tolerance scales with it
    val tol = math.log(2.0) * 5e-7 / (decay * decay) + 1e-3
    assert(math.abs(halflife - want) <= tol, s"halflife $halflife vs $want (tol $tol)")
    // sign contract: decaying retention → positive half-life; the flat
    // synthetic fixture fits a slightly POSITIVE slope, which must read
    // as a negative half-life (a flagged non-decaying series), never as
    // a plausible-looking positive number
    assert(decay != 0.0 && (halflife > 0) == (decay < 0),
      s"sign mismatch: slope $decay, halflife $halflife")
  }

  test("graph_modularity: exact BigInt replay over the engine's own LPA labels") {
    val dir = sf("sf0.001")
    val r = run("graph_modularity").collect().head
    val (nComm, mEdges, q) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(q >= -0.5 && q <= 1.0, s"modularity out of range: $q")
    val labels = graft.queries.StatQueries.lpaFinalLabels(spark, dir)
      .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toMap
    val edges = graft.queries.StatQueries.coPurchaseEdges(spark, dir, 2)
      .select(col("src"), col("dst")).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1)))
    val m = edges.length.toLong
    assert(mEdges == m)
    val comms = labels.values.toSet
    assert(nComm == comms.size.toLong)
    val eIn = edges.filter { case (a, b) => labels(a) == labels(b) }
      .groupBy(c => labels(c._1)).view.mapValues(_.length.toLong).toMap
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val aI = labels.toSeq.groupBy(_._2).view
      .mapValues(_.map(v => deg.getOrElse(v._1, 0L)).sum).toMap
    val qScaled = comms.toSeq.map { c =>
      BigInt(4) * BigInt(m) * BigInt(eIn.getOrElse(c, 0L)) -
        BigInt(aI(c)) * BigInt(aI(c))
    }.foldLeft(BigInt(0))(_ + _)
    val want = ((qScaled * 1000000) / (BigInt(4) * m * m)).toLong.toDouble / 1e6
    assert(q == want, s"modularity $q vs replay $want")
  }

  test("stat_tukey_hsd: q statistics recompose from independent group stats") {
    val out = run("stat_tukey_hsd").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.length == 10) // C(5,2) priority pairs
    val g = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderpriority").as("grp"),
        expr("floor(o_totalprice) div 100").as("x"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cn"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"))
      .collect().map(r2 => (r2.getString(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)))
    val n = g.map(_._2).sum
    val k = g.length
    val aGroups = g.map { case (_, cn, sx, _) =>
      (BigInt(sx) * sx * 100 / cn).toLong }.sum.toDouble / 100.0
    val msw = (g.map(_._4).sum.toDouble - aGroups) / (n - k).toDouble
    val stats = g.map(t => t._1 -> (t._2, t._3)).toMap
    def rd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((ga, gb, na, nb, diff, qs) <- out) {
      val (wna, sxa) = stats(ga); val (wnb, sxb) = stats(gb)
      assert(na == wna && nb == wnb)
      val d = sxa.toDouble / wna - sxb.toDouble / wnb
      assert(math.abs(diff - rd6(d)) < 1e-9)
      val want = rd6(math.abs(d) / math.sqrt(msw / 2.0 * (1.0 / wna + 1.0 / wnb)))
      assert(math.abs(qs - want) < 1e-9, s"$ga/$gb q $qs vs $want")
      assert(qs >= 0)
    }
  }

  test("stat_cramers_v: V recomposes from its chi2 and agrees with the chi2 gate") {
    val r = run("stat_cramers_v").collect().head
    val (n, minDim, chi2, v) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(v >= 0.0 && v <= 1.0)
    val want = BigDecimal(math.sqrt(chi2 / (n.toDouble * minDim.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(v == want, s"V $v vs $want")
    // same contingency machinery: chi2 must equal the chi2 gate's statistic
    val c = run("stat_chi2_independence").collect().head
    assert(c.getLong(0) == n && math.abs(c.getDouble(2) - chi2) < 1e-9)
  }

  test("dq_hash_balance: buckets replay from a driver md5 pass") {
    val r = run("dq_hash_balance").collect().head
    val (nb, n, mn, mx, skew, chi2) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
    val keys = Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey")).collect().map(_.getLong(0))
    def b(k: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(md5, 16) % 32
    }
    val counts = keys.map(b).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(nb == counts.size && n == keys.length)
    assert(mn == counts.values.min && mx == counts.values.max)
    assert(skew == (mx * nb * 1000000L / n).toDouble / 1e6)
    val so2 = counts.values.map(o => BigInt(o) * o).sum
    val want = ((BigInt(nb) * so2 - BigInt(n) * n) * 1000000 / n).toLong.toDouble / 1e6
    assert(chi2 == want, s"chi2 $chi2 vs $want")
  }

  test("ev_interarrival_poisson: gap statistics replay from a driver pass") {
    val out = run("ev_interarrival_poisson").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val rows = Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), col("ts").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def rd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.map(_._1).toSet == byType.keySet.filter(byType(_).length >= 2))
    for ((t, nGaps, mean, cv) <- out) {
      val secs = byType(t)
      val gaps = secs.zip(secs.tail).map { case (a, bb) => bb - a }
      assert(nGaps == gaps.length)
      val sg = gaps.sum.toDouble; val n = gaps.length.toDouble
      val sg2 = gaps.map(g => g * g).sum.toDouble
      assert(mean == rd6(sg / n), s"$t mean")
      val wantCv = rd6(math.sqrt(math.max(0.0, sg2 / n - (sg / n) * (sg / n))) / (sg / n))
      assert(cv == wantCv, s"$t cv $cv vs $wantCv")
      assert(cv >= 0)
    }
  }

  test("ml_best_f1_threshold: the argmax replays over every threshold exactly") {
    val r = run("ml_best_f1_threshold").collect().head
    val (thr, tp, fp, fn, f1) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val rows = Tables.lineitem(spark, sf("sf0.001"))
      .select((col("l_discount").cast(org.apache.spark.sql.types.DecimalType(4, 2)) * 100)
        .cast("long"), (col("l_returnflag") === "R").cast("int"))
      .collect().map(rr => (rr.getLong(0), rr.getInt(1)))
    val pAll = rows.map(_._2.toLong).sum
    val thresholds = rows.map(_._1).distinct.sorted
    val best = thresholds.map { t =>
      val sel = rows.filter(_._1 >= t)
      val wtp = sel.map(_._2.toLong).sum
      val wfp = sel.length - wtp
      val wfn = pAll - wtp
      (t, wtp, wfp, wfn, 2 * wtp * 1000000L / (2 * wtp + wfp + wfn))
    }.minBy { case (t, _, _, _, f) => (-f, t) }
    assert((thr, tp, fp, fn) == ((best._1, best._2, best._3, best._4)),
      s"engine ($thr,$tp,$fp,$fn) vs replay $best")
    assert(f1 == best._5.toDouble / 1e6)
    // the chosen point beats or ties every other threshold's exact F1
    assert(best._5 == thresholds.map { t =>
      val sel = rows.filter(_._1 >= t); val wtp = sel.map(_._2.toLong).sum
      2 * wtp * 1000000L / (2 * wtp + (sel.length - wtp) + (pAll - wtp))
    }.max)
  }

  test("vec_quantization_error: per-label MSE replays; int8 error is small but nonzero") {
    val out = run("vec_quantization_error").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val rows = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def rd12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val byLabel = rows.groupBy(_._1)
    assert(out.map(_._1).toSet == byLabel.keySet)
    for ((label, nElems, mse) <- out) {
      val vs = byLabel(label).map(_._2)
      assert(nElems == vs.map(_.length.toLong).sum)
      val terms = vs.flatMap { v =>
        val amax = v.map(x => math.abs(x.toDouble)).max
        v.map { x =>
          val xd = x.toDouble
          // HALF_UP like the engines' round(), not Math.round (which
          // rounds negative .5 toward +inf)
          val q = if (amax == 0.0) 0
            else BigDecimal(xd / amax * 127.0)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
          val err = xd - q.toDouble * amax / 127.0
          rd12(err * err)
        }
      }
      val want = rd12(terms.sum.toDouble / nElems).toDouble
      assert(math.abs(mse - want) < 1e-12, s"label $label mse $mse vs $want")
      assert(mse > 0 && mse < 1e-2, s"label $label mse out of int8 band: $mse")
    }
  }

  test("ml_mcc: confusion matrix and coefficient replay from brute-force counts") {
    val out = run("ml_mcc").collect()(0)
    val (tp, fp, tn, fn) = (out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2) == "en"))
    val pred = docs.filter(_._1 % 3 != 0).groupBy(_._2)
      .map { case (s, g) => s -> (2L * g.count(_._3) > g.length) }
    val test = docs.filter(_._1 % 3 == 0).filter(d => pred.contains(d._2))
    assert(tp == test.count(d => d._3 && pred(d._2)))
    assert(fp == test.count(d => !d._3 && pred(d._2)))
    assert(tn == test.count(d => !d._3 && !pred(d._2)))
    assert(fn == test.count(d => d._3 && !pred(d._2)))
    val want = BigDecimal((tp * tn - fp * fn).toDouble /
      math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
        (tn + fp).toDouble * (tn + fn).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(5) == want, s"mcc ${out.getDouble(5)} vs replay $want")
    // the detector must be better than chance on this fixture
    assert(out.getDouble(5) > 0.0)
  }

  test("dq_id_gaps: two-level bucketed gap set equals the flat per-source driver lag") {
    val out = run("dq_id_gaps").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val rows = Tables.documents(spark, sf("sf0.001"))
      .select(col("source"), col("doc_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val gaps = bySrc.toSeq.flatMap { case (src, ks) =>
      ks.sliding(2).collect {
        case Array(a, b) if b - a > 1 => (src, a, b, b - a - 1)
      }
    }
    val want = gaps.sortBy { case (s, p, _, len) => (-len, s, p) }.take(10)
    assert(out.map(t => (t._1, t._3, t._4, t._5)).toSeq == want,
      s"top gaps ${out.toSeq} vs driver $want")
    assert(out.forall(t => t._2 == bySrc(t._1).length))
    assert(out.nonEmpty, "interleaved sources are gapped by construction")
  }

  test("stat_mann_kendall: S, tie-corrected variance and Z replay from the brute-force pair scan") {
    val out = run("stat_mann_kendall").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(38,6)")).cast("decimal(38,2)") * 100)
        .cast("long").as("yc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((et, nDays, sStat, z) <- out) {
      val ys = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      assert(nDays == ys.length)
      val s = (for (i <- ys.indices; j <- i + 1 until ys.length)
        yield java.lang.Long.signum(ys(j) - ys(i)).toLong).sum
      assert(s == sStat, s"$et: S $sStat vs brute $s")
      val n = ys.length.toLong
      val tie = ys.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie
      val want = if (s == 0) 0.0
        else BigDecimal((s.toDouble - (if (s > 0) 1.0 else -1.0)) /
          math.sqrt(var18.toDouble / 18.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(z - want) <= 1e-6, s"$et: z $z vs brute $want")
    }
  }

  test("stat_welch_anova: F and df2 replay from brute-force group stats") {
    val out = run("stat_welch_anova").collect()(0)
    val xs = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderpriority"), expr("floor(o_totalprice) div 100").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = xs.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
      val n = g.length.toDouble
      val sx = g.map(_._2).sum.toDouble
      val sx2 = g.map(v => v._2 * v._2).sum.toDouble
      (n, sx / n, (sx2 - sx * sx / n) / (n - 1.0))
    }
    val k = groups.length.toDouble
    val ws = groups.map { case (n, _, v) => n / v }
    val sw = ws.sum
    val xw = groups.zip(ws).map { case ((_, xb, _), w) => w * xb }.sum / sw
    val sa = groups.zip(ws).map { case ((_, xb, _), w) => w * (xb - xw) * (xb - xw) }.sum
    val sb = groups.zip(ws).map { case ((n, _, _), w) =>
      (1.0 - w / sw) * (1.0 - w / sw) / (n - 1.0) }.sum
    def rd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val f = rd6((sa / (k - 1.0)) / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * sb))
    val df2 = rd6((k * k - 1.0) / (3.0 * sb))
    assert(out.getLong(0) == groups.length && out.getLong(1) == xs.length)
    assert(math.abs(out.getDouble(2) - f) <= 1e-6, s"F ${out.getDouble(2)} vs $f")
    assert(math.abs(out.getDouble(3) - df2) <= 1e-6, s"df2 ${out.getDouble(3)} vs $df2")
    assert(out.getDouble(3) > k - 1.0, "Welch df2 must exceed k-1 on real groups")
  }

  test("stat_cochran_armitage: z replays from brute-force group counts") {
    val out = run("stat_cochran_armitage").collect()(0)
    val (k, n, r, z) = (out.getLong(0), out.getLong(1), out.getLong(2), out.getDouble(3))
    val rows = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderpriority"), col("o_orderstatus")).collect()
      .map(x => (x.getString(0).substring(0, 1).toLong, x.getString(1) == "F"))
    val byT = rows.groupBy(_._1).view.mapValues(g => (g.length.toLong, g.count(_._2).toLong)).toMap
    assert(k == byT.size && n == rows.length && r == rows.count(_._2))
    val str = byT.map { case (t, (_, ri)) => t * ri }.sum.toDouble
    val stn = byT.map { case (t, (ni, _)) => t * ni }.sum.toDouble
    val snt2 = byT.map { case (t, (ni, _)) => t * t * ni }.sum.toDouble
    val p = r.toDouble / n.toDouble
    val want = BigDecimal((str - p * stn) /
      math.sqrt(p * (1.0 - p) * (snt2 - stn * stn / n.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(z - want) <= 1e-6, s"z $z vs replay $want")
    // the fixture's proportions genuinely vary: z is a real, finite signal
    assert(!z.isNaN && !z.isInfinite)
  }

  test("graph_louvain_refine: driver replay — each move is the argmax positive gain, Q strictly increases exactly") {
    // sf0.01: the sf0.001 graph's LPA partition is already locally
    // optimal (0 moves — verified as an empty-but-matching oracle row
    // set), so the replay runs where moves exist
    val dir = sf("sf0.01")
    val out = Queries.queriesMap("graph_louvain_refine")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty, "expected at least one applied move at sf0.01")
    assert(out.map(_._1).toSeq == (1L to out.length.toLong), "passes must be consecutive from 1")

    val edges = graft.queries.StatQueries.coPurchaseEdges(spark, dir, 2)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = scala.collection.mutable.Map(
      graft.queries.StatQueries.lpaFinalLabels(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)): _*)
    val m = edges.length.toLong
    val nbrs = (edges.map(e => e._1 -> e._2) ++ edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2) }
    val deg = nbrs.map { case (v, ns) => v -> ns.length.toLong }
    val dd = BigInt(4) * BigInt(m) * BigInt(m)
    def qScaled(): BigInt = {
      val eIn = edges.count(e => labels(e._1) == labels(e._2))
      val aByC = deg.toSeq.groupBy { case (v, _) => labels(v) }
        .map { case (c, ds) => c -> ds.map(_._2).sum }
      // textbook Q·4m² = Σ_c (4m·e_cc − a_c²); communities with no
      // intra edges still contribute −a_c²
      aByC.map { case (c, a) =>
        BigInt(4) * m * edges.count(e => labels(e._1) == c && labels(e._2) == c) -
          BigInt(a) * BigInt(a)
      }.sum
    }
    var q = qScaled()
    for ((pass, node, fromC, toC, gain, qAfter) <- out) {
      // independent candidate scan: every (node, neighbor community)
      // gain from the textbook formula over the driver adjacency
      val cands = nbrs.keys.toSeq.flatMap { v =>
        val a = labels(v)
        val kBy = nbrs(v).groupBy(labels).map { case (c, xs) => c -> xs.length.toLong }
        val aByC = deg.toSeq.groupBy { case (u, _) => labels(u) }
          .map { case (c, ds) => c -> ds.map(_._2).sum }
        kBy.keys.filter(_ != a).map { b =>
          val g = BigInt(4) * m * (kBy(b) - kBy.getOrElse(a, 0L)) -
            BigInt(2) * deg(v) * (aByC(b) - aByC(a) + deg(v))
          (v, a, b, g)
        }
      }.filter(_._4 > 0)
      assert(cands.nonEmpty, s"pass $pass: engine moved but driver finds no positive gain")
      val best = cands.minBy { case (v, _, b, g) => (-g, v, b) }
      assert((best._1, best._2, best._3, best._4) == (node, fromC, toC, BigInt(gain)),
        s"pass $pass: engine move ($node, $fromC -> $toC, $gain) != driver argmax $best")
      assert(gain > 0, s"pass $pass: applied gain must be strictly positive")
      labels(node) = toC
      val qFresh = qScaled()
      assert(qFresh == q + gain,
        s"pass $pass: from-scratch Q ${qFresh} != incremental ${q + gain}")
      assert(qFresh > q, s"pass $pass: Q must strictly increase")
      q = qFresh
      val micro = (q * 1000000 + dd * 1000000) / dd - 1000000
      assert(qAfter == micro.toDouble / 1000000.0,
        s"pass $pass: q_after $qAfter != replayed ${micro.toDouble / 1000000.0}")
    }
  }

  /** Exact per-(day, type) daily cents mirror of StatQueries.dailyCents,
    * for the Friedman/volume-control driver replays.
    */
  private def driverDailyCents(): Map[(String, String), Long] =
    Tables.events(spark, sf("sf0.001"))
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("v"))
      .groupBy("day", "event_type")
      .agg((sum(col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 2)) * 100)
        .cast("long").as("yc"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("stat_friedman: chi2 and W replay from a textbook within-block midrank fold") {
    val out = run("stat_friedman").collect().head
    val (k, n, chi2, w) = (out.getLong(0), out.getLong(1),
      out.getDouble(2), out.getDouble(3))
    val daily = driverDailyCents()
    val types = daily.keys.map(_._2).toSet
    val complete = daily.groupBy(_._1._1).filter(_._2.size == types.size).keys.toSeq
    assert(k == types.size && n == complete.size && n > 0)
    // doubled midranks within each block
    val r2 = scala.collection.mutable.Map.empty[String, Long] // type -> Σ 2r
    var a4 = 0L
    complete.foreach { day =>
      val vals = types.toSeq.map(t => t -> daily((day, t)))
      vals.foreach { case (t, v) =>
        val below = vals.count(_._2 < v)
        val ties = vals.count(_._2 == v)
        val rr = 2L * below + ties + 1
        r2(t) = r2.getOrElse(t, 0L) + rr
        a4 += rr * rr
      }
    }
    val kk = types.size.toLong; val nn = complete.size.toLong
    val s2 = r2.values.map(r => (r - nn * (kk + 1)) * (r - nn * (kk + 1))).sum
    val denom = (a4 - nn * kk * (kk + 1) * (kk + 1)).toDouble
    val chi2Want = rd6((kk - 1).toDouble * s2.toDouble / denom)
    assert(chi2 == chi2Want, s"chi2 $chi2 != replay $chi2Want")
    assert(w == rd6(((kk - 1).toDouble * s2.toDouble / denom) /
      (nn.toDouble * (kk - 1).toDouble)), s"W $w mismatch")
  }

  test("stat_bartlett: chi2 recomposes from per-group exact sufficient statistics") {
    val out = run("stat_bartlett").collect().head
    val (k, nTot, chi2) = (out.getLong(0), out.getLong(1), out.getDouble(2))
    val g = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderpriority").as("grp"),
        expr("floor(o_totalprice) div 100").as("x"))
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sx2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(k == g.length && nTot == g.map(_._2).sum)
    def num(n: Long, sx: Long, sx2: Long) =
      sx2.toDouble - sx.toDouble * sx.toDouble / n.toDouble
    val pooledNum = g.map { case (_, n, sx, sx2) => num(n, sx, sx2) }.sum
    val sumLn = g.map { case (_, n, sx, sx2) =>
      (n - 1).toDouble * rd6(math.log(num(n, sx, sx2) / (n - 1).toDouble)) }.sum
    val sumInv = g.map { case (_, n, _, _) => 1.0 / (n - 1).toDouble }.sum
    val nk = nTot.toDouble - k.toDouble
    val m = nk * rd6(math.log(pooledNum / nk)) - sumLn
    val c = 1.0 + (sumInv - 1.0 / nk) / (3.0 * (k - 1).toDouble)
    assert(chi2 == rd6(m / c), s"chi2 $chi2 != replay ${rd6(m / c)}")
  }

  test("stat_power_mde: MDE recomposes from the arm sufficient statistics") {
    val out = run("stat_power_mde").collect().head
    val (na, nb, se, zs, mde, rel) = (out.getLong(0), out.getLong(1),
      out.getDouble(2), out.getDouble(3), out.getDouble(4), out.getDouble(5))
    assert(zs == 2.801585)
    val arms = Tables.events(spark, sf("sf0.001"))
      .select((col("user_id") % 2).as("grp"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("v"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 2))
          .cast("double").as("sv"),
        sum(col("v") * col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("sv2"))
      .collect().map(r => r.getLong(1) -> r).toMap
    def stats(grp: Long) = {
      val r = arms.collectFirst { case (_, row) if row.getLong(0) == grp => row }.get
      val n = r.getLong(1); val sv = r.getDouble(2); val sv2 = r.getDouble(3)
      (n, sv / n, (sv2 - sv * sv / n) / (n - 1))
    }
    val (n0, mean0, v0) = stats(0); val (n1, _, v1) = stats(1)
    assert(na == n0 && nb == n1)
    val seWant = math.sqrt(v0 / n0 + v1 / n1)
    assert(se == rd6(seWant))
    assert(mde == rd6((1.959964 + 0.841621) * seWant))
    assert(rel == rd6((1.959964 + 0.841621) * seWant / mean0))
    assert(mde > 0.0)
  }

  test("ev_peak_hour_profile: shares partition each type; peak is the argmax hour") {
    val out = run("ev_peak_hour_profile").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (et, rows) =>
      val total = rows.map(_._3).sum
      rows.foreach { case (_, _, n, share, _, _) =>
        assert(share == n * 1000000L / total)
      }
      val peak = rows.minBy(r => (-r._3, r._2))
      assert(rows.forall(_._5 == peak._2), s"$et: peak hour must be the argmax")
      assert(rows.count(_._6 == 1L) == 1 && peak._6 == 1L,
        s"$et: exactly the peak row flags is_peak")
    }
  }

  test("stat_cohens_d: d recomposes from the arm sufficient statistics") {
    val out = run("stat_cohens_d").collect().head
    val (na, nb, sp, d) = (out.getLong(0), out.getLong(1),
      out.getDouble(2), out.getDouble(3))
    val arms = Tables.events(spark, sf("sf0.001"))
      .select((col("user_id") % 2).as("grp"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("v"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 2))
          .cast("double").as("sv"),
        sum(col("v") * col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 4))
          .cast("double").as("sv2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val (n0, sv0, sv20) = arms(0L); val (n1, sv1, sv21) = arms(1L)
    assert(na == n0 && nb == n1)
    val num0 = sv20 - sv0 * sv0 / n0; val num1 = sv21 - sv1 * sv1 / n1
    val spWant = math.sqrt((num0 + num1) / (n0 + n1 - 2).toDouble)
    assert(sp == rd6(spWant))
    assert(d == rd6((sv1 / n1 - sv0 / n0) / spWant))
  }

  test("graph_reciprocity: ratio replays from the collected edge set") {
    val out = run("graph_reciprocity").collect().head
    val (ne, nr, rm) = (out.getLong(0), out.getLong(1), out.getLong(2))
    val edges = graft.queries.StatQueries
      .nationTradeWeighted(spark, sf("sf0.001"))
      .select("src", "dst").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .filter(e => e._1 != e._2).toSet
    assert(ne == edges.size)
    val recip = edges.count(e => edges.contains((e._2, e._1))).toLong
    assert(nr == recip)
    assert(rm == recip * 1000000L / edges.size)
    assert(nr <= ne)
  }

  test("ev_markov_stationary: iterations replay as exact truncating-division folds") {
    val out = run("ev_markov_stationary").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // transition pairs via the same (ts, event_id)-ordered window the
    // oracle-gated ev_markov_transitions pins; THIS spec replays the
    // stationary ITERATION arithmetic independently
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sf("sf0.001"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val c0 = pairs.groupBy(identity).map { case ((p, n), g) => (p, n, g.size.toLong) }
    val states = c0.map(_._1).toSet.toSeq.sorted
    val cSq = c0.filter(c => states.contains(c._2))
    val rs = cSq.groupBy(_._1).map { case (p, g) => p -> g.map(_._3).sum }
    val S = states.length
    var pi = states.zipWithIndex.map { case (st, i) =>
      st -> (1000000L / S + (if (i < (1000000L % S).toInt) 1L else 0L))
    }.toMap
    for (_ <- 1 to 3) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      cSq.foreach { case (p, n, cnt) =>
        next(n) += pi(p) * cnt / rs(p)
      }
      pi = states.map(st => st -> next(st)).toMap
    }
    assert(out == pi, s"\n$out\nvs\n$pi")
    // truncating divisions only lose mass, never create it
    assert(out.values.sum <= 1000000L)
  }

  test("graph_rich_club: phi replays from driver degrees; edge/node counts consistent") {
    val out = run("graph_rich_club").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    val edges = graft.queries.StatQueries.coPurchaseEdges(spark, sf("sf0.001"), 2)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    out.foreach { case (k, nNodes, nEdges, phi) =>
      val want = deg.count(_._2 > k).toLong
      assert(nNodes == want, s"k=$k: n_nodes $nNodes != $want")
      val we = edges.count(e => deg(e._1) > k && deg(e._2) > k).toLong
      assert(nEdges == we, s"k=$k: n_edges $nEdges != $we")
      if (nNodes >= 2)
        assert(phi.contains(BigInt(2) * nEdges * 1000000 / (BigInt(nNodes) * (nNodes - 1)) match {
          case b => b.toLong
        }), s"k=$k: phi $phi mismatch")
      else assert(phi.isEmpty)
    }
  }

  test("ml_adaboost_stumps: round-1 argmin, epsilon bound, alpha identity, ensemble accuracy replay") {
    val out = run("ml_adaboost_stumps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).sortBy(_._1)
    assert(out.length == 3)
    val cells = Tables.lineitem(spark, sf("sf0.001")).select(
        col("l_quantity").cast("long").as("x"),
        when(col("l_returnflag") === "R", 1).otherwise(-1).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val total = cells.map(_._3).sum
    // round 1: unweighted argmin replays from plain integer counts
    val thetas = cells.map(_._1).distinct.sorted
    val cand1 = thetas.flatMap { th =>
      Seq(1, -1).map { pol =>
        val err = cells.filter(c =>
          (if (c._1 <= th) pol else -pol) != c._2).map(_._3).sum
        (th, pol, rd6(err.toDouble / total.toDouble))
      }
    }
    val best1 = cand1.minBy { case (t, p, e) => (e, t, -p) }
    assert((out.head._2, out.head._3, out.head._4) == best1,
      s"round-1 stump ${(out.head._2, out.head._3, out.head._4)} != replay $best1")
    out.foreach { case (r, _, _, eps, alpha, _) =>
      // argmin over complementary polarities can never exceed chance
      assert(eps <= 0.5 + 1e-6, s"round $r eps $eps > 0.5")
      val ec = math.max(0.000001, math.min(0.999999, eps))
      assert(alpha == rd6(0.5 * math.log((1.0 - ec) / ec)),
        s"round $r alpha $alpha != identity from eps")
      assert(alpha >= 0.0)
    }
    // ensemble accuracy: score raw cells with the OUTPUT stumps
    val correct = cells.filter { c =>
      val score = out.foldLeft(0.0) { case (acc, (_, th, pol, _, a, _)) =>
        acc + a * (if (c._1 <= th) pol else -pol)
      }
      (if (score >= 0) 1 else -1) == c._2
    }.map(_._3).sum
    assert(out.head._6 == correct * 1000000L / total,
      s"acc ${out.head._6} != replay ${correct * 1000000L / total}")
  }

  test("stat_pettitt: K, changepoint, and exponent replay from a brute-force sign scan") {
    val out = run("stat_pettitt").collect().head
    val (n, cpDay, k, sig) = (out.getLong(0), out.getString(1),
      out.getLong(2), out.getLong(3))
    val series = driverDailyCents().toSeq
      .collect { case ((day, "view"), yc) => (day, yc) }.sortBy(_._1)
    assert(n == series.length)
    // brute force: U_t = Σ_{i<=t} Σ_{j>t} sign(x_j - x_i), exact
    val us = (1 until series.length).map { t =>
      val (left, right) = series.map(_._2).splitAt(t)
      val u = (for (a <- left; b <- right) yield java.lang.Long.signum(b - a).toLong).sum
      (series(t - 1)._1, u)
    }
    val kWant = us.map(u => math.abs(u._2)).max
    assert(k == kWant, s"K $k != brute-force $kWant")
    assert(cpDay == us.filter(u => math.abs(u._2) == kWant).map(_._1).min)
    val nn = BigInt(series.length)
    assert(BigInt(sig) == BigInt(6) * k * k * 1000000 / (nn * nn * nn + nn * nn))
  }

  test("ev_period_detect: the best lag is the argmax of the full per-type ACF relation") {
    val out = run("ev_period_detect").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getDouble(3)))
    assert(out.nonEmpty)
    // replay the 14-lag ACF per type from the decimated daily series
    val daily = driverDailyCents()
    val mx = daily.values.max
    val scale = (18 to 4 by -1).collectFirst {
      case p if mx >= BigInt(10).pow(p).toLong => BigInt(10).pow(p - 4).toLong
    }.getOrElse(1L)
    val types = daily.keys.map(_._2).toSet
    types.foreach { et =>
      val ys = daily.toSeq.collect { case ((d, `et`), yc) => (d, yc / scale) }
        .sortBy(_._1).map(_._2)
      val acfs = (1 to 14).flatMap { lagK =>
        val pairs = ys.drop(lagK).zip(ys.dropRight(lagK)) // (y, x = lagged)
        val nn = pairs.length.toDouble
        if (pairs.isEmpty) None
        else {
          val sy = pairs.map(_._1.toDouble).sum; val sx = pairs.map(_._2.toDouble).sum
          val syy = pairs.map(p => p._1.toDouble * p._1).sum
          val sxx = pairs.map(p => p._2.toDouble * p._2).sum
          val sxy = pairs.map(p => p._1.toDouble * p._2).sum
          val vx = nn * sxx - sx * sx; val vy = nn * syy - sy * sy
          if (vx > 0 && vy > 0)
            Some((lagK.toLong, rd6((nn * sxy - sx * sy) / math.sqrt(vx * vy))))
          else None
        }
      }
      val best = acfs.minBy { case (l, a) => (-a, l) }
      val got = out.find(_._1 == et).get
      assert((got._2, got._3) == best, s"$et: got $got want $best")
    }
  }

  test("dq_volume_control: ewma, sigma, and flags replay from a driver fold") {
    val rows = run("dq_volume_control").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf("sf0.001"))
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val deltas = daily.sliding(2).collect { case Array((_, a), (_, b)) => b - a }.toSeq
    val nd = deltas.length.toDouble
    val sigma = math.sqrt((deltas.map(d => d.toDouble * d).sum -
      deltas.map(_.toDouble).sum * deltas.map(_.toDouble).sum / nd) / (nd - 1.0))
    // only days with a full 6-day history score
    assert(rows.length == daily.length - 6)
    rows.foreach { case (day, c, ewma, dev, sg, flag) =>
      val i = daily.indexWhere(_._1 == day)
      assert(i >= 6)
      assert(c == daily(i)._2)
      val numer = 32L * daily(i - 1)._2 + 16L * daily(i - 2)._2 +
        8L * daily(i - 3)._2 + 4L * daily(i - 4)._2 +
        2L * daily(i - 5)._2 + daily(i - 6)._2
      val e = numer.toDouble / 63.0
      assert(ewma == rd6(e), s"$day: ewma $ewma != ${rd6(e)}")
      assert(dev == rd6(c.toDouble - e))
      assert(sg == rd6(sigma))
      val want = if (rd6(math.abs(c.toDouble - e)) > rd6(3.0 * sigma)) 1L else 0L
      assert(flag == want, s"$day: flag $flag != $want")
    }
  }

  // ------------------------------------------------------------------
  // Round-17 additions
  // ------------------------------------------------------------------

  /** Daily exact-cents totals per event type, driver-side. */
  private def dailyCentsMap(): Map[(String, String), Long] =
    Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(38,6)")).cast("decimal(38,2)") * 100)
        .cast("long").as("yc"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap

  test("stat_wilcoxon_signed matches a brute-force driver replay") {
    val out = run("stat_wilcoxon_signed").collect()
    assert(out.length == 1)
    val r = out.head
    val daily = dailyCentsMap()
    val days = daily.keys.collect {
      case ("purchase", d) if daily.contains(("click", d)) => d
    }.toSeq.sorted
    val ds = days.map(d => daily(("purchase", d)) - daily(("click", d)))
      .filter(_ != 0L)
    val n = ds.length.toLong
    def r2(ad: Long): Long =
      2L * ds.count(x => math.abs(x) < ad) + ds.count(x => math.abs(x) == ad) + 1
    val w2 = ds.filter(_ > 0).map(d => r2(math.abs(d))).sum
    val tiesum = ds.map(math.abs).groupBy(identity).values
      .map(g => g.size.toLong).map(t => t * t * t - t).sum
    val e2w = n * (n + 1) / 2
    val v12 = 2 * n * (n + 1) * (2 * n + 1) - tiesum
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == w2)
    assert(r.getLong(2) == e2w)
    assert(r.getLong(3) == v12)
    assert(math.abs(r.getDouble(4) -
      rd6((w2 - e2w).toDouble / math.sqrt(v12.toDouble / 12.0))) < 1e-9)
  }

  test("stat_pacf_daily: Durbin-Levinson recomposes from the row's own acf values") {
    val out = run("stat_pacf_daily").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (r1, r2v, r3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(r.getDouble(4) == r1) // pacf_1 = acf_1
      val phi22 = (r2v - r1 * r1) / (1.0 - r1 * r1)
      assert(math.abs(r.getDouble(5) - rd6(phi22)) < 1e-9)
      val phi21 = r1 * (1.0 - r2v) / (1.0 - r1 * r1)
      val phi33 = (r3 - phi21 * r2v - phi22 * r1) /
        (1.0 - phi21 * r1 - phi22 * r2v)
      assert(math.abs(r.getDouble(6) - rd6(phi33)) < 1e-9)
      Seq(r.getDouble(4), r.getDouble(5), r.getDouble(6)).foreach(p =>
        assert(p >= -1.0 - 1e-6 && p <= 1.0 + 1e-6))
    }
  }

  test("stat_wilson_ci: bounds recompose from (n, k), are ordered, and stay in [0,1]") {
    run("stat_wilson_ci").collect().foreach { r =>
      val (n, k) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p == rd6(k / n))
      val z = 1.959964
      val den = 1.0 + z * z / n
      val c = (k / n + z * z / (2.0 * n)) / den
      val h = z * math.sqrt(k / n * (1.0 - k / n) / n + z * z / (4.0 * n * n)) / den
      assert(math.abs(lo - rd6(c - h)) < 1e-9 && math.abs(hi - rd6(c + h)) < 1e-9)
      assert(lo >= 0.0 && lo <= p && p <= hi && hi <= 1.0)
    }
  }

  test("stat_trimmed_mean matches a driver-side sort replay") {
    val out = run("stat_trimmed_mean").collect()
    assert(out.length == 1)
    val r = out.head
    val cents = Tables.orders(spark, sf("sf0.001"))
      .select((col("o_totalprice").cast("decimal(12,2)").cast("decimal(38,2)") * 100)
        .cast("long")).collect().map(_.getLong(0)).sorted
    val n = cents.length
    val k = n / 10
    val mid = cents.slice(k, n - k)
    assert(r.getLong(0) == n && r.getLong(1) == k)
    val lo = cents(k); val hi = cents(n - k - 1)
    assert(r.getDouble(2) == rd6(lo / 100.0) && r.getDouble(3) == rd6(hi / 100.0))
    assert(math.abs(r.getDouble(4) -
      rd6(mid.map(BigDecimal(_)).sum.toDouble / mid.length / 100.0)) < 1e-6)
    assert(math.abs(r.getDouble(5) -
      rd6((mid.map(BigDecimal(_)).sum.toDouble + k.toDouble * (lo + hi)) / n / 100.0)) < 1e-6)
  }

  test("graph_katz_centrality matches a driver-side 3-step power iteration") {
    val out = run("graph_katz_centrality").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val edges = graft.queries.StatQueries
      .nationTradeWeighted(spark, sf("sf0.001"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var x = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => x(e._1) / 4).sum
      }
      x = nodes.map(v => v -> (1000000L + inc.getOrElse(v, 0L))).toMap
    }
    assert(out == x, s"katz mismatch: $out vs $x")
  }

  test("ml_mcnemar matches a driver replay of both models' discordant counts") {
    val out = run("ml_mcnemar").collect()
    assert(out.length == 1)
    val r = out.head
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), (col("lang") === "en").as("e"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getBoolean(2)))
    val train = docs.filter(_._1 % 3 != 0)
    val predA = train.groupBy(_._2).map { case (s, g) =>
      s -> (2L * g.count(_._3) > g.length) }
    val predB = 2L * train.count(_._3) > train.length
    val test0 = docs.filter(_._1 % 3 == 0)
    val n01 = test0.count(d => (predA(d._2) == d._3) && (predB != d._3)).toLong
    val n10 = test0.count(d => (predA(d._2) != d._3) && (predB == d._3)).toLong
    assert(r.getLong(0) == test0.length.toLong)
    assert(r.getLong(1) == n01 && r.getLong(2) == n10)
    if (n01 + n10 > 0)
      assert(r.getLong(5) == (n01 - n10) * (n01 - n10) * 1000000L / (n01 + n10))
  }

  test("ml_cohens_kappa: kappa recomposes from the exact integer identity") {
    val out = run("ml_cohens_kappa").collect()
    assert(out.length == 1)
    val r = out.head
    val (n, d, sc) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(d <= n && sc <= n * n)
    if (n * n != sc)
      assert(r.getLong(3) == (n * d - sc) * 1000000L / (n * n - sc))
    // kappa of a model against ITSELF would be 1; against an independent
    // one it sits in [-1, 1] scaled by 1e6
    assert(r.getLong(3) >= -1000000L && r.getLong(3) <= 1000000L)
  }

  test("ml_feature_infogain: entropies recompose and a driver IG agrees for one feature") {
    val out = run("ml_feature_infogain").collect()
    assert(out.length == 4)
    val hY = out.map(_.getDouble(2)).distinct
    assert(hY.length == 1, "H(y) is feature-independent by construction")
    out.foreach { r =>
      assert(r.getDouble(4) == rd6(r.getDouble(2) - r.getDouble(3)))
      assert(r.getDouble(4) >= -1e-6, "information gain is non-negative")
    }
    // independent replay for linenumber (smallest domain)
    val cells = Tables.lineitem(spark, sf("sf0.001"))
      .select((col("l_returnflag") === "R").cast("int").as("y"),
        col("l_linenumber").cast("long").as("v"))
      .groupBy("v", "y").count().collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val nTot = cells.values.sum.toDouble
    def h(groups: Map[Int, Long]): Double = {
      val terms = groups.values.map { c =>
        rd6((c / nTot) * math.log(c / nTot)) }
      -BigDecimal(terms.map(BigDecimal(_)).sum.toDouble).toDouble
    }
    val hy = rd6(h(cells.groupBy(_._1._2).map { case (y, g) => y -> g.values.sum }))
    val byV = cells.groupBy(_._1._1)
    val hcond = rd6(-byV.values.flatMap { g =>
      val cv = g.values.sum.toDouble
      g.values.map(c => rd6((c / nTot) * math.log(c / cv)))
    }.map(BigDecimal(_)).sum.toDouble)
    val row = out.find(_.getString(0) == "linenumber").get
    assert(math.abs(row.getDouble(2) - hy) < 1e-6)
    assert(math.abs(row.getDouble(3) - hcond) < 1e-6)
  }

  test("sketch_hll_sliding: merged registers equal the driver max over the window") {
    // the MERGE property is the query's whole point: register-wise max
    // over the trailing window ≡ registers of the unioned key set
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    def reg(keys: Seq[Long]): Map[Long, Int] =
      keys.map { k =>
        val h = graft.functions.Md5.long48(k.toString)
        val bucket = h & 511L
        val w = h >> 9
        val rk = if (w == 0) 40 else java.lang.Long.numberOfTrailingZeros(w) + 1
        (bucket, rk)
      }.groupBy(_._1).map { case (b, g) => b -> g.map(_._2).max }
    val days = ev.map(_._1).distinct.sorted
    val lastDay = days.last
    val window = days.filter(d => d >= days(days.length - 7) && d <= lastDay)
    val merged = window.map(d => reg(ev.filter(_._1 == d).map(_._2).toSeq))
      .reduce((a, b) => (a.keySet ++ b.keySet).map(k =>
        k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap)
    val unioned = reg(ev.filter(e => window.contains(e._1)).map(_._2).toSeq.distinct)
    assert(merged == unioned, "daily-register max must equal union-of-keys registers")
    // and the gate row for the last day reports the exact trailing count
    val out = run("sketch_hll_sliding").collect()
    val last = out.maxBy(_.getString(0))
    assert(last.getLong(1) ==
      ev.filter(e => window.contains(e._1)).map(_._2).distinct.length.toLong)
  }

  test("mm_shot_boundaries matches a driver replay of the energy-jump detector") {
    val out = run("mm_shot_boundaries").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    import graft.functions.Md5
    val perLang = docs.groupBy(_._2).map { case (lang, g) =>
      val stats = g.map { case (_, _, text) =>
        val hx = Md5.hex(text)
        val h = Md5.long48(text)
        val nf = ((h >> 20) % 240 + 2).toInt
        val energies = (0 until nf).map(f => Md5.long48(s"$hx:f:$f") % 1000)
        val shots = 1 + energies.sliding(2).count(p => math.abs(p(1) - p(0)) > 700)
        val lens = {
          val bs = energies.sliding(2).map(p =>
            if (math.abs(p(1) - p(0)) > 700) 1 else 0).toSeq
          // scanLeft's seed 0 is frame 0's shot id; cumulative sums
          // assign every later frame to its shot
          val ids = bs.scanLeft(0)(_ + _)
          ids.groupBy(identity).values.map(_.size)
        }
        (nf.toLong, shots.toLong, lens.max.toLong)
      }
      lang -> ((g.length.toLong, stats.map(_._1).sum, stats.map(_._2).sum,
        stats.map(_._3).max))
    }
    perLang.foreach { case (lang, (nc, nf, ns, longest)) =>
      val got = out(lang)
      assert(got._1 == nc && got._2 == nf && got._3 == ns,
        s"$lang: ${got} vs ($nc, $nf, $ns)")
      assert(got._4 == longest, s"$lang longest: ${got._4} vs $longest")
    }
  }

  test("mm_audio_near_dup: driver fingerprint replay and pair verification") {
    import graft.functions.Md5
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fp(text: String): Option[Long] = {
      val hx = Md5.hex(text)
      val h = Md5.long48(text)
      val nw = math.min((h >> 22) % 600000 / 5000 + 1, 49L).toInt
      if (nw < 2) None
      else {
        val e = (0 until nw).map(w => Md5.long48(s"$hx:fp:$w") % 1000)
        Some((0 until nw - 1).map(w =>
          if (e(w + 1) > e(w)) 1L << w else 0L).sum)
      }
    }
    val fps = docs.flatMap { case (id, t) => fp(t).map(id -> _) }.toMap
    val out = run("mm_audio_near_dup").collect()
    assert(out.nonEmpty, "the fixture's exact-dup texts must collide")
    out.foreach { r =>
      val (a, b, ham) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b && ham <= 6)
      assert(java.lang.Long.bitCount(fps(a) ^ fps(b)) == ham,
        s"pair ($a,$b) hamming $ham disagrees with the driver fingerprints")
      // band blocking soundness: a reported pair must share a 12-bit band
      assert((0 until 4).exists(band =>
        ((fps(a) >> (band * 12)) & 4095L) == ((fps(b) >> (band * 12)) & 4095L)))
    }
  }

  test("stat_fdr_bh matches a driver replay of all 25 KS tests and the BH step-up") {
    val out = run("stat_fdr_bh").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getLong(6))).toMap
    val names = Tables.nation(spark, sf("sf0.001"))
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cust = Tables.customer(spark, sf("sf0.001"))
      .select("c_nationkey", "c_acctbal").collect()
      .map(r => (r.getInt(0), (BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong))
    val n = cust.length.toLong
    val grid = cust.map(_._2).distinct.sorted
    val byNation = cust.groupBy(_._1)
    val stats = byNation.toSeq.map { case (nat, rows) =>
      val na = rows.length.toLong
      val nb = n - na
      val cnt = rows.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
      var ca = 0L; var cg = 0L; var num = 0L
      val global = cust.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
      grid.foreach { v =>
        ca += cnt.getOrElse(v, 0L); cg += global(v)
        num = math.max(num, math.abs(ca * nb - (cg - ca) * na))
      }
      val d6 = rd6(num.toDouble / (na.toDouble * nb.toDouble))
      val ne = na.toDouble * nb.toDouble / n.toDouble
      val p6 = rd6(math.min(2.0 * math.exp(-2.0 * ne * d6 * d6), 1.0))
      (nat, na, d6, p6)
    }
    val m = stats.length
    val ranked = stats.sortBy(s => (s._4, s._1)).zipWithIndex
      .map { case ((nat, na, d6, p6), i) =>
        (nat, na, d6, p6, (i + 1).toLong, rd6((i + 1) * 0.10 / m)) }
    val kstar = ranked.filter(r => r._4 <= r._6).map(_._5).foldLeft(0L)(math.max)
    ranked.foreach { case (nat, na, d6, p6, rnk, thr) =>
      val got = out(names(nat))
      assert(got == ((na, d6, p6, rnk, thr, if (rnk <= kstar) 1L else 0L)),
        s"nation $nat: got $got want ($na,$d6,$p6,$rnk,$thr,${rnk <= kstar})")
    }
    assert(out.size == m)
  }

  test("pipeline_epoch_shuffle: heads, Σrank, and fingerprints replay; epochs differ") {
    val out = run("pipeline_epoch_shuffle").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    val ids = Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").collect().map(_.getLong(0))
    val n = ids.length.toLong
    val perEpoch = (1 to 3).map { e =>
      val ranked = ids.map(id => (graft.functions.Md5.long48(s"$e:$id"), id))
        .sorted.map(_._2)
      val fp = ranked.zipWithIndex
        .map { case (id, i) => BigInt(i + 1) * BigInt(id) }.sum
      e.toLong -> (ranked.take(5).toSeq, fp.toString)
    }.toMap
    out.foreach { case (e, rnk, docId, nDocs, sumRank, permFp) =>
      assert(nDocs == n)
      assert(sumRank == (BigInt(n) * BigInt(n + 1) / 2).toString)
      assert(permFp == perEpoch(e)._2, s"epoch $e fingerprint")
      assert(perEpoch(e)._1(rnk.toInt - 1) == docId, s"epoch $e head rank $rnk")
    }
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L) && out.length == 15)
    // the reshuffle must actually reorder: fingerprints pairwise differ
    assert(perEpoch.values.map(_._2).toSet.size == 3)
  }

  test("ml_bootstrap_acc_ci: point accuracy, CI ordering, and a weight-stream replay") {
    val r = run("ml_bootstrap_acc_ci").head()
    val (nTest, nBoot, acc, lo, hi) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(nBoot == 100L)
    assert(lo <= hi, s"CI inverted: [$lo, $hi]")
    assert(lo <= acc + 0.05 && hi >= acc - 0.05,
      s"point $acc far outside [$lo, $hi]")
    // driver replay of the point accuracy (model + test split)
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), (col("lang") === "en").as("e"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getBoolean(2)))
    val train = docs.filter(_._1 % 3 != 0)
    val pred = train.groupBy(_._2).map { case (s, g) =>
      s -> (2L * g.count(_._3) > g.length) }
    val test0 = docs.filter(_._1 % 3 == 0).filter(d => pred.contains(d._2))
    assert(nTest == test0.length.toLong)
    val ok = test0.count(d => pred(d._2) == d._3)
    assert(acc == rd6(ok.toDouble / test0.length))
    // replicate 1's accuracy via the same md5-affine Poisson stream:
    // it must land inside the reported CI's convex hull with the point
    val cuts = graft.queries.StatQueries.poissonCuts
    def w(id: Long, rrep: Int): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bacc:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h1 = java.lang.Long.parseLong(hx.substring(0, 12), 16)
      val h2 = java.lang.Long.parseLong(hx.substring(12, 24), 16)
      val u = (h1 + rrep * h2) % 281474976710656L
      cuts.indexWhere(u < _) match { case -1 => 9L; case k => k.toLong }
    }
    val num = test0.map(d => w(d._1, 1) * (if (pred(d._2) == d._3) 1L else 0L)).sum
    val den = test0.map(d => w(d._1, 1)).sum
    val b1 = rd6(num.toDouble / den.toDouble)
    assert(b1 >= lo - 0.25 && b1 <= hi + 0.25, s"replicate-1 acc $b1 vs CI [$lo,$hi]")
  }

  test("ev_forecast_mase matches a driver replay of both baselines") {
    val out = run("ev_forecast_mase").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val daily = Tables.events(spark, sf("sf0.001"))
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"),
        col("value"))
      .collect().map(r => (r.getString(1), r.getString(0), r.getDouble(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((ty, day), g) =>
        (ty, day, (g.map(x => BigDecimal(x._3).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong) }
      .toSeq
    daily.groupBy(_._1).foreach { case (ty, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      if (ys.length > 7) {
        val idx = 7 until ys.length
        val sae1 = idx.map(i => math.abs(ys(i) - ys(i - 1))).sum
        val sae7 = idx.map(i => math.abs(ys(i) - ys(i - 7))).sum
        val (n, mae1, mae7) = out(ty)
        assert(n == idx.length.toLong, s"$ty n")
        assert(mae1 == rd6(sae1.toDouble / n / 100.0), s"$ty mae1")
        assert(mae7 == rd6(sae7.toDouble / n / 100.0), s"$ty mae7")
      }
    }
    assert(out.nonEmpty)
  }

  test("txt_source_outliers matches a driver replay of the hashed-TF cosine") {
    val out = run("txt_source_outliers").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.trim.replaceAll("\\s+", " ")
        .split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)
    val tf = docs.map { case (id, src, t) =>
      (id, src, toks(t).groupBy(w => graft.functions.Md5.long48(w) % 256)
        .map { case (b, g) => b -> g.length.toLong }) }
      .filter(_._3.nonEmpty)
    val srcVec = tf.groupBy(_._2).map { case (s, g) =>
      s -> g.flatMap(_._3).groupBy(_._1)
        .map { case (b, vs) => b -> vs.map(_._2).sum } }
    val scores = tf.map { case (id, src, v) =>
      val sv = srcVec(src)
      val dot = v.map { case (b, c) => c * sv.getOrElse(b, 0L) }.sum
      val d2 = v.values.map(c => c * c).sum
      val s2 = sv.values.map(c => c * c).sum
      (id, src, v.values.sum,
        rd6(1.0 - dot.toDouble / (math.sqrt(d2.toDouble) * math.sqrt(s2.toDouble))))
    }.sortBy(s => (-s._4, s._1)).take(20)
    assert(out.toSeq == scores.toSeq)
  }
}
