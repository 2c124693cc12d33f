package graft

import graft.queries.Queries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Semantic invariants for the session-6 analytics additions — each
  * query's defining identity re-derived independently (driver-side
  * fold / brute force / conservation law), beyond the DuckDB hash gate.
  */
class MlQueriesSpec extends SparkSpec {

  private def run(name: String): DataFrame =
    Queries.queriesMap(name)(spark, sf("sf0.001"))

  private def dailyCents(): Map[String, Seq[(String, Long)]] =
    Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast(DecimalType(38, 6))).cast(DecimalType(38, 2)) * 100)
        .cast("long").as("yc"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("ev_attribution_linear: credits conserve exactly 1e6 per converted purchase") {
    val out = run("ev_attribution_linear").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalCredit = out.map(_._4).sum

    // independent recount of conversions with >=1 qualifying touch
    val ev = Tables.events(spark, sf("sf0.001")).withColumn("us", unix_micros(col("ts")))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"), col("us").as("c_us"))
    val touch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("us").as("t_us"))
    val converted = conv.join(touch, Seq("user_id"))
      .filter(col("t_us") < col("c_us") &&
        col("c_us") - col("t_us") <= 7L * 86400L * 1000000L)
      .select(col("conv_id")).distinct().count()

    assert(totalCredit == 1000000L * converted,
      s"micro-credits must sum to 1e6 per converted purchase: $totalCredit vs ${1000000L * converted}")
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
  }

  test("ev_cusum_changepoint equals the sequential clamped recursion") {
    val out = run("ev_cusum_changepoint").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val daily = dailyCents()
    assert(out.keySet == daily.keySet)
    daily.foreach { case (tpe, series) =>
      val n = series.size.toLong
      val sx = series.map(_._2).sum
      var s = 0L
      var best = Long.MinValue
      var bestDay = ""
      series.foreach { case (day, yc) =>
        s = math.max(0L, s + (n * yc - sx))
        if (s > best) { best = s; bestDay = day } // strict: earliest day wins
      }
      assert(out(tpe) == ((bestDay, best)),
        s"$tpe: window form ${out(tpe)} vs sequential ($bestDay, $best)")
    }
  }

  test("stat_theilsen equals the brute-force pairwise-slope median") {
    val out = run("stat_theilsen").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    dailyCents().foreach { case (tpe, series) =>
      val pts = series.zipWithIndex // day sorted; x = day index
      val xs = series.map(_._1).map(d => java.time.LocalDate.parse(d).toEpochDay)
      val x0 = xs.min
      val slopes = for {
        i <- pts.indices; j <- pts.indices
        if xs(i) - x0 < xs(j) - x0
      } yield (series(j)._2 - series(i)._2).toDouble / (xs(j) - xs(i)).toDouble
      val sorted = slopes.sorted
      val median = sorted((sorted.size + 1) / 2 - 1) / 100.0
      val (nPairs, got) = out(tpe)
      assert(nPairs == slopes.size)
      assert(math.abs(got - BigDecimal(median).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"$tpe: $got vs brute $median")
    }
  }

  test("ml_quantile_bins: contiguous bins, sizes within 1, exact coverage") {
    val out = run("ml_quantile_bins").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nCust = Tables.customer(spark, sf("sf0.001")).count()
    assert(out.map(_._1).toSeq == (0L to 9L))
    assert(out.map(_._2).sum == nCust)
    assert(out.map(_._2).max - out.map(_._2).min <= 1,
      "rank-proportional cut keeps bin sizes within 1")
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bin ${a._1} hi ${a._4} overlaps bin ${b._1} lo ${b._3}")
    }
  }

  test("ml_target_encode: LOO identity enc·(n−1) + y = Σ_seg") {
    val cust = Tables.customer(spark, sf("sf0.001"))
      .join(Tables.orders(spark, sf("sf0.001"))
          .groupBy(col("o_custkey"))
          .agg((sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DecimalType(38, 2)) * 100)
            .cast("long").as("y")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), coalesce(col("y"), lit(0L)).as("y"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val out = run("ml_target_encode").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (seg, y, enc) = (r.getString(1), r.getLong(2), r.getDouble(3))
      val (n, s) = cust(seg)
      val expect = ((s - y) * 100 / (n - 1)).toDouble / 100.0
      assert(enc == expect, s"$enc vs $expect")
    }
  }

  test("dq_k_anonymity: classes partition the table; risk flag is k<5 or l<2") {
    val out = run("dq_k_anonymity").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    val nCust = Tables.customer(spark, sf("sf0.001")).count()
    assert(out.map(_._1).sum == nCust, "equivalence classes must partition the table")
    out.foreach { case (k, l, atRisk) =>
      assert(k >= 1 && l >= 1 && l <= 3)
      assert(atRisk == (if (k < 5 || l < 2) 1L else 0L))
    }
    assert(out.exists(_._3 == 1L), "fixture should surface at least one risky class")
  }

  test("stat_mannwhitney_u equals brute-force doubled-midrank pair counting") {
    val row = run("stat_mannwhitney_u").collect().head
    val (nA, nB, twoU) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val vals = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type").isin("click", "purchase"))
      .select((col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("vc"),
        (col("event_type") === "click").as("isA"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val a = vals.filter(_._2).map(_._1)
    val b = vals.filterNot(_._2).map(_._1)
    assert(nA == a.length && nB == b.length)
    // 2U_A = 2·#{(x,y): x>y} + #{ties} over A×B pairs
    val gt = a.map(x => b.count(_ < x).toLong).sum
    val eq = a.map(x => b.count(_ == x).toLong).sum
    assert(twoU == 2 * gt + eq, s"$twoU vs ${2 * gt + eq}")
  }

  test("ev_holt_forecast equals the sequential coupled recursion") {
    val out = run("ev_holt_forecast").collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    dailyCents().foreach { case (tpe, series) =>
      val xs = series.map(_._2.toDouble)
      var l = xs(1)
      var tr = xs(1) - xs(0)
      xs.drop(2).foreach { x =>
        val ln = 0.5 * x + 0.5 * (l + tr)
        val bn = 0.5 * ((0.5 * x + 0.5 * (l + tr)) - l) + 0.5 * tr
        l = ln; tr = bn
      }
      def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(tpe) == ((r6(l / 100.0), r6(tr / 100.0), r6((l + 7.0 * tr) / 100.0))),
        s"$tpe: ${out(tpe)} vs driver fold")
    }
  }

  test("src_bucketed_join: bucketed round trip equals the plain fixture join") {
    val got = run("src_bucketed_join").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expect = Tables.orders(spark, sf("sf0.001"))
      .join(Tables.customer(spark, sf("sf0.001")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("nc"))
      .orderBy(col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("stat_survival_km equals the textbook estimator computed driver-side") {
    val out = run("stat_survival_km").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate))
    val end = ev.map(_._3).max
    val cohort = ev.groupBy(_._1).values.flatMap { rows =>
      val fv = rows.filter(_._2 == "view").map(_._3).minOption
      val fp = rows.filter(_._2 == "purchase").map(_._3).minOption
      fv match {
        case Some(v) if fp.forall(!_.isBefore(v)) =>
          val (t, e) = fp match {
            case Some(p) => (java.time.temporal.ChronoUnit.DAYS.between(v, p), 1L)
            case None    => (java.time.temporal.ChronoUnit.DAYS.between(v, end), 0L)
          }
          Some((t, e))
        case _ => None
      }
    }.toSeq
    val grid = cohort.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      (t, rs.count(_._2 == 1L).toLong, rs.count(_._2 == 0L).toLong)
    }
    var atRisk = cohort.size.toLong
    var surv = 1.0
    val expect = grid.map { case (t, d, c) =>
      surv = surv * ((atRisk - d).toDouble / atRisk.toDouble)
      val row = (t, atRisk, d, c,
        BigDecimal(surv).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      atRisk -= d + c
      row
    }
    assert(out.toSeq == expect, s"\n${out.toSeq}\nvs\n$expect")
  }

  test("txt_rake_keywords equals the brute-force RAKE computation") {
    val out = run("txt_rake_keywords").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val stops = graft.operators.TextAnalysis.stopwords.values.flatten.toSet
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0))
    // islands: split each doc's token run at stopwords; keep runs <= 4
    val phrases = docs.flatMap { toks =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.newBuilder[String]
      var n = 0
      toks.foreach { t =>
        if (stops(t)) { val r = cur.result(); if (r.nonEmpty) runs += r; cur = List.newBuilder; n = 0 }
        else { cur += t; n += 1 }
      }
      val last = cur.result(); if (last.nonEmpty) runs += last
      runs.filter(_.size <= 4)
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = phrases.flatMap(p => p.map(_ -> p.size.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val scored = phrases.groupBy(identity).map { case (p, occ) =>
      var s = 0.0
      p.foreach(w => s = s + deg(w).toDouble / freq(w).toDouble)
      (p.mkString(" "), p.size.toLong, occ.size.toLong,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(t => (-t._4, t._1)).take(15)
    assert(out == scored, s"\n$out\nvs\n$scored")
  }

  test("ml_item_cooccurrence equals brute-force basket pair counting") {
    val out = run("ml_item_cooccurrence").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val baskets = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemCounts = baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCounts = baskets.values.flatMap { items =>
      val s = items.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairCounts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(25)
      .map { case ((a, b), c) => (a, b, c, itemCounts(a), itemCounts(b)) }
    assert(out.toSeq == expect)
  }

  test("sql_lateral_topk equals the window row_number formulation") {
    val out = run("sql_lateral_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    import org.apache.spark.sql.expressions.Window
    val expect = Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .join(Tables.nation(spark, sf("sf0.001")), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("n_nationkey"))
        .orderBy(col("cents").desc, col("c_custkey"))))
      .filter(col("rn") <= 2)
      .select(col("n_name"), col("c_custkey"), col("cents"))
      .orderBy(col("n_name"), col("cents").desc, col("c_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expect)
  }

  test("graph_degree_assortativity equals the brute-force Pearson over edge endpoints") {
    val row = run("graph_degree_assortativity").collect().head
    val (nEdges, r) = (row.getLong(0), row.getDouble(1))
    val baskets = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edges = baskets.values.flatMap { items =>
      val s = items.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSet
    assert(nEdges == edges.size)
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val xs = edges.toSeq.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = xs.size.toDouble
    val sx = xs.map(_._1).sum.toDouble; val sy = xs.map(_._2).sum.toDouble
    val sxx = xs.map(p => p._1 * p._1).sum.toDouble
    val syy = xs.map(p => p._2 * p._2).sum.toDouble
    val sxy = xs.map(p => p._1 * p._2).sum.toDouble
    val expect = (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(r - expect) < 1e-6, s"$r vs $expect")
  }

  test("stat_kendall_tau equals brute-force pair classification") {
    val out = run("stat_kendall_tau").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val daily = Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 0))).cast("long").as("x"),
        (sum(col("l_extendedprice").cast(DecimalType(12, 2))).cast(DecimalType(38, 2)) * 100)
          .cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    daily.foreach { case (flag, rows) =>
      val pts = rows.sortBy(_._2).map(r => (r._3, r._4))
      var (c, d, tx, ty) = (0L, 0L, 0L, 0L)
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val dx = pts(j)._1 - pts(i)._1; val dy = pts(j)._2 - pts(i)._2
        if (dx * dy > 0) c += 1 else if (dx * dy < 0) d += 1
        else if (dx == 0 && dy != 0) tx += 1 else if (dy == 0 && dx != 0) ty += 1
      }
      val tau = (c - d).toDouble / math.sqrt((c + d + ty).toDouble * (c + d + tx).toDouble)
      val (nPairs, gc, gd, gt) = out(flag)
      assert(nPairs == pts.size.toLong * (pts.size - 1) / 2)
      assert((gc, gd) == ((c, d)))
      assert(math.abs(gt - BigDecimal(tau).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("dq_drift_tv: zero drift on identical halves; bounded in [0,1]") {
    val row = run("dq_drift_tv").collect().head
    val (n1, n2, grid, tv) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    assert(n1 > 0 && n2 > 0 && grid > 0)
    assert(tv >= 0.0 && tv <= 1.0)
    // brute-force recomputation
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(to_date(col("ts")).as("day"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("vc"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val minDay = ev.map(_._1).min
    val a = ev.filter(e => java.time.temporal.ChronoUnit.DAYS.between(minDay, e._1) < 15).map(_._2)
    val b = ev.filter(e => java.time.temporal.ChronoUnit.DAYS.between(minDay, e._1) >= 15).map(_._2)
    assert((n1, n2) == ((a.length.toLong, b.length.toLong)))
    val ca = a.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cb = b.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val num = (ca.keySet ++ cb.keySet).toSeq
      .map(v => math.abs(ca.getOrElse(v, 0L) * n2 - cb.getOrElse(v, 0L) * n1)).sum
    val expect = num.toDouble / (2.0 * n1 * n2)
    assert(math.abs(tv - BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("dq_table_fingerprint: checksums move under corruption, not reordering") {
    val rows = run("dq_table_fingerprint").collect()
    assert(rows.length > 1)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sf("sf0.001")).count())
    // reordering invariance: recompute one source's checksum from a
    // shuffled read and compare
    val src = rows.head.getString(0)
    val fp = rows.head.getString(5)
    val rowKey = concat_ws("|", col("doc_id").cast("string"), col("lang"), md5(col("text")))
    val h = conv(substring(md5(rowKey), 1, 12), 16, 10).cast(DecimalType(38, 0))
    val re = Tables.documents(spark, sf("sf0.001"))
      .filter(col("source") === src)
      .repartition(7) // different physical order
      .agg(sum(h).cast(DecimalType(38, 0)).cast("string")).collect()(0).getString(0)
    assert(re == fp)
    // corruption detection: flipping one character changes the checksum
    val corrupted = Tables.documents(spark, sf("sf0.001"))
      .filter(col("source") === src)
      .withColumn("text",
        when(col("doc_id") === min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))),
          concat(col("text"), lit("x"))).otherwise(col("text")))
      .agg(sum(conv(substring(md5(concat_ws("|",
        col("doc_id").cast("string"), col("lang"), md5(col("text")))), 1, 12), 16, 10)
        .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).cast("string"))
      .collect()(0).getString(0)
    assert(corrupted != fp)
  }

  test("pipeline_curriculum: stages are contiguous easy-to-hard cuts that conserve the corpus") {
    val out = run("pipeline_curriculum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(graft.operators.TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(_.getLong(0))
    assert(out.map(_._1).toSeq == (0L to 9L))
    assert(out.map(_._2).sum == docs.length)
    assert(out.map(_._4).sum >= 0 && out.map(_._5).sum == docs.sum)
    assert(out.map(_._2).max - out.map(_._2).min <= 1)
    // difficulty ordering: stage extrema are non-decreasing across stages
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3 || a._4 == b._3 || a._4 <= b._4,
        s"stage ${a._1} max ${a._4} vs stage ${b._1} min ${b._3}")
      assert(a._3 <= b._3 && a._4 <= b._4)
    }
  }

  test("txt_readability equals the brute-force Flesch-Kincaid computation") {
    val out = run("txt_readability").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(7))))
      .toMap
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vowelRuns = "[aeiouy]+".r
    val perLang = docs.groupBy(_._1).map { case (lang, rows) =>
      var (w, s, y) = (0L, 0L, 0L)
      rows.foreach { case (_, text) =>
        val norm = text.trim.replaceAll("\\s+", " ").toLowerCase
        val toks = norm.split("[^a-z0-9]+").filter(_.nonEmpty)
        w += toks.length
        s += math.max(1, norm.split("[.!?]+", -1).count(_.trim.nonEmpty))
        y += toks.map(t => math.max(1, vowelRuns.findAllIn(t).length).toLong).sum
      }
      val fk = 0.39 * (w.toDouble / s.toDouble) + 11.8 * (y.toDouble / w.toDouble) - 15.59
      lang -> ((rows.length.toLong, w, s, y,
        BigDecimal(fk).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(out == perLang, s"\n$out\nvs\n$perLang")
  }

  test("sql_recursive_rollup: roots are leading digits; counts and cents conserve") {
    val out = run("sql_recursive_rollup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cust = Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey"),
        (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._2).sum == cust.length)
    assert(out.map(_._4).sum == cust.map(_._2).sum)
    val byLeadDigit = cust.groupBy(c => c._1.toString.head.asDigit.toLong)
    out.foreach { case (root, n, maxDepth, cents) =>
      val grp = byLeadDigit(root)
      assert(n == grp.length, s"root $root")
      assert(cents == grp.map(_._2).sum)
      assert(maxDepth == grp.map(_._1.toString.length - 1).max)
    }
  }
}
