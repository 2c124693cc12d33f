package graft

import graft.queries.Queries

/** Every registered query runs on sf0.001 without throwing; contract
  * invariants of the SparkEntry facade (the driver's t1 smoke, run
  * locally).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("query names are unique and every oracle key has a query") {
    val names = Queries.all.map(_.name)
    assert(names.distinct == names)
    assert(Queries.oracleMap.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Queries.all.foreach { q =>
    test(s"${q.name} executes on sf0.001${if (!q.oracleGated) " (rows-only)" else ""}") {
      val df = q.run(spark, sf("sf0.001"))
      val n = df.count()
      assert(n >= 0)
      // ordered-output queries must declare an orderable schema; smoke
      // only asserts executability + non-exploding row counts here.
      assert(n < 5000000, s"${q.name} exploded to $n rows at sf0.001")
    }
  }

  test("sql_recursive_rollup restores cteRecursionRowLimit on the shared session") {
    // the query derives a raised recursion limit from the table size and
    // must put the session's runaway-recursion guard back once its eager
    // materialization completes — a leaked limit weakens the guard for
    // every later query on the shared session
    val key = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.get(key)
    val df = Queries.queriesMap("sql_recursive_rollup")(spark, sf("sf0.001"))
    assert(spark.conf.get(key) == before,
      s"cteRecursionRowLimit leaked: $before -> ${spark.conf.get(key)}")
    assert(df.count() > 0) // checkpointed result stays readable post-restore
  }

  // Cross-engine tie safety (the sf10 decade's regression class): a
  // top-k query's SELECTION runs at full precision (the operator's
  // TakeOrderedAndProject), but its PRESENTATION must order on the
  // ROUNDED score projection + unique key — two rows whose distances
  // round equal can differ in full-precision order between engines, so
  // presenting on the raw value makes the row order engine-dependent.
  private val knnPresentation: Seq[(String, String, String, Boolean)] = Seq(
    // (query, rounded score col, id col, descending)
    ("knn_exact_cosine", "distance", "vec_id", false),
    ("knn_exact_l2", "distance", "vec_id", false),
    ("knn_sql_api", "distance", "vec_id", false),
    ("knn_filtered_hybrid", "distance", "vec_id", false),
    ("knn_filtered_ivf_rewrite", "distance", "vec_id", false),
    ("knn_quantized_rescore", "distance", "vec_id", false),
    ("ann_ivf_probe", "distance", "vec_id", false),
    ("ann_ivf_rule_rewrite", "distance", "vec_id", false),
    ("ann_ivf_kmeans_rewrite", "distance", "vec_id", false),
    ("ann_lsh_probe", "distance", "vec_id", false),
    ("knn_mips_topk", "dot", "vec_id", true),
    ("knn_match_score", "match_score", "vec_id", true))

  knnPresentation.foreach { case (name, scoreCol, idCol, desc) =>
    test(s"$name presents in (rounded $scoreCol${if (desc) " desc" else ""}, $idCol) order") {
      val rows = Queries.queriesMap(name)(spark, sf("sf0.001"))
        .select(scoreCol, idCol).collect()
        .map(r => (r.getAs[Number](0).doubleValue * (if (desc) -1 else 1),
          r.getAs[Number](1).longValue))
      assert(rows.nonEmpty && rows.sameElements(rows.sorted),
        s"$name output not in presentation order: ${rows.mkString(", ")}")
    }
  }

  test("knn_hybrid_rrf: fused score is consistent with the returned ranks") {
    // the rrf column must equal Σ 1/(60+rank) recomputed from the rank
    // columns the row itself reports (null rank → leg absent → 0), and
    // the output must present in (rrf desc, doc_id) order with ranks in
    // [1, 30] and at least one leg present per row
    val rows = Queries.queriesMap("knn_hybrid_rrf")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length == 10)
    val seen = rows.map { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val vec = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
      assert(lex.isDefined || vec.isDefined)
      (lex.toSeq ++ vec.toSeq).foreach(k => assert(k >= 1 && k <= 30))
      val want = BigDecimal(lex.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
          vec.map(k => 1.0 / (60 + k)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf") == want,
        s"rrf ${r.getAs[Double]("rrf")} != recomputed $want for ranks $lex/$vec")
      (-r.getAs[Double]("rrf"), r.getAs[Long]("doc_id"))
    }
    assert(seen.sameElements(seen.sorted), "output not in (rrf desc, doc_id) order")
  }

  test("KNN-family oracles end with ORDER BY on the rounded alias, not the raw score") {
    // the kmeans/embedding late oracles only resolve during a Verify dump;
    // the static family is checked here, the late ones share the builders
    knnPresentation.map(_._1).filter(Queries.oracleMap.contains).foreach { name =>
      val sql = Queries.oracleMap(name)
      val tail = sql.substring(sql.lastIndexOf("ORDER BY"))
      // `dist` is the family's raw full-precision column name by
      // convention; the rounded projection is always aliased away from it
      assert(!tail.matches("(?s)ORDER BY\\s+dist\\b.*"),
        s"$name: final ORDER BY must present on the rounded projection, " +
          s"not the raw distance: $tail")
    }
  }
}
