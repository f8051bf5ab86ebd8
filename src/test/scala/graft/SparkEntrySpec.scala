package graft

/** Contract guards for the driver-facing surface. */
class SparkEntrySpec extends SparkFunSuite {

  test("no duplicate query names across groups") {
    val all = SparkEntry.groups.flatMap(_._1.keySet)
    assert(all.size == all.toSet.size, "duplicate query names across groups")
    assert(SparkEntry.queries.keySet == all.toSet)
  }

  test("every query has an oracle") {
    // As of r16 nothing is waived: the two native-sketch queries emit
    // the tolerance-verdict form (see SketchQueries doc), so every
    // query on the board is fully oracle-checked.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("no duplicate query keys in source (Map literals silently drop dupes)") {
    // The r12→r13 e_retention bug: a duplicate key inside ONE Map
    // literal compiles clean and silently shadows the earlier entry —
    // invisible to the runtime keyset checks above. Guard at the
    // source level: a query name may bind at most once among defs and
    // once among oracles per file.
    val dir = new java.io.File("src/main/scala/graft/queries")
    val binding = """"([a-z0-9_]+)"\s*->""".r
    val defBinding = """"([a-z0-9_]+)"\s*->\s*\(\(""".r
    dir.listFiles().filter(_.getName.endsWith(".scala")).foreach { f =>
      val src = {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        try s.mkString finally s.close()
      }
      val defs = defBinding.findAllMatchIn(src).map(_.group(1)).toSeq
      val dupDefs = defs.groupBy(identity).filter(_._2.size > 1).keys
      assert(dupDefs.isEmpty, s"${f.getName}: duplicate query defs $dupDefs")
      val all = binding.findAllMatchIn(src).map(_.group(1)).toSeq
      val overBound = all.groupBy(identity)
        .filter(_._2.size > 2).keys
      assert(overBound.isEmpty,
        s"${f.getName}: names bound more than twice (def+oracle): $overBound")
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"query $name returned no rows at sf0.001")
    }
  }

  test("registry sweep leaves no persist() cache entries behind") {
    // Builders may materialize loop-invariant state, but only via
    // self-cleaning mechanisms (localCheckpoint blocks are dropped by
    // the context cleaner on GC). A plain persist() without a matching
    // unpersist() pins blocks in the session CacheManager for the
    // session's lifetime — the r12 q_recursive leak. The previous test
    // already executed every builder in this session; assert no
    // non-checkpoint persistent RDDs and no lingering graft temp views
    // survived (re-running the known view/persist users for ordering
    // robustness).
    Seq("q_recursive", "q_lateral").foreach(n =>
      SparkEntry.queries(n)(spark, sf0001).count())
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.isCheckpointed)
    assert(leaked.isEmpty,
      s"persist() leaks: ${leaked.map(_.name).mkString(", ")}")
    val views = spark.catalog.listTables()
      .collect().map(_.name).filter(n => n.startsWith("edges_qrec") ||
        n.startsWith("lat_"))
    assert(views.isEmpty, s"leaked temp views: ${views.mkString(", ")}")
  }
}
