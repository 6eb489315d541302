package graft.api

import graft.Geo._
import graft.tools.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-quality gates: correctness tests prove WHAT is computed; these
 * prove the plans keep the shapes that survive a 100 TB scale-up —
 * filters pushed to the parquet scan, spatial joins planned as hash
 * joins on cell keys (never nested-loop), aggregates partial-aggregated
 * map-side, and custom expressions inside whole-stage codegen.
 */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate()

  import spark.implicits._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("bloom-join rewrite injects the prefilter, converges, and keeps results identical") {
    graft.plans.BloomJoinRewrite.install(spark)
    val big = (0 until 50000).map(i => (i.toLong, i % 1000)).toDF("pk", "payload")
    val small = (0 until 50).map(i => (i * 100L, i)).toDF("fk", "tag")
    def join() = big.join(small, col("pk") === col("fk")).select("pk", "tag")
    val plain = join().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(plain.size == 50)
    spark.conf.set("spark.graft.bloomJoin.enabled", "true")
    // the test build side is broadcast-sized; lift the broadcast floor
    // so the rule engages (prod default skips broadcastable builds)
    spark.conf.set("spark.graft.bloomJoin.minBuildBytes", "-1")
    try {
      val q = join()
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_might_contain"), s"no bloom prefilter in:\n$opt")
      // fixpoint convergence: exactly ONE injected filter, not a stack
      assert("bloom_might_contain".r.findAllIn(opt).size == 1, opt)
      val got = q.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == plain)
      // left-semi probe is the LEFT side
      val semi = big.join(small, col("pk") === col("fk"), "left_semi")
      val semiOpt = semi.queryExecution.optimizedPlan.toString
      assert(semiOpt.contains("bloom_might_contain"), semiOpt)
      assert(semi.count() == 50)
      // outer/anti joins are never touched (prefiltering the preserved
      // side would drop rows)
      val anti = big.join(small, col("pk") === col("fk"), "left_anti")
      assert(!anti.queryExecution.optimizedPlan.toString.contains("bloom_might_contain"))
      assert(anti.count() == 50000 - 50)
      // the PRODUCTION scenario: broadcast disabled (the non-
      // broadcastable-build case the rule exists for) — the physical
      // plan must be a shuffle join WITH the bloom filter on the probe
      // side, and results must still match
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val smj = join()
        val phys = finalPlan(smj)
        assert(phys.contains("bloom_might_contain"), s"no prefilter in:\n$phys")
        assert(phys.contains("SortMergeJoin") || phys.contains("ShuffledHashJoin"),
          s"expected a shuffle join:\n$phys")
        assert(smj.collect().map(r => (r.getLong(0), r.getInt(1))).toSet == plain)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    } finally {
      spark.conf.set("spark.graft.bloomJoin.enabled", "false")
      spark.conf.unset("spark.graft.bloomJoin.minBuildBytes")
    }
    // disabled again: no injection
    assert(!join().queryExecution.optimizedPlan.toString.contains("bloom_might_contain"))
  }

  test("point cx filter pushes down to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("planspec").toFile
    try {
      val pts = (0 until 1000).map(i => (i.toLong, (i % 97).toDouble, (i % 89).toDouble))
        .toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
        .select("id", "pt")
      pts.write.mode("overwrite").parquet(s"$dir/pts")
      val read = spark.read.parquet(s"$dir/pts")
      val q = GeoFrame(read, "pt", "point").cx(10, 10, 40, 40).df
      val scan = q.queryExecution.executedPlan.toString
      // struct-field comparisons reach the scan as pushed filters on pt.x/pt.y
      assert(scan.contains("PushedFilters") &&
        (scan.contains("pt.x") || scan.contains("GreaterThanOrEqual")),
        s"no pushdown in:\n$scan")
      assert(q.count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("nested-schema pruning reads only the projected coordinate") {
    val dir = java.nio.file.Files.createTempDirectory("nestedprune").toFile
    try {
      val pts = (0 until 100).map(i => (i.toLong, i.toDouble, (i * 2).toDouble))
        .toDF("id", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
        .select("id", "pt")
      pts.write.mode("overwrite").parquet(s"$dir/pts")
      val q = spark.read.parquet(s"$dir/pts").select(st_x(col("pt")).as("px"))
      val scan = q.queryExecution.executedPlan.toString
      // the scan schema must contain pt.x but NOT pt.y
      val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(readSchema.contains("x:double") && !readSchema.contains("y:double"),
        s"nested pruning missing: $readSchema")
      assert(q.count() == 100)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("grid spatial join plans as a hash join, never nested-loop") {
    val pts = (0 until 500).map(i => (i.toLong, (i % 97).toDouble, (i % 89).toDouble))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
    val polys = (0 until 20).map { i =>
      val c = i * 5.0
      (i.toLong, Seq(Seq(c + 5, c, c, c + 5, c - 5, c, c, c - 5, c + 5, c)))
    }.toDF("gid", "poly")
    val j = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon", cellSize = 10.0)
    val plan = finalPlan(j)
    assert(plan.contains("HashJoin"), s"no hash join in:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"nested loop in:\n$plan")
  }

  test("aggregations partial-aggregate map-side") {
    val df = (0 until 1000).map(i => (i % 7, i.toLong)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    val plan = finalPlan(df)
    assert(plan.contains("partial_sum"), s"no partial aggregation in:\n$plan")
  }

  test("outer spatial joins plan without nested loops") {
    val pts = (0 until 300).map(i => (i.toLong, (i % 97).toDouble, (i % 89).toDouble))
      .toDF("pid", "x", "y").withColumn("pt", st_point(col("x"), col("y")))
      .select("pid", "pt")
    val polys = (0 until 20).map { i =>
      val c = i * 5.0
      (i.toLong, Seq(Seq(c + 5, c, c, c + 5, c - 5, c, c, c - 5, c + 5, c)))
    }.toDF("gid", "poly")
    for ((how, key) <- Seq(("left", "pid"), ("right", "gid"))) {
      val j = SpatialJoin.pointInGeom(pts, polys, "pt", "poly", "polygon",
        cellSize = 10.0, how = how,
        leftKey = if (how == "left") key else null,
        rightKey = if (how == "right") key else null)
      val plan = finalPlan(j)
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"nested loop in $how join:\n$plan")
    }
  }

  test("lmFamiliarity scores via a broadcast model join, no cartesian") {
    val docs = (0 until 300).map(i => (i.toLong, s"some text number $i padded out"))
      .toDF("id", "text")
    val out = graft.pipeline.TextAnalysis.lmFamiliaritySelf(docs, "id", "text")
    val plan = finalPlan(out)
    assert(plan.contains("BroadcastHashJoin"),
      s"char-bigram model should broadcast (corpus must not shuffle for scoring):\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("DSIR scoring broadcasts the bucket model, no cartesian") {
    val docs = (0 until 300).map(i => (i.toLong, s"tok${i % 17} tok${i % 5} filler"))
      .toDF("id", "text")
    val target = docs.where($"id" % 3 === 0)
    val out = graft.pipeline.TextAnalysis.importanceWeights(docs, "id", "text",
      graft.pipeline.TextAnalysis.importanceModel(docs, target, "text", 64), 64)
    val plan = finalPlan(out)
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket model should broadcast (corpus must not shuffle for scoring):\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("LSH self-join computes the signature pass once (exchange reuse)") {
    val docs = (0 until 400).map(i => (i.toLong, s"alpha beta gamma delta ${i % 40} epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.simhashDupPairs(docs, "doc_id", "text")
    val plan = finalPlan(pairs)
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"banded exchange not reused (signatures computed twice):\n$plan")
  }

  test("jaccard prefix join reuses the gram exchange, never nested-loop") {
    val docs = (0 until 400).map(i => (i.toLong, s"alpha beta gamma delta ${i % 40} epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.jaccardDupPairs(docs, "doc_id", "text",
      shingle = 3, threshold = 0.8)
    val plan = finalPlan(pairs)
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"prefix-gram exchange not reused (gram pass computed twice):\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"prefix join must stay a hash join:\n$plan")
  }

  test("cosine prefix join reuses the gram exchange, never nested-loop") {
    val docs = (0 until 400).map(i => (i.toLong, s"alpha beta gamma delta ${i % 40} epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.cosineDupPairs(docs, "doc_id", "text",
      shingle = 3, threshold = 0.8)
    val plan = finalPlan(pairs)
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"prefix-gram exchange not reused (gram pass computed twice):\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"prefix join must stay a hash join:\n$plan")
  }

  test("containment join: pair join is hash-based; only the 1-row min broadcast nests") {
    val docs = (0 until 400).map(i => (i.toLong, s"alpha beta gamma delta ${i % 40} epsilon zeta"))
      .toDF("doc_id", "text")
    // at-scale shape: sides too big to broadcast (the explicit 1-row
    // broadcast() hint for the corpus-min overlap survives this)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = graft.pipeline.Dedup.containmentDupPairs(docs, "doc_id", "text",
        shingle = 3, threshold = 0.8)
      val plan = finalPlan(pairs)
      assert(!plan.contains("CartesianProduct"),
        s"containment candidates must never cartesian:\n$plan")
      // the corpus-min overlap rides a broadcast 1-row crossJoin (a
      // BroadcastNestedLoopJoin over exactly one build row — constant
      // work); the GRAM pair join itself must be a shuffled hash join
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(nlj <= 1, s"only the 1-row cmin broadcast may nest, found $nlj:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"gram candidate join must shuffle on the gram key:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("edit-distance join plans hash joins end to end") {
    val rows = (0 until 300).map(i => (i.toLong, s"name-${i % 60}-suffix"))
      .toDF("id", "s")
    val pairs = graft.tools.Joins.editDistancePairs(rows, "id", "s", maxDist = 1)
    val plan = finalPlan(pairs)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"q-gram blocking, length-band residue and refine joins must all hash:\n$plan")
  }

  test("covariance moments: corpus crosses exactly one (aggregate) exchange") {
    val rnd = new scala.util.Random(31)
    val df = (0 until 200).map(_ => Tuple1(Array.fill(6)(rnd.nextDouble())))
      .toDF("vec")
    val out = graft.pipeline.Sketches.vectorCovarianceStats(df, "vec", 6)
    // AQE prints the initial plan again below the final one — count
    // exchanges in the FINAL section only
    val plan = finalPlan(out).split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <=1 exchange, got $exchanges:\n$plan")
    assert(plan.contains("partial_vector_sum") || plan.contains("VectorSumAgg")
      || plan.contains("vector_sum"), s"vector aggregate missing:\n$plan")
  }

  test("linear projection apply: zero exchanges, narrow end to end") {
    val rnd = new scala.util.Random(37)
    val df = (0L until 100L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val out = graft.pipeline.Similarity.projectVectors(df, "vec_id",
      "embedding", graft.pipeline.Similarity.lcgMatrix(8, 3))
    val plan = finalPlan(out)
    assert(!plan.contains("Exchange"), s"projection must be narrow:\n$plan")
  }

  test("quantile normalization: one group-keyed exchange feeds both windows") {
    val df = (0 until 300).map(i => (s"g${i % 3}", (i % 41).toLong))
      .toDF("grp", "score")
    val out = graft.pipeline.Sampling.quantileNormalizeByGroup(
      df, col("grp"), col("score"), 4)
    val plan = finalPlan(out).split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("sorted-neighborhood pairs: rank join hashes, no single-task window") {
    val docs = (0 until 400).map(i => (i.toLong, s"w${i % 37} x${i % 11} y z a b"))
      .toDF("doc_id", "text")
    val (pairs, release) = graft.pipeline.Dedup.sortedNeighborPairsWithRelease(
      docs, "doc_id", "text", ngram = 3, windowSize = 4, maxHamming = 5,
      numPartitions = 4)
    try {
      val plan = finalPlan(pairs)
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"the rank-offset candidate join must be a hash join:\n$plan")
      // the global order must come from the two-pass rank, not a
      // one-task global window
      assert(!plan.contains("Window"), s"no window operator expected:\n$plan")
    } finally release()
  }

  test("cross-corpus near-dedup plans hash joins end to end") {
    val corpus = (0 until 200).map(i => (i.toLong, s"alpha beta gamma ${i % 20} delta"))
      .toDF("doc_id", "text")
    val batch = (1000 until 1300).map(i => (i.toLong, s"alpha beta gamma ${i % 25} delta"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.dedupNearAgainstCorpus(batch, corpus,
      "doc_id", "text", shingle = 3, threshold = 0.8)
    val plan = finalPlan(out)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"gram join, refine joins and the anti-join must all be hash joins:\n$plan")
  }

  test("exact dedup is a single shuffle") {
    val docs = (0 until 500).map(i => (i.toLong, s"t${i % 50}")).toDF("id", "t")
    val d = graft.pipeline.Dedup.exact(docs, "t", "id")
    val plan = finalPlan(d)
    val shuffles = "hashpartitioning|rangepartitioning".r
      .findAllIn(plan).size
    assert(d.count() == 50)
    assert(shuffles <= 2, // one exchange; AQE may print it twice (stage + reuse)
      s"too many shuffles in exact dedup:\n$plan")
  }

  test("deterministic sampling is a narrow filter: zero exchanges") {
    // spark.range (not a LocalRelation) so the filter cannot be
    // constant-folded away — the md5 predicate must SURVIVE in the plan
    val docs = spark.range(500).select(col("id"),
      concat(lit("d"), col("id")).as("t"))
    val sampled = graft.pipeline.Sampling
      .deterministicSample(docs, col("id"), 0.5, "s")
    val plan = finalPlan(sampled)
    assert(plan.contains("md5"), s"sampling filter folded away in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"sampling must not shuffle:\n$plan")
  }

  test("decontamination joins on gram hashes, never nested-loop") {
    val docs = (0 until 300).map(i =>
      (i.toLong, s"token$i alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val evalDocs = docs.where(col("doc_id") % 10 === 0)
    val out = graft.pipeline.Decontaminate
      .byNgramOverlap(docs, evalDocs, "doc_id", "text", 8)
    val plan = finalPlan(out)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"decontamination must stay a hash/broadcast equi-join:\n$plan")
    assert(plan.contains("token_ngram_hashes"),
      s"fused gram-hash expression missing from:\n$plan")
  }

  test("semantic dedup never plans a cartesian/nested-loop pair scan") {
    val vecs = (0 until 200).map { i =>
      val v = Array.fill(8)(0.01f); v(i % 8) = 1f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val out = graft.pipeline.Dedup.semanticDedup(vecs, "vec_id", "embedding",
      nlist = 4, threshold = 0.999)
    val plan = finalPlan(out)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"within-cell pairing must be a cell-keyed equi-join:\n$plan")
  }

  test("span-dup stats reuses the gram exchange across agg and join") {
    // at real scale neither side of the gram join broadcasts — disable
    // the threshold so the plan gate observes the shuffle-join shape
    // (with broadcast on, AQE picks BHJ over the aggregated side, which
    // is also fine; the reuse matters when both sides shuffle)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = (0 until 200).map(i =>
        (i.toLong, s"alpha${i % 20} beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text")
      val grams = docs.select(col("doc_id"),
          explode(graft.pipeline.Tx.token_ngram_hashes(col("text"), 8)).as("gh"))
        .repartition(col("gh"))
      val firsts = grams.groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
      val out = grams.join(firsts, "gh").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L))
            .as("dup_spans"))
      val plan = finalPlan(out)
      assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
        s"gram exchange not shared between min-doc agg and join:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dup-span removal: hash joins end to end, gram exchange reused") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = (0 until 200).map(i =>
        (i.toLong, s"alpha${i % 20} beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text")
      val out = graft.pipeline.Dedup.removeDupSpans(docs, "doc_id", "text", span = 8)
      val plan = finalPlan(out)
      assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
        s"gram exchange not shared between min-doc agg and join back:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"non-hash join in the span-removal path:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("triangle counting plans key-partitioned hash joins, never cartesian") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rnd = new scala.util.Random(3)
      val edges = (0 until 300).map(_ =>
        (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")).toDF("src", "dst")
      val plan = finalPlan(graft.pipeline.Graphs.triangleCounts(edges, "src", "dst"))
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"non-hash join in the triangle path:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregate plans the two-stage (key+salt, then key) exchanges") {
    val df = (0 until 500).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "key")
    val out = graft.tools.Salted.countByKey(df, "key", "id", salts = 8)
    val plan = finalPlan(out)
    assert(plan.contains("__salt"),
      s"salted stage missing from the plan:\n$plan")
    assert("hashpartitioning\\(__k".r.findAllIn(plan).size >= 2,
      s"expected the (key, salt) exchange AND the key combine exchange:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"map-side partial aggregation missing:\n$plan")
    // and the result is salt-count-invariant
    val direct = df.groupBy(col("key")).agg(count(lit(1)).as("n"))
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      direct.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
  }

  test("funnel stages plan user-keyed hash joins, never cartesian") {
    val ev = (0 until 400).map(i => (i.toLong % 20, i.toLong,
        Seq("signup", "click", "purchase", "view")(i % 4)))
      .toDF("user_id", "ts", "event_type")
    val out = graft.pipeline.Funnels.funnelCounts(
      ev, "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
    val plan = finalPlan(out)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"bad funnel join:\n$plan")
  }

  test("bpe encode joins the type table by key, never nested-loop") {
    val docs = (0 until 50).map(i => (i.toLong, s"ab cd ab w$i ab cd"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis.bpeEncodeCounts(
      docs, "doc_id", "text", merges = 2)
    val plan = finalPlan(out)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"bad encode join:\n$plan")
  }

  test("k-core rounds plan keyed anti-joins, never cartesian") {
    val edges = ((0 until 30).map(i => (s"c${i % 5}", s"c${(i + 1) % 5}")) ++
      (0 until 6).map(i => (s"p$i", s"p${i + 1}"))).toDF("src", "dst")
    val out = graft.pipeline.Graphs.kCore(edges, "src", "dst", k = 2)
    val plan = finalPlan(out)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"bad k-core join:\n$plan")
  }

  test("custom spatial predicate runs inside whole-stage codegen") {
    // spark.range (not a LocalRelation) so the filter cannot be
    // constant-folded away at plan time
    val c = col("id").cast("double")
    val df = spark.range(100)
      .withColumn("poly", array(array(
        c + 5, c, c, c + 5, c - 5, c, c, c - 5, c + 5, c)))
      .where(st_polygon_intersects_bounds(col("poly"), lit(0), lit(0), lit(50), lit(50)))
    df.collect()
    val hasCodegenFilter = df.queryExecution.executedPlan.exists {
      case w: WholeStageCodegenExec =>
        w.toString.contains("st_intersects_bounds")
      case a: AdaptiveSparkPlanExec =>
        a.executedPlan.exists {
          case w: WholeStageCodegenExec => w.toString.contains("st_intersects_bounds")
          case _ => false
        }
      case _ => false
    }
    assert(hasCodegenFilter,
      s"predicate not codegen'd:\n${df.queryExecution.executedPlan}")
  }

  test("bm25 top-k plans WindowGroupLimit and broadcasts the query side") {
    val docs = (0 until 300).map(i => (i.toLong,
      s"tok${i % 7} tok${i % 13} tok${i % 29} filler$i")).toDF("doc_id", "text")
    val probes = (0 until 3).map(i => (i.toLong + 1000, s"tok$i tok${i + 1}"))
      .toDF("query_id", "qtext")
    val r = graft.pipeline.Retrieval.bm25TopK(docs, "doc_id", "text",
      probes, "query_id", "qtext", k = 5)
    val plan = finalPlan(r)
    // rank<=k must push into the window as a group-limit: only k rows
    // per query survive each side of the final exchange
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"query side not broadcast:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"non-hash join in:\n$plan")
  }

  test("filtered ANN joins per-label buckets hash-based, never cartesian") {
    val embs = (0 until 200).map(i => (i.toLong,
      Array.tabulate(4)(d => (i * 31 + d).toFloat / 100f), i % 5))
      .toDF("vec_id", "embedding", "label")
    val corpus = embs.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"), col("label").as("c_label"))
    val probes = embs.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val j = probes.join(corpus,
      col("q_label") === col("c_label") && col("q_id") =!= col("c_id"))
    val plan = finalPlan(j)
    assert(plan.contains("HashJoin"), s"no hash join in:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"label filter not used as join key:\n$plan")
  }

  test("kmeans assignment is a narrow projection: zero exchanges") {
    val embs = (0 until 500).map(i => (i.toLong,
      Array.tabulate(4)(d => (i * 17 + d).toFloat / 50f)))
      .toDF("vec_id", "embedding")
    val cents = embs.where(col("vec_id") % 100 === 3).limit(4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val r = graft.pipeline.Retrieval.kmeansAssign(embs, "vec_id",
      "embedding", cents, "cid", "cv")
    val plan = finalPlan(r)
    assert(!plan.contains("Exchange"),
      s"kmeans assignment should not shuffle:\n$plan")
  }

  test("hive-partitioned read prunes partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("hivepart").toFile
    try {
      val docs = (0 until 300).map(i =>
        (i.toLong, Seq("en", "fr", "zh")(i % 3), s"doc $i"))
        .toDF("doc_id", "lang", "text")
      docs.write.mode("overwrite").partitionBy("lang")
        .parquet(s"$dir/docs")
      val q = spark.read.parquet(s"$dir/docs").where(col("lang") === "en")
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("lang"),
        s"no partition filter in:\n$scan")
      // the pruned scan must touch only the en directory
      val files = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
      }.get
      assert(files.nonEmpty && files.forall(_.contains("lang=en")),
        s"pruning read non-en files: $files")
      assert(q.count() == 100)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("semi and anti joins plan hash-based, never nested-loop") {
    val orders = (0 until 500).map(i => (i.toLong, i % 5)).toDF("ok", "pri")
    val lines = (0 until 2000).map(i => ((i % 300).toLong, i)).toDF("lk", "v")
    val semi = orders.join(lines, col("ok") === col("lk"), "left_semi")
      .groupBy("pri").count()
    val anti = orders.join(lines, col("ok") === col("lk"), "left_anti")
      .groupBy("pri").count()
    Seq("semi" -> semi, "anti" -> anti).foreach { case (nm, q) =>
      val plan = finalPlan(q)
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"$nm join not hash-based:\n$plan")
    }
  }

  test("snapshot diff is one full-outer hash join over hash projections") {
    val a = (0 until 300).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val b = (5 until 305).map(i => (i.toLong, s"doc $i x")).toDF("id", "text")
    val r = graft.pipeline.Retrieval.snapshotDiff(a, b, "id", Seq("text"))
    val plan = finalPlan(r)
    assert(plan.contains("FullOuter") || plan.contains("full_outer"),
      s"not a full outer join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"non-hash join in:\n$plan")
  }

  test("rfm_segments scans the fact table once: checkpointed aggregate feeds all passes") {
    // the per-user aggregate is localCheckpoint-pinned, so the fused
    // quantile pass AND the final bucketing read the materialized
    // |users|-row frame — the deliverable's plan must contain NO
    // parquet scan at all (it previously re-scanned events 7x: once
    // per quantile-cut job plus the final aggregate)
    val df = graft.SparkEntry.queries("rfm_segments")(
      spark, "/root/testdata/sf0.001")
    val plan = finalPlan(df)
    assert(!plan.contains("Scan parquet") && !plan.contains("FileScan"),
      s"events re-scanned in the final aggregate:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan Existing"),
      s"expected the checkpointed per-user frame as the only source:\n$plan")
  }
}
