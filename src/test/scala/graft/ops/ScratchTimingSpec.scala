package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Throwaway phase-timing harness (not part of the suite contract; fast at
  * the spec's default sf). Run manually with -z to time one shape.
  */
class ScratchTimingSpec extends AnyFunSuite with SparkSpec {

  private def t(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  test("text kernel decomposition at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
    t("scan only")(docs.select(col("doc_id"), col("n_chars")).queryExecution.toRdd.count())
    t("scan only 2")(docs.select(col("doc_id"), col("n_chars")).queryExecution.toRdd.count())
    def fpRegex = docs.select(col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")).as("fp"))
    def fpKernel = docs.select(col("doc_id"),
      md5(graft.functions.CollapseWhitespace.collapseWs(lower(trim(col("text")))).cast("binary")).as("fp"))
    t("fp regex warm")(fpRegex.queryExecution.toRdd.count())
    t("fp regex")(fpRegex.queryExecution.toRdd.count())
    t("fp kernel warm")(fpKernel.queryExecution.toRdd.count())
    t("fp kernel")(fpKernel.queryExecution.toRdd.count())
    def tcRegex = docs.select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("tc"))
    def tcKernel = docs.select(col("doc_id"),
      size(graft.functions.FastTokens.fastTokens(col("text"))).as("tc"))
    t("tokencount regex warm")(tcRegex.queryExecution.toRdd.count())
    t("tokencount regex")(tcRegex.queryExecution.toRdd.count())
    t("tokencount kernel warm")(tcKernel.queryExecution.toRdd.count())
    t("tokencount kernel")(tcKernel.queryExecution.toRdd.count())
    def exRegex = docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("t").count()
    def exKernel = docs.select(col("doc_id"),
      explode(graft.functions.FastTokens.fastTokens(col("text"))).as("t")).groupBy("t").count()
    t("explode regex warm")(exRegex.queryExecution.toRdd.count())
    t("explode regex")(exRegex.queryExecution.toRdd.count())
    t("explode kernel warm")(exKernel.queryExecution.toRdd.count())
    t("explode kernel")(exKernel.queryExecution.toRdd.count())
    t("corpus_report gate")(graft.SparkEntry.queries("corpus_report")(spark, dir)
      .queryExecution.toRdd.count())
    t("corpus_report gate 2")(graft.SparkEntry.queries("corpus_report")(spark, dir)
      .queryExecution.toRdd.count())
  }

  ignore("frozen-before-sort A/B batch 2 at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def ab(name: String)(mk: => org.apache.spark.sql.DataFrame, sortCols: Seq[String]): Unit = {
      t(s"$name warm")(mk.orderBy(sortCols.map(col): _*).queryExecution.toRdd.count())
      t(s"$name direct")(mk.orderBy(sortCols.map(col): _*).queryExecution.toRdd.count())
      t(s"$name frozen")(mk.localCheckpoint()
        .orderBy(sortCols.map(col): _*).queryExecution.toRdd.count())
    }
    ab("winsorize")(graft.ops.Outliers.winsorize(
      graft.Tables.orders(spark, dir).select(col("o_orderpriority"),
        col("o_orderkey"), col("o_totalprice")),
      Seq("o_orderpriority"), "o_totalprice", 0.05, 0.95)
      .select(col("o_orderkey"), round(col("o_totalprice_w"), 2).as("w")),
      Seq("o_orderkey"))
    ab("global_index")(graft.ops.IndexOps.globalIndex(
      graft.Tables.orders(spark, dir), "o_orderkey")
      .select(col("o_orderkey"), col("idx")), Seq("o_orderkey"))
    ab("tfidf")(graft.ext.TextOps.tfidfTopTerms(
      graft.Tables.documents(spark, dir), "doc_id", "text", 3),
      Seq("doc_id", "rank"))
  }

  ignore("frozen-before-sort A/B on big-output gates at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def interp = graft.ops.WindowOps.resampleInterp(
      graft.Tables.events(spark, dir).withColumn("es", unix_timestamp(col("ts"))),
      "user_id", "es", "value", 3600)
      .select(col("user_id"), col("bucket"),
        (round(col("value_interp") * 10000) / 10000).as("value_interp"))
    t("interp warm")(interp.orderBy("user_id", "bucket").queryExecution.toRdd.count())
    t("interp direct")(interp.orderBy("user_id", "bucket").queryExecution.toRdd.count())
    t("interp frozen")(interp.localCheckpoint()
      .orderBy("user_id", "bucket").queryExecution.toRdd.count())
    t("interp direct 2")(interp.orderBy("user_id", "bucket").queryExecution.toRdd.count())
    t("interp frozen 2")(interp.localCheckpoint()
      .orderBy("user_id", "bucket").queryExecution.toRdd.count())
  }

  ignore("lm bigram phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
    def gate = graft.ext.Pack.bigramLmScores(docs, "doc_id", "text")
    t("gate warm")(gate.queryExecution.toRdd.count())
    t("gate")(gate.queryExecution.toRdd.count())
    val toks = docs.select(col("doc_id").as("id"),
      graft.ext.TextOps.tokens(col("text")).as("ts"))
    def exploded = toks.select(col("id"),
      explode(graft.functions.ShingleStrings.shingleStrings(col("ts"), 2)).as("bg"))
    def bc = exploded.groupBy("bg").agg(count(lit(1)).as("cb"))
    def firsts = bc.select(substring_index(col("bg"), " ", 1).as("w1"), col("cb"))
      .groupBy("w1").agg(sum(col("cb")).as("__cf"))
    def lasts = toks.select(element_at(col("ts"), -1).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("__cl"))
    def uni = firsts.join(lasts, Seq("w1"))
      .select(col("w1"), (col("__cf") + coalesce(col("__cl"), lit(0L))).as("cu"))
    def pT = bc.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni, Seq("w1"))
      .select(col("bg"),
        round(col("cb").cast("double") / col("cu").cast("double") * lit(1e9))
          .cast("long").as("ps"))
    t("toks scan warm")(toks.queryExecution.toRdd.count())
    t("toks scan")(toks.queryExecution.toRdd.count())
    t("exploded only")(exploded.queryExecution.toRdd.count())
    t("bc agg")(bc.queryExecution.toRdd.count())
    t("pTab pipeline warm")(pT.queryExecution.toRdd.count())
    t("pTab pipeline")(pT.queryExecution.toRdd.count())
    val pMat = pT.localCheckpoint()
    t("pTab count")(pMat.count(): Unit)
    def fin = exploded.join(broadcast(pMat), Seq("bg"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ps")).as("p_sum_scaled"))
      .withColumn("lm_avg_scaled", expr("p_sum_scaled div n_bigrams"))
    t("final join warm")(fin.queryExecution.toRdd.count())
    t("final join")(fin.queryExecution.toRdd.count())
    t("gate again")(gate.queryExecution.toRdd.count())
  }

  ignore("lm bigram old vs new at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
    def oldForm = {
      val toks = docs.select(col("doc_id").as("id"),
        graft.ext.TextOps.tokens(col("text")).as("ts"))
      val bi = toks.select(col("id"),
        explode(graft.functions.ShingleStrings.shingleStrings(col("ts"), 2)).as("bg"))
      val uni = toks.select(explode(col("ts")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("cu"))
      val bc = bi.groupBy("bg").agg(count(lit(1)).as("cb"))
      bi.join(bc, Seq("bg"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
        .join(uni, Seq("w1"))
        .withColumn("ps",
          round(col("cb").cast("double") / col("cu").cast("double") * lit(1e9)).cast("long"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("ps")).as("p_sum_scaled"))
        .withColumn("lm_avg_scaled", expr("p_sum_scaled div n_bigrams"))
    }
    def newForm = graft.ext.Pack.bigramLmScores(docs, "doc_id", "text")
    t("old warm-up")(oldForm.queryExecution.toRdd.count())
    t("new warm-up")(newForm.queryExecution.toRdd.count())
    t("old form")(oldForm.queryExecution.toRdd.count())
    t("new form")(newForm.queryExecution.toRdd.count())
    t("old form 2")(oldForm.queryExecution.toRdd.count())
    t("new form 2")(newForm.queryExecution.toRdd.count())
  }

  ignore("prefix jaccard phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
    import org.apache.spark.sql.expressions.Window
    t("sets checkpoint") {
      docs.select(col("doc_id").as("id"),
        graft.functions.ShingleHashes.shingleHashes(col("text"), 5).as("set"))
        .filter(size(col("set")) > 0).localCheckpoint().count()
    }
    val sets = docs.select(col("doc_id").as("id"),
      graft.functions.ShingleHashes.shingleHashes(col("text"), 5).as("set"))
      .filter(size(col("set")) > 0).localCheckpoint()
    val ex = sets.select(col("id"), size(col("set")).cast("long").as("sz"),
      explode(col("set")).as("s"))
    val dfTab = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfTab, Seq("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df").asc, col("s").asc)))
    val prefix = ranked
      .filter(col("rn") <= col("sz") - ceil(col("sz") * lit(0.8) - lit(1e-9)) + 1)
      .select("id", "sz", "s")
    t("prefix relation")(info(s"prefix rows=${prefix.queryExecution.toRdd.count()}"))
    val pa = prefix.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a"))
    val pb = prefix.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b"))
    val cand = pa.join(pb, pa("s") === pb("s") && pa("id_a") < pb("id_b")
        && pb("sz_b") * lit(0.8) - lit(1e-9) <= pa("sz_a")
        && pa("sz_a") * lit(0.8) - lit(1e-9) <= pb("sz_b"))
      .select("id_a", "id_b").distinct()
    t("candidates")(info(s"cand rows=${cand.queryExecution.toRdd.count()}"))
    t("full gate") {
      graft.ext.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 5, 0.8)
        .queryExecution.toRdd.count()
    }
    t("full gate again") {
      graft.ext.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 5, 0.8)
        .queryExecution.toRdd.count()
    }
  }

  ignore("stream gate steady-state at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val q = graft.SparkEntry.queries("stream_session_windows")
    t("session gate run 1")(q(spark, dir).queryExecution.toRdd.count())
    t("session gate run 2")(q(spark, dir).queryExecution.toRdd.count())
    t("session gate run 3")(q(spark, dir).queryExecution.toRdd.count())
    val q2 = graft.SparkEntry.queries("stream_tumbling_counts")
    t("tumbling gate run 1")(q2(spark, dir).queryExecution.toRdd.count())
    t("tumbling gate run 2")(q2(spark, dir).queryExecution.toRdd.count())
    // raw queries at different state partition counts
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamOps
    val landingS = StreamOps.eventsLandingWithSentinel(spark, dir)
    val landingP = StreamOps.eventsLanding(spark, dir)
    Seq("8", "4", "2", "1").foreach { p =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        t(s"session raw parts=$p") {
          val stream = StreamOps.readEventStream(spark, landingS, maxFilesPerTrigger = Some(2))
          StreamOps.runToMemory(StreamOps.sessionCounts(stream, gapSeconds = 1800),
            s"scratch_session_sink_$p", OutputMode.Append())
        }
        t(s"ssj raw parts=$p") {
          val left = StreamOps.readEventStream(spark, landingP, maxFilesPerTrigger = Some(1))
            .filter(col("user_id") % 4 === 0)
          val right = StreamOps.readEventStream(spark, landingP, maxFilesPerTrigger = Some(2))
            .filter(col("user_id") % 4 === 0)
          StreamOps.runToMemory(
            StreamOps.pairsWithin(left, right, withinSeconds = 300, watermark = "30 days"),
            s"scratch_ssj_sink_$p", OutputMode.Append())
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  ignore("zorder phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    import graft.ops.ZOrder
    val orders = graft.Tables.orders(spark, dir)
    def q = orders.select(col("o_orderkey"),
      expr("CAST(o_custkey % 1024 AS BIGINT)").as("qa"),
      expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') % 1024 AS BIGINT)").as("qb"))
    t("scan+quantize only")(q.queryExecution.toRdd.count())
    t("with zv")(q.select(col("o_orderkey"),
      ZOrder.zvalue("qa", "qb", 10).cast("long").as("zv")).queryExecution.toRdd.count())
    t("with zv again")(q.select(col("o_orderkey"),
      ZOrder.zvalue("qa", "qb", 10).cast("long").as("zv")).queryExecution.toRdd.count())
    t("with zv + orderBy")(q.select(col("o_orderkey"),
      ZOrder.zvalue("qa", "qb", 10).cast("long").as("zv"))
      .orderBy("o_orderkey").queryExecution.toRdd.count())
  }

  ignore("fuzzy phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir)
    import graft.ext.Dedup
    t("pair count stats") {
      val d = docs.select(split_part(trim(col("text")), lit(" "), lit(1)).as("b1"))
      val s = d.groupBy("b1").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).as("pairs"),
          count(lit(1)).as("vocab"), max(col("count")).as("biggest")).head()
      info(s"exact-block pairs=${s.get(0)} vocab=${s.get(1)} biggest=${s.get(2)}")
    }
    val dd = docs.select(col("doc_id").as("id"),
      substring(trim(col("text")), 1, 40).as("pfx"),
      split_part(trim(col("text")), lit(" "), lit(1)).as("b1"))
    def rn(s: String) = dd.withColumnsRenamed(Map(
      "id" -> s"id_$s", "pfx" -> s"pfx_$s", "b1" -> s"b1_$s"))
    t("enumerate only (no dist)") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b"))
        .queryExecution.toRdd.count()
      info(s"enumerated=$n")
    }
    t("enumerate + bag filter") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b") &&
          graft.functions.BagBound.editBound(col("pfx_a"), col("pfx_b")) <= 12)
        .queryExecution.toRdd.count()
      info(s"bag-pass=$n")
    }
    t("enumerate + myers filter") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b") &&
          graft.functions.MyersBound.editBound(col("pfx_a"), col("pfx_b")) <= 12)
        .queryExecution.toRdd.count()
      info(s"myers-pass=$n")
    }
    t("enumerate + dp only") {
      val n = rn("a").join(rn("b"),
        col("b1_a") === col("b1_b") && col("id_a") < col("id_b") &&
          levenshtein(col("pfx_a"), col("pfx_b"), 12) >= 0)
        .queryExecution.toRdd.count()
      info(s"dp-pass=$n")
    }
    t("exact branch only") {
      Dedup.fuzzyPairsBlocked(docs, "doc_id", "text", maxDist = 12,
        prefixLen = 40, dualBlock = false).queryExecution.toRdd.count()
    }
    t("dual (full)") {
      Dedup.fuzzyPairsBlocked(docs, "doc_id", "text", maxDist = 12,
        prefixLen = 40).queryExecution.toRdd.count()
    }
    t("dual + orderBy") {
      Dedup.fuzzyPairsBlocked(docs, "doc_id", "text", maxDist = 12,
        prefixLen = 40).orderBy("id_a", "id_b").queryExecution.toRdd.count()
    }
  }

  test("equidepth phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val li = graft.Tables.lineitem(spark, dir)
    t("warm scan")(li.select("l_extendedprice").queryExecution.toRdd.count())
    t("scan again")(li.select("l_extendedprice").queryExecution.toRdd.count())
    val probs = (1 until 10).map(_.toDouble / 10)
    def sketch(acc: Int): Unit = {
      val brSql = (probs.map(p => math.max(0.0, p - 4.0 / acc)) ++
        probs.map(p => math.min(1.0, p + 4.0 / acc))).mkString("array(", ",", ")")
      li.agg(count(col("l_extendedprice")).as("n"),
        expr(s"approx_percentile(CAST(l_extendedprice AS DOUBLE), $brSql, $acc)")).head()
    }
    for (r <- 1 to 3; acc <- Seq(1000, 10000)) t(s"sketch acc $acc r$r")(sketch(acc))
    t("count only")(li.agg(count(col("l_extendedprice"))).head())
    t("exactPercentiles full") {
      QuantileSelect.exactPercentiles(li, "l_extendedprice", probs)
    }
    val fences = QuantileSelect.exactPercentiles(li, "l_extendedprice", probs)
    t("bucketing pass only") {
      val bucket = graft.functions.SortedLowerBound.bucket(
        col("l_extendedprice").cast("double"), fences.distinct.sorted)
      li.filter(col("l_extendedprice").isNotNull)
        .withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .queryExecution.toRdd.count()
    }
    t("full gate") {
      Profile.equiDepthHistogram(li, "l_extendedprice", b = 10)
        .queryExecution.toRdd.count()
    }
    t("full gate again") {
      Profile.equiDepthHistogram(li, "l_extendedprice", b = 10)
        .queryExecution.toRdd.count()
    }
  }

  test("corpus_clean phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    import graft.ext.{TextOps, Dedup}
    val docs = graft.Tables.documents(spark, dir)
    val t0 = col("text")
    def kept0 = docs
      .filter(TextOps.tokenCount(t0) >= 30)
      .filter(TextOps.punctRatio(t0) <= 0.2)
      .filter(TextOps.languageId(t0, TextOps.defaultLexicons).isin("en", "es"))
    t("quality scan warm")(kept0.queryExecution.toRdd.count())
    t("quality scan")(kept0.queryExecution.toRdd.count())
    t("checkpoint")(kept0.localCheckpoint().queryExecution.toRdd.count())
    val kept = kept0.localCheckpoint()
    t("pairs")(Dedup.ngramJaccardPairs(kept, "doc_id", "text", 3, 0.4)
      .queryExecution.toRdd.count())
    val pairs = Dedup.ngramJaccardPairs(kept, "doc_id", "text", 3, 0.4)
    t("cc")(Dedup.connectedComponents(pairs).queryExecution.toRdd.count())
    t("full gate")(graft.SparkEntry.queries("corpus_clean")(spark, dir)
      .queryExecution.toRdd.count())
    t("full gate 2")(graft.SparkEntry.queries("corpus_clean")(spark, dir)
      .queryExecution.toRdd.count())
  }

  ignore("global_index phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val orders = graft.Tables.orders(spark, dir)
    t("warm scan")(orders.select("o_orderkey").queryExecution.toRdd.count())
    t("scan again")(orders.select("o_orderkey").queryExecution.toRdd.count())
    t("sketch only") {
      orders.select(expr(
        "approx_percentile(CAST(o_orderkey AS DOUBLE), array(0.5), 100)")).head()
    }
    t("globalIndex no orderBy") {
      IndexOps.globalIndex(orders, "o_orderkey")
        .select(col("o_orderkey"), col("idx")).queryExecution.toRdd.count()
    }
    t("globalIndex + orderBy") {
      IndexOps.globalIndex(orders, "o_orderkey")
        .select(col("o_orderkey"), col("idx"))
        .orderBy("o_orderkey").queryExecution.toRdd.count()
    }
    t("plain row_number singleton") {
      orders.select(col("o_orderkey"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("o_orderkey")))
        .cast("long").as("idx")).queryExecution.toRdd.count()
    }
  }

  ignore("boilerplate shapes at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def docs = graft.Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"), lit("\n"),
        when(col("doc_id") % 3 === 0, lit("subscribe to our newsletter"))
          .otherwise(concat(lit("footer "), col("doc_id").cast("string"))),
        lit("\n"), lit("copyright 2026 example corp")).as("text"))
    def current = graft.ext.TextOps.removeRepeatedLines(docs, "doc_id", "text", 10)
    t("current warm")(current.queryExecution.toRdd.count())
    t("current")(current.queryExecution.toRdd.count())
    info("plan: " + current.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
      .mkString(" || "))
    // old anti-join + join-back shape
    def old = {
      val lines = docs.select(col("doc_id").as("__graft_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      val hot = lines.select("__graft_id", "line").distinct()
        .groupBy("line").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 10)
        .select("line")
      val kept = lines.join(hot, Seq("line"), "left_anti")
        .groupBy(col("__graft_id"))
        .agg(array_join(expr("transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"),
          "\n").as("text_clean"))
      docs.select(col("doc_id"))
        .join(kept.withColumnsRenamed(Map("__graft_id" -> "doc_id")), Seq("doc_id"), "left")
        .withColumn("text_clean", coalesce(col("text_clean"), lit("")))
    }
    t("old shape warm")(old.queryExecution.toRdd.count())
    t("old shape")(old.queryExecution.toRdd.count())
    // current with explicit broadcast of hot
    def bcast = {
      val lines = docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      val hot = lines.select(col("doc_id"), col("line")).distinct()
        .groupBy("line").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 10)
        .select(col("line").as("__hot_line"))
      lines.join(broadcast(hot), col("line") === col("__hot_line"), "left")
        .groupBy(col("doc_id"))
        .agg(array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN __hot_line IS NULL" +
            " THEN struct(pos, line) END)), x -> x.line)"),
          "\n").as("text_clean"))
    }
    t("bcast shape warm")(bcast.queryExecution.toRdd.count())
    t("bcast shape")(bcast.queryExecution.toRdd.count())
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  ignore("pagerank phases at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    def edges = {
      val li = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val ord = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val fwd = joined.select(col("o_custkey").as("src"),
        (col("l_suppkey") + 100000L).as("dst")).distinct()
      fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
    }
    t("edge prep only (count)")(edges.queryExecution.toRdd.count())
    t("edge prep again")(edges.queryExecution.toRdd.count())
    t("edge prep + checkpoint") {
      val e = edges.localCheckpoint()
      info(s"  edges = ${e.count()}")
    }
    def full() = graft.ext.PageRank.pageRank(edges, iterations = 5, noDangling = true)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .queryExecution.toRdd.count()
    t("full pagerank gate")(full())
    t("full pagerank gate 2")(full())

    // variant: broadcast(deg) weights join + checkpoint every other iteration
    def variant(bcastDeg: Boolean, ckptEvery: Int): Long = {
      val e = edges.localCheckpoint()
      val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("d"))
        .localCheckpoint()
      val nodes = deg.select(col("src").as("node"))
      val n = nodes.count().toDouble
      var ranks = nodes.withColumn("rank", lit(1.0 / n))
      for (i <- 1 to 5) {
        val degSide = if (bcastDeg) broadcast(deg) else deg
        val weights = ranks.join(degSide, ranks("node") === deg("src"))
          .select(col("src"), (col("rank") / col("d")).as("w"))
        val contribs = e.join(broadcast(weights), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("w")).as("contrib"))
        ranks = contribs.select(col("node"),
          (lit((1 - 0.85) / n) + lit(0.85) * col("contrib")).as("rank"))
        if (i % ckptEvery == 0 || i == 5) ranks = ranks.localCheckpoint(eager = false)
      }
      ranks.select(col("node"), round(col("rank"), 6).as("rank"))
        .queryExecution.toRdd.count()
    }
    t("variant bcastDeg ckpt1")(info(s"  n=${variant(true, 1)}"))
    t("variant bcastDeg ckpt1 again")(info(s"  n=${variant(true, 1)}"))
    t("variant bcastDeg ckpt2")(info(s"  n=${variant(true, 2)}"))
    t("variant bcastDeg ckpt2 again")(info(s"  n=${variant(true, 2)}"))
    t("variant smjDeg ckpt2")(info(s"  n=${variant(false, 2)}"))

    // fwd-only checkpoint: half the checkpoint write; e = pairs ∪ swap(pairs)
    def variantFwd(ckptEvery: Int): Long = {
      val li = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val ord = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val fwd = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst")).distinct()
        .localCheckpoint()
      val e = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("d"))
        .localCheckpoint()
      val nodes = deg.select(col("src").as("node"))
      val n = nodes.count().toDouble
      var ranks = nodes.withColumn("rank", lit(1.0 / n))
      for (i <- 1 to 5) {
        val weights = ranks.join(broadcast(deg), ranks("node") === deg("src"))
          .select(col("src"), (col("rank") / col("d")).as("w"))
        val contribs = e.join(broadcast(weights), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("w")).as("contrib"))
        ranks = contribs.select(col("node"),
          (lit((1 - 0.85) / n) + lit(0.85) * col("contrib")).as("rank"))
        if (i % ckptEvery == 0 || i == 5) ranks = ranks.localCheckpoint(eager = false)
      }
      ranks.select(col("node"), round(col("rank"), 6).as("rank"))
        .queryExecution.toRdd.count()
    }
    t("variant fwdOnly ckpt2")(info(s"  n=${variantFwd(2)}"))
    t("variant fwdOnly ckpt2 again")(info(s"  n=${variantFwd(2)}"))
    t("variant fwdOnly ckpt2 third")(info(s"  n=${variantFwd(2)}"))
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
