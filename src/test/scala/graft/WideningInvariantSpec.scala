package graft

import org.apache.spark.sql.Row
import graft.queries._

/** Mathematical invariants for the round-4 widening families
  * (#17–#30). The oracle gate proves cross-engine value equality;
  * these pin the SEMANTICS — the inequalities and bounds each
  * statistic must satisfy by construction — so a future refactor
  * that stays self-consistent in both engines but breaks the math
  * still fails fast.
  */
class WideningInvariantSpec extends GraftSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("q_cms_freq: estimates dominate exact counts (sketch soundness)") {
    val r = rows(SketchExactQueries.cmsFreq(spark, sf))
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("est_cnt") >= x.getAs[Long]("exact_cnt"))
      assert(x.getAs[Long]("overcount") >= 0L)
    }
  }

  test("q_bloom_fpr: no false negatives, bounded rates") {
    val r = rows(SketchExactQueries.bloomFpr(spark, sf)).head
    assert(r.getAs[Long]("n_pos") >= r.getAs[Long]("n_true"))
    assert(r.getAs[Long]("n_fp") == r.getAs[Long]("n_pos") - r.getAs[Long]("n_true"))
    assert(r.getAs[Double]("fpr") >= 0.0 && r.getAs[Double]("fpr") <= 1.0)
    assert(r.getAs[Double]("fill_factor") > 0.0 && r.getAs[Double]("fill_factor") <= 1.0)
  }

  test("q_rrf_fusion: unique contiguous ranks, monotone scores") {
    val r = rows(RetrievalQueries.rrfFusion(spark, sf))
    assert(r.map(_.getAs[Int]("fused_rank")) == (1 to r.size))
    val scores = r.map(_.getAs[Double]("rrf_score"))
    assert(scores == scores.sorted.reverse)
  }

  test("q_chunk_plan: chunks tile each document with stride 24") {
    val r = rows(RetrievalQueries.chunkPlan(spark, sf))
    r.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_id"))
      val nTok = sorted.head.getAs[Int]("n_tok").toLong
      assert(sorted.head.getAs[Long]("start_tok") == 0L)
      assert(sorted.last.getAs[Long]("end_tok") == math.min(nTok,
        sorted.last.getAs[Long]("start_tok") + 32L))
      sorted.foreach { c =>
        assert(c.getAs[Long]("start_tok") < c.getAs[Long]("end_tok"))
        assert(c.getAs[Long]("end_tok") <= nTok || nTok < 32)
      }
      // full coverage: every token index < nTok falls in some chunk
      assert(sorted.last.getAs[Long]("end_tok") >= math.min(nTok, 32L))
    }
  }

  test("q_emb_quantize: int8 error bounded by one quantization step") {
    val r = rows(EmbOpsQueries.embQuantize(spark, sf))
    assert(r.size == 64)
    r.foreach { x =>
      val step = (x.getAs[Double]("hi") - x.getAs[Double]("lo")) / 255.0
      assert(x.getAs[Double]("mse") >= 0.0)
      assert(x.getAs[Double]("max_abs_err") <= step + 1e-12)
    }
  }

  test("q_centroid_shift: cosine in [-1,1], distances non-negative") {
    val r = rows(EmbOpsQueries.centroidShift(spark, sf))
    r.foreach { x =>
      assert(math.abs(x.getAs[Double]("cos_sim")) <= 1.0 + 1e-9)
      assert(x.getAs[Double]("l2_dist") >= 0.0)
    }
  }

  test("q_anova / q_welch_t / q_linreg2: classical-statistic bounds") {
    val a = rows(StatTestQueries.anova(spark, sf)).head
    assert(a.getAs[Double]("ssb") >= 0.0 && a.getAs[Double]("ssw") >= 0.0)
    val eta = a.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    rows(StatTestQueries.welchT(spark, sf)).foreach { w =>
      assert(w.getAs[Double]("df") > 0.0)
      assert(w.getAs[Double]("df") <=
        (w.getAs[Long]("n1") + w.getAs[Long]("n2")).toDouble)
    }
    rows(StatTestQueries.linreg2(spark, sf)).foreach { l =>
      val r2 = l.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q_adamic_adar / q_clustering_coef: graph-feature bounds") {
    val aa = rows(GraphFeatureQueries.adamicAdar(spark, sf))
    assert(aa.nonEmpty)
    aa.foreach { x =>
      assert(x.getAs[Long]("shared") >= 1L)
      assert(x.getAs[Double]("aa_score") > 0.0)
    }
    rows(GraphFeatureQueries.clusteringCoef(spark, sf)).foreach { c =>
      val coef = c.getAs[Double]("coef")
      assert(coef >= 0.0 && coef <= 1.0)
    }
  }

  test("q_mase / q_theil_u: forecast metrics well-formed") {
    rows(ForecastQueries.mase(spark, sf)).foreach { m =>
      assert(m.getAs[Double]("mae_naive1") >= 0.0)
      assert(m.getAs[Double]("mase") >= 0.0)
      assert(math.abs(m.getAs[Double]("bias_ratio")) <= 1.0 + 1e-9)
    }
    rows(ForecastQueries.theilU(spark, sf)).foreach { t =>
      val u = t.getAs[Double]("u1")
      assert(u >= 0.0 && u <= 1.0)
    }
  }

  test("q_lang_kappa: agreement bounded by accuracy identities") {
    val k = rows(PathAgreementQueries.langKappa(spark, sf)).head
    val po = k.getAs[Double]("po"); val pe = k.getAs[Double]("pe")
    assert(po >= 0.0 && po <= 1.0 && pe >= 0.0 && pe <= 1.0)
    assert(k.getAs[Double]("kappa") <= 1.0)
  }

  test("q_attribution_pos: credit conserves purchasing users' weight") {
    val r = rows(PathAgreementQueries.attributionPos(spark, sf))
    val shareSum = r.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }

  test("q_join_asof_tol: tolerance only removes matches vs q_join_asof") {
    val tol = rows(PathAgreementQueries.joinAsofTol(spark, sf))
    val asof = rows(JoinQueries.joinAsof(spark, sf))
      .map(r => r.getAs[Long]("p_id") -> r.getAs[Long]("signup_event")).toMap
    assert(tol.size >= asof.size) // left join keeps unmatched purchases
    tol.foreach { r =>
      val pid = r.getAs[Long]("p_id")
      if (!r.isNullAt(r.fieldIndex("signup_event"))) {
        // a surviving match must be exactly the as-of pick
        assert(asof(pid) == r.getAs[Long]("signup_event"))
      }
    }
  }

  test("q_hapax / q_coverage_matrix: share identities") {
    rows(TextExtraQueries.hapax(spark, sf)).foreach { h =>
      assert(h.getAs[Long]("n_hapax") <= h.getAs[Long]("n_terms"))
      assert(h.getAs[Long]("n_terms") <= h.getAs[Long]("n_tokens"))
    }
    val cov = rows(HygieneQueries.coverageMatrix(spark, sf))
    cov.groupBy(_.getAs[String]("source")).foreach { case (_, cells) =>
      val s = cells.map(_.getAs[Double]("share_of_source")).sum
      assert(math.abs(s - 1.0) < 1e-3)
    }
  }

  test("q_grubbs / q_jarque_bera: non-negative test statistics") {
    rows(NormalityQueries.grubbs(spark, sf)).foreach { g =>
      assert(g.getAs[Double]("g_stat") > 0.0)
      assert(g.getAs[Double]("sd") > 0.0)
    }
    rows(NormalityQueries.jarqueBera(spark, sf)).foreach { j =>
      assert(j.getAs[Double]("jb_stat") >= 0.0)
    }
  }

  test("q_novelty_rate: day one is fully novel, rates bounded") {
    val r = rows(CorpusDriftQueries.noveltyRate(spark, sf))
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    assert(r.head.getAs[Double]("novelty_rate") == 1.0)
    r.foreach { x =>
      val nv = x.getAs[Double]("novelty_rate")
      assert(nv >= 0.0 && nv <= 1.0)
      assert(x.getAs[Long]("n_new") <= x.getAs[Long]("n_terms"))
    }
  }

  test("q_ab_srm / q_seasonal_strength: monitor bounds") {
    val srm = rows(MonitorQueries.abSrm(spark, sf)).head
    assert(srm.getAs[Double]("chi2") >= 0.0)
    val sh = srm.getAs[Double]("share_a")
    assert(sh > 0.0 && sh < 1.0)
    rows(MonitorQueries.seasonalStrength(spark, sf)).foreach { s =>
      val f = s.getAs[Double]("strength")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q_kmeans_step: one Lloyd step never increases total inertia") {
    val r = rows(KmeansStepQueries.kmeansStep(spark, sf))
    assert(r.size == 4)
    val before = r.map(_.getAs[Double]("inertia0")).sum
    val after = r.map(_.getAs[Double]("inertia1")).sum
    assert(after <= before + 1e-6)
    assert(r.map(_.getAs[Long]("n0")).sum == r.map(_.getAs[Long]("n1")).sum)
  }

  test("q_collocations: PMI computed over exact margins, ranked") {
    val r = rows(TextExtraQueries.collocations(spark, sf))
    assert(r.nonEmpty && r.size <= 20)
    val pmis = r.map(_.getAs[Double]("pmi"))
    assert(pmis == pmis.sorted.reverse)
    r.foreach(x => assert(x.getAs[Long]("c") >= 5L))
  }

  test("q_l_diversity: l bounded by the priority domain") {
    rows(HygieneQueries.lDiversity(spark, sf)).foreach { r =>
      assert(r.getAs[Long]("min_l") >= 0L)
      assert(r.getAs[Double]("avg_l") <= 5.0 + 1e-9) // 5 priorities exist
    }
  }
}
