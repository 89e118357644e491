package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 waves 166-169: semantic invariants the hash compare can't
  * localize — an independent driver-side priority-sampling selection, the
  * spec-decoding emitted-token identity, Heaps-fit sanity bounds, and the
  * chat-template validity partition. */
class Round11Waves2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fold48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    md.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  test("sample_priority_weighted matches an independent driver-side selection") {
    val docs = H.tbl(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = docs.map { case (id, nc) =>
      val w = math.min(math.max(nc, 1L), 4096L)
      val h = fold48(s"pri:$id")
      (id, w, w * 281474976710656L / (h + 1))
    }
    val ord = keyed.sortBy { case (id, _, k) => (-k, id) }
    val tau = ord(64)._3
    val sampleW = ord.take(64).map(_._2).sum
    val est = ord.take(64).map { case (_, w, _) => math.max(w, tau) }
      .map(BigInt(_)).sum
    val got = SparkEntry.queries("sample_priority_weighted")(spark, sf).head()
    assert(got.getAs[Long]("tau") == tau)
    assert(got.getAs[Long]("sample_w") == sampleW)
    assert(got.getAs[String]("est_w") == est.toString)
    assert(got.getAs[Long]("true_w") ==
      keyed.map(_._2).sum && got.getAs[Long]("n_docs") == docs.length)
  }

  test("serve_specdec_accept: emitted = steps + accepted and the histogram covers every block") {
    val rows = SparkEntry.queries("serve_specdec_accept")(spark, sf).collect()
    val nTokens = H.tbl(spark, sf, "documents")
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    Seq(2L, 4L, 8L).foreach { g =>
      val face = rows.filter(_.getAs[Long]("gamma") == g)
      val steps = face.head.getAs[Long]("n_steps")
      val emitted = face.head.getAs[Long]("emitted_total")
      // per-block emitted = accepted + 1 → totals obey emitted = steps + Σa
      val sumA = face.map(r => r.getAs[Long]("a") * r.getAs[Long]("n_blocks")).sum
      assert(emitted == steps + sumA, s"gamma=$g identity")
      assert(face.map(_.getAs[Long]("n_blocks")).sum == steps)
      // every token is drafted exactly once across blocks: Σ blocklen = n
      // and steps = Σ_docs ceil(n_doc/γ) ≥ n/γ
      assert(steps >= (nTokens + g - 1) / g, s"gamma=$g step lower bound")
      // acceptance can't exceed γ, and the bonus row a=γ must exist at 10%
      // corruption (P[full block clean] ≈ 0.9^γ >> 1/steps)
      assert(face.map(_.getAs[Long]("a")).max == g, s"gamma=$g bonus row")
    }
  }

  test("vocab_heaps_law: beta in (0,1), K > 0, totals match direct counts") {
    val got = SparkEntry.queries("vocab_heaps_law")(spark, sf).head()
    val beta = got.getAs[Long]("beta_micro")
    assert(beta > 0 && beta < 1000000, s"Heaps exponent out of range: $beta")
    assert(got.getAs[Long]("k_micro") > 0)
    // independent shingle construction: driver-side sliding over tokens
    val docRows = H.tbl(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" ", -1))
    val vTotal = docRows.iterator.flatMap(
      _.sliding(3).filter(_.length == 3).map(_.mkString(" "))).toSet.size.toLong
    val tTotal = docRows.map(a => math.max(a.length - 2, 0).toLong).sum
    assert(got.getAs[Long]("v_total") == vTotal)
    assert(got.getAs[Long]("t_total") == tTotal)
    assert(got.getAs[Long]("n_points") >= 6)
  }

  test("rank_ndcg_mrr matches a full independent driver-side eval") {
    val docIds = H.tbl(spark, sf, "documents").select("doc_id").collect()
      .map(_.getLong(0))
    def grade(q: Long, d: Long): Long = fold48(s"rl:$q:$d") % 10 match {
      case 0 => 3L; case x if x <= 2 => 2L; case x if x <= 5 => 1L; case _ => 0L
    }
    val cand = for {
      q <- (0L until 50L).toSeq; d <- docIds
      if fold48(s"qd:$q:$d") % 100 == 0
    } yield (q, d, fold48(s"sc:$q:$d"), grade(q, d))
    def dcgOf(gs: Seq[Long]): Double = gs.zipWithIndex.map { case (g, i) =>
      (math.pow(2, g.toDouble) - 1) / (math.log(i + 2.0) / math.log(2.0))
    }.sum
    val perq = cand.groupBy(_._1).toSeq.map { case (_, rows) =>
      val sys = rows.sortBy(r => (-r._3, r._2)).take(10)
      val ideal = rows.sortBy(r => (-r._4, -r._3, r._2)).take(10)
      val (dcg, idcg) = (dcgOf(sys.map(_._4)), dcgOf(ideal.map(_._4)))
      val fr = sys.indexWhere(_._4 >= 2)
      (if (idcg > 0) dcg / idcg else 0.0,
        if (fr >= 0) 1.0 / (fr + 1) else 0.0,
        sys.count(_._4 >= 1) / 10.0)
    }
    val got = SparkEntry.queries("rank_ndcg_mrr")(spark, sf).head()
    assert(got.getAs[Long]("n_queries") == perq.length)
    assert(got.getAs[Long]("n_candidates") == cand.length)
    def micro(x: Double) = math.floor(x * 1000000 + 0.5).toLong
    assert(math.abs(got.getAs[Long]("ndcg10_micro")
      - micro(perq.map(_._1).sum / perq.length)) <= 1)
    assert(math.abs(got.getAs[Long]("mrr_micro")
      - micro(perq.map(_._2).sum / perq.length)) <= 1)
    assert(math.abs(got.getAs[Long]("p10_micro")
      - micro(perq.map(_._3).sum / perq.length)) <= 1)
  }

  test("privacy_dp_accounting: advanced composition beats basic once k is large") {
    val rows = SparkEntry.queries("privacy_dp_accounting")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val k = r.getAs[Long]("n_releases")
      val basic = r.getAs[Long]("eps_sum_milli")
      val adv = r.getAs[Long]("eps_advanced_micro")
      // ε ∈ [0.1, 0.5] per release → Σε bounded by k's envelope
      assert(basic >= 100 * k && basic <= 500 * k)
      // with hundreds of small-ε releases the √k advanced bound must be
      // far below kε sequential composition
      assert(adv < basic * 1000, s"advanced ≥ basic for ${r.getString(0)}")
      assert(r.getAs[Long]("eps_sq_sum") >= basic * 100,
        "Σε² below the Cauchy-Schwarz floor")
    }
  }

  test("dedup_benchmark_decontam matches a driver-side 13-gram containment sweep") {
    val docs = H.tbl(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    def grams(a: Array[String]) =
      if (a.length >= 13) a.sliding(13).map(_.mkString(" ")).toSet
      else Set.empty[String]
    val ev = docs.filter(_._1 < 64).map(t => grams(t._3))
      .foldLeft(Set.empty[String])(_ ++ _)
    val train = docs.filter(_._1 >= 64)
    val contaminated = train.filter(t => grams(t._3).exists(ev.contains))
      .map(_._1).toSet
    val got = SparkEntry.queries("dedup_benchmark_decontam")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_train_docs"), r.getAs[Long]("n_contaminated"))).toMap
    assert(got.values.map(_._1).sum == train.length)
    assert(got.values.map(_._2).sum == contaminated.size)
    train.groupBy(_._2).foreach { case (src, rows) =>
      assert(got(src)._1 == rows.length, s"n_train_docs for $src")
      assert(got(src)._2 == rows.count(r => contaminated(r._1)),
        s"n_contaminated for $src")
    }
    assert(contaminated.nonEmpty, "planted dup clusters must straddle the eval window")
  }

  test("pref_best_of_n: curve is monotone and n=1 equals the plain mean") {
    val rows = SparkEntry.queries("pref_best_of_n")(spark, sf)
      .orderBy("n").collect()
    assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    val curve = rows.map(_.getAs[Long]("e_best_milli"))
    assert(curve.sliding(2).forall(p => p(1) >= p(0)), "E[max_n] must rise")
    // E[max of 1] is the mean reward, averaged over prompts
    val mean = H.events(spark, sf).groupBy("user_id")
      .agg(avg("value").as("m")).agg(avg("m")).head().getDouble(0)
    assert(math.abs(curve(0) - math.floor(mean * 1000 + 0.5)) <= 1)
  }

  test("text_needle_insert recovers every planted needle at every depth") {
    val rows = SparkEntry.queries("text_needle_insert")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_recovered") == r.getAs[Long]("n_samples"),
        s"depth ${r.getAs[Long]("depth")}")
    }
  }

  test("source_jsonl_gzip writes real .gz parts (compression actually on)") {
    // run the query (it writes its sink dir), then find the newest sink
    SparkEntry.queries("source_jsonl_gzip")(spark, sf).collect()
    val scratch = new java.io.File(H.scratchDir)
    val sink = scratch.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_jsonl_gz"))
      .maxBy(_.lastModified)
    val parts = new java.io.File(sink, "docs").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".gz")))
    // and the bytes really are gzip (magic 1f 8b)
    val in = new java.io.FileInputStream(parts.head)
    val magic = Array.fill(2)(in.read()); in.close()
    assert(magic.toSeq == Seq(0x1f, 0x8b))
  }

  test("pipeline_rlhf_prep: funnel invariants and gate arithmetic hold per stratum") {
    val rows = SparkEntry.queries("pipeline_rlhf_prep")(spark, sf).collect()
    val nTrain = H.tbl(spark, sf, "documents")
      .filter(col("doc_id") >= 64).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nTrain)
    rows.foreach { r =>
      val (nd, nc) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_clean"))
      val (raw, kept) = (r.getAs[Long]("n_pairs_raw"),
        r.getAs[Long]("n_pairs_kept"))
      assert(nc <= nd, "clean ≤ docs")
      assert(raw <= 3 * math.max(nc - 1, 0), "≤3 partners per ranked doc")
      assert(kept <= raw)
      if (kept > 0)
        assert(r.getAs[Long]("kept_margin_milli") >= 5000,
          s"kept pairs must honor the margin≥5 gate (${r.getString(0)}/${r.getString(1)})")
      else assert(r.getAs[Long]("mask_chars") == 0L)
    }
    // the funnel must actually cut (gates that pass everything are dead)
    assert(rows.map(_.getAs[Long]("n_clean")).sum < nTrain)
    assert(rows.map(_.getAs[Long]("n_pairs_kept")).sum <
      rows.map(_.getAs[Long]("n_pairs_raw")).sum)
    assert(rows.map(_.getAs[Long]("n_pairs_kept")).sum > 0)
  }

  test("eval_bleu_pairwise: BLEU ∈ [0,1], pair counts = docs-per-source − 1") {
    val rows = SparkEntry.queries("eval_bleu_pairwise")(spark, sf).collect()
    val perSource = H.tbl(spark, sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == perSource(r.getString(0)) - 1)
      val b = r.getAs[Long]("bleu2_micro")
      assert(b >= 0 && b <= 1000000)
      assert(r.getAs[Long]("max_bleu2_micro") >= b)
    }
  }

  test("stats_granger_lite matches an independent driver-side FWL computation") {
    val spine = H.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("ts").cast("date").as("d"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy("d").agg(
        coalesce(max(when(col("event_type") === "click", col("c"))), lit(0L))
          .as("a"),
        coalesce(max(when(col("event_type") === "purchase", col("c"))), lit(0L))
          .as("b"))
      .collect().map(r => (r.getDate(0).toLocalDate,
        r.getLong(1).toDouble, r.getLong(2).toDouble))
      .sortBy(_._1.toEpochDay)
    val byDay = spine.map(t => t._1.toEpochDay -> (t._2, t._3)).toMap
    val lagged = spine.flatMap { case (d, a, b) =>
      byDay.get(d.toEpochDay - 1).map { case (al, bl) => (a, b, al, bl) }
    }
    def f(y: Array[Double], z: Array[Double], x: Array[Double]): Double = {
      val n = y.length.toDouble
      def m(v: Array[Double]) = v.sum / n
      val (my, mz, mx) = (m(y), m(z), m(x))
      val syz = y.zip(z).map(p => p._1 * p._2).sum - n * my * mz
      val szz = z.map(v => v * v).sum - n * mz * mz
      val sxz = x.zip(z).map(p => p._1 * p._2).sum - n * mx * mz
      val ey = y.zip(z).map { case (yv, zv) => (yv - my) - syz / szz * (zv - mz) }
      val ex = x.zip(z).map { case (xv, zv) => (xv - mx) - sxz / szz * (zv - mz) }
      val (see, sex, sxx) = (ey.map(v => v * v).sum,
        ey.zip(ex).map(p => p._1 * p._2).sum, ex.map(v => v * v).sum)
      if (sxx == 0) 0.0
      else (sex * sex / sxx) / ((see - sex * sex / sxx) / (y.length - 3))
    }
    val fBa = f(lagged.map(_._1), lagged.map(_._3), lagged.map(_._4))
    val fAb = f(lagged.map(_._2), lagged.map(_._4), lagged.map(_._3))
    val got = SparkEntry.queries("stats_granger_lite")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("f_milli")).toMap
    assert(math.abs(got("ba") - math.floor(fBa * 1000 + 0.5)) <= 1)
    assert(math.abs(got("ab") - math.floor(fAb * 1000 + 0.5)) <= 1)
  }

  test("privacy_synthetic_marginals: marginals survive, the joint pays the independence cost") {
    val got = SparkEntry.queries("privacy_synthetic_marginals")(spark, sf).head()
    assert(got.getAs[Long]("n_rows") ==
      H.tbl(spark, sf, "documents").count())
    val (tl, ts2) = (got.getAs[Long]("tvd_lang_milli"),
      got.getAs[Long]("tvd_source_milli"))
    val (tj, ig) = (got.getAs[Long]("tvd_joint_milli"),
      got.getAs[Long]("indep_gap_milli"))
    // 1-way marginals are preserved up to sampling noise; the 2-way joint
    // additionally pays the dropped correlation (≈ the independence gap)
    assert(tl < 200 && ts2 < 200, s"marginal TVD too large: $tl/$ts2")
    assert(tj >= ig - 100, "joint TVD cannot beat the independence floor by more than noise")
    assert(tj <= 1000 && ig <= 1000)
    assert(tj > tl && tj > ts2, "joint must carry more error than the marginals")
  }

  test("clf_logreg_train recovers the planted model's structure") {
    val got = SparkEntry.queries("clf_logreg_train")(spark, sf).head()
    val (b1, b2, b0) = (got.getAs[Long]("b1_milli"),
      got.getAs[Long]("b2_milli"), got.getAs[Long]("b0_milli"))
    // plant: y = 1 iff 0.9·x1 − 0.7·x2 + 0.3 + u > 0 — after 3 IRLS
    // rounds the logistic scale is still growing, but the SIGNS and the
    // separation quality are structural facts
    assert(b1 > 0 && b2 < 0 && b0 > 0, s"sign pattern: $b1/$b2/$b0")
    assert(got.getAs[Long]("train_acc_milli") >= 850,
      "a well-conditioned 2-feature plant must separate ≥85%")
    assert(got.getAs[Long]("n_docs") ==
      H.tbl(spark, sf, "documents").count())
  }

  test("clf_naive_bayes_train: dialect-marked NB separates the languages") {
    val rows = SparkEntry.queries("clf_naive_bayes_train")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("acc_milli") >= 900,
        s"lang ${r.getString(0)}: ${r.getAs[Long]("acc_milli")}")
    }
    val nTest = H.tbl(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(rows.map(_.getAs[Long]("n_test")).sum == nTest)
  }

  test("er_fellegi_sunter_em: dead feature pinned to 0, u's recovered, λ bounded by truth") {
    val got = SparkEntry.queries("er_fellegi_sunter_em")(spark, sf).head()
    // f1 never fires in the fixture → EM must drive m1 (and u1) to 0
    assert(got.getAs[Long]("m1_micro") == 0 && got.getAs[Long]("u1_micro") == 0)
    // u-parameters are identified from the dominant non-match mass:
    // EM's estimate must land within 2% absolute of the labeled truth
    assert(math.abs(got.getAs[Long]("u2_micro")
      - got.getAs[Long]("true_u2_micro")) <= 20000)
    // λ sits between 0 and the true prevalence (the documented
    // conflation of mode-0 matches can only shrink the latent class)
    val lam = got.getAs[Long]("lam_micro")
    assert(lam > 0 && lam <= got.getAs[Long]("true_prevalence_micro"))
    // the latent match class must be high-m on the informative features
    assert(got.getAs[Long]("m2_micro") > 900000)
    assert(got.getAs[Long]("m3_micro") > 900000)
  }

  test("privacy_dpsgd_rdp: more noise → smaller ε; order and geometry sane") {
    val rows = SparkEntry.queries("privacy_dpsgd_rdp")(spark, sf)
      .orderBy("sigma_milli").collect()
    assert(rows.map(_.getAs[Long]("sigma_milli")).toSeq ==
      Seq(500L, 1000L, 2000L))
    val eps = rows.map(_.getAs[Long]("eps_micro"))
    assert(eps(0) > eps(1) && eps(1) > eps(2),
      s"ε must fall as σ rises: ${eps.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("eps_micro") > 0)
      val a = r.getAs[Long]("best_alpha")
      assert(a >= 2 && a <= 32)
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("steps") == 3 * ((n + 63) / 64))
      assert(r.getAs[Long]("q_micro") ==
        math.floor(64.0 / n * 1000000 + 0.5).toLong)
    }
    // independent recompute of the σ=1.0 face on the driver
    val n = rows(1).getAs[Long]("n").toDouble
    val q = 64.0 / n; val t = 3 * math.ceil(n / 64.0); val delta = 1 / (n * n)
    def c(a: Int, k: Int) =
      (1 to k).foldLeft(1L)((acc, i) => acc * (a - i + 1) / i).toDouble
    val best = (2 to 32).map { a =>
      val s = (0 to a).map(k => c(a, k) * math.pow(1 - q, a - k) *
        math.pow(q, k) * math.exp(k * (k - 1) / 2.0)).sum
      t * math.log(s) / (a - 1) + math.log(1 / delta) / (a - 1)
    }.min
    assert(math.abs(rows(1).getAs[Long]("eps_micro")
      - math.floor(best * 1000000 + 0.5)) <= 2)
  }

  test("dq_chat_template: violation flags partition the corpus and mask ≤ content") {
    val got = SparkEntry.queries("dq_chat_template")(spark, sf).head()
    val n = got.getAs[Long]("n_convs")
    assert(n == H.tbl(spark, sf, "documents").count())
    val valid = got.getAs[Long]("n_valid")
    val viols = Seq("n_alt_viol", "n_empty_viol", "n_no_assistant",
      "n_bad_final").map(got.getAs[Long])
    // a conv is invalid iff it carries ≥1 flag: valid + |union of flags| = n,
    // and the union is bounded by the flag sum
    assert(valid < n && valid > 0, s"degenerate validity split: $valid/$n")
    assert(viols.sum >= n - valid, "flags must cover every invalid conv")
    assert(viols.forall(_ <= n - valid), "no flag can exceed the invalid count")
    val mask = got.getAs[Long]("mask_chars")
    val content = got.getAs[Long]("content_chars")
    assert(mask > 0 && mask < content)
    assert(got.getAs[Long]("mask_ratio_milli") == mask * 1000 / content)
  }
}
