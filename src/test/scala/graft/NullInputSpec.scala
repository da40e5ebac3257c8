package graft

import org.scalatest.funsuite.AnyFunSuite

/** Real corpora contain NULL and empty documents; every text-family
  * operator must run over them without crashing (SQL null semantics:
  * null rows flow through projections as nulls, never match joins,
  * and fall out of explodes). Complements EmptyInputSpec (0-row
  * tables) with null/empty VALUES inside populated tables.
  */
class NullInputSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("null-docs").toString
    val docs = Seq[(Long, String, String, String, Long)](
      (0L, "the quick brown fox jumps over the lazy dog", "en", "src0", 43L),
      (1L, null, "en", "src0", 0L),
      (2L, "", "en", "src1", 0L),
      (3L, "alpha beta gamma delta epsilon zeta", "fr", "src1", 35L),
      (102L, "the quick brown fox jumps over the lazy dog", "en", "src2", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val documentQueries = Seq(
    "q_text_stats", "q_tokens", "q_lang_id", "q_text_quality",
    "q_fingerprint", "q_text_clean", "q_repetition", "q_contamination",
    "q_minhash", "q_dedup_minhash", "q_ngram_jaccard", "q_winnow", "q_overlap",
    "q_simhash", "q_dedup_simhash", "q_dup_clusters", "q_dedup_resolve",
    "q_sample_hash", "q_sample_weighted", "q_sample_balance",
    "q_sample_reservoir", "q_pipeline_prep", "q_lm_score", "q_chunk",
    "q_dedup_incr", "q_dedup_incr_idx", "q_dedup_bloom", "q_tfidf", "q_dedup_block",
    "q_boilerplate", "q_dedup_substr",
    "q_quality_gate", "q_split", "q_mix_budget", "q_mix_temp",
    "q_vocab", "q_bpe", "q_bpe_train", "q_entropy", "q_shuffle_shards",
    "q_pack_sequences", "q_media_features", "q_media_frames",
    "q_media_resize", "q_media_frame_meta", "q_media_decode",
    "q_media_audio", "q_bpe_encode", "q_corpus_report",
    "q_corpus_dump_toks", "q_corpus_dump_q",
    "q_rank_global", "q_rank_strat", "q_sample_systematic",
    "q_shard_manifest", "q_ngram_novelty", "q_quality_classifier", "q_dsir",
    "q_containment", "q_length_buckets", "q_corpus_diff",
    "q_split_group", "q_lm_backoff", "q_ccnet_split", "q_mix_lm",
    "q_minkprob", "q_dedup_priority", "q_dedup_savings", "q_blocklist",
    "q_bpe_sweep", "q_cdc_savings", "q_mix_epoch", "q_welch",
    "q_shard_quality", "q_distinct_n", "q_dp_hist", "q_sample_es",
    "q_kruskal", "q_quantile_norm", "q_heavyhitters", "q_rrf", "q_rbo",
    "q_ece", "q_ndcg", "q_dp_topk", "q_curriculum", "q_hill", "q_pbm",
    "q_unigram_train", "q_unigram_encode", "q_unigram_prune",
    "q_novelty", "q_map", "q_media_dedup", "q_dedup_allpairs")

  test("every documents-family query survives NULL and empty text values") {
    documentQueries.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n >= 0, name) // reaching here means no crash; count forces execution
    }
  }

  test("null text flows as null scalars, never as matches") {
    // fingerprints of the null doc are null, not a hash of ""
    val fp = SparkEntry.queries("q_fingerprint")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp_exact")).toMap
    assert(fp(1L) == null, "null text must fingerprint to null")
    assert(fp(2L) != null, "empty text is a real (hashable) value")
    // the exact duplicate pair (0, 102) must still surface through the
    // simhash path despite null/empty rows in the corpus
    val pairs = SparkEntry.queries("q_dedup_simhash")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 102L)), s"exact dup lost among null rows: $pairs")
    // empty text scores 0.0 ratios; NULL text stays NULL end to end
    val tq = SparkEntry.queries("q_text_quality")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(tq(1L).isNullAt(tq(1L).fieldIndex("punct_ratio")), "null text must keep null ratio")
    assert(tq(2L).getAs[Double]("punct_ratio") == 0.0, "empty text is ratio 0.0")
    val tok = SparkEntry.queries("q_tokens")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(tok(2L).isNullAt(tok(2L).fieldIndex("chars_per_token")),
      "zero-token doc has undefined chars/token")
  }

  private lazy val embDir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("null-emb").toString
    val dim = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dim)(i => ((seed * 31 + i * 7) % 13 - 6).toFloat / 3f)
    val rows = (0L until 20L).map(i => (i, vec(i.toInt), (i % 4).toInt)) ++ Seq(
      (20L, null.asInstanceOf[Array[Float]], 0),    // null vector
      (21L, Array.fill(dim)(0f), 1),                // zero vector
      (22L, Array.empty[Float], 2))                 // empty vector
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private val embeddingQueries = Seq(
    "q_embed_stats", "q_embed_quant", "q_embed_calib", "q_embed_centroid", "q_embed_train",
    "q_sim_topk", "q_dedup_embed", "q_sim_lsh", "q_sim_ivf", "q_sim_pq",
    "q_sim_ivfpq", "q_dedup_semantic", "q_prune_proto", "q_kcenter",
    "q_hard_negatives", "q_knn_graph", "q_knn_graph_ivf", "q_ivf_balance",
    "q_select_mmr")

  test("every embedding-family query survives null, zero, and empty vectors") {
    embeddingQueries.foreach { name =>
      val n = SparkEntry.queries(name)(spark, embDir).count()
      assert(n >= 0, name)
    }
  }
}
