package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed done in SURVEY.md §2 has an entry in [[queries]]
  * (run by Verify at sf0.01) and, where ANSI-SQL-expressible, a DuckDB
  * oracle in [[oracleSql]] (the driver hash-compares both results).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * PageRank to 1e-6 convergence on the lineitem-derived graph.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.PageRank
      .run(GraphQueries.graph(spark, "/root/testdata/sf0.001"), tol = 1e-6, maxIter = 50)
      .ranks

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_degrees" -> (GraphQueries.degrees _),
    "g_cc" -> (GraphQueries.cc _),
    "g_cc_sizes" -> (GraphQueries.ccSizes _),
    "g_pagerank5" -> (GraphQueries.pagerank(5) _),
    "g_ppr5" -> (GraphQueries.ppr(5) _),
    "g_hits3" -> (GraphQueries.hits(3) _),
    "g_salsa3" -> (GraphQueries.salsa(3) _),
    "g_walks4" -> (GraphQueries.walks(4) _),
    "g_lp3" -> (GraphQueries.lp(3) _),
    "g_triangles" -> (GraphQueries.triangles _),
    "g_tri_per_vertex" -> (GraphQueries.triPerVertex _),
    "g_bfs" -> (GraphQueries.bfs(0) _),
    "g_scc" -> (GraphQueries.scc _),
    "g_ecc" -> (GraphQueries.ecc _),
    "g_ecc_undir" -> (GraphQueries.eccUndirected _),
    "g_reach" -> (GraphQueries.reach _),
    "g_radius_diameter" -> (GraphQueries.radiusDiameter _),
    "g_topo_layers" -> (GraphQueries.topoLayers _),
    "g_hyperball" -> (GraphQueries.hyperball _),
    "g_eff_diameter" -> (GraphQueries.effDiameter _),
    "g_bowtie" -> (GraphQueries.bowtie _),
    "g_kcore" -> (GraphQueries.kcore _),
    "g_degdist" -> (GraphQueries.degDist _),
    "g_clustering" -> (GraphQueries.clustering _),
    "g_reciprocity" -> (GraphQueries.reciprocity _),
    "g_assort" -> (GraphQueries.assortativity _),
    "g_stats" -> (GraphQueries.stats _),
    "g_sssp10" -> (GraphQueries.sssp(0, 10) _),
    "t_lang_confusion" -> (graft.queries.TextQueries.langConfusion _),
    "i_coupling" -> (graft.queries.IngestQueries.coupling _),
    "i_cocite" -> (graft.queries.IngestQueries.cocite _),
    "i_adamic" -> (graft.queries.IngestQueries.adamicAdar _),
    "i_extract_text" -> (graft.queries.IngestQueries.extractText _),
    "t_tfidf" -> (graft.queries.TextQueries.tfIdf _),
    "q_asof_tol" -> (graft.queries.RelationalQueries.asofOrdersTol _),
    "i_links" -> (graft.queries.IngestQueries.links _),
    "i_anchor_text" -> (graft.queries.IngestQueries.anchorText _),
    "i_host_rank" -> (graft.queries.IngestQueries.hostRank _),
    "i_host_rank_w" -> (graft.queries.IngestQueries.hostRankWeighted _),
    "t_decontam" -> (graft.queries.TextQueries.decontam _),
    "d_span_dedup" -> (graft.queries.TextQueries.spanDedup _),
    "d_winnow_pairs" -> (graft.queries.TextQueries.winnowPairs _),
    "d_span_rewrite" -> (graft.queries.TextQueries.spanRewrite _),
    "e_label_centroid" -> (graft.queries.TextQueries.labelCentroid _),
    "s_sliding" -> (graft.queries.RelationalQueries.eventsSliding _),
    "t_mix" -> (graft.queries.TextQueries.mixWeights _),
    "t_sample_strat" -> (graft.queries.TextQueries.sampleStrat _),
    "q_join_agg" -> (graft.queries.RelationalQueries.joinAgg _),
    "q_window_top" -> (graft.queries.RelationalQueries.windowTopOrders _),
    "q_setop" -> (graft.queries.RelationalQueries.setOps _),
    "q_events_hourly" -> (graft.queries.RelationalQueries.eventsHourly _),
    "m_binary_meta" -> (graft.queries.RelationalQueries.binaryMeta _),
    "m_frame_sample" -> (graft.queries.RelationalQueries.frameSample _),
    "q_asof" -> (graft.queries.RelationalQueries.asofOrders _),
    "q_range" -> (graft.queries.RelationalQueries.rangeEvents _),
    "i_host_graph" -> (graft.queries.IngestQueries.hostGraph _),
    "t_tokens" -> (graft.queries.TextQueries.tokenStats _),
    "t_bpe_tokens" -> (graft.queries.TextQueries.bpeTokens _),
    "t_quality" -> (graft.queries.TextQueries.quality _),
    "t_langid" -> (graft.queries.TextQueries.langId _),
    "t_fingerprint" -> (graft.queries.TextQueries.fingerprint _),
    "d_exact_dedup" -> (graft.queries.TextQueries.exactDedup _),
    "s_dedup_first" -> (graft.queries.TextQueries.dedupFirst _),
    "s_sessions" -> (graft.queries.RelationalQueries.sessions _),
    "d_ngram_jaccard" -> (graft.queries.TextQueries.ngramJaccard _),
    "d_minhash_lsh" -> (graft.queries.TextQueries.minHashLsh _),
    "d_simhash" -> (graft.queries.TextQueries.simHash _),
    "d_simhash_pairs" -> (graft.queries.TextQueries.simHashPairs _),
    "e_cosine_topk" -> (graft.queries.TextQueries.cosineTopK _),
    "e_lsh_topk" -> (graft.queries.TextQueries.lshTopK _),
    "e_ivf_topk" -> (graft.queries.TextQueries.ivfTopK _),
    "d_embed_neardup" -> (graft.queries.TextQueries.embedNearDup _),
    "d_neardup_rep" -> (graft.queries.TextQueries.nearDupRep _),
    "t_winnow" -> (graft.queries.TextQueries.winnow _),
    "t_rep_lines" -> (graft.queries.TextQueries.repLines _),
    "q1_agg" -> ((s: SparkSession, dir: String) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("count_order"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "g_degrees" -> GraphQueries.degreesSql,
    "g_cc" -> GraphQueries.ccSql,
    "g_cc_sizes" -> GraphQueries.ccSizesSql,
    "g_pagerank5" -> GraphQueries.pagerankSql(5),
    "g_ppr5" -> GraphQueries.pprSql(5),
    "g_hits3" -> GraphQueries.hitsSql(3),
    "g_salsa3" -> GraphQueries.salsaSql(3),
    "g_walks4" -> GraphQueries.walksSql(4),
    "g_lp3" -> GraphQueries.lpSql(3),
    "g_triangles" -> GraphQueries.trianglesSql,
    "g_tri_per_vertex" -> GraphQueries.triPerVertexSql,
    "g_bfs" -> GraphQueries.bfsSql(0),
    "g_scc" -> GraphQueries.sccSql,
    "g_ecc" -> GraphQueries.eccSql,
    "g_ecc_undir" -> GraphQueries.eccUndirectedSql,
    "g_reach" -> GraphQueries.reachSql,
    "g_radius_diameter" -> GraphQueries.radiusDiameterSql,
    "g_topo_layers" -> GraphQueries.topoLayersSql,
    "g_hyperball" -> GraphQueries.hyperballSql,
    "g_eff_diameter" -> GraphQueries.effDiameterSql,
    "g_bowtie" -> GraphQueries.bowtieSql,
    "g_kcore" -> GraphQueries.kcoreSql,
    "g_degdist" -> GraphQueries.degDistSql,
    "g_clustering" -> GraphQueries.clusteringSql,
    "g_reciprocity" -> GraphQueries.reciprocitySql,
    "g_assort" -> GraphQueries.assortativitySql,
    "g_stats" -> GraphQueries.statsSql,
    "g_sssp10" -> GraphQueries.ssspSql(0, 10),
    "t_lang_confusion" -> graft.queries.TextQueries.langConfusionSql,
    "i_coupling" -> graft.queries.IngestQueries.couplingSql,
    "i_cocite" -> graft.queries.IngestQueries.cociteSql,
    "i_adamic" -> graft.queries.IngestQueries.adamicAdarSql,
    "i_extract_text" -> graft.queries.IngestQueries.extractTextSql,
    "t_tfidf" -> graft.queries.TextQueries.tfIdfSql,
    "q_asof_tol" -> graft.queries.RelationalQueries.asofOrdersTolSql,
    "i_links" -> graft.queries.IngestQueries.linksSql,
    "i_anchor_text" -> graft.queries.IngestQueries.anchorTextSql,
    "i_host_rank" -> graft.queries.IngestQueries.hostRankSql,
    "i_host_rank_w" -> graft.queries.IngestQueries.hostRankWeightedSql,
    "t_decontam" -> graft.queries.TextQueries.decontamSql,
    "d_span_dedup" -> graft.queries.TextQueries.spanDedupSql,
    "d_winnow_pairs" -> graft.queries.TextQueries.winnowPairsSql,
    "d_span_rewrite" -> graft.queries.TextQueries.spanRewriteSql,
    "e_label_centroid" -> graft.queries.TextQueries.labelCentroidSql,
    "s_sliding" -> graft.queries.RelationalQueries.eventsSlidingSql,
    "t_mix" -> graft.queries.TextQueries.mixWeightsSql,
    "t_sample_strat" -> graft.queries.TextQueries.sampleStratSql,
    "q_join_agg" -> graft.queries.RelationalQueries.joinAggSql,
    "q_window_top" -> graft.queries.RelationalQueries.windowTopOrdersSql,
    "q_setop" -> graft.queries.RelationalQueries.setOpsSql,
    "q_events_hourly" -> graft.queries.RelationalQueries.eventsHourlySql,
    "m_binary_meta" -> graft.queries.RelationalQueries.binaryMetaSql,
    "m_frame_sample" -> graft.queries.RelationalQueries.frameSampleSql,
    "q_asof" -> graft.queries.RelationalQueries.asofOrdersSql,
    "q_range" -> graft.queries.RelationalQueries.rangeEventsSql,
    "i_host_graph" -> graft.queries.IngestQueries.hostGraphSql,
    "t_tokens" -> graft.queries.TextQueries.tokenStatsSql,
    "t_bpe_tokens" -> graft.queries.TextQueries.bpeTokensSql,
    "t_quality" -> graft.queries.TextQueries.qualitySql,
    "t_langid" -> graft.queries.TextQueries.langIdSql,
    "t_fingerprint" -> graft.queries.TextQueries.fingerprintSql,
    "d_exact_dedup" -> graft.queries.TextQueries.exactDedupSql,
    "s_dedup_first" -> graft.queries.TextQueries.dedupFirstSql,
    "s_sessions" -> graft.queries.RelationalQueries.sessionsSql,
    "d_ngram_jaccard" -> graft.queries.TextQueries.ngramJaccardSql,
    "d_minhash_lsh" -> graft.queries.TextQueries.minHashLshSql,
    "d_simhash" -> graft.queries.TextQueries.simHashSql,
    "d_simhash_pairs" -> graft.queries.TextQueries.simHashPairsSql,
    "e_cosine_topk" -> graft.queries.TextQueries.cosineTopKSql,
    "e_lsh_topk" -> graft.queries.TextQueries.lshTopKSql,
    "e_ivf_topk" -> graft.queries.TextQueries.ivfTopKSql,
    "d_embed_neardup" -> graft.queries.TextQueries.embedNearDupSql,
    "d_neardup_rep" -> graft.queries.TextQueries.nearDupRepSql,
    "t_winnow" -> graft.queries.TextQueries.winnowSql,
    "t_rep_lines" -> graft.queries.TextQueries.repLinesSql,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
