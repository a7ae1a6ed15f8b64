package graft

import graft.ann.Ann
import graft.dedup.DocDedup
import graft.mm.Multimodal
import graft.queries.{CdcQueries, RelationalQueries}
import graft.textops.{Corpus, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract: one `queries` entry per implemented operator (SURVEY.md
  * §2 + the training-data-pipeline operator set), each with an equivalent
  * DuckDB oracle in [[oracleSql]] where SQL can express it.
  *
  * Oracle-parity conventions used throughout (see each operator's scaladoc):
  * timestamps compared as epoch millis, monetary/ratio doubles as scaled
  * bigints, and every hash md5-derived so both engines compute identical
  * values.
  */
object SparkEntry {

  /** The SQL text of the shared events->changes mapping (DuckDB dialect). */
  private val changesSql: String =
    """SELECT event_id AS lsn,
      |  CASE WHEN event_type IN ('click','view','signup') THEN 'I'
      |       WHEN event_type = 'purchase' THEN 'U' ELSE 'D' END AS op,
      |  'conv-' || lpad((user_id % 100)::VARCHAR, 4, '0') AS conv_id,
      |  (floor(value)::INT % 8)::INT AS turn_idx,
      |  ['user','assistant','tool','system'][(event_id % 4)::INT + 1] AS role,
      |  event_type || ' #' || event_id AS text,
      |  CASE WHEN event_id >= 500 THEN json_extract_string(props, '$.k') END AS tool,
      |  epoch_ms(ts) AS ts_ms
      |FROM events""".stripMargin

  private val docTokensSql: String =
    """SELECT doc_id, text,
      |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
      |FROM documents""".stripMargin

  private val shinglesSql: String =
    s"""WITH w AS ($docTokensSql)
       |SELECT DISTINCT doc_id,
       |  unnest([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS sh
       |FROM w WHERE len(ws) >= 3""".stripMargin

  private val quantizedSql: String =
    """SELECT vec_id, [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q
      |FROM embeddings""".stripMargin

  /** Flagship query on sf=0.001: the full CDC engine replay (dedup + MERGE
    * through the ChronicleTable) producing the final transcripts state.
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.finalState(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------- CDC engine operators
    "cdc_parse_changes" -> ((s, d) => CdcQueries.parseChanges(s, d)),
    "cdc_dedup_latest" -> ((s, d) => CdcQueries.dedupLatest(s, d)),
    "cdc_dedup_salted" -> ((s, d) => CdcQueries.dedupSalted(s, d)),
    "cdc_final_state" -> ((s, d) => CdcQueries.finalState(s, d)),
    // same replay through the merge-on-read write path (deltas + mid-replay
    // fold + mixed-layout read) — must hash-match the identical oracle
    "cdc_final_state_mor" -> ((s, d) => CdcQueries.finalStateMor(s, d)),
    "cdc_time_slice" -> ((s, d) => CdcQueries.timeSlice(s, d)),
    "cdc_incremental" -> ((s, d) => CdcQueries.incrementalChanges(s, d)),
    "cdc_point_lookup" -> ((s, d) => CdcQueries.pointLookup(s, d)),
    "cdc_sql_catalog" -> ((s, d) => CdcQueries.sqlCatalogLookup(s, d)),
    // the same replay driven entirely by SQL DML (CREATE TABLE + one
    // INSERT INTO … SELECT of change rows) — shares finalState's oracle
    "cdc_sql_insert" -> ((s, d) => CdcQueries.sqlInsertState(s, d)),
    // … and pruned by a SQL DELETE (tombstone change events at hwm+1)
    "cdc_sql_delete" -> ((s, d) => CdcQueries.sqlDeleteState(s, d)),
    // and driven by the NATIVE streaming sink (writeStream.format("graft"),
    // multi-epoch file tail) — same oracle again
    "cdc_stream_sink" -> ((s, d) => CdcQueries.streamSinkState(s, d)),
    "cdc_scd2" -> ((s, d) => CdcQueries.scd2(s, d)),
    "cdc_hwm_anti" -> ((s, d) => CdcQueries.hwmAntiJoin(s, d)),
    "cdc_route_dsl" -> ((s, d) => CdcQueries.routeDsl(s, d)),
    "cdc_quarantine" -> ((s, d) => CdcQueries.quarantine(s, d)),
    "cdc_lineage_stats" -> ((s, d) => CdcQueries.lineageStats(s, d)),
    "cdc_schema_evolution" -> ((s, d) => CdcQueries.schemaEvolution(s, d)),
    "cdc_sessionize" -> ((s, d) => CdcQueries.sessionize(s, d)),
    "cdc_window_agg" -> ((s, d) => CdcQueries.windowAgg(s, d)),
    // ------------------------------------------------- relational breadth
    "q1_pricing_summary" -> ((s, d) => RelationalQueries.q1PricingSummary(s, d)),
    "q3_top_revenue" -> ((s, d) => RelationalQueries.q3TopRevenue(s, d)),
    "q_window_rank" -> ((s, d) => RelationalQueries.topOrdersPerCustomer(s, d)),
    "q_rollup" -> ((s, d) => RelationalQueries.rollupOrders(s, d)),
    "q_semi_anti" -> ((s, d) => RelationalQueries.semiAntiCustomers(s, d)),
    "q_except" -> ((s, d) => RelationalQueries.customerOnlyNations(s, d)),
    "q_region_join" -> ((s, d) => RelationalQueries.revenueByRegion(s, d)),
    "q_topk" -> ((s, d) => RelationalQueries.topParts(s, d)),
    "q_cube" -> ((s, d) => RelationalQueries.cubeOrders(s, d)),
    "q_asof_join" -> ((s, d) => RelationalQueries.asofJoin(s, d)),
    "q_profile" -> ((s, d) => RelationalQueries.eventProfile(s, d)),
    // approximate (sketch) variant: no oracleSql entry by design — HLL++ /
    // t-digest outputs are engine-specific; the spec bounds it vs the exact
    // profile instead, and the driver records a rows-only check
    "q_profile_approx" -> ((s, d) => RelationalQueries.eventProfileApprox(s, d)),
    // ------------------------------------------------- text analysis
    "text_tokens" -> ((s, d) => TextOps.tokenCounts(s, d)),
    "text_quality" -> ((s, d) => TextOps.qualityScore(s, d)),
    "text_lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "text_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    // ------------------------------------------------- corpus construction
    "corpus_split" -> ((s, d) => Corpus.splitAssign(s, d)),
    // shards pinned: the oracle's shard assignment is part of the answer
    "corpus_pack" -> ((s, d) => Corpus.packSequences(s, d, shards = 16L)),
    "corpus_sample_stratified" -> ((s, d) => Corpus.sampleStratified(s, d)),
    "corpus_mixture" -> ((s, d) => Corpus.mixture(s, d)),
    "corpus_decontaminate" -> ((s, d) => Corpus.decontaminate(s, d)),
    // ------------------------------------------------- deduplication
    "dedup_exact" -> ((s, d) => DocDedup.exact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => DocDedup.ngramJaccardPairs(s, d)),
    "dedup_minhash_sig" -> ((s, d) => DocDedup.minhashSignatures(s, d)),
    "dedup_lsh_pairs" -> ((s, d) => DocDedup.lshPairs(s, d)),
    "dedup_incremental_pairs" -> ((s, d) => DocDedup.lshPairsIncrementalQuery(s, d)),
    "dedup_cluster_reps" -> ((s, d) => DocDedup.lshClusterReps(s, d)),
    "dedup_simhash" -> ((s, d) => DocDedup.simhash(s, d)),
    // ------------------------------------------------- similarity search
    "ann_brute_topk" -> ((s, d) => Ann.bruteForceTopK(s, d)),
    "ann_lsh_buckets" -> ((s, d) => Ann.lshBuckets(s, d)),
    "ann_lsh_pairs" -> ((s, d) => Ann.lshCandidatePairs(s, d)),
    "ann_lsh_topk" -> ((s, d) => Ann.lshTopK(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Ann.embeddingNearDup(s, d)),
    "ann_ivf_cells" -> ((s, d) => Ann.ivfCells(s, d)),
    "ann_ivf_topk" -> ((s, d) => Ann.ivfTopK(s, d)),
    // ------------------------------------------------- multimodal plumbing
    "mm_binary_meta" -> ((s, d) => Multimodal.binaryMeta(s, d)),
    "mm_decode_features" -> ((s, d) => Multimodal.decodeFeatures(s, d)
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("frames").cast("long").as("frames"))),

    "mm_resize" -> ((s, d) => Multimodal.resizeMedia(s, d)
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_bytes_in").cast("long").as("n_bytes_in"),
        col("n_bytes_out").cast("long").as("n_bytes_out"))),

    "mm_frame_sample" -> ((s, d) => Multimodal.frameSamples(s, d)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("ts_ms"))))

  def oracleSql: Map[String, String] = Map(
    "cdc_parse_changes" ->
      s"""WITH ch AS ($changesSql)
         |SELECT * FROM ch ORDER BY lsn""".stripMargin,

    "cdc_dedup_latest" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, lsn, op, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_dedup_salted" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, lsn, op, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_final_state" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_final_state_mor" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_sql_insert" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_sql_delete" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 AND op <> 'D' AND turn_idx < 4
         |ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_stream_sink" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_time_slice" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch)
         |SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 AND op <> 'D'
         |  AND ts_ms BETWEEN ${CdcQueries.sliceFromMs} AND ${CdcQueries.sliceToMs}
         |ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_incremental" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch),
         |hwm AS (SELECT max(lsn) AS h FROM ch
         |        WHERE lsn < 2 * ((SELECT max(lsn) FROM ch) // 4 + 1))
         |SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |FROM d WHERE rn = 1 AND op <> 'D' AND lsn > (SELECT h FROM hwm)
         |ORDER BY conv_id, turn_idx""".stripMargin,

    "cdc_point_lookup" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch),
         |f AS (SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |      FROM d WHERE rn = 1 AND op <> 'D')
         |SELECT * FROM f WHERE conv_id = (SELECT min(conv_id) FROM f)
         |ORDER BY turn_idx""".stripMargin,

    // same answer through the SQL catalog surface (graft.sql.GraftCatalog)
    "cdc_sql_catalog" ->
      s"""WITH ch AS ($changesSql),
         |d AS (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn FROM ch),
         |f AS (SELECT conv_id, turn_idx, role, text, tool, ts_ms
         |      FROM d WHERE rn = 1 AND op <> 'D')
         |SELECT * FROM f WHERE conv_id = (SELECT min(conv_id) FROM f)
         |ORDER BY turn_idx""".stripMargin,

    "cdc_scd2" ->
      s"""WITH ch AS ($changesSql),
         |v AS (SELECT *, lead(lsn) OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn) - 1 AS valid_to_lsn FROM ch)
         |SELECT lsn AS valid_from_lsn, conv_id, turn_idx, role, text, tool, ts_ms,
         |       valid_to_lsn, (valid_to_lsn IS NULL) AS is_current
         |FROM v WHERE op <> 'D'
         |ORDER BY conv_id, turn_idx, valid_from_lsn""".stripMargin,

    "cdc_hwm_anti" ->
      s"""WITH ch AS ($changesSql)
         |SELECT * FROM ch c
         |WHERE c.lsn >= 500 AND NOT EXISTS (
         |  SELECT 1 FROM ch p
         |  WHERE p.lsn < 500 AND p.conv_id = c.conv_id AND p.turn_idx = c.turn_idx)
         |ORDER BY lsn""".stripMargin,

    "cdc_route_dsl" ->
      """SELECT event_id, event_type, value, 'funnel' AS routed_to
        |FROM events
        |WHERE event_type IN ('purchase', 'signup') AND value >= 10 AND value < 100
        |ORDER BY event_id""".stripMargin,

    "cdc_quarantine" ->
      """SELECT event_id, user_id, 'validation_failed' AS reason
        |FROM events WHERE event_type = 'error' AND value < 20
        |ORDER BY event_id""".stripMargin,

    "cdc_lineage_stats" ->
      s"""WITH ch AS ($changesSql)
         |SELECT lsn // 250 AS batch_id,
         |  min(lsn) AS start_lsn, max(lsn) AS end_lsn,
         |  sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END)::BIGINT AS inserts,
         |  sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END)::BIGINT AS updates,
         |  sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)::BIGINT AS deletes,
         |  count(*) AS n_events,
         |  sum(length(text))::BIGINT AS payload_chars
         |FROM ch GROUP BY 1 ORDER BY batch_id""".stripMargin,

    "cdc_schema_evolution" ->
      s"""WITH ch AS ($changesSql)
         |SELECT tool, count(*) AS n, min(lsn) AS first_lsn, max(lsn) AS last_lsn
         |FROM ch GROUP BY tool ORDER BY tool ASC NULLS FIRST""".stripMargin,

    "cdc_sessionize" ->
      """WITH g AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR epoch_ms(ts) - epoch_ms(prev_ts) > 3600000 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)),
        |s AS (SELECT *, sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq FROM g)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "cdc_window_agg" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
        |  count(*) AS n, round(sum(value) * 100)::BIGINT AS sum_value_e2
        |FROM events GROUP BY 1, 2 ORDER BY window_start_ms, event_type""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity) * 100)::BIGINT AS sum_qty_e2,
        |  round(sum(l_extendedprice) * 100)::BIGINT AS sum_base_e2,
        |  round(sum(l_extendedprice * (1 - l_discount)) * 100)::BIGINT AS sum_disc_e2,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)) * 100)::BIGINT AS revenue_e2
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue_e2 DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, round(o_totalprice * 100)::BIGINT AS price_e2
        |FROM (SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice) * 100)::BIGINT AS total_e2
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,

    "q_except" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_region_join" ->
      """SELECT r_name, count(*) AS n_orders,
        |  round(sum(o_totalprice) * 100)::BIGINT AS revenue_e2
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_topk" ->
      """SELECT p_partkey, p_name, round(p_retailprice * 100)::BIGINT AS price_e2
        |FROM part ORDER BY price_e2 DESC, p_partkey LIMIT 10""".stripMargin,

    "q_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(avg(o_totalprice) * 100)::BIGINT AS avg_e2
        |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  (SELECT max(c.event_id) FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |     AND c.event_id < p.event_id) AS last_click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS n_ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
        |  length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    length(text)::DOUBLE AS n_chars,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))::DOUBLE AS n_toks,
        |    len(regexp_extract_all(lower(text), '[a-z]'))::DOUBLE AS alpha,
        |    len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS punct,
        |    len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS digit,
        |    len(list_filter(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''),
        |      x -> x IN ('the','a','an','and','of','to','in','is','it','that','for','on','with','as')))::DOUBLE AS stop
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |  round(alpha / n_chars * 10000)::BIGINT AS alpha_ratio_e4,
        |  round(punct / n_chars * 10000)::BIGINT AS punct_ratio_e4,
        |  round(digit / n_chars * 10000)::BIGINT AS digit_ratio_e4,
        |  round(stop / n_toks * 10000)::BIGINT AS stopword_ratio_e4,
        |  round((alpha / n_chars * 0.4 + stop / n_toks * 0.4 + (1 - punct / n_chars) * 0.2) * 10000)::BIGINT AS quality_e4
        |FROM t WHERE n_toks > 0 ORDER BY doc_id""".stripMargin,

    "text_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z]'))::DOUBLE / length(text)::DOUBLE AS alpha_ratio,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents WHERE length(text) > 0),
        |v AS (SELECT doc_id, alpha_ratio,
        |    len(list_filter(ws, x -> x IN ('the','and','of','to','is'))) AS v_en,
        |    len(list_filter(ws, x -> x IN ('el','la','de','que','y'))) AS v_es,
        |    len(list_filter(ws, x -> x IN ('le','les','et','des','une'))) AS v_fr,
        |    len(list_filter(ws, x -> x IN ('der','die','und','das','ist'))) AS v_de
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN alpha_ratio < 0.4 THEN 'zh'
        |       WHEN v_en >= v_es AND v_en >= v_fr AND v_en >= v_de THEN 'en'
        |       WHEN v_es >= v_fr AND v_es >= v_de THEN 'es'
        |       WHEN v_fr >= v_de THEN 'fr'
        |       ELSE 'de' END AS pred_lang
        |FROM v ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    unnest([md5(substring(text, i, 8)) for i in range(1, greatest(length(text) - 7, 1) + 1)]) AS sh
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, min(sh) AS fingerprint FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "corpus_split" ->
      """SELECT doc_id,
        |  substr(md5(doc_id::VARCHAR), 1, 2) AS split_bucket,
        |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'train'
        |       WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'f3' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "corpus_pack" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 16 AS pack_shard,
        |    least((n_chars + 3) // 4, 2048) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, pack_shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, pack_shard, n_tokens,
        |  ((cum - n_tokens) // 2048)::BIGINT AS bin_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "corpus_sample_stratified" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS sample_rank
        |  FROM documents)
        |SELECT lang, doc_id, sample_rank FROM r WHERE sample_rank <= 20
        |ORDER BY lang, sample_rank""".stripMargin,

    "corpus_mixture" ->
      """WITH rates AS (
        |  SELECT source,
        |    CASE WHEN regexp_extract(source, '([0-9]+)$', 1) = '' THEN 100
        |         WHEN regexp_extract(source, '([0-9]+)$', 1)::INT % 2 = 0
        |         THEN 100 ELSE 25 END AS weight_pct
        |  FROM (SELECT DISTINCT source FROM documents)),
        |k AS (
        |  SELECT d.source, r.weight_pct,
        |    (('0x' || substr(md5(d.doc_id::VARCHAR || d.source), 1, 2))::INT
        |      * 100 < r.weight_pct * 256) AS kept
        |  FROM documents d JOIN rates r USING (source))
        |SELECT source, weight_pct, count(*) AS n_total,
        |  count(*) FILTER (WHERE kept) AS n_kept
        |FROM k GROUP BY source, weight_pct ORDER BY source""".stripMargin,

    "corpus_decontaminate" ->
      s"""WITH g AS ($shinglesSql),
         |ev AS (SELECT DISTINCT sh FROM g WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, sh FROM g WHERE doc_id % 97 <> 0),
         |c AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY doc_id),
         |s AS (SELECT tr.doc_id, count(*) AS n_shared
         |  FROM tr JOIN ev USING (sh) GROUP BY tr.doc_id)
         |SELECT c.doc_id, c.n_sh, coalesce(s.n_shared, 0) AS n_shared,
         |  coalesce(s.n_shared, 0) * 2 >= c.n_sh AS contaminated
         |FROM c LEFT JOIN s ON s.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS canon_id,
        |  count(*) OVER (PARTITION BY md5(text)) AS group_size,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH g AS ($shinglesSql),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
         |rare AS (SELECT sh FROM g GROUP BY sh HAVING count(*) BETWEEN 2 AND 50),
         |gr AS (SELECT g.doc_id, g.sh FROM g JOIN rare USING (sh)),
         |p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
         |      FROM gr x JOIN gr y USING (sh) WHERE x.doc_id < y.doc_id
         |      GROUP BY 1, 2)
         |SELECT a, b, shared,
         |  round(shared * 10000.0 / (sa.n_sh + sb.n_sh - shared))::BIGINT AS jacc_e4
         |FROM p JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         |WHERE round(shared * 10000.0 / (sa.n_sh + sb.n_sh - shared))::BIGINT >= 2000
         |ORDER BY a, b""".stripMargin,

    "dedup_minhash_sig" ->
      s"""WITH g AS ($shinglesSql),
         |b AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % 1000003 AS base FROM g)
         |SELECT doc_id, perm,
         |  min(((perm * 2 + 3) * base + (perm * 5 + 7)) % 1000003) AS minhash
         |FROM b, (SELECT unnest(range(0, 16)) AS perm)
         |GROUP BY doc_id, perm ORDER BY doc_id, perm""".stripMargin,

    "dedup_lsh_pairs" ->
      s"""WITH g AS ($shinglesSql),
         |bse AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % 1000003 AS base FROM g),
         |sig AS (SELECT doc_id, perm,
         |    min(((perm * 2 + 3) * base + (perm * 5 + 7)) % 1000003) AS minhash
         |  FROM bse, (SELECT unnest(range(0, 16)) AS perm) GROUP BY doc_id, perm),
         |bands AS (SELECT doc_id, perm // 4 AS band,
         |    array_to_string(list(minhash ORDER BY perm), ',') AS bandsig
         |  FROM sig GROUP BY doc_id, perm // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bandsig = y.bandsig
         |  WHERE x.doc_id < y.doc_id),
         |est AS (SELECT a, b,
         |    (sum(CASE WHEN sx.minhash = sy.minhash THEN 1 ELSE 0 END) * 10000 / 16)::BIGINT AS est_sim_e4
         |  FROM cand JOIN sig sx ON sx.doc_id = a JOIN sig sy ON sy.doc_id = b AND sy.perm = sx.perm
         |  GROUP BY a, b)
         |SELECT a, b, est_sim_e4 FROM est WHERE est_sim_e4 >= 5000 ORDER BY a, b""".stripMargin,

    // incremental dedup = the batch restriction of the full pair set
    // (signatures are deterministic in the text, so index-reuse and
    // recompute-the-world agree); docs with doc_id % 5 = 0 play the batch
    "dedup_incremental_pairs" ->
      s"""WITH g AS ($shinglesSql),
         |bse AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % 1000003 AS base FROM g),
         |sig AS (SELECT doc_id, perm,
         |    min(((perm * 2 + 3) * base + (perm * 5 + 7)) % 1000003) AS minhash
         |  FROM bse, (SELECT unnest(range(0, 16)) AS perm) GROUP BY doc_id, perm),
         |bands AS (SELECT doc_id, perm // 4 AS band,
         |    array_to_string(list(minhash ORDER BY perm), ',') AS bandsig
         |  FROM sig GROUP BY doc_id, perm // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bandsig = y.bandsig
         |  WHERE x.doc_id < y.doc_id),
         |est AS (SELECT a, b,
         |    (sum(CASE WHEN sx.minhash = sy.minhash THEN 1 ELSE 0 END) * 10000 / 16)::BIGINT AS est_sim_e4
         |  FROM cand JOIN sig sx ON sx.doc_id = a JOIN sig sy ON sy.doc_id = b AND sy.perm = sx.perm
         |  GROUP BY a, b)
         |SELECT a, b, est_sim_e4 FROM est
         |WHERE est_sim_e4 >= 5000 AND (a % 5 = 0 OR b % 5 = 0)
         |ORDER BY a, b""".stripMargin,

    // connected components of the LSH pair graph = transitive closure in
    // SQL: recursive reach CTE, then min reachable id per node as the
    // canonical representative (matches min-label propagation's fixpoint)
    "dedup_cluster_reps" ->
      s"""WITH RECURSIVE g AS ($shinglesSql),
         |bse AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT % 1000003 AS base FROM g),
         |sig AS (SELECT doc_id, perm,
         |    min(((perm * 2 + 3) * base + (perm * 5 + 7)) % 1000003) AS minhash
         |  FROM bse, (SELECT unnest(range(0, 16)) AS perm) GROUP BY doc_id, perm),
         |bands AS (SELECT doc_id, perm // 4 AS band,
         |    array_to_string(list(minhash ORDER BY perm), ',') AS bandsig
         |  FROM sig GROUP BY doc_id, perm // 4),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bandsig = y.bandsig
         |  WHERE x.doc_id < y.doc_id),
         |est AS (SELECT a, b,
         |    (sum(CASE WHEN sx.minhash = sy.minhash THEN 1 ELSE 0 END) * 10000 / 16)::BIGINT AS e
         |  FROM cand JOIN sig sx ON sx.doc_id = a JOIN sig sy ON sy.doc_id = b AND sy.perm = sx.perm
         |  GROUP BY a, b),
         |pairs AS (SELECT a, b FROM est WHERE e >= 5000),
         |edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
         |lbl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_rep
         |  FROM reach GROUP BY src)
         |SELECT doc_id, cluster_rep,
         |  count(*) OVER (PARTITION BY cluster_rep) AS cluster_size,
         |  (doc_id = cluster_rep) AS is_rep
         |FROM lbl ORDER BY doc_id""".stripMargin,

    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS t
        |  FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
        |s AS (SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS s
        |  FROM h, (SELECT unnest(range(0, 32)) AS j) GROUP BY doc_id, j)
        |SELECT doc_id,
        |  sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ann_brute_topk" ->
      s"""WITH e AS ($quantizedSql),
         |qs AS (SELECT vec_id AS query_id, q AS qv FROM e WHERE vec_id < 8),
         |s AS (SELECT query_id, e.vec_id AS neighbor_id,
         |    list_sum([qv[i] * q[i] for i in range(1, len(qv) + 1)])::BIGINT AS dot_q
         |  FROM e, qs WHERE e.vec_id <> query_id),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id) AS rank FROM s)
         |SELECT query_id, rank, neighbor_id, dot_q FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "ann_lsh_buckets" ->
      s"""WITH e AS ($quantizedSql),
         |x AS (SELECT vec_id, unnest(q) AS x, generate_subscripts(q, 1) - 1 AS j FROM e),
         |proj AS (SELECT vec_id, p,
         |    sum((('0x' || substr(md5(p::VARCHAR || '_' || j::VARCHAR), 1, 15))::BIGINT % 2001 - 1000) * x) AS proj
         |  FROM x, (SELECT unnest(range(0, 12)) AS p) GROUP BY vec_id, p)
         |SELECT vec_id,
         |  sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
         |FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "ann_lsh_pairs" ->
      s"""WITH e AS ($quantizedSql),
         |x AS (SELECT vec_id, unnest(q) AS x, generate_subscripts(q, 1) - 1 AS j FROM e),
         |proj AS (SELECT vec_id, p,
         |    sum((('0x' || substr(md5(p::VARCHAR || '_' || j::VARCHAR), 1, 15))::BIGINT % 2001 - 1000) * x) AS proj
         |  FROM x, (SELECT unnest(range(0, 12)) AS p) GROUP BY vec_id, p),
         |bk AS (SELECT vec_id,
         |    sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY vec_id),
         |bkc AS (SELECT bk.* FROM bk
         |  JOIN (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= 64) s USING (bucket))
         |SELECT l.vec_id AS a, r.vec_id AS b,
         |  list_sum([el.q[i] * er.q[i] for i in range(1, len(el.q) + 1)])::BIGINT AS dot_q
         |FROM bkc l JOIN bkc r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
         |JOIN e el ON el.vec_id = l.vec_id JOIN e er ON er.vec_id = r.vec_id
         |WHERE list_sum([el.q[i] * er.q[i] for i in range(1, len(el.q) + 1)]) >= 200000
         |ORDER BY a, b""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH e AS ($quantizedSql),
         |x AS (SELECT vec_id, unnest(q) AS x, generate_subscripts(q, 1) - 1 AS j FROM e),
         |proj AS (SELECT vec_id, p,
         |    sum((('0x' || substr(md5(p::VARCHAR || '_' || j::VARCHAR), 1, 15))::BIGINT % 2001 - 1000) * x) AS proj
         |  FROM x, (SELECT unnest(range(0, 12)) AS p) GROUP BY vec_id, p),
         |bk AS (SELECT vec_id,
         |    sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
         |  FROM proj GROUP BY vec_id),
         |bkc AS (SELECT bk.* FROM bk
         |  JOIN (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= 64) s USING (bucket)),
         |qs AS (SELECT vec_id AS query_id, bucket FROM bk WHERE vec_id < 8),
         |probes AS (SELECT query_id,
         |    unnest(list_prepend(bucket, [xor(bucket, 1::BIGINT << p) for p in range(0, 12)])) AS probe
         |  FROM qs),
         |cand AS (SELECT query_id, b.vec_id AS neighbor_id
         |  FROM probes pr JOIN bkc b ON b.bucket = pr.probe
         |  WHERE b.vec_id <> pr.query_id),
         |s AS (SELECT query_id, neighbor_id,
         |    list_sum([eq.q[i] * en.q[i] for i in range(1, len(eq.q) + 1)])::BIGINT AS dot_q
         |  FROM cand JOIN e eq ON eq.vec_id = cand.query_id
         |  JOIN e en ON en.vec_id = cand.neighbor_id),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id) AS rank FROM s)
         |SELECT query_id, rank, neighbor_id, dot_q FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf_cells" ->
      s"""WITH e AS ($quantizedSql),
         |cent AS (SELECT vec_id AS cell, q AS cq FROM e
         |  ORDER BY ('0x' || substr(md5('ivf_' || vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
         |  LIMIT 16),
         |score AS (SELECT e.vec_id, c.cell,
         |    list_sum([e.q[i] * c.cq[i] for i in range(1, len(e.q) + 1)])::BIGINT AS dot
         |  FROM e, cent c),
         |a AS (SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn FROM score)
         |SELECT vec_id, cell FROM a WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "ann_ivf_topk" ->
      s"""WITH e AS ($quantizedSql),
         |cent AS (SELECT vec_id AS cell, q AS cq FROM e
         |  ORDER BY ('0x' || substr(md5('ivf_' || vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
         |  LIMIT 16),
         |score AS (SELECT e.vec_id, c.cell,
         |    list_sum([e.q[i] * c.cq[i] for i in range(1, len(e.q) + 1)])::BIGINT AS dot
         |  FROM e, cent c),
         |assign AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn FROM score)
         |  WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, cell FROM (SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn FROM score
         |    WHERE vec_id < 8)
         |  WHERE rn <= 4),
         |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probes p JOIN assign a USING (cell)
         |  WHERE a.vec_id <> p.query_id),
         |s AS (SELECT query_id, neighbor_id,
         |    list_sum([eq.q[i] * en.q[i] for i in range(1, len(eq.q) + 1)])::BIGINT AS dot_q
         |  FROM cand JOIN e eq ON eq.vec_id = cand.query_id
         |  JOIN e en ON en.vec_id = cand.neighbor_id),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id) AS rank FROM s)
         |SELECT query_id, rank, neighbor_id, dot_q FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    "q_profile" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events,
        |  round(quantile_cont(value, 0.5) * 100)::BIGINT AS median_value_e2,
        |  round(quantile_cont(value, 0.95) * 100)::BIGINT AS p95_value_e2,
        |  round(min(value) * 100)::BIGINT AS min_e2,
        |  round(max(value) * 100)::BIGINT AS max_e2
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""WITH e AS ($quantizedSql),
         |x AS (SELECT vec_id, unnest(q) AS x, generate_subscripts(q, 1) - 1 AS j FROM e),
         |proj AS (SELECT vec_id, p,
         |    sum((('0x' || substr(md5(p::VARCHAR || '_' || j::VARCHAR), 1, 15))::BIGINT % 2001 - 1000) * x) AS proj
         |  FROM x, (SELECT unnest(range(0, 12)) AS p) GROUP BY vec_id, p),
         |bk AS (SELECT vec_id,
         |    sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY vec_id),
         |bkc AS (SELECT bk.* FROM bk
         |  JOIN (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= 64) s USING (bucket)),
         |pairs AS (SELECT l.vec_id AS a, r.vec_id AS b,
         |    list_sum([el.q[i] * er.q[i] for i in range(1, len(el.q) + 1)])::BIGINT AS dot_q
         |  FROM bkc l JOIN bkc r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
         |  JOIN e el ON el.vec_id = l.vec_id JOIN e er ON er.vec_id = r.vec_id)
         |SELECT a, b, dot_q // 100 AS cos_e4 FROM pairs
         |WHERE dot_q >= 250000 ORDER BY a, b""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text))::INT AS n_bytes,
        |  substr(hex(encode(text)), 1, 8) AS head_hex,
        |  'text/plain' AS media_type
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_decode_features" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  (octet_length(encode(text)) % 640 + 1)::BIGINT AS width,
        |  ((octet_length(encode(text)) * 31) % 480 + 1)::BIGINT AS height,
        |  (octet_length(encode(text)) % 16 + 1)::BIGINT AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      """WITH m AS (SELECT doc_id,
        |    octet_length(encode(text)) AS n,
        |    (octet_length(encode(text)) % 640 + 1) AS w,
        |    ((octet_length(encode(text)) * 31) % 480 + 1) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  LEAST(w, 320)::BIGINT AS width,
        |  LEAST(h, 240)::BIGINT AS height,
        |  n::BIGINT AS n_bytes_in,
        |  GREATEST(1, LEAST(n::BIGINT, (n::BIGINT * 320 * 240) // (w::BIGINT * h)))::BIGINT AS n_bytes_out
        |FROM m ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id,
        |    (octet_length(encode(text)) % 16 + 1) AS frames
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    unnest(generate_series(0, frames - 1, 4)) AS frame_idx
        |  FROM f)
        |SELECT doc_id, frame_idx::BIGINT AS frame_idx,
        |  (frame_idx * 250)::BIGINT AS ts_ms
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin)
}
