package graft.queries

/** DuckDB oracle SQL — one ANSI-ish statement per query key, run by the
  * driver over the same parquet tables (table names = bare `lineitem`,
  * `events`, ... views).
  *
  * Parity rules (mirrors CrossFns):
  *   - timestamps formatted to `%Y-%m-%d %H:%M:%S` strings; ordering uses
  *     `CAST(ts AS TIMESTAMP)` so DuckDB's ns precision matches Spark's µs,
  *   - double sums as exact DECIMAL accumulations cast to DOUBLE once,
  *   - hashing = the same polynomial char fold (list_reduce) as
  *     CrossFns.charHash — never an engine-native hash,
  *   - vector math on floor(x*1e6) int64 quantisation,
  *   - row_number outputs cast to BIGINT on the Spark side (Spark's
  *     row_number is int, DuckDB's bigint).
  */
object Oracles {

  /** DuckDB fragment equivalent to CrossFns.charHash(x). Lambda vars j_/ac_/c_
    * are reserved for this fragment (nested-lambda safe). */
  private def ch(x: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, length($x)), j_ -> CAST(ascii(substring($x, j_, 1)) AS BIGINT))), " +
      s"(ac_, c_) -> (ac_*31 + c_) % 1000000007)"

  /** DuckDB fragment equivalent to CrossFns.tokens(x). Reserves t_. */
  private def tok(x: String): String =
    s"list_filter(regexp_split_to_array($x, '\\s+'), t_ -> length(t_) > 0)"

  /** Word-3-gram shingles from token-list column w. Reserves i_. */
  private def shingles(w: String): String =
    s"CASE WHEN len($w) >= 3 THEN list_transform(generate_series(1, len($w) - 2), " +
      s"i_ -> $w[i_] || ' ' || $w[i_+1] || ' ' || $w[i_+2]) ELSE CAST([] AS VARCHAR[]) END"

  /** Word-2-gram shingles (space-joined) from token-list column w. Reserves i_. */
  private def shinglesN2(w: String): String =
    s"CASE WHEN len($w) >= 2 THEN list_transform(generate_series(1, len($w) - 1), " +
      s"i_ -> $w[i_] || ' ' || $w[i_+1]) ELSE CAST([] AS VARCHAR[]) END"

  private def quant(x: String): String =
    s"list_transform($x, x_ -> CAST(floor(CAST(x_ AS DOUBLE)*1000000) AS BIGINT))"

  private val tsS = "strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')"
  private def decSum2(x: String) = s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Filename derivation shared by filter_filename_valid / project_extract_date. */
  private val fnameExpr: String =
    """CASE o_orderkey % 5
      | WHEN 0 THEN 'btcusd-' || strftime(o_orderdate, '%Y-%m-%d') || '.csv'
      | WHEN 1 THEN 'ethusd-' || strftime(o_orderdate, '%Y-%m-%d') || '.csv'
      | WHEN 2 THEN 'btcusd-' || replace(strftime(o_orderdate, '%Y-%m-%d'), '-', '/') || '.csv'
      | WHEN 3 THEN 'btcusd-' || strftime(o_orderdate, '%Y-%m-%d')
      | ELSE 'btcusd-' || substring(strftime(o_orderdate, '%Y-%m-%d'), 1, 4) || '-13-32.csv'
      |END""".stripMargin

  private val fnameValid: String =
    """length(fname) = 21
      | AND regexp_matches(fname, '^btcusd-\d{4}-\d{2}-\d{2}\.csv$')
      | AND try_strptime(substring(fname, 8, 10), '%Y-%m-%d') IS NOT NULL""".stripMargin

  /** Shared CTE prefix for the Gopher-rule family (text_gopher_rules /
    * pipeline_quality_gate): per-doc token stats -> rounded ratio frame `r`. */
  private lazy val gopherCtes: String =
    s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
       |uni AS (SELECT doc_id, max(n) AS top_n FROM
       |         (SELECT doc_id, t, count(*) AS n FROM
       |           (SELECT doc_id, unnest(w) AS t FROM w) GROUP BY 1, 2) GROUP BY 1),
       |st AS (SELECT doc_id,
       |   CAST(len(w) AS BIGINT) AS n_toks,
       |   CAST(COALESCE(list_sum(list_transform(w, t_ -> length(t_))), 0) AS BIGINT) AS sum_len,
       |   CASE WHEN len(w) >= 2
       |     THEN list_transform(generate_series(1, len(w) - 1), i_ -> w[i_] || ' ' || w[i_+1])
       |     ELSE CAST([] AS VARCHAR[]) END AS bg,
       |   CAST(len(list_filter(w, t_ -> t_ IN ('the','and','of','to','a','in','is'))) AS BIGINT) AS stop_hits
       | FROM w),
       |r AS (SELECT st.doc_id, st.n_toks,
       |   CASE WHEN st.n_toks = 0 THEN 0.0
       |     ELSE round(CAST(st.sum_len AS DOUBLE) / st.n_toks, 6) END AS mean_tok_len,
       |   CASE WHEN st.n_toks = 0 THEN 0.0
       |     ELSE round(CAST(COALESCE(uni.top_n, 0) AS DOUBLE) / st.n_toks, 6) END AS top_unigram_frac,
       |   CASE WHEN len(st.bg) = 0 THEN 0.0
       |     ELSE round(1.0 - CAST(len(list_distinct(st.bg)) AS DOUBLE) / len(st.bg), 6) END AS dup_bigram_frac,
       |   CASE WHEN st.n_toks = 0 THEN 0.0
       |     ELSE round(CAST(st.stop_hits AS DOUBLE) / st.n_toks, 6) END AS stop_frac
       | FROM st LEFT JOIN uni ON st.doc_id = uni.doc_id)""".stripMargin

  /** Shared CTE prefix for the walk-corpus family (graph_walk_pairs /
    * graph_sgns_epoch): the deterministic 4-hop DeepWalk ladder (2 walks
    * per node, charHash coin) ending in `pr` (center, context, m) —
    * skip-gram pairs at window ±2 with multiplicity kept as the
    * training weight. */
  private lazy val walkPairCtes: String = {
    def coin(i: Int): String = ch(
      "CAST(w.start AS VARCHAR) || ':' || CAST(w.wk AS VARCHAR) || " +
        s"':' || '$i' || ':' || CAST(w.cur AS VARCHAR)")
    def hop(i: Int): String =
      s"""w$i AS MATERIALIZED (SELECT w.start, w.wk,
         |    a.nbrs[CAST((${coin(i)}) % len(a.nbrs) AS BIGINT) + 1] AS cur,
         |    list_append(w.path,
         |      a.nbrs[CAST((${coin(i)}) % len(a.nbrs) AS BIGINT) + 1]) AS path
         |  FROM w${i - 1} w JOIN adj a ON w.cur = a.node)""".stripMargin
    s"""os AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
       |e0 AS MATERIALIZED (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |adj AS MATERIALIZED (SELECT src AS node, list(dst ORDER BY dst) AS nbrs FROM e GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT a.node AS start, wks.wk, a.node AS cur, [a.node] AS path
       |  FROM adj a CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS wk) wks),
       |${(1 to 4).map(hop).mkString(",\n")},
       |pr AS MATERIALIZED (SELECT path[ui.i] AS center, path[uj.j] AS context,
       |  CAST(count(*) AS BIGINT) AS m
       |FROM w4,
       |  LATERAL (SELECT unnest(generate_series(1, len(path))) AS i) ui,
       |  LATERAL (SELECT unnest(generate_series(greatest(1, ui.i - 2),
       |                                         least(len(path), ui.i + 2))) AS j) uj
       |WHERE uj.j <> ui.i
       |GROUP BY 1, 2)""".stripMargin
  }

  /** Shared CTE suffix for the SGNS family (graph_sgns_epoch /
    * graph_embedding_knn), on top of [[walkPairCtes]]: the whole
    * synchronous epoch unrolled — Knuth-scrambled hash init (±1000),
    * hard sigmoid in ppm with sign-magnitude `//`, 2 deterministic
    * negatives per pair from the top-256-frequency context table
    * (nidx PRE-projected: hashing inside the join condition made
    * DuckDB nested-loop 10M list_reduce calls — 30 s vs 0.8 s), exact
    * gradient sums, lr = 2^-21 applied once. Ends in
    * `emb` (node, dim, val). */
  private lazy val sgnsCtes: String = {
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, 32), k_ -> $a[k_]*$b[k_]))"
    def sigma(s: String): String =
      s"least(1000000, greatest(0, 500000 + " +
        s"CASE WHEN ($s) < 0 THEN -(abs($s) // 32) ELSE ($s) // 32 END))"
    def initVec(role: String): String =
      s"list_transform(generate_series(0, 31), d_ -> " +
        s"(${ch(s"CAST(node AS VARCHAR) || ':$role:' || CAST(d_ AS VARCHAR)")}" +
        " * 2654435761) % 1000000007 % 2001 - 1000)"
    s"""$walkPairCtes,
       |nodes AS (SELECT center AS node FROM pr UNION SELECT context FROM pr),
       |u0 AS MATERIALIZED (SELECT node, ${initVec("u")} AS vec FROM nodes),
       |v0 AS MATERIALIZED (SELECT node, ${initVec("v")} AS vec FROM nodes),
       |nt AS (SELECT node AS nnode, row_number() OVER (ORDER BY freq DESC, node) - 1 AS nidx
       |       FROM (SELECT context AS node, sum(m) AS freq FROM pr GROUP BY 1
       |             ORDER BY freq DESC, node LIMIT 256)),
       |ntv AS MATERIALIZED (SELECT nt.nnode, nt.nidx, v0.vec AS vn
       |       FROM nt JOIN v0 ON nt.nnode = v0.node),
       |nn AS (SELECT count(*) AS n FROM ntv),
       |sp AS MATERIALIZED (SELECT pr.center, pr.context, pr.m, u.vec AS uc, v.vec AS vx,
       |        1000000 - ${sigma(dot("u.vec", "v.vec"))} AS gpos
       |      FROM pr JOIN u0 u ON pr.center = u.node
       |        JOIN v0 v ON pr.context = v.node),
       |ngp AS MATERIALIZED (SELECT s.center, s.m, s.uc,
       |        (${ch("CAST(s.center AS VARCHAR) || ':' || CAST(s.context AS VARCHAR) || ':' || CAST(i.ni AS VARCHAR)")}
       |          * 2654435761) % 1000000007 % (SELECT n FROM nn) AS nidx
       |      FROM sp s
       |      CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS ni) i),
       |ng AS MATERIALIZED (SELECT p.center, p.m, p.uc, t.vn,
       |        -${sigma(dot("p.uc", "t.vn"))} AS gneg
       |      FROM ngp p JOIN ntv t ON t.nidx = p.nidx),
       |dl AS (SELECT center AS node, d_.k - 1 AS dim, m * gpos * vx[d_.k] AS delta
       |       FROM sp, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) d_
       |       UNION ALL
       |       SELECT center, d_.k - 1, m * gneg * vn[d_.k]
       |       FROM ng, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) d_),
       |dsums AS (SELECT node, dim, sum(delta) AS d FROM dl GROUP BY 1, 2),
       |ebase AS (SELECT node, d_.k - 1 AS dim, vec[d_.k] AS v0v
       |         FROM u0, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) d_),
       |emb AS MATERIALIZED (SELECT b.node, CAST(b.dim AS BIGINT) AS dim,
       |  CAST(b.v0v + coalesce(CASE WHEN dsums.d < 0 THEN -(abs(dsums.d) // 2097152)
       |    ELSE dsums.d // 2097152 END, 0) AS BIGINT) AS val
       |FROM ebase b LEFT JOIN dsums ON b.node = dsums.node AND b.dim = dsums.dim)""".stripMargin
  }

  /** Multi-epoch SGNS chain on top of [[walkPairCtes]]: u_0/v_0
    * hash-init, static negative assignment `negd`, then per epoch t the
    * score/negative/gradient/apply CTEs from (u_{t-1}, v_{t-1}) to
    * (u_t, v_t) — past epoch 1 the CONTEXT side updates too (dsv). The
    * negative DRAW is fixed per pair across epochs, matching the
    * engine. Ends with the chain's last u_T as (node, vec). */
  private def sgnsEpochChainCtes(epochs: Int): String = {
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(generate_series(1, 32), k_ -> $a[k_]*$b[k_]))"
    def sigma(s: String): String =
      s"least(1000000, greatest(0, 500000 + " +
        s"CASE WHEN ($s) < 0 THEN -(abs($s) // 32) ELSE ($s) // 32 END))"
    def initVec(role: String): String =
      s"list_transform(generate_series(0, 31), d_ -> " +
        s"(${ch(s"CAST(node AS VARCHAR) || ':$role:' || CAST(d_ AS VARCHAR)")}" +
        " * 2654435761) % 1000000007 % 2001 - 1000)"
    def apply(cur: String, ds: String, nxt: String): String =
      s"""$nxt AS MATERIALIZED (SELECT node, list(val ORDER BY dim) AS vec FROM (
         |  SELECT b.node, b.dim,
         |    CAST(b.v0v + coalesce(CASE WHEN $ds.d < 0 THEN -(abs($ds.d) // 2097152)
         |      ELSE $ds.d // 2097152 END, 0) AS BIGINT) AS val
         |  FROM (SELECT node, g_.k - 1 AS dim, vec[g_.k] AS v0v FROM $cur,
         |        LATERAL (SELECT unnest(generate_series(1, 32)) AS k) g_) b
         |  LEFT JOIN $ds ON b.node = $ds.node AND b.dim = $ds.dim)
         |GROUP BY node)""".stripMargin
    def epoch(t: Int): String = {
      val (pu, pv) = (s"u_${t - 1}", s"v_${t - 1}")
      s"""sp_$t AS MATERIALIZED (SELECT pr.center, pr.context, pr.m, u.vec AS uc, v.vec AS vx,
         |      1000000 - ${sigma(dot("u.vec", "v.vec"))} AS gpos
         |    FROM pr JOIN $pu u ON pr.center = u.node
         |      JOIN $pv v ON pr.context = v.node),
         |ng_$t AS MATERIALIZED (SELECT n.center, n.m, n.nnode, u.vec AS uc, vv.vec AS vn,
         |      -${sigma(dot("u.vec", "vv.vec"))} AS gneg
         |    FROM negd n JOIN $pu u ON n.center = u.node
         |      JOIN $pv vv ON n.nnode = vv.node),
         |dsu_$t AS (SELECT node, dim, sum(delta) AS d FROM (
         |    SELECT center AS node, g_.k - 1 AS dim, m * gpos * vx[g_.k] AS delta
         |    FROM sp_$t, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) g_
         |    UNION ALL
         |    SELECT center, g_.k - 1, m * gneg * vn[g_.k]
         |    FROM ng_$t, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) g_)
         |  GROUP BY 1, 2),
         |dsv_$t AS (SELECT node, dim, sum(delta) AS d FROM (
         |    SELECT context AS node, g_.k - 1 AS dim, m * gpos * uc[g_.k] AS delta
         |    FROM sp_$t, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) g_
         |    UNION ALL
         |    SELECT nnode, g_.k - 1, m * gneg * uc[g_.k]
         |    FROM ng_$t, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) g_)
         |  GROUP BY 1, 2),
         |${apply(s"u_${t - 1}", s"dsu_$t", s"u_$t")},
         |${apply(s"v_${t - 1}", s"dsv_$t", s"v_$t")}""".stripMargin
    }
    s"""$walkPairCtes,
       |nodes AS (SELECT center AS node FROM pr UNION SELECT context FROM pr),
       |u_0 AS MATERIALIZED (SELECT node, ${initVec("u")} AS vec FROM nodes),
       |v_0 AS MATERIALIZED (SELECT node, ${initVec("v")} AS vec FROM nodes),
       |nt AS (SELECT node AS nnode, row_number() OVER (ORDER BY freq DESC, node) - 1 AS nidx
       |       FROM (SELECT context AS node, sum(m) AS freq FROM pr GROUP BY 1
       |             ORDER BY freq DESC, node LIMIT 256)),
       |nn AS (SELECT count(*) AS n FROM nt),
       |negd AS MATERIALIZED (SELECT p2.center, p2.context, p2.m, nt.nnode
       |  FROM (SELECT pr.center, pr.context, pr.m,
       |          (${ch("CAST(pr.center AS VARCHAR) || ':' || CAST(pr.context AS VARCHAR) || ':' || CAST(i.ni AS VARCHAR)")}
       |            * 2654435761) % 1000000007 % (SELECT n FROM nn) AS nidx
       |        FROM pr CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS ni) i) p2
       |  JOIN nt ON nt.nidx = p2.nidx),
       |${(1 to epochs).map(epoch).mkString(",\n")}""".stripMargin
  }

  /** Train/eval contamination census — shared by the batch report and
    * its streaming twin (per-batch verdicts against the static eval
    * grams sum-merge to the identical per-source counts). */
  private lazy val contaminationSql: String = {
    val sh8 = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2] || ' ' || w[pos+3]" +
      " || ' ' || w[pos+4] || ' ' || w[pos+5] || ' ' || w[pos+6] || ' ' || w[pos+7]")
    s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
       |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS pos FROM w),
       |h AS (SELECT doc_id, $sh8 AS sh FROM t),
       |ev AS (SELECT DISTINCT sh FROM h WHERE doc_id % 10 = 7),
       |c AS (SELECT DISTINCT h.doc_id FROM h JOIN ev USING (sh)
       |      WHERE h.doc_id % 10 != 7)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_train,
       |  CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
       |  CAST((count(c.doc_id) * 1000000) // count(*) AS BIGINT) AS contam_ppm
       |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
       |WHERE d.doc_id % 10 != 7
       |GROUP BY 1 ORDER BY d.source""".stripMargin
  }

  /** Shared CTE suffix for the ANN-indexed embedding-store family
    * (graph_embedding_ann / graph_embedding_ann_recall), on top of
    * [[sgnsCtes]]: the trained vectors as the pre-quantised corpus `fg`
    * (node → vec_id, integer components ARE the quantised form), IVF
    * training mirrored bit-for-bit — seeds = first 8 vectors in vec_id
    * order renumbered 0..7, ONE Lloyd iteration with truncated integer
    * means (`s // n`, trunc-toward-zero in both engines), empty cells
    * keeping their seed — then assignment of every vector to its
    * nearest trained cell (cosine desc, cid asc) in `ag`, and the
    * sample probes with their 2 nearest cells in `pcg`. */
  private lazy val sgnsAnnCtes: String =
    s"""$sgnsCtes,
       |evg AS MATERIALIZED (SELECT node, list(val ORDER BY dim) AS v,
       |        CAST(sum(val * val) AS BIGINT) AS nrm
       |      FROM emb GROUP BY node),
       |fg AS (SELECT node AS vec_id, v AS qv, nrm FROM evg WHERE nrm > 0),
       |cg0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
       |          qv AS cqv, nrm AS cnrm
       |        FROM (SELECT * FROM fg ORDER BY vec_id LIMIT 8)),
       |ccg0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM fg v, cg0 c),
       |ag0 AS (SELECT vec_id, qv, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk
       |    FROM ccg0) WHERE crk = 1),
       |gsums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
       |          FROM ag0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
       |          GROUP BY cid, i_),
       |gcm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM gsums GROUP BY cid),
       |cg1 AS (SELECT cg0.cid, coalesce(gcm.cqv, cg0.cqv) AS cqv
       |        FROM cg0 LEFT JOIN gcm USING (cid)),
       |cg1n AS (SELECT cid, cqv,
       |           CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm
       |         FROM cg1),
       |ccg1 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM fg v, cg1n c),
       |rkg AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk
       |        FROM ccg1),
       |ag AS MATERIALIZED (SELECT vec_id, qv, nrm, cid FROM rkg WHERE crk = 1),
       |pcg AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, cid
       |        FROM rkg WHERE vec_id % 100 = 0 AND crk <= 2),
       |anntop AS (SELECT probe_id, vec_id, cosine,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
       |  FROM (SELECT p.probe_id, a.vec_id,
       |     CAST(${qdotPair("p.pqv", "a.qv")} AS DOUBLE) /
       |      (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(a.nrm AS DOUBLE))) AS cosine
       |   FROM pcg p JOIN ag a ON a.cid = p.cid AND a.vec_id <> p.probe_id))""".stripMargin

  /** The ANN store's serve path: top-5 per sample node from the probed
    * cells only — mirrors Graph.sgnsAnnServe over the sgnsAnnCtes index. */
  private lazy val sgnsAnnSql: String =
    s"""WITH $sgnsAnnCtes
       |SELECT probe_id AS q_node, CAST(rk AS BIGINT) AS rk, vec_id AS nbr,
       |  round(cosine, 6) AS cos6
       |FROM anntop WHERE rk <= 5 ORDER BY q_node, rk""".stripMargin

  /** Recall@5 census: the same ANN top-5 vs the brute-force exact top-5
    * over the same trained vectors — mirrors Graph.sgnsAnnRecall. */
  private lazy val sgnsAnnRecallSql: String =
    s"""WITH $sgnsAnnCtes,
       |btopg AS (SELECT probe_id, vec_id FROM (
       |   SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
       |     row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |       CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
       |        (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) DESC,
       |       c.vec_id) AS rk
       |   FROM (SELECT * FROM fg WHERE vec_id % 100 = 0) p
       |   JOIN fg c ON c.vec_id <> p.vec_id) WHERE rk <= 5),
       |itopg AS (SELECT probe_id, vec_id FROM anntop WHERE rk <= 5)
       |SELECT t.probe_id AS q_node, CAST(count(*) AS BIGINT) AS n_true,
       |  CAST(count(l.vec_id) AS BIGINT) AS n_hit,
       |  CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall
       |FROM btopg t LEFT JOIN itopg l
       |  ON l.probe_id = t.probe_id AND l.vec_id = t.vec_id
       |GROUP BY t.probe_id ORDER BY q_node""".stripMargin

  /** Brute-force cosine top-5 over the one-epoch SGNS vectors — shared
    * by graph_embedding_knn and its persisted-store twin. */
  private lazy val sgnsKnnSql: String =
    s"""WITH $sgnsCtes,
       |ev AS MATERIALIZED (SELECT node, list(val ORDER BY dim) AS v,
       |        CAST(sum(val * val) AS BIGINT) AS nrm
       |      FROM emb GROUP BY node),
       |evf AS (SELECT * FROM ev WHERE nrm > 0),
       |qs AS (SELECT node AS q_node, v AS qv, nrm AS qn FROM evf WHERE node % 100 = 0),
       |sc AS (SELECT q.q_node, c.node AS nbr,
       |    CAST(list_sum(list_transform(generate_series(1, 32),
       |      k_ -> q.qv[k_] * c.v[k_])) AS DOUBLE) /
       |     (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
       |  FROM qs q JOIN evf c ON c.node <> q.q_node)
       |SELECT q_node, CAST(rk AS BIGINT) AS rk, nbr, round(cosine, 6) AS cos6
       |FROM (SELECT *, row_number() OVER (PARTITION BY q_node
       |        ORDER BY cosine DESC, nbr) AS rk FROM sc)
       |WHERE rk <= 5 ORDER BY q_node, rk""".stripMargin

  /** Shared CTE prefix for the learned-quality-classifier family
    * (quality_nb_*): Gopher labels over all docs ([[gopherCtes]] `r`),
    * hashed-unigram buckets (charHash mod 1024 — TextOps.NbBuckets),
    * Laplace count-ratio model over the even (train) split. */
  private lazy val nbQualityCtes: String =
    s"""$gopherCtes,
       |labels AS (SELECT doc_id,
       |   (n_toks >= 10 AND n_toks <= 100000
       |    AND mean_tok_len >= 2.0 AND mean_tok_len <= 10.0
       |    AND top_unigram_frac <= 0.2
       |    AND dup_bigram_frac <= 0.3) AS passes FROM r),
       |trtok AS (SELECT lb.passes, unnest(w.w) AS t FROM w
       |          JOIN labels lb ON w.doc_id = lb.doc_id WHERE w.doc_id % 2 = 0),
       |trb AS (SELECT passes, ${ch("t")} % 1024 AS bucket FROM trtok),
       |model AS (SELECT bucket,
       |   CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
       |   CAST(sum(CASE WHEN passes THEN 0 ELSE 1 END) AS BIGINT) AS c_neg,
       |   CAST(((sum(CASE WHEN passes THEN 1 ELSE 0 END) + 1) * 1000000)
       |     // (count(*) + 2) AS BIGINT) AS w_ppm
       | FROM trb GROUP BY bucket)""".stripMargin

  /** Full held-out scoring SQL — shared by quality_nb_scores and its
    * streaming twin (the count-cube state merges exactly, so the
    * stream's read-time scores equal the one-shot trainer's). */
  private lazy val nbScoresSql: String =
    s"""$nbQualityCtes,
       |$nbScoreCtes
       |SELECT doc_id, n_toks, score_ppm, score_ppm >= 500000 AS predicted
       |FROM scored ORDER BY doc_id""".stripMargin

  /** Held-out scoring CTEs on top of [[nbQualityCtes]]: odd-split token
    * buckets probed against the model, unseen = the 500000 prior. */
  private lazy val nbScoreCtes: String =
    s"""hotok AS (SELECT doc_id, unnest(w) AS t FROM w
       |          WHERE doc_id % 2 = 1 AND len(w) > 0),
       |hob AS (SELECT doc_id, ${ch("t")} % 1024 AS bucket FROM hotok),
       |scored AS (SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       |   CAST(sum(coalesce(m.w_ppm, 500000)) // count(*) AS BIGINT) AS score_ppm
       | FROM hob h LEFT JOIN model m ON h.bucket = m.bucket GROUP BY h.doc_id)""".stripMargin

  /** Shared CTE prefix for the exact-substring dedup family (8-token
    * windows): positional 8-gram hashes -> globally duplicated hashes
    * (count >= 2 anywhere in the corpus) -> per-document merged spans
    * `sp` (gaps-and-islands over [pos, pos+8)). */
  private lazy val substringSpanCtes: String = {
    val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2] || ' ' || w[pos+3]" +
      " || ' ' || w[pos+4] || ' ' || w[pos+5] || ' ' || w[pos+6] || ' ' || w[pos+7]")
    s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
       |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS pos FROM w),
       |h AS (SELECT doc_id, pos, $sh AS sh FROM t),
       |d AS (SELECT sh FROM h GROUP BY sh HAVING count(*) >= 2),
       |m AS (SELECT h.doc_id, h.pos FROM h JOIN d ON h.sh = d.sh),
       |g AS (SELECT doc_id, pos, max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM m),
       |i AS (SELECT doc_id, pos,
       |        sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM g),
       |sp AS (SELECT doc_id, isl, min(pos) AS span_start, max(pos) + 8 AS span_end
       |       FROM i GROUP BY 1, 2)""".stripMargin
  }

  /** Shared CTE prefix for the SemDeDup family: quantised embeddings ->
    * one deterministic Lloyd iteration (first-8 seed, truncated integer
    * means) -> final cell assignment `assigned` (vec_id, qv, nrm, cid). */
  private lazy val semanticCellCtes: String =
    s"""$embCtes,
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cqv, nrm AS cnrm
       |       FROM f WHERE vec_id < 8),
       |cc0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM f v, c0 c),
       |a0 AS (SELECT vec_id, qv, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc0)
       |  WHERE crk = 1),
       |sums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
       |         FROM a0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
       |         GROUP BY cid, i_),
       |cm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM sums GROUP BY cid),
       |c1 AS (SELECT c0.cid, coalesce(cm.cqv, c0.cqv) AS cqv FROM c0 LEFT JOIN cm USING (cid)),
       |c1n AS (SELECT cid, cqv,
       |          CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm FROM c1),
       |cc1 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM f v, c1n c),
       |assigned AS (SELECT vec_id, qv, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc1)
       |  WHERE crk = 1)""".stripMargin

  /** Keep-one variant of [[substringSpanCtes]]: each duplicated hash's
    * (doc_id, pos)-minimal occurrence is excluded from the marking, so
    * one copy of every duplicated substring survives. */
  private lazy val substringKeepOneCtes: String = {
    val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2] || ' ' || w[pos+3]" +
      " || ' ' || w[pos+4] || ' ' || w[pos+5] || ' ' || w[pos+6] || ' ' || w[pos+7]")
    s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
       |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS pos FROM w),
       |h AS (SELECT doc_id, pos, $sh AS sh FROM t),
       |r AS (SELECT doc_id, pos,
       |        row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rk,
       |        count(*) OVER (PARTITION BY sh) AS n FROM h),
       |m AS (SELECT doc_id, pos FROM r WHERE n >= 2 AND rk > 1),
       |g AS (SELECT doc_id, pos, max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM m),
       |i AS (SELECT doc_id, pos,
       |        sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM g),
       |sp AS (SELECT doc_id, isl, min(pos) AS span_start, max(pos) + 8 AS span_end
       |       FROM i GROUP BY 1, 2)""".stripMargin
  }

  /** Shared CTE prefix for the minhash family. */
  private val minhashCtes: String =
    s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
       |sh0 AS (SELECT doc_id, list_distinct(list_transform(${shingles("w")}, s_ -> ${ch("s_")})) AS hs FROM w),
       |sh AS (SELECT doc_id, unnest(hs) AS h FROM sh0 WHERE len(hs) > 0),
       |seeds AS (SELECT s AS seed, CAST(31*s + 17 AS BIGINT) AS a, CAST(97*s + 11 AS BIGINT) AS b
       |          FROM (SELECT unnest(generate_series(0, 15)) AS s)),
       |mh AS (SELECT doc_id, seed, min((a*h + b) % 1000000007) AS mh FROM sh, seeds GROUP BY doc_id, seed),
       |bands AS (SELECT doc_id, seed // 4 AS band, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
       |          FROM mh GROUP BY doc_id, seed // 4),
       |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |          FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id)""".stripMargin

  /** Quantised-embedding CTE prefix. */
  private val embCtes: String =
    s"""WITH q AS (SELECT vec_id, ${quant("embedding")} AS qv FROM embeddings),
       |n AS (SELECT vec_id, qv,
       |        CAST(list_sum(list_transform(generate_series(1, len(qv)), i_ -> qv[i_]*qv[i_])) AS BIGINT) AS nrm
       |      FROM q),
       |f AS (SELECT * FROM n WHERE nrm > 0)""".stripMargin

  private def qdotPair(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i_ -> $a[i_]*$b[i_])) AS BIGINT)"

  /** Shared SQ8 CTE suffix on top of [[embCtes]]: int8 codes, coarse
    * ranking, exact rerank of the 20-deep shortlist (rr carries rk). */
  private lazy val sq8Ctes: String =
    s"""$embCtes,
       |mx AS (SELECT max(list_max(list_transform(qv, x_ -> abs(x_)))) AS m FROM f),
       |cd AS (SELECT vec_id, qv, nrm,
       |        list_transform(qv, x_ ->
       |          (CASE WHEN x_ < 0 THEN -1 ELSE 1 END) * ((abs(x_) * 127) // mx.m)) AS q8
       |      FROM f, mx),
       |pr AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, q8 AS p8
       |       FROM cd WHERE vec_id < 5),
       |co AS (SELECT pr.probe_id, c.vec_id, c.qv, c.nrm, pr.pqv, pr.pnrm,
       |        ${qdotPair("pr.p8", "c.q8")} AS coarse
       |      FROM pr JOIN cd c ON c.vec_id <> pr.probe_id),
       |sh AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY coarse DESC, vec_id) AS crk FROM co),
       |re AS (SELECT probe_id, vec_id,
       |        CAST(${qdotPair("pqv", "qv")} AS DOUBLE) /
       |         (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) AS cosine
       |      FROM sh WHERE crk <= 20),
       |rr AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM re)""".stripMargin

  /** Shared CTE prefix for the PCA family: exact HUGEINT covariance
    * numerator (n·Σxy − Σx·Σy over micro-unit quantised vectors, 0-based
    * dims) + 8 unrolled power steps, each rescaled to max|v| = 1e6 by
    * truncated integer division, ending in x8 (dim, v) with canonical
    * sign via fl.s. Mirrors Embeddings.pcaPowerLoadings exactly. */
  private val pcaCtes: String = {
    def step(k: Int): String =
      s"""y$k AS (SELECT c.i AS dim, sum(c.c * x.v) AS y
         |  FROM cov c JOIN x${k - 1} x ON c.j = x.dim GROUP BY 1),
         |m$k AS (SELECT max(abs(y)) AS m FROM y$k),
         |x$k AS MATERIALIZED (SELECT dim,
         |    (CASE WHEN y < 0 THEN -1 ELSE 1 END) *
         |      ((CAST(1000000 AS HUGEINT) * abs(y)) // m) AS v
         |  FROM y$k, m$k)""".stripMargin
    s"""WITH q AS MATERIALIZED (SELECT vec_id, ${quant("embedding")} AS qv FROM embeddings),
       |pr AS (SELECT ui.i AS i, uj.j AS j,
       |         CAST(qv[ui.i] AS HUGEINT) * qv[uj.j] AS p
       |       FROM q,
       |         LATERAL (SELECT unnest(generate_series(1, 64)) AS i) ui,
       |         LATERAL (SELECT unnest(generate_series(1, 64)) AS j) uj),
       |cs AS (SELECT i, j, sum(p) AS sij, count(*) AS n FROM pr GROUP BY 1, 2),
       |ss AS (SELECT u.i AS i, sum(CAST(qv[u.i] AS HUGEINT)) AS si
       |       FROM q, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
       |       GROUP BY 1),
       |cov AS MATERIALIZED (SELECT cs.i - 1 AS i, cs.j - 1 AS j,
       |         CAST(cs.n AS HUGEINT) * cs.sij - sa.si * sb.si AS c
       |       FROM cs JOIN ss sa ON cs.i = sa.i JOIN ss sb ON cs.j = sb.i),
       |x0 AS (SELECT unnest(generate_series(0, 63)) AS dim,
       |         CAST(1000000 AS HUGEINT) AS v),
       |${(1 to 8).map(step).mkString(",\n")},
       |fm AS (SELECT min(dim) AS dim FROM x8 WHERE abs(v) = 1000000),
       |fl AS (SELECT CASE WHEN x.v < 0 THEN -1 ELSE 1 END AS s
       |       FROM x8 x JOIN fm ON x.dim = fm.dim)""".stripMargin
  }

  /** Pairwise chi-square matrix SQL — shared by the batch profile
    * and its streaming twin (the merged cube converges exactly). */
  private lazy val chi2MatrixSql: String = {
      val cols = Seq(
        "o_orderpriority" -> "o_orderpriority",
        "o_orderstatus" -> "o_orderstatus",
        "o_year" -> "CAST(year(o_orderdate) AS VARCHAR)")
      val blocks = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield {
        val (na, ea) = cols(i)
        val (nb, eb) = cols(j)
        s"""SELECT * FROM (
           |WITH ct AS (SELECT $ea AS a, $eb AS b, count(*) AS nab FROM orders GROUP BY 1, 2),
           |ra AS (SELECT a, sum(nab) AS ra FROM ct GROUP BY 1),
           |cb AS (SELECT b, sum(nab) AS cb FROM ct GROUP BY 1),
           |nt AS (SELECT sum(nab) AS n, count(DISTINCT a) AS ka, count(DISTINCT b) AS kb FROM ct),
           |cells AS (SELECT nt.n, nt.ka, nt.kb,
           |    ((CAST(coalesce(ct2.nab, 0) AS HUGEINT) * nt.n - CAST(ra.ra AS HUGEINT) * cb.cb)
           |     * (CAST(coalesce(ct2.nab, 0) AS HUGEINT) * nt.n - CAST(ra.ra AS HUGEINT) * cb.cb)
           |     * 1000000)
           |    // (CAST(nt.n AS HUGEINT) * ra.ra * cb.cb) AS cell
           |  FROM ra CROSS JOIN cb CROSS JOIN nt
           |  LEFT JOIN ct ct2 ON ct2.a = ra.a AND ct2.b = cb.b),
           |agg AS (SELECT any_value(n) AS n, any_value(ka) AS ka, any_value(kb) AS kb,
           |    sum(cell) AS chi2 FROM cells)
           |SELECT '$na' AS col_a, '$nb' AS col_b,
           |  CAST(n AS BIGINT) AS n_rows, CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
           |  CAST(chi2 AS BIGINT) AS chi2_micro,
           |  CASE WHEN least(ka - 1, kb - 1) = 0 THEN 0.0
           |    ELSE round(sqrt((CAST(chi2 AS DOUBLE) / 1e6) /
           |      CAST(n * least(ka - 1, kb - 1) AS DOUBLE)), 9) END AS cramer_v
           |FROM agg)""".stripMargin
      }
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
  }

  /** Hour-of-day DTW SQL, shared by the batch form and the streaming twin. */
  private lazy val dtwSql: String =
      """WITH RECURSIVE
        |pq AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |         sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
        |       FROM events GROUP BY 1, 2),
        |nn AS (SELECT event_type, count(*) AS n FROM pq GROUP BY 1),
        |ix AS (SELECT event_type, qv,
        |         row_number() OVER (PARTITION BY event_type ORDER BY hod) AS i FROM pq),
        |cost AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
        |           a.i AS i, b.i AS j, abs(a.qv - b.qv) AS c,
        |           na.n AS na, nb.n AS nb
        |         FROM ix a JOIN ix b ON a.event_type < b.event_type
        |         JOIN nn na ON na.event_type = a.event_type
        |         JOIN nn nb ON nb.event_type = b.event_type),
        |dp AS (
        |  SELECT et_a, et_b, na, nb, i, j, c AS d, 2 AS diag, 2 AS front
        |  FROM cost WHERE i = 1 AND j = 1
        |  UNION ALL
        |  SELECT * FROM (
        |    SELECT p.et_a, p.et_b, p.na, p.nb, c.i, c.j, c.c + min(p.d) AS d,
        |           p.front + 1 AS diag, p.front + 1 AS front
        |    FROM dp p
        |    JOIN cost c ON c.et_a = p.et_a AND c.et_b = p.et_b
        |      AND c.i + c.j = p.front + 1
        |      AND ((c.i = p.i + 1 AND c.j = p.j) OR (c.i = p.i AND c.j = p.j + 1)
        |           OR (c.i = p.i + 1 AND c.j = p.j + 1))
        |    GROUP BY p.et_a, p.et_b, p.na, p.nb, c.i, c.j, c.c, p.front
        |    UNION ALL
        |    SELECT et_a, et_b, na, nb, i, j, d, diag, front + 1
        |    FROM dp WHERE diag = front AND front < na + nb
        |  ) z
        |)
        |SELECT et_a, et_b, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(d AS BIGINT) AS dtw_cost
        |FROM dp WHERE i = na AND j = nb ORDER BY et_a, et_b""".stripMargin

  /** Theil-Sen SQL, shared by the batch form and the streaming twin. */
  private lazy val theilsenSql: String =
    """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
      |             sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
      |           FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, qv, CAST(epoch(hr) AS BIGINT) // 3600 AS hrs FROM h),
      |sl AS (SELECT a.event_type,
      |         (CASE WHEN b.qv - a.qv < 0 THEN -1 ELSE 1 END) *
      |         ((abs(b.qv - a.qv) * 1000000) // (b.hrs - a.hrs)) AS slope
      |       FROM s a JOIN s b
      |         ON a.event_type = b.event_type AND a.hrs < b.hrs),
      |np AS (SELECT event_type, count(*) AS n_points FROM s GROUP BY 1)
      |SELECT sl.event_type, CAST(np.n_points AS BIGINT) AS n_points,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  round(quantile_cont(sl.slope, 0.5), 6) AS slope_ppm_per_hr
      |FROM sl JOIN np ON sl.event_type = np.event_type
      |GROUP BY sl.event_type, np.n_points ORDER BY sl.event_type""".stripMargin

  /** Top-PC loadings: the shared power-iteration ladder, sign flipped so
    * the lowest max-|v| dim is positive. Shared by the batch form and
    * its streaming (merged-Gram-state) twin. */
  private lazy val pcaLoadingsSql: String =
    s"""$pcaCtes
       |SELECT x.dim AS dim, CAST(x.v * fl.s AS BIGINT) AS loading_ppm
       |FROM x8 x, fl ORDER BY dim""".stripMargin

  /** Second-PC ladder: Hotelling deflation of `cov` by the RAW x8
    * direction coarsened to per-mille (sign-magnitude `//` = BigInt
    * truncation toward zero; magnitudes sized so t·v·v ≤ ~1e33 ≪
    * HUGEINT), then the same 8-step ladder on cov2 as z1..z8. */
  private val pca2Ctes: String = {
    def step(k: Int): String =
      s"""zy$k AS (SELECT c.i AS dim, sum(c.c * x.v) AS y
         |  FROM cov2 c JOIN z${k - 1} x ON c.j = x.dim GROUP BY 1),
         |zm$k AS (SELECT max(abs(y)) AS m FROM zy$k),
         |z$k AS MATERIALIZED (SELECT dim,
         |    (CASE WHEN y < 0 THEN -1 ELSE 1 END) *
         |      ((CAST(1000000 AS HUGEINT) * abs(y)) // m) AS v
         |  FROM zy$k, zm$k)""".stripMargin
    s"""vp AS (SELECT dim,
       |    (CASE WHEN v < 0 THEN -1 ELSE 1 END) * (abs(v) // 1000) AS v
       |  FROM x8),
       |vps AS (SELECT sum(v * v) AS s FROM vp),
       |vpt AS (SELECT sum(a.v * c.c * b.v) AS t
       |       FROM cov c JOIN vp a ON c.i = a.dim JOIN vp b ON c.j = b.dim),
       |cov2 AS MATERIALIZED (SELECT c.i, c.j,
       |    c.c - (CASE WHEN vpt.t * a.v * b.v < 0 THEN -1 ELSE 1 END) *
       |      (abs(vpt.t * a.v * b.v) // (vps.s * vps.s)) AS c
       |  FROM cov c JOIN vp a ON c.i = a.dim JOIN vp b ON c.j = b.dim, vps, vpt),
       |z0 AS (SELECT unnest(generate_series(0, 63)) AS dim,
       |         CAST(1000000 AS HUGEINT) AS v),
       |${(1 to 8).map(step).mkString(",\n")},
       |zfm AS (SELECT min(dim) AS dim FROM z8 WHERE abs(v) = 1000000),
       |zfl AS (SELECT CASE WHEN x.v < 0 THEN -1 ELSE 1 END AS s
       |        FROM z8 x JOIN zfm ON x.dim = zfm.dim)""".stripMargin
  }

  /** Content-defined chunking census (dedup_cdc_chunks and its streaming
    * twin): boundary where the trailing-8-char polynomial hash % 64 = 0
    * (interior positions only), chunks sliced between boundaries,
    * identity = the same char hash. Mirrors Dedup.cdcChunkStats exactly
    * (min-length per hash under collision). */
  private lazy val cdcChunksSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, length(text) AS n
       |           FROM documents WHERE length(text) >= 1),
       |pos AS (SELECT doc_id, unnest(generate_series(8, n)) AS i, text, n FROM t),
       |bnd AS (SELECT doc_id, i FROM pos
       |        WHERE i < n AND (${ch("substring(text, CAST(i - 7 AS INT), 8)")}) % 64 = 0),
       |bl AS (SELECT t.doc_id, t.source, t.text, t.n,
       |         coalesce(list_sort(list(b.i) FILTER (WHERE b.i IS NOT NULL)),
       |                  CAST([] AS BIGINT[])) AS bs
       |       FROM t LEFT JOIN bnd b ON t.doc_id = b.doc_id
       |       GROUP BY t.doc_id, t.source, t.text, t.n),
       |ck AS (SELECT source, unnest(list_transform(generate_series(1, len(bs) + 1),
       |         k -> substring(text,
       |           CAST(CASE WHEN k = 1 THEN 1 ELSE bs[k-1] + 1 END AS INT),
       |           CAST((CASE WHEN k <= len(bs) THEN bs[k] ELSE n END)
       |              - (CASE WHEN k = 1 THEN 1 ELSE bs[k-1] + 1 END) + 1 AS INT)))) AS chunk
       |       FROM bl),
       |h AS (SELECT source, (${ch("chunk")}) AS h, CAST(length(chunk) AS BIGINT) AS l FROM ck),
       |g AS (SELECT source, h, count(*) AS c, min(l) AS l FROM h GROUP BY 1, 2)
       |SELECT source, CAST(sum(c) AS BIGINT) AS n_chunks,
       |  CAST(count(*) AS BIGINT) AS n_distinct,
       |  CAST(sum(c * l) AS BIGINT) AS total_chars,
       |  CAST(sum(c * l) - sum(l) AS BIGINT) AS saved_chars,
       |  CAST((1000000 * (sum(c) - count(*))) // sum(c) AS BIGINT) AS dup_ppm
       |FROM g GROUP BY source ORDER BY source""".stripMargin

  /** Shared CTE prefix for the sampled-centrality family
    * (graph_betweenness / graph_harmonic): thresholded co-part edges →
    * 3 top-degree hub sources → 4 unrolled multi-source BFS rounds with
    * exact shortest-path counts σ, ending in `v4` (s, node, dist,
    * sigma). v_i MUST be MATERIALIZED: each round reads its predecessor
    * twice (σ-join + NOT EXISTS) — inlined CTEs re-evaluate 2^rounds
    * times and spill DuckDB to disk on larger fixtures. */
  private def stressFwdCtesN(depth: Int): String = {
    def fwd(i: Int): String =
      s"""f$i AS (SELECT v.s, bi.dst AS node, sum(v.sigma) AS sigma
         |     FROM v${i - 1} v JOIN bi ON v.node = bi.src
         |     WHERE v.dist = ${i - 1} GROUP BY 1, 2),
         |n$i AS (SELECT f$i.s, f$i.node, $i AS dist, f$i.sigma FROM f$i
         |     WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} p
         |                       WHERE p.s = f$i.s AND p.node = f$i.node)),
         |v$i AS MATERIALIZED (SELECT * FROM v${i - 1} UNION ALL SELECT * FROM n$i)""".stripMargin
    s"""os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
       |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |srcs AS (SELECT src AS s FROM bi GROUP BY src
       |         ORDER BY count(*) DESC, src LIMIT 3),
       |v0 AS (SELECT s, s AS node, 0 AS dist, CAST(1 AS BIGINT) AS sigma FROM srcs),
       |${(1 to depth).map(fwd).mkString(",\n")}""".stripMargin
  }

  private lazy val stressFwdCtes: String = stressFwdCtesN(4)

  /** Single-source BFS as an unrolled min-relax ladder over CTEs `e`
    * (bidirectional edges) and `n0` (nodes), both defined by the caller.
    * Emits `d{tag}0 .. d{tag}rounds` where d{tag}i holds (node, dist)
    * with NULL dist for not-yet-reached nodes; each level MATERIALIZED
    * (referenced twice: relax join + carry-forward). `rounds` must
    * exceed the root's eccentricity — measured fixture diameters are
    * 13 (sf0.01), 9 (sf0.1), 3 (sf0.001), so 16 is exact at every sf
    * and extra rounds are least/min no-ops. Replaces r10's |V|-bounded
    * RECURSIVE walks whose cycle frontier re-expanded for hundreds of
    * dead levels (graph_diameter 350 s → <1 s). No trailing comma.
    *
    * The unroll's exactness assumption is VERIFIED, not assumed: the
    * exported final level errors loudly if the last round still
    * relaxed anything (min-relax is monotone, so a fixed point stays
    * fixed — "round `rounds` ≡ round `rounds`−1" proves convergence).
    * A future fixture with eccentricity > `rounds` therefore fails
    * with "oracle incomplete — raise rounds", pointing at the oracle
    * rather than at the engine as a silent hash mismatch would. */
  private def bfsLadder(tag: String, rootSel: String, rounds: Int): String = {
    // the genuine last relax round lands in d{tag}{rounds}raw; the name
    // callers consume (d{tag}{rounds}) re-exports it behind the check
    def lvl(i: Int): String = if (i == rounds) s"d$tag${i}raw" else s"d$tag$i"
    def round(i: Int): String =
      s"""r$tag$i AS (SELECT e.dst AS node, min(d.dist + 1) AS nd FROM e
         |      JOIN ${lvl(i - 1)} d ON e.src = d.node WHERE d.dist IS NOT NULL GROUP BY 1),
         |${lvl(i)} AS MATERIALIZED (SELECT d.node, least(d.dist, r.nd) AS dist
         |      FROM ${lvl(i - 1)} d LEFT JOIN r$tag$i r ON d.node = r.node)""".stripMargin
    s"""d${tag}0 AS MATERIALIZED (SELECT node, CASE WHEN node = ($rootSel)
       |         THEN CAST(0 AS BIGINT) END AS dist FROM n0),
       |${(1 to rounds).map(round).mkString(",\n")},
       |d$tag$rounds AS MATERIALIZED (SELECT a.node,
       |      CASE WHEN (SELECT count(*) FROM d$tag${rounds}raw x
       |                 JOIN d$tag${rounds - 1} y ON x.node = y.node
       |                 WHERE x.dist IS DISTINCT FROM y.dist) = 0
       |        THEN a.dist
       |        ELSE error('bfsLadder($tag): BFS not converged in $rounds rounds — oracle incomplete, raise rounds') END AS dist
       |      FROM d$tag${rounds}raw a)""".stripMargin
  }

  /** Shared CTE prefix for the bigram-LM quality family (text_perplexity
    * / sample_doremi): Laplace-smoothed bigram LM trained on even
    * doc_ids, exact integer inverse-probability ppm per odd doc, ending
    * in `r` (doc_id, lang, n_toks, ppx_ppm). */
  private val pplCtes: String =
    s"""w0 AS (SELECT doc_id, lang, ${tok("text")} AS w FROM documents),
       |wn AS (SELECT * FROM w0 WHERE len(w) > 0),
       |p AS (SELECT doc_id, lang, w, unnest(generate_series(1, len(w))) AS i FROM wn),
       |b AS (SELECT doc_id, lang,
       |        CASE WHEN i = 1 THEN '<s>' ELSE w[i-1] END AS prev, w[i] AS cur FROM p),
       |tr AS (SELECT prev, cur FROM b WHERE doc_id % 2 = 0),
       |cb AS (SELECT prev, cur, count(*) AS c_bi FROM tr GROUP BY 1, 2),
       |cp AS (SELECT prev, count(*) AS c_prev FROM tr GROUP BY 1),
       |v AS (SELECT count(DISTINCT cur) AS v FROM tr),
       |s AS (SELECT b.doc_id, b.lang,
       |        ((coalesce(cp.c_prev, 0) + v.v) * 1000000) // (coalesce(cb.c_bi, 0) + 1) AS inv_ppm
       |      FROM b LEFT JOIN cb ON b.prev = cb.prev AND b.cur = cb.cur
       |        LEFT JOIN cp ON b.prev = cp.prev CROSS JOIN v
       |      WHERE b.doc_id % 2 = 1),
       |d AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
       |        CAST(sum(inv_ppm) AS BIGINT) AS sppm FROM s GROUP BY 1, 2),
       |r AS (SELECT doc_id, lang, n_toks, CAST(sppm // n_toks AS BIGINT) AS ppx_ppm FROM d)""".stripMargin

  /** Join-free 2-D skyline — the shared gate for agg_skyline and the
    * frontier-state streaming form. */
  private lazy val skylineSql: String =
    """WITH o AS (SELECT o_orderkey AS okey,
      |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days
      |FROM orders),
      |w AS (SELECT *,
      |  min(days) OVER (ORDER BY cents RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mdc,
      |  min(days) OVER (PARTITION BY cents) AS mds FROM o)
      |SELECT okey, cents, days FROM w
      |WHERE (mdc IS NULL OR mdc > days) AND mds = days
      |ORDER BY cents, days, okey""".stripMargin

  /** Month×priority revenue MV, full recompute — the shared gate for
    * both incremental-maintenance forms (batch delta and streaming). */
  private lazy val mvFullSql: String =
    """SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
      |  o_orderpriority AS priority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
      |FROM orders GROUP BY 1, 2 ORDER BY month, priority""".stripMargin

  /** Blocked ER candidate pairs (link_blocked_pairs and its streaming
    * incremental twin): block on nation × mktsegment, verify by name
    * edit distance ≤ 2, orient smaller key first. */
  private lazy val linkPairsSql: String =
    s"""SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist
       |FROM customer a JOIN customer b
       |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
       | AND a.c_custkey < b.c_custkey
       |WHERE levenshtein(a.c_name, b.c_name) <= 2
       |ORDER BY cust_a, cust_b""".stripMargin

  /** Shared CTE body for the entity-resolution family (caller supplies
    * the `WITH RECURSIVE` head): verified blocked pairs → bidirectional
    * edges → reachability closure → min-reachable cluster label. */
  private val linkPairCtes: String =
    s"""p AS (SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b
       |      FROM customer a JOIN customer b
       |        ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
       |       AND a.c_custkey < b.c_custkey
       |      WHERE levenshtein(a.c_name, b.c_name) <= 2),
       |bi AS (SELECT cust_a AS src, cust_b AS dst FROM p
       |       UNION ALL SELECT cust_b, cust_a FROM p),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM bi
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN bi e ON e.src = r.dst),
       |lab AS (SELECT src AS node, least(src, min(dst)) AS cluster_id
       |        FROM reach GROUP BY src)""".stripMargin

  /** Golden-record survivorship over the ER clusters (shared by
    * link_golden_records and its incremental streaming twin). */
  private lazy val linkGoldenSql: String =
    s"""WITH RECURSIVE $linkPairCtes,
       |m AS (SELECT l.node, l.cluster_id, c.c_acctbal
       |      FROM lab l JOIN customer c ON l.node = c.c_custkey),
       |g AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |        max(c_acctbal) AS max_bal FROM m GROUP BY 1)
       |SELECT g.cluster_id, c.c_name AS golden_name, g.n_members, g.max_bal
       |FROM g JOIN customer c ON g.cluster_id = c.c_custkey
       |ORDER BY g.cluster_id""".stripMargin

  /** Shared CTE prefix for the LPA family (graph_label_prop /
    * graph_modularity): thresholded co-part edges (e0 oriented, e
    * bidirectional) → three unrolled synchronous plurality-label
    * iterations ending in `l3` (node, label). */
  /** Shared by funnel_attribution (batch running window) and
    * stream_attribution (transformWithState last-click state): last-touch
    * credit per attributed-click day, exact DECIMAL value sums. */
  private lazy val attributionSql: String =
    """WITH b AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_id, event_type,
      |             CAST(value AS DECIMAL(18,2)) AS v FROM events),
      |l AS (SELECT *, last_value(CASE WHEN event_type = 'click' THEN tsu END IGNORE NULLS)
      |        OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lct
      |      FROM b)
      |SELECT strftime(lct, '%Y-%m-%d') AS click_day, count(*) AS n_purchases,
      |  CAST(sum(v) AS DOUBLE) AS sum_value
      |FROM l WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by profile_drift (batch) and stream_drift (keyed-state
    * accumulation): two-sample chi-square per (type, value-decile),
    * halves split at the exact µs midpoint, HUGEINT floor division. */
  private lazy val driftSql: String =
    """WITH b AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS tsu, value FROM events),
      |m AS (SELECT min(epoch_us(tsu)) AS lo, max(epoch_us(tsu)) AS hi FROM b),
      |c AS (SELECT event_type,
      |        least(CAST(floor(value / 10) AS BIGINT), 9) AS bucket,
      |        CASE WHEN epoch_us(tsu) * 2 < m.lo + m.hi THEN 'a' ELSE 'b' END AS w
      |      FROM b CROSS JOIN m),
      |g AS (SELECT event_type, bucket,
      |        CAST(sum(CASE WHEN w = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |        CAST(sum(CASE WHEN w = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |      FROM c GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n_a) AS BIGINT) AS ta,
      |        CAST(sum(n_b) AS BIGINT) AS tb FROM g GROUP BY 1)
      |SELECT g.event_type, g.bucket, g.n_a, g.n_b,
      | CAST((CAST(1000000 AS HUGEINT)
      |     * (CAST(g.n_a AS HUGEINT) * t.tb - CAST(g.n_b AS HUGEINT) * t.ta)
      |     * (CAST(g.n_a AS HUGEINT) * t.tb - CAST(g.n_b AS HUGEINT) * t.ta))
      |   // (CAST(t.ta AS HUGEINT) * CAST(t.tb AS HUGEINT)
      |     * CAST(g.n_a + g.n_b AS HUGEINT)) AS BIGINT) AS chi2_ppm
      |FROM g JOIN t USING (event_type) ORDER BY event_type, bucket""".stripMargin

  private lazy val lpaCtes: String = {
    def step(i: Int): String =
      s"""c$i AS (SELECT e.dst AS node, l.label, count(*) AS c
         |      FROM e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |p$i AS (SELECT node, label FROM (SELECT node, label,
         |        row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rk
         |        FROM c$i) WHERE rk = 1),
         |l$i AS (SELECT l.node, COALESCE(p.label, l.label) AS label
         |      FROM l${i - 1} l LEFT JOIN p$i p ON l.node = p.node)""".stripMargin
    s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
       |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |${step(1)},
       |${step(2)},
       |${step(3)}""".stripMargin
  }

  /** Unrolled Louvain ladder (graph_louvain): the same thresholded
    * co-part graph as the LPA family, then 6 synchronous ΔQ-move rounds
    * — per round the per-(node, neighbour-community) weight kc, the
    * community degree mass dc, the candidate set (neighbour communities
    * ∪ own), the integer score 4W·k − 2·d_i·(D_c − [own]·d_i), a
    * (score DESC, c) argmax with the stay score alongside, and the
    * parity-gated strictly-improving move — mirroring
    * Graph.louvainKernel exactly. */
  private lazy val louvainCtes: String = {
    def round(i: Int): String =
      s"""kc$i AS (SELECT e.src AS node, l.label AS c, count(*) AS k
         |      FROM e JOIN lv${i - 1} l ON e.dst = l.node GROUP BY 1, 2),
         |dc$i AS (SELECT l.label AS c, sum(dg.di) AS dc
         |      FROM lv${i - 1} l JOIN dg ON l.node = dg.node GROUP BY 1),
         |ca$i AS (SELECT node, c, max(k) AS k FROM (
         |        SELECT node, c, k FROM kc$i
         |        UNION ALL SELECT node, label AS c, 0 AS k FROM lv${i - 1}) GROUP BY 1, 2),
         |sc$i AS (SELECT a.node, a.c, cu.label AS curc,
         |        4 * wt.w * a.k - 2 * dg.di *
         |          (dc$i.dc - CASE WHEN a.c = cu.label THEN dg.di ELSE 0 END) AS score
         |      FROM ca$i a JOIN lv${i - 1} cu ON a.node = cu.node
         |        JOIN dg ON a.node = dg.node
         |        JOIN dc$i ON a.c = dc$i.c CROSS JOIN wt),
         |lv$i AS MATERIALIZED (SELECT node,
         |        CASE WHEN (node + $i) % 2 = 0 AND c <> curc AND score > cs
         |             THEN c ELSE curc END AS label
         |      FROM (SELECT *,
         |              row_number() OVER (PARTITION BY node ORDER BY score DESC, c) AS rk,
         |              max(CASE WHEN c = curc THEN score END)
         |                OVER (PARTITION BY node) AS cs
         |            FROM sc$i) WHERE rk = 1)""".stripMargin
    s"""WITH os AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
       |e0 AS MATERIALIZED (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
       |       GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |dg AS MATERIALIZED (SELECT src AS node, count(*) AS di FROM e GROUP BY 1),
       |wt AS MATERIALIZED (SELECT count(*) AS w FROM e0),
       |lv0 AS MATERIALIZED (SELECT node, node AS label FROM dg),
       |${(1 to 6).map(round).mkString(",\n")}""".stripMargin
  }

  /** Shared CTE prefix for the trained-IVF family (simsearch_ivf_trained /
    * simsearch_hard_negatives): quantised embeddings → one deterministic
    * Lloyd iteration (first-8 seed, truncated integer means) → final
    * `assigned` cells + nprobe=2 `probecells` for probes vec_id < 5. */
  private lazy val ivfTrainedCtes: String =
    s"""$embCtes,
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cqv, nrm AS cnrm
       |       FROM f WHERE vec_id < 8),
       |cc0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM f v, c0 c),
       |a0 AS (SELECT vec_id, qv, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc0)
       |  WHERE crk = 1),
       |sums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
       |         FROM a0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
       |         GROUP BY cid, i_),
       |cm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM sums GROUP BY cid),
       |c1 AS (SELECT c0.cid, coalesce(cm.cqv, c0.cqv) AS cqv FROM c0 LEFT JOIN cm USING (cid)),
       |c1n AS (SELECT cid, cqv,
       |          CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm FROM c1),
       |cc1 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM f v, c1n c),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc1),
       |assigned AS (SELECT vec_id, qv, nrm, cid FROM ranked WHERE crk = 1),
       |probecells AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, cid
       |               FROM ranked WHERE vec_id < 5 AND crk <= 2)""".stripMargin

  /** [[ivfTrainedCtes]] with SAMPLE-BOUNDED training: seeds and the one
    * Lloyd iteration run over the modulus sample `vec_id % 2 = 0` only
    * (seeds = first 8 sample vectors in vec_id order, renumbered 0..7);
    * the final assignment + probecells pass runs over the FULL corpus —
    * mirroring Similarity.ivfTrainedTopKSampled exactly. */
  private lazy val ivfSampledCtes: String =
    s"""$embCtes,
       |fs AS (SELECT * FROM f WHERE vec_id % 2 = 0),
       |c0 AS (SELECT cid, cqv, cnrm FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cqv, nrm AS cnrm
       |    FROM fs) WHERE cid < 8),
       |cc0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM fs v, c0 c),
       |a0 AS (SELECT vec_id, qv, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc0)
       |  WHERE crk = 1),
       |sums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
       |         FROM a0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
       |         GROUP BY cid, i_),
       |cm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM sums GROUP BY cid),
       |c1 AS (SELECT c0.cid, coalesce(cm.cqv, c0.cqv) AS cqv FROM c0 LEFT JOIN cm USING (cid)),
       |c1n AS (SELECT cid, cqv,
       |          CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm FROM c1),
       |cc1 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
       |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
       |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
       |  FROM f v, c1n c),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc1),
       |assigned AS (SELECT vec_id, qv, nrm, cid FROM ranked WHERE crk = 1),
       |probecells AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, cid
       |               FROM ranked WHERE vec_id < 5 AND crk <= 2)""".stripMargin

  /** Shared CTE prefix for the BM25 family (text_bm25 / text_rrf_fusion):
    * tokenise → tf/df for the fixed query → per-(doc,term) integer-micro
    * partial scores `s`. */
  private lazy val bm25Ctes: String =
    s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
       |t AS (SELECT doc_id, unnest(w) AS term FROM w),
       |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
       |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t FROM dl),
       |n AS (SELECT count(*) AS n FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
       |       WHERE term IN ('the', 'data', 'model') GROUP BY doc_id, term),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t
       |       WHERE term IN ('the', 'data', 'model') GROUP BY term),
       |s AS (SELECT tf.doc_id,
       |        CAST(floor(CAST(((n.n - df.df + 1) * 1000000) // (df.df + 1) AS DOUBLE)
       |          * CAST(22 * tot.t * tf.tf AS DOUBLE)
       |          / CAST(10 * tot.t * tf.tf + 3 * tot.t + 9 * dl.dl * n.n AS DOUBLE)) AS BIGINT) AS sm
       |      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN tot CROSS JOIN n)""".stripMargin

  private val langLexSql: String =
    """(VALUES ('de', ['der','die','und','das','ein','nicht']),
      |        ('en', ['the','and','of','to','a','in','is']),
      |        ('es', ['el','la','de','que','y','los']),
      |        ('fr', ['le','la','et','les','des','un'])) AS lx(lang, lex)""".stripMargin

  private val enLex = "['the','and','of','to','a','in','is']"

  lazy val all: Map[String, String] = base +
    // probing the PERSISTED index must reproduce the in-memory trained-IVF
    // results bit-for-bit (same training rule) — one oracle, two paths
    ("simsearch_ivf_persist" -> base("simsearch_ivf_trained")) +
    // pairs from the PERSISTED band index must reproduce the in-memory
    // minhash-LSH candidates bit-for-bit (the index stores exactly the
    // banded signatures) — one oracle, two paths
    ("dedup_lsh_persist" -> base("dedup_minhash_lsh")) +
    // the native-plan as-of join answers the identical question — one
    // oracle, two formulations under test
    ("join_asof_native" -> base("join_asof")) +
    // per-micro-batch as-of against a static right side unions to the
    // batch join exactly (each left row's match is independent)
    ("stream_asof_join" -> base("join_asof")) +
    // same independence argument for the point-in-time dimension probe
    ("stream_temporal_join" -> base("join_temporal"))

  private val base: Map[String, String] = Map(
    "scan_csv" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey",

    // Arithmetic reconstruction of the PERMISSIVE read: every
    // event_id%10==0 line was written truncated -> '(corrupt)' bucket
    // with zero value mass; good rows census per type.
    "scan_json_corrupt" ->
      s"""SELECT CASE WHEN event_id % 10 = 0 THEN '(corrupt)' ELSE event_type END AS bucket,
         | count(*) AS n,
         | CAST(sum(CAST(CASE WHEN event_id % 10 = 0 THEN 0 ELSE value END
         |   AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "scan_json" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",

    "scan_orc" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",

    "scan_xml" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",

    "scan_avro" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",

    "scan_directory" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",

    "filter_filename_valid" ->
      s"""SELECT o_orderkey, fname
         |FROM (SELECT o_orderkey, $fnameExpr AS fname FROM orders)
         |WHERE $fnameValid ORDER BY o_orderkey""".stripMargin,

    "project_extract_date" ->
      s"""SELECT o_orderkey, substring(fname, 8, 10) AS file_date
         |FROM (SELECT o_orderkey, $fnameExpr AS fname FROM orders)
         |WHERE $fnameValid ORDER BY o_orderkey""".stripMargin,

    "sort_by_date" ->
      s"SELECT event_id, $tsS AS ts_str FROM events ORDER BY ts_str, event_id",

    "filter_required_column" ->
      "SELECT event_id, value FROM events WHERE ts IS NOT NULL ORDER BY event_id",

    "filter_dropna_all" ->
      """SELECT event_id,
        | CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value2,
        | CASE WHEN event_id % 3 = 0 THEN NULL ELSE props END AS props2
        |FROM events
        |WHERE NOT (event_id % 7 = 0 AND event_id % 3 = 0)
        |ORDER BY event_id""".stripMargin,

    "project_make_timestamp" ->
      s"SELECT event_id, $tsS AS date_time FROM events ORDER BY event_id",

    "project_rename" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        | l_quantity AS quantity, l_extendedprice AS price
        |FROM lineitem ORDER BY order_key, line_no""".stripMargin,

    "project_select" ->
      """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "antijoin_processed" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 3)
        |ORDER BY o_orderkey""".stripMargin,

    "ledger_append" ->
      """SELECT DISTINCT o_orderkey FROM (
        | SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 3
        | UNION ALL
        | SELECT o_orderkey FROM orders WHERE o_orderkey % 4 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "sink_append_db" ->
      s"""SELECT event_id, $tsS AS date_time, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,

    "sink_jdbc_roundtrip" ->
      s"""SELECT event_id, $tsS AS date_time, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,

    // replay-safe append: a full double-append leaves exactly one copy
    "sink_jdbc_idempotent" ->
      s"""SELECT event_id, $tsS AS date_time, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,

    // statement-based multi-row INSERT writer + replay guard: one copy
    "sink_jdbc_multirow" ->
      s"""SELECT event_id, $tsS AS date_time, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,

    "stream_jdbc_sink" ->
      s"""SELECT event_id, $tsS AS date_time, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,

    "ddl_create_table" ->
      """SELECT * FROM (VALUES ('date_time', 'timestamp'), ('event_id', 'bigint'),
        | ('event_type', 'string'), ('value', 'double')) AS t(col_name, data_type)
        |ORDER BY col_name""".stripMargin,

    "ddl_partition_time" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
         | count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "parallel_files" ->
      s"""SELECT event_type, count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "error_isolation" ->
      """SELECT event_id, CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS value
        |FROM events ORDER BY event_id""".stripMargin,

    "pipeline_backfill_then_watch" ->
      s"""SELECT event_id, $tsS AS date_time, event_type,
         | CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
         |FROM events
         |WHERE NOT (event_id % 7 = 0 AND event_id % 3 = 0)
         |ORDER BY event_id""".stripMargin,

    "stream_file_source" ->
      s"""SELECT event_id, $tsS AS date_time, event_type, value
         |FROM events ORDER BY event_id""".stripMargin,

    "stream_window_agg" ->
      s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS win_start,
         | event_type, count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_static_join" ->
      s"""SELECT event_type, count(*) AS n, ${decSum2("value")} AS sum_value,
         | CAST(sum(n_user_events) AS BIGINT) AS sum_dim
         |FROM events e
         |JOIN (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id) d
         |  ON e.user_id = d.user_id
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Append-mode emission is a *when*, not a *what*: once the watermark
    // passes every real window (the staged sentinel guarantees it), the
    // emitted set equals the batch group-by. The sentinel row's own window
    // never closes, so it is absent from both sides.
    "stream_window_append" ->
      s"""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS win_start,
         | event_type, count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Watermarks bound stream-stream join STATE, never the match set (rows
    // are evicted only when provably unmatchable), so the drained stream
    // equals the batch interval join.
    "stream_stream_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS cts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS pts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, p.purchase_id,
        | strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_s,
        | strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS purchase_s
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.pts >= c.cts AND p.pts <= c.cts + INTERVAL 30 MINUTE
        |ORDER BY c.user_id, c.click_id, p.purchase_id""".stripMargin,

    // ---- extensions ------------------------------------------------------

    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dups, md5(text) AS digest
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "dedup_minhash_lsh" ->
      s"$minhashCtes\nSELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b",

    // Incremental crawl dedup: per increment doc (doc_id % 5 = 0), the
    // distinct HISTORY docs (doc_id % 5 != 0) sharing a band bucket, and
    // the is_dup ingest gate; zero-band docs report 0 via the left join.
    "dedup_lsh_append" ->
      s"""$minhashCtes
         |SELECT d.doc_id, CAST(coalesce(m.n, 0) AS BIGINT) AS n_matched,
         |  coalesce(m.n, 0) > 0 AS is_dup
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |LEFT JOIN (SELECT nw.doc_id, count(DISTINCT o.doc_id) AS n
         |           FROM bands nw JOIN bands o
         |             ON nw.band = o.band AND nw.sig = o.sig AND o.doc_id % 5 != 0
         |           WHERE nw.doc_id % 5 = 0 GROUP BY 1) m USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Canonicalised exact dedup: lower -> strip non-alnum -> collapse
    // spaces -> trim; character classes identical in Java regex and RE2.
    "dedup_normalized" ->
      """WITH c AS (SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')) AS canon
        |  FROM documents)
        |SELECT min(doc_id) AS rep, count(*) AS n_docs,
        |  count(DISTINCT text) AS n_distinct_raw
        |FROM c GROUP BY canon ORDER BY rep""".stripMargin,

    // Tokenizer fertility per (source, lang): tokens per 100 chars off
    // exact integer group sums.
    "pipeline_tokenizer_fertility" -> {
      s"""WITH t AS (SELECT source, lang, n_chars,
         |    CAST(len(${tok("text")}) AS BIGINT) AS n_toks
         |  FROM documents)
         |SELECT source, lang, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS sum_toks,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST((sum(n_toks) * 100) // greatest(sum(n_chars), 1) AS BIGINT) AS fertility_c100
         |FROM t GROUP BY source, lang ORDER BY source, lang""".stripMargin
    },

    // Cross-tier dedup ladder census: one row per tier, same group
    // definitions as the standalone tier oracles (shared CTEs).
    "pipeline_dedup_report" ->
      s"""$minhashCtes,
         |ex AS (SELECT count(*) AS n FROM documents GROUP BY text),
         |nr AS (SELECT count(*) AS n FROM documents
         |       GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))),
         |sigs AS (SELECT doc_id, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
         |         FROM mh GROUP BY doc_id),
         |sgr AS (SELECT count(*) AS n FROM sigs GROUP BY sig),
         |grp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |d0 AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |       FROM bands b JOIN grp g ON b.band = g.band AND b.sig = g.sig
         |       GROUP BY b.doc_id),
         |d1 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d0 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d0) p ON p.rep = d.rep),
         |d2 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d1 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d1) p ON p.rep = d.rep),
         |d3 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d2 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d2) p ON p.rep = d.rep)
         |SELECT '1_exact' AS tier, CAST(sum(n) AS BIGINT) AS n_docs_in,
         |  count(*) AS n_groups, CAST(sum(n) - count(*) AS BIGINT) AS n_collapsed FROM ex
         |UNION ALL
         |SELECT '2_normalized', CAST(sum(n) AS BIGINT), count(*),
         |  CAST(sum(n) - count(*) AS BIGINT) FROM nr
         |UNION ALL
         |SELECT '3_minhash_sig', CAST(sum(n) AS BIGINT), count(*),
         |  CAST(sum(n) - count(*) AS BIGINT) FROM sgr
         |UNION ALL
         |SELECT '4_lsh_band', count(*), count(DISTINCT rep),
         |  count(*) - count(DISTINCT rep) FROM d0
         |UNION ALL
         |SELECT '5_cc', count(*), count(DISTINCT rep),
         |  count(*) - count(DISTINCT rep) FROM d3
         |ORDER BY tier""".stripMargin,

    // Per-candidate MinHash accuracy: signature-agreement estimate vs the
    // exact shingle-set Jaccard, integer ppm.
    "dedup_minhash_accuracy" ->
      s"""$minhashCtes,
         |est AS (SELECT p.doc_a, p.doc_b,
         |          CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) * 1000000 // 16 AS BIGINT) AS est_ppm
         |        FROM pairs p
         |        JOIN mh a ON a.doc_id = p.doc_a
         |        JOIN mh b ON b.doc_id = p.doc_b AND a.seed = b.seed
         |        GROUP BY 1, 2),
         |ex AS (SELECT p.doc_a, p.doc_b,
         |         CAST(len(list_intersect(x.hs, y.hs)) * 1000000
         |           // len(list_distinct(x.hs || y.hs)) AS BIGINT) AS exact_ppm
         |       FROM pairs p
         |       JOIN sh0 x ON x.doc_id = p.doc_a
         |       JOIN sh0 y ON y.doc_id = p.doc_b)
         |SELECT e.doc_a, e.doc_b, e.est_ppm, x.exact_ppm,
         |  abs(e.est_ppm - x.exact_ppm) AS err_ppm
         |FROM est e JOIN ex x USING (doc_a, doc_b)
         |ORDER BY doc_a, doc_b""".stripMargin,

    // LSH eval: exact ground truth at J >= 0.5 (inverted-index shingle
    // self-join — the same sub-all-pairs shape as the engine side; a
    // pair sharing zero shingles can't reach the threshold) vs the RAW
    // banded candidate set (threshold on the truth side only — verifying
    // candidates with the same test made precision degenerate-1 in r10);
    // P/R/F1 in exact ppm. PROBE-BUDGETED (mirroring the engine): the
    // eval universe is pairs whose smaller doc_id = 0 mod
    // greatest(1, n//128) — a uniform pair subsample that keeps the
    // truth join linear at any corpus scale.
    "dedup_lsh_eval" ->
      s"""$minhashCtes,
         |m AS (SELECT greatest(1, count(*) // 128) AS md FROM documents),
         |ss AS (SELECT doc_id, hs FROM sh0 WHERE len(hs) > 0),
         |st AS (SELECT doc_id, unnest(hs) AS h FROM ss),
         |iv AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |       FROM st a JOIN st b ON a.h = b.h AND a.doc_id < b.doc_id
         |       WHERE a.doc_id % (SELECT md FROM m) = 0
         |       GROUP BY 1, 2),
         |tp AS (SELECT i.doc_a, i.doc_b FROM iv i
         |       JOIN ss x ON x.doc_id = i.doc_a JOIN ss y ON y.doc_id = i.doc_b
         |       WHERE i.inter * 1000000 >= 500000 * (len(x.hs) + len(y.hs) - i.inter)),
         |dt AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |       WHERE p.doc_a % (SELECT md FROM m) = 0),
         |ht AS (SELECT t.* FROM tp t JOIN dt d
         |       ON d.doc_a = t.doc_a AND d.doc_b = t.doc_b),
         |c AS (SELECT (SELECT count(*) FROM tp) AS n_true,
         |        (SELECT count(*) FROM dt) AS n_detected,
         |        (SELECT count(*) FROM ht) AS n_hit)
         |SELECT CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_detected AS BIGINT) AS n_detected,
         |  CAST(n_hit AS BIGINT) AS n_hit,
         |  CAST(CASE WHEN n_detected = 0 THEN 0
         |       ELSE (n_hit * 1000000) // n_detected END AS BIGINT) AS precision_ppm,
         |  CAST(CASE WHEN n_true = 0 THEN 0
         |       ELSE (n_hit * 1000000) // n_true END AS BIGINT) AS recall_ppm,
         |  CAST(CASE WHEN n_true + n_detected = 0 THEN 0
         |       ELSE (2 * n_hit * 1000000) // (n_true + n_detected) END AS BIGINT) AS f1_ppm
         |FROM c""".stripMargin,

    // b=1-bit minhash: agreement of signature parities, unbiased by
    // J = 2A - 1 (clamped at 0), error vs the exact shingle Jaccard.
    "dedup_bbit_minhash" ->
      s"""$minhashCtes,
         |est AS (SELECT p.doc_a, p.doc_b,
         |          CAST(sum(CASE WHEN a.mh % 2 = b.mh % 2 THEN 1 ELSE 0 END) AS BIGINT) AS agree_bits
         |        FROM pairs p
         |        JOIN mh a ON a.doc_id = p.doc_a
         |        JOIN mh b ON b.doc_id = p.doc_b AND a.seed = b.seed
         |        GROUP BY 1, 2),
         |ex AS (SELECT p.doc_a, p.doc_b,
         |         CAST(len(list_intersect(x.hs, y.hs)) * 1000000
         |           // len(list_distinct(x.hs || y.hs)) AS BIGINT) AS exact_ppm
         |       FROM pairs p
         |       JOIN sh0 x ON x.doc_id = p.doc_a
         |       JOIN sh0 y ON y.doc_id = p.doc_b),
         |e1 AS (SELECT e.doc_a, e.doc_b, e.agree_bits,
         |         CAST(greatest(0, (2000000 * e.agree_bits) // 16 - 1000000) AS BIGINT) AS est1bit_ppm,
         |         x.exact_ppm
         |       FROM est e JOIN ex x USING (doc_a, doc_b))
         |SELECT doc_a, doc_b, agree_bits, est1bit_ppm, exact_ppm,
         |  abs(est1bit_ppm - exact_ppm) AS err_ppm
         |FROM e1 ORDER BY doc_a, doc_b""".stripMargin,

    // Streaming lake merge converges to exactly-once content: census of
    // the source feed.
    "stream_lake_merge" ->
      s"""SELECT event_type, count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Streaming IVF maintenance converges to exactly-once CONTENT
    // whatever the trigger slicing and whenever the mid-stream rebuild
    // fires: the final corpus is base ∪ increments ∪ drifted cluster
    // (the simsearch_ivf_rebuild flood — same floor((|x|+1)*1e6) dag),
    // each vec_id exactly once. Census/cell layout is deliberately NOT
    // in the output — it depends on batch boundaries; content cannot.
    "stream_ivf_maintain" ->
      s"""$embCtes,
         |fl AS (SELECT 1000000 + vec_id AS vec_id,
         |         list_transform(embedding, x_ -> CAST(floor((abs(CAST(x_ AS DOUBLE)) + 1.0)*1000000) AS BIGINT)) AS qv
         |       FROM embeddings WHERE vec_id % 5 = 0),
         |fln AS (SELECT vec_id, qv,
         |          CAST(list_sum(list_transform(qv, x_ -> x_*x_)) AS BIGINT) AS nrm FROM fl),
         |allv AS (SELECT vec_id FROM f
         |         UNION ALL
         |         SELECT vec_id FROM fln WHERE nrm > 0)
         |SELECT vec_id, CAST(1 AS BIGINT) AS n FROM allv ORDER BY vec_id""".stripMargin,

    "dedup_minhash_clusters" ->
      s"""$minhashCtes,
         |sigs AS (SELECT doc_id, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
         |         FROM mh GROUP BY doc_id)
         |SELECT min(doc_id) AS rep, count(*) AS n_docs
         |FROM sigs GROUP BY sig ORDER BY rep""".stripMargin,

    "dedup_lsh_clusters" ->
      s"""$minhashCtes,
         |grp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |docrep AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |           FROM bands b JOIN grp g ON b.band = g.band AND b.sig = g.sig
         |           GROUP BY b.doc_id)
         |SELECT rep, count(*) AS n_docs FROM docrep GROUP BY rep ORDER BY rep""".stripMargin,

    "dedup_cc_clusters" ->
      s"""$minhashCtes,
         |grp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |d0 AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |       FROM bands b JOIN grp g ON b.band = g.band AND b.sig = g.sig
         |       GROUP BY b.doc_id),
         |d1 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d0 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d0) p ON p.rep = d.rep),
         |d2 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d1 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d1) p ON p.rep = d.rep),
         |d3 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d2 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d2) p ON p.rep = d.rep)
         |SELECT rep, count(*) AS n_docs FROM d3 GROUP BY rep ORDER BY rep""".stripMargin,

    // Leakage-aware split: sides by doc-id hash vs dedup-cluster-rep
    // hash (the cc-contraction reps, mirrored from dedup_cc_clusters),
    // leakage = banded candidate pairs straddling the split.
    "sample_split_cluster_safe" -> {
      val hDoc = ch("CAST(doc_id AS VARCHAR)")
      val hRep = ch("CAST(rep AS VARCHAR)")
      s"""$minhashCtes,
         |grp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |d0 AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |       FROM bands b JOIN grp g ON b.band = g.band AND b.sig = g.sig
         |       GROUP BY b.doc_id),
         |d1 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d0 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d0) p ON p.rep = d.rep),
         |d2 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d1 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d1) p ON p.rep = d.rep),
         |d3 AS (SELECT d.doc_id, coalesce(p.rep2, d.rep) AS rep FROM d2 d
         |       LEFT JOIN (SELECT doc_id AS rep, rep AS rep2 FROM d2) p ON p.rep = d.rep),
         |lab AS (SELECT doc.doc_id, coalesce(d3.rep, doc.doc_id) AS rep
         |        FROM documents doc LEFT JOIN d3 ON doc.doc_id = d3.doc_id),
         |sd AS (SELECT doc_id,
         |         CASE WHEN ($hDoc) % 100 < 80 THEN 'train' ELSE 'test' END AS naive,
         |         CASE WHEN ($hRep) % 100 < 80 THEN 'train' ELSE 'test' END AS safe
         |       FROM lab),
         |pm AS (SELECT a.naive AS na, b.naive AS nb, a.safe AS sa, b.safe AS sb
         |       FROM pairs p JOIN sd a ON p.doc_a = a.doc_id
         |       JOIN sd b ON p.doc_b = b.doc_id)
         |SELECT * FROM (
         |  SELECT 'cluster_safe' AS strategy,
         |    CAST((SELECT count(*) FROM sd WHERE safe = 'train') AS BIGINT) AS n_train,
         |    CAST((SELECT count(*) FROM sd WHERE safe = 'test') AS BIGINT) AS n_test,
         |    CAST((SELECT count(*) FROM pm) AS BIGINT) AS cand_pairs,
         |    CAST((SELECT count(*) FROM pm WHERE sa <> sb) AS BIGINT) AS leaked_pairs
         |  UNION ALL
         |  SELECT 'doc_hash',
         |    CAST((SELECT count(*) FROM sd WHERE naive = 'train') AS BIGINT),
         |    CAST((SELECT count(*) FROM sd WHERE naive = 'test') AS BIGINT),
         |    CAST((SELECT count(*) FROM pm) AS BIGINT),
         |    CAST((SELECT count(*) FROM pm WHERE na <> nb) AS BIGINT)
         |) ORDER BY strategy""".stripMargin
    },

    "dedup_jaccard_clusters" ->
      s"""$minhashCtes,
         |grp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |docrep AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |           FROM bands b JOIN grp g ON b.band = g.band AND b.sig = g.sig
         |           GROUP BY b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT d.doc_id, d.rep, count(*) AS inter
         |          FROM docrep d
         |          JOIN sh x ON x.doc_id = d.doc_id
         |          JOIN sh y ON y.doc_id = d.rep AND y.h = x.h
         |          WHERE d.doc_id <> d.rep
         |          GROUP BY d.doc_id, d.rep),
         |v AS (SELECT d.doc_id, d.rep,
         |        coalesce(i.inter, 0) / (sa.n + sr.n - coalesce(i.inter, 0)) AS jaccard
         |      FROM docrep d
         |      LEFT JOIN inter i ON i.doc_id = d.doc_id AND i.rep = d.rep
         |      JOIN sizes sa ON sa.doc_id = d.doc_id
         |      JOIN sizes sr ON sr.doc_id = d.rep),
         |m AS (SELECT doc_id,
         |        CASE WHEN doc_id = rep OR jaccard >= 0.5 THEN rep ELSE doc_id END AS cluster
         |      FROM v)
         |SELECT cluster AS rep, count(*) AS n_docs FROM m GROUP BY cluster ORDER BY rep""".stripMargin,

    "stream_dedup_clusters" ->
      s"""$minhashCtes,
         |sigs AS (SELECT doc_id, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
         |         FROM mh GROUP BY doc_id)
         |SELECT min(doc_id) AS rep, count(*) AS n_docs
         |FROM sigs GROUP BY sig ORDER BY rep""".stripMargin,

    "dedup_containment" ->
      s"""$minhashCtes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
         |          FROM pairs p
         |          JOIN sh x ON x.doc_id = p.doc_a
         |          JOIN sh y ON y.doc_id = p.doc_b AND y.h = x.h
         |          GROUP BY p.doc_a, p.doc_b)
         |SELECT i.doc_a, i.doc_b,
         | i.inter / sa.n AS c_a_in_b,
         | i.inter / sb.n AS c_b_in_a
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.doc_a
         |JOIN sizes sb ON sb.doc_id = i.doc_b
         |WHERE i.inter / sa.n >= 0.5 OR i.inter / sb.n >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""$minhashCtes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
         |          FROM pairs p
         |          JOIN sh x ON x.doc_id = p.doc_a
         |          JOIN sh y ON y.doc_id = p.doc_b AND y.h = x.h
         |          GROUP BY p.doc_a, p.doc_b)
         |SELECT i.doc_a, i.doc_b, i.inter / (sa.n + sb.n - i.inter) AS jaccard
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.doc_a
         |JOIN sizes sb ON sb.doc_id = i.doc_b
         |WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_edit_distance" ->
      s"""$minhashCtes,
         |j AS (SELECT p.doc_a, p.doc_b,
         |        CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist,
         |        CAST(1 AS DOUBLE) - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
         |          CAST(greatest(length(da.text), length(db.text)) AS DOUBLE) AS sim
         |      FROM pairs p
         |      JOIN documents da ON da.doc_id = p.doc_a
         |      JOIN documents db ON db.doc_id = p.doc_b)
         |SELECT doc_a, doc_b, dist, sim FROM j WHERE sim >= 0.4
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |th AS (SELECT doc_id, (${ch("reverse(t)")} << 30) + ${ch("t")} AS h
         |       FROM (SELECT doc_id, unnest(w) AS t FROM w)),
         |bits AS (SELECT unnest(generate_series(0, 59)) AS bit),
         |votes AS (SELECT doc_id, bit,
         |            sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |          FROM th, bits GROUP BY doc_id, bit)
         |SELECT doc_id,
         | CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |th AS (SELECT doc_id, (${ch("reverse(t)")} << 30) + ${ch("t")} AS h
         |       FROM (SELECT doc_id, unnest(w) AS t FROM w)),
         |bits AS (SELECT unnest(generate_series(0, 59)) AS bit),
         |votes AS (SELECT doc_id, bit,
         |            sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |          FROM th, bits GROUP BY doc_id, bit),
         |sh AS (SELECT doc_id,
         |         CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
         |       FROM votes GROUP BY doc_id),
         |keyed AS (SELECT simhash, min(doc_id) AS rep, count(*) AS n_docs,
         |            simhash % 1073741824 AS lo, simhash >> 30 AS hi
         |          FROM sh GROUP BY simhash),
         |cand AS (
         | SELECT a.rep AS rep_a, b.rep AS rep_b, a.n_docs AS docs_a, b.n_docs AS docs_b,
         |        a.simhash AS sa, b.simhash AS sb
         | FROM keyed a JOIN keyed b ON a.lo = b.lo AND a.simhash < b.simhash
         | UNION
         | SELECT a.rep, b.rep, a.n_docs, b.n_docs, a.simhash, b.simhash
         | FROM keyed a JOIN keyed b ON a.hi = b.hi AND a.simhash < b.simhash)
         |SELECT DISTINCT rep_a, rep_b, docs_a, docs_b,
         | CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 6 ORDER BY rep_a, rep_b""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""$embCtes
         |SELECT vec_a, vec_b, cosine FROM (
         | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  CAST(${qdotPair("a.qv", "b.qv")} AS DOUBLE) /
         |   (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cosine
         | FROM f a JOIN f b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.5 ORDER BY vec_a, vec_b""".stripMargin,

    "dedup_embedding_lsh" -> {
      val planeComp = ch("(CAST(p AS VARCHAR) || ':' || CAST(i_ - 1 AS VARCHAR))")
      s"""$embCtes,
         |planes AS (SELECT unnest(generate_series(0, 3)) AS p),
         |dots AS (SELECT f.vec_id, p,
         |   CAST(list_sum(list_transform(generate_series(1, len(qv)),
         |     i_ -> qv[i_] * (($planeComp) % 2001 - 1000))) AS BIGINT) AS dot
         | FROM f, planes),
         |buckets AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN dot >= 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         | FROM dots GROUP BY vec_id),
         |b AS (SELECT f.vec_id, f.qv, f.nrm, buckets.bucket FROM f JOIN buckets USING (vec_id))
         |SELECT vec_a, vec_b, cosine FROM (
         | SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |  CAST(${qdotPair("x.qv", "y.qv")} AS DOUBLE) /
         |   (sqrt(CAST(x.nrm AS DOUBLE)) * sqrt(CAST(y.nrm AS DOUBLE))) AS cosine
         | FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin
    },

    "dedup_embedding_clusters" -> {
      val planeComp = ch("(CAST(p AS VARCHAR) || ':' || CAST(i_ - 1 AS VARCHAR))")
      s"""$embCtes,
         |f2 AS (SELECT qv, min(vec_id) AS vec_id, min(nrm) AS nrm, count(*) AS n_copies
         |       FROM f GROUP BY qv),
         |planes AS (SELECT unnest(generate_series(0, 3)) AS p),
         |dots AS (SELECT f2.vec_id, p,
         |   CAST(list_sum(list_transform(generate_series(1, len(qv)),
         |     i_ -> qv[i_] * (($planeComp) % 2001 - 1000))) AS BIGINT) AS dot
         | FROM f2, planes),
         |buckets AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN dot >= 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         | FROM dots GROUP BY vec_id),
         |b AS (SELECT f2.vec_id, f2.qv, f2.nrm, f2.n_copies, buckets.bucket
         |      FROM f2 JOIN buckets USING (vec_id)),
         |reps AS (SELECT bucket, min(vec_id) AS rep FROM b GROUP BY bucket),
         |rv AS (SELECT r.bucket, r.rep, rb.qv AS rqv, rb.nrm AS rnrm
         |       FROM reps r JOIN b rb ON rb.vec_id = r.rep),
         |m AS (SELECT x.vec_id, x.n_copies,
         |        CASE WHEN x.vec_id = rv.rep THEN rv.rep
         |             WHEN CAST(${qdotPair("x.qv", "rv.rqv")} AS DOUBLE) /
         |                   (sqrt(CAST(x.nrm AS DOUBLE)) * sqrt(CAST(rv.rnrm AS DOUBLE))) >= 0.4
         |               THEN rv.rep
         |             ELSE x.vec_id END AS cluster
         |      FROM b x JOIN rv ON x.bucket = rv.bucket)
         |SELECT cluster AS rep, CAST(sum(n_copies) AS BIGINT) AS n_members
         |FROM m GROUP BY cluster ORDER BY rep""".stripMargin
    },

    "dedup_semantic" ->
      s"""$semanticCellCtes,
         |dups AS (SELECT b.vec_id, CAST(count(*) AS BIGINT) AS n_dup_earlier
         |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE CAST(${qdotPair("a.qv", "b.qv")} AS DOUBLE) /
         |         (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) >= 0.3
         |  GROUP BY b.vec_id)
         |SELECT a.vec_id, a.cid, coalesce(d.n_dup_earlier, 0) AS n_dup_earlier,
         | CAST(CASE WHEN coalesce(d.n_dup_earlier, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    "dedup_semantic_sweep" ->
      s"""$semanticCellCtes,
         |mx AS (SELECT b.vec_id,
         |         max(CAST(${qdotPair("a.qv", "b.qv")} AS DOUBLE) /
         |              (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))) AS max_cos
         |       FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |       GROUP BY b.vec_id),
         |tot AS (SELECT count(*) AS n_total FROM assigned),
         |th AS (SELECT CAST(t AS DOUBLE) AS threshold
         |       FROM (VALUES (0.25), (0.30), (0.35), (0.40)) v(t))
         |SELECT th.threshold,
         | CAST(sum(CASE WHEN mx.max_cos >= th.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
         | CAST(tot.n_total AS BIGINT) AS n_total,
         | CAST(sum(CASE WHEN mx.max_cos >= th.threshold THEN 1 ELSE 0 END) AS BIGINT)
         |   * 1000000 // tot.n_total AS prune_ppm
         |FROM th, mx, tot
         |GROUP BY th.threshold, tot.n_total ORDER BY th.threshold""".stripMargin,

    "pipeline_text_clean_lsh" ->
      s"""$minhashCtes,
         |grp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |docrep AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |           FROM bands b JOIN grp g ON b.band = g.band AND b.sig = g.sig
         |           GROUP BY b.doc_id),
         |langok AS (SELECT doc_id FROM (
         |    SELECT doc_id, lang, score,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
         |    FROM (SELECT doc_id, lang,
         |            CAST(len(list_filter(w, t_ -> list_contains(lex, t_))) AS BIGINT) AS score
         |          FROM w, $langLexSql))
         |  WHERE rk = 1 AND score > 0 AND lang = 'en'),
         |qualok AS (SELECT doc_id FROM (
         |    SELECT doc_id,
         |      (CASE WHEN len(w) = 0 THEN CAST(0 AS DOUBLE)
         |            ELSE CAST(len(list_filter(w, t_ -> list_contains($enLex, t_))) AS DOUBLE) / CAST(len(w) AS BIGINT) END)
         |        * CAST(0.5 AS DOUBLE)
         |      + least(CAST(1 AS DOUBLE), CAST(CAST(len(w) AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE)) * CAST(0.5 AS DOUBLE) AS quality
         |    FROM w) WHERE quality >= 0.3),
         |exactkeep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         |SELECT d.doc_id, d.n_chars FROM documents d
         |LEFT JOIN docrep dr ON dr.doc_id = d.doc_id
         |WHERE d.doc_id IN (SELECT doc_id FROM langok)
         |  AND d.doc_id IN (SELECT doc_id FROM qualok)
         |  AND d.doc_id IN (SELECT doc_id FROM exactkeep)
         |  AND (dr.rep IS NULL OR dr.rep = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "join_range" ->
      s"""SELECT band, count(*) AS n, ${decSum2("o_totalprice")} AS revenue
         |FROM orders
         |JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 250000.0),
         |             ('high', 250000.0, 1000000000.0)) AS b(band, lo, hi)
         |  ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band ORDER BY band""".stripMargin,

    "join_skew_salted" ->
      s"""SELECT event_type, count(*) AS n, ${decSum2("value")} AS sum_value,
         | CAST(sum(n_user_events) AS BIGINT) AS sum_dim
         |FROM events e
         |JOIN (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id) d
         |  ON e.user_id = d.user_id
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "simsearch_lsh" -> {
      val planeComp = ch("(CAST(p AS VARCHAR) || ':' || CAST(i_ - 1 AS VARCHAR))")
      s"""$embCtes,
         |planes AS (SELECT unnest(generate_series(0, 3)) AS p),
         |dots AS (SELECT f.vec_id, p,
         |   CAST(list_sum(list_transform(generate_series(1, len(qv)),
         |     i_ -> qv[i_] * (($planeComp) % 2001 - 1000))) AS BIGINT) AS dot
         | FROM f, planes),
         |buckets AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN dot >= 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         | FROM dots GROUP BY vec_id),
         |b AS (SELECT f.vec_id, f.qv, f.nrm, buckets.bucket FROM f JOIN buckets USING (vec_id)),
         |scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM b WHERE vec_id < 5) p
         | JOIN b c ON c.bucket = p.bucket AND c.vec_id <> p.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT probe_id, vec_id, rk, cosine FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin
    },

    "simsearch_recall_ivf" ->
      s"""$embCtes,
         |cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cnrm FROM f WHERE vec_id < 8),
         |ccos AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |   CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |    (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         | FROM f v, cents c),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM ccos),
         |assigned AS (SELECT vec_id, qv, nrm, cid FROM ranked WHERE crk = 1),
         |probecells AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, cid
         |               FROM ranked WHERE vec_id < 5 AND crk <= 2),
         |iscored AS (SELECT p.probe_id, a.vec_id,
         |   CAST(${qdotPair("p.pqv", "a.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(a.nrm AS DOUBLE))) AS cosine
         | FROM probecells p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.probe_id),
         |itop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM iscored) WHERE rk <= 5),
         |bscored AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id),
         |btop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM bscored) WHERE rk <= 5)
         |SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         | CAST(count(l.vec_id) AS BIGINT) AS n_hit,
         | CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM btop t LEFT JOIN itop l
         |  ON l.probe_id = t.probe_id AND l.vec_id = t.vec_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin,

    // IVF-PQ recall: replicate the whole index — centroid assignment,
    // residuals, deterministic codebooks (first 16 residuals), per-
    // subspace argmin-L2 encode (ties -> smaller code), decode, recon
    // norms, asymmetric scoring dot(p,c)+dot(p,decode) — then recall@5
    // vs exact truth, mirroring Similarity.ivfPqTopK bit for bit.
    "simsearch_recall_ivfpq" ->
      s"""$embCtes,
         |cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cnrm FROM f WHERE vec_id < 8),
         |ccos AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |   CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |    (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         | FROM f v, cents c),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM ccos),
         |assigned AS (SELECT vec_id, qv, nrm, cid FROM ranked WHERE crk = 1),
         |r AS (SELECT a.vec_id, a.cid, a.qv, a.nrm, c.cqv,
         |   list_transform(generate_series(1, len(a.qv)), i_ -> a.qv[i_] - c.cqv[i_]) AS rv
         | FROM assigned a JOIN cents c ON c.cid = a.cid),
         |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
         |tr AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv
         |       FROM r WHERE vec_id < 64),
         |cbk AS (SELECT m, code, list_slice(rv, m*8+1, m*8+8) AS cw FROM tr, ms),
         |dists AS (SELECT r.vec_id, cbk.m, cbk.code,
         |   list_sum(list_transform(generate_series(1, 8),
         |     i_ -> (list_slice(r.rv, cbk.m*8+1, cbk.m*8+8)[i_] - cbk.cw[i_])
         |         * (list_slice(r.rv, cbk.m*8+1, cbk.m*8+8)[i_] - cbk.cw[i_]))) AS dist
         | FROM r, cbk),
         |enc AS (SELECT vec_id, m, code FROM (
         |   SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rk
         |   FROM dists) WHERE rk = 1),
         |decfull AS (SELECT e.vec_id, flatten(list(cbk.cw ORDER BY e.m)) AS dec
         | FROM enc e JOIN cbk ON cbk.m = e.m AND cbk.code = e.code
         | GROUP BY e.vec_id),
         |recon AS (SELECT r.vec_id,
         |   list_transform(generate_series(1, len(r.cqv)), i_ -> r.cqv[i_] + d.dec[i_]) AS rec
         | FROM r JOIN decfull d ON d.vec_id = r.vec_id),
         |rn AS (SELECT vec_id, ${qdotPair("rec", "rec")} AS recon_nrm FROM recon),
         |probecells AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, cid
         |               FROM ranked WHERE vec_id < 5 AND crk <= 2),
         |scored AS (SELECT p.probe_id, c.vec_id,
         |   CAST(${qdotPair("p.pqv", "ce.cqv")} + ${qdotPair("p.pqv", "d.dec")} AS DOUBLE) /
         |    (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(rn.recon_nrm AS DOUBLE))) AS acos_
         | FROM probecells p
         |   JOIN r c ON c.cid = p.cid AND c.vec_id <> p.probe_id
         |   JOIN cents ce ON ce.cid = c.cid
         |   JOIN decfull d ON d.vec_id = c.vec_id
         |   JOIN rn ON rn.vec_id = c.vec_id
         | WHERE rn.recon_nrm > 0),
         |short AS (SELECT probe_id, pqv, pnrm, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY acos_ DESC, vec_id) AS ark
         |   FROM (SELECT s.*, p2.pqv, p2.pnrm FROM scored s
         |         JOIN (SELECT DISTINCT probe_id, pqv, pnrm FROM probecells) p2
         |           ON p2.probe_id = s.probe_id)) WHERE ark <= 20),
         |ptop AS (SELECT probe_id, vec_id FROM (
         |   SELECT s.probe_id, s.vec_id,
         |     row_number() OVER (PARTITION BY s.probe_id ORDER BY
         |       CAST(${qdotPair("s.pqv", "c.qv")} AS DOUBLE) /
         |        (sqrt(CAST(s.pnrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) DESC,
         |       s.vec_id) AS rk
         |   FROM short s JOIN f c ON c.vec_id = s.vec_id) WHERE rk <= 5),
         |bscored AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id),
         |btop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM bscored) WHERE rk <= 5)
         |SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         | CAST(count(l.vec_id) AS BIGINT) AS n_hit,
         | CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM btop t LEFT JOIN ptop l
         |  ON l.probe_id = t.probe_id AND l.vec_id = t.vec_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin,

    // trained-PQ recall: the ivfpq pipeline with 2 deterministic Lloyd
    // iterations per subspace codebook (assign by argmin-L2, recompute
    // codewords as truncated integer means — DuckDB's // truncates toward
    // zero exactly like int64 division in the operator), then PURE PQ
    // ranking (no refine). Iteration CTEs generated by the loop below.
    "simsearch_recall_ivfpq_trained" -> {
      def lloyd(it: Int): String =
        s"""dists$it AS (SELECT sv.vec_id, sv.m, cb$it.code,
           |   list_sum(list_transform(generate_series(1, 8),
           |     i_ -> (sv.sub[i_] - cb$it.cw[i_]) * (sv.sub[i_] - cb$it.cw[i_]))) AS dist
           | FROM sv JOIN cbk$it cb$it ON cb$it.m = sv.m),
           |enc$it AS (SELECT vec_id, m, code FROM (
           |   SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rk
           |   FROM dists$it) WHERE rk = 1),
           |agg$it AS (SELECT e.m, e.code, i_ AS i,
           |   CAST(sum(sv.sub[i_]) AS BIGINT) AS s, count(*) AS n
           | FROM enc$it e JOIN sv ON sv.vec_id = e.vec_id AND sv.m = e.m,
           |   LATERAL (SELECT unnest(generate_series(1, 8)) AS i_)
           | GROUP BY e.m, e.code, i_),
           |cbpos$it AS (SELECT m, code, unnest(generate_series(1, 8)) AS i, cw FROM cbk$it),
           |cbk${it + 1} AS (SELECT p.m, p.code,
           |   list(CASE WHEN a.s IS NULL THEN p.cw[p.i] ELSE a.s // a.n END ORDER BY p.i) AS cw
           | FROM cbpos$it p LEFT JOIN agg$it a ON a.m = p.m AND a.code = p.code AND a.i = p.i
           | GROUP BY p.m, p.code),""".stripMargin
      s"""$embCtes,
         |cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cnrm FROM f WHERE vec_id < 8),
         |ccos AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |   CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |    (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         | FROM f v, cents c),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM ccos),
         |assigned AS (SELECT vec_id, qv, nrm, cid FROM ranked WHERE crk = 1),
         |r AS (SELECT a.vec_id, a.cid, a.qv, a.nrm, c.cqv,
         |   list_transform(generate_series(1, len(a.qv)), i_ -> a.qv[i_] - c.cqv[i_]) AS rv
         | FROM assigned a JOIN cents c ON c.cid = a.cid),
         |ms AS (SELECT unnest(generate_series(0, 7)) AS m),
         |sv AS (SELECT vec_id, m, list_slice(rv, m*8+1, m*8+8) AS sub FROM r, ms),
         |tr AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv
         |       FROM r WHERE vec_id < 64),
         |cbk0 AS (SELECT m, code, list_slice(rv, m*8+1, m*8+8) AS cw FROM tr, ms),
         |${lloyd(0)}
         |${lloyd(1)}
         |distsF AS (SELECT sv.vec_id, sv.m, cb2.code,
         |   list_sum(list_transform(generate_series(1, 8),
         |     i_ -> (sv.sub[i_] - cb2.cw[i_]) * (sv.sub[i_] - cb2.cw[i_]))) AS dist
         | FROM sv JOIN cbk2 cb2 ON cb2.m = sv.m),
         |encF AS (SELECT vec_id, m, code FROM (
         |   SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rk
         |   FROM distsF) WHERE rk = 1),
         |decfull AS (SELECT e.vec_id, flatten(list(c2.cw ORDER BY e.m)) AS dec
         | FROM encF e JOIN cbk2 c2 ON c2.m = e.m AND c2.code = e.code
         | GROUP BY e.vec_id),
         |recon AS (SELECT r.vec_id,
         |   list_transform(generate_series(1, len(r.cqv)), i_ -> r.cqv[i_] + d.dec[i_]) AS rec
         | FROM r JOIN decfull d ON d.vec_id = r.vec_id),
         |rn AS (SELECT vec_id, ${qdotPair("rec", "rec")} AS recon_nrm FROM recon),
         |probecells AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, cid
         |               FROM ranked WHERE vec_id < 5 AND crk <= 2),
         |scored AS (SELECT p.probe_id, c.vec_id,
         |   CAST(${qdotPair("p.pqv", "ce.cqv")} + ${qdotPair("p.pqv", "d.dec")} AS DOUBLE) /
         |    (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(rn.recon_nrm AS DOUBLE))) AS acos_
         | FROM probecells p
         |   JOIN r c ON c.cid = p.cid AND c.vec_id <> p.probe_id
         |   JOIN cents ce ON ce.cid = c.cid
         |   JOIN decfull d ON d.vec_id = c.vec_id
         |   JOIN rn ON rn.vec_id = c.vec_id
         | WHERE rn.recon_nrm > 0),
         |ptop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY acos_ DESC, vec_id) AS rk
         |   FROM scored) WHERE rk <= 5),
         |bscored AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id),
         |btop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM bscored) WHERE rk <= 5)
         |SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         | CAST(count(l.vec_id) AS BIGINT) AS n_hit,
         | CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM btop t LEFT JOIN ptop l
         |  ON l.probe_id = t.probe_id AND l.vec_id = t.vec_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin
    },

    "simsearch_lsh_multiprobe" -> {
      val planeComp = ch("(CAST(p AS VARCHAR) || ':' || CAST(i_ - 1 AS VARCHAR))")
      s"""$embCtes,
         |planes AS (SELECT unnest(generate_series(0, 3)) AS p),
         |dots AS (SELECT f.vec_id, p,
         |   CAST(list_sum(list_transform(generate_series(1, len(qv)),
         |     i_ -> qv[i_] * (($planeComp) % 2001 - 1000))) AS BIGINT) AS dot
         | FROM f, planes),
         |buckets AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN dot >= 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         | FROM dots GROUP BY vec_id),
         |b AS (SELECT f.vec_id, f.qv, f.nrm, buckets.bucket FROM f JOIN buckets USING (vec_id)),
         |pb AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm,
         |   unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS bucket
         | FROM b WHERE vec_id < 5),
         |scored AS (SELECT pb.probe_id, c.vec_id,
         |   CAST(${qdotPair("pb.pqv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(pb.pnrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM pb JOIN b c ON c.bucket = pb.bucket AND c.vec_id <> pb.probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT probe_id, vec_id, rk, cosine FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin
    },

    "simsearch_recall_multiprobe" -> {
      val planeComp = ch("(CAST(p AS VARCHAR) || ':' || CAST(i_ - 1 AS VARCHAR))")
      s"""$embCtes,
         |planes AS (SELECT unnest(generate_series(0, 3)) AS p),
         |dots AS (SELECT f.vec_id, p,
         |   CAST(list_sum(list_transform(generate_series(1, len(qv)),
         |     i_ -> qv[i_] * (($planeComp) % 2001 - 1000))) AS BIGINT) AS dot
         | FROM f, planes),
         |buckets AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN dot >= 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         | FROM dots GROUP BY vec_id),
         |b AS (SELECT f.vec_id, f.qv, f.nrm, buckets.bucket FROM f JOIN buckets USING (vec_id)),
         |pb AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm,
         |   unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS bucket
         | FROM b WHERE vec_id < 5),
         |lscored AS (SELECT pb.probe_id, c.vec_id,
         |   CAST(${qdotPair("pb.pqv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(pb.pnrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM pb JOIN b c ON c.bucket = pb.bucket AND c.vec_id <> pb.probe_id),
         |ltop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM lscored) WHERE rk <= 5),
         |bscored AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id),
         |btop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM bscored) WHERE rk <= 5)
         |SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         | CAST(count(l.vec_id) AS BIGINT) AS n_hit,
         | CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM btop t LEFT JOIN ltop l
         |  ON l.probe_id = t.probe_id AND l.vec_id = t.vec_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin
    },

    "simsearch_recall" -> {
      val planeComp = ch("(CAST(p AS VARCHAR) || ':' || CAST(i_ - 1 AS VARCHAR))")
      s"""$embCtes,
         |planes AS (SELECT unnest(generate_series(0, 3)) AS p),
         |dots AS (SELECT f.vec_id, p,
         |   CAST(list_sum(list_transform(generate_series(1, len(qv)),
         |     i_ -> qv[i_] * (($planeComp) % 2001 - 1000))) AS BIGINT) AS dot
         | FROM f, planes),
         |buckets AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN dot >= 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         | FROM dots GROUP BY vec_id),
         |b AS (SELECT f.vec_id, f.qv, f.nrm, buckets.bucket FROM f JOIN buckets USING (vec_id)),
         |lscored AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM b WHERE vec_id < 5) p
         | JOIN b c ON c.bucket = p.bucket AND c.vec_id <> p.vec_id),
         |ltop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM lscored) WHERE rk <= 5),
         |bscored AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id),
         |btop AS (SELECT probe_id, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |   FROM bscored) WHERE rk <= 5)
         |SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         | CAST(count(l.vec_id) AS BIGINT) AS n_hit,
         | CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM btop t LEFT JOIN ltop l
         |  ON l.probe_id = t.probe_id AND l.vec_id = t.vec_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin
    },

    // Radius (ε-NN) search baseline: every pair at cosine >= 0.2.
    "simsearch_range" ->
      s"""$embCtes,
         |pairs AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id)
         |SELECT probe_id, vec_id, cosine FROM pairs
         |WHERE cosine >= 0.2 ORDER BY probe_id, vec_id""".stripMargin,

    // Recall of the bucket-bounded radius search vs the exact baseline.
    "simsearch_recall_range" -> {
      val planeComp = ch("(CAST(p AS VARCHAR) || ':' || CAST(i_ - 1 AS VARCHAR))")
      s"""$embCtes,
         |planes AS (SELECT unnest(generate_series(0, 3)) AS p),
         |dots AS (SELECT f.vec_id, p,
         |   CAST(list_sum(list_transform(generate_series(1, len(qv)),
         |     i_ -> qv[i_] * (($planeComp) % 2001 - 1000))) AS BIGINT) AS dot
         | FROM f, planes),
         |buckets AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN dot >= 0 THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         | FROM dots GROUP BY vec_id),
         |b AS (SELECT f.vec_id, f.qv, f.nrm, buckets.bucket FROM f JOIN buckets USING (vec_id)),
         |lhit AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id
         | FROM (SELECT * FROM b WHERE vec_id < 5) p
         | JOIN b c ON c.bucket = p.bucket AND c.vec_id <> p.vec_id
         | WHERE CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) >= 0.2),
         |btrue AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id
         | WHERE CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) >= 0.2)
         |SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         | CAST(count(l.vec_id) AS BIGINT) AS n_hit,
         | CAST(count(l.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM btrue t LEFT JOIN lhit l
         |  ON l.probe_id = t.probe_id AND l.vec_id = t.vec_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin
    },

    // SQ8: symmetric int8 codes (sign-magnitude // by the corpus max),
    // coarse int dot ranking, exact-cosine rerank of the 20 shortlist.
    "simsearch_sq8" ->
      s"""$sq8Ctes
         |SELECT probe_id, vec_id, rk, cosine FROM rr WHERE rk <= 10
         |ORDER BY probe_id, rk""".stripMargin,

    "simsearch_recall_sq8" ->
      s"""$sq8Ctes,
         |tp AS (SELECT p.vec_id AS probe_id, c.vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id),
         |tr AS (SELECT probe_id, vec_id FROM (SELECT *,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
         |       FROM tp) WHERE rk <= 5),
         |ah AS (SELECT probe_id, vec_id FROM rr WHERE rk <= 5)
         |SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_true,
         | CAST(count(a.vec_id) AS BIGINT) AS n_hit,
         | CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall
         |FROM tr t LEFT JOIN ah a
         |  ON a.probe_id = t.probe_id AND a.vec_id = t.vec_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin,

    "simsearch_bruteforce" ->
      s"""$embCtes,
         |pairs AS (SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
         |   CAST(${qdotPair("p.qv", "c.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))) AS cosine
         | FROM (SELECT * FROM f WHERE vec_id < 5) p JOIN f c ON c.vec_id <> p.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM pairs)
         |SELECT probe_id, vec_id, rk, cosine FROM r WHERE rk <= 10 ORDER BY probe_id, rk""".stripMargin,

    // ColBERT-style MaxSim: 4 contiguous sub-vectors per embedding; score
    // = Σ over probe subs of max integer dot vs any candidate sub. Raw
    // quantised dots — exact BIGINTs, no normalisation.
    "simsearch_maxsim" ->
      s"""WITH q AS (SELECT vec_id, ${quant("embedding")} AS qv FROM embeddings),
         |s AS (SELECT vec_id, list_transform(generate_series(0, 3),
         |        s_ -> list_slice(qv, s_ * (len(qv) // 4) + 1, (s_ + 1) * (len(qv) // 4))) AS subs
         |      FROM q),
         |pr AS (SELECT vec_id AS probe_id, subs AS ps FROM s WHERE vec_id < 5),
         |sc AS (SELECT pr.probe_id, c.vec_id,
         |         CAST(list_sum(list_transform(pr.ps, p_ ->
         |           list_max(list_transform(c.subs, c_ ->
         |             list_sum(list_transform(generate_series(1, len(p_)), i_ -> p_[i_] * c_[i_])))))) AS BIGINT) AS score
         |       FROM pr JOIN s c ON c.vec_id <> pr.probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, vec_id) AS rk FROM sc)
         |SELECT probe_id, vec_id, rk, score FROM r WHERE rk <= 10 ORDER BY probe_id, rk""".stripMargin,

    "simsearch_ivf" ->
      s"""$embCtes,
         |cents AS (SELECT vec_id AS cid, qv AS cqv, nrm AS cnrm FROM f WHERE vec_id < 8),
         |ccos AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |   CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |    (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         | FROM f v, cents c),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM ccos),
         |assigned AS (SELECT vec_id, qv, nrm, cid FROM ranked WHERE crk = 1),
         |probecells AS (SELECT vec_id AS probe_id, qv AS pqv, nrm AS pnrm, cid
         |               FROM ranked WHERE vec_id < 5 AND crk <= 2),
         |scored AS (SELECT p.probe_id, a.vec_id,
         |   CAST(${qdotPair("p.pqv", "a.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(a.nrm AS DOUBLE))) AS cosine
         | FROM probecells p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT probe_id, vec_id, rk, cosine FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    "simsearch_ivf_trained" ->
      s"""$ivfTrainedCtes,
         |scored AS (SELECT p.probe_id, a.vec_id,
         |   CAST(${qdotPair("p.pqv", "a.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(a.nrm AS DOUBLE))) AS cosine
         | FROM probecells p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT probe_id, vec_id, rk, cosine FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    // Sample-bounded training: identical serving tail, centroids trained
    // on the vec_id % 2 = 0 sample only (ivfSampledCtes).
    "simsearch_ivf_sampled" ->
      s"""$ivfSampledCtes,
         |scored AS (SELECT p.probe_id, a.vec_id,
         |   CAST(${qdotPair("p.pqv", "a.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(a.nrm AS DOUBLE))) AS cosine
         | FROM probecells p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.probe_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT probe_id, vec_id, rk, cosine FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    // Hard-negative mining: same trained cells + nprobe probing, candidate
    // set restricted to DIFFERENT-label vectors (self drops via its equal
    // label) before the per-anchor ranking.
    "simsearch_hard_negatives" ->
      s"""$ivfTrainedCtes,
         |scored AS (SELECT p.probe_id, pe.label AS plabel, a.vec_id, ae.label AS label,
         |   CAST(${qdotPair("p.pqv", "a.qv")} AS DOUBLE) /
         |    (sqrt(CAST(p.pnrm AS DOUBLE)) * sqrt(CAST(a.nrm AS DOUBLE))) AS cosine
         | FROM probecells p JOIN assigned a ON a.cid = p.cid
         |   JOIN embeddings pe ON pe.vec_id = p.probe_id
         |   JOIN embeddings ae ON ae.vec_id = a.vec_id
         | WHERE pe.label <> ae.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk FROM scored)
         |SELECT probe_id, plabel, vec_id, label, rk, cosine FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    // Incremental IVF append: Lloyd-train on the first 400 vectors only
    // (ft), then assign ALL vectors — including the appended tail — to the
    // final centroids; census per cell with the appended count split out.
    "simsearch_ivf_append" ->
      s"""$embCtes,
         |ft AS (SELECT * FROM f WHERE vec_id < 400),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cqv, nrm AS cnrm
         |       FROM ft WHERE vec_id < 8),
         |cc0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM ft v, c0 c),
         |a0 AS (SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc0)
         |  WHERE crk = 1),
         |sums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
         |         FROM a0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
         |         GROUP BY cid, i_),
         |cm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM sums GROUP BY cid),
         |c1 AS (SELECT c0.cid, coalesce(cm.cqv, c0.cqv) AS cqv FROM c0 LEFT JOIN cm USING (cid)),
         |c1n AS (SELECT cid, cqv,
         |          CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm FROM c1),
         |cc1 AS (SELECT v.vec_id, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM f v, c1n c),
         |assigned AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc1)
         |  WHERE crk = 1)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
         | CAST(sum(CASE WHEN vec_id >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_appended
         |FROM assigned GROUP BY cid ORDER BY cid""".stripMargin,

    // Cell-balance census after the skewed append: same first-400
    // training as simsearch_ivf_append; the assigned set is the full
    // corpus PLUS the 400-row near-duplicate flood (100 copies each of
    // vectors 0-3, ids >= 10000); census = per-cell count, exact ppm
    // load vs the mean cell, and the >2x-mean rebuild flag.
    "simsearch_ivf_census" ->
      s"""$embCtes,
         |ft AS (SELECT * FROM f WHERE vec_id < 400),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cqv, nrm AS cnrm
         |       FROM ft WHERE vec_id < 8),
         |cc0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM ft v, c0 c),
         |a0 AS (SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc0)
         |  WHERE crk = 1),
         |sums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
         |         FROM a0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
         |         GROUP BY cid, i_),
         |cm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM sums GROUP BY cid),
         |c1 AS (SELECT c0.cid, coalesce(cm.cqv, c0.cqv) AS cqv FROM c0 LEFT JOIN cm USING (cid)),
         |c1n AS (SELECT cid, cqv,
         |          CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm FROM c1),
         |allv AS (SELECT vec_id, qv, nrm FROM f
         |         UNION ALL
         |         SELECT 10000 + fl.vec_id * 100 + g.i AS vec_id, fl.qv, fl.nrm
         |         FROM f fl, generate_series(0, 99) AS g(i) WHERE fl.vec_id < 4),
         |cc1 AS (SELECT v.vec_id, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM allv v, c1n c),
         |assigned AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc1)
         |  WHERE crk = 1),
         |percell AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors FROM assigned GROUP BY cid),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(n_vectors) AS BIGINT) AS n_total FROM percell)
         |SELECT cid, n_vectors,
         | CAST(CAST(n_vectors AS HUGEINT) * n_cells * 1000000 // n_total AS BIGINT) AS load_ppm,
         | CAST(CASE WHEN CAST(n_vectors AS HUGEINT) * n_cells > 2 * n_total THEN 1 ELSE 0 END AS BIGINT) AS needs_rebuild
         |FROM percell, tot ORDER BY cid""".stripMargin,

    // Census -> REBUILD loop: pre census = the simsearch_ivf_census
    // machinery (first-400 training c1n) over the drifted corpus allv =
    // full corpus + a TIGHT positive-orthant cluster (floor((|x|+1)*1e6)
    // of every fifth vector — distinct near-parallel vectors, the same
    // double dag as the engine's quantize(abs(x)+1.0)). The rebuild
    // retrains SAMPLE-BOUNDED (ts = allv where vec_id % 2 = 0; seeds =
    // first 8 sample vectors in vec_id order, renumbered — the
    // lloydCentroidsQ rule), one Lloyd iteration of truncated integer
    // means, full re-assignment, post census. The post phase is
    // CONDITIONAL on the pre flag, exactly like ivfRebuildIfNeeded: no
    // flag -> no rebuild -> post = pre. Load products run in HUGEINT,
    // mirroring the engine's decimal(38,0).
    "simsearch_ivf_rebuild" ->
      s"""$embCtes,
         |ft AS (SELECT * FROM f WHERE vec_id < 400),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cqv, nrm AS cnrm
         |       FROM ft WHERE vec_id < 8),
         |cc0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM ft v, c0 c),
         |a0 AS (SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc0)
         |  WHERE crk = 1),
         |sums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
         |         FROM a0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
         |         GROUP BY cid, i_),
         |cm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM sums GROUP BY cid),
         |c1 AS (SELECT c0.cid, coalesce(cm.cqv, c0.cqv) AS cqv FROM c0 LEFT JOIN cm USING (cid)),
         |c1n AS (SELECT cid, cqv,
         |          CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm FROM c1),
         |fl AS (SELECT 1000000 + vec_id AS vec_id,
         |         list_transform(embedding, x_ -> CAST(floor((abs(CAST(x_ AS DOUBLE)) + 1.0)*1000000) AS BIGINT)) AS qv
         |       FROM embeddings WHERE vec_id % 5 = 0),
         |fln AS (SELECT vec_id, qv,
         |          CAST(list_sum(list_transform(qv, x_ -> x_*x_)) AS BIGINT) AS nrm FROM fl),
         |allv AS (SELECT vec_id, qv, nrm FROM f
         |         UNION ALL
         |         SELECT vec_id, qv, nrm FROM fln WHERE nrm > 0),
         |cc1 AS (SELECT v.vec_id, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM allv v, c1n c),
         |assigned AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM cc1)
         |  WHERE crk = 1),
         |percell AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors FROM assigned GROUP BY cid),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(n_vectors) AS BIGINT) AS n_total FROM percell),
         |flag AS (SELECT max(CASE WHEN CAST(n_vectors AS HUGEINT) * n_cells > 2 * n_total THEN 1 ELSE 0 END) AS fired
         |         FROM percell, tot),
         |ts AS (SELECT * FROM allv WHERE vec_id % 2 = 0),
         |r0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, cqv, cnrm FROM (
         |       SELECT vec_id, qv AS cqv, nrm AS cnrm FROM ts ORDER BY vec_id LIMIT 8)),
         |rcc0 AS (SELECT v.vec_id, v.qv, v.nrm, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM ts v, r0 c),
         |ra0 AS (SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM rcc0)
         |  WHERE crk = 1),
         |rsums AS (SELECT cid, i_ - 1 AS pos, CAST(sum(qv[i_]) AS BIGINT) AS s, count(*) AS n
         |          FROM ra0, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_)
         |          GROUP BY cid, i_),
         |rcm AS (SELECT cid, list(s // n ORDER BY pos) AS cqv FROM rsums GROUP BY cid),
         |rc1 AS (SELECT r0.cid, coalesce(rcm.cqv, r0.cqv) AS cqv FROM r0 LEFT JOIN rcm USING (cid)),
         |rc1n AS (SELECT cid, cqv,
         |           CAST(list_sum(list_transform(cqv, x_ -> x_*x_)) AS BIGINT) AS cnrm FROM rc1),
         |rcc1 AS (SELECT v.vec_id, c.cid,
         |    CAST(${qdotPair("v.qv", "c.cqv")} AS DOUBLE) /
         |     (sqrt(CAST(v.nrm AS DOUBLE)) * sqrt(CAST(c.cnrm AS DOUBLE))) AS ccos
         |  FROM allv v, rc1n c),
         |rassigned AS (SELECT vec_id, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crk FROM rcc1)
         |  WHERE crk = 1),
         |rpercell AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors FROM rassigned GROUP BY cid),
         |rtot AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(n_vectors) AS BIGINT) AS n_total FROM rpercell),
         |phased AS (
         | SELECT 'pre' AS phase, cid, n_vectors,
         |  CAST(CAST(n_vectors AS HUGEINT) * n_cells * 1000000 // n_total AS BIGINT) AS load_ppm,
         |  CAST(CASE WHEN CAST(n_vectors AS HUGEINT) * n_cells > 2 * n_total THEN 1 ELSE 0 END AS BIGINT) AS needs_rebuild
         | FROM percell, tot
         | UNION ALL
         | SELECT 'post' AS phase, cid, n_vectors,
         |  CAST(CAST(n_vectors AS HUGEINT) * n_cells * 1000000 // n_total AS BIGINT) AS load_ppm,
         |  CAST(CASE WHEN CAST(n_vectors AS HUGEINT) * n_cells > 2 * n_total THEN 1 ELSE 0 END AS BIGINT) AS needs_rebuild
         | FROM rpercell, rtot WHERE (SELECT fired FROM flag) = 1
         | UNION ALL
         | SELECT 'post' AS phase, cid, n_vectors,
         |  CAST(CAST(n_vectors AS HUGEINT) * n_cells * 1000000 // n_total AS BIGINT) AS load_ppm,
         |  CAST(CASE WHEN CAST(n_vectors AS HUGEINT) * n_cells > 2 * n_total THEN 1 ELSE 0 END AS BIGINT) AS needs_rebuild
         | FROM percell, tot WHERE (SELECT fired FROM flag) = 0)
         |SELECT phase, cid, n_vectors, load_ppm, needs_rebuild
         |FROM phased ORDER BY phase, cid""".stripMargin,

    "window_sessionize" ->
      """WITH b AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |l AS (SELECT *, lag(epoch_us(tsu)) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev_us FROM b),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(tsu) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s FROM l),
        |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, session_id, count(*) AS n_events,
        | strftime(min(tsu), '%Y-%m-%d %H:%M:%S') AS start_s,
        | strftime(max(tsu), '%Y-%m-%d %H:%M:%S') AS end_s
        |FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "window_range_frame" ->
      """SELECT event_id, user_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |   RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30m
        |FROM events ORDER BY event_id""".stripMargin,

    "agg_corr" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS corr
        |FROM s ORDER BY l_returnflag""".stripMargin,

    // Skewness/kurtosis from exact HUGEINT power sums (= Spark's
    // DECIMAL(38,0)); identical IEEE expression tree after the cast.
    "agg_moments" ->
      """WITH b AS (SELECT l_returnflag,
        |             CAST(round(l_extendedprice * 100, 0) AS HUGEINT) AS c FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) AS n,
        |        CAST(sum(c) AS DOUBLE) AS sx,
        |        CAST(sum(c * c) AS DOUBLE) AS sxx,
        |        CAST(sum(c * c * c) AS DOUBLE) AS sxxx,
        |        CAST(sum(c * c * c * c) AS DOUBLE) AS sxxxx
        |      FROM b GROUP BY 1),
        |m AS (SELECT *, sx / n AS mean, sxx / n - (sx / n) * (sx / n) AS m2 FROM s)
        |SELECT l_returnflag, n, round(mean, 9) AS mean_cents,
        | round((sxxx / n - 3 * mean * (sxx / n) + 2 * mean * mean * mean)
        |   / (sqrt(m2) * m2), 9) AS skewness,
        | round((sxxxx / n - 4 * mean * (sxxx / n) + 6 * mean * mean * (sxx / n)
        |   - 3 * mean * mean * mean * mean) / (m2 * m2), 9) AS kurtosis
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "typed_agg" ->
      """SELECT event_type,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "stream_sessionize" ->
      """WITH b AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |l AS (SELECT *, lag(epoch_us(tsu)) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev_us FROM b),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(tsu) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s FROM l),
        |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s),
        |sess AS (SELECT user_id, session_id, count(*) AS n_events,
        |    strftime(min(tsu), '%Y-%m-%d %H:%M:%S') AS start_s,
        |    strftime(max(tsu), '%Y-%m-%d %H:%M:%S') AS end_s
        |  FROM g GROUP BY user_id, session_id)
        |SELECT user_id, session_id, n_events, start_s, end_s FROM sess x
        |WHERE session_id < (SELECT max(session_id) FROM sess y WHERE y.user_id = x.user_id)
        |ORDER BY user_id, session_id""".stripMargin,

    // streaming upsert: chronological batches of latest-per-key merges
    // compose to the globally-latest event per user
    "stream_upsert_sink" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY tsu DESC, event_id DESC) AS rk FROM e)
        |SELECT user_id, event_id,
        | strftime(tsu, '%Y-%m-%d %H:%M:%S') AS ts_str,
        | event_type, value
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    // batch session_window: identical session semantics to the streaming
    // form, same last-event+gap end definition
    "window_session_builtin" ->
      """WITH b AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |l AS (SELECT *, lag(epoch_us(tsu)) OVER (PARTITION BY user_id ORDER BY tsu) AS prev_us FROM b),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(tsu) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s FROM l),
        |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, count(*) AS n_events,
        | strftime(min(tsu), '%Y-%m-%d %H:%M:%S') AS start_s,
        | strftime(max(tsu) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS end_s
        |FROM g GROUP BY user_id, session_id ORDER BY user_id, start_s""".stripMargin,

    // CCNet-style LM quality filter: bigram LM (Laplace-smoothed) trained
    // on even doc_ids, mean inverse probability in exact integer ppm per
    // odd doc, head/middle/tail ntile per lang. `//` on positive BIGINTs
    // matches Spark's `div`.
    "text_perplexity" ->
      s"""WITH $pplCtes
         |SELECT doc_id, lang, n_toks, ppx_ppm,
         |  CASE ntile(3) OVER (PARTITION BY lang ORDER BY ppx_ppm, doc_id)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM r ORDER BY doc_id""".stripMargin,

    // Interpolated Kneser-Ney bigram scoring on the same count
    // infrastructure: D = 3/4 as exact x4 rationals, continuation
    // distribution with a +1 floor so every position is finite, unseen
    // contexts back off to the floored continuation alone. Mean INVERSE
    // probability in ppm per held-out doc (`//` ≡ div on positives).
    "text_perplexity_kn" ->
      s"""WITH $pplCtes,
         |cpf AS (SELECT prev, count(*) AS c_prev, count(DISTINCT cur) AS n_follow
         |        FROM tr GROUP BY 1),
         |ct AS (SELECT cur, count(*) AS n_cont FROM cb GROUP BY 1),
         |nbt AS (SELECT count(*) AS nb FROM cb),
         |sk AS (SELECT b.doc_id, b.lang,
         |    CASE WHEN cpf.c_prev IS NULL
         |      THEN ((nbt.nb + 1) * 1000000) // (coalesce(ct.n_cont, 0) + 1)
         |      ELSE CAST((CAST(4 AS HUGEINT) * cpf.c_prev * nbt.nb * 1000000) //
         |        (CAST(greatest(4 * coalesce(cb.c_bi, 0) - 3, 0) AS HUGEINT) * nbt.nb
         |         + CAST(3 AS HUGEINT) * cpf.n_follow * (coalesce(ct.n_cont, 0) + 1)) AS BIGINT)
         |    END AS inv_ppm
         |  FROM b LEFT JOIN cb ON b.prev = cb.prev AND b.cur = cb.cur
         |    LEFT JOIN cpf ON b.prev = cpf.prev
         |    LEFT JOIN ct ON b.cur = ct.cur
         |    CROSS JOIN nbt
         |  WHERE b.doc_id % 2 = 1),
         |dk AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_big,
         |       CAST(sum(inv_ppm) AS BIGINT) AS sppm FROM sk GROUP BY 1, 2)
         |SELECT doc_id, lang, n_big, CAST(sppm // n_big AS BIGINT) AS kn_ppm
         |FROM dk ORDER BY doc_id""".stripMargin,

    // DoReMi-style domain reweighting on the same bigram-LM scores:
    // per-source mean ppm, excess over the best source, weight ∝ excess
    // normalised to ppm (uniform fallback when all sources tie).
    "sample_doremi" ->
      s"""WITH $pplCtes,
         |per AS (SELECT d2.source, CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(r.ppx_ppm) AS BIGINT) AS s
         |        FROM r JOIN documents d2 ON r.doc_id = d2.doc_id GROUP BY 1),
         |pa AS (SELECT source, n_docs, s // n_docs AS avg_ppm FROM per),
         |mn AS (SELECT min(avg_ppm) AS mn FROM pa),
         |ex AS (SELECT pa.source, pa.n_docs, pa.avg_ppm, pa.avg_ppm - mn.mn AS excess
         |       FROM pa CROSS JOIN mn),
         |tt AS (SELECT CAST(sum(excess) AS BIGINT) AS te, count(*) AS k FROM ex)
         |SELECT source, n_docs, CAST(avg_ppm AS BIGINT) AS avg_ppm,
         |  CAST(excess AS BIGINT) AS excess,
         |  CAST(CASE WHEN tt.te = 0 THEN 1000000 // tt.k
         |       ELSE (1000000 * ex.excess) // tt.te END AS BIGINT) AS weight_ppm
         |FROM ex CROSS JOIN tt ORDER BY source""".stripMargin,

    // Greedy max-coverage: 5 unrolled rounds; per round the marginal
    // gain vs the covered set, argmax with min-doc_id tie-break, covered
    // set unioned. Gains disjoint by construction -> covered = sum.
    "sample_max_coverage" -> {
      def rnd(i: Int): String = {
        val excl = if (i == 1) ""
          else "WHERE s.doc_id NOT IN (" +
            (1 until i).map(j => s"SELECT doc_id FROM p$j").mkString(" UNION ALL ") + ")"
        s"""g$i AS (SELECT s.doc_id, count(*) AS gain FROM sh s
           |  $excl
           |  ${if (i == 1) "WHERE" else "AND"} NOT EXISTS (SELECT 1 FROM c${i - 1} c WHERE c.h = s.h)
           |  GROUP BY 1),
           |p$i AS MATERIALIZED (SELECT doc_id, gain FROM g$i ORDER BY gain DESC, doc_id LIMIT 1),
           |c$i AS MATERIALIZED (SELECT h FROM c${i - 1}
           |  UNION SELECT s.h FROM sh s JOIN p$i ON s.doc_id = p$i.doc_id)""".stripMargin
      }
      s"""$minhashCtes,
         |c0 AS (SELECT CAST(NULL AS BIGINT) AS h WHERE 1 = 0),
         |${(1 to 5).map(rnd).mkString(",\n")}
         |SELECT * FROM (
         |${(1 to 5).map(i =>
            s"SELECT CAST($i AS BIGINT) AS rk, doc_id, CAST(gain AS BIGINT) AS gain, " +
              s"(SELECT CAST(count(*) AS BIGINT) FROM c$i) AS covered FROM p$i")
           .mkString("\nUNION ALL\n")}
         |) ORDER BY rk""".stripMargin
    },

    // ESS of the doremi weights: the doremi chain, then
    // (sum n*w)^2 over sum n*w^2 in HUGEINT with truncating division.
    "sample_mixture_ess" ->
      s"""WITH $pplCtes,
         |per AS (SELECT d2.source, CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(r.ppx_ppm) AS BIGINT) AS s
         |        FROM r JOIN documents d2 ON r.doc_id = d2.doc_id GROUP BY 1),
         |pa AS (SELECT source, n_docs, s // n_docs AS avg_ppm FROM per),
         |mn AS (SELECT min(avg_ppm) AS mn FROM pa),
         |ex AS (SELECT pa.source, pa.n_docs, pa.avg_ppm - mn.mn AS excess
         |       FROM pa CROSS JOIN mn),
         |tt AS (SELECT CAST(sum(excess) AS BIGINT) AS te, count(*) AS k FROM ex),
         |w AS (SELECT source, n_docs,
         |        CASE WHEN tt.te = 0 THEN 1000000 // tt.k
         |             ELSE (1000000 * ex.excess) // tt.te END AS weight_ppm
         |      FROM ex CROSS JOIN tt),
         |a AS (SELECT sum(n_docs) AS n_total, count(*) AS k_sources,
         |        sum(CAST(n_docs AS HUGEINT) * weight_ppm) AS sw,
         |        sum(CAST(n_docs AS HUGEINT) * weight_ppm * weight_ppm) AS sw2
         |      FROM w)
         |SELECT CAST(n_total AS BIGINT) AS n_total,
         |  CAST(k_sources AS BIGINT) AS k_sources,
         |  CAST((1000 * sw * sw) // sw2 AS BIGINT) AS ess_milli,
         |  CAST((1000000 * sw * sw) // (CAST(n_total AS HUGEINT) * sw2) AS BIGINT) AS ess_ratio_ppm
         |FROM a""".stripMargin,

    // Flesch reading-ease in exact milli-units: sentences = [.!?]+ runs,
    // syllables = vowel runs, floor division on non-negative numerators.
    "text_readability" ->
      s"""WITH t AS (SELECT doc_id, text, ${tok("text")} AS w FROM documents),
         |c AS (SELECT doc_id,
         |        CAST(len(w) AS BIGINT) AS n_words,
         |        CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sents,
         |        CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_sylls
         |      FROM t)
         |SELECT doc_id, n_words, n_sents, n_sylls,
         |  CAST(206835 - (1015 * n_words) // greatest(n_sents, 1)
         |    - (84600 * n_sylls) // greatest(n_words, 1) AS BIGINT) AS fre_milli
         |FROM c ORDER BY doc_id""".stripMargin,

    // TextRank: the exact pagerank recurrence over the adjacent-token
    // co-occurrence graph (lexicographically oriented pairs, count >= 3).
    "text_textrank" -> {
      def it(i: Int): String =
        s"""c$i AS (SELECT bi.dst AS node, sum(r${i - 1}.r // deg.d) AS s FROM bi
           |       JOIN r${i - 1} ON bi.src = r${i - 1}.node JOIN deg ON bi.src = deg.node GROUP BY 1),
           |r$i AS (SELECT deg.node, 150000 + (850 * COALESCE(c$i.s, 0)) // 1000 AS r
           |       FROM deg LEFT JOIN c$i ON deg.node = c$i.node)""".stripMargin
      s"""WITH t AS (SELECT ${tok("text")} AS w FROM documents),
         |tw AS (SELECT w FROM t WHERE len(w) >= 2),
         |p AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM tw),
         |pr AS (SELECT least(w[i], w[i+1]) AS src, greatest(w[i], w[i+1]) AS dst FROM p),
         |e0 AS (SELECT src, dst FROM pr WHERE src <> dst GROUP BY 1, 2 HAVING count(*) >= 3),
         |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src AS node, count(*) AS d FROM bi GROUP BY 1),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
         |${it(1)},
         |${it(2)},
         |${it(3)}
         |SELECT node AS word, CAST(r AS BIGINT) AS rank FROM r3
         |ORDER BY rank DESC, word LIMIT 20""".stripMargin
    },

    "text_typicality" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |bg AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
         |         THEN list_transform(generate_series(1, len(w) - 1), i_ -> w[i_] || ' ' || w[i_+1])
         |         ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM w),
         |c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
         |SELECT doc_id, count(*) AS n_bigrams,
         | CAST(sum(n) AS BIGINT) AS sum_c,
         | CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*) AS typicality
         |FROM bg JOIN c USING (bigram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // batch mirror of the native session_window aggregation: gap
    // sessionization per user; session end is last-event-ts + gap (the
    // built-in operator's definition). Every real session emits (the
    // sentinel pushes the watermark past all of them), so no
    // last-session trimming here unlike stream_sessionize.
    "stream_session_window" ->
      """WITH b AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu FROM events),
        |l AS (SELECT *, lag(epoch_us(tsu)) OVER (PARTITION BY user_id ORDER BY tsu) AS prev_us FROM b),
        |s AS (SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(tsu) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s FROM l),
        |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, count(*) AS n_events,
        | strftime(min(tsu), '%Y-%m-%d %H:%M:%S') AS start_s,
        | strftime(max(tsu) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS end_s
        |FROM g GROUP BY user_id, session_id ORDER BY user_id, start_s""".stripMargin,

    "setop_union" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "agg_rollup" ->
      s"""SELECT coalesce(o_orderpriority, '(all)') AS priority,
         | coalesce(o_orderstatus, '(all)') AS status,
         | CAST(grouping(o_orderpriority) AS INTEGER) AS g_pri,
         | CAST(grouping(o_orderstatus) AS INTEGER) AS g_st,
         | count(*) AS n, ${decSum2("o_totalprice")} AS revenue
         |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY priority, status, g_pri, g_st""".stripMargin,

    "join_outer_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "setop_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "agg_cube" ->
      s"""SELECT coalesce(event_type, '(all)') AS event_type,
         | coalesce(CAST(user_id AS VARCHAR), '(all)') AS user_id,
         | CAST(grouping(event_type) AS INTEGER) AS g_t,
         | CAST(grouping(user_id) AS INTEGER) AS g_u,
         | count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events GROUP BY CUBE (event_type, user_id)
         |ORDER BY event_type, user_id, g_t, g_u""".stripMargin,

    "agg_grouping_sets" ->
      s"""SELECT coalesce(event_type, '(all)') AS event_type,
         | coalesce(CAST(user_id AS VARCHAR), '(all)') AS user_id,
         | CAST(grouping(event_type) AS INTEGER) AS g_t,
         | CAST(grouping(user_id) AS INTEGER) AS g_u,
         | count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events GROUP BY GROUPING SETS ((event_type), (user_id))
         |ORDER BY event_type, user_id""".stripMargin,

    "window_lead_lag" ->
      """SELECT event_id, user_id,
        | epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
        |   OVER w AS gap_us,
        | lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin,

    "sketch_kmv_distinct" -> {
      val hv = s"((${ch("CAST(event_id % 997 AS VARCHAR)")}) * 2654435761) % 1000000007"
      s"""WITH hs AS (SELECT DISTINCT event_type, $hv AS hv FROM events),
         |r AS (SELECT event_type, hv,
         |        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
         |        count(*) OVER (PARTITION BY event_type) AS nd
         |      FROM hs),
         |agg AS (SELECT event_type, max(nd) AS nd, max(CASE WHEN rk = 64 THEN hv END) AS kth
         |        FROM r GROUP BY event_type),
         |ex AS (SELECT event_type, count(DISTINCT event_id % 997) AS exact FROM events GROUP BY event_type)
         |SELECT a.event_type,
         | CASE WHEN a.nd < 64 THEN CAST(a.nd AS DOUBLE)
         |      ELSE CAST(63 * CAST(1000000007 AS BIGINT) AS DOUBLE) / CAST(a.kth AS DOUBLE) END AS kmv_est,
         | ex.exact
         |FROM agg a JOIN ex ON ex.event_type = a.event_type
         |ORDER BY a.event_type""".stripMargin
    },

    "sketch_kmv_overlap" -> {
      val hv = s"((${ch("'u:' || CAST(user_id AS VARCHAR)")}) * 2654435761) % 1000000007"
      s"""WITH hs AS (SELECT DISTINCT event_type, $hv AS hv
         |            FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, hv, row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk FROM hs),
         |sk AS (SELECT event_type, list(hv ORDER BY hv) AS sk FROM r WHERE rk <= 64 GROUP BY event_type),
         |du AS (SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL),
         |ex AS (SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS exact_inter
         |       FROM du x JOIN du y ON x.user_id = y.user_id AND x.event_type < y.event_type
         |       GROUP BY 1, 2),
         |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, a.sk AS sa, b.sk AS sb
         |      FROM sk a JOIN sk b ON a.event_type < b.event_type),
         |c AS (SELECT type_a, type_b, sa, sb, list_sort(list_distinct(sa || sb))[1:64] AS u FROM p),
         |d AS (SELECT type_a, type_b,
         |        CAST(len(u) AS BIGINT) AS theta_n,
         |        CAST(len(list_filter(u, h_ -> list_contains(sa, h_) AND list_contains(sb, h_))) AS BIGINT) AS inter_k,
         |        u[len(u)] AS kth FROM c),
         |f AS (SELECT *,
         |        CASE WHEN theta_n < 64 THEN CAST(theta_n AS DOUBLE)
         |             ELSE CAST(63 * CAST(1000000007 AS BIGINT) AS DOUBLE) / CAST(kth AS DOUBLE)
         |        END AS est_union FROM d)
         |SELECT f.type_a, f.type_b, f.theta_n, f.inter_k, f.est_union,
         | (CAST(f.inter_k AS DOUBLE) / CAST(f.theta_n AS DOUBLE)) * f.est_union AS est_inter,
         | CAST(coalesce(ex.exact_inter, 0) AS BIGINT) AS exact_inter
         |FROM f LEFT JOIN ex ON ex.type_a = f.type_a AND ex.type_b = f.type_b
         |ORDER BY f.type_a, f.type_b""".stripMargin
    },

    "pipeline_dataset_card" ->
      s"""$gopherCtes,
         |q AS (SELECT doc_id,
         |        (n_toks >= 10 AND n_toks <= 100000
         |         AND mean_tok_len >= 2.0 AND mean_tok_len <= 10.0
         |         AND top_unigram_frac <= 0.2
         |         AND dup_bigram_frac <= 0.3) AS passes
         |      FROM r),
         |tk AS (SELECT doc_id, CAST(len(${tok("text")}) AS BIGINT) AS n_tokens FROM documents),
         |cn AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |e AS (SELECT d.source, d.lang, d.n_chars, tk.n_tokens,
         |        CASE WHEN q.passes THEN 1 ELSE 0 END AS pq,
         |        CASE WHEN cn.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pc
         |      FROM documents d
         |      JOIN tk ON tk.doc_id = d.doc_id
         |      JOIN q ON q.doc_id = d.doc_id
         |      LEFT JOIN cn ON cn.doc_id = d.doc_id)
         |SELECT CASE WHEN GROUPING(source) = 1 THEN '(all)' ELSE source END AS source,
         | CASE WHEN GROUPING(lang) = 1 THEN '(all)' ELSE lang END AS lang,
         | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         | CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         | CAST(sum(pq) AS BIGINT) AS n_quality, CAST(sum(pc) AS BIGINT) AS n_canonical
         |FROM e GROUP BY ROLLUP(source, lang) ORDER BY 1, 2""".stripMargin,

    "text_shingle_gen" -> {
      val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2]")
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS pos FROM w),
         |h AS (SELECT doc_id, pos, $sh AS sh FROM t)
         |SELECT doc_id, count(*) AS n_shingles,
         | arg_min(sh, pos) AS first_sh, arg_max(sh, pos) AS last_sh,
         | CAST(sum(sh) AS BIGINT) AS sum_sh
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // n_images is arithmetic in the oracle (doc_id % 4) because every
    // synthesized ref lands in the complete 0..499 image table — the
    // Spark side must RESOLVE them via the embeddings join to match
    "multimodal_pack_interleaved" ->
      s"""WITH c AS (SELECT doc_id, source, CAST(len(${tok("text")}) AS BIGINT) AS n_toks,
         |             doc_id % 4 AS n_images
         |           FROM documents),
         |x AS (SELECT *, n_toks + n_images * 64 AS cost FROM c),
         |s AS (SELECT *, sum(cost) OVER (PARTITION BY source ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM x)
         |SELECT source, CAST((cum - cost) // 2048 AS BIGINT) AS shard,
         | count(*) AS n_docs, CAST(sum(cost) AS BIGINT) AS sum_cost,
         | CAST(sum(n_images) AS BIGINT) AS sum_images
         |FROM s GROUP BY source, shard ORDER BY source, shard""".stripMargin,

    "pipeline_token_budget" ->
      s"""WITH w AS (SELECT doc_id, source, ${tok("text")} AS w FROM documents),
         |c AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tokens,
         |        CAST(len(list_filter(w, t_ -> list_contains(['the','and','of','to','a','in','is'], t_))) AS BIGINT) AS q
         |      FROM w),
         |r AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS taken_before FROM c)
         |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         | min(q) AS min_q
         |FROM r WHERE taken_before < 800 GROUP BY source ORDER BY source""".stripMargin,

    "text_winnowing" -> {
      val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2]")
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS pos FROM w),
         |h AS (SELECT doc_id, pos, ($sh) * 16777216 + pos AS c FROM t),
         |sel AS (SELECT doc_id, pos, min(c) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel FROM h),
         |fp AS (SELECT DISTINCT doc_id, sel // 16777216 AS fp_sh FROM sel WHERE pos >= 4)
         |SELECT doc_id, count(*) AS n_fp, min(fp_sh) AS min_fp,
         | CAST(sum(fp_sh) AS BIGINT) AS sum_fp
         |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "dedup_winnowing" -> {
      val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2]")
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS pos FROM w),
         |h AS (SELECT doc_id, pos, ($sh) * 16777216 + pos AS c FROM t),
         |sel AS (SELECT doc_id, pos, min(c) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel FROM h),
         |fp AS (SELECT DISTINCT doc_id, sel // 16777216 AS fp_sh FROM sel WHERE pos >= 4)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |FROM fp a JOIN fp b ON a.fp_sh = b.fp_sh AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 5
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "dedup_winnowing_clusters" -> {
      val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2]")
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS pos FROM w),
         |h AS (SELECT doc_id, pos, ($sh) * 16777216 + pos AS c FROM t),
         |sel AS (SELECT doc_id, pos, min(c) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel FROM h),
         |fp AS (SELECT DISTINCT doc_id, sel // 16777216 AS fp_sh FROM sel WHERE pos >= 4),
         |grp AS (SELECT fp_sh, min(doc_id) AS grp_rep FROM fp GROUP BY fp_sh),
         |docrep AS (SELECT f.doc_id, min(g.grp_rep) AS rep
         |           FROM fp f JOIN grp g ON f.fp_sh = g.fp_sh GROUP BY f.doc_id)
         |SELECT rep, count(*) AS n_docs FROM docrep GROUP BY rep ORDER BY rep""".stripMargin
    },

    "dedup_winnowing_verified" -> {
      val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2]")
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS pos FROM w),
         |h AS (SELECT doc_id, pos, ($sh) * 16777216 + pos AS c FROM t),
         |sel AS (SELECT doc_id, pos, min(c) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel FROM h),
         |fp AS (SELECT DISTINCT doc_id, sel // 16777216 AS fp_sh FROM sel WHERE pos >= 4),
         |grp AS (SELECT fp_sh, min(doc_id) AS grp_rep FROM fp GROUP BY fp_sh),
         |docrep AS (SELECT f.doc_id, min(g.grp_rep) AS rep
         |           FROM fp f JOIN grp g ON f.fp_sh = g.fp_sh GROUP BY f.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id),
         |inter AS (SELECT dr.doc_id, dr.rep, count(*) AS i
         |          FROM docrep dr
         |          JOIN fp a ON a.doc_id = dr.doc_id
         |          JOIN fp b ON b.doc_id = dr.rep AND b.fp_sh = a.fp_sh
         |          WHERE dr.doc_id <> dr.rep GROUP BY 1, 2),
         |v AS (SELECT dr.doc_id, dr.rep,
         |        CAST(coalesce(i.i, 0) AS DOUBLE) /
         |          (sa.n + sr.n - coalesce(i.i, 0)) AS jac
         |      FROM docrep dr
         |      LEFT JOIN inter i ON i.doc_id = dr.doc_id AND i.rep = dr.rep
         |      JOIN sz sa ON sa.doc_id = dr.doc_id
         |      JOIN sz sr ON sr.doc_id = dr.rep),
         |cl AS (SELECT CASE WHEN doc_id = rep OR jac >= 0.5 THEN rep ELSE doc_id END AS rep
         |       FROM v)
         |SELECT rep, count(*) AS n_docs FROM cl GROUP BY rep ORDER BY rep""".stripMargin
    },

    // Adjusted Rand index between the LSH and winnowing clusterings:
    // both doc->rep maps rebuilt from their families' shared CTE logic
    // (the minhash `w` token CTE doubles as the winnowing token source),
    // singleton-completed over all docs, then exact pair counting with
    // HUGEINT floor division for the ppm.
    "dedup_cluster_ari" -> {
      val sh = ch("w[pos] || ' ' || w[pos+1] || ' ' || w[pos+2]")
      s"""$minhashCtes,
         |lgrp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |da AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |       FROM bands b JOIN lgrp g ON b.band = g.band AND b.sig = g.sig
         |       GROUP BY b.doc_id),
         |t2 AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS pos FROM w),
         |h2 AS (SELECT doc_id, pos, ($sh) * 16777216 + pos AS c FROM t2),
         |sel2 AS (SELECT doc_id, pos, min(c) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel FROM h2),
         |fp2 AS (SELECT DISTINCT doc_id, sel // 16777216 AS fp_sh FROM sel2 WHERE pos >= 4),
         |wgrp AS (SELECT fp_sh, min(doc_id) AS grp_rep FROM fp2 GROUP BY fp_sh),
         |db AS (SELECT f.doc_id, min(g.grp_rep) AS rep
         |       FROM fp2 f JOIN wgrp g ON f.fp_sh = g.fp_sh GROUP BY f.doc_id),
         |alld AS (SELECT doc_id FROM documents),
         |laa AS (SELECT d.doc_id, COALESCE(a.rep, d.doc_id) AS ra
         |        FROM alld d LEFT JOIN da a ON d.doc_id = a.doc_id),
         |lbb AS (SELECT d.doc_id, COALESCE(b.rep, d.doc_id) AS rb
         |        FROM alld d LEFT JOIN db b ON d.doc_id = b.doc_id),
         |jj AS (SELECT laa.ra, lbb.rb FROM laa JOIN lbb ON laa.doc_id = lbb.doc_id),
         |cel AS (SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) AS BIGINT) AS s
         |        FROM (SELECT count(*) AS n FROM jj GROUP BY ra, rb)),
         |rp AS (SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) AS BIGINT) AS ra_p
         |       FROM (SELECT count(*) AS n FROM jj GROUP BY ra)),
         |cp AS (SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) AS BIGINT) AS rb_p
         |       FROM (SELECT count(*) AS n FROM jj GROUP BY rb)),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM jj),
         |ff AS (SELECT tt.n, tt.n * (tt.n - 1) // 2 AS t, cel.s, rp.ra_p, cp.rb_p
         |       FROM tt, cel, rp, cp)
         |SELECT n AS n_docs, s AS same_pairs, ra_p AS a_pairs, rb_p AS b_pairs,
         | CASE WHEN (CAST(t AS HUGEINT) * (ra_p + rb_p) - 2 * CAST(ra_p AS HUGEINT) * rb_p) = 0 THEN 0
         |   ELSE CAST((CAST(1000000 AS HUGEINT) * 2 * (CAST(t AS HUGEINT) * s - CAST(ra_p AS HUGEINT) * rb_p))
         |     // (CAST(t AS HUGEINT) * (ra_p + rb_p) - 2 * CAST(ra_p AS HUGEINT) * rb_p) AS BIGINT) END AS ari_ppm
         |FROM ff""".stripMargin
    },

    // Train/eval decontamination census: a training doc (doc_id % 10
    // != 7) is contaminated if any 8-token window hash also occurs in
    // the eval split; per-source counts with exact ppm rate.
    "pipeline_contamination_census" -> contaminationSql,

    "dedup_substring_spans" ->
      s"""$substringSpanCtes
         |SELECT doc_id, count(*) AS n_spans,
         | CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens,
         | CAST(min(span_start) AS BIGINT) AS first_start,
         | CAST(max(span_end) AS BIGINT) AS last_end
         |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pipeline_substring_scrub" ->
      s"""$substringSpanCtes,
         |per AS (SELECT doc_id, CAST(sum(span_end - span_start) AS BIGINT) AS dup_tokens
         |        FROM sp GROUP BY doc_id),
         |c AS (SELECT d.doc_id, d.source, CAST(len(${tok("d.text")}) AS BIGINT) AS n_toks,
         |        coalesce(p.dup_tokens, 0) AS dup_tokens
         |      FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id)
         |SELECT source, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
         | CAST(sum(dup_tokens) AS BIGINT) AS sum_dup_tokens,
         | CAST(sum(CASE WHEN dup_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected
         |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "pipeline_scrub_apply" ->
      s"""$substringSpanCtes,
         |tok2 AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM w),
         |tk AS (SELECT doc_id, pos, w[pos] AS t FROM tok2),
         |keep AS (SELECT tk.doc_id, tk.pos, tk.t FROM tk WHERE NOT EXISTS
         |   (SELECT 1 FROM sp WHERE sp.doc_id = tk.doc_id
         |      AND tk.pos >= sp.span_start AND tk.pos < sp.span_end)),
         |ag AS (SELECT doc_id, count(*) AS n_toks_after,
         |         string_agg(t, ' ' ORDER BY pos) AS scrubbed
         |       FROM keep GROUP BY doc_id)
         |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_toks_before,
         | coalesce(ag.n_toks_after, 0) AS n_toks_after,
         | coalesce(ag.scrubbed, '') AS scrubbed
         |FROM w LEFT JOIN ag ON w.doc_id = ag.doc_id ORDER BY w.doc_id""".stripMargin,

    "pipeline_scrub_keep_one" ->
      s"""$substringKeepOneCtes,
         |tok2 AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM w),
         |tk AS (SELECT doc_id, pos, w[pos] AS t FROM tok2),
         |keep AS (SELECT tk.doc_id, tk.pos, tk.t FROM tk WHERE NOT EXISTS
         |   (SELECT 1 FROM sp WHERE sp.doc_id = tk.doc_id
         |      AND tk.pos >= sp.span_start AND tk.pos < sp.span_end)),
         |ag AS (SELECT doc_id, count(*) AS n_toks_after,
         |         string_agg(t, ' ' ORDER BY pos) AS scrubbed
         |       FROM keep GROUP BY doc_id)
         |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_toks_before,
         | coalesce(ag.n_toks_after, 0) AS n_toks_after,
         | coalesce(ag.scrubbed, '') AS scrubbed
         |FROM w LEFT JOIN ag ON w.doc_id = ag.doc_id ORDER BY w.doc_id""".stripMargin,

    "join_null_safe" ->
      """WITH e AS (SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS etype, value
        |           FROM events),
        |agg AS (SELECT etype, count(*) AS n,
        |          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |        FROM e GROUP BY etype),
        |dim AS (SELECT DISTINCT etype AS d_etype, coalesce(etype, '(unknown)') AS label FROM e)
        |SELECT dim.label, agg.n, agg.sum_value
        |FROM agg JOIN dim ON agg.etype IS NOT DISTINCT FROM dim.d_etype
        |ORDER BY dim.label""".stripMargin,

    "project_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        | SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        | UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        | UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        | UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "stream_available_now" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id",

    "agg_listagg" ->
      """SELECT r_name, count(*) AS n_nations,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "agg_percentile" ->
      """SELECT o_orderstatus,
        | quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.9) AS p90,
        | count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "typed_cogroup" ->
      """SELECT o_orderkey, o_totalprice, count(l_orderkey) AS n_lines,
        | CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_line_price
        |FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_totalprice ORDER BY o_orderkey""".stripMargin,

    "setop_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000
        |ORDER BY o_custkey""".stripMargin,

    // The Spark side renders a deterministic gradient PNG per doc (width
    // 16+n%32, height 16+7n%32, pixel luma base+x+y with base =
    // (first+last byte)%160) and decodes it through the REAL ImageIO
    // codec; the oracle predicts what the codec must read back in closed
    // form. brightness = mean luma = floor(sum(base+x+y) / (w*h)).
    // Closed-form mirror of the aHash grid sample: sampled luma of the
    // gradient raster is base + (gx·w)//8 + (gy·h)//8; bit set when
    // 64·v > Σv (base cancels, but the full form is kept). Hash halves
    // assembled with integer shifts.
    "multimodal_ahash_dedup" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(16 + octet_length(encode(text)) % 32 AS BIGINT) AS w,
        |   CAST(16 + (octet_length(encode(text)) * 7) % 32 AS BIGINT) AS h,
        |   CAST(CASE WHEN length(text) > 0
        |     THEN (ascii(substring(text, 1, 1)) + ascii(substring(text, length(text), 1))) % 160
        |     ELSE 0 END AS BIGINT) AS base
        | FROM documents),
        |g AS (SELECT f.doc_id, f.base,
        |        gy.j * 8 + gx.i AS bit,
        |        f.base + (gx.i * f.w) // 8 + (gy.j * f.h) // 8 AS v
        |      FROM f,
        |        unnest(generate_series(0, 7)) AS gx(i),
        |        unnest(generate_series(0, 7)) AS gy(j)),
        |s AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS sum64 FROM g GROUP BY 1),
        |bits AS (SELECT g.doc_id, g.bit,
        |           CASE WHEN 64 * g.v > s.sum64 THEN 1 ELSE 0 END AS b
        |         FROM g JOIN s USING (doc_id)),
        |hsh AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN bit >= 32 THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS ah_hi,
        |    CAST(sum(CASE WHEN bit < 32 THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS ah_lo
        |  FROM bits GROUP BY 1)
        |SELECT ah_hi, ah_lo, min(doc_id) AS rep, count(*) AS n_docs
        |FROM hsh GROUP BY ah_hi, ah_lo ORDER BY rep""".stripMargin,

    "multimodal_decode" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(16 + octet_length(encode(text)) % 32 AS BIGINT) AS w,
        |   CAST(16 + (octet_length(encode(text)) * 7) % 32 AS BIGINT) AS h,
        |   CAST(CASE WHEN length(text) > 0
        |     THEN (ascii(substring(text, 1, 1)) + ascii(substring(text, length(text), 1))) % 160
        |     ELSE 0 END AS BIGINT) AS base
        | FROM documents)
        |SELECT doc_id, w AS width, h AS height, CAST(3 AS BIGINT) AS channels,
        | (w*h*base + h*(w*(w-1)//2) + w*(h*(h-1)//2)) // (w*h) AS brightness
        |FROM f ORDER BY doc_id""".stripMargin,

    "multimodal_luma_hist" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(16 + octet_length(encode(text)) % 32 AS BIGINT) AS w,
        |   CAST(16 + (octet_length(encode(text)) * 7) % 32 AS BIGINT) AS h,
        |   CAST(CASE WHEN length(text) > 0
        |     THEN (ascii(substring(text, 1, 1)) + ascii(substring(text, length(text), 1))) % 160
        |     ELSE 0 END AS BIGINT) AS base
        | FROM documents),
        |fx AS (SELECT doc_id, h, base, unnest(generate_series(0, w - 1)) AS x FROM f),
        |fxy AS (SELECT doc_id, base, x, unnest(generate_series(0, h - 1)) AS y FROM fx)
        |SELECT doc_id, CAST((base + x + y) // 32 AS BIGINT) AS bucket, count(*) AS n_px
        |FROM fxy GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin,

    // WAV analog of multimodal_decode: ramp waveform a(t) = base + t over
    // n = 1000 + n_bytes % 4000 samples, base = (first+last byte) % 1000 —
    // the real codec must read back sum = n*base + n(n-1)/2 and
    // energy = n*base^2 + 2*base*n(n-1)/2 + (n-1)n(2n-1)/6.
    // Silence profile of the gapped synth WAV: every 4th 100-sample
    // block is zeroed and non-silent samples are strictly positive, so
    // segments/runs have the closed block-geometry form below (blocks
    // with k % 4 = 0 are isolated — each is exactly one segment, the
    // last possibly partial).
    "multimodal_silence" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(1000 + octet_length(encode(text)) % 4000 AS BIGINT) AS n
        | FROM documents),
        |b AS (SELECT doc_id, n, unnest(generate_series(0, (n - 1) // 100)) AS k FROM f),
        |s AS (SELECT doc_id, n, k, least(100, n - 100 * k) AS run
        |      FROM b WHERE k % 4 = 0)
        |SELECT doc_id, any_value(n) AS n_samples,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(run) AS BIGINT) AS n_silent,
        |  CAST(max(run) AS BIGINT) AS longest_run
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "multimodal_audio" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(1000 + octet_length(encode(text)) % 4000 AS BIGINT) AS n,
        |   CAST(CASE WHEN length(text) > 0
        |     THEN (ascii(substring(text, 1, 1)) + ascii(substring(text, length(text), 1))) % 1000
        |     ELSE 0 END AS BIGINT) AS base
        | FROM documents)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(1 AS BIGINT) AS channels, CAST(16 AS BIGINT) AS bits,
        | n AS n_samples,
        | n*base + n*(n-1)//2 AS sum_amp,
        | n*base*base + 2*base*(n*(n-1)//2) + (n-1)*n*(2*n-1)//6 AS energy
        |FROM f ORDER BY doc_id""".stripMargin,

    "multimodal_resize" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(16 + octet_length(encode(text)) % 32 AS BIGINT) AS width,
        |   CAST(16 + (octet_length(encode(text)) * 7) % 32 AS BIGINT) AS height
        | FROM documents)
        |SELECT doc_id, width, height,
        | CASE WHEN width <= 32 AND height <= 32 THEN width
        |      WHEN width >= height THEN 32
        |      ELSE GREATEST(1, (width * 32) // height) END AS rw,
        | CASE WHEN width <= 32 AND height <= 32 THEN height
        |      WHEN width >= height THEN GREATEST(1, (height * 32) // width)
        |      ELSE 32 END AS rh
        |FROM f ORDER BY doc_id""".stripMargin,

    "agg_histogram" ->
      s"""SELECT CAST(floor(value / 50) AS BIGINT) AS bin, count(*) AS n,
         | ${decSum2("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_lang_id" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |s AS (SELECT doc_id, lang,
         |        CAST(len(list_filter(w, t_ -> list_contains(lex, t_))) AS BIGINT) AS score
         |      FROM w, $langLexSql),
         |r AS (SELECT doc_id, lang, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk FROM s)
         |SELECT doc_id, CASE WHEN score = 0 THEN 'unk' ELSE lang END AS lang_guess, score
         |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "text_lang_id_ngram" -> {
      // profiles generated from the SAME Scala source as the Spark side
      val profiles = graft.operators.TextOps.langTrigramProfiles
        .map { case (lang, tris) =>
          s"('$lang', [${tris.map(t => s"'$t'").mkString(",")}])"
        }.mkString(",\n        ")
      s"""WITH tri AS (SELECT doc_id,
         |        CASE WHEN length(text) >= 3
         |          THEN list_distinct(list_transform(generate_series(1, length(text) - 2),
         |                 i_ -> substring(text, i_, 3)))
         |          ELSE CAST([] AS VARCHAR[]) END AS tri
         |      FROM documents),
         |s AS (SELECT doc_id, lang,
         |        CAST(len(list_filter(prof, g_ -> list_contains(tri, g_))) AS BIGINT) AS score
         |      FROM tri, (VALUES $profiles) AS pz(lang, prof)),
         |r AS (SELECT doc_id, lang, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk FROM s)
         |SELECT doc_id, CASE WHEN score = 0 THEN 'unk' ELSE lang END AS lang_guess, score
         |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin
    },

    "text_quality_score" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |c AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_toks,
         |        CAST(coalesce(list_sum(list_transform(w, t_ -> length(t_))), 0) AS BIGINT) AS sum_len,
         |        CAST(len(list_filter(w, t_ -> list_contains($enLex, t_))) AS BIGINT) AS stop_hits
         |      FROM w)
         |SELECT doc_id, n_toks,
         | CASE WHEN n_toks = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(sum_len AS DOUBLE) / n_toks END AS avg_tok_len,
         | CASE WHEN n_toks = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(stop_hits AS DOUBLE) / n_toks END AS stop_ratio,
         | (CASE WHEN n_toks = 0 THEN CAST(0 AS DOUBLE) ELSE CAST(stop_hits AS DOUBLE) / n_toks END) * CAST(0.5 AS DOUBLE)
         |  + least(CAST(1 AS DOUBLE), CAST(n_toks AS DOUBLE) / CAST(100 AS DOUBLE)) * CAST(0.5 AS DOUBLE) AS quality
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      s"""SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, CAST(len(list_distinct(w)) AS BIGINT) AS n_unique
         |FROM (SELECT doc_id, ${tok("text")} AS w FROM documents) ORDER BY doc_id""".stripMargin,

    // Simpson concentration: per-doc token counts reduce to n, nd, sum(c^2)
    // (the engine computes sum(c^2) by a run-length fold over the sorted
    // token array — same value, no token-level rows).
    "text_simpson_diversity" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |tk AS (SELECT doc_id, unnest(w) AS t FROM w WHERE len(w) > 0),
         |c AS (SELECT doc_id, t, count(*) AS c FROM tk GROUP BY 1, 2),
         |a AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, sum(c * c) AS s2
         |      FROM c GROUP BY 1)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_toks, CAST(nd AS BIGINT) AS n_distinct,
         |  CAST((1000000 * s2) // (n * n) AS BIGINT) AS simpson_ppm,
         |  CAST((1000 * n * n) // s2 AS BIGINT) AS inv_simpson_milli
         |FROM a ORDER BY doc_id""".stripMargin,

    "text_token_bpe" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        | CAST(len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS n_bpe_unique
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT doc_id,
         | list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(w, t_ -> ${ch("t_")})),
         |   (a2_, h2_) -> (a2_*1000003 + h2_) % 1000000007) AS fp
         |FROM (SELECT doc_id, ${tok("text")} AS w FROM documents) ORDER BY doc_id""".stripMargin,

    "text_bpe_pairs" ->
      s"""WITH w AS (SELECT ${tok("text")} AS w FROM documents),
         |wd AS (SELECT unnest(w) AS word FROM w),
         |p AS (SELECT unnest(list_transform(generate_series(1, length(word) - 1),
         |        i_ -> substring(word, i_, 2))) AS pair
         |      FROM wd WHERE length(word) >= 2),
         |c AS (SELECT pair, count(*) AS n FROM p GROUP BY pair)
         |SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "text_ngram_freq" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |bg AS (SELECT unnest(CASE WHEN len(w) >= 2
         |         THEN list_transform(generate_series(1, len(w) - 1), i_ -> w[i_] || ' ' || w[i_+1])
         |         ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM w),
         |c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
         |SELECT bigram, n FROM c ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "sql_api" -> {
      val h = ch("o_orderpriority")
      s"""SELECT o_orderpriority, count(*) AS n,
         | ${decSum2("o_totalprice")} AS revenue,
         | min($h) AS pri_hash
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },

    "pipeline_text_clean" ->
      s"""$minhashCtes,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS inter
         |          FROM pairs p
         |          JOIN sh x ON x.doc_id = p.doc_a
         |          JOIN sh y ON y.doc_id = p.doc_b AND y.h = x.h
         |          GROUP BY p.doc_a, p.doc_b),
         |neardrop AS (SELECT DISTINCT i.doc_b AS doc_id FROM inter i
         |             JOIN sizes sa ON sa.doc_id = i.doc_a
         |             JOIN sizes sb ON sb.doc_id = i.doc_b
         |             WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.5),
         |langok AS (SELECT doc_id FROM (
         |    SELECT doc_id, lang, score,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
         |    FROM (SELECT doc_id, lang,
         |            CAST(len(list_filter(w, t_ -> list_contains(lex, t_))) AS BIGINT) AS score
         |          FROM w, $langLexSql))
         |  WHERE rk = 1 AND score > 0 AND lang = 'en'),
         |qualok AS (SELECT doc_id FROM (
         |    SELECT doc_id,
         |      (CASE WHEN len(w) = 0 THEN CAST(0 AS DOUBLE)
         |            ELSE CAST(len(list_filter(w, t_ -> list_contains($enLex, t_))) AS DOUBLE) / CAST(len(w) AS BIGINT) END)
         |        * CAST(0.5 AS DOUBLE)
         |      + least(CAST(1 AS DOUBLE), CAST(CAST(len(w) AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE)) * CAST(0.5 AS DOUBLE) AS quality
         |    FROM w) WHERE quality >= 0.3),
         |exactkeep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         |SELECT d.doc_id, d.n_chars FROM documents d
         |WHERE d.doc_id IN (SELECT doc_id FROM langok)
         |  AND d.doc_id IN (SELECT doc_id FROM qualok)
         |  AND d.doc_id IN (SELECT doc_id FROM exactkeep)
         |  AND d.doc_id NOT IN (SELECT doc_id FROM neardrop)
         |ORDER BY d.doc_id""".stripMargin,

    // the end-to-end corpus build: language gate ∧ quality gate ∧ exact
    // dedup ∧ LSH-cluster rep ∧ not-benchmark ∧ not-contaminated, then
    // the per-split manifest — every CTE reused from the single-stage
    // oracles above, composed exactly as the Spark plan composes them
    "pipeline_corpus_build" -> {
      val h = ch("CAST(doc_id AS VARCHAR)")
      s"""$minhashCtes,
         |grp AS (SELECT band, sig, min(doc_id) AS grp_rep FROM bands GROUP BY band, sig),
         |docrep AS (SELECT b.doc_id, min(g.grp_rep) AS rep
         |           FROM bands b JOIN grp g ON b.band = g.band AND b.sig = g.sig
         |           GROUP BY b.doc_id),
         |langok AS (SELECT doc_id FROM (
         |    SELECT doc_id, lang, score,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
         |    FROM (SELECT doc_id, lang,
         |            CAST(len(list_filter(w, t_ -> list_contains(lex, t_))) AS BIGINT) AS score
         |          FROM w, $langLexSql))
         |  WHERE rk = 1 AND score > 0 AND lang = 'en'),
         |qualok AS (SELECT doc_id FROM (
         |    SELECT doc_id,
         |      (CASE WHEN len(w) = 0 THEN CAST(0 AS DOUBLE)
         |            ELSE CAST(len(list_filter(w, t_ -> list_contains($enLex, t_))) AS DOUBLE) / CAST(len(w) AS BIGINT) END)
         |        * CAST(0.5 AS DOUBLE)
         |      + least(CAST(1 AS DOUBLE), CAST(CAST(len(w) AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE)) * CAST(0.5 AS DOUBLE) AS quality
         |    FROM w) WHERE quality >= 0.3),
         |exactkeep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 100 = 0),
         |cont AS (SELECT DISTINCT doc_id FROM sh WHERE h IN (SELECT h FROM bench)),
         |kept AS (SELECT d.doc_id, d.n_chars, ww.w FROM documents d
         | JOIN w ww ON ww.doc_id = d.doc_id
         | LEFT JOIN docrep dr ON dr.doc_id = d.doc_id
         | WHERE d.doc_id IN (SELECT doc_id FROM langok)
         |   AND d.doc_id IN (SELECT doc_id FROM qualok)
         |   AND d.doc_id IN (SELECT doc_id FROM exactkeep)
         |   AND (dr.rep IS NULL OR dr.rep = d.doc_id)
         |   AND d.doc_id % 100 <> 0
         |   AND d.doc_id NOT IN (SELECT doc_id FROM cont))
         |SELECT CASE WHEN ($h) % 100 < 80 THEN 'train'
         |            WHEN ($h) % 100 < 90 THEN 'val' ELSE 'test' END AS split,
         | count(*) AS n_docs,
         | CAST(sum(len(w)) AS BIGINT) AS sum_tokens,
         | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         | CAST(sum(doc_id) AS BIGINT) AS sum_id
         |FROM kept GROUP BY split ORDER BY split""".stripMargin
    },

    // the grid-join answers the plain BETWEEN join question — the oracle
    // needs no grid, just the interval predicate over the same bands
    "join_range_grid" -> {
      val bands = (0 until 64).map { i =>
        f"('band$i%02d', ${i.toDouble * i * 100}, ${(i + 1.0) * (i + 1) * 100})"
      }.mkString(", ")
      s"""WITH bands(band, lo, hi) AS (VALUES $bands)
         |SELECT band, count(*) AS n, ${decSum2("o_totalprice")} AS revenue
         |FROM orders JOIN bands
         |  ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band ORDER BY band""".stripMargin
    },

    // compaction preserves content; one writer per partition makes the
    // post-compaction file count exactly 1 — the invariant the oracle pins
    "ddl_compact" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
        | count(*) AS n_rows,
        | CAST(sum(event_id) AS BIGINT) AS sum_id,
        | CAST(1 AS BIGINT) AS files_after
        |FROM events GROUP BY event_date ORDER BY event_date""".stripMargin,

    // Two-sample chi-square drift per (type, value-decile), halves split
    // at the exact µs midpoint; HUGEINT arithmetic mirrors the Spark
    // side's DECIMAL(38,0) remainder-free floor division bitwise.
    // stream_drift shares this oracle verbatim: the streamed second half
    // accumulates through the sum-mergeable keyed state, so batch
    // boundaries cannot change the counts.
    "profile_drift" -> driftSql,
    "stream_drift" -> driftSql,

    // Vacuum preserves live content exactly; post-GC orphan and staging
    // counts are structurally 0.
    "ddl_vacuum" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
        | count(*) AS n_rows,
        | CAST(sum(event_id) AS BIGINT) AS sum_id,
        | CAST(0 AS BIGINT) AS orphans_after,
        | CAST(0 AS BIGINT) AS stale_staging_after
        |FROM events GROUP BY event_date ORDER BY event_date""".stripMargin,

    // exact discrete quantiles: k = ceil(q*n), value = k-th smallest
    "agg_quantile_2pass" ->
      """WITH t AS (SELECT l_extendedprice AS x FROM lineitem),
        |n AS (SELECT count(*) AS n FROM t),
        |ks AS (SELECT q, CAST(ceil(q * n.n) AS BIGINT) AS k
        |       FROM (VALUES (0.5), (0.9)) AS qs(q) CROSS JOIN n),
        |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rk FROM t)
        |SELECT ks.q, ks.k, r.x AS value
        |FROM ks JOIN r ON r.rk = ks.k ORDER BY ks.q""".stripMargin,

    "pipeline_decontaminate" ->
      s"""$minhashCtes,
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 100 = 0),
         |cont AS (SELECT DISTINCT doc_id FROM sh WHERE h IN (SELECT h FROM bench))
         |SELECT d.doc_id, d.source, d.n_chars FROM documents d
         |WHERE d.doc_id % 100 <> 0
         |  AND d.doc_id NOT IN (SELECT doc_id FROM cont)
         |ORDER BY d.doc_id""".stripMargin,

    "sample_stratified" -> {
      val h = ch("CAST(doc_id AS VARCHAR)")
      s"""SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |WHERE ($h) % 100 <
         |  CASE WHEN CAST(regexp_extract(source, '^src(\\d+)$$', 1) AS INTEGER) < 10 THEN 100
         |       WHEN CAST(regexp_extract(source, '^src(\\d+)$$', 1) AS INTEGER) < 15 THEN 50
         |       ELSE 10 END
         |GROUP BY source ORDER BY source""".stripMargin
    },

    "profile_table" ->
      """SELECT 'event_id' AS "column", count(CASE WHEN event_id IS NULL THEN 1 END) AS n_null,
        | count(DISTINCT event_id) AS n_distinct,
        | CAST(min(event_id) AS VARCHAR) AS vmin, CAST(max(event_id) AS VARCHAR) AS vmax FROM events
        |UNION ALL
        |SELECT 'user_id', count(CASE WHEN user_id IS NULL THEN 1 END), count(DISTINCT user_id),
        | CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR) FROM events
        |UNION ALL
        |SELECT 'event_type', count(CASE WHEN event_type IS NULL THEN 1 END), count(DISTINCT event_type),
        | min(event_type), max(event_type) FROM events
        |UNION ALL
        |SELECT 'value', count(CASE WHEN value IS NULL THEN 1 END), count(DISTINCT value),
        | CAST(CAST(min(value) AS DECIMAL(18,2)) AS VARCHAR),
        | CAST(CAST(max(value) AS DECIMAL(18,2)) AS VARCHAR) FROM events
        |UNION ALL
        |SELECT 'ts', count(CASE WHEN ts IS NULL THEN 1 END), count(DISTINCT ts),
        | strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S'),
        | strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') FROM events
        |ORDER BY "column"""".stripMargin,

    "window_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // percent_rank on a unique order: (rank-1)/(n-1) is one IEEE division
    // of exact integers — bit-identical across engines, no rounding.
    "window_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        | percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS pct_rank
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "agg_pivot" -> {
      val cols = Seq("click", "error", "purchase", "signup", "view").map { t =>
        s" CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS $t"
      }.mkString(",\n")
      s"""SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
         |$cols
         |FROM events GROUP BY day ORDER BY day""".stripMargin
    },

    "text_bpe_train" ->
      s"""WITH r0 AS (SELECT ' ' || array_to_string(${tok("text")}, '  ') || ' ' AS s FROM documents),
         |t1 AS (SELECT string_split(trim(s), '  ') AS l FROM r0 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u1 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t1),
         |p1 AS (SELECT l[i-1] AS a, l[i] AS b FROM u1),
         |m1 AS (SELECT a, b, count(*) AS n FROM p1 GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1),
         |r1 AS (SELECT replace(s,
         |   ' ' || (SELECT a FROM m1) || '  ' || (SELECT b FROM m1) || ' ',
         |   ' ' || (SELECT a FROM m1) || chr(1) || (SELECT b FROM m1) || ' ') AS s FROM r0),
         |t2 AS (SELECT string_split(trim(s), '  ') AS l FROM r1 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u2 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t2),
         |p2 AS (SELECT l[i-1] AS a, l[i] AS b FROM u2),
         |m2 AS (SELECT a, b, count(*) AS n FROM p2 GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1),
         |r2 AS (SELECT replace(s,
         |   ' ' || (SELECT a FROM m2) || '  ' || (SELECT b FROM m2) || ' ',
         |   ' ' || (SELECT a FROM m2) || chr(1) || (SELECT b FROM m2) || ' ') AS s FROM r1),
         |t3 AS (SELECT string_split(trim(s), '  ') AS l FROM r2 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u3 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t3),
         |p3 AS (SELECT l[i-1] AS a, l[i] AS b FROM u3),
         |m3 AS (SELECT a, b, count(*) AS n FROM p3 GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)
         |SELECT CAST(1 AS BIGINT) AS iter, a AS tok_a, b AS tok_b, n FROM m1
         |UNION ALL SELECT CAST(2 AS BIGINT), a, b, n FROM m2
         |UNION ALL SELECT CAST(3 AS BIGINT), a, b, n FROM m3
         |ORDER BY iter""".stripMargin,

    // Batched BPE: two unrolled batches of 3 token-disjoint merges each.
    // Greedy disjoint selection over the pool-bounded candidate ranking
    // (rk <= 112 = want*16+64, mirroring the Scala pool contract):
    // k_1 = rank 1, k_2 = lowest rank sharing no symbol with k_1,
    // k_3 = lowest rank sharing no symbol with k_1 or k_2. All three
    // replaces apply to the SAME batch-start corpus state (disjointness
    // makes them commute); chr(2) is an unmatchable no-op pattern for the
    // defensive case of a starved batch.
    "text_bpe_train_batched" ->
      s"""WITH r0 AS (SELECT ' ' || array_to_string(${tok("text")}, '  ') || ' ' AS s FROM documents),
         |t1 AS (SELECT string_split(trim(s), '  ') AS l FROM r0 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u1 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t1),
         |p1 AS (SELECT l[i-1] AS a, l[i] AS b FROM u1),
         |cnd1 AS (SELECT * FROM (SELECT a, b, n, row_number() OVER (ORDER BY n DESC, a, b) AS rk
         |         FROM (SELECT a, b, count(*) AS n FROM p1 GROUP BY a, b)) WHERE rk <= 112),
         |k11 AS (SELECT a, b, n FROM cnd1 WHERE rk = 1),
         |k12 AS (SELECT c.a, c.b, c.n FROM cnd1 c, k11
         |        WHERE c.a NOT IN (k11.a, k11.b) AND c.b NOT IN (k11.a, k11.b)
         |        ORDER BY c.rk LIMIT 1),
         |k13 AS (SELECT c.a, c.b, c.n FROM cnd1 c, k11, k12
         |        WHERE c.a NOT IN (k11.a, k11.b, k12.a, k12.b)
         |          AND c.b NOT IN (k11.a, k11.b, k12.a, k12.b)
         |        ORDER BY c.rk LIMIT 1),
         |r1 AS (SELECT replace(replace(replace(s,
         |   ' ' || (SELECT a FROM k11) || '  ' || (SELECT b FROM k11) || ' ',
         |   ' ' || (SELECT a FROM k11) || chr(1) || (SELECT b FROM k11) || ' '),
         |   coalesce(' ' || (SELECT a FROM k12) || '  ' || (SELECT b FROM k12) || ' ', chr(2)),
         |   coalesce(' ' || (SELECT a FROM k12) || chr(1) || (SELECT b FROM k12) || ' ', chr(2))),
         |   coalesce(' ' || (SELECT a FROM k13) || '  ' || (SELECT b FROM k13) || ' ', chr(2)),
         |   coalesce(' ' || (SELECT a FROM k13) || chr(1) || (SELECT b FROM k13) || ' ', chr(2))) AS s FROM r0),
         |t2 AS (SELECT string_split(trim(s), '  ') AS l FROM r1 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u2 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t2),
         |p2 AS (SELECT l[i-1] AS a, l[i] AS b FROM u2),
         |cnd2 AS (SELECT * FROM (SELECT a, b, n, row_number() OVER (ORDER BY n DESC, a, b) AS rk
         |         FROM (SELECT a, b, count(*) AS n FROM p2 GROUP BY a, b)) WHERE rk <= 112),
         |k21 AS (SELECT a, b, n FROM cnd2 WHERE rk = 1),
         |k22 AS (SELECT c.a, c.b, c.n FROM cnd2 c, k21
         |        WHERE c.a NOT IN (k21.a, k21.b) AND c.b NOT IN (k21.a, k21.b)
         |        ORDER BY c.rk LIMIT 1),
         |k23 AS (SELECT c.a, c.b, c.n FROM cnd2 c, k21, k22
         |        WHERE c.a NOT IN (k21.a, k21.b, k22.a, k22.b)
         |          AND c.b NOT IN (k21.a, k21.b, k22.a, k22.b)
         |        ORDER BY c.rk LIMIT 1)
         |SELECT CAST(1 AS BIGINT) AS rank, CAST(1 AS BIGINT) AS batch, a AS tok_a, b AS tok_b, n FROM k11
         |UNION ALL SELECT 2, 1, a, b, n FROM k12
         |UNION ALL SELECT 3, 1, a, b, n FROM k13
         |UNION ALL SELECT 4, 2, a, b, n FROM k21
         |UNION ALL SELECT 5, 2, a, b, n FROM k22
         |UNION ALL SELECT 6, 2, a, b, n FROM k23
         |ORDER BY rank""".stripMargin,

    // the train chain with doc_id carried through and merges applied back
    // to every doc: same 3 unrolled rounds, counts before/after at the end
    "text_bpe_apply" ->
      s"""WITH d0 AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |r0 AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS raw,
         |        ' ' || array_to_string(w, '  ') || ' ' AS s FROM d0),
         |t1 AS (SELECT string_split(trim(s), '  ') AS l FROM r0 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u1 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t1),
         |p1 AS (SELECT l[i-1] AS a, l[i] AS b FROM u1),
         |m1 AS (SELECT a, b FROM (SELECT a, b, count(*) AS n FROM p1 GROUP BY a, b
         |        ORDER BY n DESC, a, b LIMIT 1)),
         |r1 AS (SELECT doc_id, raw, replace(s,
         |   ' ' || (SELECT a FROM m1) || '  ' || (SELECT b FROM m1) || ' ',
         |   ' ' || (SELECT a FROM m1) || chr(1) || (SELECT b FROM m1) || ' ') AS s FROM r0),
         |t2 AS (SELECT string_split(trim(s), '  ') AS l FROM r1 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u2 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t2),
         |p2 AS (SELECT l[i-1] AS a, l[i] AS b FROM u2),
         |m2 AS (SELECT a, b FROM (SELECT a, b, count(*) AS n FROM p2 GROUP BY a, b
         |        ORDER BY n DESC, a, b LIMIT 1)),
         |r2 AS (SELECT doc_id, raw, replace(s,
         |   ' ' || (SELECT a FROM m2) || '  ' || (SELECT b FROM m2) || ' ',
         |   ' ' || (SELECT a FROM m2) || chr(1) || (SELECT b FROM m2) || ' ') AS s FROM r1),
         |t3 AS (SELECT string_split(trim(s), '  ') AS l FROM r2 WHERE len(string_split(trim(s), '  ')) >= 2),
         |u3 AS (SELECT l, unnest(generate_series(2, len(l))) AS i FROM t3),
         |p3 AS (SELECT l[i-1] AS a, l[i] AS b FROM u3),
         |m3 AS (SELECT a, b FROM (SELECT a, b, count(*) AS n FROM p3 GROUP BY a, b
         |        ORDER BY n DESC, a, b LIMIT 1)),
         |r3 AS (SELECT doc_id, raw, replace(s,
         |   ' ' || (SELECT a FROM m3) || '  ' || (SELECT b FROM m3) || ' ',
         |   ' ' || (SELECT a FROM m3) || chr(1) || (SELECT b FROM m3) || ' ') AS s FROM r2)
         |SELECT doc_id, raw AS n_tokens_raw,
         | CAST(CASE WHEN trim(s) = '' THEN 0
         |      ELSE len(string_split(trim(s), '  ')) END AS BIGINT) AS n_tokens_bpe
         |FROM r3 ORDER BY doc_id""".stripMargin,

    "sample_split" -> {
      val h = ch("CAST(doc_id AS VARCHAR)")
      s"""SELECT CASE WHEN ($h) % 100 < 80 THEN 'train'
         |            WHEN ($h) % 100 < 90 THEN 'val' ELSE 'test' END AS split,
         | count(*) AS n_docs,
         | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         | CAST(sum(doc_id) AS BIGINT) AS sum_id
         |FROM documents GROUP BY split ORDER BY split""".stripMargin
    },

    "scan_schema_evolution" ->
      s"""SELECT event_type, count(*) AS n,
         | CAST(count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_with_value,
         | CAST(sum(CAST(CASE WHEN event_id % 2 = 1 THEN value ELSE 0.0 END
         |   AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ddl_zorder" -> {
      val zExpr = (0 until 8).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH d AS (SELECT o_orderkey,
         |  CAST(o_custkey % 256 AS INTEGER) AS x,
         |  CAST((CAST(o_orderdate AS DATE) - DATE '1992-01-01') % 256 AS INTEGER) AS y
         | FROM orders),
         |k AS (SELECT *, $zExpr AS z, x * 256 + y AS lin FROM d),
         |nr AS (SELECT count(*) AS n_rows FROM k WHERE x < 32 AND y < 32),
         |zf AS (SELECT z >> 10 AS f, min(x) AS mnx, min(y) AS mny FROM k GROUP BY 1),
         |lf AS (SELECT lin >> 10 AS f, min(x) AS mnx, min(y) AS mny FROM k GROUP BY 1),
         |za AS (SELECT 'zorder' AS layout, count(*) AS files_total,
         |   CAST(count(CASE WHEN mnx < 32 AND mny < 32 THEN 1 END) AS BIGINT)
         |     AS files_touched
         | FROM zf),
         |la AS (SELECT 'linear' AS layout, count(*) AS files_total,
         |   CAST(count(CASE WHEN mnx < 32 AND mny < 32 THEN 1 END) AS BIGINT)
         |     AS files_touched
         | FROM lf)
         |SELECT layout, files_total, files_touched, n_rows
         |FROM (SELECT * FROM za UNION ALL SELECT * FROM la) CROSS JOIN nr
         |ORDER BY layout""".stripMargin
    },

    "ddl_scd2" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_id, event_type FROM events),
        |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |v AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version FROM c),
        |g AS (SELECT user_id, version, min(event_type) AS state,
        |    count(*) AS n_events, min(tsu) AS valid_from
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, state, n_events,
        | strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from_s,
        | strftime(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
        |   '%Y-%m-%d %H:%M:%S') AS valid_to_s
        |FROM g ORDER BY user_id, version""".stripMargin,

    "sink_upsert" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(event_id) AS BIGINT) AS sum_id,
        | CAST(sum(CAST(CASE WHEN event_id % 5 <> 0 AND event_id % 7 = 0
        |   THEN value * 2 ELSE value END AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "stream_dropdup_watermark" ->
      s"""SELECT event_type, count(*) AS n,
         | CAST(sum(event_id) AS BIGINT) AS sum_id,
         | ${decSum2("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "pipeline_expectations" ->
      """WITH a AS (SELECT count(*) AS n, count(DISTINCT event_id) AS n_eid_d,
        |   sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v_uid,
        |   sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS v_ts,
        |   sum(CASE WHEN event_type IN ('click','view','purchase','signup') THEN 0 ELSE 1 END) AS v_type,
        |   sum(CASE WHEN value < 0 OR value > 200 THEN 1 ELSE 0 END) AS v_range
        | FROM events),
        |r AS (
        | SELECT 'event_id_unique' AS rule, n AS n_checked, n - n_eid_d AS n_violations FROM a
        | UNION ALL SELECT 'event_type_in_domain', n, v_type FROM a
        | UNION ALL SELECT 'ts_not_null', n, v_ts FROM a
        | UNION ALL SELECT 'user_id_not_null', n, v_uid FROM a
        | UNION ALL SELECT 'value_in_0_200', n, v_range FROM a)
        |SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
        | CAST(n_violations AS BIGINT) AS n_violations,
        | CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM r ORDER BY rule""".stripMargin,

    "sample_temperature" -> {
      val h = s"((${ch("CAST(d.doc_id AS VARCHAR)")}) * 2654435761) % 1000000007"
      s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs,
         |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w FROM c),
         |mn AS (SELECT min(w) AS w_min FROM w),
         |r AS (SELECT lang, n_docs, w_min * 1000000 // w AS rate_ppm FROM w, mn),
         |k AS (SELECT d.lang, r.n_docs, r.rate_ppm, d.n_chars,
         |        CASE WHEN ($h) % 1000000 < r.rate_ppm THEN 1 ELSE 0 END AS kept
         |      FROM documents d JOIN r ON d.lang = r.lang)
         |SELECT lang, n_docs, rate_ppm,
         | CAST(sum(kept) AS BIGINT) AS n_sampled,
         | CAST(sum(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS sum_chars
         |FROM k GROUP BY 1, 2, 3 ORDER BY lang""".stripMargin
    },

    "sample_mixture" -> {
      val h = ch("CAST(doc_id AS VARCHAR)")
      s"""WITH w AS (SELECT source, CASE
         |   WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 100
         |   WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 50
         |   ELSE 10 END AS rate
         | FROM (SELECT DISTINCT source FROM documents))
         |SELECT d.source, CAST(w.rate AS BIGINT) AS rate,
         | count(*) AS n_sampled,
         | CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
         |FROM documents d JOIN w ON d.source = w.source
         |WHERE ($h) % 100 < w.rate
         |GROUP BY d.source, w.rate ORDER BY d.source""".stripMargin
    },

    "sample_hash" -> {
      val h = ch("CAST(event_id AS VARCHAR)")
      s"""SELECT event_type, count(*) AS n, ${decSum2("value")} AS sum_value
         |FROM events WHERE ($h) % 10 = 0
         |GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    // Pearson goodness-of-fit of the hash-coin mixture sample:
    // dev = 100·obs − n·rate, chi2_centi = dev² // (n·rate).
    "sample_mixture_chi2" -> {
      val h = ch("CAST(doc_id AS VARCHAR)")
      s"""WITH wts AS (SELECT 'src' || CAST(i AS VARCHAR) AS source,
         |    CASE WHEN i < 5 THEN 100 WHEN i < 10 THEN 50 ELSE 10 END AS rate
         |  FROM unnest(generate_series(0, 19)) AS g(i)),
         |d AS (SELECT d.source, wts.rate,
         |        CASE WHEN ($h) % 100 < wts.rate THEN 1 ELSE 0 END AS picked
         |      FROM documents d JOIN wts USING (source)),
         |agg AS (SELECT source, rate, count(*) AS n_total,
         |          CAST(sum(picked) AS BIGINT) AS n_sampled
         |        FROM d GROUP BY 1, 2)
         |SELECT source, CAST(rate AS BIGINT) AS rate, n_total, n_sampled,
         |  CAST(100 * n_sampled - n_total * rate AS BIGINT) AS dev,
         |  CAST(((100 * n_sampled - n_total * rate) * (100 * n_sampled - n_total * rate))
         |    // (n_total * rate) AS BIGINT) AS chi2_centi
         |FROM agg ORDER BY source""".stripMargin
    },

    // DSIR-shaped importance selection: hashed-unigram counts for the
    // target source vs whole corpus; integer probability-difference
    // weights w_f = a·T_s − b·T_t, score = Σ c·w_f (sums widen to
    // HUGEINT in DuckDB → cast back; values bounded inside int64).
    "sample_importance" -> {
      val h = ch("term")
      s"""WITH w AS (SELECT doc_id, source, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, source, unnest(w) AS term FROM w),
         |ft AS (SELECT doc_id, source, ($h) % 4096 AS f FROM t),
         |af AS (SELECT f, count(*) AS a FROM ft WHERE source = 'src18' GROUP BY f),
         |bf AS (SELECT f, count(*) AS b FROM ft GROUP BY f),
         |tt AS (SELECT count(*) AS t_t FROM ft WHERE source = 'src18'),
         |ts AS (SELECT count(*) AS t_s FROM ft),
         |wt AS (SELECT bf.f, COALESCE(af.a, 0) * ts.t_s - bf.b * tt.t_t AS wf
         |       FROM bf LEFT JOIN af USING (f) CROSS JOIN tt CROSS JOIN ts),
         |c AS (SELECT doc_id, f, count(*) AS c FROM ft WHERE source <> 'src18'
         |      GROUP BY doc_id, f)
         |SELECT c.doc_id, CAST(sum(c.c * wt.wf) AS BIGINT) AS score
         |FROM c JOIN wt USING (f) GROUP BY c.doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },

    "text_vocab" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, unnest(w) AS tok FROM w),
         |c AS (SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df FROM t GROUP BY tok)
         |SELECT tok, tf, df FROM c ORDER BY tf DESC, tok LIMIT 30""".stripMargin,

    // Corpus novelty curve: distinct doc bigrams vs their min-doc first
    // occurrence, rolled to ingest-order buckets of 50 docs.
    "text_ngram_novelty" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |bg0 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
         |          THEN list_transform(generate_series(1, len(w) - 1), i_ -> w[i_] || ' ' || w[i_+1])
         |          ELSE CAST([] AS VARCHAR[]) END) AS bg FROM w),
         |bg AS (SELECT DISTINCT doc_id, bg FROM bg0),
         |fst AS (SELECT bg, min(doc_id) AS first_doc FROM bg GROUP BY bg),
         |per AS (SELECT b.doc_id, count(*) AS n_bg,
         |          sum(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END) AS n_novel
         |        FROM bg b JOIN fst f ON b.bg = f.bg GROUP BY b.doc_id)
         |SELECT doc_id // 50 AS ingest_bucket, count(*) AS n_docs,
         | CAST(sum(n_bg) AS BIGINT) AS sum_bg,
         | CAST(sum(n_novel) AS BIGINT) AS sum_novel,
         | CAST((sum(n_novel) * 1000000) // sum(n_bg) AS BIGINT) AS novel_ppm
         |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // Hapax-legomena profile per source: exact integer lexical-richness
    // rollup over the per-(source,term) counts.
    "text_hapax" ->
      s"""WITH w AS (SELECT source, ${tok("text")} AS w FROM documents),
         |t AS (SELECT source, unnest(w) AS term FROM w),
         |tf AS (SELECT source, term, count(*) AS c FROM t GROUP BY 1, 2)
         |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
         | CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         | CAST(sum(c) AS BIGINT) AS n_tokens,
         | CAST((sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS hapax_ppm
         |FROM tf GROUP BY source ORDER BY source""".stripMargin,

    "text_pii_scrub" -> {
      val h = ch("regexp_replace(text, '[0-9]+', '<NUM>', 'g')")
      s"""SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_redacted,
         | $h AS scrub_hash
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "project_map_props" ->
      """SELECT event_id,
        | CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        | CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
        |FROM events WHERE props IS NOT NULL ORDER BY event_id""".stripMargin,

    "project_json_extract" ->
      """SELECT event_type, count(k) AS n_k, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_embedding_centroid" ->
      s"""WITH q AS (SELECT label, ${quant("embedding")} AS qv FROM embeddings),
         |e AS (SELECT label, i_ - 1 AS pos, qv[i_] AS v
         |      FROM q, LATERAL (SELECT unnest(generate_series(1, len(qv))) AS i_))
         |SELECT label, pos, CAST(sum(v) AS BIGINT) AS sum_q, count(*) AS n
         |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "sql_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    // staged per-doc payload files must round-trip bytes exactly
    "sql_recursive_cte" ->
      """WITH RECURSIVE u0 AS (SELECT DISTINCT user_id FROM events),
        |anc AS (
        |  SELECT user_id AS u, user_id // 2 AS a FROM u0 WHERE user_id // 2 >= 1
        |  UNION ALL
        |  SELECT u, a // 2 FROM anc WHERE a // 2 >= 1
        |)
        |SELECT u AS user_id, count(*) AS n_ancestors, CAST(sum(a) AS BIGINT) AS sum_anc
        |FROM anc GROUP BY u ORDER BY user_id""".stripMargin,

    "scan_text" ->
      "SELECT event_id, event_type, user_id FROM events ORDER BY event_id",

    "scan_binaryfile" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS digest
        |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin,

    "window_ohlc" ->
      s"""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS tsu, value,
         |             strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_s
         |           FROM events),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY hour_s ORDER BY tsu, event_id) AS ra,
         |        row_number() OVER (PARTITION BY hour_s ORDER BY tsu DESC, event_id DESC) AS rd
         |      FROM e)
         |SELECT hour_s,
         | max(CASE WHEN ra = 1 THEN value END) AS open,
         | max(value) AS high, min(value) AS low,
         | max(CASE WHEN rd = 1 THEN value END) AS close,
         | ${decSum2("value")} AS volume, count(*) AS n
         |FROM r GROUP BY hour_s ORDER BY hour_s""".stripMargin,

    "window_moving_avg" ->
      """SELECT event_id, user_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS mavg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "window_cume" ->
      """SELECT event_id, user_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "multimodal_frames" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS frame_idx,
        | CAST(ascii(substring(text, i, 1)) AS BIGINT) AS sample
        |FROM (SELECT doc_id, text, unnest(generate_series(1, length(text), 7)) AS i
        |      FROM documents WHERE length(text) > 0)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // Shot census over the every-7th-byte frame stream: cut where
    // consecutive samples differ by > 10, gaps-and-islands per clip.
    // INVARIANT (shared with multimodal_frames): the oracle samples
    // every 7th CHARACTER while Multimodal.frameSample samples every
    // 7th UTF-8 BYTE — identical only because documents.text is
    // ASCII-only (verified at all sf fixtures; pinned loudly by
    // MultimodalSpec's ascii-fixture assertion so a regenerated
    // non-ASCII fixture fails there, not as a silent hash mismatch).
    "multimodal_shots" ->
      """WITH fr AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS frame_idx,
        |    CAST(ascii(substring(text, i, 1)) AS BIGINT) AS sample
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text), 7)) AS i
        |        FROM documents WHERE length(text) > 0)),
        |c AS (SELECT doc_id, frame_idx, sample,
        |    CASE WHEN lag(sample) OVER w IS NULL
        |      OR abs(sample - lag(sample) OVER w) > 10 THEN 1 ELSE 0 END AS cut
        |  FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
        |sh AS (SELECT doc_id,
        |    sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS shot
        |  FROM c),
        |g AS (SELECT doc_id, shot, count(*) AS len FROM sh GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_frames,
        |  CAST(count(*) AS BIGINT) AS n_shots,
        |  CAST(max(len) AS BIGINT) AS longest_shot
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "join_agg_revenue" ->
      s"""SELECT r_name, n_name, count(*) AS n_orders, ${decSum2("o_totalprice")} AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "pipeline_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CAST(len(${tok("text")}) AS BIGINT) AS n_tokens FROM documents),
         |o AS (SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off FROM d)
         |SELECT doc_id, source, n_tokens,
         | start_off // 512 AS seq_id,
         | start_off % 512 AS seq_off,
         | (start_off % 512 + n_tokens > 512) AS spans
         |FROM o ORDER BY doc_id""".stripMargin,

    // Overlapping RAG chunk map: starts at multiples of stride=24 while
    // they still extend the previous 32-token window (see the Spark-side
    // scaladoc for the containment rule); chunk_id = start // stride.
    "pipeline_chunk_overlap" ->
      s"""WITH d AS (SELECT doc_id, CAST(len(${tok("text")}) AS BIGINT) AS n_tokens
         |           FROM documents),
         |s AS (SELECT doc_id, n_tokens, unnest(generate_series(0, n_tokens - 1, 24)) AS start
         |      FROM d WHERE n_tokens > 0)
         |SELECT doc_id, start // 24 AS chunk_id, start,
         | least(start + 32, n_tokens) AS "end",
         | least(start + 32, n_tokens) - start AS n_chunk_tokens
         |FROM s WHERE start = 0 OR start < n_tokens - 8
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "sketch_heavy_hitters" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY user_id HAVING count(*) >= 80 ORDER BY user_id""".stripMargin,

    // merged per-batch sketches == one-shot sketch (vector-add identity),
    // so the streaming form answers the same exact question
    "stream_heavy_hitters" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY user_id HAVING count(*) >= 80 ORDER BY user_id""".stripMargin,

    "join_bloom_prefilter" ->
      s"""SELECT l_linestatus, count(*) AS n, ${decSum2("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "join_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
        |u AS (
        | SELECT user_id AS k, tsu AS ts, event_id AS tie, 0 AS tag,
        |        tsu AS r_ts, event_id AS r_tie, value AS r_value
        | FROM e WHERE event_type = 'click'
        | UNION ALL
        | SELECT user_id, tsu, event_id, 1, NULL, NULL, NULL
        | FROM e WHERE event_type = 'purchase'),
        |win AS (SELECT *,
        |  last_value(r_ts IGNORE NULLS) OVER w AS a_ts,
        |  last_value(r_tie IGNORE NULLS) OVER w AS a_tie,
        |  last_value(r_value IGNORE NULLS) OVER w AS a_value
        | FROM u WINDOW w AS (PARTITION BY k ORDER BY ts, tag, tie
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tol AS (SELECT *,
        |  (a_ts IS NOT NULL AND ts - a_ts <= INTERVAL 30 MINUTE) AS ok
        | FROM win WHERE tag = 1)
        |SELECT tie AS event_id, k AS user_id,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        | CASE WHEN ok THEN a_tie END AS click_id,
        | CASE WHEN ok THEN strftime(a_ts, '%Y-%m-%d %H:%M:%S') END AS click_ts,
        | CASE WHEN ok THEN a_value END AS click_value
        |FROM tol ORDER BY event_id""".stripMargin,

    "join_asof" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
        |u AS (
        | SELECT user_id AS k, tsu AS ts, event_id AS tie, 0 AS tag,
        |        tsu AS r_ts, event_id AS r_tie, value AS r_value
        | FROM e WHERE event_type = 'click'
        | UNION ALL
        | SELECT user_id, tsu, event_id, 1, NULL, NULL, NULL
        | FROM e WHERE event_type = 'purchase'),
        |win AS (SELECT *,
        |  last_value(r_ts IGNORE NULLS) OVER w AS a_ts,
        |  last_value(r_tie IGNORE NULLS) OVER w AS a_tie,
        |  last_value(r_value IGNORE NULLS) OVER w AS a_value
        | FROM u WINDOW w AS (PARTITION BY k ORDER BY ts, tag, tie
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT tie AS event_id, k AS user_id,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        | a_tie AS click_id,
        | strftime(a_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        | a_value AS click_value
        |FROM win WHERE tag = 1 ORDER BY event_id""".stripMargin,

    // forward: earliest click at/after each purchase. Purchases sort
    // BEFORE equal-ts clicks (tag 0 vs 1) so an at-probe-time click is in
    // the CURRENT..FOLLOWING window; first_value = smallest tie among
    // equal ts — the native operator's forward tie rule.
    "join_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
        |u AS (
        | SELECT user_id AS k, tsu AS ts, event_id AS tie, 1 AS tag,
        |        tsu AS r_ts, event_id AS r_tie, value AS r_value
        | FROM e WHERE event_type = 'click'
        | UNION ALL
        | SELECT user_id, tsu, event_id, 0, NULL, NULL, NULL
        | FROM e WHERE event_type = 'purchase'),
        |win AS (SELECT *,
        |  first_value(r_ts IGNORE NULLS) OVER w AS a_ts,
        |  first_value(r_tie IGNORE NULLS) OVER w AS a_tie,
        |  first_value(r_value IGNORE NULLS) OVER w AS a_value
        | FROM u WINDOW w AS (PARTITION BY k ORDER BY ts, tag, tie
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT tie AS event_id, k AS user_id,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        | a_tie AS click_id,
        | strftime(a_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        | a_value AS click_value
        |FROM win WHERE tag = 0 ORDER BY event_id""".stripMargin,

    // nearest: run the backward window (clicks before equal-ts purchases,
    // last_value = largest tie) AND the forward window (purchases before
    // equal-ts clicks, first_value = smallest tie), then pick the smaller
    // timestamp gap; an exact tie prefers backward — pandas' rule and the
    // native exec's.
    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events),
        |u AS (
        | SELECT user_id AS k, tsu AS ts, event_id AS tie, 0 AS tagb, 1 AS tagf,
        |        tsu AS r_ts, event_id AS r_tie, value AS r_value
        | FROM e WHERE event_type = 'click'
        | UNION ALL
        | SELECT user_id, tsu, event_id, 1, 0, NULL, NULL, NULL
        | FROM e WHERE event_type = 'purchase'),
        |win AS (SELECT *,
        |  last_value(r_ts IGNORE NULLS) OVER wb AS b_ts,
        |  last_value(r_tie IGNORE NULLS) OVER wb AS b_tie,
        |  last_value(r_value IGNORE NULLS) OVER wb AS b_value,
        |  first_value(r_ts IGNORE NULLS) OVER wf AS f_ts,
        |  first_value(r_tie IGNORE NULLS) OVER wf AS f_tie,
        |  first_value(r_value IGNORE NULLS) OVER wf AS f_value
        | FROM u WINDOW
        |  wb AS (PARTITION BY k ORDER BY ts, tagb, tie
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY k ORDER BY ts, tagf, tie
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |sel AS (SELECT *, CASE
        |   WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
        |   WHEN f_ts IS NULL THEN 'b' WHEN b_ts IS NULL THEN 'f'
        |   WHEN ts - b_ts <= f_ts - ts THEN 'b' ELSE 'f' END AS side
        | FROM win WHERE tagb = 1)
        |SELECT tie AS event_id, k AS user_id,
        | strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        | CASE side WHEN 'b' THEN b_tie WHEN 'f' THEN f_tie END AS click_id,
        | strftime(CASE side WHEN 'b' THEN b_ts WHEN 'f' THEN f_ts END,
        |   '%Y-%m-%d %H:%M:%S') AS click_ts,
        | CASE side WHEN 'b' THEN b_value WHEN 'f' THEN f_value END AS click_value
        |FROM sel ORDER BY event_id""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders)
        |WHERE rk <= 10 ORDER BY o_orderpriority, rk""".stripMargin,

    "agg_distinct" ->
      s"""SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n,
         | ${decSum2("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${decSum2("l_quantity")} AS sum_qty,
         | ${decSum2("l_extendedprice")} AS sum_base_price,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |   (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
         | ${decSum2("l_quantity")} / count(*) AS avg_qty,
         | count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "graph_degree" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2),
        |bi AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
        |deg AS (SELECT src AS node, count(*) AS degree FROM bi GROUP BY 1)
        |SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree ORDER BY degree""".stripMargin,

    "graph_triangles" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2),
        |bi AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
        |w AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM e e1 JOIN e e2 ON e1.dst = e2.src)
        |SELECT
        | (SELECT count(*) FROM (SELECT DISTINCT src FROM bi)) AS n_nodes,
        | (SELECT count(*) FROM e) AS n_edges,
        | (SELECT count(*) FROM w JOIN e e3 ON w.a = e3.src AND w.c = e3.dst) AS n_triangles""".stripMargin,

    // Eigenvector centrality: 8 unrolled power steps, each a
    // neighbour-sum + max-rescale to 1e6 (floor division on
    // non-negative integers == Spark div).
    "graph_eigenvector" -> {
      def it(i: Int): String =
        s"""y$i AS (SELECT bi.dst AS node, sum(x${i - 1}.r) AS y FROM bi
           |       JOIN x${i - 1} ON bi.src = x${i - 1}.node GROUP BY 1),
           |m$i AS (SELECT max(y) AS m FROM y$i),
           |x$i AS MATERIALIZED (SELECT n0.node,
           |         (1000000 * COALESCE(y$i.y, 0)) // m$i.m AS r
           |       FROM n0 LEFT JOIN y$i ON n0.node = y$i.node, m$i)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |n0 AS (SELECT DISTINCT src AS node FROM bi),
         |x0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n0),
         |${(1 to 6).map(it).mkString(",\n")}
         |SELECT node, CAST(r AS BIGINT) AS eig_ppm FROM x6
         |ORDER BY eig_ppm DESC, node LIMIT 20""".stripMargin
    },

    "graph_pagerank" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2),
        |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src AS node, count(*) AS d FROM bi GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT bi.dst AS node, sum(r0.r // deg.d) AS s FROM bi
        |       JOIN r0 ON bi.src = r0.node JOIN deg ON bi.src = deg.node GROUP BY 1),
        |r1 AS (SELECT deg.node, 150000 + (850 * COALESCE(c1.s, 0)) // 1000 AS r
        |       FROM deg LEFT JOIN c1 ON deg.node = c1.node),
        |c2 AS (SELECT bi.dst AS node, sum(r1.r // deg.d) AS s FROM bi
        |       JOIN r1 ON bi.src = r1.node JOIN deg ON bi.src = deg.node GROUP BY 1),
        |r2 AS (SELECT deg.node, 150000 + (850 * COALESCE(c2.s, 0)) // 1000 AS r
        |       FROM deg LEFT JOIN c2 ON deg.node = c2.node),
        |c3 AS (SELECT bi.dst AS node, sum(r2.r // deg.d) AS s FROM bi
        |       JOIN r2 ON bi.src = r2.node JOIN deg ON bi.src = deg.node GROUP BY 1),
        |r3 AS (SELECT deg.node, 150000 + (850 * COALESCE(c3.s, 0)) // 1000 AS r
        |       FROM deg LEFT JOIN c3 ON deg.node = c3.node)
        |SELECT node, CAST(r AS BIGINT) AS rank FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin,

    // Weighted PageRank: contribution (r·w) // sw per directed edge —
    // the unrolled mirror of Graph.pageRankWeighted (floor division on
    // non-negative integers matches Spark's div).
    "graph_pagerank_weighted" -> {
      def it(i: Int): String =
        s"""c$i AS (SELECT bi.dst AS node, sum((r${i - 1}.r * bi.w) // sw.sw) AS s FROM bi
           |       JOIN r${i - 1} ON bi.src = r${i - 1}.node JOIN sw ON bi.src = sw.node GROUP BY 1),
           |r$i AS (SELECT sw.node, 150000 + (850 * COALESCE(c$i.s, 0)) // 1000 AS r
           |       FROM sw LEFT JOIN c$i ON sw.node = c$i.node)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst, count(*) AS w FROM os a
         |       JOIN os b ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2 HAVING count(*) >= 2),
         |bi AS (SELECT src, dst, w FROM e0 UNION ALL SELECT dst AS src, src AS dst, w FROM e0),
         |sw AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS sw FROM bi GROUP BY 1),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM sw),
         |${it(1)},
         |${it(2)},
         |${it(3)}
         |SELECT node, CAST(r AS BIGINT) AS rank FROM r3
         |ORDER BY rank DESC, node LIMIT 20""".stripMargin
    },

    "graph_pagerank_delta" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2),
        |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src AS node, count(*) AS d FROM bi GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT bi.dst AS node, sum(r0.r // deg.d) AS s FROM bi
        |       JOIN r0 ON bi.src = r0.node JOIN deg ON bi.src = deg.node GROUP BY 1),
        |r1 AS (SELECT deg.node, 150000 + (850 * COALESCE(c1.s, 0)) // 1000 AS r
        |       FROM deg LEFT JOIN c1 ON deg.node = c1.node),
        |c2 AS (SELECT bi.dst AS node, sum(r1.r // deg.d) AS s FROM bi
        |       JOIN r1 ON bi.src = r1.node JOIN deg ON bi.src = deg.node GROUP BY 1),
        |r2 AS (SELECT deg.node, 150000 + (850 * COALESCE(c2.s, 0)) // 1000 AS r
        |       FROM deg LEFT JOIN c2 ON deg.node = c2.node),
        |c3 AS (SELECT bi.dst AS node, sum(r2.r // deg.d) AS s FROM bi
        |       JOIN r2 ON bi.src = r2.node JOIN deg ON bi.src = deg.node GROUP BY 1),
        |r3 AS (SELECT deg.node, 150000 + (850 * COALESCE(c3.s, 0)) // 1000 AS r
        |       FROM deg LEFT JOIN c3 ON deg.node = c3.node),
        |d AS (
        | SELECT 1 AS iter, max(abs(r1.r - r0.r)) AS md FROM r1 JOIN r0 ON r1.node = r0.node
        | UNION ALL
        | SELECT 2, max(abs(r2.r - r1.r)) FROM r2 JOIN r1 ON r2.node = r1.node
        | UNION ALL
        | SELECT 3, max(abs(r3.r - r2.r)) FROM r3 JOIN r2 ON r3.node = r2.node)
        |SELECT CAST(iter AS BIGINT) AS iter, CAST(md AS BIGINT) AS max_delta
        |FROM d ORDER BY iter""".stripMargin,

    // Exact fixpoint form of hash-min CC: a node's component id is the
    // minimum label over every node that can reach it — the recursive
    // CTE enumerates (node, reachable-label) pairs to saturation (labels
    // only shrink, pair space is finite, UNION dedups → terminates), then
    // min-reduces. The Spark side's pointer-jumping iteration converges
    // to the same unique fixpoint.
    "graph_components" ->
      """WITH RECURSIVE os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |r(node, label) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT e.dst, r.label FROM r JOIN e ON r.node = e.src),
        |comp AS (SELECT node, min(label) AS comp_id FROM r GROUP BY node)
        |SELECT comp_id, count(*) AS n_nodes FROM comp GROUP BY comp_id
        |ORDER BY n_nodes DESC, comp_id""".stripMargin,

    // Local clustering coefficients: id-oriented triangle enumeration
    // (a<b<c triple join — the count per corner is orientation-invariant,
    // so it matches Spark's degree-oriented adjacency-intersect form),
    // then cc_ppm by exact integer floor division.
    "graph_clustering" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |d AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
        |t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |      FROM e0 e1 JOIN e0 e2 ON e2.src = e1.dst
        |      JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |corn AS (SELECT a AS node FROM t UNION ALL SELECT b AS node FROM t
        |         UNION ALL SELECT c AS node FROM t),
        |tr AS (SELECT node, count(*) AS tri FROM corn GROUP BY 1)
        |SELECT d.node, d.d, CAST(COALESCE(tr.tri, 0) AS BIGINT) AS tri,
        |  CAST((2 * COALESCE(tr.tri, 0) * 1000000) // (d.d * (d.d - 1)) AS BIGINT) AS cc_ppm
        |FROM d LEFT JOIN tr ON d.node = tr.node WHERE d.d >= 2
        |ORDER BY cc_ppm DESC, d.node LIMIT 20""".stripMargin,

    // 3-core peel ladder, 4 unrolled rounds — the pinned-iteration mirror
    // of Graph.kCore (each round: degree over remaining, keep d>=3, keep
    // edges with both endpoints kept). Every CTE is MATERIALIZED: each
    // b_i is referenced twice downstream, so inlining re-evaluates the
    // whole chain 2^rounds times (measured 114 s plain vs 0.4 s
    // materialized at sf0.01, identical rows) — r10's gate-timeout cause.
    "graph_kcore" -> {
      def round(i: Int): String =
        s"""k${i - 1} AS MATERIALIZED (SELECT src AS node FROM b${i - 1} GROUP BY 1 HAVING count(*) >= 3),
           |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
           |      JOIN k${i - 1} a ON e.src = a.node JOIN k${i - 1} b ON e.dst = b.node),
           |b$i AS MATERIALIZED (SELECT src, dst FROM e$i UNION ALL SELECT dst AS src, src AS dst FROM e$i)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS MATERIALIZED (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |b0 AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)}
         |SELECT src AS node, count(*) AS core_deg FROM b4 GROUP BY 1 ORDER BY node""".stripMargin
    },

    // TRUE 3-core: recursive-CTE peel run to the fixpoint. The recursive
    // term filters the previous iteration's edge set to edges whose BOTH
    // endpoints still have degree >= 3, and only recurses while some node
    // is below 3 (so the edge set strictly shrinks and recursion
    // terminates). The final guard handles the empty-core case: if the
    // last recorded level still has a sub-3 node, the peel died out and
    // the true core is empty.
    "graph_kcore_full" ->
      """WITH RECURSIVE os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |peel(src, dst, it) AS (
        |  SELECT src, dst, 0 FROM e0
        |  UNION ALL
        |  SELECT f.src, f.dst, f.it + 1 FROM (
        |    SELECT p.src, p.dst, p.it FROM peel p
        |    JOIN (SELECT node FROM (SELECT src AS node FROM peel UNION ALL SELECT dst AS node FROM peel)
        |          GROUP BY node HAVING count(*) >= 3) ka ON p.src = ka.node
        |    JOIN (SELECT node FROM (SELECT src AS node FROM peel UNION ALL SELECT dst AS node FROM peel)
        |          GROUP BY node HAVING count(*) >= 3) kb ON p.dst = kb.node
        |  ) f
        |  WHERE (SELECT count(*) FROM (
        |          SELECT node FROM (SELECT src AS node FROM peel UNION ALL SELECT dst AS node FROM peel)
        |          GROUP BY node HAVING count(*) < 3) u) > 0
        |),
        |last AS (SELECT src, dst FROM peel WHERE it = (SELECT max(it) FROM peel)),
        |bl AS (SELECT src, dst FROM last UNION ALL SELECT dst AS src, src AS dst FROM last),
        |degs AS (SELECT src AS node, count(*) AS core_deg FROM bl GROUP BY 1),
        |ok AS (SELECT CASE WHEN min(core_deg) >= 3 THEN 1 ELSE 0 END AS v FROM degs)
        |SELECT node, core_deg FROM degs WHERE (SELECT v FROM ok) = 1 ORDER BY node""".stripMargin,

    // Degree assortativity: exact BIGINT moment sums over the directed
    // endpoint-degree pairs; float only in the final rounded ratio (the
    // agg_corr float policy).
    "graph_assortativity" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |d AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
        |p AS (SELECT dx.d AS dx, dy.d AS dy
        |      FROM e JOIN d dx ON e.src = dx.node JOIN d dy ON e.dst = dy.node),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
        |        CAST(sum(dx * dy) AS BIGINT) AS sxy,
        |        CAST(sum(dx * dx) AS BIGINT) AS sxx,
        |        CAST(sum(dy * dy) AS BIGINT) AS syy FROM p)
        |SELECT n, round((n * sxy - sx * sy) /
        |  (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS assortativity
        |FROM s""".stripMargin,

    // BFS hop-distance histogram from the min node: 4 unrolled synchronous
    // relaxation rounds (min-semilattice ladder — the CTE mirror of
    // Graph.bfsDistances). least() skips NULLs in both engines.
    "graph_bfs" -> {
      def round(i: Int): String =
        s"""r$i AS (SELECT e.dst AS node, min(d.dist + 1) AS nd FROM e
           |      JOIN d${i - 1} d ON e.src = d.node WHERE d.dist IS NOT NULL GROUP BY 1),
           |d$i AS (SELECT d.node, least(d.dist, r.nd) AS dist
           |      FROM d${i - 1} d LEFT JOIN r$i r ON d.node = r.node)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |n0 AS (SELECT DISTINCT src AS node FROM e),
         |rt AS (SELECT min(node) AS root FROM n0),
         |d0 AS (SELECT node, CASE WHEN node = (SELECT root FROM rt)
         |         THEN CAST(0 AS BIGINT) END AS dist FROM n0),
         |${round(1)},
         |${round(2)},
         |${round(3)},
         |${round(4)}
         |SELECT dist, count(*) AS n_nodes FROM d4 WHERE dist IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Resource-Allocation link prediction: wedges u-w-v over the
    // bidirectional adjacency, RA = sum of 1e6 // deg(w) over common
    // neighbours, existing edges anti-joined out, top-20.
    "graph_link_prediction" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src AS w, count(*) AS d FROM bi GROUP BY 1),
        |sc AS (SELECT x.dst AS u, y.dst AS v,
        |         CAST(count(*) AS BIGINT) AS common,
        |         CAST(sum(1000000 // deg.d) AS BIGINT) AS ra_ppm
        |       FROM bi x JOIN bi y ON x.src = y.src AND x.dst < y.dst
        |       JOIN deg ON deg.w = x.src
        |       GROUP BY 1, 2)
        |SELECT u, v, common, ra_ppm FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.src = sc.u AND e0.dst = sc.v)
        |ORDER BY ra_ppm DESC, common DESC, u, v LIMIT 20""".stripMargin,

    // Neighbourhood-Jaccard link prediction: same wedge candidates,
    // J_ppm = 1e6*common // (du + dv - common), adjacency anti-joined.
    "graph_neighbor_jaccard" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
        |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src AS node, count(*) AS d FROM bi GROUP BY 1),
        |cm AS (SELECT x.dst AS u, y.dst AS v, CAST(count(*) AS BIGINT) AS common
        |       FROM bi x JOIN bi y ON x.src = y.src AND x.dst < y.dst
        |       GROUP BY 1, 2),
        |sc AS (SELECT cm.u, cm.v, cm.common,
        |         CAST((1000000 * cm.common) // (du.d + dv.d - cm.common) AS BIGINT) AS jac_ppm
        |       FROM cm JOIN deg du ON du.node = cm.u JOIN deg dv ON dv.node = cm.v)
        |SELECT u, v, common, jac_ppm FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.src = sc.u AND e0.dst = sc.v)
        |ORDER BY jac_ppm DESC, common DESC, u, v LIMIT 20""".stripMargin,

    // 12-truss peel unrolled to 8 rounds — past the fixture's measured
    // convergence depth (5 at sf0.01, 3 at sf0.1); rounds after the
    // edge set stabilises recompute identical supports and drop
    // nothing, so the static unroll equals the engine's count-detected
    // fixpoint. Per round: each triangle enumerated ONCE via the
    // id-oriented wedge join, its 3 edges unioned out, support counted,
    // then the k-2 filter.
    "graph_ktruss" -> {
      def round(i: Int): String =
        s"""t$i AS (SELECT ab.src AS a, ab.dst AS b, ac.dst AS c
           |      FROM e$i ab JOIN e$i ac ON ab.src = ac.src AND ab.dst < ac.dst
           |      JOIN e$i bc ON bc.src = ab.dst AND bc.dst = ac.dst),
           |s$i AS (SELECT src, dst, count(*) AS sup FROM (
           |        SELECT a AS src, b AS dst FROM t$i
           |        UNION ALL SELECT a, c FROM t$i
           |        UNION ALL SELECT b, c FROM t$i) GROUP BY 1, 2),
           |e${i + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e$i e
           |      LEFT JOIN s$i s ON e.src = s.src AND e.dst = s.dst
           |      WHERE coalesce(s.sup, 0) >= 10)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e1 AS (SELECT DISTINCT a.s AS src, b.s AS dst
         |       FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s),
         |${(1 to 8).map(round).mkString(",\n")}
         |SELECT node, CAST(count(*) AS BIGINT) AS truss_deg
         |FROM (SELECT src AS node FROM e9 UNION ALL SELECT dst FROM e9)
         |GROUP BY 1 ORDER BY node""".stripMargin
    },

    // Weighted SSSP to the Bellman-Ford fixpoint: the relaxation ladder
    // unrolled in MATERIALIZED CTEs (each round reads its predecessor
    // twice) to 12 rounds — beyond the fixture's weighted diameter at
    // every sf (measured: the Spark convergence detector exits well
    // inside it), and rounds past the fixpoint are exact no-ops since
    // min/least are idempotent. Unreachable nodes keep NULL throughout.
    "graph_sssp" -> {
      def round(i: Int): String =
        s"""r$i AS (SELECT bi.dst AS node, min(d.dist + bi.w) AS nd FROM bi
           |      JOIN d${i - 1} d ON bi.src = d.node WHERE d.dist IS NOT NULL GROUP BY 1),
           |d$i AS MATERIALIZED (SELECT d.node, least(d.dist, r.nd) AS dist
           |      FROM d${i - 1} d LEFT JOIN r$i r ON d.node = r.node)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst, 1 + 1000 // count(*) AS w
         |       FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |bi AS (SELECT src, dst, w FROM e0
         |       UNION ALL SELECT dst AS src, src AS dst, w FROM e0),
         |n0 AS (SELECT DISTINCT src AS node FROM bi),
         |rt AS (SELECT min(node) AS root FROM n0),
         |d0 AS MATERIALIZED (SELECT node, CASE WHEN node = (SELECT root FROM rt)
         |         THEN CAST(0 AS BIGINT) END AS dist FROM n0),
         |${(1 to 12).map(round).mkString(",\n")}
         |SELECT node, CAST(dist AS BIGINT) AS dist FROM d12 ORDER BY node""".stripMargin
    },

    // Exact BFS to frontier exhaustion: 16-round min-relax ladder
    // (MATERIALIZED per level) — past the fixture's measured diameter
    // (13 at sf0.01, 9 at sf0.1, 3 at sf0.001), so rounds beyond the
    // frontier's death are exact no-ops (least/min idempotent) and the
    // unroll equals the engine's convergence-detected fixpoint. The r10
    // RECURSIVE (node,dist) UNION walk bounded depth by |V| and kept
    // re-expanding cycle paths for hundreds of dead levels (60 s; this
    // form: <1 s). Unreachable nodes keep NULL throughout.
    "graph_bfs_full" ->
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
         |rt AS (SELECT min(node) AS root FROM n0),
         |${bfsLadder("a", "SELECT root FROM rt", 16)}
         |SELECT node, dist FROM da16 ORDER BY node""".stripMargin,

    // Double-sweep diameter bound: 16-round BFS ladder from the min node,
    // re-root at the farthest reached node (tie min id), ladder again; the
    // second sweep's eccentricity is the bound. Same eccentricity-capped
    // unroll as graph_bfs_full (16 > 13+1, the max measured diameter over
    // all sfs), replacing r10's |V|-bounded RECURSIVE walks (350 s → <1 s,
    // identical output — the r10 gate-timeout headline).
    "graph_diameter" ->
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
         |rt AS (SELECT min(node) AS root FROM n0),
         |${bfsLadder("a", "SELECT root FROM rt", 16)},
         |u AS (SELECT node AS root, dist AS ecc0 FROM da16 WHERE dist IS NOT NULL
         |      ORDER BY dist DESC, node LIMIT 1),
         |${bfsLadder("b", "SELECT root FROM u", 16)},
         |f AS (SELECT node AS antipode, dist AS dlb FROM db16 WHERE dist IS NOT NULL
         |      ORDER BY dist DESC, node LIMIT 1)
         |SELECT (SELECT root FROM rt) AS start_node,
         |  CAST((SELECT ecc0 FROM u) AS BIGINT) AS first_sweep_ecc,
         |  (SELECT root FROM u) AS peripheral,
         |  (SELECT antipode FROM f) AS antipode,
         |  CAST((SELECT dlb FROM f) AS BIGINT) AS diameter_lb,
         |  (SELECT count(*) FROM db16 WHERE dist IS NOT NULL) AS n_reached""".stripMargin,

    // SCC census of the functional part-key graph: ground truth by
    // transitive closure — u,v share an SCC iff mutually reachable; a node
    // is cyclic iff it reaches itself. The engine computes the same census
    // by trim-to-fixpoint + cycle-CC (no closure materialisation).
    "graph_scc" ->
      """WITH RECURSIVE n0 AS (SELECT DISTINCT l_partkey % 512 AS v FROM lineitem),
        |e AS (SELECT v AS src, (v * 30 + 7) % 512 AS dst FROM n0),
        |verts AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
        |),
        |mut AS (SELECT a.src AS u, a.dst AS v FROM reach a
        |        JOIN reach b ON a.src = b.dst AND a.dst = b.src),
        |cyc AS (SELECT DISTINCT src AS node FROM reach WHERE src = dst),
        |sid AS (SELECT vt.node, least(vt.node, coalesce(min(m.u), vt.node)) AS scc_id
        |        FROM verts vt LEFT JOIN mut m ON m.v = vt.node GROUP BY vt.node)
        |SELECT s.scc_id, CAST(count(*) AS BIGINT) AS n_nodes,
        |  bool_or(c.node IS NOT NULL) AS cyclic
        |FROM sid s LEFT JOIN cyc c ON s.node = c.node
        |GROUP BY s.scc_id ORDER BY s.scc_id""".stripMargin,

    // HITS unrolled: 2 (auth, hub) half-iteration pairs on the DIRECTED
    // thresholded co-part graph, each half = one join-sum + an L1
    // renormalisation to the 1e6 budget via scalar-subquery floor
    // division (all values non-negative, so // ≡ Spark's div).
    "graph_hits" -> {
      def half(prev: String, raw: String, out: String, joinCol: String,
               grpCol: String): String =
        s"""$raw AS (SELECT n.node, COALESCE(x.r, 0) AS raw FROM nodes n LEFT JOIN
           |    (SELECT e0.$grpCol AS node, sum(p.s) AS r FROM e0
           |     JOIN $prev p ON e0.$joinCol = p.node GROUP BY 1) x ON n.node = x.node),
           |$out AS (SELECT node, (1000000 * raw) // greatest((SELECT sum(raw) FROM $raw), 1) AS s FROM $raw)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
         |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS s FROM nodes),
         |${half("h0", "ra1", "a1", "src", "dst")},
         |${half("a1", "rh1", "h1", "dst", "src")},
         |${half("h1", "ra2", "a2", "src", "dst")},
         |${half("a2", "rh2", "h2", "dst", "src")}
         |SELECT a2.node, CAST(a2.s AS BIGINT) AS auth, CAST(h2.s AS BIGINT) AS hub
         |FROM a2 JOIN h2 ON a2.node = h2.node
         |ORDER BY auth DESC, a2.node LIMIT 20""".stripMargin
    },

    // Personalized PageRank unrolled: teleport mass lands only on the
    // seed set {node % 10 = 0}, split by floor division; otherwise the
    // exact pagerank recurrence (r div d contributions, 850/1000 damp).
    "graph_ppr" -> {
      def it(i: Int): String =
        s"""c$i AS (SELECT bi.dst AS node, sum(r${i - 1}.r // deg.d) AS s FROM bi
           |       JOIN r${i - 1} ON bi.src = r${i - 1}.node JOIN deg ON bi.src = deg.node GROUP BY 1),
           |r$i AS (SELECT t.node, t.tele + (850 * COALESCE(c$i.s, 0)) // 1000 AS r
           |       FROM tele t LEFT JOIN c$i ON t.node = c$i.node)""".stripMargin
      s"""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s GROUP BY 1, 2),
         |bi AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src AS node, count(*) AS d FROM bi GROUP BY 1),
         |sc AS (SELECT count(*) AS nn, sum(CASE WHEN node % 10 = 0 THEN 1 ELSE 0 END) AS ns FROM deg),
         |tele AS (SELECT node, CASE WHEN node % 10 = 0
         |           THEN (150000 * (SELECT nn FROM sc)) // (SELECT ns FROM sc)
         |           ELSE 0 END AS tele FROM deg),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
         |${it(1)},
         |${it(2)},
         |${it(3)}
         |SELECT node, CAST(r AS BIGINT) AS rank FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin
    },

    // Content-defined chunking census: boundary where the trailing-8-char
    // polynomial hash % 64 = 0 (interior positions only), chunks sliced
    // between boundaries, identity = the same char hash. Mirrors
    // Dedup.cdcChunkStats exactly (min-length per hash under collision).
    "dedup_cdc_chunks" -> cdcChunksSql,

    // Cross-source shingle-overlap matrix: distinct (source, shingle)
    // pass, then bounded pair generation per shared shingle.
    "pipeline_source_overlap" ->
      s"""WITH w AS (SELECT doc_id, source, ${tok("text")} AS w FROM documents),
         |sh0 AS (SELECT source, list_distinct(list_transform(${shingles("w")}, s_ -> ${ch("s_")})) AS hs FROM w),
         |sh AS (SELECT DISTINCT source, unnest(hs) AS h FROM sh0 WHERE len(hs) > 0),
         |g AS (SELECT h, list_sort(list(DISTINCT source)) AS ss FROM sh GROUP BY h
         |      HAVING count(DISTINCT source) >= 2),
         |p AS (SELECT ss[i] AS src_a, ss[j] AS src_b FROM g,
         |        LATERAL (SELECT unnest(generate_series(1, len(ss))) AS i),
         |        LATERAL (SELECT unnest(generate_series(1, len(ss))) AS j)
         |      WHERE i < j)
         |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM p GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    // The streaming ingest form appends per-chunk rows batch-by-batch and
    // runs the SAME census — chunking is per-row, so it shares the batch
    // oracle bit-for-bit.
    "stream_cdc_chunks" -> cdcChunksSql,
    // Stress centrality, unrolled: forward BFS with integer shortest-path
    // counts (σ), backward SP-DAG continuation counts (D), stress =
    // Σ σ·D over sources — no division anywhere, so bit-exact by
    // construction. Sources = 3 top-degree hubs; 4-hop pinned horizon.
    "graph_betweenness" -> {
      def bwd(l: Int, dn: String): String =
        s"""c$l AS (SELECT lv.s, lv.node, sum(1 + dn.d) AS d
           |     FROM v4 lv JOIN bi ON lv.node = bi.src
           |     JOIN $dn dn ON dn.s = lv.s AND dn.node = bi.dst
           |     WHERE lv.dist = $l GROUP BY 1, 2),
           |d$l AS (SELECT lv.s, lv.node, lv.sigma, coalesce(c$l.d, 0) AS d
           |     FROM v4 lv LEFT JOIN c$l ON c$l.s = lv.s AND c$l.node = lv.node
           |     WHERE lv.dist = $l)""".stripMargin
      s"""WITH $stressFwdCtes,
         |d4 AS (SELECT s, node, CAST(0 AS BIGINT) AS d FROM v4 WHERE dist = 4),
         |${bwd(3, "d4")},
         |${bwd(2, "d3")},
         |${bwd(1, "d2")}
         |SELECT node, CAST(sum(sigma * d) AS BIGINT) AS stress
         |FROM (SELECT s, node, sigma, d FROM d1
         |      UNION ALL SELECT s, node, sigma, d FROM d2
         |      UNION ALL SELECT s, node, sigma, d FROM d3)
         |GROUP BY node ORDER BY stress DESC, node LIMIT 20""".stripMargin
    },

    // Stress centrality run to frontier EXHAUSTION: identical ladder
    // unrolled to 12 forward rounds — past the fixture hubs' measured
    // eccentricity (9 at sf0.01, 3 at sf0.1), so every round beyond the
    // true frontier death is an EMPTY no-op and the unroll equals the
    // Spark side's convergence-detected fixpoint. Backward levels
    // 11..1 mirror the engine's top-down continuation sums.
    "graph_betweenness_full" -> {
      val D = 12
      def bwd(l: Int): String =
        s"""c$l AS (SELECT lv.s, lv.node, sum(1 + dn.d) AS d
           |     FROM v$D lv JOIN bi ON lv.node = bi.src
           |     JOIN d${l + 1} dn ON dn.s = lv.s AND dn.node = bi.dst
           |     WHERE lv.dist = $l GROUP BY 1, 2),
           |d$l AS MATERIALIZED (SELECT lv.s, lv.node, lv.sigma, coalesce(c$l.d, 0) AS d
           |     FROM v$D lv LEFT JOIN c$l ON c$l.s = lv.s AND c$l.node = lv.node
           |     WHERE lv.dist = $l)""".stripMargin
      s"""WITH ${stressFwdCtesN(D)},
         |d$D AS (SELECT s, node, CAST(0 AS BIGINT) AS d FROM v$D WHERE dist = $D),
         |${(D - 1 to 1 by -1).map(bwd).mkString(",\n")}
         |SELECT node, CAST(sum(sigma * d) AS BIGINT) AS stress
         |FROM (${(1 until D).map(l => s"SELECT s, node, sigma, d FROM d$l")
               .mkString(" UNION ALL ")})
         |GROUP BY node ORDER BY stress DESC, node LIMIT 20""".stripMargin
    },

    // Sampled harmonic centrality run to frontier EXHAUSTION: the same
    // 12-round unroll (rounds past the frontier's death are empty).
    "graph_harmonic_full" ->
      s"""WITH ${stressFwdCtesN(12)}
         |SELECT node, CAST(sum(1000 // dist) AS BIGINT) AS harmonic_milli,
         |  CAST(count(*) AS BIGINT) AS n_sources
         |FROM v12 WHERE dist > 0 GROUP BY node
         |ORDER BY harmonic_milli DESC, node LIMIT 20""".stripMargin,

    // Sampled harmonic centrality: same forward-σ BFS prefix, one rollup
    // — Σ 1000 // dist per node over the hub sources.
    "graph_harmonic" ->
      s"""WITH $stressFwdCtes
         |SELECT node, CAST(sum(1000 // dist) AS BIGINT) AS harmonic_milli,
         |  CAST(count(*) AS BIGINT) AS n_sources
         |FROM v4 WHERE dist > 0 GROUP BY node
         |ORDER BY harmonic_milli DESC, node LIMIT 20""".stripMargin,

    // Change feed: arithmetic reconstruction of the three retained
    // snapshots (base id%3 load; upsert generation doubling id%6 and
    // inserting id%5 non-base keys; delete generation removing id%9),
    // then the same PK full-outer diff + classification. value*2 is an
    // exact power-of-two double scale, so both engines round the
    // identical product.
    "ddl_change_feed" -> {
      def feed(a: String, b: String, label: String): String =
        s"""SELECT '$label' AS step,
           |  CASE WHEN a.event_id IS NULL THEN 'insert'
           |       WHEN b.event_id IS NULL THEN 'delete'
           |       WHEN a.c <> b.c THEN 'update' ELSE 'unchanged' END AS change,
           |  coalesce(b.c, 0) - coalesce(a.c, 0) AS d
           |FROM $a a FULL OUTER JOIN $b b ON a.event_id = b.event_id""".stripMargin
      s"""WITH e AS (SELECT event_id,
         |    EXTRACT(day FROM CAST(ts AS TIMESTAMP)) <= 7 AS early,
         |    CAST(round(value * 100, 0) AS BIGINT) AS c1,
         |    CAST(round(value * 2 * 100, 0) AS BIGINT) AS c2 FROM events),
         |v1 AS (SELECT event_id, early, c1 AS c FROM e WHERE event_id % 3 = 0),
         |v2 AS (SELECT event_id, early,
         |         CASE WHEN event_id % 6 = 0 AND early THEN c2 ELSE c1 END AS c
         |       FROM e WHERE event_id % 3 = 0 OR (event_id % 5 = 0 AND early)),
         |v3 AS (SELECT event_id, early, c FROM v2
         |       WHERE NOT (event_id % 9 = 0 AND early))
         |SELECT step, change, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(d) AS BIGINT) AS delta_cents
         |FROM (${feed("v1", "v2", "v1->v2")} UNION ALL ${feed("v2", "v3", "v2->v3")})
         |GROUP BY 1, 2 ORDER BY step, change""".stripMargin
    },

    // Partition evolution census: generation = day-of-month split.
    "ddl_partition_evolution" ->
      """WITH e AS (SELECT
        |    CASE WHEN EXTRACT(day FROM CAST(ts AS TIMESTAMP)) <= 15
        |      THEN 'day' ELSE 'day_hour' END AS scheme,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS p_day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events)
        |SELECT scheme, CAST(count(DISTINCT p_day) AS BIGINT) AS n_days,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM e GROUP BY scheme ORDER BY scheme""".stripMargin,

    // l-diversity census per quasi-identifier group.
    "profile_l_diversity" ->
      """SELECT c_nationkey AS nation, c_mktsegment AS segment,
        |  CAST(count(*) AS BIGINT) AS k_size,
        |  CAST(count(DISTINCT CAST(round(c_acctbal * 100, 0) AS BIGINT) // 100000) AS BIGINT) AS l_distinct,
        |  (count(DISTINCT CAST(round(c_acctbal * 100, 0) AS BIGINT) // 100000) < 3) AS violates
        |FROM customer GROUP BY 1, 2 ORDER BY nation, segment""".stripMargin,

    // 2-D skyline, join-free: dominated iff min date among strictly
    // cheaper orders <= own date (range frame to 1 cent before), or a
    // same-price order is strictly earlier.
    // skyline(all) = skyline(frontier ∪ batch): the streaming form keeps
    // only the frontier as state and shares the batch oracle.
    "stream_skyline" -> skylineSql,

    "agg_skyline" -> skylineSql,

    // Incremental-MV maintenance (batch and streaming): the oracle is
    // the FULL recompute, so a green gate proves incremental == full.
    "ddl_incremental_mv" -> mvFullSql,
    "stream_incremental_mv" -> mvFullSql,

    // Interval-overlap range join: DuckDB evaluates the inequality join
    // directly (IEJoin); Spark's bucket decomposition must produce the
    // identical pair set with exact µs overlaps.
    "join_interval_overlap" ->
      """WITH a AS (SELECT event_id AS a_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
        |           FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT event_id AS b_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |        epoch_us(CAST(ts AS TIMESTAMP)) + 2700000000 AS e
        |      FROM events WHERE event_type = 'error')
        |SELECT a.a_id, b.b_id,
        |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
        |FROM a JOIN b ON a.s < b.e AND b.s < a.e
        |ORDER BY a_id, b_id""".stripMargin,

    // Entity-resolution family: blocked candidate pairs (blocking key =
    // nation × mktsegment), CC clustering of verified matches via a
    // recursive reachability closure (block-bounded graph, so the
    // closure stays tiny), and min-key survivorship.
    "link_blocked_pairs" -> linkPairsSql,
    // The bounded (deletion-neighborhood) tier is COMPLETE for
    // maxDist <= 2, so its oracle IS the exhaustive-block SQL: the
    // driver's hash match doubles as the recall-1.0 proof.
    "link_blocked_pairs_bounded" -> linkPairsSql,
    // Bounded-tier recall census, sampling mirrored: anchors = custkeys
    // = 0 mod greatest(1, n//128); truth = exhaustive-block pairs whose
    // smaller key is an anchor; found/cand = the deletion-neighborhood
    // path under the same anchor filter.
    "link_bounded_recall" ->
      s"""WITH m AS (SELECT greatest(1, count(*) // 128) AS md FROM customer),
         |v1 AS (SELECT c_custkey ck, c_name nm, c_nationkey bn,
         |         c_mktsegment bs, c_name AS var FROM customer
         |       UNION ALL
         |       SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         |         substr(c_name, 1, i - 1) || substr(c_name, i + 1)
         |       FROM customer, unnest(range(1, len(c_name) + 1)) AS t(i)),
         |vars AS (SELECT DISTINCT ck, nm, bn, bs, var FROM (
         |  SELECT ck, nm, bn, bs, var FROM v1
         |  UNION ALL
         |  SELECT ck, nm, bn, bs, substr(var, 1, j - 1) || substr(var, j + 1)
         |  FROM v1, unnest(range(1, len(var) + 1)) AS t(j) WHERE nm <> var)),
         |cand AS (SELECT DISTINCT a.ck cka, a.nm nma, b.ck ckb, b.nm nmb
         |  FROM vars a JOIN vars b
         |    ON a.var = b.var AND a.bn = b.bn AND a.bs = b.bs AND a.ck < b.ck
         |  WHERE a.ck % (SELECT md FROM m) = 0),
         |fnd AS (SELECT cka, ckb FROM cand WHERE levenshtein(nma, nmb) <= 2),
         |tr AS (SELECT a.c_custkey ca, b.c_custkey cb
         |       FROM customer a JOIN customer b
         |         ON a.c_nationkey = b.c_nationkey
         |        AND a.c_mktsegment = b.c_mktsegment
         |        AND a.c_custkey < b.c_custkey
         |       WHERE levenshtein(a.c_name, b.c_name) <= 2
         |         AND a.c_custkey % (SELECT md FROM m) = 0),
         |ht AS (SELECT t.* FROM tr t JOIN fnd f ON f.cka = t.ca AND f.ckb = t.cb),
         |c AS (SELECT (SELECT count(*) FROM tr) AS n_true,
         |        (SELECT count(*) FROM fnd) AS n_found,
         |        (SELECT count(*) FROM cand) AS n_cand,
         |        (SELECT count(*) FROM ht) AS n_hit)
         |SELECT CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_found AS BIGINT) AS n_found,
         |  CAST(n_cand AS BIGINT) AS n_cand,
         |  CAST(CASE WHEN n_true = 0 THEN 1000000
         |       ELSE (n_hit * 1000000) // n_true END AS BIGINT) AS recall_ppm
         |FROM c""".stripMargin,

    // Incremental streaming ER emits every pair exactly once (at the
    // batch where its later record arrives) — the accumulated store is
    // the batch pair set, same oracle bit-for-bit.
    "stream_link_pairs" -> linkPairsSql,

    "link_er_clusters" ->
      s"""WITH RECURSIVE $linkPairCtes
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
         |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin,

    "link_golden_records" -> linkGoldenSql,

    // Incremental golden-record maintenance folds each batch's pairs
    // into the persisted cluster map (CC over new pairs ∪ contracted
    // map edges = CC over all pairs seen) — the final survivorship
    // equals the batch form, same oracle.
    "stream_link_golden" -> linkGoldenSql,

    "timeseries_motif" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |             sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, qv,
        |        row_number() OVER (PARTITION BY event_type ORDER BY hr) AS pos FROM h),
        |w AS (SELECT event_type, pos, qv AS v0,
        |        lead(qv,1) OVER tw AS v1, lead(qv,2) OVER tw AS v2,
        |        lead(qv,3) OVER tw AS v3, lead(qv,4) OVER tw AS v4,
        |        lead(qv,5) OVER tw AS v5, lead(qv,6) OVER tw AS v6,
        |        lead(qv,7) OVER tw AS v7
        |      FROM s WINDOW tw AS (PARTITION BY event_type ORDER BY pos)),
        |k AS (SELECT *, (v0+v1) // 2000 AS p0, (v2+v3) // 2000 AS p1,
        |        (v4+v5) // 2000 AS p2, (v6+v7) // 2000 AS p3
        |      FROM w WHERE v7 IS NOT NULL),
        |cand AS (SELECT a.event_type, a.pos AS pos_a, b.pos AS pos_b,
        |           abs(a.v0-b.v0)+abs(a.v1-b.v1)+abs(a.v2-b.v2)+abs(a.v3-b.v3)
        |          +abs(a.v4-b.v4)+abs(a.v5-b.v5)+abs(a.v6-b.v6)+abs(a.v7-b.v7) AS l1
        |         FROM k a JOIN k b ON a.event_type = b.event_type
        |           AND a.p0 = b.p0 AND a.p1 = b.p1 AND a.p2 = b.p2 AND a.p3 = b.p3
        |           AND a.pos + 8 <= b.pos),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY l1, pos_a, pos_b) AS rk FROM cand)
        |SELECT event_type, rk, CAST(pos_a AS BIGINT) AS pos_a,
        | CAST(pos_b AS BIGINT) AS pos_b, CAST(l1 AS BIGINT) AS l1
        |FROM r WHERE rk <= 3 ORDER BY event_type, rk""".stripMargin,

    // DuckDB sums of BIGINT widen to HUGEINT — every emitted moment casts
    // back to BIGINT to match Spark's int64 schema (values bounded well
    // inside int64: cents ≤1e5, ≤1e3 hours per series).
    "timeseries_acf" -> {
      val leads = (1 to 6).map(l => s"lead(qv,$l) OVER tw AS y$l").mkString(", ")
      val perLag = (1 to 6).map(l =>
        s"""SELECT event_type, $l AS lag, count(*) AS n, sum(qv) AS sx, sum(y$l) AS sy,
           |  sum(qv*y$l) AS sxy, sum(qv*qv) AS sxx, sum(y$l*y$l) AS syy
           |FROM w WHERE y$l IS NOT NULL GROUP BY 1""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
         |             sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
         |           FROM events GROUP BY 1, 2),
         |s AS (SELECT event_type, qv,
         |        row_number() OVER (PARTITION BY event_type ORDER BY hr) AS pos FROM h),
         |w AS (SELECT event_type, qv, $leads
         |      FROM s WINDOW tw AS (PARTITION BY event_type ORDER BY pos)),
         |l AS ($perLag)
         |SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
         |  CAST(n*sxy - sx*sy AS BIGINT) AS num,
         |  CAST(n*sxx - sx*sx AS BIGINT) AS den_x,
         |  CAST(n*syy - sy*sy AS BIGINT) AS den_y
         |FROM l ORDER BY event_type, lag""".stripMargin
    },

    // Streaming quantile sketch — cross-batch count addition is the
    // histogram's merge, so the oracle is the batch sketch arithmetic.
    "stream_quantile" ->
      """WITH h AS (SELECT event_type,
        |             least(greatest(CAST(floor(value / 5.0) AS BIGINT), 0), 99) AS b,
        |             count(*) AS c
        |           FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, b, c,
        |          sum(c) OVER (PARTITION BY event_type ORDER BY b
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          sum(c) OVER (PARTITION BY event_type) AS n
        |        FROM h),
        |p AS (SELECT unnest([50, 90, 99]) AS pct),
        |sel AS (SELECT cum.event_type, p.pct, cum.n, min(cum.b) AS bucket
        |        FROM cum, p WHERE cum.cum >= (cum.n * p.pct + 99) // 100
        |        GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(pct AS BIGINT) AS pct, CAST(n AS BIGINT) AS n,
        | bucket, CAST((bucket + 1) * 5.0 AS DOUBLE) AS est_upper
        |FROM sel ORDER BY event_type, pct""".stripMargin,

    // Streaming twin of timeseries_seasonal — cross-batch long-sum merge
    // is exact, so the oracle is the same arithmetic as the batch form.
    "stream_seasonal" ->
      """WITH c AS (SELECT event_type,
        |             CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
        |             CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type, hod, count(*) AS n, sum(cents) AS sum_cents
        |      FROM c GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*) AS nn, sum(cents) AS s FROM c GROUP BY 1)
        |SELECT b.event_type, b.hod, b.n, CAST(b.sum_cents AS BIGINT) AS sum_cents,
        |  CAST((b.sum_cents * t.nn * 1000000) // (b.n * t.s) AS BIGINT) AS idx_ppm
        |FROM b JOIN t USING (event_type) ORDER BY event_type, hod""".stripMargin,

    // Grouped-Gini from the bucket histogram: T = Σ c_b·(2·cumS_b − s_b),
    // G = 1 − T/(N·S); g_ppm via the same scaled integer division.
    "sketch_gini" ->
      """WITH o AS (SELECT o_orderpriority AS grp,
        |             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
        |h AS (SELECT grp, least(cents // 250000, 199) AS b,
        |        count(*) AS c, sum(cents) AS s
        |      FROM o GROUP BY 1, 2),
        |cu AS (SELECT grp, b, c, s,
        |         sum(s) OVER (PARTITION BY grp ORDER BY b) AS cum_s FROM h),
        |t AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(s) AS BIGINT) AS sum_cents,
        |        CAST(sum(c * (2 * cum_s - s)) AS BIGINT) AS lorenz_t
        |      FROM cu GROUP BY 1)
        |SELECT grp, n, sum_cents, lorenz_t,
        |  CAST(1000000 - lorenz_t // greatest((n * sum_cents) // 1000000, 1) AS BIGINT) AS g_ppm
        |FROM t ORDER BY grp""".stripMargin,

    // Signed-flow drawdown per user: cum -> running peak -> max(peak-cum).
    "window_drawdown" ->
      """WITH f AS (SELECT user_id, event_id,
        |    CASE WHEN event_type = 'purchase'
        |      THEN -CAST(round(value * 100, 0) AS BIGINT)
        |      ELSE CAST(round(value * 100, 0) AS BIGINT) END AS flow,
        |    CAST(ts AS TIMESTAMP) AS tsu
        |  FROM events),
        |c1 AS (SELECT user_id, event_id, tsu,
        |         sum(flow) OVER w AS cum
        |       FROM f WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (SELECT user_id, event_id, cum,
        |        max(cum) OVER w2 AS peak
        |      FROM c1 WINDOW w2 AS (PARTITION BY user_id ORDER BY tsu, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, count(*) AS n_events,
        |  CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents,
        |  CAST(max(peak) AS BIGINT) AS peak_cents
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Holt level+trend fold over the hourly mean ladder: the recursive CTE
    // replays the same halving-only double updates in the same order —
    // every operation exact IEEE, so equality is bitwise, not approximate.
    "timeseries_holt" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |         sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(qv AS DOUBLE) AS qv,
        |        row_number() OVER (PARTITION BY event_type ORDER BY hr) AS pos FROM hourly),
        |h(event_type, pos, level, trend) AS (
        |  SELECT event_type, pos, qv, CAST(0.0 AS DOUBLE) FROM s WHERE pos = 1
        |  UNION ALL
        |  SELECT s.event_type, s.pos,
        |         (h.level + h.trend) / 2 + s.qv / 2,
        |         h.trend / 2 + (((h.level + h.trend) / 2 + s.qv / 2) - h.level) / 2
        |  FROM h JOIN s ON s.event_type = h.event_type AND s.pos = h.pos + 1),
        |f AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY pos DESC) AS rk FROM h)
        |SELECT event_type, CAST(pos AS BIGINT) AS n_hours, level, trend,
        |       level + trend AS forecast_next
        |FROM f WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "timeseries_seasonal" ->
      """WITH c AS (SELECT event_type,
        |             CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
        |             CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type, hod, count(*) AS n, sum(cents) AS sum_cents
        |      FROM c GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*) AS nn, sum(cents) AS s FROM c GROUP BY 1)
        |SELECT b.event_type, b.hod, b.n, CAST(b.sum_cents AS BIGINT) AS sum_cents,
        |  CAST((b.sum_cents * t.nn * 1000000) // (b.n * t.s) AS BIGINT) AS idx_ppm
        |FROM b JOIN t USING (event_type) ORDER BY event_type, hod""".stripMargin,

    // Three unrolled synchronous LPA iterations (plurality label, min
    // tie-break) — the pinned-ladder mirror of Graph.labelPropagation.
    "graph_label_prop" ->
      s"""$lpaCtes
         |SELECT label AS community, count(*) AS n_nodes FROM l3
         |GROUP BY label ORDER BY n_nodes DESC, community""".stripMargin,

    // Per-community modularity decomposition over the same LPA
    // partition: q_num = 4·m·e_c − d_c², q_den = 4m² (HUGEINT products
    // cast back; bounds documented in Graph.modularityByCommunity).
    "graph_modularity" ->
      s"""$lpaCtes,
         |deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
         |m1 AS (SELECT count(*) AS m FROM e0),
         |dc AS (SELECT l.label AS community, count(*) AS n_nodes, sum(deg.d) AS d_sum
         |       FROM l3 l JOIN deg ON l.node = deg.node GROUP BY 1),
         |ein AS (SELECT ls.label AS community, count(*) AS e_in
         |        FROM e0 JOIN l3 ls ON e0.src = ls.node
         |                JOIN l3 ld ON e0.dst = ld.node
         |        WHERE ls.label = ld.label GROUP BY 1)
         |SELECT dc.community, dc.n_nodes,
         |  CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
         |  CAST(dc.d_sum AS BIGINT) AS d_sum,
         |  CAST(4 * m1.m * COALESCE(ein.e_in, 0) - dc.d_sum * dc.d_sum AS BIGINT) AS q_num,
         |  CAST(4 * m1.m * m1.m AS BIGINT) AS q_den
         |FROM dc LEFT JOIN ein ON dc.community = ein.community CROSS JOIN m1
         |ORDER BY dc.n_nodes DESC, dc.community""".stripMargin,

    // Deterministic random walks: 4 unrolled hops, next hop =
    // charHash("start:wk:step:cur") mod degree into the ascending
    // neighbour list — the exact coin Graph.randomWalks draws.
    "graph_random_walks" -> {
      def coin(i: Int): String = ch(
        "CAST(w.start AS VARCHAR) || ':' || CAST(w.wk AS VARCHAR) || " +
          s"':' || '$i' || ':' || CAST(w.cur AS VARCHAR)")
      def hop(i: Int): String =
        s"""w$i AS MATERIALIZED (SELECT w.start, w.wk,
           |    a.nbrs[CAST((${coin(i)}) % len(a.nbrs) AS BIGINT) + 1] AS cur,
           |    list_append(w.path,
           |      a.nbrs[CAST((${coin(i)}) % len(a.nbrs) AS BIGINT) + 1]) AS path
           |  FROM w${i - 1} w JOIN adj a ON w.cur = a.node)""".stripMargin
      s"""WITH os AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS MATERIALIZED (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |adj AS MATERIALIZED (SELECT src AS node, list(dst ORDER BY dst) AS nbrs FROM e GROUP BY 1),
         |w0 AS MATERIALIZED (SELECT a.node AS start, wks.wk, a.node AS cur, [a.node] AS path
         |  FROM adj a CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS wk) wks),
         |${(1 to 4).map(hop).mkString(",\n")}
         |SELECT start, wk, CAST(u.i - 1 AS BIGINT) AS step, path[u.i] AS node
         |FROM w4, LATERAL (SELECT unnest(generate_series(1, len(path))) AS i) u
         |ORDER BY start, wk, step""".stripMargin
    },

    // Skip-gram pairs from the SAME walk ladder: for each position i,
    // every j within ±2 (j ≠ i) contributes one (path[i], path[j]) pair;
    // multiplicity kept as the training weight.
    "graph_walk_pairs" ->
      s"""WITH $walkPairCtes
         |SELECT center, context, m AS n_pairs FROM pr
         |ORDER BY center, context""".stripMargin,

    // One synchronous SGNS epoch over the walk-pair corpus, unrolled:
    // hash-init vectors (±1000), hard sigmoid in ppm (sign-magnitude
    // // on the magnitude ≡ Spark's sdiv), 2 deterministic negatives
    // per pair from the top-256-frequency context table, exact
    // full-batch gradient sums per (node, dim), one lr = 2^-21 apply.
    "graph_sgns_epoch" ->
      s"""WITH $sgnsCtes
         |SELECT node, dim, val FROM emb ORDER BY node, dim""".stripMargin,

    // Two synchronous SGNS epochs (context vectors update between
    // epochs; fixed negative draw) — the chained unroll.
    "graph_sgns_epoch2" ->
      s"""WITH ${sgnsEpochChainCtes(2)}
         |SELECT node, CAST(g_.k - 1 AS BIGINT) AS dim, vec[g_.k] AS val
         |FROM u_2, LATERAL (SELECT unnest(generate_series(1, 32)) AS k) g_
         |ORDER BY node, dim""".stripMargin,

    // Brute-force cosine top-5 over the trained SGNS vectors (sample
    // queries node % 100 = 0): integer dot over trained components, one
    // IEEE division + two sqrts (the simsearch float policy), ties on
    // neighbour id. The persist twin queries the same trained vectors
    // from a parquet store — one oracle, two paths.
    "graph_embedding_knn" -> sgnsKnnSql,
    "graph_embedding_knn_persist" -> sgnsKnnSql,
    "graph_embedding_ann" -> sgnsAnnSql,
    "graph_embedding_ann_recall" -> sgnsAnnRecallSql,

    // Second-order biased walks: hop 1 uniform (the randomWalks coin),
    // hops 2..4 weight each candidate 1 (return to prev) / 6 (also
    // adjacent to prev) / 3 (distance-2) and pick the first cumulative-
    // weight bucket past coin % total — the exact left-fold the engine
    // runs.
    "graph_node2vec_walks" -> {
      def coin(i: Int): String = ch(
        "CAST(w.start AS VARCHAR) || ':' || CAST(w.wk AS VARCHAR) || " +
          s"':' || '$i' || ':' || CAST(w.cur AS VARCHAR)")
      def hop(i: Int): String =
        s"""c$i AS (SELECT w.start, w.wk, w.cur, w.path, u.k,
           |    a.nbrs[u.k] AS cand,
           |    CASE WHEN a.nbrs[u.k] = w.prev THEN 1
           |         WHEN list_contains(p.nbrs, a.nbrs[u.k]) THEN 6
           |         ELSE 3 END AS wt,
           |    (${coin(i)}) AS cn
           |  FROM w${i - 1} w JOIN adj a ON w.cur = a.node
           |    JOIN adj p ON w.prev = p.node,
           |  LATERAL (SELECT unnest(generate_series(1, len(a.nbrs))) AS k) u),
           |s$i AS (SELECT *, sum(wt) OVER (PARTITION BY start, wk) AS tot,
           |        sum(wt) OVER (PARTITION BY start, wk ORDER BY k) AS cum FROM c$i),
           |w$i AS MATERIALIZED (SELECT start, wk, cur AS prev, cand AS cur,
           |    list_append(path, cand) AS path
           |  FROM s$i WHERE (cn % tot) >= cum - wt AND (cn % tot) < cum)""".stripMargin
      val coin1 = ch(
        "CAST(w.start AS VARCHAR) || ':' || CAST(w.wk AS VARCHAR) || " +
          "':' || '1' || ':' || CAST(w.cur AS VARCHAR)")
      s"""WITH os AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
         |e0 AS MATERIALIZED (SELECT a.s AS src, b.s AS dst FROM os a JOIN os b ON a.ok = b.ok AND a.s < b.s
         |       GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS MATERIALIZED (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |adj AS MATERIALIZED (SELECT src AS node, list(dst ORDER BY dst) AS nbrs FROM e GROUP BY 1),
         |w1 AS MATERIALIZED (SELECT w.start, w.wk, w.cur AS prev,
         |    a.nbrs[CAST(($coin1) % len(a.nbrs) AS BIGINT) + 1] AS cur,
         |    list_append(w.path,
         |      a.nbrs[CAST(($coin1) % len(a.nbrs) AS BIGINT) + 1]) AS path
         |  FROM (SELECT a0.node AS start, wks.wk, a0.node AS cur, [a0.node] AS path
         |        FROM adj a0 CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS wk) wks) w
         |  JOIN adj a ON w.cur = a.node),
         |${(2 to 4).map(hop).mkString(",\n")}
         |SELECT start, wk, CAST(u.i - 1 AS BIGINT) AS step, path[u.i] AS node
         |FROM w4, LATERAL (SELECT unnest(generate_series(1, len(path))) AS i) u
         |ORDER BY start, wk, step""".stripMargin
    },

    // STL-style decomposition: centred ±12 moving-mean trend over the
    // hourly cent series, hour-of-day mean of the detrended series as the
    // seasonal, residual = the exact remainder. All integer (// ≡ div).
    "timeseries_stl" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |             sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, hr, qv,
        |        row_number() OVER (PARTITION BY event_type ORDER BY hr) AS pos FROM h),
        |t AS (SELECT *, sum(qv) OVER tw // count(qv) OVER tw AS trend
        |      FROM s WINDOW tw AS (PARTITION BY event_type ORDER BY pos
        |        ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT *, qv - trend AS detr,
        |        CAST(hour(hr) AS BIGINT) AS hod FROM t),
        |se AS (SELECT event_type, hod, sum(detr) // count(*) AS seasonal
        |       FROM d GROUP BY 1, 2)
        |SELECT d.event_type, CAST(d.pos AS BIGINT) AS pos,
        |  strftime(d.hr, '%Y-%m-%d %H:%M:%S') AS hr_s,
        |  CAST(d.qv AS BIGINT) AS qv, CAST(d.trend AS BIGINT) AS trend,
        |  CAST(se.seasonal AS BIGINT) AS seasonal,
        |  CAST(d.qv - d.trend - se.seasonal AS BIGINT) AS resid
        |FROM d JOIN se ON d.event_type = se.event_type AND d.hod = se.hod
        |ORDER BY d.event_type, pos""".stripMargin,

    // STL-residual anomaly screen: the stl ladder, then median/MAD over
    // the residuals per series (quantile_cont = Spark's interpolated
    // percentile, the anomaly_mad-proven pairing), flag adev > 3*mad.
    "anomaly_stl_residual" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |             sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, hr, qv,
        |        row_number() OVER (PARTITION BY event_type ORDER BY hr) AS pos FROM h),
        |t AS (SELECT *, sum(qv) OVER tw // count(qv) OVER tw AS trend
        |      FROM s WINDOW tw AS (PARTITION BY event_type ORDER BY pos
        |        ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT *, qv - trend AS detr,
        |        CAST(hour(hr) AS BIGINT) AS hod FROM t),
        |se AS (SELECT event_type, hod, sum(detr) // count(*) AS seasonal
        |       FROM d GROUP BY 1, 2),
        |r AS (SELECT d.event_type, d.pos, d.hr, d.qv,
        |        d.qv - d.trend - se.seasonal AS resid
        |      FROM d JOIN se ON d.event_type = se.event_type AND d.hod = se.hod),
        |md AS (SELECT event_type, quantile_cont(resid, 0.5) AS med FROM r GROUP BY 1),
        |dv AS (SELECT r.*, md.med, abs(r.resid - md.med) AS adev
        |       FROM r JOIN md ON r.event_type = md.event_type),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dv GROUP BY 1)
        |SELECT dv.event_type, CAST(dv.pos AS BIGINT) AS pos,
        |  strftime(dv.hr, '%Y-%m-%d %H:%M:%S') AS hr_s,
        |  CAST(dv.qv AS BIGINT) AS qv, CAST(dv.resid AS BIGINT) AS resid,
        |  round(dv.med, 6) AS med, round(mad.mad, 6) AS mad
        |FROM dv JOIN mad ON dv.event_type = mad.event_type
        |WHERE dv.adev > 3.0 * mad.mad
        |ORDER BY dv.event_type, pos""".stripMargin,

    // Theil-Sen: median of exact pairwise slopes, sign-magnitude
    // truncating division (// on non-negative magnitudes == Spark div),
    // float only at the quantile_cont median (round 6). Shared with the
    // streaming twin (merged hourly cube == the one-shot reduce).
    "timeseries_theilsen" -> theilsenSql,
    "stream_theilsen" -> theilsenSql,

    // Full DTW over hour-of-day profiles as a recursive anti-diagonal
    // relaxation: the working set carries the last TWO diagonals (each
    // row lives exactly 2 iterations — new at front f, carried once to
    // front f+1); a new cell on diag f+1 min-aggregates its ≤3
    // predecessors ((i-1,j),(i,j-1) on diag f and (i-1,j-1) on f-1, all
    // and only the adjacent working-set cells on those diagonals). The
    // (na,nb) corner is created on the final diagonal and never carried,
    // so it appears exactly once in the accumulated result.
    "timeseries_dtw" -> dtwSql,

    "stream_dtw" -> dtwSql,

    // Lagged cross-correlation moments between series pairs aligned on
    // absolute epoch hours, lags 0..6 — the autocorr moment contract
    // applied across series.
    "timeseries_crosscorr" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |             sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, qv, epoch(hr) // 3600 AS hrs FROM h),
        |p AS (SELECT a.event_type AS et_a, b.event_type AS et_b, lg.lag,
        |        a.qv AS xa, b.qv AS xb
        |      FROM s a
        |      CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS lag) lg
        |      JOIN s b ON b.hrs = a.hrs + lg.lag AND a.event_type <> b.event_type)
        |SELECT et_a, et_b, CAST(lag AS BIGINT) AS lag,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(*) * sum(xa*xb) - sum(xa) * sum(xb) AS BIGINT) AS num,
        |  CAST(count(*) * sum(xa*xa) - sum(xa) * sum(xa) AS BIGINT) AS den_a,
        |  CAST(count(*) * sum(xb*xb) - sum(xb) * sum(xb) AS BIGINT) AS den_b
        |FROM p GROUP BY 1, 2, 3 ORDER BY et_a, et_b, lag""".stripMargin,

    // Top-PC loadings: the shared power-iteration ladder, sign flipped so
    // the lowest max-|v| dim is positive.
    "embed_pca_loadings" -> pcaLoadingsSql,

    // The streaming twin's merged Gram state must ladder to the
    // identical loadings.
    "stream_pca" -> pcaLoadingsSql,

    // Second PC: the shared ladder, deflation, second ladder, own flip.
    "embed_pca2_loadings" ->
      s"""$pcaCtes,
         |$pca2Ctes
         |SELECT x.dim AS dim, CAST(x.v * zfl.s AS BIGINT) AS loading_ppm
         |FROM z8 x, zfl ORDER BY dim""".stripMargin,

    // Banding-knob sweep: per config b bands over the same 16-hash
    // signature, bucket census + exact candidate count from bucket sizes.
    "dedup_lsh_band_sweep" ->
      s"""$minhashCtes,
         |cfg AS (SELECT unnest([2, 4, 8, 16]) AS b),
         |bd AS (SELECT m.doc_id, c.b, m.seed // (16 // c.b) AS band,
         |         string_agg(CAST(m.mh AS VARCHAR), ',' ORDER BY m.seed) AS key
         |       FROM mh m CROSS JOIN cfg c
         |       GROUP BY m.doc_id, c.b, m.seed // (16 // c.b)),
         |bs AS (SELECT b, band, key, count(*) AS bs FROM bd GROUP BY 1, 2, 3)
         |SELECT CAST(b AS BIGINT) AS n_bands, CAST(16 AS BIGINT) AS n_hashes,
         |  CAST(16 // b AS BIGINT) AS rows_per_band,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(count(*) FILTER (WHERE bs >= 2) AS BIGINT) AS n_buckets_multi,
         |  CAST(sum(bs * (bs - 1) // 2) AS BIGINT) AS candidate_pairs
         |FROM bs GROUP BY b ORDER BY n_bands""".stripMargin,

    // Pairwise chi-square over orders categoricals: full ra x cb grid
    // (absent cells included), per-cell ((nab*n - ra*cb)^2 * 1e6) //
    // (n*ra*cb) in HUGEINT, Cramer's V the only float (round 9).
    "profile_chi2_matrix" -> chi2MatrixSql,

    // The streaming twin's incrementally-merged contingency cube must
    // converge to the batch matrix exactly.
    "stream_chi2" -> chi2MatrixSql,


    // Pairwise Pearson over lineitem numerics: one pass of exact HUGEINT
    // moments, the ratio float-only (sqrt dag, round 9) per pair.
    "profile_corr_matrix" -> {
      val cols = Seq("l_discount" -> "d", "l_extendedprice" -> "p",
        "l_quantity" -> "q", "l_tax" -> "t")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val moments =
        cols.map { case (_, a) =>
          s"sum(CAST($a AS HUGEINT)) AS s_$a, sum(CAST($a AS HUGEINT) * $a) AS ss_$a"
        } ++ pairs.map { case ((_, a), (_, b)) =>
          s"sum(CAST($a AS HUGEINT) * $b) AS sp_${a}_$b"
        }
      val rows = pairs.map { case ((na, a), (nb, b)) =>
        s"""SELECT '$na' AS col_a, '$nb' AS col_b, CAST(n AS BIGINT) AS n_rows,
           |  round(CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE) /
           |    (sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)) *
           |     sqrt(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE))), 9) AS corr
           |FROM m""".stripMargin
      }
      s"""WITH c AS (SELECT
         |    CAST(round(l_discount * 100, 0) AS BIGINT) AS d,
         |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p,
         |    CAST(round(l_quantity * 100, 0) AS BIGINT) AS q,
         |    CAST(round(l_tax * 100, 0) AS BIGINT) AS t
         |  FROM lineitem),
         |m AS (SELECT CAST(count(*) AS HUGEINT) AS n, ${moments.mkString(",\n  ")}
         |      FROM c)
         |SELECT * FROM (${rows.mkString("\nUNION ALL\n")})
         |ORDER BY col_a, col_b""".stripMargin
    },

    // Gini-gain association (priority -> status): exact integer ppm, the
    // per-x truncated div mirrored; '_all' row = unconditional impurity.
    "profile_gini_gain" ->
      """WITH xy AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
        |              count(*) AS nxy FROM orders GROUP BY 1, 2),
        |n1 AS (SELECT CAST(sum(nxy) AS HUGEINT) AS n FROM xy),
        |px AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx,
        |         sum(CAST(nxy AS HUGEINT) * nxy) AS sxy2 FROM xy GROUP BY 1),
        |det AS (SELECT px.x, px.nx,
        |    CAST(((CAST(px.nx AS HUGEINT) * px.nx - px.sxy2) * 1000000) //
        |      (CAST(px.nx AS HUGEINT) * px.nx) AS BIGINT) AS gini_ppm,
        |    CAST(((CAST(px.nx AS HUGEINT) * px.nx - px.sxy2) * 1000000) //
        |      (n1.n * px.nx) AS BIGINT) AS term_ppm
        |  FROM px CROSS JOIN n1),
        |py AS (SELECT y, CAST(sum(nxy) AS HUGEINT) AS ny FROM xy GROUP BY 1),
        |alr AS (SELECT '_all' AS x, CAST(sum(ny) AS BIGINT) AS nx,
        |    CAST(((sum(ny) * sum(ny) - sum(ny * ny)) * 1000000) //
        |      (sum(ny) * sum(ny)) AS BIGINT) AS gini_ppm,
        |    CAST(0 AS BIGINT) AS term_ppm
        |  FROM py)
        |SELECT x, nx, gini_ppm, term_ppm FROM det
        |UNION ALL SELECT x, nx, gini_ppm, term_ppm FROM alr
        |ORDER BY x""".stripMargin,

    // Greedy k-center (Gonzalez): 6 unrolled rounds — seed = min vec_id,
    // each next pick the vector farthest (exact integer squared L2) from
    // its nearest chosen center, ties to min vec_id.
    "sample_kcenter" -> {
      def d2(a: String, c: String): String =
        s"CAST(list_sum(list_transform(generate_series(1, 64), " +
          s"p_ -> ($a.qv[p_] - $c.qv[p_]) * ($a.qv[p_] - $c.qv[p_]))) AS BIGINT)"
      def round(r: Int): String =
        s"""m$r AS (SELECT a.vec_id, a.qv, min(${d2("a", "c")}) AS d
           |  FROM q a CROSS JOIN cs${r - 1} c
           |  WHERE a.vec_id NOT IN (SELECT vec_id FROM cs${r - 1})
           |  GROUP BY a.vec_id, a.qv),
           |c$r AS (SELECT vec_id, qv, d FROM m$r ORDER BY d DESC, vec_id LIMIT 1),
           |cs$r AS (SELECT vec_id, qv, d FROM cs${r - 1}
           |  UNION ALL SELECT vec_id, qv, d FROM c$r)""".stripMargin
      s"""WITH q AS MATERIALIZED (SELECT vec_id, ${quant("embedding")} AS qv FROM embeddings),
         |cs1 AS (SELECT vec_id, qv, CAST(0 AS BIGINT) AS d
         |        FROM q ORDER BY vec_id LIMIT 1),
         |${(2 to 6).map(round).mkString(",\n")}
         |SELECT CAST(1 AS BIGINT) AS rk, vec_id, d AS d2_pick FROM cs1
         |${(2 to 6).map(r => s"UNION ALL SELECT CAST($r AS BIGINT), vec_id, d FROM c$r").mkString("\n")}
         |ORDER BY rk""".stripMargin
    },

    // Top-20 vectors by |projection| onto the canonical top PC.
    "embed_pca_scores" ->
      s"""$pcaCtes,
         |ld AS (SELECT x.dim, CAST(x.v * fl.s AS BIGINT) AS l FROM x8 x, fl),
         |sc AS (SELECT q.vec_id, CAST(sum(qv[u.i] * ld.l) AS BIGINT) AS score
         |       FROM q, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
         |       JOIN ld ON ld.dim = u.i - 1
         |       GROUP BY 1)
         |SELECT vec_id, score FROM sc
         |ORDER BY abs(score) DESC, vec_id LIMIT 20""".stripMargin,

    // Louvain census: min-member community ids over the 6-round move
    // ladder, then the exact modularity decomposition (same terms as
    // graph_modularity so the two partitions compare directly).
    "graph_louvain" ->
      s"""$louvainCtes,
         |cm AS (SELECT label, min(node) AS community FROM lv6 GROUP BY 1),
         |lc AS (SELECT l.node, cm.community FROM lv6 l JOIN cm ON l.label = cm.label),
         |dcc AS (SELECT lc.community, count(*) AS n_nodes, sum(dg.di) AS d_sum
         |        FROM lc JOIN dg ON lc.node = dg.node GROUP BY 1),
         |ei AS (SELECT a.community, count(*) AS e_in
         |       FROM e0 JOIN lc a ON e0.src = a.node JOIN lc b ON e0.dst = b.node
         |       WHERE a.community = b.community GROUP BY 1)
         |SELECT d.community, d.n_nodes,
         |  CAST(COALESCE(ei.e_in, 0) AS BIGINT) AS e_in,
         |  CAST(d.d_sum AS BIGINT) AS d_sum,
         |  CAST(4 * wt.w * COALESCE(ei.e_in, 0) - d.d_sum * d.d_sum AS BIGINT) AS q_num,
         |  CAST(4 * wt.w * wt.w AS BIGINT) AS q_den
         |FROM dcc d LEFT JOIN ei ON d.community = ei.community CROSS JOIN wt
         |ORDER BY d.community""".stripMargin,

    "timeseries_changepoint" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |             sum(CAST(round(value * 100, 0) AS BIGINT)) // count(*) AS qv
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, hr, qv,
        |        row_number() OVER (PARTITION BY event_type ORDER BY hr) AS pos FROM h),
        |t AS (SELECT event_type, count(*) AS n, sum(qv) AS sm FROM s GROUP BY 1),
        |d AS (SELECT s.event_type, s.pos, s.hr, t.n,
        |        CAST(t.n * s.qv - t.sm AS BIGINT) AS dv
        |      FROM s JOIN t USING (event_type)),
        |c AS (SELECT event_type, n, pos, hr,
        |        sum(dv) OVER (PARTITION BY event_type ORDER BY pos) AS cusum FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY abs(cusum) DESC, pos) AS rk FROM c)
        |SELECT event_type, CAST(n AS BIGINT) AS n_hours, CAST(pos AS BIGINT) AS cp_pos,
        |  strftime(hr, '%Y-%m-%d %H:%M:%S') AS cp_hr_s, CAST(cusum AS BIGINT) AS cusum_peak
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "timeseries_gapfill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, value FROM events
        |            WHERE user_id % 10 = 0),
        |hourly AS (SELECT user_id, date_trunc('hour', tsu) AS h,
        |             sum(CAST(value AS DECIMAL(18,2))) AS v, count(*) AS n_events
        |           FROM ev GROUP BY 1, 2),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span),
        |j AS (SELECT s.user_id, s.h, hourly.v, hourly.n_events
        |      FROM spine s LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h)
        |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_s,
        | v IS NULL AS gap, COALESCE(n_events, 0) AS n_events,
        | CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS v_fill
        |FROM j ORDER BY user_id, hour_s""".stripMargin,

    "anomaly_mad" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        |        FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value,
        | round(d.med, 6) AS med, round(m2.mad, 6) AS mad
        |FROM dev d JOIN mad m2 ON d.event_type = m2.event_type
        |WHERE d.adev > 3.0 * m2.mad
        |ORDER BY d.event_type, d.event_id""".stripMargin,

    "text_gopher_rules" ->
      s"""$gopherCtes
         |SELECT doc_id, n_toks, mean_tok_len, top_unigram_frac, dup_bigram_frac, stop_frac,
         | (n_toks >= 10 AND n_toks <= 100000
         |  AND mean_tok_len >= 2.0 AND mean_tok_len <= 10.0
         |  AND top_unigram_frac <= 0.2
         |  AND dup_bigram_frac <= 0.3) AS passes
         |FROM r ORDER BY doc_id""".stripMargin,

    // Learned quality classifier, trained on the even split with Gopher
    // labels: hashed-unigram buckets, Laplace count-ratio weights in
    // exact ppm (`//` ≡ Spark div on the non-negative operands).
    "quality_nb_model" ->
      s"""$nbQualityCtes
         |SELECT bucket, c_pos, c_neg, w_ppm FROM model ORDER BY bucket""".stripMargin,

    // Held-out scoring: mean bucket weight over token occurrences,
    // unseen buckets = the exact 500000 prior. Shared with the
    // streaming twin: the model's count cube merges exactly across
    // micro-batches, so the stream converges to the identical scores.
    "quality_nb_scores" -> nbScoresSql,
    "stream_quality_nb" -> nbScoresSql,
    // streaming census with fixed benchmarks: per-batch verdicts merge
    // to the identical per-source counts (shared oracle)
    "stream_contamination" -> contaminationSql,

    // Held-out precision/recall/F1 census of predictions vs Gopher labels.
    "quality_nb_eval" ->
      s"""$nbQualityCtes,
         |$nbScoreCtes,
         |j AS (SELECT s.doc_id, s.score_ppm >= 500000 AS predicted, lb.passes
         |      FROM scored s JOIN labels lb ON s.doc_id = lb.doc_id),
         |c AS (SELECT count(*) AS n_docs,
         |        sum(CASE WHEN passes THEN 1 ELSE 0 END) AS n_label_pos,
         |        sum(CASE WHEN predicted THEN 1 ELSE 0 END) AS n_pred_pos,
         |        sum(CASE WHEN passes AND predicted THEN 1 ELSE 0 END) AS n_hit
         |      FROM j)
         |SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_label_pos AS BIGINT) AS n_label_pos,
         |  CAST(n_pred_pos AS BIGINT) AS n_pred_pos,
         |  CAST(n_hit AS BIGINT) AS n_hit,
         |  CAST(CASE WHEN n_pred_pos = 0 THEN 0
         |       ELSE (n_hit * 1000000) // n_pred_pos END AS BIGINT) AS precision_ppm,
         |  CAST(CASE WHEN n_label_pos = 0 THEN 0
         |       ELSE (n_hit * 1000000) // n_label_pos END AS BIGINT) AS recall_ppm,
         |  CAST(CASE WHEN n_label_pos + n_pred_pos = 0 THEN 0
         |       ELSE (2 * n_hit * 1000000) // (n_label_pos + n_pred_pos) END AS BIGINT) AS f1_ppm
         |FROM c""".stripMargin,

    // Sequential gate-survival funnel: lang-ID -> Gopher composite ->
    // stopword floor -> exact-dedup canonical; cascade = conjunction of
    // prefix flags, census = one count row unioned into 4 report rows.
    "pipeline_quality_funnel" ->
      s"""$gopherCtes,
         |ls AS (SELECT doc_id, lang, CAST(len(list_filter(w.w, t_ -> list_contains(lex, t_))) AS BIGINT) AS score
         |       FROM w, $langLexSql),
         |lg AS (SELECT doc_id, CASE WHEN score = 0 THEN 'unk' ELSE lang END AS lang_guess
         |       FROM (SELECT doc_id, lang, score,
         |               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk FROM ls)
         |       WHERE rk = 1),
         |canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |fl AS (SELECT d.doc_id,
         |    (lg.lang_guess <> 'unk') AS g1,
         |    (r.n_toks >= 10 AND r.n_toks <= 100000
         |      AND r.mean_tok_len >= 2.0 AND r.mean_tok_len <= 10.0
         |      AND r.top_unigram_frac <= 0.2 AND r.dup_bigram_frac <= 0.3) AS g2,
         |    (r.stop_frac >= 0.01) AS g3,
         |    (c.doc_id IS NOT NULL) AS g4
         |  FROM documents d JOIN lg ON d.doc_id = lg.doc_id JOIN r ON d.doc_id = r.doc_id
         |    LEFT JOIN canon c ON d.doc_id = c.doc_id),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |    CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
         |  FROM fl)
         |SELECT stage, gate, n_in, n_out, n_in - n_out AS n_dropped FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage, 'lang_id' AS gate, n0 AS n_in, n1 AS n_out FROM t
         |  UNION ALL SELECT 2, 'gopher', n1, n2 FROM t
         |  UNION ALL SELECT 3, 'stopword', n2, n3 FROM t
         |  UNION ALL SELECT 4, 'exact_dedup', n3, n4 FROM t)
         |ORDER BY stage""".stripMargin,

    "pipeline_quality_gate" ->
      s"""$gopherCtes,
         |keep AS (SELECT doc_id FROM r
         |  WHERE n_toks >= 10 AND n_toks <= 100000
         |    AND mean_tok_len >= 2.0 AND mean_tok_len <= 10.0
         |    AND top_unigram_frac <= 0.2
         |    AND dup_bigram_frac <= 0.3),
         |canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         |SELECT d.source, d.lang, count(*) AS n_docs, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
         |FROM documents d
         |JOIN keep ON d.doc_id = keep.doc_id
         |JOIN canon ON d.doc_id = canon.doc_id
         |GROUP BY d.source, d.lang ORDER BY d.source, d.lang""".stripMargin,

    // Arithmetic reconstruction of both table versions: v1 = the id%3
    // initial load, v2 = same keys with id%6 values doubled (the merge
    // replaces existing keys only, so cardinality is version-invariant).
    "ddl_time_travel" ->
      s"""WITH e AS (SELECT event_id, event_type, value FROM events WHERE event_id % 3 = 0),
         |v1 AS (SELECT CAST(1 AS BIGINT) AS version, event_type, count(*) AS n,
         |         ${decSum2("value")} AS sum_value
         |       FROM e GROUP BY event_type),
         |v2 AS (SELECT CAST(2 AS BIGINT) AS version, event_type, count(*) AS n,
         |         CAST(sum(CAST(CASE WHEN event_id % 6 = 0 THEN value * 2 ELSE value END
         |           AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |       FROM e GROUP BY event_type)
         |SELECT * FROM v1 UNION ALL SELECT * FROM v2
         |ORDER BY version, event_type""".stripMargin,

    // Curriculum staging by typicality quartiles off the bounded
    // histogram sketch: boundary b_q = min bucket with cum >= ceil(q·n),
    // stage = #boundaries strictly below the doc's bucket.
    "pipeline_curriculum" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |bg AS (SELECT doc_id, unnest(${shinglesN2("w")}) AS bigram FROM w),
         |cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1),
         |scored AS (SELECT bg.doc_id,
         |    (sum(cnt.c) * 1000) // count(*) AS score_milli
         |  FROM bg JOIN cnt USING (bigram) GROUP BY bg.doc_id),
         |bk AS (SELECT doc_id, score_milli,
         |    least(greatest(CAST(floor(CAST(score_milli AS DOUBLE) / 100.0) AS BIGINT), 0), 999) AS b
         |  FROM scored),
         |hist AS (SELECT b, count(*) AS c FROM bk GROUP BY 1),
         |cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cum,
         |          sum(c) OVER () AS n FROM hist),
         |bounds AS (SELECT
         |    min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN b END) AS b25,
         |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN b END) AS b50,
         |    min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN b END) AS b75
         |  FROM cum),
         |staged AS (SELECT bk.doc_id, bk.score_milli,
         |    CAST(bk.b > bounds.b25 AS BIGINT) + CAST(bk.b > bounds.b50 AS BIGINT)
         |      + CAST(bk.b > bounds.b75 AS BIGINT) AS stage
         |  FROM bk CROSS JOIN bounds)
         |SELECT stage, count(*) AS n_docs,
         |  CAST(min(score_milli) AS BIGINT) AS min_score,
         |  CAST(max(score_milli) AS BIGINT) AS max_score
         |FROM staged GROUP BY stage ORDER BY stage""".stripMargin,

    // First-order Markov transition counts over per-user timelines;
    // ordering ties break on event_id at µs timestamp precision.
    "funnel_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events)
        |SELECT event_type AS from_type, to_type, count(*) AS n
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Clone census = source rows with the (id%6, day<=10) subset doubled;
    // source census = untouched id%3 rows. Divergence proves CoW isolation.
    "ddl_clone" ->
      s"""WITH e AS (SELECT event_id, event_type, value,
         |             day(CAST(ts AS TIMESTAMP)) AS dom
         |           FROM events WHERE event_id % 3 = 0),
         |cl AS (SELECT 'clone' AS "table", event_type, count(*) AS n,
         |         CAST(sum(CAST(CASE WHEN event_id % 6 = 0 AND dom <= 10
         |           THEN value * 2 ELSE value END AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |       FROM e GROUP BY event_type),
         |sr AS (SELECT 'source' AS "table", event_type, count(*) AS n,
         |         ${decSum2("value")} AS sum_value
         |       FROM e GROUP BY event_type)
         |SELECT * FROM cl UNION ALL SELECT * FROM sr
         |ORDER BY "table", event_type""".stripMargin,

    "pipeline_dataset_diff" -> {
      val h = ch("CAST(o_orderkey AS VARCHAR)")
      s"""WITH base AS (SELECT o_orderkey AS k,
         |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         |    ($h) % 100 AS h
         |  FROM orders),
         |v1 AS (SELECT k, cents AS c1 FROM base WHERE h >= 5),
         |v2 AS (SELECT k, CASE WHEN h BETWEEN 5 AND 14 THEN cents + 100 ELSE cents END AS c2
         |       FROM base WHERE h < 95),
         |j AS (SELECT c1, c2 FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
         |SELECT CASE WHEN c1 IS NULL THEN 'added' WHEN c2 IS NULL THEN 'removed'
         |            WHEN c1 <> c2 THEN 'changed' ELSE 'unchanged' END AS change_type,
         |  count(*) AS n_rows,
         |  CAST(sum(COALESCE(abs(c2 - c1), 0)) AS BIGINT) AS sum_delta_cents
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Benford screen: literal log10(1+1/d) ppm constants, explicit
    // floor before the digit extraction (DuckDB double->BIGINT rounds).
    "profile_benford" ->
      """WITH bf(digit, exp_ppm) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
        |d AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |      FROM orders),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
        |SELECT c.digit, c.n,
        |  CAST((c.n * 1000000) // t.n_total AS BIGINT) AS obs_ppm,
        |  CAST(bf.exp_ppm AS BIGINT) AS exp_ppm,
        |  CAST((c.n * 1000000) // t.n_total - bf.exp_ppm AS BIGINT) AS dev_ppm
        |FROM c JOIN bf ON c.digit = bf.digit CROSS JOIN t
        |ORDER BY c.digit""".stripMargin,

    "profile_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |  count(*) AS n, count(*) < 5 AS at_risk
        |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "stream_quality_gate" ->
      s"""$gopherCtes,
         |keep AS (SELECT doc_id FROM r
         |  WHERE n_toks >= 10 AND n_toks <= 100000
         |    AND mean_tok_len >= 2.0 AND mean_tok_len <= 10.0
         |    AND top_unigram_frac <= 0.2
         |    AND dup_bigram_frac <= 0.3)
         |SELECT d.source, d.lang, count(*) AS n_docs, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
         |FROM documents d
         |JOIN keep ON d.doc_id = keep.doc_id
         |GROUP BY d.source, d.lang ORDER BY d.source, d.lang""".stripMargin,

    "join_temporal" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_id, event_type FROM events),
        |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |v AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version FROM c),
        |g AS (SELECT user_id, version, min(event_type) AS state, min(tsu) AS valid_from
        |  FROM v GROUP BY user_id, version),
        |d AS (SELECT user_id, version, state, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to FROM g),
        |p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS pts FROM events)
        |SELECT p.event_id, p.user_id, d.version, d.state,
        | strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS pts_s
        |FROM p JOIN d ON p.user_id = d.user_id AND p.pts >= d.valid_from
        | AND (d.valid_to IS NULL OR p.pts < d.valid_to)
        |ORDER BY p.event_id""".stripMargin,

    "sample_epochs" -> {
      val coin = ch("'ep:' || CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (SELECT source, n_chars,
         |  5 + (CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 4) * 6 AS wt,
         |  ($coin) % 10 AS coin
         | FROM documents),
         |n AS (SELECT source, n_chars,
         |  wt // 10 + CASE WHEN coin < wt % 10 THEN 1 ELSE 0 END AS n_copies FROM d),
         |x AS (SELECT source, n_chars, unnest(generate_series(1, n_copies)) AS epoch FROM n)
         |SELECT source, CAST(epoch AS BIGINT) AS epoch, count(*) AS n_docs,
         | CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM x GROUP BY source, epoch ORDER BY source, epoch""".stripMargin
    },

    "pipeline_observe_metrics" ->
      """SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
        | CAST(min(length(text)) AS BIGINT) AS min_len,
        | CAST(max(length(text)) AS BIGINT) AS max_len
        |FROM documents""".stripMargin,

    "ddl_analyze_stats" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "sql_parameterized" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderdate >= '1995-01-01' AND o_totalprice > 1000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "ddl_bucket_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "window_ewma" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, value FROM events),
        |w AS (SELECT event_id, user_id, value,
        |  list(value) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr
        | FROM e)
        |SELECT event_id, user_id, value,
        | list_reduce(arr, (acc_, x_) -> acc_ / 2 + x_ / 2) AS ewma
        |FROM w ORDER BY user_id, event_id""".stripMargin,

    "stream_ewma" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu, event_id, value FROM events),
        |o AS (SELECT user_id, list(value ORDER BY tsu, event_id) AS vs FROM e GROUP BY 1)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
        | list_reduce(vs, (a_, x_) -> a_ / 2 + x_ / 2) AS ewma
        |FROM o ORDER BY user_id""".stripMargin,

    "agg_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |        ORDER BY n DESC, l_quantity) AS rk FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n FROM r WHERE rk = 1
        |ORDER BY l_returnflag""".stripMargin,

    "funnel_steps" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s3 ON e.user_id = s3.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id)
        |SELECT 1 AS step, 'signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4
        |ORDER BY step""".stripMargin,

    // Last-touch attribution: per-user running last-click timestamp
    // (IGNORE NULLS window), purchases grouped by the attributed click's
    // day. Exact DECIMAL cent sums; double only at the edge.
    "stream_attribution" -> attributionSql,
    "funnel_attribution" -> attributionSql,

    "cohort_retention" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id)
        |SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
        | datediff('day', cohort_wk, wk) // 7 AS week_no,
        | count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY cohort_wk, week_no ORDER BY cohort_week, week_no""".stripMargin,

    // Streaming HLL: cross-batch register max-merge == one-shot sketch,
    // so the oracle is the batch HLL arithmetic (no exact column).
    "stream_hll" -> {
      val hv = s"((${ch("CAST(event_id % 997 AS VARCHAR)")}) * 2654435761) % 1000000007"
      s"""WITH h AS (SELECT DISTINCT event_type, $hv AS hv FROM events),
         |b AS (SELECT event_type, hv % 64 AS bucket, hv // 64 AS w FROM h),
         |r AS (SELECT event_type, bucket,
         |        CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END AS rho
         |      FROM b),
         |regs AS (SELECT event_type, bucket, max(rho) AS m FROM r GROUP BY event_type, bucket)
         |SELECT event_type,
         | CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) / (s_present + (64 - n_present)) AS hll_est
         |FROM (SELECT event_type,
         |        sum(1.0 / (CAST(1 AS BIGINT) << m)) AS s_present,
         |        count(*) AS n_present
         |      FROM regs GROUP BY event_type)
         |ORDER BY event_type""".stripMargin
    },

    "sketch_hll_distinct" -> {
      val hv = s"((${ch("CAST(event_id % 997 AS VARCHAR)")}) * 2654435761) % 1000000007"
      s"""WITH h AS (SELECT DISTINCT event_type, $hv AS hv FROM events),
         |b AS (SELECT event_type, hv % 64 AS bucket, hv // 64 AS w FROM h),
         |r AS (SELECT event_type, bucket,
         |        CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END AS rho
         |      FROM b),
         |regs AS (SELECT event_type, bucket, max(rho) AS m FROM r GROUP BY event_type, bucket),
         |est AS (SELECT event_type,
         |          sum(1.0 / (CAST(1 AS BIGINT) << m)) AS s_present,
         |          count(*) AS n_present
         |        FROM regs GROUP BY event_type),
         |ex AS (SELECT event_type, count(DISTINCT event_id % 997) AS exact FROM events GROUP BY event_type)
         |SELECT est.event_type,
         | CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) / (s_present + (64 - n_present)) AS hll_est,
         | ex.exact
         |FROM est JOIN ex ON ex.event_type = est.event_type
         |ORDER BY est.event_type""".stripMargin
    },

    "window_first_last" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu, value FROM events)
        |SELECT event_id, user_id, value,
        | first_value(value) OVER w AS first_v,
        | last_value(value) OVER w AS last_v,
        | nth_value(value, 2) OVER w AS second_v
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    // 2-itemset association rules: support / confidence (exact pct) /
    // lift (exact ppm) over distinct order baskets, min-support 5.
    "analytics_market_basket" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
        |no AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
        |it AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1),
        |pr AS (SELECT a.item AS x, c.item AS y, count(*) AS n_xy
        |       FROM b a JOIN b c ON a.ok = c.ok AND a.item < c.item
        |       GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT pr.x, pr.y, pr.n_xy,
        |  CAST((pr.n_xy * 100) // ix.n_item AS BIGINT) AS conf_xy_pct,
        |  CAST((pr.n_xy * 100) // iy.n_item AS BIGINT) AS conf_yx_pct,
        |  CAST((pr.n_xy * no.n_orders * 1000000) // (ix.n_item * iy.n_item) AS BIGINT) AS lift_ppm
        |FROM pr JOIN it ix ON pr.x = ix.item JOIN it iy ON pr.y = iy.item CROSS JOIN no
        |ORDER BY lift_ppm DESC, x, y LIMIT 20""".stripMargin,

    // Quantity-weighted price percentiles per return flag: identical
    // rank walk, per-bucket count = weight sum.
    "sketch_quantile_weighted" ->
      """WITH h AS (SELECT l_returnflag AS g,
        |             least(greatest(CAST(floor(l_extendedprice / 1000.0) AS BIGINT), 0), 99) AS b,
        |             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS c
        |           FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT g, b, c,
        |          sum(c) OVER (PARTITION BY g ORDER BY b
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          sum(c) OVER (PARTITION BY g) AS n
        |        FROM h),
        |p AS (SELECT unnest([50, 90, 99]) AS pct),
        |sel AS (SELECT cum.g, p.pct, cum.n, min(cum.b) AS bucket
        |        FROM cum, p WHERE cum.cum >= (cum.n * p.pct + 99) // 100
        |        GROUP BY 1, 2, 3)
        |SELECT g, CAST(pct AS BIGINT) AS pct, CAST(n AS BIGINT) AS n,
        | bucket, CAST((bucket + 1) * 1000.0 AS DOUBLE) AS est_upper
        |FROM sel ORDER BY g, pct""".stripMargin,

    "sketch_quantile_hist" ->
      """WITH h AS (SELECT event_type,
        |             least(greatest(CAST(floor(value / 5.0) AS BIGINT), 0), 99) AS b,
        |             count(*) AS c
        |           FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, b, c,
        |          sum(c) OVER (PARTITION BY event_type ORDER BY b
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          sum(c) OVER (PARTITION BY event_type) AS n
        |        FROM h),
        |p AS (SELECT unnest([50, 90, 99]) AS pct),
        |sel AS (SELECT cum.event_type, p.pct, cum.n, min(cum.b) AS bucket
        |        FROM cum, p WHERE cum.cum >= (cum.n * p.pct + 99) // 100
        |        GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(pct AS BIGINT) AS pct, CAST(n AS BIGINT) AS n,
        | bucket, CAST((bucket + 1) * 5.0 AS DOUBLE) AS est_upper
        |FROM sel ORDER BY event_type, pct""".stripMargin,

    "sketch_quantile_rollup" ->
      """WITH base AS (SELECT event_type,
        |                strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |                least(greatest(CAST(floor(value / 5.0) AS BIGINT), 0), 99) AS b
        |              FROM events),
        |daily AS (SELECT event_type, day, b, count(*) AS c FROM base GROUP BY 1, 2, 3),
        |merged AS (SELECT event_type, b, sum(c) AS c FROM daily GROUP BY 1, 2),
        |direct AS (SELECT event_type, b, count(*) AS c FROM base GROUP BY 1, 2),
        |p AS (SELECT unnest([50, 90, 99]) AS pct),
        |cm AS (SELECT event_type, b,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY b
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(c) OVER (PARTITION BY event_type) AS n FROM merged),
        |qr AS (SELECT cm.event_type, p.pct, min(cm.b) AS bucket
        |       FROM cm, p WHERE cm.cum >= (cm.n * p.pct + 99) // 100 GROUP BY 1, 2),
        |cd AS (SELECT event_type, b,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY b
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(c) OVER (PARTITION BY event_type) AS n FROM direct),
        |qd AS (SELECT cd.event_type, p.pct, min(cd.n) AS n, min(cd.b) AS bucket
        |       FROM cd, p WHERE cd.cum >= (cd.n * p.pct + 99) // 100 GROUP BY 1, 2)
        |SELECT qd.event_type, CAST(qd.pct AS BIGINT) AS pct, CAST(qd.n AS BIGINT) AS n,
        | CAST((qd.bucket + 1) * 5.0 AS DOUBLE) AS est_direct,
        | CAST((qr.bucket + 1) * 5.0 AS DOUBLE) AS est_rollup,
        | CAST(CASE WHEN qd.bucket = qr.bucket THEN 1 ELSE 0 END AS BIGINT) AS matches
        |FROM qd JOIN qr ON qd.event_type = qr.event_type AND qd.pct = qr.pct
        |ORDER BY qd.event_type, pct""".stripMargin,

    "sketch_hll_rollup" -> {
      val hv = s"((${ch("CAST(event_id % 997 AS VARCHAR)")}) * 2654435761) % 1000000007"
      s"""WITH h AS (SELECT DISTINCT event_type,
         |             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, $hv AS hv
         |           FROM events),
         |bd AS (SELECT event_type, day, hv % 64 AS bucket, hv // 64 AS w FROM h),
         |rd AS (SELECT event_type, day, bucket,
         |         CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END AS rho FROM bd),
         |daily AS (SELECT event_type, day, bucket, max(rho) AS m FROM rd GROUP BY 1, 2, 3),
         |rolled AS (SELECT event_type, bucket, max(m) AS m FROM daily GROUP BY 1, 2),
         |estR AS (SELECT event_type, sum(1.0 / (CAST(1 AS BIGINT) << m)) AS s, count(*) AS n
         |         FROM rolled GROUP BY 1),
         |h2 AS (SELECT DISTINCT event_type, $hv AS hv FROM events),
         |b2 AS (SELECT event_type, hv % 64 AS bucket, hv // 64 AS w FROM h2),
         |r2 AS (SELECT event_type, bucket,
         |         CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END AS rho FROM b2),
         |regs2 AS (SELECT event_type, bucket, max(rho) AS m FROM r2 GROUP BY 1, 2),
         |estD AS (SELECT event_type, sum(1.0 / (CAST(1 AS BIGINT) << m)) AS s, count(*) AS n
         |         FROM regs2 GROUP BY 1),
         |ex AS (SELECT event_type, count(DISTINCT event_id % 997) AS exact FROM events GROUP BY event_type)
         |SELECT estR.event_type,
         | CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) / (estR.s + (64 - estR.n)) AS hll_est_rollup,
         | CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) / (estD.s + (64 - estD.n)) AS hll_est_direct,
         | ex.exact
         |FROM estR
         |JOIN estD ON estD.event_type = estR.event_type
         |JOIN ex ON ex.event_type = estR.event_type
         |ORDER BY estR.event_type""".stripMargin
    },

    "sink_delete_keys" ->
      """SELECT event_type, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE user_id % 50 <> 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "pipeline_incremental_agg" ->
      """SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY event_type, event_date
        |ORDER BY event_type, event_date""".stripMargin,

    "ddl_bloom_index" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (7, 42, 101) ORDER BY o_orderkey""".stripMargin,

    "text_tfidf" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, unnest(w) AS term FROM w),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
         |n AS (SELECT count(*) AS n FROM documents),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |        tf.tf * ((n.n * 1000000) // df.df) AS score
         |      FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
         |      FROM s WHERE doc_id < 20)
         |SELECT doc_id, rk, term, tf, df, score FROM r WHERE rk <= 5
         |ORDER BY doc_id, rk""".stripMargin,

    "text_bm25" ->
      s"""$bm25Ctes
         |SELECT doc_id, CAST(sum(sm) AS BIGINT) AS bm25_micro FROM s GROUP BY doc_id
         |ORDER BY bm25_micro DESC, doc_id LIMIT 10""".stripMargin,

    // RAKE: stopword-split phrase islands, corpus-wide word deg/freq,
    // integer phrase scores over distinct candidates.
    "text_keywords_rake" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM w),
         |tt AS (SELECT doc_id, pos, w[pos] AS term FROM t),
         |cw AS (SELECT doc_id, pos, term,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
         |       FROM tt WHERE term NOT IN ('the', 'and', 'of', 'to', 'a', 'in', 'is')),
         |ph AS (SELECT doc_id, pos - rn AS isl,
         |         string_agg(term, ' ' ORDER BY pos) AS phrase, count(*) AS len
         |       FROM cw GROUP BY doc_id, pos - rn),
         |wd AS (SELECT phrase, len, unnest(string_split(phrase, ' ')) AS term FROM ph),
         |st AS (SELECT term, count(*) AS freq, CAST(sum(len) AS BIGINT) AS deg
         |       FROM wd GROUP BY 1),
         |dp AS (SELECT DISTINCT phrase FROM ph),
         |dw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS term FROM dp)
         |SELECT dw.phrase, count(*) AS n_words,
         |  CAST(sum((st.deg * 1000000) // st.freq) AS BIGINT) AS score_micro
         |FROM dw JOIN st USING (term)
         |GROUP BY dw.phrase ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin,

    // Bigram lift collocations: integer independence ratio, min-count 5.
    "text_collocations" ->
      s"""WITH w AS (SELECT doc_id, ${tok("text")} AS w FROM documents),
         |t AS (SELECT unnest(w) AS term FROM w),
         |uni AS (SELECT term, count(*) AS cu FROM t GROUP BY 1),
         |tot AS (SELECT count(*) AS nt FROM t),
         |bg0 AS (SELECT CASE WHEN len(w) >= 2
         |          THEN list_transform(generate_series(1, len(w) - 1), i_ -> w[i_] || ' ' || w[i_+1])
         |          ELSE CAST([] AS VARCHAR[]) END AS bgs FROM w),
         |bg AS (SELECT unnest(bgs) AS bg FROM bg0),
         |cb AS (SELECT bg, count(*) AS cxy FROM bg GROUP BY 1 HAVING count(*) >= 5),
         |sp AS (SELECT cxy, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2 FROM cb)
         |SELECT w1, w2, cxy,
         |  CAST((sp.cxy * tot.nt * 1000000) // (u1.cu * u2.cu) AS BIGINT) AS lift_ppm
         |FROM sp JOIN uni u1 ON sp.w1 = u1.term JOIN uni u2 ON sp.w2 = u2.term CROSS JOIN tot
         |ORDER BY lift_ppm DESC, w1, w2 LIMIT 20""".stripMargin,

    // Hybrid retrieval RRF mirror: same BM25 CTEs, dense leg = quantised
    // int dot vs the vec_id-0 probe, each leg top-50 → rank → full-outer
    // fuse, rrf = Σ 1e9 // (60 + rank).
    "text_rrf_fusion" ->
      s"""$bm25Ctes,
         |bm AS (SELECT doc_id, CAST(sum(sm) AS BIGINT) AS bm25_micro FROM s GROUP BY doc_id),
         |ltop AS (SELECT doc_id, bm25_micro FROM bm ORDER BY bm25_micro DESC, doc_id LIMIT 50),
         |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS r_lex FROM ltop),
         |pq AS (SELECT ${quant("embedding")} AS pqv FROM embeddings WHERE vec_id = 0),
         |ce AS (SELECT vec_id, ${quant("embedding")} AS qv FROM embeddings WHERE vec_id <> 0),
         |dd AS (SELECT ce.vec_id AS doc_id, ${qdotPair("ce.qv", "pq.pqv")} AS dot
         |       FROM ce CROSS JOIN pq),
         |dtop AS (SELECT doc_id, dot FROM dd ORDER BY dot DESC, doc_id LIMIT 50),
         |dr AS (SELECT doc_id, row_number() OVER (ORDER BY dot DESC, doc_id) AS r_dense FROM dtop),
         |f AS (SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.r_lex, d.r_dense
         |      FROM lexr l FULL OUTER JOIN dr d ON l.doc_id = d.doc_id)
         |SELECT doc_id,
         |  CAST(COALESCE(1000000000 // (60 + r_lex), 0)
         |     + COALESCE(1000000000 // (60 + r_dense), 0) AS BIGINT) AS rrf_micro,
         |  r_lex, r_dense
         |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,

    "project_variant" ->
      """SELECT event_type, count(k) AS n_k, CAST(sum(k) AS BIGINT) AS sum_k,
        | min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // batch-split-invariant running totals: the stream's final state per
    // user equals the one-shot aggregation
    "stream_transform_state" ->
      """SELECT user_id, count(*) AS n,
        | CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "join_partition_pruned" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(substring(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'), 9, 2) AS INTEGER) <= 5
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

  )
}
