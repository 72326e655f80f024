"""DuckDB oracle SQL paired with pipelines.queries.

The edge set is reproduced in *closed form* (the generator arithmetic of
sources/repo_table.py), so the SQL never parses content — which makes the
regex edge builder's output independently checkable. Iterative algorithms are
unrolled (PageRank K iterations, LPA K rounds) or expressed as recursive
reachability closures (CC, SSSP) — exact at sf0.01 scale.
"""

from __future__ import annotations

from ..sources.repo_table import HUB_EXTRA, HUB_MOD, SQUARE_MOD
from ..ids import KNUTH_MIX
from .queries import LPA_LABEL_MOD

# shared CTE prefix: the closed-form doc edge set + vertex universe
EDGES_CTE = f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
dk AS (SELECT doc_id AS i,
              1 + (doc_id % 4)
                + CASE WHEN (doc_id * {KNUTH_MIX}) % {HUB_MOD} = 0 THEN {HUB_EXTRA} ELSE 0 END AS k
       FROM documents),
raw AS (SELECT i, unnest(range(1, k + 1)) AS j FROM dk),
tgt AS (SELECT raw.i, (raw.i + (raw.i * raw.i) % {SQUARE_MOD} + raw.j * {KNUTH_MIX}) % nn.n AS t
        FROM raw CROSS JOIN nn),
e AS (SELECT DISTINCT i AS src, t AS dst FROM tgt WHERE t <> i),
verts AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e)
"""

DEGREES_CTE = """
, outd AS (SELECT src AS v, count(*) AS c FROM e GROUP BY src),
ind  AS (SELECT dst AS v, count(*) AS c FROM e GROUP BY dst),
degs AS (SELECT verts.v AS vid,
                COALESCE(outd.c, 0) AS out_deg,
                COALESCE(ind.c, 0)  AS in_deg,
                COALESCE(outd.c, 0) + COALESCE(ind.c, 0) AS deg
         FROM verts LEFT JOIN outd ON outd.v = verts.v LEFT JOIN ind ON ind.v = verts.v)
"""


def sql_edge_extract() -> str:
    return EDGES_CTE + "SELECT src, dst FROM e"


def sql_degree_table() -> str:
    return EDGES_CTE + DEGREES_CTE + "SELECT vid, out_deg, in_deg, deg FROM degs"


def sql_degree_top20() -> str:
    return EDGES_CTE + DEGREES_CTE + (
        "SELECT vid, out_deg, in_deg, deg FROM degs ORDER BY deg DESC, vid ASC LIMIT 20"
    )


def sql_degree_histogram() -> str:
    return EDGES_CTE + DEGREES_CTE + (
        "SELECT deg, count(*) AS n_vertices FROM degs GROUP BY deg ORDER BY deg"
    )


def sql_pagerank_k(k: int = 5) -> str:
    parts = [EDGES_CTE + DEGREES_CTE]
    parts.append(", r0 AS (SELECT v, 1.0::DOUBLE AS r FROM verts)")
    for i in range(1, k + 1):
        parts.append(f""",
r{i} AS (SELECT verts.v,
               0.15 + 0.85 * COALESCE(s.x, 0.0) AS r
        FROM verts LEFT JOIN (
            SELECT e.dst AS v, sum(p.r / outd.c) AS x
            FROM e JOIN r{i-1} p ON p.v = e.src JOIN outd ON outd.v = e.src
            GROUP BY e.dst) s ON s.v = verts.v)""")
    parts.append(f"\nSELECT v AS vid, round(r, 6) AS rank FROM r{k}")
    return "".join(parts)


def sql_weighted_pagerank_k(k: int = 5) -> str:
    """Weighted PageRank unrolled: contribution = r·w/strength with the
    same closed-form integer weights as sql_sssp_weighted (1+(src+dst)%9),
    strength = Σ out-weights — mirrors algorithms.py WeightedPageRankVP."""
    parts = [EDGES_CTE]
    parts.append(""",
we AS (SELECT src, dst, (1 + (src + dst) % 9)::DOUBLE AS w FROM e),
strn AS (SELECT src AS v, sum(w) AS s FROM we GROUP BY src),
r0 AS (SELECT v, 1.0::DOUBLE AS r FROM verts)""")
    for i in range(1, k + 1):
        parts.append(f""",
r{i} AS (SELECT verts.v,
               0.15 + 0.85 * COALESCE(s.x, 0.0) AS r
        FROM verts LEFT JOIN (
            SELECT we.dst AS v, sum(p.r * we.w / strn.s) AS x
            FROM we JOIN r{i-1} p ON p.v = we.src JOIN strn ON strn.v = we.src
            GROUP BY we.dst) s ON s.v = verts.v)""")
    parts.append(f"\nSELECT v AS vid, round(r, 6) AS rank FROM r{k}")
    return "".join(parts)


def sql_hits_k(k: int = 5) -> str:
    """HITS unrolled: simultaneous update (a_i from h_{i-1}, h_i from
    a_{i-1}), unnormalized through the iterations, final L1 normalization —
    mirrors graph/algorithms.py HITSVP exactly."""
    parts = [EDGES_CTE]
    parts.append(", h0 AS (SELECT v, 1.0::DOUBLE AS h, 1.0::DOUBLE AS a "
                 "FROM verts)")
    for i in range(1, k + 1):
        parts.append(f""",
h{i} AS (SELECT verts.v,
               COALESCE(hs.x, 0.0) AS h,
               COALESCE(auth.x, 0.0) AS a
        FROM verts
        LEFT JOIN (SELECT e.src AS v, sum(p.a) AS x
                   FROM e JOIN h{i-1} p ON p.v = e.dst GROUP BY e.src) hs
               ON hs.v = verts.v
        LEFT JOIN (SELECT e.dst AS v, sum(p.h) AS x
                   FROM e JOIN h{i-1} p ON p.v = e.src GROUP BY e.dst) auth
               ON auth.v = verts.v)""")
    parts.append(f"""
SELECT v AS vid,
       round(h / (SELECT sum(h) FROM h{k}), 6) AS hub,
       round(a / (SELECT sum(a) FROM h{k}), 6) AS auth
FROM h{k}""")
    return "".join(parts)


def sql_degree_assortativity() -> str:
    """Newman assortativity replay (stages/degrees.degree_assortativity):
    the same integer sufficient statistics over the simple undirected
    graph, one final double division."""
    return EDGES_CTE + """,
cp AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
nbr AS (SELECT a AS v, b AS n FROM cp UNION SELECT b, a FROM cp),
deg2 AS (SELECT v, count(*)::BIGINT AS deg FROM nbr GROUP BY v),
tt AS (SELECT nbr.v AS v, sum(d2.deg) AS t
       FROM nbr JOIN deg2 d2 ON d2.v = nbr.n GROUP BY nbr.v),
st AS (SELECT sum(deg) AS m, sum(deg * deg) AS sx,
              sum(deg * deg * deg) AS sxx FROM deg2),
sy AS (SELECT sum(deg2.deg * tt.t) AS sxy
       FROM deg2 JOIN tt ON tt.v = deg2.v)
SELECT COALESCE((st.m * sy.sxy - st.sx * st.sx)::DOUBLE
         / NULLIF(st.m * st.sxx - st.sx * st.sx, 0), 0.0) AS assortativity,
       st.m::BIGINT AS n_samples
FROM st, sy
"""


def sql_edge_reciprocity() -> str:
    """Directed reciprocity replay (stages/degrees.edge_reciprocity):
    distinct directed edges whose reverse exists / all distinct directed
    edges (self-edges already excluded by the edge builder)."""
    return EDGES_CTE + """,
rc AS (SELECT count(*)::BIGINT AS n FROM e x
       JOIN e y ON y.src = x.dst AND y.dst = x.src),
tot AS (SELECT count(*)::BIGINT AS n FROM e)
SELECT COALESCE(rc.n::DOUBLE / NULLIF(tot.n, 0), 0.0) AS reciprocity,
       tot.n AS n_directed
FROM rc, tot
"""


def sql_katz_k(k: int = 5, alpha: float = 1 / 16, beta: float = 1.0) -> str:
    """Katz centrality unrolled (graph/algorithms.py KatzVP): x_0 = 0,
    x_i = α·(in-edge sum of x_{i-1}) + β. The default α=1/16 keeps every
    intermediate an exact dyadic float64, so the comparison is bit-exact
    (no order-sensitive rounding-boundary flips at 6 dp)."""
    parts = [EDGES_CTE]
    parts.append(", k0 AS (SELECT v, 0.0::DOUBLE AS x FROM verts)")
    for i in range(1, k + 1):
        parts.append(f""",
k{i} AS (SELECT verts.v, {alpha!r} * COALESCE(s.x, 0.0) + {beta!r} AS x
        FROM verts LEFT JOIN (
            SELECT e.dst AS v, sum(p.x) AS x
            FROM e JOIN k{i-1} p ON p.v = e.src GROUP BY e.dst) s
          ON s.v = verts.v)""")
    parts.append(f"\nSELECT v AS vid, round(x, 6) AS katz FROM k{k}")
    return "".join(parts)


def sql_eigencentrality_k(k: int = 5) -> str:
    """Eigenvector centrality unrolled (EigenvectorCentralityVP): x_0 = 1,
    x_i = in-edge sum of x_{i-1}, final L2 normalization."""
    parts = [EDGES_CTE]
    parts.append(", g0 AS (SELECT v, 1.0::DOUBLE AS x FROM verts)")
    for i in range(1, k + 1):
        parts.append(f""",
g{i} AS (SELECT verts.v, COALESCE(s.x, 0.0) AS x
        FROM verts LEFT JOIN (
            SELECT e.dst AS v, sum(p.x) AS x
            FROM e JOIN g{i-1} p ON p.v = e.src GROUP BY e.dst) s
          ON s.v = verts.v)""")
    parts.append(f""",
nrm AS (SELECT sqrt(sum(x * x)) AS n FROM g{k})
SELECT v AS vid,
       CASE WHEN nrm.n = 0 THEN 0.0 ELSE round(x / nrm.n, 6) END AS eigen
FROM g{k}, nrm""")
    return "".join(parts)


def sql_ppr_k(source: int = 0, k: int = 5) -> str:
    """Personalized PageRank unrolled: reset mass 0.15 on the source only
    (unnormalized reference formulation), init = e_source."""
    parts = [EDGES_CTE + DEGREES_CTE]
    parts.append(f", r0 AS (SELECT v, CASE WHEN v = {source} THEN 1.0 "
                 "ELSE 0.0 END::DOUBLE AS r FROM verts)")
    for i in range(1, k + 1):
        parts.append(f""",
r{i} AS (SELECT verts.v,
               CASE WHEN verts.v = {source} THEN 0.15 ELSE 0.0 END
                 + 0.85 * COALESCE(s.x, 0.0) AS r
        FROM verts LEFT JOIN (
            SELECT e.dst AS v, sum(p.r / outd.c) AS x
            FROM e JOIN r{i-1} p ON p.v = e.src JOIN outd ON outd.v = e.src
            GROUP BY e.dst) s ON s.v = verts.v)""")
    parts.append(f"\nSELECT v AS vid, round(r, 6) AS score FROM r{k}")
    return "".join(parts)


def sql_ppr_nibble(source: int = 0, k: int = 5, m: int = 100) -> str:
    """PageRank-Nibble sweep-cut replay (graph/toolkit.py ppr_nibble):
    rank by (round6(ppr) DESC, v), sweep prefixes r = 1..m on the simple
    undirected graph, conductance = cut / min(vol, tot−vol) — exact integer
    ratios, so the argmin (ties → smallest r) matches the engine's."""
    ppr = sql_ppr_k(source, k)
    head, final = ppr.rsplit("\nSELECT", 1)
    assert final.startswith(" v AS vid")
    return f"""{head},
rk AS (SELECT v, row_number() OVER (ORDER BY round(r, 6) DESC, v) AS rnk
       FROM r{k}),
topm AS (SELECT v, rnk FROM rk WHERE rnk <= {m}),
cp AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
tot AS (SELECT 2 * count(*)::BIGINT AS t FROM cp),
cpr AS (SELECT COALESCE(ta.rnk, {m} + 1) AS ra, COALESCE(tb.rnk, {m} + 1) AS rb
        FROM cp LEFT JOIN topm ta ON ta.v = cp.a
                LEFT JOIN topm tb ON tb.v = cp.b),
rr AS (SELECT unnest(range(1, {m} + 1)) AS r),
cuts AS (SELECT rr.r,
                (SELECT count(*) FROM cpr
                 WHERE least(ra, rb) <= rr.r AND rr.r < greatest(ra, rb))
                  AS cut,
                (SELECT count(*) FROM cp JOIN topm tx
                   ON (tx.v = cp.a OR tx.v = cp.b) AND tx.rnk <= rr.r)
                  AS vol  -- both-endpoint edges match tx twice = Σ deg
         FROM rr),
phis AS (SELECT r, cut, vol,
                cut::DOUBLE / least(vol, (SELECT t FROM tot) - vol) AS phi
         FROM cuts
         WHERE least(vol, (SELECT t FROM tot) - vol) > 0),
best AS (SELECT r, round(phi, 6) AS phi FROM phis
         ORDER BY round(phi, 6) ASC, r ASC LIMIT 1)
SELECT t.v AS vid, t.rnk AS rank, (SELECT phi FROM best) AS phi
FROM topm t WHERE t.rnk <= (SELECT r FROM best)
"""


def sql_cc_labels() -> str:
    # min-reachable-id closure: exact fixed point, no iteration-count tuning
    return f"""
WITH RECURSIVE nn AS (SELECT count(*)::BIGINT AS n FROM documents),
dk AS (SELECT doc_id AS i,
              1 + (doc_id % 4)
                + CASE WHEN (doc_id * {KNUTH_MIX}) % {HUB_MOD} = 0 THEN {HUB_EXTRA} ELSE 0 END AS k
       FROM documents),
raw AS (SELECT i, unnest(range(1, k + 1)) AS j FROM dk),
tgt AS (SELECT raw.i, (raw.i + (raw.i * raw.i) % {SQUARE_MOD} + raw.j * {KNUTH_MIX}) % nn.n AS t
        FROM raw CROSS JOIN nn),
e AS (SELECT DISTINCT i AS src, t AS dst FROM tgt WHERE t <> i),
verts AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e),
reach(v, l) AS (
    SELECT v, v FROM verts
    UNION
    SELECT und.b, reach.l FROM reach JOIN und ON reach.v = und.a
)
SELECT v AS vid, min(l) AS label FROM reach GROUP BY v
"""


def sql_scc() -> str:
    """SCC = equivalence classes of MUTUAL directed reachability; canonical
    id = minimum member vid. Exact closure — no iteration tuning — feasible
    at sf<=0.01 scale (pairs <= nv^2)."""
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
reach(l, v) AS (
    SELECT v, v FROM verts
    UNION
    SELECT reach.l, e.dst FROM reach JOIN e ON reach.v = e.src
),
mutual AS (
    SELECT r1.v AS v, r1.l AS l
    FROM reach r1 JOIN reach r2 ON r1.l = r2.v AND r1.v = r2.l
)
SELECT v AS vid, min(l) AS scc FROM mutual GROUP BY v
"""


def sql_scc_condensation() -> str:
    """Condensation DAG: relabel each directed edge by the endpoint SCC ids
    (from the same mutual-reachability closure as sql_scc) and count the
    cross-SCC pairs."""
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
reach(l, v) AS (
    SELECT v, v FROM verts
    UNION
    SELECT reach.l, e.dst FROM reach JOIN e ON reach.v = e.src
),
mutual AS (
    SELECT r1.v AS v, r1.l AS l
    FROM reach r1 JOIN reach r2 ON r1.l = r2.v AND r1.v = r2.l
),
lab AS (SELECT v AS vid, min(l) AS scc FROM mutual GROUP BY v)
SELECT s1.scc AS scc_src, s2.scc AS scc_dst, count(*)::BIGINT AS n_edges
FROM e JOIN lab s1 ON e.src = s1.vid JOIN lab s2 ON e.dst = s2.vid
WHERE s1.scc <> s2.scc
GROUP BY s1.scc, s2.scc
"""


def sql_densest_subgraph(eps: float = 0.1) -> str:
    """Bahmani greedy densest-subgraph peeling replay (toolkit.py
    densest_subgraph): list-state recursion — each row carries the
    cumulative dead set and the density ρ measured at that round's start;
    the threshold is the LITERAL ``2(1+ε) * (E/V)`` double expression the
    Ray side computes, so the comparisons hit identical doubles."""
    mult = repr(2.0 * (1.0 + eps))
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
cp AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                                    greatest(src, dst) AS b FROM e),
v2 AS MATERIALIZED (SELECT DISTINCT v FROM
                    (SELECT a AS v FROM cp UNION ALL SELECT b FROM cp)),
u2 AS MATERIALIZED (SELECT a AS x, b AS y FROM cp
                    UNION ALL SELECT b, a FROM cp),
nvv AS (SELECT count(*)::BIGINT AS n FROM v2),
p(it, dead, rho) AS (
  SELECT 0::BIGINT, []::BIGINT[], 0.0::DOUBLE
  UNION ALL
  SELECT p.it + 1,
         (SELECT coalesce(list(v2.v), []) FROM v2
          WHERE list_contains(p.dead, v2.v)
             OR (SELECT count(*) FROM u2
                 WHERE u2.x = v2.v AND NOT list_contains(p.dead, u2.y))
                <= {mult} * rr.rho),
         rr.rho
  FROM p, LATERAL (
      SELECT (SELECT count(*) FROM cp
              WHERE NOT list_contains(p.dead, cp.a)
                AND NOT list_contains(p.dead, cp.b))::DOUBLE
             / ((SELECT n FROM nvv) - len(p.dead)) AS rho) rr
  WHERE len(p.dead) < (SELECT n FROM nvv)
),
best AS (SELECT it FROM p WHERE it >= 1 ORDER BY rho DESC, it ASC LIMIT 1),
pr AS (SELECT v2.v AS vid,
              (SELECT min(p.it) FROM p
               WHERE list_contains(p.dead, v2.v)) AS peel_round
       FROM v2)
SELECT vid, peel_round,
       peel_round >= (SELECT it FROM best) AS in_densest
FROM pr
"""


def sql_edge_jaccard() -> str:
    """Per-edge neighbor Jaccard (graph/ktruss.py edge_jaccard): common
    neighbors of the endpoints over the distinct undirected simple graph,
    emitted for edges with ≥ 1 common neighbor."""
    return EDGES_CTE + """,
cp AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
nbr AS (SELECT a AS v, b AS n FROM cp UNION SELECT b, a FROM cp),
deg2 AS (SELECT v, count(*) AS deg FROM nbr GROUP BY v),
inter AS (SELECT cp.a, cp.b, count(*) AS sup
          FROM cp JOIN nbr x ON x.v = cp.a JOIN nbr y
            ON y.v = cp.b AND y.n = x.n
          GROUP BY cp.a, cp.b)
SELECT i.a AS ea, i.b AS eb,
       round(i.sup::DOUBLE / (da.deg - 1 + db.deg - 1 - i.sup), 6) AS jac
FROM inter i JOIN deg2 da ON da.v = i.a JOIN deg2 db ON db.v = i.b
"""


def sql_local_sparsify(e: float = 0.5) -> str:
    """Satuluri sparsifier replay (graph/ktruss.local_sparsify): per-vertex
    top-⌈deg^e⌉ incident edges by (round6 jaccard DESC, nbr ASC); an edge
    survives if either endpoint keeps it. ``ceiling(pow(deg, e))`` hits
    identical doubles in both engines for e=0.5 (sqrt of an integer —
    exact for perfect squares, far from integer boundaries otherwise)."""
    return EDGES_CTE + f""",
cp AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
nbr AS (SELECT a AS v, b AS n FROM cp UNION SELECT b, a FROM cp),
deg2 AS (SELECT v, count(*) AS deg FROM nbr GROUP BY v),
inter AS (SELECT cp.a, cp.b, count(*) AS sup
          FROM cp JOIN nbr x ON x.v = cp.a JOIN nbr y
            ON y.v = cp.b AND y.n = x.n
          GROUP BY cp.a, cp.b),
jc AS (SELECT cp.a, cp.b,
              COALESCE(round(i.sup::DOUBLE
                / (da.deg - 1 + db.deg - 1 - i.sup), 6), 0.0) AS jac
       FROM cp LEFT JOIN inter i ON i.a = cp.a AND i.b = cp.b
               JOIN deg2 da ON da.v = cp.a JOIN deg2 db ON db.v = cp.b),
op AS (SELECT a AS v, b AS nbr, jac FROM jc
       UNION ALL SELECT b, a, jac FROM jc),
rk AS (SELECT v, nbr, jac,
              row_number() OVER (PARTITION BY v
                                 ORDER BY jac DESC, nbr ASC) AS rn
       FROM op),
keep AS (SELECT rk.v, rk.nbr, rk.jac FROM rk JOIN deg2 ON deg2.v = rk.v
         WHERE rk.rn <= ceiling(pow(deg2.deg, {e!r})))
SELECT DISTINCT least(v, nbr) AS a, greatest(v, nbr) AS b, jac FROM keep
"""


def sql_maximal_matching(seed: int = 7, max_rounds: int = 200) -> str:
    """Maximal-matching replay (graph/toolkit.maximal_matching): list-state
    recursion carrying the covered-vertex set; each round's selected edges
    (priority minimal at BOTH endpoints, exact 63-bit splitmix priorities)
    are re-derived join-based from the round's covered state — both in the
    recursive covered-accumulation step and in the final output pass."""
    from ..graph.toolkit import _MM_C1, _MM_C2, _MM_C3
    from ..ids import integer_mix

    seedmix = int(integer_mix(seed))

    def prio(a: str, b: str, r: str) -> str:
        x = (f"xor(xor(({_sm64_mulmod(a, int(_MM_C1))})::UBIGINT, "
             f"({_sm64_mulmod(b, int(_MM_C2))})::UBIGINT), "
             f"xor(({_sm64_mulmod(r, int(_MM_C3))})::UBIGINT, "
             f"{seedmix}::UBIGINT))")
        return f"(({_sm64_mix(f'({x})::HUGEINT')}) // 2)::BIGINT"

    def alive(cov: str, rnd: str) -> str:
        return (f"(SELECT cp.a, cp.b, {prio('cp.a', 'cp.b', rnd)} AS p "
                f"FROM cp WHERE NOT list_contains({cov}, cp.a) "
                f"AND NOT list_contains({cov}, cp.b))")

    def vmin(cov: str, rnd: str) -> str:
        al = alive(cov, rnd)
        return (f"(SELECT v, min(p) AS mp FROM "
                f"(SELECT a AS v, p FROM {al} x1 UNION ALL "
                f"SELECT b, p FROM {al} x2) u GROUP BY v)")

    def sel(cov: str, rnd: str) -> str:
        return (f"(SELECT al.a, al.b FROM {alive(cov, rnd)} al "
                f"JOIN {vmin(cov, rnd)} va ON va.v = al.a AND va.mp = al.p "
                f"JOIN {vmin(cov, rnd)} vb ON vb.v = al.b AND vb.mp = al.p)")

    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
cp AS (SELECT DISTINCT least(src, dst) AS a,
              greatest(src, dst) AS b FROM e),
-- NOTE: cp must NOT be MATERIALIZED — DuckDB silently stops the recursion
-- at the base row when the recursive term's correlated subqueries read a
-- materialized CTE (observed on 0.10-line engines; plain CTE recurses)
r(rnd, covered) AS (
  SELECT 0::BIGINT, []::BIGINT[]
  UNION ALL
  SELECT r.rnd + 1, r.covered || rr.newcov
  FROM r, LATERAL (
      SELECT coalesce(flatten(list([q.a, q.b])), []) AS newcov
      FROM {sel('r.covered', 'r.rnd')} q
  ) rr
  WHERE r.rnd < {int(max_rounds)}
    AND EXISTS (SELECT 1 FROM cp
                WHERE NOT list_contains(r.covered, cp.a)
                  AND NOT list_contains(r.covered, cp.b))
)
SELECT q.a, q.b, r.rnd AS round
FROM r, LATERAL (SELECT * FROM {sel('r.covered', 'r.rnd')} s) q
WHERE r.rnd < {int(max_rounds)}
"""


def sql_vertex_cover(seed: int = 7) -> str:
    """Vertex cover = distinct matched endpoints of the maximal matching."""
    mm = sql_maximal_matching(seed)
    return (f"WITH mm AS ({mm})\n"
            "SELECT DISTINCT v AS vid FROM "
            "(SELECT a AS v FROM mm UNION ALL SELECT b FROM mm) u")


def sql_dag_depth() -> str:
    """Longest-path depth per SCC over the condensation DAG (graph/scc.py
    dag_depth): the same mutual-reachability closure as sql_scc, distinct
    cross-SCC pairs, then a second recursive walk — UNION-dedup on (v, d)
    keeps the row set ≤ |SCC|·maxdepth and the DAG guarantees termination."""
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
reach(l, v) AS (
    SELECT v, v FROM verts
    UNION
    SELECT reach.l, e.dst FROM reach JOIN e ON reach.v = e.src
),
mutual AS (
    SELECT r1.v AS v, r1.l AS l
    FROM reach r1 JOIN reach r2 ON r1.l = r2.v AND r1.v = r2.l
),
lab AS (SELECT v AS vid, min(l) AS scc FROM mutual GROUP BY v),
cond AS (SELECT DISTINCT s1.scc AS a, s2.scc AS b
         FROM e JOIN lab s1 ON e.src = s1.vid JOIN lab s2 ON e.dst = s2.vid
         WHERE s1.scc <> s2.scc),
walk(v, d) AS (
    SELECT DISTINCT scc, 0::BIGINT FROM lab
    UNION
    SELECT cond.b, walk.d + 1 FROM walk JOIN cond ON cond.a = walk.v
)
SELECT v AS scc_id, max(d) AS depth FROM walk GROUP BY v
"""


def sql_mis(max_hops: int = 48) -> str:
    """Maximal independent set = the color-0 class of the degree-ordered
    coloring replay (see sql_coloring_variants for the BSP recursion)."""
    return f"""
WITH cv AS ({sql_coloring_variants(max_hops)})
SELECT vid FROM cv WHERE variant = 'degree' AND color = 0
"""


def sql_sssp_hops(source: int = 0) -> str:
    return f"""
WITH RECURSIVE nn AS (SELECT count(*)::BIGINT AS n FROM documents),
dk AS (SELECT doc_id AS i,
              1 + (doc_id % 4)
                + CASE WHEN (doc_id * {KNUTH_MIX}) % {HUB_MOD} = 0 THEN {HUB_EXTRA} ELSE 0 END AS k
       FROM documents),
raw AS (SELECT i, unnest(range(1, k + 1)) AS j FROM dk),
tgt AS (SELECT raw.i, (raw.i + (raw.i * raw.i) % {SQUARE_MOD} + raw.j * {KNUTH_MIX}) % nn.n AS t
        FROM raw CROSS JOIN nn),
e AS (SELECT DISTINCT i AS src, t AS dst FROM tgt WHERE t <> i),
und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e),
walk(v, d) AS (
    SELECT {source}::BIGINT, 0::BIGINT
    UNION
    SELECT und.b, walk.d + 1 FROM walk JOIN und ON walk.v = und.a WHERE walk.d < 600
)
SELECT v AS vid, min(d) AS dist FROM walk GROUP BY v
"""


def sql_sssp_weighted(source: int = 0, cost_bound: int = 400) -> str:
    """Weighted shortest paths as a recursive cost closure: integer edge
    weights ``1 + (src + dst) % 9`` keep the (v, cost) state space finite so
    the UNION-deduped recursion terminates; ``cost_bound`` caps path cost
    well above the true weighted diameter at oracle scale."""
    return f"""
WITH RECURSIVE nn AS (SELECT count(*)::BIGINT AS n FROM documents),
dk AS (SELECT doc_id AS i,
              1 + (doc_id % 4)
                + CASE WHEN (doc_id * {KNUTH_MIX}) % {HUB_MOD} = 0 THEN {HUB_EXTRA} ELSE 0 END AS k
       FROM documents),
raw AS (SELECT i, unnest(range(1, k + 1)) AS j FROM dk),
tgt AS (SELECT raw.i, (raw.i + (raw.i * raw.i) % {SQUARE_MOD} + raw.j * {KNUTH_MIX}) % nn.n AS t
        FROM raw CROSS JOIN nn),
e AS (SELECT DISTINCT i AS src, t AS dst FROM tgt WHERE t <> i),
und AS (SELECT src AS a, dst AS b, 1 + (src + dst) % 9 AS w FROM e
        UNION ALL SELECT dst, src, 1 + (src + dst) % 9 FROM e),
walk(v, c) AS (
    SELECT {source}::BIGINT, 0::BIGINT
    UNION
    SELECT und.b, walk.c + und.w FROM walk JOIN und ON walk.v = und.a
    WHERE walk.c < {cost_bound}
)
SELECT v AS vid, min(c) AS dist FROM walk GROUP BY v
"""


TRI_CTE = """
, ced AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM e GROUP BY 1, 2),
cdeg AS (SELECT v, count(*) AS deg FROM (SELECT a AS v FROM ced UNION ALL SELECT b FROM ced) GROUP BY v),
oe AS (SELECT CASE WHEN (da.deg, ced.a) < (db.deg, ced.b) THEN ced.a ELSE ced.b END AS u,
              CASE WHEN (da.deg, ced.a) < (db.deg, ced.b) THEN ced.b ELSE ced.a END AS v
       FROM ced JOIN cdeg da ON da.v = ced.a JOIN cdeg db ON db.v = ced.b),
tri AS (SELECT t1.u AS x, t1.v AS y, t2.v AS z
        FROM oe t1 JOIN oe t2 ON t2.u = t1.v JOIN oe t3 ON t3.u = t1.u AND t3.v = t2.v)
"""


def sql_triangle_total() -> str:
    return EDGES_CTE + TRI_CTE + "SELECT count(*)::BIGINT AS n_triangles FROM tri"


def sql_triangle_per_vertex() -> str:
    return EDGES_CTE + TRI_CTE + """
, corners AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
cnt AS (SELECT v, count(*) AS n FROM corners GROUP BY v)
SELECT verts.v AS vid, COALESCE(cnt.n, 0) AS n_tri FROM verts LEFT JOIN cnt ON cnt.v = verts.v
"""


def sql_clustering_coeff() -> str:
    """Per-vertex local clustering coefficient — mirrors
    queries.q_clustering_coeff (undirected simple graph: distinct-neighbor
    degree; lcc = 0 when nbrs < 2)."""
    return EDGES_CTE + TRI_CTE + """
, corners AS (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
cnt AS (SELECT v, count(*) AS n FROM corners GROUP BY v),
nb AS (SELECT a AS v, count(DISTINCT b) AS nbrs FROM und GROUP BY a)
SELECT verts.v AS vid,
       COALESCE(cnt.n, 0) AS n_tri,
       nb.nbrs AS nbrs,
       round(CASE WHEN nb.nbrs >= 2
                  THEN 2.0 * COALESCE(cnt.n, 0) / (nb.nbrs * (nb.nbrs - 1.0))
                  ELSE 0.0 END, 6) AS lcc
FROM verts JOIN nb ON nb.v = verts.v LEFT JOIN cnt ON cnt.v = verts.v
"""


def sql_link_prediction_topk(k: int = 20,
                             max_center_degree: int | None = 2000) -> str:
    """Adamic–Adar link prediction — mirrors linkpred.link_prediction_topk
    (distinct undirected adjacency; the k-boundary orders on the ROUNDED
    aa so both engines cut identically). ``max_center_degree`` mirrors the
    Ray side's default skew cap (centers above the ceiling emit no
    wedges); ``None`` = the exact uncut metric."""
    cap = ("" if max_center_degree is None
           else f" AND deg.d <= {int(max_center_degree)}")
    return EDGES_CTE + f"""
, nb AS (SELECT DISTINCT a, b FROM und),
deg AS (SELECT a AS v, count(*) AS d FROM nb GROUP BY a),
wed AS (SELECT n1.b AS u, n2.b AS w, n1.a AS c
        FROM nb n1 JOIN nb n2 ON n1.a = n2.a AND n1.b < n2.b),
agg AS (SELECT u, w, count(*) AS cn, sum(1.0 / ln(deg.d)) AS aa
        FROM wed JOIN deg ON deg.v = wed.c{cap} GROUP BY u, w),
ex AS (SELECT a AS u, b AS w FROM nb WHERE a < b)
SELECT agg.u, agg.w, agg.cn, round(agg.aa, 6) AS aa
FROM agg ANTI JOIN ex ON agg.u = ex.u AND agg.w = ex.w
ORDER BY round(agg.aa, 6) DESC, agg.u ASC, agg.w ASC LIMIT {k}
"""


def sql_copurchase_topk(k: int = 20,
                        max_center_degree: int | None = 2000) -> str:
    """Bipartite co-purchase projection — mirrors queries.q_copurchase_top20
    (part ids namespaced above orders; only part×part wedge pairs survive;
    part pairs are never edges so no exclusion join is needed).
    ``max_center_degree`` mirrors the Ray side's default skew cap."""
    off = 1 << 40
    cap = ("" if max_center_degree is None
           else f" AND deg.d <= {int(max_center_degree)}")
    return f"""
WITH e AS (SELECT DISTINCT l_orderkey AS src, l_partkey + {off} AS dst
           FROM lineitem),
und AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e),
nb AS (SELECT DISTINCT a, b FROM und),
deg AS (SELECT a AS v, count(*) AS d FROM nb GROUP BY a),
wed AS (SELECT n1.b AS u, n2.b AS w, n1.a AS c
        FROM nb n1 JOIN nb n2 ON n1.a = n2.a AND n1.b < n2.b),
agg AS (SELECT u, w, count(*) AS cn, sum(1.0 / ln(deg.d)) AS aa
        FROM wed JOIN deg ON deg.v = wed.c{cap}
        WHERE u >= {off} GROUP BY u, w)
SELECT u - {off} AS part_a, w - {off} AS part_b, cn, round(aa, 6) AS aa
FROM agg ORDER BY round(aa, 6) DESC, part_a ASC, part_b ASC LIMIT {k}
"""


def sql_lpa_k(k: int = 4) -> str:
    parts = [EDGES_CTE]
    parts.append(f", l0 AS (SELECT v, 'c' || (v % {LPA_LABEL_MOD})::VARCHAR AS label FROM verts)")
    for i in range(1, k + 1):
        parts.append(f""",
l{i} AS (SELECT verts.v, COALESCE(w.label, p.label) AS label
        FROM verts JOIN l{i-1} p ON p.v = verts.v
        LEFT JOIN (
            SELECT v, label FROM (
                SELECT x.a AS v, l.label, count(*) AS cnt,
                       row_number() OVER (PARTITION BY x.a ORDER BY count(*) DESC, l.label ASC) AS rn
                FROM und x JOIN l{i-1} l ON l.v = x.b
                GROUP BY x.a, l.label)
            WHERE rn = 1) w ON w.v = verts.v)""")
    parts.append(f"\nSELECT v AS vid, label FROM l{k}")
    return "".join(parts)


def sql_lpa_modularity(k: int = 4) -> str:
    """Modularity of the LPA-k labeling (stages/degrees.
    partition_modularity): Q = Σ_c [e_c/m − (d_c/(2m))²] over the simple
    undirected graph — integer community counts, one float fold (the
    Σ over communities differs only in summation order ~1e-15)."""
    lpa = sql_lpa_k(k)
    head, _ = lpa.rsplit("\nSELECT v AS vid", 1)
    return f"""{head},
lab AS (SELECT v, label FROM l{k}),
cp AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
op AS (SELECT a, b FROM cp UNION ALL SELECT b, a FROM cp),
pr AS (SELECT la.label AS la, lb.label AS lb
       FROM op JOIN lab la ON la.v = op.a JOIN lab lb ON lb.v = op.b),
comm AS (SELECT la AS lab, count(*) AS d,
                count(*) FILTER (WHERE la = lb) AS intra
         FROM pr GROUP BY la),
mm AS (SELECT sum(d) / 2 AS m FROM comm)
SELECT sum(intra / (2.0 * mm.m) - (d / (2.0 * mm.m)) ^ 2) AS modularity,
       mm.m::BIGINT AS n_edges,
       count(*)::BIGINT AS n_communities
FROM comm, mm GROUP BY mm.m
"""


def sql_bipartite_degree_top25() -> str:
    return """
WITH e AS (SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem)
SELECT dst AS vid, count(*) AS n_orders FROM e GROUP BY dst
ORDER BY n_orders DESC, vid ASC LIMIT 25
"""


# ---------------------------------------------------------------------------
# documents / events / embeddings oracles
# ---------------------------------------------------------------------------

def sql_doc_exact_dedup() -> str:
    return """
SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def _shingle_ctes() -> str:
    """CTE chain ending in ``sh`` = distinct (doc_id, 3-gram shingle
    string) — mirrors stages/dedup._shingle_hashes edge cases (<3 tokens →
    distinct unigrams; 0 tokens → no rows). Shared by the ngram-pair
    oracles and the decontamination oracle."""
    return """toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
pos AS (
  SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
  FROM toks WHERE len(ts) >= 3
),
sh3 AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS sh
  FROM pos
),
sh1 AS (
  SELECT DISTINCT doc_id, unnest(ts) AS sh
  FROM toks WHERE len(ts) BETWEEN 1 AND 2
),
sh AS (SELECT * FROM sh3 UNION ALL SELECT * FROM sh1)"""


def _ngram_pair_ctes(k: int = 3, max_df: int = 1000) -> str:
    """Shared CTE chain ending in ``it``/``cnt`` (pair intersection counts +
    per-doc shingle counts) — used by both the pair oracle and the
    dedup-groups closure oracle. ``max_df`` mirrors the engine's
    posting-list cut (stages/dedup.ngram_jaccard_dups): shingles appearing
    in more than max_df docs are excluded from intersection counting (the
    ``it`` CTE) but still count toward per-doc shingle totals (``cnt``),
    exactly like the engine."""
    assert k == 3, "oracle is written for k=3"
    return f"""{_shingle_ctes()},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
df AS (SELECT sh, count(*) AS m FROM sh GROUP BY sh),
it AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  JOIN df ON df.sh = a.sh AND df.m <= {max_df}
  GROUP BY 1, 2
)"""


def sql_ngram_jaccard_dups(threshold: float = 0.5, k: int = 3,
                           max_df: int = 1000) -> str:
    """Exact k-gram Jaccard closure over shingle STRINGS (the engine dedups
    shingle blake2-64 hashes — identical sets barring hash collisions).
    Mirrors stages/dedup._shingle_hashes edge cases: <k tokens → distinct
    unigrams; 0 tokens → no postings (never pairs)."""
    return f"""
WITH {_ngram_pair_ctes(k, max_df)}
SELECT it.doc_a, it.doc_b,
       round(it.i::DOUBLE / (ca.n + cb.n - it.i), 6) AS jaccard
FROM it
JOIN cnt ca ON ca.doc_id = it.doc_a
JOIN cnt cb ON cb.doc_id = it.doc_b
WHERE it.i::DOUBLE / (ca.n + cb.n - it.i) >= {threshold}
"""


def sql_dedup_groups(threshold: float = 0.5, k: int = 3,
                     max_df: int = 1000) -> str:
    """Transitive closure of the exact k-gram Jaccard dup pairs →
    (doc_id, canonical_id = min doc_id in the weakly-connected dup group,
    group_size); matches queries.q_dedup_groups (pairs → GAS min-id CC)."""
    return f"""
WITH RECURSIVE {_ngram_pair_ctes(k, max_df)},
p AS (
  SELECT it.doc_a, it.doc_b
  FROM it
  JOIN cnt ca ON ca.doc_id = it.doc_a
  JOIN cnt cb ON cb.doc_id = it.doc_b
  WHERE it.i::DOUBLE / (ca.n + cb.n - it.i) >= {threshold}
),
und AS (SELECT doc_a AS a, doc_b AS b FROM p
        UNION ALL SELECT doc_b, doc_a FROM p),
verts AS (SELECT DISTINCT a AS v FROM und),
reach(v, l) AS (
    SELECT v, v FROM verts
    UNION
    SELECT und.b, reach.l FROM reach JOIN und ON reach.v = und.a
),
lbl AS (SELECT v AS doc_id, min(l) AS canonical_id FROM reach GROUP BY v),
sz AS (SELECT canonical_id, count(*) AS group_size FROM lbl GROUP BY canonical_id)
SELECT lbl.doc_id, lbl.canonical_id, sz.group_size
FROM lbl JOIN sz USING (canonical_id)
"""


def sql_doc_token_stats() -> str:
    return """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
       length(text) AS n_chars
FROM documents
"""


def sql_doc_quality() -> str:
    stops = "('the','and','of','to','a','in','is','for')"
    return f"""
WITH t AS (SELECT doc_id, text,
                  regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
           FROM documents)
SELECT doc_id,
       len(toks) AS n_words,
       len(list_filter(toks, x -> x IN {stops})) AS n_stopwords,
       length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
       round(len(list_filter(toks, x -> x IN {stops}))::DOUBLE
             / greatest(len(toks), 1), 6) AS stop_ratio
FROM t
"""


def sql_doc_langid() -> str:
    from ..stages.text import LANG_PROFILES

    score = {lang: "(" + " + ".join(
        f"len(list_filter(toks, x -> x = '{w}'))" for w in sorted(prof)) + ")"
        for lang, prof in LANG_PROFILES.items()}
    return f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
           FROM documents),
s AS (SELECT doc_id,
             {score['de']} AS s_de, {score['en']} AS s_en,
             {score['es']} AS s_es, {score['fr']} AS s_fr
      FROM t)
SELECT doc_id,
       CASE WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM s
"""


def sql_events_hourly() -> str:
    return """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def sql_user_activity() -> str:
    return """
SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM events GROUP BY user_id
"""


def sql_ann_top5() -> str:
    return """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                  list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS s
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id <> q.query_id),
ranked AS (SELECT query_id, neighbor_id, s,
                  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
           FROM scored)
SELECT query_id, neighbor_id, round(s, 6) AS sim FROM ranked WHERE rn <= 5
"""


def sql_knn_graph(k: int = 5, max_query: int | None = None) -> str:
    """Exact cosine kNN graph (stages/ann.py knn_graph): per-vector top-k by
    (round6(sim) DESC, nbr_id ASC) — the ranking uses the ROUNDED sim, same
    as the Ray side's int64-packed key. ``max_query`` restricts the query
    side (the Ray all-pairs output filtered to vec_id < max_query matches
    exactly) so the O(N²) cross join stays tractable at sf0.01."""
    qfilt = f"AND q.vec_id < {max_query}" if max_query is not None else ""
    return f"""
WITH scored AS (
    SELECT q.vec_id, e.vec_id AS nbr_id,
           round(list_cosine_similarity(q.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[]), 6) AS sim
    FROM embeddings q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.vec_id {qfilt}),
ranked AS (SELECT vec_id, nbr_id, sim,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, nbr_id ASC) AS rn
           FROM scored)
SELECT vec_id, nbr_id, sim, (rn - 1)::BIGINT AS rank
FROM ranked WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# further graph-operator oracles
# ---------------------------------------------------------------------------

CC_CTE = sql_cc_labels  # reuse: full recursive closure text


def sql_cc_size_histogram() -> str:
    base = sql_cc_labels()
    return f"""
WITH labs AS ({base})
SELECT component_size, count(*)::BIGINT AS n_components FROM (
    SELECT label, count(*)::BIGINT AS component_size FROM labs GROUP BY label)
GROUP BY component_size
"""


def sql_rank_degree_join(k: int = 5) -> str:
    pr = sql_pagerank_k(k)
    return f"""
WITH pr AS ({pr}),
{EDGES_CTE.replace('WITH ', '')}{DEGREES_CTE}
SELECT degs.vid, degs.out_deg, degs.in_deg, degs.deg, pr.rank
FROM degs JOIN pr ON pr.vid = degs.vid
"""


def sql_neighbors_top_degree() -> str:
    return EDGES_CTE + DEGREES_CTE + """
, seeds AS (SELECT vid FROM degs ORDER BY deg DESC, vid ASC LIMIT 10)
SELECT DISTINCT und.b AS vid FROM und JOIN seeds ON seeds.vid = und.a
"""


def sql_graph_summary() -> str:
    return EDGES_CTE + DEGREES_CTE + """
SELECT (SELECT count(*)::BIGINT FROM verts) AS n_vertices,
       (SELECT count(*)::BIGINT FROM e) AS n_edges,
       (SELECT max(out_deg)::BIGINT FROM degs) AS max_out_deg,
       (SELECT max(in_deg)::BIGINT FROM degs) AS max_in_deg,
       (SELECT count(*)::BIGINT FROM degs WHERE out_deg = 0) AS n_dangling
"""


def sql_embedding_near_dups(threshold: float = 0.45) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {threshold}
"""


def sql_directed_triangles() -> str:
    return EDGES_CTE + """
SELECT (SELECT count(*)::BIGINT FROM e a JOIN e b ON b.src = a.dst
        JOIN e c ON c.src = a.src AND c.dst = b.dst) AS n_trans,
       (SELECT (count(*) // 3)::BIGINT FROM e a JOIN e b ON b.src = a.dst
        JOIN e c ON c.src = b.dst AND c.dst = a.src) AS n_cycle
"""


def sql_directed_triangle_census() -> str:
    """Per-vertex census: per directed edge (s,t), s gets out+=|out(s)∩out(t)|,
    through+=|in(s)∩in(t)|, cycle+=|in(s)∩out(t)|; t gets in+=|in(s)∩in(t)|
    (directed_triangle_count.cpp:598-656)."""
    return EDGES_CTE + DEGREES_CTE + """
, o AS (SELECT a.src AS v, count(*) AS c FROM e a
        JOIN e o1 ON o1.src = a.src JOIN e o2 ON o2.src = a.dst AND o2.dst = o1.dst
        GROUP BY a.src),
th AS (SELECT a.src AS v, count(*) AS c FROM e a
       JOIN e i1 ON i1.dst = a.src JOIN e i2 ON i2.dst = a.dst AND i2.src = i1.src
       GROUP BY a.src),
it AS (SELECT a.dst AS v, count(*) AS c FROM e a
       JOIN e i1 ON i1.dst = a.src JOIN e i2 ON i2.dst = a.dst AND i2.src = i1.src
       GROUP BY a.dst),
cy AS (SELECT a.src AS v, count(*) AS c FROM e a
       JOIN e i1 ON i1.dst = a.src JOIN e o2 ON o2.src = a.dst AND o2.dst = i1.src
       GROUP BY a.src)
SELECT degs.vid,
       COALESCE(it.c, 0)::BIGINT AS in_tri,
       COALESCE(o.c, 0)::BIGINT AS out_tri,
       COALESCE(th.c, 0)::BIGINT AS through_tri,
       COALESCE(cy.c, 0)::BIGINT AS cycle_tri,
       degs.out_deg, degs.in_deg
FROM degs
LEFT JOIN o ON o.v = degs.vid LEFT JOIN th ON th.v = degs.vid
LEFT JOIN it ON it.v = degs.vid LEFT JOIN cy ON cy.v = degs.vid
"""


def sql_sssp_directed_maxdeg() -> str:
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body}{DEGREES_CTE},
s AS (SELECT vid FROM degs ORDER BY deg DESC, vid ASC LIMIT 1),
walk(v, d) AS (
    SELECT vid, 0::BIGINT FROM s
    UNION
    SELECT e.dst, walk.d + 1 FROM walk JOIN e ON e.src = walk.v WHERE walk.d < 600
)
SELECT v AS vid, min(d) AS dist FROM walk GROUP BY v
"""


def sql_closeness(n_sources: int = 100) -> str:
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
srcs AS (SELECT v FROM verts ORDER BY v LIMIT {n_sources}),
walk(s, v, d) AS (
    SELECT v, v, 0::BIGINT FROM srcs
    UNION
    SELECT walk.s, und.b, walk.d + 1 FROM walk JOIN und ON und.a = walk.v
    WHERE walk.d < 600
),
dmin AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
agg AS (SELECT s, count(*) - 1 AS reach, sum(d) AS tot FROM dmin GROUP BY s)
SELECT s AS vid,
       round(CASE WHEN tot > 0 THEN reach::DOUBLE / tot ELSE 0.0 END, 6) AS closeness
FROM agg
"""


def sql_distance_summary(n_sources: int = 100) -> str:
    """Distance-summary replay (graph/centrality.distance_summary): the
    closeness walk recursion over the n smallest vids; ecc per source,
    min/max fold, mean over reachable ordered (s, v≠s) pairs."""
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
srcs AS (SELECT v FROM verts ORDER BY v LIMIT {n_sources}),
walk(s, v, d) AS (
    SELECT v, v, 0::BIGINT FROM srcs
    UNION
    SELECT walk.s, und.b, walk.d + 1 FROM walk JOIN und ON und.a = walk.v
    WHERE walk.d < 600
),
dmin AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
pos AS (SELECT s, v, d FROM dmin WHERE d > 0),
ecc AS (SELECT s, max(d) AS e FROM pos GROUP BY s)
SELECT (SELECT min(e) FROM ecc)::BIGINT AS radius_est,
       (SELECT max(e) FROM ecc)::BIGINT AS diameter_lb,
       round((SELECT sum(d) FROM pos)::DOUBLE
             / (SELECT count(*) FROM pos), 6) AS avg_dist,
       (SELECT count(*) FROM pos)::BIGINT AS n_pairs
"""


def sql_landmark_distance(source: int = 0, k: int = 16) -> str:
    """Landmark distance-oracle replay (graph/centrality.
    landmark_distance_estimates): BFS from the k highest-(out+in)-degree
    vertices (ties → lowest vid), d̂(source, v) = min over landmarks of
    d(source,l) + d(l,v); rows where no landmark reaches both are absent
    (the engine drops inf)."""
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body}{DEGREES_CTE},
marks AS (SELECT vid AS v FROM degs ORDER BY deg DESC, vid ASC LIMIT {k}),
walk(s, v, d) AS (
    SELECT v, v, 0::BIGINT FROM marks
    UNION
    SELECT walk.s, und.b, walk.d + 1 FROM walk JOIN und ON und.a = walk.v
    WHERE walk.d < 600
),
dmin AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
d0 AS (SELECT s, d FROM dmin WHERE v = {source})
SELECT dmin.v AS vid, min(d0.d + dmin.d)::BIGINT AS est_hops
FROM dmin JOIN d0 ON d0.s = dmin.s
GROUP BY dmin.v
"""


def sql_harmonic(n_sources: int = 100) -> str:
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
srcs AS (SELECT v FROM verts ORDER BY v LIMIT {n_sources}),
walk(s, v, d) AS (
    SELECT v, v, 0::BIGINT FROM srcs
    UNION
    SELECT walk.s, und.b, walk.d + 1 FROM walk JOIN und ON und.a = walk.v
    WHERE walk.d < 600
),
dmin AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v)
SELECT s AS vid,
       round(COALESCE(sum(1.0 / d) FILTER (WHERE d > 0), 0.0), 6) AS harmonic
FROM dmin GROUP BY s
"""


def sql_kcore(k: int = 3) -> str:
    """K-core via peeling as a list-state recursive CTE: each recursion row
    carries the full cumulative dead set (standard recursive CTEs only see
    the previous iteration's rows, so the state rides in a LIST column);
    peel is monotone (a dead vertex's residual degree only shrinks), so the
    step recomputes dead = {v : deg restricted to non-dead < k} and stops
    when the set stops growing. Matches kcore.cpp's iterate-until-stable
    deletion semantics and q_kcore's (vid, core_deg) output."""
    return EDGES_CTE + DEGREES_CTE + f"""
, peel AS (
  WITH RECURSIVE p(it, dead) AS (
    SELECT 0, (SELECT coalesce(list(vid), []) FROM degs WHERE deg < {k})
    UNION ALL
    SELECT it + 1,
           (SELECT coalesce(list(v), []) FROM verts
            WHERE (SELECT count(*) FROM und
                   WHERE und.a = verts.v AND NOT list_contains(p.dead, und.b)) < {k})
    FROM p
    WHERE len((SELECT coalesce(list(v), []) FROM verts
               WHERE (SELECT count(*) FROM und
                      WHERE und.a = verts.v AND NOT list_contains(p.dead, und.b)) < {k}))
          > len(p.dead)
  )
  SELECT dead FROM p ORDER BY it DESC LIMIT 1
)
SELECT verts.v AS vid,
       (SELECT count(*) FROM und
        WHERE und.a = verts.v AND NOT list_contains((SELECT dead FROM peel), und.b)) AS core_deg
FROM verts
WHERE NOT list_contains((SELECT dead FROM peel), verts.v)
"""


def sql_edge_component_sizes() -> str:
    """Bond-percolation census: edges counted per component (component id =
    min reachable vertex id of either endpoint — same closure as CC)."""
    base = sql_cc_labels()
    head, _tail = base.rsplit("SELECT", 1)
    return head + """
, lab AS (SELECT v AS vid, min(l) AS label FROM reach GROUP BY v)
SELECT lab.label AS label, count(*)::BIGINT AS n_edges
FROM e JOIN lab ON lab.vid = e.src
GROUP BY lab.label
"""


def sql_prestige(n_sources: int = 100) -> str:
    """Proximity prestige over *directed* reachability from the first
    ``n_sources`` vertices: PP(v) = influence/ns · influence/Σd — the
    left-associated op order matches the engine's numpy evaluation."""
    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
srcs AS (SELECT v FROM verts ORDER BY v LIMIT {n_sources}),
walk(s, v, d) AS (
    SELECT v, v, 0::BIGINT FROM srcs
    UNION
    SELECT walk.s, e.dst, walk.d + 1 FROM walk JOIN e ON e.src = walk.v
    WHERE walk.d < 600
),
dmin AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),
agg AS (SELECT v, count(*)::DOUBLE AS influence, sum(d)::DOUBLE AS tot
        FROM dmin WHERE s <> v GROUP BY v),
ns AS (SELECT verts.v,
              ((SELECT count(*) FROM srcs)
               - CASE WHEN verts.v IN (SELECT v FROM srcs) THEN 1 ELSE 0 END)::DOUBLE AS n
       FROM verts)
SELECT ns.v AS vid,
       round(CASE WHEN agg.influence > 0 AND agg.tot > 0
                  THEN agg.influence / ns.n * agg.influence / agg.tot
                  ELSE 0.0 END, 6) AS prestige
FROM ns LEFT JOIN agg ON agg.v = ns.v
"""


def sql_norm_laplacian() -> str:
    return EDGES_CTE + """
, ced AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM e GROUP BY 1, 2),
cdeg AS (SELECT v, count(*) AS deg FROM (SELECT a AS v FROM ced UNION ALL SELECT b FROM ced) GROUP BY v)
SELECT i, j, lap FROM (
  SELECT ced.a AS i, ced.b AS j, round(-1.0 / sqrt(da.deg * db.deg), 6) AS lap
  FROM ced JOIN cdeg da ON da.v = ced.a JOIN cdeg db ON db.v = ced.b
  UNION ALL
  SELECT ced.b, ced.a, round(-1.0 / sqrt(da.deg * db.deg), 6)
  FROM ced JOIN cdeg da ON da.v = ced.a JOIN cdeg db ON db.v = ced.b
  UNION ALL
  SELECT v, v, 1.0 FROM cdeg)
"""


def sql_neighborhood_embedding() -> str:
    """GraphSAGE-mean one-hop aggregation (stages/features.py): per edge
    dst, mean over in-neighbors' embedding dims. avg() sums in a different
    order than the engine's lexsort+reduceat — both float64, equal at the
    6-dp rounding."""
    return EDGES_CTE + """,
ex AS (SELECT vec_id, embedding,
              unnest(range(1, len(embedding) + 1)) AS i
       FROM embeddings),
j AS (SELECT e.dst AS vid, ex.i, ex.embedding[ex.i]::DOUBLE AS v
      FROM e JOIN ex ON ex.vec_id = e.src)
SELECT vid, i, round(avg(v), 6) AS val FROM j GROUP BY vid, i
"""


def sql_embedding_rownorm() -> str:
    # sequential list_sum mirrors the engine's fixed left-to-right float64
    # accumulation, so round(…, 6) agrees bit-for-bit
    return """
WITH nn AS (SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
            FROM embeddings),
ex AS (SELECT vec_id, nrm, embedding, unnest(range(1, len(embedding) + 1)) AS i FROM nn)
SELECT vec_id, i, round(embedding[i]::DOUBLE / nrm, 6) AS val FROM ex
"""


def sql_user_sessions(gap_minutes: int = 30) -> str:
    """Sessionization as SQL window functions: session boundary when the gap
    to the previous event (per user, ordered by ts, event_id) exceeds the
    threshold; session id = running sum of boundaries."""
    return f"""
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
per AS (SELECT user_id, sid, count(*) AS n,
               epoch(max(ts) - min(ts)) / 60.0 AS dur_min
        FROM s GROUP BY user_id, sid)
SELECT user_id, count(*)::BIGINT AS n_sessions,
       max(n)::BIGINT AS longest_session_events,
       round(max(dur_min), 6) AS max_session_minutes
FROM per GROUP BY user_id
"""


def sql_events_asof(left_type: str = "click", right_type: str = "purchase") -> str:
    """As-of join as an explicit windowed left join (not DuckDB's ASOF JOIN,
    whose equal-timestamp tie-break is unspecified): latest right row with
    ts <= left ts per user, ties by highest event_id."""
    return f"""
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = '{left_type}'),
r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = '{right_type}'),
j AS (SELECT l.event_id, l.user_id, l.ts, r.event_id AS rid, r.value AS rv,
             row_number() OVER (PARTITION BY l.event_id
                                ORDER BY r.ts DESC, r.event_id DESC) AS rn
      FROM l LEFT JOIN r ON r.user_id = l.user_id AND r.ts <= l.ts)
SELECT event_id, user_id, ts,
       COALESCE(rid, -1)::BIGINT AS asof_event_id,
       COALESCE(rv, 0.0)::DOUBLE AS asof_value
FROM j WHERE rn = 1
"""


def sql_events_nearby(window_s: int = 120) -> str:
    """Range join oracle: inclusive |Δts| <= window self-join count."""
    return f"""
WITH c AS (SELECT a.event_id, count(b.event_id)::BIGINT AS n_nearby
  FROM events a JOIN events b
    ON b.ts BETWEEN a.ts - INTERVAL {window_s} SECOND
               AND a.ts + INTERVAL {window_s} SECOND
   AND b.event_id <> a.event_id
  GROUP BY a.event_id)
SELECT e.event_id, COALESCE(c.n_nearby, 0)::BIGINT AS n_nearby
FROM events e LEFT JOIN c ON c.event_id = e.event_id
"""


def sql_doc_sample_10pct() -> str:
    return f"""
SELECT doc_id FROM documents
WHERE (doc_id * {KNUTH_MIX}) % 10000 < 1000
"""


def sql_events_stratified_first5() -> str:
    return """
SELECT event_type, event_id, ts FROM (
    SELECT event_type, event_id, ts,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
    FROM events) WHERE rn <= 5
"""


def sql_doc_top20_quality() -> str:
    return """
SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
FROM documents
ORDER BY n_tokens DESC, doc_id ASC LIMIT 20
"""


def sql_betweenness(n_sources: int = 100, levels: int = 48) -> str:
    """Brandes betweenness (betweenness.cpp semantics) from the first
    ``n_sources`` vertices, rescaled by nv/S and halved (undirected pair
    counting) — exactly q_betweenness_100's estimator.

    Path counting needs per-level aggregation, which standard recursive
    CTEs cannot express (no aggregates in the recursive term), so the BFS
    DAG is unrolled: ``sig{k}`` (geodesic counts at level k, forward) and
    ``del{k}`` (dependency accumulation, backward) are generated as
    ``levels`` chained CTEs over the ``dmin`` distance table. σ counts
    follow ``und``'s UNION ALL edge multiplicity — the same per-directed-
    edge-occurrence semantics as MultiSourceBFSVP.partial. A guard raises
    ``error()`` if any BFS level reaches the unroll depth, so truncation
    can never silently desynchronize the parity gate (the walk CTE itself
    explores to depth 600, far beyond the guard)."""
    body = EDGES_CTE.split("WITH ", 1)[1]
    for c in ("e", "verts", "und"):
        body = body.replace(f"{c} AS (", f"{c} AS MATERIALIZED (")
    parts = [
        f"WITH RECURSIVE {body},",
        f"srcs AS (SELECT v FROM verts ORDER BY v LIMIT {n_sources}),",
        "walk(s, v, d) AS (",
        "    SELECT v, v, 0::BIGINT FROM srcs",
        "    UNION",
        "    SELECT walk.s, und.b, walk.d + 1 FROM walk JOIN und ON und.a = walk.v",
        "    WHERE walk.d < 600",
        "),",
        "dmin AS MATERIALIZED (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v),",
        "sig0 AS MATERIALIZED (SELECT v AS s, v, 1.0::DOUBLE AS sigma FROM srcs),",
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"sig{k} AS MATERIALIZED (SELECT dm.s, dm.v, sum(p.sigma)::DOUBLE AS sigma"
            f" FROM dmin dm JOIN und ON und.b = dm.v"
            f" JOIN sig{k - 1} p ON p.s = dm.s AND p.v = und.a"
            f" WHERE dm.d = {k} GROUP BY dm.s, dm.v),")
    parts.append(f"del{levels} AS MATERIALIZED (SELECT s, v, sigma, 0.0::DOUBLE AS delta"
                 f" FROM sig{levels}),")
    for k in range(levels - 1, -1, -1):
        parts.append(
            f"del{k} AS MATERIALIZED (SELECT sg.s, sg.v, sg.sigma,"
            f" coalesce(sum((sg.sigma / dw.sigma) * (1.0 + dw.delta)), 0.0)::DOUBLE AS delta"
            f" FROM sig{k} sg LEFT JOIN und ON und.a = sg.v"
            f" LEFT JOIN del{k + 1} dw ON dw.s = sg.s AND dw.v = und.b"
            f" GROUP BY sg.s, sg.v, sg.sigma),")
    alls = " UNION ALL ".join(f"SELECT s, v, delta FROM del{k}"
                              for k in range(levels + 1))
    parts.append(f"alldelta AS ({alls}),")
    parts.append("bcsum AS (SELECT v, sum(delta) AS val FROM alldelta"
                 " WHERE v <> s GROUP BY v)")
    parts.append(
        "SELECT verts.v AS vid,"
        " round(coalesce(bcsum.val, 0.0)"
        " * (SELECT count(*) FROM verts)::DOUBLE"
        " / (SELECT count(*) FROM srcs) / 2.0"
        f" + CASE WHEN (SELECT max(d) FROM dmin) >= {levels}"
        " THEN error('betweenness oracle unroll depth exceeded')"
        " ELSE 0.0 END, 6) AS betweenness"
        " FROM verts LEFT JOIN bcsum ON bcsum.v = verts.v")
    return "\n".join(parts)


def sql_coloring_valid() -> str:
    """Closed-form counterpart of q_coloring_valid: the engine side must
    produce exactly (variant, |V|, |E|, 0) per coloring variant for the
    hash gate to pass — i.e. the colorings are proper."""
    return EDGES_CTE + """
, stats AS (SELECT (SELECT count(*) FROM verts)::BIGINT AS n_vertices,
                   (SELECT count(*) FROM e)::BIGINT AS n_edges)
SELECT v.variant, stats.n_vertices, stats.n_edges, 0::BIGINT AS n_conflicts
FROM (VALUES ('degree'), ('saturation'), ('simple')) v(variant)
CROSS JOIN stats
ORDER BY v.variant
"""


def sql_simhash_near_dups(max_hamming: int = 3) -> str:
    """Independent DuckDB recomputation of q_simhash_near_dups: same
    tokenizer (lowered ``[a-z0-9_]+``), token hash = ``md5_number_lower``
    (≡ ids.hash64_str_md5, little-endian md5 digest bytes 8..16), Charikar
    sign-sum codes (bit = 1 iff occurrence-weighted score > 0, tie → 0),
    then ALL pairs at hamming ≤ max_hamming — valid as the oracle because
    the engine's chunk-banding has exact recall for
    ``max_hamming ≤ n_chunks − 1`` (Manku '07 pigeonhole)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, md5_number_lower(tok) AS h, count(*)::BIGINT AS w
  FROM tok GROUP BY doc_id, md5_number_lower(tok)
),
bits AS (
  SELECT doc_id, b.b AS bit,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN w ELSE -w END) AS score
  FROM th, (SELECT unnest(range(64)) AS b) b
  GROUP BY doc_id, b.b
),
codes AS (
  SELECT doc_id,
         sum(CASE WHEN score > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END)::UBIGINT AS code
  FROM bits GROUP BY doc_id
),
allc AS (
  SELECT d.doc_id, coalesce(c.code, 0::UBIGINT) AS code
  FROM documents d LEFT JOIN codes c ON d.doc_id = c.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.code, b.code))::BIGINT AS hamming
FROM allc a JOIN allc b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.code, b.code)) <= {max_hamming}
"""


# -- MinHash LSH near-dups (md5 token-hash variant) --------------------------

_U64 = 1 << 64


def _sql_mm64(a: str, b: str) -> str:
    """(a*b) mod 2^64 over UBIGINT expressions — DuckDB integer multiply
    RAISES on overflow, so split a into 32-bit halves and combine in
    HUGEINT: a*b ≡ ((a_hi*b mod 2^32)<<32 + a_lo*b) (mod 2^64)."""
    ah = f"(CAST({a} AS HUGEINT) // 4294967296)"
    al = f"(CAST({a} AS HUGEINT) % 4294967296)"
    bh = f"CAST({b} AS HUGEINT)"
    return (f"CAST(((({ah} * {bh}) % 4294967296) * 4294967296"
            f" + {al} * {bh}) % {_U64} AS UBIGINT)")


def _sql_am64(a: str, b: str) -> str:
    """(a+b) mod 2^64 over UBIGINT expressions."""
    return f"CAST((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {_U64} AS UBIGINT)"


def _sql_mix_ctes(name: str, src: str, in_expr: str, out: str,
                  carry: list[str]) -> str:
    """CTE chain applying ids.integer_mix (splitmix64 finalizer) to
    ``in_expr`` of ``src``; final CTE is ``{name}_3`` with columns
    ``carry + [out]``. One stage per mix step keeps expression size linear."""
    from ..ids import _GOLDEN, _MIX1, _MIX2

    ks = ", ".join(carry) + (", " if carry else "")
    return f"""{name}_0 AS (SELECT {ks}{_sql_am64(in_expr, str(int(_GOLDEN)))} AS z FROM {src}),
{name}_1 AS (SELECT {ks}{_sql_mm64("xor(z, z >> 30)", str(int(_MIX1)))} AS z FROM {name}_0),
{name}_2 AS (SELECT {ks}{_sql_mm64("xor(z, z >> 27)", str(int(_MIX2)))} AS z FROM {name}_1),
{name}_3 AS (SELECT {ks}xor(z, z >> 31) AS {out} FROM {name}_2)"""


def sql_minhash_near_dups(threshold: float = 0.5, n_perm: int = 64,
                          bands: int = 16, k: int = 3, seed: int = 7) -> str:
    """Independent DuckDB recomputation of q_minhash_near_dups
    (token_hash="md5"): tokenizer (lowered ``[a-z0-9_]+``) → token hash
    ``md5_number_lower`` (≡ ids.hash64_str_md5) → k-gram shingles (the
    engine's rolling ``((h0·K)^h1)·K^h2`` combine + splitmix64 mix, distinct
    per doc; <k tokens → mixed unigrams) → one-permutation minhash
    signatures (the exact (a, b) uint64 constants of
    dedup.minhash_perm_params, multiply mod 2^64) → 16-band bucket codes
    (iterated mix chain) → candidate pairs sharing any band code → exact
    shingle-Jaccard verify (filter raw ≥ threshold, round half-away 6dp).
    All wraparound uint64 arithmetic is emulated in HUGEINT (DuckDB raises
    on native overflow); mix/band chains are staged CTEs so expressions
    stay linear in size."""
    assert n_perm % bands == 0
    from ..stages.dedup import minhash_perm_params

    rpb = n_perm // bands
    a, b = minhash_perm_params(n_perm, seed)
    perm_rows = ",\n    ".join(
        f"({p}, {int(a[p])}::UBIGINT, {int(b[p])}::UBIGINT)"
        for p in range(n_perm))
    K = str(KNUTH_MIX)
    FF = (1 << 64) - 1

    # k-gram rolling combine over md5 word hashes: acc = h0; acc = acc*K ^ h_i
    acc = "h"
    for i in range(1, k):
        acc = f"xor({_sql_mm64(acc, K)}, h{i})"
    leads = ", ".join(
        f"lead(h, {i}) OVER (PARTITION BY doc_id ORDER BY pos) AS h{i}"
        for i in range(1, k))
    sN = ", ".join(f"s{r}" for r in range(rpb))
    pivots = ", ".join(
        f"max(CASE WHEN p % {rpb} = {r} THEN mh END) AS s{r}"
        for r in range(rpb))

    # band code: h = mix(s0); for r in 1..rpb-1: h = mix(h*K ^ s_r)
    band_ctes = [_sql_mix_ctes(
        "bh0", "piv", "s0", "hh",
        ["doc_id", "band"] + [f"s{r}" for r in range(1, rpb)])]
    for r in range(1, rpb):
        carry = ["doc_id", "band"] + [f"s{q}" for q in range(r + 1, rpb)]
        band_ctes.append(_sql_mix_ctes(
            f"bh{r}", f"bh{r - 1}_3",
            f"xor({_sql_mm64('hh', K)}, s{r})", "hh", carry))
    band_cte_sql = ",\n".join(band_ctes)

    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9_]+'), 1) AS pos
  FROM documents
),
th AS (SELECT doc_id, pos, md5_number_lower(tok) AS h FROM tok),
win AS (SELECT doc_id, pos, h, {leads},
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM th),
rawsh AS (
  SELECT doc_id, {acc} AS r FROM win WHERE n >= {k} AND h{k - 1} IS NOT NULL
  UNION ALL
  SELECT doc_id, h AS r FROM win WHERE n < {k}
),
{_sql_mix_ctes("mx", "rawsh", "r", "m", ["doc_id"])},
sh AS (SELECT DISTINCT doc_id, m AS sh FROM mx_3),
nsh AS (SELECT doc_id, count(*)::BIGINT AS ns FROM sh GROUP BY doc_id),
perms(p, a, b) AS (VALUES
    {perm_rows}),
sigraw AS (SELECT s.doc_id, pm.p, min({_sql_am64(_sql_mm64("s.sh", "pm.a"), "pm.b")}) AS mh
           FROM sh s CROSS JOIN perms pm GROUP BY s.doc_id, pm.p),
sig AS (SELECT d.doc_id, pm.p, coalesce(sr.mh, {FF}::UBIGINT) AS mh
        FROM documents d CROSS JOIN perms pm
        LEFT JOIN sigraw sr ON sr.doc_id = d.doc_id AND sr.p = pm.p),
piv AS (SELECT doc_id, p // {rpb} AS band, {pivots}
        FROM sig GROUP BY doc_id, p // {rpb}),
{band_cte_sql},
code AS (SELECT doc_id, band, hh AS code FROM bh{rpb - 1}_3),
cand AS (SELECT DISTINCT ca.doc_id AS doc_a, cb.doc_id AS doc_b
         FROM code ca JOIN code cb
           ON ca.band = cb.band AND ca.code = cb.code AND ca.doc_id < cb.doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS i
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
          GROUP BY c.doc_a, c.doc_b),
j AS (SELECT c.doc_a, c.doc_b,
             coalesce(na.ns, 0) AS na, coalesce(nb.ns, 0) AS nb,
             coalesce(i.i, 0) AS i
      FROM cand c
      LEFT JOIN nsh na ON na.doc_id = c.doc_a
      LEFT JOIN nsh nb ON nb.doc_id = c.doc_b
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b)
SELECT doc_a, doc_b,
       round(CASE WHEN na + nb = 0 THEN 1.0
                  ELSE i::DOUBLE / (na + nb - i) END, 6) AS jaccard
FROM j
WHERE (CASE WHEN na + nb = 0 THEN 1.0
            ELSE i::DOUBLE / (na + nb - i) END) >= {threshold}
"""


def sql_doc_fingerprints() -> str:
    """Independent DuckDB recomputation of q_doc_fingerprints
    (token_hash="md5"): tokenizer ``[A-Za-z0-9_]+`` (NOT lowered), token
    hash ``md5_number_lower``, Rabin polynomial
    ``fp = OFFSET·B^n + Σ h(w_i)·B^(n-1-i) (mod 2^64)`` with B the FNV
    prime and OFFSET the FNV offset basis (stages/text.Fingerprint).
    ``B^e mod 2^64`` comes from a recursive powers CTE; every wraparound
    multiply is HUGEINT-emulated (_sql_mm64)."""
    from ..stages.text import Fingerprint

    B = str(int(Fingerprint.BASE))
    OFF = str(int(Fingerprint.OFFSET))
    return f"""
WITH RECURSIVE tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok,
         generate_subscripts(regexp_extract_all(text, '[A-Za-z0-9_]+'), 1) AS pos
  FROM documents
),
th AS (SELECT doc_id, pos, md5_number_lower(tok) AS h,
              count(*) OVER (PARTITION BY doc_id) AS n
       FROM tok),
cnt AS (SELECT d.doc_id, coalesce(t.n, 0)::BIGINT AS n
        FROM documents d
        LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t
          ON t.doc_id = d.doc_id),
pows(e, pw) AS (
    SELECT 0::BIGINT, 1::UBIGINT
    UNION ALL
    SELECT e + 1, {_sql_mm64("pw", B)} FROM pows
    WHERE e < (SELECT coalesce(max(n), 0) FROM cnt)
),
terms AS (SELECT th.doc_id, {_sql_mm64("th.h", "p.pw")} AS term
          FROM th JOIN pows p ON p.e = th.n - th.pos),
ts AS (SELECT doc_id, sum(CAST(term AS HUGEINT)) AS t FROM terms GROUP BY doc_id),
ofs AS (SELECT c.doc_id, {_sql_mm64(OFF, "p.pw")} AS o
        FROM cnt c JOIN pows p ON p.e = c.n)
SELECT ofs.doc_id,
       CAST((coalesce(ts.t, 0) + CAST(ofs.o AS HUGEINT)) % {_U64} AS UBIGINT)
         AS fingerprint
FROM ofs LEFT JOIN ts ON ts.doc_id = ofs.doc_id
"""


# ---------------------------------------------------------------------------
# corpus-curation oracles (stages/curation.py + the fused doc profile)
# ---------------------------------------------------------------------------


def sql_doc_profile() -> str:
    """Fused per-doc profile: token stats + quality features + language-ID
    (stages/text.DocProfile — one pass engine-side; here the three oracle
    CTE chains joined)."""
    from ..stages.text import LANG_PROFILES

    stops = "('the','and','of','to','a','in','is','for')"
    score = {lang: "(" + " + ".join(
        f"len(list_filter(toks, x -> x = '{w}'))" for w in sorted(prof)) + ")"
        for lang, prof in LANG_PROFILES.items()}
    return f"""
WITH t AS (SELECT doc_id, text,
                  regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
           FROM documents),
s AS (SELECT doc_id,
             {score['de']} AS s_de, {score['en']} AS s_en,
             {score['es']} AS s_es, {score['fr']} AS s_fr
      FROM t)
SELECT t.doc_id,
       len(toks) AS n_tokens,
       length(text) AS n_chars,
       len(list_filter(toks, x -> x IN {stops})) AS n_stopwords,
       length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
       round(len(list_filter(toks, x -> x IN {stops}))::DOUBLE
             / greatest(len(toks), 1), 6) AS stop_ratio,
       CASE WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM t JOIN s USING (doc_id)
"""


def sql_doc_repetition() -> str:
    """Word/n-gram repetition fractions (stages/curation.RepetitionStats).
    The engine counts distinct 64-bit shingle hashes; this recounts
    distinct STRINGS — identical barring hash collisions, same contract as
    the ngram-Jaccard oracle."""
    return """
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
           FROM documents),
w AS (SELECT doc_id, unnest(toks) AS w FROM t),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
a1 AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS d,
              max(c)::BIGINT AS mx FROM wc GROUP BY 1),
p2 AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
       FROM t WHERE len(toks) >= 2),
g2 AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g FROM p2),
a2 AS (SELECT doc_id, count(*)::BIGINT AS n2, count(DISTINCT g)::BIGINT AS d2
       FROM g2 GROUP BY 1),
p3 AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
       FROM t WHERE len(toks) >= 3),
g3 AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
       FROM p3),
a3 AS (SELECT doc_id, count(*)::BIGINT AS n3, count(DISTINCT g)::BIGINT AS d3
       FROM g3 GROUP BY 1)
SELECT t.doc_id,
       COALESCE(a1.n, 0)::BIGINT AS n_tokens,
       round(CASE WHEN a1.n > 0 THEN (a1.n - a1.d)::DOUBLE / a1.n
                  ELSE 0.0 END, 6) AS dup_word_frac,
       round(CASE WHEN a1.n > 0 THEN a1.mx::DOUBLE / a1.n
                  ELSE 0.0 END, 6) AS top_word_frac,
       round(CASE WHEN a2.n2 > 0 THEN (a2.n2 - a2.d2)::DOUBLE / a2.n2
                  ELSE 0.0 END, 6) AS dup_2gram_frac,
       round(CASE WHEN a3.n3 > 0 THEN (a3.n3 - a3.d3)::DOUBLE / a3.n3
                  ELSE 0.0 END, 6) AS dup_3gram_frac
FROM t
LEFT JOIN a1 ON a1.doc_id = t.doc_id
LEFT JOIN a2 ON a2.doc_id = t.doc_id
LEFT JOIN a3 ON a3.doc_id = t.doc_id
"""


def sql_doc_pii() -> str:
    """PII counts + redacted length (stages/curation.pii_batch). DuckDB and
    pyarrow.compute both run RE2, so match sets are byte-identical; the
    redaction chain applies email -> IPv4 -> phone in the same fixed
    order."""
    from ..stages.curation import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{IPV4_RE}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(text, '{PHONE_RE}'))::BIGINT AS n_phones,
       length(regexp_replace(regexp_replace(regexp_replace(text,
              '{EMAIL_RE}', '[EMAIL]', 'g'),
              '{IPV4_RE}', '[IP]', 'g'),
              '{PHONE_RE}', '[PHONE]', 'g'))::BIGINT AS clean_chars
FROM documents
"""


def sql_token_df(min_df: int = 2) -> str:
    """Vocabulary document-frequency table (stages/curation.token_df)."""
    return f"""
SELECT w AS token, count(DISTINCT doc_id)::BIGINT AS df
FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
      FROM documents) u
GROUP BY 1
HAVING count(DISTINCT doc_id) >= {min_df}
"""


def sql_decontaminate(bench_mod: int = 17, threshold: float = 0.5) -> str:
    """Benchmark decontamination (stages/curation.decontaminate): fraction
    of each training doc's distinct 3-gram shingles present in the
    ``doc_id % bench_mod == 0`` benchmark slice. Distinct-string set
    semantics ≡ the engine's distinct-hash sets barring collisions."""
    return f"""
WITH {_shingle_ctes()},
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {bench_mod} = 0),
cnt AS (SELECT doc_id, count(*) AS n FROM sh
        WHERE doc_id % {bench_mod} <> 0 GROUP BY 1),
hit AS (SELECT s.doc_id, count(*) AS h FROM sh s JOIN bench b ON s.sh = b.sh
        WHERE s.doc_id % {bench_mod} <> 0 GROUP BY 1)
SELECT cnt.doc_id,
       cnt.n::BIGINT AS n_shingles,
       COALESCE(hit.h, 0)::BIGINT AS n_hits,
       round(COALESCE(hit.h, 0)::DOUBLE / cnt.n, 6) AS contam_frac,
       (COALESCE(hit.h, 0)::DOUBLE / cnt.n >= {threshold})::BIGINT AS contaminated
FROM cnt LEFT JOIN hit ON hit.doc_id = cnt.doc_id
"""


# ---------------------------------------------------------------------------
# FM-sketch approximate diameter (graph/toolkit.DiameterVP)
# ---------------------------------------------------------------------------


def _sm64_mulmod(a: str, c: int) -> str:
    """HUGEINT SQL fragment: (a * c) mod 2^64 via 32-bit split multiply
    (DuckDB BIGINT multiply would raise on overflow; HUGEINT carries the
    exact 96-bit intermediates)."""
    return (f"(((({a}) % 4294967296) * {c} + "
            f"(((({a}) // 4294967296) * {c}) % 4294967296) * 4294967296) "
            f"% 18446744073709551616)")


def _sm64_xsh(z: str, k: int) -> str:
    """HUGEINT SQL fragment: z XOR (z >> k) for z in [0, 2^64)."""
    return f"(xor(({z})::UBIGINT, (({z}) // {1 << k})::UBIGINT))::HUGEINT"


def _sm64_mix(x: str) -> str:
    """HUGEINT SQL fragment: ids.integer_mix (splitmix64 finalizer) of an
    expression in [0, 2^64), fully inlined (for use INSIDE recursive terms
    where staged CTE chains aren't available)."""
    from ..ids import _GOLDEN, _MIX1, _MIX2

    z0 = f"((({x}) + {int(_GOLDEN)}) % 18446744073709551616)"
    z1 = _sm64_mulmod(_sm64_xsh(z0, 30), int(_MIX1))
    z2 = _sm64_mulmod(_sm64_xsh(z1, 27), int(_MIX2))
    return _sm64_xsh(z2, 31)


def sql_sir_cascade(infection_chance: float = 0.5,
                    recovery_chance: float = 0.25, iterations: int = 6,
                    seed: int = 7, init_frac: float = 0.02,
                    model: str = "SIR") -> str:
    """SIR cascade replay (graph/cascades.py run_sir; apps/cascades/
    cascades.cpp determinized): string-state recursion — each row carries
    the whole compartment vector as a VARCHAR indexed by dense vertex rank.
    Per superstep: an 'I' vertex recovers iff
    mix(v·C_REC + t·C_IT + seedmix + 1) < rec_thresh; an 'S' vertex becomes
    'I' iff ANY infected neighbor u wins
    mix(v·C_RECV + u·C_SRC + t·C_IT + seedmix) < inf_thresh. All rolls are
    exact HUGEINT splitmix64 with the SAME integer thresholds the engine
    uses (prob_threshold); recursion stops at ``iterations`` or extinction
    (no 'I' left), matching the engine's early stop."""
    from ..graph.cascades import (C_INIT, C_IT, C_REC, C_RECV, C_SRC,
                                  prob_threshold)
    from ..ids import integer_mix

    seedmix = int(integer_mix(seed))
    inf_t = int(prob_threshold(infection_chance))
    rec_t = int(prob_threshold(recovery_chance))
    init_t = int(prob_threshold(init_frac))
    body = EDGES_CTE.split("WITH ", 1)[1]

    def add64(*terms: str) -> str:
        s = " + ".join(f"({t})" for t in terms)
        return f"(({s}) % 18446744073709551616)"

    init_roll = _sm64_mix(add64(_sm64_mulmod("vl.v", int(C_INIT)),
                                str(seedmix)))
    rec_roll = _sm64_mix(add64(_sm64_mulmod("vl.v", int(C_REC)),
                               _sm64_mulmod("r.it", int(C_IT)),
                               str(seedmix + 1)))
    inf_roll = _sm64_mix(add64(_sm64_mulmod("und.b", int(C_RECV)),
                               _sm64_mulmod("und.a", int(C_SRC)),
                               _sm64_mulmod("r.it", int(C_IT)),
                               str(seedmix)))
    return f"""
WITH RECURSIVE {body},
vl AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM verts),
r(it, s) AS (
  SELECT 0::BIGINT,
         (SELECT string_agg(CASE WHEN {init_roll} < {init_t}
                            THEN 'I' ELSE 'S' END, '' ORDER BY vl.rn)
          FROM vl)
  UNION ALL
  SELECT r.it + 1,
         (SELECT string_agg(
            CASE substr(r.s, vl.rn, 1)
              WHEN 'R' THEN 'R'
              WHEN 'I' THEN (CASE WHEN {rec_roll} < {rec_t}
                             THEN '{"R" if model == "SIR" else "S"}'
                             ELSE 'I' END)
              ELSE (CASE WHEN EXISTS (
                      SELECT 1 FROM und JOIN vl ua ON ua.v = und.a
                      WHERE und.b = vl.v
                        AND substr(r.s, ua.rn, 1) = 'I'
                        AND {inf_roll} < {inf_t})
                    THEN 'I' ELSE 'S' END)
            END, '' ORDER BY vl.rn)
          FROM vl)
  FROM r
  WHERE r.it < {int(iterations)} AND r.s LIKE '%I%'
),
fin AS (SELECT s FROM r ORDER BY it DESC LIMIT 1)
SELECT vl.v AS vid, substr(fin.s, vl.rn, 1) AS status
FROM vl, fin
"""


def sql_approx_diameter(eps: float = 1e-4, n_masks: int = 10,
                        max_hops: int = 32) -> str:
    """Flajolet–Martin approximate diameter, replaying graph/toolkit
    DiameterVP bit-for-bit: B duplicated 32-bit FM masks per vertex
    (geometric bit = trailing zeros of splitmix64(vid*B+i), capped at 31),
    OR-merged from ALL neighbors each hop; stop at the first hop whose
    global neighborhood-size estimate sum(2^mean_lowest_zero_bit / 0.77351)
    grows by less than 1+eps (run_until compares consecutive superstep
    aggregates, so diameter = that hop index). splitmix64 runs in exact
    HUGEINT mod-2^64 arithmetic (bit-identical to ids.integer_mix, like the
    minhash oracle's md5 trick); trailing zeros = bit_count((z^(z-1))//2).
    ``max_hops`` only bounds the recursion and must exceed the stop hop
    (est growth is exactly 0 once masks converge, so the stop always
    triggers)."""
    from ..ids import _GOLDEN, _MIX1, _MIX2

    body = EDGES_CTE.split("WITH ", 1)[1]
    return f"""
WITH RECURSIVE {body},
ii AS (SELECT unnest(range(0, {n_masks})) AS i),
x0 AS (SELECT v, i, ((v * {n_masks} + i)::HUGEINT + {int(_GOLDEN)})
                    % 18446744073709551616 AS z0
       FROM verts CROSS JOIN ii),
x1 AS (SELECT v, i, {_sm64_mulmod(_sm64_xsh('z0', 30), int(_MIX1))} AS z1 FROM x0),
x2 AS (SELECT v, i, {_sm64_mulmod(_sm64_xsh('z1', 27), int(_MIX2))} AS z2 FROM x1),
x3 AS (SELECT v, i, {_sm64_xsh('z2', 31)} AS z3 FROM x2),
m0 AS (SELECT v, i,
         (1::BIGINT << (CASE WHEN z3 = 0 THEN 31
           ELSE least(bit_count((xor(z3::UBIGINT, (z3 - 1)::UBIGINT) // 2)::UBIGINT), 31)
           END)) AS m
       FROM x3),
r(hop, v, i, m) AS (
    SELECT 0, v, i, m FROM m0
    UNION ALL
    SELECT hop + 1, v, i, bit_or(m) FROM (
        SELECT r.hop, und.b AS v, r.i, r.m FROM r JOIN und ON und.a = r.v
        UNION ALL
        SELECT hop, v, i, m FROM r
    ) s WHERE hop < {max_hops} GROUP BY hop, v, i
),
bz AS (SELECT hop, v, i,
         CASE WHEN m = 4294967295 THEN 32.0
              ELSE bit_count(((4294967295 - m) & -(4294967295 - m)) - 1)::DOUBLE
         END AS b
       FROM r WHERE hop >= 1),
ev AS (SELECT hop, v, pow(2.0, avg(b)) / 0.77351 AS est_v FROM bz GROUP BY hop, v),
eh AS (SELECT hop, sum(est_v) AS s FROM ev GROUP BY hop)
SELECT min(a.hop)::BIGINT AS diameter_hops
FROM eh a JOIN eh b ON b.hop = a.hop + 1
WHERE a.hop >= 1 AND b.s < a.s * (1.0 + {eps!r})
"""


def sql_effective_diameter(fraction: float = 0.9, eps: float = 1e-4,
                           n_masks: int = 10, max_hops: int = 32) -> str:
    """ANF effective diameter replay (toolkit.run_effective_diameter):
    the same FM recursion as sql_approx_diameter; effective = the smallest
    hop whose estimate reaches ``fraction`` of the converged (diameter-hop)
    estimate, capped at the diameter."""
    base = sql_approx_diameter(eps=eps, n_masks=n_masks, max_hops=max_hops)
    head, _tail = base.rsplit("SELECT min(a.hop)", 1)
    assert head.rstrip().endswith(")")
    return head.rstrip() + f""",
dia AS (SELECT min(a.hop)::BIGINT AS d
        FROM eh a JOIN eh b ON b.hop = a.hop + 1
        WHERE a.hop >= 1 AND b.s < a.s * (1.0 + {eps!r})),
fin AS (SELECT s FROM eh WHERE hop = (SELECT d FROM dia)),
eff AS (SELECT min(hop)::BIGINT AS h FROM eh
        WHERE hop >= 1 AND s >= {fraction!r} * (SELECT s FROM fin))
SELECT least((SELECT h FROM eff), (SELECT d FROM dia)) AS effective_hops,
       (SELECT d FROM dia) AS diameter_hops
"""


def sql_kmeans_embeddings(k: int = 8, iterations: int = 10) -> str:
    """Distributed Lloyd k-means (stages/kmeans.kmeans, clustering toolkit
    kmeans.cpp), unrolled: init = the k smallest-id vectors, per iteration
    assignment = argmin squared distance (ties → lowest cluster index, via
    row_number), centroid = member mean (empty clusters keep the previous
    centroid), then a final assignment pass under the converged centroids —
    exactly q_kmeans_embeddings' loop. Float safety: the engine merges
    partial sums in sorted batch order while DuckDB sums in scan order, so
    the two disagree at ~1e-15 relative; the assignment argmin margins are
    ≥2.4e-6 relative and the centroid-norm round(·,6) boundary distances
    ≥5e-9 at sf0.01/sf0.1 (verified, and the trajectory is stable under
    20 random 1e-12 centroid jitters), so the discretized outputs
    (cluster sizes + 6-dp norms) are deterministic across both. CTEs are
    MATERIALIZED — each C{i} is referenced twice and DuckDB's default
    inlining would re-evaluate the chain exponentially."""
    return f"""
WITH {_kmeans_ctes(k, iterations)},
nrm AS (SELECT c, sqrt(sum(v * v)) AS nm FROM C{iterations} GROUP BY c),
cnts AS (SELECT c, count(*) AS n FROM fin GROUP BY c)
SELECT nrm.c AS cluster, COALESCE(cnts.n, 0)::BIGINT AS n_vecs,
       round(nrm.nm, 6) AS centroid_norm
FROM nrm LEFT JOIN cnts ON cnts.c = nrm.c"""


def _kmeans_ctes(k: int, iterations: int) -> str:
    """Unrolled Lloyd CTE chain over the ``embeddings`` view; final CTEs are
    ``C{iterations}`` (centroids as (c, j, v) rows) and ``fin`` (the final
    (vec_id, c) assignment). Shared by the kmeans and SemDeDup oracles."""
    parts = [f"""E AS MATERIALIZED (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS j,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings),
seeds AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
C0 AS MATERIALIZED (SELECT seeds.c, E.j, E.v FROM E JOIN seeds USING (vec_id))"""]
    for i in range(1, iterations + 1):
        parts.append(f""",
A{i} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, c.c,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY sum((e.v - c.v) * (e.v - c.v)), c.c) AS rn
    FROM E e JOIN C{i-1} c ON c.j = e.j GROUP BY e.vec_id, c.c
  ) WHERE rn = 1),
C{i} AS MATERIALIZED (
  SELECT p.c, p.j, COALESCE(m.av, p.v) AS v
  FROM C{i-1} p LEFT JOIN (
    SELECT a.c, e.j, avg(e.v) AS av
    FROM A{i} a JOIN E e USING (vec_id) GROUP BY a.c, e.j
  ) m ON m.c = p.c AND m.j = p.j)""")
    parts.append(f""",
fin AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, c.c,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY sum((e.v - c.v) * (e.v - c.v)), c.c) AS rn
    FROM E e JOIN C{iterations} c ON c.j = e.j GROUP BY e.vec_id, c.c
  ) WHERE rn = 1)""")
    return "".join(parts)


def sql_semantic_dedup(n_clusters: int = 8, iterations: int = 5,
                       threshold: float = 0.45) -> str:
    """SemDeDup (stages/curation.semantic_dedup): the unrolled Lloyd chain
    above, then within-cluster cosine pairs ≥ threshold over L2-normalized
    vectors, closed into groups by a recursive min-reachable-id CTE
    (≡ the engine's union-find: canonical = min vec_id of the component);
    every member of a ≥2-element group is emitted. Float safety: cosine
    values sit ≥1.2e-4 from the threshold at sf0.01/sf0.1 (verified) while
    DuckDB-vs-BLAS dot-product noise is ~1e-15 relative, and the kmeans
    argmin margins are the same ≥2.4e-6 as sql_kmeans_embeddings."""
    return f"""
WITH RECURSIVE {_kmeans_ctes(n_clusters, iterations)},
vn AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM E GROUP BY vec_id),
En AS MATERIALIZED (
  SELECT E.vec_id, E.j, E.v / greatest(vn.nrm, 1e-30) AS nv
  FROM E JOIN vn USING (vec_id)),
pairs AS MATERIALIZED (
  SELECT fa.vec_id AS u, fb.vec_id AS w
  FROM fin fa JOIN fin fb ON fb.c = fa.c AND fa.vec_id < fb.vec_id
  JOIN En ea ON ea.vec_id = fa.vec_id
  JOIN En eb ON eb.vec_id = fb.vec_id AND eb.j = ea.j
  GROUP BY fa.vec_id, fb.vec_id
  HAVING sum(ea.nv * eb.nv) >= {threshold!r}),
pu AS (SELECT u AS a, w AS b FROM pairs UNION ALL SELECT w, u FROM pairs),
members AS (SELECT DISTINCT a AS v FROM pu),
reach(v, l) AS (
    SELECT v, v FROM members
    UNION
    SELECT pu.b, reach.l FROM reach JOIN pu ON reach.v = pu.a
),
lbl AS (SELECT v, min(l) AS canon FROM reach GROUP BY v)
SELECT lbl.v AS vec_id, lbl.canon AS canonical_id, fin.c AS cluster
FROM lbl JOIN fin ON fin.vec_id = lbl.v
"""


def _coloring_rc(name: str, prio_expr: str, dynamic_sat: bool,
                 max_hops: int) -> str:
    """One Jones–Plassmann BSP coloring replay as a recursive CTE named
    ``{name}`` (state (hop, v, col[, sat])): per hop, an uncolored vertex
    wins when its priority exceeds every uncolored neighbor's, and takes the
    lowest color absent from its (previous-round) colored neighborhood —
    exactly graph/toolkit.ColoringVP's apply (priority+1 > blocked gather).
    The used-color set rides as a BIGINT bitmask (engine palette check
    guarantees < 64 colors here); min-free = trailing zeros of the
    complement, the same bit_count((x^(x-1))//2) trick as the FM oracle.
    ``prio_expr`` names a CTE with (v, p); with ``dynamic_sat`` the round
    priority is ``sat·nv + p`` and the state carries the saturation count
    (popcount of the gathered mask — one-round lag, like the engine's
    apply-computed ``newsat``)."""
    U64 = 18446744073709551615
    mask = "coalesce(bit_or(s.cmask), 0)"
    minfree = (f"bit_count((xor(({U64} - {mask})::UBIGINT, "
               f"({U64} - {mask} - 1)::UBIGINT) // 2)::UBIGINT)::BIGINT")
    if dynamic_sat:
        state = "col, sat"
        init = "-1::BIGINT, 0::BIGINT"
        self_row = ("SELECT hop, v, col AS scol, sat AS ssat, "
                    "NULL::BIGINT AS cmask, NULL::BIGINT AS bprio FROM " + name)
        nbr_prio = f"{name}.sat * nn2.nv + pn.p"
        nbr_row = (f"SELECT {name}.hop, und.b AS v, NULL, NULL, "
                   f"CASE WHEN {name}.col >= 0 THEN (1::BIGINT << {name}.col) END, "
                   f"CASE WHEN {name}.col < 0 THEN {nbr_prio} END "
                   f"FROM {name} JOIN und ON und.a = {name}.v "
                   f"JOIN {prio_expr} pn ON pn.v = {name}.v CROSS JOIN nn2")
        aggs = ("max(s.scol) AS mc, max(s.ssat) AS msat, "
                "coalesce(max(s.bprio), -1) AS bp, "
                f"bit_count({mask}::UBIGINT)::BIGINT AS newsat, "
                f"{minfree} AS minfree")
        win = "t.msat * nn2.nv + pr.p > t.bp"
        out = ("CASE WHEN t.mc >= 0 THEN t.mc "
               f"WHEN {win} THEN t.minfree ELSE -1 END, t.newsat")
        tail = f") t JOIN {prio_expr} pr ON pr.v = t.v CROSS JOIN nn2"
    else:
        state = "col"
        init = "-1::BIGINT"
        self_row = ("SELECT hop, v, col AS scol, "
                    "NULL::BIGINT AS cmask, NULL::BIGINT AS bprio FROM " + name)
        nbr_row = (f"SELECT {name}.hop, und.b AS v, NULL, "
                   f"CASE WHEN {name}.col >= 0 THEN (1::BIGINT << {name}.col) END, "
                   f"CASE WHEN {name}.col < 0 THEN pn.p END "
                   f"FROM {name} JOIN und ON und.a = {name}.v "
                   f"JOIN {prio_expr} pn ON pn.v = {name}.v")
        aggs = ("max(s.scol) AS mc, coalesce(max(s.bprio), -1) AS bp, "
                f"{minfree} AS minfree")
        out = ("CASE WHEN t.mc >= 0 THEN t.mc "
               "WHEN pr.p > t.bp THEN t.minfree ELSE -1 END")
        tail = f") t JOIN {prio_expr} pr ON pr.v = t.v"
    return f"""{name}(hop, v, {state}) AS (
    SELECT 0, v, {init} FROM verts
    UNION ALL
    SELECT t.hop + 1, t.v, {out}
    FROM (
        SELECT s.hop AS hop, s.v AS v, {aggs}
        FROM ({self_row}
              UNION ALL
              {nbr_row}) s
        WHERE s.hop < {max_hops}
        GROUP BY s.hop, s.v
    {tail}
)"""


def sql_coloring_variants(max_hops: int = 48) -> str:
    """Per-vertex colors for the degree-ordered and saturation-ordered
    (DSATUR) coloring variants, stacked under a ``variant`` column — the
    exact BSP replay of q_coloring_variants (verified color-for-color at
    sf0.01). Degree priority = rank by (degree, vid); saturation priority =
    saturation·nv + rank by (splitmix64(vid), vid), recomputed per round
    from the one-round-lagged saturation state. ``max_hops`` bounds the
    recursion and must exceed the rounds-to-full-coloring (≤ 27 measured at
    sf0.1; extra hops are a fixpoint no-op)."""
    from ..ids import _GOLDEN, _MIX1, _MIX2

    body = EDGES_CTE.split("WITH ", 1)[1]
    # both recursive chains share the edge/vertex/priority CTEs — mark them
    # MATERIALIZED or DuckDB re-inlines them into every recursion step
    for c in ("e", "verts", "und", "degs"):
        body = body.replace(f"{c} AS (", f"{c} AS MATERIALIZED (")
    degrees = DEGREES_CTE.replace("degs AS (", "degs AS MATERIALIZED (")
    return f"""
WITH RECURSIVE {body}{degrees},
nn2 AS (SELECT count(*)::BIGINT AS nv FROM verts),
dprio AS MATERIALIZED (SELECT vid AS v, row_number() OVER (ORDER BY deg, vid) - 1 AS p FROM degs),
y0 AS (SELECT v, (v::HUGEINT + {int(_GOLDEN)}) % 18446744073709551616 AS z0 FROM verts),
y1 AS (SELECT v, {_sm64_mulmod(_sm64_xsh('z0', 30), int(_MIX1))} AS z1 FROM y0),
y2 AS (SELECT v, {_sm64_mulmod(_sm64_xsh('z1', 27), int(_MIX2))} AS z2 FROM y1),
y3 AS (SELECT v, {_sm64_xsh('z2', 31)} AS z3 FROM y2),
mprio AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY z3, v) - 1 AS p FROM y3),
{_coloring_rc('rcd', 'dprio', False, max_hops)},
{_coloring_rc('rcs', 'mprio', True, max_hops)}
SELECT 'degree' AS variant, v AS vid, col AS color FROM rcd WHERE hop = {max_hops}
UNION ALL
SELECT 'saturation', v, col FROM rcs WHERE hop = {max_hops}
"""


def sql_boilerplate_stats(min_df: int = 5) -> str:
    """Cross-document boilerplate fraction (stages/curation
    .boilerplate_stats): distinct-shingle posting lists → df per shingle →
    per-doc fraction with df ≥ min_df. Distinct-string semantics ≡ the
    engine's distinct-hash postings barring collisions."""
    return f"""
WITH {_shingle_ctes()},
df AS (SELECT sh AS g, count(*) AS d FROM sh GROUP BY sh),
per AS (SELECT s.doc_id, count(*) AS n,
               sum((df.d >= {min_df})::BIGINT) AS c
        FROM sh s JOIN df ON df.g = s.sh GROUP BY s.doc_id)
SELECT doc_id, n::BIGINT AS n_shingles, c::BIGINT AS n_common,
       round(c::DOUBLE / n, 6) AS common_frac
FROM per
"""


def sql_unigram_logprob(alpha: float = 1.0) -> str:
    """Unigram-LM quality score (stages/curation.unigram_logprob): per-doc
    mean ln((c_w + alpha)/(N + alpha*V)) over corpus token counts. Counts
    over strings ≡ the engine's counts over blake2 hashes barring
    collisions; ln and the division hit identical doubles (same libm), and
    the per-doc mean differs only in summation order (~1e-15) — far from
    the 6-dp rounding boundaries."""
    return f"""
WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
           FROM documents),
cnt AS (SELECT w, count(*) AS c FROM t GROUP BY w),
tot AS (SELECT sum(c)::DOUBLE AS n, count(*)::DOUBLE AS v FROM cnt),
lp AS (SELECT w, ln((c + {alpha!r}) / (n + {alpha!r} * v)) AS lp
       FROM cnt CROSS JOIN tot),
per AS (SELECT t.doc_id, count(*) AS nt, avg(lp.lp) AS m
        FROM t JOIN lp ON lp.w = t.w GROUP BY t.doc_id)
SELECT doc_id, nt::BIGINT AS n_tokens, round(m, 6) AS logprob FROM per
"""


def sql_bigram_logprob(alpha: float = 1.0) -> str:
    """Bigram-LM quality score (stages/curation.bigram_logprob): per-doc
    mean ln((c(w1,w2)+alpha)/(ctx(w1)+alpha*V)) — pair/context counts over
    string pairs ≡ the engine's counts over blake2 pair hashes barring
    collisions; V = distinct unigrams; same precision argument as
    sql_unigram_logprob (identical libm doubles, per-doc mean differs only
    in summation order ~1e-15)."""
    return f"""
WITH t AS (SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9_]+'), 1) AS pos
           FROM documents),
bg AS (SELECT doc_id, w AS w1,
              lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       FROM t),
bgf AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
pc AS (SELECT w1, w2, count(*) AS c FROM bgf GROUP BY w1, w2),
ctx AS (SELECT w1, count(*) AS c FROM bgf GROUP BY w1),
vv AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM t),
lp AS (SELECT pc.w1, pc.w2,
              ln((pc.c + {alpha!r}) / (ctx.c + {alpha!r} * vv.v)) AS lp
       FROM pc JOIN ctx ON ctx.w1 = pc.w1 CROSS JOIN vv),
per AS (SELECT bgf.doc_id, count(*) AS nb, avg(lp.lp) AS m
        FROM bgf JOIN lp ON lp.w1 = bgf.w1 AND lp.w2 = bgf.w2
        GROUP BY bgf.doc_id)
SELECT doc_id, nb::BIGINT AS n_bigrams, round(m, 6) AS logprob FROM per
"""


def sql_dsir_logratio(target_lang: str = "en", alpha: float = 1.0) -> str:
    """DSIR importance weight (stages/curation.dsir_logratio): per-doc mean
    of ln p_target(w) − ln p_raw(w) over add-alpha-smoothed unigram LMs
    (target = docs with lang == target_lang, raw = whole corpus, shared
    vocabulary). Same precision argument as sql_unigram_logprob: counts
    over strings ≡ counts over blake2 hashes barring collisions, identical
    double math, per-doc mean differs only in summation order (~1e-15) —
    far from the 6-dp rounding boundaries."""
    return f"""
WITH t AS (SELECT doc_id, (lang = '{target_lang}') AS tgt,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
           FROM documents),
cnt AS (SELECT w, count(*) AS ca, count(*) FILTER (WHERE tgt) AS ct
        FROM t GROUP BY w),
tot AS (SELECT sum(ca)::DOUBLE AS na, sum(ct)::DOUBLE AS nt,
               count(*)::DOUBLE AS v FROM cnt),
lr AS (SELECT w, ln((ct + {alpha!r}) / (nt + {alpha!r} * v))
              - ln((ca + {alpha!r}) / (na + {alpha!r} * v)) AS lr
       FROM cnt CROSS JOIN tot),
per AS (SELECT t.doc_id, count(*) AS ntk, avg(lr.lr) AS m
        FROM t JOIN lr ON lr.w = t.w GROUP BY t.doc_id)
SELECT doc_id, ntk::BIGINT AS n_tokens, round(m, 6) AS dsir_score FROM per
"""


def sql_export_shard_counts(n_shards: int = 16, salt: int = 7) -> str:
    """Per-shard row counts of stages/export.export_shards' deterministic
    assignment shard = splitmix64(doc_id XOR salt) % n_shards — the exact
    HUGEINT mod-2^64 splitmix64 replay used by sql_approx_diameter."""
    mix = _sql_mix_ctes(
        "mx", "src",
        f"xor(CAST(doc_id AS UBIGINT), {int(salt)}::UBIGINT)", "h", [])
    return f"""
WITH src AS (SELECT doc_id FROM documents),
{mix}
SELECT CAST(h % {int(n_shards)} AS BIGINT) AS shard,
       count(*)::BIGINT AS n_rows
FROM mx_3 GROUP BY 1
"""


def sql_curate_corpus(min_tokens: int = 10, max_tokens: int = 100_000,
                      max_dup: float = 0.35, max_top: float = 0.2) -> str:
    """Fused corpus quality gate (stages/curation.curate_corpus): the
    repetition-fraction CTEs of sql_doc_repetition + the RE2 PII counts of
    sql_doc_pii, with the keep decision applied to the SAME 6-dp rounded
    fractions — decisions match exactly, not by tolerance."""
    from ..stages.curation import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
WITH t AS (SELECT doc_id, text,
                  regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
           FROM documents),
w AS (SELECT doc_id, unnest(toks) AS w FROM t),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
a1 AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS d,
              max(c)::BIGINT AS mx FROM wc GROUP BY 1),
f AS (SELECT t.doc_id,
             COALESCE(a1.n, 0)::BIGINT AS n_tokens,
             round(CASE WHEN a1.n > 0 THEN (a1.n - a1.d)::DOUBLE / a1.n
                        ELSE 0.0 END, 6) AS dup_word_frac,
             round(CASE WHEN a1.n > 0 THEN a1.mx::DOUBLE / a1.n
                        ELSE 0.0 END, 6) AS top_word_frac,
             (len(regexp_extract_all(text, '{EMAIL_RE}'))
              + len(regexp_extract_all(text, '{IPV4_RE}'))
              + len(regexp_extract_all(text, '{PHONE_RE}')))::BIGINT AS n_pii
      FROM t LEFT JOIN a1 ON a1.doc_id = t.doc_id)
SELECT doc_id, n_tokens, dup_word_frac, top_word_frac, n_pii,
       (CASE WHEN n_tokens >= {min_tokens} AND n_tokens <= {max_tokens}
             AND dup_word_frac <= {max_dup!r} AND top_word_frac <= {max_top!r}
             AND n_pii = 0 THEN 1 ELSE 0 END)::BIGINT AS keep
FROM f
"""


def sql_pack_manifest(seq_len: int = 512, n_shards: int = 16,
                      salt: int = 7) -> str:
    """stages/pack.pack_manifest replay: splitmix64 shard assignment (the
    export_shards hash) + a window-function exclusive prefix-sum of RE2
    token counts over (shard, doc_id) order — begin_tok/seq_id/seq_off are
    integer-exact, no tolerance."""
    mix = _sql_mix_ctes(
        "mx", "src",
        f"xor(CAST(doc_id AS UBIGINT), {int(salt)}::UBIGINT)", "h",
        ["doc_id", "n_tokens"])
    return f"""
WITH src AS (SELECT doc_id,
                    len(regexp_extract_all(lower(text),
                        '[a-z0-9_]+'))::BIGINT AS n_tokens
             FROM documents),
{mix},
sh AS (SELECT doc_id, n_tokens, CAST(h % {int(n_shards)} AS BIGINT) AS shard
       FROM mx_3),
c AS (SELECT shard, doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0)::BIGINT AS begin_tok
      FROM sh)
SELECT shard, doc_id, n_tokens, begin_tok,
       (begin_tok // {int(seq_len)})::BIGINT AS seq_id,
       (begin_tok % {int(seq_len)})::BIGINT AS seq_off
FROM c
"""


def sql_token_budget_sample(budget_tokens: int = 800, salt: int = 11) -> str:
    """stages/sampling.token_budget_sample replay: same splitmix64 priority,
    same (priority, doc_id) order, keep iff the inclusive window cumsum of
    RE2 token counts within the source is ≤ budget — integer-exact, so the
    engine's bucketed distributed selection must agree row-for-row."""
    mix = _sql_mix_ctes(
        "mx", "src",
        f"xor(CAST(doc_id AS UBIGINT), {int(salt)}::UBIGINT)", "p",
        ["doc_id", "source", "n_tokens"])
    return f"""
WITH src AS (SELECT doc_id, source,
                    len(regexp_extract_all(lower(text),
                        '[a-z0-9_]+'))::BIGINT AS n_tokens
             FROM documents),
{mix},
c AS (SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY p, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM mx_3)
SELECT doc_id, source, n_tokens,
       (CASE WHEN cum <= {int(budget_tokens)} THEN 1 ELSE 0 END)::BIGINT
           AS keep
FROM c
"""


def sql_line_dedup(min_df: int = 2) -> str:
    """Cross-document line-level dedup (stages/curation.line_dedup):
    normalized-line (trim + lower) document frequency over distinct
    (doc, line) pairs; lines with df >= min_df are dropped and each doc
    is rebuilt from its kept lines in original order. String-equality
    semantics == the engine's 64-bit line hashes barring collisions."""
    trim = "' ' || chr(9) || chr(13) || chr(11) || chr(12)"
    return f"""
WITH lines AS (
    SELECT doc_id,
           unnest(string_split(text, chr(10))) AS line,
           unnest(range(1, len(string_split(text, chr(10))) + 1)) AS ord
    FROM documents
), norm AS (
    SELECT doc_id, ord, line,
           lower(trim(line, {trim})) AS nline
    FROM lines
), df AS (
    SELECT nline, count(DISTINCT doc_id) AS df
    FROM norm WHERE nline <> '' GROUP BY 1
), flags AS (
    SELECT n.doc_id, n.ord, n.line,
           (CASE WHEN d.df >= {min_df} THEN 1 ELSE 0 END) AS dropped
    FROM norm n LEFT JOIN df d ON n.nline = d.nline
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN dropped = 0 THEN line END, chr(10)
                           ORDER BY ord), '') AS text,
       count(*)::BIGINT AS n_lines,
       CAST(sum(dropped) AS BIGINT) AS n_dropped
FROM flags GROUP BY doc_id
"""
