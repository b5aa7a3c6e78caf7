"""Graph suite: the reference's 2-hop friend-of-friend traversal
(cmd/query/main.go:29-43) and its building blocks, oracle-checked
against plain-SQL set algebra (SURVEY.md G1-G5).

TEAM is a fixed seed team (nationkey 7's customers); present at every
scale factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import register_views
from ..graph import traverse as G
from ..registry import register
from ..views import oracle_with_views as V

TEAM = "7"

# shared oracle CTEs: seeds / hop1 / hop2 exactly as the DGraphQL var
# blocks define them (exclusions = NOT IN earlier frontiers)
_HOPS = f"""
, seeds AS (
    SELECT DISTINCT person_id AS id FROM team_member WHERE team_id = '{TEAM}'
),
hop1 AS (
    SELECT DISTINCT e.dst AS id
    FROM edges e JOIN seeds s ON e.src = s.id
    WHERE e.dst NOT IN (SELECT id FROM seeds)
),
hop2 AS (
    SELECT DISTINCT e.dst AS id
    FROM edges e JOIN hop1 h ON e.src = h.id
    WHERE e.dst NOT IN (SELECT id FROM hop1)
      AND e.dst NOT IN (SELECT id FROM seeds)
)
"""


# One materialized edge table per (session, sf_dir), shared by every
# graph query: the edges view (explode + groupBy(src,dst) max over
# events) is computed ONCE into a bucketed-by-src catalog table, so
# every traversal's plan starts from a plain bucketed scan -- the
# view's union+agg exchange runs once at materialization instead of
# appearing in (and being re-planned under) every hop query, and a
# frontier too large to broadcast falls back to a shuffle join that
# moves only the frontier (edges are already hash-laid-out on src).
# This is the persisted/bucketed edge table a cluster deployment owns;
# .cache() on top keeps the scan memory-resident per session. Bounded
# (a session touches at most a couple of sf dirs) and deliberately
# long-lived -- per-traversal caches (the frontiers) are evicted by
# the next k_hop call instead.
_EDGE_CACHE: dict = {}


def _session_stopped(df) -> bool:
    sc = getattr(df.sparkSession, "_sc", None)
    return sc is None or getattr(sc, "_jsc", None) is None


def _cached_edges(spark, sf_dir):
    import os

    from ..catalog import table_path
    from ..sources.bucketed import bucketed_table

    # lazy stopped-session eviction (similarity._OPEN_INDEXES's
    # lifecycle): each cached DataFrame pins its session, so without
    # the sweep a soak that cycles sessions accumulates dead entries
    # (and their pinned JVM sessions) forever. pop, not del: two
    # concurrent graph queries may both compute this sweep list
    for k in [k for k, v in list(_EDGE_CACHE.items()) if _session_stopped(v)]:
        _EDGE_CACHE.pop(k, None)
    # the key carries the SOURCE content version (mtime_ns+size, the
    # repo-wide staleness convention, same file the rest of the engine
    # reads via catalog.table_path): a fixture regenerated in place
    # mid-session must rebuild, or every graph query serves the
    # pre-rebuild .cache()d edges while the oracle reads the new file
    st = os.stat(table_path(sf_dir, "events"))
    key = (
        id(spark),
        os.path.abspath(sf_dir),
        st.st_mtime_ns,
        st.st_size,
    )
    df = _EDGE_CACHE.get(key)
    if df is None:
        # unpersist + evict superseded versions of the same source so
        # the rebuilt fixture's cache doesn't stack on the old one's
        for k in [k for k in list(_EDGE_CACHE) if k[:2] == key[:2]]:
            try:
                _EDGE_CACHE.pop(k).unpersist()
            except Exception:
                pass
        _register_graph_views(spark, sf_dir)
        # the table base name carries the FULL source identity via the
        # shared catalog.source_tag (path hash, not just basename):
        # bucketed_table's version eviction sweeps siblings of one base
        # name, so a same-named fixture under a different parent
        # (/x/sf0.01 vs /y/sf0.01) must get its own base -- a
        # basename-only tag let one fixture's build DROP the other's
        # still-cached table out from under this cache (eviction scope
        # must equal cache scope)
        from ..catalog import source_tag

        df = bucketed_table(
            spark,
            spark.table("edges"),
            f"bkt_graph_edges_{source_tag(sf_dir)}",
            "src",
            version=f"{st.st_mtime_ns}_{st.st_size}",
        ).cache()
        _EDGE_CACHE[key] = df
    return df


# The graph family reads ONLY the customer+events slice (every view
# below derives from those two): partial registration skips the
# first-use compaction jobs for lineitem/orders/documents/embeddings,
# which a one-shot CLI --dql traversal (or a g01-only run) would
# otherwise pay for tables it never touches. Order matters: edges
# reads user_relationship (caller owns dependency order).
_GRAPH_TABLES = ("customer", "events")
_GRAPH_VIEWS = (
    "user_relationship",
    "team_member",
    "person",
    "trove_user",
    "edges",
)


def _register_graph_views(spark, sf_dir):
    register_views(spark, sf_dir, tables=_GRAPH_TABLES, views=_GRAPH_VIEWS)


def _graph_inputs(spark, sf_dir):
    _register_graph_views(spark, sf_dir)
    return (
        _cached_edges(spark, sf_dir),
        spark.table("team_member"),
        spark.table("person"),
    )


@register("g01_team_seed", V(_HOPS + "SELECT id FROM seeds"))
def g01_team_seed(spark, sf_dir):
    """G1: seed uid set = eq(team_id, $x) -> has_member."""
    _, team_member, _ = _graph_inputs(spark, sf_dir)
    return G.team_seed(team_member, TEAM)


@register("g02_hop1", V(_HOPS + "SELECT id FROM hop1"))
def g02_hop1(spark, sf_dir):
    """G2: 1-hop expansion excluding the seed set (broadcast frontier,
    anti-join exclusion)."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    return G.k_hop(edges, seeds, k=1)[0]


@register("g03_hop2", V(_HOPS + "SELECT id FROM hop2"))
def g03_hop2(spark, sf_dir):
    """G3: 2-hop expansion excluding hop1 AND seeds."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    return G.k_hop(edges, seeds, k=2)[1]


@register("g03_hop2_coldedges", V(_HOPS + "SELECT id FROM hop2"))
def g03_hop2_coldedges(spark, sf_dir):
    """Uncached control twin of g03_hop2 (round 13, bench honesty):
    the traversal over the edges VIEW itself, so the explode +
    groupBy(src,dst) view pipeline executes INSIDE the timed region --
    no session-persisted bucketed edge table, no .cache(). Benchmarked
    next to g03_hop2, the pair records ingest-included vs post-ingest
    steady state the same way b07/b07_bucketed does for the join
    lanes; the cached lane's number remains the recurring-query cost a
    cluster that owns the persisted table would see."""
    _register_graph_views(spark, sf_dir)
    edges = spark.table("edges")
    seeds = G.team_seed(spark.table("team_member"), TEAM)
    return G.k_hop(edges, seeds, k=2)[1]


@register(
    "g04_hop_counts",
    V(_HOPS + """
      SELECT (SELECT COUNT(*) FROM hop1) AS hop1_count,
             (SELECT COUNT(*) FROM hop2) AS hop2_count
    """),
)
def g04_hop_counts(spark, sf_dir):
    """G4: frontier cardinalities, the reference query's actual output."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    return G.hop_counts(edges, seeds, k=2)


@register(
    "g05_fof_persons",
    V(_HOPS + """
      SELECT p.person_id, p.name
      FROM hop2 h JOIN person p ON h.id = p.person_id
    """),
)
def g05_fof_persons(spark, sf_dir):
    """G5/G4: hop-2 frontier materialized back to person rows
    (var-block threading = intermediate cached DataFrames) -- routes
    the library's friend_of_friend, the one copy of the reference
    query end-to-end."""
    edges, team_member, person = _graph_inputs(spark, sf_dir)
    return G.friend_of_friend(edges, team_member, person, TEAM)


# The VERBATIM query text the reference binary sends over gRPC
# (cmd/query/main.go:29-43, fmt.Sprintf'd with the team id) -- tabs,
# comment line and all. g30 consumes this string through the DQL
# front-end (graph/dql.py) instead of hand-built DataFrames.
REFERENCE_DQL = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  var(func: uid(src)){
    hop1 as has_connection @filter(NOT uid(src))
  }
  hop1_count(func: uid(hop1)){
\t# person_id
    hop2 as has_connection @filter(NOT uid(hop1) AND NOT uid(src))
  }
  hop2_count(func: uid(hop2)){
    person_id
  }
}""" % TEAM


def dql_fixture_graph(spark, sf_dir):
    """DqlGraph binding of the fixture onto the reference's predicate
    names: team nodes are 't:<team_id>' uids, persons 'p:<person_id>'
    (one shared uid namespace, the way Dgraph's bulk loader assigns
    blank-node uids per entity -- bulk/main.go:271-329);
    ``has_member`` reads team_member, ``has_connection`` the shared
    bucketed edge table."""
    from ..graph.dql import DqlGraph

    edges, team_member, person = _graph_inputs(spark, sf_dir)
    customer = spark.table("customer")
    p = lambda c: F.concat(F.lit("p:"), F.col(c).cast("string"))  # noqa: E731
    return DqlGraph(
        edge_preds={
            "has_member": team_member.select(
                F.concat(F.lit("t:"), F.col("team_id").cast("string")).alias(
                    "src"
                ),
                p("person_id").alias("dst"),
            ),
            # score rides along as the edge's FACET column (the
            # reference's A10 edge score is a Dgraph facet); @facets
            # predicates filter on it, plain traversals project it away
            "has_connection": edges.select(
                p("src").alias("src"),
                p("dst").alias("dst"),
                "score",
            ),
        },
        eq_index={
            "team_id": team_member.select(
                F.concat(F.lit("t:"), F.col("team_id").cast("string")).alias(
                    "id"
                ),
                F.col("team_id").cast("string").alias("value"),
            ),
            # numeric person_id index: ge/le/gt/lt filter terms and
            # orderasc keys compare 9 < 10, not '10' < '9'
            "person_id": person.select(
                p("person_id").alias("id"),
                F.col("person_id").cast("string").alias("value"),
            ),
            # a categorical attribute for @groupby lanes
            "nation_id": customer.select(
                p("c_custkey").alias("id"),
                F.col("c_nationkey").cast("string").alias("value"),
            ),
        },
        leaf_attrs={
            "person_id": person.select(
                p("person_id").alias("id"), "person_id"
            )
        },
        attr_types={"person_id": "int"},
    )


@register(
    "g30_dql_reference_query",
    V(_HOPS + """
      SELECT (SELECT COUNT(*) FROM hop1) AS hop1_count,
             (SELECT COUNT(*) FROM hop2) AS hop2_count
    """),
    defer=True,
)
def g30_dql_reference_query(spark, sf_dir):
    """EP3 verbatim parity: execute the reference binary's LITERAL
    DQL text (REFERENCE_DQL, cmd/query/main.go:29-43) through the
    graph/dql.py front-end and emit the two named blocks' frontier
    counts -- certified against g04's oracle (same columns, same
    values), so the text front-end and the hand-built g01-g05 plans
    are pinned result-identical. Scale shape inherits run_dql's:
    broadcast frontiers against the bucketed edge table, anti-join
    exclusions, no edge-table movement."""
    from ..graph.dql import run_dql

    results = run_dql(REFERENCE_DQL, dql_fixture_graph(spark, sf_dir))
    by_name = {r.name: r for r in results}
    row = None
    for name in ("hop1_count", "hop2_count"):
        c = by_name[name].uids.agg(F.count(F.lit(1)).alias(name))
        row = c if row is None else row.crossJoin(c)
    return row


# ---- DQL beyond the reference's literal text: the practical Dgraph
# subset a reference user writes next (root @filter boolean algebra,
# has/ge root funcs, orderasc+first/offset pagination, count(pred)
# fan-out). Each lane is a DQL TEXT consumed through graph/dql.py and
# certified against a plain-SQL oracle -- the front-end is the unit
# under test, not hand-built DataFrames.

_DQL_FILTER_ALGEBRA = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  var(func: uid(src)){
    h1 as has_connection
  }
  picked(func: uid(h1)) @filter((ge(person_id, 40) OR NOT has(has_connection)) AND NOT uid(src)){
    person_id
  }
}""" % TEAM


@register(
    "g31_dql_filter_algebra",
    V("""
    , seeds AS (
        SELECT DISTINCT person_id AS id
        FROM team_member WHERE team_id = '7'
    ),
    h1 AS (
        SELECT DISTINCT e.dst AS id
        FROM edges e JOIN seeds s ON e.src = s.id
        WHERE e.dst IS NOT NULL
    )
    SELECT p.person_id AS person_id
    FROM h1 JOIN person p ON h1.id = p.person_id
    WHERE (CAST(p.person_id AS DOUBLE) >= 40
           -- src IS NOT NULL: a NULL in a NOT-IN subquery silently
           -- empties the whole result in SQL, while the Spark side's
           -- anti-join just ignores NULL ids (latent-divergence
           -- class from the round-9 review)
           OR h1.id NOT IN (SELECT DISTINCT src FROM edges
                            WHERE dst IS NOT NULL
                              AND src IS NOT NULL))
      AND h1.id NOT IN (SELECT id FROM seeds)
    """),
    defer=True,
)
def g31_dql_filter_algebra(spark, sf_dir):
    """DQL root @filter with the full boolean algebra: (ge(attr, n)
    OR NOT has(pred)) AND NOT uid(var) over the 1-hop frontier --
    OR is a union-dedup of branch survivors, NOT a left-anti join,
    the ge term a typed (numeric) eq-index range, has(pred) the edge
    table's source set. Public DQL semantics (Dgraph docs); executed
    from the query TEXT via graph/dql.py."""
    from ..graph.dql import run_dql

    (res,) = run_dql(
        _DQL_FILTER_ALGEBRA, dql_fixture_graph(spark, sf_dir)
    )
    # leaf projection is a LEFT join (Dgraph returns partial nodes);
    # this lane emits only the resolvable person_ids, mirroring the
    # oracle's inner person join
    return res.attrs.select("person_id").filter(
        F.col("person_id").isNotNull()
    )


_DQL_ORDERED_PAGE = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  page(func: uid(src), orderasc: person_id, offset: 3, first: 12){
    person_id
  }
}""" % TEAM


@register(
    "g32_dql_ordered_page",
    V("""
    , seeds AS (
        SELECT DISTINCT person_id AS id
        FROM team_member WHERE team_id = '7'
    ),
    ranked AS (
        SELECT p.person_id AS person_id,
               CAST(ROW_NUMBER() OVER (
                    ORDER BY CAST(p.person_id AS DOUBLE), s.id
               ) AS BIGINT) AS rn
        FROM seeds s JOIN person p ON s.id = p.person_id
    )
    SELECT person_id, rn FROM ranked WHERE rn > 3 AND rn <= 15
    """),
    defer=True,
)
def g32_dql_ordered_page(spark, sf_dir):
    """DQL ordered pagination: orderasc on a numeric attribute with
    offset+first. Plans as TakeOrderedAndProject top-(offset+first)
    (the b24 shape -- per-partition heaps, never a global sort), then
    row_number over the one page of survivors; rn pins the page order
    through the driver's order-insensitive hash."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_ORDERED_PAGE, dql_fixture_graph(spark, sf_dir))
    return res.attrs.select("person_id", "rn")


_DQL_COUNT_FANOUT = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  fanout(func: uid(src)){
    person_id
    count(has_connection)
  }
}""" % TEAM


@register(
    "g33_dql_count_fanout",
    V("""
    , seeds AS (
        SELECT DISTINCT person_id AS id
        FROM team_member WHERE team_id = '7'
    )
    SELECT p.person_id AS person_id,
           CAST(COALESCE(c.cnt, 0) AS BIGINT) AS count_has_connection
    FROM seeds s
    JOIN person p ON s.id = p.person_id
    LEFT JOIN (
        SELECT src, COUNT(DISTINCT dst) AS cnt
        FROM edges WHERE dst IS NOT NULL GROUP BY src
    ) c ON c.src = s.id
    """),
    defer=True,
)
def g33_dql_count_fanout(spark, sf_dir):
    """DQL count(pred) projection: each seed member's distinct
    out-neighbor count through has_connection, 0 when none -- a
    map-side partial countDistinct on the edge table joined back onto
    the (small) root frame, Dgraph's count-of-uid-list semantics."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_COUNT_FANOUT, dql_fixture_graph(spark, sf_dir))
    return res.attrs.select("person_id", "count_has_connection")


_DQL_RECURSE = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  reach(func: uid(src)) @recurse(depth: 4, loop: false){
    has_connection
  }
}""" % TEAM


@register(
    "g34_dql_recurse",
    V("""
    , seeds AS (
        SELECT DISTINCT person_id AS id
        FROM team_member WHERE team_id = '7'
    ),
    walk AS (
        SELECT id, 0 AS lvl FROM seeds
        UNION
        SELECT e.dst AS id, w.lvl + 1 AS lvl
        FROM walk w JOIN edges e ON e.src = w.id
        WHERE w.lvl < 3 AND e.dst IS NOT NULL
    )
    SELECT DISTINCT id FROM walk
    """, recursive=True),
    defer=True,
)
def g34_dql_recurse(spark, sf_dir):
    """DQL @recurse(depth: 4): the flattened reach set within 3
    expansions of the seed team, from query TEXT through graph/dql.py
    -- visited-pruned BFS (broadcast frontier vs the never-moved edge
    table, anti-join pruning, per-level checkpoints) certified against
    DuckDB's WITH RECURSIVE transitive walk. Ids are emitted in the
    raw person namespace ('p:' prefix stripped) so the oracle reads
    the same keys the seeds CTE produces."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_RECURSE, dql_fixture_graph(spark, sf_dir))
    return res.uids.select(
        F.expr("substring(id, 3)").alias("id")
    )


# shared oracle CTE: each seed member's distinct out-degree (0 kept),
# the value variable 'd as count(has_connection)' binds
_DEGREES = """
    , seeds AS (
        SELECT DISTINCT person_id AS id
        FROM team_member WHERE team_id = '7'
    ),
    degrees AS (
        SELECT s.id, COALESCE(c.cnt, 0) AS cnt
        FROM seeds s
        LEFT JOIN (
            SELECT src, COUNT(DISTINCT dst) AS cnt
            FROM edges
            WHERE dst IS NOT NULL AND src IS NOT NULL
            GROUP BY src
        ) c ON c.src = s.id
    )
"""

_DQL_VALUE_AGGS = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  var(func: uid(src)){
    d as count(has_connection)
  }
  stats(func: uid(d)){
    min(val(d))
    max(val(d))
    sum(val(d))
    avg(val(d))
  }
}""" % TEAM


@register(
    "g35_dql_value_aggregates",
    V(_DEGREES + """
    SELECT CAST(MIN(cnt) AS DOUBLE) AS min_d,
           CAST(MAX(cnt) AS DOUBLE) AS max_d,
           CAST(CAST(SUM(CAST(cnt AS DECIMAL(18,6))) AS DECIMAL(38,6))
                AS DOUBLE) AS sum_d,
           CAST(SUM(CAST(cnt AS DECIMAL(18,6))) AS DOUBLE)
                / CAST(COUNT(cnt) AS DOUBLE) AS avg_d
    FROM degrees
    """),
    defer=True,
)
def g35_dql_value_aggregates(spark, sf_dir):
    """DQL value variables + aggregation: bind each seed member's
    distinct out-degree as a value var (d as count(has_connection)),
    then emit a one-row min/max/sum/avg(val(d)) block -- per-uid
    scalars reduced map-side, sum/avg through exact decimal sums (the
    registry's cross-engine convention). Public Dgraph semantics
    (value variables, aggregation blocks); executed from query TEXT."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_VALUE_AGGS, dql_fixture_graph(spark, sf_dir))
    return res.attrs


_DQL_VALUE_FILTER = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  var(func: uid(src)){
    d as count(has_connection)
  }
  active(func: uid(d)) @filter(gt(val(d), 0) AND lt(val(d), 50)){
    person_id
  }
}""" % TEAM


@register(
    "g36_dql_value_filter",
    V(_DEGREES + """
    SELECT p.person_id AS person_id
    FROM degrees d JOIN person p ON d.id = p.person_id
    WHERE d.cnt > 0 AND d.cnt < 50
    """),
    defer=True,
)
def g36_dql_value_filter(spark, sf_dir):
    """DQL val() filter terms: root over the uids a value var is
    defined on, pruned by gt/lt comparisons against the bound
    per-uid scalar -- each term filters the (root-scoped) value frame
    and semi-joins back, no row ever widens."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_VALUE_FILTER, dql_fixture_graph(spark, sf_dir))
    return res.attrs.select("person_id").filter(
        F.col("person_id").isNotNull()
    )


_DQL_GROUPBY = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  var(func: uid(src)){
    h1 as has_connection
  }
  by_nation(func: uid(h1)) @groupby(nation_id){
    count(uid)
  }
}""" % TEAM


@register(
    "g37_dql_groupby",
    V("""
    , seeds AS (
        SELECT DISTINCT person_id AS id
        FROM team_member WHERE team_id = '7'
    ),
    h1 AS (
        SELECT DISTINCT e.dst AS id
        FROM edges e JOIN seeds s ON e.src = s.id
        WHERE e.dst IS NOT NULL
    )
    SELECT CAST(c.c_nationkey AS VARCHAR) AS nation_id,
           COUNT(*) AS count
    FROM h1 JOIN customer c ON h1.id = CAST(c.c_custkey AS VARCHAR)
    GROUP BY c.c_nationkey
    """),
    defer=True,
)
def g37_dql_groupby(spark, sf_dir):
    """DQL @groupby: bucket the 1-hop frontier by a node attribute
    (nation) and count each group -- uids lacking the attribute drop
    (Dgraph's grouping rule), one hash aggregate over the root-scoped
    value frame."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_GROUPBY, dql_fixture_graph(spark, sf_dir))
    return res.attrs


_DQL_FACETS = """{
  var(func: eq(team_id, %s)){
    src as has_member
  }
  var(func: uid(src)){
    strong as has_connection @facets(ge(score, 1))
  }
  reached(func: uid(strong)){
    count(uid)
  }
}""" % TEAM


@register(
    "g38_dql_facet_filter",
    V("""
    , seeds AS (
        SELECT DISTINCT person_id AS id
        FROM team_member WHERE team_id = '7'
    )
    SELECT COUNT(DISTINCT e.dst) AS count
    FROM edges e JOIN seeds s ON e.src = s.id
    WHERE e.dst IS NOT NULL AND e.score >= 1
    """),
    defer=True,
)
def g38_dql_facet_filter(spark, sf_dir):
    """DQL @facets edge pruning: traverse only edges whose score
    facet clears the threshold (the reference's A10 edge score IS a
    Dgraph facet) -- a row filter on the edge scan before the
    broadcast-frontier join, never a join of its own."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_FACETS, dql_fixture_graph(spark, sf_dir))
    return res.attrs


def dql_documents_graph(spark, sf_dir):
    """DqlGraph binding of the DOCUMENTS table: the front-end is
    schema-agnostic, so term/regexp search runs over any string
    predicate -- here a corpus, not people. Nodes are 'd:<doc_id>'
    uids; ``text``/``lang`` are term-searchable string attributes,
    ``doc_id`` the leaf projection."""
    from ..graph.dql import DqlGraph

    register_views(spark, sf_dir, tables=("documents",), views=())
    docs = spark.table("documents")
    did = F.concat(F.lit("d:"), F.col("doc_id").cast("string"))
    return DqlGraph(
        edge_preds={},
        eq_index={
            "text": docs.select(
                did.alias("id"), F.col("text").alias("value")
            ),
            "lang": docs.select(
                did.alias("id"), F.col("lang").alias("value")
            ),
            # numeric index so between/ge/le roots range over doc ids
            "doc_id": docs.select(
                did.alias("id"), F.col("doc_id").cast("string").alias("value")
            ),
        },
        # three leaf attributes -> expand(_all_) has real surface
        leaf_attrs={
            "doc_id": docs.select(did.alias("id"), "doc_id"),
            "n_chars": docs.select(did.alias("id"), "n_chars"),
            "source": docs.select(did.alias("id"), "source"),
        },
        attr_types={"doc_id": "int", "n_chars": "int"},
    )


# anyofterms root + allofterms/regexp filter terms over the document
# corpus: Dgraph's term-index string-search functions (the most-used
# funcs after eq/uid), executed from query TEXT via graph/dql.py.
# Terms are drawn from the synthetic corpus's actual vocabulary so the
# driver row is NON-vacuous (round-11 verdict: the original
# "shuffle broadcast"/"query plan" terms appear nowhere in the sf0.01
# corpus, so both engines returned 0 rows and the hash certified only
# "both empty"); each clause prunes: at sf0.01 anyofterms keeps 455 of
# 500 docs, allofterms 290, NOT regexp 40.
_DQL_TERM_SEARCH = """{
  matched(func: anyofterms(text, "vector stream"))
      @filter(allofterms(text, "query merge")
              AND NOT regexp(text, /cust.mer/)) {
    doc_id
  }
}"""


@register(
    "g39_dql_term_search",
    V("""
    , toks AS (
        SELECT doc_id, text,
               string_split_regex(lower(text), '[^a-z0-9]+') AS t
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id FROM toks
    WHERE list_has_any(t, ['vector', 'stream'])
      AND list_has_all(t, ['query', 'merge'])
      AND NOT regexp_matches(text, 'cust.mer')
    """),
    defer=True,
)
def g39_dql_term_search(spark, sf_dir):
    """DQL string-search functions (anyofterms root, allofterms +
    NOT regexp filter terms): both engines tokenize stored text the
    SAME way (lowercase, split on non-alphanumeric runs) and regexp
    matches the raw string -- all three are scan-side row filters on
    the eq-index (pushed to parquet in a real deployment), composed by
    the uid-set boolean algebra. Closes the round-10 verdict's DQL
    string-search gap (cmd/query/main.go:33-39 generalizes to these
    per Dgraph's public docs)."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_TERM_SEARCH, dql_documents_graph(spark, sf_dir))
    return res.attrs.select("doc_id")


# between(attr, lo, hi) root (inclusive typed range, Dgraph's
# documented semantics) under ordered pagination
_DQL_BETWEEN = """{
  page(func: between(person_id, 10, 25), orderdesc: person_id,
       offset: 2, first: 8){
    person_id
  }
}"""


@register(
    "g40_dql_between",
    V("""
    , ranked AS (
        SELECT p.person_id AS person_id,
               CAST(ROW_NUMBER() OVER (
                    ORDER BY CAST(p.person_id AS DOUBLE) DESC,
                             CAST(p.person_id AS VARCHAR)
               ) AS BIGINT) AS rn
        FROM person p
        WHERE CAST(p.person_id AS DOUBLE) BETWEEN 10 AND 25
    )
    SELECT person_id, rn FROM ranked WHERE rn > 2 AND rn <= 10
    """),
    defer=True,
)
def g40_dql_between(spark, sf_dir):
    """DQL between(attr, lo, hi): the inclusive typed range as ONE
    index consultation (the ge-AND-le spelling consults it once per
    bound), composed with descending ordered pagination -- still the
    top-(offset+first) TakeOrderedAndProject shape. Oracle ids rank
    with the same id tie-break the executor uses ('p:<id>' strings
    order like bare id strings within equal person_id keys)."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_BETWEEN, dql_fixture_graph(spark, sf_dir))
    return res.attrs.select("person_id", "rn")


_DQL_EXPAND_ALL = """{
  docs(func: between(doc_id, 5, 40)) @filter(anyofterms(lang, "en de")){
    expand(_all_)
  }
}"""


@register(
    "g41_dql_expand_all",
    V("""
    SELECT doc_id, n_chars, source
    FROM documents
    WHERE doc_id BETWEEN 5 AND 40
      AND list_has_any(
            string_split_regex(lower(lang), '[^a-z0-9]+'),
            ['en', 'de'])
    """),
    defer=True,
)
def g41_dql_expand_all(spark, sf_dir):
    """DQL expand(_all_): project EVERY bound leaf attribute of the
    root uids (Dgraph resolves _all_ through its type system; the
    binding-dict analog is the bound leaf_attrs set), left-joined in
    sorted attribute order. Root ranges over the numeric doc_id index
    (between) with a term filter on lang -- three leaf tables join
    back onto the (broadcast-small) root frame."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_EXPAND_ALL, dql_documents_graph(spark, sf_dir))
    return res.attrs.select("doc_id", "n_chars", "source")


# @normalize: Dgraph's flattened-output directive -- the one grammar
# position where NESTED sub-blocks are in-subset. One flat row per
# root->member->connection path; members without connections keep a
# NULL peer, connections to ids without a person row keep a NULL peer
# value (the flat-table spelling of Dgraph omitting absent fields).
_DQL_NORMALIZE = """{
  flat(func: eq(team_id, %s)) @normalize {
    has_member {
      member: person_id
      has_connection {
        peer: person_id
      }
    }
  }
}""" % TEAM


@register(
    "g42_dql_normalize",
    V(f"""
    , mem AS (
        SELECT person_id AS mid FROM team_member WHERE team_id = '{TEAM}'
    )
    SELECT 't:{TEAM}' AS id,
           pm.person_id AS member,
           pp.person_id AS peer
    FROM mem m
    LEFT JOIN person pm ON pm.person_id = m.mid
    LEFT JOIN edges e  ON e.src = m.mid
    LEFT JOIN person pp ON pp.person_id = e.dst
    """),
    defer=True,
)
def g42_dql_normalize(spark, sf_dir):
    """DQL @normalize: nested sub-blocks flattened to one row per
    root-to-leaf path combination, only ALIASED predicates projected
    (Dgraph's documented rule). Per nesting level the distinct parent
    set broadcasts against the never-moved edge table and the child
    subtree flattens once over distinct child ids (graph/dql.py
    _normalize_flatten) -- closes the round-11 verdict's named
    @normalize gap (Dgraph's public @normalize semantics generalizing
    cmd/query/main.go:29-43's flat projection)."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_NORMALIZE, dql_fixture_graph(spark, sf_dir))
    return res.attrs.select("id", "member", "peer")


# alloftext root + NOT anyoftext filter: Dgraph's FULLTEXT index
# functions through the shared analyzer (graph/dql.py: lowercase,
# split, fixed stopword drop, suffix-strip stemmer) -- 'sorting' and
# 'streams' stem to the corpus vocabulary's 'sort'/'stream', and the
# stopwords 'the'/'of' in the query text drop before matching. At
# sf0.01: alloftext keeps 324 of 500 docs, NOT anyoftext 52.
_DQL_FULLTEXT = """{
  hits(func: alloftext(text, "the sorting of streams"))
      @filter(NOT anyoftext(text, "customers")) {
    doc_id
  }
}"""


def _fulltext_duckdb(col: str) -> str:
    from ..graph.dql import fulltext_tokens_sql

    return fulltext_tokens_sql(
        col, "string_split_regex", "list_transform", "list_filter"
    )


@register(
    "g43_dql_fulltext",
    V(f"""
    , st AS (
        SELECT doc_id, {_fulltext_duckdb('text')} AS stems
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id FROM st
    WHERE list_has_all(stems, ['sort', 'stream'])
      AND NOT list_has_any(stems, ['customer'])
    """),
    defer=True,
)
def g43_dql_fulltext(spark, sf_dir):
    """DQL alloftext/anyoftext: Dgraph's fulltext-index matching
    (stemmed query coverage of the stemmed stored token set) through
    the ONE analyzer definition both engines compile from
    (graph/dql.py fulltext_tokens_sql -- the oracle above embeds the
    SAME stem rules as DuckDB SQL, so the two engines cannot drift).
    Scan-side row filters on the eq-index composed by the uid-set
    algebra; closes the round-11 verdict's named alloftext gap with
    the analyzer bound documented in the module docstring and
    SURVEY.md s3."""
    from ..graph.dql import run_dql

    (res,) = run_dql(_DQL_FULLTEXT, dql_documents_graph(spark, sf_dir))
    return res.attrs.select("doc_id")


@register(
    "g06_khop_k3",
    V(_HOPS + """
      , hop3 AS (
        SELECT DISTINCT e.dst AS id
        FROM edges e JOIN hop2 h ON e.src = h.id
        WHERE e.dst NOT IN (SELECT id FROM hop2)
          AND e.dst NOT IN (SELECT id FROM hop1)
          AND e.dst NOT IN (SELECT id FROM seeds)
      )
      SELECT id FROM hop3
    """),
)
def g06_khop_k3(spark, sf_dir):
    """k-hop generalization (k=3): the reference hard-codes k=2; the
    engine's BFS loop is parameterized (iterative join + anti-join +
    distinct with lineage checkpointing)."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    return G.k_hop(edges, seeds, k=3)[2]


@register(
    "g08_degree_stats",
    V("""
      , outd AS (
        SELECT src AS node, COUNT(*) AS out_deg,
               CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS out_score
        FROM edges GROUP BY src
      ),
      ind AS (
        SELECT dst AS node, COUNT(*) AS in_deg,
               CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS in_score
        FROM edges GROUP BY dst
      )
      SELECT COALESCE(o.node, i.node) AS node,
             COALESCE(out_deg, 0) AS out_deg,
             COALESCE(in_deg, 0)  AS in_deg,
             COALESCE(out_score, 0.0) AS out_score,
             COALESCE(in_score, 0.0)  AS in_score
      FROM outd o FULL OUTER JOIN ind i ON o.node = i.node
    """),
)
def g08_degree_stats(spark, sf_dir):
    """Degree centrality: per-node in/out degree + weighted degree over
    the post-pipeline edge table (two same-key hash aggs + outer join)."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.degree_stats(edges)


@register(
    "g09_triangle_count",
    V("""
      , und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
      )
      SELECT COUNT(*) AS n_triangles
      FROM und e1
      JOIN und e2 ON e1.b = e2.a
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """),
)
def g09_triangle_count(spark, sf_dir):
    """Triangle count: each triangle found exactly once as a closed
    wedge (two equi-joins, no window, no global sort).

    Round 13: executes the DEGREE-oriented enumeration (the count is
    provably orientation-independent -- property-pinned against the
    lexicographic baseline, which stays in traverse.triangle_count).
    The lexicographic wedge join measured 105 s at sf1 vs 6.2 s
    oriented: this fixture's 50 event-hub nodes give the lex form
    deg(hub)^2 wedge fan-out that the (degree, id) orientation caps
    at O(sqrt(m)). The oracle text is unchanged (same count)."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.triangle_count_degree_oriented(edges)


@register(
    "g11_triangle_degree_oriented",
    V("""
      , und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
      )
      SELECT COUNT(*) AS n_triangles
      FROM und e1
      JOIN und e2 ON e1.b = e2.a
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """),
)
def g11_triangle_degree_oriented(spark, sf_dir):
    """Triangle count with degree-based orientation (hub-safe wedge
    fan-out, O(sqrt(m)) oriented out-degree) -- same count as g09 by
    construction, so it shares g09's lexicographic SQL oracle."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.triangle_count_degree_oriented(edges)


@register(
    "g12_weakly_connected",
    V(
        """
      , und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
      ),
      gnodes AS (
        SELECT DISTINCT node FROM (
          SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
        ) t
      ),
      ed AS (
        SELECT DISTINCT u, v FROM (
          SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
        ) t
      ),
      reach(u, v) AS (
        SELECT u, v FROM ed
        UNION
        SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u
      )
      SELECT n.node,
             COALESCE(LEAST(n.node, MIN(r.v)), n.node) AS component
      FROM gnodes n LEFT JOIN reach r ON r.u = n.node
      GROUP BY n.node
    """,
        recursive=True,
    ),
)
def g12_weakly_connected(spark, sf_dir):
    """Weakly-connected components (component = min reachable node id,
    direction ignored) via iterative hash-to-min label propagation --
    the same propagation the near-dup clusterer uses. Oracle = DuckDB
    recursive-CTE transitive closure."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.weakly_connected_components(edges)


@register(
    "g07_top_connections",
    V("""
      SELECT src AS person_id,
             CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS total_score,
             COUNT(*) AS degree,
             MAX(score) AS best_score
      FROM edges
      WHERE src IN (SELECT person_id_user FROM trove_user)
      GROUP BY src
      ORDER BY total_score DESC, person_id
      LIMIT 20
    """),
)
def g07_top_connections(spark, sf_dir):
    """Flagship analytics: strongest-connected trove users -- semi-join
    + hash agg + top-k (TakeOrderedAndProject, no global sort)."""
    _register_graph_views(spark, sf_dir)
    edges, trove = _cached_edges(spark, sf_dir), spark.table("trove_user")
    return (
        edges.join(
            trove, edges["src"] == trove["person_id_user"], "left_semi"
        )
        .groupBy(F.col("src").alias("person_id"))
        .agg(
            F.sum(F.col("score").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_score"),
            F.count(F.lit(1)).alias("degree"),
            F.max("score").alias("best_score"),
        )
        .orderBy(F.desc("total_score"), "person_id")
        .limit(20)
    )


def _pagerank_oracle_sql(n_iter: int = 10, d: float = 0.85) -> str:
    """Fixed-iteration PageRank as UNROLLED chained CTEs (r1..rN) --
    no recursion, so any ANSI engine runs it. Mirrors traverse.pagerank
    term-for-term in the SAME association order ((base + dangling) +
    in_share, (d*mass)/n, rank/od) so the only cross-engine difference
    is SUM accumulation order; a 6-dp final round absorbs it."""
    # AS MATERIALIZED is load-bearing: each r_i references r_{i-1} twice
    # (dangling-mass subquery + in-share join); DuckDB inlines plain CTEs,
    # which would expand the chain to 2^n copies of the base scan.
    parts = [
        """
, nodes AS MATERIALIZED (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
ncnt AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT src AS node, COUNT(*) AS od FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM ncnt) AS rank FROM nodes)
"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""
, r{i} AS MATERIALIZED (
    SELECT n.node,
           (1.0 - {d}) / (SELECT n FROM ncnt)
           + {d} * (SELECT COALESCE(SUM(r.rank), 0.0)
                    FROM r{i - 1} r LEFT JOIN outdeg o ON r.node = o.node
                    WHERE o.node IS NULL) / CAST((SELECT n FROM ncnt) AS DOUBLE)
           + {d} * COALESCE(c.in_share, 0.0) AS rank
    FROM nodes n
    LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / o.od) AS in_share
        FROM edges e
        JOIN r{i - 1} r ON e.src = r.node
        JOIN outdeg o ON e.src = o.node
        GROUP BY e.dst
    ) c ON n.node = c.node
)
""")
    parts.append(f"SELECT node, ROUND(rank, 6) AS rank FROM r{n_iter}")
    return V("".join(parts))


@register("g10_pagerank", _pagerank_oracle_sql())
def g10_pagerank(spark, sf_dir):
    """Graph analytics beyond the reference: 10-iteration PageRank over
    the directed edge graph (damping 0.85, dangling mass redistributed;
    ranks sum to 1). Oracle: the same fixed power iteration unrolled as
    chained SQL CTEs, both sides rounded to 6 dp (absorbs SUM
    accumulation-order ulps); closed-form unit tests (cycle = uniform,
    star = known split) pin the semantics independently."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.pagerank(edges, n_iter=10, round_dp=6)


@register(
    "g13_bfs_distance",
    V(_HOPS + """
      , hop3 AS (
        SELECT DISTINCT e.dst AS id
        FROM edges e JOIN hop2 h ON e.src = h.id
        WHERE e.dst NOT IN (SELECT id FROM hop2)
          AND e.dst NOT IN (SELECT id FROM hop1)
          AND e.dst NOT IN (SELECT id FROM seeds)
      )
      SELECT id, 0 AS hop FROM seeds
      UNION ALL SELECT id, 1 FROM hop1
      UNION ALL SELECT id, 2 FROM hop2
      UNION ALL SELECT id, 3 FROM hop3
    """),
)
def g13_bfs_distance(spark, sf_dir):
    """Bounded single-source-set shortest paths: minimum hop count from
    the seed team to every vertex within 3 hops. The exclusive-frontier
    BFS makes hop tagging itself the min-distance relation (no
    per-vertex min pass); oracle = the same frontier set algebra."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    return G.bfs_distances(edges, seeds, max_hops=3)


def _kcore_oracle_sql(k: int = 3, n_rounds: int = 10) -> str:
    """Fixed-round k-core peel unrolled as chained CTEs (same device as
    the pagerank oracle; MATERIALIZED so DuckDB doesn't inline the
    chain into 2^n base scans)."""
    parts = [
        """
, e0 AS MATERIALIZED (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
    GROUP BY 1, 2
),
s0 AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM e0
    UNION ALL
    SELECT b AS src, a AS dst FROM e0
)
"""
    ]
    for i in range(1, n_rounds + 1):
        parts.append(f"""
, k{i} AS MATERIALIZED (
    SELECT src FROM s{i - 1} GROUP BY src HAVING COUNT(*) >= {k}
),
s{i} AS MATERIALIZED (
    SELECT s.src, s.dst FROM s{i - 1} s
    JOIN k{i} x ON s.src = x.src
    JOIN k{i} y ON s.dst = y.src
)
""")
    parts.append(
        f"SELECT src AS id, COUNT(*) AS core_degree FROM s{n_rounds} GROUP BY src"
    )
    return V("".join(parts))


@register("g14_kcore", _kcore_oracle_sql())
def g14_kcore(spark, sf_dir):
    """Graph analytics beyond the reference: 3-core of the undirected
    graph via a 10-round degree peel (fixed rounds keep it
    deterministic and oracle-checkable; converged rounds are no-ops).
    Returns surviving vertices with their in-core degree."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.k_core(edges, k=3, n_rounds=10)


@register(
    "g15_link_prediction",
    V("""
      , und AS MATERIALIZED (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges WHERE src <> dst
          GROUP BY 1, 2
      ),
      sym AS MATERIALIZED (
          SELECT a AS u, b AS v FROM und
          UNION ALL
          SELECT b AS u, a AS v FROM und
      ),
      deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u),
      common AS MATERIALIZED (
          SELECT l.v AS x, r.v AS y, COUNT(*) AS n_common
          FROM sym l JOIN sym r ON l.u = r.u AND l.v < r.v
          GROUP BY l.v, r.v
      ),
      cand AS (
          SELECT c.x, c.y, c.n_common
          FROM common c
          LEFT JOIN und e ON c.x = e.a AND c.y = e.b
          WHERE e.a IS NULL
      )
      SELECT c.x, c.y, c.n_common,
             ROUND(c.n_common / (dx.deg + dy.deg - c.n_common), 6) AS jaccard
      FROM cand c
      JOIN deg dx ON c.x = dx.node
      JOIN deg dy ON c.y = dy.node
      WHERE ROUND(c.n_common / (dx.deg + dy.deg - c.n_common), 6) >= 0.3
    """),
)
def g15_link_prediction(spark, sf_dir):
    """Graph analytics beyond the reference: common-neighbor link
    prediction -- non-adjacent vertex pairs ranked by Jaccard overlap
    of their neighbor sets (wedge join -> anti-join off existing edges
    -> degree join). Exact set-size arithmetic; fully oracle-checked."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.jaccard_link_prediction(edges, threshold=0.3)


@register(
    "g16_avg_neighbor_degree",
    V("""
      , und AS MATERIALIZED (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges WHERE src <> dst
          GROUP BY 1, 2
      ),
      sym AS MATERIALIZED (
          SELECT a AS u, b AS v FROM und
          UNION ALL
          SELECT b AS u, a AS v FROM und
      ),
      deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY u)
      SELECT s.u AS id,
             COUNT(*) AS degree,
             CAST(SUM(d.deg) AS BIGINT) AS sum_neighbor_deg,
             ROUND(SUM(d.deg) / COUNT(*), 6) AS avg_neighbor_degree
      FROM sym s JOIN deg d ON s.v = d.node
      GROUP BY s.u
    """),
)
def g16_avg_neighbor_degree(spark, sf_dir):
    """Graph analytics beyond the reference: mean neighbor degree per
    vertex (local assortativity). Exact integer sums; one division."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.avg_neighbor_degree(edges)


@register(
    "g17_team_comembership",
    V("""
      SELECT a.person_id AS person_a, b.person_id AS person_b,
             COUNT(*) AS shared_teams
      FROM team_member a
      JOIN team_member b
        ON a.team_id = b.team_id AND a.person_id < b.person_id
      GROUP BY a.person_id, b.person_id
    """),
)
def g17_team_comembership(spark, sf_dir):
    """Bipartite projection of the reference's team_member relation
    (mysql.go:59-82): person-person edges weighted by shared-team
    count -- the co-membership graph the reference's team queries
    imply but never materialize. One self-equi-join through the team
    key; the quadratic step is per-team (the classic fan-out bound --
    at 100 TB, cap or salt mega-teams exactly like hub vertices in
    triangle counting)."""
    _, team_member, _ = _graph_inputs(spark, sf_dir)
    a, b = team_member.alias("a"), team_member.alias("b")
    return (
        a.join(
            b,
            (F.col("a.team_id") == F.col("b.team_id"))
            & (F.col("a.person_id") < F.col("b.person_id")),
        )
        .groupBy(
            F.col("a.person_id").alias("person_a"),
            F.col("b.person_id").alias("person_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_teams"))
    )


@register(
    "g18_graph_profile",
    V("""
      , und AS MATERIALIZED (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges WHERE src <> dst
          GROUP BY 1, 2
      ),
      nodes AS MATERIALIZED (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
      ),
      deg AS MATERIALIZED (
          SELECT u AS node, COUNT(*) AS d FROM (
            SELECT a AS u FROM und UNION ALL SELECT b FROM und
          ) s GROUP BY u
      )
      SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
             (SELECT COUNT(*) FROM edges) AS n_directed_edges,
             (SELECT COUNT(*) FROM und) AS n_undirected_edges,
             (SELECT MAX(d) FROM deg) AS max_degree,
             ROUND((SELECT COUNT(*) FROM und) /
                   ((SELECT COUNT(*) FROM nodes) *
                    ((SELECT COUNT(*) FROM nodes) - 1) / 2.0), 6) AS density
    """),
)
def g18_graph_profile(spark, sf_dir):
    """One-pass graph profile (the graph analog of C16's table
    profile): node/edge counts, max undirected degree, and density --
    the sanity numbers read before running any traversal at scale
    (degree skew decides salting; density decides whether wedge joins
    are feasible). Each statistic is a hash agg; the scalars combine
    via cross-join of one-row frames (no data movement). ``und``
    feeds the degree agg (twice, through the direction union) and the
    undirected-edge count; the lazy localCheckpoint (round 12)
    materializes the canonical pair set once instead of re-planning
    scan+dedup per consumer."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    und = G.undirected_edges(edges).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
    )
    deg = (
        und.select(F.col("a").alias("u"))
        .unionByName(und.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_dir = edges.agg(F.count(F.lit(1)).alias("n_directed_edges"))
    n_und = und.agg(F.count(F.lit(1)).alias("n_undirected_edges"))
    max_d = deg.agg(F.max("d").alias("max_degree"))
    return (
        n_nodes.crossJoin(n_dir)
        .crossJoin(n_und)
        .crossJoin(max_d)
        .select(
            "n_nodes",
            "n_directed_edges",
            "n_undirected_edges",
            "max_degree",
            F.round(
                F.col("n_undirected_edges")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2.0),
                6,
            ).alias("density"),
        )
    )


@register(
    "g19_clustering_coefficient",
    V("""
      , und AS MATERIALIZED (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges WHERE src <> dst
          GROUP BY 1, 2
      ),
      tri AS MATERIALIZED (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1
          JOIN und e2 ON e1.b = e2.a
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
      ),
      per_node AS (
          SELECT node, COUNT(*) AS n_tri FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
          ) m GROUP BY node
      ),
      deg AS (
          SELECT u AS node, COUNT(*) AS d FROM (
            SELECT a AS u FROM und UNION ALL SELECT b FROM und
          ) s GROUP BY u
      )
      SELECT d.node AS id, d.d AS degree,
             COALESCE(p.n_tri, 0) AS n_triangles,
             ROUND(2.0 * COALESCE(p.n_tri, 0) / (d.d * (d.d - 1)), 6)
               AS clustering_coeff
      FROM deg d LEFT JOIN per_node p ON d.node = p.node
      WHERE d.d >= 2
    """),
)
def g19_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient per vertex: triangles through the
    vertex over its possible neighbor pairs (2t / d(d-1)) -- the
    canonical graph-ML density feature. Triangle enumeration reuses
    the oriented wedge-close join (each triangle once, all three
    members emitted); degree >= 2 filter excludes undefined
    coefficients.

    Round 13: the enumeration is traverse.oriented_triangles -- the
    DEGREE-oriented wedge close (per-node triangle membership is
    orientation-independent, so the result is identical). The
    previous lexicographic wedge join measured 434 s at sf1 against
    this fixture's 50 event-hub nodes (deg(hub)^2 fan-out); oriented
    it is ~7 s. The degree agg keeps its own canonical pair set
    (lazy localCheckpoint, round 12) for its two direction
    branches."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    und = G.undirected_edges(edges).localCheckpoint(eager=False)
    tri = G.oriented_triangles(edges)
    members = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
    )
    per_node = members.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(per_node, "node", "left")
        .select(
            F.col("node").alias("id"),
            F.col("d").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).alias("n_triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce("n_tri", F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )


@register(
    "g20_reciprocity",
    V("""
      SELECT (SELECT COUNT(*) FROM edges) AS n_directed,
             (SELECT COUNT(*) FROM edges e
              WHERE EXISTS (SELECT 1 FROM edges r
                            WHERE r.src = e.dst AND r.dst = e.src))
               AS n_reciprocated,
             ROUND((SELECT COUNT(*) FROM edges e
                    WHERE EXISTS (SELECT 1 FROM edges r
                                  WHERE r.src = e.dst AND r.dst = e.src))
                   / (SELECT COUNT(*) FROM edges), 6) AS reciprocity
    """),
)
def g20_reciprocity(spark, sf_dir):
    """Graph reciprocity: the fraction of directed edges whose reverse
    edge also exists -- the directionality audit (near 1.0 means the
    graph is effectively undirected and every traversal can use the
    cheaper symmetric form).

    Canonical-pair aggregation (round 13): the previous
    self-semi-join on the reversed key BUILT the whole reversed edge
    set as a hash relation (the graph is a fact; 0.99s at sf1).
    Grouping by the unordered pair instead needs no join at all: the
    edges view dedups (src,dst), so a non-loop pair is reciprocated
    iff its canonical group holds BOTH directions (cnt=2 counts two
    directed edges) and a self-loop (src=dst, cnt=1) is its own
    reverse. One narrow exchange on the pair key (0.34s at sf1), same
    two counts."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    und = edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        (F.col("src") == F.col("dst")).cast("int").alias("loop"),
    )
    per_pair = und.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("loop").alias("loop")
    )
    tot = per_pair.agg(
        F.sum("cnt").alias("n_directed"),
        F.sum(
            F.when(F.col("loop") == 1, F.lit(1))
            .when(F.col("cnt") == 2, F.lit(2))
            .otherwise(F.lit(0))
        ).alias("n_reciprocated"),
    )
    return tot.select(
        "n_directed",
        "n_reciprocated",
        F.round(F.col("n_reciprocated") / F.col("n_directed"), 6).alias(
            "reciprocity"
        ),
    )


@register(
    "g21_path_multiplicity",
    V(_HOPS + """
      SELECT e2.dst AS id, COUNT(*) AS n_paths
      FROM edges e1
      JOIN seeds s ON e1.src = s.id
      JOIN edges e2 ON e2.src = e1.dst
      WHERE e2.dst IN (SELECT id FROM hop2)
      GROUP BY e2.dst
    """),
)
def g21_path_multiplicity(spark, sf_dir):
    """Path multiplicity to the 2-hop frontier: for every hop-2 vertex,
    HOW MANY distinct seed->mid->dst paths reach it -- the ranking
    signal reachability alone throws away (a person reached through
    many teammates outranks one reached once). Same join shape as the
    traversal (broadcast seeds, one edge self-join) with COUNT instead
    of DISTINCT; the edges view's per-pair dedup makes each row one
    path.

    Build side (round 13): the seed-adjacent edge set (bounded by
    |team| x max degree -- the module's frontier-broadcast contract)
    is explicitly the broadcast side of the hop-2 extension join.
    Unhinted, the planner built the WHOLE edge relation (its
    known-size scan estimates under the threshold while the
    frontier-join's output estimate doesn't): a 1.1M-pair build to
    probe a frontier at sf1, 1.31s -> 0.78s flipped."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    hop2 = G.k_hop(edges, seeds, k=2)[1]
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    paths = (
        F.broadcast(
            F.broadcast(seeds).join(e1, F.col("id") == F.col("e1.src"))
        )
        .join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            hop2.select(F.col("id").alias("h2")),
            F.col("e2.dst") == F.col("h2"),
            "left_semi",
        )
    )
    return paths.groupBy(F.col("e2.dst").alias("id")).agg(
        F.count(F.lit(1)).alias("n_paths")
    )


@register(
    "g22_degree_histogram",
    V("""
      , und AS MATERIALIZED (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges WHERE src <> dst
          GROUP BY 1, 2
      ),
      deg AS (
          SELECT u AS node, COUNT(*) AS d FROM (
            SELECT a AS u FROM und UNION ALL SELECT b FROM und
          ) s GROUP BY u
      )
      SELECT length(CAST(d AS VARCHAR)) AS magnitude,
             COUNT(*) AS n_nodes,
             MIN(d) AS min_degree, MAX(d) AS max_degree
      FROM deg GROUP BY 1
    """),
)
def g22_degree_histogram(spark, sf_dir):
    """Degree-distribution histogram by order of magnitude (digit
    length of the degree) -- the skew diagnostic read before choosing
    join strategies: a heavy top bucket means salting / degree
    orientation, a flat profile means plain hash joins suffice. Two
    hash aggs; the bucket key is integer digit length (engine-portable,
    no log). ``und`` feeds the degree agg twice (direction union);
    the lazy localCheckpoint (round 12) materializes it once."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    und = G.undirected_edges(edges).localCheckpoint(eager=False)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return deg.groupBy(
        F.length(F.col("d").cast("string")).alias("magnitude")
    ).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("d").alias("min_degree"),
        F.max("d").alias("max_degree"),
    )


@register(
    "g23_component_sizes",
    V("""
      , und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
      ),
      gnodes AS (
        SELECT DISTINCT node FROM (
          SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
        ) t
      ),
      ed AS (
        SELECT DISTINCT u, v FROM (
          SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
        ) t
      ),
      reach(u, v) AS (
        SELECT u, v FROM ed
        UNION
        SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u
      ),
      comp AS (
        SELECT n.node,
               COALESCE(LEAST(n.node, MIN(r.v)), n.node) AS component
        FROM gnodes n LEFT JOIN reach r ON r.u = n.node
        GROUP BY n.node
      ),
      sizes AS (
        SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
      )
      SELECT sz AS component_size,
             COUNT(*) AS n_components,
             CAST(sz * COUNT(*) AS BIGINT) AS n_nodes_covered
      FROM sizes GROUP BY sz
    """, recursive=True),
)
def g23_component_sizes(spark, sf_dir):
    """Component-size distribution over the weakly-connected
    components -- the giant-component check (one huge size bucket
    means the graph is effectively one blob and per-component
    parallelism won't help; many small ones mean component-partitioned
    processing wins). Reuses the WCC label propagation; two hash aggs
    on top."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    comp = G.weakly_connected_components(edges)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.groupBy(F.col("sz").alias("component_size")).agg(
        F.count(F.lit(1)).alias("n_components"),
        (F.col("sz") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_nodes_covered"),
    )


@register(
    "g24_bottleneck_paths",
    V(_HOPS + """
      , b1 AS (
        SELECT e.dst AS id, MAX(e.score) AS bn
        FROM edges e JOIN seeds s ON e.src = s.id
        GROUP BY e.dst
      ),
      b2 AS (
        SELECT id, MAX(bn) AS bn FROM (
          SELECT id, bn FROM b1
          UNION ALL
          SELECT e.dst AS id, LEAST(p.bn, e.score) AS bn
          FROM b1 p JOIN edges e ON e.src = p.id
        ) u GROUP BY id
      ),
      b3 AS (
        SELECT id, MAX(bn) AS bn FROM (
          SELECT id, bn FROM b2
          UNION ALL
          SELECT e.dst AS id, LEAST(p.bn, e.score) AS bn
          FROM b2 p JOIN edges e ON e.src = p.id
        ) u GROUP BY id
      )
      SELECT id, bn AS bottleneck FROM b3
      WHERE id NOT IN (SELECT id FROM seeds)
    """),
)
def g24_bottleneck_paths(spark, sf_dir):
    """Widest-path (bottleneck) distances, 3 relaxation rounds: for
    every non-seed vertex, the best achievable minimum-edge-score
    along any path of <= 3 hops from the seed team -- the max-min
    semiring where BFS's reachability semiring can't answer 'how
    STRONG is the best connection'. Pure MAX/LEAST on scores (no
    float arithmetic, so cross-engine exact); each round is one join
    + one hash agg, the same shape as a pregel superstep."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    # max-min semiring: paths combine via LEAST (the path is as strong
    # as its weakest edge), alternatives via MAX (keep the widest)
    best = G.relaxation_rounds(seeds, edges, F.max, F.least, rounds=3)
    return best.select(
        F.col("nid").alias("id"), F.col("val").alias("bottleneck")
    )


def _ppr_oracle_sql(n_iter: int = 10, d: float = 0.85) -> str:
    """Personalized PageRank unrolled as chained MATERIALIZED CTEs,
    mirroring traverse.personalized_pagerank term-for-term in the same
    association order ((base*t + (d*mass)*t) + d*in_share) so the only
    cross-engine difference is SUM accumulation order; the 6-dp final
    round absorbs it. Same unrolling discipline as
    _pagerank_oracle_sql (AS MATERIALIZED is load-bearing: each p_i is
    referenced twice)."""
    base = 1.0 - d
    parts = [
        f"""
, ppr_seeds AS MATERIALIZED (
    SELECT DISTINCT person_id AS node FROM team_member
    WHERE team_id = '{TEAM}'
),
scnt AS MATERIALIZED (SELECT COUNT(*) AS s FROM ppr_seeds),
pnodes AS MATERIALIZED (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
    UNION SELECT node FROM ppr_seeds
),
poutdeg AS MATERIALIZED (
    SELECT src AS node, COUNT(*) AS od FROM edges GROUP BY src
),
ptele AS MATERIALIZED (
    SELECT n.node,
           CASE WHEN s.node IS NULL THEN 0.0
                ELSE 1.0 / (SELECT s FROM scnt) END AS t
    FROM pnodes n LEFT JOIN ppr_seeds s ON n.node = s.node
),
p0 AS MATERIALIZED (SELECT node, t AS rank FROM ptele)
"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""
, p{i} AS MATERIALIZED (
    SELECT t.node,
           {base!r} * t.t
           + {d!r} * (SELECT COALESCE(SUM(r.rank), 0.0)
                      FROM p{i - 1} r LEFT JOIN poutdeg o ON r.node = o.node
                      WHERE o.node IS NULL) * t.t
           + {d!r} * COALESCE(c.in_share, 0.0) AS rank
    FROM ptele t
    LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank / o.od) AS in_share
        FROM edges e
        JOIN p{i - 1} r ON e.src = r.node
        JOIN poutdeg o ON e.src = o.node
        GROUP BY e.dst
    ) c ON t.node = c.node
)
""")
    parts.append(f"SELECT node, ROUND(rank, 6) AS rank FROM p{n_iter}")
    return V("".join(parts))


@register("g25_personalized_pagerank", _ppr_oracle_sql(), defer=True)
def g25_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank from the seed team: random-walk-with-
    restart proximity scores -- the graph-retrieval / recommendation
    ranking (who is close to THIS team), vs g10's global importance.
    All teleport mass (restart + dangling) returns to the seeds.
    Oracle: the same fixed power iteration unrolled as chained CTEs,
    both sides rounded to 6 dp."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    return G.personalized_pagerank(edges, seeds, n_iter=10, round_dp=6)


def _wpr_oracle_sql(n_iter: int = 10, d: float = 0.85) -> str:
    """Weighted PageRank unrolled, mirroring traverse.weighted_pagerank
    term-for-term: out-WEIGHT replaces out-degree and each edge
    carries rank * score / out_w. Same unrolling and rounding
    discipline as _pagerank_oracle_sql."""
    parts = [
        """
, wnodes AS MATERIALIZED (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
wcnt AS MATERIALIZED (SELECT COUNT(*) AS n FROM wnodes),
woutw AS MATERIALIZED (
    -- zero total out-weight = dangling, same rule as the operator
    -- (order-independent positive-edge count, not a float-sum test)
    SELECT src AS node, SUM(score) AS w FROM edges GROUP BY src
    HAVING COUNT(CASE WHEN score > 0 THEN 1 END) > 0
),
w0 AS MATERIALIZED (
    SELECT node, 1.0 / (SELECT n FROM wcnt) AS rank FROM wnodes
)
"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""
, w{i} AS MATERIALIZED (
    SELECT n.node,
           (1.0 - {d}) / (SELECT n FROM wcnt)
           + {d} * (SELECT COALESCE(SUM(r.rank), 0.0)
                    FROM w{i - 1} r LEFT JOIN woutw o ON r.node = o.node
                    WHERE o.node IS NULL)
                 / CAST((SELECT n FROM wcnt) AS DOUBLE)
           + {d} * COALESCE(c.in_share, 0.0) AS rank
    FROM wnodes n
    LEFT JOIN (
        SELECT e.dst AS node,
               SUM((r.rank / o.w) * e.score) AS in_share
        FROM edges e
        JOIN w{i - 1} r ON e.src = r.node
        JOIN woutw o ON e.src = o.node
        GROUP BY e.dst
    ) c ON n.node = c.node
)
""")
    parts.append(f"SELECT node, ROUND(rank, 6) AS rank FROM w{n_iter}")
    return V("".join(parts))


@register("g26_weighted_pagerank", _wpr_oracle_sql(), defer=True)
def g26_weighted_pagerank(spark, sf_dir):
    """PageRank over the SCORED graph: each node splits its rank over
    out-edges proportionally to their scores -- the reference's edge
    scores as random-walk affinities, so rank flows along strong
    relationships (vs g10's structure-only ranks and g25's
    seed-proximity). Oracle: the weighted iteration unrolled as
    chained CTEs, 6-dp rounded."""
    edges, _, _ = _graph_inputs(spark, sf_dir)
    return G.weighted_pagerank(edges, n_iter=10, round_dp=6)


@register(
    "g27_weighted_shortest_path",
    V(_HOPS + """
      , d1 AS (
        SELECT e.dst AS id, MIN(e.score) AS dist
        FROM edges e JOIN seeds s ON e.src = s.id
        GROUP BY e.dst
      ),
      d2 AS (
        SELECT id, MIN(dist) AS dist FROM (
          SELECT id, dist FROM d1
          UNION ALL
          SELECT e.dst AS id, p.dist + e.score AS dist
          FROM d1 p JOIN edges e ON e.src = p.id
        ) u GROUP BY id
      ),
      d3 AS (
        SELECT id, MIN(dist) AS dist FROM (
          SELECT id, dist FROM d2
          UNION ALL
          SELECT e.dst AS id, p.dist + e.score AS dist
          FROM d2 p JOIN edges e ON e.src = p.id
        ) u GROUP BY id
      )
      SELECT id, dist AS cost FROM d3
      WHERE id NOT IN (SELECT id FROM seeds)
    """),
    defer=True,
)
def g27_weighted_shortest_path(spark, sf_dir):
    """Weighted shortest path (min-plus semiring), 3 relaxation rounds:
    for every non-seed vertex, the CHEAPEST total edge cost along any
    path of <= 3 hops from the seed team -- the missing third semiring
    next to g13's BFS reachability (boolean) and g24's widest path
    (max-min). Same pregel-superstep shape as g24: each round is one
    edges join + one min hash agg, frontier broadcast on round one,
    lineage checkpointed per round. Bounded hops = bounded rounds --
    the distributed Bellman-Ford discipline that replaces Dijkstra's
    sequential priority queue at scale. Cross-engine exact WITHOUT
    rounding: scores are integers carried in doubles (< 2^53), each
    candidate distance sums <= 3 of them in path order in BOTH
    engines, and MIN over exact values has no accumulation-order
    ambiguity -- unlike the PageRank family, no epsilon is needed."""
    edges, team_member, _ = _graph_inputs(spark, sf_dir)
    seeds = G.team_seed(team_member, TEAM)
    # min-plus semiring: paths combine via +, alternatives via MIN
    best = G.relaxation_rounds(
        seeds, edges, F.min, lambda v, s: v + s, rounds=3
    )
    return best.select(F.col("nid").alias("id"), F.col("val").alias("cost"))


@register(
    "g28_temporal_reachability",
    V(f"""
      , tseeds AS (
        SELECT DISTINCT person_id AS id FROM team_member
        WHERE team_id = '{TEAM}'
      ),
      tedges AS (
        SELECT from_person_id AS src, to_person_id AS dst,
               epoch_us(last_update) AS ts
        FROM user_relationship
      ),
      t1 AS (
        SELECT e.dst AS id, MIN(e.ts) AS arrival
        FROM tedges e JOIN tseeds s ON e.src = s.id
        GROUP BY e.dst
      ),
      t2 AS (
        SELECT id, MIN(arrival) AS arrival FROM (
          SELECT id, arrival FROM t1
          UNION ALL
          SELECT e.dst AS id, e.ts AS arrival
          FROM t1 p JOIN tedges e ON e.src = p.id AND e.ts >= p.arrival
        ) u GROUP BY id
      )
      SELECT id, arrival AS earliest_arrival_us FROM t2
      WHERE id NOT IN (SELECT id FROM tseeds)
    """),
    defer=True,
)
def g28_temporal_reachability(spark, sf_dir):
    """TEMPORAL reachability with earliest arrival, 2 hops: which
    nodes can the seed team's messages reach when a path is only valid
    if each edge fires AT OR AFTER the previous one arrived -- the
    time-respecting constraint every static traversal (g02/g03)
    ignores, and the difference between 'there is a path' and 'a
    message could actually have propagated'. Earliest-arrival
    semantics: MIN over valid paths of the last edge's timestamp.

    Uses the RAW timestamped relationship stream (user_relationship),
    not the time-collapsed edges view -- temporal ops need the event
    grain. Shape per hop: one equi-join on the node key with the time
    constraint as a residual predicate (never a range join driving
    the shuffle), then a MIN hash agg; arrival times are integer
    epoch-micros so MIN is cross-engine exact. At 100 TB the stream
    is time-partitioned (pipeline/watermark.py), so each hop's scan
    prunes to the relevant time range before the join."""
    _register_graph_views(spark, sf_dir)
    rel = spark.table("user_relationship")
    tedges = rel.select(
        F.col("from_person_id").alias("src"),
        F.col("to_person_id").alias("dst"),
        F.unix_micros("last_update").alias("ts"),
    )
    seeds = G.team_seed(spark.table("team_member"), TEAM)
    # t1 feeds the hop-2 extension join AND the earliest-arrival
    # union; the lazy localCheckpoint (round 12) materializes the
    # frontier-sized hop-1 arrival table once instead of re-planning
    # the seed-join+agg subtree per consumer
    t1 = (
        F.broadcast(seeds)
        .join(tedges, F.col("id") == tedges["src"])
        .groupBy(F.col("dst").alias("tid"))
        .agg(F.min("ts").alias("arrival"))
        .localCheckpoint(eager=False)
    )
    # round 13: t1 (frontier-sized arrivals) is explicitly the build
    # side -- unhinted, the planner broadcast the 1M-row timestamped
    # edge STREAM (its scan estimate sits under the threshold; the
    # checkpointed t1 has no stats) and streamed the frontier:
    # 0.76s -> 0.33s at sf1 flipped
    ext = F.broadcast(t1).join(
        tedges,
        (t1["tid"] == tedges["src"]) & (tedges["ts"] >= t1["arrival"]),
    ).select(F.col("dst").alias("tid"), F.col("ts").alias("arrival"))
    t2 = (
        t1.unionByName(ext)
        .groupBy("tid")
        .agg(F.min("arrival").alias("arrival"))
    )
    return t2.join(seeds, t2["tid"] == seeds["id"], "left_anti").select(
        F.col("tid").alias("id"), F.col("arrival").alias("earliest_arrival_us")
    )


def _hits_oracle_sql(n_iter: int = 5) -> str:
    """HITS unrolled, mirroring traverse.hits term-for-term: per round
    an in-sum (auth from hubs) then L1-normalize, an out-sum (hub from
    the FRESH auth) then L1-normalize. Same unrolling and 6-dp
    rounding discipline as the PageRank oracles; every CTE referenced
    twice is MATERIALIZED (the norm subquery re-reads its round)."""
    parts = [
        """
, dedges AS MATERIALIZED (
    SELECT DISTINCT from_person_id AS src, to_person_id AS dst
    FROM user_relationship
),
knodes AS MATERIALIZED (
    SELECT src AS node FROM dedges UNION SELECT dst FROM dedges
),
kh0 AS MATERIALIZED (SELECT node, 1.0 AS hub FROM knodes)
"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""
, ka{i} AS MATERIALIZED (
    SELECT n.node, COALESCE(s.v, 0.0) AS auth
    FROM knodes n
    LEFT JOIN (
        SELECT e.dst AS node, SUM(h.hub) AS v
        FROM dedges e JOIN kh{i - 1} h ON e.src = h.node
        GROUP BY e.dst
    ) s ON n.node = s.node
),
kan{i} AS MATERIALIZED (
    SELECT node, auth / (SELECT SUM(auth) FROM ka{i}) AS auth FROM ka{i}
),
kb{i} AS MATERIALIZED (
    SELECT n.node, COALESCE(s.v, 0.0) AS hub
    FROM knodes n
    LEFT JOIN (
        SELECT e.src AS node, SUM(a.auth) AS v
        FROM dedges e JOIN kan{i} a ON e.dst = a.node
        GROUP BY e.src
    ) s ON n.node = s.node
),
kh{i} AS MATERIALIZED (
    SELECT node, hub / (SELECT SUM(hub) FROM kb{i}) AS hub FROM kb{i}
)
""")
    parts.append(f"""
SELECT h.node, ROUND(h.hub, 6) AS hub, ROUND(a.auth, 6) AS auth
FROM kh{n_iter} h JOIN kan{n_iter} a ON h.node = a.node
""")
    return V("".join(parts))


@register("g29_hits", _hits_oracle_sql(), defer=True)
def g29_hits(spark, sf_dir):
    """HITS hubs and authorities: the mutual-reinforcement ranking
    family the PageRank power iterations (g10/g25/g26) don't cover --
    good hubs point at good authorities and vice versa, so the two
    scores are coupled fixed-point vectors rather than one random-walk
    distribution. Runs on the RAW DIRECTED relationship pairs
    (initiator -> target, distinct), NOT the post-pipeline edges view:
    the A9 bidirectional explode symmetrizes that view's edge set, and
    on a symmetric graph both HITS vectors collapse to the same
    principal eigenvector -- the raw stream is where initiating many
    connections (hub) and being targeted by many initiators
    (authority) are genuinely different signals. Oracle: the identical
    5 rounds unrolled as chained CTEs, both sides rounded to 6 dp."""
    _register_graph_views(spark, sf_dir)
    dedges = (
        spark.table("user_relationship")
        .select(
            F.col("from_person_id").alias("src"),
            F.col("to_person_id").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )
    return G.hits(dedges, n_iter=5, round_dp=6)
