"""Named-query registry backing the ``__spark_entry__.py`` contract.

Every implemented operator from SURVEY.md §2 registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible,
a DuckDB oracle SQL string producing the identical result (same column
names, same types, same values -- the driver hash-compares them).

Cross-engine determinism conventions used throughout the suites:
- double aggregations go through exact decimal sums:
  ``CAST(SUM(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)`` on both sides,
  so IEEE summation order can't flip the hash;
- averages are written as exact-sum / count, never engine AVG;
- timestamps are emitted as epoch microseconds
  (Spark ``unix_micros`` == DuckDB ``epoch_us``), never raw timestamps;
- doubles are never cast to strings (formatting differs);
- arrays emitted from aggregations are sorted (collect_list order is
  nondeterministic in any distributed engine).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    doc: str = ""
    defer: bool = False  # True -> queue behind the existing uncertified backlog
    expedite: bool = False  # True -> front of its group (SURVEY-§2-parity lanes)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    defer: bool = False,
    expedite: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``defer=True`` marks a query added AFTER an external certification
    backlog already exceeded one round's query window: it sorts behind
    every earlier-registered uncertified query, so adding new operators
    never displaces queries that have been waiting longer.

    ``expedite=True`` moves a query to the FRONT of its fairness group:
    reserved for SURVEY-§2-parity lanes (operators the coverage audit
    reads line-by-line), which outrank beyond-§2 extras when a round's
    window can't fit both."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=fn.__doc__ or "",
            defer=defer,
            expedite=expedite,
        )
        return fn

    return deco


# Queries whose SEMANTICS changed after an external run certified an
# earlier form: green rows from rounds <= the listed round are stale
# and do not count, so the query re-enters the certification window.
# (A rows-only query that merely GAINS an oracle is handled generically
# below; this map is for result-changing rewrites of oracle-carrying
# queries.)
# memo for _certified_rounds, keyed by the CORRECTNESS files' identity
_CERT_CACHE: dict = {}

RECERTIFY: dict[str, int] = {
    # round 4 certified the all-pairs exactness baseline; the registered
    # form became SRP-bucketed (different candidate set) post-run
    "c40_hard_negatives": 4,
    # round 6 gave the quality gate a real stopword floor (>= 0.05; the
    # certified form's >= 0.0 was vacuously true), changing passes_gate
    "c06_quality_score": 5,
    # round 6 moved b72's double columns into the hash as fixed-point
    # bigints (raw doubles fingerprinted engine FORMATTING: Spark emits
    # scientific notation outside (1e-3, 1e7), DuckDB positional) --
    # the fingerprint values change
    "b72_table_fingerprint": 5,
    # round-9-session latent-divergence fixes (commits 108980b /
    # d7a6902 / f4eedcc) changed the semantics-bearing SQL/plans of
    # these certified queries AFTER their last driver rows (r4-r8);
    # local differentials verified result-identity on current
    # fixtures, but driver certification must be re-earned
    # (VERDICT.md round 9, "Next round: do this" #1)
    "b64_nested_struct_hof": 9,
    "b91_tpch_q20": 9,
    "b94_order_stats": 9,
    "b104_bag_set_ops": 9,
    "c06_language_id": 9,
    "c18_stopword_ratio_by_lang": 9,
    "c37_exact_k_sample": 9,
    "c41_curriculum_order": 9,
    "c14_length_outliers": 9,
    "c17_full_curation": 9,
    "a05_incremental_scan": 9,
    "b19_argmax_per_key": 9,
    # round-10 session: the c37 sentinel-inside-the-hash fix applied
    # to the same latent NULL-coin divergence in c46's sampling hash
    "c46_importance_sample": 9,
    # round-10 session, NULL-text/NULL-key divergence sweep over the
    # text family (fingerprint md5('') fabrication, winnowing/chunking
    # phantom rows, split_bucket when()-fallthrough) plus the IVFPQ
    # probe-scoped ADC plan -- all verified result-identical on the
    # NULL-free fixtures and re-passed precert, but the
    # semantics-bearing SQL/plans changed after their last driver rows
    "c07_fingerprint": 9,
    "c22_winnowing_fingerprints": 9,
    "c26_sequence_chunks": 9,
    "c11_hash_split": 9,
    "c24_release_gate": 9,
    "c63_ivfpq_topk": 9,
    # round-12 session: the r11-certified row was VACUOUS (0 rows on
    # both engines at sf0.01 -- the query's terms appear nowhere in
    # the synthetic corpus's vocabulary; round-11 verdict finding).
    # The terms were retuned to the corpus vocabulary, changing the
    # result set; certification must be re-earned non-vacuously.
    "g39_dql_term_search": 11,
}


def _certified_rounds() -> dict[str, int]:
    """For every query end-to-end certified by a previous external
    correctness run (CORRECTNESS_r*.json in the repo root), the LATEST
    round that certified it: a green hash match, or a completed
    rows-only run for queries that declare no oracle. Queries absent
    from the map -- never-run, errored, mismatched, or certified only
    in a round predating a semantic rewrite (RECERTIFY) -- count as
    uncertified."""
    import glob
    import json
    import os
    import re

    # the no-oracle branch below consults REGISTRY: computing (and
    # MEMOIZING) this map before the suites are imported would mark
    # every rows-only-certified query uncertified and cache that under
    # an unchanged file signature for the rest of the process --
    # fronting already-certified queries into the round's capped window
    _load_suites()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    # memoized on the files' identity: the external driver writes these
    # BETWEEN runs, never during one, and a single driver run otherwise
    # re-parses every file for each of entry()/queries()/oracle_sql()
    sig = []
    for p in paths:
        try:
            st = os.stat(p)
            sig.append((p, st.st_mtime_ns, st.st_size))
        except OSError:
            sig.append((p, 0, 0))
    sig = tuple(sig)
    cached = _CERT_CACHE.get("rounds")
    if cached is not None and cached[0] == sig:
        return dict(cached[1])
    seen: dict[str, int] = {}
    for p in paths:
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        m = re.search(r"CORRECTNESS_r0*(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else 0
        for name, row in data.items():
            if rnd <= RECERTIFY.get(name, 0):
                continue
            if not isinstance(row, dict):
                continue
            ok = False
            if row.get("hash_match") is True:
                ok = True
            elif row.get("err") == "no_oracle" and row.get("spark_rows"):
                # a completed rows-only run only counts if the query
                # STILL has no oracle -- one registered since (e.g.
                # pagerank's unrolled-CTE oracle) deserves a re-run.
                # spark_rows must be truthy: 0 rows is a FAILURE for a
                # no-oracle query (precert's rule), and counting it
                # certified would rotate the regression to the back of
                # the queue instead of re-fronting it
                q = REGISTRY.get(name)
                ok = q is not None and q.oracle is None
            if ok:
                seen[name] = max(seen.get(name, 0), rnd)
    _CERT_CACHE["rounds"] = (sig, dict(seen))
    return seen


def _certified_names() -> set[str]:
    return set(_certified_rounds())


def _ordered() -> list[Query]:
    """Registry in certification-priority order: queries with no green
    row in any prior external run come FIRST (registration order within
    each group), then certified queries STALEST-FIRST (ascending last
    driver-certified round; registration order within a round).
    External runs cap how many queries they check per round, so
    front-loading the unchecked ones converges every query to certified
    across rounds, and the freshness rotation behind them continuously
    re-certifies the rows whose green evidence is oldest -- shared-code
    hardening in later rounds is re-proven against the queries certified
    earliest, without manual reordering."""
    _load_suites()
    rounds = _certified_rounds()
    qs = list(REGISTRY.values())
    pending = [q for q in qs if q.name not in rounds]
    # stable partition: long-waiting uncertified first, deferred
    # newcomers next (expedited §2-parity lanes at the front of their
    # group), certified last in stalest-first rotation
    def group(sub: list[Query]) -> list[Query]:
        return [q for q in sub if q.expedite] + [q for q in sub if not q.expedite]

    certified = [q for q in qs if q.name in rounds]
    certified.sort(key=lambda q: rounds[q.name])  # stable: keeps reg order
    return (
        group([q for q in pending if not q.defer])
        + group([q for q in pending if q.defer])
        + certified
    )


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_LOADED = False


def _load_suites() -> None:
    """Import every suite module exactly once (import = registration).

    Import order IS registration order, and external consumers iterate the
    registry in insertion order -- so modules whose queries most need
    end-to-end certification are imported first.  (Round-1 certification
    covered graph_traversal, llm_extensions, and the head of
    pipeline_reference; this round front-loads the relational closure and
    streaming suites.)
    """
    global _LOADED
    if _LOADED:
        return
    # failure-atomic: a suite that raises partway through import has
    # already executed some @register calls, and Python evicts the
    # half-initialized module from sys.modules -- a bare retry would
    # then re-run those registrations and die on 'duplicate query
    # name', burying the real import error forever. Roll the registry
    # back to its pre-attempt state so the retry re-raises the
    # ORIGINAL failure instead.
    before = set(REGISTRY)
    try:
        from .suites import (  # noqa: F401
            relational_closure,
            streaming_suite,
            pipeline_reference,
            graph_traversal,
            llm_extensions,
        )
    except BaseException:
        for name in set(REGISTRY) - before:
            del REGISTRY[name]
        # also evict the suites that DID import: their cached modules
        # would no-op on the retry while their registrations were just
        # rolled back, leaving the registry silently incomplete
        import sys

        for mod in [
            m for m in sys.modules if m.startswith(f"{__package__}.suites")
        ]:
            del sys.modules[mod]
        raise

    _LOADED = True
