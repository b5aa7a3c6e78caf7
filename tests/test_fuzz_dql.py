"""Differential fuzzing of the DQL front-end: random graphs + random
queries in the supported subset, executed by graph/dql.py on Spark and
INDEPENDENTLY by a ~40-line pure-Python set evaluator implementing the
documented Dgraph semantics (uid sets, boolean filter algebra, typed
inequality, order-drops-missing-attr, offset/first pagination, distinct
count fan-out).

The registered g30-g33 queries pin four known shapes against DuckDB;
this fuzzes the space BETWEEN them -- arbitrary filter trees, chained
var bindings, pagination over duplicate order keys (the id tie-break),
empty frontiers -- where a parser or executor bug would hide. Seeded
per-case, so CI never flakes; FUZZ_SCALE multiplies the case count for
a deep local pass.
"""

from __future__ import annotations

import os
import random

import pytest

from dgraph_etl_spark.graph.dql import DqlGraph, run_dql

_SCALE = int(os.environ.get("FUZZ_SCALE", "1"))
_CASES = 8 * _SCALE

ATTR = "score"  # the one scalar attribute; typed int
TAG = "tag"  # free-text attribute: anyofterms/allofterms/regexp lanes
# lowercase-alphanumeric vocab so the term tokenizer is exercised by
# SEPARATORS and CASING, not by in-word punctuation
_VOCAB = ("red", "blue", "fast", "slow", "big")
_SEPS = (" ", "-", ", ", "; ")
# fulltext lanes: morphological suffixes the stemmer must strip (and
# short forms it must NOT over-strip), plus stopwords it must drop --
# both sides of the differential apply their OWN implementations
_SUFFIXES = ("", "", "", "s", "ing", "ed", "ly", "ss")
_STOPS = ("the", "of", "and", "a")


# ----------------------------------------------------------- generator


def _gen_tag(rng: random.Random) -> str:
    """1-3 vocab words (possibly suffixed -- fulltext stemming lanes),
    maybe a stopword mixed in, under random separators and casing: the
    term lanes must match through separators/casing, the fulltext
    lanes additionally through morphology, regexp through neither."""
    words = [
        w + rng.choice(_SUFFIXES)
        for w in rng.sample(_VOCAB, rng.randint(1, 3))
    ]
    if rng.random() < 0.3:
        words.insert(rng.randrange(len(words) + 1), rng.choice(_STOPS))
    words = [w.upper() if rng.random() < 0.3 else w for w in words]
    out = words[0]
    for w in words[1:]:
        out += rng.choice(_SEPS) + w
    return out


def _gen_graph(rng: random.Random):
    n = rng.randint(6, 12)
    ids = [f"n{i:02d}" for i in range(n)]
    preds = ["knows"] + (["likes"] if rng.random() < 0.5 else [])
    # each edge carries a 'weight' FACET (@facets lanes filter on it)
    edges = {p: {} for p in preds}
    for p in preds:
        for _ in range(rng.randint(0, 2 * n)):
            edges[p][(rng.choice(ids), rng.choice(ids))] = rng.randint(0, 5)
    # small value domain -> duplicate order keys (exercises the id
    # tie-break); ~20% of nodes have NO score (exercises order-drop)
    score = {i: rng.randint(0, 5) for i in ids if rng.random() < 0.8}
    # ~25% of nodes have NO tag (string-search misses them entirely)
    tags = {i: _gen_tag(rng) for i in ids if rng.random() < 0.75}
    return ids, preds, edges, score, tags


def _gen_term(rng, preds, bound, value_vars=()):
    kinds = ["eq", "cmp", "has", "terms", "fulltext", "regexp",
             "between"] + (["uid"] if bound else [])
    if value_vars:
        kinds += ["eqval", "cmpval"]
    k = rng.choice(kinds)
    if k == "uid":
        return ("uid", rng.choice(bound))
    if k == "eq":
        return ("eq", ATTR, str(rng.randint(0, 5)))
    if k == "cmp":
        op = rng.choice(["ge", "le", "gt", "lt"])
        return ("cmp", op, ATTR, str(rng.randint(0, 5)))
    if k == "between":
        lo = rng.randint(0, 5)
        return ("between", ATTR, str(lo), str(rng.randint(lo - 1, 5)))
    if k == "terms":
        mode = rng.choice(["any", "all"])
        words = rng.sample(_VOCAB, rng.randint(1, 2))
        return ("terms", mode, TAG, tuple(words))
    if k == "fulltext":
        mode = rng.choice(["any", "all"])
        # suffixed query words must stem back to the stored stems; a
        # stopword may ride along (dropped by BOTH implementations) --
        # at least one non-stopword word, or the parser refuses
        words = [
            w + rng.choice(_SUFFIXES)
            for w in rng.sample(_VOCAB, rng.randint(1, 2))
        ]
        if rng.random() < 0.3:
            words.append(rng.choice(_STOPS))
        return ("fulltext", mode, TAG, tuple(words))
    if k == "regexp":
        # a vocab word, maybe one char wildcarded, maybe /i -- simple
        # enough that Python re.search and Spark rlike agree exactly
        w = list(rng.choice(_VOCAB))
        if rng.random() < 0.5:
            w[rng.randrange(len(w))] = "."
        return ("regexp", TAG, "".join(w), rng.random() < 0.5)
    if k == "eqval":
        return ("eqval", rng.choice(value_vars), str(rng.randint(0, 6)))
    if k == "cmpval":
        op = rng.choice(["ge", "le", "gt", "lt"])
        return ("cmpval", op, rng.choice(value_vars), str(rng.randint(0, 6)))
    return ("has", rng.choice(preds + [ATTR, TAG]))


def _gen_filter(rng, preds, bound, depth=0, value_vars=()):
    r = rng.random()
    if depth < 2 and r < 0.3:
        parts = [
            _gen_filter(rng, preds, bound, depth + 1, value_vars)
            for _ in range(rng.randint(2, 3))
        ]
        return (rng.choice(["and", "or"]), parts)
    if depth < 2 and r < 0.45:
        return ("not", _gen_filter(rng, preds, bound, depth + 1, value_vars))
    return _gen_term(rng, preds, bound, value_vars)


def _render_filter(expr) -> str:
    kind = expr[0]
    if kind == "and":
        return "(" + " AND ".join(_render_filter(p) for p in expr[1]) + ")"
    if kind == "or":
        return "(" + " OR ".join(_render_filter(p) for p in expr[1]) + ")"
    if kind == "not":
        return f"NOT {_render_filter(expr[1])}"
    if kind == "uid":
        return f"uid({expr[1]})"
    if kind == "eq":
        return f"eq({expr[1]}, {expr[2]})"
    if kind == "cmp":
        return f"{expr[1]}({expr[2]}, {expr[3]})"
    if kind == "eqval":
        return f"eq(val({expr[1]}), {expr[2]})"
    if kind == "cmpval":
        return f"{expr[1]}(val({expr[2]}), {expr[3]})"
    if kind == "between":
        return f"between({expr[1]}, {expr[2]}, {expr[3]})"
    if kind == "terms":
        fn = "anyofterms" if expr[1] == "any" else "allofterms"
        return f'{fn}({expr[2]}, "{" ".join(expr[3])}")'
    if kind == "fulltext":
        fn = "anyoftext" if expr[1] == "any" else "alloftext"
        return f'{fn}({expr[2]}, "{" ".join(expr[3])}")'
    if kind == "regexp":
        return f"regexp({expr[1]}, /{expr[2]}/{'i' if expr[3] else ''})"
    return f"has({expr[1]})"


def _gen_facet(rng, depth=0):
    """Facet predicate: eq/cmp atoms on 'weight', composed under
    AND/OR/NOT one level deep."""
    r = rng.random()
    if depth < 1 and r < 0.25:
        return (
            rng.choice(["and", "or"]),
            [_gen_facet(rng, 1), _gen_facet(rng, 1)],
        )
    if depth < 1 and r < 0.4:
        return ("not", _gen_facet(rng, 1))
    op = rng.choice(["eq", "ge", "le", "gt", "lt"])
    v = str(rng.randint(0, 5))
    return ("eq", "weight", v) if op == "eq" else ("cmp", op, "weight", v)


def _gen_query(rng, preds, score):
    """Random query: 1-3 var blocks chaining edge steps, then one
    named output block with optional root filter / pagination / count.
    Returns (text, plan) where plan is the AST mirror the reference
    evaluator walks."""
    blocks = []
    bound: list[str] = []  # every var (uid refs allowed over both)
    value_vars: list[str] = []  # the subset holding per-uid scalars
    n_var = rng.randint(0, 2)
    for _ in range(n_var + 1):
        last = len(blocks) == n_var
        if value_vars and rng.random() < 0.25:
            # root over a value variable: func: ge(val(x), N) etc.
            op = rng.choice(["eq", "ge", "le", "gt", "lt"])
            var = rng.choice(value_vars)
            v = str(rng.randint(0, 6))
            root = (
                ("eqval", var, v)
                if op == "eq"
                else ("cmpval", op, var, v)
            )
        elif bound and rng.random() < 0.6:
            root = ("uid", rng.choice(bound))
        else:
            root = _gen_term(rng, preds, [])
            if root[0] == "uid":  # unreachable, but keep the invariant
                root = ("has", preds[0])
        root_filter = (
            _gen_filter(rng, preds, bound, value_vars=value_vars)
            if rng.random() < 0.5
            else None
        )
        # snapshot BEFORE this block's steps: the agg branch below may
        # discard the steps it just generated, so an agg var picked
        # from the live list could be a ghost binding
        prior_value_vars = list(value_vars)
        steps = []
        if not last or rng.random() < 0.3:
            for _ in range(rng.randint(1 if not last else 0, 2)):
                alias = f"v{len(bound)}"
                r = rng.random()
                if r < 0.2:
                    steps.append(
                        {"kind": "countbind", "pred": rng.choice(preds),
                         "alias": alias, "filt": None}
                    )
                    value_vars.append(alias)
                elif r < 0.35:
                    steps.append(
                        {"kind": "attrbind", "pred": ATTR,
                         "alias": alias, "filt": None}
                    )
                    value_vars.append(alias)
                else:
                    filt = (
                        _gen_filter(rng, preds, bound, value_vars=value_vars)
                        if rng.random() < 0.5
                        else None
                    )
                    facet = (
                        _gen_facet(rng) if rng.random() < 0.35 else None
                    )
                    steps.append(
                        {"kind": "edge", "pred": rng.choice(preds),
                         "alias": alias, "filt": filt, "facet": facet}
                    )
                bound.append(alias)
        order = first = offset = recurse = None
        rpreds: list[str] = []
        counts = []
        aggs: list[tuple] = []
        groupby = countuid = False
        if last and rng.random() < 0.15:
            # @groupby output: ONLY the count(uid) line
            groupby = countuid = True
            steps = []
        elif last and rng.random() < 0.1:
            # bare count(uid): root cardinality
            countuid = True
            steps = []
        elif last and prior_value_vars and rng.random() < 0.25:
            # aggregation output block: only agg lines
            var = rng.choice(prior_value_vars)
            aggs = [
                (fn, var)
                for fn in rng.sample(
                    ["min", "max", "sum", "avg"], rng.randint(1, 3)
                )
            ]
            steps = []
        elif last and rng.random() < 0.35:
            # @recurse output block: bare predicates, no pagination
            recurse = rng.randint(1, 4)
            rpreds = rng.sample(preds, rng.randint(1, len(preds)))
            steps = []
            if rng.random() < 0.5:
                counts = [rng.choice(preds)]
        elif last:
            if rng.random() < 0.5:
                order = rng.choice([True, False])  # ascending?
            if rng.random() < 0.6:
                first = rng.randint(1, 5)
            if rng.random() < 0.4:
                offset = rng.randint(0, 3)
            if rng.random() < 0.5:
                counts = [rng.choice(preds)]
        # cascade composes with recurse (steps are [] there); leaf
        # projection fuzzes the LEFT-join semantics and is forced on
        # under cascade so there's something to require
        cascade = (
            last
            and not steps
            and not aggs
            and not groupby
            and not countuid
            and rng.random() < 0.3
        )
        leaf = (
            last
            and not aggs
            and not groupby
            and not countuid
            and (cascade or rng.random() < 0.4)
        )
        blocks.append(
            {
                "name": "out" if last else "var",
                "root": root,
                "root_filter": root_filter,
                "steps": steps,
                "order": order,
                "first": first,
                "offset": offset,
                "counts": counts,
                "recurse": recurse,
                "rpreds": rpreds,
                "cascade": cascade,
                "leaf": leaf,
                "aggs": aggs,
                "groupby": groupby,
                "countuid": countuid,
            }
        )
    # render
    lines = ["{"]
    for b in blocks:
        mods = ""
        if b["order"] is not None:
            mods += f", {'orderasc' if b['order'] else 'orderdesc'}: {ATTR}"
        if b["offset"] is not None:
            mods += f", offset: {b['offset']}"
        if b["first"] is not None:
            mods += f", first: {b['first']}"
        head = f"  {b['name']}(func: {_render_filter(b['root'])}{mods})"
        if b["root_filter"] is not None:
            head += f" @filter({_render_filter(b['root_filter'])})"
        if b["groupby"]:
            head += f" @groupby({ATTR})"
        if b["recurse"] is not None:
            loop = "true" if b["recurse"] % 2 else "false"
            head += f" @recurse(depth: {b['recurse']}, loop: {loop})"
        if b["cascade"]:
            head += " @cascade"
        lines.append(head + "{")
        if b["leaf"]:
            lines.append(f"    {ATTR}")
        for pred in b["rpreds"]:
            lines.append(f"    {pred}")
        for st in b["steps"]:
            if st["kind"] == "countbind":
                lines.append(f"    {st['alias']} as count({st['pred']})")
            elif st["kind"] == "attrbind":
                lines.append(f"    {st['alias']} as {st['pred']}")
            else:
                step = f"    {st['alias']} as {st['pred']}"
                if st["filt"] is not None:
                    step += f" @filter({_render_filter(st['filt'])})"
                if st.get("facet") is not None:
                    step += f" @facets({_render_filter(st['facet'])})"
                lines.append(step)
        for pred in b["counts"]:
            lines.append(f"    count({pred})")
        for fn, var in b["aggs"]:
            lines.append(f"    {fn}(val({var}))")
        if b["countuid"]:
            lines.append("    count(uid)")
        lines.append("  }")
    lines.append("}")
    return "\n".join(lines), blocks


# --------------------------------------------- reference set evaluator


def _facet_ok(fac, w) -> bool:
    if fac is None:
        return True
    kind = fac[0]
    if kind == "and":
        return all(_facet_ok(p, w) for p in fac[1])
    if kind == "or":
        return any(_facet_ok(p, w) for p in fac[1])
    if kind == "not":
        return not _facet_ok(fac[1], w)
    if kind == "eq":
        return float(w) == float(fac[2])
    _, op, _, val = fac
    x = float(val)
    return {
        "ge": w >= x,
        "le": w <= x,
        "gt": w > x,
        "lt": w < x,
    }[op]


def _term_toks(value: str) -> set:
    import re as _re

    return {t for t in _re.split(r"[^a-z0-9]+", value.lower()) if t}


# independent re-derivation of the documented fulltext analyzer (the
# module docstring's rule list), NOT an import of graph/dql.py's
# implementation -- the differential must catch a drifted rule table
_FT_STOP = frozenset(
    "the a an and or of in on at to is are was were be been it this "
    "that with as for by from not but".split()
)


def _ft_stem(t: str) -> str:
    if t.endswith("sses"):
        t = t[:-2]
    elif t.endswith("ies"):
        t = t[:-2]
    elif t.endswith("ss"):
        pass
    elif t.endswith("s") and len(t) >= 4:
        t = t[:-1]
    if t.endswith("ing") and len(t) >= 6:
        t = t[:-3]
    elif t.endswith("ed") and len(t) >= 5:
        t = t[:-2]
    elif t.endswith("ly") and len(t) >= 5:
        t = t[:-2]
    return t


def _ft_stems(value: str) -> set:
    return {_ft_stem(t) for t in _term_toks(value) if t not in _FT_STOP}


def _ref_term(term, env, edges, score, tags):
    kind = term[0]
    if kind == "uid":
        # a value var's uid set is the ids it is defined on
        return set(env[term[1]])
    if kind == "between":
        _, _, lo, hi = term
        lo, hi = float(lo), float(hi)
        return {i for i, v in score.items() if lo <= float(v) <= hi}
    if kind == "terms":
        _, mode, _, words = term
        want = set(words)
        if mode == "any":
            return {i for i, v in tags.items() if _term_toks(v) & want}
        return {i for i, v in tags.items() if want <= _term_toks(v)}
    if kind == "fulltext":
        _, mode, _, words = term
        want = {_ft_stem(w) for w in words if w not in _FT_STOP}
        if mode == "any":
            return {i for i, v in tags.items() if _ft_stems(v) & want}
        return {i for i, v in tags.items() if want <= _ft_stems(v)}
    if kind == "regexp":
        import re as _re

        _, _, pat, ci = term
        rx = _re.compile(("(?i)" if ci else "") + pat)
        return {i for i, v in tags.items() if rx.search(v)}
    if kind == "eqval":
        _, var, val = term
        return {i for i, v in env[var].items() if v == float(val)}
    if kind == "cmpval":
        _, op, var, val = term
        x = float(val)
        cmpf = {
            "ge": lambda v: v >= x,
            "le": lambda v: v <= x,
            "gt": lambda v: v > x,
            "lt": lambda v: v < x,
        }[op]
        return {i for i, v in env[var].items() if cmpf(v)}
    if kind == "eq":
        # typed compare, mirroring the executor (attr_types[ATTR]=int)
        return {i for i, v in score.items() if float(v) == float(term[2])}
    if kind == "cmp":
        _, op, _, val = term
        v = float(val)
        cmpf = {
            "ge": lambda x: x >= v,
            "le": lambda x: x <= v,
            "gt": lambda x: x > v,
            "lt": lambda x: x < v,
        }[op]
        return {i for i, x in score.items() if cmpf(float(x))}
    # has
    name = term[1]
    if name in edges:
        return {s for s, _ in edges[name]}
    if name == TAG:
        return set(tags)
    return set(score)


def _ref_filter(cand, expr, env, edges, score, tags):
    kind = expr[0]
    if kind == "and":
        out = set(cand)
        for part in expr[1]:
            out = _ref_filter(out, part, env, edges, score, tags)
        return out
    if kind == "or":
        return set().union(
            *(_ref_filter(cand, p, env, edges, score, tags) for p in expr[1])
        )
    if kind == "not":
        return set(cand) - _ref_filter(cand, expr[1], env, edges, score, tags)
    return set(cand) & _ref_term(expr, env, edges, score, tags)


def _ref_eval(blocks, edges, score, tags):
    """Walk the plan with plain sets; returns (uids, rn_map|None,
    counts_map|None) for the 'out' block."""
    env: dict[str, set] = {}
    out = None
    for b in blocks:
        root = _ref_term(b["root"], env, edges, score, tags)
        if b["root_filter"] is not None:
            root = _ref_filter(root, b["root_filter"], env, edges, score, tags)
        if b["recurse"] is not None:
            ee = set().union(*(edges[p] for p in b["rpreds"]))
            reach, frontier = set(root), set(root)
            for _ in range(b["recurse"] - 1):
                nxt = {d for s, d in ee if s in frontier} - reach
                if not nxt:
                    break
                reach |= nxt
                frontier = nxt
            root = reach
        rn = None
        if (
            b["order"] is not None
            or b["first"] is not None
            or b["offset"] is not None
        ):
            if b["order"] is not None:
                kept = [i for i in root if i in score]
                key = (
                    (lambda i: (score[i], i))
                    if b["order"]
                    else (lambda i: (-score[i], i))
                )
            else:
                kept, key = list(root), lambda i: i
            ranked = sorted(kept, key=key)
            off = b["offset"] or 0
            hi = off + b["first"] if b["first"] is not None else len(ranked)
            rn = {
                i: pos + 1
                for pos, i in enumerate(ranked)
                if off <= pos < hi
            }
            root = set(rn)
        if b["cascade"]:
            # cascade prunes AFTER pagination (ranks keep their slots)
            root = root & set(score)
            if rn is not None:
                rn = {i: r for i, r in rn.items() if i in root}
        for st in b["steps"]:
            if st["kind"] == "countbind":
                env[st["alias"]] = {
                    i: float(
                        len({d for s, d in edges[st["pred"]] if s == i})
                    )
                    for i in root
                }
            elif st["kind"] == "attrbind":
                env[st["alias"]] = {
                    i: float(score[i]) for i in root if i in score
                }
            else:
                reached = {
                    d
                    for (s, d), w in edges[st["pred"]].items()
                    if s in root and _facet_ok(st.get("facet"), w)
                }
                if st["filt"] is not None:
                    reached = _ref_filter(
                        reached, st["filt"], env, edges, score, tags
                    )
                env[st["alias"]] = reached
        if b["name"] != "var":
            counts = None
            if b["counts"]:
                pred = b["counts"][0]
                counts = {
                    i: len({d for s, d in edges[pred] if s == i})
                    for i in root
                }
            agg_row = None
            if b["aggs"]:
                agg_row = {}
                for fn, var in b["aggs"]:
                    vals = [
                        v for i, v in env[var].items() if i in root
                    ]
                    if not vals:
                        agg_row[f"{fn}_{var}"] = None
                    elif fn == "min":
                        agg_row[f"{fn}_{var}"] = min(vals)
                    elif fn == "max":
                        agg_row[f"{fn}_{var}"] = max(vals)
                    elif fn == "sum":  # sum of small ints: float-exact
                        agg_row[f"{fn}_{var}"] = float(sum(vals))
                    else:  # avg: compared approx (decimal-div vs float)
                        agg_row[f"{fn}_{var}"] = sum(vals) / len(vals)
            binds = {
                st["alias"]: {i: env[st["alias"]].get(i) for i in root}
                for st in b["steps"]
                if st["kind"] in ("countbind", "attrbind")
            }
            groups = None
            if b["groupby"]:
                groups = {}
                for i in root:
                    if i in score:
                        k = float(score[i])
                        groups[k] = groups.get(k, 0) + 1
            total = len(root) if (b["countuid"] and not b["groupby"]) else None
            out = (root, rn, counts, agg_row, binds or None, groups, total)
    return out


# ---------------------------------------------------------------- test


@pytest.mark.parametrize("seed", range(_CASES))
def test_dql_matches_reference_set_semantics(spark, seed):
    rng = random.Random(20260816 + seed)
    ids, preds, edges, score, tags = _gen_graph(rng)
    text, blocks = _gen_query(rng, preds, score)

    graph = DqlGraph(
        edge_preds={
            p: spark.createDataFrame(
                sorted(
                    (s, d, float(w)) for (s, d), w in edges[p].items()
                )
                or [],
                "src string, dst string, weight double",
            )
            for p in preds
        },
        eq_index={
            ATTR: spark.createDataFrame(
                sorted((i, str(v)) for i, v in score.items()) or [],
                "id string, value string",
            ),
            TAG: spark.createDataFrame(
                sorted(tags.items()) or [],
                "id string, value string",
            ),
        },
        leaf_attrs={
            ATTR: spark.createDataFrame(
                sorted((i, v) for i, v in score.items()) or [],
                f"id string, {ATTR} int",
            )
        },
        attr_types={ATTR: "int"},
    )
    (res,) = run_dql(text, graph)
    (
        exp_uids,
        exp_rn,
        exp_counts,
        exp_aggs,
        exp_binds,
        exp_groups,
        exp_total,
    ) = _ref_eval(blocks, edges, score, tags)
    if exp_groups is not None:
        got_groups = {
            r[ATTR]: r["count"] for r in res.attrs.collect()
        }
        assert got_groups == exp_groups, f"groups diverged for:\n{text}"
    elif exp_total is not None:
        assert res.attrs.collect()[0]["count"] == exp_total, (
            f"count(uid) diverged for:\n{text}"
        )
    if exp_aggs is not None:
        (row,) = res.attrs.collect()
        for k, v in exp_aggs.items():
            g = row[k]
            if v is None:
                assert g is None, f"{k} should be NULL for:\n{text}"
            elif k.startswith("avg_"):
                # decimal-scale division vs float division: equal to
                # within representation
                assert g == pytest.approx(v, rel=1e-9), (
                    f"{k} diverged for:\n{text}"
                )
            else:
                assert g == v, f"{k} diverged for:\n{text}"
    if exp_binds is not None:
        attr_rows = res.attrs.collect()
        for alias, expected in exp_binds.items():
            got = {r["id"]: r[alias] for r in attr_rows}
            assert got == expected, (
                f"value-bind projection {alias!r} diverged for:\n{text}"
            )

    got_rows = res.uids.collect()
    got_uids = {r["id"] for r in got_rows}
    assert got_uids == exp_uids, f"uid set diverged for:\n{text}"
    if exp_rn is not None:
        got_rn = {r["id"]: r["rn"] for r in got_rows}
        assert got_rn == exp_rn, f"page ranks diverged for:\n{text}"
    if exp_counts is not None:
        pred = blocks[-1]["counts"][0]
        got_counts = {
            r["id"]: r[f"count_{pred}"] for r in res.attrs.collect()
        }
        assert got_counts == exp_counts, f"counts diverged for:\n{text}"
    if blocks[-1]["leaf"]:
        # LEFT-join projection: every output uid keeps a row; the
        # attr is None exactly where the node has no score
        got_attrs = {(r["id"], r[ATTR]) for r in res.attrs.collect()}
        exp_attrs = {(i, score.get(i)) for i in exp_uids}
        assert got_attrs == exp_attrs, f"leaf projection diverged for:\n{text}"
