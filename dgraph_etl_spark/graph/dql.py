"""DQL text front-end for the reference's query subset (EP3 verbatim
parity): parse the EXACT query text the reference's query binary sends
over gRPC (cmd/query/main.go:29-43) and execute it as the same
broadcast-frontier traversal plan g01-g05 run.

Supported subset -- precisely what the reference emits:

    query   := '{' block+ '}'
    block   := NAME '(' 'func:' root ')' '{' line* '}'
    root    := 'eq(' ATTR ',' VALUE ')' | 'uid(' VAR ')'
    line    := '#' comment
             | [VAR 'as'] PRED [ '@filter(' filter ')' ]   # edge step
             | ATTR                                        # leaf proj
    filter  := 'NOT uid(' VAR ')' { 'AND' 'NOT uid(' VAR ')' }

Semantics (Dgraph's, for this subset):
- a block's root is a uid set: ``eq(attr, v)`` selects nodes whose
  attribute equals v; ``uid(x)`` references a previously bound var;
- an edge step follows the named predicate out of every root uid,
  optionally excluding the uids of earlier vars (``@filter(NOT
  uid(x) AND ...)``), and ``x as pred`` binds the reached set;
- ``var`` blocks bind only; NAMED blocks are outputs (the reference
  names them hop1_count / hop2_count and reads the counts).

Execution: uid sets are DataFrames with one ``id`` column; an edge
step is a broadcast-frontier join against the bound predicate's edge
table (the k_hop scale shape: the 100 TB edge table never moves, the
frontier does) and each NOT-uid filter is a left-anti join -- the
relational reading documented at graph/traverse.py:1.

The graph itself is supplied as ``DqlGraph`` bindings (edge tables per
predicate, eq-attribute index, leaf attributes), so the front-end is
schema-agnostic: the fixture binding lives with the graph suite.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- AST


@dataclass
class EdgeStep:
    pred: str
    alias: str | None  # 'x as pred' binding, or None
    not_uids: list[str] = field(default_factory=list)


@dataclass
class Block:
    name: str  # 'var' or an output name
    root_kind: str  # 'eq' | 'uid'
    root_args: tuple  # ('team_id', '7') for eq; ('src',) for uid
    steps: list[EdgeStep] = field(default_factory=list)
    leaf_attrs: list[str] = field(default_factory=list)


class DqlSyntaxError(ValueError):
    """Malformed or out-of-subset DQL -- always names the offending
    fragment (the repo's fail-loudly discipline)."""


_BLOCK_HEAD = re.compile(
    r"^(?P<name>\w+)\s*\(\s*func\s*:\s*"
    r"(?:eq\s*\(\s*(?P<eq_attr>\w+)\s*,\s*(?P<eq_val>[^)]+?)\s*\)"
    r"|uid\s*\(\s*(?P<uid_var>\w+)\s*\))\s*\)\s*$"
)
_EDGE_LINE = re.compile(
    r"^(?:(?P<alias>\w+)\s+as\s+)?(?P<pred>\w+)"
    r"(?:\s*@filter\s*\((?P<filter>[^)]*(?:\([^)]*\)[^)]*)*)\))?\s*$"
)
_NOT_UID = re.compile(r"NOT\s+uid\s*\(\s*(\w+)\s*\)")


def parse_dql(text: str) -> list[Block]:
    """Parse the reference's DQL subset into block ASTs. Raises
    DqlSyntaxError (with the fragment) on anything outside the
    subset -- silently mis-reading a query is worse than refusing."""
    # strip comments, then tokenize on braces so block bodies are
    # delimited exactly (the reference indents with tabs and spaces)
    lines = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if line:
            lines.append(line)
    # newline-joined: body lines stay line-delimited for _body_lines
    src = "\n".join(lines)
    if not src.startswith("{") or not src.endswith("}"):
        raise DqlSyntaxError(f"query must be wrapped in {{...}}: {src[:60]!r}")
    body = src[1:-1].strip()
    blocks: list[Block] = []
    pos = 0
    while pos < len(body):
        open_i = body.find("{", pos)
        if open_i < 0:
            if body[pos:].strip():
                raise DqlSyntaxError(
                    f"trailing content outside a block: {body[pos:][:60]!r}"
                )
            break
        head = " ".join(body[pos:open_i].split())
        m = _BLOCK_HEAD.match(head)
        if not m:
            raise DqlSyntaxError(f"unsupported block head: {head!r}")
        depth, i = 1, open_i + 1
        while i < len(body) and depth:
            if body[i] == "{":
                depth += 1
            elif body[i] == "}":
                depth -= 1
            i += 1
        if depth:
            raise DqlSyntaxError(f"unbalanced braces after: {head!r}")
        inner = body[open_i + 1 : i - 1].strip()
        if "{" in inner:
            raise DqlSyntaxError(
                f"nested blocks are outside the reference subset: {inner[:60]!r}"
            )
        if m.group("eq_attr"):
            root_kind, root_args = "eq", (
                m.group("eq_attr"),
                m.group("eq_val").strip().strip("\"'"),
            )
        else:
            root_kind, root_args = "uid", (m.group("uid_var"),)
        block = Block(m.group("name"), root_kind, root_args)
        for part in _body_lines(inner):
            em = _EDGE_LINE.match(part)
            if em is None:
                raise DqlSyntaxError(f"unsupported body line: {part!r}")
            if em.group("filter") is not None:
                filt = em.group("filter").strip()
                not_uids = _NOT_UID.findall(filt)
                # the subset allows ONLY AND-joined NOT uid(...) terms:
                # verify nothing else lurks in the filter text
                leftover = _NOT_UID.sub("", filt)
                leftover = re.sub(r"\bAND\b", "", leftover).strip()
                if leftover:
                    raise DqlSyntaxError(
                        f"unsupported @filter fragment: {filt!r}"
                    )
                if em.group("alias") is None:
                    # an unaliased filtered edge step is a nested
                    # EXPANSION in full Dgraph (per-uid child results);
                    # this executor has no nested output, so computing
                    # it and emitting only the root set would be a
                    # silently wrong answer -- refuse instead
                    raise DqlSyntaxError(
                        "edge step with @filter but no 'VAR as' binding "
                        f"is outside the subset: {part!r}"
                    )
                block.steps.append(
                    EdgeStep(em.group("pred"), em.group("alias"), not_uids)
                )
            elif em.group("alias"):
                block.steps.append(
                    EdgeStep(em.group("pred"), em.group("alias"), [])
                )
            else:
                # a bare word: leaf attribute projection
                block.leaf_attrs.append(em.group("pred"))
        blocks.append(block)
        pos = i
    if not blocks:
        raise DqlSyntaxError("empty query: no blocks")
    # duplicate OUTPUT names would silently overwrite each other in
    # any name-keyed consumer (the CLI's JSON output) -- refuse, per
    # this module's fail-loudly contract. Dgraph itself rejects them.
    named = [b.name for b in blocks if b.name != "var"]
    dupes = sorted({n for n in named if named.count(n) > 1})
    if dupes:
        raise DqlSyntaxError(f"duplicate output block name(s): {dupes}")
    return blocks


def _body_lines(inner: str) -> list[str]:
    """Split a block body into logical lines. Bodies reach us with
    newlines intact (comment stripping preserves line structure), so a
    plain split suffices. A single-line body is one logical line: a
    one-line MULTI-step body ('{ x as p y as q }') is therefore
    rejected by the line grammar -- DQL's own convention is
    line-per-step, and mis-grouping steps silently would be worse."""
    if "\n" in inner:
        return [ln.strip() for ln in inner.splitlines() if ln.strip()]
    return [inner] if inner else []


# ------------------------------------------------------------ bindings


@dataclass
class DqlGraph:
    """Schema binding from DQL predicate names onto DataFrames.

    edge_preds: predicate -> DataFrame(src, dst) -- the edge table the
        predicate traverses (ids in one shared namespace).
    eq_index: attribute -> DataFrame(id, value:string) -- node ids by
        attribute value, for ``func: eq(attr, v)`` roots.
    leaf_attrs: attribute -> DataFrame(id, <attribute>) -- node
        attribute lookup for leaf projections."""

    edge_preds: dict[str, DataFrame]
    eq_index: dict[str, DataFrame]
    leaf_attrs: dict[str, DataFrame]


@dataclass
class DqlResult:
    """One named (non-var) block's output: its root uid set, resolved
    leaf attributes (if any), and the vars it bound."""

    name: str
    uids: DataFrame  # column: id
    attrs: DataFrame | None  # uids joined onto leaf attributes


def run_dql(text: str, graph: DqlGraph) -> list[DqlResult]:
    """Parse + execute ``text`` against ``graph``. Returns the named
    blocks' results in query order; var blocks only bind.

    Scale shape: each edge step broadcasts the frontier against the
    predicate's edge table (never moves the edges), exclusions are
    anti-joins, every bound set is dropDuplicates'd -- identical to
    graph/traverse.expand, which executes the same reference query as
    hand-built DataFrames (g01-g05)."""
    env: dict[str, DataFrame] = {}
    out: list[DqlResult] = []
    n_steps = 0
    for block in parse_dql(text):
        root = _root_set(block, env, graph)
        for step in block.steps:
            edges = graph.edge_preds.get(step.pred)
            if edges is None:
                raise DqlSyntaxError(
                    f"unbound edge predicate {step.pred!r} "
                    f"(bound: {sorted(graph.edge_preds)})"
                )
            # per-step alias: consecutive hops join the SAME edge
            # DataFrame, and the second hop's frontier already derives
            # from it -- unqualified edges['dst'] would be an
            # ambiguous self-join reference
            n_steps += 1
            ea = f"_dql_e{n_steps}"
            e = edges.alias(ea)
            reached = (
                F.broadcast(root.select("id"))
                .join(e, F.col("id") == F.col(f"{ea}.src"))
                # NULL dst must not enter a uid set (traverse.expand's
                # phantom-node note)
                .filter(F.col(f"{ea}.dst").isNotNull())
                .select(F.col(f"{ea}.dst").alias("id"))
                .dropDuplicates(["id"])
            )
            for var in step.not_uids:
                if var not in env:
                    raise DqlSyntaxError(
                        f"@filter references unbound var {var!r}"
                    )
                reached = reached.join(env[var], "id", "left_anti")
            if step.alias:
                # truncate lineage at each binding (k_hop's per-frontier
                # discipline): later blocks reference a var BOTH as a
                # uid root and in NOT-uid anti-joins, so an uncut plan
                # doubles per hop and re-runs every upstream traversal
                # per reference
                env[step.alias] = reached.localCheckpoint(eager=False)
        if block.name != "var":
            attrs = None
            for attr in block.leaf_attrs:
                tbl = graph.leaf_attrs.get(attr)
                if tbl is None:
                    raise DqlSyntaxError(
                        f"unbound leaf attribute {attr!r} "
                        f"(bound: {sorted(graph.leaf_attrs)})"
                    )
                attrs = (
                    attrs if attrs is not None else root.select("id")
                ).join(tbl, "id")
            out.append(DqlResult(block.name, root.select("id"), attrs))
    return out


def _root_set(block: Block, env: dict, graph: DqlGraph) -> DataFrame:
    if block.root_kind == "uid":
        (var,) = block.root_args
        if var not in env:
            raise DqlSyntaxError(f"func: uid({var}) references unbound var")
        return env[var]
    attr, val = block.root_args
    idx = graph.eq_index.get(attr)
    if idx is None:
        raise DqlSyntaxError(
            f"no eq-index for attribute {attr!r} (bound: "
            f"{sorted(graph.eq_index)})"
        )
    return (
        idx.filter(F.col("value") == val).select("id").dropDuplicates(["id"])
    )
