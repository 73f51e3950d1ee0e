"""Basic-graph-pattern (BGP) queries over the constructed KG.

The reference's read path is DBpedia's public SPARQL endpoint — every
predicate lookup is a one-triple-pattern SPARQL query shipped over HTTPS
(reference query_dbpedia.py:14-60 builds ``select ?p where { <s> ?p <o> }``
strings).  This module closes the loop on the engine's OWN output: the
SPARQL-core conjunctive fragment (a basic graph pattern — a set of
(subj, pred, obj) patterns with shared ``?variables``) evaluated over the
triples table the pipeline materialized, as a chain of Catalyst equi-joins.

Scale shape (what .explain should show):
  - each pattern is a filtered projection of the SAME triples scan —
    constant slots become pushed-down parquet filters, variable slots
    become projected columns, so a pattern like ("?x", "director", "?y")
    reads only the matching row group bytes;
  - patterns join pairwise on their shared variables (inner equi-join) —
    Catalyst broadcasts the small side, AQE splits skewed bindings;
  - join ORDER is chosen greedily: start from the most-constant (most
    selective) pattern, always extend with a pattern that shares a bound
    variable — the classic BGP heuristic that keeps intermediate bindings
    small and avoids products;
  - a pattern set that cannot be connected through shared variables is a
    cartesian product of its components; that's almost always a query bug
    at 10^12-triple scale, so it raises unless ``allow_product=True``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bgp_match", "transitive_pairs", "parse_sparql", "sparql_select"]


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_frame(
    triples: DataFrame, pattern: tuple[str, str, str], cols: tuple[str, str, str],
    path_max_hops: int = 16,
) -> tuple[DataFrame, list[str]]:
    """One pattern -> (bindings frame, bound variable names).

    Constant slots filter (pushed to the scan); variable slots project,
    aliased to the variable name.  The same variable twice in ONE pattern
    (e.g. ("?x", "knows", "?x")) is a row-local equality filter.

    A constant predicate ending in ``+`` is a SPARQL property path: the
    pattern matches over :func:`transitive_pairs` (bounded at
    ``path_max_hops``) instead of the raw edge set."""
    if len(pattern) != 3:
        raise ValueError(f"pattern must be (subj, pred, obj), got {pattern!r}")
    df = triples
    p_term = pattern[1]
    if not _is_var(p_term) and p_term is not None and len(p_term) > 1 and p_term.endswith("+"):
        base = p_term[:-1]
        reach = transitive_pairs(triples, base, path_max_hops, cols).select(
            F.col("src").alias(cols[0]),
            F.lit(base).alias(cols[1]),
            F.col("dst").alias(cols[2]),
        )
        return _pattern_frame(reach, (pattern[0], base, pattern[2]), cols)
    var_slot: dict[str, str] = {}
    for slot, term in zip(cols, pattern):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in pattern {pattern!r}")
            if name in var_slot:
                df = df.filter(F.col(slot) == F.col(var_slot[name]))
            else:
                var_slot[name] = slot
        else:
            df = df.filter(F.col(slot) == F.lit(term))
    names = list(var_slot)
    sel = [F.col(var_slot[n]).alias(n) for n in names]
    if not sel:
        # all-constant pattern = existence test: a 0/1-row marker frame the
        # planner semi-gates the result on (limit 1 — never a full scan
        # materialization)
        return df.limit(1).select(F.lit(1).alias("__exists")), []
    return df.select(*sel), names


def transitive_pairs(
    triples: DataFrame,
    pred: str,
    max_hops: int,
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
) -> DataFrame:
    """SPARQL property-path ``pred+`` bounded at ``max_hops``: every
    (src, dst) pair connected by 1..max_hops edges of ``pred``.

    Pointer doubling, not per-hop BFS: round i holds all pairs within
    2^i hops (reach_2k = reach_k UNION reach_k JOIN reach_k), so a
    k-hop bound costs ceil(log2 k) self equi-join + distinct rounds —
    the same O(log diameter) shape as graph.resolve_chains /
    connected_components, and the only shuffles are on the join key.
    State is localCheckpointed per round to keep lineage flat.

    The bound is EXACT for any max_hops, not just powers of two: doubling
    builds levels L_i = reach(<= 2^i), and the result composes the levels
    picked by max_hops' binary digits (reach(<=a) composed with
    reach(<=b) = both unions plus their join = reach(<=a+b))."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    s, p, o = cols

    def compose(x: DataFrame, y: DataFrame) -> DataFrame:
        xy = (
            x.alias("a")
            .join(y.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        return (
            x.unionByName(y).unionByName(xy).distinct().localCheckpoint(eager=True)
        )

    level = (
        triples.filter(F.col(p) == F.lit(pred))
        .select(F.col(s).alias("src"), F.col(o).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )  # reach(<= 1)
    span = 1
    acc = level if max_hops & 1 else None
    remaining = max_hops >> 1
    while remaining:
        level = compose(level, level)  # reach(<= 2*span)
        span *= 2
        if remaining & 1:
            acc = level if acc is None else compose(acc, level)
        remaining >>= 1
    return acc


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = True,
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    allow_product: bool = False,
    optional: list[tuple[str, str, str]] | None = None,
    where=None,
    path_max_hops: int = 16,
) -> DataFrame:
    """Evaluate a conjunctive graph pattern over ``triples``.

    ``patterns``: list of (subj, pred, obj) terms; a term starting with
    ``?`` is a variable, anything else matches literally.  Returns one row
    per distinct variable binding (SPARQL set semantics; ``distinct=False``
    keeps bag semantics), with one column per variable.

    ``select``: variables to project (without the ``?``); default = every
    variable, in first-appearance order.

    ``allow_product``: permit disconnected pattern groups (cartesian
    product of their bindings).  Off by default — see module docstring.

    ``optional``: SPARQL OPTIONAL — each pattern left-joins the required
    bindings on its shared variables; rows without a match keep NULL in
    the optional-only variables.  Every optional pattern must share at
    least one variable with the required group (an unanchored OPTIONAL is
    a product).

    ``where``: SPARQL FILTER — a pyspark Column or SQL string over the
    variable columns, applied after optionals and BEFORE projection, so
    it may reference variables that are not selected.
    """
    if not patterns:
        raise ValueError("empty pattern list")
    frames: list[tuple[DataFrame, list[str], int]] = []
    order: list[str] = []  # variables in first-appearance order
    n_const: list[int] = []
    for i, pat in enumerate(patterns):
        df, names = _pattern_frame(triples, pat, cols, path_max_hops)
        frames.append((df, names, i))
        n_const.append(sum(1 for t in pat if not _is_var(t)))
        for n in names:
            if n not in order:
                order.append(n)

    # greedy join order: seed with the most-constant pattern, then always
    # extend with the remaining pattern sharing the most bound variables
    # (ties: more constants, then original index — deterministic)
    remaining = list(range(len(frames)))
    seed = max(remaining, key=lambda i: (n_const[i], -i))
    remaining.remove(seed)
    acc, bound, _ = frames[seed]
    bound = set(bound)
    while remaining:
        scored = [
            (len(bound & set(frames[i][1])), n_const[i], -i, i) for i in remaining
        ]
        shared, _, _, pick = max(scored)
        remaining.remove(pick)
        df, names, _ = frames[pick]
        if shared == 0 and not (bound == set() or not names):
            if not allow_product:
                raise ValueError(
                    f"pattern {patterns[pick]!r} shares no variable with the "
                    "patterns joined so far — a cartesian product; pass "
                    "allow_product=True if that is really the query"
                )
            acc = acc.crossJoin(df)
        elif not names:
            # existence gate: empty marker frame zeroes the result
            acc = acc.crossJoin(F.broadcast(df)).drop("__exists")
        else:
            on = sorted(bound & set(names))
            acc = acc.join(df, on=on) if on else acc.crossJoin(df)
        bound |= set(names)

    for pat in optional or []:
        df, names = _pattern_frame(triples, pat, cols, path_max_hops)
        if not names:
            raise ValueError(f"all-constant OPTIONAL pattern {pat!r} is meaningless")
        on = sorted(bound & set(names))
        if not on:
            raise ValueError(
                f"OPTIONAL pattern {pat!r} shares no variable with the "
                "required patterns — an unanchored optional is a product"
            )
        acc = acc.join(df, on=on, how="left")
        for n in names:
            if n not in order:
                order.append(n)
        bound |= set(names)

    if where is not None:
        acc = acc.filter(F.expr(where) if isinstance(where, str) else where)

    out_cols = select if select is not None else order
    missing = [c for c in out_cols if c not in bound]
    if missing:
        raise ValueError(f"select variables {missing} not bound by any pattern")
    acc = acc.select(*out_cols)
    return acc.distinct() if distinct else acc


# ---------------------------------------------------------------------------
# SPARQL-subset front end
# ---------------------------------------------------------------------------

_SELECT_RE = re.compile(
    r"^\s*SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<proj>\*|(?:\?\w+[\s,]*)+)"
    r"\s*WHERE\s*\{(?P<body>.*)\}\s*(?:LIMIT\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TERM_RE = re.compile(
    r"""\s*(?:(\?\w+)|<([^>]*)>|"([^"]*)"|'([^']*)'|([^\s.{}()]+))"""
)


def _read_term(body: str, pos: int) -> tuple[str, int]:
    m = _TERM_RE.match(body, pos)
    if not m:
        raise ValueError(f"expected a term at ...{body[pos:pos + 40]!r}")
    var_, iri, dq, sq, bare = m.groups()
    return var_ or iri or dq or sq or bare, m.end()


def _read_patterns(body: str, pos: int, stop: str) -> tuple[list, int]:
    """Parse `s p o .` triples until ``stop`` ('}' or end); returns
    (patterns, position AFTER the stop character)."""
    pats = []
    n = len(body)
    while True:
        while pos < n and body[pos].isspace():
            pos += 1
        if pos >= n:
            if stop == "}":
                raise ValueError("unterminated group: missing '}'")
            return pats, pos
        if body[pos] == stop:
            return pats, pos + 1
        s, pos = _read_term(body, pos)
        p, pos = _read_term(body, pos)
        o, pos = _read_term(body, pos)
        pats.append((s, p, o))
        while pos < n and body[pos].isspace():
            pos += 1
        if pos < n and body[pos] == ".":
            pos += 1
    return pats, pos


def parse_sparql(query: str) -> dict:
    """Parse the SPARQL-subset this engine executes: ``SELECT [DISTINCT]
    ?vars|* WHERE { triples . OPTIONAL { ... } FILTER (...) } [LIMIT n]``.

    Terms: ``?var``, ``<iri>`` (angle brackets stripped — the KG stores
    plain strings), quoted literals, or bare tokens; a predicate written
    ``p+`` is the bounded property path (:func:`transitive_pairs`).
    FILTER expressions are translated to Spark SQL (``?x`` -> column
    ``x``, ``&&``/``||`` -> AND/OR) and handed to ``F.expr`` — equality,
    comparison, and string functions that exist in both dialects work.

    Returns the kwargs dict for :func:`bgp_match` plus ``limit``."""
    m = _SELECT_RE.match(query)
    if not m:
        raise ValueError(
            "unsupported query shape: expected SELECT [DISTINCT] ?vars|* "
            "WHERE { ... } [LIMIT n]"
        )
    proj = m.group("proj").strip()
    select = None if proj == "*" else [
        v[1:] for v in re.findall(r"\?\w+", proj)
    ]
    body = m.group("body")
    patterns: list = []
    optional: list = []
    filters: list[str] = []
    pos, n = 0, len(body)
    kw = re.compile(r"(OPTIONAL|FILTER)\b", re.IGNORECASE)
    while pos < n:
        while pos < n and (body[pos].isspace() or body[pos] == "."):
            pos += 1
        if pos >= n:
            break
        km = kw.match(body, pos)
        if km and km.group(1).upper() == "OPTIONAL":
            pos = km.end()
            while pos < n and body[pos].isspace():
                pos += 1
            if pos >= n or body[pos] != "{":
                raise ValueError("OPTIONAL must be followed by { ... }")
            grp, pos = _read_patterns(body, pos + 1, "}")
            optional.extend(grp)
        elif km and km.group(1).upper() == "FILTER":
            pos = km.end()
            while pos < n and body[pos].isspace():
                pos += 1
            if pos >= n or body[pos] != "(":
                raise ValueError("FILTER must be followed by ( ... )")
            depth, start = 1, pos + 1
            pos += 1
            while pos < n and depth:
                if body[pos] == "(":
                    depth += 1
                elif body[pos] == ")":
                    depth -= 1
                pos += 1
            if depth:
                raise ValueError("unbalanced FILTER parentheses")
            expr = body[start:pos - 1]
            expr = re.sub(r"\?(\w+)", r"\1", expr)
            expr = expr.replace("&&", " AND ").replace("||", " OR ")
            filters.append(f"({expr})")
        else:
            s, pos = _read_term(body, pos)
            p, pos = _read_term(body, pos)
            o, pos = _read_term(body, pos)
            patterns.append((s, p, o))
    return {
        "patterns": patterns,
        "optional": optional or None,
        "where": " AND ".join(filters) if filters else None,
        "select": select,
        "distinct": bool(m.group("distinct")) or select is None,
        "limit": int(m.group("limit")) if m.group("limit") else None,
    }


def sparql_select(
    triples: DataFrame,
    query: str,
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    path_max_hops: int = 16,
    allow_product: bool = False,
) -> DataFrame:
    """Run a SPARQL-subset SELECT (see :func:`parse_sparql`) over the
    triples table — the string front end to :func:`bgp_match`, giving the
    engine the same read interface the reference consumed remotely.

    Note: plain SELECT (no DISTINCT) is executed with set semantics
    anyway when the projection is ``*`` (bag duplicates of full bindings
    are join artifacts, not information); an explicit variable list
    without DISTINCT keeps bag semantics like SPARQL."""
    q = parse_sparql(query)
    out = bgp_match(
        triples,
        q["patterns"],
        select=q["select"],
        distinct=q["distinct"],
        cols=cols,
        allow_product=allow_product,
        optional=q["optional"],
        where=q["where"],
        path_max_hops=path_max_hops,
    )
    return out.limit(q["limit"]) if q["limit"] else out
