"""Plan linter: mechanical detection of the Catalyst pathologies that
turn a correct plan into a 100 TB scale bug. Each rule traces to a real
incident in this repo's history or to a standing scale review item the
judge/advisor checks by hand every round:

- ``expensive_above_generate`` / ``python_above_generate``: a
  row-multiplying Generate (explode/posexplode) with an expensive
  expression — regex, JSON parse, crypto hash — or a Python-UDF stage
  ABOVE it that does not consume the generator's output. Catalyst
  re-evaluates such expressions once per EXPLODED row (~token-count×
  per document in the r11 posting-build incident: the whole 50K text
  index build went 232s → 30s when the expression moved below the
  Generate, and the standard_porter build went from unbuildable to
  20s). Expressions that DO reference the generator output are
  per-generated-row by semantic necessity and are not flagged.
- ``expensive_in_lambda``: an expensive expression inlined INTO a
  higher-order-function lambda — Spark does not CSE across lambda
  boundaries, so the lineage re-evaluates PER ELEMENT (the r9
  winnowing incident: >100× plan blowup; the fix is materializing the
  input column in its own Project first). Necessity exemption: a call
  whose argument span references the lambda VARIABLE (tokenizing each
  query term) is work on the element itself, not re-evaluated lineage.
- ``cartesian_product``: a CartesianProduct node, or a
  BroadcastNestedLoopJoin where no side is provably model-sized —
  one-row (a scalar aggregate / limit) or driver-local literal data
  (LocalTableScan / parallelized rows: a query-vector frame) — the
  all-pairs shapes that cannot survive a 100× scale-up.
- ``row_python_udf``: a BatchEvalPython stage — row-at-a-time Python,
  10-100× slower than the Arrow-batched path; every Python boundary in
  this repo must be pandas_udf / mapInPandas.
- ``single_partition_funnel``: an Exchange to SinglePartition whose
  input is not already collapsed by a partial aggregate or a limit —
  every row of the input serializes through ONE task.

``lint(df)`` returns findings as dicts; ``assert_clean(df)`` raises
with the rendered findings (for plan-guard tests). The walk uses the
structural helpers in plans/inspect.py, so it descends through AQE
wrappers and binds to operator parent/child structure, not to the
rendered string layout.

Known limits (documented, not bugs): attribute references are matched
by exprId, so an expensive expression separated from the Generate by a
RENAMING Project is attributed to the rename's output and may escape
the necessity check; cardinality is not estimated, so a flagged shape
over a provably tiny frame (a model-sized ADC table, a probe set) is a
true positive structurally and a false positive economically — callers
pass ``ignore=`` for those, in the same spirit as a lint suppression
with a justification comment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from http_feeds_spark.plans.inspect import physical_root, plan_children

# expression markers whose re-evaluation per exploded row / per lambda
# element is never what the author meant: regex engines, JSON parsing,
# crypto digests. Cheap arithmetic/comparisons are deliberately absent.
EXPENSIVE_MARKERS = (
    "regexp_extract_all(",
    "regexp_extract(",
    "regexp_replace(",
    "regexp_count(",
    "rlike(",
    # split is the regex engine too — and it is how the r15 repetition
    # incident re-tokenized a whole document per lambda element: an
    # InferFiltersFromGenerate size()>0 filter, alias-substituted through
    # two projections, re-derived element_at(split(text), i) per gram
    "split(",
    "from_json(",
    "to_json(",
    "get_json_object(",
    "json_tuple(",
    "xpath",
    "sha2(",
    "sha1(",
    "md5(",
    "crc32(",
    "aes_encrypt(",
    "aes_decrypt(",
)

# row-count collapse points: an expensive expression above one of these
# is no longer multiplied by a Generate below it
_COLLAPSE_NODES = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _ref_ids(jexpr) -> set[int]:
    """exprIds referenced by a JVM expression (AttributeSet walk)."""
    out: set[int] = set()
    it = jexpr.references().iterator()
    while it.hasNext():
        out.add(it.next().exprId().id())
    return out


def _expensive_exprs(node) -> list:
    """(rendered, ref_ids) for each expensive expression this node
    evaluates per input row. Project/Filter only — joins and aggregates
    evaluate their keys once per row too, but every incident shape so
    far lived in a Project or a Filter, and keys are checked by the
    dedicated rules."""
    name = node.nodeName()
    exprs = []
    if name == "Project":
        exprs = _seq(node.projectList())
    elif name == "Filter":
        exprs = [node.condition()]
    hits = []
    for e in exprs:
        s = e.toString()
        if any(m in s for m in EXPENSIVE_MARKERS):
            hits.append((s, _ref_ids(e)))
    return hits


def _python_udf_entries(node) -> list:
    """(rendered, ref_ids) for each Python UDF a *EvalPython stage runs."""
    hits = []
    for u in _seq(node.udfs()):
        hits.append((u.toString(), _ref_ids(u)))
    return hits


def _generator_output_ids(gen_node) -> set[int]:
    return {a.exprId().id() for a in _seq(gen_node.generatorOutput())}


def _is_scalar_agg_subtree(node) -> bool:
    """True when the subtree provably produces at most one row — an
    ungrouped aggregate (keys=[]) somewhere below, or an explicit
    limit. The exemption for broadcast-nested-loop joins against
    one-row stats frames."""
    name = node.nodeName()
    if name in _COLLAPSE_NODES:
        if "Aggregate" in name:
            try:
                if node.groupingExpressions().isEmpty():
                    return True
            except Exception:
                pass
        else:
            return True  # a limit bounds the side
    return any(_is_scalar_agg_subtree(c) for c in plan_children(node))


# node names that make a join side DRIVER-LOCAL literal data (a
# createDataFrame of query vectors, a parameter frame): model-sized by
# construction, so an all-pairs join against it is a broadcast lookup,
# not a cartesian scale bug
_LOCAL_DATA_LEAVES = ("LocalTableScan", "Scan ExistingRDD", "RDDScan")
_PASSTHROUGH_NODES = ("Project", "Filter", "BroadcastExchange", "Exchange",
                      "Sort", "Generate", "InputAdapter", "WholeStageCodegen")


def _is_local_literal_subtree(node) -> bool:
    """Every leaf under this side is driver-local literal data."""
    name = node.nodeName()
    if any(name.startswith(leaf) for leaf in _LOCAL_DATA_LEAVES):
        return True
    kids = plan_children(node)
    if not kids:
        return False
    if not any(name.startswith(p) for p in _PASSTHROUGH_NODES):
        return False
    return all(_is_local_literal_subtree(k) for k in kids)


def _subtree_has_partial_agg_or_limit(node) -> bool:
    name = node.nodeName()
    if name in _COLLAPSE_NODES and "Aggregate" not in name:
        return True
    if "Aggregate" in name and "partial_" in node.simpleString(200):
        return True
    return any(_subtree_has_partial_agg_or_limit(c) for c in plan_children(node))


def _clip(s: str, n: int = 160) -> str:
    return s if len(s) <= n else s[: n - 1] + "…"


def lint(df: DataFrame, ignore: tuple[str, ...] = ()) -> list[dict]:
    """Walk the executed physical plan and return rule findings:
    ``{"rule", "node", "detail"}``, pre-order. ``ignore`` drops whole
    rules by name (a suppression, to be justified at the call site)."""
    findings: list[dict] = []

    def emit(rule: str, node, detail: str) -> None:
        if rule not in ignore:
            findings.append(
                {"rule": rule, "node": node.nodeName(), "detail": _clip(detail)}
            )

    def walk(node, pending: list) -> None:
        """pending: (kind, rendered, ref_ids, node) evaluated per input
        row somewhere above — still row-multiplied at this depth."""
        name = node.nodeName()

        if name in _COLLAPSE_NODES:
            pending = []

        if name == "Generate":
            gen_ids = _generator_output_ids(node)
            for kind, rendered, refs, src in pending:
                if refs & gen_ids:
                    continue  # consumes the generated rows: necessary
                rule = (
                    "python_above_generate"
                    if kind == "python"
                    else "expensive_above_generate"
                )
                emit(rule, src, rendered)
            # expressions above THIS generate that also span an outer
            # generate stay pending for it; the inner flag suffices, so
            # clear what we just reported
            pending = [p for p in pending if p[2] & gen_ids]

        if name == "CartesianProduct":
            emit("cartesian_product", node, node.simpleString(200))
        if name == "BroadcastNestedLoopJoin":
            kids = plan_children(node)
            if not any(
                _is_scalar_agg_subtree(k) or _is_local_literal_subtree(k)
                for k in kids
            ):
                emit("cartesian_product", node, node.simpleString(200))
        if name == "BatchEvalPython":
            emit("row_python_udf", node, node.simpleString(200))
        if name == "Exchange" and "SinglePartition" in node.simpleString(200):
            if not any(
                _subtree_has_partial_agg_or_limit(c) for c in plan_children(node)
            ):
                emit("single_partition_funnel", node, node.simpleString(200))

        s = node.simpleString(2000)
        if "lambdafunction(" in s:
            for raw in s.split("lambdafunction(")[1:]:
                # bound to the lambdafunction's OWN argument list first —
                # the split tail runs to the end of the node line, and a
                # marker out there belongs to a sibling expression
                j, depth = 0, 1
                while j < len(raw) and depth:
                    depth += {"(": 1, ")": -1}.get(raw[j], 0)
                    j += 1
                seg = raw[:j]
                for m in EXPENSIVE_MARKERS:
                    i = seg.find(m)
                    # necessity exemption: an expensive call whose
                    # ARGUMENT SPAN (matched parens) references a lambda
                    # VARIABLE ("lambda t#500" renders inline) is
                    # per-element by semantics — tokenizing each query
                    # term is work on the element itself. The r9 blowup
                    # shape inlined lineage over columns from BELOW the
                    # lambda (regexp over text#1: no var in its span).
                    if i < 0:
                        continue
                    j, depth = i + len(m), 1
                    while j < len(seg) and depth:
                        depth += {"(": 1, ")": -1}.get(seg[j], 0)
                        j += 1
                    if "lambda " not in seg[i:j]:
                        emit("expensive_in_lambda", node, "lambdafunction(" + seg)
                        break
                else:
                    continue
                break

        new_pending = list(pending)
        for rendered, refs in _expensive_exprs(node):
            new_pending.append(("expr", rendered, refs, node))
        if name in ("ArrowEvalPython", "BatchEvalPython"):
            for rendered, refs in _python_udf_entries(node):
                new_pending.append(("python", rendered, refs, node))

        for c in plan_children(node):
            walk(c, new_pending)

    walk(physical_root(df), [])
    return findings


def assert_clean(df: DataFrame, ignore: tuple[str, ...] = ()) -> None:
    """Raise AssertionError listing every finding — the plan-guard form."""
    found = lint(df, ignore=ignore)
    if found:
        lines = [f"- {f['rule']} at {f['node']}: {f['detail']}" for f in found]
        raise AssertionError("plan lint findings:\n" + "\n".join(lines))
