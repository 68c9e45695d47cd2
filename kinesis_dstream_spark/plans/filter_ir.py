"""Compiler: the reference's JSON query IR -> Spark DataFrame plan.

The reference's only query language is the search payload it POSTs to the
remote API (reference ``app/hs_contacts.py:61-81``, SURVEY §1.2):

    { "filterGroups": [ { "filters": [
          {"propertyName": p, "operator": OP, "value": v, "highValue": v2}
      ] } ],
      "properties": [...],      # projection
      "sorts": [...],           # ORDER BY (public API field; unused by ref)
      "limit": n,               # page size
      "after": cursor }         # pagination offset

Semantics (public HubSpot CRM v3 Search contract, observed in the
reference): filters within one group are ANDed, groups are ORed;
``properties`` is a projection; ``limit`` + ``after`` page through a
total order. The reference hardcodes one group with a BETWEEN conjunct
on the last-modified time plus a HAS_PROPERTY existence check.

This module treats that JSON as what it is — a serialized logical plan —
and compiles it onto a DataFrame: OR-of-AND ``filter``, ``select``,
``orderBy``, ``offset``+``limit``. Because every piece is declarative,
Catalyst pushes the compiled conjuncts and the pruned column set into
the parquet scan (verified in tests/test_filter_ir.py), recovering
server-side the same architectural optimization the reference got by
shipping the filter to the remote API (SURVEY §4).

Scale notes (100 TB): the compiled plan is scan-side work only — no
shuffle unless a sort is requested, and a sorted ``limit`` compiles to
TakeOrderedAndProject (per-partition top-n; only n rows cross the wire).

Time encoding: the reference serializes event-time values as epoch-ms
strings (``app/hs_contacts.py:44-48,68-69``). Pass the event-time column
names in ``time_columns`` and the compiler converts those literals with
``timestamp_millis``; all other values are plain literals.
"""

from __future__ import annotations

import re
from collections.abc import Iterable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Public HubSpot v3 Search operator set; the reference itself uses only
# BETWEEN (app/hs_contacts.py:65-70) and HAS_PROPERTY (:71-74).
SUPPORTED_OPERATORS = frozenset(
    {
        "EQ",
        "NEQ",
        "LT",
        "LTE",
        "GT",
        "GTE",
        "BETWEEN",
        "IN",
        "NOT_IN",
        "HAS_PROPERTY",
        "NOT_HAS_PROPERTY",
        "CONTAINS_TOKEN",
        "NOT_CONTAINS_TOKEN",
    }
)


def _literal(value, is_time: bool) -> Column:
    """A filter literal; epoch-ms strings become timestamps on time columns."""
    if is_time:
        return F.timestamp_millis(F.lit(int(value)).cast("long"))
    return F.lit(value)


def _token_regex(token: str) -> str:
    """Whole-token containment: token bounded by start/end/whitespace."""
    return rf"(^|\s){re.escape(str(token))}(\s|$)"


def compile_filter(flt: dict, time_columns: Iterable[str] = ()) -> Column:
    """One ``filters[]`` entry -> a boolean Column."""
    prop = flt["propertyName"]
    op = flt["operator"]
    if op not in SUPPORTED_OPERATORS:
        raise ValueError(f"unsupported filter operator {op!r}")
    col = F.col(prop)
    is_time = prop in set(time_columns)
    if op == "HAS_PROPERTY":
        return col.isNotNull()
    if op == "NOT_HAS_PROPERTY":
        return col.isNull()
    if op == "BETWEEN":
        # closed-closed, exactly like the reference (app/hs_contacts.py:67-69)
        return col.between(
            _literal(flt["value"], is_time), _literal(flt["highValue"], is_time)
        )
    if op in ("IN", "NOT_IN"):
        values = list(flt["values"])
        if is_time:
            # isin() takes plain values, not Columns, so epoch-ms strings
            # would be cast to timestamp as NULL and match nothing —
            # convert through _literal and OR the equalities instead.
            pred = reduce(
                Column.__or__, [col == _literal(v, True) for v in values]
            ) if values else F.lit(False)
        else:
            pred = col.isin(values) if values else F.lit(False)
        return ~pred if op == "NOT_IN" else pred
    if op == "CONTAINS_TOKEN":
        return col.rlike(_token_regex(flt["value"]))
    if op == "NOT_CONTAINS_TOKEN":
        return ~col.rlike(_token_regex(flt["value"]))
    value = _literal(flt["value"], is_time)
    return {
        "EQ": col == value,
        "NEQ": col != value,
        "LT": col < value,
        "LTE": col <= value,
        "GT": col > value,
        "GTE": col >= value,
    }[op]


def compile_filter_groups(
    filter_groups: list[dict], time_columns: Iterable[str] = ()
) -> Column | None:
    """OR-of-AND over ``filterGroups`` (SURVEY O-4; groups OR, filters AND)."""
    group_preds = []
    for group in filter_groups:
        conjuncts = [compile_filter(f, time_columns) for f in group.get("filters", [])]
        if not conjuncts:
            continue
        pred = conjuncts[0]
        for c in conjuncts[1:]:
            pred = pred & c
        group_preds.append(pred)
    if not group_preds:
        return None
    out = group_preds[0]
    for p in group_preds[1:]:
        out = out | p
    return out


def compile_payload(
    df: DataFrame, payload: dict, time_columns: Iterable[str] = ()
) -> DataFrame:
    """Full payload -> DataFrame plan: filter, project, sort, paginate.

    ``after`` (the reference's pagination cursor, app/hs_contacts.py:80,
    115-116) compiles to ``offset``; together with ``limit`` this is one
    page of the sorted result — the batch meaning of the cursor loop.
    """
    pred = compile_filter_groups(payload.get("filterGroups", []), time_columns)
    if pred is not None:
        df = df.filter(pred)
    sorts = payload.get("sorts", [])
    if sorts:
        df = df.orderBy(
            *[
                F.col(s["propertyName"]).desc()
                if str(s.get("direction", "ASCENDING")).upper() == "DESCENDING"
                else F.col(s["propertyName"]).asc()
                for s in sorts
            ]
        )
    after = payload.get("after")
    if after is not None:
        df = df.offset(int(after))
    limit = payload.get("limit")
    if limit is not None:
        df = df.limit(int(limit))
    props = payload.get("properties")
    if props:
        df = df.select(*props)
    return df


def contacts_poll_payload(
    lo_ms: int,
    hi_ms: int,
    time_column: str = "ts",
    existence_column: str = "props",
    properties: list[str] | None = None,
) -> dict:
    """The reference's contacts payload shape (app/hs_contacts.py:61-81),
    parameterized: event-time BETWEEN (epoch-ms strings, closed-closed)
    AND a HAS_PROPERTY existence check, plus the projection list."""
    return {
        "filterGroups": [
            {
                "filters": [
                    {
                        "propertyName": time_column,
                        "operator": "BETWEEN",
                        "value": str(lo_ms),
                        "highValue": str(hi_ms),
                    },
                    {"propertyName": existence_column, "operator": "HAS_PROPERTY"},
                ]
            }
        ],
        "properties": properties or ["event_id", "ts", "user_id", "event_type"],
    }
