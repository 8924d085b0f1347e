"""Reference response shaping — the nested result tree.

The reference serializes query results as a tree: each pivot level is
a list of ``{"g": group_value, "c": [counts...], "_": [children]}``
nodes (src/result.cpp resultSetToJson; see README example responses).

A rollup DataFrame carries exactly the data of such a tree (every
prefix-grouping level); ``to_result_tree`` reassembles the nesting.
This is driver-side BY DESIGN: it runs on a final aggregated result
(thousands of rows, not the 100 TB input) — the same place the
reference's partition-merge step runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_result_tree(
    rollup_df: DataFrame,
    group_cols: list[str],
    agg_cols: list[str],
    trim: int | None = None,
) -> dict:
    """Rollup output -> ``{"_": [...]}`` nested nodes.

    ``rollup_df`` must come from ``event_aggregate_rollup`` (or any
    rollup over ``group_cols``): rows where a group column is null are
    the subtotal nodes for the shorter prefix. Node order: children
    sorted by group value (the reference sorts via explicit params —
    apply orderBy upstream to override)."""
    rows = rollup_df.collect()

    def node_of(row) -> dict:
        return {"c": [row[a] for a in agg_cols]}

    root: dict = {}
    children: dict[tuple, list] = {}
    nodes: dict[tuple, dict] = {}
    for row in rows:
        # depth = number of leading non-null group values
        key = []
        for g in group_cols:
            if row[g] is None:
                break
            key.append(row[g])
        depth = len(key)
        # a row is the subtotal for its prefix only if ALL deeper
        # group cols are null
        if any(row[g] is not None for g in group_cols[depth:]):
            continue
        n = node_of(row)
        if depth == 0:
            root = n
        else:
            n["g"] = key[-1]
            nodes[tuple(key)] = n
            children.setdefault(tuple(key[:-1]), []).append(n)
    for key, kids in children.items():
        kids.sort(key=lambda n: (n["g"] is None, str(n["g"])))
        if trim is not None:
            # REST `trim=#` (docs/rest/README.md:232): clip long
            # branches to the top-# nodes by first count — parent
            # subtotal nodes keep the FULL branch totals (they come
            # from the rollup, not from summing the clipped children)
            kids = sorted(
                kids,
                key=lambda n: (
                    n["c"][0] is not None,
                    n["c"][0] if n["c"][0] is not None else 0,
                ),
                reverse=True,
            )[:trim]
            kids.sort(key=lambda n: (n["g"] is None, str(n["g"])))
        if key == ():
            root["_"] = kids
        elif key in nodes:
            nodes[key]["_"] = kids
    return root
