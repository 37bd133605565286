"""Dependency DAG over assignment targets + topological leveling.

Mirrors the reference's scheduling semantics
(``/root/reference/fame2pygen/fame2py_converter.py:40-93``): edges run
ref→target, self-references are ignored, Kahn's algorithm produces
parallel levels, and any cycle leftovers are appended as a final level
rather than rejected.

This is driver-side planning only — at execution each level becomes one
batched ``withColumns`` projection, which Catalyst collapses; the DAG
never touches executors.
"""

from __future__ import annotations

from collections import defaultdict, deque


def build_dependency_levels(
    nodes: list[str], edges: dict[str, set[str]]
) -> list[list[str]]:
    """Topologically level *nodes* given dependency *edges*.

    Args:
        nodes: all assignment targets (lowercase), in first-seen order.
        edges: mapping dep → set(targets that consume dep).

    Returns:
        List of levels; each level is sorted for determinism.  Nodes
        stuck in cycles are appended as one final level.
    """
    in_degree: dict[str, int] = {n: 0 for n in nodes}
    adj: dict[str, list[str]] = defaultdict(list)
    for dep, consumers in edges.items():
        if dep not in in_degree:
            continue
        for consumer in sorted(consumers):
            if consumer in in_degree:
                adj[dep].append(consumer)
                in_degree[consumer] += 1

    levels: list[list[str]] = []
    queue = deque(sorted(n for n, d in in_degree.items() if d == 0))
    placed = 0
    while queue:
        level = sorted(queue)
        levels.append(level)
        placed += len(level)
        queue.clear()
        for node in level:
            for consumer in adj[node]:
                in_degree[consumer] -= 1
                if in_degree[consumer] == 0:
                    queue.append(consumer)

    if placed != len(nodes):
        leftovers = [n for n, d in in_degree.items() if d > 0]
        if leftovers:
            levels.append(sorted(leftovers))
    return levels
