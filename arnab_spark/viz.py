"""DAG visualization: DOT text → SVG (reference: src/graphviz.rs:11-41).

The reference renders DOT through layout-rs. Here we compute a layered
(Sugiyama-style) layout in pure Python and emit a small standalone SVG
by hand — no graphviz binary required:

1. longest-path layering (layer(n) = 1 + max over deps);
2. in-layer ordering by iterated barycenter sweeps (forward over dep
   positions, backward over dependent positions) — the classic
   crossing-reduction heuristic, so sibling chains land next to each
   other instead of interleaving;
3. layers are vertically centered against the tallest layer;
4. edges are cubic Béziers leaving the right edge of the source box and
   entering the left edge of the target box horizontally — long edges
   that skip layers curve around instead of slicing through boxes.

Output contract matches the reference CLI: ``arnab viz out.svg`` writes
an SVG file (``.svg`` auto-appended, reference: main.rs:63-84).
"""

from __future__ import annotations

import html


def _layers(nodes: dict[str, set[str]]) -> dict[str, int]:
    """Longest-path layering: layer(n) = 1 + max(layer(prevs))."""
    memo: dict[str, int] = {}

    def layer(n: str) -> int:
        if n not in memo:
            memo[n] = 0 if not nodes[n] else 1 + max(layer(p) for p in nodes[n])
        return memo[n]

    for n in nodes:
        layer(n)
    return memo


def _ordered_layers(prevs_by_id: dict[str, set[str]]) -> list[list[str]]:
    """Layered node lists after barycenter crossing-reduction sweeps."""
    layers = _layers(prevs_by_id)
    nexts: dict[str, set[str]] = {n: set() for n in prevs_by_id}
    for n, deps in prevs_by_id.items():
        for d in deps:
            nexts[d].add(n)
    n_layers = max(layers.values()) + 1
    by_layer: list[list[str]] = [[] for _ in range(n_layers)]
    for n in sorted(layers):  # deterministic seed order
        by_layer[layers[n]].append(n)

    def sweep(neigh: dict[str, set[str]], order: range) -> None:
        for li in order:
            # neighbor slots from their current layer orders (deps can
            # sit several layers back under longest-path layering)
            ref = {}
            for lj, names in enumerate(by_layer):
                if lj != li:
                    for i, n in enumerate(names):
                        ref[n] = i

            def bary(n: str) -> float:
                ps = [ref[m] for m in neigh[n] if m in ref]
                # keyless nodes keep their current slot (stable sort)
                return sum(ps) / len(ps) if ps else float(by_layer[li].index(n))

            by_layer[li] = sorted(by_layer[li], key=bary)

    # a few alternating sweeps converge on small DAGs (the reference's
    # model graphs are tens of nodes)
    for _ in range(3):
        sweep(prevs_by_id, range(1, n_layers))  # forward: order by deps
        sweep(nexts, range(n_layers - 2, -1, -1))  # backward: by dependents
    return by_layer


def render_svg(prevs_by_id: dict[str, set[str]]) -> str:
    """Render the model DAG as SVG. Left-to-right layers, boxes +
    Bézier arrows (visual contract of reference graphviz.rs)."""
    if not prevs_by_id:
        return '<svg xmlns="http://www.w3.org/2000/svg" width="10" height="10"/>'
    by_layer = _ordered_layers(prevs_by_id)

    box_w, box_h, gap_x, gap_y, pad = 180, 36, 80, 24, 20
    tallest = max(len(v) for v in by_layer)
    height = pad * 2 + tallest * (box_h + gap_y) - gap_y
    pos: dict[str, tuple[int, int]] = {}
    for l, names in enumerate(by_layer):
        col_h = len(names) * (box_h + gap_y) - gap_y
        y0 = pad + (height - 2 * pad - col_h) // 2  # center vs tallest
        for i, n in enumerate(names):
            pos[n] = (pad + l * (box_w + gap_x), y0 + i * (box_h + gap_y))
    width = pad * 2 + len(by_layer) * (box_w + gap_x) - gap_x

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'font-family="monospace" font-size="13">',
        "<defs><marker id='arrow' markerWidth='8' markerHeight='8' refX='8' refY='4' "
        "orient='auto'><path d='M0,0 L8,4 L0,8 z' fill='#555'/></marker></defs>",
    ]
    for n, deps in sorted(prevs_by_id.items()):
        x2, y2 = pos[n]
        for d in sorted(deps):
            x1, y1 = pos[d]
            sx, sy = x1 + box_w, y1 + box_h // 2
            ex, ey = x2, y2 + box_h // 2
            # horizontal tangents at both ends; control-point reach
            # grows with the span so layer-skipping edges arc wide
            reach = max((ex - sx) // 2, 30)
            parts.append(
                f"<path d='M{sx},{sy} C{sx + reach},{sy} {ex - reach},{ey} "
                f"{ex},{ey}' fill='none' stroke='#555' marker-end='url(#arrow)'/>"
            )
    for n, (x, y) in sorted(pos.items()):
        parts.append(
            f"<rect x='{x}' y='{y}' width='{box_w}' height='{box_h}' rx='6' "
            f"fill='#eef4ff' stroke='#345'/>"
            f"<text x='{x + box_w // 2}' y='{y + box_h // 2 + 5}' "
            f"text-anchor='middle'>{html.escape(n)}</text>"
        )
    parts.append("</svg>")
    return "\n".join(parts)


def save_visualization(session, out_path: str) -> str:
    """Build the graph and write DOT-derived SVG (reference:
    main.rs:63-84 appends '.svg' when missing)."""
    if not out_path.endswith(".svg"):
        out_path += ".svg"
    session.build_graph()
    svg = render_svg({nid: set(n.prevs) for nid, n in session.nodes.items()})
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(svg)
    return out_path
