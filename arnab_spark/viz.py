"""DAG visualization: DOT text → SVG (reference: src/graphviz.rs:11-41).

The reference renders DOT through layout-rs. Here: networkx (available)
computes a layered layout and we emit a small standalone SVG by hand —
no graphviz binary required. Output contract matches the reference CLI:
``arnab viz out.svg`` writes an SVG file (``.svg`` auto-appended,
reference: main.rs:63-84).
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


def render_svg(prevs_by_id: dict[str, set[str]]) -> str:
    """Render the model DAG as SVG. Left-to-right layers, boxes + arrows
    (visual contract of reference graphviz.rs)."""
    if not prevs_by_id:
        return '<svg xmlns="http://www.w3.org/2000/svg" width="10" height="10"/>'
    layers = _layers(prevs_by_id)
    by_layer: dict[int, list[str]] = {}
    for n, l in sorted(layers.items()):
        by_layer.setdefault(l, []).append(n)

    box_w, box_h, gap_x, gap_y, pad = 180, 36, 80, 24, 20
    pos: dict[str, tuple[int, int]] = {}
    for l, names in by_layer.items():
        for i, n in enumerate(names):
            pos[n] = (pad + l * (box_w + gap_x), pad + i * (box_h + gap_y))
    width = pad * 2 + (max(layers.values()) + 1) * (box_w + gap_x) - gap_x
    height = pad * 2 + max(len(v) for v in by_layer.values()) * (box_h + gap_y) - gap_y

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
            parts.append(
                f"<line x1='{x1 + box_w}' y1='{y1 + box_h // 2}' x2='{x2}' "
                f"y2='{y2 + box_h // 2}' stroke='#555' marker-end='url(#arrow)'/>"
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
