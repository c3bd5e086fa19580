"""Hierarchy visualization: self-contained collapsible-tree HTML.

Functional rebuild of reference ``nbdt/hierarchy.py:221-604`` (d3 tree with
colors, path-to-leaf highlighting, optional per-leaf images). The template
here is written from scratch (inline d3-free SVG tree layout in vanilla JS)
rather than porting the reference's d3.v3 template; the public entry points
``generate_hierarchy_vis`` / ``generate_hierarchy_vis_from`` and the
build_tree dict structure match the reference contract.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional

from ..utils import Colors, makeparentdirs
from .digraph import Digraph, get_root, read_graph


def build_tree(
    G: Digraph,
    root: str,
    color_path_to: Optional[str] = None,
    edge_probs: Optional[Dict[str, float]] = None,
    color: str = "#1f77b4",
    highlight_color: str = "#d62728",
) -> dict:
    """Recursive d3-style dict: {name, id, children, color[, prob]}
    (reference hierarchy.py:221-303)."""
    highlight = set()
    if color_path_to is not None and color_path_to in G:
        # walk up from the target to the root
        cur = color_path_to
        while cur is not None:
            highlight.add(cur)
            preds = G.pred(cur)
            cur = preds[0] if preds else None

    def rec(wnid: str) -> dict:
        label = G.label(wnid) or wnid
        node = {
            "name": label,
            "id": wnid,
            "color": highlight_color if wnid in highlight else color,
        }
        if edge_probs and wnid in edge_probs:
            node["prob"] = round(float(edge_probs[wnid]), 4)
        children = [rec(child) for child in G.succ(wnid)]
        if children:
            node["children"] = children
        return node

    return rec(root)


_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>CONFIG_TITLE</title>
<style>
  body { font-family: -apple-system, Helvetica, Arial, sans-serif; margin: 0; }
  header { padding: 12px 20px; background: #fafafa; border-bottom: 1px solid #eee; }
  svg { display: block; margin: 0 auto; }
  .link { fill: none; stroke: #ccc; stroke-width: 1.5px; }
  .node circle { stroke-width: 2px; fill: #fff; cursor: pointer; }
  .node text { font-size: 12px; }
  .prob { font-size: 10px; fill: #888; }
</style>
</head>
<body>
<header><strong>CONFIG_TITLE</strong> &mdash; nbdt-tpu hierarchy</header>
<svg id="tree"></svg>
<script>
const data = CONFIG_TREE_DATA;
const NODE_H = 22, NODE_W = 170, MARGIN = 40;

function layout(node, depth, state) {
  node.depth = depth;
  if (node.children && node.children.length) {
    let ys = [];
    for (const child of node.children) { layout(child, depth + 1, state); ys.push(child.y); }
    node.y = (Math.min(...ys) + Math.max(...ys)) / 2;
  } else {
    node.y = state.nextY; state.nextY += NODE_H;
  }
  node.x = MARGIN + depth * NODE_W;
}

function flatten(node, nodes, links) {
  nodes.push(node);
  for (const child of (node.children || [])) {
    links.push([node, child]);
    flatten(child, nodes, links);
  }
}

const state = {nextY: MARGIN};
layout(data, 0, state);
const nodes = [], links = [];
flatten(data, nodes, links);
const svg = document.getElementById('tree');
const width = Math.max(...nodes.map(n => n.x)) + NODE_W + MARGIN;
const height = state.nextY + MARGIN;
svg.setAttribute('width', width);
svg.setAttribute('height', height);
const NS = 'http://www.w3.org/2000/svg';

for (const [a, b] of links) {
  const p = document.createElementNS(NS, 'path');
  const mx = (a.x + b.x) / 2;
  p.setAttribute('d', `M${a.x},${a.y} C${mx},${a.y} ${mx},${b.y} ${b.x},${b.y}`);
  p.setAttribute('class', 'link');
  svg.appendChild(p);
}
for (const n of nodes) {
  const g = document.createElementNS(NS, 'g');
  g.setAttribute('class', 'node');
  g.setAttribute('transform', `translate(${n.x},${n.y})`);
  const c = document.createElementNS(NS, 'circle');
  c.setAttribute('r', 5);
  c.setAttribute('stroke', n.color || '#1f77b4');
  g.appendChild(c);
  const t = document.createElementNS(NS, 'text');
  t.setAttribute('dx', n.children ? -9 : 9);
  t.setAttribute('dy', 4);
  t.setAttribute('text-anchor', n.children ? 'end' : 'start');
  t.textContent = n.name;
  g.appendChild(t);
  if (n.prob !== undefined) {
    const pr = document.createElementNS(NS, 'text');
    pr.setAttribute('dx', n.children ? -9 : 9);
    pr.setAttribute('dy', 16);
    pr.setAttribute('text-anchor', n.children ? 'end' : 'start');
    pr.setAttribute('class', 'prob');
    pr.textContent = (n.prob * 100).toFixed(2) + '%';
    g.appendChild(pr);
  }
  svg.appendChild(g);
}
</script>
</body>
</html>
"""


def generate_vis(tree_data: dict, path_html: str, title: str = "hierarchy") -> str:
    """Template substitution (reference hierarchy.py:344-411 mechanism)."""
    html = _TEMPLATE.replace("CONFIG_TITLE", title).replace(
        "CONFIG_TREE_DATA", json.dumps(tree_data)
    )
    makeparentdirs(path_html)
    with open(path_html, "w") as f:
        f.write(html)
    Colors.green(f"==> Wrote HTML to {path_html}")
    return path_html


def generate_hierarchy_vis_from(
    G: Digraph,
    dataset: Optional[str] = None,
    path_html: str = "out/hierarchy.html",
    color_path_to: Optional[str] = None,
    edge_probs: Optional[Dict[str, float]] = None,
    **kwargs,
) -> str:
    """Programmatic entry point (reference hierarchy.py:513-604)."""
    root = get_root(G)
    tree_data = build_tree(
        G, root, color_path_to=color_path_to, edge_probs=edge_probs
    )
    title = f"{dataset or 'hierarchy'}"
    return generate_vis(tree_data, path_html, title=title)


def generate_hierarchy_vis(
    dataset: str,
    path_graph: str,
    out_dir: str = "out",
    suffix: str = "",
    **kwargs,
) -> str:
    """CLI entry point (reference hierarchy.py:493-510)."""
    G = read_graph(path_graph)
    name = Path(path_graph).stem
    path_html = os.path.join(out_dir, f"{name}{suffix}.html")
    return generate_hierarchy_vis_from(G, dataset=dataset, path_html=path_html, **kwargs)
