"""Tiny-graph HTML renderer (S4 optional driver-side utility).

The north star replaces the reference's vis.js HTML output
(``visualization.py:325-351``) with Parquet node/edge tables; this
keeps a self-contained, dependency-free renderer for debugging SMALL
graphs: embeds the node/edge JSON plus a ~60-line vanilla-JS force
layout drawn on a canvas. Refuses graphs over ``max_edges`` — render
is a driver-side convenience, never a pipeline stage.
"""

from __future__ import annotations

import json

import ray.data

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>knowledge graph</title>
<style>body{margin:0;font-family:sans-serif}#c{display:block}</style></head>
<body><canvas id="c"></canvas>
<script>
const DATA = __DATA__;
const cv = document.getElementById('c'), cx = cv.getContext('2d');
const W = cv.width = window.innerWidth, H = cv.height = window.innerHeight;
const nodes = DATA.nodes.map((n,i)=>({...n, x: W/2+Math.cos(i)*200*Math.random(),
                                      y: H/2+Math.sin(i)*200*Math.random(), vx:0, vy:0}));
const idx = Object.fromEntries(nodes.map((n,i)=>[n.entity,i]));
const edges = DATA.edges.filter(e=>idx[e.src]!==undefined && idx[e.dst]!==undefined);
function tick(){
  for(const n of nodes){ n.vx += (W/2-n.x)*0.0005; n.vy += (H/2-n.y)*0.0005; }
  for(let i=0;i<nodes.length;i++) for(let j=i+1;j<nodes.length;j++){
    const a=nodes[i], b=nodes[j]; let dx=a.x-b.x, dy=a.y-b.y;
    const d2=dx*dx+dy*dy+0.01, f=800/d2; a.vx+=dx*f*0.01; a.vy+=dy*f*0.01;
    b.vx-=dx*f*0.01; b.vy-=dy*f*0.01; }
  for(const e of edges){ const a=nodes[idx[e.src]], b=nodes[idx[e.dst]];
    const dx=b.x-a.x, dy=b.y-a.y; a.vx+=dx*0.002; a.vy+=dy*0.002;
    b.vx-=dx*0.002; b.vy-=dy*0.002; }
  for(const n of nodes){ n.x+=n.vx*=0.85; n.y+=n.vy*=0.85; }
  cx.clearRect(0,0,W,H);
  cx.strokeStyle='#bbb';
  for(const e of edges){ cx.beginPath();
    cx.setLineDash(e.inferred ? [4,3] : []);
    cx.moveTo(nodes[idx[e.src]].x, nodes[idx[e.src]].y);
    cx.lineTo(nodes[idx[e.dst]].x, nodes[idx[e.dst]].y); cx.stroke(); }
  for(const n of nodes){
    cx.fillStyle = 'hsl(' + ((n.community||0)*53)%360 + ',60%,55%)';
    cx.beginPath(); cx.arc(n.x,n.y,(n.size||12)/2,0,7); cx.fill();
    cx.fillStyle='#222'; cx.font='10px sans-serif';
    cx.fillText(n.entity, n.x+6, n.y+3); }
  requestAnimationFrame(tick);
}
tick();
</script></body></html>
"""


def render_graph_html(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    output_file: str,
    *,
    max_edges: int = 2000,
) -> dict:
    """Write a self-contained HTML viewer for a small graph; returns
    the stats dict the reference's visualizer prints
    (``visualization.py:154-163`` shape)."""
    n_edges = edges.count()
    if n_edges > max_edges:
        raise ValueError(
            f"graph too large to render ({n_edges} edges > {max_edges}); "
            "use the Parquet nodes/edges tables instead"
        )
    node_rows = nodes.take_all()
    edge_rows = edges.select_columns(["src", "dst", "predicate", "inferred"]).take_all()
    payload = {"nodes": node_rows, "edges": edge_rows}
    html = _TEMPLATE.replace("__DATA__", json.dumps(payload))
    with open(output_file, "w", encoding="utf-8") as f:
        f.write(html)
    communities = {n.get("community", -1) for n in node_rows}
    return {
        "nodes": len(node_rows),
        "edges": len(edge_rows),
        "communities": len(communities),
    }
