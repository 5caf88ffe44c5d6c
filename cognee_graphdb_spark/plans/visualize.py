"""Graph visualization payload + HTML (reference api/v1/visualize/visualize.py
-> modules/visualization/cognee_network_visualization.py).

The reference pulls the WHOLE graph to the driver and renders an HTML file.
That is fine for a demo graph and fatal at 100 TB, so the Spark version makes
the bound explicit: take the top-``max_nodes`` nodes by degree (the hubs are
what a human looks at), induce their edge set (SO3), and only THEN collect —
the driver never holds more than the rendered sample.  The HTML itself is a
small self-contained canvas force layout written from scratch (no external
assets, works offline like the reference's output)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_sample(nodes: DataFrame, edges: DataFrame, max_nodes: int = 200) -> tuple[list[dict], list[dict]]:
    """Driver-side (nodes, links) payload bounded by degree-ranked sampling."""
    from cognee_graphdb_spark.operators.aggregations import node_degrees
    from cognee_graphdb_spark.operators.graph_joins import induced_edges

    deg = node_degrees(edges)
    top = (
        nodes.join(deg, "id", "left")
        .select("id", "name", "type", F.coalesce("degree", F.lit(0)).alias("degree"))
        .orderBy(F.desc("degree"), F.asc("id"))
        .limit(max_nodes)
        .localCheckpoint(eager=True)
    )
    e = induced_edges(edges, top.select("id"))
    node_rows = [r.asDict() for r in top.collect()]
    edge_rows = [
        {"source": r["src"], "target": r["dst"], "label": r["relationship_name"]}
        for r in e.collect()
    ]
    return node_rows, edge_rows


_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>graph</title>
<style>body{{margin:0;background:#111}}canvas{{display:block}}</style></head>
<body><canvas id="c"></canvas><script>
const nodes = {nodes};
const links = {links};
const W = innerWidth, H = innerHeight;
const cv = document.getElementById("c"); cv.width = W; cv.height = H;
const ctx = cv.getContext("2d");
const idx = Object.fromEntries(nodes.map((n,i)=>[n.id,i]));
nodes.forEach((n,i)=>{{n.x=W/2+Math.cos(i*2.4)*(60+i*2); n.y=H/2+Math.sin(i*2.4)*(60+i*2); n.vx=0; n.vy=0;}});
function tick(){{
  for (const l of links){{const a=nodes[idx[l.source]],b=nodes[idx[l.target]];
    if(!a||!b)continue; const dx=b.x-a.x,dy=b.y-a.y,d=Math.hypot(dx,dy)||1,f=(d-80)*0.002;
    a.vx+=f*dx/d;a.vy+=f*dy/d;b.vx-=f*dx/d;b.vy-=f*dy/d;}}
  for(let i=0;i<nodes.length;i++)for(let j=i+1;j<nodes.length;j++){{
    const a=nodes[i],b=nodes[j],dx=b.x-a.x,dy=b.y-a.y,d2=dx*dx+dy*dy||1,f=600/d2;
    const d=Math.sqrt(d2);a.vx-=f*dx/d;a.vy-=f*dy/d;b.vx+=f*dx/d;b.vy+=f*dy/d;}}
  for(const n of nodes){{n.vx*=.85;n.vy*=.85;n.x+=n.vx;n.y+=n.vy;}}
}}
function draw(){{
  ctx.clearRect(0,0,W,H); ctx.strokeStyle="#445"; ctx.fillStyle="#7af";
  for(const l of links){{const a=nodes[idx[l.source]],b=nodes[idx[l.target]];
    if(!a||!b)continue; ctx.beginPath();ctx.moveTo(a.x,a.y);ctx.lineTo(b.x,b.y);ctx.stroke();}}
  for(const n of nodes){{ctx.beginPath();ctx.arc(n.x,n.y,4+Math.min(n.degree,20)/4,0,7);ctx.fill();}}
  ctx.fillStyle="#ccc";ctx.font="10px sans-serif";
  for(const n of nodes.slice(0,40))ctx.fillText(n.name,n.x+6,n.y+3);
  ctx.fillStyle="#7af";
}}
let steps=0; (function loop(){{tick();draw();if(++steps<300)requestAnimationFrame(loop);}})();
</script></body></html>"""


def render_html(nodes: DataFrame, edges: DataFrame, max_nodes: int = 200) -> str:
    node_rows, edge_rows = graph_sample(nodes, edges, max_nodes)
    return _HTML.format(nodes=json.dumps(node_rows), links=json.dumps(edge_rows))


def visualize_graph(
    nodes: DataFrame,
    edges: DataFrame,
    destination_file_path: str | None = None,
    max_nodes: int = 200,
) -> str:
    """The visualize endpoint: returns the HTML (and writes it when a path is
    given, matching visualize_graph's signature)."""
    html = render_html(nodes, edges, max_nodes)
    if destination_file_path:
        with open(destination_file_path, "w") as f:
            f.write(html)
    return html
