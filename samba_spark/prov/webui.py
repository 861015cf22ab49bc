"""Minimal HTML frontend over the provenance REST API.

The reference ships browser views on top of its REST routes
(``SAMbA/WebApplication/src/main/resources/templates/index.html`` +
``static/js/{details,task,fullgraph}.js``: execution list → task DAG →
element-graph drill-down). This module serves the same navigation as ONE
self-contained static page — stdlib only, no build step, no external
assets — rendered client-side from the existing JSON routes
(prov/webapi.py). Clean-room: the page below shares no markup, script,
or asset with the reference tree; it consumes this repo's own API.

Views (hash-routed):

* ``#/``                 — execution list (/api/execution/list)
* ``#/run/<id>``         — task DAG for a run (/api/task/graph/<id>),
                           drawn as a layered SVG from the dep edges,
                           each node linking to its task view
* ``#/task/<id>/<task>`` — task info + the task's element subgraph
                           (/api/task/info, /api/dataelement/graphOfTask)
* ``#/elements/<id>``    — full element graph, table form
                           (/api/dataelement/graph/<id>)
* ``#/files/<id>``       — repository file tree (+ download links)
                           (/api/dataelement/repositoryFileTree)
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>samba_spark provenance</title>
<style>
 body { font: 14px/1.45 system-ui, sans-serif; margin: 0; color: #1a2733; }
 header { background: #1f3a52; color: #fff; padding: 10px 16px; }
 header a { color: #9fd0ff; text-decoration: none; margin-right: 14px; }
 main { padding: 16px; max-width: 1100px; }
 table { border-collapse: collapse; width: 100%; margin: 8px 0 20px; }
 th, td { border: 1px solid #cdd7e0; padding: 5px 8px; text-align: left; }
 th { background: #eef3f7; }
 tr:nth-child(even) td { background: #f7fafc; }
 a { color: #135a9e; }
 .crumb { color: #5b6b7a; margin-bottom: 10px; }
 svg { border: 1px solid #cdd7e0; background: #fff; }
 .node rect { fill: #e8f1fa; stroke: #135a9e; rx: 4; }
 .node text { font-size: 12px; }
 .edge { stroke: #8aa4bb; fill: none; marker-end: url(#arr); }
 code { background: #eef3f7; padding: 1px 4px; border-radius: 3px; }
 .err { color: #a02020; }
</style>
</head>
<body>
<header>
 <strong>samba_spark provenance</strong>
 <a href="#/">executions</a>
</header>
<main id="view">loading…</main>
<script>
"use strict";
const view = document.getElementById("view");
const esc = s => String(s ?? "").replace(/[&<>"]/g,
  c => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;"}[c]));
async function j(url) {
  const r = await fetch(url);
  const body = await r.json();
  if (!r.ok) throw new Error(body.error || r.status);
  return body;
}
function table(rows, cols, cell) {
  if (!rows.length) return "<p><em>none</em></p>";
  let h = "<table><tr>" + cols.map(c => `<th>${esc(c)}</th>`).join("") + "</tr>";
  for (const row of rows)
    h += "<tr>" + cols.map(c => `<td>${cell ? cell(row, c) : esc(row[c])}</td>`).join("") + "</tr>";
  return h + "</table>";
}
function fmtTs(v) {
  return v == null ? "" : new Date(v * 1000).toISOString().replace("T", " ").slice(0, 19);
}

async function showList() {
  const runs = await j("/api/execution/list");
  view.innerHTML = "<h2>Executions</h2>" + table(runs,
    ["run_id", "name", "start_time", "end_time"],
    (r, c) => c === "run_id"
      ? `<a href="#/run/${esc(r.run_id)}">${esc(r.run_id)}</a>`
      : c.endsWith("_time") ? esc(fmtTs(r[c])) : esc(r[c]));
}

// Layered DAG layout: longest-path layering from the dep edges, then a
// simple per-layer horizontal spread. Good enough for pipeline-shaped
// task graphs; the JSON stays the source of truth for anything bigger.
function layout(nodes, edges) {
  const depth = {}, parents = {};
  for (const n of nodes) { depth[n.id] = 0; parents[n.id] = []; }
  for (const e of edges) parents[e.target] = (parents[e.target] || []).concat(e.source);
  let changed = true, guard = 0;
  while (changed && guard++ < nodes.length + 1) {
    changed = false;
    for (const e of edges) {
      if (depth[e.target] < depth[e.source] + 1) {
        depth[e.target] = depth[e.source] + 1; changed = true;
      }
    }
  }
  const layers = {};
  for (const n of nodes) (layers[depth[n.id]] = layers[depth[n.id]] || []).push(n);
  const pos = {};
  const W = 190, H = 70;
  for (const [d, ns] of Object.entries(layers))
    ns.forEach((n, i) => { pos[n.id] = { x: 30 + i * W, y: 30 + d * H }; });
  return pos;
}
function dagSvg(nodes, edges, href) {
  if (!nodes.length) return "<p><em>no tasks recorded for this run</em></p>";
  const pos = layout(nodes, edges);
  const xs = Object.values(pos);
  const w = Math.max(...xs.map(p => p.x)) + 210, h = Math.max(...xs.map(p => p.y)) + 70;
  let s = `<svg width="${w}" height="${h}">` +
    `<defs><marker id="arr" markerWidth="8" markerHeight="8" refX="7" refY="3" orient="auto">` +
    `<path d="M0,0 L7,3 L0,6 z" fill="#8aa4bb"/></marker></defs>`;
  for (const e of edges) {
    const a = pos[e.source], b = pos[e.target];
    if (a && b) s += `<line class="edge" x1="${a.x + 80}" y1="${a.y + 34}" x2="${b.x + 80}" y2="${b.y}"/>`;
  }
  for (const n of nodes) {
    const p = pos[n.id];
    s += `<g class="node"><a href="${href(n)}">` +
      `<rect x="${p.x}" y="${p.y}" width="160" height="34"/>` +
      `<text x="${p.x + 8}" y="${p.y + 21}">${esc(n.label || n.id)}</text></a></g>`;
  }
  return s + "</svg>";
}

async function showRun(runId) {
  const g = await j(`/api/task/graph/${encodeURIComponent(runId)}`);
  const nodes = g.nodes.map(n => ({
    id: n.id,
    label: `${n.transformation_type || ""} ${n.description || ""}`.trim() || n.id,
  }));
  view.innerHTML =
    `<div class="crumb"><a href="#/">executions</a> / run</div>` +
    `<h2>Run <code>${esc(runId)}</code></h2>` +
    `<p><a href="#/elements/${esc(runId)}">element graph</a> · ` +
    `<a href="#/files/${esc(runId)}">repository files</a></p>` +
    dagSvg(nodes, g.edges, n => `#/task/${esc(runId)}/${esc(n.id)}`) +
    "<h3>Tasks</h3>" + table(g.nodes,
      Object.keys(g.nodes[0] || { id: 1 }),
      (r, c) => c === "id"
        ? `<a href="#/task/${esc(runId)}/${esc(r.id)}">${esc(r.id)}</a>`
        : esc(typeof r[c] === "object" ? JSON.stringify(r[c]) : r[c]));
}

async function showTask(runId, taskId) {
  const info = await j(`/api/task/info/${encodeURIComponent(runId)}?taskID=${encodeURIComponent(taskId)}`);
  let elems = "";
  try {
    const g = await j(`/api/dataelement/graphOfTask/${encodeURIComponent(runId)}?taskID=${encodeURIComponent(taskId)}&direction=up`);
    elems = "<h3>Elements produced</h3>" +
      table((g.produced || []).map(id => ({ element: id })), ["element"]) +
      "<h3>Elements consumed (upstream)</h3>" +
      table((g.consumed || []).map(id => ({ element: id })), ["element"]);
  } catch (e) { elems = `<p class="err">element subgraph: ${esc(e.message)}</p>`; }
  view.innerHTML =
    `<div class="crumb"><a href="#/">executions</a> / <a href="#/run/${esc(runId)}">run</a> / task</div>` +
    `<h2>Task <code>${esc(taskId)}</code></h2>` +
    `<pre>${esc(JSON.stringify(info, null, 2))}</pre>` + elems;
}

async function showElements(runId) {
  const g = await j(`/api/dataelement/graph/${encodeURIComponent(runId)}`);
  view.innerHTML =
    `<div class="crumb"><a href="#/">executions</a> / <a href="#/run/${esc(runId)}">run</a> / elements</div>` +
    `<h2>Element graph</h2>` +
    `<h3>${g.nodes.length} elements</h3>` +
    table(g.nodes, Object.keys(g.nodes[0] || { id: 1 }),
      (r, c) => esc(typeof r[c] === "object" ? JSON.stringify(r[c]) : r[c])) +
    `<h3>${g.edges.length} lineage edges</h3>` +
    table(g.edges, Object.keys(g.edges[0] || { source: 1 }));
}

async function showFiles(runId) {
  const t = await j(`/api/dataelement/repositoryFileTree/${encodeURIComponent(runId)}`);
  const rows = [];
  for (const g of t.groups || [])
    for (const f of g.files || [])
      rows.push({ group: g.name, file: f.name,
                  sha256: f.sha256 || "", size: f.size ?? "" });
  view.innerHTML =
    `<div class="crumb"><a href="#/">executions</a> / <a href="#/run/${esc(runId)}">run</a> / files</div>` +
    `<h2>Repository files</h2>` +
    (rows.length ? table(rows, ["group", "file", "sha256", "size"], (r, c) =>
      c === "file" && r.sha256
        // URL-encode (then HTML-escape) every param: a file named
        // a&b.txt or 100%.txt must survive both the href parse and
        // the server's parse_qs
        ? `<a href="${esc("/api/dataelement/download?executionID=" +
            encodeURIComponent(runId) +
            "&sha256=" + encodeURIComponent(r.sha256) +
            "&group=" + encodeURIComponent(r.group) +
            "&file=" + encodeURIComponent(r.file))}">${esc(r.file)}</a>`
        : esc(r[c]))
      : `<pre>${esc(JSON.stringify(t, null, 2))}</pre>`);
}

async function route() {
  const h = location.hash.slice(1) || "/";
  const p = h.split("/").filter(Boolean);
  try {
    if (!p.length) await showList();
    else if (p[0] === "run" && p[1]) await showRun(p[1]);
    else if (p[0] === "task" && p[2]) await showTask(p[1], p[2]);
    else if (p[0] === "elements" && p[1]) await showElements(p[1]);
    else if (p[0] === "files" && p[1]) await showFiles(p[1]);
    else view.innerHTML = `<p class="err">unknown view ${esc(h)}</p>`;
  } catch (e) {
    view.innerHTML = `<p class="err">${esc(e.message)}</p>`;
  }
}
addEventListener("hashchange", route);
route();
</script>
</body>
</html>
"""
