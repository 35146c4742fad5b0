"""Minimal self-contained HTML pages over the JSON API.

The reference serves template/Vue pages at /search and /monitor
(indra_db_service/api.py:206-246, 300-338 + templates/); the data behind
them is fully covered by this service's JSON routes, and these pages are
deliberately tiny dependency-free consumers of exactly those routes —
plain HTML + fetch(), no build step, no static assets — so the
user-visible surface exists without importing a frontend stack.  Every
piece of data on the page round-trips through the public JSON API, which
keeps the pages honest: they cannot show anything the API can't serve.
"""

SEARCH_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>statement search</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}
 input,select{font:inherit;padding:.3rem}#sugg span{cursor:pointer;
 margin-right:.6rem;color:#046}.m{color:#666;font-size:.85em}
 table{border-collapse:collapse;margin-top:1rem}td,th{border:1px solid #ccc;
 padding:.25rem .5rem;text-align:left}
</style></head><body>
<h1>Statement search</h1>
<p class="m">agent autocomplete via /search/agents, vocabularies via
/search/data, results via /statements/from_agents</p>
<form id="f">
  <input id="agent" placeholder="agent (e.g. MEK)" autocomplete="off">
  <select id="type"><option value="">any type</option></select>
  <button>search</button>
</form>
<div id="sugg" class="m"></div>
<div id="out"></div>
<script>
const $=id=>document.getElementById(id);
fetch('/search/data').then(r=>r.json()).then(d=>{
  for(const t of d.stmt_types){const o=document.createElement('option');
    o.textContent=t;$('type').append(o);}
});
$('agent').addEventListener('input',async e=>{
  const v=e.target.value.trim();
  if(!v){$('sugg').textContent='';return;}
  const d=await (await fetch('/search/agents?prefix='+
    encodeURIComponent(v)+'&limit=8')).json();
  $('sugg').innerHTML='';
  for(const s of d.suggestions){const el=document.createElement('span');
    el.textContent=s.name+' ('+s.top.db+':'+s.top.id+')';
    el.onclick=()=>{$('agent').value=s.name;$('sugg').innerHTML='';};
    $('sugg').append(el);}
});
$('f').addEventListener('submit',async e=>{
  e.preventDefault();
  const p=new URLSearchParams({agent0:$('agent').value,limit:25});
  if($('type').value)p.set('type',$('type').value);
  const d=await (await fetch('/statements/from_agents?'+p)).json();
  const rows=Object.entries(d.statements||{});
  let h='<table><tr><th>hash</th><th>type</th><th>agents</th></tr>';
  for(const [k,s] of rows)
    h+='<tr><td>'+k+'</td><td>'+(s.type||'')+'</td><td>'+
       ((s.agents||[]).join(', '))+'</td></tr>';
  $('out').innerHTML=h+'</table><p class="m">'+rows.length+' rows</p>';
});
</script></body></html>
"""

MONITOR_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>pipeline monitor</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}
 pre{background:#f6f6f6;padding:1rem;overflow:auto}
 h2{margin-top:2rem}.m{color:#666;font-size:.85em}
</style></head><body>
<h1>Pipeline monitor</h1>
<p class="m">stage runtimes via /monitor/data/runtime, corpus stats via
/summary/data/stats</p>
<h2>Stage runtimes</h2><pre id="rt">loading…</pre>
<h2>Corpus stats</h2><pre id="st">loading…</pre>
<script>
const grab=async(path,el)=>{
  try{const r=await fetch(path);
    document.getElementById(el).textContent=
      JSON.stringify(await r.json(),null,2);}
  catch(e){document.getElementById(el).textContent=String(e);}
};
grab('/monitor/data/runtime','rt');
grab('/summary/data/stats','st');
</script></body></html>
"""


# ---- static assets (the reference's /data-vis/<path> + /ilv/<file> file
# servers, api.py:247-272) -------------------------------------------------

import os as _os

#: suffix → content type, superset of the reference's suf_ct_map
ASSET_TYPES = {
    ".js": "application/javascript",
    ".css": "text/css",
    ".html": "text/html; charset=utf-8",
    ".json": "application/json",
    ".svg": "image/svg+xml",
    ".map": "application/json",
}

#: built-in bundle (the reference ships a Vue dist; this one is a
#: dependency-free table view over the same JSON contracts)
DATA_VIS_DIR = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "data_vis")


def serve_asset(rel_path: str, root: str) -> tuple[str, bytes] | None:
    """Resolve ``rel_path`` under ``root`` and return (content_type,
    bytes), or None for missing files, unknown suffixes, and — unlike the
    reference's open-coded file server — any path that escapes the asset
    root (traversal via '..' or absolute segments)."""
    if not root or not _os.path.isdir(root):
        return None
    root = _os.path.realpath(root)
    full = _os.path.realpath(_os.path.join(root, rel_path))
    if not (full == root or full.startswith(root + _os.sep)):
        return None
    ext = _os.path.splitext(full)[1]
    if ext not in ASSET_TYPES or not _os.path.isfile(full):
        return None
    with open(full, "rb") as f:
        return ASSET_TYPES[ext], f.read()
