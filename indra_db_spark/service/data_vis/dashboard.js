// table renderers over the monitor/summary JSON contracts; no libraries
function table(rows, cols) {
  const h = ["<table><tr>" + cols.map(c => `<th>${c}</th>`).join("") + "</tr>"];
  for (const r of rows)
    h.push("<tr>" + cols.map(c => `<td>${r[c] ?? ""}</td>`).join("") + "</tr>");
  return h.join("") + "</table>";
}
fetch("/monitor/data/runtime").then(r => r.json()).then(d => {
  const rows = Array.isArray(d) ? d : (d.stages || d.runtimes || []);
  document.getElementById("rt").innerHTML =
    "<h2>Stage runtimes</h2>" +
    (rows.length ? table(rows, Object.keys(rows[0])) : "<p>no runs recorded</p>");
}).catch(() => { document.getElementById("rt").textContent = "runtime data unavailable"; });
fetch("/summary/data/stats").then(r => r.json()).then(d => {
  const rows = Object.entries(d).map(([k, v]) => ({stat: k, value: JSON.stringify(v)}));
  document.getElementById("st").innerHTML =
    "<h2>Corpus stats</h2>" + table(rows, ["stat", "value"]);
}).catch(() => { document.getElementById("st").textContent = "stats unavailable"; });
