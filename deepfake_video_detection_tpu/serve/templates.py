"""HTML templates for the web UI, rendered server-side with str.format.

Covers the reference's template surface (SURVEY.md §2.5: ``ui.html``,
``dashboard.html``, ``result.html``, ``ui_results.html``,
``ui_processing.html``, ``login/signup/about``) as compact framework-free
pages: multi-file upload posting to ``/results``, a processing page polling
``/api/ui-job/<id>`` every 1.5 s, a results page with the typed justification,
a dashboard with upload history + chat, and auth forms. Styling is a single
embedded stylesheet (the reference ships ~630 lines of CSS + a canvas
starfield; the equivalent visual chrome here is minimal by design).
"""

from __future__ import annotations

import html
import json
from typing import Any, Dict, List, Optional

_STYLE = """
:root { color-scheme: dark; }
* { box-sizing: border-box; }
body { margin: 0; font-family: system-ui, sans-serif; background: #0b0f1a;
       color: #e6e9f0; min-height: 100vh; }
a { color: #7aa2ff; text-decoration: none; }
nav { display: flex; gap: 1rem; padding: 1rem 2rem; background: #101627;
      align-items: center; }
nav .brand { font-weight: 700; color: #fff; margin-right: auto; }
main { max-width: 880px; margin: 2rem auto; padding: 0 1rem; }
.card { background: #131a2e; border: 1px solid #232d4a; border-radius: 12px;
        padding: 1.5rem; margin-bottom: 1.25rem; }
h1, h2 { margin-top: 0; }
input, button, textarea { font: inherit; border-radius: 8px; }
input[type=text], input[type=email], input[type=password], textarea {
  width: 100%; padding: .6rem .8rem; background: #0d1322; color: #e6e9f0;
  border: 1px solid #2c365e; }
button { background: #3b5bdb; color: #fff; border: 0; padding: .65rem 1.4rem;
         cursor: pointer; }
button:hover { background: #4c6ef5; }
.verdict-fake { color: #ff6b6b; font-weight: 700; }
.verdict-real { color: #51cf66; font-weight: 700; }
.verdict-unsure { color: #fcc419; font-weight: 700; }
table { width: 100%; border-collapse: collapse; }
td, th { padding: .45rem .6rem; border-bottom: 1px solid #232d4a;
         text-align: left; }
.muted { color: #8b93a7; font-size: .9rem; }
pre { white-space: pre-wrap; }
.result-head { display: flex; align-items: center; gap: 1rem; }
.gauge { flex: none; }
.probbar { display: flex; height: 1.25rem; border-radius: 6px;
           overflow: hidden; font-size: .72rem; line-height: 1.25rem;
           max-width: 420px; }
.pb-real { background: #2c6e49; color: #d6f5e3; padding-left: .4rem;
           white-space: nowrap; overflow: hidden; }
.pb-fake { background: #9e2b25; color: #ffd9d6; padding-left: .4rem;
           white-space: nowrap; overflow: hidden; }
.chat-log { max-height: 280px; overflow-y: auto; }
.chat-msg-user { color: #7aa2ff; }
.chat-msg-bot { color: #d3d7e3; }
.dropzone { border: 2px dashed #2c365e; border-radius: 12px; padding: 2.2rem;
            text-align: center; cursor: pointer; margin-bottom: 1rem; }
.dropzone.drag { border-color: #4c6ef5; background: #101937; }
.legend-item { cursor: pointer; user-select: none; }
.legend-item.off { opacity: 0.35; }
"""


# canvas starfield backdrop ≙ the reference's ``static/js/space.js``
# (155 LoC drifting-stars canvas behind the chrome pages); dependency-free
# and honors prefers-reduced-motion.
_STARFIELD = """
<canvas id="space" style="position:fixed;inset:0;z-index:-1"></canvas>
<script>
(function () {
  const c = document.getElementById('space'), x = c.getContext('2d');
  let stars = [];
  function seed() {
    c.width = innerWidth; c.height = innerHeight;
    stars = Array.from({length: Math.min(180, c.width >> 3)}, () => ({
      x: Math.random() * c.width, y: Math.random() * c.height,
      z: 0.2 + Math.random() * 0.8, r: 0.4 + Math.random() * 1.3}));
  }
  function tick() {
    x.clearRect(0, 0, c.width, c.height);
    for (const s of stars) {
      s.y += s.z * 0.25;
      if (s.y > c.height) { s.y = 0; s.x = Math.random() * c.width; }
      x.globalAlpha = 0.35 + 0.5 * s.z;
      x.fillStyle = '#9db4ff';
      x.beginPath(); x.arc(s.x, s.y, s.r, 0, 7); x.fill();
    }
    requestAnimationFrame(tick);
  }
  function still() {  // one static frame for prefers-reduced-motion
    x.globalAlpha = 0.6; x.fillStyle = '#9db4ff';
    for (const s of stars) { x.beginPath(); x.arc(s.x, s.y, s.r, 0, 7); x.fill(); }
  }
  addEventListener('resize', seed);
  seed();
  matchMedia('(prefers-reduced-motion: reduce)').matches ? still() : tick();
})();
</script>"""


def _page(title: str, body: str, user: Optional[str] = None,
          extra_head: str = "", starfield: bool = False) -> str:
    user_nav = (f'<span class="muted">{html.escape(user)}</span> '
                f'<a href="/logout">Logout</a>' if user else
                '<a href="/login">Login</a> <a href="/signup">Sign up</a>')
    backdrop = _STARFIELD if starfield else ""
    return f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{html.escape(title)} · Deepfake Video Detection</title>
<style>{_STYLE}</style>{extra_head}</head>
<body>{backdrop}
<nav><a class="brand" href="/">Deepfake Detector</a>
<a href="/ui">Analyze</a><a href="/dashboard">Dashboard</a>
<a href="/about">About</a>{user_nav}</nav>
<main>{body}</main>
</body></html>"""


def index_page(user: Optional[str]) -> str:
    return _page("Home", """
<div class="card"><h1>Deepfake Video Detection</h1>
<p>TPU-accelerated detector: upload a video and get a real/fake verdict with
calibrated confidence, frame-level attention scores, and a plain-English
explanation.</p>
<p><a href="/ui"><button>Analyze a video</button></a></p></div>""", user,
                 starfield=True)


def about_page(user: Optional[str]) -> str:
    return _page("About", """
<div class="card"><h2>About</h2>
<p>This service samples frames from an uploaded video, crops the faces, and
runs them through a convolutional backbone compiled for TPUs. A temporal
attention head fuses per-frame evidence into a single verdict, thresholded by
a calibration sweep from training. An agent layer adds uncertainty-aware
alerts, abstention, and monitoring.</p></div>""", user, starfield=True)


def ui_page(user: Optional[str]) -> str:
    # drag-drop zone ≙ the reference's app.js upload area
    # (static/js/app.js:21-153: drop → POST /api/predict → inline verdict)
    return _page("Analyze", """
<div class="card"><h2>Analyze videos</h2>
<div class="dropzone" id="dz">Drag &amp; drop a video here<br>
<span class="muted">or click to choose — analyzed instantly via the API</span>
<input type="file" id="dzfile" accept="video/*" style="display:none"></div>
<div id="dzout"></div>
<hr style="border-color:#232d4a">
<form action="/results" method="post" enctype="multipart/form-data">
<p><input type="file" name="videos" accept="video/*" multiple required></p>
<p><button type="submit">Upload &amp; analyze (background job)</button></p>
</form>
<p class="muted">The form path runs as a background job with a progress
page and full 200-word report; the drop zone calls /api/predict
synchronously.</p></div>
<script>
const dz = document.getElementById('dz');
const dzfile = document.getElementById('dzfile');
dz.addEventListener('click', () => dzfile.click());
dz.addEventListener('dragover', e => { e.preventDefault(); dz.classList.add('drag'); });
dz.addEventListener('dragleave', () => dz.classList.remove('drag'));
dz.addEventListener('drop', e => {
  e.preventDefault(); dz.classList.remove('drag');
  if (e.dataTransfer.files.length) analyze(e.dataTransfer.files[0]);
});
dzfile.addEventListener('change', () => {
  if (dzfile.files.length) analyze(dzfile.files[0]);
});
async function analyze(file) {
  const out = document.getElementById('dzout');
  out.innerHTML = '<p class="muted">Analyzing ' + file.name + '…</p>';
  const fd = new FormData();
  fd.append('video', file);
  try {
    const r = await fetch('/api/predict', {method: 'POST', body: fd});
    const j = await r.json();
    if (j.error) { out.innerHTML = '<p class="verdict-unsure">' + j.error + '</p>'; return; }
    const cls = j.prediction === 'Deepfake' ? 'verdict-fake'
              : j.prediction === 'Real' ? 'verdict-real' : 'verdict-unsure';
    const conf = typeof j.confidence === 'number'
               ? (j.confidence * 100).toFixed(1) + '%' : '–';
    const pf = typeof j.prob_fake === 'number'
             ? (j.prob_fake * 100).toFixed(1) + '%' : '–';
    out.innerHTML = '<p>' + file.name + ': <span class="' + cls + '">' +
      j.prediction + '</span> <span class="muted">confidence ' + conf +
      ' · fake prob ' + pf + ' · faces ' + (j.num_faces ?? '–') + '</span></p>' +
      '<details><summary>Details</summary><pre>' +
      JSON.stringify(j, null, 2) + '</pre></details>';
  } catch (err) { out.innerHTML = '<p class="verdict-unsure">' + err + '</p>'; }
}
</script>""", user)


def processing_page(job_id: str, user: Optional[str]) -> str:
    body = f"""
<div class="card"><h2>Analyzing…</h2>
<p id="status">Your videos are being processed.</p></div>
<script>
async function poll() {{
  const r = await fetch('/api/ui-job/{html.escape(job_id)}');
  const j = await r.json();
  if (j.status === 'done') window.location = '/results?job={html.escape(job_id)}';
  else if (j.status === 'error')
    document.getElementById('status').textContent = 'Error: ' + j.error;
  else setTimeout(poll, 1500);
}}
poll();
</script>"""
    return _page("Processing", body, user)


def _verdict_span(result: Dict[str, Any]) -> str:
    v = result.get("prediction", "Uncertain")
    cls = {"Deepfake": "verdict-fake", "Real": "verdict-real"}.get(v, "verdict-unsure")
    return f'<span class="{cls}">{html.escape(str(v))}</span>'


def _windows_strip(w) -> str:
    """Per-window fake-prob bar strip for long-video scans
    (SERVE_WINDOWS > 1, docs/serving.md)."""
    if not isinstance(w, dict) or not w.get("prob_fake"):
        return ""
    probs = w["prob_fake"]
    n = len(probs)
    bw = max(8, min(48, 360 // max(n, 1)))
    bars = []
    for i, p in enumerate(probs):
        h = max(2, int(round(float(p) * 48)))
        color = "#d9534f" if i == w.get("deciding_window") else "#8884"
        bars.append(
            f'<rect x="{i * (bw + 3)}" y="{50 - h}" width="{bw}" '
            f'height="{h}" fill="{color}"><title>window {i}: '
            f'{float(p) * 100:.1f}% fake</title></rect>')
    svg = (f'<svg width="{n * (bw + 3)}" height="52" role="img" '
           f'aria-label="per-window fake probability">{"".join(bars)}'
           "</svg>")
    return (f'<p class="muted">Timeline scan ({n} windows, verdict from '
            f"window {w.get('deciding_window')}):</p>{svg}")


def _frame_strip(result: Dict[str, Any]) -> str:
    """Per-frame temporal-attention strip: which of the sampled frames the
    detector weighted when deciding (``frame_scores`` — the temporal
    attention softmax, serve/predict.py). Explains the verdict at frame
    granularity; the reference exposes nothing equivalent."""
    scores = result.get("frame_scores")
    if not isinstance(scores, list) or not scores:
        return ""
    try:
        vals = [max(0.0, float(s)) for s in scores]
    except (TypeError, ValueError):
        return ""
    top = max(vals) or 1.0
    n = len(vals)
    bw = max(10, min(44, 360 // n))
    bars = []
    for i, v in enumerate(vals):
        h = max(2, int(round(v / top * 40)))
        hot = "#d9534f" if v == top else "#5b76c7"
        bars.append(
            f'<rect x="{i * (bw + 3)}" y="{42 - h}" width="{bw}" '
            f'height="{h}" fill="{hot}" rx="2"><title>frame {i}: attention '
            f'{v * 100:.1f}%</title></rect>')
    svg = (f'<svg width="{n * (bw + 3)}" height="44" role="img" '
           f'aria-label="per-frame attention weights">{"".join(bars)}</svg>')
    return ('<p class="muted">Frame attention (which sampled frames drove '
            f"the verdict):</p>{svg}")


def _confidence_gauge(conf, prediction: str) -> str:
    """SVG donut gauge for the decision confidence (≙ the reference
    result page's visual verdict chrome, ``templates/result.html``)."""
    if not isinstance(conf, float):
        return ""
    pct = max(0.0, min(1.0, conf))
    r, c = 26, 32
    circ = 2 * 3.14159 * r
    color = {"Deepfake": "#d9534f", "Real": "#3c9a5f"}.get(prediction,
                                                           "#d0a537")
    return (
        f'<svg width="64" height="64" viewBox="0 0 64 64" role="img" '
        f'aria-label="confidence {pct * 100:.0f}%" class="gauge">'
        f'<circle cx="{c}" cy="{c}" r="{r}" fill="none" stroke="#8883" '
        f'stroke-width="7"/>'
        f'<circle cx="{c}" cy="{c}" r="{r}" fill="none" stroke="{color}" '
        f'stroke-width="7" stroke-linecap="round" '
        f'stroke-dasharray="{circ * pct:.1f} {circ:.1f}" '
        f'transform="rotate(-90 {c} {c})"/>'
        f'<text x="{c}" y="{c + 5}" text-anchor="middle" font-size="14" '
        f'fill="currentColor">{pct * 100:.0f}%</text></svg>')


def _prob_bar(result: Dict[str, Any]) -> str:
    """Real-vs-fake probability split bar."""
    pf = result.get("prob_fake")
    if not isinstance(pf, float):
        return ""
    pr = 1.0 - pf
    return (
        '<div class="probbar" title="real vs fake probability">'
        f'<span class="pb-real" style="width:{pr * 100:.1f}%">'
        f'real {pr * 100:.0f}%</span>'
        f'<span class="pb-fake" style="width:{pf * 100:.1f}%">'
        f'fake {pf * 100:.0f}%</span></div>')


# typewriter effect for the justification (≙ ui_results.html's typed
# animation, templates/ui_results.html:40-59)
# ONE chat-append helper shared by every chat-bearing script (dashboard +
# per-result chat card — a page can embed both; redeclaration is identical
# and harmless). Inserted by f-string interpolation, so single braces are
# correct here.
_CHAT_LINE_JS = """\
// append as text nodes, never innerHTML: chat content (the user's own
// message AND the server reply, which can echo stored upload filenames)
// must not be parsed as markup
function chatLine(log, cls, prefix, text) {
  const p = document.createElement('p');
  p.className = cls;
  p.textContent = prefix + text;
  log.appendChild(p);
  log.scrollTop = log.scrollHeight;
}"""


_TYPED_JS = """
<script>
document.querySelectorAll('details.typed').forEach(function (d) {
  d.addEventListener('toggle', function () {
    if (!d.open || d.dataset.typed) return;
    d.dataset.typed = '1';
    var pre = d.querySelector('pre'), full = pre.textContent, i = 0;
    pre.textContent = '';
    (function tick() {
      pre.textContent = full.slice(0, i += 3);
      if (i < full.length) setTimeout(tick, 12);
    })();
  });
});
</script>"""


def results_page(items: List[Dict[str, Any]], user: Optional[str]) -> str:
    cards = []
    for item in items:
        result = item.get("result", {})
        fname = html.escape(item.get("filename", "video"))
        if result.get("error"):
            cards.append(f'<div class="card"><h2>{fname}</h2>'
                         f'<p class="verdict-unsure">Error: '
                         f'{html.escape(str(result["error"]))}</p></div>')
            continue
        conf = result.get("confidence")
        conf_s = f"{conf * 100:.1f}%" if isinstance(conf, float) else "–"
        pf = result.get("prob_fake")
        pf_s = f"{pf * 100:.1f}%" if isinstance(pf, float) else "–"
        just = html.escape(item.get("justification", ""))
        msg = html.escape(item.get("message", ""))
        windows_html = _windows_strip(result.get("windows"))
        frames_html = _frame_strip(result)
        gauge = _confidence_gauge(conf, result.get("prediction", ""))
        cards.append(f"""
<div class="card"><h2>{fname}</h2>
<div class="result-head">{gauge}<div>
<p>Verdict: {_verdict_span(result)} &nbsp; <span class="muted">confidence
{conf_s} · fake prob {pf_s} · faces {result.get("num_faces", "–")}</span></p>
{_prob_bar(result)}</div></div>
{windows_html}
{frames_html}
<p>{msg}</p>
<details class="typed"><summary>Full 200-word report</summary><pre id="just">{just}</pre></details>
<details><summary>Raw result</summary>
<pre>{html.escape(json.dumps(result, indent=2, default=str))}</pre></details>
</div>""")
    body = "".join(cards) or ('<div class="card"><p>No results (the job may '
                              'have expired — please upload again).</p></div>')
    body += '<p><a href="/ui"><button>Analyze more</button></a></p>'
    body += _TYPED_JS
    return _page("Results", body, user)


def login_page(user: Optional[str], error: str = "") -> str:
    err = f'<p class="verdict-fake">{html.escape(error)}</p>' if error else ""
    return _page("Login", f"""
<div class="card"><h2>Login</h2>{err}
<form method="post">
<p><input type="email" name="email" placeholder="email" required></p>
<p><input type="password" name="password" placeholder="password" required></p>
<p><button type="submit">Login</button>
<a href="/signup" class="muted">need an account?</a></p>
</form></div>""", user, starfield=True)


def signup_page(user: Optional[str], error: str = "") -> str:
    err = f'<p class="verdict-fake">{html.escape(error)}</p>' if error else ""
    return _page("Sign up", f"""
<div class="card"><h2>Sign up</h2>{err}
<form method="post">
<p><input type="email" name="email" placeholder="email" required></p>
<p><input type="password" name="password" placeholder="password" required></p>
<p><button type="submit">Create account</button></p>
</form></div>""", user, starfield=True)


def dashboard_page(user: Optional[str], uploads: List[Dict[str, Any]]) -> str:
    rows = "".join(
        f"<tr><td><a href='/result/{html.escape(str(u.get('id', '')))}'>"
        f"{html.escape(str(u.get('filename', '?')))}</a></td>"
        f"<td>{html.escape(str(u.get('verdict', '?')))}</td>"
        f"<td class='muted'>{html.escape(str(u.get('ts', '')))}</td></tr>"
        for u in reversed(uploads[-50:]))
    table = (f"<table><tr><th>File</th><th>Verdict</th><th>When</th></tr>"
             f"{rows}</table>" if rows else
             '<p class="muted">No uploads yet.</p>')
    body = f"""
<div class="card"><h2>Analyze a video</h2>
<p><input type="file" id="vid" accept="video/*">
<button onclick="apiUpload()">Upload &amp; analyze</button>
<span class="muted" id="upstatus"></span></p></div>
<div class="card"><h2>Upload history</h2>{table}</div>
<div class="card"><h2>Model</h2>
<p><input type="text" id="ckpt" placeholder="checkpoint path on server">
<button onclick="loadModel()">Load model</button>
<span class="muted" id="mstatus"></span></p></div>
<div class="card"><h2>Training metrics</h2>
<svg id="chart" width="780" height="240" viewBox="0 0 780 240"></svg>
<p class="muted" id="chart-note">Per-epoch accuracy/F1/AUC recomputed from
preds_epoch_*.csv (via /api/metrics). Click a legend entry to toggle a
series; hover points for values.</p></div>
<script>
// interactive SVG chart ≙ the reference's Plotly dashboards
// (static/js/app.js:21-153), dependency-free: axes + ticks, per-point
// hover tooltips, click-to-toggle legend.
fetch('/api/metrics').then(r => r.json()).then(d => {{
  const es = d.epochs || [];
  const svg = document.getElementById('chart');
  if (!es.length) {{
    document.getElementById('chart-note').textContent =
      'No training metrics on this server yet.';
    return;
  }}
  const W = 780, H = 240, padL = 44, padR = 16, padT = 24, padB = 32;
  const keys = [['accuracy', '#7aa2ff'], ['f1', '#51cf66'], ['auc', '#fcc419']];
  const on = Object.fromEntries(keys.map(([k]) => [k, true]));
  const x = i => padL + i * (W - padL - padR) / Math.max(es.length - 1, 1);
  const y = v => H - padB - v * (H - padT - padB);
  function render() {{
    let out = '';
    for (const v of [0, 0.25, 0.5, 0.75, 1]) {{
      out += `<line x1="${{padL}}" y1="${{y(v)}}" x2="${{W - padR}}"
              y2="${{y(v)}}" stroke="#232d4a"/>` +
             `<text x="${{padL - 6}}" y="${{y(v) + 4}}" fill="#8b93a7"
              font-size="11" text-anchor="end">${{v}}</text>`;
    }}
    const step = Math.max(1, Math.ceil(es.length / 12));
    es.forEach((e, i) => {{
      if (i % step) return;
      out += `<text x="${{x(i)}}" y="${{H - padB + 16}}" fill="#8b93a7"
              font-size="11" text-anchor="middle">${{e.epoch ?? i}}</text>`;
    }});
    for (const [k, color] of keys) {{
      if (!on[k]) continue;
      const pts = es.map((e, i) => `${{x(i)}},${{y(e[k] || 0)}}`).join(' ');
      out += `<polyline fill="none" stroke="${{color}}" stroke-width="2"
              points="${{pts}}"/>`;
      out += es.map((e, i) =>
        `<circle cx="${{x(i)}}" cy="${{y(e[k] || 0)}}" r="3.5"
         fill="${{color}}"><title>epoch ${{e.epoch ?? i}} ${{k}} =
         ${{(e[k] || 0).toFixed(3)}}</title></circle>`).join('');
    }}
    out += keys.map(([k, c], j) =>
      `<text class="legend-item${{on[k] ? '' : ' off'}}" data-k="${{k}}"
       x="${{padL + j * 96}}" y="14" fill="${{c}}"
       font-size="12">&#9632; ${{k}}</text>`).join('');
    svg.innerHTML = out;
    svg.querySelectorAll('.legend-item').forEach(el =>
      el.addEventListener('click', () => {{
        on[el.dataset.k] = !on[el.dataset.k]; render();
      }}));
  }}
  render();
}});
</script>
<div class="card"><h2>Alerts</h2>
<p class="muted">CRITICAL deepfake alerts are logged for phone notification
(≙ the reference's agent settings panel).</p>
<p><input type="text" id="phone" placeholder="+15551234567">
<button onclick="savePhone()">Save number</button>
<span class="muted" id="phstatus"></span></p></div>
<div class="card"><h2>Chat</h2>
<div class="chat-log" id="log"></div>
<p><input type="text" id="msg" placeholder="Ask about your results…">
<button onclick="send()">Send</button></p></div>
<script>
fetch('/api/agent-config').then(r => r.json()).then(d => {{
  if (d.configured) document.getElementById('phstatus').textContent =
    'Configured (' + (d.redacted_phone || '***') + ')';
}});
async function savePhone() {{
  const phone = document.getElementById('phone').value.trim();
  const el = document.getElementById('phstatus');
  const r = await fetch('/api/agent-config', {{method: 'POST',
    headers: {{'Content-Type': 'application/json'}},
    body: JSON.stringify({{notification_phone: phone}})}});
  const j = await r.json();
  el.textContent = j.success ? 'Configured (***' + phone.slice(-4) + ')'
                             : (j.error || 'failed');
}}
</script>
<script>
{_CHAT_LINE_JS}
async function send() {{
  const m = document.getElementById('msg').value;
  if (!m) return;
  const log = document.getElementById('log');
  chatLine(log, 'chat-msg-user', 'You: ', m);
  document.getElementById('msg').value = '';
  const r = await fetch('/api/chat', {{method: 'POST',
    headers: {{'Content-Type': 'application/json'}},
    body: JSON.stringify({{message: m}})}});
  const j = await r.json();
  chatLine(log, 'chat-msg-bot', 'Bot: ', j.reply || j.error || '');
}}
async function loadModel() {{
  const path = document.getElementById('ckpt').value;
  const el = document.getElementById('mstatus');
  el.textContent = 'loading…';
  const r = await fetch('/api/load-model', {{method: 'POST',
    headers: {{'Content-Type': 'application/json'}},
    body: JSON.stringify({{path}})}});
  const j = await r.json();
  el.textContent = j.ok ? ('loaded ' + j.stats.model_type +
    ' (match ' + j.stats.match_ratio.toFixed(2) + ')') : (j.error || 'failed');
}}
async function apiUpload() {{
  const inp = document.getElementById('vid');
  const el = document.getElementById('upstatus');
  if (!inp.files.length) {{ el.textContent = 'pick a file first'; return; }}
  el.textContent = 'analyzing…';
  const fd = new FormData();
  fd.append('video', inp.files[0]);
  const r = await fetch('/api/upload', {{method: 'POST', body: fd}});
  const j = await r.json();
  if (j.uploads) {{
    el.textContent = j.uploads[0].filename + ' → ' + j.uploads[0].verdict;
    setTimeout(() => window.location.reload(), 1200);
  }} else {{
    el.textContent = j.error || 'failed';
  }}
}}
</script>"""
    return _page("Dashboard", body, user)


def _chat_card(endpoint: str) -> str:
    """Chat box wired to the chat API (≙ the reference's per-result chat,
    ``templates/result.html``)."""
    return f"""
<div class="card"><h2>Ask about this result</h2>
<div class="chat-log" id="rlog"></div>
<p><input type="text" id="rmsg" placeholder="e.g. why was this flagged?">
<button onclick="rsend()">Send</button></p></div>
<script>
{_CHAT_LINE_JS}
async function rsend() {{
  const m = document.getElementById('rmsg').value;
  if (!m) return;
  const log = document.getElementById('rlog');
  chatLine(log, 'chat-msg-user', 'You: ', m);
  document.getElementById('rmsg').value = '';
  const r = await fetch('{endpoint}', {{method: 'POST',
    headers: {{'Content-Type': 'application/json'}},
    body: JSON.stringify({{message: m}})}});
  const j = await r.json();
  chatLine(log, 'chat-msg-bot', 'Bot: ', j.reply || j.error || '');
}}
document.getElementById('rmsg').addEventListener('keydown',
  e => {{ if (e.key === 'Enter') rsend(); }});
</script>"""


def result_page(user: Optional[str], record: Dict[str, Any]) -> str:
    result = record.get("result", {})
    page = results_page([{"filename": record.get("filename", "video"),
                          "result": result,
                          "message": record.get("message", ""),
                          "justification": record.get("justification", "")}],
                        user)
    chat = _chat_card("/api/chat" if user else "/api/chat-public")
    return page.replace("</main>", chat + "</main>")
