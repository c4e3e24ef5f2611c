"""Interactive preview server — the framework's L6/UI surface.

The reference ships three UIs (web/main.ts, Godot main.gd, tkinter
raw_photo_forge.py) all with the same shape: slider edits -> re-render at a
preview resolution (drag->LOW, release->MID, export->FULL,
web/main.ts:900-907) -> present, plus curve editors, histogram, EXIF table,
masks and presets. This module provides that surface as a local HTTP app:
a single-page UI (vanilla JS sliders + curve points + histogram canvas)
talking JSON to a PhotoEditor session, with previews streamed as JPEG.

Run:  python -m rawphotoforge_tpu.app.server [--port 8080] [image]
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..core.params import CURVE_NAMES
from ..engine.editor import PhotoEditor, FULL, MID, LOW
from ..io import image_io

_PAGE = """<!DOCTYPE html>
<html><head><title>RawPhotoForge-TPU</title><style>
body{font-family:sans-serif;display:flex;margin:0;background:#222;color:#ddd}
#side{width:300px;padding:12px;overflow-y:auto;height:100vh;box-sizing:border-box}
#main{flex:1;display:flex;flex-direction:column;align-items:center;padding:10px}
#preview{max-width:100%;max-height:80vh}
label{display:block;font-size:12px;margin-top:8px}
input[type=range]{width:100%}
canvas{background:#111;width:100%;height:80px}
button{margin:4px 2px}
</style></head><body>
<div id=side>
  <h3>RawPhotoForge-TPU</h3>
  <canvas id=hist width=256 height=80></canvas>
  <div id=sliders></div>
  <button onclick="resetAll()">Reset</button>
  <button onclick="savePreset()">Save preset</button>
  <a id=dl style="color:#8cf" href="/export" download="export.jpg">Export JPEG</a>
  <pre id=exif style="font-size:11px"></pre>
</div>
<div id=main><img id=preview src="/preview?level=mid"></div>
<script>
const SLIDERS=[["exposure",-6,6,0.05],["contrast",-100,100,1],["shadow",-100,100,1],
 ["highlight",-100,100,1],["black",-100,100,1],["white",-100,100,1],
 ["wb_temperature",-100,100,1],["wb_tint",-100,100,1],["vignette",-100,100,1],
 ["lens_distortion",-100,100,1],["sharpness",0,100,1]];
const state={};
const box=document.getElementById('sliders');
for(const [name,lo,hi,st] of SLIDERS){
  state[name]=0;
  box.insertAdjacentHTML('beforeend',
   `<label>${name}: <span id=v_${name}>0</span>
    <input type=range id=s_${name} min=${lo} max=${hi} step=${st} value=0></label>`);
  const el=document.getElementById('s_'+name);
  el.oninput=()=>{state[name]=parseFloat(el.value);
    document.getElementById('v_'+name).textContent=el.value;push('low');};
  el.onchange=()=>{push('mid');};
}
let busy=false,queued=null;
async function push(level){
  if(busy){queued=level;return;}
  busy=true;
  await fetch('/edit',{method:'POST',body:JSON.stringify(state)});
  document.getElementById('preview').src='/preview?level='+level+'&t='+Date.now();
  const h=await (await fetch('/histogram')).json();
  drawHist(h);
  busy=false;
  if(queued){const q=queued;queued=null;push(q);}
}
function drawHist(h){
  const c=document.getElementById('hist').getContext('2d');
  c.clearRect(0,0,256,80);
  const colors=['#f55','#5f5','#59f','#ccc'];
  const m=Math.max(1,...h.flat());
  h.forEach((row,ci)=>{c.strokeStyle=colors[ci];c.beginPath();
    row.forEach((v,i)=>{const y=80-78*v/m; i?c.lineTo(i,y):c.moveTo(i,y);});c.stroke();});
}
async function resetAll(){
  await fetch('/reset',{method:'POST'});
  for(const [name] of SLIDERS){state[name]=0;
    document.getElementById('s_'+name).value=0;
    document.getElementById('v_'+name).textContent='0';}
  push('mid');
}
async function savePreset(){
  const p=await (await fetch('/preset')).text();
  const a=document.createElement('a');
  a.href=URL.createObjectURL(new Blob([p]));a.download='preset.json';a.click();
}
fetch('/exif').then(r=>r.json()).then(e=>{
  document.getElementById('exif').textContent=
    Object.entries(e).map(([k,v])=>k+': '+v).join('\\n');});
push('mid');
</script></body></html>"""


class EditorApp:
    """The server's model object: one PhotoEditor + its lock."""

    def __init__(self, editor: PhotoEditor):
        self.editor = editor
        self.lock = threading.Lock()

    def apply_state(self, st: dict):
        ed = self.editor
        ed.set_tone(
            st.get("exposure", 0.0), int(st.get("contrast", 0)),
            int(st.get("shadow", 0)), int(st.get("highlight", 0)),
            int(st.get("black", 0)), int(st.get("white", 0)),
        )
        ed.set_whitebalance(int(st.get("wb_temperature", 0)), int(st.get("wb_tint", 0)))
        ed.set_vignette(int(st.get("vignette", 0)))
        ed.set_lens_distortion(int(st.get("lens_distortion", 0)))
        ed.set_sharpness(int(st.get("sharpness", 0)))
        for i, cname in enumerate(CURVE_NAMES):
            pts = st.get(f"curve_{cname}")
            if pts:
                xs = [p[0] for p in pts]
                ys = [p[1] for p in pts]
                ed.set_curve(i, xs, ys)

    def preview_jpeg(self, level: str) -> bytes:
        return image_io.encode_image(self.editor.apply(level), "JPEG", quality=90)


def make_handler(app: EditorApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            q = urllib.parse.parse_qs(url.query)
            with app.lock:
                if url.path == "/":
                    self._send(200, _PAGE.encode(), "text/html")
                elif url.path == "/preview":
                    level = q.get("level", ["mid"])[0]
                    level = {"low": LOW, "mid": MID, "full": FULL}.get(level, MID)
                    self._send(200, app.preview_jpeg(level), "image/jpeg")
                elif url.path == "/export":
                    self._send(200, app.editor.save_bytes("JPEG"), "image/jpeg")
                elif url.path == "/histogram":
                    h = app.editor.histogram(MID).tolist()
                    self._send(200, json.dumps(h).encode())
                elif url.path == "/exif":
                    self._send(200, json.dumps(app.editor.exif).encode())
                elif url.path == "/preset":
                    self._send(200, app.editor.preset_json().encode())
                elif url.path == "/masks":
                    self._send(200, json.dumps(app.editor.mask_names()).encode())
                else:
                    self._send(404, b"{}")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            url = urllib.parse.urlparse(self.path)
            with app.lock:
                try:
                    if url.path == "/edit":
                        app.apply_state(body)
                        self._send(200, b'{"ok": true}')
                    elif url.path == "/reset":
                        app.editor.reset()
                        self._send(200, b'{"ok": true}')
                    elif url.path == "/preset":
                        app.editor.load_preset_json(json.dumps(body))
                        self._send(200, b'{"ok": true}')
                    elif url.path == "/mask/add":
                        if "point" in body:
                            app.editor.add_similarity_mask(
                                body["name"], tuple(body["point"]),
                                body.get("tolerance", 0.1),
                                body.get("sigma", 0.0),
                            )
                        else:
                            app.editor.add_mask(
                                body["name"], np.asarray(body["data"], dtype=np.float32)
                            )
                        self._send(200, b'{"ok": true}')
                    elif url.path == "/mask/remove":
                        app.editor.remove_mask(body["name"])
                        self._send(200, b'{"ok": true}')
                    elif url.path == "/mask/invert":
                        app.editor.invert_mask(body["name"])
                        self._send(200, b'{"ok": true}')
                    else:
                        self._send(404, b"{}")
                except Exception as e:  # noqa: BLE001
                    self._send(400, json.dumps({"error": str(e)}).encode())

    return Handler


def serve(editor: PhotoEditor, port: int = 8080, host: str = "127.0.0.1"):
    app = EditorApp(editor)
    httpd = ThreadingHTTPServer((host, port), make_handler(app))
    return httpd


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="rawphotoforge-tpu-server")
    ap.add_argument("image", nargs="?")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args(argv)
    if args.image:
        ed = PhotoEditor.open(args.image)
    else:
        rng = np.random.default_rng(0)
        ed = PhotoEditor.from_rgb_f32(rng.random((600, 900, 3)).astype(np.float32) ** 2)
    httpd = serve(ed, port=args.port)
    print(f"serving on http://127.0.0.1:{args.port}/")
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
