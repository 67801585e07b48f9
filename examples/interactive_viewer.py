"""Interactive orbit viewer — the reference's ``ti.GUI`` forward-task
viewer (`/root/reference/examples/taichi_volume_raycaster.py:456-463,
634-652`: ``a``/``d`` keys orbit the camera) rebuilt for headless boxes as
a local web app: a stdlib HTTP server renders frames on demand and a
single-page UI maps the same keys (plus arrows and a slider) to camera
angle.

Run:  python examples/interactive_viewer.py [--cpu] [--port 8731]
Then open http://127.0.0.1:8731/ in a browser.
"""
import argparse
import functools
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>differender_tpu orbit viewer</title><style>
 body { background:#111; color:#ddd; font-family:monospace; text-align:center }
 img  { image-rendering:pixelated; width:512px; height:512px;
        border:1px solid #444; margin-top:12px }
 #bar { margin-top:8px }
</style></head><body>
<h3>differender_tpu — orbit viewer (a/d or &#8592;/&#8594; to rotate)</h3>
<img id="view" src="/frame?angle=0">
<div id="bar">angle: <span id="ang">0.00</span> rad
 <input type="range" id="slider" min="0" max="628" value="0" style="width:360px">
</div>
<script>
 let angle = 0, pending = false, queued = null;
 const img = document.getElementById('view');
 const ang = document.getElementById('ang');
 const slider = document.getElementById('slider');
 function show(a) {
   angle = ((a % 6.2832) + 6.2832) % 6.2832;
   ang.textContent = angle.toFixed(2);
   slider.value = Math.round(angle * 100);
   if (pending) { queued = angle; return; }
   pending = true;
   const next = new Image();
   next.onload = () => { img.src = next.src; pending = false;
     if (queued !== null) { const q = queued; queued = null; show(q); } };
   next.src = '/frame?angle=' + angle;
 }
 document.addEventListener('keydown', (e) => {
   if (e.key === 'a' || e.key === 'ArrowLeft')  show(angle - 0.15);
   if (e.key === 'd' || e.key === 'ArrowRight') show(angle + 0.15);
 });
 slider.addEventListener('input', () => show(slider.value / 100));
</script></body></html>"""


def make_handler(render_frame):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/frame":
                q = parse_qs(url.query)
                angle = float(q.get("angle", ["0"])[0])
                body = render_frame(angle)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/health":
                body = json.dumps({"ok": True}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8731)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--vol-res", type=int, default=64)
    ap.add_argument("--tf", type=str, default="tf1")
    ap.add_argument("--sampling-rate", type=float, default=2.0)
    ap.add_argument("--raw", type=str, default=None,
                    help="raw uint8 volume file (else synthetic)")
    ap.add_argument("--shape", type=int, nargs=3, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=0,
                    help="exit after serving N frames (testing)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from differender_tpu import (RenderConfig, render_nondiff, get_tf,
                                 in_circles)
    from differender_tpu.io import load_raw_volume
    from differender_tpu.occupancy import build_occupancy

    if args.raw:
        vol = jnp.asarray(load_raw_volume(args.raw, tuple(args.shape)))
    else:
        n = args.vol_res
        xs = np.linspace(-1, 1, n, dtype=np.float32)
        g = np.meshgrid(xs, xs, xs, indexing="ij")
        r = np.sqrt(sum(x * x for x in g))
        vol = jnp.asarray(np.clip(
            0.8 / (1.0 + np.exp((r - 0.55) * 20.0))
            + 0.3 * ((r > 0.62) & (r < 0.7)), 0, 1).astype(np.float32))

    cfg = RenderConfig(volume_shape=vol.shape,
                       image_shape=(args.res, args.res))
    tf = jnp.asarray(np.asarray(get_tf(args.tf, cfg.tf_resolution)))
    occ = build_occupancy(vol, tf, cfg)

    # Arrays are jit ARGUMENTS, not closure constants: captured eager
    # jax.Arrays are fetched through the remote-TPU tunnel per constant at
    # trace time and can fail remote compile outright (CLAUDE.md rule 2).
    @functools.partial(jax.jit, static_argnames=())
    def render_at(v, t, o, lf):
        return render_nondiff(v, t, lf, cfg,
                              sampling_rate=args.sampling_rate,
                              occupancy=o).image

    served = [0]
    lock = threading.Lock()

    def render_frame(angle: float) -> bytes:
        with lock:
            lf = jnp.asarray(np.asarray(in_circles(angle), np.float32))
            img = np.asarray(render_at(vol, tf, occ, lf))
            served[0] += 1
        rgb = (np.clip(img[..., :3], 0, 1) * 255 + 0.5).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        return buf.getvalue()

    httpd = ThreadingHTTPServer(("127.0.0.1", args.port),
                                make_handler(render_frame))
    print(f"orbit viewer on http://127.0.0.1:{args.port}/ "
          f"(vol {vol.shape}, image {cfg.image_shape})", flush=True)
    if args.frames:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        import time
        while served[0] < args.frames:
            time.sleep(0.2)
        httpd.shutdown()
        print(f"served {served[0]} frames, exiting")
    else:
        httpd.serve_forever()


if __name__ == "__main__":
    main()
