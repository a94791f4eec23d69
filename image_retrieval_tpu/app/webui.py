"""Thin web UI — browser front-end over the micro-batching search server.

The reference ships a Tkinter desktop GUI (reference main.py); the modern
equivalent of its Search tab is this zero-dependency (stdlib http.server)
web page: a query box, thumbnail grid of results with scores, JSON API.

    python -m image_retrieval_tpu.app.webui --folder ./photos --fake-encoder
    # then open http://localhost:8008

Endpoints:
    GET  /                          HTML page
    GET  /search?q=...&k=10         JSON [{path, score}]
         &metric=optimized&w_l1=1&w_l2=1&w_inf=0&w_mag=0.5&w_angle=1
         &approx=1                  approximate candidate set, true scores
                                    (IndexConfig.approx_select; &approx=0
                                    forces exact when the server default
                                    is approximate)
    GET  /similar?path=...&k=10     image-query: gallery ranked by
                                    similarity to an indexed image
                                    (click a thumbnail in the UI)
    POST /batch_search              JSON {"queries": [...], "k": 10,
                                    "approx": true|false (optional)} ->
                                    JSON [[{path, score}], ...]
    GET  /image?path=...            the image file (only paths in the index)
    GET  /stats                     JSON serving counters (requests,
                                    micro-batches, max observed batch,
                                    indexed images)
"""

from __future__ import annotations

import argparse
import json
import logging
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

logger = logging.getLogger(__name__)

_PAGE = """<!doctype html>
<html><head><title>image-retrieval-tpu</title><style>
body{font-family:sans-serif;margin:2em;background:#fafafa}
#grid{display:flex;flex-wrap:wrap;gap:12px;margin-top:1em}
.card{background:#fff;border:1px solid #ddd;border-radius:6px;padding:6px;width:190px}
.card img{width:180px;height:180px;object-fit:contain}
.score{font-size:12px;color:#555;word-break:break-all}
input{font-size:16px;padding:6px;width:24em}
button{font-size:16px;padding:6px 14px}
</style></head><body>
<h2>image-retrieval-tpu</h2>
<form onsubmit="go();return false">
<input id=q placeholder="a brown dog" autofocus>
<input id=f placeholder="filter e.g. dir == 'red'" style="width:16em">
<button>Search</button></form>
<div id=grid></div>
<script>
function render(hits){
  document.getElementById('grid').innerHTML=hits.map(h=>
    `<div class=card><img src="/image?path=${encodeURIComponent(h.path)}"`+
    ` onclick="similar('${encodeURIComponent(h.path)}')" title="find similar"`+
    ` style="cursor:pointer">`+
    `<div class=score>${h.score.toFixed(4)}<br>${h.path.split('/').pop()}</div></div>`
  ).join('');
}
function fexpr(){
  const f=document.getElementById('f').value.trim();
  return f?'&filter='+encodeURIComponent(f):'';
}
async function go(){
  const q=document.getElementById('q').value;
  const r=await fetch('/search?q='+encodeURIComponent(q)+'&k=12'+fexpr());
  render(await r.json());
}
async function similar(p){
  const r=await fetch('/similar?path='+p+'&k=12'+fexpr());
  render(await r.json());
}
</script></body></html>"""


#: per-request wait budget. The steady-state search is milliseconds, but the
#: FIRST query of a fresh process pays the remote TPU jit compile (1–5 min on
#: this tunnel) — a 30 s default would time out every cold start.
_SEARCH_TIMEOUT_S = 420.0


class _Handler(BaseHTTPRequestHandler):
    server_ctx = None  # set by serve()

    def log_message(self, fmt, *args):
        logger.debug(fmt % args)

    def _send(self, code, body, ctype="text/html"):
        try:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except (BrokenPipeError, ConnectionResetError):
            # client gave up while we were computing; nothing to deliver
            logger.debug("client disconnected before the response was sent")

    @staticmethod
    def _parse_weights(qs):
        """The 5-weight optimized-similarity params from query-string args
        (one parser for /search, /similar, and any future endpoint)."""
        return {
            key: float((qs.get(key) or [default])[0])
            for key, default in (("w_angle", "1"), ("w_l1", "0"),
                                 ("w_l2", "0"), ("w_inf", "0"),
                                 ("w_mag", "0"))
        }

    @staticmethod
    def _parse_approx(qs):
        """&approx=1/0 -> True/False; absent -> None (server default).
        Unrecognized values are a 400, not a silent True — a typo like
        &approx=off must not force the approximate selector."""
        raw = (qs.get("approx") or [None])[0]
        if raw is None:
            return None
        low = raw.lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(f"bad approx value {raw!r} (use 1/0)")

    def _do_search(self, ctx, qs, query, k, metric, flt):
        approx = self._parse_approx(qs)
        if metric.startswith("optimized"):
            results = ctx["server"].search(
                query, top_k=k, metric="optimized_similarity",
                weights=self._parse_weights(qs), flt=flt, approx=approx,
                timeout=_SEARCH_TIMEOUT_S,
            )
        else:
            results = ctx["server"].search(query, top_k=k, flt=flt,
                                           approx=approx,
                                           timeout=_SEARCH_TIMEOUT_S)
        self._send(200, json.dumps(results).encode(), "application/json")

    def do_GET(self):
        ctx = self.server_ctx
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        if parsed.path == "/":
            self._send(200, _PAGE.encode())
        elif parsed.path == "/search":
            query = (qs.get("q") or [""])[0]
            k = int((qs.get("k") or ["10"])[0])
            if not query.strip():
                self._send(400, b"[]", "application/json")
                return
            metric = (qs.get("metric") or ["cosine"])[0]
            flt = (qs.get("filter") or [None])[0] or None
            try:
                self._do_search(ctx, qs, query, k, metric, flt)
            except Exception as e:
                # bad filter expression / unknown field: client error, not
                # a handler-thread crash
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
            return
        elif parsed.path == "/stats":
            stats = dict(ctx["server"].stats)
            stats["indexed_images"] = len(ctx["known_paths"])
            self._send(200, json.dumps(stats).encode(), "application/json")
        elif parsed.path == "/similar":
            path = (qs.get("path") or [""])[0]
            k = int((qs.get("k") or ["10"])[0])
            if path not in ctx["known_paths"]:
                self._send(404, b"not found", "text/plain")
                return
            metric = (qs.get("metric") or ["cosine"])[0]
            flt = (qs.get("filter") or [None])[0] or None
            try:
                approx = self._parse_approx(qs)
                if metric.startswith("optimized"):
                    results = ctx["server"].search_similar(
                        path, top_k=k, metric="optimized_similarity",
                        weights=self._parse_weights(qs), flt=flt,
                        approx=approx, timeout=_SEARCH_TIMEOUT_S,
                    )
                else:
                    results = ctx["server"].search_similar(
                        path, top_k=k, flt=flt, approx=approx,
                        timeout=_SEARCH_TIMEOUT_S
                    )
            except Exception as e:
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
                return
            self._send(200, json.dumps(results).encode(), "application/json")
        elif parsed.path == "/image":
            path = (qs.get("path") or [""])[0]
            if path not in ctx["known_paths"]:
                self._send(404, b"not found", "text/plain")
                return
            try:
                with open(path, "rb") as f:
                    data = f.read()
                ctype = "image/png" if path.endswith(".png") else "image/jpeg"
                self._send(200, data, ctype)
            except OSError:
                self._send(404, b"not found", "text/plain")
        else:
            self._send(404, b"not found", "text/plain")

    def do_POST(self):
        ctx = self.server_ctx
        length = int(self.headers.get("Content-Length", 0))
        try:
            body = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, TypeError):
            self._send(400, b"bad request", "text/plain")
            return
        if self.path == "/batch_search":
            # enqueue all queries before waiting: they coalesce into shared
            # micro-batches (one encode + one sweep) instead of sequential
            # per-query round-trips. Same cold-start budget as /search — the
            # first request of a fresh process pays the remote jit compile.
            try:
                queries = list(body.get("queries") or [])
                k = int(body.get("k", 10))
                approx = body.get("approx")
                if approx is not None and not isinstance(approx, bool):
                    raise ValueError(
                        f"bad approx value {approx!r} (use true/false)")
                out = ctx["server"].search_many(queries, top_k=k,
                                                approx=approx,
                                                timeout=_SEARCH_TIMEOUT_S)
                self._send(200, json.dumps(out).encode(), "application/json")
            except Exception as e:
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
        elif self.path == "/add":
            # live ingest: {"paths": [server-local image paths]} — embeds
            # and inserts into the serving index without a restart
            try:
                paths = [str(p) for p in (body.get("paths") or [])]
                ok, failed = ctx["server"].add_images(paths)
                inserted = [p for p in paths
                            if p in set(ctx["server"].index.paths)]
                ctx["known_paths"].update(inserted)
                self._send(200, json.dumps(
                    {"inserted": ok, "failed": failed}).encode(),
                    "application/json")
            except Exception as e:
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
        elif self.path == "/remove":
            try:
                paths = [str(p) for p in (body.get("paths") or [])]
                n = ctx["server"].remove_images(paths)
                ctx["known_paths"].difference_update(paths)
                self._send(200, json.dumps({"removed": n}).encode(),
                           "application/json")
            except Exception as e:
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
        else:
            self._send(404, b"not found", "text/plain")


def serve(search_server, known_paths, host: str = "127.0.0.1", port: int = 8008):
    """Start the HTTP server (blocking). Returns the server object if you
    run it via threading for tests."""
    handler = type("Handler", (_Handler,), {
        "server_ctx": {"server": search_server, "known_paths": set(known_paths)}
    })
    httpd = ThreadingHTTPServer((host, port), handler)
    return httpd


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", required=True)
    ap.add_argument("--fake-encoder", action="store_true")
    ap.add_argument("--journal-dir", default=None,
                    help="Durable index directory: rows recovered on start, "
                         "mutations write-ahead logged — POST /add survives "
                         "a server restart (Milvus WAL+volume analog)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--ann", choices=("exact", "ivf", "screen"),
                    default="exact",
                    help="Candidate generation (ivf = Milvus IVF_FLAT "
                         "analog; screen = projection-screened two-phase)")
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=10)
    ap.add_argument("--screen-dims", type=int, default=128)
    ap.add_argument("--screen-candidates", type=int, default=128)
    ap.add_argument("--approx-select", action="store_true",
                    help="Server-wide approximate candidate selection "
                         "(true scores, approximate candidate set; 5.8x "
                         "batched latency at 16M rows, recall@10 0.9984). "
                         "Requests can force exact with &approx=0")
    args = ap.parse_args(argv)

    from image_retrieval_tpu.app.pipeline import ImageSearchApp
    from image_retrieval_tpu.app.server import SearchServer
    from image_retrieval_tpu.models.encoder import get_encoder

    encoder = get_encoder(fake=args.fake_encoder) if args.fake_encoder else None
    app = ImageSearchApp(encoder=encoder, journal_dir=args.journal_dir)
    if args.ann != "exact":
        app.config.search.ann = args.ann
        app.config.search.nlist = args.nlist
        app.config.search.nprobe = args.nprobe
        app.config.search.screen_dims = args.screen_dims
        app.config.search.screen_candidates = args.screen_candidates
    paths = app.scan_folders(args.folder)
    app.process_images(paths)
    index = app._ensure_index()
    if index is None or len(index) == 0:
        raise SystemExit(
            f"no images found under {args.folder!r} — nothing to serve"
        )
    with SearchServer(app._get_encoder(), index, ann=app._ensure_ann(index),
                      overfetch=app.config.search.overfetch,
                      approx_select=(True if args.approx_select
                                     else None)) as srv:
        httpd = serve(srv, index.paths, args.host, args.port)
        print(f"Serving {len(index)} images at http://{args.host}:{args.port}")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()


if __name__ == "__main__":
    main()
