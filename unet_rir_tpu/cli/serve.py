"""Serving entry point: an HTTP JSON API over RIRSynthesizer.

The reference's only serving surface is the batch-4 eval loop of
rir_generation.py:69-70,160-308 (load checkpoint, iterate a dataset). This
exposes the same capability as a long-lived service: load a
`save_pretrained` export once, compile per-bucket fixed-shape programs,
and answer synthesis requests over HTTP — stdlib http.server only, no
framework dependencies.

Endpoints:
  GET  /health    -> {"status": "ok", "model": ..., "buckets": [...]}
  POST /synthesize
    {"spec_in": [[...]],            # (N,H,W,2) nested lists or base64 f32
     "emb": [[...]],                # (N,2,16) ints, OR:
     "source": [[room,zone,array,l,m], ...],  # positions instead of emb
     "target": [[room,zone,array,l,m], ...]}
    -> {"wavs": <base64 float32 little-endian (N,n_samples)>,
        "shape": [N, n_samples], "dispatch_sizes": [...]}

Threading: http.server's ThreadingHTTPServer may overlap requests; the
synthesizer dispatch is serialized with a lock (one TPU program stream),
which also keeps the two-in-flight HBM bound intact.

Usage:
  python -m unet_rir_tpu.cli.serve --model-folder results/unet/export \
      --port 8476 --buckets 8 32 128
"""

from __future__ import annotations

import argparse
import base64
import json
import threading


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-folder", required=True,
                   help="save_pretrained export (config.json + weights.npz)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8476)
    p.add_argument("--buckets", type=int, nargs="*", default=[8, 32, 128],
                   help="compiled batch buckets (small requests run small "
                        "programs)")
    p.add_argument("--algorithm", default="ph", choices=["ph", "gl"])
    p.add_argument("--diff-gen", action="store_true")
    p.add_argument("--duration", type=float, default=0.2,
                   help="RIR window the model was trained on")
    p.add_argument("--compile-cache-dir", default=None,
                   help="persistent XLA compilation cache: a restarted server "
                        "skips recompiling every bucket's program")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip ahead-of-traffic compilation of the buckets")
    p.add_argument("--bf16", action="store_true",
                   help="serve with bfloat16 compute regardless of the "
                        "export's training dtype (params stay float32; "
                        "higher throughput on the HBM-bound U-Net fwd)")
    return p


def _decode_array(obj, dtype):
    """Request arrays arrive as nested lists or {'b64':..., 'shape':[...]}."""
    import numpy as np

    if isinstance(obj, dict):
        buf = base64.b64decode(obj["b64"])
        return np.frombuffer(buf, dtype=dtype).reshape(obj["shape"]).copy()
    return np.asarray(obj, dtype=dtype)


def make_handler(synth, model_name: str, lock: threading.Lock):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {"status": "ok", "model": model_name,
                              "buckets": synth.buckets,
                              "grid": list(synth.grid),
                              "n_samples": synth.n_samples})

        def do_POST(self):
            if self.path != "/synthesize":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                import numpy as np

                spec_in = _decode_array(req["spec_in"], np.float32)
                if "emb" in req:
                    emb = _decode_array(req["emb"], np.int32)
                    with lock:
                        _, wavs = synth.synthesize(spec_in, emb)
                        # Capture inside the lock: ThreadingHTTPServer
                        # overlaps requests, and another request's
                        # synthesize() would overwrite the attribute.
                        dispatch_sizes = synth.last_dispatch_sizes
                else:
                    source = [tuple(s) for s in req["source"]]
                    target = [tuple(t) for t in req["target"]]
                    with lock:
                        _, wavs = synth.synthesize_positions(
                            spec_in, source, target)
                        dispatch_sizes = synth.last_dispatch_sizes
                self._reply(200, {
                    "wavs": base64.b64encode(
                        np.ascontiguousarray(wavs, np.float32).tobytes()
                    ).decode(),
                    "shape": list(wavs.shape),
                    "dispatch_sizes": dispatch_sizes,
                })
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(args):
    """Build (server, synthesizer); split from main() for in-process tests."""
    from http.server import ThreadingHTTPServer

    if getattr(args, "compile_cache_dir", None):
        from unet_rir_tpu.utils import enable_compilation_cache

        enable_compilation_cache(args.compile_cache_dir)

    from unet_rir_tpu.data.corpus import _hop_aligned_samples
    from unet_rir_tpu.ops.stft import HOP_LENGTH, N_BINS
    from unet_rir_tpu.serving import RIRSynthesizer

    n = _hop_aligned_samples(args.duration)  # same contract as the corpus
    stft_shape = (N_BINS, 1 + n // HOP_LENGTH)
    from unet_rir_tpu import models

    model, variables = models.load_pretrained(args.model_folder)
    if args.bf16:
        import dataclasses

        import jax.numpy as jnp

        model = dataclasses.replace(model, dtype=jnp.bfloat16)
    synth = RIRSynthesizer(
        model, variables, buckets=tuple(args.buckets),
        algorithm=args.algorithm, diff_gen=args.diff_gen,
        stft_shape=stft_shape)
    if not args.no_warmup:
        synth.warmup()
    handler = make_handler(synth, args.model_folder, threading.Lock())
    server = ThreadingHTTPServer((args.host, args.port), handler)
    return server, synth


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    server, synth = make_server(args)
    host, port = server.server_address[:2]
    print(f"Serving {args.model_folder} on http://{host}:{port} "
          f"(buckets {synth.buckets}, grid {synth.grid})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
