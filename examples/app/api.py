"""NBDT inference HTTP API (reference examples/app/api.py equivalent).

POST / with JSON {"url": ...} or multipart file upload -> JSON
{"prediction": ..., "decisions": [{"name": ..., "prob": ...}, ...]}.

Stdlib http.server instead of Flask (not in the image); unlike the
reference — which constructs a pretrained HardNBDT PER REQUEST
(api.py:30-35) — the model is built once at startup and the jitted forward
is reused, so steady-state latency is one forward pass.

Run:  python examples/app/api.py --checkpoint /path/to/ckpt.pth \
          [--arch ResNet18] [--dataset CIFAR10] [--port 5000] [--hard]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_model(args):
    from nbdt_tpu.model import HardNBDT, SoftNBDT
    from nbdt_tpu.models import get_model, init_model
    from nbdt_tpu.utils import DATASET_TO_NUM_CLASSES, default_image_size

    num_classes = DATASET_TO_NUM_CLASSES[args.dataset]
    cls = HardNBDT if args.hard else SoftNBDT
    if args.checkpoint is None and args.random_init:
        # offline fallback (zero-egress environments): random weights,
        # hierarchy induced from them — same flow as `nbdt --random-init`
        size = default_image_size(args.dataset)
        module, variables = init_model(args.arch, num_classes,
                                       (size, size, 3))
        return cls(
            dataset=args.dataset, model=module, arch=args.arch,
            hierarchy=args.hierarchy, path_graph=args.path_graph,
            params=variables, fold_bn=getattr(args, "fold_bn", False),
        )
    module = get_model(args.arch, num_classes)
    return cls(
        dataset=args.dataset,
        model=module,
        arch=args.arch,
        hierarchy=args.hierarchy,
        path_graph=args.path_graph,
        pretrained=True,
        checkpoint_path=args.checkpoint,
        fold_bn=getattr(args, "fold_bn", False),
    )


def make_handler(model):
    from nbdt_tpu.bin.nbdt import preprocess

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._reply(200, {"status": "ok", "usage": "POST {url: ...} or image bytes"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                from PIL import Image

                if "application/json" in ctype:
                    from nbdt_tpu.utils import load_image_from_path

                    payload = json.loads(raw)
                    image = load_image_from_path(payload["url"])
                else:  # raw image bytes
                    image = Image.open(io.BytesIO(raw))
                x = preprocess(image)
                outputs, decisions = model.forward_with_decisions(x)
                pred = int(np.asarray(outputs).argmax(1)[0])
                self._reply(200, {
                    "prediction": model.tree.classes[pred],
                    "decisions": [
                        {"name": d["name"], "prob": round(float(d["prob"]), 4)}
                        for d in decisions[0]
                    ],
                })
            except Exception as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            sys.stderr.write("[api] " + fmt % args + "\n")

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--arch", default="ResNet18")
    parser.add_argument("--dataset", default="CIFAR10")
    parser.add_argument("--hierarchy", default=None)
    parser.add_argument("--path-graph", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--hard", action="store_true")
    parser.add_argument("--fold-bn", action="store_true",
                        help="serve the BN-folded forward (ResNet family; "
                             "same predictions, fewer ops)")
    parser.add_argument("--random-init", action="store_true",
                        help="serve random weights with a hierarchy induced "
                             "from them (offline demo — no checkpoint, no "
                             "download)")
    args = parser.parse_args(argv)
    if args.checkpoint is None and not args.random_init:
        parser.error("no --checkpoint given; pass one, or --random-init "
                     "for an offline demo (this environment has no "
                     "network egress to download released weights)")

    from nbdt_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # repeated restarts skip backbone compiles
    model = build_model(args)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(model))
    print(f"Serving NBDT on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
