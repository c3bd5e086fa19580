"""Serving example round-trip (reference examples/app/api.py equivalent)."""

import io
import json
import threading
from http.server import ThreadingHTTPServer
from urllib.request import Request, urlopen

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(synthetic_tree):
    PIL = pytest.importorskip("PIL.Image")
    import sys

    sys.path.insert(0, "examples/app")
    from api import make_handler

    from nbdt_tpu.model import SoftNBDT
    from nbdt_tpu.models import init_model

    module, variables = init_model("ResNet10", 7, (32, 32, 3))
    model = SoftNBDT(dataset=None, model=module, tree=synthetic_tree,
                     params=variables)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(model))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_post_image_bytes(server):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    req = Request(server, data=buf.getvalue(),
                  headers={"Content-Type": "image/png"})
    with urlopen(req, timeout=60) as resp:
        payload = json.loads(resp.read())
    assert payload["prediction"] in [f"class{i}" for i in range(7)]
    assert payload["decisions"][0]["prob"] == 1.0  # root
    assert all(0 <= d["prob"] <= 1 for d in payload["decisions"])


def test_get_health(server):
    with urlopen(server, timeout=30) as resp:
        assert json.loads(resp.read())["status"] == "ok"


def test_bad_request(server):
    req = Request(server, data=b"{}",
                  headers={"Content-Type": "application/json"})
    try:
        urlopen(req, timeout=30)
        assert False, "expected 400"
    except Exception as e:
        assert getattr(e, "code", None) == 400
