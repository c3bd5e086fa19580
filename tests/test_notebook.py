"""The notebook walkthrough (examples/load_pretrained_nbdts.ipynb) must run
offline end-to-end — it's the counterpart of the reference's Colab."""

import json
import os


def test_notebook_cells_execute():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "load_pretrained_nbdts.ipynb",
    )
    with open(path) as f:
        nb = json.load(f)
    code = "\n\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    ns: dict = {}
    exec(compile(code, "load_pretrained_nbdts.ipynb", "exec"), ns)
    assert "decisions" in ns and len(ns["decisions"][0]) >= 1
    assert ns["model"].tree.classes[3] == "cat"
