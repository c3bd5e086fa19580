"""Interactive hierarchy-vis demo page.

Generates a self-contained HTML tree for the shipped CIFAR10 hierarchies —
open it in any browser and:

* click an internal node to collapse/expand its subtree (750 ms
  transition; collapsed nodes render filled),
* scroll to zoom (about the cursor), drag to pan,
* the `--collapse`d subtree starts closed and can be re-expanded.

Feature parity with the reference's d3.v3 template
(/root/reference/nbdt/templates/tree-template.html) is checklisted in
docs/COVERAGE.md; the handler wiring is asserted by
tests/test_hierarchy.py::test_vis_interactive_handlers_wired.

Usage: python -m examples.vis_demo [out_dir]
"""

import sys


def main(out_dir: str = "out/vis-demo") -> None:
    from nbdt_tpu.hierarchy.vis import generate_hierarchy_vis
    from nbdt_tpu.utils import maybe_set_platform

    maybe_set_platform("cpu")
    for graph, kwargs in [
        ("nbdt_tpu/hierarchies/CIFAR10/graph-wordnet.json",
         dict(sublabels=True, collapse=["n01471682"])),  # vertebrate closed
        ("nbdt_tpu/hierarchies/CIFAR10/graph-induced.json",
         dict(color_path_to="cat")),
    ]:
        generate_hierarchy_vis("CIFAR10", graph, out_dir=out_dir, **kwargs)
    print(f"==> Open the HTML files under {out_dir}/ in a browser; "
          "click nodes to collapse, scroll to zoom, drag to pan.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
