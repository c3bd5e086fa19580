"""Import hierarchy/wnid assets from an installed reference NBDT checkout.

The reference ships 23 pre-generated hierarchy JSONs and 7 wnid lists as
package data; this repo vendors the same files under
``nbdt_tpu/hierarchies/`` and ``nbdt_tpu/wnids/`` (they are data — wnid
orderings + graph JSON — and the parity fixtures for released checkpoints).
This tool refreshes them from a reference checkout:

    python tools/import_assets.py --source /path/to/neural-backed-decision-trees
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

PACKAGE = Path(__file__).parent.parent / "nbdt_tpu"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--source", required=True,
                        help="path to a reference NBDT checkout or install")
    args = parser.parse_args(argv)

    src = Path(args.source)
    pkg_src = src / "nbdt" if (src / "nbdt").exists() else src
    copied = 0
    for sub in ("hierarchies", "wnids"):
        src_dir = pkg_src / sub
        if not src_dir.exists():
            print(f"skip {src_dir} (missing)")
            continue
        dst_dir = PACKAGE / sub
        for path in src_dir.rglob("*"):
            if path.is_file():
                rel = path.relative_to(src_dir)
                dst = dst_dir / rel
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(path, dst)
                copied += 1
    print(f"Imported {copied} asset files into {PACKAGE}")


if __name__ == "__main__":
    main()
