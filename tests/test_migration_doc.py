"""Execute every runnable Python snippet in docs/MIGRATION.md.

The migration guide promises its snippets "run as-is from the repo root";
this test keeps that promise true. Snippets whose first non-blank line is
``# torch`` are upstream-side illustrations and are skipped.
"""

import re
from pathlib import Path

import pytest

DOC = Path(__file__).resolve().parent.parent / "docs" / "MIGRATION.md"


def _python_snippets():
    text = DOC.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    out = []
    for i, block in enumerate(blocks):
        first = next((l for l in block.splitlines() if l.strip()), "")
        if first.strip() == "# torch":
            continue
        out.append(pytest.param(block, id=f"snippet{i}"))
    return out


SNIPPETS = _python_snippets()


def test_doc_has_expected_snippet_split():
    """The # torch label must track what the snippet actually is: upstream
    blocks import from `nbdt.`, runnable blocks import from `nbdt_tpu` —
    a mislabeled runnable snippet would silently skip execution."""
    text = DOC.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    for block in blocks:
        first = next((l for l in block.splitlines() if l.strip()), "")
        if first.strip() == "# torch":
            assert re.search(r"\bfrom nbdt\.", block), (
                "torch-labeled block doesn't look upstream-side:\n" + block)
        else:
            assert "nbdt_tpu" in block and not re.search(
                r"\bfrom nbdt\.", block), (
                "runnable block doesn't target nbdt_tpu:\n" + block)
    assert len(SNIPPETS) >= 3, "guide lost its runnable examples"


@pytest.mark.parametrize("snippet", SNIPPETS)
def test_snippet_runs(snippet, tmp_path, monkeypatch):
    # Redirect the guide's /tmp scratch dirs into the test sandbox so
    # repeated runs start clean.
    for marker in ("/tmp/hier_mig", "/tmp/ckpt_mig", "/tmp/hier_e2e"):
        snippet = snippet.replace(marker, str(tmp_path / Path(marker).name))
    exec(compile(snippet, str(DOC), "exec"), {"__name__": "__main__"})
