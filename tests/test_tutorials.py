"""Tutorial docs execute: every ```python block in docs/tutorials/*.md
runs top to bottom in one namespace per file (the reference ships its
tutorials as notebooks; here the markdown itself is the executable
artifact, mirroring the examples-tier strategy of test_examples.py)."""

import glob
import os
import re

import pytest

TUTORIALS = sorted(
    glob.glob(
        os.path.join(
            os.path.dirname(__file__), "..", "docs", "tutorials", "*.md"
        )
    )
)

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def test_tutorials_exist():
    assert len(TUTORIALS) >= 3


@pytest.mark.parametrize("path", TUTORIALS, ids=os.path.basename)
def test_tutorial_code_runs(path, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # artifacts (logs) land in tmp
    blocks = _BLOCK.findall(open(path).read())
    assert blocks, f"{path} has no python blocks"
    ns = {"__name__": f"tutorial:{os.path.basename(path)}"}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{path}#block{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic
            raise AssertionError(
                f"{os.path.basename(path)} block {i} failed: {e!r}\n{block}"
            ) from e
