"""Executes every ```python block in docs/API.md against the shared test
SparkSession — the docs page is a contract, not prose (VERDICT r11 #8:
'docs with import-tested snippets').

Each snippet runs in a FRESH namespace holding only `spark`, so examples
stay copy-paste self-contained; a snippet that silently depended on an
earlier one would fail here."""

from __future__ import annotations

import os
import re

import pytest

DOC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "docs", "API.md")


def _snippets():
    src = open(DOC).read()
    blocks = re.findall(r"```python\n(.*?)```", src, flags=re.S)
    assert len(blocks) >= 12, "API.md lost its examples"
    return blocks


@pytest.mark.parametrize(
    "idx,code",
    [(i, b) for i, b in enumerate(_snippets())],
    ids=lambda v: f"snippet{v}" if isinstance(v, int) else None,
)
def test_api_doc_snippet(spark, idx, code):
    exec(compile(code, f"docs/API.md#snippet{idx}", "exec"), {"spark": spark})
