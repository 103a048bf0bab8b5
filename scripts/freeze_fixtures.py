"""Freeze golden extractions for the adversarial fixtures.

Run once (and re-run ONLY on an intentional semantic change, with the
diff reviewed): writes tests/fixtures/golden.json mapping fixture name ->
{text, spans, n_blocks}. Tests compare live extractor output against this
frozen file, pinning semantics."""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octospark.extractor import extract  # noqa: E402
from tests.fixtures.adversarial import CASES  # noqa: E402

out = {}
for name, html in CASES:
    r = extract(html)
    out[name] = {"text": r["text"], "spans": r["spans"], "n_blocks": r["n_blocks"]}

path = pathlib.Path(__file__).resolve().parents[1] / "tests/fixtures/golden.json"
path.write_text(json.dumps(out, ensure_ascii=False, indent=1))
print(f"wrote {path} ({len(out)} fixtures)")
