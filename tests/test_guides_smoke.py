"""Fast-tier smoke over the guides: execute the FIRST python block of
every guide so a guide-breaking API change fails the pre-commit gate
(the full multi-block run stays in the slow tier, tests/test_guides.py).
The first block of each guide is its import + first-computation cell, so
renames/signature breaks in the public surface surface here."""

import re
from pathlib import Path

import pytest

# tf<->ss/zpk conversions in the filter-design guide legitimately hit
# near-zero leading numerator coefficients; normalize warns
# BadCoefficients there (scipy parity) — expected, keep the suite clean
pytestmark = pytest.mark.filterwarnings(
    "ignore:Badly conditioned filter coefficients")

GUIDES = sorted((Path(__file__).parent.parent / "guides").glob("*.md"))


@pytest.mark.parametrize("guide", GUIDES, ids=lambda p: p.stem)
def test_guide_first_block_runs(guide):
    text = guide.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert blocks, f"{guide} has no python blocks"
    exec(compile(blocks[0], str(guide), "exec"), {})
